"""Shard-parallel resolve == global resolve, for any boundary placement.

``resolve/parallel.py`` decomposes the leftmost-longest / leftmost-shortest
greedy passes across shard boundaries with exact (anchor, tail) / cursor
stitching; these tests pin output identity against the global resolvers on
hand-derived boundary-interaction cases, adversarial parity chains (which
force the repair path on every shard), and fuzz over random candidate sets
and random boundaries.
"""

import numpy as np
import pytest

from ahocorasick_tpu.resolve.parallel import (
    resolve_longest_sharded,
    resolve_shortest_sharded,
)
from ahocorasick_tpu.resolve.queue import resolve_longest, resolve_shortest


def _sorted_candidates(trips):
    trips = sorted(trips, key=lambda t: (t[1], t[0]))
    if not trips:
        z = np.zeros(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    a = np.asarray(trips, dtype=np.int64)
    return a[:, 0], a[:, 1], a[:, 2]


def _assert_same(got, want):
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


@pytest.mark.parametrize("boundaries", [[5], [3, 7], [1, 2, 3, 4, 5, 6]])
def test_longest_parity_chain_forces_repair(boundaries):
    # "ababab..." with {ab, ba}: candidates (i, i+2) for all i; resolution
    # parity propagates across every boundary — no self-synchronization.
    trips = [(i, i + 2, i % 2) for i in range(12)]
    s, e, v = _sorted_candidates(trips)
    want = resolve_longest(s, e, v)
    got = resolve_longest_sharded(s, e, v, boundaries, max_depth=2)
    _assert_same(got, want)


def test_longest_straddling_replacement():
    # Queued (6,9) gets same-start-REPLACED by (6,12) arriving in the next
    # shard: the boundary tail must be displaceable.
    trips = [(0, 3, 0), (6, 9, 1), (6, 12, 2), (12, 14, 3)]
    s, e, v = _sorted_candidates(trips)
    for boundaries in ([10], [9], [11]):
        want = resolve_longest(s, e, v)
        got = resolve_longest_sharded(s, e, v, boundaries, max_depth=6)
        _assert_same(got, want)


def test_longest_tail_blocks_later_candidate():
    # (8,11) accepted in shard 0 must reject the overlapping (9,13) from
    # shard 1 (leftmost wins) — the tail carries the blocker.
    trips = [(8, 11, 0), (9, 13, 1), (11, 15, 2)]
    s, e, v = _sorted_candidates(trips)
    got = resolve_longest_sharded(s, e, v, [12], max_depth=4)
    _assert_same(got, resolve_longest(s, e, v))


def test_shortest_cursor_crosses_boundary():
    # Accepted (2,6) in shard 0; shard 1's (4,8) starts before the cursor
    # and must be dropped, (6,9) accepted.
    trips = [(2, 6, 0), (4, 8, 1), (6, 9, 2)]
    s, e, v = _sorted_candidates(trips)
    got = resolve_shortest_sharded(s, e, v, [7], max_depth=4)
    _assert_same(got, resolve_shortest(s, e, v))


@pytest.mark.parametrize("mode", ["longest", "shortest"])
def test_fuzz_random_candidates_random_boundaries(mode):
    rng = np.random.default_rng(42 if mode == "longest" else 43)
    for trial in range(60):
        n = int(rng.integers(0, 120))
        d = int(rng.integers(1, 9))
        trips = []
        for _ in range(n):
            start = int(rng.integers(0, 80))
            length = int(rng.integers(1, d + 1))
            trips.append((start, start + length, int(rng.integers(0, 50))))
        # Dedup (end, start) pairs: engines emit each (start,end) once.
        trips = list({(s, e): (s, e, v) for s, e, v in trips}.values())
        s, e, v = _sorted_candidates(trips)
        n_b = int(rng.integers(1, 6))
        boundaries = sorted(int(x) for x in rng.integers(0, 90, size=n_b))
        if mode == "longest":
            want = resolve_longest(s, e, v)
            got = resolve_longest_sharded(s, e, v, boundaries, max_depth=d)
        else:
            want = resolve_shortest(s, e, v)
            got = resolve_shortest_sharded(s, e, v, boundaries, max_depth=d)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w, err_msg=f"trial {trial}")


def test_empty_candidates():
    z = np.zeros(0, dtype=np.int64)
    for fn in (resolve_longest_sharded, resolve_shortest_sharded):
        got = fn(z, z.copy(), z.copy(), [10], max_depth=4)
        assert all(len(g) == 0 for g in got)
