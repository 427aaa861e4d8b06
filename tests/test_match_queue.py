"""Direct unit tests of the overlap-resolution queue.

Mirrors the reference's ``MatchQueueTest.java:8-57`` scenarios exactly
(translated from its ``push(length, endIndex)`` arguments to our
``push(start, end)``), plus a fuzz equivalence check between the
incremental ``MatchQueue`` and the batch ``resolve_longest`` sweep.
"""

import numpy as np

from ahocorasick_tpu.resolve.queue import MatchQueue, resolve_longest


def emitted(flushed):
    return [(e, e - s) for s, e, _ in flushed]  # (end, length) like the Java listener


def test_match_queue():  # MatchQueueTest.testMatchQueue
    q = MatchQueue()
    assert q.push(0, 3)
    assert q.push(3, 6)
    assert q.push(6, 9)
    assert not q.push(1, 10)  # overlapping later start: leftmost wins
    out = emitted(q.flush(10))
    assert q.push(3, 10)
    out += emitted(q.flush(10))
    assert out == [(3, 3), (6, 3), (9, 3), (10, 7)]


def test_match_queue_extending_overlap():  # testMatchQueueExtendingOverlap
    q = MatchQueue()
    q.push(0, 3)
    q.push(0, 4)  # same start, longer: replaces
    assert not q.push(3, 5)
    assert emitted(q.flush(4)) == [(4, 4)]


def test_match_queue_simple():  # testMatchQueueSimple
    q = MatchQueue()
    q.push(0, 3)
    assert not q.push(1, 3)
    assert not q.push(2, 4)
    assert q.push(3, 5)
    assert emitted(q.flush(5)) == [(3, 3), (5, 2)]


def test_partial_clear():  # testPartialClear
    q = MatchQueue()
    q.push(0, 3)
    q.push(3, 6)
    q.push(6, 9)
    assert not q.push(1, 10)
    out = emitted(q.flush(4))  # only end<=4 leaves the queue
    assert out == [(3, 3)]
    assert q.push(3, 10)  # same start as queued (3,6), longer: replace + drop tail
    out += emitted(q.flush(10))
    assert out == [(3, 3), (10, 7)]


def test_new_leftmost_displaces_queue():
    q = MatchQueue()
    q.push(5, 8)
    q.push(8, 9)
    assert q.push(2, 11)  # starts before everything: displaces the queue
    assert q.drain() == [(2, 11, -1)]


def test_resolve_longest_equals_queue_fuzz():
    rng = np.random.default_rng(42)
    for _ in range(200):
        n = int(rng.integers(0, 40))
        ends = np.sort(rng.integers(1, 30, size=n))
        lens = rng.integers(1, 10, size=n)
        starts = np.maximum(ends - lens, 0)
        # Reference offer order: end ascending, start ascending at equal end.
        order = np.lexsort((starts, ends))
        starts, ends = starts[order], ends[order]
        vals = np.arange(n)

        q = MatchQueue()
        for s, e, v in zip(starts, ends, vals):
            q.push(int(s), int(e), int(v))
        expected = q.drain()

        rs, re, rv = resolve_longest(starts.astype(np.int64), ends.astype(np.int64), vals.astype(np.int64))
        got = list(zip(rs.tolist(), re.tolist(), rv.tolist()))
        assert got == expected
