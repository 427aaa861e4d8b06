"""Shard-parallel non-overlap resolution with exact boundary stitching.

Round-2 sharded longest/shortest funneled every shard's candidates into ONE
host resolver pass — a single-host bottleneck at pod scale.  This module
makes resolution shard-local: each shard resolves its OWN candidates
speculatively — a decomposition that lets a pod run them host-parallel
(this single-host implementation runs the shard resolves sequentially) —
and a cheap sequential stitch repairs the rare boundary interactions
exactly.

Why this is exact (longest, ``SetMatchQueue.java:45-95`` semantics):

* Candidates are processed in (end asc, start asc) order; shard i owns
  candidates with ``end`` in ``(b_i, b_{i+1}]``.  Every such candidate has
  ``start >= b_i + 1 - d`` (keyword length <= d).
* The *only* part of the accepted-so-far queue a future candidate can
  observe is (a) entries with ``end > b_i - d`` (they can overlap it) and
  (b) the single deepest entry with ``end <= b_i - d`` — the "anchor" —
  which every candidate trivially appends after (``start > anchor.end``);
  it matters only as the scan floor that stops rule-4 whole-queue
  displacement (``MatchQueue.push``).  That (anchor, tail) pair is the
  complete boundary state, the resolver analog of the d-synchronizing DFA
  state carried across chunks.
* If every shard-i candidate starts at/after the incoming tail's last end,
  the queue tail is inert (append-only path) and the speculative
  from-empty resolution of shard i is already exact — the common case on
  real text.  Otherwise shard i is re-resolved seeded with (anchor, tail);
  adversarial inputs (e.g. "ababab" parity chains) degrade to sequential
  work but never to wrong output.

For SHORTEST the boundary state is just the restart cursor ``p``
(``resolve.queue.resolve_shortest``): a shard whose candidates all start
at/after the incoming cursor keeps its speculative result; otherwise it is
re-resolved with candidates filtered to ``start >= p`` (exactly how the
reference's lagged restart loop would continue).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from ahocorasick_tpu.resolve.queue import resolve_longest, resolve_shortest

Triple = Tuple[np.ndarray, np.ndarray, np.ndarray]


def _empty() -> Triple:
    z = np.zeros(0, dtype=np.int64)
    return z, z.copy(), z.copy()


def _split_by_end(starts, ends, vals, boundaries: Sequence[int]):
    """Segment k owns candidates with end in (boundaries[k], boundaries[k+1]].

    Candidates must already be sorted by (end asc, start asc) — the order
    every extraction path produces."""
    cuts = [int(np.searchsorted(ends, b, side="right")) for b in boundaries]
    cuts = [0] + cuts + [len(ends)]
    segs = []
    for a, b in zip(cuts[:-1], cuts[1:]):
        segs.append((starts[a:b], ends[a:b], vals[a:b]))
    return segs


def resolve_longest_sharded(
    starts: np.ndarray,
    ends: np.ndarray,
    vals: np.ndarray,
    boundaries: Sequence[int],
    max_depth: int,
) -> Triple:
    """Leftmost-longest resolve, shard-decomposed; output-identical to
    ``resolve_longest`` over the full candidate arrays (tested)."""
    if len(starts) == 0:
        return _empty()
    d = max(int(max_depth), 1)
    segs = _split_by_end(starts, ends, vals, boundaries)
    bounds = [-(1 << 60)] + [int(b) for b in boundaries] + [1 << 62]

    # Phase A — speculative per-shard resolves.  Each resolve touches only
    # its own shard's candidates, so the decomposition ENABLES per-host
    # parallelism in a pod (each host resolving its shard before the
    # all-gather); on one host the shards resolve THREAD-parallel when the
    # native resolver is loaded (its ctypes call releases the GIL — round 5;
    # the pure-Python fallback stays sequential, where threads cannot help).
    spec = _phase_a(segs)

    # Phase B — sequential stitch carrying the exact (anchor, tail) state.
    out_s: List[np.ndarray] = []
    out_e: List[np.ndarray] = []
    out_v: List[np.ndarray] = []
    anchor = None  # (start, end, val) of the deepest inert accepted match
    tail: List[Tuple[int, int, int]] = []  # accepted with end > b_k - d

    for k, seg in enumerate(segs):
        if len(seg[0]) == 0:
            continue
        tail_last_end = tail[-1][1] if tail else (anchor[1] if anchor else -(1 << 60))
        if int(seg[0].min()) >= tail_last_end:
            rs, re_, rv = spec[k]
        else:
            # Exact re-resolve seeded with the boundary state, through the
            # (native) resolver: pushing the seed entries from an empty
            # queue appends exactly them (mutually non-overlapping, end-
            # ascending, and every seed end precedes every segment end), so
            # resolving [seed ++ segment] equals the seeded-queue run —
            # without the per-candidate Python push loop on exactly the
            # adversarial inputs that take this branch.
            seed = ([anchor] if anchor is not None else []) + tail
            n_seed = len(seed)
            seed_a = np.asarray(seed, dtype=np.int64).reshape(n_seed, 3)
            rs_all, re_all, rv_all = resolve_longest(
                np.concatenate([seed_a[:, 0], seg[0]]),
                np.concatenate([seed_a[:, 1], seg[1]]),
                np.concatenate([seed_a[:, 2], seg[2]]),
            )
            # Seeded entries may have been displaced/replaced: the entries
            # at/after the first change replace the already-emitted tail.
            keep = 0
            while (keep < n_seed and keep < len(rs_all)
                   and (int(rs_all[keep]), int(re_all[keep]),
                        int(rv_all[keep])) == seed[keep]):
                keep += 1
            dropped = n_seed - keep  # emitted entries now invalid
            # The anchor itself can never be displaced (every segment-k
            # candidate starts after anchor.end, see module docstring), so
            # only tail entries are ever dropped.
            assert anchor is None or keep >= 1
            if dropped:
                _drop_trailing(out_s, out_e, out_v, dropped)
            rs = np.asarray(rs_all[keep:], dtype=np.int64)
            re_ = np.asarray(re_all[keep:], dtype=np.int64)
            rv = np.asarray(rv_all[keep:], dtype=np.int64)
            # Tail bookkeeping is rebuilt below from the full emitted list.
        out_s.append(rs)
        out_e.append(re_)
        out_v.append(rv)
        # New boundary state for the next shard (cut at bounds[k+1]).
        b_next = bounds[k + 1]
        anchor, tail = _state_from_emitted(out_s, out_e, out_v, b_next, d,
                                           anchor)
    if not out_s:
        return _empty()
    return (np.concatenate(out_s), np.concatenate(out_e),
            np.concatenate(out_v))


def _phase_a(segs) -> List[Triple]:
    """Speculative per-shard resolves, thread-parallel over the GIL-free
    native resolver when there is enough work to amortize pool dispatch."""
    busy = [k for k, seg in enumerate(segs) if len(seg[0])]
    total = sum(len(segs[k][0]) for k in busy)
    native = False
    try:
        from ahocorasick_tpu.native import lib as native_lib

        native = native_lib.available()
    except Exception:
        pass
    if native and len(busy) > 1 and total >= (1 << 16):
        from concurrent.futures import ThreadPoolExecutor

        spec: List[Triple] = [_empty() for _ in segs]
        with ThreadPoolExecutor(max_workers=min(len(busy), 8)) as pool:
            futs = {k: pool.submit(resolve_longest, *segs[k]) for k in busy}
            for k, f in futs.items():
                spec[k] = f.result()
        return spec
    return [resolve_longest(*seg) if len(seg[0]) else _empty() for seg in segs]


def _drop_trailing(out_s, out_e, out_v, n: int) -> None:
    """Remove the last ``n`` emitted matches across the chunked lists."""
    while n > 0 and out_s:
        take = min(n, len(out_s[-1]))
        if take == len(out_s[-1]):
            out_s.pop(); out_e.pop(); out_v.pop()
        else:
            out_s[-1] = out_s[-1][:-take]
            out_e[-1] = out_e[-1][:-take]
            out_v[-1] = out_v[-1][:-take]
        n -= take


def _state_from_emitted(out_s, out_e, out_v, boundary: int, d: int,
                        prev_anchor):
    """(anchor, tail) at ``boundary`` from the emitted-so-far matches."""
    tail: List[Tuple[int, int, int]] = []
    anchor = prev_anchor
    # Walk back over emitted matches until ends drop to <= boundary - d.
    found_anchor = False
    for k in range(len(out_s) - 1, -1, -1):
        es = out_e[k]
        for j in range(len(es) - 1, -1, -1):
            e = int(es[j])
            if e > boundary - d:
                tail.append((int(out_s[k][j]), e, int(out_v[k][j])))
            else:
                anchor = (int(out_s[k][j]), e, int(out_v[k][j]))
                found_anchor = True
                break
        if found_anchor:
            break
    tail.reverse()
    return anchor, tail


def resolve_shortest_sharded(
    starts: np.ndarray,
    ends: np.ndarray,
    vals: np.ndarray,
    boundaries: Sequence[int],
    max_depth: int,
) -> Triple:
    """Leftmost-shortest resolve, shard-decomposed; output-identical to
    ``resolve_shortest`` over the full candidate arrays (tested).

    ``max_depth`` is accepted for signature symmetry with the longest
    variant but unused: the shortest boundary state is only the restart
    cursor ``p`` (no tail of displaceable matches exists — accepted
    shortest matches are final the moment the cursor passes them)."""
    if len(starts) == 0:
        return _empty()
    segs = _split_by_end(starts, ends, vals, boundaries)
    spec = [resolve_shortest(*seg) if len(seg[0]) else _empty() for seg in segs]
    out: List[Triple] = []
    p = -(1 << 60)  # restart cursor
    for k, seg in enumerate(segs):
        if len(seg[0]) == 0:
            continue
        if int(seg[0].min()) >= p:
            rs, re_, rv = spec[k]
        else:
            keep = seg[0] >= p
            rs, re_, rv = resolve_shortest(seg[0][keep], seg[1][keep],
                                           seg[2][keep])
        if len(rs):
            out.append((rs, re_, rv))
            p = int(re_[-1])
    if not out:
        return _empty()
    return (np.concatenate([t[0] for t in out]),
            np.concatenate([t[1] for t in out]),
            np.concatenate([t[2] for t in out]))
