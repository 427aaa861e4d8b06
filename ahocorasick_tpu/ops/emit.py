"""Host-side emission extraction: device bitplanes/states -> match triples.

Device engines return dense fixed-shape encodings (depth bitplanes, state
sequences); this module turns them into sorted ``(start, end, value_id)``
arrays with numpy, including value recovery by re-walking the trie over just
the matched spans (vectorized over matches — cost O(matches x depth), tiny
next to the scan itself).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ahocorasick_tpu.core.compiler import CompiledMatcher


def bitplanes_to_matches(bits: np.ndarray, max_depth: int) -> Tuple[np.ndarray, np.ndarray]:
    """uint32[P, N] -> (starts, lengths) int64 arrays, unsorted."""
    bits = np.asarray(bits)
    planes, n = bits.shape
    starts_all = []
    lens_all = []
    hot = np.nonzero(bits.any(axis=0))[0]
    if len(hot):
        sub = np.ascontiguousarray(bits[:, hot].T)  # (H, P)
        # Expand to (H, P*32) bit bools, little-endian within each word.
        b8 = sub.view(np.uint8).reshape(len(hot), planes * 4)
        expanded = np.unpackbits(b8, axis=1, bitorder="little")  # (H, P*32)
        rows, ks = np.nonzero(expanded)
        starts_all.append(hot[rows])
        lens_all.append(ks + 1)
    if not starts_all:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    starts = np.concatenate(starts_all).astype(np.int64)
    lens = np.concatenate(lens_all).astype(np.int64)
    keep = lens <= max_depth
    return starts[keep], lens[keep]


def walk_values(
    m: CompiledMatcher, cls: np.ndarray, starts: np.ndarray, lens: np.ndarray
) -> np.ndarray:
    """Recover value ids for (start, len) matches by re-walking the trie."""
    if len(starts) == 0:
        return np.zeros(0, dtype=np.int64)
    trie = m.trie_next
    max_len = int(lens.max())
    states = np.zeros(len(starts), dtype=np.int64)
    vals = np.full(len(starts), -1, dtype=np.int64)
    for k in range(max_len):
        active = lens > k
        idx = starts[active] + k
        states[active] = trie[states[active], cls[idx]]
        done = lens == k + 1
        vals[done] = m.own_val[states[done]]
    return vals


def sort_by_end_start(starts: np.ndarray, lens: np.ndarray):
    """Order matches as the sequential reference emits them.

    All matches ending at a position are reported longest-first
    (``AhoCorasickSet.java:522-535``), i.e. start ascending at equal end;
    across positions ends ascend.
    """
    ends = starts + lens
    order = np.lexsort((starts, ends))
    return starts[order], ends[order], order


def ac_matches(m: CompiledMatcher, cls: np.ndarray, bits: np.ndarray):
    """(starts, ends, vals) in reference emission order for the AC kinds."""
    starts, lens = bitplanes_to_matches(bits, m.max_depth)
    starts, ends, order = sort_by_end_start(starts, lens)
    lens = ends - starts
    if m.values is not None:
        vals = walk_values(m, cls, starts, lens)
    else:
        vals = np.full(len(starts), -1, dtype=np.int64)
    return starts, ends, vals


def resolve_end_planes(m: CompiledMatcher, cls: np.ndarray, bits: np.ndarray,
                       mode: str, layout: str = "planes"):
    """END-indexed emit planes -> resolved non-overlapping triples.

    Fuses candidate extraction with the greedy resolver in native C when
    available (``ac_extract_resolve``): candidates stream from the planes
    straight into the SetMatchQueue (mode="longest") or min-end restart
    (mode="shortest") automaton without being materialized — on adversarial
    inputs (every position carrying several candidate bits) the numpy
    extract+lexsort path below is the end-to-end bottleneck.  Values are
    recovered afterwards over just the accepted spans (resolution never
    depends on values).
    """
    from ahocorasick_tpu.ops import scan_batched

    try:
        from ahocorasick_tpu.native import lib as native_lib

        native_ok = native_lib.available()
    except Exception:
        native_ok = False
    if native_ok:
        # Device-side hot-position compaction first: only (idx, masks) for
        # positions with any emit bit cross the host link (match-sparse
        # texts shrink the download by >10x); dense/adversarial inputs fall
        # back to the full-plane download.  The hotstate layout decodes its
        # packed (state, count) plane to the same (idx, masks) contract.
        if layout == "hotstate":
            sp = scan_batched.hotstate_sparse(m, bits, len(cls))
        else:
            sp = scan_batched.planes_to_sparse(bits, len(cls))
        if sp is not None:
            starts, ends = native_lib.extract_resolve_sparse(
                sp[0], sp[1], len(cls), m.max_depth, mode
            )
        else:
            starts, ends = native_lib.extract_resolve(
                np.asarray(bits), len(cls), m.max_depth, mode
            )
        # Value recovery over just the accepted spans — the ONE
        # implementation shared with the AC extraction path.
        return starts, ends, scan_batched._ac_vals(m, cls, starts, ends)

    from ahocorasick_tpu.resolve.queue import resolve_longest, resolve_shortest

    trip = scan_batched.ac_matches_batched(m, cls, bits, layout=layout)
    return (resolve_longest if mode == "longest" else resolve_shortest)(*trip)


def states_to_shortest_matches(m: CompiledMatcher, states: np.ndarray):
    """Arrival states -> shortest-match triples (already end-ascending)."""
    states = np.asarray(states)
    ml = m.match_len[states]
    pos = np.nonzero(ml > 0)[0]
    ends = pos + 1
    starts = ends - ml[pos]
    vals = m.match_val[states[pos]].astype(np.int64)
    return starts.astype(np.int64), ends.astype(np.int64), vals
