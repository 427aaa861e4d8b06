"""Streaming scan over unbounded inputs — the reference's Readable mode.

The reference's stream mode (``AhoCorasickMap.match(Readable, ...)``,
``AhoCorasickMap.java:208-275``) carries exactly one node pointer across
buffer refills.  Here each matcher kind gets a *cursor* that carries the
minimal exact cross-chunk state:

* AC / Longest / Shortest — the DFA state (the goto closure makes the
  transition function total, so chunk entry state fully determines all
  subsequent behavior).  Longest additionally carries the pending
  ``MatchQueue`` and flushes only candidates that can no longer be displaced
  (end <= chunk_end - max_depth; cf. the ``idx - level`` purge invariant,
  ``LongestMatchSet.java:227``).
* Whole-word kinds — a tail of the last ``max_depth + 1`` units plus (for
  whole-word-longest) the restart-chain cursor; undecided walks are replayed
  against the next buffer.  Decisions taken at position ``i`` depend only on
  ``text[..i]``, so replay is exact.

Intentional divergence from the reference, documented per SURVEY.md §4: the
reference's ``ShortestMatchMap`` stream mode double-reports a match pending
exactly at a buffer boundary (``ShortestMatchMap.java:241-249,280-288``);
String mode is the semantic spec, so this implementation reports it once.
Stream output here equals String-mode output with global offsets for every
kind and every chunking (conformance-tested).

Positions are reported globally.  The reference's ``ReadableMatchListener``
only ever sees values (no positions); the maps' ``match_readable`` adapter
reproduces that exact surface, while ``match_stream`` also exposes global
``(start, end)`` — a strict extension.
"""

from __future__ import annotations

from typing import Callable, Iterable, List, Optional, Tuple, Union

import numpy as np

from ahocorasick_tpu.core.compiler import (
    AC,
    LONGEST,
    SHORTEST,
    WHOLE_WORD,
    WHOLE_WORD_LONGEST,
    CompiledMatcher,
)
from ahocorasick_tpu.resolve.queue import MatchQueue
from ahocorasick_tpu.utils import chartables

Match = Tuple[int, int, int]

_SCAN_BUCKET = 4096


def default_chunk_units(max_depth: int) -> int:
    """The reference's buffer-size rule (``AhoCorasickMap.java:53``)."""
    return 2 * max_depth if max_depth > 2048 else 4096


def _read_chunks(source, chunk_units: int):
    """Normalize a Readable into an iterator of non-empty strings.

    Accepts file-like objects (``read(n) -> str``) or any iterable of
    string chunks.
    """
    if hasattr(source, "read"):
        while True:
            piece = source.read(chunk_units)
            if not piece:
                return
            yield piece
    else:
        for piece in source:
            if piece:
                yield piece


class _SeqScan:
    """Cached bucketed ``lax.scan`` DFA runner (host or device backend)."""

    def __init__(self, table: np.ndarray):
        self._table = table
        self._jit = None

    def states(self, cls: np.ndarray, s0: int) -> Tuple[np.ndarray, int]:
        """Arrival states for ``cls`` starting from ``s0``; returns carry."""
        n = len(cls)
        if n == 0:
            return np.zeros(0, dtype=np.int32), s0
        if self._jit is None:
            import jax
            import jax.numpy as jnp
            from jax import lax

            from ahocorasick_tpu.core.compiler import RowTable

            if isinstance(self._table, RowTable):
                # Row-compressed table: two-level gather keeps wide-alphabet
                # dictionaries streamable without dense materialization.
                rows = jnp.asarray(self._table.rows)
                row_id = jnp.asarray(self._table.row_id)

                @jax.jit
                def run(cls_pad, s0):
                    def step(s, c):
                        s2 = rows[row_id[s], c]
                        return s2, s2

                    _, states = lax.scan(
                        step, jnp.asarray(s0, dtype=jnp.int32), cls_pad
                    )
                    return states

            else:
                table = jnp.asarray(self._table)

                @jax.jit
                def run(cls_pad, s0):
                    def step(s, c):
                        s2 = table[s, c]
                        return s2, s2

                    _, states = lax.scan(
                        step, jnp.asarray(s0, dtype=jnp.int32), cls_pad
                    )
                    return states

            self._jit = run
        n_pad = -(-n // _SCAN_BUCKET) * _SCAN_BUCKET
        cls_pad = np.zeros(n_pad, dtype=np.int32)
        cls_pad[:n] = cls
        states = np.asarray(self._jit(cls_pad, np.int32(s0)))[:n]
        return states, int(states[-1])


def expand_state_emits(
    m: CompiledMatcher, states: np.ndarray, global_off: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized suffix-chain expansion of per-position arrival states.

    Returns (starts, ends, vals) in the sequential reference's emission
    order: end ascending; at equal end, the Java ``output()`` chain order
    (own/longest first — ``AhoCorasickSet.java:522-535``).
    """
    counts = m.emit_count[states]
    pos = np.nonzero(counts)[0]
    if len(pos) == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    reps = counts[pos].astype(np.int64)
    total = int(reps.sum())
    ends = np.repeat(pos + global_off + 1, reps)
    # Per-emission index into the flat emit tables.
    offsets = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(reps) - reps, reps)
    eidx = np.repeat(m.emit_start[states[pos]].astype(np.int64), reps) + offsets
    lens = m.emit_len[eidx].astype(np.int64)
    vals = m.emit_val[eidx].astype(np.int64)
    return ends - lens, ends, vals


class _DfaCursor:
    """Streaming cursor for the AC / Longest / Shortest kinds."""

    def __init__(self, m: CompiledMatcher, table: np.ndarray):
        self.m = m
        self.scan = _SeqScan(table)
        self.state = 0
        self.off = 0  # global index of the next unit

    def feed(self, cls: np.ndarray, is_final: bool) -> List[Match]:
        raise NotImplementedError

    def state_dict(self) -> dict:
        """JSON-safe resume point: the reference's cross-chunk invariant is
        exactly (state id, offset) — ``AhoCorasickMap.java:208-275``."""
        return {"state": int(self.state), "off": int(self.off)}

    def load_state_dict(self, d: dict) -> None:
        self.state = int(d["state"])
        self.off = int(d["off"])


class _AcCursor(_DfaCursor):
    def __init__(self, m: CompiledMatcher):
        super().__init__(m, m.dfa_next)

    def feed(self, cls: np.ndarray, is_final: bool) -> List[Match]:
        states, self.state = self.scan.states(cls, self.state)
        starts, ends, vals = expand_state_emits(self.m, states, self.off)
        self.off += len(cls)
        return list(zip(starts.tolist(), ends.tolist(), vals.tolist()))


class _ShortestCursor(_DfaCursor):
    def __init__(self, m: CompiledMatcher):
        # Restart-at-root baked into the table: match-state rows equal the
        # root's (the compile-time pruning makes deep match states leaves;
        # level-1 match states are handled by the same substitution).
        from ahocorasick_tpu.core.compiler import RowTable

        is_match = m.match_len[: m.num_states] > 0
        if isinstance(m.dfa_next, RowTable):
            eff = RowTable(
                m.dfa_next.rows,
                np.where(is_match, m.dfa_next.row_id[0], m.dfa_next.row_id),
            )
        else:
            eff = m.dfa_next.copy()
            eff[is_match] = m.dfa_next[0]
        super().__init__(m, eff)

    def feed(self, cls: np.ndarray, is_final: bool) -> List[Match]:
        states, self.state = self.scan.states(cls, self.state)
        ml = self.m.match_len[states]
        pos = np.nonzero(ml > 0)[0]
        ends = pos + self.off + 1
        starts = ends - ml[pos]
        vals = self.m.match_val[states[pos]].astype(np.int64)
        self.off += len(cls)
        return list(zip(starts.tolist(), ends.tolist(), vals.tolist()))


class _LongestCursor(_DfaCursor):
    def __init__(self, m: CompiledMatcher):
        super().__init__(m, m.dfa_next)
        self.queue = MatchQueue()

    def feed(self, cls: np.ndarray, is_final: bool) -> List[Match]:
        states, self.state = self.scan.states(cls, self.state)
        starts, ends, vals = expand_state_emits(self.m, states, self.off)
        for s, e, v in zip(starts.tolist(), ends.tolist(), vals.tolist()):
            self.queue.push(s, e, v)
        self.off += len(cls)
        if is_final:
            return self.queue.drain()
        # Future candidates end after self.off and have length <= max_depth,
        # so they start at/after self.off - max_depth + 1: anything queued
        # ending before that can never be displaced.
        return self.queue.flush(self.off - self.m.max_depth)

    def state_dict(self) -> dict:
        d = super().state_dict()
        d["queue"] = self.queue.drain()
        for s, e, v in d["queue"]:
            self.queue.push(s, e, v)
        return d

    def load_state_dict(self, d: dict) -> None:
        super().load_state_dict(d)
        self.queue = MatchQueue()
        for s, e, v in d["queue"]:
            self.queue.push(int(s), int(e), int(v))


class _WordCursor:
    """Streaming cursor for the whole-word kinds (tail-replay design)."""

    def __init__(self, m: CompiledMatcher):
        self.m = m
        self.d = max(m.max_depth, 1)
        self.tail = np.zeros(0, dtype=np.int32)  # last <= d+1 classes
        self.tail_off = 0  # global index of tail[0]
        self.off = 0  # global index of the next incoming unit
        # Whole-word-longest restart chain cursor: next walk starts at the
        # first genuine word start at/after this global position.
        self.resume = 0

    # -- per-walk gold models (decision point = the index that ends them) -- #

    def _walk_ww(self, cls: np.ndarray, i0: int, is_final: bool):
        """Returns ('pending',) or ('done', decision_idx, match_or_None)."""
        m = self.m
        trie, is_word = m.trie_next, m.class_is_word
        DEAD = m.dead_state
        n = len(cls)
        s = 0
        i = i0
        while i < n:
            nxt = int(trie[s, cls[i]])
            if nxt == DEAD:
                if not is_word[cls[i]]:
                    if m.own_len[s] != 0:
                        return "done", i, (i - int(m.own_len[s]), i, int(m.own_val[s]))
                    return "done", i, None
                return "done", i, None  # dies mid-word: word cannot match
            s = nxt
            i += 1
        if is_final:
            if m.own_len[s] != 0:
                return "done", i, (i - int(m.own_len[s]), i, int(m.own_val[s]))
            return "done", i, None
        return ("pending",)

    def _walk_wwl(self, cls: np.ndarray, i0: int, is_final: bool):
        m = self.m
        trie, is_word = m.trie_next, m.class_is_word
        DEAD = m.dead_state
        n = len(cls)
        s = 0
        i = i0
        while i < n:
            nxt = int(trie[s, cls[i]])
            if nxt == DEAD:
                if not is_word[cls[i]]:
                    if m.own_len[s] != 0:
                        return "done", i, (i - int(m.own_len[s]), i, int(m.own_val[s]))
                    if m.fail_len[s] != 0:
                        fme = i - int(m.fail_off[s])
                        return "done", i, (fme - int(m.fail_len[s]), fme, int(m.fail_val[s]))
                    return "done", i, None
                # Dead end on a word char: only the carried fail match
                # reports (WholeWordLongestMatchSet.java:82-94).
                if m.fail_len[s] != 0:
                    fme = i - int(m.fail_off[s])
                    return "done", i, (fme - int(m.fail_len[s]), fme, int(m.fail_val[s]))
                return "done", i, None
            s = nxt
            i += 1
        if is_final:
            if m.own_len[s] != 0:
                return "done", i, (i - int(m.own_len[s]), i, int(m.own_val[s]))
            if m.fail_len[s] != 0:
                fme = i - int(m.fail_off[s])
                return "done", i, (fme - int(m.fail_len[s]), fme, int(m.fail_val[s]))
            return "done", i, None
        return ("pending",)

    def _word_starts(self, cls: np.ndarray) -> np.ndarray:
        """Genuine word starts in buffer-local indices.

        Index 0 counts only at true stream start; otherwise the unit before
        the buffer is inside the tail context, so local index 0's wordness
        predecessor is unknown — and irrelevant, because every undecided
        walk starts at/after ``tail_off + 1`` (tail length is d+1 while
        live walks span at most d units).
        """
        if len(cls) == 0:
            return np.zeros(0, dtype=np.int64)
        is_word = self.m.class_is_word[cls]
        prev = np.concatenate([[True], is_word[:-1]])
        if self.tail_off == 0:
            prev[0] = False
        return np.nonzero(is_word & ~prev)[0]

    def feed(self, cls: np.ndarray, is_final: bool) -> List[Match]:
        m = self.m
        buf = np.concatenate([self.tail, cls]) if len(self.tail) else cls
        buf_off = self.tail_off
        prev_end = self.off  # decisions before this were already delivered
        n = len(buf)
        walk = self._walk_ww if m.kind == WHOLE_WORD else self._walk_wwl
        chain = m.kind == WHOLE_WORD_LONGEST
        out: List[Match] = []

        ws_local = self._word_starts(buf)
        for j in range(len(ws_local)):
            i0 = int(ws_local[j])
            g0 = buf_off + i0
            if chain and g0 < self.resume:
                continue
            res = walk(buf, i0, is_final)
            if res[0] == "pending":
                # Walk undecided at buffer end; replay it next chunk (its
                # start lies within the carried tail by the depth bound).
                # Plain whole-word walks are per-word independent, so later
                # word starts still run now; the longest kind's restart
                # chain is sequential, so it must stop here.
                if chain:
                    break
                continue
            _, dec, match = res
            if match is not None and buf_off + dec >= prev_end:
                out.append((match[0] + buf_off, match[1] + buf_off, match[2]))
            if chain:
                # Resume after the word containing the die position: the
                # first word start strictly greater than it
                # (WholeWordLongestMatchSet.java:91-99).
                self.resume = buf_off + dec + 1

        self.off += len(cls)
        keep = min(n, self.d + 1)
        self.tail = buf[n - keep :]
        self.tail_off = buf_off + (n - keep)
        return out

    def state_dict(self) -> dict:
        return {
            "tail": self.tail.tolist(),
            "tail_off": int(self.tail_off),
            "off": int(self.off),
            "resume": int(self.resume),
        }

    def load_state_dict(self, d: dict) -> None:
        self.tail = np.asarray(d["tail"], dtype=np.int32)
        self.tail_off = int(d["tail_off"])
        self.off = int(d["off"])
        self.resume = int(d["resume"])


def make_cursor(m: CompiledMatcher):
    if m.kind == AC:
        return _AcCursor(m)
    if m.kind == LONGEST:
        return _LongestCursor(m)
    if m.kind == SHORTEST:
        return _ShortestCursor(m)
    return _WordCursor(m)


class StreamScanner:
    """Push- or pull-based streaming façade over a compiled matcher."""

    def __init__(self, m: CompiledMatcher, chunk_units: Optional[int] = None):
        self.m = m
        self.chunk_units = chunk_units or default_chunk_units(max(m.max_depth, 1))
        self.cursor = make_cursor(m)

    def _classes(self, text: str) -> np.ndarray:
        return self.m.charmap[chartables.to_utf16_units(text)]

    def scan(self, source) -> "Iterable[Match]":
        """Yield global (start, end, value_id) triples as they finalize."""
        it = _read_chunks(source, self.chunk_units)
        piece = next(it, None)
        while piece is not None:
            nxt = next(it, None)
            cls = self._classes(piece)
            for match in self.cursor.feed(cls, is_final=nxt is None):
                yield match
            piece = nxt
        if self.cursor.off == 0:
            # Empty stream: still run the end-of-input path once.
            for match in self.cursor.feed(np.zeros(0, dtype=np.int32), is_final=True):
                yield match

    # Resumable scans: persist/restore the cursor between processes.
    def state_dict(self) -> dict:
        return self.cursor.state_dict()

    def load_state_dict(self, d: dict) -> None:
        self.cursor.load_state_dict(d)

    def feed(self, text: str, is_final: bool) -> "List[Match]":
        """Push-mode: feed one text chunk, get finalized global triples."""
        return self.cursor.feed(self._classes(text), is_final)
