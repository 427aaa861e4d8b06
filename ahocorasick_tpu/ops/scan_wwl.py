"""Whole-word-longest parallel walk engine.

``WholeWordLongestMatchSet.match`` (reference :47-178) restarts its trie walk
at a position that depends on where the *previous* walk died — an inherently
sequential chain.  The TPU decomposition: compute, for **every** lane in
parallel, the full outcome of "a walk starting here": the die position, and
the single match that walk would emit (own match or carried fail match per
the reference's rules).  The sequential chain then reduces to following a
precomputed ``next_start`` pointer array on the host (``resolve/wholeword.py``)
— one gather per executed walk instead of one per character.

Walk outcome rules (mirroring the reference loop exactly):

* the walk dies at the first char with no trie transition (state DEAD);
* die char non-word: emit own match if any, else the carried fail match;
* die char word: emit only the carried fail match (the word is unfinished);
* end of input: own-else-fail — falls out automatically because the pad
  class is a non-word dead end.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

LANE_BUCKET = 1 << 12  # lane-count rounding (matchers._LANE_BUCKET)


def bucket_depth(d: int) -> int:
    """Walk depth padded to x4 (fewer distinct executables; extra steps
    only walk dead lanes).  Single source for matcher/bench/stream."""
    return max(-(-d // 4) * 4, 4)


def compact_lanes(compiled, cls: np.ndarray, text_start: bool = True):
    """Compact walk-lane inputs for the whole-word-longest engine:
    ``(cls_p, starts, lanes, ws, d)`` — the ONE production configuration
    (padding, bucketing, lane rule) shared by the matcher device path,
    ``bench.wwl_kernel_rate``, and the streaming cursor.

    ``text_start``: ``cls[0]`` is the TRUE beginning of the text.  Then
    index 0 is always a lane (the reference's initial walk starts at 0
    whatever its wordness), and a word char at 0 is a genuine word start.
    Streaming cursors pass False for mid-stream buffers: local index 0's
    predecessor lives outside the buffer, so it must NOT be treated as a
    word start (every live walk starts at/after local 1 — the carried
    tail is one unit longer than any walk span)."""
    from ahocorasick_tpu.ops import scan_pfac

    d = bucket_depth(compiled.max_depth)
    cls_p = scan_pfac.pad_classes(cls, d + 1, bucket=LANE_BUCKET)
    is_word = np.asarray(compiled.class_is_word)[cls]
    if len(is_word):
        prev = np.concatenate([[not text_start], is_word[:-1]])
        ws = np.nonzero(is_word & ~prev)[0].astype(np.int64)
    else:
        ws = np.zeros(0, dtype=np.int64)
    lanes = ws
    if text_start and (len(ws) == 0 or ws[0] != 0) and len(cls):
        lanes = np.concatenate([np.zeros(1, dtype=np.int64), ws])
    Wp = 256
    while Wp < max(len(lanes), 1):
        Wp *= 2
    starts = np.full(Wp, len(cls), dtype=np.int32)
    starts[: len(lanes)] = lanes
    return cls_p, starts, lanes, ws, d


@functools.partial(jax.jit, static_argnames=("max_depth",))
def wwl_walks(
    trie_next: jax.Array,  # int32[S+1, A]
    own_len: jax.Array,  # int32[S+1]
    own_val: jax.Array,  # int32[S+1]
    fail_len: jax.Array,  # int32[S+1]
    fail_off: jax.Array,  # int32[S+1]
    fail_val: jax.Array,  # int32[S+1]
    class_is_word: jax.Array,  # bool[A]
    cls_padded: jax.Array,  # int32[N + max_depth + 1], pad = non-word class 0
    max_depth: int,
):
    """Per-lane walk outcomes.

    Returns ``(die_pos, has_match, m_start, m_end, m_val)`` — all int32[N]
    (``has_match`` bool), where ``die_pos`` is the absolute index of the char
    that killed the walk starting at lane ``i``.
    """
    n = cls_padded.shape[0] - max_depth - 1
    dead = jnp.int32(trie_next.shape[0] - 1)

    # Every walk dies within max_depth+1 steps: a live state at step k sits at
    # trie depth k, and the trie has no nodes deeper than max_depth.
    def body(k, carry):
        states, k_die, s_last = carry
        chars = lax.dynamic_slice(cls_padded, (k,), (n,))
        nxt = trie_next[states, chars]
        newly = (k_die < 0) & (nxt == dead)
        k_die = jnp.where(newly, k, k_die)
        s_last = jnp.where(newly, states, s_last)
        return nxt, k_die, s_last

    # Derive carries from the input so their sharding varyingness matches
    # inside shard_map bodies (plain zeros are 'replicated' there).
    z = (lax.dynamic_slice(cls_padded, (0,), (n,)) * 0).astype(jnp.int32)
    init = (z, z - 1, z)
    _, k_die, s_last = lax.fori_loop(0, max_depth + 1, body, init)

    lane = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    die_pos = lane + k_die
    return _walk_outcomes(own_len, own_val, fail_len, fail_off, fail_val,
                          class_is_word, cls_padded, die_pos, s_last)


def _walk_outcomes(own_len, own_val, fail_len, fail_off, fail_val,
                   class_is_word, cls_padded, die_pos, s_last):
    die_cls = cls_padded[die_pos]
    die_word = class_is_word[die_cls]

    own = own_len[s_last]
    fl = fail_len[s_last]
    has_own = (own > 0) & ~die_word
    has_fail = (fl > 0) & (die_word | (own == 0))
    end = jnp.where(has_own, die_pos, die_pos - fail_off[s_last])
    length = jnp.where(has_own, own, fl)
    val = jnp.where(has_own, own_val[s_last], fail_val[s_last])
    has = has_own | has_fail
    return die_pos, has, end - length, end, val


@functools.partial(jax.jit, static_argnames=("max_depth",))
def wwl_walks_at(
    trie_next: jax.Array,  # int32[S+1, A]
    own_len: jax.Array,
    own_val: jax.Array,
    fail_len: jax.Array,
    fail_off: jax.Array,
    fail_val: jax.Array,
    class_is_word: jax.Array,  # bool[A]
    cls_padded: jax.Array,  # int32[>= max_start + max_depth + 1]
    starts: jax.Array,  # int32[W] walk start positions (padded lanes OK)
    max_depth: int,
):
    """Walk outcomes for the given START POSITIONS only.

    The restart chain consumes walks only at position 0 and word starts
    (``resolve/wholeword.follow_chain`` hops die -> first word start after
    it), so computing every lane wastes ~(1/word-start-density)x work.
    This variant pays one char gather + one (flat) trie gather per
    (start, step) — a win while word starts are sparse; the full
    ``wwl_walks`` keeps its free contiguous per-step slices for dense
    inputs.  Padded start slots should point at the PAD region (class 0,
    non-word): their walks die at step 0 with no match.
    """
    A = jnp.int32(trie_next.shape[1])
    tf = trie_next.reshape(-1)
    dead = jnp.int32(trie_next.shape[0] - 1)

    def body(k, carry):
        states, k_die, s_last = carry
        chars = cls_padded[starts + k]
        nxt = tf[states * A + chars]
        newly = (k_die < 0) & (nxt == dead)
        k_die = jnp.where(newly, k, k_die)
        s_last = jnp.where(newly, states, s_last)
        return nxt, k_die, s_last

    z = (starts * 0).astype(jnp.int32)
    _, k_die, s_last = lax.fori_loop(0, max_depth + 1, body, (z, z - 1, z))
    die_pos = starts + k_die
    return _walk_outcomes(own_len, own_val, fail_len, fail_off, fail_val,
                          class_is_word, cls_padded, die_pos, s_last)
