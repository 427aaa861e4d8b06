"""Failureless parallel trie scan — the flagship TPU engine.

The reference's hot loop (``AhoCorasickSet.java:204-226``) is a sequential
char-at-a-time walk whose fail links exist *only* so a single-threaded
scanner never has to restart.  On TPU we invert the design: every text
position is an independent lane that walks the pure trie (no fail links)
until it dies, all lanes in parallel on the VPU.  Every keyword occurrence
starting at position ``i`` lies on the trie path spelled by ``text[i:]``, so
the union of all lane emissions is exactly the all-matches output of the
sequential automaton — with zero cross-lane dependencies, which is what lets
the scan shard freely across lanes, cores, and chips.

Emissions are encoded as per-position *depth bitplanes*: bit ``k`` of plane
word ``p`` at position ``i`` means a keyword of length ``32*p + k + 1``
matches at ``i``.  This keeps the device side fixed-shape and dense; host
code (``ops/emit.py``) turns planes into ``(start, end, value)`` triples.

Inputs are alphabet classes (``charmap[text]``), padded on the right with
``PAD_CLASS`` (class 0 — by construction no trie edge carries it, so padding
kills every lane without emitting).  Loops are rolled (``lax.fori_loop``) so
compile time does not scale with keyword length.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

PAD_CLASS = 0


def pad_classes(cls, max_depth: int, bucket: int = 1):
    """Right-pad class array so every lane can read ``max_depth`` chars.

    ``bucket`` additionally rounds the lane count up (reducing distinct
    compiled shapes); padded lanes die on PAD_CLASS and emit nothing.
    """
    import numpy as np

    cls = np.asarray(cls)
    n = len(cls)
    n_pad = -(-max(n, 1) // bucket) * bucket
    return np.pad(cls, (0, n_pad - n + max_depth), constant_values=PAD_CLASS)


@functools.partial(jax.jit, static_argnames=("max_depth", "num_planes"))
def pfac_bitplanes(
    trie_next: jax.Array,  # int32[S+1, A]
    is_match: jax.Array,  # bool[S+1] own-match flag
    cls_padded: jax.Array,  # int32[N + max_depth]
    max_depth: int,
    num_planes: int,
) -> jax.Array:
    """Returns uint32[num_planes, N] match bitplanes."""
    n = cls_padded.shape[0] - max_depth
    # Depth 0 transition from the root is a plain row gather.
    states0 = trie_next[0][cls_padded[:n]]
    planes0 = jnp.zeros((num_planes, n), dtype=jnp.uint32)
    planes0 = planes0.at[0].add(is_match[states0].astype(jnp.uint32))

    def body(k, carry):
        states, planes = carry
        chars = lax.dynamic_slice(cls_padded, (k,), (n,))
        states = trie_next[states, chars]
        bit = is_match[states].astype(jnp.uint32) << jnp.uint32(k % 32)
        planes = lax.dynamic_update_index_in_dim(
            planes, lax.dynamic_index_in_dim(planes, k // 32, 0, keepdims=False) | bit, k // 32, 0
        )
        return states, planes

    _, planes = lax.fori_loop(1, max_depth, body, (states0, planes0))
    return planes


@functools.partial(jax.jit, static_argnames=("max_depth",))
def pfac_count(
    trie_next: jax.Array,
    is_match: jax.Array,
    cls_padded: jax.Array,
    max_depth: int,
) -> jax.Array:
    """Total number of matches (empty-listener analog): scalar int32."""
    n = cls_padded.shape[0] - max_depth
    states0 = trie_next[0][cls_padded[:n]]
    total0 = jnp.sum(is_match[states0].astype(jnp.int32))

    def body(k, carry):
        states, total = carry
        chars = lax.dynamic_slice(cls_padded, (k,), (n,))
        states = trie_next[states, chars]
        return states, total + jnp.sum(is_match[states].astype(jnp.int32))

    _, total = lax.fori_loop(1, max_depth, body, (states0, total0))
    return total


@functools.partial(jax.jit, static_argnames=("max_depth", "num_planes"))
def pfac_whole_word_bitplanes(
    trie_next: jax.Array,  # int32[S+1, A]
    is_match: jax.Array,  # bool[S+1]
    class_is_word: jax.Array,  # bool[A]
    cls_padded: jax.Array,  # int32[N + max_depth + 1]
    max_depth: int,
    num_planes: int,
) -> jax.Array:
    """Whole-word matches as bitplanes over *word-start* lanes.

    Whole-word matching (``WholeWordMatchSet.java:47-132``) decomposes
    per-word: trie edges carry only word characters, so every walk is
    confined to one maximal word run and the sequential scanner's restart
    position is always simply the next word start.  A lane emits at depth
    ``k`` iff it starts a word, the state has an own match, and the walk
    *dies* on the following non-word char — the reference's exact
    "no transition AND non-word" condition (:63-72); EOF falls out because
    the pad class is a non-word dead end.  Returns uint32[num_planes, N].
    """
    n = cls_padded.shape[0] - max_depth - 1
    dead = jnp.int32(trie_next.shape[0] - 1)
    word = class_is_word[cls_padded]
    prev_word = jnp.concatenate([jnp.zeros((1,), dtype=word.dtype), word[: n - 1]])
    lane_ok = word[:n] & ~prev_word  # word starts

    def hit_bit(states, k):
        chars_next = lax.dynamic_slice(cls_padded, (k + 1,), (n,))
        next_states = trie_next[states, chars_next]
        boundary = ~lax.dynamic_slice(word, (k + 1,), (n,))
        hit = lane_ok & is_match[states] & (next_states == dead) & boundary
        return next_states, hit.astype(jnp.uint32) << jnp.uint32(k % 32)

    states0 = trie_next[0][cls_padded[:n]]
    planes0 = jnp.zeros((num_planes, n), dtype=jnp.uint32)
    states1, bit0 = hit_bit(states0, 0)
    planes0 = planes0.at[0].add(bit0)

    def body(k, carry):
        states, planes = carry
        states, bit = hit_bit(states, k)
        planes = lax.dynamic_update_index_in_dim(
            planes, lax.dynamic_index_in_dim(planes, k // 32, 0, keepdims=False) | bit, k // 32, 0
        )
        return states, planes

    _, planes = lax.fori_loop(1, max_depth, body, (states1, planes0))
    return planes
