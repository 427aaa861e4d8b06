"""Sequential DFA scan on device (``lax.scan``) — exact state sequences.

The goto closure compiled into ``dfa_next`` collapses the reference's
fail-transition inner loop (``AhoCorasickSet.java:212-219``) into a single
gather per character, so the whole match loop is one ``lax.scan``.  Used for:

* the leftmost-shortest matcher, whose restart-at-match semantics are
  inherently sequential (``ShortestMatchSet.java:182-260``) — but note the
  pruning compiled into its tables makes match states' closure rows equal the
  root's, so the restart needs no branch at all;
* the chunk-stitched engine (``ops/stitch.py``), which needs per-chunk state
  maps;
* batched multi-stream scanning, where throughput comes from vmapping lanes
  over independent streams.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax import lax


@jax.jit
def dfa_states(dfa_next: jax.Array, cls: jax.Array, s0=0) -> jax.Array:
    """Arrival states ``s_1 .. s_N`` for one stream (int32[N])."""

    def step(s, c):
        s2 = dfa_next[s, c]
        return s2, s2

    _, states = lax.scan(step, jnp.asarray(s0, dtype=jnp.int32), cls)
    return states


@jax.jit
def shortest_states(dfa_next: jax.Array, match_len: jax.Array, cls: jax.Array, s0=0) -> jax.Array:
    """Arrival states for the shortest matcher's lagged-restart loop.

    ``delta''[s, c] = delta[root, c] if s is a match state else delta[s, c]``
    (ShortestMatchSet.java:200-216).  Level-1 match states keep children in
    the reference (pruning skips level 1, ShortestMatchSet.java:69-111), so
    the branch is still required even though deeper match states' rows
    already equal the root's.
    """

    def step(s, c):
        row = jnp.where(match_len[s] > 0, 0, s)
        s2 = dfa_next[row, c]
        return s2, s2

    _, states = lax.scan(step, jnp.asarray(s0, dtype=jnp.int32), cls)
    return states
