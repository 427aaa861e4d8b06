"""Probe round 5: cheaper per-lane column select after the row gather.

probe4 showed the row gather itself sustains ~600 M rows/s (sum-control)
but the one-hot select consumer drags the chained DFA step to 325-490 M/s.
Candidates measured here, all chained (select feeds the next gather):

* onehot   — iota==c compare, where, reduce-sum (the v6/v7 baseline)
* logtree  — 5 rounds of binary halving driven by the bits of c:
             rows = where(bit_k(c), right_half, left_half); ~36 ops/lane
             vs ~96 for onehot
* dotbf16  — one-hot in bf16, select via batched dot (MXU) — exactness
             requires values < 2^8 per limb; measured for rate only

Also sweeps lane count B for the winning select (latency amortization).

Run: python tools/probes/probe5
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from probe3 import timeit2


def _select(rows, c, A, how):
    if how == "onehot":
        oh = lax.broadcasted_iota(jnp.int32, (1, A), 1) == c[:, None]
        return jnp.sum(jnp.where(oh, rows, 0), axis=1)
    if how == "logtree":
        bits = A.bit_length() - 1  # A power of two
        cur = rows
        for k in range(bits):
            half = cur.shape[1] // 2
            take_hi = ((c >> k) & 1).astype(bool)[:, None]
            cur = jnp.where(take_hi, cur[:, half:], cur[:, :half])
        return cur[:, 0]
    raise ValueError(how)


def make_row_step(S, A, B, how):
    def mk(reps):
        tab = jnp.asarray(np.random.randint(0, S, (S, A), np.int32))
        cs = jnp.asarray(np.random.randint(0, A, (8, B), np.int32))

        @jax.jit
        def fn(t, s, cs):
            def body(r, s):
                nxt = _select(t[s], cs[r % 8], A, how)
                return (nxt + r) % S

            s = lax.fori_loop(0, reps, body, s)
            return jnp.sum(s)

        s = jnp.asarray(np.random.randint(0, S, (B,), np.int32))
        return fn, (tab, s, cs)

    return mk


def main():
    print(f"devices: {jax.devices()}")
    for how in ("onehot", "logtree"):
        for B in (4096, 32768, 65536, 131072):
            timeit2(
                make_row_step(65536, 32, B, how),
                f"row-step {how} S=64k A=32 B={B}",
                B,
                64,
                max(512, (1 << 22) // B),
            )


if __name__ == "__main__":
    main()
