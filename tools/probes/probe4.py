"""Probe round 4: the row-gather DFA step — the candidate fast primitive.

probe3 measured XLA row-gathers at ~512 M rows/s (vs 73 M/s element
gathers), but consumed only 2 static columns, which XLA can narrow.  Here we
measure the REAL engine step: gather row ``table[s]`` then select column
``c`` per lane (one-hot dot), chained — nothing narrowable.

Run: python tools/probes/probe4
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from probe3 import timeit2


def make_row_step(S, A, B=4096, sel="onehot"):
    """Chained DFA-like step: s = select(table[s], c_r) % S."""
    def mk(reps):
        tab = jnp.asarray(np.random.randint(0, S, (S, A), np.int32))
        cs = jnp.asarray(np.random.randint(0, A, (8, B), np.int32))

        @jax.jit
        def fn(t, s, cs):
            def body(r, s):
                rows = t[s]  # (B, A)
                c = cs[r % 8]
                if sel == "onehot":
                    oh = (jax.lax.broadcasted_iota(jnp.int32, (1, A), 1) == c[:, None])
                    nxt = jnp.sum(jnp.where(oh, rows, 0), axis=1)
                elif sel == "take":
                    nxt = jnp.take_along_axis(rows, c[:, None], axis=1)[:, 0]
                else:  # full-row sum control (narrowing-proof, no select)
                    nxt = jnp.sum(rows, axis=1)
                return (nxt + r) % S
            s = lax.fori_loop(0, reps, body, s)
            return jnp.sum(s)

        s = jnp.asarray(np.random.randint(0, S, (B,), np.int32))
        return fn, (tab, s, cs)

    return mk


def main():
    print(f"devices: {jax.devices()}")
    # stride-1 geometry: 64k states x 32 classes (the 10k-keyword config)
    timeit2(make_row_step(65536, 32, sel="onehot"),
            "row-step onehot S=64k A=32 B=4096 (8MB)", 4096, 64, 512)
    timeit2(make_row_step(65536, 32, sel="take"),
            "row-step take S=64k A=32 B=4096 (8MB)", 4096, 64, 512)
    timeit2(make_row_step(65536, 32, sel="sum"),
            "row-step sum-control S=64k A=32 (8MB)", 4096, 64, 512)
    # stride-2 geometry: (S*A) rows = 2M rows x 32 cols = 268MB
    timeit2(make_row_step(1 << 21, 32, sel="onehot"),
            "row-step onehot S=2M A=32 B=4096 (268MB)", 4096, 64, 512)
    # wider rows (stride-3 geometry: row = A^2 columns)
    timeit2(make_row_step(65536, 1024, sel="onehot", B=2048),
            "row-step onehot S=64k A=1024 B=2048 (256MB)", 2048, 32, 256)
    # batch scaling
    timeit2(make_row_step(65536, 32, sel="onehot", B=32768),
            "row-step onehot S=64k A=32 B=32k", 32768, 16, 128)
    # small-table stride-1 (the 100-keyword config: 1024 x 32)
    timeit2(make_row_step(1024, 32, sel="onehot"),
            "row-step onehot S=1024 A=32 B=4096 (128KB)", 4096, 64, 512)


if __name__ == "__main__":
    main()
