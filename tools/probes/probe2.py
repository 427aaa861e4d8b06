"""Probe round 2: sustained block-gather rates, sublane gather support,
XLA row-gather width scaling (for the big-dictionary stride-2 path).

Run: python tools/probes/probe2
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from probe import _timeit


def probe_block_gather_sustained(T, reps, B=512):
    """Chained block-decomposed gather from a T-entry VMEM table."""
    R = T // 128

    def kernel(tab_ref, idx_ref, out_ref):
        def body(r, idx):
            row_id = idx >> 7
            lane = idx & 127
            acc = jnp.zeros_like(idx)
            for j in range(R):
                big = jnp.broadcast_to(tab_ref[j:j + 1, :], idx.shape)
                g = jnp.take_along_axis(big, lane, axis=1)
                acc = jnp.where(row_id == j, g, acc)
            return (idx + acc + r) & (T - 1)

        out_ref[:] = lax.fori_loop(0, reps, body, idx_ref[:])

    tab = jnp.asarray(np.random.randint(0, T, (R, 128), np.int32))
    idx = jnp.asarray(np.random.randint(0, T, (B, 128), np.int32))
    fn = jax.jit(lambda t, i: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, i))
    return _timeit(fn, tab, idx, label=f"block-gather T={T} reps={reps} B={B}",
                   lookups_per_call=reps * B * 128)


def probe_sublane_gather():
    """Is take_along_axis along sublanes (axis=0) supported?"""
    def kernel(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:] & 7, axis=0)

    tab = jnp.asarray(np.random.randint(0, 100, (8, 128), np.int32))
    idx = jnp.asarray(np.random.randint(0, 8, (8, 128), np.int32))
    fn = jax.jit(lambda t, i: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, i))
    return _timeit(fn, tab, idx, label="sublane gather (axis=0) support",
                   lookups_per_call=1024)


def probe_gather2d(T=1024, reps=1024, B=512):
    """1024-entry table as (8,128): sublane-gather then lane-gather."""
    def kernel(tab_ref, idx_ref, out_ref):
        tab = tab_ref[:]  # (8, 128)

        def body(r, idx):
            sub = (idx >> 7) & 7
            lane = idx & 127
            rows = jnp.take_along_axis(tab, jnp.broadcast_to(sub[0:8, :], (8, 128)) * 0 + sub[0:8, :], axis=0) if False else None
            # per 8-sublane group: gather rows by sublane idx, then lanes
            g1 = jnp.take_along_axis(jnp.broadcast_to(tab, idx.shape[:1] + (128,)) if False else tab, sub[:8, :], axis=0)
            out = jnp.take_along_axis(g1, lane[:8, :], axis=1)
            full = jnp.zeros_like(idx)
            full = full.at[:8, :].set(out)
            return (idx + full) & (T - 1)

        out_ref[:] = lax.fori_loop(0, reps, body, idx_ref[:])

    tab = jnp.asarray(np.random.randint(0, T, (8, 128), np.int32))
    idx = jnp.asarray(np.random.randint(0, T, (B, 128), np.int32))
    fn = jax.jit(lambda t, i: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, i))
    return _timeit(fn, tab, idx, label="2D gather (sublane+lane) T=1024",
                   lookups_per_call=reps * 8 * 128)


def probe_xla_row_gather(S, W, reps, B=4096):
    """XLA row gather: rows of W int32 from an (S, W) table, chained."""
    tab = jnp.asarray(np.random.randint(0, S, (S, W), np.int32))

    @jax.jit
    def fn(t, s):
        def body(r, s):
            rows = t[s]                      # (B, W)
            return (rows[:, 0] + rows[:, W - 1] + r) % S
        return lax.fori_loop(0, reps, body, s)

    s = jnp.asarray(np.random.randint(0, S, (B,), np.int32))
    return _timeit(fn, tab, s, label=f"XLA row-gather S={S} W={W} ({S*W*4//(1<<20)}MB)",
                   lookups_per_call=reps * B)


def probe_xla_elem_gather(S, A, reps, B=4096):
    tab = jnp.asarray(np.random.randint(0, S, (S, A), np.int32))

    @jax.jit
    def fn(t, s, c):
        def body(r, s):
            return (t[s, c] + r) % S
        return lax.fori_loop(0, reps, body, s)

    s = jnp.asarray(np.random.randint(0, S, (B,), np.int32))
    c = jnp.asarray(np.random.randint(0, A, (B,), np.int32))
    return _timeit(fn, tab, s, c,
                   label=f"XLA elem-gather S={S} A={A} ({S*A*4//(1<<20)}MB) B={B}",
                   lookups_per_call=reps * B)


def main():
    print(f"devices: {jax.devices()}")
    probe_sublane_gather()
    probe_block_gather_sustained(4096, reps=4096)
    probe_block_gather_sustained(32768, reps=512)
    probe_block_gather_sustained(131072, reps=128)
    probe_xla_elem_gather(65536, 32, reps=256)        # 8 MB (stride-1 scale)
    probe_xla_elem_gather(65536, 1024, reps=256)      # 256 MB (stride-2 scale)
    probe_xla_row_gather(65536, 32, reps=256)         # row = 128 B
    probe_xla_row_gather(65536, 256, reps=128)        # row = 1 KB
    probe_xla_row_gather(2048, 32, reps=256, B=65536) # big batch, small table


if __name__ == "__main__":
    main()
