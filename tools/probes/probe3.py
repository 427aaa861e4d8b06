"""Probe round 3: trustworthy timing (scalar round-trip per call).

Through the axon tunnel, ``block_until_ready`` does not reliably wait.  Every
probe function here returns a SCALAR, and timing forces ``float()`` on it —
a real device->host round-trip.  Work per call is sized to seconds so the
RPC overhead (<~0.5 s) stays visible but non-dominant; we also difference
two rep counts to cancel fixed overhead.

Run: python tools/probes/probe3
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit2(make_fn, label, lookups_per_rep, reps_lo, reps_hi):
    """Time fn(reps_lo) and fn(reps_hi); rate from the difference."""
    try:
        f_lo, args = make_fn(reps_lo)
        f_hi, _ = make_fn(reps_hi)
        float(f_lo(*args))  # compile
        float(f_hi(*args))  # compile

        def best(f):
            b = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(f(*args))
                b = min(b, time.perf_counter() - t0)
            return b

        t_lo, t_hi = best(f_lo), best(f_hi)
        dt = t_hi - t_lo
        if dt <= 0:
            print(f"  {label}: degenerate timing lo={t_lo*1e3:.1f}ms hi={t_hi*1e3:.1f}ms")
            return 0.0
        rate = (reps_hi - reps_lo) * lookups_per_rep / dt
        print(f"  {label}: lo={t_lo*1e3:.1f}ms hi={t_hi*1e3:.1f}ms -> {rate/1e6:.1f} M lookups/s")
        return rate
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:160]
        print(f"  {label}: UNSUPPORTED ({type(e).__name__}: {msg})")
        return 0.0


# -- Pallas block-gather (lane shuffles + select), scalar output -------------

def make_block_gather(T, B=512, unroll_rows=None):
    R = T // 128

    def mk(reps):
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

            out = lax.fori_loop(0, reps, body, idx_ref[:])
            out_ref[0, 0] = jnp.sum(out)

        tab = jnp.asarray(np.random.randint(0, T, (R, 128), np.int32))
        idx = jnp.asarray(np.random.randint(0, T, (B, 128), np.int32))
        fn = jax.jit(lambda t, i: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(t, i))
        return (lambda t, i: fn(t, i)[0, 0]), (tab, idx)

    return mk


# -- Pallas pure lane-gather (128-entry) -------------------------------------

def make_lane_gather(B=512):
    def mk(reps):
        def kernel(tab_ref, idx_ref, out_ref):
            tab = tab_ref[:]

            def body(r, idx):
                big = jnp.broadcast_to(tab[0:1, :], idx.shape)
                g = jnp.take_along_axis(big, idx & 127, axis=1)
                return (idx + g + r) & 127

            out = lax.fori_loop(0, reps, body, idx_ref[:])
            out_ref[0, 0] = jnp.sum(out)

        tab = jnp.asarray(np.random.randint(0, 128, (8, 128), np.int32))
        idx = jnp.asarray(np.random.randint(0, 128, (B, 128), np.int32))
        fn = jax.jit(lambda t, i: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(t, i))
        return (lambda t, i: fn(t, i)[0, 0]), (tab, idx)

    return mk


# -- Pallas 2D gather: sublane gather then lane gather (1024-entry window) ---

def make_gather2d(B=512):
    T = 1024

    def mk(reps):
        def kernel(tab_ref, idx_ref, out_ref):
            tab = tab_ref[:]  # (8,128)

            def body(r, idx):
                sub = (idx >> 7) & 7
                lane = idx & 127
                acc = jnp.zeros_like(idx)
                for base in range(0, idx.shape[0], 8):
                    blk_sub = sub[base:base + 8, :]
                    blk_lane = lane[base:base + 8, :]
                    g1 = jnp.take_along_axis(tab, blk_sub, axis=0)
                    g2 = jnp.take_along_axis(g1, blk_lane, axis=1)
                    acc = acc.at[base:base + 8, :].set(g2)
                return (idx + acc + r) & (T - 1)

            out = lax.fori_loop(0, reps, body, idx_ref[:])
            out_ref[0, 0] = jnp.sum(out)

        tab = jnp.asarray(np.random.randint(0, T, (8, 128), np.int32))
        idx = jnp.asarray(np.random.randint(0, T, (B, 128), np.int32))
        fn = jax.jit(lambda t, i: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(t, i))
        return (lambda t, i: fn(t, i)[0, 0]), (tab, idx)

    return mk


# -- XLA element gather (the incumbent engine's primitive) -------------------

def make_xla_gather(S, A, B=4096):
    def mk(reps):
        tab = jnp.asarray(np.random.randint(0, S, (S, A), np.int32))

        @jax.jit
        def fn(t, s, c):
            def body(r, s):
                return (t[s, c] + r) % S
            return jnp.sum(lax.fori_loop(0, reps, body, s))

        s = jnp.asarray(np.random.randint(0, S, (B,), np.int32))
        c = jnp.asarray(np.random.randint(0, A, (B,), np.int32))
        return fn, (tab, s, c)

    return mk


# -- XLA row gather ----------------------------------------------------------

def make_xla_row_gather(S, W, B=4096):
    def mk(reps):
        tab = jnp.asarray(np.random.randint(0, S, (S, W), np.int32))

        @jax.jit
        def fn(t, s):
            def body(r, s):
                rows = t[s]
                return (rows[:, 0] + rows[:, W - 1] + r) % S
            return jnp.sum(lax.fori_loop(0, reps, body, s))

        s = jnp.asarray(np.random.randint(0, S, (B,), np.int32))
        return fn, (tab, s)

    return mk


def main():
    print(f"devices: {jax.devices()}")
    timeit2(make_lane_gather(), "lane-gather 128-entry B=512",
            512 * 128, 2048, 16384)
    timeit2(make_gather2d(), "2D gather 1024-entry B=512",
            512 * 128, 1024, 8192)
    timeit2(make_block_gather(1024), "block-gather T=1024 B=512",
            512 * 128, 1024, 8192)
    timeit2(make_block_gather(4096), "block-gather T=4096 B=512",
            512 * 128, 512, 4096)
    timeit2(make_block_gather(16384, B=256), "block-gather T=16384 B=256",
            256 * 128, 128, 1024)
    timeit2(make_xla_gather(65536, 32), "XLA elem-gather 8MB B=4096",
            4096, 256, 2048)
    timeit2(make_xla_gather(65536, 1024), "XLA elem-gather 256MB B=4096",
            4096, 256, 2048)
    timeit2(make_xla_gather(2048, 32), "XLA elem-gather 256KB B=4096",
            4096, 256, 2048)
    timeit2(make_xla_gather(65536, 32, B=65536), "XLA elem-gather 8MB B=64Ki",
            65536, 32, 256)
    timeit2(make_xla_row_gather(65536, 32), "XLA row-gather W=32 8MB",
            4096, 256, 2048)


if __name__ == "__main__":
    main()
