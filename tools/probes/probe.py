"""Pallas primitive probes: what does THIS chip actually support, and how fast?

The XLA envelope (docs/PERF.md) caps table lookups at ~120 M/s/chip, which
bounds every automaton formulation.  Pallas/Mosaic exposes hardware paths XLA
never emits for gathers — lane shuffles, in-VMEM scalar loads, MXU one-hot
selection.  Each probe below measures one candidate transition primitive;
run as ``python tools/probes/probe`` on the real chip.

Timing hygiene (docs/PERF.md "tunnel facts"): reps inside one jit with
data-dependent chaining (each rep's indices derive from the previous rep's
results) so neither XLA nor Mosaic can hoist or CSE the work, and per-call
work is several seconds to swamp the ~0.5 s dispatch RPC.
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _timeit(fn, *args, label="", lookups_per_call=0):
    try:
        out = jax.block_until_ready(fn(*args))  # compile + warmup
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            best = min(best, time.perf_counter() - t0)
        rate = lookups_per_call / best
        print(f"  {label}: {best*1e3:.1f} ms -> {rate/1e6:.1f} M lookups/s")
        return rate, out
    except Exception as e:  # noqa: BLE001 - probe anything, report everything
        msg = str(e).split("\n")[0][:200]
        print(f"  {label}: UNSUPPORTED ({type(e).__name__}: {msg})")
        return 0.0, None


# ---------------------------------------------------------------------------
# P1: lane-shuffle gather — take_along_axis along the 128-lane axis.
# If this is ~1 VPU op per (8,128) register, 128-entry tables gather at
# multi-G/s and bigger tables decompose into lane-gather + select per row.
# ---------------------------------------------------------------------------

def probe_lane_gather(reps=2048, B=512):
    def kernel(tab_ref, idx_ref, out_ref):
        tab = tab_ref[:]  # (8, 128) int32, values in [0, 128)

        def body(r, idx):
            g = jnp.take_along_axis(tab[0:1, :], idx[0:1, :] & 127, axis=1)
            idx = (idx + g) & 127  # chain: next indices depend on gather
            return idx

        # full-block variant: gather (B,128) from a broadcast row
        def body_full(r, idx):
            big = jnp.broadcast_to(tab[0:1, :], idx.shape)
            g = jnp.take_along_axis(big, idx & 127, axis=1)
            return (idx + g) & 127

        out_ref[:] = lax.fori_loop(0, reps, body_full, idx_ref[:])

    tab = jnp.asarray(np.random.randint(0, 128, (8, 128), np.int32))
    idx = jnp.asarray(np.random.randint(0, 128, (B, 128), np.int32))
    fn = jax.jit(lambda t, i: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, i))
    return _timeit(fn, tab, idx, label=f"P1 lane-gather 128-entry chained (B={B})",
                   lookups_per_call=reps * B * 128)


# ---------------------------------------------------------------------------
# P1b: two-level gather — table of T entries as (T//128) rows; per row a
# lane-gather + masked select.  Cost should be ~2 ops per row per register.
# ---------------------------------------------------------------------------

def probe_block_gather(T=4096, reps=256, B=256):
    R = T // 128

    def kernel(tab_ref, idx_ref, out_ref):
        def body(r, idx):
            row_id = idx >> 7          # which 128-entry row
            lane = idx & 127
            acc = jnp.zeros_like(idx)
            for j in range(R):
                big = jnp.broadcast_to(tab_ref[j:j + 1, :], idx.shape)
                g = jnp.take_along_axis(big, lane, axis=1)
                acc = jnp.where(row_id == j, g, acc)
            return (idx + acc) & (T - 1)

        out_ref[:] = lax.fori_loop(0, reps, body, idx_ref[:])

    tab = jnp.asarray(np.random.randint(0, T, (R, 128), np.int32))
    idx = jnp.asarray(np.random.randint(0, T, (B, 128), np.int32))
    fn = jax.jit(lambda t, i: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, i))
    return _timeit(fn, tab, idx, label=f"P1b block-gather T={T} (B={B})",
                   lookups_per_call=reps * B * 128)


# ---------------------------------------------------------------------------
# P2: scalar chained loads from a VMEM table — K independent DFA-style chains
# driven by the scalar core.  Measures in-VMEM scalar load throughput.
# ---------------------------------------------------------------------------

def probe_scalar_chain(S=4096, reps=4096, K=8):
    def kernel(tab_ref, s0_ref, out_ref):
        def body(r, ss):
            return tuple(tab_ref[s // 128, s % 128] for s in ss)

        ss = lax.fori_loop(0, reps, body, tuple(s0_ref[k] for k in range(K)))
        for k in range(K):
            out_ref[k] = ss[k]

    tab = jnp.asarray(np.random.randint(0, S, (S // 128, 128), np.int32))
    s0 = jnp.asarray(np.random.randint(0, S, (K,), np.int32))
    fn = jax.jit(lambda t, s: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((K,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )(t, s))
    return _timeit(fn, tab, s0, label=f"P2 scalar chain K={K} S={S}",
                   lookups_per_call=reps * K)


# ---------------------------------------------------------------------------
# P3: dynamic sublane row slice — tab_ref[pl.ds(s, 1), :] per chain step.
# A row costs one dynamic slice; is that ~1 cycle or ~1 DMA?
# ---------------------------------------------------------------------------

def probe_row_slice(S=4096, reps=2048, K=4):
    def kernel(tab_ref, s0_ref, out_ref):
        def body(r, ss):
            out = []
            for s in ss:
                row = tab_ref[pl.ds(s, 1), :]  # (1, 128)
                out.append(jnp.max(row).astype(jnp.int32) % S)
            return tuple(out)

        ss = lax.fori_loop(0, reps, body, tuple(s0_ref[k] for k in range(K)))
        for k in range(K):
            out_ref[k] = ss[k]

    tab = jnp.asarray(np.random.randint(0, S, (S, 128), np.int32))
    s0 = jnp.asarray(np.random.randint(0, S, (K,), np.int32))
    fn = jax.jit(lambda t, s: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((K,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )(t, s0))
    return _timeit(fn, tab, s0, label=f"P3 row-slice chain K={K}",
                   lookups_per_call=reps * K)


# ---------------------------------------------------------------------------
# P4: MXU one-hot lookup — next = onehot(idx) @ table_column, fp32.
# Exact for table values < 2^24.  Viable for small flat tables.
# ---------------------------------------------------------------------------

def probe_mxu_onehot(T=2048, reps=128, B=1024):
    def kernel(tab_ref, idx_ref, out_ref):
        tab = tab_ref[:]  # (T, 128) fp32 columns replicated; we use col 0

        def body(r, idx):
            # idx: (B, 128)? MXU wants (B, T) @ (T, 128). Build one-hot over T.
            ii = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1)
            oh = (ii == idx[:, 0:1]).astype(jnp.float32)  # (B, T), one per row
            g = jnp.dot(oh, tab, preferred_element_type=jnp.float32)  # (B,128)
            return (idx + g.astype(jnp.int32)) & (T - 1)

        out_ref[:] = lax.fori_loop(0, reps, body, idx_ref[:])

    tabv = np.random.randint(0, T, (T, 128)).astype(np.float32)
    tab = jnp.asarray(tabv)
    idx = jnp.asarray(np.random.randint(0, T, (B, 128), np.int32))
    fn = jax.jit(lambda t, i: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, i))
    return _timeit(fn, tab, idx, label=f"P4 MXU one-hot T={T} (B={B}/step)",
                   lookups_per_call=reps * B)


# ---------------------------------------------------------------------------
# P5: XLA gather rate vs table size (context for the Pallas numbers).
# ---------------------------------------------------------------------------

def probe_xla_gather(S=65536, A=32, reps=64, B=4096):
    tab = jnp.asarray(np.random.randint(0, S, (S, A), np.int32))

    @jax.jit
    def fn(t, s, c):
        def body(r, s):
            return t[s, c] % S
        return lax.fori_loop(0, reps, body, s)

    s = jnp.asarray(np.random.randint(0, S, (B,), np.int32))
    c = jnp.asarray(np.random.randint(0, A, (B,), np.int32))
    return _timeit(fn, tab, s, c, label=f"P5 XLA gather S={S} A={A} B={B}",
                   lookups_per_call=reps * B)


# ---------------------------------------------------------------------------
# P6: big-table Pallas gather via take_along_axis on a flat VMEM array.
# Does Mosaic lower arbitrary-domain gathers at all?
# ---------------------------------------------------------------------------

def probe_flat_gather(T=1 << 20, reps=64, B=512):
    def kernel(tab_ref, idx_ref, out_ref):
        def body(r, idx):
            g = jnp.take_along_axis(
                tab_ref[:].reshape(1, -1),
                idx.reshape(1, -1) & (T - 1), axis=1,
            ).reshape(idx.shape)
            return (idx + g) & (T - 1)

        out_ref[:] = lax.fori_loop(0, reps, body, idx_ref[:])

    tab = jnp.asarray(np.random.randint(0, T, (T,), np.int32))
    idx = jnp.asarray(np.random.randint(0, T, (B, 128), np.int32))
    fn = jax.jit(lambda t, i: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, i))
    return _timeit(fn, tab, idx, label=f"P6 flat VMEM gather T={T}",
                   lookups_per_call=reps * B * 128)


def main():
    print(f"devices: {jax.devices()}")
    probe_lane_gather()
    probe_block_gather(T=4096)
    probe_block_gather(T=32768, reps=64, B=128)
    probe_scalar_chain()
    probe_scalar_chain(S=65536 * 4, reps=4096, K=16)
    probe_row_slice()
    probe_mxu_onehot()
    probe_xla_gather()
    probe_flat_gather()


if __name__ == "__main__":
    main()
