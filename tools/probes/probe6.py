"""Probe 6: can anything beat the XLA row-gather envelope? (v5e)

Round-1 measurements (probe3/4, docs/PERF.md) pinned: element gathers
~118 M/s, VMEM row gathers ~375-430 M rows/s, HBM row gathers ~29 M rows/s.
The rowdfa1 engine (1 VMEM row gather + fused one-hot select per char) sits
at that envelope (0.80 GB/s on the 10k config).  Open questions this probe
answers on real hardware:

  1. Does a Pallas/Mosaic kernel lower data-dependent gathers at all, and
     if so, faster than XLA's gather?  (Formulations: flat element gather,
     row gather, jnp.take.)
  2. Do WIDER rows amortize the per-row latency (VMEM and HBM)?  If HBM
     row gathers were bandwidth-bound, a 4 KB-row delta-squared table would
     double chars/gather; if latency-bound, it is dead.

Run:  timeout 1800 python tools/probes/probe6
"""

from __future__ import annotations

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def _timeit(fn, *args, reps=3):
    fn(*args).block_until_ready()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(*args).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best


def _chain_steps():
    return 64


def probe_xla_row_gather_width(S=51200, B=65536, T=64):
    """Dependent-chain row gather + one-hot select, vs row width."""
    print("== XLA VMEM row gather rate vs row width (dependent chain) ==")
    for A in (8, 16, 32, 64, 128, 256):
        rng = np.random.default_rng(0)
        tab = jnp.asarray(
            rng.integers(0, S, size=(S, A), dtype=np.int64).astype(np.uint32)
        )
        cols = jnp.asarray(rng.integers(0, A, size=(T, B)).astype(np.int32))

        @jax.jit
        def run(tab, cols):
            def step(s, c):
                rows = tab[s]
                iota = lax.broadcasted_iota(jnp.int32, (1, A), 1)
                v = jnp.sum(jnp.where(iota == c[:, None], rows, jnp.uint32(0)),
                            axis=1)
                return v % jnp.uint32(S), None

            s0 = jnp.zeros((B,), jnp.uint32)
            s, _ = lax.scan(step, s0, cols)
            return jnp.sum(s.astype(jnp.int64))

        dt = _timeit(run, tab, cols)
        rate = B * T / dt / 1e6
        print(f"  A={A:4d}  ({S * A * 4 / 2**20:7.1f} MB)  "
              f"{rate:8.1f} M rows/s  {1e9 * dt / (B * T):6.2f} ns/row")


def probe_hbm_row_gather_width(S=470_000, B=65536, T=16):
    """Same chain from an HBM-resident table (does width amortize?)."""
    print("== HBM row gather rate vs row width (dependent chain) ==")
    for A in (32, 128, 512, 1024):
        nbytes = S * A * 4
        if nbytes > 4 << 30:
            continue
        rng = np.random.default_rng(0)
        tab = jnp.asarray(
            rng.integers(0, S, size=(S, A), dtype=np.int64).astype(np.uint32)
        )
        cols = jnp.asarray(rng.integers(0, A, size=(T, B)).astype(np.int32))

        @jax.jit
        def run(tab, cols):
            def step(s, c):
                rows = tab[s]
                iota = lax.broadcasted_iota(jnp.int32, (1, A), 1)
                v = jnp.sum(jnp.where(iota == c[:, None], rows, jnp.uint32(0)),
                            axis=1)
                return v % jnp.uint32(S), None

            s0 = jnp.zeros((B,), jnp.uint32)
            s, _ = lax.scan(step, s0, cols)
            return jnp.sum(s.astype(jnp.int64))

        dt = _timeit(run, tab, cols)
        rate = B * T / dt / 1e6
        print(f"  A={A:5d} ({nbytes / 2**20:7.0f} MB)  {rate:8.1f} M rows/s  "
              f"{rate * A * 4 / 1e3:7.1f} GB/s effective")


def probe_pallas_gathers(S=51200, A=32, B=8 * 128, T=64):
    """Try data-dependent gathers inside a Pallas kernel."""
    from jax.experimental import pallas as pl

    print("== Pallas in-kernel gather formulations ==")
    rng = np.random.default_rng(0)
    flat = jnp.asarray(
        rng.integers(0, S * A, size=(S * A,), dtype=np.int64).astype(np.uint32)
    )
    tab2 = flat.reshape(S, A)
    idx0 = jnp.asarray(rng.integers(0, S, size=(8, 128)).astype(np.int32))

    def try_one(name, kernel, *args, out_shape):
        try:
            f = pl.pallas_call(kernel, out_shape=out_shape)
            jf = jax.jit(lambda *a: f(*a))
            jf(*args).block_until_ready()
            dt = _timeit(jf, *args)
            rate = 8 * 128 * T / dt / 1e6
            print(f"  {name:34s} OK   {rate:8.1f} M lookups/s")
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:90]
            print(f"  {name:34s} FAIL {msg}")

    Su = np.uint32(S)

    def k_flat_elem(tab_ref, idx_ref, out_ref):
        def step(t, s):
            g = tab_ref[s.reshape(-1)]  # vector index into flat VMEM ref
            return (g.reshape(8, 128) % Su).astype(jnp.int32)

        out_ref[:, :] = lax.fori_loop(0, T, step, idx_ref[:, :])

    try_one("flat element gather tab[s] (vec)", k_flat_elem, flat, idx0,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32))

    def k_take(tab_ref, idx_ref, out_ref):
        def step(t, s):
            g = jnp.take(tab_ref[:], s.reshape(-1), axis=0)
            return (g.reshape(8, 128) % Su).astype(jnp.int32)

        out_ref[:, :] = lax.fori_loop(0, T, step, idx_ref[:, :])

    try_one("jnp.take flat (vec)", k_take, flat, idx0,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32))

    def k_row(tab_ref, idx_ref, out_ref):
        def step(t, s):
            rows = tab_ref[s.reshape(-1), :]  # (1024, A) row gather
            return (rows[:, 0].reshape(8, 128) % Su).astype(jnp.int32)

        out_ref[:, :] = lax.fori_loop(0, T, step, idx_ref[:, :])

    try_one("row gather tab[s, :] (vec)", k_row, tab2, idx0,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32))

    def k_dyngather_sublane(tab_ref, idx_ref, out_ref):
        # take_along_axis along axis 0 of an (8, 128) register: sublane
        # dynamic gather — the would-be second level of a two-level permute.
        small = tab_ref[0:8, 0:128]

        def step(t, s):
            g = jnp.take_along_axis(small.astype(jnp.int32), s % 8, axis=0)
            return (g + s) % np.int32(8)

        out_ref[:, :] = lax.fori_loop(0, T, step, idx_ref[:, :] % np.int32(8))

    try_one("sublane take_along_axis (8,128)", k_dyngather_sublane, tab2, idx0,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32))


def main():
    # NOTE on the two *_width probes: their naive block_until_ready timing
    # is unreliable through the axon tunnel (see docs/PERF.md "Tunnel
    # facts") — measured 2026-08-20 they report physically impossible
    # multi-G rows/s.  They are kept for direct-attached hardware only; the
    # load-bearing result of this probe is the Pallas section: Mosaic
    # cannot lower data-dependent gathers at all ("Cannot do int indexing
    # on TPU" / "Only 2D gather is supported"), so no Pallas kernel can
    # beat the XLA row-gather envelope that rowdfa1 already sits on.
    print("devices:", jax.devices())
    probe_pallas_gathers()


if __name__ == "__main__":
    main()
