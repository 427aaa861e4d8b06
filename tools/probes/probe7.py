"""Probe round 7: big-table gather locality + the rowdfa VMEM cliff.

Round-2 left two baseline configs on the "element-gather wall":
baseline-3 (469,866 states, 60 MB rowdfa table -> batched 2D gather,
0.097 GB/s) and baseline-5 (4.37M states, 490 MB flat table ->
packedcount, 0.136 GB/s).  Two hypotheses to test on the real chip:

A. The rowdfa1 row-gather rate (375-430 M rows/s) holds for tables well
   past the current 10 MB budget (v5e VMEM is larger than the budget
   assumed; the cliff may be XLA's per-op scoped-vmem default, which
   --xla_tpu_scoped_vmem_limit_kib can raise).  If the cliff is >= 64 MB,
   baseline-3 rides rowdfa1 at ~0.7 GB/s with no new kernel at all.

B. Element-gather rate on a big HBM table depends on *index locality*:
   if gathers concentrated in a small row range of a 512 MB operand run
   at the small-table rate, BFS state renumbering (hot shallow states
   first) recovers most of the loss for baseline-3/-5 — their scans sit
   in low-depth states most of the time.

Methodology: identical to bench.ac_kernel_rate — all data built ON
device (tunnel upload is ~4 MB/s), reps spin inside one jit with rolled
windows (CSE-proof), lo/hi rep differencing cancels RPC + build cost.
``reps`` is a traced scalar so each table size costs ONE compile.

Run:  timeout 3600 python tools/probes/probe7.py [--part A|B] [--mb 8,16,...]
      XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=114688 \
        timeout 3600 python tools/probes/probe7.py --part A --mb 32,64,96
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

AP = 32  # padded class count (baseline-3 geometry)
A = 27   # live classes
B_LANES = 8192
CHUNK = 512
HALO = 12


def _hash(i):
    return (i * jnp.uint32(2654435761)) ^ (i >> jnp.uint32(13))


def _windows(key_shift: int):
    """int32[B, HALO+CHUNK] pseudo-random classes in [0, A), on device."""
    n = B_LANES * (HALO + CHUNK)
    i = jnp.arange(n, dtype=jnp.uint32) + jnp.uint32(key_shift)
    return (_hash(i) % jnp.uint32(A)).astype(jnp.int32).reshape(
        B_LANES, HALO + CHUNK)


def timeit_traced(fn, args_lo, args_hi, chars_per_rep, reps_lo, reps_hi,
                  label):
    float(fn(*args_lo))
    float(fn(*args_hi))

    def best(args):
        b = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(*args))
            b = min(b, time.perf_counter() - t0)
        return b

    t_lo, t_hi = best(args_lo), best(args_hi)
    dt = t_hi - t_lo
    if dt <= 0:
        print(json.dumps({"label": label, "degenerate": [t_lo, t_hi]}))
        return
    rate = (reps_hi - reps_lo) * chars_per_rep / dt
    print(json.dumps({
        "label": label,
        "mchars_per_s": round(rate / 1e6, 1),
        "gbps_utf16": round(rate * 2 / 1e9, 3),
        "t_lo_ms": round(t_lo * 1e3, 1),
        "t_hi_ms": round(t_hi * 1e3, 1),
    }), flush=True)


# -- Part A: rowdfa1 row-gather rate vs table size ---------------------------

def part_a(mbs, vmem_kib=None):
    from ahocorasick_tpu.ops import scan_rowdfa

    opts = ({"xla_tpu_scoped_vmem_limit_kib": str(vmem_kib)}
            if vmem_kib else None)
    for mb in mbs:
        S = (mb << 20) // (AP * 4)
        sb = max(int(S - 1).bit_length(), 1)

        @functools.partial(jax.jit, compiler_options=opts)
        def fn(reps, shift, _S=S, _sb=sb):
            i = jnp.arange(S * AP, dtype=jnp.uint32).reshape(S, AP)
            nxt = _hash(i + shift) % jnp.uint32(_S)
            emit = (_hash(i ^ jnp.uint32(0x9E3779B9)) & jnp.uint32(1))
            table = nxt | (emit << jnp.uint32(_sb))
            w = _windows(1)

            def one(k, tot):
                wk = jnp.roll(w, k, axis=0)
                return tot + scan_rowdfa.rowdfa1_count(
                    table, wk, HALO, _sb, A)

            return lax.fori_loop(0, reps, one, jnp.int32(0))

        lo, hi = 4, 20
        timeit_traced(fn, (jnp.int32(lo), jnp.uint32(1)),
                      (jnp.int32(hi), jnp.uint32(1)),
                      B_LANES * CHUNK, lo, hi,
                      f"A:rowdfa1 {mb}MB S={S} bits={sb} vmem={vmem_kib}")


# -- Part B: element-gather rate vs index concentration on a big table -------

def part_b(flavor: str, s_rows: int):
    """flavor 'flat': packedcount-style 1D gather table[s*A+c];
    flavor '2d': batched-style table[s, c].  Table is s_rows x AP uint32
    (s_rows=4M -> 512 MB).  Next-state values are confined to [0, n) —
    the knob that emulates hot-state renumbering."""
    sb = max(int(s_rows - 1).bit_length(), 1)

    @jax.jit
    def fn(reps, n):
        i = jnp.arange(s_rows * AP, dtype=jnp.uint32)
        nxt = _hash(i) % jnp.uint32(n)
        if flavor == "flat":
            table = nxt  # uint32[s_rows*AP]
        else:
            table = nxt.reshape(s_rows, AP)
        w = _windows(7)

        def step(s, c):
            if flavor == "flat":
                v = table[s * jnp.uint32(AP) + c.astype(jnp.uint32)]
            else:
                v = table[s, c]
            return v, None

        def one(k, tot):
            wk = jnp.roll(w, k, axis=0)
            s0 = (wk[:, 0] * 0).astype(jnp.uint32)
            s_fin, _ = lax.scan(step, s0, wk.T)
            return tot + jnp.sum(s_fin.astype(jnp.int32))

        return lax.fori_loop(0, reps, one, jnp.int32(0))

    lo, hi = 2, 8
    for n in (1, 4096, 65536, 1 << 20, s_rows):
        timeit_traced(fn, (jnp.int32(lo), jnp.uint32(n)),
                      (jnp.int32(hi), jnp.uint32(n)),
                      B_LANES * (HALO + CHUNK), lo, hi,
                      f"B:{flavor} {s_rows * AP * 4 >> 20}MB n={n}")


def part_c(rows_list):
    """Flat element-gather rate vs operand size (uniform full-range indices)
    — models how much shrinking the baseline-5 table (quotient dedup) buys."""
    for s_rows in rows_list:
        sb = max(int(s_rows - 1).bit_length(), 1)

        @jax.jit
        def fn(reps, _S=s_rows):
            i = jnp.arange(_S * AP, dtype=jnp.uint32)
            table = _hash(i) % jnp.uint32(_S)
            w = _windows(7)

            def step(s, c):
                return table[s * jnp.uint32(AP) + c.astype(jnp.uint32)], None

            def one(k, tot):
                wk = jnp.roll(w, k, axis=0)
                s0 = (wk[:, 0] * 0).astype(jnp.uint32)
                s_fin, _ = lax.scan(step, s0, wk.T)
                return tot + jnp.sum(s_fin.astype(jnp.int32))

            return lax.fori_loop(0, reps, one, jnp.int32(0))

        lo, hi = 2, 8
        timeit_traced(fn, (jnp.int32(lo),), (jnp.int32(hi),),
                      B_LANES * (HALO + CHUNK), lo, hi,
                      f"C:flat {s_rows * AP * 4 >> 20}MB bits={sb}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--part", default="AB")
    p.add_argument("--mb", default="8,16,32,64,96")
    p.add_argument("--rows", type=int, default=1 << 22)
    p.add_argument("--crows", default="262144,1048576,2097152")
    p.add_argument("--vmem-kib", type=int, default=None)
    p.add_argument("--platform", default="auto")
    args = p.parse_args()
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    print(f"devices: {jax.devices()}", flush=True)
    if "A" in args.part:
        part_a([int(x) for x in args.mb.split(",")], args.vmem_kib)
    if "B" in args.part:
        part_b("flat", args.rows)
        part_b("2d", args.rows)
    if "C" in args.part:
        part_c([int(x) for x in args.crows.split(",")])


if __name__ == "__main__":
    main()
