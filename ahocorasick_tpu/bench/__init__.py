"""Microbenchmark CLI — the TPU replacement for the reference's per-test
``main()`` perf loops and ``bin/test-branches`` A/B harness.

    python -m ahocorasick_tpu.bench --kind ac --keywords 10000 --units 1048576

Prints one JSON line per run with ScanStats fields; diff two git branches by
running this in each and comparing (the ``bin/test-branches`` workflow).
"""

from __future__ import annotations

import time

import numpy as np


def ac_kernel_rate(m, cls: np.ndarray, reps: int = 8, chunk: int = 512):
    """Device-resident scan rate (GB/s) of the matcher's count kernel.

    Uploads the chunked windows once and times ``reps`` on-device scans
    inside one jit (shifted windows defeat CSE) — the same methodology as
    the repo-root ``bench.py``.  This isolates the DFA-scan kernel from
    host-side chunking/upload, which through the axon tunnel (~4 MB/s) would
    otherwise dominate; on directly-attached hardware the end-to-end numbers
    converge toward this.  Applies to the AC-candidates engines (ac /
    longest / whole_word kinds and their maps).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    from ahocorasick_tpu.ops import scan_batched, scan_rowdfa

    # Scale reps so the timed work stays well above per-dispatch overhead
    # (~tens of ms through the tunnel): target >= 128 Mi units per call.
    reps = max(reps, -(-(128 << 20) // max(len(cls), 1)))

    c = m.compiled
    which = scan_rowdfa.pick_engine(c)
    if which == "block":
        from ahocorasick_tpu.kernels import scan_block

        bd = m.dev.block_dfa
        w0 = scan_batched.chunk_classes(cls, chunk, bd.halo)
        W = w0.shape[1]
        windows = scan_block.regroup_windows(w0)
        G = windows.shape[0] // (W * 8)
        count_fn = lambda t, w: scan_block.block_count(
            t, w, bd.halo, bd.state_bits, bd.num_classes, bd.num_blocks, W, G)
        table, roll_axis = bd.table, 0
    elif which == "rowdfa2":
        rd = m.dev.row_dfa
        windows = scan_rowdfa.chunk_classes2(cls, chunk, rd.halo)
        count_fn = lambda t, w: scan_rowdfa.rowdfa_count(
            t, w, rd.halo, rd.state_bits, rd.num_classes)
        table, roll_axis = rd.table, 0
    elif which == "rowdfa1":
        rd = m.dev.row_dfa1
        windows = scan_batched.chunk_classes(cls, chunk, rd.halo)
        count_fn = lambda t, w: scan_rowdfa.rowdfa1_count(
            t, w, rd.halo, rd.state_bits, rd.num_classes)
        table, roll_axis = rd.table, 0
    else:
        d = max(c.max_depth, 1)
        if not scan_batched.inline_packable(c):
            if scan_batched.count_packable(c):
                which = "packedcount"
                flat, cp_bits, halo = m.dev.count_packed_dfa
                windows = scan_batched.chunk_classes(cls, chunk, halo)
                count_fn = lambda t, w: scan_batched.packedcount_count(
                    t, w, halo, cp_bits, c.num_classes)
                table, roll_axis = flat, 0
            else:
                dfa_flat, emit_tab, halo = m.dev.split_dfa
                planes = (d + 31) // 32
                windows = scan_batched.chunk_classes(cls, chunk, halo)
                count_fn = lambda t, w: scan_batched.split_count(
                    t, emit_tab, w, halo, c.num_classes, planes)
                table, roll_axis = dfa_flat, 0
        else:
            pd = m.dev.packed_dfa
            windows = scan_batched.chunk_classes(cls, chunk, pd.halo)
            count_fn = lambda t, w: scan_batched.batched_count(
                t, w, pd.halo, pd.state_bits)
            table, roll_axis = pd.table, 0

    wdev = jax.device_put(jnp.asarray(windows))

    @jax.jit
    def reps_count(table, w):
        def one(i, tot):
            wi = jnp.roll(w, i * 8, axis=0)
            return tot + count_fn(table, wi)

        return lax.fori_loop(0, reps, one, jnp.int32(0))

    total = int(count_fn(table, wdev))
    float(reps_count(table, wdev))  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(reps_count(table, wdev))
        best = min(best, time.perf_counter() - t0)
    dt = best / reps
    return (len(cls) * 2) / dt / 1e9, total, which
