"""Measure the state-sharded (TP-analog) scan rate on the real chip.

The TP formulation trades throughput for HBM capacity: per character every
device gathers candidate rows for all lanes, one-hot selects the class
column, and psums over the model axis.  On the single attached chip (mesh
of 1) this measures the formulation's overhead vs the replicated rowdfa
scan — the number that backs the docstring claim "strictly slower than a
replicated scan whenever the table fits" (parallel/sharding.py).

Run (TPU, one process at a time): timeout 1500 python tools/probes/probe10_tp.py
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from ahocorasick_tpu.bench import ac_kernel_rate
from ahocorasick_tpu.bench.__main__ import english_like_keywords, word_soup
from ahocorasick_tpu.models.matchers import AhoCorasickSet
from ahocorasick_tpu.parallel import sharding


def main():
    rng = np.random.default_rng(0)
    kws = english_like_keywords(rng, 10_000)
    m = AhoCorasickSet(kws, engine="device")
    text = word_soup(rng, kws, 1 << 23)  # 8 Mi units: scan >> dispatch
    cls = m._classes(text)

    # Replicated-scan reference (the production engine's fused count).
    kernel_gbps, total, which = ac_kernel_rate(m, cls, reps=4)
    print(json.dumps({"probe": "tp_rate", "engine": which,
                      "replicated_kernel_gbps": round(kernel_gbps, 3)}),
          flush=True)

    # Device-resident timing (upload once; through the axon tunnel a per-
    # call window upload would measure the link, not the formulation).
    import jax
    import jax.numpy as jnp

    from ahocorasick_tpu.ops import scan_batched

    ts = sharding.TableShardedScanner(m, sharding.model_mesh())
    mode = "count" if ts.layout == "planes" else "count_packed"
    tab_dev, run, A = sharding._table_sharded_build(
        ts._table, ts._halo, ts._sb, ts.mesh, mode)
    windows = scan_batched.chunk_classes(cls, ts.chunk, ts._halo, A)
    wdev = jax.device_put(jnp.asarray(windows))

    # Reps inside ONE jit, rolled windows (CSE-proof) — the same dispatch-
    # amortizing methodology as ac_kernel_rate, so the two sides compare
    # apples to apples (a bare per-call timing charges RPC+sync overhead
    # to the TP side only; review finding r5).
    from jax import lax

    reps = 8

    @jax.jit
    def reps_tp(tab, w):
        def one(i, tot):
            return tot + run(tab, jnp.roll(w, i, axis=0))

        return lax.fori_loop(0, reps, one, jnp.int32(0))

    warm = int(reps_tp(tab_dev, wdev))
    assert warm == total * reps, (warm, total, reps)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        int(reps_tp(tab_dev, wdev))
        best = min(best, time.perf_counter() - t0)
    gbps = len(cls) * 2 * reps / best / 1e9
    print(json.dumps({"layout": ts.layout, "tp_count_gbps": round(gbps, 4),
                      "tp_vs_replicated": round(gbps / kernel_gbps, 4),
                      "scan_s": round(best / reps, 4)}), flush=True)


if __name__ == "__main__":
    main()
