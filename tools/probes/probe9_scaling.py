"""Probe 9: bound the multi-chip scaling claim with real measurements.

BASELINE.md demands >=90% bytes/s scaling efficiency to >=2 hosts; round 2
argued the loss structurally (per-scan comms = one halo ppermute + one
scalar psum) but never measured anything.  Only ONE real chip is attached,
so ICI cannot be timed here; what CAN be measured and bounded:

  T_scan      — per-scan kernel time for a shard (measured, local path)
  T_wrap      — added per-scan cost of the shard_map program on a 1-device
                mesh (same kernel + halo ppermute + psum lowered on one
                device; measured).  Upper-bounds every non-ICI overhead of
                the sharded program: collective lowering, extra copies.
  T_ici       — true cross-chip latency of one halo ppermute (halo*4 B,
                latency-bound) + one scalar psum.  Not measurable with one
                chip; bounded by public v5e figures (~1-25 us per
                microcollective).

Implied efficiency at N chips (per-chip shard size fixed = weak scaling):
  eff(N) ~= T_scan / (T_scan + T_wrap + T_ici)
which this probe evaluates for T_ici in {1, 10, 100, 1000} us so the
committed number is a measured bound, not a story.

Run (TPU):  PYTHONPATH=/root/repo:/root/.axon_site timeout 3600 \
              python tools/probes/probe9_scaling.py
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--units", type=int, default=1 << 24)
    p.add_argument("--keywords", type=int, default=10_000)
    p.add_argument("--platform", default="auto")
    args = p.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import lax

    from ahocorasick_tpu.bench.__main__ import english_like_keywords, word_soup
    from ahocorasick_tpu.models.matchers import AhoCorasickSet
    from ahocorasick_tpu.ops import dispatch, scan_batched
    from ahocorasick_tpu.parallel import sharding

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    kws = english_like_keywords(rng, args.keywords)
    m = AhoCorasickSet(kws, engine="device")
    text = word_soup(rng, kws, args.units)  # one shard's slice
    cls = m._classes(text)

    # --- local path: picked engine count kernel, reps inside one jit ----
    plan = dispatch.count_plan(m.compiled, m.dev)
    windows = scan_batched.chunk_classes(cls, 512, plan.halo)
    wdev = jax.device_put(jnp.asarray(windows))

    def reps_fn(fn):
        @jax.jit
        def run(tables, w, reps):
            def one(i, tot):
                return tot + fn(tables, jnp.roll(w, i, axis=0))

            return lax.fori_loop(0, reps, one, jnp.int32(0))

        return run

    local = reps_fn(plan.fn)

    def best_seconds(callable_, *args):
        b = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(callable_(*args))
            b = min(b, time.perf_counter() - t0)
        return b

    lo, hi = 2, 10
    float(local(plan.tables, wdev, jnp.int32(lo)))
    float(local(plan.tables, wdev, jnp.int32(hi)))
    t_lo = best_seconds(local, plan.tables, wdev, jnp.int32(lo))
    t_hi = best_seconds(local, plan.tables, wdev, jnp.int32(hi))
    t_scan = (t_hi - t_lo) / (hi - lo)
    print(json.dumps({"which": plan.which, "t_scan_ms": round(t_scan * 1e3, 3),
                      "gbps": round(len(cls) * 2 / t_scan / 1e9, 3)}),
          flush=True)

    # --- sharded path on the 1-device mesh: same kernel + collectives ---
    mesh = sharding.data_mesh(jax.devices()[:1])
    prepare, count, engine = sharding.make_sharded_counter(m, mesh)
    x = prepare(cls)
    int(count(x, reps=lo))
    int(count(x, reps=hi))

    def count_best(reps):
        b = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            int(count(x, reps=reps))
            b = min(b, time.perf_counter() - t0)
        return b

    s_lo, s_hi = count_best(lo), count_best(hi)
    t_sharded = (s_hi - s_lo) / (hi - lo)
    t_wrap = t_sharded - t_scan
    print(json.dumps({"sharded_engine": engine,
                      "t_sharded_ms": round(t_sharded * 1e3, 3),
                      "t_wrap_ms": round(t_wrap * 1e3, 3)}), flush=True)

    for ici_us in (1, 10, 100, 1000):
        eff = t_scan / (t_scan + max(t_wrap, 0) + ici_us * 1e-6)
        print(json.dumps({"assumed_ici_us": ici_us,
                          "implied_weak_scaling_eff": round(eff, 4)}),
              flush=True)


if __name__ == "__main__":
    main()
