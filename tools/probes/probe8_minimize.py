"""Probe 8 (host): how much does full DFA minimization shrink the big
baseline configs' scan tables?

probe7 established that element-gather rate on TPU v5e is a function of
OPERAND SIZE (512 MB -> 67 M/s, 96 MB -> 116 M/s, <=16 MB VMEM -> 385 M/s)
and NOT of index locality.  The only lever for the huge-dictionary engines
is therefore shrinking the table itself.  The compiler's one-pass row
hash-consing is not a minimization; this probe runs Moore partition
refinement over the goto-closure DFA with the emit signature as the initial
partition, for (a) the count-only signature (emit_count) and (b) the full
emit-mask signature (planes path), on the baseline-3 and baseline-5 dicts.

Run: python tools/probes/probe8_minimize.py [--config 3|5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

# Host-only probe: force CPU before anything imports jax (the axon TPU
# backend hangs on import when the tunnel is down, and only one TPU client
# may run at a time).
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def moore_minimize(dfa_next: np.ndarray, init_ids: np.ndarray, max_iter=64):
    """Iterated partition refinement; returns (n_classes per iteration)."""
    S, A = dfa_next.shape
    _, ids = np.unique(init_ids, return_inverse=True)
    history = [int(ids.max()) + 1]
    for it in range(max_iter):
        sig = np.concatenate([ids[:, None], ids[dfa_next]], axis=1)
        # Hash rows to 128-bit-ish keys for speed: two independent dot hashes.
        h1 = sig.astype(np.uint64) @ np.arange(1, A + 2, dtype=np.uint64) ** 3
        h2 = sig.astype(np.uint64) @ (
            np.uint64(0x9E3779B97F4A7C15)
            ** np.arange(1, A + 2, dtype=np.uint64)
        )
        key = h1 ^ (h2 << np.uint64(1))
        _, ids_new = np.unique(key, return_inverse=True)
        n = int(ids_new.max()) + 1
        history.append(n)
        if n == history[-2]:
            # Verify no hash collision merged distinct signatures: group
            # check on a sample would be ideal; trust two-hash xor here
            # (collision odds ~ S^2 / 2^64).
            return ids_new, history
        ids = ids_new
    return ids, history


def build_config(which: str):
    from ahocorasick_tpu.bench.__main__ import english_like_keywords
    from ahocorasick_tpu.core.compiler import compile_matcher

    rng = np.random.default_rng(0)
    if which == "3":
        kws = english_like_keywords(rng, 100_000)
        kws = kws + ["a" * i for i in range(1, 9)]
        return compile_matcher(kws, "longest", True)
    kws = english_like_keywords(rng, 1_000_000)
    return compile_matcher(kws, "ac", True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="3,5")
    args = p.parse_args()
    for which in args.config.split(","):
        t0 = time.perf_counter()
        m = build_config(which)
        compile_s = time.perf_counter() - t0
        S, A = m.num_states, m.num_classes
        from ahocorasick_tpu.ops.scan_batched import _state_emit_planes

        planes = _state_emit_planes(m)
        sig_mask = planes.astype(np.uint64)
        if planes.shape[1] > 1:
            sig_mask = (planes[:, 0].astype(np.uint64)
                        | (planes[:, 1].astype(np.uint64) << np.uint64(32)))
        else:
            sig_mask = planes[:, 0].astype(np.uint64)
        sig_count = m.emit_count[:S]

        for name, init in (("count", sig_count), ("mask", sig_mask)):
            t0 = time.perf_counter()
            ids, hist = moore_minimize(m.dfa_next, init)
            dt = time.perf_counter() - t0
            n = hist[-1]
            print(json.dumps({
                "config": which, "signature": name,
                "states": S, "classes": A,
                "min_states": n, "ratio": round(S / n, 3),
                "table_mb": round(S * A * 4 / 2**20, 1),
                "min_table_mb": round(n * A * 4 / 2**20, 1),
                "iters": len(hist) - 1, "seconds": round(dt, 1),
                "compile_s": round(compile_s, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
