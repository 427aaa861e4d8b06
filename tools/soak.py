"""Randomized differential soak test: device engines vs the gold model.

Rolls random dictionaries (varied alphabets, sizes, keyword lengths —
including packed-inline overflow and row-compressed shapes), random texts,
and checks every matcher class across match / count / stream / sharded
paths against the sequential gold model.  Any mismatch prints a
self-contained repro dict and exits 1.

Run:  python tools/soak.py [--minutes 10] [--seed 0] [--mesh]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from ahocorasick_tpu.models import matchers as M  # noqa: E402

CLASSES = [
    (M.AhoCorasickSet, M.AhoCorasickMap),
    (M.LongestMatchSet, M.LongestMatchMap),
    (M.ShortestMatchSet, M.ShortestMatchMap),
    (M.WholeWordMatchSet, M.WholeWordMatchMap),
    (M.WholeWordLongestMatchSet, M.WholeWordLongestMatchMap),
]

# Uppercase variants included so cs=False trials actually exercise the
# case-folding charmap differentially (lowercase-only alphabets make the
# folded and unfolded scans byte-identical).
ALPHABETS = ["ab", "abc ", "abcdef -_.", "aàβ中 ", "a" * 1, "aAbB ", "àÀâ c"]


def roll_dict(rng: np.random.Generator):
    alpha = list(ALPHABETS[int(rng.integers(len(ALPHABETS)))])
    n = int(rng.integers(1, 60))
    lo = 1
    hi = int(rng.choice([4, 8, 40]))  # 40 forces packed-inline overflow
    kws = set()
    for _ in range(n):
        L = int(rng.integers(lo, hi + 1))
        kws.add("".join(rng.choice(alpha, size=L)))
    return sorted(kws), alpha


def roll_text(rng, alpha):
    # Occasionally large enough to cross the auto-device thresholds.
    n = int(rng.integers(0, 40000 if rng.random() < 0.15 else 6000))
    return "".join(rng.choice(alpha + [" "], size=n))


def run_trial(rng, trial: int, use_mesh: bool) -> None:
    import io

    kws, alpha = roll_dict(rng)
    cs = bool(rng.integers(2))
    fam = int(rng.integers(len(CLASSES)))
    set_cls, map_cls = CLASSES[fam]
    whole = set_cls.kind.startswith("whole_word")
    if whole:
        # Whole-word keywords must survive trim; plain whole-word rejects
        # interior non-word chars.
        from ahocorasick_tpu.utils import chartables

        wc = chartables.default_word_chars()
        kept = []
        for k in kws:
            t = chartables.trim_word(k, wc)
            if not t:
                continue
            if set_cls.kind == "whole_word":
                u = chartables.to_utf16_units(t)
                if not np.all(wc[u]):
                    continue
            kept.append(t)
        kws = sorted(set(kept))
    if not kws:
        return
    text = roll_text(rng, alpha)
    repro = {"trial": trial, "cls": set_cls.__name__, "cs": cs,
             "kws": kws, "text": text}

    gold_m = set_cls(kws, cs, engine="gold")
    want = gold_m.match(text)

    dev = set_cls(kws, cs, engine="device")
    got = dev.match(text)
    assert got == want, ("device", repro, got[:5], want[:5])

    # Auto engine (exercises the engine-aware thresholds both sides);
    # reuse the compiled tables — no third host compile per trial.
    auto = set_cls.from_compiled(gold_m.compiled, engine="auto")
    got_a = auto.match(text)
    assert got_a == want, ("auto", repro, got_a[:5], want[:5])

    assert dev.count(text) == len(want), ("count", repro)

    vals = [f"v{i}" for i in range(len(kws))]
    mm = map_cls(kws, vals, cs, engine="device")
    got_m = mm.match(text)
    assert [(s, e) for s, e, _ in got_m] == want, ("map", repro)

    chunk = int(rng.integers(1, 700))
    got_s = dev.match_stream(io.StringIO(text), chunk_units=chunk)
    assert got_s == want, ("stream", repro, chunk)

    if use_mesh and len(text):
        # ALL FIVE kinds ride ShardedScanner (whole-word boundary filter and
        # wwl walks+restart-chain stitching included — the most intricate
        # sharded logic needs the randomized differential coverage most).
        from ahocorasick_tpu.parallel.sharding import ShardedScanner

        try:
            sc = ShardedScanner(dev)
        except ValueError:
            return  # row-compressed shape without a sharded path
        s, e, v = sc.match_triples(text)
        assert list(zip(s.tolist(), e.tolist())) == want, ("sharded", repro)
        assert sc.count(text) == len(want), ("sharded-count", repro)

        if rng.integers(4) == 0:
            # TP-analog surface (round 5: all five kinds), on a 1-axis or
            # 2-D DP x TP mesh — the state-sharded scan + host resolve
            # against the same gold expectation.
            from ahocorasick_tpu.parallel.sharding import (
                TableShardedScanner, dp_tp_mesh, model_mesh,
            )

            mesh = dp_tp_mesh() if rng.integers(2) else model_mesh()
            try:
                ts = TableShardedScanner(dev, mesh)
            except ValueError:
                return  # unpackable shape: no state-sharded layout
            s, e, v = ts.match_triples(text)
            assert list(zip(s.tolist(), e.tolist())) == want, \
                ("table-sharded", repro, mesh.axis_names)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--minutes", type=float, default=10.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mesh", action="store_true",
                   help="also check the sharded scanner (slower per trial)")
    args = p.parse_args()
    rng = np.random.default_rng(args.seed)
    deadline = time.time() + args.minutes * 60
    trial = 0
    while time.time() < deadline:
        run_trial(rng, trial, args.mesh)
        trial += 1
        if trial % 50 == 0:
            print(f"{trial} trials ok", flush=True)
    print(f"soak clean: {trial} trials")


if __name__ == "__main__":
    main()
