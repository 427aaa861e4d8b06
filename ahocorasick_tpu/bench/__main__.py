from __future__ import annotations

import argparse
import json
import time

import numpy as np

from ahocorasick_tpu.core.compiler import KINDS


def english_like_keywords(rng: np.random.Generator, n: int, lo=3, hi=13) -> list:
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    out = set()
    while len(out) < n:
        out.add("".join(rng.choice(letters, size=int(rng.integers(lo, hi)))))
    return sorted(out)


def word_soup(rng: np.random.Generator, keywords: list, n_units: int, hit_rate=0.1) -> str:
    pieces = []
    total = 0
    kw = list(rng.choice(keywords, size=min(512, len(keywords))))
    letters = "abcdefghijklmnopqrstuvwxyz"
    while total < n_units:
        if rng.random() < hit_rate:
            w = kw[int(rng.integers(len(kw)))]
        else:
            w = "".join(rng.choice(list(letters), size=int(rng.integers(3, 11))))
        pieces.append(w)
        total += len(w) + 1
    return " ".join(pieces)[:n_units]


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="python -m ahocorasick_tpu.bench")
    p.add_argument("--kind", choices=KINDS, default="ac")
    p.add_argument("--map", action="store_true", help="map variant (values attached)")
    p.add_argument("--keywords", type=int, default=10_000)
    p.add_argument("--keyword-file", type=str, default=None,
                   help="newline-separated dictionary file (overrides --keywords)")
    p.add_argument("--units", type=int, default=1 << 20, help="text length in UTF-16 units")
    p.add_argument("--engine", choices=("auto", "device", "gold"), default="device")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--case-insensitive", action="store_true")
    p.add_argument("--profile", type=str, default=None,
                   help="capture a jax.profiler trace to this directory")
    p.add_argument("--platform", choices=("auto", "cpu", "tpu"), default="auto",
                   help="cpu forces host jax even when a TPU backend is pinned")
    args = p.parse_args(argv)

    if args.platform == "cpu":
        import jax

        # Env vars are overridden by site-level backend pinning; the config
        # knob after import is authoritative (see tests/conftest.py).
        jax.config.update("jax_platforms", "cpu")

    from ahocorasick_tpu.models import matchers

    rng = np.random.default_rng(args.seed)
    if args.keyword_file:
        with open(args.keyword_file) as f:
            keywords = [line.strip() for line in f if line.strip()]
    else:
        keywords = english_like_keywords(rng, args.keywords)
    if args.kind.startswith("whole_word"):
        keywords = [k for k in keywords if k]

    cls = matchers._CLASS_BY_KIND[(args.kind, args.map)]
    t0 = time.perf_counter()
    kwargs = dict(engine=args.engine)
    if args.map:
        m = cls(keywords, list(range(len(keywords))),
                not args.case_insensitive, **kwargs)
    else:
        m = cls(keywords, not args.case_insensitive, **kwargs)
    compile_s = time.perf_counter() - t0

    text = word_soup(rng, keywords, args.units)

    def run():
        m.count(text)
        return m.last_stats

    stats = run()  # warmup / jit compile
    best = None
    for _ in range(args.reps):
        s = run()
        if best is None or s.seconds < best.seconds:
            best = s

    if args.profile:
        from ahocorasick_tpu.utils.stats import trace

        with trace(args.profile):
            run()

    print(json.dumps({
        "kind": args.kind,
        "map": args.map,
        "engine": best.engine,
        "keywords": len(keywords),
        "num_states": m.compiled.num_states,
        "num_classes": m.compiled.num_classes,
        "units": best.units,
        "matches": best.matches,
        "compile_s": round(compile_s, 3),
        "scan_s": round(best.seconds, 6),
        "gbps": round(best.gbps, 3),
        "matches_per_sec": round(best.matches_per_sec, 1),
    }))


if __name__ == "__main__":
    main()
