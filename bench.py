"""Headline benchmark: PFAC scan throughput on one chip.

Config (BASELINE.json config #2 scale): 10k seeded English-like keywords,
case-sensitive set matcher, 32 Mi UTF-16 units (64 MiB) of synthetic text,
device-resident classes, empty-listener analog (total match count on
device).  Prints ONE JSON line.

``vs_baseline``: the reference README reports 3.6 us to full-match one
English paragraph with an empty listener (README.md:148, 235,886-word
dictionary, ~2015 JVM).  Taking a paragraph as ~700 UTF-16 units gives
~0.19 G units/s = ~0.39 GB/s; we use 0.4 GB/s as the reference-throughput
denominator.
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_GBPS = 0.4

N_KEYWORDS = 10_000
TEXT_UNITS = 1 << 25  # 32 Mi units = 64 MiB UTF-16
SEED = 20260817


def make_dictionary(rng: np.random.Generator, n: int) -> list:
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    freqs = np.array([8.2, 1.5, 2.8, 4.3, 12.7, 2.2, 2.0, 6.1, 7.0, 0.2, 0.8, 4.0,
                      2.4, 6.7, 7.5, 1.9, 0.1, 6.0, 6.3, 9.1, 2.8, 1.0, 2.4, 0.2,
                      2.0, 0.1])
    p = freqs / freqs.sum()
    words = set()
    while len(words) < n:
        length = int(rng.integers(3, 13))
        words.add("".join(rng.choice(letters, size=length, p=p)))
    return sorted(words)


def make_text_classes(m, rng: np.random.Generator, n_units: int) -> np.ndarray:
    """Synthetic text in compact-class space: seeded word soup.

    Built directly in class space (avoiding a giant Python string): words
    drawn from the dictionary's own class sequences (so there are real
    matches) mixed with random in-alphabet noise words, separated by the
    class of ' '.  A ~1 Mi-unit base is generated then tiled — content
    repetition is irrelevant for throughput measurement.
    """
    sep = int(m.compiled.charmap[ord(" ")])
    base_n = min(n_units, 1 << 20)
    out = np.empty(base_n + 16, dtype=np.int32)
    pos = 0
    classes = np.arange(2, m.compiled.num_classes, dtype=np.int32)
    kws = getattr(m, "_bench_keywords")
    kw_cls = [m.compiled.charmap[np.frombuffer(kw.encode("utf-16-le"), dtype=np.uint16).astype(np.int64)]
              for kw in rng.choice(kws, size=512)]
    noise = [rng.choice(classes, size=int(rng.integers(3, 11))) for _ in range(512)]
    while pos < base_n:
        if rng.random() < 0.10:
            w = kw_cls[int(rng.integers(len(kw_cls)))]
        else:
            w = noise[int(rng.integers(len(noise)))]
        k = min(len(w), base_n + 16 - pos)
        out[pos : pos + k] = w[:k]
        pos += k
        if pos < base_n + 16:
            out[pos] = sep
            pos += 1
    base = out[:base_n]
    reps = -(-n_units // base_n)
    return np.tile(base, reps)[:n_units]


REPS = 16  # scans per timed call: amortizes per-dispatch RPC overhead


def main() -> None:
    import os

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ahocorasick_tpu_jax_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

    import jax
    import jax.numpy as jnp
    from jax import lax

    from ahocorasick_tpu.models.matchers import AhoCorasickSet
    from ahocorasick_tpu.ops import scan_batched, scan_rowdfa

    rng = np.random.default_rng(SEED)
    keywords = make_dictionary(rng, N_KEYWORDS)

    m = AhoCorasickSet(keywords, engine="device")
    m._bench_keywords = keywords

    cls = make_text_classes(m, rng, TEXT_UNITS)

    # The facade's engine pick for this dictionary (rowdfa1 at 10k keywords).
    which = scan_rowdfa.pick_engine(m.compiled)
    if which == "block":
        from ahocorasick_tpu.kernels import scan_block

        bd = m.dev.block_dfa
        windows0 = scan_batched.chunk_classes(cls, 512, bd.halo)
        W = windows0.shape[1]
        windows = scan_block.regroup_windows(windows0)
        G = windows.shape[0] // (W * 8)
        count_fn = lambda t, w: scan_block.block_count(
            t, w, bd.halo, bd.state_bits, bd.num_classes, bd.num_blocks, W, G)
        table = bd.table
    elif which == "rowdfa2":
        rd = m.dev.row_dfa
        windows = scan_rowdfa.chunk_classes2(cls, 512, rd.halo)
        count_fn = lambda t, w: scan_rowdfa.rowdfa_count(
            t, w, rd.halo, rd.state_bits, rd.num_classes)
        table = rd.table
    elif which == "rowdfa1":
        rd = m.dev.row_dfa1
        windows = scan_batched.chunk_classes(cls, 512, rd.halo)
        count_fn = lambda t, w: scan_rowdfa.rowdfa1_count(
            t, w, rd.halo, rd.state_bits, rd.num_classes)
        table = rd.table
    else:
        pd = m.dev.packed_dfa
        windows = scan_batched.chunk_classes(cls, 512, pd.halo)
        count_fn = lambda t, w: scan_batched.batched_count(
            t, w, pd.halo, pd.state_bits)
        table = pd.table
    wdev = jax.device_put(jnp.asarray(windows))

    @jax.jit
    def reps_count(table, w):
        def one(i, tot):
            # jnp.roll reorders lanes per rep: same total work, defeats CSE.
            wi = jnp.roll(w, i, axis=0)
            return tot + count_fn(table, wi)

        return lax.fori_loop(0, REPS, one, jnp.int32(0))

    # Warmup (compile) + correctness guard: count must be positive.
    total = int(count_fn(table, wdev))
    assert total > 0, "benchmark text produced zero matches"

    float(reps_count(table, wdev))  # compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(reps_count(table, wdev))
        times.append(time.perf_counter() - t0)
    dt = min(times) / REPS

    gbps = (TEXT_UNITS * 2) / dt / 1e9
    print(json.dumps({
        "metric": "dfa_scan_throughput",
        "value": round(gbps, 3),
        "unit": "GB/s",
        "vs_baseline": round(gbps / REFERENCE_GBPS, 2),
    }))


if __name__ == "__main__":
    main()
