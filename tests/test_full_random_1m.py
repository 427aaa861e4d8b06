"""Million-keyword correctness — the reference's ``testFullRandom`` scale.

``SetTest.java:82-89`` runs 10k/100k/1M random keywords; the 10k/100k
scales are covered across the engine/oracle test modules, and this module
adds the 1M point the reference reaches: a native-compiled ~1M-keyword
automaton scanned by the device engines (the hotstate layout: 4.36M states
overflow packed-inline), verified two ways — an exact naive-oracle match
list on a 128Ki-unit window, and an exact pinned total count over a 1Mi-
unit text (seeded RNG; the reference's unseeded ``Generator.randomStrings``
made its runs non-reproducible, SURVEY.md §4).

Runtime ~30-60 s depending on host load (compile ~11 s, scan/oracle the
rest) — the suite's one at-scale test, per the reference's own test plan.
"""

import numpy as np

from ahocorasick_tpu.models.matchers import AhoCorasickSet

# Pinned facts for rng seed 77 (regenerate only with an algorithm change).
N_KEYWORDS = 995_169
N_STATES = 4_356_756
TOTAL_MATCHES = 1_282_185


def _keywords():
    rng = np.random.default_rng(77)
    n_cand = 1_100_000
    lens = rng.integers(3, 13, size=n_cand)
    flat = rng.integers(0, 26, size=int(lens.sum()))
    letters = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz", dtype=np.uint8)
    chars = letters[flat].tobytes().decode()
    offs = np.concatenate([[0], np.cumsum(lens)])
    kws = {chars[offs[i]: offs[i + 1]] for i in range(n_cand)}
    return sorted(kws)[:1_000_000], rng, letters


def test_full_random_1m_keywords():
    kws, rng, letters = _keywords()
    assert len(kws) == N_KEYWORDS

    m = AhoCorasickSet(kws, engine="device")
    assert m.compiled.num_states == N_STATES

    from ahocorasick_tpu.ops import scan_batched

    # The scale point of this test: packed-inline overflows (23 state bits
    # + depth 12) and the scan rides the hotstate/count-packed layout.
    assert not scan_batched.inline_packable(m.compiled)
    assert scan_batched.hotstate_layout(m.compiled)

    n_units = 1 << 20
    body = letters[rng.integers(0, 26, size=n_units)].tobytes().decode()
    text = list(body)
    pos = rng.integers(0, n_units - 16, size=2000)
    kw_pick = rng.integers(0, len(kws), size=2000)
    for p, k in zip(pos, kw_pick):
        w = kws[k]
        text[p : p + len(w)] = w
    text = "".join(text)[:n_units]

    assert m.count(text) == TOTAL_MATCHES
    assert m.last_stats.engine == "device"

    # Exact match-list parity vs the naive O(n x depths) oracle on a window
    # (AhoCorasickTest.java:28-38 oracle, positions included).
    w0 = 300_000
    window = text[w0 : w0 + (1 << 17)]
    kwset = set(kws)
    oracle = []
    for i in range(len(window)):
        for L in range(3, 13):
            if i + L <= len(window) and window[i : i + L] in kwset:
                oracle.append((i, i + L))
    got = m.match(window)
    assert len(got) == len(oracle)
    assert sorted(got) == sorted(oracle)
