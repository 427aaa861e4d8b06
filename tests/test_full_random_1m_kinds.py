"""Million-keyword correctness for the RESOLVED kinds and map plumbing.

``test_full_random_1m`` pins the AC kind at the reference's 1M scale
(``SetTest.java:82-89``); this module adds the round-4 gap: the
longest/shortest resolvers and map value plumbing at the >4M-state scale
where int32-edge bugs live (one was found on the split path in round 2).

Same native-compiled dictionary and seeded text as the AC test; each test
pins the resolved total count over a 1Mi-unit text and checks exact
window triples against the gold loop (the executable mirror of
``LongestMatchSet.java:211-232`` / ``ShortestMatchSet.java:182-260``).
"""

import numpy as np
import pytest

from ahocorasick_tpu.core import gold

# Pinned facts for rng seed 77 (regenerate only with an algorithm change).
N_KEYWORDS = 995_169


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


def _text(rng, letters, kws, n_units=1 << 20):
    body = letters[rng.integers(0, 26, size=n_units)].tobytes().decode()
    text = list(body)
    pos = rng.integers(0, n_units - 16, size=2000)
    kw_pick = rng.integers(0, len(kws), size=2000)
    for p, k in zip(pos, kw_pick):
        w = kws[k]
        text[p : p + len(w)] = w
    return "".join(text)[:n_units]


@pytest.fixture(scope="module")
def corpus():
    kws, rng, letters = _keywords()
    assert len(kws) == N_KEYWORDS
    return kws, _text(rng, letters, kws)


def test_full_random_1m_longest(corpus):
    from ahocorasick_tpu.models.matchers import LongestMatchSet

    kws, text = corpus
    m = LongestMatchSet(kws, engine="device")
    assert m.compiled.num_states == 4_356_756  # int32-edge territory
    total = m.count(text)
    assert m.last_stats.engine == "device"
    assert total == 323_331

    w0 = 300_000
    window = text[w0 : w0 + (1 << 17)]
    got = m.match(window)
    want = [(a, b) for a, b, _ in gold.gold_longest(m.compiled, window)]
    assert got == want
    assert len(want) > 0


def test_full_random_1m_shortest_map():
    from ahocorasick_tpu.models.matchers import ShortestMatchMap

    # Dense short keywords collapse under the insert-order prefix pruning
    # (ShortestMatchSet.java:23-42): nearly every 3-letter prefix exists, so
    # the sorted 1M dictionary prunes to ~25k states.  To exercise the
    # resolver and map plumbing at the >4M-state scale, use min-length-8
    # keywords (few prefix collisions -> survivors keep the full trie).
    rng = np.random.default_rng(78)
    n_cand = 600_000
    lens = rng.integers(8, 14, size=n_cand)
    flat = rng.integers(0, 26, size=int(lens.sum()))
    letters = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz", dtype=np.uint8)
    chars = letters[flat].tobytes().decode()
    offs = np.concatenate([[0], np.cumsum(lens)])
    kws = sorted({chars[offs[i]: offs[i + 1]] for i in range(n_cand)})
    text = _text(rng, letters, kws)

    m = ShortestMatchMap(kws, list(range(len(kws))), engine="device")
    assert m.compiled.num_states == 4_236_037
    total = m.count(text)
    assert total == 1_960

    w0 = 300_000
    window = text[w0 : w0 + (1 << 17)]
    got = []
    m.match(window, lambda t, s, e, v: (got.append((s, e, v)), True)[1])
    want = [(a, b, m.compiled.values[c])
            for a, b, c in gold.gold_shortest(m.compiled, window)]
    assert got == want
    assert len(want) > 0


def test_full_random_1m_wwl(corpus):
    """Whole-word-longest at the 4.36M-state scale: the native whole-word
    compile (round 4) plus the scan-based walk engine, pinned count +
    window-exact gold parity (the r3 1M coverage was AC-only)."""
    from ahocorasick_tpu.models.matchers import WholeWordLongestMatchSet
    from ahocorasick_tpu.ops import scan_wwl

    kws, _ = corpus
    rng = np.random.default_rng(77)
    # Word-soup text with separators (word starts are what WWL walks).
    letters = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz", dtype=np.uint8)
    n_units = 1 << 20
    words = rng.integers(0, len(kws), size=300_000)
    noise = ["".join(letters[rng.integers(0, 26, size=int(rng.integers(3, 9)))]
                     .tobytes().decode()) for _ in range(256)]
    parts, total, i = [], 0, 0
    while total < n_units:
        w = kws[int(words[i % len(words)])] if (i % 3 == 0) else noise[i % 256]
        parts.append(w)
        total += len(w) + 1
        i += 1
    text = " ".join(parts)[:n_units]

    m = WholeWordLongestMatchSet(kws, engine="device")
    assert m.compiled.num_states == 4_356_756
    assert scan_wwl.scan_applicable(m.compiled)
    assert m.count(text) == 66_610
    assert m.last_stats.engine == "device"

    w0 = 300_000
    window = text[w0 : w0 + (1 << 17)]
    got = []
    m.match(window, lambda t, s, e: (got.append((s, e)), True)[1])
    want = [(a, b) for a, b, _ in
            gold.gold_whole_word_longest(m.compiled, window)]
    assert got == want
    assert len(want) > 0
