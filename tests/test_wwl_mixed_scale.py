"""Separator-spanning WWL at dictionary scale (round 5).

100k pure-word keywords + 2k two-word phrases: the truncated-closure scan
engine (325k-state trie, crossing edges at every phrase boundary) vs the
gold walk on a phrase-dense text.  The at-scale anchor for the mixed
engine — the single-chip analog of ``SetTest.java:82-89`` for the
WholeWordLongestMatchSet variant (``WholeWordLongestMatchSet.java:47-178``).

Runtime ~25 s (compile ~5 s, lazy truncated closure ~1.5 s, scan + gold
the rest).
"""

import numpy as np

from ahocorasick_tpu.core import gold
from ahocorasick_tpu.models.matchers import WholeWordLongestMatchSet
from ahocorasick_tpu.ops import scan_wwl

# Pinned facts for rng seed 1.  Regenerate on an algorithm change OR a
# numpy upgrade: Generator bit streams for choice/integers may change
# between numpy versions (NEP 19 stability applies to RandomState only).
N_KEYWORDS = 97_215
N_STATES = 324_802


def test_mixed_wwl_100k_keywords():
    rng = np.random.default_rng(1)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    words = ["".join(rng.choice(letters, size=int(rng.integers(3, 10))))
             for _ in range(100_000)]
    phrases = [words[i] + " " + words[i + 1] for i in range(0, 4000, 2)]
    kws = sorted(set(words + phrases))
    assert len(kws) == N_KEYWORDS

    m = WholeWordLongestMatchSet(kws, engine="device")
    assert m.compiled.num_states == N_STATES
    assert m.compiled.dfa_next is None  # mixed: no compiled closure
    assert scan_wwl.mixed_scan_applicable(m.compiled)

    pieces = []
    for _ in range(3000):
        r = int(rng.integers(100))
        if r < 10:
            pieces.append(phrases[int(rng.integers(len(phrases)))])
        elif r < 50:
            pieces.append(words[int(rng.integers(len(words)))])
        else:
            pieces.append("".join(rng.choice(letters,
                                             size=int(rng.integers(2, 8)))))
    text = " ".join(pieces)

    got = m.match(text)
    assert m.last_stats.engine == "device"
    want = [(a, b) for a, b, _ in
            gold.gold_whole_word_longest(m.compiled, text)]
    assert got == want
    # The text really exercises crossings: phrase matches present.
    spans = {text[s:e] for s, e in got}
    assert any(" " in s for s in spans)
