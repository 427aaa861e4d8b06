"""Gold-model conformance vs naive oracles, on the reference's test battery.

Scenarios mirror ``SetTest.java:61-130`` (failure-transition chains, overlap
torture, full-alphabet nodes, long keywords, random dictionaries — seeded
here, unlike the reference's unseeded Generator.java) plus greedy-semantics
cases for the non-overlapping variants.
"""

import random

import numpy as np
import pytest

from ahocorasick_tpu.core import gold
from ahocorasick_tpu.core.compiler import (
    AC,
    LONGEST,
    SHORTEST,
    WHOLE_WORD,
    WHOLE_WORD_LONGEST,
    compile_matcher,
)
from oracles import (
    oracle_ac,
    oracle_longest,
    oracle_shortest_greedy,
    oracle_whole_word,
    oracle_whole_word_longest,
)


def spans(matches):
    return [(s, e) for s, e, _ in matches]


def random_strings(rng, count, min_len=2, max_len=10, ascii_ratio=0.5):
    out = []
    for _ in range(count):
        n = rng.randint(min_len, max_len)
        chars = []
        for _ in range(n):
            if rng.random() < ascii_ratio:
                chars.append(chr(rng.randint(0x20, 0x7E)))
            else:
                cp = rng.randint(0xA0, 0x2FFF)
                chars.append(chr(cp))
        out.append("".join(chars))
    return out


CASES = [
    (["a"], "a"),
    (["a", "ab", "abc"], "abcabc xabc"),
    # Fail-transition chains (SetTest.testFailureTransitions):
    (["abcd", "bcd", "cd", "d", "bce", "ce", "e"], "abce abcd bce"),
    (["he", "she", "his", "hers"], "ushers and his"),
    # Overlap torture (SetTest.testOverlap):
    (["aaaa", "aaa", "aa", "a"], "aaaaaaaaaa"),
    (["aa"], "aaaaaa"),
    # Mixed:
    (["in", "inn", "innk", "nk"], "the innkeeper"),
    ([], "anything"),
    (["xyz"], ""),
    (["longerthantext"], "short"),
]


@pytest.mark.parametrize("cs", [True, False])
@pytest.mark.parametrize("keywords,text", CASES)
def test_ac_vs_oracle(keywords, text, cs):
    m = compile_matcher(keywords, AC, cs)
    got = spans(gold.gold_ac(m, text))
    want = oracle_ac(keywords, text, cs)
    assert got == want


@pytest.mark.parametrize("cs", [True, False])
def test_ac_case_insensitive_folding(cs):
    m = compile_matcher(["Straße", "ÅNGSTRÖM"], AC, cs)
    got = spans(gold.gold_ac(m, "straße ångström STRASSE"))
    if cs:
        assert got == []
    else:
        assert got == [(0, 6), (7, 15)]


def test_ac_random_dictionary():
    rng = random.Random(1234)
    kws = random_strings(rng, 500)
    text = "".join(random_strings(rng, 200, 1, 8))
    m = compile_matcher(kws, AC, True)
    assert spans(gold.gold_ac(m, text)) == oracle_ac(kws, text, True)


def test_full_alphabet_root():
    # Reference testFullNode: every single-char keyword (subset here: 3000
    # chars spanning BMP ranges) — exercises a dense root.
    kws = [chr(c) for c in range(32, 3032)]
    text = "".join(chr((i * 37) % 3000 + 32) for i in range(500))
    m = compile_matcher(kws, AC, True)
    assert spans(gold.gold_ac(m, text)) == oracle_ac(kws, text, True)


def test_long_keywords():
    # Reference testLongKeywords: 100 keywords of repeated 'a' up to len 100.
    kws = ["a" * n for n in range(1, 101)]
    text = "a" * 230
    m = compile_matcher(kws, AC, True)
    assert spans(gold.gold_ac(m, text)) == oracle_ac(kws, text, True)


@pytest.mark.parametrize("cs", [True, False])
@pytest.mark.parametrize("keywords,text", CASES)
def test_longest_vs_oracle(keywords, text, cs):
    m = compile_matcher(keywords, LONGEST, cs)
    got = spans(gold.gold_longest(m, text))
    want = oracle_longest(keywords, text, cs)
    assert got == want


def test_longest_random():
    rng = random.Random(99)
    kws = random_strings(rng, 300, 1, 6, ascii_ratio=1.0)
    text = "".join(random_strings(rng, 400, 1, 5, ascii_ratio=1.0))
    m = compile_matcher(kws, LONGEST, True)
    assert spans(gold.gold_longest(m, text)) == oracle_longest(kws, text, True)


def test_longest_adversarial_aaaa():
    kws = ["a", "aa", "aaa", "aaaa", "ab", "aab"]
    for text in ["aaaaaaa", "aabaaab", "abababa", "aaabaab"]:
        m = compile_matcher(kws, LONGEST, True)
        assert spans(gold.gold_longest(m, text)) == oracle_longest(kws, text, True)


PREFIX_FREE_CASES = [
    (["ab", "cd", "ef"], "abcdefabef"),
    (["aaa", "ab"], "aaaaab"),
    (["foo", "bar"], "xfooxbarxfoobar"),
    (["bc", "aaab"], "aaabc"),
]


@pytest.mark.parametrize("keywords,text", PREFIX_FREE_CASES)
def test_shortest_vs_oracle(keywords, text):
    m = compile_matcher(keywords, SHORTEST, True)
    got = spans(gold.gold_shortest(m, text))
    want = oracle_shortest_greedy(keywords, text, True)
    assert got == want


def test_shortest_prefix_pruning():
    # "abc" can never match because "ab" shadows it; insertion-order quirk
    # reproduced from ShortestMatchSet.java:23-42.
    m = compile_matcher(["abc", "ab"], SHORTEST, True)
    assert spans(gold.gold_shortest(m, "abcabc")) == [(0, 2), (3, 5)]
    m2 = compile_matcher(["ab", "abc"], SHORTEST, True)
    assert spans(gold.gold_shortest(m2, "abcabc")) == [(0, 2), (3, 5)]


def test_shortest_random_prefix_free():
    rng = random.Random(7)
    # Build a prefix-free random set: fixed length keywords are prefix-free.
    kws = list({s for s in random_strings(rng, 200, 3, 3, ascii_ratio=1.0)})
    text = "".join(random_strings(rng, 500, 1, 4, ascii_ratio=1.0))
    m = compile_matcher(kws, SHORTEST, True)
    assert spans(gold.gold_shortest(m, text)) == oracle_shortest_greedy(kws, text, True)


WW_CASES = [
    (["as", "if"], "as if you go"),
    (["go"], "go going went go"),
    (["word"], "word, word; word—word"),
    (["ab", "abc"], "ab abc abcd"),
    (["x-y", "a_b"], "x-y a_b x-y-z"),
]


@pytest.mark.parametrize("cs", [True, False])
@pytest.mark.parametrize("keywords,text", WW_CASES)
def test_whole_word_vs_oracle(keywords, text, cs):
    m = compile_matcher(keywords, WHOLE_WORD, cs)
    got = spans(gold.gold_whole_word(m, text))
    want = oracle_whole_word(keywords, text, cs)
    assert got == want


def test_whole_word_rejects_nonword():
    with pytest.raises(ValueError):
        compile_matcher(["a b"], WHOLE_WORD, True)


def test_whole_word_trims():
    m = compile_matcher(["  go!!", "..stop.."], WHOLE_WORD, True)
    got = spans(gold.gold_whole_word(m, "go stop going"))
    assert got == [(0, 2), (3, 7)]


def test_whole_word_random():
    rng = random.Random(5)
    words = ["".join(rng.choice("abcdefg") for _ in range(rng.randint(1, 6))) for _ in range(100)]
    kws = rng.sample(words, 30)
    text = " ".join(rng.choice(words) for _ in range(300))
    m = compile_matcher(kws, WHOLE_WORD, True)
    assert spans(gold.gold_whole_word(m, text)) == oracle_whole_word(kws, text, True)


WWL_CASES = [
    (["as if", "as"], "as if you go"),
    (["as if", "as"], "as ix you go"),
    (["new york", "york city", "new"], "new york city"),
    (["a b c", "b c"], "a b c d"),
    (["go"], "go going"),
]


@pytest.mark.parametrize("keywords,text", WWL_CASES)
def test_whole_word_longest_vs_oracle(keywords, text):
    m = compile_matcher(keywords, WHOLE_WORD_LONGEST, True)
    got = spans(gold.gold_whole_word_longest(m, text))
    want = oracle_whole_word_longest(keywords, text, True)
    assert got == want


def test_whole_word_longest_fail_match():
    # "as" completes at a word boundary inside the failed attempt at "as ix";
    # the carried fail-match must still be reported
    # (WholeWordLongestMatchSet.java:65-95).
    m = compile_matcher(["as ix", "as"], WHOLE_WORD_LONGEST, True)
    assert spans(gold.gold_whole_word_longest(m, "as if")) == [(0, 2)]


def test_whole_word_longest_random():
    rng = random.Random(11)
    words = ["".join(rng.choice("abc") for _ in range(rng.randint(1, 4))) for _ in range(40)]
    kws = [" ".join(rng.sample(words, rng.randint(1, 3))) for _ in range(40)]
    text = " ".join(rng.choice(words) for _ in range(400))
    m = compile_matcher(kws, WHOLE_WORD_LONGEST, True)
    got = spans(gold.gold_whole_word_longest(m, text))
    want = oracle_whole_word_longest(kws, text, True)
    assert got == want


def test_values_roundtrip():
    kws = ["he", "she", "his", "hers"]
    vals = ["vhe", "vshe", "vhis", "vhers"]
    m = compile_matcher(kws, AC, True, values=vals)
    out = gold.gold_ac(m, "ushers")
    resolved = [(s, e, m.values[v]) for s, e, v in out]
    assert resolved == [(1, 4, "vshe"), (2, 4, "vhe"), (2, 6, "vhers")]


def test_duplicate_keyword_last_value_wins():
    m = compile_matcher(["ab", "ab"], AC, True, values=[1, 2])
    out = gold.gold_ac(m, "ab")
    assert [(s, e, m.values[v]) for s, e, v in out] == [(0, 2, 2)]
