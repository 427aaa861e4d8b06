"""Dictionary-scale conformance corpus — the ``SetTest.testDictionary``
analog (``SetTest.java:40-59``: 235,886-word /usr/share/dict/words vs an
English paragraph).

The wordlist is regenerated deterministically (``tests/dict_corpus.py``) and
the exact match counts for all five kinds are PINNED below, for three
inputs: the paragraph (gold engine — the per-char executable reference
semantics), a 6k-unit corpus prefix (gold), and the full 120k-unit corpus
(device engines).  Gold and device paths must both land on the pinned
numbers; any semantic drift in the compiler, the gold loops, or any device
engine at dictionary scale fails here.

Whole-word kinds use a 39,315-word subset (words[::6]): their compile path
is pure Python and the full dictionary costs ~45 s, which is bench
territory, not CI.  The subset still exercises dictionary-scale tries
(~250k states).
"""

import pytest

from ahocorasick_tpu.models import matchers

from dict_corpus import dict_corpus, dict_paragraph, dict_words

# (paragraph gold, corpus[:6000] gold, corpus device) — regenerate with the
# loop below if the seeded generator ever changes intentionally.
PINNED = {
    "ac": (306, 2490, 48478),
    "longest": (67, 468, 9469),
    "shortest": (133, 1014, 20201),
    "whole_word": (8, 45, 998),
    "whole_word_longest": (8, 45, 998),
}

CORPUS_UNITS = 120_000


@pytest.fixture(scope="module")
def corpus():
    words = dict_words()
    assert len(words) == 235_886
    return words, dict_paragraph(words), dict_corpus(words, CORPUS_UNITS)


@pytest.mark.parametrize("kind", sorted(PINNED))
def test_dictionary_counts_pinned(corpus, kind):
    words, para, text = corpus
    kwlist = words if kind in ("ac", "longest", "shortest") else words[::6]
    m = matchers._CLASS_BY_KIND[(kind, False)](kwlist, True)  # engine=auto

    n_para, n_prefix, n_corpus = PINNED[kind]
    assert m.count(para) == n_para
    assert m.last_stats.engine == "gold"  # small input -> reference loop
    assert m.count(text[:6000]) == n_prefix
    assert m.last_stats.engine == "gold"
    assert m.count(text) == n_corpus
    assert m.last_stats.engine == "device"  # large input -> device engine


def test_dictionary_counts_cosigned_by_naive_oracle(corpus):
    """The pinned gold counts, re-derived by the compiler-independent naive
    oracle (tests/oracles.py set-membership recounts) on the paragraph and
    the 6k corpus prefix — so the conformance anchor is not single-sourced
    on the repo's own gold model (round-5; SetTest.java:186-191 role)."""
    import oracles

    words, para, text = corpus
    prefix = text[:6000]
    ww_words = words[::6]
    for kind, fn, kws in (
        ("ac", oracles.oracle_ac_count_fast, words),
        ("longest", oracles.oracle_longest_count_fast, words),
        ("shortest", oracles.oracle_shortest_count_fast, words),
        ("whole_word", oracles.oracle_whole_word_count_fast, ww_words),
        ("whole_word_longest", oracles.oracle_whole_word_count_fast, ww_words),
    ):
        n_para, n_prefix, _ = PINNED[kind]
        assert fn(kws, para) == n_para, kind
        assert fn(kws, prefix) == n_prefix, kind


def test_dictionary_map_values(corpus):
    """Map variant at dictionary scale: every reported value id is the
    index of exactly the keyword occupying the span (MapTest analog)."""
    words, para, _ = corpus
    m = matchers._CLASS_BY_KIND[("ac", True)](words, list(range(len(words))), True)
    s, e, v = m.match_triples(para)
    assert len(s) == PINNED["ac"][0]
    assert all(
        para[int(a):int(b)].lower() == words[int(val)]
        for a, b, val in zip(s, e, v)
    )


def test_whole_word_kinds_agree_on_pure_word_keywords(corpus):
    """Generated keywords contain no separators, so WHOLE_WORD and
    WHOLE_WORD_LONGEST must agree exactly (fail-matches never differ
    when every keyword is a single word)."""
    assert PINNED["whole_word"] == PINNED["whole_word_longest"]
