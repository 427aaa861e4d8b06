"""The reference README's documented examples, pinned verbatim.

Each example is quoted from /root/reference/README.md with its section
line; the expectations here are hand-derived from the README text, not
from the repo's own gold model — external spec anchors.
"""

from ahocorasick_tpu.models.matchers import (
    AhoCorasickSet,
    LongestMatchSet,
    ShortestMatchSet,
    WholeWordLongestMatchSet,
    WholeWordMatchSet,
)
from ahocorasick_tpu.utils import chartables


def _spans(m, text):
    return [text[s:e] for s, e in m.match(text)]


def test_whole_word_readme_example():
    """README.md:109: 'For input string `late evening` and keywords
    `la, late, eve, evening` it will match `late` and `evening`.'"""
    m = WholeWordMatchSet(["la", "late", "eve", "evening"])
    assert _spans(m, "late evening") == ["late", "evening"]


def test_whole_word_longest_readme_examples():
    """README.md:124: 'For input string `as if` and dictionary
    `as if, as, if` it matches `as if`. For input string `ax if` it
    matches `if` and for input string `as of` it will match `as`.'"""
    m = WholeWordLongestMatchSet(["as if", "as", "if"])
    assert _spans(m, "as if") == ["as if"]
    assert _spans(m, "ax if") == ["if"]
    assert _spans(m, "as of") == ["as"]


def test_word_chars_toggle_readme_example():
    """README.md:115-118: toggles `['_', '='], [false, true]` produce a
    set where letters, digits, `-` and `=` are word characters but not
    `_` (default word chars = unicode letters + digits + `_` + `-`)."""
    wc = chartables.word_chars_with_toggles(["_", "="], [False, True])
    assert not wc[ord("_")]
    assert wc[ord("=")] and wc[ord("-")] and wc[ord("a")] and wc[ord("7")]
    # Observable effect: with '_' a separator, 'x_y' is two words.
    m = WholeWordMatchSet(["x", "y"], word_chars=wc)
    assert _spans(m, "x_y a=b") == ["x", "y"]


def test_ac_readme_example():
    """README.md:90: 'For input string of `aaaa` and a dictionary of
    `a, aa, aaa, aaaa`, string `a` will match 4 times, string `aa` will
    match 3 times, string `aaa` will match twice and `aaaa` will match
    once.'"""
    ac = AhoCorasickSet(["a", "aa", "aaa", "aaaa"])
    got = _spans(ac, "aaaa")
    assert sorted(got) == ["a"] * 4 + ["aa"] * 3 + ["aaa"] * 2 + ["aaaa"]


def test_longest_readme_example():
    """README.md:96: 'For input string `a1b2c3d4` and a dictionary of
    `b, b2, 2c3d4`, only `b2` will match. `2c3d4` is longer but it
    overlaps with a match that starts earlier.'"""
    lm = LongestMatchSet(["b", "b2", "2c3d4"])
    assert _spans(lm, "a1b2c3d4") == ["b2"]


def test_shortest_readme_examples():
    """README.md:102: 'For input string `a1b2c3d4` and a dictionary of
    `2, b2, 2c3d4`, only `b2` will match. `2` is shorter but it overlaps
    with a match that starts earlier. With a dictionary of `b, 2, b2`,
    both `b` and `2` will match.'"""
    sm = ShortestMatchSet(["2", "b2", "2c3d4"])
    assert _spans(sm, "a1b2c3d4") == ["b2"]
    sm2 = ShortestMatchSet(["b", "2", "b2"])
    assert _spans(sm2, "a1b2c3d4") == ["b", "2"]
