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


def test_longest_shortest_readme_semantics():
    """README.md:92-103: LongestMatch returns leftmost-longest
    non-overlapping; ShortestMatch the leftmost-shortest (prefix-free
    precondition noted there)."""
    lm = LongestMatchSet(["he", "hers", "she"])
    # leftmost wins over longer-but-later: "she"@1 beats "hers"@2
    assert _spans(lm, "ushers") == ["she"]
    sm = ShortestMatchSet(["hers", "she"])
    assert _spans(sm, "ushers") == ["she"]
    ac = AhoCorasickSet(["he", "hers", "she"])
    assert _spans(ac, "ushers") == ["she", "he", "hers"]
