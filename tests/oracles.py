"""Naive O(needles x positions) oracles, independent of the compiler.

Freshly written counterparts of the reference's test oracles
(``AhoCorasickTest.java:28-38``, ``LongestMatchTest.java:29-58``,
``ShortestMatchTest.java:50-57``, ``WholeWordMatchTest.java:73-90``,
``WholeWordLongestMatchTest.java:74-82``), operating on UTF-16 units so the
offsets match the framework's conventions.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from ahocorasick_tpu.utils import chartables

Span = Tuple[int, int]


def _fold(s: str, case_sensitive: bool) -> np.ndarray:
    u = chartables.to_utf16_units(s)
    return u if case_sensitive else chartables.lower_table()[u]


def _prep(keywords: Sequence[str], case_sensitive: bool) -> List[np.ndarray]:
    out = []
    for kw in keywords:
        if kw:
            out.append(_fold(kw, case_sensitive))
    return out


def _occurs_at(hay: np.ndarray, kw: np.ndarray, i: int) -> bool:
    return i + len(kw) <= len(hay) and bool(np.array_equal(hay[i : i + len(kw)], kw))


def oracle_ac(keywords: Sequence[str], text: str, case_sensitive: bool = True) -> List[Span]:
    hay = _fold(text, case_sensitive)
    # Deduplicate: the automaton reports each (start, end) span once even if
    # the same keyword appears twice in the input list.
    kws = {kw.tobytes(): kw for kw in _prep(keywords, case_sensitive)}
    spans = []
    for kw in kws.values():
        for i in range(len(hay) - len(kw) + 1):
            if _occurs_at(hay, kw, i):
                spans.append((i, i + len(kw)))
    spans.sort(key=lambda se: (se[1], se[0]))
    return spans


def _oracle_greedy(
    keywords: Sequence[str], text: str, case_sensitive: bool, longest_first: bool
) -> List[Span]:
    hay = _fold(text, case_sensitive)
    kws = _prep(keywords, case_sensitive)
    kws.sort(key=len, reverse=longest_first)
    out = []
    i = 0
    n = len(hay)
    while i < n:
        for kw in kws:
            if _occurs_at(hay, kw, i):
                out.append((i, i + len(kw)))
                i += len(kw)
                break
        else:
            i += 1
    return out


def oracle_longest(keywords, text, case_sensitive=True) -> List[Span]:
    return _oracle_greedy(keywords, text, case_sensitive, longest_first=True)


def oracle_shortest_greedy(keywords, text, case_sensitive=True) -> List[Span]:
    """Greedy leftmost-shortest oracle.

    Valid only for prefix-free keyword sets — the same precondition the
    reference documents for ``ShortestMatchSet`` (ShortestMatchSet.java:8-9).
    """
    return _oracle_greedy(keywords, text, case_sensitive, longest_first=False)


def _word_runs(hay: np.ndarray, word_chars: np.ndarray) -> List[Span]:
    is_w = word_chars[hay]
    runs = []
    i = 0
    n = len(hay)
    while i < n:
        if is_w[i]:
            j = i
            while j < n and is_w[j]:
                j += 1
            runs.append((i, j))
            i = j
        else:
            i += 1
    return runs


def oracle_whole_word(
    keywords: Sequence[str],
    text: str,
    case_sensitive: bool = True,
    word_chars: Optional[np.ndarray] = None,
) -> List[Span]:
    """Whole-word oracle: a maximal word run matches iff it equals a keyword."""
    if word_chars is None:
        word_chars = chartables.default_word_chars()
    hay_raw = chartables.to_utf16_units(text)
    hay = hay_raw if case_sensitive else chartables.lower_table()[hay_raw]
    # Wordness is evaluated on the folded character, as in the reference's
    # case-insensitive loop (WholeWordMatchSet.java:96,101).
    eff_word = word_chars if case_sensitive else word_chars[chartables.lower_table()]
    kwset = {kw.tobytes() for kw in _prep(keywords, case_sensitive)}
    out = []
    for a, b in _word_runs(hay_raw, eff_word):
        if hay[a:b].tobytes() in kwset:
            out.append((a, b))
    return out


def oracle_whole_word_longest(
    keywords: Sequence[str],
    text: str,
    case_sensitive: bool = True,
    word_chars: Optional[np.ndarray] = None,
) -> List[Span]:
    """Independent whole-word-longest oracle via string operations.

    The reference implementation's observable behavior (verified against
    ``WholeWordLongestMatchSet.java:47-178``): from each walk start (a word
    start), it reports the *longest* keyword matching there whose end falls
    on a word boundary, then resumes after the word containing the walk's
    die position — the first position where no keyword prefix continues.
    (Note: the reference's own test oracle advances from the match end
    instead and can disagree with the implementation when a keyword
    containing separators dies inside a later word; the implementation is
    the spec we pin.)  Keywords here must be pre-trimmed by the caller or
    contain word chars at both ends.
    """
    if word_chars is None:
        word_chars = chartables.default_word_chars()
    hay_raw = chartables.to_utf16_units(text)
    hay = hay_raw if case_sensitive else chartables.lower_table()[hay_raw]
    eff_word = word_chars if case_sensitive else word_chars[chartables.lower_table()]
    is_w = eff_word[hay_raw]
    kws = sorted(_prep(keywords, case_sensitive), key=len, reverse=True)
    n = len(hay)
    out = []

    def lcp(i: int, kw: np.ndarray) -> int:
        m = min(len(kw), n - i)
        k = 0
        while k < m and hay[i + k] == kw[k]:
            k += 1
        return k

    # Advance to the first word start.
    i = 0
    while i < n and not is_w[i]:
        i += 1
    while i < n:
        walk_len = max((lcp(i, kw) for kw in kws), default=0)
        for kw in kws:  # longest first
            j = i + len(kw)
            if _occurs_at(hay, kw, i) and (j == n or not is_w[j]):
                out.append((i, j))
                break
        p = i + walk_len
        if p >= n:
            break
        if is_w[p]:
            # Walk died inside a word: skip to the end of that word.
            p += 1
            while p < n and is_w[p]:
                p += 1
        p += 1
        while p < n and not is_w[p]:
            p += 1
        i = p
    return out
