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


# --------------------------------------------------------------------------- #
# Set-membership recounts for LARGE dictionaries (round 5): the per-keyword
# loops above are O(keywords x positions) — fine for fuzz-sized inputs,
# infeasible at the 235,886-word dictionary corpus.  These reorganize the
# same naive semantics by keyword length (O(positions x distinct lengths)
# hash probes over the raw UTF-16 bytes), still fully independent of the
# compiler/engines; they co-sign tests/test_dict_corpus.py's pinned counts
# (SetTest.java:40-59 oracle role).
# --------------------------------------------------------------------------- #


def _by_len(keywords: Sequence[str], case_sensitive: bool):
    by_len: dict = {}
    for kw in _prep(keywords, case_sensitive):
        by_len.setdefault(len(kw), set()).add(kw.tobytes())
    return by_len


def oracle_ac_count_fast(keywords, text, case_sensitive=True) -> int:
    hay = _fold(text, case_sensitive)
    hb = hay.tobytes()
    n = len(hay)
    total = 0
    for L, s in _by_len(keywords, case_sensitive).items():
        W = 2 * L
        total += sum(1 for i in range(0, 2 * (n - L + 1), 2)
                     if hb[i : i + W] in s)
    return total


def oracle_longest_count_fast(keywords, text, case_sensitive=True) -> int:
    """Greedy leftmost-longest recount (same semantics as oracle_longest)."""
    hay = _fold(text, case_sensitive)
    hb = hay.tobytes()
    n = len(hay)
    by_len = _by_len(keywords, case_sensitive)
    lengths = sorted(by_len, reverse=True)
    count = 0
    i = 0
    while i < n:
        for L in lengths:
            if i + L <= n and hb[2 * i : 2 * (i + L)] in by_len[L]:
                count += 1
                i += L
                break
        else:
            i += 1
    return count


def oracle_shortest_count_fast(keywords, text, case_sensitive=True) -> int:
    """Leftmost-shortest recount, independent of the compiler: reproduces
    the reference's two observable rules directly — insert-time skipping of
    keywords with an already-accepted prefix (``ShortestMatchSet.java:23-42``)
    and the lagged min-end restart loop, in its candidate form (first
    candidate in (end asc, start asc) order with start >= cursor)."""
    # Insert-order survivor filter by prefix membership (first wins).
    accepted: set = set()
    surv = []
    for kw in keywords:
        if not kw:
            continue
        u = _fold(kw, case_sensitive)
        b = u.tobytes()
        if any(b[: 2 * j] in accepted for j in range(1, len(u) + 1)):
            continue
        accepted.add(b)
        surv.append(kw)
    hay = _fold(text, case_sensitive)
    hb = hay.tobytes()
    n = len(hay)
    by_len = _by_len(surv, case_sensitive)
    cands = []
    for L, s in by_len.items():
        for i in range(n - L + 1):
            if hb[2 * i : 2 * (i + L)] in s:
                cands.append((i + L, i))
    cands.sort()
    p = 0
    count = 0
    for e, i in cands:
        if i >= p:
            count += 1
            p = e
    return count


def oracle_whole_word_count_fast(keywords, text, case_sensitive=True,
                                 word_chars=None) -> int:
    """Whole-word recount: maximal word runs vs a keyword set (one probe
    per run) — already length-independent; counts only."""
    return len(oracle_whole_word(keywords, text, case_sensitive, word_chars))
