"""Hand-derived conformance cases — independent of gold AND oracles.

Unlike ``tests/golden/fixtures.json`` (generated from the repo's own gold
model) and ``tests/oracles.py`` (an independent *implementation*), every
expected result in this file was computed BY HAND from the reference's
source semantics, with the governing Java lines cited per case:

* AC emission order: after consuming the character at ``idx``, the node
  emits its own (longest) match then walks ``suffixMatch`` links in
  decreasing length — ``AhoCorasickSet.java:522-535`` (``output()``), chain
  construction ``AhoCorasickSet.java:95-121``.  ``end`` is one past the
  last unit (``idx - matchLength, idx`` at ``++idx``).
* Leftmost-longest overlap rules: ``SetMatchQueue.java:45-95`` — accept
  non-overlapping; same-start-longer replaces; an overlapping later-start
  candidate is rejected; a candidate starting left of queued matches
  displaces them.
* Shortest: prefix-pruned inserts + report-then-restart-after-end
  (``ShortestMatchSet.java:23-42,182-260``).
* Whole word: segments delimited by non-word characters; a keyword matches
  iff it spans a whole segment (``WholeWordMatchSet.java:47-132``).

A failure here is independent evidence of a semantics break, not a fixture
to regenerate.
"""

import pytest

from ahocorasick_tpu.models.matchers import (
    AhoCorasickMap,
    AhoCorasickSet,
    LongestMatchSet,
    ShortestMatchSet,
    WholeWordLongestMatchSet,
    WholeWordMatchSet,
)

ENGINES = ["gold", "device"]

# (name, matcher class, ctor args/kwargs, haystack, expected pairs/triples)
SET_CASES = [
    # "ushers": she ends at 4 (longest-at-end first), he at 4, hers at 6.
    ("ac_ushers", AhoCorasickSet, (["he", "she", "his", "hers"], True),
     "ushers", [(1, 4), (2, 4), (2, 6)]),
    # Suffix-chain order at one end index: abc, then bc, then c
    # (AhoCorasickSet.java:95-99 comment's own worked example).
    ("ac_suffix_chain", AhoCorasickSet, (["abc", "bc", "c", "b"], True),
     "xabc", [(2, 3), (1, 4), (2, 4), (3, 4)]),
    # Overlapping repeats: every window of "aaaa".
    ("ac_aaaa", AhoCorasickSet, (["aa", "aaa"], True),
     "aaaa", [(0, 2), (0, 3), (1, 3), (1, 4), (2, 4)]),
    # Java Character.toLowerCase folding on both sides.
    ("ac_fold", AhoCorasickSet, (["He"], False),
     "hE llo HE", [(0, 2), (7, 9)]),
    # Leftmost-longest: she beats he (same end, earlier start); hers
    # overlaps the accepted she and starts later -> rejected.
    ("longest_ushers", LongestMatchSet, (["he", "she", "hers"], True),
     "ushers", [(1, 4)]),
    # Same-start-longer replaces: a -> ab -> abc.
    ("longest_replace", LongestMatchSet, (["a", "ab", "abc"], True),
     "zabc", [(1, 4)]),
    # Later-start overlap rejected: bcd loses to the queued abc.
    ("longest_reject", LongestMatchSet, (["abc", "bcd"], True),
     "abcd", [(0, 3)]),
    # Earlier-start candidate displaces the queued tail: abcd evicts bc.
    ("longest_displace", LongestMatchSet, (["bc", "abcd"], True),
     "abcd", [(0, 4)]),
    # Shortest: report then restart AFTER the match end (no overlap).
    ("shortest_restart", ShortestMatchSet, (["ab", "cd"], True),
     "xabcdab", [(1, 3), (3, 5), (5, 7)]),
    # The restart discards the in-flight overlapping occurrence.
    ("shortest_overlap", ShortestMatchSet, (["aba"], True),
     "ababa", [(0, 3)]),
    # Prefix pruning: "abc" can never be reported once "ab" is inserted.
    ("shortest_pruned", ShortestMatchSet, (["ab", "abc"], True),
     "zabcabc", [(1, 3), (4, 6)]),
    # Whole word: keyword must span a whole word segment; "cat" inside
    # "scat" is not boundary-delimited.
    ("whole_word", WholeWordMatchSet, (["cat", "at"], True),
     "cat at scat", [(0, 3), (4, 6)]),
    ("whole_word_longest", WholeWordLongestMatchSet, (["can", "cannot"], True),
     "can cannot can.", [(0, 3), (4, 10), (11, 14)]),
]


@pytest.mark.parametrize("engine", ENGINES)
@pytest.mark.parametrize("case", SET_CASES, ids=[c[0] for c in SET_CASES])
def test_hand_derived_sets(case, engine):
    _, cls, args, haystack, expected = case
    m = cls(*args, engine=engine)
    assert m.match(haystack) == expected


@pytest.mark.parametrize("engine", ENGINES)
def test_hand_derived_map_values(engine):
    # she ends at 3 (longest first), then he; values ride along.
    m = AhoCorasickMap(["he", "she"], ["H", "S"], True, engine=engine)
    assert m.match("she") == [(0, 3, "S"), (1, 3, "H")]


@pytest.mark.parametrize("engine", ENGINES)
def test_hand_derived_duplicate_value_overwrite(engine):
    # Duplicate keyword: the LAST value wins (AhoCorasickMap.java map put).
    m = AhoCorasickMap(["a", "a"], [1, 2], True, engine=engine)
    assert m.match("a") == [(0, 1, 2)]
