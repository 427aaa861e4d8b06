"""Shortest-match candidates-then-resolve device path vs the gold loop.

The device path scans a plain AC automaton over the insert-surviving
keywords and resolves with the min-end greedy (``resolve_shortest``); gold
walks the reference's lagged restart loop (``ShortestMatchSet.java:182-260``)
on the pruned automaton.  These tests pin the equivalence across the corner
cases the construction is sensitive to: insert-order prefix skips, exact
duplicates (first value wins), fail-chain-inherited matches and values
(``ShortestMatchMap.java:113-118``), pruning-removed keywords, and chunk
boundaries — plus seeded fuzz, single-chip and sharded.
"""

import numpy as np
import pytest

from ahocorasick_tpu.core.compiler import shortest_survivors
from ahocorasick_tpu.models.matchers import ShortestMatchMap, ShortestMatchSet
from ahocorasick_tpu.parallel.sharding import ShardedScanner
from ahocorasick_tpu.resolve.queue import resolve_shortest_py


def _gold(kws, text, values=None, case_sensitive=True):
    if values is None:
        return ShortestMatchSet(kws, case_sensitive, engine="gold").match(text)
    return ShortestMatchMap(kws, values, case_sensitive, engine="gold").match(text)


def _dev(kws, text, values=None, case_sensitive=True):
    if values is None:
        return ShortestMatchSet(kws, case_sensitive, engine="device").match(text)
    return ShortestMatchMap(kws, values, case_sensitive, engine="device").match(text)


def test_survivors_insert_order_skips():
    # "b" first blocks "bc"; "ab" survives; duplicate "ab" skipped.
    kws, vals = shortest_survivors(["b", "bc", "ab", "ab"], True, [1, 2, 3, 4])
    assert kws == ["b", "ab"] and vals == [1, 3]
    # Reversed order: "bc" inserted before its prefix becomes a match.
    kws2, _ = shortest_survivors(["bc", "b", "ab"], True, None)
    assert kws2 == ["bc", "b", "ab"]


@pytest.mark.parametrize("case_sensitive", [True, False])
def test_basic_equivalence(case_sensitive):
    kws = ["ab", "bcd", "d", "xa", "aab", "b"]
    for text in ("zabcdz", "xaab", "aabaabxaab", "dddd", "", "zz"):
        assert _dev(kws, text, case_sensitive=case_sensitive) == _gold(
            kws, text, case_sensitive=case_sensitive
        ), text


def test_restart_sees_shorter_suffix_keyword():
    # After accepting "xa" (0,2), the restarted walk must report "b" (3,4),
    # not reject end 4 because the longer "aab" (1,4) starts before the
    # cursor — the case that kills one-candidate-per-end schemes.
    kws = ["xa", "aab", "b"]
    assert _gold(kws, "xaab") == [(0, 2), (3, 4)]
    assert _dev(kws, "xaab") == [(0, 2), (3, 4)]


def test_duplicate_keyword_first_value_wins():
    # Insert-time skip: the duplicate's value must NOT overwrite (unlike the
    # AC map's overwrite rule) — ShortestMatchSet.java:23-42.
    got = _dev(["ab", "ab"], "zabz", values=["first", "second"])
    assert got == [(1, 3, "first")]
    assert got == _gold(["ab", "ab"], "zabz", values=["first", "second"])


def test_inherited_value_via_fail_chain():
    # Node "cab" (a prefix of "cabd", no own match) inherits the match "ab"
    # via its fail chain and becomes a pruned leaf, so scanning "xcabz"
    # reports ab's span AND ab's value (ShortestMatchMap.java:113-118) —
    # and "cabd" is pruned out entirely.
    kws, vals = ["ab", "cabd"], ["v-ab", "v-cabd"]
    got = _gold(kws, "xcabz", values=vals)
    assert got == [(2, 4, "v-ab")]
    assert _dev(kws, "xcabz", values=vals) == got
    # Even when "cabd" fully occurs, the inherited pending match wins.
    got2 = _gold(kws, "xcabd", values=vals)
    assert got2 == [(2, 4, "v-ab")]
    assert _dev(kws, "xcabd", values=vals) == got2


def test_own_match_preempts_suffix_keyword():
    # State "cab" has an OWN match, so the walk reports the longest
    # occurrence ending there — (1,4) with cab's value — not the "ab"
    # suffix.  The resolve reproduces this via the start-ascending order
    # within an end.
    kws, vals = ["ab", "cab"], ["v-ab", "v-cab"]
    got = _gold(kws, "xcab", values=vals)
    assert got == [(1, 4, "v-cab")]
    assert _dev(kws, "xcab", values=vals) == got


def test_pruned_keyword_never_reported():
    # "abcd" contains "bc" ending mid-way: node "abc" inherits the match and
    # is pruned to a leaf, so "abcd" can never be reported.
    kws = ["bc", "abcd"]
    text = "zabcdz"
    got = _gold(kws, text)
    assert got == [(2, 4)]  # only "bc"
    assert _dev(kws, text) == got


def test_fuzz_device_vs_gold_set_and_map():
    rng = np.random.default_rng(20260820)
    alphabet = list("abc")
    for trial in range(40):
        n_kw = int(rng.integers(1, 12))
        kws = ["".join(rng.choice(alphabet, size=int(rng.integers(1, 5))))
               for _ in range(n_kw)]
        vals = [f"v{i}" for i in range(n_kw)]
        text = "".join(rng.choice(alphabet + ["x"], size=int(rng.integers(0, 120))))
        assert _dev(kws, text) == _gold(kws, text), (kws, text)
        assert _dev(kws, text, values=vals) == _gold(kws, text, values=vals), (
            kws, text)


def test_resolve_shortest_py_linear_pass():
    # candidates sorted (end asc, start asc); cursor semantics direct check
    starts = np.array([0, 1, 3, 2, 5])
    ends = np.array([2, 4, 4, 6, 6])
    vals = np.array([10, 11, 12, 13, 14])
    s, e, v = resolve_shortest_py(starts, ends, vals)
    # accept (0,2) -> p=2; skip (1,4); accept (3,4) -> p=4; skip (2,6); accept (5,6)
    assert s.tolist() == [0, 3, 5] and e.tolist() == [2, 4, 6]
    assert v.tolist() == [10, 12, 14]


def test_sharded_shortest_candidates_path():
    rng = np.random.default_rng(7)
    kws = ["".join(rng.choice(list("ab"), size=int(rng.integers(1, 4))))
           for _ in range(8)]
    text = "".join(rng.choice(list("abx"), size=3000))
    m = ShortestMatchSet(kws)
    sc = ShardedScanner(m)
    s, e, _ = sc.match_triples(text)
    got = list(zip(map(int, s), map(int, e)))
    assert got == _gold(kws, text)
    assert sc.count(text) == len(got)
    assert sc._inner is not None  # rode the internal AC scanner


def test_sharded_shortest_wide_alphabet():
    # Row-compressed shortest: the internal AC automaton's quotient DFA is
    # packable, so the sharded path still rides the candidates engine.
    kws = [chr(c) for c in range(0x1000, 0x1000 + 40000)]
    text = ("x" + chr(0x1001) * 5 + "y") * 100
    m = ShortestMatchSet(kws)
    assert m.compiled.is_row_compressed
    sc = ShardedScanner(m)
    s, e, _ = sc.match_triples(text)
    got = list(zip(map(int, s), map(int, e)))
    assert got == _gold(kws, text)


def test_engine_device_large_text_auto_pick():
    # auto engine on a large text must pick the device path and agree.
    rng = np.random.default_rng(3)
    kws = ["".join(rng.choice(list("abcd"), size=int(rng.integers(2, 6))))
           for _ in range(50)]
    text = "".join(rng.choice(list("abcdx"), size=1 << 15))
    m = ShortestMatchSet(kws)
    got = m.match(text)
    assert m.last_stats.engine == "device"
    assert got == _gold(kws, text)


def test_gold_engine_never_builds_internal_ac():
    """engine='gold' (and small auto inputs) must not pay the second
    compile for the internal AC automaton."""
    m = ShortestMatchSet(["ab", "bc"], engine="gold")
    m.match("xabcx")
    assert m._ac_cache is None
    m2 = ShortestMatchSet(["ab", "bc"])  # auto
    m2.match("xabcx")  # small input -> gold path
    assert m2._ac_cache is None
