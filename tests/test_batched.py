"""Batched-halo DFA engine (v4) conformance: exact vs gold, any chunking."""

import numpy as np
import pytest

import jax.numpy as jnp

from ahocorasick_tpu.core.compiler import compile_matcher
from ahocorasick_tpu.models.matchers import (
    AhoCorasickSet,
    LongestMatchMap,
    _DeviceTables,
)
from ahocorasick_tpu.ops import scan_batched


def batched_triples(keywords, text, chunk, case_sensitive=True, kind="ac"):
    m = compile_matcher(keywords, kind, case_sensitive)
    dev = _DeviceTables(m)
    cls = m.charmap[np.frombuffer(text.encode("utf-16-le"), dtype=np.uint16)]
    pd = dev.packed_dfa
    assert pd.emit_mask is None, "test dictionaries must fit packed mode"
    d = max(m.max_depth, 1)
    windows = scan_batched.chunk_classes(cls, chunk, pd.halo)
    bits = scan_batched.batched_emit_planes(
        pd.table, jnp.asarray(windows), pd.halo, pd.state_bits, (d + 31) // 32
    )
    return scan_batched.ac_matches_batched(m, cls, np.asarray(bits)), m, cls, pd


@pytest.mark.parametrize("chunk", [1, 2, 7, 64, 512])
def test_exact_vs_gold(chunk):
    from ahocorasick_tpu.core import gold

    keywords = ["he", "she", "his", "hers", "ushers"]
    text = "ushers said heshe hishers " * 5
    (s, e, v), m, cls, pd = batched_triples(keywords, text, chunk)
    expected = gold.gold_match(m, text)
    assert list(zip(s.tolist(), e.tolist())) == [(a, b) for a, b, _ in expected]


def test_boundary_full_length_keyword():
    """A longest-keyword match ending exactly at a chunk boundary requires
    the full-d halo (regression for the d-1 off-by-one)."""
    kw = "abcdefgh"  # d = 8
    text = "x" * 504 + kw  # match occupies positions 504..512 spanning chunks
    (s, e, v), *_ = batched_triples([kw], text, 512)
    assert list(zip(s.tolist(), e.tolist())) == [(504, 512)]
    # and ending exactly ON the boundary
    text2 = "x" * (512 - 8) + kw + "y" * 100
    (s2, e2, _), *_ = batched_triples([kw], text2, 512)
    assert list(zip(s2.tolist(), e2.tolist())) == [(504, 512)]


def test_overlap_suffix_chain():
    (trip, m, cls, pd) = batched_triples(["a", "aa", "aaa"], "aaaa", 2)
    s, e, v = trip
    got = list(zip(s.tolist(), e.tolist()))
    from ahocorasick_tpu.core import gold

    assert got == [(a, b) for a, b, _ in gold.gold_match(m, "aaaa")]


def test_count_kernel():
    keywords = ["ab", "b", "aab"]
    rng = np.random.default_rng(5)
    text = "".join(rng.choice(list("ab "), size=3000))
    m = compile_matcher(keywords, "ac", True)
    dev = _DeviceTables(m)
    cls = m.charmap[np.frombuffer(text.encode("utf-16-le"), dtype=np.uint16)]
    pd = dev.packed_dfa
    windows = scan_batched.chunk_classes(cls, 128, pd.halo)
    total = int(scan_batched.batched_count(pd.table, jnp.asarray(windows),
                                           pd.halo, pd.state_bits))
    from ahocorasick_tpu.core import gold

    assert total == len(gold.gold_match(m, text))


def test_engine_fuzz_vs_gold():
    rng = np.random.default_rng(9)
    for trial in range(10):
        kws = ["".join(rng.choice(list("abcd"), size=int(rng.integers(1, 7))))
               for _ in range(int(rng.integers(1, 25)))]
        text = "".join(rng.choice(list("abcd "), size=int(rng.integers(0, 600))))
        dev_m = AhoCorasickSet(kws, engine="device")
        gold_m = AhoCorasickSet(kws, engine="gold")
        assert dev_m.match(text) == gold_m.match(text), (trial, kws)


def test_longest_map_through_engine():
    m = LongestMatchMap(["he", "hers", "herself"], [1, 2, 3], engine="device")
    g = LongestMatchMap(["he", "hers", "herself"], [1, 2, 3], engine="gold")
    text = "xx herself hers he " * 30
    assert m.match(text) == g.match(text)


def test_stride2_engine_matches_gold():
    from ahocorasick_tpu.models.matchers import AhoCorasickSet as ACS

    rng = np.random.default_rng(13)
    for trial in range(8):
        kws = ["".join(rng.choice(list("abcd"), size=int(rng.integers(1, 8))))
               for _ in range(int(rng.integers(1, 20)))]
        text = "".join(rng.choice(list("abcd "), size=int(rng.integers(0, 700))))
        m = ACS(kws, engine="device")
        m.device_engine = "batched2"
        g = ACS(kws, engine="gold")
        assert m.match(text) == g.match(text), (trial, kws)


def test_stride2_odd_halo_and_boundary():
    from ahocorasick_tpu.models.matchers import AhoCorasickSet as ACS

    kw = "abcdefg"  # d = 7 (odd -> halo rounds to 8)
    m = ACS([kw], engine="device")
    m.device_engine = "batched2"
    text = "x" * 509 + kw + "z" * 30  # straddles the 512 chunk boundary
    assert m.match(text) == [(509, 516)]


def test_stride2_fits_gate():
    from ahocorasick_tpu.core.compiler import compile_matcher
    from ahocorasick_tpu.ops import scan_batched2

    m = compile_matcher(["ab"], "ac", True)
    assert scan_batched2.fits(m)
    assert not scan_batched2.fits(m, max_bytes=10)


def test_whole_word_batched_vs_gold_fuzz():
    from ahocorasick_tpu.models.matchers import WholeWordMatchMap

    rng = np.random.default_rng(21)
    for trial in range(8):
        kws = list({
            "".join(rng.choice(list("abcd"), size=int(rng.integers(1, 7))))
            for _ in range(int(rng.integers(1, 15)))
        })
        vals = list(range(len(kws)))
        text = "".join(rng.choice(list("abcd -_"), size=int(rng.integers(0, 500))))
        dev = WholeWordMatchMap(kws, vals, engine="device")
        gld = WholeWordMatchMap(kws, vals, engine="gold")
        assert dev.match(text) == gld.match(text), (trial, kws)


def test_count_packed_matches_gold_on_long_keywords():
    """Count-packed layout (state + emit COUNT in one entry): exact counts
    for dictionaries whose packed-inline layout overflows (long keywords)."""
    import numpy as np

    from ahocorasick_tpu.models.matchers import AhoCorasickSet
    from ahocorasick_tpu.ops import scan_batched

    rng = np.random.default_rng(20260820)
    # Long keywords force state_bits + max_depth > 32 (the split regime).
    kws = ["".join(rng.choice(list("ab"), size=int(rng.integers(30, 45))))
           for _ in range(12)] + ["ab", "ba", "aab"]
    m = AhoCorasickSet(kws)
    assert not scan_batched.inline_packable(m.compiled)
    assert scan_batched.count_packable(m.compiled)

    text = "".join(rng.choice(list("ab"), size=5000))
    # Plant some long keywords verbatim so deep emit counts are exercised.
    text = text[:100] + kws[0] + text[100:800] + kws[1] + kws[0] + text[800:]

    flat, state_bits, halo = m.dev.count_packed_dfa
    cls = m._classes(text)
    windows = scan_batched.chunk_classes(cls, 512, halo)
    import jax.numpy as jnp

    got = int(scan_batched.packedcount_count(
        flat, jnp.asarray(windows), halo, state_bits, m.compiled.num_classes))
    want = AhoCorasickSet(kws, engine="gold").count(text)
    assert got == want and got > 0


def test_count_packed_sharded_counter():
    import jax
    import numpy as np

    from ahocorasick_tpu.models.matchers import AhoCorasickSet
    from ahocorasick_tpu.parallel import sharding

    rng = np.random.default_rng(7)
    kws = ["".join(rng.choice(list("abc"), size=int(rng.integers(33, 40))))
           for _ in range(8)] + ["abc", "ca"]
    m = AhoCorasickSet(kws)
    text = "".join(rng.choice(list("abc"), size=4000)) + kws[0] + kws[-1]
    mesh = sharding.data_mesh(jax.devices())
    prepare, count, engine = sharding.make_sharded_counter(m, mesh)
    assert engine == "packedcount"
    got = int(count(prepare(m._classes(text))))
    assert got == AhoCorasickSet(kws, engine="gold").count(text)


def test_sparse_plane_compaction_matches_dense():
    """Device-side hot-position compaction: sparse download path produces
    identical triples to the dense path for AC, longest, and shortest."""
    import numpy as np

    from ahocorasick_tpu.models import matchers
    from ahocorasick_tpu.ops import scan_batched

    rng = np.random.default_rng(20260821)
    kws = ["he", "she", "hers", "aba", "bab"]
    text = "".join(rng.choice(list("herab sx"), size=70000))
    old = scan_batched._SPARSE_MIN_UNITS
    old_cpu = scan_batched._SPARSE_ON_CPU
    scan_batched._SPARSE_ON_CPU = True
    try:
        for kind, cls_m in [("ac", matchers.AhoCorasickSet),
                            ("longest", matchers.LongestMatchSet),
                            ("shortest", matchers.ShortestMatchSet)]:
            m = cls_m(kws, engine="device")
            scan_batched._SPARSE_MIN_UNITS = 1 << 62  # dense path
            dense = m.match(text)
            scan_batched._SPARSE_MIN_UNITS = 1  # sparse path
            sparse = m.match(text)
            assert sparse == dense, kind
            assert len(dense) > 0
    finally:
        scan_batched._SPARSE_MIN_UNITS = old
        scan_batched._SPARSE_ON_CPU = old_cpu


def test_sparse_compaction_overflow_capacity_growth():
    """First-guess capacity overflow grows the bucket and stays exact."""
    import numpy as np

    from ahocorasick_tpu.models import matchers
    from ahocorasick_tpu.ops import scan_batched

    # Every position matches ('a' dictionary over 'aaaa' text) but density
    # <= n/4 fails -> planes_to_sparse returns None (dense fallback).  Mix:
    # a text where ~10% of positions are hot but the initial n//16 guess
    # overflows.
    rng = np.random.default_rng(3)
    parts = []
    for _ in range(7000):
        parts.append("ab" if rng.random() < 0.1 else "xy")
    text = "".join(parts)
    m = matchers.AhoCorasickSet(["ab"], engine="device")
    old = scan_batched._SPARSE_MIN_UNITS
    old_cpu = scan_batched._SPARSE_ON_CPU
    try:
        scan_batched._SPARSE_MIN_UNITS = 1
        scan_batched._SPARSE_ON_CPU = True
        got = m.count(text)
    finally:
        scan_batched._SPARSE_MIN_UNITS = old
        scan_batched._SPARSE_ON_CPU = old_cpu
    assert got == text.count("ab")
