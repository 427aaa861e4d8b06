"""PFAC v2 (ranked + prefix-jump) bitplane conformance vs v1."""

import numpy as np
import pytest

import jax.numpy as jnp

from ahocorasick_tpu.core.compiler import compile_matcher
from ahocorasick_tpu.models.matchers import AhoCorasickSet, _DeviceTables
from ahocorasick_tpu.ops import scan_pfac, scan_pfac2


def bitplanes_both(keywords, text, case_sensitive=True):
    m = compile_matcher(keywords, "ac", case_sensitive)
    dev = _DeviceTables(m)
    cls = m.charmap[np.frombuffer(text.encode("utf-16-le"), dtype=np.uint16)]
    d = max(m.max_depth, 1)
    planes = (d + 31) // 32
    cls1 = scan_pfac.pad_classes(cls, d)
    v1 = np.asarray(
        scan_pfac.pfac_bitplanes(dev.trie_next, dev.is_match, jnp.asarray(cls1), d, planes)
    )
    rt = dev.ranked
    cls2 = scan_pfac2.pad_classes(cls, d)
    v2 = np.asarray(
        scan_pfac2.pfac2_bitplanes(
            rt.trie_next, rt.prefix, jnp.uint32(rt.match_threshold),
            jnp.asarray(cls2.astype(np.int32)), d, planes, rt.prefix_k, m.num_classes,
        )
    )
    n = len(cls)
    return v1[:, :n], v2[:, :n], m, dev, rt, cls


@pytest.mark.parametrize(
    "keywords,text",
    [
        (["he", "she", "his", "hers"], "ushers and heshe"),
        (["a"], "aaaa"),
        (["a", "aa", "aaa", "aaaa"], "aaaaab"),
        (["abc"], "ab"),  # keyword longer than text
        (["x"], ""),  # empty text
        (["ab", "abcdefgh", "bcd"], "xxabcdefghxx"),
    ],
)
def test_bitplanes_match_v1(keywords, text):
    v1, v2, *_ = bitplanes_both(keywords, text)
    np.testing.assert_array_equal(v1, v2)


def test_bitplanes_fuzz():
    rng = np.random.default_rng(3)
    alpha = "abcdef"
    for trial in range(15):
        kws = ["".join(rng.choice(list(alpha), size=int(rng.integers(1, 7))))
               for _ in range(int(rng.integers(1, 30)))]
        text = "".join(rng.choice(list(alpha + " "), size=int(rng.integers(0, 200))))
        v1, v2, *_ = bitplanes_both(kws, text)
        np.testing.assert_array_equal(v1, v2, err_msg=str((trial, kws)))


def test_count_matches_bitplanes():
    rng = np.random.default_rng(4)
    kws = ["ab", "ba", "aab", "b"]
    text = "".join(rng.choice(list("ab"), size=500))
    v1, v2, m, dev, rt, cls = bitplanes_both(kws, text)
    d = max(m.max_depth, 1)
    cls2 = scan_pfac2.pad_classes(cls, d)
    total = int(
        scan_pfac2.pfac2_count(
            rt.trie_next, rt.prefix, jnp.uint32(rt.match_threshold),
            jnp.asarray(cls2.astype(np.int32)), d, rt.prefix_k, m.num_classes,
        )
    )
    # popcount of v1 planes == count
    expected = int(sum(bin(int(w)).count("1") for w in v1.reshape(-1)))
    assert total == expected


def test_engine_end_to_end_unchanged():
    m = AhoCorasickSet(["he", "she", "hers"], engine="device")
    g = AhoCorasickSet(["he", "she", "hers"], engine="gold")
    text = "ushers said she hehe " * 40
    assert m.match(text) == g.match(text)


def test_ranked_permutation_properties():
    m = compile_matcher(["ab", "cd", "a"], "ac", True)
    rt = scan_pfac2.build_ranked(m)
    S = m.num_states
    n_match = int((m.own_len[: S + 1] > 0).sum())
    assert rt.match_threshold == S + 1 - n_match
    assert rt.dead_state < rt.match_threshold
    # DEAD row absorbs.
    dead_row = np.asarray(rt.trie_next)[rt.dead_state]
    assert (dead_row == rt.dead_state).all()
