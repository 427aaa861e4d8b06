"""Split-gather engine for dictionaries whose packed layout overflows
(state_bits + max_depth > 32): multi-plane emit, long keywords.

Reference analog: ``testLongKeywords`` (SetTest.java:102-108) builds 100
repeated-'a' keywords up to length 100 — max_depth 100 forces 4 emit planes.
"""

import numpy as np

import jax.numpy as jnp

from ahocorasick_tpu.core.compiler import compile_matcher
from ahocorasick_tpu.models.matchers import AhoCorasickSet, _DeviceTables
from ahocorasick_tpu.ops import scan_batched, scan_rowdfa


def split_triples(keywords, text, chunk):
    m = compile_matcher(keywords, "ac", True)
    dev = _DeviceTables(m)
    state_bits = max(int(m.num_states - 1).bit_length(), 1)
    assert state_bits + m.max_depth > 32, "not a split-path dictionary"
    cls = m.charmap[np.frombuffer(text.encode("utf-16-le"), dtype=np.uint16)]
    dfa_flat, emit_tab, halo = dev.split_dfa
    planes = (m.max_depth + 31) // 32
    windows = scan_batched.chunk_classes(cls, chunk, halo)
    bits = scan_batched.split_emit_planes(
        dfa_flat, emit_tab, jnp.asarray(windows), halo, m.num_classes, planes
    )
    return scan_batched.ac_matches_batched(m, cls, np.asarray(bits)), m, (
        dfa_flat, emit_tab, halo, planes, cls)


def test_long_keywords_multi_plane():
    from ahocorasick_tpu.core import gold

    # 'a', 'aa', ..., 'a'*100 — the reference's testLongKeywords shape
    keywords = ["a" * i for i in range(1, 101)]
    text = "a" * 300 + "b" + "a" * 150
    (s, e, _), m, _ = split_triples(keywords, text, 512)
    expected = gold.gold_match(m, text)
    assert list(zip(s.tolist(), e.tolist())) == [(a, b) for a, b, _ in expected]


def test_split_count_kernel():
    from ahocorasick_tpu.core import gold

    keywords = ["a" * i for i in range(1, 101)]
    text = "aab" * 200 + "a" * 120
    (_, _, _), m, (dfa_flat, emit_tab, halo, planes, cls) = split_triples(
        keywords, text, 128)
    windows = scan_batched.chunk_classes(cls, 128, halo)
    total = int(scan_batched.split_count(
        dfa_flat, emit_tab, jnp.asarray(windows), halo, m.num_classes, planes))
    assert total == len(gold.gold_match(m, text))


def test_split_facade_vs_gold_fuzz():
    rng = np.random.default_rng(41)
    # long-ish keywords over a tiny alphabet force deep states
    kws = list({
        "".join(rng.choice(list("ab"), size=int(rng.integers(25, 40))))
        for _ in range(30)
    }) + ["a" * 35, "b" * 33, "ab" * 17]
    m = compile_matcher(kws, "ac", True)
    assert scan_rowdfa.pick_engine(m) == "batched"
    dev_m = AhoCorasickSet(kws, engine="device")
    gold_m = AhoCorasickSet(kws, engine="gold")
    for trial in range(4):
        text = "".join(rng.choice(list("ab "), size=int(rng.integers(50, 1500))))
        text += "a" * 35 + " " + "ab" * 17
        assert dev_m.match(text) == gold_m.match(text), trial


def test_packed_inline_unaffected():
    """Dictionaries that fit inline still produce identical output."""
    dev_m = AhoCorasickSet(["he", "she", "hers"], engine="device")
    gold_m = AhoCorasickSet(["he", "she", "hers"], engine="gold")
    t = "ushers she he"
    assert dev_m.match(t) == gold_m.match(t)
