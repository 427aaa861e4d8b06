"""Scan-based whole-word-longest engine (ops/scan_wwl.wwl_scan_walks).

Conformance of the one-gather-per-character WWL walk engine against the
gold loop (``WholeWordLongestMatchSet.java:47-178`` semantics), across
dense / row-compressed (quotient) layouts, the row/flat table layouts, the
Java trim-quirk all-separator keywords, and applicability gating for
mixed-wordness keywords.
"""

import random

import numpy as np
import pytest

from ahocorasick_tpu.core import gold
from ahocorasick_tpu.models.matchers import (
    WholeWordLongestMatchMap,
    WholeWordLongestMatchSet,
)
from ahocorasick_tpu.ops import scan_wwl
from ahocorasick_tpu.utils import chartables


def _collect(m, text):
    out = []
    m.match(text, lambda t, s, e, *v: (out.append((s, e)), True)[1])
    return out


def _gold_pairs(m, text):
    return [(a, b) for a, b, _ in gold.gold_whole_word_longest(m.compiled, text)]


def test_applicability_gates():
    pure = WholeWordLongestMatchSet(["abc", "de"])
    assert scan_wwl.scan_applicable(pure.compiled)
    # Java WordCharacters.trim quirk: all-separator keywords survive and are
    # word-uniform, so the scan engine still applies.
    quirk = WholeWordLongestMatchSet([" ", "!!", "abc"])
    assert scan_wwl.scan_applicable(quirk.compiled)
    # Keywords mixing word and separator chars break the depth argument.
    mixed = WholeWordLongestMatchSet(["new york", "boston"])
    assert not scan_wwl.scan_applicable(mixed.compiled)
    # Other kinds never apply.
    from ahocorasick_tpu.models.matchers import AhoCorasickSet

    assert not scan_wwl.scan_applicable(AhoCorasickSet(["abc"]).compiled)
    # Pre-round-4 artifacts carry no goto-closure DFA: falls back.
    import dataclasses

    legacy = dataclasses.replace(pure.compiled, dfa_next=None, fail=None)
    assert not scan_wwl.scan_applicable(legacy)


def test_scan_engine_dense_fuzz():
    for trial in range(150):
        rng = random.Random(trial)
        kws = list({
            "".join(rng.choice("abcehlprsx") for _ in range(rng.randint(1, 6)))
            for _ in range(rng.randint(1, 12))
        })
        m = WholeWordLongestMatchSet(kws, engine="device")
        assert scan_wwl.scan_applicable(m.compiled)
        t = "".join(rng.choice("abche lprs,;x") for _ in range(rng.randint(0, 200)))
        assert _collect(m, t) == _gold_pairs(m, t), (trial, kws, t)


def test_scan_engine_separator_quirk_fuzz():
    pool = ["a", "b", "ab", "ba", "aab", " ", ",,", "!", "!!", "bab", "aa"]
    for trial in range(150):
        rng = random.Random(1000 + trial)
        kws = list({rng.choice(pool) for _ in range(rng.randint(1, 8))})
        m = WholeWordLongestMatchSet(kws, engine="device")
        assert scan_wwl.scan_applicable(m.compiled)
        t = "".join(rng.choice("ab ,!") for _ in range(rng.randint(0, 120)))
        assert _collect(m, t) == _gold_pairs(m, t), (trial, kws, t)


def test_scan_engine_quotient_fullnode():
    # Wide-alphabet row-compressed WWL: the quotient DFA path (the round-3
    # gap — row-compressed WWL had no device path at all).
    kws = [chr(c) for c in range(32, 0xD800)]
    m = WholeWordLongestMatchSet(kws, engine="device")
    assert m.compiled.is_row_compressed
    assert scan_wwl.scan_applicable(m.compiled)
    sc = scan_wwl.build_wwl_scan(m.compiled)
    assert sc.quotient and not sc.row_layout  # flat-gather quotient layout
    rng = np.random.default_rng(7)
    t = "".join(chr(int(x)) for x in rng.integers(32, 0xD800, size=20000))
    s, e, v = m._device_triples(m._classes(t))
    assert list(zip(s.tolist(), e.tolist())) == _gold_pairs(m, t)


def test_scan_engine_quotient_multichar():
    # Row-compressed with multi-char keywords (forced via the Thresholder
    # SPI, the reference's node-storage policy hook).
    class _NeverDense:
        def is_over_threshold(self, size, lo, hi):
            return False

    kws = [chr(c) + chr(c + 1) for c in range(0x3000, 0xA000, 3)]
    m = WholeWordLongestMatchSet(kws, thresholder=_NeverDense())
    assert m.compiled.is_row_compressed
    assert scan_wwl.scan_applicable(m.compiled)
    rng = np.random.default_rng(11)
    t = "".join(chr(int(x)) for x in rng.integers(0x3000, 0xA000, size=8000))
    s, e, v = m._device_triples(m._classes(t))
    assert list(zip(s.tolist(), e.tolist())) == _gold_pairs(m, t)


def test_scan_engine_flat_layout(monkeypatch):
    # Force the flat-gather (non-row) table layout on a dense dictionary.
    monkeypatch.setattr(scan_wwl, "_ROW_MAX_BYTES", 0)
    rng = random.Random(5)
    kws = list({
        "".join(rng.choice("abcdefgh") for _ in range(rng.randint(1, 7)))
        for _ in range(200)
    })
    m = WholeWordLongestMatchSet(kws, engine="device")
    sc = scan_wwl.build_wwl_scan(m.compiled)
    assert not sc.row_layout
    # bypass the matcher's cached dev tables so the patched layout is used
    m.dev._cache.pop("wwl_scan", None)
    t = "".join(rng.choice("abcdefgh ,.") for _ in range(3000))
    assert _collect(m, t) == _gold_pairs(m, t)


def test_scan_engine_map_values_and_folding():
    m = WholeWordLongestMatchMap(
        ["Hello", "WORLD", "hell"], ["a", "b", "c"],
        case_sensitive=False, engine="device",
    )
    assert scan_wwl.scan_applicable(m.compiled)
    txt = "hello world HELL hello;hell"
    got = []
    m.match(txt, lambda t, s, e, v: (got.append((s, e, v)), True)[1])
    exp = [
        (a, b, m.compiled.values[c])
        for a, b, c in gold.gold_whole_word_longest(m.compiled, txt)
    ]
    assert got == exp


def test_scan_engine_custom_word_chars():
    wc = chartables.default_word_chars().copy()
    wc[ord("'")] = True
    m = WholeWordLongestMatchSet(
        ["can't", "naive", "übermäßig"], word_chars=wc, engine="device")
    assert scan_wwl.scan_applicable(m.compiled)
    txt = " can't naive übermäßig can'tx naive's"
    assert _collect(m, txt) == _gold_pairs(m, txt)


def test_word_uniform_trie_cases():
    assert scan_wwl.word_uniform_trie(
        WholeWordLongestMatchSet(["ab", "cd", " ", "!!"]).compiled)
    assert not scan_wwl.word_uniform_trie(
        WholeWordLongestMatchSet(["a b"]).compiled)
    # Mixed all-separator-then-word interior shape: "!a" trims to "a" (pure);
    # "a!a" keeps an interior separator (impure).
    assert scan_wwl.word_uniform_trie(
        WholeWordLongestMatchSet(["!a"]).compiled)
    assert not scan_wwl.word_uniform_trie(
        WholeWordLongestMatchSet(["a!a"]).compiled)


def test_scan_engine_non_bmp_units():
    """Non-BMP chars are matched per UTF-16 unit (Java parity): the scan
    engine's depth plane counts units, and surrogate wordness follows the
    word table exactly like the gold walk."""
    kws = ["\U0001F600ab", "ab", "\U0001D400"]  # emoji+letters, math bold A
    m = WholeWordLongestMatchSet(kws)
    for t in ["\U0001F600ab ab \U0001D400", "x\U0001F600ab", "\U0001D400\U0001D400",
              " \U0001F600ab!"]:
        got = _collect(m, t)
        assert got == _gold_pairs(m, t), t
