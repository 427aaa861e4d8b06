"""Chunk stitching (sigma composition) must equal the sequential scan."""

import random

import numpy as np
import pytest

import ahocorasick_tpu as act
from ahocorasick_tpu.ops import scan_dfa, stitch


def _setup(kws, text, kind_cls, shortest=False):
    m = kind_cls(kws, True, engine="device")
    cls = m.compiled.charmap[act.chartables.to_utf16_units(text)]
    table = m.dev.dfa_next_shortest if shortest else m.dev.dfa_next
    return m, cls.astype(np.int32), table


@pytest.mark.parametrize("chunk", [1, 3, 8, 64])
def test_stitched_equals_sequential_ac(chunk):
    rng = random.Random(3)
    kws = ["ab", "abc", "bca", "c", "ca"]
    text = "".join(rng.choice("abc") for _ in range(256))
    m, cls, table = _setup(kws, text, act.AhoCorasickSet)
    n = len(cls)
    pad = (-n) % chunk
    cls_p = np.pad(cls, (0, pad))
    chunks = cls_p.reshape(-1, chunk)
    got = np.asarray(stitch.stitched_scan(table, chunks)).reshape(-1)[:n]
    want = np.asarray(scan_dfa.dfa_states(table, cls))
    assert np.array_equal(got, want)


@pytest.mark.parametrize("chunk", [4, 32])
def test_stitched_equals_sequential_shortest(chunk):
    rng = random.Random(4)
    kws = ["aaa", "ab", "bc"]
    text = "".join(rng.choice("abc") for _ in range(128))
    m, cls, table = _setup(kws, text, act.ShortestMatchSet, shortest=True)
    n = len(cls)
    pad = (-n) % chunk
    cls_p = np.pad(cls, (0, pad))
    chunks = cls_p.reshape(-1, chunk)
    got = np.asarray(stitch.stitched_scan(table, chunks)).reshape(-1)[:n]
    want = np.asarray(scan_dfa.shortest_states(m.dev.dfa_next, m.dev.match_len, cls))
    assert np.array_equal(got, want)


def test_entry_states_composition():
    # Hand-checkable: identity maps compose to identity entries.
    sigma = np.tile(np.arange(5, dtype=np.int32), (4, 1))
    entries = np.asarray(stitch.entry_states(sigma))
    assert np.array_equal(entries, np.zeros(4, dtype=np.int32))
