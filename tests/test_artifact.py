"""Artifact save/load + resumable stream cursors (SURVEY.md §5 checkpointing)."""

import io
import os

import numpy as np
import pytest

from ahocorasick_tpu import load_matcher
from ahocorasick_tpu.core import artifact
from ahocorasick_tpu.models.matchers import (
    AhoCorasickMap,
    AhoCorasickSet,
    LongestMatchMap,
    LongestMatchSet,
    ShortestMatchSet,
    WholeWordLongestMatchSet,
    WholeWordMatchMap,
)

ALL = [
    (AhoCorasickSet, ["he", "she", "hers"], None),
    (AhoCorasickMap, ["he", "she"], ["H", "S"]),
    (LongestMatchSet, ["he", "hers", "herself"], None),
    (ShortestMatchSet, ["she", "he"], None),
    (WholeWordMatchMap, ["stand", "up"], [1, 2]),
    (WholeWordLongestMatchSet, ["as if", "as"], None),
]

TEXT = "she said he stands as if hers herself stand up as"


@pytest.mark.parametrize("cls,kws,vals", ALL)
def test_roundtrip(tmp_path, cls, kws, vals):
    m = cls(kws, values=vals) if vals else cls(kws)
    path = tmp_path / "m.npz"
    m.save(path)
    m2 = load_matcher(path)
    assert type(m2) is cls
    assert m2.match(TEXT) == m.match(TEXT)


def test_roundtrip_bytes():
    m = AhoCorasickSet(["ab", "abc"])
    data = artifact.save_bytes(m.compiled)
    c2 = artifact.load_bytes(data)
    m2 = AhoCorasickSet.from_compiled(c2)
    assert m2.match("xabcx") == m.match("xabcx")


class Payload:
    def __init__(self, x):
        self.x = x

    def __eq__(self, other):
        return self.x == other.x


def test_non_json_values_need_pickle_optin(tmp_path):
    m = AhoCorasickMap(["he"], [Payload(7)])
    path = tmp_path / "m.npz"
    m.save(path)
    with pytest.raises(ValueError, match="allow_pickle"):
        load_matcher(path)
    m2 = load_matcher(path, allow_pickle=True)
    assert m2.match("he") == [(0, 2, Payload(7))]


def test_from_compiled_kind_mismatch():
    m = AhoCorasickSet(["he"])
    with pytest.raises(ValueError, match="kind"):
        LongestMatchSet.from_compiled(m.compiled)


@pytest.mark.parametrize("cls,kws,vals", ALL)
def test_resumable_cursor(cls, kws, vals):
    """Splitting a stream across two scanner instances (with state persisted
    between them) equals one continuous scan."""
    m = cls(kws, values=vals) if vals else cls(kws)
    text = TEXT + " " + TEXT
    cut = len(text) // 2

    one = m.stream(chunk_units=8)
    expected = []
    for i in range(0, len(text), 8):
        expected += one.feed(text[i : i + 8], is_final=i + 8 >= len(text))

    s1 = m.stream()
    got = s1.feed(text[:cut], is_final=False)
    state = s1.state_dict()

    s2 = m.stream()  # fresh scanner, e.g. a new process
    s2.load_state_dict(state)
    got += s2.feed(text[cut:], is_final=True)
    assert got == expected


def test_state_dict_is_json_safe():
    import json

    m = LongestMatchMap(["he", "hers"], [1, 2])
    s = m.stream()
    s.feed("xxhe", is_final=False)
    d = json.loads(json.dumps(s.state_dict()))
    s2 = m.stream()
    s2.load_state_dict(d)
    assert s2.feed("rsx", is_final=True) == [(2, 6, 2)]  # "hers" -> value 2


def test_row_compressed_shortest_artifact_rejects_device():
    # A row-compressed SHORTEST artifact has no keyword source to rebuild
    # the internal AC automaton, so engine='device' must fail loudly
    # instead of silently running the host path.
    from ahocorasick_tpu.models.matchers import ShortestMatchSet
    from ahocorasick_tpu.utils.thresholds import Thresholder

    class _AlwaysSparse(Thresholder):
        def is_over_threshold(self, node_size, node_level, key_interval_size):
            return False

    m = ShortestMatchSet(["ab", "cd"], thresholder=_AlwaysSparse())
    assert m.compiled.is_row_compressed
    with pytest.raises(ValueError, match="no device path"):
        ShortestMatchSet.from_compiled(m.compiled, engine="device")
    # auto still works (host cursor path), and semantics are unchanged.
    m2 = ShortestMatchSet.from_compiled(m.compiled)
    assert m2.match("zabcd") == [(1, 3), (3, 5)]


def test_values_json_fidelity_tuples_take_pickle_path():
    """Tuples/non-string dict keys are json.dumps-able but not JSON-
    faithful; such values must take the (load-gated) pickle path instead
    of being silently mutated to lists/string keys."""
    import pytest

    from ahocorasick_tpu.core import artifact
    from ahocorasick_tpu.models.matchers import AhoCorasickMap

    m = AhoCorasickMap(["x"], [(1, 2)])
    blob = artifact.save_bytes(m.compiled)
    with pytest.raises(ValueError):
        artifact.load_bytes(blob)  # pickle gate
    loaded = artifact.load_bytes(blob, allow_pickle=True)
    assert loaded.values == [(1, 2)]  # tuple preserved


def test_save_load_extensionless_path(tmp_path):
    from ahocorasick_tpu.core import artifact
    from ahocorasick_tpu.models.matchers import AhoCorasickSet

    m = AhoCorasickSet(["he", "she"])
    p = str(tmp_path / "art")  # np.savez would append .npz
    artifact.save(m.compiled, p)
    loaded = artifact.load(p)
    assert loaded.num_states == m.compiled.num_states


def test_resumed_cursor_empty_source_finalizes():
    """A resumed cursor scanning an exhausted source must still run the
    end-of-input feed (pending longest queue / final word drain)."""
    import io

    from ahocorasick_tpu.core.stream import StreamScanner
    from ahocorasick_tpu.models.matchers import LongestMatchSet

    m = LongestMatchSet(["a", "ab"])
    s1 = m.stream()
    assert s1.feed("a", is_final=False) == []  # still displaceable
    d = s1.state_dict()
    ss = StreamScanner(m.compiled)
    ss.load_state_dict(d)
    assert list(ss.scan(io.StringIO(""))) == [(0, 1, -1)]


def test_cand_resume_point_into_artifact_matcher():
    """A resume point saved by a keyword-constructed (CAND-mode) shortest
    cursor loads into a from_compiled matcher (no AC source): the SEQ
    state is reconstructed from (tail, p) exactly."""
    import json

    from ahocorasick_tpu.models.matchers import ShortestMatchSet

    m = ShortestMatchSet(["abc"], engine="device")
    s1 = m.stream()
    s1.feed("xxab", is_final=False)
    d = json.loads(json.dumps(s1.state_dict()))
    assert "tail" in d and "state" not in d  # CAND format
    m2 = ShortestMatchSet.from_compiled(m.compiled)
    s2 = m2.stream()
    s2.load_state_dict(d)
    assert s2.feed("cyy", is_final=True) == [(2, 5)]


def test_shortest_artifact_bundles_internal_ac(tmp_path):
    """ShortestMatch save/load round-trips the internal AC automaton inside
    the ONE npz (round-4 format), so loaded matchers keep the fast
    candidates-then-resolve device path — previously a <path>.ac sidecar
    file, which silently broke BytesIO/stream saves."""
    from ahocorasick_tpu import load_matcher
    from ahocorasick_tpu.models.matchers import ShortestMatchMap

    kws = ["she", "he", "hers", "abab"]
    m = ShortestMatchMap(kws, ["S", "H", "R", "A"])
    text = "ushers abab hers she " * 200
    want = m.match(text)

    p = str(tmp_path / "shortest.npz")
    m.save(p)
    import os

    assert not os.path.exists(p + ".ac")  # one file, no sidecar

    m2 = load_matcher(p, engine="device")
    assert m2._ac is not None
    assert m2.match(text) == want
    assert m2._pick_engine(len(text)) == "device"
    # Streams get the candidates path too (the supplier resolves the
    # bundled cache).
    import io

    assert m2.match_stream(io.StringIO(text), chunk_units=997) == want

    # A matcher saved from a bundle-less compiled artifact still loads on
    # the sequential path.
    from ahocorasick_tpu.core import artifact

    artifact.save(m.compiled, p)
    m3 = load_matcher(p)
    assert m3._ac is None
    assert m3.match(text) == want


def test_shortest_artifact_bytesio_roundtrip_keeps_device_path():
    """BytesIO save/load keeps the device path (round-4: the internal AC
    rides the main npz, so file-like targets lose nothing)."""
    import io

    from ahocorasick_tpu import load_matcher
    from ahocorasick_tpu.models.matchers import ShortestMatchSet

    m = ShortestMatchSet(["she", "he", "hers", "abab"])
    text = "ushers abab hers she " * 200
    want = m.match(text)

    buf = io.BytesIO()
    m.save(buf)
    buf.seek(0)
    m2 = load_matcher(buf, engine="device")
    assert m2._ac is not None
    assert m2.match(text) == want
    assert m2._pick_engine(len(text)) == "device"


def test_shortest_artifact_legacy_sidecar_still_loads(tmp_path):
    """Pre-round-4 artifacts (<path>.ac sidecar file) keep loading, incl.
    via a BYTES filesystem path (os.fsdecode, not str(), builds the name)."""
    from ahocorasick_tpu import load_matcher
    from ahocorasick_tpu.core import artifact
    from ahocorasick_tpu.models.matchers import ShortestMatchSet

    m = ShortestMatchSet(["she", "he", "hers", "abab"])
    text = "ushers abab hers she " * 200
    want = m.match(text)

    p = str(tmp_path / "legacy.npz")
    artifact.save(m.compiled, p)          # legacy: no bundle
    artifact.save(m._ac.compiled, p + ".ac")  # legacy sidecar file

    for target in (p, os.fsencode(p)):
        m2 = load_matcher(target, engine="device")
        assert m2._ac is not None
        assert m2.match(text) == want


def test_mixed_wwl_artifact_keeps_device_scan(tmp_path):
    """A separator-spanning WWL artifact (compiled WITHOUT a goto closure)
    reloads onto the round-5 truncated-closure device engine: the closure
    rebuilds lazily from the persisted trie tables, so saved mixed
    dictionaries scan on device like fresh ones."""
    import random

    from ahocorasick_tpu.core import gold
    from ahocorasick_tpu.models.matchers import (
        WholeWordLongestMatchSet, load_matcher,
    )
    from ahocorasick_tpu.ops import scan_wwl

    m = WholeWordLongestMatchSet(["new york", "new", "a b", "ab"],
                                 case_sensitive=False)
    assert m.compiled.dfa_next is None  # mixed: no compiled closure
    p = tmp_path / "mixed.npz"
    m.save(p)
    m2 = load_matcher(p, engine="device")
    assert scan_wwl.mixed_scan_applicable(m2.compiled)
    rng = random.Random(77)
    t = "".join(rng.choice(["new", "york", " ", "a", "b ", "!x"])
                for _ in range(1500))
    got = m2.match(t)
    want = [(a, b) for a, b, _ in
            gold.gold_whole_word_longest(m2.compiled, t)]
    assert got == want
    assert m2.last_stats.engine == "device"
