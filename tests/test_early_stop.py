"""Early-stop listener semantics: a False return stops the scan AND the work.

The reference breaks its scan loop on a False listener return
(``AhoCorasickSet.java:223-225``, README.md:70).  Long listener-mode scans
here chunk through the stream cursor, so a False on an early match leaves
the rest of the haystack unscanned (``_Matcher._match_chunked``); delivery
order is identical to the full-scan path.
"""

import numpy as np

from ahocorasick_tpu.models.matchers import (
    AhoCorasickMap,
    AhoCorasickSet,
    LongestMatchSet,
    ShortestMatchSet,
)


def test_early_stop_scans_only_a_prefix():
    m = AhoCorasickSet(["needle"], engine="device")
    m._LISTENER_CHUNK = 4096
    text = "needle" + "x" * 65536
    calls = []

    def listener(t, s, e):
        calls.append((s, e))
        return False

    assert m.match(text, listener) is None
    assert calls == [(0, 6)]
    # Only the first chunk (plus nothing else) was scanned.
    assert m.last_stats.units <= 8192, m.last_stats.units


def _soup(rng, n):
    alpha = "abchers xyif"
    return "".join(rng.choice(list(alpha), size=n))


def test_chunked_listener_order_equals_full_scan():
    rng = np.random.default_rng(7)
    text = _soup(rng, 6000)
    kws = ["he", "she", "hers", "ab", "ch", "if", "x"]
    for cls in (AhoCorasickSet, LongestMatchSet, ShortestMatchSet):
        m = cls(kws, engine="device")
        expected = m.match(text)
        m._LISTENER_CHUNK = 1024  # force the chunked listener path
        got = []
        m.match(text, lambda t, s, e: got.append((s, e)) or True)
        assert got == expected, cls.__name__


def test_chunked_listener_map_values_and_stop_mid_stream():
    rng = np.random.default_rng(8)
    text = _soup(rng, 6000)
    kws = ["he", "she", "hers", "ab"]
    m = AhoCorasickMap(kws, ["H", "S", "R", "A"])
    full = m.match(text)
    stop_at = len(full) // 2
    m._LISTENER_CHUNK = 512
    m.engine = "device"
    got = []

    def listener(t, s, e, v):
        got.append((s, e, v))
        return len(got) < stop_at

    m.match(text, listener)
    assert got == full[:stop_at]


def test_chunked_listener_whole_word_kinds():
    """Whole-word kinds now chunk listener delivery too (their stream
    cursors are device-backed); order equals the full-scan path and an
    early False stops the scan."""
    from ahocorasick_tpu.models.matchers import (
        WholeWordLongestMatchSet,
        WholeWordMatchSet,
    )

    rng = np.random.default_rng(12)
    words = []
    for _ in range(800):
        words.append("".join(rng.choice(list("abchers"), size=int(rng.integers(2, 6)))))
    text = " ".join(words)
    for cls in (WholeWordMatchSet, WholeWordLongestMatchSet):
        m = cls(["he", "she", "hers", "ab", "ch"], engine="device")
        expected = m.match(text)
        m._LISTENER_CHUNK = 512
        got = []
        m.match(text, lambda t, s, e: got.append((s, e)) or True)
        assert got == expected, cls.__name__
        # Early stop scans only a prefix.
        m2 = cls(["he"], engine="device")
        m2._LISTENER_CHUNK = 512
        long_text = "he " + "x" * 20000
        calls = []
        m2.match(long_text, lambda t, s, e: (calls.append((s, e)), False)[1])
        assert calls == [(0, 2)]
        assert m2.last_stats.units <= 1024, m2.last_stats.units


def test_adaptive_chunk_first_match_stop_scans_kib():
    """Round-4: with the DEFAULT chunk config, an immediate-stop listener
    scans at most _LISTENER_CHUNK_MIN units — the geometric chunk ramp
    makes first-match stops cost KiBs, not the old fixed 1 MiB."""
    from ahocorasick_tpu.models.matchers import AhoCorasickSet

    m = AhoCorasickSet(["needle"], engine="device")
    hay = "needle " + "x" * (8 << 20)
    seen = []
    m.match(hay, lambda t, s, e: (seen.append((s, e)), False)[1])
    assert seen == [(0, 6)]
    # The chunk loop slices in code points, so an all-astral first chunk
    # covers up to 2x the minimum in units — still KiBs, not the full text.
    assert m.last_stats.units <= (2 << 14), m.last_stats.units


def test_adaptive_chunk_full_scan_exact():
    """The growing-chunk schedule delivers the identical match sequence."""
    import random

    from ahocorasick_tpu.core import gold
    from ahocorasick_tpu.models.matchers import AhoCorasickSet

    rng = random.Random(13)
    m = AhoCorasickSet(["ab", "ba", "aab"], engine="device")
    text = "".join(rng.choice("ab x") for _ in range(200_000))
    got = []
    m._LISTENER_CHUNK = 1 << 14  # several ramped chunks even at this size
    m.match(text, lambda t, s, e: (got.append((s, e)), True)[1])
    assert got == [(a, b) for a, b, _ in gold.gold_ac(m.compiled, text)]


def test_listener_chunk_gate_counts_utf16_units():
    """The chunk gate measures UTF-16 units: astral code points count 2,
    so a text over the gate in units (but under it in code points) still
    takes the chunked early-stop path (review finding, round 4)."""
    from ahocorasick_tpu.models.matchers import AhoCorasickSet

    m = AhoCorasickSet(["needle"], engine="device")
    n_cp = (1 << 19) + (1 << 14)  # < 1Mi code points, > 1Mi UTF-16 units
    hay = "needle " + "\U0001F600" * n_cp
    assert m._listener_chunkable(hay)
    seen = []
    m.match(hay, lambda t, s, e: (seen.append((s, e)), False)[1])
    assert seen == [(0, 6)]
    # The chunk loop slices in code points, so an all-astral first chunk
    # covers up to 2x the minimum in units — still KiBs, not the full text.
    assert m.last_stats.units <= (2 << 14)


def test_chunked_listener_mixed_wwl():
    """Separator-spanning WWL dictionaries (round 5: mixed truncated-closure
    scan cursor) through the chunked listener path: order equals full-scan,
    early False stops after a prefix."""
    from ahocorasick_tpu.models.matchers import WholeWordLongestMatchSet

    rng = np.random.default_rng(13)
    pieces = []
    for _ in range(900):
        r = int(rng.integers(10))
        pieces.append("new york" if r < 2 else
                      "".join(rng.choice(list("newyorkab"),
                                         size=int(rng.integers(2, 6)))))
    text = " ".join(pieces)
    m = WholeWordLongestMatchSet(["new york", "new", "york", "ab"],
                                 engine="device")
    from ahocorasick_tpu.ops import scan_wwl

    assert scan_wwl.mixed_scan_applicable(m.compiled)
    expected = m.match(text)
    assert ("new york" in [text[s:e] for s, e in expected])
    m._LISTENER_CHUNK = 512
    got = []
    m.match(text, lambda t, s, e: got.append((s, e)) or True)
    assert got == expected

    m2 = WholeWordLongestMatchSet(["new york"], engine="device")
    m2._LISTENER_CHUNK = 512
    long_text = "new york " + "x" * 20000
    calls = []
    m2.match(long_text, lambda t, s, e: (calls.append((s, e)), False)[1])
    assert calls == [(0, 8)]
    assert m2.last_stats.units <= 1024, m2.last_stats.units
