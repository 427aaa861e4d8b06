"""Pin the Java-parity character tables: fixture hashes + golden samples.

The tables are committed data (``utils/data/chartables_bmp.npz``), not a
runtime function of CPython's Unicode version; the full-table SHA-256 pins
make ANY change to the 65536-entry semantics an explicit test failure, and
the regeneration check keeps the fixture and its generator in lockstep
(SURVEY.md §7 hard-part 3: tables as fixture data, not approximation).
"""

import hashlib

import numpy as np

from ahocorasick_tpu.utils import chartables

LOWER_SHA256 = "72f71c0202fd6e47eea7ee0d54cf1d08aab9494f6f0fa0a63050045b0919e08e"
LOD_SHA256 = "295aebe50779cddc324956cf6e315fd191185a4800d16276ca8837008d1af627"


def test_full_table_hashes_pinned():
    lo = chartables.lower_table()
    ld = chartables.letter_or_digit_table()
    assert lo.dtype == np.uint16 and lo.shape == (65536,)
    assert ld.dtype == np.bool_ and ld.shape == (65536,)
    assert hashlib.sha256(lo.tobytes()).hexdigest() == LOWER_SHA256
    assert hashlib.sha256(ld.tobytes()).hexdigest() == LOD_SHA256


def test_fixture_matches_generator():
    """A CPython/Unicode upgrade that changes the generated tables must
    surface here as a deliberate decision point, not silently."""
    np.testing.assert_array_equal(
        chartables.lower_table(), chartables.compute_lower_table()
    )
    np.testing.assert_array_equal(
        chartables.letter_or_digit_table(),
        chartables.compute_letter_or_digit_table(),
    )


def test_lower_table_golden():
    t = chartables.lower_table()
    # ASCII
    assert t[ord("A")] == ord("a")
    assert t[ord("Z")] == ord("z")
    assert t[ord("a")] == ord("a")
    assert t[ord("0")] == ord("0")
    # Latin-1 / Latin Extended
    assert t[ord("É")] == ord("é")
    assert t[ord("Ø")] == ord("ø")
    # Java simple mapping for U+0130 (full mapping is 2 chars):
    assert t[0x0130] == ord("i")
    # Turkish dotless I: U+0049 'I' maps to 'i' (locale-independent).
    assert t[ord("I")] == ord("i")
    # Greek, Cyrillic
    assert t[ord("Σ")] == ord("σ")
    assert t[ord("Д")] == ord("д")
    # German sharp s has no uppercase->lowercase change
    assert t[ord("ß")] == ord("ß")
    # U+1E9E LATIN CAPITAL LETTER SHARP S -> U+00DF
    assert t[0x1E9E] == 0x00DF
    # Non-letters map to themselves
    assert t[ord(" ")] == ord(" ")
    assert t[0xFFFF] == 0xFFFF


def test_letter_or_digit_golden():
    t = chartables.letter_or_digit_table()
    assert t[ord("a")] and t[ord("Z")] and t[ord("5")]
    assert t[ord("é")] and t[ord("Д")] and t[ord("中")]
    assert not t[ord(" ")] and not t[ord("-")] and not t[ord("_")]
    assert not t[ord(".")] and not t[0x2028]
    # Devanagari digit, Arabic-Indic digit (category Nd)
    assert t[0x0966] and t[0x0660]
    # Superscript two is category No, NOT a Java letterOrDigit
    assert not t[0x00B2]


def test_default_word_chars():
    t = chartables.default_word_chars()
    assert t[ord("-")] and t[ord("_")]
    assert t[ord("a")] and t[ord("0")]
    assert not t[ord(" ")] and not t[ord("!")]


def test_word_chars_with_toggles():
    t = chartables.word_chars_with_toggles(["-", "!"], [False, True])
    assert not t[ord("-")]
    assert t[ord("!")]
    assert t[ord("a")]


def test_trim_word():
    wc = chartables.default_word_chars()
    assert chartables.trim_word("  go!!", wc) == "go"
    assert chartables.trim_word("go", wc) == "go"
    assert chartables.trim_word("...", wc) == "..."  # Java quirk: no word char -> unchanged
    assert chartables.trim_word("", wc) == ""


def test_utf16_units_roundtrip():
    s = "héllo 中文 a"
    u = chartables.to_utf16_units(s)
    assert chartables.units_to_str(u) == s
    # Astral char becomes a surrogate pair (Java String model).
    u2 = chartables.to_utf16_units("a😀b")
    assert len(u2) == 4
    assert chartables.units_to_str(u2) == "a😀b"
