"""Pin the Java-parity character tables with golden samples."""

import numpy as np

from ahocorasick_tpu.utils import chartables


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
