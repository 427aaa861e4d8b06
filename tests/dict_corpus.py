"""Seeded dictionary-scale conformance corpus.

The reference's strongest integration test matches an English paragraph
against the 235,886-word ``/usr/share/dict/words`` (``SetTest.java:40-59``).
That file is absent from this image and the build has no network egress, so
this module deterministically regenerates a same-scale English-like
dictionary (seeded syllable morphology with shared stems and suffixes, so
trie prefix-sharing is realistic) plus a paragraph and a corpus built from
it.  ``test_dict_corpus.py`` pins the exact match counts for all five
matcher kinds against these inputs.
"""

from __future__ import annotations

import numpy as np

DICT_SIZE = 235_886  # the macOS /usr/share/dict/words line count
SEED = 20260820

_ONSETS = ["b", "bl", "br", "c", "ch", "cl", "cr", "d", "dr", "f", "fl",
           "fr", "g", "gl", "gr", "h", "j", "k", "l", "m", "n", "p", "ph",
           "pl", "pr", "qu", "r", "s", "sc", "sh", "sk", "sl", "sm", "sn",
           "sp", "st", "str", "sw", "t", "th", "tr", "tw", "v", "w", "wh",
           "y", "z", ""]
_VOWELS = ["a", "e", "i", "o", "u", "ai", "au", "ea", "ee", "ei", "ie",
           "io", "oa", "oo", "ou", "ue"]
_CODAS = ["", "b", "ck", "d", "f", "g", "k", "l", "ll", "m", "n", "nd",
          "ng", "nk", "nt", "p", "r", "rd", "rk", "rm", "rn", "rt", "s",
          "sh", "ss", "st", "t", "th", "x"]
_SUFFIXES = ["", "s", "ed", "ing", "er", "ers", "ly", "ness", "ment",
             "tion", "al", "ous", "ive", "able", "ity", "ful", "less",
             "ish", "est", "y"]


def dict_words(n: int = DICT_SIZE, seed: int = SEED) -> list:
    """n distinct English-like lowercase words, 2..24 chars, sorted."""
    rng = np.random.default_rng(seed)
    out = set()
    while len(out) < n:
        k = int(rng.integers(1, 4))
        stem = "".join(
            _ONSETS[int(rng.integers(len(_ONSETS)))]
            + _VOWELS[int(rng.integers(len(_VOWELS)))]
            + (_CODAS[int(rng.integers(len(_CODAS)))]
               if (j == k - 1 or rng.random() < 0.3) else "")
            for j in range(k)
        )
        w = stem + _SUFFIXES[int(rng.integers(len(_SUFFIXES)))]
        if 2 <= len(w) <= 24:
            out.add(w)
    return sorted(out)


def dict_paragraph(words: list, seed: int = SEED) -> str:
    """A ~700-unit 'paragraph' of dictionary words with punctuation —
    the analog of the reference paragraph (SetTest.java:51-54), dense in
    real dictionary hits because it is drawn from the dictionary itself."""
    rng = np.random.default_rng(seed + 1)
    parts = []
    total = 0
    sample = [words[int(i)] for i in rng.integers(0, len(words), size=256)]
    while total < 680:
        w = sample[int(rng.integers(len(sample)))]
        if rng.random() < 0.08:
            w = w.capitalize()
        parts.append(w)
        total += len(w) + 1
        if rng.random() < 0.12:
            parts[-1] += rng.choice([",", ".", ";", ":"])
            total += 1
    return " ".join(parts)


def dict_corpus(words: list, n_units: int, seed: int = SEED) -> str:
    """A larger mixed corpus: ~70% dictionary words, noise words, and
    separator-free concatenation runs (substring/overlap pressure)."""
    rng = np.random.default_rng(seed + 2)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    sample = [words[int(i)] for i in rng.integers(0, len(words), size=2048)]
    parts = []
    total = 0
    while total < n_units:
        r = rng.random()
        if r < 0.70:
            w = sample[int(rng.integers(len(sample)))]
        elif r < 0.90:
            w = "".join(rng.choice(letters, size=int(rng.integers(2, 12))))
        else:  # concatenation run, no separators
            w = "".join(sample[int(i)] for i in rng.integers(0, len(sample), size=3))
        parts.append(w)
        total += len(w) + 1
    return " ".join(parts)[:n_units]
