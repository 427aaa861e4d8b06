"""Generate the checked-in golden conformance fixtures.

Run once (and only when semantics intentionally change):

    python tests/golden/generate.py

Each case pins the exact (start, end, value) triples for one matcher
configuration over one haystack.  The reference for these semantics is the
Java library (SURVEY.md §1 match-reporting conventions); triples were
generated from the host gold model, whose loops mirror the Java sources
line-by-line (``core/gold.py``), and reviewed by hand for the small cases.
``tests/test_golden.py`` asserts every engine reproduces the file
byte-for-byte — any diff is a semantic regression, not a test to update
casually.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


CASES = [
    # name, kind, is_map, keywords, case_sensitive, haystack
    ("ac_classic", "ac", False,
     ["he", "she", "his", "hers", "ushers"], True,
     "ushers said heshe hishers ushers"),
    ("ac_case_fold", "ac", False,
     ["He", "SHE", "hIs"], False,
     "uSHErs sHe saId HE hIS"),
    ("ac_overlap_torture", "ac", False,
     ["a", "aa", "aaa", "aaaa"], True, "aaaaaaa b aaaa"),
    ("ac_map_values", "ac", True,
     ["alpha", "beta", "al", "a"], True,
     "alphabetical beta al"),
    ("ac_unicode_bmp", "ac", False,
     ["naïve", "ïv", "über"], True, "naïve über naïveté"),
    ("ac_turkish_fold", "ac", False,
     ["İstanbul", "i̇z"], False, "istanbul İstanbul"),
    ("longest_basic", "longest", False,
     ["he", "hers", "herself", "el"], True,
     "xx herself hers he elhers"),
    ("longest_map", "longest", True,
     ["ab", "abc", "bc", "c"], True, "zabcz abc bc"),
    ("longest_chain_flush", "longest", False,
     ["aa", "aaa", "ab"], True, "aaaab aaa"),
    ("shortest_basic", "shortest", False,
     ["he", "hers", "she", "s"], True, "ushers said hers"),
    ("shortest_map", "shortest", True,
     ["ab", "abc", "b"], True, "xabcx ab b"),
    ("whole_word_basic", "whole_word", False,
     ["ab", "abc", "b"], True, "ab abc xb ab. b-abc ab"),
    ("whole_word_map", "whole_word", True,
     ["cat", "dog"], True, "cat catalog dog dog-cat"),
    ("whole_word_longest_separators", "whole_word_longest", False,
     ["as if", "as", "if only"], True, "as if only as ifx as"),
    ("whole_word_longest_map", "whole_word_longest", True,
     ["new york", "new", "york city"], True,
     "new york city loves new yorkers"),
]


def main() -> None:
    from ahocorasick_tpu.core import gold
    from ahocorasick_tpu.core.compiler import compile_matcher

    out = []
    for name, kind, is_map, keywords, case_sensitive, haystack in CASES:
        values = list(range(len(keywords))) if is_map else None
        m = compile_matcher(keywords, kind, case_sensitive, values=values)
        triples = [[int(s), int(e), int(v)] for s, e, v in
                   gold.gold_match(m, haystack)]
        out.append({
            "name": name, "kind": kind, "map": is_map, "keywords": keywords,
            "case_sensitive": case_sensitive, "haystack": haystack,
            "triples": triples,
        })
    path = os.path.join(os.path.dirname(__file__), "fixtures.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, ensure_ascii=False)
    print(f"wrote {len(out)} cases to {path}")


if __name__ == "__main__":
    main()
