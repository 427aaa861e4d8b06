"""Native (C++) compiler parity: byte-identical tables vs the Python path.

The Python compiler is the semantic spec (itself oracle-tested against the
reference's behavior); the native path must reproduce every output array
bit-for-bit, including emit-table layout (which depends on BFS child
insertion order) and shortest-kind pruning.
"""

import numpy as np
import pytest

from ahocorasick_tpu.core.compiler import AC, LONGEST, SHORTEST, compile_matcher

try:
    from ahocorasick_tpu.native import lib as native_lib

    HAVE_NATIVE = native_lib.available()
except Exception:
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE, reason="native lib unavailable")

ARRAY_FIELDS = [
    "charmap", "trie_next", "dfa_next", "fail", "own_len", "own_val",
    "match_len", "match_val", "depth", "emit_start", "emit_count",
    "emit_len", "emit_val",
]


def assert_identical(keywords, kind, case_sensitive=True, values=None):
    py = compile_matcher(list(keywords), kind, case_sensitive,
                         values=list(values) if values else None,
                         backend="python")
    nat = compile_matcher(list(keywords), kind, case_sensitive,
                          values=list(values) if values else None,
                          backend="native")
    assert nat.num_states == py.num_states
    assert nat.num_classes == py.num_classes
    assert nat.max_depth == py.max_depth
    for f in ARRAY_FIELDS:
        a, b = getattr(py, f), getattr(nat, f)
        if a is None:
            assert b is None, f
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=f)
    assert (py.values is None) == (nat.values is None)
    if py.values is not None:
        assert py.values == nat.values


@pytest.mark.parametrize("kind", [AC, LONGEST, SHORTEST])
def test_basic_parity(kind):
    assert_identical(["he", "she", "his", "hers"], kind)


@pytest.mark.parametrize("kind", [AC, LONGEST, SHORTEST])
def test_case_insensitive_parity(kind):
    assert_identical(["He", "SHE", "hİs"], kind, case_sensitive=False)


def test_values_and_duplicates():
    assert_identical(["a", "ab", "a", "b"], AC, values=[1, 2, 3, 4])


def test_shortest_prefix_pruning_parity():
    # Later keywords with an earlier-keyword prefix are skipped and consume
    # no value id (ShortestMatchSet.java:23-42).
    assert_identical(["ab", "abc", "b", "ba"], SHORTEST, values=list("wxyz"))


def test_empty_and_none_keywords():
    assert_identical(["", "a", "", "ab"], AC, values=[1, 2, 3, 4])


def test_empty_dictionary():
    assert_identical([], AC)


def test_single_char_full_alphabet():
    assert_identical([chr(c) for c in range(200, 360)], AC)


@pytest.mark.parametrize("kind", [AC, LONGEST, SHORTEST])
@pytest.mark.parametrize("seed", [0, 1])
def test_fuzz_parity(kind, seed):
    rng = np.random.default_rng(seed)
    alpha = "abcdefgh"
    for trial in range(10):
        n = int(rng.integers(1, 60))
        kws = [
            "".join(rng.choice(list(alpha), size=int(rng.integers(1, 9))))
            for _ in range(n)
        ]
        vals = list(range(n))
        assert_identical(kws, kind, case_sensitive=bool(trial % 2), values=vals)


def test_non_bmp_keywords():
    assert_identical(["a\U0001F600b", "he"], AC)  # surrogate pair in UTF-16


def test_follow_chain_parity():
    from ahocorasick_tpu.resolve import wholeword

    rng = np.random.default_rng(7)
    n = 200
    die_pos = np.sort(rng.integers(0, n, size=n)).astype(np.int64)
    die_pos = np.maximum(die_pos, np.arange(n))  # die at/after own index
    has = rng.random(n) < 0.3
    ms = rng.integers(0, n, size=n).astype(np.int64)
    me = ms + rng.integers(1, 5, size=n).astype(np.int64)
    mv = rng.integers(-1, 5, size=n).astype(np.int64)
    ws = np.unique(rng.integers(0, n, size=40)).astype(np.int64)

    native = native_lib.follow_chain(die_pos, has, ms, me, mv, ws, n)

    # Pure-python reference (the fallback branch in wholeword.follow_chain).
    out = []
    i = 0
    while i < n:
        if has[i]:
            out.append((int(ms[i]), int(me[i]), int(mv[i])))
        p = int(die_pos[i])
        j = int(np.searchsorted(ws, p, side="right"))
        if j >= len(ws):
            break
        i = int(ws[j])
    assert native == out


def test_native_resolve_longest_parity_fuzz():
    """Native resolver == Python oracle on random candidate streams."""
    import numpy as np

    from ahocorasick_tpu.native import lib as native_lib
    from ahocorasick_tpu.resolve.queue import resolve_longest_py

    if not native_lib.available():
        import pytest

        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(13)
    for trial in range(20):
        n = int(rng.integers(0, 400))
        ends = np.sort(rng.integers(1, 120, size=n)).astype(np.int64)
        lens = rng.integers(1, 12, size=n).astype(np.int64)
        starts = np.maximum(ends - lens, 0)
        # reference offer order: end asc, start asc
        order = np.lexsort((starts, ends))
        starts, ends = starts[order], ends[order]
        vals = rng.integers(0, 50, size=n).astype(np.int64)
        got = native_lib.resolve_longest(starts, ends, vals)
        exp = resolve_longest_py(starts, ends, vals)
        assert [g.tolist() for g in got] == [e.tolist() for e in exp], trial


def test_native_resolve_shortest_parity_fuzz():
    """Native min-end resolver == Python oracle on random candidate streams."""
    import numpy as np

    from ahocorasick_tpu.native import lib as native_lib
    from ahocorasick_tpu.resolve.queue import resolve_shortest_py

    if not native_lib.available():
        import pytest

        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(14)
    for trial in range(20):
        n = int(rng.integers(0, 400))
        ends = np.sort(rng.integers(1, 120, size=n)).astype(np.int64)
        lens = rng.integers(1, 12, size=n).astype(np.int64)
        starts = np.maximum(ends - lens, 0)
        order = np.lexsort((starts, ends))
        starts, ends = starts[order], ends[order]
        vals = rng.integers(0, 50, size=n).astype(np.int64)
        got = native_lib.resolve_shortest(starts, ends, vals)
        exp = resolve_shortest_py(starts, ends, vals)
        assert [g.tolist() for g in got] == [e.tolist() for e in exp], trial


def test_native_extract_resolve_parity_fuzz():
    """Fused bitplane extract+resolve == numpy extract + sort + Python
    resolver, both modes, random multi-plane masks with padded strides."""
    import numpy as np

    from ahocorasick_tpu.native import lib as native_lib
    from ahocorasick_tpu.ops.emit import sort_by_end_start
    from ahocorasick_tpu.ops.scan_batched import end_planes_to_matches
    from ahocorasick_tpu.resolve.queue import resolve_longest_py, resolve_shortest_py

    if not native_lib.available():
        import pytest

        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(15)
    for trial in range(25):
        planes = int(rng.integers(1, 3))
        n = int(rng.integers(0, 300))
        stride = n + int(rng.integers(0, 8))
        max_depth = int(rng.integers(1, planes * 32 + 1))
        # sparse-ish random masks, occasionally dense (adversarial analog)
        density = 0.9 if trial % 5 == 0 else 0.1
        bits = (rng.random((planes, max(stride, 1))) < density).astype(np.uint32)
        bits *= rng.integers(0, 1 << 16, size=bits.shape).astype(np.uint32)
        starts, lens = end_planes_to_matches(bits, n, max_depth)
        s, e, _ = sort_by_end_start(starts, lens)
        v = np.full(len(s), -1, dtype=np.int64)
        for mode, resolver in (("longest", resolve_longest_py),
                               ("shortest", resolve_shortest_py)):
            gs, ge = native_lib.extract_resolve(bits, n, max_depth, mode)
            es, ee, _ = resolver(s, e, v)
            assert gs.tolist() == es.tolist() and ge.tolist() == ee.tolist(), (
                trial, mode)


# ---------------- whole-word kinds (round 4: native support) --------------- #

WW_ARRAY_FIELDS = ARRAY_FIELDS + [
    "class_is_word", "fail_len", "fail_off", "fail_val", "word_chars",
]


def assert_identical_ww(keywords, kind, case_sensitive=True, values=None,
                        word_chars=None):
    py = compile_matcher(list(keywords), kind, case_sensitive,
                         values=list(values) if values else None,
                         word_chars=word_chars, backend="python")
    nat = compile_matcher(list(keywords), kind, case_sensitive,
                          values=list(values) if values else None,
                          word_chars=word_chars, backend="native")
    assert nat.num_states == py.num_states
    assert nat.num_classes == py.num_classes
    assert nat.max_depth == py.max_depth
    for f in WW_ARRAY_FIELDS:
        a, b = getattr(py, f), getattr(nat, f)
        if a is None:
            assert b is None, f
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=f)
    assert py.values == nat.values


def test_whole_word_parity():
    from ahocorasick_tpu.core.compiler import WHOLE_WORD

    assert_identical_ww(["he", "she", "hers", " trimmed "], WHOLE_WORD)
    assert_identical_ww(["Hello", "WORLD"], WHOLE_WORD, case_sensitive=False,
                        values=["a", "b"])


def test_whole_word_longest_parity_fail_carries():
    from ahocorasick_tpu.core.compiler import WHOLE_WORD_LONGEST

    m = compile_matcher(["new", "new york", "new york city", "york"],
                        WHOLE_WORD_LONGEST, True, backend="native")
    assert int(m.fail_len.sum()) > 0  # separator edges carry fail matches
    assert_identical_ww(["new", "new york", "new york city", "york"],
                        WHOLE_WORD_LONGEST)


def test_whole_word_native_reject():
    from ahocorasick_tpu.core.compiler import WHOLE_WORD

    with pytest.raises(ValueError):
        compile_matcher(["a!b"], WHOLE_WORD, True, backend="native")
    # The Java trim quirk returns an all-separator keyword UNCHANGED, so
    # plain whole-word REJECTS it (non-empty, contains non-word chars) —
    # both backends agree (WholeWordMatchSet.java:146-153).
    with pytest.raises(ValueError):
        compile_matcher(["  "], WHOLE_WORD, True, backend="native")
    with pytest.raises(ValueError):
        compile_matcher(["  "], WHOLE_WORD, True, backend="python")


def test_whole_word_custom_word_chars_parity():
    from ahocorasick_tpu.core.compiler import WHOLE_WORD_LONGEST
    from ahocorasick_tpu.utils import chartables

    wc = chartables.default_word_chars().copy()
    wc[ord("'")] = True
    assert_identical_ww(["can't", "naïve", "übermäßig"], WHOLE_WORD_LONGEST,
                        word_chars=wc)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_whole_word_fuzz_parity(seed):
    import random

    from ahocorasick_tpu.core.compiler import WHOLE_WORD_LONGEST

    r = random.Random(seed)
    pool = ["a", "b", "ab", "a b", "ab ba", "b a b", "aab", " a ", "!b!a",
            "  ", "é é"]
    for _ in range(25):
        kws = [r.choice(pool) for _ in range(r.randint(1, 10))]
        assert_identical_ww(kws, WHOLE_WORD_LONGEST,
                            case_sensitive=bool(r.getrandbits(1)))
