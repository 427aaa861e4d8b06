"""Thresholder SPI: cost-model parity AND real layout governance.

RangeNodeThreshold pins the reference formula exactly
(threshold/RangeNodeThreshold.java): always dense when the key interval is
<= 8 (:24-26), else
``size + size/4 + 3 > interval * (max - linear/(constant+level)**exponent)``
(:27-28).  The SPI is wired into the compiler's dense-vs-RowTable decision
(one call per automaton; see utils/thresholds.py), so a custom policy
observably changes the compiled table layout — tested below.
"""

import numpy as np

from ahocorasick_tpu.utils.thresholds import (
    DenseTableBudget,
    RangeNodeThreshold,
    Thresholder,
)


def _java_formula(size, level, interval, exp=1.0, lin=1.0, mx=0.65, const=2.0):
    if interval <= 8:
        return True
    return size + size // 4 + 3 > interval * (mx - lin / (const + level) ** exp)


def test_interval_at_most_8_always_dense():
    t = RangeNodeThreshold()
    for interval in (1, 4, 8):
        assert t.is_over_threshold(0, 0, interval)
        assert t.is_over_threshold(1, 99, interval)


def test_cost_model_matches_java_formula():
    t = RangeNodeThreshold()
    for size in (1, 3, 9, 40, 200):
        for level in (0, 1, 2, 5, 30):
            for interval in (9, 16, 64, 300, 65536):
                assert t.is_over_threshold(size, level, interval) == _java_formula(
                    size, level, interval
                ), (size, level, interval)


def test_custom_parameters():
    # max_value=0: fill factor is negative at every level -> any nonempty
    # node is "over threshold" (dense) for intervals > 8 too.
    t = RangeNodeThreshold(max_value=0.0)
    assert t.is_over_threshold(1, 0, 100)
    # Huge max_value: never dense beyond the interval<=8 fast path.
    t2 = RangeNodeThreshold(max_value=1e9)
    assert not t2.is_over_threshold(200, 30, 9)
    assert t2.is_over_threshold(200, 30, 8)


def test_matcher_accepts_thresholder_for_parity():
    from ahocorasick_tpu import AhoCorasickSet

    m = AhoCorasickSet(["ab", "bc"], True, thresholder=RangeNodeThreshold(2.0, 1.0, 0.5, 1.0))
    assert m.match("xabcx") == [(1, 3), (2, 4)]


def test_base_class_is_abstract():
    import pytest

    with pytest.raises(NotImplementedError):
        Thresholder().is_over_threshold(1, 1, 1)


class _AlwaysSparse(Thresholder):
    def is_over_threshold(self, node_size, node_level, key_interval_size):
        return False


def test_thresholder_governs_table_layout():
    """A custom policy observably changes the compiled table layout."""
    from ahocorasick_tpu import AhoCorasickSet

    kws = ["he", "she", "his", "hers"]
    dense = AhoCorasickSet(kws)
    assert not dense.compiled.is_row_compressed  # default: small dict is dense

    sparse = AhoCorasickSet(kws, thresholder=_AlwaysSparse())
    assert sparse.compiled.is_row_compressed
    # Layout change, identical semantics and identical logical tables.
    text = "ushers and his"
    assert sparse.match(text) == dense.match(text)
    np.testing.assert_array_equal(
        sparse.compiled.dfa_next.materialize(), dense.compiled.dfa_next
    )


def test_dense_budget_hard_cap_beats_permissive_policy():
    """A permissive thresholder cannot force dense past the entry cap:
    the testFullNode-style wide alphabet stays row-compressed."""
    from ahocorasick_tpu import AhoCorasickSet

    class AlwaysDense(Thresholder):
        def is_over_threshold(self, node_size, node_level, key_interval_size):
            return True

    kws = [chr(c) for c in range(32, 32 + 40000)]
    m = AhoCorasickSet(kws, thresholder=AlwaysDense())
    assert m.compiled.is_row_compressed  # (S+1)*A over _DENSE_LIMIT
    assert m.count("".join(chr(32 + i) for i in range(100))) == 100


def test_dense_table_budget_policy():
    t = DenseTableBudget(max_entries=1000)
    assert t.is_over_threshold(5, 0, 1000)
    assert not t.is_over_threshold(5, 0, 1001)


def test_native_backend_rejects_custom_thresholder():
    # backend='native' always builds dense tables; silently dropping the
    # policy would violate the documented layout contract.
    import pytest

    from ahocorasick_tpu.core.compiler import compile_matcher

    with pytest.raises(ValueError, match="thresholder"):
        compile_matcher(["he", "she"], "ac", True, backend="native",
                        thresholder=_AlwaysSparse())


def test_rangenode_params_memory_vs_speed_ab():
    """The knob's REAL effect, A/B measured: two RangeNodeThreshold
    parameterizations flip the same dictionary between dense tables (more
    memory, fastest paths) and the row-deduplicated layout (hash-consed
    rows, less memory), with identical match output.  This is the honest
    scope of the reference's per-node Thresholder in this architecture:
    alphabet compaction + row hash-consing collapse the per-node economics
    into one layout decision per automaton (utils/thresholds.py docstring),
    and the parameters govern that decision through the fill factor
    ``max_value - linear_factor/(constant_factor + 0)**exponent``.
    """
    from ahocorasick_tpu.models.matchers import AhoCorasickSet

    rng = np.random.default_rng(5)
    # Wide-ish alphabet so dense costs real memory and rows dedup well.
    alphabet = [chr(c) for c in range(0x100, 0x200)]
    kws = sorted({
        "".join(rng.choice(alphabet, size=int(rng.integers(2, 5))))
        for _ in range(1500)
    })
    text = "".join(rng.choice(alphabet + [" "], size=4000))

    # fill <= 0 -> always dense;  fill huge -> never dense (interval > 8).
    dense_m = AhoCorasickSet(
        kws, thresholder=RangeNodeThreshold(max_value=0.0, linear_factor=0.0))
    sparse_m = AhoCorasickSet(
        kws, thresholder=RangeNodeThreshold(max_value=1e9))

    assert not dense_m.compiled.is_row_compressed
    assert sparse_m.compiled.is_row_compressed
    # Memory: the dense layout pays for (S+1) x A materialization (the
    # factor depends on row dedup; the point is an observable, same-
    # direction difference, not a specific ratio).
    assert dense_m.compiled.memory_bytes() > 1.4 * sparse_m.compiled.memory_bytes()
    # Semantics: identical matches either way.
    assert dense_m.match(text) == sparse_m.match(text)
