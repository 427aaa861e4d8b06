"""RangeNodeThreshold cost-model parity (threshold/RangeNodeThreshold.java).

The policy no longer steers storage here (rows are dense over compacted
classes, wide alphabets hash-cons rows), but the reference formula is kept
as a diagnostic predicate and for constructor parity — pin it exactly:
always dense when the key interval is <= 8 (:24-26), else
``size + size/4 + 3 > interval * (max - linear/(constant+level)**exponent)``
(:27-28).
"""

from ahocorasick_tpu.utils.thresholds import RangeNodeThreshold, Thresholder


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
