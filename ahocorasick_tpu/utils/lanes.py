"""Lane/depth bucketing policy shared by the engine layers (jax-free).

Rounding walk depths and lane counts to coarse buckets keeps the set of
distinct compiled XLA executables small across calls with different text
lengths / dictionaries; extra padded lanes or depth steps only walk
already-dead state and emit nothing.
"""

LANE_BUCKET = 1 << 12  # lane-count rounding for per-start engines


def bucket_depth(d: int) -> int:
    """Walk depth padded to x4 (fewer distinct executables; extra steps
    only walk dead lanes).  THE single source for matcher/bench/stream and
    the ops engines."""
    return max(-(-d // 4) * 4, 4)
