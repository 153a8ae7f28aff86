"""Approximate aggregation sketches — the 100 TB workhorses.

Exact COUNT(DISTINCT) shuffles every distinct value; exact percentiles
buffer whole groups. The sketch forms below are fixed-size mergeable
state (HyperLogLog++ registers, KLL/GK quantile summaries), so a
1000-executor aggregation moves kilobytes per group instead of the
data. They cannot be DuckDB-hash-oracled (each engine's sketch state
and exact error differ), so their correctness gate is the relative-
error bound against the exact answer in `tests/test_sketches.py`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def approx_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    rsd: float = 0.02,
) -> DataFrame:
    """Per-group approximate distinct count (HyperLogLog++).

    ``rsd`` is the target relative standard deviation; state per group
    is O(1/rsd²) bytes regardless of cardinality — the whole point at
    scale.  Output: (group, approx_distinct)."""
    return df.groupBy(group_col).agg(
        F.approx_count_distinct(value_col, rsd=rsd).alias("approx_distinct")
    )


def approx_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    probabilities: tuple[float, ...] = (0.5, 0.9, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group approximate quantiles (Greenwald-Khanna summary via
    ``percentile_approx``).  Error is bounded by 1/accuracy of the
    rank, with O(accuracy · log n) state — mergeable across partitions,
    so groups never materialize on one executor.
    Output: (group, q_50, q_90, ... one column per probability)."""
    aggs = [
        F.percentile_approx(value_col, F.lit(p), F.lit(accuracy))
        .alias(f"q_{int(p * 100)}")
        for p in probabilities
    ]
    return df.groupBy(group_col).agg(*aggs)
