"""Per-group anomaly scoring: z-score outliers over grouped numeric
columns.

The two-pass shape (group stats, then broadcast-join back) is the
scale-correct plan: the stats table has one row per group (tiny), so
the second pass is a broadcast join + narrow filter — the fact table
is read once per pass and never shuffled on a row basis.

Determinism for the cross-engine oracle: mean and variance come from
exact decimal sums (``sum(x)``, ``sum(x*x)`` as decimal(38,10)) and
only the final ``(ss - n*m^2)/(n-1)`` is computed in double — both
engines do the identical IEEE arithmetic, unlike their float
aggregates whose accumulation order differs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["group_stats", "winsorize", "zscore_outliers"]

_DEC = "decimal(38,10)"


def group_stats(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """(group, n, mean, std) via exact decimal sums; sample std."""
    v = F.col(value_col).cast(_DEC)
    agg = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).alias("_s"),
        F.sum((F.col(value_col) * F.col(value_col)).cast(_DEC)).alias("_ss"),
    )
    mean = (F.col("_s").cast("double") / F.col("n"))
    var = (
        F.col("_ss").cast("double") - F.col("n") * mean * mean
    ) / (F.col("n") - 1)
    return agg.select(
        group_col,
        "n",
        mean.alias("mean"),
        F.sqrt(F.greatest(var, F.lit(0.0))).alias("std"),
    )


_WINSORIZE_EXACT_MAX_BYTES = 1 << 30  # ~10M fact rows of (group, double)
_UNKNOWN_SIZE = (1 << 63) - 1  # spark.sql.defaultSizeInBytes sentinel


def _winsorize_gate_exact(size_in_bytes: int) -> bool:
    """True iff the exact (value-list-buffering) percentile is safe.
    Long.MaxValue is the statless-source sentinel (JDBC, some DSv2) —
    it may front arbitrarily large data, so unknown gates to the
    bounded-memory approx sketch."""
    if size_in_bytes == _UNKNOWN_SIZE:
        return False
    return size_in_bytes <= _WINSORIZE_EXACT_MAX_BYTES


def winsorize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
    clipped_col: str = "clipped",
    exact: bool | None = None,
) -> DataFrame:
    """Per-group quantile clipping (winsorization) — the heavy-tail
    taming step of feature preparation.  Same two-pass shape as
    :func:`zscore_outliers`: per-group quantiles (one tiny row per
    group), broadcast-joined back, then a narrow
    ``greatest(lo, least(hi, x))`` clip.  Adds ``clipped_col`` plus
    boolean ``clipped_lo``/``clipped_hi`` audit flags.

    Exact ``percentile`` buffers each group's whole value list in one
    aggregation buffer (an OOM at 100 TB), so the swap to
    ``approx_percentile`` (GK sketch, bounded memory) is a REAL code
    path, not advice: ``exact=None`` auto-gates on the optimized
    plan's driver-side size estimate (no Spark job) vs
    ``_WINSORIZE_EXACT_MAX_BYTES``.  File-backed plans — the only way
    100 TB arrives — carry a real size.  A size of Long.MaxValue is
    ``spark.sql.defaultSizeInBytes`` — the sentinel ANY statless source
    reports (JDBC, some DSv2 relations), which may front arbitrarily
    large data — so UNKNOWN gates to the bounded-memory sketch (the
    safe direction).  NOTE: in PySpark, ``spark.createDataFrame``
    builds an RDD-backed plan (``LogicalRDD``), NOT a sized
    LocalRelation, so in-memory DataFrames also report the sentinel and
    auto-gate to approx (pinned by ``tests/test_scd_anomaly.py``).
    Callers that know the data is small (tests, driver-materialized
    frames) or know the row count precisely (parquet footers —
    queries._footer_rows) should pass ``exact`` explicitly.
    """
    if exact is None:
        exact = _winsorize_gate_exact(
            int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
    fn = "percentile" if exact else "approx_percentile"
    bounds = df.groupBy(group_col).agg(
        F.expr(f"{fn}({value_col}, {lo})").alias("_lo"),
        F.expr(f"{fn}({value_col}, {hi})").alias("_hi"),
    )
    v = F.col(value_col)
    return (
        df.join(F.broadcast(bounds), group_col)
        .withColumns(
            {
                clipped_col: F.greatest(F.col("_lo"), F.least(F.col("_hi"), v)),
                "clipped_lo": v < F.col("_lo"),
                "clipped_hi": v > F.col("_hi"),
            }
        )
        .drop("_lo", "_hi")
    )


def zscore_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    threshold: float = 2.5,
) -> DataFrame:
    """Rows whose value deviates more than ``threshold`` sample
    standard deviations from their group mean.  Adds a ``z`` column.

    Stats side is one row per group — broadcast by construction.
    """
    stats = group_stats(df, group_col, value_col)
    z = (F.col(value_col) - F.col("mean")) / F.col("std")
    return (
        df.join(F.broadcast(stats), group_col)
        .where(F.col("std") > 0)
        .withColumn("z", z)
        .where(F.abs(F.col("z")) > threshold)
        .drop("n", "mean", "std")
    )
