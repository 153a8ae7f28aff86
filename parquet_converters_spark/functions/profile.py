"""One-pass table profiling — the data-engineering `SUMMARIZE` that
precedes any 100 TB ingest: per-column null counts, exact distinct
counts, and min/max, computed in a SINGLE scan (4·k aggregate
accumulators, map-side combined) rather than k per-column passes.
The wide 1-row aggregate is then melted to long format with ``stack``
(pure projection, no extra action).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Profile ``columns`` (default: all) in one pass.

    Returns (col_name, n_nulls, n_distinct, min_str, max_str) — min/max
    rendered as strings so heterogeneous columns share a schema.  For
    cross-engine comparisons prefer integer/string columns: float and
    timestamp string renderings are engine-specific.
    """
    cols = columns or df.columns
    aggs = []
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"__nn_{c}"),
            F.countDistinct(c).alias(f"__nd_{c}"),
            F.min(F.col(c).cast("string")).alias(f"__mn_{c}"),
            F.max(F.col(c).cast("string")).alias(f"__mx_{c}"),
        ]
    row = df.agg(*aggs)
    pairs = ", ".join(
        f"'{c}', __nn_{c}, __nd_{c}, __mn_{c}, __mx_{c}" for c in cols
    )
    return row.selectExpr(
        f"stack({len(cols)}, {pairs}) AS (col_name, n_nulls, n_distinct, min_str, max_str)"
    )
