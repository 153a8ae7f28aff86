"""Time-series regularization: calendar resampling with gap fill.

An analytics engine over event streams needs the "make this series
regular" primitive: pick a grid (days), take the last observation per
key per grid cell, materialize the missing cells, and forward-fill.
The reference engine has no native time dimension (its rows are
synapse touches), but its run-length/interval machinery
(`/root/reference/src/index/indexing.cpp`) is the same
gaps-and-islands family; this module is the temporal face of it.

Scale shape (100 TB lens):

- the per-cell "last observation" is one hash aggregate keyed on
  (key, cell) — map-side partial, one shuffle;
- calendar materialization is ``sequence()`` + ``explode`` bounded by
  each key's own observed span — no global calendar cross join, so a
  key active for a week costs 7 rows no matter how long the corpus
  runs;
- the forward fill is ``last(value, ignorenulls=True)`` over a window
  partitioned BY KEY — never a global window.  Skewed keys are bounded
  by their calendar span, not their event count, because the fill runs
  on the daily grid (post-aggregation), not on raw events.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def resample_ffill(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    unit: str = "day",
) -> DataFrame:
    """Per-``key`` regular ``unit`` grid from each key's first to last
    observation, carrying the last observed ``value_col`` forward
    across gaps.

    The in-cell "last" is deterministic: latest ``ts_col``, ties broken
    by ``tiebreak_col`` (pass a unique id).  Output columns:
    ``(key, cell, value_filled, is_gap)`` where ``is_gap`` marks cells
    with no observation.
    """
    cell: Column = F.date_trunc(unit, F.col(ts_col)).cast("timestamp")
    w_last = Window.partitionBy(key, "cell").orderBy(
        F.col(ts_col).desc(), F.col(tiebreak_col).desc()
    )
    observed = (
        df.select(key, cell.alias("cell"), ts_col, tiebreak_col, value_col)
        .withColumn("_rn", F.row_number().over(w_last))
        .filter(F.col("_rn") == 1)
        .select(key, "cell", F.col(value_col).alias("_obs"))
    )
    step = F.expr(f"interval 1 {unit}")
    grid = (
        observed.groupBy(key)
        .agg(F.min("cell").alias("_c0"), F.max("cell").alias("_c1"))
        .select(
            key,
            F.explode(F.sequence(F.col("_c0"), F.col("_c1"), step)).alias(
                "cell"
            ),
        )
    )
    w_fill = (
        Window.partitionBy(key)
        .orderBy("cell")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(observed, [key, "cell"], "left")
        .select(
            key,
            "cell",
            F.last("_obs", ignorenulls=True).over(w_fill).alias("value_filled"),
            F.col("_obs").isNull().alias("is_gap"),
        )
    )
