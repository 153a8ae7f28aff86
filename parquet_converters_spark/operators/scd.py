"""Slowly-changing-dimension (type 2) history building and latest-wins
upsert compaction over a change stream.

A 100 TB ingestion pipeline receives facts as append-only change
events; downstream consumers need either the *history* (validity
intervals per key: SCD2) or the *snapshot* (latest value per key:
upsert compaction).  Both are single-window passes partitioned by the
business key — one shuffle on the key, no joins, no self-joins:

- ``scd2_history``: ``lead(ts)`` over (key, ts) turns each change row
  into a [effective_from, effective_to) validity interval; the open
  interval (effective_to NULL) marks the current version.
- ``latest_snapshot``: ``row_number() == 1`` descending — the
  standard compaction that replaces a merge-on-read upsert table scan.

Determinism: ties on the event timestamp are broken by a caller-named
unique tiebreaker column so version numbering is total-ordered (the
DuckDB oracle uses the same ORDER BY).

Reference parity: no equivalent — the reference's tables are
immutable conversion outputs; this is extension surface for mutable
feeds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["scd2_history", "latest_snapshot"]


def scd2_history(
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Expand a change stream into SCD2 validity intervals.

    Adds ``effective_from`` (= ts), ``effective_to`` (next change's ts,
    NULL while current), ``version`` (1-based per key), ``is_current``.
    One window pass: shuffle on ``key_cols`` only.
    """
    w = Window.partitionBy(*key_cols).orderBy(ts_col, tiebreak_col)
    return (
        changes.withColumn("effective_from", F.col(ts_col))
        .withColumn("effective_to", F.lead(ts_col).over(w))
        .withColumn("version", F.row_number().over(w))
        .withColumn("is_current", F.col("effective_to").isNull())
    )


def latest_snapshot(
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Latest-wins upsert compaction: one row per key, the newest
    change.  Same single shuffle; ``row_number`` (not ``max`` + join)
    keeps it one pass."""
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(ts_col).desc(), F.col(tiebreak_col).desc()
    )
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
