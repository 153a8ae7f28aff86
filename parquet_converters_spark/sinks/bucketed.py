"""Bucketed table writer — the co-located-join fast path as an API.

Pre-bucketing two fact tables on their join key turns every subsequent
join between them into a bucket-to-bucket merge with NO Exchange on
either side (verified on the physical plan in
``tests/test_bucketing.py``).  At 100 TB this is the difference
between shuffling the fact table once per query and never: the shuffle
is paid once, at write time, and amortized over every downstream join
and aggregation on the same key.

Spark's bucketing lives in the session catalog (``saveAsTable``), not
in plain parquet paths — bucket metadata has nowhere to go in a bare
directory.  This module wraps the idiom so pipelines don't re-derive
the incantation (bucket count parity on both sides, sortBy for the
merge path, the catalog round-trip).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str] | str,
    buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and by default sorted) catalog
    table keyed for co-located joins.

    Both sides of a future join must use the SAME bucket count and
    keys, or Spark falls back to shuffling the mismatched side.  Sorted
    buckets additionally skip the per-task sort of a sort-merge join.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    w = df.write.bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.mode(mode).saveAsTable(table)


def read_bucketed(spark, table: str) -> DataFrame:
    """Read a bucketed table back with its bucket metadata intact
    (``spark.table``, NOT ``spark.read.parquet`` on the warehouse path —
    a path read drops the bucket spec and reintroduces the shuffle)."""
    return spark.table(table)
