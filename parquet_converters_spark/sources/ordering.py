"""Ordered multi-file parquet scan (reference operator S5).

The reference concatenates a directory of parquet files in *sorted
file-name order*, tracking global row-group offsets so every record has a
deterministic global position (``src/parquet2hdf5.cpp:236``,
``src/circuit/parquet_reader.cpp:83-160``).  Spark promises no such order,
so we reconstruct it explicitly — and shuffle-free:

- per-file row position comes from the parquet reader's hidden
  ``_metadata.row_index`` column (computed during the scan, no window, no
  exchange);
- per-file base offsets are a driver-side prefix sum over footer row
  counts of the sorted file list (footers only — O(files), not O(rows) —
  the same metadata pass the reference does), joined in via a broadcast
  map.

At 100 TB this stays a single narrow scan stage: no shuffle, no
zipWithIndex job, no window over the whole table.
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql import DataFrame, functions as F


def _sorted_files(path: str) -> list[str]:
    if os.path.isdir(path):
        files = _glob.glob(os.path.join(path, "*.parquet"))
    elif any(ch in path for ch in "*?["):
        files = _glob.glob(path)
    else:
        files = [path]
    if not files:
        raise FileNotFoundError(f"no parquet files under {path!r}")
    return sorted(files)


def file_row_counts(files: list[str]) -> list[int]:
    """Row counts from parquet footers (driver-side metadata-only read)."""
    import pyarrow.parquet as pq

    return [pq.ParquetFile(f).metadata.num_rows for f in files]


# Past this many files the per-file offset lookup switches from an
# inline literal map (zero-join, but the expression is O(files) and a
# 10^5-file scan would blow up the plan) to a broadcast-hash join on a
# tiny offsets DataFrame (plan stays O(1), the lookup table ships once
# per executor).
_LITERAL_MAP_MAX_FILES = 1024


def read_parquet_ordered(
    spark,
    path: str,
    row_index_col: str = "row_index",
    mergeSchema: bool = False,
) -> DataFrame:
    """Read a parquet file/dir with a deterministic global ``row_index``
    column (sorted-file-name x in-file order, matching the reference's
    global order).

    Schema-merge is off by default: like the reference, all files must
    agree on the schema (``parquet2hdf5.cpp:67-73`` — mismatched schemas
    are a hard error there too).
    """
    files = _sorted_files(path)
    counts = file_row_counts(files)
    offsets: dict[str, int] = {}
    base = 0
    for f, c in zip(files, counts):
        # Spark reports file paths as URIs; key by basename + normalized path
        offsets[os.path.abspath(f)] = base
        base += c

    df = (
        spark.read.option("mergeSchema", str(mergeSchema).lower())
        .parquet(*files)
        .withColumn("_file", F.col("_metadata.file_path"))
        .withColumn("_row_in_file", F.col("_metadata.row_index"))
    )
    # strip URI scheme so the offset keys match Spark's file_path form
    norm = F.concat(F.lit("file:"), F.regexp_replace(F.col("_file"), "^file:(//)?", ""))
    if len(files) <= _LITERAL_MAP_MAX_FILES:
        offset_expr = F.create_map(
            *[F.lit(x) for kv in offsets.items() for x in (f"file:{kv[0]}", kv[1])]
        )
        out = df.withColumn(
            row_index_col,
            offset_expr[norm].cast("long") + F.col("_row_in_file"),
        )
    else:
        offsets_df = spark.createDataFrame(
            [(f"file:{k}", v) for k, v in offsets.items()],
            "_file_key string, _base_offset long",
        )
        out = (
            df.withColumn("_file_key", norm)
            .join(F.broadcast(offsets_df), "_file_key")
            .withColumn(
                row_index_col, F.col("_base_offset") + F.col("_row_in_file")
            )
            .drop("_file_key", "_base_offset")
        )
    return out.drop("_file", "_row_in_file")


def with_global_row_index(df: DataFrame, row_index_col: str = "row_index",
                          order_cols: list[str] | None = None) -> DataFrame:
    """Global contiguous row index for an arbitrary DataFrame.

    Two modes, both the two-pass partition-offset pattern (count per
    partition on a narrow pass, driver prefix-sum, then a narrow
    mapPartitions add) — the Spark equivalent of the reference's
    Gather/prefix-sum/Scatter offset dance (``parquet2hdf5.cpp:97-110``):

    - ``order_cols`` given: one ``repartitionByRange`` + within-partition
      sort establishes the logical order across partitions, then offsets
      are added per partition.  Never a single global ``Window.orderBy``
      — that would serialize the corpus through one task.  Ties on
      ``order_cols`` get arbitrary (but stable within a run) relative
      indices, exactly as the window form did.
    - no ``order_cols``: preserves the current partition order.
    """
    if order_cols:
        n = max(df.sparkSession.sparkContext.defaultParallelism, 1)
        df = df.repartitionByRange(n, *order_cols).sortWithinPartitions(
            *order_cols
        )

    spark = df.sparkSession
    rdd = df.rdd
    counts = rdd.mapPartitionsWithIndex(
        lambda i, it: [(i, sum(1 for _ in it))]
    ).collect()
    offsets = {}
    base = 0
    for i, c in sorted(counts):
        offsets[i] = base
        base += c
    b_offsets = spark.sparkContext.broadcast(offsets)
    schema = df.schema.add(row_index_col, "long", False)

    def add_index(i, it):
        off = b_offsets.value[i]
        for j, row in enumerate(it):
            yield (*row, off + j)

    return spark.createDataFrame(rdd.mapPartitionsWithIndex(add_index), schema)
