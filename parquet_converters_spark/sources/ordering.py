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
import logging
import os

from pyspark.sql import DataFrame, functions as F

_log = logging.getLogger(__name__)


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


def sorted_parquet_files(path: str) -> list[str]:
    """Public listing used by the CLI verbs: the ``.parquet`` files
    under ``path`` (a directory, a glob, or one file) in lexicographic
    order — the concat order contract of the ordered multi-file scan.
    Raises ``FileNotFoundError`` when nothing matches."""
    return _sorted_files(path)


def file_row_counts(files: list[str]) -> list[int]:
    """Row counts from parquet footers (driver-side metadata-only read)."""
    import pyarrow.parquet as pq

    return [pq.ParquetFile(f).metadata.num_rows for f in files]


def _sidecar_schema(path: str):
    """Schema from a ``_metadata`` sidecar if the input is a directory
    that has one — the reference prefers the sidecar as the
    authoritative directory schema (``src/parquet2hdf5.cpp:205-218``,
    ``src/circuit/parquet_reader.cpp:93-97``) and warns when it is
    absent.  Returns None when there is no sidecar."""
    import pyarrow.parquet as pq

    if not os.path.isdir(path):
        return None
    sidecar = os.path.join(path, "_metadata")
    if not os.path.isfile(sidecar):
        _log.warning(
            "no _metadata sidecar under %s; falling back to per-file "
            "footers for the schema (reference parquet2hdf5.cpp:205-218 "
            "prefers the sidecar)",
            path,
        )
        return None
    return pq.ParquetFile(sidecar).schema_arrow


def check_schema_agreement(files: list[str], expected=None) -> None:
    """Hard-error when the files of an ordered scan disagree on schema,
    naming the first mismatching file — reference parity with
    ``src/parquet2hdf5.cpp:67-73`` (mismatched schemas are a hard error
    there too; Spark's ``mergeSchema=False`` default can silently
    project instead).  ``expected`` (e.g. the ``_metadata`` sidecar
    schema) overrides the first file as the reference schema.  Footer
    metadata only — O(files), no data read."""
    import pyarrow.parquet as pq

    ref_schema, ref_file = expected, "_metadata sidecar"
    for f in files:
        s = pq.ParquetFile(f).schema_arrow
        if ref_schema is None:
            ref_schema, ref_file = s, f
        elif not s.equals(ref_schema):
            raise ValueError(
                f"parquet schema mismatch in ordered scan: {f!r} does not "
                f"match {ref_file!r}\n  expected: {ref_schema}\n"
                f"  got:      {s}\n(the reference hard-errors on "
                "cross-file schema disagreement, parquet2hdf5.cpp:67-73; "
                "pass mergeSchema=True to merge instead)"
            )


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
    are a hard error there too), checked driver-side against the
    ``_metadata`` sidecar when the directory has one, else against the
    first file's footer.  ``mergeSchema=True`` opts out of the strict
    check and lets Spark union the schemas.
    """
    files = _sorted_files(path)
    if not mergeSchema:
        check_schema_agreement(files, expected=_sidecar_schema(path))
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

    - ``order_cols`` given: delegates to the ``_global_rank`` pattern —
      ``repartitionByRange`` + per-partition ``row_number`` + a
      broadcast prefix-sum offset map.  Never a single global
      ``Window.orderBy`` — that would serialize the corpus through one
      task.  Ties on ``order_cols`` get arbitrary (but stable within a
      run) relative indices, exactly as a window form would.
    - no ``order_cols``: preserves the current partition order with
      ZERO shuffle and zero Python in the row path:
      ``monotonically_increasing_id`` encodes (partition id << 33) |
      row-in-partition (documented Spark layout), so the per-partition
      row position and partition id are bit-field extractions; only the
      O(partitions) count aggregate is collected.  The input is
      persisted so the count pass and the output plan see the same
      partitioning.

    Everything stays JVM-side — the previous implementation round-
    tripped every row through ``df.rdd`` -> Python -> ``createDataFrame``.
    """
    if order_cols:
        from parquet_converters_spark.operators.indexing import _global_rank

        return _global_rank(df, list(order_cols), row_index_col)

    with_mid = df.withColumn(
        "_mid", F.monotonically_increasing_id()
    ).persist()
    pid = F.shiftright("_mid", 33)
    counts = {
        r["_pid"]: r["count"]
        for r in with_mid.groupBy(pid.alias("_pid")).count().collect()
    }
    offsets, base = {}, 0
    for i in sorted(counts):
        offsets[i] = base
        base += counts[i]
    offset_expr = F.create_map(
        *[F.lit(x) for i, off in sorted(offsets.items()) for x in (i, off)]
    )
    row_in_part = F.col("_mid").bitwiseAND((1 << 33) - 1)
    return with_mid.withColumn(
        row_index_col,
        (offset_expr[pid] + row_in_part).cast("long"),
    ).drop("_mid")
