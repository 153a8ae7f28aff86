"""SONATA adjacency index builder (reference operators G1-G6, A2-A3).

The reference builds, for each direction (keyed by ``source_node_id`` then
``target_node_id``, ``src/index/index.cpp:309-324``), a two-level index
over the edge table's *global row order*:

- ``range_to_edge_id[r] = (edge_start, edge_end)`` — maximal runs of
  consecutive rows sharing the key (run-length grouping,
  ``index.cpp:114-137``), globally numbered node-major then start-ascending
  (sort ``:205-206``, all-to-all shuffle ``:215-249``, per-node re-merge
  ``:142-153``, prefix-sum placement ``:272-280``);
- ``node_id_to_ranges[node] = (range_lo, range_hi)`` — dense over
  ``[0, node_count)``, absent nodes get ``(0, 0)``
  (``index.cpp:282-299``).

Spark-first translation:

- run-length grouping is one gaps-and-islands window *partitioned by
  node* (each node's rows are seen together, so runs are maximal by
  construction — this fuses the reference's G1 local pass and G4
  post-shuffle re-merge into a single operator);
- global range numbering avoids a single-partition global window: ranges
  are range-repartitioned and sorted by (node_id, range_start), then
  numbered with the two-pass partition-offset pattern (per-partition
  counts -> driver prefix sum -> broadcast add), the exact Spark analogue
  of the reference's Allgather prefix sum (``index.cpp:272-280``);
- densification is ``spark.range(node_count)`` left-joined with the
  per-node aggregate (the reference's only join, ``index.cpp:282-299``).

Everything stays in DataFrame land: two shuffles per direction (one for
the island window, one for the range repartition), no Python in the row
path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def _global_rank(df: DataFrame, sort_cols: list[str], out_col: str,
                 num_partitions: int | None = None) -> DataFrame:
    """Dense global 0-based rank over ``sort_cols`` without a
    single-partition window: repartitionByRange + per-partition
    row_number + driver-side prefix sum over per-partition counts."""
    spark = df.sparkSession
    parts = num_partitions or spark.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(parts, *sort_cols)
    # persist: the count pass and the final plan must see the *same*
    # range-partitioning (its boundaries come from sampling)
    with_pid = ranged.withColumn("_pid", F.spark_partition_id()).persist()
    counts = {
        r["_pid"]: r["count"]
        for r in with_pid.groupBy("_pid").count().collect()
    }
    offsets, base = {}, 0
    for pid in sorted(counts):
        offsets[pid] = base
        base += counts[pid]
    offset_expr = F.create_map(
        *[F.lit(x) for pid, off in sorted(offsets.items()) for x in (pid, off)]
    )
    w = Window.partitionBy("_pid").orderBy(*sort_cols)
    return (
        with_pid.withColumn(
            out_col,
            (offset_expr[F.col("_pid")] + F.row_number().over(w) - 1).cast("long"),
        )
        .drop("_pid")
    )


def run_length_ranges(df: DataFrame, key: str, row_col: str) -> DataFrame:
    """G1+G4: maximal runs of consecutive ``row_col`` values sharing
    ``key`` -> (node_id, range_start, range_end) with end exclusive."""
    w = Window.partitionBy("node_id").orderBy("_pos")
    return (
        df.select(F.col(key).alias("node_id"), F.col(row_col).alias("_pos"))
        .withColumn("_island", F.col("_pos") - F.row_number().over(w))
        .groupBy("node_id", "_island")
        .agg(
            F.min("_pos").alias("range_start"),
            (F.max("_pos") + F.lit(1)).alias("range_end"),
        )
        .drop("_island")
    )


def run_length_ranges_scan(
    df: DataFrame,
    key: str,
    row_col: str,
    assume_scan_order: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """G1+G4 the reference's way: *local* run-length encoding per
    partition followed by a boundary fix-up — no full-data shuffle.

    The window form (:func:`run_length_ranges`) shuffles every row by
    ``key``; at 100 TB that exchange dominates the job.  The reference
    instead RLE-compresses each rank's contiguous slice locally and
    exchanges only the ranges (``index.cpp:114-137`` local pass,
    ``:142-153`` post-shuffle re-merge).  This is the Spark analogue:

    1. ensure partitions hold contiguous ``row_col`` slices —
       free when the input comes straight off an ordered scan
       (``assume_scan_order=True``, e.g. `sources.ordering`), else one
       ``repartitionByRange``;
    2. vectorized RLE inside each partition (``mapInArrow``; numpy
       diff over raw Arrow batches — no pandas materialization — with
       the run carry crossing batch boundaries); output is
       (node_id, range_start, range_end, _edge) where ``_edge`` marks
       each partition's first/last run;
    3. fix-up: non-edge runs are maximal already (within a partition
       the RLE merges everything mergeable); only the ≤2-per-partition
       edge runs can continue across a boundary.  They are collected
       (tiny), chain-merged on the driver, and unioned back.
    """
    spark = df.sparkSession
    node_t = dict(df.dtypes)[key]
    out_schema = f"node_id {node_t}, range_start long, range_end long, _edge int"

    src = df.select(F.col(key).alias("node_id"), F.col(row_col).alias("_pos"))
    if not assume_scan_order:
        parts = num_partitions or spark.sparkContext.defaultParallelism
        src = src.repartitionByRange(parts, "_pos")
    src = src.sortWithinPartitions("_pos")

    def rle(batches):
        import numpy as np
        import pyarrow as pa

        nodes_parts, pos_parts = [], []
        for rb in batches:
            if rb.num_rows:
                nodes_parts.append(rb.column(0))
                pos_parts.append(rb.column(1))
        if not nodes_parts:
            return
        nodes_arr = pa.concat_arrays(
            [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in nodes_parts]
        )
        pos = pa.concat_arrays(
            [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in pos_parts]
        ).to_numpy()
        # dictionary-encode strings so the comparison is integer-wide
        if pa.types.is_string(nodes_arr.type) or pa.types.is_large_string(nodes_arr.type):
            dict_arr = nodes_arr.dictionary_encode()
            node_codes = dict_arr.indices.to_numpy(zero_copy_only=False)
        else:
            dict_arr = None
            node_codes = nodes_arr.to_numpy(zero_copy_only=False)
        # run starts: node changes or position gaps
        brk = np.flatnonzero(
            (node_codes[1:] != node_codes[:-1]) | (pos[1:] != pos[:-1] + 1)
        )
        starts = np.concatenate(([0], brk + 1))
        ends = np.concatenate((brk, [len(pos) - 1]))
        n = len(starts)
        edge = np.zeros(n, dtype="int32")
        edge[0] = 1
        edge[-1] = 1
        yield pa.RecordBatch.from_arrays(
            [
                nodes_arr.take(pa.array(starts)),
                pa.array(pos[starts], type=pa.int64()),
                pa.array(pos[ends] + 1, type=pa.int64()),
                pa.array(edge, type=pa.int32()),
            ],
            names=["node_id", "range_start", "range_end", "_edge"],
        )

    # persist: the edge-run collect and the interior filter must see the
    # SAME partitioning (repartitionByRange boundaries come from
    # sampling, so re-execution could split runs differently)
    runs = src.mapInArrow(rle, schema=out_schema).persist()
    interior = runs.filter(F.col("_edge") == 0).drop("_edge")

    # chain-merge the partition-boundary runs (≤ 2 per partition)
    edge_rows = sorted(
        runs.filter(F.col("_edge") == 1).drop("_edge").collect(),
        key=lambda r: r["range_start"],
    )
    merged: list[tuple] = []
    for r in edge_rows:
        if (
            merged
            and merged[-1][0] == r["node_id"]
            and merged[-1][2] == r["range_start"]
        ):
            merged[-1] = (merged[-1][0], merged[-1][1], r["range_end"])
        else:
            merged.append((r["node_id"], r["range_start"], r["range_end"]))
    edge_df = spark.createDataFrame(
        merged, schema=f"node_id {node_t}, range_start long, range_end long"
    )
    return interior.unionByName(edge_df)


def infer_node_count(df: DataFrame, key: str) -> int:
    """A2: ``max(node_id) + 1`` when no population size metadata exists
    (``index.cpp:208-213``)."""
    m = df.agg(F.max(F.col(key)).alias("m")).first()["m"]
    return int(m) + 1 if m is not None else 0


def build_adjacency_index(
    df: DataFrame,
    key: str,
    node_count: int | None = None,
    row_col: str = "row_index",
    method: str = "window",
) -> tuple[DataFrame, DataFrame]:
    """Build one direction of the adjacency index.

    Returns ``(node_id_to_ranges, range_to_edge_id)``:

    - ``node_id_to_ranges``: node_id, range_lo, range_hi — dense over
      [0, node_count), (0,0) when the node has no edges;
    - ``range_to_edge_id``: range_id, edge_start, edge_end — ordered
      node-major, start-ascending.

    ``method``: ``"window"`` (gaps-and-islands, shuffles rows by node
    twice) or ``"scan"`` (local RLE + boundary fix-up, one narrow
    2-column range-exchange — the reference's architecture, preferred
    at scale).
    """
    spark = df.sparkSession
    if node_count is None:
        node_count = infer_node_count(df, key)

    if method == "scan":
        ranges = run_length_ranges_scan(df, key, row_col)
    else:
        ranges = run_length_ranges(df, key, row_col)
    numbered = _global_rank(ranges, ["node_id", "range_start"], "range_id")

    range_to_edge_id = numbered.select(
        "range_id",
        F.col("range_start").alias("edge_start"),
        F.col("range_end").alias("edge_end"),
    )

    per_node = numbered.groupBy("node_id").agg(
        F.min("range_id").alias("range_lo"),
        (F.max("range_id") + F.lit(1)).alias("range_hi"),
    )
    node_id_to_ranges = (
        spark.range(node_count)
        .withColumnRenamed("id", "node_id")
        .join(per_node, "node_id", "left")
        .na.fill({"range_lo": 0, "range_hi": 0})
        .select("node_id", "range_lo", "range_hi")
    )
    return node_id_to_ranges, range_to_edge_id


def build_sonata_indices(
    df: DataFrame,
    source_node_count: int | None = None,
    target_node_count: int | None = None,
    row_col: str = "row_index",
    method: str = "scan",
) -> dict[str, tuple[DataFrame, DataFrame]]:
    """G6: both index directions, as written under
    ``indices/{source_to_target,target_to_source}``
    (``index.cpp:24-31,309-324``).  Defaults to the scan-order RLE
    (the scale path; see :func:`build_adjacency_index`)."""
    return {
        "source_to_target": build_adjacency_index(
            df, "source_node_id", source_node_count, row_col, method
        ),
        "target_to_source": build_adjacency_index(
            df, "target_node_id", target_node_count, row_col, method
        ),
    }
