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
) -> tuple[DataFrame, DataFrame]:
    """Build one direction of the adjacency index.

    Returns ``(node_id_to_ranges, range_to_edge_id)``:

    - ``node_id_to_ranges``: node_id, range_lo, range_hi — dense over
      [0, node_count), (0,0) when the node has no edges;
    - ``range_to_edge_id``: range_id, edge_start, edge_end — ordered
      node-major, start-ascending.
    """
    spark = df.sparkSession
    if node_count is None:
        node_count = infer_node_count(df, key)

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
) -> dict[str, tuple[DataFrame, DataFrame]]:
    """G6: both index directions, as written under
    ``indices/{source_to_target,target_to_source}``
    (``index.cpp:24-31,309-324``)."""
    return {
        "source_to_target": build_adjacency_index(
            df, "source_node_id", source_node_count, row_col
        ),
        "target_to_source": build_adjacency_index(
            df, "target_node_id", target_node_count, row_col
        ),
    }
