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


def heavy_hitters(
    df: DataFrame,
    value_col: str,
    k: int = 20,
    capacity: int = 256,
) -> DataFrame:
    """Approximate top-k frequent items via distributed Misra-Gries.

    Per partition: a ``capacity``-counter Misra-Gries summary built in
    one Arrow-batched pass (``mapInPandas`` keeps a dict across the
    partition's batches — O(capacity) state regardless of partition
    size).  The per-partition summaries (≤ partitions × capacity tiny
    rows) are then summed by item and the top ``k`` taken.

    Guarantees (classical MG, summed over P partitions): reported
    counts are lower bounds, undercounting each item by at most
    Σ_p N_p / capacity ≤ N / capacity; every item with true frequency
    > N / capacity survives into the merge.  Exact wordcount shuffles
    every distinct item; this shuffles ≤ P × capacity rows — the
    100 TB trade.  Output: (item, min_count) ordered desc, count ≤ k.
    """
    from typing import Iterator

    import pandas as pd

    src = df.select(F.col(value_col).cast("string").alias("item"))

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for item in pdf["item"]:
                if item is None:
                    continue
                if item in counters:
                    counters[item] += 1
                elif len(counters) < capacity:
                    counters[item] = 1
                else:
                    # decrement-all step, dropping zeroed counters
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame(
            {"item": list(counters), "min_count": list(counters.values())}
        )

    merged = (
        src.mapInPandas(mg, schema="item string, min_count long")
        .groupBy("item")
        .agg(F.sum("min_count").alias("min_count"))
    )
    return merged.orderBy(F.col("min_count").desc(), "item").limit(k)


def cms_build(
    df: DataFrame,
    value_col: str,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Count-Min sketch as a DataFrame: ``depth × width`` counters,
    built with one explode + one hash aggregate (map-side partials make
    the shuffle O(depth·width) per task, independent of row count).

    The sketch is *mergeable by construction*: union two sketch tables
    and re-aggregate ``sum(cnt)`` — the distributive property every
    100 TB rollup (daily → monthly) needs.  Output: (d, bucket, cnt).
    """
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        F.pmod(
                            F.xxhash64(F.lit(d), F.col(value_col)), F.lit(width)
                        ).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("cell")
    ).select("cell.d", "cell.bucket")
    return rows.groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge Count-Min sketches built with the same (width, depth):
    cell-wise sum."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    value_col: str,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Point-frequency estimates for ``probes[value_col]`` against a
    sketch table: min over the sketch's ``depth`` counters.  The sketch
    (≤ depth·width rows) broadcasts; estimates never under-count and
    over-count by ≤ e/width · N with prob. 1 - e^-depth (Cormode &
    Muthukrishnan 2005)."""
    cells = probes.select(
        F.col(value_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        F.pmod(
                            F.xxhash64(F.lit(d), F.col(value_col)), F.lit(width)
                        ).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("cell"),
    ).select(value_col, "cell.d", "cell.bucket")
    return (
        cells.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(value_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )
