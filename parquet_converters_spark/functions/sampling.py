"""Deterministic sampling / splitting / packing for training-data
pipelines.

Everything here is *content-hash deterministic*, never RNG-based:
at 100 TB a split must be reproducible across engines, re-runs, and
partial re-processing of late-arriving shards — `rand()`-based
sampling gives a different answer per run and per partitioning, and
engine-native RNGs never agree cross-engine.  md5-derived hashes make
the DuckDB oracle (and any future engine) compute the identical split.
All three ops are narrow maps or single-window passes — nothing
shuffles except where stated.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from parquet_converters_spark.functions.dedup import h32


def hash_bucket(key: Column | str, buckets: int = 100) -> Column:
    """Stable bucket in [0, buckets) from the md5 of the key rendered as
    a string.  DuckDB equivalent:
    ``CAST(concat('0x', substr(md5(CAST(k AS VARCHAR)),1,8)) AS BIGINT) % buckets``."""
    c = F.col(key) if isinstance(key, str) else key
    return (h32(c.cast("string")) % buckets).cast("int")


def weighted_sample(
    df: DataFrame,
    key: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis-Spirakis A-Res): rank key ``u^(1/w)`` with
    ``u = (h32(key)+0.5) / 2^32`` — md5-derived, so every engine and
    every re-run draws the identical sample, and items with weight w
    appear with the A-Res inclusion guarantee.

    Adds ``sample_score``; returns the global top-``k`` by score.
    The top-k is a TakeOrderedAndProject (per-partition heaps + merge
    of k-row partials), never a full sort.
    """
    c = F.col(key)
    u = (h32(c.cast("string")) + F.lit(0.5)) / F.lit(float(1 << 32))
    score = F.pow(u, F.lit(1.0) / F.col(weight_col))
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("sample_score", score)
        .orderBy(F.col("sample_score").desc(), c.asc())
        .limit(k)
    )


def hash_split(
    df: DataFrame,
    key: str,
    splits: dict[str, int],
    split_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split by hash bucket — the
    train/val/test assignment a pipeline must keep stable as data grows
    (a given key never migrates between splits when more data arrives,
    unlike fraction-based ``randomSplit``).

    ``splits`` maps name -> percent; must sum to 100.  Assignment is a
    narrow map (no shuffle, no sampling pass).
    """
    if sum(splits.values()) != 100:
        raise ValueError(f"split percents must sum to 100, got {splits}")
    bucket = hash_bucket(key, 100)
    expr = None
    lo = 0
    for name, pct in splits.items():
        cond = (bucket >= lo) & (bucket < lo + pct)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo += pct
    return df.withColumn(split_col, expr)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    key: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    keep_col: str | None = None,
) -> DataFrame:
    """Deterministic per-stratum downsampling — the class-rebalancing
    step of a training pipeline (e.g. keep 50% of English, 10% of
    everything else).

    A row is kept when ``h32(key) % 1000 < round(frac*1000)`` — an
    *integer* threshold per stratum, so there is no float-comparison
    edge and every engine draws the identical sample.  Narrow map +
    filter, no shuffle, no sampling pre-pass (unlike
    ``df.sampleBy``, which is RNG-seeded per partition and not
    reproducible under repartitioning).

    With ``keep_col`` set, returns all rows plus a boolean column
    instead of filtering (for audit queries that count kept vs total).
    """
    c = F.col(strata_col)
    thresh = F.lit(int(round(default_fraction * 1000)))
    for value, frac in sorted(fractions.items()):
        thresh = F.when(c == value, int(round(frac * 1000))).otherwise(thresh)
    kept = (h32(F.col(key).cast("string")) % 1000) < thresh
    if keep_col is not None:
        return df.withColumn(keep_col, kept)
    return df.where(kept)


def per_group_cap(
    df: DataFrame,
    group_col: str,
    key: str,
    k: int,
) -> DataFrame:
    """At most ``k`` rows per group, chosen deterministically by md5
    hash rank (ties by key) — the per-domain/per-source document cap
    that keeps one crawl host from dominating a training mix.

    One shuffle on ``group_col`` + per-partition rank; with AQE skew
    handling on, a hot group splits across reducers only for the sort,
    and the rank filter drops the tail without materializing it.
    """
    w = Window.partitionBy(group_col).orderBy(
        h32(F.col(key).cast("string")), F.col(key)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the
    context-window preparation step of a training pipeline.

    One narrow pass: tokenize once, slide a ``chunk_tokens`` window
    advancing by ``chunk_tokens - overlap``, re-join each slice,
    posexplode to (id, chunk_idx, chunk_text, n_tokens) rows.  All
    array ops are JVM expression-tree (no Python in the row path);
    short documents yield a single chunk.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    from parquet_converters_spark.functions.text import bind, tokens

    def chunks(toks: Column) -> Column:
        n = F.size(toks)
        # start offsets 1, 1+step, 1+2*step, ... covering every token;
        # a doc with n <= chunk_tokens gets exactly one start
        last_start = F.greatest(
            F.lit(1),
            (F.ceil((n - F.lit(chunk_tokens)) / F.lit(step)) * step + 1).cast("int"),
        )
        starts = F.sequence(F.lit(1), last_start, F.lit(step))
        return F.transform(starts, lambda s: F.slice(toks, s, chunk_tokens))

    chunked = df.select(
        F.col(id_col),
        F.posexplode(bind(tokens(text_col), chunks)).alias("chunk_idx", "_toks"),
    )
    return chunked.select(
        id_col,
        "chunk_idx",
        F.array_join("_toks", " ").alias("chunk_text"),
        F.size("_toks").alias("n_tokens"),
    )


def _with_local_cumsum(df: DataFrame, sum_col: str, out_col: str) -> DataFrame:
    """Partition-local running sum of ``sum_col`` appended as ``out_col``
    (long), preserving row order.  One narrow Arrow pass: ``mapInArrow``
    hands each partition's batches to one Python worker sequentially, so
    a closure-local running total carries across batches — no shuffle,
    no per-row Python."""
    import pyarrow as pa
    from pyspark.sql.types import LongType, StructField, StructType

    # copy — StructType.add mutates the DataFrame's cached schema
    out_schema = StructType(
        list(df.schema.fields) + [StructField(out_col, LongType(), False)]
    )
    names = [f.name for f in df.schema] + [out_col]
    idx = df.schema.fieldNames().index(sum_col)

    def run(batches):
        total = 0
        for b in batches:
            s = b.column(idx).to_numpy(zero_copy_only=False)
            cum = s.astype("int64").cumsum() + total
            if len(cum):
                total = int(cum[-1])
            yield pa.RecordBatch.from_arrays(
                list(b.columns) + [pa.array(cum, type=pa.int64())],
                names=names,
            )

    return df.mapInArrow(run, out_schema)


def pack_sequences(
    df: DataFrame,
    token_count_col: str,
    id_col: str = "doc_id",
    budget: int = 512,
    partition_col: str | None = None,
) -> DataFrame:
    """Assign documents to fixed-token-budget training bins (sequence
    packing) with a deterministic order-based rule: documents in
    ``id_col`` order accumulate until the running token total crosses
    the budget, then a new bin starts.

    The globally-deterministic running sum is a *hierarchical* prefix
    sum, never a single global window: one ``repartitionByRange`` on
    ``id_col`` (deterministic boundaries — Spark's range sampler is
    seeded per partition index), a partition-local Arrow cumsum, a
    per-partition total aggregate (one row per partition), a tiny
    cumulative window over those totals for the carry-in, and a
    broadcast join back.  The same two-level shape as the adjacency
    index's global rank (`operators/indexing._global_rank`); a global
    ``Window.orderBy`` would serialize 100 TB through one task.

    With ``partition_col`` the packing is per-group (bins never span
    groups): every window is partitioned by the group, so the plan is
    embarrassingly parallel — this is the mode for per-source shard /
    compaction planning, and the scale default whenever a natural
    grouping exists.

    Output: (id, n_tokens, bin_id, bin-relative offset)
    [+ partition_col first when grouped].
    """
    if partition_col is not None:
        wg = Window.partitionBy(partition_col).orderBy(id_col).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        out = df.select(
            F.col(partition_col),
            F.col(id_col),
            F.col(token_count_col).alias("n_tokens"),
            F.sum(token_count_col).over(wg).alias("_cum"),
        ).withColumn(
            "bin_id", F.floor((F.col("_cum") - 1) / budget).cast("long")
        )
        wb = Window.partitionBy(partition_col, "bin_id").orderBy(id_col)
        return out.select(
            partition_col,
            id_col,
            "n_tokens",
            "bin_id",
            (F.sum("n_tokens").over(wb) - F.col("n_tokens")).alias(
                "bin_offset"
            ),
        )

    n = max(df.sparkSession.sparkContext.defaultParallelism, 1)
    base = (
        df.select(F.col(id_col), F.col(token_count_col).alias("n_tokens"))
        .repartitionByRange(n, id_col)
        .sortWithinPartitions(id_col)
        .withColumn("_pid", F.spark_partition_id())
    )
    local = _with_local_cumsum(base, "n_tokens", "_lcum")
    # one row per partition; the range exchange is reused across branches
    totals = base.groupBy("_pid").agg(F.sum("n_tokens").alias("_ptot"))
    w_p = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    carry = totals.select(
        "_pid", (F.sum("_ptot").over(w_p) - F.col("_ptot")).alias("_carry")
    )
    out = (
        local.join(F.broadcast(carry), "_pid")
        .withColumn("_cum", F.col("_carry") + F.col("_lcum"))
        .withColumn("bin_id", F.floor((F.col("_cum") - 1) / budget).cast("long"))
    )
    wb = Window.partitionBy("bin_id").orderBy(id_col)
    return out.select(
        id_col,
        "n_tokens",
        "bin_id",
        (F.sum("n_tokens").over(wb) - F.col("n_tokens")).alias("bin_offset"),
    )
