"""Deterministic sampling/chunking/packing (functions/sampling.py)."""

import pytest
from pyspark.sql import functions as F

from parquet_converters_spark.functions.sampling import (
    chunk_documents,
    hash_split,
    pack_sequences,
)


def test_hash_split_stable_under_growth(spark):
    """A key's split assignment must not change when more data arrives
    — the property that makes the split safe to recompute per shard."""
    small = spark.range(100).withColumnRenamed("id", "k")
    big = spark.range(1000).withColumnRenamed("id", "k")
    splits = {"train": 80, "val": 10, "test": 10}
    a = {r["k"]: r["split"] for r in hash_split(small, "k", splits).collect()}
    b = {r["k"]: r["split"] for r in hash_split(big, "k", splits).collect()}
    assert all(b[k] == v for k, v in a.items())
    # rough proportions on the larger set
    from collections import Counter

    c = Counter(b.values())
    assert 700 < c["train"] < 900 and c["val"] > 30 and c["test"] > 30
    with pytest.raises(ValueError, match="sum to 100"):
        hash_split(small, "k", {"train": 90})


def test_chunking_covers_every_token(spark):
    """Chunks must cover the whole document in order, with the declared
    overlap between consecutive chunks and a final short chunk."""
    n_tok, chunk, overlap = 150, 64, 8
    text = " ".join(f"tok{i}" for i in range(n_tok))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect(),
        key=lambda r: r["chunk_idx"],
    )
    step = chunk - overlap
    seen = []
    for i, r in enumerate(rows):
        toks = r["chunk_text"].split(" ")
        assert toks[0] == f"tok{i * step}"
        assert r["n_tokens"] == len(toks) <= chunk
        seen.extend(toks[overlap:] if i else toks)
    # every token appears, in order, once past the overlaps
    assert seen == [f"tok{i}" for i in range(n_tok)]


def test_chunking_short_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "just a few tokens"), (2, "")], "doc_id long, text string"
    )
    out = {(r["doc_id"], r["chunk_idx"]): r for r in chunk_documents(df).collect()}
    assert out[(1, 0)]["n_tokens"] == 4 and len(out) == 2
    assert out[(2, 0)]["n_tokens"] == 0


def test_packing_respects_budget_boundaries(spark):
    """Bins change exactly when the running total crosses the budget;
    offsets are cumulative within each bin."""
    rows = [(i, 200) for i in range(10)]  # 200 tokens each, budget 512
    df = spark.createDataFrame(rows, "doc_id long, n long")
    out = sorted(pack_sequences(df, "n", budget=512).collect(),
                 key=lambda r: r["doc_id"])
    # cum: 200..2000 -> floor((cum-1)/512) = 0,0,1,1,1,2,2,3,3,3
    assert [r["bin_id"] for r in out] == [0, 0, 1, 1, 1, 2, 2, 3, 3, 3]
    assert [r["bin_offset"] for r in out] == [0, 200, 0, 200, 400, 0, 200, 0, 200, 400]


def test_packing_hierarchical_matches_global_window(spark):
    """The two-level prefix sum (range shuffle + Arrow local cumsum +
    broadcast carry) must reproduce the single-global-window packing
    bit-for-bit on irregular sizes spanning many partitions."""
    from pyspark.sql.window import Window

    rows = [(i, (i * 37) % 300 + 1) for i in range(5000)]
    df = spark.createDataFrame(rows, "doc_id long, n int").repartition(16)
    got = {
        r["doc_id"]: (r["bin_id"], r["bin_offset"], r["n_tokens"])
        for r in pack_sequences(df, "n", budget=512).collect()
    }
    w = Window.orderBy("doc_id")
    wb = Window.partitionBy("bin_id").orderBy("doc_id")
    ref = (
        df.withColumn("_cum", F.sum("n").over(w))
        .withColumn("bin_id", F.floor((F.col("_cum") - 1) / 512).cast("long"))
        .withColumn("bin_offset", F.sum("n").over(wb) - F.col("n"))
    )
    want = {
        r["doc_id"]: (r["bin_id"], r["bin_offset"], r["n"])
        for r in ref.collect()
    }
    assert got == want


def test_packing_plan_has_no_global_data_window(spark):
    """The row-level cumsum must be the Arrow two-level pass, not a
    Window.orderBy over the data (which would serialize 100 TB through
    one task).  The only unpartitioned window allowed is the carry
    aggregate over one row per partition."""
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), F.lit(10).alias("n")
    )
    plan = pack_sequences(df, "n", budget=64)._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" in plan  # local cumsum is the narrow Arrow pass


def test_per_group_cap_deterministic(spark, sf_dir):
    from parquet_converters_spark.functions.sampling import per_group_cap

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = per_group_cap(docs, "source", "doc_id", 5)
    b = per_group_cap(docs, "source", "doc_id", 5)
    ids_a = sorted(r.doc_id for r in a.select("doc_id").collect())
    ids_b = sorted(r.doc_id for r in b.select("doc_id").collect())
    assert ids_a == ids_b
    from pyspark.sql import functions as F

    per = a.groupBy("source").count().collect()
    assert all(r["count"] <= 5 for r in per)
    # groups with >= 5 docs are capped exactly at 5
    totals = {r.source: r["count"] for r in docs.groupBy("source").count().collect()}
    got = {r.source: r["count"] for r in per}
    for s, t in totals.items():
        assert got[s] == min(t, 5)


def test_packing_property_matches_python_replica(spark):
    """Hypothesis property: for random size sequences the distributed
    two-level packing equals a plain sequential cumsum replica — bin
    assignment, and per-bin offsets, both modes."""
    from hypothesis import given, settings, strategies as st

    def replica(sizes, budget):
        out, cum, bins = [], 0, {}
        for i, n in enumerate(sizes):
            cum += n
            b = (cum - 1) // budget
            off = bins.get(b, 0)
            out.append((i, n, b, off))
            bins[b] = off + n
        return out

    @settings(max_examples=8, deadline=None)
    @given(
        sizes=st.lists(
            st.integers(min_value=1, max_value=900), min_size=1, max_size=80
        )
    )
    def check(sizes):
        df = spark.createDataFrame(
            [(i, n) for i, n in enumerate(sizes)], "doc_id long, n long"
        ).repartition(7)
        got = sorted(
            (r["doc_id"], r["n_tokens"], r["bin_id"], r["bin_offset"])
            for r in pack_sequences(df, "n", budget=512).collect()
        )
        assert got == replica(sizes, 512)

    check()
