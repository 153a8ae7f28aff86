"""Approximate sketches vs exact answers: the correctness gate is the
error bound (cross-engine hash comparison is impossible for sketch
state, so this replaces the DuckDB oracle for these operators)."""

from pyspark.sql import functions as F

from parquet_converters_spark.functions.sketches import (
    approx_distinct,
    approx_quantiles,
)


def test_approx_distinct_within_rsd(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    approx = {
        r["l_returnflag"]: r["approx_distinct"]
        for r in approx_distinct(li, "l_returnflag", "l_orderkey", rsd=0.02).collect()
    }
    exact = {
        r["l_returnflag"]: r["d"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("d"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, e in exact.items():
        assert abs(approx[k] - e) <= max(0.06 * e, 3), (k, approx[k], e)


def test_approx_quantiles_rank_error(spark, sf_dir):
    """percentile_approx's guarantee is on *rank*, not value: each
    reported quantile must sit within eps of the target rank in the
    sorted group."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    got = approx_quantiles(
        li, "l_linestatus", "l_extendedprice", (0.5, 0.9), accuracy=1000
    ).collect()
    vals = {
        r["l_linestatus"]: sorted(
            x["l_extendedprice"]
            for x in li.filter(F.col("l_linestatus") == r["l_linestatus"])
            .select("l_extendedprice")
            .collect()
        )
        for r in got
    }
    for r in got:
        data = vals[r["l_linestatus"]]
        n = len(data)
        for p, col in ((0.5, "q_50"), (0.9, "q_90")):
            import bisect

            rank = bisect.bisect_left(data, r[col])
            assert abs(rank / n - p) <= 0.01 + 1 / 1000, (r["l_linestatus"], p, rank / n)


def test_heavy_hitters_bounds(spark, sf_dir):
    """Misra-Gries top-k: reported counts are lower bounds within the
    N/capacity undercount, and every sufficiently-frequent token is
    found."""
    from pyspark.sql import functions as F

    from parquet_converters_spark.functions.sketches import heavy_hitters
    from parquet_converters_spark.functions.text import tokens

    toks = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.explode(tokens("text")).alias("token"))
    )
    n_total = toks.count()
    capacity = 256
    exact = {
        r["token"]: r["n"]
        for r in toks.groupBy("token").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    got = {
        r["item"]: r["min_count"]
        for r in heavy_hitters(toks, "token", k=20, capacity=capacity).collect()
    }
    assert got
    slack = n_total / capacity  # summed per-partition undercount bound
    for item, lo in got.items():
        assert lo <= exact[item] <= lo + slack, (item, lo, exact[item])
    # every token frequent beyond the bound must be reported
    top_true = sorted(exact.items(), key=lambda kv: -kv[1])[:5]
    for item, n in top_true:
        if n > slack:
            assert item in got, (item, n, slack)
