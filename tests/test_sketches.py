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
