"""Salted join / two-stage aggregation: result parity with the plain
forms, plus the balance property that is the whole point — the hot
key's rows spread over n_salts sub-keys instead of one reducer."""

from pyspark.sql import functions as F


def _skewed(spark, n=50_000, hot_frac=0.9):
    """90% of rows share key 0; the rest spread over 1..99."""
    return spark.range(n).select(
        F.when(F.rand(7) < hot_frac, 0)
        .otherwise((F.rand(11) * 99 + 1).cast("long"))
        .alias("k"),
        (F.rand(13) * 100).alias("v"),
    )


def test_salted_join_matches_plain_join(spark):
    left = _skewed(spark)
    right = spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("dim_"), F.col("id")).alias("name")
    )
    from parquet_converters_spark.operators.skew import salted_join

    got = salted_join(left, right, "k", n_salts=8)
    want = left.join(right, "k")
    assert got.count() == want.count()
    g = got.groupBy("name").agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("v"), 3).alias("s"))
    w = want.groupBy("name").agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("v"), 3).alias("s"))
    assert sorted(map(tuple, g.collect())) == sorted(map(tuple, w.collect()))


def test_salting_spreads_hot_key(spark):
    """The hot key's rows must land in n_salts distinct sub-keys, each
    carrying well under the unsalted total."""
    left = _skewed(spark)
    n_salts = 8
    salted = left.withColumn("_salt", (F.rand(42) * n_salts).cast("int"))
    sizes = (
        salted.filter(F.col("k") == 0)
        .groupBy("_salt")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    total = sum(r["n"] for r in sizes)
    assert len(sizes) == n_salts
    assert max(r["n"] for r in sizes) < total * 0.25  # vs 1.0 unsalted


def test_two_stage_aggregate_matches_plain(spark):
    df = _skewed(spark)
    from parquet_converters_spark.operators.skew import two_stage_aggregate

    got = two_stage_aggregate(df, "k", "v", n_salts=8)
    want = df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("v").alias("value_sum")
    )
    gm = {r["k"]: (r["n_rows"], round(r["value_sum"], 6)) for r in got.collect()}
    wm = {r["k"]: (r["n_rows"], round(r["value_sum"], 6)) for r in want.collect()}
    assert gm == wm
