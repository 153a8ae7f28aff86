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


def test_aqe_splits_skewed_join_partition(spark, tmp_path):
    """AQE's runtime skew-join handling is the engine's last line of
    defense when a hot key sneaks past manual salting: with skew
    thresholds scaled to fixture size, the executed plan must show the
    sort-merge join marked skew=true (the hot partition split into
    sub-partitions) — the property we rely on at 100 TB."""
    left_path = str(tmp_path / "skew_left")
    right_path = str(tmp_path / "skew_right")
    _skewed(spark, n=200_000, hot_frac=0.95).write.parquet(left_path)
    spark.range(100).select(
        F.col("id").alias("k"),
        F.concat(F.lit("dim_"), F.col("id")).alias("name"),
    ).write.parquet(right_path)

    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        # force SMJ (no broadcast) and scale skew detection to ~MB data
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "64KB",
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        # sum(v) keeps the incompressible value column in the left
        # shuffle — with only k (95% zeros) the hot partition compresses
        # below any realistic skew threshold and nothing splits
        joined = (
            spark.read.parquet(left_path)
            .join(spark.read.parquet(right_path), "k")
            .groupBy("name")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        )
        # collect() (not count()) so THIS DataFrame's own adaptive plan
        # executes and finalizes — count() derives a separate execution
        assert len(joined.collect()) == 100
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            conf.set(k, v)
