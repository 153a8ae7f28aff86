"""Count-Min sketch: no under-counting, bounded over-counting,
mergeability."""

import pytest
from pyspark.sql import functions as F

from parquet_converters_spark.functions.sketches import (
    cms_build,
    cms_estimate,
    cms_merge,
)

WIDTH, DEPTH = 512, 4


@pytest.fixture(scope="module")
def skewed(spark):
    # zipf-ish: value v appears ~ 2000/(v+1) times
    rows = [(v,) for v in range(100) for _ in range(2000 // (v + 1))]
    return spark.createDataFrame(rows, ["v"])


def test_cms_never_undercounts(spark, skewed):
    sketch = cms_build(skewed, "v", WIDTH, DEPTH)
    truth = {r.v: r.n for r in skewed.groupBy("v").agg(F.count("*").alias("n")).collect()}
    probes = skewed.select("v").distinct()
    est = {r.v: r.est for r in cms_estimate(sketch, probes, "v", WIDTH, DEPTH).collect()}
    for v, n in truth.items():
        assert est[v] >= n, f"undercount for {v}"


def test_cms_overcount_bounded(spark, skewed):
    sketch = cms_build(skewed, "v", WIDTH, DEPTH)
    n_total = skewed.count()
    probes = skewed.select("v").distinct()
    est = {r.v: r.est for r in cms_estimate(sketch, probes, "v", WIDTH, DEPTH).collect()}
    truth = {r.v: r.n for r in skewed.groupBy("v").agg(F.count("*").alias("n")).collect()}
    # CMS bound: err <= e/width * N w.h.p.; allow 2x slack for the tiny width
    bound = 2 * 2.72 / WIDTH * n_total
    bad = [v for v in truth if est[v] - truth[v] > bound]
    assert len(bad) <= 2, f"overcounts beyond bound: {bad}"


def test_cms_absent_value_estimates_near_zero(spark, skewed):
    sketch = cms_build(skewed, "v", WIDTH, DEPTH)
    probes = spark.createDataFrame([(10_000,)], ["v"])
    est = cms_estimate(sketch, probes, "v", WIDTH, DEPTH).collect()[0].est
    assert est <= 2.72 / WIDTH * skewed.count() * 2


def test_cms_merge_equals_union_build(spark):
    a = spark.createDataFrame([(v % 50,) for v in range(1000)], ["v"])
    b = spark.createDataFrame([(v % 30,) for v in range(600)], ["v"])
    merged = cms_merge(
        cms_build(a, "v", WIDTH, DEPTH), cms_build(b, "v", WIDTH, DEPTH)
    )
    direct = cms_build(a.unionByName(b), "v", WIDTH, DEPTH)
    got = {(r.d, r.bucket): r.cnt for r in merged.collect()}
    want = {(r.d, r.bucket): r.cnt for r in direct.collect()}
    assert got == want


def test_cms_sketch_size_fixed(spark, skewed):
    sketch = cms_build(skewed, "v", WIDTH, DEPTH)
    assert sketch.count() <= WIDTH * DEPTH
