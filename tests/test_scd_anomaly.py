"""SCD2 history, latest-wins compaction, z-score outliers, weighted
sampling."""

import math

import pytest
from pyspark.sql import functions as F

from parquet_converters_spark.functions.anomaly import group_stats, zscore_outliers
from parquet_converters_spark.functions.sampling import weighted_sample
from parquet_converters_spark.operators.scd import latest_snapshot, scd2_history


@pytest.fixture(scope="module")
def changes(spark):
    rows = [
        # (key, ts, seq, val)
        (1, 10, 100, "a"),
        (1, 20, 101, "b"),
        (1, 20, 102, "c"),  # same ts -> tiebreak on seq
        (2, 5, 103, "x"),
    ]
    return spark.createDataFrame(rows, ["k", "ts", "seq", "val"])


def test_scd2_intervals(changes):
    got = {
        (r.k, r.version): (r.effective_from, r.effective_to, r.is_current)
        for r in scd2_history(changes, ["k"], "ts", "seq").collect()
    }
    assert got[(1, 1)] == (10, 20, False)
    assert got[(1, 2)] == (20, 20, False)   # tiebreak: seq 101 before 102
    assert got[(1, 3)] == (20, None, True)
    assert got[(2, 1)] == (5, None, True)


def test_scd2_intervals_abut(changes):
    """Consecutive versions abut: effective_to(v) == effective_from(v+1)."""
    rows = scd2_history(changes, ["k"], "ts", "seq").collect()
    by_key = {}
    for r in sorted(rows, key=lambda r: (r.k, r.version)):
        by_key.setdefault(r.k, []).append(r)
    for vs in by_key.values():
        for a, b in zip(vs, vs[1:]):
            assert a.effective_to == b.effective_from
        assert vs[-1].is_current


def test_latest_snapshot(changes):
    got = {r.k: (r.val, r.seq) for r in latest_snapshot(changes, ["k"], "ts", "seq").collect()}
    assert got == {1: ("c", 102), 2: ("x", 103)}


def test_group_stats_matches_numpy(spark):
    import numpy as np

    vals = [1.0, 2.0, 3.0, 4.0, 100.0]
    df = spark.createDataFrame([("g", v) for v in vals], ["g", "v"])
    r = group_stats(df, "g", "v").collect()[0]
    assert r.n == 5
    assert r.mean == pytest.approx(np.mean(vals))
    assert r.std == pytest.approx(np.std(vals, ddof=1))


def test_zscore_outliers_flags_the_spike(spark):
    rows = [("g", float(i % 7)) for i in range(200)] + [("g", 500.0)]
    df = spark.createDataFrame(
        [(i, g, v) for i, (g, v) in enumerate(rows)], ["id", "g", "v"]
    )
    out = zscore_outliers(df, "g", "v", 3.0).collect()
    assert len(out) == 1 and out[0].v == 500.0 and out[0].z > 3.0


def test_zscore_constant_group_yields_nothing(spark):
    df = spark.createDataFrame([(i, "g", 7.0) for i in range(10)], ["id", "g", "v"])
    assert zscore_outliers(df, "g", "v").count() == 0


def test_weighted_sample_deterministic_and_biased(spark):
    df = spark.createDataFrame(
        [(i, 1.0 if i < 900 else 1000.0) for i in range(1000)], ["id", "w"]
    )
    a = [r.id for r in weighted_sample(df, "id", "w", 100).collect()]
    b = [r.id for r in weighted_sample(df, "id", "w", 100).collect()]
    assert a == b  # reproducible
    heavy = sum(1 for i in a if i >= 900)
    # 100 heavy items with 1000x weight must dominate the sample
    assert heavy > 80


def test_weighted_sample_score_formula(spark):
    df = spark.createDataFrame([(5, 2.0)], ["id", "w"])
    r = weighted_sample(df, "id", "w", 1).collect()[0]
    import hashlib

    h = int(hashlib.md5(b"5").hexdigest()[:8], 16)
    u = (h + 0.5) / 2**32
    assert r.sample_score == pytest.approx(math.pow(u, 0.5))


def test_winsorize_clips_to_group_quantiles(spark):
    from parquet_converters_spark.functions.anomaly import winsorize

    # group g: 1..100; p05 = 5.95, p95 = 95.05 (linear interpolation).
    # exact=True: this test asserts exact interpolated quantiles, and
    # createDataFrame frames are LogicalRDD (unknown size) so the
    # auto-gate would route them to approx (see test below).
    df = spark.createDataFrame(
        [(i, "g", float(i)) for i in range(1, 101)], ["id", "g", "v"]
    )
    w = winsorize(df, "g", "v", 0.05, 0.95, exact=True).collect()
    lo = 1 + 0.05 * 99
    hi = 1 + 0.95 * 99
    for r in w:
        assert lo <= r.clipped <= hi
        assert r.clipped_lo == (r.v < lo)
        assert r.clipped_hi == (r.v > hi)
    inner = [r for r in w if lo <= r.v <= hi]
    assert all(r.clipped == r.v for r in inner)
    assert sum(r.clipped_lo for r in w) == 5 and sum(r.clipped_hi for r in w) == 5


def test_winsorize_auto_gate_routes_inmemory_frames_to_approx(spark):
    """Pin the auto-gate behavior the r08 change introduced: a PySpark
    ``createDataFrame`` frame is an RDD-backed LogicalRDD whose plan
    stats report the ``spark.sql.defaultSizeInBytes`` sentinel
    (Long.MaxValue), NOT a sized LocalRelation — so ``exact=None``
    must route it to the bounded-memory ``approx_percentile`` path
    (unknown size == potentially unbounded == the safe direction)."""
    from parquet_converters_spark.functions.anomaly import (
        _UNKNOWN_SIZE,
        _winsorize_gate_exact,
        winsorize,
    )

    df = spark.createDataFrame(
        [(i, "g", float(i)) for i in range(1, 101)], ["id", "g", "v"]
    )
    # The premise: in-memory frames report the unknown-size sentinel.
    size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    assert size == _UNKNOWN_SIZE
    assert _winsorize_gate_exact(size) is False
    # And the observable consequence: the auto-gated plan aggregates
    # with approx_percentile, the explicit exact=True plan with
    # percentile.
    auto_plan = winsorize(df, "g", "v", 0.05, 0.95)._jdf.queryExecution(
    ).optimizedPlan().toString()
    exact_plan = winsorize(df, "g", "v", 0.05, 0.95, exact=True)._jdf\
        .queryExecution().optimizedPlan().toString()
    assert "approx_percentile" in auto_plan
    assert "approx_percentile" not in exact_plan
    assert "percentile" in exact_plan
