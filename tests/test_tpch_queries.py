"""Semantic tests for the TPC-H-completion + temporal-join surface
(queries_tpch.py).  The DuckDB hash oracle is exercised separately by
scripts/check_oracle_parity.py; these tests pin the *semantics* with
independent in-Python recomputation on small data."""

import pytest
from pyspark.sql import functions as F

from parquet_converters_spark.queries import _events
from parquet_converters_spark.queries_tpch import (
    asof_join_last_view,
    band_join_conversions,
    cube_pricing,
    q13_order_distribution,
    q15_top_supplier,
    q21_dominant_supplier,
)


def test_asof_matches_naive(spark, sf_dir):
    """Window-based as-of join == brute-force per-purchase max(view.ts <= p.ts)."""
    out = {
        r["purchase_event_id"]: (r["view_event_id"], r["view_ts_us"])
        for r in asof_join_last_view(spark, sf_dir).collect()
    }
    ev = _events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("us")
    ).collect()
    views = {}
    for r in ev:
        if r["event_type"] == "view":
            views.setdefault(r["user_id"], []).append((r["us"], r["event_id"]))
    for v in views.values():
        v.sort()
    expected = {}
    for r in ev:
        if r["event_type"] != "purchase":
            continue
        cands = [(us, eid) for us, eid in views.get(r["user_id"], []) if us <= r["us"]]
        if cands:
            us, eid = max(cands)
            expected[r["event_id"]] = (eid, us)
    assert out == expected


def test_band_join_gap_bounds(spark, sf_dir):
    rows = band_join_conversions(spark, sf_dir).collect()
    assert rows, "band join should find conversions"
    for r in rows:
        assert 0 < r["min_gap_us"] <= r["max_gap_us"] <= 1_800_000_000
        assert r["n_conversions"] >= 1


def test_cube_consistency(spark, sf_dir):
    rows = cube_pricing(spark, sf_dir).collect()
    total = [r for r in rows if r["gid"] == 3]
    assert len(total) == 1 and total[0]["returnflag"] == "ALL"
    n_all = total[0]["n_rows"]
    # each grouping level partitions the same row set
    for gid in (0, 1, 2):
        level = [r for r in rows if r["gid"] == gid]
        assert sum(r["n_rows"] for r in level) == n_all
        assert sum(r["sum_qty"] for r in level) == pytest.approx(total[0]["sum_qty"])


def test_q13_includes_zero_order_customers(spark, sf_dir):
    rows = q13_order_distribution(spark, sf_dir).collect()
    n_cust = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    assert sum(r["custdist"] for r in rows) == n_cust


def test_q15_is_argmax(spark, sf_dir):
    rows = q15_top_supplier(spark, sf_dir).collect()
    assert len(rows) >= 1
    revs = {r["s_suppkey"]: r["total_revenue"] for r in rows}
    assert len(set(revs.values())) == 1  # all tied at the max


def test_q21_unique_dominant(spark, sf_dir):
    """A dominant supplier win requires >=2 suppliers on the order and a
    strict max — verify via a direct recomputation at sf0.001."""
    out = {r["s_suppkey"]: r["numwait"] for r in q21_dominant_supplier(spark, sf_dir).collect()}
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey", "l_quantity"
    ).collect()
    per = {}
    for r in li:
        key = (r["l_orderkey"], r["l_suppkey"])
        per[key] = per.get(key, 0.0) + r["l_quantity"]
    by_order = {}
    for (ok, sk), q in per.items():
        by_order.setdefault(ok, []).append((q, sk))
    wins = {}
    for ok, lst in by_order.items():
        if len(lst) < 2:
            continue
        mx = max(q for q, _ in lst)
        at_max = [sk for q, sk in lst if q == mx]
        if len(at_max) == 1:
            wins[at_max[0]] = wins.get(at_max[0], 0) + 1
    top = sorted(wins.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert out == dict(top)
