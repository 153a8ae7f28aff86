"""Calendar resampling + forward fill (operators/timeseries.py)."""

from datetime import datetime

from pyspark.sql import functions as F

from parquet_converters_spark.operators.timeseries import resample_ffill


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "k string, ts timestamp, v double, eid long"
    )


def test_ffill_fills_gaps_and_flags_them(spark):
    rows = [
        ("a", datetime(2024, 1, 1, 9), 1.0, 1),
        ("a", datetime(2024, 1, 1, 17), 2.0, 2),  # later same day wins
        ("a", datetime(2024, 1, 4, 8), 7.0, 3),   # 2-day gap before
        ("b", datetime(2024, 1, 2, 0), 5.0, 4),   # single-day key
    ]
    out = resample_ffill(_df(spark, rows), "k", "ts", "v", "eid").collect()
    got = {(r["k"], r["cell"].day): (r["value_filled"], r["is_gap"]) for r in out}
    assert got == {
        ("a", 1): (2.0, False),   # in-cell last by ts
        ("a", 2): (2.0, True),    # gap carries previous value
        ("a", 3): (2.0, True),
        ("a", 4): (7.0, False),
        ("b", 2): (5.0, False),
    }
    # grid is bounded by each key's own span — no global calendar
    assert len(out) == 5


def test_ffill_in_cell_tiebreak_is_deterministic(spark):
    rows = [
        ("a", datetime(2024, 1, 1), 1.0, 10),
        ("a", datetime(2024, 1, 1), 2.0, 11),  # same ts: higher eid wins
    ]
    out = resample_ffill(_df(spark, rows), "k", "ts", "v", "eid").collect()
    assert len(out) == 1 and out[0]["value_filled"] == 2.0


def test_ffill_window_is_keyed_not_global(spark):
    df = _df(spark, [("a", datetime(2024, 1, 1), 1.0, 1)])
    plan = (
        resample_ffill(df, "k", "ts", "v", "eid")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # every window partitions by the key — no empty partitionBy
    assert "windowspecdefinition(k" in plan or "partitionBy" not in plan


def test_grouped_packing_bins_never_span_groups(spark):
    from parquet_converters_spark.functions.sampling import pack_sequences

    rows = [(g, i, 200) for g in ("x", "y") for i in range(5)]
    df = spark.createDataFrame(rows, "g string, doc_id long, n long")
    out = pack_sequences(df, "n", budget=512, partition_col="g").collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r["g"], []).append(
            (r["doc_id"], r["bin_id"], r["bin_offset"])
        )
    # identical packing in each group, restarting at bin 0
    for g in ("x", "y"):
        assert sorted(by_group[g]) == [
            (0, 0, 0), (1, 0, 200), (2, 1, 0), (3, 1, 200), (4, 1, 400)
        ]


def test_ffill_property_matches_python_replica(spark):
    """Hypothesis property: for random sparse daily observations the
    filled grid equals a sequential replica (last observation carried
    forward, gap flags exact)."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=8, deadline=None)
    @given(
        obs=st.dictionaries(
            st.tuples(
                st.sampled_from(["a", "b"]),
                st.integers(min_value=1, max_value=25),
            ),
            st.integers(min_value=0, max_value=99),
            min_size=1,
            max_size=30,
        )
    )
    def check(obs):
        rows = [
            (k, datetime(2024, 1, d, 12), float(v), i)
            for i, ((k, d), v) in enumerate(sorted(obs.items()))
        ]
        df = _df(spark, rows)
        got = {
            (r["k"], r["cell"].day): (r["value_filled"], r["is_gap"])
            for r in resample_ffill(df, "k", "ts", "v", "eid").collect()
        }
        want = {}
        for k in {k for k, _ in obs}:
            days = sorted(d for kk, d in obs if kk == k)
            last = None
            for d in range(days[0], days[-1] + 1):
                if (k, d) in obs:
                    last = float(obs[(k, d)])
                    want[(k, d)] = (last, False)
                else:
                    want[(k, d)] = (last, True)
        assert got == want

    check()


def test_new_operators_handle_empty_input(spark):
    """Empty in -> empty out, no crashes: the property that matters when
    a filter upstream of the operator matches nothing on some shard."""
    from parquet_converters_spark.functions.sampling import pack_sequences

    empty_ev = spark.createDataFrame(
        [], "k string, ts timestamp, v double, eid long"
    )
    assert resample_ffill(empty_ev, "k", "ts", "v", "eid").count() == 0

    empty_docs = spark.createDataFrame([], "doc_id long, n long")
    assert pack_sequences(empty_docs, "n", budget=512).count() == 0
    assert (
        pack_sequences(
            empty_docs.withColumn("g", F.lit("x")),
            "n",
            budget=512,
            partition_col="g",
        ).count()
        == 0
    )
