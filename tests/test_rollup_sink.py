"""Incremental rollup maintenance (streaming/sinks.rollup_maintenance_sink):
exactly-once-effective partial-aggregate merge on plain parquet."""

from datetime import datetime

from pyspark.sql import functions as F

from parquet_converters_spark.streaming.sinks import (
    compact_rollup,
    read_rollup,
    rollup_maintenance_sink,
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, "ts timestamp, value double")


def _rollup_dict(spark, out):
    return {
        r["cell"]: (r["n_events"], float(r["value_sum"]))
        for r in read_rollup(spark, out).collect()
    }


def test_rollup_accumulates_and_replay_is_idempotent(spark, tmp_path):
    out = str(tmp_path / "rollup")
    sink = rollup_maintenance_sink(out)
    b0 = _batch(
        spark,
        [
            (datetime(2024, 1, 1, 10, 0, 5), 1.0),
            (datetime(2024, 1, 1, 10, 0, 55), 2.0),
            (datetime(2024, 1, 1, 10, 1, 0), 10.0),
        ],
    )
    b1 = _batch(spark, [(datetime(2024, 1, 1, 10, 1, 30), 5.0)])

    sink(b0, 0)
    sink(b1, 1)
    want = {
        datetime(2024, 1, 1, 10, 0): (2, 3.0),
        datetime(2024, 1, 1, 10, 1): (2, 15.0),
    }
    assert _rollup_dict(spark, out) == want

    # at-least-once replay of batch 1 must not double-count
    sink(b1, 1)
    assert _rollup_dict(spark, out) == want


def test_rollup_matches_batch_recompute(spark, tmp_path):
    """The incrementally-maintained rollup equals a from-scratch batch
    aggregate over the full event set."""
    out = str(tmp_path / "rollup2")
    sink = rollup_maintenance_sink(out)
    batches = [
        [(datetime(2024, 1, 1, 9, m % 7, s), float(m * s % 13)) for s in range(10)]
        for m in range(5)
    ]
    for i, rows in enumerate(batches):
        sink(_batch(spark, rows), i)

    all_rows = [r for rows in batches for r in rows]
    full = (
        _batch(spark, all_rows)
        .groupBy(F.date_trunc("minute", "ts").alias("cell"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(25,6)")).alias("s"),
        )
    )
    want = {r["cell"]: (r["n"], float(r["s"])) for r in full.collect()}
    assert _rollup_dict(spark, out) == want


def test_compaction_preserves_the_rollup(spark, tmp_path):
    out = str(tmp_path / "rollup3")
    sink = rollup_maintenance_sink(out)
    for i in range(4):
        sink(
            _batch(spark, [(datetime(2024, 1, 1, 8, i), float(i))]), i
        )
    before = _rollup_dict(spark, out)
    folded = compact_rollup(spark, out)
    assert folded == 4
    assert _rollup_dict(spark, out) == before
    # partial table is now one partition
    import glob

    assert glob.glob(f"{out}/_batch_id=*") == [f"{out}/_batch_id=-1"]


def test_rollup_sink_driven_by_real_stream(spark, sf_dir, tmp_path):
    """End-to-end wiring: a file stream (multiple triggers) through
    foreachBatch(rollup_maintenance_sink) must equal the batch rollup
    of the same events."""
    from parquet_converters_spark.streaming.events import read_events_stream

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").limit(2000)
    src = str(tmp_path / "stream_src")
    ev.repartition(4).write.parquet(src)  # 4 files -> multiple triggers

    out = str(tmp_path / "rollup_stream")
    q = (
        read_events_stream(spark, src, max_files_per_trigger=1)
        .writeStream.foreachBatch(rollup_maintenance_sink(out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    from parquet_converters_spark.queries import _events

    batch = (
        _events(spark, sf_dir)
        .join(ev.select("event_id"), "event_id", "left_semi")
        .groupBy(F.date_trunc("minute", "ts").alias("cell"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(25,6)")).alias("s"),
        )
    )
    want = {r["cell"]: (r["n"], float(r["s"])) for r in batch.collect()}
    assert _rollup_dict(spark, out) == want
