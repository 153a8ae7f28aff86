"""Parquet schema evolution: late-arriving columns across shards.

At 100 TB a table is thousands of shards written over months; columns
get added.  The engine must read old+new shards as one table (union
schema, nulls for missing), and must NOT silently drop the new column
when footers disagree."""

from pyspark.sql import functions as F


def test_merge_schema_unions_columns(spark, tmp_path):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(3, "c", "en")], "doc_id long, text string, lang string"
    )
    old.write.parquet(str(tmp_path / "t"), mode="append")
    new.write.parquet(str(tmp_path / "t"), mode="append")

    merged = spark.read.option("mergeSchema", "true").parquet(
        str(tmp_path / "t")
    )
    assert set(merged.columns) == {"doc_id", "text", "lang"}
    rows = {r["doc_id"]: r["lang"] for r in merged.collect()}
    assert rows == {1: None, 2: None, 3: "en"}


def test_without_merge_schema_new_column_may_vanish(spark, tmp_path):
    """Documents the default-read footgun the mergeSchema option
    exists to fix: schema comes from one footer, so the late column
    silently disappears depending on which file wins."""
    spark.createDataFrame([(1,)], "doc_id long").write.parquet(
        str(tmp_path / "t"), mode="append"
    )
    spark.createDataFrame([(2, "en")], "doc_id long, lang string").write.parquet(
        str(tmp_path / "t"), mode="append"
    )
    default = spark.read.parquet(str(tmp_path / "t"))
    merged = spark.read.option("mergeSchema", "true").parquet(
        str(tmp_path / "t")
    )
    assert set(merged.columns) == {"doc_id", "lang"}
    assert set(default.columns) <= set(merged.columns)


def test_filter_on_late_column_sees_null_rows_correctly(spark, tmp_path):
    """Predicates on the late column must treat old-shard rows as NULL
    (not error, not match) — the semantics downstream dedup relies on."""
    spark.createDataFrame([(i,) for i in range(5)], "doc_id long").write.parquet(
        str(tmp_path / "t"), mode="append"
    )
    spark.createDataFrame(
        [(10, "en"), (11, "fr")], "doc_id long, lang string"
    ).write.parquet(str(tmp_path / "t"), mode="append")
    t = spark.read.option("mergeSchema", "true").parquet(str(tmp_path / "t"))
    assert t.filter(F.col("lang") == "en").count() == 1
    assert t.filter(F.col("lang").isNull()).count() == 5


def test_ordered_scan_rejects_mixed_schema_dir(spark, tmp_path):
    """Reference parity (parquet2hdf5.cpp:67-73): an ordered scan over
    files whose footers disagree is a hard error naming the file, not a
    silent projection."""
    import pytest

    from parquet_converters_spark.sources.ordering import read_parquet_ordered

    spark.createDataFrame([(1,)], "doc_id long").write.parquet(
        str(tmp_path / "t"), mode="append"
    )
    spark.createDataFrame([(2, "en")], "doc_id long, lang string").write.parquet(
        str(tmp_path / "t"), mode="append"
    )
    with pytest.raises(ValueError, match="schema mismatch"):
        read_parquet_ordered(spark, str(tmp_path / "t"))
    # mergeSchema=True opts out of strictness and unions instead
    merged = read_parquet_ordered(spark, str(tmp_path / "t"), mergeSchema=True)
    assert set(merged.columns) >= {"doc_id", "lang", "row_index"}


def test_ordered_scan_honors_metadata_sidecar(spark, tmp_path):
    """A _metadata sidecar is the authoritative directory schema
    (parquet2hdf5.cpp:205-218): files that disagree with IT fail even
    when they agree with each other."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from parquet_converters_spark.sources.ordering import read_parquet_ordered

    d = tmp_path / "t"
    spark.createDataFrame([(1,), (2,)], "doc_id long").coalesce(1).write.parquet(
        str(d)
    )
    # sidecar that disagrees with the (internally consistent) files
    pq.write_metadata(
        pa.schema([("doc_id", pa.int64()), ("lang", pa.string())]),
        str(d / "_metadata"),
    )
    with pytest.raises(ValueError, match="_metadata sidecar"):
        read_parquet_ordered(spark, str(d))
    # matching sidecar: scan proceeds with the global row index intact
    pq.write_metadata(pa.schema([("doc_id", pa.int64())]), str(d / "_metadata"))
    out = read_parquet_ordered(spark, str(d))
    assert sorted(r["row_index"] for r in out.collect()) == [0, 1]


def test_global_row_index_unordered_mode_no_shuffle(spark):
    """No-order mode: contiguous 0..n-1 in current partition order,
    computed from monotonically_increasing_id bit fields — the plan
    must contain no Exchange and no Python stage."""
    from parquet_converters_spark.sources.ordering import with_global_row_index

    df = spark.range(0, 1000).repartition(7)
    out = with_global_row_index(df, "idx")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the old implementation round-tripped rows through df.rdd ->
    # createDataFrame, which shows up as a Scan ExistingRDD + Python
    # stage; the rewrite must be pure JVM expressions
    assert "ExistingRDD" not in plan
    assert "Python" not in plan
    rows = out.collect()
    assert sorted(r["idx"] for r in rows) == list(range(1000))
    # each source partition's ids are contiguous
    import collections

    by_part = collections.defaultdict(list)
    for r in out.withColumn("_p", __import__("pyspark").sql.functions.spark_partition_id()).collect():
        by_part[r["_p"]].append(r["idx"])
    for ids in by_part.values():
        ids.sort()
        assert ids == list(range(ids[0], ids[0] + len(ids)))


def test_metadata_sidecar_rejects_drifted_schemas(spark, tmp_path):
    """_write_metadata_sidecar records the FIRST file's schema; if later
    files drifted (append-mode runs), a sidecar would misdescribe them —
    it must refuse instead of writing an inconsistent footer."""
    import pytest

    from parquet_converters_spark.sinks.parquet_sink import (
        _write_metadata_sidecar,
    )

    d = tmp_path / "drift"
    d.mkdir()
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"doc_id": pa.array([1, 2], pa.int64())}),
        str(d / "part-0.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([3], pa.int64()),
                "lang": pa.array(["en"]),
            }
        ),
        str(d / "part-1.parquet"),
    )
    with pytest.raises(ValueError, match="differs"):
        _write_metadata_sidecar(str(d))
    # identical schemas (even with different KV stamps) still pass
    d2 = tmp_path / "same"
    d2.mkdir()
    for i, kv in enumerate(({"a": "1"}, {"a": "2"})):
        pq.write_table(
            pa.table({"doc_id": pa.array([i], pa.int64())}).replace_schema_metadata(
                {k.encode(): v.encode() for k, v in kv.items()}
            ),
            str(d2 / f"part-{i}.parquet"),
        )
    _write_metadata_sidecar(str(d2))
    assert (d2 / "_metadata").exists()
