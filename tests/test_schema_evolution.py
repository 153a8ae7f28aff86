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
