"""Deletion propagation (pipelines.scrub_ids / scrub_tables)."""

import pyarrow.parquet as pq

from parquet_converters_spark.pipelines import scrub_ids, scrub_tables


def _land(spark, sf_dir, tmp_path, name):
    src = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    p = str(tmp_path / name)
    src.write.parquet(p)
    return p


def test_scrub_removes_exactly_the_requested_ids(spark, sf_dir, tmp_path):
    table = _land(spark, sf_dir, tmp_path, "docs")
    stats = scrub_ids(spark, table, [1, 5, 7], id_col="doc_id")
    assert stats["rows_removed"] == 3
    assert stats["rows_before"] == 100 and stats["rows_after"] == 97
    back = spark.read.parquet(stats["output"])
    got = {r["doc_id"] for r in back.select("doc_id").collect()}
    assert got.isdisjoint({1, 5, 7}) and len(got) == 97
    # untouched rows survive byte-identical (column values preserved)
    before = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(table).collect()
        if r["doc_id"] not in (1, 5, 7)
    }
    after = {r["doc_id"]: r["text"] for r in back.collect()}
    assert before == after


def test_scrub_accepts_dataframe_manifest(spark, sf_dir, tmp_path):
    table = _land(spark, sf_dir, tmp_path, "docs2")
    manifest = spark.createDataFrame([(2,), (3,)], "doc_id long")
    stats = scrub_ids(spark, table, manifest)
    assert stats["rows_removed"] == 2


def test_scrub_propagates_across_derived_tables(spark, sf_dir, tmp_path):
    from parquet_converters_spark.functions.sampling import chunk_documents

    docs_dir = _land(spark, sf_dir, tmp_path, "docs3")
    chunks_dir = str(tmp_path / "chunks")
    chunk_documents(spark.read.parquet(docs_dir)).write.parquet(chunks_dir)
    out = scrub_tables(
        spark, {docs_dir: "doc_id", chunks_dir: "doc_id"}, [4, 9]
    )
    assert out[docs_dir]["rows_removed"] == 2
    assert out[chunks_dir]["rows_removed"] >= 2  # >=1 chunk per doc
    for d in (docs_dir, chunks_dir):
        back = spark.read.parquet(out[d]["output"])
        assert back.where("doc_id IN (4, 9)").count() == 0


def test_snapshot_diff_classifies_all_change_types(spark):
    from parquet_converters_spark.pipelines import snapshot_diff

    a = spark.createDataFrame(
        [(1, "x", 1.0), (2, "y", 2.0), (3, "z", 3.0)],
        "k long, s string, v double",
    )
    b = spark.createDataFrame(
        [(1, "x", 1.0), (2, "CHANGED", 2.0), (4, "w", 4.0)],
        "k long, s string, v double",
    )
    out = {r["k"]: r["change_type"] for r in snapshot_diff(a, b, ["k"]).collect()}
    assert out == {1: "unchanged", 2: "updated", 3: "removed", 4: "added"}


def test_snapshot_diff_null_value_vs_changed(spark):
    """NULL handling: concat_ws drops NULLs, so NULL->value transitions
    must still classify as updated (not unchanged)."""
    from parquet_converters_spark.pipelines import snapshot_diff

    a = spark.createDataFrame([(1, None)], "k long, s string")
    b = spark.createDataFrame([(1, "now-set")], "k long, s string")
    out = snapshot_diff(a, b, ["k"]).collect()
    assert out[0]["change_type"] == "updated"


def test_snapshot_diff_null_shift_between_columns(spark):
    """(x, NULL, y) vs (x, y, NULL) must classify as updated — the old
    concat_ws hash silently skipped NULL columns and saw both rows as
    'x\\x1fy' (ADVICE r03); the JSON-struct hash keys every value by
    column name."""
    from parquet_converters_spark.pipelines import snapshot_diff

    a = spark.createDataFrame([(1, "x", None, "y")], "k long, c1 string, c2 string, c3 string")
    b = spark.createDataFrame([(1, "x", "y", None)], "k long, c1 string, c2 string, c3 string")
    out = snapshot_diff(a, b, ["k"]).collect()
    assert out[0]["change_type"] == "updated"


def test_snapshot_diff_separator_byte_in_values(spark):
    """Values containing the old \\x1f separator must not collide:
    ('a\\x1fb', 'c') vs ('a', 'b\\x1fc') is updated."""
    from parquet_converters_spark.pipelines import snapshot_diff

    a = spark.createDataFrame([(1, "a\x1fb", "c")], "k long, c1 string, c2 string")
    b = spark.createDataFrame([(1, "a", "b\x1fc")], "k long, c1 string, c2 string")
    out = snapshot_diff(a, b, ["k"]).collect()
    assert out[0]["change_type"] == "updated"
