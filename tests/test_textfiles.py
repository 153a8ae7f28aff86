"""JSONL/CSV ingestion with corrupt-line quarantine (sources/textfiles)."""

import json

from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from parquet_converters_spark.sources.textfiles import (
    CORRUPT_COL,
    ingest_to_parquet,
    read_csv_strict,
    read_jsonl,
    split_corrupt,
)

SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ]
)


def test_jsonl_corrupt_lines_quarantined(spark, tmp_path):
    p = tmp_path / "shard.jsonl"
    lines = [
        json.dumps({"doc_id": 1, "text": "ok one"}),
        '{"doc_id": 2, "text": "unterminated',   # malformed JSON
        json.dumps({"doc_id": 3, "text": "ok three"}),
        "not json at all",
    ]
    p.write_text("\n".join(lines) + "\n")
    good, bad = split_corrupt(read_jsonl(spark, str(p), SCHEMA))
    assert sorted(r["doc_id"] for r in good.collect()) == [1, 3]
    raw = sorted(r[CORRUPT_COL] for r in bad.collect())
    assert raw == sorted([lines[1], lines[3]])
    assert CORRUPT_COL not in good.columns


def test_csv_bad_arity_and_bad_cast_quarantined(spark, tmp_path):
    p = tmp_path / "shard.csv"
    p.write_text(
        "doc_id,text\n"
        "1,alpha\n"
        "notanumber,beta\n"   # un-castable doc_id
        "3,gamma\n"
    )
    good, bad = split_corrupt(read_csv_strict(spark, str(p), SCHEMA))
    assert sorted(r["doc_id"] for r in good.collect()) == [1, 3]
    # collect FULL rows: CSV corruption is judged only over the parsed
    # columns, so pruning doc_id away would make the bad row parse
    # clean (see textfiles module docstring)
    rows = bad.collect()
    assert len(rows) == 1 and rows[0][CORRUPT_COL] == "notanumber,beta"


def test_ingest_lands_parquet_with_accounting(spark, tmp_path):
    src = tmp_path / "in.jsonl"
    src.write_text(
        json.dumps({"doc_id": 10, "text": "a"})
        + "\n}{broken\n"
        + json.dumps({"doc_id": 11, "text": "b"})
        + "\n"
    )
    stats = ingest_to_parquet(
        spark,
        str(src),
        str(tmp_path / "out"),
        SCHEMA,
        quarantine=str(tmp_path / "quar"),
    )
    assert stats == {"rows": 2, "quarantined": 1}
    back = spark.read.parquet(str(tmp_path / "out"))
    assert sorted(r["doc_id"] for r in back.collect()) == [10, 11]
