"""Raw text-format ingestion: JSONL and CSV → canonical DataFrames.

Training-data corpora rarely arrive as parquet; the first pipeline
stage is almost always "read a few million JSONL/CSV shards, quarantine
the malformed lines, land parquet".  The reference engine's analogue is
the touch-binary scan (`/root/reference/src/touches/`): an external
format normalized into the engine's canonical columnar layout.

Scale rules baked in:

- **Schema is required.**  Inference costs a full extra pass over
  100 TB before the real one; a declared schema makes the read one
  pass and keeps the row-level parser vectorized.
- **PERMISSIVE + corrupt capture, never FAILFAST.**  At corpus scale
  there are always malformed lines; dying on line 3 billion wastes the
  cluster, and silently dropping (DROPMALFORMED) destroys auditability.
  Malformed lines land in ``_corrupt_record`` and are split into a
  quarantine output.
- **Line-oriented (multiLine off)** so Spark can split files at
  arbitrary byte offsets — a multiline JSON document forces
  one-file-one-task and kills parallelism on big shards.

CSV pruning gotcha: the CSV parser judges corruption only over the
COLUMNS THE PLAN REQUIRES (column pruning is semantic here, not just a
perf win) — a row whose ``doc_id`` is unparseable reads as clean if the
query only touches ``text``.  Audit-grade accounting must therefore
reference every column: ``ingest_to_parquet`` writes the quarantine
full-width, which forces a full parse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: StructType) -> StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType
) -> DataFrame:
    """Line-delimited JSON with declared schema and corrupt-line
    capture.  Returns all rows; malformed lines have every data column
    null and the raw line in ``_corrupt_record``."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("multiLine", "false")
        .json(path)
    )


def read_csv_strict(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """CSV with declared schema and corrupt-line capture (malformed =
    wrong arity or un-castable field)."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("enforceSchema", "true")
        .csv(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good_rows_without_corrupt_col, quarantine_rows_full_width).

    The quarantine branch keeps every column, not just the corrupt one:
    Spark refuses any plan over a raw JSON/CSV scan whose required
    schema is *only* the internal corrupt column (a bare ``count()``
    after this filter, for example).  Keep at least one data column in
    whatever you do next, or land the quarantine to parquet first —
    ``ingest_to_parquet`` does the latter."""
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull())
    return good, bad


def ingest_to_parquet(
    spark: SparkSession,
    src: str,
    dest: str,
    schema: StructType,
    fmt: str = "jsonl",
    quarantine: str | None = None,
) -> dict:
    """One-pass landing job: read raw shards, quarantine malformed
    lines, write parquet.  Returns row-count accounting computed from
    the written outputs (no extra scan of the raw input)."""
    reader = read_jsonl if fmt == "jsonl" else read_csv_strict
    df = reader(spark, src, schema)
    good, bad = split_corrupt(df)
    good.write.mode("overwrite").parquet(dest)
    n_bad = 0
    if quarantine is not None:
        # full-width write: pruning down to only the corrupt column is
        # disallowed on raw scans (see split_corrupt); counting happens
        # on the landed parquet, where no such restriction exists
        bad.write.mode("overwrite").parquet(quarantine)
        n_bad = spark.read.parquet(quarantine).count()
    n_good = spark.read.parquet(dest).count()
    return {"rows": n_good, "quarantined": n_bad}
