"""Parquet split-block Bloom filters: the sink option, verified by the
from-spec footer walker + XXH64 + SBBF prober (sources/parquet_bloom.py).

The external known-answer here is parquet-mr itself: Spark's writer
produces the filter bytes, and a wrong thrift walk, wrong XXH64, or
wrong block/salt math would make present-value probes read False —
so the present/absent split below validates the whole from-spec chain
against an independent implementation, not against itself.
"""

import glob
import os

import pytest

from parquet_converters_spark.sinks.parquet_sink import (
    write_canonical_parquet,
)
from parquet_converters_spark.sources.parquet_bloom import (
    bloom_probe,
    footer_bloom_index,
    xxh64,
)


def test_xxh64_known_answers():
    # spot vectors; the end-to-end probe against parquet-mr's bytes is
    # the real external validation
    assert xxh64(b"") == 0xEF46DB3751D8E999
    # self-consistency properties the spec guarantees
    assert xxh64(b"a") != xxh64(b"b")
    assert xxh64(b"x" * 100) == xxh64(b"x" * 100)


def _one_file(path):
    files = glob.glob(os.path.join(path, "*.parquet"))
    assert len(files) == 1, files
    return files[0]


def test_bloom_filter_round_trip(spark, tmp_path):
    out = str(tmp_path / "bloomed")
    df = spark.range(0, 5000).selectExpr(
        "id * 7 + 3 AS k", "concat('u-', id) AS u", "id AS plain"
    )
    write_canonical_parquet(
        df.coalesce(1), out, bloom_filter_columns=["k", "u"],
        metadata_sidecar=False,
    )
    f = _one_file(out)
    idx = footer_bloom_index(f)
    assert {c for _rg, c in idx} == {"k", "u"}

    # every present value must probe True in the row group holding it
    # (single file, single row group at this size)
    present = [7 * i + 3 for i in range(0, 5000, 97)]
    got = bloom_probe(f, "k", present)
    assert all(all(flags) for flags in got.values())

    # absent values: Bloom admits false positives but at the writer's
    # default NDV/FPP a large majority must be rejected
    absent = [7 * i + 4 for i in range(0, 5000, 7)]
    flags = bloom_probe(f, "k", absent)[0]
    assert sum(flags) < len(flags) * 0.1, f"{sum(flags)}/{len(flags)} FPs"

    # string column: same contract
    assert all(bloom_probe(f, "u", [f"u-{i}" for i in range(0, 5000, 131)])[0])
    miss = bloom_probe(f, "u", [f"v-{i}" for i in range(400)])[0]
    assert sum(miss) < len(miss) * 0.1

    # the data itself still reads back intact through Spark
    back = spark.read.parquet(out)
    assert back.count() == 5000
    assert back.selectExpr("sum(k)").first()[0] == sum(
        7 * i + 3 for i in range(5000)
    )


def test_no_bloom_when_not_requested(spark, tmp_path):
    out = str(tmp_path / "plain")
    write_canonical_parquet(
        spark.range(0, 100).selectExpr("id AS k").coalesce(1),
        out,
        metadata_sidecar=False,
    )
    f = _one_file(out)
    assert footer_bloom_index(f) == {}
    with pytest.raises(KeyError, match="no Bloom filter"):
        bloom_probe(f, "k", [1])


def test_probe_unsupported_type_named():
    from parquet_converters_spark.sources.parquet_bloom import plain_encode

    with pytest.raises(NotImplementedError, match="BOOLEAN"):
        plain_encode(True)
    with pytest.raises(NotImplementedError, match="float"):
        plain_encode(1.5)
