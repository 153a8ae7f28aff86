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
    # published vectors covering BOTH length regimes: the short path
    # (< 32 bytes, no stripe accumulators) and the long path (>= 32
    # bytes, stripe + merge rounds) — a swapped multiply in the merge
    # round passes every short input and breaks every long one
    # (r15 review finding, fixed)
    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert (
        xxh64(b"Nobody inspects the spammish repetition")
        == 0xFBCEA83C8A378BF1
    )
    assert xxh64(b"a") != xxh64(b"b")


def _one_file(path):
    files = glob.glob(os.path.join(path, "*.parquet"))
    assert len(files) == 1, files
    return files[0]


def test_bloom_filter_round_trip(spark, tmp_path):
    out = str(tmp_path / "bloomed")
    df = spark.range(0, 5000).selectExpr(
        "id * 7 + 3 AS k", "concat('u-', id) AS u",
        "repeat(concat('u-', id), 8) AS long_u",
        "CAST(id AS INT) AS k32", "id AS plain",
    )
    write_canonical_parquet(
        df.coalesce(1), out, bloom_filter_columns=["k", "u", "long_u", "k32"],
        metadata_sidecar=False,
    )
    f = _one_file(out)
    idx = footer_bloom_index(f)
    assert {c for _rg, c in idx} == {"k", "u", "long_u", "k32"}
    # physical types recorded: INT64, BYTE_ARRAY x2, INT32
    types = {c: t for (_rg, c), (_o, _l, t) in idx.items()}
    assert types == {"k": 2, "u": 6, "long_u": 6, "k32": 1}

    # INT32 column: probes hash the 4-byte plain encoding
    assert all(bloom_probe(f, "k32", list(range(0, 5000, 311)))[0])
    k32_miss = bloom_probe(f, "k32", list(range(5000, 9000, 13)))[0]
    assert sum(k32_miss) < len(k32_miss) * 0.1

    # cross-type probes fail BY NAME instead of silently reading False
    with pytest.raises(NotImplementedError, match="BYTE_ARRAY"):
        bloom_probe(f, "u", [5])
    with pytest.raises(NotImplementedError, match="INT64"):
        bloom_probe(f, "k", ["5"])

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
    # >= 32-byte string values exercise the XXH64 stripe path against
    # parquet-mr's own hashes
    long_present = bloom_probe(f, "long_u", [("u-%d" % i) * 8 for i in range(0, 5000, 131)])[0]
    assert all(long_present)
    long_miss = bloom_probe(f, "long_u", [("w-%d" % i) * 8 for i in range(400)])[0]
    assert sum(long_miss) < len(long_miss) * 0.1

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


def test_corrupt_footer_raises_valueerror(spark, tmp_path):
    # mutation sweep (the codec-hardening contract): corrupt footers
    # raise ValueError/NotImplementedError, never IndexError
    import random

    out = str(tmp_path / "victim")
    write_canonical_parquet(
        spark.range(0, 200).selectExpr("id AS k").coalesce(1),
        out, bloom_filter_columns=["k"], metadata_sidecar=False,
    )
    f = _one_file(out)
    raw = open(f, "rb").read()
    rng = random.Random(99)
    victim = str(tmp_path / "mut.parquet")
    for trial in range(40):
        mutated = bytearray(raw)
        # hit the footer region (last 200 bytes before PAR1) and the
        # length word
        pos = len(raw) - 8 - rng.randrange(1, 200)
        mutated[pos] = rng.randrange(256)
        if trial % 5 == 0:
            mutated = mutated[: rng.randrange(12, len(raw))]
        open(victim, "wb").write(bytes(mutated))
        try:
            idx = footer_bloom_index(victim)
            for (_rg, _c), (off, _l, _t) in idx.items():
                from parquet_converters_spark.sources.parquet_bloom import (
                    read_bloom_blocks,
                )

                read_bloom_blocks(victim, off)
        except (ValueError, NotImplementedError):
            pass  # named rejection is the contract
        # any other exception type fails the test by propagating

def test_footer_contract_short_file_and_lying_length(tmp_path):
    """r16 ADVICE: files shorter than 8 bytes and a footer length that
    would seek before byte 0 used to escape as OSError (errno 22 from
    a negative seek) — the documented contract is ValueError, never
    OSError/IndexError/struct.error."""
    # shorter than the 4-byte length + PAR1 tail
    for n in range(0, 8):
        f = str(tmp_path / f"short{n}")
        open(f, "wb").write(b"\xab" * n)
        with pytest.raises(ValueError, match="parquet"):
            footer_bloom_index(f)
    # valid tail, lying footer length: flen > file body
    f = str(tmp_path / "lying")
    open(f, "wb").write(b"\x00" * 16 + (10_000).to_bytes(4, "little")
                        + b"PAR1")
    with pytest.raises(ValueError, match="footer length"):
        footer_bloom_index(f)
    # boundary: flen exactly equal to the body is in-bounds (seek to 0)
    # and must fail later as a *parse* ValueError, not OSError
    f = str(tmp_path / "edge")
    body = b"\x99" * 12
    open(f, "wb").write(body + len(body).to_bytes(4, "little") + b"PAR1")
    with pytest.raises(ValueError):
        footer_bloom_index(f)

def _scan_output_rows(df):
    from parquet_converters_spark.sources.parquet_bloom import (
        scan_output_rows,
    )

    return scan_output_rows(df)


def _shuffled_even_keys(spark, n=400_000, files=8):
    """Even keys hash-scattered so EVERY row group spans nearly the
    full range: min/max zone maps cannot prune an absent odd probe —
    any skip is attributable to the Bloom filter alone."""
    from pyspark.sql import functions as F

    return (
        spark.range(0, n)
        .select(
            ((F.col("id") * 1103515245 + 12345) % 1_000_000_007 * 2)
            .alias("k"),
            F.concat(F.lit("v"), F.col("id")).alias("payload"),
        )
        .repartition(files)
    )


def test_spark_reader_prunes_row_groups_via_bloom(spark, tmp_path):
    """r16 verdict item 2 (read side): Spark's own parquet scan must
    consume the W1 sink's split-block Bloom filters — an absent-key
    point probe scans ZERO rows with bloom read filtering on, and the
    whole table with it off (stats can't prune: groups span the full
    range).  Result rows are identical (0) either way."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "bloomtab")
    write_canonical_parquet(
        _shuffled_even_keys(spark), out,
        bloom_filter_columns=["k"], metadata_sidecar=False,
    )
    hc = spark.sparkContext._jsc.hadoopConfiguration()
    probe = 999_999_999  # odd -> absent by construction
    try:
        hc.set("parquet.filter.bloom.enabled", "false")
        d_off = spark.read.parquet(out).filter(F.col("k") == probe)
        assert d_off.collect() == []
        scanned_off = _scan_output_rows(d_off)
        hc.set("parquet.filter.bloom.enabled", "true")
        d_on = spark.read.parquet(out).filter(F.col("k") == probe)
        assert d_on.collect() == []
        scanned_on = _scan_output_rows(d_on)
    finally:
        hc.unset("parquet.filter.bloom.enabled")
    assert scanned_off == 400_000  # no stats prune possible
    assert scanned_on == 0         # every row group bloom-skipped


def test_bloom_scan_plan_skip_rate_and_pruned_read(spark, tmp_path):
    """The planning pass: absent probes skip every row group; present
    probes keep the group(s) that hold them; bloom_pruned_read returns
    exactly the full-scan answer while reading only surviving files."""
    from pyspark.sql import functions as F

    from parquet_converters_spark.sources.parquet_bloom import (
        bloom_pruned_read,
        bloom_scan_plan,
    )

    out = str(tmp_path / "bloomtab2")
    write_canonical_parquet(
        _shuffled_even_keys(spark), out,
        bloom_filter_columns=["k"], metadata_sidecar=False,
    )
    # absent: odd values can never appear
    plan = bloom_scan_plan(spark, out, "k", [3, 999_999_999]).collect()
    assert len(plan) >= 8 and not any(r["keep"] for r in plan)
    assert sum(r["n_rows"] for r in plan) == 400_000
    # present: take three real keys, every one must keep >= 1 group
    some = [r["k"] for r in spark.read.parquet(out).limit(3).collect()]
    plan2 = bloom_scan_plan(spark, out, "k", some).collect()
    assert any(r["keep"] for r in plan2)
    # pruned read == exact answer, both for hits and for the empty case
    got = sorted(
        r["payload"] for r in bloom_pruned_read(spark, out, "k", some)
        .collect()
    )
    want = sorted(
        r["payload"] for r in spark.read.parquet(out)
        .filter(F.col("k").isin(some)).collect()
    )
    assert got == want and len(got) >= 3
    assert bloom_pruned_read(spark, out, "k", [3]).collect() == []
    # a column without a filter refuses by name at the probe layer
    with pytest.raises(KeyError, match="payload"):
        bloom_scan_plan(spark, out, "payload", [b"x"]).collect()

def test_bloom_scan_plan_mixed_dataset_keeps_filterless_file(
    spark, tmp_path
):
    """r16 review finding: a dataset mixing bloom-filtered and
    filter-less files (e.g. a later append by another writer) must
    KEEP every row group of the filter-less file — never crash the
    fan-out — and bloom_pruned_read must stay full-scan-identical."""
    from pyspark.sql import functions as F

    from parquet_converters_spark.sources.parquet_bloom import (
        bloom_pruned_read,
        bloom_scan_plan,
    )

    out = str(tmp_path / "mixed")
    write_canonical_parquet(
        _shuffled_even_keys(spark, n=50_000, files=2), out,
        bloom_filter_columns=["k"], metadata_sidecar=False,
    )
    # append a filter-less file holding an ODD key no bloomed file has
    write_canonical_parquet(
        spark.createDataFrame([(7, "odd7")], "k long, payload string"),
        out, mode="append", metadata_sidecar=False,
    )
    plan = bloom_scan_plan(spark, out, "k", [7]).collect()
    filterless = [r for r in plan if r["n_rows"] == 1]
    assert filterless and all(r["keep"] for r in filterless)
    bloomed = [r for r in plan if r["n_rows"] > 1]
    assert bloomed and not any(r["keep"] for r in bloomed)  # 7 is odd
    got = bloom_pruned_read(spark, out, "k", [7]).collect()
    want = (spark.read.parquet(out).filter(F.col("k") == 7).collect())
    assert [r["payload"] for r in got] == [r["payload"] for r in want] \
        == ["odd7"]


def test_bloom_scan_plan_refuses_remote_schemes_by_name(spark):
    """r16 ADVICE: the footer probe is local-filesystem only — a URI
    scheme Spark itself could read must be refused BY NAME, not
    surfaced as 'no parquet files under <path>'."""
    from parquet_converters_spark.sources.parquet_bloom import (
        bloom_scan_plan,
    )

    for bad in ("s3a://bucket/tab", "hdfs://nn:8020/tab"):
        with pytest.raises(ValueError, match="local filesystem"):
            bloom_scan_plan(spark, bad, "k", [1])
        with pytest.raises(ValueError, match=bad.split(":")[0]):
            bloom_scan_plan(spark, bad, "k", [1])


def test_bloom_scan_plan_driver_probe_bounded(spark, tmp_path):
    """r16 ADVICE: the no-filter refusal walk must not read every
    footer serially on the driver.  A dataset whose 68 FIRST files (by
    sort order) are filter-less but whose last files carry the bloom
    exercises the distributed fallback: the plan must still find the
    filter (no false KeyError) and keep every filter-less row group."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_converters_spark.sources.parquet_bloom import (
        bloom_scan_plan,
    )

    out = tmp_path / "many"
    write_canonical_parquet(
        _shuffled_even_keys(spark, n=50_000, files=2), str(out),
        bloom_filter_columns=["k"], metadata_sidecar=False,
    )
    # 68 filter-less files sorting BEFORE the bloomed part-files: the
    # 64-footer driver sample sees none of the filters
    for i in range(68):
        pq.write_table(
            pa.table({"k": pa.array([7], pa.int64()),
                      "payload": [f"aaa{i}"]}),
            out / f"aaa_{i:03d}.parquet",
        )
    plan = bloom_scan_plan(spark, str(out), "k", [7]).collect()
    assert len([r for r in plan if r["n_rows"] == 1]) == 68
    assert all(r["keep"] for r in plan if r["n_rows"] == 1)
    assert not any(r["keep"] for r in plan if r["n_rows"] > 1)
    # the misuse case still refuses by name through the fallback
    with pytest.raises(KeyError, match="nosuch"):
        bloom_scan_plan(spark, str(out), "nosuch", [1])
