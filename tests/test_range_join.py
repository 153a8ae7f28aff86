"""bucketed_range_join: correctness vs a brute-force nested-loop oracle,
plus the API guards."""

import random

import pytest
from pyspark.sql import functions as F

from parquet_converters_spark.operators.range_join import bucketed_range_join


def _brute_force(points, intervals, keys):
    out = []
    for p in points:
        for iv in intervals:
            if all(p[k] == iv[k] for k in keys) and iv["lo"] <= p["pt"] < iv["hi"]:
                out.append((p["pid"], iv["iid"]))
    return sorted(out)


@pytest.mark.parametrize("bucket_width", [7, 50, 1000])
def test_matches_nested_loop(spark, bucket_width):
    """Random points/intervals: result must be identical for any bucket
    width (width only changes cost, never the answer)."""
    rng = random.Random(11)
    points = [
        {"pid": i, "k": rng.randrange(3), "pt": rng.randrange(1000)}
        for i in range(200)
    ]
    intervals = []
    for i in range(60):
        lo = rng.randrange(1000)
        intervals.append(
            {"iid": i, "k": rng.randrange(3), "lo": lo, "hi": lo + rng.randrange(1, 120)}
        )
    pdf = spark.createDataFrame(
        [(p["pid"], p["k"], p["pt"]) for p in points], "pid long, k int, pt long"
    )
    idf = spark.createDataFrame(
        [(v["iid"], v["k"], v["lo"], v["hi"]) for v in intervals],
        "iid long, k int, lo long, hi long",
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in bucketed_range_join(
            pdf, idf, "pt", "lo", "hi", bucket_width, equi_keys=["k"]
        ).collect()
    )
    assert got == _brute_force(points, intervals, ["k"])


def test_no_equi_keys(spark):
    pdf = spark.createDataFrame([(1, 5), (2, 25), (3, 99)], "pid long, pt long")
    idf = spark.createDataFrame([(10, 0, 30)], "iid long, lo long, hi long")
    got = sorted(
        r["pid"]
        for r in bucketed_range_join(pdf, idf, "pt", "lo", "hi", 10).collect()
    )
    assert got == [1, 2]


def test_guards(spark):
    pdf = spark.createDataFrame([(1, 5)], "pid long, pt long")
    idf = spark.createDataFrame([(10, 0, 30)], "iid long, lo long, hi long")
    with pytest.raises(ValueError, match="positive"):
        bucketed_range_join(pdf, idf, "pt", "lo", "hi", 0)
    clash = pdf.withColumn("_bucket", F.lit(1))
    with pytest.raises(ValueError, match="reserved"):
        bucketed_range_join(clash, idf, "pt", "lo", "hi", 10)
    dup = idf.withColumn("pid", F.lit(7))
    with pytest.raises(ValueError, match="both sides"):
        bucketed_range_join(pdf, dup, "pt", "lo", "hi", 10)


def test_simhash_banded_equals_bruteforce(spark):
    """Banded simhash pairs == brute-force hamming filter (pigeonhole
    exactness for max_hamming < bands)."""
    from parquet_converters_spark.functions.dedup import (
        simhash,
        simhash_neardup_pairs,
    )

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog again and again"),
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "the quick brown fox jumps over the lazy cat again and again"),
            (3, "completely different text about spark catalyst optimization"),
            (4, "another unrelated document mentioning parquet row groups"),
        ],
        "doc_id long, text string",
    )
    sig = {r["doc_id"]: r["simhash"] for r in simhash(docs, bits=32).collect()}
    want = sorted(
        (a, b)
        for a in sig
        for b in sig
        if a < b and bin(sig[a] ^ sig[b]).count("1") <= 3
    )
    got = sorted(
        (r["id_a"], r["id_b"])
        for r in simhash_neardup_pairs(docs, bits=32, bands=4, max_hamming=3).collect()
    )
    assert got == want
    assert (0, 1) in got  # identical docs always pair


def test_survivors_drop_near_dups(spark):
    """near_dedup_survivors keeps exactly one representative per
    exact/near-dup cluster and every unique doc."""
    from parquet_converters_spark.functions.dedup import near_dedup_survivors

    base = "the quick brown fox jumps over the lazy dog and runs far away"
    docs = spark.createDataFrame(
        [
            (0, base),
            (1, base),                                   # exact dup of 0
            (2, base.replace("dog", "cat")),             # near dup of 0
            (3, "an entirely different document about distributed joins"),
        ],
        "doc_id long, text string",
    )
    kept = sorted(
        r["doc_id"] for r in near_dedup_survivors(docs, bands=8, num_hashes=8).collect()
    )
    assert 0 in kept and 3 in kept
    assert 1 not in kept  # exact dup never survives
    assert kept == sorted(set(kept))
