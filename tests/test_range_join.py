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


def test_cc_property_vs_union_find(spark):
    """Property check: both distributed CC methods agree with an
    independent driver-side union-find on random graphs."""
    from hypothesis import given, settings, strategies as st

    from parquet_converters_spark.operators.graph import connected_components

    def union_find(edges, nodes):
        parent = {n: n for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for u, v in edges:
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
        # label every node with the component MINIMUM, matching the
        # distributed contract
        comp = {}
        for n in nodes:
            r = find(n)
            comp.setdefault(r, []).append(n)
        want = {}
        for members in comp.values():
            m = min(members)
            for n in members:
                want[n] = m
        return want

    @settings(max_examples=6, deadline=None)
    @given(
        edges=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=30),
                st.integers(min_value=0, max_value=30),
            ),
            min_size=1,
            max_size=40,
        )
    )
    def check(edges):
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            return
        nodes = sorted({n for e in edges for n in e})
        want = union_find(edges, nodes)
        pairs = spark.createDataFrame(edges, "id_a: long, id_b: long")
        for method in ("hash_to_min", "star"):
            got = {
                r["node"]: r["component"]
                for r in connected_components(
                    pairs, max_iter=40, method=method
                ).collect()
            }
            assert got == want, method

    check()


def test_contamination_flags(spark):
    """A train doc that copies an eval doc is flagged; unrelated docs
    are not; empty docs never match."""
    from parquet_converters_spark.functions.dedup import contamination_flags

    eval_df = spark.createDataFrame(
        [(100, "the capital of france is paris and the capital of spain is madrid")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (0, "the capital of france is paris and the capital of spain is madrid"),
            (1, "question: the capital of france is paris correct"),
            (2, "a completely unrelated sentence about spark shuffles"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["eval_shingle_hits"], r["contaminated"])
        for r in contamination_flags(train, eval_df, n=3, min_hits=2).collect()
    }
    assert out[0][1] is True           # verbatim copy
    assert out[1][0] >= 2 and out[1][1] is True  # partial overlap
    assert out[2] == (0, False)
    assert out[3] == (0, False)
    assert len(out) == 4               # every train row gets a verdict


@pytest.mark.parametrize("bucket_width", [13, 64, 500])
def test_interval_join_matches_nested_loop(spark, bucket_width):
    """Interval-overlap join vs brute force, invariant to bucket width."""
    from parquet_converters_spark.operators.range_join import (
        bucketed_interval_join,
    )

    rng = random.Random(23)

    def mk(n, id_name):
        out = []
        for i in range(n):
            lo = rng.randrange(1000)
            out.append(
                {id_name: i, "k": rng.randrange(3), "lo": lo,
                 "hi": lo + rng.randrange(1, 150)}
            )
        return out

    a, b = mk(120, "aid"), mk(80, "bid")
    want = sorted(
        (x["aid"], y["bid"])
        for x in a
        for y in b
        if x["k"] == y["k"] and x["lo"] < y["hi"] and y["lo"] < x["hi"]
    )
    adf = spark.createDataFrame(
        [(r["aid"], r["k"], r["lo"], r["hi"]) for r in a],
        "aid long, k int, a_lo long, a_hi long",
    )
    bdf = spark.createDataFrame(
        [(r["bid"], r["k"], r["lo"], r["hi"]) for r in b],
        "bid long, k int, b_lo long, b_hi long",
    )
    got = sorted(
        (r["aid"], r["bid"])
        for r in bucketed_interval_join(
            adf, bdf, "a_lo", "a_hi", "b_lo", "b_hi",
            bucket_width, equi_keys=["k"],
        ).collect()
    )
    assert got == want and len(want) > 0
