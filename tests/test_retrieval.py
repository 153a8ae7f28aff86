"""Retrieval operators: inverted index, TF-IDF, BM25.

BM25 is checked against a hand-computed score on a 4-doc corpus; the
corpus-level queries are covered by the DuckDB oracle
(scripts/check_oracle_parity.py) like every other registry entry.
"""

import math

import pytest
from pyspark.sql import functions as F

from parquet_converters_spark.functions.retrieval import (
    bm25_rank,
    doc_lengths,
    inverted_index,
    term_freqs,
    tfidf_terms,
)


@pytest.fixture(scope="module")
def tiny_docs(spark):
    rows = [
        (0, "spark join window spark"),
        (1, "join table scan"),
        (2, "window window window filter"),
        (3, "spark"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_term_freqs(tiny_docs):
    got = {
        (r.doc_id, r.token): r.tf for r in term_freqs(tiny_docs).collect()
    }
    assert got[(0, "spark")] == 2
    assert got[(2, "window")] == 3
    assert (1, "spark") not in got


def test_doc_lengths(tiny_docs):
    got = {r.doc_id: r.dl for r in doc_lengths(tiny_docs).collect()}
    assert got == {0: 4, 1: 3, 2: 4, 3: 1}


def test_inverted_index(tiny_docs):
    got = {r.token: r for r in inverted_index(tiny_docs).collect()}
    assert got["spark"].df == 2 and got["spark"].total_tf == 3
    assert got["window"].df == 2 and got["window"].total_tf == 4
    assert got["spark"].first_doc == 0 and got["spark"].last_doc == 3


def test_tfidf_smoothed_idf(tiny_docs):
    got = {
        (r.doc_id, r.token): r.tfidf
        for r in tfidf_terms(tiny_docs).collect()
    }
    # N=4, df(spark)=2 -> idf = ln(5/3)+1; doc 0 has tf=2
    expect = 2.0 * (math.log(5.0 / 3.0) + 1.0)
    assert got[(0, "spark")] == pytest.approx(expect)


def test_bm25_hand_computed(tiny_docs):
    k1, b = 1.2, 0.75
    scores = {
        r.doc_id: r.score
        for r in bm25_rank(tiny_docs, ["spark"], k1=k1, b=b).collect()
    }
    # N=4, df=2 -> idf = ln(1 + 2.5/2.5) = ln 2; avgdl = 3.0
    idf = math.log(2.0)

    def s(tf, dl):
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / 3.0))

    assert scores[0] == pytest.approx(s(2, 4))
    assert scores[3] == pytest.approx(s(1, 1))
    assert set(scores) == {0, 3}
    # shorter doc with the same tf outranks the longer one
    assert scores[3] > s(1, 4)


def test_bm25_requires_terms(tiny_docs):
    with pytest.raises(ValueError):
        bm25_rank(tiny_docs, [])


def test_bm25_idf_table_broadcasts(spark, sf_dir):
    """At corpus scale the per-term idf table (|query terms| rows) and
    the 1-row corpus stats must broadcast — the only shuffles are the
    tf aggregate and the doc_id join."""
    from parquet_converters_spark.queries import bm25_search

    plan = (
        bm25_search(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_registry_queries(spark, sf_dir):
    from parquet_converters_spark.queries import (
        bm25_search,
        inverted_index_stats,
        tfidf_top_terms,
    )

    inv = inverted_index_stats(spark, sf_dir).collect()
    assert 0 < len(inv) <= 30
    assert all(r.df >= 1 and r.total_tf >= r.df for r in inv)

    top = tfidf_top_terms(spark, sf_dir).collect()
    assert len(top) > 0
    assert all(1 <= r.rk <= 3 for r in top)

    ranked = bm25_search(spark, sf_dir).collect()
    assert 0 < len(ranked) <= 25
    scores = [r.score for r in ranked]
    assert scores == sorted(scores, reverse=True)
