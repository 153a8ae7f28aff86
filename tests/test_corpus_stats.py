"""Unigram log-probability scoring and PMI co-occurrence."""

import math

import pytest

from parquet_converters_spark.functions.corpus_stats import (
    pmi_pairs,
    unigram_logprob,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "a a b"),
        (1, "a b"),
        (2, "a c"),
        (3, "x y"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_unigram_logprob_hand_computed(corpus):
    # corpus tokens: a,a,b | a,b | a,c | x,y -> 9 tokens; tf: a=4 b=2 c=1 x=1 y=1
    got = {r.doc_id: r for r in unigram_logprob(corpus).collect()}
    pa, pb = 4 / 9, 2 / 9
    assert got[0].n_tokens == 3
    expect0 = (2 * math.log(pa) + math.log(pb)) / 3
    assert got[0].avg_logprob == pytest.approx(expect0)
    # rare-token doc scores lower than common-token doc
    assert got[3].avg_logprob < got[1].avg_logprob


def test_pmi_positive_for_associated_pair(spark):
    rows = [(i, "a b") for i in range(8)] + [(8, "a"), (9, "b"), (10, "c d")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(r.tok_a, r.tok_b): r for r in pmi_pairs(docs, min_pair_docs=2).collect()}
    r = got[("a", "b")]
    # n_ab=8, df_a=9, df_b=9, N=11 -> pmi = ln(88/81) > 0
    assert r.n_ab == 8
    assert r.pmi == pytest.approx(math.log(8 * 11 / 81))
    # pairs below min_pair_docs are cut
    assert ("c", "d") not in got


def test_pmi_counts_document_presence_not_tf(spark):
    """Repeating a token inside one doc must not inflate n_ab."""
    docs = spark.createDataFrame(
        [(i, "a a a b b") for i in range(5)], ["doc_id", "text"]
    )
    got = pmi_pairs(docs, min_pair_docs=1).collect()
    assert len(got) == 1 and got[0].n_ab == 5


def test_source_distinctive_terms_ranks_group_specific_tokens(spark):
    """A token exclusive to one group must outrank everywhere-tokens
    of equal frequency (smoothed c-TF-IDF)."""
    from parquet_converters_spark.functions.corpus_stats import (
        source_distinctive_terms,
    )

    rows = [
        ("a", "common common quantum quantum"),
        ("b", "common common stocks stocks"),
        ("c", "common common common common"),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    out = source_distinctive_terms(df, group_col="source", top_k=1).collect()
    top = {r["grp"]: r["token"] for r in out}
    # 'quantum'/'stocks' have df=1 -> ln(1+3) beats 'common' ln(1+1)
    assert top["a"] == "quantum"
    assert top["b"] == "stocks"
    assert top["c"] == "common"
