"""Iterative BPE merge learning: hand-traced vector + an independent
pure-Python reference implementation on generated text.

The reference below is the textbook word-frequency BPE loop written
with tuples and dicts — no string-replace encoding, no Spark — so an
encoding bug in learn_bpe_merges's double-space scheme cannot cancel
out in the comparison.
"""

import random
import re

from parquet_converters_spark.functions.text import learn_bpe_merges


def _ref_bpe(texts, steps):
    words = {}
    for t in texts:
        for w in re.findall("[a-z0-9]+", t.lower()):
            words[w] = words.get(w, 0) + 1
    vocab = {tuple(w): f for w, f in words.items()}
    out = []
    for step in range(1, steps + 1):
        counts = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pair = (syms[i], syms[i + 1])
                counts[pair] = counts.get(pair, 0) + f
        if not counts:
            break
        (left, right), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        out.append((step, left, right, left + right, n))
        new_vocab = {}
        for syms, f in vocab.items():
            merged, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    merged.append(left + right)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            key = tuple(merged)
            new_vocab[key] = new_vocab.get(key, 0) + f
        vocab = new_vocab
    return out


def _run(spark, texts, steps):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = learn_bpe_merges(df, steps=steps).orderBy("step").collect()
    return [(r.step, r.left, r.right, r.merged, r.n) for r in rows]


def test_hand_traced_vector(spark):
    # corpus: aaab x2, ab x1 -> (a,a):4, then (a,b):3, then (aa,ab):2,
    # then no pairs remain (all words are single symbols).
    got = _run(spark, ["aaab aaab", "ab"], steps=6)
    assert got == [
        (1, "a", "a", "aa", 4),
        (2, "a", "b", "ab", 3),
        (3, "aa", "ab", "aaab", 2),
    ]


def test_adjacent_overlap_is_greedy_left_to_right(spark):
    # 'aaa' must merge as [aa, a], so step 2 sees the (aa, a) pair.
    got = _run(spark, ["aaa aaa aaa"], steps=2)
    assert got[0] == (1, "a", "a", "aa", 6)
    assert got[1] == (2, "aa", "a", "aaa", 3)


def test_matches_independent_reference_on_generated_text(spark):
    rng = random.Random(1234)
    syll = ["ba", "na", "to", "ka", "ri", "mo", "s", "x9"]
    texts = [
        " ".join(
            "".join(rng.choices(syll, k=rng.randint(1, 4)))
            for _ in range(rng.randint(3, 12))
        )
        for _ in range(60)
    ]
    want = _ref_bpe(texts, 8)
    got = _run(spark, texts, 8)
    assert got == want
    assert len(got) == 8


def test_multichar_merge_does_not_cross_token_boundaries(spark):
    # 'ab' inside 'cab' must merge, but the c|a boundary never pairs
    # with a neighbouring word (words are independent sequences).
    got = _run(spark, ["cab cab ab ab ab"], steps=1)
    assert got == [(1, "a", "b", "ab", 5)]


def test_token_counts_match_reference_encoding(spark):
    from parquet_converters_spark.functions.text import bpe_token_counts

    rng = random.Random(77)
    syll = ["to", "ka", "ri", "mo", "ban", "an"]
    texts = [
        " ".join(
            "".join(rng.choices(syll, k=rng.randint(1, 3)))
            for _ in range(rng.randint(2, 8))
        )
        for _ in range(40)
    ]
    # independent reference: run the dict-based BPE, then count tokens
    words = {}
    for t in texts:
        for w in re.findall("[a-z0-9]+", t.lower()):
            words[w] = words.get(w, 0) + 1
    vocab = {tuple(w): f for w, f in words.items()}
    for _step, left, right, _m, _n in _ref_bpe(texts, 5):
        new_vocab = {}
        for syms, f in vocab.items():
            merged, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    merged.append(left + right)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            key = tuple(merged)
            new_vocab[key] = new_vocab.get(key, 0) + f
        vocab = new_vocab
    want = {}
    for syms, f in vocab.items():
        for s in syms:
            want[s] = want.get(s, 0) + f

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {
        r.token: r.n for r in bpe_token_counts(df, steps=5).collect()
    }
    assert got == want

def test_token_census_oracle_degenerate_corpus_agrees(spark):
    """r16 ADVICE: this corpus exhausts merge pairs at step 3 (all
    words collapse to single symbols); the unrolled DuckDB oracle's
    empty t4..t6 rounds must KEEP the last vocabulary (LEFT JOIN +
    COALESCE), mirroring the engine's early break — the old cross
    join wiped w4..w6 and returned an empty census."""
    import duckdb
    import pandas as pd

    from parquet_converters_spark.functions.text import bpe_token_counts
    from parquet_converters_spark.queries import BPE_TOKEN_CENSUS_SQL

    texts = ["aaab aaab", "ab"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {
        (r.token, r.n)
        for r in bpe_token_counts(df, steps=6).collect()
    }
    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"text": texts}))
    want = {
        (t, int(n))
        for t, n in con.execute(BPE_TOKEN_CENSUS_SQL).fetchall()
    }
    assert got  # the wipe bug returned an empty census
    assert want == got


def test_bpe_learn_failed_materialize_unpersists_fresh_cache(
    spark, monkeypatch
):
    """r16 ADVICE: when the materializing count() fails right after
    nxt.persist(), the error path must unpersist BOTH frames — the old
    handler only knew `words` (still the parent) and leaked nxt's
    cache for the session."""
    import pytest

    # patch the CONCRETE class: pyspark.sql.DataFrame is an abstract
    # facade in Spark 4 whose subclass overrides these methods
    from pyspark.sql.classic.dataframe import DataFrame

    from parquet_converters_spark.functions.text import _bpe_learn

    persisted, unpersisted = [], []
    orig_persist = DataFrame.persist
    orig_unpersist = DataFrame.unpersist

    def persist(self, *a, **k):
        persisted.append(self)
        return orig_persist(self, *a, **k)

    def unpersist(self, *a, **k):
        unpersisted.append(self)
        return orig_unpersist(self, *a, **k)

    def count(self):
        raise RuntimeError("boom: simulated materialize failure")

    monkeypatch.setattr(DataFrame, "persist", persist)
    monkeypatch.setattr(DataFrame, "unpersist", unpersist)
    monkeypatch.setattr(DataFrame, "count", count)
    df = spark.createDataFrame([("aaab aaab",), ("ab",)], "text string")
    with pytest.raises(RuntimeError, match="boom"):
        _bpe_learn(df, "text", steps=3)
    assert {id(x) for x in persisted} == {id(x) for x in unpersisted}
