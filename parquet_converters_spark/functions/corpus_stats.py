"""Corpus-level statistical scoring: unigram log-probability (the
cheap stand-in for a perplexity quality filter) and PMI token
co-occurrence.

Both are the standard two-pass shape: a corpus statistics table is
aggregated once (tiny — one row per vocabulary term), broadcast, and
joined back against per-document rows.  The fact-side explode never
shuffles by token for the scoring pass; only the stats aggregation
does, with map-side partials.

Scale notes (100 TB): the vocabulary table is the broadcast side —
real corpora cap it (e.g. top-1M terms) so it stays broadcastable;
``min_df`` is the hook.  The PMI self-join is per-document over
*distinct* tokens and must be bounded by a vocabulary prune at real
scale (``min_df`` / stopword cut), not run raw — the docstring of
``pmi_pairs`` states the bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parquet_converters_spark.functions.text import tokens

__all__ = ["unigram_logprob", "pmi_pairs", "source_distinctive_terms"]


def unigram_logprob(
    docs: DataFrame, text_col: str = "text", doc_id_col: str = "doc_id"
) -> DataFrame:
    """Score each document by the mean log-probability of its tokens
    under the corpus unigram distribution — low scorers are
    out-of-distribution (boilerplate, wrong language, encoding junk),
    the classic cheap proxy for a perplexity filter.

    Returns (doc_id, n_tokens, avg_logprob).  The unigram table is one
    row per vocab term and broadcasts; the per-document aggregate
    shuffles on doc_id only.
    """
    tok = docs.select(
        F.col(doc_id_col).alias("doc_id"),
        F.explode(tokens(text_col)).alias("token"),
    )
    totals = tok.groupBy("token").agg(F.count(F.lit(1)).alias("tf_corpus"))
    n_total = tok.agg(F.count(F.lit(1)).alias("n_corpus"))
    probs = totals.crossJoin(F.broadcast(n_total)).select(
        "token",
        F.log(F.col("tf_corpus") / F.col("n_corpus")).alias("logp"),
    )
    return (
        tok.join(F.broadcast(probs), "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.avg("logp").alias("avg_logprob"),
        )
    )


def pmi_pairs(
    docs: DataFrame,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    min_pair_docs: int = 5,
) -> DataFrame:
    """Pointwise mutual information over document-level co-occurrence:
    ``pmi(a,b) = ln( (n_ab * N) / (n_a * n_b) )`` with document
    frequencies, for token pairs co-occurring in ≥ ``min_pair_docs``
    documents.

    The pair generator is a per-document self-join over *distinct*
    tokens — O(distinct_tokens²) per document.  At corpus scale this
    must run behind a vocabulary prune (min_df / top-k vocabulary) so
    the per-doc distinct count is bounded; the synthetic corpus's
    vocabulary is ~40 terms so the raw join is exact and cheap here.
    """
    # r18 (guide §2.4): document frequencies, co-occurrence pairs and
    # the doc count previously ran as FOUR independent branches that
    # each re-scanned the corpus and re-ran the regexp tokenizer (plan:
    # 5 scan-spread exchanges at bench layout).  Tokenize ONCE into a
    # per-document distinct-token array, materialized lazily; the
    # branches derive from it with narrow explodes.  The pair
    # generator stays the doc-keyed self-join: an A/B of the row-local
    # (i, j>i) array expansion measured SLOWER both windows (min 3.90
    # vs 2.21 s — building ~780 struct pairs per row loses to the
    # codegen streaming join at this vocabulary), so only the
    # redundant scans were removed.  n_docs counts basket rows, so
    # zero-token documents keep their row (no explode above it).
    basket = docs.select(
        F.col(doc_id_col).alias("doc_id"),
        F.array_distinct(tokens(text_col)).alias("_toks"),
    ).localCheckpoint(eager=False)
    dt = basket.select("doc_id", F.explode("_toks").alias("token"))
    n_docs = basket.agg(F.count(F.lit(1)).alias("n_docs"))
    df_tbl = dt.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    a, b = dt.alias("a"), dt.alias("b")
    pair_docs = (
        a.join(b, F.col("a.doc_id") == F.col("b.doc_id"))
        .where(F.col("a.token") < F.col("b.token"))
        .groupBy(
            F.col("a.token").alias("tok_a"),
            F.col("b.token").alias("tok_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= min_pair_docs)
    )
    da = df_tbl.select(F.col("token").alias("tok_a"), F.col("df").alias("df_a"))
    db = df_tbl.select(F.col("token").alias("tok_b"), F.col("df").alias("df_b"))
    return (
        pair_docs.join(F.broadcast(da), "tok_a")
        .join(F.broadcast(db), "tok_b")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "tok_a",
            "tok_b",
            "n_ab",
            F.log(
                (F.col("n_ab") * F.col("n_docs"))
                / (F.col("df_a") * F.col("df_b")).cast("double")
            ).alias("pmi"),
        )
    )


def source_distinctive_terms(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    top_k: int = 5,
) -> DataFrame:
    """c-TF-IDF (class-based TF-IDF, BERTopic-style): the terms most
    characteristic of each document group — term frequency within the
    group times ``ln(1 + n_groups / n_groups_containing_term)`` (the
    +1 smoothing keeps everywhere-terms at ln(2) instead of zeroing
    the whole score, matching the BERTopic formulation).  The "what is
    each source actually about" diagnostic a mixture designer runs
    before weighting sources.

    Plan shape for 100 TB: one explode + ONE hash aggregate to the
    (group, term) grain (map-side partials absorb the explosion);
    everything after — group-count scalar, per-term group-df window,
    per-group top-k window — runs on that vocabulary×groups table,
    which is orders smaller than the corpus.  No fact-side window,
    no self-join.

    Returns (group, token, tf, score, rank) with rank <= ``top_k``;
    score rounded to 6 decimals, ties broken by token so the ranking
    is engine-stable.
    """
    from pyspark.sql.window import Window

    gt = (
        docs.select(
            F.col(group_col).alias("grp"),
            F.explode(tokens(text_col)).alias("token"),
        )
        .groupBy("grp", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_groups = gt.select("grp").distinct().count()
    df_w = Window.partitionBy("token")
    score = F.round(
        F.col("tf")
        * F.log(
            1 + F.lit(float(n_groups)) / F.count(F.lit(1)).over(df_w)
        ),
        6,
    )
    rank_w = Window.partitionBy("grp").orderBy(
        F.col("score").desc(), F.col("token").asc()
    )
    return (
        gt.withColumn("score", score)
        .withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= top_k)
        .select("grp", "token", "tf", "score", "rank")
    )
