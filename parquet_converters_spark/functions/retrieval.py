"""Text retrieval over the documents corpus: inverted index, TF-IDF,
and BM25 ranking.

These are the query-side counterparts of the dedup/quality operators in
:mod:`parquet_converters_spark.functions.text` — a training-data
pipeline needs them for corpus exploration ("which documents mention
X"), importance weighting, and retrieval-based decontamination.

All three are pure DataFrame programs over one tokenize-explode pass:

``term_freqs``        (doc_id, token, tf)            one shuffle on (doc_id, token)
``inverted_index``    (token, df, total_tf, ...)     + one shuffle on token
``tfidf_terms``       (doc_id, token, tfidf)         + broadcast of the 1-row corpus stats
``bm25_rank``         (doc_id, score)                + broadcast of the tiny term-idf table

Scale notes (100 TB corpus):

- The explode output is |tokens| rows but it is *immediately* hash-
  aggregated on (doc_id, token) with map-side partial aggregation, so
  the shuffle carries one row per distinct (doc, term), not per token
  occurrence.
- Corpus-level scalars (N, avgdl) are single-row aggregates; Spark
  broadcasts them in the cross join (BroadcastNestedLoopJoin over one
  row — constant cost).
- BM25 filters the posting table to the query's terms *before* any
  join (predicate pushdown through the aggregate), so the per-query
  cost is O(postings of the query terms), not O(corpus).

Reference parity: the reference engine has no text retrieval; this is
part of the LLM-data-pipeline extension surface mandated by the build
brief (BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parquet_converters_spark.functions.text import tokens

__all__ = ["term_freqs", "inverted_index", "tfidf_terms", "bm25_rank"]


def term_freqs(
    docs: DataFrame, text_col: str = "text", doc_id_col: str = "doc_id"
) -> DataFrame:
    """Per-document term frequencies: (doc_id, token, tf).

    One explode + one hash aggregate; the map-side partial combine means
    the shuffle carries distinct (doc, term) pairs only.
    """
    return (
        docs.select(
            F.col(doc_id_col).alias("doc_id"),
            F.explode(tokens(text_col)).alias("token"),
        )
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def doc_lengths(
    docs: DataFrame, text_col: str = "text", doc_id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, dl) — token count per document, no explode needed."""
    return docs.select(
        F.col(doc_id_col).alias("doc_id"),
        F.size(tokens(text_col)).cast("long").alias("dl"),
    )


def inverted_index(
    docs: DataFrame, text_col: str = "text", doc_id_col: str = "doc_id"
) -> DataFrame:
    """Corpus inverted index: one row per token with document frequency,
    total term frequency, and the min/max doc id of its posting list.

    The full posting *list* stays distributed (it IS ``term_freqs``);
    this materializes the per-token summary a query planner or a
    vocabulary pruner consumes.  Posting lists are deliberately not
    collected into arrays: at 100 TB a stopword's posting list is
    billions of entries and must never be a single row.
    """
    return (
        term_freqs(docs, text_col, doc_id_col)
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").alias("total_tf"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


def tfidf_terms(
    docs: DataFrame,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, token, tf, tfidf) with the classic smoothed idf
    ``ln((N + 1) / (df + 1)) + 1`` (sklearn's smooth_idf formulation —
    public knowledge, avoids div-by-zero without dropping terms).
    """
    tf = term_freqs(docs, text_col, doc_id_col)
    df_tbl = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        tf.join(F.broadcast(df_tbl), "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            "tf",
            (
                F.col("tf").cast("double")
                * (
                    F.log(
                        (F.col("n_docs") + F.lit(1.0))
                        / (F.col("df") + F.lit(1.0))
                    )
                    + F.lit(1.0)
                )
            ).alias("tfidf"),
        )
    )


def bm25_rank(
    docs: DataFrame,
    terms: list[str],
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Rank documents against a bag-of-words query with Okapi BM25.

    score(d) = sum over query terms t of
        idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))
    with idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)).

    Plan shape: the posting table is filtered to the query terms before
    the doc-length join, so the joined relation is O(matching postings).
    Both the per-term idf table (|terms| rows) and the corpus stats
    (1 row) broadcast.  Returns (doc_id, n_terms, score) for every
    document matching at least one term.
    """
    if not terms:
        raise ValueError("bm25_rank requires at least one query term")
    tf = term_freqs(docs, text_col, doc_id_col).where(
        F.col("token").isin([t.lower() for t in terms])
    )
    dl = doc_lengths(docs, text_col, doc_id_col)
    stats = docs.select(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size(tokens(text_col))).alias("avgdl"),
    )
    df_tbl = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    idf = df_tbl.crossJoin(F.broadcast(stats)).select(
        "token",
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        ).alias("idf"),
        "avgdl",
    )
    scored = (
        tf.join(F.broadcast(idf), "token")
        .join(dl, "doc_id")
        .select(
            "doc_id",
            "token",
            (
                F.col("idf")
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1
                    * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("term_score"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum("term_score").alias("score"),
    )
