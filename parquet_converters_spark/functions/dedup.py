"""Deduplication operators for large-scale training-data pipelines.

Four families, all shuffle-disciplined for 100 TB inputs:

- **exact**: content-hash groupBy — one shuffle on a 64-bit hash key,
  map-side partial aggregation, no full-text comparison.
- **MinHash + LSH**: shingle -> 32-bit hash -> k permuted mins ->
  banded bucket join.  Candidate generation is an equi-join on
  (band_id, band_signature) — Spark shuffles both sides on the bucket
  key, so cost is proportional to bucket collisions, never O(n^2).
- **SimHash**: 32-bit majority-vote fingerprint; near-dups share a
  fingerprint (or a nibble-banded variant of it).
- **n-gram Jaccard**: exact verification on candidate pairs only.

Hashing is ``int(md5(s)[:8], 16)`` + linear permutations
``(a*h + b) mod p`` with fixed constants — bit-for-bit reproducible in
the DuckDB oracle (and any other engine), which matters for auditing a
dedup run on 100 TB: no engine-private hash functions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from parquet_converters_spark.functions.text import shingles, tokens

#: 2^31-1.  The permutation domain must be comparable to the hash range:
#: with a much larger prime (say 2^61-1) a*h+b barely wraps, every
#: "permutation" is near-monotone in h, all minima pick the same
#: shingle, and MinHash degenerates (sketch similarity collapses to an
#: equality test on the globally-minimal shingle).
MERSENNE_PRIME = (1 << 31) - 1

#: fixed linear-permutation constants (a, b) for MinHash, frozen so every
#: engine agrees.  All < 2^31: with hashes reduced mod the prime,
#: a*h + b stays under 2^62 — no int64 overflow in Spark, DuckDB, or
#: anything else.
_MINHASH_COEFFS = [
    (433494437, 268435399), (479001599, 1046527), (87178291, 16769023),
    (268435459, 40503), (179424673, 104395301), (122949823, 15485863),
    (32452843, 49979687), (67867967, 86028121), (198491317, 217645177),
    (15485867, 32452867), (49979693, 67867979), (86028157, 2038074),
    (141650939, 160481183), (217645199, 122949829), (104395303, 179424691),
    (160481219, 433494449),
]


def h32(s: Column) -> Column:
    """Shared 32-bit content hash: first 8 hex chars of md5 as bigint.
    DuckDB equivalent: ``CAST(concat('0x', substr(md5(s),1,8)) AS BIGINT)``."""
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def content_hash(text: Column | str) -> Column:
    """64-bit exact-dedup key: first 15 hex chars of md5 (fits signed
    int64; collision odds at 100 TB doc counts ~ n^2 / 2^60)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: one row per distinct content hash, keeping the lowest
    id (deterministic winner) and the group size."""
    return (
        df.select(content_hash(text_col).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def minhash_signature(
    text: Column | str, num_hashes: int = 8, shingle_size: int = 3
) -> Column:
    """MinHash signature as a single column expression: array of
    ``num_hashes`` permuted minima over word-shingle hashes.
    Empty-shingle documents get MERSENNE_PRIME sentinels.

    The shingle-hash array is bound once (``text.bind``) so the md5
    pipeline runs once per row regardless of ``num_hashes``; batch
    pipelines can still prefer :func:`minhash_signatures` (explode +
    groupBy) when the signature feeds an aggregation anyway."""
    assert num_hashes <= len(_MINHASH_COEFFS)
    from parquet_converters_spark.functions.text import bind

    def perm(a, b):
        # factory keeps the lambda unary: PySpark reads higher-order
        # function arity from the Python signature (defaults included)
        return lambda h: ((h % MERSENNE_PRIME) * a + b) % MERSENNE_PRIME

    def _mins(hashes: Column) -> Column:
        return F.array(
            *[
                F.coalesce(
                    F.array_min(F.transform(hashes, perm(a, b))),
                    F.lit(MERSENNE_PRIME),
                )
                for a, b in _MINHASH_COEFFS[:num_hashes]
            ]
        )

    return bind(F.transform(shingles(text, shingle_size), h32), _mins)


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_size: int = 3,
) -> DataFrame:
    """(id, signature) MinHash signatures, computed the scale-friendly
    way: explode shingle hashes (md5 once per shingle), then one
    hash-aggregate with ``num_hashes`` ``min`` accumulators — a single
    narrow map + one shuffle on the id, regardless of ``num_hashes``."""
    assert num_hashes <= len(_MINHASH_COEFFS)
    ex = df.select(
        F.col(id_col).alias("_id"),
        F.explode_outer(F.transform(shingles(text_col, shingle_size), h32)).alias("_h"),
    )
    aggs = [
        F.coalesce(
            F.min(((F.col("_h") % MERSENNE_PRIME) * a + b) % MERSENNE_PRIME),
            F.lit(MERSENNE_PRIME),
        ).alias(f"_m{i}")
        for i, (a, b) in enumerate(_MINHASH_COEFFS[:num_hashes])
    ]
    return ex.groupBy("_id").agg(*aggs).select(
        F.col("_id").alias(id_col),
        F.array(*[F.col(f"_m{i}") for i in range(num_hashes)]).alias("signature"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_size: int = 3,
    jaccard_threshold: float | None = None,
    pair_distinct: bool = True,
) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash-LSH, optionally
    verified with exact shingle-set Jaccard.

    Plan shape (scale-critical): signature computation is a narrow map;
    banding explodes each doc into ``bands`` rows; candidates come from
    a self equi-join on (band, band_signature) — hash-shuffle on the
    bucket key, broadcast-free, skew handled by AQE.  Verification runs
    only on distinct candidate pairs.

    ``pair_distinct=False`` skips the cross-band pair dedup shuffle: a
    pair matching in several bands is then emitted once per band.  Only
    for consumers whose result is invariant to duplicate edges (e.g.
    connected components, whose own symmetric-edge ``distinct``
    subsumes this one) — the r17 one-shuffle-fewer funnel path.
    """
    rows_per_band = num_hashes // bands
    # r17: row-local signature expression instead of explode + groupBy —
    # same values bit-for-bit (identical permutation arithmetic over the
    # same shingle hashes; asserted mismatch-free on the corpus), but
    # ZERO shuffle before banding: the explode+groupBy form exchanges a
    # partial-agg row per document just to reassemble the signature.
    sig = df.select(
        F.col(id_col).alias("_id"),
        minhash_signature(text_col, num_hashes, shingle_size).alias("_sig"),
    )
    banded = sig.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.array_join(
                            F.transform(
                                F.slice("_sig", b * rows_per_band + 1, rows_per_band),
                                lambda x: x.cast("string"),
                            ),
                            "-",
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("_id", "bb.band", "bb.bucket")

    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
    )
    if pair_distinct or jaccard_threshold is not None:
        # verification must see each pair once (it scores per row)
        cand = cand.dropDuplicates(["id_a", "id_b"])

    if jaccard_threshold is None:
        return cand.select("id_a", "id_b")

    # verification joins the shingle sets back in by id (keeps the text
    # out of the banded explode + self-join shuffles)
    sh = df.select(
        F.col(id_col).alias("_vid"),
        F.array_distinct(shingles(text_col, shingle_size)).alias("_vsh"),
    )
    a = sh.select(F.col("_vid").alias("id_a"), F.col("_vsh").alias("_sh_a"))
    b = sh.select(F.col("_vid").alias("id_b"), F.col("_vsh").alias("_sh_b"))
    inter = F.size(F.array_intersect("_sh_a", "_sh_b"))
    union = F.size(F.array_union("_sh_a", "_sh_b"))
    jac = inter / F.greatest(union, F.lit(1))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def near_dedup_pipeline(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_size: int = 3,
    jaccard_threshold: float | None = None,
    pair_distinct: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Scale-safe near-dedup composition: exact dedup FIRST, MinHash-LSH
    over the unique-text representatives only.

    Why the order matters at 100 TB: a group of d exact duplicates
    lands in the same LSH bucket in every band and emits d(d-1)/2
    candidate pairs — quadratic in the duplication factor (measured:
    20x duplication of a 5k corpus -> 1.3M candidates instead of ~1k).
    Collapsing exact groups to their min-id representative first makes
    the LSH candidate count a function of *distinct* content only.

    Returns ``(groups, pairs)``: ``groups`` is the exact-dedup table
    (content_hash, keep_id, dup_count); ``pairs`` holds near-duplicate
    representative pairs (extend to members through ``groups``).
    """
    groups = exact_dedup(df, text_col, id_col)
    reps = df.join(
        groups.select(F.col("keep_id").alias(id_col)), id_col, "left_semi"
    )
    pairs = minhash_lsh_pairs(
        reps, text_col, id_col, num_hashes, bands, shingle_size,
        jaccard_threshold, pair_distinct=pair_distinct,
    )
    return groups, pairs


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
) -> DataFrame:
    """(id, simhash) fingerprints: bit b is set when the majority of
    token hashes have bit b set (sum of +-1 votes > 0).

    Explode + one hash-aggregate with ``bits`` sum accumulators.  The
    shuffle this plans is doc-level, not token-level: Spark's hash
    aggregate combines map-side, so each task emits one 32-int partial
    row per doc — and the vote arithmetic stays inside whole-stage
    codegen.  (Measured against a row-local ``bits``-fold HOF variant:
    the interpreted folds were ~60% slower despite being shuffle-free —
    codegen + map-side combine beats avoiding a doc-level exchange.)"""
    ex = df.select(
        F.col(id_col).alias("_id"),
        F.explode_outer(F.transform(tokens(text_col), h32)).alias("_h"),
    )
    votes = [
        F.sum(
            F.when(F.col("_h").isNull(), 0)
            .when(F.shiftright("_h", b).bitwiseAND(1) == 1, 1)
            .otherwise(-1)
        ).alias(f"_v{b}")
        for b in range(bits)
    ]
    grouped = ex.groupBy("_id").agg(*votes)
    out = F.lit(0).cast("long")
    for b in range(bits):
        out = out + F.when(F.col(f"_v{b}") > 0, F.lit(1 << b).cast("long")).otherwise(0)
    return grouped.select(F.col("_id").alias(id_col), out.alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str | None = None,
    n: int = 3,
    threshold: float = 0.5,
    allow_all_pairs: bool = False,
) -> DataFrame:
    """Exact n-gram-Jaccard similar pairs within ``group_col`` blocks
    (blocked self-join).

    ``group_col`` is required: without a blocking column the self-join
    is a full O(n^2) cross product, which no cluster survives at corpus
    scale.  Route candidates through :func:`minhash_lsh_pairs` (or any
    bucketing column) and use this as the exact verifier within blocks.
    ``allow_all_pairs=True`` opts into the cross product for tiny,
    deliberate inputs (e.g. verifying a candidate list already reduced
    to a few thousand rows).
    """
    if group_col is None and not allow_all_pairs:
        raise ValueError(
            "ngram_jaccard_pairs without group_col is an all-pairs cross "
            "join; pass a blocking column (e.g. an LSH bucket or lang), "
            "or opt in explicitly with allow_all_pairs=True on small input"
        )
    sh = F.array_distinct(shingles(text_col, n))
    base = df.select(
        F.col(id_col).alias("_id"),
        sh.alias("_sh"),
        *([F.col(group_col).alias("_grp")] if group_col else [F.lit(0).alias("_grp")]),
    )
    a, b = base.alias("a"), base.alias("b")
    inter = F.size(F.array_intersect(F.col("a._sh"), F.col("b._sh")))
    union = F.size(F.array_union(F.col("a._sh"), F.col("b._sh")))
    jac = inter / F.greatest(union, F.lit(1))
    return (
        a.join(
            b,
            (F.col("a._grp") == F.col("b._grp")) & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_neardup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 3,
    sig: DataFrame | None = None,
) -> DataFrame:
    """SimHash near-duplicate pairs (hamming distance <= ``max_hamming``)
    via banded bucket join — never an all-pairs comparison.

    ``sig``: pass an already-materialized ``(id, simhash)`` table (from
    :func:`simhash`) when the fingerprints are shared with other
    outputs; otherwise they are computed here.

    Pigeonhole exactness: splitting ``bits`` into ``bands`` equal bands,
    any pair within hamming distance ``bands - 1`` agrees exactly on at
    least one band, so the banded equi-join loses no qualifying pair as
    long as ``max_hamming < bands``.  Join cost is proportional to
    per-band bucket collisions (shuffle on (band, value)), the same
    scale shape as MinHash-LSH.
    """
    if bits % bands != 0:
        raise ValueError("bits must divide evenly into bands")
    if max_hamming >= bands:
        raise ValueError(
            f"max_hamming={max_hamming} needs > {max_hamming} bands for the "
            "pigeonhole guarantee; raise bands or lower max_hamming"
        )
    band_bits = bits // bands
    mask = (1 << band_bits) - 1
    if sig is None:
        sig = simhash(df, text_col, id_col, bits)
    banded = sig.select(
        F.col(id_col).alias("_id"),
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("b"),
                        F.shiftright("simhash", band_bits * i)
                        .bitwiseAND(F.lit(mask))
                        .alias("v"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bd"),
    ).select("_id", "simhash", F.col("bd.b").alias("b"), F.col("bd.v").alias("v"))
    a, b = banded.alias("a"), banded.alias("b")
    ham = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    ).cast("int")
    return (
        a.join(
            b,
            (F.col("a.b") == F.col("b.b"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            ham.alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def near_dedup_survivors(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    cc_method: str = "hash_to_min",
    precomputed: tuple[DataFrame, DataFrame] | None = None,
    materialize: bool = False,
) -> DataFrame:
    """The end of the dedup funnel: the rows a training-data pipeline
    actually keeps.

    Composition (each stage scale-safe on its own):
    exact dedup -> min-id representatives -> MinHash-LSH pairs over
    representatives only -> connected components -> drop every doc that
    is not its cluster's minimum.  Returns the surviving subset of
    ``df`` (all original columns).

    ``precomputed``: pass an already-materialized ``(groups, pairs)``
    from :func:`near_dedup_pipeline` when the candidate set is shared
    with other outputs (clusters, pair reports) — at scale the
    candidate join is the expensive stage and should run once.

    ``materialize=True`` returns an EAGER localCheckpoint of the result
    and releases the connected-components label checkpoint it subsumes
    (`session.free_local_checkpoints`) — the no-residue form for
    long-lived sessions; the default stays lazy (the CC checkpoint then
    remains pinned while the returned frame is alive, because its
    recompute lineage needs it).
    """
    from parquet_converters_spark.operators.graph import connected_components
    from parquet_converters_spark.session import free_local_checkpoints

    if precomputed is not None:
        groups, pairs = precomputed
    else:
        # pairs feed ONLY connected components here, whose symmetric-edge
        # distinct makes the cross-band pair dedup redundant (r17)
        groups, pairs = near_dedup_pipeline(
            df, text_col, id_col, num_hashes=num_hashes, bands=bands,
            pair_distinct=False,
        )
    comps = connected_components(pairs, src="id_a", dst="id_b", method=cc_method)
    losers = comps.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    reps = df.join(groups.select(F.col("keep_id").alias(id_col)), id_col, "left_semi")
    out = reps.join(losers, id_col, "left_anti")
    if materialize:
        out = out.localCheckpoint(eager=True)
        free_local_checkpoints(comps)
    return out


def contamination_flags(
    train_df: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_hits: int = 2,
) -> DataFrame:
    """Benchmark decontamination: flag every training document sharing
    at least ``min_hits`` word n-gram shingles with ANY eval document.

    Plan shape (the part that matters at 100 TB train / tiny eval):
    the eval side collapses to a distinct shingle set — small enough to
    BROADCAST — so the training side is one narrow explode + broadcast
    hash join + per-doc count.  The 100 TB table shuffles once (the
    per-doc aggregation), never against the eval set.  Returns
    (id, eval_shingle_hits, contaminated) for every training row.
    """
    eval_sh = (
        eval_df.select(
            F.explode(F.array_distinct(shingles(text_col, n))).alias("_sh")
        ).distinct()
    )
    train_ex = train_df.select(
        F.col(id_col),
        F.explode_outer(F.array_distinct(shingles(text_col, n))).alias("_sh"),
    )
    hits = (
        train_ex.join(F.broadcast(eval_sh), "_sh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("eval_shingle_hits"))
    )
    return train_df.select(id_col).join(hits, id_col, "left").select(
        id_col,
        F.coalesce("eval_shingle_hits", F.lit(0).cast("long")).alias(
            "eval_shingle_hits"
        ),
        (
            F.coalesce("eval_shingle_hits", F.lit(0).cast("long"))
            >= min_hits
        ).alias("contaminated"),
    )


def shingle_containment(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_size: int = 3,
) -> DataFrame:
    """Asymmetric containment for candidate pairs: what fraction of
    each side's distinct shingles the pair has in common.

    Jaccard misses *containment* duplication — a document quoted
    wholesale inside a longer one scores low Jaccard but containment
    ~1.0 on the short side.  Output per (id_a, id_b): ``n_common``,
    ``containment_a`` (= common/|shingles(a)|) and ``containment_b``.

    Plan: the docs table is first semi-joined down to ids that appear
    in any candidate pair, then exploded once into distinct
    (id, shingle) rows — O(candidate docs), never the corpus.  The
    intersection is an equi-join on (pair, shingle) keys; sizes join
    back broadcast-ably (one row per candidate doc).
    """
    ids = (
        pairs.select(F.col("id_a").alias("_id"))
        .unionByName(pairs.select(F.col("id_b").alias("_id")))
        .distinct()
    )
    sh = (
        docs.join(ids, docs[id_col] == ids._id, "leftsemi")
        .select(
            F.col(id_col).alias("_id"),
            F.explode(F.array_distinct(shingles(text_col, shingle_size))).alias("_s"),
        )
    )
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sa, sb = sh.alias("sa"), sh.alias("sb")
    common = (
        pairs.select("id_a", "id_b")
        .join(sa, F.col("id_a") == F.col("sa._id"))
        .join(
            sb,
            (F.col("id_b") == F.col("sb._id"))
            & (F.col("sa._s") == F.col("sb._s")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    za, zb = sizes.alias("za"), sizes.alias("zb")
    return (
        pairs.select("id_a", "id_b")
        .join(common, ["id_a", "id_b"], "left")
        .join(za, F.col("id_a") == F.col("za._id"))
        .join(zb, F.col("id_b") == F.col("zb._id"))
        .select(
            "id_a",
            "id_b",
            F.coalesce(F.col("n_common"), F.lit(0)).alias("n_common"),
            (F.coalesce(F.col("n_common"), F.lit(0)) / F.col("za.n_sh")).alias(
                "containment_a"
            ),
            (F.coalesce(F.col("n_common"), F.lit(0)) / F.col("zb.n_sh")).alias(
                "containment_b"
            ),
        )
    )


def duplicated_shingle_fraction(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document fraction of its distinct word n-gram shingles that
    occur in at least one OTHER document — the corpus-level
    "duplicated n-grams" diagnostic of web-scale pipeline papers
    (RefinedWeb/C4 style): high fractions flag boilerplate and
    template text that pairwise dedup misses.

    One explode + ONE shuffle: document frequency comes from a
    ``count over (partition by shingle)`` window rather than a
    groupBy + join back (which would shuffle the exploded table
    twice).  Per-shingle frequency is bounded by corpus df, so the
    skew ceiling is the most-common shingle — at 100 TB, hash the
    shingle (h32) to shrink shuffle width before partitioning.

    Returns (id, extra_cols..., n_shingles, n_duplicated, dup_frac).
    """
    sh = df.select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        F.explode(F.array_distinct(shingles(text_col, n))).alias("_sh"),
    )
    w = Window.partitionBy("_sh")
    # a shingle is "duplicated" when another document also has it:
    # per-shingle doc-frequency > 1 (rows are distinct per doc)
    flagged = sh.withColumn("_df", F.count(F.lit(1)).over(w))
    return (
        flagged.groupBy(id_col, *extra_cols)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("_df") > 1, 1).otherwise(0)).alias("n_duplicated"),
        )
        .withColumn(
            "dup_frac", F.col("n_duplicated") / F.greatest("n_shingles", F.lit(1))
        )
    )


def cross_source_shingles(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Cross-corpus contamination matrix: for every pair of groups
    (sources), how many distinct word n-gram shingles they share.

    Plan shape for 100 TB: distinct (group, shingle) pairs, then a
    groupBy(shingle) collecting the <=|groups| group set — group-pair
    expansion happens on that tiny per-shingle set, never via a
    shingle-level self-join (which would square the corpus).  The
    output is |groups|^2-bounded regardless of corpus size.
    """
    from parquet_converters_spark.functions.text import shingles

    sh = (
        docs.select(
            F.col(group_col).alias("_grp"),
            F.explode(F.array_distinct(shingles(text_col, n))).alias("_s"),
        )
        .distinct()
    )
    per_shingle = (
        sh.groupBy("_s")
        .agg(F.array_sort(F.collect_set("_grp")).alias("_gs"))
        .filter(F.size("_gs") >= 2)
    )
    pairs = per_shingle.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("_gs"),
                    lambda a, i: F.transform(
                        F.slice(F.col("_gs"), i + 2, F.size(F.col("_gs"))),
                        lambda b: F.struct(a.alias("src_a"), b.alias("src_b")),
                    ),
                )
            )
        ).alias("_p")
    )
    return (
        pairs.select("_p.src_a", "_p.src_b")
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def span_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_words: int = 8,
    max_df: int = 1,
) -> DataFrame:
    """Cross-document duplicated-span removal (the C4 "repeated
    three-sentence span" / CCNet line-dedup step, adapted to span
    grain): cut each document into consecutive ``span_words``-word
    spans, drop every span whose exact text occurs in more than
    ``max_df`` documents, and rebuild the surviving text in original
    span order.

    Plan shape for 100 TB: one explode to (doc, pos, span); document
    frequency from a distinct (doc, span) projection + one hash
    aggregate (NOT a window over the exploded table); flags joined
    back on the span key; reconstruction is a single groupBy(doc)
    collecting (pos, span) structs — ``array_sort`` orders by pos
    inside the aggregate, so there is no per-document window.  The
    span-keyed shuffle is bounded by distinct-span cardinality; at
    100 TB substitute ``xxhash64(span)`` as the join key to shrink
    shuffle width (collision odds ~n²/2⁶⁴, acceptable for dedup).

    Returns (id, n_spans, n_dropped, new_text) — one row per document,
    ``new_text`` empty when everything was boilerplate.
    """
    words = F.split(F.col(text_col), " ")
    n_spans = F.ceil(F.size(words) / F.lit(float(span_words))).cast("int")
    spans = df.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_spans - 1),
                lambda i: F.array_join(
                    F.slice(words, i * span_words + 1, span_words), " "
                ),
            )
        ).alias("_pos", "_span"),
    )
    docfreq = (
        spans.select(id_col, "_span")
        .distinct()
        .groupBy("_span")
        .agg(F.count(F.lit(1)).alias("_df"))
    )
    flagged = spans.join(docfreq, "_span").withColumn(
        "_kept", F.col("_df") <= max_df
    )
    kept_struct = F.when(
        F.col("_kept"), F.struct(F.col("_pos"), F.col("_span"))
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum((~F.col("_kept")).cast("long")).alias("n_dropped"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda s: s["_span"],
                ),
                " ",
            ).alias("new_text"),
        )
    )


def signature_band_buckets(
    sig: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """Explode (id, signature) MinHash rows into banded LSH bucket keys
    (id, band, bucket) — the probe/index grain for bucketed candidate
    joins.  ``bucket`` is the joined string of the band's signature
    slice, identical to the in-line banding of ``minhash_lsh_pairs``."""
    rows_per_band = num_hashes // bands
    return sig.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.array_join(
                            F.transform(
                                F.slice(
                                    "signature",
                                    b * rows_per_band + 1,
                                    rows_per_band,
                                ),
                                lambda x: x.cast("string"),
                            ),
                            "-",
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_bb"),
    ).select(id_col, "_bb.band", "_bb.bucket")
