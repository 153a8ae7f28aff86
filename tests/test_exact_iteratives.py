"""Cross-engine-exact iterative fits (kmeans_fit_exact,
power_iteration_pc1_exact): pure-Python integer replicas must match
bit-for-bit — these variants exist precisely so the DuckDB oracle can
replay them hash-exactly (queries.KMEANS_DOC_SQL / EMBED_PC1_SQL).
"""

import hashlib
from decimal import ROUND_HALF_UP, Decimal
from math import sqrt

import pytest

from parquet_converters_spark.operators.clustering import kmeans_fit_exact
from parquet_converters_spark.operators.linalg import (
    power_iteration_pc1_exact,
    round_half_away,
)


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _rha(x: float) -> int:
    return int(Decimal(x).quantize(Decimal(1), rounding=ROUND_HALF_UP))


def _quantize(vecs, scale):
    return [[_rha(float(x) * scale) for x in v] for v in vecs]


def _py_kmeans_exact(ids, qvecs, k, iters, sample):
    """Integer replica of kmeans_fit_exact: greedy farthest init over
    the min-h32 sample, argmin ties -> lowest cluster, round(sum/n)
    centroid update, fixed iterations."""
    order = sorted(range(len(ids)), key=lambda i: (_h32(str(ids[i])), ids[i]))
    samp = [qvecs[i] for i in order[:sample]]
    chosen = [0]
    d = [sum((a - b) ** 2 for a, b in zip(v, samp[0])) for v in samp]
    while len(chosen) < k:
        far = max(range(len(samp)), key=lambda i: (d[i], -i))
        chosen.append(far)
        nv = samp[far]
        for i, v in enumerate(samp):
            d2 = sum((a - b) ** 2 for a, b in zip(v, nv))
            if d2 < d[i]:
                d[i] = d2
    cents = [list(samp[i]) for i in chosen]

    def assign(q):
        ds = [sum((a - b) ** 2 for a, b in zip(q, c)) for c in cents]
        m = min(ds)
        return ds.index(m), m

    for _ in range(iters):
        sums = [[0] * len(qvecs[0]) for _ in range(k)]
        counts = [0] * k
        for q in qvecs:
            c, _d = assign(q)
            counts[c] += 1
            for i, x in enumerate(q):
                sums[c][i] += x
        cents = [
            [_rha(float(sums[c][i]) / counts[c]) for i in range(len(sums[c]))]
            if counts[c]
            else cents[c]
            for c in range(k)
        ]
    return cents, {ids[j]: assign(qvecs[j]) for j in range(len(ids))}


@pytest.fixture(scope="module")
def emb_rows(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )


def test_kmeans_exact_matches_python_replica(spark, sf_dir, emb_rows):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    k, iters, scale, sample = 4, 3, 10**6, 64
    assigned, cents = kmeans_fit_exact(
        emb, "embedding", "vec_id", k,
        iterations=iters, scale=scale, sample_size=sample,
    )
    ids = [r.vec_id for r in emb_rows]
    qvecs = _quantize([r.embedding for r in emb_rows], scale)
    ref_cents, ref_assign = _py_kmeans_exact(ids, qvecs, k, iters, sample)
    assert cents == ref_cents  # exact integers, no tolerance
    got = {
        r.vec_id: (r.cluster, r.d2q)
        for r in assigned.collect()
    }
    assert got == ref_assign


def test_kmeans_exact_broadcast_matches_literal(spark, sf_dir):
    """The broadcast-matrix assignment path (codegen-cache form) must
    be bitwise-identical to the literal path: both run the same exact
    long fold, so centroids AND per-row (cluster, d2q) agree with no
    tolerance."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = {}
    for m in ("literal", "broadcast"):
        a, cents = kmeans_fit_exact(
            emb, "embedding", "vec_id", 4,
            iterations=3, sample_size=64, method=m,
        )
        out[m] = (
            cents,
            sorted((r.vec_id, r.cluster, r.d2q) for r in a.collect()),
        )
    assert out["literal"] == out["broadcast"]


def test_kmeans_exact_invariant_under_repartition(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    _, c1 = kmeans_fit_exact(
        emb, "embedding", "vec_id", 3, iterations=2, sample_size=32
    )
    _, c2 = kmeans_fit_exact(
        emb.repartition(7), "embedding", "vec_id", 3,
        iterations=2, sample_size=32,
    )
    assert c1 == c2  # bitwise: integer arithmetic is order-free


def _py_pc1_exact(qvecs, iters, scale):
    dim, n = len(qvecs[0]), len(qvecs)
    mu = [
        _rha(float(sum(q[i] for q in qvecs)) / n) for i in range(dim)
    ]
    c = [[q[i] - mu[i] for i in range(dim)] for q in qvecs]
    v = [0] * dim
    v[0] = scale
    for _ in range(iters):
        d = [sum(ci * vi for ci, vi in zip(row, v)) for row in c]
        w = [sum(c[r][i] * d[r] for r in range(n)) for i in range(dim)]
        mx = max(abs(x) for x in w)
        v = [_rha(float(x) * float(scale) / float(mx)) for x in w]
    d = [sum(ci * vi for ci, vi in zip(row, v)) for row in c]
    num = sum(x * x for x in d)
    for x in v:
        if x != 0:
            if x < 0:
                v = [-y for y in v]
            break
    den = sum(x * x for x in v)
    return (
        [float(x) / sqrt(float(den)) for x in v],
        float(num) / float(den) / float(scale * scale),
    )


def test_pc1_exact_matches_python_replica(spark, sf_dir, emb_rows):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    scale, iters = 10**6, 4
    loadings, eig = power_iteration_pc1_exact(
        emb, "embedding", iterations=iters, scale=scale
    )
    qvecs = _quantize([r.embedding for r in emb_rows], scale)
    ref_l, ref_eig = _py_pc1_exact(qvecs, iters, scale)
    assert loadings == ref_l  # same ints, same single IEEE ops
    assert eig == ref_eig


def test_pc1_exact_close_to_float_fit(spark, sf_dir):
    """The quantized fit is a real PC1: it must agree with the float
    power iteration to quantization precision on the direction it has
    converged to (same sign convention; compare |cos| of the spans)."""
    from parquet_converters_spark.operators.linalg import power_iteration_pc1

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    lq, eq = power_iteration_pc1_exact(emb, "embedding", iterations=12)
    lf, ef, _, _ = power_iteration_pc1(emb, "embedding", max_iter=12, tol=0.0)
    dot = abs(sum(a * b for a, b in zip(lq, lf)))
    assert dot > 0.999
    assert abs(eq - ef) / max(abs(ef), 1e-12) < 1e-2


def test_round_half_away_semantics():
    assert round_half_away(0.5) == 1
    assert round_half_away(-0.5) == -1
    assert round_half_away(2.5) == 3  # NOT banker's 2
    assert round_half_away(1.49999999) == 1
    assert round_half_away(-2.5) == -3


def test_kmeans_exact_overflow_guard(spark):
    """Per-cluster long sums must be GUARDED, not just documented:
    Spark's non-ANSI sum wraps silently past 2^63 while the DuckDB
    oracle sums to hugeint, so a wrap would silently desynchronize the
    fit from the oracle (ADVICE r06).  The guard piggybacks count and
    max|q| on the existing update aggregate (zero extra jobs) and
    raises whenever n_cluster * max|q| could reach 2^63."""
    # 4 identical rows at x=0.5, scale=4e18 -> q=2e18 each; one cluster
    # holds all 4 rows, so a per-dim sum worst case is 8e18 < 2^63 but
    # n * max|q| = 8e18 < 9.22e18 ... push to 8 rows -> 1.6e19 >= 2^63
    df = spark.createDataFrame(
        [(i, [0.5, 0.5]) for i in range(8)],
        "vec_id: long, embedding: array<double>",
    )
    with pytest.raises(OverflowError, match="wrap"):
        kmeans_fit_exact(
            df, "embedding", "vec_id", k=1, iterations=1,
            scale=4 * 10**18,
        )
    # comfortably inside the bound: same data, production-ish scale
    assigned, cents = kmeans_fit_exact(
        df, "embedding", "vec_id", k=1, iterations=1, scale=10**6
    )
    assert assigned.count() == 8
    assert cents == [[500000, 500000]]


def test_shared_embedding_dim_constant():
    """_PC1_DIM/_KM_DIM and the ANN/standardize oracle SQL all derive
    from queries._EMB_DIM — a corpus dim change is ONE edit, not a
    silent oracle/engine desync (ADVICE r06)."""
    from parquet_converters_spark import queries as q

    assert q._PC1_DIM is q._EMB_DIM
    assert q._KM_DIM is q._EMB_DIM
    assert f"generate_series(1, {q._EMB_DIM})" in q.EMBED_STANDARDIZE_SQL


def test_kmeans_fold_census_equals_separate_census(spark, sf_dir):
    """fold_census=True folds the final census INTO the last E-step
    pass (census-only: no M-step sums for centroids nothing uses), so
    iterations=n, fold_census=True must equal iterations=n-1 plus a
    separate final census — same census values, same centroids, one
    fewer corpus pass (VERDICT r06 item 5)."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    _a, cents_fold, census = kmeans_fit_exact(
        emb, "embedding", "vec_id", k=4, iterations=3, fold_census=True
    )
    assigned, cents_sep = kmeans_fit_exact(
        emb, "embedding", "vec_id", k=4, iterations=2
    )
    assert cents_fold == cents_sep
    sep = sorted(
        (r["cluster"], r["n"], int(r["d2"]))
        for r in assigned.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("d2q").cast("decimal(38,0)")).alias("d2"),
        )
        .collect()
    )
    assert census == sep
