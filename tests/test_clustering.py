"""Distributed Lloyd's k-means: numpy cross-check, objective
monotonicity, blob recovery, edge cases."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import Row

from parquet_converters_spark.operators.clustering import (
    assign_clusters,
    kmeans_fit,
)


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _np_kmeans(ids, vecs, k, n_iter):
    """Reference implementation mirroring kmeans_fit exactly: h32-seeded
    init, argmin ties to lowest index, empty clusters keep centroids."""
    order = sorted(range(len(ids)), key=lambda i: (_h32(str(ids[i])), ids[i]))
    cents = vecs[order[:k]].astype(float).copy()
    for _ in range(n_iter):
        d2 = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        labels = d2.argmin(axis=1)  # argmin takes first on ties
        for c in range(k):
            pts = vecs[labels == c]
            if len(pts):
                cents[c] = pts.mean(axis=0)
    return cents, labels


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_kmeans_matches_numpy(spark, emb):
    rows = emb.select("vec_id", "embedding").collect()
    ids = [r.vec_id for r in rows]
    vecs = np.array([r.embedding for r in rows], dtype=float)
    k, iters = 4, 3
    model = kmeans_fit(
        emb, "embedding", "vec_id", k, max_iter=iters, tol=0.0, init="hash"
    )
    ref_cents, ref_labels = _np_kmeans(ids, vecs, k, iters)
    got = np.array(model.centroids)
    assert got.shape == ref_cents.shape
    np.testing.assert_allclose(got, ref_cents, rtol=1e-9, atol=1e-12)
    # assignments agree too
    assigned = {
        r.vec_id: r.cluster
        for r in model.transform(emb, "embedding").select("vec_id", "cluster").collect()
    }
    ref_d2 = ((vecs[:, None, :] - ref_cents[None, :, :]) ** 2).sum(axis=2)
    ref_assign = dict(zip(ids, ref_d2.argmin(axis=1)))
    assert assigned == ref_assign


def test_kmeans_inertia_monotone(emb):
    model = kmeans_fit(
        emb, "embedding", "vec_id", 4, max_iter=5, tol=0.0,
        track_inertia=True, init="hash",
    )
    h = model.inertia_history
    assert len(h) >= 2
    assert all(a >= b - 1e-9 for a, b in zip(h, h[1:]))


def test_kmeans_recovers_blobs(spark):
    rng = np.random.default_rng(7)
    centers = np.array([[0.0, 0.0], [10.0, 10.0], [-10.0, 10.0]])
    pts, truth = [], []
    for ci, c in enumerate(centers):
        for j in range(30):
            pts.append((c + rng.normal(0, 0.1, 2)).tolist())
            truth.append(ci)
    df = spark.createDataFrame(
        [Row(id=i, v=[float(x) for x in p]) for i, p in enumerate(pts)]
    )
    model = kmeans_fit(df, "v", "id", 3, max_iter=20, tol=1e-9)
    assert model.converged
    labels = {
        r.id: r.cluster for r in model.transform(df, "v").select("id", "cluster").collect()
    }
    # every true blob maps to exactly one fitted cluster
    mapping = {}
    for i, t in enumerate(truth):
        mapping.setdefault(t, set()).add(labels[i])
    assert all(len(s) == 1 for s in mapping.values())
    assert len({next(iter(s)) for s in mapping.values()}) == 3


def test_assign_clusters_ties_to_lowest(spark):
    df = spark.createDataFrame([Row(id=0, v=[0.0, 0.0])])
    cents = [[1.0, 0.0], [-1.0, 0.0]]  # equidistant
    got = assign_clusters(df, "v", cents).first()
    assert got.cluster == 0 and got.dist2 == pytest.approx(1.0)


def test_kmeans_raises_on_too_few_rows(spark):
    df = spark.createDataFrame([Row(id=0, v=[0.0]), Row(id=1, v=[1.0])])
    with pytest.raises(ValueError, match="need >= k"):
        kmeans_fit(df, "v", "id", 5)


def test_farthest_sample_matches_exact_when_sample_covers_corpus(emb):
    """With sample_size >= corpus size the sampled greedy traversal
    sees every point, so its seeds — and therefore the whole fit —
    must equal the exact farthest-point variant."""
    n = emb.count()
    exact = kmeans_fit(emb, "embedding", "vec_id", 4, max_iter=2, tol=0.0)
    sampled = kmeans_fit(
        emb, "embedding", "vec_id", 4, max_iter=2, tol=0.0,
        init="farthest_sample", sample_size=n,
    )
    np.testing.assert_allclose(
        np.array(sampled.centroids), np.array(exact.centroids),
        rtol=0, atol=0,
    )


def test_assign_clusters_broadcast_matches_literal(emb):
    """The broadcast-matrix assignment path is bit-identical to the
    literal path (same fold order)."""
    rows = emb.limit(50).collect()
    cents = [list(map(float, rows[i]["embedding"])) for i in range(3)]
    sub = emb.limit(200)
    lit = assign_clusters(sub, "embedding", cents, method="literal")
    bc = assign_clusters(sub, "embedding", cents, method="broadcast")
    a = {r.vec_id: (r.cluster, r.dist2) for r in lit.collect()}
    b = {r.vec_id: (r.cluster, r.dist2) for r in bc.collect()}
    assert a == b
