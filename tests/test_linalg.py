"""Distributed power iteration vs numpy eigendecomposition."""

import numpy as np
import pytest
from pyspark.sql import Row

from parquet_converters_spark.operators.linalg import power_iteration_pc1


def _np_power_iteration(X, max_iter, tol):
    """Exact numpy replica of power_iteration_pc1 (same init, update,
    convergence rule, sign convention) — algorithm parity, independent
    of the data's spectral gap."""
    Xc = X - X.mean(axis=0)
    dim = X.shape[1]
    v = np.zeros(dim)
    v[0] = 1.0
    eig, it = 0.0, 0
    converged = False
    for it in range(1, max_iter + 1):
        w = Xc.T @ (Xc @ v)
        norm = float(np.sqrt((w * w).sum()))
        new_v = w / norm
        eig = norm
        shift = float(np.sqrt(((v - new_v) ** 2).sum()))
        flipped = float(np.sqrt(((v + new_v) ** 2).sum()))
        v = new_v
        if min(shift, flipped) <= tol:
            converged = True
            break
    for x in v:
        if abs(x) > 1e-12:
            if x < 0:
                v = -v
            break
    return v, eig, it, converged


def test_pc1_matches_numpy_replica(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = emb.select("embedding").collect()
    X = np.array([r.embedding for r in rows], dtype=float)
    want_v, want_eig, want_it, want_conv = _np_power_iteration(X, 15, 1e-9)
    v, eig, it, conv = power_iteration_pc1(emb, "embedding", max_iter=15, tol=1e-9)
    assert (it, conv) == (want_it, want_conv)
    np.testing.assert_allclose(np.array(v), want_v, rtol=1e-7, atol=1e-9)
    assert eig == pytest.approx(want_eig, rel=1e-9)


def test_pc1_recovers_dominant_direction(spark):
    rng = np.random.default_rng(3)
    d = rng.normal(0, 1, (200, 1)) @ np.array([[3.0, 1.0, 0.0]]) + rng.normal(
        0, 0.05, (200, 3)
    )
    df = spark.createDataFrame(
        [Row(id=i, v=[float(x) for x in p]) for i, p in enumerate(d)]
    )
    v, eig, _, converged = power_iteration_pc1(df, "v", max_iter=50)
    expect = np.array([3.0, 1.0, 0.0]) / np.sqrt(10.0)
    assert converged
    np.testing.assert_allclose(np.abs(v), np.abs(expect), atol=0.02)


def test_pc1_empty_raises(spark):
    df = spark.createDataFrame([], "id: long, v: array<double>")
    with pytest.raises(ValueError, match="empty"):
        power_iteration_pc1(df, "v")
