"""Distributed linear algebra on DataFrames: power iteration for the
top principal component.

The Gram/covariance matrix is never materialized: each iteration
computes ``v' = normalize(sum_i (x_i - mu) ((x_i - mu) . v))`` in ONE
aggregation pass — ``dim`` sum-aggregates with map-side partials, so
the shuffle carries ``dim`` doubles per map task and the driver holds
one ``dim``-vector between rounds.  The same shape runs at 100 TB:
O(iterations) scans, O(dim) driver state, no O(dim^2) anywhere (power
iteration needs only matrix-vector products, which distribute as
row-wise dot products).

Reference analogue: none (the reference has no linear algebra); this
is part of the extended LLM-pipeline surface (embedding analysis).
"""

from __future__ import annotations

from math import sqrt

from pyspark.sql import DataFrame, functions as F


def _dot_lit(vec, v: list[float]):
    lit = F.array(*[F.lit(float(x)) for x in v])
    return F.aggregate(
        F.zip_with(vec, lit, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def power_iteration_pc1(
    df: DataFrame,
    vec_col: str,
    max_iter: int = 15,
    tol: float = 1e-9,
    center: bool = True,
) -> tuple[list[float], float, int, bool]:
    """Top principal component of a float-array column.

    Returns ``(component, eigenvalue, n_iter, converged)``.  The
    component's sign is normalized (first nonzero coordinate positive)
    so results are comparable across engines and partitionings.

    Init is the deterministic unit vector e_0; if the data is exactly
    orthogonal to it the first iterate falls back to e_1, etc. —
    deterministic without any RNG (which would break reproducibility
    across partitionings).
    """
    first = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if first is None:
        raise ValueError("power_iteration_pc1: empty input")
    dim = first["d"]
    vec = F.col(vec_col)

    if center:
        mu_row = df.agg(
            *[F.avg(vec[i].cast("double")).alias(f"m{i}") for i in range(dim)]
        ).first()
        mu = [float(mu_row[f"m{i}"]) for i in range(dim)]
    else:
        mu = [0.0] * dim

    # materialize the centered vectors ONCE: they are iteration-invariant,
    # and leaving them as an expression makes every one of the dim sum
    # aggregates rebuild the array per row (O(dim^2) work per row)
    base = df.select(
        F.array(
            *[vec[i].cast("double") - F.lit(mu[i]) for i in range(dim)]
        ).alias("_c")
    ).persist()

    v = [0.0] * dim
    v[0] = 1.0
    eig = 0.0
    converged = False
    it = 0
    fallback = 1
    try:
        return _iterate(base, dim, v, eig, it, fallback, max_iter, tol)
    finally:
        base.unpersist()


def _iterate(base, dim, v, eig, it, fallback, max_iter, tol):
    converged = False
    for it in range(1, max_iter + 1):
        # project the dot product before aggregating so it too is
        # evaluated once per row, not once per output column
        projected = base.select(
            F.col("_c"), _dot_lit(F.col("_c"), v).alias("_d")
        )
        row = projected.agg(
            *[
                F.sum(F.col("_c")[i] * F.col("_d")).alias(f"s{i}")
                for i in range(dim)
            ]
        ).first()
        w = [float(row[f"s{i}"]) for i in range(dim)]
        norm = sqrt(sum(x * x for x in w))
        if norm == 0.0:
            # data orthogonal to current v: deterministic re-seed
            if fallback >= dim:
                break
            v = [0.0] * dim
            v[fallback] = 1.0
            fallback += 1
            continue
        new_v = [x / norm for x in w]
        eig = norm
        shift = sqrt(sum((a - b) ** 2 for a, b in zip(v, new_v)))
        flipped = sqrt(sum((a + b) ** 2 for a, b in zip(v, new_v)))
        v = new_v
        if min(shift, flipped) <= tol:
            converged = True
            break
    # sign convention: first coordinate with |x| > 1e-12 is positive
    for x in v:
        if abs(x) > 1e-12:
            if x < 0:
                v = [-y for y in v]
            break
    return v, eig, it, converged
