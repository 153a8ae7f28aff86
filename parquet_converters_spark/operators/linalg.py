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


def round_half_away(x: float) -> int:
    """Nearest integer with exact-binary .5 ties away from zero — the
    semantics of C++ ``std::round`` (what DuckDB's ``round(DOUBLE)``
    compiles to) and of Spark's HALF_UP ``round``.  NOT Python's
    built-in ``round`` (banker's / half-even), which would silently
    diverge from both engines on every exact ``.5``.
    """
    from decimal import ROUND_HALF_UP, Decimal

    # Decimal(float) is the EXACT binary value, so the tie test is on
    # the same bits both engines round.
    return int(Decimal(x).quantize(Decimal(1), rounding=ROUND_HALF_UP))


def power_iteration_pc1_exact(
    df: DataFrame,
    vec_col: str,
    iterations: int = 8,
    scale: int = 10**6,
) -> tuple[list[float], float]:
    """Fixed-iteration power method on ``scale``-quantized INTEGER
    embeddings — bitwise-reproducible across engines and partitionings,
    which makes the iterative fit value-oracle-able (the float variant
    ``power_iteration_pc1`` is numerically superior but its IEEE sums
    depend on reduction order, so no SQL engine can replicate it
    hash-exactly).

    Exactness buys a structural freedom floats never get: any engine
    may compute the same integer-valued DEFINITION in any form and land
    on identical bits.  So instead of one distributed pass per
    iteration, this runs ONE pass total — the exact augmented moment
    matrix ``S_ij = sum_r q'_i q'_j`` over ``q' = q ++ [1]`` (so the
    same pass yields the pairwise products, the per-dim sums S_i,dim
    and the row count S_dim,dim), via explode-pair + a single
    decimal(38,0) hash aggregate (map-side partials; the shuffle
    carries (dim+1)^2/2 partial rows per task, never data rows).  The
    centered Gram ``G = S - mu s^T - s mu^T + n mu mu^T`` (exact
    integers, ``mu_i = round(S_i/n)``) then makes every power step a
    DRIVER-side exact big-int mat-vec:

    - ``w = G v`` (arbitrary-precision int — no overflow, no rounding),
    - ``v' = round(w * scale / max|w|)`` — max-normalization (any norm
      works for power iteration; max of exact ints is exact, and the
      update is ONE shared-input IEEE multiply+divide, which every
      engine rounds identically — std::round semantics via
      ``round_half_away``).

    Outputs: unit-L2 loadings (sign-normalized, first nonzero positive)
    and the Rayleigh-quotient eigenvalue of the final iterate in
    ORIGINAL units (``(v.G.v / v.v) / scale^2``), both exact-int until
    the final few shared IEEE ops.

    100 TB shape: one scan, n * dim^2 / 2 multiplies inside the scan
    (= ~dim/2 iterations' worth of the per-pass variant — a bargain
    whenever iterations ~ O(dim)), O(dim^2) driver ints (dim=64 ->
    16 KB; use the float Gram-free ``power_iteration_pc1`` when dim is
    so large that dim^2 state or n*dim^2 work is prohibitive).
    DuckDB replays the identical definition as chained CTEs
    (queries.EMBED_PC1_SQL) — hugeint there, Python int here, same
    integers.
    """
    from math import sqrt

    vec = F.col(vec_col).cast("array<double>")
    aug = F.concat(
        F.transform(vec, lambda x: F.round(x * scale).cast("long")),
        F.array(F.lit(1).cast("long")),
    )
    # r17: the moment pass sums LONGS under a guard instead of
    # unconditionally casting to decimal(38,0) — the kmeans_fit_exact
    # "guard, not cast" pattern.  Exact while n * max|qi| * max|qj|
    # < 2^63 per (i,j) cell (the guard columns ride the same aggregate,
    # zero extra jobs); past the bound — or if an ANSI-mode sum raises
    # mid-executor — the pass RERUNS in the original decimal form, so
    # the result is identical at every scale.  The explode also emits
    # only the upper triangle directly (slice from i) instead of the
    # full (dim+1)^2 cross followed by a j >= i filter.  Measured at
    # sf0.1: 2.15 s -> 0.53 s, collected integers identical.
    def _pairs(upper_only: bool):
        ex = df.select(aug.alias("_v")).select(
            F.posexplode("_v").alias("i", "qi"), F.col("_v")
        )
        if upper_only:
            return ex.select(
                "i",
                "qi",
                F.posexplode(
                    F.slice("_v", F.col("i") + 1, F.size("_v"))
                ).alias("dj", "qj"),
            ).select("i", (F.col("i") + F.col("dj")).alias("j"), "qi", "qj")
        return ex.select(
            "i", "qi", F.posexplode("_v").alias("j", "qj")
        ).where(F.col("j") >= F.col("i"))

    def _decimal_rows():
        return (
            _pairs(upper_only=False)
            .groupBy("i", "j")
            .agg(
                F.sum(
                    F.col("qi").cast("decimal(19,0)")
                    * F.col("qj").cast("decimal(19,0)")
                ).alias("s")
            )
            .collect()
        )

    try:
        rows = (
            _pairs(upper_only=True)
            .groupBy("i", "j")
            .agg(
                F.sum(F.col("qi") * F.col("qj")).alias("s"),
                F.count(F.lit(1)).alias("_n"),
                F.max(F.abs(F.col("qi"))).alias("_ma"),
                F.max(F.abs(F.col("qj"))).alias("_mb"),
            )
            .collect()
        )
        if any(r["_n"] * r["_ma"] * r["_mb"] >= 2**63 for r in rows):
            rows = _decimal_rows()
    except Exception as e:  # noqa: BLE001 — py4j wraps the ANSI error
        if "ARITHMETIC_OVERFLOW" not in str(e):
            raise
        rows = _decimal_rows()
    if not rows:
        raise ValueError("power_iteration_pc1_exact: empty input")
    S = {(r["i"], r["j"]): int(r["s"]) for r in rows}
    dim = max(i for i, _ in S)  # q' has dim+1 entries, 0-based
    n = S[(dim, dim)]
    s = [S[(i, dim)] for i in range(dim)]
    mu = [round_half_away(float(s[i]) / n) for i in range(dim)]

    def S_at(i: int, j: int) -> int:
        return S[(i, j)] if i <= j else S[(j, i)]

    G = [
        [
            S_at(i, j) - mu[i] * s[j] - mu[j] * s[i] + n * mu[i] * mu[j]
            for j in range(dim)
        ]
        for i in range(dim)
    ]

    v = [0] * dim
    v[0] = scale
    for _ in range(iterations):
        w = [sum(G[i][j] * v[j] for j in range(dim)) for i in range(dim)]
        mx = max(abs(x) for x in w)
        if mx == 0:
            raise ValueError(
                "power_iteration_pc1_exact: degenerate input "
                "(all vectors equal after quantization)"
            )
        # the engines' shared double arithmetic: (w_d * scale_d) / mx_d
        v = [
            round_half_away(float(x) * float(scale) / float(mx)) for x in w
        ]

    num = sum(
        v[i] * G[i][j] * v[j] for i in range(dim) for j in range(dim)
    )
    for x in v:
        if x != 0:
            if x < 0:
                v = [-y for y in v]
            break
    den = sum(x * x for x in v)
    loadings = [float(x) / sqrt(float(den)) for x in v]
    eigenvalue = float(num) / float(den) / float(scale * scale)
    return loadings, eigenvalue
