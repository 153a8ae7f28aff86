"""Distributed Lloyd's k-means over an embedding column.

The centroid-fitting pass the IVF ANN index needs
(``functions/similarity.py`` ships a deterministic md5 stand-in for its
oracle-checked queries; this is the real fit).  Shape of the algorithm,
designed for the 100 TB case:

- **assignment** is a narrow map: each row computes squared-L2 distance
  to every centroid and takes the argmin.  Centroids ride along either
  as literals (small k*dim — widest codegen) or as a broadcast 1-row
  matrix joined in (real dimensionality, plan size O(1)); both
  evaluate the same arithmetic.
- **update** is one hash aggregation with map-side partials:
  ``groupBy(cluster).agg(count, avg(vec[0]), …, avg(vec[dim-1]))`` —
  a k x (dim+1) result collected to the driver (a few KB), never the
  data.  No explode: the per-dimension averages are flat columns, so
  the shuffle carries k rows per partition, not n x dim element rows.
- **iteration state** lives on the driver as plain floats — between
  iterations nothing is cached or checkpointed because each pass
  re-reads the (columnar, pruned) source; at cluster scale you'd
  ``persist(DISK_ONLY)`` the projected (id, vec) once.

Empty clusters keep their previous centroid (the standard Lloyd's
fallback).  Convergence = max centroid L2 shift <= ``tol``, checked on
the driver — no extra Spark action beyond the k-row aggregate each
round.

Determinism: init picks the k seed vectors with the smallest
``h32(id)`` (md5-derived, engine- and partitioning-independent), and
ties in assignment go to the lowest cluster index, so a re-run on a
repartitioned input fits the identical model.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F

from parquet_converters_spark.functions.dedup import h32
from parquet_converters_spark.functions.text import bind


def _dist2_lit(vec: Column, cen: list[float]) -> Column:
    """Squared L2 distance to a literal centroid: one zip_with fold,
    pure JVM arithmetic."""
    lit = F.array(*[F.lit(float(x)) for x in cen])
    return F.aggregate(
        F.zip_with(vec, lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _dist2(vec: Column, cen: Column) -> Column:
    """Squared L2 distance between two array<double> columns — the same
    left-to-right fold as ``_dist2_lit`` so both paths produce
    bit-identical floats."""
    return F.aggregate(
        F.zip_with(vec, cen, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _centroid_matrix(df: DataFrame, centroids: list[list[float]]):
    """Broadcast the k x dim centroid matrix as a 1-row DataFrame.

    The matrix enters the plan as a LocalRelation *attribute*, not as
    k*dim literals: the generated code is identical from one Lloyd's
    iteration to the next (codegen cache hit — only the broadcast
    payload changes), and plan size stays O(1) at real dimensionality
    where a literal tree would be megabytes.
    """
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        StructField,
        StructType,
    )

    schema = StructType(
        [StructField("_cen", ArrayType(ArrayType(DoubleType())), False)]
    )
    mat = df.sparkSession.createDataFrame(
        [([list(map(float, c)) for c in centroids],)], schema
    )
    return F.broadcast(mat)


# Above this many k*dim matrix cells the centroids ride in as a
# broadcast matrix instead of plan literals.  Measured at sf0.1: the
# broadcast exchange adds ~0.15 s per action, so tiny models stay on
# the literal path; past the threshold literal plans grow linearly
# (megabytes of plan at real ANN dimensionality) while the broadcast
# plan stays O(1) with a per-iteration codegen cache hit.
_LITERAL_CELL_LIMIT = 4096


def assign_clusters(
    df: DataFrame,
    vec_col: str,
    centroids: list[list[float]],
    cluster_col: str = "cluster",
    dist_col: str = "dist2",
    method: str = "auto",
) -> DataFrame:
    """Nearest-centroid assignment (0-based; ties -> lowest index).
    Adds ``cluster_col`` and ``dist_col`` in one narrow projection.

    ``method="broadcast"`` joins the centroids in as a broadcast 1-row
    matrix and folds over it with ``transform`` — constant plan size
    and a codegen cache hit per iteration.  ``method="literal"``
    inlines them as literals (widest codegen for tiny k*dim).
    ``method="auto"`` (default) picks by matrix size
    (``_LITERAL_CELL_LIMIT``).  Identical arithmetic, bit-identical
    output on every path.
    """
    if method == "auto":
        cells = len(centroids) * (len(centroids[0]) if centroids else 0)
        method = "literal" if cells <= _LITERAL_CELL_LIMIT else "broadcast"
    vec = F.col(vec_col)
    if method == "literal":
        dists = F.array(*[_dist2_lit(vec, c) for c in centroids])
        src = df
    elif method == "broadcast":
        dists = F.transform(F.col("_cen"), lambda c: _dist2(vec, c))
        src = df.join(_centroid_matrix(df, centroids))
    else:
        raise ValueError(f"unknown method {method!r} (broadcast | literal)")
    picked = bind(
        dists,
        lambda d: F.struct(
            (F.array_position(d, F.array_min(d)) - 1).cast("int").alias("c"),
            F.array_min(d).alias("d"),
        ),
    )
    out = src.withColumns({cluster_col: picked["c"], dist_col: picked["d"]})
    return out.drop("_cen") if method == "broadcast" else out


@dataclass
class KMeansModel:
    centroids: list[list[float]]
    n_iter: int
    converged: bool
    inertia_history: list[float] = field(default_factory=list)

    def transform(self, df: DataFrame, vec_col: str) -> DataFrame:
        return assign_clusters(df, vec_col, self.centroids)


def _greedy_farthest(
    rows, vec_col: str, k: int
) -> list[list[float]]:
    """Driver-side greedy farthest-point traversal over a collected
    sample (already in deterministic (h32, id) order).  Seed 1 is the
    first row; each next seed maximizes distance to its nearest chosen
    centroid, ties -> earliest sample position."""
    vecs = [[float(x) for x in r[vec_col]] for r in rows]
    if len(vecs) < k:
        raise ValueError(f"kmeans_fit: need >= k={k} rows, got {len(vecs)}")
    chosen = [0]
    d = [
        sum((a - b) ** 2 for a, b in zip(v, vecs[0])) for v in vecs
    ]
    while len(chosen) < k:
        far = max(range(len(vecs)), key=lambda i: (d[i], -i))
        if d[far] == 0.0:
            raise ValueError(
                f"kmeans_fit: need >= k={k} distinct vectors in sample"
            )
        chosen.append(far)
        nv = vecs[far]
        for i, v in enumerate(vecs):
            d2 = sum((a - b) ** 2 for a, b in zip(v, nv))
            if d2 < d[i]:
                d[i] = d2
    return [vecs[i] for i in chosen]


def kmeans_fit(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int,
    max_iter: int = 10,
    tol: float = 1e-6,
    track_inertia: bool = False,
    init: str = "farthest",
    sample_size: int = 1024,
) -> KMeansModel:
    """Fit k-means with Lloyd's iterations as described in the module
    docstring.  ``track_inertia`` adds ``sum(dist2)`` to the per-round
    aggregate (same single pass) so tests can assert the monotone
    non-increasing objective.

    ``init="farthest"`` (default) seeds with deterministic greedy
    farthest-point traversal: seed 1 is the min-``h32(id)`` row, each
    next seed is the point maximizing distance to its nearest chosen
    centroid (ties -> lowest id).  On well-separated clusters this
    covers every cluster, where hash sampling can drop two seeds into
    one (the classic Lloyd's local minimum).  Costs k-1 extra top-1
    passes over the corpus.

    ``init="farthest_sample"`` runs the same greedy traversal
    driver-side over the ``sample_size`` min-``h32(id)`` rows,
    collected in ONE pass — bounded driver memory, deterministic under
    repartitioning, and the right cost shape at corpus scale (the
    exact variant's k-1 full scans become one bounded-sample scan).
    Seeds can differ from exact farthest only when the true farthest
    point is outside the hash sample.

    ``init="hash"`` takes the k min-h32 rows directly (one pass, no
    spread guarantee).
    """
    # one projected, persisted copy feeds init + every Lloyd's pass
    # (at cluster scale: persist(DISK_ONLY) — same shape)
    base = df.select(id_col, vec_col).persist()
    try:
        if init == "farthest":
            n_seed = 1
        elif init == "hash":
            n_seed = k
        elif init == "farthest_sample":
            n_seed = max(k, sample_size)
        else:
            raise ValueError(
                f"unknown init {init!r} (farthest | farthest_sample | hash)"
            )
        seeds = (
            base.withColumn("_h", h32(F.col(id_col).cast("string")))
            .orderBy("_h", id_col)
            .limit(n_seed)
            .collect()
        )
        if not seeds:
            raise ValueError("kmeans_fit: empty input")
        dim = len(seeds[0][vec_col])
        if init == "hash" and len(seeds) < k:
            raise ValueError(
                f"kmeans_fit: need >= k={k} rows, got {len(seeds)}"
            )
        if init == "farthest_sample":
            centroids = _greedy_farthest(seeds, vec_col, k)
        else:
            centroids = [[float(x) for x in r[vec_col]] for r in seeds]
        vec = F.col(vec_col)
        while len(centroids) < k:
            # iterative too (k-1 passes) -> the iterative threshold;
            # on the broadcast side the generated code is independent
            # even of len(centroids), so every pass after the flip is
            # a codegen cache hit
            if len(centroids) * dim <= _ITER_LITERAL_CELL_LIMIT:
                src = base
                nearest = F.array_min(
                    F.array(*[_dist2_lit(vec, c) for c in centroids])
                )
            else:
                src = base.join(_centroid_matrix(base, centroids))
                nearest = F.array_min(
                    F.transform(F.col("_cen"), lambda c: _dist2(vec, c))
                )
            far = (
                src.withColumn("_d", nearest)
                .orderBy(F.col("_d").desc(), F.col(id_col))
                .first()
            )
            if far is None or far["_d"] == 0.0:
                raise ValueError(
                    f"kmeans_fit: need >= k={k} distinct vectors"
                )
            centroids.append([float(x) for x in far[vec_col]])

        inertia_history: list[float] = []
        converged = False
        it = 0
        # In the Lloyd's LOOP the literal/broadcast tradeoff is the
        # iterative one (every pass recompiles a literal fold, a
        # broadcast matrix is a codegen cache hit), so use the
        # measured iterative threshold rather than assign_clusters'
        # plan-size default.  Bit-identical either way
        # (test_assign_clusters_broadcast_matches_literal).
        loop_method = (
            "literal" if k * dim <= _ITER_LITERAL_CELL_LIMIT else "broadcast"
        )
        for it in range(1, max_iter + 1):
            assigned = assign_clusters(
                base.select(vec_col), vec_col, centroids, method=loop_method
            )
            aggs = [F.count(F.lit(1)).alias("_n")] + [
                F.avg(vec[i]).alias(f"_m{i}") for i in range(dim)
            ]
            if track_inertia:
                aggs.append(F.sum("dist2").alias("_inertia"))
            rows = assigned.groupBy("cluster").agg(*aggs).collect()
            by_cluster = {r["cluster"]: r for r in rows}
            if track_inertia:
                inertia_history.append(
                    float(sum(r["_inertia"] for r in rows))
                )
            shift2 = 0.0
            new_centroids = []
            for c, old in enumerate(centroids):
                r = by_cluster.get(c)
                if r is None:  # empty cluster keeps its centroid
                    new_centroids.append(old)
                    continue
                new = [float(r[f"_m{i}"]) for i in range(dim)]
                shift2 = max(
                    shift2, sum((a - b) ** 2 for a, b in zip(old, new))
                )
                new_centroids.append(new)
            centroids = new_centroids
            if shift2 <= tol * tol:
                converged = True
                break
        return KMeansModel(centroids, it, converged, inertia_history)
    finally:
        base.unpersist()


# --- cross-engine-exact (quantized integer) variant ------------------------


def _dist2q_lit(vec: Column, cen: list[int]) -> Column:
    """Squared L2 distance between a long-array column and a literal
    integer centroid: a zip_with fold of long products — EXACT integer
    arithmetic, so the value is independent of partitioning, engine,
    and reduction order (magnitudes: (2 * scale)^2 * dim << 2^63)."""
    lit = F.array(*[F.lit(int(x)).cast("long") for x in cen])
    return F.aggregate(
        F.zip_with(vec, lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _dist2q(vec: Column, cen: Column) -> Column:
    """Column-column form of ``_dist2q_lit`` — the identical fold over
    exact longs, so both paths produce the same integer by
    construction (no IEEE ordering concerns at all)."""
    return F.aggregate(
        F.zip_with(vec, cen, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _centroid_matrix_int(df: DataFrame, centroids: list[list[int]]):
    """Broadcast the k x dim INTEGER centroid matrix as a 1-row
    DataFrame (``_cenq: array<array<long>>``).  Same rationale as the
    float ``_centroid_matrix``: the matrix enters the plan as a
    LocalRelation attribute, so consecutive Lloyd's iterations compile
    to byte-identical generated code (codegen cache hit) and only the
    broadcast payload changes."""
    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    schema = StructType(
        [StructField("_cenq", ArrayType(ArrayType(LongType())), False)]
    )
    mat = df.sparkSession.createDataFrame(
        [([list(map(int, c)) for c in centroids],)], schema
    )
    return F.broadcast(mat)


# Auto threshold for ITERATIVE fits (both the exact and the float
# Lloyd's loops), in k*dim matrix cells.  The r16 value of 64 was
# measured against the py4j Column-tree literal path, whose driver-side
# construction cost grew with k*dim (512 cells: literal 8.48 s vs
# broadcast 5.19 s for 4+1 passes at sf0.1).  r17 rebuilt the literal
# path as ONE SQL text per pass (kmeans_fit_exact), which removes that
# construction cost entirely: at 512 cells the SQL-literal pass now
# measures ~0.85 s vs ~1.4 s broadcast (min-of-3 warm, sf0.1), the
# whole registered query 5.5 s -> 3.2 s.  Broadcast remains the right
# shape once the matrix is big enough that literal plans (and the
# task binaries that carry them) stop being trivially small — the
# threshold keeps that crossover conservative at 1024 cells.
_ITER_LITERAL_CELL_LIMIT = 1024


def _greedy_farthest_int(vecs: list[list[int]], k: int) -> list[list[int]]:
    """`_greedy_farthest` on integer vectors: distances are exact
    (arbitrary-precision int), so the traversal is reproducible by any
    engine.  Ties -> earliest sample position, like the float variant."""
    if len(vecs) < k:
        raise ValueError(f"kmeans_fit_exact: need >= k={k} rows")
    chosen = [0]
    d = [sum((a - b) ** 2 for a, b in zip(v, vecs[0])) for v in vecs]
    while len(chosen) < k:
        far = max(range(len(vecs)), key=lambda i: (d[i], -i))
        if d[far] == 0:
            raise ValueError(
                f"kmeans_fit_exact: need >= k={k} distinct quantized vectors"
            )
        chosen.append(far)
        nv = vecs[far]
        for i, v in enumerate(vecs):
            d2 = sum((a - b) ** 2 for a, b in zip(v, nv))
            if d2 < d[i]:
                d[i] = d2
    return [vecs[i] for i in chosen]


def kmeans_fit_exact(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int,
    iterations: int = 5,
    scale: int = 10**6,
    sample_size: int = 1024,
    method: str = "auto",
    fold_census: bool = False,
) -> tuple:
    """Fixed-iteration Lloyd's k-means on ``scale``-quantized INTEGER
    embeddings — bitwise-reproducible across engines, which makes the
    iterative fit value-oracle-able (DuckDB replays it as unrolled
    chained CTEs; see queries.KMEANS_DOC_SQL).  The float
    ``kmeans_fit`` stays the production path; this variant trades the
    sub-1e-6 tail of precision for exactness:

    - vectors quantized once: ``q_i = round(x_i * scale)`` (long),
    - distances are exact long sums (order-free),
    - init = greedy farthest-point over the ``sample_size`` min-h32
      rows (exact integer distances, ties -> earliest position),
    - assignment argmin ties -> lowest cluster index
      (``array_position`` returns the FIRST minimum),
    - centroid update ``round(sum / n)`` does ONE IEEE division on
      exact integers then std::round — identical in every engine;
      empty clusters keep their centroid,
    - fixed ``iterations`` rounds, no tolerance early-exit (an
      early-exit divergence would desynchronize the SQL unroll).

    Returns ``(assigned, centroids)``: ``assigned`` has columns
    ``(id_col, cluster int, d2q long)`` where ``d2q`` is the exact
    squared distance in quantized units (divide by ``scale**2`` for
    original units); ``centroids`` is the final integer matrix.  Same
    100 TB shape as ``kmeans_fit``: one narrow map per assignment, one
    k x dim aggregate per update, O(k * dim) driver state.

    ``fold_census=True`` returns ``(assigned, centroids, census)``
    where ``census`` is ``[(cluster, n, d2_sum_quantized), ...]`` from
    the LAST pass, which becomes an E-step CENSUS ONLY: per-cluster
    count + exact decimal d2 sum, no M-step sums (they would produce
    centroids nothing uses).  ``centroids`` is then the matrix after
    ``iterations - 1`` updates and the lazy ``assigned`` plan targets
    those same centroids, so ``iterations=n, fold_census=True`` equals
    ``iterations=n-1`` + a separate final census — with the census
    folded into the pass budget: n corpus passes total instead of
    n + 1 (VERDICT r06 item 5; measured in SCALE.md).

    ``method`` mirrors ``assign_clusters``: ``"literal"`` bakes the
    centroids into the generated code, ``"broadcast"`` joins them in as
    a 1-row ``array<array<long>>`` matrix (byte-identical generated
    code across passes -> codegen cache hit), ``"auto"`` picks by
    ``k * dim`` vs ``_ITER_LITERAL_CELL_LIMIT``.  Both paths run the
    identical exact long fold, so the choice never affects a value
    (pytest-asserted bitwise, tests/test_exact_iteratives.py).
    """
    from parquet_converters_spark.operators.linalg import round_half_away

    qcol = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.round(x * scale).cast("long"),
    )
    base = df.select(F.col(id_col), qcol.alias("_q")).persist()
    view = None
    try:
        rows = (
            base.withColumn("_h", h32(F.col(id_col).cast("string")))
            .orderBy("_h", id_col)
            .limit(max(k, sample_size))
            .collect()
        )
        if not rows:
            raise ValueError("kmeans_fit_exact: empty input")
        dim = len(rows[0]["_q"])
        centroids = _greedy_farthest_int(
            [[int(v) for v in r["_q"]] for r in rows], k
        )
        if method == "auto":
            # literal bakes the centroids into the plan; broadcast
            # ships them as a 1-row matrix.  Both run the same exact
            # integer fold, so the choice can never change a value.
            # Since r17 the literal path is built as ONE SQL statement
            # per pass (see below), which makes it the faster of the
            # two well past the old 64-cell crossover.
            method = (
                "literal"
                if k * dim <= _ITER_LITERAL_CELL_LIMIT
                else "broadcast"
            )

        # r17: the literal path builds each pass as ONE spark.sql()
        # text over a temp view instead of a ~k*dim-node py4j Column
        # tree.  Measured at sf0.1 (512 cells, min-of-3 warm): the
        # Column-tree literal pass cost 1.6 s of driver-side expression
        # construction + 0.5 s execution and the broadcast pass
        # 0.5 s + 0.9 s; the SQL text parses in ~0.15 s and executes
        # the identical fold in ~0.7 s.  Same expressions, same exact
        # long arithmetic — cross-checked value-identical against the
        # broadcast path (and pinned by tests/test_exact_iteratives).
        spark = df.sparkSession
        if method == "literal":
            import uuid

            view = f"_kmeans_exact_{uuid.uuid4().hex}"
            base.createOrReplaceTempView(view)

        def _darr_sql(centroids):
            folds = ", ".join(
                "aggregate(zip_with(_q, array("
                + ", ".join(f"{int(x)}L" for x in c)
                + "), (a, b) -> (a - b) * (a - b)), BIGINT(0), "
                "(acc, x) -> acc + x)"
                for c in centroids
            )
            return f"array({folds})"

        _CLUSTER_SQL = "CAST(array_position(d, array_min(d)) - 1 AS INT)"

        def pick_src(centroids):
            # bind evaluates the k-fold distance array ONCE per row;
            # argmin ties -> lowest cluster (array_position = first min)
            if method == "literal":
                src = base
                darr = F.array(
                    *[_dist2q_lit(F.col("_q"), c) for c in centroids]
                )
            elif method == "broadcast":
                src = base.join(_centroid_matrix_int(base, centroids))
                darr = F.transform(
                    F.col("_cenq"), lambda c: _dist2q(F.col("_q"), c)
                )
            else:
                raise ValueError(
                    f"unknown method {method!r} (broadcast | literal | auto)"
                )
            return src, bind(
                darr,
                lambda d: F.struct(
                    (F.array_position(d, F.array_min(d)) - 1)
                    .cast("int")
                    .alias("c"),
                    F.array_min(d).alias("d"),
                ),
            )

        if method not in ("literal", "broadcast"):
            raise ValueError(
                f"unknown method {method!r} (broadcast | literal | auto)"
            )

        census = None
        for it in range(iterations):
            fold = fold_census and it == iterations - 1
            if fold:
                # the folded last pass is an E-step CENSUS only: the
                # M-step sums would produce centroids nothing uses, so
                # they are dropped (measured: keeping them cost +2
                # jobs / +0.6 s at sf0.1).  sum(d2) reaches
                # ~n * dim * (2 * max|q|)^2, far past 2^63 — decimal,
                # which also means no overflow guard is needed here.
                if method == "literal":
                    census_df = spark.sql(
                        f"SELECT cluster, count(1) AS _n, "
                        f"sum(CAST(_d2 AS DECIMAL(38,0))) AS _d2sum "
                        f"FROM (SELECT {_CLUSTER_SQL} AS cluster, "
                        f"array_min(d) AS _d2 FROM (SELECT "
                        f"{_darr_sql(centroids)} AS d FROM {view})) "
                        f"GROUP BY cluster"
                    )
                else:
                    src, picked = pick_src(centroids)
                    census_df = (
                        src.select(
                            picked["c"].alias("cluster"),
                            picked["d"].alias("_d2"),
                        )
                        .groupBy("cluster")
                        .agg(
                            F.count(F.lit(1)).alias("_n"),
                            F.sum(
                                F.col("_d2").cast("decimal(38,0)")
                            ).alias("_d2sum"),
                        )
                    )
                census = sorted(
                    (r["cluster"], r["_n"], int(r["_d2sum"]))
                    for r in census_df.collect()
                )
                break
            # long sums: exact while n_cluster * max|q| < 2^63 (~10^12
            # rows at scale=1e6).  Past that the DuckDB oracle keeps
            # summing to hugeint while Spark either raises mid-executor
            # (ANSI, the 4.x default) or WRAPS SILENTLY (non-ANSI) — so
            # the bound is ENFORCED with a clear error, not just
            # documented: the ANSI overflow is re-raised with the
            # remedy, and for non-ANSI sessions the same aggregate also
            # computes per-cluster count and max|q| (zero extra jobs)
            # so the driver raises before using any sum whose worst
            # case n_c * max|q|_c could have wrapped.  (Unconditional
            # decimal(38,0) sums were measured ~2x slower per job —
            # SCALE.md — hence guard, not cast.)
            if method == "literal":
                sums = ", ".join(
                    f"sum(_q[{i}]) AS _s{i}" for i in range(dim)
                )
                agg = spark.sql(
                    f"SELECT cluster, count(1) AS _n, "
                    f"max(array_max(transform(_q, v -> abs(v)))) AS _mq, "
                    f"{sums} FROM (SELECT _q, {_CLUSTER_SQL} AS cluster "
                    f"FROM (SELECT _q, {_darr_sql(centroids)} AS d "
                    f"FROM {view})) GROUP BY cluster"
                )
            else:
                src, picked = pick_src(centroids)
                assigned = src.select(
                    "_q", picked["c"].alias("cluster")
                )
                agg = assigned.groupBy("cluster").agg(
                    F.count(F.lit(1)).alias("_n"),
                    F.max(
                        F.array_max(
                            F.transform(F.col("_q"), lambda v: F.abs(v))
                        )
                    ).alias("_mq"),
                    *[
                        F.sum(F.col("_q")[i]).alias(f"_s{i}")
                        for i in range(dim)
                    ],
                )
            try:
                stats = {r["cluster"]: r for r in agg.collect()}
            except Exception as e:  # noqa: BLE001 — py4j wraps it
                if "ARITHMETIC_OVERFLOW" not in str(e):
                    raise
                raise OverflowError(
                    "kmeans_fit_exact: a per-dim centroid sum exceeded "
                    "2^63 (n_cluster * max|q| too large) and would "
                    "silently wrap under non-ANSI sums while the "
                    "oracle sums to hugeint; lower `scale` or "
                    "pre-aggregate"
                ) from e
            for c, r in stats.items():
                if r["_n"] * r["_mq"] >= 2**63:
                    raise OverflowError(
                        "kmeans_fit_exact: cluster "
                        f"{c} has n={r['_n']} rows with max|q|="
                        f"{r['_mq']} — per-dim long sums may exceed "
                        "2^63 and wrap silently; lower `scale` or "
                        "pre-aggregate"
                    )
            centroids = [
                [
                    round_half_away(
                        float(int(stats[c][f"_s{i}"])) / stats[c]["_n"]
                    )
                    for i in range(dim)
                ]
                if c in stats
                else centroids[c]  # empty cluster keeps its centroid
                for c in range(k)
            ]
        # lazy plan only — materializing it is the caller's choice (a
        # fold_census caller typically never does, saving one job)
        if method == "literal":
            # resolved eagerly by spark.sql, so dropping the temp view
            # in the finally block below cannot invalidate it
            assigned = spark.sql(
                f"SELECT `{id_col}`, {_CLUSTER_SQL} AS cluster, "
                f"array_min(d) AS d2q FROM (SELECT `{id_col}`, "
                f"{_darr_sql(centroids)} AS d FROM {view})"
            )
        else:
            src, final = pick_src(centroids)
            assigned = src.select(
                F.col(id_col),
                final["c"].alias("cluster"),
                final["d"].alias("d2q"),
            )
        if fold_census:
            return assigned, centroids, census
        return assigned, centroids
    finally:
        base.unpersist()
        try:
            if view is not None:
                df.sparkSession.catalog.dropTempView(view)
        except Exception:  # pragma: no cover - view may not exist yet
            pass
