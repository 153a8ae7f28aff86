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


def assign_clusters(
    df: DataFrame,
    vec_col: str,
    centroids: list[list[float]],
    cluster_col: str = "cluster",
    dist_col: str = "dist2",
) -> DataFrame:
    """Nearest-centroid assignment (0-based; ties -> lowest index).
    Adds ``cluster_col`` and ``dist_col`` in one narrow projection."""
    vec = F.col(vec_col)
    dists = F.array(*[_dist2_lit(vec, c) for c in centroids])
    picked = bind(
        dists,
        lambda d: F.struct(
            (F.array_position(d, F.array_min(d)) - 1).cast("int").alias("c"),
            F.array_min(d).alias("d"),
        ),
    )
    return df.withColumns({cluster_col: picked["c"], dist_col: picked["d"]})


@dataclass
class KMeansModel:
    centroids: list[list[float]]
    n_iter: int
    converged: bool
    inertia_history: list[float] = field(default_factory=list)

    def transform(self, df: DataFrame, vec_col: str) -> DataFrame:
        return assign_clusters(df, vec_col, self.centroids)


def kmeans_fit(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int,
    max_iter: int = 10,
    tol: float = 1e-6,
    track_inertia: bool = False,
    init: str = "farthest",
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
    passes — use ``init="hash"`` (pure min-h32 sample, one pass) when
    k is large.
    """
    first = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if first is None:
        raise ValueError("kmeans_fit: empty input")
    dim = first["d"]

    n_seed = 1 if init == "farthest" else k
    if init not in ("farthest", "hash"):
        raise ValueError(f"unknown init {init!r} (farthest | hash)")
    seeds = (
        df.select(id_col, vec_col)
        .withColumn("_h", h32(F.col(id_col).cast("string")))
        .orderBy("_h", id_col)
        .limit(n_seed)
        .collect()
    )
    if init == "hash" and len(seeds) < k:
        raise ValueError(f"kmeans_fit: need >= k={k} rows, got {len(seeds)}")
    centroids = [[float(x) for x in r[vec_col]] for r in seeds]
    vec0 = F.col(vec_col)
    while len(centroids) < k:
        nearest = F.array_min(
            F.array(*[_dist2_lit(vec0, c) for c in centroids])
        )
        far = (
            df.select(id_col, vec_col)
            .withColumn("_d", nearest)
            .orderBy(F.col("_d").desc(), F.col(id_col))
            .first()
        )
        if far is None or far["_d"] == 0.0:
            raise ValueError(
                f"kmeans_fit: need >= k={k} distinct vectors"
            )
        centroids.append([float(x) for x in far[vec_col]])

    vec = F.col(vec_col)
    inertia_history: list[float] = []
    converged = False
    it = 0
    for it in range(1, max_iter + 1):
        assigned = assign_clusters(
            df.select(vec_col), vec_col, centroids
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
