"""Connected components over a pair graph — the step that turns
near-duplicate *pairs* (MinHash-LSH output) into duplicate *clusters*
so a dedup pipeline can keep one representative per cluster.

Two methods:

- ``hash_to_min`` (default): every node starts labeled with its own id;
  each round every node takes the minimum label among itself and its
  neighbors; convergence in O(graph diameter) rounds.  Duplicate
  clusters have tiny diameters (near-dup similarity is almost
  transitive), so 3-5 rounds settle real corpora.  Each round is one
  join + one aggregation, both partitioned on the node key — nothing
  driver-side except the convergence counter.

- ``star``: alternating large-star/small-star (Kiveris et al.,
  "Connected Components in MapReduce and Beyond", SoCC'14), which
  converges in O(log^2 n) rounds even on adversarial long-chain graphs
  with the same per-round plan shape (groupBy + explode — no join at
  all).  Use it when component diameters are unbounded.

Both cut lineage per round with ``localCheckpoint`` — without it the
iterated plan doubles each round and the job dies on plan size long
before data size.
"""

from __future__ import annotations

import contextlib
import warnings

from pyspark.sql import DataFrame, Observation, functions as F

from parquet_converters_spark.session import free_local_checkpoints


class ConvergenceWarning(UserWarning):
    """Raised as a warning when an iterative operator exits on
    ``max_iter`` without reaching its fixed point."""


# Edge-count cap for the driver-side union-find fallback of
# connected_components.  200k symmetric edge rows collect to ~3 MB and
# union-find them in milliseconds — far below any driver-memory or
# maxResultSize concern — while a 100 TB near-dup graph (edges >> cap)
# always takes the distributed rounds.  The labels are a graph
# property (each node's component MINIMUM), so both algorithms produce
# byte-identical values; the threshold only picks which machine does
# the tiny amount of work, exactly like a broadcast-join size
# threshold (guide §1.2 "algorithm first", §3.1).
_CC_DRIVER_MAX_EDGES = 200_000

# Target rows per shuffle partition for the per-round label/edge jobs
# of the iterative operators.  A symmetric edge row is two longs
# (~32 B unsafe-row), so 1M rows ≈ 32 MB per partition — the low end
# of the guide's 100 MB-1 GB band, erring toward parallelism.  The
# count only ever REDUCES the session's shuffle partitions (never
# raises them), so a genuinely large graph keeps the session layout.
_STATE_ROWS_PER_PARTITION = 1_000_000


def _cc_labels_driver(spark, edges: DataFrame, dtype: str) -> DataFrame:
    """Union-find the (already materialized, <= _CC_DRIVER_MAX_EDGES
    row) edge table on the driver and return the (node, component)
    labels as a LocalRelation.

    Values are identical to the distributed rounds by construction:
    both compute each node's component minimum, which does not depend
    on the algorithm.  Every distributed round is otherwise a
    driver-serialized job whose fixed scheduling cost (~0.3 s each at
    bench scale) dwarfs the actual label work on a small graph.
    """
    from parquet_converters_spark.session import values_df

    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for r in edges.collect():
        u, v = r[0], r[1]
        if u not in parent:
            parent[u] = u
        if v not in parent:
            parent[v] = v
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    comp_min: dict = {}
    for node in parent:
        root = find(node)
        m = comp_min.get(root)
        if m is None or node < m:
            comp_min[root] = node
    rows = sorted((n, comp_min[find(n)]) for n in parent)
    return values_df(spark, rows, f"node {dtype}, component {dtype}")


@contextlib.contextmanager
def _state_shuffle_scope(spark, n_rows: int):
    """Scale ``spark.sql.shuffle.partitions`` to the iterative STATE
    size for the duration of the eager per-round jobs, then restore.

    Why (r18, guide §2.2/§2.6): each CC round is a driver-serialized
    job over a node/edge table that is usually orders of magnitude
    smaller than the corpus that produced it (sf0.1 near-dup graph:
    1,724 edges).  At the session's corpus-sized partition count every
    round pays (stages x partitions) empty-task scheduling — the r17
    driver scaling block measured the iterative family FASTER at 8
    cores than 32 for exactly this reason.  AQE cannot help: its
    coalescing floor is the session parallelism
    (``coalescePartitions.parallelismFirst`` default).

    Derived from the observed row count (not the local core count), so
    production-scale graphs are untouched.  Only valid around
    order-insensitive state updates (CC labels are integer ``min``s) —
    never around float aggregations, where partial-aggregation order
    would change the bits.
    """
    conf = spark.conf
    try:
        cur = int(conf.get("spark.sql.shuffle.partitions"))
    except Exception:  # non-numeric/unset: leave the session alone
        yield
        return
    k = max(1, min(cur, -(-int(n_rows) // _STATE_ROWS_PER_PARTITION)))
    if k >= cur:
        yield
        return
    conf.set("spark.sql.shuffle.partitions", str(k))
    try:
        yield
    finally:
        conf.set("spark.sql.shuffle.partitions", str(cur))


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    method: str = "hash_to_min",
    materialize: bool = False,
) -> DataFrame:
    """Label every node of the undirected pair graph with the minimum
    node id of its component.

    Returns (node, component).  ``method="hash_to_min"`` needs
    O(diameter) rounds — right for near-dup clusters; ``method="star"``
    needs O(log^2 n) rounds — right for unbounded-diameter graphs.
    Warns with :class:`ConvergenceWarning` if ``max_iter`` is exhausted
    before the fixed point: the labels returned then may still be split
    across a component.

    Superseded per-round checkpoints are released as the rounds advance
    (see ``session.free_local_checkpoints`` — the cleaner never reclaims
    them).  ``materialize=True`` additionally returns the labels as an
    eager checkpoint with every internal checkpoint released, leaving
    exactly ONE pinned RDD (the result); the default leaves the final
    round's checkpoint(s) pinned because the lazy result needs them.
    """
    if method == "star":
        labels = _connected_components_star(pairs, src, dst, max_iter)
        if materialize:
            out = labels.localCheckpoint(eager=True)
            free_local_checkpoints(labels)  # nodes + final edge rounds
            return out
        return labels
    if method != "hash_to_min":
        raise ValueError(f"unknown method {method!r} (hash_to_min | star)")

    # the edge count rides the checkpoint job via observe() (no extra
    # action); it sizes the per-round shuffle partitions below
    obs_e = Observation()
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .observe(obs_e, F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    n_edges = obs_e.get["n"]
    # r18 scale-adaptive algorithm switch (guide §1.2): below the cap,
    # union-find the materialized edge table on the driver — the labels
    # (component minimum per node) are byte-identical, and the 4-6
    # driver-serialized round jobs collapse into one bounded collect.
    # Integral node ids only: Python and Spark agree on integer
    # ordering unconditionally; anything else keeps the general path.
    dtype = dict(edges.dtypes)["u"]
    if n_edges <= _CC_DRIVER_MAX_EDGES and dtype in (
        "tinyint", "smallint", "int", "bigint"
    ):
        labels = _cc_labels_driver(pairs.sparkSession, edges, dtype)
        free_local_checkpoints(edges)
        if materialize:
            return labels.localCheckpoint(eager=True)
        return labels
    # r17: label init + round 1 fused into ONE groupBy job.  With the
    # identity initial labeling (component = node), round 1's
    # neighborhood minimum reduces to min(v) per u and the pointer jump
    # is the identity, so the first round is a single aggregation over
    # the symmetric edge table — whose groupBy keys ARE the node set,
    # making the separate distinct-nodes checkpoint unnecessary.  Same
    # fixed point bit-for-bit (monotone min updates), one job fewer.
    # r18: every eager round job below runs with shuffle partitions
    # sized to the EDGE table (1,724 rows at sf0.1 vs a 32-partition
    # session layout) — the labels are integer mins, so the repartition
    # cannot change a value, only the empty-task scheduling cost
    with _state_shuffle_scope(pairs.sparkSession, n_edges):
        obs0 = Observation()
        first = (
            edges.groupBy("u")
            .agg(F.min("v").alias("_mn"))
            .select(
                F.col("u").alias("node"),
                F.least(F.col("u"), F.col("_mn")).alias("component"),
            )
            .withColumn("_changed", F.col("component") < F.col("node"))
            .observe(obs0, F.sum(F.col("_changed").cast("long")).alias("c"))
            .localCheckpoint(eager=True)
        )
        converged = not obs0.get["c"]
        labels = first.drop("_changed")
        prev_ckpt = first  # checkpointed frame backing the current labels
        for _ in range(max_iter - 1):
            if converged:
                break
            nbr_min = (
                edges.join(
                    labels.select(
                        F.col("node").alias("v"),
                        F.col("component").alias("v_comp"),
                    ),
                    "v",
                )
                .groupBy("u")
                .agg(F.min("v_comp").alias("nbr_comp"))
            )
            # r17 optimizations, same fixed point bit-for-bit:
            # (1) pointer jumping — after taking the neighborhood minimum,
            #     each node also adopts its candidate label's OWN label
            #     (labels only ever hold node ids of the same component,
            #     and the update stays monotone non-increasing, so the
            #     fixed point — every node labeled with its component
            #     minimum — is unchanged while chains collapse in
            #     O(log diameter) rounds instead of O(diameter); measured
            #     6 -> 3 rounds on the sf0.1 embedding near-dup graph);
            # (2) the convergence counter rides the checkpoint job itself
            #     via observe() (the observability.py pattern): ONE job
            #     per round instead of checkpoint + a second count action.
            cand = labels.join(
                nbr_min, labels.node == nbr_min.u, "left"
            ).select(
                "node",
                F.col("component").alias("_prev"),
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_comp"), F.col("component")),
                ).alias("_cand"),
            )
            jump = labels.select(
                F.col("node").alias("_jn"), F.col("component").alias("_jc")
            )
            obs = Observation()
            new_labels = (
                cand.join(jump, cand._cand == jump._jn, "left")
                .select(
                    "node",
                    F.least(
                        F.col("_cand"), F.coalesce(F.col("_jc"), F.col("_cand"))
                    ).alias("component"),
                    F.col("_prev"),
                )
                .withColumn("_changed", F.col("component") < F.col("_prev"))
                .observe(obs, F.sum(F.col("_changed").cast("long")).alias("c"))
                .localCheckpoint(eager=True)
            )
            changed = obs.get["c"]
            labels = new_labels.drop("_changed").drop("_prev")
            # the superseded round's checkpoint storage is dead the moment
            # its successor is eagerly materialized — release it NOW; the
            # ContextCleaner never reclaims checkpoint RDDs through the
            # py4j bridge, so without this every round pins executor
            # memory for the life of the session
            # (session.free_local_checkpoints)
            free_local_checkpoints(prev_ckpt)
            prev_ckpt = new_labels
            if not changed:
                converged = True
                break
    if not converged:
        warnings.warn(
            f"connected_components(hash_to_min) exhausted max_iter={max_iter} "
            "before converging — labels may split components whose diameter "
            "exceeds max_iter; raise max_iter or use method='star'",
            ConvergenceWarning,
            stacklevel=2,
        )
    # the edge table is only needed to compute rounds; the returned
    # labels are a materialized checkpoint, so its storage is dead
    free_local_checkpoints(edges)
    if materialize:
        out = labels.localCheckpoint(eager=True)
        free_local_checkpoints(prev_ckpt)
        return out
    return labels


def _symmetric(pairs: DataFrame, src: str, dst: str) -> DataFrame:
    return (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u, connect every strictly-larger neighbor to the
    minimum of N(u) ∪ {u}.  One groupBy, no join.

    The input may be directed (small-star emits node→min edges);
    large-star's neighborhoods are undirected, so symmetrize first."""
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    grouped = sym.groupBy("u").agg(F.collect_set("v").alias("nbrs"))
    m = F.least(F.col("u"), F.array_min("nbrs"))
    out = grouped.select(
        F.explode(F.filter("nbrs", lambda v: v > F.col("u"))).alias("u"),
        m.alias("v"),
    )
    # no trailing distinct: the only consumer (_small_star) dedups via
    # collect_set, so a distinct here would buy nothing but a shuffle
    return out.filter(F.col("u") != F.col("v"))


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges toward the smaller endpoint, then for each node u
    connect every not-larger neighbor (and u itself) to the minimum."""
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    # collect_set dedups per node — a pre-distinct would be a second
    # shuffle over the same rows
    grouped = oriented.groupBy("u").agg(F.collect_set("v").alias("nbrs"))
    m = F.least(F.col("u"), F.array_min("nbrs"))
    out = grouped.select(
        F.explode(
            F.array_union("nbrs", F.array(F.col("u")))
        ).alias("node"),
        m.alias("v"),
    )
    return (
        out.filter(F.col("node") != F.col("v"))
        .select(F.col("node").alias("u"), "v")
        .distinct()
    )


def _connected_components_star(
    pairs: DataFrame, src: str, dst: str, max_iter: int
) -> DataFrame:
    nodes = (
        pairs.select(F.col(src).alias("node"))
        .unionByName(pairs.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    obs_e = Observation()
    edges = (
        _symmetric(pairs, src, dst)
        .observe(obs_e, F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    n_edges = obs_e.get["n"]
    # Convergence probe: (count, xor of 64-bit edge hashes) is a cheap
    # map-side-combinable fingerprint of the edge set — equality across
    # rounds means (w.h.p.) the set reached its fixed point without a
    # subtract/shuffle.  xor (not sum) because it cannot overflow under
    # ANSI mode and is order-independent; a collision would only delay
    # exit by one round, never produce wrong labels.
    # The fingerprint metrics ride the checkpoint job itself via
    # observe() (the observability.py pattern): one job per round
    # instead of checkpoint + a second fingerprint action (r17
    # optimization; same labels bit-for-bit).
    prev = None
    converged = False
    # r18: star rounds are groupBy/explode jobs over the (shrinking)
    # edge set — size their shuffles to the edge count, not the session
    # corpus layout (labels/fingerprints are min/xor aggregates:
    # order-insensitive, values unchanged)
    with _state_shuffle_scope(pairs.sparkSession, n_edges):
        for _ in range(max_iter):
            superseded = edges
            obs = Observation()
            edges = (
                _small_star(_large_star(edges))
                .observe(
                    obs,
                    F.count(F.lit(1)).alias("n"),
                    F.expr("bit_xor(xxhash64(u, v))").alias("h"),
                )
                .localCheckpoint(eager=True)
            )
            # release the superseded round's pinned checkpoint
            # immediately (see connected_components — the cleaner never
            # reclaims these)
            free_local_checkpoints(superseded)
            m = obs.get
            fp = (m["n"], m["h"])
            if fp == prev:
                converged = True
                break
            prev = fp
    if not converged:
        warnings.warn(
            f"connected_components(star) exhausted max_iter={max_iter} "
            "before the edge set stabilized",
            ConvergenceWarning,
            stacklevel=3,
        )
    # At the fixed point the edges form stars centered on component
    # minimums: every non-center node points at its center.
    labels = nodes.join(
        edges.groupBy("u").agg(F.min("v").alias("component")),
        nodes.node == F.col("u"),
        "left",
    ).select("node", F.coalesce("component", "node").alias("component"))
    return labels


def degree_distribution(pairs: DataFrame, src: str, dst: str) -> DataFrame:
    """(degree, n_nodes) histogram of the undirected pair graph.

    Two hash aggregates with map-side partials; the node table never
    materializes adjacency lists."""
    nodes = pairs.select(F.col(src).alias("node")).unionByName(
        pairs.select(F.col(dst).alias("node"))
    )
    return (
        nodes.groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
        .groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )


def triangle_stats(pairs: DataFrame, src: str, dst: str) -> DataFrame:
    """Single-row graph summary: edges, wedges, triangles, global
    clustering coefficient.

    Triangle counting uses the degree-ordered orientation (each edge
    directed from its lower-(degree, id) endpoint), which bounds each
    node's out-degree by O(sqrt(m)) — the skew-proof MapReduce
    formulation (Suri & Vassilvitskii, WWW'11: "Counting Triangles and
    the Curse of the Last Reducer").  Wedge join + edge semi-join, all
    equi-joins on node/edge keys; never an unoriented neighbor
    self-join, whose hottest reducer is O(d_max^2).
    """
    e = (
        pairs.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # orient: u -> v iff (deg(u), u) < (deg(v), v)
    da, db = deg.alias("da"), deg.alias("db")
    oriented = (
        e.join(da, F.col("a") == F.col("da.node"))
        .join(db, F.col("b") == F.col("db.node"))
        .select(
            F.when(
                (F.col("da.deg") < F.col("db.deg"))
                | (
                    (F.col("da.deg") == F.col("db.deg"))
                    & (F.col("a") < F.col("b"))
                ),
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("v")))
            .alias("edge")
        )
        .select("edge.u", "edge.v")
    )
    w1, w2 = oriented.alias("w1"), oriented.alias("w2")
    wedges = (
        w1.join(w2, F.col("w1.u") == F.col("w2.u"))
        .where(F.col("w1.v") < F.col("w2.v"))
        .select(F.col("w1.v").alias("x"), F.col("w2.v").alias("y"))
    )
    closing = e.select(
        F.col("a").alias("x"), F.col("b").alias("y")
    )
    n_tri = wedges.join(closing, ["x", "y"], "leftsemi").count()
    n_edges = e.count()
    n_wedges = (
        deg.select(
            F.sum(F.col("deg") * (F.col("deg") - 1) / 2).alias("w")
        ).collect()[0].w
    )
    n_wedges = int(n_wedges or 0)
    spark = pairs.sparkSession
    clustering = (3.0 * n_tri / n_wedges) if n_wedges else 0.0
    return spark.createDataFrame(
        [(n_edges, n_wedges, n_tri, round(clustering, 6))],
        "n_edges long, n_wedges long, n_triangles long, global_clustering double",
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 5,
    checkpoint_every: int | None = 5,
    materialize: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank: ``r(v) = (1-d)/N + d·Σ_{u→v}
    r(u)/outdeg(u)``, one equi-join + one hash aggregate per
    iteration — the standard distributed formulation.

    Scale shape: ``edges``+out-degrees and the node table are persisted
    once and reused every pass; per-iteration cost is a join shuffled
    on the source key and an aggregate shuffled on the destination key
    (at 100 TB pre-partition both by node id and the join co-locates);
    driver state is a single node count.  Dangling nodes (out-degree
    0) are the caller's concern — symmetrize the edge set or add
    self-loops first; on a symmetrized graph every node has outlinks
    so no mass leaks.

    Returns (node, rank) for every node, unnormalized by convention
    (ranks sum to ~1 when no mass leaks).

    Lineage: the rank chain would otherwise accumulate into one lazy
    DAG whose Catalyst analysis time grows with the plan tree (the
    5-iteration unroll already shows 122 exchanges in PLANS.md), so
    every ``checkpoint_every`` iterations the ranks are truncated with
    ``localCheckpoint(eager=True)`` — the standard Spark
    iterative-algorithm discipline, now code rather than advice
    (VERDICT r03 item 4).  The default of 5 is the r18 re-adjudication
    under the driver's protocol (fresh JVM, untimed warmup, min-of-3
    noop sink, 32 AND 8 cores): ck=2 — the r17 default, chosen from
    warm in-session runs — is the WORST variant both places (32c:
    4.41 s vs 3.22/3.42 for none/5; 8c: 2.39 vs 1.98/1.92), because
    each eager materialization is a driver-serialized job whose fixed
    cost exceeds the Catalyst plan-size saving at bench scale; the
    driver's own r17 cold-JVM bench agreed (4.82 s vs 3.79 unrolled).
    ck=5 and None tie within noise for the 5-iteration query (no
    checkpoint fires — the `it < iterations` guard), while ck=5 keeps
    lineage bounded for longer runs.
    Checkpointing never changes a value — the stored doubles are the
    bits the plan computed — so the DuckDB unrolled-CTE oracle hash
    still matches.  Pass ``None`` to disable.
    ``materialize=True`` returns the final ranks as an eager checkpoint
    with the edge/node caches and every superseded checkpoint released —
    exactly ONE pinned RDD survives (the result); the default leaves the
    caches pinned because the lazy result recomputes through them.
    """
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d")).distinct()
    deg = e.groupBy("_s").agg(F.count(F.lit(1)).alias("_outdeg"))
    ed = e.join(deg, "_s").persist()
    nodes = (
        e.select(F.col("_s").alias("node"))
        .unionByName(e.select(F.col("_d").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    base = (1.0 - damping) / n
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    last_ckpt = None  # the one checkpoint THIS function currently owns
    for it in range(1, iterations + 1):
        contribs = (
            ed.join(ranks, ed["_s"] == ranks["node"])
            .groupBy("_d")
            .agg(F.sum(F.col("rank") / F.col("_outdeg")).alias("_c"))
        )
        ranks = nodes.join(
            contribs, nodes["node"] == contribs["_d"], "left"
        ).select(
            "node",
            (F.lit(base) + damping * F.coalesce("_c", F.lit(0.0))).alias(
                "rank"
            ),
        )
        if (
            checkpoint_every
            and it % checkpoint_every == 0
            and it < iterations
        ):
            # eager localCheckpoint: materializes the ranks on the
            # executors and cuts the lineage, so plan depth (and
            # Catalyst analysis time) stays bounded by checkpoint_every
            # instead of growing with the total iteration count; the
            # superseded checkpoint (whose rows the new one already
            # contains transitively) is released immediately — the
            # cleaner never reclaims checkpoint RDDs, so a long run
            # would otherwise pin one per checkpoint for the session.
            # Only checkpoints THIS function created are freed (a
            # caller-supplied checkpointed edges frame must survive).
            ranks = ranks.localCheckpoint(eager=True)
            if last_ckpt is not None:
                free_local_checkpoints(last_ckpt)
            last_ckpt = ranks
    if materialize:
        out = ranks.localCheckpoint(eager=True)
        if last_ckpt is not None:
            free_local_checkpoints(last_ckpt)
        ed.unpersist(blocking=True)
        nodes.unpersist(blocking=True)
        return out
    return ranks
