"""Degree distribution, skew-safe triangle counting, shingle
containment — checked against hand-countable graphs."""

import pytest
from pyspark.sql import functions as F

from parquet_converters_spark.functions.dedup import shingle_containment
from parquet_converters_spark.operators.graph import (
    degree_distribution,
    triangle_stats,
)


def _pairs(spark, edges):
    return spark.createDataFrame(edges, ["id_a", "id_b"])


def test_degree_distribution(spark):
    # star: center 0 with leaves 1..4
    dd = {
        r.degree: r.n_nodes
        for r in degree_distribution(
            _pairs(spark, [(0, i) for i in range(1, 5)]), "id_a", "id_b"
        ).collect()
    }
    assert dd == {1: 4, 4: 1}


def test_triangle_count_k4(spark):
    """K4 has 4 triangles, 6 edges, 12 wedges, clustering 1.0."""
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    r = triangle_stats(_pairs(spark, edges), "id_a", "id_b").collect()[0]
    assert (r.n_edges, r.n_wedges, r.n_triangles) == (6, 12, 4)
    assert r.global_clustering == 1.0


def test_triangle_count_triangle_plus_tail(spark):
    r = triangle_stats(
        _pairs(spark, [(1, 2), (2, 3), (1, 3), (3, 4)]), "id_a", "id_b"
    ).collect()[0]
    assert r.n_triangles == 1
    assert r.n_edges == 4


def test_triangle_count_path_has_none(spark):
    r = triangle_stats(
        _pairs(spark, [(1, 2), (2, 3), (3, 4)]), "id_a", "id_b"
    ).collect()[0]
    assert r.n_triangles == 0 and r.global_clustering == 0.0


def test_triangle_unordered_and_dup_edges(spark):
    """Edges arriving in either orientation / duplicated must not
    change the count."""
    r = triangle_stats(
        _pairs(spark, [(2, 1), (3, 2), (1, 3), (1, 2), (2, 2)]),
        "id_a",
        "id_b",
    ).collect()[0]
    assert r.n_edges == 3 and r.n_triangles == 1


def test_shingle_containment_quote_inside_doc(spark):
    short = "alpha beta gamma delta epsilon"
    long_ = "intro words here " + short + " trailing content words end"
    docs = spark.createDataFrame(
        [(1, short), (2, long_), (3, "unrelated totally different stuff")],
        ["doc_id", "text"],
    )
    pairs = spark.createDataFrame([(1, 2), (1, 3)], ["id_a", "id_b"])
    got = {
        (r.id_a, r.id_b): r
        for r in shingle_containment(docs, pairs).collect()
    }
    # every 3-shingle of the short doc appears in the long one
    assert got[(1, 2)].containment_a == pytest.approx(1.0)
    assert got[(1, 2)].containment_b < 0.5
    # disjoint docs: zero common, containment 0 (left-join path)
    assert got[(1, 3)].n_common == 0
    assert got[(1, 3)].containment_a == 0.0


def test_pagerank_matches_numpy_power_iteration(spark):
    """5-iteration PageRank on a small directed graph must equal the
    numpy replica of the same recurrence to double precision."""
    import numpy as np

    from parquet_converters_spark.operators.graph import pagerank

    edges = [(0, 1), (1, 0), (1, 2), (2, 0), (2, 1), (0, 2), (3, 0), (0, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, damping=0.85, iterations=5).collect()
    }

    nodes = sorted({u for e in edges for u in e})
    n = len(nodes)
    outdeg = {u: sum(1 for s, _ in edges if s == u) for u in nodes}
    r = {u: 1.0 / n for u in nodes}
    for _ in range(5):
        contrib = {u: 0.0 for u in nodes}
        for s, t in edges:
            contrib[t] += r[s] / outdeg[s]
        r = {u: (1 - 0.85) / n + 0.85 * contrib[u] for u in nodes}
    for u in nodes:
        assert abs(got[u] - r[u]) < 1e-12, (u, got[u], r[u])
    assert abs(sum(got.values()) - 1.0) < 1e-9  # no mass leak


def test_pagerank_symmetric_pair_is_uniform(spark):
    from parquet_converters_spark.operators.graph import pagerank

    df = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    out = {r["node"]: r["rank"] for r in pagerank(df, iterations=3).collect()}
    assert abs(out[0] - 0.5) < 1e-12 and abs(out[1] - 0.5) < 1e-12


def test_pagerank_checkpoint_matches_unrolled(spark):
    """checkpoint_every must not change values: a checkpointed run
    equals the fully-unrolled lineage run to double precision
    (VERDICT r03 item 4)."""
    from parquet_converters_spark.operators.graph import pagerank

    edges = [(0, 1), (1, 0), (1, 2), (2, 0), (2, 1), (0, 2), (3, 0), (0, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    plain = {
        r["node"]: r["rank"]
        for r in pagerank(df, iterations=5, checkpoint_every=None).collect()
    }
    ckpt = {
        r["node"]: r["rank"]
        for r in pagerank(df, iterations=5, checkpoint_every=2).collect()
    }
    for u in plain:
        assert abs(plain[u] - ckpt[u]) < 1e-12, (u, plain[u], ckpt[u])


def test_pagerank_50_iterations_bounded_plan(spark):
    """50 iterations with the default checkpoint cadence completes, the
    final plan depth is bounded by checkpoint_every (not 50), and the
    ranks have converged to the stationary distribution."""
    from parquet_converters_spark.operators.graph import pagerank

    edges = [(0, 1), (1, 0), (1, 2), (2, 0), (2, 1), (0, 2), (3, 0), (0, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    ranks = pagerank(df, iterations=50)  # default checkpoint_every=5
    plan = ranks._jdf.queryExecution().optimizedPlan().toString()
    # lineage truncation: only the last <=5 iterations of joins survive
    # in the plan (a full 50-iteration unroll would carry ~4 "Join"
    # tokens per iteration, ~200 total)
    assert plan.count("Join") <= 50, plan.count("Join")
    got = {r["node"]: r["rank"] for r in ranks.collect()}
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # iterate the recurrence in numpy to its fixed point and compare
    nodes = sorted({u for e in edges for u in e})
    n = len(nodes)
    outdeg = {u: sum(1 for s, _ in edges if s == u) for u in nodes}
    r = {u: 1.0 / n for u in nodes}
    for _ in range(50):
        contrib = {u: 0.0 for u in nodes}
        for s, t in edges:
            contrib[t] += r[s] / outdeg[s]
        r = {u: (1 - 0.85) / n + 0.85 * contrib[u] for u in nodes}
    for u in nodes:
        assert abs(got[u] - r[u]) < 1e-10, (u, got[u], r[u])


def test_iterative_operators_leave_no_pinned_rdds(spark):
    """materialize=True: connected_components (both methods) and
    pagerank leave exactly one pinned RDD — the returned frame — and
    none after it is freed.  Without explicit release the superseded
    per-round localCheckpoints would pin executor memory for the life
    of the session (the ContextCleaner never reclaims them; SCALE.md
    round-5 notes)."""
    from parquet_converters_spark.operators.graph import (
        connected_components,
        pagerank,
    )
    from parquet_converters_spark.session import free_local_checkpoints

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5), (6, 7), (7, 8), (8, 9)],
        "id_a long, id_b long",
    )
    jsc = spark.sparkContext._jsc

    for method in ("hash_to_min", "star"):
        before = set(jsc.getPersistentRDDs().keySet().toArray())
        labels = connected_components(pairs, method=method, materialize=True)
        got = {r["node"]: r["component"] for r in labels.collect()}
        assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6, 7: 6, 8: 6, 9: 6}
        new = set(jsc.getPersistentRDDs().keySet().toArray()) - before
        assert len(new) == 1, (method, len(new))
        assert free_local_checkpoints(labels) == 1
        assert not set(jsc.getPersistentRDDs().keySet().toArray()) - before

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2)], "src long, dst long"
    )
    before = set(jsc.getPersistentRDDs().keySet().toArray())
    ranks = pagerank(edges, iterations=25, checkpoint_every=5,
                     materialize=True)
    assert abs(sum(r["rank"] for r in ranks.collect()) - 1.0) < 1e-9
    new = set(jsc.getPersistentRDDs().keySet().toArray()) - before
    assert len(new) == 1, len(new)
    assert free_local_checkpoints(ranks) == 1
    assert not set(jsc.getPersistentRDDs().keySet().toArray()) - before
