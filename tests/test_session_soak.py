"""Session-soak no-residue gate (VERDICT r05 item 5): the composed
pipelines run for three full cycles in ONE long-lived session and the
persisted-RDD set returns to its baseline after every cycle — the
regression gate for the r05 localCheckpoint-leak discovery
(localCheckpoint RDDs are never GC-reclaimed through py4j; every
operator must free what it pinned, SCALE.md).
"""

import os

import pytest
from pyspark.sql import functions as F

from parquet_converters_spark.operators.graph import (
    connected_components,
    pagerank,
)
from parquet_converters_spark.pipelines import prepare_corpus
from parquet_converters_spark.session import free_local_checkpoints


@pytest.fixture(scope="module")
def soak_bundle(spark, tmp_path_factory):
    from parquet_converters_spark.pipelines import parquet_to_sonata

    tmp = tmp_path_factory.mktemp("soak")
    edges = spark.range(200).select(
        (F.col("id") % 13).cast("int").alias("source_node_id"),
        (F.col("id") % 7).cast("int").alias("target_node_id"),
        F.lit(0).cast("long").alias("edge_type_id"),
    )
    in_dir = str(tmp / "edges_in")
    edges.coalesce(1).write.parquet(in_dir)
    out = str(tmp / "bundle")
    parquet_to_sonata(spark, in_dir, out, population="p")
    return out


def test_three_cycle_soak_leaves_no_residue(
    spark, sf_dir, soak_bundle, tmp_path
):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5), (6, 7), (7, 8)], "id_a long, id_b long"
    )
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2), (3, 1), (1, 3)],
        "src long, dst long",
    )
    jsc = spark.sparkContext._jsc
    baseline = set(jsc.getPersistentRDDs().keySet().toArray())

    results = []
    for cycle in range(3):
        clean, report = prepare_corpus(docs, min_len=10, min_quality=0.0)
        n_clean = clean.count()
        stages = {r["stage"]: r["n_docs"] for r in report.collect()}
        assert free_local_checkpoints(clean) >= 1

        labels = connected_components(pairs, materialize=True)
        comp = tuple(sorted(
            (r["node"], r["component"]) for r in labels.collect()
        ))
        assert free_local_checkpoints(labels) == 1

        ranks = pagerank(
            edges, iterations=12, checkpoint_every=4, materialize=True
        )
        total_rank = round(sum(r["rank"] for r in ranks.collect()), 9)
        assert free_local_checkpoints(ranks) == 1

        from parquet_converters_spark.sinks.sonata import (
            export_hdf5_parallel,
        )

        h5 = str(tmp_path / f"soak_{cycle}.h5")
        export_hdf5_parallel(spark, soak_bundle, "p", h5)
        size = os.path.getsize(h5)

        # no-residue: the persisted set is EXACTLY the baseline again
        residue = set(jsc.getPersistentRDDs().keySet().toArray()) - baseline
        assert not residue, f"cycle {cycle}: leaked RDD ids {residue}"
        results.append((n_clean, stages, comp, total_rank, size))

    # stability: every cycle computed identical results (a leak that
    # aliased freed storage would show up here as cross-cycle drift)
    assert results[0] == results[1] == results[2]
