"""Connected components over a pair graph — the step that turns
near-duplicate *pairs* (MinHash-LSH output) into duplicate *clusters*
so a dedup pipeline can keep one representative per cluster.

Algorithm: hash-to-min label propagation. Every node starts labeled
with its own id; each round every node takes the minimum label among
itself and its neighbors; convergence in O(graph diameter) rounds.
Duplicate clusters have tiny diameters (near-dup similarity is almost
transitive), so 3-5 rounds settle real corpora. Each round is one
join + one aggregation, both partitioned on the node key — nothing
driver-side except the convergence counter. For adversarial
long-chain graphs the literature upgrade is alternating
large-star/small-star (Kiveris et al., "Connected Components in
MapReduce and Beyond"), which converges in O(log n) rounds with the
same per-round plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Label every node of the undirected pair graph with the minimum
    node id of its component.

    Returns (node, component). Lineage is cut per round with
    ``localCheckpoint`` — without it the iterated plan doubles each
    round and the job dies on plan size long before data size.
    """
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr_min = (
            edges.join(
                labels.select(
                    F.col("node").alias("v"), F.col("component").alias("v_comp")
                ),
                "v",
            )
            .groupBy("u")
            .agg(F.min("v_comp").alias("nbr_comp"))
        )
        new_labels = (
            labels.join(nbr_min, labels.node == nbr_min.u, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_comp"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels
