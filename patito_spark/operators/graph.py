"""Graph utilities for dedup pipelines: connected components.

Near-dup pair lists (MinHash/SimHash/embedding verifiers) must be grouped
into clusters before choosing a canonical representative. This is min-label
propagation — the standard distributed connected-components loop (cf.
"large-star/small-star", Kiveris et al. 2014): every node repeatedly adopts
the smallest label among itself and its neighbors until fixpoint, which
takes O(graph diameter) rounds. Each round is one join + one hash aggregate;
lineage is cut with localCheckpoint so plans don't grow unboundedly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Assign each node the minimum id reachable from it.

    Args:
        pairs: undirected edge list (one row per pair).
        max_iterations: safety bound; propagation stops early at fixpoint.

    Returns:
        ``node, component`` — component is the min node id of the cluster.
    """
    edges = pairs.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    )
    edges = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    edges = edges.localCheckpoint(eager=True)

    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_min"))
        )
        updated = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                F.col("node"),
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_min"), F.col("component")),
                ).alias("component"),
                (
                    F.coalesce(F.col("nbr_min"), F.col("component"))
                    < F.col("component")
                ).alias("__changed"),
            )
        )
        updated = updated.localCheckpoint(eager=True)
        changed = updated.agg(
            F.count(F.when(F.col("__changed"), 1)).alias("n")
        ).first()["n"]
        labels = updated.drop("__changed")
        if changed == 0:
            break
    return labels


def dedup_cluster_representatives(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """``node, component`` for every clustered doc; keep rows where
    ``node == component`` (the minimum id) as the canonical survivor."""
    return connected_components(pairs, id_a=id_a, id_b=id_b)
