"""Iterative graph operators: connected components over a pair/edge set.

Used to turn near-duplicate PAIRS into transitive dedup GROUPS (the
cluster-level semantics a training pipeline needs: one representative
per component).

Algorithm: min-label propagation — every node starts labeled with its
own id; each round, a node takes the min label among itself and its
neighbors; converges in O(diameter) rounds. Each round is one
join + aggregate (all shuffle-based, no driver data); lineage is
truncated per round with ``localCheckpoint`` so plans don't grow
unboundedly (the standard iterative-DataFrame pattern; cf. GraphX/
GraphFrames connected components, Kiveris et al. "Connected Components
in MapReduce and Beyond" for the large-star/small-star variant this
simplifies).

100 TB notes: shuffle per round is |edges|; for web-scale graphs use
the large-star/small-star optimization (fewer rounds, same primitive).
Near-dup graphs from LSH are short-diameter (dup clusters are cliques
or near-cliques), so a handful of rounds suffices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
) -> DataFrame:
    """Return (node, component) with component = min node id reachable.

    ``edges`` is an undirected pair set; isolated nodes absent from it
    simply don't appear (callers union them back with their own id).
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).union(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    ).distinct()
    labels = sym.select(F.col("a").alias("node")).distinct().withColumn("component", F.col("node"))
    sym = sym.localCheckpoint()
    labels = labels.localCheckpoint()

    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("component").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.a, "left")
            .select(
                "node",
                F.least(F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))).alias("component"),
            )
        ).localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels
