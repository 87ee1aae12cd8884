"""Iterative graph operators (DataFrame-native).

connected_components: min-label propagation to fixpoint. Each
superstep is one join + one min-aggregate; lineage is cut with
localCheckpoint so the logical plan stays O(1) across iterations, and
convergence is detected by counting changed labels (an action per
superstep — unavoidable for any fixpoint loop).

Used by dblp_coauthor_components (co-author graph) and
llm_dedup_clusters (near-duplicate transitive closure). At 100 TB
graph sizes, swap in the large-star/small-star variant: same
join+aggregate per round, O(log n) supersteps instead of diameter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    vertices: DataFrame,
    src: str = "src",
    dst: str = "dst",
    vertex: str = "node",
    max_iters: int = 100,
) -> DataFrame:
    """(vertices[vertex], edges[src,dst]) -> (node, component) where
    component = min vertex label reachable in the undirected graph.
    Isolated vertices form singleton components."""
    bi = (
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .unionByName(edges.select(F.col(dst).alias("_s"), F.col(src).alias("_d")))
        .distinct()
        .persist()
    )
    labels = (
        vertices.select(F.col(vertex).alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iters):
        neighbor_min = (
            bi.join(labels, bi["_s"] == labels["node"])
            .select(F.col("_d").alias("node"), "component")
            .groupBy("node")
            .agg(F.min("component").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nmin", F.col("component"))
                ).alias("component"),
                (F.coalesce("nmin", F.col("component")) < F.col("component")).alias(
                    "_chg"
                ),
            )
        ).localCheckpoint()
        changed = new_labels.filter(F.col("_chg")).count()
        labels = new_labels.drop("_chg")
        if changed == 0:
            break
    bi.unpersist()
    return labels
