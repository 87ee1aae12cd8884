"""Fixed-iteration k-means (Lloyd's) over quantized integer vectors.

The iterative-ML member of the engine's algorithm family (next to
connected components and PageRank in operators/graph.py /
queries/dblp.py) — and the trainer for the IVF coarse codebook
(operators/similarity.py ivf_topk consumes exactly this kind of
centroid table). No reference counterpart (the reference's closest
ancestry is its iterative-MapReduce job chain, SURVEY.md §3).

Determinism contract: vectors are integer-quantized, distances are
exact integer squared-L2, centroid updates are integer truncated
division (Spark `div` ≡ DuckDB `//`, both truncate toward zero), and
argmin ties break on the lower centroid id — every iteration is
bit-identical to the unrolled-CTE oracle regardless of partitioning.

Scale: per iteration —
- assignment: broadcast join of the K-row centroid table against the
  corpus (narrow, no corpus shuffle), argmin via min_by;
- update: posexplode to (cluster, dim, val) then ONE partial-agg
  groupBy over K*dim cells and a K-row rebuild. The classic
  MapReduce k-means, K*dim tiny vs corpus.
Fixed small iteration counts keep lineage shallow (no checkpoint);
unbounded fixpoints use the localCheckpoint pattern in graph.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import quantize


def dist2_q(a, b):
    """Exact integer squared L2 distance of two quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _assign(q: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest centroid per vector (exact integer distance, ties to
    the lower cluster id). The argmin is a PARTIAL-AGGREGABLE
    min(struct(d2, cluster)) — lexicographic struct ordering gives
    exactly (d2 asc, cluster asc) — rather than a row_number window:
    the K-fanned scored table combines map-side instead of sorting
    corpus*K rows per vid partition. q is functionally dependent on
    vid, so any_value is deterministic."""
    scored = q.join(F.broadcast(cents)).withColumn("d2", dist2_q(F.col("q"), F.col("c")))
    return (
        scored.groupBy("vid")
        .agg(
            F.min(F.struct("d2", "cluster")).alias("_b"),
            F.any_value("q").alias("q"),
        )
        .select("vid", "q", F.col("_b.cluster").alias("cluster"), F.col("_b.d2").alias("d2"))
    )


def kmeans_train(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    init_ids: Sequence[int],
    iters: int = 2,
    scale: int = 1000,
) -> DataFrame:
    """Run `iters` Lloyd iterations from centroids seeded at
    `init_ids`; returns the trained quantized centroid table
    (cluster, c) — the coarse codebook consumed by
    similarity.semdedup / similarity.ivf_topk in place of their
    seeded-by-id centroid rows."""
    # Spread + pin the quantized corpus for the duration of training:
    # every Lloyd iteration re-reads it (assignment + update), the
    # per-iteration centroid checkpoint makes each iteration an
    # action, and a small input file may scan as 1-2 splits (parquet
    # can't split below a row group), serializing the per-dim sums.
    # One explicit shuffle to shuffle.partitions + a persist bounds
    # the rescans to one; unpersisted before returning.
    n_shuffle = int(corpus.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    q = (
        corpus.select(
            F.col(id_col).alias("vid"), quantize(F.col(vec_col), scale).alias("q")
        )
        .repartition(n_shuffle)
        .persist()
    )
    cents = q.filter(F.col("vid").isin(list(init_ids))).select(
        F.col("vid").alias("cluster"), F.col("q").alias("c")
    )
    for _ in range(iters):
        # materialize the K-row table per iteration: each Lloyd step
        # is a natural barrier, and without the cut every DOWNSTREAM
        # use of the trained centroids (assignment, probe, pairwise
        # verify branches) re-executes the whole training chain —
        # measured 3x recompute in the SemDeDup composition. K rows,
        # so the checkpoint is free. The pre-checkpoint plan is
        # audited via _update_centroids (tools/plan_audit.py
        # kmeans_iteration[pre-checkpoint]).
        cents = _update_centroids(_assign(q, cents)).localCheckpoint(eager=True)
    q.unpersist()
    return cents


def _update_centroids(assigned: DataFrame) -> DataFrame:
    """One Lloyd centroid update: posexplode to (cluster, dim, val),
    ONE partial-agg groupBy over K*dim cells, K-row rebuild."""
    ex = assigned.select("cluster", F.posexplode("q").alias("dim", "val"))
    per_dim = ex.groupBy("cluster", "dim").agg(
        F.sum("val").alias("s"), F.count(F.lit(1)).alias("n")
    )
    return (
        per_dim.withColumn("cv", F.expr("s div n"))
        .groupBy("cluster")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "cv"))),
                lambda st: st.cv,
            ).alias("c")
        )
    )


def kmeans_assign(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: DataFrame,
    scale: int = 1000,
) -> DataFrame:
    """Assign every corpus row to its nearest centroid from a trained
    (cluster, c) table (kmeans_train output): broadcast K-row join,
    exact integer distances, ties to the lower cluster id. Returns
    (id_col, cluster) — the consumer-facing assignment surface used
    by compositions like llm_cluster_top_terms."""
    q = corpus.select(
        F.col(id_col).alias("vid"), quantize(F.col(vec_col), scale).alias("q")
    )
    return _assign(q, centroids).select(F.col("vid").alias(id_col), "cluster")


def kmeans_fixed(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    init_ids: Sequence[int],
    iters: int = 2,
    scale: int = 1000,
) -> DataFrame:
    """Run `iters` Lloyd iterations from centroids seeded at
    `init_ids`; returns the final per-cluster summary
    (cluster, n_members, sse, min_member) — all exact integers."""
    q = corpus.select(
        F.col(id_col).alias("vid"), quantize(F.col(vec_col), scale).alias("q")
    )
    cents = kmeans_train(corpus, id_col, vec_col, init_ids, iters, scale)
    final = _assign(q, cents)
    return final.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum("d2").alias("sse"),
        F.min("vid").alias("min_member"),
    )
