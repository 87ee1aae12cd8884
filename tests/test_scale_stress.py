"""Adversarial-scale stress for the two-regime LSH candidate
generator: a 200k-signature corpus with one Zipfian hot bucket of
2,000 members (1,999,000 pairs through the self-join regime, far past
LSH_HOT_BUCKET) plus 198k unique signatures flowing through the
small-bucket aggregate. The old collect_list-only formulation put the
whole hot bucket in ONE aggregate row and its ~2M pairs in one task;
this asserts the split formulation computes the exact pair set at a
volume where that concentration would be a straggler."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from map_reduce_for_dbpl_dataset_spark.operators.dedup import (
    N_PERM,
    lsh_candidate_pairs,
)

N_TOTAL = 200_000
N_HOT = 2_000


@pytest.mark.slow
def test_lsh_hot_bucket_at_scale(spark):
    sigs = spark.range(N_TOTAL).select(
        F.col("id").alias("doc_id"),
        *[
            F.when(F.col("id") < N_HOT, F.lit(7))
            .otherwise(F.col("id") * (N_PERM + 1) + k)
            .cast("long")
            .alias(f"sig_{k}")
            for k in range(N_PERM)
        ],
    )
    pairs = lsh_candidate_pairs(sigs, "doc_id")
    n_hot_pairs = N_HOT * (N_HOT - 1) // 2
    agg = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when((F.col("id_a") < N_HOT) & (F.col("id_b") < N_HOT), 1).otherwise(0)
        ).alias("n_hot"),
        F.max("id_b").alias("max_b"),
    ).collect()[0]
    # unique signatures (id*(K+1)+k) never share a full 4-sig band key,
    # so the hot bucket is the only pair source
    assert agg["n"] == n_hot_pairs
    assert agg["n_hot"] == n_hot_pairs
    assert agg["max_b"] == N_HOT - 1
