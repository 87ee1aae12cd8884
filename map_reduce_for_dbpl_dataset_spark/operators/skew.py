"""Skew-handling aggregation: salted two-phase reduce.

SURVEY.md §4/§7 flag Zipfian keys (DBLP venues/authors, a handful of
lineitem return flags) as the 100 TB hazard: one hot grouping key
means one reducer does all the work no matter how many executors
exist — precisely the reference's single-reducer top-k bottleneck
(Homework2.scala:70-71) writ large.

The standard fix: phase 1 aggregates on (key, salt) — the hot key's
rows spread over n_salts reducers; phase 2 merges the n_salts partial
rows per key, a tiny aggregate. Works for any decomposable aggregate
(sum/count/min/max; avg as sum+count). Catalyst's partial aggregation
already gives map-side combining per task — salting additionally
splits the REDUCE side, which partial aggregation cannot.

AQE skew-join handles skewed JOINS automatically; skewed AGGREGATES
need this explicit pattern (or enough distinct keys per partition).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    keys: Sequence[str],
    sums: dict[str, Column],
    salt: Column,
    n_salts: int = 16,
) -> DataFrame:
    """groupBy(keys).agg(sum(...) per `sums`, count(*)) computed in two
    salted phases. `salt` must be deterministic per row (e.g. a key
    column mod n_salts) so reruns are stable; results are identical to
    the unsalted aggregate because sums/counts re-merge exactly.
    Output: keys + one column per `sums` alias + `n_rows`.
    """
    keys = list(keys)
    phase1 = (
        df.withColumn("_salt", salt % n_salts)
        .groupBy(*keys, "_salt")
        .agg(
            *[F.sum(c).alias(f"_s_{a}") for a, c in sums.items()],
            F.count(F.lit(1)).alias("_n"),
        )
    )
    return phase1.groupBy(*keys).agg(
        *[F.sum(f"_s_{a}").alias(a) for a in sums],
        F.sum("_n").alias("n_rows"),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: Column,
    n_salts: int = 16,
) -> DataFrame:
    """Equi-join where one key is Zipfian-hot on the BIG side: salt the
    big side with a deterministic per-row value and replicate the small
    side across all n_salts, joining on (key, salt) — the hot key's
    rows land in n_salts tasks instead of one.

    This is the explicit fallback for the regimes AQE skew-split does
    NOT cover: a skewed broadcast-ineligible join feeding a same-key
    aggregate (AQE can split the join, but the downstream shuffle
    re-concentrates the key), or a build side just over the broadcast
    threshold. Result is row-identical to a plain equi-join because
    every (key, salt) pair on the big side meets exactly one replica.

    Cost model: the small side is exploded n_salts-fold BEFORE its
    shuffle — use only when |small| * n_salts stays far below the big
    side (the usual case: a dimension vs a fact).
    """
    replicated = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return (
        big.withColumn("_salt", (salt % n_salts).cast("int"))
        .join(replicated, [key, "_salt"])
        .drop("_salt")
    )
