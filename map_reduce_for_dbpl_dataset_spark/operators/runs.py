"""Longest consecutive run (gaps-and-islands).

Replaces the reference's collect-then-scan `yearsOfLongestContinuum`
(Homework2.scala:206-227), which (a) materializes all of a key's
values in reducer memory and (b) resets the streak on duplicate
values — two papers in the same year truncate a 30-year run
(SURVEY.md §2.1 Q2 ⚠). This operator implements the intended
semantics (runs over DISTINCT values) as a pure window plan:

    island = value - row_number()  over (partition by key order by value)

is constant within a consecutive run, so a groupBy on (key, island)
counts run lengths without ever collecting a key's values on one node
— the state per group is one counter, spill-safe at any scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def longest_consecutive_run(
    df: DataFrame,
    group_by: Sequence[str],
    value: str,
    out_col: str = "longest_run",
) -> DataFrame:
    """Per group, the length of the longest run of consecutive integer
    values (duplicates collapsed first). Returns group_by + out_col."""
    keys = [F.col(c) for c in group_by]
    distinct = df.select(*keys, F.col(value)).distinct()
    w = Window.partitionBy(*group_by).orderBy(value)
    islands = distinct.withColumn(
        "_island", F.col(value) - F.row_number().over(w)
    )
    run_lengths = islands.groupBy(*group_by, F.col("_island")).agg(
        F.count(F.lit(1)).alias("_run_len")
    )
    return run_lengths.groupBy(*group_by).agg(F.max("_run_len").alias(out_col))
