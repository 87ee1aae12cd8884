"""Per-group argmax keeping all ties.

Replaces the reference Q4's map-side running argmax
(Homework2.scala:321-339), whose maxima are per-mapper and never
re-reduced — with >1 input split the output is a superset of the true
per-venue argmax (SURVEY.md §2.1 Q4 ⚠). The window form computes the
global max per group and keeps every row attaining it; Catalyst still
does partial aggregation map-side, so the reference's intent
(bounded mapper state) is preserved without the correctness bug.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def argmax_per_group(
    df: DataFrame, group_by: Sequence[str], value: str
) -> DataFrame:
    """All rows of df attaining the per-group maximum of `value`."""
    w = Window.partitionBy(*group_by)
    return (
        df.withColumn("_mx", F.max(value).over(w))
        .filter(F.col(value) == F.col("_mx"))
        .drop("_mx")
    )
