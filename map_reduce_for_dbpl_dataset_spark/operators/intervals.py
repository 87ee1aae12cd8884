"""Point-in-interval (temporal containment) join as an equi-join.

Spark has no native range-join optimization: `p.ts BETWEEN i.start
AND i.end` with no equality key plans as BroadcastNestedLoopJoin (or
a cartesian with per-pair filter) — quadratic work and, past the
broadcast threshold, an outright non-starter at 100 TB. The standard
fix (Databricks' range-join bin hints, DuckDB's IEJoin literature) is
to discretize the time axis: every interval is REPLICATED to each
fixed-width bin it overlaps, every point lands in exactly ONE bin,
and the join becomes an equi-join on bin id followed by the exact
containment filter. Each matching pair meets in precisely the point's
bin, so no dedup pass is needed.

Cost model: replication factor = ceil(interval_len / bin_days) + 1,
so pick bin_days ~ the typical interval length (replication ~2) —
bins too fine replicate intervals, bins too coarse fatten the
per-bin candidate set toward quadratic. The shuffle is on bin id;
heavily loaded bins (event bursts) are ordinary equi-join skew, which
AQE skew-split handles — unlike the nested-loop plan, which has no
skew story at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EPOCH = "1970-01-01"


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_days: int = 14,
) -> DataFrame:
    """Inner-join rows of `points` to every `intervals` row whose
    [start_col, end_col] (inclusive, DATE columns) contains
    point_col. Column names across the two inputs must be disjoint.
    Returns the joined rows minus the internal bin column."""
    day = lambda c: F.datediff(F.col(c), F.lit(_EPOCH).cast("date"))  # noqa: E731
    p = points.withColumn("_pii_bin", F.floor(day(point_col) / bin_days))
    i = intervals.withColumn(
        "_pii_bin",
        F.explode(
            F.sequence(
                F.floor(day(start_col) / bin_days), F.floor(day(end_col) / bin_days)
            )
        ),
    )
    return (
        p.join(i, "_pii_bin")
        .filter(F.col(point_col).between(F.col(start_col), F.col(end_col)))
        .drop("_pii_bin")
    )
