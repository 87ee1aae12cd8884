"""As-of (point-in-time) join.

No reference counterpart (the reference has no joins at all,
SURVEY.md §2.2 checklist) — this is the standard lakehouse operator a
training-data pipeline needs for aligning fact rows with the most
recent dimension state (DuckDB ASOF JOIN / pandas merge_asof
semantics).

Implementation is the scalable union-tag-window plan, not a per-key
collect and not a cross join:

  1. tag left (probe) and right (build) rows, union them aligned on
     (key, time);
  2. one sort-shuffle partitioned by key ordered by (time, tag);
  3. last_value(struct(payload), ignorenulls) over rows unbounded
     preceding..current carries the most recent build row forward —
     the whole payload as ONE struct, so build rows whose individual
     payload values are NULL are still carried faithfully;
  4. keep probe rows.

Cost: a single exchange of |L|+|R| rows — the same shape Spark uses
for a sort-merge join, so it survives 100x scale-up; skewed keys are
split by AQE.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    payload: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """For each left row, attach `payload` columns from the right row
    with the greatest right_time <= left_time within the same `on`
    key group (backward as-of; an exact timestamp tie matches).

    how: 'inner' drops left rows with no prior right row; 'left'
    keeps them with NULL payload.
    """
    on = list(on)
    payload = list(payload)

    lhs = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_probe"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in payload) + ">"
        ).alias("_payload"),
    )
    rhs = right.select(
        *[F.col(c) for c in on],
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_probe"),
        F.struct(*[F.col(c) for c in payload]).alias("_payload"),
    )
    for c in left.columns:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = lhs.unionByName(rhs.select(*lhs.columns))

    # Build rows sort before probe rows at equal timestamps so an exact
    # timestamp match is visible to the probe row.
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_t").asc(), F.col("_probe").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "_carried", F.last(F.col("_payload"), ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("_probe") == 1)
    if how == "inner":
        out = out.filter(F.col("_carried").isNotNull())
    for c in payload:
        out = out.withColumn(c, F.col("_carried").getField(c))
    return out.drop("_t", "_probe", "_payload", "_carried")
