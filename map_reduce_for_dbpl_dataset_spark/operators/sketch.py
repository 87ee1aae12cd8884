"""Count-min sketch as DataFrame algebra (Cormode & Muthukrishnan,
"An improved data stream summary: the count-min sketch and its
applications", J. Algorithms 2005).

Spark ships a `count_min_sketch` aggregate but returns an opaque
binary with no SQL-side estimator, so the sketch here is built as
plain relational ops: the sketch IS a (depth, bucket, count) table of
at most depth*width rows — a bounded summary of an unbounded stream.

Scale: the build is one partial-aggregated shuffle whose final state
is depth*width rows REGARDLESS of input size (each task pre-collapses
to <= depth*width partial rows before the exchange — the map-side
combine is what makes a sketch a sketch). Estimation broadcasts the
sketch (a few KB) and probes it per candidate key: no shuffle of the
corpus, no full-cardinality groupBy. The classic 100 TB use: find
heavy hitters over a key too high-cardinality to aggregate exactly,
paying O(depth*width) memory for an overestimate bounded by
eps*N = (e/width)*N with probability 1 - (1/e)^depth.

Hashing is the portable md5-based hash60 (functions/text.py) so a SQL
oracle reproduces the sketch bit-for-bit; at production scale pass
hash_fn=F.xxhash64-based columns instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import hash60

CMS_DEPTH = 4
CMS_WIDTH = 256


def _coords(
    k: Column, depth: int, width: int, hash_fn: Callable[[Column], Column]
) -> list[tuple[Column, Column]]:
    # row i hashes "i:key" — independent-enough hash family, and the
    # exact concat form the DuckDB oracle mirrors
    return [
        (
            F.lit(i),
            hash_fn(F.concat_ws(":", F.lit(str(i)), k)) % width,
        )
        for i in range(depth)
    ]


def cms_build(
    df: DataFrame,
    key: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    hash_fn: Callable[[Column], Column] = hash60,
) -> DataFrame:
    """Sketch table (d, bucket, c): c = number of input rows whose
    key hashes to bucket under hash row d. At most depth*width rows."""
    k = F.col(key).cast("string")
    pairs = F.array(
        *[F.struct(d.alias("d"), b.alias("bucket")) for d, b in _coords(k, depth, width, hash_fn)]
    )
    return (
        df.select(F.explode(pairs).alias("p"))
        .select("p.d", "p.bucket")
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    key: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    hash_fn: Callable[[Column], Column] = hash60,
) -> DataFrame:
    """(key, est): est = min over depth rows of the probed bucket
    counts — >= true frequency always, <= true + (e/width)*N w.h.p.
    The sketch side is broadcast; candidates never shuffle."""
    k = F.col(key).cast("string")
    pairs = F.array(
        *[F.struct(d.alias("d"), b.alias("bucket")) for d, b in _coords(k, depth, width, hash_fn)]
    )
    probes = candidates.select(
        k.alias("_cms_k"), F.explode(pairs).alias("p")
    ).select("_cms_k", "p.d", "p.bucket")
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy("_cms_k")
        .agg(F.min("c").alias("est"))
        .select(F.col("_cms_k").alias(key), "est")
    )
