"""Vector math over array<float> embedding columns.

Built-in higher-order functions (zip_with / aggregate / transform)
keep the math JVM-side — no UDF, no Python round-trips.

Determinism: embeddings are quantized to integers (floor(x * scale))
before any similarity math, so dot products and squared norms are
EXACT integers and the final cosine is one IEEE double expression —
bit-identical across engines and partitionings. This mirrors the
int8-quantization trick production ANN systems use; the scale path
and the oracle path compute the same thing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def quantize(vec: Column, scale: int = 1000) -> Column:
    """array<float> -> array<long>, qi = floor(xi * scale)."""
    return F.transform(vec, lambda x: F.floor(x.cast("double") * scale).cast("long"))


def dot_q(a: Column, b: Column) -> Column:
    """Exact integer dot product of two quantized vectors.

    Elements are widened to long BEFORE the multiply so the math is
    identical for array<long> and narrowed array<int> inputs (the
    semdedup pair stage ships int32 vectors to halve shuffle bytes —
    operators/similarity.py); for long inputs Catalyst's SimplifyCasts
    removes the no-op cast, so the historical plans are unchanged."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("long") * y.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def norm2_q(a: Column) -> Column:
    """Exact integer squared norm (same widening rule as dot_q)."""
    return F.aggregate(
        F.transform(a, lambda x: x.cast("long") * x.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def cosine_q(dot: Column, n2a: Column, n2b: Column) -> Column:
    """Cosine from exact integer parts; single double expression."""
    return dot.cast("double") / F.sqrt(n2a.cast("double") * n2b.cast("double"))
