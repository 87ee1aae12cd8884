"""Z-order (Morton) multi-column clustering for data skipping.

A linear sort clusters ONE column: parquet row-group min/max stats
become tight on it and useless on everything else. Interleaving the
bits of several columns into one Morton key and sorting on THAT gives
every participating column locality ~ 1/k of its range per row group,
so a range predicate on ANY of them skips most row groups at scan
time (the Delta/Iceberg OPTIMIZE ZORDER layout, from Morton 1966's
space-filling curve). This is a pure LAYOUT transform: row content is
untouched, which is exactly what the oracle proves — the re-read
filtered result is byte-identical to filtering the unclustered table.

Scale: repartitionByRange on the z-key places contiguous curve
segments in the same file (one range shuffle at write time — the
standard price of clustering, paid once, amortized over every later
selective scan); sortWithinPartitions orders rows inside each file so
row-group stats are tight. No action, no sampling beyond the range
partitioner's own.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(cols: list[Column], bits: int = 16) -> Column:
    """Morton key of the given non-negative int columns: bit i of
    column j lands at position i * len(cols) + j. Columns must already
    be scaled into [0, 2^bits) — production recipe is one min/max pass
    then proportional scaling; callers with known domains scale with a
    fixed expression. Static expression tree (bits * k terms), fully
    whole-stage-codegen'd, no UDF."""
    n = len(cols)
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        x = c.cast("long")
        for i in range(bits):
            z = z + F.shiftleft(F.shiftright(x, i).bitwiseAND(1), i * n + j)
    return z


def write_zordered(
    df: DataFrame, path: str, zcols: list[Column], n_files: int = 8, bits: int = 16
) -> None:
    """Write df parquet clustered on the Morton key of zcols."""
    z = interleave_bits(zcols, bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
