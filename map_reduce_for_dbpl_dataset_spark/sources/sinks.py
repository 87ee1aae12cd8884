"""Sinks: CSV-with-separator and partitioned parquet.

The reference's only sink is Hadoop TextOutputFormat writing
``key<sep>value`` lines with a configurable separator (',' or '|' via
mapreduce.output.textoutputformat.separator, Homework2.scala:548,
553,565,628), optionally merged into a single ordered file
(dblpXMLparser.scala:65-82 collects futures in order and appends).

Spark-native replacement: ``df.write.option("sep", ...).csv`` keeps
the output partitioned — one file per task, no single-writer
bottleneck; the reference's coalesce-to-one-file merge is exactly the
anti-pattern a 100 TB engine must avoid (a post-hoc `hadoop fs
-getmerge`/object-store compose is the operational equivalent when one
file is truly required). Partitioned parquet is the engine's native
sink: directory-per-key layout gives downstream scans partition
pruning for free.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def sink_dir(tag: str, *keys: str) -> str:
    """Deterministic scratch directory for a sink roundtrip: one per
    (tag, keys) so repeated runs overwrite rather than accumulate."""
    digest = hashlib.md5("\x00".join(keys).encode()).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"mrdbpl_sink_{tag}_{digest}")


def write_csv(df: DataFrame, path: str, sep: str = ",") -> None:
    """TextOutputFormat-equivalent: delimited text, partitioned output
    (part files, no coalesce(1) single-writer funnel)."""
    df.write.mode("overwrite").option("sep", sep).option("header", "false").csv(path)


def read_csv(spark: SparkSession, path: str, schema: str, sep: str = ",") -> DataFrame:
    return spark.read.schema(schema).option("sep", sep).csv(path)


def write_ordered_single_text(
    df: DataFrame, path: str, order_by: list[Column], sep: str = ","
) -> None:
    """OPT-IN ordered single-file text sink — operational parity with
    the reference's merge step (dblpXMLparser.scala:65-82 collects
    futures in submission order into ONE file; HomeworkReport.md's
    ``fs -cat`` flow expects it).

    Rows are rendered ``col1<sep>col2<sep>...`` and land in ONE part
    file in exactly ``order_by`` order: the global sort range-
    partitions, and coalesce(1) concatenates the sorted partitions in
    index order, so the file is byte-ordered. This is deliberately a
    single-writer funnel — correct for small operational outputs
    (reports, top-k exports), never for bulk data; ``write_csv`` is
    the scale path.
    """
    # concat_ws silently DROPS null inputs, which would shift every
    # later field left and break positional read-back — coalesce each
    # cell to '' so null cells keep their field position.
    line = F.concat_ws(
        sep, *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in df.columns]
    )
    (
        df.orderBy(*order_by)
        .select(line.alias("value"))
        .coalesce(1)
        .write.mode("overwrite")
        .text(path)
    )


def write_partitioned_parquet(df: DataFrame, path: str, *partition_cols: str) -> None:
    """Directory-per-key parquet layout; readers filtering on the
    partition columns scan only matching directories (pruning shows as
    PartitionFilters in .explain)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
