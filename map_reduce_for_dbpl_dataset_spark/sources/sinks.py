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

from pyspark.sql import DataFrame, SparkSession


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


def write_partitioned_parquet(df: DataFrame, path: str, *partition_cols: str) -> None:
    """Directory-per-key parquet layout; readers filtering on the
    partition columns scan only matching directories (pruning shows as
    PartitionFilters in .explain)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
