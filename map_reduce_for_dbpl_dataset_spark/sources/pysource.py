"""Custom Python DataSource (Spark >= 4.0 `pyspark.sql.datasource`).

The reference's only source is a hand-threaded XML DOM loader
(dblpXMLparser.scala:24,37-59: one in-memory DOM, 800 slices, 8
threads). This is the Spark-native generalization of that pattern:
a *partitioned* source where each `InputPartition` is an independent
shard read on an executor — the planner sees N splits exactly like a
file scan, so a 100 TB external feed (an API, a proprietary format,
a sharded KV store) parallelizes across the cluster with no driver
bottleneck and no single-JVM DOM.

The synthetic generator here is deterministic (id range sharded by
ceil-division, payload `doc-<id>`, portable md5-based 60-bit hash) so
a DuckDB `range()` oracle reproduces it bit-for-bit — the point under
test is the source plumbing: schema declaration, partition planning,
per-partition iteration.

Workers must be able to import this module: call
`session.ship_package(spark)` before triggering a read (the classes
are pickled by reference, not by value).
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

FORMAT_NAME = "synthetic_docs"


def _hash60(s: str) -> int:
    # portable md5-based 60-bit hash: identical to functions.text.hash60
    # (Spark) and ('0x' || substr(md5(s), 1, 15))::BIGINT (DuckDB).
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


class SyntheticDocsDataSource(DataSource):
    """format("synthetic_docs").option("n_rows", N).option("n_parts", P)"""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        return "id bigint, shard int, payload string, h bigint"

    def reader(self, schema) -> "SyntheticDocsReader":
        return SyntheticDocsReader(
            int(self.options.get("n_rows", 100)), int(self.options.get("n_parts", 4))
        )


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, n_rows: int, n_parts: int) -> None:
        self.n_rows = n_rows
        self.n_parts = n_parts
        self.rpp = -(-n_rows // n_parts)  # ceil
        self.lo_bound = 0  # inclusive id lower bound after pushdown
        self.hi_bound = n_rows  # exclusive id upper bound after pushdown

    def pushFilters(self, filters):
        """Filter pushdown (Spark >= 4.1): absorb id-range predicates
        into the scan bounds and PRUNE whole partitions in
        partitions() — the Python-source equivalent of parquet
        row-group/partition pruning. Unsupported filters are returned
        to Spark, which re-applies them above the scan (so
        correctness never depends on this method)."""
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        for f in filters:
            col = getattr(f, "attribute", None)
            if col == ("id",):
                if isinstance(f, GreaterThan):
                    self.lo_bound = max(self.lo_bound, f.value + 1)
                    continue
                if isinstance(f, GreaterThanOrEqual):
                    self.lo_bound = max(self.lo_bound, f.value)
                    continue
                if isinstance(f, LessThan):
                    self.hi_bound = min(self.hi_bound, f.value)
                    continue
                if isinstance(f, LessThanOrEqual):
                    self.hi_bound = min(self.hi_bound, f.value + 1)
                    continue
                if isinstance(f, EqualTo):
                    self.lo_bound = max(self.lo_bound, f.value)
                    self.hi_bound = min(self.hi_bound, f.value + 1)
                    continue
            yield f

    def partitions(self) -> list[InputPartition]:
        # one InputPartition per shard: the scheduler runs these as
        # independent tasks, exactly like file splits. Shards entirely
        # outside the pushed id range are never planned.
        return [
            InputPartition(i)
            for i in range(self.n_parts)
            if i * self.rpp < self.hi_bound and (i + 1) * self.rpp > self.lo_bound
        ]

    def read(self, partition: InputPartition):
        shard = partition.value
        lo = max(shard * self.rpp, self.lo_bound)
        hi = min(self.n_rows, (shard + 1) * self.rpp, self.hi_bound)
        for i in range(lo, hi):
            payload = f"doc-{i}"
            yield (i, shard, payload, _hash60(payload))


def register(spark) -> None:
    # a reader implementing pushFilters refuses to plan unless the
    # Python-source pushdown conf is on (runtime-settable)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticDocsDataSource)
