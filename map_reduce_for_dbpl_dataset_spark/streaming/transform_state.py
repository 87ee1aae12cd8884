"""transformWithStateInPandas (Spark >= 4.0) — the successor API to
applyInPandasWithState (streaming/stateful.py): named state variables
behind a StatefulProcessor handle instead of one opaque state tuple,
plus timers and TTL. Both forms are kept: stateful.py shows the 3.x
surface, this module the 4.x one, over the same events fixture.

The processor keeps per-event-type running (count, max value). Count
and max are order- and batch-split-insensitive, so the drained stream
equals the batch aggregate exactly (float SUMS are deliberately
avoided — accumulation order would diverge from the oracle).

Scale notes: state is keyed by event_type in the executor state store;
transformWithStateInPandas REQUIRES the RocksDB state store provider
(set before the query starts), which is also the right provider at
100 TB — state spills off-heap instead of living on the JVM heap.
TTL (handle.getValueState(..., ttlDurationMs=...)) is the eviction
story for unbounded key universes; unset here over a finite fixture.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame

OUTPUT_SCHEMA = "event_type string, n_events long, max_value double"

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def transform_with_state_available() -> bool:
    """transformWithStateInPandas talks to the JVM state server over a
    protobuf protocol; environments without the `protobuf` wheel (this
    container has none, and installs are off-limits) crash the driver
    worker at state-schema validation. Gate registration on the import
    so the query self-activates where the dependency exists."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


class RunningTypeStats:
    """StatefulProcessor subclass built lazily (the base class import
    lives inside pyspark.sql.streaming; subclassing at module import
    would make this module unimportable on stripped workers)."""

    def __new__(cls):
        from pyspark.sql.streaming.stateful_processor import StatefulProcessor

        class _Proc(StatefulProcessor):
            def init(self, handle) -> None:
                self._stats = handle.getValueState("stats", "n long, mx double")

            def handleInputRows(self, key, rows, timerValues):
                if self._stats.exists():
                    n, mx = self._stats.get()
                else:
                    n, mx = 0, None
                for pdf in rows:
                    n += len(pdf)
                    m = float(pdf["value"].max())
                    mx = m if mx is None else max(mx, m)
                self._stats.update((n, mx))
                yield pd.DataFrame(
                    {"event_type": [key[0]], "n_events": [n], "max_value": [mx]}
                )

            def close(self) -> None:
                pass

        return _Proc()


def running_type_stats(events: DataFrame) -> DataFrame:
    """Per-event-type running (count, max value) via
    transformWithStateInPandas in update mode."""
    from ..session import ship_package

    spark = events.sparkSession
    ship_package(spark)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    return (
        events.select("event_type", "value")
        .groupBy("event_type")
        .transformWithStateInPandas(
            statefulProcessor=RunningTypeStats(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
