"""Custom stateful streaming operator (applyInPandasWithState).

Where the built-in windowed aggregations (streaming/windows.py) cover
the declarative event-time surface, this module is the escape hatch
the reference's hand-rolled reducer state maps (Homework2.scala:70-71,
180, 401, 478) would map to in a STREAMING setting: arbitrary per-key
state, updated batch-by-batch with Arrow-transferred pandas frames.

The demonstrator keeps per-user lifetime stats (event count, first/
last event time). State is a flat struct of int64s (timestamps as
epoch-nanos) — the state store serializes structs, keep them narrow.

Scale notes: state lives in the executor state store partitioned by
key (RocksDB-backed on a real cluster — configure
spark.sql.streaming.stateStore.providerClass); a key's entire history
never re-reads, each batch touches only keys present in that batch.
GroupStateTimeout would evict idle users at 100 TB/day key
cardinality; NoTimeout here because the fixture is finite.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, n_events long, first_ts timestamp_ntz, last_ts timestamp_ntz"
)
STATE_SCHEMA = "n long, first_ns long, last_ns long"


def _update_user_stats(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, first_ns, last_ns = state.get if state.exists else (0, None, None)
    for pdf in pdfs:
        n += len(pdf)
        ts_ns = pdf["ts"].astype("int64")
        lo, hi = int(ts_ns.min()), int(ts_ns.max())
        first_ns = lo if first_ns is None else min(first_ns, lo)
        last_ns = hi if last_ns is None else max(last_ns, hi)
    state.update((n, first_ns, last_ns))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "first_ts": [pd.Timestamp(first_ns)],
            "last_ts": [pd.Timestamp(last_ns)],
        }
    )


def stateful_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running (count, first_ts, last_ts) over a stream of
    events; emits the updated row for every user seen in each batch."""
    from ..session import ship_package

    ship_package(events.sparkSession)
    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_stats,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
