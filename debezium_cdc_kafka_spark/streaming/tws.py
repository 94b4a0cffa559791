"""Custom stateful operator on the Spark 4 transformWithStateInPandas API.

`applyInPandasWithState` (streaming/stateful.py) is the Spark 3.x
arbitrary-state surface; Spark 4 replaced it with `StatefulProcessor` +
`transformWithStateInPandas`, which adds typed composite state (value /
list / map state handles), per-state TTL, and timers, all backed by the
RocksDB state store. This module carries the engine's per-key session
tracker to that API so both generations of the surface are covered.

The operator: a per-user EVENT COUNTER WITH HIGH-WATER MARK — counts
events, sums value, and tracks the max single reading, emitting the
updated row each micro-batch (the same contract as
`stateful.running_user_stats`, so one test proves the two APIs and the
batch aggregate all agree).

Scale notes: state is O(1) per key (three numbers in a ValueState),
hash-partitioned by user across executors; RocksDB keeps the working set
off-heap and checkpoint increments small. This is the layout that holds
at millions of keys.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from .._proto_compat import ensure_protobuf

# Import-time on purpose: Python workers unpickle RunningUserStatsProcessor
# by reference, importing this module BEFORE pyspark's lazy
# StateMessage_pb2 import — the one window where the protobuf shim can run
# on the worker side. Idempotent, no-op when a real protobuf is installed.
ensure_protobuf()

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("mx", DoubleType()),
    ]
)


class RunningUserStatsProcessor(StatefulProcessor):
    """ValueState-backed running (count, sum, max) per user."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("stats", _STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        prior = self._state.get() if self._state.exists() else None
        n, total, mx = prior if prior is not None else (0, 0.0, None)
        for pdf in rows:
            if not len(pdf):
                continue
            n += len(pdf)
            total += float(pdf["value"].sum())
            batch_max = pdf["value"].max()
            if pd.notna(batch_max):
                mx = float(batch_max) if mx is None else max(mx, float(batch_max))
        self._state.update((n, total, mx))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [round(total, 2)],
                "max_value": [mx],
            }
        )

    def close(self) -> None:
        pass


def running_user_stats_tws(events_stream: DataFrame) -> DataFrame:
    """Per-user running stats on the transformWithStateInPandas API.
    Requires the RocksDB state store provider (set by the caller/test via
    ``spark.sql.streaming.stateStore.providerClass``)."""
    return (
        events_stream.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            RunningUserStatsProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
