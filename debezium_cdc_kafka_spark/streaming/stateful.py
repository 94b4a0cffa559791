"""Custom stateful streaming operators via applyInPandasWithState.

The reference's only state is the Kafka consumer offset; these operators
are the north-star streaming extensions where Spark's built-in windows
aren't enough — arbitrary per-key state machines with timeouts.

`running_user_stats` keeps a per-user running (count, sum, max) across
micro-batches and emits an updated row per key per batch — the streaming
analogue of a grouped aggregation whose state must outlive any window.

Scale: state is per-key and O(1) per key (three numbers), partitioned by
the grouping key across executors with checkpointed state store backing —
the standard Structured Streaming stateful layout.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, max_value double"
STATE_SCHEMA = "n long, total double, mx double"


def _update_user_stats(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, mx = state.get
    else:
        n, total, mx = 0, 0.0, float("-inf")
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())  # pandas sum skips NaN
        batch_max = pdf["value"].max()
        if len(pdf) and pd.notna(batch_max):
            mx = max(mx, float(batch_max))
    state.update((n, total, mx))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [round(total, 2)],
            # don't leak the -inf sentinel when no finite value has arrived
            "max_value": [None if mx == float("-inf") else mx],
        }
    )


def running_user_stats(events_stream: DataFrame) -> DataFrame:
    """Per-user running stats over an unbounded stream. Emits the updated
    aggregate for every key seen in each micro-batch (update semantics)."""
    return (
        events_stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_stats,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
