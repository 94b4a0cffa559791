"""Custom stateful sessionization with event-time timeouts.

Spark's built-in ``session_window`` covers gap sessions; this operator is
the applyInPandasWithState state machine for when sessions need custom
close rules (here: the 30-minute gap, but the shape extends to "close on
logout event", capped length, etc. — logic a declarative window can't
express). Sessions close two ways:

- **data-driven**: an event arrives for the key with gap > 30 min → the
  old session emits, a new one starts;
- **timer-driven**: the event-time watermark passes last_event + 30 min
  (``GroupStateTimeout.EventTimeTimeout``) → the session emits and state
  clears.

Both paths produce identical session boundaries to the batch
``q_sessionize_30m`` (lag + cumulative-sum construction) — proven in
tests/test_sessions_stream.py by draining a file-backed stream.

Scale: state is one 4-tuple per ACTIVE key (not per event); keys hash
across executors; timers bound state lifetime, so abandoned keys cannot
accumulate — the property that keeps an unbounded-key stream (100 TB of
events) at bounded state size.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GAP_US = 30 * 60 * 1_000_000

SESSION_OUTPUT = (
    "user_id long, session_start string, n_events long, "
    "duration_sec long, total_value double"
)
SESSION_STATE = "start_us long, last_us long, n long, total double"


def _emit(user_id: int, start_us: int, last_us: int, n: int, total: float) -> dict:
    start = pd.Timestamp(start_us, unit="us")
    return {
        "user_id": user_id,
        "session_start": start.strftime("%Y-%m-%d %H:%M:%S.%f"),
        "n_events": n,
        # HALF_UP like the batch query's round(): floor(x + 0.5) on a
        # non-negative duration
        "duration_sec": int(math.floor((last_us - start_us) / 1e6 + 0.5)),
        "total_value": round(total, 2),
    }


def _track_sessions(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    closed: list[dict] = []

    if state.hasTimedOut:
        start_us, last_us, n, total = state.get
        closed.append(_emit(user_id, start_us, last_us, n, total))
        state.remove()
    else:
        cur = list(state.get) if state.exists else None
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(["ts", "event_id"])
        for ts, value in zip(rows["ts"], rows["value"]):
            us = int(pd.Timestamp(ts).value // 1_000)  # ns → µs
            if cur is None:
                cur = [us, us, 0, 0.0]
            elif us - cur[1] > GAP_US:
                closed.append(_emit(user_id, *cur))
                cur = [us, us, 0, 0.0]
            cur[1] = us
            cur[2] += 1
            cur[3] += float(value)
        state.update(tuple(cur))
        # event-time timer: fire when the watermark passes last + gap (ms)
        state.setTimeoutTimestamp(cur[1] // 1_000 + GAP_US // 1_000)

    yield pd.DataFrame(closed, columns=[c.split()[0] for c in SESSION_OUTPUT.split(", ")])


def session_stream(events_stream: DataFrame) -> DataFrame:
    """events stream → closed-session stream (append semantics: a session
    row appears exactly once, when it closes)."""
    return (
        events_stream.withWatermark("ts", "0 seconds")
        .select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _track_sessions,
            outputStructType=SESSION_OUTPUT,
            stateStructType=SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
