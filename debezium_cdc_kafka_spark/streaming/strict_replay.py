"""Strict-replay CDC as a STREAMING stateful operator.

`operators.cdc.cdc_strict_replay_state` computes the reference-faithful
final multiset (duplicate inserts, no-op updates/deletes on missing keys —
postgres.py:100–107 has no PK) in batch window algebra. This module keeps
the same semantics incrementally over an unbounded stream with
`applyInPandasWithState`:

- state per key = the key's event log (offset, op, value) accumulated so
  far. Replays are order-insensitive: the log is sorted at emission, so
  late or out-of-order micro-batches cannot corrupt the multiset —
  matching the batch monoid's guarantees.
- each batch emits the key's current multiset rows tagged with a
  monotonically increasing `version`; readers take max-version per key.

Scale note: keeping the raw log per key is the demonstrable-correct form;
production compaction stores only (inserts since last delete, last
update, last delete offset) — O(live rows) instead of O(events) — the
emission algebra below is written so that swap is mechanical.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "id long, value double, n_rows long, version long"
STATE_SCHEMA = "offsets array<long>, ops array<string>, vals array<double>, version long"


def _strict_multiset(events: list[tuple[int, str, float]]) -> dict[float, int]:
    """Serial strict replay of one key's (sorted) log → {value: row_count}.
    Mirrors operators.cdc.CDC_STRICT_ORACLE."""
    last_delete = -1
    inserts: list[tuple[int, float]] = []
    last_update: tuple[int, float] | None = None
    for off, op, val in events:
        if op == "d":
            last_delete = off
        elif op in ("c", "r"):
            inserts.append((off, val))
        elif op == "u":
            last_update = (off, val)
    out: dict[float, int] = {}
    for off, val in inserts:
        if off <= last_delete:
            continue
        eff = last_update[1] if last_update and last_update[0] > off else val
        out[eff] = out.get(eff, 0) + 1
    return out


def _update(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    (kid,) = key
    if state.exists:
        offsets, ops, vals, version = state.get
        offsets, ops, vals = list(offsets), list(ops), list(vals)
    else:
        offsets, ops, vals, version = [], [], [], 0
    for pdf in pdfs:
        offsets.extend(int(x) for x in pdf["offset"])
        ops.extend(pdf["op"])
        vals.extend(float(x) if pd.notna(x) else float("nan") for x in pdf["value"])
    version += 1
    state.update((offsets, ops, vals, version))
    log = sorted(zip(offsets, ops, vals))
    multiset = _strict_multiset(log)
    if multiset:
        yield pd.DataFrame(
            {
                "id": [kid] * len(multiset),
                "value": list(multiset.keys()),
                "n_rows": list(multiset.values()),
                "version": [version] * len(multiset),
            }
        )
    else:
        # emit an explicit empty marker so downstream max-version readers
        # see deletions (a key whose multiset became empty)
        yield pd.DataFrame(
            {"id": [kid], "value": [None], "n_rows": [0], "version": [version]}
        )


def strict_replay_stream(decoded: DataFrame) -> DataFrame:
    """decoded change stream (id, op, offset, after.value) → per-key strict
    multiset emissions."""
    flat = decoded.select(
        "id", "op", "offset", F.col("after.value").alias("value")
    )
    return flat.groupBy("id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def latest_multiset(emissions: DataFrame) -> DataFrame:
    """Memory-sink emissions → current multiset (max version per key)."""
    from pyspark.sql.window import Window as W

    w = W.partitionBy("id")
    return (
        emissions.withColumn("_maxv", F.max("version").over(w))
        .filter(F.col("version") == F.col("_maxv"))
        .filter(F.col("n_rows") > 0)
        .select("id", "value", "n_rows")
    )
