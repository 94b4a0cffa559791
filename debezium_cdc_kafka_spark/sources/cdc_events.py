"""Deterministic Debezium-shaped change stream derived from the `events` table.

The reference consumes Kafka messages whose value is a Debezium JSON
envelope ``{"payload": {"op", "before", "after", ...}}`` (reference:
app/consumer/consumer.py:65–71, app/utils/postgres.py:250–259) plus
null-value tombstones after deletes (consumer.py:66–68). The driver's test
data has no Kafka broker, so this module synthesizes an equivalent
Kafka-record DataFrame from `events` — fully distributed (no collect), and
deterministic so a DuckDB oracle can reproduce the mapping:

- op:  event_type 'signup' → 'c' (insert), 'error' → 'd' (delete),
       anything else → 'u' (update); keyed by user_id.
- replay order: event_id (unique, monotone with generation order);
  Kafka offset = 2*event_id, tombstones at 2*event_id+1 so each delete's
  tombstone immediately follows it, mirroring Debezium.
- malformed messages: events with event_id % 97 == 13 get a corrupt JSON
  body — the consumer must skip them (consumer.py:78–79 behavior).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table

TOPIC = "dbserver1.inventory.customers"

# The fraction-of-second format is 6-digit microseconds in both Spark
# (SSSSSS) and DuckDB (%f), so envelope timestamps round-trip identically.
TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"

MALFORMED_MOD = 97
MALFORMED_REM = 13

# Debezium envelope: only the fields the reference actually reads
# (postgres.py:251–259) plus ts_ms, which it carries but ignores.
ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField(
            "payload",
            T.StructType(
                [
                    T.StructField("op", T.StringType()),
                    T.StructField(
                        "before",
                        T.StructType([T.StructField("id", T.LongType())]),
                    ),
                    T.StructField(
                        "after",
                        T.StructType(
                            [
                                T.StructField("id", T.LongType()),
                                T.StructField("value", T.DoubleType()),
                                T.StructField("ts", T.StringType()),
                            ]
                        ),
                    ),
                    T.StructField("ts_ms", T.LongType()),
                ]
            ),
        )
    ]
)


def op_expr():
    """event_type → Debezium op code (the generator's op chooser inverted)."""
    return (
        F.when(F.col("event_type") == "signup", "c")
        .when(F.col("event_type") == "error", "d")
        .otherwise("u")
    )


def derive_change_events(
    spark: SparkSession, sf_dir: str, key_col: str = "user_id"
) -> DataFrame:
    """events table → Kafka-record-shaped DataFrame:
    (key string, value string|null, topic, partition int, offset long,
    timestamp) — the exact input contract of `operators.cdc.decode_envelope`.

    ``key_col`` is the replicated table's primary key. The default
    (user_id, ~1.2k distinct at sf0.1) models the reference's
    update-heavy customers table; ``key_col="event_id"`` models the
    autoincrement-PK INSERT-heavy table (every event a new key, keys
    monotone with offset) — the workload bench_stream.py uses to measure
    the range-bucketed target. Oracles and tests all use the default.
    """
    ev = load_table(spark, sf_dir, "events")
    op = op_expr()
    after = F.when(
        op.isin("c", "u"),
        F.struct(
            F.col(key_col).alias("id"),
            F.col("value").alias("value"),
            F.date_format("ts", TS_FMT).alias("ts"),
        ),
    )
    before = F.when(op == "d", F.struct(F.col(key_col).alias("id")))
    envelope = F.to_json(
        F.struct(
            F.struct(
                op.alias("op"),
                before.alias("before"),
                after.alias("after"),
                F.unix_millis(F.col("ts")).alias("ts_ms"),
            ).alias("payload")
        )
    )
    malformed = (F.col("event_id") % MALFORMED_MOD) == MALFORMED_REM
    body = F.when(malformed, F.lit('{"payload": <corrupt>')).otherwise(envelope)
    # One record per event, plus a trailing tombstone for deletes, emitted
    # from a SINGLE scan: building the (≤2)-element record array and
    # exploding beats the union-of-two-branches formulation, which scans the
    # parquet (and pays the to_json) twice. At 100 TB that halves source I/O.
    record = lambda value, off: F.struct(  # noqa: E731
        value.alias("value"), off.alias("offset")
    )
    records = F.when(
        op == "d",
        F.array(
            record(body, F.col("event_id") * 2),
            record(F.lit(None).cast("string"), F.col("event_id") * 2 + 1),
        ),
    ).otherwise(F.array(record(body, F.col("event_id") * 2)))
    return ev.select(
        F.col(key_col).cast("string").alias("key"),
        F.explode(records).alias("_rec"),
        F.lit(TOPIC).alias("topic"),
        F.lit(0).alias("partition"),
        F.col("ts").alias("timestamp"),
    ).select(
        "key",
        F.col("_rec.value").alias("value"),
        "topic",
        "partition",
        F.col("_rec.offset").alias("offset"),
        "timestamp",
    )


def widened_envelope_schema(*extra_after: T.StructField) -> T.StructType:
    """ENVELOPE_SCHEMA with extra columns appended to the `after` struct —
    the schema-evolution path. Debezium adds source columns to new
    messages as they appear; `from_json` under the widened schema reads
    BOTH generations: old envelopes simply yield null for the new fields
    (PERMISSIVE missing-field semantics), so one decode plan serves the
    whole topic history without reprocessing. The reference would need
    its hard-coded DDL and column lists edited by hand
    (app/utils/postgres.py:100–107, 136, 174–177)."""
    payload = ENVELOPE_SCHEMA["payload"].dataType
    after = payload["after"].dataType
    new_after = T.StructType(list(after.fields) + list(extra_after))
    new_payload = T.StructType(
        [
            f if f.name != "after" else T.StructField("after", new_after)
            for f in payload.fields
        ]
    )
    return T.StructType([T.StructField("payload", new_payload)])
