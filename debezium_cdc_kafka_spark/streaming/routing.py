"""Multi-table CDC routing: one change stream, N replicated tables.

The reference CAPTURES a whole schema (`schema.include.list: "inventory"`,
reference: register-postgres.json:12) — Debezium emits one topic per table
(`{topic.prefix}.{schema}.{table}`, register-postgres.json:11) — but its
consumer subscribes to a single hard-coded topic and its apply path
hard-codes the `customers` DDL/DML (app/consumer/consumer.py:92,
app/utils/postgres.py:100–107, 136, 174–177). This module completes that
design: subscribe once with a topic *pattern*, split each micro-batch by
the table encoded in the topic name, and merge every table into its own
versioned snapshot target — the per-table envelope/state schemas are
configuration, not code.

Scale shape: the batch is read once; each route is a filter + the standard
decode→reduce→merge plan, all narrow until the per-table key shuffle. The
routing column derives from `topic` (already in every Kafka record), so
fan-out adds no extra scan of the stream. Unroutable topics (a table added
to the capture list before a route is configured) are quarantined with
provenance rather than dropped — same policy as the malformed dead-letter
sink (consumer.py:78–79 only logs; we keep the data).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.cdc import decode_envelope
from .cdc_stream import STATE_SCHEMA, ParquetSnapshotTarget, merge_batch


def table_name(topic: Column) -> Column:
    """`{prefix}.{schema}.{table}` → `table` (Debezium's topic contract,
    reference: register-postgres.json:11–12)."""
    return F.substring_index(topic, ".", -1)


@dataclass
class TableRoute:
    """Per-table replication config: where the snapshot lives and what the
    envelope/state look like. Everything the reference hard-codes per
    table (postgres.py:100–107, 136–145) as data."""

    target_path: str
    envelope_schema: T.StructType | None = None
    state_schema: T.StructType = field(default_factory=lambda: STATE_SCHEMA)
    after_cols: tuple[str, ...] = ("value", "ts")

    def target(self) -> ParquetSnapshotTarget:
        return ParquetSnapshotTarget(self.target_path, schema=self.state_schema)


def route_batch(
    batch_df: DataFrame,
    epoch_id: int,
    routes: dict[str, TableRoute],
    unknown_table_path: str | None = None,
) -> None:
    """Apply one micro-batch of raw Kafka records to every routed table."""
    tagged = batch_df.withColumn("_table", table_name(F.col("topic")))
    if unknown_table_path is not None:
        (
            tagged.filter(~F.col("_table").isin(*routes))
            .withColumn("epoch", F.lit(epoch_id))
            .drop("_table")
            .write.mode("append")
            .parquet(unknown_table_path)
        )
    for tbl, route in routes.items():
        sub = tagged.filter(F.col("_table") == tbl).drop("_table")
        decoded = decode_envelope(sub, schema=route.envelope_schema)
        merge_batch(route.target(), decoded, epoch_id, route.after_cols)


def run_routed_stream(
    spark: SparkSession,
    raw_stream: DataFrame,
    routes: dict[str, TableRoute],
    checkpoint_path: str,
    available_now: bool = True,
    unknown_table_path: str | None = None,
):
    """One subscription, N tables: the streaming twin of `route_batch`.

    With a real broker the source is
    ``readStream.format("kafka").option("subscribePattern",
    "dbserver1\\.inventory\\..*")`` (sources/kafka.py); tests feed the
    same record shape from files. Checkpointing is shared — one stream,
    one offset log — so all tables advance atomically, mirroring the
    reference's single consumer group (consumer.py:30)."""

    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        route_batch(batch_df, epoch_id, routes, unknown_table_path)

    writer = raw_stream.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="1 second")
    return writer.start()
