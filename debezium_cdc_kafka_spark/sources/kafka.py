"""Kafka source builder — the reference consumer's config, Spark-shaped.

Maps the confluent-kafka Consumer configuration (reference:
app/consumer/consumer.py:28–49) onto `spark.readStream.format("kafka")`
options:

- subscribe + ``auto.offset.reset: earliest``  → ``subscribe`` +
  ``startingOffsets=earliest``                       (S1)
- manual ``assign([TopicPartition(t, p, off)])``    → per-partition JSON
  ``startingOffsets={"t": {"0": off, ...}}``         (S2, replay-from-offset)
- ``enable.auto.commit: False`` + commit-after-apply → checkpointLocation
  (offsets commit only after the foreachBatch apply) (S4)

No broker ships in this environment, so `kafka_change_stream` only builds
the reader; tests cover the option mapping, and
`streaming.cdc_stream.file_change_stream` stands in as the transport.
The decoded output schema is identical either way.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_options(
    bootstrap_servers: str,
    topic: str,
    starting_offset: int | None = None,
    num_partitions: int = 1,
) -> dict[str, str]:
    """Reference conf → Spark Kafka source options."""
    if starting_offset is None:
        starting = "earliest"
    else:
        # consumer.py:41–46 assigns EVERY partition at the same fixed offset
        starting = json.dumps({topic: {str(p): starting_offset for p in range(num_partitions)}})
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting,
        # at-least-once: no source-side commit; checkpoint is the commit
        "failOnDataLoss": "false",
    }


def kafka_change_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offset: int | None = None,
    num_partitions: int = 1,
) -> DataFrame:
    """readStream over Kafka, normalized to the engine's Kafka-record shape
    (key/value as strings + topic/partition/offset/timestamp)."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_options(bootstrap_servers, topic, starting_offset, num_partitions).items():
        reader = reader.option(k, v)
    df = reader.load()
    return df.select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        "topic",
        "partition",
        "offset",
        "timestamp",
    )
