"""Streaming CDC pipeline: the reference's consumer loop, Spark-shaped.

Reference loop (app/consumer/consumer.py:55–75): poll one message → decode
→ apply one SQL statement → commit the offset. Here the same contract is:

  readStream → decode_envelope → foreachBatch(merge into snapshot target)
  → checkpoint

- The offset-commit-after-apply contract (consumer.py:74–77,
  at-least-once) maps to Structured Streaming's checkpoint: a batch's
  offsets are committed only after `foreachBatch` returns. A replayed
  batch (crash between apply and checkpoint) re-merges idempotently, so
  delivery is effectively-once — the documented improvement over the
  reference's duplicate-insert anomaly.
- The target is a versioned Parquet snapshot store (`ParquetSnapshotTarget`)
  because plain Parquet has no MERGE. Each epoch commits a new version
  directory; a retried epoch overwrites its own version and reads the
  last version *before* it, making the merge deterministic under retries.
  On a cluster with Delta/Iceberg, swap `apply_changes` + snapshot commit
  for `MERGE INTO` — the decode/reduce plan is unchanged.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.cdc import apply_changes, decode_envelope, state_view

# Stored snapshot = CDC state incl. merge bookkeeping (see operators.cdc:
# tombstones retained so out-of-order/retried batches merge correctly).
STATE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("ts", T.StringType()),
        T.StructField("_offset", T.LongType()),
        T.StructField("_deleted", T.BooleanType()),
    ]
)

_VERSION_RE = re.compile(r"^v=(\d+)$")


class ParquetSnapshotTarget:
    """Mutable keyed table over immutable Parquet: version-per-epoch commits.

    Layout: ``<path>/v=<epoch>/part-*.parquet``. Readers take the max
    version; a retried epoch N re-reads the max version < N, so replaying a
    micro-batch cannot double-apply (SURVEY §7 "what's hard" #1).

    Local-mode listing uses the filesystem; on a cluster the same layout
    works over any Hadoop FS (listing via the FileSystem API) or is
    replaced wholesale by a Delta/Iceberg table.
    """

    def __init__(self, path: str, schema: T.StructType = STATE_SCHEMA):
        self.path = path
        self.schema = schema
        os.makedirs(path, exist_ok=True)

    def versions(self) -> list[int]:
        out = []
        for name in os.listdir(self.path):
            m = _VERSION_RE.match(name)
            if m and os.path.exists(os.path.join(self.path, name, "_SUCCESS")):
                out.append(int(m.group(1)))
        return sorted(out)

    def read(self, spark: SparkSession, before_version: int | None = None) -> DataFrame:
        """Full stored state (incl. tombstones); use `read_view` for the
        user-facing table."""
        vs = [v for v in self.versions() if before_version is None or v < before_version]
        if not vs:
            return spark.createDataFrame([], self.schema)
        return spark.read.parquet(os.path.join(self.path, f"v={vs[-1]}"))

    def read_view(self, spark: SparkSession) -> DataFrame:
        return state_view(self.read(spark))

    def commit(self, df: DataFrame, version: int) -> None:
        df.write.mode("overwrite").parquet(os.path.join(self.path, f"v={version}"))

    def merge_epoch(
        self,
        changes: DataFrame,
        epoch_id: int,
        after_cols: tuple[str, ...] = ("value", "ts"),
    ) -> None:
        """Duck-typed apply contract shared with lakehouse.DeltaMergeTarget."""
        merge_batch(self, changes, epoch_id, after_cols)

    def compact(self, keep_last: int = 2) -> list[int]:
        """Drop all but the newest `keep_last` versions (old snapshots only
        serve epoch-retry reads, which never reach further back than the
        previous version). Returns the removed versions. The Delta/Iceberg
        analogue is VACUUM."""
        import shutil

        vs = self.versions()
        doomed = vs[:-keep_last] if keep_last > 0 else vs
        for v in doomed:
            shutil.rmtree(os.path.join(self.path, f"v={v}"), ignore_errors=True)
        return doomed


def merge_batch(
    target: ParquetSnapshotTarget,
    changes: DataFrame,
    epoch_id: int,
    after_cols: tuple[str, ...] = ("value", "ts"),
) -> None:
    """The foreachBatch body: snapshot-before-this-epoch + batch changes →
    snapshot at this epoch."""
    spark = changes.sparkSession
    current = target.read(spark, before_version=epoch_id)
    merged = apply_changes(current, changes, after_cols)
    target.commit(merged, epoch_id)


def run_cdc_stream(
    spark: SparkSession,
    raw_stream: DataFrame,
    target_path: str,
    checkpoint_path: str,
    available_now: bool = True,
    envelope_schema: T.StructType | None = None,
    after_cols: tuple[str, ...] = ("value", "ts"),
    state_schema: T.StructType = STATE_SCHEMA,
    dead_letter_path: str | None = None,
    target=None,
):
    """Wire a raw Kafka-shaped stream into the snapshot target.

    ``available_now=True`` drains everything then stops (hermetic tests,
    backfills); ``False`` runs continuously with a 1 s trigger, matching
    the reference's poll cadence (consumer.py:55). Envelope/state schemas
    parameterize the replicated domain (events-derived by default, the
    workload generator's customers table in pipeline.py). ``target`` may
    be any object with the ``merge_epoch(changes, epoch_id, after_cols)``
    contract (e.g. lakehouse.DeltaMergeTarget behind its feature flag);
    default is the ParquetSnapshotTarget at ``target_path``.
    """
    if target is None:
        target = ParquetSnapshotTarget(target_path, schema=state_schema)
    decoded = decode_envelope(raw_stream, schema=envelope_schema)

    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        if dead_letter_path is not None:
            # quarantine malformed envelopes with provenance (epoch +
            # offset) instead of silently dropping them — the reference
            # only logs these (consumer.py:78–79)
            (
                batch_df.filter(F.col("is_malformed"))
                .select("id", "offset", F.lit(epoch_id).alias("epoch"))
                .write.mode("append")
                .parquet(dead_letter_path)
            )
        target.merge_epoch(batch_df, epoch_id, after_cols)

    writer = decoded.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="1 second")
    return writer.start()


def file_change_stream(
    spark: SparkSession, envelope_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Kafka-record-shaped stream from Parquet files (hermetic stand-in for
    the broker; same schema as sources.kafka.kafka_change_stream output).

    `max_files_per_trigger` is the micro-batch sizing knob — the file-source
    analogue of Kafka's maxOffsetsPerTrigger. 1 maximizes per-epoch
    isolation (the replay/retry tests' shape); larger values amortize the
    per-batch fixed costs (plan, checkpoint commit, target version) over
    more rows — the trigger-knee sweep in bench_stream.py measures where
    that amortization stops paying."""
    schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("value", T.StringType()),
            T.StructField("topic", T.StringType()),
            T.StructField("partition", T.IntegerType()),
            T.StructField("offset", T.LongType()),
            T.StructField("timestamp", T.TimestampType()),
        ]
    )
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(envelope_dir)
    )
