"""Lakehouse CDC targets: offset-guarded MERGE INTO behind a feature flag.

The reference's target is genuinely mutable (Postgres UPDATE/DELETE,
reference app/utils/postgres.py:152–224). This engine's default stand-in
is `ParquetSnapshotTarget` (streaming/cdc_stream.py) — correct and
time-traveling, but copy-on-write per epoch. On a cluster with Delta Lake
the idiomatic target is a real ``MERGE INTO``; `DeltaMergeTarget` maps the
SAME merge contract onto it:

    MERGE INTO target t USING <one-row-per-key batch upserts> s
      ON t.id = s.id
    WHEN MATCHED AND s._offset > t._offset THEN UPDATE SET *
    WHEN NOT MATCHED THEN INSERT *

Two properties carry over exactly from operators.cdc.merge_states:

- **Offset guard** ⇒ idempotent + commutative: a replayed micro-batch
  (crash between apply and checkpoint commit — the reference's
  duplicate-insert anomaly, consumer.py:73–77) re-merges as a no-op, and
  out-of-order batches reach the same fixpoint.
- **Tombstones are retained as rows** (``_deleted=true``), never MERGE
  DELETEd: a stale lower-offset event can then never resurrect a deleted
  key. `state_view` filters them for readers; compaction may drop
  tombstones older than the source's max-redelivery horizon.

The semantic equivalence MERGE-with-guard ≡ merge_states is pinned by
tests/test_lakehouse.py with a driver-side MERGE simulator, so the
contract is verified even in environments (like this one) without the
delta-spark package; the package-present path then only re-checks wiring.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..operators.cdc import AFTER_COLS, materialize, state_view

#: feature flag consulted by make_cdc_target when fmt isn't passed
CDC_TARGET_ENV = "SPARK_GRAFT_CDC_TARGET"

MERGE_ON = "t.id = s.id"
MERGE_MATCHED_GUARD = "s._offset > t._offset"


def delta_available(spark: SparkSession) -> bool:
    """True when the delta-spark bindings AND the SQL extension are live."""
    try:
        from delta.tables import DeltaTable  # noqa: F401
    except ImportError:
        return False
    return "io.delta.sql.DeltaSparkSessionExtension" in (
        spark.conf.get("spark.sql.extensions", "") or ""
    )


class DeltaMergeTarget:
    """Mutable CDC table on Delta Lake via offset-guarded MERGE INTO.

    Same duck-typed surface as ParquetSnapshotTarget's epoch path:
    ``merge_epoch(changes, epoch_id)`` + ``read``/``read_view``. The
    epoch_id is unused for correctness (the offset guard alone makes
    replays no-ops) and is logged only for lineage parity.
    """

    def __init__(self, spark: SparkSession, path: str,
                 after_cols: tuple[str, ...] = AFTER_COLS):
        if not delta_available(spark):
            raise RuntimeError(
                "DeltaMergeTarget needs the delta-spark package and "
                "spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension; "
                f"unset {CDC_TARGET_ENV} (or set it to 'parquet') to use "
                "ParquetSnapshotTarget instead"
            )
        self.spark = spark
        self.path = path
        self.after_cols = after_cols

    def _table(self):
        from delta.tables import DeltaTable

        return DeltaTable.forPath(self.spark, self.path)

    def merge_epoch(
        self,
        changes: DataFrame,
        epoch_id: int,
        after_cols: tuple[str, ...] | None = None,
    ) -> None:
        upserts = materialize(changes, after_cols or self.after_cols)
        from delta.tables import DeltaTable

        if not DeltaTable.isDeltaTable(self.spark, self.path):
            # first epoch bootstraps the table; tombstones kept as rows
            upserts.write.format("delta").mode("overwrite").save(self.path)
            return
        (
            self._table().alias("t")
            .merge(upserts.alias("s"), MERGE_ON)
            .whenMatchedUpdateAll(condition=MERGE_MATCHED_GUARD)
            .whenNotMatchedInsertAll()
            .execute()
        )

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.format("delta").load(self.path)

    def read_view(self, spark: SparkSession) -> DataFrame:
        return state_view(self.read(spark))


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg SQL extensions are live in this session."""
    return "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions" in (
        spark.conf.get("spark.sql.extensions", "") or ""
    )


class IcebergMergeTarget:
    """Same offset-guarded merge contract on an Iceberg catalog TABLE
    (Iceberg's Spark integration is SQL-first, so the target is a table
    identifier, not a path). The MERGE statement is textually the clause
    set the simulator in tests/test_lakehouse.py pins — only the engine
    executing it differs from DeltaMergeTarget."""

    def __init__(self, spark: SparkSession, table: str,
                 after_cols: tuple[str, ...] = AFTER_COLS):
        if not iceberg_available(spark):
            raise RuntimeError(
                "IcebergMergeTarget needs the iceberg-spark-runtime jar and "
                "spark.sql.extensions=…IcebergSparkSessionExtensions; unset "
                f"{CDC_TARGET_ENV} (or set it to 'parquet') to use "
                "ParquetSnapshotTarget instead"
            )
        self.spark = spark
        self.table = table
        self.after_cols = after_cols

    def merge_epoch(
        self,
        changes: DataFrame,
        epoch_id: int,
        after_cols: tuple[str, ...] | None = None,
    ) -> None:
        upserts = materialize(changes, after_cols or self.after_cols)
        if not self.spark.catalog.tableExists(self.table):
            upserts.writeTo(self.table).using("iceberg").create()
            return
        view = f"_cdc_upserts_{epoch_id}"
        upserts.createOrReplaceTempView(view)
        self.spark.sql(
            f"MERGE INTO {self.table} t USING {view} s ON {MERGE_ON} "
            f"WHEN MATCHED AND {MERGE_MATCHED_GUARD} THEN UPDATE SET * "
            f"WHEN NOT MATCHED THEN INSERT *"
        )
        self.spark.catalog.dropTempView(view)

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.table(self.table)

    def read_view(self, spark: SparkSession) -> DataFrame:
        return state_view(self.read(spark))


def make_cdc_target(spark: SparkSession, path: str, fmt: str | None = None,
                    after_cols: tuple[str, ...] = AFTER_COLS, **kwargs):
    """Build the CDC apply target: 'parquet' (default), 'delta', or
    'iceberg' (feature flag — explicit ``fmt`` or $SPARK_GRAFT_CDC_TARGET;
    for iceberg, ``path`` is a catalog table identifier)."""
    from .cdc_stream import ParquetSnapshotTarget

    fmt = (fmt or os.environ.get(CDC_TARGET_ENV) or "parquet").lower()
    if fmt == "delta":
        return DeltaMergeTarget(spark, path, after_cols)
    if fmt == "iceberg":
        return IcebergMergeTarget(spark, path, after_cols)
    if fmt == "parquet":
        return ParquetSnapshotTarget(path, **kwargs)
    raise ValueError(f"unknown CDC target format {fmt!r} (parquet|delta|iceberg)")
