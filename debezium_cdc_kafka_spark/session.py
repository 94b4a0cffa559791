"""SparkSession factory tuned for this engine.

Local mode is a stand-in for a real cluster: the configs below are the ones
that keep the same physical plans valid at 100 TB (AQE on, sensible shuffle
partitioning, broadcast threshold, UTC timestamps for oracle parity).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "debezium_cdc_kafka_spark",
    cpus: str | None = None,
    ui: bool = False,
) -> SparkSession:
    """Build (or fetch) the session.

    Notes for cluster scale:
    - ``spark.sql.shuffle.partitions`` is set to the local core count here;
      on a real cluster leave AQE's coalescing to right-size post-shuffle
      partitions (``spark.sql.adaptive.coalescePartitions.enabled``).
    - AQE skew-join handling is enabled so hot keys in big joins split.
    - Arrow is enabled for the Pandas-UDF paths (similarity/multimodal).
    - Session timezone pinned to UTC so timestamps hash identically against
      the DuckDB oracle (DuckDB timestamps are UTC-naive).
    """
    n = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # UI off by default (test/bench noise); tools that read runtime
        # stage metrics (tools/gen_plans_report.py) opt in via ui=True
        .config("spark.ui.enabled", "true" if ui else "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
