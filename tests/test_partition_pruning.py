"""Partition-pruned reads: date-partitioned layout + pruning assertions.

At 100 TB the event log is written `partitionBy(event_date)`; a dashboard
query for one day must read ONE partition directory, not scan-and-filter
the lake. This test writes that layout and asserts the plan prunes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from debezium_cdc_kafka_spark.catalog import load_table
from debezium_cdc_kafka_spark.plans.inspect import formatted_plan
from tests.conftest import SF_SMOKE


def test_partitioned_write_prunes_reads(spark, tmp_path):
    d = str(tmp_path / "events_by_day")
    ev = load_table(spark, SF_SMOKE, "events").withColumn("event_date", F.to_date("ts"))
    ev.write.partitionBy("event_date").mode("overwrite").parquet(d)

    one_day = spark.read.parquet(d).filter(F.col("event_date") == "2024-01-05")
    plan = formatted_plan(one_day)
    assert "PartitionFilters" in plan
    # the partition predicate must appear in PartitionFilters (metadata-only
    # pruning), not merely as a post-scan data filter
    pf_line = next(line for line in plan.splitlines() if "PartitionFilters" in line)
    assert "event_date" in pf_line, pf_line

    expected = ev.filter(F.to_date("ts") == "2024-01-05").count()
    assert one_day.count() == expected > 0
