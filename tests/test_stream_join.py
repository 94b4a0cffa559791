"""Stream-stream interval join: two readStreams over the same event log,
watermarked on both sides, joined on (user, 1-hour window) must produce
exactly the rows the batch interval join q_view_purchase_interval_join
produces once the stream drains. This is the streaming feature the other
streaming tests don't touch: symmetric join state with watermark-driven
eviction on BOTH inputs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from debezium_cdc_kafka_spark.catalog import load_table
from debezium_cdc_kafka_spark.operators.behavior import q_view_purchase_interval_join
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def event_log_dir(spark, tmp_path_factory):
    """Four parquet files covering DISJOINT, INCREASING time ranges,
    written oldest-first so the file stream replays events in event-time
    order. That matters: with per-file triggers the watermark from file N
    would drop file N+1's rows as late if files were time-interleaved —
    exactly the behavior a production feed (time-partitioned log dirs)
    avoids the same way."""
    import time

    d = str(tmp_path_factory.mktemp("events_join_stream"))
    ev = load_table(spark, SF_SMOKE, "events")
    quartiles = ev.select(
        F.percentile_approx("ts", [0.25, 0.5, 0.75], 10000).alias("q")
    ).collect()[0].q
    bounds = [None, *quartiles, None]
    for i in range(4):
        sl = ev
        if bounds[i] is not None:
            sl = sl.filter(F.col("ts") > F.lit(bounds[i]))
        if bounds[i + 1] is not None:
            sl = sl.filter(F.col("ts") <= F.lit(bounds[i + 1]))
        sl.coalesce(1).write.mode("append").parquet(d)
        time.sleep(1.1)  # distinct mtimes → deterministic replay order
    return d


def test_stream_stream_interval_join_equals_batch(spark, event_log_dir):
    ev_schema = load_table(spark, SF_SMOKE, "events").schema

    def stream():
        return (
            spark.readStream.schema(ev_schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(event_log_dir)
        )

    views = (
        stream()
        .filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("vts"),
        )
        .withWatermark("vts", "2 hours")
    )
    purchases = (
        stream()
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("pts"),
        )
        .withWatermark("pts", "2 hours")
    )
    joined = views.join(
        purchases,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("pts") > F.col("vts"))
        & (F.col("pts") <= F.col("vts") + F.expr("INTERVAL 1 HOUR")),
    ).select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "purchase_id",
        (F.unix_micros("pts") - F.unix_micros("vts")).alias("micros_between"),
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ss_join_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {tuple(r) for r in spark.sql("SELECT * FROM ss_join_out").collect()}
    expected = {
        tuple(r) for r in q_view_purchase_interval_join(spark, SF_SMOKE).collect()
    }
    assert got == expected
    assert len(expected) > 0
