"""Structured Streaming semantics: real readStream queries (window,
session_window, watermark, dropDuplicates) must agree with the batch
expressions in operators/windows.py once the stream drains.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from debezium_cdc_kafka_spark.catalog import load_table
from debezium_cdc_kafka_spark.operators import windows as wops
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def event_stream_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("events_stream"))
    load_table(spark, SF_SMOKE, "events").repartition(4).write.mode("overwrite").parquet(d)
    return d


def _stream(spark, d):
    ev = load_table(spark, SF_SMOKE, "events")
    return (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", "1").parquet(d)
    )


def _run_complete(df, name):
    q = (
        df.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_streaming_tumbling_equals_batch(spark, event_stream_dir):
    agg = (
        _stream(spark, event_stream_dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    _run_complete(agg, "tumbling_out")
    got = {tuple(r) for r in spark.sql("SELECT * FROM tumbling_out").collect()}
    expected = {tuple(r) for r in wops.q_tumbling_window_1h(spark, SF_SMOKE).collect()}
    assert got == expected


def test_streaming_session_window_equals_batch(spark, event_stream_dir):
    """`session_window(ts, '30 minutes')` must merge events exactly like the
    batch lag/cumsum sessionization (same session count per user + sizes)."""
    agg = (
        _stream(spark, event_stream_dir)
        # stream files arrive in random order; a watermark wider than the
        # data span keeps every event eligible for session merging (late-
        # arrival dropping is covered by test_streaming_watermark_drops_late_rows)
        .withWatermark("ts", "60 days")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
            "n_events",
        )
    )
    _run_complete(agg, "session_out")
    got = {tuple(r) for r in spark.sql("SELECT * FROM session_out").collect()}
    expected = {
        (r.user_id, r.session_start, r.n_events)
        for r in wops.q_sessionize_30m(spark, SF_SMOKE).collect()
    }
    assert got == expected


def test_streaming_dedup_matches_batch_keys(spark, event_stream_dir):
    dedup = (
        _stream(spark, event_stream_dir)
        .select("user_id", "event_type")
        .dropDuplicates(["user_id", "event_type"])
    )
    q = (
        dedup.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r.user_id, r.event_type) for r in spark.sql("SELECT * FROM dedup_out").collect()}
    expected = {
        (r.user_id, r.event_type) for r in wops.q_stream_dedup_first(spark, SF_SMOKE).collect()
    }
    assert got == expected


def test_streaming_dedup_within_watermark_matches_batch_keys(spark, event_stream_dir):
    """`dropDuplicatesWithinWatermark` is the BOUNDED-STATE dedup: per-key
    state expires once the watermark passes it, which is the only form
    that survives an unbounded stream. With a watermark wider than the
    data span it must agree with the unbounded dropDuplicates / batch
    q_stream_dedup_first key set."""
    dedup = (
        _stream(spark, event_stream_dir)
        .select("user_id", "event_type", "ts")
        .withWatermark("ts", "60 days")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    q = (
        dedup.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_wm_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.event_type)
        for r in spark.sql("SELECT * FROM dedup_wm_out").collect()
    }
    expected = {
        (r.user_id, r.event_type)
        for r in wops.q_stream_dedup_first(spark, SF_SMOKE).collect()
    }
    assert got == expected


def test_streaming_watermark_drops_late_rows(spark, tmp_path):
    """Append-mode aggregation with a watermark must drop a row that arrives
    after its window's watermark expired — the semantics q_late_events_10m
    audits in batch."""
    import pandas as pd

    d = str(tmp_path / "late_stream")
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    # file 1: events advancing event-time to 02:00
    f1 = [(0, "2024-01-01 00:05:00", 1, "view", 1.0, "{}"),
          (1, "2024-01-01 02:00:00", 1, "view", 1.0, "{}")]
    # file 2: a late event at 00:10 — watermark (02:00 - 10min) left it behind
    f2 = [(2, "2024-01-01 00:10:00", 1, "view", 1.0, "{}")]
    def write(rows):
        pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"])
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        spark.createDataFrame(pdf, schema).coalesce(1).write.mode("append").parquet(d)

    write(f1)
    stream = spark.readStream.schema(schema).parquet(d)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_out")
        .start()
    )
    # drain f1 (watermark advances to 01:50), then deliver the late file
    q.processAllAvailable()
    write(f2)
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(60)
    rows = {(str(r.w.start), r.n) for r in spark.sql("SELECT * FROM late_out").collect()}
    # the 00:00 window closed with only event 0; the late event 2 was dropped
    assert ("2024-01-01 00:00:00", 1) in rows


def test_streaming_windowed_topk_equals_batch(spark, event_stream_dir):
    """q_windowed_topk_types' streaming form: the watermarked windowed
    histogram runs as a real stream, the per-window rank is applied at
    emit time over the drained aggregate — result must equal the batch
    operator exactly."""
    agg = (
        _stream(spark, event_stream_dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    _run_complete(agg, "topk_hist")
    from pyspark.sql.window import Window as W

    drained = spark.table("topk_hist")
    rk = F.row_number().over(
        W.partitionBy("w").orderBy(F.col("n").desc(), "event_type")
    )
    got = (
        drained.withColumn("rk", rk)
        .filter(F.col("rk") <= 3)
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            F.col("rk").cast("int").alias("rk"),
        )
    )
    want = wops.q_windowed_topk_types(spark, SF_SMOKE)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
