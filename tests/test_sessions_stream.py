"""Stateful session tracker (streaming/sessions.py) must reproduce the
batch sessionization boundaries exactly once the stream drains."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from debezium_cdc_kafka_spark.catalog import load_table
from debezium_cdc_kafka_spark.operators.windows import q_sessionize_30m
from debezium_cdc_kafka_spark.streaming.sessions import session_stream
from tests.conftest import SF_SMOKE


def test_stateful_session_tracker_matches_batch(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events")
    d = str(tmp_path / "stream")
    # batch 1: every real event in one file; batch 2 (later modTime): one
    # far-future sentinel per user, which data-closes every real session
    # (sentinel sessions stay open and are never emitted).
    ev.coalesce(1).write.parquet(d)
    time.sleep(2)
    sentinel = (
        ev.select("user_id")
        .distinct()
        .crossJoin(ev.agg(F.max("ts").alias("gmx")))
        .select(
            (F.col("user_id") + 10_000_000).alias("event_id"),
            (F.col("gmx") + F.expr("INTERVAL 10 DAYS")).alias("ts"),
            "user_id",
            F.lit("sentinel").alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit("{}").alias("props"),
        )
    )
    sentinel.select(*ev.columns).coalesce(1).write.mode("append").parquet(d)

    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", "1").parquet(d)
    )
    q = (
        session_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = spark.sql("select * from sessions_out").collect()
    want = q_sessionize_30m(spark, SF_SMOKE).collect()

    key = lambda r: (r.user_id, r.session_start, r.n_events, r.duration_sec)  # noqa: E731
    got_keys = {key(r) for r in got}
    want_keys = {key(r) for r in want}
    assert got_keys == want_keys
    # totals agree to a cent (double sum order differs between paths)
    want_totals = {key(r): r.total_value for r in want}
    for r in got:
        assert abs(r.total_value - want_totals[key(r)]) <= 0.01, r
