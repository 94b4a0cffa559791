"""Stream-stream LEFT OUTER interval join: the semantics
test_stream_join.py's inner join doesn't touch — watermark-driven NULL
emission. An unmatched view may only be emitted (with null purchase
columns) once the watermark proves no matching purchase can still
arrive, so the test appends a far-future sentinel file whose sole job is
to push the final watermark past every real view's join horizon; the
drained stream must then equal the batch left-outer interval join
row-for-row, nulls included.
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from debezium_cdc_kafka_spark.catalog import load_table
from tests.conftest import SF_SMOKE

_SENTINEL_USER = -1


@pytest.fixture(scope="module")
def outer_log_dir(spark, tmp_path_factory):
    """The test_stream_join.py time-ordered quartile layout plus a fifth
    file holding one sentinel view 30 days past the real data: its event
    time advances the watermark far enough that every real view's
    1h-match window is provably closed, flushing all pending outer
    NULLs. The sentinel's user_id never occurs in the data, so it joins
    nothing; the comparison filters it out of both sides."""
    d = str(tmp_path_factory.mktemp("events_outer_join_stream"))
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
    # one sentinel per INPUT: Spark's global watermark is the MIN across
    # all watermarked streams, so the purchases side must advance too or
    # no pending view ever proves unmatched. 2 days apart so the two
    # sentinels cannot join each other either.
    last = ev.orderBy(F.desc("ts")).limit(1)
    sentinel = last.select(
        F.lit(-10_000_000).cast("long").alias("event_id"),
        (F.col("ts") + F.expr("INTERVAL 30 DAYS")).alias("ts"),
        F.lit(_SENTINEL_USER).cast("long").alias("user_id"),
        F.lit("view").alias("event_type"),
        F.lit(0.0).alias("value"),
        F.lit("{}").alias("props"),
    ).unionByName(
        last.select(
            F.lit(-10_000_001).cast("long").alias("event_id"),
            (F.col("ts") + F.expr("INTERVAL 32 DAYS")).alias("ts"),
            F.lit(_SENTINEL_USER).cast("long").alias("user_id"),
            F.lit("purchase").alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit("{}").alias("props"),
        )
    )
    ev_cols = [f.name for f in ev.schema.fields]
    sentinel.select(*ev_cols).coalesce(1).write.mode("append").parquet(d)
    return d


def test_stream_stream_left_outer_join_equals_batch(spark, outer_log_dir):
    ev_schema = load_table(spark, SF_SMOKE, "events").schema

    def stream():
        return (
            spark.readStream.schema(ev_schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(outer_log_dir)
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
        "leftOuter",
    ).select(F.col("v_user").alias("user_id"), "view_id", "purchase_id")
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ss_louter_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        tuple(r)
        for r in spark.sql(
            f"SELECT * FROM ss_louter_out WHERE user_id != {_SENTINEL_USER}"
        ).collect()
    }

    ev = load_table(spark, SF_SMOKE, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("vts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
    )
    batch = v.join(
        p,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("pts") > F.col("vts"))
        & (F.col("pts") <= F.col("vts") + F.expr("INTERVAL 1 HOUR")),
        "left_outer",
    ).select(F.col("v_user").alias("user_id"), "view_id", "purchase_id")
    expected = {tuple(r) for r in batch.collect()}

    assert got == expected
    # the semantics under test actually occurred: some views matched,
    # some were emitted as watermark-expired NULLs
    assert any(r[2] is None for r in expected)
    assert any(r[2] is not None for r in expected)
