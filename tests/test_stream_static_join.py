"""Stream-static join: the enrichment pattern a CDC feed runs in
production — each micro-batch of the event stream broadcast-joins the
STATIC customer dimension (no watermark, no state: the dim is re-read
per batch, which is exactly what makes slowly-changing dims safe to
swap under a running query). Aggregated per (segment, type), the
drained stream must equal the batch join bit-for-bit, cents included.
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from debezium_cdc_kafka_spark.catalog import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def event_files_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("events_static_join_stream"))
    ev = load_table(spark, SF_SMOKE, "events")
    for i in range(3):
        ev.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(d)
        time.sleep(1.1)
    return d


def _enrich(events, customers):
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        events.join(
            F.broadcast(customers),
            events.user_id == customers.c_custkey,
        )
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents).alias("cents"),
        )
    )


def test_stream_static_enrichment_equals_batch(spark, event_files_dir):
    ev = load_table(spark, SF_SMOKE, "events")
    customers = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_mktsegment"
    )

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(event_files_dir)
    )
    q = (
        _enrich(stream, customers)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("ss_static_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.c_mktsegment, r.event_type): (r.n_events, r.cents)
        for r in spark.sql("SELECT * FROM ss_static_out").collect()
    }
    want = {
        (r.c_mktsegment, r.event_type): (r.n_events, r.cents)
        for r in _enrich(ev, customers).collect()
    }
    assert got == want
    # every event found its dim row (user ids are customer keys)
    assert sum(n for n, _ in want.values()) == ev.count()
