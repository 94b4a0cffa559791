"""Streaming strict replay ≡ batch strict replay, even out of order."""

from __future__ import annotations

from pyspark.sql import functions as F

from debezium_cdc_kafka_spark.operators.cdc import cdc_strict_replay_state, decode_envelope
from debezium_cdc_kafka_spark.sources.cdc_events import derive_change_events
from debezium_cdc_kafka_spark.streaming.strict_replay import (
    latest_multiset,
    strict_replay_stream,
)
from tests.conftest import SF_SMOKE


def test_streaming_strict_replay_matches_batch(spark, tmp_path):
    env_dir = str(tmp_path / "env")
    # random repartition → micro-batches arrive in arbitrary offset order;
    # the state machine must not care
    derive_change_events(spark, SF_SMOKE).repartition(5).write.parquet(env_dir)

    from debezium_cdc_kafka_spark.streaming.cdc_stream import file_change_stream

    decoded = decode_envelope(file_change_stream(spark, env_dir)).filter(
        ~F.col("is_malformed")
    )
    q = (
        strict_replay_stream(decoded)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("strict_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.id, round(r.value, 2), r.n_rows)
        for r in latest_multiset(spark.sql("SELECT * FROM strict_out")).collect()
    }
    expected = {
        (r.id, r.value, r.n_rows)
        for r in cdc_strict_replay_state(spark, SF_SMOKE).collect()
    }
    assert got == expected
    assert len(got) > 0
