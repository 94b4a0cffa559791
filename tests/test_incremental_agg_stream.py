"""Streaming aggregate maintenance ≡ batch telescoped-delta aggregate.

`operators.cdc.cdc_incremental_agg` proves deltas telescope in batch;
here the same aggregate is maintained epoch-by-epoch through the real
foreachBatch pipeline (file stream, one file per trigger, random event
placement across files) and must land on the same (n_live, total_value).
"""

from __future__ import annotations

from debezium_cdc_kafka_spark.operators.cdc import cdc_incremental_agg
from debezium_cdc_kafka_spark.sources.cdc_events import derive_change_events
from debezium_cdc_kafka_spark.streaming.cdc_stream import file_change_stream
from debezium_cdc_kafka_spark.streaming.incremental_agg import maintain_incremental_agg
from tests.conftest import SF_SMOKE


def test_streaming_agg_matches_batch(spark, tmp_path):
    env_dir = str(tmp_path / "env")
    # random repartition → events scatter across micro-batches in arbitrary
    # offset order; the state-diff delta must not care
    derive_change_events(spark, SF_SMOKE).repartition(5).write.parquet(env_dir)

    q, aggs = maintain_incremental_agg(
        spark,
        file_change_stream(spark, env_dir),
        target_path=str(tmp_path / "target"),
        agg_path=str(tmp_path / "aggs"),
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)

    # the stream really ran as multiple epochs, maintaining incrementally
    assert len(aggs.versions()) >= 3

    n_live, total_cents = aggs.read()
    expected = cdc_incremental_agg(spark, SF_SMOKE).first()
    assert n_live == expected.n_live
    assert round(total_cents / 100.0, 2) == expected.total_value
