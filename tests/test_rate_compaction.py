"""Rate-source generator smoke test + snapshot compaction."""

from __future__ import annotations

from debezium_cdc_kafka_spark.sources.workload import workload_rate_stream


def test_rate_stream_emits_envelopes(spark):
    """G4: the live generator produces well-formed Kafka-record rows at the
    configured rate (reference generate.py's 1-op-per-5s loop, sped up)."""
    stream = workload_rate_stream(spark, rows_per_second=50)
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("rate_out")
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    import time

    deadline = time.time() + 30
    n = 0
    while time.time() < deadline:
        n = spark.sql("SELECT count(*) FROM rate_out").first()[0]
        if n >= 20:
            break
        time.sleep(0.5)
    q.stop()
    q.awaitTermination(30)
    assert n >= 20
    rows = spark.sql("SELECT * FROM rate_out LIMIT 5").collect()
    for r in rows:
        assert r.topic == "dbserver1.inventory.customers"
        assert r.value is None or '"payload"' in r.value


def test_snapshot_compaction(spark, tmp_path):
    from debezium_cdc_kafka_spark.operators.cdc import decode_envelope, final_state_upsert
    from debezium_cdc_kafka_spark.sources.cdc_events import derive_change_events
    from debezium_cdc_kafka_spark.streaming.cdc_stream import (
        ParquetSnapshotTarget,
        file_change_stream,
        run_cdc_stream,
    )
    from tests.conftest import SF_SMOKE

    env_dir = str(tmp_path / "env")
    derive_change_events(spark, SF_SMOKE).repartition(5).write.parquet(env_dir)
    tgt = str(tmp_path / "target")
    q = run_cdc_stream(spark, file_change_stream(spark, env_dir), tgt, str(tmp_path / "ck"))
    q.awaitTermination(120)

    target = ParquetSnapshotTarget(tgt)
    before = target.versions()
    assert len(before) >= 4
    state_before = {r.id: r.value for r in target.read_view(spark).collect()}
    removed = target.compact(keep_last=2)
    assert len(target.versions()) == 2
    assert removed == before[:-2]
    # the live snapshot is untouched
    state_after = {r.id: r.value for r in target.read_view(spark).collect()}
    assert state_after == state_before
