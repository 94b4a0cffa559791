"""Time travel over the versioned snapshot target: reading the state as
of any historical epoch must show a consistent, monotonically advancing
table — per-key offsets never regress across versions, applied-key sets
only grow, and the newest version equals the one-shot batch answer.
This is the Parquet-native analogue of Delta/Iceberg `VERSION AS OF`.
"""

from __future__ import annotations

from debezium_cdc_kafka_spark.operators.cdc import decode_envelope, final_state_upsert
from debezium_cdc_kafka_spark.sources.cdc_events import derive_change_events
from debezium_cdc_kafka_spark.streaming.cdc_stream import (
    ParquetSnapshotTarget,
    file_change_stream,
    run_cdc_stream,
)
from tests.conftest import SF_SMOKE


def test_time_travel_reads_are_monotone_and_consistent(spark, tmp_path):
    env_dir = str(tmp_path / "envelopes")
    derive_change_events(spark, SF_SMOKE).repartition(4).write.parquet(env_dir)
    target_path = str(tmp_path / "target")
    q = run_cdc_stream(
        spark, file_change_stream(spark, env_dir), target_path, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    target = ParquetSnapshotTarget(target_path)
    versions = sorted(target.versions())
    assert len(versions) >= 2

    prev_offsets: dict[int, int] = {}
    for v in versions:
        snap = {
            r.id: r._offset
            for r in target.read(spark, before_version=v + 1).collect()
        }
        # keys only ever get added (deletes are tombstones, still present)
        assert set(prev_offsets) <= set(snap)
        # per-key offsets never regress when reading a later version
        for k, off in prev_offsets.items():
            assert snap[k] >= off, (k, off, snap[k])
        prev_offsets = snap

    # newest version ≡ the one-shot batch computation
    final = {
        r.id: r.value
        for r in target.read_view(spark).collect()
    }
    expected = {
        r.id: r.value
        for r in final_state_upsert(
            decode_envelope(derive_change_events(spark, SF_SMOKE))
        ).collect()
    }
    assert final == expected
