"""dedup_incremental_minhash ≡ the full LSH dup-pair view restricted to
pairs touching the changed-document delta — the defining property of an
incremental maintenance step (refreshing only the delta's rows must agree
with a full rebuild)."""

from __future__ import annotations

from debezium_cdc_kafka_spark.operators.dedup import dedup_minhash_lsh
from debezium_cdc_kafka_spark.operators.incremental import (
    _DELTA_MOD,
    _DELTA_REM,
    dedup_incremental_minhash,
)
from tests.conftest import SF_SMOKE


def _touches_delta(d: int) -> bool:
    return d % _DELTA_MOD == _DELTA_REM


def test_incremental_equals_full_restricted_to_delta(spark):
    full = {
        (r.d1, r.d2): r.jaccard for r in dedup_minhash_lsh(spark, SF_SMOKE).collect()
    }
    spark.catalog.clearCache()
    incr = {
        (r.d1, r.d2): r.jaccard
        for r in dedup_incremental_minhash(spark, SF_SMOKE).collect()
    }
    spark.catalog.clearCache()
    expected = {
        pair: jac
        for pair, jac in full.items()
        if _touches_delta(pair[0]) or _touches_delta(pair[1])
    }
    assert incr == expected
    # and the restriction is genuine: the full view has pairs the
    # incremental step correctly did NOT recompute
    assert len(full) > len(incr)
