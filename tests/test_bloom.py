"""Bloom-prefilter effectiveness: the explicit runtime filter in
q_bloom_semi_join must actually prune the fact table (not just pass
everything through), and the exact semi-join must remove its false
positives. Correctness of the final answer is separately oracle-gated in
test_relational.py; this test measures the pruning the oracle can't see.
"""

from __future__ import annotations

from debezium_cdc_kafka_spark.operators.relational3 import bloom_prefilter_stats
from tests.conftest import SF_SMOKE


def test_bloom_prefilter_prunes(spark):
    s = bloom_prefilter_stats(spark, SF_SMOKE)
    # Supersets in the right order: exact ⊆ bloomed ⊆ total.
    assert s["exact"] <= s["bloomed"] <= s["total"]
    # The bloom must do real work: the fact table is cut by at least half
    # (the selective predicate keeps well under 50% of orders).
    assert s["bloomed"] < s["total"] * 0.5
    # 64 Kbits over a few hundred keys → fill ratio ~2%, k=3 → false-positive
    # rate ~1e-5; allow generous slack for hash clumping at tiny SF.
    assert s["bloomed"] - s["exact"] <= max(50, int(s["exact"] * 0.05))
