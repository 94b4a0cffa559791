"""Plan-shape regression tests: the properties that make these queries
scale (pushdown, pruning, broadcast, bounded shuffles) must survive
refactors. These assert on the optimized physical plan, not on timings.
"""

from __future__ import annotations

from debezium_cdc_kafka_spark.operators import dedup, relational, similarity
from debezium_cdc_kafka_spark.plans.inspect import plan_facts
from tests.conftest import SF_SMOKE


def test_q1_pushdown_and_pruning(spark):
    facts = plan_facts(relational.q01_pricing_summary(spark, SF_SMOKE))
    assert facts.pushes_filter_on("l_shipdate"), facts.pushed_filters
    # projection pruned to the 7 referenced columns — no full-width scan
    assert facts.reads_column("l_returnflag")
    assert not facts.reads_column("l_orderkey"), facts.read_schemas


def test_q6_filters_all_pushed(spark):
    facts = plan_facts(relational.q06_forecast_revenue(spark, SF_SMOKE))
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert facts.pushes_filter_on(col), (col, facts.pushed_filters)


def test_q5_dimension_joins_broadcast(spark):
    facts = plan_facts(relational.q05_local_supplier_volume(spark, SF_SMOKE))
    # region/nation/supplier are hinted broadcast; no sort-merge fallback
    assert facts.broadcast_joins >= 3, facts
    assert facts.sort_merge_joins == 0, facts


def test_range_join_is_broadcast_nested_loop(spark):
    facts = plan_facts(relational.q_range_join_price_bands(spark, SF_SMOKE))
    assert facts.nested_loop_joins >= 1, facts


def test_topk_is_take_ordered_not_global_sort(spark):
    from debezium_cdc_kafka_spark.plans.inspect import formatted_plan

    plan = formatted_plan(relational.q03_shipping_priority(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan


def test_minhash_signatures_need_no_shuffle(spark):
    """Signatures compute per-row from shingle arrays: the signature
    projection must add ZERO exchanges on top of the shingle-table plan
    (which itself has only the parallelizing scan split — possibly served
    from cache when the dedup query ran earlier in the session)."""
    sharr = dedup.doc_shingle_arrays(spark, SF_SMOKE)
    base = plan_facts(sharr).exchanges
    facts = plan_facts(dedup._minhash_signatures(sharr))
    assert facts.exchanges == base, (facts, base)


def test_ann_brute_force_broadcasts_queries(spark):
    facts = plan_facts(similarity.ann_bruteforce_topk(spark, SF_SMOKE))
    assert facts.broadcast_joins + facts.nested_loop_joins >= 1, facts


def test_partsupp_q2_all_dims_broadcast_single_window_exchange(spark):
    """Q2's four dimension joins are broadcast; the only shuffles are the
    partsupp derivation split and the window partition on ps_partkey."""
    from debezium_cdc_kafka_spark.operators import partsupp

    facts = plan_facts(partsupp.q02_min_cost_supplier(spark, SF_SMOKE))
    assert facts.broadcast_joins >= 4, facts
    assert facts.sort_merge_joins == 0, facts


def test_partsupp_q11_total_is_broadcast_not_window(spark):
    """The grand-total compare must be a broadcast nested-loop (scalar
    cross join), never a single-partition window."""
    from debezium_cdc_kafka_spark.operators import partsupp
    from debezium_cdc_kafka_spark.plans.inspect import formatted_plan

    plan = formatted_plan(partsupp.q11_important_stock(spark, SF_SMOKE))
    assert "Window" not in plan, "grand total regressed to a window"
    facts = plan_facts(partsupp.q11_important_stock(spark, SF_SMOKE))
    assert facts.nested_loop_joins >= 1 or facts.broadcast_joins >= 1, facts


def test_behavior_funnel_stages_reuse_user_partitioning(spark):
    """The funnel computes all three stage timestamps as unordered window
    aggregates over ONE user_id hash partitioning — no joins at all, and
    only the user_id shuffle plus the final single-row count exchange
    (on a user_id-bucketed table even the former collapses)."""
    from debezium_cdc_kafka_spark.operators import behavior

    facts = plan_facts(behavior.q_funnel_3step(spark, SF_SMOKE))
    assert facts.sort_merge_joins == 0, facts
    assert facts.broadcast_joins == 0, facts
    # one data shuffle (user_id) + one single-row count exchange; a
    # regression back to per-stage re-shuffling would push this up
    assert facts.exchanges <= 3, facts


def test_bm25_small_sides_broadcast(spark):
    """BM25's df/stats sides are tiny aggregates — they must broadcast;
    the corpus-wide token stream must never sort-merge against them."""
    from debezium_cdc_kafka_spark.operators import text

    facts = plan_facts(text.q_bm25_search(spark, SF_SMOKE))
    assert facts.broadcast_joins >= 2, facts
    assert facts.sort_merge_joins == 0, facts


def test_pareto_frontier_no_self_join(spark):
    """The skyline must be the O(n log n) sort-scan form: one broadcast
    join back to the base table, never a quadratic self nested-loop."""
    from debezium_cdc_kafka_spark.operators import relational3

    facts = plan_facts(relational3.q_pareto_frontier(spark, SF_SMOKE))
    assert facts.nested_loop_joins == 0, facts
    assert facts.broadcast_joins >= 1, facts


def test_bloom_prefilter_reaches_scan(spark):
    """The bloom bit-test must sit in the lineitem scan stage (a filter
    over the scan), not after the join."""
    from debezium_cdc_kafka_spark.operators import relational3
    from debezium_cdc_kafka_spark.plans.inspect import formatted_plan

    plan = formatted_plan(relational3.q_bloom_semi_join(spark, SF_SMOKE))
    assert "xxhash64" in plan, "bloom probe expression missing from plan"


def test_chunking_is_shuffle_free(spark):
    """Document chunking is a per-row explode — the only exchange allowed
    is the catalog's parallelizing repartition of the scan."""
    from debezium_cdc_kafka_spark.catalog import load_table
    from debezium_cdc_kafka_spark.operators import text

    base = plan_facts(load_table(spark, SF_SMOKE, "documents")).exchanges
    facts = plan_facts(text.q_doc_chunking(spark, SF_SMOKE))
    assert facts.exchanges == base, (facts.exchanges, base)


def test_quantize_is_shuffle_free(spark):
    from debezium_cdc_kafka_spark.catalog import load_table
    from debezium_cdc_kafka_spark.operators import similarity

    base = plan_facts(load_table(spark, SF_SMOKE, "embeddings")).exchanges
    facts = plan_facts(similarity.q_embedding_quantize(spark, SF_SMOKE))
    assert facts.exchanges == base, (facts.exchanges, base)


def test_similarity_histogram_probe_is_constant_size(spark):
    """The pair space must be capped at ~(TARGET choose 2) at EVERY scale
    — the r4 fixed-rate probe grew pairs as (n/5)² (VERDICT r4 scale-killer).
    Checked at sf0.1 (n=2000, 4x the smoke table): exactly C(100,2) pairs
    and no CartesianProduct (the probe side must stay broadcastable)."""
    from debezium_cdc_kafka_spark.operators.similarity import (
        _SIMH_TARGET,
        q_embedding_similarity_histogram,
    )

    df = q_embedding_similarity_histogram(spark, "/root/testdata/sf0.1")
    total_pairs = sum(r["n_pairs"] for r in df.collect())
    assert total_pairs == _SIMH_TARGET * (_SIMH_TARGET - 1) // 2
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_salted_join_is_sort_merge_never_broadcast(spark):
    """The salted skew join must keep its (key, salt) SHUFFLE at every
    scale. Catalyst's explode-blind size estimate picks a broadcast here
    on its own (measured: ~1 GB silently at x16 facts, hard
    SparkException past the 8 GB limit at x64), and a broadcast join has
    no shuffle partition to salt in the first place; SHUFFLE_HASH OOMs
    at x64 because its hash-map build cannot spill. Sort-merge is the
    pinned strategy — salted shuffle plus spill-instead-of-fail."""
    from debezium_cdc_kafka_spark.operators import relational3

    facts = plan_facts(relational3.q_salted_skew_join(spark, SF_SMOKE))
    assert facts.sort_merge_joins >= 1, facts
    assert facts.broadcast_joins == 0, facts


def test_pair_joins_pin_fanout_against_aqe_coalescing(spark):
    """The blocked pair scans must keep their REPARTITION_BY_NUM exchange
    on the join key. AQE coalesces post-shuffle partitions by shuffle
    BYTES, which is blind to the |block|x row expansion and the per-pair
    64-element fold behind these joins — profiled at sf0.1, it fused
    q_knn_graph's whole pair scan into ONE task (4.6 s of a 5.5 s wall,
    31 cores idle). Explicit repartition(N, key) is exempt from
    coalescing and satisfies sort-merge's distribution requirement, so
    it costs no extra shuffle at scale (SCALE.md r6 fan-out section).
    q_knn_graph/q_label_propagation share the same pin but hide it
    behind a localCheckpoint barrier; the two plans visible end-to-end
    are asserted here as the pattern's tripwire."""
    from debezium_cdc_kafka_spark.operators import dedup, similarity

    for fn in (dedup.dedup_embedding_cosine, similarity.semdedup_survivors):
        plan = fn(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
        n_pins = plan.count("REPARTITION_BY_NUM")
        assert n_pins >= 2, (fn.__name__, n_pins)
