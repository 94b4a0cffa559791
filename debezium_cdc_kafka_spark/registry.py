"""Merged query/oracle registry — the single source for __spark_entry__.py.

Modules register into their own QUERIES/ORACLES dicts; this module unions
them and fails fast on duplicate names or oracle entries without queries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _modules():
    # Explicit list — update as operator modules land. A broken module must
    # fail loudly here, not be skipped.
    from .operators import (
        approx,
        audit,
        corpus,
        asof,
        behavior,
        cdc,
        curation,
        dedup,
        graph,
        incremental,
        layout,
        multimodal,
        partsupp,
        relational,
        relational2,
        relational3,
        reshape,
        similarity,
        stats,
        text,
        timeseries,
        windows,
    )

    return [
        cdc,
        dedup,
        similarity,
        text,
        curation,
        corpus,
        multimodal,
        graph,
        audit,
        timeseries,
        behavior,
        approx,
        stats,
        asof,
        reshape,
        partsupp,
        layout,
        windows,
        incremental,
        relational3,
        relational2,
        relational,
    ]


# The external driver's correctness gate records the FIRST 50 queries in
# registry iteration order. Per round-3 ADVICE (registry.py:68), gating is
# now decoupled from module iteration order: this explicit list IS the
# round's gated window — all_queries() yields these names first, then every
# other query in module order. Editing an operator module can therefore no
# longer rotate it out of the gate as a side effect; changing the window is
# an explicit edit to this list.
#
# Round-8 window (per VERDICT.md r7 "Next round" item 1): the r7 gate
# completed the verification program — union of green driver rows r1–r7
# is 291/293, the only gaps being q_pca_top2_project (rows-only by
# documented design) and dedup_embedding_cosine_banded (registered after
# the r7 gate ran). This window leads with that last ungated query plus
# the round's two new companions, then fills the 50 slots with
# deliberate re-gates (REGATE_OK in tests/test_driver_canon.py):
# first the three queries whose code changed AFTER their last driver row
# (ann_pq_adc — r7 ADC rewrite + r8 dense-qtab fix; q_dbscan_clusters —
# r7 adaptive blocking fix; q_matryoshka_recall — r8 shared-plan
# refactor), then 44 of the 45 oldest rows (r2) as a stability re-check;
# q_math_functions is the one r2 row deferred to the next rotation.
GATE_ORDER: list[str] = [
    # --- first-time rows: the 3 queries with no driver row yet ---
    "dedup_embedding_cosine_banded",
    "q_matryoshka_recall_capped",
    "dedup_banded_width_audit",
    # --- changed-code re-gates (code changed after last driver row) ---
    "ann_pq_adc",
    "q_dbscan_clusters",
    "q_matryoshka_recall",
    # --- oldest-row re-gates: 44 of the 45 r2 rows ---
    "q04_order_priority_semi",
    "q05_local_supplier_volume",
    "q07_volume_shipping",
    "q08_market_share",
    "q09_product_profit",
    "q10_returned_items",
    "q12_late_shipments",
    "q13_customer_distribution",
    "q14_promo_effect",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q18_large_volume_orders",
    "q19_disjunctive_predicates",
    "q21_suppliers_kept_waiting",
    "q22_customers_without_orders",
    "q_argmax_order_per_customer",
    "q_array_agg_ordered",
    "q_array_functions",
    "q_bloom_semi_join",
    "q_case_projection",
    "q_correlated_above_avg",
    "q_cube_orders",
    "q_date_functions",
    "q_deterministic_sample",
    "q_distinct_agg",
    "q_explode_word_freq",
    "q_grouping_sets",
    "q_having_expensive_types",
    "q_json_props",
    "q_lateral_top_orders",
    "q_not_in_null_aware",
    "q_pareto_frontier",
    "q_pivot_status_by_segment",
    "q_quantiles_per_segment",
    "q_range_join_price_bands",
    "q_region_segment_matrix",
    "q_rollup_sales",
    "q_running_total",
    "q_salted_aggregation",
    "q_salted_skew_join",
    "q_setops_repeat_customers",
    "q_string_functions",
    "q_topk_parts_per_brand",
    "q_window_frames",
]

GATE_SLOTS = 50


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        for name, fn in getattr(mod, "QUERIES", {}).items():
            if name in merged:
                raise ValueError(f"duplicate query name {name!r} in {mod.__name__}")
            merged[name] = fn
    if len(GATE_ORDER) != GATE_SLOTS:
        raise ValueError(f"GATE_ORDER has {len(GATE_ORDER)} names, want {GATE_SLOTS}")
    if len(set(GATE_ORDER)) != len(GATE_ORDER):
        raise ValueError("GATE_ORDER contains duplicates")
    missing = [n for n in GATE_ORDER if n not in merged]
    if missing:
        raise ValueError(f"GATE_ORDER names not registered: {missing}")
    gated = {n: merged[n] for n in GATE_ORDER}
    gated.update((n, fn) for n, fn in merged.items() if n not in gated)
    return gated


def all_oracles() -> dict[str, str]:
    queries = all_queries()
    merged: dict[str, str] = {}
    for mod in _modules():
        for name, sql in getattr(mod, "ORACLES", {}).items():
            if name not in queries:
                raise ValueError(f"oracle {name!r} in {mod.__name__} has no matching query")
            merged[name] = sql
    # Every gated slot must be hash-verifiable: an oracle-less query inside
    # the window burns a slot on a row the driver can't check (the r3
    # q_pca_top2_project mistake).
    unhashable = [n for n in GATE_ORDER if n not in merged]
    if unhashable:
        raise ValueError(f"GATE_ORDER queries without oracles: {unhashable}")
    return merged
