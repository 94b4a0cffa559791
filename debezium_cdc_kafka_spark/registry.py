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
# Round-7 window (per VERDICT.md r6 "Next round" item 1): exactly the r7
# plan recorded last round — the complete remaining never-gated pool (47
# names, reconciled against CORRECTNESS_r01..r06: 244 green union + these
# 47 + q_pca_top2_project's rows-only r3 row = 292) plus 3 deliberate
# re-verifications to fill the 50 slots (the r1-gated headline trio,
# listed in tests/test_driver_canon.py REGATE_OK). After this gate runs,
# every oracle-able query in the engine has a hard driver row and the
# never-gated pool is 0.
GATE_ORDER: list[str] = [
    # --- the 47 remaining never-gated queries, module order ---
    # timeseries (2)
    "q_weekday_effect",
    "q_mann_kendall",
    # behavior (12)
    "q_kaplan_meier",
    "q_dau_mau_stickiness",
    "q_next_event_accuracy",
    "q_user_concentration",
    "q_new_vs_returning",
    "q_interarrival_burstiness",
    "q_window_funnel",
    "q_attribution_linear",
    "q_attribution_time_decay",
    "q_ltv_cohort_curve",
    "q_engagement_by_segment",
    "q_conversion_cdf",
    # approx (6)
    "q_bloom_fpr_audit",
    "q_ams_f2_sketch",
    "q_join_size_sketch",
    "q_spacesaving_heavy_hitters",
    "q_hll_time_rollup",
    "q_bitmap_distinct_users",
    # stats (12)
    "q_psi_drift",
    "q_classifier_auc",
    "q_decision_stump",
    "q_calibration_curve",
    "q_mutual_information",
    "q_anova_oneway",
    "q_weighted_median_udaf",
    "q_winsorized_stats",
    "q_cuped_adjustment",
    "q_diff_in_diff",
    "q_quantile_treatment_effect",
    "q_power_analysis",
    # asof (1)
    "q_asof_nearest_tolerance",
    # reshape (1)
    "q_equidepth_histogram",
    # windows (1)
    "q_windowed_topk_types",
    # relational3 (12)
    "q_variant_props",
    "q_order_cycle_time",
    "q_abc_classification",
    "q_supplier_hhi",
    "q_reorder_interval",
    "q_basket_profile",
    "q_unit_price_dispersion",
    "q_discount_band_mix",
    "q_churn_flags",
    "q_laspeyres_price_index",
    "q_fisher_price_index",
    "q_price_volume_mix",
    # --- 3 deliberate re-gates (REGATE_OK in test_driver_canon.py):
    # the oldest green rows (r1) double as a stability re-check after
    # three rounds of perf work on the headline queries.
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q06_forecast_revenue",
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
