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
# Round-5 window (per VERDICT.md r4 "Next round" item 1): exactly the r5
# rotation plan recorded last round — never-gated pre-r4 families first,
# then one pick per late-r4 family. Every name below is first-time (no
# green row in CORRECTNESS_r01..r04), enforced by tests/test_driver_canon.py.
# Never gated after the r5 gate runs: exactly 97 (additions FROZEN this
# round per VERDICT r4 item 2, so the pool strictly decreases; verified
# against CORRECTNESS_r01..r04 + this window).
# r6 window plan (50, do NOT apply before the r5 driver gate has run) —
# whole never-gated families in module order:
#   cdc(3): cdc_op_mix_drift, cdc_hot_keys, cdc_key_lifecycle
#   dedup(4): dedup_exact_substring, q_minhash_containment,
#     dedup_cluster_histogram, dedup_source_overlap
#   similarity(16): q_rrf_hybrid_search, q_knn_graph, ann_recall_eval,
#     q_embedding_health, q_kcenter_coreset, q_dbscan_clusters,
#     q_label_propagation, q_matryoshka_recall, q_retrieval_mrr,
#     q_cluster_purity, q_simplified_silhouette, q_ndcg_eval,
#     q_embedding_norm_audit, q_embedding_dim_variance,
#     q_cluster_quality_profile, q_embedding_similarity_histogram
#   text(4): q_feature_hashing, q_langid_confusion,
#     text_lexical_diversity, text_readability
#   curation(1): q_split_leakage_report
#   corpus(7): text_bpe_train, text_bpe_apply, q_ngram_novelty,
#     q_gini_source_tokens, q_tokenizer_fertility, q_zipf_fit,
#     q_pmi_collocations
#   multimodal(3): multimodal_patch_grid, multimodal_audio_chunks,
#     multimodal_aspect_buckets
#   graph(3): graph_jaccard_neighbors, graph_assortativity,
#     graph_degree_distribution
#   audit(3): q_l_diversity, q_qi_generalize, q_srm_check
#   timeseries(6): q_cusum_changepoint, q_sax_symbolize, q_rolling_wau,
#     q_mom_growth, q_theil_sen_trend, q_seasonal_naive_backtest
# r7 window (the remaining 47, clearing the pool): timeseries stragglers
# (q_weekday_effect, q_mann_kendall), behavior(12), approx(6), stats(12),
# q_asof_nearest_tolerance, q_equidepth_histogram, q_windowed_topk_types,
# relational3(12: variant/cycle/ABC/HHI/reorder/basket/dispersion/
# discount/churn/Laspeyres/Fisher/PVM).
GATE_ORDER: list[str] = [
    # stats (10) — never-gated since r3
    "q_stats_moments",
    "q_pandas_udf_score",
    "q_outliers_mad",
    "q_profile_columns",
    "q_regression_trend",
    "q_referential_audit",
    "q_quantile_normalize",
    "q_chi_square_independence",
    "q_correlation_matrix",
    "q_ks_two_sample",
    # asof (2)
    "q_asof_last_order",
    "q_asof_next_order",
    # reshape (7; q_equidepth_histogram queued for r6)
    "q_moving_avg_7d",
    "q_unpivot_metrics",
    "q_histogram_price_bins",
    "q_pct_of_total",
    "q_date_dimension",
    "q_map_functions",
    "q_feature_scaling",
    # partsupp TPC-H (4)
    "q02_min_cost_supplier",
    "q11_important_stock",
    "q16_supplier_counts",
    "q20_excess_inventory",
    # layout (3)
    "q_zorder_key",
    "q_compaction_plan",
    "q_partition_skew_advisor",
    # windows (6; q_windowed_topk_types queued for r6)
    "q_tumbling_window_1h",
    "q_sliding_window_1h_30m",
    "q_sessionize_30m",
    "q_stream_dedup_first",
    "q_late_events_10m",
    "q_window_navigation",
    # incremental (3; q_pca_invariants gated r4)
    "dedup_incremental_minhash",
    "q_incremental_topk",
    "q_incremental_distinct",
    # approx sketch stragglers (2)
    "q_hll_sketch_union",
    "q_kmv_sketch_ops",
    # one per late-r4 family (13)
    "q_welch_ttest",
    "q_bootstrap_ci",
    "q_spearman_corr",
    "q_acf_lags",
    "q_ohlc_candles",
    "q_soft_dedup_weights",
    "q_epoch_shuffle_plan",
    "multimodal_phash_dedup",
    "graph_kcore",
    "q_t_closeness",
    "q_snapshot_diff",
    "dedup_lsh_recall_eval",
    "q_vocab_coverage",
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
