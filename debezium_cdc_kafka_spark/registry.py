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
# Round-4 window (per VERDICT.md "Next round"): the four queries that were
# red/ungated in CORRECTNESS_r03 lead (now canonicalizer-safe /
# hash-gated), then the never-gated families: curation(15) + corpus(3) +
# multimodal(3) + graph(3) + audit(4) + timeseries(7) + behavior(8) +
# approx's first 3 = exactly 50. Still never gated after r4 (~29, queued
# for r5): q_hll_sketch_union, stats(7), asof(2), reshape(6), partsupp(4),
# layout(1), windows(6), dedup_incremental_minhash, q_pca_top2_project
# (rows-only; its invariants companion is hash-gated in this window), and
# relational stragglers already green in r1/r2.
# r5 rotation plan (do NOT apply before the r4 driver gate has run):
# lead with the never-gated pre-r4 families — stats(10: moments,
# pandas_udf, outliers_mad, profile, regression, referential, qnorm,
# chi2, corr-matrix, ks) + asof(2) + reshape(7) + partsupp(4) +
# layout(3) + windows(6) + incremental(3: pca_invariants already gated →
# dedup_incremental_minhash, q_incremental_topk, q_incremental_distinct)
# + q_hll_sketch_union + q_kmv_sketch_ops — then fill the remaining
# ~13 slots from this round's additions, preferring one per new family:
# q_welch_ttest, q_bootstrap_ci, q_spearman_corr, q_acf_lags,
# q_ohlc_candles, q_soft_dedup_weights, q_epoch_shuffle_plan,
# multimodal_phash_dedup, graph_kcore, q_t_closeness, q_snapshot_diff,
# dedup_lsh_recall_eval, q_vocab_coverage. Also never gated (added at
# the end of r4): q_asof_nearest_tolerance, cdc_key_lifecycle,
# dedup_source_overlap, q_simplified_silhouette, text_readability,
# q_spacesaving_heavy_hitters, q_interarrival_burstiness, q_ndcg_eval,
# q_embedding_norm_audit, q_window_funnel, q_attribution_linear,
# q_hll_time_rollup, q_cuped_adjustment, q_diff_in_diff,
# q_quantile_treatment_effect, q_bitmap_distinct_users, and the closing
# r4 wave (variant_props, time-decay attribution, LTV curve, power
# analysis, cycle time, ABC, HHI, reorder, basket, dispersion,
# discount mix, dim variance, churn, degree distribution, cluster
# quality, engagement). ~65 never-gated total — fill r5's ~13 free
# slots one-per-family, r6 sweeps the remainder.
GATE_ORDER: list[str] = [
    # red-row fixes from CORRECTNESS_r03
    "q_embedding_quantize",
    "q_jl_projection",
    "q_inverted_index",
    "q_pca_invariants",
    # curation (15)
    "q_stratified_sample",
    "q_dataset_split",
    "q_dedup_canonical",
    "q_contamination_ngram",
    "q_quality_percentile_band",
    "q_weighted_sample",
    "q_token_budget_mix",
    "q_sequence_packing",
    "q_curation_pipeline",
    "q_c4_rule_gate",
    "q_negative_samples",
    "q_balanced_classes",
    "q_dsir_weights",
    "q_length_grouped_batches",
    "q_temperature_mix",
    # corpus (3)
    "text_bpe_pair_counts",
    "q_heaps_law",
    "q_source_mix_entropy",
    # multimodal (3)
    "multimodal_blob_meta",
    "multimodal_frame_sample",
    "multimodal_shard_manifest",
    # graph (3)
    "graph_pagerank_copurchase",
    "graph_association_rules",
    "graph_triangle_count",
    # audit (4)
    "q_k_anonymity",
    "q_cascade_delete",
    "q_benford_price",
    "q_dp_noisy_counts",
    # timeseries (7)
    "q_gapfill_hourly_counts",
    "q_locf_daily_value",
    "q_ewma_user_value",
    "q_multires_rollup",
    "q_rolling_zscore_anomaly",
    "q_seasonal_hourly_baseline",
    "q_streak_gaps_islands",
    # behavior (8)
    "q_funnel_3step",
    "q_cohort_retention_weekly",
    "q_markov_transitions",
    "q_rfm_segments",
    "q_attribution_last_touch",
    "q_view_purchase_interval_join",
    "q_top_session_paths",
    "q_max_concurrent_sessions",
    # approx (first 3)
    "q_approx_distinct",
    "q_approx_quantiles",
    "q_countmin_sketch",
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
