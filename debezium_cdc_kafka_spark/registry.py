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
# Round-9 window (per VERDICT.md r8 "Next round" item 5): every
# registered query now has a driver row (r8 closed the program at
# 294/295, q_pca_top2_project rows-only by design), so all 50 slots are
# deliberate re-gates (REGATE_OK in tests/test_driver_canon.py): first
# the two queries whose code changed in r9 after their r8 rows
# (q_dbscan_clusters — broadcast-bound shuffle_hash fallback; ann_pq_adc
# — twopass determinism checkpoint + mode refactor), then the 46 oldest
# rows (q_math_functions, the one r2 row the r8 rotation deferred, plus
# all 45 r3-era first-timers never re-verified since), then the 2
# alphabetically-first r4 rows to fill the window. Oldest-driver-row age
# advances from r2/r3 to r4.
GATE_ORDER: list[str] = [
    # --- changed-code re-gates (code changed after last driver row) ---
    "q_dbscan_clusters",
    "ann_pq_adc",
    # --- oldest-row re-gates: the deferred r2 row + all 45 r3 rows ---
    "q_math_functions",
    "ann_bruteforce_topk",
    "ann_filtered_topk",
    "ann_ivf_topk",
    "ann_kmeans_assign",
    "ann_kmeans_update",
    "ann_lsh_hyperplane",
    "ann_lsh_multiprobe",
    "ann_mmr_rerank",
    "cdc_anomaly_audit",
    "cdc_final_state",
    "cdc_incremental_agg",
    "cdc_incremental_merge",
    "cdc_ivm_join_view",
    "cdc_op_counts",
    "cdc_scd2_history",
    "cdc_scd2_probe",
    "cdc_strict_replay_state",
    "cdc_tx_consistent_state",
    "dedup_clusters",
    "dedup_embedding_cosine",
    "dedup_exact",
    "dedup_fuzzy_levenshtein",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_capped",
    "dedup_normalized_exact",
    "dedup_simhash",
    "dedup_span_shingles",
    "q_bm25_search",
    "q_doc_chunking",
    "q_embedding_covariance",
    "q_label_centroid_outliers",
    "semdedup_survivors",
    "text_bigram_logprob",
    "text_entropy",
    "text_fingerprint",
    "text_langid",
    "text_quality_classifier",
    "text_quality_stats",
    "text_redact_pii",
    "text_repetition_filter",
    "text_tfidf_doc_similarity",
    "text_tfidf_top_terms",
    "text_token_counts",
    "text_unigram_logprob",
    # --- next-oldest (r4) rows filling the window ---
    "graph_association_rules",
    "graph_pagerank_copurchase",
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
