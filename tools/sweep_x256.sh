#!/bin/bash
# Full-registry ×256 sweep (VERDICT r8 item 2) — run IDLE, log to file.
#
# Skips, all recorded in the JSON (sweep_timings --skip contract):
# - 5 queries with dedicated ×256 measurements this or last round:
#   ann_pq_adc 3155 s, dedup_embedding_cosine_banded 575.5 s,
#   dedup_banded_width_audit 435.4 s, q_matryoshka_recall_capped 137.4 s
#   (artifacts_r8/x256_timings.json) and q_dbscan_clusters
#   (artifacts_r9/x256_dbscan.json, this round's dedicated run).
# - the 11 documented-quadratic text/embedding all-pairs baselines the
#   r7 ×64 sweep already skipped for the same reason (their scale
#   answers are the banded/capped/blocked variants, measured above).
# Everything else runs under --timeout-s 480 + the 10 GiB disk floor,
# so every query ends completed-or-classified (TIMEOUT/DISK_BUDGET/ERROR).
set -euo pipefail
cd "$(dirname "$0")/.."

SKIP_MEASURED="ann_pq_adc,dedup_embedding_cosine_banded,dedup_banded_width_audit,q_matryoshka_recall_capped,q_dbscan_clusters"
SKIP_QUADRATIC="dedup_embedding_cosine,dedup_ngram_jaccard,dedup_ngram_jaccard_capped,q_minhash_containment,dedup_exact_substring,dedup_clusters,dedup_cluster_histogram,q_dedup_canonical,dedup_lsh_recall_eval,dedup_span_shingles,dedup_source_overlap"

exec python tools/sweep_timings.py /tmp/scale_fixtures/full256 \
  --skip "$SKIP_MEASURED,$SKIP_QUADRATIC" \
  --timeout-s 480 \
  --min-free-gb 10 \
  --json artifacts_r9/x256_sweep.json
