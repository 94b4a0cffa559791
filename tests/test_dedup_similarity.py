"""Semantic cross-checks between the sketch-based and exhaustive variants
(the per-query oracle parity is covered by tests/test_relational.py)."""

from __future__ import annotations

from debezium_cdc_kafka_spark.operators.dedup import (
    dedup_minhash_lsh,
    dedup_ngram_jaccard,
)
from debezium_cdc_kafka_spark.operators.similarity import (
    ann_bruteforce_topk,
    ann_ivf_topk,
)
from tests.conftest import SF_SMOKE


def test_minhash_recall_of_high_jaccard_pairs(spark):
    """LSH banding (4 bands × 4 rows) must catch essentially every pair the
    exhaustive index finds at Jaccard ≥ 0.8 (collision prob 1-(1-s^4)^4 ≈
    0.996 at s=0.8; the planted near-dups are ≥ 0.9)."""
    exhaustive = {(r.d1, r.d2) for r in dedup_ngram_jaccard(spark, SF_SMOKE).collect()}
    lsh = {(r.d1, r.d2) for r in dedup_minhash_lsh(spark, SF_SMOKE).collect()}
    assert exhaustive, "fixture should contain planted near-duplicates"
    missed = exhaustive - lsh
    assert len(missed) <= max(1, len(exhaustive) // 10), f"LSH missed {missed}"


def test_ivf_results_are_brute_force_subset_scores(spark):
    """Cell-restricted search returns the same cosine the exhaustive scan
    computes for those pairs (IVF changes the candidate set, not scores)."""
    brute = {
        (r.query_id, r.cand_id): r.cosine
        for r in ann_bruteforce_topk(spark, SF_SMOKE).collect()
    }
    ivf = ann_ivf_topk(spark, SF_SMOKE).collect()
    assert ivf
    for r in ivf:
        if (r.query_id, r.cand_id) in brute:
            assert abs(brute[(r.query_id, r.cand_id)] - r.cosine) < 1e-9


def test_multiprobe_recall_at_least_single_probe(spark):
    """Multi-probe LSH probes a superset of single-probe's buckets, so its
    recall@3 against exact top-3 can only improve."""
    from debezium_cdc_kafka_spark.operators.similarity import (
        ann_bruteforce_topk,
        ann_lsh_hyperplane,
        ann_lsh_multiprobe,
    )

    truth = {
        (r.query_id, r.cand_id)
        for r in ann_bruteforce_topk(spark, SF_SMOKE).filter("rk <= 3").collect()
    }
    single = {
        (r.query_id, r.cand_id) for r in ann_lsh_hyperplane(spark, SF_SMOKE).collect()
    }
    multi = {
        (r.query_id, r.cand_id) for r in ann_lsh_multiprobe(spark, SF_SMOKE).collect()
    }
    assert len(multi & truth) >= len(single & truth)
    # and multi-probe actually widens the candidate pool somewhere
    assert len(multi) >= len(single)


def test_stop_shingle_capping_drops_boilerplate_pairs(spark, tmp_path):
    """30 docs share a long boilerplate sentence; uncapped Jaccard pairs
    unrelated docs (boilerplate dominates), capped keeps only the true
    near-dup pair (same unique token)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from debezium_cdc_kafka_spark.operators.dedup import (
        dedup_ngram_jaccard,
        dedup_ngram_jaccard_capped,
    )

    boiler = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu nu"
    texts = [f"unique{i} {boiler}" for i in range(28)]
    texts += [f"sameword {boiler}", f"sameword {boiler}"]  # docs 28, 29: true dups
    tbl = pa.table({"doc_id": list(range(30)), "text": texts})
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    uncapped = {(r.d1, r.d2) for r in dedup_ngram_jaccard(spark, str(tmp_path)).collect()}
    capped = {(r.d1, r.d2) for r in dedup_ngram_jaccard_capped(spark, str(tmp_path)).collect()}
    # boilerplate makes nearly every pair look like a dup without capping
    assert len(uncapped) > 100
    # capping leaves exactly the genuine duplicate pair
    assert capped == {(28, 29)}


def test_mmr_rerank_greedy_invariants(spark):
    """MMR selection is a greedy chain: per query, exactly one pick per
    step 1..K, no candidate picked twice, step 1 is the raw-relevance
    argmax, and every later pick's score is penalized (score <= 0.7*sim
    of the best remaining candidate)."""
    from debezium_cdc_kafka_spark.operators.similarity import (
        _MMR_K,
        ann_mmr_rerank,
    )

    rows = ann_mmr_rerank(spark, SF_SMOKE).collect()
    assert rows
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, picks in by_q.items():
        steps = sorted(p.step for p in picks)
        assert steps == list(range(1, _MMR_K + 1)), qid
        assert len({p.vec_id for p in picks}) == len(picks), qid
        ordered = sorted(picks, key=lambda p: p.step)
        # step-1 score is pure relevance (0.7 * cosine), so it bounds all
        # later penalized scores from above
        assert all(ordered[0].mmr_score >= p.mmr_score - 1e-9 for p in ordered[1:]), qid
