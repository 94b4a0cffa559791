"""Behavioral tests for the triangle-count, span-dedup, unigram-LM, PQ,
C4-gate, and negative-sampling operators (their exactness is oracle-gated;
these pin the SEMANTICS on known inputs)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from debezium_cdc_kafka_spark.operators.curation import (
    q_c4_rule_gate,
    q_negative_samples,
)
from debezium_cdc_kafka_spark.operators.dedup import dedup_span_shingles
from debezium_cdc_kafka_spark.operators.graph import graph_triangle_count
from debezium_cdc_kafka_spark.operators.similarity import ann_pq_adc
from debezium_cdc_kafka_spark.operators.text import text_unigram_logprob
from tests.conftest import SF_SMOKE


def write_docs(tmp_path, texts):
    tbl = pa.table(
        {
            "doc_id": list(range(len(texts))),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["src0"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_triangle_count_known_graph(spark, tmp_path):
    """One K4 basket → every member sits in C(3,2)=3 triangles; a 2-item
    basket contributes no triangle and its parts don't appear."""
    rows = [(100, p) for p in (1, 2, 3, 4)] + [(200, 5), (200, 6)]
    tbl = pa.table(
        {
            "l_orderkey": [r[0] for r in rows],
            "l_partkey": [r[1] for r in rows],
        }
    )
    pq.write_table(tbl, str(tmp_path / "lineitem.parquet"))
    got = {
        r.p_partkey: r.n_triangles
        for r in graph_triangle_count(spark, str(tmp_path)).collect()
    }
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_span_dedup_flags_shared_boilerplate(spark, tmp_path):
    """Docs 0 and 1 share a verbatim 10-token run (→ three shared 8-token
    windows each); doc 2 is unrelated; doc 3 is too short to window."""
    run = "one two three four five six seven eight nine ten"
    sf = write_docs(
        tmp_path,
        [
            f"intro {run} tail0 tailx",
            f"other {run} tail1 taily",
            "a completely different document with enough words to window over",
            "too short",
        ],
    )
    got = {r.doc_id: r for r in dedup_span_shingles(spark, sf).collect()}
    assert got[0].n_dup_spans == 3 and got[1].n_dup_spans == 3
    assert got[2].n_dup_spans == 0
    assert 3 not in got  # < 8 tokens → no windows → absent
    assert got[0].dup_span_ratio == pytest.approx(3 / got[0].n_spans)


def test_unigram_logprob_ranks_common_words_first(spark, tmp_path):
    """A doc of corpus-frequent words must land in a better (lower)
    quality decile than a doc of hapax tokens."""
    common = "spark row table " * 20
    sf = write_docs(
        tmp_path,
        [common.strip()] * 9 + ["zxqv wploc vvnrt qqaze mmjuy kkbro"],
    )
    rows = {r.doc_id: r for r in text_unigram_logprob(spark, sf).collect()}
    assert rows[0].quality_decile < rows[9].quality_decile
    assert rows[9].avg_logprob < rows[0].avg_logprob


def test_pq_adc_recall_against_exact_l2(spark):
    """PQ is lossy but must stay close: per-query top-10 by ADC distance
    should recover most of the exact-L2 top-10 on the smoke corpus."""
    from pyspark.sql.window import Window as W

    pq_top = ann_pq_adc(spark, SF_SMOKE)
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("e1")
    )
    c = emb.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("e2"))
    d2 = F.aggregate(
        F.zip_with(
            F.transform("e1", lambda x: x.cast("double")),
            F.transform("e2", lambda x: x.cast("double")),
            lambda x, y: (x - y) * (x - y),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    w = W.partitionBy("query_id").orderBy("d2", "cand_id")
    exact = (
        F.broadcast(q)
        .join(c, F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id", d2.alias("d2"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
    )
    truth = {(r.query_id, r.cand_id) for r in exact.collect()}
    got = {(r.query_id, r.cand_id) for r in pq_top.collect()}
    recall = len(got & truth) / len(truth)
    assert recall >= 0.5, f"PQ recall degraded: {recall}"


def test_c4_gate_rules_fire_individually(spark, tmp_path):
    sf = write_docs(
        tmp_path,
        [
            "a perfectly ordinary sentence with enough words here",
            "short one",                       # < 5 words
            "this has lorem ipsum filler text inside it",
            "code block { return x } with braces in the text",
            "contains the toolongtokenaaaaaaaaaaaaaaaaaaaaaaa word here five",
            "dots . . . . . everywhere . . . . making . ratio . high .",
        ],
    )
    rows = {r.doc_id: r for r in q_c4_rule_gate(spark, sf).collect()}
    assert rows[0].keep == 1
    assert rows[1].r_min_words == 0 and rows[1].keep == 0
    assert rows[2].r_lorem == 0 and rows[2].keep == 0
    assert rows[3].r_brace == 0 and rows[3].keep == 0
    assert rows[4].r_word_len == 0 and rows[4].keep == 0
    assert rows[5].r_dot_ratio == 0 and rows[5].keep == 0


def test_negative_samples_cross_label_and_deterministic(spark):
    out1 = q_negative_samples(spark, SF_SMOKE)
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        F.col("vec_id").alias("anchor_id"), F.col("label").alias("a_label")
    )
    joined = out1.join(emb, "anchor_id").collect()
    assert len(joined) > 0
    for r in joined:
        assert r.neg_label != r.a_label
        assert 1 <= r.rk <= 4
    # reproducible draw: second run identical
    again = {
        (r.anchor_id, r.rk): r.negative_id
        for r in q_negative_samples(spark, SF_SMOKE).collect()
    }
    first = {(r.anchor_id, r.rk): r.negative_id for r in joined}
    assert first == again


def test_jl_projection_preserves_pairwise_distances(spark):
    """JL with 16 Rademacher dims: squared distances between projected
    pairs should straddle the originals (mean ratio near 1, no collapse)."""
    from debezium_cdc_kafka_spark.operators.similarity import q_jl_projection

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )
    jl = q_jl_projection(spark, SF_SMOKE)
    both = emb.join(jl, "vec_id").filter(F.col("vec_id") < 40)
    rows = both.collect()
    ratios = []
    for i in range(0, len(rows) - 1, 2):
        a, b = rows[i], rows[i + 1]
        d_orig = sum((x - y) ** 2 for x, y in zip(a.e, b.e))
        # jl_vec is a ','-joined micro-int string (driver-canonicalizer
        # hashability); decode back to doubles for the distance check.
        av = [int(t) / 1e6 for t in a.jl_vec.split(",")]
        bv = [int(t) / 1e6 for t in b.jl_vec.split(",")]
        d_proj = sum((x - y) ** 2 for x, y in zip(av, bv))
        if d_orig > 0:
            ratios.append(d_proj / d_orig)
    mean = sum(ratios) / len(ratios)
    assert 0.7 <= mean <= 1.3, f"JL mean distortion off: {mean}"
    assert all(0.2 <= r <= 2.5 for r in ratios), f"JL pair collapsed: {ratios}"


def test_tx_consistent_state_quarantines_partial_and_poisoned(spark, tmp_path):
    """24 events = 3 txs of 8. Tx 0 is clean -> applied. Tx 1 contains the
    malformed event_id 13 -> whole tx quarantined (its users keep tx-0
    state or stay absent). Tx 2 is short one event -> not applied."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from debezium_cdc_kafka_spark.operators.cdc import cdc_tx_consistent_state

    base = dt.datetime(2024, 1, 1)
    rows = []
    for eid in range(23):  # 23 events: tx2 has only 7 of 8
        rows.append(
            (
                eid,
                base + dt.timedelta(minutes=eid),
                100 + eid % 4,
                "signup" if eid % 8 == 0 else "purchase",
                float(eid),
                "{}",
            )
        )
    tbl = pa.table(
        {
            "event_id": [r[0] for r in rows],
            "ts": pa.array([r[1] for r in rows], pa.timestamp("ns")),
            "user_id": [r[2] for r in rows],
            "event_type": [r[3] for r in rows],
            "value": [r[4] for r in rows],
            "props": [r[5] for r in rows],
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    got = {r.id: r.value for r in cdc_tx_consistent_state(spark, str(tmp_path)).collect()}
    # only tx 0 (events 0-7) applies: last value per user among events 0-7
    assert got == {100: 4.0, 101: 5.0, 102: 6.0, 103: 7.0}


def test_dsir_weights_rank_target_slice_higher(spark):
    """DSIR with target = the English slice must, on average, score
    English documents above non-English ones — that is the entire point
    of importance resampling (hashed unigram features of the target
    distribution get positive log-ratios)."""
    from debezium_cdc_kafka_spark.catalog import load_table
    from debezium_cdc_kafka_spark.operators.curation import q_dsir_weights

    scores = q_dsir_weights(spark, SF_SMOKE)
    langs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "lang")
    by_lang = (
        scores.join(langs, "doc_id")
        .groupBy(F.col("lang") == "en")
        .agg(F.avg("dsir_score").alias("m"))
        .collect()
    )
    means = {r[0]: r.m for r in by_lang}
    assert means[True] > means[False]


def test_label_centroid_outliers_flag_farthest_decile(spark):
    """Per label: ~10% flagged (percent_rank >= 0.9), flagged distances
    strictly dominate unflagged ones."""
    from debezium_cdc_kafka_spark.operators.similarity import (
        q_label_centroid_outliers,
    )

    out = q_label_centroid_outliers(spark, SF_SMOKE)
    per = (
        out.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("is_outlier").alias("k"),
            F.min(F.when(F.col("is_outlier") == 1, F.col("d2_centroid"))).alias(
                "min_out"
            ),
            F.max(F.when(F.col("is_outlier") == 0, F.col("d2_centroid"))).alias(
                "max_in"
            ),
        )
        .collect()
    )
    for r in per:
        assert 0 < r.k <= max(1, round(0.11 * r.n) + 1)
        assert r.min_out >= r.max_in


def test_quality_classifier_scores_calibrated_and_monotone(spark, tmp_path):
    """Pure-punctuation noise scores below plain stopword-rich prose;
    all scores live in (0, 1) and keep == (score >= 0.5)."""
    from debezium_cdc_kafka_spark.operators.text import text_quality_classifier

    sf = write_docs(
        tmp_path,
        [
            "the cat sat on the mat and the dog slept in the sun for a while",
            "%%% !!! ### $$$ ^^^ &&& *** ((( ))) @@@ ~~~ ??? ;;; :::",
        ],
    )
    rows = {r.doc_id: r for r in text_quality_classifier(spark, sf).collect()}
    assert 0.0 < rows[0].quality_score < 1.0
    assert rows[0].quality_score > rows[1].quality_score
    for r in rows.values():
        assert r.keep == int(r.quality_score >= 0.5)


def test_balanced_classes_equalizes_label_counts(spark):
    """Every label's kept count equals the minority-class size."""
    from debezium_cdc_kafka_spark.operators.curation import q_balanced_classes

    out = q_balanced_classes(spark, SF_SMOKE)
    counts = [r.n for r in out.groupBy("label").agg(F.count(F.lit(1)).alias("n")).collect()]
    assert len(set(counts)) == 1


def test_tfidf_doc_similarity_bounds_and_symmetry_free(spark):
    """Cosines lie in [tau, 1+eps] and each unordered pair appears once
    (d1 < d2 canonical form)."""
    from debezium_cdc_kafka_spark.operators.text import text_tfidf_doc_similarity

    rows = text_tfidf_doc_similarity(spark, SF_SMOKE).collect()
    assert rows, "sf0.001 corpus should contain near-identical rewrites"
    seen = set()
    for r in rows:
        assert r.d1 < r.d2
        assert 0.3 <= r.cosine <= 1.001
        assert (r.d1, r.d2) not in seen
        seen.add((r.d1, r.d2))


def test_pca_projection_variance_ordering(spark):
    import numpy as np

    from debezium_cdc_kafka_spark.catalog import load_table
    from debezium_cdc_kafka_spark.operators.similarity import q_pca_top2_project

    rows = q_pca_top2_project(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    pc1 = np.array([r.pc1 for r in rows])
    pc2 = np.array([r.pc2 for r in rows])
    # leading component captures at least as much variance as the second,
    # and both capture more than a typical raw coordinate
    assert pc1.var() >= pc2.var() > 0
    raw = np.stack(
        [
            np.array(r.embedding, dtype=float)
            for r in load_table(spark, SF_SMOKE, "embeddings").collect()
        ]
    )
    assert pc1.var() >= raw.var(axis=0).max() * 0.99
    # projections are deterministic across re-runs (literal eigenvectors)
    again = q_pca_top2_project(spark, SF_SMOKE).collect()
    assert sorted((r.vec_id, r.pc1, r.pc2) for r in again) == sorted(
        (r.vec_id, r.pc1, r.pc2) for r in rows
    )
