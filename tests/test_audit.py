"""Behavioral tests for the audit operators (k-anonymity, erasure
cascade, Benford screen, DP noisy counts) and the bigram LM — exactness
is oracle-gated; these pin semantics on constructed inputs."""

from __future__ import annotations

import math

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from debezium_cdc_kafka_spark.operators.audit import (
    q_benford_price,
    q_cascade_delete,
    q_dp_noisy_counts,
    q_k_anonymity,
)
from debezium_cdc_kafka_spark.operators.text import text_bigram_logprob
from tests.conftest import SF_SMOKE


def test_k_anonymity_flags_small_groups(spark, tmp_path):
    """4 identical QI rows -> not anonymous at k=5; a 5th makes it so."""
    rows = [(i, f"c{i}", 1, 500.0, "AUTO") for i in range(4)]
    rows += [(10 + i, f"d{i}", 2, 1500.0, "BIKE") for i in range(5)]
    tbl = pa.table(
        {
            "c_custkey": [r[0] for r in rows],
            "c_name": [r[1] for r in rows],
            "c_nationkey": pa.array([r[2] for r in rows], pa.int32()),
            "c_acctbal": [r[3] for r in rows],
            "c_mktsegment": [r[4] for r in rows],
        }
    )
    pq.write_table(tbl, str(tmp_path / "customer.parquet"))
    got = {
        (r.c_nationkey, r.c_mktsegment, r.bal_band): (r.group_n, r.k_anonymous)
        for r in q_k_anonymity(spark, str(tmp_path)).collect()
    }
    assert got[(1, "AUTO", 0)] == (4, 0)
    assert got[(2, "BIKE", 1)] == (5, 1)


def test_cascade_delete_counts_dependents(spark, tmp_path):
    """custkey 97 (in the forget set) has 2 orders with 3 lineitems total;
    custkey 194 has none; custkey 1 is not in the forget set."""
    pq.write_table(
        pa.table(
            {
                "c_custkey": [1, 97, 194],
                "c_name": ["a", "b", "c"],
                "c_nationkey": pa.array([0, 0, 0], pa.int32()),
                "c_acctbal": [0.0, 0.0, 0.0],
                "c_mktsegment": ["AUTO"] * 3,
            }
        ),
        str(tmp_path / "customer.parquet"),
    )
    pq.write_table(
        pa.table({"o_orderkey": [10, 11, 12], "o_custkey": [97, 97, 1]}),
        str(tmp_path / "orders.parquet"),
    )
    pq.write_table(
        pa.table({"l_orderkey": [10, 10, 11, 12]}),
        str(tmp_path / "lineitem.parquet"),
    )
    got = {
        r.c_custkey: (r.n_orders, r.n_lineitems, r.total_rows_to_purge)
        for r in q_cascade_delete(spark, str(tmp_path)).collect()
    }
    assert got == {97: (2, 3, 6), 194: (0, 0, 1)}


def test_benford_digits_and_shares(spark, tmp_path):
    """Digit extraction is decimal-string based: 9.99 -> 9, 1000.0 -> 1;
    shares sum to 1 and the Benford column matches log10(1+1/d)."""
    prices = [9.99, 1000.0, 123.45, 0.02, 1.0, 85.0]
    pq.write_table(
        pa.table({"l_extendedprice": prices}), str(tmp_path / "lineitem.parquet")
    )
    rows = {r.first_digit: r for r in q_benford_price(spark, str(tmp_path)).collect()}
    assert rows[9].n == 1 and rows[1].n == 3 and rows[2].n == 1 and rows[8].n == 1
    assert sum(r.observed_share for r in rows.values()) == pytest.approx(1.0, abs=1e-5)
    for d, r in rows.items():
        assert r.benford_share == pytest.approx(math.log10(1 + 1 / d), abs=1e-6)


def test_dp_noisy_counts_bounded_and_deterministic(spark):
    out = {r.c_nationkey: r for r in q_dp_noisy_counts(spark, SF_SMOKE).collect()}
    again = {r.c_nationkey: r for r in q_dp_noisy_counts(spark, SF_SMOKE).collect()}
    assert {k: v.noisy_n for k, v in out.items()} == {
        k: v.noisy_n for k, v in again.items()
    }
    for r in out.values():
        # Laplace(1/eps=1) noise from u in (-.5,.5): |noise| = |ln(1-2|u|)|,
        # bounded by ln(1e6) ≈ 13.8 at the extreme hash values
        assert abs(r.noisy_n - r.exact_n) <= 14.0
    # noise actually perturbs (not all zero)
    assert any(r.noisy_n != r.exact_n for r in out.values())


def test_bigram_lm_penalizes_shuffled_word_salad(spark, tmp_path):
    """Same vocabulary, scrambled transitions: the salad doc must rank in
    a worse decile than the repeated natural sentence."""
    sent = "the cat sat on the mat "
    salad = "mat the on cat the sat "
    texts = [sent * 10] * 9 + [(salad * 10)]
    tbl = pa.table(
        {
            "doc_id": list(range(len(texts))),
            "text": [t.strip() for t in texts],
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    rows = {r.doc_id: r for r in text_bigram_logprob(spark, str(tmp_path)).collect()}
    assert rows[9].avg_logprob < rows[0].avg_logprob
    assert rows[0].quality_decile < rows[9].quality_decile
    # single-token docs are absent by construction
    assert rows[0].n_bigrams == len(sent.split()) * 10 - 1
