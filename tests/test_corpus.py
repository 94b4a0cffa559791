"""Behavioral tests for the corpus-composition operators (BPE pair
mining, Heaps' law, source-mix entropy) and the sweep-line concurrency
operator — exactness is oracle-gated; these pin semantics."""

from __future__ import annotations

import datetime as dt
import math

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from debezium_cdc_kafka_spark.operators.behavior import q_max_concurrent_sessions
from debezium_cdc_kafka_spark.operators.corpus import (
    q_heaps_law,
    q_source_mix_entropy,
    text_bpe_pair_counts,
)


def write_docs(tmp_path, texts, sources=None):
    tbl = pa.table(
        {
            "doc_id": list(range(len(texts))),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": sources or ["src0"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_bpe_pairs_weighted_by_word_frequency(spark, tmp_path):
    """'aa' appears in a word used 3 times -> pair (a,a) counts 3; the
    rank-1 pair is the corpus-weighted most frequent adjacency."""
    sf = write_docs(tmp_path, ["aab aab aab xy"])
    rows = {(r.c1, r.c2): r for r in text_bpe_pair_counts(spark, str(sf)).collect()}
    assert rows[("a", "a")].pair_count == 3
    assert rows[("a", "b")].pair_count == 3
    assert rows[("x", "y")].pair_count == 1
    assert rows[("a", "a")].rk == 1  # count ties broken by (c1, c2)


def test_heaps_beta_separates_template_from_id_noise(spark, tmp_path):
    """A source of one repeated word has vocab 1 (beta = 0); a source of
    all-distinct tokens has vocab = N (beta = 1)."""
    sf = write_docs(
        tmp_path,
        ["word " * 64, " ".join(f"id{i}" for i in range(64))],
        sources=["template", "ids"],
    )
    rows = {r.source: r for r in q_heaps_law(spark, str(sf)).collect()}
    assert rows["template"].vocab == 1 and rows["template"].heaps_beta == 0.0
    assert rows["ids"].vocab == 64 and rows["ids"].heaps_beta == 1.0


def test_mix_entropy_equal_sources(spark, tmp_path):
    """Two equal-token sources -> entropy ln 2, effective sources 2.0."""
    sf = write_docs(
        tmp_path, ["tok " * 50, "tok " * 50], sources=["a", "b"]
    )
    rows = q_source_mix_entropy(spark, str(sf)).collect()
    for r in rows:
        assert r.token_share == pytest.approx(0.5)
        assert r.mix_entropy == pytest.approx(math.log(2), abs=1e-5)
        assert r.effective_sources == pytest.approx(2.0, abs=1e-3)


def _write_events(tmp_path, rows):
    tbl = pa.table(
        {
            "event_id": [r[0] for r in rows],
            "ts": pa.array([r[1] for r in rows], pa.timestamp("ns")),
            "user_id": [r[2] for r in rows],
            "event_type": ["view"] * len(rows),
            "value": [1.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_max_concurrency_counts_overlaps_not_handoffs(spark, tmp_path):
    """Three users online at 10:00-10:05(+60s tail) -> peak 3. A user
    whose session starts exactly when another's ends (handoff) doesn't
    raise the peak. A lone session on day 2 -> peak 1."""
    t = lambda h, m, s=0: dt.datetime(2024, 1, 1, h, m, s)
    rows = [
        (1, t(10, 0), 101), (2, t(10, 5), 101),   # u101: 10:00-10:06
        (3, t(10, 2), 102),                        # u102: 10:02-10:03
        (4, t(10, 2, 30), 103),                    # u103: 10:02:30-10:03:30
        (5, t(10, 6), 104),                        # u104 starts at u101's end
        (6, dt.datetime(2024, 1, 2, 9, 0), 105),   # day 2, alone
    ]
    sf = _write_events(tmp_path, rows)
    got = {
        str(r.day): r.max_concurrent
        for r in q_max_concurrent_sessions(spark, sf).collect()
    }
    assert got == {"2024-01-01": 3, "2024-01-02": 1}
