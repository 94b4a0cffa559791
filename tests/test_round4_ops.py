"""Property tests for the round-4 additions: exact-substring span dedup,
containment dedup, mutual k-NN graph. The DuckDB oracles pin cross-engine
equality; these tests pin the SEMANTICS against independent Python
reimplementations and structural invariants.
"""

from __future__ import annotations

from collections import Counter

import pyarrow.parquet as pq

from debezium_cdc_kafka_spark.operators.dedup import (
    _SUB_N,
    dedup_exact_substring,
    q_minhash_containment,
)
from debezium_cdc_kafka_spark.operators.similarity import _KNNG_K, q_knn_graph
from tests.conftest import SF_SMOKE


def _docs():
    t = pq.read_table(f"{SF_SMOKE}/documents.parquet")
    return dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))


def _expected_spans():
    """Independent reimplementation: 5-gram occurrence counts over the
    corpus, flag positions whose gram occurs >= 2 times anywhere, merge
    consecutive flagged positions into maximal islands."""
    docs = _docs()
    grams: dict[int, list[str]] = {}
    counts: Counter[str] = Counter()
    for d, text in docs.items():
        tk = [t for t in text.split(" ") if t != ""]
        gs = [" ".join(tk[i : i + _SUB_N]) for i in range(len(tk) - _SUB_N + 1)]
        grams[d] = gs
        counts.update(gs)
    spans = set()
    for d, gs in grams.items():
        flagged = [i + 1 for i, g in enumerate(gs) if counts[g] >= 2]
        run_start = None
        prev = None
        for p in flagged + [None]:
            if run_start is not None and (p is None or p != prev + 1):
                spans.add((d, run_start, prev - run_start + _SUB_N))
                run_start = None
            if p is not None and run_start is None:
                run_start = p
            prev = p
    return spans


def test_exact_substring_matches_python_reimplementation(spark):
    got = {
        (r.doc_id, r.span_start, r.span_tokens)
        for r in dedup_exact_substring(spark, SF_SMOKE).collect()
    }
    assert got == _expected_spans()
    assert got, "smoke corpus should contain duplicated 5-gram runs"


def test_containment_planted_halves_are_found(spark):
    rows = q_minhash_containment(spark, SF_SMOKE).collect()
    for r in rows:
        # threshold respected, exact-integer form
        assert r.common * 10 >= min(r.n1, r.n2) * 8
        assert 0.0 < r.containment <= 1.0
    # every planted pair (d, d+10^7) shares all the half's shingles except
    # at most those cut at the truncation boundary -> containment ~1, so a
    # healthy majority of docs must surface their own half as a pair.
    planted = {(r.d1, r.d2) for r in rows if r.d2 == r.d1 + 10000000}
    n_docs = len(_docs())
    assert len(planted) >= n_docs // 2


def test_knn_graph_structural_invariants(spark):
    rows = q_knn_graph(spark, SF_SMOKE).collect()
    pairs = [(r.v1, r.v2) for r in rows]
    assert len(pairs) == len(set(pairs)), "duplicate edges"
    assert all(v1 < v2 for v1, v2 in pairs), "edges must be canonical v1<v2"
    deg: Counter[int] = Counter()
    for v1, v2 in pairs:
        deg[v1] += 1
        deg[v2] += 1
    # mutual-kNN degree is bounded by k on both endpoints
    assert max(deg.values()) <= _KNNG_K
    assert all(-1.0 <= r.cosine <= 1.0 for r in rows)
