"""Independent Python recomputes for r6 driver-window queries whose only
pytest reference was an invariant/bounds check (VERDICT r5 item 5).

Same discipline as test_r5_window_ops.py / test_round4*_ops.py: read the
raw parquet, recompute the definition in plain Python, compare at the
published rounding — a third engine beside Spark and DuckDB, so a shared
misreading of the SQL cannot pass silently. Priority per the verdict: the
similarity-eval family (recall/health/matryoshka) and the corpus family
(novelty/gini/fertility), plus the window's weakest-covered stragglers
(feature hashing, containment, SAX, QI generalization, audio chunks).
"""

from __future__ import annotations

import hashlib
import math
import re
import statistics
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from tests.conftest import SF_SMOKE

TOKEN_SPLIT_RE = "[^a-z0-9]+"


def _read(table: str) -> list[dict]:
    return pq.read_table(f"{SF_SMOKE}/{table}.parquet").to_pylist()


def _md5_long(s: str) -> int:
    """First 60 bits of md5 as non-negative int (functions/hashing.py)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _tokens(text: str) -> list[str]:
    return [t for t in re.split(TOKEN_SPLIT_RE, text.lower()) if t != ""]


def _shingles(toks: list[str], n: int = 3) -> list[str]:
    """Distinct word n-grams, first-occurrence order (textfns.shingles)."""
    out, seen = [], set()
    for i in range(len(toks) - n + 1):
        g = " ".join(toks[i : i + n])
        if g not in seen:
            seen.add(g)
            out.append(g)
    return out


def _dot(a: list[float], b: list[float]) -> float:
    """Sequential left-to-right fold — same IEEE order as dot_expr /
    DuckDB list_sum, so values are bit-identical, not just close."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def _cos(a: list[float], b: list[float]) -> float:
    return _dot(a, b) / math.sqrt(_dot(a, a) * _dot(b, b))


def _embs() -> dict[int, list[float]]:
    return {r["vec_id"]: [float(x) for x in r["embedding"]] for r in _read("embeddings")}


# ---------------------------------------------------------------------------
# similarity evals
# ---------------------------------------------------------------------------


def _lsh_buckets(embs: dict[int, list[float]]) -> dict[int, int]:
    """8 md5-seeded hyperplanes → 8-bit sign bucket (similarity.py)."""
    planes = [
        [((_md5_long(f"{p}:{d}") % 2001) - 1000) / 1000.0 for d in range(1, 65)]
        for p in range(8)
    ]
    return {
        v: sum(1 << p for p in range(8) if _dot(planes[p], e) > 0)
        for v, e in embs.items()
    }


def _topk(embs, qid, cands, k, dims=None):
    """Exact top-k by cosine desc, cand_id asc tiebreak."""
    q = embs[qid] if dims is None else embs[qid][:dims]
    scored = [
        (-_cos(q, embs[c] if dims is None else embs[c][:dims]), c)
        for c in cands
        if c != qid
    ]
    scored.sort()
    return [c for _, c in scored[:k]]


def test_ann_recall_eval_matches_python_retrieval(spark):
    """Recall@3 of the LSH index vs exact top-3, with BOTH retrievals
    recomputed from parquet (brute-force cosine ranking + the 8-plane
    bucket census), not just bounds-checked."""
    from debezium_cdc_kafka_spark.operators.similarity import ann_recall_eval

    embs = _embs()
    buckets = _lsh_buckets(embs)
    queries = [v for v in embs if v % 100 == 0]
    expected = {}
    for qid in queries:
        bf3 = set(_topk(embs, qid, embs.keys(), 3))
        same = [c for c in embs if buckets[c] == buckets[qid]]
        lsh3 = set(_topk(embs, qid, same, 3))
        expected[qid] = len(bf3 & lsh3)

    rows = {r["query_id"]: r for r in ann_recall_eval(spark, SF_SMOKE).collect()}
    assert set(rows) == set(expected)
    macro = sum(expected.values()) / (3.0 * len(expected))
    for qid, n_hits in expected.items():
        r = rows[qid]
        assert r["n_hits"] == n_hits
        assert abs(r["recall_at_3"] - n_hits / 3.0) <= 5.1e-7
        assert abs(r["macro_recall"] - macro) <= 5.1e-7


def test_embedding_health_matches_python_census(spark):
    """Per-label norm median / MAD / 3-MAD outliers / class weights from a
    plain statistics.median recompute over the raw vectors."""
    from debezium_cdc_kafka_spark.operators.similarity import q_embedding_health

    embs = _embs()
    labels = {r["vec_id"]: r["label"] for r in _read("embeddings")}
    by_label: dict[int, list[float]] = defaultdict(list)
    for v, e in embs.items():
        by_label[labels[v]].append(math.sqrt(_dot(e, e)))
    n_total, k = len(embs), len(by_label)

    rows = {r["label"]: r for r in q_embedding_health(spark, SF_SMOKE).collect()}
    assert set(rows) == set(by_label)
    for lab, norms in by_label.items():
        med = statistics.median(norms)
        adevs = [abs(x - med) for x in norms]
        mad = statistics.median(adevs)
        r = rows[lab]
        assert r["n_vecs"] == len(norms)
        assert abs(r["class_weight"] - n_total / (k * len(norms))) <= 5.1e-7
        assert abs(r["median_norm"] - med) <= 5.1e-7
        assert abs(r["mad_norm"] - mad) <= 5.1e-7
        assert r["n_norm_outliers"] == sum(1 for a in adevs if a > 3 * mad)


def test_matryoshka_recall_matches_python_retrieval(spark):
    """Full-64d top-5 vs first-16d top-5 overlap, both rankings recomputed
    in Python with the same cosine fold and tiebreak."""
    from debezium_cdc_kafka_spark.operators.similarity import (
        _MAT_DIM,
        q_matryoshka_recall,
    )

    embs = _embs()
    queries = [v for v in embs if v % 100 == 0]
    expected = {
        qid: len(
            set(_topk(embs, qid, embs.keys(), 5))
            & set(_topk(embs, qid, embs.keys(), 5, dims=_MAT_DIM))
        )
        for qid in queries
    }

    rows = {r["query_id"]: r for r in q_matryoshka_recall(spark, SF_SMOKE).collect()}
    assert set(rows) == set(expected)
    macro = sum(expected.values()) / (5.0 * len(expected))
    for qid, n in expected.items():
        r = rows[qid]
        assert r["n_overlap"] == n
        assert abs(r["overlap_at_5"] - n / 5.0) <= 5.1e-7
        assert abs(r["macro_overlap"] - macro) <= 5.1e-7


# ---------------------------------------------------------------------------
# corpus
# ---------------------------------------------------------------------------


def test_ngram_novelty_matches_python_first_occurrence(spark):
    """First-occurrence 3-gram census over ingest order, full recompute
    (the prior test only pinned bounds and the first document)."""
    from debezium_cdc_kafka_spark.operators.corpus import q_ngram_novelty

    grams_by_doc = {
        d["doc_id"]: _shingles(_tokens(d["text"])) for d in _read("documents")
    }
    first: dict[str, int] = {}
    for doc_id in sorted(grams_by_doc):
        for g in grams_by_doc[doc_id]:
            if g not in first or doc_id < first[g]:
                first[g] = doc_id
    expected = {
        doc_id: (len(gs), sum(1 for g in gs if first[g] == doc_id))
        for doc_id, gs in grams_by_doc.items()
        if gs
    }

    rows = {r["doc_id"]: r for r in q_ngram_novelty(spark, SF_SMOKE).collect()}
    assert set(rows) == set(expected)
    for doc_id, (n_grams, n_novel) in expected.items():
        r = rows[doc_id]
        assert (r["n_grams"], r["n_novel"]) == (n_grams, n_novel)
        assert abs(r["novelty"] - n_novel / n_grams) <= 5.1e-7


def test_gini_source_tokens_matches_rank_formula(spark):
    """G = (2·Σ i·x_i − (n+1)·Σx) / (n·Σx) over ascending (toks, source)."""
    from debezium_cdc_kafka_spark.operators.corpus import q_gini_source_tokens

    per_source: Counter[str] = Counter()
    for d in _read("documents"):
        per_source[d["source"]] += len(_tokens(d["text"]))
    ranked = sorted(per_source.items(), key=lambda kv: (kv[1], kv[0]))
    n = len(ranked)
    tot = sum(x for _, x in ranked)
    gini = (
        2.0 * sum(i * float(x) for i, (_, x) in enumerate(ranked, start=1))
        - (n + 1.0) * tot
    ) / (n * tot)

    [r] = q_gini_source_tokens(spark, SF_SMOKE).collect()
    assert r["n_sources"] == n
    assert r["total_tokens"] == tot
    assert abs(r["gini"] - gini) <= 5.1e-7


def test_tokenizer_fertility_matches_python_sums(spark):
    """Per-lang token/word/char sums and their ratio-of-sums metrics."""
    from debezium_cdc_kafka_spark.operators.corpus import q_tokenizer_fertility

    agg: dict[str, list[int]] = defaultdict(lambda: [0, 0, 0, 0])
    for d in _read("documents"):
        a = agg[d["lang"]]
        a[0] += 1
        a[1] += len([w for w in d["text"].split(" ") if w != ""])
        a[2] += len(_tokens(d["text"]))
        a[3] += len(d["text"])

    rows = {r["lang"]: r for r in q_tokenizer_fertility(spark, SF_SMOKE).collect()}
    assert set(rows) == set(agg)
    for lang, (n_docs, words, toks, chars) in agg.items():
        r = rows[lang]
        assert (r["n_docs"], r["total_words"], r["total_tokens"], r["total_chars"]) == (
            n_docs,
            words,
            toks,
            chars,
        )
        assert abs(r["fertility"] - toks / words) <= 5.1e-7
        assert abs(r["chars_per_token"] - chars / toks) <= 5.1e-7


# ---------------------------------------------------------------------------
# text / dedup
# ---------------------------------------------------------------------------


def test_feature_hashing_matches_python_buckets(spark):
    """Exact (doc, dim, tf) set: every token hashed with md5_long % 32."""
    from debezium_cdc_kafka_spark.operators.text import _FH_DIMS, q_feature_hashing

    expected: Counter[tuple[int, int]] = Counter()
    for d in _read("documents"):
        for t in _tokens(d["text"]):
            expected[(d["doc_id"], _md5_long(t) % _FH_DIMS)] += 1

    got = {
        (r["doc_id"], r["dim"]): r["tf"]
        for r in q_feature_hashing(spark, SF_SMOKE).collect()
    }
    assert got == dict(expected)


def test_minhash_containment_matches_python_inverted_index(spark):
    """Containment over docs ∪ planted front halves, recomputed with a
    plain dict inverted index: hot-shingle cap, exact-integer threshold,
    and the containment value itself (the prior test only checked that
    planted halves are found)."""
    from debezium_cdc_kafka_spark.operators.dedup import q_minhash_containment

    docs = _read("documents")
    corpus = {d["doc_id"]: d["text"] for d in docs}
    for d in docs:
        corpus[d["doc_id"] + 10000000] = d["text"][: (d["n_chars"] + 1) // 2]

    shs = {doc: set(_shingles(_tokens(t))) for doc, t in corpus.items()}
    df: Counter[str] = Counter()
    for s in shs.values():
        df.update(s)
    n_docs = len(corpus)
    hot = {g for g, c in df.items() if c * 20 > n_docs and c > 5}
    capped = {doc: s - hot for doc, s in shs.items()}

    posting: dict[str, list[int]] = defaultdict(list)
    for doc, s in capped.items():
        for g in s:
            posting[g].append(doc)
    common: Counter[tuple[int, int]] = Counter()
    for g, ds in posting.items():
        ds.sort()
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                common[(ds[i], ds[j])] += 1
    expected = {}
    for (d1, d2), c in common.items():
        least = min(len(capped[d1]), len(capped[d2]))
        if c * 10 >= least * 8:
            expected[(d1, d2)] = (len(capped[d1]), len(capped[d2]), c, c / least)

    rows = {
        (r["d1"], r["d2"]): r for r in q_minhash_containment(spark, SF_SMOKE).collect()
    }
    assert set(rows) == set(expected)
    for key, (n1, n2, c, cont) in expected.items():
        r = rows[key]
        assert (r["n1"], r["n2"], r["common"]) == (n1, n2, c)
        assert abs(r["containment"] - cont) <= 5.1e-5


# ---------------------------------------------------------------------------
# timeseries / audit / multimodal
# ---------------------------------------------------------------------------


def test_sax_symbolize_matches_python_words(spark):
    """Full SAX recompute: PAA cells, global z-normalization, Gaussian
    breakpoints, per-day word AND z_sum (the prior test only checked word
    shape)."""
    from debezium_cdc_kafka_spark.operators.timeseries import q_sax_symbolize

    cells: Counter[tuple] = Counter()
    for e in _read("events"):
        cells[(e["ts"].date(), e["ts"].hour // 6)] += 1
    vals = [float(c) for c in cells.values()]
    mu = sum(vals) / len(vals)
    sd = statistics.stdev(vals)

    def letter(c: float) -> str:
        z = (c - mu) / sd
        return "a" if z < -0.6745 else "b" if z < 0 else "c" if z < 0.6745 else "d"

    by_day: dict = defaultdict(dict)
    for (d, seg), c in cells.items():
        by_day[d][seg] = float(c)
    expected = {
        d: (
            "".join(letter(segs[s]) for s in sorted(segs)),
            (sum(segs.values()) - len(segs) * mu) / sd,
        )
        for d, segs in by_day.items()
    }

    rows = {r["d"]: r for r in q_sax_symbolize(spark, SF_SMOKE).collect()}
    assert set(rows) == set(expected)
    for d, (word, z_sum) in expected.items():
        assert rows[d]["sax_word"] == word
        assert abs(rows[d]["z_sum"] - z_sum) <= 5.1e-7


def test_qi_generalize_matches_python_recount(spark):
    """Generalization recount: small classes coarsened to band −1, exact
    group sizes and k-anonymous flags (the prior test only checked that
    small classes get absorbed)."""
    from debezium_cdc_kafka_spark.operators.audit import _K_ANON, q_qi_generalize

    cust = _read("customer")
    qi = [
        (c["c_nationkey"], c["c_mktsegment"], math.floor(c["c_acctbal"] / 1000))
        for c in cust
    ]
    class_n = Counter(qi)
    gen: Counter[tuple] = Counter()
    for nat, seg, band in qi:
        gen[(nat, seg, band if class_n[(nat, seg, band)] >= _K_ANON else -1)] += 1

    rows = {
        (r["c_nationkey"], r["c_mktsegment"], r["band_gen"]): r
        for r in q_qi_generalize(spark, SF_SMOKE).collect()
    }
    assert set(rows) == set(gen)
    for key, n in gen.items():
        assert rows[key]["group_n"] == n
        assert rows[key]["k_anonymous"] == int(n >= _K_ANON)


def test_audio_chunks_match_python_enumeration(spark):
    """Exact chunk table: start/end/tail for every payload, not just
    coverage/overlap invariants."""
    from debezium_cdc_kafka_spark.operators.multimodal import (
        _HOP,
        _WIN,
        multimodal_audio_chunks,
    )

    expected = {}
    for d in _read("documents"):
        n = len(d["text"].encode("utf-8")) // 2
        if n <= 0:
            continue
        n_chunks = max(math.ceil((n - _WIN) / _HOP), 0) + 1
        for i in range(n_chunks):
            end = min(i * _HOP + _WIN, n)
            expected[(d["doc_id"], i)] = (n, i * _HOP, end, int(end == n))

    rows = {
        (r["doc_id"], r["chunk_idx"]): r
        for r in multimodal_audio_chunks(spark, SF_SMOKE).collect()
    }
    assert set(rows) == set(expected)
    for key, (n, start, end, tail) in expected.items():
        r = rows[key]
        assert (r["n_samples"], r["start_sample"], r["end_sample"], r["is_tail"]) == (
            n,
            start,
            end,
            tail,
        )
