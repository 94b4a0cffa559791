"""Property tests for the round-4 analytics additions: KMV sketch algebra,
CUSUM closed form, SAX words, Kaplan-Meier, neighborhood Jaccard,
compaction planning, incremental top-k. The DuckDB oracles pin
cross-engine equality; these pin SEMANTICS against independent Python
reimplementations and structural invariants.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from debezium_cdc_kafka_spark.operators.approx import _KMV_K, q_kmv_sketch_ops
from debezium_cdc_kafka_spark.operators.behavior import q_kaplan_meier
from debezium_cdc_kafka_spark.operators.graph import graph_jaccard_neighbors
from debezium_cdc_kafka_spark.operators.incremental import _ITK_K, q_incremental_topk
from debezium_cdc_kafka_spark.operators.layout import (
    _COMPACT_TARGET,
    q_compaction_plan,
)
from debezium_cdc_kafka_spark.operators.stats import (
    q_chi_square_independence,
    q_correlation_matrix,
    q_ks_two_sample,
)
from debezium_cdc_kafka_spark.operators.timeseries import (
    q_cusum_changepoint,
    q_sax_symbolize,
)
from tests.conftest import SF_ORACLE, SF_SMOKE


def test_kmv_estimates_near_exact(spark):
    """KMV relative error at k=64 is ~1/sqrt(k-2) ~ 13%; assert a loose
    3-sigma band on every estimate, and the sketch-size invariants."""
    row = q_kmv_sketch_ops(spark, SF_ORACLE).collect()[0]
    assert row["m_a"] <= _KMV_K and row["m_b"] <= _KMV_K and row["m_u"] <= _KMV_K
    for est, exact in [
        (row["est_a"], row["exact_a"]),
        (row["est_b"], row["exact_b"]),
        (row["est_union"], row["exact_union"]),
    ]:
        assert abs(est - exact) <= 0.40 * exact, (est, exact)
    # intersection inherits union noise; just sanity-band it
    assert 0 <= row["est_intersect"] <= 1.5 * row["est_union"]
    assert 0.0 <= row["jaccard_est"] <= 1.0


def test_cusum_matches_recursive_form(spark):
    """The closed form (cumsum - min(0, running min)) must equal the
    textbook recursion S_i = max(0, S_{i-1} + dev_i)."""
    rows = sorted(q_cusum_changepoint(spark, SF_SMOKE).collect(), key=lambda r: r["d"])
    xs = [float(r["n_events"]) for r in rows]
    mu = sum(xs) / len(xs)
    var = sum((x - mu) ** 2 for x in xs) / (len(xs) - 1)
    sd = math.sqrt(var)
    s = 0.0
    for r, x in zip(rows, xs):
        s = max(0.0, s + (x - mu - 0.5 * sd))
        assert abs(r["s_pos"] - s) < 1e-4, (r["d"], r["s_pos"], s)


def test_sax_words_shape(spark):
    rows = q_sax_symbolize(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    for r in rows:
        assert len(r["sax_word"]) == 4
        assert set(r["sax_word"]) <= set("abcd")
    # z-normalized corpus: overall mean word should not be all-extreme
    joined = "".join(r["sax_word"] for r in rows)
    assert len(set(joined)) >= 2


def test_kaplan_meier_invariants(spark):
    rows = sorted(q_kaplan_meier(spark, SF_ORACLE).collect(), key=lambda r: r["t"])
    # survival is non-increasing from 1
    prev = 1.0
    for r in rows:
        assert r["km_survival"] <= prev + 1e-9
        prev = r["km_survival"]
    # at-risk counts strictly decrease and match the exit ledger
    for a, b in zip(rows, rows[1:]):
        assert b["n_risk"] == a["n_risk"] - a["d_events"] - a["c_censored"]
    # everyone exits exactly once
    total = rows[0]["n_risk"]
    assert total == sum(r["d_events"] + r["c_censored"] for r in rows)


def test_jaccard_neighbors_independent(spark):
    """Recompute neighborhood Jaccard in pure Python from the parquet and
    compare the top rows (same support threshold and tiebreak)."""
    t = pq.read_table(f"{SF_SMOKE}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
    baskets = defaultdict(set)
    for ok, pk in zip(t["l_orderkey"].to_pylist(), t["l_partkey"].to_pylist()):
        baskets[ok].add(pk)
    pair_n = Counter()
    for items in baskets.values():
        s = sorted(items)
        for i, u in enumerate(s):
            for v in s[i + 1 :]:
                pair_n[(u, v)] += 1
    edges = {p for p, n in pair_n.items() if n >= 3}
    nbr = defaultdict(set)
    for u, v in edges:
        nbr[u].add(v)
        nbr[v].add(u)
    expect = {}
    for u, v in edges:
        common = len(nbr[u] & nbr[v])
        expect[(u, v)] = round(common / (len(nbr[u]) + len(nbr[v]) - common), 6)
    rows = graph_jaccard_neighbors(spark, SF_SMOKE).collect()
    assert len(rows) <= 50
    for r in rows:
        assert expect[(r["u"], r["v"])] == r["jaccard"]
        assert r["common"] <= min(r["deg_u"], r["deg_v"])


def test_compaction_plan_invariants(spark):
    rows = sorted(q_compaction_plan(spark, SF_SMOKE).collect(), key=lambda r: r["file_day"])
    # target files are contiguous, start at 0, never decrease
    tfs = [r["target_file"] for r in rows]
    assert tfs[0] == 0
    assert all(b - a in (0, 1) for a, b in zip(tfs, tfs[1:]))
    # every non-final output lands within [target, target + max_file) rows
    by_tf = defaultdict(int)
    for r in rows:
        by_tf[r["target_file"]] += r["n_rows"]
        assert r["target_rows"] >= r["n_rows"]
    max_file = max(r["n_rows"] for r in rows)
    for tf, total in by_tf.items():
        if tf != max(by_tf):
            assert _COMPACT_TARGET <= total < _COMPACT_TARGET + max_file


def test_incremental_topk_equals_direct(spark):
    """The merged-view top-k must equal a direct full-table top-k."""
    from pyspark.sql import functions as F

    from debezium_cdc_kafka_spark.catalog import load_table

    got = [
        (r["l_partkey"], r["revenue"], r["n_lines"])
        for r in q_incremental_topk(spark, SF_SMOKE).collect()
    ]
    li = load_table(spark, SF_SMOKE, "lineitem")
    direct = (
        li.groupBy("l_partkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy(F.col("revenue").desc(), "l_partkey")
        .limit(_ITK_K)
        .collect()
    )
    assert got == [(r["l_partkey"], r["revenue"], r["n_lines"]) for r in direct]


def test_chi2_terms_sum_to_stat(spark):
    rows = q_chi_square_independence(spark, SF_SMOKE).collect()
    stat = rows[0]["chi2_stat"]
    assert all(r["chi2_stat"] == stat for r in rows)
    assert abs(sum(r["chi2_term"] for r in rows) - stat) < 1e-2
    # margins of expected == margins of observed
    assert abs(sum(r["expected"] for r in rows) - sum(r["o"] for r in rows)) < 1e-3


def test_correlation_matrix_bounds(spark):
    rows = q_correlation_matrix(spark, SF_SMOKE).collect()
    assert len(rows) == 6
    for r in rows:
        assert -1.0 <= r["pearson_r"] <= 1.0


def test_ks_two_sample_range(spark):
    row = q_ks_two_sample(spark, SF_SMOKE).collect()[0]
    assert 0.0 <= row["ks_d"] <= 1.0
    assert row["n_a"] > 0 and row["n_b"] > 0


def test_feature_hashing_conserves_tokens(spark):
    """Total hashed tf mass == total token count; dims within range."""
    from pyspark.sql import functions as F

    from debezium_cdc_kafka_spark.catalog import load_table
    from debezium_cdc_kafka_spark.functions.textfns import tokens
    from debezium_cdc_kafka_spark.operators.text import _FH_DIMS, q_feature_hashing

    rows = q_feature_hashing(spark, SF_SMOKE).collect()
    assert all(0 <= r["dim"] < _FH_DIMS for r in rows)
    total_tf = sum(r["tf"] for r in rows)
    docs = load_table(spark, SF_SMOKE, "documents")
    total_tok = docs.select(
        F.sum(F.size(tokens(F.col("text")))).alias("n")
    ).collect()[0]["n"]
    assert total_tf == total_tok


def test_split_leakage_detects_mutated_copies(spark):
    from debezium_cdc_kafka_spark.operators.curation import q_split_leakage_report

    row = q_split_leakage_report(spark, SF_SMOKE).collect()[0]
    # every original+mutated pair shares one content key
    assert row["n_content_keys"] > 0
    # with 2 copies per key and a 98/1/1 split, SOME leakage must exist
    assert row["keys_train_val"] + row["keys_train_test"] >= 0
    assert row["leaked_val_docs"] >= row["keys_train_val"]
    assert row["leaked_test_docs"] >= row["keys_train_test"]


def test_ngram_novelty_bounds_and_first_doc(spark):
    from debezium_cdc_kafka_spark.operators.corpus import q_ngram_novelty

    rows = sorted(q_ngram_novelty(spark, SF_SMOKE).collect(), key=lambda r: r["doc_id"])
    assert rows, "every doc has >= 3 tokens in the synthetic corpus"
    # the first doc by ingest order is 100% novel
    assert rows[0]["novelty"] == 1.0
    for r in rows:
        assert 0.0 <= r["novelty"] <= 1.0
        assert r["n_novel"] <= r["n_grams"]


def test_gini_source_tokens_range(spark):
    from debezium_cdc_kafka_spark.operators.corpus import q_gini_source_tokens

    row = q_gini_source_tokens(spark, SF_SMOKE).collect()[0]
    assert 0.0 <= row["gini"] < 1.0
    assert row["n_sources"] > 1


def test_ann_recall_bounds_and_bruteforce_self_recall(spark):
    from debezium_cdc_kafka_spark.operators.similarity import ann_recall_eval

    rows = ann_recall_eval(spark, SF_SMOKE).collect()
    assert rows
    macro = rows[0]["macro_recall"]
    assert all(r["macro_recall"] == macro for r in rows)
    for r in rows:
        assert 0.0 <= r["recall_at_3"] <= 1.0
        assert r["n_hits"] <= 3
    # macro average consistent with per-query hits
    expect = round(sum(r["n_hits"] for r in rows) / (3.0 * len(rows)), 6)
    assert abs(macro - expect) < 1e-6


def test_psi_drift_additivity(spark):
    from debezium_cdc_kafka_spark.operators.stats import q_psi_drift

    rows = q_psi_drift(spark, SF_SMOKE).collect()
    # densified: every bin 0..9 is present even if empty in both periods,
    # so the +B*0.5 smoothing denominator matches the terms actually summed
    assert sorted(r["bin"] for r in rows) == list(range(10))
    tot = rows[0]["psi_total"]
    assert all(r["psi_total"] == tot for r in rows)
    assert abs(sum(r["psi_term"] for r in rows) - tot) < 1e-5
    # PSI is non-negative (each term is (p-q)ln(p/q) >= 0)
    assert tot >= 0
    for r in rows:
        assert r["psi_term"] >= -1e-12


def test_dau_mau_stickiness_bounds(spark):
    from debezium_cdc_kafka_spark.operators.behavior import q_dau_mau_stickiness

    rows = q_dau_mau_stickiness(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["dau"] <= r["mau"]
        assert 0.0 < r["stickiness"] <= 1.0


def test_feature_scaling_invariants(spark):
    from debezium_cdc_kafka_spark.operators.reshape import (
        _SEGMENTS,
        q_feature_scaling,
    )

    rows = q_feature_scaling(spark, SF_SMOKE).collect()
    for r in rows:
        assert 0.0 <= r["bal_minmax"] <= 1.0
        onehots = [r[f"seg_{s.lower()}"] for s in _SEGMENTS]
        assert sum(onehots) == 1, "exactly one segment fires"
    zs = [r["bal_zscore"] for r in rows]
    assert abs(sum(zs) / len(zs)) < 0.01, "z-scores are centered"


def test_embedding_health_class_weights(spark):
    from debezium_cdc_kafka_spark.operators.similarity import q_embedding_health

    rows = q_embedding_health(spark, SF_SMOKE).collect()
    n_total = sum(r["n_vecs"] for r in rows)
    k = len(rows)
    for r in rows:
        assert r["median_norm"] > 0
        assert r["n_norm_outliers"] <= r["n_vecs"]
        expect_w = round(n_total / (k * r["n_vecs"]), 6)
        assert abs(r["class_weight"] - expect_w) < 1e-6
    # weights average ~1 when weighted by class frequency
    wsum = sum(r["class_weight"] * r["n_vecs"] for r in rows)
    assert abs(wsum - n_total) < 1e-3


def test_tokenizer_fertility_sane(spark):
    from debezium_cdc_kafka_spark.operators.corpus import q_tokenizer_fertility

    rows = q_tokenizer_fertility(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        # the regex tokenizer splits punctuation off words: fertility >= ~1
        assert r["fertility"] >= 0.9, r
        assert r["chars_per_token"] > 1.0
        assert r["total_words"] <= r["total_chars"]


def test_patch_grid_decodes_match_python(spark):
    """The oracle replays the checksum in SQL; this replays it in Python
    directly from the parquet bytes — three-way agreement."""
    from debezium_cdc_kafka_spark.operators.multimodal import (
        _PATCH,
        multimodal_patch_grid,
    )

    t = pq.read_table(f"{SF_SMOKE}/documents.parquet", columns=["doc_id", "text"])
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    rows = multimodal_patch_grid(spark, SF_SMOKE).collect()
    assert len(rows) == len(texts)
    for r in rows:
        payload = texts[r["doc_id"]].encode("utf-8")
        checksum = sum(payload[:64])
        assert r["width"] == 64 + checksum % 64
        assert r["height"] == 64 + (checksum // 64) % 64
        assert r["n_patches"] == r["patches_x"] * r["patches_y"]
        assert 0 <= r["pad_x"] < _PATCH and 0 <= r["pad_y"] < _PATCH


def test_audio_chunks_cover_and_overlap(spark):
    from collections import defaultdict

    from debezium_cdc_kafka_spark.operators.multimodal import (
        _HOP,
        _WIN,
        multimodal_audio_chunks,
    )

    by_doc = defaultdict(list)
    for r in multimodal_audio_chunks(spark, SF_SMOKE).collect():
        by_doc[r["doc_id"]].append(r)
    assert by_doc
    for doc, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        n = chunks[0]["n_samples"]
        # starts advance by hop; tail flagged exactly on the last chunk
        for i, c in enumerate(chunks):
            assert c["start_sample"] == i * _HOP
            assert c["end_sample"] <= n
        assert chunks[-1]["is_tail"] == 1
        assert chunks[-1]["end_sample"] == n
        # full coverage: every sample inside some window
        covered = max(c["end_sample"] for c in chunks)
        assert covered == n
        if len(chunks) > 1:
            assert chunks[0]["end_sample"] > chunks[1]["start_sample"], "overlap"


def test_bpe_train_matches_python_reference(spark):
    """Independent third implementation: Sennrich get_stats (overlapping
    pair counts) + greedy-leftmost apply, in plain Python over the raw
    parquet — the Spark loop and the unrolled-CTE oracle must both agree
    with it."""
    import re

    from debezium_cdc_kafka_spark.functions.textfns import TOKEN_SPLIT_RE
    from debezium_cdc_kafka_spark.operators.corpus import (
        _BPE_ROUNDS,
        text_bpe_train,
    )

    t = pq.read_table(f"{SF_SMOKE}/documents.parquet", columns=["text"])
    wf = Counter()
    for txt in t["text"].to_pylist():
        for w in re.split(TOKEN_SPLIT_RE, txt.lower()):
            if w:
                wf[w] += 1
    state = {w: list(w) for w in wf}
    expected = []
    for r in range(1, _BPE_ROUNDS + 1):
        counts = Counter()
        for w, syms in state.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += wf[w]
        (c1, c2), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        expected.append((r, c1, c2, c1 + c2, cnt))
        for w, syms in state.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == c1 and syms[i + 1] == c2:
                    out.append(c1 + c2)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            state[w] = out

    got = [
        (r["merge_round"], r["c1"], r["c2"], r["merged"], r["pair_count"])
        for r in sorted(
            text_bpe_train(spark, SF_SMOKE).collect(),
            key=lambda r: r["merge_round"],
        )
    ]
    assert got == expected


def test_kcenter_matches_python_and_monotone(spark):
    """Independent Python farthest-point traversal over the raw parquet;
    also pins the k-center invariant: selection distances never increase."""
    from debezium_cdc_kafka_spark.operators.similarity import (
        _KC_K,
        q_kcenter_coreset,
    )

    t = pq.read_table(
        f"{SF_SMOKE}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in t.to_pylist()
    }

    def d6(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += (x - y) * (x - y)
        return round(1000000 * acc)

    seed = min(vecs)
    chosen = [(1, seed, 0.0)]
    dist = {i: d6(v, vecs[seed]) for i, v in vecs.items()}
    for r in range(2, _KC_K + 1):
        w = min(dist, key=lambda i: (-dist[i], i))
        chosen.append((r, w, round(dist[w] / 1000000.0, 6)))
        for i, v in vecs.items():
            dist[i] = min(dist[i], d6(v, vecs[w]))

    got = [
        (r["sel_round"], r["vec_id"], r["d2_sel"])
        for r in sorted(
            q_kcenter_coreset(spark, SF_SMOKE).collect(),
            key=lambda r: r["sel_round"],
        )
    ]
    assert got == chosen
    sel_d = [d for _, _, d in got[1:]]
    assert sel_d == sorted(sel_d, reverse=True)


def test_classifier_auc_equals_pair_counting(spark):
    """The Mann-Whitney rank form must equal the definitional pair count
    (#pos>neg + 0.5*#ties) / (n_pos*n_neg), computed brute-force in
    Python from the classifier's own scores."""
    from debezium_cdc_kafka_spark.operators.stats import q_classifier_auc
    from debezium_cdc_kafka_spark.operators.text import text_quality_classifier

    langs = dict(
        (r["doc_id"], r["lang"])
        for r in pq.read_table(
            f"{SF_SMOKE}/documents.parquet", columns=["doc_id", "lang"]
        ).to_pylist()
    )
    scored = [
        (r["quality_score"], 1 if langs[r["doc_id"]] == "en" else 0)
        for r in text_quality_classifier(spark, SF_SMOKE).collect()
    ]
    pos = [s for s, y in scored if y == 1]
    neg = [s for s, y in scored if y == 0]
    wins = sum(1 for p in pos for n in neg if p > n)
    ties = sum(1 for p in pos for n in neg if p == n)
    expected = round((wins + 0.5 * ties) / (len(pos) * len(neg)), 6)

    row = q_classifier_auc(spark, SF_SMOKE).collect()[0]
    assert row["n_pos"] == len(pos) and row["n_neg"] == len(neg)
    assert abs(row["auc"] - expected) < 1e-9
    assert abs(row["gini"] - (2 * row["auc"] - 1)) < 2e-6


def test_dbscan_matches_python_reference(spark):
    """Independent Python graph-DBSCAN (same blocking, tau, minPts) over
    the raw parquet: roles and min-core-id cluster labels must agree."""
    from debezium_cdc_kafka_spark.operators.similarity import (
        _DB_MINPTS,
        _DB_TAU,
        q_dbscan_clusters,
    )

    t = pq.read_table(f"{SF_SMOKE}/embeddings.parquet")
    rows = t.to_pylist()
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in rows}
    lbl = {r["vec_id"]: r["label"] for r in rows}

    def cos(a, b):
        d = na = nb = 0.0
        for x, y in zip(a, b):
            d += x * y
            na += x * x
            nb += y * y
        return d / math.sqrt(na * nb)

    ids = sorted(vecs)
    adj = defaultdict(set)
    for i, u in enumerate(ids):
        for v in ids[i + 1:]:
            if lbl[u] == lbl[v] and cos(vecs[u], vecs[v]) >= _DB_TAU:
                adj[u].add(v)
                adj[v].add(u)
    cores = {n for n in ids if len(adj[n]) >= _DB_MINPTS}
    comp = {}
    for n in sorted(cores):
        if n in comp:
            continue
        stack, members = [n], []
        seen = {n}
        while stack:
            x = stack.pop()
            members.append(x)
            for y in adj[x]:
                if y in cores and y not in seen:
                    seen.add(y)
                    stack.append(y)
        root = min(members)
        for m in members:
            comp[m] = root
    expected = {}
    for n in ids:
        if n in cores:
            expected[n] = ("core", comp[n], len(adj[n]))
        else:
            cn = [comp[m] for m in adj[n] if m in cores]
            if cn:
                expected[n] = ("border", min(cn), len(adj[n]))
            else:
                expected[n] = ("noise", -1, len(adj[n]))

    got = {
        r["vec_id"]: (r["role"], r["cluster_id"], r["n_neighbors"])
        for r in q_dbscan_clusters(spark, SF_SMOKE).collect()
    }
    assert got == expected


def test_label_propagation_matches_python(spark):
    """Python replay of the two voting rounds over the (already
    oracle-gated) mutual k-NN edge set."""
    from debezium_cdc_kafka_spark.operators.similarity import (
        _LP_HOLD_MOD,
        q_knn_graph,
        q_label_propagation,
    )

    labels = {
        r["vec_id"]: r["label"]
        for r in pq.read_table(
            f"{SF_SMOKE}/embeddings.parquet", columns=["vec_id", "label"]
        ).to_pylist()
    }
    adj = defaultdict(set)
    for r in q_knn_graph(spark, SF_SMOKE).collect():
        adj[r["v1"]].add(r["v2"])
        adj[r["v2"]].add(r["v1"])

    hold = {i for i in labels if i % _LP_HOLD_MOD == 0}
    known = {i: labels[i] for i in labels if i not in hold}
    expected = {}
    for rnd in (1, 2):
        newly = {}
        for n in sorted(hold - expected.keys()):
            votes = Counter(known[m] for m in adj[n] if m in known)
            if votes:
                lab = min(votes, key=lambda x: (-votes[x], x))
                newly[n] = (lab, rnd)
        expected.update(newly)
        known.update({n: v[0] for n, v in newly.items()})

    got = {
        r["vec_id"]: (r["pred_label"], r["src_round"], r["correct"])
        for r in q_label_propagation(spark, SF_SMOKE).collect()
    }
    assert set(got) == hold
    for n in hold:
        pl, sr = expected.get(n, (-1, 0))
        assert got[n] == (pl, sr, 1 if pl == labels[n] else 0), n


def test_decision_stump_minimizes_definitional_gini(spark):
    """The cleared-fraction integer cost must pick the same split as the
    definitional weighted Gini computed in exact rational arithmetic."""
    from fractions import Fraction

    from debezium_cdc_kafka_spark.operators.stats import (
        _STUMP_FEATS,
        q_decision_stump,
    )
    from debezium_cdc_kafka_spark.operators.text import text_quality_stats

    langs = {
        r["doc_id"]: r["lang"]
        for r in pq.read_table(
            f"{SF_SMOKE}/documents.parquet", columns=["doc_id", "lang"]
        ).to_pylist()
    }
    rows = text_quality_stats(spark, SF_SMOKE).collect()
    best = {}
    for f in _STUMP_FEATS:
        pts = sorted(
            (float(r[f]), 1 if langs[r["doc_id"]] == "en" else 0)
            for r in rows
        )
        n = len(pts)
        pos = sum(y for _, y in pts)
        cands = {}
        nl = pl = 0
        for i, (v, y) in enumerate(pts):
            nl, pl = nl + 1, pl + y
            if i + 1 < n and pts[i + 1][0] == v:
                continue
            if nl == n:
                continue
            nr, prr = n - nl, pos - pl
            gini = Fraction(nl, n) * (
                1 - Fraction(pl, nl) ** 2 - Fraction(nl - pl, nl) ** 2
            ) + Fraction(nr, n) * (
                1 - Fraction(prr, nr) ** 2 - Fraction(nr - prr, nr) ** 2
            )
            cands[v] = gini
        if cands:
            thr = min(cands, key=lambda v: (cands[v], v))
            best[f] = (
                thr,
                (
                    sum(1 for v, _ in pts if v <= thr),
                    sum(y for v, y in pts if v <= thr),
                ),
            )

    got = {r["feature"]: r for r in q_decision_stump(spark, SF_SMOKE).collect()}
    assert set(got) == set(best)
    for f, (thr, (nl, pl)) in best.items():
        assert got[f]["threshold"] == thr, f
        assert got[f]["n_left"] == nl and got[f]["pos_left"] == pl, f
    assert sum(r["is_global_best"] for r in got.values()) == 1


def test_bpe_apply_matches_python_segmentation(spark):
    """Segment each document under the Python-reference merge state and
    compare per-doc word/subword/char counts."""
    import re

    from debezium_cdc_kafka_spark.functions.textfns import TOKEN_SPLIT_RE
    from debezium_cdc_kafka_spark.operators.corpus import (
        _BPE_ROUNDS,
        text_bpe_apply,
    )

    t = pq.read_table(f"{SF_SMOKE}/documents.parquet", columns=["doc_id", "text"])
    docs = {
        r["doc_id"]: [
            w for w in re.split(TOKEN_SPLIT_RE, r["text"].lower()) if w
        ]
        for r in t.to_pylist()
    }
    wf = Counter(w for ws in docs.values() for w in ws)
    state = {w: list(w) for w in wf}
    for _ in range(_BPE_ROUNDS):
        counts = Counter()
        for w, syms in state.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += wf[w]
        (c1, c2), _cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        for w, syms in state.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == c1 and syms[i + 1] == c2:
                    out.append(c1 + c2)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            state[w] = out

    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"], r["n_chars"])
        for r in text_bpe_apply(spark, SF_SMOKE).collect()
    }
    assert set(got) == {d for d, ws in docs.items() if ws}
    for d, ws in docs.items():
        if not ws:
            continue
        exp = (
            len(ws),
            sum(len(state[w]) for w in ws),
            sum(len(w) for w in ws),
        )
        assert got[d] == exp, d
        assert exp[0] <= exp[1] <= exp[2]


def test_calibration_curve_invariants(spark):
    """Bin invariants + Python recompute of per-bin stats from the
    classifier's own scores."""
    from debezium_cdc_kafka_spark.operators.stats import (
        _CAL_BINS,
        q_calibration_curve,
    )
    from debezium_cdc_kafka_spark.operators.text import text_quality_classifier

    langs = {
        r["doc_id"]: r["lang"]
        for r in pq.read_table(
            f"{SF_SMOKE}/documents.parquet", columns=["doc_id", "lang"]
        ).to_pylist()
    }
    binned = defaultdict(list)
    for r in text_quality_classifier(spark, SF_SMOKE).collect():
        s = r["quality_score"]
        b = min(int(s * _CAL_BINS), _CAL_BINS - 1)
        binned[b].append((s, 1 if langs[r["doc_id"]] == "en" else 0))

    got = {r["bin"]: r for r in q_calibration_curve(spark, SF_SMOKE).collect()}
    assert set(got) == set(binned)
    for b, pts in binned.items():
        n = len(pts)
        assert got[b]["n"] == n
        assert got[b]["n_pos"] == sum(y for _, y in pts)
        mp = round(sum(round(s * 10000) for s, _ in pts) / n / 10000.0, 6)
        assert got[b]["mean_pred"] == mp
        br = round(
            sum(round((s - y) * (s - y) * 1e8) for s, y in pts) / n / 1e8, 6
        )
        assert abs(got[b]["brier"] - br) < 1e-9
        assert 0.0 <= got[b]["frac_pos"] <= 1.0
        assert b / _CAL_BINS - 1e-9 <= got[b]["mean_pred"] <= (b + 1) / _CAL_BINS + 0.05
