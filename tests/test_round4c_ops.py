"""Property tests for the round-4c additions: Welch t-test, mutual
information, Poisson bootstrap, autocorrelation, soft-dedup weighting,
epoch shuffle planning, perceptual-hash dedup. The DuckDB oracles pin
cross-engine equality; these pin SEMANTICS against independent Python
reimplementations and structural invariants.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from debezium_cdc_kafka_spark.operators.curation import (
    _SHUF_BATCH,
    _SHUF_EPOCHS,
    q_epoch_shuffle_plan,
    q_soft_dedup_weights,
)
from debezium_cdc_kafka_spark.operators.multimodal import (
    _PH_HAM,
    _phash_fake,
    multimodal_phash_dedup,
)
from debezium_cdc_kafka_spark.operators.incremental import q_incremental_distinct
from debezium_cdc_kafka_spark.operators.similarity import q_matryoshka_recall
from debezium_cdc_kafka_spark.operators.stats import (
    _POIS_CDF,
    q_anova_oneway,
    q_bootstrap_ci,
    q_mutual_information,
    q_spearman_corr,
    q_welch_ttest,
)
from debezium_cdc_kafka_spark.operators.timeseries import q_acf_lags
from debezium_cdc_kafka_spark.operators.windows import q_windowed_topk_types
from tests.conftest import SF_SMOKE


def _read(table: str) -> list[dict]:
    return pq.read_table(f"{SF_SMOKE}/{table}.parquet").to_pylist()


def test_welch_matches_textbook_formula(spark):
    """Recompute Welch's t and the Satterthwaite df from raw parquet with
    plain Python floats; the engine (exact integer sums -> double) must
    land on the same values at the published rounding."""
    custseg = {
        r["c_custkey"]: r["c_mktsegment"]
        for r in _read("customer")
        if r["c_mktsegment"] in ("BUILDING", "MACHINERY")
    }
    groups = defaultdict(list)
    for r in _read("orders"):
        seg = custseg.get(r["o_custkey"])
        if seg:
            groups[seg].append(round(r["o_totalprice"] * 100) / 100.0)
    xa, xb = groups["BUILDING"], groups["MACHINERY"]
    na, nb = len(xa), len(xb)
    ma, mb = sum(xa) / na, sum(xb) / nb
    va = sum((x - ma) ** 2 for x in xa) / (na - 1)
    vb = sum((x - mb) ** 2 for x in xb) / (nb - 1)
    se2 = va / na + vb / nb
    t = (ma - mb) / math.sqrt(se2)
    df = se2 * se2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))

    row = q_welch_ttest(spark, SF_SMOKE).collect()[0]
    assert row["n_a"] == na and row["n_b"] == nb
    assert abs(row["mean_a"] - ma) < 1e-4 and abs(row["mean_b"] - mb) < 1e-4
    assert abs(row["t_stat"] - t) < 1e-4
    assert abs(row["welch_df"] - df) < 1e-2
    assert row["significant_95"] == int(abs(t) > 1.96)


def test_mutual_information_matches_python(spark):
    """MI total must equal the definitional sum over the contingency
    table, and must be bounded by min(H(lang), H(source))."""
    docs = _read("documents")
    joint = Counter((d["lang"], d["source"]) for d in docs)
    nx = Counter(d["lang"] for d in docs)
    ny = Counter(d["source"] for d in docs)
    n = len(docs)
    mi = sum(
        (c / n) * round(math.log(c * n / (nx[x] * ny[y])), 9)
        for (x, y), c in joint.items()
    )
    hx = -sum((c / n) * math.log(c / n) for c in nx.values())
    hy = -sum((c / n) * math.log(c / n) for c in ny.values())

    rows = q_mutual_information(spark, SF_SMOKE).collect()
    assert len(rows) == len(joint)
    got = rows[0]["mi_total"]
    assert abs(got - mi) < 1e-5
    assert -1e-9 <= got <= min(hx, hy) + 1e-6


def test_bootstrap_weights_are_poisson_and_deterministic(spark):
    """The derandomized Poisson(1) draws must hit the pmf within sampling
    noise, resample means must bracket the true mean, and the CI columns
    must be the 2nd/31st order statistics of the 32 means."""
    rows = sorted(q_bootstrap_ci(spark, SF_SMOKE).collect(), key=lambda r: r["b"])
    assert len(rows) == 32
    orders = _read("orders")
    n = len(orders)
    true_mean = sum(o["o_totalprice"] for o in orders) / n
    means = sorted(r["mean_b"] for r in rows)
    assert rows[0]["ci_lo"] == means[1]
    assert rows[0]["ci_hi"] == means[-2]
    assert means[0] <= true_mean <= means[-1]
    # n_eff ~ Poisson(1) sum: mean n, sd ~ sqrt(n); allow 5 sigma
    for r in rows:
        assert abs(r["n_eff"] - n) <= 5 * math.sqrt(n) + 5
    # rerun is bit-identical (derandomized)
    again = sorted(q_bootstrap_ci(spark, SF_SMOKE).collect(), key=lambda r: r["b"])
    assert [r["mean_b"] for r in again] == [r["mean_b"] for r in rows]


def test_poisson_cdf_constants():
    """The inverse-CDF thresholds are the Poisson(1) CDF at k=0..3."""
    cdf, term = 0.0, math.exp(-1.0)
    for k, want in enumerate(_POIS_CDF):
        cdf += term
        assert abs(cdf - want) < 5e-9, (k, cdf, want)
        term /= k + 1


def test_acf_matches_python(spark):
    """Calendar-lag autocorrelation must equal the definitional centered
    products over the per-day count table; acf at lag 0 would be 1."""
    from datetime import timedelta

    days = Counter()
    for e in _read("events"):
        days[e["ts"].date()] += 1
    xs = days
    nd = len(days)
    mean = sum(days.values()) / nd
    denom = sum((v - mean) ** 2 for v in days.values())
    rows = {r["lag"]: r for r in q_acf_lags(spark, SF_SMOKE).collect()}
    assert set(rows) == set(range(1, 8))
    for k in range(1, 8):
        pairs = [
            (xs[d] - mean) * (xs[d - timedelta(days=k)] - mean)
            for d in xs
            if d - timedelta(days=k) in xs
        ]
        assert rows[k]["n_pairs"] == len(pairs)
        assert abs(rows[k]["acf"] - sum(pairs) / denom) < 1e-5
        assert -1.001 <= rows[k]["acf"] <= 1.001


def test_soft_dedup_inflation(spark):
    """Every source must show inflation >= 2x (the mutant doubles every
    content), raw >= effective mass, and the totals must reconcile with
    the corpus construction (2x docs per source)."""
    docs = _read("documents")
    per_source = Counter(d["source"] for d in docs)
    rows = q_soft_dedup_weights(spark, SF_SMOKE).collect()
    assert {r["source"] for r in rows} == set(per_source)
    for r in rows:
        assert r["n_docs"] == 2 * per_source[r["source"]]
        # original + mutant always share a normalized content hash
        assert r["n_duplicated"] == r["n_docs"]
        assert r["eff_utokens"] <= r["raw_tokens"] * 1_000_000
        assert r["dup_inflation"] >= 2.0 - 1e-9


def test_epoch_shuffle_is_batched_permutation(spark):
    """Each epoch is a full permutation of the corpus chopped into
    batches of exactly _SHUF_BATCH (last batch ragged), and the two
    epochs order the corpus differently."""
    rows = q_epoch_shuffle_plan(spark, SF_SMOKE).collect()
    n_docs = len(_read("documents"))
    assert len(rows) == _SHUF_EPOCHS * n_docs
    by_epoch = defaultdict(dict)
    for r in rows:
        by_epoch[r["epoch"]][r["doc_id"]] = (r["batch_id"], r["pos"])
    orders = []
    for epoch, assign in by_epoch.items():
        assert len(assign) == n_docs  # every doc exactly once
        slots = sorted(assign.values())
        want = [(i // _SHUF_BATCH, i % _SHUF_BATCH) for i in range(n_docs)]
        assert slots == want  # dense, no gap, no double-fill
        orders.append(tuple(sorted(assign, key=lambda d: assign[d])))
    assert orders[0] != orders[1]  # epochs decorrelated


def test_phash_pairs_include_mutants_and_respect_threshold(spark):
    """Every doc >= 64 bytes must pair with its appended-tail mutant at
    hamming 0; all emitted pairs respect the threshold; fingerprints
    recomputed in pure Python agree."""
    rows = multimodal_phash_dedup(spark, SF_SMOKE).collect()
    got = {(r["uid_a"], r["uid_b"]): r["hamming"] for r in rows}
    assert all(h <= _PH_HAM for h in got.values())
    docs = _read("documents")
    long_docs = [d for d in docs if len(d["text"].encode()) >= 64]
    assert long_docs, "fixture should contain docs >= 64 bytes"
    for d in long_docs[:50]:
        pair = (d["doc_id"], d["doc_id"] + 10000000)
        assert got.get(pair) == 0, pair
    # python replay of the fingerprint arithmetic
    for d in docs[:20]:
        fp = _phash_fake(d["text"].encode())
        assert 0 <= fp < (1 << 60)


def test_anova_matches_python(spark):
    """F and eta^2 must equal the definitional decomposition computed in
    plain Python over raw parquet."""
    custseg = {r["c_custkey"]: r["c_mktsegment"] for r in _read("customer")}
    groups = defaultdict(list)
    for r in _read("orders"):
        groups[custseg[r["o_custkey"]]].append(round(r["o_totalprice"] * 100) / 100.0)
    k = len(groups)
    allx = [x for xs in groups.values() for x in xs]
    n = len(allx)
    grand = sum(allx) / n
    ssb = sum(len(xs) * (sum(xs) / len(xs) - grand) ** 2 for xs in groups.values())
    ssw = sum(
        sum((x - sum(xs) / len(xs)) ** 2 for x in xs) for xs in groups.values()
    )
    f = (ssb / (k - 1)) / (ssw / (n - k))

    row = q_anova_oneway(spark, SF_SMOKE).collect()[0]
    assert row["k"] == k and row["n_total"] == n
    assert row["df_between"] == k - 1 and row["df_within"] == n - k
    assert abs(row["f_stat"] - f) < 1e-3
    assert abs(row["eta_squared"] - ssb / (ssb + ssw)) < 1e-6


def test_windowed_topk_is_per_window_head(spark):
    """Per window: ranks are 1..min(k, types present), counts
    non-increasing in rank, and each (window, type) count matches a
    Python recount."""
    truth = Counter()
    for e in _read("events"):
        ws = e["ts"].replace(minute=0, second=0, microsecond=0)
        truth[(ws.strftime("%Y-%m-%d %H:%M:%S"), e["event_type"])] += 1
    rows = q_windowed_topk_types(spark, SF_SMOKE).collect()
    by_w = defaultdict(list)
    for r in rows:
        assert truth[(r["window_start"], r["event_type"])] == r["n"]
        by_w[r["window_start"]].append((r["rk"], r["n"]))
    for w, rks in by_w.items():
        rks.sort()
        assert [r for r, _ in rks] == list(range(1, len(rks) + 1))
        ns = [n for _, n in rks]
        assert ns == sorted(ns, reverse=True)
        assert len(rks) <= 3


def test_incremental_distinct_invariant(spark):
    """The KMV merge invariant must hold: incremental == full, and both
    estimates must be within the ~1/sqrt(k-2) band of the true count."""
    row = q_incremental_distinct(spark, SF_SMOKE).collect()[0]
    assert row["sketch_identical"] == 1
    assert row["est_incremental"] == row["est_full"]
    exact = len({e["user_id"] for e in _read("events")})
    assert abs(row["est_incremental"] - exact) <= 0.5 * exact
    assert row["m_state"] <= row["k"]


def test_spearman_matches_scipy_free_python(spark):
    """Tie-corrected Spearman must equal Pearson over mid-rank-averaged
    ranks computed independently in Python."""
    li_n = Counter()
    for r in _read("lineitem"):
        li_n[r["l_orderkey"]] += 1
    xs, ys = [], []
    for o in _read("orders"):
        if o["o_orderkey"] in li_n:
            xs.append(round(o["o_totalprice"] * 100))
            ys.append(li_n[o["o_orderkey"]])

    def midranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and vals[order[j + 1]] == vals[order[i]]:
                j += 1
            avg = (i + j) / 2 + 1
            for t in range(i, j + 1):
                ranks[order[t]] = avg
            i = j + 1
        return ranks

    rx, ry = midranks(xs), midranks(ys)
    n = len(rx)
    mx, my = sum(rx) / n, sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = math.sqrt(
        sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)
    )
    rho = num / den

    row = q_spearman_corr(spark, SF_SMOKE).collect()[0]
    assert row["n"] == n
    assert abs(row["spearman_rho"] - rho) < 1e-5
    assert -1.0 <= row["spearman_rho"] <= 1.0


def test_matryoshka_overlap_bounds(spark):
    """Overlap@5 per query lies in [0,1]; macro equals mean of per-query
    values; truncation to the same 64 dims would give overlap 1."""
    rows = q_matryoshka_recall(spark, SF_SMOKE).collect()
    assert rows, "probe set must be non-empty"
    per_q = [r["n_overlap"] for r in rows]
    assert all(0 <= v <= 5 for v in per_q)
    macro = rows[0]["macro_overlap"]
    assert abs(macro - sum(per_q) / (5.0 * len(per_q))) < 1e-6
    for r in rows:
        assert abs(r["overlap_at_5"] - r["n_overlap"] / 5.0) < 1e-9


def test_kcore_is_fixpoint_and_valid(spark):
    """The 8-round peel must reach the true fixpoint at smoke scale
    (pinned vs an until-convergence Python peel), every core member must
    have >= K neighbors inside the core, and the core must be maximal
    (re-adding any non-member immediately violates the bound)."""
    from debezium_cdc_kafka_spark.operators.graph import _KCORE_K, graph_kcore

    adj = defaultdict(set)
    order_parts = defaultdict(set)
    for r in _read("lineitem"):
        order_parts[r["l_orderkey"]].add(r["l_partkey"])
    for parts in order_parts.values():
        for p in parts:
            for q in parts:
                if p != q:
                    adj[p].add(q)
    alive = set(adj)
    while True:
        nxt = {n for n in alive if len(adj[n] & alive) >= _KCORE_K}
        if nxt == alive:
            break
        alive = nxt

    rows = graph_kcore(spark, SF_SMOKE).collect()
    got_core = {r["p_partkey"] for r in rows if r["in_core"] == 1}
    assert got_core == alive  # 8-round budget reached the fixpoint
    for r in rows:
        assert r["deg0"] == len(adj.get(r["p_partkey"], ()))
    for n in got_core:
        assert len(adj[n] & got_core) >= _KCORE_K


def test_zipf_fit_matches_python_ols(spark):
    """Slope/intercept/R^2 must match a pure-Python log-log OLS over the
    same truncated frequency table; natural-ish text gives a negative
    slope with decent fit."""
    from debezium_cdc_kafka_spark.operators.corpus import (
        _ZIPF_MIN_FREQ,
        q_zipf_fit,
    )

    freq = Counter()
    for d in _read("documents"):
        for w in __import__("re").split(r"[^a-z0-9]+", d["text"].lower()):
            if w:
                freq[w] += 1
    kept = sorted(
        ((f, w) for w, f in freq.items() if f >= _ZIPF_MIN_FREQ),
        key=lambda t: (-t[0], t[1]),
    )
    pts = [
        (round(math.log(r + 1), 9), round(math.log(f), 9))
        for r, (f, _) in enumerate(kept)
    ]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    syy = sum(y * y for _, y in pts)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)

    row = q_zipf_fit(spark, SF_SMOKE).collect()[0]
    assert row["n_types"] == n
    assert abs(row["zipf_slope"] - slope) < 1e-4
    assert row["zipf_slope"] < 0
    assert 0.0 <= row["r_squared"] <= 1.0


def test_aspect_buckets_are_nearest(spark):
    """Every assignment must be the true nearest canonical ratio, with
    the decoded dims matching the fake codec."""
    from debezium_cdc_kafka_spark.operators.multimodal import (
        _AR_BUCKETS,
        multimodal_aspect_buckets,
    )

    rows = multimodal_aspect_buckets(spark, SF_SMOKE).collect()
    docs = {d["doc_id"]: d["text"].encode() for d in _read("documents")}
    assert len(rows) == len(docs)
    for r in rows[:100]:
        payload = docs[r["doc_id"]]
        cs = sum(payload[:64])
        assert r["width"] == 64 + cs % 64
        assert r["height"] == 64 + (cs // 64) % 64
        best = min(
            _AR_BUCKETS,
            key=lambda t: (round(abs(r["width"] / r["height"] - t[2] / t[3]), 9), t[0]),
        )
        assert r["bucket"] == best[1]


def test_next_event_accuracy_matches_python(spark):
    """Per-state argmax prediction and its accuracy must match an
    independent Python replay of the sequence pairing."""
    from debezium_cdc_kafka_spark.operators.behavior import q_next_event_accuracy

    by_user = defaultdict(list)
    for e in _read("events"):
        by_user[e["user_id"]].append((e["ts"], e["event_id"], e["event_type"]))
    pairs = Counter()
    for evs in by_user.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            pairs[(a, b)] += 1
    pred, tot, hit = {}, Counter(), Counter()
    for (a, b), n in pairs.items():
        tot[a] += n
        cur = pred.get(a)
        if cur is None or n > pairs[(a, cur)] or (n == pairs[(a, cur)] and b < cur):
            pred[a] = b
    for (a, b), n in pairs.items():
        if pred[a] == b:
            hit[a] += n

    rows = {r["from_type"]: r for r in q_next_event_accuracy(spark, SF_SMOKE).collect()}
    assert set(rows) == set(pred)
    for a, r in rows.items():
        assert r["predicted"] == pred[a]
        assert r["n_pairs"] == tot[a]
        assert r["n_correct"] == hit[a]
        assert abs(r["top1_accuracy"] - hit[a] / tot[a]) < 1e-6


def test_retrieval_mrr_bounds_and_python_replay(spark):
    """MRR per query in [0,1]; macro equals the mean; first_rel_rank
    agrees with a Python scan over the LSH result ranking."""
    from debezium_cdc_kafka_spark.operators.similarity import (
        ann_lsh_hyperplane,
        q_retrieval_mrr,
    )

    labels = {e["vec_id"]: e["label"] for e in _read("embeddings")}
    lsh = defaultdict(list)
    for r in ann_lsh_hyperplane(spark, SF_SMOKE).collect():
        lsh[r["query_id"]].append((r["rk"], r["cand_id"]))
    rows = q_retrieval_mrr(spark, SF_SMOKE).collect()
    assert {r["query_id"] for r in rows} == set(lsh)
    rrs = []
    for r in rows:
        ranked = sorted(lsh[r["query_id"]])
        want = 0
        for rk, cand in ranked:
            if labels[cand] == labels[r["query_id"]]:
                want = rk
                break
        assert r["first_rel_rank"] == want
        rr = 1.0 / want if want else 0.0
        assert abs(r["reciprocal_rank"] - rr) < 1e-6
        rrs.append(rr)
    assert abs(rows[0]["macro_mrr"] - sum(rrs) / len(rrs)) < 1e-6


def test_qi_generalize_absorbs_small_classes(spark):
    """Post-generalization: every original class >= k survives unchanged,
    all sub-k mass lands in band -1, and total row count is conserved."""
    from debezium_cdc_kafka_spark.operators.audit import (
        _K_ANON,
        q_k_anonymity,
        q_qi_generalize,
    )

    before = {(r["c_nationkey"], r["c_mktsegment"], r["bal_band"]): r["group_n"]
              for r in q_k_anonymity(spark, SF_SMOKE).collect()}
    after = {(r["c_nationkey"], r["c_mktsegment"], r["band_gen"]): r
             for r in q_qi_generalize(spark, SF_SMOKE).collect()}
    assert sum(before.values()) == sum(r["group_n"] for r in after.values())
    for (nat, seg, band), n in before.items():
        if n >= _K_ANON:
            assert after[(nat, seg, band)]["group_n"] == n
    expected_other = defaultdict(int)
    for (nat, seg, band), n in before.items():
        if n < _K_ANON:
            expected_other[(nat, seg)] += n
    for (nat, seg), n in expected_other.items():
        assert after[(nat, seg, -1)]["group_n"] == n


def test_bloom_fpr_audit_consistency(spark):
    """Observed FPR must agree with a Python replay of the md5 bloom, and
    the occupancy-exact prediction must sit near the observation."""
    import hashlib

    from debezium_cdc_kafka_spark.operators.approx import (
        _BF_K,
        _BF_M,
        q_bloom_fpr_audit,
    )

    auto = {
        r["c_custkey"]
        for r in _read("customer")
        if r["c_mktsegment"] == "AUTOMOBILE"
    }
    members, probes = set(), []
    for o in _read("orders"):
        (members.add if o["o_custkey"] in auto else lambda *_: None)(o["o_orderkey"])
    for o in _read("orders"):
        if o["o_orderkey"] not in members:
            probes.append(o["o_orderkey"])

    def pos(key, seed):
        h = hashlib.md5(f"{key}:{seed}".encode()).hexdigest()
        return int(h[:15], 16) % _BF_M

    bits = {pos(k, s) for k in members for s in range(_BF_K)}
    fp = sum(1 for k in probes if all(pos(k, s) in bits for s in range(_BF_K)))

    row = q_bloom_fpr_audit(spark, SF_SMOKE).collect()[0]
    assert row["n_keys"] == len(members)
    assert row["n_bits_set"] == len(bits)
    assert row["n_probes"] == len(probes)
    assert row["n_false_pos"] == fp
    assert abs(row["fpr_occupancy"] - (len(bits) / _BF_M) ** _BF_K) < 1e-6
    # theory and occupancy agree to first order at this fill level
    assert row["fpr_theory"] >= 0 and row["fpr_occupancy"] >= 0


def test_vocab_coverage_boundaries(spark):
    """Each reported vocab size must be the MINIMAL frequency-ranked
    prefix reaching the threshold (boundary rank exact vs Python)."""
    import re as _re

    from debezium_cdc_kafka_spark.operators.corpus import (
        _VOCAB_THRESHOLDS,
        q_vocab_coverage,
    )

    freq = Counter()
    for d in _read("documents"):
        for w in _re.split(r"[^a-z0-9]+", d["text"].lower()):
            if w:
                freq[w] += 1
    ranked = sorted(freq.items(), key=lambda t: (-t[1], t[0]))
    total = sum(freq.values())
    cums = []
    c = 0
    for _, f in ranked:
        c += f
        cums.append(c)

    rows = {r["threshold_pct"]: r for r in q_vocab_coverage(spark, SF_SMOKE).collect()}
    assert set(rows) == set(_VOCAB_THRESHOLDS)
    for pct in _VOCAB_THRESHOLDS:
        want = next(i + 1 for i, cum in enumerate(cums) if cum * 100 >= pct * total)
        r = rows[pct]
        assert r["vocab_size"] == want
        assert r["covered_tokens"] == cums[want - 1]
        assert r["coverage"] * 100 >= pct - 1e-4
        if want > 1:
            assert cums[want - 2] * 100 < pct * total  # minimality


def test_ohlc_matches_python(spark):
    """open/high/low/close/volume per (hour, type) vs a Python replay
    with the same (ts, event_id) total order."""
    from debezium_cdc_kafka_spark.operators.timeseries import q_ohlc_candles

    groups = defaultdict(list)
    for e in _read("events"):
        ws = e["ts"].replace(minute=0, second=0, microsecond=0)
        groups[(ws.strftime("%Y-%m-%d %H:%M:%S"), e["event_type"])].append(
            (e["ts"], e["event_id"], e["value"])
        )
    rows = q_ohlc_candles(spark, SF_SMOKE).collect()
    assert len(rows) == len(groups)
    for r in rows:
        evs = sorted(groups[(r["window_start"], r["event_type"])])
        vals = [v for _, _, v in evs]
        assert r["n_events"] == len(evs)
        assert abs(r["open"] - round(evs[0][2], 2)) < 1e-9
        assert abs(r["close"] - round(evs[-1][2], 2)) < 1e-9
        assert abs(r["high"] - round(max(vals), 2)) < 1e-9
        assert abs(r["low"] - round(min(vals), 2)) < 1e-9
        assert abs(r["volume"] - round(sum(round(v * 100) for v in vals) / 100, 2)) < 1e-6
        assert r["low"] <= r["open"] <= r["high"]
        assert r["low"] <= r["close"] <= r["high"]


def test_snapshot_diff_recovers_fixture_changes(spark):
    """The diff must recover exactly the fixture's change set."""
    from debezium_cdc_kafka_spark.operators.audit import q_snapshot_diff

    ids = [d["doc_id"] for d in _read("documents")]
    deleted = {i for i in ids if i % 13 == 0}
    changed = {i for i in ids if i % 13 != 0 and i % 7 == 0}
    added = {i + 10000000 for i in ids if i % 11 == 0}
    unchanged = {i for i in ids if i % 13 != 0 and i % 7 != 0}

    rows = {r["change_type"]: r for r in q_snapshot_diff(spark, SF_SMOKE).collect()}
    assert rows["deleted"]["n_docs"] == len(deleted)
    assert rows["changed"]["n_docs"] == len(changed)
    assert rows["added"]["n_docs"] == len(added)
    assert rows["unchanged"]["n_docs"] == len(unchanged)
    assert rows["added"]["min_doc_id"] == min(added)
    assert rows["deleted"]["max_doc_id"] == max(deleted)


def test_cluster_purity_matches_python(spark):
    """Purity and NMI must match definitional recomputation over the
    engine's own assignment."""
    from debezium_cdc_kafka_spark.operators.similarity import (
        ann_kmeans_assign,
        q_cluster_purity,
    )

    labels = {e["vec_id"]: e["label"] for e in _read("embeddings")}
    assign = {
        r["vec_id"]: r["cluster_id"]
        for r in ann_kmeans_assign(spark, SF_SMOKE).collect()
    }
    cells = Counter((c, labels[v]) for v, c in assign.items())
    nc, nl = Counter(), Counter()
    for (c, l), n in cells.items():
        nc[c] += n
        nl[l] += n
    n = sum(cells.values())
    mi = sum(
        (x / n) * round(math.log(x * n / (nc[c] * nl[l])), 9)
        for (c, l), x in cells.items()
    )
    hc = -sum((x / n) * round(math.log(x / n), 9) for x in nc.values())
    hl = -sum((x / n) * round(math.log(x / n), 9) for x in nl.values())
    nmi = mi / math.sqrt(hc * hl)
    purity = sum(
        max(x for (c2, _), x in cells.items() if c2 == c) for c in nc
    ) / n

    rows = q_cluster_purity(spark, SF_SMOKE).collect()
    assert len(rows) == len(nc)
    assert abs(rows[0]["nmi"] - nmi) < 1e-4
    assert abs(rows[0]["overall_purity"] - purity) < 1e-6
    for r in rows:
        assert 0.0 < r["cluster_purity"] <= 1.0
        assert r["cluster_n"] == nc[r["cluster_id"]]


def test_t_closeness_is_ordered_emd(spark):
    """t_distance must equal the Li et al. 2007 ordered-attribute EMD —
    the MEAN of absolute cumulative gaps, sum|CDF gap|/(m-1) — computed
    in Python over the dense band grid (r4 ADVICE: the old max-gap form
    was the KS distance, not the paper's EMD)."""
    from debezium_cdc_kafka_spark.operators.audit import q_t_closeness

    cells = Counter()
    for c in _read("customer"):
        band = math.floor(c["c_acctbal"] / 2000)
        cells[(c["c_nationkey"], c["c_mktsegment"], band)] += 1
    bands = sorted({b for (_, _, b) in cells})
    gband = Counter()
    for (_, _, b), x in cells.items():
        gband[b] += x
    n = sum(cells.values())

    rows = q_t_closeness(spark, SF_SMOKE).collect()
    classes = {(r["c_nationkey"], r["c_mktsegment"]) for r in rows}
    for r in rows:
        key = (r["c_nationkey"], r["c_mktsegment"])
        n_c = r["group_n"]
        gap, acc = 0.0, 0.0
        for b in bands:
            gap += cells.get((*key, b), 0) / n_c - gband[b] / n
            acc += abs(gap)
        emd = acc / max(len(bands) - 1, 1)
        assert abs(r["t_distance"] - emd) < 1e-5
        assert r["t_close"] == int(emd <= 0.2)
    assert len(classes) == len(rows)


def test_ams_estimate_is_in_band(spark):
    """The derandomized AMS median estimate must match a Python replay
    exactly and sit within the coarse accuracy band of exact F2."""
    import hashlib

    from debezium_cdc_kafka_spark.operators.approx import _AMS_R, q_ams_f2_sketch

    freq = Counter(r["l_partkey"] for r in _read("lineitem"))
    f2 = sum(f * f for f in freq.values())

    def sign(k, i):
        h = hashlib.md5(f"{k}:{i}".encode()).hexdigest()
        return 1 - 2 * (int(h[:15], 16) % 2)

    xs = sorted(
        sum(f * sign(k, i) for k, f in freq.items()) ** 2
        for i in range(_AMS_R)
    )
    med = (xs[_AMS_R // 2 - 1] + xs[_AMS_R // 2]) / 2.0

    row = q_ams_f2_sketch(spark, SF_SMOKE).collect()[0]
    assert row["f2_exact"] == f2
    assert abs(row["f2_estimate"] - med) < 1.0
    # median-of-16 is coarse; just require the right order of magnitude
    assert 0.2 * f2 <= row["f2_estimate"] <= 5 * f2


def test_rolling_wau_matches_python(spark):
    """WAU per report day must equal the brute-force trailing-7-day
    distinct over (user, day) pairs."""
    from datetime import timedelta

    from debezium_cdc_kafka_spark.operators.timeseries import q_rolling_wau

    du = {(e["ts"].date(), e["user_id"]) for e in _read("events")}
    days = sorted({d for d, _ in du})
    rows = {r["report_day"]: r["wau"] for r in q_rolling_wau(spark, SF_SMOKE).collect()}
    assert set(rows) == set(days)
    for d in days:
        want = len({u for (dd, u) in du if d - timedelta(days=6) <= dd <= d})
        assert rows[d] == want


def test_mom_growth_matches_python(spark):
    """Monthly revenue and percent change vs prior observed month."""
    from debezium_cdc_kafka_spark.operators.timeseries import q_mom_growth

    months = defaultdict(lambda: [0, 0])
    for o in _read("orders"):
        m = o["o_orderdate"].strftime("%Y-%m")
        months[m][0] += 1
        months[m][1] += round(o["o_totalprice"] * 100)
    ordered = sorted(months)
    rows = {r["month"]: r for r in q_mom_growth(spark, SF_SMOKE).collect()}
    assert set(rows) == set(ordered)
    assert rows[ordered[0]]["mom_growth_pct"] is None
    for prev, cur in zip(ordered, ordered[1:]):
        r = rows[cur]
        assert r["n_orders"] == months[cur][0]
        assert abs(r["revenue"] - months[cur][1] / 100) < 1e-6
        want = (months[cur][1] - months[prev][1]) * 100.0 / months[prev][1]
        assert abs(r["mom_growth_pct"] - round(want, 2)) < 1e-9


def test_lsh_recall_eval_consistent(spark):
    """Recall must equal |exact ∩ lsh| / |exact| over the two pair views,
    and be high at these banding parameters."""
    from debezium_cdc_kafka_spark.operators.dedup import (
        dedup_lsh_recall_eval,
        dedup_minhash_lsh,
        dedup_ngram_jaccard,
    )

    exact = {(r["d1"], r["d2"]) for r in dedup_ngram_jaccard(spark, SF_SMOKE).collect()}
    lsh = {(r["d1"], r["d2"]) for r in dedup_minhash_lsh(spark, SF_SMOKE).collect()}
    row = dedup_lsh_recall_eval(spark, SF_SMOKE).collect()[0]
    assert row["n_exact"] == len(exact)
    assert row["n_lsh"] == len(lsh)
    assert row["n_hit"] == len(exact & lsh)
    assert abs(row["recall"] - len(exact & lsh) / len(exact)) < 1e-6
    assert row["recall"] >= 0.8  # knee is ~0.7; 0.8-Jaccard pairs are caught


def test_assortativity_matches_python(spark):
    """Assortativity must equal the definitional Pearson over directed
    edge endpoint degrees, and lie in [-1, 1]."""
    from debezium_cdc_kafka_spark.operators.graph import graph_assortativity

    order_parts = defaultdict(set)
    for r in _read("lineitem"):
        order_parts[r["l_orderkey"]].add(r["l_partkey"])
    adj = defaultdict(set)
    for parts in order_parts.values():
        for p in parts:
            for q in parts:
                if p != q:
                    adj[p].add(q)
    xs, ys = [], []
    for u, nbrs in adj.items():
        for v in nbrs:
            xs.append(len(adj[u]))
            ys.append(len(adj[v]))
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    num = sum((a - mx) * (b - my) for a, b in zip(xs, ys))
    den = math.sqrt(
        sum((a - mx) ** 2 for a in xs) * sum((b - my) ** 2 for b in ys)
    )
    row = graph_assortativity(spark, SF_SMOKE).collect()[0]
    assert row["n_directed_edges"] == n
    assert abs(row["assortativity"] - num / den) < 1e-4
    assert -1.0 <= row["assortativity"] <= 1.0


def test_join_size_sketch_matches_python(spark):
    """The sketch dot-product estimate must match a Python replay of the
    derandomized counters, and the exact join size the true Σ fA·fB."""
    import hashlib

    from debezium_cdc_kafka_spark.operators.approx import (
        _AMS_R,
        q_join_size_sketch,
    )

    fa = Counter(o["o_orderkey"] for o in _read("orders"))
    fb = Counter(r["l_orderkey"] for r in _read("lineitem"))
    exact = sum(fa[k] * fb.get(k, 0) for k in fa)

    def sign(k, i):
        h = hashlib.md5(f"{k}:{i}".encode()).hexdigest()
        return 1 - 2 * (int(h[:15], 16) % 2)

    xs = sorted(
        sum(f * sign(k, i) for k, f in fa.items())
        * sum(f * sign(k, i) for k, f in fb.items())
        for i in range(_AMS_R)
    )
    med = (xs[_AMS_R // 2 - 1] + xs[_AMS_R // 2]) / 2.0

    row = q_join_size_sketch(spark, SF_SMOKE).collect()[0]
    assert row["exact_join_size"] == exact
    assert abs(row["sketch_estimate"] - med) < 1.0


def test_equidepth_histogram_properties(spark):
    """Buckets are contiguous, ordered, sized within one row of each
    other, and boundaries match a Python sort."""
    from debezium_cdc_kafka_spark.operators.reshape import q_equidepth_histogram

    vals = sorted(
        (round(o["o_totalprice"], 2), o["o_orderkey"]) for o in _read("orders")
    )
    n = len(vals)
    rows = sorted(q_equidepth_histogram(spark, SF_SMOKE).collect(), key=lambda r: r["bucket"])
    assert [r["bucket"] for r in rows] == list(range(1, 11))
    sizes = [r["n"] for r in rows]
    assert sum(sizes) == n
    assert max(sizes) - min(sizes) <= 1
    # Spark ntile: first n%k tiles get the extra row
    k, base, rem = 10, n // 10, n % 10
    start = 0
    for i, r in enumerate(rows):
        size = base + (1 if i < rem else 0)
        assert r["n"] == size
        chunk = vals[start : start + size]
        assert abs(r["lo"] - chunk[0][0]) < 1e-9
        assert abs(r["hi"] - chunk[-1][0]) < 1e-9
        start += size


def test_user_concentration_lorenz(spark):
    """Shares sum to 1, cumulative share is monotone and ends at 1, and
    the top decile holds at least its proportional share."""
    from debezium_cdc_kafka_spark.operators.behavior import q_user_concentration

    rows = sorted(q_user_concentration(spark, SF_SMOKE).collect(), key=lambda r: r["decile"])
    assert [r["decile"] for r in rows] == list(range(1, 11))
    users = Counter(e["user_id"] for e in _read("events"))
    assert sum(r["n_users"] for r in rows) == len(users)
    assert sum(r["events"] for r in rows) == sum(users.values())
    cums = [r["cum_share"] for r in rows]
    assert all(a <= b + 1e-9 for a, b in zip(cums, cums[1:]))
    assert abs(cums[-1] - 1.0) < 1e-6
    # deciles order users by activity, so PER-USER average activity is
    # monotone (total share need not be: ragged tile sizes put the extra
    # users in the LOW deciles on near-uniform data)
    assert (
        rows[-1]["events"] / rows[-1]["n_users"]
        >= rows[0]["events"] / rows[0]["n_users"] - 1e-9
    )


def test_langid_confusion_matches_predictions(spark):
    """Cells must recount the langid operator's own predictions and the
    accuracy be the diagonal mass."""
    from debezium_cdc_kafka_spark.operators.text import (
        q_langid_confusion,
        text_langid,
    )

    preds = Counter(
        (r["labeled_lang"], r["pred_lang"])
        for r in text_langid(spark, SF_SMOKE).collect()
    )
    total = sum(preds.values())
    correct = sum(n for (a, b), n in preds.items() if a == b)
    rows = q_langid_confusion(spark, SF_SMOKE).collect()
    assert {(r["labeled_lang"], r["pred_lang"]): r["n"] for r in rows} == dict(preds)
    for r in rows:
        row_total = sum(n for (a, _), n in preds.items() if a == r["labeled_lang"])
        assert abs(r["row_share"] - r["n"] / row_total) < 1e-6
        assert abs(r["overall_accuracy"] - correct / total) < 1e-6


def test_pmi_collocations_match_python(spark):
    """Top-PMI pairs must match a Python replay of bigram counting and
    margin-based PMI with the same rounding and tiebreaks."""
    import re as _re

    from debezium_cdc_kafka_spark.operators.corpus import (
        _PMI_MIN,
        _PMI_TOPK,
        q_pmi_collocations,
    )

    pairs = Counter()
    for d in _read("documents"):
        ws = [w for w in _re.split(r"[^a-z0-9]+", d["text"].lower()) if w]
        for a, b in zip(ws, ws[1:]):
            pairs[(a, b)] += 1
    n = sum(pairs.values())
    na, nb = Counter(), Counter()
    for (a, b), c in pairs.items():
        na[a] += c
        nb[b] += c
    scored = sorted(
        (
            (-round(math.log(c * n / (na[a] * nb[b])), 6), a, b, c)
            for (a, b), c in pairs.items()
            if c >= _PMI_MIN
        ),
    )[:_PMI_TOPK]

    rows = sorted(q_pmi_collocations(spark, SF_SMOKE).collect(), key=lambda r: r["rk"])
    assert len(rows) == min(_PMI_TOPK, len(scored))
    for r, (negpmi, a, b, c) in zip(rows, scored):
        assert (r["w1"], r["w2"], r["n_ab"]) == (a, b, c)
        assert abs(r["pmi"] + negpmi) < 1e-9


def test_theil_sen_matches_python(spark):
    """The slope must be the exact median of all pairwise slopes over the
    day-count series."""
    from debezium_cdc_kafka_spark.operators.timeseries import q_theil_sen_trend

    days = Counter()
    for e in _read("events"):
        days[e["ts"].date()] += 1
    xs = [days[d] for d in sorted(days)]
    slopes = sorted(
        (xs[j] - xs[i]) / (j - i)
        for i in range(len(xs))
        for j in range(i + 1, len(xs))
    )
    m = len(slopes)
    med = slopes[m // 2] if m % 2 else (slopes[m // 2 - 1] + slopes[m // 2]) / 2

    row = q_theil_sen_trend(spark, SF_SMOKE).collect()[0]
    assert row["n_pairs"] == m
    assert abs(row["theil_sen_slope"] - med) < 1e-6


def test_srm_check_matches_python(spark):
    """Arm counts, chi-square, and the detection flag must match a
    Python replay of the md5 parity split."""
    import hashlib

    from debezium_cdc_kafka_spark.operators.audit import _SRM_CRIT, q_srm_check

    users = {e["user_id"] for e in _read("events")}
    arms = Counter(
        int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16) % 2 for u in users
    )
    total = len(users)
    exp = total / 2
    chi2 = sum((n - exp) ** 2 / exp for n in arms.values())

    rows = {r["arm"]: r for r in q_srm_check(spark, SF_SMOKE).collect()}
    assert set(rows) == set(arms)
    for a, r in rows.items():
        assert r["n"] == arms[a]
        assert abs(r["chi2_stat"] - chi2) < 1e-4
        assert r["srm_detected"] == int(chi2 > _SRM_CRIT)


def test_weighted_median_udaf_matches_python(spark):
    """The grouped-agg pandas UDAF must produce the lower weighted
    median exactly as the Python definition computes it."""
    from debezium_cdc_kafka_spark.operators.stats import q_weighted_median_udaf

    groups = defaultdict(list)
    for r in _read("lineitem"):
        groups[r["l_returnflag"]].append((r["l_extendedprice"], int(r["l_quantity"])))
    rows = {r["l_returnflag"]: r for r in q_weighted_median_udaf(spark, SF_SMOKE).collect()}
    assert set(rows) == set(groups)
    for g, pairs in groups.items():
        pairs.sort()
        total = sum(w for _, w in pairs)
        cum = 0
        for v, w in pairs:
            cum += w
            if 2 * cum >= total:
                want = v
                break
        assert rows[g]["total_weight"] == total
        assert abs(rows[g]["weighted_median"] - round(want, 2)) < 1e-9


def test_seasonal_naive_backtest_matches_python(spark):
    """MAEs and the verdict bit must match a leakage-free Python replay."""
    from datetime import timedelta

    from debezium_cdc_kafka_spark.operators.timeseries import (
        q_seasonal_naive_backtest,
    )

    days = Counter()
    for e in _read("events"):
        days[e["ts"].date()] += 1
    scored = [
        (days[d], days[d - timedelta(days=7)], days[d - timedelta(days=1)])
        for d in days
        if d - timedelta(days=7) in days and d - timedelta(days=1) in days
    ]
    n = len(scored)
    mae_s = sum(abs(a - s) for a, s, _ in scored) / n
    mae_n = sum(abs(a - v) for a, _, v in scored) / n

    row = q_seasonal_naive_backtest(spark, SF_SMOKE).collect()[0]
    assert row["n_days"] == n
    assert abs(row["mae_seasonal"] - mae_s) < 1e-6
    assert abs(row["mae_naive"] - mae_n) < 1e-6
    assert row["seasonal_beats_naive"] == int(
        sum(abs(a - s) for a, s, _ in scored) < sum(abs(a - v) for a, _, v in scored)
    )
    assert row["mape_seasonal_pct"] >= 0


def test_new_vs_returning_matches_python(spark):
    """Daily new/returning split must reconcile with first-touch dates,
    and total new users across all days equals the distinct user count."""
    du = {(e["ts"].date(), e["user_id"]) for e in _read("events")}
    first = {}
    for d, u in sorted(du):
        first.setdefault(u, d)
    rows = {r["day"]: r for r in q_new_vs_returning_collect(spark)}
    for d, r in rows.items():
        active = {u for (dd, u) in du if dd == d}
        new = {u for u in active if first[u] == d}
        assert r["active_users"] == len(active)
        assert r["new_users"] == len(new)
        assert r["returning_users"] == len(active) - len(new)
    assert sum(r["new_users"] for r in rows.values()) == len(first)


def q_new_vs_returning_collect(spark):
    from debezium_cdc_kafka_spark.operators.behavior import q_new_vs_returning

    return q_new_vs_returning(spark, SF_SMOKE).collect()


def test_dup_cluster_histogram_reconciles(spark):
    """Bands must reconcile exactly with the clusters view: cluster
    counts, docs touched, and removable = docs - clusters."""
    from debezium_cdc_kafka_spark.operators.dedup import (
        dedup_cluster_histogram,
        dedup_clusters,
    )

    sizes = {}
    for r in dedup_clusters(spark, SF_SMOKE).collect():
        sizes[r["cluster_id"]] = r["cluster_size"]
    bands = defaultdict(lambda: [0, 0])
    for sz in sizes.values():
        b = "2" if sz == 2 else ("3-5" if sz <= 5 else "6+")
        bands[b][0] += 1
        bands[b][1] += sz
    rows = {r["size_band"]: r for r in dedup_cluster_histogram(spark, SF_SMOKE).collect()}
    assert set(rows) == set(bands)
    for b, (nc, nd) in bands.items():
        assert rows[b]["n_clusters"] == nc
        assert rows[b]["n_docs"] == nd
        assert rows[b]["removable_docs"] == nd - nc


def test_winsorized_stats_properties(spark):
    """Winsorized and trimmed means must be pulled toward the center
    relative to the raw mean's distance, and match a Python replay."""
    from debezium_cdc_kafka_spark.operators.stats import (
        _WINS_P,
        q_winsorized_stats,
    )

    custseg = {r["c_custkey"]: r["c_mktsegment"] for r in _read("customer")}
    groups = defaultdict(list)
    for o in _read("orders"):
        groups[custseg[o["o_custkey"]]].append(o["o_totalprice"])

    def pct(xs, p):
        xs = sorted(xs)
        k = (len(xs) - 1) * p
        f, c = int(k), min(int(k) + 1, len(xs) - 1)
        return xs[f] + (xs[c] - xs[f]) * (k - f)

    rows = {r["c_mktsegment"]: r for r in q_winsorized_stats(spark, SF_SMOKE).collect()}
    assert set(rows) == set(groups)
    for seg, xs in groups.items():
        lo, hi = pct(xs, _WINS_P), pct(xs, 1 - _WINS_P)
        wmean = sum(round(min(max(x, lo), hi) * 100) for x in xs) / len(xs) / 100
        band = [x for x in xs if lo <= x <= hi]
        tmean = sum(round(x * 100) for x in band) / len(band) / 100
        r = rows[seg]
        assert r["n"] == len(xs)
        # the cross-ENGINE gate is exact (oracle-hash); this replay's
        # percentile interpolation can differ in the last ulp, moving a
        # boundary value across the clamp — tolerate dollar-cents noise
        # on ~250k-dollar means
        assert abs(r["winsorized_mean"] - wmean) < 0.01
        assert abs(r["trimmed_mean"] - tmean) < 0.01


def test_cdc_op_mix_drift_reconciles(spark):
    """Bucket op counts must reconcile with the well-formed stream, PSI
    must match a Python replay with the same smoothing, and totals must
    cover every well-formed message exactly once."""
    rows = []
    ops_by_bucket = defaultdict(Counter)
    evs = [
        e
        for e in _read("events")
        if e["event_id"] % 97 != 13
    ]
    ids = [e["event_id"] for e in evs]
    lo, hi = min(ids), max(ids)
    opof = lambda t: "c" if t == "signup" else ("d" if t == "error" else "u")
    for e in evs:
        b = (e["event_id"] - lo) * 10 // (hi - lo + 1)
        ops_by_bucket[b][opof(e["event_type"])] += 1

    from debezium_cdc_kafka_spark.operators.cdc import cdc_op_mix_drift

    got = {r["bucket"]: r for r in cdc_op_mix_drift(spark, SF_SMOKE).collect()}
    assert set(got) == set(ops_by_bucket)
    g = Counter()
    for c in ops_by_bucket.values():
        g.update(c)
    gn = sum(g.values())
    for b, c in ops_by_bucket.items():
        r = got[b]
        n = sum(c.values())
        assert (r["n"], r["n_c"], r["n_u"], r["n_d"]) == (
            n, c["c"], c["u"], c["d"],
        )
        psi = sum(
            ((c[o] + 0.5) / (n + 1.5) - (g[o] + 0.5) / (gn + 1.5))
            * round(
                math.log(((c[o] + 0.5) / (n + 1.5)) / ((g[o] + 0.5) / (gn + 1.5))),
                9,
            )
            for o in "cud"
        )
        assert abs(r["psi"] - psi) < 1e-6
        assert psi >= -1e-12  # PSI is nonnegative


def test_weekday_effect_matches_python(spark):
    """Per-weekday means and the global F must match a definitional
    Python ANOVA over the day-count table."""
    from debezium_cdc_kafka_spark.operators.timeseries import q_weekday_effect

    days = Counter()
    for e in _read("events"):
        days[e["ts"].date()] += 1
    groups = defaultdict(list)
    for d, x in days.items():
        groups[d.isoweekday()].append(x)
    k = len(groups)
    allx = [x for xs in groups.values() for x in xs]
    n = len(allx)
    grand = sum(allx) / n
    ssb = sum(len(xs) * (sum(xs) / len(xs) - grand) ** 2 for xs in groups.values())
    ssw = sum(sum((x - sum(xs) / len(xs)) ** 2 for x in xs) for xs in groups.values())
    f = (ssb / (k - 1)) / (ssw / (n - k))

    rows = {r["dow"]: r for r in q_weekday_effect(spark, SF_SMOKE).collect()}
    assert set(rows) == set(groups)
    for dow, xs in groups.items():
        assert rows[dow]["n_days"] == len(xs)
        assert abs(rows[dow]["mean_events"] - sum(xs) / len(xs)) < 1e-5
        assert abs(rows[dow]["f_stat"] - f) < 1e-4


def test_lexical_diversity_matches_python(spark):
    """TTR family must match a Python recompute per doc."""
    import re as _re

    from debezium_cdc_kafka_spark.operators.text import text_lexical_diversity

    rows = {r["doc_id"]: r for r in text_lexical_diversity(spark, SF_SMOKE).collect()}
    for d in _read("documents")[:200]:
        ws = [w for w in _re.split(r"[^a-z0-9]+", d["text"].lower()) if w]
        if not ws:
            assert d["doc_id"] not in rows
            continue
        types = Counter(ws)
        r = rows[d["doc_id"]]
        assert r["n_tokens"] == len(ws)
        assert r["n_types"] == len(types)
        hapax = sum(1 for c in types.values() if c == 1)
        assert abs(r["ttr"] - len(types) / len(ws)) < 1e-6
        assert abs(r["root_ttr"] - len(types) / math.sqrt(len(ws))) < 1e-6
        assert abs(r["hapax_share"] - hapax / len(types)) < 1e-6


def test_cdc_hot_keys_match_python(spark):
    """Top changed keys must match a replay of the well-formed stream."""
    from debezium_cdc_kafka_spark.operators.cdc import cdc_hot_keys

    per_key = Counter(
        e["user_id"] for e in _read("events") if e["event_id"] % 97 != 13
    )
    total = sum(per_key.values())
    want = sorted(per_key.items(), key=lambda t: (-t[1], t[0]))[:10]
    rows = sorted(cdc_hot_keys(spark, SF_SMOKE).collect(), key=lambda r: r["rk"])
    assert len(rows) == 10
    for r, (u, n) in zip(rows, want):
        assert (r["user_id"], r["n_changes"]) == (u, n)
        assert abs(r["change_share"] - n / total) < 1e-6
        assert r["is_hot"] == int(n / total > 0.01)


def test_readability_matches_python(spark):
    """Flesch metrics must match a Python recompute per doc."""
    import re as _re

    from debezium_cdc_kafka_spark.operators.text import text_readability

    rows = {r["doc_id"]: r for r in text_readability(spark, SF_SMOKE).collect()}
    for d in _read("documents")[:200]:
        ws = [w for w in _re.split(r"[^a-z0-9]+", d["text"].lower()) if w]
        if not ws:
            assert d["doc_id"] not in rows
            continue
        sents = [s for s in _re.split(r"[.!?]+", d["text"]) if s.strip()]
        ns = max(len(sents), 1)
        syll = sum(max(len(_re.findall(r"[aeiouy]+", w)), 1) for w in ws)
        r = rows[d["doc_id"]]
        assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (
            len(ws),
            ns,
            syll,
        )
        fre = 206.835 - 1.015 * (len(ws) / ns) - 84.6 * (syll / len(ws))
        fk = 0.39 * (len(ws) / ns) + 11.8 * (syll / len(ws)) - 15.59
        assert abs(r["flesch_ease"] - fre) < 1e-3
        assert abs(r["fk_grade"] - fk) < 1e-3


def test_key_lifecycle_matches_python(spark):
    """Daily lifecycle census must match a replay of the well-formed stream."""
    from debezium_cdc_kafka_spark.operators.cdc import cdc_key_lifecycle

    per = defaultdict(list)
    for e in _read("events"):
        if e["event_id"] % 97 == 13:
            continue
        op = {"signup": "c", "error": "d"}.get(e["event_type"], "u")
        ms = int(e["ts"].timestamp() * 1000)
        per[(e["user_id"], ms // 86400000)].append((e["event_id"], op, ms))
    agg = defaultdict(lambda: [0, 0, 0, 0])  # n_key_days, n_ops, sum_u, sum_span
    for evs in per.values():
        evs.sort()
        ops = [o for _, o, _ in evs]
        n_c, n_u = ops.count("c"), ops.count("u")
        first_d = next((i for i, (eid, o, _) in enumerate(evs) if o == "d"), None)
        last_c = max(
            (i for i, (eid, o, _) in enumerate(evs) if o == "c"), default=None
        )
        if n_c > 0 and first_d is not None and last_c > first_d:
            cls = "resurrected"
        elif ops[-1] == "d":
            cls = "deleted"
        elif n_c == 0:
            cls = "orphan_updates"
        elif n_u > 0:
            cls = "active_updated"
        else:
            cls = "create_only"
        a = agg[cls]
        a[0] += 1
        a[1] += len(evs)
        a[2] += n_u
        a[3] += max(m for _, _, m in evs) - min(m for _, _, m in evs)
    rows = {r["lifecycle"]: r for r in cdc_key_lifecycle(spark, SF_SMOKE).collect()}
    assert set(rows) == set(agg)
    for cls, (nk, no, su, span) in agg.items():
        r = rows[cls]
        assert (r["n_key_days"], r["n_ops"]) == (nk, no)
        assert abs(r["avg_updates"] - su / nk) < 1e-5
        assert abs(r["avg_lifespan_ms"] - span / nk) < 1e-3


def test_asof_nearest_picks_closer_side(spark):
    """Nearest-asof must agree with a brute-force nearest-order scan."""
    from debezium_cdc_kafka_spark.operators.asof import (
        _NEAREST_TOL_DAYS,
        q_asof_nearest_tolerance,
    )

    orders = defaultdict(list)
    for o in _read("orders"):
        od = o["o_orderdate"]
        orders[o["o_custkey"]].append(
            (od.date() if hasattr(od, "date") else od, o["o_orderkey"])
        )
    rows = q_asof_nearest_tolerance(spark, SF_SMOKE).collect()
    assert rows
    n_checked = 0
    for r in rows[:300]:
        cands = orders.get(r["user_id"], [])
        ev = next(e for e in _read("events") if e["event_id"] == r["event_id"])
        evd = ev["ts"].date()
        # brute force: per side the nearest (ties: backward wins; within a
        # side the engine's tiebreak is highest orderkey at equal dates)
        bwd = [(evd - d, k) for d, k in cands if d <= evd]
        fwd = [(d - evd, k) for d, k in cands if d > evd]
        db = min(bwd)[0].days if bwd else None
        df = min(fwd)[0].days if fwd else None
        tol = _NEAREST_TOL_DAYS
        if db is not None and db <= tol and (df is None or df > tol or db <= df):
            assert r["side"] == "b"
            assert r["delta_days"] == db
        elif df is not None and df <= tol:
            assert r["side"] == "f"
            assert r["delta_days"] == df
        else:
            assert r["side"] == "none"
            assert r["nearest_orderkey"] is None
        n_checked += 1
    assert n_checked > 0


def test_silhouette_matches_python(spark):
    """Per-cluster mean simplified silhouette vs a NumPy recompute."""
    import numpy as np

    from debezium_cdc_kafka_spark.operators.similarity import q_simplified_silhouette

    import hashlib

    emb = _read("embeddings")
    seeds = sorted(
        emb, key=lambda e: (hashlib.md5(str(e["vec_id"]).encode()).hexdigest(), e["vec_id"])
    )[:8]
    C = np.array([s["embedding"] for s in seeds], dtype=np.float64)
    cid = [s["vec_id"] for s in seeds]
    per = defaultdict(list)
    for e in emb:
        v = np.array(e["embedding"], dtype=np.float64)
        d2 = np.round(((C - v) ** 2).sum(axis=1), 6)
        order = sorted(range(8), key=lambda i: (d2[i], cid[i]))
        a, b = math.sqrt(d2[order[0]]), math.sqrt(d2[order[1]])
        s = 0.0 if max(a, b) == 0 else (b - a) / max(a, b)
        per[cid[order[0]]].append(int(round(s * 1e6)))
    rows = {r["cluster_id"]: r for r in q_simplified_silhouette(spark, SF_SMOKE).collect()}
    assert set(rows) == set(per)
    for c, micros in per.items():
        assert rows[c]["n_points"] == len(micros)
        assert abs(rows[c]["mean_silhouette"] - sum(micros) / (len(micros) * 1e6)) < 2e-6
        assert -1.0 <= rows[c]["mean_silhouette"] <= 1.0


def test_source_overlap_matches_python(spark):
    """Source-pair shared-span counts vs a Python set recompute, and the
    hot-span boilerplate cap must actually drop spans."""
    from debezium_cdc_kafka_spark.operators.dedup import (
        _OVL_MAX_SRC,
        _OVL_MIN_SHARED,
        dedup_source_overlap,
    )

    src_spans = defaultdict(set)
    for d in _read("documents"):
        tk = [t for t in d["text"].split(" ") if t]
        for i in range(len(tk) - 7):
            src_spans[d["source"]].add(" ".join(tk[i : i + 8]))
    # apply the hot-span cap
    count = Counter(h for s in src_spans.values() for h in s)
    dropped = sum(1 for h, c in count.items() if c > _OVL_MAX_SRC)
    kept = {s: {h for h in hs if count[h] <= _OVL_MAX_SRC} for s, hs in src_spans.items()}
    rows = {
        (r["source_a"], r["source_b"]): r
        for r in dedup_source_overlap(spark, SF_SMOKE).collect()
    }
    expect = {}
    for a in kept:
        for b in kept:
            if a < b:
                sh = len(kept[a] & kept[b])
                if sh >= _OVL_MIN_SHARED:
                    expect[(a, b)] = (sh, sh / min(len(kept[a]), len(kept[b])))
    assert set(rows) == set(expect)
    for k, (sh, cont) in expect.items():
        assert rows[k]["shared_spans"] == sh
        assert abs(rows[k]["containment"] - cont) < 1e-6
