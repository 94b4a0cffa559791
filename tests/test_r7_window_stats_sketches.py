"""Independent Python recomputes for the r7-window stats, approx-sketch,
as-of, and windowed-top-k queries (third-engine discipline, same as
test_r7_window_relational.py): md5 sign/bucket hashes, AUC rank sums,
Gini stump splits, CUPED/DiD/QTE/power arithmetic, and the Bloom/AMS
sketches are all deterministic, so plain Python reproduces them exactly
from the raw parquet.

Covered: q_classifier_auc, q_decision_stump, q_mutual_information,
q_anova_oneway, q_weighted_median_udaf, q_cuped_adjustment,
q_diff_in_diff, q_quantile_treatment_effect, q_power_analysis,
q_bloom_fpr_audit, q_ams_f2_sketch, q_join_size_sketch,
q_spacesaving_heavy_hitters, q_hll_time_rollup, q_bitmap_distinct_users,
q_windowed_topk_types, q_asof_nearest_tolerance.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict
from datetime import datetime, timedelta
from decimal import ROUND_HALF_UP, Decimal

import pyarrow.parquet as pq

from tests.conftest import SF_SMOKE

_STOPWORDS = {"the", "a", "of", "and", "to", "in", "is", "on", "for", "with"}


def _read(table: str) -> list[dict]:
    return pq.read_table(f"{SF_SMOKE}/{table}.parquet").to_pylist()


def _r(x: float, d: int) -> float:
    q = Decimal(1).scaleb(-d)
    return float(Decimal(repr(float(x))).quantize(q, rounding=ROUND_HALF_UP))


def _ri(x: float) -> int:
    return int(Decimal(repr(float(x))).quantize(Decimal(1), rounding=ROUND_HALF_UP))


def _cents(x: float) -> int:
    return _ri(float(x) * 100)


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _qcont(vals: list[float], q: float) -> float:
    s = sorted(vals)
    if len(s) == 1:
        return float(s[0])
    pos = (len(s) - 1) * q
    lo = int(pos)
    hi = min(lo + 1, len(s) - 1)
    frac = pos - lo
    return s[lo] * (1 - frac) + s[hi] * frac


def _doc_features() -> list[dict]:
    """The shared text-feature block of q_classifier_auc/q_decision_stump:
    token split on [^a-z0-9]+ over lower(text), published 4dp rounding."""
    out = []
    for d in _read("documents"):
        text = d["text"]
        low = text.lower()
        toks = [t for t in re.split("[^a-z0-9]+", low) if t != ""]
        n = len(toks)
        sw = _r(sum(1 for t in toks if t in _STOPWORDS) / max(n, 1), 4)
        punct = _r(
            sum(1 for ch in low if not (ch.isascii() and (ch.isalnum() or ch == " ")))
            / max(len(text), 1),
            4,
        )
        al = _r(len(text.replace(" ", "")) / max(n, 1), 4)
        out.append(
            {
                "doc_id": d["doc_id"],
                "lang": d["lang"],
                "n_tokens": n,
                "sw": sw,
                "punct": punct,
                "al": al,
            }
        )
    return out


def test_classifier_auc_matches_python_rank_sum(spark):
    from debezium_cdc_kafka_spark.operators.stats import q_classifier_auc

    labeled = []
    for f in _doc_features():
        z = -2.0 + 6.0 * f["sw"] - 8.0 * f["punct"] + 0.01 * min(f["n_tokens"], 300) + 0.2 * f["al"]
        score = _r(1.0 / (1.0 + math.exp(-_r(z, 6))), 4)
        labeled.append((score, 1 if f["lang"] == "en" else 0))
    grp: dict[float, list[int]] = defaultdict(lambda: [0, 0])
    for sc, pos in labeled:
        grp[sc][0] += 1
        grp[sc][1] += pos
    below = 0
    r2 = npos = nneg = 0
    for sc in sorted(grp):
        c, p = grp[sc]
        r2 += p * (2 * below + c + 1)
        npos += p
        nneg += c - p
        below += c

    [r] = q_classifier_auc(spark, SF_SMOKE).collect()
    assert (r["n_pos"], r["n_neg"]) == (npos, nneg)
    assert abs(r["auc"] - (r2 - npos * (npos + 1)) / (2.0 * npos * nneg)) <= 5.1e-7
    assert abs(r["gini"] - ((r2 - npos * (npos + 1)) / (1.0 * npos * nneg) - 1.0)) <= 5.1e-7


def test_decision_stump_matches_python_gini_scan(spark):
    from debezium_cdc_kafka_spark.operators.stats import q_decision_stump

    feats = _doc_features()
    cols = {
        "n_tokens": lambda f: float(f["n_tokens"]),
        "avg_token_len": lambda f: f["al"],
        "punct_ratio": lambda f: f["punct"],
        "stopword_ratio": lambda f: f["sw"],
    }
    best_rows = {}
    for name, get in cols.items():
        grp: dict[float, list[int]] = defaultdict(lambda: [0, 0])
        for f in feats:
            g = grp[get(f)]
            g[0] += 1
            g[1] += 1 if f["lang"] == "en" else 0
        n = sum(c for c, _ in grp.values())
        pos = sum(p for _, p in grp.values())
        nl = pl = 0
        best = None
        for val in sorted(grp):
            c, p = grp[val]
            nl += c
            pl += p
            nr = n - nl
            if nr <= 0:
                continue
            pr = pos - pl
            num = (nl * nl - (pl * pl + (nl - pl) * (nl - pl))) * nr + (
                nr * nr - (pr * pr + (nr - pr) * (nr - pr))
            ) * nl
            den = nl * nr
            key = (num / den, val)
            if best is None or key < best[0]:
                best = (key, (val, nl, nr, pl, pr, num, den, n))
        if best is not None:  # single-valued feature (punct_ratio here): no split
            best_rows[name] = best[1]
    global_best = min(best_rows, key=lambda f: (best_rows[f][5] / best_rows[f][6], f))

    rows = {r["feature"]: r for r in q_decision_stump(spark, SF_SMOKE).collect()}
    assert set(rows) == set(best_rows)
    for name, r in rows.items():
        val, nl, nr, pl, pr, num, den, n = best_rows[name]
        assert abs(r["threshold"] - val) <= 5.1e-5
        assert (r["n_left"], r["n_right"], r["pos_left"], r["pos_right"]) == (nl, nr, pl, pr)
        assert (r["gini_num"], r["gini_den"]) == (num, den)
        assert abs(r["wgini"] - num / den / n) <= 5.1e-7
        assert r["is_global_best"] == int(name == global_best)
    assert global_best in rows


def test_mutual_information_matches_python_terms(spark):
    from debezium_cdc_kafka_spark.operators.stats import q_mutual_information

    cell: Counter = Counter()
    for d in _read("documents"):
        cell[(d["lang"], d["source"])] += 1
    n = sum(cell.values())
    nx: Counter = Counter()
    ny: Counter = Counter()
    for (lang, src), c in cell.items():
        nx[lang] += c
        ny[src] += c
    terms = {
        k: _r((c / n) * math.log(c * n / (nx[k[0]] * ny[k[1]])), 9)
        for k, c in cell.items()
    }
    total = sum(terms.values())

    rows = {(r["lang"], r["source"]): r for r in q_mutual_information(spark, SF_SMOKE).collect()}
    assert set(rows) == set(cell)
    for k, r in rows.items():
        assert r["n_xy"] == cell[k]
        assert abs(r["mi_term"] - terms[k]) <= 5.1e-10
        assert abs(r["mi_total"] - total) <= 5.1e-7


def test_anova_oneway_matches_python_moments(spark):
    from debezium_cdc_kafka_spark.operators.stats import q_anova_oneway

    seg = {c["c_custkey"]: c["c_mktsegment"] for c in _read("customer")}
    grp: dict[str, list[int]] = defaultdict(list)
    for o in _read("orders"):
        grp[seg[o["o_custkey"]]].append(_cents(o["o_totalprice"]))
    k = len(grp)
    n_tot = sum(len(v) for v in grp.values())
    s1_tot = sum(sum(v) for v in grp.values())
    s2_tot = sum(sum(x * x for x in v) for v in grp.values())
    sq_grp = sum(sum(v) ** 2 / len(v) for v in grp.values())
    ssb = (sq_grp - s1_tot**2 / n_tot) / 10000.0
    ssw = (s2_tot - sq_grp) / 10000.0
    sst = (s2_tot - s1_tot**2 / n_tot) / 10000.0

    [r] = q_anova_oneway(spark, SF_SMOKE).collect()
    assert (r["k"], r["n_total"], r["df_between"], r["df_within"]) == (
        k,
        n_tot,
        k - 1,
        n_tot - k,
    )
    assert abs(r["f_stat"] - (ssb / (k - 1)) / (ssw / (n_tot - k))) <= 5.1e-6
    assert abs(r["eta_squared"] - ssb / sst) <= 5.1e-9


def test_weighted_median_matches_python_walk(spark):
    from debezium_cdc_kafka_spark.operators.stats import q_weighted_median_udaf

    grp: dict[str, list[tuple]] = defaultdict(list)
    for l in _read("lineitem"):
        grp[l["l_returnflag"]].append((l["l_extendedprice"], int(l["l_quantity"])))

    rows = {r["l_returnflag"]: r for r in q_weighted_median_udaf(spark, SF_SMOKE).collect()}
    assert set(rows) == set(grp)
    for flag, pairs in grp.items():
        pairs.sort()
        total = sum(w for _, w in pairs)
        cum = 0
        med = None
        for v, w in pairs:
            cum += w
            if 2 * cum >= total:
                med = v
                break
        r = rows[flag]
        assert r["total_weight"] == total
        assert abs(r["weighted_median"] - med) <= 5.1e-3


def _per_user_spend() -> dict[int, list[int]]:
    """user -> [pre_cents, post_cents] split at 2024-01-16."""
    cut = datetime(2024, 1, 16)
    per: dict[int, list[int]] = defaultdict(lambda: [0, 0])
    for e in _read("events"):
        per[e["user_id"]][0 if e["ts"] < cut else 1] += _cents(e["value"])
    return per


def _arm(user_id: int) -> int:
    return _md5_long(str(user_id)) % 2


def test_cuped_adjustment_matches_python_theta(spark):
    from debezium_cdc_kafka_spark.operators.stats import q_cuped_adjustment

    per = _per_user_spend()
    n = len(per)
    xs = [p for p, _ in per.values()]
    ys = [q for _, q in per.values()]
    mx = sum(xs) / n
    my = sum(ys) / n
    cov = sum(x * y for x, y in zip(xs, ys)) / n - mx * my
    vx = sum(x * x for x in xs) / n - mx * mx
    vy = sum(y * y for y in ys) / n - my * my
    arms: dict[int, list] = defaultdict(lambda: [0, 0, 0])
    for u, (pre, post) in per.items():
        a = arms[_arm(u)]
        a[0] += 1
        a[1] += pre
        a[2] += post

    rows = {r["arm"]: r for r in q_cuped_adjustment(spark, SF_SMOKE).collect()}
    assert set(rows) == set(arms)
    for arm, (nu, ax, ay) in arms.items():
        r = rows[arm]
        assert r["n_users"] == nu
        assert abs(r["mean_post"] - ay / nu / 100.0) <= 5.1e-5
        cuped = (ay / nu - (cov / vx) * (ax / nu - mx)) / 100.0
        assert abs(r["mean_post_cuped"] - cuped) <= 5.1e-5
        assert abs(r["theta"] - cov / vx) <= 5.1e-7
        assert abs(r["rho2"] - cov * cov / (vx * vy)) <= 5.1e-7


def test_diff_in_diff_matches_python_arms(spark):
    from debezium_cdc_kafka_spark.operators.stats import q_diff_in_diff

    arms: dict[int, list] = defaultdict(lambda: [0, 0, 0])
    for u, (pre, post) in _per_user_spend().items():
        a = arms[_arm(u)]
        a[0] += 1
        a[1] += pre
        a[2] += post
    deltas = {
        arm: sp[2] / sp[0] / 100.0 - sp[1] / sp[0] / 100.0 for arm, sp in arms.items()
    }
    did = deltas[1] - deltas[0]

    rows = {r["arm"]: r for r in q_diff_in_diff(spark, SF_SMOKE).collect()}
    assert set(rows) == set(arms)
    for arm, (nu, pre, post) in arms.items():
        r = rows[arm]
        assert r["n_users"] == nu
        assert abs(r["mean_pre"] - pre / nu / 100.0) <= 5.1e-5
        assert abs(r["mean_post"] - post / nu / 100.0) <= 5.1e-5
        assert abs(r["delta"] - deltas[arm]) <= 5.1e-5
        assert abs(r["did"] - did) <= 5.1e-5


def test_qte_matches_python_interpolated_quantiles(spark):
    from debezium_cdc_kafka_spark.operators.stats import q_quantile_treatment_effect

    by_arm: dict[int, list[int]] = defaultdict(list)
    for u, (_pre, post) in _per_user_spend().items():
        by_arm[_arm(u)].append(post)

    rows = {r["pct"]: r for r in q_quantile_treatment_effect(spark, SF_SMOKE).collect()}
    assert set(rows) == {0.25, 0.5, 0.75}
    for pct, r in rows.items():
        qt = _qcont(by_arm[1], pct)
        qc = _qcont(by_arm[0], pct)
        assert abs(r["q_treat"] - qt / 100.0) <= 5.1e-5
        assert abs(r["q_control"] - qc / 100.0) <= 5.1e-5
        assert abs(r["qte"] - (qt - qc) / 100.0) <= 5.1e-5


def test_power_analysis_matches_python_formula(spark):
    from debezium_cdc_kafka_spark.operators.stats import q_power_analysis

    ctl = [
        pre + post for u, (pre, post) in _per_user_spend().items() if _arm(u) == 0
    ]
    n = len(ctl)
    mu = sum(ctl) / n
    var = sum(x * x for x in ctl) / n - mu * mu
    zsum = 2.801585

    [r] = q_power_analysis(spark, SF_SMOKE).collect()
    assert r["n_control"] == n
    assert abs(r["mean_spend"] - mu / 100.0) <= 5.1e-5
    assert abs(r["sd_spend"] - math.sqrt(var) / 100.0) <= 5.1e-5
    assert r["mde_rel_target"] == 0.05
    assert r["n_required_per_arm"] == math.ceil(
        2.0 * var * zsum * zsum / ((mu * 0.05) * (mu * 0.05))
    )
    assert abs(r["mde_rel_at_current_n"] - math.sqrt(2.0 * var * zsum * zsum / n) / mu) <= 5.1e-7


# ---------------------------------------------------------------------------
# approx sketches
# ---------------------------------------------------------------------------


def test_bloom_fpr_audit_matches_python_bitset(spark):
    from debezium_cdc_kafka_spark.operators.approx import q_bloom_fpr_audit

    auto = {
        c["c_custkey"] for c in _read("customer") if c["c_mktsegment"] == "AUTOMOBILE"
    }
    members = {o["o_orderkey"] for o in _read("orders") if o["o_custkey"] in auto}
    probes = {o["o_orderkey"] for o in _read("orders")} - members

    def pos(k: int, i: int) -> int:
        return _md5_long(f"{k}:{i}") % 16384

    bits = {pos(k, i) for k in members for i in range(3)}
    n_fp = sum(1 for k in probes if all(pos(k, i) in bits for i in range(3)))

    [r] = q_bloom_fpr_audit(spark, SF_SMOKE).collect()
    assert (r["m"], r["k"]) == (16384, 3)
    assert (r["n_keys"], r["n_bits_set"], r["n_probes"]) == (
        len(members),
        len(bits),
        len(probes),
    )
    assert r["n_false_pos"] == n_fp
    assert abs(r["fpr_observed"] - n_fp / len(probes)) <= 5.1e-7
    assert abs(r["fpr_occupancy"] - (len(bits) / 16384) ** 3) <= 5.1e-7
    assert abs(r["fpr_theory"] - (1.0 - math.exp(-3.0 * len(members) / 16384)) ** 3) <= 5.1e-7


def _ams_median(zs: list[int]) -> float:
    """Median-of-16 as avg of sort-ranks 8 and 9 over (z², i)."""
    xs = sorted((z * z, i) for i, z in enumerate(zs))
    return (xs[7][0] + xs[8][0]) / 2.0


def test_ams_f2_sketch_matches_python_signs(spark):
    from debezium_cdc_kafka_spark.operators.approx import q_ams_f2_sketch

    freq: Counter = Counter(l["l_partkey"] for l in _read("lineitem"))
    f2_exact = sum(f * f for f in freq.values())
    zs = [
        sum(f * (1 - 2 * (_md5_long(f"{k}:{i}") % 2)) for k, f in freq.items())
        for i in range(16)
    ]
    est = _ams_median(zs)

    [r] = q_ams_f2_sketch(spark, SF_SMOKE).collect()
    assert (r["r"], r["f2_exact"]) == (16, f2_exact)
    assert abs(r["f2_estimate"] - est) <= 5.1e-1
    assert abs(r["rel_error"] - abs(est - f2_exact) / f2_exact) <= 5.1e-7


def test_join_size_sketch_matches_python_signs(spark):
    from debezium_cdc_kafka_spark.operators.approx import q_join_size_sketch

    fa: Counter = Counter(o["o_orderkey"] for o in _read("orders"))
    fb: Counter = Counter(l["l_orderkey"] for l in _read("lineitem"))
    exact = sum(fa[k] * fb[k] for k in fa.keys() & fb.keys())

    def z(freq: Counter, i: int) -> int:
        return sum(f * (1 - 2 * (_md5_long(f"{k}:{i}") % 2)) for k, f in freq.items())

    prods = sorted((z(fa, i) * z(fb, i), i) for i in range(16))
    est = (prods[7][0] + prods[8][0]) / 2.0

    [r] = q_join_size_sketch(spark, SF_SMOKE).collect()
    assert (r["r"], r["exact_join_size"]) == (16, exact)
    assert abs(r["sketch_estimate"] - est) <= 5.1e-1
    assert abs(r["rel_error"] - abs(est - exact) / exact) <= 5.1e-7


def test_spacesaving_top10_matches_python_counts(spark):
    from debezium_cdc_kafka_spark.operators.approx import q_spacesaving_heavy_hitters

    toks: Counter = Counter()
    for d in _read("documents"):
        toks.update(t for t in d["text"].split(" ") if t != "")
    total = sum(toks.values())
    top = sorted(toks.items(), key=lambda kv: (-kv[1], kv[0]))[:10]

    rows = q_spacesaving_heavy_hitters(spark, SF_SMOKE).collect()
    got = [(r["term"], r["exact_count"]) for r in rows]
    assert sorted(got, key=lambda kv: (-kv[1], kv[0])) == top
    for r in rows:
        assert r["guaranteed_heavy"] == int(toks[r["term"]] * 513 > total)
        assert r["present_ok"] == 1 and r["bound_ok"] == 1


def test_hll_time_rollup_matches_python_census(spark):
    from debezium_cdc_kafka_spark.operators.approx import q_hll_time_rollup

    users: dict = defaultdict(set)
    hours: dict = defaultdict(set)
    for e in _read("events"):
        d = e["ts"].date()
        users[d].add(e["user_id"])
        hours[d].add(e["ts"].replace(minute=0, second=0, microsecond=0))

    rows = {r["day"]: r for r in q_hll_time_rollup(spark, SF_SMOKE).collect()}
    assert set(rows) == set(users)
    for d, r in rows.items():
        assert r["exact_daily"] == len(users[d])
        assert r["n_hours"] == len(hours[d])
        assert r["within_bound"] is True


def test_bitmap_distinct_matches_python_sets(spark):
    from debezium_cdc_kafka_spark.operators.approx import q_bitmap_distinct_users

    per: dict = defaultdict(set)
    allu = set()
    for e in _read("events"):
        per[e["event_type"]].add(e["user_id"])
        allu.add(e["user_id"])

    rows = {r["event_type"]: r["distinct_users"] for r in q_bitmap_distinct_users(spark, SF_SMOKE).collect()}
    assert rows.pop("_all_types") == len(allu)
    assert rows == {t: len(u) for t, u in per.items()}


def test_windowed_topk_types_matches_python_buckets(spark):
    from debezium_cdc_kafka_spark.operators.windows import q_windowed_topk_types

    buckets: dict = defaultdict(Counter)
    for e in _read("events"):
        buckets[e["ts"].replace(minute=0, second=0, microsecond=0)][e["event_type"]] += 1
    expected = {}
    for ws, cnt in buckets.items():
        ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        for rk, (t, n) in enumerate(ranked, 1):
            expected[(ws.strftime("%Y-%m-%d %H:%M:%S"), t)] = (n, rk)

    rows = q_windowed_topk_types(spark, SF_SMOKE).collect()
    got = {(r["window_start"], r["event_type"]): (r["n"], r["rk"]) for r in rows}
    assert got == expected


def test_asof_nearest_tolerance_matches_python_scan(spark):
    """Nearest order within ±30 days per sampled event: backward = max
    orderdate ≤ event ts (tie: max orderkey), forward = min orderdate ≥
    event ts (tie: max orderkey), backward wins ties; the 2024 events
    vs ≤2001 orders fixture makes 'none' the common case, which is
    exactly what the tolerance clause must produce."""
    from debezium_cdc_kafka_spark.operators.asof import q_asof_nearest_tolerance

    orders: dict[int, list[tuple]] = defaultdict(list)
    for o in _read("orders"):
        orders[o["o_custkey"]].append((o["o_orderdate"], o["o_orderkey"]))
    for v in orders.values():
        v.sort()

    expected = {}
    for e in _read("events"):
        if e["event_id"] % 10 != 0:
            continue
        cand = orders.get(e["user_id"], [])
        bwd = max(
            ((t, k) for t, k in cand if t <= e["ts"]), key=lambda tk: tk, default=None
        )
        fwd_all = [(t, k) for t, k in cand if t >= e["ts"]]
        fwd = None
        if fwd_all:
            tmin = min(t for t, _ in fwd_all)
            fwd = (tmin, max(k for t, k in fwd_all if t == tmin))
        db = (e["ts"].date() - bwd[0].date()).days if bwd else None
        df = (fwd[0].date() - e["ts"].date()).days if fwd else None
        if db is not None and db <= 30 and (df is None or df > 30 or db <= df):
            side, pick, delta = "b", bwd, db
        elif df is not None and df <= 30:
            side, pick, delta = "f", fwd, df
        else:
            side, pick, delta = "none", None, None
        expected[e["event_id"]] = (
            e["user_id"],
            side,
            pick[1] if pick else None,
            pick[0].strftime("%Y-%m-%d") if pick else None,
            delta,
        )

    rows = {r["event_id"]: r for r in q_asof_nearest_tolerance(spark, SF_SMOKE).collect()}
    assert set(rows) == set(expected)
    for eid, (uid, side, key, dt, delta) in expected.items():
        r = rows[eid]
        assert (r["user_id"], r["side"]) == (uid, side), eid
        assert (r["nearest_orderkey"], r["nearest_orderdate"], r["delta_days"]) == (
            key,
            dt,
            delta,
        ), eid
