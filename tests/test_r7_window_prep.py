"""Independent Python recomputes for r7-window queries whose only pytest
reference was an invariant/bounds check — pre-done in round 6 so the r7
rotation (the final never-gated batch) enters the gate with full
third-engine coverage, the same discipline as test_r6_window_ops.py.

Covered here: q_kaplan_meier, q_dau_mau_stickiness, q_user_concentration,
q_calibration_curve, q_winsorized_stats, q_psi_drift,
q_equidepth_histogram. (The sketch trio bloom/AMS/HLL keeps its
band-gate tests: their oracles already pin |estimate − exact| ≤ ε against
exact counts, which IS the definitional check for an approximate
operator.)

Rounding parity: Spark's F.round(x, d) on a double is
BigDecimal.valueOf(x).setScale(d, HALF_UP), i.e. decimal HALF_UP over the
SHORTEST decimal representation — exactly Decimal(repr(x)).quantize(...,
ROUND_HALF_UP) in Python. `_r` below mirrors it digit-for-digit, so bin
edges and 2dp boundaries cannot drift the way float-multiply-floor
implementations can.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pyarrow.parquet as pq

from tests.conftest import SF_SMOKE


def _read(table: str) -> list[dict]:
    return pq.read_table(f"{SF_SMOKE}/{table}.parquet").to_pylist()


def _r(x: float, d: int) -> float:
    """Spark F.round parity: HALF_UP over the shortest decimal repr."""
    q = Decimal(1).scaleb(-d)
    return float(Decimal(repr(float(x))).quantize(q, rounding=ROUND_HALF_UP))


def _ntile(rows: list, n_tiles: int) -> list[int]:
    """SQL ntile over an already-sorted list: first (len % n) tiles get
    one extra row."""
    n = len(rows)
    base, extra = divmod(n, n_tiles)
    out, i = [], 0
    for t in range(1, n_tiles + 1):
        size = base + (1 if t <= extra else 0)
        out.extend([t] * size)
        i += size
    return out


def test_kaplan_meier_matches_python_estimator(spark):
    """Full KM recompute: first-view entry, first-purchase event,
    end-of-observation censoring, risk sets, and the exp(Σ ln) walk."""
    from debezium_cdc_kafka_spark.operators.behavior import q_kaplan_meier

    ev = _read("events")
    hi = max(e["ts"] for e in ev).date()
    t_view: dict[int, object] = {}
    for e in ev:
        if e["event_type"] == "view":
            u = e["user_id"]
            if u not in t_view or e["ts"] < t_view[u]:
                t_view[u] = e["ts"]
    t_pur: dict[int, object] = {}
    for e in ev:
        u = e["user_id"]
        if e["event_type"] == "purchase" and u in t_view and e["ts"] >= t_view[u]:
            if u not in t_pur or e["ts"] < t_pur[u]:
                t_pur[u] = e["ts"]
    subj = []
    for u, tv in t_view.items():
        if u in t_pur:
            subj.append(((t_pur[u].date() - tv.date()).days, 1))
        else:
            subj.append(((hi - tv.date()).days, 0))
    perd: dict[int, list[int]] = defaultdict(lambda: [0, 0])
    for t, evt in subj:
        perd[t][0] += evt
        perd[t][1] += 1 - evt
    n_total = len(subj)
    expected, at_risk, cum_ln = {}, n_total, 0.0
    for t in sorted(perd):
        d, c = perd[t]
        cum_ln += _r(math.log(max(1.0 - d / at_risk, 1e-12)), 9)
        expected[t] = (d, c, at_risk, math.exp(cum_ln))
        at_risk -= d + c

    rows = {r["t"]: r for r in q_kaplan_meier(spark, SF_SMOKE).collect()}
    assert set(rows) == set(expected)
    for t, (d, c, n_risk, km) in expected.items():
        r = rows[t]
        assert (r["d_events"], r["c_censored"], r["n_risk"]) == (d, c, n_risk)
        assert abs(r["km_survival"] - km) <= 5.1e-7


def test_dau_mau_stickiness_matches_python_census(spark):
    from debezium_cdc_kafka_spark.operators.behavior import q_dau_mau_stickiness

    by_day: dict = defaultdict(set)
    by_month: dict = defaultdict(set)
    for e in _read("events"):
        d = e["ts"].date()
        by_day[d].add(e["user_id"])
        by_month[d.replace(day=1)].add(e["user_id"])

    rows = {r["d"]: r for r in q_dau_mau_stickiness(spark, SF_SMOKE).collect()}
    assert set(rows) == set(by_day)
    for d, users in by_day.items():
        dau, mau = len(users), len(by_month[d.replace(day=1)])
        r = rows[d]
        assert (r["dau"], r["mau"]) == (dau, mau)
        assert abs(r["stickiness"] - dau / mau) <= 5.1e-7


def test_user_concentration_matches_python_lorenz_table(spark):
    """Exact decile table: SQL-ntile the (n_events, user_id)-sorted users
    and rebuild every share from integer sums."""
    from debezium_cdc_kafka_spark.operators.behavior import (
        _CONC_TILES,
        q_user_concentration,
    )

    per_user = Counter(e["user_id"] for e in _read("events"))
    ranked = sorted(per_user.items(), key=lambda kv: (kv[1], kv[0]))
    tiles = _ntile(ranked, _CONC_TILES)
    total = sum(per_user.values())
    agg: dict[int, list[int]] = defaultdict(lambda: [0, 0])
    for (u, n), t in zip(ranked, tiles):
        agg[t][0] += 1
        agg[t][1] += n
    cum = 0
    expected = {}
    for t in sorted(agg):
        n_users, events = agg[t]
        cum += events
        expected[t] = (n_users, events, events / total, cum / total)

    rows = {r["decile"]: r for r in q_user_concentration(spark, SF_SMOKE).collect()}
    assert set(rows) == set(expected)
    for t, (n_users, events, share, cum_share) in expected.items():
        r = rows[t]
        assert (r["n_users"], r["events"]) == (n_users, events)
        assert abs(r["event_share"] - share) <= 5.1e-7
        assert abs(r["cum_share"] - cum_share) <= 5.1e-7


def _quality_scores() -> dict[int, float]:
    """text_quality_classifier recomputed from raw parquet (4dp scores)."""
    import re

    from debezium_cdc_kafka_spark.operators.text import STOPWORDS

    scores = {}
    for d in _read("documents"):
        text = d["text"]
        toks = [t for t in re.split("[^a-z0-9]+", text.lower()) if t != ""]
        n_toks = len(toks)
        sw = _r(sum(1 for t in toks if t in STOPWORDS) / max(n_toks, 1), 4)
        punct = _r(
            len(re.sub("[a-z0-9 ]", "", text.lower())) / max(len(text), 1), 4
        )
        nt = min(n_toks, 300)
        al = _r(len(text.replace(" ", "")) / max(n_toks, 1), 4)
        z = _r((((-2.0 + 6.0 * sw) - 8.0 * punct) + 0.01 * nt) + 0.2 * al, 6)
        scores[d["doc_id"]] = _r(1.0 / (1.0 + math.exp(-z)), 4)
    return scores


def test_calibration_curve_matches_python_bins(spark):
    """Reliability diagram recomputed end-to-end: the classifier's score
    formula, the bin assignment, and the integer-scaled bin stats."""
    from debezium_cdc_kafka_spark.operators.stats import (
        _CAL_BINS,
        q_calibration_curve,
    )

    scores = _quality_scores()
    lang = {d["doc_id"]: d["lang"] for d in _read("documents")}
    bins: dict[int, list] = defaultdict(lambda: [0, 0, 0, 0])  # n, pos, sp4, br8
    for doc, sc in scores.items():
        b = min(int(math.floor(sc * _CAL_BINS)), _CAL_BINS - 1)
        y = 1 if lang[doc] == "en" else 0
        a = bins[b]
        a[0] += 1
        a[1] += y
        a[2] += int(_r(sc * 10000, 0))
        a[3] += int(_r((sc - y) * (sc - y) * 100000000, 0))

    rows = {r["bin"]: r for r in q_calibration_curve(spark, SF_SMOKE).collect()}
    assert set(rows) == set(bins)
    for b, (n, pos, sp4, br8) in bins.items():
        r = rows[b]
        assert (r["n"], r["n_pos"]) == (n, pos)
        assert abs(r["mean_pred"] - sp4 / n / 10000.0) <= 5.1e-7
        assert abs(r["frac_pos"] - pos / n) <= 5.1e-7
        assert abs(r["brier"] - br8 / n / 100000000.0) <= 5.1e-7


def _pct_linear(sorted_vals: list[float], p: float) -> float:
    """quantile_cont / Spark percentile(): linear interpolation."""
    n = len(sorted_vals)
    pos = p * (n - 1)
    lo = int(math.floor(pos))
    hi = min(lo + 1, n - 1)
    frac = pos - lo
    return sorted_vals[lo] + (sorted_vals[hi] - sorted_vals[lo]) * frac


def test_winsorized_stats_match_python_clamps(spark):
    from debezium_cdc_kafka_spark.operators.stats import _WINS_P, q_winsorized_stats

    cust = {c["c_custkey"]: c["c_mktsegment"] for c in _read("customer")}
    by_seg: dict[str, list[float]] = defaultdict(list)
    for o in _read("orders"):
        by_seg[cust[o["o_custkey"]]].append(o["o_totalprice"])

    rows = {r["c_mktsegment"]: r for r in q_winsorized_stats(spark, SF_SMOKE).collect()}
    assert set(rows) == set(by_seg)
    for seg, vals in by_seg.items():
        sv = sorted(vals)
        lo, hi = _pct_linear(sv, _WINS_P), _pct_linear(sv, 1 - _WINS_P)
        n = len(vals)
        raw = sum(int(_r(v * 100, 0)) for v in vals) / n / 100.0
        wins = (
            sum(int(_r(min(max(v, lo), hi) * 100, 0)) for v in vals) / n / 100.0
        )
        kept = [v for v in vals if lo <= v <= hi]
        trim = sum(int(_r(v * 100, 0)) for v in kept) / len(kept) / 100.0
        r = rows[seg]
        assert r["n"] == n
        assert abs(r["raw_mean"] - raw) <= 5.1e-7
        assert abs(r["winsorized_mean"] - wins) <= 5.1e-7
        assert abs(r["trimmed_mean"] - trim) <= 5.1e-7


def test_psi_drift_matches_python_terms(spark):
    from debezium_cdc_kafka_spark.operators.stats import _PSI_BINS, q_psi_drift

    pop = [
        (o["o_totalprice"], 1 if o["o_orderdate"].year == 1996 else 0)
        for o in _read("orders")
        if o["o_orderdate"].year in (1996, 1997)
    ]
    lo = min(x for x, _ in pop)
    hi = max(x for x, _ in pop)
    counts = {b: [0, 0] for b in range(_PSI_BINS)}
    for x, is_base in pop:
        b = min(_PSI_BINS - 1, int(math.floor((x - lo) / (hi - lo) * _PSI_BINS)))
        counts[b][0] += is_base
        counts[b][1] += 1 - is_base
    tb = sum(v[0] for v in counts.values())
    tc = sum(v[1] for v in counts.values())
    terms, total = {}, 0.0
    for b, (nb, nc) in counts.items():
        p = (nb + 0.5) / (tb + _PSI_BINS * 0.5)
        q = (nc + 0.5) / (tc + _PSI_BINS * 0.5)
        t = (p - q) * _r(math.log(p / q), 9)
        terms[b] = (nb, nc, t)
        total += t

    rows = {r["bin"]: r for r in q_psi_drift(spark, SF_SMOKE).collect()}
    assert set(rows) == set(terms)
    for b, (nb, nc, t) in terms.items():
        r = rows[b]
        assert (r["n_base"], r["n_cur"]) == (nb, nc)
        assert abs(r["psi_term"] - t) <= 5.1e-9
        assert abs(r["psi_total"] - total) <= 5.1e-7


def test_equidepth_histogram_matches_python_ntile(spark):
    from debezium_cdc_kafka_spark.operators.reshape import (
        _ED_BUCKETS,
        q_equidepth_histogram,
    )

    orders = sorted(
        ((o["o_totalprice"], o["o_orderkey"]) for o in _read("orders")),
    )
    tiles = _ntile(orders, _ED_BUCKETS)
    agg: dict[int, list] = defaultdict(list)
    for (v, _), t in zip(orders, tiles):
        agg[t].append(v)

    rows = {r["bucket"]: r for r in q_equidepth_histogram(spark, SF_SMOKE).collect()}
    assert set(rows) == set(agg)
    for t, vals in agg.items():
        r = rows[t]
        assert r["n"] == len(vals)
        assert r["lo"] == _r(min(vals), 2)
        assert r["hi"] == _r(max(vals), 2)
