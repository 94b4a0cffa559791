"""Independent Python recomputes for the r7-window behavior and
timeseries queries (same third-engine discipline as
test_r7_window_relational.py): replay the raw events parquet in plain
Python — per-user sequence walks, attribution windows, cohort grids —
and compare against the Spark output at the published rounding.

Covered: q_next_event_accuracy, q_new_vs_returning,
q_interarrival_burstiness, q_window_funnel, q_attribution_linear,
q_attribution_time_decay, q_ltv_cohort_curve, q_engagement_by_segment,
q_conversion_cdf, q_weekday_effect, q_mann_kendall.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from datetime import date, datetime, timedelta
from decimal import ROUND_HALF_UP, Decimal

import pyarrow.parquet as pq

from tests.conftest import SF_SMOKE

_EPOCH = datetime(1970, 1, 1)
_DAY_US = 86_400_000_000
_H6_US = 6 * 3600 * 1_000_000


def _read(table: str) -> list[dict]:
    return pq.read_table(f"{SF_SMOKE}/{table}.parquet").to_pylist()


def _r(x: float, d: int) -> float:
    q = Decimal(1).scaleb(-d)
    return float(Decimal(repr(float(x))).quantize(q, rounding=ROUND_HALF_UP))


def _ri(x: float) -> int:
    return int(Decimal(repr(float(x))).quantize(Decimal(1), rounding=ROUND_HALF_UP))


def _cents(x: float) -> int:
    return _ri(float(x) * 100)


def _us(ts: datetime) -> int:
    """Exact integer microseconds since epoch (no float round-trip)."""
    return (ts - _EPOCH) // timedelta(microseconds=1)


def _qcont(vals: list[float], q: float) -> float:
    s = sorted(vals)
    if len(s) == 1:
        return float(s[0])
    pos = (len(s) - 1) * q
    lo = int(pos)
    hi = min(lo + 1, len(s) - 1)
    frac = pos - lo
    return s[lo] * (1 - frac) + s[hi] * frac


def _by_user_sorted() -> dict[int, list[dict]]:
    per: dict[int, list[dict]] = defaultdict(list)
    for e in _read("events"):
        per[e["user_id"]].append(e)
    for evs in per.values():
        evs.sort(key=lambda e: (e["ts"], e["event_id"]))
    return per


def test_next_event_accuracy_matches_python_markov_argmax(spark):
    from debezium_cdc_kafka_spark.operators.behavior import q_next_event_accuracy

    pairs: Counter = Counter()
    for evs in _by_user_sorted().values():
        for a, b in zip(evs, evs[1:]):
            pairs[(a["event_type"], b["event_type"])] += 1
    per_from: dict[str, list[tuple]] = defaultdict(list)
    for (f, t), n in pairs.items():
        per_from[f].append((t, n))
    expected = {}
    for f, tos in per_from.items():
        pred = min(tos, key=lambda tn: (-tn[1], tn[0]))[0]
        n_pairs = sum(n for _, n in tos)
        n_correct = sum(n for t, n in tos if t == pred)
        expected[f] = (pred, n_pairs, n_correct)

    rows = {r["from_type"]: r for r in q_next_event_accuracy(spark, SF_SMOKE).collect()}
    assert set(rows) == set(expected)
    for f, (pred, n_pairs, n_correct) in expected.items():
        r = rows[f]
        assert (r["predicted"], r["n_pairs"], r["n_correct"]) == (pred, n_pairs, n_correct)
        assert abs(r["top1_accuracy"] - n_correct / n_pairs) <= 5.1e-7


def test_new_vs_returning_matches_python_census(spark):
    from debezium_cdc_kafka_spark.operators.behavior import q_new_vs_returning

    du = {(e["ts"].date(), e["user_id"]) for e in _read("events")}
    first: dict[int, date] = {}
    for d, u in du:
        if u not in first or d < first[u]:
            first[u] = d
    per_day: dict[date, list[int]] = defaultdict(lambda: [0, 0])
    for d, u in du:
        a = per_day[d]
        a[0] += 1
        if d > first[u]:
            a[1] += 1

    rows = {r["day"]: r for r in q_new_vs_returning(spark, SF_SMOKE).collect()}
    assert set(rows) == set(per_day)
    for d, (active, ret) in per_day.items():
        r = rows[d]
        assert (r["active_users"], r["new_users"], r["returning_users"]) == (
            active,
            active - ret,
            ret,
        )
        assert abs(r["returning_share"] - ret / active) <= 5.1e-7


def test_interarrival_burstiness_matches_python_moments(spark):
    from debezium_cdc_kafka_spark.operators.behavior import q_interarrival_burstiness

    gaps: dict[str, list[int]] = defaultdict(list)
    for evs in _by_user_sorted().values():
        for a, b in zip(evs, evs[1:]):
            gaps[b["event_type"]].append((_us(b["ts"]) - _us(a["ts"])) // 1_000_000)

    rows = {r["event_type"]: r for r in q_interarrival_burstiness(spark, SF_SMOKE).collect()}
    assert set(rows) == set(gaps)
    for t, gs in gaps.items():
        r = rows[t]
        n = len(gs)
        mu = sum(gs) / n
        sd = math.sqrt(max(sum(g * g for g in gs) / n - mu * mu, 0.0))
        assert r["n_gaps"] == n
        assert abs(r["mean_gap_s"] - mu) <= 5.1e-5
        assert abs(r["std_gap_s"] - sd) <= 5.1e-5
        assert abs(r["burstiness"] - (sd - mu) / (sd + mu)) <= 5.1e-7
        assert abs(r["median_gap_s"] - _qcont(gs, 0.5)) <= 5.1e-2


def test_window_funnel_matches_python_chain_walk(spark):
    """Replay the 6h signup→click→purchase chain per user: for every
    signup anchor take the FIRST later click and that click's FIRST
    later purchase; the deepest level over all anchors, both stage
    timestamps within 6h of the anchor."""
    from debezium_cdc_kafka_spark.operators.behavior import q_window_funnel

    levels: Counter = Counter()
    for evs in _by_user_sorted().values():
        seq = [
            (_us(e["ts"]), e["event_id"], e["event_type"])
            for e in evs
            if e["event_type"] in ("signup", "click", "purchase")
        ]
        best = 0
        for i, (t0, _eid, typ) in enumerate(seq):
            if typ != "signup":
                continue
            lvl = 1
            nc = next((j for j in range(i + 1, len(seq)) if seq[j][2] == "click"), None)
            if nc is not None and seq[nc][0] - t0 <= _H6_US:
                np_ = next(
                    (j for j in range(nc + 1, len(seq)) if seq[j][2] == "purchase"), None
                )
                lvl = 3 if np_ is not None and seq[np_][0] - t0 <= _H6_US else 2
            best = max(best, lvl)
        if best:
            levels[best] += 1
    total = sum(levels.values())

    rows = {r["funnel_level"]: r for r in q_window_funnel(spark, SF_SMOKE).collect()}
    assert set(rows) == set(levels)
    for lvl, users in levels.items():
        assert rows[lvl]["users"] == users
        assert abs(rows[lvl]["share"] - users / total) <= 5.1e-7


def _touch_events() -> dict[int, list[tuple]]:
    per: dict[int, list[tuple]] = defaultdict(list)
    for e in _read("events"):
        if e["event_type"] in ("view", "click", "purchase"):
            per[e["user_id"]].append((_us(e["ts"]), e["event_id"], e["event_type"]))
    return per


def test_attribution_linear_matches_python_window_counts(spark):
    from debezium_cdc_kafka_spark.operators.behavior import q_attribution_linear

    sum_cv = sum_cc = touched_v = touched_c = unattributed = 0
    for touches in _touch_events().values():
        for t, _eid, typ in touches:
            if typ != "purchase":
                continue
            nv = sum(
                1
                for t2, _e2, ty2 in touches
                if ty2 == "view" and t - _DAY_US <= t2 <= t - 1
            )
            nc = sum(
                1
                for t2, _e2, ty2 in touches
                if ty2 == "click" and t - _DAY_US <= t2 <= t - 1
            )
            n = nv + nc
            if n == 0:
                unattributed += 1
                continue
            sum_cv += _ri(1000000.0 * nv / n)
            sum_cc += _ri(1000000.0 * nc / n)
            touched_v += 1 if nv > 0 else 0
            touched_c += 1 if nc > 0 else 0

    rows = {r["touch_type"]: r for r in q_attribution_linear(spark, SF_SMOKE).collect()}
    assert set(rows) == {"view", "click", "_unattributed"}
    assert abs(rows["view"]["credited_purchases"] - sum_cv / 1e6) <= 5.1e-7
    assert rows["view"]["purchases_touched"] == touched_v
    assert abs(rows["click"]["credited_purchases"] - sum_cc / 1e6) <= 5.1e-7
    assert rows["click"]["purchases_touched"] == touched_c
    assert rows["_unattributed"]["credited_purchases"] == float(unattributed)
    assert rows["_unattributed"]["purchases_touched"] == unattributed


def test_attribution_time_decay_matches_python_weights(spark):
    from debezium_cdc_kafka_spark.operators.behavior import q_attribution_time_decay

    sum_cv = sum_cc = touched_v = touched_c = unattributed = 0
    for touches in _touch_events().values():
        for t, _eid, typ in touches:
            if typ != "purchase":
                continue
            wv = wc = 0
            for t2, _e2, ty2 in touches:
                if ty2 == "purchase" or not (t2 < t and t - t2 <= _DAY_US):
                    continue
                w = 1000000 // (1 + (t - t2) // 60_000_000)
                if ty2 == "view":
                    wv += w
                else:
                    wc += w
            if wv + wc == 0:
                unattributed += 1
                continue
            sum_cv += _ri(1000000.0 * wv / (wv + wc))
            sum_cc += _ri(1000000.0 * wc / (wv + wc))
            touched_v += 1 if wv > 0 else 0
            touched_c += 1 if wc > 0 else 0

    rows = {r["touch_type"]: r for r in q_attribution_time_decay(spark, SF_SMOKE).collect()}
    assert abs(rows["view"]["credited_purchases"] - sum_cv / 1e6) <= 5.1e-7
    assert rows["view"]["purchases_touched"] == touched_v
    assert abs(rows["click"]["credited_purchases"] - sum_cc / 1e6) <= 5.1e-7
    assert rows["click"]["purchases_touched"] == touched_c
    assert rows["_unattributed"]["credited_purchases"] == float(unattributed)
    assert rows["_unattributed"]["purchases_touched"] == unattributed


def _week_start(d: date) -> date:
    return d - timedelta(days=d.weekday())


def test_ltv_cohort_curve_matches_python_grid(spark):
    from debezium_cdc_kafka_spark.operators.behavior import q_ltv_cohort_curve

    ev = _read("events")
    first_signup: dict[int, datetime] = {}
    for e in ev:
        if e["event_type"] == "signup":
            u = e["user_id"]
            if u not in first_signup or e["ts"] < first_signup[u]:
                first_signup[u] = e["ts"]
    cohort = {
        u: datetime.combine(_week_start(ts.date()), datetime.min.time())
        for u, ts in first_signup.items()
    }
    size: Counter = Counter(cohort.values())
    wk: dict[tuple, int] = defaultdict(int)
    for e in ev:
        u = e["user_id"]
        if u not in cohort or e["ts"] < cohort[u]:
            continue
        cw = cohort[u]
        ew = datetime.combine(_week_start(e["ts"].date()), datetime.min.time())
        k = (ew - cw).days // 7
        if 0 <= k <= 4:
            wk[(cw, k)] += _cents(e["value"])

    rows = {
        (r["cohort_week"], r["week_offset"]): r
        for r in q_ltv_cohort_curve(spark, SF_SMOKE).collect()
    }
    expected_keys = {(cw, k) for cw in size for k in range(5)}
    assert set(rows) == expected_keys
    for cw in size:
        cum = 0
        for k in range(5):
            cum += wk.get((cw, k), 0)
            r = rows[(cw, k)]
            assert r["cohort_size"] == size[cw]
            assert abs(r["avg_cum_ltv"] - cum / size[cw] / 100.0) <= 5.1e-5


def test_engagement_by_segment_matches_python_census(spark):
    from debezium_cdc_kafka_spark.operators.behavior import q_engagement_by_segment

    seg = {c["c_custkey"]: c["c_mktsegment"] for c in _read("customer")}
    agg: dict[str, list] = defaultdict(lambda: [0, set(), 0, 0])
    for e in _read("events"):
        s = seg.get(e["user_id"])
        if s is None:
            continue
        a = agg[s]
        a[0] += 1
        a[1].add(e["user_id"])
        if e["event_type"] == "purchase":
            a[2] += 1
            a[3] += _cents(e["value"])

    rows = {r["segment"]: r for r in q_engagement_by_segment(spark, SF_SMOKE).collect()}
    assert set(rows) == set(agg)
    for s, (n, users, n_pur, v) in agg.items():
        r = rows[s]
        assert (r["n_events"], r["active_users"]) == (n, len(users))
        assert abs(r["events_per_user"] - n / len(users)) <= 5.1e-5
        assert abs(r["purchase_share"] - n_pur / n) <= 5.1e-7
        assert abs(r["purchase_value"] - v / 100.0) <= 5.1e-3


def test_conversion_cdf_matches_python_horizons(spark):
    from debezium_cdc_kafka_spark.operators.behavior import q_conversion_cdf

    ev = _read("events")
    s_ts: dict[int, datetime] = {}
    for e in ev:
        if e["event_type"] == "signup":
            u = e["user_id"]
            if u not in s_ts or e["ts"] < s_ts[u]:
                s_ts[u] = e["ts"]
    d_us: dict[int, int] = {}
    for e in ev:
        u = e["user_id"]
        if e["event_type"] == "purchase" and u in s_ts and e["ts"] > s_ts[u]:
            d = _us(e["ts"]) - _us(s_ts[u])
            if u not in d_us or d < d_us[u]:
                d_us[u] = d
    n_signups = len(s_ts)

    rows = {r["horizon_hours"]: r for r in q_conversion_cdf(spark, SF_SMOKE).collect()}
    assert set(rows) == {1, 6, 24, 72}
    for h, r in rows.items():
        conv = sum(1 for d in d_us.values() if d <= h * 3600 * 1_000_000)
        assert r["n_signups"] == n_signups
        assert r["converted"] == conv
        assert abs(r["conversion_rate"] - conv / n_signups) <= 5.1e-7


def _daily_counts() -> dict[date, int]:
    per: Counter = Counter()
    for e in _read("events"):
        per[e["ts"].date()] += 1
    return per


def test_weekday_effect_matches_python_anova(spark):
    from debezium_cdc_kafka_spark.operators.timeseries import q_weekday_effect

    day = _daily_counts()
    g: dict[int, list[float]] = defaultdict(list)
    for d, x in day.items():
        g[d.isoweekday()].append(float(x))
    k = len(g)
    n_tot = sum(len(v) for v in g.values())
    s1_tot = sum(sum(v) for v in g.values())
    s2_tot = sum(sum(x * x for x in v) for v in g.values())
    sq_grp = sum(sum(v) ** 2 / len(v) for v in g.values())
    f_stat = ((sq_grp - s1_tot**2 / n_tot) / (k - 1)) / (
        (s2_tot - sq_grp) / (n_tot - k)
    )

    rows = {r["dow"]: r for r in q_weekday_effect(spark, SF_SMOKE).collect()}
    assert set(rows) == set(g)
    for dow, v in g.items():
        r = rows[dow]
        assert r["n_days"] == len(v)
        assert abs(r["mean_events"] - sum(v) / len(v)) <= 5.1e-5
        assert abs(r["f_stat"] - f_stat) <= 5.1e-5
        assert r["weekly_cycle_detected"] == int(f_stat > 2.1)


def test_mann_kendall_matches_python_pair_walk(spark):
    from debezium_cdc_kafka_spark.operators.timeseries import q_mann_kendall

    day = _daily_counts()
    xs = [day[d] for d in sorted(day)]
    n = len(xs)
    s = sum(
        (1 if xs[j] > xs[i] else (-1 if xs[j] < xs[i] else 0))
        for i in range(n)
        for j in range(i + 1, n)
    )
    tie_term = sum(
        tj * (tj - 1) * (2 * tj + 5) for tj in Counter(xs).values() if tj > 1
    )
    var_s = (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
    z = (s - 1) / math.sqrt(var_s) if s > 0 else ((s + 1) / math.sqrt(var_s) if s < 0 else 0.0)

    [r] = q_mann_kendall(spark, SF_SMOKE).collect()
    assert (r["s"], r["n"], r["n_pairs"]) == (s, n, n * (n - 1) // 2)
    assert abs(r["var_s"] - var_s) <= 5.1e-3
    assert abs(r["z"] - z) <= 5.1e-6
    assert r["trend_detected"] == int(abs(z) > 1.959964)
