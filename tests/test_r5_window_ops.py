"""Independent Python recomputes for r5 driver-window queries that were
oracle-gated but had no direct pytest reference (stats moments, MAD
outliers, as-of joins, reshape/window shapes). Same discipline as the
test_round4*_ops files: read the raw parquet, recompute the definition in
plain Python, compare exactly at the published rounding — a third engine
beside Spark and DuckDB, so a shared-SQL-misreading cannot pass silently.
"""

from __future__ import annotations

import math
import statistics
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from tests.conftest import SF_SMOKE


def _read(table: str) -> list[dict]:
    return pq.read_table(f"{SF_SMOKE}/{table}.parquet").to_pylist()


def test_stats_moments_match_textbook(spark):
    """stddev_samp/var_samp/corr/covar_samp per event type vs
    statistics-module recomputes on the raw rows."""
    from debezium_cdc_kafka_spark.operators.stats import q_stats_moments
    import json

    by_type: dict[str, list[tuple[float, float | None]]] = defaultdict(list)
    for e in _read("events"):
        k = json.loads(e["props"]).get("k") if e["props"] else None
        by_type[e["event_type"]].append(
            (float(e["value"]), None if k is None else float(int(k)))
        )

    rows = {r["event_type"]: r for r in q_stats_moments(spark, SF_SMOKE).collect()}
    assert set(rows) == set(by_type)
    for t, pairs in by_type.items():
        vals = [v for v, _ in pairs]
        assert abs(rows[t]["sd_value"] - round(statistics.stdev(vals), 3)) <= 1e-9
        assert abs(rows[t]["var_value"] - round(statistics.variance(vals), 2)) <= 1e-9
        both = [(v, k) for v, k in pairs if k is not None]
        vs = [v for v, _ in both]
        ks = [k for _, k in both]
        n = len(both)
        mv, mk = sum(vs) / n, sum(ks) / n
        cov = sum((v - mv) * (k - mk) for v, k in both) / (n - 1)
        sv = math.sqrt(sum((v - mv) ** 2 for v in vs) / (n - 1))
        sk = math.sqrt(sum((k - mk) ** 2 for k in ks) / (n - 1))
        assert abs(rows[t]["cov_vk"] - round(cov, 3)) <= 1e-6
        assert abs(rows[t]["corr_vk"] - round(cov / (sv * sk), 4)) <= 1e-6


def test_outliers_mad_matches_python_medians(spark):
    """Per-lang median, MAD, and the 3-MAD outlier census recomputed with
    statistics.median (percentile(0.5) on even counts = midpoint — same
    linear-interpolation definition)."""
    from debezium_cdc_kafka_spark.operators.stats import q_outliers_mad

    by_lang = defaultdict(list)
    for d in _read("documents"):
        by_lang[d["lang"]].append(float(d["n_chars"]))

    rows = {r["lang"]: r for r in q_outliers_mad(spark, SF_SMOKE).collect()}
    assert set(rows) == set(by_lang)
    for lang, xs in by_lang.items():
        med = statistics.median(xs)
        adev = [abs(x - med) for x in xs]
        mad = statistics.median(adev)
        n_out = sum(1 for a in adev if a > 3 * mad)
        assert rows[lang]["med_chars"] == round(med, 4)
        assert rows[lang]["mad_chars"] == round(mad, 4)
        assert rows[lang]["n_outliers"] == n_out


def _orders_by_user():
    by_user = defaultdict(list)
    for o in _read("orders"):
        by_user[o["o_custkey"]].append((o["o_orderdate"], o["o_orderkey"]))
    return by_user


def test_asof_last_order_matches_replay(spark):
    """Backward as-of: most recent order at-or-before the event, largest
    orderkey on date ties (the window carries the LAST peer in
    (t, tiebreak) order)."""
    from debezium_cdc_kafka_spark.operators.asof import q_asof_last_order

    by_user = _orders_by_user()
    rows = q_asof_last_order(spark, SF_SMOKE).collect()
    assert rows, "filter kept no events"
    for r in rows:
        cands = [
            (d, k) for d, k in by_user.get(r["user_id"], [])
            if d <= __import__("datetime").datetime.combine(
                _event_ts(r["event_id"]).date(), _event_ts(r["event_id"]).time()
            )
        ]
        want = max(cands) if cands else None
        if want is None:
            assert r["last_orderkey"] is None
        else:
            assert r["last_orderkey"] == want[1], (r, want)
            assert r["last_orderdate"] == want[0].strftime("%Y-%m-%d")


_EV_TS = None


def _event_ts(event_id):
    global _EV_TS
    if _EV_TS is None:
        _EV_TS = {e["event_id"]: e["ts"] for e in _read("events")}
    return _EV_TS[event_id]


def test_asof_next_order_matches_replay(spark):
    """Forward as-of: first order at-or-after the event, smallest orderkey
    on date ties."""
    from debezium_cdc_kafka_spark.operators.asof import q_asof_next_order

    by_user = _orders_by_user()
    rows = q_asof_next_order(spark, SF_SMOKE).collect()
    assert rows
    key_col = [c for c in rows[0].asDict() if "orderkey" in c][0]
    date_col = [c for c in rows[0].asDict() if "orderdate" in c][0]
    for r in rows:
        ts = _event_ts(r["event_id"])
        cands = [(d, k) for d, k in by_user.get(r["user_id"], []) if d >= ts]
        want = min(cands) if cands else None
        if want is None:
            assert r[key_col] is None
        else:
            assert r[key_col] == want[1], (r, want)
            assert r[date_col] == want[0].strftime("%Y-%m-%d")


def test_moving_avg_7d_matches_replay(spark):
    """RANGE(-6,0) day-number frame: floor-to-cent average of the integer
    cent sums of the days actually present in the window."""
    from debezium_cdc_kafka_spark.operators.reshape import q_moving_avg_7d
    import datetime

    base = datetime.date(1995, 1, 1)
    daily = defaultdict(int)  # (supp, day_no) -> cents
    for li in _read("lineitem"):
        d = li["l_shipdate"].date() if hasattr(li["l_shipdate"], "date") else li["l_shipdate"]
        if d < datetime.date(2001, 1, 1):
            continue
        day_no = (d - base).days
        # HALF_UP like Spark's round(), not Python's banker's rounding
        cents = math.floor(li["l_extendedprice"] * (1 - li["l_discount"]) * 100 + 0.5)
        daily[(li["l_suppkey"], day_no)] += int(cents)

    # replay per supplier
    per_supp = defaultdict(dict)
    for (s, dn), c in daily.items():
        per_supp[s][dn] = c
    rows = q_moving_avg_7d(spark, SF_SMOKE).collect()
    assert len(rows) == len(daily)
    for r in rows:
        days = per_supp[r["l_suppkey"]]
        window = [days[d] for d in range(r["day_no"] - 6, r["day_no"] + 1) if d in days]
        want = math.floor(sum(window) / len(window)) / 100.0
        assert r["mov_avg_7d"] == want, (r, want)


def test_pct_of_total_sums_to_100(spark):
    from debezium_cdc_kafka_spark.operators.reshape import q_pct_of_total

    rows = q_pct_of_total(spark, SF_SMOKE).collect()
    total = sum(r["revenue"] for r in rows)
    assert abs(sum(r["pct_of_total"] for r in rows) - 100.0) < 0.01
    for r in rows:
        assert r["pct_of_total"] == round(100.0 * r["revenue"] / total, 4)


def test_histogram_price_bins_match_counter(spark):
    from debezium_cdc_kafka_spark.operators.reshape import q_histogram_price_bins

    bins = Counter()
    lo: dict[int, float] = {}
    hi: dict[int, float] = {}
    for o in _read("orders"):
        b = math.floor(o["o_totalprice"] / 50000)
        bins[b] += 1
        lo[b] = min(lo.get(b, float("inf")), o["o_totalprice"])
        hi[b] = max(hi.get(b, float("-inf")), o["o_totalprice"])
    rows = {r["bin"]: r for r in q_histogram_price_bins(spark, SF_SMOKE).collect()}
    assert set(rows) == set(bins)
    for b, n in bins.items():
        assert rows[b]["n_orders"] == n
        assert rows[b]["bin_min"] == round(lo[b], 2)
        assert rows[b]["bin_max"] == round(hi[b], 2)


def test_referential_audit_matches_counters(spark):
    """Orphan counts per FK edge recomputed with set lookups."""
    from debezium_cdc_kafka_spark.operators.stats import _FK_EDGES, q_referential_audit

    rows = {r["fk"]: r for r in q_referential_audit(spark, SF_SMOKE).collect()}
    assert len(rows) == len(_FK_EDGES)
    for child, ck, parent, pk in _FK_EDGES:
        crows = _read(child)
        parents = {p[pk] for p in _read(parent)}
        fk = f"{child}.{ck}→{parent}"
        assert rows[fk]["n_child_rows"] == len(crows)
        assert rows[fk]["n_orphans"] == sum(1 for c in crows if c[ck] not in parents)


def test_regression_trend_matches_ols(spark):
    """OLS slope/intercept/R^2 per event type vs the closed-form normal
    equations in Python floats (engine rounds before comparison)."""
    from debezium_cdc_kafka_spark.operators.stats import q_regression_trend

    pts = defaultdict(list)
    for e in _read("events"):
        x = e["ts"].timestamp() / 86400.0  # days since epoch (ts is naive UTC)
        pts[e["event_type"]].append((x, float(e["value"])))

    rows = {r["event_type"]: r for r in q_regression_trend(spark, SF_SMOKE).collect()}
    assert set(rows) == set(pts)
    for t, xy in pts.items():
        n = len(xy)
        mx = sum(x for x, _ in xy) / n
        my = sum(y for _, y in xy) / n
        sxx = sum((x - mx) ** 2 for x, _ in xy)
        sxy = sum((x - mx) * (y - my) for x, y in xy)
        syy = sum((y - my) ** 2 for _, y in xy)
        slope = sxy / sxx
        r2 = (sxy * sxy) / (sxx * syy)
        assert rows[t]["n"] == n
        assert abs(rows[t]["slope_per_day"] - slope) < 5e-4
        assert abs(rows[t]["intercept"] - (my - slope * mx)) < 5e-2
        assert abs(rows[t]["r2"] - r2) < 5e-4


def test_quantile_normalize_is_percent_rank(spark):
    """percent_rank = (rank-1)/(n-1) under the (value, event_id) order."""
    from debezium_cdc_kafka_spark.operators.stats import q_quantile_normalize

    groups = defaultdict(list)
    for e in _read("events"):
        groups[e["event_type"]].append((float(e["value"]), e["event_id"]))
    want = {}
    for t, xs in groups.items():
        xs.sort()
        n = len(xs)
        for i, (_, eid) in enumerate(xs):
            want[eid] = round(i / (n - 1), 6) if n > 1 else 0.0

    rows = q_quantile_normalize(spark, SF_SMOKE).collect()
    assert len(rows) == sum(len(v) for v in groups.values())
    for r in rows:
        assert r["value_pctl"] == want[r["event_id"]], r


def test_unpivot_metrics_shape_and_values(spark):
    """stack(3) long form: 3 rows per segment, values equal the wide agg."""
    from debezium_cdc_kafka_spark.operators.reshape import q_unpivot_metrics

    by_seg = defaultdict(list)
    for c in _read("customer"):
        by_seg[c["c_mktsegment"]].append(c["c_acctbal"])
    rows = q_unpivot_metrics(spark, SF_SMOKE).collect()
    assert len(rows) == 3 * len(by_seg)
    got = {(r["c_mktsegment"], r["metric"]): r["value"] for r in rows}
    for seg, xs in by_seg.items():
        assert got[(seg, "avg_bal")] == round(sum(xs) / len(xs), 2)
        assert got[(seg, "max_bal")] == round(max(xs), 2)
        assert got[(seg, "min_bal")] == round(min(xs), 2)


def test_date_dimension_calendar_invariants(spark):
    """One row per day across the order-date span; dow/weekend/month-end
    flags recomputed with datetime."""
    from debezium_cdc_kafka_spark.operators.reshape import q_date_dimension
    import calendar
    import datetime

    dates = [o["o_orderdate"] for o in _read("orders")]
    lo = min(dates).date() if hasattr(min(dates), "date") else min(dates)
    hi = max(dates).date() if hasattr(max(dates), "date") else max(dates)
    rows = q_date_dimension(spark, SF_SMOKE).collect()
    assert len(rows) == (hi - lo).days + 1
    for r in rows:
        d = r["day"].date()
        assert r["year"] == d.year and r["month"] == d.month
        assert r["quarter"] == (d.month - 1) // 3 + 1
        assert r["iso_week"] == d.isocalendar()[1]
        # Spark dayofweek: 1=Sunday..7=Saturday
        assert r["dow"] == (d.weekday() + 1) % 7 + 1
        assert r["is_weekend"] == (d.weekday() >= 5)
        assert r["is_month_end"] == (d.day == calendar.monthrange(d.year, d.month)[1])


def test_sliding_window_counts_match_replay(spark):
    """1h/30min sliding windows: every event lands in exactly the two
    windows whose aligned starts cover it; counts and HALF_UP value sums
    recomputed from raw events."""
    from debezium_cdc_kafka_spark.operators.windows import q_sliding_window_1h_30m
    import datetime

    counts = Counter()
    sums = defaultdict(float)
    for e in _read("events"):
        ts = e["ts"]
        epoch = ts.timestamp()
        for align in (0, 1800):
            start = (epoch - align) // 3600 * 3600 + align
            if start <= epoch < start + 3600:
                key = datetime.datetime.utcfromtimestamp(start).strftime("%Y-%m-%d %H:%M:%S")
                counts[key] += 1
                sums[key] += e["value"]
    # each event must land in exactly 2 windows
    assert sum(counts.values()) == 2 * len(_read("events"))

    rows = {r["window_start"]: r for r in q_sliding_window_1h_30m(spark, SF_SMOKE).collect()}
    assert set(rows) == set(counts)
    for k in counts:
        assert rows[k]["n_events"] == counts[k], k
        assert abs(rows[k]["total_value"] - round(sums[k], 2)) <= 0.01


def test_window_navigation_matches_replay(spark):
    """cume_dist/nth_value(2)/lead(2, default -1)/first_value replayed per
    customer over the (o_orderdate, o_orderkey) total order."""
    from debezium_cdc_kafka_spark.operators.windows import q_window_navigation

    per_cust = defaultdict(list)
    for o in _read("orders"):
        per_cust[o["o_custkey"]].append((o["o_orderdate"], o["o_orderkey"]))
    want = {}
    for c, xs in per_cust.items():
        xs.sort()
        n = len(xs)
        for i, (d, k) in enumerate(xs):
            want[k] = {
                "cd": round((i + 1) / n, 6),  # tie-free order
                "second": xs[1][1] if i >= 1 and n >= 2 else None,
                "after_next": xs[i + 2][1] if i + 2 < n else -1,
                "first_date": xs[0][0].strftime("%Y-%m-%d"),
            }

    for r in q_window_navigation(spark, SF_SMOKE).collect():
        w = want[r["o_orderkey"]]
        assert r["cd"] == w["cd"], r
        assert r["second_orderkey"] == w["second"], r
        assert r["after_next_orderkey"] == w["after_next"], r
        assert r["first_orderdate"] == w["first_date"], r


def test_partition_skew_advisor_matches_replay(spark):
    """Per-(year*100+month) row/order counts, ratio-to-mean, and the
    [0.75, 1.25] skew flag recomputed from raw lineitem."""
    from debezium_cdc_kafka_spark.operators.layout import q_partition_skew_advisor

    n_rows = Counter()
    orders = defaultdict(set)
    for li in _read("lineitem"):
        d = li["l_shipdate"]
        k = d.year * 100 + d.month
        n_rows[k] += 1
        orders[k].add(li["l_orderkey"])
    mean = sum(n_rows.values()) / len(n_rows)

    rows = {r["part_key"]: r for r in q_partition_skew_advisor(spark, SF_SMOKE).collect()}
    assert set(rows) == set(n_rows)
    for k in n_rows:
        r = rows[k]
        ratio = n_rows[k] / mean
        assert r["n_rows"] == n_rows[k]
        assert r["n_orders"] == len(orders[k])
        assert r["skew_ratio"] == round(ratio, 6)
        assert r["skewed"] == int(ratio > 1.25 or ratio < 0.75)


def test_map_functions_match_replay(spark):
    """Map algebra per user (n_types / sorted key list / value fold /
    heavy-hitter filter) replayed from raw event counts."""
    from debezium_cdc_kafka_spark.operators.reshape import q_map_functions

    per_user = defaultdict(Counter)
    for e in _read("events"):
        per_user[e["user_id"]][e["event_type"]] += 1

    rows = {r["user_id"]: r for r in q_map_functions(spark, SF_SMOKE).collect()}
    assert set(rows) == set(per_user)
    for u, cnt in per_user.items():
        r = rows[u]
        keys = sorted(cnt)
        assert r["n_types"] == len(cnt)
        assert r["types"] == ",".join(keys)
        assert r["total_events"] == sum(cnt.values())
        assert r["heavy_types"] == ",".join(sorted(k for k, n in cnt.items() if n >= 5))


def test_profile_columns_match_replay(spark):
    """Deequ-style profile of orders: nulls / exact distinct / numeric
    min-max (dates as epoch seconds) recomputed per column."""
    from debezium_cdc_kafka_spark.operators.stats import _PROFILE_COLS, q_profile_columns

    orders = _read("orders")
    rows = {r["column_name"]: r for r in q_profile_columns(spark, SF_SMOKE).collect()}
    assert set(rows) == {n for n, _ in _PROFILE_COLS}
    for name, num in _PROFILE_COLS:
        vals = [o[name] for o in orders]
        r = rows[name]
        assert r["n_rows"] == len(orders)
        assert r["n_nulls"] == sum(1 for v in vals if v is None)
        assert r["n_distinct"] == len({v for v in vals if v is not None})
        if num is None:
            assert r["min_num"] is None and r["max_num"] is None
        else:
            nums = [
                v.timestamp() if hasattr(v, "timestamp") else float(v)
                for v in vals if v is not None
            ]
            assert r["min_num"] == round(min(nums), 6)
            assert r["max_num"] == round(max(nums), 6)


def test_l_diversity_matches_replay(spark):
    """Distinct sensitive bands per QI class + the l>=3 flag via Counters."""
    from debezium_cdc_kafka_spark.operators.audit import _L_DIV, q_l_diversity

    classes = defaultdict(set)
    sizes = Counter()
    for c in _read("customer"):
        key = (c["c_nationkey"], c["c_mktsegment"])
        classes[key].add(math.floor(c["c_acctbal"] / 2000))
        sizes[key] += 1

    rows = {(r["c_nationkey"], r["c_mktsegment"]): r
            for r in q_l_diversity(spark, SF_SMOKE).collect()}
    assert set(rows) == set(classes)
    for key, sens in classes.items():
        r = rows[key]
        assert r["group_n"] == sizes[key]
        assert r["sensitive_distinct"] == len(sens)
        assert r["l_diverse"] == int(len(sens) >= _L_DIV)


def test_rrf_hybrid_search_matches_replay(spark):
    """Full RRF replay: BM25 leg (integer micro-scores), cosine leg
    (sequential-fold doubles), per-leg top-50 ranks, 1e6/(60+r) fusion."""
    from debezium_cdc_kafka_spark.operators.similarity import (
        _RRF_K,
        _RRF_L,
        _RRF_QID,
        q_rrf_hybrid_search,
    )
    from debezium_cdc_kafka_spark.operators.text import (
        _BM25_B,
        _BM25_K1,
        _BM25_TERMS,
    )

    # lexical leg
    docs = _read("documents")
    toks = {d["doc_id"]: [t for t in d["text"].split(" ") if t] for d in docs}
    dl = {i: len(ts) for i, ts in toks.items()}
    n_docs = len(dl)
    avgdl = sum(dl.values()) / n_docs
    dfreq = Counter()
    tf = defaultdict(Counter)
    for i, ts in toks.items():
        seen = set()
        for t in ts:
            if t in _BM25_TERMS:
                tf[i][t] += 1
                seen.add(t)
        for t in seen:
            dfreq[t] += 1
    s6 = Counter()
    for i, cnt in tf.items():
        if i == _RRF_QID:
            continue
        for t, f_ in cnt.items():
            idf = math.log((n_docs - dfreq[t] + 0.5) / (dfreq[t] + 0.5) + 1.0)
            denom = f_ + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * dl[i] / avgdl)
            s6[i] += math.floor(idf * f_ * (_BM25_K1 + 1.0) / denom * 1e6 + 0.5)
    lex_top = sorted(s6.items(), key=lambda kv: (-kv[1], kv[0]))[:_RRF_L]
    lex_rk = {i: r + 1 for r, (i, _) in enumerate(lex_top)}

    # semantic leg
    emb = {e["vec_id"]: e["embedding"] for e in _read("embeddings")}
    q = emb[_RRF_QID]
    def cos(a, b):
        dot = 0.0
        na = 0.0
        nb = 0.0
        for x, y in zip(a, b):
            dot += x * y
        for x in a:
            na += x * x
        for y in b:
            nb += y * y
        return dot / math.sqrt(na * nb)
    scored = [(i, cos(q, v)) for i, v in emb.items() if i != _RRF_QID]
    scored.sort(key=lambda kv: (-kv[1], kv[0]))
    vec_rk = {i: r + 1 for r, (i, _) in enumerate(scored[:_RRF_L])}

    # fusion
    fused = {}
    for i in set(lex_rk) | set(vec_rk):
        s = 0
        if i in lex_rk:
            s += math.floor(1e6 / (_RRF_K + lex_rk[i]) + 0.5)
        if i in vec_rk:
            s += math.floor(1e6 / (_RRF_K + vec_rk[i]) + 0.5)
        fused[i] = s

    rows = q_rrf_hybrid_search(spark, SF_SMOKE).collect()
    order = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:len(rows)]
    assert [r["doc_id"] for r in rows] == [i for i, _ in order]
    for r in rows:
        assert r["lex_rk"] == lex_rk.get(r["doc_id"], 0), r
        assert r["vec_rk"] == vec_rk.get(r["doc_id"], 0), r
        assert r["rrf"] == round(fused[r["doc_id"]] / 1e6, 6), r
