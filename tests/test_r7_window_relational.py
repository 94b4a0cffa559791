"""Independent Python recomputes for the r7-window relational3 queries
(VERDICT r5 item 5 discipline, extended to the r7 rotation): read the raw
parquet, recompute each definition in plain Python at the published
rounding, compare against the Spark DataFrame output — a third engine
beside Spark and DuckDB so a shared misreading of the SQL cannot pass
silently.

Covered: q_variant_props, q_order_cycle_time, q_abc_classification,
q_supplier_hhi, q_reorder_interval, q_basket_profile,
q_unit_price_dispersion, q_discount_band_mix, q_churn_flags,
q_laspeyres_price_index, q_fisher_price_index, q_price_volume_mix.

Rounding parity: Spark F.round(double, d) is decimal HALF_UP over the
shortest decimal repr — `_r` mirrors it exactly (see
test_r7_window_prep.py). Cents/int arithmetic is exact in both engines,
so most assertions are equality on integers plus a tight tolerance on the
one rounded double per row.
"""

from __future__ import annotations

import json
from collections import defaultdict
from datetime import date, datetime
from decimal import ROUND_HALF_UP, Decimal

import pyarrow.parquet as pq

from tests.conftest import SF_SMOKE


def _read(table: str) -> list[dict]:
    return pq.read_table(f"{SF_SMOKE}/{table}.parquet").to_pylist()


def _r(x: float, d: int) -> float:
    """Spark F.round parity: HALF_UP over the shortest decimal repr."""
    q = Decimal(1).scaleb(-d)
    return float(Decimal(repr(float(x))).quantize(q, rounding=ROUND_HALF_UP))


def _cents(x: float) -> int:
    """CAST(round(x * 100) AS BIGINT) with HALF_UP double rounding."""
    return int(
        Decimal(repr(float(x) * 100)).quantize(Decimal(1), rounding=ROUND_HALF_UP)
    )


def _ri(x: float) -> int:
    """CAST(round(x) AS BIGINT) — HALF_UP on a double expression."""
    return int(Decimal(repr(float(x))).quantize(Decimal(1), rounding=ROUND_HALF_UP))


def _qcont(vals: list[float], q: float) -> float:
    """quantile_cont / percentile: linear interpolation on sorted values."""
    s = sorted(vals)
    if len(s) == 1:
        return float(s[0])
    pos = (len(s) - 1) * q
    lo = int(pos)
    hi = min(lo + 1, len(s) - 1)
    frac = pos - lo
    return s[lo] * (1 - frac) + s[hi] * frac


def _day(ts: datetime) -> date:
    return ts.date()


def _rows_by(df_rows, *keys):
    return {tuple(r[k] for k in keys) if len(keys) > 1 else r[keys[0]]: r for r in df_rows}


def test_variant_props_matches_python_json_walk(spark):
    from debezium_cdc_kafka_spark.operators.relational3 import q_variant_props

    agg: dict[str, list] = defaultdict(lambda: [0, 0, 0, []])
    for e in _read("events"):
        a = agg[e["event_type"]]
        a[0] += 1
        k = None
        try:
            o = json.loads(e["props"])
            a[1] += 1
            if isinstance(o, dict) and isinstance(o.get("k"), int):
                k = o["k"]
        except (TypeError, ValueError):
            pass
        if k is None:
            a[2] += 1
        else:
            a[3].append(k)

    rows = _rows_by(q_variant_props(spark, SF_SMOKE).collect(), "event_type")
    assert set(rows) == set(agg)
    for t, (n, parsed, missing, ks) in agg.items():
        r = rows[t]
        assert (r["n_events"], r["n_parsed"], r["n_missing_k"]) == (n, parsed, missing)
        assert (r["min_k"], r["max_k"], r["sum_k"]) == (min(ks), max(ks), sum(ks))


def test_order_cycle_time_matches_python_percentiles(spark):
    from debezium_cdc_kafka_spark.operators.relational3 import q_order_cycle_time

    prio = {o["o_orderkey"]: o["o_orderpriority"] for o in _read("orders")}
    odate = {o["o_orderkey"]: _day(o["o_orderdate"]) for o in _read("orders")}
    per: dict[str, list[int]] = defaultdict(list)
    for l in _read("lineitem"):
        ok = l["l_orderkey"]
        per[prio[ok]].append((_day(l["l_shipdate"]) - odate[ok]).days)

    rows = _rows_by(q_order_cycle_time(spark, SF_SMOKE).collect(), "priority")
    assert set(rows) == set(per)
    for p, days in per.items():
        r = rows[p]
        assert r["n_lineitems"] == len(days)
        assert abs(r["mean_days"] - sum(days) / len(days)) <= 5.1e-5
        for col, q in [("p50_days", 0.5), ("p90_days", 0.9), ("p95_days", 0.95)]:
            assert abs(r[col] - _qcont(days, q)) <= 5.1e-2, (p, col)
        late = sum(1 for d in days if d > 90)
        assert abs(r["late_share"] - late / len(days)) <= 5.1e-7


def test_abc_classification_matches_python_cumshare(spark):
    from debezium_cdc_kafka_spark.operators.relational3 import q_abc_classification

    rev: dict[int, int] = defaultdict(int)
    for l in _read("lineitem"):
        rev[l["l_partkey"]] += _cents(l["l_extendedprice"] * (1 - l["l_discount"]))
    total = sum(rev.values())
    ranked = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))
    agg: dict[str, list[int]] = defaultdict(lambda: [0, 0])
    cum = 0
    for pk, rc in ranked:
        cum += rc
        cls = "A" if cum * 10 <= total * 7 else ("B" if cum * 10 <= total * 9 else "C")
        agg[cls][0] += 1
        agg[cls][1] += rc

    rows = _rows_by(q_abc_classification(spark, SF_SMOKE).collect(), "abc_class")
    assert set(rows) == set(agg)
    for cls, (n, rc) in agg.items():
        r = rows[cls]
        assert r["n_parts"] == n
        assert abs(r["revenue"] - rc / 100.0) <= 5.1e-3
        assert abs(r["revenue_share"] - rc / total) <= 5.1e-7


def test_supplier_hhi_matches_python_shares(spark):
    from debezium_cdc_kafka_spark.operators.relational3 import q_supplier_hhi

    s_nat = {s["s_suppkey"]: s["s_nationkey"] for s in _read("supplier")}
    n_name = {n["n_nationkey"]: n["n_name"] for n in _read("nation")}
    rev: dict[tuple, int] = defaultdict(int)
    for l in _read("lineitem"):
        key = (s_nat[l["l_suppkey"]], l["l_suppkey"])
        rev[key] += _cents(l["l_extendedprice"] * (1 - l["l_discount"]))
    per_nation: dict[str, list[int]] = defaultdict(list)
    for (nk, _sk), rc in rev.items():
        per_nation[n_name[nk]].append(rc)

    rows = _rows_by(q_supplier_hhi(spark, SF_SMOKE).collect(), "nation")
    assert set(rows) == set(per_nation)
    for nat, rcs in per_nation.items():
        r = rows[nat]
        tot = sum(rcs)
        assert r["n_suppliers"] == len(rcs)
        assert abs(r["revenue"] - tot / 100.0) <= 5.1e-3
        hhi = sum(x * x for x in rcs) / (tot * tot)
        assert abs(r["hhi"] - hhi) <= 5.1e-7
        assert abs(r["top_supplier_share"] - max(rcs) / tot) <= 5.1e-7


def test_reorder_interval_matches_python_replay(spark):
    from debezium_cdc_kafka_spark.operators.relational3 import q_reorder_interval

    seg = {c["c_custkey"]: c["c_mktsegment"] for c in _read("customer")}
    orders = sorted(
        _read("orders"), key=lambda o: (o["o_custkey"], o["o_orderdate"], o["o_orderkey"])
    )
    gaps: dict[str, list[int]] = defaultdict(list)
    n_orders: dict[int, int] = defaultdict(int)
    prev: dict[int, date] = {}
    for o in orders:
        ck = o["o_custkey"]
        d = _day(o["o_orderdate"])
        n_orders[ck] += 1
        if ck in prev:
            gaps[seg[ck]].append((d - prev[ck]).days)
        prev[ck] = d
    repeat: dict[str, list[int]] = defaultdict(lambda: [0, 0])
    for ck, s in seg.items():
        repeat[s][0] += 1
        if n_orders.get(ck, 0) >= 2:
            repeat[s][1] += 1

    rows = _rows_by(q_reorder_interval(spark, SF_SMOKE).collect(), "segment")
    assert set(rows) == set(gaps)
    for s, gs in gaps.items():
        r = rows[s]
        assert r["n_gaps"] == len(gs)
        assert abs(r["mean_gap_days"] - sum(gs) / len(gs)) <= 5.1e-5
        assert abs(r["median_gap_days"] - _qcont(gs, 0.5)) <= 5.1e-2
        n_cust, n_rep = repeat[s]
        assert abs(r["repeat_customer_share"] - n_rep / n_cust) <= 5.1e-7


def test_basket_profile_matches_python_bands(spark):
    from debezium_cdc_kafka_spark.operators.relational3 import q_basket_profile

    per: dict[int, list[int]] = defaultdict(lambda: [0, 0])
    for l in _read("lineitem"):
        p = per[l["l_orderkey"]]
        p[0] += 1
        p[1] += _cents(l["l_extendedprice"] * (1 - l["l_discount"]))
    grand_v = sum(v for _, v in per.values())
    n_all = len(per)

    def band(n: int) -> str:
        return "1-2" if n <= 2 else ("3-4" if n <= 4 else ("5-6" if n <= 6 else "7+"))

    agg: dict[str, list[int]] = defaultdict(lambda: [0, 0, 0])
    for n, v in per.values():
        a = agg[band(n)]
        a[0] += 1
        a[1] += n
        a[2] += v

    rows = _rows_by(q_basket_profile(spark, SF_SMOKE).collect(), "basket_band")
    assert set(rows) == set(agg)
    for b, (n_ord, items, v) in agg.items():
        r = rows[b]
        assert r["n_orders"] == n_ord
        assert abs(r["order_share"] - n_ord / n_all) <= 5.1e-7
        assert abs(r["revenue"] - v / 100.0) <= 5.1e-3
        assert abs(r["revenue_share"] - v / grand_v) <= 5.1e-7
        assert abs(r["avg_items"] - items / n_ord) <= 5.1e-5
        assert abs(r["avg_order_value"] - v / n_ord / 100.0) <= 5.1e-5


def test_unit_price_dispersion_matches_python_moments(spark):
    from debezium_cdc_kafka_spark.operators.relational3 import q_unit_price_dispersion

    brand = {p["p_partkey"]: p["p_brand"] for p in _read("part")}
    per: dict[str, list[int]] = defaultdict(list)
    for l in _read("lineitem"):
        if l["l_quantity"] > 0:
            per[brand[l["l_partkey"]]].append(
                _ri(100 * l["l_extendedprice"] / l["l_quantity"])
            )

    rows = _rows_by(q_unit_price_dispersion(spark, SF_SMOKE).collect(), "brand")
    assert set(rows) == set(per)
    for b, us in per.items():
        r = rows[b]
        n = len(us)
        mu = sum(us) / n
        var = max(sum(x * x for x in us) / n - mu * mu, 0.0)
        assert r["n"] == n
        assert abs(r["mean_unit_price"] - mu / 100.0) <= 5.1e-5
        assert abs(r["cv"] - (var**0.5) / mu) <= 5.1e-7
        assert r["min_unit_price"] == _r(min(us) / 100.0, 2)
        assert r["max_unit_price"] == _r(max(us) / 100.0, 2)


def test_discount_band_mix_matches_python_bands(spark):
    from debezium_cdc_kafka_spark.operators.relational3 import q_discount_band_mix

    agg: dict[str, list[int]] = defaultdict(lambda: [0, 0, 0, 0])
    for l in _read("lineitem"):
        d = l["l_discount"]
        b = "00-01" if d < 0.02 else ("02-04" if d < 0.05 else ("05-07" if d < 0.08 else "08-10"))
        a = agg[b]
        a[0] += 1
        a[1] += _cents(l["l_quantity"])
        a[2] += _cents(l["l_extendedprice"] * (1 - d))
        a[3] += _cents(l["l_extendedprice"] * d)

    rows = _rows_by(q_discount_band_mix(spark, SF_SMOKE).collect(), "discount_band")
    assert set(rows) == set(agg)
    for b, (n, qc, vc, dc) in agg.items():
        r = rows[b]
        assert r["n_items"] == n
        assert abs(r["avg_quantity"] - qc / n / 100.0) <= 5.1e-5
        assert abs(r["revenue"] - vc / 100.0) <= 5.1e-3
        assert abs(r["discount_given"] - dc / 100.0) <= 5.1e-3
        assert abs(r["effective_discount"] - dc / (vc + dc)) <= 5.1e-7


def test_churn_flags_matches_python_recency(spark):
    from debezium_cdc_kafka_spark.operators.relational3 import q_churn_flags

    last: dict[int, date] = {}
    hi = None
    for o in _read("orders"):
        d = _day(o["o_orderdate"])
        ck = o["o_custkey"]
        if ck not in last or d > last[ck]:
            last[ck] = d
        hi = d if hi is None or d > hi else hi
    agg: dict[str, list[int]] = defaultdict(lambda: [0, 0, 0, 0])
    for c in _read("customer"):
        a = agg[c["c_mktsegment"]]
        a[0] += 1
        ck = c["c_custkey"]
        if ck not in last:
            a[1] += 1
        elif (hi - last[ck]).days > 90:
            a[2] += 1
        else:
            a[3] += 1

    rows = _rows_by(q_churn_flags(spark, SF_SMOKE).collect(), "segment")
    assert set(rows) == set(agg)
    for s, (n, never, churned, active) in agg.items():
        r = rows[s]
        assert (r["n_customers"], r["never_ordered"]) == (n, never)
        assert (r["churned"], r["active"]) == (churned, active)
        assert abs(r["churn_rate"] - churned / n) <= 5.1e-7


def _monthly_part_table() -> dict[tuple, list[int]]:
    """(partkey, month-date) -> [value_cents, quantity_cents]."""
    pm: dict[tuple, list[int]] = defaultdict(lambda: [0, 0])
    for l in _read("lineitem"):
        m = _day(l["l_shipdate"]).replace(day=1)
        a = pm[(l["l_partkey"], m)]
        a[0] += _cents(l["l_extendedprice"])
        a[1] += _cents(l["l_quantity"])
    return pm


def test_laspeyres_index_matches_python_terms(spark):
    from debezium_cdc_kafka_spark.operators.relational3 import q_laspeyres_price_index

    pm = _monthly_part_table()
    m0 = min(m for _, m in pm)
    base = {pk: (v, q) for (pk, m), (v, q) in pm.items() if m == m0}
    num: dict[date, int] = defaultdict(int)
    den: dict[date, int] = defaultdict(int)
    cnt: dict[date, int] = defaultdict(int)
    for (pk, m), (v, q) in pm.items():
        if pk in base:
            v0, q0 = base[pk]
            num[m] += _ri(1000000.0 * v * q0 / q)
            den[m] += v0
            cnt[m] += 1

    rows = _rows_by(q_laspeyres_price_index(spark, SF_SMOKE).collect(), "month")
    assert set(rows) == set(num)
    for m in num:
        r = rows[m]
        assert r["n_common_parts"] == cnt[m]
        assert abs(r["laspeyres_index"] - num[m] / 1000000.0 / den[m]) <= 5.1e-7


def test_fisher_index_matches_python_terms(spark):
    from debezium_cdc_kafka_spark.operators.relational3 import q_fisher_price_index

    pm = _monthly_part_table()
    m0 = min(m for _, m in pm)
    base = {pk: (v, q) for (pk, m), (v, q) in pm.items() if m == m0}
    acc: dict[date, list[int]] = defaultdict(lambda: [0, 0, 0, 0, 0])
    for (pk, m), (v, q) in pm.items():
        if pk in base:
            v0, q0 = base[pk]
            a = acc[m]
            a[0] += 1
            a[1] += _ri(1000000.0 * v * q0 / q)  # laspeyres numerator
            a[2] += v0  # laspeyres denominator
            a[3] += v  # paasche numerator
            a[4] += _ri(1000000.0 * v0 * q / q0)  # paasche denominator

    rows = _rows_by(q_fisher_price_index(spark, SF_SMOKE).collect(), "month")
    assert set(rows) == set(acc)
    for m, (n, lnum, lden, pnum, pden) in acc.items():
        r = rows[m]
        lasp = lnum / 1000000.0 / lden
        paas = pnum / (pden / 1000000.0)
        assert r["n_common_parts"] == n
        assert abs(r["laspeyres"] - lasp) <= 5.1e-7
        assert abs(r["paasche"] - paas) <= 5.1e-7
        assert abs(r["fisher"] - (lasp * paas) ** 0.5) <= 5.1e-7


def test_price_volume_mix_matches_python_decomposition(spark):
    from debezium_cdc_kafka_spark.operators.relational3 import q_price_volume_mix

    brand = {p["p_partkey"]: p["p_brand"] for p in _read("part")}
    cut = datetime(1998, 7, 1)
    pp: dict[tuple, list[int]] = defaultdict(lambda: [0, 0])
    for l in _read("lineitem"):
        period = 0 if l["l_shipdate"] < cut else 1
        a = pp[(brand[l["l_partkey"]], l["l_partkey"], period)]
        a[0] += _cents(l["l_extendedprice"])
        a[1] += _cents(l["l_quantity"])
    wide: dict[tuple, dict[int, list[int]]] = defaultdict(dict)
    for (b, pk, period), vq in pp.items():
        wide[(b, pk)][period] = vq
    agg: dict[str, list[int]] = defaultdict(lambda: [0, 0, 0, 0])
    for (b, _pk), periods in wide.items():
        if 0 in periods and 1 in periods:
            (v0, q0), (v1, q1) = periods[0], periods[1]
            a = agg[b]
            a[0] += 1
            a[1] += v1 - v0
            a[2] += _ri(1000000.0 * v1 * q0 / q1) - 1000000 * v0
            a[3] += _ri(1000000.0 * v0 * q1 / q0) - 1000000 * v0

    rows = _rows_by(q_price_volume_mix(spark, SF_SMOKE).collect(), "brand")
    assert set(rows) == set(agg)
    for b, (n, delta, price_u, vol_u) in agg.items():
        r = rows[b]
        assert r["n_common_parts"] == n
        assert abs(r["revenue_change"] - delta / 100.0) <= 5.1e-3
        assert abs(r["price_effect"] - price_u / 1e8) <= 5.1e-3
        assert abs(r["volume_effect"] - vol_u / 1e8) <= 5.1e-3
        mix = (delta * 1000000.0 - price_u - vol_u) / 1e8
        assert abs(r["mix_effect"] - mix) <= 5.1e-3
