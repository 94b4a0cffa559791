"""Property tests for the round-4d additions: Misra-Gries heavy hitters
and inter-arrival burstiness. The DuckDB oracles pin cross-engine
equality; these pin SEMANTICS against independent Python
reimplementations and the sketch's worst-case guarantees.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pandas as pd
import pyarrow.parquet as pq

from debezium_cdc_kafka_spark.operators.approx import (
    _MG_ERR_KEY,
    _MG_K,
    _MG_TOPN,
    _mg_partition,
    q_spacesaving_heavy_hitters,
)
from debezium_cdc_kafka_spark.operators.behavior import q_interarrival_burstiness
from tests.conftest import SF_SMOKE


def _read(table: str) -> list[dict]:
    return pq.read_table(f"{SF_SMOKE}/{table}.parquet").to_pylist()


# ---------------------------------------------------------------------------
# Misra-Gries partition kernel: worst-case guarantees on an adversarial
# stream, independent of any engine.
# ---------------------------------------------------------------------------


def _run_mg(terms: list[str], batch: int) -> tuple[dict[str, int], int]:
    batches = (
        pd.DataFrame({"term": terms[i : i + batch]})
        for i in range(0, len(terms), batch)
    )
    (out,) = list(_mg_partition(batches))
    counters = dict(zip(out["term"], out["cnt"]))
    err = counters.pop(_MG_ERR_KEY)
    return counters, int(err)


def test_mg_kernel_bounds_hold_on_adversarial_stream():
    """1 heavy key + a long tail of singletons, heavy key mostly at the
    FRONT (worst case for decay): every counter underestimates by at
    most the emitted offset, the offset respects n/(k+1), and any key
    with true count > err survives."""
    heavy = ["hh"] * 2000
    tail = [f"t{i}" for i in range(5000)]
    # interleave so prunes happen repeatedly across batch boundaries
    stream = []
    for i, t in enumerate(tail):
        stream.append(t)
        if i % 3 == 0 and heavy:
            stream.append(heavy.pop())
    stream = heavy + stream  # rest of the heavy mass up front
    truth = Counter(stream)
    n = len(stream)

    for batch in (97, 1000, len(stream)):
        counters, err = _run_mg(stream, batch)
        assert len(counters) <= _MG_K
        assert err <= n // (_MG_K + 1) + 1
        for term, cnt in counters.items():
            assert 0 < cnt <= truth[term]
            assert truth[term] - cnt <= err
        for term, true_cnt in truth.items():
            if true_cnt > err:
                assert term in counters, (term, true_cnt, err)


def test_mg_kernel_exact_when_under_capacity():
    """Fewer distinct keys than k: the summary IS the exact histogram
    and the error offset is zero."""
    stream = [f"k{i % 50}" for i in range(3000)]
    counters, err = _run_mg(stream, 256)
    assert err == 0
    assert counters == dict(Counter(stream))


def test_spacesaving_query_matches_python_exact_topn(spark):
    """End-to-end: the query's top-N keys/counts equal a pure-Python
    token count over the same parquet, and every emitted guarantee
    boolean is 1 (they hold for any partitioning by the MG theorem)."""
    counts = Counter(
        t
        for r in _read("documents")
        for t in r["text"].split(" ")
        if t != ""
    )
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:_MG_TOPN]
    n = sum(counts.values())

    rows = q_spacesaving_heavy_hitters(spark, SF_SMOKE).collect()
    assert len(rows) == _MG_TOPN
    got = {r["term"]: r for r in rows}
    assert [(r["term"], r["exact_count"]) for r in sorted(
        rows, key=lambda r: (-r["exact_count"], r["term"])
    )] == top
    for term, r in got.items():
        assert r["present_ok"] == 1
        assert r["bound_ok"] == 1
        assert r["guaranteed_heavy"] == int(counts[term] * (_MG_K + 1) > n)


# ---------------------------------------------------------------------------
# Inter-arrival burstiness: definitional recompute with plain Python.
# ---------------------------------------------------------------------------


def test_burstiness_matches_python_recompute(spark):
    events = _read("events")
    by_user = defaultdict(list)
    for r in events:
        # pyarrow yields datetimes; microsecond-exact like unix_micros
        by_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    gaps = defaultdict(list)
    for seq in by_user.values():
        seq.sort(key=lambda x: (x[0], x[1]))
        for (t0, _, _), (t1, _, et1) in zip(seq, seq[1:]):
            us = round((t1 - t0) / pd.Timedelta(microseconds=1))
            gaps[et1].append(us // 1_000_000)

    rows = {r["event_type"]: r for r in q_interarrival_burstiness(
        spark, SF_SMOKE).collect()}
    assert set(rows) == set(gaps)
    for et, g in gaps.items():
        r = rows[et]
        n = len(g)
        mu = sum(g) / n
        var = max(sum(x * x for x in g) / n - mu * mu, 0.0)
        sd = math.sqrt(var)
        assert r["n_gaps"] == n
        assert abs(r["mean_gap_s"] - mu) < 1e-5
        assert abs(r["std_gap_s"] - sd) < 1e-5
        assert abs(r["burstiness"] - (sd - mu) / (sd + mu)) < 1e-5
        g.sort()
        idx = (n - 1) * 0.5
        lo, hi = g[math.floor(idx)], g[math.ceil(idx)]
        med = lo + (idx - math.floor(idx)) * (hi - lo)
        assert abs(r["median_gap_s"] - med) < 0.11


def test_burstiness_is_in_range_and_bursty_data_positive(spark):
    """B is always in (-1, 1); human-generated event streams (heavy-
    tailed gaps: many quick follow-ups, few long silences) must come out
    on the bursty side of a metronome."""
    for r in q_interarrival_burstiness(spark, SF_SMOKE).collect():
        assert -1.0 < r["burstiness"] < 1.0
        assert r["std_gap_s"] >= 0.0
        assert r["median_gap_s"] <= r["mean_gap_s"] * 1.5 + 1


# ---------------------------------------------------------------------------
# NDCG@3: literal discount table + definitional recompute over the
# engine's own retrieval output.
# ---------------------------------------------------------------------------


def test_ndcg_discount_literals_match_log2():
    from debezium_cdc_kafka_spark.operators.similarity import _NDCG_D9, _NDCG_I9

    want = [round(1e9 / math.log2(r + 1)) for r in (1, 2, 3)]
    assert list(_NDCG_D9) == want
    assert list(_NDCG_I9) == [0] + [sum(want[: i + 1]) for i in range(3)]


def test_ndcg_matches_definitional_recompute(spark):
    """Recompute NDCG@3 with plain math.log2 from (a) the engine's LSH
    ranking and (b) a Python label census over parquet; the engine's
    integer-literal pipeline must agree to ~1e-6 (the 1e9 scaling)."""
    from debezium_cdc_kafka_spark.operators.similarity import (
        ann_lsh_hyperplane,
        q_ndcg_eval,
    )

    labels = {r["vec_id"]: r["label"] for r in _read("embeddings")}
    n_lab = Counter(labels.values())
    retrieved = defaultdict(list)
    for r in ann_lsh_hyperplane(spark, SF_SMOKE).collect():
        retrieved[r["query_id"]].append((r["rk"], r["cand_id"]))

    rows = {r["query_id"]: r for r in q_ndcg_eval(spark, SF_SMOKE).collect()}
    assert set(rows) == set(retrieved)
    ndcgs = []
    for qid, hits in retrieved.items():
        qlab = labels[qid]
        dcg = sum(
            1 / math.log2(rk + 1)
            for rk, cid in hits
            if labels[cid] == qlab
        )
        n_rel = n_lab[qlab] - 1
        idcg = sum(1 / math.log2(r + 1) for r in range(1, min(n_rel, 3) + 1))
        ndcg = dcg / idcg if idcg > 0 else 0.0
        ndcgs.append(ndcg)
        r = rows[qid]
        assert r["n_rel_total"] == n_rel
        assert r["hits_at_3"] == sum(1 for rk, c in hits if labels[c] == qlab)
        assert abs(r["ndcg_at_3"] - ndcg) < 2e-6
    macro = sum(ndcgs) / len(ndcgs)
    assert abs(next(iter(rows.values()))["macro_ndcg"] - macro) < 2e-6


# ---------------------------------------------------------------------------
# Embedding norm audit: milli-int recompute with away-from-zero rounding.
# ---------------------------------------------------------------------------


def _round_half_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


def test_embedding_audit_matches_python_recompute(spark):
    from debezium_cdc_kafka_spark.operators.similarity import q_embedding_norm_audit

    per_label = defaultdict(list)
    for r in _read("embeddings"):
        norm2u = sum(
            _round_half_away(float(x) * 1000) ** 2 for x in r["embedding"]
        )
        per_label[r["label"]].append((len(r["embedding"]), norm2u))

    rows = {r["label"]: r for r in q_embedding_norm_audit(spark, SF_SMOKE).collect()}
    assert set(rows) == set(per_label)
    for lab, recs in per_label.items():
        r = rows[lab]
        norms = [n for _, n in recs]
        assert r["n_vecs"] == len(recs)
        assert r["n_bad_dim"] == sum(1 for d, _ in recs if d != 64)
        assert r["n_nan_vecs"] == 0
        assert r["n_zero_vecs"] == sum(1 for n in norms if n == 0)
        assert abs(r["min_norm2"] - min(norms) / 1e6) < 1e-9
        assert abs(r["max_norm2"] - max(norms) / 1e6) < 1e-9
        assert abs(r["mean_norm2"] - sum(norms) / len(norms) / 1e6) < 1e-5


# ---------------------------------------------------------------------------
# Window funnel: brute-force chain search (no greedy) must agree.
# ---------------------------------------------------------------------------


def test_window_funnel_matches_bruteforce_chain_search(spark):
    """Enumerate EVERY (signup, click, purchase) chain per user — not the
    engine's earliest-next greedy — and take the deepest level that fits
    the window; the histogram must match exactly."""
    from debezium_cdc_kafka_spark.operators.behavior import (
        _WF_WINDOW_US,
        q_window_funnel,
    )

    per_user = defaultdict(list)
    for r in _read("events"):
        if r["event_type"] in ("signup", "click", "purchase"):
            us = round(
                (r["ts"] - pd.Timestamp("1970-01-01")) / pd.Timedelta(microseconds=1)
            )
            per_user[r["user_id"]].append((us, r["event_id"], r["event_type"]))

    hist = Counter()
    for seq in per_user.values():
        seq.sort()
        anchors = [(t, i) for t, i, ty in seq if ty == "signup"]
        if not anchors:
            continue
        best = 1
        for at, ai in anchors:
            for ct, ci, cty in seq:
                if cty != "click" or (ct, ci) <= (at, ai):
                    continue
                if ct - at <= _WF_WINDOW_US:
                    best = max(best, 2)
                    for pt, pi, pty in seq:
                        if (
                            pty == "purchase"
                            and (pt, pi) > (ct, ci)
                            and pt - at <= _WF_WINDOW_US
                        ):
                            best = max(best, 3)
        hist[best] += 1

    rows = q_window_funnel(spark, SF_SMOKE).collect()
    got = {r["funnel_level"]: r["users"] for r in rows}
    assert got == dict(hist)
    total = sum(hist.values())
    for r in rows:
        assert abs(r["share"] - hist[r["funnel_level"]] / total) < 1e-6


# ---------------------------------------------------------------------------
# Linear attribution: pair-materializing Python recompute + conservation.
# ---------------------------------------------------------------------------


def test_attribution_linear_matches_pairwise_recompute(spark):
    """Recompute with the naive (touch x purchase) pair enumeration the
    engine's range-frame form avoids; credit mass must match and the
    three rows must conserve total purchase mass."""
    from debezium_cdc_kafka_spark.operators.behavior import (
        _ATTR_LIN_WINDOW_US,
        q_attribution_linear,
    )

    per_user = defaultdict(list)
    for r in _read("events"):
        if r["event_type"] in ("view", "click", "purchase"):
            us = round(
                (r["ts"] - pd.Timestamp("1970-01-01")) / pd.Timedelta(microseconds=1)
            )
            per_user[r["user_id"]].append((us, r["event_type"]))

    sv = sc = tv = tc = un = n_purch = 0
    for seq in per_user.values():
        for t, ty in seq:
            if ty != "purchase":
                continue
            n_purch += 1
            n_view = sum(
                1 for t2, ty2 in seq
                if ty2 == "view" and t - _ATTR_LIN_WINDOW_US <= t2 < t
            )
            n_click = sum(
                1 for t2, ty2 in seq
                if ty2 == "click" and t - _ATTR_LIN_WINDOW_US <= t2 < t
            )
            n = n_view + n_click
            if n == 0:
                un += 1
                continue
            sv += _round_half_away(1e6 * n_view / n)
            sc += _round_half_away(1e6 * n_click / n)
            tv += n_view > 0
            tc += n_click > 0

    rows = {r["touch_type"]: r for r in q_attribution_linear(
        spark, SF_SMOKE).collect()}
    assert set(rows) == {"view", "click", "_unattributed"}
    assert abs(rows["view"]["credited_purchases"] - sv / 1e6) < 1e-6
    assert abs(rows["click"]["credited_purchases"] - sc / 1e6) < 1e-6
    assert rows["view"]["purchases_touched"] == tv
    assert rows["click"]["purchases_touched"] == tc
    assert rows["_unattributed"]["purchases_touched"] == un
    total_mass = sum(r["credited_purchases"] for r in rows.values())
    # conservation: attributed fractions + unattributed whole units ==
    # total purchases (up to the 1e-6 per-purchase rounding grain)
    assert abs(total_mass - n_purch) < n_purch * 1e-6 + 1e-6


# ---------------------------------------------------------------------------
# HLL time rollup: hour->day merge coherence + raw estimate bounds.
# ---------------------------------------------------------------------------


def test_hll_time_rollup_bounds_and_hour_census(spark):
    from debezium_cdc_kafka_spark.operators.approx import q_hll_time_rollup

    exact_daily = defaultdict(set)
    hours = defaultdict(set)
    for r in _read("events"):
        d = r["ts"].date()
        exact_daily[d].add(r["user_id"])
        hours[d].add(r["ts"].replace(minute=0, second=0, microsecond=0))

    rows = q_hll_time_rollup(spark, SF_SMOKE).collect()
    assert {r["day"] for r in rows} == set(exact_daily)
    for r in rows:
        assert r["exact_daily"] == len(exact_daily[r["day"]])
        assert r["n_hours"] == len(hours[r["day"]])
        assert r["within_bound"] is True


# ---------------------------------------------------------------------------
# CUPED: definitional per-user adjustment (no linearity shortcut) must
# agree, and the adjustment must actually reduce variance by rho2.
# ---------------------------------------------------------------------------


def test_cuped_matches_definitional_recompute(spark):
    import hashlib

    from debezium_cdc_kafka_spark.operators.stats import (
        _CUPED_SPLIT,
        q_cuped_adjustment,
    )

    split = pd.Timestamp(_CUPED_SPLIT)
    pre = defaultdict(int)
    post = defaultdict(int)
    for r in _read("events"):
        c = _round_half_away(r["value"] * 100)
        if r["ts"] < split:
            pre[r["user_id"]] += c
        else:
            post[r["user_id"]] += c
        pre.setdefault(r["user_id"], 0)
        post.setdefault(r["user_id"], 0)

    users = sorted(pre)
    x = [pre[u] for u in users]
    y = [post[u] for u in users]
    n = len(users)
    mx, my = sum(x) / n, sum(y) / n
    cov = sum(a * b for a, b in zip(x, y)) / n - mx * my
    vx = sum(a * a for a in x) / n - mx * mx
    vy = sum(b * b for b in y) / n - my * my
    theta = cov / vx
    rho2 = cov * cov / (vx * vy)

    rows = {r["arm"]: r for r in q_cuped_adjustment(spark, SF_SMOKE).collect()}
    assert set(rows) == {0, 1}
    for a_id, r in rows.items():
        arm_users = [
            u for u in users
            if int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16) % 2 == a_id
        ]
        assert r["n_users"] == len(arm_users)
        raw = sum(post[u] for u in arm_users) / len(arm_users)
        # definitional CUPED: adjust each user, then average
        adj = sum(
            post[u] - theta * (pre[u] - mx) for u in arm_users
        ) / len(arm_users)
        assert abs(r["mean_post"] - raw / 100.0) < 1e-3
        assert abs(r["mean_post_cuped"] - adj / 100.0) < 1e-3
        assert abs(r["theta"] - theta) < 1e-5
        assert abs(r["rho2"] - rho2) < 1e-5
        assert 0.0 <= r["rho2"] < 1.0
    # adjusted per-user metric must have (1 - rho2) of the raw variance
    adj_vals = [y[i] - theta * (x[i] - mx) for i in range(n)]
    madj = sum(adj_vals) / n
    vadj = sum((v - madj) ** 2 for v in adj_vals) / n
    assert abs(vadj - vy * (1 - rho2)) < max(1e-6 * vy, 1e-6)


# ---------------------------------------------------------------------------
# DiD + QTE: definitional recomputes on the same panel as the CUPED test.
# ---------------------------------------------------------------------------


def _panel():
    import hashlib

    from debezium_cdc_kafka_spark.operators.stats import _CUPED_SPLIT

    split = pd.Timestamp(_CUPED_SPLIT)
    pre = defaultdict(int)
    post = defaultdict(int)
    for r in _read("events"):
        c = _round_half_away(r["value"] * 100)
        (pre if r["ts"] < split else post)[r["user_id"]] += c
        pre.setdefault(r["user_id"], 0)
        post.setdefault(r["user_id"], 0)
    arm = {
        u: int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16) % 2
        for u in pre
    }
    return pre, post, arm


def test_diff_in_diff_matches_recompute(spark):
    from debezium_cdc_kafka_spark.operators.stats import q_diff_in_diff

    pre, post, arm = _panel()
    deltas = {}
    for a in (0, 1):
        us = [u for u in pre if arm[u] == a]
        mp = sum(pre[u] for u in us) / len(us) / 100.0
        mo = sum(post[u] for u in us) / len(us) / 100.0
        deltas[a] = (len(us), mp, mo)
    did = (deltas[1][2] - deltas[1][1]) - (deltas[0][2] - deltas[0][1])

    rows = {r["arm"]: r for r in q_diff_in_diff(spark, SF_SMOKE).collect()}
    assert set(rows) == {0, 1}
    for a, (n, mp, mo) in deltas.items():
        r = rows[a]
        assert r["n_users"] == n
        assert abs(r["mean_pre"] - mp) < 1e-3
        assert abs(r["mean_post"] - mo) < 1e-3
        assert abs(r["delta"] - (mo - mp)) < 1e-3
        assert abs(r["did"] - did) < 1e-3


def test_qte_matches_numpy_percentiles(spark):
    import numpy as np

    from debezium_cdc_kafka_spark.operators.stats import (
        q_quantile_treatment_effect,
    )

    _, post, arm = _panel()
    vals = {a: np.array([post[u] for u in post if arm[u] == a]) for a in (0, 1)}
    rows = {r["pct"]: r for r in q_quantile_treatment_effect(
        spark, SF_SMOKE).collect()}
    assert set(rows) == {0.25, 0.50, 0.75}
    for pct, r in rows.items():
        qt = float(np.percentile(vals[1], pct * 100)) / 100.0
        qc = float(np.percentile(vals[0], pct * 100)) / 100.0
        assert abs(r["q_treat"] - qt) < 1e-3
        assert abs(r["q_control"] - qc) < 1e-3
        assert abs(r["qte"] - (qt - qc)) < 2e-3


# ---------------------------------------------------------------------------
# Misra-Gries kernel under hypothesis: the guarantees must hold for ANY
# stream content, order, and batch slicing.
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@given(
    st.lists(
        st.integers(0, 2000).map(lambda i: f"k{i}"), min_size=0, max_size=4000
    ),
    st.integers(1, 700),
)
@settings(
    max_examples=60, deadline=None, suppress_health_check=list(HealthCheck)
)
def test_mg_kernel_guarantees_hypothesis(stream, batch):
    truth = Counter(stream)
    counters, err = _run_mg(stream, batch)
    n = len(stream)
    assert len(counters) <= _MG_K
    assert 0 <= err <= n // (_MG_K + 1) + 1
    assert sum(counters.values()) <= n
    for term, cnt in counters.items():
        assert 0 < cnt <= truth[term]
        assert truth[term] - cnt <= err
    for term, true_cnt in truth.items():
        if true_cnt > err:
            assert term in counters


# ---------------------------------------------------------------------------
# Bitmap distinct: exact equality with Python sets, union coherence.
# ---------------------------------------------------------------------------


def test_bitmap_distinct_matches_python_sets(spark):
    from debezium_cdc_kafka_spark.operators.approx import q_bitmap_distinct_users

    per_type = defaultdict(set)
    for r in _read("events"):
        per_type[r["event_type"]].add(r["user_id"])
    all_users = set().union(*per_type.values())

    rows = {r["event_type"]: r["distinct_users"] for r in
            q_bitmap_distinct_users(spark, SF_SMOKE).collect()}
    assert rows.pop("_all_types") == len(all_users)
    assert rows == {t: len(s) for t, s in per_type.items()}
    # union semantics: global < sum of per-type (users overlap types)
    assert len(all_users) < sum(len(s) for s in per_type.values())


# ---------------------------------------------------------------------------
# Variant path extraction: Python json recompute, malformed containment.
# ---------------------------------------------------------------------------


def test_variant_props_matches_json_recompute(spark):
    import json

    from debezium_cdc_kafka_spark.operators.relational3 import q_variant_props

    agg = defaultdict(lambda: [0, 0, 0, []])  # n, parsed, missing, ks
    for r in _read("events"):
        a = agg[r["event_type"]]
        a[0] += 1
        try:
            doc = json.loads(r["props"])
            a[1] += 1
            k = doc.get("k")
        except (ValueError, TypeError):
            k = None
        if isinstance(k, int):
            a[3].append(k)
        else:
            a[2] += 1

    rows = {r["event_type"]: r for r in q_variant_props(spark, SF_SMOKE).collect()}
    assert set(rows) == set(agg)
    for et, (n, parsed, missing, ks) in agg.items():
        r = rows[et]
        assert r["n_events"] == n
        assert r["n_parsed"] == parsed
        assert r["n_missing_k"] == missing
        assert r["min_k"] == min(ks)
        assert r["max_k"] == max(ks)
        assert r["sum_k"] == sum(ks)


def test_variant_get_contains_malformed_payloads(spark):
    """try_variant_get / parse_json error containment on adversarial
    payloads: wrong-type paths come back NULL, never raise."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [('{"k": 1}',), ('{"k": "str"}',), ('{"other": 2}',), ("[1,2]",)],
        "props string",
    )
    got = df.select(
        F.try_variant_get(F.parse_json("props"), "$.k", "bigint").alias("k")
    ).collect()
    assert [r.k for r in got] == [1, None, None, None]


def test_attribution_time_decay_matches_pairwise_recompute(spark):
    """Independent pair enumeration with Python integer harmonic decay;
    recency must actually bite: a channel's decayed share differs from
    its linear share somewhere."""
    from debezium_cdc_kafka_spark.operators.behavior import (
        _ATTR_LIN_WINDOW_US,
        q_attribution_time_decay,
    )

    per_user = defaultdict(list)
    for r in _read("events"):
        if r["event_type"] in ("view", "click", "purchase"):
            us = round(
                (r["ts"] - pd.Timestamp("1970-01-01")) / pd.Timedelta(microseconds=1)
            )
            per_user[r["user_id"]].append((us, r["event_type"]))

    sv = sc = tv = tc = un = 0
    lin_sv = 0
    for seq in per_user.values():
        for t, ty in seq:
            if ty != "purchase":
                continue
            wv = wc = nv = nc = 0
            for t2, ty2 in seq:
                if ty2 in ("view", "click") and t - _ATTR_LIN_WINDOW_US <= t2 < t:
                    w = 1_000_000 // (1 + (t - t2) // 60_000_000)
                    if ty2 == "view":
                        wv += w
                        nv += 1
                    else:
                        wc += w
                        nc += 1
            if wv + wc == 0:
                un += 1
                continue
            sv += _round_half_away(1e6 * wv / (wv + wc))
            sc += _round_half_away(1e6 * wc / (wv + wc))
            tv += wv > 0
            tc += wc > 0
            lin_sv += _round_half_away(1e6 * nv / (nv + nc))

    rows = {r["touch_type"]: r for r in q_attribution_time_decay(
        spark, SF_SMOKE).collect()}
    assert abs(rows["view"]["credited_purchases"] - sv / 1e6) < 1e-6
    assert abs(rows["click"]["credited_purchases"] - sc / 1e6) < 1e-6
    assert rows["view"]["purchases_touched"] == tv
    assert rows["click"]["purchases_touched"] == tc
    assert rows["_unattributed"]["purchases_touched"] == un
    assert sv != lin_sv  # decay weighting changed the answer vs linear


# ---------------------------------------------------------------------------
# LTV cohort curve: Python recompute + monotonicity.
# ---------------------------------------------------------------------------


def test_ltv_cohort_curve_matches_python_recompute(spark):
    from debezium_cdc_kafka_spark.operators.behavior import (
        _LTV_MAX_OFFSET,
        q_ltv_cohort_curve,
    )

    def week_start(ts):
        d = ts.date()
        from datetime import datetime, timedelta

        monday = d - timedelta(days=d.weekday())
        return datetime(monday.year, monday.month, monday.day)

    events = _read("events")
    first_signup = {}
    for r in sorted(events, key=lambda r: r["ts"]):
        if r["event_type"] == "signup" and r["user_id"] not in first_signup:
            first_signup[r["user_id"]] = week_start(r["ts"])
    sizes = Counter(first_signup.values())
    weekly = defaultdict(int)
    for r in events:
        cw = first_signup.get(r["user_id"])
        if cw is None or r["ts"] < cw:
            continue
        k = (week_start(r["ts"]) - cw).days // 7
        weekly[(cw, k)] += _round_half_away(r["value"] * 100)

    rows = {(r["cohort_week"], r["week_offset"]): r for r in
            q_ltv_cohort_curve(spark, SF_SMOKE).collect()}
    assert {cw for cw, _ in rows} == set(sizes)
    for cw, n in sizes.items():
        cum = 0
        prev = -1.0
        for k in range(_LTV_MAX_OFFSET + 1):
            cum += weekly.get((cw, k), 0)
            r = rows[(cw, k)]
            assert r["cohort_size"] == n
            want = cum / n / 100.0
            assert abs(r["avg_cum_ltv"] - want) < 1e-3
            assert r["avg_cum_ltv"] >= prev  # LTV curves never decrease
            prev = r["avg_cum_ltv"]


# ---------------------------------------------------------------------------
# Power analysis + cycle time: Python recomputes.
# ---------------------------------------------------------------------------


def test_power_analysis_matches_recompute(spark):
    import hashlib

    from debezium_cdc_kafka_spark.operators.stats import (
        _PWR_MDE_REL,
        _PWR_Z,
        q_power_analysis,
    )

    spend = defaultdict(int)
    for r in _read("events"):
        spend[r["user_id"]] += _round_half_away(r["value"] * 100)
    ctl = [
        v for u, v in spend.items()
        if int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16) % 2 == 0
    ]
    n = len(ctl)
    mu = sum(ctl) / n
    var = sum(v * v for v in ctl) / n - mu * mu
    delta = mu * _PWR_MDE_REL
    n_req = math.ceil(2 * var * _PWR_Z**2 / delta**2)

    (r,) = q_power_analysis(spark, SF_SMOKE).collect()
    assert r["n_control"] == n
    assert abs(r["mean_spend"] - mu / 100) < 1e-3
    assert abs(r["sd_spend"] - math.sqrt(var) / 100) < 1e-3
    assert r["n_required_per_arm"] == n_req
    assert abs(
        r["mde_rel_at_current_n"] - math.sqrt(2 * var * _PWR_Z**2 / n) / mu
    ) < 1e-5
    # duality: at n = n_required, the detectable effect IS the target
    assert (
        math.sqrt(2 * var * _PWR_Z**2 / n_req) / mu <= _PWR_MDE_REL + 1e-4
    )


def test_order_cycle_time_matches_recompute(spark):
    import numpy as np

    from debezium_cdc_kafka_spark.operators.relational3 import q_order_cycle_time

    odate = {r["o_orderkey"]: (r["o_orderdate"], r["o_orderpriority"])
             for r in _read("orders")}
    per = defaultdict(list)
    for r in _read("lineitem"):
        od, prio = odate[r["l_orderkey"]]
        per[prio].append((r["l_shipdate"].date() - od.date()).days)

    rows = {r["priority"]: r for r in q_order_cycle_time(spark, SF_SMOKE).collect()}
    assert set(rows) == set(per)
    for prio, days in per.items():
        r = rows[prio]
        assert r["n_lineitems"] == len(days)
        assert abs(r["mean_days"] - sum(days) / len(days)) < 1e-3
        for pct, col in ((50, "p50_days"), (90, "p90_days"), (95, "p95_days")):
            assert abs(r[col] - float(np.percentile(days, pct))) < 0.11
        assert abs(
            r["late_share"] - sum(1 for d in days if d > 90) / len(days)
        ) < 1e-6


# ---------------------------------------------------------------------------
# ABC classification: Python Pareto walk + partition invariants.
# ---------------------------------------------------------------------------


def test_abc_classification_matches_python_pareto_walk(spark):
    from debezium_cdc_kafka_spark.operators.relational3 import q_abc_classification

    rev = defaultdict(int)
    for r in _read("lineitem"):
        rev[r["l_partkey"]] += _round_half_away(
            r["l_extendedprice"] * (1 - r["l_discount"]) * 100
        )
    total = sum(rev.values())
    cum = 0
    agg = {c: [0, 0] for c in "ABC"}
    for pk, rc in sorted(rev.items(), key=lambda kv: (-kv[1], kv[0])):
        cum += rc
        c = "A" if cum * 10 <= total * 7 else ("B" if cum * 10 <= total * 9 else "C")
        agg[c][0] += 1
        agg[c][1] += rc

    rows = {r["abc_class"]: r for r in q_abc_classification(
        spark, SF_SMOKE).collect()}
    assert set(rows) == {"A", "B", "C"}
    for c, (n, rc) in agg.items():
        assert rows[c]["n_parts"] == n
        assert abs(rows[c]["revenue"] - rc / 100.0) < 1e-6
        assert abs(rows[c]["revenue_share"] - rc / total) < 1e-6
    # Pareto shape: A has fewer parts than C but more revenue
    assert rows["A"]["n_parts"] < rows["C"]["n_parts"] or rows["A"][
        "revenue"
    ] > rows["C"]["revenue"]
    assert abs(sum(r["revenue_share"] for r in rows.values()) - 1.0) < 1e-5


def test_supplier_hhi_matches_python_recompute(spark):
    from debezium_cdc_kafka_spark.operators.relational3 import q_supplier_hhi

    nat = {r["s_nationkey"]: None for r in _read("supplier")}
    nation_name = {r["n_nationkey"]: r["n_name"] for r in _read("nation")}
    sup_nation = {r["s_suppkey"]: r["s_nationkey"] for r in _read("supplier")}
    rev = defaultdict(lambda: defaultdict(int))
    for r in _read("lineitem"):
        nk = sup_nation[r["l_suppkey"]]
        rev[nk][r["l_suppkey"]] += _round_half_away(
            r["l_extendedprice"] * (1 - r["l_discount"]) * 100
        )

    rows = {r["nation"]: r for r in q_supplier_hhi(spark, SF_SMOKE).collect()}
    assert set(rows) == {nation_name[nk] for nk in rev}
    for nk, per_sup in rev.items():
        r = rows[nation_name[nk]]
        vals = list(per_sup.values())
        tot = sum(vals)
        hhi = sum(v * v for v in vals) / (tot * tot)
        assert r["n_suppliers"] == len(vals)
        assert abs(r["revenue"] - tot / 100.0) < 1e-6
        assert abs(r["hhi"] - hhi) < 1e-6
        assert abs(r["top_supplier_share"] - max(vals) / tot) < 1e-6
        # bounds: 1/n <= HHI <= 1 and top share^2 <= HHI
        assert 1 / len(vals) - 1e-9 <= r["hhi"] <= 1.0
        assert r["top_supplier_share"] ** 2 <= r["hhi"] + 1e-9


def test_reorder_interval_matches_python_recompute(spark):
    import numpy as np

    from debezium_cdc_kafka_spark.operators.relational3 import q_reorder_interval

    seg = {r["c_custkey"]: r["c_mktsegment"] for r in _read("customer")}
    per_cust = defaultdict(list)
    for r in _read("orders"):
        per_cust[r["o_custkey"]].append((r["o_orderdate"], r["o_orderkey"]))
    gaps = defaultdict(list)
    n_orders = Counter()
    for ck, os_ in per_cust.items():
        os_.sort()
        n_orders[ck] = len(os_)
        for (d0, _), (d1, _) in zip(os_, os_[1:]):
            gaps[seg[ck]].append((d1.date() - d0.date()).days)

    rows = {r["segment"]: r for r in q_reorder_interval(spark, SF_SMOKE).collect()}
    assert set(rows) == set(gaps)
    for s, g in gaps.items():
        r = rows[s]
        assert r["n_gaps"] == len(g)
        assert abs(r["mean_gap_days"] - sum(g) / len(g)) < 1e-3
        assert abs(r["median_gap_days"] - float(np.percentile(g, 50))) < 0.11
        custs = [c for c, sg in seg.items() if sg == s]
        share = sum(1 for c in custs if n_orders[c] >= 2) / len(custs)
        assert abs(r["repeat_customer_share"] - share) < 1e-6


# ---------------------------------------------------------------------------
# Basket profile + unit-price dispersion: Python recomputes.
# ---------------------------------------------------------------------------


def test_basket_profile_matches_python_recompute(spark):
    from debezium_cdc_kafka_spark.operators.relational3 import q_basket_profile

    per = defaultdict(lambda: [0, 0])
    for r in _read("lineitem"):
        a = per[r["l_orderkey"]]
        a[0] += 1
        a[1] += _round_half_away(
            r["l_extendedprice"] * (1 - r["l_discount"]) * 100
        )

    def band(n):
        return "1-2" if n <= 2 else ("3-4" if n <= 4 else ("5-6" if n <= 6 else "7+"))

    agg = defaultdict(lambda: [0, 0, 0])
    for n, v in per.values():
        a = agg[band(n)]
        a[0] += 1
        a[1] += v
        a[2] += n
    tot_o = sum(a[0] for a in agg.values())
    tot_v = sum(a[1] for a in agg.values())

    rows = {r["basket_band"]: r for r in q_basket_profile(spark, SF_SMOKE).collect()}
    assert set(rows) == set(agg)
    for b, (no, v, ni) in agg.items():
        r = rows[b]
        assert r["n_orders"] == no
        assert abs(r["order_share"] - no / tot_o) < 1e-6
        assert abs(r["revenue"] - v / 100.0) < 1e-6
        assert abs(r["revenue_share"] - v / tot_v) < 1e-6
        assert abs(r["avg_items"] - ni / no) < 1e-3
        assert abs(r["avg_order_value"] - v / no / 100.0) < 1e-3


def test_unit_price_dispersion_matches_python_recompute(spark):
    from debezium_cdc_kafka_spark.operators.relational3 import (
        q_unit_price_dispersion,
    )

    brand = {r["p_partkey"]: r["p_brand"] for r in _read("part")}
    per = defaultdict(list)
    for r in _read("lineitem"):
        if r["l_quantity"] > 0:
            per[brand[r["l_partkey"]]].append(
                _round_half_away(100 * r["l_extendedprice"] / r["l_quantity"])
            )

    rows = {r["brand"]: r for r in q_unit_price_dispersion(
        spark, SF_SMOKE).collect()}
    assert set(rows) == set(per)
    for b, us in per.items():
        r = rows[b]
        n = len(us)
        mu = sum(us) / n
        sd = math.sqrt(max(sum(u * u for u in us) / n - mu * mu, 0.0))
        assert r["n"] == n
        assert abs(r["mean_unit_price"] - mu / 100.0) < 1e-3
        assert abs(r["cv"] - sd / mu) < 1e-5
        assert r["min_unit_price"] == min(us) / 100.0
        assert r["max_unit_price"] == max(us) / 100.0
        assert r["cv"] > 0  # real dispersion exists in the data


def test_discount_band_mix_matches_python_recompute(spark):
    from debezium_cdc_kafka_spark.operators.relational3 import q_discount_band_mix

    agg = defaultdict(lambda: [0, 0, 0, 0])
    for r in _read("lineitem"):
        d = r["l_discount"]
        b = "00-01" if d < 0.02 else ("02-04" if d < 0.05 else
                                      ("05-07" if d < 0.08 else "08-10"))
        a = agg[b]
        a[0] += 1
        a[1] += _round_half_away(r["l_quantity"] * 100)
        a[2] += _round_half_away(r["l_extendedprice"] * (1 - d) * 100)
        a[3] += _round_half_away(r["l_extendedprice"] * d * 100)

    rows = {r["discount_band"]: r for r in q_discount_band_mix(
        spark, SF_SMOKE).collect()}
    assert set(rows) == set(agg)
    for b, (n, sq, sv, sd) in agg.items():
        r = rows[b]
        assert r["n_items"] == n
        assert abs(r["avg_quantity"] - sq / n / 100.0) < 1e-3
        assert abs(r["revenue"] - sv / 100.0) < 1e-6
        assert abs(r["discount_given"] - sd / 100.0) < 1e-6
        assert abs(r["effective_discount"] - sd / (sv + sd)) < 1e-6


def test_embedding_dim_variance_matches_numpy(spark):
    import numpy as np

    from debezium_cdc_kafka_spark.operators.similarity import (
        _DIMVAR_DEAD,
        q_embedding_dim_variance,
    )

    m = np.array(
        [
            [_round_half_away(float(x) * 1000) for x in r["embedding"]]
            for r in _read("embeddings")
        ],
        dtype=np.int64,
    )
    mean = m.mean(axis=0) / 1000.0
    var = (
        (m.astype(np.float64) ** 2).mean(axis=0) - m.mean(axis=0) ** 2
    ) / 1e6
    dead_cut = _DIMVAR_DEAD * var.mean()

    rows = {r["dim"]: r for r in q_embedding_dim_variance(spark, SF_SMOKE).collect()}
    assert set(rows) == set(range(64))
    for d in range(64):
        r = rows[d]
        assert abs(r["mean_value"] - mean[d]) < 1e-4
        assert abs(r["variance"] - var[d]) < 1e-4
        assert r["is_dead"] == int(var[d] < dead_cut)


def test_churn_flags_matches_python_recompute(spark):
    from debezium_cdc_kafka_spark.operators.relational3 import (
        _CHURN_DAYS,
        q_churn_flags,
    )

    seg = {r["c_custkey"]: r["c_mktsegment"] for r in _read("customer")}
    last = {}
    mx = None
    for r in _read("orders"):
        d = r["o_orderdate"]
        mx = d if mx is None or d > mx else mx
        if r["o_custkey"] not in last or d > last[r["o_custkey"]]:
            last[r["o_custkey"]] = d
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for ck, s in seg.items():
        a = agg[s]
        a[0] += 1
        if ck not in last:
            a[1] += 1
        elif (mx.date() - last[ck].date()).days > _CHURN_DAYS:
            a[2] += 1
        else:
            a[3] += 1

    rows = {r["segment"]: r for r in q_churn_flags(spark, SF_SMOKE).collect()}
    assert set(rows) == set(agg)
    for s, (n, never, churned, active) in agg.items():
        r = rows[s]
        assert (r["n_customers"], r["never_ordered"], r["churned"], r["active"]) \
            == (n, never, churned, active)
        assert never + churned + active == n
        assert abs(r["churn_rate"] - churned / n) < 1e-6
        assert 0 < churned < n  # non-degenerate on this data


def test_degree_distribution_matches_python_recompute(spark):
    from debezium_cdc_kafka_spark.operators.graph import graph_degree_distribution

    baskets = defaultdict(set)
    for r in _read("lineitem"):
        baskets[r["l_orderkey"]].add(r["l_partkey"])
    deg = Counter()
    edges = set()
    for parts in baskets.values():
        ps = sorted(parts)
        for i, u in enumerate(ps):
            for v in ps[i + 1:]:
                edges.add((u, v))
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    bins = Counter()
    mx_in_bin = {}
    for d in deg.values():
        b = math.floor(math.log2(d))
        bins[b] += 1
        mx_in_bin[b] = max(mx_in_bin.get(b, 0), d)
    total = sum(bins.values())

    rows = {r["log2_bin"]: r for r in graph_degree_distribution(
        spark, SF_SMOKE).collect()}
    assert set(rows) == set(bins)
    for b, n in bins.items():
        r = rows[b]
        assert r["n_nodes"] == n
        assert r["min_degree"] == 2 ** b
        assert abs(r["node_share"] - n / total) < 1e-6
        assert r["max_degree_in_bin"] == mx_in_bin[b]


def test_cluster_quality_profile_matches_python_recompute(spark):
    from debezium_cdc_kafka_spark.operators.similarity import (
        ann_kmeans_assign,
        q_cluster_quality_profile,
    )

    assign = {r["vec_id"]: r["cluster_id"] for r in ann_kmeans_assign(
        spark, SF_SMOKE).collect()}
    docs = {r["doc_id"]: r for r in _read("documents")}
    per = defaultdict(lambda: [0, 0, set(), set(), Counter()])
    for did, cid in assign.items():
        d = docs[did]
        a = per[cid]
        a[0] += 1
        a[1] += d["n_chars"]
        a[2].add(d["lang"])
        a[3].add(d["source"])
        a[4][d["lang"]] += 1

    rows = {r["cluster_id"]: r for r in q_cluster_quality_profile(
        spark, SF_SMOKE).collect()}
    assert set(rows) == set(per)
    for cid, (n, chars, langs, sources, lc) in per.items():
        r = rows[cid]
        assert r["n_docs"] == n
        assert abs(r["mean_chars"] - chars / n) < 1e-3
        assert r["n_langs"] == len(langs)
        assert r["n_sources"] == len(sources)
        maj, n_maj = sorted(lc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert r["majority_lang"] == maj
        assert abs(r["majority_lang_share"] - n_maj / n) < 1e-6


def test_engagement_by_segment_matches_python_recompute(spark):
    from debezium_cdc_kafka_spark.operators.behavior import q_engagement_by_segment

    seg = {r["c_custkey"]: r["c_mktsegment"] for r in _read("customer")}
    agg = defaultdict(lambda: [0, set(), 0, 0])
    for r in _read("events"):
        s = seg.get(r["user_id"])
        if s is None:
            continue
        a = agg[s]
        a[0] += 1
        a[1].add(r["user_id"])
        if r["event_type"] == "purchase":
            a[2] += 1
            a[3] += _round_half_away(r["value"] * 100)

    rows = {r["segment"]: r for r in q_engagement_by_segment(
        spark, SF_SMOKE).collect()}
    assert set(rows) == set(agg)
    for s, (n, users, np_, v) in agg.items():
        r = rows[s]
        assert r["n_events"] == n
        assert r["active_users"] == len(users)
        assert abs(r["events_per_user"] - n / len(users)) < 1e-3
        assert abs(r["purchase_share"] - np_ / n) < 1e-6
        assert abs(r["purchase_value"] - v / 100.0) < 1e-6


# ---------------------------------------------------------------------------
# Conversion CDF + Laspeyres index: Python recomputes and invariants.
# ---------------------------------------------------------------------------


def test_conversion_cdf_matches_recompute_and_is_monotone(spark):
    from debezium_cdc_kafka_spark.operators.behavior import (
        _CONV_HORIZONS_H,
        q_conversion_cdf,
    )

    first_signup = {}
    events = sorted(_read("events"), key=lambda r: r["ts"])
    for r in events:
        if r["event_type"] == "signup" and r["user_id"] not in first_signup:
            first_signup[r["user_id"]] = r["ts"]
    first_purch = {}
    for r in events:
        u = r["user_id"]
        if (
            r["event_type"] == "purchase"
            and u in first_signup
            and r["ts"] > first_signup[u]
            and u not in first_purch
        ):
            first_purch[u] = r["ts"]

    rows = {r["horizon_hours"]: r for r in q_conversion_cdf(
        spark, SF_SMOKE).collect()}
    assert set(rows) == set(_CONV_HORIZONS_H)
    prev = -1
    for h in sorted(_CONV_HORIZONS_H):
        conv = sum(
            1 for u, pt in first_purch.items()
            if (pt - first_signup[u]).total_seconds() <= h * 3600
        )
        r = rows[h]
        assert r["n_signups"] == len(first_signup)
        assert r["converted"] == conv
        assert abs(r["conversion_rate"] - conv / len(first_signup)) < 1e-6
        assert r["converted"] >= prev  # CDF is monotone
        prev = r["converted"]


def test_laspeyres_index_matches_recompute_and_base_is_one(spark):
    from debezium_cdc_kafka_spark.operators.relational3 import (
        q_laspeyres_price_index,
    )

    pm = defaultdict(lambda: [0, 0])
    for r in _read("lineitem"):
        m = r["l_shipdate"].date().replace(day=1)
        a = pm[(r["l_partkey"], m)]
        a[0] += _round_half_away(r["l_extendedprice"] * 100)
        a[1] += _round_half_away(r["l_quantity"] * 100)
    m0 = min(m for _, m in pm)
    base = {pk: vq for (pk, m), vq in pm.items() if m == m0}
    months = defaultdict(lambda: [0, 0, 0])
    for (pk, m), (v, q) in pm.items():
        if pk not in base:
            continue
        v0, q0 = base[pk]
        a = months[m]
        a[0] += 1
        a[1] += _round_half_away(1e6 * v * q0 / q)
        a[2] += v0

    rows = {r["month"]: r for r in q_laspeyres_price_index(
        spark, SF_SMOKE).collect()}
    assert set(rows) == set(months)
    for m, (n, num, den) in months.items():
        r = rows[m]
        assert r["n_common_parts"] == n
        assert abs(r["laspeyres_index"] - num / 1e6 / den) < 1e-5
    assert abs(rows[m0]["laspeyres_index"] - 1.0) < 1e-6  # base month = 1


def test_similarity_histogram_matches_numpy(spark):
    import numpy as np

    from debezium_cdc_kafka_spark.operators.similarity import (
        q_embedding_similarity_histogram,
    )

    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in _read("embeddings")
        if r["vec_id"] % 5 == 0
    }
    ids = sorted(vecs)
    bins = Counter()
    sums = defaultdict(int)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            va, vb = vecs[a], vecs[b]
            # same sequential fold the engines use; round like them
            c = round(float(va @ vb / math.sqrt((va @ va) * (vb @ vb))), 3)
            bn = math.floor(c * 10)
            bins[bn] += 1
            sums[bn] += _round_half_away(c * 1000)

    rows = {r["bin"]: r for r in q_embedding_similarity_histogram(
        spark, SF_SMOKE).collect()}
    assert set(rows) == set(bins)
    total = sum(bins.values())
    for bn, n in bins.items():
        r = rows[bn]
        assert r["n_pairs"] == n
        assert abs(r["share"] - n / total) < 1e-6
        assert abs(r["mean_cos"] - sums[bn] / 1000 / n) < 2e-3
    # healthy spread on this data: mass is NOT collapsed near 1.0
    near_one = sum(n for bn, n in bins.items() if bn >= 9) / total
    assert near_one < 0.5


def test_fisher_index_invariants_and_recompute(spark):
    """Fisher must sit between Laspeyres and Paasche (geometric mean),
    base month all ~1.0, and the Laspeyres column must agree with the
    standalone q_laspeyres_price_index query."""
    from debezium_cdc_kafka_spark.operators.relational3 import (
        q_fisher_price_index,
        q_laspeyres_price_index,
    )

    tri = {r["month"]: r for r in q_fisher_price_index(spark, SF_SMOKE).collect()}
    lasp = {r["month"]: r for r in q_laspeyres_price_index(
        spark, SF_SMOKE).collect()}
    assert set(tri) == set(lasp)
    m0 = min(tri)
    for m, r in tri.items():
        lo, hi = sorted((r["laspeyres"], r["paasche"]))
        assert lo - 1e-6 <= r["fisher"] <= hi + 1e-6
        assert abs(r["fisher"] ** 2 - r["laspeyres"] * r["paasche"]) < 1e-4
        assert abs(r["laspeyres"] - lasp[m]["laspeyres_index"]) < 1e-6
        assert r["n_common_parts"] == lasp[m]["n_common_parts"]
    for col in ("laspeyres", "paasche", "fisher"):
        assert abs(tri[m0][col] - 1.0) < 1e-5


def test_pvm_bridge_closes_and_matches_recompute(spark):
    """The three effects must sum exactly to the revenue change per
    brand (bridge closure), and every number must match a pure-Python
    decomposition."""
    from debezium_cdc_kafka_spark.operators.relational3 import (
        _PVM_SPLIT,
        q_price_volume_mix,
    )

    brand = {r["p_partkey"]: r["p_brand"] for r in _read("part")}
    split = pd.Timestamp(_PVM_SPLIT)
    pp = defaultdict(lambda: [0, 0])
    for r in _read("lineitem"):
        k = (brand[r["l_partkey"]], r["l_partkey"], int(r["l_shipdate"] >= split))
        a = pp[k]
        a[0] += _round_half_away(r["l_extendedprice"] * 100)
        a[1] += _round_half_away(r["l_quantity"] * 100)
    parts = defaultdict(dict)
    for (b, pk, per), (v, q) in pp.items():
        parts[(b, pk)][per] = (v, q)
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for (b, pk), d in parts.items():
        if 0 not in d or 1 not in d:
            continue
        (v0, q0), (v1, q1) = d[0], d[1]
        a = agg[b]
        a[0] += 1
        a[1] += v1 - v0
        a[2] += _round_half_away(1e6 * v1 * q0 / q1) - 1000000 * v0
        a[3] += _round_half_away(1e6 * v0 * q1 / q0) - 1000000 * v0

    rows = {r["brand"]: r for r in q_price_volume_mix(spark, SF_SMOKE).collect()}
    assert set(rows) == set(agg)
    for b, (n, dc, pu, vu) in agg.items():
        r = rows[b]
        assert r["n_common_parts"] == n
        assert abs(r["revenue_change"] - dc / 100.0) < 1e-6
        assert abs(r["price_effect"] - pu / 1e8) < 0.011
        assert abs(r["volume_effect"] - vu / 1e8) < 0.011
        # closure: effects sum to the revenue change (rounding grain only)
        assert abs(
            r["price_effect"] + r["volume_effect"] + r["mix_effect"]
            - r["revenue_change"]
        ) < 0.03


def test_mann_kendall_matches_textbook_recompute(spark):
    from debezium_cdc_kafka_spark.operators.timeseries import (
        _MK_Z_CRIT,
        q_mann_kendall,
    )

    daily = Counter(r["ts"].date() for r in _read("events"))
    xs = [daily[d] for d in sorted(daily)]
    n = len(xs)
    s = sum(
        (1 if xs[j] > xs[i] else (-1 if xs[j] < xs[i] else 0))
        for i in range(n)
        for j in range(i + 1, n)
    )
    tie_groups = [c for c in Counter(xs).values() if c > 1]
    tie_term = sum(t * (t - 1) * (2 * t + 5) for t in tie_groups)
    var_s = (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
    z = (s - 1) / math.sqrt(var_s) if s > 0 else (
        (s + 1) / math.sqrt(var_s) if s < 0 else 0.0
    )

    (r,) = q_mann_kendall(spark, SF_SMOKE).collect()
    assert r["n"] == n
    assert r["n_pairs"] == n * (n - 1) // 2
    assert r["s"] == s
    assert abs(r["var_s"] - var_s) < 1e-3
    assert abs(r["z"] - z) < 1e-5
    assert r["trend_detected"] == int(abs(z) > _MK_Z_CRIT)
