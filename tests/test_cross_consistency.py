"""Cross-operator reconciliation: independent pipelines that measure the
same underlying quantity must agree exactly. This is the auditor's
closing check — each of these invariants spans two operators built at
different times through different plans, so a regression in either
one's money/pair/window discipline breaks an equality here even if its
own oracle still passes on its own (changed) definition.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from debezium_cdc_kafka_spark.catalog import load_table
from debezium_cdc_kafka_spark.operators.behavior import (
    q_attribution_linear,
    q_attribution_time_decay,
    q_funnel_3step,
    q_window_funnel,
)
from debezium_cdc_kafka_spark.operators.relational3 import (
    q_abc_classification,
    q_basket_profile,
    q_supplier_hhi,
)
from tests.conftest import SF_SMOKE


def _cents_total(spark):
    """Ground truth: discounted lineitem revenue in exact cents."""
    li = load_table(spark, SF_SMOKE, "lineitem")
    return li.select(
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
            .cast("long")
        ).alias("c")
    ).collect()[0].c


def test_revenue_reconciles_across_abc_hhi_basket(spark):
    """Three unrelated rollups of discounted revenue — by part Pareto
    class, by supplier nation, by basket band — must each sum to the
    same exact cents total."""
    truth = _cents_total(spark) / 100.0
    for fn in (q_abc_classification, q_supplier_hhi, q_basket_profile):
        total = sum(r["revenue"] for r in fn(spark, SF_SMOKE).collect())
        assert abs(total - truth) < 0.02, fn.__name__


def test_windowed_funnel_is_bounded_by_unbounded_funnel(spark):
    """A user reaching stage 2+ inside the 6h window necessarily clicked
    after a signup at ALL; the time-constrained count can never exceed
    the unbounded one."""
    win = {r["funnel_level"]: r["users"] for r in q_window_funnel(
        spark, SF_SMOKE).collect()}
    unb = {r["stage_ord"]: r["users"] for r in q_funnel_3step(
        spark, SF_SMOKE).collect()}
    assert sum(win.values()) == unb[1]  # every signup user gets a level
    assert win.get(2, 0) + win.get(3, 0) <= unb[2]
    assert win.get(3, 0) <= unb[3]


def test_attribution_models_share_pair_structure(spark):
    """Linear and time-decay attribution run over the IDENTICAL
    (touch, purchase) pair set — only the weighting differs. So the
    unattributed count, each channel's touched-purchase count, and the
    total credited mass must match exactly; the per-channel SPLIT must
    not (decay has to change the answer)."""
    lin = {r["touch_type"]: r for r in q_attribution_linear(
        spark, SF_SMOKE).collect()}
    dec = {r["touch_type"]: r for r in q_attribution_time_decay(
        spark, SF_SMOKE).collect()}
    assert set(lin) == set(dec) == {"view", "click", "_unattributed"}
    for ch in ("view", "click", "_unattributed"):
        assert lin[ch]["purchases_touched"] == dec[ch]["purchases_touched"], ch
    mass = lambda d: sum(r["credited_purchases"] for r in d.values())  # noqa: E731
    assert abs(mass(lin) - mass(dec)) < 1e-4
    assert abs(
        lin["view"]["credited_purchases"] - dec["view"]["credited_purchases"]
    ) > 1e-3


def test_exact_distinct_agrees_between_bitmap_and_hll_census(spark):
    """Two sketch-family queries carry the EXACT distinct beside their
    estimates (bitmap computes it via bitmap_count, the HLL query via
    count distinct) — the exact columns must be identical per type and
    globally."""
    from debezium_cdc_kafka_spark.operators.approx import (
        q_bitmap_distinct_users,
        q_hll_sketch_union,
    )

    bm = {r["event_type"]: r["distinct_users"] for r in
          q_bitmap_distinct_users(spark, SF_SMOKE).collect()}
    hll = {r["event_type"]: r["exact_distinct"] for r in
           q_hll_sketch_union(spark, SF_SMOKE).collect()}
    assert bm == hll


def test_conversion_cdf_population_is_the_funnel_stage_one(spark):
    from debezium_cdc_kafka_spark.operators.behavior import (
        q_conversion_cdf,
        q_funnel_3step,
    )

    signups = {r["stage_ord"]: r["users"] for r in q_funnel_3step(
        spark, SF_SMOKE).collect()}[1]
    for r in q_conversion_cdf(spark, SF_SMOKE).collect():
        assert r["n_signups"] == signups


def test_reorder_gap_count_reconciles_with_order_census(spark):
    """Sum of per-segment gap counts must equal total orders minus the
    number of customers with at least one order (each ordered customer
    contributes n_orders - 1 gaps)."""
    from debezium_cdc_kafka_spark.operators.relational3 import q_reorder_interval

    orders = load_table(spark, SF_SMOKE, "orders")
    total_orders = orders.count()
    ordering_customers = orders.select("o_custkey").distinct().count()
    n_gaps = sum(r["n_gaps"] for r in q_reorder_interval(
        spark, SF_SMOKE).collect())
    assert n_gaps == total_orders - ordering_customers


def test_orders_rowcount_reconciles_histogram_profile_audit(spark):
    """Three unrelated operators must agree on how many orders exist:
    the price-bin histogram's bin total, the Deequ-style profile's
    n_rows, and the referential audit's child-row count for the
    orders.o_custkey edge."""
    from debezium_cdc_kafka_spark.operators.reshape import q_histogram_price_bins
    from debezium_cdc_kafka_spark.operators.stats import (
        q_profile_columns,
        q_referential_audit,
    )

    hist_total = sum(
        r["n_orders"] for r in q_histogram_price_bins(spark, SF_SMOKE).collect()
    )
    profile = q_profile_columns(spark, SF_SMOKE).collect()
    audit = {r["fk"]: r for r in q_referential_audit(spark, SF_SMOKE).collect()}
    assert hist_total == profile[0]["n_rows"]
    assert hist_total == audit["orders.o_custkey→customer"]["n_child_rows"]


def test_nation_revenue_shares_reconcile_with_cents_ground_truth(spark):
    """q_pct_of_total's per-nation revenues must sum back to the exact
    global discounted-revenue cent total (every lineitem has a supplier,
    so the nation rollup partitions the whole fact table)."""
    from debezium_cdc_kafka_spark.operators.reshape import q_pct_of_total

    rows = q_pct_of_total(spark, SF_SMOKE).collect()
    assert round(sum(r["revenue"] for r in rows) * 100) == _cents_total(spark)
    assert abs(sum(r["pct_of_total"] for r in rows) - 100.0) < 0.01
