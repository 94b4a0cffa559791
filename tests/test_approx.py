"""Error bounds for the approximate aggregates vs their exact cousins."""

from __future__ import annotations

from pyspark.sql import functions as F

from debezium_cdc_kafka_spark.catalog import load_table
from debezium_cdc_kafka_spark.operators.approx import q_approx_distinct, q_approx_quantiles
from tests.conftest import SF_SMOKE


def test_approx_distinct_within_rsd(spark):
    approx = {r.l_returnflag: (r.approx_parts, r.approx_supps) for r in q_approx_distinct(spark, SF_SMOKE).collect()}
    exact = {
        r.l_returnflag: (r.p, r.s)
        for r in load_table(spark, SF_SMOKE, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("p"), F.countDistinct("l_suppkey").alias("s"))
        .collect()
    }
    for k, (ep, es) in exact.items():
        ap, asu = approx[k]
        assert abs(ap - ep) <= max(3, 0.1 * ep), (k, ap, ep)
        assert abs(asu - es) <= max(3, 0.1 * es), (k, asu, es)


def test_approx_quantiles_close_to_exact(spark):
    approx = {r.o_orderpriority: r.approx_median for r in q_approx_quantiles(spark, SF_SMOKE).collect()}
    exact = {
        r.o_orderpriority: r.m
        for r in load_table(spark, SF_SMOKE, "orders")
        .groupBy("o_orderpriority")
        .agg(F.expr("percentile(o_totalprice, 0.5)").alias("m"))
        .collect()
    }
    for k in exact:
        rel = abs(approx[k] - exact[k]) / max(exact[k], 1.0)
        assert rel < 0.05, (k, approx[k], exact[k])


def test_hll_sketch_union_bounds_and_merge(spark):
    from debezium_cdc_kafka_spark.operators.approx import q_hll_sketch_union

    rows = {r.event_type: r for r in q_hll_sketch_union(spark, SF_SMOKE).collect()}
    assert "_all_types" in rows
    for t, r in rows.items():
        if t == "_all_types":
            continue
        # lgK=12 → rse ≈ 1.6%; allow 5% + small absolute slack
        assert abs(r.hll_estimate - r.exact_distinct) <= max(3, 0.05 * r.exact_distinct)
    exact_all = (
        load_table(spark, SF_SMOKE, "events").select("user_id").distinct().count()
    )
    est_all = rows["_all_types"].hll_estimate
    assert abs(est_all - exact_all) <= max(3, 0.05 * exact_all)
    # the union estimate can never undershoot its largest component much
    assert est_all >= max(
        r.hll_estimate for t, r in rows.items() if t != "_all_types"
    ) * 0.95
