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
