"""Error bounds for the approximate aggregates vs their exact cousins.

The approx queries emit `*_within_bound` booleans (sketch vs exact ± the
sketch's widened guarantee) precisely so the driver can hash-gate them;
these tests assert every bound holds at sf0.001 and that the exact
columns agree with independently computed exact aggregates.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from debezium_cdc_kafka_spark.catalog import load_table
from debezium_cdc_kafka_spark.operators.approx import (
    q_approx_distinct,
    q_approx_quantiles,
    q_hll_sketch_union,
)
from tests.conftest import SF_SMOKE


def test_approx_distinct_within_bound(spark):
    rows = q_approx_distinct(spark, SF_SMOKE).collect()
    assert rows
    exact = {
        r.l_returnflag: (r.p, r.s)
        for r in load_table(spark, SF_SMOKE, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("p"),
            F.countDistinct("l_suppkey").alias("s"),
        )
        .collect()
    }
    for r in rows:
        assert r.parts_within_bound and r.supps_within_bound, r
        assert (r.exact_parts, r.exact_supps) == exact[r.l_returnflag], r


def test_approx_quantiles_within_rank_bound(spark):
    rows = q_approx_quantiles(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.median_within_bound and r.p95_within_bound, r


def test_hll_sketch_union_bounds_and_merge(spark):
    rows = {r.event_type: r for r in q_hll_sketch_union(spark, SF_SMOKE).collect()}
    assert "_all_types" in rows
    for t, r in rows.items():
        assert r.within_bound, (t, r)
    exact_all = (
        load_table(spark, SF_SMOKE, "events").select("user_id").distinct().count()
    )
    assert rows["_all_types"].exact_distinct == exact_all
    # the union covers every component: its exact count can't be below any
    # per-type exact count
    assert exact_all >= max(
        r.exact_distinct for t, r in rows.items() if t != "_all_types"
    )
