"""Invariants of the derived partsupp relation (operators/partsupp.py).

The four TPC-H shapes built on it are oracle-gated; these tests pin the
derivation itself so a formula change can't silently shift all four."""

from __future__ import annotations

from pyspark.sql import functions as F

from debezium_cdc_kafka_spark.catalog import load_table
from debezium_cdc_kafka_spark.operators.partsupp import partsupp

SF = "/root/testdata/sf0.001"


def test_partsupp_shape_and_ranges(spark):
    ps = partsupp(spark, SF).cache()
    n_part = load_table(spark, SF, "part").count()
    n_supp = load_table(spark, SF, "supplier").count()
    assert ps.count() == 4 * n_part
    # 4 distinct suppliers per part (the TPC-H formula guarantees it)
    per_part = ps.groupBy("ps_partkey").agg(
        F.countDistinct("ps_suppkey").alias("nsupp"),
        F.min("ps_suppkey").alias("lo"),
        F.max("ps_suppkey").alias("hi"),
    )
    bad = per_part.filter(
        (F.col("nsupp") != 4) | (F.col("lo") < 1) | (F.col("hi") > n_supp)
    ).count()
    assert bad == 0
    ranges = ps.agg(
        F.min("ps_availqty").alias("q_lo"),
        F.max("ps_availqty").alias("q_hi"),
        F.min("ps_supplycost").alias("c_lo"),
        F.max("ps_supplycost").alias("c_hi"),
    ).first()
    assert 1 <= ranges.q_lo and ranges.q_hi <= 9999
    assert 1.0 <= ranges.c_lo and ranges.c_hi <= 1001.0
    ps.unpersist()


def test_partsupp_deterministic(spark):
    a = {tuple(r) for r in partsupp(spark, SF).collect()}
    b = {tuple(r) for r in partsupp(spark, SF).collect()}
    assert a == b
