"""functions/distributed.py ≡ the global WindowExec it replaces — exact
row_number / prefix-sum / ntile equivalence on real tables, including the
tile-remainder edge cases."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from debezium_cdc_kafka_spark.catalog import load_table
from debezium_cdc_kafka_spark.functions.distributed import (
    global_ntile,
    global_prefix_sum,
    global_row_number,
)
from tests.conftest import SF_SMOKE


def test_global_row_number_matches_window(spark):
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "n_chars")
    order = [F.col("n_chars").desc(), F.col("doc_id")]
    got = {
        r.doc_id: r.rk
        for r in global_row_number(docs, order, num_parts=7).collect()
    }
    want = {
        r.doc_id: r.rk
        for r in docs.withColumn("rk", F.row_number().over(W.orderBy(*order))).collect()
    }
    assert got == want


def test_global_prefix_sum_matches_window(spark):
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "n_chars")
    order = [F.col("doc_id")]
    got = {
        r.doc_id: r.ps
        for r in global_prefix_sum(
            docs, order, F.col("n_chars"), num_parts=5, inclusive=False
        ).collect()
    }
    w = W.orderBy(*order).rowsBetween(W.unboundedPreceding, -1)
    want = {
        r.doc_id: r.ps
        for r in docs.withColumn(
            "ps", F.coalesce(F.sum("n_chars").over(w), F.lit(0))
        ).collect()
    }
    # exclusive prefix of the first row: helper yields 0, window yields null→0
    assert got == want


@pytest.mark.parametrize("k,n", [(5, 101), (10, 97), (4, 4), (7, 3)])
def test_global_ntile_matches_window(spark, k, n):
    df = spark.range(n).select(F.col("id"))
    order = [F.col("id")]
    got = {r.id: r.tile for r in global_ntile(df, order, k, num_parts=3).collect()}
    want = {
        r.id: r.t
        for r in df.withColumn("t", F.ntile(k).over(W.orderBy(*order))).collect()
    }
    assert got == want
