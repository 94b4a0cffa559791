"""q_matryoshka_recall_capped: fixed-probe-budget companion (VERDICT r7
item 6). The registered cap (256) is above the probe pool at every
checked-in SF, so the driver hash gate pins the LIMIT plumbing but not
the cap-ENGAGED path — these tests close that hole by running the shared
plan with a test-sized budget at sf0.1 (probe pool 20 > cap 8) against a
DuckDB oracle built from the same template.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from debezium_cdc_kafka_spark.operators.similarity import (
    _matryoshka_capped_oracle,
    _matryoshka_overlap,
    q_matryoshka_recall,
    q_matryoshka_recall_capped,
)
from debezium_cdc_kafka_spark.oracle_check import compare_one

SF01 = "/root/testdata/sf0.1"
TEST_CAP = 8  # engages at sf0.1: probe pool is 2000/100 = 20


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF01}/embeddings.parquet'"
    )
    return c


def test_cap_engaged_matches_oracle(spark, con):
    def capped(s, d):
        return _matryoshka_overlap(s, d, query_cap=TEST_CAP)

    r = compare_one(
        spark, con, SF01, "matryoshka_cap8", capped,
        _matryoshka_capped_oracle(TEST_CAP),
    )
    assert r["ok"], r
    assert r["spark_rows"] == TEST_CAP  # the cap actually engaged


def test_registered_cap_is_identity_below_pool(spark):
    """At checked-in SFs the 256 budget exceeds the probe pool, so the
    companion must return EXACTLY the exact baseline (same rows, same
    macro) — the 'baseline untouched' half of the companion contract."""
    base = {tuple(r) for r in q_matryoshka_recall(spark, SF01).collect()}
    capped = {tuple(r) for r in q_matryoshka_recall_capped(spark, SF01).collect()}
    assert base == capped


def test_capped_probe_count_is_bounded(spark):
    n = (
        q_matryoshka_recall_capped(spark, SF01)
        .agg(F.countDistinct("query_id").alias("q"))
        .collect()[0]["q"]
    )
    assert n <= 256
