"""Regeneration-robustness: the driver regenerates test parquet between
rounds, and today's events.value happens to be all-positive. Every
value-arithmetic trick in the engine (integer half-up DIV rounding,
µ-scaled sums, trailing-window z-scores, EWMA folds) must stay
bit-identical to DuckDB if values go NEGATIVE. This test rebuilds a
scale-factor directory with value → value − 200 (mostly negative, sign
mix preserved) and re-runs the value-heavy oracle comparisons on it.
"""

from __future__ import annotations

import os
import shutil

import pytest

from pyspark.sql import functions as F

from debezium_cdc_kafka_spark.catalog import TABLES, load_table
from debezium_cdc_kafka_spark.oracle_check import compare_one, duckdb_connect
from debezium_cdc_kafka_spark.registry import all_oracles, all_queries
from tests.conftest import SF_SMOKE

QUERIES = all_queries()
ORACLES = all_oracles()

VALUE_SENSITIVE = [
    "q_seasonal_hourly_baseline",  # half-up integer DIV rounding
    "q_rolling_zscore_anomaly",    # trailing-window milli-int stats
    "q_ewma_user_value",           # sequential EWMA fold
    "q_multires_rollup",           # telescoping µ-int sums
    "cdc_final_state",             # after-image carries value
    "q_gapfill_hourly_counts",
]


@pytest.fixture(scope="module")
def negated_sf(tmp_path_factory, spark):
    out = str(tmp_path_factory.mktemp("sf_negative"))
    for t in TABLES:
        src = os.path.join(SF_SMOKE, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        if t == "events":
            # shift into mostly-negative territory; keep some positives so
            # both sign branches execute. load_table normalizes the ts
            # physical type, so write from the normalized frame. DuckDB
            # reads {t}.parquet as a single FILE, so lift the part file
            # out of Spark's output directory.
            stage = os.path.join(out, "_events_stage")
            (
                load_table(spark, SF_SMOKE, "events")
                .withColumn("value", F.round(F.col("value") - 200.0, 2))
                .coalesce(1)
                .write.parquet(stage)
            )
            part = next(
                f for f in os.listdir(stage)
                if f.startswith("part-") and f.endswith(".parquet")
            )
            shutil.move(os.path.join(stage, part), dst)
            shutil.rmtree(stage)
        elif os.path.isfile(src):
            shutil.copyfile(src, dst)
        else:
            shutil.copytree(src, dst)
    return out


@pytest.mark.parametrize("name", VALUE_SENSITIVE)
def test_value_sensitive_queries_survive_negative_values(spark, negated_sf, name):
    con = duckdb_connect(negated_sf)
    try:
        # sanity: the rewrite really produced negatives AND positives
        ev = load_table(spark, negated_sf, "events")
        assert ev.filter(F.col("value") < 0).count() > 0
        assert ev.filter(F.col("value") > 0).count() > 0
        res = compare_one(spark, con, negated_sf, name, QUERIES[name], ORACLES[name])
        assert res["ok"], res
    finally:
        con.close()
