"""Shared fixtures: one SparkSession per test run, DuckDB oracle connections."""

from __future__ import annotations

import pytest

from debezium_cdc_kafka_spark._proto_compat import ensure_protobuf
from debezium_cdc_kafka_spark.oracle_check import duckdb_connect
from debezium_cdc_kafka_spark.session import get_spark

# Before the JVM starts: exports PYTHONPATH (vendored protobuf + repo root)
# so local-mode Python workers can run transformWithStateInPandas.
ensure_protobuf()

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus="8")
    yield s


@pytest.fixture(scope="session")
def duck_smoke():
    con = duckdb_connect(SF_SMOKE)
    yield con
    con.close()
