"""Differential tests: every registered query vs its DuckDB oracle at
sf0.001 (fast). The driver runs the same comparison at sf0.01; the
module-level harness (`python -m debezium_cdc_kafka_spark.oracle_check`)
covers that interactively.
"""

from __future__ import annotations

import pytest

from debezium_cdc_kafka_spark import registry
from debezium_cdc_kafka_spark.oracle_check import compare_one
from tests.conftest import SF_SMOKE

QUERIES = registry.all_queries()
ORACLES = registry.all_oracles()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck_smoke, name):
    fn = QUERIES[name]
    if name not in ORACLES:
        # rows-only check, mirroring the driver's weaker path
        assert fn(spark, SF_SMOKE).count() >= 0
        return
    res = compare_one(spark, duck_smoke, SF_SMOKE, name, fn, ORACLES[name])
    assert res["ok"], res


def test_every_oracle_has_query():
    assert set(ORACLES) <= set(QUERIES)
