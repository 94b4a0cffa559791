"""Fleet-wide anti-pattern guard: NO query may plan a row-at-a-time
Python UDF (`BatchEvalPython` — pickle per row, the 10–100× slow path).
Python is allowed only behind Arrow: pandas_udf / mapInPandas /
applyInPandas / UDTF all plan as ArrowEvalPython / *InPandas nodes.
Planning-only (no execution), so the whole registry is checked.
"""

from __future__ import annotations

from debezium_cdc_kafka_spark.plans.inspect import formatted_plan
from debezium_cdc_kafka_spark.registry import all_queries
from tests.conftest import SF_SMOKE


def test_no_query_plans_row_at_a_time_python(spark):
    offenders = []
    for name, fn in all_queries().items():
        if "BatchEvalPython" in formatted_plan(fn(spark, SF_SMOKE)):
            offenders.append(name)
    spark.catalog.clearCache()
    assert not offenders, f"row-at-a-time Python UDFs in: {offenders}"
