"""Fleet-wide anti-pattern guards over EVERY registered query's physical
plan (planning-only, one pass):

- NO `BatchEvalPython` — row-at-a-time Python UDFs (pickle per row, the
  10-100x slow path). Python is allowed only behind Arrow: pandas_udf /
  mapInPandas / applyInPandas / UDTF plan as ArrowEvalPython /
  *InPandas nodes.
- NO `CartesianProduct` — an unkeyed pair blowup is the one join shape
  that cannot survive a scale-up. Bounded literal grids here ride
  broadcast nested-loop joins (candidate-pruned, small side broadcast),
  which plan as BroadcastNestedLoopJoin, never CartesianProduct.
"""

from __future__ import annotations

from debezium_cdc_kafka_spark.plans.inspect import formatted_plan
from debezium_cdc_kafka_spark.registry import all_queries
from tests.conftest import SF_SMOKE


def test_no_query_plans_row_python_or_cartesian(spark):
    row_python, cartesian = [], []
    for name, fn in all_queries().items():
        plan = formatted_plan(fn(spark, SF_SMOKE))
        if "BatchEvalPython" in plan:
            row_python.append(name)
        if "CartesianProduct" in plan:
            cartesian.append(name)
    spark.catalog.clearCache()
    assert not row_python, f"row-at-a-time Python UDFs in: {row_python}"
    assert not cartesian, f"CartesianProduct joins in: {cartesian}"
