"""Plan inspection: programmatic access to what `.explain("formatted")`
shows, so scale-critical plan properties (predicate pushdown, column
pruning, broadcast joins, shuffle counts) are assertable in tests instead
of eyeballed.

The reference has no planner of its own (SURVEY §4 — everything delegated
to DuckDB); in this engine Catalyst is the planner and these helpers are
the guardrails that keep its choices scale-shaped.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    jdf = df._jdf
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return jdf.queryExecution().explainString(mode)


@dataclass
class PlanFacts:
    pushed_filters: list[str]
    read_schemas: list[str]
    broadcast_joins: int
    sort_merge_joins: int
    nested_loop_joins: int
    exchanges: int

    def reads_column(self, col: str) -> bool:
        return any(col in s for s in self.read_schemas)

    def pushes_filter_on(self, col: str) -> bool:
        return any(col in p for p in self.pushed_filters)


def _nodes(plan: str, name: str) -> int:
    # formatted explain prints each node twice (tree + detail section);
    # count only the numbered detail entries
    return len(re.findall(rf"\(\d+\) {name}\b", plan))


def plan_facts(df: DataFrame) -> PlanFacts:
    plan = formatted_plan(df)
    return PlanFacts(
        pushed_filters=re.findall(r"PushedFilters: \[([^\]]*)\]", plan),
        read_schemas=re.findall(r"ReadSchema: (\S+)", plan),
        broadcast_joins=_nodes(plan, "BroadcastHashJoin"),
        sort_merge_joins=_nodes(plan, "SortMergeJoin"),
        nested_loop_joins=_nodes(plan, "BroadcastNestedLoopJoin"),
        exchanges=_nodes(plan, "Exchange"),
    )
