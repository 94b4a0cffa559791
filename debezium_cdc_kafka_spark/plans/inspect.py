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


def _tree_lines(plan: str) -> list[str]:
    """Tree lines of the formatted explain, restricted to the plan that
    would actually run. Once an AdaptiveSparkPlan has executed (which
    happens to shared/cached frames as soon as any action touches them),
    explain prints BOTH '== Final Plan ==' and '== Initial Plan =='
    trees with separately numbered nodes — counting the whole text then
    double-counts every exchange/join. Keep final/current trees (main
    plan and each subquery), drop initial duplicates and detail entries
    (detail lines start with '(<id>)'; tree lines end with it)."""
    out: list[str] = []
    skip = False
    for line in plan.splitlines():
        if "== Initial Plan ==" in line:
            skip = True
            continue
        if (
            "== Physical Plan ==" in line
            or "== Final Plan ==" in line
            or "== Current Plan ==" in line
            or line.startswith("Subquery:")
        ):
            skip = False
            continue
        if not skip and not line.lstrip().startswith("("):
            out.append(line)
    return out


def _nodes(plan: str, name: str) -> int:
    # Count nodes on (final-plan) tree lines: "+- <Name> [flags] (<id>)".
    pat = re.compile(rf"(?<![\w]){name}\b[^\n()]*\(\d+\)")
    return sum(1 for line in _tree_lines(plan) if pat.search(line))


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


def _stage_totals(spark) -> dict[str, int]:
    """Cumulative completed-stage metrics from the Spark UI REST API
    (requires a session built with ``get_spark(..., ui=True)``)."""
    import json
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    if not ui:
        raise RuntimeError("Spark UI disabled; build the session with ui=True")
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages?status=complete") as r:
        stages = json.load(r)
    out = {"shuffle_write_bytes": 0, "shuffle_read_bytes": 0,
           "spill_bytes": 0, "input_bytes": 0}
    for s in stages:
        out["shuffle_write_bytes"] += s.get("shuffleWriteBytes", 0)
        out["shuffle_read_bytes"] += s.get("shuffleReadBytes", 0)
        out["spill_bytes"] += s.get("diskBytesSpilled", 0) + s.get("memoryBytesSpilled", 0)
        out["input_bytes"] += s.get("inputBytes", 0)
    return out


def runtime_metrics(df_or_build, spark=None) -> dict[str, int]:
    """Execute the frame (or build+execute, when given a zero-arg builder)
    and return the ACTUAL data movement caused: bytes shuffled (write),
    spilled, and scanned — the measured counterpart of the static
    exchange count. Pass a builder for queries that run bounded jobs at
    CONSTRUCTION time (two-pass offset passes, bloom builds, Gram
    collects) so those count too. Serial use only (diffs app-cumulative
    totals around the work)."""
    import time

    if callable(df_or_build):
        probe_spark = spark
        before = _stage_totals(probe_spark)
        df = df_or_build()
    else:
        df = df_or_build
        probe_spark = df.sparkSession
        before = _stage_totals(probe_spark)
    df.count()
    time.sleep(0.3)  # stage completion events land asynchronously
    after = _stage_totals(probe_spark)
    return {k: after[k] - before[k] for k in after}
