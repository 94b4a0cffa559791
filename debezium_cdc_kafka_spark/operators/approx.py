"""Approximate aggregates — the 100 TB scale path for distinct counts and
quantiles.

These are the operators you actually run at petabyte scale in place of
their exact cousins (q_distinct_agg, q_quantiles_per_segment): HLL++
(`approx_count_distinct`) and t-digest-ish quantile sketches
(`percentile_approx`) are single-pass, bounded-memory, and mergeable
map-side, so the shuffle carries sketches instead of raw values.

Sketch internals are engine-specific, so there is no DuckDB oracle —
the driver records a rows-only check, and tests/test_approx.py bounds the
error against the exact operators instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str):
    def deco(fn):
        QUERIES[name] = fn
        return fn

    return deco


@query("q_approx_distinct")
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct counts per returnflag (rsd 2%) — replaces the exact
    expand-and-count at scale; the sketch merges map-side so the shuffle
    is O(groups × sketch), independent of row count."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.approx_count_distinct("l_suppkey", 0.02).alias("approx_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query("q_approx_quantiles")
def q_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketched quantiles of order totals per priority (accuracy 10000 ≈
    0.01% rank error) — single pass, no per-group sort."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("approx_median"),
        F.percentile_approx("o_totalprice", 0.95, 10000).alias("approx_p95"),
        F.count(F.lit(1)).alias("n_orders"),
    )
