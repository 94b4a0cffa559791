"""Time-series gap handling over the events table: dense-grid gap fill
and last-observation-carried-forward (LOCF) — the hypertable-rollup
surface a CDC-fed metrics table needs (the reference only ships rows,
reference: app/consumer/consumer.py:55–75; rollups are the north-star
widening).

Scale notes: the time grid is *generated*, never materialized wide —
``sequence()`` explodes per-row (per event_type / per user), so grid
size is |keys| × span and each key's grid lands in that key's partition.
LOCF is a running window per key ordered by time: rows-frame, bounded
state, no global sort.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


GAPFILL_ORACLE = """
WITH bounds AS (
  SELECT CAST(date_trunc('hour', min(ts)) AS TIMESTAMP) AS lo,
         CAST(date_trunc('hour', max(ts)) AS TIMESTAMP) AS hi
  FROM events
),
hours AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS hour FROM bounds
),
types AS (SELECT DISTINCT event_type FROM events),
counts AS (
  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
         count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT t.event_type, h.hour, CAST(coalesce(c.n, 0) AS BIGINT) AS n_events
FROM hours h
CROSS JOIN types t
LEFT JOIN counts c ON c.hour = h.hour AND c.event_type = t.event_type
"""


@query("q_gapfill_hourly_counts", GAPFILL_ORACLE)
def q_gapfill_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly event counts per type: hours with no events appear as
    explicit zero rows. The hour grid is sequence()-generated from the
    observed bounds (two broadcast scalars), cross-joined with the tiny
    type dimension, then left-joined to the aggregated counts — the only
    full-table work is the one groupBy; the grid side is O(span × types)
    and broadcast."""
    events = load_table(spark, sf_dir, "events")
    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour")
    )
    types = events.select("event_type").distinct()
    counts = events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        F.broadcast(hours)
        .crossJoin(F.broadcast(types))
        .join(counts, ["hour", "event_type"], "left")
        .select(
            "event_type",
            "hour",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
        )
    )


LOCF_ORACLE = """
WITH global_hi AS (SELECT CAST(date_trunc('day', max(ts)) AS TIMESTAMP) AS hi FROM events),
user_days AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         max(value) AS obs
  FROM events GROUP BY 1, 2
),
grid AS (
  SELECT user_id,
         unnest(generate_series(lo, hi, INTERVAL '1 day')) AS day
  FROM (SELECT user_id, min(day) AS lo FROM user_days GROUP BY user_id), global_hi
)
SELECT g.user_id, g.day,
       last_value(u.obs IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS filled_value
FROM grid g LEFT JOIN user_days u ON u.user_id = g.user_id AND u.day = g.day
"""


@query("q_locf_daily_value", LOCF_ORACLE)
def q_locf_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily max reading per user on a dense grid (from each user's first
    active day to the global end), gaps filled by carrying the last
    observation forward. The grid explodes per user (stays in the user's
    partition); LOCF is last(ignorenulls) over a rows-frame running
    window — single shuffle on user_id shared by the aggregate, the grid,
    the join, and the window."""
    events = load_table(spark, sf_dir, "events")
    user_days = events.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.max("value").alias("obs"))
    hi = events.agg(F.date_trunc("day", F.max("ts")).alias("hi"))
    grid = (
        user_days.groupBy("user_id")
        .agg(F.min("day").alias("lo"))
        .crossJoin(F.broadcast(hi))
        .select(
            "user_id",
            F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day"),
        )
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        grid.join(user_days, ["user_id", "day"], "left")
        .withColumn("filled_value", F.last("obs", ignorenulls=True).over(w))
        .select("user_id", "day", "filled_value")
    )


# ---------------------------------------------------------------------------
# Exponentially-weighted moving average (sequential fold).
# ---------------------------------------------------------------------------

_EWMA_ALPHA = 0.3

EWMA_ORACLE = f"""
WITH user_days AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         max(value) AS obs
  FROM events GROUP BY 1, 2
), series AS (
  SELECT user_id,
         list_transform(
           list_sort(list({{'day': day, 'obs': obs}})), s -> s.obs
         ) AS xs
  FROM user_days GROUP BY user_id
)
SELECT user_id, CAST(len(xs) AS INT) AS n_days,
       list_reduce(xs, (acc, x) -> {_EWMA_ALPHA} * x + {1 - _EWMA_ALPHA} * acc)
         AS ewma
FROM series
"""


@query("q_ewma_user_value", EWMA_ORACLE)
def q_ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average of the daily max
    reading: s₁ = x₁, sᵢ = α·xᵢ + (1−α)·sᵢ₋₁ over the day-ordered series.
    EWMA is inherently sequential, but only *within* a key — so the
    distributed shape is groupBy(user) → sorted per-key array → one
    O(n) fold (``F.aggregate``), embarrassingly parallel across users
    with a single shuffle. Both engines execute the identical
    left-to-right double-precision op sequence, so the unrounded result
    is bit-identical (same trick as the sketch folds in
    [[spark-duckdb-oracle-parity]]). A key's series must fit in memory —
    true for any per-entity time series; an unbounded stream would use
    the streaming state form (one running scalar per key) instead."""
    events = load_table(spark, sf_dir, "events")
    user_days = events.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.max("value").alias("obs"))
    series = user_days.groupBy("user_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "obs"))),
            lambda s: s["obs"],
        ).alias("xs")
    )
    rest = F.expr("slice(xs, 2, greatest(size(xs) - 1, 0))")
    fold = F.aggregate(
        rest,
        F.element_at("xs", 1),
        lambda acc, x: F.lit(_EWMA_ALPHA) * x + F.lit(1 - _EWMA_ALPHA) * acc,
    )
    return series.select(
        "user_id", F.size("xs").alias("n_days"), fold.alias("ewma")
    )


# ---------------------------------------------------------------------------
# Multi-resolution rollup (minute → hour → day, telescoping).
# ---------------------------------------------------------------------------

def _rollup_level_sql(level: str) -> str:
    return f"""
SELECT '{level}' AS resolution,
       CAST(date_trunc('{level}', ts) AS TIMESTAMP) AS bucket, event_type,
       count(*) AS n_events,
       round(CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT)
             / 1000000.0, 6) AS sum_value
FROM events GROUP BY 2, 3"""


MULTIRES_ORACLE = " UNION ALL ".join(
    _rollup_level_sql(level) for level in ("minute", "hour", "day")
)


@query("q_multires_rollup", MULTIRES_ORACLE)
def q_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate at three resolutions
    (minute/hour/day) in one job. The raw table is scanned ONCE for the
    minute level; hour re-aggregates the minute aggregate and day the
    hour aggregate (telescoping — counts and micro-scaled integer sums
    are exactly re-aggregable), so the coarser levels cost |minute
    buckets| not |events|. At 100 TB that is the difference between one
    pass and three; the integer µ-sums also make every level
    order-independent and oracle-exact ([[spark-duckdb-oracle-parity]])."""
    events = load_table(spark, sf_dir, "events")
    v6 = F.round(F.col("value") * 1000000).cast("long")
    minute = events.groupBy(
        F.date_trunc("minute", F.col("ts")).alias("bucket"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"), F.sum(v6).alias("v6"))
    hour = minute.groupBy(
        F.date_trunc("hour", F.col("bucket")).alias("bucket"), "event_type"
    ).agg(F.sum("n_events").alias("n_events"), F.sum("v6").alias("v6"))
    day = hour.groupBy(
        F.date_trunc("day", F.col("bucket")).alias("bucket"), "event_type"
    ).agg(F.sum("n_events").alias("n_events"), F.sum("v6").alias("v6"))

    def finish(df: DataFrame, level: str) -> DataFrame:
        return df.select(
            F.lit(level).alias("resolution"),
            "bucket",
            "event_type",
            "n_events",
            F.round(F.col("v6") / 1000000.0, 6).alias("sum_value"),
        )

    return (
        finish(minute, "minute")
        .unionAll(finish(hour, "hour"))
        .unionAll(finish(day, "day"))
    )
