"""Behavioral analytics over the event stream: funnel conversion and
cohort retention — the query family a CDC-fed events table exists to
answer (the reference only *transports* events, reference:
app/consumer/consumer.py:55–75; analyzing them is the north-star
widening).

Scale notes: every stage keys on ``user_id``, so the chained
aggregations and self-joins all reuse one hash-partitioning — on a
cluster the events table would be bucketed by user_id and none of these
steps shuffles more than once. No windows over the whole table, no
driver-side state.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


FUNNEL_ORACLE = """
WITH s AS (
  SELECT user_id, min(ts) AS s_ts FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS c_ts
  FROM events e JOIN s ON e.user_id = s.user_id
  WHERE e.event_type = 'click' AND e.ts > s.s_ts GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS p_ts
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.c_ts GROUP BY e.user_id
)
SELECT stage, stage_ord, users FROM (
  SELECT 'signup' AS stage, 1 AS stage_ord, count(*) AS users FROM s
  UNION ALL SELECT 'click_after_signup', 2, count(*) FROM c
  UNION ALL SELECT 'purchase_after_click', 3, count(*) FROM p
)
"""


@query("q_funnel_3step", FUNNEL_ORACLE)
def q_funnel_3step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-step funnel (signup → later click → later purchase):
    users surviving each stage. Each stage is min-timestamp-per-user of
    qualifying events strictly after the previous stage's timestamp —
    expressed as groupBy(user_id) chains, not window scans, so every
    stage is a partial-aggregatable map-side combine and all joins are
    user_id-co-partitioned."""
    events = load_table(spark, sf_dir, "events")
    s = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    c = (
        events.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        events.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )

    def stage(df: DataFrame, name: str, ord_: int) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("users")).select(
            F.lit(name).alias("stage"), F.lit(ord_).alias("stage_ord"), "users"
        )

    return (
        stage(s, "signup", 1)
        .unionAll(stage(c, "click_after_signup", 2))
        .unionAll(stage(p, "purchase_after_click", 3))
    )


COHORT_ORACLE = """
WITH cohort AS (
  -- DuckDB date_trunc('week') yields DATE; cast back to TIMESTAMP for
  -- schema parity with Spark's date_trunc
  SELECT user_id, CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS active_week FROM events
)
SELECT cohort_week,
       CAST(date_diff('day', cohort_week, active_week) // 7 AS INT) AS week_offset,
       count(DISTINCT user_id) AS active_users
FROM activity JOIN cohort USING (user_id)
WHERE active_week >= cohort_week
GROUP BY cohort_week, week_offset
"""


@query("q_cohort_retention_weekly", COHORT_ORACLE)
def q_cohort_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by signup week, counted in
    each subsequent week they were active. The distinct-activity set and
    the cohort map both key on user_id (one shuffle each, then a
    co-partitioned join); the final count-distinct re-keys on the small
    (cohort_week, week_offset) grid."""
    events = load_table(spark, sf_dir, "events")
    cohort = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    )
    activity = events.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("active_week")
    ).distinct()
    return (
        activity.join(cohort, "user_id")
        .filter(F.col("active_week") >= F.col("cohort_week"))
        .groupBy(
            "cohort_week",
            F.expr("CAST(datediff(active_week, cohort_week) DIV 7 AS INT)").alias(
                "week_offset"
            ),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
    )
