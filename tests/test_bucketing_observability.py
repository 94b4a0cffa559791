"""Bucketed co-located joins, streaming metrics listener, parameterized SQL."""

from __future__ import annotations

from pyspark.sql import functions as F

from debezium_cdc_kafka_spark.catalog import load_table
from debezium_cdc_kafka_spark.plans.inspect import plan_facts
from tests.conftest import SF_SMOKE


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """bucketBy(orderkey) on both fact tables → the lineitem⋈orders join
    needs NO Exchange: this is the 100 TB co-location strategy (write
    once bucketed, join forever shuffle-free). Plan-asserted."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS buckets LOCATION '{tmp_path}/wh'")
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force the issue
    try:
        load_table(spark, SF_SMOKE, "lineitem").write.bucketBy(8, "l_orderkey").sortBy(
            "l_orderkey"
        ).mode("overwrite").saveAsTable("buckets.li_b")
        load_table(spark, SF_SMOKE, "orders").write.bucketBy(8, "o_orderkey").sortBy(
            "o_orderkey"
        ).mode("overwrite").saveAsTable("buckets.ord_b")
        joined = (
            spark.table("buckets.li_b")
            .join(
                spark.table("buckets.ord_b"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        facts = plan_facts(joined)
        # the join itself is exchange-free; the only exchange is the final
        # tiny aggregation shuffle
        assert facts.sort_merge_joins >= 1, facts
        assert facts.exchanges <= 1, facts
        n = joined.count()
        assert n == 5  # five order priorities
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS buckets.li_b")
        spark.sql("DROP TABLE IF EXISTS buckets.ord_b")


def test_bucketed_events_make_user_windows_shuffle_free(spark, tmp_path):
    """The behavioral family (funnel, sessions, cohorts) keys everything
    on user_id; its docstrings claim that on a user_id-bucketed events
    table the big shuffle drops out. Proof: per-user unordered window
    aggregates over the bucketed table plan with ZERO data exchanges —
    the bucket layout (written once) satisfies the window's required
    hashpartitioning(user_id) forever after."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS buckets2 LOCATION '{tmp_path}/wh'")
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    try:
        load_table(spark, SF_SMOKE, "events").write.bucketBy(8, "user_id").mode(
            "overwrite"
        ).saveAsTable("buckets2.ev_b")
        from pyspark.sql.window import Window as W

        w = W.partitionBy("user_id")
        per_user = (
            spark.table("buckets2.ev_b")
            .withColumn("s_ts", F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w))
            .groupBy("user_id")
            .agg(F.first("s_ts").alias("s_ts"))
        )
        facts = plan_facts(per_user)
        assert facts.exchanges == 0, facts
        assert per_user.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS buckets2.ev_b")


def test_metrics_listener_counts_rows(spark, tmp_path):
    from debezium_cdc_kafka_spark.streaming.observability import MetricsCollector

    collector = MetricsCollector()
    spark.streams.addListener(collector)
    try:
        ev = load_table(spark, SF_SMOKE, "events")
        d = str(tmp_path / "ev")
        ev.repartition(3).write.parquet(d)
        stream = (
            spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", "1").parquet(d)
        )
        q = (
            stream.groupBy("event_type")
            .count()
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName("obs_out")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        import time

        deadline = time.time() + 15
        while collector.total_rows() < 1000 and time.time() < deadline:
            time.sleep(0.5)  # listener events arrive asynchronously
        assert collector.total_rows() == 1000  # all events counted across batches
        assert len(collector.metrics) >= 3  # one per micro-batch
    finally:
        spark.streams.removeListener(collector)


def test_parameterized_sql(spark):
    """R6 (reference postgres.py:134–145 `?` placeholders) → spark.sql
    named parameters: no string interpolation, no injection surface."""
    load_table(spark, SF_SMOKE, "customer").createOrReplaceTempView("customer")
    out = spark.sql(
        "SELECT count(*) AS n FROM customer WHERE c_mktsegment = :seg AND c_acctbal > :minbal",
        args={"seg": "BUILDING", "minbal": 0.0},
    ).first()
    manual = (
        load_table(spark, SF_SMOKE, "customer")
        .filter((F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 0.0))
        .count()
    )
    assert out.n == manual > 0
