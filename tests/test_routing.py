"""Multi-table routing + schema evolution: the capture-the-whole-schema
design the reference configures (register-postgres.json:12) but never
implements (its consumer handles only `customers`)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from debezium_cdc_kafka_spark.sources.cdc_events import widened_envelope_schema
from debezium_cdc_kafka_spark.streaming.cdc_stream import (
    STATE_SCHEMA,
    ParquetSnapshotTarget,
    file_change_stream,
    run_cdc_stream,
)
from debezium_cdc_kafka_spark.streaming.routing import (
    TableRoute,
    run_routed_stream,
    table_name,
)

RAW_SCHEMA = "key string, value string, topic string, partition int, offset long, timestamp timestamp"


def env(op, before=None, after=None, ts_ms=0):
    return json.dumps(
        {"payload": {"op": op, "before": before, "after": after, "ts_ms": ts_ms}}
    )


def rec(key, value, topic, offset):
    return (str(key), value, topic, 0, offset, None)


def after(i, v, ts="x", **extra):
    return {"id": i, "value": v, "ts": ts, **extra}


def test_table_name_extraction(spark):
    df = spark.createDataFrame(
        [("dbserver1.inventory.customers",), ("dbserver1.inventory.order_items",)],
        "topic string",
    )
    got = [r[0] for r in df.select(table_name(F.col("topic"))).collect()]
    assert got == ["customers", "order_items"]


def test_multi_table_routing(spark, tmp_path):
    """One stream carrying three topics → two routed targets + quarantine.
    Each table's final state must equal what a single-table run over just
    its events would produce."""
    cust = "dbserver1.inventory.customers"
    orde = "dbserver1.inventory.orders"
    unknown = "dbserver1.inventory.products"
    rows = [
        rec(1, env("c", None, after(1, 10.0)), cust, 0),
        rec(1, env("c", None, after(1, 500.0)), orde, 1),  # same key, other table
        rec(2, env("c", None, after(2, 20.0)), cust, 2),
        rec(1, env("u", {"id": 1}, after(1, 11.0)), cust, 3),
        rec(1, env("d", {"id": 1}, None), orde, 4),
        rec(7, env("c", None, after(7, 70.0)), unknown, 5),  # no route
        rec(2, env("d", {"id": 2}, None), cust, 6),
    ]
    env_dir = str(tmp_path / "envelopes")
    spark.createDataFrame(rows, RAW_SCHEMA).repartition(3).write.parquet(env_dir)

    routes = {
        "customers": TableRoute(str(tmp_path / "t_customers")),
        "orders": TableRoute(str(tmp_path / "t_orders")),
    }
    quarantine = str(tmp_path / "unrouted")
    q = run_routed_stream(
        spark,
        file_change_stream(spark, env_dir),
        routes,
        str(tmp_path / "ckpt"),
        unknown_table_path=quarantine,
    )
    q.awaitTermination(120)

    cust_state = {
        r.id: r.value
        for r in routes["customers"].target().read_view(spark).collect()
    }
    orders_state = {
        r.id: r.value for r in routes["orders"].target().read_view(spark).collect()
    }
    assert cust_state == {1: 11.0}  # id=2 deleted, id=1 updated
    assert orders_state == {}  # the one orders row was deleted
    unrouted = spark.read.parquet(quarantine)
    assert [r.topic for r in unrouted.collect()] == [unknown]
    # quarantined rows keep full provenance for later replay
    assert {"key", "value", "topic", "offset", "epoch"} <= set(unrouted.columns)


def test_schema_evolution_widened_after(spark, tmp_path):
    """Old-generation envelopes (no `email`) and new-generation ones (with
    it) decode under ONE widened schema; old rows surface null for the new
    column and a later new-generation update backfills it."""
    widened = widened_envelope_schema(T.StructField("email", T.StringType()))
    state_schema = T.StructType(
        list(STATE_SCHEMA.fields[:3])
        + [T.StructField("email", T.StringType())]
        + list(STATE_SCHEMA.fields[3:])
    )
    topic = "dbserver1.inventory.customers"
    rows = [
        rec(1, env("c", None, after(1, 10.0)), topic, 0),  # old gen: no email
        rec(2, env("c", None, after(2, 20.0, email="b@x.io")), topic, 1),  # new gen
        rec(1, env("u", {"id": 1}, after(1, 11.0, email="a@x.io")), topic, 2),
    ]
    env_dir = str(tmp_path / "envelopes")
    spark.createDataFrame(rows, RAW_SCHEMA).write.parquet(env_dir)

    target_path = str(tmp_path / "target")
    q = run_cdc_stream(
        spark,
        file_change_stream(spark, env_dir),
        target_path,
        str(tmp_path / "ckpt"),
        envelope_schema=widened,
        after_cols=("value", "ts", "email"),
        state_schema=state_schema,
    )
    q.awaitTermination(120)

    got = {
        r.id: (r.value, r.email)
        for r in ParquetSnapshotTarget(target_path, schema=state_schema)
        .read_view(spark)
        .collect()
    }
    assert got == {1: (11.0, "a@x.io"), 2: (20.0, "b@x.io")}


def test_schema_evolution_old_rows_null_new_column(spark):
    """Decode alone: an old envelope under the widened schema yields
    email=null, not a parse failure (PERMISSIVE missing-field rule)."""
    from debezium_cdc_kafka_spark.operators.cdc import decode_envelope

    widened = widened_envelope_schema(T.StructField("email", T.StringType()))
    raw = spark.createDataFrame(
        [rec(5, env("c", None, after(5, 50.0)), "t.s.customers", 0)], RAW_SCHEMA
    )
    row = decode_envelope(raw, schema=widened).select("after.email", "is_malformed").first()
    assert row.email is None and row.is_malformed is False
