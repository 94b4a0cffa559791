"""Deterministic CDC workload generator — the reference's generate.py,
Spark-shaped and collect-free.

Maps (reference app/utils/generate.py):
- G1 Faker person records (:19–34, `'` stripped)   → hash-indexed name
  pools over `spark.range` (no Python RNG, reproducible at any scale)
- G3 random op chooser + anti-double-delete rule (:129–134: two
  consecutive deletes rewritten to insert)         → hash-derived op +
  lag-window rewrite
- G2 SQL-string building (:37–117)                 → unnecessary: ops are
  emitted directly as Debezium envelopes
- G4 fixed-rate loop (:16, 126–170)                → `rate` readStream
  mapped through the same op logic (`workload_rate_stream`)

The batch form feeds pipeline tests; the rate form demos live streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

FIRST_NAMES = (
    "Ivan", "Maria", "Alexei", "Olga", "Dmitri", "Anna", "Sergei", "Elena",
    "Nikolai", "Tatiana", "Pavel", "Irina", "Mikhail", "Ksenia", "Viktor", "Daria",
)
LAST_NAMES = (
    "Ivanov", "Petrova", "Sidorov", "Smirnova", "Volkov", "Kuznetsova",
    "Popov", "Sokolova", "Lebedev", "Kozlova", "Novikov", "Morozova",
)


def _pick(pool: tuple[str, ...], h):
    arr = F.array(*[F.lit(x) for x in pool])
    return F.element_at(arr, (h % len(pool) + 1).cast("int"))


def synthetic_people(spark: SparkSession, n: int, seed: str = "wl") -> DataFrame:
    """(person_id, first_name, last_name, email) — Faker stand-in, derived
    from hashes so every engine/run agrees. Emails follow Faker's shape;
    names contain no quotes, so the reference's sanitization step
    (generate.py:26–27) is a no-op by construction."""
    df = spark.range(n).select(F.col("id").alias("person_id"))
    h1 = F.abs(F.xxhash64(F.concat(F.lit(seed), F.lit(":f:"), F.col("person_id"))))
    h2 = F.abs(F.xxhash64(F.concat(F.lit(seed), F.lit(":l:"), F.col("person_id"))))
    first, last = _pick(FIRST_NAMES, h1), _pick(LAST_NAMES, h2)
    return df.select(
        "person_id",
        first.alias("first_name"),
        last.alias("last_name"),
        F.concat(F.lower(first), F.lit("."), F.lower(last), F.lit("@example.com")).alias(
            "email"
        ),
    )


def assign_ops(events: DataFrame, key: str = "person_id", order: str = "seq") -> DataFrame:
    """op ∈ {c,u,d} per event, hash-derived, then the reference's
    anti-repeat rule applied per key: a delete immediately following a
    delete becomes an insert (generate.py:133–134 — their rule is global
    because the generator is serial; per-key is the distributed analogue)."""
    raw_op = F.element_at(
        F.array(F.lit("c"), F.lit("u"), F.lit("d")),
        (F.abs(F.xxhash64(F.concat(F.lit("op:"), F.col(order)))) % 3 + 1).cast("int"),
    )
    w = W.partitionBy(key).orderBy(order)
    with_op = events.withColumn("_raw_op", raw_op)
    prev = F.lag("_raw_op").over(w)
    return with_op.withColumn(
        "op",
        F.when((F.col("_raw_op") == "d") & (prev == "d"), F.lit("c")).otherwise(
            F.col("_raw_op")
        ),
    ).drop("_raw_op")


def workload_change_events(spark: SparkSession, n_people: int, n_ops: int) -> DataFrame:
    """A second, independent Debezium-shaped change stream (the CDC tests'
    primary stream derives from the events table; this one exercises the
    generator path). Returns the engine's Kafka-record shape."""
    ops = (
        spark.range(n_ops)
        .select(F.col("id").alias("seq"))
        .withColumn(
            "person_id",
            F.abs(F.xxhash64(F.concat(F.lit("who:"), F.col("seq")))) % n_people,
        )
    )
    ops = assign_ops(ops)
    people = synthetic_people(spark, n_people)
    joined = ops.join(people, "person_id")
    after = F.when(
        F.col("op").isin("c", "u"),
        F.struct(
            F.col("person_id").alias("id"),
            F.col("first_name"),
            F.col("last_name"),
            F.col("email"),
        ),
    )
    before = F.when(F.col("op") == "d", F.struct(F.col("person_id").alias("id")))
    value = F.to_json(
        F.struct(
            F.struct(
                F.col("op").alias("op"),
                before.alias("before"),
                after.alias("after"),
                F.col("seq").alias("ts_ms"),
            ).alias("payload")
        )
    )
    return joined.select(
        F.col("person_id").cast("string").alias("key"),
        value.alias("value"),
        F.lit("dbserver1.inventory.customers").alias("topic"),
        F.lit(0).alias("partition"),
        F.col("seq").alias("offset"),
        F.current_timestamp().alias("timestamp"),
    )


def workload_rate_stream(spark: SparkSession, rows_per_second: int = 1) -> DataFrame:
    """G4: the live generator — a rate source mapped through the same op
    logic (minus the lag rewrite, which needs bounded state in streaming;
    `dropDuplicates`-style stateful cleanup applies if required). One row
    every 1/rate seconds replaces the sleep-compensated loop
    (generate.py:167–170)."""
    rate = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    seq = F.col("value")
    person = F.abs(F.xxhash64(F.concat(F.lit("who:"), seq))) % 1000
    op = F.element_at(
        F.array(F.lit("c"), F.lit("u"), F.lit("d")),
        (F.abs(F.xxhash64(F.concat(F.lit("op:"), seq))) % 3 + 1).cast("int"),
    )
    return rate.select(
        person.cast("string").alias("key"),
        F.to_json(
            F.struct(
                F.struct(
                    op.alias("op"),
                    F.when(op == "d", F.struct(person.alias("id"))).alias("before"),
                    F.when(
                        op.isin("c", "u"),
                        F.struct(person.alias("id"), F.lit(0.0).alias("value")),
                    ).alias("after"),
                    F.unix_millis(F.col("timestamp")).alias("ts_ms"),
                ).alias("payload")
            )
        ).alias("value"),
        F.lit("dbserver1.inventory.customers").alias("topic"),
        F.lit(0).alias("partition"),
        seq.alias("offset"),
        F.col("timestamp"),
    )
