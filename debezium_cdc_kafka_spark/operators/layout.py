"""Data-layout operators: Z-order (Morton) clustering for multi-column
file skipping.

The reference has no storage-layout tuning at all (its target is a
row-store Postgres replica, reference: app/utils/postgres.py:100–107).
At 100 TB, layout IS the query optimizer's biggest lever: parquet
min/max stats can only skip files when values are clustered, and
sorting by one column destroys clustering for every other column.
Z-ordering interleaves the bits of several columns so a file's
row-group stats stay tight on ALL of them — a 2-D box predicate then
touches O(perimeter) files instead of O(n).

The z-value itself is pure integer bit math (built-in expressions, no
UDF), so computing it costs one narrow projection; the layout write is
``repartitionByRange(z)`` + per-partition sort — one shuffle that buys
every later scan its skipping. `zorder_write` is the maintenance
entry point; `q_zorder_key` oracle-gates the key computation; the
skipping payoff is measured (files touched, z vs hash layout) in
test_zorder.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
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


_ZBITS = 16


def z_value(a: Column, b: Column) -> Column:
    """Morton-interleave the low 16 bits of two non-negative ints:
    bit i of `a` lands at position 2i, bit i of `b` at 2i+1."""
    masked_a = a.cast("long") % (1 << _ZBITS)
    masked_b = b.cast("long") % (1 << _ZBITS)
    terms = F.transform(
        F.sequence(F.lit(0), F.lit(_ZBITS - 1)),
        lambda i: (
            F.floor(masked_a / F.pow(F.lit(2.0), i)).cast("long") % 2
        )
        * F.pow(F.lit(2.0), i * 2).cast("long")
        + (F.floor(masked_b / F.pow(F.lit(2.0), i)).cast("long") % 2)
        * F.pow(F.lit(2.0), i * 2 + 1).cast("long"),
    )
    return F.aggregate(terms, F.lit(0).cast("long"), lambda acc, x: acc + x)


def z_value_sql(a: str, b: str) -> str:
    return (
        "list_sum(list_transform(range(0, 16), i -> "
        f"((({a}) % 65536 // CAST(pow(2, i) AS BIGINT)) % 2) * CAST(pow(2, 2*i) AS BIGINT)"
        f" + ((({b}) % 65536 // CAST(pow(2, i) AS BIGINT)) % 2) * CAST(pow(2, 2*i+1) AS BIGINT)))"
    )


ZKEY_ORACLE = f"""
SELECT l_orderkey, l_linenumber, l_partkey,
       CAST(datediff('day', TIMESTAMP '1992-01-01', l_shipdate) AS BIGINT) AS ship_day,
       CAST({z_value_sql("l_partkey", "datediff('day', TIMESTAMP '1992-01-01', l_shipdate)")} AS BIGINT) AS zval
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-06-01' AND l_shipdate < TIMESTAMP '1995-07-01'
"""


@query("q_zorder_key", ZKEY_ORACLE)
def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Morton key for (l_partkey, ship-day), shown on one month of
    lineitem: exact integer bit interleaving via a 16-term fold, no UDF.
    Both engines run the identical integer expression, so the oracle
    match is exact. This key is what zorder_write range-partitions on."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-07-01").cast("timestamp"))
    )
    ship_day = F.datediff("l_shipdate", F.lit("1992-01-01").cast("timestamp"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        ship_day.cast("long").alias("ship_day"),
        z_value(F.col("l_partkey"), ship_day).alias("zval"),
    )


def zorder_write(
    df: DataFrame, a: str, b: str, path: str, n_files: int
) -> None:
    """Cluster `df` on the Morton key of (a, b) and write `n_files`
    parquet files: repartitionByRange on z gives each file a compact
    z-range (→ tight min/max on BOTH source columns), the within-
    partition sort keeps row groups tight too."""
    keyed = df.withColumn("_z", z_value(F.col(a), F.col(b)))
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
