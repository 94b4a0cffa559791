"""Scale-safe replacements for GLOBAL window functions.

A window with no PARTITION BY plans as a single-partition WindowExec —
every row through one task, the one shape that cannot survive a 100×
scale-up. These helpers compute the same exact results with the classic
two-pass construction: range-repartition on the full ordering key, do the
window LOCALLY per partition, then shift each partition by an offset
derived from the per-partition totals.

Exactness requires the ordering key to be UNIQUE (every call site orders
by (value, id)); range partitioning may then split the keyspace anywhere
without changing any rank or prefix sum.

The ranged frame is eagerly LOCAL-CHECKPOINTED: the offsets branch and
the ranked branch must see the SAME partitioning, and repartitionByRange
SAMPLES its bounds — two independent executions of the lineage could
legally split the keyspace differently, silently corrupting every offset
(observed in testing before the pinning). Exchange reuse can NOT be the
pin: spark_partition_id() is flagged nondeterministic, which defeats
sameResult() and leaves the two range exchanges separate (verified on the
executed plan). localCheckpoint(eager=True) truncates lineage entirely,
so no recompute can ever re-sample the bounds, and both branches read the
materialized partitions. Checkpoint blocks are freed by the
ContextCleaner when the frame is garbage-collected.

The offsets are computed IN-PLAN, not via a driver collect: the
per-partition totals are a map-side-collapsing aggregate to ≤ num_parts
rows, the exclusive prefix over them is a window over that tiny frame
(single-partition, but bounded by CLUSTER size, not data size), and the
result broadcast-joins back onto the checkpointed ranged frame — one
fewer job per call than the collect-and-literal construction, and no
O(num_partitions) CASE WHEN chain in the final projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _ranged(df: DataFrame, order: list[Column], num_parts: int | None) -> DataFrame:
    n = num_parts or df.sparkSession.sparkContext.defaultParallelism
    part = df.repartitionByRange(n, *order).withColumn("_pid", F.spark_partition_id())
    return part.localCheckpoint(eager=True)


def _prev():
    """Exclusive prefix frame over the per-partition totals, in _pid order.
    Range partition ids are ordered like the sort key, so the exclusive
    running total over pid order is the global offset. The frame this
    window runs over has ≤ num_parts rows — a cluster-sized constant.
    (Built lazily: Window construction needs an active session.)"""
    return W.orderBy("_pid").rowsBetween(W.unboundedPreceding, -1)


def global_row_number(
    df: DataFrame, order: list[Column], out: str = "rk",
    num_parts: int | None = None,
) -> DataFrame:
    """Exact global row_number() over a unique ordering — no
    data-sized single-partition WindowExec."""
    part = _ranged(df, order, num_parts)
    offs = (
        part.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_t"))
        .select("_pid", F.coalesce(F.sum("_t").over(_prev()), F.lit(0)).alias("_off"))
    )
    local = F.row_number().over(W.partitionBy("_pid").orderBy(*order))
    return (
        part.join(F.broadcast(offs), "_pid")
        .withColumn(out, (local + F.col("_off")).cast("long"))
        .drop("_pid", "_off")
    )


def global_prefix_sum(
    df: DataFrame, order: list[Column], val: Column, out: str = "ps",
    inclusive: bool = True, num_parts: int | None = None,
) -> DataFrame:
    """Exact global running sum of `val` in `order` — the distributed
    prefix-sum construction (per-partition totals → exclusive offsets →
    local cumsum + offset), all in one plan."""
    part = _ranged(df, order, num_parts).withColumn("_v", val)
    offs = (
        part.groupBy("_pid")
        .agg(F.sum("_v").alias("_t"))
        .select("_pid", F.coalesce(F.sum("_t").over(_prev()), F.lit(0)).alias("_off"))
    )
    w = (
        W.partitionBy("_pid").orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local = F.sum("_v").over(w)
    if not inclusive:
        local = local - F.col("_v")
    return (
        part.join(F.broadcast(offs), "_pid")
        .withColumn(out, local + F.col("_off"))
        .drop("_pid", "_v", "_off")
    )


def global_prefix_max(
    df: DataFrame, order: list[Column], val: Column, out: str = "pm",
    exclusive: bool = True, num_parts: int | None = None,
) -> DataFrame:
    """Exact global running max of `val` in `order` (exclusive by default:
    the max over strictly-preceding rows, null for the global first row —
    the watermark/skyline shape). Offsets are the exclusive running max of
    the per-partition maxima (null when no partition precedes)."""
    part = _ranged(df, order, num_parts).withColumn("_v", val)
    offs = (
        part.groupBy("_pid")
        .agg(F.max("_v").alias("_m"))
        .select("_pid", F.max("_m").over(_prev()).alias("_off"))
    )
    end = -1 if exclusive else 0
    w = W.partitionBy("_pid").orderBy(*order).rowsBetween(W.unboundedPreceding, end)
    local = F.max("_v").over(w)
    # greatest() ignores nulls unless every argument is null — exactly the
    # "no preceding row anywhere" case, which must stay null
    return (
        part.join(F.broadcast(offs), "_pid")
        .withColumn(out, F.greatest(local, F.col("_off")))
        .drop("_pid", "_v", "_off")
    )


def global_ntile(
    df: DataFrame, order: list[Column], n_tiles: int, out: str = "tile",
    num_parts: int | None = None,
) -> DataFrame:
    """Exact global ntile(k): derived from the two-pass row_number plus
    the total count, reproducing Spark's tile-size semantics (first
    n mod k tiles get one extra row)."""
    ranked = global_row_number(df, order, out="_rn", num_parts=num_parts)
    # total count via a tiny aggregate (broadcast single row)
    n_df = ranked.agg(F.count(F.lit(1)).alias("_n"))
    ranked = ranked.crossJoin(F.broadcast(n_df))
    base = F.floor(F.col("_n") / n_tiles)
    rem = F.col("_n") % n_tiles
    cut = rem * (base + 1)  # rows living in the (base+1)-sized tiles
    tile = F.when(
        F.col("_rn") <= cut, F.floor((F.col("_rn") - 1) / (base + 1)) + 1
    ).otherwise(rem + F.floor((F.col("_rn") - cut - 1) / base) + 1)
    return ranked.withColumn(out, tile.cast("int")).drop("_rn", "_n")
