"""Scale-safe replacements for GLOBAL window functions.

A window with no PARTITION BY plans as a single-partition WindowExec —
every row through one task, the one shape that cannot survive a 100×
scale-up. These helpers compute the same exact results with the classic
two-pass construction: range-repartition on the full ordering key, do the
window LOCALLY per partition, then shift each partition by an offset
derived from the per-partition totals (a bounded O(num_partitions) driver
pass — same cost family as a bloom-filter build).

Exactness requires the ordering key to be UNIQUE (every call site orders
by (value, id)); range partitioning may then split the keyspace anywhere
without changing any rank or prefix sum.

The ranged frame is eagerly LOCAL-CHECKPOINTED before the offsets pass:
the offsets job and the result job must see the SAME partitioning, and
repartitionByRange SAMPLES its bounds — two independent executions of
the lineage could legally split the keyspace differently, silently
corrupting every offset (observed in testing before the pinning).
localCheckpoint(eager=True) truncates lineage entirely, so no later
recompute (cache eviction, clearCache() between build and action,
executor loss) can ever re-sample the bounds — persist() alone left that
window open (round-3 ADVICE) — and the caller's final plan reads the
materialized partitions instead of replaying the upstream (the
q_dsir_weights 20-exchange plan regression). Checkpoint blocks are freed
by the ContextCleaner when the frame is garbage-collected.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _ranged(df: DataFrame, order: list[Column], num_parts: int | None):
    n = num_parts or df.sparkSession.sparkContext.defaultParallelism
    part = df.repartitionByRange(n, *order).withColumn(
        "_pid", F.spark_partition_id()
    )
    return part.localCheckpoint(eager=True)


def _offsets(part: DataFrame, val: Column | None) -> dict[int, float]:
    """Per-partition exclusive prefix totals (row counts or value sums).
    Range partition ids are ordered like the sort key, so the exclusive
    running total over pid order is the global offset."""
    agg = F.count(F.lit(1)) if val is None else F.sum(val)
    sizes = {r["_pid"]: r["t"] for r in part.groupBy("_pid").agg(agg.alias("t")).collect()}
    out, acc = {}, 0
    for p in sorted(sizes):
        out[p] = acc
        acc += sizes[p]
    return out


def _offset_col(offsets: dict[int, float]) -> Column:
    expr = F.lit(0) if not offsets else None
    for p, off in offsets.items():
        c = F.when(F.col("_pid") == p, F.lit(off))
        expr = c if expr is None else expr.when(F.col("_pid") == p, F.lit(off))
    return expr.otherwise(F.lit(0)) if offsets else expr


def global_row_number(
    df: DataFrame, order: list[Column], out: str = "rk",
    num_parts: int | None = None,
) -> DataFrame:
    """Exact global row_number() over a unique ordering — no
    single-partition WindowExec."""
    part = _ranged(df, order, num_parts)
    offs = _offsets(part, None)
    local = F.row_number().over(W.partitionBy("_pid").orderBy(*order))
    return part.withColumn(out, (local + _offset_col(offs)).cast("long")).drop("_pid")


def global_prefix_sum(
    df: DataFrame, order: list[Column], val: Column, out: str = "ps",
    inclusive: bool = True, num_parts: int | None = None,
) -> DataFrame:
    """Exact global running sum of `val` in `order` — the distributed
    prefix-sum construction (per-partition totals → exclusive offsets →
    local cumsum + offset)."""
    part = _ranged(df, order, num_parts)
    part = part.withColumn("_v", val)
    offs = _offsets(part, F.col("_v"))
    w = (
        W.partitionBy("_pid").orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local = F.sum("_v").over(w)
    if not inclusive:
        local = local - F.col("_v")
    return part.withColumn(out, local + _offset_col(offs)).drop("_pid", "_v")


def global_prefix_max(
    df: DataFrame, order: list[Column], val: Column, out: str = "pm",
    exclusive: bool = True, num_parts: int | None = None,
) -> DataFrame:
    """Exact global running max of `val` in `order` (exclusive by default:
    the max over strictly-preceding rows, null for the global first row —
    the watermark/skyline shape). Offsets are the exclusive running max of
    the per-partition maxima."""
    part = _ranged(df, order, num_parts).withColumn("_v", val)
    maxes = {
        r["_pid"]: r["m"]
        for r in part.groupBy("_pid").agg(F.max("_v").alias("m")).collect()
    }
    offs, run = {}, None
    for p in sorted(maxes):
        offs[p] = run
        run = maxes[p] if run is None else max(run, maxes[p])
    off_expr = None
    for p, off in offs.items():
        branch = F.lit(off) if off is not None else F.lit(None)
        cond = F.col("_pid") == p
        off_expr = (
            F.when(cond, branch) if off_expr is None else off_expr.when(cond, branch)
        )
    if off_expr is None:
        off_expr = F.lit(None)
    off_expr = off_expr.cast(dict(part.dtypes)["_v"])
    end = -1 if exclusive else 0
    w = W.partitionBy("_pid").orderBy(*order).rowsBetween(W.unboundedPreceding, end)
    local = F.max("_v").over(w)
    # greatest() ignores nulls unless every argument is null — exactly the
    # "no preceding row anywhere" case, which must stay null
    return part.withColumn(out, F.greatest(local, off_expr)).drop("_pid", "_v")


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
