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
from ..functions.hashing import md5_long

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
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


# ---------------------------------------------------------------------------
# Count-min sketch (deterministic, oracle-exact construction).
# ---------------------------------------------------------------------------

_CMS_D = 4
_CMS_W = 1024
_CMS_TERMS = ("spark", "join", "stream", "data", "the")
_CMS_TERMS_SQL = ", ".join(f"('{t}')" for t in _CMS_TERMS)

CMS_ORACLE = f"""
WITH toks AS (
  SELECT t.term
  FROM documents d, unnest(string_split(d.text, ' ')) AS t(term)
  WHERE t.term <> ''
), cms AS (
  SELECT r.i AS d,
         ('0x' || substr(md5(term || '#' || r.i), 1, 15))::BIGINT % {_CMS_W}
           AS bucket,
         CAST(count(*) AS BIGINT) AS cnt
  FROM toks CROSS JOIN range(0, {_CMS_D}) AS r(i)
  GROUP BY 1, 2
), qterms AS (SELECT * FROM (VALUES {_CMS_TERMS_SQL}) AS q(term)),
qbuckets AS (
  SELECT term, r.i AS d,
         ('0x' || substr(md5(term || '#' || r.i), 1, 15))::BIGINT % {_CMS_W}
           AS bucket
  FROM qterms CROSS JOIN range(0, {_CMS_D}) AS r(i)
), est AS (
  SELECT q.term, min(c.cnt) AS cms_estimate
  FROM qbuckets q JOIN cms c ON c.d = q.d AND c.bucket = q.bucket
  GROUP BY q.term
), exact AS (
  SELECT term, CAST(count(*) AS BIGINT) AS exact_count
  FROM toks WHERE term IN (SELECT term FROM qterms) GROUP BY term
)
SELECT e.term, x.exact_count, e.cms_estimate
FROM est e JOIN exact x USING (term)
"""


@query("q_countmin_sketch", CMS_ORACLE)
def q_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation: a {_CMS_D}×{_CMS_W} counter
    table built from md5-derived bucket hashes, queried for five terms
    with the exact counts alongside (estimate ≥ exact always; equality
    when no bucket collision). The sketch is DETERMINISTIC — same hash
    family in both engines ([[spark-duckdb-oracle-parity]] md5 rule) —
    so unlike approx_count_distinct this sketch is oracle-gated exactly.

    Scale shape: the {_CMS_D}-way explode stays in the scan stage; the
    sketch aggregation shuffles at most d·w = {_CMS_D * _CMS_W} counter
    rows regardless of corpus size (partial map-side combine does the
    heavy lifting), which is the entire point of a CMS at 100 TB: a
    fixed-size mergeable summary of an unbounded stream. The same
    construction maintains incrementally under CDC deltas (counts are a
    commutative monoid, like [[cdc-incremental-agg]])."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")

    def bucket(term_col, i: int):
        return md5_long(F.concat(term_col, F.lit(f"#{i}"))) % _CMS_W

    hashed = toks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("d"), bucket(F.col("term"), i).alias("bucket")
                    )
                    for i in range(_CMS_D)
                ]
            )
        ).alias("s")
    ).select("s.d", "s.bucket")
    cms = hashed.groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("cnt"))

    qterms = spark.range(1).select(
        F.explode(F.array(*[F.lit(t) for t in _CMS_TERMS])).alias("term")
    )
    qbuckets = qterms.select(
        "term",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("d"), bucket(F.col("term"), i).alias("bucket")
                    )
                    for i in range(_CMS_D)
                ]
            )
        ).alias("s"),
    ).select("term", "s.d", "s.bucket")
    est = (
        cms.join(F.broadcast(qbuckets), ["d", "bucket"])
        .groupBy("term")
        .agg(F.min("cnt").alias("cms_estimate"))
    )
    exact = (
        toks.filter(F.col("term").isin(*_CMS_TERMS))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("exact_count"))
    )
    return est.join(exact, "term").select("term", "exact_count", "cms_estimate")


@query("q_hll_sketch_union")
def q_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-user sketches via Apache DataSketches HLL
    (built into Spark as `hll_sketch_agg`/`hll_union_agg`): one sketch
    per event type, then the GLOBAL distinct estimate obtained by
    UNIONING the per-type sketches — never re-touching the raw events.
    This is the 100 TB cardinality pattern: partial sketches are a few KB
    each, re-aggregable along any dimension hierarchy (type→all here),
    shippable across clusters, and storable next to the rollup.
    Deterministic for a given input multiset (the sketch hash is fixed),
    but engine-specific — DuckDB's approx_count_distinct uses a
    different HLL, so no value oracle exists: the driver records the
    rows-only check and tests/test_approx.py bounds the estimates
    against exact counts instead."""
    events = load_table(spark, sf_dir, "events")
    per_type = events.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"),
        F.countDistinct("user_id").alias("exact_distinct"),
    )
    typed = per_type.select(
        "event_type",
        F.round(F.hll_sketch_estimate("sk")).cast("long").alias("hll_estimate"),
        "exact_distinct",
    )
    overall = per_type.agg(
        F.hll_union_agg("sk").alias("sk"),
        F.sum(F.lit(0)).alias("_z"),  # placeholder keeps agg non-empty on 0 rows
    ).select(
        F.lit("_all_types").alias("event_type"),
        F.round(F.hll_sketch_estimate("sk")).cast("long").alias("hll_estimate"),
        F.lit(None).cast("long").alias("exact_distinct"),
    )
    return typed.unionByName(overall)
