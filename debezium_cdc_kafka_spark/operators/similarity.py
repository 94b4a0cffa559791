"""Similarity search over the embeddings table (ANN, north-star extension).

Three plans, from exact to scale-path:

- brute-force top-k   → broadcast the query set against the corpus; exact.
- IVF top-k           → restrict candidates to the query's coarse cell
                        (label column = cell assignment); the standard
                        billion-vector layout: partition corpus by cell,
                        probe only matching partitions.
- hyperplane LSH      → 8 deterministic random hyperplanes → 8-bit bucket;
                        candidates share the query's bucket.

Cosine is a sequential-fold double dot product (functions shared with
operators/dedup.py) so the DuckDB oracle reproduces values bit-for-bit;
no Pandas UDF is needed for 64-dim vectors — `zip_with`/`aggregate` stay
inside whole-stage codegen. For very high dims or batched GEMM, swap
`dot_expr` for a vectorized Pandas UDF (see operators/multimodal.py for
the Arrow plumbing pattern).

Scale notes: queries are broadcast (they're the small side by
construction); the corpus scan is embarrassingly parallel; top-k per query
is a window over (query, cell) partitions — bounded by k, no global sort.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..catalog import load_table
from ..functions.hashing import md5_long, md5_long_sql
from .dedup import (
    _BAND_W_SQL,
    _VERIFY_BROADCAST_MAX,
    EMB_DOT_SQL,
    EMB_NORM_SQL,
    dot_expr,
    pair_fanout,
    sq_norm_expr,
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Query set: every 100th vector (deterministic, SF-independent rule).
_QUERY_PRED = "vec_id % 100 = 0"


# Seed count for every md5-ordered k-means seed draw in this module:
# k = max(8, ceil(sqrt(n)/6)), i.e. k ∝ √n (VERDICT r5 item 3). The r5
# form k ∝ n made cells constant-SIZE (linear in-cell pair space) but the
# assignment scan is emb × broadcast(seeds) = n·k distance folds — with
# k ∝ n that is O(n²/250) work and an O(n) broadcast, the dominant
# quadratic at 100 TB. k ∝ √n balances both sides: assignment n·k =
# O(n^1.5), in-cell pairs n²/k = O(n^1.5), broadcast seed table O(√n)
# (a few MB even at 10^10 vectors). Measured on the 4× fixture: k 8→15
# (was 8→32), in-cell pair space 500k→4.3M ≈ 8.5× ≈ (4×)^1.5. At every
# checked-in SF (n ≤ 2000) k still evaluates to 8 — ceil(√2000/6) = 8 —
# so every oracle hash is unchanged; the knob engages beyond n = 2304.
_SEED_SQRT_DIV = 6.0

_SEEDS_LIMIT_SQL = (
    "greatest(8, CAST(ceil(sqrt(CAST((SELECT count(*) FROM embeddings)"
    " AS DOUBLE)) / 6.0) AS BIGINT))"
)


def _seed_count(emb) -> int:
    import math

    return max(8, math.ceil(math.sqrt(emb.count()) / _SEED_SQRT_DIV))


def _md5_seeds(emb: DataFrame) -> DataFrame:
    """The deterministic k-means|| stand-in seed set every quantizer
    consumer shares: the k = _seed_count vectors with the smallest
    md5(vec_id), as (cluster_id, ce)."""
    return (
        emb.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(_seed_count(emb))
        .select(
            F.col("vec_id").alias("cluster_id"), F.col("embedding").alias("ce")
        )
    )


# Past this seed count the literal argmin's expression tree (k × 64
# literal doubles) stops being worth the plan/codegen size and the
# broadcast-join + window form takes over. k = √n/6 ⇒ the literal path
# covers corpora to ~2.4M vectors; the join path is the proven large-k
# shape (it is exactly the pre-r9 plan).
_SEED_LITERAL_MAX = 256


def _seed_d2_structs(emb: DataFrame) -> list | None:
    """One (d2, cluster_id) struct column per seed, with the seed vectors
    inlined as literal double arrays (collected at plan-build time — an
    O(k) driver reduction). None when the seed count exceeds
    _SEED_LITERAL_MAX and the caller should use its join-based form.
    Each d2 is the same sequential (x−y)² fold the join form computes,
    rounded to 6dp, so the structs order identically."""
    seed_rows = _md5_seeds(emb).collect()
    if len(seed_rows) > _SEED_LITERAL_MAX:
        return None
    idt = dict(emb.dtypes)["vec_id"]
    structs = []
    for r in seed_rows:
        w = F.array(*[F.lit(float(v)) for v in r["ce"]])
        diffs = F.zip_with(
            F.transform(F.col("embedding"), lambda x: x.cast("double")),
            F.transform(w, lambda x: x.cast("double")),
            lambda x, y: (x - y) * (x - y),
        )
        d2 = F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)
        structs.append(
            F.struct(
                F.round(d2, 6).alias("d2"),
                F.lit(r["cluster_id"]).cast(idt).alias("cluster_id"),
            )
        )
    return structs


def _nearest_seed(emb: DataFrame, payload: tuple[str, ...] = ()) -> DataFrame:
    """Nearest-seed assignment (vec_id, cluster_id, d2[, payload…]).

    r9 optimization (guide §2.4 "remove shuffles outright"): the seed set
    is k = max(8, √n/6) rows and fully deterministic, so it is collected
    once at plan-build time (an O(k) driver reduction, the same class as
    the repo's d×d Gram collects) and inlined as LITERAL arrays. The
    argmin then becomes a pure per-row expression — array_min over the k
    (d2, cluster_id) structs — and the former crossJoin row expansion,
    the n×k-row sort, and the per-vector rank window (one exchange per
    execution of the diamond) all disappear; payload columns are simply
    the corpus row's own columns, so consumers never re-join the corpus.

    Value-identity: each d2 is the SAME sequential zip_with/aggregate
    fold over the same doubles (float32→double is exact, literal doubles
    round-trip exactly through the driver), rounded to 6dp BEFORE the
    argmin; array_min's struct ordering is lexicographic on
    (d2, cluster_id) — exactly the former window's ORDER BY d2,
    cluster_id — and (d2, cluster_id) is unique per row, so the tie-cut
    is identical.

    Past _SEED_LITERAL_MAX seeds the broadcast-join + min(struct) form
    takes over (plan size stays O(1) in k)."""
    structs = _seed_d2_structs(emb)
    if structs is not None:
        best = F.array_min(F.array(*structs))
        return emb.select(
            "vec_id",
            best["cluster_id"].alias("cluster_id"),
            best["d2"].alias("d2"),
            *payload,
        )
    seeds = _md5_seeds(emb)
    diffs = F.zip_with(
        F.transform(F.col("embedding"), lambda x: x.cast("double")),
        F.transform(F.col("ce"), lambda x: x.cast("double")),
        lambda x, y: (x - y) * (x - y),
    )
    d2 = F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)
    scored = emb.crossJoin(F.broadcast(seeds)).select(
        "vec_id", F.round(d2, 6).alias("d2"), "cluster_id", *payload
    )
    best = scored.groupBy("vec_id").agg(
        F.min(F.struct("d2", "cluster_id", *payload)).alias("b")
    )
    return best.select(
        "vec_id",
        F.col("b.cluster_id").alias("cluster_id"),
        F.col("b.d2").alias("d2"),
        *[F.col(f"b.{c}").alias(c) for c in payload],
    )


_pair_fanout = pair_fanout


_COS_SQL = (
    f"{EMB_DOT_SQL} / sqrt(({EMB_NORM_SQL.format(t='a')}) * ({EMB_NORM_SQL.format(t='b')}))"
)

BRUTE_ORACLE = f"""
WITH scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
         {_COS_SQL} AS cos,
         row_number() OVER (
           PARTITION BY a.vec_id ORDER BY {_COS_SQL} DESC, b.vec_id
         ) AS rk
  FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
  WHERE a.{_QUERY_PRED}
)
SELECT query_id, cand_id, CAST(rk AS INT) AS rk, round(cos, 3) AS cosine
FROM scored WHERE rk <= 5
"""


def _cosine(e1: str, e2: str):
    return dot_expr(e1, e2) / F.sqrt(sq_norm_expr(e1) * sq_norm_expr(e2))


def _cos_pre():
    """Cosine over pre-joined frames carrying precomputed squared norms
    n1/n2 (one 64-element fold per PAIR instead of three; bit-identical
    to _cosine because the same fold values meet inside the same
    sqrt(n1*n2))."""
    return dot_expr("e1", "e2") / F.sqrt(F.col("n1") * F.col("n2"))


def _with_sqn(df: DataFrame, emb_col: str, out: str) -> DataFrame:
    """Squared L2 norm computed once per VECTOR, before a pair join."""
    return df.withColumn(out, sq_norm_expr(emb_col))


@query("ann_bruteforce_topk", BRUTE_ORACLE)
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact k-NN (k=5, cosine): broadcast queries × full corpus scan +
    per-query top-k window. The baseline every ANN variant is measured
    against. Rank tiebreaks on cand_id for cross-engine determinism."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = _with_sqn(
        emb.filter(F.expr(_QUERY_PRED)).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("e1")
        ),
        "e1",
        "n1",
    )
    c = _with_sqn(
        emb.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("e2")),
        "e2",
        "n2",
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id", _cos_pre().alias("cos"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("query_id", "cand_id", "rk", F.round("cos", 3).alias("cosine"))
    )


IVF_ORACLE = f"""
WITH scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
         {_COS_SQL} AS cos,
         row_number() OVER (
           PARTITION BY a.vec_id ORDER BY {_COS_SQL} DESC, b.vec_id
         ) AS rk
  FROM embeddings a JOIN embeddings b
    ON b.label = a.label AND b.vec_id <> a.vec_id
  WHERE a.{_QUERY_PRED}
)
SELECT query_id, cand_id, CAST(rk AS INT) AS rk, round(cos, 3) AS cosine
FROM scored WHERE rk <= 3
"""


@query("ann_ivf_topk", IVF_ORACLE)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: probe only the query's coarse cell (label column =
    cell assignment from a k-means quantizer). Candidate count drops by
    the cell count; at scale the corpus is partitioned/bucketed by cell so
    a probe reads one partition — this is the 100 TB layout (nprobe > 1 =
    union over the nearest cells)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = _with_sqn(
        emb.filter(F.expr(_QUERY_PRED)).select(
            F.col("vec_id").alias("query_id"), F.col("label").alias("ql"), F.col("embedding").alias("e1")
        ),
        "e1",
        "n1",
    )
    c = _with_sqn(
        emb.select(
            F.col("vec_id").alias("cand_id"), F.col("label").alias("cl"), F.col("embedding").alias("e2")
        ),
        "e2",
        "n2",
    )
    scored = (
        F.broadcast(q)
        .join(c, (F.col("cl") == F.col("ql")) & (F.col("cand_id") != F.col("query_id")))
        .select("query_id", "cand_id", _cos_pre().alias("cos"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("query_id", "cand_id", "rk", F.round("cos", 3).alias("cosine"))
    )


# ---------------------------------------------------------------------------
# Hyperplane LSH: deterministic pseudo-random planes from md5 so the SQL
# oracle regenerates the same family. plane[p][d] ∈ [-1, 1).
# ---------------------------------------------------------------------------

FILTERED_ORACLE = f"""
WITH scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS cand_id, d.lang AS cand_lang,
         {_COS_SQL} AS cos,
         row_number() OVER (
           PARTITION BY a.vec_id ORDER BY {_COS_SQL} DESC, b.vec_id
         ) AS rk
  FROM embeddings a
  JOIN embeddings b ON b.vec_id <> a.vec_id
  JOIN documents d ON d.doc_id = b.vec_id
  WHERE a.{_QUERY_PRED} AND d.lang = 'en'
)
SELECT query_id, cand_id, cand_lang, CAST(rk AS INT) AS rk, round(cos, 3) AS cosine
FROM scored WHERE rk <= 5
"""


@query("ann_filtered_topk", FILTERED_ORACLE)
def ann_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered vector search (the RAG retrieval shape): top-k cosine among
    candidates whose joined document satisfies a metadata predicate
    (lang = 'en'). Pre-filtering — the predicate joins and prunes BEFORE
    scoring, so selective filters shrink the scan instead of discarding
    scored results (post-filtering loses recall at fixed k)."""
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    q = _with_sqn(
        emb.filter(F.expr(_QUERY_PRED)).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("e1")
        ),
        "e1",
        "n1",
    )
    c = _with_sqn(
        emb.join(docs, emb.vec_id == docs.doc_id).select(
            F.col("vec_id").alias("cand_id"),
            F.col("lang").alias("cand_lang"),
            F.col("embedding").alias("e2"),
        ),
        "e2",
        "n2",
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id", "cand_lang", _cos_pre().alias("cos"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("query_id", "cand_id", "cand_lang", "rk", F.round("cos", 3).alias("cosine"))
    )


N_PLANES = 8
DIM = 64

# plane weight for (plane p, 1-based dim d) — regenerable in any engine
_PD_EXPR = "CAST(p AS VARCHAR) || ':' || CAST(d AS VARCHAR)"
_PLANE_W_SQL = f"(({md5_long_sql(_PD_EXPR)} % 2001) - 1000) / 1000.0"

LSH_ORACLE = f"""
WITH planes AS (
  SELECT p, list_transform(range(1, {DIM + 1}), d -> {_PLANE_W_SQL}) AS w
  FROM (SELECT unnest(range(0, {N_PLANES})) AS p)
),
proj AS (
  -- sequential list fold, same accumulation order as Spark's aggregate()
  SELECT e.vec_id, CAST(pl.p AS INT) AS p,
         list_sum(list_transform(range(1, {DIM + 1}),
                  i -> pl.w[i] * CAST(e.embedding[i] AS DOUBLE))) AS dot
  FROM embeddings e JOIN planes pl ON true
),
buckets AS (
  SELECT vec_id, CAST(sum(CASE WHEN dot > 0 THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
  FROM proj GROUP BY vec_id
),
scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
         {_COS_SQL} AS cos,
         row_number() OVER (
           PARTITION BY a.vec_id ORDER BY {_COS_SQL} DESC, b.vec_id
         ) AS rk
  FROM embeddings a
  JOIN buckets qa ON qa.vec_id = a.vec_id
  JOIN buckets cb ON cb.bucket = qa.bucket AND cb.vec_id <> a.vec_id
  JOIN embeddings b ON b.vec_id = cb.vec_id
  WHERE a.{_QUERY_PRED}
)
SELECT query_id, cand_id, CAST(rk AS INT) AS rk, round(cos, 3) AS cosine
FROM scored WHERE rk <= 3
"""


def _plane_weight(p: int, d: int) -> float:
    """Plane weight for (plane p, 1-based dim d): the same md5-derived
    value the SQL oracle regenerates ((md5_long("p:d") % 2001 - 1000) /
    1000.0), computed at plan time. hashlib.md5 over the UTF-8 string is
    bit-identical to Spark's md5(); the % / - / ÷1000.0 arithmetic is
    exact-integer then one IEEE divide, so the double is identical too."""
    import hashlib

    h = int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:15], 16)
    return ((h % 2001) - 1000) / 1000.0


def _plane_dot(p: int):
    """dot(plane_p, embedding) with the plane inlined as a LITERAL array —
    the same sequential zip_with/aggregate fold (and the same operand
    order: plane first) as the former dot_expr('w', 'embedding') over the
    generated-at-runtime plane table, so values are bit-identical. Making
    the planes literals turns bucket assignment from [corpus ⋈ planes →
    n×8-row groupBy shuffle] into a pure per-row projection: zero joins,
    zero exchanges (guide §2.4)."""
    w = F.array(*[F.lit(_plane_weight(p, d)) for d in range(1, DIM + 1)])
    prods = F.zip_with(
        F.transform(w, lambda x: x.cast("double")),
        F.transform(F.col("embedding"), lambda x: x.cast("double")),
        lambda x, y: x * y,
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _bucket_from_dots(dcols: list) -> "F.Column":
    """Pack the 8 projection signs into the BIGINT bucket id. Row-wise
    integer adds of the same when()-guarded 1<<p terms the former
    groupBy/sum accumulated — identical values."""
    b = F.lit(0)
    for p, d in enumerate(dcols):
        b = b + F.when(d > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return b.cast("bigint")


@query("ann_lsh_hyperplane", LSH_ORACLE)
def ann_lsh_hyperplane(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH: 8 md5-seeded planes → 8-bit sign bucket;
    candidates share the query's bucket; exact cosine re-rank inside.

    Scale: bucketing is a projection (8 dots/vector, one pass); the
    candidate join is an equi-join on bucket — at 100 TB you'd bucket-
    partition the corpus table so probes prune to one partition, and use
    multi-probe (flip low-margin bits) to recover recall (see
    ann_lsh_multiprobe).

    r9 optimization (guide §2.4): the 8 planes are md5-derived constants,
    so they are inlined as literal arrays and the bucket id becomes a
    per-row expression — the planes⋈corpus join, the n×8 projection
    explode, and the groupBy(vec_id) bucket shuffle are all gone (was:
    2 extra exchanges + 2 joins per side). Values bit-identical (same
    fold, same operand order; see _plane_weight/_plane_dot)."""
    emb = load_table(spark, sf_dir, "embeddings")
    dots = [_plane_dot(p) for p in range(N_PLANES)]
    bucket = _bucket_from_dots(dots)
    q = _with_sqn(
        emb.filter(F.expr(_QUERY_PRED)).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("e1"),
            bucket.alias("bucket"),
        ),
        "e1",
        "n1",
    )
    c = _with_sqn(
        emb.select(
            F.col("vec_id").alias("cand_id"),
            F.col("embedding").alias("e2"),
            bucket.alias("cbucket"),
        ),
        "e2",
        "n2",
    )
    scored = (
        F.broadcast(q)
        .join(c, (F.col("cbucket") == F.col("bucket")) & (F.col("cand_id") != F.col("query_id")))
        .select("query_id", "cand_id", _cos_pre().alias("cos"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("query_id", "cand_id", "rk", F.round("cos", 3).alias("cosine"))
    )


MULTIPROBE_ORACLE = f"""
WITH planes AS (
  SELECT p, list_transform(range(1, {DIM + 1}), d -> {_PLANE_W_SQL}) AS w
  FROM (SELECT unnest(range(0, {N_PLANES})) AS p)
),
proj AS (
  SELECT e.vec_id, CAST(pl.p AS INT) AS p,
         list_sum(list_transform(range(1, {DIM + 1}),
                  i -> pl.w[i] * CAST(e.embedding[i] AS DOUBLE))) AS dot
  FROM embeddings e JOIN planes pl ON true
),
buckets AS (
  SELECT vec_id, CAST(sum(CASE WHEN dot > 0 THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
  FROM proj GROUP BY vec_id
),
flips AS (
  SELECT vec_id, p FROM (
    SELECT vec_id, p,
           row_number() OVER (PARTITION BY vec_id ORDER BY abs(dot), p) AS mrk
    FROM proj WHERE {_QUERY_PRED}
  ) WHERE mrk <= 2
),
probes AS (
  SELECT vec_id, bucket AS probe FROM buckets WHERE {_QUERY_PRED}
  UNION ALL
  SELECT f.vec_id, xor(b.bucket, CAST(1 << f.p AS BIGINT)) AS probe
  FROM flips f JOIN buckets b ON b.vec_id = f.vec_id
),
scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
         {_COS_SQL} AS cos,
         row_number() OVER (
           PARTITION BY a.vec_id ORDER BY {_COS_SQL} DESC, b.vec_id
         ) AS rk
  FROM embeddings a
  JOIN probes pr ON pr.vec_id = a.vec_id
  JOIN buckets cb ON cb.bucket = pr.probe AND cb.vec_id <> a.vec_id
  JOIN embeddings b ON b.vec_id = cb.vec_id
)
SELECT query_id, cand_id, CAST(rk AS INT) AS rk, round(cos, 3) AS cosine
FROM scored WHERE rk <= 3
"""


@query("ann_lsh_multiprobe", MULTIPROBE_ORACLE)
def ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH (Lv et al., VLDB'07 idea): besides the query's own
    sign bucket, probe the two buckets reached by flipping the query's
    lowest-|margin| plane bits — the planes the vector sits closest to,
    hence the likeliest sign errors. 3 probes/query ≈ the recall of 8×
    more hash tables at 1/8 the index size.

    Scale: the probe list is 3 rows per query (tiny, broadcast); the
    candidate fetch stays an equi-join on bucket, so a bucket-partitioned
    corpus at 100 TB still prunes to exactly 3 partitions per query. The
    flip selection reuses the same (vec_id, p, dot) projection that built
    the buckets.

    The query side derives bucket AND flip planes in ONE aggregation:
    per query vec, the same groupBy that packs the sign bits also
    collects the (|dot|, p) pairs, sorts the 8-element array, and the
    probe list explodes from [bucket, bucket^lowest, bucket^2nd-lowest]
    — no window, no union, no self-join (was: a rank window + unionAll +
    a flips⋈buckets join; 11 exchanges → 7, sf0.1 best-of-3 1.29s →
    1.0s). In production the
    full-corpus bucket assignment is the LSH *index* — materialized once
    as a bucket-partitioned table and reused across query batches (the
    real 100 TB answer; per-query cache is the wrong layer).

    r9 optimization (guide §2.4): with the md5-derived planes inlined as
    literals (see _plane_dot), bucket AND the two flip planes are pure
    per-row expressions — the planes join, the n×8 projection rows, the
    full-corpus groupBy(vec_id) bucket shuffle, the query-side groupBy,
    and both index-attach joins are gone. The 8-element (|dot|, p)
    array_sort replaces array_sort(collect_list(...)) over the same 8
    structs — identical contents, identical ordering."""
    emb = load_table(spark, sf_dir, "embeddings")
    dots = [_plane_dot(p) for p in range(N_PLANES)]
    bucket = _bucket_from_dots(dots)
    near = F.array_sort(
        F.array(
            *[
                F.struct(F.abs(d).alias("a"), F.lit(p).cast("int").alias("p"))
                for p, d in enumerate(dots)
            ]
        )
    )
    qrow = emb.filter(F.expr(_QUERY_PRED)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("e1"),
        bucket.alias("bucket"),
        near.alias("near"),
    )
    q = _with_sqn(
        qrow.select(
            "query_id",
            "e1",
            F.explode(
                F.array(
                    F.col("bucket"),
                    F.expr("bucket ^ CAST(shiftleft(1, near[0].p) AS BIGINT)"),
                    F.expr("bucket ^ CAST(shiftleft(1, near[1].p) AS BIGINT)"),
                )
            ).alias("probe"),
        ),
        "e1",
        "n1",
    )
    c = _with_sqn(
        emb.select(
            F.col("vec_id").alias("cand_id"),
            F.col("embedding").alias("e2"),
            bucket.alias("cbucket"),
        ),
        "e2",
        "n2",
    )
    scored = (
        F.broadcast(q)
        .join(c, (F.col("cbucket") == F.col("probe")) & (F.col("cand_id") != F.col("query_id")))
        .select("query_id", "cand_id", _cos_pre().alias("cos"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("query_id", "cand_id", "rk", F.round("cos", 3).alias("cosine"))
    )


# ---------------------------------------------------------------------------
# K-means assignment (one Lloyd iteration) — the quantizer that produces
# IVF cells in the first place.
# ---------------------------------------------------------------------------

_D2_SQL = (
    "list_sum(list_transform(range(1, 65), i -> "
    "(CAST(e.embedding[i] AS DOUBLE) - CAST(s.ce[i] AS DOUBLE)) * "
    "(CAST(e.embedding[i] AS DOUBLE) - CAST(s.ce[i] AS DOUBLE))))"
)

KMEANS_ORACLE = f"""
WITH seeds AS (
  SELECT vec_id AS cluster_id, embedding AS ce
  FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT greatest(8, CAST(ceil(sqrt(CAST((SELECT count(*) FROM embeddings) AS DOUBLE)) / 6.0) AS BIGINT))
), scored AS (
  SELECT e.vec_id, s.cluster_id, round({_D2_SQL}, 6) AS d2
  FROM embeddings e CROSS JOIN seeds s
), best AS (
  SELECT vec_id, cluster_id, d2,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster_id) AS rk
  FROM scored
)
SELECT vec_id, cluster_id, d2,
       CAST(count(*) OVER (PARTITION BY cluster_id) AS INT) AS cluster_size
FROM best WHERE rk = 1
"""


@query("ann_kmeans_assign", KMEANS_ORACLE)
def ann_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd assignment step of k-means (k=8) over the corpus — the
    coarse quantizer that PRODUCES the IVF cell layout ann_ivf_topk
    probes. Seeds are the 8 vectors with the smallest md5(vec_id)
    (deterministic k-means|| stand-in); every vector is assigned to its
    nearest seed by squared L2, computed as the same sequential fold the
    oracle's list_sum uses so distances match bit-for-bit, then rounded
    before the argmin so a tie can't be cut differently by the engines.

    Scale shape: seeds are k rows → broadcast; the distance scan is a
    narrow map (k·dim flops per row, whole-stage codegen'd); the argmin
    is a map-side min(struct) aggregate (r9, _nearest_seed — was a
    per-vector window that shuffled all n×k scored rows). No shuffle
    touches the corpus except the k-wide expansion, which AQE coalesces.
    Iterating Lloyd means re-aggregating centroids per cluster (a
    partial-combinable groupBy) and re-broadcasting — each iteration is
    one scan."""
    emb = load_table(spark, sf_dir, "embeddings")
    best = _nearest_seed(emb)
    return best.select(
        "vec_id",
        "cluster_id",
        "d2",
        F.count(F.lit(1)).over(W.partitionBy("cluster_id")).cast("int").alias("cluster_size"),
    )


# ---------------------------------------------------------------------------
# K-means centroid UPDATE step (completes the Lloyd iteration).
# ---------------------------------------------------------------------------

KMEANS_UPDATE_ORACLE = f"""
WITH seeds AS (
  SELECT vec_id AS cluster_id, embedding AS ce
  FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT greatest(8, CAST(ceil(sqrt(CAST((SELECT count(*) FROM embeddings) AS DOUBLE)) / 6.0) AS BIGINT))
), scored AS (
  SELECT e.vec_id, s.cluster_id, round({_D2_SQL}, 6) AS d2
  FROM embeddings e CROSS JOIN seeds s
), best AS (
  SELECT vec_id, cluster_id,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster_id) AS rk
  FROM scored
), members AS (
  SELECT vec_id, cluster_id FROM best WHERE rk = 1
)
SELECT m.cluster_id, CAST(t.i AS INT) AS dim,
       CAST(count(*) AS BIGINT) AS n_members,
       round(CAST(sum(CAST(round(CAST(e.embedding[t.i] AS DOUBLE) * 1000000)
                           AS BIGINT)) AS BIGINT)
             / count(*) / 1000000.0, 6) AS centroid_val
FROM members m
JOIN embeddings e USING (vec_id)
CROSS JOIN range(1, 65) AS t(i)
GROUP BY m.cluster_id, t.i
"""


@query("ann_kmeans_update", KMEANS_UPDATE_ORACLE)
def ann_kmeans_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The centroid-update half of a Lloyd iteration (ann_kmeans_assign
    is the assignment half): new centroid = element-wise mean of each
    cluster's members, emitted long-form as (cluster_id, dim,
    centroid_val). Element values are scaled to exact µ-integers before
    summing so the per-(cluster, dim) mean is order-independent and
    oracle-exact — floats only reappear in the final single division.
    Shape: posexplode is a narrow 64× row expansion inside the scan
    stage; the one shuffle carries (k × dim) partial sums, independent of
    corpus size; assembling the dense centroid array for the next
    broadcast is a k-row collect. That is the whole scale story of
    distributed k-means: every iteration is one scan + one tiny
    shuffle.

    r9: the argmin is the map-side min(struct) aggregate of
    [[_nearest_seed]] with the embedding riding along as payload, so the
    members⋈embeddings re-join this query used to recover the vectors is
    gone (one fewer shuffle of the corpus)."""
    emb = load_table(spark, sf_dir, "embeddings")
    members = _nearest_seed(emb, payload=("embedding",))
    dims = (
        members
        .select("cluster_id", F.posexplode("embedding").alias("pos", "v"))
        .select(
            "cluster_id",
            (F.col("pos") + 1).cast("int").alias("dim"),
            F.round(F.col("v").cast("double") * 1000000).cast("long").alias("v6"),
        )
    )
    return dims.groupBy("cluster_id", "dim").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.round(F.sum("v6") / F.count(F.lit(1)) / 1000000.0, 6).alias("centroid_val"),
    )


# ---------------------------------------------------------------------------
# Int8 symmetric quantization of the embedding column.
# ---------------------------------------------------------------------------

QUANTIZE_ORACLE = """
WITH scaled AS (
  SELECT vec_id,
         greatest(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))),
                  1e-12) AS maxabs,
         embedding
  FROM embeddings
)
SELECT vec_id, round(maxabs, 6) AS scale,
       array_to_string(
         list_transform(embedding,
                        x -> CAST(CAST(round(CAST(x AS DOUBLE) / maxabs * 127)
                                       AS BIGINT) AS VARCHAR)),
         ',') AS qvec
FROM scaled
"""


@query("q_embedding_quantize", QUANTIZE_ORACLE)
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of every embedding (q = round(x /
    maxabs × 127)) with the per-vector scale needed to dequantize — the
    4× memory/bandwidth reduction step before an ANN index is built or
    shipped. Purely per-row array math (no shuffle at all): at 100 TB
    this runs at scan speed and is the cheapest way to shrink the
    similarity-search working set. The max|x| guard keeps a zero vector
    from dividing by zero.

    The quantized vector is emitted as a ','-joined int string, not an
    array: the driver's pandas canonicalizer sort_values/factorizes
    every column and dies on unhashable lists (r3 red row). Every
    element is an exact integer, so the string form is lossless and
    hash-stable across both engines."""
    emb = load_table(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    maxabs = F.greatest(F.array_max(F.transform(dbl, F.abs)), F.lit(1e-12))
    q = emb.withColumn("maxabs", maxabs)
    return q.select(
        "vec_id",
        F.round("maxabs", 6).alias("scale"),
        F.array_join(
            F.transform(
                dbl,
                lambda x: F.round(x / F.col("maxabs") * 127)
                .cast("long")
                .cast("string"),
            ),
            ",",
        ).alias("qvec"),
    )


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup-style: k-means cells, prune high-cosine pairs).
# ---------------------------------------------------------------------------

_SEMDEDUP_TAU = 0.4

_MEMBERS_CTE = f"""
seeds AS (
  SELECT vec_id AS cluster_id, embedding AS ce
  FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT greatest(8, CAST(ceil(sqrt(CAST((SELECT count(*) FROM embeddings) AS DOUBLE)) / 6.0) AS BIGINT))
), scored AS (
  SELECT e.vec_id, s.cluster_id, round({_D2_SQL}, 6) AS d2
  FROM embeddings e CROSS JOIN seeds s
), best AS (
  SELECT vec_id, cluster_id,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster_id) AS rk
  FROM scored
), members AS (
  SELECT vec_id, cluster_id FROM best WHERE rk = 1
)"""

SEMDEDUP_ORACLE = f"""
WITH {_MEMBERS_CTE},
pairs AS (
  SELECT ma.cluster_id, a.vec_id AS v1, b.vec_id AS v2
  FROM members ma JOIN members mb
    ON ma.cluster_id = mb.cluster_id AND ma.vec_id < mb.vec_id
  JOIN embeddings a ON a.vec_id = ma.vec_id
  JOIN embeddings b ON b.vec_id = mb.vec_id
  WHERE {EMB_DOT_SQL}
        / sqrt(({EMB_NORM_SQL.format(t="a")}) * ({EMB_NORM_SQL.format(t="b")}))
        >= {_SEMDEDUP_TAU}
)
SELECT m.vec_id, m.cluster_id
FROM members m
WHERE m.vec_id NOT IN (SELECT v2 FROM pairs)
"""


@query("semdedup_survivors", SEMDEDUP_ORACLE)
def semdedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication: partition the corpus into
    k-means cells (the [[ann_kmeans_assign]] quantizer), compute cosines
    ONLY within a cell, and drop every vector that is ≥ τ-similar to a
    lower-id vector in its cell. The cells are what make semantic dedup
    tractable: the pair space is Σ|cell|² instead of n², and each cell's
    pairs stay in that cell's partition (one shuffle on cluster_id).
    Dominance is \"similar to ANY lower id\" (not the greedy
    keep-chain) so the result is order-free and set-semantic — the
    difference only matters for chains a~b~c where a̸~c, and makes the
    operator deterministic under any execution order. Cosines are the
    bit-identical sequential folds shared with dedup_embedding_cosine."""
    emb = load_table(spark, sf_dir, "embeddings")
    # r9 (guide §2.3/§2.4): the cell assignment is the map-side
    # min(struct) aggregate of _nearest_seed (was: a row_number window
    # shuffling all n×k scored rows), with the embedding riding along as
    # payload so NEITHER pair side re-joins the corpus (was: two
    # members⋈embeddings hash joins). members still feeds three
    # consumers lazily; with the window gone the recomputed subtree is
    # one broadcast-fold scan + map-side agg, which is cheaper than any
    # materialization barrier (the r6/r9 persist A/Bs both said wash).
    members = _nearest_seed(emb, payload=("embedding",))
    # squared norm once per vector, not per pair: cos = dot / sqrt(n1*n2)
    # is bit-identical to the inline per-pair form (same fold values),
    # but the in-cell pair scan drops from three 64-element folds to one.
    # _pair_fanout pins the pair join's exchanges (join key, explicit N):
    # AQE's byte-based coalescing otherwise fuses the whole n^2/k pair
    # scan into one task (see q_knn_graph).
    fan = _pair_fanout(spark)
    # r9: BOTH pair sides read one repartition of an IDENTICAL frame and
    # rename columns only ABOVE the exchange — the two exchange subtrees
    # are then bit-identical, so ReuseExchange materializes the
    # assignment+shuffle once instead of twice (was: per-side aliasing
    # below the exchange made the children differ and defeated reuse).
    m = members.select(
        "cluster_id", "vec_id", "embedding", sq_norm_expr("embedding").alias("sqn")
    ).repartition(fan, "cluster_id")
    a = m.select(
        "cluster_id",
        F.col("vec_id").alias("v1"),
        F.col("embedding").alias("e1"),
        F.col("sqn").alias("n1"),
    )
    b = m.select(
        F.col("cluster_id").alias("c2"),
        F.col("vec_id").alias("v2"),
        F.col("embedding").alias("e2"),
        F.col("sqn").alias("n2"),
    )
    cos = dot_expr("e1", "e2") / F.sqrt(F.col("n1") * F.col("n2"))
    # no distinct on the removed side: left_anti is set-semantic under
    # duplicate keys, and the distinct's exchange+agg was pure overhead
    removed = (
        a.join(b, (F.col("cluster_id") == F.col("c2")) & (F.col("v1") < F.col("v2")))
        .filter(cos >= _SEMDEDUP_TAU)
        .select(F.col("v2").alias("vec_id"))
    )
    return members.select("vec_id", "cluster_id").join(
        removed, "vec_id", "left_anti"
    )


# ---------------------------------------------------------------------------
# Product quantization: encode + asymmetric-distance (ADC) search.
# ---------------------------------------------------------------------------

_PQ_M = 32         # subspaces (64-d -> 32 x 2-d)
_PQ_SUB = 64 // _PQ_M
_PQ_K = 32         # centroids per subspace
_PQ_TOPK = 10

_PQ_D2_SQL = (
    f"list_sum(list_transform(range(1, {_PQ_SUB + 1}), i -> "
    f"(CAST({{a}}.embedding[CAST(s.j * {_PQ_SUB} + i AS INT)] AS DOUBLE)"
    f" - CAST(m.ce[CAST(s.j * {_PQ_SUB} + i AS INT)] AS DOUBLE)) * "
    f"(CAST({{a}}.embedding[CAST(s.j * {_PQ_SUB} + i AS INT)] AS DOUBLE)"
    f" - CAST(m.ce[CAST(s.j * {_PQ_SUB} + i AS INT)] AS DOUBLE))))"
)

_PQ_CENT_AVG_SQL = ", ".join(
    f"round(avg(CAST(e.embedding[CAST(c.j * {_PQ_SUB} + {i} AS INT)] AS DOUBLE)), 6)"
    for i in range(1, _PQ_SUB + 1)
)

# squared L2 between subvector j of {a}.embedding and a refined
# _PQ_SUB-d centroid m.ce8 (1-indexed double list)
_PQ_D2C_SQL = (
    f"list_sum(list_transform(range(1, {_PQ_SUB + 1}), i -> "
    f"(CAST({{a}}.embedding[CAST(m.j * {_PQ_SUB} + i AS INT)] AS DOUBLE)"
    f" - m.ce8[CAST(i AS INT)]) * "
    f"(CAST({{a}}.embedding[CAST(m.j * {_PQ_SUB} + i AS INT)] AS DOUBLE)"
    f" - m.ce8[CAST(i AS INT)])))"
)

PQ_ORACLE = f"""
WITH seeds AS (
  SELECT vec_id AS cid, embedding AS ce
  FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {_PQ_K}
), sub AS (SELECT unnest(range(0, {_PQ_M})) AS j),
enc0 AS (
  SELECT e.vec_id, s.j, m.cid,
         round({_PQ_D2_SQL.format(a="e")}, 6) AS d2
  FROM embeddings e CROSS JOIN sub s CROSS JOIN seeds m
), codes0 AS (
  SELECT vec_id, j, cid AS code,
         row_number() OVER (PARTITION BY vec_id, j ORDER BY d2, cid) AS rk
  FROM enc0 QUALIFY rk = 1
), cent AS (
  SELECT c.j, c.code AS cid, [{_PQ_CENT_AVG_SQL}] AS ce8
  FROM codes0 c JOIN embeddings e USING (vec_id)
  GROUP BY c.j, c.code
), enc AS (
  SELECT e.vec_id, m.j, m.cid,
         round({_PQ_D2C_SQL.format(a="e")}, 6) AS d2
  FROM embeddings e CROSS JOIN cent m
), codes AS (
  SELECT vec_id, j, cid AS code,
         row_number() OVER (PARTITION BY vec_id, j ORDER BY d2, cid) AS rk
  FROM enc QUALIFY rk = 1
), qd AS (
  SELECT q.vec_id AS query_id, m.j, m.cid,
         CAST(round({_PQ_D2C_SQL.format(a="q")} * 1000000) AS BIGINT) AS qd6
  FROM embeddings q CROSS JOIN cent m
  WHERE q.{_QUERY_PRED}
), adc AS (
  SELECT qd.query_id, c.vec_id AS cand_id, CAST(sum(qd.qd6) AS BIGINT) AS adc6
  FROM codes c JOIN qd ON qd.j = c.j AND qd.cid = c.code
  WHERE c.vec_id <> qd.query_id
  GROUP BY qd.query_id, c.vec_id
)
SELECT query_id, cand_id,
       CAST(row_number() OVER (
         PARTITION BY query_id ORDER BY adc6, cand_id) AS INT) AS rk,
       round(adc6 / 1000000.0, 6) AS adc_d2
FROM adc QUALIFY rk <= {_PQ_TOPK}
"""


def _pq_sub_elem(j, i: int) -> "F.Column":
    """Double coord i of subspace j (j may be a lambda-variable Column).
    element_at is 1-based, so j*_PQ_SUB+i+1 equals element i of the
    former slice(arr, j*_PQ_SUB+1, _PQ_SUB); casting the float AFTER
    extraction equals the former transform-then-slice cast."""
    return F.element_at(
        F.col("embedding"), (j * _PQ_SUB + i + 1).cast("int")
    ).cast("double")


def _pq_fold_d2(j, base) -> "F.Column":
    """Squared L2 between subspace j of `embedding` and the _PQ_SUB
    literal-array coords starting at 0-based offset `base` — bit-identical
    to the former zip_with/aggregate fold ((0.0 + sq₀) + sq₁ + …):
    0.0 + x == x for every square (squares are never -0.0), and the
    left-to-right additions below are the same accumulation order.
    `base` points into a flat literal centroid array column."""

    def at(arr, k):
        return F.element_at(arr, (k + 1).cast("int"))

    def build(arr):
        d2 = None
        for i in range(_PQ_SUB):
            sq_e = _pq_sub_elem(j, i) - at(arr, base + i)
            sq = sq_e * sq_e
            d2 = sq if d2 is None else d2 + sq
        return d2

    return build


def _pq_argmin(j, d2_of, present_of=None) -> "F.Column":
    """Index (0-based) of the argmin candidate for subspace j: a strict
    '<' left fold over candidates in ASCENDING cidx order. Candidate
    order is ascending cid (the literal arrays are sorted by cid), so
    first-wins-on-tie == the former min_by(cid, struct(d2, cid)) /
    ORDER BY d2, cid tie cut. `present_of(c)` masks codebook slots that
    won no initial argmin (the sparse-cent rule: argmin semantics must
    not see phantom centroids)."""

    def step(acc, c):
        better = d2_of(c) < acc["d2"]
        if present_of is not None:
            better = present_of(c) & better
        return F.when(
            better,
            F.struct(d2_of(c).alias("d2"), c.cast("int").alias("ci")),
        ).otherwise(acc)

    return F.aggregate(
        F.sequence(F.lit(0), F.lit(_PQ_K - 1)),
        F.struct(F.lit(float("inf")).alias("d2"), F.lit(-1).alias("ci")),
        step,
    )["ci"]


def _pq_codebook(emb: DataFrame) -> tuple:
    """The PQ codebook, collected at plan-build time (r10, guide §2.4 —
    the same bounded-driver-reduction pattern as _seed_d2_structs and the
    LSH literal planes; both collects are O(_PQ_K) / O(_PQ_M·_PQ_K) rows
    regardless of corpus size, so the pattern holds at 100 TB).

    Job 1 (TakeOrdered, _PQ_K = 32 rows): the md5-ordered seed draw.
    Job 2 (one corpus scan + a ≤ M·K-group aggregate): the Lloyd step —
    every vector's per-subspace argmin against the LITERAL seed array is
    a pure row expression (no n×M×K encode frame, no n×M argmin
    shuffle, no codes⋈emb join; the former plan's three widest encode
    structures), the member means per (subspace, code) partial-aggregate
    map-side to ≤ M·K rows per task, and the group COUNTs ride along so
    the corpus size needs no separate emb.count() job (every vector
    contributes exactly one code to subspace 0, so n = Σ cnt at j == 0).
    The seed/centroid data rides as FLAT array literals (single Literal
    nodes) folded with higher-order functions, keeping the expression
    tree O(1) — the per-(j,seed) inline expansion was a 12.8 MiB task
    binary that also broke whole-stage codegen.

    Value identity: d2 is the same (0.0+sq₀)+sq₁ fold over the same
    doubles rounded to 6dp before the argmin; the argmin is a strict-<
    ascending-cid fold == min_by(cid, struct(d2, cid)); the means are
    the same Spark avg(double) the former lazy tree computed, rounded to
    6dp exactly as before.

    Returns (sorted_cids, cent, n): cent maps (j, cid) → refined
    centroid coords; (j, cid) slots that won no argmin are absent,
    exactly like the former sparse `cent` frame."""
    seed_rows = (
        emb.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(_PQ_K)
        .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"))
        .collect()
    )
    seeds = sorted(
        ((r["cid"], [float(v) for v in r["ce"]]) for r in seed_rows),
        key=lambda t: t[0],
    )
    sorted_cids = [cid for cid, _ in seeds]
    # flat K×64 literal: seed c's dim d at offset c*64 + d
    sflat = F.lit([v for _, ce in seeds for v in ce])

    def seed_d2(j):
        return lambda c: F.round(
            _pq_fold_d2(j, c * (_PQ_SUB * _PQ_M) + j * _PQ_SUB)(sflat), 6
        )

    g = emb.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(_PQ_M - 1)),
                lambda j: F.struct(
                    j.cast("int").alias("j"),
                    _pq_argmin(j, seed_d2(j)).alias("ci"),
                    *[
                        _pq_sub_elem(j, i).alias(f"s{i}")
                        for i in range(_PQ_SUB)
                    ],
                ),
            )
        ).alias("g")
    )
    cent_rows = (
        g.groupBy(F.col("g.j").alias("j"), F.col("g.ci").alias("ci"))
        .agg(
            *[
                F.round(F.avg(f"g.s{i}"), 6).alias(f"c{i}")
                for i in range(_PQ_SUB)
            ],
            F.count(F.lit(1)).alias("cnt"),
        )
        .collect()
    )
    cent = {
        (r["j"], sorted_cids[r["ci"]]): tuple(
            float(r[f"c{i}"]) for i in range(_PQ_SUB)
        )
        for r in cent_rows
    }
    n = sum(r["cnt"] for r in cent_rows if r["j"] == 0)
    return sorted_cids, cent, n


@query("ann_pq_adc", PQ_ORACLE)
def ann_pq_adc(
    spark: SparkSession, sf_dir: str, _topk_mode: str | None = None
) -> DataFrame:
    """Product-quantization ANN (Jegou et al., "Product Quantization for
    Nearest Neighbor Search"): split each 64-d vector into {_PQ_M}
    8-d subvectors, encode each against a {_PQ_K}-entry per-subspace
    codebook (argmin squared-L2, seeds chosen by the same deterministic
    md5 rule as [[ann_kmeans_assign]]), then answer queries by
    ASYMMETRIC distance — the query stays un-quantized, each candidate
    costs {_PQ_M} table lookups into the query's precomputed
    query->centroid distance table instead of 64 multiplies. Top-{_PQ_TOPK}
    per query by reconstructed distance.

    The codebook gets ONE Lloyd refinement (the train step of k-means
    PQ): assign every subvector to its nearest sampled seed, replace each
    (subspace, code) centroid with the member mean, then re-encode
    against the refined codebook. One step roughly halves quantization
    error vs raw sampled codewords and more than doubles top-10 recall
    on the smoke corpus (0.16 -> ~0.5); further steps are the same
    shuffle shape repeated.

    Exactness: per-subspace encode distances round to 1e-6 before the
    argmin (ties cut by centroid id); refined centroid means round to
    1e-6 before reuse; ADC contributions are µ-unit integers summed
    exactly, so both engines rank identically.

    Scale shape: this is the memory story of billion-scale ANN - codes
    are {_PQ_M} bytes per vector (vs 256 bytes raw), so the candidate
    scan reads 30x less. r10 (guide §2.4, VERDICT r9 item 1): the
    codebook is bounded (_PQ_M x _PQ_K = 1024 2-d centroids, constant in
    corpus size), so it is trained at plan-build time — the per-subspace
    argmin against the LITERAL seeds is a pure row expression, the Lloyd
    member means reduce map-side to <= 1024 partial rows, and the 1024
    refined centroids fold back to the driver and are re-inlined as
    literals (see _pq_codebook; the same §2.4 pattern as the k-means
    _seed_d2_structs and the LSH literal planes). Encoding and the query
    distance table are then pure per-row projections: the former
    n*{_PQ_M}*{_PQ_K}-row encode frames, BOTH n*{_PQ_M}-row argmin
    shuffles, the codes⋈emb Lloyd join, the codes_arr/qtab pivot
    shuffles, and the separate emb.count() job are all gone — the timed
    plan is one codebook-train scan plus one encode scan feeding the
    broadcast ADC join. In production the codes are materialized once
    and reused per query batch; IVF cells ([[ann_ivf_topk]]) would prune
    the scan on top (IVF-PQ/FAISS)."""
    emb = load_table(spark, sf_dir, "embeddings")
    sorted_cids, cent, n = _pq_codebook(emb)
    # flat M*K literal codebook: slot (j, cidx) coords at (j*K + cidx)*SUB;
    # absent (sparse-cent) slots hold 0.0 fillers behind a False mask
    cflat_vals, pmask_vals = [], []
    for j in range(_PQ_M):
        for cid in sorted_cids:
            ce = cent.get((j, cid))
            pmask_vals.append(ce is not None)
            cflat_vals.extend(ce if ce is not None else (0.0,) * _PQ_SUB)
    cflat, pmask = F.lit(cflat_vals), F.lit(pmask_vals)

    def cent_d2(j):
        return lambda c: F.round(
            _pq_fold_d2(j, (j * _PQ_K + c) * _PQ_SUB)(cflat), 6
        )

    def present(j):
        return lambda c: F.element_at(pmask, (j * _PQ_K + c + 1).cast("int"))

    # re-encode against the refined LITERAL codebook: carr[j] = cidx of
    # the argmin code for subspace j. Only slots present in the sparse
    # `cent` compete (the former sparse-cent crossJoin rule), and the
    # ascending-cidx strict-< fold reproduces the min_by (d2, cid) tie
    # cut (cidx order IS cid order).
    carr = F.transform(
        F.sequence(F.lit(0), F.lit(_PQ_M - 1)),
        lambda j: _pq_argmin(j, cent_d2(j), present(j)),
    )
    codes_arr = emb.select("vec_id", carr.alias("carr"))

    # Query distance table, STRUCTURALLY DENSE over all M*K slots (r8,
    # ADVICE): qarr is indexed positionally as j*K + cidx, so slots
    # absent from the sparse codebook emit sentinel 0 — safe because an
    # absent slot can never be a candidate's code (codes are argmins
    # against `cent`), so sentinel slots are never read; they only keep
    # the array aligned. flatten(j-major, then cidx) == k = j*K + cidx.
    qarr = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.lit(_PQ_M - 1)),
            lambda j: F.transform(
                F.sequence(F.lit(0), F.lit(_PQ_K - 1)),
                lambda c: F.when(
                    present(j)(c),
                    F.round(
                        _pq_fold_d2(j, (j * _PQ_K + c) * _PQ_SUB)(cflat)
                        * 1000000
                    ).cast("long"),
                ).otherwise(F.lit(0).cast("long")),
            ),
        )
    )
    qtab = emb.filter(F.expr(_QUERY_PRED)).select(
        F.col("vec_id").alias("query_id"), qarr.alias("qarr")
    )
    mode = _topk_mode or _pq_topk_mode(n)
    if mode == "twopass":
        # twopass executes the lazy ADC tree TWICE (threshold pass +
        # filter pass). With the codebook frozen as literals both passes
        # fold identical integers by construction (the r9 float-parity
        # hazard is gone), so the checkpoints are now purely a SCAN
        # economy: codes_arr pins n rows of {_PQ_M}-byte code arrays —
        # 30x narrower than the corpus — so pass 2 re-reads those
        # instead of re-scanning and re-encoding the full corpus.
        codes_arr = codes_arr.localCheckpoint(eager=True)
        qtab = qtab.localCheckpoint(eager=True)
    adc = (
        codes_arr.join(F.broadcast(qtab), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            F.aggregate(
                F.zip_with(
                    F.col("carr"),
                    F.sequence(F.lit(0), F.lit(_PQ_M - 1)),
                    lambda c, j: F.element_at(
                        F.col("qarr"), (j * _PQ_K + c + 1).cast("int")
                    ),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("adc6"),
        )
    )
    return _pq_grouped_topk(adc, n, force=mode)


# Direct grouped top-k shuffles the whole q*n ADC frame; past this many
# pairs the two-pass sketch-threshold form engages instead (see
# _pq_grouped_topk). 1e9 pairs ≈ 24 GB of (query_id, cand_id, adc6)
# shuffle — comfortably inside a healthy executor fleet's shuffle
# capacity but the measured kill-point neighborhood for one local disk;
# both paths are exact, so the cut only moves cost, never the answer.
_PQ_DIRECT_MAX_PAIRS = 1_000_000_000


def _pq_topk_mode(n: int) -> str:
    """direct vs twopass by the pair-count bound (n vectors, n/100 queries)."""
    n_queries = max(1, n // 100)
    return "direct" if n_queries * n <= _PQ_DIRECT_MAX_PAIRS else "twopass"


def _pq_grouped_topk(adc: DataFrame, n: int, force: str | None = None):
    """Exact per-query top-{_PQ_TOPK} over the map-side ADC pair frame.

    Two plans, same rows (parity pinned by tests/test_pq_dense_qtab.py):

    - ``direct`` (pair count ≤ _PQ_DIRECT_MAX_PAIRS): row_number window
      on (query_id) — one shuffle of the narrow pair rows. Fastest while
      the shuffle fits: the r7 form, 205 s at ×64.
    - ``twopass`` (beyond the bound; r8, found by the ×256 sweep, where
      the direct window's 2.6B-row / 50+ GB shuffle exhausted local disk
      and killed the JVM mid-write): pass 1 aggregates a
      percentile_approx sketch per query (GK sketches are
      partial-aggregatable, so pair rows reduce MAP-SIDE and the shuffle
      carries one sketch per query); pass 2 re-derives the map-side
      frame (CPU ×2 on the fold — the broadcast join never
      materializes), keeps rows ≤ the sketched bound on the k-th
      distance, and runs the exact window over the ~q·(k+2·err+5)
      survivors. Exactness: with accuracy a the sketch's rank error is
      ≤ n/a, so the value at requested rank k+err+5 has TRUE rank
      ≥ k+5 — every true top-k row passes the ≤ filter and the final
      exact (adc6, cand_id) window emits identical rows.
    """
    mode = force or _pq_topk_mode(n)
    w = W.partitionBy("query_id").orderBy("adc6", "cand_id")
    frame = adc
    if mode == "twopass":
        acc = 50_000
        err = -(-n // acc)  # ceil(n/accuracy)
        frac = min(1.0, (_PQ_TOPK + err + 5.0) / max(1.0, float(n - 1)))
        thr = adc.groupBy("query_id").agg(
            F.percentile_approx("adc6", F.lit(frac), F.lit(acc)).alias("thr")
        )
        frame = adc.join(F.broadcast(thr), "query_id").filter(
            F.col("adc6") <= F.col("thr")
        )
    return (
        frame.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= _PQ_TOPK)
        .select(
            "query_id",
            "cand_id",
            "rk",
            F.round(F.col("adc6") / 1000000.0, 6).alias("adc_d2"),
        )
    )


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection: 64-d -> 16-d Rademacher.
# ---------------------------------------------------------------------------

_JL_IN = 64
_JL_OUT = 16


def _jl_sign(j: int, k: int) -> float:
    """Deterministic Rademacher entry ±1/sqrt(_JL_OUT), from md5 so both
    engines (and every run) see the same projection matrix."""
    import hashlib

    h = int(hashlib.md5(f"jl{j}_{k}".encode()).hexdigest()[:15], 16)
    return (1.0 if h % 2 == 0 else -1.0) * 0.25


def _jl_term_sql(k: int) -> str:
    terms = " + ".join(
        f"({_jl_sign(j, k)} * CAST(embedding[{j + 1}] AS DOUBLE))"
        for j in range(_JL_IN)
    )
    return f"CAST(CAST(round(({terms}) * 1000000) AS BIGINT) AS VARCHAR)"


JL_ORACLE = f"""
SELECT vec_id,
       array_to_string(
         [{", ".join(_jl_term_sql(k) for k in range(_JL_OUT))}], ',') AS jl_vec
FROM embeddings
"""


@query("q_jl_projection", JL_ORACLE)
def q_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction: project each 64-d
    embedding to 16-d with a deterministic Rademacher matrix (entries
    ±1/sqrt(16), signs from md5 of the cell index). JL guarantees pairwise
    distances survive within (1±ε) w.h.p., so downstream ANN
    ([[ann_bruteforce_topk]], [[ann_pq_adc]]) runs on vectors 4× smaller —
    the standard first move when the embedding column dominates scan cost.
    Distance preservation is asserted empirically in test_new_ops.py.

    Exactness: each output coordinate is a fixed left-to-right sum of 64
    literal-coefficient products — identical IEEE evaluation order in both
    engines — scaled to exact micro-int units (round(x·1e6)).

    The 16 coordinates are emitted as ONE ','-joined micro-int string
    rather than an array<double>: the driver's pandas canonicalizer
    cannot hash list cells (r3 red row), and integer micro-units make the
    string form bit-stable across engines where float formatting is not.

    Scale shape: a pure per-row projection inside whole-stage codegen; no
    shuffle, no UDF. The matrix is baked into the plan as literals (the
    16x64 coefficients), so executors need no broadcast at all. The
    ~5,000-node expression is built as ONE SQL string handed to a single
    F.expr call: composing it term-by-term through the Column DSL made
    ~3,000 Py4J round-trips and cost ~7s of driver time per build (the
    r5 sweep/bench flagged it); the SQL parse is one call and the
    resulting plan — and every output value — is identical."""
    emb = load_table(spark, sf_dir, "embeddings")

    def coord_sql(k: int) -> str:
        # 0.25D: double literal (plain 0.25 parses as DECIMAL in Spark SQL,
        # which would change the arithmetic). Left-to-right + keeps the
        # fixed IEEE summation order the oracle mirrors.
        terms = " + ".join(
            f"({_jl_sign(j, k)}D * CAST(element_at(embedding, {j + 1}) AS DOUBLE))"
            for j in range(_JL_IN)
        )
        return f"CAST(CAST(round(({terms}) * 1000000D) AS BIGINT) AS STRING)"

    jl = (
        "array_join(array("
        + ", ".join(coord_sql(k) for k in range(_JL_OUT))
        + "), ',')"
    )
    return emb.select("vec_id", F.expr(jl).alias("jl_vec"))


# ---------------------------------------------------------------------------
# Per-label centroid distance: noisy-label / outlier pruning.
# ---------------------------------------------------------------------------

CENTROID_OUTLIER_ORACLE = """
WITH dims AS (
  SELECT vec_id, label, CAST(t.i AS INT) AS dim,
         CAST(embedding[t.i] AS DOUBLE) AS v
  FROM embeddings CROSS JOIN range(1, 65) AS t(i)
),
cent AS (
  SELECT label, dim,
         round(CAST(sum(CAST(round(v * 1000000) AS BIGINT)) AS BIGINT)
               / count(*) / 1000000.0, 6) AS c
  FROM dims GROUP BY label, dim
),
terms AS (
  SELECT d.vec_id, d.label,
         CAST(round((d.v - c.c) * (d.v - c.c) * 1000000) AS BIGINT) AS t6
  FROM dims d JOIN cent c ON d.label = c.label AND d.dim = c.dim
),
d2 AS (
  SELECT vec_id, label, CAST(sum(t6) AS BIGINT) AS s6
  FROM terms GROUP BY vec_id, label
)
SELECT vec_id, label, round(s6 / 1000000.0, 6) AS d2_centroid,
       CAST(CASE WHEN percent_rank() OVER (
                        PARTITION BY label ORDER BY s6, vec_id
                      ) >= 0.9 THEN 1 ELSE 0 END AS INT) AS is_outlier
FROM d2
"""


@query("q_label_centroid_outliers", CENTROID_OUTLIER_ORACLE)
def q_label_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Noisy-label screening: squared L2 distance from every vector to
    its own label's centroid, flagging the farthest decile per label as
    suspect (mislabeled or out-of-distribution — the curation step that
    precedes training a classifier on weak labels; complements
    [[q_balanced_classes]], which fixes counts but not quality).

    Exactness: centroids use the [[ann_kmeans_update]] recipe (µ-integer
    dim sums, one division, one round); per-dim squared deviations are
    rounded to µ-integers and summed exactly, so the distance — and the
    decile cut, which orders by the integer sum — is engine-independent.

    Scale shape: the centroid pass explodes to (label, dim) but map-side
    combine collapses it to |labels|·64 rows before the shuffle; the
    scoring pass is a broadcast join + zip_with/aggregate fold inside the
    scan projection — the corpus never shuffles on vec_id (the old
    explode-join-reaggregate form paid two corpus-sized shuffles). The
    only corpus-sized shuffle left is the per-label decile window the
    semantics require."""
    emb = load_table(spark, sf_dir, "embeddings")
    arr = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    dimmed = emb.select("vec_id", "label", arr.alias("v"))
    # centroid pass: explode to (label, dim, v) — map-side combine collapses
    # it to |labels|x64 rows before the shuffle — then re-assemble each
    # label's centroid as a dim-ordered array
    cent = (
        dimmed.select("label", F.posexplode("v").alias("pos", "ev"))
        .groupBy("label", "pos")
        .agg(
            F.round(
                F.sum(F.round(F.col("ev") * 1000000).cast("long"))
                / F.count(F.lit(1))
                / 1000000.0,
                6,
            ).alias("c")
        )
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))),
                lambda s: s.getField("c"),
            ).alias("c")
        )
    )
    scored = dimmed.join(F.broadcast(cent), "label").select(
        "vec_id",
        "label",
        F.aggregate(
            F.zip_with(
                "v",
                "c",
                lambda v, c: F.round((v - c) * (v - c) * 1000000).cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("s6"),
    )
    w = W.partitionBy("label").orderBy("s6", "vec_id")
    return scored.select(
        "vec_id",
        "label",
        F.round(F.col("s6") / 1000000.0, 6).alias("d2_centroid"),
        (F.percent_rank().over(w) >= 0.9).cast("int").alias("is_outlier"),
    )


# ---------------------------------------------------------------------------
# MMR diversified re-ranking (the RAG retrieval step after ANN).
# ---------------------------------------------------------------------------

_MMR_K = 5        # results to select
_MMR_CAND = 20    # ANN candidate pool per query
# λ = 0.7: relevance weight; 0.3: redundancy penalty


def _mmr_oracle() -> str:
    """Unrolled-CTE oracle: each MMR step joins the candidate pool against
    the union of prior selections, exactly mirroring the Spark loop."""
    dot = EMB_DOT_SQL
    na = EMB_NORM_SQL.format(t="a")
    nb = EMB_NORM_SQL.format(t="b")
    head = f"""
WITH q AS (SELECT vec_id AS qid, embedding FROM embeddings WHERE vec_id % 100 = 0),
co AS (
  SELECT a.qid, b.vec_id AS cid, b.embedding,
         CAST(round(1000000 * {dot} / sqrt(({na}) * ({nb}))) AS BIGINT) AS s6
  FROM (SELECT qid, embedding FROM q) a
  JOIN embeddings b ON b.vec_id <> a.qid
),
cand AS (
  SELECT qid, cid, s6 FROM (
    SELECT qid, cid, s6,
           row_number() OVER (PARTITION BY qid ORDER BY s6 DESC, cid) AS rk
    FROM co
  ) WHERE rk <= {_MMR_CAND}
),
pair AS (
  SELECT x.qid, x.cid AS c1, y.cid AS c2,
         CAST(round(1000000 * {dot} / sqrt(({na}) * ({nb}))) AS BIGINT) AS p6
  FROM cand x JOIN embeddings a ON a.vec_id = x.cid
  JOIN cand y ON y.qid = x.qid AND y.cid <> x.cid
  JOIN embeddings b ON b.vec_id = y.cid
),
s1 AS (
  SELECT qid, cid, 7 * s6 AS score_i, 1 AS step FROM (
    SELECT qid, cid, s6,
           row_number() OVER (PARTITION BY qid ORDER BY s6 DESC, cid) AS rn
    FROM cand
  ) WHERE rn = 1
),
sel1 AS (SELECT qid, cid FROM s1)"""
    parts = [head]
    for k in range(2, _MMR_K + 1):
        p = k - 1
        parts.append(f""",
s{k} AS (
  SELECT qid, cid, score_i, {k} AS step FROM (
    SELECT c.qid, c.cid, 7 * c.s6 - 3 * mx.m AS score_i,
           row_number() OVER (
             PARTITION BY c.qid
             ORDER BY 7 * c.s6 - 3 * mx.m DESC, c.cid
           ) AS rn
    FROM cand c
    JOIN (SELECT p.qid, p.c1, max(p.p6) AS m
          FROM pair p JOIN sel{p} s ON s.qid = p.qid AND s.cid = p.c2
          GROUP BY p.qid, p.c1) mx
      ON mx.qid = c.qid AND mx.c1 = c.cid
    LEFT JOIN sel{p} e ON e.qid = c.qid AND e.cid = c.cid
    WHERE e.cid IS NULL
  ) WHERE rn = 1
),
sel{k} AS (SELECT qid, cid FROM sel{p} UNION ALL SELECT qid, cid FROM s{k})""")
    union = " UNION ALL ".join(f"SELECT * FROM s{k}" for k in range(1, _MMR_K + 1))
    parts.append(
        f"\nSELECT qid AS query_id, cid AS vec_id, score_i / 10000000.0 AS mmr_score, CAST(step AS INT) AS step\nFROM ({union})"
    )
    return "".join(parts)


@query("ann_mmr_rerank", _mmr_oracle())
def ann_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR (maximal marginal relevance) diversified re-ranking — the step
    a RAG retriever runs AFTER ann_bruteforce_topk/ann_ivf_topk hands it a
    candidate pool: greedily pick {_MMR_K} of {_MMR_CAND} candidates,
    each step maximizing λ·sim(query, c) − (1−λ)·max_{{s∈selected}}
    sim(c, s) with λ=0.7, so near-duplicate passages can't crowd the
    context window (Carbonell & Goldstein 1998).

    The greedy loop is data-dependent but BOUNDED (k steps), so it
    unrolls into the plan like [[graph_pagerank_copurchase]]'s iterations:
    each step is an anti-join (drop selected) + a broadcast-sized max-sim
    join + a per-query argmax window. All cosines are snapped to integer
    micro-units (round(1e6·cos) as bigint) before any comparison, the MMR
    score 7·s − 3·m stays in exact integer arithmetic, and ties break on
    vec_id — so selection is engine-exact with no float rounding ties.

    Scale shape: everything after the ANN scan operates on k·|queries|
    rows partitioned by query_id — the corpus is touched only by the
    candidate generation (delegated to the ANN operators). cand and pair
    are persisted: every unrolled step reuses them, and recomputing the
    candidate scan {_MMR_K}× is the one real cost at scale."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    dotq = F.zip_with(
        F.transform(F.col("qe"), lambda x: x.cast("double")),
        F.transform(F.col("embedding"), lambda x: x.cast("double")),
        lambda x, y: x * y,
    )
    simq = F.round(
        F.lit(1000000.0)
        * F.aggregate(dotq, F.lit(0.0), lambda acc, x: acc + x)
        / F.sqrt(sq_norm_expr("qe") * sq_norm_expr("embedding"))
    ).cast("bigint")
    co = (
        F.broadcast(q)
        .join(emb, F.col("vec_id") != F.col("qid"))
        .select("qid", F.col("vec_id").alias("cid"), "embedding", simq.alias("s6"))
    )
    wq = W.partitionBy("qid").orderBy(F.col("s6").desc(), "cid")
    cand = (
        co.withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= _MMR_CAND)
        .select("qid", "cid", "s6", "embedding")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    x = cand.select("qid", F.col("cid").alias("c1"), F.col("embedding").alias("e1"))
    y = cand.select(F.col("qid").alias("qid2"), F.col("cid").alias("c2"), F.col("embedding").alias("e2"))
    dotp = F.zip_with(
        F.transform(F.col("e1"), lambda v: v.cast("double")),
        F.transform(F.col("e2"), lambda v: v.cast("double")),
        lambda u, v: u * v,
    )
    ps = F.round(
        F.lit(1000000.0)
        * F.aggregate(dotp, F.lit(0.0), lambda acc, v: acc + v)
        / F.sqrt(sq_norm_expr("e1") * sq_norm_expr("e2"))
    ).cast("bigint")
    pair = (
        x.join(y, (F.col("qid") == F.col("qid2")) & (F.col("c1") != F.col("c2")))
        .select("qid", "c1", "c2", ps.alias("p6"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    slim = cand.select("qid", "cid", "s6")
    w1 = W.partitionBy("qid").orderBy(F.col("s6").desc(), "cid")
    sel = (
        slim.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") == 1)
        .select(
            "qid",
            "cid",
            (F.lit(7) * F.col("s6")).alias("score_i"),
            F.lit(1).alias("step"),
        )
    )
    # each step's selection feeds TWO consumers in every later step (the
    # max-sim aggregate and the anti-join), so a lazy chain recomputes the
    # selection DAG along ~2^k paths — localCheckpoint materializes each
    # step once (k bounded jobs over |queries|·k-row tables; measured
    # 18.8s -> 4.5s at sf0.1). Same pattern as dedup_clusters' rounds.
    sel = sel.localCheckpoint()
    for k in range(2, _MMR_K + 1):
        picked = sel.select("qid", "cid")
        mx = (
            pair.join(
                picked.select("qid", F.col("cid").alias("c2")), ["qid", "c2"]
            )
            .groupBy("qid", "c1")
            .agg(F.max("p6").alias("m"))
            .select(F.col("qid").alias("qid_m"), F.col("c1"), F.col("m"))
        )
        score = F.lit(7) * F.col("s6") - F.lit(3) * F.col("m")
        wk = W.partitionBy("qid").orderBy(score.desc(), "cid")
        pick = (
            slim.join(picked, ["qid", "cid"], "left_anti")
            .join(mx, (F.col("qid") == F.col("qid_m")) & (F.col("cid") == F.col("c1")))
            .withColumn("rn", F.row_number().over(wk))
            .filter(F.col("rn") == 1)
            .select("qid", "cid", score.alias("score_i"), F.lit(k).alias("step"))
        )
        sel = sel.unionByName(pick).localCheckpoint()
    # the final sel is eagerly checkpointed above, so the step inputs are
    # no longer reachable — release them instead of leaking session-lifetime
    # cached partitions (round-3 ADVICE; same hygiene as dedup_clusters)
    cand.unpersist()
    pair.unpersist()
    return sel.select(
        F.col("qid").alias("query_id"),
        F.col("cid").alias("vec_id"),
        (F.col("score_i") / F.lit(10000000.0)).alias("mmr_score"),
        F.col("step").cast("int").alias("step"),
    )


# ---------------------------------------------------------------------------
# Exact covariance matrix of the embedding corpus (one-pass Gram), and the
# PCA projection built from it.
# ---------------------------------------------------------------------------

_COV_D = 64
_COV_SCALE = 1_000_000  # per-coordinate µ-int scale

COV_ORACLE = f"""
WITH flat AS (
  SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS i,
         CAST(round(CAST(unnest(embedding) AS DOUBLE) * {_COV_SCALE}) AS BIGINT)
           AS e6
  FROM embeddings
),
nn AS (SELECT count(*) AS n FROM embeddings),
sums AS (SELECT i, CAST(sum(e6) AS BIGINT) AS s6 FROM flat GROUP BY i),
gram AS (
  SELECT a.i AS i, b.i AS j, CAST(sum(a.e6 * b.e6) AS BIGINT) AS gram6
  FROM flat a JOIN flat b ON a.vec_id = b.vec_id AND a.i <= b.i
  GROUP BY 1, 2
)
SELECT g.i, g.j, g.gram6,
       CAST(CAST(nn.n AS HUGEINT) * g.gram6
            - CAST(sa.s6 AS HUGEINT) * sb.s6 AS DOUBLE)
         / (nn.n * (nn.n - 1.0)) / 1e12 AS cov
FROM gram g, nn, sums sa, sums sb
WHERE sa.i = g.i AND sb.i = g.j
"""


def _gram_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One data pass → augmented Gram matrix rows (i ≤ j ≤ 64).

    Each partition's batch stacks its µ-int-scaled vectors — scaled
    JVM-side with round() so the integerization matches the oracle's,
    never numpy's banker's rounding — into an int64 matrix with a
    constant ``SCALE`` column appended (homogeneous coordinate), and
    emits its local AᵀA upper triangle. Dimension 64 therefore carries
    the per-dim sums (gram(i,64) = SCALE·Σxᵢ) and the count
    (gram(64,64) = SCALE²·n), so covariance needs NO second scan of the
    corpus. Each partition contributes ≤ 2145 rows regardless of row
    count — the reduce side is O(d²), constant in corpus size; int64
    matmul is exact (bounds: |e6| ≤ 5.3e5 → products < 2^63 up to ~10⁷
    rows; beyond that, split batches or widen to object/Python ints)."""
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings").select(
        F.transform(
            "embedding",
            lambda x: F.round(x.cast("double") * _COV_SCALE).cast("long"),
        ).alias("e6")
    )

    def partial_gram(batches):
        acc = np.zeros((_COV_D + 1, _COV_D + 1), dtype=np.int64)
        seen = False
        for pdf in batches:
            if not len(pdf):
                continue
            a = np.stack(pdf["e6"].to_numpy()).astype(np.int64)
            a = np.hstack([a, np.full((a.shape[0], 1), _COV_SCALE, dtype=np.int64)])
            acc += a.T @ a
            seen = True
        if seen:
            iu, ju = np.triu_indices(_COV_D + 1)
            yield pd.DataFrame({"i": iu.astype("int32"), "j": ju.astype("int32"),
                                "gram6": acc[iu, ju]})

    partials = emb.mapInPandas(partial_gram, "i int, j int, gram6 long")
    return partials.groupBy("i", "j").agg(F.sum("gram6").alias("gram6"))


@query("q_embedding_covariance", COV_ORACLE)
def q_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact sample covariance of every coordinate pair of the embedding
    corpus — the input to PCA whitening — computed in ONE pass as an
    integer Gram matrix (see `_gram_rows`). The reduce output is a FIXED
    O(d²) = 2145 rows regardless of corpus size, so the finish
    cov(i,j) = (n·Gᵢⱼ − SᵢSⱼ) / (n(n−1)) runs driver-side on collected
    rows with arbitrary-precision Python ints: n·Gᵢⱼ − SᵢSⱼ overflows
    int64 past ~6·10³ rows (n²·max(e6)² > 2⁶³), so the exact product is
    formed in Python and only the final value is rounded to double —
    matching the oracle's HUGEINT (int128) arithmetic bit-for-bit. One
    corpus scan, no persist, no self-joins; the same shape at 100 TB
    (the scan is distributed, the finish is d×d)."""
    g65 = {(r["i"], r["j"]): r["gram6"] for r in _gram_rows(spark, sf_dir).collect()}
    n = g65[(_COV_D, _COV_D)] // _COV_SCALE // _COV_SCALE
    s6 = {i: g65[(i, _COV_D)] // _COV_SCALE for i in range(_COV_D)}
    rows = [
        (i, j, g, float(n * g - s6[i] * s6[j]) / (n * (n - 1.0)) / 1e12)
        for (i, j), g in sorted(g65.items())
        if j < _COV_D
    ]
    return spark.createDataFrame(rows, "i int, j int, gram6 long, cov double")


@query("q_pca_top2_project")
def q_pca_top2_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA projection onto the top-2 principal components. The d×d
    covariance (tiny for any corpus size) is collected to the driver,
    eigendecomposed with numpy, and the two leading eigenvectors are
    baked into the plan as LITERALS — the projection pass is then pure
    whole-stage-codegen column algebra over one corpus scan, the same
    shape at 100 TB. Scores are UNCENTERED: each pcₖ is offset by the
    constant ⟨mean, vₖ⟩ relative to textbook PCA scores (component
    directions, variance ordering, and pairwise distances are
    unaffected). Eigenvector sign is fixed (largest-|component|
    positive) so output is deterministic; no SQL oracle — DuckDB has no
    eigensolver — the driver's rows-only gate plus test-asserted
    variance ordering cover it."""
    import numpy as np

    cov_rows = q_embedding_covariance(spark, sf_dir).select("i", "j", "cov").collect()
    cov = np.zeros((_COV_D, _COV_D))
    for r in cov_rows:
        cov[r.i, r.j] = cov[r.j, r.i] = r.cov
    vals, vecs = np.linalg.eigh(cov)  # ascending
    out_cols = []
    emb = load_table(spark, sf_dir, "embeddings")
    for rank, k in enumerate((-1, -2)):
        v = vecs[:, k]
        v = v if v[int(np.argmax(np.abs(v)))] >= 0 else -v
        proj = F.aggregate(
            F.zip_with(
                "embedding",
                F.array(*[F.lit(float(c)) for c in v]),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
        out_cols.append(F.round(proj, 4).alias(f"pc{rank + 1}"))
    return emb.select("vec_id", "label", *out_cols)


PCA_INV_ORACLE = """
SELECT CAST(count(*) AS BIGINT) AS n_vectors,
       TRUE AS variance_ordered,
       TRUE AS scores_uncorrelated
FROM embeddings
"""


# NOTE: registered in operators/incremental.py; its position in the
# driver's 50-slot correctness window is set explicitly by
# registry.GATE_ORDER (gated in round 4, replacing the oracle-less
# q_pca_top2_project per VERDICT.md).
def q_pca_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-gated companion to the rows-only [[q_pca_top2_project]]: the
    projection itself can't be cross-hashed (DuckDB has no eigensolver),
    but PCA's defining invariants CAN be gated as booleans, the same
    trick as the approx-sketch bounds. For exact principal components,
    (a) sample variance of pc1 ≥ pc2 (eigenvalue ordering) and (b) the
    score columns are uncorrelated (v₁ᵀCv₂ = 0). Both are computed on
    the emitted (4-dp-rounded) scores with tolerances far above rounding
    noise yet far below any real eigensolver bug; the oracle emits the
    vector count plus literal TRUE, so the driver's value-hash fails if
    either invariant ever breaks."""
    scores = q_pca_top2_project(spark, sf_dir)
    agg = scores.agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.var_samp("pc1").alias("v1"),
        F.var_samp("pc2").alias("v2"),
        F.covar_samp("pc1", "pc2").alias("c12"),
    )
    return agg.select(
        "n_vectors",
        (F.col("v1") >= F.col("v2") - F.lit(1e-9)).alias("variance_ordered"),
        (
            F.abs(F.col("c12"))
            <= F.lit(1e-3) * F.sqrt(F.col("v1") * F.col("v2")) + F.lit(1e-6)
        ).alias("scores_uncorrelated"),
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of the lexical (BM25) and
# semantic (embedding-cosine) legs.
# ---------------------------------------------------------------------------

_RRF_QID = 100   # query document: its text terms are _BM25_TERMS' corpus,
                 # its embedding (vec_id == doc_id convention) the vector leg
_RRF_K = 60      # the canonical RRF discount constant
_RRF_L = 50      # per-leg candidate depth
_RRF_TOPK = 20


def _rrf_oracle() -> str:
    from .text import _BM25_B, _BM25_K1, _BM25_TERMS_SQL

    return f"""
WITH toks AS (
  SELECT d.doc_id, t.term
  FROM documents d, unnest(string_split(d.text, ' ')) AS t(term)
  WHERE t.term <> ''
), dl AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) AS BIGINT) / CAST(count(*) AS BIGINT) * 1.0 AS avgdl
  FROM dl
), qterms AS (SELECT * FROM (VALUES {_BM25_TERMS_SQL}) AS q(term)),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM toks WHERE term IN (SELECT term FROM qterms)
  GROUP BY doc_id, term
), df AS (
  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tf GROUP BY term
), contrib AS (
  SELECT tf.doc_id,
         CAST(round(
           ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
           * tf.tf * ({_BM25_K1} + 1.0)
           / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
              + {_BM25_B} * dl.dl / stats.avgdl)) * 1000000
         ) AS BIGINT) AS c6
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
), lleg AS (
  SELECT doc_id,
         CAST(row_number() OVER (
           ORDER BY CAST(sum(c6) AS BIGINT) DESC, doc_id) AS INT) AS lex_rk
  FROM contrib WHERE doc_id <> {_RRF_QID}
  GROUP BY doc_id
  QUALIFY lex_rk <= {_RRF_L}
), vscored AS (
  SELECT b.vec_id AS doc_id, {_COS_SQL} AS cos
  FROM embeddings b
  CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = {_RRF_QID}) a
  WHERE b.vec_id <> {_RRF_QID}
), vleg AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY cos DESC, doc_id) AS INT) AS vec_rk
  FROM vscored QUALIFY vec_rk <= {_RRF_L}
), fused AS (
  SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
         coalesce(l.lex_rk, 0) AS lex_rk,
         coalesce(v.vec_rk, 0) AS vec_rk,
         coalesce(CAST(round(1000000.0 / ({_RRF_K} + l.lex_rk)) AS BIGINT), 0)
         + coalesce(CAST(round(1000000.0 / ({_RRF_K} + v.vec_rk)) AS BIGINT), 0)
           AS rrf6
  FROM lleg l FULL OUTER JOIN vleg v ON l.doc_id = v.doc_id
)
SELECT doc_id, CAST(lex_rk AS INT) AS lex_rk, CAST(vec_rk AS INT) AS vec_rk,
       round(rrf6 / 1000000.0, 6) AS rrf,
       CAST(row_number() OVER (ORDER BY rrf6 DESC, doc_id) AS INT) AS rrf_rk
FROM fused QUALIFY rrf_rk <= {_RRF_TOPK}
"""


def q_rrf_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval by reciprocal-rank fusion (Cormack/Clarke/Buettcher
    2009): the lexical leg ranks docs by BM25 for the fixed query terms
    ([[q_bm25_search]]'s formula), the semantic leg ranks by cosine to the
    query document's embedding ([[ann_bruteforce_topk]]'s scoring), and
    each doc's fused score is sum(1/(60+rank)) over the legs it appears
    in (top-50 per leg, the query doc itself excluded). This is the
    standard production hybrid-search primitive (Elasticsearch/Vespa/
    OpenSearch all ship exactly this fusion), fusing on RANKS so the two
    legs' incomparable score scales never need calibration.

    Exactness: per-leg ranks are integers with doc_id tiebreaks; the RRF
    discount 1e6/(60+r) rounds to a long per leg, so the fused score is
    an exact integer sum — cross-engine hash-stable.

    Scale shape: each leg is its existing operator's plan (postings-only
    shuffle for BM25; broadcast query x corpus scan for cosine) ending in
    a top-L TakeOrderedAndProject, so the fusion join touches 2L rows —
    a full-outer join of two tiny frames, broadcast both ways, then a
    top-k over at most 2L fused rows. Depth L and fanout are constants:
    the whole fusion layer is O(1) in corpus size."""
    from .text import _BM25_B, _BM25_K1, _BM25_TERMS

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    # --- lexical leg: BM25, same formula as q_bm25_search -----------------
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl") / F.count(F.lit(1)) * 1.0).alias("avgdl"),
    )
    tf = (
        toks.filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    denom = F.col("tf") + _BM25_K1 * (
        1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl")
    )
    c6 = F.round(idf * F.col("tf") * (_BM25_K1 + 1.0) / denom * 1000000).cast("long")
    lex_scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", c6.alias("c6"))
        .groupBy("doc_id")
        .agg(F.sum("c6").alias("s6"))
        .filter(F.col("doc_id") != _RRF_QID)
    )
    lleg = (
        lex_scored.orderBy(F.col("s6").desc(), "doc_id")
        .limit(_RRF_L)
        .select(
            "doc_id",
            F.row_number()
            .over(W.orderBy(F.col("s6").desc(), "doc_id"))
            .cast("int")
            .alias("lex_rk"),
        )
    )

    # --- semantic leg: cosine to the query doc's embedding ---------------
    qvec = emb.filter(F.col("vec_id") == _RRF_QID).select(
        F.col("embedding").alias("e1")
    )
    vec_scored = (
        emb.filter(F.col("vec_id") != _RRF_QID)
        .crossJoin(F.broadcast(qvec))
        .select(
            F.col("vec_id").alias("doc_id"),
            _cosine("e1", "embedding").alias("cos"),
        )
    )
    vleg = (
        vec_scored.orderBy(F.col("cos").desc(), "doc_id")
        .limit(_RRF_L)
        .select(
            "doc_id",
            F.row_number()
            .over(W.orderBy(F.col("cos").desc(), "doc_id"))
            .cast("int")
            .alias("vec_rk"),
        )
    )

    # --- fusion: integer RRF over the (at most 2L) leg survivors ----------
    disc = lambda r: F.round(1000000.0 / (_RRF_K + r)).cast("long")
    fused = (
        lleg.join(vleg, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.coalesce("lex_rk", F.lit(0)).alias("lex_rk"),
            F.coalesce("vec_rk", F.lit(0)).alias("vec_rk"),
            (
                F.coalesce(disc(F.col("lex_rk")), F.lit(0))
                + F.coalesce(disc(F.col("vec_rk")), F.lit(0))
            ).alias("rrf6"),
        )
    )
    return (
        fused.orderBy(F.col("rrf6").desc(), "doc_id")
        .limit(_RRF_TOPK)
        .select(
            "doc_id",
            "lex_rk",
            "vec_rk",
            F.round(F.col("rrf6") / 1000000.0, 6).alias("rrf"),
            F.row_number()
            .over(W.orderBy(F.col("rrf6").desc(), "doc_id"))
            .cast("int")
            .alias("rrf_rk"),
        )
    )


QUERIES["q_rrf_hybrid_search"] = q_rrf_hybrid_search
ORACLES["q_rrf_hybrid_search"] = _rrf_oracle()


# ---------------------------------------------------------------------------
# Mutual k-NN graph: the edge set SemDeDup/clustering pipelines start from.
# ---------------------------------------------------------------------------

_KNNG_K = 5

KNNG_ORACLE = f"""
WITH seeds AS (
  SELECT vec_id AS cluster_id, embedding AS ce
  FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT greatest(8, CAST(ceil(sqrt(CAST((SELECT count(*) FROM embeddings) AS DOUBLE)) / 6.0) AS BIGINT))
), best AS (
  SELECT vec_id, cluster_id FROM (
    SELECT e.vec_id, s.cluster_id,
           row_number() OVER (
             PARTITION BY e.vec_id ORDER BY round({_D2_SQL}, 6), s.cluster_id
           ) AS rk
    FROM embeddings e CROSS JOIN seeds s
  ) WHERE rk = 1
), cell AS (
  SELECT b.vec_id, b.cluster_id, e.embedding
  FROM best b JOIN embeddings e USING (vec_id)
), directed AS (
  SELECT src, dst, cos6 FROM (
    SELECT a.vec_id AS src, b.vec_id AS dst, round({_COS_SQL}, 6) AS cos6,
           row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY round({_COS_SQL}, 6) DESC, b.vec_id
           ) AS rk
    FROM cell a JOIN cell b
      ON a.cluster_id = b.cluster_id AND a.vec_id <> b.vec_id
  )
  WHERE rk <= {_KNNG_K}
)
SELECT x.src AS v1, x.dst AS v2, round(x.cos6, 3) AS cosine
FROM directed x JOIN directed y ON x.src = y.dst AND x.dst = y.src
WHERE x.src < x.dst
"""


def _knng_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, cluster_id, embedding) under the same deterministic
    k = max(8, ceil(√n/6)) quantizer ann_kmeans_assign uses (smallest-md5 seeds, d² rounded
    before the argmin so ties cut identically cross-engine). r9: the
    argmin is _nearest_seed's map-side min(struct) aggregate (was a
    row_number window over all n×k scored rows) with the embedding as
    payload."""
    emb = load_table(spark, sf_dir, "embeddings")
    return _nearest_seed(emb, payload=("embedding",)).select(
        "vec_id",
        "cluster_id",
        "embedding",
        # squared norm computed ONCE per vector here (and materialized by
        # the caller's localCheckpoint) instead of per candidate pair —
        # cos = dot / sqrt(n1*n2) is bit-identical to the inline form,
        # but the pair stage runs one 64-element fold instead of three
        sq_norm_expr("embedding").alias("sqn"),
    )


@query("q_knn_graph", KNNG_ORACLE)
def q_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual k-NN graph (k=5, cosine) over the embedding corpus — the
    input edge set for graph-based curation (SemDeDup cluster pruning,
    agglomerative near-dup clustering, label propagation over
    [[dedup_clusters]]). An edge (a,b) exists iff b is in a's top-5 AND
    a is in b's top-5; mutuality is the standard sparsifier that drops
    hub-induced one-way edges.

    Candidate pruning: neighbors are searched INSIDE the same coarse
    k-means cell (identical deterministic quantizer to
    [[ann_kmeans_assign]]) — the pair space is Σ|cell|², never corpus²,
    and each cell's pairs co-locate in one shuffle partition keyed by
    cluster_id. At 100 TB the cells are the IVF layout already built for
    [[ann_ivf_topk]]; a skewed mega-cell is handled by splitting cells
    past a size cap (k-means on the cell's members), not by salting,
    because the semantics are per-cell. Cosine is rounded to 6dp BEFORE
    ranking so no cross-engine tie can cut the top-k differently."""
    # The cell frame feeds both sides of the pair join — without
    # materialization the assignment subtree executes twice (and at scale
    # re-reads the corpus twice).
    cell = _knng_cells(spark, sf_dir).localCheckpoint(eager=True)
    # The checkpoint scan reports no partitioning, so the pair join's
    # exchanges are ENSURE_REQUIREMENTS and AQE coalesced them to ONE
    # task by bytes (the 64-float rows are small; the n^2/k pair work is
    # not). _pair_fanout pins the join-key exchange instead — measured
    # 4.3 s -> 1.5 s for this stage at sf0.1, values bit-identical.
    fan = _pair_fanout(spark)
    # r9: one repartition, renamed ABOVE the exchange on each side, so the
    # two exchange subtrees are identical and ReuseExchange shuffles the
    # cell frame once (see semdedup_survivors).
    m = cell.repartition(fan, "cluster_id")
    a = m.select(
        F.col("vec_id").alias("src"),
        F.col("cluster_id").alias("ca"),
        F.col("embedding").alias("e1"),
        F.col("sqn").alias("n1"),
    )
    b = m.select(
        F.col("vec_id").alias("dst"),
        F.col("cluster_id").alias("cb"),
        F.col("embedding").alias("e2"),
        F.col("sqn").alias("n2"),
    )
    cos = dot_expr("e1", "e2") / F.sqrt(F.col("n1") * F.col("n2"))
    # r9 (guide §2.3): each unordered pair is scored ONCE (src < dst) and
    # mirrored with a 2-element explode — the 64-element fold count
    # halves. Cosine is direction-symmetric bit-for-bit (the per-index
    # double multiply commutes and the accumulation order is unchanged),
    # so both directed rows carry exactly the value the former
    # double-sided join computed for them.
    half = a.join(
        b, (F.col("ca") == F.col("cb")) & (F.col("src") < F.col("dst"))
    ).select("src", "dst", F.round(cos, 6).alias("cos6"))
    scored = half.select(
        F.explode(
            F.array(
                F.struct(F.col("src").alias("s"), F.col("dst").alias("d")),
                F.struct(F.col("dst").alias("s"), F.col("src").alias("d")),
            )
        ).alias("e"),
        "cos6",
    ).select(F.col("e.s").alias("src"), F.col("e.d").alias("dst"), "cos6")
    w = W.partitionBy("src").orderBy(F.col("cos6").desc(), F.col("dst"))
    directed = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _KNNG_K)
        .select("src", "dst", "cos6")
    )
    # r9 (guide §2.4): mutuality as ONE map-side-combinable aggregate on
    # the canonical (lo, hi) pair instead of the directed⋈directed
    # self-join (2 exchanges + an eager localCheckpoint barrier → 1
    # exchange, no barrier): the window emits each directed pair at most
    # once, so an undirected edge is mutual iff its canonical pair has
    # exactly 2 directed rows; both rows carry the identical cos6, so
    # min() is the same value the self-join projected from the x side.
    canon = directed.select(
        F.least("src", "dst").alias("v1"),
        F.greatest("src", "dst").alias("v2"),
        "cos6",
    )
    return (
        canon.groupBy("v1", "v2")
        .agg(F.count(F.lit(1)).alias("_n"), F.min("cos6").alias("_c"))
        .filter(F.col("_n") == 2)
        .select("v1", "v2", F.round("_c", 3).alias("cosine"))
    )


# ---------------------------------------------------------------------------
# ANN recall evaluation: LSH top-k vs exact top-k, in-engine.
# ---------------------------------------------------------------------------

RECALL_ORACLE = f"""
WITH bf AS (
  SELECT * FROM ({BRUTE_ORACLE}) WHERE rk <= 3
),
lsh AS ({LSH_ORACLE}),
hits AS (
  SELECT bf.query_id,
         CAST(count(lsh.cand_id) AS BIGINT) AS n_hits
  FROM bf LEFT JOIN lsh
    ON lsh.query_id = bf.query_id AND lsh.cand_id = bf.cand_id
  GROUP BY bf.query_id
)
SELECT query_id, n_hits,
       round(n_hits / 3.0, 6) AS recall_at_3,
       round(sum(n_hits) OVER () / (3.0 * count(*) OVER ()), 6) AS macro_recall
FROM hits
"""


@query("ann_recall_eval", RECALL_ORACLE)
def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@3 of [[ann_lsh_hyperplane]] against the exact top-3 of
    [[ann_bruteforce_topk]], computed entirely in-engine — the evaluation
    harness an ANN deployment runs on every index rebuild (recall drift is
    how you notice a bad quantizer or a skewed bucket long before users
    do). Per-query recall plus the corpus macro average on every row.

    Scale: both retrievals are the already-bounded operators; the
    comparison is an equi-join on (query_id, cand_id) over top-k-sized
    sets — k x queries rows, trivially shuffled. The macro average is
    integer hit counts over a window (sum-of-ints, order-independent);
    per-query recall is one rounded division."""
    bf = ann_bruteforce_topk(spark, sf_dir).filter(F.col("rk") <= 3)
    lsh = ann_lsh_hyperplane(spark, sf_dir).select(
        "query_id", F.col("cand_id").alias("lsh_cand")
    )
    hits = (
        bf.join(
            lsh,
            (bf["query_id"] == lsh["query_id"])
            & (bf["cand_id"] == lsh["lsh_cand"]),
            "left",
        )
        .groupBy(bf["query_id"].alias("query_id"))
        .agg(F.count("lsh_cand").alias("n_hits"))
    )
    wg = W.partitionBy()
    return hits.select(
        "query_id",
        "n_hits",
        F.round(F.col("n_hits") / 3.0, 6).alias("recall_at_3"),
        F.round(
            F.sum("n_hits").over(wg) / (3.0 * F.count(F.lit(1)).over(wg)), 6
        ).alias("macro_recall"),
    )


# ---------------------------------------------------------------------------
# Embedding-table health report: per-label norms, MAD outliers, class weights.
# ---------------------------------------------------------------------------

_EHN = EMB_NORM_SQL.format(t="e")

EMB_HEALTH_ORACLE = f"""
WITH norms AS (
  SELECT e.label, e.vec_id, sqrt({_EHN}) AS nrm
  FROM embeddings e
),
med AS (
  SELECT label, quantile_cont(nrm, 0.5) AS med FROM norms GROUP BY label
),
dev AS (
  SELECT n.label, n.nrm, m.med, abs(n.nrm - m.med) AS adev
  FROM norms n JOIN med m ON n.label = m.label
),
mad AS (SELECT label, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY label),
tot AS (SELECT count(*) AS n_total, count(DISTINCT label) AS k FROM norms)
SELECT dev.label,
       CAST(count(*) AS BIGINT) AS n_vecs,
       round(CAST(max(tot.n_total) AS DOUBLE) / (max(tot.k) * count(*)), 6)
         AS class_weight,
       round(max(dev.med), 6) AS median_norm,
       round(max(mad.mad), 6) AS mad_norm,
       CAST(sum(CASE WHEN dev.adev > 3 * mad.mad THEN 1 ELSE 0 END) AS BIGINT)
         AS n_norm_outliers
FROM dev JOIN mad ON dev.label = mad.label, tot
GROUP BY dev.label
"""


@query("q_embedding_health", EMB_HEALTH_ORACLE)
def q_embedding_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding-table health report: vector counts,
    inverse-frequency class weights (n_total / (k * n_label) — the loss
    reweighting for imbalanced training), median L2 norm, MAD, and the
    count of 3-MAD norm outliers. Degenerate embeddings announce
    themselves through norms first (a near-zero norm is a dead encoder
    output; a giant one poisons dot products), so this is the screen an
    embedding pipeline runs BEFORE building any index on top —
    complementary to [[q_label_centroid_outliers]], which needs the
    centroid geometry this screen validates.

    Scale: same shape as [[q_outliers_mad]] — the norm is a per-row fold
    on the scan, two grouped exact medians with label-sized broadcast
    results; swap percentile for percentile_approx at 100 TB and the plan
    is unchanged."""
    emb = load_table(spark, sf_dir, "embeddings")
    norms = emb.select(
        "label", "vec_id", F.sqrt(sq_norm_expr("embedding")).alias("nrm")
    )
    med = norms.groupBy("label").agg(
        F.expr("percentile(nrm, 0.5)").alias("med")
    )
    dev = norms.join(F.broadcast(med), "label").withColumn(
        "adev", F.abs(F.col("nrm") - F.col("med"))
    )
    mad = dev.groupBy("label").agg(F.expr("percentile(adev, 0.5)").alias("mad"))
    tot = norms.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.countDistinct("label").alias("k"),
    )
    return (
        dev.join(F.broadcast(mad), "label")
        .crossJoin(F.broadcast(tot))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(
                F.max("n_total").cast("double")
                / (F.max("k") * F.count(F.lit(1))),
                6,
            ).alias("class_weight"),
            F.round(F.max("med"), 6).alias("median_norm"),
            F.round(F.max("mad"), 6).alias("mad_norm"),
            F.sum(
                F.when(F.col("adev") > 3 * F.col("mad"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_norm_outliers"),
        )
    )


# ---------------------------------------------------------------------------
# Greedy k-center coreset (Gonzalez farthest-point traversal).
# ---------------------------------------------------------------------------

_KC_K = 6

_KC_DIST6 = (
    "CAST(round(1000000 * list_sum(list_transform(range(1, 65), "
    "i -> (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE))"
    " * (CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE)))))"
    " AS BIGINT)"
)


def _kcenter_oracle() -> str:
    """Unrolled greedy rounds: each = argmax of the running min-distance,
    then a cross-join update against the 1-row winner — the exact mirror
    of the Spark loop."""
    parts = [
        """
WITH s1 AS (
  SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 1
), st1 AS (
  SELECT a.vec_id, a.embedding, {d6} AS d6
  FROM embeddings a CROSS JOIN s1 b
)""".format(d6=_KC_DIST6)
    ]
    for r in range(2, _KC_K + 1):
        parts.append(
            """, w{r} AS (
  SELECT vec_id, embedding, d6 FROM st{p} ORDER BY d6 DESC, vec_id LIMIT 1
)""".format(r=r, p=r - 1)
        )
        if r < _KC_K:
            parts.append(
                """, st{r} AS (
  SELECT a.vec_id, a.embedding, least(a.d6, {d6}) AS d6
  FROM st{p} a CROSS JOIN w{r} b
)""".format(r=r, p=r - 1, d6=_KC_DIST6)
            )
    sel = ["SELECT CAST(1 AS INT) AS sel_round, vec_id,"
           " CAST(0.0 AS DOUBLE) AS d2_sel FROM s1"]
    sel += [
        f"SELECT CAST({r} AS INT), vec_id, round(d6 / 1000000.0, 6) FROM w{r}"
        for r in range(2, _KC_K + 1)
    ]
    return "".join(parts) + "\n" + "\nUNION ALL\n".join(sel)


def _kc_dist6(v, cv):
    diffs = F.zip_with(v, cv, lambda x, y: (x - y) * (x - y))
    return F.round(
        1000000 * F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)
    ).cast("long")


def q_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset (Gonzalez 2-approximation, the
    farthest-point traversal): seed with the lowest vec_id, then k-1
    rounds of "select the point farthest from every chosen center" —
    THE diverse-subset selection primitive (coreset construction,
    active-learning seed pools, k-center initialization; complements
    [[semdedup_survivors]], which removes redundancy, by *maximizing*
    coverage). Emits each center with its selection-time distance — the
    running coverage radius, whose final value is the 2-approx bound.

    Exactness: squared L2 folded in sequential order (dedup.py dot_expr
    discipline) and rounded to µ-integers before any comparison, so the
    argmax — ties broken by vec_id — is engine-independent.

    Scale: each round is one corpus scan + a broadcast 1-row center + a
    TakeOrdered argmax: O(k·n·d) total, no pairwise materialization, no
    corpus shuffle at all. State (vec, running min-distance) is
    localCheckpointed per round so lineage stays flat at any k. At 100 TB
    the same loop runs unchanged; k is the only growth knob."""
    emb = load_table(spark, sf_dir, "embeddings")
    arr = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    pts = emb.select("vec_id", arr.alias("v"))
    seed = pts.orderBy("vec_id").limit(1).localCheckpoint(eager=True)
    out = [
        seed.select(
            F.lit(1).cast("int").alias("sel_round"),
            "vec_id",
            F.lit(0.0).alias("d2_sel"),
        )
    ]
    state = (
        pts.crossJoin(F.broadcast(seed.select(F.col("v").alias("cv"))))
        .select("vec_id", "v", _kc_dist6(F.col("v"), F.col("cv")).alias("d6"))
        .localCheckpoint(eager=True)
    )
    for r in range(2, _KC_K + 1):
        win = (
            state.orderBy(F.col("d6").desc(), "vec_id")
            .limit(1)
            .localCheckpoint(eager=True)
        )
        out.append(
            win.select(
                F.lit(r).cast("int").alias("sel_round"),
                "vec_id",
                F.round(F.col("d6") / 1000000.0, 6).alias("d2_sel"),
            )
        )
        if r < _KC_K:
            state = (
                state.crossJoin(
                    F.broadcast(win.select(F.col("v").alias("cv")))
                )
                .select(
                    "vec_id",
                    "v",
                    F.least(
                        F.col("d6"), _kc_dist6(F.col("v"), F.col("cv"))
                    ).alias("d6"),
                )
                .localCheckpoint(eager=True)
            )
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res


QUERIES["q_kcenter_coreset"] = q_kcenter_coreset
ORACLES["q_kcenter_coreset"] = _kcenter_oracle()


# ---------------------------------------------------------------------------
# DBSCAN over the blocked epsilon-neighbor graph (graph formulation).
# ---------------------------------------------------------------------------

_DB_TAU = 0.2      # cosine >= tau  <=>  within-epsilon neighbor
_DB_MINPTS = 5     # core iff >= 5 neighbors (excluding self)
# Banded-blocking knob (r7): the candidate space is (label, band, bits)
# instead of bare label once any label holds more than _DB_BLOCK_CAP
# vectors — b = ceil(log2(max_label_n / 1024)) SimHash bits per band,
# 4 bands. At every checked-in SF (max 218/label) b = 0 and the single
# zero-bit band IS bare label blocking, so oracle hashes are unchanged;
# past the cap the per-bucket pair space stays ~n*1024 per label per
# band. Without this the in-label pair scan is n^2/|labels| with a FIXED
# label count: at the x64 sweep fixture (12.8k/label) the 1.6B-pair scan
# crashed the 16g JVM outright (GCLocker allocation-retry death) — the
# first hard failure the x-sweeps found. Same engage-past-checked-in
# pattern as the tfidf _DOCSIM_MAX_DF cap and the k-means seed rule.
_DB_BLOCK_CAP = 1024
_DB_BAND_R = 4
_DB_BAND_MAXB = 16
# past this many vectors the edge/core-edge frames stage to scratch
# parquet instead of localCheckpoint (see _stage in q_dbscan_clusters)
_DB_STAGE_MAX = 100_000

_DB_COS_SQL = (
    f"{EMB_DOT_SQL} / sqrt(({EMB_NORM_SQL.format(t='a')})"
    f" * ({EMB_NORM_SQL.format(t='b')}))"
)

DBSCAN_ORACLE = f"""
WITH RECURSIVE mx AS (
  SELECT max(cnt) AS mx
  FROM (SELECT count(*) AS cnt FROM embeddings GROUP BY label) t
),
bw AS (
  SELECT GREATEST(0, LEAST({_DB_BAND_MAXB},
         CAST(ceil(log2(mx / {_DB_BLOCK_CAP}.0)) AS INT))) AS b
  FROM mx
),
bands AS (
  SELECT unnest(range(0, CASE WHEN b > 0 THEN {_DB_BAND_R} ELSE 1 END)) AS band
  FROM bw
),
planes AS (
  SELECT p, b, list_transform(range(1, 65), d -> {_BAND_W_SQL}) AS w
  FROM (SELECT unnest(range(0, {_DB_BAND_R * _DB_BAND_MAXB})) AS p), bw
  WHERE p < {_DB_BAND_R} * b
),
proj AS (
  SELECT e.vec_id, CAST(pl.p AS INT) AS p, pl.b,
         list_sum(list_transform(range(1, 65),
                  i -> pl.w[i] * CAST(e.embedding[i] AS DOUBLE))) AS dot
  FROM embeddings e JOIN planes pl ON true
),
bitsreal AS (
  SELECT vec_id, p // b AS band,
         CAST(sum(CASE WHEN dot > 0 THEN 1 << (p % b) ELSE 0 END) AS BIGINT) AS bits
  FROM proj GROUP BY vec_id, p // b
),
sig AS (
  SELECT e.vec_id, e.label, bd.band, COALESCE(br.bits, 0) AS bits
  FROM embeddings e CROSS JOIN bands bd
  LEFT JOIN bitsreal br ON br.vec_id = e.vec_id AND br.band = bd.band
),
cand AS (
  SELECT DISTINCT s1.vec_id AS v1, s2.vec_id AS v2
  FROM sig s1 JOIN sig s2
    ON s1.label = s2.label AND s1.band = s2.band AND s1.bits = s2.bits
   AND s1.vec_id < s2.vec_id
),
pairs AS (
  SELECT c.v1, c.v2
  FROM cand c JOIN embeddings a ON a.vec_id = c.v1
              JOIN embeddings b ON b.vec_id = c.v2
  WHERE {_DB_COS_SQL} >= {_DB_TAU}
),
edges AS (SELECT v1 AS src, v2 AS dst FROM pairs UNION SELECT v2, v1 FROM pairs),
deg AS (SELECT src AS n, CAST(count(*) AS BIGINT) AS nbrs FROM edges GROUP BY src),
core AS (SELECT n FROM deg WHERE nbrs >= {_DB_MINPTS}),
cedges AS (
  SELECT e.src, e.dst FROM edges e
  JOIN core c1 ON e.src = c1.n JOIN core c2 ON e.dst = c2.n
),
reach AS (
  SELECT n, n AS m FROM core
  UNION
  SELECT r.n, e.dst AS m FROM reach r JOIN cedges e ON e.src = r.m
),
clab AS (SELECT n, min(m) AS cluster_id FROM reach GROUP BY n),
blab AS (
  SELECT e.src AS n, min(c.cluster_id) AS cluster_id
  FROM edges e JOIN clab c ON e.dst = c.n
  WHERE e.src NOT IN (SELECT n FROM core)
  GROUP BY e.src
)
SELECT emb.vec_id,
       CASE WHEN cl.n IS NOT NULL THEN 'core'
            WHEN bl.n IS NOT NULL THEN 'border'
            ELSE 'noise' END AS role,
       CAST(coalesce(cl.cluster_id, bl.cluster_id, -1) AS BIGINT) AS cluster_id,
       CAST(coalesce(d.nbrs, 0) AS BIGINT) AS n_neighbors
FROM embeddings emb
LEFT JOIN clab cl ON emb.vec_id = cl.n
LEFT JOIN blab bl ON emb.vec_id = bl.n
LEFT JOIN deg d ON emb.vec_id = d.n
"""


def _db_banding(
    spark: SparkSession, emb: DataFrame, cap: int = _DB_BLOCK_CAP
) -> tuple[DataFrame, DataFrame]:
    """(bands, bits_real) for the adaptive (label, band, bits) blocking —
    extracted from q_dbscan_clusters so tests can force the cap down and
    exercise the b > 0 multi-band path on small fixtures."""
    bw = (
        emb.groupBy("label")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(
            F.greatest(
                F.lit(0),
                F.least(
                    F.lit(_DB_BAND_MAXB),
                    F.ceil(F.log2(F.max("cnt") / F.lit(float(cap)))).cast("int"),
                ),
            ).alias("b")
        )
    )
    planes = (
        spark.range(_DB_BAND_R * _DB_BAND_MAXB)
        .select(F.col("id").cast("int").alias("p"))
        .join(F.broadcast(bw))
        .filter(F.col("p") < _DB_BAND_R * F.col("b"))
        .select(
            "p",
            "b",
            F.transform(
                F.sequence(F.lit(1), F.lit(64)),
                lambda d: (
                    (
                        md5_long(
                            F.concat(
                                F.col("p").cast("string"), F.lit(":"), d.cast("string")
                            )
                        )
                        % 2001
                    )
                    - 1000
                )
                / 1000.0,
            ).alias("w"),
        )
    )
    bits_real = (
        emb.join(F.broadcast(planes))
        .select("vec_id", "p", "b", dot_expr("w", "embedding").alias("dot"))
        # greatest(b,1): ANSI div/mod must not see a 0 divisor even though
        # the b=0 plan carries zero rows (codegen can evaluate the
        # expression speculatively); when b>0 it is exactly b
        .groupBy("vec_id", F.expr("p div greatest(b, 1)").alias("band"))
        .agg(
            F.sum(
                F.when(
                    F.col("dot") > 0, F.expr("shiftleft(1, p % greatest(b, 1))")
                ).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("bits")
        )
    )
    bands = bw.select(
        F.explode(
            F.sequence(
                F.lit(0),
                F.when(F.col("b") > 0, F.lit(_DB_BAND_R - 1)).otherwise(F.lit(0)),
            )
        ).alias("band")
    )
    return bands, bits_real


def _db_candidates(
    spark: SparkSession,
    emb: DataFrame,
    bands: DataFrame,
    bits_real: DataFrame,
    first_band_only: bool = True,
) -> DataFrame:
    """(v1 < v2) epsilon-candidate pairs from the (label, band, bits)
    bucket join — each pair emitted EXACTLY ONCE (r9).

    The r8 form emitted a pair once per colliding band and relied on
    edges.distinct() after the eps filter to dedup. The r9 ×256 run
    showed why that breaks at near-duplicate density: when most
    candidates PASS the filter, the distinct's input inherits the full
    ×{_DB_BAND_R} band multiplicity — the stage-37 shuffle wrote tens
    of GB of duplicate survivor rows. Fix: every sig row carries the
    vector's dense per-band bits array, and the bucket join keeps a
    collision only in the FIRST band where the two arrays agree
    (Broder's once-per-pair banding trick). Candidate SET unchanged —
    a pair collides in band j iff its first-agreeing band k ≤ j exists,
    and the pair IS generated in band k's bucket — so the verify runs
    once per pair (not per collision) and the edge frame needs no
    distinct at all. Parity with the multi-emission form is pinned by
    tests/test_dbscan_banding.py with the block cap forced down.
    """
    # dense per-vector bits array (position = band; absent bands -> 0),
    # then one row per (vec, band) carrying the whole array — an extra
    # O(n)-row aggregate, amortized over the O(candidates) join it dedups
    sig = (
        emb.select("vec_id", "label")
        .join(F.broadcast(bands))
        .join(bits_real, ["vec_id", "band"], "left")
        .groupBy("vec_id", "label")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "band", F.coalesce("bits", F.lit(0)).alias("bits")
                        )
                    )
                ),
                lambda x: x["bits"],
            ).alias("barr")
        )
        .selectExpr("vec_id", "label", "barr", "posexplode(barr) AS (band, bits)")
    )
    fan = pair_fanout(spark)
    s1 = sig.repartition(fan, "label", "band", "bits").select(
        F.col("vec_id").alias("v1"), "label", "band", "bits", "barr"
    )
    s2 = sig.repartition(fan, "label", "band", "bits").select(
        F.col("vec_id").alias("v2"),
        F.col("label").alias("l2"),
        F.col("band").alias("band2"),
        F.col("bits").alias("bits2"),
        F.col("barr").alias("barr2"),
    )
    on = (
        (F.col("label") == F.col("l2"))
        & (F.col("band") == F.col("band2"))
        & (F.col("bits") == F.col("bits2"))
        & (F.col("v1") < F.col("v2"))
    )
    if first_band_only:
        # 1-based array_position of the first band where the two bit
        # arrays agree; bits == bits2 guarantees it exists and is <= band
        on = on & F.expr(
            "band = array_position(zip_with(barr, barr2, (x, y) -> x = y), true) - 1"
        )
    return s1.join(s2, on).select("v1", "v2")


def q_dbscan_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN (Ester et al. 1996) in its graph formulation over the
    blocked cosine epsilon-neighbor relation: core points have >=
    {minPts} neighbors, clusters are connected components of the
    core-core subgraph (min-label propagation, the [[dedup_clusters]]
    loop), border points attach to their lowest-id core cluster, the
    rest is noise — the density-based complement of [[ann_kmeans_assign]]
    (no k, finds noise) used to mine coherent topic blobs / outlier
    pockets in embedding space before curation.

    Determinism: neighbor candidates are blocked by label (the IVF-cell
    pattern of [[dedup_embedding_cosine]]); cosine is the sequential fold
    of dedup.dot_expr, compared exactly — identical across engines — and
    every tie-break is min(id). Oracle: recursive-CTE transitive closure
    of the same graph.

    Scale: the pair space is per-cell quadratic (never global); degree,
    core filter and border attach are each one keyed aggregate/join;
    label propagation localCheckpoints per round with diameter-bounded
    iterations. Edges/core/cedges localCheckpoint eagerly, so the pair
    join runs exactly once for the loop AND the final assembly."""
    emb = load_table(spark, sf_dir, "embeddings")
    # Banded candidate blocking (see _DB_BLOCK_CAP above): at the
    # checked-in SFs b = 0 and this is EXACTLY bare label blocking (one
    # zero-bit band), so the output is unchanged; past the cap each
    # label splits into 2^b sign-buckets per band and the pair scan
    # stays ~n*cap per label per band instead of n^2/|labels|.
    bands, bits_real = _db_banding(spark, emb)
    cand = _db_candidates(spark, emb, bands, bits_real)
    va = emb.select(
        F.col("vec_id").alias("v1"),
        F.col("embedding").alias("e1"),
        sq_norm_expr("embedding").alias("n1"),
    )
    vb = emb.select(
        F.col("vec_id").alias("v2"),
        F.col("embedding").alias("e2"),
        sq_norm_expr("embedding").alias("n2"),
    )
    # BROADCAST the vector table into both verify hops (r8 — the same
    # wide-sort defect dedup._cosine_verify fixed this round): the
    # sort-merge form sorts |candidates| rows dragging 64-float arrays,
    # and at x256 (~820M in-bucket candidates) the sort spill exhausted
    # local disk twice (artifacts_r8/x256_dbscan_fail_evidence.txt).
    # Broadcast keeps the candidate frame streaming: bucket join -> two
    # hash probes -> eps filter in one stage, and only the eps-edge
    # survivors ever shuffle again. Past _VERIFY_BROADCAST_MAX vectors
    # the fallback is dedup._cosine_verify's else-branch verbatim —
    # candidate-fanout repartition + explicit shuffle_hash hints, never
    # a sort-merge join whose sort drags the 64-float arrays (the very
    # disk-exhaustion shape this comment's first paragraph documents).
    cos = dot_expr("e1", "e2") / F.sqrt(F.col("n1") * F.col("n2"))
    n_vec = emb.count()
    if n_vec <= _VERIFY_BROADCAST_MAX:
        pairs = cand.join(F.broadcast(va), "v1").join(F.broadcast(vb), "v2")
    else:
        fan = pair_fanout(spark)
        pairs = (
            cand.repartition(fan, "v1")
            .join(va.hint("shuffle_hash"), "v1")
            .repartition(fan, "v2")
            .join(vb.hint("shuffle_hash"), "v2")
        )
    pairs = pairs.filter(cos >= _DB_TAU).select("v1", "v2")

    def _stage(df: DataFrame, name: str) -> DataFrame:
        """Pin a frame the downstream graph passes re-read many times.

        Small (every driver/test SF): localCheckpoint — in-process, no
        files. Big (past _DB_STAGE_MAX vectors): scratch PARQUET
        write+read. The ×128/×256 attempts proved localCheckpoint's
        deserialized block unroll is the wrong tool for a multi-GB edge
        frame — 32 concurrent unrolls exhausted even a 48 g heap
        (attempt-5 log), while columnar scratch staging is bounded-memory
        on both sides and ~5× smaller on disk. This is the local analogue
        of materializing an intermediate table between pipeline stages.
        """
        if n_vec <= _DB_STAGE_MAX:
            return df.localCheckpoint(eager=True)
        import tempfile

        d = tempfile.mkdtemp(prefix=f"dbscan_{name}_")
        df.write.mode("overwrite").parquet(d)
        return spark.read.parquet(d)

    # no .distinct(): _db_candidates emits each pair exactly once
    # (first-band-only), so the undirected doubling below is already
    # duplicate-free — the r9 ×256 run showed the old post-filter
    # distinct shuffling the survivor frame WITH its ×R band
    # multiplicity (tens of GB of duplicate rows at near-dup density).
    # repartition(src) BEFORE staging (r9, attempt-4 OOM): the survivor
    # frame inherits the (label, band, bits) bucket partitioning, which
    # at near-dup density is violently skewed — an even src-hash
    # exchange right-sizes the staged files AND pre-partitions the
    # frame for the degree aggregate that follows.
    edge_fan = 4 * pair_fanout(spark)
    edges = _stage(
        pairs.union(pairs.select(F.col("v2"), F.col("v1")))
        .toDF("src", "dst")
        .repartition(edge_fan, "src"),
        "edges",
    )
    deg = edges.groupBy(F.col("src").alias("n")).agg(
        F.count(F.lit(1)).alias("nbrs")
    )
    core = (
        deg.filter(F.col("nbrs") >= _DB_MINPTS)
        .select("n")
        .localCheckpoint(eager=True)
    )
    cedges = _stage(
        edges.join(core.withColumnRenamed("n", "src"), "src")
        .join(core.withColumnRenamed("n", "dst"), "dst")
        .select("src", "dst"),
        "cedges",
    )
    labels = core.select("n", F.col("n").alias("label")).localCheckpoint()
    for _ in range(10):
        nbr = (
            cedges.join(labels, cedges.dst == labels.n)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr, labels.n == nbr.src, "left")
            .select(
                "n",
                F.least(
                    F.col("label"),
                    F.coalesce(F.col("nbr_label"), F.col("label")),
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("x")
            .join(labels.alias("y"), F.col("x.n") == F.col("y.n"))
            .filter(F.col("x.label") != F.col("y.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    clab = labels.select("n", F.col("label").alias("cluster_id"))
    blab = (
        edges.join(core.withColumnRenamed("n", "src"), "src", "left_anti")
        .join(clab.withColumnRenamed("n", "dst"), "dst")
        .groupBy(F.col("src").alias("n"))
        .agg(F.min("cluster_id").alias("b_cluster"))
    )
    out = (
        emb.select("vec_id")
        .join(clab.withColumnRenamed("n", "vec_id"), "vec_id", "left")
        .join(blab.withColumnRenamed("n", "vec_id"), "vec_id", "left")
        .join(
            deg.withColumnRenamed("n", "vec_id").withColumnRenamed(
                "nbrs", "d_nbrs"
            ),
            "vec_id",
            "left",
        )
        .select(
            "vec_id",
            F.when(F.col("cluster_id").isNotNull(), "core")
            .when(F.col("b_cluster").isNotNull(), "border")
            .otherwise("noise")
            .alias("role"),
            F.coalesce("cluster_id", "b_cluster", F.lit(-1))
            .cast("long")
            .alias("cluster_id"),
            F.coalesce("d_nbrs", F.lit(0)).cast("long").alias("n_neighbors"),
        )
    )
    return out


QUERIES["q_dbscan_clusters"] = q_dbscan_clusters
ORACLES["q_dbscan_clusters"] = DBSCAN_ORACLE


# ---------------------------------------------------------------------------
# Semi-supervised label propagation over the mutual k-NN graph.
# ---------------------------------------------------------------------------

_LP_HOLD_MOD = 5   # vec_id % 5 == 0 -> label hidden (20% holdout)

LABELPROP_ORACLE = f"""
WITH mutual AS ({KNNG_ORACLE}),
edges AS (
  SELECT v1 AS n, v2 AS m FROM mutual UNION ALL SELECT v2, v1 FROM mutual
),
lab0 AS (
  SELECT vec_id AS m, label FROM embeddings WHERE vec_id % {_LP_HOLD_MOD} <> 0
),
hold AS (
  SELECT vec_id AS n, label AS true_label
  FROM embeddings WHERE vec_id % {_LP_HOLD_MOD} = 0
),
v1 AS (
  SELECT e.n, l.label, CAST(count(*) AS BIGINT) AS cnt
  FROM edges e JOIN lab0 l USING (m)
  WHERE e.n IN (SELECT n FROM hold)
  GROUP BY e.n, l.label
),
p1 AS (
  SELECT n, label AS pred FROM (
    SELECT n, label,
           row_number() OVER (PARTITION BY n ORDER BY cnt DESC, label) AS rk
    FROM v1
  ) WHERE rk = 1
),
lab1 AS (
  SELECT m, label FROM lab0
  UNION ALL SELECT n AS m, pred AS label FROM p1
),
v2 AS (
  SELECT e.n, l.label, CAST(count(*) AS BIGINT) AS cnt
  FROM edges e JOIN lab1 l USING (m)
  WHERE e.n IN (SELECT n FROM hold) AND e.n NOT IN (SELECT n FROM p1)
  GROUP BY e.n, l.label
),
p2 AS (
  SELECT n, label AS pred FROM (
    SELECT n, label,
           row_number() OVER (PARTITION BY n ORDER BY cnt DESC, label) AS rk
    FROM v2
  ) WHERE rk = 1
)
SELECT h.n AS vec_id, h.true_label,
       CAST(coalesce(p1.pred, p2.pred, -1) AS INT) AS pred_label,
       CAST(CASE WHEN p1.n IS NOT NULL THEN 1
                 WHEN p2.n IS NOT NULL THEN 2 ELSE 0 END AS INT) AS src_round,
       CAST(coalesce(p1.pred, p2.pred, -999) = h.true_label AS INT) AS correct
FROM hold h
LEFT JOIN p1 ON h.n = p1.n
LEFT JOIN p2 ON h.n = p2.n
"""


def _lp_argmax(votes: DataFrame) -> DataFrame:
    rk = F.row_number().over(
        W.partitionBy("n").orderBy(F.col("cnt").desc(), "label")
    )
    return (
        votes.withColumn("rk", rk)
        .filter(F.col("rk") == 1)
        .select("n", F.col("label").alias("pred"))
    )


def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised label propagation (hard-label Zhu & Ghahramani):
    hide 20% of labels (vec_id % 5 = 0), then two voting rounds over the
    mutual k-NN graph of [[q_knn_graph]] — each holdout node takes the
    majority label among its LABELED neighbors (ties to the smallest
    label), and round-1 winners vote in round 2. The weak-supervision
    primitive for stretching a small labeled pool across a large corpus;
    emits per-node prediction, resolving round, and correctness against
    the hidden truth. The k-NN substrate is label-BLIND (k-means-cell
    candidate blocking), so no ground truth leaks into the graph.

    Scale: the expensive part is the k-NN graph, already cell-blocked;
    each round is one edge-to-labels hash join + one (node,label) count
    + a k-bounded argmax window (neighbor lists are <= k=5, so vote
    groups never exceed 5 labels). Rounds are data-independent plans —
    unrolled twice here; production would loop with localCheckpoint
    exactly like [[q_dbscan_clusters]]."""
    emb = load_table(spark, sf_dir, "embeddings")
    knn = q_knn_graph(spark, sf_dir).select("v1", "v2")
    edges = (
        knn.union(knn.select(F.col("v2"), F.col("v1")))
        .toDF("n", "m")
        .localCheckpoint(eager=True)
    )
    lab0 = emb.filter(F.col("vec_id") % _LP_HOLD_MOD != 0).select(
        F.col("vec_id").alias("m"), "label"
    )
    hold = emb.filter(F.col("vec_id") % _LP_HOLD_MOD == 0).select(
        F.col("vec_id").alias("n"), F.col("label").alias("true_label")
    )
    held_edges = edges.join(hold.select("n"), "n")
    v1 = (
        held_edges.join(lab0, "m")
        .groupBy("n", "label")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    p1 = _lp_argmax(v1).localCheckpoint(eager=True)
    lab1 = lab0.unionByName(
        p1.select(F.col("n").alias("m"), F.col("pred").alias("label"))
    )
    v2 = (
        held_edges.join(p1.select("n"), "n", "left_anti")
        .join(lab1, "m")
        .groupBy("n", "label")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    p2 = _lp_argmax(v2)
    return (
        hold.join(p1.withColumnRenamed("pred", "pr1"), "n", "left")
        .join(p2.withColumnRenamed("pred", "pr2"), "n", "left")
        .select(
            F.col("n").alias("vec_id"),
            "true_label",
            F.coalesce("pr1", "pr2", F.lit(-1)).cast("int").alias(
                "pred_label"
            ),
            F.when(F.col("pr1").isNotNull(), 1)
            .when(F.col("pr2").isNotNull(), 2)
            .otherwise(0)
            .cast("int")
            .alias("src_round"),
            (
                F.coalesce("pr1", "pr2", F.lit(-999))
                == F.col("true_label")
            )
            .cast("int")
            .alias("correct"),
        )
    )


QUERIES["q_label_propagation"] = q_label_propagation
ORACLES["q_label_propagation"] = LABELPROP_ORACLE


# ---------------------------------------------------------------------------
# Matryoshka truncation eval: does a 16-d prefix of the 64-d embedding
# retrieve the same neighbors?
# ---------------------------------------------------------------------------

_MAT_DIM = 16

_TRUNC_DOT_SQL = (
    f"list_sum(list_transform(range(1, {_MAT_DIM + 1}), "
    "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))"
)
_TRUNC_NORM_SQL = (
    f"list_sum(list_transform(range(1, {_MAT_DIM + 1}), "
    "i -> CAST({t}.embedding[i] AS DOUBLE) * CAST({t}.embedding[i] AS DOUBLE)))"
)
_TRUNC_COS_SQL = (
    f"{_TRUNC_DOT_SQL} / sqrt(({_TRUNC_NORM_SQL.format(t='a')})"
    f" * ({_TRUNC_NORM_SQL.format(t='b')}))"
)

MATRYOSHKA_ORACLE = f"""
WITH fullk AS (
  SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
         row_number() OVER (
           PARTITION BY a.vec_id ORDER BY {_COS_SQL} DESC, b.vec_id
         ) AS rk
  FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
  WHERE a.{_QUERY_PRED}
), trunck AS (
  SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
         row_number() OVER (
           PARTITION BY a.vec_id ORDER BY {_TRUNC_COS_SQL} DESC, b.vec_id
         ) AS rk
  FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
  WHERE a.{_QUERY_PRED}
), hits AS (
  SELECT f.query_id, CAST(count(t.cand_id) AS BIGINT) AS n_overlap
  FROM (SELECT * FROM fullk WHERE rk <= 5) f
  LEFT JOIN (SELECT * FROM trunck WHERE rk <= 5) t
    ON t.query_id = f.query_id AND t.cand_id = f.cand_id
  GROUP BY f.query_id
)
SELECT query_id, n_overlap,
       round(n_overlap / 5.0, 6) AS overlap_at_5,
       round(sum(n_overlap) OVER () / (5.0 * count(*) OVER ()), 6)
         AS macro_overlap
FROM hits
"""


def _matryoshka_overlap(
    spark: SparkSession, sf_dir: str, query_cap: int | None
) -> DataFrame:
    """Shared plan for [[q_matryoshka_recall]] (probe set: every 100th
    vector, q ∝ n) and [[q_matryoshka_recall_capped]] (fixed md5-ordered
    budget of `query_cap` probes, q = O(1))."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.expr(_QUERY_PRED))
    if query_cap is not None:
        # deterministic fixed budget — the same md5-order LIMIT rule as
        # the PQ/k-means seed picks, so any engine reproduces the sample
        probes = probes.orderBy(
            F.md5(F.col("vec_id").cast("string")), "vec_id"
        ).limit(query_cap)
    q = probes.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("e1"),
        F.slice(F.col("embedding"), 1, _MAT_DIM).alias("t1"),
    )
    c = emb.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("e2"),
        F.slice(F.col("embedding"), 1, _MAT_DIM).alias("t2"),
    )
    joined = F.broadcast(q).join(c, F.col("cand_id") != F.col("query_id"))
    wf = W.partitionBy("query_id").orderBy(
        _cosine("e1", "e2").desc(), F.col("cand_id")
    )
    wt = W.partitionBy("query_id").orderBy(
        _cosine("t1", "t2").desc(), F.col("cand_id")
    )
    fullk = (
        joined.withColumn("rk", F.row_number().over(wf))
        .filter(F.col("rk") <= 5)
        .select("query_id", "cand_id")
    )
    trunck = (
        joined.withColumn("rk", F.row_number().over(wt))
        .filter(F.col("rk") <= 5)
        .select(
            F.col("query_id").alias("tq"), F.col("cand_id").alias("tc")
        )
    )
    hits = (
        fullk.join(
            trunck,
            (fullk.query_id == trunck.tq) & (fullk.cand_id == trunck.tc),
            "left",
        )
        .groupBy("query_id")
        .agg(F.count("tc").alias("n_overlap"))
    )
    wg = W.partitionBy()
    return hits.select(
        "query_id",
        "n_overlap",
        F.round(F.col("n_overlap") / 5.0, 6).alias("overlap_at_5"),
        F.round(
            F.sum("n_overlap").over(wg) / (5.0 * F.count(F.lit(1)).over(wg)), 6
        ).alias("macro_overlap"),
    )


@query("q_matryoshka_recall", MATRYOSHKA_ORACLE)
def q_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation eval (Kusupati et al. 2022): retrieve top-5
    by cosine over only the FIRST {_MAT_DIM} of 64 dimensions and measure
    per-query overlap with the full-dimension top-5 — the quality gate
    run before shipping truncated embeddings (4× less storage/bandwidth,
    cf. [[q_jl_projection]] which reduces by random projection instead of
    prefix truncation; this measures what that buys back in retrieval).

    Scale: both retrievals are the bounded broadcast-probe scans of
    [[ann_bruteforce_topk]] (probe set: every 100th vector); the overlap
    join touches k × queries rows and the macro average is an integer-sum
    window over that tiny frame. The probe COUNT grows with the corpus
    (q ∝ n), so the exact eval reads O(q·n) = O(n²/100) total — this is
    the deliberately-exact baseline; the fixed-budget scale path is
    [[q_matryoshka_recall_capped]]."""
    return _matryoshka_overlap(spark, sf_dir, query_cap=None)


_MAT_CAP = 256


def _matryoshka_capped_oracle(cap: int) -> str:
    """Oracle for a given probe budget — tests pin the cap-ENGAGED path
    with a small budget at sf0.1 (the registered {_MAT_CAP} only engages
    past n = 100·cap)."""
    return f"""
WITH probe AS (
  SELECT vec_id FROM embeddings WHERE {_QUERY_PRED}
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {cap}
), fullk AS (
  SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
         row_number() OVER (
           PARTITION BY a.vec_id ORDER BY {_COS_SQL} DESC, b.vec_id
         ) AS rk
  FROM (SELECT e.* FROM embeddings e JOIN probe p ON p.vec_id = e.vec_id) a
  JOIN embeddings b ON b.vec_id <> a.vec_id
), trunck AS (
  SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
         row_number() OVER (
           PARTITION BY a.vec_id ORDER BY {_TRUNC_COS_SQL} DESC, b.vec_id
         ) AS rk
  FROM (SELECT e.* FROM embeddings e JOIN probe p ON p.vec_id = e.vec_id) a
  JOIN embeddings b ON b.vec_id <> a.vec_id
), hits AS (
  SELECT f.query_id, CAST(count(t.cand_id) AS BIGINT) AS n_overlap
  FROM (SELECT * FROM fullk WHERE rk <= 5) f
  LEFT JOIN (SELECT * FROM trunck WHERE rk <= 5) t
    ON t.query_id = f.query_id AND t.cand_id = f.cand_id
  GROUP BY f.query_id
)
SELECT query_id, n_overlap,
       round(n_overlap / 5.0, 6) AS overlap_at_5,
       round(sum(n_overlap) OVER () / (5.0 * count(*) OVER ()), 6)
         AS macro_overlap
FROM hits
"""


MATRYOSHKA_CAPPED_ORACLE = _matryoshka_capped_oracle(_MAT_CAP)


@query("q_matryoshka_recall_capped", MATRYOSHKA_CAPPED_ORACLE)
def q_matryoshka_recall_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIXED-BUDGET companion to [[q_matryoshka_recall]] (VERDICT r7
    item 6, the [[dedup_embedding_cosine_banded]] pattern): the exact
    eval's probe set is every 100th vector, so q ∝ n and the eval reads
    O(n²/100) — 170.7 s at ×64 and quadrupling per step (SCALE.md r7),
    the slowest member of the exact-eval family. Statistical quality
    gates don't need the probe count to track the corpus: a fixed sample
    estimates macro overlap with the same confidence interval at every
    scale. This companion caps the probe set at {_MAT_CAP} queries chosen
    by the md5-order LIMIT rule (deterministic, engine-reproducible — the
    PQ/k-means seed pick), making the whole eval O({_MAT_CAP}·n) = O(n).

    At the checked-in SFs the probe pool (n/100 ≤ 20) is under the cap,
    so output ≡ the exact baseline and the hash gate pins the LIMIT
    plumbing; the cap engages from n > {_MAT_CAP * 100} (×16 on the sf0.1
    fixture), where tests/test_matryoshka_capped.py pins cap-engaged
    parity against the DuckDB oracle at a test-sized budget."""
    return _matryoshka_overlap(spark, sf_dir, query_cap=_MAT_CAP)


# ---------------------------------------------------------------------------
# MRR: reciprocal-rank relevance eval of the LSH index against labels.
# ---------------------------------------------------------------------------

MRR_ORACLE = f"""
WITH lsh AS ({LSH_ORACLE}),
lab AS (
  SELECT l.query_id, l.cand_id, l.rk,
         CAST(qe.label = ce.label AS INTEGER) AS relevant
  FROM lsh l
  JOIN embeddings qe ON qe.vec_id = l.query_id
  JOIN embeddings ce ON ce.vec_id = l.cand_id
),
firsts AS (
  SELECT query_id,
         CAST(coalesce(min(CASE WHEN relevant = 1 THEN rk END), 0) AS INT)
           AS first_rel_rank
  FROM lab GROUP BY query_id
)
SELECT query_id, first_rel_rank,
       round(CASE WHEN first_rel_rank > 0
                  THEN 1.0 / first_rel_rank ELSE 0.0 END, 6)
         AS reciprocal_rank,
       round(sum(CASE WHEN first_rel_rank > 0
                      THEN 1.0 / first_rel_rank ELSE 0.0 END) OVER ()
             / count(*) OVER (), 6) AS macro_mrr
FROM firsts
"""


@query("q_retrieval_mrr", MRR_ORACLE)
def q_retrieval_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean Reciprocal Rank of the LSH index ([[ann_lsh_hyperplane]])
    against label relevance: for each probe, 1/rank of the first
    retrieved neighbor sharing the probe's label — the position-weighted
    IR metric that complements [[ann_recall_eval]] (recall counts hits
    anywhere in the top-k; MRR rewards putting a relevant one FIRST,
    which is what a RAG context window actually consumes).

    Scale: retrieval is the bounded bucket-probe plan; the label join is
    on (probe ∪ candidate) ids — k×queries rows — and the macro window
    runs over the probe frame. Relevance here is the label column; swap
    in a qrels table and the plan is unchanged."""
    lsh = ann_lsh_hyperplane(spark, sf_dir).select("query_id", "cand_id", "rk")
    emb = load_table(spark, sf_dir, "embeddings")
    ql = emb.select(F.col("vec_id").alias("query_id"), F.col("label").alias("qlab"))
    cl = emb.select(F.col("vec_id").alias("cand_id"), F.col("label").alias("clab"))
    lab = lsh.join(ql, "query_id").join(cl, "cand_id")
    firsts = lab.groupBy("query_id").agg(
        F.coalesce(
            F.min(F.when(F.col("qlab") == F.col("clab"), F.col("rk"))),
            F.lit(0),
        )
        .cast("int")
        .alias("first_rel_rank")
    )
    rr = F.when(
        F.col("first_rel_rank") > 0, 1.0 / F.col("first_rel_rank")
    ).otherwise(0.0)
    wg = W.partitionBy()
    return firsts.select(
        "query_id",
        "first_rel_rank",
        F.round(rr, 6).alias("reciprocal_rank"),
        F.round(F.sum(rr).over(wg) / F.count(F.lit(1)).over(wg), 6).alias(
            "macro_mrr"
        ),
    )


# ---------------------------------------------------------------------------
# Clustering quality eval: purity + NMI of k-means cells vs labels.
# ---------------------------------------------------------------------------

PURITY_ORACLE = f"""
WITH assign AS ({KMEANS_ORACLE}),
cells AS (
  SELECT a.cluster_id, e.label, CAST(count(*) AS BIGINT) AS n_cl
  FROM assign a JOIN embeddings e ON e.vec_id = a.vec_id
  GROUP BY a.cluster_id, e.label
), margins AS (
  SELECT cluster_id, label, n_cl,
         sum(n_cl) OVER (PARTITION BY cluster_id) AS n_c,
         sum(n_cl) OVER (PARTITION BY label) AS n_l,
         sum(n_cl) OVER () AS n
  FROM cells
), mi AS (
  SELECT sum(round((CAST(n_cl AS DOUBLE) / n)
        * ln(CAST(n_cl AS DOUBLE) * n / (CAST(n_c AS DOUBLE) * n_l)), 9))
        AS mi_nats
  FROM margins
), hc AS (
  SELECT -sum(round((CAST(n_c AS DOUBLE) / n) * ln(CAST(n_c AS DOUBLE) / n), 9))
           AS h
  FROM (SELECT DISTINCT cluster_id, n_c, n FROM margins)
), hl AS (
  SELECT -sum(round((CAST(n_l AS DOUBLE) / n) * ln(CAST(n_l AS DOUBLE) / n), 9))
           AS h
  FROM (SELECT DISTINCT label, n_l, n FROM margins)
), best AS (
  SELECT cluster_id, label AS majority_label, n_cl AS n_major, n_c, n
  FROM (
    SELECT *, row_number() OVER (
      PARTITION BY cluster_id ORDER BY n_cl DESC, label) AS rk
    FROM margins
  ) WHERE rk = 1
), tot AS (
  SELECT CAST(sum(n_major) AS BIGINT) AS sum_major, max(n) AS n FROM best
)
SELECT b.cluster_id, CAST(b.n_c AS BIGINT) AS cluster_n, b.majority_label,
       round(CAST(b.n_major AS DOUBLE) / b.n_c, 6) AS cluster_purity,
       round(CAST(t.sum_major AS DOUBLE) / t.n, 6) AS overall_purity,
       round(mi.mi_nats / sqrt(hc.h * hl.h), 6) AS nmi
FROM best b CROSS JOIN tot t CROSS JOIN mi CROSS JOIN hc CROSS JOIN hl
"""


@query("q_cluster_purity", PURITY_ORACLE)
def q_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering quality eval: purity and normalized mutual information
    of the k-means cell assignment ([[ann_kmeans_assign]]) against the
    label column — the external-validity check run before trusting cells
    for [[semdedup_survivors]] pruning or IVF routing (high NMI = cells
    track semantics; purity ≈ label prior = the quantizer learned
    nothing). Per-cell purity rows plus the corpus-level purity and NMI
    (MI over sqrt(H_cluster·H_label), the [[q_mutual_information]]
    machinery) on every row.

    Scale: assignment is the bounded broadcast-seed scan; everything
    here lives on the cells × labels contingency table (k·|labels| rows)
    — margins, entropies, argmax, all windows over that bounded frame."""
    assign = ann_kmeans_assign(spark, sf_dir).select("vec_id", "cluster_id")
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    # The contingency table is k·|labels| rows and feeds six consumers
    # (MI, both entropies, majority rows, totals). The static plan shows
    # the assignment subtree six times, but AQE stage reuse collapses
    # the duplicates at runtime (executed-plan audit,
    # tools/exchange_audit.py) — an eager checkpoint here measured a
    # wash-to-slower (1.4 → 1.7s warm at sf0.1), so the frame stays
    # lazy and reuse carries the dedup.
    cells = (
        assign.join(emb, "vec_id")
        .groupBy("cluster_id", "label")
        .agg(F.count(F.lit(1)).alias("n_cl"))
    )
    margins = cells.select(
        "cluster_id",
        "label",
        "n_cl",
        F.sum("n_cl").over(W.partitionBy("cluster_id")).alias("n_c"),
        F.sum("n_cl").over(W.partitionBy("label")).alias("n_l"),
        F.sum("n_cl").over(W.partitionBy()).alias("n"),
    )
    mi_term = F.round(
        (F.col("n_cl").cast("double") / F.col("n"))
        * F.log(
            F.col("n_cl").cast("double")
            * F.col("n")
            / (F.col("n_c").cast("double") * F.col("n_l"))
        ),
        9,
    )
    mi = margins.agg(F.sum(mi_term).alias("mi_nats"))
    hc = (
        margins.select("cluster_id", "n_c", "n")
        .distinct()
        .agg(
            (-F.sum(
                F.round(
                    (F.col("n_c").cast("double") / F.col("n"))
                    * F.log(F.col("n_c").cast("double") / F.col("n")),
                    9,
                )
            )).alias("h_c")
        )
    )
    hl = (
        margins.select("label", "n_l", "n")
        .distinct()
        .agg(
            (-F.sum(
                F.round(
                    (F.col("n_l").cast("double") / F.col("n"))
                    * F.log(F.col("n_l").cast("double") / F.col("n")),
                    9,
                )
            )).alias("h_l")
        )
    )
    rk = F.row_number().over(
        W.partitionBy("cluster_id").orderBy(F.col("n_cl").desc(), "label")
    )
    best = (
        margins.withColumn("rk", rk)
        .filter(F.col("rk") == 1)
        .select(
            "cluster_id",
            F.col("label").alias("majority_label"),
            F.col("n_cl").alias("n_major"),
            "n_c",
            "n",
        )
    )
    tot = best.agg(
        F.sum("n_major").alias("sum_major"), F.max("n").alias("n_tot")
    )
    return (
        best.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(mi))
        .crossJoin(F.broadcast(hc))
        .crossJoin(F.broadcast(hl))
        .select(
            "cluster_id",
            F.col("n_c").cast("long").alias("cluster_n"),
            "majority_label",
            F.round(F.col("n_major").cast("double") / F.col("n_c"), 6).alias(
                "cluster_purity"
            ),
            F.round(
                F.col("sum_major").cast("double") / F.col("n_tot"), 6
            ).alias("overall_purity"),
            F.round(
                F.col("mi_nats") / F.sqrt(F.col("h_c") * F.col("h_l")), 6
            ).alias("nmi"),
        )
    )


# ---------------------------------------------------------------------------
# Simplified silhouette — internal clustering validity at O(n·k).
# ---------------------------------------------------------------------------

SILHOUETTE_ORACLE = f"""
WITH seeds AS (
  SELECT vec_id AS cluster_id, embedding AS ce
  FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT greatest(8, CAST(ceil(sqrt(CAST((SELECT count(*) FROM embeddings) AS DOUBLE)) / 6.0) AS BIGINT))
), scored AS (
  SELECT e.vec_id, s.cluster_id, round({_D2_SQL}, 6) AS d2
  FROM embeddings e CROSS JOIN seeds s
), ranked AS (
  SELECT vec_id, cluster_id, d2,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster_id) AS rk,
         lead(d2) OVER (PARTITION BY vec_id ORDER BY d2, cluster_id) AS d2_next
  FROM scored
), sil AS (
  SELECT vec_id, cluster_id,
         CASE WHEN greatest(sqrt(d2), sqrt(d2_next)) = 0 THEN 0.0
              ELSE (sqrt(d2_next) - sqrt(d2)) / greatest(sqrt(d2), sqrt(d2_next))
         END AS s
  FROM ranked WHERE rk = 1
), micro AS (
  SELECT cluster_id, CAST(round(s * 1e6, 0) AS BIGINT) AS s_micro FROM sil
)
SELECT cluster_id,
       CAST(count(*) AS BIGINT) AS n_points,
       round(CAST(sum(s_micro) AS DOUBLE) / (count(*) * 1e6), 6) AS mean_silhouette
FROM micro GROUP BY cluster_id
"""


@query("q_simplified_silhouette", SILHOUETTE_ORACLE)
def q_simplified_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified (centroid-based) silhouette of the k-means layout that
    [[ann_kmeans_assign]] produces: per point, a = distance to its own
    centroid, b = distance to the nearest OTHER centroid, s = (b−a)/
    max(a,b); reported as per-cluster mean + size. The classic
    silhouette is O(n²) pairwise; the simplified form replaces
    neighbor-cluster mean distance with centroid distance, giving the
    same diagnostic (which cells are tight vs smeared, which should be
    split before they bloat an IVF probe) at O(n·k) — the only form
    that survives 100 TB. Complements [[q_cluster_purity]], which needs
    labels; silhouette is label-free.

    Scale: one narrow distance scan (k·dim flops per row); r9: the seeds
    are inlined as literals (_seed_d2_structs) so the smallest and
    second-smallest (d2, cluster_id) pairs per vector come from a
    per-row slice(array_sort(...), 1, 2) — the same (d2, cluster_id)
    lexicographic order as the former rank window's ORDER BY, so rk=1
    and lead(d2) fall out of slots 0 and 1 identically — with zero
    joins, zero exchanges before the final map-side-combinable
    groupBy(cluster). Per-point scores are rounded to integer
    micro-units before summation so the per-cluster mean is
    partition-order independent."""
    emb = load_table(spark, sf_dir, "embeddings")
    structs = _seed_d2_structs(emb)
    if structs is not None:
        t2 = F.slice(F.array_sort(F.array(*structs)), 1, 2)
        ranked = emb.select(
            "vec_id",
            t2[0]["cluster_id"].alias("cluster_id"),
            t2[0]["d2"].alias("d2"),
            t2[1]["d2"].alias("d2_next"),
        )
    else:
        seeds = _md5_seeds(emb)
        diffs = F.zip_with(
            F.transform(F.col("embedding"), lambda x: x.cast("double")),
            F.transform(F.col("ce"), lambda x: x.cast("double")),
            lambda x, y: (x - y) * (x - y),
        )
        d2 = F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)
        scored = emb.crossJoin(F.broadcast(seeds)).select(
            "vec_id", "cluster_id", F.round(d2, 6).alias("d2")
        )
        two = scored.groupBy("vec_id").agg(
            F.slice(
                F.array_sort(F.collect_list(F.struct("d2", "cluster_id"))), 1, 2
            ).alias("t2")
        )
        ranked = two.select(
            "vec_id",
            F.col("t2")[0]["cluster_id"].alias("cluster_id"),
            F.col("t2")[0]["d2"].alias("d2"),
            F.col("t2")[1]["d2"].alias("d2_next"),
        )
    a, b = F.sqrt("d2"), F.sqrt("d2_next")
    s = F.when(F.greatest(a, b) == 0, F.lit(0.0)).otherwise(
        (b - a) / F.greatest(a, b)
    )
    micro = ranked.select(
        "cluster_id", F.round(s * 1e6, 0).cast("long").alias("s_micro")
    )
    return micro.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(
            F.sum("s_micro").cast("double") / (F.count(F.lit(1)) * F.lit(1e6)), 6
        ).alias("mean_silhouette"),
    )


# ---------------------------------------------------------------------------
# NDCG@3: graded position-discounted retrieval eval of the LSH index.
# ---------------------------------------------------------------------------

# 1e9-scaled discount table 1/log2(rank+1) and its prefix sums, shared as
# integer LITERALS by both engines so no libm log2 ever runs in-plan:
# every DCG is an exact int64 sum and NDCG one audited double division.
_NDCG_D9 = (1_000_000_000, 630_929_754, 500_000_000)
_NDCG_I9 = (0, 1_000_000_000, 1_630_929_754, 2_130_929_754)

NDCG_ORACLE = f"""
WITH lsh AS ({LSH_ORACLE}),
lab AS (
  SELECT l.query_id, l.rk,
         CAST(qe.label = ce.label AS INT) AS rel
  FROM lsh l
  JOIN embeddings qe ON qe.vec_id = l.query_id
  JOIN embeddings ce ON ce.vec_id = l.cand_id
),
lc AS (SELECT label, count(*) AS n_lab FROM embeddings GROUP BY label),
per AS (
  SELECT query_id, CAST(sum(rel) AS INT) AS hits_at_3,
         CAST(sum(rel * CASE rk WHEN 1 THEN {_NDCG_D9[0]}
                                WHEN 2 THEN {_NDCG_D9[1]}
                                ELSE {_NDCG_D9[2]} END) AS BIGINT) AS dcg9
  FROM lab GROUP BY query_id
),
idl AS (
  SELECT p.query_id, p.hits_at_3, p.dcg9,
         CAST(lc.n_lab - 1 AS INT) AS n_rel_total,
         CASE least(lc.n_lab - 1, 3)
           WHEN 0 THEN {_NDCG_I9[0]} WHEN 1 THEN {_NDCG_I9[1]}
           WHEN 2 THEN {_NDCG_I9[2]} ELSE {_NDCG_I9[3]} END AS idcg9
  FROM per p
  JOIN embeddings qe ON qe.vec_id = p.query_id
  JOIN lc ON lc.label = qe.label
),
scored AS (
  SELECT query_id, n_rel_total, hits_at_3,
         CASE WHEN idcg9 > 0
              THEN CAST(round(1000000.0 * dcg9 / idcg9) AS BIGINT)
              ELSE 0 END AS ndcg6
  FROM idl
)
SELECT query_id, n_rel_total, hits_at_3,
       round(ndcg6 / 1000000.0, 6) AS ndcg_at_3,
       round(sum(ndcg6) OVER () / 1000000.0 / count(*) OVER (), 6)
         AS macro_ndcg
FROM scored
"""


@query("q_ndcg_eval", NDCG_ORACLE)
def q_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@3 of the LSH index ([[ann_lsh_hyperplane]]) against label
    relevance — the position-DISCOUNTED retrieval metric completing the
    eval triad: [[ann_recall_eval]] counts hits anywhere in the top-k,
    [[q_retrieval_mrr]] rewards only the FIRST relevant hit, NDCG grades
    the whole ranking with a log2 position discount against the ideal
    ordering (IDCG truncated at min(#relevant-in-corpus, 3)).

    Exactness: the 1/log2(rank+1) discounts and their prefix sums are
    shared 1e9-scaled integer literals (module constants), so each DCG
    is an exact int64 sum — order-free — and NDCG is a single rounded
    double division; the macro average sums the 1e6-scaled integer
    NDCGs, never raw doubles.

    Scale: everything downstream of the bounded bucket-probe retrieval
    lives on k x queries rows plus a |labels|-row broadcast census."""
    lsh = ann_lsh_hyperplane(spark, sf_dir).select("query_id", "cand_id", "rk")
    emb = load_table(spark, sf_dir, "embeddings")
    ql = emb.select(F.col("vec_id").alias("query_id"), F.col("label").alias("qlab"))
    cl = emb.select(F.col("vec_id").alias("cand_id"), F.col("label").alias("clab"))
    lc = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n_lab"))

    lab = lsh.join(ql, "query_id").join(cl, "cand_id").select(
        "query_id",
        "qlab",
        "rk",
        (F.col("qlab") == F.col("clab")).cast("int").alias("rel"),
    )
    d9 = (
        F.when(F.col("rk") == 1, F.lit(_NDCG_D9[0]))
        .when(F.col("rk") == 2, F.lit(_NDCG_D9[1]))
        .otherwise(F.lit(_NDCG_D9[2]))
    )
    per = lab.groupBy("query_id", "qlab").agg(
        F.sum("rel").cast("int").alias("hits_at_3"),
        F.sum(F.col("rel") * d9).cast("bigint").alias("dcg9"),
    )
    idl = per.join(F.broadcast(lc), per.qlab == lc.label).select(
        "query_id",
        "hits_at_3",
        "dcg9",
        (F.col("n_lab") - 1).cast("int").alias("n_rel_total"),
        F.element_at(
            F.array(*[F.lit(x) for x in _NDCG_I9]),
            F.least(F.col("n_lab") - 1, F.lit(3)).cast("int") + 1,
        ).alias("idcg9"),
    )
    ndcg6 = F.when(
        F.col("idcg9") > 0,
        F.round(F.lit(1000000.0) * F.col("dcg9") / F.col("idcg9")).cast("bigint"),
    ).otherwise(F.lit(0).cast("bigint"))
    scored = idl.select("query_id", "n_rel_total", "hits_at_3", ndcg6.alias("ndcg6"))
    wg = W.partitionBy()
    return scored.select(
        "query_id",
        "n_rel_total",
        "hits_at_3",
        F.round(F.col("ndcg6") / 1000000.0, 6).alias("ndcg_at_3"),
        F.round(
            F.sum("ndcg6").over(wg) / 1000000.0 / F.count(F.lit(1)).over(wg), 6
        ).alias("macro_ndcg"),
    )


# ---------------------------------------------------------------------------
# Embedding-table ingest audit: norms, zero vectors, dimension/NaN defects.
# ---------------------------------------------------------------------------

EMB_AUDIT_ORACLE = """
WITH per AS (
  SELECT label,
         len(embedding) AS dim,
         length(list_filter(embedding, x -> isnan(CAST(x AS DOUBLE)))) AS n_nan,
         list_sum(list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)
              * CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))) AS norm2u
  FROM embeddings
)
SELECT label,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(CASE WHEN dim <> 64 THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_dim,
       CAST(sum(CASE WHEN n_nan > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nan_vecs,
       CAST(sum(CASE WHEN norm2u = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_vecs,
       round(min(norm2u) / 1000000.0, 6) AS min_norm2,
       round(max(norm2u) / 1000000.0, 6) AS max_norm2,
       round(CAST(sum(norm2u) AS DOUBLE) / count(*) / 1000000.0, 6) AS mean_norm2
FROM per
GROUP BY label
"""


@query("q_embedding_norm_audit", EMB_AUDIT_ORACLE)
def q_embedding_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-table ingest gate: per label, the defect census a
    100 TB vector pipeline runs before building ANY index — wrong
    dimension, NaN components, all-zero vectors (cosine is undefined on
    them: [[dedup_embedding_cosine]] and every ANN query here divides by
    the norm) — plus the squared-norm spread, the drift signal that
    catches an unnormalized-model deploy. The relational twin of
    [[q_profile_columns]] for the vector column.

    Exactness: norms are summed in milli-unit integers (round(x*1000)^2
    per component, exact int64 both engines — floats never add in
    floating point), so min/max/mean are audited integer folds with one
    final double division.

    Scale: a stateless per-row array fold at scan speed, then one
    map-side-combinable aggregate over |labels| groups; no shuffle of
    vector data, no window."""
    emb = load_table(spark, sf_dir, "embeddings")
    m = lambda x: F.round(x.cast("double") * 1000).cast("long")  # noqa: E731
    per = emb.select(
        "label",
        F.size("embedding").alias("dim"),
        F.size(
            F.filter("embedding", lambda x: F.isnan(x.cast("double")))
        ).alias("n_nan"),
        F.aggregate(
            F.transform("embedding", lambda x: m(x) * m(x)),
            F.lit(0).cast("long"),
            lambda acc, el: acc + el,
        ).alias("norm2u"),
    )
    return per.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum((F.col("dim") != 64).cast("int")).alias("n_bad_dim"),
        F.sum((F.col("n_nan") > 0).cast("int")).alias("n_nan_vecs"),
        F.sum((F.col("norm2u") == 0).cast("int")).alias("n_zero_vecs"),
        F.round(F.min("norm2u") / 1000000.0, 6).alias("min_norm2"),
        F.round(F.max("norm2u") / 1000000.0, 6).alias("max_norm2"),
        F.round(
            F.sum("norm2u").cast("double") / F.count(F.lit(1)) / 1000000.0, 6
        ).alias("mean_norm2"),
    )


# ---------------------------------------------------------------------------
# Embedding per-dimension variance audit (dead/degenerate dims).
# ---------------------------------------------------------------------------

_DIMVAR_DEAD = 0.01  # variance below 1% of the mean dim variance = dead

DIMVAR_ORACLE = f"""
WITH comp AS (
  SELECT r.i - 1 AS dim,
         CAST(round(CAST(e.embedding[r.i] AS DOUBLE) * 1000) AS BIGINT) AS m
  FROM embeddings e,
       unnest(range(1, len(e.embedding) + 1)) AS r(i)
), mom AS (
  SELECT dim, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(m) AS HUGEINT) AS s1,
         sum(CAST(m AS HUGEINT) * m) AS s2
  FROM comp GROUP BY dim
), v AS (
  SELECT CAST(dim AS INT) AS dim, n,
         (CAST(s2 AS DOUBLE) / n
          - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)) / 1000000.0
           AS var_,
         CAST(s1 AS DOUBLE) / n / 1000.0 AS mean_
  FROM mom
)
SELECT dim,
       round(mean_, 6) AS mean_value,
       round(var_, 6) AS variance,
       CAST(var_ < {_DIMVAR_DEAD} * (SELECT sum(var_) / count(*) FROM v) AS INT)
         AS is_dead
FROM v
"""


@query("q_embedding_dim_variance", DIMVAR_ORACLE)
def q_embedding_dim_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-DIMENSION mean/variance of the embedding table and a dead-dim
    flag (variance under {_DIMVAR_DEAD:.0%} of the average dim variance)
    — the other axis of [[q_embedding_norm_audit]]: a dimension that
    never moves is wasted index width and a symptom of a truncated or
    mis-exported model, and it is what [[q_jl_projection]] /
    [[q_matryoshka_recall]] silently rely on not existing. Milli-integer
    component folds keep the moments exact; the dead cut compares
    against the 64-row variance table's own mean.

    Scale: posexplode inside the scan, one map-side-combinable
    64-group moment aggregate — dimension count, not row count, bounds
    everything after the scan."""
    emb = load_table(spark, sf_dir, "embeddings")
    comp = emb.select(
        F.posexplode("embedding").alias("dim", "x")
    ).select(
        "dim", F.round(F.col("x").cast("double") * 1000).cast("long").alias("m")
    )
    mom = comp.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("m").cast("decimal(38,0)").alias("s1"),
        F.sum(F.col("m").cast("decimal(19,0)") * F.col("m")).alias("s2"),
    )
    mu = F.col("s1").cast("double") / F.col("n")
    var_ = (F.col("s2").cast("double") / F.col("n") - mu * mu) / 1000000.0
    v = mom.select(
        F.col("dim").cast("int").alias("dim"),
        (mu / 1000.0).alias("mean_"),
        var_.alias("var_"),
    )
    wg = W.partitionBy()
    return v.select(
        "dim",
        F.round("mean_", 6).alias("mean_value"),
        F.round("var_", 6).alias("variance"),
        (
            F.col("var_")
            < F.lit(_DIMVAR_DEAD)
            * (F.sum("var_").over(wg) / F.count(F.lit(1)).over(wg))
        )
        .cast("int")
        .alias("is_dead"),
    )


# ---------------------------------------------------------------------------
# Cross-modal: text-quality profile of each embedding cluster.
# ---------------------------------------------------------------------------

CLUSTER_QUALITY_ORACLE = f"""
WITH assign AS ({KMEANS_ORACLE}),
j AS (
  SELECT a.cluster_id, d.lang, d.source, d.n_chars
  FROM assign a JOIN documents d ON d.doc_id = a.vec_id
), lang_counts AS (
  SELECT cluster_id, lang, CAST(count(*) AS BIGINT) AS n_l
  FROM j GROUP BY cluster_id, lang
), major AS (
  SELECT cluster_id, lang AS majority_lang, n_l AS n_major
  FROM (
    SELECT *, row_number() OVER (
      PARTITION BY cluster_id ORDER BY n_l DESC, lang) AS rk
    FROM lang_counts
  ) WHERE rk = 1
), base AS (
  SELECT cluster_id,
         CAST(count(*) AS BIGINT) AS n_docs,
         round(CAST(sum(n_chars) AS BIGINT) / CAST(count(*) AS DOUBLE), 4)
           AS mean_chars,
         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         CAST(count(DISTINCT source) AS BIGINT) AS n_sources
  FROM j GROUP BY cluster_id
)
SELECT b.cluster_id, b.n_docs, b.mean_chars, b.n_langs, b.n_sources,
       m.majority_lang,
       round(CAST(m.n_major AS DOUBLE) / b.n_docs, 6) AS majority_lang_share
FROM base b JOIN major m USING (cluster_id)
"""


@query("q_cluster_quality_profile", CLUSTER_QUALITY_ORACLE)
def q_cluster_quality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal audit: join the k-means cell assignment
    ([[ann_kmeans_assign]], vec_id ≡ doc_id in this corpus) back to the
    DOCUMENT table and profile each cell's text — size, mean length,
    language/source diversity, majority language and its share. This is
    the is-my-vector-space-capturing-text-properties diagnostic: cells
    that mix languages at random say the embeddings ignore language,
    and a cell dominated by one source is crawl bias showing up as
    geometry ([[q_cluster_purity]] scores the same question against
    labels; this explains it against observable text columns).

    Scale: the assignment's bounded broadcast-seed scan, one doc-keyed
    equi-join (dimension tables co-partition on the shared id), then
    everything lives on the k x |langs| census."""
    assign = ann_kmeans_assign(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"), "cluster_id"
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    j = assign.join(docs, "doc_id")
    lang_counts = j.groupBy("cluster_id", "lang").agg(
        F.count(F.lit(1)).alias("n_l")
    )
    wl = W.partitionBy("cluster_id").orderBy(F.desc("n_l"), F.asc("lang"))
    major = (
        lang_counts.withColumn("rk", F.row_number().over(wl))
        .filter(F.col("rk") == 1)
        .select(
            "cluster_id", F.col("lang").alias("majority_lang"),
            F.col("n_l").alias("n_major"),
        )
    )
    base = j.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(
            F.sum("n_chars") / F.count(F.lit(1)).cast("double"), 4
        ).alias("mean_chars"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
    )
    return base.join(major, "cluster_id").select(
        "cluster_id",
        "n_docs",
        "mean_chars",
        "n_langs",
        "n_sources",
        "majority_lang",
        F.round(F.col("n_major") / F.col("n_docs").cast("double"), 6).alias(
            "majority_lang_share"
        ),
    )


# ---------------------------------------------------------------------------
# Pairwise-similarity histogram: the embedding-collapse diagnostic.
# ---------------------------------------------------------------------------

# Constant-SIZE probe (VERDICT r4 "What's wrong" #1): take every K-th
# vector with K = ceil(n / _SIMH_TARGET), so |probe| ≈ _SIMH_TARGET and the
# pair space is capped at ~TARGET²/2 REGARDLESS of table size — a
# fixed-rate probe (the old `vec_id % 5`) kept 20% of the table and grew
# the pair join quadratically with n. K is derived inside the plan from a
# 1-row count aggregate (broadcast), deterministic in both engines.
_SIMH_TARGET = 100

SIMHIST_ORACLE = f"""
WITH k AS (
  SELECT GREATEST(1, CAST(ceil(count(*) / {_SIMH_TARGET}.0) AS BIGINT)) AS kk
  FROM embeddings
), probe AS (
  SELECT vec_id, embedding FROM embeddings, k WHERE vec_id % k.kk = 0
), pairs AS (
  SELECT round({_COS_SQL}, 3) AS c
  FROM probe a JOIN probe b ON a.vec_id < b.vec_id
), binned AS (
  SELECT CAST(floor(c * 10) AS INT) AS bin, c FROM pairs
)
SELECT bin,
       round(bin / 10.0, 1) AS bin_lo,
       CAST(count(*) AS BIGINT) AS n_pairs,
       round(count(*) / CAST(sum(count(*)) OVER () AS DOUBLE), 6) AS share,
       round(sum(CAST(round(c * 1000) AS BIGINT)) / 1000.0
             / count(*), 6) AS mean_cos
FROM binned GROUP BY bin
"""


@query("q_embedding_similarity_histogram", SIMHIST_ORACLE)
def q_embedding_similarity_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise-cosine histogram over a deterministic CONSTANT-SIZE probe
    (every K-th vector, K = ceil(n/100)) in 0.1-wide bins — the
    embedding-space HEALTH diagnostic: mass piling up near 1.0 is
    representation collapse (every ANN structure here degrades to a
    scan), mass at 0 with thin tails is healthy spread, and the shape
    calibrates every cosine threshold this engine uses
    ([[dedup_embedding_cosine]]'s τ, [[q_dbscan_clusters]]' ε,
    SemDeDup's prune). Cosines are the same sequential fold both
    engines compute bit-for-bit, rounded to 3dp BEFORE binning so bin
    edges cannot flip; per-bin means fold 1e3-scaled integers.

    Scale: the probe is constant-SIZE, not constant-rate — K scales
    with n so |probe| ≈ 100 and the upper-triangle pair space is capped
    at ~4,950 pairs at ANY table size (the old fixed-rate `% 5` probe
    grew pairs as (n/5)² and the broadcast side with n). K comes from a
    1-row broadcast count aggregate — no driver-side collect — and
    everything after the pair score is a ≤21-row histogram."""
    emb_all = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    k_row = emb_all.agg(
        F.greatest(
            F.lit(1).cast("long"),
            F.ceil(F.count(F.lit(1)) / F.lit(float(_SIMH_TARGET))),
        ).alias("kk")
    )
    emb = (
        emb_all.join(F.broadcast(k_row))
        .filter(F.col("vec_id") % F.col("kk") == 0)
        .select("vec_id", "embedding")
    )
    a = emb.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("e1"))
    b = emb.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("e2"))
    pairs = a.join(b, F.col("ia") < F.col("ib")).select(
        F.round(_cosine("e1", "e2"), 3).alias("c")
    )
    binned = pairs.select(
        F.floor(F.col("c") * 10).cast("int").alias("bin"), "c"
    )
    wg = W.partitionBy()
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.round(F.col("c") * 1000).cast("long")).alias("sc"),
    ).select(
        "bin",
        F.round(F.col("bin") / 10.0, 1).alias("bin_lo"),
        "n_pairs",
        F.round(
            F.col("n_pairs") / F.sum("n_pairs").over(wg).cast("double"), 6
        ).alias("share"),
        F.round(F.col("sc") / 1000.0 / F.col("n_pairs"), 6).alias("mean_cos"),
    )
