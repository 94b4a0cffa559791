"""Property tests for the cross-engine hashing bridge.

Every oracle-gated sketch, sample, split, and LSH bucket in this engine
rides on ``md5_long`` (functions/hashing.py) producing the SAME integer in
Spark and DuckDB for the SAME string. That contract is exercised by the
fixtures' ASCII-ish values everywhere, but the 100-TB corpus it is designed
for is arbitrary Unicode — so pin the parity on adversarial text too
(hypothesis shrinks to a counterexample if any encoding path diverges:
Spark md5s its internal UTF8String bytes, DuckDB md5s the VARCHAR's UTF-8
bytes; these must be the same bytes for every code point).
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from debezium_cdc_kafka_spark.functions.hashing import (
    MERSENNE_P,
    md5_long,
    md5_long_sql,
    minhash_perm,
    minhash_perm_sql,
)

# Surrogates are not encodable to UTF-8 (createDataFrame would reject the
# Python str); everything else — including NUL, astral planes, combining
# marks, bidi controls — must round-trip identically through both engines.
_text = st.text(
    alphabet=st.characters(exclude_categories=("Cs",)),
    min_size=0,
    max_size=48,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_text, min_size=1, max_size=24, unique=True))
def test_md5_long_matches_duckdb_on_arbitrary_unicode(spark, values):
    sdf = spark.createDataFrame(
        [(v,) for v in values], "s string"
    ).select("s", md5_long(F.col("s")).alias("h"))
    got = {r["s"]: r["h"] for r in sdf.collect()}

    con = duckdb.connect()
    con.register("t", pd.DataFrame({"s": values}))
    want = dict(
        con.execute(f"SELECT s, {md5_long_sql('s')} FROM t").fetchall()
    )
    assert got == want
    # the 15-hex-char prefix is 60 bits: non-negative and < 2^60 always,
    # so downstream mod-P reductions never see a negative operand
    assert all(0 <= h < 1 << 60 for h in got.values())


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=0, max_value=MERSENNE_P - 1),
       st.integers(min_value=0, max_value=63))
def test_minhash_perm_sql_matches_python_formula(x, i):
    """The SQL rendering and the Column builder share one formula; evaluate
    the SQL text in DuckDB against the same arithmetic in Python ints
    (exact, no overflow: operands stay below 2^62 by the mod-P reduction).
    """
    want = duckdb.sql(
        f"SELECT {minhash_perm_sql(f'CAST({x} AS BIGINT)', i)}"
    ).fetchone()[0]
    from debezium_cdc_kafka_spark.functions import hashing

    a = (1 + i * hashing.A_MUL) % MERSENNE_P
    b = (7 + i * hashing.B_MUL) % MERSENNE_P
    assert (x * a + b) % MERSENNE_P == want


def test_minhash_perm_column_matches_sql_rendering(spark):
    """One Spark evaluation sweep over a grid of (x, i): the Column
    expression and the DuckDB SQL rendering must agree exactly."""
    xs = [0, 1, 7919, 104729, MERSENNE_P - 1]
    df = spark.createDataFrame([(x,) for x in xs], "x long")
    for i in (0, 1, 31, 63):
        got = {
            r["x"]: r["h"]
            for r in df.select(
                "x", minhash_perm(F.col("x"), i).alias("h")
            ).collect()
        }
        for x in xs:
            want = duckdb.sql(
                f"SELECT {minhash_perm_sql(f'CAST({x} AS BIGINT)', i)}"
            ).fetchone()[0]
            assert got[x] == want, (x, i)


def test_seed_count_python_matches_oracle_limit_expression():
    """The quantizer seed count exists in two places that must never
    drift: Python `_seed_count` (drives every Spark-side md5 seed draw)
    and the literal SQL in `_SEEDS_LIMIT_SQL` (drives every oracle's
    LIMIT). Evaluate the SQL arithmetic in DuckDB for a spread of corpus
    sizes — including every checked-in fixture size, the k=8 plateau
    edge (n = 2304 is the last 8; 2305 the first 9), and large n — and
    pin it to the Python formula."""
    import math

    import duckdb

    from debezium_cdc_kafka_spark.operators.similarity import (
        _SEED_SQRT_DIV,
        _SEEDS_LIMIT_SQL,
    )

    con = duckdb.connect()
    for n in [1, 2, 7, 8, 9, 100, 500, 2000, 2303, 2304, 2305, 8000,
              50_000, 1_000_000, 10_000_000_000]:
        sql = _SEEDS_LIMIT_SQL.replace(
            "(SELECT count(*) FROM embeddings)", str(n)
        )
        (sql_k,) = con.sql(f"SELECT {sql}").fetchone()
        py_k = max(8, math.ceil(math.sqrt(n) / _SEED_SQRT_DIV))
        assert sql_k == py_k, (n, sql_k, py_k)
    # the checked-in fixtures (500 / 500 / 2000 vectors) must all sit on
    # the k = 8 plateau so oracle hashes are SF-stable
    for n in (500, 2000):
        assert max(8, math.ceil(math.sqrt(n) / _SEED_SQRT_DIV)) == 8
