"""Cross-engine deterministic hashing for dedup/LSH operators.

Spark's native hash functions (xxhash64, murmur) have no DuckDB
equivalents, so oracle-testable sketches are built from md5 — identical
bytes in every engine — mapped to integers:

    md5_long(x)  =  int64( first 15 hex chars of md5(x) )      (60 bits)

MinHash permutations are the classic universal family
``h_i(x) = (a_i * x + b_i) mod P`` with P = 2^31 - 1 (Mersenne prime).
Inputs are first reduced mod P so every product stays below 2^62 —
important because DuckDB *raises* on BIGINT overflow while Java silently
wraps; keeping the arithmetic overflow-free makes both engines agree.

All of this is plain column algebra — whole-stage-codegen'd in Spark, no
Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_P = 2_147_483_647  # 2^31 - 1

# Deterministic permutation parameters (formula-based so the SQL oracle can
# regenerate them): a must be odd and non-zero mod P.
A_MUL = 104_729  # 10000th prime
B_MUL = 7_919  # 1000th prime


def md5_long(col: Column) -> Column:
    """First 60 bits of md5 as a non-negative BIGINT (same value as
    DuckDB's ``('0x' || substr(md5(x),1,15))::BIGINT``)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def md5_long_sql(expr: str) -> str:
    """DuckDB rendering of md5_long."""
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def minhash_perm(x_mod_p: Column, i: int) -> Column:
    """i-th permutation hash of an already-mod-P value."""
    a = (1 + i * A_MUL) % MERSENNE_P
    b = (7 + i * B_MUL) % MERSENNE_P
    return (x_mod_p * F.lit(a) + F.lit(b)) % F.lit(MERSENNE_P)


def minhash_perm_sql(x_expr: str, i: int) -> str:
    a = (1 + i * A_MUL) % MERSENNE_P
    b = (7 + i * B_MUL) % MERSENNE_P
    return f"(({x_expr}) * {a} + {b}) % {MERSENNE_P}"
