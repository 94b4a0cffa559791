"""Order-independent money aggregation.

A double-precision SUM over millions of rows is order-dependent (parallel
partial sums vs a serial scan differ in the last ulp), and rounding the
result to 2 decimals occasionally lands engines on opposite sides of a
half-cent boundary — a one-cent oracle mismatch that appears and
disappears with the data. The fix is structural, not more rounding:
round each TERM to cents first (deterministic — both engines compute the
identical per-row double), then sum exact 64-bit integers (associative,
any order), then scale back. Used for every large currency sum in the
query surface.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents_sum(expr: Column) -> Column:
    """round(Σ round(expr·100) / 100, 2) with an exact integer Σ."""
    return F.round(F.sum(F.round(expr * 100).cast("long")) / 100.0, 2)


def cents_sum_sql(expr: str) -> str:
    """DuckDB rendering. sum(BIGINT) widens to HUGEINT there — cast back
    before dividing so both engines stay in int64/double."""
    return f"round(CAST(sum(CAST(round(({expr}) * 100) AS BIGINT)) AS BIGINT) / 100.0, 2)"
