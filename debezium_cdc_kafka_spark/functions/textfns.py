"""Text normalization / tokenization expressions shared by the dedup and
text-analysis operators. Pure column algebra (split/transform/sequence) so
the same definitions are renderable as DuckDB SQL for the oracles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"


def tokens(col: Column) -> Column:
    """lower → split on non-alphanumerics → drop empties."""
    return F.filter(F.split(F.lower(col), TOKEN_SPLIT_RE), lambda t: t != "")


def tokens_sql(expr: str) -> str:
    return (
        f"list_filter(regexp_split_to_array(lower({expr}), '{TOKEN_SPLIT_RE}'), t -> t <> '')"
    )


def shingles(tok: Column, n: int = 3) -> Column:
    """Distinct word n-grams joined with spaces. Docs shorter than n tokens
    yield an empty list (Spark's sequence() counts DOWN when start > stop,
    so the short-doc case needs an explicit guard, not a clamp)."""
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(tok) - n),
            lambda i: F.concat_ws(" ", F.slice(tok, i + 1, n)),
        )
    )
    return F.when(F.size(tok) >= n, grams).otherwise(F.array().cast("array<string>"))


def shingles_sql(tok_expr: str, n: int = 3) -> str:
    # DuckDB list_slice is 1-based and end-inclusive; range(1, k+1) mirrors
    # Spark's sequence(0, size-n) shifted by one.
    return (
        f"list_distinct(list_transform(range(1, greatest(len({tok_expr}) - {n - 1}, 0) + 1), "
        f"i -> array_to_string(list_slice({tok_expr}, i, i + {n - 1}), ' ')))"
    )
