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
    """Distinct word n-grams joined with spaces.

    Built O(len) per document: zip the token array with its shifted
    copies and truncate the null-padded tail. (The naive form —
    transform(sequence, i -> slice(tok, i, n)) — is O(len²) because each
    slice copies; it measured 10× slower on real documents.)

    Docs shorter than n tokens yield an empty list; Spark's sequence()
    counts DOWN when start > stop, so the guard is explicit."""
    grams = tok
    for k in range(1, n):
        shifted = F.slice(tok, k + 1, F.greatest(F.size(tok) - k, F.lit(1)))
        grams = F.zip_with(grams, shifted, lambda a, b: F.concat_ws(" ", a, b))
    grams = F.array_distinct(F.slice(grams, 1, F.greatest(F.size(tok) - (n - 1), F.lit(1))))
    return F.when(F.size(tok) >= n, grams).otherwise(F.array().cast("array<string>"))


def shingles_sql(tok_expr: str, n: int = 3) -> str:
    # DuckDB list_slice is 1-based and end-inclusive; range(1, k+1) mirrors
    # Spark's sequence(0, size-n) shifted by one.
    return (
        f"list_distinct(list_transform(range(1, greatest(len({tok_expr}) - {n - 1}, 0) + 1), "
        f"i -> array_to_string(list_slice({tok_expr}, i, i + {n - 1}), ' ')))"
    )
