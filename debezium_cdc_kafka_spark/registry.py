"""Merged query/oracle registry — the single source for __spark_entry__.py.

Modules register into their own QUERIES/ORACLES dicts; this module unions
them and fails fast on duplicate names or oracle entries without queries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _modules():
    # Explicit list — update as operator modules land. A broken module must
    # fail loudly here, not be skipped.
    from .operators import (
        approx,
        audit,
        corpus,
        asof,
        behavior,
        cdc,
        curation,
        dedup,
        graph,
        incremental,
        layout,
        multimodal,
        partsupp,
        relational,
        relational2,
        relational3,
        reshape,
        similarity,
        stats,
        text,
        timeseries,
        windows,
    )

    # Order matters: the driver's correctness gate records the FIRST 50
    # queries in registry iteration order. Rounds 1–2 gated the relational
    # modules (48 green rows); round 3 rotates the never-gated surface to
    # the front: cdc (10, incl. strict-replay + incremental-merge, the
    # reference's actual semantics) + dedup (10) + similarity (15) +
    # text (15) = exactly 50. Relational modules move to the back — their
    # green rows are on record in CORRECTNESS_r01/r02.json.
    return [
        cdc,
        dedup,
        similarity,
        text,
        curation,
        corpus,
        multimodal,
        graph,
        audit,
        timeseries,
        behavior,
        approx,
        stats,
        asof,
        reshape,
        partsupp,
        layout,
        windows,
        incremental,  # past the 50-slot window on purpose: keeps text's
        # never-gated queries in it; covered by ORACLE_FULL_r3.json + pytest
        relational3,
        relational2,
        relational,
    ]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        for name, fn in getattr(mod, "QUERIES", {}).items():
            if name in merged:
                raise ValueError(f"duplicate query name {name!r} in {mod.__name__}")
            merged[name] = fn
    return merged


def all_oracles() -> dict[str, str]:
    queries = all_queries()
    merged: dict[str, str] = {}
    for mod in _modules():
        for name, sql in getattr(mod, "ORACLES", {}).items():
            if name not in queries:
                raise ValueError(f"oracle {name!r} in {mod.__name__} has no matching query")
            merged[name] = sql
    return merged
