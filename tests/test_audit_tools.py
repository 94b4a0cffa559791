"""Unit tests for the plan-audit tool parsers (r6).

SCALE.md's scan-census and duplicate-shuffle claims are produced by
tools/exchange_audit.py, and the pushdown triage by
tools/pushdown_audit.py. Their value is entirely in the parsing: a
regex regression would silently turn every future audit into a false
"all clean". These tests pin the parsers on synthetic plan strings —
no Spark session needed.
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tools"))

from exchange_audit import NOISE, audit_plan  # noqa: E402
from pushdown_audit import _cols, _split_preds  # noqa: E402


def _plan(*lines: str) -> str:
    return "\n".join(lines)


def test_duplicate_exchange_detected_across_lambda_renames():
    # identical subtrees up to expression ids and lambda variable names
    plan = _plan(
        "AdaptiveSparkPlan isFinalPlan=true",
        "+- Union",
        "   :- Exchange hashpartitioning(doc_id#12L, 32), ENSURE_REQUIREMENTS, [plan_id=1]",
        "   :  +- Project [aggregate(x#3, lambda x_1#4, ...) AS y#5]",
        "   :     +- FileScan parquet [doc_id#12L] Location: InMemoryFileIndex(1 paths)[file:/t/documents.parquet]",
        "   +- Exchange hashpartitioning(doc_id#92L, 32), ENSURE_REQUIREMENTS, [plan_id=9]",
        "      +- Project [aggregate(x#83, lambda x_7#84, ...) AS y#85]",
        "         +- FileScan parquet [doc_id#92L] Location: InMemoryFileIndex(1 paths)[file:/t/documents.parquet]",
    )
    n, reused, dups, scans = audit_plan(plan)
    assert n == 2
    assert reused == 0
    assert len(dups) == 1 and len(dups[0]) == 2
    assert scans == {"documents": 2}


def test_distinct_subtrees_not_flagged():
    plan = _plan(
        "+- Join",
        "   :- Exchange hashpartitioning(a#1L, 32), ENSURE_REQUIREMENTS, [plan_id=1]",
        "   :  +- FileScan parquet [a#1L] Location: X[file:/t/orders.parquet]",
        "   +- Exchange hashpartitioning(b#2L, 32), ENSURE_REQUIREMENTS, [plan_id=2]",
        "      +- FileScan parquet [b#2L] Location: X[file:/t/lineitem.parquet]",
    )
    n, reused, dups, scans = audit_plan(plan)
    assert n == 2
    assert dups == []
    assert scans == {"orders": 1, "lineitem": 1}


def test_reused_exchange_counted_not_flagged():
    plan = _plan(
        "+- Join",
        "   :- Exchange hashpartitioning(a#1L, 32), ENSURE_REQUIREMENTS, [plan_id=1]",
        "   :  +- FileScan parquet [a#1L] Location: X[file:/t/orders.parquet]",
        "   +- ReusedExchange [a#9L], Exchange hashpartitioning(a#1L, 32)",
    )
    n, reused, dups, _ = audit_plan(plan)
    assert (n, reused) == (1, 1)
    assert dups == []


def test_initial_plan_section_is_cut():
    plan = _plan(
        "AdaptiveSparkPlan isFinalPlan=true",
        "+- Exchange hashpartitioning(a#1L, 32), ENSURE_REQUIREMENTS, [plan_id=1]",
        "   +- FileScan parquet [a#1L] Location: X[file:/t/events.parquet]",
        "+- == Initial Plan ==",
        "   Exchange hashpartitioning(a#1L, 32), ENSURE_REQUIREMENTS, [plan_id=0]",
        "   +- FileScan parquet [a#1L] Location: X[file:/t/events.parquet]",
    )
    n, _, dups, scans = audit_plan(plan)
    assert n == 1
    assert dups == []
    assert scans == {"events": 1}


def test_noise_strips_ids_and_lambda_names():
    s = "aggregate(zip_with(e#1, lambdafunction(lambda x_1#18, lambda x_7#19)))"
    t = "aggregate(zip_with(e#9, lambdafunction(lambda x_3#52, lambda x_9#53)))"
    assert NOISE.sub("", s) == NOISE.sub("", t)


def test_split_preds_respects_nesting():
    preds = _split_preds(
        "IsNotNull(a), Or(EqualTo(n_name,X),EqualTo(n_name,Y)), (b#3 > 1)"
    )
    assert preds == [
        "IsNotNull(a)",
        "Or(EqualTo(n_name,X),EqualTo(n_name,Y))",
        "(b#3 > 1)",
    ]


def test_cols_extracts_catalyst_column_refs():
    assert _cols("(year(cast(l_shipdate#3492 as date)) IN (1996,1997))") == {
        "l_shipdate"
    }
    assert _cols("((vec_id#1035L % 100) = 0)") == {"vec_id"}
    assert _cols("(1 = 1)") == set()
