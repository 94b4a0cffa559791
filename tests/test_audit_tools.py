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

from exchange_audit import _norm, audit_plan  # noqa: E402
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


def test_norm_strips_ids_and_lambda_instance_numbers():
    s = "aggregate(zip_with(e#1, lambdafunction(lambda x_1#18, lambda y_7#19)))"
    t = "aggregate(zip_with(e#9, lambdafunction(lambda x_3#52, lambda y_9#53)))"
    assert _norm(s) == _norm(t)
    # anchored to the `lambda ` prefix: a genuine column named x_1 must
    # survive normalization (ADVICE r6) ...
    assert "x_1" in _norm("Project [x_1#4 AS out#5]")
    # ... and distinct lambda vars must stay distinct (x vs y), so two
    # different two-arg lambdas can't false-fingerprint as duplicates
    assert _norm("lambda x_1#4") != _norm("lambda y_1#4")


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


def test_residual_preds_catches_mixed_wrapper(monkeypatch=None):
    from pushdown_audit import residual_preds

    # ADVICE r6 blind spot: pushed range + unpushed year() wrapper on the
    # SAME column must still flag the wrapper
    data = [
        "(o_orderdate#5 >= 1996-01-01 00:00:00)",
        "(year(cast(o_orderdate#5 as date)) = 1996)",
    ]
    pushed = (
        "IsNotNull(o_orderdate), "
        "GreaterThanOrEqual(o_orderdate,1996-01-01 00:00:00.0)"
    )
    assert residual_preds(data, pushed) == [
        "(year(cast(o_orderdate#5 as date)) = 1996)"
    ]
    # fully-pushed range pair: two pushed filters fund two data predicates
    assert residual_preds(
        ["(o_orderdate#5 >= X)", "(o_orderdate#5 < Y)"],
        "GreaterThanOrEqual(o_orderdate,X), LessThan(o_orderdate,Y)",
    ) == []
    # wrapper-shaped but genuinely pushed (constructor filter)
    assert residual_preds(
        ["StartsWith(p_type#9, PROMO)"],
        "IsNotNull(p_type), StringStartsWith(p_type,PROMO)",
    ) == []
    # IN rewritten as Or(): one pushed filter funds one data predicate
    assert residual_preds(
        ["n_name#2 IN (FRANCE,GERMANY)"],
        "Or(EqualTo(n_name,FRANCE),EqualTo(n_name,GERMANY))",
    ) == []
    # nothing pushed at all
    assert residual_preds(["(year(ts#1) = 1996)"], "") == [
        "(year(ts#1) = 1996)"
    ]


def test_trailing_flag_without_value_exits_with_usage(monkeypatch):
    """`--json` as the last argument (or followed by another flag) must
    exit with a usage message, not IndexError, and must not silently
    consume a flag as its value (ADVICE r7)."""
    import pytest

    import exchange_audit
    import sweep_timings

    for tool, bad in [
        (exchange_audit, ["exchange_audit.py", "--json"]),
        (sweep_timings, ["sweep_timings.py", "--json"]),
        (sweep_timings, ["sweep_timings.py", "--skip", "--json", "out"]),
    ]:
        monkeypatch.setattr(sys, "argv", bad)
        with pytest.raises(SystemExit, match="usage"):
            tool.main()
