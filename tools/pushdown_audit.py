"""Pushdown census: find base-table filters that never reached the scan.

Run: python tools/pushdown_audit.py [sf_dir]

At 100 TB the difference between a predicate evaluated INSIDE the
parquet reader (PushedFilters → row-group statistics skip whole
megabyte-sized chunks) and one evaluated after the read (DataFilters
only → every row decodes first) is the scan itself. Catalyst pushes
plain comparisons automatically, but an expression wrapper silently
defeats it — `year(ts) = 1996`, `cast(ts as date) >= d`, arithmetic on
the column, UDF-ish string ops — and the plan still "works", just reads
everything.

This audit BUILDS every registered query (no execution — executedPlan
on the un-run query; AQE initial plan carries the scan nodes) and flags
every FileScan whose DataFilters contain a predicate absent from
PushedFilters, excluding the benign always-pushed-alongside
`isnotnull` twins. Flags are candidates, not verdicts: some residuals
are genuinely unpushable (e.g. a filter on a computed column that the
scan cannot see) and some are cheap row filters on an already-pruned
column set — judge by the table size and the predicate.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

from debezium_cdc_kafka_spark import registry  # noqa: E402
from debezium_cdc_kafka_spark.session import get_spark  # noqa: E402

FS = re.compile(r"FileScan parquet.*?DataFilters: \[(.*?)\], Format")
PUSHED = re.compile(r"PushedFilters: \[(.*?)\][,}]")
LOC = re.compile(r"/(\w+)\.parquet")


def _split_preds(s: str) -> list[str]:
    """Split a filter list on top-level commas."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        out.append(tail)
    return [p for p in out if p]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("pushdown_audit")
    n_flagged = 0
    for name, fn in registry.all_queries().items():
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 — audit must finish
            print(f"ERR {name}: {type(e).__name__}", file=sys.stderr)
            continue
        # one FileScan prints on one (very long) line in the tree string
        for ln in plan.splitlines():
            if "FileScan parquet" not in ln:
                continue
            m = FS.search(ln)
            if not m or not m.group(1).strip():
                continue
            data = _split_preds(m.group(1))
            mp = PUSHED.search(ln)
            pushed = mp.group(1) if mp else ""
            locm = LOC.search(ln)
            table = locm.group(1) if locm else "?"
            resid = residual_preds(data, pushed)
            if resid:
                n_flagged += 1
                print(f"RESID {name} [{table}]: {resid[:3]}")
        spark.catalog.clearCache()
    print(f"# done; {n_flagged} scans with residual-only predicates")
    return 0



COL = re.compile(r"\b([a-z]\w*)#\d+")
# a "plain-shaped" predicate starts with the bare column reference
# (optionally negated/parenthesised) — no function wrapper around it
PLAIN = re.compile(r"^[(\s]*(NOT[ (]+)?[a-z]\w*#\d+")


def _cols(pred: str) -> set[str]:
    """Column names referenced by a Catalyst predicate string."""
    return set(COL.findall(pred))


def residual_preds(data: list[str], pushed: str) -> list[str]:
    """Data-filter predicates with no funding pushed filter.

    DataFilters print as Catalyst expressions, PushedFilters as
    source-filter constructors — textual equality never holds, so this
    is per-predicate COUNT accounting by column (ADVICE r6: the earlier
    any-column-match rule let mixed filters like
    ``ts >= X AND year(ts) = 1996`` escape because the pushed range
    predicate "covered" the column). Each non-IsNotNull pushed filter
    funds one data predicate per column it mentions. Plain-shaped data
    predicates (bare column at the head — the class Catalyst pushes
    as-is) consume budget first; wrapper-shaped ones (StartsWith(col,..)
    and friends, which DO push as constructor filters) consume what
    remains; anything left unfunded is flagged."""
    budget: dict[str, int] = {}
    for f in _split_preds(pushed):
        if not f or f.startswith("IsNotNull"):
            continue
        # distinct columns per pushed filter: Or(EqualTo(c,..),EqualTo(c,..))
        # is ONE filter funding ONE data predicate on c
        for c in set(re.findall(r"\(([a-z]\w*)[,)]", f)):
            budget[c] = budget.get(c, 0) + 1
    cand = [p for p in data if not p.startswith("isnotnull")]
    ordered = sorted(range(len(cand)), key=lambda i: 0 if PLAIN.match(cand[i]) else 1)
    flagged: set[int] = set()
    for i in ordered:
        cols = _cols(cand[i])
        if cols and all(budget.get(c, 0) > 0 for c in cols):
            for c in cols:
                budget[c] -= 1
        else:
            flagged.add(i)
    return [p for i, p in enumerate(cand) if i in flagged]


if __name__ == "__main__":
    raise SystemExit(main())
