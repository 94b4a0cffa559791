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
            # DataFilters print as Catalyst expressions, PushedFilters as
            # source-filter constructors — textual equality never holds.
            # Heuristic: a data filter counts as pushed if its column
            # appears in ANY pushed filter beyond IsNotNull (Catalyst
            # pushes the comparison alongside); a residual expression
            # (year(ts)=…, cast, arithmetic) leaves its column with no
            # non-IsNotNull pushed entry.
            # columns mentioned anywhere in a non-IsNotNull pushed filter,
            # including nested constructors (Or(EqualTo(n_name,..),..))
            pushed_cols = set(
                re.findall(
                    r"\(([a-z]\w*)[,)]",
                    ",".join(
                        f
                        for f in _split_preds(pushed)
                        if f and not f.startswith("IsNotNull")
                    ),
                )
            )
            resid = [
                p
                for p in data
                if not p.startswith("isnotnull")
                and not (_cols(p) and _cols(p) <= pushed_cols)
            ]
            if resid:
                n_flagged += 1
                print(f"RESID {name} [{table}]: {resid[:3]}")
        spark.catalog.clearCache()
    print(f"# done; {n_flagged} scans with residual-only predicates")
    return 0


COL = re.compile(r"\b([a-z]\w*)#\d+")


def _cols(pred: str) -> set[str]:
    """Column names referenced by a Catalyst predicate string."""
    return set(COL.findall(pred))


if __name__ == "__main__":
    raise SystemExit(main())
