"""Duplicate-shuffle audit: find plans that materialize the same exchange twice.

Run: python tools/exchange_audit.py [sf_dir] [--json OUT]

At 100 TB the shuffle is the dominant I/O cost, so a plan that computes the
SAME shuffle twice — where Spark's exchange reuse should have collapsed the
two — wastes a full pass over the data. Reuse can silently break: AQE caches
shuffle stages by canonicalized subtree, and a small alias/ordering
difference between two logically-identical subtrees (or a localCheckpoint /
ExistingRDD boundary that re-materializes per reference) defeats it.

Method: each registered query RUNS via collect() — an action on the
DataFrame's OWN QueryExecution, so AQE finalizes that instance in place
(a noop-sink write executes a separate QueryExecution and leaves this
one at isFinalPlan=false, which silently reports the pre-reuse initial
plan — the audit's first version had exactly that bug); then the FINAL
adaptive plan is walked (the `== Initial Plan ==` section is cut off —
it would double-count every node). Every materialized shuffle node (`Exchange
hashpartitioning/rangepartitioning/SinglePartition`, excluding
`ReusedExchange` / reused query stages) has its subtree extracted by tree
depth and normalized — expression ids `#123`, `plan_id=`/`id=#` tags and
stage annotations stripped — and fingerprinted. Two identical fingerprints
inside one plan mean the same shuffle executed twice.

Output: per-query shuffle count + duplicate groups, worst offenders first.
Single-session, execution-order warmth — a structural audit, not a
benchmark (pair with tools/sweep_timings.py for wall numbers).
"""

from __future__ import annotations

import json
import re
import sys

sys.path.insert(0, ".")

from debezium_cdc_kafka_spark import registry  # noqa: E402
from debezium_cdc_kafka_spark.session import get_spark  # noqa: E402

SHUFFLE = re.compile(r"\bExchange (hashpartitioning|rangepartitioning|SinglePartition|RoundRobinPartitioning)")
REUSED = re.compile(r"ReusedExchange|ReusedQueryStage|TableCacheQueryStage")
# Run-specific noise inside plan strings: expression ids, plan/stage ids,
# shuffle ids, memory sizes reported by finalized stages.
NOISE = re.compile(
    r"#\d+[A-Z]*|\[plan_id=\d+\]|\[id=#?\d+\]|, \[id=#?\d+\]"
    r"|ShuffleQueryStage \d+|QueryStage \d+|Statistics\([^)]*\)"
)
# Lambda variable names are numbered per-plan-instance (x_1 vs x_7 for the
# same higher-order function) — a pure rename must not defeat the duplicate
# fingerprint. Anchored to the `lambda ` prefix (every occurrence renders
# with it, declaration and body alike) so a real column that happens to be
# named x_1 is NOT normalized away, and group-preserving so `lambda x_1` and
# `lambda y_3` stay distinct vars (the earlier bare `\bx_\d+` rule erased
# x-vars anywhere in the line and missed y-vars entirely).
_LAMBDA_VAR = re.compile(r"\blambda (\w+?)_\d+\b")


def _norm(line: str) -> str:
    return _LAMBDA_VAR.sub(r"lambda \1", NOISE.sub("", line))


def _depth(line: str) -> int:
    return len(line) - len(line.lstrip(" +-:*"))


def _subtree(lines: list[str], i: int) -> str:
    # strip the tree-prefix characters too: two identical subtrees sitting
    # at different branch positions render different ':'/'+' gutters, and
    # a fingerprint that keeps them misses the duplicate (caught by
    # tests/test_audit_tools.py)
    d = _depth(lines[i])
    out = [_norm(lines[i]).lstrip(" :+-*")]
    for ln in lines[i + 1 :]:
        if ln.strip() and _depth(ln) <= d:
            break
        out.append(_norm(ln).lstrip(" :+-*").rstrip())
    return "\n".join(out)


SCAN_LOC = re.compile(r"/(\w+)\.parquet")


def audit_plan(plan: str) -> tuple[int, int, list[list[str]], dict[str, int]]:
    """Return (materialized shuffles, reused markers, duplicate groups,
    per-table FileScan counts).

    The scan census is the recompute signal the shuffle fingerprint can't
    see: a lazy frame with three consumers re-executes its whole subtree —
    including the base table scan — once per consumer. Locally that's
    often the right trade (recompute beats materializing); at 100 TB a
    fact table scanned 4× in one query is 300 TB of extra I/O, so every
    entry here with a high count on a FACT table needs a documented
    recompute-over-materialize rationale or a persist."""
    # The final adaptive plan ends where the pre-AQE snapshot begins.
    cut = plan.find("== Initial Plan ==")
    if cut != -1:
        plan = plan[:cut]
    lines = plan.splitlines()
    scans: dict[str, int] = {}
    for ln in lines:
        if "FileScan parquet" in ln:
            m = SCAN_LOC.search(ln)
            key = m.group(1) if m else "?"
            scans[key] = scans.get(key, 0) + 1
    seen: dict[str, list[str]] = {}
    count = reused = 0
    for i, ln in enumerate(lines):
        if REUSED.search(ln):
            reused += 1
            continue
        if not SHUFFLE.search(ln):
            continue
        count += 1
        fp = _subtree(lines, i)
        seen.setdefault(fp, []).append(_norm(ln).strip()[:120])
    dups = [v for v in seen.values() if len(v) > 1]
    return count, reused, dups, scans


def main() -> int:
    argv = sys.argv[1:]
    out_json = None
    if "--json" in argv:
        i = argv.index("--json")
        # a trailing flag, or one followed by another flag, has no value
        # (ADVICE r7) — usage error, not an IndexError
        if i + 1 >= len(argv) or argv[i + 1].startswith("--"):
            raise SystemExit(
                "usage: exchange_audit.py [sf_dir] [--json OUT] — "
                "--json needs a value"
            )
        out_json = argv[i + 1]
        # drop the flag AND its value — otherwise the value is taken as the
        # positional sf_dir and every query errors (ADVICE r6)
        del argv[i : i + 2]
    args = [a for a in argv if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    spark = get_spark("exchange_audit")
    rows: dict[str, dict] = {}
    for name, fn in registry.all_queries().items():
        try:
            df = fn(spark, sf_dir)
            df.collect()
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 — audit must finish
            print(f"ERR {name}: {type(e).__name__}: {e}", file=sys.stderr)
            rows[name] = {"error": type(e).__name__}
            continue
        n, reused, dups, scans = audit_plan(plan)
        rows[name] = {
            "shuffles": n,
            "reused": reused,
            "dup_groups": len(dups),
            "dups": dups,
            "scans": scans,
        }
        if dups:
            print(f"DUP {name}: {n} shuffles, {len(dups)} duplicated subtree(s)")
            for g in dups:
                print(f"    x{len(g)}: {g[0]}")
        spark.catalog.clearCache()
    ok = [r for r in rows.values() if "error" not in r]
    ok_sorted = sorted(
        ((n, r) for n, r in rows.items() if "error" not in r),
        key=lambda kv: -kv[1]["shuffles"],
    )
    print(f"\n{len(ok)} queries audited; total materialized shuffles "
          f"{sum(r['shuffles'] for r in ok)} "
          f"(+{sum(r['reused'] for r in ok)} reused); "
          f"{sum(1 for r in ok if r['dup_groups'])} queries with duplicate shuffles")
    print("top shuffle counts (materialized/reused):")
    for n, r in ok_sorted[:15]:
        print(f"  {r['shuffles']:3d}/{r['reused']:<3d}  {n}")
    by_scans = sorted(
        ((n, r) for n, r in rows.items() if "error" not in r),
        key=lambda kv: -max(kv[1]["scans"].values() or [0]),
    )
    print("top repeated-scan counts (max scans of one table):")
    for n, r in by_scans[:20]:
        worst = max(r["scans"], key=r["scans"].get)
        print(f"  {r['scans'][worst]:3d}x {worst:12s}  {n}")
    if out_json:
        with open(out_json, "w") as f:
            json.dump(rows, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
