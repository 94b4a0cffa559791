"""Broadcast-over-explode audit: find joins whose broadcast side can blow up.

Run: python tools/broadcast_audit.py [sf_dir]

The bug class (found live at ×64 facts on q_salted_skew_join, r6):
Catalyst sizes a join side from the pruned scan estimate and propagates
it through Generate (explode) unchanged — the estimate is explode-blind
and compression-blind. A side whose compressed estimate sits under
`spark.sql.autoBroadcastJoinThreshold` but whose materialized size is
(decompression × fan-out) larger gets broadcast anyway; past 8 GB the
broadcast is a hard SparkException, and well before that it is a plan
you don't want (gigabytes pushed to every executor).

This audit walks every registered query's physical plan and flags each
BroadcastExchange whose subtree contains a Generate with NO bounding
operator (aggregate / limit / top-k / distinct) between them — i.e. the
exploded rows feed the broadcast directly. Flagged entries are then
judged by the envelope argument (see SCALE.md "broadcast-over-explode
audit"): the broadcast is self-limiting at threshold × expansion bytes,
so only expansion factors > 8 GB / threshold (≈125× at the repo's 64 MB
setting) can ever reach the hard limit. Explicit replication (the
salted join's ×8) stacked on parquet decompression (~10–20×) crosses
that line; shingle/band explodes (4–25×) do not, and checkpointed
ExistingRDD sides carry accurate in-memory stats (no blindness at all).
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

from debezium_cdc_kafka_spark import registry  # noqa: E402
from debezium_cdc_kafka_spark.session import get_spark  # noqa: E402

BOUNDING = re.compile(
    r"HashAggregate|SortAggregate|ObjectHashAggregate|TakeOrdered"
    r"|CollectLimit|GlobalLimit|LocalLimit|Deduplicate"
)


def _depth(line: str) -> int:
    return len(line) - len(line.lstrip(" +-:*"))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("broadcast_audit")
    flagged: dict[str, list[str]] = {}
    for name, fn in registry.all_queries().items():
        try:
            plan = (
                fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
            )
        except Exception as e:  # noqa: BLE001 — audit must finish
            print(f"ERR {name}: {type(e).__name__}", file=sys.stderr)
            continue
        lines = plan.splitlines()
        for i, ln in enumerate(lines):
            if "BroadcastExchange" not in ln:
                continue
            d0 = _depth(ln)
            bounded = False
            for j in range(i + 1, len(lines)):
                if _depth(lines[j]) <= d0:
                    break
                if BOUNDING.search(lines[j]):
                    bounded = True
                if "Generate" in lines[j] and not bounded:
                    flagged.setdefault(name, []).append(lines[j].strip()[:100])
                    break
    print(f"\n== unbounded Generate under BroadcastExchange "
          f"({len(flagged)} queries) ==")
    for k, v in sorted(flagged.items()):
        print(f"{k}\n   {v[0]}")
    print("\nJudge each against the envelope: broadcast bytes are capped at "
          "autoBroadcastJoinThreshold x expansion; only expansion > "
          "8GB/threshold can hard-fail. Explicit replication stacked on "
          "decompression is the dangerous shape.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
