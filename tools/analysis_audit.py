"""Driver-side plan-latency audit: time to BUILD + PLAN each query, no tasks.

Run: python tools/analysis_audit.py [sf_dir] [--json OUT]

At 1000 executors the driver is a shared, single-threaded bottleneck for
Catalyst analysis/optimization — a query whose *plan construction* takes
seconds serializes every concurrent submitter even when its execution is
fast and fully parallel. q_jl_projection's 1024-literal projection tree
(7.1s of analysis for 0.9s of execution, found in r5 profiling) is the
canonical instance. This sweep measures that cost for every registered
query:

- build_s: Python-side DataFrame construction — includes any bounded
  driver jobs a query deliberately runs while building (seed collects,
  scalar thresholds) plus the analysis Spark Connect-style APIs force
  eagerly (schema resolution).
- plan_s: forcing ``queryExecution().executedPlan()`` — full Catalyst
  analysis → optimization → physical planning, stopping before any task
  is scheduled (AQE re-planning at runtime is execution-side and not
  charged here).

Not a benchmark (shared warm session, single rep): the signal is queries
whose build+plan is an outlier relative to the fleet, not ±0.2s noise.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from debezium_cdc_kafka_spark import registry  # noqa: E402
from debezium_cdc_kafka_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    out_json = None
    if "--json" in sys.argv:
        out_json = sys.argv[sys.argv.index("--json") + 1]

    spark = get_spark("analysis_audit")
    queries = registry.all_queries()

    # Warm the JVM + parquet footer reads so query 1 isn't charged startup.
    first = next(iter(queries.values()))(spark, sf_dir)
    first._jdf.queryExecution().executedPlan()

    rows: dict[str, dict[str, float]] = {}
    for name, fn in queries.items():
        t0 = time.monotonic()
        try:
            df = fn(spark, sf_dir)
            t1 = time.monotonic()
            df._jdf.queryExecution().executedPlan()
            t2 = time.monotonic()
        except Exception as e:  # noqa: BLE001 — audit must finish
            print(f"ERROR {name}: {e}", file=sys.stderr)
            rows[name] = {"build_s": -1.0, "plan_s": -1.0}
            continue
        rows[name] = {
            "build_s": round(t1 - t0, 3),
            "plan_s": round(t2 - t1, 3),
            "total_s": round(t2 - t0, 3),
        }

    ranked = sorted(rows.items(), key=lambda kv: -kv[1].get("total_s", 0))
    total = sum(r.get("total_s", 0) for r in rows.values() if r["build_s"] >= 0)
    print(f"\n== driver-side build+plan, {len(rows)} queries, "
          f"total {total:.1f}s ==")
    for name, r in ranked[:25]:
        print(f"{r.get('total_s', -1):7.2f}s  (build {r['build_s']:.2f} + "
              f"plan {r['plan_s']:.2f})  {name}")

    if out_json:
        with open(out_json, "w") as f:
            json.dump(rows, f, indent=1, sort_keys=True)
        print(f"wrote {out_json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
