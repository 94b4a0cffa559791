"""Full-registry timing sweep: every registered query, one timed run.

Run: python tools/sweep_timings.py [sf_dir] [--json OUT]

Executes each query with the `noop` sink (full plan runs, nothing
collects to the driver) and prints queries sorted slowest-first. This is
the would-it-survive-a-scale-up audit for the WHOLE surface — bench.py
tracks the 21 headline queries rep-to-rep, this catches a pathological
plan hiding in the long tail (the r3 MMR 18.8s case was found this way).

Not a benchmark: single rep, shared warm session, so ±0.2s noise. Use
tools/profile_query.py on anything that looks wrong here.
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

    spark = get_spark("sweep")
    queries = registry.all_queries()
    # warm the session + parquet footers so query 1 isn't charged for JVM
    # startup
    next(iter(queries.values()))(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    times: dict[str, float] = {}
    for name, fn in queries.items():
        t0 = time.monotonic()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name] = round(time.monotonic() - t0, 3)
        except Exception as e:  # noqa: BLE001 — sweep must finish
            times[name] = -1.0
            print(f"ERROR {name}: {e}", file=sys.stderr)
        spark.catalog.clearCache()

    ranked = sorted(times.items(), key=lambda kv: -kv[1])
    total = sum(t for _, t in ranked if t > 0)
    print(f"# {len(ranked)} queries, total {total:.1f}s at {sf_dir}")
    for name, t in ranked:
        print(f"{t:8.3f}  {name}")
    if out_json:
        with open(out_json, "w") as f:
            json.dump({"sf_dir": sf_dir, "total_s": round(total, 1),
                       "times": dict(ranked)}, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
