"""Fleet-wide single-task hot-stage audit: find queries whose hottest
stage runs on ONE task while cores idle.

Run: python tools/serial_stage_audit.py [sf_dir] [--json OUT]

Motivation (SCALE.md r6 fan-out section): AQE coalesces post-shuffle
partitions by shuffle BYTES, which is blind to compute expansion —
q_knn_graph's whole pair scan (4.6 s CPU) ran as one task until the
REPARTITION_BY_NUM pin. This audit executes every registered query once
(warm session, noop count) under its own job group, then flags any query
where a completed 1-task stage accounts for > _MIN_MS of executor CPU
AND > _MIN_SHARE of the query's total stage CPU. A flagged row is a
candidate for the pair_fanout treatment (or a justified single-task
reduction, e.g. a final LIMIT collect — judge by the share AND the
absolute cost together).
"""

from __future__ import annotations

import json
import sys
import urllib.request

sys.path.insert(0, ".")

from debezium_cdc_kafka_spark import registry  # noqa: E402
from debezium_cdc_kafka_spark.session import get_spark  # noqa: E402

_MIN_MS = 500       # ignore sub-0.5s single-task stages: scheduling noise
_MIN_SHARE = 0.5    # flag only when the serial stage dominates the query


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    out_json = None
    if "--json" in sys.argv:
        out_json = sys.argv[sys.argv.index("--json") + 1]

    spark = get_spark("serial_audit", ui=True)
    sc = spark.sparkContext
    queries = registry.all_queries()
    if "--only" in sys.argv:
        wanted = sys.argv[sys.argv.index("--only") + 1].split(",")
        unknown = sorted(set(wanted) - set(queries))
        if unknown:
            raise SystemExit(f"--only names not in the registry: {unknown}")
        queries = {n: queries[n] for n in wanted}

    # warm the JVM once so first-query JIT doesn't masquerade as compute
    next(iter(queries.values()))(spark, sf_dir).count()

    ui, app = sc.uiWebUrl, sc.applicationId

    def get(path):
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/{path}") as r:
            return json.load(r)

    def scrape(by_query: dict[str, set[int]], stages: dict[int, dict]) -> None:
        for j in get("jobs"):
            g = j.get("jobGroup")
            if g in queries:
                by_query.setdefault(g, set()).update(j.get("stageIds", []))
        for s in get("stages?status=complete"):
            stages[s["stageId"]] = s

    # The UI status store retains only the most recent ~1000 jobs/stages;
    # a full 292-query run evicts the early ones (first audit run saw only
    # 155 of 292 attributed). Scrape incrementally every CHUNK queries so
    # nothing ages out of the store between scrapes.
    CHUNK = 25
    by_query: dict[str, set[int]] = {}
    stages: dict[int, dict] = {}
    for i, (name, fn) in enumerate(queries.items()):
        sc.setJobGroup(name, name)
        try:
            fn(spark, sf_dir).count()
        except Exception as e:  # keep auditing; a broken query is its own bug
            print(f"!! {name}: {e}", file=sys.stderr)
        spark.catalog.clearCache()
        if (i + 1) % CHUNK == 0:
            scrape(by_query, stages)
    sc.setJobGroup("_done", "_done")
    scrape(by_query, stages)

    flagged = []
    for name, sids in by_query.items():
        rows = [stages[s] for s in sids if s in stages]
        total_cpu = sum(s.get("executorCpuTime", 0) // 1_000_000 for s in rows)
        serial = [
            s for s in rows
            if s["numCompleteTasks"] == 1
            and s.get("executorCpuTime", 0) // 1_000_000 >= _MIN_MS
        ]
        for s in serial:
            cpu = s.get("executorCpuTime", 0) // 1_000_000
            if total_cpu and cpu / total_cpu >= _MIN_SHARE:
                flagged.append(
                    {
                        "query": name,
                        "stage": s["stageId"],
                        "serial_cpu_ms": cpu,
                        "query_cpu_ms": total_cpu,
                        "share": round(cpu / total_cpu, 3),
                        "shuffle_read": s.get("shuffleReadBytes", 0),
                        "shuffle_write": s.get("shuffleWriteBytes", 0),
                    }
                )

    flagged.sort(key=lambda r: -r["serial_cpu_ms"])
    print(f"# {len(by_query)} queries audited, {len(flagged)} serial hot stages")
    for r in flagged:
        print(
            f"  {r['query']:40s} stage={r['stage']:>5} "
            f"cpu={r['serial_cpu_ms']:>6}ms share={r['share']:.2f} "
            f"shR={r['shuffle_read']:>9} shW={r['shuffle_write']:>9}"
        )
    if out_json:
        with open(out_json, "w") as f:
            json.dump(flagged, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
