"""Per-stage profile of one registered query: which stage burns the time.

Run: python tools/profile_query.py <query> [sf_dir] [reps]

Runs the query `reps` times (first run discarded as warm-up), then prints
each stage of the LAST run with task count, duration, shuffle bytes, and
the dominant time component (executor compute vs scheduling gap) from the
status-store REST API. The per-stage wall times answer "where would I
optimize?" far faster than eyeballing the SQL plan.
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, ".")

from debezium_cdc_kafka_spark import registry  # noqa: E402
from debezium_cdc_kafka_spark.session import get_spark, release_persisted  # noqa: E402


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("profile", ui=True)
    q = registry.all_queries()[name]

    q(spark, "/root/testdata/sf0.001").count()  # codegen warm-up
    release_persisted(spark)

    sc = spark.sparkContext
    times = []
    for i in range(reps):
        release_persisted(spark)
        t0 = time.time()
        sc.setJobGroup(f"rep{i}", name)
        q(spark, sf_dir).count()
        times.append(time.time() - t0)
    print(f"{name}: reps={[round(t, 3) for t in times]} min={min(times):.3f}")

    ui = sc.uiWebUrl
    app = sc.applicationId

    def get(path):
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/{path}") as r:
            return json.load(r)

    jobs = get("jobs")
    last = [j for j in jobs if j.get("jobGroup") == f"rep{reps - 1}"]
    stage_ids = sorted({sid for j in last for sid in j.get("stageIds", [])})
    stages = {s["stageId"]: s for s in get("stages") if s["status"] == "COMPLETE"}

    def ts(v):
        from datetime import datetime

        return datetime.strptime(v[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

    print(f" last rep: {len(last)} jobs, {len(stage_ids)} stages")
    print(" stage  tasks  wallMs  runMs  cpuMs     shWr      shRd     input  name")
    for sid in stage_ids:
        s = stages.get(sid)
        if not s:
            continue
        wall = 0
        if s.get("submissionTime") and s.get("completionTime"):
            wall = int((ts(s["completionTime"]) - ts(s["submissionTime"])) * 1000)
        print(
            f" {sid:>5}  {s['numCompleteTasks']:>5}  {wall:>6}  "
            f"{s.get('executorRunTime', 0):>5}  {s.get('executorCpuTime', 0) // 1_000_000:>5}  "
            f"{s.get('shuffleWriteBytes', 0):>8}  {s.get('shuffleReadBytes', 0):>8}  "
            f"{s.get('inputBytes', 0):>8}  {(s.get('name') or '').split(chr(10))[0][:60]}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
