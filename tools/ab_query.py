"""Same-session A/B of one registered query between two git revisions.

Run: python tools/ab_query.py <query> <rev_a> <rev_b> [sf_dir] [reps]

Motivation (r9, VERDICT item 6): bench totals vary ±10-15% across
sessions/VMs, so "query X got 13% slower vs last round" is only
actionable if both sides run interleaved in ONE machine window. This
tool checks out each revision's copy of the query's module into a
scratch import root and runs A/B pairs back-to-back, alternating
(A,B,A,B,...), each rep in a fresh subprocess so neither side inherits
the other's JIT/codegen state. Median-of-reps per side + the ratio is
the verdict.

Only the query's own operator module differs between sides; everything
else (session config, fixture, machine state) is shared — which is the
point.
"""

from __future__ import annotations

import json
import pathlib
import statistics
import subprocess
import sys
import tempfile

REPO = pathlib.Path(__file__).resolve().parents[1]

_CHILD = r"""
import sys, time
sys.path.insert(0, sys.argv[4])  # revision scratch root FIRST
sys.path.insert(1, str({repo!r}))
from debezium_cdc_kafka_spark import registry
from debezium_cdc_kafka_spark.session import get_spark

name, sf_dir, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
spark = get_spark("ab")
fn = registry.all_queries()[name]
fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
spark.catalog.clearCache()
times = []
for _ in range(reps):
    t0 = time.monotonic()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    times.append(round(time.monotonic() - t0, 3))
    spark.catalog.clearCache()
print("AB_TIMES " + ",".join(map(str, times)))
"""


def _module_of(query: str) -> str:
    """Find which operators module registers the query (grep its name)."""
    ops = REPO / "debezium_cdc_kafka_spark" / "operators"
    hits = [
        p
        for p in ops.glob("*.py")
        if f'"{query}"' in p.read_text()
    ]
    if len(hits) != 1:
        raise SystemExit(f"query {query!r} found in {len(hits)} modules: {hits}")
    return f"debezium_cdc_kafka_spark/operators/{hits[0].name}"


def _materialize(rev: str, module_rel: str, scratch: pathlib.Path) -> pathlib.Path:
    """Scratch import root = symlink farm to HEAD + the one module file
    checked out from `rev`, so only the module under test differs."""
    root = scratch / rev.replace("/", "_")
    pkg_src = REPO / "debezium_cdc_kafka_spark"
    pkg_dst = root / "debezium_cdc_kafka_spark"
    pkg_dst.mkdir(parents=True)
    for p in pkg_src.rglob("*.py"):
        rel = p.relative_to(pkg_src)
        d = pkg_dst / rel
        d.parent.mkdir(parents=True, exist_ok=True)
        d.symlink_to(p)
    target = root / module_rel
    target.unlink()
    blob = subprocess.run(
        ["git", "-C", str(REPO), "show", f"{rev}:{module_rel}"],
        capture_output=True,
        check=True,
    ).stdout
    target.write_bytes(blob)
    return root


def main() -> int:
    if len(sys.argv) < 4:
        raise SystemExit(__doc__)
    query, rev_a, rev_b = sys.argv[1:4]
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
    reps = int(sys.argv[5]) if len(sys.argv) > 5 else 5
    module_rel = _module_of(query)
    print(f"# A/B {query} ({module_rel}) {rev_a} vs {rev_b}, "
          f"{reps} alternating fresh-JVM reps/side at {sf_dir}",
          file=sys.stderr)

    with tempfile.TemporaryDirectory() as td:
        scratch = pathlib.Path(td)
        roots = {
            rev: _materialize(rev, module_rel, scratch)
            for rev in (rev_a, rev_b)
        }
        times: dict[str, list[float]] = {rev_a: [], rev_b: []}
        for i in range(reps):
            for rev in (rev_a, rev_b):
                out = subprocess.run(
                    [
                        sys.executable,
                        "-c",
                        _CHILD.format(repo=str(REPO)),
                        query,
                        sf_dir,
                        "1",
                        str(roots[rev]),
                    ],
                    capture_output=True,
                    text=True,
                    cwd=str(REPO),
                )
                line = [
                    ln for ln in out.stdout.splitlines() if ln.startswith("AB_TIMES")
                ]
                if not line:
                    print(out.stdout[-2000:], out.stderr[-2000:], file=sys.stderr)
                    raise SystemExit(f"rep failed for {rev}")
                t = float(line[0].split(" ", 1)[1])
                times[rev].append(t)
                print(f"# rep {i} {rev}: {t}s", file=sys.stderr)
        med = {rev: statistics.median(ts) for rev, ts in times.items()}
        print(
            json.dumps(
                {
                    "query": query,
                    "sf_dir": sf_dir,
                    "module": module_rel,
                    "reps_per_side": reps,
                    "times": times,
                    "median": med,
                    "ratio_b_over_a": round(med[rev_b] / med[rev_a], 3),
                }
            )
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
