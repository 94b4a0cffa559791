"""Full-registry timing sweep: every registered query, one timed run.

Run: python tools/sweep_timings.py [sf_dir] [--json OUT] [--skip n1,n2]
                                   [--min-free-gb G]

--skip names are NOT run; they are listed in the output and recorded in
the JSON so a bounded sweep can never silently read as full coverage.

Disk budget (r9, after both ×256 DBSCAN attempts exhausted local disk):
the sweep preflights --min-free-gb (default 8) of scratch headroom and
runs every query under a SpillWatchdog that CANCELS the query — not the
machine — if free scratch crosses the floor; such queries are recorded
as DISK_BUDGET with time -2.0. Peak per-query scratch usage (free-space
trough vs query start, exact on an idle machine) lands in the JSON as
`scratch_peak_mb`.

--timeout-s N (default: none) bounds each query's wall clock the same
way: on expiry the jobs are cancelled and the query is recorded as
TIMEOUT with time -3.0. This is what makes a large-multiple sweep
"completed-or-classified" by construction — a known-quadratic exact
baseline burns its budget and is CLASSIFIED, instead of either
silently eating the sweep's wall clock or being silently skipped.

Executes each query with the `noop` sink (full plan runs, nothing
collects to the driver) and prints queries sorted slowest-first. This is
the would-it-survive-a-scale-up audit for the WHOLE surface — bench.py
tracks the 21 headline queries rep-to-rep, this catches a pathological
plan hiding in the long tail (the r3 MMR 18.8s case was found this way).

Not a benchmark: single rep, shared warm session, so ±0.2s noise. Use
tools/profile_query.py on anything that looks wrong here.
"""

from __future__ import annotations

import concurrent.futures
import json
import sys
import time

sys.path.insert(0, ".")

from debezium_cdc_kafka_spark import registry  # noqa: E402
from debezium_cdc_kafka_spark.diskguard import (  # noqa: E402
    SpillWatchdog,
    preflight,
)
from debezium_cdc_kafka_spark.session import get_spark, release_persisted  # noqa: E402


def main() -> int:
    argv = sys.argv[1:]
    out_json = None
    skip: list[str] = []
    only: list[str] = []
    min_free_gb = 8.0
    timeout_s: float | None = None
    # drop each flag AND its value from the positional scan (the value
    # would otherwise be taken as sf_dir — the exchange_audit ADVICE r6
    # bug, fixed here too)
    for flag in ("--json", "--skip", "--only", "--min-free-gb", "--timeout-s"):
        if flag in argv:
            i = argv.index(flag)
            # a trailing flag, or one followed by another flag, has no
            # value (ADVICE r7) — usage error, not an IndexError
            if i + 1 >= len(argv) or argv[i + 1].startswith("--"):
                raise SystemExit(
                    f"usage: sweep_timings.py [sf_dir] [--json OUT] "
                    f"[--skip n1,n2,...] [--only n1,n2,...] "
                    f"[--min-free-gb G] — {flag} needs a value"
                )
            val = argv[i + 1]
            del argv[i : i + 2]
            if flag == "--json":
                out_json = val
            elif flag == "--skip":
                skip = [n for n in val.split(",") if n]
            elif flag == "--min-free-gb":
                min_free_gb = float(val)
            elif flag == "--timeout-s":
                timeout_s = float(val)
            else:
                only = [n for n in val.split(",") if n]
    args = [a for a in argv if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"

    free0 = preflight(min_free_gb)
    print(
        f"# preflight: {free0 / 2**30:.1f} GiB scratch free "
        f"(floor {min_free_gb:.1f} GiB)",
        file=sys.stderr,
    )

    spark = get_spark("sweep")
    queries = registry.all_queries()
    unknown = [n for n in skip + only if n not in queries]
    if unknown:
        raise SystemExit(f"--skip/--only names not in registry: {unknown}")
    if only:
        # filter BEFORE the warm run: an --only sweep may target a
        # partial fixture dir (e.g. embeddings-only x256) where other
        # registry queries' tables don't exist
        queries = {n: queries[n] for n in only}
    # warm the session + parquet footers so query 1 isn't charged for JVM
    # startup — under the same guard as measured runs (r9: the third ×256
    # DBSCAN attempt died in THIS line, outside the old guard, and took
    # the JSON with it)
    warm_candidates = [fn for n, fn in queries.items() if n not in skip]
    if not warm_candidates:
        raise SystemExit("nothing to run: every query is skipped")
    try:
        with SpillWatchdog(spark, min_free_gb=min_free_gb):
            # first NON-skipped query (r9: the r9 sweep warmed on the
            # skipped q_dbscan_clusters — i.e. ran the very query the
            # skip existed to avoid)
            warm_candidates[0](spark, sf_dir).write.format(
                "noop"
            ).mode("overwrite").save()
    except Exception as e:  # noqa: BLE001 — query 1's own run will retime it
        print(f"WARM-RUN failure (continuing, classified per-query): {e}",
              file=sys.stderr)
    times: dict[str, float] = {}
    scratch_mb: dict[str, float] = {}
    disk_tripped: list[str] = []
    timed_out: list[str] = []

    def _save(fn, name):
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    class _Timeout(Exception):
        pass

    def _run_one(fn, name):
        if timeout_s is None:
            _save(fn, name)
            return
        # the save runs in a worker thread so this thread can enforce the
        # wall budget; on expiry cancel the session's jobs (the worker
        # raises and exits) and classify TIMEOUT
        with concurrent.futures.ThreadPoolExecutor(1) as ex:
            fut = ex.submit(_save, fn, name)
            try:
                fut.result(timeout=timeout_s)
            except concurrent.futures.TimeoutError:
                spark.sparkContext.cancelAllJobs()
                try:
                    fut.result(timeout=120)
                except Exception:  # noqa: BLE001 — the cancel's raise
                    pass
                raise _Timeout()

    def _dump() -> None:
        # incremental checkpoint after every query (r9): a multi-hour
        # large-multiple sweep must not lose its completed rows to a
        # session boundary; same shape as the final dump
        if out_json:
            with open(out_json, "w") as f:
                json.dump(
                    {"sf_dir": sf_dir,
                     "total_s": round(sum(t for t in times.values() if t > 0), 1),
                     "skipped": skip, "min_free_gb": min_free_gb,
                     "timeout_s": timeout_s,
                     "complete": False,
                     "disk_tripped": disk_tripped, "timed_out": timed_out,
                     "scratch_peak_mb": scratch_mb, "times": times}, f, indent=1)

    for name, fn in queries.items():
        if name in skip:
            print(f"SKIP {name} (--skip)", file=sys.stderr)
            continue
        wd = SpillWatchdog(spark, min_free_gb=min_free_gb)
        t0 = time.monotonic()
        try:
            with wd:
                _run_one(fn, name)
            times[name] = round(time.monotonic() - t0, 3)
            print(
                f"done {name}: {times[name]}s "
                f"(scratch peak {wd.peak_scratch_bytes / 2**20:.0f} MB)",
                file=sys.stderr,
            )
        except _Timeout:
            wd.stop()
            times[name] = -3.0
            timed_out.append(name)
            print(f"TIMEOUT {name}: cancelled after {timeout_s:.0f}s "
                  f"(scratch peak {wd.peak_scratch_bytes / 2**20:.0f} MB)",
                  file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — sweep must finish
            wd.stop()
            if wd.tripped:
                times[name] = -2.0
                disk_tripped.append(name)
                print(f"DISK_BUDGET {name}: cancelled at "
                      f"{wd.peak_scratch_bytes / 2**20:.0f} MB scratch "
                      f"({time.monotonic() - t0:.0f}s in)", file=sys.stderr)
            else:
                times[name] = -1.0
                print(f"ERROR {name}: {e}", file=sys.stderr)
        scratch_mb[name] = round(wd.peak_scratch_bytes / 2**20, 1)
        _dump()
        release_persisted(spark)

    ranked = sorted(times.items(), key=lambda kv: -kv[1])
    total = sum(t for _, t in ranked if t > 0)
    print(f"# {len(ranked)} queries run ({len(skip)} skipped: "
          f"{','.join(skip) or 'none'}; {len(disk_tripped)} disk-budget "
          f"aborts: {','.join(disk_tripped) or 'none'}; "
          f"{len(timed_out)} timeouts: {','.join(timed_out) or 'none'}), "
          f"total {total:.1f}s at {sf_dir}")
    for name, t in ranked:
        print(f"{t:8.3f}  {name}")
    if out_json:
        with open(out_json, "w") as f:
            json.dump({"sf_dir": sf_dir, "total_s": round(total, 1),
                       "skipped": skip, "min_free_gb": min_free_gb,
                       "timeout_s": timeout_s,
                       "complete": True,
                       "disk_tripped": disk_tripped,
                       "timed_out": timed_out,
                       "scratch_peak_mb": scratch_mb,
                       "times": dict(ranked)}, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
