"""Full-registry timing sweep: every registered query, one timed run.

Run: python tools/sweep_timings.py [sf_dir] [--json OUT] [--skip n1,n2]

--skip names are NOT run; they are listed in the output and recorded in
the JSON so a bounded sweep can never silently read as full coverage.

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
    argv = sys.argv[1:]
    out_json = None
    skip: list[str] = []
    only: list[str] = []
    # drop each flag AND its value from the positional scan (the value
    # would otherwise be taken as sf_dir — the exchange_audit ADVICE r6
    # bug, fixed here too)
    for flag in ("--json", "--skip", "--only"):
        if flag in argv:
            i = argv.index(flag)
            # a trailing flag, or one followed by another flag, has no
            # value (ADVICE r7) — usage error, not an IndexError
            if i + 1 >= len(argv) or argv[i + 1].startswith("--"):
                raise SystemExit(
                    f"usage: sweep_timings.py [sf_dir] [--json OUT] "
                    f"[--skip n1,n2,...] [--only n1,n2,...] — {flag} needs a value"
                )
            val = argv[i + 1]
            del argv[i : i + 2]
            if flag == "--json":
                out_json = val
            elif flag == "--skip":
                skip = [n for n in val.split(",") if n]
            else:
                only = [n for n in val.split(",") if n]
    args = [a for a in argv if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"

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
    # startup
    next(iter(queries.values()))(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    times: dict[str, float] = {}
    for name, fn in queries.items():
        if name in skip:
            print(f"SKIP {name} (--skip)", file=sys.stderr)
            continue
        t0 = time.monotonic()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name] = round(time.monotonic() - t0, 3)
            print(f"done {name}: {times[name]}s", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — sweep must finish
            times[name] = -1.0
            print(f"ERROR {name}: {e}", file=sys.stderr)
        spark.catalog.clearCache()

    ranked = sorted(times.items(), key=lambda kv: -kv[1])
    total = sum(t for _, t in ranked if t > 0)
    print(f"# {len(ranked)} queries run ({len(skip)} skipped: "
          f"{','.join(skip) or 'none'}), total {total:.1f}s at {sf_dir}")
    for name, t in ranked:
        print(f"{t:8.3f}  {name}")
    if out_json:
        with open(out_json, "w") as f:
            json.dump({"sf_dir": sf_dir, "total_s": round(total, 1),
                       "skipped": skip, "times": dict(ranked)}, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
