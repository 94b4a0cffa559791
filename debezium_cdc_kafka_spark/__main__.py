"""CLI for the engine: list, run, and check queries from a shell.

    python -m debezium_cdc_kafka_spark list
    python -m debezium_cdc_kafka_spark run q01_pricing_summary [--sf DIR] [-n 20]
    python -m debezium_cdc_kafka_spark explain q05_local_supplier_volume
    python -m debezium_cdc_kafka_spark check --only q01_pricing_summary,q06...
    python -m debezium_cdc_kafka_spark pipeline [--sf DIR]

The reference's entry point is `python app/main.py` (reference:
app/main.py:24–33, a generate-vs-consume toggle); this CLI is the
analogous operational surface, widened to the whole query registry.
"""

from __future__ import annotations

import argparse
import sys

DEFAULT_SF = "/root/testdata/sf0.001"


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="debezium_cdc_kafka_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered queries (± = has SQL oracle)")

    run_p = sub.add_parser("run", help="run one query and show its result")
    run_p.add_argument("name")
    run_p.add_argument("--sf", default=DEFAULT_SF)
    run_p.add_argument("-n", type=int, default=20, help="rows to show")

    exp_p = sub.add_parser("explain", help="formatted physical plan for a query")
    exp_p.add_argument("name")
    exp_p.add_argument("--sf", default=DEFAULT_SF)

    chk_p = sub.add_parser("check", help="DuckDB oracle differential check")
    chk_p.add_argument("--sf", default=DEFAULT_SF)
    chk_p.add_argument("--only", default=None)

    pipe_p = sub.add_parser("pipeline", help="end-to-end generator+consumer run")
    pipe_p.add_argument("--workdir", default=None, help="scratch dir (default: temp)")

    args = ap.parse_args(argv)

    from . import registry

    if args.cmd == "list":
        oracles = registry.all_oracles()
        for name in sorted(registry.all_queries()):
            print(f"{'±' if name in oracles else ' '} {name}")
        return 0

    if args.cmd == "check":
        from .oracle_check import main as check_main

        check_argv = ["--sf", args.sf]
        if args.only:
            check_argv += ["--only", args.only]
        return check_main(check_argv)

    from .session import get_spark

    spark = get_spark("cli")
    if args.cmd == "pipeline":
        import tempfile

        from .pipeline import run_pipeline

        workdir = args.workdir or tempfile.mkdtemp(prefix="cdc_pipeline_")
        result = run_pipeline(spark, workdir)
        result.show(20, truncate=False)
        print(f"# replica rows: {result.count()}  (workdir: {workdir})")
        return 0

    queries = registry.all_queries()
    if args.name not in queries:
        print(f"unknown query {args.name!r}; `list` shows all", file=sys.stderr)
        return 2
    df = queries[args.name](spark, args.sf)
    if args.cmd == "explain":
        df.explain("formatted")
    else:
        df.show(args.n, truncate=False)
        print(f"# rows: {df.count()}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
