"""Local differential harness: Spark queries vs DuckDB oracles.

Mimics the driver's correctness gate (row-count + schema + order-insensitive
value comparison) so regressions surface before the round boundary.

Run: python -m debezium_cdc_kafka_spark.oracle_check [--sf DIR] [--only name,...]
"""

from __future__ import annotations

import argparse
import math
import sys
from typing import Any

import duckdb

from . import registry
from .catalog import TABLES
from .session import get_spark


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse float-repr noise below the rounding we apply in-query
        r = round(v, 9)
        # -0.0 == 0.0 under ==, but a bit-pattern value-hash (the driver's
        # canonicalizer) distinguishes them — be at least as strict here so
        # a Spark/DuckDB signed-zero disagreement surfaces locally first
        if r == 0.0 and math.copysign(1.0, r) < 0:
            return "-0.0"
        return r
    if isinstance(v, bool):
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return round(float(v), 9)
    except ImportError:
        pass
    return v


def _canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


_DUCK_TO_SPARK = {
    "INTEGER": "int",
    "BIGINT": "bigint",
    "HUGEINT": "decimal(38,0)",
    "SMALLINT": "smallint",
    "TINYINT": "tinyint",
    "DOUBLE": "double",
    "FLOAT": "float",
    "VARCHAR": "string",
    "BOOLEAN": "boolean",
    "DATE": "date",
    "TIMESTAMP": "timestamp",
    "FLOAT[]": "array<float>",
    "DOUBLE[]": "array<double>",
    "BIGINT[]": "array<bigint>",
    "VARCHAR[]": "array<string>",
}


def _duck_schema(con, sql: str) -> dict[str, str]:
    rows = con.execute(f"DESCRIBE ({sql})").fetchall()
    return {r[0]: _DUCK_TO_SPARK.get(r[1], r[1]) for r in rows}


def compare_one(spark, con, sf_dir: str, name: str, fn, sql: str) -> dict:
    res: dict[str, Any] = {"name": name}
    sdf = fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = list(sdf.columns)
    stypes = dict(sdf.dtypes)
    otypes = _duck_schema(con, sql)
    type_diffs = {
        c: (stypes.get(c), otypes.get(c))
        for c in set(stypes) | set(otypes)
        if stypes.get(c) != otypes.get(c)
    }
    if type_diffs:
        res["type_diffs"] = type_diffs
    orel = con.execute(sql)
    ocols = [d[0] for d in orel.description]
    orows = [tuple(r) for r in orel.fetchall()]
    res["spark_rows"] = len(srows)
    res["oracle_rows"] = len(orows)
    res["cols_match"] = sorted(scols) == sorted(ocols)
    if not res["cols_match"]:
        res["spark_cols"] = sorted(scols)
        res["oracle_cols"] = sorted(ocols)
        res["ok"] = False
        return res
    a = _canon_rows(scols, srows)
    b = _canon_rows(ocols, orows)
    res["rows_match"] = len(a) == len(b)
    mism = [i for i, (x, y) in enumerate(zip(a, b)) if x != y]
    res["value_mismatches"] = len(mism) + abs(len(a) - len(b))
    if mism:
        i = mism[0]
        res["first_diff"] = {"spark": a[i], "oracle": b[i]}
    res["ok"] = res["rows_match"] and not mism and not type_diffs
    return res


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--only", default=None)
    ap.add_argument(
        "--json",
        default=None,
        help="also write the per-query result dicts to this path",
    )
    args = ap.parse_args(argv)

    queries = registry.all_queries()
    oracles = registry.all_oracles()
    names = sorted(queries)
    if args.only:
        wanted = [n for n in args.only.split(",") if n]
        unknown = sorted(set(wanted) - set(names))
        if unknown:
            # A typo'd --only that silently skips looks like success
            # (VERDICT r4 item 4) — fail loudly before spinning up Spark.
            raise SystemExit(
                f"--only names not in the registry: {', '.join(unknown)}"
            )
        only = set(wanted)
        names = [n for n in names if n in only]

    spark = get_spark("oracle_check", cpus="8")
    con = duckdb_connect(args.sf)

    failures = 0
    results: dict[str, dict] = {}
    for name in names:
        if name not in oracles:
            try:
                n = queries[name](spark, args.sf).count()
                results[name] = {"name": name, "ok": True, "rows_only": True,
                                 "spark_rows": n}
                print(f"  ~ {name}: no oracle, rows={n}")
            except Exception as e:  # noqa: BLE001
                failures += 1
                results[name] = {"name": name, "ok": False, "rows_only": True,
                                 "err": f"{type(e).__name__}: {e}"}
                print(f"  ✗ {name}: ERROR {e}")
            continue
        try:
            r = compare_one(spark, con, args.sf, name, queries[name], oracles[name])
        except Exception as e:  # noqa: BLE001
            failures += 1
            results[name] = {"name": name, "ok": False,
                             "err": f"{type(e).__name__}: {e}"}
            print(f"  ✗ {name}: ERROR {type(e).__name__}: {e}")
            continue
        finally:
            # queries may persist() internally; keep runs independent
            spark.catalog.clearCache()
        results[name] = r
        if r["ok"]:
            print(f"  ✓ {name}: rows={r['spark_rows']}")
        else:
            failures += 1
            print(f"  ✗ {name}: {r}")
    print(f"{len(names) - failures}/{len(names)} ok at {args.sf}")
    if args.json:
        import json

        with open(args.json, "w") as fh:
            json.dump(results, fh, indent=1, default=str)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
