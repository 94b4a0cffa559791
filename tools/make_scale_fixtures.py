"""Regenerate the xN scale-sweep fixtures (SCALE.md r6/r7 sweeps).

Run: python tools/make_scale_fixtures.py OUT_DIR [mult] [--base SF_DIR]

Writes a full 10-table dir: dims (region/nation/customer/supplier/part)
copied verbatim, facts/documents/embeddings replicated `mult` times with
the deterministic constructions every recorded sweep used, so new points
are bit-comparable to the old ones on overlapping keys:

- orders/lineitem: keys offset by 150000*i (FK edges preserved per copy)
- events:          event_id offset by 100000*i, ts shifted +i seconds
- documents:       doc_id offset by 5000*i, text || ' zq{i}x'
- embeddings:      vec_id offset by 2000*i, components shifted +i*0.001

Copy 0 is the base table byte-for-byte (modulo the documented text tail
and n_chars bump), which is what the sweeps' overlap bit-checks assert.
"""

from __future__ import annotations

import shutil
import sys

import duckdb


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    base = "/root/testdata/sf0.1"
    if "--base" in argv:
        i = argv.index("--base")
        base = argv[i + 1]
        del argv[i : i + 2]
    if not argv:
        raise SystemExit("usage: make_scale_fixtures.py OUT_DIR [mult] [--base DIR]")
    out = argv[0]
    mult = int(argv[1]) if len(argv) > 1 else 64

    con = duckdb.connect()
    rep = f"(SELECT unnest(range(0,{mult})) AS i) i"
    for t in ("region", "nation", "customer", "supplier", "part"):
        shutil.copy(f"{base}/{t}.parquet", f"{out}/{t}.parquet")
    con.execute(f"""COPY (
      SELECT o_orderkey + 150000*i.i AS o_orderkey, o_custkey, o_orderstatus,
             o_totalprice, o_orderdate, o_orderpriority
      FROM '{base}/orders.parquet', {rep}) TO '{out}/orders.parquet' (FORMAT PARQUET)""")
    con.execute(f"""COPY (
      SELECT l_orderkey + 150000*i.i AS l_orderkey, l_partkey, l_suppkey,
             l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
             l_returnflag, l_linestatus, l_shipdate
      FROM '{base}/lineitem.parquet', {rep}) TO '{out}/lineitem.parquet' (FORMAT PARQUET)""")
    con.execute(f"""COPY (
      SELECT event_id + 100000*i.i AS event_id, ts + to_seconds(i.i) AS ts,
             user_id, event_type, value, props
      FROM '{base}/events.parquet', {rep}) TO '{out}/events.parquet' (FORMAT PARQUET)""")
    con.execute(f"""COPY (
      SELECT doc_id + 5000*i.i AS doc_id,
             text || ' zq' || CAST(i.i AS VARCHAR) || 'x' AS text,
             lang, source,
             n_chars + 4 + length(CAST(i.i AS VARCHAR)) AS n_chars
      FROM '{base}/documents.parquet', {rep}) TO '{out}/documents.parquet' (FORMAT PARQUET)""")
    con.execute(f"""COPY (
      SELECT e.vec_id + 2000*i.i AS vec_id,
             list_transform(e.embedding, x -> CAST(x + i.i*0.001 AS FLOAT)) AS embedding,
             e.label
      FROM '{base}/embeddings.parquet' e, {rep}) TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")
    for t in ("orders", "lineitem", "events", "documents", "embeddings"):
        n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
