"""Driver-contract smoke tests for __spark_entry__.py."""

from __future__ import annotations

import importlib.util
import sys


def _load_entry():
    spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["__spark_entry__"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_entry_returns_rows(spark):
    mod = _load_entry()
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_contract_shapes(spark):
    mod = _load_entry()
    q = mod.queries()
    o = mod.oracle_sql()
    assert q, "queries() must not be empty"
    assert set(o) <= set(q)
    for name, fn in q.items():
        assert callable(fn), name
