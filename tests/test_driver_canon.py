"""Driver-canonicalizer compatibility gate.

The external driver's correctness harness canonicalizes query output with a
pandas ``sort_values`` over every column and a value hash; a cell holding a
Python list/dict (i.e. any array/map/struct-typed output column) raises
``TypeError: unhashable type`` inside pandas and turns the row RED even when
the values are correct — exactly what happened to q_embedding_quantize,
q_jl_projection and q_inverted_index in CORRECTNESS_r03.json. Those now emit
','-joined scalar strings instead.

This test pins the contract so it cannot recur: every registered query's
output schema must be atomic-typed unless the query is explicitly
whitelisted as local-oracle-only (compared with tuple-aware logic by
``oracle_check``, never by the driver — registry.GATE_ORDER must not contain
whitelisted names).

Schema-only: each query DataFrame is BUILT (a few trigger bounded driver
jobs during construction) but never executed, so the whole 173-query sweep
stays cheap.
"""

from __future__ import annotations

from pyspark.sql.types import ArrayType, MapType, StructType

from debezium_cdc_kafka_spark import registry

SF_SMOKE = "/root/testdata/sf0.001"

# Queries allowed to emit complex-typed columns. Must stay OUTSIDE
# registry.GATE_ORDER (enforced below): the driver cannot hash them.
COMPLEX_OK: set[str] = set()


def test_gate_window_is_exactly_the_first_50():
    qs = list(registry.all_queries())
    assert qs[:50] == registry.GATE_ORDER
    assert len(set(registry.GATE_ORDER)) == 50


def test_gated_queries_all_have_oracles():
    oracles = registry.all_oracles()
    missing = [n for n in registry.GATE_ORDER if n not in oracles]
    assert not missing, f"gated queries without oracle SQL: {missing}"


def test_no_query_output_breaks_driver_canonicalizer(spark):
    assert not (COMPLEX_OK & set(registry.GATE_ORDER)), (
        "complex-typed queries must not occupy gated window slots"
    )
    bad: dict[str, list[str]] = {}
    for name, fn in registry.all_queries().items():
        if name in COMPLEX_OK:
            continue
        df = fn(spark, SF_SMOKE)
        complex_cols = [
            f"{f.name}:{f.dataType.simpleString()}"
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if complex_cols:
            bad[name] = complex_cols
    assert not bad, (
        "queries with driver-unhashable (array/map/struct) output columns "
        f"(stringify with array_join/to_json or whitelist in COMPLEX_OK): {bad}"
    )
