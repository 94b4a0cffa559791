"""Interchange-format round-trips: each format must reproduce the
parquet-sourced DataFrame exactly (values AND schema) when read back
with the explicit schema. orders exercises timestamps (the lossy case
for text formats), customer exercises doubles + strings.
"""

from __future__ import annotations

import os

import pytest

from debezium_cdc_kafka_spark.catalog import load_table
from debezium_cdc_kafka_spark.sources.files import read_interchange, write_interchange
from tests.conftest import SF_SMOKE


@pytest.mark.parametrize("fmt", ["csv", "json", "orc"])
@pytest.mark.parametrize("table", ["customer", "orders"])
def test_roundtrip_preserves_values_and_schema(spark, tmp_path, fmt, table):
    src = load_table(spark, SF_SMOKE, table)
    path = os.path.join(str(tmp_path), f"{table}_{fmt}")
    write_interchange(src, path, fmt)
    back = read_interchange(spark, path, fmt, src.schema)
    assert back.schema == src.schema
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in src.collect()}


def test_unknown_format_rejected(spark):
    src = load_table(spark, SF_SMOKE, "customer")
    with pytest.raises(ValueError):
        write_interchange(src, "/tmp/x", "avro")
