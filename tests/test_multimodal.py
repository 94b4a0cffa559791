"""Multimodal plumbing tests: binary columns, Arrow-batched decode stubs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from debezium_cdc_kafka_spark.catalog import load_table
from debezium_cdc_kafka_spark.operators.multimodal import (
    extract_features,
    resize_stub,
    with_blob,
)
from tests.conftest import SF_SMOKE


def test_blob_schema_and_payload_roundtrip(spark):
    blobs = with_blob(load_table(spark, SF_SMOKE, "documents"))
    assert dict(blobs.dtypes)["payload"] == "binary"
    row = blobs.filter("doc_id = 0").select(
        "payload", "meta.n_bytes", F.decode("payload", "UTF-8").alias("text_back")
    ).first()
    assert isinstance(row.payload, (bytes, bytearray))
    assert len(row.payload) == row.n_bytes
    orig = load_table(spark, SF_SMOKE, "documents").filter("doc_id = 0").first().text
    assert row.text_back == orig


def test_extract_features_deterministic(spark):
    blobs = with_blob(load_table(spark, SF_SMOKE, "documents"))
    feats = extract_features(blobs)
    rows = {r.doc_id: r for r in feats.collect()}
    assert len(rows) == 500
    r0 = rows[0]
    assert 64 <= r0.width < 128 and 64 <= r0.height < 128 and r0.n_frames == 1
    assert 0.0 <= r0.brightness <= 1.0
    # deterministic: a second run yields identical features
    rows2 = {r.doc_id: r for r in extract_features(blobs).collect()}
    assert all(tuple(rows[k]) == tuple(rows2[k]) for k in rows)


def test_real_format_raises(spark):
    blobs = with_blob(load_table(spark, SF_SMOKE, "documents").limit(5)).withColumn(
        "meta",
        F.struct(
            F.lit("image/png").alias("format"),
            F.col("meta.n_bytes").alias("n_bytes"),
            F.col("meta.digest").alias("digest"),
            F.col("meta.origin").alias("origin"),
        ),
    )
    with pytest.raises(Exception, match="no codec"):
        extract_features(blobs).collect()


def test_resize_stub_identity(spark):
    blobs = with_blob(load_table(spark, SF_SMOKE, "documents").limit(10))
    out = resize_stub(blobs, 32, 32)
    assert out.count() == 10
    assert dict(out.dtypes)["payload"] == "binary"
