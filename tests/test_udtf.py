"""Python UDTF parity: the table-function form of chunking must emit
exactly the spans the pure-column q_doc_chunking derives."""

from __future__ import annotations

from debezium_cdc_kafka_spark.catalog import register_views
from debezium_cdc_kafka_spark.functions.udtfs import register_udtfs
from debezium_cdc_kafka_spark.operators.text import q_doc_chunking
from tests.conftest import SF_SMOKE


def test_udtf_chunk_spans_match_column_form(spark):
    register_views(spark, SF_SMOKE)
    register_udtfs(spark)
    got = {
        tuple(r)
        for r in spark.sql(
            """
            SELECT d.doc_id, c.chunk_idx, c.start_off, c.chunk_len
            FROM documents d, LATERAL chunk_spans(CAST(d.n_chars AS INT), 500, 400) c
            """
        ).collect()
    }
    expected = {
        tuple(r)
        for r in q_doc_chunking(spark, SF_SMOKE)
        .select("doc_id", "chunk_idx", "start_off", "chunk_len")
        .collect()
    }
    assert got == expected
    assert len(got) > 500
