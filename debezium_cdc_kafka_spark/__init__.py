"""debezium_cdc_kafka_spark — a PySpark-native analytics + CDC engine.

A brand-new engine with the query and data-processing capabilities of the
reference CDC pipeline (KimAleksey/Debezium-CDC-Kafka: Postgres → Debezium →
Kafka → consumer → target DB), re-expressed Spark-first:

- CDC semantics (Debezium envelope decode, op dispatch, last-event-wins
  merge, at-least-once→effectively-once replay) via Structured Streaming
  and declarative DataFrame plans (see ``operators.cdc`` and
  ``streaming.cdc_stream``).
- The relational surface the reference exercises through embedded DuckDB /
  Postgres (projection, filters, joins, aggregation, windows, DDL/DML)
  via the DataFrame/SQL API with Catalyst doing the planning
  (``operators.relational``).
- Large-scale training-data pipeline operators: dedup (exact, MinHash-LSH,
  SimHash, n-gram Jaccard, embedding near-dup), similarity search, text
  analysis, multimodal column plumbing (``operators.dedup``,
  ``operators.similarity``, ``operators.text``, ``operators.multimodal``).

Everything is designed for a 1000-executor / 100 TB deployment even though
tests run on ``local[32]``: no driver-side loops on data paths, broadcast
hints for dimension tables, map-side partial aggregation, salting/AQE notes
where keys can skew.
"""

__version__ = "0.1.0"
