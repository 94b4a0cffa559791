"""File-format source readers beyond Parquet: CSV and JSON lines.

The reference ingests only via Kafka; an analytics engine's batch surface
also needs the lake's interchange formats. Schemas are ALWAYS explicit —
`inferSchema` double-reads the data and guesses types, both wrong at
100 TB (and wrong for correctness: inference can flip int/double between
files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Headered CSV with explicit schema; malformed lines are contained in
    PERMISSIVE mode (nulled columns), mirroring the CDC malformed-message
    posture rather than failing the scan."""
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """JSON-lines with explicit schema. Unknown fields are ignored (the
    schema is the contract), corrupt lines null out under PERMISSIVE."""
    return spark.read.schema(schema).json(path)


def write_csv(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("header", "true").csv(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)
