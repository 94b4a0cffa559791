"""Edge semantics for the repetition filter and entropy scoring.

The oracle gate proves corpus-level parity; these tests pin the boundary
cases synthetic corpora may never hit: fully degenerate repetition,
single-word docs (no bigrams), and the zero-entropy floor.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from debezium_cdc_kafka_spark.operators.text import _entropy
from debezium_cdc_kafka_spark.functions.textfns import tokens


def _metrics(spark, text):
    from debezium_cdc_kafka_spark.operators import text as T

    df = spark.createDataFrame(
        [(1, text, "en", "unit", len(text))],
        "doc_id int, text string, lang string, source string, n_chars int",
    )
    df.createOrReplaceTempView("__docs_tmp")
    # Drive the same column expressions the operator uses, on a local frame.
    tok = tokens(F.col("text"))
    t = df.select("doc_id", tok.alias("tok"))
    bg = F.when(
        F.size("tok") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("tok") - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(F.col("tok"), i), F.element_at(F.col("tok"), i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    b = t.select("tok", bg.alias("bg"))
    top = F.array_max(
        F.transform(
            F.array_distinct("bg"),
            lambda x: F.size(F.filter(F.col("bg"), lambda y: y == x)),
        )
    )
    row = b.select(
        F.round(1.0 - F.size(F.array_distinct("tok")) / F.size("tok"), 6).alias("dw"),
        F.when(F.size("bg") > 0, F.round(top / F.size("bg"), 6)).otherwise(0.0).alias("tb"),
    ).first()
    return row.dw, row.tb


def test_degenerate_repetition_is_flagged(spark):
    dw, tb = _metrics(spark, "spam " * 50)
    assert dw == round(1.0 - 1.0 / 50, 6)
    assert tb == 1.0  # every bigram is "spam spam"


def test_all_distinct_words_pass(spark):
    dw, tb = _metrics(spark, "alpha beta gamma delta epsilon")
    assert dw == 0.0
    assert tb == 0.25  # 4 bigrams, all distinct


def test_single_word_doc_has_no_bigrams(spark):
    dw, tb = _metrics(spark, "lonely")
    assert dw == 0.0
    assert tb == 0.0


def test_entropy_floor_and_uniform(spark):
    df = spark.createDataFrame([(["a", "a", "a", "a"],), (["a", "b", "c", "d"],)], "xs array<string>")
    vals = [r.h for r in df.select(_entropy(F.col("xs")).alias("h")).collect()]
    assert vals[0] == 0.0  # degenerate → zero entropy (and not -0.0)
    assert math.isclose(vals[1], 2.0, abs_tol=1e-9)  # uniform over 4 symbols
