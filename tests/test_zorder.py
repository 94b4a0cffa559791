"""Z-order layout payoff: a 2-D box predicate over a Morton-clustered
layout must touch far fewer files than the same predicate over a
hash-distributed layout. `input_file_name()` on the filtered rows counts
the files that actually contain matches — the files min/max skipping
would read. (The z-key itself is oracle-gated as q_zorder_key; this test
measures the layout effect the oracle can't see.)
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from debezium_cdc_kafka_spark.catalog import load_table
from debezium_cdc_kafka_spark.operators.layout import zorder_write
from tests.conftest import SF_ORACLE

_N_FILES = 16


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("zorder"))
    li = load_table(spark, SF_ORACLE, "lineitem").withColumn(
        "ship_day", F.datediff("l_shipdate", F.lit("1992-01-01").cast("timestamp"))
    )
    zp, hp = os.path.join(d, "z"), os.path.join(d, "h")
    zorder_write(li, "l_partkey", "ship_day", zp, _N_FILES)
    li.repartition(_N_FILES).write.mode("overwrite").parquet(hp)
    return zp, hp


def _box(df):
    return df.filter(
        F.col("l_partkey").between(64, 127) & F.col("ship_day").between(1024, 1279)
    )


def test_zorder_concentrates_box_queries(spark, layouts):
    zp, hp = layouts
    z_rows = _box(spark.read.parquet(zp))
    h_rows = _box(spark.read.parquet(hp))
    # Same data in both layouts.
    assert z_rows.count() == h_rows.count() > 0
    z_files = z_rows.select(F.input_file_name()).distinct().count()
    h_files = h_rows.select(F.input_file_name()).distinct().count()
    # Hash layout scatters matches across ~every file; z-order packs the
    # whole box into a handful (measured: 1 vs 16 at sf0.01).
    assert h_files >= _N_FILES * 3 // 4
    assert z_files <= 4


def test_z_value_is_bijective_on_grid(spark):
    """Interleaving must be invertible: on a 64×64 grid every (a, b)
    gets a distinct z, and de-interleaving the even/odd bits recovers
    the inputs exactly."""
    from pyspark.sql import functions as F

    from debezium_cdc_kafka_spark.operators.layout import z_value

    grid = (
        spark.range(64)
        .select(F.col("id").alias("a"))
        .crossJoin(spark.range(64).select(F.col("id").alias("b")))
    )
    z = grid.withColumn("z", z_value(F.col("a"), F.col("b")))
    assert z.select("z").distinct().count() == 64 * 64
    back = z.select(
        "a",
        "b",
        F.aggregate(
            F.sequence(F.lit(0), F.lit(15)),
            F.lit(0).cast("long"),
            lambda acc, i: acc
            + (F.floor(F.col("z") / F.pow(F.lit(2.0), i * 2)).cast("long") % 2)
            * F.pow(F.lit(2.0), i).cast("long"),
        ).alias("a2"),
        F.aggregate(
            F.sequence(F.lit(0), F.lit(15)),
            F.lit(0).cast("long"),
            lambda acc, i: acc
            + (F.floor(F.col("z") / F.pow(F.lit(2.0), i * 2 + 1)).cast("long") % 2)
            * F.pow(F.lit(2.0), i).cast("long"),
        ).alias("b2"),
    )
    assert back.filter((F.col("a") != F.col("a2")) | (F.col("b") != F.col("b2"))).count() == 0
