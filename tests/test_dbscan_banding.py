"""DBSCAN banded candidate generation: once-per-pair emission (r9).

The r9 ×256 run exposed the r8 multi-emission form's failure shape at
near-duplicate density: a pair colliding in several bands was emitted
once per collision, and when most candidates survive the eps filter the
post-filter distinct shuffles the survivor frame WITH its ×R band
multiplicity. The fix keeps a collision only in the FIRST band where
the two bit arrays agree. These tests pin the two claims that fix
rests on, with the block cap forced down so the multi-band (b > 0)
path actually engages on the small fixture:

1. candidate SET is identical to the multi-emission form's distinct;
2. the single-emission frame has NO duplicates (what lets
   q_dbscan_clusters drop edges.distinct() without corrupting degrees).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from debezium_cdc_kafka_spark.catalog import load_table
from debezium_cdc_kafka_spark.operators.similarity import (
    _db_banding,
    _db_candidates,
)

SF = "/root/testdata/sf0.01"


def _frames(spark, cap):
    emb = load_table(spark, SF, "embeddings")
    bands, bits_real = _db_banding(spark, emb, cap=cap)
    return emb, bands, bits_real


def test_multi_band_engages_with_low_cap(spark):
    emb, bands, _ = _frames(spark, cap=8)
    assert bands.count() > 1, "cap=8 must force b > 0 (multi-band path)"


def test_single_emission_equals_multi_emission_distinct(spark):
    emb, bands, bits_real = _frames(spark, cap=8)
    new = _db_candidates(spark, emb, bands, bits_real, first_band_only=True)
    old = _db_candidates(
        spark, emb, bands, bits_real, first_band_only=False
    ).distinct()
    sym_diff = new.exceptAll(old).union(old.exceptAll(new.distinct()))
    assert sym_diff.count() == 0


def test_single_emission_has_no_duplicates(spark):
    emb, bands, bits_real = _frames(spark, cap=8)
    new = _db_candidates(spark, emb, bands, bits_real, first_band_only=True)
    dups = (
        new.groupBy("v1", "v2")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .count()
    )
    assert dups == 0
    # and multi-emission DOES duplicate here — i.e. this test would
    # catch a regression to the old form
    old_total = _db_candidates(
        spark, emb, bands, bits_real, first_band_only=False
    ).count()
    assert old_total > new.count()


def test_default_cap_b0_path_unchanged(spark):
    """At the checked-in SF the cap doesn't engage (b = 0, one band):
    single- and multi-emission are identical frames — the oracle-gated
    configuration is untouched by construction."""
    emb, bands, bits_real = _frames(spark, cap=1024)
    assert bands.count() == 1
    new = _db_candidates(spark, emb, bands, bits_real, first_band_only=True)
    old = _db_candidates(spark, emb, bands, bits_real, first_band_only=False)
    assert new.exceptAll(old).union(old.exceptAll(new)).count() == 0
