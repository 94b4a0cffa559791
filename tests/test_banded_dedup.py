"""Third-engine replay of dedup_embedding_cosine_banded (r7).

Beside the Spark implementation and its DuckDB oracle, this recomputes
the whole banded pipeline in plain Python from the raw parquet — md5
plane weights, adaptive band width, sign bits, bucket-join candidates,
exact cosine verify — and pins two semantic properties the hash gate
alone can't express:

- SUBSET: every banded pair is also an exact-baseline pair (the verify
  threshold is identical, so banding can only DROP pairs, never invent
  or perturb one);
- RECALL FLOOR: at the checked-in SFs (b = 1, 4 bands) the banding must
  miss at most max(1, 10%) of the exact baseline pairs (measured 98.8%
  at x1 — SCALE.md r7; the floor leaves slack for fixture regeneration,
  not for a broken band join).
"""

from __future__ import annotations

import hashlib
import math

import pyarrow.parquet as pq
import pytest

from debezium_cdc_kafka_spark.operators.dedup import (
    _BAND_MAX_BITS,
    _BAND_R,
    _BAND_TARGET,
    dedup_embedding_cosine,
    dedup_embedding_cosine_banded,
)

SF = "/root/testdata/sf0.001"


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _plane_w(p: int, d: int) -> float:
    return ((_md5_long(f"{p}:{d}") % 2001) - 1000) / 1000.0


def _python_banded(sf_dir: str) -> dict[tuple[int, int], float]:
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    rows = list(
        zip(
            t.column("vec_id").to_pylist(),
            t.column("embedding").to_pylist(),
            t.column("label").to_pylist(),
        )
    )
    per_label: dict[int, int] = {}
    for _, _, lab in rows:
        per_label[lab] = per_label.get(lab, 0) + 1
    mx = max(per_label.values())
    b = max(1, min(_BAND_MAX_BITS, math.ceil(math.log2(mx / _BAND_TARGET))))
    planes = [
        [_plane_w(p, d) for d in range(1, 65)] for p in range(_BAND_R * b)
    ]
    # (label, band, bits) -> member vec ids, via sequential float64 folds
    sig: dict[tuple[int, int, int], list[int]] = {}
    emb = {}
    for vid, e, lab in rows:
        emb[vid] = e
        for band in range(_BAND_R):
            bits = 0
            for i in range(b):
                dot = 0.0
                w = planes[band * b + i]
                for k in range(64):
                    dot += w[k] * float(e[k])
                if dot > 0:
                    bits |= 1 << i
            sig.setdefault((lab, band, bits), []).append(vid)
    cand = set()
    for members in sig.values():
        ms = sorted(members)
        for i, v1 in enumerate(ms):
            for v2 in ms[i + 1 :]:
                cand.add((v1, v2))
    out = {}
    for v1, v2 in cand:
        e1, e2 = emb[v1], emb[v2]
        dot = n1 = n2 = 0.0
        for k in range(64):
            x, y = float(e1[k]), float(e2[k])
            dot += x * y
            n1 += x * x
            n2 += y * y
        cos = dot / math.sqrt(n1 * n2)
        if cos >= 0.4:
            out[(v1, v2)] = round(cos, 3)
    return out


@pytest.fixture(scope="module")
def spark_banded(spark):
    return {
        tuple(r[:2]): r[2]
        for r in dedup_embedding_cosine_banded(spark, SF).collect()
    }


def test_spark_matches_python_replay(spark_banded):
    want = _python_banded(SF)
    assert spark_banded == want


def test_banded_is_subset_of_exact_with_recall_floor(spark, spark_banded):
    exact = {
        tuple(r[:2]): r[2] for r in dedup_embedding_cosine(spark, SF).collect()
    }
    extras = set(spark_banded) - set(exact)
    assert not extras, f"banded invented pairs not in the exact baseline: {extras}"
    for k, cos in spark_banded.items():
        assert exact[k] == cos  # identical verify => identical cosine
    # sf0.001 has only 5 qualifying pairs, one of which sits at the
    # banding boundary (banded finds 4/5 here, 85/86 at sf0.1, 5/5 at
    # sf0.01 — SCALE.md r7), so the floor is count-aware: at most
    # max(1, 10% of exact) pairs may be missing.
    missing = len(exact) - len(spark_banded)
    assert missing <= max(1, len(exact) // 10), (
        f"recall {len(spark_banded)}/{len(exact)} under the floor"
    )
