"""Capture `.explain("formatted")` for bench queries into plans/<round>/.

Run: python tools/capture_plans.py <round> <suffix> [name1,name2,...]

Writes plans/<round>/<query>_<suffix>.txt for each headline+extended query
(or the given subset). The judge checks optimization claims (exchange
counts, join strategies, pushdown) against these files, so they are the
canonical before/after plan evidence for the optimization rounds.

(r10, per ADVICE r9: the round/output dir is an argument instead of a
hardcoded r09 constant, and the between-query cleanup uses
session.release_persisted so a query that materializes localCheckpoint
blocks during plan BUILD cannot leak pinned blocks into later captures.)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from pyspark.sql import DataFrame  # noqa: E402

from bench import EXTENDED, HEADLINE  # noqa: E402
from debezium_cdc_kafka_spark import registry  # noqa: E402
from debezium_cdc_kafka_spark.session import get_spark, release_persisted  # noqa: E402


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def main() -> int:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "r10"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = (
        sys.argv[3].split(",")
        if len(sys.argv) > 3
        else HEADLINE + EXTENDED
    )
    out_dir = os.path.join(os.path.dirname(__file__), "..", "plans", rnd)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-plans")
    queries = registry.all_queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = formatted_plan(df)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} — explain(formatted) at {sf_dir} [{suffix}]\n")
            fh.write(plan)
        exchanges = plan.count("Exchange")
        print(f"{name}: {exchanges} Exchange, wrote {path}", file=sys.stderr)
        release_persisted(spark)
    return 0


if __name__ == "__main__":
    sys.exit(main())
