"""Dump .explain('formatted') for a list of queries to <outdir>/.

Usage: python tools/dump_plans.py <outdir> <suffix> <query> [<query> ...]

Writes <outdir>/<query>_<suffix>.txt for each query — pass the full
destination (e.g. ``plans/r13``); the script uses it verbatim. For queries whose
entry point drains a stream and returns a store read (the foreachBatch
operators), the captured plan is the returned DataFrame's — the per-batch
plan shape is documented separately in OPTIMIZATION_r12.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)

    from flink_spark.session import get_spark
    from flink_spark.queries.registry import QUERIES
    import flink_spark.queries  # noqa: F401  (registers)

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan-dump")
    for name in names:
        df = QUERIES[name].fn(spark, sf)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
