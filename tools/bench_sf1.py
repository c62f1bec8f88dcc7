"""sf1 rehearsal bench (BASELINE.md r8): the 32-query headline plus the
five slowest extras, two-pass per-query min, at /tmp/flink_spark_sf1
(tools/gen_sf1.py) — printing per-query sf0.1 -> sf1 wall ratios against
a fresh sf0.1 run in the same process (same JVM/contention conditions).

Usage: python tools/bench_sf1.py
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import HEADLINE, time_suite  # noqa: E402

SLOW_EXTRAS = [
    "stream_delta_join_ttl",
    "llm_vector_search_sql_ann",
    "llm_pq_topk",
    "llm_dedup_clusters",
    "stream_delta_join_left",
]


def main() -> None:
    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/flink_spark_sf1"
    sf01_dir = "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from flink_spark.session import get_spark
    from flink_spark.queries.registry import QUERIES

    spark = get_spark("flink_spark-bench-sf1", cpus=cpus)
    names = [n for n in HEADLINE + SLOW_EXTRAS if n in QUERIES]
    QUERIES[names[0]].fn(spark, sf01_dir).collect()  # warm the JVM

    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))
    t01 = time_suite(spark, names, sf01_dir, passes, QUERIES)
    t1 = time_suite(spark, names, sf1_dir, passes, QUERIES)

    ratios = {
        n: round(t1[n] / t01[n], 2) if t01[n] > 0 else None for n in names
    }
    out = {
        "metric": "sf1_rehearsal",
        "sf01_total": round(sum(t01.values()), 2),
        "sf1_total": round(sum(t1.values()), 2),
        "sf01": t01,
        "sf1": t1,
        "ratio": ratios,
        "flagged_over_3x": {n: r for n, r in ratios.items() if r and r > 3},
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
