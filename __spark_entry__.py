"""Driver contract for the spark-graft builder (PySpark target).

``queries()``/``oracle_sql()`` are backed by the flink_spark query registry —
one entry per implemented operator from SURVEY.md §2 (see
flink_spark/queries/). ``entry()`` runs the flagship TPC-H Q1 adaptation.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from flink_spark.queries import get_queries, get_oracles  # noqa: E402
from flink_spark.queries.registry import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["tpch_q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return get_queries()


def oracle_sql() -> dict[str, str]:
    return get_oracles()
