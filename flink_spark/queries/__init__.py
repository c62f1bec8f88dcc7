"""Query registry: every implemented operator from SURVEY.md §2 registers a
named query (Spark DataFrame program) plus, where SQL-expressible, an exact
DuckDB oracle. The driver (and our pytest gate) runs both at sf0.01 and
hash-matches results.

Importing this package populates the registry.
"""

from flink_spark.queries.registry import QUERIES, query, get_queries, get_oracles

# Import for registration side effects.
from flink_spark.queries import tpch  # noqa: F401
from flink_spark.queries import relational  # noqa: F401
from flink_spark.queries import analytic  # noqa: F401
from flink_spark.queries import functions_suite  # noqa: F401
from flink_spark.queries import windows_suite  # noqa: F401
from flink_spark.queries import llm_suite  # noqa: F401
from flink_spark.queries import streaming_suite  # noqa: F401
from flink_spark.queries import cep_suite  # noqa: F401
from flink_spark.queries import functions_suite2  # noqa: F401
from flink_spark.queries import lookup_suite  # noqa: F401
from flink_spark.queries import agg_suite  # noqa: F401
from flink_spark.queries import ml_async_suite  # noqa: F401
from flink_spark.queries import functions_suite3  # noqa: F401
from flink_spark.queries import pipeline_suite  # noqa: F401
from flink_spark.queries import functions_suite4  # noqa: F401
from flink_spark.queries import functions_suite5  # noqa: F401
from flink_spark.queries import tpcds_shapes  # noqa: F401
from flink_spark.queries import ddl_suite  # noqa: F401

__all__ = ["QUERIES", "query", "get_queries", "get_oracles"]
