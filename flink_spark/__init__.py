"""flink_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of a streaming-first dataflow engine
(reference: apache/flink), re-expressed Spark-first.

Architecture (see SURVEY.md §7):
  - DataFrame/Spark SQL declares logical plans; Catalyst/Tungsten pick
    physical strategy (codegen, pushdown, AQE, broadcast).
  - Operators the built-ins lack (window TVFs beyond tumble/hop/session,
    as-of joins, streaming top-n, minhash dedup, vector search) are
    compositions of DataFrame ops first, Arrow-batched pandas UDFs second.
  - Streaming = Structured Streaming with watermarks; changelog semantics
    via an explicit `op` column protocol (flink_spark.streaming.changelog).
"""

from flink_spark.session import get_spark, prepare_session
from flink_spark.sources.tables import load_table, load_tables
from flink_spark.catalog import TableEnvironment

__all__ = [
    "get_spark",
    "prepare_session",
    "load_table",
    "load_tables",
    "TableEnvironment",
]

__version__ = "0.1.0"
