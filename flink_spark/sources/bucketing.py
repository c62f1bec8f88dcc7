"""Bucketed tables: pre-shuffled storage for co-located joins/aggs.

Reference surface: Flink's sink partitioning + `SINK_BUCKET` /
connector bucketing (e.g. filesystem sink `sink.bucket.*`, and the
planner's exchange-removal when inputs share a hash distribution,
flink-table-planner .../physical/batch/BatchPhysicalExchange removal
rules). Spark's native analog is `bucketBy` managed tables: rows are
hash-partitioned into a fixed bucket count AT WRITE TIME, and Catalyst
drops the Exchange on any subsequent equi-join/agg keyed on the bucket
columns when both sides share the layout.

At 100 TB this converts every fact-fact join on the bucket key from a
full two-sided shuffle into a zip of pre-sorted buckets — the single
biggest repeat-query saving available, paid once at ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) managed table."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort:
        w = w.sortBy(*bucket_cols)
    w.saveAsTable(table)


def ensure_database(spark: SparkSession, name: str, location: str) -> None:
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name} LOCATION '{location}'")


def shuffle_free_join(spark: SparkSession, left: str, right: str,
                      on: list[str], how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on their bucket columns. With matching
    bucket counts Catalyst plans SortMergeJoin WITHOUT Exchange on either
    side (verify with .explain: no `Exchange hashpartitioning`)."""
    return spark.table(left).join(spark.table(right), on, how)
