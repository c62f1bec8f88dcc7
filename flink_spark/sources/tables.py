"""Parquet table loaders for the test-data star schema.

Mirrors the reference's filesystem connector surface (a declared table over
partitioned files; see reference flink-connector-files FileSystemTableSource)
as plain ``spark.read.parquet`` — scans stay vectorized/columnar and Catalyst
pushes filters and projections into the parquet reader.

The ``events`` table needs one normalization: the driver wrote its ``ts``
column as parquet TIMESTAMP(NANOS), which Spark's reader rejects. With
``spark.sql.legacy.parquet.nanosAsLong`` the column arrives as raw int64
nanos; we convert to TIMESTAMP_NTZ with integer µs division — a codegen'd
JVM expression, zero Python cost, exactly DuckDB's nanos→micros truncation.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_spark.session import prepare_session

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Inferred parquet schemas keyed by (path, mtime): the declared-schema
#: catalog every real deployment has (Flink DDL declares table schemas;
#: Spark metastore tables carry theirs). Without it every
#: ``spark.read.parquet`` launches a driver-side footer-inference job —
#: ~0.1-0.15 s each on the bench box, one per table per query. Metadata
#: only (a StructType), never row data; keyed on mtime so a rewritten
#: path re-infers.
_SCHEMA_CACHE: dict[tuple[str, float], object] = {}


def table_schema(spark: SparkSession, path: str):
    """Schema of the parquet file/dir at ``path``, cached per (path,
    mtime, nanos-mode). The nanos flag joins the key because inference
    maps TIMESTAMP(NANOS) to bigint only under it — a session where
    ``prepare_session`` could not set the flag must not share entries
    with one where it could.

    Invalidation invariant (ADVICE r12): for a DIRECTORY path the mtime
    is the directory's own, which changes when entries are added/removed
    but NOT when a contained file is overwritten in place. Every writer
    in this engine (and the testdata generator) replaces tables by
    delete-and-recreate, which bumps it; a deployment that rewrites
    part-files in place under a long-lived driver must bust the cache
    (new path or touch the dir)."""
    try:
        mtime = os.path.getmtime(path)
    except OSError:
        mtime = -1.0
    try:
        nanos = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong")
    except Exception:
        nanos = "unset"
    key = (path, mtime, nanos)
    schema = _SCHEMA_CACHE.get(key)
    if schema is None:
        schema = spark.read.parquet(path).schema
        _SCHEMA_CACHE[key] = schema
    return schema


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table; normalizes the events nanos timestamp."""
    prepare_session(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.schema(table_schema(spark, path)).parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.expr("CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP_NTZ)")
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register tables as temp views for spark.sql use."""
    for n, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(n)
