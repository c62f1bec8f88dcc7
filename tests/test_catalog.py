"""TableEnvironment / DDL-dialect layer tests (SURVEY §2.15, §1.4):
CREATE TABLE ... WITH ('connector'=...), WATERMARK DDL lowering, type
mapping, and the connector registry (filesystem/values/datagen/rate)."""

from __future__ import annotations

import pytest

from flink_spark.catalog import TableEnvironment, _map_type


def test_type_mapping():
    assert _map_type("STRING") == "STRING"
    assert _map_type("TIMESTAMP(3)") == "TIMESTAMP_NTZ"
    assert _map_type("TIMESTAMP_LTZ(3)") == "TIMESTAMP"
    assert _map_type("DECIMAL(10,2)") == "DECIMAL(10,2)"
    assert _map_type("ARRAY<INT>") == "ARRAY<INT>"
    assert _map_type("VARCHAR(255)") == "STRING"


def test_filesystem_connector(spark, sf_dir):
    env = TableEnvironment(spark)
    env.execute_sql(f"""
        CREATE TABLE nat (
          n_nationkey INT,
          n_name STRING,
          n_regionkey INT
        ) WITH (
          'connector' = 'filesystem',
          'path' = '{sf_dir}/nation.parquet',
          'format' = 'parquet'
        )
    """)
    assert env.sql_query("SELECT COUNT(*) AS n FROM nat").collect()[0].n == 25
    top = env.sql_query(
        "SELECT n_name FROM nat ORDER BY n_nationkey LIMIT 1"
    ).collect()
    assert top[0].n_name == "NATION_0"


def test_values_connector(spark):
    env = TableEnvironment(spark)
    env.execute_sql("""
        CREATE TABLE v (a STRING, b STRING)
        WITH ('connector' = 'values', 'data' = 'x|1;y|2')
    """)
    rows = {(r.a, r.b) for r in env.sql_query("SELECT * FROM v").collect()}
    assert rows == {("x", "1"), ("y", "2")}


def test_datagen_connector_sequence(spark):
    env = TableEnvironment(spark)
    env.execute_sql("""
        CREATE TABLE g (id BIGINT, name STRING)
        WITH ('connector' = 'datagen',
              'number-of-rows' = '5',
              'fields.id.kind' = 'sequence',
              'fields.id.start' = '10')
    """)
    ids = sorted(r.id for r in env.sql_query("SELECT id FROM g").collect())
    assert ids == [10, 11, 12, 13, 14]


def test_watermark_ddl_parsed_and_applied(spark):
    env = TableEnvironment(spark)
    env.execute_sql("""
        CREATE TABLE r (ts TIMESTAMP_LTZ(3), v BIGINT,
                        WATERMARK FOR ts AS ts - INTERVAL '5' SECOND)
        WITH ('connector' = 'rate', 'rows-per-second' = '10')
    """)
    spec = env.tables["r"]
    assert spec.watermark == ("ts", "5 seconds")
    # rate source exposes (timestamp, value); the declared watermark applies
    # to a streaming read of the table
    df = env.from_table("r")
    assert df.isStreaming


def test_primary_key_parsed(spark):
    env = TableEnvironment(spark)
    env.execute_sql("""
        CREATE TABLE pkt (id BIGINT, v STRING, PRIMARY KEY (id) NOT ENFORCED)
        WITH ('connector' = 'values', 'data' = '1|a')
    """)
    assert env.tables["pkt"].primary_key == ["id"]
    assert [c for c, _ in env.tables["pkt"].columns] == ["id", "v"]


def test_ansi_sql_passthrough(spark):
    env = TableEnvironment(spark)
    out = env.execute_sql("SELECT 1 + 1 AS two")
    assert out.collect()[0].two == 2
