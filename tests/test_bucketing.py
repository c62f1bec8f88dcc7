"""Bucketed-table co-located join: same-bucketed fact tables join with NO
exchange on either side, and results equal the plain-join results."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bucket_db(spark, tmp_path_factory):
    from flink_spark.sources.bucketing import ensure_database

    loc = tmp_path_factory.mktemp("bucket_warehouse")
    ensure_database(spark, "bdb", str(loc))
    yield "bdb"
    spark.sql("DROP DATABASE IF EXISTS bdb CASCADE")


def test_colocated_join_has_no_exchange(spark, bucket_db):
    from flink_spark.sources.bucketing import shuffle_free_join, write_bucketed
    from flink_spark.sources.tables import load_table

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    ).withColumnRenamed("o_orderkey", "l_orderkey")
    write_bucketed(li, f"{bucket_db}.li_b", ["l_orderkey"], 8)
    write_bucketed(o, f"{bucket_db}.o_b", ["l_orderkey"], 8)

    # bucketed joins need AQE off to show the static no-exchange plan
    saved = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = shuffle_free_join(spark, f"{bucket_db}.li_b", f"{bucket_db}.o_b",
                              ["l_orderkey"])
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
        n_bucketed = j.count()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", saved)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))

    n_plain = li.join(o, "l_orderkey").count()
    assert n_bucketed == n_plain


def test_bucketed_agg_skips_shuffle(spark, bucket_db):
    from pyspark.sql import functions as F

    saved = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        agg = (
            spark.table(f"{bucket_db}.li_b")
            .groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("q"))
        )
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
        assert agg.count() > 0
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", saved)


def test_distributed_by_ddl_exchange_free_join(spark):
    """DISTRIBUTED BY ... INTO n BUCKETS (reference FLIP-376
    SqlDistribution): two same-bucketed tables created and filled through
    SQL DDL join WITHOUT an Exchange on either side — the pre-shuffled
    layout the clause exists for — and the DDL round-trips through SHOW
    CREATE TABLE."""
    from flink_spark.catalog import TableEnvironment

    env = TableEnvironment(spark)
    env.execute_sql("DROP TABLE IF EXISTS dist_a")
    env.execute_sql("DROP TABLE IF EXISTS dist_b")
    env.execute_sql("""
        CREATE TABLE dist_a (k BIGINT, va DOUBLE)
        DISTRIBUTED BY HASH(k) INTO 4 BUCKETS
        WITH ('connector'='filesystem','format'='parquet')
    """)
    env.execute_sql("""
        CREATE TABLE dist_b (k BIGINT, vb DOUBLE)
        DISTRIBUTED BY (k) INTO 4 BUCKETS
        WITH ('connector'='filesystem','format'='parquet')
    """)
    env.execute_sql(
        "INSERT INTO dist_a SELECT id, CAST(id AS DOUBLE) FROM range(1000)"
    )
    env.execute_sql(
        "INSERT INTO dist_b SELECT id, CAST(id * 2 AS DOUBLE) "
        "FROM range(500)"
    )
    joined = spark.table("dist_a").join(spark.table("dist_b"), "k")
    assert joined.count() == 500
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            spark.table("dist_a").join(spark.table("dist_b"), "k")
            ._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "Exchange hashpartitioning" not in plan, plan
    ddl = env.execute_sql("SHOW CREATE TABLE dist_a").first().ddl
    assert "DISTRIBUTED BY (k) INTO 4 BUCKETS" in ddl
    assert "distributed." not in ddl
    with pytest.raises(ValueError, match="managed"):
        env.execute_sql("""
            CREATE TABLE dist_bad (k BIGINT)
            DISTRIBUTED BY (k) INTO 4 BUCKETS
            WITH ('connector'='filesystem','path'='/tmp/x')
        """)
    env.execute_sql("DROP TABLE dist_a")
    env.execute_sql("DROP TABLE dist_b")
    assert not spark.catalog.tableExists("dist_a")
