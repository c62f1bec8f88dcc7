"""Connection DDL family (FLIP-529; reference flink-sql-parser
ddl/connection/*, dql SqlShowConnections/SqlShowCreateConnection/
SqlRichDescribeConnection, DefaultConnectionFactory secret handling)."""

from __future__ import annotations

import pytest

from flink_spark.catalog import TableEnvironment


@pytest.fixture()
def env(spark):
    return TableEnvironment(spark)


def test_connection_create_show_describe_masking(env):
    env.execute_sql(
        "CREATE CONNECTION tc1 COMMENT 'east llm' WITH ("
        "'endpoint'='https://h/v1/embeddings', 'api-key'='sk-abc', "
        "'token'='t0')"
    )
    assert [r.connection_name
            for r in env.execute_sql("SHOW CONNECTIONS").collect()] == ["tc1"]
    txt = env.execute_sql("SHOW CREATE CONNECTION tc1").collect()[0].result
    # sensitive values never rendered; non-sensitive kept verbatim
    assert "sk-abc" not in txt and "t0" not in txt
    assert txt.count("'****'") == 2 and "https://h/v1/embeddings" in txt
    assert txt.startswith("CREATE CONNECTION tc1")
    rows = {(r.info_name, r.info_value) for r in env.execute_sql(
        "DESCRIBE CONNECTION EXTENDED tc1").collect()}
    assert ("name", "tc1") in rows and ("type", "default") in rows
    assert ("option:api-key", "****") in rows
    assert ("option:endpoint", "https://h/v1/embeddings") in rows
    # plain DESCRIBE: no options
    plain = {r.info_name for r in env.execute_sql(
        "DESCRIBE CONNECTION tc1").collect()}
    assert plain == {"name", "type", "comment"}
    env.execute_sql("DROP CONNECTION tc1")


def test_connection_lifecycle_and_errors(env):
    env.execute_sql("CREATE CONNECTION lc1 WITH ('endpoint'='e1')")
    with pytest.raises(ValueError, match="already exists"):
        env.execute_sql("CREATE CONNECTION lc1 WITH ('endpoint'='e2')")
    env.execute_sql(
        "CREATE CONNECTION IF NOT EXISTS lc1 WITH ('endpoint'='e3')"
    )  # no-op
    assert env.connection_manager.resolved_options("lc1") == {
        "endpoint": "e1"
    }
    with pytest.raises(ValueError, match="reserved"):
        env.execute_sql(
            "CREATE CONNECTION lc2 WITH "
            "('__flink.encrypted-secret-key__'='x')"
        )
    # SET merges (sensitive goes to the store), RESET drops, RENAME moves
    env.execute_sql(
        "ALTER CONNECTION lc1 SET ('password'='pw', 'region'='us')"
    )
    assert env.connection_manager.resolved_options("lc1") == {
        "endpoint": "e1", "password": "pw", "region": "us"
    }
    env.execute_sql("ALTER CONNECTION lc1 RESET ('region', 'password')")
    assert env.connection_manager.resolved_options("lc1") == {
        "endpoint": "e1"
    }
    env.execute_sql("ALTER CONNECTION lc1 RENAME TO lc9")
    names = [r.connection_name
             for r in env.execute_sql("SHOW CONNECTIONS").collect()]
    assert "lc9" in names and "lc1" not in names
    # LIKE / NOT LIKE filtering
    env.execute_sql("CREATE CONNECTION other WITH ('endpoint'='x')")
    assert [r.connection_name for r in env.execute_sql(
        "SHOW CONNECTIONS LIKE 'lc%'").collect()] == ["lc9"]
    assert [r.connection_name for r in env.execute_sql(
        "SHOW CONNECTIONS NOT LIKE 'lc%'").collect()] == ["other"]
    env.execute_sql("DROP CONNECTION lc9")
    env.execute_sql("DROP CONNECTION IF EXISTS lc9")  # no-op
    with pytest.raises(ValueError, match="doesn't exist"):
        env.execute_sql("DROP CONNECTION lc9")
    env.execute_sql("DROP CONNECTION other")
    with pytest.raises(ValueError, match="doesn't exist"):
        env.execute_sql("DESCRIBE CONNECTION lc9")
    # IF EXISTS alters on absent connections are no-ops
    env.execute_sql("ALTER CONNECTION IF EXISTS nope SET ('a'='b')")
    env.execute_sql("ALTER CONNECTION IF EXISTS nope RENAME TO still_nope")


def test_model_references_connection(env):
    """CREATE MODEL WITH ('connection'='c') inherits the connection's
    resolved options — secrets included — for provider validation; the
    model's own options win on conflict (FLIP-529)."""
    env.execute_sql(
        "CREATE CONNECTION llm_conn WITH ("
        "'endpoint'='https://h/v1/chat/completions', 'api-key'='sk-zzz')"
    )
    env.execute_sql(
        "CREATE MODEL m_via_conn INPUT (x ARRAY<FLOAT>) "
        "OUTPUT (score BIGINT) WITH ('provider'='openai', "
        "'connection'='llm_conn', 'model'='gpt-x')"
    )
    assert "m_via_conn" in env.model_manager.models
    # missing 'model' (model-side requirement) still rejected
    with pytest.raises(ValueError, match="required options are missing"):
        env.execute_sql(
            "CREATE MODEL m_missing WITH ('provider'='openai', "
            "'connection'='llm_conn')"
        )
    # unknown connection
    with pytest.raises(ValueError, match="doesn't exist"):
        env.execute_sql(
            "CREATE MODEL m_no_conn WITH ('provider'='openai', "
            "'connection'='ghost', 'model'='m')"
        )
    env.execute_sql("DROP MODEL m_via_conn")
    env.execute_sql("DROP CONNECTION llm_conn")


def test_show_create_catalog_model_materialized(env, spark):
    """SHOW CREATE CATALOG / MODEL / MATERIALIZED TABLE (reference
    SqlShowCreateCatalog/Model/MaterializedTable.java → ShowCreateUtil):
    emitted DDL re-executes to an equivalent object; sensitive option
    values masked."""
    # catalog
    env.execute_sql("DROP CATALOG IF EXISTS scc_cat")
    env.execute_sql(
        "CREATE CATALOG scc_cat COMMENT 'docs catalog' WITH "
        "('type'='generic_in_memory', 'password'='hunter2')"
    )
    ddl = env.execute_sql("SHOW CREATE CATALOG scc_cat").collect()[0].ddl
    assert ddl.startswith("CREATE CATALOG scc_cat")
    assert "COMMENT 'docs catalog'" in ddl
    assert "hunter2" not in ddl and "'****'" in ddl
    assert "'type' = 'generic_in_memory'" in ddl
    # round-trip under a new name
    env.execute_sql("DROP CATALOG IF EXISTS scc_cat2")
    env.execute_sql(
        ddl.replace("scc_cat", "scc_cat2").replace("'****'", "'hunter2'")
    )
    assert env.catalogs["scc_cat2"] == env.catalogs["scc_cat"]
    env.execute_sql("DROP CATALOG scc_cat2")
    env.execute_sql("DROP CATALOG scc_cat")

    # model
    env.execute_sql("DROP MODEL IF EXISTS scc_model")
    env.execute_sql(
        "CREATE MODEL scc_model INPUT (x ARRAY<FLOAT>) "
        "OUTPUT (score BIGINT, pred_label BIGINT) WITH "
        "('provider'='openai', 'endpoint'='https://h/v1/embeddings', "
        "'api-key'='sk-xyz', 'model'='m1')"
    )
    ddl = env.execute_sql("SHOW CREATE MODEL scc_model").collect()[0].ddl
    assert ddl.startswith("CREATE MODEL scc_model")
    assert "INPUT (x ARRAY<FLOAT>)" in ddl
    assert "sk-xyz" not in ddl and "'****'" in ddl
    env.execute_sql(
        ddl.replace("scc_model", "scc_model2").replace("'****'", "'sk-xyz'")
    )
    m1 = env.model_manager.models["scc_model"]
    m2 = env.model_manager.models["scc_model2"]
    assert m2.options == m1.options and m2.output_schema == m1.output_schema
    env.execute_sql("DROP MODEL scc_model")
    env.execute_sql("DROP MODEL scc_model2")
    with pytest.raises(ValueError, match="doesn't exist"):
        env.execute_sql("SHOW CREATE MODEL scc_model")

    # materialized table
    spark.range(10).selectExpr(
        "id AS k", "id % 3 AS g"
    ).createOrReplaceTempView("mtsrc_scc")
    env.execute_sql("DROP MATERIALIZED TABLE IF EXISTS scc_mt")
    env.execute_sql(
        "CREATE MATERIALIZED TABLE scc_mt FRESHNESS = INTERVAL '1' DAY "
        "AS SELECT g, count(*) AS n FROM mtsrc_scc GROUP BY g"
    )
    ddl = env.execute_sql(
        "SHOW CREATE MATERIALIZED TABLE scc_mt"
    ).collect()[0].ddl
    assert ddl.startswith("CREATE MATERIALIZED TABLE scc_mt")
    assert "FRESHNESS = INTERVAL '86400' SECOND" in ddl
    assert "REFRESH_MODE = FULL" in ddl and ddl.endswith(
        "AS SELECT g, count(*) AS n FROM mtsrc_scc GROUP BY g"
    )
    env.execute_sql(ddl.replace("scc_mt", "scc_mt2"))
    a = env.materialized.tables["scc_mt"]
    b = env.materialized.tables["scc_mt2"]
    assert (b.freshness_sec, b.refresh_mode) == (
        a.freshness_sec, a.refresh_mode
    )
    assert spark.table("scc_mt2").count() == spark.table("scc_mt").count()
    env.execute_sql("DROP MATERIALIZED TABLE scc_mt")
    env.execute_sql("DROP MATERIALIZED TABLE scc_mt2")
