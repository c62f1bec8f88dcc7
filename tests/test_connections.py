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
