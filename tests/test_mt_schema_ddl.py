"""ALTER MATERIALIZED TABLE ADD/MODIFY/DROP schema parts + CREATE with a
declared schema block (reference
flink-sql-parser ddl/materializedtable/SqlAlterMaterializedTableSchema.java,
planner converters materializedtable/SqlAlterMaterializedTableSchemaConverter
.java / ...DropSchemaConverter.java / ...AddDistributionConverter.java,
grammar pinned by MaterializedTableStatementParserTest.java:354-615).

Semantics under test:
- persisted (physical / non-virtual metadata) columns must be produced by
  the defining query (MaterializedTableUtils.validatePersistedColumnsUsedByQuery);
- MODIFY keeps the column kind and only widens types
  (LogicalTypeCasts.supportsImplicitCast);
- DROP of a query-produced column is rejected ("are used in query");
- one watermark, PRIMARY KEY NOT ENFORCED only, UNIQUE unsupported;
- ADD DISTRIBUTION errors when a distribution already exists;
- SHOW CREATE MATERIALIZED TABLE re-executes to an equivalent table.
"""

import pytest

from flink_spark.catalog import TableEnvironment


@pytest.fixture()
def env(spark):
    t = TableEnvironment(spark)
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id int, name string, amt double",
    ).createOrReplaceTempView("mt_src")
    yield t
    for name in ("mts", "mts2"):
        try:
            t.execute_sql(f"DROP MATERIALIZED TABLE {name}")
        except Exception:
            pass


def _create(env, schema=""):
    env.execute_sql(
        f"CREATE MATERIALIZED TABLE mts {schema} "
        "FRESHNESS = INTERVAL '1' HOUR AS SELECT * FROM mt_src"
    )


def test_create_with_schema_block(env, spark):
    _create(env, "(id BIGINT, name STRING COMMENT 'n', amt DOUBLE, "
                 "doubled AS amt * 2, PRIMARY KEY (id) NOT ENFORCED)")
    df = spark.table("mts")
    assert [f.name for f in df.schema.fields] == ["id", "name", "amt", "doubled"]
    assert dict(df.dtypes)["id"] == "bigint"  # declared widening applied
    rows = {r["id"]: r["doubled"] for r in df.collect()}
    assert rows == {1: 20.0, 2: 40.0, 3: 60.0}


def test_create_schema_rejects_narrowing_and_ghost(env):
    with pytest.raises(ValueError, match="can not be declared"):
        _create(env, "(id TINYINT)")  # int -> tinyint narrows
    with pytest.raises(ValueError, match="must be used by the defining query"):
        _create(env, "(ghost INT)")


def test_add_computed_column_with_position(env, spark):
    _create(env)
    env.execute_sql("ALTER MATERIALIZED TABLE mts ADD tripled AS amt * 3 AFTER id")
    assert [f.name for f in spark.table("mts").schema.fields] == [
        "id", "tripled", "name", "amt"]
    assert spark.table("mts").filter("id = 2").collect()[0]["tripled"] == 60.0
    env.execute_sql("ALTER MATERIALIZED TABLE mts ADD flag AS amt > 15 FIRST")
    assert [f.name for f in spark.table("mts").schema.fields][0] == "flag"


def test_add_persisted_column_must_be_query_backed(env):
    _create(env)
    with pytest.raises(ValueError, match="must be used by the defining query"):
        env.execute_sql("ALTER MATERIALIZED TABLE mts ADD ghost INT")
    # virtual metadata columns are exempt (throwIfPersistedColumnNotUsedByQuery
    # skips virtual SqlMetadataColumn) and surface as typed NULLs
    env.execute_sql(
        "ALTER MATERIALIZED TABLE mts ADD off BIGINT METADATA FROM 'offset' VIRTUAL"
    )


def test_add_duplicate_column_rejected(env):
    _create(env)
    with pytest.raises(ValueError, match="already exists"):
        env.execute_sql("ALTER MATERIALIZED TABLE mts ADD name STRING")


def test_modify_widens_but_never_narrows_or_rekinds(env, spark):
    _create(env)
    env.execute_sql("ALTER MATERIALIZED TABLE mts MODIFY id BIGINT")
    assert dict(spark.table("mts").dtypes)["id"] == "bigint"
    with pytest.raises(ValueError, match="can not be changed"):
        env.execute_sql("ALTER MATERIALIZED TABLE mts MODIFY id INT")
    env.execute_sql("ALTER MATERIALIZED TABLE mts ADD d AS amt * 2")
    # spelling a computed column as physical trips the persisted-column
    # check first — exactly the reference's conversion order
    with pytest.raises(ValueError, match="must be used by the defining query"):
        env.execute_sql("ALTER MATERIALIZED TABLE mts MODIFY d INT")
    # modifying the computed expression is fine
    env.execute_sql("ALTER MATERIALIZED TABLE mts MODIFY d AS amt * 10")
    assert spark.table("mts").filter("id = 1").collect()[0]["d"] == 100.0


def test_modify_missing_column_rejected(env):
    _create(env)
    with pytest.raises(ValueError, match="does not exist"):
        env.execute_sql("ALTER MATERIALIZED TABLE mts MODIFY nope AS amt + 1")


def test_drop_query_column_rejected_others_ok(env, spark):
    _create(env)
    env.execute_sql("ALTER MATERIALIZED TABLE mts ADD (c1 AS amt + 1, c2 AS amt + 2)")
    with pytest.raises(ValueError, match=r"are used in query"):
        env.execute_sql("ALTER MATERIALIZED TABLE mts DROP name")
    env.execute_sql("ALTER MATERIALIZED TABLE mts DROP (c1, c2)")
    assert [f.name for f in spark.table("mts").schema.fields] == [
        "id", "name", "amt"]


def test_drop_column_referenced_by_other_computed_rejected(env):
    _create(env)
    env.execute_sql("ALTER MATERIALIZED TABLE mts ADD base AS amt * 2")
    env.execute_sql("ALTER MATERIALIZED TABLE mts ADD dep AS base + 1")
    with pytest.raises(ValueError, match="referenced by computed column"):
        env.execute_sql("ALTER MATERIALIZED TABLE mts DROP base")
    # dropping both together is fine
    env.execute_sql("ALTER MATERIALIZED TABLE mts DROP (base, dep)")


def test_watermark_add_modify_drop(env):
    _create(env)
    env.execute_sql(
        "ALTER MATERIALIZED TABLE mts ADD WATERMARK FOR amt AS amt")
    with pytest.raises(ValueError, match="already defines a watermark"):
        env.execute_sql(
            "ALTER MATERIALIZED TABLE mts ADD WATERMARK FOR amt AS amt")
    env.execute_sql(
        "ALTER MATERIALIZED TABLE mts MODIFY WATERMARK FOR amt AS amt - 1")
    env.execute_sql("ALTER MATERIALIZED TABLE mts DROP WATERMARK")
    with pytest.raises(ValueError, match="does not define a watermark"):
        env.execute_sql("ALTER MATERIALIZED TABLE mts DROP WATERMARK")


def test_primary_key_lifecycle(env):
    _create(env)
    env.execute_sql(
        "ALTER MATERIALIZED TABLE mts ADD CONSTRAINT pk1 "
        "PRIMARY KEY (id) NOT ENFORCED")
    with pytest.raises(ValueError, match="already defines a primary key"):
        env.execute_sql(
            "ALTER MATERIALIZED TABLE mts ADD PRIMARY KEY (name) NOT ENFORCED")
    with pytest.raises(ValueError, match="does not exist"):
        env.execute_sql("ALTER MATERIALIZED TABLE mts DROP CONSTRAINT nope")
    env.execute_sql("ALTER MATERIALIZED TABLE mts DROP CONSTRAINT pk1")
    with pytest.raises(ValueError, match="does not define a primary key"):
        env.execute_sql("ALTER MATERIALIZED TABLE mts DROP PRIMARY KEY")


def test_enforced_and_unique_rejected(env):
    _create(env)
    with pytest.raises(ValueError, match="ENFORCED"):
        env.execute_sql(
            "ALTER MATERIALIZED TABLE mts ADD PRIMARY KEY (id) ENFORCED")
    with pytest.raises(ValueError, match="UNIQUE constraint is not supported"):
        env.execute_sql("ALTER MATERIALIZED TABLE mts ADD UNIQUE (id)")


def test_add_distribution_errors_when_present(env):
    _create(env)
    env.execute_sql(
        "ALTER MATERIALIZED TABLE mts ADD DISTRIBUTION BY HASH(id) INTO 4 BUCKETS")
    with pytest.raises(ValueError, match="already defined the distribution"):
        env.execute_sql(
            "ALTER MATERIALIZED TABLE mts ADD DISTRIBUTION BY HASH(name) INTO 2 BUCKETS")
    env.execute_sql("ALTER MATERIALIZED TABLE mts DROP DISTRIBUTION")
    # range distribution without a bucket count (parser test :615)
    env.execute_sql(
        "ALTER MATERIALIZED TABLE mts ADD DISTRIBUTION BY RANGE(id, name)")
    mt = env.materialized.tables["mts"]
    assert mt.dist_kind == "range" and mt.dist_buckets is None
    env.execute_sql("ALTER MATERIALIZED TABLE mts REFRESH")  # range path runs


def test_show_create_roundtrip_with_schema(env, spark):
    _create(env, "(id BIGINT, name STRING, amt DOUBLE, doubled AS amt * 2, "
                 "WATERMARK FOR amt AS amt, "
                 "CONSTRAINT pk PRIMARY KEY (id) NOT ENFORCED)")
    ddl = env.execute_sql("SHOW CREATE MATERIALIZED TABLE mts").collect()[0][0]
    assert "doubled AS amt * 2" in ddl
    assert "WATERMARK FOR amt" in ddl
    assert "CONSTRAINT pk PRIMARY KEY (id) NOT ENFORCED" in ddl
    before = spark.table("mts").collect()
    env.execute_sql("DROP MATERIALIZED TABLE mts")
    env.execute_sql(ddl)
    after = spark.table("mts").collect()
    assert sorted(before) == sorted(after)
    mt = env.materialized.tables["mts"]
    assert mt.primary_key == ("pk", ["id"]) and mt.watermark is not None


def test_refresh_preserves_declared_schema(env, spark):
    _create(env)
    env.execute_sql("ALTER MATERIALIZED TABLE mts ADD total AS amt + id")
    env.execute_sql("ALTER MATERIALIZED TABLE mts REFRESH")
    row = spark.table("mts").filter("id = 3").collect()[0]
    assert row["total"] == 33.0


def test_create_or_alter_resets_schema(env, spark):
    _create(env)
    env.execute_sql("ALTER MATERIALIZED TABLE mts ADD extra AS amt * 5")
    assert "extra" in spark.table("mts").columns
    env.execute_sql(
        "CREATE OR ALTER MATERIALIZED TABLE mts "
        "FRESHNESS = INTERVAL '1' HOUR AS SELECT * FROM mt_src")
    assert "extra" not in spark.table("mts").columns


def test_streaming_mt_schema_evolution(spark, tmp_path):
    """ALTER ... ADD a computed column on a STREAMING materialized table:
    the declared projection applies to the live view immediately and to
    every subsequent micro-batch re-registration (the sink closure reads
    mt.schema_cols at call time, so evolution takes effect without a
    stream restart)."""
    import time

    import pandas as pd

    from flink_spark.catalog import TableEnvironment

    env = TableEnvironment(spark)
    src = tmp_path / "mt_evo_src"
    src.mkdir()
    pd.DataFrame([("a", 1), ("b", 2)], columns=["k", "v"]).to_parquet(
        src / "p0.parquet", index=False)
    schema = spark.read.parquet(str(src)).schema
    spark.readStream.schema(schema).parquet(str(src)).createOrReplaceTempView(
        "mt_evo_view")
    env.execute_sql(
        "CREATE MATERIALIZED TABLE mt_evo FRESHNESS = INTERVAL '1' SECOND "
        "AS SELECT k, v * 10 AS v10 FROM mt_evo_view")
    try:
        deadline = time.time() + 60
        while time.time() < deadline and spark.table("mt_evo").count() < 2:
            time.sleep(0.3)
        env.execute_sql("ALTER MATERIALIZED TABLE mt_evo ADD c AS v10 + 1")
        assert {(r.k, r.c) for r in spark.table("mt_evo").collect()} == {
            ("a", 11), ("b", 21)}
        # rows arriving AFTER the evolution surface the computed column
        pd.DataFrame([("c", 3)], columns=["k", "v"]).to_parquet(
            src / "p1.parquet", index=False)
        deadline = time.time() + 60
        while time.time() < deadline and spark.table("mt_evo").count() < 3:
            time.sleep(0.3)
        assert {(r.k, r.c) for r in spark.table("mt_evo").collect()} == {
            ("a", 11), ("b", 21), ("c", 31)}
        # dropping it restores the raw stream schema
        env.execute_sql("ALTER MATERIALIZED TABLE mt_evo DROP c")
        assert "c" not in spark.table("mt_evo").columns
    finally:
        env.execute_sql("DROP MATERIALIZED TABLE mt_evo")
