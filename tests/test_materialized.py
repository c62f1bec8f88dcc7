"""Materialized-table DDL tests (FLIP-435; reference
flink-sql-parser ddl/materializedtable/*, MaterializedTableConfigOptions
freshness-threshold derivation)."""

from __future__ import annotations

import time

import pytest

from flink_spark.catalog import TableEnvironment


def _mk_source(spark, name: str, rows):
    spark.createDataFrame(rows, "k string, v int").createOrReplaceTempView(name)


def test_full_refresh_reflects_source_changes(spark):
    env = TableEnvironment(spark)
    _mk_source(spark, "mt_src_a", [("x", 1), ("y", 2)])
    env.execute_sql("""
        CREATE MATERIALIZED TABLE mt_a
        FRESHNESS = INTERVAL '1' DAY
        AS SELECT k, SUM(v) AS total FROM mt_src_a GROUP BY k
    """)
    got = {(r.k, r.total) for r in spark.table("mt_a").collect()}
    assert got == {("x", 1), ("y", 2)}

    # mutate the source; the snapshot must NOT move until refreshed
    _mk_source(spark, "mt_src_a", [("x", 10), ("y", 2), ("z", 5)])
    got = {(r.k, r.total) for r in spark.table("mt_a").collect()}
    assert got == {("x", 1), ("y", 2)}

    env.execute_sql("ALTER MATERIALIZED TABLE mt_a REFRESH")
    got = {(r.k, r.total) for r in spark.table("mt_a").collect()}
    assert got == {("x", 10), ("y", 2), ("z", 5)}
    assert env.materialized.tables["mt_a"].version == 2
    env.execute_sql("DROP MATERIALIZED TABLE mt_a")
    assert "mt_a" not in env.materialized.tables


def test_refresh_mode_derivation_and_override(spark):
    env = TableEnvironment(spark)
    _mk_source(spark, "mt_src_b", [("x", 1)])
    # below the 30-min threshold → continuous (but keep the interval large
    # enough that the background loop never fires during the test)
    env.execute_sql("""
        CREATE MATERIALIZED TABLE mt_cont FRESHNESS = INTERVAL '29' MINUTE
        AS SELECT * FROM mt_src_b
    """)
    assert env.materialized.tables["mt_cont"].refresh_mode == "continuous"
    # above → full
    env.execute_sql("""
        CREATE MATERIALIZED TABLE mt_full FRESHNESS = INTERVAL '1' HOUR
        AS SELECT * FROM mt_src_b
    """)
    assert env.materialized.tables["mt_full"].refresh_mode == "full"
    # explicit REFRESH_MODE wins over the derivation
    env.execute_sql("""
        CREATE MATERIALIZED TABLE mt_forced FRESHNESS = INTERVAL '1' HOUR
        REFRESH_MODE = CONTINUOUS
        AS SELECT * FROM mt_src_b
    """)
    assert env.materialized.tables["mt_forced"].refresh_mode == "continuous"
    for n in ("mt_cont", "mt_full", "mt_forced"):
        env.execute_sql(f"DROP MATERIALIZED TABLE {n}")


def test_periodic_refresh_and_suspend_resume(spark):
    env = TableEnvironment(spark)
    _mk_source(spark, "mt_src_c", [("x", 1)])
    env.execute_sql("""
        CREATE MATERIALIZED TABLE mt_live FRESHNESS = INTERVAL '1' SECOND
        AS SELECT k, SUM(v) AS total FROM mt_src_c GROUP BY k
    """)
    try:
        _mk_source(spark, "mt_src_c", [("x", 7)])
        deadline = time.time() + 30
        while time.time() < deadline:
            if {(r.k, r.total) for r in spark.table("mt_live").collect()} == {("x", 7)}:
                break
            time.sleep(0.2)
        else:
            pytest.fail("periodic refresh never picked up the source change")

        env.execute_sql("ALTER MATERIALIZED TABLE mt_live SUSPEND")
        assert env.materialized.tables["mt_live"].state == "SUSPENDED"
        suspended_version = env.materialized.tables["mt_live"].version
        _mk_source(spark, "mt_src_c", [("x", 99)])
        time.sleep(2.5)
        assert env.materialized.tables["mt_live"].version == suspended_version
        assert {(r.k, r.total) for r in spark.table("mt_live").collect()} == {("x", 7)}

        env.execute_sql("ALTER MATERIALIZED TABLE mt_live RESUME")
        deadline = time.time() + 30
        while time.time() < deadline:
            if {(r.k, r.total) for r in spark.table("mt_live").collect()} == {("x", 99)}:
                break
            time.sleep(0.2)
        else:
            pytest.fail("resume did not restart the refresh loop")
    finally:
        env.execute_sql("DROP MATERIALIZED TABLE IF EXISTS mt_live")


def test_snapshot_pruning_keeps_two(spark, tmp_path):
    import os

    env = TableEnvironment(spark)
    _mk_source(spark, "mt_src_d", [("x", 1)])
    env.execute_sql("""
        CREATE MATERIALIZED TABLE mt_prune FRESHNESS = INTERVAL '1' DAY
        AS SELECT * FROM mt_src_d
    """)
    for _ in range(4):
        env.execute_sql("ALTER MATERIALIZED TABLE mt_prune REFRESH")
    mt = env.materialized.tables["mt_prune"]
    versions = sorted(
        int(d.split("=")[1]) for d in os.listdir(mt.root) if d.startswith("v=")
    )
    assert mt.version == 5 and versions == [4, 5]
    env.execute_sql("DROP MATERIALIZED TABLE mt_prune")


def test_partition_scoped_refresh(spark):
    """REFRESH PARTITION recomputes only the named partition; other
    partitions keep their previous snapshot even though the source
    changed for them too."""
    env = TableEnvironment(spark)
    _mk_source(spark, "mt_src_p", [("a", 1), ("b", 10)])
    env.execute_sql("""
        CREATE MATERIALIZED TABLE mt_part FRESHNESS = INTERVAL '1' DAY
        AS SELECT k, SUM(v) AS total FROM mt_src_p GROUP BY k
    """)
    _mk_source(spark, "mt_src_p", [("a", 5), ("b", 99)])
    env.execute_sql("ALTER MATERIALIZED TABLE mt_part REFRESH PARTITION (k = 'a')")
    got = {(r.k, r.total) for r in spark.table("mt_part").collect()}
    assert got == {("a", 5), ("b", 10)}  # b carried over, a recomputed
    env.execute_sql("ALTER MATERIALIZED TABLE mt_part REFRESH")
    got = {(r.k, r.total) for r in spark.table("mt_part").collect()}
    assert got == {("a", 5), ("b", 99)}
    env.execute_sql("DROP MATERIALIZED TABLE mt_part")


def test_continuous_streaming_materialized_table(spark, tmp_path):
    """A streaming defining query runs as one Structured Streaming job
    into the store: rows land continuously, SUSPEND stops consumption,
    RESUME picks up from the checkpoint (no reprocessing, no loss)."""
    import time

    import pandas as pd

    env = TableEnvironment(spark)
    src = tmp_path / "mt_stream_src"
    src.mkdir()

    def add_file(i, rows):
        pd.DataFrame(rows, columns=["k", "v"]).to_parquet(
            src / f"part-{i}.parquet", index=False
        )

    add_file(0, [("x", 1), ("y", 2)])
    schema = spark.read.parquet(str(src)).schema
    spark.readStream.schema(schema).parquet(str(src)).createOrReplaceTempView(
        "mt_stream_view"
    )
    env.execute_sql("""
        CREATE MATERIALIZED TABLE mt_live_stream
        FRESHNESS = INTERVAL '1' SECOND
        AS SELECT k, v * 10 AS v10 FROM mt_stream_view
    """)
    mt = env.materialized.tables["mt_live_stream"]
    try:
        assert mt.streaming and mt.refresh_mode == "continuous"

        def rows():
            return {(r.k, r.v10) for r in spark.table("mt_live_stream").collect()}

        deadline = time.time() + 60
        while time.time() < deadline and rows() != {("x", 10), ("y", 20)}:
            time.sleep(0.3)
        assert rows() == {("x", 10), ("y", 20)}

        env.execute_sql("ALTER MATERIALIZED TABLE mt_live_stream SUSPEND")
        add_file(1, [("z", 3)])
        time.sleep(2.5)
        assert rows() == {("x", 10), ("y", 20)}  # suspended: nothing consumed

        env.execute_sql("ALTER MATERIALIZED TABLE mt_live_stream RESUME")
        deadline = time.time() + 60
        while time.time() < deadline and ("z", 30) not in rows():
            time.sleep(0.3)
        assert rows() == {("x", 10), ("y", 20), ("z", 30)}
    finally:
        env.execute_sql("DROP MATERIALIZED TABLE IF EXISTS mt_live_stream")


def test_create_invalid_query_rolls_back(spark):
    """An invalid defining query must not leave a half-registered table or
    leaked tempdir (ADVICE r2): the same name is creatable afterwards."""
    env = TableEnvironment(spark)
    with pytest.raises(Exception):
        env.execute_sql("""
            CREATE MATERIALIZED TABLE mt_rollback
            FRESHNESS = INTERVAL '1' HOUR
            AS SELECT * FROM no_such_table_anywhere
        """)
    _mk_source(spark, "mt_src_rb", [("x", 1)])
    env.execute_sql("""
        CREATE MATERIALIZED TABLE mt_rollback
        FRESHNESS = INTERVAL '1' HOUR
        AS SELECT k, v FROM mt_src_rb
    """)
    try:
        assert spark.sql("SELECT count(*) c FROM mt_rollback").first().c == 1
    finally:
        env.execute_sql("DROP MATERIALIZED TABLE mt_rollback")


def test_time_travel_reads_snapshot_versions(spark):
    """FOR SYSTEM_VERSION/SYSTEM_TIME AS OF over the versioned snapshot
    store (reference SqlSnapshot time travel): an older snapshot stays
    readable inside the retention window; a pruned one raises."""
    import datetime

    env = TableEnvironment(spark)
    _mk_source(spark, "mt_src_tt", [("x", 1)])
    env.execute_sql("""
        CREATE MATERIALIZED TABLE mt_tt
        FRESHNESS = INTERVAL '1' HOUR
        AS SELECT k, v FROM mt_src_tt
    """)
    try:
        t_between = datetime.datetime.now()
        time.sleep(0.05)
        _mk_source(spark, "mt_src_tt", [("x", 1), ("y", 2)])
        env.execute_sql("ALTER MATERIALIZED TABLE mt_tt REFRESH")
        # current view sees v2
        assert spark.sql("SELECT count(*) c FROM mt_tt").first().c == 2
        v1 = env.execute_sql("SELECT * FROM mt_tt FOR SYSTEM_VERSION AS OF 1")
        assert v1.count() == 1
        ts = t_between.isoformat(sep=" ")
        old = env.execute_sql(
            f"SELECT * FROM mt_tt FOR SYSTEM_TIME AS OF TIMESTAMP '{ts}'"
        )
        assert old.count() == 1
        # two more refreshes prune v1 (retention: current + previous)
        env.execute_sql("ALTER MATERIALIZED TABLE mt_tt REFRESH")
        env.execute_sql("ALTER MATERIALIZED TABLE mt_tt REFRESH")
        with pytest.raises(ValueError, match="retention"):
            env.execute_sql("SELECT * FROM mt_tt FOR SYSTEM_VERSION AS OF 1")
    finally:
        env.execute_sql("DROP MATERIALIZED TABLE mt_tt")


def test_alter_extended_variants(spark):
    """Extended ALTER MATERIALIZED TABLE (reference
    SqlAlterMaterializedTableAsQuery/Freshness/RefreshMode/Options/Reset/
    Resume-with-properties): suspend -> alter -> resume with snapshot
    continuity; AS replacement keeps existing columns as a prefix."""
    env = TableEnvironment(spark)
    _mk_source(spark, "mt_ext_src", [("x", 1), ("y", 2), ("y", 3)])
    env.execute_sql("DROP MATERIALIZED TABLE IF EXISTS mt_ext")
    env.execute_sql(
        "CREATE MATERIALIZED TABLE mt_ext WITH ('retention'='7d') "
        "FRESHNESS = INTERVAL '1' DAY "
        "AS SELECT k, count(*) AS n FROM mt_ext_src GROUP BY k"
    )
    try:
        mt = env.materialized.tables["mt_ext"]
        assert mt.options == {"retention": "7d"} and not mt.mode_explicit
        v_before = mt.version

        # SET/RESET options
        env.execute_sql(
            "ALTER MATERIALIZED TABLE mt_ext SET ('retention'='30d', "
            "'owner'='pipeline')"
        )
        assert mt.options == {"retention": "30d", "owner": "pipeline"}
        env.execute_sql("ALTER MATERIALIZED TABLE mt_ext RESET ('owner')")
        assert mt.options == {"retention": "30d"}
        ddl = env.execute_sql(
            "SHOW CREATE MATERIALIZED TABLE mt_ext"
        ).collect()[0].ddl
        assert "WITH ('retention' = '30d')" in ddl

        # SET FRESHNESS re-derives the (non-explicit) mode
        env.execute_sql(
            "ALTER MATERIALIZED TABLE mt_ext SET FRESHNESS = "
            "INTERVAL '2' SECOND"
        )
        assert mt.freshness_sec == 2.0
        assert mt.refresh_mode == "continuous"  # below the 30s threshold
        # SET REFRESH_MODE pins it explicitly
        env.execute_sql(
            "ALTER MATERIALIZED TABLE mt_ext SET REFRESH_MODE = FULL"
        )
        assert mt.refresh_mode == "full" and mt.mode_explicit

        # suspend -> AS replacement -> resume WITH properties
        env.execute_sql("ALTER MATERIALIZED TABLE mt_ext SUSPEND")
        assert mt.state == "SUSPENDED"
        # dropping an existing column rejects
        with pytest.raises(ValueError, match="prefix"):
            env.execute_sql(
                "ALTER MATERIALIZED TABLE mt_ext AS "
                "SELECT k FROM mt_ext_src GROUP BY k"
            )
        env.execute_sql(
            "ALTER MATERIALIZED TABLE mt_ext AS "
            "SELECT k, count(*) AS n, sum(v) AS sv "
            "FROM mt_ext_src GROUP BY k"
        )
        # suspended: definition changed, no refresh ran yet
        assert "sv" not in spark.table("mt_ext").columns
        env.execute_sql(
            "ALTER MATERIALIZED TABLE mt_ext RESUME WITH ('priority'='hi')"
        )
        assert mt.state == "RUNNING" and mt.options["priority"] == "hi"
        env.execute_sql("ALTER MATERIALIZED TABLE mt_ext REFRESH")
        assert mt.version > v_before
        got = {(r.k, r.n, r.sv) for r in spark.table("mt_ext").collect()}
        assert got == {("x", 1, 1), ("y", 2, 5)}
    finally:
        env.execute_sql("DROP MATERIALIZED TABLE IF EXISTS mt_ext")


def test_create_or_alter_materialized_table(spark):
    """CREATE OR ALTER MATERIALIZED TABLE (reference
    SqlCreateOrAlterMaterializedTable.java): creates when absent; an
    existing table takes the new definition in place — snapshot history
    and the version counter carry over."""
    env = TableEnvironment(spark)
    _mk_source(spark, "coa_src", [("x", 1), ("y", 2), ("y", 3)])
    env.execute_sql("DROP MATERIALIZED TABLE IF EXISTS coa_mt")
    env.execute_sql(
        "CREATE OR ALTER MATERIALIZED TABLE coa_mt "
        "FRESHNESS = INTERVAL '1' DAY "
        "AS SELECT k, count(*) AS n FROM coa_src GROUP BY k"
    )
    try:
        mt = env.materialized.tables["coa_mt"]
        v1 = mt.version
        assert v1 >= 1
        env.execute_sql(
            "CREATE OR ALTER MATERIALIZED TABLE coa_mt "
            "FRESHNESS = INTERVAL '2' DAY REFRESH_MODE = FULL "
            "AS SELECT k, count(*) AS n, sum(v) AS sv "
            "FROM coa_src GROUP BY k"
        )
        assert env.materialized.tables["coa_mt"] is mt  # same object
        assert mt.freshness_sec == 2 * 86400 and mt.mode_explicit
        assert mt.version > v1  # history carried, new snapshot landed
        got = {(r.k, r.n, r.sv) for r in spark.table("coa_mt").collect()}
        assert got == {("x", 1, 1), ("y", 2, 5)}
        # dropping a column still rejects through the AS-replacement rule
        with pytest.raises(ValueError, match="prefix"):
            env.execute_sql(
                "CREATE OR ALTER MATERIALIZED TABLE coa_mt "
                "AS SELECT k FROM coa_src GROUP BY k"
            )
    finally:
        env.execute_sql("DROP MATERIALIZED TABLE IF EXISTS coa_mt")


def test_materialized_distribution(spark):
    """DISTRIBUTED BY on materialized tables (reference SqlDistribution +
    SqlAlterMaterializedTableDistribution/DropDistribution): snapshots
    are written clustered by the distribution key into the declared
    bucket count; MODIFY/DROP change the layout for the next snapshot;
    SHOW CREATE renders and round-trips the clause."""
    import os

    env = TableEnvironment(spark)
    _mk_source(spark, "mtd_src", [(f"k{i%7}", i) for i in range(60)])
    env.execute_sql("DROP MATERIALIZED TABLE IF EXISTS mtd_mt")
    env.execute_sql(
        "CREATE MATERIALIZED TABLE mtd_mt "
        "DISTRIBUTED BY (k) INTO 4 BUCKETS "
        "FRESHNESS = INTERVAL '1' DAY "
        "AS SELECT k, count(*) AS n FROM mtd_src GROUP BY k"
    )
    try:
        mt = env.materialized.tables["mtd_mt"]
        assert mt.dist_keys == ["k"] and mt.dist_buckets == 4
        snap = f"{mt.root}/v={mt.version}"
        files = [f for f in os.listdir(snap) if f.endswith(".parquet")]
        assert len(files) <= 4  # clustered into at most bucket-count files
        assert spark.table("mtd_mt").count() == 7
        ddl = env.execute_sql(
            "SHOW CREATE MATERIALIZED TABLE mtd_mt"
        ).collect()[0].ddl
        assert "DISTRIBUTED BY (k) INTO 4 BUCKETS" in ddl
        env.execute_sql(ddl.replace("mtd_mt", "mtd_mt2"))
        assert env.materialized.tables["mtd_mt2"].dist_buckets == 4
        env.execute_sql("DROP MATERIALIZED TABLE mtd_mt2")
        env.execute_sql(
            "ALTER MATERIALIZED TABLE mtd_mt MODIFY DISTRIBUTION "
            "BY HASH (k) INTO 2 BUCKETS"
        )
        assert mt.dist_buckets == 2
        env.execute_sql("ALTER MATERIALIZED TABLE mtd_mt REFRESH")
        snap = f"{mt.root}/v={mt.version}"
        files = [f for f in os.listdir(snap) if f.endswith(".parquet")]
        assert len(files) <= 2
        env.execute_sql("ALTER MATERIALIZED TABLE mtd_mt DROP DISTRIBUTION")
        assert mt.dist_keys == [] and mt.dist_buckets is None
    finally:
        env.execute_sql("DROP MATERIALIZED TABLE IF EXISTS mtd_mt")


def test_convert_table_to_materialized_table(spark, tmp_path):
    """Converting a regular table (reference materialized-table/
    statements.md 'Converting a Table to a Materialized Table'):
    disabled by default, one-way via CREATE OR ALTER only, gate read at
    session initialization so a later SET has no effect, definition
    taken entirely from the conversion statement."""
    import pytest

    from flink_spark.catalog import TableEnvironment

    def make_table(env, name):
        env.execute_sql(
            f"CREATE TABLE {name} (user_id BIGINT, amount BIGINT) "
            f"WITH ('connector' = 'filesystem', "
            f"'path' = '{tmp_path}/{name}', 'format' = 'parquet')"
        )
        env.execute_sql(
            f"INSERT INTO {name} VALUES (1, 10), (1, 20), (2, 5)"
        )

    # default: conversion disabled — plain CREATE collides, OR ALTER
    # names the gate
    env = TableEnvironment(spark)
    make_table(env, "conv_src")
    make_table(env, "conv_t")
    with pytest.raises(ValueError, match="already exists as a table"):
        env.execute_sql(
            "CREATE MATERIALIZED TABLE conv_t FRESHNESS = INTERVAL '1' "
            "MINUTE AS SELECT user_id, SUM(amount) AS total_amount "
            "FROM conv_src GROUP BY user_id"
        )
    with pytest.raises(ValueError, match="conversion-from-table"):
        env.execute_sql(
            "CREATE OR ALTER MATERIALIZED TABLE conv_t FRESHNESS = "
            "INTERVAL '1' MINUTE AS SELECT user_id, SUM(amount) AS "
            "total_amount FROM conv_src GROUP BY user_id"
        )
    # SET after init has no effect (planning-time read, per the doc)
    env.execute_sql(
        "SET 'table.materialized-table.conversion-from-table.enabled' "
        "= 'true'"
    )
    with pytest.raises(ValueError, match="conversion-from-table"):
        env.execute_sql(
            "CREATE OR ALTER MATERIALIZED TABLE conv_t FRESHNESS = "
            "INTERVAL '1' MINUTE AS SELECT user_id, SUM(amount) AS "
            "total_amount FROM conv_src GROUP BY user_id"
        )
    # a session INITIALIZED with the option on converts in place
    env2 = TableEnvironment(spark)
    assert env2._mt_conversion_enabled
    make_table(env2, "conv_src2")
    make_table(env2, "conv_t2")
    env2.execute_sql(
        "CREATE OR ALTER MATERIALIZED TABLE conv_t2 FRESHNESS = "
        "INTERVAL '1' MINUTE AS SELECT user_id, SUM(amount) AS "
        "total_amount FROM conv_src2 GROUP BY user_id"
    )
    assert "conv_t2" not in env2.tables  # kind changed
    assert "conv_t2" in env2.materialized.tables
    # a FAILING conversion must leave the regular table intact
    make_table(env2, "conv_t3")
    with pytest.raises(Exception):
        env2.execute_sql(
            "CREATE OR ALTER MATERIALIZED TABLE conv_t3 FRESHNESS = "
            "INTERVAL '1' MINUTE AS SELECT no_such_col FROM conv_src2"
        )
    assert "conv_t3" in env2.tables
    assert "conv_t3" not in env2.materialized.tables
    assert spark.sql("SELECT COUNT(*) AS n FROM conv_t3").first().n == 3
    rows = {
        r.user_id: r.total_amount
        for r in spark.sql("SELECT * FROM conv_t2").collect()
    }
    assert rows == {1: 30, 2: 5}  # schema/query from the statement only
    spark.conf.unset(
        "table.materialized-table.conversion-from-table.enabled"
    )
    env2.execute_sql("DROP MATERIALIZED TABLE conv_t2")
