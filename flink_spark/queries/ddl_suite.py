"""DDL-surface gated queries: materialized tables and format round-trips
(SURVEY §2.15; reference flink-sql-parser ddl/materializedtable/*,
flink-formats/*)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_spark.queries.registry import query
from flink_spark.queries.util import DEC
from flink_spark.sources.tables import load_table


@query(
    "materialized_table_refresh",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(l_quantity AS {DEC})) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def materialized_table_refresh(spark, sf_dir):
    """CREATE MATERIALIZED TABLE + ALTER ... REFRESH (FLIP-435; reference
    SqlCreateMaterializedTable.java, SqlAlterMaterializedTableRefresh.java):
    materialize a grouped rollup of lineitem into the versioned snapshot
    store, run one manual refresh cycle on top of the create-time one, and
    read the result back from the materialized storage (not the defining
    query), proving snapshot contents match the query exactly."""
    from flink_spark.catalog import TableEnvironment

    env = TableEnvironment(spark)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("mt_src_lineitem")
    env.execute_sql("DROP MATERIALIZED TABLE IF EXISTS mt_returnflag_rollup")
    env.execute_sql(f"""
        CREATE MATERIALIZED TABLE mt_returnflag_rollup
        FRESHNESS = INTERVAL '1' DAY
        AS SELECT l_returnflag,
                  COUNT(*) AS cnt,
                  CAST(SUM(CAST(l_quantity AS {DEC})) AS DOUBLE) AS sum_qty
           FROM mt_src_lineitem
           GROUP BY l_returnflag
    """)
    env.execute_sql("ALTER MATERIALIZED TABLE mt_returnflag_rollup REFRESH")
    mt = env.materialized.tables["mt_returnflag_rollup"]
    assert mt.refresh_mode == "full" and mt.version == 2
    return spark.table("mt_returnflag_rollup").orderBy("l_returnflag")
