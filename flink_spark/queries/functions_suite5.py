"""Scalar function families, part 5 (§2.12 stragglers): BIN, PMOD,
numeric TRUNCATE, fixed-offset CONVERT_TZ, SQL OVERLAPS, and the Spark-4
variant path for PARSE_JSON / JSON_VALUE / IS_JSON.

Dialect deltas: pmod↔((x%m)+m)%m, truncate↔floor-scale (that IS the
operator's definition), variant_get↔json_extract::cast, is_json↔
try_parse_json IS NOT NULL ↔ json_valid.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_spark.queries.registry import query
from flink_spark.sources.tables import load_table


@query(
    "fn_numeric_extra_suite",
    oracle="""
    SELECT p_partkey,
           bin(p_partkey) AS b,
           ((p_partkey % 7) + 7) % 7 AS pm,
           ((-p_partkey % 7) + 7) % 7 AS pm_neg,
           floor(p_retailprice * 100) / 100 AS trunc2,
           CAST(floor(p_retailprice / 10) AS BIGINT) * 10 AS trunc_neg1,
           p_partkey // 7 AS idiv
    FROM part WHERE p_partkey <= 300
    """,
)
def fn_numeric_extra_suite(spark, sf_dir):
    """BIN / PMOD (incl. negative operand) / TRUNCATE(x, ±d) / integer DIV
    (reference BuiltInFunctionDefinitions math block)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 300)
    return p.select(
        "p_partkey",
        F.bin("p_partkey").alias("b"),
        F.pmod(F.col("p_partkey"), F.lit(7)).alias("pm"),
        F.pmod(-F.col("p_partkey"), F.lit(7)).alias("pm_neg"),
        (F.floor(F.col("p_retailprice") * 100) / 100).alias("trunc2"),
        (F.floor(F.col("p_retailprice") / 10) * 10).alias("trunc_neg1"),
        F.expr("p_partkey DIV 7").alias("idiv"),
    )


@query(
    "fn_json_variant_suite",
    oracle="""
    SELECT event_id,
           json_extract(props, '$.k')::INT AS k_int,
           json_extract_string(props, '$.k') AS k_str,
           json_valid(props) AS is_json,
           ts - INTERVAL '5 hours' AS ts_est,
           (ts <= ts + INTERVAL '1 hour')
             AND (ts + INTERVAL '30 minutes' <= ts + INTERVAL '2 hours')
             AS periods_overlap
    FROM events WHERE event_id < 500
    """,
)
def fn_json_variant_suite(spark, sf_dir):
    """PARSE_JSON→VARIANT_GET (Spark 4 variant type) / JSON_VALUE /
    IS_JSON / fixed-offset CONVERT_TZ / SQL OVERLAPS predicate."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    v = F.parse_json(F.col("props"))
    s1, e1 = F.col("ts"), F.col("ts") + F.expr("INTERVAL 1 HOUR")
    s2 = F.col("ts") + F.expr("INTERVAL 30 MINUTES")
    e2 = F.col("ts") + F.expr("INTERVAL 2 HOURS")
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "int").alias("k_int"),
        F.variant_get(v, "$.k", "string").alias("k_str"),
        F.try_parse_json(F.col("props")).isNotNull().alias("is_json"),
        F.from_utc_timestamp(F.col("ts").cast("timestamp"), "EST")
        .cast("timestamp_ntz")
        .alias("ts_est"),
        ((s1 <= e2) & (s2 <= e1)).alias("periods_overlap"),
    )


@query(
    "fn_json_table",
    oracle="""
    WITH src AS (
      SELECT o_orderkey,
             '{"items":[{"n":"p' || CAST(o_orderkey % 5 AS VARCHAR)
               || '","q":' || CAST(o_orderkey % 7 AS VARCHAR)
               || '},{"n":"x","q":' || CAST(o_orderkey % 3 AS VARCHAR)
               || '}]}' AS j
      FROM orders),
    shred AS (
      SELECT s.o_orderkey, u.i AS idx,
             json_extract_string(json_extract(s.j,
               '$.items[' || (u.i - 1) || ']'), '$.n') AS n,
             CAST(json_extract(json_extract(s.j,
               '$.items[' || (u.i - 1) || ']'), '$.q') AS INT) AS q
      FROM src s, LATERAL (SELECT unnest(generate_series(1,
             CAST(json_array_length(s.j, '$.items') AS INT))) AS i) u)
    SELECT n, CAST(SUM(q) AS BIGINT) AS sq,
           CAST(COUNT(*) AS BIGINT) AS c,
           CAST(SUM(idx) AS BIGINT) AS si
    FROM shred GROUP BY n
    """,
)
def fn_json_table(spark, sf_dir):
    """JSON_TABLE (SQL:2016; reference JSON shredding table function,
    Flink 2.0 SQL surface): a deterministic JSON document is built per
    order with IDENTICAL text on both engines, shredded through the SQL
    FROM-clause rewrite (one from_json against the COLUMNS-derived struct
    schema + posexplode — JVM end to end), and aggregated per item name
    with FOR ORDINALITY sums proving element order survives."""
    from flink_spark.catalog import TableEnvironment

    env = TableEnvironment(spark)
    load_table(spark, sf_dir, "orders").selectExpr(
        "o_orderkey",
        """concat('{"items":[{"n":"p', CAST(o_orderkey % 5 AS STRING),
                  '","q":', CAST(o_orderkey % 7 AS STRING),
                  '},{"n":"x","q":', CAST(o_orderkey % 3 AS STRING),
                  '}]}') AS j""",
    ).createOrReplaceTempView("jt_orders")
    return env.execute_sql("""
        SELECT jt.n, CAST(SUM(jt.q) AS BIGINT) AS sq,
               CAST(COUNT(*) AS BIGINT) AS c,
               CAST(SUM(jt.idx) AS BIGINT) AS si
        FROM jt_orders, JSON_TABLE(j, '$.items[*]' COLUMNS (
            n STRING PATH '$.n',
            q INT PATH '$.q',
            idx FOR ORDINALITY
        )) AS jt
        GROUP BY jt.n
    """)
