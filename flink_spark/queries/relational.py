"""Batch relational operator coverage: join zoo, set ops, agg shapes,
grouping sets, unnest/lateral, subqueries (SURVEY §2.3, §2.4, §2.9, §2.10).

Each query pins one operator family; oracles are exact (see queries.util).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_spark.queries.registry import query
from flink_spark.queries.util import dsum, davg, sql_dsum, sql_davg, DEC
from flink_spark.sources.tables import load_table, register_views


# ---------------------------------------------------------------- joins ----


@query(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey,
           COUNT(o.o_orderkey) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS spent
    FROM customer c
    LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey
     AND o.o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY c.c_custkey
    """,
)
def join_left_outer(spark, sf_dir):
    """LEFT OUTER JOIN with a pushed join-side predicate; unmatched
    customers keep NULL aggregates. Flink analog FlinkJoinType.LEFT
    (reference FlinkJoinType.java)."""
    cu = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp_ntz")
    )
    return (
        cu.join(o, cu.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("spent"),
        )
    )


@query(
    "join_right_outer",
    oracle="""
    SELECT o.o_orderkey, c.c_name
    FROM customer c
    RIGHT JOIN orders o ON c.c_custkey = o.o_custkey AND c.c_acctbal > 9000
    WHERE o.o_orderkey % 100 = 0
    """,
)
def join_right_outer(spark, sf_dir):
    """RIGHT OUTER JOIN preserving the orders side."""
    cu = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    return cu.join(
        o, (cu.c_custkey == o.o_custkey) & (cu.c_acctbal > 9000), "right"
    ).select("o_orderkey", "c_name")


@query(
    "join_full_outer",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust
                FROM customer WHERE c_acctbal > 9990 GROUP BY c_nationkey),
         sn AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp
                FROM supplier WHERE s_acctbal > 9000 GROUP BY s_nationkey)
    SELECT COALESCE(cn.nk, sn.nk) AS nationkey, cn.n_cust, sn.n_supp
    FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
    """,
)
def join_full_outer(spark, sf_dir):
    """FULL OUTER JOIN of two aggregates with disjoint key coverage."""
    cn = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9990)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_cust"))
    )
    sn = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_supp"))
    )
    return cn.join(sn, cn.nk == sn.nk, "full").select(
        F.coalesce(cn.nk, sn.nk).alias("nationkey"), "n_cust", "n_supp"
    )


@query(
    "join_left_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    """,
)
def join_left_semi(spark, sf_dir):
    """EXISTS → left_semi join (reference FlinkJoinType.SEMI)."""
    cu = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return cu.join(o, cu.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_left_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """,
)
def join_left_anti(spark, sf_dir):
    """NOT EXISTS → left_anti join (reference FlinkJoinType.ANTI):
    customers with no URGENT order (every customer has SOME order on this
    data, so the unfiltered form would be a trivially-empty gate)."""
    cu = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cu.join(o, cu.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_null_aware_anti",
    oracle="""
    SELECT c_custkey FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
    """,
)
def join_null_aware_anti(spark, sf_dir):
    """NOT IN subquery → null-aware anti join (reference
    NullAwareJoinHelper.java). Exercises the SQL layer: Catalyst's
    RewritePredicateSubquery performs the same rewrite Flink's
    FlinkSubQueryRemoveRule does."""
    register_views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_custkey FROM customer
        WHERE c_custkey NOT IN
              (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
        """
    )


@query(
    "sql_not_in_disjunctive",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders
                        WHERE o_orderstatus = 'F')
       OR c_custkey NOT IN (SELECT CASE WHEN o_orderstatus = 'P'
                                        THEN NULL ELSE o_custkey END
                            FROM orders)
    """,
)
def sql_not_in_disjunctive(spark, sf_dir):
    """NOT IN subquery in DISJUNCTIVE position with a null-capable
    result set — the SQL-standard three-valued case the r10 subquery
    fuzzer caught upstream Spark 4.1.2 getting wrong (the NOT IN arm
    must stay UNKNOWN for every probe because the subquery emits NULLs,
    so the answer is exactly the customers with an 'F' order; vanilla
    Spark's negated plain-equality ExistenceJoin would also admit
    customers with only-'P' or no orders). Routed through
    TableEnvironment.sql_query so catalog._rewrite_disjunctive_not_in
    restores the standard semantics the reference's Calcite-planned
    NOT IN has natively (FlinkSubQueryRemoveRule); the DuckDB oracle is
    the standard answer, making this gate an exact external check of
    the fix."""
    from flink_spark.catalog import TableEnvironment

    register_views(spark, sf_dir, "customer", "orders")
    return TableEnvironment(spark).sql_query(
        """
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders
                            WHERE o_orderstatus = 'F')
           OR c_custkey NOT IN (SELECT CASE WHEN o_orderstatus = 'P'
                                             THEN NULL ELSE o_custkey END
                                FROM orders)
        """
    )


_NIS_PROJECTED_SQL = """
SELECT c_custkey,
       CASE WHEN nf IS NULL THEN 'U' WHEN nf THEN 'T' ELSE 'F' END
           AS not_in_3v,
       CASE WHEN pf IS NULL THEN 'U' WHEN pf THEN 'T' ELSE 'F' END
           AS in_3v
FROM (SELECT c_custkey,
             c_custkey NOT IN (SELECT CASE WHEN o_orderstatus = 'P'
                                           THEN NULL ELSE o_custkey END
                               FROM orders) AS nf,
             c_custkey IN (SELECT CASE WHEN o_orderstatus = 'P'
                                       THEN NULL ELSE o_custkey END
                           FROM orders) AS pf
      FROM customer) t
"""


@query("sql_not_in_projected", oracle=_NIS_PROJECTED_SQL)
def sql_not_in_projected(spark, sf_dir):
    """[NOT] IN subquery in VALUE position (r11; the r10 fuzzer's
    disjunctive find extended by the value-position fuzz surface):
    a PROJECTED flag is a context that DISTINGUISHES FALSE from
    UNKNOWN, and upstream Spark 4.1.2 yields FALSE where the standard —
    and the reference's Calcite-planned IN/NOT IN
    (FlinkSubQueryRemoveRule.scala plans null-aware in every position)
    — yields NULL, for BOTH operators. The null-capable subquery
    (status 'P' orders project NULL) makes every non-matching
    customer's flag UNKNOWN; the dialect layer's EXISTS composite
    restores exactly that. The outer CASE folds the three states to
    non-null 'T'/'F'/'U' strings (the UNKNOWN state stays visible —
    the thing under test — while the gate output avoids nullable
    booleans, whose NULL spelling differs between the engines' pandas
    bridges)."""
    from flink_spark.catalog import TableEnvironment

    register_views(spark, sf_dir, "customer", "orders")
    return TableEnvironment(spark).sql_query(_NIS_PROJECTED_SQL)


#: Spark side: row-value [NOT] IN with a null-capable second element —
#: the dialect layer's r12 tuple composite restores three-valued logic.
_NIS_TUPLE_SPARK = """
SELECT c_custkey,
       CASE WHEN nf IS NULL THEN 'U' WHEN nf THEN 'T' ELSE 'F' END
           AS not_in_3v,
       CASE WHEN pf IS NULL THEN 'U' WHEN pf THEN 'T' ELSE 'F' END
           AS in_3v
FROM (SELECT c_custkey,
             (c_custkey, c_mktsegment) NOT IN
                 (SELECT o_custkey,
                         CASE WHEN o_orderstatus = 'P'
                              THEN NULL ELSE 'BUILDING' END
                  FROM orders) AS nf,
             (c_custkey, c_mktsegment) IN
                 (SELECT o_custkey,
                         CASE WHEN o_orderstatus = 'P'
                              THEN NULL ELSE 'BUILDING' END
                  FROM orders) AS pf
      FROM customer) t
"""

#: DuckDB cannot parse multi-column IN ("Subquery returns 2 columns"),
#: so the oracle spells the SQL-standard row-value IN from first
#: principles: TRUE iff a pairwise-equal row exists, else NULL iff a
#: row with an UNKNOWN pairwise comparison exists, else FALSE — an
#: independent formulation of the same semantics, not an echo of the
#: engine's EXISTS composite.
_NIS_TUPLE_ORACLE = """
SELECT c_custkey,
       CASE WHEN nf IS NULL THEN 'U' WHEN nf THEN 'T' ELSE 'F' END
           AS not_in_3v,
       CASE WHEN pf IS NULL THEN 'U' WHEN pf THEN 'T' ELSE 'F' END
           AS in_3v
FROM (SELECT c_custkey, NOT (m) AS nf, (m) AS pf
      FROM (SELECT c_custkey,
                   CASE WHEN EXISTS
                            (SELECT 1 FROM orders o
                             WHERE (o.o_custkey = c.c_custkey)
                               AND ((CASE WHEN o.o_orderstatus = 'P'
                                          THEN NULL ELSE 'BUILDING' END)
                                    = c.c_mktsegment))
                        THEN TRUE
                        WHEN EXISTS
                            (SELECT 1 FROM orders o
                             WHERE ((o.o_custkey = c.c_custkey)
                                    AND ((CASE WHEN o.o_orderstatus = 'P'
                                               THEN NULL
                                               ELSE 'BUILDING' END)
                                         = c.c_mktsegment)) IS NULL)
                        THEN NULL
                        ELSE FALSE END AS m
            FROM customer c) t1) t2
"""


@query("sql_not_in_tuple", oracle=_NIS_TUPLE_ORACLE)
def sql_not_in_tuple(spark, sf_dir):
    """Row-value (tuple) [NOT] IN subquery in VALUE position (r12) —
    the last documented deviance the dialect layer passed through:
    upstream Spark 4.1.2 yields FALSE where the standard says NULL for
    `(a, b) NOT IN (SELECT x, y ...)`, exactly the class r11 fixed for
    single-column probes (pinned in test_differential_fuzz
    test_known_deviation_tuple_not_in_subquery). The reference plans
    row-value IN null-aware everywhere (Calcite,
    flink-table-planner FlinkSubQueryRemoveRule.scala). The probe pairs
    (c_custkey, c_mktsegment) against (o_custkey, a status-gated
    segment literal that is NULL for 'P' orders), so all three states
    are reachable: 'T'/'F' via definite pair matches/mismatches, 'U'
    for customers whose only candidate rows carry the NULL element.
    The outer CASE folds to non-null 'T'/'F'/'U' strings; the DuckDB
    oracle is a first-principles CASE-over-EXISTS expansion because
    DuckDB has no multi-column IN."""
    from flink_spark.catalog import TableEnvironment

    register_views(spark, sf_dir, "customer", "orders")
    return TableEnvironment(spark).sql_query(_NIS_TUPLE_SPARK)


_QUANTIFIED_SQL = """
SELECT s_suppkey,
       CASE WHEN ga IS NULL THEN 'U' WHEN ga THEN 'T' ELSE 'F' END
           AS gt_all_3v,
       CASE WHEN gn IS NULL THEN 'U' WHEN gn THEN 'T' ELSE 'F' END
           AS gt_all_nn_3v,
       CASE WHEN la IS NULL THEN 'U' WHEN la THEN 'T' ELSE 'F' END
           AS lt_any_3v
FROM (SELECT s_suppkey,
             s_acctbal > ALL (SELECT CASE WHEN n_nationkey = 1
                                          THEN NULL
                                          ELSE CAST(n_nationkey * 1000
                                                    AS DECIMAL(12, 2))
                                          END
                              FROM nation WHERE n_nationkey < 4) AS ga,
             s_acctbal > ALL (SELECT CAST(n_nationkey * 1000
                                          AS DECIMAL(12, 2))
                              FROM nation
                              WHERE n_nationkey < 4
                                AND n_nationkey <> 1) AS gn,
             s_acctbal < SOME (SELECT CASE WHEN n_nationkey = 1
                                           THEN NULL
                                           ELSE CAST(n_nationkey * 1000
                                                     AS DECIMAL(12, 2))
                                           END
                               FROM nation WHERE n_nationkey < 4) AS la
      FROM supplier) t
"""


@query("sql_quantified_any_all", oracle=_QUANTIFIED_SQL)
def sql_quantified_any_all(spark, sf_dir):
    """Quantified subquery comparisons — ``> ALL`` and ``< SOME`` over
    null-capable and null-free sets (r11): SQL-standard syntax the
    reference plans natively (Calcite SqlStdOperatorTable SOME/ALL
    quantify operators; flink-table-planner SubQueryITCase) and Spark
    4.1.2 cannot parse at all; the dialect layer rewrites each into an
    exactly three-valued EXISTS composite
    (catalog._rewrite_quantified_cmp). The null-capable set makes the
    undecided rows UNKNOWN ('U' — a supplier above every non-null bound
    cannot be decided against the NULL element), the null-free twin
    proves the definite 'T' path, and the SOME spelling covers the ANY
    alias; all three states are visible in the gate output as non-null
    strings checked exactly against DuckDB's native quantified
    evaluation."""
    from flink_spark.catalog import TableEnvironment

    register_views(spark, sf_dir, "supplier", "nation")
    return TableEnvironment(spark).sql_query(_QUANTIFIED_SQL)


#: Spark side: CORRELATED quantified comparisons — per-customer ALL
#: over a null-capable order-price set and ANY over the raw set.
_QUANTIFIED_CORR_SPARK = """
SELECT c_custkey,
       CASE WHEN ga IS NULL THEN 'U' WHEN ga THEN 'T' ELSE 'F' END
           AS gt_all_3v,
       CASE WHEN la IS NULL THEN 'U' WHEN la THEN 'T' ELSE 'F' END
           AS lt_any_3v
FROM (SELECT c.c_custkey,
             c.c_acctbal > ALL (SELECT CASE WHEN o.o_orderstatus = 'P'
                                            THEN NULL
                                            ELSE o.o_totalprice END
                                FROM orders o
                                WHERE o.o_custkey = c.c_custkey
                                  AND o.o_orderkey % 7 = 0) AS ga,
             c.c_acctbal < ANY (SELECT o.o_totalprice
                                FROM orders o
                                WHERE o.o_custkey = c.c_custkey
                                  AND o.o_orderkey % 5 = 0) AS la
      FROM customer c) t
"""

#: DuckDB oracle: first-principles CASE-over-EXISTS expansion — DuckDB
#: 1.0.0's NATIVE correlated quantified comparison is itself deviant in
#: filter position (pinned in test_differential_fuzz
#: test_known_deviation_duckdb_correlated_any), so the oracle never
#: relies on it.
_QUANTIFIED_CORR_ORACLE = """
SELECT c_custkey,
       CASE WHEN ga IS NULL THEN 'U' WHEN ga THEN 'T' ELSE 'F' END
           AS gt_all_3v,
       CASE WHEN la IS NULL THEN 'U' WHEN la THEN 'T' ELSE 'F' END
           AS lt_any_3v
FROM (SELECT c.c_custkey,
             CASE WHEN EXISTS
                      (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey
                         AND o.o_orderkey % 7 = 0
                         AND NOT (c.c_acctbal >
                                  (CASE WHEN o.o_orderstatus = 'P'
                                        THEN NULL
                                        ELSE o.o_totalprice END)))
                  THEN FALSE
                  WHEN EXISTS
                      (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey
                         AND o.o_orderkey % 7 = 0
                         AND ((c.c_acctbal >
                               (CASE WHEN o.o_orderstatus = 'P'
                                     THEN NULL
                                     ELSE o.o_totalprice END))
                              IS NULL))
                  THEN NULL
                  ELSE TRUE END AS ga,
             CASE WHEN EXISTS
                      (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey
                         AND o.o_orderkey % 5 = 0
                         AND (c.c_acctbal < o.o_totalprice))
                  THEN TRUE
                  WHEN EXISTS
                      (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey
                         AND o.o_orderkey % 5 = 0
                         AND ((c.c_acctbal < o.o_totalprice) IS NULL))
                  THEN NULL
                  ELSE FALSE END AS la
      FROM customer c) t
"""


@query("sql_quantified_correlated", oracle=_QUANTIFIED_CORR_ORACLE)
def sql_quantified_correlated(spark, sf_dir):
    """CORRELATED quantified subquery comparisons (r12): ``> ALL`` /
    ``< ANY`` where Q correlates on the probe row — reference-parity
    syntax (Calcite SqlQuantifyOperator decorrelates natively;
    flink-table-planner SubQueryITCase correlated quantified cases)
    that upstream Spark cannot parse. The dialect layer's EXISTS
    composite carries the correlated Q directly: Spark 4.1.2 resolves
    outer references nested inside the derived-table wrap (measured
    r12 — the r11 'one level too deep' note is obsolete). All three
    states are reachable: ALL over an orderless customer's EMPTY set is
    'T' (the classic trap), a definite lower price gives 'F', and
    customers whose only undecided elements are the NULLed 'P'-status
    prices give 'U'. ANY over the empty set is 'F'. The DuckDB oracle
    is the first-principles CASE-over-EXISTS expansion because DuckDB's
    own native correlated quantified filter is deviant (pinned)."""
    from flink_spark.catalog import TableEnvironment

    register_views(spark, sf_dir, "customer", "orders")
    return TableEnvironment(spark).sql_query(_QUANTIFIED_CORR_SPARK)


@query(
    "join_theta_band",
    oracle="""
    SELECT s.s_suppkey, COUNT(*) AS n_close
    FROM supplier s
    JOIN customer c
      ON c.c_acctbal BETWEEN s.s_acctbal - 5.0 AND s.s_acctbal + 5.0
    GROUP BY s.s_suppkey
    """,
)
def join_theta_band(spark, sf_dir):
    """Pure theta (non-equi band) join → BroadcastNestedLoopJoin with the
    small side broadcast (reference BatchExecNestedLoopJoin.java:61)."""
    su = F.broadcast(load_table(spark, sf_dir, "supplier"))
    cu = load_table(spark, sf_dir, "customer")
    return (
        cu.join(
            su,
            (cu.c_acctbal >= su.s_acctbal - 5.0) & (cu.c_acctbal <= su.s_acctbal + 5.0),
        )
        .groupBy("s_suppkey")
        .agg(F.count("*").alias("n_close"))
    )


@query(
    "join_cross",
    oracle="""
    SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
    """,
)
def join_cross(spark, sf_dir):
    """Cartesian product of two tiny dims."""
    re = load_table(spark, sf_dir, "region")
    na = load_table(spark, sf_dir, "nation")
    return re.crossJoin(na).select("r_name", "n_name")


# ------------------------------------------------------------- set ops ----


@query(
    "set_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal < 100
    UNION
    SELECT s_nationkey FROM supplier WHERE s_acctbal < 2000
    """,
)
def set_union_distinct(spark, sf_dir):
    cu = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") < 100)
    su = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 2000)
    return (
        cu.select(F.col("c_nationkey").alias("nationkey"))
        .union(su.select("s_nationkey"))
        .distinct()
    )


@query(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9900
    INTERSECT
    SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000
    """,
)
def set_intersect(spark, sf_dir):
    cu = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9900)
    su = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 9000)
    return cu.select(F.col("c_nationkey").alias("nationkey")).intersect(
        su.select("s_nationkey")
    )


@query(
    "set_except_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_custkey <= 200
    EXCEPT ALL
    SELECT s_nationkey FROM supplier
    """,
)
def set_except_all(spark, sf_dir):
    """EXCEPT ALL — multiset semantics (reference rewrites via
    $REPLICATE_ROWS$1; Spark has native exceptAll)."""
    cu = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    su = load_table(spark, sf_dir, "supplier")
    return cu.select(F.col("c_nationkey").alias("nationkey")).exceptAll(
        su.select("s_nationkey")
    )


@query(
    "set_intersect_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_custkey <= 100
    INTERSECT ALL
    SELECT s_nationkey FROM supplier
    """,
)
def set_intersect_all(spark, sf_dir):
    cu = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 100)
    su = load_table(spark, sf_dir, "supplier")
    return cu.select(F.col("c_nationkey").alias("nationkey")).intersectAll(
        su.select("s_nationkey")
    )


# ---------------------------------------------------------- agg shapes ----


@query(
    "agg_grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) AS g_rf, GROUPING(l_linestatus) AS g_ls,
           {sql_dsum('l_quantity', 'sum_qty')}, COUNT(*) AS cnt
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def agg_grouping_sets(spark, sf_dir):
    """GROUPING SETS with GROUPING() markers → Spark Expand node, the same
    decomposition as reference DecomposeGroupingSetsRule.java."""
    register_views(spark, sf_dir, "lineitem")
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS INT) AS g_rf,
               CAST(grouping(l_linestatus) AS INT) AS g_ls,
               {sql_dsum('l_quantity', 'sum_qty')}, COUNT(*) AS cnt
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@query(
    "agg_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_extendedprice', 'sum_price')}, COUNT(*) AS cnt
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        dsum("l_extendedprice", "sum_price"), F.count("*").alias("cnt")
    )


@query(
    "agg_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity', 'sum_qty')}
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(dsum("l_quantity", "sum_qty"))


@query(
    "agg_distinct_mix",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS nd_parts,
           COUNT(DISTINCT l_suppkey) AS nd_supps,
           CAST(SUM(DISTINCT CAST(l_quantity AS {DEC})) AS DOUBLE) AS sum_d_qty,
           COUNT(*) AS cnt
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_distinct_mix(spark, sf_dir):
    """Multiple DISTINCT aggregates + plain count in one group-by → Spark's
    RewriteDistinctAggregates expand (reference
    FlinkAggregateExpandDistinctAggregatesRule.java)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("nd_parts"),
        F.countDistinct("l_suppkey").alias("nd_supps"),
        F.sum_distinct(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_d_qty"),
        F.count("*").alias("cnt"),
    )


@query(
    "agg_min_max_by",
    oracle="""
    SELECT o_custkey,
           max_by(o_orderkey, o_totalprice) AS biggest_order,
           min_by(o_orderkey, o_totalprice) AS smallest_order,
           MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
    FROM orders GROUP BY o_custkey
    """,
)
def agg_min_max_by(spark, sf_dir):
    """MAX_BY/MIN_BY (reference SingleValue-/FirstValue-family aggregates)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", "o_totalprice").alias("biggest_order"),
        F.min_by("o_orderkey", "o_totalprice").alias("smallest_order"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


@query(
    "agg_listagg",
    oracle="""
    SELECT l_returnflag,
           string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_listagg(spark, sf_dir):
    """LISTAGG (reference ListAggFunction) = sorted collect_set + join —
    deterministic output ordering by sorting the collected set."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.array_join(F.array_sort(F.collect_set("l_linestatus")), ",").alias("statuses")
    )


@query(
    "agg_stddev_var_exact",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(l_discount) AS n,
           CAST(SUM(CAST(l_discount AS {DEC})) AS DOUBLE) AS s1,
           CAST(SUM(CAST(l_discount * l_discount AS DECIMAL(30,12))) AS DOUBLE) AS s2,
           (CAST(SUM(CAST(l_discount * l_discount AS DECIMAL(30,12))) AS DOUBLE)
            - CAST(SUM(CAST(l_discount AS {DEC})) AS DOUBLE)
              * CAST(SUM(CAST(l_discount AS {DEC})) AS DOUBLE) / COUNT(l_discount))
           / (COUNT(l_discount) - 1) AS var_samp
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_stddev_var_exact(spark, sf_dir):
    """Variance via exact decimal moments (sum, sum-of-squares) then one
    double formula — order-independent, unlike streaming Welford; the same
    two-moment decomposition the reference's WelfordM2 retract agg keeps."""
    li = load_table(spark, sf_dir, "lineitem")
    d = F.col("l_discount")
    s1 = F.sum(d.cast(DEC)).cast("double")
    s2 = F.sum((d * d).cast("DECIMAL(30,12)")).cast("double")
    n = F.count(d)
    return li.groupBy("l_returnflag").agg(
        n.alias("n"),
        s1.alias("s1"),
        s2.alias("s2"),
        ((s2 - s1 * s1 / n) / (n - F.lit(1))).alias("var_samp"),
    )


@query(
    "agg_approx_count_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           TRUE AS approx_within_bound
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_count_distinct(spark, sf_dir):
    """approx_count_distinct — HLL++ (reference
    BatchApproxCountDistinctAggFunctions.java uses the same algorithm).
    HLL sketch values are engine-specific, so the *gated* columns are the
    exact distinct count plus a materialized relative-error check: the
    HLL++ default rsd is 5%, the gate asserts |approx-exact|/exact ≤ 15%
    (3σ) as a boolean the oracle pins to TRUE — turning the estimator into
    an exactly-checkable query instead of a rows-only row."""
    li = load_table(spark, sf_dir, "lineitem")
    approx = F.approx_count_distinct("l_partkey")
    exact = F.countDistinct("l_partkey")
    return li.groupBy("l_returnflag").agg(
        exact.alias("exact_parts"),
        (
            F.abs(approx - exact) <= 0.15 * exact
        ).alias("approx_within_bound"),
    ).select("l_returnflag", "exact_parts", "approx_within_bound")


# ------------------------------------------------------ subqueries etc ----


@query(
    "scalar_subquery",
    oracle=f"""
    SELECT c_custkey, c_acctbal FROM customer
    WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS {DEC})) AS DOUBLE)
                              / COUNT(c_acctbal) * 1.9 FROM customer)
    """,
)
def scalar_subquery(spark, sf_dir):
    """Scalar subquery in a predicate (reference TABLE_SUBQUERY_RULES)."""
    register_views(spark, sf_dir, "customer")
    return spark.sql(
        f"""
        SELECT c_custkey, c_acctbal FROM customer
        WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS {DEC})) AS DOUBLE)
                                  / COUNT(c_acctbal) * 1.9 FROM customer)
        """
    )


@query(
    "correlated_exists_having",
    oracle="""
    SELECT n.n_name, COUNT(*) AS n_rich
    FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
    WHERE c.c_acctbal > 9000
      AND EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 400000)
    GROUP BY n.n_name
    HAVING COUNT(*) > 2
    """,
)
def correlated_exists_having(spark, sf_dir):
    """Correlated EXISTS + HAVING — decorrelation path (reference
    FlinkDecorrelateProgram ↔ Catalyst DecorrelateInnerQuery)."""
    register_views(spark, sf_dir, "nation", "customer", "orders")
    return spark.sql(
        """
        SELECT n.n_name, COUNT(*) AS n_rich
        FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
        WHERE c.c_acctbal > 9000
          AND EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000)
        GROUP BY n.n_name
        HAVING COUNT(*) > 2
        """
    )


@query(
    "values_inline",
    oracle="""
    SELECT v.nk AS nationkey, v.tier, n.n_name
    FROM (VALUES (0, 'gold'), (1, 'silver'), (2, 'bronze')) v(nk, tier)
    JOIN nation n ON n.n_nationkey = v.nk
    """,
)
def values_inline(spark, sf_dir):
    """VALUES source (reference StreamExecValues.java:44)."""
    na = load_table(spark, sf_dir, "nation")
    v = spark.createDataFrame(
        [(0, "gold"), (1, "silver"), (2, "bronze")], "nk INT, tier STRING"
    )
    return v.join(F.broadcast(na), na.n_nationkey == v.nk).select(
        F.col("nk").alias("nationkey"), "tier", "n_name"
    )


# -------------------------------------------------------- unnest family ----


@query(
    "unnest_words",
    oracle="""
    SELECT w AS word, COUNT(*) AS freq
    FROM part, LATERAL (SELECT unnest(string_split(p_name, ' ')) AS w) u
    GROUP BY w
    """,
)
def unnest_words(spark, sf_dir):
    """UNNEST / explode (reference $UNNEST_ROWS$1 builtin → CorrelateExec)."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.select(F.explode(F.split("p_name", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


@query(
    "unnest_with_ordinality",
    oracle="""
    SELECT p_partkey, u.i - 1 AS pos, u.w AS word
    FROM part,
         LATERAL (SELECT unnest(string_split(p_name,' ')) AS w,
                         generate_subscripts(string_split(p_name,' '), 1) AS i) u
    WHERE p_partkey <= 200
    """,
)
def unnest_with_ordinality(spark, sf_dir):
    """UNNEST WITH ORDINALITY → posexplode."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 200)
    return p.select(
        "p_partkey", F.posexplode(F.split("p_name", " ")).alias("pos", "word")
    )


@query(
    "pivot_status",
    oracle=f"""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'O'
                    THEN CAST(l_quantity AS {DEC}) END) AS DOUBLE) AS qty_O,
           CAST(SUM(CASE WHEN l_linestatus = 'F'
                    THEN CAST(l_quantity AS {DEC}) END) AS DOUBLE) AS qty_F
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_status(spark, sf_dir):
    """PIVOT — Flink expresses this as FILTER'd aggs; Spark has it native."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast(DEC)).cast("double"))
        .withColumnRenamed("O", "qty_O")
        .withColumnRenamed("F", "qty_F")
    )


@query(
    "join_salted_skew",
    oracle="""
    SELECT l_orderkey, l_extendedprice, o_custkey, o_totalprice
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE o_custkey % 100 = 0
    """,
)
def join_salted_skew(spark, sf_dir):
    """Salted equi-join (manual skew mitigation; reference FLIP-510
    adaptive skewed join): lineitem salted by row id, orders replicated
    per salt — result identical to the plain join, hot orderkeys spread
    across n_salts tasks."""
    from flink_spark.operators.joins import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_linenumber"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey") % 100 == 0
    ).select("o_orderkey", "o_custkey", "o_totalprice")
    j = salted_join(li, o, "l_orderkey", "o_orderkey", n_salts=8,
                    id_col="l_linenumber")
    return j.select("l_orderkey", "l_extendedprice", "o_custkey", "o_totalprice")


@query(
    "agg_grouping_id",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) AS g_rf,
           GROUPING(l_returnflag, l_linestatus) AS gid,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
)
def agg_grouping_id(spark, sf_dir):
    """GROUPING / GROUPING_ID over a CUBE (reference
    BuiltInFunctionDefinitions GROUPING/GROUPING_ID, Expand node): the
    bitmask identifying which grouping-set each output row belongs to."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("bigint").alias("g_rf"),
        F.grouping_id("l_returnflag", "l_linestatus").alias("gid"),
        F.count("*").alias("n"),
    )


@query(
    "set_except_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_custkey <= 200
    EXCEPT
    SELECT s_nationkey FROM supplier WHERE s_suppkey <= 10
    """,
)
def set_except_distinct(spark, sf_dir):
    """EXCEPT (distinct) — set semantics (Calcite Minus; Spark subtract)."""
    cu = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    su = load_table(spark, sf_dir, "supplier").filter(F.col("s_suppkey") <= 10)
    return cu.select(F.col("c_nationkey").alias("nationkey")).subtract(
        su.select("s_nationkey")
    )
