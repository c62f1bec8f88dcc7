"""TPC-H-adapted headline queries on the reduced star schema.

Mirrors the reference's TPC-H correctness gate (reference:
flink-end-to-end-tests/flink-tpch-test/, test_tpch.sh:51-66) adapted to the
driver's column subset. Each query = idiomatic DataFrame program; Catalyst
supplies pushdown/broadcast/codegen (SURVEY §4).

Scale notes: dims (region/nation/supplier/part at TPC-H ratios) are
broadcast; fact-fact joins (orders⋈lineitem) shuffle on the join key, which
is also the natural bucketing key at 100 TB. Aggregates use the decimal-sum
discipline from queries.util (order-independent ⇒ safe under any reduce
tree).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_spark.queries.registry import query
from flink_spark.queries.util import dsum, davg, sql_dsum, sql_davg
from flink_spark.sources.tables import load_table


@query(
    "tpch_q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity', 'sum_qty')},
           {sql_dsum('l_extendedprice', 'sum_base_price')},
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
           {sql_davg('l_quantity', 'avg_qty')},
           {sql_davg('l_extendedprice', 'avg_price')},
           {sql_davg('l_discount', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1(spark, sf_dir):
    """Scan→filter→hash-agg→sort. Flink analog: BatchExecHashAggregate
    (reference BatchExecHashAggregate.java:73); Spark HashAggregateExec with
    partial/final split — filter + projection push into the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "tpch_q3_shipping_priority",
    oracle=f"""
    SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')}
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q3(spark, sf_dir):
    """Fact-fact join + top-k. customer is the small side → broadcast; the
    orders⋈lineitem join shuffles on orderkey. Final ORDER BY..LIMIT becomes
    TakeOrderedAndProject (no full sort). Flink analog BatchExecHashJoin /
    BatchExecSortLimit (reference BatchExecSortLimit.java:65)."""
    cutoff = F.lit("1998-03-15").cast("timestamp_ntz")
    cu = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cu), o.o_custkey == cu.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


@query(
    "tpch_q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')}
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC
    """,
)
def q5(spark, sf_dir):
    """Six-way join: the canonical broadcast-dim star join. supplier/nation/
    region broadcast; customer⋈orders⋈lineitem shuffle on their keys. Flink
    analog: join reorder + BatchExecHashJoin chain (SURVEY §2.3)."""
    cu = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cu, o.o_custkey == cu.c_custkey)
        .join(
            F.broadcast(su),
            (li.l_suppkey == su.s_suppkey) & (cu.c_nationkey == su.s_nationkey),
        )
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"))
    )


@query(
    "tpch_q6_forecast_revenue",
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice * l_discount', 'revenue')}
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6(spark, sf_dir):
    """Pure scan-filter-agg: every predicate must reach PushedFilters in the
    parquet scan; single-stage partial/final agg, no shuffle of raw rows."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))


@query(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')}
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10(spark, sf_dir):
    """Group-by over a 4-way join with top-k; nation broadcast."""
    cu = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    na = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cu, o.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Remaining TPC-H query shapes (q2..q22), adapted to the reduced schema.
#
# The driver's star schema has no partsupp table and no commit/receipt
# dates.  Adaptations preserving each query's operator shape:
#   - partsupp        → `supply`: the distinct (partkey, suppkey) pairs seen
#     in lineitem, with ps_supplycost = MIN(unit price) and ps_availqty =
#     exact-decimal SUM(l_quantity).  Same cardinality role and same join
#     shape, derivable on both engines deterministically.
#   - "late" lineitem → l_shipdate > o_orderdate + 60 days (replaces
#     l_receiptdate > l_commitdate).
#   - l_shipmode      → parity of l_linenumber (deterministic 2-value proxy).
#   - c_phone country → c_nationkey % 10.
# Reference gate: flink-end-to-end-tests/flink-tpch-test/ (22 queries).
# ---------------------------------------------------------------------------

from flink_spark.queries.util import DEC

_SUPPLY_SQL = """supply AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         MIN(l_extendedprice / l_quantity) AS ps_supplycost,
         CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS ps_availqty
  FROM lineitem GROUP BY 1, 2)"""


def _supply(spark, sf_dir, part_keys=None):
    """partsupp stand-in derived from lineitem (see module note). One
    shuffle on (partkey, suppkey); at 100 TB this is the same shuffle the
    downstream join would need, so deriving it adds no extra exchange.

    ``part_keys``: optional single-column DataFrame of p_partkey — when the
    consumer filters parts anyway, a broadcast semi-join prunes lineitem
    BEFORE the aggregate, shrinking its shuffle by the part selectivity
    (per-(partkey,suppkey) results are unchanged; cf. q17/q9)."""
    li = load_table(spark, sf_dir, "lineitem")
    if part_keys is not None:
        li = li.join(
            F.broadcast(part_keys),
            li.l_partkey == part_keys[part_keys.columns[0]],
            "left_semi",
        )
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost"),
        F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("ps_availqty"),
    )


@query(
    "tpch_q2_min_cost_supplier",
    oracle=f"""
    WITH {_SUPPLY_SQL},
    eu AS (
      SELECT p.p_partkey, s.s_suppkey, s.s_acctbal, s.s_name, n.n_name,
             sp.ps_supplycost
      FROM supply sp
      JOIN part p ON p.p_partkey = sp.ps_partkey
      JOIN supplier s ON s.s_suppkey = sp.ps_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE p.p_size = 15 AND p.p_type = 'LARGE' AND r.r_name = 'EUROPE')
    SELECT s_acctbal, s_name, n_name, p_partkey, ps_supplycost
    FROM (SELECT *, MIN(ps_supplycost) OVER (PARTITION BY p_partkey) AS mc
          FROM eu) t
    WHERE ps_supplycost = mc
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q2(spark, sf_dir):
    """Min-cost supplier per part: correlated-min subquery expressed as a
    window MIN over the regional supply (Flink rewrites the correlated
    scalar subquery the same way; SURVEY §4.1 subquery rewrite). Dims
    broadcast; supply shuffles once on partkey for the window."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "LARGE")
    )
    sp = _supply(spark, sf_dir, part_keys=p.select("p_partkey"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    from pyspark.sql import Window

    eu = (
        sp.join(F.broadcast(p), sp.ps_partkey == p.p_partkey)
        .join(F.broadcast(s), sp.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    w = Window.partitionBy("p_partkey")
    return (
        eu.withColumn("mc", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("mc"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "ps_supplycost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4(spark, sf_dir):
    """EXISTS → left-semi join (the same rewrite Flink's SEMI_JOIN_RULES
    apply; SURVEY §4.1). Lateness adaptation: shipped after order date."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "tpch_q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {sql_dsum('volume', 'revenue')}
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l.l_shipdate) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00') shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7(spark, sf_dir):
    """Bi-directional nation pair join: the same nation dim joined twice
    under different roles (self-join aliasing), disjunctive pair predicate
    evaluated post-join."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "tpch_q8_market_share",
    oracle=f"""
    SELECT o_year,
           CAST(SUM(CAST((CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END) AS {DEC})) AS DOUBLE)
           / CAST(SUM(CAST(volume AS {DEC})) AS DOUBLE) AS mkt_share
    FROM (
      SELECT year(o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n1.n_regionkey
      JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00') all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q8(spark, sf_dir):
    """Market share: conditional-sum ratio over an 8-way star join. Both
    sums are decimal-exact so the final single IEEE division is
    bit-identical across engines."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    df = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
        .select(F.year("o_orderdate").alias("o_year"), volume.alias("volume"), "nation")
    )
    nat = F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(F.lit(0.0))
    return (
        df.groupBy("o_year")
        .agg(
            (
                F.sum(nat.cast(DEC)).cast("double")
                / F.sum(F.col("volume").cast(DEC)).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "tpch_q9_product_type_profit",
    oracle="""
    WITH supm AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             MIN(CAST(floor(l_extendedprice / l_quantity * 1000000.0 + 0.5) AS BIGINT))
               AS sc_micros
      FROM lineitem GROUP BY 1, 2)
    SELECT nation, o_year,
           CAST(SUM(amount_micros) AS DOUBLE) / 1000000.0 AS sum_profit
    FROM (
      SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
             CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 1000000.0 + 0.5)
                  AS BIGINT)
               - sp.sc_micros * CAST(l.l_quantity AS BIGINT) AS amount_micros
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN supm sp ON sp.ps_partkey = l.l_partkey AND sp.ps_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE p.p_name LIKE 'red%') profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q9(spark, sf_dir):
    """Product-type profit: lineitem joined back to the supply aggregate on
    the composite (partkey, suppkey) key — at scale both sides hash-shuffle
    on the same composite key so the join is co-partitioned.

    Numeric note: supplycost comes from a division, whose double result can
    sit exactly on a DECIMAL-scale-6 tie where Spark (HALF_UP) and DuckDB
    disagree. So the whole profit computation runs in integer micro-units:
    floor(x * 1e6 + 0.5) on bit-identical IEEE doubles is exact on both
    engines, and every later step (MIN, multiply by integral quantity,
    subtract, SUM) is integer arithmetic."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey"), F.col("n_name").alias("nation")
    )
    sc_micros = F.floor(
        F.col("l_extendedprice") / F.col("l_quantity") * 1000000.0 + 0.5
    )
    # min-supplycost is per (partkey, suppkey) and only consumed for red%
    # parts — prune its input with the same broadcast semi-join first, so
    # the aggregate's shuffle carries ~1/25th of lineitem (cf. q17)
    li_p = li.join(
        F.broadcast(p.select("p_partkey")),
        li.l_partkey == F.col("p_partkey"),
        "left_semi",
    )
    supm = li_p.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(F.min(sc_micros).alias("sc_micros"))
    amount_micros = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1000000.0 + 0.5
    ) - F.col("sc_micros") * F.col("l_quantity").cast("bigint")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(supm, (li.l_partkey == supm.ps_partkey) & (li.l_suppkey == supm.ps_suppkey))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "nation",
            F.year("o_orderdate").alias("o_year"),
            amount_micros.alias("amount_micros"),
        )
        .groupBy("nation", "o_year")
        .agg((F.sum("amount_micros").cast("double") / 1000000.0).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@query(
    "tpch_q11_important_stock",
    oracle="""
    WITH supm AS (
      SELECT l_partkey AS ps_partkey,
             MIN(CAST(floor(l_extendedprice / l_quantity * 1000000.0 + 0.5) AS BIGINT))
               * CAST(SUM(l_quantity) AS BIGINT) AS value_micros
      FROM lineitem GROUP BY l_partkey, l_suppkey),
    pv AS (SELECT ps_partkey,
                  CAST(SUM(value_micros) AS DOUBLE) / 1000000.0 AS value
           FROM supm GROUP BY ps_partkey),
    tot AS (SELECT CAST(SUM(value_micros) AS DOUBLE) / 1000000.0 AS total FROM supm)
    SELECT ps_partkey, value
    FROM pv, tot
    WHERE value > 0.00075 * total
    ORDER BY value DESC, ps_partkey
    """,
)
def q11(spark, sf_dir):
    """Important stock: HAVING against a scalar-subquery total → broadcast
    the one-row total and filter (Flink rewrites to nested-loop join on a
    single-row side; SURVEY §2.3). Supply value in integer micro-units —
    see q9's numeric note."""
    li = load_table(spark, sf_dir, "lineitem")
    sc_micros = F.floor(
        F.col("l_extendedprice") / F.col("l_quantity") * 1000000.0 + 0.5
    )
    supm = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(
        (F.min(sc_micros) * F.sum("l_quantity").cast("bigint")).alias("value_micros")
    )
    # roll up to per-part BEFORE sharing: the reused (cached) set is |parts|
    # rows, not |part×supp|, and the integer total over it is identical
    pvm = supm.groupBy("ps_partkey").agg(
        F.sum("value_micros").alias("pv_micros")
    ).cache()
    pv = pvm.select(
        "ps_partkey",
        (F.col("pv_micros").cast("double") / 1000000.0).alias("value"),
    )
    tot = pvm.agg(
        (F.sum("pv_micros").cast("double") / 1000000.0).alias("total")
    )
    return (
        pv.crossJoin(F.broadcast(tot))
        .filter(F.col("value") > 0.00075 * F.col("total"))
        .select("ps_partkey", "value")
        .orderBy(F.desc("value"), "ps_partkey")
    )


@query(
    "tpch_q12_shipmode_priority",
    oracle="""
    SELECT CASE WHEN l_linenumber % 2 = 0 THEN 'MAIL' ELSE 'SHIP' END AS shipmode,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1
    ORDER BY 1
    """,
)
def q12(spark, sf_dir):
    """Shipmode priority: conditional-count pivot over a fact-fact join
    (l_shipmode proxied by linenumber parity on the reduced schema)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .withColumn(
            "shipmode",
            F.when(F.col("l_linenumber") % 2 == 0, "MAIL").otherwise("SHIP"),
        )
        .groupBy("shipmode")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("shipmode")
    )


@query(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
          FROM customer c LEFT OUTER JOIN orders o
            ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13(spark, sf_dir):
    """Customer order-count distribution: outer join with an extra join-time
    predicate, then a second aggregation over the first's results."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "tpch_q14_promo_effect",
    oracle=f"""
    SELECT 100.0 * {sql_dsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END", 'x').replace(' AS x', '')}
           / {sql_dsum('l_extendedprice * (1 - l_discount)', 'y').replace(' AS y', '')}
           AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
    """,
)
def q14(spark, sf_dir):
    """Promo revenue share: conditional ratio, part broadcast."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    )
    p = load_table(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0))
    return li.join(F.broadcast(p), li.l_partkey == p.p_partkey).agg(
        (
            F.lit(100.0)
            * F.sum(promo.cast(DEC)).cast("double")
            / F.sum(disc.cast(DEC)).cast("double")
        ).alias("promo_revenue")
    )


@query(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH revenue0 AS (
      SELECT l_suppkey AS supplier_no,
             {sql_dsum('l_extendedprice * (1 - l_discount)', 'total_revenue')}
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
    ORDER BY s_suppkey
    """,
)
def q15(spark, sf_dir):
    """Top supplier: view + scalar MAX subquery; exact-decimal revenue makes
    the double equality well-defined on both engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue")
    )
    s = load_table(spark, sf_dir, "supplier")
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        s.join(rev, s.s_suppkey == rev.supplier_no)
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q16_parts_supplier",
    oracle=f"""
    WITH {_SUPPLY_SQL}
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT ps_suppkey) AS supplier_cnt
    FROM supply JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#45' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 7, 10, 14, 19, 25, 36)
      AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16(spark, sf_dir):
    """Parts/supplier: NOT IN over a non-null key → left-anti join (the
    null-aware path isn't needed; keys are non-null by construction)."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 7, 10, 14, 19, 25, 36))
    )
    # the inner join on filtered parts lets the supply aggregate's lineitem
    # input be semi-join pruned first (per-(partkey,suppkey) rows unchanged)
    sp = _supply(spark, sf_dir, part_keys=p.select("p_partkey"))
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    return (
        sp.join(F.broadcast(p), sp.ps_partkey == p.p_partkey)
        .join(F.broadcast(bad), sp.ps_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "tpch_q17_small_quantity",
    oracle=f"""
    WITH pa AS (
      SELECT l_partkey AS pk,
             CAST(SUM(CAST(l_quantity AS {DEC})) AS DOUBLE) / COUNT(l_quantity) AS avg_qty
      FROM lineitem GROUP BY l_partkey)
    SELECT CAST(SUM(CAST(l_extendedprice AS {DEC})) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pa ON pk = l_partkey
    WHERE p_brand = 'Brand#23' AND l_quantity < 0.2 * avg_qty
    """,
)
def q17(spark, sf_dir):
    """Small-quantity revenue: correlated AVG subquery → per-part aggregate
    joined back to lineitem (exactly Flink's decorrelation result)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    # The per-part average is only consumed for Brand#23 parts, so prune
    # lineitem with a broadcast semi-join BEFORE aggregating: the avg per
    # surviving part is unchanged, and the aggregate's shuffle shrinks by
    # the brand selectivity (~50x) — the semi-join-transpose rewrite
    # Flink/Catalyst won't derive across the decorrelated aggregate.
    li_b = li.join(
        F.broadcast(p.select("p_partkey")),
        li.l_partkey == F.col("p_partkey"),
        "left_semi",
    )
    pa = li_b.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.sum(F.col("l_quantity").cast(DEC)).cast("double") / F.count("l_quantity")).alias(
            "avg_qty"
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(pa, li.l_partkey == pa.pk)
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / 7.0).alias(
                "avg_yearly"
            )
        )
    )


@query(
    "tpch_q18_large_volume_customer",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey, {sql_dsum('l_quantity', 'sum_qty')}
      FROM lineitem GROUP BY l_orderkey
      HAVING CAST(SUM(CAST(l_quantity AS {DEC})) AS DOUBLE) > 220)
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
    FROM big
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
    LIMIT 100
    """,
)
def q18(spark, sf_dir):
    """Large-volume customers: IN over a grouped HAVING subquery → aggregate
    first, then join the (much smaller) qualifying set to orders/customer."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity", "sum_qty"))
        .filter(F.col("sum_qty") > 220)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(100)
    )


@query(
    "tpch_q19_discounted_revenue",
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def q19(spark, sf_dir):
    """Disjunctive multi-branch predicate over a broadcast join — Catalyst
    extracts the common p_partkey equi-key and keeps the OR as a post-join
    filter, same as Flink's nested-loop fallback avoidance."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    b = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30))
    )
    return j.filter(b).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue")
    )


@query(
    "tpch_q20_potential_promotion",
    oracle=f"""
    WITH {_SUPPLY_SQL},
    s96 AS (
      SELECT l_partkey, l_suppkey,
             CAST(SUM(CAST(l_quantity AS {DEC})) AS DOUBLE) AS qty96
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_partkey, l_suppkey),
    excess AS (
      SELECT ps_partkey, ps_suppkey
      FROM supply JOIN s96
        ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
      WHERE qty96 > 0.5 * ps_availqty)
    SELECT s_name FROM supplier
    WHERE s_suppkey IN (SELECT ps_suppkey FROM excess
                        JOIN part ON p_partkey = ps_partkey
                        WHERE p_name LIKE 'red%')
      AND s_nationkey IN (SELECT n_nationkey FROM nation
                          JOIN region ON n_regionkey = r_regionkey
                          WHERE r_name = 'EUROPE')
    ORDER BY s_name
    """,
)
def q20(spark, sf_dir):
    """Potential promotion: chained IN subqueries → two left-semi joins;
    the availability comparison uses exact-decimal quantity sums."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    sp = _supply(spark, sf_dir, part_keys=p.select("p_partkey"))
    li96 = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("qty96"))
    )
    excess = (
        sp.join(
            li96,
            (sp.ps_partkey == li96.l_partkey) & (sp.ps_suppkey == li96.l_suppkey),
        )
        .filter(F.col("qty96") > 0.5 * F.col("ps_availqty"))
        .join(F.broadcast(p), F.col("ps_partkey") == p.p_partkey, "left_semi")
        .select("ps_suppkey")
    )
    eu = (
        load_table(spark, sf_dir, "nation")
        .join(
            F.broadcast(load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
            "left_semi",
        )
        .select("n_nationkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        s.join(excess, s.s_suppkey == excess.ps_suppkey, "left_semi")
        .join(F.broadcast(eu), s.s_nationkey == eu.n_nationkey, "left_semi")
        .select("s_name")
        .orderBy("s_name")
    )


@query(
    "tpch_q21_suppliers_waiting",
    oracle="""
    WITH lo AS (
      SELECT l_orderkey, l_suppkey,
             CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END AS is_late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'),
    stats AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN is_late = 1 THEN l_suppkey END) AS n_late
      FROM lo GROUP BY l_orderkey)
    SELECT s_name, COUNT(DISTINCT lo.l_orderkey) AS numwait
    FROM lo
    JOIN stats ON stats.l_orderkey = lo.l_orderkey
    JOIN supplier ON s_suppkey = lo.l_suppkey
    WHERE lo.is_late = 1 AND n_supp >= 2 AND n_late = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def q21(spark, sf_dir):
    """Suppliers who kept orders waiting: the EXISTS/NOT-EXISTS pair over
    sibling lineitems decorrelates into one per-order aggregate (supplier
    count + late-supplier count) joined back — one shuffle on orderkey
    instead of two correlated scans. Lateness = shipped >60d after order."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    lo = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .withColumn(
            "is_late",
            F.when(
                F.expr("l_shipdate > o_orderdate + INTERVAL 60 DAYS"), 1
            ).otherwise(0),
        )
        .select("l_orderkey", "l_suppkey", "is_late")
    )
    stats = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("is_late") == 1, F.col("l_suppkey"))
        ).alias("n_late"),
    )
    return (
        lo.filter(F.col("is_late") == 1)
        .join(stats, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(F.broadcast(s), lo.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


@query(
    "tpch_q22_global_sales_opportunity",
    oracle=f"""
    WITH pool AS (
      SELECT c_custkey, c_acctbal, c_nationkey % 10 AS cntrycode
      FROM customer WHERE c_nationkey % 10 IN (0, 1, 2, 3, 4)),
    ab AS (SELECT CAST(SUM(CAST(c_acctbal AS {DEC})) AS DOUBLE) / COUNT(c_acctbal) AS avgbal
           FROM pool WHERE c_acctbal > 0.0)
    SELECT cntrycode, COUNT(*) AS numcust, {sql_dsum('c_acctbal', 'totacctbal')}
    FROM pool, ab
    WHERE c_acctbal > avgbal
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
)
def q22(spark, sf_dir):
    """Global sales opportunity: scalar AVG subquery (broadcast one-row) +
    NOT EXISTS → left-anti join (country code proxied by nationkey % 10;
    "no orders" scoped to the last data years so the set is non-empty on the
    synthetic distribution, where every customer has old orders)."""
    c = load_table(spark, sf_dir, "customer").withColumn(
        "cntrycode", F.col("c_nationkey") % 10
    )
    pool = c.filter(F.col("cntrycode").isin(0, 1, 2, 3, 4))
    ab = pool.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double") / F.count("c_acctbal")
        ).alias("avgbal")
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp_ntz")
    )
    return (
        pool.crossJoin(F.broadcast(ab))
        .filter(F.col("c_acctbal") > F.col("avgbal"))
        .join(o, pool.c_custkey == o.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(F.count("*").alias("numcust"), dsum("c_acctbal", "totacctbal"))
        .orderBy("cntrycode")
    )
