"""TPC-DS-shaped query pack (SURVEY §2 / VERDICT round-1 #3).

The reference's primary correctness gate is 103 TPC-DS queries at SF1
(reference flink-end-to-end-tests/test-scripts/test_tpcds.sh:22,
flink-end-to-end-tests/flink-tpcds-test/tpcds-tool/query/*.sql). The
testdata has no TPC-DS tables, so this pack translates the *plan shapes*
that make TPC-DS harder than TPC-H onto the existing star schema:

  - multi-dim snowflake star joins with dim filters       (q3, q7, q19)
  - CTE chains with semi-join reductions                  (q23)
  - channel-UNION of aggregates, re-aggregated            (q33/q56/q60, q5)
  - ROLLUP reports with GROUPING() + window rank          (q36, q67)
  - OR-of-ANDs disjunct band predicates                   (q48)
  - scalar-subquery pivot rows                            (q88)
  - HAVING-band buyer buckets                             (q34/q73)
  - returns netting                                       (q93)
  - cumulative-window channel comparison, FULL OUTER      (q51)
  - EXISTS chains over two facts                          (q10/q35)
  - channel overlap via FULL OUTER distinct keys          (q97)
  - INTERSECT chains across channels                      (q38, q14)
  - year-over-year growth-ratio comparison                (q74/q11)
  - moving-average deviation with LAG/LEAD                (q47)
  - latency-band CASE pivot on date arithmetic            (q50)
  - near-equal cross-channel balance ratios               (q58)
  - sales net of returns via anti-join                    (q78)
  - double-EXISTS (multi-supplier + returns) chains       (q95)
  - spend-band histograms (stacked aggregations)          (q54)
  - quarter-over-quarter growth via window LAG            (q31)
  - active-customer semi-join + ROLLUP demographics       (q35)
  - before/after pivot around an event date               (q40)
  - 12-column monthly CASE pivot                          (q66)
  - year-over-year decline, net of returns                (q75)
  - ROLLUP + RANK within each rollup level                (q70)
  - per-channel ranked return ratios                      (q49)
  - EXISTS + NOT EXISTS distinct-count report             (q16)

Role mapping: lineitem = store_sales fact, events = web_sales fact,
orders carries the date dimension (o_orderdate), part = item,
customer/supplier/nation/region = the snowflake dims.

All 99 TPC-DS query numbers are covered as first-class gated queries:
80 as named shapes below, and the remaining 19 (q20 q29 q52 q56 q57 q60
q63 q68 q73 q79 q80 q81 q82 q83 q85 q86 q89 q91 q99 — the in-family
variants of shapes here, e.g. q57 = q47 on the second channel) in
tpcds_shapes2.py, each with its own literals, measures, and exact
oracle.

Scale notes (100 TB discipline): every dim side is broadcast (part,
supplier, nation ≤ SF·O(k) rows); fact-fact joins shuffle on their join
key only after dim filters are pushed into the scans; rollup/report
windows run over *aggregated* outputs (|groups| rows, not fact rows).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from flink_spark.queries.registry import query
from flink_spark.queries.util import DEC, davg, dsum, sql_davg, sql_dsum
from flink_spark.sources.tables import load_table


@query(
    "tpcds_q3_brand_year_report",
    oracle=f"""
    SELECT EXTRACT(YEAR FROM o.o_orderdate)::BIGINT AS order_year,
           p.p_brand AS brand,
           {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue")}
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN part p   ON l.l_partkey = p.p_partkey
    WHERE p.p_type LIKE 'PROMO%'
    GROUP BY 1, 2
    """,
)
def tpcds_q3_brand_year_report(spark, sf_dir):
    """TPC-DS q3 shape (fact × date_dim × item with an item filter,
    year/brand report; reference tpcds-tool/query/query3.sql): the item
    filter prunes the fact before the shuffle, item is broadcast, the date
    dim arrives through the orders join."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_type").like("PROMO%")
    ).select("p_partkey", "p_brand")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.year("o_orderdate").cast("bigint").alias("order_year"),
            F.col("p_brand").alias("brand"),
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


@query(
    "tpcds_q7_star_profile",
    oracle=f"""
    SELECT p.p_brand AS brand,
           {sql_davg("l.l_quantity", "avg_qty")},
           {sql_davg("l.l_extendedprice", "avg_price")},
           {sql_davg("l.l_discount", "avg_disc")}
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    WHERE p.p_size <= 20
      AND s.s_acctbal > 0
      AND o.o_orderpriority IN ('1-URGENT', '2-HIGH')
    GROUP BY 1
    """,
)
def tpcds_q7_star_profile(spark, sf_dir):
    """TPC-DS q7 shape (fact ⋈ 4 dims, each dim filtered, AVG profile per
    item attribute; reference query7.sql): all dim filters are pushed into
    the dim scans, both small dims broadcast — a pure star with one fact
    shuffle per non-broadcast join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 20).select(
        "p_partkey", "p_brand"
    )
    s = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") > 0
    ).select("s_suppkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).select("o_orderkey")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
        )
    )


@query(
    "tpcds_q19_cross_nation_brand",
    oracle=f"""
    SELECT p.p_brand AS brand,
           {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", "ext_revenue")}
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN part p     ON l.l_partkey = p.p_partkey
    WHERE c.c_nationkey <> s.s_nationkey
      AND p.p_retailprice > 990
    GROUP BY 1
    """,
)
def tpcds_q19_cross_nation_brand(spark, sf_dir):
    """TPC-DS q19 shape (brand revenue where the buyer's geography differs
    from the seller's — DS compares customer zip vs store zip; reference
    query19.sql): the cross-geography predicate is a post-join filter over
    two broadcast dims, never a join explosion."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_retailprice") > 990
    ).select("p_partkey", "p_brand")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "ext_revenue"))
    )


@query(
    "tpcds_q23_frequent_parts_best_customers",
    oracle=f"""
    WITH frequent_parts AS (
      SELECT l_partkey FROM lineitem
      GROUP BY l_partkey HAVING COUNT(DISTINCT l_orderkey) > 4
    ), best_customers AS (
      SELECT o_custkey FROM orders
      GROUP BY o_custkey
      HAVING CAST(SUM(CAST(o_totalprice AS {DEC})) AS DOUBLE) > 400000
    )
    SELECT {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", "frequent_best_revenue")},
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_partkey IN (SELECT l_partkey FROM frequent_parts)
      AND o.o_custkey IN (SELECT o_custkey FROM best_customers)
    """,
)
def tpcds_q23_frequent_parts_best_customers(spark, sf_dir):
    """TPC-DS q23 shape (CTE chain: frequent items × best customers, then
    the sales restricted to both via semi-joins; reference query23.sql):
    both reduction sets are aggregates far smaller than the fact, joined
    as LEFT SEMI so no payload is carried."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    frequent = (
        li.groupBy("l_partkey")
        .agg(F.countDistinct("l_orderkey").alias("n_ord"))
        .filter(F.col("n_ord") > 4)
        .select("l_partkey")
    )
    best = (
        o.groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("spend"))
        .filter(F.col("spend") > 400000)
        .select("o_custkey")
    )
    best_orders = o.join(best, "o_custkey", "left_semi").select("o_orderkey")
    return (
        li.join(frequent, "l_partkey", "left_semi")
        .join(best_orders, li.l_orderkey == best_orders.o_orderkey, "left_semi")
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "frequent_best_revenue",
            ),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "tpcds_q33_channel_union_brand",
    oracle=f"""
    WITH per_channel AS (
      SELECT 'returned' AS channel, l_partkey,
             CAST(SUM(CAST(l_extendedprice AS {DEC})) AS {DEC}) AS rev
      FROM lineitem WHERE l_returnflag = 'R' GROUP BY 2
      UNION ALL
      SELECT 'accepted', l_partkey,
             CAST(SUM(CAST(l_extendedprice AS {DEC})) AS {DEC})
      FROM lineitem WHERE l_returnflag = 'A' GROUP BY 2
      UNION ALL
      SELECT 'open', l_partkey,
             CAST(SUM(CAST(l_extendedprice AS {DEC})) AS {DEC})
      FROM lineitem WHERE l_returnflag = 'N' GROUP BY 2
    )
    SELECT p.p_brand AS brand, CAST(SUM(pc.rev) AS DOUBLE) AS total_rev,
           COUNT(*) AS n_channel_parts
    FROM per_channel pc JOIN part p ON pc.l_partkey = p.p_partkey
    WHERE p.p_size <= 10
    GROUP BY 1
    """,
)
def tpcds_q33_channel_union_brand(spark, sf_dir):
    """TPC-DS q33/q56/q60 shape (same aggregate computed per channel,
    UNION ALL'd, re-aggregated against the item dim; reference
    query33.sql): three grouped scans union into a tiny per-channel table;
    the final rollup joins the broadcast dim."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 10).select(
        "p_partkey", "p_brand"
    )

    def channel(flag: str, label: str):
        return (
            li.filter(F.col("l_returnflag") == flag)
            .groupBy("l_partkey")
            .agg(F.sum(F.col("l_extendedprice").cast(DEC)).cast(DEC).alias("rev"))
            .select(F.lit(label).alias("channel"), "l_partkey", "rev")
        )

    per_channel = (
        channel("R", "returned")
        .unionAll(channel("A", "accepted"))
        .unionAll(channel("N", "open"))
    )
    return (
        per_channel.join(F.broadcast(p), per_channel.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.sum("rev").cast("double").alias("total_rev"),
            F.count("*").alias("n_channel_parts"),
        )
    )


@query(
    "tpcds_q36_margin_rollup_rank",
    oracle=f"""
    WITH agg AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             GROUPING(r.r_name) + GROUPING(n.n_name) AS lochierarchy,
             CAST(SUM(CAST(l.l_extendedprice * l.l_discount AS {DEC})) AS DOUBLE)
               / CAST(SUM(CAST(l.l_extendedprice AS {DEC})) AS DOUBLE)
               AS discount_ratio
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
      GROUP BY ROLLUP(r.r_name, n.n_name)
    )
    SELECT region, nation, lochierarchy,
           discount_ratio,
           RANK() OVER (PARTITION BY lochierarchy, CASE WHEN lochierarchy = 0
                          THEN region END
                        ORDER BY discount_ratio DESC,
                                 COALESCE(nation, ''), COALESCE(region, ''))
             ::BIGINT AS rank_within_parent
    FROM agg
    """,
)
def tpcds_q36_margin_rollup_rank(spark, sf_dir):
    """TPC-DS q36 shape (gross-margin ROLLUP over the geography hierarchy
    with GROUPING() level + RANK within parent; reference query36.sql):
    rollup runs on the fact once; the rank window sees only |groups| rows."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey", "n_name"
    )
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    joined = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    agg = (
        joined.withColumnRenamed("r_name", "region")
        .withColumnRenamed("n_name", "nation")
        .rollup("region", "nation")
        .agg(
            (F.grouping("region") + F.grouping("nation"))
            .cast("bigint")
            .alias("lochierarchy"),
            (
                F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast(DEC))
                .cast("double")
                / F.sum(F.col("l_extendedprice").cast(DEC)).cast("double")
            ).alias("discount_ratio"),
        )
    )
    w = Window.partitionBy(
        "lochierarchy",
        F.when(F.col("lochierarchy") == 0, F.col("region")),
    ).orderBy(
        F.desc("discount_ratio"),
        F.coalesce("nation", F.lit("")),
        F.coalesce("region", F.lit("")),
    )
    return agg.select(
        "region",
        "nation",
        "lochierarchy",
        "discount_ratio",
        F.rank().over(w).cast("bigint").alias("rank_within_parent"),
    )


@query(
    "tpcds_q48_disjunct_bands",
    oracle=f"""
    SELECT CAST(SUM(CAST(l.l_quantity AS {DEC})) AS DOUBLE) AS total_qty,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE (c.c_mktsegment = 'BUILDING'
             AND l.l_extendedprice BETWEEN 100 AND 20000)
       OR (c.c_mktsegment = 'AUTOMOBILE'
             AND l.l_extendedprice BETWEEN 15000 AND 35000)
       OR (c.c_mktsegment = 'MACHINERY'
             AND l.l_extendedprice BETWEEN 30000 AND 60000)
    """,
)
def tpcds_q48_disjunct_bands(spark, sf_dir):
    """TPC-DS q48 shape (one aggregate under an OR of AND-band predicates
    across dim attribute × fact measure; reference query48.sql): the
    disjunction can't prune the scan, but it is a single codegen'd filter
    — no union-of-scans rewrite needed."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    seg = F.col("c_mktsegment")
    price = F.col("l_extendedprice")
    cond = (
        ((seg == "BUILDING") & price.between(100, 20000))
        | ((seg == "AUTOMOBILE") & price.between(15000, 35000))
        | ((seg == "MACHINERY") & price.between(30000, 60000))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .filter(cond)
        .agg(
            F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("total_qty"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "tpcds_q88_timeband_pivot",
    oracle="""
    SELECT COUNT(*) FILTER (WHERE EXTRACT(HOUR FROM ts) BETWEEN 0 AND 2)  AS h0_2,
           COUNT(*) FILTER (WHERE EXTRACT(HOUR FROM ts) BETWEEN 3 AND 5)  AS h3_5,
           COUNT(*) FILTER (WHERE EXTRACT(HOUR FROM ts) BETWEEN 6 AND 8)  AS h6_8,
           COUNT(*) FILTER (WHERE EXTRACT(HOUR FROM ts) BETWEEN 9 AND 11) AS h9_11,
           COUNT(*) FILTER (WHERE EXTRACT(HOUR FROM ts) BETWEEN 12 AND 14) AS h12_14,
           COUNT(*) FILTER (WHERE EXTRACT(HOUR FROM ts) BETWEEN 15 AND 17) AS h15_17,
           COUNT(*) FILTER (WHERE EXTRACT(HOUR FROM ts) BETWEEN 18 AND 20) AS h18_20,
           COUNT(*) FILTER (WHERE EXTRACT(HOUR FROM ts) BETWEEN 21 AND 23) AS h21_23
    FROM events WHERE event_type IN ('click', 'view')
    """,
)
def tpcds_q88_timeband_pivot(spark, sf_dir):
    """TPC-DS q88 shape (eight scalar COUNT subqueries over disjoint time
    bands pivoted into one row; reference query88.sql): expressed as ONE
    conditional-aggregate scan instead of eight scans — the rewrite DS
    planners apply; 8× less IO, identical result."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    hour = F.hour("ts")

    def band(lo, hi, alias):
        return F.count_if(hour.between(lo, hi)).alias(alias)

    return ev.agg(
        band(0, 2, "h0_2"),
        band(3, 5, "h3_5"),
        band(6, 8, "h6_8"),
        band(9, 11, "h9_11"),
        band(12, 14, "h12_14"),
        band(15, 17, "h15_17"),
        band(18, 20, "h18_20"),
        band(21, 23, "h21_23"),
    )


@query(
    "tpcds_q34_linecount_band_buyers",
    oracle="""
    WITH counted AS (
      SELECT l_orderkey, COUNT(*) AS n_lines
      FROM lineitem GROUP BY 1 HAVING COUNT(*) BETWEEN 5 AND 7
    )
    SELECT c.c_custkey, c.c_name, ct.n_lines
    FROM counted ct
    JOIN orders o   ON ct.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def tpcds_q34_linecount_band_buyers(spark, sf_dir):
    """TPC-DS q34/q73 shape (basket-size HAVING band → who are the buyers;
    reference query34.sql): the HAVING reduces the fact to a small order
    set before touching customer."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    counted = (
        li.groupBy("l_orderkey")
        .agg(F.count("*").alias("n_lines"))
        .filter(F.col("n_lines").between(5, 7))
    )
    return (
        counted.join(o, counted.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "n_lines")
    )


@query(
    "tpcds_q5_multi_channel_rollup",
    oracle=f"""
    WITH unified AS (
      SELECT 'store' AS channel,
             CAST(l_extendedprice * (1 - l_discount) AS {DEC}) AS sales,
             CASE WHEN l_returnflag = 'R'
                  THEN CAST(l_extendedprice AS {DEC}) ELSE CAST(0 AS {DEC})
             END AS returns
      FROM lineitem
      UNION ALL
      SELECT 'web',
             CAST(value AS {DEC}),
             CASE WHEN event_type = 'error' THEN CAST(value AS {DEC})
                  ELSE CAST(0 AS {DEC}) END
      FROM events
    )
    SELECT channel,
           CAST(GROUPING(channel) AS INT) AS g_channel,
           CAST(SUM(sales) AS DOUBLE) AS total_sales,
           CAST(SUM(returns) AS DOUBLE) AS total_returns,
           CAST(SUM(sales - returns) AS DOUBLE) AS profit
    FROM unified
    GROUP BY ROLLUP(channel)
    """,
)
def tpcds_q5_multi_channel_rollup(spark, sf_dir):
    """TPC-DS q5 shape (per-channel sales/returns/profit unioned across
    facts, reported with ROLLUP; reference query5.sql): each fact maps to
    the unified (channel, sales, returns) schema before a single rollup —
    the DS pattern for heterogeneous fact consolidation."""
    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")
    store = li.select(
        F.lit("store").alias("channel"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast(DEC)
        .alias("sales"),
        F.when(
            F.col("l_returnflag") == "R", F.col("l_extendedprice").cast(DEC)
        )
        .otherwise(F.lit(0).cast(DEC))
        .alias("returns"),
    )
    web = ev.select(
        F.lit("web").alias("channel"),
        F.col("value").cast(DEC).alias("sales"),
        F.when(F.col("event_type") == "error", F.col("value").cast(DEC))
        .otherwise(F.lit(0).cast(DEC))
        .alias("returns"),
    )
    return (
        store.unionAll(web)
        .rollup("channel")
        .agg(
            F.grouping("channel").cast("int").alias("g_channel"),
            F.sum("sales").cast("double").alias("total_sales"),
            F.sum("returns").cast("double").alias("total_returns"),
            F.sum(F.col("sales") - F.col("returns")).cast("double").alias("profit"),
        )
    )


@query(
    "tpcds_q93_net_after_returns",
    oracle=f"""
    SELECT o.o_custkey AS custkey,
           CAST(SUM(CASE WHEN l.l_returnflag = 'R'
                    THEN CAST(0 AS {DEC})
                    ELSE CAST(l.l_extendedprice * (1 - l.l_discount) AS {DEC})
               END) AS DOUBLE) AS net_sales
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    HAVING CAST(SUM(CASE WHEN l.l_returnflag = 'R'
                    THEN CAST(0 AS {DEC})
                    ELSE CAST(l.l_extendedprice * (1 - l.l_discount) AS {DEC})
               END) AS DOUBLE) > 200000
    """,
)
def tpcds_q93_net_after_returns(spark, sf_dir):
    """TPC-DS q93 shape (sales netted against the returns fact per
    customer; reference query93.sql — store_sales LEFT JOIN store_returns
    folds returned lines out of the net): the returns fold is a CASE
    inside one aggregation, not a second scan."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    net = (
        F.when(F.col("l_returnflag") == "R", F.lit(0).cast(DEC))
        .otherwise((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.sum(net).cast("double").alias("net_sales"))
        .filter(F.col("net_sales") > 200000)
    )


@query(
    "tpcds_q51_cumulative_channels",
    oracle="""
    WITH store_daily AS (
      SELECT date_trunc('day', l_shipdate) AS d, COUNT(*) AS n
      FROM lineitem WHERE l_shipdate >= TIMESTAMP '2001-01-01' GROUP BY 1
    ), web_daily AS (
      SELECT date_trunc('day', ts) AS d, COUNT(*) AS n
      FROM events GROUP BY 1
    ), cum AS (
      SELECT COALESCE(s.d, w.d) AS d,
             SUM(s.n) OVER (ORDER BY COALESCE(s.d, w.d)
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS store_cum,
             SUM(w.n) OVER (ORDER BY COALESCE(s.d, w.d)
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS web_cum
      FROM store_daily s FULL OUTER JOIN web_daily w ON s.d = w.d
    )
    SELECT d, CAST(store_cum AS BIGINT) AS store_cum,
           CAST(web_cum AS BIGINT) AS web_cum
    FROM cum
    WHERE COALESCE(web_cum, 0) > COALESCE(store_cum, 0)
    """,
)
def tpcds_q51_cumulative_channels(spark, sf_dir):
    """TPC-DS q51 shape (per-day cumulative volume of two channels FULL
    OUTER joined on date, keep days where one channel's cumulative leads;
    reference query51.sql): the window runs over the *daily* aggregate
    (|days| rows), never the facts. Volume = row counts, which makes the
    cross-over non-empty on this dataset (the web fact out-counts the
    2001 store tail — volume ratios are scale-invariant, so the
    cross-over survives any SF) and keeps the window arithmetic integer-exact."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("2001-01-01").cast("timestamp_ntz")
    )
    ev = load_table(spark, sf_dir, "events")
    store = li.groupBy(F.date_trunc("day", "l_shipdate").alias("d")).agg(
        F.count("*").alias("n")
    )
    web = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count("*").alias("n")
    )
    joined = store.alias("s").join(
        web.alias("w"), F.col("s.d") == F.col("w.d"), "full_outer"
    ).select(
        F.coalesce(F.col("s.d"), F.col("w.d")).alias("d"),
        F.col("s.n").alias("store_n"),
        F.col("w.n").alias("web_n"),
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = joined.select(
        "d",
        F.sum("store_n").over(w).alias("store_cum"),
        F.sum("web_n").over(w).alias("web_cum"),
    )
    return cum.filter(
        F.coalesce(F.col("web_cum"), F.lit(0))
        > F.coalesce(F.col("store_cum"), F.lit(0))
    ).select("d", "store_cum", "web_cum")


@query(
    "tpcds_q10_exists_two_facts",
    oracle="""
    SELECT c.c_mktsegment AS segment, COUNT(*) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '1997-01-01')
      AND EXISTS (SELECT 1 FROM events e
                  WHERE e.user_id = c.c_custkey AND e.event_type = 'purchase')
    GROUP BY 1
    """,
)
def tpcds_q10_exists_two_facts(spark, sf_dir):
    """TPC-DS q10/q35 shape (customers active in BOTH channels via an
    EXISTS chain over two facts; reference query10.sql): two LEFT SEMI
    joins against pre-filtered, pre-deduplicated key sets — the streaming
    shuffle carries keys only."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz")
    ).select("o_custkey")
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).select("user_id")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .join(ev, c.c_custkey == ev.user_id, "left_semi")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count("*").alias("n_customers"))
    )


@query(
    "tpcds_q67_rollup_topn",
    oracle=f"""
    WITH agg AS (
      SELECT p_type, p_brand,
             CAST(GROUPING(p_type) AS INT) AS g_type,
             CAST(GROUPING(p_brand) AS INT) AS g_brand,
             CAST(SUM(CAST(l.l_extendedprice AS {DEC})) AS DOUBLE) AS sales
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY ROLLUP(p_type, p_brand)
    )
    SELECT * FROM (
      SELECT p_type, p_brand, g_type, g_brand, sales,
             RANK() OVER (PARTITION BY g_type, g_brand, p_type
                          ORDER BY sales DESC, COALESCE(p_brand, ''))::BIGINT
               AS rk
      FROM agg
    ) WHERE rk <= 3
    """,
)
def tpcds_q67_rollup_topn(spark, sf_dir):
    """TPC-DS q67 shape (rank the rollup rows within their hierarchy
    parent, keep the top N per parent; reference query67.sql): the rank
    window partitions by the grouping level so totals never compete with
    leaves; runs over |groups| rows post-rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type", "p_brand")
    agg = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .rollup("p_type", "p_brand")
        .agg(
            F.grouping("p_type").cast("int").alias("g_type"),
            F.grouping("p_brand").cast("int").alias("g_brand"),
            F.sum(F.col("l_extendedprice").cast(DEC)).cast("double").alias("sales"),
        )
    )
    w = Window.partitionBy("g_type", "g_brand", "p_type").orderBy(
        F.desc("sales"), F.coalesce("p_brand", F.lit(""))
    )
    return (
        agg.select(
            "p_type",
            "p_brand",
            "g_type",
            "g_brand",
            "sales",
            F.rank().over(w).cast("bigint").alias("rk"),
        )
        .filter(F.col("rk") <= 3)
    )


@query(
    "tpcds_q97_channel_overlap",
    oracle="""
    WITH store_keys AS (
      SELECT DISTINCT o_custkey AS k FROM orders
      WHERE o_orderdate < TIMESTAMP '1995-01-01'
    ), web_keys AS (
      SELECT DISTINCT o_custkey AS k FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01'
    )
    SELECT COUNT(*) FILTER (WHERE s.k IS NOT NULL AND w.k IS NOT NULL)
             AS both_channels,
           COUNT(*) FILTER (WHERE s.k IS NOT NULL AND w.k IS NULL)
             AS store_only,
           COUNT(*) FILTER (WHERE s.k IS NULL AND w.k IS NOT NULL)
             AS web_only
    FROM store_keys s FULL OUTER JOIN web_keys w ON s.k = w.k
    """,
)
def tpcds_q97_channel_overlap(spark, sf_dir):
    """TPC-DS q97 shape (customer overlap between two channels via FULL
    OUTER JOIN of distinct key sets; reference query97.sql): dedup first
    (map-side partial distinct), join keys only, then one conditional
    aggregate row."""
    o = load_table(spark, sf_dir, "orders")
    cutoff = F.lit("1995-01-01").cast("timestamp_ntz")
    store = (
        o.filter(F.col("o_orderdate") < cutoff)
        .select(F.col("o_custkey").alias("sk"))
        .distinct()
    )
    web = (
        o.filter(F.col("o_orderdate") >= cutoff)
        .select(F.col("o_custkey").alias("wk"))
        .distinct()
    )
    joined = store.join(web, store.sk == web.wk, "full_outer")
    return joined.agg(
        F.count_if(F.col("sk").isNotNull() & F.col("wk").isNotNull()).alias(
            "both_channels"
        ),
        F.count_if(F.col("sk").isNotNull() & F.col("wk").isNull()).alias(
            "store_only"
        ),
        F.count_if(F.col("sk").isNull() & F.col("wk").isNotNull()).alias(
            "web_only"
        ),
    )


# ---------------------------------------------------------------------------
# round-2 additions: ten more distinct TPC-DS plan shapes
# (channel proxy: l_linenumber % 3 → store/web/catalog; returns proxy:
#  l_returnflag = 'R'; cents-BIGINT arithmetic where ratios/thresholds
#  must be exact across engines)

_CENTS = "CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)"


def _cents_col():
    return F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
    ).cast("bigint")


@query(
    "tpcds_q38_channel_intersect",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_customers FROM (
      SELECT DISTINCT o_custkey FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE l_linenumber % 3 = 0
      INTERSECT
      SELECT DISTINCT o_custkey FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE l_linenumber % 3 = 1
      INTERSECT
      SELECT DISTINCT o_custkey FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE l_linenumber % 3 = 2
    ) t
    """,
)
def tpcds_q38_channel_intersect(spark, sf_dir):
    """TPC-DS q38 shape (customers present in ALL three channels via
    INTERSECT of distinct keys; reference query38.sql): each branch
    reduces to a distinct key set before the set op, so the INTERSECTs
    run over |customers| rows, not fact rows."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")

    def channel(c):
        return (
            o.join(
                li.filter(F.col("l_linenumber") % 3 == c),
                o.o_orderkey == li.l_orderkey,
            )
            .select("o_custkey")
            .distinct()
        )

    all3 = channel(0).intersect(channel(1)).intersect(channel(2))
    return all3.agg(F.count("*").alias("n_customers"))


@query(
    "tpcds_q74_yoy_growth",
    oracle=f"""
    WITH rev AS (
      SELECT o_custkey AS custkey,
             EXTRACT(YEAR FROM o_orderdate)::BIGINT AS yr,
             l_linenumber % 3 = 1 AS is_web,
             SUM({_CENTS}) AS cents
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE EXTRACT(YEAR FROM o_orderdate) IN (1995, 1996)
      GROUP BY 1, 2, 3),
    cells AS (
      SELECT custkey,
             SUM(CASE WHEN is_web AND yr = 1995 THEN cents ELSE 0 END) AS w95,
             SUM(CASE WHEN is_web AND yr = 1996 THEN cents ELSE 0 END) AS w96,
             SUM(CASE WHEN NOT is_web AND yr = 1995 THEN cents ELSE 0 END) AS s95,
             SUM(CASE WHEN NOT is_web AND yr = 1996 THEN cents ELSE 0 END) AS s96
      FROM rev GROUP BY 1)
    SELECT custkey,
           CAST(w96 AS DOUBLE) / w95 AS web_ratio,
           CAST(s96 AS DOUBLE) / s95 AS store_ratio
    FROM cells
    WHERE w95 > 0 AND w96 > 0 AND s95 > 0 AND s96 > 0
      AND CAST(w96 AS DOUBLE) / w95 > CAST(s96 AS DOUBLE) / s95
    """,
)
def tpcds_q74_yoy_growth(spark, sf_dir):
    """TPC-DS q74/q11 shape (year-over-year growth ratio compared across
    two channels per customer; reference query74.sql): one conditional
    aggregation builds all four (channel × year) cells in a single fact
    pass — no self-join of yearly aggregates — then an exact-cents ratio
    filter. The classic 4-way CTE self-join collapses to one shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate").isin(1995, 1996)
    )
    j = o.join(li, o.o_orderkey == li.l_orderkey).select(
        F.col("o_custkey").alias("custkey"),
        F.year("o_orderdate").cast("bigint").alias("yr"),
        (F.col("l_linenumber") % 3 == 1).alias("is_web"),
        _cents_col().alias("cents"),
    )

    def cell(web, yr):
        cond = (F.col("is_web") == web) & (F.col("yr") == yr)
        return F.sum(F.when(cond, F.col("cents")).otherwise(0))

    cells = j.groupBy("custkey").agg(
        cell(True, 1995).alias("w95"), cell(True, 1996).alias("w96"),
        cell(False, 1995).alias("s95"), cell(False, 1996).alias("s96"),
    )
    web_ratio = F.col("w96").cast("double") / F.col("w95")
    store_ratio = F.col("s96").cast("double") / F.col("s95")
    return (
        cells.filter(
            (F.col("w95") > 0) & (F.col("w96") > 0)
            & (F.col("s95") > 0) & (F.col("s96") > 0)
            & (web_ratio > store_ratio)
        )
        .select(
            "custkey",
            web_ratio.alias("web_ratio"),
            store_ratio.alias("store_ratio"),
        )
    )


@query(
    "tpcds_q47_moving_deviation",
    oracle=f"""
    WITH monthly AS (
      SELECT p_brand AS brand,
             date_trunc('month', o_orderdate) AS mon,
             SUM({_CENTS}) AS cents
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN part ON l_partkey = p_partkey
      WHERE p_type LIKE 'STANDARD%'
      GROUP BY 1, 2),
    win AS (
      SELECT brand, mon, cents,
             SUM(cents) OVER (PARTITION BY brand, EXTRACT(YEAR FROM mon)) AS yr_cents,
             COUNT(*) OVER (PARTITION BY brand, EXTRACT(YEAR FROM mon)) AS yr_months,
             LAG(cents)  OVER (PARTITION BY brand ORDER BY mon) AS prev_cents,
             LEAD(cents) OVER (PARTITION BY brand ORDER BY mon) AS next_cents
      FROM monthly)
    SELECT brand, mon,
           CAST(cents AS DOUBLE) / 100 AS revenue,
           CAST(yr_cents AS DOUBLE) / (100 * yr_months) AS yr_avg,
           CAST(prev_cents AS DOUBLE) / 100 AS prev_revenue,
           CAST(next_cents AS DOUBLE) / 100 AS next_revenue
    FROM win
    WHERE 10 * cents * yr_months < 9 * yr_cents
       OR 10 * cents * yr_months > 11 * yr_cents
    """,
)
def tpcds_q47_moving_deviation(spark, sf_dir):
    """TPC-DS q47 shape (months deviating ±10% from the brand's yearly
    average, reported with neighbor months via LAG/LEAD; reference
    query47.sql): windows run over the aggregated |brand × month| frame,
    and the deviation test is exact integer-cents arithmetic
    (10·rev·months vs 9/11·year-total) so the boundary can't float-flip
    between engines."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_type").like("STANDARD%")
    ).select("p_partkey", "p_brand")
    monthly = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.date_trunc("month", "o_orderdate").alias("mon"),
        )
        .agg(F.sum(_cents_col()).alias("cents"))
    )
    wyr = Window.partitionBy("brand", F.year("mon"))
    wseq = Window.partitionBy("brand").orderBy("mon")
    win = monthly.select(
        "brand", "mon", "cents",
        F.sum("cents").over(wyr).alias("yr_cents"),
        F.count("*").over(wyr).alias("yr_months"),
        F.lag("cents").over(wseq).alias("prev_cents"),
        F.lead("cents").over(wseq).alias("next_cents"),
    )
    dev = (10 * F.col("cents") * F.col("yr_months") < 9 * F.col("yr_cents")) | (
        10 * F.col("cents") * F.col("yr_months") > 11 * F.col("yr_cents")
    )
    return win.filter(dev).select(
        "brand", "mon",
        (F.col("cents").cast("double") / 100).alias("revenue"),
        (F.col("yr_cents").cast("double") / (100 * F.col("yr_months"))).alias("yr_avg"),
        (F.col("prev_cents").cast("double") / 100).alias("prev_revenue"),
        (F.col("next_cents").cast("double") / 100).alias("next_revenue"),
    )


@query(
    "tpcds_q50_returns_latency",
    oracle="""
    SELECT n_name AS nation,
           CAST(SUM(CASE WHEN dd <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS d_30,
           CAST(SUM(CASE WHEN dd > 30 AND dd <= 60 THEN 1 ELSE 0 END) AS BIGINT) AS d_60,
           CAST(SUM(CASE WHEN dd > 60 AND dd <= 90 THEN 1 ELSE 0 END) AS BIGINT) AS d_90,
           CAST(SUM(CASE WHEN dd > 90 AND dd <= 120 THEN 1 ELSE 0 END) AS BIGINT) AS d_120,
           CAST(SUM(CASE WHEN dd > 120 THEN 1 ELSE 0 END) AS BIGINT) AS d_more
    FROM (
      SELECT s_nationkey,
             CAST(FLOOR((epoch(l_shipdate) - epoch(o_orderdate)) / 86400.0) AS BIGINT) AS dd
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      WHERE l_returnflag = 'R') r
    JOIN nation ON r.s_nationkey = n_nationkey
    GROUP BY 1
    """,
)
def tpcds_q50_returns_latency(spark, sf_dir):
    """TPC-DS q50 shape (returns bucketed by days between sale and
    return, CASE-pivoted into latency-band counts per store; reference
    query50.sql): the day difference is epoch arithmetic (identical IEEE
    ops both engines), buckets are integer CASE sums, dims broadcast."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    dd = F.floor(
        (F.unix_timestamp("l_shipdate") - F.unix_timestamp("o_orderdate")) / 86400.0
    ).cast("bigint")
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(F.col("n_name").alias("nation"), dd.alias("dd"))
    )

    def band(cond, name):
        return F.sum(F.when(cond, 1).otherwise(0)).alias(name)

    d = F.col("dd")
    return j.groupBy("nation").agg(
        band(d <= 30, "d_30"),
        band((d > 30) & (d <= 60), "d_60"),
        band((d > 60) & (d <= 90), "d_90"),
        band((d > 90) & (d <= 120), "d_120"),
        band(d > 120, "d_more"),
    )


@query(
    "tpcds_q58_balanced_channels",
    oracle=f"""
    WITH per AS (
      SELECT l_partkey AS partkey,
             SUM(CASE WHEN l_linenumber % 3 = 0 THEN {_CENTS} ELSE 0 END) AS store_c,
             SUM(CASE WHEN l_linenumber % 3 = 1 THEN {_CENTS} ELSE 0 END) AS web_c,
             SUM(CASE WHEN l_linenumber % 3 = 2 THEN {_CENTS} ELSE 0 END) AS cat_c
      FROM lineitem GROUP BY 1)
    SELECT partkey,
           CAST(store_c AS DOUBLE) / 100 AS store_rev,
           CAST(web_c AS DOUBLE) / 100 AS web_rev,
           CAST(cat_c AS DOUBLE) / 100 AS cat_rev
    FROM per
    WHERE store_c > 0 AND web_c > 0 AND cat_c > 0
      AND 30 * store_c BETWEEN 9 * (store_c + web_c + cat_c)
                           AND 11 * (store_c + web_c + cat_c)
      AND 30 * web_c   BETWEEN 9 * (store_c + web_c + cat_c)
                           AND 11 * (store_c + web_c + cat_c)
      AND 30 * cat_c   BETWEEN 9 * (store_c + web_c + cat_c)
                           AND 11 * (store_c + web_c + cat_c)
    """,
)
def tpcds_q58_balanced_channels(spark, sf_dir):
    """TPC-DS q58 shape (items whose revenue is near-equal — within ±10%
    of the cross-channel average — in all three channels; reference
    query58.sql): the three channel CTEs collapse to one conditional
    aggregation pass; the balance test is exact integer cents
    (30·channel vs 9/11·total ⇔ ±10% of total/3)."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = _cents_col()

    def chan(c, name):
        return F.sum(
            F.when(F.col("l_linenumber") % 3 == c, cents).otherwise(0)
        ).alias(name)

    per = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        chan(0, "store_c"), chan(1, "web_c"), chan(2, "cat_c")
    )
    total = F.col("store_c") + F.col("web_c") + F.col("cat_c")

    def near(c):
        return (30 * F.col(c) >= 9 * total) & (30 * F.col(c) <= 11 * total)

    return (
        per.filter(
            (F.col("store_c") > 0) & (F.col("web_c") > 0) & (F.col("cat_c") > 0)
            & near("store_c") & near("web_c") & near("cat_c")
        )
        .select(
            "partkey",
            (F.col("store_c").cast("double") / 100).alias("store_rev"),
            (F.col("web_c").cast("double") / 100).alias("web_rev"),
            (F.col("cat_c").cast("double") / 100).alias("cat_rev"),
        )
    )


@query(
    "tpcds_q78_net_of_returns",
    oracle=f"""
    WITH returned AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_returnflag = 'R')
    SELECT EXTRACT(YEAR FROM o_orderdate)::BIGINT AS yr,
           p_brand AS brand,
           CAST(COUNT(*) AS BIGINT) AS n_sales,
           CAST(SUM(CAST(l_quantity AS {DEC})) AS DOUBLE) AS sum_qty,
           CAST(SUM({_CENTS}) AS DOUBLE) / 100 AS net_revenue
    FROM lineitem l
    JOIN orders ON l.l_orderkey = o_orderkey
    JOIN part ON l.l_partkey = p_partkey
    WHERE l.l_returnflag <> 'R'
      AND NOT EXISTS (SELECT 1 FROM returned r
                      WHERE r.l_orderkey = l.l_orderkey
                        AND r.l_partkey = l.l_partkey)
    GROUP BY 1, 2
    """,
)
def tpcds_q78_net_of_returns(spark, sf_dir):
    """TPC-DS q78 shape (sales net of returns: exclude any sale whose
    (order, item) has a matching return row, then a year/brand report;
    reference query78.sql): a genuine anti-join against the distinct
    returned-key set — cross-row semantics a mere filter can't express —
    with the returned side reduced before the join."""
    li = load_table(spark, sf_dir, "lineitem")
    returned = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    sales = li.filter(F.col("l_returnflag") != "R").join(
        returned, ["l_orderkey", "l_partkey"], "left_anti"
    )
    return (
        sales.join(o, sales.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), sales.l_partkey == p.p_partkey)
        .groupBy(
            F.year("o_orderdate").cast("bigint").alias("yr"),
            F.col("p_brand").alias("brand"),
        )
        .agg(
            F.count("*").alias("n_sales"),
            dsum("l_quantity", "sum_qty"),
            (F.sum(_cents_col()).cast("double") / 100).alias("net_revenue"),
        )
    )


@query(
    "tpcds_q95_multi_supplier_orders",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS {DEC})) AS DOUBLE) AS total_price
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l1 JOIN lineitem l2
                  ON l1.l_orderkey = l2.l_orderkey
                 AND l1.l_suppkey <> l2.l_suppkey
                  WHERE l1.l_orderkey = o.o_orderkey)
      AND EXISTS (SELECT 1 FROM lineitem lr
                  WHERE lr.l_orderkey = o.o_orderkey
                    AND lr.l_returnflag = 'R')
    """,
)
def tpcds_q95_multi_supplier_orders(spark, sf_dir):
    """TPC-DS q95 shape (web orders shipped from more than one warehouse
    AND having a return, double-EXISTS chain; reference query95.sql).
    Spark lowering: the correlated self-join EXISTS becomes a per-order
    COUNT(DISTINCT supplier) ≥ 2 aggregate — one shuffle instead of a
    fact×fact self-join — and both EXISTS become semi-joins."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    multi = (
        li.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("ns"))
        .filter(F.col("ns") >= 2)
        .select("l_orderkey")
    )
    with_ret = (
        li.filter(F.col("l_returnflag") == "R").select("l_orderkey").distinct()
    )
    keep = o.join(
        multi, o.o_orderkey == multi.l_orderkey, "left_semi"
    ).join(with_ret, o.o_orderkey == with_ret.l_orderkey, "left_semi")
    return keep.agg(
        F.count("*").alias("n_orders"),
        dsum("o_totalprice", "total_price"),
    )


@query(
    "tpcds_q54_spend_bands",
    oracle=f"""
    WITH spend AS (
      SELECT o_custkey, SUM({_CENTS}) AS cents
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY 1)
    SELECT CAST(cents // 500000 AS BIGINT) AS band,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM spend
    GROUP BY 1
    """,
)
def tpcds_q54_spend_bands(spark, sf_dir):
    """TPC-DS q54 shape (customer revenue segmented into fixed spend
    bands, histogram of band populations; reference query54.sql): two
    stacked aggregations — per-customer exact cents, then integer-divide
    banding — both plain hash aggs."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    spend = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum(_cents_col()).alias("cents"))
    )
    return (
        spend.groupBy(
            F.floor(F.col("cents") / 500000).cast("bigint").alias("band")
        )
        .agg(F.count("*").alias("n_customers"))
    )


@query(
    "tpcds_q31_qoq_growth",
    oracle=f"""
    WITH q AS (
      SELECT n_name AS nation,
             EXTRACT(YEAR FROM o_orderdate)::BIGINT AS yr,
             EXTRACT(QUARTER FROM o_orderdate)::BIGINT AS qtr,
             SUM({_CENTS}) AS cents
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1, 2, 3)
    SELECT nation, yr, qtr,
           CAST(cents AS DOUBLE) / 100 AS revenue,
           CAST(cents AS DOUBLE) / lag_cents AS qoq_ratio
    FROM (SELECT nation, yr, qtr, cents,
                 LAG(cents) OVER (PARTITION BY nation ORDER BY yr, qtr) AS lag_cents
          FROM q) t
    WHERE lag_cents IS NOT NULL AND lag_cents > 0
    """,
)
def tpcds_q31_qoq_growth(spark, sf_dir):
    """TPC-DS q31 shape (quarter-over-quarter share growth per region;
    reference query31.sql): quarterly aggregate per nation, then a LAG
    window over the tiny |nation × quarter| frame for the growth ratio —
    exact cents numerator/denominator, one IEEE division."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    q = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("yr"),
            F.quarter("o_orderdate").cast("bigint").alias("qtr"),
        )
        .agg(F.sum(_cents_col()).alias("cents"))
    )
    w = Window.partitionBy("nation").orderBy("yr", "qtr")
    t = q.withColumn("lag_cents", F.lag("cents").over(w))
    return t.filter(
        F.col("lag_cents").isNotNull() & (F.col("lag_cents") > 0)
    ).select(
        "nation", "yr", "qtr",
        (F.col("cents").cast("double") / 100).alias("revenue"),
        (F.col("cents").cast("double") / F.col("lag_cents")).alias("qoq_ratio"),
    )


@query(
    "tpcds_q35_active_rollup",
    oracle=f"""
    SELECT n_name AS nation, c_mktsegment AS segment,
           CAST(GROUPING(n_name) * 2 + GROUPING(c_mktsegment) AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_cust,
           MIN(c_acctbal) AS min_bal,
           MAX(c_acctbal) AS max_bal,
           CAST(SUM(CAST(c_acctbal AS {DEC})) AS DOUBLE) AS sum_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY ROLLUP (n_name, c_mktsegment)
    """,
)
def tpcds_q35_active_rollup(spark, sf_dir):
    """TPC-DS q35 shape (active customers — EXISTS over the fact — then a
    demographic ROLLUP report with GROUPING disambiguation; reference
    query35.sql): the EXISTS is a semi-join against distinct buyer keys;
    the rollup runs over the reduced dim-sized frame."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    active = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
            "c_acctbal",
        )
    )
    return (
        active.rollup("nation", "segment")
        .agg(
            (F.grouping("nation") * 2 + F.grouping("segment"))
            .cast("bigint")
            .alias("gid"),
            F.count("*").alias("n_cust"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("sum_bal"),
        )
    )


@query(
    "tpcds_q14_cross_channel_items",
    oracle=f"""
    WITH cross_items AS (
      SELECT l_partkey FROM lineitem WHERE l_linenumber % 3 = 0
      INTERSECT
      SELECT l_partkey FROM lineitem WHERE l_linenumber % 3 = 1
      INTERSECT
      SELECT l_partkey FROM lineitem WHERE l_linenumber % 3 = 2),
    avg_sales AS (
      SELECT CAST(SUM({_CENTS}) AS DOUBLE) / COUNT(*) AS threshold
      FROM lineitem)
    SELECT p_brand AS brand,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM({_CENTS}) AS DOUBLE) / 100 AS revenue
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_partkey IN (SELECT l_partkey FROM cross_items)
      AND {_CENTS} > (SELECT threshold FROM avg_sales)
    GROUP BY 1
    """,
)
def tpcds_q14_cross_channel_items(spark, sf_dir):
    """TPC-DS q14 shape (items sold in every channel — INTERSECT chain —
    filtered by a global average-sales scalar subquery, then a brand
    report; reference query14.sql): the INTERSECT runs over distinct part
    keys, the scalar threshold broadcasts, and only qualifying fact rows
    reach the final aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    cents = _cents_col()

    def chan(c):
        return li.filter(F.col("l_linenumber") % 3 == c).select("l_partkey").distinct()

    cross_items = chan(0).intersect(chan(1)).intersect(chan(2))
    threshold = li.agg(
        (F.sum(cents).cast("double") / F.count("*")).alias("threshold")
    )
    return (
        li.withColumn("cents", cents)
        .join(cross_items, "l_partkey", "left_semi")
        .crossJoin(F.broadcast(threshold))
        .filter(F.col("cents").cast("double") > F.col("threshold"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count("*").alias("n_lines"),
            (F.sum("cents").cast("double") / 100).alias("revenue"),
        )
    )


@query(
    "tpcds_q40_pivot_around_date",
    oracle=f"""
    SELECT n_name AS nation, p_brand AS brand,
           CAST(SUM(CASE WHEN o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
                    THEN {_CENTS} ELSE 0 END) AS DOUBLE) / 100 AS rev_before,
           CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
                    THEN {_CENTS} ELSE 0 END) AS DOUBLE) / 100 AS rev_after
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN part ON l_partkey = p_partkey
    WHERE p_size > 40
    GROUP BY 1, 2
    """,
)
def tpcds_q40_pivot_around_date(spark, sf_dir):
    """TPC-DS q40 shape (before/after revenue pivot around an event date
    per warehouse × item; reference query40.sql): one fact pass with two
    conditional cents-sums — the date split never becomes a self-join —
    dims broadcast, item filter pushed."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") > 40).select(
        "p_partkey", "p_brand"
    )
    pivot = F.lit("1998-01-01").cast("timestamp_ntz")
    cents = _cents_col()
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("p_brand").alias("brand"))
        .agg(
            (F.sum(F.when(F.col("o_orderdate") < pivot, cents).otherwise(0))
             .cast("double") / 100).alias("rev_before"),
            (F.sum(F.when(F.col("o_orderdate") >= pivot, cents).otherwise(0))
             .cast("double") / 100).alias("rev_after"),
        )
    )


@query(
    "tpcds_q66_monthly_pivot",
    oracle=f"""
    SELECT n_name AS nation,
           EXTRACT(YEAR FROM o_orderdate)::BIGINT AS yr,
           {", ".join(
               f"CAST(SUM(CASE WHEN EXTRACT(MONTH FROM o_orderdate) = {m} "
               f"THEN {_CENTS} ELSE 0 END) AS DOUBLE) / 100 AS m{m:02d}"
               for m in range(1, 13)
           )}
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    GROUP BY 1, 2
    """,
)
def tpcds_q66_monthly_pivot(spark, sf_dir):
    """TPC-DS q66 shape (12 monthly revenue columns per warehouse × year
    — the widest CASE pivot in the suite; reference query66.sql): twelve
    conditional aggregates evaluate in the same single fact pass (one
    shuffle on the group key carries all 12 cells)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cents = _cents_col()
    aggs = [
        (
            F.sum(
                F.when(F.month("o_orderdate") == m, cents).otherwise(0)
            ).cast("double") / 100
        ).alias(f"m{m:02d}")
        for m in range(1, 13)
    ]
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("yr"),
        )
        .agg(*aggs)
    )


@query(
    "tpcds_q75_yoy_decline",
    oracle=f"""
    WITH cells AS (
      SELECT p_brand AS brand,
             SUM(CASE WHEN EXTRACT(YEAR FROM o_orderdate) = 1995
                      AND l_returnflag <> 'R' THEN CAST(l_quantity AS BIGINT)
                      ELSE 0 END) AS q95,
             SUM(CASE WHEN EXTRACT(YEAR FROM o_orderdate) = 1996
                      AND l_returnflag <> 'R' THEN CAST(l_quantity AS BIGINT)
                      ELSE 0 END) AS q96
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN part ON l_partkey = p_partkey
      WHERE EXTRACT(YEAR FROM o_orderdate) IN (1995, 1996)
      GROUP BY 1)
    SELECT brand,
           CAST(q95 AS BIGINT) AS prev_qty,
           CAST(q96 AS BIGINT) AS cur_qty,
           CAST(q96 - q95 AS BIGINT) AS qty_diff
    FROM cells
    WHERE q95 > 0 AND q96 < q95
    """,
)
def tpcds_q75_yoy_decline(spark, sf_dir):
    """TPC-DS q75 shape (brands whose current-year net-of-returns volume
    declined vs the prior year; reference query75.sql): both yearly
    totals come out of one conditional-aggregation fact pass (no
    aggregate self-join), returns excluded inline, exact BIGINT
    quantities so the decline comparison cannot float-flip."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate").isin(1995, 1996)
    ).select("o_orderkey", "o_orderdate")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")

    def yr_qty(y):
        cond = (
            (F.year("o_orderdate") == y) & (F.col("l_returnflag") != "R")
        )
        return F.sum(
            F.when(cond, F.col("l_quantity").cast("bigint")).otherwise(0)
        )

    cells = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(yr_qty(1995).alias("q95"), yr_qty(1996).alias("q96"))
    )
    return cells.filter(
        (F.col("q95") > 0) & (F.col("q96") < F.col("q95"))
    ).select(
        "brand",
        F.col("q95").alias("prev_qty"),
        F.col("q96").alias("cur_qty"),
        (F.col("q96") - F.col("q95")).alias("qty_diff"),
    )


@query(
    "tpcds_q70_share_rank_rollup",
    oracle=f"""
    WITH agg AS (
      SELECT n_name AS nation, c_mktsegment AS segment,
             CAST(GROUPING(n_name) * 2 + GROUPING(c_mktsegment) AS BIGINT) AS gid,
             SUM({_CENTS}) AS cents
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY ROLLUP (n_name, c_mktsegment))
    SELECT nation, segment, gid,
           CAST(cents AS DOUBLE) / 100 AS revenue,
           CAST(RANK() OVER (PARTITION BY gid, nation
                             ORDER BY cents DESC, segment) AS BIGINT) AS rank_in_nation
    FROM agg
    """,
)
def tpcds_q70_share_rank_rollup(spark, sf_dir):
    """TPC-DS q70 shape (ROLLUP report with RANK within each rollup
    level; reference query70.sql): the rank window partitions by
    (grouping id, nation) so segment rows rank inside their nation while
    subtotal rows rank trivially — the window runs over the aggregated
    frame only."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_mktsegment")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
            _cents_col().alias("cents"),
        )
    )
    agg = base.rollup("nation", "segment").agg(
        (F.grouping("nation") * 2 + F.grouping("segment"))
        .cast("bigint")
        .alias("gid"),
        F.sum("cents").alias("cents"),
    )
    w = Window.partitionBy("gid", "nation").orderBy(
        F.desc("cents"), F.col("segment")
    )
    return agg.select(
        "nation", "segment", "gid",
        (F.col("cents").cast("double") / 100).alias("revenue"),
        F.rank().over(w).cast("bigint").alias("rank_in_nation"),
    )


@query(
    "tpcds_q49_return_ratio_rank",
    oracle=f"""
    WITH per AS (
      SELECT l_linenumber % 2 = 0 AS is_web, l_partkey AS partkey,
             SUM(CASE WHEN l_returnflag = 'R'
                      THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS ret_qty,
             SUM(CAST(l_quantity AS BIGINT)) AS tot_qty
      FROM lineitem GROUP BY 1, 2),
    ranked AS (
      SELECT CASE WHEN is_web THEN 'web' ELSE 'store' END AS channel,
             partkey,
             CAST(ret_qty AS DOUBLE) / tot_qty AS return_ratio,
             CAST(RANK() OVER (PARTITION BY is_web
                  ORDER BY CAST(ret_qty AS DOUBLE) / tot_qty DESC, partkey)
                  AS BIGINT) AS rnk
      FROM per WHERE tot_qty > 0)
    SELECT channel, partkey, return_ratio, rnk
    FROM ranked WHERE rnk <= 10
    """,
)
def tpcds_q49_return_ratio_rank(spark, sf_dir):
    """TPC-DS q49 shape (worst return ratios ranked per channel, results
    unioned across channels; reference query49.sql): per-channel ratios
    from one conditional aggregation, rank windows over the aggregated
    frame with a deterministic key tiebreak, top-10 filter."""
    li = load_table(spark, sf_dir, "lineitem")
    per = (
        li.groupBy(
            (F.col("l_linenumber") % 2 == 0).alias("is_web"),
            F.col("l_partkey").alias("partkey"),
        )
        .agg(
            F.sum(
                F.when(
                    F.col("l_returnflag") == "R",
                    F.col("l_quantity").cast("bigint"),
                ).otherwise(0)
            ).alias("ret_qty"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("tot_qty"),
        )
        .filter(F.col("tot_qty") > 0)
    )
    ratio = F.col("ret_qty").cast("double") / F.col("tot_qty")
    w = Window.partitionBy("is_web").orderBy(ratio.desc(), F.col("partkey"))
    return (
        per.select(
            F.when(F.col("is_web"), "web").otherwise("store").alias("channel"),
            "partkey",
            ratio.alias("return_ratio"),
            F.rank().over(w).cast("bigint").alias("rnk"),
        )
        .filter(F.col("rnk") <= 10)
    )


@query(
    "tpcds_q16_semi_anti_report",
    oracle=f"""
    SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS {DEC})) AS DOUBLE) AS total_price
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l JOIN supplier s
                  ON l.l_suppkey = s.s_suppkey
                  JOIN nation n ON s.s_nationkey = n.n_nationkey
                  WHERE l.l_orderkey = o.o_orderkey AND n.n_name = 'NATION_3')
      AND NOT EXISTS (SELECT 1 FROM lineitem lr
                      WHERE lr.l_orderkey = o.o_orderkey
                        AND lr.l_returnflag = 'R')
    """,
)
def tpcds_q16_semi_anti_report(spark, sf_dir):
    """TPC-DS q16 shape (orders filtered by EXISTS on one dimension path
    and NOT EXISTS on an exclusion set, then a distinct-count report;
    reference query16.sql): the EXISTS becomes a semi-join against
    nation-filtered supplier lineitems, the NOT EXISTS an anti-join
    against returned order keys — both sides key-reduced before joining."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_3"
    ).select("n_nationkey")
    from_nation = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("l_orderkey")
    )
    returned = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    keep = o.join(
        from_nation, o.o_orderkey == from_nation.l_orderkey, "left_semi"
    ).join(returned, o.o_orderkey == returned.l_orderkey, "left_anti")
    return keep.agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
        dsum("o_totalprice", "total_price"),
    )


# ---------------------------------------------------------------------------
# Inventory two-fact family (q21/q72/q22): the testdata has no inventory
# table, so one is *synthesized deterministically* as an item x week grid —
# Spark's native datagen (spark.range) on the query side, range() in the
# DuckDB oracle, identical integer/timestamp arithmetic in both — giving a
# genuinely independent second fact (104k rows: 2000 items x 52 weeks of
# 1995) keyed to part (inv_item = p_partkey) and supplier-as-warehouse
# (inv_warehouse = s_suppkey). Closes the one TPC-DS plan family VERDICT r2
# flagged as missing (reference query21.sql / query72.sql / query22.sql).

_INV_ITEMS, _INV_WEEKS = 2000, 52

_INV_SQL = f"""
    WITH inv AS (
      SELECT i // {_INV_WEEKS} AS inv_item,
             TIMESTAMP '1995-01-02' + (i % {_INV_WEEKS}) * 7 * INTERVAL 1 DAY
               AS inv_date,
             ((i // {_INV_WEEKS}) * 7 + (i % {_INV_WEEKS}) * 13) % 100
               AS inv_qty,
             ((i // {_INV_WEEKS}) * 53 + (i % {_INV_WEEKS}) * 17) % 100
               AS inv_warehouse
      FROM range({_INV_ITEMS * _INV_WEEKS}) t(i))
"""


def _inventory(spark):
    """The synthesized inventory fact; partition count scales with the
    grid so a bigger grid parallelizes instead of hot-spotting one task."""
    return spark.range(_INV_ITEMS * _INV_WEEKS).selectExpr(
        f"id DIV {_INV_WEEKS} AS inv_item",
        f"CAST(TIMESTAMP_NTZ '1995-01-02' + INTERVAL '7' DAY * "
        f"(id % {_INV_WEEKS}) AS TIMESTAMP_NTZ) AS inv_date",
        f"((id DIV {_INV_WEEKS}) * 7 + (id % {_INV_WEEKS}) * 13) % 100 "
        "AS inv_qty",
        f"((id DIV {_INV_WEEKS}) * 53 + (id % {_INV_WEEKS}) * 17) % 100 "
        "AS inv_warehouse",
    )


@query(
    "tpcds_q21_inventory_ratio",
    oracle=_INV_SQL + """
    SELECT w_name, i_name, inv_before, inv_after FROM (
      SELECT s.s_name AS w_name, p.p_name AS i_name,
             CAST(SUM(CASE WHEN inv_date < TIMESTAMP '1995-06-01'
                           THEN inv_qty ELSE 0 END) AS BIGINT) AS inv_before,
             CAST(SUM(CASE WHEN inv_date >= TIMESTAMP '1995-06-01'
                           THEN inv_qty ELSE 0 END) AS BIGINT) AS inv_after
      FROM inv
      JOIN supplier s ON inv_warehouse = s.s_suppkey
      JOIN part p ON inv_item = p.p_partkey
      WHERE inv_date BETWEEN TIMESTAMP '1995-04-01'
                         AND TIMESTAMP '1995-08-01'
        AND p.p_size > 40
      GROUP BY s.s_name, p.p_name) x
    WHERE inv_before > 0 AND inv_after > 0
      AND inv_before * 2 <= inv_after * 3 AND inv_after * 2 <= inv_before * 3
    """,
)
def tpcds_q21_inventory_ratio(spark, sf_dir):
    """TPC-DS q21 shape (per-warehouse/item inventory before vs after an
    event date, kept when the ratio stays within [2/3, 3/2]; reference
    query21.sql): the inventory fact aggregates once by (warehouse, item)
    with both sums in one conditional-agg pass; part and supplier are
    broadcast dims; the ratio band is integer arithmetic on the aggregated
    rows (|groups|, not fact rows)."""
    inv = _inventory(spark).filter(
        F.col("inv_date").between(
            F.lit("1995-04-01").cast("timestamp_ntz"),
            F.lit("1995-08-01").cast("timestamp_ntz"),
        )
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") > 40).select(
        "p_partkey", "p_name"
    )
    split = F.lit("1995-06-01").cast("timestamp_ntz")
    agg = (
        inv.join(F.broadcast(s), inv.inv_warehouse == s.s_suppkey)
        .join(F.broadcast(p), inv.inv_item == p.p_partkey)
        .groupBy(F.col("s_name").alias("w_name"), F.col("p_name").alias("i_name"))
        .agg(
            F.sum(F.when(F.col("inv_date") < split, F.col("inv_qty"))
                  .otherwise(F.lit(0))).alias("inv_before"),
            F.sum(F.when(F.col("inv_date") >= split, F.col("inv_qty"))
                  .otherwise(F.lit(0))).alias("inv_after"),
        )
    )
    return agg.filter(
        (F.col("inv_before") > 0) & (F.col("inv_after") > 0)
        & (F.col("inv_before") * 2 <= F.col("inv_after") * 3)
        & (F.col("inv_after") * 2 <= F.col("inv_before") * 3)
    )


@query(
    "tpcds_q72_two_fact_correlation",
    oracle=_INV_SQL + """
    SELECT p.p_brand AS i_brand,
           CAST(COUNT(*) AS BIGINT) AS n_shortage,
           CAST(COUNT(DISTINCT l.l_partkey) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN inv ON l.l_partkey = inv.inv_item
            AND l.l_shipdate >= inv.inv_date
            AND l.l_shipdate < inv.inv_date + 7 * INTERVAL 1 DAY
            AND inv.inv_qty < l.l_quantity
    JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
)
def tpcds_q72_two_fact_correlation(spark, sf_dir):
    """TPC-DS q72 shape (the two-fact sales x inventory correlation:
    demand exceeding quantity-on-hand in the stocking week; reference
    query72.sql): BOTH large relations shuffle on the shared item key
    exactly once — the hash join's equi leg — with the week-band and
    qty-shortage predicates applied as join residuals, never as a
    post-join cross product; part is a broadcast dim on top."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_quantity"
    )
    inv = _inventory(spark)
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    pairs = li.join(
        inv,
        (li.l_partkey == inv.inv_item)
        & (li.l_shipdate >= inv.inv_date)
        & (li.l_shipdate < inv.inv_date + F.expr("INTERVAL '7' DAY"))
        & (inv.inv_qty < li.l_quantity),
    )
    return (
        pairs.join(F.broadcast(p), pairs.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("i_brand"))
        .agg(
            F.count("*").alias("n_shortage"),
            F.countDistinct("l_partkey").alias("n_items"),
        )
    )


@query(
    "tpcds_q22_inventory_rollup",
    oracle=_INV_SQL + """
    SELECT p.p_brand, p.p_type,
           CAST(AVG(inv_qty) AS DOUBLE) AS qoh,
           CAST(GROUPING(p.p_brand) + GROUPING(p.p_type) AS BIGINT) AS lvl
    FROM inv JOIN part p ON inv_item = p.p_partkey
    GROUP BY ROLLUP(p.p_brand, p.p_type)
    """,
)
def tpcds_q22_inventory_rollup(spark, sf_dir):
    """TPC-DS q22 shape (average quantity-on-hand over the item hierarchy
    ROLLUP; reference query22.sql): one pass over the inventory fact with
    part broadcast; the rollup's partial aggregation is map-side so the
    single shuffle carries |groups| rows per level."""
    inv = _inventory(spark)
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_type")
    return (
        inv.join(F.broadcast(p), inv.inv_item == p.p_partkey)
        .rollup("p_brand", "p_type")
        .agg(
            F.avg("inv_qty").alias("qoh"),
            (F.grouping("p_brand") + F.grouping("p_type"))
            .cast("long").alias("lvl"),
        )
        .select("p_brand", "p_type", "qoh", "lvl")
    )


_DISC_CENTS = "CAST(floor(l_extendedprice * l_discount * 100 + 0.5) AS BIGINT)"


@query(
    "tpcds_q37_inventory_instock",
    oracle=_INV_SQL + """
    SELECT p.p_partkey AS i_item, p.p_name AS i_name,
           CAST(p.p_retailprice AS DOUBLE) AS i_price
    FROM part p
    JOIN inv ON inv.inv_item = p.p_partkey
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_retailprice BETWEEN 940 AND 960
      AND inv.inv_date BETWEEN TIMESTAMP '1995-03-01'
                           AND TIMESTAMP '1995-04-30'
      AND inv.inv_qty BETWEEN 40 AND 80
    GROUP BY 1, 2, 3
    ORDER BY i_item
    LIMIT 100
    """,
)
def tpcds_q37_inventory_instock(spark, sf_dir):
    """TPC-DS q37 shape (items in a price band, in stock during a 60-day
    inventory window, that actually sell; reference query37.sql): the
    literal SQL joins+GROUP BY dedups — the Spark plan uses LEFT SEMI
    probes instead, so the part dim is reduced by both the inventory
    window and the sales fact without ever materializing the duplicate
    rows the GROUP BY would collapse."""
    inv = _inventory(spark).filter(
        F.col("inv_date").between(
            F.lit("1995-03-01").cast("timestamp_ntz"),
            F.lit("1995-04-30").cast("timestamp_ntz"),
        )
        & F.col("inv_qty").between(40, 80)
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_retailprice").between(940, 960)
    )
    return (
        p.join(inv, p.p_partkey == inv.inv_item, "left_semi")
        .join(li, p.p_partkey == li.l_partkey, "left_semi")
        .select(
            F.col("p_partkey").alias("i_item"),
            F.col("p_name").alias("i_name"),
            F.col("p_retailprice").cast("double").alias("i_price"),
        )
        .orderBy("i_item")
        .limit(100)
    )


@query(
    "tpcds_q92_excess_discount",
    oracle=f"""
    WITH d AS (
      SELECT l_partkey, {_DISC_CENTS} AS amt
      FROM lineitem
      WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01'
                           AND TIMESTAMP '1995-03-31'),
    th AS (SELECT l_partkey, SUM(amt) AS s, COUNT(*) AS c
           FROM d GROUP BY l_partkey)
    SELECT CAST(SUM(d.amt) AS DOUBLE) / 100 AS excess_discount
    FROM d
    JOIN th USING (l_partkey)
    JOIN part p ON p.p_partkey = d.l_partkey
    WHERE p.p_size > 45
      AND 10 * d.amt * th.c > 13 * th.s
    """,
)
def tpcds_q92_excess_discount(spark, sf_dir):
    """TPC-DS q92 shape (sum of discount amounts exceeding 1.3× the
    item's own average in the window; reference query92.sql): the
    correlated scalar subquery decorrelates into one per-item aggregate
    joined back on the item key, and the 1.3× threshold is exact integer
    cross-multiplication on cents (10·amt·n > 13·Σamt ⟺ amt > 1.3·avg) —
    no float averages anywhere."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1995-01-01").cast("timestamp_ntz"),
            F.lit("1995-03-31").cast("timestamp_ntz"),
        )
    ).select(
        "l_partkey",
        F.floor(
            F.col("l_extendedprice") * F.col("l_discount") * 100 + 0.5
        ).cast("bigint").alias("amt"),
    )
    th = li.groupBy("l_partkey").agg(
        F.sum("amt").alias("s"), F.count("*").alias("c")
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") > 45).select(
        "p_partkey"
    )
    return (
        li.join(th, "l_partkey")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(10 * F.col("amt") * F.col("c") > 13 * F.col("s"))
        .agg((F.sum("amt").cast("double") / 100).alias("excess_discount"))
    )


@query(
    "tpcds_q53_quarterly_class_deviation",
    oracle=f"""
    WITH q AS (
      SELECT p.p_type AS class, EXTRACT(QUARTER FROM l.l_shipdate)::BIGINT AS qtr,
             SUM({_CENTS}) AS cents
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE l.l_shipdate >= TIMESTAMP '1995-01-01'
        AND l.l_shipdate < TIMESTAMP '1996-01-01'
      GROUP BY 1, 2),
    w AS (SELECT *, SUM(cents) OVER (PARTITION BY class) AS yr_cents,
                   COUNT(*) OVER (PARTITION BY class) AS n_qtr
          FROM q)
    SELECT class, qtr, CAST(cents AS DOUBLE) / 100 AS revenue,
           CAST(yr_cents AS DOUBLE) / (100 * n_qtr) AS qtr_avg
    FROM w
    WHERE cents * n_qtr > 11 * yr_cents / 10
    ORDER BY class, qtr
    """,
)
def tpcds_q53_quarterly_class_deviation(spark, sf_dir):
    """TPC-DS q53/q63 shape (quarterly sales per item class vs the
    class's yearly average, reporting above-average quarters; reference
    query53.sql): one fact pass groups to (class, quarter) cents; the
    deviation window runs over |classes|·4 aggregated rows; the 1.1×
    band is integer cents arithmetic (same discipline as q47)."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    q = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_type").alias("class"),
            F.quarter("l_shipdate").cast("long").alias("qtr"),
        )
        .agg(F.sum(_cents_col()).alias("cents"))
    )
    w = Window.partitionBy("class")
    out = (
        q.withColumn("yr_cents", F.sum("cents").over(w))
        .withColumn("n_qtr", F.count("*").over(w))
        .filter(F.col("cents") * F.col("n_qtr") > 11 * F.col("yr_cents") / 10)
    )
    return out.select(
        "class", "qtr",
        (F.col("cents").cast("double") / 100).alias("revenue"),
        (F.col("yr_cents").cast("double") / (100 * F.col("n_qtr")))
        .alias("qtr_avg"),
    ).orderBy("class", "qtr")


@query(
    "tpcds_q59_week_over_week",
    oracle=f"""
    WITH wk AS (
      SELECT n.n_name AS store, isoyear(l.l_shipdate) AS yr,
             weekofyear(l.l_shipdate) AS wk,
             {sql_dsum("CASE WHEN isodow(l.l_shipdate) <= 3 "
                       "THEN l.l_extendedprice ELSE 0 END", "early_rev")},
             {sql_dsum("CASE WHEN isodow(l.l_shipdate) > 3 "
                       "THEN l.l_extendedprice ELSE 0 END", "late_rev")}
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate < TIMESTAMP '1997-12-29'
      GROUP BY 1, 2, 3)
    SELECT y1.store, CAST(y1.wk AS BIGINT) AS wk,
           y1.early_rev AS early_rev_y1, y2.early_rev AS early_rev_y2,
           ROUND(y1.late_rev / y2.late_rev, 9) AS late_ratio
    FROM wk y1 JOIN wk y2 ON y1.store = y2.store AND y1.wk = y2.wk
    WHERE y1.yr = 1996 AND y2.yr = 1997 AND y2.late_rev > 0
    """,
)
def tpcds_q59_week_over_week(spark, sf_dir):
    """TPC-DS q59 shape (reference tpcds-tool/query/query59.sql): weekly
    sales pivoted by day-of-week band per store, then the SAME CTE
    self-joined year vs year+1 on (store, week-number) to emit
    week-over-week ratios. ISO week/year/dow on both engines (verified
    identical); the self-join runs over |stores × weeks| aggregated rows,
    never fact rows."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-12-29")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    isodow = (F.dayofweek("l_shipdate") + 5) % 7 + 1
    wk = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("store"),
            F.expr("extract(YEAROFWEEK FROM l_shipdate)").alias("yr"),
            F.weekofyear("l_shipdate").alias("wk"),
        )
        .agg(
            dsum(F.when(isodow <= 3, F.col("l_extendedprice")).otherwise(0.0),
                 "early_rev"),
            dsum(F.when(isodow > 3, F.col("l_extendedprice")).otherwise(0.0),
                 "late_rev"),
        )
    )
    y1 = wk.filter(F.col("yr") == 1996).alias("y1")
    y2 = wk.filter(F.col("yr") == 1997).alias("y2")
    return (
        y1.join(y2, (F.col("y1.store") == F.col("y2.store"))
                & (F.col("y1.wk") == F.col("y2.wk")))
        .filter(F.col("y2.late_rev") > 0)
        .select(
            F.col("y1.store").alias("store"),
            F.col("y1.wk").cast("long").alias("wk"),
            F.col("y1.early_rev").alias("early_rev_y1"),
            F.col("y2.early_rev").alias("early_rev_y2"),
            F.round(F.col("y1.late_rev") / F.col("y2.late_rev"), 9)
            .alias("late_ratio"),
        )
    )


@query(
    "tpcds_q39_inventory_covariance",
    oracle=_INV_SQL + """
    , stats AS (
      SELECT inv_item, EXTRACT(MONTH FROM inv_date) AS mo,
             COUNT(*) AS n, SUM(inv_qty) AS sx,
             SUM(inv_qty * inv_qty) AS sx2
      FROM inv
      WHERE EXTRACT(MONTH FROM inv_date) IN (3, 4)
      GROUP BY 1, 2),
    flagged AS (
      SELECT *
      FROM stats
      WHERE n > 1 AND sx > 0
        AND 4 * n * (n * sx2 - sx * sx) >= sx * sx * (n - 1))
    SELECT m1.inv_item AS item,
           ROUND(m1.sx / m1.n, 9) AS mean_m3,
           ROUND(m2.sx / m2.n, 9) AS mean_m4
    FROM flagged m1 JOIN flagged m2 ON m1.inv_item = m2.inv_item
    WHERE m1.mo = 3 AND m2.mo = 4
    """,
)
def tpcds_q39_inventory_covariance(spark, sf_dir):
    """TPC-DS q39 shape (reference tpcds-tool/query/query39.sql): per
    (item, month) inventory mean/stdev, keep cells whose
    coefficient of variation ≥ 0.5, and self-join consecutive months so
    only items erratic in BOTH months survive. The cov threshold is
    evaluated in EXACT integer arithmetic (4n(n·Σx²−(Σx)²) ≥ (Σx)²(n−1)
    ⟺ std/mean ≥ 0.5) — no cross-engine float boundary flips."""
    inv = _inventory(spark).filter(F.month("inv_date").isin(3, 4))
    stats = (
        inv.groupBy("inv_item", F.month("inv_date").alias("mo"))
        .agg(
            F.count("*").alias("n"),
            F.sum("inv_qty").alias("sx"),
            F.sum(F.col("inv_qty") * F.col("inv_qty")).alias("sx2"),
        )
        .filter(
            (F.col("n") > 1) & (F.col("sx") > 0)
            & (4 * F.col("n") * (F.col("n") * F.col("sx2")
                                 - F.col("sx") * F.col("sx"))
               >= F.col("sx") * F.col("sx") * (F.col("n") - 1))
        )
    )
    m1 = stats.filter(F.col("mo") == 3).alias("m1")
    m2 = stats.filter(F.col("mo") == 4).alias("m2")
    return (
        m1.join(m2, F.col("m1.inv_item") == F.col("m2.inv_item"))
        .select(
            F.col("m1.inv_item").alias("item"),
            F.round(F.col("m1.sx") / F.col("m1.n"), 9).alias("mean_m3"),
            F.round(F.col("m2.sx") / F.col("m2.n"), 9).alias("mean_m4"),
        )
    )


@query(
    "tpcds_q64_snowflake_two_year",
    oracle=f"""
    WITH rev AS (
      SELECT p.p_brand AS brand, r.r_name AS region,
             EXTRACT(YEAR FROM o.o_orderdate) AS yr,
             {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", "rev")}
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
      JOIN part p     ON l.l_partkey = p.p_partkey
      WHERE p.p_size <= 10
        AND EXTRACT(YEAR FROM o.o_orderdate) IN (1996, 1997)
      GROUP BY 1, 2, 3)
    SELECT y1.brand, y1.region, y1.rev AS rev_y1, y2.rev AS rev_y2
    FROM rev y1 JOIN rev y2
      ON y1.brand = y2.brand AND y1.region = y2.region
    WHERE y1.yr = 1996 AND y2.yr = 1997 AND y2.rev > y1.rev
    """,
)
def tpcds_q64_snowflake_two_year(spark, sf_dir):
    """TPC-DS q64 shape (reference tpcds-tool/query/query64.sql): a wide
    snowflake join chain (fact → date → customer → nation → region, plus
    item) aggregated per (brand, region, year), then SELF-JOINED across
    consecutive years keeping pairs that grew. All five dims broadcast;
    the chain shuffles the fact once on its join key; the cross-year
    comparison runs over aggregated rows only."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate").isin(1996, 1997)
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_size") <= 10
    ).select("p_partkey", "p_brand")
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("r_name").alias("region"),
            F.year("o_orderdate").alias("yr"),
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "rev"))
    )
    y1 = rev.filter(F.col("yr") == 1996).alias("y1")
    y2 = rev.filter(F.col("yr") == 1997).alias("y2")
    return (
        y1.join(y2, (F.col("y1.brand") == F.col("y2.brand"))
                & (F.col("y1.region") == F.col("y2.region")))
        .filter(F.col("y2.rev") > F.col("y1.rev"))
        .select(
            F.col("y1.brand").alias("brand"),
            F.col("y1.region").alias("region"),
            F.col("y1.rev").alias("rev_y1"),
            F.col("y2.rev").alias("rev_y2"),
        )
    )


@query(
    "tpcds_q1_return_threshold",
    oracle=f"""
    WITH ctr AS (
      SELECT o.o_custkey AS cust, c.c_nationkey AS nat,
             {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", "ret_total")}
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE l.l_returnflag = 'R'
      GROUP BY 1, 2),
    nat_avg AS (
      SELECT nat,
             CAST(SUM(CAST(ret_total AS DECIMAL(30,6))) AS DOUBLE)
               / COUNT(*) AS avg_ret
      FROM ctr GROUP BY nat)
    SELECT ctr.cust, ctr.nat, ctr.ret_total
    FROM ctr JOIN nat_avg USING (nat)
    WHERE ctr.ret_total > 1.2 * nat_avg.avg_ret
    """,
)
def tpcds_q1_return_threshold(spark, sf_dir):
    """TPC-DS q1 shape (reference query1.sql customer_total_return):
    a returns CTE aggregated per (customer, group), re-aggregated per
    group for the average, and the CTE joined back against 1.2× its own
    group average — the classic correlated-threshold decorrelation. The
    average is exact-decimal-sum / count (one IEEE division), so the
    1.2× boundary is bit-identical across engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    ctr = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("o_custkey").alias("cust"),
            F.col("c_nationkey").alias("nat"),
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                  "ret_total"))
    )
    nat_avg = ctr.groupBy("nat").agg(
        (F.sum(F.col("ret_total").cast(DEC)).cast("double") / F.count("*"))
        .alias("avg_ret")
    )
    return (
        ctr.join(F.broadcast(nat_avg), "nat")
        .filter(F.col("ret_total") > 1.2 * F.col("avg_ret"))
        .select("cust", "nat", "ret_total")
    )


@query(
    "tpcds_q25_buy_return_rebuy",
    oracle=f"""
    WITH cl AS (
      SELECT o.o_custkey AS cust, p.p_brand AS brand, l.l_shipdate AS d,
             l.l_returnflag AS rf,
             CAST(l.l_extendedprice * (1 - l.l_discount)
                  AS {DEC}) AS amt
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN part p ON l.l_partkey = p.p_partkey)
    SELECT s.cust, s.brand,
           CAST(SUM(s.amt) AS DOUBLE) AS sale_amt,
           CAST(SUM(r.amt) AS DOUBLE) AS ret_amt,
           CAST(SUM(b.amt) AS DOUBLE) AS rebuy_amt,
           CAST(COUNT(*) AS BIGINT) AS n_triples
    FROM cl s
    JOIN cl r ON s.cust = r.cust AND s.brand = r.brand
    JOIN cl b ON r.cust = b.cust AND r.brand = b.brand
             AND s.cust = b.cust AND s.brand = b.brand
    WHERE s.rf <> 'R' AND r.rf = 'R' AND b.rf <> 'R'
      AND s.d <= r.d AND r.d <= b.d
    GROUP BY s.cust, s.brand
    """,
)
def tpcds_q25_buy_return_rebuy(spark, sf_dir):
    """TPC-DS q25 shape (reference query25.sql: store_sales ⋈
    store_returns ⋈ catalog_sales chained on (customer, brand) with month
    ordering — the buy → return → buy-again funnel, on-or-after
    granularity like the reference's month windows): three passes over
    the sales fact joined on the shared (customer, part) key with
    event-order residuals as JOIN conditions, aggregated per pair. One
    key shuffle feeds all three sides (same-key co-location); the date
    residuals never become post-join filters on a cross product."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    cl = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(
            F.col("o_custkey").alias("cust"),
            F.col("p_brand").alias("brand"),
            F.col("l_shipdate").alias("d"),
            F.col("l_returnflag").alias("rf"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast(DEC).alias("amt"),
        )
    )
    s = cl.filter(F.col("rf") != "R").alias("s")
    r = cl.filter(F.col("rf") == "R").alias("r")
    b = cl.filter(F.col("rf") != "R").alias("b")
    return (
        s.join(r, (F.col("s.cust") == F.col("r.cust"))
               & (F.col("s.brand") == F.col("r.brand"))
               & (F.col("s.d") <= F.col("r.d")))
        .join(b, (F.col("s.cust") == F.col("b.cust"))
              & (F.col("s.brand") == F.col("b.brand"))
              & (F.col("r.d") <= F.col("b.d")))
        .groupBy(F.col("s.cust").alias("cust"),
                 F.col("s.brand").alias("brand"))
        .agg(
            F.sum(F.col("s.amt")).cast("double").alias("sale_amt"),
            F.sum(F.col("r.amt")).cast("double").alias("ret_amt"),
            F.sum(F.col("b.amt")).cast("double").alias("rebuy_amt"),
            F.count("*").alias("n_triples"),
        )
    )


@query(
    "tpcds_q17_quantity_deviation",
    oracle="""
    WITH st AS (
      SELECT l_partkey AS part, COUNT(*) AS n,
             SUM(CAST(l_quantity AS BIGINT)) AS sx,
             SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
               AS sx2
      FROM lineitem WHERE l_linestatus = 'F'
      GROUP BY l_partkey)
    SELECT part, CAST(n AS BIGINT) AS n,
           ROUND(sx / n, 9) AS qty_mean
    FROM st
    WHERE n > 3 AND sx > 0
      AND n * (n * sx2 - sx * sx) <= sx * sx * (n - 1)
    """,
)
def tpcds_q17_quantity_deviation(spark, sf_dir):
    """TPC-DS q17 shape (reference query17.sql: per-item quantity
    mean/stdev across channels, keeping items whose coefficient of
    variation stays BELOW a stability threshold): the same exact-integer
    threshold algebra as q39 but inverted (cov ≤ 1 ⟺
    n(n·Σx²−(Σx)²) ≤ (Σx)²(n−1)) — steady sellers, not erratic ones."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_linestatus") == "F"
    )
    q = F.col("l_quantity").cast("bigint")
    st = li.groupBy(F.col("l_partkey").alias("part")).agg(
        F.count("*").alias("n"),
        F.sum(q).alias("sx"),
        F.sum(q * q).alias("sx2"),
    )
    return (
        st.filter(
            (F.col("n") > 3) & (F.col("sx") > 0)
            & (F.col("n") * (F.col("n") * F.col("sx2")
                             - F.col("sx") * F.col("sx"))
               <= F.col("sx") * F.col("sx") * (F.col("n") - 1))
        )
        .select(
            "part",
            F.col("n").cast("long").alias("n"),
            F.round(F.col("sx") / F.col("n"), 9).alias("qty_mean"),
        )
    )


@query(
    "tpcds_q90_am_pm_ratio",
    oracle="""
    WITH h AS (
      SELECT CAST(SUM(CASE WHEN EXTRACT(HOUR FROM ts) < 12
                           THEN 1 ELSE 0 END) AS BIGINT) AS am_cnt,
             CAST(SUM(CASE WHEN EXTRACT(HOUR FROM ts) >= 12
                           THEN 1 ELSE 0 END) AS BIGINT) AS pm_cnt
      FROM events WHERE user_id <= 400)
    SELECT am_cnt, pm_cnt, ROUND(CAST(am_cnt AS DOUBLE) / pm_cnt, 9)
             AS am_pm_ratio
    FROM h WHERE pm_cnt > 0
    """,
)
def tpcds_q90_am_pm_ratio(spark, sf_dir):
    """TPC-DS q90 shape (reference query90.sql: morning/evening web-sales
    count ratio via two scalar time-band subqueries): both bands fold
    into ONE aggregation pass (conditional sums), the ratio is a single
    IEEE division of exact integers — never two scans."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 400)
    am = F.sum((F.hour("ts") < 12).cast("bigint")).alias("am_cnt")
    pm = F.sum((F.hour("ts") >= 12).cast("bigint")).alias("pm_cnt")
    return (
        ev.agg(am, pm)
        .filter(F.col("pm_cnt") > 0)
        .select(
            "am_cnt", "pm_cnt",
            F.round(F.col("am_cnt").cast("double") / F.col("pm_cnt"), 9)
            .alias("am_pm_ratio"),
        )
    )


@query(
    "tpcds_q9_bucket_stats",
    oracle=f"""
    SELECT COUNT(*) FILTER (l_quantity BETWEEN 1 AND 10) AS b1_cnt,
           CAST(SUM(CAST(l_extendedprice AS {DEC}))
                  FILTER (l_quantity BETWEEN 1 AND 10) AS DOUBLE) AS b1_sum,
           COUNT(*) FILTER (l_quantity BETWEEN 11 AND 20) AS b2_cnt,
           CAST(SUM(CAST(l_extendedprice AS {DEC}))
                  FILTER (l_quantity BETWEEN 11 AND 20) AS DOUBLE) AS b2_sum,
           COUNT(*) FILTER (l_quantity BETWEEN 21 AND 30) AS b3_cnt,
           CAST(SUM(CAST(l_extendedprice AS {DEC}))
                  FILTER (l_quantity BETWEEN 21 AND 30) AS DOUBLE) AS b3_sum,
           COUNT(*) FILTER (l_quantity BETWEEN 31 AND 40) AS b4_cnt,
           CAST(SUM(CAST(l_extendedprice AS {DEC}))
                  FILTER (l_quantity BETWEEN 31 AND 40) AS DOUBLE) AS b4_sum,
           COUNT(*) FILTER (l_quantity > 40) AS b5_cnt,
           CAST(SUM(CAST(l_extendedprice AS {DEC}))
                  FILTER (l_quantity > 40) AS DOUBLE) AS b5_sum
    FROM lineitem
    """,
)
def tpcds_q9_bucket_stats(spark, sf_dir):
    """TPC-DS q9 shape (reference query9.sql: 15 scalar CASE-bucket
    subqueries over store_sales quantity bands): every band folds into
    ONE scan with conditional aggregates — the reference's 15 subqueries
    would be 15 scans; at 100 TB this is the difference between one pass
    and fifteen."""
    li = load_table(spark, sf_dir, "lineitem")

    def band(lo, hi, tag):
        cond = (
            F.col("l_quantity").between(lo, hi) if hi is not None
            else (F.col("l_quantity") > lo)
        )
        return [
            F.sum(cond.cast("bigint")).alias(f"{tag}_cnt"),
            F.sum(F.when(cond, F.col("l_extendedprice")).cast(DEC))
            .cast("double").alias(f"{tag}_sum"),
        ]

    aggs = (band(1, 10, "b1") + band(11, 20, "b2") + band(21, 30, "b3")
            + band(31, 40, "b4") + band(40, None, "b5"))
    return li.agg(*aggs)


@query(
    "tpcds_q44_best_worst_rank",
    oracle=f"""
    WITH perf AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {DEC}))
                  AS DOUBLE) AS net
      FROM lineitem GROUP BY l_partkey),
    ranked AS (
      SELECT l_partkey, net,
             ROW_NUMBER() OVER (ORDER BY net ASC, l_partkey) AS rnk_worst,
             ROW_NUMBER() OVER (ORDER BY net DESC, l_partkey) AS rnk_best
      FROM perf)
    SELECT b.rnk_best AS rnk, pb.p_name AS best_performing,
           pw.p_name AS worst_performing
    FROM ranked b
    JOIN ranked w ON b.rnk_best = w.rnk_worst
    JOIN part pb ON pb.p_partkey = b.l_partkey
    JOIN part pw ON pw.p_partkey = w.l_partkey
    WHERE b.rnk_best <= 10
    """,
)
def tpcds_q44_best_worst_rank(spark, sf_dir):
    """TPC-DS q44 shape (reference query44.sql: best/worst performing
    items side-by-side via ascending + descending rank over item net
    profit, joined on rank position). One aggregation, two window ranks
    over the SAME partial, rank-equality join, then two broadcast dim
    lookups for the names."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    perf = li.groupBy("l_partkey").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "net")
    )
    ranked = perf.select(
        "l_partkey", "net",
        F.row_number().over(
            Window.orderBy(F.asc("net"), F.asc("l_partkey"))
        ).alias("rnk_worst"),
        F.row_number().over(
            Window.orderBy(F.desc("net"), F.asc("l_partkey"))
        ).alias("rnk_best"),
    )
    b = ranked.filter(F.col("rnk_best") <= 10).alias("b")
    w = ranked.alias("w")
    return (
        b.join(w, F.col("b.rnk_best") == F.col("w.rnk_worst"))
        .join(
            F.broadcast(part.alias("pb")),
            F.col("pb.p_partkey") == F.col("b.l_partkey"),
        )
        .join(
            F.broadcast(part.alias("pw")),
            F.col("pw.p_partkey") == F.col("w.l_partkey"),
        )
        .select(
            F.col("b.rnk_best").alias("rnk"),
            F.col("pb.p_name").alias("best_performing"),
            F.col("pw.p_name").alias("worst_performing"),
        )
    )


@query(
    "tpcds_q62_latency_bands",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (lag_days <= 30) AS d30,
           COUNT(*) FILTER (lag_days > 30 AND lag_days <= 60) AS d60,
           COUNT(*) FILTER (lag_days > 60 AND lag_days <= 90) AS d90,
           COUNT(*) FILTER (lag_days > 90 AND lag_days <= 120) AS d120,
           COUNT(*) FILTER (lag_days > 120) AS dmore
    FROM (SELECT o_orderpriority,
                 date_diff('day', o_orderdate, l_shipdate) AS lag_days
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey) t
    GROUP BY o_orderpriority
    """,
)
def tpcds_q62_latency_bands(spark, sf_dir):
    """TPC-DS q62/q99 shape (reference query62.sql: order-to-ship latency
    banded into 30-day buckets, pivoted per ship mode/warehouse): one
    fact-fact join keyed on orderkey, then conditional counts — the CASE
    pivot never re-scans, and the join key is the natural co-partition
    key at scale."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    t = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "o_orderpriority",
        F.datediff("l_shipdate", "o_orderdate").alias("lag_days"),
    )
    d = F.col("lag_days")
    return t.groupBy("o_orderpriority").agg(
        F.sum((d <= 30).cast("bigint")).alias("d30"),
        F.sum(((d > 30) & (d <= 60)).cast("bigint")).alias("d60"),
        F.sum(((d > 60) & (d <= 90)).cast("bigint")).alias("d90"),
        F.sum(((d > 90) & (d <= 120)).cast("bigint")).alias("d120"),
        F.sum((d > 120).cast("bigint")).alias("dmore"),
    )


@query(
    "tpcds_q41_attribute_combos",
    oracle="""
    SELECT DISTINCT p_name
    FROM part p1
    WHERE p_size BETWEEN 10 AND 20
      AND EXISTS (
        SELECT 1 FROM part p2
        WHERE p2.p_brand = p1.p_brand
          AND ((p2.p_type LIKE '%PROMO%' AND p2.p_size BETWEEN 1 AND 15)
            OR (p2.p_type LIKE '%ECONOMY%' AND p2.p_size BETWEEN 5 AND 25)))
    ORDER BY p_name LIMIT 50
    """,
)
def tpcds_q41_attribute_combos(spark, sf_dir):
    """TPC-DS q41 shape (reference query41.sql: DISTINCT product names
    whose manufacturer also makes items matching a disjunction of
    attribute conjunctions — a correlated EXISTS on the same dimension):
    lowered to a LEFT SEMI self-join on the correlation key, which
    broadcasts at any scale (dimension-sized both sides)."""
    p = load_table(spark, sf_dir, "part")
    probe = p.filter(F.col("p_size").between(10, 20)).alias("p1")
    attrs = p.filter(
        (F.col("p_type").like("%PROMO%") & F.col("p_size").between(1, 15))
        | (F.col("p_type").like("%ECONOMY%") & F.col("p_size").between(5, 25))
    ).alias("p2")
    return (
        probe.join(
            F.broadcast(attrs),
            F.col("p1.p_brand") == F.col("p2.p_brand"),
            "left_semi",
        )
        .select(F.col("p1.p_name").alias("p_name"))
        .distinct()
        .orderBy("p_name")
        .limit(50)
    )


@query(
    "tpcds_q13_band_disjunction_avgs",
    oracle=f"""
    SELECT CAST(AVG(CAST(l_quantity AS {DEC})) AS DOUBLE) AS avg_qty,
           CAST(AVG(CAST(l_extendedprice AS {DEC})) AS DOUBLE) AS avg_price,
           CAST(SUM(CAST(l_discount AS {DEC})) AS DOUBLE) AS sum_disc,
           COUNT(*) AS n
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE (o_orderpriority = '1-URGENT'
             AND l_quantity BETWEEN 1 AND 15
             AND l_extendedprice BETWEEN 1000 AND 30000)
       OR (o_orderpriority = '2-HIGH'
             AND l_quantity BETWEEN 16 AND 35
             AND l_extendedprice BETWEEN 5000 AND 60000)
       OR (o_orderpriority = '3-MEDIUM'
             AND l_quantity BETWEEN 36 AND 50
             AND l_extendedprice BETWEEN 10000 AND 90000)
    """,
)
def tpcds_q13_band_disjunction_avgs(spark, sf_dir):
    """TPC-DS q13 shape (reference query13.sql: averages under a
    three-way DISJUNCTION of demographic × band conjunctions): the OR of
    conjunctive bands stays ONE pushable predicate on the joined fact —
    Catalyst keeps it a single filter after the join, one aggregation
    pass; the reference's household/marital bands become
    priority × quantity × price bands here."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    j = li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    p, q, e = F.col("o_orderpriority"), F.col("l_quantity"), F.col("l_extendedprice")
    cond = (
        ((p == "1-URGENT") & q.between(1, 15) & e.between(1000, 30000))
        | ((p == "2-HIGH") & q.between(16, 35) & e.between(5000, 60000))
        | ((p == "3-MEDIUM") & q.between(36, 50) & e.between(10000, 90000))
    )
    return j.filter(cond).agg(
        davg("l_quantity", "avg_qty"),
        davg("l_extendedprice", "avg_price"),
        dsum("l_discount", "sum_disc"),
        F.count("*").alias("n"),
    )


@query(
    "tpcds_q65_low_revenue_parts",
    oracle=f"""
    WITH pr AS (
      SELECT l_partkey, p_brand,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS {DEC})) AS rev
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY l_partkey, p_brand),
    ba AS (SELECT p_brand, SUM(rev) AS total, COUNT(*) AS np
           FROM pr GROUP BY p_brand)
    SELECT pr.p_brand, pr.l_partkey,
           CAST(pr.rev AS DOUBLE) AS revenue
    FROM pr JOIN ba ON pr.p_brand = ba.p_brand
    WHERE pr.rev * np * 10 <= total * 7
    """,
)
def tpcds_q65_low_revenue_parts(spark, sf_dir):
    """TPC-DS q65 shape (reference query65.sql: items whose revenue is at
    most a fraction of their store's average item revenue — a per-group
    aggregate joined back against a second-level aggregate OF the first):
    the threshold `rev <= 0.7 * avg` is evaluated in EXACT decimal
    cross-multiplication (rev·n·10 ≤ total·7) so no float boundary can
    flip membership between engines; the second-level aggregate reuses
    the first's shuffle (same p_brand key — no extra exchange on the
    re-aggregation input)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    pr = (
        li.join(F.broadcast(part),
                F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "p_brand")
        .agg(F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount")))
                   .cast(DEC)).alias("rev"))
    )
    ba = pr.groupBy("p_brand").agg(
        F.sum("rev").alias("total"), F.count("*").alias("np")
    )
    return (
        pr.join(ba, "p_brand")
        .filter(F.col("rev") * F.col("np") * 10 <= F.col("total") * 7)
        .select("p_brand", "l_partkey",
                F.col("rev").cast("double").alias("revenue"))
    )


@query(
    "tpcds_q98_class_revenue_share",
    oracle=f"""
    WITH ir AS (
      SELECT p_type, p_brand,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS {DEC}))
               AS itemrevenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_size <= 25
      GROUP BY p_type, p_brand)
    SELECT p_type, p_brand,
           CAST(itemrevenue AS DOUBLE) AS itemrevenue,
           round(CAST(itemrevenue * 100 AS DOUBLE)
                   / CAST(SUM(itemrevenue) OVER (PARTITION BY p_type)
                          AS DOUBLE), 9) AS revenueratio
    FROM ir
    """,
)
def tpcds_q98_class_revenue_share(spark, sf_dir):
    """TPC-DS q98 shape (reference query98.sql: per-item revenue with its
    share of the CLASS total via a windowed sum over the aggregate): the
    window reuses the aggregation's partitioning (p_type prefix of the
    group key) — Catalyst plans agg → window with no second shuffle of
    the fact; the ratio divides a decimal-exact numerator by a
    decimal-exact class total, rounded once."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 25)
    ir = (
        li.join(F.broadcast(part),
                F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_type", "p_brand")
        .agg(F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount")))
                   .cast(DEC)).alias("itemrevenue"))
    )
    w = Window.partitionBy("p_type")
    return ir.select(
        "p_type", "p_brand",
        F.col("itemrevenue").cast("double").alias("itemrevenue"),
        F.round(
            (F.col("itemrevenue") * 100).cast("double")
            / F.sum("itemrevenue").over(w).cast("double"), 9
        ).alias("revenueratio"),
    )


@query(
    "tpcds_q6_above_average_price",
    oracle=f"""
    WITH avg_by_type AS (
      SELECT p_type, AVG(CAST(p_retailprice AS {DEC})) AS a
      FROM part GROUP BY p_type)
    SELECT n.n_name, COUNT(*) AS cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN avg_by_type t ON p.p_type = t.p_type
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE CAST(p.p_retailprice AS {DEC}) * 100 > t.a * 105
    GROUP BY n.n_name
    HAVING COUNT(*) >= 5
    """,
)
def tpcds_q6_above_average_price(spark, sf_dir):
    """TPC-DS q6 shape (reference query6.sql: customers in states buying
    items priced ≥ 1.05× their category average): the correlated
    category-average subquery decorrelates into ONE dimension aggregate
    broadcast back onto the fact; the 1.05× threshold compares in exact
    decimal cross-multiplication (price·100 > avg·105)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    avg_t = part.groupBy("p_type").agg(
        F.avg(F.col("p_retailprice").cast(DEC)).alias("a")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(avg_t), "p_type")
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("p_retailprice").cast(DEC) * 100 > F.col("a") * 105)
        .groupBy("n_name")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= 5)
    )


@query(
    "tpcds_q15_regional_big_spenders",
    oracle=f"""
    SELECT n.n_name,
           CAST(SUM(CAST(o.o_totalprice AS {DEC})) AS DOUBLE) AS total
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_totalprice > 50000
       OR n.n_name IN ('FRANCE', 'GERMANY', 'CANADA')
    GROUP BY n.n_name
    """,
)
def tpcds_q15_regional_big_spenders(spark, sf_dir):
    """TPC-DS q15 shape (reference query15.sql: catalog-sales totals per
    zip where the zip is in a fixed list OR the sale exceeds a
    threshold — the characteristic disjunction of a dimension predicate
    with a fact predicate, which can NOT prune either scan alone): one
    fact pass, broadcast dims, the OR evaluated post-join."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .filter(
            (F.col("o_totalprice") > 50000)
            | F.col("n_name").isin("FRANCE", "GERMANY", "CANADA")
        )
        .groupBy("n_name")
        .agg(dsum("o_totalprice", "total"))
    )


@query(
    "tpcds_q96_time_band_count",
    oracle="""
    SELECT COUNT(*) AS cnt
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    WHERE hour(e.ts) BETWEEN 8 AND 9
      AND e.event_type = 'purchase'
      AND c.c_mktsegment = 'BUILDING'
    """,
)
def tpcds_q96_time_band_count(spark, sf_dir):
    """TPC-DS q96 shape (reference query96.sql: store-sales count in a
    half-hour band for a demographic slice — three broadcast dimension
    filters and a bare COUNT(*)): every predicate reaches the scan or a
    broadcast hash join; the count needs no shuffle beyond the final
    1-row aggregate."""
    ev = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")
    return (
        ev.filter(
            F.hour("ts").between(8, 9) & (F.col("event_type") == "purchase")
        )
        .join(F.broadcast(c.filter(F.col("c_mktsegment") == "BUILDING")),
              F.col("user_id") == F.col("c_custkey"))
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "tpcds_q2_weekday_yoy",
    oracle=f"""
    WITH wk AS (
      SELECT isoyear(l_shipdate) AS yr, weekofyear(l_shipdate) AS wk,
             {sql_dsum("CASE WHEN isodow(l_shipdate) = 1 THEN l_extendedprice ELSE 0 END", "d1")},
             {sql_dsum("CASE WHEN isodow(l_shipdate) = 2 THEN l_extendedprice ELSE 0 END", "d2")},
             {sql_dsum("CASE WHEN isodow(l_shipdate) = 3 THEN l_extendedprice ELSE 0 END", "d3")},
             {sql_dsum("CASE WHEN isodow(l_shipdate) = 4 THEN l_extendedprice ELSE 0 END", "d4")},
             {sql_dsum("CASE WHEN isodow(l_shipdate) = 5 THEN l_extendedprice ELSE 0 END", "d5")},
             {sql_dsum("CASE WHEN isodow(l_shipdate) = 6 THEN l_extendedprice ELSE 0 END", "d6")},
             {sql_dsum("CASE WHEN isodow(l_shipdate) = 7 THEN l_extendedprice ELSE 0 END", "d7")}
      FROM lineitem
      WHERE l_linenumber % 3 <> 0
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-12-29'
      GROUP BY 1, 2)
    SELECT CAST(y1.wk AS BIGINT) AS wk,
           round(y1.d1 / y2.d1, 6) AS r1, round(y1.d2 / y2.d2, 6) AS r2,
           round(y1.d3 / y2.d3, 6) AS r3, round(y1.d4 / y2.d4, 6) AS r4,
           round(y1.d5 / y2.d5, 6) AS r5, round(y1.d6 / y2.d6, 6) AS r6,
           round(y1.d7 / y2.d7, 6) AS r7
    FROM wk y1 JOIN wk y2 ON y1.wk = y2.wk
    WHERE y1.yr = 1996 AND y2.yr = 1997
      AND y2.d1 > 0 AND y2.d2 > 0 AND y2.d3 > 0 AND y2.d4 > 0
      AND y2.d5 > 0 AND y2.d6 > 0 AND y2.d7 > 0
    """,
)
def tpcds_q2_weekday_yoy(spark, sf_dir):
    """TPC-DS q2 shape (reference tpcds-tool/query/query2.sql): the
    channel-union fact pivoted into a 7-column ISO-weekday revenue row per
    week, then the SAME CTE self-joined year vs year+1 on the week number
    to emit per-weekday year-over-year ratios (channel proxied by
    l_linenumber % 3 on the reduced schema, as l_shipmode is in tpch.py). The self-join runs over
    |weeks| aggregated rows, never fact rows; one shuffle for the weekly
    group-by, the 104-row self-join broadcasts."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_linenumber") % 3 != 0)
        & (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-12-29")
    )
    isodow = (F.dayofweek("l_shipdate") + 5) % 7 + 1
    wk = li.groupBy(
        F.expr("extract(YEAROFWEEK FROM l_shipdate)").alias("yr"),
        F.weekofyear("l_shipdate").alias("wk"),
    ).agg(*[
        dsum(
            F.when(isodow == d, F.col("l_extendedprice")).otherwise(0.0),
            f"d{d}",
        )
        for d in range(1, 8)
    ])
    y1 = wk.filter(F.col("yr") == 1996).alias("y1")
    y2 = wk.filter(F.col("yr") == 1997).alias("y2")
    cond = F.col("y1.wk") == F.col("y2.wk")
    for d in range(1, 8):
        cond = cond & (F.col(f"y2.d{d}") > 0)
    return y1.join(F.broadcast(y2), cond).select(
        F.col("y1.wk").cast("long").alias("wk"),
        *[
            F.round(F.col(f"y1.d{d}") / F.col(f"y2.d{d}"), 6).alias(f"r{d}")
            for d in range(1, 8)
        ],
    )


@query(
    "tpcds_q4_three_channel_growth",
    oracle=f"""
    WITH t AS (
      SELECT o.o_custkey AS cust,
             {sql_dsum("CASE WHEN l.l_linenumber % 3 = 0 AND year(o.o_orderdate) = 1996 THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END", "s96")},
             {sql_dsum("CASE WHEN l.l_linenumber % 3 = 0 AND year(o.o_orderdate) = 1997 THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END", "s97")},
             {sql_dsum("CASE WHEN l.l_linenumber % 3 = 1 AND year(o.o_orderdate) = 1996 THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END", "c96")},
             {sql_dsum("CASE WHEN l.l_linenumber % 3 = 1 AND year(o.o_orderdate) = 1997 THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END", "c97")},
             {sql_dsum("CASE WHEN l.l_linenumber % 3 = 2 AND year(o.o_orderdate) = 1996 THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END", "w96")},
             {sql_dsum("CASE WHEN l.l_linenumber % 3 = 2 AND year(o.o_orderdate) = 1997 THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END", "w97")}
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderdate >= DATE '1996-01-01'
        AND o.o_orderdate < DATE '1998-01-01'
      GROUP BY 1)
    SELECT cust, round(w97 / w96, 6) AS web_growth,
           round(c97 / c96, 6) AS cat_growth,
           round(s97 / s96, 6) AS store_growth
    FROM t
    WHERE s96 > 0 AND c96 > 0 AND w96 > 0
      AND w97 / w96 > s97 / s96 AND c97 / c96 > s97 / s96
    """,
)
def tpcds_q4_three_channel_growth(spark, sf_dir):
    """TPC-DS q4 shape (reference tpcds-tool/query/query4.sql): per-
    customer per-channel yearly totals (store/catalog/web as shipmode
    bands), then keep customers whose web AND catalog year-over-year
    growth both beat store growth. One fact-fact shuffle join
    (lineitem x orders on orderkey) + ONE grouped pass computing all six
    channel-year cells via conditional aggregation — the classic
    six-CTE formulation collapsed into a single shuffle, which is the
    plan you want when each CTE would rescan a 100 TB fact."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    ).select("o_orderkey", "o_custkey", F.year("o_orderdate").alias("yr"))
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", (F.col("l_linenumber") % 3).alias("chan"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net"),
    )
    bands = {"s": 0, "c": 1, "w": 2}
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    aggs = []
    for ch, band in bands.items():
        for yr in (1996, 1997):
            aggs.append(dsum(
                F.when(
                    (F.col("chan") == band) & (F.col("yr") == yr),
                    F.col("net"),
                ).otherwise(0.0),
                f"{ch}{yr % 100}",
            ))
    t = j.groupBy(F.col("o_custkey").alias("cust")).agg(*aggs)
    return t.filter(
        (F.col("s96") > 0) & (F.col("c96") > 0) & (F.col("w96") > 0)
        & (F.col("w97") / F.col("w96") > F.col("s97") / F.col("s96"))
        & (F.col("c97") / F.col("c96") > F.col("s97") / F.col("s96"))
    ).select(
        "cust",
        F.round(F.col("w97") / F.col("w96"), 6).alias("web_growth"),
        F.round(F.col("c97") / F.col("c96"), 6).alias("cat_growth"),
        F.round(F.col("s97") / F.col("s96"), 6).alias("store_growth"),
    )


@query(
    "tpcds_q30_state_return_outliers",
    oracle=f"""
    WITH r AS (
      SELECT o.o_custkey AS cust, c.c_nationkey AS nk,
             {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", "ret_total")}
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE l.l_returnflag = 'R'
      GROUP BY 1, 2),
    a AS (
      SELECT nk,
             CAST(SUM(CAST(ret_total AS {DEC})) AS DOUBLE) / COUNT(*) AS nat_avg
      FROM r GROUP BY nk)
    SELECT r.cust, n.n_name AS nation, round(r.ret_total, 6) AS ret_total
    FROM r JOIN a ON r.nk = a.nk
    JOIN nation n ON r.nk = n.n_nationkey
    WHERE r.ret_total > 1.2 * a.nat_avg
    """,
)
def tpcds_q30_state_return_outliers(spark, sf_dir):
    """TPC-DS q30 shape (reference tpcds-tool/query/query30.sql):
    customers whose total returns exceed 1.2x the average return total of
    their state (nation here) — the correlated per-state-average subquery
    decorrelated into a second aggregate over the ALREADY-aggregated
    per-customer rows plus a broadcast join back. The threshold compare
    runs on decimal-exact doubles, so the cut is bit-deterministic on
    both engines at any parallelism."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select(
        "l_orderkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net"),
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    r = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("o_custkey").alias("cust"), F.col("c_nationkey").alias("nk"))
        .agg(dsum("net", "ret_total"))
    )
    a = r.groupBy("nk").agg(
        (F.sum(F.col("ret_total").cast(DEC)).cast("double") / F.count("*"))
        .alias("nat_avg")
    )
    return (
        r.join(F.broadcast(a), "nk")
        .filter(F.col("ret_total") > 1.2 * F.col("nat_avg"))
        .join(F.broadcast(n), F.col("nk") == F.col("n_nationkey"))
        .select(
            "cust", F.col("n_name").alias("nation"),
            F.round("ret_total", 6).alias("ret_total"),
        )
    )


@query(
    "tpcds_q45_zip_or_subquery",
    oracle=f"""
    WITH wanted AS (
      SELECT DISTINCT o.o_custkey AS cust
      FROM orders o
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_brand = 'Brand#23')
    SELECT n.n_name AS nation,
           {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", "rev")}
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    LEFT JOIN wanted w ON c.c_custkey = w.cust
    WHERE o.o_orderdate >= DATE '1996-01-01'
      AND o.o_orderdate < DATE '1996-07-01'
      AND (c.c_nationkey IN (1, 3, 5) OR w.cust IS NOT NULL)
    GROUP BY 1
    """,
)
def tpcds_q45_zip_or_subquery(spark, sf_dir):
    """TPC-DS q45 shape (reference tpcds-tool/query/query45.sql): revenue
    by geography where the customer is EITHER in a literal zip list OR in
    an IN-subquery over another dimension path — the OR prevents semi-join
    pushdown, so the subquery is materialized as a distinct key set,
    broadcast LEFT-joined, and the disjunction evaluated as a flag
    (null-check) next to the literal list."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#23"
    ).select("p_partkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    wanted = (
        o.select("o_orderkey", "o_custkey")
        .join(li.select("l_orderkey", "l_partkey"),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select(F.col("o_custkey").alias("cust")).distinct()
    )
    ow = o.filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-07-01")
    ).select("o_orderkey", "o_custkey")
    return (
        li.select(
            "l_orderkey",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net"),
        )
        .join(ow, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(wanted), F.col("c_custkey") == F.col("cust"), "left")
        .filter(
            F.col("c_nationkey").isin(1, 3, 5) | F.col("cust").isNotNull()
        )
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(dsum("net", "rev"))
    )


@query(
    "tpcds_q61_promo_ratio",
    oracle=f"""
    WITH pr AS (
      SELECT {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", "promo_rev")}
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_type LIKE 'PROMO%'
        AND l.l_shipdate >= DATE '1996-03-01' AND l.l_shipdate < DATE '1996-06-01'),
    tt AS (
      SELECT {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", "total_rev")}
      FROM lineitem l
      WHERE l.l_shipdate >= DATE '1996-03-01' AND l.l_shipdate < DATE '1996-06-01')
    SELECT round(pr.promo_rev, 6) AS promo_rev,
           round(tt.total_rev, 6) AS total_rev,
           round(pr.promo_rev * 100 / tt.total_rev, 6) AS promo_pct
    FROM pr, tt
    """,
)
def tpcds_q61_promo_ratio(spark, sf_dir):
    """TPC-DS q61 shape (reference tpcds-tool/query/query61.sql): the
    promotional-to-total revenue ratio as a CROSS JOIN of two single-row
    scalar aggregates over differently-filtered copies of the fact — both
    single-row sides materialize independently (each its own pushed-down
    scan), then a 1x1 cross join emits the ratio row."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01")
        & (F.col("l_shipdate") < "1996-06-01")
    ).select(
        "l_partkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net"),
    )
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_type").like("PROMO%")
    ).select("p_partkey")
    pr = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(dsum("net", "promo_rev"))
    )
    tt = li.agg(dsum("net", "total_rev"))
    return pr.crossJoin(tt).select(
        F.round("promo_rev", 6).alias("promo_rev"),
        F.round("total_rev", 6).alias("total_rev"),
        F.round(F.col("promo_rev") * 100 / F.col("total_rev"), 6)
        .alias("promo_pct"),
    )


@query(
    "tpcds_q84_income_band_lookup",
    oracle="""
    SELECT c.c_custkey AS cust,
           c.c_name || ', ' || n.n_name AS customer_name
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'EUROPE'
      AND c.c_mktsegment = 'HOUSEHOLD'
      AND c.c_acctbal BETWEEN 1000 AND 4000
    """,
)
def tpcds_q84_income_band_lookup(spark, sf_dir):
    """TPC-DS q84 shape (reference tpcds-tool/query/query84.sql): a pure
    multi-hop dimension lookup chain (customer -> address -> income band
    here mapped customer -> nation -> region) with band predicates and NO
    aggregation — every hop broadcasts, the plan is a single codegen
    stage over the customer scan."""
    c = load_table(spark, sf_dir, "customer").filter(
        (F.col("c_mktsegment") == "HOUSEHOLD")
        & (F.col("c_acctbal") >= 1000) & (F.col("c_acctbal") <= 4000)
    )
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    ).select("r_regionkey")
    return (
        c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            F.col("c_custkey").alias("cust"),
            F.concat(F.col("c_name"), F.lit(", "), F.col("n_name"))
            .alias("customer_name"),
        )
    )


@query(
    "tpcds_q87_distinct_except_chain",
    oracle="""
    SELECT COUNT(*) AS n_store_only FROM (
      (SELECT DISTINCT o.o_custkey, o.o_orderdate
       FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       WHERE l.l_linenumber % 3 = 0)
      EXCEPT
      (SELECT DISTINCT o.o_custkey, o.o_orderdate
       FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       WHERE l.l_linenumber % 3 = 1)
      EXCEPT
      (SELECT DISTINCT o.o_custkey, o.o_orderdate
       FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       WHERE l.l_linenumber % 3 = 2)
    )
    """,
)
def tpcds_q87_distinct_except_chain(spark, sf_dir):
    """TPC-DS q87 shape (reference tpcds-tool/query/query87.sql): COUNT of
    the EXCEPT chain of per-channel distinct (customer, date) sets —
    store-channel visits that happened on no other channel. Each branch
    shares one orders x lineitem join pass (the channel is a filter, not
    a separate scan in the reference plan either); EXCEPT shuffles on the
    full row key, which is the unavoidable set-op shuffle."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", (F.col("l_linenumber") % 3).alias("chan")
    )
    j = li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))

    def chan(band):
        return (
            j.filter(F.col("chan") == band)
            .select("o_custkey", "o_orderdate").distinct()
        )

    store, cat, web = chan(0), chan(1), chan(2)
    return (
        store.subtract(cat).subtract(web)
        .agg(F.count("*").alias("n_store_only"))
    )


@query(
    "tpcds_q46_cross_nation_trips",
    oracle=f"""
    SELECT o.o_custkey AS cust, o.o_orderkey AS trip,
           {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", "trip_rev")}
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment IN ('AUTOMOBILE', 'MACHINERY')
      AND s.s_nationkey <> c.c_nationkey
      AND o.o_orderdate >= DATE '1997-01-01'
      AND o.o_orderdate < DATE '1997-04-01'
    GROUP BY 1, 2
    HAVING COUNT(*) >= 2
    """,
)
def tpcds_q46_cross_nation_trips(spark, sf_dir):
    """TPC-DS q46 shape (reference tpcds-tool/query/query46.sql): per-trip
    (customer, ticket) aggregates where the sale's location dimension
    differs from the customer's home dimension (bought-city <> home-city,
    mapped supplier-nation <> customer-nation), with demographic band
    filters and a HAVING floor. Dims broadcast; the only shuffle is the
    per-trip group-by, keyed on the join key the fact rows already
    carry."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net"),
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01")
        & (F.col("o_orderdate") < "1997-04-01")
    ).select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("AUTOMOBILE", "MACHINERY")
    ).select("c_custkey", "c_nationkey")
    return (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(
            F.col("o_custkey").alias("cust"),
            F.col("o_orderkey").alias("trip"),
        )
        .agg(dsum("net", "trip_rev"), F.count("*").alias("_n"))
        .filter(F.col("_n") >= 2)
        .drop("_n")
    )


# -- round-7 additions: ten more reference-tpcds plan shapes ---------------


@query(
    "tpcds_q8_preferred_zips",
    oracle=f"""
    WITH zips AS (
      SELECT n_nationkey AS nk FROM nation
      WHERE n_nationkey IN (0, 3, 5, 8, 14, 19, 22)
      INTERSECT
      SELECT c_nationkey FROM customer
      GROUP BY c_nationkey HAVING COUNT(*) FILTER (WHERE c_acctbal > 7000) >= 5
    )
    SELECT s.s_name AS store,
           {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", "net_profit")}
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN zips z     ON s.s_nationkey = z.nk
    GROUP BY 1
    """,
)
def tpcds_q8_preferred_zips(spark, sf_dir):
    """TPC-DS q8 shape (store profit restricted to zip codes that are BOTH
    in a literal list AND home to enough preferred customers — an
    INTERSECT of two dim-derived key sets gating the fact; reference
    query8.sql): the intersected key set is tiny and broadcast; the fact
    never scans for non-qualifying geography."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey", "s_name"
    )
    listed = load_table(spark, sf_dir, "nation").filter(
        F.col("n_nationkey").isin(0, 3, 5, 8, 14, 19, 22)
    ).select(F.col("n_nationkey").alias("nk"))
    preferred = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count_if(F.col("c_acctbal") > 7000).alias("npref"))
        .filter(F.col("npref") >= 5)
        .select("nk")
    )
    zips = listed.intersect(preferred)
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(zips), s.s_nationkey == F.col("nk"))
        .groupBy(F.col("s_name").alias("store"))
        .agg(dsum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")),
            "net_profit",
        ))
    )


@query(
    "tpcds_q12_class_revenue_ratio",
    oracle=f"""
    WITH rev AS (
      SELECT p.p_brand AS brand, p.p_type AS class,
             SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS {DEC}))
               AS itemrevenue
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_size < 15
      GROUP BY 1, 2
    )
    SELECT brand, class,
           CAST(itemrevenue AS DOUBLE) AS itemrevenue,
           ROUND(CAST(itemrevenue AS DOUBLE) * 100.0
                 / CAST(SUM(itemrevenue) OVER (PARTITION BY class) AS DOUBLE),
                 6) AS revenueratio
    FROM rev
    """,
)
def tpcds_q12_class_revenue_ratio(spark, sf_dir):
    """TPC-DS q12 shape (per-item revenue share of its class —
    ratio_to_report as a windowed sum over the AGGREGATED rows; reference
    query12.sql): the window partitions |brand×class| rows, never the
    fact; decimal-exact sums make the ratio engine-deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_size") < 15
    ).select("p_partkey", "p_brand", "p_type")
    rev = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"),
                 F.col("p_type").alias("class"))
        .agg(F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
        ).alias("itemrevenue"))
    )
    w = Window.partitionBy("class")
    return rev.select(
        "brand", "class",
        F.col("itemrevenue").cast("double").alias("itemrevenue"),
        F.round(
            F.col("itemrevenue").cast("double") * 100.0
            / F.sum("itemrevenue").over(w).cast("double"),
            6,
        ).alias("revenueratio"),
    )


@query(
    "tpcds_q18_demographic_rollup_avgs",
    oracle=f"""
    SELECT r.r_name AS region, n.n_name AS nation,
           {sql_davg("l.l_quantity", "avg_qty")},
           {sql_davg("l.l_extendedprice", "avg_price")},
           {sql_davg("l.l_discount", "avg_disc")},
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY ROLLUP(r.r_name, n.n_name)
    """,
)
def tpcds_q18_demographic_rollup_avgs(spark, sf_dir):
    """TPC-DS q18 shape (average measures for a demographic slice,
    reported over a geography ROLLUP; reference query18.sql): the
    demographic filter prunes through the broadcast customer dim before
    the single fact aggregation; the rollup re-aggregates |groups| rows."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey", "n_name"
    )
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        joined.withColumnRenamed("r_name", "region")
        .withColumnRenamed("n_name", "nation")
        .rollup("region", "nation")
        .agg(
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count("*").alias("n"),
        )
    )


@query(
    "tpcds_q26_demographic_item_avgs",
    oracle=f"""
    SELECT p.p_brand AS brand,
           {sql_davg("l.l_quantity", "agg1")},
           {sql_davg("l.l_extendedprice", "agg2")},
           {sql_davg("l.l_discount", "agg3")},
           {sql_davg("l.l_extendedprice * (1 - l.l_discount)", "agg4")}
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN part p     ON l.l_partkey = p.p_partkey
    WHERE c.c_mktsegment = 'MACHINERY'
      AND o.o_orderpriority = '3-MEDIUM'
    GROUP BY 1
    """,
)
def tpcds_q26_demographic_item_avgs(spark, sf_dir):
    """TPC-DS q26 shape (four AVG measures per item for a demographics +
    promotion slice; reference query26.sql): every dim is broadcast, the
    filters reach the scans, and the single shuffle is the brand
    aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "3-MEDIUM"
    ).select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "MACHINERY"
    ).select("c_custkey")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            davg("l_quantity", "agg1"),
            davg("l_extendedprice", "agg2"),
            davg("l_discount", "agg3"),
            davg(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "agg4"
            ),
        )
    )


@query(
    "tpcds_q42_category_year_report",
    oracle=f"""
    SELECT EXTRACT(YEAR FROM o.o_orderdate)::BIGINT AS d_year,
           SPLIT_PART(p.p_type, ' ', 1) AS category,
           {sql_dsum("l.l_extendedprice", "sum_price")}
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN part p   ON l.l_partkey = p.p_partkey
    WHERE p.p_size BETWEEN 10 AND 20
    GROUP BY 1, 2
    """,
)
def tpcds_q42_category_year_report(spark, sf_dir):
    """TPC-DS q42 shape (category × year revenue report over a filtered
    item dim; reference query42.sql): trivial star — but the point is the
    PLAN: both dims broadcast, item filter pushed, one fact shuffle on
    the group key."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 20)
    ).select("p_partkey", "p_type")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            F.year("o_orderdate").cast("bigint").alias("d_year"),
            F.substring_index("p_type", " ", 1).alias("category"),
        )
        .agg(dsum("l_extendedprice", "sum_price"))
    )


@query(
    "tpcds_q43_weekday_pivot_per_store",
    oracle=f"""
    SELECT n.n_name AS store_nation,
           {sql_dsum("CASE WHEN DAYOFWEEK(o.o_orderdate) + 1 = 1 THEN o.o_totalprice ELSE 0 END", "sun_sales")},
           {sql_dsum("CASE WHEN DAYOFWEEK(o.o_orderdate) + 1 = 2 THEN o.o_totalprice ELSE 0 END", "mon_sales")},
           {sql_dsum("CASE WHEN DAYOFWEEK(o.o_orderdate) + 1 = 3 THEN o.o_totalprice ELSE 0 END", "tue_sales")},
           {sql_dsum("CASE WHEN DAYOFWEEK(o.o_orderdate) + 1 = 4 THEN o.o_totalprice ELSE 0 END", "wed_sales")},
           {sql_dsum("CASE WHEN DAYOFWEEK(o.o_orderdate) + 1 = 5 THEN o.o_totalprice ELSE 0 END", "thu_sales")},
           {sql_dsum("CASE WHEN DAYOFWEEK(o.o_orderdate) + 1 = 6 THEN o.o_totalprice ELSE 0 END", "fri_sales")},
           {sql_dsum("CASE WHEN DAYOFWEEK(o.o_orderdate) + 1 = 7 THEN o.o_totalprice ELSE 0 END", "sat_sales")}
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY 1
    """,
)
def tpcds_q43_weekday_pivot_per_store(spark, sf_dir):
    """TPC-DS q43 shape (per-store sales pivoted across the seven
    weekdays via conditional sums; reference query43.sql): one scan, one
    shuffle on the store key, seven map-side conditional partials —
    NOT seven scans."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    dow = F.dayofweek("o_orderdate")

    def day(i, alias):
        return dsum(
            F.when(dow == i, F.col("o_totalprice")).otherwise(F.lit(0)),
            alias,
        )

    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("store_nation"))
        .agg(
            day(1, "sun_sales"), day(2, "mon_sales"), day(3, "tue_sales"),
            day(4, "wed_sales"), day(5, "thu_sales"), day(6, "fri_sales"),
            day(7, "sat_sales"),
        )
    )


@query(
    "tpcds_q69_active_without_web",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      AND NOT EXISTS (SELECT 1 FROM events e
                      WHERE e.user_id = c.c_custkey
                        AND e.event_type = 'click')
      AND NOT EXISTS (SELECT 1 FROM events e
                      WHERE e.user_id = c.c_custkey
                        AND e.event_type = 'purchase')
    GROUP BY 1
    """,
)
def tpcds_q69_active_without_web(spark, sf_dir):
    """TPC-DS q69 shape (demographic counts of customers active in the
    store channel but absent from BOTH other channels — one EXISTS plus
    two NOT EXISTS; reference query69.sql): a semi-join then two
    anti-joins, each shuffling only the distinct key sets."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .join(clicks, c.c_custkey == clicks.user_id, "left_anti")
        .join(buys, c.c_custkey == buys.user_id, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "tpcds_q71_brand_by_hour_channels",
    oracle=f"""
    WITH u AS (
      SELECT 'click' AS channel, EXTRACT(HOUR FROM ts)::BIGINT AS hr,
             value AS v
      FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT 'view', EXTRACT(HOUR FROM ts)::BIGINT, value
      FROM events WHERE event_type = 'view'
      UNION ALL
      SELECT 'purchase', EXTRACT(HOUR FROM ts)::BIGINT, value
      FROM events WHERE event_type = 'purchase'
    )
    SELECT hr,
           {sql_dsum("CASE WHEN channel = 'click' THEN v ELSE 0 END", "click_v")},
           {sql_dsum("CASE WHEN channel = 'view' THEN v ELSE 0 END", "view_v")},
           {sql_dsum("CASE WHEN channel = 'purchase' THEN v ELSE 0 END", "purchase_v")}
    FROM u GROUP BY 1
    """,
)
def tpcds_q71_brand_by_hour_channels(spark, sf_dir):
    """TPC-DS q71 shape (one report keyed by time-of-day with a UNION ALL
    of three channels re-aggregated; reference query71.sql): the three
    branches share one source scan; the union is map-side (no shuffle per
    branch) and only the final hour-keyed aggregation shuffles."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view", "purchase")
    ).select(
        F.col("event_type").alias("channel"),
        F.hour("ts").cast("bigint").alias("hr"),
        F.col("value").alias("v"),
    )
    return ev.groupBy("hr").agg(
        dsum(F.when(F.col("channel") == "click", F.col("v"))
             .otherwise(F.lit(0)), "click_v"),
        dsum(F.when(F.col("channel") == "view", F.col("v"))
             .otherwise(F.lit(0)), "view_v"),
        dsum(F.when(F.col("channel") == "purchase", F.col("v"))
             .otherwise(F.lit(0)), "purchase_v"),
    )


@query(
    "tpcds_q76_null_key_channel_counts",
    oracle=f"""
    WITH u AS (
      SELECT 'store' AS channel, o.o_orderstatus AS col_name,
             EXTRACT(YEAR FROM o.o_orderdate)::BIGINT AS d_year,
             o.o_totalprice AS sales_amt,
             c.c_custkey IS NULL AS key_missing
      FROM orders o
      LEFT JOIN (SELECT c_custkey FROM customer WHERE c_acctbal >= 0) c
        ON o.o_custkey = c.c_custkey
      UNION ALL
      SELECT 'web', e.event_type,
             EXTRACT(YEAR FROM e.ts)::BIGINT, e.value,
             c.c_custkey IS NULL
      FROM events e
      LEFT JOIN (SELECT c_custkey FROM customer WHERE c_acctbal >= 0) c
        ON e.user_id = c.c_custkey
    )
    SELECT channel, col_name, d_year,
           CAST(COUNT(*) FILTER (WHERE key_missing) AS BIGINT) AS sales_cnt,
           {sql_dsum("CASE WHEN key_missing THEN sales_amt ELSE 0 END", "sales_amt")}
    FROM u GROUP BY 1, 2, 3
    """,
)
def tpcds_q76_null_key_channel_counts(spark, sf_dir):
    """TPC-DS q76 shape (count + sum of fact rows whose dimension key
    fails to resolve, per channel, via UNION ALL; reference query76.sql):
    each branch is fact LEFT JOIN broadcast-dim with an IS NULL probe —
    the 'orphaned rows audit' a 100-TB warehouse runs after ingest."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_acctbal") >= 0
    ).select("c_custkey")
    o = load_table(spark, sf_dir, "orders")
    store = (
        o.join(F.broadcast(cust), o.o_custkey == cust.c_custkey, "left")
        .select(
            F.lit("store").alias("channel"),
            F.col("o_orderstatus").alias("col_name"),
            F.year("o_orderdate").cast("bigint").alias("d_year"),
            F.col("o_totalprice").alias("sales_amt"),
            F.col("c_custkey").isNull().alias("key_missing"),
        )
    )
    ev = load_table(spark, sf_dir, "events")
    web = (
        ev.join(F.broadcast(cust), ev.user_id == cust.c_custkey, "left")
        .select(
            F.lit("web").alias("channel"),
            F.col("event_type").alias("col_name"),
            F.year("ts").cast("bigint").alias("d_year"),
            F.col("value").alias("sales_amt"),
            F.col("c_custkey").isNull().alias("key_missing"),
        )
    )
    return store.unionByName(web).groupBy(
        "channel", "col_name", "d_year"
    ).agg(
        F.count_if("key_missing").alias("sales_cnt"),
        dsum(F.when(F.col("key_missing"), F.col("sales_amt"))
             .otherwise(F.lit(0)), "sales_amt"),
    )


@query(
    "tpcds_q77_channel_profit_rollup",
    oracle=f"""
    WITH store AS (
      SELECT n.n_name AS loc,
             SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS {DEC}))
               AS sales,
             SUM(CAST(CASE WHEN l.l_returnflag = 'R'
                           THEN l.l_extendedprice ELSE 0 END AS {DEC}))
               AS returns
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      GROUP BY 1
    ), web AS (
      SELECT n.n_name AS loc,
             SUM(CAST(e.value AS {DEC})) AS sales,
             SUM(CAST(CASE WHEN e.event_type = 'error'
                           THEN e.value ELSE 0 END AS {DEC})) AS returns
      FROM events e
      JOIN customer c ON e.user_id = c.c_custkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      GROUP BY 1
    ), u AS (
      SELECT 'store' AS channel, loc, sales, returns FROM store
      UNION ALL
      SELECT 'web', loc, sales, returns FROM web
    )
    SELECT channel, loc,
           CAST(SUM(sales) AS DOUBLE) AS sales,
           CAST(SUM(returns) AS DOUBLE) AS returns,
           CAST(SUM(sales) - SUM(returns) AS DOUBLE) AS profit
    FROM u GROUP BY ROLLUP(channel, loc)
    """,
)
def tpcds_q77_channel_profit_rollup(spark, sf_dir):
    """TPC-DS q77 shape (per-channel sales/returns/profit, union of
    channel sub-reports re-aggregated under ROLLUP(channel, location);
    reference query77.sql): each channel aggregates its own fact once;
    the rollup re-aggregates |channels×locations| rows — decimal-exact
    through the rollup so the profit column is engine-deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    store = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("loc"))
        .agg(
            F.sum((F.col("l_extendedprice")
                   * (1 - F.col("l_discount"))).cast(DEC)).alias("sales"),
            F.sum(F.when(F.col("l_returnflag") == "R",
                         F.col("l_extendedprice"))
                  .otherwise(F.lit(0)).cast(DEC)).alias("returns"),
        )
        .select(F.lit("store").alias("channel"), "loc", "sales", "returns")
    )
    ev = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    web = (
        ev.join(F.broadcast(c), ev.user_id == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("loc"))
        .agg(
            F.sum(F.col("value").cast(DEC)).alias("sales"),
            F.sum(F.when(F.col("event_type") == "error", F.col("value"))
                  .otherwise(F.lit(0)).cast(DEC)).alias("returns"),
        )
        .select(F.lit("web").alias("channel"), "loc", "sales", "returns")
    )
    u = store.unionByName(web)
    return (
        u.rollup("channel", "loc")
        .agg(
            F.sum("sales").alias("__s"),
            F.sum("returns").alias("__r"),
        )
        .select(
            "channel", "loc",
            F.col("__s").cast("double").alias("sales"),
            F.col("__r").cast("double").alias("returns"),
            (F.col("__s") - F.col("__r")).cast("double").alias("profit"),
        )
    )


@query(
    "tpcds_q24_paid_above_global_avg",
    oracle=f"""
    WITH paid AS (
      SELECT c.c_name AS customer, p.p_brand AS brand,
             SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS {DEC}))
               AS paid
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN part p     ON l.l_partkey = p.p_partkey
      WHERE l.l_returnflag <> 'R'
      GROUP BY 1, 2
    )
    SELECT customer, brand, CAST(paid AS DOUBLE) AS paid
    FROM paid
    WHERE paid > (SELECT 0.05 * AVG(paid) FROM paid)
    """,
)
def tpcds_q24_paid_above_global_avg(spark, sf_dir):
    """TPC-DS q24 shape (per-customer-per-color net paid, kept only when
    above a scalar threshold computed over the SAME aggregate — a
    self-referential CTE gated by its own global average; reference
    query24.sql): the aggregate materializes once, the 1-row scalar
    broadcasts, no second fact pass."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") != "R"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    paid = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("c_name").alias("customer"),
                 F.col("p_brand").alias("brand"))
        .agg(F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
        ).alias("paid"))
        .localCheckpoint(eager=False)
    )
    thresh = paid.agg(
        (F.avg("paid") * F.lit(0.05)).alias("__t")
    )
    return (
        paid.crossJoin(F.broadcast(thresh))
        .filter(F.col("paid") > F.col("__t"))
        .select("customer", "brand", F.col("paid").cast("double").alias("paid"))
    )


@query(
    "tpcds_q32_excess_discount_per_item",
    oracle=f"""
    WITH item_agg AS (
      SELECT l_partkey, SUM(CAST(l_discount AS {DEC})) AS s,
             COUNT(*) AS n
      FROM lineitem GROUP BY 1
    )
    SELECT {sql_dsum("l.l_extendedprice * l.l_discount", "excess_discount_amount")}
    FROM lineitem l
    JOIN item_agg a ON l.l_partkey = a.l_partkey
    WHERE CAST(l.l_discount AS {DEC}) * a.n * 10 > 13 * a.s
    """,
)
def tpcds_q32_excess_discount_per_item(spark, sf_dir):
    """TPC-DS q32 shape (fact rows whose discount exceeds 1.3× the
    per-item average — the fact joined against ITS OWN per-key aggregate,
    a correlated-scalar decorrelation; reference query32.sql): the
    aggregate shuffles once on the item key and joins back on the same
    key (AQE co-locates the pair); decimal averages keep the threshold
    comparison engine-deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    item_agg = (
        li.groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_discount").cast(DEC)).alias("s"),
            F.count("*").alias("n"),
        )
    )
    # exact decimal cross-multiplication (disc > 1.3*s/n <=> 10*disc*n >
    # 13*s) — no float division on either engine, so the threshold is
    # boundary-exact
    return (
        li.join(item_agg.withColumnRenamed("l_partkey", "__pk"),
                li.l_partkey == F.col("__pk"))
        .filter(F.col("l_discount").cast(DEC) * F.col("n") * 10
                > F.col("s") * 13)
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"),
                  "excess_discount_amount"))
    )


@query(
    "tpcds_q11_two_channel_growth_customers",
    oracle=f"""
    WITH store AS (
      SELECT o.o_custkey AS ck, EXTRACT(YEAR FROM o.o_orderdate)::BIGINT AS yr,
             SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS {DEC})) AS s
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE EXTRACT(YEAR FROM o.o_orderdate) IN (1995, 1996)
      GROUP BY 1, 2
    ), cat AS (
      SELECT o_custkey AS ck, EXTRACT(YEAR FROM o_orderdate)::BIGINT AS yr,
             SUM(CAST(o_totalprice AS {DEC})) AS s
      FROM orders
      WHERE EXTRACT(YEAR FROM o_orderdate) IN (1995, 1996)
      GROUP BY 1, 2
    ), pv AS (
      SELECT st95.ck,
             st95.s AS store95, st96.s AS store96,
             ct95.s AS cat95,   ct96.s AS cat96
      FROM (SELECT ck, s FROM store WHERE yr = 1995) st95
      JOIN (SELECT ck, s FROM store WHERE yr = 1996) st96 USING (ck)
      JOIN (SELECT ck, s FROM cat   WHERE yr = 1995) ct95 USING (ck)
      JOIN (SELECT ck, s FROM cat   WHERE yr = 1996) ct96 USING (ck)
      WHERE st95.s > 0 AND ct95.s > 0
    )
    SELECT ck AS customer,
           CAST(store95 AS DOUBLE) AS store95,
           CAST(store96 AS DOUBLE) AS store96,
           CAST(cat95 AS DOUBLE) AS cat95,
           CAST(cat96 AS DOUBLE) AS cat96
    FROM pv
    WHERE cat96 * store95 > store96 * cat95
    """,
)
def tpcds_q11_two_channel_growth_customers(spark, sf_dir):
    """TPC-DS q11/q74 family, the two-channel variant (customers whose
    growth ratio in one channel beats the other; reference query11.sql):
    per-channel per-year aggregates pivoted by self-joins on the
    customer key, with the ratio comparison as exact decimal
    cross-multiplication (positive denominators) — no float division on
    either engine."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").withColumn(
        "yr", F.year("o_orderdate").cast("bigint")
    ).filter(F.col("yr").isin(1995, 1996))
    store = (
        li.join(o.select("o_orderkey", "o_custkey", "yr"),
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy(F.col("o_custkey").alias("ck"), "yr")
        .agg(F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
        ).alias("s"))
    )
    cat = (
        o.groupBy(F.col("o_custkey").alias("ck"), "yr")
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).alias("s"))
    )

    def year_slice(df, yr, alias):
        return df.filter(F.col("yr") == yr).select(
            "ck", F.col("s").alias(alias)
        )

    pv = (
        year_slice(store, 1995, "store95")
        .join(year_slice(store, 1996, "store96"), "ck")
        .join(year_slice(cat, 1995, "cat95"), "ck")
        .join(year_slice(cat, 1996, "cat96"), "ck")
        .filter((F.col("store95") > 0) & (F.col("cat95") > 0))
    )
    return (
        pv.filter(F.col("cat96") * F.col("store95")
                  > F.col("store96") * F.col("cat95"))
        .select(
            F.col("ck").alias("customer"),
            F.col("store95").cast("double").alias("store95"),
            F.col("store96").cast("double").alias("store96"),
            F.col("cat95").cast("double").alias("cat95"),
            F.col("cat96").cast("double").alias("cat96"),
        )
    )


@query(
    "tpcds_q27_state_brand_rollup_avgs",
    oracle=f"""
    SELECT n.n_name AS state, p.p_brand AS brand,
           GROUPING(n.n_name) + GROUPING(p.p_brand) AS lochierarchy,
           {sql_davg("l.l_quantity", "agg1")},
           {sql_davg("l.l_extendedprice", "agg2")}
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN part p     ON l.l_partkey = p.p_partkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY ROLLUP(n.n_name, p.p_brand)
    """,
)
def tpcds_q27_state_brand_rollup_avgs(spark, sf_dir):
    """TPC-DS q27 shape (average measures for a demographic slice under
    ROLLUP(state, item); reference query27.sql): like q18 but the rollup
    spans a dim × item hierarchy — still one fact pass, rollup over
    |states×brands| aggregated rows, GROUPING() level emitted."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
    )
    return (
        joined.withColumnRenamed("n_name", "state")
        .withColumnRenamed("p_brand", "brand")
        .rollup("state", "brand")
        .agg(
            (F.grouping("state") + F.grouping("brand"))
            .cast("bigint").alias("lochierarchy"),
            davg("l_quantity", "agg1"),
            davg("l_extendedprice", "agg2"),
        )
    )


@query(
    "tpcds_q28_band_distinct_stats",
    oracle=f"""
    SELECT
      {sql_davg("CASE WHEN l_quantity BETWEEN 1 AND 10 THEN l_extendedprice END", "b1_avg")},
      CAST(COUNT(CASE WHEN l_quantity BETWEEN 1 AND 10 THEN l_extendedprice END) AS BIGINT) AS b1_cnt,
      CAST(COUNT(DISTINCT CASE WHEN l_quantity BETWEEN 1 AND 10 THEN l_extendedprice END) AS BIGINT) AS b1_cntd,
      {sql_davg("CASE WHEN l_quantity BETWEEN 11 AND 20 THEN l_extendedprice END", "b2_avg")},
      CAST(COUNT(CASE WHEN l_quantity BETWEEN 11 AND 20 THEN l_extendedprice END) AS BIGINT) AS b2_cnt,
      CAST(COUNT(DISTINCT CASE WHEN l_quantity BETWEEN 11 AND 20 THEN l_extendedprice END) AS BIGINT) AS b2_cntd,
      {sql_davg("CASE WHEN l_quantity BETWEEN 21 AND 30 THEN l_extendedprice END", "b3_avg")},
      CAST(COUNT(CASE WHEN l_quantity BETWEEN 21 AND 30 THEN l_extendedprice END) AS BIGINT) AS b3_cnt,
      CAST(COUNT(DISTINCT CASE WHEN l_quantity BETWEEN 21 AND 30 THEN l_extendedprice END) AS BIGINT) AS b3_cntd
    FROM lineitem
    """,
)
def tpcds_q28_band_distinct_stats(spark, sf_dir):
    """TPC-DS q28 shape (avg/count/count-DISTINCT per disjoint quantity
    band, six scalar subqueries folded into one scan; reference
    query28.sql): the multiple COUNT(DISTINCT CASE ...) trigger Spark's
    Expand-based distinct-aggregate rewrite — one scan, one expanded
    shuffle, not one scan per band."""
    li = load_table(spark, sf_dir, "lineitem")

    def band(lo, hi):
        return F.when(F.col("l_quantity").between(lo, hi),
                      F.col("l_extendedprice"))

    return li.agg(
        davg(band(1, 10), "b1_avg"),
        F.count(band(1, 10)).alias("b1_cnt"),
        F.countDistinct(band(1, 10)).alias("b1_cntd"),
        davg(band(11, 20), "b2_avg"),
        F.count(band(11, 20)).alias("b2_cnt"),
        F.countDistinct(band(11, 20)).alias("b2_cntd"),
        davg(band(21, 30), "b3_avg"),
        F.count(band(21, 30)).alias("b3_cnt"),
        F.countDistinct(band(21, 30)).alias("b3_cntd"),
    )


@query(
    "tpcds_q55_brand_month_report",
    oracle=f"""
    SELECT p.p_brand AS brand,
           {sql_dsum("l.l_extendedprice", "ext_price")}
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN part p   ON l.l_partkey = p.p_partkey
    WHERE EXTRACT(YEAR FROM o.o_orderdate) = 1996
      AND EXTRACT(MONTH FROM o.o_orderdate) = 3
    GROUP BY 1
    """,
)
def tpcds_q55_brand_month_report(spark, sf_dir):
    """TPC-DS q55/q52/q42 family — the single-month brand report
    (reference query55.sql): the date predicate prunes at the orders
    scan, item broadcasts, one shuffle on brand."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.year("o_orderdate") == 1996) & (F.month("o_orderdate") == 3)
    ).select("o_orderkey")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(dsum("l_extendedprice", "ext_price"))
    )


@query(
    "tpcds_q94_multi_supplier_no_returns",
    oracle=f"""
    SELECT CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS order_count,
           {sql_dsum("o.o_totalprice", "total_price")}
    FROM orders o
    WHERE o.o_orderstatus = 'O'
      AND EXISTS (
        SELECT 1 FROM lineitem l1
        WHERE l1.l_orderkey = o.o_orderkey
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey))
      AND NOT EXISTS (
        SELECT 1 FROM lineitem lr
        WHERE lr.l_orderkey = o.o_orderkey AND lr.l_returnflag = 'R')
    """,
)
def tpcds_q94_multi_supplier_no_returns(spark, sf_dir):
    """TPC-DS q94 shape (orders shipped from more than one supplier with
    NO returned lines — an EXISTS(multi-supplier) plus NOT EXISTS
    (returns); reference query94.sql): both subqueries collapse to
    per-order aggregates joined semi/anti — the fact shuffles once per
    distinct-key set, never correlated per-row."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "O"
    )
    li = load_table(spark, sf_dir, "lineitem")
    multi = (
        li.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("nsupp"))
        .filter(F.col("nsupp") > 1)
        .select("l_orderkey")
    )
    returned = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    kept = (
        o.join(multi, o.o_orderkey == multi.l_orderkey, "left_semi")
        .join(returned, o.o_orderkey == returned.l_orderkey, "left_anti")
    )
    return kept.agg(
        F.countDistinct("o_orderkey").alias("order_count"),
        dsum("o_totalprice", "total_price"),
    )
