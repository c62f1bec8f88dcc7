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

Role mapping: lineitem = store_sales fact, events = web_sales fact,
orders carries the date dimension (o_orderdate), part = item,
customer/supplier/nation/region = the snowflake dims.

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
      AND p.p_retailprice > 1500
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
        F.col("p_retailprice") > 1500
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
      FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-01-01' GROUP BY 1
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
    1998 store tail) and keeps the window arithmetic integer-exact."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp_ntz")
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
