"""TPC-DS plan shapes, part 2 — the 19 query numbers that round 7
previously documented as plan-shape twins, now first-class gated queries
with exact DuckDB oracles (reference: flink-end-to-end-tests tpcds-tool
query/query{N}.sql for each number).

Each query keeps its twin's operator DAG (that is what makes it the same
TPC-DS *number* family) but carries its own literals, channel, measures,
and output schema, exactly as the real DS queries differ within a family
(e.g. q52 vs q55 vs q42 are the same star aggregate over different
dims/years; q57 is q47 on the catalog channel; q63/q89 are q53 with
month granularity / absolute deviation).

Role mapping (same as tpcds_shapes.py): lineitem = store_sales fact,
events = web_sales fact, orders carries the date dim, part = item,
customer/supplier/nation/region = the snowflake dims.

Scale notes (100 TB discipline): every dim side is broadcast; windows
run over aggregated |groups| rows, never fact rows; deviation thresholds
are exact integer-cents cross-multiplications so boundaries cannot
float-flip between engines or reduce orders.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from flink_spark.queries.registry import query
from flink_spark.queries.tpcds_shapes import (
    _CENTS,
    _INV_SQL,
    _cents_col,
    _inventory,
)
from flink_spark.queries.util import DEC, davg, dsum, sql_davg, sql_dsum
from flink_spark.sources.tables import load_table


# --------------------------------------------------------------- q20 ----
@query(
    "tpcds_q20_windowed_class_share",
    oracle=f"""
    WITH rev AS (
      SELECT p.p_partkey AS item, p.p_type AS class,
             SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS {DEC}))
               AS itemrevenue
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_retailprice BETWEEN 920 AND 960
        AND l.l_shipdate >= TIMESTAMP '1995-02-01'
        AND l.l_shipdate <  TIMESTAMP '1995-04-02'
      GROUP BY 1, 2
    )
    SELECT item, class,
           CAST(itemrevenue AS DOUBLE) AS itemrevenue,
           ROUND(CAST(itemrevenue AS DOUBLE) * 100.0
                 / CAST(SUM(itemrevenue) OVER (PARTITION BY class) AS DOUBLE),
                 6) AS revenueratio
    FROM rev
    """,
)
def tpcds_q20_windowed_class_share(spark, sf_dir):
    """TPC-DS q20 (catalog-channel twin of q12; reference query20.sql):
    per-ITEM revenue share of its class inside a 60-day ship window and a
    price band — the ratio window partitions |item| aggregated rows."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-02-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1995-04-02").cast("timestamp_ntz"))
    )
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_retailprice").between(920, 960)
    ).select("p_partkey", "p_type")
    rev = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_partkey").alias("item"),
                 F.col("p_type").alias("class"))
        .agg(F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
        ).alias("itemrevenue"))
    )
    w = Window.partitionBy("class")
    return rev.select(
        "item", "class",
        F.col("itemrevenue").cast("double").alias("itemrevenue"),
        F.round(
            F.col("itemrevenue").cast("double") * 100.0
            / F.sum("itemrevenue").over(w).cast("double"),
            6,
        ).alias("revenueratio"),
    )


# --------------------------------------------------------------- q29 ----
@query(
    "tpcds_q29_quantity_funnel",
    oracle="""
    WITH cl AS (
      SELECT o.o_custkey AS cust, p.p_brand AS brand, l.l_shipdate AS d,
             l.l_returnflag AS rf, CAST(l.l_quantity AS BIGINT) AS qty
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN part p ON l.l_partkey = p.p_partkey)
    SELECT s.cust, s.brand,
           CAST(SUM(s.qty) AS BIGINT) AS sold_qty,
           CAST(SUM(r.qty) AS BIGINT) AS ret_qty,
           CAST(SUM(b.qty) AS BIGINT) AS rebuy_qty,
           CAST(COUNT(*) AS BIGINT) AS n_triples
    FROM cl s
    JOIN cl r ON s.cust = r.cust AND s.brand = r.brand
    JOIN cl b ON r.cust = b.cust AND r.brand = b.brand
             AND s.cust = b.cust AND s.brand = b.brand
    WHERE s.rf <> 'R' AND r.rf = 'R' AND b.rf <> 'R'
      AND s.d <= r.d AND r.d <= b.d
      AND EXTRACT(YEAR FROM s.d) = 1995
    GROUP BY 1, 2
    """,
)
def tpcds_q29_quantity_funnel(spark, sf_dir):
    """TPC-DS q29 (QUANTITY-measured buy→return→rebuy funnel — q25's DAG
    with quantity sums and a fixed sale year; reference query29.sql): one
    (customer, brand) key shuffle feeds all three legs; the date ordering
    stays a join residual, never a post-cross-product filter."""
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
            F.col("l_quantity").cast("bigint").alias("qty"),
        )
    )
    s = cl.filter((F.col("rf") != "R") & (F.year("d") == 1995)).alias("s")
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
            F.sum(F.col("s.qty")).cast("bigint").alias("sold_qty"),
            F.sum(F.col("r.qty")).cast("bigint").alias("ret_qty"),
            F.sum(F.col("b.qty")).cast("bigint").alias("rebuy_qty"),
            F.count("*").alias("n_triples"),
        )
    )


# --------------------------------------------------------------- q52 ----
@query(
    "tpcds_q52_brand_year_report",
    oracle=f"""
    SELECT EXTRACT(YEAR FROM o.o_orderdate)::BIGINT AS d_year,
           p.p_brand AS brand,
           {sql_dsum("l.l_extendedprice", "ext_price")}
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN part p   ON l.l_partkey = p.p_partkey
    WHERE EXTRACT(YEAR FROM o.o_orderdate) = 1997
      AND EXTRACT(MONTH FROM o.o_orderdate) = 11
    GROUP BY 1, 2
    ORDER BY ext_price DESC, brand
    LIMIT 100
    """,
)
def tpcds_q52_brand_year_report(spark, sf_dir):
    """TPC-DS q52 (q55's single-month star with the year column and a
    revenue-ranked LIMIT report; reference query52.sql): the decimal-exact
    sums make the ORDER BY ... LIMIT cut engine-deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.year("o_orderdate") == 1997) & (F.month("o_orderdate") == 11)
    ).select("o_orderkey", "o_orderdate")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            F.year("o_orderdate").cast("bigint").alias("d_year"),
            F.col("p_brand").alias("brand"),
        )
        .agg(dsum("l_extendedprice", "ext_price"))
        .orderBy(F.desc("ext_price"), "brand")
        .limit(100)
    )


# --------------------------------------------------------------- q56 ----
@query(
    "tpcds_q56_item_channel_union",
    oracle=f"""
    WITH per AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {DEC}))
                  AS {DEC}) AS rev
      FROM lineitem WHERE l_linenumber % 3 = 0 GROUP BY 1
      UNION ALL
      SELECT l_partkey,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {DEC}))
                  AS {DEC})
      FROM lineitem WHERE l_linenumber % 3 = 1 GROUP BY 1
      UNION ALL
      SELECT l_partkey,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {DEC}))
                  AS {DEC})
      FROM lineitem WHERE l_linenumber % 3 = 2 GROUP BY 1
    )
    SELECT p.p_name AS item_name,
           CAST(SUM(per.rev) AS DOUBLE) AS total_rev
    FROM per JOIN part p ON per.l_partkey = p.p_partkey
    WHERE p.p_size BETWEEN 5 AND 12
    GROUP BY 1
    """,
)
def tpcds_q56_item_channel_union(spark, sf_dir):
    """TPC-DS q56 (per-ITEM sales across three channels UNION ALL'd then
    re-aggregated — q33's DAG keyed on item name with a size blocking
    filter; reference query56.sql): three grouped scans collapse to a
    tiny per-channel table before the broadcast-dim rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").between(5, 12)
    ).select("p_partkey", "p_name")

    def channel(c: int):
        return (
            li.filter(F.col("l_linenumber") % 3 == c)
            .groupBy("l_partkey")
            .agg(F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
            ).cast(DEC).alias("rev"))
        )

    per = channel(0).unionAll(channel(1)).unionAll(channel(2))
    return (
        per.join(F.broadcast(p), per.l_partkey == p.p_partkey)
        .groupBy(F.col("p_name").alias("item_name"))
        .agg(F.sum("rev").cast("double").alias("total_rev"))
    )


# --------------------------------------------------------------- q60 ----
@query(
    "tpcds_q60_category_channel_union",
    oracle=f"""
    WITH per AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_extendedprice AS {DEC})) AS {DEC}) AS rev
      FROM lineitem WHERE EXTRACT(YEAR FROM l_shipdate) = 1995 GROUP BY 1
      UNION ALL
      SELECT l_partkey, CAST(SUM(CAST(l_extendedprice AS {DEC})) AS {DEC})
      FROM lineitem WHERE EXTRACT(YEAR FROM l_shipdate) = 1996 GROUP BY 1
      UNION ALL
      SELECT l_partkey, CAST(SUM(CAST(l_extendedprice AS {DEC})) AS {DEC})
      FROM lineitem WHERE EXTRACT(YEAR FROM l_shipdate) = 1997 GROUP BY 1
    )
    SELECT p.p_type AS category,
           CAST(SUM(per.rev) AS DOUBLE) AS total_rev,
           CAST(COUNT(*) AS BIGINT) AS n_item_years
    FROM per JOIN part p ON per.l_partkey = p.p_partkey
    WHERE p.p_size > 40
    GROUP BY 1
    """,
)
def tpcds_q60_category_channel_union(spark, sf_dir):
    """TPC-DS q60 (q33's union-of-channels rolled up to CATEGORY, with
    year-sliced channels; reference query60.sql): each yearly slice
    reduces to |items| rows before the union; category totals come from a
    broadcast dim join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") > 40).select(
        "p_partkey", "p_type"
    )

    def channel(yr: int):
        return (
            li.filter(F.year("l_shipdate") == yr)
            .groupBy("l_partkey")
            .agg(F.sum(F.col("l_extendedprice").cast(DEC)).cast(DEC).alias("rev"))
        )

    per = channel(1995).unionAll(channel(1996)).unionAll(channel(1997))
    return (
        per.join(F.broadcast(p), per.l_partkey == p.p_partkey)
        .groupBy(F.col("p_type").alias("category"))
        .agg(
            F.sum("rev").cast("double").alias("total_rev"),
            F.count("*").alias("n_item_years"),
        )
    )


# --------------------------------------------------------------- q57 ----
@query(
    "tpcds_q57_event_daily_deviation",
    oracle="""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS d,
             SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS cents
      FROM events WHERE event_type IN ('click', 'view', 'purchase')
      GROUP BY 1, 2),
    w AS (
      SELECT *, SUM(cents)  OVER (PARTITION BY event_type) AS tot,
                COUNT(*)    OVER (PARTITION BY event_type) AS n,
                LAG(cents)  OVER (PARTITION BY event_type ORDER BY d) AS prev_cents,
                LEAD(cents) OVER (PARTITION BY event_type ORDER BY d) AS next_cents
      FROM daily)
    SELECT event_type, d,
           CAST(cents AS DOUBLE) / 100 AS revenue,
           CAST(tot AS DOUBLE) / (100 * n) AS daily_avg,
           CAST(prev_cents AS DOUBLE) / 100 AS prev_revenue,
           CAST(next_cents AS DOUBLE) / 100 AS next_revenue
    FROM w
    WHERE 10 * cents * n < 9 * tot OR 10 * cents * n > 11 * tot
    """,
)
def tpcds_q57_event_daily_deviation(spark, sf_dir):
    """TPC-DS q57 (q47's moving-deviation DAG on the SECOND channel —
    the events/web fact, daily grain; reference query57.sql): days
    deviating ±10% from the event type's period average, with neighbor
    days via LAG/LEAD; windows run over |type × day| aggregated rows and
    the threshold is exact integer-cents cross-multiplication."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view", "purchase")
    )
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(
        F.sum(
            F.floor(F.col("value") * 100 + 0.5).cast("bigint")
        ).alias("cents")
    )
    wtot = Window.partitionBy("event_type")
    wseq = Window.partitionBy("event_type").orderBy("d")
    w = daily.select(
        "event_type", "d", "cents",
        F.sum("cents").over(wtot).alias("tot"),
        F.count("*").over(wtot).alias("n"),
        F.lag("cents").over(wseq).alias("prev_cents"),
        F.lead("cents").over(wseq).alias("next_cents"),
    )
    dev = (10 * F.col("cents") * F.col("n") < 9 * F.col("tot")) | (
        10 * F.col("cents") * F.col("n") > 11 * F.col("tot")
    )
    return w.filter(dev).select(
        "event_type", "d",
        (F.col("cents").cast("double") / 100).alias("revenue"),
        (F.col("tot").cast("double") / (100 * F.col("n"))).alias("daily_avg"),
        (F.col("prev_cents").cast("double") / 100).alias("prev_revenue"),
        (F.col("next_cents").cast("double") / 100).alias("next_revenue"),
    )


# --------------------------------------------------------------- q63 ----
@query(
    "tpcds_q63_monthly_brand_deviation",
    oracle=f"""
    WITH m AS (
      SELECT p.p_brand AS brand, date_trunc('month', l.l_shipdate) AS mon,
             SUM({_CENTS}) AS cents
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate <  TIMESTAMP '1997-01-01'
      GROUP BY 1, 2),
    w AS (SELECT *, SUM(cents) OVER (PARTITION BY brand) AS yr_cents,
                    COUNT(*)   OVER (PARTITION BY brand) AS n_mon
          FROM m)
    SELECT brand, mon, CAST(cents AS DOUBLE) / 100 AS revenue,
           CAST(yr_cents AS DOUBLE) / (100 * n_mon) AS mon_avg
    FROM w
    WHERE 10 * cents * n_mon < 9 * yr_cents
       OR 10 * cents * n_mon > 11 * yr_cents
    ORDER BY brand, mon
    """,
)
def tpcds_q63_monthly_brand_deviation(spark, sf_dir):
    """TPC-DS q63 (q53's deviation DAG at MONTH grain per BRAND, both
    deviation sides; reference query63.sql): one fact pass to
    |brand × month| cents, window over aggregated rows, integer-cents
    two-sided ±10% band."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    m = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.date_trunc("month", "l_shipdate").alias("mon"),
        )
        .agg(F.sum(_cents_col()).alias("cents"))
    )
    w = Window.partitionBy("brand")
    out = (
        m.withColumn("yr_cents", F.sum("cents").over(w))
        .withColumn("n_mon", F.count("*").over(w))
        .filter(
            (10 * F.col("cents") * F.col("n_mon") < 9 * F.col("yr_cents"))
            | (10 * F.col("cents") * F.col("n_mon") > 11 * F.col("yr_cents"))
        )
    )
    return out.select(
        "brand", "mon",
        (F.col("cents").cast("double") / 100).alias("revenue"),
        (F.col("yr_cents").cast("double") / (100 * F.col("n_mon")))
        .alias("mon_avg"),
    ).orderBy("brand", "mon")


# --------------------------------------------------------------- q89 ----
@query(
    "tpcds_q89_series_abs_deviation",
    oracle=f"""
    WITH m AS (
      SELECT p.p_type AS class, p.p_brand AS brand,
             EXTRACT(MONTH FROM l.l_shipdate)::BIGINT AS mon,
             SUM({_CENTS}) AS cents
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE l.l_shipdate >= TIMESTAMP '1995-01-01'
        AND l.l_shipdate <  TIMESTAMP '1996-01-01'
      GROUP BY 1, 2, 3),
    w AS (SELECT *, SUM(cents) OVER (PARTITION BY class, brand) AS tot,
                    COUNT(*)   OVER (PARTITION BY class, brand) AS n
          FROM m)
    SELECT class, brand, mon,
           CAST(cents AS DOUBLE) / 100 AS revenue,
           CAST(tot AS DOUBLE) / (100 * n) AS series_avg
    FROM w
    WHERE ABS(10 * (n * cents - tot)) > tot
    ORDER BY class, brand, mon
    """,
)
def tpcds_q89_series_abs_deviation(spark, sf_dir):
    """TPC-DS q89 (q53's DAG with an ABSOLUTE-deviation filter per
    (class, brand) monthly series; reference query89.sql):
    |rev − avg| / avg > 0.1 expressed as the exact integer test
    |10·(n·cents − Σ)| > Σ — no float average ever materializes."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type", "p_brand")
    m = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_type").alias("class"),
            F.col("p_brand").alias("brand"),
            F.month("l_shipdate").cast("bigint").alias("mon"),
        )
        .agg(F.sum(_cents_col()).alias("cents"))
    )
    w = Window.partitionBy("class", "brand")
    out = (
        m.withColumn("tot", F.sum("cents").over(w))
        .withColumn("n", F.count("*").over(w))
        .filter(
            F.abs(10 * (F.col("n") * F.col("cents") - F.col("tot")))
            > F.col("tot")
        )
    )
    return out.select(
        "class", "brand", "mon",
        (F.col("cents").cast("double") / 100).alias("revenue"),
        (F.col("tot").cast("double") / (100 * F.col("n"))).alias("series_avg"),
    ).orderBy("class", "brand", "mon")


# --------------------------------------------------------------- q68 ----
@query(
    "tpcds_q68_trip_tax_report",
    oracle=f"""
    SELECT c.c_name AS cust_name, o.o_orderkey AS trip,
           {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", "trip_net")},
           {sql_dsum("l.l_extendedprice * l.l_tax", "trip_tax")}
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment IN ('BUILDING', 'HOUSEHOLD')
      AND s.s_nationkey <> c.c_nationkey
      AND o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate <  TIMESTAMP '1996-10-01'
    GROUP BY 1, 2
    HAVING SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS {DEC})) > 50000
    """,
)
def tpcds_q68_trip_tax_report(spark, sf_dir):
    """TPC-DS q68 (q46's cross-nation trip DAG reporting net + tax sums
    per trip with a revenue HAVING floor and the customer name; reference
    query68.sql): the HAVING compares the exact decimal sum so the cut is
    deterministic; dims broadcast, one per-trip shuffle."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net"),
        (F.col("l_extendedprice") * F.col("l_tax")).alias("tax_amt"),
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    ).select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "HOUSEHOLD")
    ).select("c_custkey", "c_name", "c_nationkey")
    return (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(
            F.col("c_name").alias("cust_name"),
            F.col("o_orderkey").alias("trip"),
        )
        .agg(
            F.sum(F.col("net").cast(DEC)).alias("_net_dec"),
            F.sum(F.col("tax_amt").cast(DEC)).alias("_tax_dec"),
        )
        .filter(F.col("_net_dec") > 50000)
        .select(
            "cust_name", "trip",
            F.col("_net_dec").cast("double").alias("trip_net"),
            F.col("_tax_dec").cast("double").alias("trip_tax"),
        )
    )


# --------------------------------------------------------------- q79 ----
@query(
    "tpcds_q79_same_nation_trips",
    oracle=f"""
    SELECT o.o_custkey AS cust, o.o_orderkey AS trip,
           {sql_dsum(
               "l.l_extendedprice * (1 - l.l_discount)"
               " - l.l_extendedprice * l.l_tax",
               "trip_profit")}
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE s.s_nationkey = c.c_nationkey
      AND o.o_orderdate >= TIMESTAMP '1995-10-01'
      AND o.o_orderdate <  TIMESTAMP '1996-01-01'
    GROUP BY 1, 2
    """,
)
def tpcds_q79_same_nation_trips(spark, sf_dir):
    """TPC-DS q79 (q46's trip DAG with the SAME-nation residual — the
    bought-in-home-city variant — and a profit measure; reference
    query79.sql): equality residual instead of inequality, per-trip
    profit = net − tax amounts, decimal-exact."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey",
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
            - F.col("l_extendedprice") * F.col("l_tax")
        ).alias("profit"),
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-10-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
    ).select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    return (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("s_nationkey") == F.col("c_nationkey"))
        .groupBy(
            F.col("o_custkey").alias("cust"),
            F.col("o_orderkey").alias("trip"),
        )
        .agg(dsum("profit", "trip_profit"))
    )


# --------------------------------------------------------------- q73 ----
@query(
    "tpcds_q73_small_basket_buyers",
    oracle="""
    WITH counted AS (
      SELECT l_orderkey, COUNT(*) AS n_lines
      FROM lineitem GROUP BY 1 HAVING COUNT(*) BETWEEN 2 AND 4
    )
    SELECT c.c_custkey, c.c_name, ct.n_lines
    FROM counted ct
    JOIN orders o   ON ct.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus = 'F' AND c.c_mktsegment = 'FURNITURE'
    """,
)
def tpcds_q73_small_basket_buyers(spark, sf_dir):
    """TPC-DS q73 (q34's basket-band DAG with the SMALL 2–4 band plus
    status and demographic filters; reference query73.sql): the HAVING
    reduces the fact before customer is touched; both dims broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "FURNITURE"
    ).select("c_custkey", "c_name")
    counted = (
        li.groupBy("l_orderkey")
        .agg(F.count("*").alias("n_lines"))
        .filter(F.col("n_lines").between(2, 4))
    )
    return (
        counted.join(o, counted.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "n_lines")
    )


# --------------------------------------------------------------- q80 ----
@query(
    "tpcds_q80_windowed_channel_rollup",
    oracle=f"""
    WITH unified AS (
      SELECT 'store' AS channel, date_trunc('month', l_shipdate) AS mon,
             CAST(l_extendedprice * (1 - l_discount) AS {DEC}) AS sales,
             CASE WHEN l_returnflag = 'R'
                  THEN CAST(l_extendedprice AS {DEC}) ELSE CAST(0 AS {DEC})
             END AS returns
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-08-01'
        AND l_shipdate <  TIMESTAMP '1995-11-01'
      UNION ALL
      SELECT 'web', date_trunc('month', ts),
             CAST(value AS {DEC}),
             CASE WHEN event_type = 'error' THEN CAST(value AS {DEC})
                  ELSE CAST(0 AS {DEC}) END
      FROM events
    )
    SELECT channel, mon,
           CAST(GROUPING(channel) AS INT) AS g_channel,
           CAST(GROUPING(mon) AS INT) AS g_mon,
           CAST(SUM(sales) AS DOUBLE) AS total_sales,
           CAST(SUM(returns) AS DOUBLE) AS total_returns,
           CAST(SUM(sales - returns) AS DOUBLE) AS profit
    FROM unified
    GROUP BY ROLLUP(channel, mon)
    """,
)
def tpcds_q80_windowed_channel_rollup(spark, sf_dir):
    """TPC-DS q80 (q5/q77's unified-channel rollup with a DATE WINDOW on
    the store fact and a (channel, month) ROLLUP; reference query80.sql):
    each fact maps to the unified schema before one rollup pass."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-08-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1995-11-01").cast("timestamp_ntz"))
    )
    ev = load_table(spark, sf_dir, "events")
    store = li.select(
        F.lit("store").alias("channel"),
        F.date_trunc("month", "l_shipdate").alias("mon"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast(DEC).alias("sales"),
        F.when(F.col("l_returnflag") == "R",
               F.col("l_extendedprice").cast(DEC))
        .otherwise(F.lit(0).cast(DEC)).alias("returns"),
    )
    web = ev.select(
        F.lit("web").alias("channel"),
        F.date_trunc("month", "ts").alias("mon"),
        F.col("value").cast(DEC).alias("sales"),
        F.when(F.col("event_type") == "error", F.col("value").cast(DEC))
        .otherwise(F.lit(0).cast(DEC)).alias("returns"),
    )
    return (
        store.unionAll(web)
        .rollup("channel", "mon")
        .agg(
            F.grouping("channel").cast("int").alias("g_channel"),
            F.grouping("mon").cast("int").alias("g_mon"),
            F.sum("sales").cast("double").alias("total_sales"),
            F.sum("returns").cast("double").alias("total_returns"),
            F.sum(F.col("sales") - F.col("returns"))
            .cast("double").alias("profit"),
        )
    )


# --------------------------------------------------------------- q81 ----
@query(
    "tpcds_q81_nation_return_outliers",
    oracle=f"""
    WITH r AS (
      SELECT e.user_id AS cust, c.c_nationkey AS nk,
             {sql_dsum("e.value", "ret_total")}
      FROM events e JOIN customer c ON e.user_id = c.c_custkey
      WHERE e.event_type = 'error'
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
def tpcds_q81_nation_return_outliers(spark, sf_dir):
    """TPC-DS q81 (q30's outlier DAG on the WEB channel — events 'error'
    values as the returns fact; reference query81.sql): the correlated
    per-nation average decorrelates into a second aggregate over the
    already-aggregated per-customer rows plus broadcast joins back."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "error"
    ).select("user_id", "value")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    r = (
        ev.join(F.broadcast(c), ev.user_id == c.c_custkey)
        .groupBy(F.col("user_id").alias("cust"),
                 F.col("c_nationkey").alias("nk"))
        .agg(dsum("value", "ret_total"))
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


# --------------------------------------------------------------- q82 ----
@query(
    "tpcds_q82_store_inventory_instock",
    oracle=_INV_SQL + """
    SELECT p.p_partkey AS i_item, p.p_name AS i_name,
           CAST(p.p_retailprice AS DOUBLE) AS i_price
    FROM part p
    JOIN inv ON inv.inv_item = p.p_partkey
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_retailprice BETWEEN 905 AND 925
      AND inv.inv_date BETWEEN TIMESTAMP '1995-06-01'
                           AND TIMESTAMP '1995-07-31'
      AND inv.inv_qty BETWEEN 20 AND 60
      AND l.l_quantity > 25
    GROUP BY 1, 2, 3
    ORDER BY i_item
    LIMIT 100
    """,
)
def tpcds_q82_store_inventory_instock(spark, sf_dir):
    """TPC-DS q82 (q37's in-stock DAG on the STORE channel with its own
    price band, 60-day window, and quantity floor; reference
    query82.sql): LEFT SEMI probes replace the literal SQL's GROUP BY
    dedup — the dim is reduced by both probes without materializing
    duplicates."""
    inv = _inventory(spark).filter(
        F.col("inv_date").between(
            F.lit("1995-06-01").cast("timestamp_ntz"),
            F.lit("1995-07-31").cast("timestamp_ntz"),
        )
        & F.col("inv_qty").between(20, 60)
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity") > 25
    ).select("l_partkey")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_retailprice").between(905, 925)
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


# --------------------------------------------------------------- q83 ----
@query(
    "tpcds_q83_returned_parts_intersect",
    oracle="""
    WITH w1 AS (SELECT DISTINCT l_partkey FROM lineitem
                WHERE l_returnflag = 'R'
                  AND l_shipdate >= TIMESTAMP '1995-03-01'
                  AND l_shipdate <  TIMESTAMP '1995-04-01'),
    w2 AS (SELECT DISTINCT l_partkey FROM lineitem
           WHERE l_returnflag = 'R'
             AND l_shipdate >= TIMESTAMP '1995-06-01'
             AND l_shipdate <  TIMESTAMP '1995-07-01'),
    w3 AS (SELECT DISTINCT l_partkey FROM lineitem
           WHERE l_returnflag = 'R'
             AND l_shipdate >= TIMESTAMP '1995-09-01'
             AND l_shipdate <  TIMESTAMP '1995-10-01'),
    common AS (
      SELECT l_partkey FROM w1
      INTERSECT SELECT l_partkey FROM w2
      INTERSECT SELECT l_partkey FROM w3)
    SELECT p.p_name AS item_name,
           CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS ret_qty
    FROM lineitem l
    JOIN common cm ON l.l_partkey = cm.l_partkey
    JOIN part p    ON p.p_partkey = l.l_partkey
    WHERE l.l_returnflag = 'R'
      AND l.l_shipdate >= TIMESTAMP '1995-03-01'
      AND l.l_shipdate <  TIMESTAMP '1995-10-01'
    GROUP BY 1
    """,
)
def tpcds_q83_returned_parts_intersect(spark, sf_dir):
    """TPC-DS q83 (q38's INTERSECT DAG keyed on ITEM — parts returned in
    all three month windows, reporting their season return quantity;
    reference query83.sql): each window reduces to a distinct key set
    before the set ops; the final pass is a LEFT SEMI against the tiny
    common set."""
    li = load_table(spark, sf_dir, "lineitem")
    ret = li.filter(F.col("l_returnflag") == "R")

    def window(lo: str, hi: str):
        return ret.filter(
            (F.col("l_shipdate") >= F.lit(lo).cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit(hi).cast("timestamp_ntz"))
        ).select("l_partkey").distinct()

    common = (
        window("1995-03-01", "1995-04-01")
        .intersect(window("1995-06-01", "1995-07-01"))
        .intersect(window("1995-09-01", "1995-10-01"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    season = ret.filter(
        (F.col("l_shipdate") >= F.lit("1995-03-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1995-10-01").cast("timestamp_ntz"))
    )
    return (
        season.join(F.broadcast(common), "l_partkey", "left_semi")
        .join(F.broadcast(p), season.l_partkey == p.p_partkey)
        .groupBy(F.col("p_name").alias("item_name"))
        .agg(
            F.sum(F.col("l_quantity").cast("bigint"))
            .cast("bigint").alias("ret_qty")
        )
    )


# --------------------------------------------------------------- q85 ----
@query(
    "tpcds_q85_returns_band_disjunction",
    oracle=f"""
    SELECT o.o_orderpriority AS priority,
           {sql_davg("l.l_quantity", "avg_qty")},
           {sql_davg("l.l_extendedprice * (1 - l.l_discount)", "avg_refund")},
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE l.l_returnflag = 'R'
      AND ((c.c_mktsegment = 'BUILDING'
              AND l.l_quantity BETWEEN 1 AND 20
              AND c.c_acctbal BETWEEN -1000 AND 3000)
        OR (c.c_mktsegment = 'MACHINERY'
              AND l.l_quantity BETWEEN 21 AND 35
              AND c.c_acctbal BETWEEN 2000 AND 6000)
        OR (c.c_mktsegment = 'HOUSEHOLD'
              AND l.l_quantity BETWEEN 36 AND 50
              AND c.c_acctbal BETWEEN 5000 AND 10000))
    GROUP BY 1
    """,
)
def tpcds_q85_returns_band_disjunction(spark, sf_dir):
    """TPC-DS q85 (q13's band-disjunction DAG over the RETURNS slice,
    grouped by reason — order priority here; reference query85.sql): the
    OR of conjunctive (segment × quantity × balance) bands stays one
    codegen'd filter; averages follow the decimal discipline."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    seg, qty, bal = (
        F.col("c_mktsegment"), F.col("l_quantity"), F.col("c_acctbal")
    )
    cond = (
        ((seg == "BUILDING") & qty.between(1, 20) & bal.between(-1000, 3000))
        | ((seg == "MACHINERY") & qty.between(21, 35) & bal.between(2000, 6000))
        | ((seg == "HOUSEHOLD") & qty.between(36, 50) & bal.between(5000, 10000))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .filter(cond)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            davg("l_quantity", "avg_qty"),
            davg(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "avg_refund",
            ),
            F.count("*").alias("n"),
        )
    )


# --------------------------------------------------------------- q86 ----
@query(
    "tpcds_q86_event_rollup_rank",
    oracle=f"""
    WITH base AS (
      SELECT event_type AS etype,
             CASE WHEN EXTRACT(HOUR FROM ts) < 12 THEN 'AM' ELSE 'PM' END
               AS halfday,
             CAST(value AS {DEC}) AS v
      FROM events),
    agg AS (
      SELECT etype, halfday,
             GROUPING(etype) + GROUPING(halfday) AS lochierarchy,
             CAST(SUM(v) AS DOUBLE) AS total_value
      FROM base GROUP BY ROLLUP(etype, halfday))
    SELECT etype, halfday, lochierarchy, total_value,
           RANK() OVER (PARTITION BY lochierarchy,
                          CASE WHEN lochierarchy = 0 THEN etype END
                        ORDER BY total_value DESC,
                                 COALESCE(halfday, ''), COALESCE(etype, ''))
             ::BIGINT AS rank_within_parent
    FROM agg
    """,
)
def tpcds_q86_event_rollup_rank(spark, sf_dir):
    """TPC-DS q86 (q36's rollup-and-rank DAG on the WEB fact — events
    rolled up over (type, half-day) with RANK within parent; reference
    query86.sql): the rank window sees only |groups| rows; decimal sums
    make the ordering deterministic."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("etype"),
        F.when(F.hour("ts") < 12, "AM").otherwise("PM").alias("halfday"),
        F.col("value").cast(DEC).alias("v"),
    )
    agg = (
        ev.rollup("etype", "halfday")
        .agg(
            (F.grouping("etype") + F.grouping("halfday"))
            .cast("bigint").alias("lochierarchy"),
            F.sum("v").cast("double").alias("total_value"),
        )
    )
    w = Window.partitionBy(
        "lochierarchy",
        F.when(F.col("lochierarchy") == 0, F.col("etype")),
    ).orderBy(
        F.desc("total_value"),
        F.coalesce("halfday", F.lit("")),
        F.coalesce("etype", F.lit("")),
    )
    return agg.select(
        "etype", "halfday", "lochierarchy", "total_value",
        F.rank().over(w).cast("bigint").alias("rank_within_parent"),
    )


# --------------------------------------------------------------- q91 ----
@query(
    "tpcds_q91_nation_return_losses",
    oracle=f"""
    SELECT n.n_name AS nation,
           {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", "returns_loss")},
           CAST(COUNT(*) AS BIGINT) AS n_returns
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND c.c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
      AND o.o_orderpriority = '1-URGENT'
    GROUP BY 1
    """,
)
def tpcds_q91_nation_return_losses(spark, sf_dir):
    """TPC-DS q91 (q26's demographic star over the RETURNS slice, rolled
    up to the call-center analog — the supplier nation; reference
    query91.sql): every dim broadcasts; the single shuffle is the nation
    aggregation over the filtered fact."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("AUTOMOBILE", "BUILDING")
    ).select("c_custkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "returns_loss",
            ),
            F.count("*").alias("n_returns"),
        )
    )


# --------------------------------------------------------------- q99 ----
@query(
    "tpcds_q99_nation_latency_bands",
    oracle="""
    SELECT n_name AS nation,
           COUNT(*) FILTER (lag_days <= 30) AS d30,
           COUNT(*) FILTER (lag_days > 30 AND lag_days <= 60) AS d60,
           COUNT(*) FILTER (lag_days > 60 AND lag_days <= 90) AS d90,
           COUNT(*) FILTER (lag_days > 90 AND lag_days <= 120) AS d120,
           COUNT(*) FILTER (lag_days > 120) AS dmore
    FROM (SELECT l_suppkey,
                 date_diff('day', o_orderdate, l_shipdate) AS lag_days
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey) t
    JOIN supplier s ON t.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    GROUP BY 1
    """,
)
def tpcds_q99_nation_latency_bands(spark, sf_dir):
    """TPC-DS q99 (q62's latency-band pivot keyed on the warehouse analog
    — the supplier nation; reference query99.sql): one fact-fact join on
    the natural key, broadcast dims, conditional counts in a single
    aggregation pass."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    t = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.datediff("l_shipdate", "o_orderdate").alias("lag_days"),
        )
    )
    d = F.col("lag_days")
    return t.groupBy("nation").agg(
        F.sum((d <= 30).cast("bigint")).alias("d30"),
        F.sum(((d > 30) & (d <= 60)).cast("bigint")).alias("d60"),
        F.sum(((d > 60) & (d <= 90)).cast("bigint")).alias("d90"),
        F.sum(((d > 90) & (d <= 120)).cast("bigint")).alias("d120"),
        F.sum((d > 120).cast("bigint")).alias("dmore"),
    )
