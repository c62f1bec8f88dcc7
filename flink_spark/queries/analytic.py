"""Over-window (analytic) operator coverage: all frame shapes, ranking
functions, top-n, deduplication, sort/limit (SURVEY §2.6-2.8).

Doubles inside running aggregates are cast to DECIMAL pre-sum so window
partial results are exact and order-independent (same discipline as
queries.util)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from flink_spark.operators.rank import dedup_keep_first, dedup_keep_last, top_n
from flink_spark.queries.registry import query
from flink_spark.queries.util import DEC
from flink_spark.sources.tables import load_table, register_views


@query(
    "over_rank_suite",
    oracle="""
    SELECT s_nationkey, s_suppkey, s_acctbal,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
    """,
)
def over_rank_suite(spark, sf_dir):
    """ROW_NUMBER/RANK/DENSE_RANK (reference RowNumberAggFunction etc.)."""
    su = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"), "s_suppkey")
    return su.select(
        "s_nationkey",
        "s_suppkey",
        "s_acctbal",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@query(
    "over_running_rows_frame",
    oracle=f"""
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(value AS {DEC})) OVER
                (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_sum,
           COUNT(*) OVER
                (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_cnt
    FROM events WHERE user_id <= 50
    """,
)
def over_running_rows_frame(spark, sf_dir):
    """ROWS UNBOUNDED PRECEDING running aggregate (reference
    RowTimeRowsUnboundedPrecedingFunction family)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 50)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.col("value").cast(DEC)).over(w).cast("double").alias("running_sum"),
        F.count("*").over(w).alias("running_cnt"),
    )


@query(
    "over_sliding_rows_frame",
    oracle=f"""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS {DEC})) OVER
                (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum3,
           CAST(SUM(CAST(value AS {DEC})) OVER
                (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 1 FOLLOWING AND 2 FOLLOWING) AS DOUBLE) AS sum_ahead
    FROM events WHERE user_id <= 50
    """,
)
def over_sliding_rows_frame(spark, sf_dir):
    """Bounded sliding ROWS frames, preceding and following (reference
    over/frame/SlidingOverFrame.java family — all 12 frame shapes map to
    rowsBetween/rangeBetween)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 50)
    base = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w3 = base.rowsBetween(-2, 0)
    wa = base.rowsBetween(1, 2)
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast(DEC)).over(w3).cast("double").alias("sum3"),
        F.sum(F.col("value").cast(DEC)).over(wa).cast("double").alias("sum_ahead"),
    )


@query(
    "over_range_interval_frame",
    oracle=f"""
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(value AS {DEC})) OVER
                (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS sum_10m,
           COUNT(*) OVER
                (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING AND CURRENT ROW)
             AS cnt_10m
    FROM events WHERE user_id <= 50
    """,
)
def over_range_interval_frame(spark, sf_dir):
    """RANGE frame over event time — the Flink streaming over-agg shape
    (reference RowTimeRangeBoundedPrecedingFunction.java:56) as a batch
    range frame; SQL surface since the DataFrame API's rangeBetween only
    takes numeric offsets."""
    register_views(spark, sf_dir, "events")
    return spark.sql(
        f"""
        SELECT event_id, user_id, ts,
               CAST(SUM(CAST(value AS {DEC})) OVER
                    (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING AND CURRENT ROW)
                    AS DOUBLE) AS sum_10m,
               COUNT(*) OVER
                    (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING AND CURRENT ROW)
                 AS cnt_10m
        FROM events WHERE user_id <= 50
        """
    )


@query(
    "over_lead_lag_first_last",
    oracle="""
    SELECT event_id, user_id,
           LAG(event_type) OVER w AS prev_type,
           LEAD(event_type) OVER w AS next_type,
           LAG(event_type, 2, 'none') OVER w AS prev2_type,
           FIRST_VALUE(event_type) OVER w AS first_type,
           LAST_VALUE(event_type) OVER
             (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_type,
           NTH_VALUE(event_type, 2) OVER
             (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS second_type
    FROM events WHERE user_id <= 30
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def over_lead_lag_first_last(spark, sf_dir):
    """LEAD/LAG/FIRST_VALUE/LAST_VALUE/NTH_VALUE (reference
    LeadLagAggFunction, FirstValue/LastValue aggregates)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 30)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "event_id",
        "user_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        F.lag("event_type", 2, "none").over(w).alias("prev2_type"),
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(wfull).alias("last_type"),
        F.nth_value("event_type", 2).over(wfull).alias("second_type"),
    )


@query(
    "over_ntile_cume_percent",
    oracle="""
    SELECT c_custkey,
           NTILE(4) OVER w AS quartile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def over_ntile_cume_percent(spark, sf_dir):
    """NTILE/PERCENT_RANK/CUME_DIST (reference NTILEAggFunction,
    PercentRankAggFunction, CumeDistAggFunction). The doubles are
    (rank-1)/(n-1) style exact small-int divisions — identical IEEE."""
    cu = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return cu.select(
        "c_custkey",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@query(
    "topn_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
)
def topn_per_group(spark, sf_dir):
    """Top-N per key (reference StreamExecRank.java:93 / BatchExecRank).
    Catalyst inserts WindowGroupLimit: each partition keeps ≤N rows before
    the shuffle — the property that makes this safe at 100 TB."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    return top_n(
        o, ["o_custkey"], [F.desc("o_totalprice"), F.asc("o_orderkey")], 3
    )


@query(
    "dedup_keep_first",
    oracle="""
    SELECT user_id, event_type, event_id, ts FROM (
      SELECT user_id, event_type, event_id, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events) t
    WHERE rn = 1
    """,
)
def dedup_first(spark, sf_dir):
    """Deduplicate keep-first by event time (reference
    StreamExecDeduplicate.java:94, KeepFirstRow strategy)."""
    ev = load_table(spark, sf_dir, "events")
    return dedup_keep_first(
        ev, ["user_id", "event_type"], "ts", tiebreak=["event_id"]
    ).select("user_id", "event_type", "event_id", "ts")


@query(
    "dedup_keep_last",
    oracle="""
    SELECT user_id, event_type, event_id, ts FROM (
      SELECT user_id, event_type, event_id, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) t
    WHERE rn = 1
    """,
)
def dedup_last(spark, sf_dir):
    """Deduplicate keep-last (reference KeepLastRow strategy — the batch
    projection of changelog upsert materialization)."""
    ev = load_table(spark, sf_dir, "events")
    return dedup_keep_last(
        ev, ["user_id", "event_type"], "ts", tiebreak=["event_id"]
    ).select("user_id", "event_type", "event_id", "ts")


@query(
    "sort_limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 15 OFFSET 10
    """,
)
def sort_limit_offset(spark, sf_dir):
    """Global sort + LIMIT/OFFSET (reference BatchExecSortLimit.java:65 —
    same top-(offset+limit) then drop-offset strategy)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .offset(10)
        .limit(15)
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "lateral_topk_per_nation",
    oracle="""
    SELECT n.n_name, c.c_custkey, c.c_acctbal
    FROM nation n, LATERAL (
      SELECT c_custkey, c_acctbal FROM customer
      WHERE c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c
    """,
)
def lateral_topk_per_nation(spark, sf_dir):
    """LATERAL correlated top-k (reference StreamExecCorrelate) — lowered to
    the equivalent window top-n + broadcast dim join."""
    na = load_table(spark, sf_dir, "nation")
    cu = load_table(spark, sf_dir, "customer")
    top2 = top_n(
        cu, ["c_nationkey"], [F.desc("c_acctbal"), F.asc("c_custkey")], 2,
        keep_rank=False,
    )
    return top2.join(F.broadcast(na), top2.c_nationkey == na.n_nationkey).select(
        "n_name", "c_custkey", "c_acctbal"
    )


@query(
    "topn_variable_rank_range",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 1 + o_custkey % 3
    """,
)
def topn_variable_rank_range(spark, sf_dir):
    """Variable rank range (reference VariableRankRange.java — the TopN
    where N comes from a per-key expression): rank filtered against a
    key-derived limit. Catalyst still inserts WindowGroupLimit for the
    max possible N when constant; for a variable bound the window runs
    full and the filter prunes — same as Flink's variable-range path."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 1 + F.col("o_custkey") % 3)
    )
