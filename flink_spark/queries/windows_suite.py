"""Window TVF + time-join operator coverage over the events table
(SURVEY §2.5, §2.3 streaming rows) — batch-mode semantics of the streaming
operators, value-checked against DuckDB.

The same flink_spark.operators implementations run unchanged on streaming
DataFrames (watermark-driven emission); tests/test_streaming.py exercises
that path. Here the batch projection is verified value-exact.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from flink_spark.operators import windows as W
from flink_spark.operators.joins import asof_join, interval_join
from flink_spark.queries.registry import query
from flink_spark.queries.util import DEC, dsum
from flink_spark.sources.tables import load_table

# DuckDB time_bucket origin for sub-day widths is 2000-01-03 00:00 (Monday);
# Spark windows align to the unix epoch 1970-01-01 (Thursday). Both are
# midnight-aligned, so buckets agree for widths that divide 24h; for the
# 4-hour hop step they also agree (both origins are midnight). Oracles below
# use time_bucket only for day-dividing widths.


@query(
    "window_tumble",
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS {DEC})) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def window_tumble(spark, sf_dir):
    """TUMBLE TVF (reference SqlTumbleTableFunction, WindowAggOperator.java:96)
    → native F.window; on a stream the same groupBy emits on window close."""
    ev = load_table(spark, sf_dir, "events")
    return (
        W.tumble(ev, "ts", "1 hour")
        .groupBy("window_start", "window_end", "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value", "sum_value"))
    )


@query(
    "window_hop",
    oracle=f"""
    WITH k AS (SELECT unnest([0, 1]) AS i)
    SELECT time_bucket(INTERVAL '30 minutes', ts) - i * INTERVAL '30 minutes'
             AS window_start,
           time_bucket(INTERVAL '30 minutes', ts) - i * INTERVAL '30 minutes'
             + INTERVAL '1 hour' AS window_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS {DEC})) AS DOUBLE) AS sum_value
    FROM events CROSS JOIN k
    GROUP BY 1, 2
    """,
)
def window_hop(spark, sf_dir):
    """HOP TVF (reference SqlHopTableFunction; slice sharing in
    SliceAssigners.java) → F.window(ts, size, slide); the oracle expands the
    size/slide=2 window memberships explicitly."""
    ev = load_table(spark, sf_dir, "events")
    return (
        W.hop(ev, "ts", slide="30 minutes", size="1 hour")
        .groupBy("window_start", "window_end")
        .agg(F.count("*").alias("n_events"), dsum("value", "sum_value"))
    )


@query(
    "window_cumulate",
    oracle=f"""
    WITH base AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, ts, value FROM events
    ), k AS (SELECT unnest([1, 2, 3, 4]) AS i)
    SELECT ws AS window_start,
           ws + i * INTERVAL '15 minutes' AS window_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS {DEC})) AS DOUBLE) AS sum_value
    FROM base CROSS JOIN k
    WHERE ts < ws + i * INTERVAL '15 minutes'
    GROUP BY 1, 2
    """,
)
def window_cumulate(spark, sf_dir):
    """CUMULATE TVF (reference SqlCumulateTableFunction — no Spark builtin):
    lowered to sequence+explode of expanding window ends (operators.windows).
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        W.cumulate(ev, "ts", step="15 minutes", size="1 hour")
        .groupBy("window_start", "window_end")
        .agg(F.count("*").alias("n_events"), dsum("value", "sum_value"))
    )


@query(
    "window_session",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL '30 minutes'
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events WHERE user_id <= 100
    ), numbered AS (
      SELECT *, SUM(new_session) OVER
                (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS {DEC})) AS DOUBLE) AS sum_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def window_session(spark, sf_dir):
    """SESSION TVF (reference SqlSessionTableFunction; merging assigner in
    .../groupwindow/assigners/) → native F.session_window (gap-merged;
    session end = last event + gap). Oracle = gaps-and-islands SQL."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 100)
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"), dsum("value", "sum_value"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "window_topn",
    oracle=f"""
    WITH agg AS (
      SELECT time_bucket(INTERVAL '6 hours', ts) AS window_start, user_id,
             CAST(SUM(CAST(value AS {DEC})) AS DOUBLE) AS user_sum
      FROM events GROUP BY 1, 2
    )
    SELECT window_start, user_id, user_sum, rn FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY window_start
                                   ORDER BY user_sum DESC, user_id) AS rn
      FROM agg) t
    WHERE rn <= 3
    """,
)
def window_topn(spark, sf_dir):
    """Window Top-N (reference StreamExecWindowRank.java:77): rank within
    each closed window. 6-hour tumble → top-3 users by summed value."""
    ev = load_table(spark, sf_dir, "events")
    agg = (
        W.tumble(ev, "ts", "6 hours")
        .groupBy("window_start", "user_id")
        .agg(dsum("value", "user_sum"))
    )
    w = Window.partitionBy("window_start").orderBy(F.desc("user_sum"), "user_id")
    return agg.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)


@query(
    "window_dedup",
    oracle="""
    SELECT window_start, user_id, event_id, ts FROM (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, user_id,
             event_id, ts,
             ROW_NUMBER() OVER (PARTITION BY time_bucket(INTERVAL '1 hour', ts),
                                             user_id
                                ORDER BY ts, event_id) AS rn
      FROM events) t
    WHERE rn = 1
    """,
)
def window_dedup(spark, sf_dir):
    """Window deduplication (reference StreamExecWindowDeduplicate.java:69):
    first row per key per window."""
    ev = load_table(spark, sf_dir, "events")
    t = W.tumble(ev, "ts", "1 hour")
    w = Window.partitionBy("window_start", "user_id").orderBy("ts", "event_id")
    return (
        t.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("window_start", "user_id", "event_id", "ts")
    )


@query(
    "interval_join_events",
    oracle="""
    SELECT c.event_id AS click_id, p.event_id AS purchase_id,
           c.user_id, c.ts AS click_ts, p.ts AS purchase_ts
    FROM events c
    JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL '30 minutes'
    """,
)
def interval_join_events(spark, sf_dir):
    """Interval join (reference StreamExecIntervalJoin.java:86 /
    TimeIntervalJoin.java:53): clicks matched to purchases within
    [ts, ts+30m] per user. Equi-key drives the shuffle; the band is a
    residual predicate (and, in streaming, the state-cleanup bound)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    joined = interval_join(
        clicks,
        purchases,
        keys=[("user_id", "p_user_id")],
        left_ts="click_ts",
        right_ts="purchase_ts",
        lower="0 seconds",
        upper="30 minutes",
    )
    return joined.select("click_id", "purchase_id", "user_id", "click_ts", "purchase_ts")


@query(
    "asof_join_events",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts,
           c.ts AS ts_r, c.event_id AS click_event_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def asof_join_events(spark, sf_dir):
    """As-of / temporal join (reference StreamExecTemporalJoin.java:77,
    TemporalRowTimeJoinOperator.java:84 — FOR SYSTEM_TIME AS OF): each
    purchase joined to the latest prior click per user. Implemented as
    union-tag + ordered last_value fill (one shuffle, no range explosion);
    oracle = DuckDB's native ASOF JOIN."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_event_id")
    )
    out = asof_join(
        purchases, clicks, key="user_id", left_ts="ts", right_ts="ts",
        right_cols=["click_event_id"],
    )
    return out.select("event_id", "user_id", "ts", "ts_r", "click_event_id")


@query(
    "temporal_table_function_sql",
    oracle="""
    WITH v AS (SELECT o_custkey AS ck, CAST(o_orderdate AS TIMESTAMP) AS vts,
                      CAST(MAX(o_totalprice) AS DOUBLE) AS price
               FROM orders WHERE o_custkey <= 200
               GROUP BY o_custkey, o_orderdate),
         p AS (SELECT c_custkey AS ck, CAST(d AS TIMESTAMP) AS pts
               FROM customer,
                    (VALUES (DATE '1995-06-01'), (DATE '1997-01-01'))
                      AS t(d)
               WHERE c_custkey <= 200),
         j AS (SELECT p.ck, p.pts,
                      (SELECT v.price FROM v
                       WHERE v.ck = p.ck AND v.vts <= p.pts
                       ORDER BY v.vts DESC LIMIT 1) AS price
               FROM p)
    SELECT ck, pts, price FROM j WHERE price IS NOT NULL
    """,
)
def temporal_table_function_sql(spark, sf_dir):
    """Temporal table FUNCTION (reference TemporalTableFunction.java,
    `createTemporalTableFunction` + the `LATERAL TABLE (Rates(o.ts))`
    SQL spelling; lowered through the same as-of machinery as FOR
    SYSTEM_TIME AS OF): each probe row resolves against the version in
    effect at its timestamp, and — INNER correlate, the reference's
    comma/cross-apply semantics — probes with no preceding version emit
    nothing. Versions are per-(customer, order-date) maxima so the
    winner is deterministic; the oracle replays
    argmax-by-version-time."""
    from flink_spark.catalog import TableEnvironment

    env = TableEnvironment(spark)
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 200)
    o.groupBy("o_custkey", "o_orderdate").agg(
        F.max("o_totalprice").alias("p0")
    ).selectExpr(
        "o_custkey AS ck",
        "CAST(o_orderdate AS TIMESTAMP_NTZ) AS vts",
        "CAST(p0 AS DOUBLE) AS price",
    ).createOrReplaceTempView("__ttf_versions")
    env.create_temporal_table_function("CustRates", "__ttf_versions",
                                       "vts", "ck")
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") <= 200
    )
    c.selectExpr("c_custkey AS ck").crossJoin(
        spark.sql(
            "SELECT CAST(d AS TIMESTAMP_NTZ) AS pts FROM "
            "VALUES (DATE '1995-06-01'), (DATE '1997-01-01') AS t(d)"
        )
    ).createOrReplaceTempView("__ttf_probes")
    return env.execute_sql("""
        SELECT p.ck, p.pts, r.price
        FROM __ttf_probes AS p,
        LATERAL TABLE (CustRates(p.pts)) AS r
        WHERE p.ck = r.ck
    """)


@query(
    "window_join_events",
    oracle="""
    WITH c AS (SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS window_start,
                      event_id AS click_id
               FROM events WHERE event_type = 'click' AND user_id <= 300),
         p AS (SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS window_start,
                      event_id AS purchase_id
               FROM events WHERE event_type = 'purchase' AND user_id <= 300)
    SELECT c.user_id, c.window_start,
           c.window_start + INTERVAL '1 hour' AS window_end,
           c.click_id, p.purchase_id
    FROM c JOIN p USING (user_id, window_start)
    """,
)
def window_join_events(spark, sf_dir):
    """Window join (reference StreamExecWindowJoin.java:70,
    WindowJoinOperator.java:57): clicks × purchases by the same user inside
    the same 1-hour tumble. The window becomes part of the equi-join key —
    one shuffle, and bounded state on streams."""
    from flink_spark.operators.joins import window_join

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 300)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"), F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    joined = window_join(
        clicks, purchases, "ts", "p_ts", "1 hour",
        keys=[("user_id", "p_user_id")],
    )
    return joined.select(
        "user_id", "window_start", "window_end", "click_id", "purchase_id"
    )


@query(
    "window_count_tumble",
    oracle=f"""
    WITH numbered AS (
      SELECT user_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events WHERE user_id <= 100)
    SELECT user_id, CAST((rn - 1) // 10 AS BIGINT) AS window_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS {DEC})) AS DOUBLE) AS sum_value
    FROM numbered GROUP BY 1, 2
    """,
)
def window_count_tumble(spark, sf_dir):
    """COUNT(10) tumbling window per user (reference
    CountTumblingWindowAssigner.java, ElementTriggers.CountElement):
    every 10th event per key closes a window."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 100)
    win = W.count_window(
        ev.select("user_id", "ts", "event_id", "value"),
        key_cols=["user_id"], order_cols=["ts", "event_id"], size=10,
    )
    return win.groupBy("user_id", "window_id").agg(
        F.count("*").alias("n_events"), dsum("value", "sum_value")
    )


@query(
    "window_tumble_offset",
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 hour', ts, TIMESTAMP '1970-01-01 00:15:00')
             AS window_start,
           time_bucket(INTERVAL '1 hour', ts, TIMESTAMP '1970-01-01 00:15:00')
             + INTERVAL '1 hour' AS window_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS {DEC})) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def window_tumble_offset(spark, sf_dir):
    """TUMBLE with a 15-minute alignment offset (reference window TVF
    `offset` argument; Spark `window(..., startTime)` ↔ DuckDB
    `time_bucket(..., origin)`)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        W.tumble_offset(ev, "ts", "1 hour", "15 minutes")
        .groupBy("window_start", "window_end")
        .agg(F.count("*").alias("n_events"), dsum("value", "sum_value"))
    )


@query(
    "session_window_join",
    oracle="""
    WITH base AS (
      SELECT user_id, event_type, ts,
             CASE WHEN ts - LAG(ts) OVER w > INTERVAL '30 minutes'
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
      FROM events
      WHERE user_id <= 100 AND event_type IN ('click', 'error')
      WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts)),
    numbered AS (
      SELECT *, SUM(new_s) OVER (PARTITION BY user_id, event_type ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM base),
    sessions AS (
      SELECT user_id, event_type, sid,
             MIN(ts) AS s_start, MAX(ts) + INTERVAL '30 minutes' AS s_end,
             COUNT(*) AS n
      FROM numbered GROUP BY user_id, event_type, sid)
    SELECT c.user_id,
           c.s_start AS click_start, c.s_end AS click_end, c.n AS n_clicks,
           e.s_start AS error_start, e.s_end AS error_end, e.n AS n_errors
    FROM sessions c JOIN sessions e
      ON c.user_id = e.user_id
     AND c.event_type = 'click' AND e.event_type = 'error'
     AND c.s_start < e.s_end AND e.s_start < c.s_end
    """,
)
def session_window_join(spark, sf_dir):
    """Session-window join (reference window join over SESSION windows —
    the one window-join shape with merging windows): both event types are
    sessionized per user (30-minute gaps) and sessions that OVERLAP in
    time are paired — an interval-overlap theta join over the two tiny
    sessionized tables, so the expensive part (sessionization) stays a
    keyed aggregation and only session-level rows reach the join."""
    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("user_id") <= 100) & F.col("event_type").isin("click", "error")
    )
    sessions = (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id", "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            "user_id", "event_type",
            F.col("session_window.start").alias("s_start"),
            F.col("session_window.end").alias("s_end"),
            "n",
        )
    )
    c = sessions.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("s_start").alias("click_start"), F.col("s_end").alias("click_end"),
        F.col("n").alias("n_clicks"),
    )
    e = sessions.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user_id"),
        F.col("s_start").alias("error_start"), F.col("s_end").alias("error_end"),
        F.col("n").alias("n_errors"),
    )
    return (
        c.join(
            e,
            (F.col("user_id") == F.col("e_user_id"))
            & (F.col("click_start") < F.col("error_end"))
            & (F.col("error_start") < F.col("click_end")),
        )
        .select(
            "user_id", "click_start", "click_end", "n_clicks",
            "error_start", "error_end", "n_errors",
        )
    )


@query(
    "window_time_evictor",
    oracle=f"""
    WITH w AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, ts, value
      FROM events),
    m AS (
      SELECT *, MAX(ts) OVER (PARTITION BY window_start) AS wmax FROM w)
    SELECT window_start,
           COUNT(*) AS n_kept,
           CAST(SUM(CAST(value AS {DEC})) AS DOUBLE) AS sum_kept
    FROM m
    WHERE ts > wmax - INTERVAL '15 minutes'
    GROUP BY 1
    """,
)
def window_time_evictor(spark, sf_dir):
    """TimeEvictor (reference TimeEvictor.java): 1-hour tumble windows
    keep only the trailing 15 minutes relative to each window's max
    event time, then aggregate — evict-before-emit as a pre-agg filter
    against the window's own max (one extra window pass, all JVM)."""
    from flink_spark.operators.evictors import time_evictor

    ev = W.tumble(
        load_table(spark, sf_dir, "events"), "ts", "1 hour"
    )
    kept = time_evictor(ev, ["window_start"], "ts", "15 minutes")
    return kept.groupBy("window_start").agg(
        F.count("*").alias("n_kept"), dsum("value", "sum_kept")
    )


@query(
    "window_count_evictor",
    oracle=f"""
    WITH w AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
             ts, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY time_bucket(INTERVAL '1 hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    SELECT window_start,
           COUNT(*) AS n_kept,
           CAST(SUM(CAST(value AS {DEC})) AS DOUBLE) AS sum_kept
    FROM w WHERE rn <= 5
    GROUP BY 1
    """,
)
def window_count_evictor(spark, sf_dir):
    """CountEvictor (reference CountEvictor.java): keep the last 5
    elements per window (front-eviction in event order) before the
    aggregation — a rank filter over the window key."""
    from flink_spark.operators.evictors import count_evictor

    ev = W.tumble(load_table(spark, sf_dir, "events"), "ts", "1 hour")
    kept = count_evictor(ev, ["window_start"], ["ts", "event_id"], 5)
    return kept.groupBy("window_start").agg(
        F.count("*").alias("n_kept"), dsum("value", "sum_kept")
    )


@query(
    "window_delta_evictor",
    oracle=f"""
    WITH w AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
             ts, event_id, value
      FROM events),
    m AS (
      SELECT *, LAST_VALUE(value) OVER (PARTITION BY window_start
                  ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                AS last_val
      FROM w)
    SELECT window_start,
           COUNT(*) AS n_kept,
           CAST(SUM(CAST(value AS {DEC})) AS DOUBLE) AS sum_kept
    FROM m
    WHERE ABS(value - last_val) <= 25.0
    GROUP BY 1
    """,
)
def window_delta_evictor(spark, sf_dir):
    """DeltaEvictor (reference DeltaEvictor.java): evict elements whose
    value differs from the window's LAST element (event order) by more
    than the threshold; the reference element comes from max_by over the
    window key."""
    from flink_spark.operators.evictors import delta_evictor

    ev = W.tumble(load_table(spark, sf_dir, "events"), "ts", "1 hour")
    kept = delta_evictor(ev, ["window_start"], ["ts", "event_id"], "value", 25.0)
    return kept.groupBy("window_start").agg(
        F.count("*").alias("n_kept"), dsum("value", "sum_kept")
    )


@query(
    "window_session_tvf_sql",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL '30 minutes'
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events WHERE user_id <= 100
    ), numbered AS (
      SELECT *, SUM(new_session) OVER
                (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    )
    SELECT MIN(ts) AS window_start,
           MAX(ts) + INTERVAL '30 minutes' AS window_end,
           user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS {DEC})) AS DOUBLE) AS sum_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def window_session_tvf_sql(spark, sf_dir):
    """SESSION window TVF through the SQL surface (reference
    SqlSessionTableFunction + window-TVF aggregation): SESSION is a
    MERGING window, so the dialect rewrites the whole statement into
    Spark's session_window grouping (bounds exist only post-merge) rather
    than a row-tagged view like TUMBLE/HOP/CUMULATE."""
    from flink_spark.catalog import TableEnvironment

    env = TableEnvironment(spark)
    load_table(spark, sf_dir, "events").filter(
        F.col("user_id") <= 100
    ).createOrReplaceTempView("sess_tvf_events")
    return env.execute_sql("""
        SELECT window_start, window_end, user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
        FROM TABLE(SESSION(TABLE sess_tvf_events PARTITION BY user_id,
                           DESCRIPTOR(ts), INTERVAL '30' MINUTES))
        GROUP BY window_start, window_end, user_id
    """)


@query(
    "window_tumble_legacy_sql",
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS {DEC})) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def window_tumble_legacy_sql(spark, sf_dir):
    """Legacy group-window SQL (reference
    StreamExecGroupWindowAggregate.java:113 — the pre-TVF `GROUP BY
    TUMBLE(ts, INTERVAL ...)` spelling with TUMBLE_START/_END accessors,
    still shipped by the reference): routed through the dialect rewrite
    onto native window() grouping; shares the window_tumble oracle."""
    from flink_spark.catalog import TableEnvironment

    env = TableEnvironment(spark)
    load_table(spark, sf_dir, "events").createOrReplaceTempView("__lgw_events")
    return env.execute_sql(f"""
        SELECT TUMBLE_START(ts, INTERVAL '1' HOUR) AS window_start,
               TUMBLE_END(ts, INTERVAL '1' HOUR) AS window_end,
               event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS {DEC})) AS DOUBLE) AS sum_value
        FROM __lgw_events
        GROUP BY TUMBLE(ts, INTERVAL '1' HOUR), event_type
    """)


@query(
    "window_session_legacy_sql",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL '30 minutes'
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events WHERE user_id <= 100
    ), numbered AS (
      SELECT *, SUM(new_session) OVER
                (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS {DEC})) AS DOUBLE) AS sum_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def window_session_legacy_sql(spark, sf_dir):
    """Legacy SESSION group-window SQL (`GROUP BY SESSION(ts, INTERVAL
    '30' MINUTE)` with SESSION_START/SESSION_END accessors) rewritten onto
    native session_window grouping; shares the window_session oracle."""
    from flink_spark.catalog import TableEnvironment

    env = TableEnvironment(spark)
    load_table(spark, sf_dir, "events").filter(
        F.col("user_id") <= 100
    ).createOrReplaceTempView("__lgw_sess_events")
    return env.execute_sql(f"""
        SELECT user_id,
               SESSION_START(ts, INTERVAL '30' MINUTE) AS session_start,
               SESSION_END(ts, INTERVAL '30' MINUTE) AS session_end,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS {DEC})) AS DOUBLE) AS sum_value
        FROM __lgw_sess_events
        GROUP BY SESSION(ts, INTERVAL '30' MINUTE), user_id
    """)
