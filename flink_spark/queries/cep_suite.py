"""MATCH_RECOGNIZE / CEP coverage (SURVEY §2.11) over the events table.

Patterns are chosen so the NFA's SKIP PAST LAST ROW results coincide with a
window-function SQL formulation (no two matches can overlap for these
alphabets), giving exact DuckDB oracles for the pattern operator. Richer
quantifier/greediness/skip semantics are unit-tested in tests/test_cep.py
on scripted sequences (the reference's CEP ITCase style).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_spark.operators.cep import Pattern, match_pattern
from flink_spark.queries.registry import query
from flink_spark.sources.tables import load_table


@query(
    "cep_click_purchase_adjacent",
    oracle="""
    WITH s AS (
      SELECT user_id, ts, event_id, event_type,
             LEAD(event_type) OVER w AS nxt_type,
             LEAD(ts) OVER w AS nxt_ts,
             LEAD(event_id) OVER w AS nxt_id
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT user_id, event_id AS click_id, nxt_id AS purchase_id,
           ts AS click_ts, nxt_ts AS purchase_ts
    FROM s
    WHERE event_type = 'click' AND nxt_type = 'purchase'
      AND nxt_ts <= ts + INTERVAL '30 minutes'
    """,
)
def cep_click_purchase_adjacent(spark, sf_dir):
    """PATTERN (A B) WITHIN 30m: click immediately followed by purchase in
    the user's event sequence (reference StreamExecMatch.java:61 /
    NFA.java:76 — strict contiguity, SKIP PAST LAST ROW). Matches cannot
    overlap (B is never a valid A), so the LEAD-based SQL is exact."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    pat = (
        Pattern.begin("A", lambda r: r["event_type"] == "click")
        .next("B", lambda r: r["event_type"] == "purchase")
        .within("30 minutes")
    )
    m = match_pattern(ev, pat, key_cols=["user_id"], ts_col="ts",
                      order_cols=["ts", "event_id"])
    return (
        m.groupBy("user_id", "match_id")
        .agg(
            F.max(F.when(F.col("var") == "A", F.col("event_id"))).alias("click_id"),
            F.max(F.when(F.col("var") == "B", F.col("event_id"))).alias("purchase_id"),
            F.max(F.when(F.col("var") == "A", F.col("ts"))).alias("click_ts"),
            F.max(F.when(F.col("var") == "B", F.col("ts"))).alias("purchase_ts"),
        )
        .select("user_id", "click_id", "purchase_id", "click_ts", "purchase_ts")
    )


@query(
    "cep_browse_then_buy",
    oracle="""
    WITH s AS (
      SELECT user_id, ts, event_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events),
    nxt AS (
      SELECT *,
             MIN(CASE WHEN event_type <> 'view' THEN rn END) OVER
               (PARTITION BY user_id ORDER BY rn
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nnv_rn
      FROM s)
    SELECT a.user_id, a.event_id AS click_id, c.event_id AS purchase_id,
           c.rn - a.rn - 1 AS n_views,
           a.ts AS click_ts, c.ts AS purchase_ts
    FROM nxt a
    JOIN s c ON c.user_id = a.user_id AND c.rn = a.nnv_rn
    WHERE a.event_type = 'click' AND c.event_type = 'purchase'
      AND c.ts <= a.ts + INTERVAL '2 hours'
    """,
)
def cep_browse_then_buy(spark, sf_dir):
    """PATTERN (A B* C) WITHIN 2h: click, any run of views, then purchase —
    the canonical funnel pattern (reference CEP quantifiers,
    pattern/Quantifier.java; B* = greedy consecutive zeroOrMore). The
    matched span contains no clicks besides A and no non-view rows besides
    C, so matches cannot overlap and the next-non-view SQL is exact."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    pat = (
        Pattern.begin("A", lambda r: r["event_type"] == "click")
        .next("B", lambda r: r["event_type"] == "view")
        .zero_or_more()
        .next("C", lambda r: r["event_type"] == "purchase")
        .within("2 hours")
    )
    m = match_pattern(ev, pat, key_cols=["user_id"], ts_col="ts",
                      order_cols=["ts", "event_id"])
    return (
        m.groupBy("user_id", "match_id")
        .agg(
            F.max(F.when(F.col("var") == "A", F.col("event_id"))).alias("click_id"),
            F.max(F.when(F.col("var") == "C", F.col("event_id"))).alias("purchase_id"),
            F.sum((F.col("var") == "B").cast("bigint")).alias("n_views"),
            F.max(F.when(F.col("var") == "A", F.col("ts"))).alias("click_ts"),
            F.max(F.when(F.col("var") == "C", F.col("ts"))).alias("purchase_ts"),
        )
        .select(
            "user_id", "click_id", "purchase_id", "n_views",
            "click_ts", "purchase_ts",
        )
    )


@query(
    "cep_error_burst",
    oracle="""
    WITH s AS (
      SELECT user_id, ts, event_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err
      FROM events),
    runs AS (
      SELECT *, rn - SUM(is_err) OVER
               (PARTITION BY user_id ORDER BY rn
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      FROM s WHERE is_err = 1)
    SELECT user_id,
           COUNT(*) AS n_errors,
           MIN(ts) AS first_ts,
           MAX(ts) AS last_ts,
           MIN(event_id) AS first_event_id
    FROM runs
    GROUP BY user_id, grp
    HAVING COUNT(*) >= 3
    """,
)
def cep_error_burst(spark, sf_dir):
    """PATTERN (E{3,}) — maximal consecutive error runs of length >= 3
    (greedy oneOrMore absorbs the whole run; SKIP PAST LAST ROW makes runs
    disjoint — exactly SQL gaps-and-islands on the error flag)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    pat = Pattern.begin("E", lambda r: r["event_type"] == "error").times(
        3, None
    )
    m = match_pattern(ev, pat, key_cols=["user_id"], ts_col="ts",
                      order_cols=["ts", "event_id"])
    return (
        m.groupBy("user_id", "match_id")
        .agg(
            F.count("*").alias("n_errors"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            F.min("event_id").alias("first_event_id"),
        )
        .select("user_id", "n_errors", "first_ts", "last_ts", "first_event_id")
    )


@query(
    "cep_error_triples",
    oracle="""
    WITH s AS (
      SELECT user_id, ts, event_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err
      FROM events),
    runs AS (
      SELECT *, rn - SUM(is_err) OVER
               (PARTITION BY user_id ORDER BY rn
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      FROM s WHERE is_err = 1),
    idx AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, grp ORDER BY rn) - 1
               AS i
      FROM runs)
    SELECT user_id, MIN(event_id) AS first_err, MAX(event_id) AS last_err,
           MIN(ts) AS first_ts
    FROM idx
    GROUP BY user_id, grp, i // 3
    HAVING COUNT(*) = 3
    """,
)
def cep_error_triples(spark, sf_dir):
    """PATTERN (E{3}) — exact-count quantifier (reference
    pattern/Pattern.java ``times(int)``, Quantifier.java): each maximal
    error run splits greedily into floor(len/3) disjoint triples under
    SKIP PAST LAST ROW; leftovers < 3 don't match. The oracle replays the
    split with gaps-and-islands + index-div-3 grouping."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    pat = Pattern.begin("E", lambda r: r["event_type"] == "error").times(3)
    m = match_pattern(ev, pat, key_cols=["user_id"], ts_col="ts",
                      order_cols=["ts", "event_id"])
    return (
        m.groupBy("user_id", "match_id")
        .agg(
            F.min("event_id").alias("first_err"),
            F.max("event_id").alias("last_err"),
            F.min("ts").alias("first_ts"),
        )
        .select("user_id", "first_err", "last_err", "first_ts")
    )


@query(
    "cep_alternation_funnel",
    oracle="""
    WITH s AS (
      SELECT user_id, ts, event_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             CASE WHEN event_type IN ('click', 'view') THEN 1 ELSE 0 END AS is_cv
      FROM events),
    runs AS (
      SELECT *, rn - SUM(is_cv) OVER
               (PARTITION BY user_id ORDER BY rn
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      FROM s WHERE is_cv = 1),
    islands AS (
      SELECT user_id, grp, MIN(rn) AS lo, MAX(rn) AS hi,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n_clicks,
             SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS n_views
      FROM runs GROUP BY user_id, grp)
    SELECT i.user_id,
           CAST(i.n_clicks AS BIGINT) AS n_clicks,
           CAST(i.n_views AS BIGINT) AS n_views,
           p.event_id AS purchase_id
    FROM islands i
    JOIN s p ON p.user_id = i.user_id AND p.rn = i.hi + 1
    WHERE p.event_type = 'purchase'
    """,
)
def cep_alternation_funnel(spark, sf_dir):
    """PATTERN ((C|V)+ P) — alternation group under a quantifier
    (reference Calcite SqlMatchRecognize pattern alternation; branch
    dispatch per repetition): a maximal consecutive run of clicks-or-views
    immediately followed by a purchase. Greedy (C|V)+ anchored at run
    start absorbs the whole run, P is strict-next, so matches are the
    islands whose successor row is a purchase — exactly the oracle's
    gaps-and-islands + successor join."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    pat = (
        Pattern.begin_any(
            [
                ("C", lambda r: r["event_type"] == "click"),
                ("V", lambda r: r["event_type"] == "view"),
            ]
        )
        .one_or_more()
        .next("P", lambda r: r["event_type"] == "purchase")
    )
    m = match_pattern(ev, pat, key_cols=["user_id"], ts_col="ts",
                      order_cols=["ts", "event_id"])
    return (
        m.groupBy("user_id", "match_id")
        .agg(
            F.sum((F.col("var") == "C").cast("bigint")).alias("n_clicks"),
            F.sum((F.col("var") == "V").cast("bigint")).alias("n_views"),
            F.max(F.when(F.col("var") == "P", F.col("event_id")))
            .alias("purchase_id"),
        )
        .select("user_id", "n_clicks", "n_views", "purchase_id")
    )


@query(
    "sql_match_all_rows_pairs",
    oracle="""
    WITH s AS (
      SELECT user_id, ts, event_id, event_type, value,
             LEAD(event_type) OVER w AS nxt_type,
             LEAD(ts) OVER w AS nxt_ts,
             LEAD(event_id) OVER w AS nxt_id,
             LEAD(value) OVER w AS nxt_value
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    pairs AS (
      SELECT * FROM s
      WHERE event_type = 'click' AND nxt_type = 'purchase'
        AND nxt_ts <= ts + INTERVAL '30 minutes')
    SELECT user_id, event_id, ts, 'A' AS cls, event_id AS click_id,
           CAST(0 AS BIGINT) AS running_buys, value AS row_value
    FROM pairs
    UNION ALL
    SELECT user_id, nxt_id, nxt_ts, 'B', event_id,
           CAST(1 AS BIGINT), nxt_value
    FROM pairs
    """,
)
def sql_match_all_rows_pairs(spark, sf_dir):
    """MATCH_RECOGNIZE ... ALL ROWS PER MATCH through the SQL front-end
    (SQL:2016 / Calcite row-per-event output with RUNNING measures;
    reference StreamExecMatch ALL ROWS path): every matched event emits a
    row carrying CLASSIFIER(), the running COUNT(B.*), and FIRST(A...).
    Non-overlap of (click→purchase) adjacent pairs makes the LEAD-based
    two-rows-per-match oracle exact."""
    from flink_spark.catalog import TableEnvironment

    env = TableEnvironment(spark)
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    ev.createOrReplaceTempView("cep_allrows_events")
    out = env.execute_sql("""
        SELECT * FROM cep_allrows_events MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES CLASSIFIER() AS cls,
                     FIRST(A.event_id) AS click_id,
                     COUNT(B.*) AS running_buys,
                     LAST(X.value) AS ignore_me
            ALL ROWS PER MATCH
            PATTERN (A B)
            WITHIN INTERVAL '30' MINUTE
            DEFINE A AS A.event_type = 'click',
                   B AS B.event_type = 'purchase'
        )
    """)
    return out.select(
        "user_id", "event_id", "ts", "cls", "click_id", "running_buys",
        F.col("value").alias("row_value"),
    )


@query(
    "cep_abandoned_click",
    oracle="""
    SELECT c.user_id, c.event_id AS click_id, c.ts AS click_ts
    FROM events c
    WHERE c.event_type = 'click'
      AND NOT EXISTS (
        SELECT 1 FROM events p
        WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
          AND (p.ts > c.ts OR (p.ts = c.ts AND p.event_id > c.event_id))
          AND p.ts <= c.ts + INTERVAL '30 minutes')
    """,
)
def cep_abandoned_click(spark, sf_dir):
    """PATTERN: click notFollowedBy(purchase) WITHIN 30m — the timeout /
    absence pattern (reference Pattern.java:336 ``notFollowedBy``; a
    trailing NOT requires a window, NFACompiler). A match consumes only
    the click, so every click is its own anchor and the NOT-EXISTS
    anti-join over the (ts, event_id) sequence order is the exact
    closed form."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    pat = (
        Pattern.begin("A", lambda r: r["event_type"] == "click")
        .not_followed_by("NP", lambda r: r["event_type"] == "purchase")
        .within("30 minutes")
    )
    m = match_pattern(ev, pat, key_cols=["user_id"], ts_col="ts",
                      order_cols=["ts", "event_id"])
    return m.select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )


@query(
    "cep_clean_conversion",
    oracle="""
    WITH s AS (
      SELECT user_id, ts, event_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
      FROM events),
    nxt AS (
      SELECT *,
             MIN(CASE WHEN event_type = 'purchase' THEN rn END) OVER
               (PARTITION BY user_id ORDER BY rn
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS p_rn,
             MIN(CASE WHEN event_type = 'error' THEN rn END) OVER
               (PARTITION BY user_id ORDER BY rn
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS e_rn
      FROM s)
    SELECT a.user_id, a.event_id AS click_id, p.event_id AS purchase_id,
           a.ts AS click_ts, p.ts AS purchase_ts
    FROM nxt a
    JOIN s p ON p.user_id = a.user_id AND p.rn = a.p_rn
    WHERE a.event_type = 'click'
      AND (a.e_rn IS NULL OR a.e_rn > a.p_rn)
      AND p.ts <= a.ts + INTERVAL '2 hours'
    """,
)
def cep_clean_conversion(spark, sf_dir):
    """PATTERN: click notFollowedBy(error) purchase WITHIN 2h, AFTER MATCH
    SKIP TO NEXT ROW — conversions with no error event in the gap
    (reference notFollowedBy between steps; NFACompiler STOP-states kill
    partial matches when the forbidden event arrives). SKIP TO NEXT ROW
    evaluates every click anchor independently, so the first-following-
    purchase-vs-first-following-error window SQL is exact: a click
    converts iff its next purchase precedes its next error and lands in
    the window (ts ascends with rn, so only the first purchase can
    qualify)."""
    from flink_spark.operators.cep import SKIP_TO_NEXT_ROW

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    pat = (
        Pattern.begin("A", lambda r: r["event_type"] == "click")
        .not_followed_by("NE", lambda r: r["event_type"] == "error")
        .followed_by("C", lambda r: r["event_type"] == "purchase")
        .within("2 hours")
    )
    m = match_pattern(ev, pat, key_cols=["user_id"], ts_col="ts",
                      order_cols=["ts", "event_id"], skip=SKIP_TO_NEXT_ROW)
    return (
        m.groupBy("user_id", "match_id")
        .agg(
            F.max(F.when(F.col("var") == "A", F.col("event_id")))
            .alias("click_id"),
            F.max(F.when(F.col("var") == "C", F.col("event_id")))
            .alias("purchase_id"),
            F.max(F.when(F.col("var") == "A", F.col("ts"))).alias("click_ts"),
            F.max(F.when(F.col("var") == "C", F.col("ts")))
            .alias("purchase_ts"),
        )
        .select("user_id", "click_id", "purchase_id", "click_ts",
                "purchase_ts")
    )

@query(
    "sql_match_subset_union",
    oracle="""
    WITH s AS (
      SELECT user_id, ts, event_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn,
             CASE WHEN event_type IN ('click', 'view') THEN 1 ELSE 0 END
               AS is_cv
      FROM events),
    runs AS (
      SELECT *, rn - SUM(is_cv) OVER
               (PARTITION BY user_id ORDER BY rn
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      FROM s WHERE is_cv = 1),
    islands AS (
      SELECT user_id, grp, MIN(rn) AS lo, MAX(rn) AS hi,
             COUNT(*) AS n_cv
      FROM runs GROUP BY user_id, grp)
    SELECT i.user_id,
           CAST(i.n_cv AS BIGINT) AS n_cv,
           flo.value AS first_cv_value,
           fhi.value AS last_cv_value,
           p.event_id AS purchase_id
    FROM islands i
    JOIN s flo ON flo.user_id = i.user_id AND flo.rn = i.lo
    JOIN s fhi ON fhi.user_id = i.user_id AND fhi.rn = i.hi
    JOIN s p ON p.user_id = i.user_id AND p.rn = i.hi + 1
    WHERE p.event_type = 'purchase'
    """,
)
def sql_match_subset_union(spark, sf_dir):
    """MATCH_RECOGNIZE SUBSET clause (Calcite SqlMatchRecognize
    subsetList; reference MatchRecognizeITCase SUBSET tests): the union
    variable U = (C, V) aggregates across both alternation branches in
    MEASURES — COUNT/FIRST/LAST over the whole click-or-view run. Same
    islands non-overlap argument as cep_alternation_funnel makes the
    gaps-and-islands oracle exact."""
    from flink_spark.catalog import TableEnvironment

    env = TableEnvironment(spark)
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    ev.createOrReplaceTempView("cep_subset_events")
    out = env.execute_sql("""
        SELECT * FROM cep_subset_events MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES COUNT(U.*) AS n_cv,
                     FIRST(U.value) AS first_cv_value,
                     LAST(U.value) AS last_cv_value,
                     LAST(P.event_id) AS purchase_id
            ONE ROW PER MATCH
            PATTERN ((C|V)+ P)
            SUBSET U = (C, V)
            DEFINE C AS C.event_type = 'click',
                   V AS V.event_type = 'view',
                   P AS P.event_type = 'purchase'
        )
    """)
    return out.select(
        "user_id", "n_cv", "first_cv_value", "last_cv_value", "purchase_id"
    )
