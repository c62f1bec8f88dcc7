"""MATCH_RECOGNIZE SQL front-end vs the CEP operator API: the SQL text
must produce exactly what the equivalent Pattern program produces."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_spark.catalog import TableEnvironment
from flink_spark.operators.cep import Pattern, match_pattern
from flink_spark.sources.tables import load_table


def test_match_recognize_sql_equals_pattern_api(spark, sf_dir):
    env = TableEnvironment(spark)
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 150)
    ev.createOrReplaceTempView("mr_events")

    got = env.execute_sql("""
        SELECT * FROM mr_events MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES FIRST(A.event_id) AS first_click,
                     LAST(B.event_id) AS buy_id,
                     COUNT(A.*) AS n_clicks,
                     B.value AS buy_value
            ONE ROW PER MATCH
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (A+ B)
            DEFINE A AS A.event_type = 'click',
                   B AS B.event_type = 'purchase'
        )
    """)

    pat = (
        Pattern.begin("A", lambda r: r["event_type"] == "click")
        .one_or_more(greedy=True)
        .next("B", lambda r: r["event_type"] == "purchase")
    )
    long_df = match_pattern(
        ev, pat, key_cols=["user_id"], ts_col="ts", order_cols=["ts", "event_id"]
    )
    isa = F.col("var") == "A"
    isb = F.col("var") == "B"
    expected = (
        long_df.groupBy("user_id", "match_id")
        .agg(
            F.min_by(F.when(isa, F.col("event_id")), F.when(isa, F.col("seq_no")))
            .alias("first_click"),
            F.max_by(F.when(isb, F.col("event_id")), F.when(isb, F.col("seq_no")))
            .alias("buy_id"),
            F.sum(F.when(isa, 1).otherwise(0)).alias("n_clicks"),
            F.max_by(F.when(isb, F.col("value")), F.when(isb, F.col("seq_no")))
            .alias("buy_value"),
        )
        .drop("match_id")
    )
    got_rows = sorted(map(tuple, got.collect()))
    exp_rows = sorted(map(tuple, expected.collect()))
    assert got_rows == exp_rows and len(got_rows) > 0


def test_match_recognize_within_and_skip(spark, sf_dir):
    env = TableEnvironment(spark)
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 80)
    ev.createOrReplaceTempView("mr_events2")
    got = env.execute_sql("""
        SELECT * FROM mr_events2 MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES FIRST(E.event_id) AS first_err, COUNT(E.*) AS n_err
            AFTER MATCH SKIP TO NEXT ROW
            PATTERN (E E)
            WITHIN INTERVAL '30' MINUTE
            DEFINE E AS E.event_type = 'error'
        )
    """)
    rows = got.collect()
    assert all(r["n_err"] == 2 for r in rows)
