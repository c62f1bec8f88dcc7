"""Table API shim (reference Table.java fluent surface, SURVEY §3.2):
every fluent program must equal the equivalent DataFrame program —
the shim is sugar over Catalyst, not an interpreter."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_spark.table_api import (
    Session,
    Slide,
    Table,
    Tumble,
    col,
    from_data_frame,
    lit,
)


def _orders(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 5.0), (4, "b", 7.0),
         (5, "c", 1.0)],
        "id int, seg string, amount double",
    )


def test_group_by_select_matches_dataframe(spark):
    df = _orders(spark)
    t = from_data_frame(df)
    got = (
        t.group_by(col("seg"))
        .select(col("seg"), F.sum("amount").alias("total"),
                F.count(lit(1)).alias("n"))
        .order_by(col("seg"))
        .execute()
        .collect()
    )
    want = (
        df.groupBy("seg")
        .agg(F.sum("amount").alias("total"), F.count(F.lit(1)).alias("n"))
        .orderBy("seg")
        .collect()
    )
    assert got == want


def test_join_filter_fetch(spark):
    df = _orders(spark)
    dim = spark.createDataFrame([("a", "alpha"), ("b", "beta")],
                                "seg string, seg_name string")
    t = from_data_frame(df).alias("o")
    d = from_data_frame(dim).alias("d")
    got = (
        t.join(d, col("o.seg") == col("d.seg"))
        .where(col("amount") > 5.0)
        .select(col("id"), col("seg_name"))
        .order_by(col("id").desc())
        .fetch(2)
        .execute()
        .collect()
    )
    assert [(r.id, r.seg_name) for r in got] == [(4, "beta"), (2, "alpha")]


def test_set_ops_and_column_ops(spark):
    df = _orders(spark)
    t = from_data_frame(df)
    u = t.union_all(t)
    assert u.execute().to_pandas().shape[0] == 10
    assert t.union(t).to_data_frame().count() == 5
    assert t.minus_all(t.fetch(2)).to_data_frame().count() == 3
    # minus is EXCEPT DISTINCT (reference Table.minus): a left row present
    # in the right table AT ALL is removed, regardless of multiplicity —
    # {A,A,A} minus {A} == {} (not {A})
    tri = from_data_frame(df.limit(1).union(df.limit(1)).union(df.limit(1)))
    assert tri.minus(t.fetch(1)).to_data_frame().count() == 0
    assert tri.minus_all(t.fetch(1)).to_data_frame().count() == 2
    added = t.add_columns((col("amount") * 2).alias("double_amount"))
    assert "double_amount" in added.to_data_frame().columns
    renamed = t.rename_columns(col("amount").alias("amt"))
    assert "amt" in renamed.to_data_frame().columns
    assert "amount" not in renamed.to_data_frame().columns
    assert t.drop_columns("seg").to_data_frame().columns == ["id", "amount"]


def test_tumble_window_group_by(spark):
    ev = spark.createDataFrame(
        [("2024-01-01 00:00:30", "a", 1.0), ("2024-01-01 00:00:50", "a", 2.0),
         ("2024-01-01 00:01:10", "a", 4.0), ("2024-01-01 00:00:10", "b", 8.0)],
        "ts string, k string, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    t = from_data_frame(ev)
    wt = t.window(Tumble.over("1 minute").on(col("ts")).alias("w"))
    wg = wt.group_by("w", col("k"))
    w = wg.window_ref()
    got = sorted(
        (str(r.wstart), r.k, r.total)
        for r in wg.select(
            w.start.alias("wstart"), col("k"), F.sum("v").alias("total")
        ).execute().collect()
    )
    assert got == [
        ("2024-01-01 00:00:00", "a", 3.0),
        ("2024-01-01 00:00:00", "b", 8.0),
        ("2024-01-01 00:01:00", "a", 4.0),
    ]


def test_slide_and_session_builders(spark):
    ev = spark.createDataFrame(
        [("2024-01-01 00:00:30", 1.0), ("2024-01-01 00:02:30", 2.0)],
        "ts string, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    t = from_data_frame(ev)
    slide = t.window(
        Slide.over("2 minutes").every("1 minute").on(col("ts")).alias("w")
    ).group_by("w")
    assert slide.select(F.sum("v").alias("s")).to_data_frame().count() == 4
    sess = t.window(
        Session.with_gap("1 minute").on(col("ts")).alias("w")
    ).group_by("w")
    assert sess.select(F.sum("v").alias("s")).to_data_frame().count() == 2


def test_from_path_entry(spark):
    from flink_spark.catalog import TableEnvironment

    env = TableEnvironment(spark)
    _orders(spark).createOrReplaceTempView("tapi_orders")
    t = env.from_path("tapi_orders")
    assert isinstance(t, Table)
    assert t.where(col("seg") == "a").to_data_frame().count() == 2
