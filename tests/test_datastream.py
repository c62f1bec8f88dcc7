"""DataStream API shim (reference StreamExecutionEnvironment /
DataStream / KeyedStream fluent surface, SURVEY §3.3): fluent programs
must equal their DataFrame equivalents — the shim routes through
Catalyst, it is not an interpreter."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_spark.datastream import StreamExecutionEnvironment


def test_from_data_map_filter_keyby_reduce(spark):
    env = StreamExecutionEnvironment(spark)
    ds = env.from_data(
        [("a", 1.0), ("a", 2.0), ("b", 5.0), ("b", 3.0)], "k string, v double"
    )
    got = sorted(
        (r.k, r.total, r.n)
        for r in (
            ds.map((F.col("v") * 2).alias("v2"))
            .filter(F.col("v2") > 2.0)
            .key_by("k")
            .reduce(F.sum("v2").alias("total"), F.count(F.lit(1)).alias("n"))
            .execute_and_collect()
        )
    )
    assert got == [("a", 4.0, 1), ("b", 16.0, 2)]


def test_python_map_is_arrow_batched(spark):
    env = StreamExecutionEnvironment(spark)
    ds = env.from_sequence(1, 5)

    def double(pdf):
        pdf["doubled"] = pdf["id"] * 2
        return pdf

    got = sorted(
        (r.id, r.doubled)
        for r in ds.map(double, "id long, doubled long").execute_and_collect()
    )
    assert got == [(i, 2 * i) for i in range(1, 6)]


def test_flat_map_and_union(spark):
    env = StreamExecutionEnvironment(spark)
    a = env.from_data([(1,)], "x int")
    b = env.from_data([(2,)], "x int")

    def explode_twice(pdf):
        import pandas as pd

        return pd.concat([pdf, pdf])

    u = a.union(b).flat_map(explode_twice, "x int")
    assert sorted(r.x for r in u.execute_and_collect()) == [1, 1, 2, 2]


def test_keyed_window_reduce(spark):
    env = StreamExecutionEnvironment(spark)
    ds = env.from_data(
        [("2024-01-01 00:00:30", "a", 1.0), ("2024-01-01 00:00:50", "a", 2.0),
         ("2024-01-01 00:01:10", "a", 4.0)],
        "ts string, k string, v double",
    ).map(F.col("ts").cast("timestamp").alias("ts2"))
    win = (
        ds.to_data_frame().withColumn("ts", F.col("ts2")).drop("ts2")
    )
    from flink_spark.datastream import DataStream

    got = sorted(
        (str(r.window.start), r.total)
        for r in DataStream(win).key_by("k").window("1 minute")
        .reduce(F.sum("v").alias("total")).execute_and_collect()
    )
    assert got == [("2024-01-01 00:00:00", 3.0), ("2024-01-01 00:01:00", 4.0)]


def test_keyed_process(spark):
    env = StreamExecutionEnvironment(spark)
    ds = env.from_data(
        [("a", 3.0), ("a", 1.0), ("b", 7.0)], "k string, v double"
    )

    def spread(pdf):
        import pandas as pd

        return pd.DataFrame(
            {"k": [pdf["k"].iloc[0]], "spread": [pdf["v"].max() - pdf["v"].min()]}
        )

    got = sorted(
        (r.k, r.spread)
        for r in ds.key_by("k").process(spread, "k string, spread double")
        .execute_and_collect()
    )
    assert got == [("a", 2.0), ("b", 0.0)]


def test_connect_coprocess_fluent(spark, tmp_path):
    """DataStream.connect(...).key_by(...).process(...) (reference
    ConnectedStreams/CoProcessFunction): a rules stream steers a data
    stream through the fluent two-input surface; per-key state holds the
    latest rule."""
    import os
    import time

    import pandas as pd

    from flink_spark.datastream import StreamExecutionEnvironment

    def land(df, d, name):
        import glob
        import shutil

        stage = str(tmp_path / f"stage_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        (part,) = glob.glob(os.path.join(stage, "part-*.parquet"))
        os.makedirs(d, exist_ok=True)
        shutil.move(part, os.path.join(d, f"{name}.parquet"))

    rules_dir, data_dir = str(tmp_path / "rules"), str(tmp_path / "data")
    land(spark.createDataFrame([("a", 10)], "rk string, min_v int"),
         rules_dir, "r1")
    land(spark.createDataFrame(
        [("a", 1, 5), ("a", 2, 15)], "dk string, eid int, v int"),
        data_dir, "d1")

    env = StreamExecutionEnvironment(spark)
    rules = env.from_source(
        spark.readStream.schema("rk string, min_v int").parquet(rules_dir)
    )
    data = env.from_source(
        spark.readStream.schema("dk string, eid int, v int").parquet(data_dir)
    )

    def fn(key, rules_pdf, data_pdf, state):
        if len(rules_pdf):
            state["thr"] = int(rules_pdf["min_v"].iloc[-1])
        thr = state.get("thr")
        if thr is None or not len(data_pdf):
            return None
        keep = data_pdf[data_pdf["v"] >= thr]
        return pd.DataFrame({"eid": keep["eid"], "v": keep["v"]})

    out = (
        rules.connect(data)
        .key_by("rk", "dk")
        .process(fn, "eid int, v int",
                 left_seq=["min_v"], right_seq=["eid"])
    )
    sink = str(tmp_path / "csink")
    q = (
        out.to_data_frame().writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "cckpt"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {r.eid for r in
           spark.read.schema("eid int, v int").parquet(sink).collect()}
    assert got == {2}  # only v=15 passes min_v=10
