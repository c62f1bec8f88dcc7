"""Co-process / broadcast-state pattern (reference CoProcessFunction,
BroadcastProcessFunction): a control stream of per-key thresholds steers a
data stream; rule updates land between micro-batches and must apply to all
later data."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from flink_spark.streaming.coprocess import co_process
from flink_spark.streaming.core import run_to_memory


def _land(df, dest, name):
    import glob
    import shutil

    staging = dest.parent / f"_stage_{name}"
    df.coalesce(1).write.mode("overwrite").parquet(str(staging))
    (part,) = glob.glob(str(staging / "part-*.parquet"))
    dest.mkdir(exist_ok=True)
    shutil.move(part, str(dest / f"{name}.parquet"))


@pytest.mark.slow
def test_rules_stream_steers_data_stream(spark, tmp_path):
    import pandas as pd

    rules_dir = tmp_path / "rules"
    data_dir = tmp_path / "data"

    # batch 1: threshold k=a→10, plus data under/over it
    _land(
        spark.createDataFrame([("a", 10), ("b", 50)], "k string, min_v int"),
        rules_dir, "r1",
    )
    _land(
        spark.createDataFrame(
            [("a", 1, 5), ("a", 2, 15), ("b", 3, 40), ("b", 4, 60)],
            "k string, eid int, v int",
        ),
        data_dir, "d1",
    )

    def apply_rules(key, rules, data, state):
        if len(rules):
            state["min_v"] = int(rules["min_v"].iloc[-1])
        thr = state.get("min_v")
        if thr is None or not len(data):
            return None
        keep = data[data["v"] >= thr]
        return pd.DataFrame(
            {"k": keep["k"], "eid": keep["eid"], "v": keep["v"]}
        )

    sink = str(tmp_path / "sink")

    def run():
        rules = spark.readStream.schema("k string, min_v int").parquet(str(rules_dir))
        data = spark.readStream.schema("k string, eid int, v int").parquet(str(data_dir))
        out = co_process(
            rules, data, ["k"], apply_rules, "k string, eid int, v int",
            left_seq=["min_v"], right_seq=["eid"],
        )
        q = (
            out.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        return spark.read.schema("k string, eid int, v int").parquet(sink)

    got1 = {r["eid"] for r in run().collect()}
    assert got1 == {2, 4}  # a:15>=10, b:60>=50

    # batch 2 (same checkpoint): rule for a tightens to 20; new data
    _land(
        spark.createDataFrame([("a", 20)], "k string, min_v int"),
        rules_dir, "r2",
    )
    _land(
        spark.createDataFrame(
            [("a", 5, 15), ("a", 6, 25), ("b", 7, 55)], "k string, eid int, v int"
        ),
        data_dir, "d2",
    )
    got2 = {r["eid"] for r in run().collect()}
    # a's 15 now fails the tightened rule; state for b persisted across runs
    # (parquet sink is cumulative: run-2 emissions are the delta)
    assert got2 == {2, 4, 6, 7}
