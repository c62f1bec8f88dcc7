"""Checkpoint-stop-resume test — our analog of the reference's restore
tests (RestoreTestBase.java:107, restore-tests/ 60 suites): a stateful
operator is drained, the query STOPS, more data arrives, and a NEW query
started from the same checkpoint must resume the exact state (keys seen
before the restart stay absorbed)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from flink_spark.sources.tables import load_table
from flink_spark.streaming import changelog as CL


@pytest.mark.slow
def test_checkpoint_restore_dedup_keep_first(spark, sf_dir, tmp_path):
    src = tmp_path / "src"
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") <= 100)
        .select("event_id", "ts", "user_id")
    )
    # split by event time so (file order) == (event-time order): the
    # resumed run's rows are all later than the first run's
    cut = ev.selectExpr(
        "percentile(CAST(CAST(ts AS TIMESTAMP) AS LONG), 0.5) AS c"
    ).collect()[0]["c"]
    early = ev.filter(F.col("ts").cast("timestamp").cast("long") <= cut)
    late = ev.filter(F.col("ts").cast("timestamp").cast("long") > cut)

    schema = ev.schema

    def run_once():
        stream = spark.readStream.schema(schema).parquet(str(src))
        out = CL.dedup_keep_first(stream, ["user_id"], ["ts", "event_id"])
        q = (
            out.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def land(df, stage: str) -> None:
        # the file stream source lists the top-level dir: land each batch's
        # part-file directly in it
        import glob
        import shutil

        staging = tmp_path / f"stage_{stage}"
        df.coalesce(1).write.mode("overwrite").parquet(str(staging))
        (part,) = glob.glob(str(staging / "part-*.parquet"))
        shutil.move(part, str(src / f"{stage}.parquet"))

    land(early, "batch1")
    run_once()  # run 1: first rows per user from the early half

    land(late, "batch2")
    run_once()  # run 2: NEW query object, restored from the checkpoint

    got = spark.read.schema(schema).parquet(sink)
    # users seen in run 1 must NOT re-emit in run 2 — state survived the stop
    assert got.groupBy("user_id").count().filter(F.col("count") > 1).count() == 0

    from flink_spark.operators.rank import dedup_keep_first as batch_keep_first

    expected = batch_keep_first(ev, ["user_id"], "ts", tiebreak=["event_id"])
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, expected.select("event_id", "ts", "user_id").collect())
    )
