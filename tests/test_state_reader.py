"""Offline state reading (reference flink-state-processor-api
SavepointReader): a drained streaming aggregation's checkpoint must
expose exactly the aggregate state, and the metadata must inventory the
operator."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from flink_spark.streaming.state_reader import read_keyed_state, state_metadata


def _run_agg(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    pd.DataFrame(
        {"k": ["a", "a", "b", "c", "b"], "v": [1, 2, 5, 7, 3]}
    ).to_parquet(src / "p0.parquet", index=False)
    sdf = spark.readStream.schema("k string, v long").parquet(str(src))
    agg = sdf.groupBy("k").agg(
        F.sum("v").alias("total"), F.count("*").alias("n")
    )
    q = (
        agg.writeStream.outputMode("update").format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return str(tmp_path / "ckpt")


def test_read_keyed_state_matches_aggregate(spark, tmp_path):
    ckpt = _run_agg(spark, tmp_path)
    st = read_keyed_state(spark, ckpt)
    # the store holds the operator's INTERNAL aggregation buffers —
    # field names are the buffer slots (sum/count), not output aliases
    got = sorted((r["key_k"], r["sum"], r["count"]) for r in st.collect())
    assert got == [("a", 3, 2), ("b", 8, 2), ("c", 7, 1)]


def test_state_metadata_inventories_operator(spark, tmp_path):
    ckpt = _run_agg(spark, tmp_path)
    meta = state_metadata(spark, ckpt).collect()
    assert len(meta) >= 1
    row = meta[0]
    assert row.operatorId == 0
    assert row.operatorName == "stateStoreSave"  # the agg's state op
    assert row.numPartitions > 0 and row.maxBatchId >= 0


def test_read_raw_structs(spark, tmp_path):
    ckpt = _run_agg(spark, tmp_path)
    raw = read_keyed_state(spark, ckpt, flatten=False)
    assert set(raw.columns) >= {"key", "value", "partition_id"}
