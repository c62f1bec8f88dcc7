"""Trigger DSL mapping (streaming/triggers.py): each supported emit mode
drives a real Structured Streaming query over the events file source."""

from __future__ import annotations

import pytest

import time

from pyspark.sql import functions as F

from tests.conftest import SMOKE_SF_DIR


def _counts_stream(spark):
    from flink_spark.streaming.core import stream_table

    ev = stream_table(spark, SMOKE_SF_DIR, "events", watermark=("ts", "1 minute"))
    return ev.groupBy("event_type").agg(F.count("*").alias("n"))


@pytest.mark.slow
def test_drain_mode_processes_everything(spark):
    from flink_spark.streaming.triggers import start_stream

    q = start_stream(
        _counts_stream(spark), query_name="trg_drain",
        output_mode="complete", mode="drain",
    )
    q.awaitTermination()
    rows = {r["event_type"]: r["n"] for r in spark.table("trg_drain").collect()}
    assert sum(rows.values()) == 1000


@pytest.mark.slow
def test_interval_mode_early_firings(spark):
    from flink_spark.streaming.triggers import start_stream

    q = start_stream(
        _counts_stream(spark), query_name="trg_interval",
        output_mode="complete", mode="interval", interval="200 milliseconds",
    )
    try:
        deadline = time.time() + 30
        total = 0
        while time.time() < deadline:
            rows = spark.table("trg_interval").collect()
            total = sum(r["n"] for r in rows)
            if total == 1000:
                break
            time.sleep(0.3)
        assert total == 1000
    finally:
        q.stop()


def test_unknown_mode_rejected(spark):
    import pytest

    from flink_spark.streaming.triggers import start_stream

    with pytest.raises(ValueError):
        start_stream(_counts_stream(spark), mode="bogus")
