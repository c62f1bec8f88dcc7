"""Hybrid source (reference HybridSource.java): bounded backfill drains
before the live phase; phase tagging exposes the switch boundary."""

from __future__ import annotations

import pandas as pd

from flink_spark.sources.hybrid import hybrid_stream, switch_position


def _write(d, name, rows):
    d.mkdir(exist_ok=True)
    pdf = pd.DataFrame(rows, columns=["id", "v"])
    pdf.to_parquet(d / name, index=False)


def test_hybrid_backfill_then_live_order(spark, tmp_path):
    bounded, live = tmp_path / "bounded", tmp_path / "live"
    _write(bounded, "h0.parquet", [(1, "a")])
    _write(bounded, "h1.parquet", [(2, "b")])
    _write(live, "l0.parquet", [(3, "c")])

    df = hybrid_stream(spark, str(bounded), str(live), with_phase=True)
    seen: list[tuple[int, int, str]] = []

    def probe(batch, bid):
        for r in batch.collect():
            seen.append((bid, r.id, r["__hybrid_phase"]))

    q = (
        df.writeStream.foreachBatch(probe)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert sorted(i for _, i, _ in seen) == [1, 2, 3]
    phase = {i: p for _, i, p in seen}
    assert phase == {1: "bounded", 2: "bounded", 3: "live"}
    # every bounded batch strictly precedes the live batch
    b_batches = [b for b, _, p in seen if p == "bounded"]
    l_batches = [b for b, _, p in seen if p == "live"]
    assert max(b_batches) < min(l_batches)


def test_switch_position_split(spark, tmp_path):
    import pytest

    bounded, live = tmp_path / "b2", tmp_path / "l2"
    _write(bounded, "h.parquet", [(1, "a")])
    _write(live, "l.parquet", [(2, "b")])
    df = hybrid_stream(spark, str(bounded), str(live), with_phase=True)
    b, l = switch_position(df)
    assert "__hybrid_phase" not in b.columns
    plain = hybrid_stream(spark, str(bounded), str(live))
    with pytest.raises(ValueError, match="with_phase"):
        switch_position(plain)
