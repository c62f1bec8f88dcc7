"""transformWithStateInPandas surface (Spark 4 stateful engine API —
the closest native mirror of the reference KeyedProcessFunction). The
engine path needs google.protobuf (absent in this container), so the
processor's logic is tested engine-free and the capability gate is
asserted honest."""

from __future__ import annotations

import pandas as pd
import pytest

from flink_spark.streaming.twstate import (
    _KeepFirstProcessor,
    dedup_keep_first_tws,
    tws_available,
)


class _FakeValueState:
    def __init__(self):
        self.v = None

    def exists(self):
        return self.v is not None

    def update(self, v):
        self.v = v


class _FakeHandle:
    def getValueState(self, name, schema):
        return _FakeValueState()


def test_keep_first_processor_batch_logic():
    p = _KeepFirstProcessor(["ts", "event_id"])
    p.init(_FakeHandle())
    b1 = pd.DataFrame({"event_id": [7, 3], "ts": [20, 20], "user_id": [1, 1]})
    out1 = list(p.handleInputRows((1,), iter([b1]), None))
    # within-batch minimum by (ts, event_id) wins
    assert len(out1) == 1 and out1[0].iloc[0].event_id == 3
    # a later batch for the same key is fully suppressed by ValueState
    b2 = pd.DataFrame({"event_id": [1], "ts": [5], "user_id": [1]})
    assert list(p.handleInputRows((1,), iter([b2]), None)) == []


def test_capability_gate_is_honest(spark):
    """Where protobuf is missing the operator must raise, not silently
    degrade; where present, the builder path exists (smoke via plan)."""
    sdf = (
        spark.readStream.format("rate").load()
        .selectExpr("value AS k", "timestamp AS ts")
    )
    if not tws_available():
        with pytest.raises(NotImplementedError, match="protobuf"):
            dedup_keep_first_tws(sdf, ["k"], ["ts"])
    else:  # pragma: no cover - container lacks protobuf
        out = dedup_keep_first_tws(sdf, ["k"], ["ts"])
        assert out.isStreaming
