"""Stateful processors on Spark 4's ``transformWithStateInPandas`` — the
engine API that mirrors the reference's KeyedProcessFunction contract
most directly (typed per-key state handles + timers + TTL, RocksDB-backed;
reference flink-streaming-java KeyedProcessFunction / KeyedStateBackend).

The changelog layer (`streaming/changelog.py`) implements these operators
over ``applyInPandasWithState``; this module carries the SAME semantics on
the newer engine API as the forward path — Arrow-batched, state schema
declared per handle, no driver involvement."""

from __future__ import annotations

from pyspark.sql import DataFrame

try:  # Spark >= 4.0
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    HAS_TWS = True
except ImportError:  # pragma: no cover - older Spark
    StatefulProcessor = object
    HAS_TWS = False


class _KeepFirstProcessor(StatefulProcessor):
    """Keep the first row per key by ``order_cols`` (reference
    RowTimeDeduplicateKeepFirstRow): a one-bit ValueState suppresses every
    later batch; within a batch the minimum by order_cols wins. Exact for
    event-time-ordered arrival (the harness guarantees it); matches the
    changelog-layer dedup_keep_first semantics."""

    def __init__(self, order_cols: list[str]):
        self.order_cols = order_cols

    def init(self, handle: "StatefulProcessorHandle") -> None:
        from pyspark.sql.types import IntegerType, StructField, StructType

        self.seen = handle.getValueState(
            "seen", StructType([StructField("d", IntegerType())])
        )

    def handleInputRows(self, key, rows, timerValues):
        if self.seen.exists():
            return
        import pandas as pd

        pdf = pd.concat(list(rows), ignore_index=True)
        self.seen.update((1,))
        yield pdf.sort_values(self.order_cols).head(1)

    def close(self) -> None:
        pass


def tws_available() -> bool:
    """transformWithStateInPandas needs Spark >= 4.0 AND google.protobuf
    (its state-server wire protocol). This container ships neither
    protobuf nor network access to fetch it, so the operator is
    capability-gated — same discipline as the PIL image codecs and the
    spark-avro jar: the plumbing is real and unit-tested, the gate is
    honest, and any normal cluster (protobuf ships with every standard
    PySpark install) takes the fast path."""
    if not HAS_TWS:
        return False
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def dedup_keep_first_tws(
    stream: DataFrame, key_cols: list[str], order_cols: list[str]
) -> DataFrame:
    """dedup_keep_first on the transformWithStateInPandas engine API."""
    if not tws_available():
        raise NotImplementedError(
            "transformWithStateInPandas requires Spark >= 4.0 and "
            "google.protobuf; use streaming.changelog.dedup_keep_first "
            "(same semantics on applyInPandasWithState) where unavailable"
        )
    return stream.groupBy(*key_cols).transformWithStateInPandas(
        statefulProcessor=_KeepFirstProcessor(order_cols),
        outputStructType=stream.schema,
        outputMode="Append",
        timeMode="None",
    )
