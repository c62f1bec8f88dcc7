"""Streaming temporal sort (reference StreamExecTemporalSort.java;
runtime .../operators/sort/RowTimeSortOperator.java): emit a keyed stream
in event-time order, holding rows back until the watermark passes them.

Spark has no native streaming sort, so this is a keyed stateful processor
(``applyInPandasWithState`` + event-time timeout):

  - rows arriving in a micro-batch join the key's state buffer;
  - rows whose event time is at or below the current watermark are emitted
    in (ts, tiebreak) order with a per-key emission sequence number;
  - the remainder stays buffered, and an event-time timeout at
    watermark+1ms re-invokes the key when the watermark advances (the
    post-drain timeout batch is what flushes the tail), mirroring Flink's
    registerEventTimeTimer(timestamp) in RowTimeSortOperator#onEventTime.

Rows inside the final watermark-delay horizon stay buffered at stream end
— the same semantics as Flink, where a row is only released once a higher
watermark proves no earlier row can still arrive.

Scale: state is one buffer per key holding only the rows inside the
watermark horizon (bounded by delay × per-key rate); keys shuffle once to
their state partition, identical to Flink's keyed sort operator.
"""

from __future__ import annotations

import base64
import pickle

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType


def temporal_sort(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key event-time sort; adds ``seq`` (per-key emission index,
    1-based) — observable as ROW_NUMBER() OVER (PARTITION BY key ORDER BY
    ts, tiebreak) over the emitted subset."""
    import pandas as pd

    tiebreak_cols = tiebreak_cols or []
    cols = stream.schema.fieldNames()
    sort_cols = [ts_col, *tiebreak_cols]
    out_schema = StructType(
        [*stream.schema.fields, StructField("seq", LongType(), False)]
    )
    state_schema = StructType(
        [
            StructField("emitted", LongType(), False),
            StructField("buf", StringType(), False),
        ]
    )

    def _ts_ms(s: "pd.Series") -> "pd.Series":
        # event-time in watermark units (ms, truncated like Spark's
        # EventTimeStatsAccum) — tz-aware ns → ms
        return pd.to_datetime(s).astype("int64") // 1_000_000

    def fn(key, pdfs, state):
        chunks = [p[cols] for p in pdfs if len(p)]
        if state.exists:
            emitted = state.get[0]
            buf = pickle.loads(base64.b64decode(state.get[1]))
            chunks.append(buf)
        else:
            emitted = 0
        allrows = (
            pd.concat(chunks, ignore_index=True)
            if chunks
            else pd.DataFrame(columns=cols)
        )
        wm = state.getCurrentWatermarkMs()
        if len(allrows):
            eligible_mask = _ts_ms(allrows[ts_col]) <= wm
            out = allrows[eligible_mask].sort_values(sort_cols, kind="mergesort")
            rest = allrows[~eligible_mask]
        else:
            out = rest = allrows
        if len(rest):
            state.update(
                (
                    emitted + len(out),
                    base64.b64encode(pickle.dumps(rest)).decode("ascii"),
                )
            )
            # wake this key as soon as the watermark moves again
            state.setTimeoutTimestamp(wm + 1)
        elif state.exists or len(out):
            state.update((emitted + len(out), base64.b64encode(pickle.dumps(rest)).decode("ascii")))
        if len(out):
            out = out.copy()
            out["seq"] = range(emitted + 1, emitted + 1 + len(out))
            yield out

    return stream.groupBy(*key_cols).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
    )
