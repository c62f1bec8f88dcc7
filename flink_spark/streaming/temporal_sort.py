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
    state_ttl: str | None = None,
) -> DataFrame:
    """Per-key event-time sort; adds ``seq`` (per-key emission index,
    1-based) — observable as ROW_NUMBER() OVER (PARTITION BY key ORDER BY
    ts, tiebreak) over the emitted subset.

    ``state_ttl`` (reference StateTtlConfig, `table.exec.state.ttl`):
    the seq counter restarts at 1 whenever the *event-time* gap between
    consecutive rows of the key exceeds the TTL. Defining expiry on
    event-time gaps (not on arrival/processing time) makes the semantics
    arrival-independent — a single-batch drain and a multi-batch run
    produce identical output, so the exact LAG-islands SQL oracle holds.
    Memory reclamation: once a key has nothing buffered and has been idle
    past the TTL, an event-time timer REMOVES its state row entirely
    (the timer fires one extra TTL late so the watermark delay cannot
    observe-before-expiry; an idle key's state lives ≤ 2×TTL)."""
    import pandas as pd

    tiebreak_cols = tiebreak_cols or []
    cols = stream.schema.fieldNames()
    sort_cols = [ts_col, *tiebreak_cols]
    ttl_ms = int(pd.Timedelta(state_ttl).value // 1_000_000) if state_ttl else None
    out_schema = StructType(
        [*stream.schema.fields, StructField("seq", LongType(), False)]
    )
    state_schema = StructType(
        [
            StructField("emitted", LongType(), False),
            StructField("last_ts_ms", LongType(), True),
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
            emitted, last_ts = state.get[0], state.get[1]
            buf = pickle.loads(base64.b64decode(state.get[2]))
            chunks.append(buf)
        else:
            emitted, last_ts = 0, None
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
        seqs = []
        if len(out):
            out = out.copy()
            for t in _ts_ms(out[ts_col]):
                if (
                    ttl_ms is not None
                    and last_ts is not None
                    and int(t) - last_ts > ttl_ms
                ):
                    emitted = 0  # TTL expiry between rows → fresh counter
                emitted += 1
                seqs.append(emitted)
                last_ts = int(t)
            out["seq"] = seqs
        if len(rest):
            state.update(
                (
                    emitted,
                    last_ts,
                    base64.b64encode(pickle.dumps(rest)).decode("ascii"),
                )
            )
            # wake this key as soon as the watermark moves again
            state.setTimeoutTimestamp(wm + 1)
        elif state.exists or len(out):
            if (
                ttl_ms is not None
                and last_ts is not None
                and wm > last_ts + 2 * ttl_ms
            ):
                state.remove()  # idle past TTL and nothing buffered
            else:
                state.update(
                    (
                        emitted,
                        last_ts,
                        base64.b64encode(pickle.dumps(rest)).decode("ascii"),
                    )
                )
                if ttl_ms is not None and last_ts is not None:
                    state.setTimeoutTimestamp(last_ts + 2 * ttl_ms)
        if len(out):
            yield out

    return stream.groupBy(*key_cols).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
    )
