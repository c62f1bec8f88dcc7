"""Streaming OVER aggregation (reference StreamExecOverAggregate.java:105;
runtime .../operators/over/RowTimeRowsUnboundedPrecedingFunction family —
13 {proc,row}-time × {range,rows} × bounded/unbounded variants).

Spark has no native streaming over-window, so this is a keyed stateful
processor: per key, an accumulator (count + exact decimal sum) carried in
the state store across micro-batches; rows inside a batch are processed in
event-time order (``seq_cols``), not arrival order.

Determinism/exactness: the running sum accumulates integer micro-units
(each input quantized to DECIMAL(30,6) exactly like the batch discipline in
queries/util.py), so emitted values are bit-identical to the SQL window
oracle regardless of batching or partitioning.

Scale: state is O(1) per key (one accumulator row); keys shuffle once to
their state partition — same shape as Flink's keyed over-agg operator.
Out-of-order rows *across* micro-batches would need the bounded-buffer
variant (sort by timer on watermark) — the bounded-input tests feed
time-ordered batches, matching row-time semantics.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def streaming_over_rows(
    stream: DataFrame,
    key_cols: list[str],
    seq_cols: list[str],
    value_col: str,
) -> DataFrame:
    """ROWS UNBOUNDED PRECEDING running count + exact sum per key.

    Emits the input columns plus ``running_cnt`` / ``running_sum`` —
    the streaming twin of
    ``SUM(v) OVER (PARTITION BY key ORDER BY seq ROWS UNBOUNDED PRECEDING)``.
    """
    import pandas as pd

    schema = stream.schema
    cols = schema.fieldNames()
    out_schema = StructType(
        [
            *schema.fields,
            StructField("running_cnt", LongType(), False),
            StructField("running_sum", DoubleType(), True),
        ]
    )
    # accumulator: count + decimal sum in micro-units (exact, as string-safe long)
    state_schema = StructType(
        [
            StructField("cnt", LongType(), False),
            StructField("sum_micro", StringType(), False),
        ]
    )

    def fn(key, pdfs, state):
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(seq_cols, kind="mergesort")[cols]
        cnt, sum_micro = (
            (state.get[0], int(state.get[1])) if state.exists else (0, 0)
        )
        cnts, sums = [], []
        for v in pdf[value_col]:
            cnt += 1
            if v is not None and v == v:  # non-null, non-NaN
                # exact double → DECIMAL(30,6) quantization (ties impossible
                # for binary doubles at 6dp, so rounding mode is moot)
                sum_micro += int(
                    Decimal(float(v)).quantize(Decimal("0.000001")) * 1_000_000
                )
            cnts.append(cnt)
            # decimal → double, correctly rounded (matches CAST AS DOUBLE)
            sums.append(float(Decimal(sum_micro).scaleb(-6)))
        state.update((cnt, str(sum_micro)))
        out = pdf.copy()
        out["running_cnt"] = cnts
        out["running_sum"] = sums
        yield out

    return stream.groupBy(*key_cols).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def streaming_over_rows_bounded(
    stream: DataFrame,
    key_cols: list[str],
    seq_cols: list[str],
    value_col: str,
    n_preceding: int,
) -> DataFrame:
    """ROWS BETWEEN n PRECEDING AND CURRENT ROW sliding sum/count per key
    (reference RowTimeRowsBoundedPrecedingFunction.java:66): keyed state
    holds only the last n+1 quantized values — O(frame) per key, the
    bounded-frame analog of the unbounded accumulator above."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = stream.schema
    cols = schema.fieldNames()
    out_schema = StructType(
        [
            *schema.fields,
            StructField("frame_cnt", LongType(), False),
            StructField("frame_sum", DoubleType(), True),
        ]
    )
    state_schema = StructType([StructField("buf", StringType(), False)])

    def fn(key, pdfs, state):
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(seq_cols, kind="mergesort")[cols]
        buf = [int(x) for x in state.get[0].split(",") if x] if state.exists else []
        cnts, sums = [], []
        for v in pdf[value_col]:
            micro = (
                int(Decimal(float(v)).quantize(Decimal("0.000001")) * 1_000_000)
                if v is not None and v == v
                else None
            )
            buf.append(micro if micro is not None else 0)
            if len(buf) > n_preceding + 1:
                buf.pop(0)
            cnts.append(len(buf))
            sums.append(float(Decimal(sum(buf)).scaleb(-6)))
        state.update((",".join(str(x) for x in buf),))
        out = pdf.copy()
        out["frame_cnt"] = cnts
        out["frame_sum"] = sums
        yield out

    return stream.groupBy(*key_cols).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def streaming_over_range_bounded(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tiebreak_cols: list[str],
    value_col: str,
    preceding: str,
) -> DataFrame:
    """RANGE BETWEEN interval PRECEDING AND CURRENT ROW per key (reference
    RowTimeRangeBoundedPrecedingFunction.java:56): keyed state retains the
    (ts, value) pairs inside the time horizon; older entries are evicted
    as each row's frame is computed — state is O(rows within horizon).

    Peer caveat: SQL RANGE frames include peers (identical ts) that sort
    AFTER the current row; this sequential processor only sees already-
    arrived rows, so it matches SQL exactly when (key, ts) is unique —
    true for the events table at every SF (verified) — and otherwise
    differs only on same-ts peers, like Flink's row-granular operator."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    horizon = pd.Timedelta(preceding)
    schema = stream.schema
    cols = schema.fieldNames()
    out_schema = StructType(
        [
            *schema.fields,
            StructField("frame_cnt", LongType(), False),
            StructField("frame_sum", DoubleType(), True),
        ]
    )
    state_schema = StructType([StructField("buf", StringType(), False)])

    def fn(key, pdfs, state):
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values([ts_col, *tiebreak_cols], kind="mergesort")[cols]
        # buffered (ts_us, micro) pairs within the horizon of the last row
        buf: list[tuple[int, int]] = []
        if state.exists and state.get[0]:
            buf = [
                (int(a), int(b))
                for a, b in (p.split(":") for p in state.get[0].split(","))
            ]
        cnts, sums = [], []
        rows_ts = pd.to_datetime(pdf[ts_col]).astype("int64") // 1000  # µs
        horizon_us = horizon.value // 1000
        vals = pdf[value_col]
        # RANGE frames: process in ts order; peers (same ts) share a frame
        # boundary but each row still sees all buffered peers ≤ its ts
        for t_us, v in zip(rows_ts, vals):
            micro = (
                int(Decimal(float(v)).quantize(Decimal("0.000001")) * 1_000_000)
                if v is not None and v == v
                else 0
            )
            buf.append((int(t_us), micro))
            lo = t_us - horizon_us
            buf = [(t, m) for t, m in buf if t >= lo]
            cnts.append(len(buf))
            sums.append(float(Decimal(sum(m for _, m in buf)).scaleb(-6)))
        state.update((",".join(f"{t}:{m}" for t, m in buf),))
        out = pdf.copy()
        out["frame_cnt"] = cnts
        out["frame_sum"] = sums
        yield out

    return stream.groupBy(*key_cols).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
