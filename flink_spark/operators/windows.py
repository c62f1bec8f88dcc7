"""Window table-valued functions: TUMBLE / HOP / CUMULATE / SESSION.

Reference semantics: Flink window TVFs (reference
flink-table/.../functions/sql/Sql{Tumble,Hop,Cumulate,Session}TableFunction.java,
runtime .../operators/window/tvf/slicing/SliceAssigners.java): each input row
is assigned to one or more [start, end) windows; aggregation then groups by
(window, keys).

Spark-first lowering (works identically on batch and streaming DataFrames):
  - TUMBLE → ``F.window(ts, size)``                      (native)
  - HOP    → ``F.window(ts, size, slide)``               (native)
  - SESSION→ ``F.session_window(ts, gap)``               (native)
  - CUMULATE has no built-in: lowered to an *explode of expanding window
    ends* — the row's tumble(max_size) start plus ``sequence(start+step,
    start+size, step)`` exploded, keeping ends > ts. Pure JVM expressions
    (sequence+explode), no Python; the expansion factor is size/step, the
    same row-amplification Flink's slicing assigner pays logically.

All emit ``window_start``/``window_end`` columns (TIMESTAMP_NTZ in, same
out), matching the TVF's virtual columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _flatten_window(df: DataFrame, w: Column) -> DataFrame:
    return (
        df.withColumn("__w", w)
        .withColumn("window_start", F.col("__w.start"))
        .withColumn("window_end", F.col("__w.end"))
        .drop("__w")
    )


def tumble(df: DataFrame, ts_col: str, size: str) -> DataFrame:
    """TUMBLE(table, DESCRIPTOR(ts), size) — fixed, non-overlapping."""
    return _flatten_window(df, F.window(ts_col, size))


def hop(df: DataFrame, ts_col: str, slide: str, size: str) -> DataFrame:
    """HOP(table, DESCRIPTOR(ts), slide, size) — sliding windows.

    F.window emits one struct per covering window (rows with size/slide
    window memberships are expanded by Spark's generated expand node —
    exactly Flink's slice expansion)."""
    return _flatten_window(df, F.window(ts_col, size, slide))


def session(df: DataFrame, ts_col: str, gap: str) -> DataFrame:
    """SESSION(table PARTITION BY k, DESCRIPTOR(ts), gap).

    Emits Spark's session_window struct; the *end* of a merged session is
    last-event-ts + gap (Flink semantics match). Must be grouped on
    (session_window, keys) by the caller in the same aggregation."""
    return df.withColumn("__w", F.session_window(ts_col, gap))


def cumulate(df: DataFrame, ts_col: str, step: str, size: str) -> DataFrame:
    """CUMULATE(table, DESCRIPTOR(ts), step, size) — expanding windows.

    A row at time t with base window start S (= tumble start for `size`)
    belongs to windows [S, S+k*step) for every k where S+k*step > t.
    Lowered to sequence()+explode of window ends — JVM-side, no UDF.
    """
    base = F.window(ts_col, size)
    ends = F.sequence(
        F.col("__base.start") + F.expr(f"INTERVAL {step}"),
        F.col("__base.end"),
        F.expr(f"INTERVAL {step}"),
    )
    return (
        df.withColumn("__base", base)
        .withColumn("window_start", F.col("__base.start"))
        .withColumn("window_end", F.explode(ends))
        .filter(F.col(ts_col) < F.col("window_end"))
        .drop("__base")
    )


def cumulate_stream(
    df: DataFrame, ts_col: str, step: str, size: str, delay: str
) -> DataFrame:
    """Streaming CUMULATE: same expanding-window explode as ``cumulate``,
    but emits a single ``window`` STRUCT<start,end> column *tagged with
    event-time watermark metadata* (``spark.watermarkDelayMs``) so that an
    append-mode aggregation grouped on it gets native watermark eviction:
    Spark's StateStoreSave purges grouped rows once watermark ≥ window.end
    — exactly Flink's cumulate fire-and-purge (reference
    .../window/tvf/common/WindowAggOperator.java:96,
    SliceAssigners.java cumulate slices).

    This is the same mechanism ``F.window_time`` uses to re-arm a window
    column as event time for chained aggregations; state is bounded by the
    number of open cumulate windows (size/step per active period).
    ``delay`` must equal the source's withWatermark delay.
    """
    import re

    m = re.fullmatch(r"\s*(\d+)\s*(\w+?)s?\s*", delay)
    unit_ms = {
        "millisecond": 1,
        "second": 1000,
        "minute": 60_000,
        "hour": 3_600_000,
        "day": 86_400_000,
    }[m.group(2).lower()]
    delay_ms = int(m.group(1)) * unit_ms

    base = F.window(ts_col, size)
    ends = F.sequence(
        F.col("__base.start") + F.expr(f"INTERVAL {step}"),
        F.col("__base.end"),
        F.expr(f"INTERVAL {step}"),
    )
    keep = [c for c in df.columns]
    w = F.struct(
        F.col("__base.start").alias("start"), F.col("__wend").alias("end")
    ).alias("window", metadata={"spark.watermarkDelayMs": delay_ms})
    return (
        df.withColumn("__base", base)
        .withColumn("__wend", F.explode(ends))
        .filter(F.col(ts_col) < F.col("__wend"))
        .select(w, *keep)
    )


def count_window(
    df: DataFrame, key_cols: list[str], order_cols: list[str], size: int
) -> DataFrame:
    """COUNT window (reference groupwindow assigners
    Tumbling/SlidingCountWindows, .../operators/window/groupwindow/assigners/
    CountTumblingWindowAssigner.java; ElementTriggers.CountElement): fixed
    N-element tumbling windows per key, by deterministic event order.

    Batch shape: one shuffle+sort (row_number), window_id = (rn-1) / size.
    Streaming shape: the same assignment runs in a keyed processor with a
    row-counter in state (count carried across micro-batches).
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(*key_cols).orderBy(*order_cols)
    return df.withColumn(
        "window_id",
        F.floor((F.row_number().over(w) - F.lit(1)) / F.lit(size)).cast("bigint"),
    )


def tumble_offset(df: DataFrame, ts_col: str, size: str, offset: str) -> DataFrame:
    """TUMBLE with window offset (reference window TVF `offset` argument,
    SliceAssigners.tumbling(...).withOffset): buckets aligned to
    epoch+offset instead of epoch. Spark: ``F.window(..., startTime)``."""
    return _flatten_window(df, F.window(ts_col, size, size, offset))
