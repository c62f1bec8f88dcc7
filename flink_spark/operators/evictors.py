"""Window evictors (reference flink-streaming-java
.../api/windowing/evictors/{TimeEvictor,CountEvictor,DeltaEvictor}.java).

Flink evictors run at window *fire* time, trimming the buffered element
set before the window function sees it. In a declarative plan the same
semantics is a pre-aggregation filter computed **relative to the window's
own content**: a window function over the window key supplies the
reference quantity (max timestamp / element rank / last element's value),
and a filter drops evicted rows — then the aggregation runs. All JVM
expressions: one extra window pass over fact rows, no Python.

These compose with any windowing that materializes window identity
columns (tumble/hop/cumulate/session from operators/windows.py). In
micro-batch streaming, the same composition applies at drain time on the
closed windows — equivalent to Flink's evict-before-emit because
eviction is a pure function of the final window content.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def time_evictor(
    df: DataFrame, window_cols: list[str], ts_col: str, keep: str
) -> DataFrame:
    """TimeEvictor.of(keep): keep only elements within ``keep`` of the
    window's max timestamp (evicts the older prefix)."""
    w = Window.partitionBy(*window_cols)
    return (
        df.withColumn("__wmax", F.max(ts_col).over(w))
        .filter(F.col(ts_col) > F.col("__wmax") - F.expr(f"INTERVAL {keep}"))
        .drop("__wmax")
    )


def count_evictor(
    df: DataFrame, window_cols: list[str], order_cols: list[str], keep_last: int
) -> DataFrame:
    """CountEvictor.of(n): keep the last ``n`` elements of the window in
    event order (evicts from the front, as Flink does)."""
    w = Window.partitionBy(*window_cols).orderBy(
        *[F.desc(c) for c in order_cols]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= keep_last)
        .drop("__rn")
    )


def delta_evictor(
    df: DataFrame,
    window_cols: list[str],
    order_cols: list[str],
    value_col: str,
    threshold: float,
) -> DataFrame:
    """DeltaEvictor.of(threshold, delta): evict elements whose |value −
    value(last element)| exceeds the threshold — the reference element is
    the window's last element in event order (DeltaEvictor docs)."""
    w = (
        Window.partitionBy(*window_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    last_val = F.last(F.col(value_col)).over(w)
    return (
        df.withColumn("__last", last_val)
        .filter(F.abs(F.col(value_col) - F.col("__last")) <= threshold)
        .drop("__last")
    )
