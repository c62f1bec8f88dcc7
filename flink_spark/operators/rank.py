"""Top-N and deduplication operators.

Reference semantics:
  - Top-N: reference StreamExecRank.java:93 (AppendOnlyTopNFunction etc.) —
    ROW_NUMBER over (PARTITION BY keys ORDER BY sort) filtered to <= N.
  - Deduplicate keep-first/keep-last: reference StreamExecDeduplicate.java:94
    — first/last row per key by time attribute.

Spark lowering: row_number + filter. Catalyst rewrites this into a per-
partition top-k (WindowGroupLimit / rank-limit pushdown) so each shuffle
partition only keeps N rows before the final per-key pass — the property
that makes Top-N viable at 100 TB. Deduplication is Top-1.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_n(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    n: int,
    rank_col: str = "rn",
    keep_rank: bool = True,
) -> DataFrame:
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= n
    )
    return out if keep_rank else out.drop(rank_col)


def dedup_keep_first(
    df: DataFrame, keys: list[str], ts_col: str, tiebreak: list[str] | None = None
) -> DataFrame:
    """First row per key by event time (deterministic via tiebreak cols)."""
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in (tiebreak or [])]
    return top_n(df, keys, order, 1, keep_rank=False)


def dedup_keep_last(
    df: DataFrame, keys: list[str], ts_col: str, tiebreak: list[str] | None = None
) -> DataFrame:
    order = [F.col(ts_col).desc()] + [F.col(c).desc() for c in (tiebreak or [])]
    return top_n(df, keys, order, 1, keep_rank=False)


def salted_top_n(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    n: int,
    salt_buckets: int = 16,
    rank_col: str = "rn",
) -> DataFrame:
    """Skew-resistant Top-N: two-phase rank for hot keys.

    A plain window Top-N shuffles every row of a key to one task — a hot
    key (power-law user, null-ish default key) serializes on one core and
    can OOM it. Phase 1 ranks within (keys × random salt) and keeps ≤ n
    candidates per salt — map-reducible, bounded per task; phase 2 ranks
    the ≤ n·salt_buckets survivors per key. Same result set as ``top_n``
    for any deterministic total order; cost shifts from |hot key| to
    n·salt_buckets. (The same remedy Flink applies via SplitAggregateRule
    to skewed distinct aggs; AQE skew-join handles the join analog.)
    """
    salted = df.withColumn(
        "__salt", (F.rand(seed=7) * salt_buckets).cast("int")
    )
    w1 = Window.partitionBy(*partition_by, "__salt").orderBy(*order_by)
    cand = (
        salted.withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= n)
        .drop("__salt", "__r1")
    )
    w2 = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        cand.withColumn(rank_col, F.row_number().over(w2))
        .filter(F.col(rank_col) <= n)
    )
