"""Split-distinct aggregation — the engine's analog of the reference's
SplitAggregateRule (flink-table-planner/.../rules/physical/stream/
SplitAggregateRule.java; docs 'split distinct aggregation'): a
COUNT(DISTINCT x) on a hot group key funnels every distinct value of that
group through one reducer/state cell. Splitting by a hash bucket of the
DISTINCT key turns it into two bounded phases:

    phase 1:  GROUP BY keys, hash(x) % n  →  per-bucket distinct count
    phase 2:  GROUP BY keys               →  SUM of bucket counts

Phase 1's state per cell is |distinct(x)| / n on average (the hot group's
distinct set is sharded across n cells); phase 2 aggregates n small
integers per group. Exact — a distinct value lands in exactly one bucket.

Spark's batch planner expands multi-distinct aggregates automatically,
but the per-group distinct SET still lives in one partition's hash map;
the explicit split is the 100 TB remedy for a skewed hot group, same as
the reference's rule, and doubles as the streaming local/global split
when applied over the changelog layer."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_distinct_count(
    df: DataFrame,
    group_cols: list[str],
    distinct_col: str,
    n_buckets: int = 16,
    out_col: str = "n_distinct",
    extra_aggs: list | None = None,
) -> DataFrame:
    """COUNT(DISTINCT distinct_col) GROUP BY group_cols via the two-phase
    bucket split. ``extra_aggs``: additional (already-splittable)
    aggregate Columns evaluated alongside — each must be expressed over
    phase-1 partials by the caller; the common case (COUNT(*)/SUM) is
    handled by passing e.g. ``[F.sum("__cnt").alias("n_rows")]`` with the
    phase-1 partial ``__cnt`` emitted automatically."""
    bucket = F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(n_buckets))
    p1 = (
        df.groupBy(*group_cols, bucket.alias("__bkt"))
        .agg(
            F.countDistinct(distinct_col).alias("__pd"),
            F.count(F.lit(1)).alias("__cnt"),
        )
    )
    aggs = [F.sum("__pd").cast("long").alias(out_col)]
    if extra_aggs:
        aggs += list(extra_aggs)
    return p1.groupBy(*group_cols).agg(*aggs)
