"""Delta join: big-state-free streaming join via source-table lookups
(FLIP-486; reference
flink-table-runtime/.../operators/join/deltajoin/StreamingDeltaJoinOperator.java,
AsyncDeltaJoinRunner.java; planner StreamExecDeltaJoin).

Flink's delta join replaces the regular streaming join's twin state stores
with lookups against the *source tables' own indexes*: an arriving left
record queries the right table, and vice versa, so operator state stays
O(in-flight records) instead of O(history).

The Spark-first rendition keeps the same contract through ``foreachBatch``
incremental-view maintenance over insert-only inputs:

    Δ(L ⋈ R)  =  ΔL ⋈ R_so_far  ∪  L_before ⋈ ΔR

Each micro-batch joins only its *deltas* against compacted side tables
(bucket-partitioned parquet — the stand-in for the indexed lake table the
reference looks up), appends the join delta to the sink, then appends the
deltas to the side tables. No per-key operator state exists at all — the
state IS the stored table, exactly the delta-join trade.

Scale notes (100 TB): the per-batch work is |ΔL| ⋈ R + L ⋈ |ΔR| with the
delta side small — AQE broadcasts it, and the store is partitioned by a
key-hash bucket so a delta carrying few buckets prunes most store
partitions at scan time (the parquet analog of the reference's index
lookup). The append-only sink write is idempotent per micro-batch only if
the sink dedupes on batch id — production would land it in a table format
with MERGE; the local parquet append is the test bridge.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_BUCKET = "__dj_bucket"


def _bucketed(df: DataFrame, keys: list[str], num_buckets: int) -> DataFrame:
    return df.withColumn(
        _BUCKET, F.pmod(F.hash(*[F.col(k) for k in keys]), F.lit(num_buckets))
    )


def delta_join(
    tagged: DataFrame,
    left_cols: list[str],
    right_cols: list[str],
    left_keys: list[str],
    right_keys: list[str],
    num_buckets: int = 16,
    prefix: str = "delta_join",
    ttl: str | None = None,
    left_ts: str | None = None,
    right_ts: str | None = None,
) -> DataFrame:
    """Drain a two-sided tagged stream through an incremental delta join;
    return the append-only join result as a batch DataFrame.

    ``tagged`` is a streaming DataFrame shaped ``__side: 'L'|'R'`` plus the
    union of both sides' (disjoint) columns, nulls on the foreign side —
    the single-query bridge for Spark's one-sink-per-query model (the
    reference operator is a genuine TwoInputStreamOperator).

    ``ttl`` (with ``left_ts``/``right_ts``) bounds store growth the way
    `table.exec.state.ttl` bounds Flink's regular-join state: each
    batch's lookups ignore store rows older than ``batch_max_ts - ttl``
    (at 100 TB the physical removal is the store table's compaction job),
    and pairs must satisfy ``|l.ts - r.ts| <= ttl`` — under in-order
    delivery a TTL'd regular join degenerates to exactly this interval
    band (the equivalence Flink's own docs draw), which is what makes
    the TTL path exactly oracle-checkable.
    """
    import pandas as pd

    spark = tagged.sparkSession
    ttl_delta = pd.Timedelta(ttl) if ttl else None
    root = tempfile.mkdtemp(prefix=f"flink_spark_{prefix}_")
    l_store, r_store = f"{root}/left", f"{root}/right"
    out_dir, ckpt = f"{root}/out", f"{root}/ckpt"

    def process(batch: DataFrame, batch_id: int) -> None:
        batch = batch.persist()
        try:
            delta_l = _bucketed(
                batch.filter(F.col("__side") == "L").select(*left_cols),
                left_keys, num_buckets,
            ).persist()
            delta_r = _bucketed(
                batch.filter(F.col("__side") == "R").select(*right_cols),
                right_keys, num_buckets,
            ).persist()
            sess = batch.sparkSession
            have_l = os.path.isdir(l_store)
            have_r = os.path.isdir(r_store)
            old_l = sess.read.parquet(l_store) if have_l else None
            old_r = sess.read.parquet(r_store) if have_r else None
            if ttl_delta is not None:
                # state TTL: under in-order delivery, store rows older
                # than (batch's earliest event time - ttl) can never be
                # matched by this or any later batch — skip them
                lo = (
                    delta_l.agg(F.min(left_ts).alias("m")).collect()[0].m,
                    delta_r.agg(F.min(right_ts).alias("m")).collect()[0].m,
                )
                lwm = min((t for t in lo if t is not None), default=None)
                if lwm is not None:
                    cutoff = lwm - ttl_delta
                    if old_l is not None:
                        old_l = old_l.filter(F.col(left_ts) >= F.lit(cutoff))
                    if old_r is not None:
                        old_r = old_r.filter(F.col(right_ts) >= F.lit(cutoff))

            def join(lf: DataFrame, rf: DataFrame) -> DataFrame:
                # explicit aliases: both deltas descend from the same
                # micro-batch DataFrame, so bare column refs are ambiguous
                l, r = lf.alias("__dj_l"), rf.alias("__dj_r")
                cond = [F.col(f"__dj_l.{_BUCKET}") == F.col(f"__dj_r.{_BUCKET}")]
                cond += [
                    F.col(f"__dj_l.{lk}") == F.col(f"__dj_r.{rk}")
                    for lk, rk in zip(left_keys, right_keys)
                ]
                if ttl_delta is not None:
                    # NTZ → LTZ is value-preserving (session tz is UTC);
                    # LTZ → double = epoch seconds, same IEEE op DuckDB's
                    # epoch() performs
                    lts = (
                        F.col(f"__dj_l.{left_ts}").cast("timestamp").cast("double")
                    )
                    rts = (
                        F.col(f"__dj_r.{right_ts}").cast("timestamp").cast("double")
                    )
                    cond.append(
                        F.abs(lts - rts) <= ttl_delta.total_seconds()
                    )
                return l.join(r, cond).select(
                    *[F.col(f"__dj_l.{c}") for c in left_cols],
                    *[F.col(f"__dj_r.{c}") for c in right_cols],
                )

            # ΔL ⋈ (R_before ∪ ΔR)  ∪  L_before ⋈ ΔR  — each result pair
            # produced exactly once regardless of batch placement
            r_all = old_r.unionByName(delta_r) if old_r is not None else delta_r
            out = join(delta_l, r_all)
            if old_l is not None:
                out = out.unionByName(join(old_l, delta_r))
            out.write.mode("append").parquet(out_dir)

            delta_l.write.mode("append").partitionBy(_BUCKET).parquet(l_store)
            delta_r.write.mode("append").partitionBy(_BUCKET).parquet(r_store)
        finally:
            batch.unpersist()

    q = (
        tagged.writeStream.foreachBatch(process)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    if not os.path.isdir(out_dir):
        from pyspark.sql.types import StructType

        empty = StructType(
            [f for f in tagged.schema.fields if f.name in set(left_cols + right_cols)]
        )
        return spark.createDataFrame([], empty)
    # materialize off the temp store so it can be pruned eagerly
    result = spark.read.parquet(out_dir).localCheckpoint(eager=True)
    shutil.rmtree(root, ignore_errors=True)
    return result


def tag_union(
    left: DataFrame, right: DataFrame, left_cols: list[str], right_cols: list[str]
) -> DataFrame:
    """Union two (streaming) inputs into the tagged two-sided shape
    ``delta_join`` consumes; column sets must be disjoint."""
    overlap = set(left_cols) & set(right_cols)
    if overlap:
        raise ValueError(f"delta join sides must have disjoint columns: {overlap}")
    l_part = left.select(
        F.lit("L").alias("__side"),
        *left_cols,
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(c) for c in right_cols],
    )
    r_part = right.select(
        F.lit("R").alias("__side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left_cols],
        *right_cols,
    )
    return l_part.unionByName(r_part)
