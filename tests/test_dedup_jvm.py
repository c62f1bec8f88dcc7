"""JVM-only event-time keep-first dedup (streaming/dedup_jvm.py —
reference StreamExecDeduplicate keep-first / RowTimeDeduplicateKeepFirstRow):
cross-micro-batch absorption, checkpoint-stop-resume exactness against
the batch oracle, and the zero-Python plan property that motivated the
operator (VERDICT r8: the applyInPandasWithState path's per-key Python
constant was the one >3x sf1 flag)."""

from __future__ import annotations

import glob
import shutil

from pyspark.sql import Window
from pyspark.sql import functions as F

from flink_spark.sources.tables import load_table
from flink_spark.streaming import storeutil
from flink_spark.streaming.dedup_jvm import (
    batch_keep_first_plan,
    dedup_keep_first_jvm,
)

COLS = ["event_id", "ts", "user_id", "event_type", "value"]


def _expected_keep_first(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(*COLS)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _land(df, tmp_path, src, stage: str) -> None:
    staging = tmp_path / f"stage_{stage}"
    df.coalesce(1).write.mode("overwrite").parquet(str(staging))
    (part,) = glob.glob(str(staging / "part-*.parquet"))
    shutil.move(part, str(src / f"{stage}.parquet"))


def test_dedup_jvm_multi_batch_absorb(spark, sf_dir, tmp_path):
    """Keys straddling micro-batch boundaries: the first batch's emission
    absorbs every later sighting — one drain, two files, one file per
    trigger, result equals the global batch keep-first."""
    src = tmp_path / "src"
    src.mkdir()
    ev = load_table(spark, sf_dir, "events").select(*COLS)
    cut = ev.selectExpr(
        "percentile(CAST(CAST(ts AS TIMESTAMP) AS LONG), 0.5) AS c"
    ).collect()[0]["c"]
    _land(ev.filter(F.col("ts").cast("timestamp").cast("long") <= cut),
          tmp_path, src, "b1")
    _land(ev.filter(F.col("ts").cast("timestamp").cast("long") > cut),
          tmp_path, src, "b2")
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    got = dedup_keep_first_jvm(stream, ["user_id"], ["ts", "event_id"])
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, _expected_keep_first(spark, sf_dir).collect())
    )


def test_dedup_jvm_restore(spark, sf_dir, tmp_path):
    """Stop-resume (RestoreTestBase analog): drain the early half with a
    durable root, then land the late half and drain again with the SAME
    root — run 2 must resume from the checkpoint and absorb every key
    run 1 already emitted; the union equals the uninterrupted oracle."""
    src = tmp_path / "src"
    src.mkdir()
    root = str(tmp_path / "dedup_root")
    ev = load_table(spark, sf_dir, "events").select(*COLS)
    cut = ev.selectExpr(
        "percentile(CAST(CAST(ts AS TIMESTAMP) AS LONG), 0.5) AS c"
    ).collect()[0]["c"]
    # users % 3 == 0 land ENTIRELY in run 2 (their event-time order is
    # preserved, so the batch oracle still holds) — run 1 must then emit
    # a strict subset and run 2 both absorbs old keys and emits new ones
    in_run1 = (
        (F.col("ts").cast("timestamp").cast("long") <= cut)
        & (F.col("user_id") % 3 != 0)
    )
    early = ev.filter(in_run1)
    late = ev.filter(~in_run1)

    def run_once():
        stream = spark.readStream.schema(ev.schema).parquet(str(src))
        return dedup_keep_first_jvm(
            stream, ["user_id"], ["ts", "event_id"], root=root
        )

    _land(early, tmp_path, src, "b1")
    run1 = run_once().collect()
    _land(late, tmp_path, src, "b2")
    got = run_once().collect()  # resumed: checkpoint skips b1

    expected = sorted(map(tuple, _expected_keep_first(spark, sf_dir).collect()))
    assert sorted(map(tuple, got)) == expected
    # the restart genuinely exercised cross-run absorption: run 1 emitted
    # a strict, non-empty subset (late-half keys exist, early keys absorb)
    assert 0 < len(run1) < len(expected)


def test_dedup_jvm_replay_idempotent(spark, sf_dir, tmp_path):
    """foreachBatch re-delivery (crash between writes and checkpoint
    commit): re-running a batch id overwrites its own partitions with
    identical content instead of double-appending, and its anti-join
    reads only strictly-earlier partitions."""
    import os

    from flink_spark.streaming.dedup_jvm import _has_parquet

    src = tmp_path / "src"
    src.mkdir()
    root = str(tmp_path / "dedup_root")
    ev = load_table(spark, sf_dir, "events").select(*COLS).limit(2000)
    _land(ev, tmp_path, src, "b1")
    stream = spark.readStream.schema(ev.schema).parquet(str(src))
    first = dedup_keep_first_jvm(
        stream, ["user_id"], ["ts", "event_id"], root=root
    )
    n1 = first.count()
    # simulate re-delivery of batch 0: wipe the CHECKPOINT only (writes
    # survived), re-drain the same source from scratch
    shutil.rmtree(f"{root}/ckpt")
    stream2 = spark.readStream.schema(ev.schema).parquet(str(src))
    again = dedup_keep_first_jvm(
        stream2, ["user_id"], ["ts", "event_id"], root=root
    )
    assert again.count() == n1
    assert _has_parquet(os.path.join(root, "out"))


def test_dedup_jvm_plan_is_python_free(spark, sf_dir):
    """The motivating property: the per-batch plan contains no Python
    eval node of any kind (the applyInPandasWithState twin pays ~50us
    per key per batch in Python — this path must not)."""
    ev = load_table(spark, sf_dir, "events").select(*COLS)
    # seen buckets must match production's persisted bucketing
    # (storeutil.portable_bucket), not Spark's session hash() — a
    # mismatched fixture would silently break any result assertion
    # added here later (ADVICE r10)
    seen = ev.select(
        storeutil.portable_bucket(16, "user_id").alias("__bucket"),
        "user_id",
    ).limit(10)
    plan = batch_keep_first_plan(
        ev, ["user_id"], ["ts", "event_id"], 16, seen
    )._jdf.queryExecution().executedPlan().toString()
    for marker in ("Python", "Pandas", "Arrow"):
        assert marker not in plan, f"{marker} node in plan:\n{plan}"
    assert "WindowGroupLimit" in plan  # rn=1 prunes below the exchange


def test_dedup_jvm_store_compaction(spark, sf_dir, tmp_path):
    """Store compaction (partition-count bound for long streams): each
    micro-batch introduces a fresh user group (so every batch lands a
    store partition), and with compact_every=2 the earlier bid
    partitions fold into __bid=-1 via the crash-safe swap — the result
    stays exact, and a resumed drain of re-delivered rows is still
    absorbed by keys that now live only in the COMPACTED partition."""
    import os

    src = tmp_path / "src"
    src.mkdir()
    root = str(tmp_path / "dedup_root")
    ev = load_table(spark, sf_dir, "events").select(*COLS)
    # one user group per file → every batch emits new keys
    for i in range(4):
        _land(ev.filter(F.col("user_id") % 4 == i), tmp_path, src, f"b{i}")

    def run_once():
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1).parquet(str(src))
        )
        return dedup_keep_first_jvm(
            stream, ["user_id"], ["ts", "event_id"],
            root=root, compact_every=2,
        )

    got = run_once()
    expected = sorted(
        map(tuple, _expected_keep_first(spark, sf_dir).collect())
    )
    assert sorted(map(tuple, got.collect())) == expected
    bids = sorted(
        d for d in os.listdir(f"{root}/seen") if d.startswith("__bid=")
    )
    # batch 3 compacted bids {−1 (from batch-1's fold), 1, 2} → −1 and
    # kept its own partition: exactly two remain, not one-per-batch
    assert bids == ["__bid=-1", "__bid=3"], bids

    # resume with re-delivered rows of group 0 (later sightings): their
    # keys live ONLY in the compacted partition now and must absorb
    _land(ev.filter(F.col("user_id") % 4 == 0), tmp_path, src, "b4")
    got2 = run_once()
    assert sorted(map(tuple, got2.collect())) == expected


def test_has_parquet_ignores_uncommitted_staging(tmp_path):
    """A write that crashed mid-commit leaves only _temporary staging:
    read.parquet ignores it, so _has_parquet must too — counting it
    wedges a durable-root resume on 'unable to infer schema'. Partition
    dirs (name=value) stay visible even underscore-prefixed."""
    from flink_spark.streaming.dedup_jvm import _has_parquet

    d = tmp_path / "store"
    staging = d / "_temporary" / "0" / "task_x"
    staging.mkdir(parents=True)
    (staging / "part-0.parquet").write_bytes(b"x")
    assert not _has_parquet(str(d))
    part = d / "__bid=0" / "__bucket=1"
    part.mkdir(parents=True)
    (part / "part-1.parquet").write_bytes(b"x")
    assert _has_parquet(str(d))


def test_dedup_jvm_persistent_out_fold(spark, sf_dir, tmp_path):
    """Durable-root drains fold the OUT dir's per-batch partitions too
    (one partition per batch forever is the listing-cost blowup the
    seen-store fold exists to prevent), and the folded sink still
    equals the batch oracle exactly across a resume."""
    import os

    src = tmp_path / "src"
    src.mkdir()
    root = str(tmp_path / "root")
    ev = load_table(spark, sf_dir, "events").select(*COLS)
    cut = ev.selectExpr(
        "percentile(CAST(CAST(ts AS TIMESTAMP) AS LONG), 0.5) AS c"
    ).collect()[0]["c"]
    tl = F.col("ts").cast("timestamp").cast("long")
    early = ev.filter(tl <= cut)
    late = ev.filter(tl > cut)
    # split early into four TIME-ordered files (keep-first's contract is
    # in-order delivery) and OFFSET each file's key space so every batch
    # introduces fresh keys — otherwise batches past the first emit
    # nothing and the out dir never accumulates partitions to fold
    qs = early.selectExpr(
        "percentile(CAST(CAST(ts AS TIMESTAMP) AS LONG), "
        "array(0.25D, 0.5D, 0.75D)) AS q"
    ).collect()[0]["q"]
    bounds = [None, *qs, None]
    landed = []
    for i in range(4):
        part_df = early
        if bounds[i] is not None:
            part_df = part_df.filter(tl > bounds[i])
        if bounds[i + 1] is not None:
            part_df = part_df.filter(tl <= bounds[i + 1])
        part_df = part_df.withColumn(
            "user_id", F.col("user_id") + F.lit(i * 10_000)
        )
        landed.append(part_df)
        _land(part_df, tmp_path, src, f"a{i}")
    late = late.withColumn("user_id", F.col("user_id") + F.lit(40_000))

    def drain():
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        return dedup_keep_first_jvm(
            stream, ["user_id"], ["ts", "event_id"],
            root=root, compact_every=2,
        )

    drain()
    _land(late, tmp_path, src, "b1")
    got = drain()  # resumed from the same root
    union = landed[0]
    for part_df in landed[1:] + [late]:
        union = union.unionByName(part_df)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    expected = (
        union.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, expected.collect())
    )
    # the out dir folded: at most the -1 fold + a couple of live bids
    out_parts = [
        d for d in os.listdir(f"{root}/out") if d.startswith("__bid=")
    ]
    assert len(out_parts) <= 3, out_parts
    assert "__bid=-1" in out_parts


def test_dedup_jvm_crash_between_store_writes(spark, sf_dir, tmp_path,
                                              monkeypatch):
    """r10: the fail-between-writes crash-exactness pattern (r9 neardup,
    28861a6) applied to dedup_jvm's two stores — the crash lands after
    the OUT write of a RESUMED batch but before the seen-keys write, so
    the rerun replays a batch whose emissions are already committed. It
    must overwrite its own __bid partition with identical content
    (anti-join against the same strictly-earlier seen slice) and the
    final result must equal the uninterrupted keep-first oracle."""
    import pytest

    import flink_spark.streaming.dedup_jvm as DJ

    src = tmp_path / "src"
    src.mkdir()
    root = str(tmp_path / "dedup_root")
    ev = load_table(spark, sf_dir, "events").select(*COLS)
    cut = ev.selectExpr(
        "percentile(CAST(CAST(ts AS TIMESTAMP) AS LONG), 0.5) AS c"
    ).collect()[0]["c"]
    early = ev.filter(F.col("ts").cast("timestamp").cast("long") <= cut)
    late = ev.filter(F.col("ts").cast("timestamp").cast("long") > cut)

    def run_once():
        stream = spark.readStream.schema(ev.schema).parquet(str(src))
        return dedup_keep_first_jvm(
            stream, ["user_id"], ["ts", "event_id"], root=root
        )

    _land(early, tmp_path, src, "b1")
    run_once()  # batch 0 commits cleanly

    real = DJ.write_bid_partition
    state = {"writes": 0}

    def crashing(df, store, batch_id, part_cols=()):
        state["writes"] += 1
        if state["writes"] == 2:  # out committed, seen-keys not
            raise RuntimeError("injected crash between store writes")
        return real(df, store, batch_id, part_cols)

    monkeypatch.setattr(DJ, "write_bid_partition", crashing)
    _land(late, tmp_path, src, "b2")
    with pytest.raises(Exception, match="injected crash"):
        run_once()

    monkeypatch.setattr(DJ, "write_bid_partition", real)
    got = sorted(map(tuple, run_once().collect()))
    expected = sorted(
        map(tuple, _expected_keep_first(spark, sf_dir).collect())
    )
    assert got == expected
