"""Checkpoint-stop-resume tests, fourth batch — the r12 evidence-audit
sev-0 queue (stateful operators whose restore story had no dedicated
test): the upsert-materialize sink contract, the stream-stream window
join, window TopN / window dedup (open-window accumulators straddling
the stop), and the restored event-time watermark itself (late rows must
stay late after a restart — a reset-to--inf watermark would re-admit
them and re-emit closed windows). Pattern as in test_restore_stateful*:
drain part of the input, STOP, land the rest, resume a NEW query from
the same checkpoint, assert the combined output equals the
uninterrupted run (and the batch oracle where expressible)."""

from __future__ import annotations

import pytest

import glob
import os
import shutil

from pyspark.sql import functions as F

from flink_spark.sources.tables import load_table
from flink_spark.streaming import changelog as CL

# Exhaustive tier (VERDICT r12 #2 / r13 durations trim): this whole module is
# an exhaustive re-run sweep; it runs under --runslow / SPARK_GRAFT_RUNSLOW=1.
pytestmark = pytest.mark.slow



def _land(df, tmp_path, src, stage: str) -> None:
    staging = tmp_path / f"stage_{stage}"
    df.coalesce(1).write.mode("overwrite").parquet(str(staging))
    (part,) = glob.glob(str(staging / "part-*.parquet"))
    dest = str(src / f"{stage}.parquet")
    shutil.move(part, dest)
    # deterministic batch order under maxFilesPerTrigger=1
    t = 1_600_000_000 + int(stage.rsplit("_", 1)[-1]) * 60
    os.utime(dest, (t, t))


def _split_by_ts(ev):
    cut = ev.selectExpr(
        "percentile(CAST(CAST(ts AS TIMESTAMP) AS LONG), 0.5) AS c"
    ).collect()[0]["c"]
    early = ev.filter(F.col("ts").cast("timestamp").cast("long") <= cut)
    late = ev.filter(F.col("ts").cast("timestamp").cast("long") > cut)
    return early, late


def _drain(out, sink, ckpt) -> None:
    q = (
        out.writeStream.format("parquet")
        .option("path", str(sink))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_restore_upsert_materialize_sink(spark, sf_dir, tmp_path):
    """Upsert sink contract across a restart (reference
    StreamExecSink.java upsert materialization; SinkUpsertMaterializer):
    the changelog drained into a durable sink over two runs, then folded
    by key, must equal the batch last-version-per-key oracle — and a key
    whose versions span BOTH runs must contribute exactly one +I (a lost
    normalize store would re-insert it at the run boundary and the
    PK-merge would see two insert lineages)."""
    src = tmp_path / "src"
    src.mkdir()
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") <= 200)
        .select("user_id", "ts", "event_id", "value")
    )
    schema = ev.schema
    early, late = _split_by_ts(ev)

    def run(sink, ckpt):
        stream = spark.readStream.schema(schema).parquet(str(src))
        out = CL.changelog_normalize(stream, ["user_id"], ["ts", "event_id"])
        _drain(out, sink, ckpt)

    _land(early, tmp_path, src, "b_1")
    run(tmp_path / "sink", tmp_path / "ckpt")
    _land(late, tmp_path, src, "b_2")
    run(tmp_path / "sink", tmp_path / "ckpt")  # resumed

    changelog = spark.read.parquet(str(tmp_path / "sink"))
    ups = CL.drop_update_before(changelog)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    got = (
        ups.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "ts", "event_id", "value")
    )
    exp = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "ts", "event_id", "value")
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, exp.collect())
    )
    # PK contract: cross-run keys carry exactly ONE insert lineage
    both = early.select("user_id").intersect(late.select("user_id"))
    ins = (
        changelog.filter(F.col("op") == CL.OP_INSERT)
        .groupBy("user_id").count()
    )
    assert ins.join(both, "user_id").filter(F.col("count") != 1).count() == 0


def test_restore_stream_window_join(spark, sf_dir, tmp_path):
    """Stream-stream window join (state = per-window buffered rows on
    both sides): a run-1 click must join a run-2 purchase landing in the
    SAME event-time window — only restored join state can produce that
    pair. Combined two-run output equals the uninterrupted run and the
    batch inner join on (window, user)."""
    src = tmp_path / "src"
    src.mkdir()
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") <= 300)
        .filter(F.col("event_type").isin("click", "purchase"))
        .select("user_id", "ts", "event_id", "event_type")
    )
    schema = ev.schema
    # cut INSIDE the widest same-window click/purchase pair, so the stop
    # is guaranteed to strand at least one joined pair across the runs
    cb = ev.filter(F.col("event_type") == "click").select(
        F.window(F.col("ts").cast("timestamp"), "1 hour").alias("w"),
        "user_id", F.col("ts").cast("timestamp").alias("cts"),
    )
    pb = ev.filter(F.col("event_type") == "purchase").select(
        F.window(F.col("ts").cast("timestamp"), "1 hour").alias("pw"),
        F.col("user_id").alias("pu"),
        F.col("ts").cast("timestamp").alias("pts"),
    )
    widest = (
        cb.join(pb, (F.col("w") == F.col("pw"))
                & (F.col("user_id") == F.col("pu")))
        .filter(F.col("cts") != F.col("pts"))
        .withColumn("lo", F.least("cts", "pts").cast("long"))
        .withColumn("hi", F.greatest("cts", "pts").cast("long"))
        .orderBy(F.abs(F.col("hi") - F.col("lo")).desc())
        .select("lo", "hi").first()
    )
    cut = (widest.lo + widest.hi) // 2
    early = ev.filter(F.col("ts").cast("timestamp").cast("long") <= cut)
    late = ev.filter(F.col("ts").cast("timestamp").cast("long") > cut)

    def run(sink, ckpt):
        s1 = (
            spark.readStream.schema(schema).parquet(str(src))
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", "1 hour")
        )
        s2 = (
            spark.readStream.schema(schema).parquet(str(src))
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", "1 hour")
        )
        clicks = s1.filter(F.col("event_type") == "click").select(
            F.window("ts", "1 hour").alias("w"), "user_id",
            F.col("event_id").alias("click_id"),
        )
        purchases = s2.filter(F.col("event_type") == "purchase").select(
            F.window("ts", "1 hour").alias("pw"),
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
        )
        joined = clicks.join(
            purchases,
            (F.col("w") == F.col("pw"))
            & (F.col("user_id") == F.col("p_user_id")),
            "inner",
        ).select(
            "user_id",
            F.col("w.start").alias("window_start"),
            "click_id", "purchase_id",
        )
        _drain(joined, sink, ckpt)

    _land(early, tmp_path, src, "b_1")
    run(tmp_path / "sink", tmp_path / "ckpt")
    _land(late, tmp_path, src, "b_2")
    run(tmp_path / "sink", tmp_path / "ckpt")  # resumed

    run(tmp_path / "sink_solid", tmp_path / "ckpt_solid")  # uninterrupted

    got = sorted(
        map(tuple, spark.read.parquet(str(tmp_path / "sink")).collect())
    )
    solid = sorted(
        map(tuple, spark.read.parquet(str(tmp_path / "sink_solid")).collect())
    )
    assert got == solid and len(got) > 0
    # batch oracle: inner join on (hour window, user)
    c = ev.filter(F.col("event_type") == "click").select(
        F.window(F.col("ts").cast("timestamp"), "1 hour").alias("w"),
        "user_id", F.col("event_id").alias("click_id"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.window(F.col("ts").cast("timestamp"), "1 hour").alias("pw"),
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
    )
    exp = sorted(
        map(
            tuple,
            c.join(
                p,
                (F.col("w") == F.col("pw"))
                & (F.col("user_id") == F.col("p_user_id")),
            )
            .select("user_id", F.col("w.start").alias("window_start"),
                    "click_id", "purchase_id")
            .collect(),
        )
    )
    assert got == exp
    # the restore-specific fact: at least one joined pair spans the runs
    # (either side buffered in run 1 and matched by run 2 — both
    # directions prove restored join state)
    early_ids = {r.event_id for r in early.collect()}
    late_ids = {r.event_id for r in late.collect()}
    assert any(
        (ci in early_ids and pi in late_ids)
        or (pi in early_ids and ci in late_ids)
        for _, _, ci, pi in got
    )


def _window_agg_restore(spark, sf_dir, tmp_path, agg_builder, oracle_df):
    """Shared driver for the window TopN / window dedup straddle tests:
    two-run output == solid run == batch oracle on the EMITTED windows,
    and no window is emitted twice (a lost accumulator would emit two
    partials for the straddling window)."""
    src = tmp_path / "src"
    src.mkdir()
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") <= 150)
        .select("user_id", "ts", "event_id", "value")
    )
    schema = ev.schema
    early, late = _split_by_ts(ev)

    def run(sink, ckpt):
        stream = (
            spark.readStream.schema(schema).parquet(str(src))
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", "1 minute")
        )
        _drain(agg_builder(stream), sink, ckpt)

    _land(early, tmp_path, src, "b_1")
    run(tmp_path / "sink", tmp_path / "ckpt")
    _land(late, tmp_path, src, "b_2")
    run(tmp_path / "sink", tmp_path / "ckpt")  # resumed
    run(tmp_path / "sink_solid", tmp_path / "ckpt_solid")

    got_df = spark.read.parquet(str(tmp_path / "sink"))
    got = sorted(map(tuple, got_df.collect()))
    solid = sorted(
        map(tuple, spark.read.parquet(str(tmp_path / "sink_solid")).collect())
    )
    assert got == solid and len(got) > 0
    # no straddling window emitted as two partials
    key_cols = [got_df.columns[0], got_df.columns[1]]
    dups = got_df.groupBy(*key_cols).count().filter(F.col("count") > 1)
    assert dups.count() == 0
    # emitted windows match the batch aggregate exactly
    exp = oracle_df(ev)
    emitted = got_df.select(key_cols[0]).distinct()
    exp_emitted = exp.join(emitted, key_cols[0])
    assert got == sorted(map(tuple, exp_emitted.collect()))


def test_restore_window_topn_straddle(spark, sf_dir, tmp_path):
    """Window TopN's stateful step (per-window per-user sum) across a
    restart: the 6h window straddling the stop must combine run-1 and
    run-2 rows into ONE accumulator. (Ranking is the stateless pass over
    closed windows, as in the gate — restore-relevant state is the
    aggregate.)"""
    def build(stream):
        return (
            stream.groupBy(F.window("ts", "6 hours"), "user_id")
            .agg(
                F.sum(F.col("value").cast("decimal(30,6)"))
                .cast("double").alias("user_sum")
            )
            .select(
                F.col("window.start").alias("window_start"),
                "user_id", "user_sum",
            )
        )

    def oracle(ev):
        return (
            ev.withColumn("ts", F.col("ts").cast("timestamp"))
            .groupBy(F.window("ts", "6 hours"), "user_id")
            .agg(
                F.sum(F.col("value").cast("decimal(30,6)"))
                .cast("double").alias("user_sum")
            )
            .select(
                F.col("window.start").alias("window_start"),
                "user_id", "user_sum",
            )
        )

    _window_agg_restore(spark, sf_dir, tmp_path, build, oracle)


def test_restore_window_dedup_straddle(spark, sf_dir, tmp_path):
    """Window dedup (keep-first = windowed MIN over (ts, event_id))
    across a restart: when the run-1 half of a straddling window holds
    the key's first row, the restored accumulator must keep beating
    run-2 rows — a lost store would emit the run-2 minimum instead."""
    def build(stream):
        return (
            stream.groupBy(F.window("ts", "6 hours"), "user_id")
            .agg(F.min(F.struct("ts", "event_id")).alias("first"))
            .select(
                F.col("window.start").alias("window_start"),
                "user_id",
                F.col("first.event_id").alias("event_id"),
            )
        )

    def oracle(ev):
        return (
            ev.withColumn("ts", F.col("ts").cast("timestamp"))
            .groupBy(F.window("ts", "6 hours"), "user_id")
            .agg(F.min(F.struct("ts", "event_id")).alias("first"))
            .select(
                F.col("window.start").alias("window_start"),
                "user_id",
                F.col("first.event_id").alias("event_id"),
            )
        )

    _window_agg_restore(spark, sf_dir, tmp_path, build, oracle)


def test_restore_watermark_survives_restart(spark, sf_dir, tmp_path):
    """The event-time watermark itself is restart state (reference
    checkpointed combined watermark; Spark: eventTimeWatermark in the
    checkpoint's offset log): rows that were LATE before the stop must
    still be late after the resume. A watermark reset to -inf would
    re-admit the late file's rows into already-closed windows and
    re-emit them. Solid run (same file order, maxFilesPerTrigger=1)
    must equal the two-run output."""
    src = tmp_path / "src"
    src.mkdir()
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") <= 150)
        .select("user_id", "ts", "event_id", "value")
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    schema = ev.schema
    lo, hi = ev.agg(
        F.min("ts").cast("long"), F.max("ts").cast("long")
    ).collect()[0]
    cut = lo + (hi - lo) * 2 // 3
    head = ev.filter(F.col("ts").cast("long") <= cut)
    # the late file: the OLDEST decile, re-delivered after the watermark
    # has advanced past (cut - 1 minute)
    late_cut = lo + (hi - lo) // 10
    late_only = ev.filter(F.col("ts").cast("long") <= late_cut)
    tail = ev.filter(F.col("ts").cast("long") > cut)
    assert late_only.count() > 0 and tail.count() > 0

    def run(sink, ckpt):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
            .withWatermark("ts", "1 minute")
        )
        agg = (
            stream.groupBy(F.window("ts", "1 hour"))
            .agg(F.count("*").alias("n"))
            .select(F.col("window.start").alias("window_start"), "n")
        )
        _drain(agg, sink, ckpt)

    _land(head, tmp_path, src, "b_1")
    run(tmp_path / "sink", tmp_path / "ckpt")
    _land(late_only, tmp_path, src, "b_2")  # late re-delivery
    _land(tail, tmp_path, src, "b_3")       # fresh rows advance the wm
    run(tmp_path / "sink", tmp_path / "ckpt")  # resumed

    # NOTE deliberately NO solid-run byte-comparison here: Spark's
    # watermark update lags a batch, so an UNINTERRUPTED drain merges
    # the b_2 re-delivery into still-open state (count 2x) while the
    # run boundary commits the final watermark first — the emission
    # timing differs by construction (measured: 42 vs 21 for the first
    # window). The restart-state invariants below are what a RESTORED
    # watermark guarantees and a reset one breaks.
    got_df = spark.read.parquet(str(tmp_path / "sink"))
    assert got_df.count() > 0
    # no window emitted twice (a reset watermark re-admits the late
    # rows into evicted windows and re-emits them on the next advance)
    dups = got_df.groupBy("window_start").count().filter(F.col("count") > 1)
    assert dups.count() == 0
    # the late file's windows carry the HEAD counts only: the resumed
    # query dropped every b_2 row against the restored watermark (a
    # reset watermark would fold them in — count would double)
    head_counts = (
        head.groupBy(F.window("ts", "1 hour"))
        .agg(F.count("*").alias("n_head"))
        .select(F.col("window.start").alias("window_start"), "n_head")
    )
    late_windows = late_only.select(
        F.window("ts", "1 hour").start.alias("window_start")
    ).distinct()
    joined = (
        got_df.join(late_windows, "window_start")
        .join(head_counts, "window_start")
    )
    assert joined.count() > 0
    assert joined.filter(F.col("n") != F.col("n_head")).count() == 0
    # and the tail windows did emit after the resume (the restored
    # watermark kept ADVANCING, not just holding)
    tail_windows = tail.select(
        F.window("ts", "1 hour").start.alias("window_start")
    ).distinct()
    assert got_df.join(tail_windows, "window_start").count() > 0
