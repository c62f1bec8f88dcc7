"""Checkpoint-stop-resume tests, third batch (reference restore-tests/
breadth, RestoreTestBase.java:107): the multi-way streaming join chain
(StreamExecMultiJoin / FLIP-516 — TWO stateful join operators in series,
each with its own buffered-row state a restart must carry) and the
lookup join's executor-local cache (LookupJoinRunner + cache — state
that is deliberately NOT checkpointed: a restart must re-probe misses
and still produce the exact batch result, never drop or duplicate a
row because the warm cache died with run 1).

Pattern as in test_restore_stateful{,2}.py: land half the input files,
drain with availableNow, STOP, land the rest, resume a NEW query from
the same checkpoint, assert the combined output equals the batch oracle
exactly — plus a per-test probe proving the restart genuinely straddled
the state in question.
"""

from __future__ import annotations

import glob
import json
import shutil

from pyspark.sql import functions as F

from flink_spark.operators.joins import lookup_join
from flink_spark.sources.tables import load_table


def _land(df, tmp_path, src, stage: str) -> None:
    staging = tmp_path / f"stage_{stage}"
    df.coalesce(1).write.mode("overwrite").parquet(str(staging))
    (part,) = glob.glob(str(staging / "part-*.parquet"))
    shutil.move(part, str(src / f"{stage}.parquet"))


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


def test_restore_multiway_join(spark, sf_dir, tmp_path):
    """Multi-way streaming join chain (reference StreamExecMultiJoin /
    FLIP-516; rendered as two chained interval joins, each a stateful
    stream-stream operator): a (view, click) pair buffered inside the
    SECOND join at the stop must still match a purchase landing in run 2
    — that funnel only completes if the restored state carries the
    intermediate join's buffer, not just the sources' offsets. The cut
    is placed inside a known view→click→purchase funnel (click ≤ cut <
    purchase) so at least one funnel is guaranteed to straddle."""
    src = tmp_path / "src"
    src.mkdir()
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    schema = ev.schema
    hop = 6 * 3600
    b0 = ev.withColumn("tl", F.col("ts").cast("timestamp").cast("long"))
    views = b0.filter(F.col("event_type") == "view").select(
        "user_id", F.col("tl").alias("v_tl")
    )
    clicks = b0.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_uid"), F.col("tl").alias("c_tl")
    )
    purchases = b0.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_uid"), F.col("tl").alias("p_tl")
    )
    funnel = (
        views.join(
            clicks,
            (F.col("user_id") == F.col("c_uid"))
            & (F.col("c_tl") >= F.col("v_tl"))
            & (F.col("c_tl") <= F.col("v_tl") + hop),
        )
        .join(
            purchases,
            (F.col("user_id") == F.col("p_uid"))
            & (F.col("p_tl") >= F.col("c_tl"))
            & (F.col("p_tl") <= F.col("c_tl") + hop)
            & (F.col("p_tl") > F.col("c_tl")),
        )
        # widest click→purchase gap = the most room for the cut
        .orderBy(F.desc(F.col("p_tl") - F.col("c_tl")), "user_id", "c_tl")
        .first()
    )
    assert funnel is not None, "testdata has no strict view→click→purchase funnel"
    cut = funnel["c_tl"]
    early = ev.filter(F.col("ts").cast("timestamp").cast("long") <= cut)
    late = ev.filter(F.col("ts").cast("timestamp").cast("long") > cut)

    def run_once():
        def stream():
            df = spark.readStream.schema(schema).parquet(str(src))
            return df.withColumn(
                "ts", F.col("ts").cast("timestamp")
            ).withWatermark("ts", "10 seconds")

        v = stream().filter(F.col("event_type") == "view").select(
            F.col("event_id").alias("view_id"),
            "user_id",
            F.col("ts").alias("view_ts"),
        )
        c = stream().filter(F.col("event_type") == "click").select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("click_ts"),
        )
        p = stream().filter(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        vc = v.join(
            c,
            (F.col("user_id") == F.col("c_user_id"))
            & (F.col("click_ts") >= F.col("view_ts"))
            & (F.col("click_ts") <= F.col("view_ts") + F.expr("INTERVAL 6 hours")),
            "inner",
        )
        # one event-time column may flow into the next stateful join:
        # demote view_ts (cast drops watermark metadata), keep click_ts
        vc = vc.select(
            "view_id", "click_id", "user_id", "click_ts",
            F.col("view_ts").cast("timestamp_ntz").alias("view_ts"),
        )
        vcp = vc.join(
            p,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 6 hours")),
            "inner",
        ).select(
            "view_id", "click_id", "purchase_id", "user_id",
            "view_ts", "click_ts", "purchase_ts",
        )
        _drain(vcp, tmp_path / "sink", tmp_path / "ckpt")

    _land(early, tmp_path, src, "batch1")
    run_once()
    n_run1 = spark.read.parquet(str(tmp_path / "sink")).count()
    _land(late, tmp_path, src, "batch2")
    run_once()  # resumed: BOTH joins' buffers must survive

    got = spark.read.parquet(str(tmp_path / "sink"))
    b = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    bv = b.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id",
        F.col("ts").alias("view_ts"),
    )
    bc = b.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
    )
    bp = b.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    expected = (
        bv.join(
            bc,
            (F.col("user_id") == F.col("c_user_id"))
            & (F.col("click_ts") >= F.col("view_ts"))
            & (F.col("click_ts") <= F.col("view_ts") + F.expr("INTERVAL 6 hours")),
            "inner",
        )
        .select(
            "view_id", "click_id", "user_id", "click_ts",
            F.col("view_ts").cast("timestamp_ntz").alias("view_ts"),
        )
        .join(
            bp,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 6 hours")),
            "inner",
        )
        .select(
            "view_id", "click_id", "purchase_id", "user_id",
            "view_ts", "click_ts", "purchase_ts",
        )
    )
    exp_rows = sorted(map(tuple, expected.collect()))
    assert sorted(map(tuple, got.collect())) == exp_rows
    # the restart genuinely completed funnels across the boundary: at
    # least one result pairs a run-1 click with a run-2 purchase
    cross = expected.filter(
        (F.col("click_ts").cast("long") <= cut)
        & (F.col("purchase_ts").cast("long") > cut)
    ).count()
    assert cross > 0
    assert n_run1 < len(exp_rows)


def test_restore_lookup_join_cache(spark, sf_dir, tmp_path):
    """Lookup join (reference LookupJoinRunner + LookupCache,
    LookupOptions.CACHE_TYPE=PARTIAL): the cache is executor-local and
    deliberately NOT part of the checkpoint — Flink rebuilds it by
    re-probing after restore. The resumed query must re-probe run-2 keys
    (including keys already probed in run 1, whose cache entries died
    with the first executor) and the combined two-run output must equal
    the batch join exactly: no null-padded misses, no duplicates.

    The probe log (one JSON line per build_lookup call, written from the
    executor) proves the restart cold-started the cache: run 2 re-probes
    keys run 1 already resolved."""
    src = tmp_path / "src"
    src.mkdir()
    probe_log = tmp_path / "probes"
    probe_log.mkdir()
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts")
    )
    schema = ev.schema
    cut = ev.selectExpr(
        "percentile(CAST(CAST(ts AS TIMESTAMP) AS LONG), 0.5) AS c"
    ).collect()[0]["c"]
    early = ev.filter(F.col("ts").cast("timestamp").cast("long") <= cut)
    late = ev.filter(F.col("ts").cast("timestamp").cast("long") > cut)
    dim = {
        r["c_custkey"]: {"c_name": r["c_name"]}
        for r in load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_name")
        .collect()
    }
    log_dir = str(probe_log)

    def run_once(stage: str):
        def build_lookup(keys):
            import os
            import uuid

            ks = sorted(int(k) for k in keys)
            with open(
                os.path.join(log_dir, f"{stage}_{uuid.uuid4().hex}.json"), "w"
            ) as f:
                json.dump(ks, f)
            return {k: dim.get(k, {"c_name": None}) for k in ks}

        stream = spark.readStream.schema(schema).parquet(str(src))
        out = lookup_join(stream, build_lookup, "user_id", "c_name string")
        _drain(out, tmp_path / "sink", tmp_path / "ckpt")

    _land(early, tmp_path, src, "batch1")
    run_once("run1")
    _land(late, tmp_path, src, "batch2")
    run_once("run2")  # resumed: cache is COLD again, must re-probe

    got = spark.read.parquet(str(tmp_path / "sink"))
    expected = (
        ev.join(
            load_table(spark, sf_dir, "customer").select(
                F.col("c_custkey").alias("user_id"), "c_name"
            ),
            "user_id",
            "left",
        ).select("event_id", "user_id", "ts", "c_name")
    )
    assert sorted(map(tuple, got.select(*expected.columns).collect())) == sorted(
        map(tuple, expected.collect())
    )
    # every purchase user exists in customer (testdata invariant this
    # test relies on to distinguish a dropped probe from a true miss)
    assert got.filter(F.col("c_name").isNull()).count() == 0

    def probed(stage: str) -> set:
        out: set = set()
        for p in glob.glob(f"{log_dir}/{stage}_*.json"):
            with open(p) as f:
                out.update(json.load(f))
        return out

    run1_keys, run2_keys = probed("run1"), probed("run2")
    late_keys = {r["user_id"] for r in late.select("user_id").distinct().collect()}
    # run 2 probed every key its rows needed — including ones run 1
    # already resolved (the cache did not survive the restart, and the
    # join re-probed instead of emitting stale/missing rows)
    assert late_keys <= run2_keys
    assert run1_keys & run2_keys, "no key straddled the restart"
