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

import pytest
from pyspark.sql import functions as F

from flink_spark.operators.joins import lookup_join
from flink_spark.sources.tables import load_table

# Exhaustive tier (VERDICT r12 #2 / r13 durations trim): this whole module is
# an exhaustive re-run sweep; it runs under --runslow / SPARK_GRAFT_RUNSLOW=1.
pytestmark = pytest.mark.slow



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


# --- crash BETWEEN store writes inside foreachBatch (r10: the r9
# neardup fail-between-writes test extended to the remaining multi-store
# drains, per VERDICT r9 #5) -------------------------------------------


@pytest.mark.parametrize("crash_after", [1, 2, 3])
def test_crash_exactness_curation_stream(spark, sf_dir, tmp_path,
                                         monkeypatch, crash_after):
    """curation_stream commits FOUR stores per batch (out, fps, bands,
    sigs) — the most write points of any drain. Inject a crash after
    each committed prefix of a RESUMED batch (so the replay also has to
    dedup against run-1 history), then rerun: the replayed batch
    overwrites its own __bid partitions with identical content and the
    final survivors equal the uninterrupted oracle."""
    import flink_spark.streaming.curation_stream as CS
    from tests.test_neardup_stream import _expected_curation_survivors

    src = tmp_path / "src"
    src.mkdir()
    root = str(tmp_path / "cur_root")
    docs = load_table(spark, sf_dir, "documents")
    early = docs.filter(F.col("doc_id") < 200)
    late = docs.filter(F.col("doc_id") >= 200)

    def run_once():
        stream = spark.readStream.schema(docs.schema).parquet(str(src))
        return CS.curation_stream(stream, root=root)

    _land(early, tmp_path, src, "b1")
    run_once()  # batch 0 commits cleanly; stores hold run-1 history

    real = CS.write_bid_partition
    state = {"writes": 0}

    def crashing(df, store, batch_id, part_cols=()):
        state["writes"] += 1
        if state["writes"] == crash_after + 1:
            raise RuntimeError("injected crash between store writes")
        return real(df, store, batch_id, part_cols)

    monkeypatch.setattr(CS, "write_bid_partition", crashing)
    _land(late, tmp_path, src, "b2")
    with pytest.raises(Exception, match="injected crash"):
        run_once()

    monkeypatch.setattr(CS, "write_bid_partition", real)
    got = sorted(
        map(tuple, run_once().select("doc_id", "source").collect())
    )
    exp = sorted(
        map(tuple, _expected_curation_survivors(spark, sf_dir).collect())
    )
    assert got == exp


def test_crash_exactness_ivf_ingest(spark, sf_dir, tmp_path, monkeypatch):
    """IVF ingest's hardest crash point: the codebook json is frozen but
    the batch-0 cells write never committed. The rerun must RELOAD the
    frozen centroids (train-once contract — not retrain on replay) and
    land the cells; search equals the uninterrupted run."""
    import flink_spark.streaming.ann_stream as ANN
    from tests.test_ann_stream import _cands, _expected_topk, _queries

    src = tmp_path / "src"
    src.mkdir()
    root = str(tmp_path / "ivf_root")
    cands = _cands(spark, sf_dir)
    _land(cands, tmp_path, src, "b0")

    real = ANN.write_bid_partition

    def crashing(df, store, batch_id, part_cols=()):
        raise RuntimeError("injected crash between store writes")

    monkeypatch.setattr(ANN, "write_bid_partition", crashing)

    def run_once():
        stream = spark.readStream.schema(cands.schema).parquet(str(src))
        return ANN.ivf_ingest_stream(stream, root=root)

    with pytest.raises(Exception, match="injected crash"):
        run_once()
    books = open(f"{root}/centroids.json").read()

    monkeypatch.setattr(ANN, "write_bid_partition", real)
    idx = run_once()
    # frozen-codebook contract survived the crash window
    assert open(f"{root}/centroids.json").read() == books
    assert idx.assigned().count() == cands.count()
    cut = cands.agg(F.max("vec_id") + 1).collect()[0][0]
    got = sorted(map(tuple, idx.topk(_queries(spark, sf_dir)).collect()))
    exp = sorted(
        map(tuple, _expected_topk(spark, sf_dir, train_cut=cut).collect())
    )
    assert got == exp


def test_crash_exactness_pq_ingest(spark, sf_dir, tmp_path, monkeypatch):
    """PQ twin: codebooks frozen, batch-0 codes write crashed. The rerun
    reuses the frozen books byte-for-byte and the search equals the
    batch pq_topk under those books."""
    import flink_spark.streaming.ann_stream as ANN
    from flink_spark.llm.similarity import pq_topk, pq_train
    from tests.test_ann_stream import _cands, _queries

    src = tmp_path / "src"
    src.mkdir()
    root = str(tmp_path / "pq_root")
    cands = _cands(spark, sf_dir)
    _land(cands, tmp_path, src, "b0")

    real = ANN.write_bid_partition
    monkeypatch.setattr(
        ANN, "write_bid_partition",
        lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("injected crash between store writes")),
    )

    def run_once():
        stream = spark.readStream.schema(cands.schema).parquet(str(src))
        return ANN.pq_ingest_stream(stream, root=root)

    with pytest.raises(Exception, match="injected crash"):
        run_once()
    books_json = open(f"{root}/codebooks.json").read()

    monkeypatch.setattr(ANN, "write_bid_partition", real)
    idx = run_once()
    assert open(f"{root}/codebooks.json").read() == books_json
    assert idx.encoded().count() == cands.count()
    books = pq_train(cands, cand_id="vec_id", vec="embedding", m=16, ks=16)
    exp = pq_topk(
        _queries(spark, sf_dir),
        cands.select(F.col("vec_id").alias("cand_id"), "embedding"),
        k=5, m=16, ks=16, books=books,
    )
    got = sorted(map(tuple, idx.topk(_queries(spark, sf_dir)).collect()))
    assert got == sorted(map(tuple, exp.collect()))
