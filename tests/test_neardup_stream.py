"""Streaming incremental MinHash-LSH near-dup dedup
(streaming/neardup_stream.py): cross-micro-batch index growth,
checkpoint-stop-resume exactness, replay idempotence, batch-boundary
invariance, and the zero-Python per-batch plan."""

from __future__ import annotations

import glob
import shutil

import pytest

from pyspark.sql import functions as F

from flink_spark.llm.dedup import MH_K, band_rows, minhash_signatures_wide
from flink_spark.sources.tables import load_table
from flink_spark.streaming.neardup_stream import (
    batch_neardup_plan,
    minhash_neardup_stream,
)

COLS = ["doc_id", "lang", "source", "n_chars"]


def _expected_survivors(spark, sf_dir):
    """The closed-form semantics: D survives iff no smaller-id doc is
    band-matched AND >= MH_K/2-signature-verified against D — computed
    with the BATCH operators (themselves DuckDB-exact via the
    llm_minhash_lsh_pairs gate)."""
    from flink_spark.llm.dedup import minhash_lsh_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs)  # doc_a < doc_b, verified
    dup = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    return docs.join(dup, ["doc_id"], "left_anti").select(*COLS)


def _land(df, tmp_path, src, stage: str) -> None:
    staging = tmp_path / f"stage_{stage}"
    df.coalesce(1).write.mode("overwrite").parquet(str(staging))
    (part,) = glob.glob(str(staging / "part-*.parquet"))
    shutil.move(part, str(src / f"{stage}.parquet"))


def _id_ordered_files(spark, sf_dir, tmp_path, src, cuts):
    """Land the documents table as id-ordered files (one per range)."""
    import os
    import time

    docs = load_table(spark, sf_dir, "documents")
    lo = None
    for i, hi in enumerate([*cuts, None]):
        part = docs
        if lo is not None:
            part = part.filter(F.col("doc_id") >= lo)
        if hi is not None:
            part = part.filter(F.col("doc_id") < hi)
        _land(part, tmp_path, src, f"b{i}")
        # strictly increasing mtimes pin the trigger order to id order
        t = 1_600_000_000 + i * 60
        os.utime(str(src / f"b{i}.parquet"), (t, t))
        lo = hi
    return docs.schema


def test_neardup_stream_multi_batch(spark, sf_dir, tmp_path):
    """Three id-ordered micro-batches → survivors equal the closed-form
    batch semantics; near-dups straddling batch boundaries are absorbed
    by the historical index, not just in-batch."""
    src = tmp_path / "src"
    src.mkdir()
    schema = _id_ordered_files(spark, sf_dir, tmp_path, src, [150, 300])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    got = minhash_neardup_stream(stream).select(*COLS)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, _expected_survivors(spark, sf_dir).collect())
    )


def test_neardup_stream_boundary_invariance(spark, sf_dir, tmp_path):
    """The emitted survivor set must not depend on where the micro-batch
    boundaries fall (the closed-form oracle is boundary-free)."""
    src = tmp_path / "src"
    src.mkdir()
    schema = _id_ordered_files(spark, sf_dir, tmp_path, src, [40])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    got = minhash_neardup_stream(stream).select(*COLS)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, _expected_survivors(spark, sf_dir).collect())
    )


def test_neardup_stream_restore(spark, sf_dir, tmp_path):
    """Stop-resume (RestoreTestBase analog): drain the first id-range
    with a durable root, then land the rest and drain again with the
    SAME root — run 2 resumes from the checkpoint, deduping against the
    index run 1 built; the union equals the uninterrupted semantics."""
    src = tmp_path / "src"
    src.mkdir()
    root = str(tmp_path / "nd_root")
    docs = load_table(spark, sf_dir, "documents")
    early = docs.filter(F.col("doc_id") < 200)
    late = docs.filter(F.col("doc_id") >= 200)

    def run_once():
        stream = spark.readStream.schema(docs.schema).parquet(str(src))
        return minhash_neardup_stream(stream, root=root)

    _land(early, tmp_path, src, "b1")
    run1 = run_once().select(*COLS).collect()
    _land(late, tmp_path, src, "b2")
    got = run_once().select(*COLS).collect()

    expected = sorted(
        map(tuple, _expected_survivors(spark, sf_dir).collect())
    )
    assert sorted(map(tuple, got)) == expected
    # run 1 emitted a strict non-empty subset (late ids exist; some late
    # docs are near-dups of early docs and must be absorbed cross-run)
    assert 0 < len(run1) < len(expected)


def test_neardup_stream_replay_idempotent(spark, sf_dir, tmp_path):
    """Re-delivery of a committed batch (checkpoint wiped, stores kept):
    the batch overwrites its own __bid partitions with identical content
    and reads only strictly-earlier index partitions — same survivors."""
    src = tmp_path / "src"
    src.mkdir()
    root = str(tmp_path / "nd_root")
    docs = load_table(spark, sf_dir, "documents").limit(300)
    _land(docs, tmp_path, src, "b1")

    def run_once():
        stream = spark.readStream.schema(docs.schema).parquet(str(src))
        return minhash_neardup_stream(stream, root=root)

    n1 = sorted(map(tuple, run_once().select(*COLS).collect()))
    shutil.rmtree(f"{root}/ckpt")
    n2 = sorted(map(tuple, run_once().select(*COLS).collect()))
    assert n1 == n2


@pytest.mark.slow
def test_neardup_stream_compaction(spark, sf_dir, tmp_path):
    """compact_every folds strictly-earlier index partitions into
    __bid=-1 (crash-safe swap); dedup against keys living only in the
    compacted partition still works and the partition count is bounded."""
    import os

    src = tmp_path / "src"
    src.mkdir()
    schema = _id_ordered_files(
        spark, sf_dir, tmp_path, src, [100, 200, 300]
    )

    def run_once(root):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        return minhash_neardup_stream(stream, root=root, compact_every=2)

    root = str(tmp_path / "nd_root")
    got = run_once(root).select(*COLS)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, _expected_survivors(spark, sf_dir).collect())
    )
    bids = sorted(
        d for d in os.listdir(f"{root}/bands") if d.startswith("__bid=")
    )
    assert bids == ["__bid=-1", "__bid=3"], bids


def test_neardup_plan_is_python_free(spark, sf_dir):
    """The per-batch plan is all JVM expressions — no Python eval node
    (signatures are md5/conv arithmetic, banding is concat_ws, the
    verification is a 32-term comparison sum)."""
    docs = load_table(spark, sf_dir, "documents")
    wide = minhash_signatures_wide(docs.limit(50))
    hist_bands = band_rows(wide).withColumn(
        "__bucket", F.pmod(F.hash(F.col("sig")), F.lit(16))
    )
    survivors, _, _ = batch_neardup_plan(
        docs, "text", "doc_id", MH_K // 2, 16, hist_bands, wide
    )
    plan = (
        survivors._jdf.queryExecution().executedPlan().toString()
    )
    for marker in ("Python", "Pandas", "Arrow"):
        assert marker not in plan, f"{marker} node in plan:\n{plan}"
    assert "CartesianProduct" not in plan


def _expected_sem_survivors(spark, sf_dir, n_planes=8, n_tables=2,
                            tau=0.35):
    """Closed-form batch model: survives iff no smaller-id vector is
    bucket-matched (any table) and rounded-12-cosine-verified."""
    from flink_spark.llm.similarity import cosine, hyperplane_sketch

    emb = load_table(spark, sf_dir, "embeddings")
    per_table = []
    for t in range(n_tables):
        sk = hyperplane_sketch(
            emb.select("vec_id", F.col("embedding").alias("__v")),
            "__v", n_planes, 64, table=t,
        )
        per_table.append(sk.select("vec_id", F.lit(t).alias("t"), "bucket"))
    bk = per_table[0]
    for p in per_table[1:]:
        bk = bk.unionByName(p)
    a = bk.select(F.col("vec_id").alias("old_id"), "t", "bucket")
    b = bk.select(F.col("vec_id").alias("new_id"), "t", "bucket")
    cand = (
        a.join(b, ["t", "bucket"])
        .filter(F.col("old_id") < F.col("new_id"))
        .select("old_id", "new_id").distinct()
    )
    va = emb.select(F.col("vec_id").alias("old_id"),
                    F.col("embedding").alias("__va"))
    vb = emb.select(F.col("vec_id").alias("new_id"),
                    F.col("embedding").alias("__vb"))
    dup = (
        cand.join(va, "old_id").join(vb, "new_id")
        .filter(F.round(cosine("__va", "__vb"), 12) >= F.lit(tau))
        .select(F.col("new_id").alias("vec_id")).distinct()
    )
    return emb.join(dup, ["vec_id"], "left_anti").select("vec_id")


def test_semantic_neardup_stream_restore(spark, sf_dir, tmp_path):
    """Embedding twin of the minhash restore test: drain the early
    id-range with a durable root, then the rest — the resumed drain
    dedups against the bucket index run 1 built."""
    from flink_spark.streaming.neardup_stream import semantic_neardup_stream

    src = tmp_path / "src"
    src.mkdir()
    root = str(tmp_path / "sem_root")
    emb = load_table(spark, sf_dir, "embeddings")
    early = emb.filter(F.col("vec_id") < 200)
    late = emb.filter(F.col("vec_id") >= 200)

    def run_once():
        stream = spark.readStream.schema(emb.schema).parquet(str(src))
        return semantic_neardup_stream(stream, root=root)

    _land(early, tmp_path, src, "b1")
    run1 = run_once().select("vec_id").collect()
    _land(late, tmp_path, src, "b2")
    got = sorted(r.vec_id for r in run_once().select("vec_id").collect())
    exp = sorted(
        r.vec_id
        for r in _expected_sem_survivors(spark, sf_dir).collect()
    )
    assert got == exp
    assert 0 < len(run1) < len(exp)


@pytest.mark.slow
def test_semantic_neardup_stream_replay_idempotent(spark, sf_dir, tmp_path):
    from flink_spark.streaming.neardup_stream import semantic_neardup_stream

    src = tmp_path / "src"
    src.mkdir()
    root = str(tmp_path / "sem_root")
    emb = load_table(spark, sf_dir, "embeddings")
    _land(emb, tmp_path, src, "b1")

    def run_once():
        stream = spark.readStream.schema(emb.schema).parquet(str(src))
        return semantic_neardup_stream(stream, root=root)

    n1 = sorted(r.vec_id for r in run_once().select("vec_id").collect())
    shutil.rmtree(f"{root}/ckpt")
    n2 = sorted(r.vec_id for r in run_once().select("vec_id").collect())
    assert n1 == n2


def _expected_curation_survivors(spark, sf_dir):
    """Batch model of the streaming curation chain: Gopher keep →
    min-id per fingerprint → near-dup pair-kill among exact survivors."""
    from flink_spark.llm.dedup import minhash_lsh_pairs
    from flink_spark.llm.pipeline import gopher_quality_flags
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    q = gopher_quality_flags(docs).filter(F.col("keep")).select(
        *docs.columns
    )
    fp = F.md5(F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")))
    w = Window.partitionBy(fp).orderBy("doc_id")
    ex = (
        q.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1).drop("__rn")
    )
    kill = minhash_lsh_pairs(ex).select(
        F.col("doc_b").alias("doc_id")).distinct()
    return ex.join(kill, ["doc_id"], "left_anti").select("doc_id", "source")


@pytest.mark.slow
def test_curation_stream_restore(spark, sf_dir, tmp_path):
    """Stop-resume across the WHOLE curation chain: the resumed drain
    dedups against the fingerprint store AND the LSH index run 1 built."""
    from flink_spark.streaming.curation_stream import curation_stream

    src = tmp_path / "src"
    src.mkdir()
    root = str(tmp_path / "cur_root")
    docs = load_table(spark, sf_dir, "documents")
    early = docs.filter(F.col("doc_id") < 200)
    late = docs.filter(F.col("doc_id") >= 200)

    def run_once():
        stream = spark.readStream.schema(docs.schema).parquet(str(src))
        return curation_stream(stream, root=root)

    _land(early, tmp_path, src, "b1")
    run1 = run_once().select("doc_id").collect()
    _land(late, tmp_path, src, "b2")
    got = sorted(
        map(tuple, run_once().select("doc_id", "source").collect())
    )
    exp = sorted(
        map(tuple, _expected_curation_survivors(spark, sf_dir).collect())
    )
    assert got == exp
    assert 0 < len(run1) < len(exp)


def test_curation_stream_replay_idempotent(spark, sf_dir, tmp_path):
    from flink_spark.streaming.curation_stream import curation_stream

    src = tmp_path / "src"
    src.mkdir()
    root = str(tmp_path / "cur_root")
    docs = load_table(spark, sf_dir, "documents")
    _land(docs, tmp_path, src, "b1")

    def run_once():
        stream = spark.readStream.schema(docs.schema).parquet(str(src))
        return curation_stream(stream, root=root)

    n1 = sorted(r.doc_id for r in run_once().select("doc_id").collect())
    shutil.rmtree(f"{root}/ckpt")
    n2 = sorted(r.doc_id for r in run_once().select("doc_id").collect())
    assert n1 == n2


def test_neardup_stream_crash_mid_batch(spark, sf_dir, tmp_path,
                                        monkeypatch):
    """Crash INSIDE foreachBatch between store writes (the hardest
    crash point: out partition committed, sigs store not): the rerun
    replays the batch, overwrites its own __bid partitions with
    identical content, and the final result equals the uninterrupted
    oracle."""
    import flink_spark.streaming.neardup_stream as NS

    src = tmp_path / "src"
    src.mkdir()
    root = str(tmp_path / "nd_root")
    docs = load_table(spark, sf_dir, "documents").limit(300)
    _land(docs, tmp_path, src, "b1")

    real = NS.write_bid_partition
    state = {"writes": 0}

    def crashing(df, store, batch_id, part_cols=()):
        state["writes"] += 1
        if state["writes"] == 2:  # after the out write, before bands
            raise RuntimeError("injected crash between store writes")
        return real(df, store, batch_id, part_cols)

    monkeypatch.setattr(NS, "write_bid_partition", crashing)

    def run_once():
        stream = spark.readStream.schema(docs.schema).parquet(str(src))
        return NS.minhash_neardup_stream(stream, root=root)

    with pytest.raises(Exception, match="injected crash"):
        run_once()

    # recovery: restore the real write and rerun against the same root
    monkeypatch.setattr(NS, "write_bid_partition", real)
    got = sorted(map(tuple, run_once().select(*COLS).collect()))
    expected = sorted(
        map(
            tuple,
            _expected_survivors(spark, sf_dir)
            .join(docs.select("doc_id"), ["doc_id"])
            .collect(),
        )
    )
    assert got == expected


def test_portable_bucket_is_engine_version_stable(spark):
    """ADVICE r9: persisted ``__bucket`` values must reproduce across
    Spark versions over a durable resume root, so they derive from the
    format-specified md5 digest, not Spark's internal hash(). Pin the
    exact values a store written today would contain — this test is the
    cross-version contract."""
    from flink_spark.streaming.storeutil import portable_bucket

    df = spark.createDataFrame(
        [("alpha", 1), ("beta", 2), (None, 3)], "k string, n int"
    ).withColumn("b", portable_bucket(16, "k", "n"))
    got = {r.n: r.b for r in df.collect()}
    # hand-computed: pmod(int(md5(k + '\x1f' + n)[:15], 16), 16)
    import hashlib

    def model(*vals):
        payload = "\x1f".join(v for v in vals if v is not None)
        return int(hashlib.md5(payload.encode()).hexdigest()[:15], 16) % 16

    assert got == {
        1: model("alpha", "1"), 2: model("beta", "2"), 3: model("3")
    }
    # and every value is a valid bucket
    assert all(0 <= v < 16 for v in got.values())
