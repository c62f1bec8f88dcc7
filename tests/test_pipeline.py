"""Invariant tests for the corpus-prep pipeline operators that aren't
fully SQL-expressible (k-means), plus determinism spot-checks."""

from __future__ import annotations

import numpy as np

from tests.conftest import SF_DIR


def test_kmeans_assignment_consistent(spark):
    """Every row must be assigned to the nearest FINAL centroid (ties and
    last-ulp distance jitter tolerated), and all k clusters non-empty."""
    from flink_spark.llm.clustering import kmeans
    from flink_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    assigned, centroids = kmeans(emb, k=8, n_iter=5)
    rows = assigned.select("vec_id", "embedding", "cluster", "dist_sq").collect()
    C = np.array(centroids)  # k x d
    X = np.array([r["embedding"] for r in rows])
    got = np.array([r["cluster"] for r in rows])
    d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    best = d2.argmin(axis=1)
    # tolerate argmin flips only where the two distances are ulp-close
    flips = got != best
    assert (
        d2[np.arange(len(X)), got] - d2[np.arange(len(X)), best] < 1e-9
    ).all(), f"{flips.sum()} rows assigned to a non-nearest centroid"
    assert len(set(got.tolist())) == 8, "empty cluster"


def test_kmeans_deterministic_across_runs(spark):
    from flink_spark.llm.clustering import kmeans
    from flink_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    a1, c1 = kmeans(emb, k=4, n_iter=3)
    a2, c2 = kmeans(emb, k=4, n_iter=3)
    assert c1 == c2
    p1 = {r["vec_id"]: r["cluster"] for r in a1.collect()}
    p2 = {r["vec_id"]: r["cluster"] for r in a2.collect()}
    assert p1 == p2


def test_sequence_pack_bins_contiguous(spark):
    """Within a source, bin ids are non-decreasing in doc order and offsets
    stay inside [0, SEQ_LEN)."""
    from flink_spark.llm import pipeline as P
    from flink_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    pdf = P.sequence_pack(docs).toPandas().sort_values(["source", "doc_id"])
    assert ((pdf.bin_offset >= 0) & (pdf.bin_offset < P.SEQ_LEN)).all()
    for _, g in pdf.groupby("source"):
        assert (g.bin_id.diff().dropna() >= 0).all()
        # total layout length equals the token sum
        assert (
            g.bin_id.iloc[-1] * P.SEQ_LEN + g.bin_offset.iloc[-1]
            == g.n_tokens.iloc[:-1].sum()
        )


def test_stratified_sample_partition_invariant(spark):
    """Hash sampling must keep the SAME rows at any parallelism — the
    reproducibility contract rand()-based sampling cannot give."""
    from flink_spark.llm import pipeline as P
    from flink_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    rates = {"src0": 0.5, "src1": 0.25}
    a = set(
        r["doc_id"]
        for r in P.stratified_sample(docs.repartition(3), rates).collect()
    )
    b = set(
        r["doc_id"]
        for r in P.stratified_sample(docs.repartition(17, "source"), rates).collect()
    )
    assert a == b and len(a) > 0


def test_semantic_neardup_recall(spark):
    """Cluster-scoped pairs must be a subset of the exact cosine pairs,
    with usable recall on this corpus."""
    from flink_spark.queries.registry import QUERIES

    exact = {
        (r["id_a"], r["id_b"])
        for r in QUERIES["llm_cosine_neardup_pairs"].fn(spark, SF_DIR).collect()
    }
    sem = {
        (r["id_a"], r["id_b"])
        for r in QUERIES["pipe_semantic_neardup"].fn(spark, SF_DIR).collect()
    }
    assert sem <= exact, f"false positives: {sorted(sem - exact)[:5]}"
    assert len(exact) > 0
    recall = len(sem & exact) / len(exact)
    assert recall >= 0.7, f"recall {recall:.2f}"


def test_sequence_pack_ranged_equals_single_window(spark, sf_dir):
    """The two-pass range-bucketed packer must be bit-identical to the
    one-window-per-stratum reference for every bucket count, including
    n_buckets=1 (degenerates to the single window) and n_buckets larger
    than the per-stratum doc count (many empty buckets)."""
    from flink_spark.llm.pipeline import sequence_pack, sequence_pack_ranged
    from flink_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    want = sorted(map(tuple, sequence_pack(docs).collect()))
    for nb in (1, 7, 1000):
        got = sorted(
            map(tuple, sequence_pack_ranged(docs, n_buckets=nb).collect())
        )
        assert got == want, f"n_buckets={nb}"
