"""VECTOR_SEARCH SQL TVF (reference
StreamExecVectorSearchTableFunction.java + vector-search docs): argument
parsing, the three spellings, output contract, and error paths."""

from __future__ import annotations

import pytest

from flink_spark.functions.vectorsearch import _parse_args, _split_args


def test_parse_positional_args():
    a = _parse_args("TABLE vt, inp.v, DESCRIPTOR(emb), 7")
    assert a["search_table"] == "vt"
    assert a["column_to_query"] == "inp.v"
    assert a["column_to_search"] == "emb"
    assert a["top_k"] == 7


def test_parse_named_args_with_config_map():
    a = _parse_args(
        "SEARCH_TABLE => TABLE vt, COLUMN_TO_QUERY => ARRAY[1.0, 2.0], "
        "COLUMN_TO_SEARCH => DESCRIPTOR(emb), TOP_K => 3, "
        "CONFIG => MAP['async', 'true', 'timeout', '100s']"
    )
    assert a["search_table"] == "vt"
    assert a["column_to_query"].upper().startswith("ARRAY[")
    assert a["top_k"] == 3
    assert a["config"] == {"async": "true", "timeout": "100s"}


def test_split_args_respects_brackets_and_literals():
    assert _split_args("a, ARRAY[1, 2], MAP['x, y', 'z']") == [
        "a", "ARRAY[1, 2]", "MAP['x, y', 'z']"
    ]


@pytest.mark.parametrize("body,err", [
    ("vt, q, DESCRIPTOR(e), 5", "SEARCH_TABLE must be"),
    ("TABLE vt, q, e, 5", "DESCRIPTOR"),
    ("TABLE vt, q, DESCRIPTOR(e), many", "TOP_K must be a literal int"),
    ("TABLE vt, q, DESCRIPTOR(e)", "missing argument TOP_K"),
    ("BAD_ARG => 1, TABLE vt, q, DESCRIPTOR(e), 5", "unknown argument"),
])
def test_parse_rejections(body, err):
    with pytest.raises(ValueError, match=err):
        _parse_args(body)


@pytest.fixture()
def vs_views(spark, sf_dir):
    from pyspark.sql import functions as F

    from flink_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    ).createOrReplaceTempView("vst_q")
    emb.filter(F.col("vec_id") >= 5).select(
        F.col("vec_id").alias("cid"), "embedding"
    ).createOrReplaceTempView("vst_c")
    return "vst_q", "vst_c"


def test_correlated_output_contract(spark, vs_views):
    from flink_spark.catalog import TableEnvironment

    env = TableEnvironment(spark)
    df = env.execute_sql("""
        SELECT * FROM vst_q, LATERAL TABLE(VECTOR_SEARCH(
            TABLE vst_c, vst_q.qv, DESCRIPTOR(embedding), 3))
    """)
    # all input cols + all vector-table cols + score
    assert df.columns == ["qid", "qv", "cid", "embedding", "score"]
    assert df.count() == 5 * 3
    per = df.groupBy("qid").count().collect()
    assert all(r["count"] == 3 for r in per)


def test_correlated_matches_library_topk(spark, vs_views):
    from pyspark.sql import functions as F

    from flink_spark.catalog import TableEnvironment
    from flink_spark.llm import similarity as SIM

    env = TableEnvironment(spark)
    got = {
        (r.qid, r.cid)
        for r in env.execute_sql("""
            SELECT qid, cid FROM vst_q, LATERAL TABLE(VECTOR_SEARCH(
                TABLE vst_c, vst_q.qv, DESCRIPTOR(embedding), 4))
        """).collect()
    }
    q = spark.table("vst_q").select(
        F.col("qid").alias("query_id"), F.col("qv").alias("embedding")
    )
    c = spark.table("vst_c").select(
        F.col("cid").alias("cand_id"), "embedding"
    )
    want = {
        (r.query_id, r.cand_id)
        for r in SIM.brute_force_topk(q, c, k=4).collect()
    }
    assert got == want


def test_constant_vector_no_lateral(spark, vs_views):
    from flink_spark.catalog import TableEnvironment

    env = TableEnvironment(spark)
    qv = spark.table("vst_q").filter("qid = 0").collect()[0].qv
    arr = ", ".join(str(float(v)) for v in qv)
    df = env.execute_sql(f"""
        SELECT cid, score FROM TABLE(VECTOR_SEARCH(
            TABLE vst_c, ARRAY[{arr}], DESCRIPTOR(embedding), 2))
    """)
    rows = df.collect()
    assert len(rows) == 2
    assert rows[0].score >= rows[1].score


def test_ambiguous_columns_rejected(spark, vs_views):
    from flink_spark.catalog import TableEnvironment

    env = TableEnvironment(spark)
    spark.table("vst_c").createOrReplaceTempView("vst_c2")
    with pytest.raises(ValueError, match="ambiguous output columns"):
        env.execute_sql("""
            SELECT * FROM vst_c, LATERAL TABLE(VECTOR_SEARCH(
                TABLE vst_c2, vst_c.embedding, DESCRIPTOR(embedding), 2))
        """)


@pytest.mark.parametrize("index", ["ivf", "lsh", "pq"])
def test_index_routing_recall_vs_brute(spark, vs_views, index):
    """CONFIG MAP['index', ...] routes the TVF through the ANN library
    (llm/similarity.py) instead of the exact brute scan; recall vs the
    brute top-k stays >= 0.8 (the library's own gate) and the output
    contract (columns, k-per-query) is unchanged."""
    from flink_spark.catalog import TableEnvironment

    env = TableEnvironment(spark)
    k = 4
    cfg = {
        "ivf": "MAP['index','ivf','ivf.centroids','4','ivf.probe','3']",
        "lsh": "MAP['index','lsh','lsh.planes','4','lsh.tables','16']",
        "pq": "MAP['index','pq']",
    }[index]
    df = env.execute_sql(f"""
        SELECT qid, cid, score FROM vst_q, LATERAL TABLE(VECTOR_SEARCH(
            TABLE vst_c, vst_q.qv, DESCRIPTOR(embedding), {k}, {cfg}))
    """)
    rows = df.collect()
    got = {(r.qid, r.cid) for r in rows}
    per_q = {}
    for r in rows:
        per_q.setdefault(r.qid, 0)
        per_q[r.qid] += 1
    assert all(n <= k for n in per_q.values())
    brute = {
        (r.qid, r.cid)
        for r in env.execute_sql(f"""
            SELECT qid, cid FROM vst_q, LATERAL TABLE(VECTOR_SEARCH(
                TABLE vst_c, vst_q.qv, DESCRIPTOR(embedding), {k}))
        """).collect()
    }
    recall = len(got & brute) / len(brute)
    assert recall >= 0.8, (index, recall)


def test_index_routing_constant_query(spark, vs_views):
    from flink_spark.catalog import TableEnvironment

    env = TableEnvironment(spark)
    qv = spark.table("vst_q").select("qv").first()[0]
    lit = "ARRAY[" + ",".join(f"CAST({x} AS FLOAT)" for x in qv) + "]"
    df = env.execute_sql(f"""
        SELECT cid, score FROM TABLE(VECTOR_SEARCH(TABLE vst_c, {lit},
            DESCRIPTOR(embedding), 3, MAP['index','ivf']))
    """)
    assert df.columns == ["cid", "score"] and df.count() == 3


def test_index_routing_unknown_rejected(spark, vs_views):
    from flink_spark.catalog import TableEnvironment

    env = TableEnvironment(spark)
    with pytest.raises(ValueError, match="unknown index"):
        env.execute_sql("""
            SELECT * FROM vst_q, LATERAL TABLE(VECTOR_SEARCH(
                TABLE vst_c, vst_q.qv, DESCRIPTOR(embedding), 3,
                MAP['index','faiss']))
        """)


def test_vector_search_config_validation(spark):
    """Reference vector_search_runtime_config keys accepted (async/
    timeout/max-concurrent-operations are serving hints; the scan is a
    parallel broadcast join), unknown keys rejected loudly."""
    import pytest
    from flink_spark.catalog import TableEnvironment

    env = TableEnvironment(spark)
    spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(8)],
        "vid long, vec array<float>",
    ).createOrReplaceTempView("vsc_tbl")
    rows = env.execute_sql(
        "SELECT * FROM TABLE(VECTOR_SEARCH(TABLE vsc_tbl, "
        "ARRAY[CAST(1.0 AS FLOAT), CAST(1.0 AS FLOAT)], DESCRIPTOR(vec), 3, "
        "CONFIG => MAP['async', 'true', 'timeout', '100s']))"
    ).collect()
    assert len(rows) == 3
    with pytest.raises(ValueError, match="unsupported config"):
        env.execute_sql(
            "SELECT * FROM TABLE(VECTOR_SEARCH(TABLE vsc_tbl, "
            "ARRAY[CAST(1.0 AS FLOAT), CAST(1.0 AS FLOAT)], "
            "DESCRIPTOR(vec), 3, CONFIG => MAP['n_probe', '4']))"
        )
