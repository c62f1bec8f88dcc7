"""Delta join (reference StreamingDeltaJoinOperator.java): incremental
ΔL⋈R ∪ L⋈ΔR maintenance must equal the batch join exactly — including
duplicate rows — for any placement of rows across micro-batches."""

from __future__ import annotations

import pandas as pd

from flink_spark.streaming.deltajoin import delta_join, tag_union


def _chunked_stream(spark, tmp_path, name, pdf: pd.DataFrame, n_chunks: int):
    d = tmp_path / name
    d.mkdir()
    n = len(pdf)
    for i in range(n_chunks):
        pdf.iloc[i * n // n_chunks : (i + 1) * n // n_chunks].to_parquet(
            d / f"part-{i}.parquet", index=False
        )
    schema = spark.read.parquet(str(d)).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )


def test_delta_join_matches_batch_join_across_batches(spark, tmp_path):
    left_pdf = pd.DataFrame(
        {"lk": [1, 1, 2, 3, 4, 5, 1, 2], "lv": list("abcdefgh")}
    )
    # duplicate key rows on both sides, plus keys with no partner (3, 9)
    right_pdf = pd.DataFrame(
        {"rk": [1, 2, 2, 4, 9, 1, 5, 5], "rv": list("stuvwxyz")}
    )
    lt = _chunked_stream(spark, tmp_path, "l", left_pdf, 3)
    rt = _chunked_stream(spark, tmp_path, "r", right_pdf, 3)
    tagged = tag_union(lt, rt, ["lk", "lv"], ["rk", "rv"])
    got = delta_join(
        tagged, ["lk", "lv"], ["rk", "rv"], ["lk"], ["rk"], num_buckets=4
    )
    got_rows = sorted(
        (r.lk, r.lv, r.rk, r.rv) for r in got.collect()
    )
    expect = sorted(
        (lr.lk, lr.lv, rr.rk, rr.rv)
        for _, lr in left_pdf.iterrows()
        for _, rr in right_pdf.iterrows()
        if lr.lk == rr.rk
    )
    assert got_rows == expect


def test_delta_join_empty_side(spark, tmp_path):
    left_pdf = pd.DataFrame({"lk": [1, 2], "lv": ["a", "b"]})
    right_pdf = pd.DataFrame({"rk": [7], "rv": ["z"]})
    lt = _chunked_stream(spark, tmp_path, "l", left_pdf, 1)
    rt = _chunked_stream(spark, tmp_path, "r", right_pdf, 1)
    tagged = tag_union(lt, rt, ["lk", "lv"], ["rk", "rv"])
    got = delta_join(tagged, ["lk", "lv"], ["rk", "rv"], ["lk"], ["rk"])
    assert got.count() == 0
