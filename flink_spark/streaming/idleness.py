"""Source idleness for multi-source watermarks — the engine's analog of
``WatermarkStrategy.withIdleness`` (reference flink-core/.../eventtime/
WatermarkStrategy.java:147 and WatermarksWithIdleness.java): the combined
watermark of a multi-source stream is the MIN over ACTIVE sources' maxima;
a source that stops producing is marked idle after a timeout and stops
holding the watermark back, and a source that has produced NOTHING yet is
idle from the start (otherwise it would pin the watermark at -inf).

Spark has no per-source idleness hook, so the semantics are rebuilt at
micro-batch granularity: idleness is measured in BATCHES without rows
(deterministic — the property Flink's wall-clock timeout cannot give a
test), per-source maxima are one tiny aggregate per batch (#sources rows
collected, O(1)), and the emitted watermark is monotonic, exactly like
Flink's combined watermark tracker.

Scale shape: per batch, one groupBy(src).max(ts) over the batch (map-side
combined, #sources result rows) plus scalar driver state per source —
identical cost to Flink's per-source watermark bookkeeping.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_spark.streaming.core import _STREAM_DIR_ROOT


def tagged_ts_chunk_stream(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    n_chunks: int = 4,
    where: str | None = None,
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Open a table as a streaming DataFrame delivered in event-time order
    over ``n_chunks`` micro-batches, tagged with a two-source split: rows
    in the first half of the event-time order are source ``'a'`` (the
    backfill source that goes quiet), the rest source ``'b'`` — the
    harness for idleness semantics, where one source's silence must stop
    holding the watermark back. Split boundaries use the same floor
    arithmetic as ``chunked_table_stream`` so an oracle can reproduce the
    exact chunk and source of every row."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    key = (
        path.strip("/").replace("/", "_")
        + f"_idle{n_chunks}_{(where or 'all').replace(' ', '')}"
    )
    d = os.path.join(_STREAM_DIR_ROOT, key)
    marker = os.path.join(d, "_done")
    if not os.path.exists(marker):
        os.makedirs(d, exist_ok=True)
        for f in os.listdir(d):
            os.remove(os.path.join(d, f))
        pdf = pd.read_parquet(path)
        if where is not None:
            pdf = pdf.query(where)
        # µs-normalize BEFORE sorting: sub-µs precision must not produce a
        # tie-break order a µs-reading oracle cannot reproduce
        for c in pdf.columns:
            if str(pdf[c].dtype).startswith("datetime64[ns"):
                pdf[c] = pdf[c].astype("datetime64[us]")
        pdf = pdf.sort_values([ts_col, id_col]).reset_index(drop=True)
        n = len(pdf)
        pdf["src"] = ["a" if i < 2 * n // 4 else "b" for i in range(n)]
        for i in range(n_chunks):
            part = pdf.iloc[i * n // n_chunks : (i + 1) * n // n_chunks]
            part.to_parquet(os.path.join(d, f"part-{i}.parquet"), index=False)
        with open(marker, "w") as fh:
            fh.write("ok")
    base = 1_600_000_000
    for i in range(n_chunks):
        p = os.path.join(d, f"part-{i}.parquet")
        if os.path.exists(p):
            os.utime(p, (base + i * 60, base + i * 60))
    schema = spark.read.parquet(d).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )


def combined_watermark_trace(
    stream: DataFrame,
    src_col: str,
    ts_col: str,
    delay: str,
    idle_batches: int = 2,
    sources: tuple = ("a", "b"),
) -> DataFrame:
    """Drain the tagged stream and return the per-batch combined-watermark
    trace ``(batch_id, <src>_active ..., wm)`` under the idleness rule:

    - a source is ACTIVE at batch ``b`` iff it produced rows in one of the
      last ``idle_batches`` batches (``last_seen > b - idle_batches``);
      a source never seen is idle (it cannot pin the watermark at -inf);
    - ``wm(b) = min over active sources of running-max event time``,
      minus ``delay``, monotonically non-decreasing; NULL while no source
      is active yet.

    Reference: WatermarksWithIdleness.java (timeout-based deactivation),
    StatusWatermarkValve.java (min over non-idle channels)."""
    spark = stream.sparkSession
    delay_td = pd.Timedelta(delay)
    state = {
        "last_seen": {s: None for s in sources},
        "max_ts": {s: None for s in sources},
        "wm": None,
        "trace": [],
    }

    def process(batch: DataFrame, batch_id: int) -> None:
        maxes = {
            r["s"]: r["m"]
            for r in batch.groupBy(F.col(src_col).alias("s"))
            .agg(F.max(ts_col).alias("m"))
            .collect()
        }
        for s, mx in maxes.items():
            if mx is None:
                continue
            state["last_seen"][s] = batch_id
            prev = state["max_ts"][s]
            state["max_ts"][s] = mx if prev is None else max(prev, mx)
        actives = {
            s: (
                state["last_seen"][s] is not None
                and state["last_seen"][s] > batch_id - idle_batches
            )
            for s in sources
        }
        live = [state["max_ts"][s] for s in sources if actives[s]]
        if live:
            cand = min(live) - delay_td
            state["wm"] = (
                cand if state["wm"] is None else max(state["wm"], cand)
            )
        state["trace"].append(
            (batch_id, *[actives[s] for s in sources], state["wm"])
        )

    import shutil
    import tempfile

    ckpt = tempfile.mkdtemp(prefix="flink_spark_idleness_ckpt_")
    try:
        q = (
            stream.writeStream.foreachBatch(process)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    cols = ", ".join(f"{s}_active boolean" for s in sources)
    return spark.createDataFrame(
        state["trace"], f"batch_id long, {cols}, wm timestamp_ntz"
    )
