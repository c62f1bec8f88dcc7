"""Streaming source/sink plumbing: file-source streams over the test
tables, watermarks, and a run-to-completion helper.

Reference surface: FLIP-27 sources + unified Sink V2 (reference
flink-core/.../api/connector/source/Source.java, .../sink2/Sink.java) map to
``spark.readStream`` / ``writeStream``. Flink's bounded-stream execution of
a batch table ("batch is a special case of streaming") is exactly
Structured Streaming's ``Trigger.AvailableNow`` over a file source: the
same operators run watermark-driven, then the query drains and stops.

``run_to_memory`` is the test/driver bridge: execute a streaming plan to
completion on bounded input and hand back the result as a batch DataFrame —
which is what lets the DuckDB oracle gate value-check *streaming* operators.
"""

from __future__ import annotations

import itertools
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_spark.session import prepare_session

_COUNTER = itertools.count()

_STREAM_DIR_ROOT = "/tmp/flink_spark_stream_src"

#: Event-time of the watermark-advancing sentinel row (see
#: ``stream_table(closed=True)``) and the cutoff that filters it back out.
#: Any real event-time in the test tables is < 2090; the sentinel sits at
#: 2100 so the final watermark passes every real window's end.
_SENTINEL_ISO = "2100-01-01 00:00:00"
_SENTINEL_CUTOFF_ISO = "2090-01-01 00:00:00"


def _source_files(file_path: str) -> list[str]:
    """A table path is either one parquet file or a directory of
    part-files (the multi-file bench layout); list the actual files."""
    if os.path.isdir(file_path):
        return sorted(
            os.path.join(file_path, f)
            for f in os.listdir(file_path)
            if f.endswith(".parquet")
        )
    return [file_path]


def _as_dir(file_path: str, suffix: str = "") -> str:
    """The file stream source requires a flat *directory*; expose the
    table's file(s) through a stable symlink directory under /tmp."""
    key = file_path.strip("/").replace("/", "_") + suffix
    d = os.path.join(_STREAM_DIR_ROOT, key)
    os.makedirs(d, exist_ok=True)
    for src in _source_files(file_path):
        link = os.path.join(d, os.path.basename(src))
        if not os.path.islink(link):
            try:
                os.symlink(src, link)
            except FileExistsError:
                pass
    return d


def _closed_dir(file_path: str, wm_col: str) -> str:
    """A stream-source directory for ``file_path`` plus one *sentinel* row
    whose event time (2100) out-runs every real row. Draining it under
    AvailableNow advances the final watermark past every real window's end,
    so ``append``-mode stateful operators fire-and-purge all state — the
    micro-batch analog of Flink's end-of-input MAX_WATERMARK flush
    (reference flink-core/.../eventtime/Watermark.java MAX_WATERMARK,
    emitted by SourceOperator on bounded input end)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = _as_dir(file_path, suffix=f"_closed_{wm_col}")
    sentinel = os.path.join(d, "zz_watermark_sentinel.parquet")
    if not os.path.exists(sentinel):
        sch = pq.read_schema(_source_files(file_path)[0]).remove_metadata()
        import datetime

        ts_val = datetime.datetime.fromisoformat(_SENTINEL_ISO)
        arrays = []
        for field in sch:
            if field.name == wm_col:
                if pa.types.is_timestamp(field.type):
                    val = ts_val
                else:  # int64 epoch-nanos variant of the events table
                    val = int(ts_val.timestamp() * 1_000_000_000)
                arrays.append(pa.array([val], type=field.type))
            else:
                arrays.append(pa.array([None], type=field.type))
        pq.write_table(pa.table(arrays, schema=sch), sentinel + ".tmp")
        os.replace(sentinel + ".tmp", sentinel)
    return d


def stream_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    watermark: tuple[str, str] | None = None,
    closed: bool = False,
) -> DataFrame:
    """Open one test table as a *streaming* DataFrame (file source).

    The schema is taken from a batch read of the same path (schema
    inference is disabled for streaming file sources); the events table's
    nanos→TIMESTAMP_NTZ normalization matches sources/tables.py.
    ``watermark=(col, delay)`` applies ``withWatermark`` — the Spark
    surface of Flink's WATERMARK DDL (bounded out-of-orderness).

    ``closed=True`` (requires ``watermark``) adds a year-2100 sentinel row
    to the source and filters it back out *after* the watermark operator:
    the sentinel still raises the final watermark (event-time stats are
    collected as rows pass the EventTimeWatermark node, before the filter),
    so append-mode windows all close on the drain — Flink's end-of-input
    MAX_WATERMARK semantics — without the sentinel polluting any result.
    """
    prepare_session(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    from flink_spark.sources.tables import table_schema

    schema = table_schema(spark, path)
    if closed:
        if watermark is None:
            raise ValueError("closed=True requires a watermark")
        src_dir = _closed_dir(path, watermark[0])
    else:
        src_dir = _as_dir(path)
    df = spark.readStream.schema(schema).parquet(src_dir)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.expr("CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP_NTZ)")
        )
    if watermark is not None:
        col, delay = watermark
        # Spark watermarks require TIMESTAMP (LTZ). Session tz is pinned to
        # UTC (prepare_session), so the NTZ→LTZ cast is value-preserving;
        # window bounds are cast back to NTZ by ntz_windows() on output.
        df = df.withColumn(col, F.col(col).cast("timestamp")).withWatermark(
            col, delay
        )
        if closed:
            # The `spark_partition_id() >= -1` conjunct is always true; it
            # makes this filter NON-DETERMINISTIC so Catalyst cannot merge
            # later, caller-added filters into it nor push them below the
            # EventTimeWatermark node. Without the barrier, a filter like
            # `user_id <= 100` (NULL for the sentinel row → false) would be
            # pushed below the watermark and drop the sentinel *before*
            # event-time stats are collected, silencing the final flush.
            # (`rand() >= -1` doesn't work: the optimizer knows rand's
            # bounds and folds it away.)
            df = df.filter(
                (F.spark_partition_id() >= F.lit(-1))
                & (F.col(col) < F.lit(_SENTINEL_CUTOFF_ISO).cast("timestamp"))
            )
    return df


def ntz_windows(df: DataFrame, *cols: str) -> DataFrame:
    """Cast LTZ window-bound columns back to TIMESTAMP_NTZ (UTC session)."""
    for c in cols:
        df = df.withColumn(c, F.col(c).cast("timestamp_ntz"))
    return df


def run_to_memory(
    sdf: DataFrame, output_mode: str = "append", prefix: str = "fs_stream"
) -> DataFrame:
    """Run a streaming DataFrame to completion (AvailableNow) into a memory
    sink; return the sink contents as a batch DataFrame.

    State-partition sizing: the number of state-store instances is fixed at
    query start from ``spark.sql.shuffle.partitions``, and each instance
    pays per-batch snapshot/commit overhead — so streaming queries use
    their own partition count (``SPARK_GRAFT_STREAM_SHUFFLE``, default 4
    for local runs — A/B-measured ~25% faster than 8 at sf0.1; on a cluster set it ~1-2x total cores, it bounds both
    state parallelism AND per-batch commit fan-out). The batch setting is
    restored after the drain.
    """
    import os
    import shutil
    import tempfile

    spark = sdf.sparkSession
    name = f"{prefix}_{next(_COUNTER)}"
    stream_shuffle = os.environ.get("SPARK_GRAFT_STREAM_SHUFFLE", "4")
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", stream_shuffle)
    # Explicit run-local checkpoint, deleted after the drain. Placed on
    # tmpfs when available (A/B-neutral vs page-cached /tmp locally, but
    # guarantees no disk churn). On a real cluster the checkpoint must be
    # durable shared storage — this helper is the local test/bench bridge,
    # not the production sink.
    ckpt_root = os.environ.get("SPARK_GRAFT_CKPT_ROOT") or (
        "/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    ckpt = tempfile.mkdtemp(prefix=f"flink_spark_ckpt_{name}_", dir=ckpt_root)
    try:
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name)


def chunked_table_stream(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    n_chunks: int = 2,
    order_col: str | None = None,
    order_hash: bool = False,
) -> DataFrame:
    """Open one test table as a streaming DataFrame delivered in
    ``n_chunks`` micro-batches (one file per trigger). The chunked copy is
    materialized once under /tmp, split on ``order_col`` order (arrival
    order for None) — the harness for operators whose correctness must
    hold *across* micro-batch boundaries."""
    if order_hash and order_col is None:
        raise ValueError("order_hash=True requires an order_col")
    path = os.path.join(sf_dir, f"{name}.parquet")
    key = path.strip("/").replace("/", "_") + (
        f"_chunks{n_chunks}_{order_col or 'arrival'}"
        + ("_h" if order_hash else "")
    )
    d = os.path.join(_STREAM_DIR_ROOT, key)
    marker = os.path.join(d, f"_chunked_{n_chunks}_us")
    if not os.path.exists(marker):
        import pandas as pd

        os.makedirs(d, exist_ok=True)
        for f in os.listdir(d):
            os.remove(os.path.join(d, f))
        pdf = pd.read_parquet(path)
        if order_col is not None and order_hash:
            # arrival order = md5 of the (unique) order column: a
            # deterministic shuffle both engines can reproduce
            # (SQL: ORDER BY md5(CAST(col AS VARCHAR))), uncorrelated
            # with event time — the out-of-order-delivery harness
            import hashlib

            pdf = (
                pdf.assign(__o=[
                    hashlib.md5(str(v).encode()).hexdigest()
                    for v in pdf[order_col]
                ])
                .sort_values("__o")
                .drop(columns="__o")
                .reset_index(drop=True)
            )
        elif order_col is not None:
            pdf = pdf.sort_values(order_col).reset_index(drop=True)
        # normalize ns timestamps to µs at write time: truncation matches
        # DuckDB's parquet ns→µs read exactly, and frees the stream from
        # the session's nanosAsLong setting (a vanilla session would
        # otherwise read nanos natively and disagree on boundary rows)
        for c in pdf.columns:
            if str(pdf[c].dtype).startswith("datetime64[ns"):
                pdf[c] = pdf[c].astype("datetime64[us]")
        n = len(pdf)
        for i in range(n_chunks):
            part = pdf.iloc[i * n // n_chunks : (i + 1) * n // n_chunks]
            part.to_parquet(os.path.join(d, f"part-{i}.parquet"), index=False)
        with open(marker, "w") as fh:
            fh.write("ok")
    # Spark's file stream source orders files by MODIFICATION TIME; files
    # written within the same instant tie, making batch order (and any
    # order-sensitive operator on top) nondeterministic. Pin strictly
    # increasing mtimes — applied on every call so pre-fix cached dirs
    # are repaired too.
    base = 1_600_000_000
    for i in range(n_chunks):
        p = os.path.join(d, f"part-{i}.parquet")
        if os.path.exists(p):
            os.utime(p, (base + i * 60, base + i * 60))
    # schema from the CHUNK files (µs-normalized), not the original table:
    # the ns-column legacy/bigint handling never applies to the chunks
    from flink_spark.sources.tables import table_schema

    schema = table_schema(spark, d)
    df = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.expr("CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP_NTZ)")
        )
    return df


def run_files_in_batches(
    spark: SparkSession,
    dir_path: str,
    schema,
    transform,
    output_mode: str = "append",
    files_per_trigger: int = 1,
    prefix: str = "fs_batched",
) -> DataFrame:
    """Stream a directory one file per micro-batch (watermark advances
    between batches — the late-data test harness)."""
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(dir_path)
    )
    return run_to_memory(transform(src), output_mode, prefix)


def with_current_watermark(
    stream: DataFrame, key_cols: list[str], out_col: str = "wm"
) -> DataFrame:
    """CURRENT_WATERMARK(rowtime) (reference SqlCurrentWatermarkFunction,
    FlinkSqlOperatorTable CURRENT_WATERMARK): annotate every row with the
    watermark in effect while it was processed.

    Spark exposes the running watermark to stateful processors via
    ``GroupState.getCurrentWatermarkMs`` — an Arrow-batched pass-through
    processor stamps it onto each row (ms resolution, Spark's watermark
    granularity; 1970-01-01 before the first watermark is computed)."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        TimestampNTZType,
    )

    schema = StructType(
        list(stream.schema.fields) + [StructField(out_col, TimestampNTZType())]
    )
    state_schema = StructType([StructField("seen", LongType(), True)])

    def fn(key, pdfs, state):
        wm = pd.Timestamp(state.getCurrentWatermarkMs(), unit="ms")
        for pdf in pdfs:
            pdf = pdf.copy()
            pdf[out_col] = wm
            yield pdf

    return stream.groupBy(*key_cols).applyInPandasWithState(
        fn, schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def side_output_late(
    stream: DataFrame,
    ts_col: str,
    delay: str,
    prefix: str = "late_split",
    root: str | None = None,
):
    """Late-data SIDE OUTPUT (reference WindowOperator.java:102
    sideOutput(lateDataOutputTag), OutputTag.java:47): drain the stream
    splitting every micro-batch into on-time vs late relative to the
    watermark frozen at batch start (max event time over all PRIOR
    batches minus ``delay`` — Spark's own between-batches watermark
    update cadence, which Flink's periodic generator also exhibits).
    Returns ``(on_time_df, late_df)`` batch DataFrames after the drain —
    the two OutputTag channels.

    Scale shape: the split is one JVM comparison per row against a
    literal; the only driver state is a single scalar max timestamp.

    The watermark SURVIVES RESTARTS (reference checkpointed watermarks —
    AbstractStreamOperator snapshots the current watermark; Spark persists
    ``withWatermark`` through the offset log): each batch writes its max
    event time to a one-line sidecar under the checkpoint root keyed by
    batch id, and every batch derives its frozen watermark from the
    sidecars of STRICTLY EARLIER batches — so a replayed batch after a
    crash recomputes the exact same split, and a second run against the
    same ``root`` (the restart path) classifies late data against the
    watermark the first run reached instead of silently resetting to
    None. Pass ``root`` to make the query restartable; the default keeps
    the one-shot tmp-dir behavior."""
    import shutil as _sh
    import tempfile

    import pandas as pd

    spark = stream.sparkSession
    delay_td = pd.Timedelta(delay)
    owns_root = root is None
    if root is None:
        root = tempfile.mkdtemp(prefix=f"flink_spark_{prefix}_")
    on_dir, late_dir, ckpt = f"{root}/on", f"{root}/late", f"{root}/ckpt"
    wm_dir = f"{root}/wm"
    os.makedirs(wm_dir, exist_ok=True)

    def _wm_before(batch_id: int):
        """Max event time over committed batches with id < batch_id (the
        checkpointed-watermark restore; excluding the batch's own id makes
        crash-replay exact)."""
        mx = None
        for f in os.listdir(wm_dir):
            if not f.startswith("batch-"):
                continue
            bid = int(f.split("-", 1)[1].split(".", 1)[0])
            if bid >= batch_id:
                continue
            with open(os.path.join(wm_dir, f)) as fh:
                t = pd.Timestamp(fh.read().strip())
            mx = t if mx is None or t > mx else mx
        return mx

    ntz = dict(stream.dtypes).get(ts_col) == "timestamp_ntz"

    def _wm_lit(wm):
        # an NTZ column must compare against an NTZ literal: F.lit(naive
        # datetime) builds an LTZ literal through the PYTHON process tz,
        # while the NTZ→LTZ comparison cast uses the SESSION tz — under a
        # non-UTC session the two disagree and the watermark skews
        if ntz:
            return F.expr(f"TIMESTAMP_NTZ '{wm.isoformat(sep=' ')}'")
        return F.lit(wm)

    def process(batch: DataFrame, batch_id: int) -> None:
        batch = batch.persist()
        try:
            max_prev = _wm_before(batch_id)
            wm = max_prev - delay_td if max_prev is not None else None
            if wm is None:
                late = batch.filter(F.lit(False))
                on_time = batch
            else:
                late = batch.filter(F.col(ts_col) < _wm_lit(wm))
                on_time = batch.filter(~(F.col(ts_col) < _wm_lit(wm)))
            # the two channel appends and the batch-max aggregate are
            # independent jobs over the persisted batch — overlap them
            # (storeutil.run_parallel, guide §2.6) so the batch pays
            # ~max instead of 3 sequential job costs; the watermark
            # sidecar still commits strictly AFTER all three (a crashed
            # batch must never leave a sidecar ahead of its data)
            from flink_spark.streaming.storeutil import run_parallel

            holder: dict = {}

            def _agg():
                holder["mx"] = (
                    batch.agg(F.max(ts_col).alias("m")).collect()[0].m
                )

            run_parallel(
                lambda: on_time.write.mode("append").parquet(on_dir),
                lambda: late.write.mode("append").parquet(late_dir),
                _agg,
            )
            mx = holder["mx"]
            if mx is not None:
                tmp = os.path.join(wm_dir, f".batch-{batch_id}.tmp")
                with open(tmp, "w") as fh:
                    fh.write(pd.Timestamp(mx).isoformat())
                os.replace(tmp, os.path.join(wm_dir, f"batch-{batch_id}.txt"))
        finally:
            batch.unpersist()

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    empty = spark.createDataFrame([], stream.schema)
    on_df = (
        spark.read.parquet(on_dir).localCheckpoint(eager=True)
        if os.path.isdir(on_dir) else empty
    )
    late_df = (
        spark.read.parquet(late_dir).localCheckpoint(eager=True)
        if os.path.isdir(late_dir) else empty
    )
    if owns_root:
        _sh.rmtree(root, ignore_errors=True)
    return on_df, late_df
