"""Hybrid source: bounded backfill then switch to the live stream
(reference flink-connector-base/.../source/hybrid/HybridSource.java,
HybridSourceSplitEnumerator.java — sequential sources with a switch
event once the bounded one finishes).

Spark-first rendition: Structured Streaming's file source is ALREADY a
hybrid source — it enumerates every pre-existing file (the bounded
history) before discovering new ones — so the Spark mapping is a single
``readStream`` over a directory that both the historical backfill and
the live feed land in. What this module adds is the reference's
*explicit two-source* form with a switch position:

- ``hybrid_stream(spark, bounded_dir, live_dir, ...)`` exposes one
  streaming DataFrame that drains every file of ``bounded_dir`` first
  (oldest mtimes → earliest micro-batches under maxFilesPerTrigger),
  then continues with ``live_dir`` files as they appear — one unified
  offset log, so checkpoint/restart replays the same sequence
  (the reference's HybridSourceEnumeratorState).
- ``switch_position(df)`` tags each row with its originating phase
  (``bounded``/``live``) — the observable analog of SwitchSourceEvent,
  letting downstream logic (e.g. metric resets at handoff) react.

At scale the bounded side is typically a large partitioned table: point
``bounded_dir`` at it and Spark's file index enumerates its splits in
parallel; the live side is the landing zone of the producer.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_spark.session import prepare_session

_PHASE_COL = "__hybrid_phase"


def hybrid_stream(
    spark: SparkSession,
    bounded_dir: str,
    live_dir: str,
    schema=None,
    max_files_per_trigger: int | None = 1,
    with_phase: bool = False,
) -> DataFrame:
    """One streaming DataFrame: all of ``bounded_dir`` first, then
    ``live_dir``. Both directories must share a schema (inferred from the
    bounded side when ``schema`` is None). File order inside a source is
    modification-time order — the bounded files are pinned older than any
    live file so the switch is strictly after the backfill drains."""
    import tempfile

    prepare_session(spark)
    if schema is None:
        from flink_spark.sources.tables import table_schema

        schema = table_schema(spark, bounded_dir)
    # pin bounded files strictly older than any live file: the file
    # source's mtime ordering then IS the reference's source sequence
    base = 1_500_000_000
    files = sorted(
        f for f in os.listdir(bounded_dir) if not f.startswith(("_", "."))
    )
    for i, f in enumerate(files):
        os.utime(os.path.join(bounded_dir, f), (base + i, base + i))
    # union view: one glob root with a symlink per phase — the glob is
    # re-evaluated every micro-batch, so files landing in live_dir keep
    # being discovered after the backfill drains. Deterministic per
    # (bounded, live) pair so repeated calls reuse one dir.
    import hashlib

    tag = hashlib.md5(
        f"{os.path.abspath(bounded_dir)}|{os.path.abspath(live_dir)}".encode()
    ).hexdigest()[:12]
    union = os.path.join(tempfile.gettempdir(), f"flink_spark_hybrid_{tag}")
    os.makedirs(union, exist_ok=True)
    for link, target in (
        ("0_bounded", bounded_dir), ("1_live", live_dir)
    ):
        p = os.path.join(union, link)
        if not os.path.islink(p):
            os.symlink(os.path.abspath(target), p)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(f"{union}/*")
    if with_phase:
        df = df.withColumn(
            _PHASE_COL,
            F.when(
                F.input_file_name().contains("0_bounded"),
                F.lit("bounded"),
            ).otherwise(F.lit("live")),
        )
    return df


def switch_position(df: DataFrame):
    """Split a phase-tagged hybrid stream into its (bounded, live) parts —
    the observable SwitchSourceEvent boundary."""
    if _PHASE_COL not in df.columns:
        raise ValueError("switch_position requires hybrid_stream(with_phase=True)")
    bounded = df.filter(F.col(_PHASE_COL) == "bounded").drop(_PHASE_COL)
    live = df.filter(F.col(_PHASE_COL) == "live").drop(_PHASE_COL)
    return bounded, live
