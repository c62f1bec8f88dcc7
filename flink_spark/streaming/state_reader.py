"""Offline state inspection: the flink-state-processor-api analog
(reference flink-libraries/flink-state-processor-api — read a
savepoint/checkpoint's operator state as a bounded table; e.g.
SavepointReader.readKeyedState).

Spark-first mapping: Structured Streaming checkpoints ARE savepoints
(offset log + state store snapshots), and Spark 4 ships a STATE DATA
SOURCE that reads them as DataFrames. This module wraps it with the
reference's ergonomics: list the operators/stores of a checkpoint, read
one store's keyed state flattened to columns, pick a historical batch
version (the savepoint-at-offset view).

Everything is a plain DataFrame read — the state files scan in parallel
per state-store partition, so inspecting a 1000-partition store at scale
is one bounded Spark job, exactly how the reference's reader distributes
over key groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def state_metadata(spark: SparkSession, checkpoint_dir: str) -> DataFrame:
    """The checkpoint's operator/store inventory (reference
    SavepointReader metadata enumeration): operator ids/names, store
    names, partition counts, and the batch-id range still readable."""
    return spark.read.format("state-metadata").load(checkpoint_dir)


def read_keyed_state(
    spark: SparkSession,
    checkpoint_dir: str,
    operator_id: int = 0,
    store_name: str | None = None,
    batch_id: int | None = None,
    flatten: bool = True,
) -> DataFrame:
    """Keyed state of one operator as a bounded DataFrame (reference
    SavepointReader.readKeyedState). ``batch_id`` selects a historical
    snapshot (savepoint-at-offset); default is the latest committed.
    With ``flatten`` the key/value structs expand to top-level columns
    (key columns first), mirroring the reference's typed reader output."""
    reader = (
        spark.read.format("statestore")
        .option("operatorId", operator_id)
    )
    if store_name is not None:
        reader = reader.option("storeName", store_name)
    if batch_id is not None:
        reader = reader.option("batchId", batch_id)
    df = reader.load(checkpoint_dir)
    if not flatten:
        return df
    cols = []
    for f_ in df.schema["key"].dataType.fields:
        cols.append(F.col(f"key.{f_.name}").alias(f"key_{f_.name}"))
    for f_ in df.schema["value"].dataType.fields:
        cols.append(F.col(f"value.{f_.name}").alias(f_.name))
    return df.select(*cols, "partition_id")
