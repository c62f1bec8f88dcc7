"""Hadoop SequenceFile format (reference
flink-formats/flink-sequence-file SequenceFileWriterFactory — a bulk
writer over Hadoop's SequenceFile.Writer<K extends Writable, V>).

Spark lowering: the JVM Hadoop classes ship with pyspark, so read/write
go through ``sc.sequenceFile`` / ``saveAsSequenceFile`` — string columns
map to ``Text`` and binary columns to ``BytesWritable``, the same Writable
pairs the reference factory produces. This is one of the rare justified
RDD uses: SequenceFile is a key/value *container* format with no
DataFrame source, and the RDD bridge is exactly the per-partition
writer loop Flink's bulk format runs (one output file per task, scan
parallelism = HDFS splits on read — both scale-shaped)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_sequence_file(
    df: DataFrame, path: str, key_col: str, value_col: str
) -> None:
    """Write two columns as a SequenceFile; str → Text, bytes →
    BytesWritable (chosen per column from the DataFrame schema)."""
    types = dict(df.dtypes)
    for c in (key_col, value_col):
        if types[c] not in ("string", "binary"):
            raise ValueError(
                f"sequence-file columns must be STRING or BINARY, {c} is {types[c]}"
            )
    def pair(r):
        # Writables have no null representation (the reference's
        # SequenceFileWriterFactory has the same contract) — fail loud
        # instead of letting Hadoop throw a class-mismatch deep in a task
        if r[0] is None or r[1] is None:
            raise ValueError(
                "sequence-file cannot encode NULL; COALESCE the column first"
            )
        return (r[0], r[1])

    df.select(key_col, value_col).rdd.map(pair).saveAsSequenceFile(path)


def read_sequence_file(
    spark: SparkSession,
    path: str,
    key_name: str = "key",
    value_name: str = "value",
    key_type: str = "string",
    value_type: str = "string",
) -> DataFrame:
    """Read a SequenceFile directory back as a two-column DataFrame."""

    def norm(v, t):
        if t == "binary" and v is not None:
            return bytes(v)
        return v

    rdd = spark.sparkContext.sequenceFile(path).map(
        lambda kv: (norm(kv[0], key_type), norm(kv[1], value_type))
    )
    return spark.createDataFrame(
        rdd, f"{key_name} {key_type}, {value_name} {value_type}"
    )
