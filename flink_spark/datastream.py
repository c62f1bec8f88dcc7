"""DataStream API: the reference's low-level fluent entry point
(`env.fromSource(...).keyBy(...).window(...).aggregate(...)`; reference
flink-runtime/.../streaming/api/environment/StreamExecutionEnvironment.java:772-1770
`fromData`/`fromSequence`/`fromSource`, DataStream.java:211-422
`union`/`map`/`keyBy`, KeyedStream.java windowing).

SURVEY §3.3: Flink's DataStream calls append Transformations with no
optimizer — what you write is what runs. The Spark-first rendition keeps
the *surface* but routes every call through the DataFrame layer so
Catalyst still optimizes: expression-valued ``map``/``filter`` stay
whole-stage-codegen'd JVM; Python-callable ``map``/``flat_map`` go
through Arrow-batched ``mapInPandas`` (per-batch ``pandas.DataFrame →
pandas.DataFrame``, never row-at-a-time); ``key_by().window().reduce/
aggregate`` is ``groupBy(window(...), keys)``; ``process`` hands off to
``applyInPandas`` over the key groups. Works identically over batch and
streaming DataFrames (bounded streams are Flink's own "batch is a
special case" stance).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


class StreamExecutionEnvironment:
    """Entry point (reference StreamExecutionEnvironment.java)."""

    def __init__(self, spark: SparkSession):
        from flink_spark.session import prepare_session

        self.spark = prepare_session(spark)

    def from_data(self, rows, schema: str) -> "DataStream":
        """fromData / fromCollection (reference :772)."""
        return DataStream(self.spark.createDataFrame(rows, schema))

    def from_sequence(self, start: int, end: int) -> "DataStream":
        """fromSequence (reference :965): inclusive bounds, column `id`."""
        return DataStream(self.spark.range(start, end + 1))

    def from_source(self, df: DataFrame) -> "DataStream":
        """fromSource (reference :1770): adopt any (streaming) DataFrame —
        `spark.readStream` is the FLIP-27 source surface."""
        return DataStream(df)


class DataStream:
    def __init__(self, df: DataFrame):
        self._df = df

    # -- stateless transforms ---------------------------------------------

    def map(self, fn, output_schema: str | None = None) -> "DataStream":
        """Column expression → JVM projection; Python callable
        (pandas.DataFrame → pandas.DataFrame) → Arrow-batched mapInPandas
        (requires ``output_schema``)."""
        if isinstance(fn, Column):
            return DataStream(self._df.select("*", fn))
        if output_schema is None:
            raise ValueError("python map requires output_schema")

        def run(batches):
            for pdf in batches:
                yield fn(pdf)

        return DataStream(self._df.mapInPandas(run, output_schema))

    def flat_map(self, fn, output_schema: str) -> "DataStream":
        """fn: pandas.DataFrame → pandas.DataFrame with any row count."""
        def run(batches):
            for pdf in batches:
                yield fn(pdf)

        return DataStream(self._df.mapInPandas(run, output_schema))

    def filter(self, predicate) -> "DataStream":
        return DataStream(self._df.filter(predicate))

    def union(self, *others: "DataStream") -> "DataStream":
        out = self._df
        for o in others:
            out = out.unionByName(o._df)
        return DataStream(out)

    # -- keyed -------------------------------------------------------------

    def key_by(self, *keys) -> "KeyedStream":
        return KeyedStream(self._df, [
            F.col(k) if isinstance(k, str) else k for k in keys
        ])

    # -- sinks -------------------------------------------------------------

    def print(self) -> None:  # noqa: A003 - reference API name
        self._df.show(truncate=False)

    def sink_to(self, path: str, fmt: str = "parquet") -> None:
        self._df.write.format(fmt).mode("append").save(path)

    def execute_and_collect(self):
        return self._df.collect()

    def to_data_frame(self) -> DataFrame:
        return self._df


class KeyedStream:
    def __init__(self, df: DataFrame, keys: list[Column]):
        self._df, self._keys = df, keys

    def window(self, size: str, slide: str | None = None,
               time_col: str = "ts") -> "WindowedStream":
        """Tumbling (size) or sliding (size, slide) event-time window
        (reference KeyedStream.window(TumblingEventTimeWindows.of(...)))."""
        w = (
            F.window(F.col(time_col), size)
            if slide is None else F.window(F.col(time_col), size, slide)
        )
        return WindowedStream(self._df, self._keys, w)

    def reduce(self, *aggs) -> DataStream:
        return DataStream(self._df.groupBy(*self._keys).agg(*aggs))

    aggregate = reduce

    def process(self, fn, output_schema: str) -> DataStream:
        """Keyed process function (reference KeyedProcessFunction):
        fn(pandas.DataFrame for one key group) → pandas.DataFrame,
        executed via applyInPandas. For timer/state semantics use
        flink_spark.streaming's stateful processors."""
        return DataStream(
            self._df.groupBy(*self._keys).applyInPandas(fn, output_schema)
        )


class WindowedStream:
    def __init__(self, df: DataFrame, keys: list[Column], window: Column):
        self._df, self._keys, self._w = df, keys, window

    def reduce(self, *aggs) -> DataStream:
        return DataStream(
            self._df.groupBy(self._w.alias("window"), *self._keys).agg(*aggs)
        )

    aggregate = reduce


class ConnectedStreams:
    """Two-input connected streams (reference DataStream.connect →
    ConnectedStreams.java): both sides are tagged and unioned onto a
    common null-padded shape; a keyed two-input processor then sees each
    key's rows from BOTH sides per batch — the same lowering
    streaming/coprocess.py uses for CoProcessFunction, surfaced
    fluently."""

    def __init__(self, left: DataStream, right: DataStream):
        self._l, self._r = left, right

    def key_by(self, left_key: str, right_key: str) -> "KeyedConnectedStreams":
        return KeyedConnectedStreams(self._l, self._r, left_key, right_key)


class KeyedConnectedStreams:
    def __init__(self, left: DataStream, right: DataStream,
                 lk: str, rk: str):
        self._l, self._r, self._lk, self._rk = left, right, lk, rk

    def process(self, fn, output_schema: str,
                left_seq: list[str] | None = None,
                right_seq: list[str] | None = None) -> DataStream:
        """CoProcessFunction (reference CoProcessFunction.java):
        ``fn(key, left_pdf, right_pdf, state) -> pandas.DataFrame`` with
        per-key state carried across micro-batches."""
        from flink_spark.streaming.coprocess import co_process

        ldf = self._l.to_data_frame().withColumnRenamed(self._lk, "__ck")
        rdf = self._r.to_data_frame().withColumnRenamed(self._rk, "__ck")
        return DataStream(co_process(
            ldf, rdf, ["__ck"], fn, output_schema,
            left_seq or [c for c in ldf.columns if c != "__ck"],
            right_seq or [c for c in rdf.columns if c != "__ck"],
        ))


def _connect(self: DataStream, other: DataStream) -> ConnectedStreams:
    return ConnectedStreams(self, other)


DataStream.connect = _connect
