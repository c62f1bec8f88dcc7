"""DataStream API V2 (FLIP-408/409/410; reference flink-datastream-api/
.../datastream/api/: ExecutionEnvironment.java, stream/
{NonKeyedPartitionStream,KeyedPartitionStream,GlobalStream,
BroadcastStream}.java, function/{OneInputStreamProcessFunction,
TwoOutputStreamProcessFunction,TwoInputNonBroadcastStreamProcessFunction,
TwoInputBroadcastStreamProcessFunction}.java, context/StateManager.java,
builtin/BuiltinFuncs.java, extension/window/strategy/*).

Spark-first rendition of the V2 surface — the partition-stream taxonomy
and ProcessFunction lifecycle are the API; execution routes through the
DataFrame layer so Catalyst keeps optimizing:

  - ``NonKeyedPartitionStream.process`` → Arrow-batched ``mapInPandas``
    (per-record ``process_record(record, Collector, ctx)`` inside the
    batch loop — the V2 record-at-a-time contract, Arrow-amortized).
  - ``KeyedPartitionStream.process`` → ``applyInPandas`` over key groups
    (bounded) or ``applyInPandasWithState`` (streaming) with the
    function's declared states (``use_states`` → StateDeclaration, the
    FLIP-410 StateManager contract) backed by the state store.
  - ``GlobalStream`` → a single partition (``coalesce(1)``), the V2
    "all records in one partition" semantics.
  - ``BroadcastStream.connect_and_process`` → the broadcast side is
    materialized once and replayed through
    ``process_record_from_broadcast`` on every partition before the
    non-broadcast side streams through — the reference's broadcast-state
    initialization order.
  - ``BuiltinFuncs.map/filter`` (FLIP-409): Column expressions stay
    whole-stage-codegen'd JVM; Python callables take the Arrow path.
  - Window strategies (extension/window): Tumbling/Sliding → native
    ``F.window`` group-bys; Session → native ``F.session_window``.

Records cross the Python boundary only inside an explicit
ProcessFunction — the built-in ops never leave the JVM.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_STATE_DTYPES = {"bigint": int, "double": float, "string": str}

def _schema_cols(schema: str) -> list[str]:
    from pyspark.sql.types import StructType

    return [f.name for f in StructType.fromDDL(schema).fields]



@dataclass(frozen=True)
class StateDeclaration:
    """FLIP-410 StateDeclaration (reference
    flink-core-api/.../state/StateDeclaration.java): name + type +
    default, declared by ``ProcessFunction.use_states``."""

    name: str
    dtype: str  # bigint | double | string
    default: object = None

    def __post_init__(self):
        if self.dtype not in _STATE_DTYPES:
            raise ValueError(
                f"state {self.name!r}: dtype {self.dtype!r} not in "
                f"{sorted(_STATE_DTYPES)}"
            )


class StateManager:
    """Per-key state access (reference context/StateManager.java): values
    live in the keyed state store; get/update inside process_record."""

    def __init__(self, decls: list[StateDeclaration], values: tuple | None):
        self._idx = {d.name: i for i, d in enumerate(decls)}
        self._decls = decls
        self._vals = (
            list(values) if values is not None
            else [d.default for d in decls]
        )

    def get(self, decl: StateDeclaration):
        return self._vals[self._idx[decl.name]]

    def update(self, decl: StateDeclaration, value) -> None:
        self._vals[self._idx[decl.name]] = value

    def snapshot(self) -> tuple:
        return tuple(self._vals)


class Collector:
    """reference common/Collector.java — collect emits one output record
    (a dict of column -> value, or a tuple in output-schema order)."""

    def __init__(self, columns: list[str]):
        self._columns = columns
        self.rows: list[tuple] = []

    def collect(self, record) -> None:
        if isinstance(record, dict):
            self.rows.append(tuple(record[c] for c in self._columns))
        else:
            self.rows.append(tuple(record))


class PartitionedContext:
    """reference context/PartitionedContext.java: key + state access."""

    def __init__(self, key=None, state_manager: StateManager | None = None):
        self.key = key
        self.state_manager = state_manager


class ProcessFunction:
    """Lifecycle base (reference function/ProcessFunction.java)."""

    def open(self, ctx) -> None:  # noqa: D401 - reference name
        pass

    def close(self) -> None:
        pass

    def use_states(self) -> list[StateDeclaration]:
        """FLIP-410 usesStates(): state declarations for keyed streams."""
        return []


class OneInputStreamProcessFunction(ProcessFunction):
    def process_record(self, record, output: Collector,
                       ctx: PartitionedContext) -> None:
        raise NotImplementedError


class TwoOutputStreamProcessFunction(ProcessFunction):
    def process_record(self, record, main: Collector, side: Collector,
                       ctx: PartitionedContext) -> None:
        raise NotImplementedError


class TwoInputNonBroadcastStreamProcessFunction(ProcessFunction):
    def process_record_from_first(self, record, output: Collector,
                                  ctx: PartitionedContext) -> None:
        raise NotImplementedError

    def process_record_from_second(self, record, output: Collector,
                                   ctx: PartitionedContext) -> None:
        raise NotImplementedError


class TwoInputBroadcastStreamProcessFunction(ProcessFunction):
    def process_record_from_broadcast(self, record,
                                      ctx: PartitionedContext) -> None:
        raise NotImplementedError

    def process_record_from_non_broadcast(self, record, output: Collector,
                                          ctx: PartitionedContext) -> None:
        raise NotImplementedError


# -- window strategies (extension/window/strategy/*) -----------------------


@dataclass(frozen=True)
class TumblingTimeWindowStrategy:
    ts_col: str
    size: str  # e.g. "1 hour"


@dataclass(frozen=True)
class SlidingTimeWindowStrategy:
    ts_col: str
    size: str
    slide: str


@dataclass(frozen=True)
class SessionWindowStrategy:
    ts_col: str
    gap: str


def _run_one_input(df: DataFrame, fn: OneInputStreamProcessFunction,
                   output_schema: str) -> DataFrame:
    cols = _schema_cols(output_schema)

    def run(batches):
        import pandas as pd

        fn.open(PartitionedContext())
        ctx = PartitionedContext()
        out = Collector(cols)
        for pdf in batches:
            for rec in pdf.itertuples(index=False):
                fn.process_record(rec, out, ctx)
            if out.rows:
                yield pd.DataFrame(out.rows, columns=cols)
                out.rows = []
        fn.close()

    return df.mapInPandas(run, output_schema)


class NonKeyedPartitionStream:
    """reference stream/NonKeyedPartitionStream.java."""

    def __init__(self, df: DataFrame):
        self._df = df

    # -- taxonomy ------------------------------------------------------

    def key_by(self, *keys: str) -> "KeyedPartitionStream":
        return KeyedPartitionStream(self._df, list(keys))

    def global_(self) -> "GlobalStream":
        return GlobalStream(self._df.coalesce(1))

    def broadcast(self) -> "BroadcastStream":
        return BroadcastStream(self._df)

    def shuffle(self) -> "NonKeyedPartitionStream":
        return NonKeyedPartitionStream(
            self._df.repartition(self._df.sparkSession.sparkContext
                                 .defaultParallelism)
        )

    # -- processing ----------------------------------------------------

    def process(self, fn: OneInputStreamProcessFunction,
                output_schema: str) -> "NonKeyedPartitionStream":
        return NonKeyedPartitionStream(
            _run_one_input(self._df, fn, output_schema)
        )

    def process_two_output(
        self, fn: TwoOutputStreamProcessFunction,
        main_schema: str, side_schema: str,
    ) -> tuple["NonKeyedPartitionStream", "NonKeyedPartitionStream"]:
        """TwoOutput process (reference
        ProcessConfigurableAndTwoNonKeyedPartitionStream): one pass per
        output — Spark's one-sink-per-plan model; the function must be
        deterministic (same contract the reference's replayed side
        outputs need)."""
        main_cols = _schema_cols(main_schema)
        side_cols = _schema_cols(side_schema)

        def runner(which_cols, which):
            def run(batches):
                import pandas as pd

                fn.open(PartitionedContext())
                ctx = PartitionedContext()
                main, side = Collector(main_cols), Collector(side_cols)
                for pdf in batches:
                    for rec in pdf.itertuples(index=False):
                        fn.process_record(rec, main, side, ctx)
                    out = main if which == 0 else side
                    if out.rows:
                        yield pd.DataFrame(out.rows, columns=which_cols)
                    main.rows, side.rows = [], []
                fn.close()
            return run

        return (
            NonKeyedPartitionStream(
                self._df.mapInPandas(runner(main_cols, 0), main_schema)),
            NonKeyedPartitionStream(
                self._df.mapInPandas(runner(side_cols, 1), side_schema)),
        )

    def connect_and_process(
        self, other: "NonKeyedPartitionStream",
        fn: TwoInputNonBroadcastStreamProcessFunction,
        output_schema: str,
    ) -> "NonKeyedPartitionStream":
        """Two-input non-broadcast connect (reference
        TwoInputNonBroadcastStreamProcessFunction): union-tag the sides
        (the same single-plan bridge the delta join uses) and round-robin
        repartition so every task receives records from BOTH inputs —
        the reference rebalances each input across all parallel
        instances, and a side-pure partition layout would make
        per-instance state built from the first input invisible to the
        second. Each side's records arrive in that side's OWN schema
        (the other side's padding never leaks into the record tuple).
        First input's records are processed before the second's within a
        task (side-1 rows buffer until side-0 drains); the reference
        makes no cross-input order promise beyond arrival."""
        ldt, rdt = dict(self._df.dtypes), dict(other._df.dtypes)
        lcols, rcols = list(self._df.columns), list(other._df.columns)
        left = self._df.withColumn("__ds2_side", F.lit(0))
        right = other._df.withColumn("__ds2_side", F.lit(1))
        for c in rcols:
            if c not in left.columns:
                left = left.withColumn(c, F.lit(None).cast(rdt[c]))
        for c in lcols:
            if c not in right.columns:
                right = right.withColumn(c, F.lit(None).cast(ldt[c]))
        tagged = left.select(*sorted(left.columns)).unionByName(
            right.select(*sorted(left.columns))
        )
        # round-robin shuffle: mixes both sides into every partition
        # (union alone concatenates side-pure partitions)
        tagged = tagged.repartition(
            self._df.sparkSession.sparkContext.defaultParallelism
        )
        cols = _schema_cols(output_schema)
        int_like = ("tinyint", "smallint", "int", "bigint")

        def side_records(pdf, side_cols, dts):
            # each side's own columns only; undo the float/object
            # coercion the other side's null padding forced on the
            # unioned Arrow batch (safe: own-side rows have no padding)
            sub = pdf[side_cols]
            for c in side_cols:
                if sub[c].isna().any():
                    continue  # genuine nulls: keep pandas' representation
                if dts[c] in int_like and sub[c].dtype.kind == "f":
                    sub = sub.assign(**{c: sub[c].astype("int64")})
                elif dts[c] == "boolean" and sub[c].dtype == object:
                    sub = sub.assign(**{c: sub[c].astype(bool)})
            return sub.itertuples(index=False)

        def run(batches):
            import pandas as pd

            fn.open(PartitionedContext())
            ctx = PartitionedContext()
            out = Collector(cols)
            pending = []  # side-1 chunks, replayed after side 0 drains
            for pdf in batches:
                second = pdf[pdf["__ds2_side"] == 1]
                if len(second):
                    pending.append(second)
                for rec in side_records(
                    pdf[pdf["__ds2_side"] == 0], lcols, ldt
                ):
                    fn.process_record_from_first(rec, out, ctx)
                if out.rows:
                    yield pd.DataFrame(out.rows, columns=cols)
                    out.rows = []
            for pdf in pending:
                for rec in side_records(pdf, rcols, rdt):
                    fn.process_record_from_second(rec, out, ctx)
                if out.rows:
                    yield pd.DataFrame(out.rows, columns=cols)
                    out.rows = []
            fn.close()

        return NonKeyedPartitionStream(tagged.mapInPandas(run, output_schema))

    # -- terminals -------------------------------------------------------

    def to_data_frame(self) -> DataFrame:
        return self._df

    def to_list(self) -> list:
        return [tuple(r) for r in self._df.collect()]


class GlobalStream(NonKeyedPartitionStream):
    """reference stream/GlobalStream.java: every record in ONE partition
    — process functions see the whole stream, the V2 global aggregate
    contract. Keep inputs to global streams pre-reduced at scale."""


class KeyedPartitionStream:
    """reference stream/KeyedPartitionStream.java: each key is a
    partition; process functions get the FLIP-410 StateManager."""

    def __init__(self, df: DataFrame, keys: list[str]):
        self._df = df
        self._keys = keys

    def process(self, fn: OneInputStreamProcessFunction,
                output_schema: str,
                order_by: list[str] | None = None) -> NonKeyedPartitionStream:
        """Keyed process: bounded inputs run per key group
        (``applyInPandas``); streaming inputs hold the declared states in
        the state store (``applyInPandasWithState``), so a restart
        restores them — the reference's keyed-state contract.
        ``order_by`` pins in-group record order for determinism (the V2
        API processes arrival order; Spark groups are unordered)."""
        decls = fn.use_states()
        cols = _schema_cols(output_schema)
        keys = self._keys

        if self._df.isStreaming:
            from pyspark.sql.streaming.state import GroupStateTimeout
            from pyspark.sql.types import StructType

            out_t = StructType.fromDDL(output_schema)
            state_t = StructType.fromDDL(
                ", ".join(f"{d.name} {d.dtype}" for d in decls)
                or "dummy bigint"
            )

            def sfn(key, pdfs, state):
                import pandas as pd

                sm = StateManager(
                    decls, state.get if state.exists else None
                )
                fn.open(PartitionedContext(key, sm))
                ctx = PartitionedContext(
                    key[0] if len(key) == 1 else key, sm
                )
                out = Collector(cols)
                if order_by:
                    # sort the key's WHOLE micro-batch, not each Arrow
                    # chunk: a >maxRecordsPerBatch group arrives as
                    # several chunks, and per-chunk sorting would break
                    # the promised deterministic in-group order
                    whole = pd.concat(list(pdfs), ignore_index=True)
                    pdfs = [whole.sort_values(order_by, kind="mergesort")]
                for pdf in pdfs:
                    for rec in pdf.itertuples(index=False):
                        fn.process_record(rec, out, ctx)
                state.update(sm.snapshot() if decls else (0,))
                fn.close()
                yield pd.DataFrame(out.rows, columns=cols)

            assert isinstance(out_t, StructType)
            return NonKeyedPartitionStream(
                self._df.groupBy(*keys).applyInPandasWithState(
                    sfn, out_t, state_t, "append",
                    GroupStateTimeout.NoTimeout,
                )
            )

        def gfn(pdf):
            import pandas as pd

            if order_by:
                pdf = pdf.sort_values(order_by, kind="mergesort")
            sm = StateManager(decls, None)
            key = tuple(pdf.iloc[0][k] for k in keys) if len(pdf) else None
            fn.open(PartitionedContext(key, sm))
            ctx = PartitionedContext(
                key[0] if key and len(key) == 1 else key, sm
            )
            out = Collector(cols)
            for rec in pdf.itertuples(index=False):
                fn.process_record(rec, out, ctx)
            fn.close()
            return pd.DataFrame(out.rows, columns=cols)

        return NonKeyedPartitionStream(
            self._df.groupBy(*keys).applyInPandas(gfn, output_schema)
        )

    # -- window extension (extension/window/strategy) --------------------

    def window(self, strategy) -> "V2WindowedStream":
        if isinstance(strategy, TumblingTimeWindowStrategy):
            w = F.window(F.col(strategy.ts_col), strategy.size)
        elif isinstance(strategy, SlidingTimeWindowStrategy):
            w = F.window(F.col(strategy.ts_col), strategy.size,
                         strategy.slide)
        elif isinstance(strategy, SessionWindowStrategy):
            w = F.session_window(F.col(strategy.ts_col), strategy.gap)
        else:
            raise TypeError(f"unknown window strategy: {strategy!r}")
        return V2WindowedStream(self._df, self._keys, w)

    def to_data_frame(self) -> DataFrame:
        return self._df


class V2WindowedStream:
    def __init__(self, df: DataFrame, keys: list[str], window: Column):
        self._df, self._keys, self._window = df, keys, window

    def reduce(self, *aggs: Column) -> NonKeyedPartitionStream:
        out = self._df.groupBy(self._window.alias("window"),
                               *self._keys).agg(*aggs)
        return NonKeyedPartitionStream(
            out.select(
                F.col("window.start").alias("window_start"),
                F.col("window.end").alias("window_end"),
                *self._keys,
                *[c for c in out.columns if c not in ("window", *self._keys)],
            )
        )


class BroadcastStream:
    """reference stream/BroadcastStream.java: this side is replicated to
    every partition of the other side. Bounded + small by contract (the
    reference's broadcast state lives fully on every task too)."""

    def __init__(self, df: DataFrame):
        self._df = df

    def connect_and_process(
        self, other: NonKeyedPartitionStream | KeyedPartitionStream,
        fn: TwoInputBroadcastStreamProcessFunction,
        output_schema: str,
    ) -> NonKeyedPartitionStream:
        # ship the broadcast side in the task closure: it is bounded +
        # small by contract (docstring above), and a SparkContext
        # broadcast here would never be unpersisted — the returned
        # stream is lazy, so there is no safe destroy point, and a
        # long-lived session would accumulate every broadcast payload
        rows = [r for r in self._df.collect()]
        odf = other.to_data_frame()
        cols = _schema_cols(output_schema)

        def run(batches):
            import pandas as pd

            fn.open(PartitionedContext())
            ctx = PartitionedContext()
            # the reference initializes broadcast state before the
            # non-broadcast side flows — replay the broadcast records
            # first on every partition
            for rec in rows:
                fn.process_record_from_broadcast(rec, ctx)
            out = Collector(cols)
            for pdf in batches:
                for rec in pdf.itertuples(index=False):
                    fn.process_record_from_non_broadcast(rec, out, ctx)
                if out.rows:
                    yield pd.DataFrame(out.rows, columns=cols)
                    out.rows = []
            fn.close()

        return NonKeyedPartitionStream(odf.mapInPandas(run, output_schema))


class BuiltinFuncs:
    """reference builtin/BuiltinFuncs.java (FLIP-409): the declarative
    shortcuts — Column expressions NEVER leave the JVM."""

    @staticmethod
    def map(stream: NonKeyedPartitionStream, fn,
            output_schema: str | None = None) -> NonKeyedPartitionStream:
        if isinstance(fn, Column):
            return NonKeyedPartitionStream(stream._df.select("*", fn))
        if output_schema is None:
            raise ValueError("python map requires output_schema")

        def run(batches):
            for pdf in batches:
                yield fn(pdf)

        return NonKeyedPartitionStream(
            stream._df.mapInPandas(run, output_schema)
        )

    @staticmethod
    def filter(stream: NonKeyedPartitionStream,
               predicate) -> NonKeyedPartitionStream:
        return NonKeyedPartitionStream(stream._df.filter(predicate))

    @staticmethod
    def reduce(stream: KeyedPartitionStream,
               *aggs: Column) -> NonKeyedPartitionStream:
        return NonKeyedPartitionStream(
            stream._df.groupBy(*stream._keys).agg(*aggs)
        )


class ExecutionEnvironment:
    """reference ExecutionEnvironment.java (getInstance / fromSource /
    execute)."""

    _instance: "ExecutionEnvironment | None" = None

    def __init__(self, spark: SparkSession):
        from flink_spark.session import prepare_session

        self.spark = prepare_session(spark)

    @classmethod
    def get_instance(cls, spark: SparkSession) -> "ExecutionEnvironment":
        if cls._instance is None or cls._instance.spark is not spark:
            cls._instance = cls(spark)
        return cls._instance

    def from_source(self, source, name: str | None = None
                    ) -> NonKeyedPartitionStream:
        """fromSource: adopt a DataFrame (batch or streaming) or a
        (rows, schema) pair."""
        if isinstance(source, DataFrame):
            return NonKeyedPartitionStream(source)
        rows, schema = source
        return NonKeyedPartitionStream(
            self.spark.createDataFrame(rows, schema)
        )

    def execute(self, job_name: str = "flink_spark-ds2") -> None:
        """V2 execute(): terminal stream methods materialize eagerly in
        the Spark rendering; execute is retained for source parity."""
        return None
