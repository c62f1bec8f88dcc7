"""User-defined function surface (SURVEY §2.14) — the Flink UDF class
contracts re-expressed over Spark's Python execution paths:

| Flink contract (reference file)                      | Spark execution    |
|------------------------------------------------------|--------------------|
| ScalarFunction (functions/ScalarFunction.java)       | pandas_udf (Arrow) |
| TableFunction (functions/TableFunction.java)         | mapInPandas lateral|
| AggregateFunction (AggregateFunction.java:39-68)     | applyInPandas      |
| TableAggregateFunction (TableAggregateFunction.java) | applyInPandas      |
| ProcessTableFunction (ProcessTableFunction.java)     | applyInPandasWithState |

Lifecycle: Flink calls ``open``/``close`` once per task; here ``open`` runs
once per Arrow-batch mapper instantiation on the executor (same placement,
finer granularity). ``eval`` is per-row by contract; subclasses can
override ``eval_batch`` (pandas Series in/out) to stay vectorized — the
10-100× fast path — and the per-row default is the compatibility path.

Aggregates follow Flink's accumulator contract exactly
(AggregateFunction.java:39-68): create_accumulator / accumulate /
[retract] / [merge] / get_value. ``apply_aggregate`` runs groups whole
(one shuffle, accumulate-only); ``apply_aggregate_two_phase`` exercises
``merge`` the way Flink's local/global split does — partial accumulators
per input partition, merged after a partials-only shuffle (the 100 TB
shape: shuffle |partitions × groups| accumulators, not |rows|).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


class ScalarFunction:
    """eval(*scalars) -> scalar. Set ``result_type`` (DDL string)."""

    result_type: str = "string"

    def open(self) -> None:  # reference FunctionContext-style hook
        pass

    def eval(self, *args) -> Any:
        raise NotImplementedError

    def eval_batch(self, *cols: pd.Series) -> pd.Series:
        """Vectorized override point; default loops ``eval`` per row."""
        return pd.Series(
            [self.eval(*vals) for vals in zip(*cols)],
            index=cols[0].index if cols else None,
        )


def scalar_udf(fn: ScalarFunction):
    """ScalarFunction → a column-producing callable (Arrow pandas UDF)."""
    opened = {"done": False}

    @pandas_udf(fn.result_type)
    def u(*cols: pd.Series) -> pd.Series:
        if not opened["done"]:
            fn.open()
            opened["done"] = True
        return fn.eval_batch(*cols)

    return u


class TableFunction:
    """eval(*scalars) -> iterable of row tuples (0..n rows per input row).

    ``result_schema``: DDL of the emitted columns.
    """

    result_schema: str = "out string"

    def open(self) -> None:
        pass

    def eval(self, *args) -> Iterator[tuple]:
        raise NotImplementedError


def lateral(
    df: DataFrame,
    fn: TableFunction,
    arg_cols: list[str],
    outer: bool = False,
) -> DataFrame:
    """CROSS/LEFT JOIN LATERAL TABLE(fn(args)) (reference
    StreamExecCorrelate.java:53 / BatchExecCorrelate.java:50): every input
    row is paired with each row the function emits; ``outer`` keeps
    unmatched input rows with NULL function columns."""
    from pyspark.sql.types import _parse_datatype_string

    out_fields = _parse_datatype_string(f"struct<{fn.result_schema}>").names

    def mapper(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fn.open()
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                emitted = list(fn.eval(*[getattr(r, c) for c in arg_cols]))
                if not emitted and outer:
                    emitted = [tuple([None] * len(out_fields))]
                for e in emitted:
                    rows.append(tuple(r) + tuple(e))
            yield pd.DataFrame(rows, columns=list(pdf.columns) + out_fields)

    out_schema = df.schema.simpleString()[7:-1] + "," + fn.result_schema
    return df.mapInPandas(mapper, schema=out_schema)


class AggregateFunction:
    """Flink accumulator contract (AggregateFunction.java:39-68)."""

    result_type: str = "double"

    def create_accumulator(self) -> Any:
        raise NotImplementedError

    def accumulate(self, acc: Any, *args) -> Any:
        raise NotImplementedError

    def retract(self, acc: Any, *args) -> Any:  # optional (changelog inputs)
        raise NotImplementedError

    def merge(self, acc: Any, other: Any) -> Any:  # optional (two-phase)
        raise NotImplementedError

    def get_value(self, acc: Any) -> Any:
        raise NotImplementedError


def apply_aggregate(
    df: DataFrame,
    fn: AggregateFunction,
    group_cols: list[str],
    arg_cols: list[str],
    out_col: str = "agg_value",
) -> DataFrame:
    """One-phase UDAF: shuffle rows to their group, run the accumulator."""

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = fn.create_accumulator()
        for r in pdf[arg_cols].itertuples(index=False):
            acc = fn.accumulate(acc, *r)
        keys = {c: [pdf[c].iloc[0]] for c in group_cols}
        return pd.DataFrame({**keys, out_col: [fn.get_value(acc)]})

    gtypes = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in group_cols
    )
    return df.groupBy(*group_cols).applyInPandas(
        agg, f"{gtypes}, {out_col} {fn.result_type}"
    )


def apply_aggregate_two_phase(
    df: DataFrame,
    fn: AggregateFunction,
    group_cols: list[str],
    arg_cols: list[str],
    out_col: str = "agg_value",
    acc_schema: str = "acc binary",
) -> DataFrame:
    """Local/global UDAF (reference TwoStageOptimizedAggregateRule):
    map-side partial accumulators (pickled), shuffle only the partials,
    ``merge`` + ``get_value`` per group."""
    import pickle

    gtypes = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in group_cols
    )

    def local(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            out = []
            # dropna=False: SQL GROUP BY keeps NULL keys as a group;
            # pandas' default would silently drop them and diverge from
            # the one-phase apply_aggregate path.
            for key, sub in pdf.groupby(group_cols, sort=False, dropna=False):
                key = key if isinstance(key, tuple) else (key,)
                acc = fn.create_accumulator()
                for r in sub[arg_cols].itertuples(index=False):
                    acc = fn.accumulate(acc, *r)
                out.append((*key, pickle.dumps(acc)))
            yield pd.DataFrame(out, columns=[*group_cols, "acc"])

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        import pickle as _p

        accs = [_p.loads(b) for b in pdf["acc"]]
        acc = accs[0]
        for other in accs[1:]:
            acc = fn.merge(acc, other)
        keys = {c: [pdf[c].iloc[0]] for c in group_cols}
        return pd.DataFrame({**keys, out_col: [fn.get_value(acc)]})

    partials = df.select(*group_cols, *arg_cols).mapInPandas(
        local, f"{gtypes}, acc binary"
    )
    return partials.groupBy(*group_cols).applyInPandas(
        merge, f"{gtypes}, {out_col} {fn.result_type}"
    )


class TableAggregateFunction(AggregateFunction):
    """Aggregate emitting 0..n rows per group (emit_value instead of
    get_value; reference TableAggregateFunction.java)."""

    result_schema: str = "out string"

    def emit_value(self, acc: Any) -> Iterator[tuple]:
        raise NotImplementedError


def apply_table_aggregate(
    df: DataFrame,
    fn: TableAggregateFunction,
    group_cols: list[str],
    arg_cols: list[str],
) -> DataFrame:
    from pyspark.sql.types import _parse_datatype_string

    out_fields = _parse_datatype_string(f"struct<{fn.result_schema}>").names

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = fn.create_accumulator()
        for r in pdf[arg_cols].itertuples(index=False):
            acc = fn.accumulate(acc, *r)
        keyvals = tuple(pdf[c].iloc[0] for c in group_cols)
        rows = [keyvals + tuple(e) for e in fn.emit_value(acc)]
        return pd.DataFrame(rows, columns=[*group_cols, *out_fields])

    gtypes = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in group_cols
    )
    return df.groupBy(*group_cols).applyInPandas(
        agg, f"{gtypes}, {fn.result_schema}"
    )


class ProcessTableFunction:
    """User stateful table-in/table-out function (reference
    ProcessTableFunction.java; exec StreamExecProcessTableFunction, runner
    ProcessTableRunnerGenerator.scala): per-key invocation with persistent
    state across micro-batches — the most general user hook.

    Contract: ``process(key, rows, state)`` receives the key tuple, the
    key's rows for this batch as a pandas DataFrame (ordered by
    ``seq_cols``), and a mutable dict persisted between batches; it returns
    a DataFrame of emitted rows (``result_schema``).
    """

    result_schema: str = "out string"
    # state is pickled into one binary state-store row per key (RocksDB
    # provider in production) — same placement as Flink keyed state.

    def open(self) -> None:
        pass

    def process(self, key: tuple, rows: pd.DataFrame, state: dict) -> pd.DataFrame:
        raise NotImplementedError


def apply_ptf(
    stream: DataFrame,
    fn: ProcessTableFunction,
    key_cols: list[str],
    seq_cols: list[str] | None = None,
) -> DataFrame:
    """Run a ProcessTableFunction over a keyed stream
    (``applyInPandasWithState`` — Arrow batches, keyed state, append mode).
    Works on bounded streams too (AvailableNow drain)."""
    import pickle

    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (
        BinaryType,
        StructField,
        StructType,
        _parse_datatype_string,
    )

    out_schema = _parse_datatype_string(f"struct<{fn.result_schema}>")
    out_schema = StructType(out_schema.fields)
    state_schema = StructType([StructField("blob", BinaryType(), True)])

    def runner(key, pdfs, state):
        fn.open()
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if seq_cols:
            pdf = pdf.sort_values(seq_cols, kind="mergesort")
        st = pickle.loads(state.get[0]) if state.exists else {}
        out = fn.process(key, pdf, st)
        state.update((pickle.dumps(st),))
        if out is not None and len(out):
            yield out

    return stream.groupBy(*key_cols).applyInPandasWithState(
        runner, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def register_udtf(spark, name: str, fn: "TableFunction"):
    """Register a TableFunction as a NATIVE Spark Python UDTF (Spark 3.5+
    ``spark.udtf``), usable directly in SQL:
    ``SELECT t.* FROM src, LATERAL fn(src.col) t`` — the 1:1 surface of
    Flink's ``CREATE TEMPORARY FUNCTION`` + ``LATERAL TABLE`` correlate
    (reference TableFunction.java, StreamExecCorrelate.java:53). The
    ``lateral()`` helper remains the Arrow-batched mapInPandas path; this
    is the SQL-registration path."""
    from pyspark.sql.functions import udtf

    table_fn = fn  # close over the instance

    class _Adapter:
        def eval(self, *args):
            for row in table_fn.eval(*args):
                yield row if isinstance(row, tuple) else (row,)

    shaped = udtf(_Adapter, returnType=fn.result_schema)
    spark.udtf.register(name, shaped)
    return shaped


def apply_ptf_batch(
    df: "DataFrame",
    fn: ProcessTableFunction,
    key_cols: list[str],
    seq_cols: list[str] | None = None,
) -> "DataFrame":
    """Bounded-table execution of a ProcessTableFunction — the path the
    SQL spelling ``SELECT * FROM MyPtf(TABLE t PARTITION BY k ...)`` runs
    on a batch relation (reference ProcessTableFunction works in batch
    mode too: one virtual micro-batch per key, state scoped to it).

    ``applyInPandas`` per key: the key's rows arrive as ONE pandas frame
    ordered by ``seq_cols``, ``process`` runs with a fresh state dict —
    identical semantics to the streaming path draining a single batch."""
    from pyspark.sql.types import StructType, _parse_datatype_string

    out_schema = StructType(
        _parse_datatype_string(f"struct<{fn.result_schema}>").fields
    )

    def runner(key, pdf: pd.DataFrame) -> pd.DataFrame:
        fn.open()
        if seq_cols:
            pdf = pdf.sort_values(seq_cols, kind="mergesort")
        return fn.process(tuple(key), pdf, {})

    return df.groupBy(*key_cols).applyInPandas(runner, schema=out_schema)
