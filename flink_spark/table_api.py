"""Table API: the reference's fluent, no-SQL-parse entry point
(`table.groupBy(...).select(...)`; reference
flink-table/flink-table-api-java/src/main/java/org/apache/flink/table/api/Table.java:239
`groupBy`, `Expressions.java` `$()`/`lit()`, window classes `Tumble.java` /
`Slide.java` / `Session.java`, GroupWindowedTable/WindowGroupedTable).

SURVEY §3.2: in Flink these calls build QueryOperation trees that join the
same planner path as SQL. On Spark the DataFrame API *is* that layer, so
this shim is deliberately thin: every fluent call delegates straight to
DataFrame operators (Catalyst sees exactly what a hand-written DataFrame
program would produce — nothing interpreted, nothing staged), and
expressions are pyspark Columns (``col``/``lit`` re-exported). What it
adds is the reference's *surface*: pyflink-style names (``group_by``,
``add_columns``, ``union_all``, ``fetch``), the Tumble/Slide/Session
window builders with ``w.start``/``w.end`` properties in the windowed
select, and ``execute()`` → a TableResult.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

col = F.col
lit = F.lit


def _cols(exprs) -> list[Column]:
    return [F.col(e) if isinstance(e, str) else e for e in exprs]


class TableResult:
    """Result handle (reference TableResult.java): collect/print."""

    def __init__(self, df: DataFrame):
        self._df = df

    def collect(self):
        return self._df.collect()

    def print(self) -> None:  # noqa: A003 - reference API name
        self._df.show(truncate=False)

    def to_pandas(self):
        return self._df.toPandas()


class Table:
    """Fluent relational handle over a DataFrame (reference Table.java)."""

    def __init__(self, df: DataFrame):
        self._df = df

    # -- projection / filter ----------------------------------------------

    def select(self, *exprs) -> "Table":
        return Table(self._df.select(*_cols(exprs)))

    def where(self, predicate) -> "Table":
        return Table(self._df.filter(predicate))

    filter = where  # reference exposes both

    def add_columns(self, *exprs) -> "Table":
        return Table(self._df.select("*", *_cols(exprs)))

    def add_or_replace_columns(self, *exprs) -> "Table":
        out = self._df
        for e in _cols(exprs):
            # Column alias name via the expression's own name
            name = e._jc.toString().split(" AS ")[-1].strip("`")
            out = out.withColumn(name, e)
        return Table(out)

    def rename_columns(self, *pairs) -> "Table":
        """rename_columns(col('a').alias('b'), ...)"""
        out = self._df
        for e in pairs:
            s = e._jc.toString()
            src, dst = [p.strip("`' ") for p in s.split(" AS ")]
            out = out.withColumnRenamed(src, dst)
        return Table(out)

    def drop_columns(self, *names) -> "Table":
        return Table(self._df.drop(*[
            n if isinstance(n, str) else n._jc.toString().strip("`")
            for n in names
        ]))

    def alias(self, name: str) -> "Table":
        return Table(self._df.alias(name))

    # -- aggregation -------------------------------------------------------

    def group_by(self, *keys) -> "GroupedTable":
        return GroupedTable(self._df, _cols(keys))

    def window(self, w: "GroupWindow") -> "GroupWindowedTable":
        return GroupWindowedTable(self._df, w)

    # -- set ops / joins ---------------------------------------------------

    def union(self, other: "Table") -> "Table":
        return Table(self._df.unionByName(other._df).distinct())

    def union_all(self, other: "Table") -> "Table":
        return Table(self._df.unionByName(other._df))

    def minus(self, other: "Table") -> "Table":
        # EXCEPT DISTINCT: any left row present in `other` at all is removed
        # (exceptAll().distinct() would keep rows whose left multiplicity
        # merely exceeds the right's — wrong for minus semantics).
        return Table(self._df.subtract(other._df))

    def minus_all(self, other: "Table") -> "Table":
        return Table(self._df.exceptAll(other._df))

    def intersect(self, other: "Table") -> "Table":
        return Table(self._df.intersect(other._df))

    def intersect_all(self, other: "Table") -> "Table":
        return Table(self._df.intersectAll(other._df))

    def join(self, other: "Table", predicate=None) -> "Table":
        return Table(self._df.join(other._df, predicate))

    def left_outer_join(self, other: "Table", predicate=None) -> "Table":
        return Table(self._df.join(other._df, predicate, "left"))

    def right_outer_join(self, other: "Table", predicate=None) -> "Table":
        return Table(self._df.join(other._df, predicate, "right"))

    def full_outer_join(self, other: "Table", predicate=None) -> "Table":
        return Table(self._df.join(other._df, predicate, "full"))

    # -- ordering / slicing ------------------------------------------------

    def order_by(self, *exprs) -> "Table":
        return Table(self._df.orderBy(*_cols(exprs)))

    def offset(self, n: int) -> "Table":
        return Table(self._df.offset(n))

    def fetch(self, n: int) -> "Table":
        return Table(self._df.limit(n))

    limit = fetch

    def distinct(self) -> "Table":
        return Table(self._df.distinct())

    # -- termination -------------------------------------------------------

    def execute(self) -> TableResult:
        return TableResult(self._df)

    def to_data_frame(self) -> DataFrame:
        """Escape hatch to the underlying DataFrame (the reference's
        toDataStream analog)."""
        return self._df


def _out_name(e: Column) -> str:
    s = e._jc.toString()
    return (s.split(" AS ")[-1] if " AS " in s else s).strip("`")


class GroupedTable:
    def __init__(self, df: DataFrame, keys: list[Column]):
        self._df, self._keys = df, keys

    def select(self, *exprs) -> Table:
        """select() lists exactly the output columns — key references
        pass through, everything else aggregates (the reference contract
        for groupBy().select())."""
        keys_s = {k._jc.toString() for k in self._keys}
        aggs = [e for e in _cols(exprs) if e._jc.toString() not in keys_s]
        out = self._df.groupBy(*self._keys).agg(*aggs)
        return Table(out.select(*[_out_name(e) for e in _cols(exprs)]))


class GroupWindow:
    """Tumble/Slide/Session builder state (reference Tumble.java etc.)."""

    def __init__(self, kind: str, size: str | None = None,
                 slide: str | None = None, gap: str | None = None):
        self.kind, self.size, self.slide, self.gap = kind, size, slide, gap
        self.time_col: Column | None = None
        self.name: str | None = None

    def on(self, time_col) -> "GroupWindow":
        self.time_col = time_col if isinstance(time_col, Column) else F.col(time_col)
        return self

    def alias(self, name: str) -> "GroupWindow":
        self.name = name
        return self

    def spark_window(self) -> Column:
        if self.time_col is None or self.name is None:
            raise ValueError("window requires .on(time_col).alias(name)")
        if self.kind == "tumble":
            return F.window(self.time_col, self.size)
        if self.kind == "slide":
            return F.window(self.time_col, self.size, self.slide)
        return F.session_window(self.time_col, self.gap)


class Tumble:
    @staticmethod
    def over(size: str) -> GroupWindow:
        return GroupWindow("tumble", size=size)


class Slide:
    @staticmethod
    def over(size: str) -> "Slide._Partial":
        return Slide._Partial(size)

    class _Partial:
        def __init__(self, size: str):
            self._size = size

        def every(self, slide: str) -> GroupWindow:
            return GroupWindow("slide", size=self._size, slide=slide)


class Session:
    @staticmethod
    def with_gap(gap: str) -> GroupWindow:
        return GroupWindow("session", gap=gap)


class WindowRef:
    """`w.start` / `w.end` inside a windowed select (reference
    window property resolution in windowProperties)."""

    def __init__(self, name: str):
        self._name = name

    @property
    def start(self) -> Column:
        return F.col("__w.start")

    @property
    def end(self) -> Column:
        return F.col("__w.end")


class GroupWindowedTable:
    def __init__(self, df: DataFrame, w: GroupWindow):
        self._df, self._w = df, w

    def group_by(self, *keys) -> "WindowGroupedTable":
        """Keys must include the window ref name (a string matching the
        window's alias) — reference contract."""
        names = [k for k in keys if isinstance(k, str)]
        if self._w.name not in names:
            raise ValueError(
                f"group_by must include the window alias {self._w.name!r}"
            )
        other = _cols([k for k in keys if not isinstance(k, str) or
                       k != self._w.name])
        return WindowGroupedTable(self._df, self._w, other)


class WindowGroupedTable:
    def __init__(self, df: DataFrame, w: GroupWindow, keys: list):
        self._df, self._w, self._keys = df, w, keys

    def select(self, *exprs) -> Table:
        win = self._w.spark_window().alias("__w")
        agg = self._df.groupBy(win, *self._keys)
        return Table(agg.agg(*_cols(exprs)))

    def window_ref(self) -> WindowRef:
        return WindowRef(self._w.name)


def from_data_frame(df: DataFrame) -> Table:
    return Table(df)
