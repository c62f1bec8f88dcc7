"""UDF surface tests (SURVEY §2.14): the Flink contract classes executed
through their Spark paths, value-checked against native-Spark equivalents
(and through SQL registration via TableEnvironment)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from flink_spark.functions.udf import (
    AggregateFunction,
    ScalarFunction,
    TableAggregateFunction,
    TableFunction,
    apply_aggregate,
    apply_aggregate_two_phase,
    apply_table_aggregate,
    lateral,
    scalar_udf,
)
from flink_spark.sources.tables import load_table


# UDF classes are built inside factories: locally-defined classes are
# cloudpickled BY VALUE, so executors don't need this test module on their
# PYTHONPATH (module-level classes would pickle by reference and fail).


def make_hash_len(vectorized=False):
    class HashLen(ScalarFunction):
        result_type = "bigint"

        def eval(self, s):
            return len(s) if s is not None else None

    class VecHashLen(HashLen):
        def eval_batch(self, col: pd.Series) -> pd.Series:
            return col.str.len().astype("int64")

    return VecHashLen() if vectorized else HashLen()


def make_split_words():
    class SplitWords(TableFunction):
        result_schema = "word string, pos int"

        def eval(self, text):
            for i, w in enumerate(text.split()):
                yield (w, i)

    return SplitWords()


def make_weighted_avg():
    class WeightedAvg(AggregateFunction):
        """The reference docs' canonical UDAF (AggregateFunction.java:39-68)."""

        result_type = "double"

        def create_accumulator(self):
            return (0.0, 0)

        def accumulate(self, acc, value, weight):
            return (acc[0] + value * weight, acc[1] + weight)

        def retract(self, acc, value, weight):
            return (acc[0] - value * weight, acc[1] - weight)

        def merge(self, acc, other):
            return (acc[0] + other[0], acc[1] + other[1])

        def get_value(self, acc):
            return acc[0] / acc[1] if acc[1] else None

    return WeightedAvg()


def make_top2():
    class Top2(TableAggregateFunction):
        result_schema = "val double, rank_no int"

        def create_accumulator(self):
            return []

        def accumulate(self, acc, v):
            acc = sorted(acc + [v], reverse=True)[:2]
            return acc

        def emit_value(self, acc):
            for i, v in enumerate(acc):
                yield (v, i + 1)

    return Top2()


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 50)
        .select("doc_id", "text", "lang")
        .cache()
    )


def test_scalar_udf_per_row_and_vectorized(spark, docs):
    expected = docs.select("doc_id", F.length("text").alias("n")).collect()
    for fn in (make_hash_len(), make_hash_len(vectorized=True)):
        got = docs.select("doc_id", scalar_udf(fn)("text").alias("n")).collect()
        assert sorted(got) == sorted(expected)


def test_scalar_udf_sql_registration(spark, docs):
    from flink_spark.catalog import TableEnvironment

    env = TableEnvironment(spark)
    env.create_temporary_function("hash_len", make_hash_len())
    docs.createOrReplaceTempView("udf_docs")
    got = spark.sql(
        "SELECT doc_id, hash_len(text) AS n FROM udf_docs"
    ).collect()
    expected = docs.select("doc_id", F.length("text").alias("n")).collect()
    assert sorted(got) == sorted(expected)


def test_table_function_lateral(spark, docs):
    got = lateral(docs.select("doc_id", "text"), make_split_words(), ["text"])
    expected = docs.select(
        "doc_id",
        "text",
        F.posexplode(F.split("text", " ")).alias("pos", "word"),
    ).select("doc_id", "text", "word", "pos")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, expected.collect())
    )


def test_table_function_outer(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "")], "id int, t string")

    class NonEmpty(TableFunction):
        result_schema = "w string"

        def eval(self, t):
            yield from ((w,) for w in t.split())

    rows = sorted(map(tuple, lateral(df, NonEmpty(), ["t"], outer=True).collect()))
    assert rows == [(1, "a b", "a"), (1, "a b", "b"), (2, "", None)]


def test_aggregate_function_both_phases(spark, sf_dir):
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") <= 30)
        .select("user_id", "value", F.lit(2).alias("w"))
        .na.drop(subset=["value"])
    )
    expected = {
        r["user_id"]: r["wavg"]
        for r in ev.groupBy("user_id")
        .agg((F.sum(F.col("value") * 2) / F.sum("w")).alias("wavg"))
        .collect()
    }
    for applier in (apply_aggregate, apply_aggregate_two_phase):
        got = {
            r["user_id"]: r["agg_value"]
            for r in applier(
                ev, make_weighted_avg(), ["user_id"], ["value", "w"]
            ).collect()
        }
        assert got.keys() == expected.keys()
        for k in expected:
            assert got[k] == pytest.approx(expected[k], rel=1e-12)


def test_aggregate_retract_contract():
    fn = make_weighted_avg()
    acc = fn.create_accumulator()
    acc = fn.accumulate(acc, 10.0, 1)
    acc = fn.accumulate(acc, 20.0, 3)
    acc = fn.retract(acc, 10.0, 1)
    assert fn.get_value(acc) == pytest.approx(20.0)


def test_table_aggregate_top2(spark, sf_dir):
    su = load_table(spark, sf_dir, "supplier").select("s_nationkey", "s_acctbal")
    got = apply_table_aggregate(su, make_top2(), ["s_nationkey"], ["s_acctbal"])
    from pyspark.sql import Window

    w = Window.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"))
    expected = (
        su.withColumn("rank_no", F.row_number().over(w))
        .filter(F.col("rank_no") <= 2)
        .select("s_nationkey", F.col("s_acctbal").alias("val"), "rank_no")
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, expected.collect())
    )


def test_native_python_udtf_registration(spark):
    """TableFunction through Spark's native Python UDTF surface: SQL
    LATERAL correlate with the same emissions as the lateral() helper."""
    from flink_spark.functions.udf import TableFunction, register_udtf

    class SplitWords(TableFunction):
        result_schema = "word string, n_chars int"

        def eval(self, s):
            for w in (s or "").split():
                yield (w, len(w))

    register_udtf(spark, "split_words", SplitWords())
    spark.createDataFrame(
        [(1, "a bb ccc"), (2, ""), (3, "dd")], "id int, txt string"
    ).createOrReplaceTempView("udtf_src")
    got = spark.sql(
        "SELECT id, t.word, t.n_chars FROM udtf_src, "
        "LATERAL split_words(txt) t ORDER BY id, word"
    ).collect()
    assert [(r["id"], r["word"], r["n_chars"]) for r in got] == [
        (1, "a", 1), (1, "bb", 2), (1, "ccc", 3), (3, "dd", 2),
    ]


class RunningMaxPtf:
    """Module-level PTF for the SQL registration test (CREATE FUNCTION
    resolves dotted paths, so the class must be importable)."""


def _make_running_max():
    from flink_spark.functions.udf import ProcessTableFunction

    class _RunningMax(ProcessTableFunction):
        result_schema = "user_id bigint, event_id bigint, run_max double"

        def process(self, key, rows, state):
            import pandas as pd

            mx, out = state.get("mx"), []
            for v in rows["value"]:
                mx = v if mx is None or v > mx else mx
                out.append(mx)
            state["mx"] = mx
            return pd.DataFrame({
                "user_id": rows["user_id"].values,
                "event_id": rows["event_id"].values,
                "run_max": out,
            })

    return _RunningMax


# rebind so 'tests.test_udf.RunningMaxPtf' resolves to the PTF class
RunningMaxPtf = _make_running_max()  # noqa: F811


def test_sql_registered_ptf_invocation(spark, sf_dir):
    """CREATE FUNCTION resolving to a ProcessTableFunction + the SQL
    spelling `SELECT * FROM f(TABLE t PARTITION BY k ORDER BY s)`
    (reference ptfs.md): per-key ordered running max must equal the
    window-function equivalent."""
    import pytest
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from flink_spark.catalog import TableEnvironment
    from flink_spark.sources.tables import load_table

    env = TableEnvironment(spark)
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") <= 30
    ).select("user_id", "event_id", "value")
    ev.createOrReplaceTempView("ptf_sql_ev")
    env.execute_sql("DROP FUNCTION IF EXISTS running_max")
    env.execute_sql(
        "CREATE FUNCTION running_max AS 'tests.test_udf.RunningMaxPtf'"
    )
    got = env.execute_sql(
        "SELECT user_id, event_id, run_max FROM running_max("
        "input => TABLE ptf_sql_ev PARTITION BY user_id ORDER BY event_id)"
    )
    w = Window.partitionBy("user_id").orderBy("event_id")
    want = ev.select(
        "user_id", "event_id", F.max("value").over(w).alias("run_max")
    )
    g = sorted(map(tuple, got.collect()))
    e = sorted(map(tuple, want.collect()))
    assert g == e and len(g) > 0
    # error paths: PARTITION BY required; table argument required
    with pytest.raises(ValueError, match="PARTITION BY is required"):
        env.execute_sql("SELECT * FROM running_max(TABLE ptf_sql_ev)")
    with pytest.raises(ValueError, match="first argument must be"):
        env.execute_sql("SELECT * FROM running_max(42)")
    # DROP removes the PTF registration
    env.execute_sql("DROP FUNCTION running_max")
    assert "running_max" not in getattr(env, "user_ptfs", {})


class TestObjectFunctions:
    """OBJECT_OF / OBJECT_UPDATE (FLIP-520; reference
    BuiltInFunctionDefinitions.java:1846) — DataFrame functions and the
    SQL named_struct rewrite."""

    def test_dataframe_object_of_and_update(self, spark):
        from pyspark.sql import functions as F

        from flink_spark.functions.objects import object_of, object_update

        df = spark.range(3).select(
            object_of("com.example.U", "id", F.col("id"), "tag", "x").alias("o")
        )
        out = df.select("o.id", "o.tag",
                        object_update(F.col("o"), "tag", "y").alias("u"))
        rows = out.select("id", "tag", "u.tag").collect()
        assert [(r[0], r[1], r[2]) for r in rows] == [
            (0, "x", "y"), (1, "x", "y"), (2, "x", "y")]

    def test_validations(self):
        import pytest as _pytest

        from flink_spark.functions.objects import (
            object_of,
            rewrite_object_functions,
        )

        with _pytest.raises(ValueError, match="dotted Java identifier"):
            object_of("not a class", "a", 1)
        with _pytest.raises(ValueError, match="name/value pairs"):
            object_of("c.X", "a")
        with _pytest.raises(ValueError, match="distinct"):
            object_of("c.X", "a", 1, "a", 2)
        with _pytest.raises(ValueError, match="does not exist"):
            rewrite_object_functions(
                "SELECT OBJECT_UPDATE(OBJECT_OF('c.X', 'a', 1), 'z', 2)")
        with _pytest.raises(ValueError, match="resolved struct schema"):
            rewrite_object_functions("SELECT OBJECT_UPDATE(col, 'a', 1)")

    def test_sql_surface(self, spark):
        from flink_spark.catalog import TableEnvironment

        env = TableEnvironment(spark)
        row = env.execute_sql(
            "SELECT OBJECT_OF('com.example.P', 'x', 1, 'y', 'two') AS p, "
            "OBJECT_UPDATE(OBJECT_OF('com.example.P', 'x', 1, 'y', 'two'), "
            "'x', 10).x AS ux"
        ).collect()[0]
        assert row["p"].asDict() == {"x": 1, "y": "two"}
        assert row["ux"] == 10


class TestJsonConstruct:
    """JSON_OBJECT/JSON_ARRAY/JSON_QUERY/JSON_UNQUOTE/JSON_QUOTE JVM
    expressions (flink_spark/functions/jsonfn.py; reference
    SqlJsonUtils.java)."""

    def test_escaping_and_null_policies(self, spark):
        from pyspark.sql import functions as F

        from flink_spark.functions import jsonfn as J

        df = spark.createDataFrame([('a"b\n',)], "s string")
        row = df.select(
            J.json_quote(F.col("s")).alias("q"),
            J.json_unquote(J.json_quote(F.col("s"))).alias("rt"),
            J.json_object(x=F.col("s"), n=F.lit(None).cast("int")).alias("o"),
            J.json_array(F.lit(1), F.lit(None).cast("int"),
                         F.col("s")).alias("a"),
            J.json_array(F.lit(None).cast("int"),
                         absent_on_null=False).alias("an"),
            J.json_unquote(F.lit("not json")).alias("passthru"),
            J.json_query(F.lit('{"a":{"b":1},"s":2}'), "$.a").alias("frag"),
            J.json_query(F.lit('{"s":2}'), "$.s").alias("scalar"),
        ).collect()[0]
        assert row["q"] == '"a\\"b\\n"'
        assert row["rt"] == 'a"b\n'          # quote∘unquote is identity
        assert row["o"] == '{"x":"a\\"b\\n","n":null}'
        assert row["a"] == '[1,"a\\"b\\n"]'  # null element absent
        assert row["an"] == "[null]"         # NULL ON NULL keeps it
        assert row["passthru"] == "not json"
        assert row["frag"] == '{"b":1}'
        assert row["scalar"] is None         # scalars are JSON_VALUE's job
