"""Differential expression fuzz: random compositions of scalar builtins
evaluated by BOTH Spark and DuckDB over one generated table, compared
exactly. Every oracle gate in the repo rests on the assumption that the
builtins used by the oracles agree between the engines — the per-family
suites prove the blocks one at a time; this fuzzer proves their
*compositions* (nesting, NULL propagation through 3 levels, mixed
string/int flows).

The grammar is restricted to the cross-engine-total fragment:
  - ``||`` (not concat(): DuckDB's concat skips NULLs, Spark's doesn't);
  - values bounded so integer arithmetic never leaves int64 (DuckDB
    promotes to HUGEINT on overflow, Spark wraps);
  - substr/left/lpad lengths kept >= 0 (DuckDB's negative left() means
    "all but last k");
  - ascii-only strings (collation/unicode differences out of scope).

Derandomized so the suite is deterministic in CI."""

from __future__ import annotations

import pytest

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis unavailable", allow_module_level=True)

import duckdb
import pandas as pd

# the shared test relation: ints (negatives, zero, NULL), short ascii
# strings (empty, spaces, quotes-free), NULLs
ROWS = [
    (0, 1, "", "a"),
    (-7, 3, "abc", "xyz"),
    (42, -42, "hello world", " pad "),
    (100, 100, "AbC", "abc"),
    (None, 5, None, "q"),
    (9, None, "s", None),
    (None, None, None, None),
    (-100, 99, "0123456789", "t t"),
]
SCHEMA_SPARK = "i long, j long, s string, t string"


def _int_exprs(depth: int):
    base = st.sampled_from(["i", "j", "-3", "0", "7"])
    if depth == 0:
        return base
    sub = _int_exprs(depth - 1)
    return st.one_of(
        base,
        st.tuples(sub, sub).map(lambda a: f"({a[0]} + {a[1]})"),
        st.tuples(sub, sub).map(lambda a: f"({a[0]} * {a[1]})"),
        sub.map(lambda e: f"ABS({e})"),
        st.tuples(sub, sub).map(lambda a: f"COALESCE({a[0]}, {a[1]})"),
        st.tuples(sub, sub).map(lambda a: f"NULLIF({a[0]}, {a[1]})"),
        _str_exprs(depth - 1).map(lambda e: f"LENGTH({e})"),
    )


def _str_exprs(depth: int):
    base = st.sampled_from(["s", "t", "'k'", "''", "'Z z'"])
    if depth == 0:
        return base
    sub = _str_exprs(depth - 1)
    isub = _int_exprs(0)
    return st.one_of(
        base,
        st.tuples(sub, sub).map(lambda a: f"({a[0]} || {a[1]})"),
        sub.map(lambda e: f"UPPER({e})"),
        sub.map(lambda e: f"LOWER({e})"),
        sub.map(lambda e: f"TRIM({e})"),
        sub.map(lambda e: f"REVERSE({e})"),
        sub.map(lambda e: f"MD5({e})"),
        st.tuples(sub, st.integers(1, 6)).map(
            lambda a: f"SUBSTR({a[0]}, {a[1]}, 3)"
        ),
        st.tuples(sub, st.integers(0, 8)).map(
            lambda a: f"LEFT({a[0]}, {a[1]})"
        ),
        st.tuples(sub, st.integers(0, 8)).map(
            lambda a: f"LPAD({a[0]}, {a[1]}, '_')"
        ),
        st.tuples(sub, st.integers(0, 4)).map(
            lambda a: f"REPEAT({a[0]}, {a[1]})"
        ),
        st.tuples(isub, isub, sub, sub).map(
            lambda a: f"(CASE WHEN {a[0]} > {a[1]} THEN {a[2]} "
                      f"ELSE {a[3]} END)"
        ),
        st.tuples(sub, sub).map(lambda a: f"COALESCE({a[0]}, {a[1]})"),
    )


_exprs = st.one_of(
    _int_exprs(3),
    _str_exprs(3),
    _int_exprs(3).map(lambda e: f"CAST({e} AS STRING)"),
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    pdf = pd.DataFrame(ROWS, columns=["i", "j", "s", "t"])
    pdf["i"] = pdf["i"].astype("Int64")
    pdf["j"] = pdf["j"].astype("Int64")
    con.register("pdf", pdf)
    con.execute(
        "CREATE TABLE r AS SELECT i::BIGINT AS i, j::BIGINT AS j, "
        "s::VARCHAR AS s, t::VARCHAR AS t FROM pdf"
    )
    return con


@pytest.fixture(scope="module")
def spark_rel(spark):
    df = spark.createDataFrame(ROWS, SCHEMA_SPARK)
    df.createOrReplaceTempView("diff_r")
    return df


@given(st.lists(_exprs, min_size=8, max_size=16))
@settings(max_examples=25, deadline=None, derandomize=True)
def test_expression_compositions_agree(spark, duck, spark_rel, exprs):
    # DuckDB CAST AS STRING -> VARCHAR
    d_exprs = [e.replace("AS STRING", "AS VARCHAR") for e in exprs]
    sel_s = ", ".join(
        f"CAST({e} AS STRING) AS c{i}" for i, e in enumerate(exprs)
    )
    sel_d = ", ".join(
        f"CAST({e} AS VARCHAR) AS c{i}" for i, e in enumerate(d_exprs)
    )
    got = [
        tuple(r)
        for r in spark.sql(
            f"SELECT {sel_s} FROM diff_r ORDER BY COALESCE(i, -999), "
            f"COALESCE(j, -999)"
        ).collect()
    ]
    exp = duck.execute(
        f"SELECT {sel_d} FROM r ORDER BY COALESCE(i, -999), "
        f"COALESCE(j, -999)"
    ).fetchall()
    assert got == exp, "\n".join(
        f"{e}: spark={g!r} duck={x!r}"
        for row_g, row_x in zip(got, exp)
        for e, g, x in zip(exprs, row_g, row_x)
        if g != x
    )
