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

# Exhaustive tier (VERDICT r12 #2 / r13 durations trim): this whole module is
# an exhaustive re-run sweep; it runs under --runslow / SPARK_GRAFT_RUNSLOW=1.
pytestmark = pytest.mark.slow


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


# --- date/time fragment ------------------------------------------------------
#
# Cross-engine-total subset, probed empirically; excluded with reasons:
#   EXTRACT(DOW)      — Spark 1-based (Sunday=1), DuckDB 0-based
#   EXTRACT(EPOCH)    — unsupported by Spark's EXTRACT
#   DATEDIFF          — different signatures (Spark 2-arg, DuckDB 3-arg)
#   date + INTERVAL / DATE_TRUNC('month'...) — type drift (DuckDB
#     promotes to TIMESTAMP / demotes to DATE) — normalized by an
#     explicit CAST AS DATE at generation

ROWS_DT = [
    (0, "DATE '2024-02-29'", "TIMESTAMP '2023-12-31 23:59:59.5'"),
]


def _date_exprs(depth: int):
    base = st.sampled_from(["d", "DATE '2000-01-01'", "DATE '1969-07-20'"])
    if depth == 0:
        return base
    sub = _date_exprs(depth - 1)
    return st.one_of(
        base,
        st.tuples(sub, st.integers(0, 40)).map(
            lambda a: f"CAST(({a[0]} + INTERVAL {a[1]} DAY) AS DATE)"
        ),
        st.tuples(sub, st.integers(0, 14)).map(
            lambda a: f"CAST(({a[0]} - INTERVAL {a[1]} MONTH) AS DATE)"
        ),
        sub.map(lambda e: f"LAST_DAY({e})"),
        st.tuples(sub, sub).map(lambda a: f"GREATEST({a[0]}, {a[1]})"),
        st.tuples(sub, sub).map(lambda a: f"LEAST({a[0]}, {a[1]})"),
        st.tuples(sub, st.integers(-5, 5)).map(
            lambda a: f"({a[0]} + {a[1]})"
        ),
    )


_date_out = st.one_of(
    _date_exprs(3),
    _date_exprs(2).map(lambda e: f"EXTRACT(YEAR FROM {e})"),
    _date_exprs(2).map(lambda e: f"EXTRACT(MONTH FROM {e})"),
    _date_exprs(2).map(lambda e: f"EXTRACT(DAY FROM {e})"),
    st.sampled_from([
        "CAST(DATE_TRUNC('month', ts) AS DATE)",
        "CAST(DATE_TRUNC('year', ts) AS DATE)",
        "DATE_TRUNC('hour', ts)",
        "CAST(ts AS DATE)",
    ]),
    st.integers(1, 5000).map(
        lambda m: f"ts + INTERVAL {m} MINUTE"
    ),
)


@pytest.fixture(scope="module")
def dt_rel(spark, duck):
    spark.sql(
        "SELECT DATE '2024-02-29' AS d, "
        "TIMESTAMP_NTZ '2023-12-31 23:59:59.5' AS ts, 1 AS n "
        "UNION ALL SELECT DATE '1969-07-20', "
        "TIMESTAMP_NTZ '2024-03-10 02:30:00', 2 "
        "UNION ALL SELECT NULL, NULL, 3"
    ).createOrReplaceTempView("diff_dt")
    duck.execute(
        "CREATE TABLE dt AS SELECT * FROM (VALUES "
        "(DATE '2024-02-29', TIMESTAMP '2023-12-31 23:59:59.5', 1), "
        "(DATE '1969-07-20', TIMESTAMP '2024-03-10 02:30:00', 2), "
        "(NULL, NULL, 3)) t(d, ts, n)"
    )
    return True


@given(st.lists(_date_out, min_size=8, max_size=14))
@settings(max_examples=20, deadline=None, derandomize=True)
def test_date_compositions_agree(spark, duck, dt_rel, exprs):
    sel_s = ", ".join(
        f"CAST({e} AS STRING) AS c{i}" for i, e in enumerate(exprs)
    )
    sel_d = ", ".join(
        f"CAST({e} AS VARCHAR) AS c{i}" for i, e in enumerate(exprs)
    )
    got = [
        tuple(r)
        for r in spark.sql(
            f"SELECT {sel_s} FROM diff_dt ORDER BY n"
        ).collect()
    ]
    exp = duck.execute(f"SELECT {sel_d} FROM dt ORDER BY n").fetchall()
    assert got == exp, "\n".join(
        f"{e}: spark={g!r} duck={x!r}"
        for row_g, row_x in zip(got, exp)
        for e, g, x in zip(exprs, row_g, row_x)
        if g != x
    )


# --- aggregation fragment -----------------------------------------------------
#
# Grouped aggregates over NULL-able keys: NULL keys group together in
# both engines; ORDER BY ... NULLS FIRST pins the (otherwise divergent)
# default NULL sort order. SUM over BIGINT returns HUGEINT in DuckDB —
# identical digits after the VARCHAR cast. AVG is excluded (double
# formatting of non-terminating quotients differs).

_KEYS = ["NULLIF(i, 42)", "LEFT(s, 1)", "(i > j)", "COALESCE(t, s)"]
_AGGS = [
    "SUM(i)", "COUNT(i)", "COUNT(*)", "MIN(s)", "MAX(t)",
    "COUNT(DISTINCT t)", "SUM(CASE WHEN i > 0 THEN j ELSE 0 END)",
    "MIN(ABS(i))", "MAX(LENGTH(s))", "SUM(LENGTH(s || t))",
]


@given(
    st.sampled_from(_KEYS),
    st.lists(st.sampled_from(_AGGS), min_size=3, max_size=7, unique=True),
)
@settings(max_examples=25, deadline=None, derandomize=True)
def test_grouped_aggregates_agree(spark, duck, spark_rel, key, aggs):
    sel_s = ", ".join(
        f"CAST({a} AS STRING) AS c{i}" for i, a in enumerate(aggs)
    )
    sel_d = ", ".join(
        f"CAST({a} AS VARCHAR) AS c{i}" for i, a in enumerate(aggs)
    )
    got = [
        tuple(r)
        for r in spark.sql(
            f"SELECT CAST({key} AS STRING) AS k, {sel_s} FROM diff_r "
            f"GROUP BY {key} ORDER BY k NULLS FIRST"
        ).collect()
    ]
    exp = duck.execute(
        f"SELECT CAST({key} AS VARCHAR) AS k, {sel_d} FROM r "
        f"GROUP BY {key} ORDER BY k NULLS FIRST"
    ).fetchall()
    assert got == exp, (key, aggs, got, exp)


# --- over-window / rank fragment (r10) ---------------------------------------
#
# Routed through TableEnvironment.sql_query so the dialect REWRITE layer
# (the layer every oracle's SQL passes through) is part of the system
# under test — VERDICT r9 #7 named the over-frame rewrites the biggest
# untouched fuzz surface (reference coverage analog:
# OverAggregateITCase). Cross-engine-total subset, probed empirically:
#   - ORDER BY inside OVER always pins NULLS FIRST/LAST explicitly
#     (Spark's ASC default is NULLS FIRST, DuckDB's is NULLS LAST);
#   - ROW_NUMBER/NTILE/LEAD/LAG and ROWS frames order by a UNIQUE key
#     (id tie-break) so peer rows never make the result order-dependent;
#     RANK/DENSE_RANK may use tied keys (tie semantics are standard);
#   - offset RANGE frames sort by the non-NULL numeric id only (NULL
#     peer semantics in offset RANGE frames are not worth pinning);
#   - AVG/PERCENT_RANK/CUME_DIST excluded (double formatting of
#     non-terminating quotients differs).

ROWS_W = [
    (1, "a", 10), (2, "a", 10), (3, "a", None), (4, "b", 7),
    (5, "b", 42), (6, None, 7), (7, None, None), (8, "b", 10),
    (9, "a", -3), (10, "b", 7),
]

_W_PARTS = ["", "PARTITION BY g", "PARTITION BY COALESCE(g, 'zz')"]
_W_ORD_UNIQ = [
    "ORDER BY id",
    "ORDER BY id DESC",
    "ORDER BY v DESC NULLS LAST, id",
    "ORDER BY v NULLS FIRST, id DESC",
]
_W_ORD_TIED = [
    "ORDER BY v NULLS FIRST",
    "ORDER BY v DESC NULLS LAST",
    "ORDER BY g NULLS LAST, v NULLS FIRST",
]
_W_ROWS_FRAMES = [
    "",
    "ROWS BETWEEN 1 PRECEDING AND CURRENT ROW",
    "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 FOLLOWING",
    "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING",
    "ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING",  # can be empty -> NULL/0
    "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING",
]
_W_RANGE_FRAMES = [
    "RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING",
    "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
    "RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING",
    "RANGE BETWEEN 3 FOLLOWING AND 5 FOLLOWING",
]
_W_AGGS = [
    "SUM(v)", "COUNT(v)", "COUNT(*)", "MIN(v)", "MAX(v)",
    "FIRST_VALUE(v)", "LAST_VALUE(v)", "SUM(ABS(v) + id)",
]

_win_expr = st.one_of(
    st.tuples(
        st.sampled_from(["RANK()", "DENSE_RANK()"]),
        st.sampled_from(_W_PARTS),
        st.sampled_from(_W_ORD_TIED),
    ).map(lambda a: f"{a[0]} OVER ({a[1]} {a[2]})"),
    st.tuples(
        st.sampled_from(
            ["ROW_NUMBER()", "NTILE(3)", "LEAD(v, 1)", "LAG(v, 2, -1)"]
        ),
        st.sampled_from(_W_PARTS),
        st.sampled_from(_W_ORD_UNIQ),
    ).map(lambda a: f"{a[0]} OVER ({a[1]} {a[2]})"),
    st.tuples(
        st.sampled_from(_W_AGGS),
        st.sampled_from(_W_PARTS),
        st.sampled_from(_W_ORD_UNIQ),
        st.sampled_from(_W_ROWS_FRAMES),
    ).map(lambda a: f"{a[0]} OVER ({a[1]} {a[2]} {a[3]})"),
    st.tuples(  # whole-partition aggregate: no ORDER BY, so only
        # order-insensitive aggs (FIRST/LAST_VALUE would be picking
        # from an undefined physical order in BOTH engines)
        st.sampled_from(
            [a for a in _W_AGGS if "VALUE" not in a]
        ),
        st.sampled_from(_W_PARTS),
    ).map(lambda a: f"{a[0]} OVER ({a[1]})"),
    st.tuples(
        st.sampled_from(_W_AGGS),
        st.sampled_from(_W_PARTS),
        st.sampled_from(_W_RANGE_FRAMES),
    ).map(lambda a: f"{a[0]} OVER ({a[1]} ORDER BY id {a[2]})"),
)


@pytest.fixture(scope="module")
def win_rel(spark, duck):
    spark.createDataFrame(
        ROWS_W, "id long, g string, v long"
    ).createOrReplaceTempView("diff_w")
    vals = ", ".join(
        "({}, {}, {})".format(
            i, "NULL" if g is None else f"'{g}'",
            "NULL" if v is None else v,
        )
        for i, g, v in ROWS_W
    )
    duck.execute(
        f"CREATE TABLE w AS SELECT * FROM (VALUES {vals}) t(id, g, v)"
    )
    return True


@pytest.fixture(scope="module")
def win_env(spark):
    from flink_spark.catalog import TableEnvironment

    return TableEnvironment(spark)


@given(st.lists(_win_expr, min_size=6, max_size=12))
@settings(max_examples=30, deadline=None, derandomize=True)
def test_over_window_compositions_agree(spark, duck, win_rel, win_env, exprs):
    sel_s = ", ".join(
        f"CAST({e} AS STRING) AS c{i}" for i, e in enumerate(exprs)
    )
    sel_d = ", ".join(
        f"CAST({e} AS VARCHAR) AS c{i}" for i, e in enumerate(exprs)
    )
    got = [
        tuple(r)
        for r in win_env.sql_query(
            f"SELECT id, {sel_s} FROM diff_w ORDER BY id"
        ).collect()
    ]
    exp = duck.execute(
        f"SELECT id, {sel_d} FROM w ORDER BY id"
    ).fetchall()
    assert got == exp, "\n".join(
        f"id={row_g[0]} {e}: spark={g!r} duck={x!r}"
        for row_g, row_x in zip(got, exp)
        for e, g, x in zip(exprs, row_g[1:], row_x[1:])
        if g != x
    )


# --- grouping-sets / rollup / cube fragment (r10) -----------------------------
#
# Executed (not just structural) differential check of the multi-set
# grouping surface, routed through TableEnvironment.sql_query so the
# dialect layer's GROUPING decompositions stay under test. GROUPING(col)
# is cross-engine-total; GROUPING_ID()/GROUP_ID() are not in DuckDB and
# keep their own exact gates (agg_group_id, agg_grouping_sets). NULL
# grouping keys and the NULLs grouping-sets *introduce* are
# disambiguated by selecting GROUPING(k) for every key, and the result
# order is pinned NULLS FIRST on every output column.

_GS_SPECS = [
    "GROUPING SETS ((g), (v), ())",
    "GROUPING SETS ((g, v), (g), ())",
    "GROUPING SETS ((g, v), (g, v))",  # duplicate set: must emit twice
    "ROLLUP (g, v)",
    "CUBE (g, v)",
    "ROLLUP (v, g)",
]
_GS_AGGS = [
    "SUM(v)", "COUNT(*)", "COUNT(v)", "MIN(id)", "MAX(v)",
    "COUNT(DISTINCT v)", "SUM(CASE WHEN v > 5 THEN 1 ELSE 0 END)",
]


@given(
    st.sampled_from(_GS_SPECS),
    st.lists(st.sampled_from(_GS_AGGS), min_size=2, max_size=5,
             unique=True),
)
@settings(max_examples=25, deadline=None, derandomize=True)
def test_grouping_sets_agree(spark, duck, win_rel, win_env, spec, aggs):
    sel_s = ", ".join(
        f"CAST({a} AS STRING) AS c{i}" for i, a in enumerate(aggs)
    )
    sel_d = ", ".join(
        f"CAST({a} AS VARCHAR) AS c{i}" for i, a in enumerate(aggs)
    )
    head = ("g, v, CAST(GROUPING(g) AS INT) AS gg, "
            "CAST(GROUPING(v) AS INT) AS gv")
    order = "ORDER BY gg, gv, g NULLS FIRST, v NULLS FIRST"
    for i in range(len(aggs)):
        order += f", c{i} NULLS FIRST"
    got = [
        tuple(r)
        for r in win_env.sql_query(
            f"SELECT {head}, {sel_s} FROM diff_w GROUP BY {spec} {order}"
        ).collect()
    ]
    exp = duck.execute(
        f"SELECT {head}, {sel_d} FROM w GROUP BY {spec} {order}"
    ).fetchall()
    assert got == exp, (spec, aggs, got[:4], exp[:4])


# --- set-operation fragment (r10) ---------------------------------------------
#
# Multiset semantics (INTERSECT ALL / EXCEPT ALL duplicate counting,
# NULL-equality in set ops) are a classic cross-engine divergence area
# and underlie the §2.9 gates (tpcds_q87/q83/q56). Chains of 2-3 set
# operators over two small relations with duplicate and NULL rows,
# executed on both engines. Spark and DuckDB share left-associative
# chaining and INTERSECT-binds-tighter precedence; parenthesization is
# still emitted explicitly so the comparison never rests on parser
# precedence.

_SO_SRCS = [
    "SELECT g, v FROM {w}",
    "SELECT g, v FROM {w} WHERE COALESCE(v, 0) <> 42",
    "SELECT COALESCE(g, 'x') AS g, v FROM {w}",
    "SELECT g, v % 5 AS v FROM {w}",
    "SELECT 'a' AS g, CAST(NULL AS BIGINT) AS v",
]
_SO_OPS = [
    "UNION", "UNION ALL", "INTERSECT", "INTERSECT ALL",
    "EXCEPT", "EXCEPT ALL",
]


@given(
    st.lists(st.sampled_from(_SO_SRCS), min_size=2, max_size=4),
    st.lists(st.sampled_from(_SO_OPS), min_size=1, max_size=3),
)
@settings(max_examples=25, deadline=None, derandomize=True)
def test_set_operations_agree(spark, duck, win_rel, win_env, srcs, ops):
    ops = ops[: len(srcs) - 1]
    srcs = srcs[: len(ops) + 1]

    def chain(w):
        q = f"({srcs[0].format(w=w)})"
        for op, s in zip(ops, srcs[1:]):
            q = f"({q} {op} ({s.format(w=w)}))"
        return q

    order = "ORDER BY g NULLS FIRST, v NULLS FIRST"
    got = [
        tuple(r)
        for r in win_env.sql_query(
            f"SELECT g, CAST(v AS STRING) AS v FROM {chain('diff_w')} {order}"
        ).collect()
    ]
    exp = duck.execute(
        f"SELECT g, CAST(v AS VARCHAR) AS v FROM {chain('w')} {order}"
    ).fetchall()
    assert got == exp, (ops, srcs, got[:6], exp[:6])


# --- join fragment (r10) -------------------------------------------------------
#
# Join semantics over NULL keys, non-equi bands, and null-safe equality
# (Spark `<=>` spelled as the standard IS NOT DISTINCT FROM on both
# sides). Uses the r and w relations (8 x 10 rows) so every join type
# exercises unmatched rows on both sides. Output order fully pinned.

_J_TYPES = ["JOIN", "LEFT JOIN", "RIGHT JOIN", "FULL JOIN"]
_J_CONDS = [
    "r.i = w.v",
    "r.j = w.v",
    "r.i IS NOT DISTINCT FROM w.v",
    "r.i = w.v AND r.j > w.id",
    "r.i < w.v",
    "r.i = w.v AND w.g = 'a'",
    "COALESCE(r.i, -1) = COALESCE(w.v, -1)",
]


@given(
    st.sampled_from(_J_TYPES),
    st.sampled_from(_J_CONDS),
    st.sampled_from(_J_TYPES),
    st.sampled_from(_J_CONDS),
)
@settings(max_examples=30, deadline=None, derandomize=True)
def test_join_fragment_agree(spark, duck, spark_rel, win_rel, win_env,
                             jt1, c1, jt2, c2):
    # two-join chain: (r jt1 w ON c1) jt2 w2 ON c2-with-w2
    c2 = c2.replace("w.", "w2.")
    sel = ("CAST(r.i AS STRING) AS a, CAST(r.j AS STRING) AS b, "
           "CAST(w.id AS STRING) AS c, CAST(w2.id AS STRING) AS d")
    order = ("ORDER BY a NULLS FIRST, b NULLS FIRST, c NULLS FIRST, "
             "d NULLS FIRST")
    got = [
        tuple(r)
        for r in win_env.sql_query(
            f"SELECT {sel} FROM diff_r r {jt1} diff_w w ON {c1} "
            f"{jt2} diff_w w2 ON {c2} {order}"
        ).collect()
    ]
    exp = duck.execute(
        f"SELECT {sel.replace('STRING', 'VARCHAR')} "
        f"FROM r {jt1} w ON {c1} {jt2} w w2 ON {c2} {order}"
    ).fetchall()
    assert got == exp, (jt1, c1, jt2, c2, len(got), len(exp))


# --- correlated / quantified subquery fragment (r10) ---------------------------
#
# EXISTS / NOT EXISTS / IN / NOT IN with NULLable keys — including the
# standard NOT-IN-with-NULLs trap (any NULL in the subquery result makes
# NOT IN never-true), which both engines implement per the standard in
# CONJUNCTIVE position and which several gated anti-join shapes rely on.
#
# History (r10): this fuzzer found on its first run that upstream
# Spark 4.1.2 loses three-valued logic for a null-capable NOT IN
# subquery under a DISJUNCTION (negated plain-equality ExistenceJoin:
# TRUE where the standard says UNKNOWN; standalone, Spark's null-aware
# anti join is correct). The deviation is pinned against plain
# spark.sql in test_known_deviation_not_in_subquery_under_or; the
# dialect layer FIXES it (catalog._rewrite_disjunctive_not_in rewrites
# the predicate into an exactly-three-valued EXISTS composite), and
# because this fuzzer routes through sql_query, the combination is
# INCLUDED below and proves the fix across generated cases.

_SQ_PREDS = [
    "EXISTS (SELECT 1 FROM diff_w w WHERE w.v = r.i)",
    "NOT EXISTS (SELECT 1 FROM diff_w w WHERE w.v = r.i)",
    "EXISTS (SELECT 1 FROM diff_w w WHERE w.v = r.i AND w.g = 'b')",
    "r.i IN (SELECT v FROM diff_w)",
    "r.i NOT IN (SELECT v FROM diff_w)",           # NULL trap
    "r.i IN (SELECT v FROM diff_w w WHERE w.v IS NOT NULL)",
    "r.i NOT IN (SELECT v FROM diff_w w WHERE w.v IS NOT NULL)",
    "r.j IN (SELECT v FROM diff_w w WHERE w.g IS NULL)",
    "EXISTS (SELECT 1 FROM diff_w w WHERE w.id > r.j)",
]


@given(
    st.lists(st.sampled_from(_SQ_PREDS), min_size=1, max_size=2,
             unique=True),
    st.sampled_from(["AND", "OR"]),
)
@settings(max_examples=25, deadline=None, derandomize=True)
def test_subquery_fragment_agree(spark, duck, spark_rel, win_rel, win_env,
                                 preds, conj):
    where = f" {conj} ".join(f"({p})" for p in preds)
    sel = "CAST(r.i AS STRING) AS a, CAST(r.j AS STRING) AS b"
    order = "ORDER BY a NULLS FIRST, b NULLS FIRST"
    got = [
        tuple(x)
        for x in win_env.sql_query(
            f"SELECT {sel} FROM diff_r r WHERE {where} {order}"
        ).collect()
    ]
    d_where = where.replace("diff_w", "w")
    exp = duck.execute(
        f"SELECT {sel.replace('STRING', 'VARCHAR')} FROM r "
        f"WHERE {d_where} {order}"
    ).fetchall()
    assert got == exp, (preds, conj, got, exp)


@given(
    st.lists(st.sampled_from(_SQ_PREDS), min_size=1, max_size=3,
             unique=True),
    st.sampled_from(["{p}", "({p}) IS NULL", "NOT ({p})",
                     "CASE WHEN {p} THEN 'y' ELSE 'n' END",
                     "coalesce({p}, FALSE)"]),
)
@settings(max_examples=25, deadline=None, derandomize=True)
def test_subquery_value_position_agree(spark, duck, spark_rel, win_rel,
                                       win_env, preds, wrap):
    """VALUE-position twin of the predicate fragment (r11): the same
    subquery predicates PROJECTED as columns — including IS-NULL tests,
    negation, CASE results, and coalesce defaults, the contexts that
    distinguish FALSE from UNKNOWN and exposed the upstream NOT IN
    value-position deviance the r11 rewrite fixes."""
    sel = ", ".join(
        f"CAST({wrap.format(p=p)} AS STRING) AS c{i}"
        for i, p in enumerate(preds)
    )
    order = "ORDER BY i NULLS FIRST, j NULLS FIRST"
    got = [
        tuple(x)
        for x in win_env.sql_query(
            f"SELECT r.i, r.j, {sel} FROM diff_r r {order}"
        ).collect()
    ]
    d_sel = sel.replace("diff_w", "w").replace("STRING", "VARCHAR")
    exp = duck.execute(
        f"SELECT r.i, r.j, {d_sel} FROM r r {order}"
    ).fetchall()
    assert got == exp, (preds, wrap, got, exp)


def test_known_deviation_not_in_subquery_under_or(spark, duck, spark_rel,
                                                  win_rel, win_env):
    """Pins the upstream Spark 4.1.2 deviation the subquery fuzzer
    found: a null-capable NOT IN subquery under OR loses three-valued
    logic (planned as a negated plain-equality ExistenceJoin), while
    the SAME predicate standalone takes the null-aware anti join and is
    standard-correct. The dialect layer FIXES the deviant position
    (catalog._rewrite_disjunctive_not_in) — asserted at the end. If a
    Spark upgrade fixes it upstream, the plain-spark assertion fails:
    then drop the rewrite and this pin together."""
    # standalone: standard-correct on both engines (the null trap)
    alone = "SELECT i FROM diff_r r WHERE r.i NOT IN (SELECT v FROM diff_w)"
    assert spark.sql(alone).collect() == []
    assert duck.execute(alone.replace("diff_r r", "r r")
                        .replace("diff_w", "w")).fetchall() == []
    # under OR with a non-foldable disjunct (a constant-false disjunct
    # gets optimized away and the correct standalone path returns):
    # standard three-valued logic says each disjunct is UNKNOWN for a
    # non-matching i (w.v contains NULLs), so UNKNOWN OR UNKNOWN
    # excludes the row — DuckDB returns only the matching row (42).
    # Spark plans the NOT IN branch as a negated plain-equality
    # ExistenceJoin and admits EVERY row, including NULL i.
    under_or = (
        "SELECT i FROM diff_r r WHERE r.i IN (SELECT v FROM diff_w) "
        "OR r.i NOT IN (SELECT v FROM diff_w) ORDER BY i NULLS FIRST"
    )
    exp_duck = [
        t[0] for t in duck.execute(
            under_or.replace("diff_r r", "r r").replace("diff_w", "w")
        ).fetchall()
    ]
    assert exp_duck == [42]  # the standard answer
    got_spark = [r.i for r in spark.sql(under_or).collect()]
    # Spark 4.1.2's actual (deviant) answer: all 8 rows
    assert got_spark == [None, None, -100, -7, 0, 9, 42, 100]
    # the dialect layer restores the standard answer
    assert [r.i for r in win_env.sql_query(under_or).collect()] == [42]


# --- array / higher-order-function fragment (r10) -------------------------------
#
# The ANN/embedding oracles lean on cross-engine list semantics
# (list_transform / slices / reductions in queries/annsql.py); this
# fragment checks the array surface directly. Spark and DuckDB spell
# the functions differently, so templates are (spark, duck) PAIRS with
# the same semantics; divergent NULL conventions are normalized on the
# duck side where DuckDB treats a NULL list as empty (list_concat) or
# skips NULL elements (list_sum). Arrays carry no NULL elements (NULL
# element reduction semantics genuinely differ); NULL and empty ARRAYS
# are both present.

ROWS_ARR = [
    (1, [1, 2, 3]),
    (2, [3, 3, 0]),
    (3, []),
    (4, None),
    (5, [42]),
    (6, [-7, 99, -7, 2]),
]

_ARR_PAIRS = [
    ("size(a)", "len(a)"),
    # try_element_at: Spark's ANSI element_at throws on out-of-bounds
    # (empty arrays); DuckDB's subscript returns NULL — the try_ form
    # is the NULL-returning spelling
    ("try_element_at(a, 1)", "a[1]"),
    ("try_element_at(a, -1)", "a[-1]"),
    ("array_contains(a, 3)", "list_contains(a, 3)"),
    ("transform(a, x -> x + 1)", "list_transform(a, x -> x + 1)"),
    ("transform(a, x -> x * x)", "list_transform(a, x -> x * x)"),
    ("filter(a, x -> x > 2)", "list_filter(a, x -> x > 2)"),
    ("sort_array(a)", "list_sort(a)"),
    ("sort_array(a, false)", "list_reverse_sort(a)"),
    ("array_max(a)", "list_max(a)"),
    ("array_min(a)", "list_min(a)"),
    ("slice(a, 1, 2)", "a[1:2]"),
    ("array_position(a, 3)",
     "CASE WHEN a IS NULL THEN NULL ELSE coalesce(list_position(a, 3), 0)"
     " END"),
    ("aggregate(a, CAST(0 AS BIGINT), (acc, x) -> acc + x)",
     "CASE WHEN a IS NULL THEN NULL ELSE CAST(coalesce(list_sum(a), 0) "
     "AS BIGINT) END"),
    ("concat(a, array(9))",
     "CASE WHEN a IS NULL THEN NULL ELSE list_concat(a, [9]) END"),
    ("array_distinct(sort_array(a))", "list_sort(list_distinct(a))"),
    ("reverse(a)", "list_reverse(a)"),
]


@pytest.fixture(scope="module")
def arr_rel(spark, duck):
    spark.createDataFrame(
        ROWS_ARR, "n long, a array<bigint>"
    ).createOrReplaceTempView("diff_a")
    vals = ", ".join(
        "({}, {})".format(
            n, "NULL" if a is None
            else "[" + ",".join(f"{x}::BIGINT" for x in a) + "]"
            if a else "[]::BIGINT[]",
        )
        for n, a in ROWS_ARR
    )
    duck.execute(
        f"CREATE TABLE arr AS SELECT * FROM (VALUES {vals}) t(n, a)"
    )
    return True


@given(st.lists(st.sampled_from(_ARR_PAIRS), min_size=4, max_size=10,
                unique=True))
@settings(max_examples=25, deadline=None, derandomize=True)
def test_array_functions_agree(spark, duck, arr_rel, pairs):
    sel_s = ", ".join(
        f"CAST({s} AS STRING) AS c{i}" for i, (s, _) in enumerate(pairs)
    )
    sel_d = ", ".join(
        f"CAST({d} AS VARCHAR) AS c{i}" for i, (_, d) in enumerate(pairs)
    )
    got = [
        tuple(r)
        for r in spark.sql(
            f"SELECT n, {sel_s} FROM diff_a ORDER BY n"
        ).collect()
    ]
    exp = duck.execute(
        f"SELECT n, {sel_d} FROM arr ORDER BY n"
    ).fetchall()
    assert got == exp, "\n".join(
        f"n={rg[0]} {p[0]} vs {p[1]}: spark={g!r} duck={x!r}"
        for rg, rx in zip(got, exp)
        for p, g, x in zip(pairs, rg[1:], rx[1:])
        if g != x
    )


def test_known_deviation_not_in_subquery_value_position(spark, duck,
                                                        spark_rel, win_rel,
                                                        win_env):
    """Sibling spelling of the disjunctive NOT IN deviation: in VALUE
    position (a projected column) upstream Spark 4.1.2 yields FALSE
    where the standard — and DuckDB — yield NULL for a null-capable
    NOT IN. Contexts that cannot distinguish FALSE from UNKNOWN (WHERE,
    CASE..ELSE) still produce standard OUTCOMES; contexts that can
    (projection output, IS NULL tests, negation) expose it. Since r11
    the dialect rewrite covers value position too
    (catalog._not_in_needs_rewrite) — asserted below, alongside the
    upstream pin (if a Spark upgrade fixes it, drop rewrite + pin
    together). Interesting contrast, also pinned: the NOT(x IN S)
    spelling under OR IS planned null-aware correctly upstream."""
    proj = ("SELECT r.i, r.i NOT IN (SELECT v FROM diff_w) AS f "
            "FROM diff_r r WHERE r.i IS NULL OR r.i IN (0, 42) "
            "ORDER BY i NULLS FIRST")
    exp = duck.execute(
        proj.replace("diff_r r", "r r").replace("diff_w", "w")
    ).fetchall()
    # standard: NULL probe/NULL-in-set -> f IS NULL; 42 matches -> FALSE
    assert [t[1] for t in exp] == [None, None, None, False]
    got = [r.f for r in spark.sql(proj).collect()]
    assert got == [False, False, False, False]  # upstream deviance
    # the dialect layer restores the standard answer (r11)
    fixed = [r.f for r in win_env.sql_query(proj).collect()]
    assert fixed == [None, None, None, False]
    # ... and in IS-NULL / negated positions
    isnull = ("SELECT r.i, (r.i NOT IN (SELECT v FROM diff_w)) IS NULL "
              "AS f FROM diff_r r ORDER BY i NULLS FIRST")
    assert ([tuple(x) for x in win_env.sql_query(isnull).collect()]
            == duck.execute(isnull.replace("diff_r r", "r r")
                            .replace("diff_w", "w")).fetchall())
    neg = ("SELECT r.i, NOT (r.i NOT IN (SELECT v FROM diff_w)) AS f "
           "FROM diff_r r ORDER BY i NULLS FIRST")
    assert ([tuple(x) for x in win_env.sql_query(neg).collect()]
            == duck.execute(neg.replace("diff_r r", "r r")
                            .replace("diff_w", "w")).fetchall())
    # NOT(IN) spelling under OR: upstream is CORRECT (null-aware)
    notin = ("SELECT i FROM diff_r r WHERE r.i = 42 "
             "OR NOT (r.i IN (SELECT v FROM diff_w)) ORDER BY i")
    assert [r.i for r in spark.sql(notin).collect()] == [42]


# --- random boolean trees over subquery-predicate leaves (r11) ------------------
#
# Generative stress for catalog._not_in_needs_rewrite: the classifier
# decides per-leaf whether upstream's planning is trustworthy from
# NOT-parity, OR-presence, and clause position — so generate random
# AND/OR/NOT trees over [NOT] IN leaves (including the complementary
# same-subquery pair that triggers the upstream dedup collapse), place
# them in WHERE and in SELECT, and require exact agreement with DuckDB
# through the dialect layer. Any disagreement is either a classifier
# hole or a new upstream shape — both are finds.

_BT_ATOMS = [
    "r.i > 0",
    "r.j = 3",
    "r.i IN (SELECT v FROM diff_w)",
    "r.i NOT IN (SELECT v FROM diff_w)",
    "r.i NOT IN (SELECT v FROM diff_w w WHERE w.v IS NOT NULL)",
    "r.j IN (SELECT v FROM diff_w)",
    # quantified leaves: the EXISTS composites are position-independent,
    # so they must stay exact under any NOT/OR/AND composition too
    "r.i >= ALL (SELECT v FROM diff_w)",
    "r.j < ANY (SELECT v FROM diff_w)",
]


def _btrees(depth: int):
    if depth == 0:
        return st.sampled_from(_BT_ATOMS)
    sub = _btrees(depth - 1)
    return st.one_of(
        st.sampled_from(_BT_ATOMS),
        st.tuples(sub, sub).map(lambda t: f"({t[0]} AND {t[1]})"),
        st.tuples(sub, sub).map(lambda t: f"({t[0]} OR {t[1]})"),
        sub.map(lambda e: f"(NOT {e})"),
    )


@given(_btrees(2))
@settings(max_examples=40, deadline=None, derandomize=True)
def test_boolean_tree_subquery_predicates_agree(spark, duck, spark_rel,
                                                win_rel, win_env, tree):
    order = "ORDER BY i NULLS FIRST, j NULLS FIRST"
    qw = f"SELECT r.i, r.j FROM diff_r r WHERE {tree} {order}"
    qs = (f"SELECT r.i, r.j, CAST({tree} AS STRING) AS c0 "
          f"FROM diff_r r {order}")
    for stmt in (qw, qs):
        got = [tuple(x) for x in win_env.sql_query(stmt).collect()]
        d = stmt.replace("diff_w", "w").replace("diff_r", "r") \
                .replace("AS STRING", "AS VARCHAR")
        exp = duck.execute(d).fetchall()
        assert got == exp, (stmt, got, exp)


# --- correlated scalar subqueries (r11) ----------------------------------------
#
# The third sibling of the subquery family: aggregated correlated
# scalar subqueries in SELECT and WHERE position. Classic traps the
# surface covers: COUNT over an EMPTY correlated group is 0 (not NULL
# — the decorrelating outer join must not lose the count-bug fix),
# SUM/MAX over an empty group IS NULL, groups keyed on NULL correlate
# to nothing, and the subquery value participates three-valuedly in
# comparisons. AVG is pinned through DECIMAL(20,4) so both engines
# format identically. Reference coverage: flink-table-planner
# SubQueryITCase scalar cases (SubQueryDecorrelator).

_SC_TMPL = [
    "(SELECT MAX(w.v) FROM diff_w w WHERE w.id = r.j)",
    "(SELECT MIN(w.v) FROM diff_w w WHERE w.id = r.j)",
    "(SELECT SUM(w.v) FROM diff_w w WHERE w.id = r.j)",
    "(SELECT COUNT(*) FROM diff_w w WHERE w.id = r.j)",
    "(SELECT COUNT(w.v) FROM diff_w w WHERE w.g = r.t)",
    "(SELECT MAX(w.v) FROM diff_w w WHERE w.g = r.t)",
    "(SELECT CAST(AVG(w.v) AS DECIMAL(20, 4)) FROM diff_w w "
    "WHERE w.g = r.t)",
    "(SELECT SUM(w.v) FROM diff_w w WHERE w.g = r.t AND w.v > 5)",
]


@given(
    st.lists(st.sampled_from(_SC_TMPL), min_size=1, max_size=3,
             unique=True),
    st.sampled_from(_SC_TMPL),
    st.sampled_from(["r.i > {q}", "r.j = {q}", "({q}) IS NULL",
                     "COALESCE({q}, -1) < r.i"]),
)
@settings(max_examples=30, deadline=None, derandomize=True)
def test_correlated_scalar_subquery_agree(spark, duck, spark_rel,
                                          win_rel, win_env, sels, wq,
                                          wrap):
    sel = ", ".join(
        f"CAST({t} AS STRING) AS c{i}" for i, t in enumerate(sels)
    )
    where = wrap.format(q=wq)
    order = "ORDER BY i NULLS FIRST, j NULLS FIRST"
    q = (f"SELECT r.i, r.j, {sel} FROM diff_r r {order}")
    qw = (f"SELECT r.i, r.j FROM diff_r r WHERE {where} {order}")
    for stmt in (q, qw):
        got = [tuple(x) for x in win_env.sql_query(stmt).collect()]
        d = stmt.replace("diff_w", "w").replace("diff_r", "r") \
                .replace("AS STRING", "AS VARCHAR")
        exp = duck.execute(d).fetchall()
        assert got == exp, (stmt, got, exp)


# --- quantified subquery comparisons (r11) -------------------------------------
#
# ANY/SOME/ALL — the sibling family of the IN/EXISTS fragment whose r10
# fuzzer found the upstream NOT IN bug. Spark has NO quantified
# comparison syntax; the dialect layer adds it via EXISTS composites
# (catalog._rewrite_quantified_cmp), so this surface is a pure
# implementation check against DuckDB's native quantified evaluation:
# every op x quantifier x null-capability combination, in predicate AND
# value position, over a NULL-capable set, a null-free set, and an
# empty set (ALL-over-empty = TRUE, ANY-over-empty = FALSE are the
# classic trap). Reference coverage: flink-table-planner
# runtime/batch/sql/SubQueryITCase quantified cases (Calcite
# SqlQuantifyOperator).

_QC_OPS = ["=", "<>", "<", "<=", ">", ">="]
_QC_TMPL = [
    "r.i {op} ANY (SELECT v FROM diff_w)",
    "r.i {op} ALL (SELECT v FROM diff_w)",
    "r.i {op} SOME (SELECT v FROM diff_w w WHERE w.v IS NOT NULL)",
    "r.i {op} ALL (SELECT v FROM diff_w w WHERE w.v IS NOT NULL)",
    "r.j {op} ALL (SELECT v FROM diff_w w WHERE w.v > 1000)",
    "r.j {op} ANY (SELECT v FROM diff_w w WHERE w.v > 1000)",
]


@given(
    st.sampled_from(_QC_OPS),
    st.lists(st.sampled_from(_QC_TMPL), min_size=1, max_size=2,
             unique=True),
    st.sampled_from(["AND", "OR"]),
)
@settings(max_examples=30, deadline=None, derandomize=True)
def test_quantified_comparison_agree(spark, duck, spark_rel, win_rel,
                                     win_env, op, tmpls, conj):
    preds = [t.format(op=op) for t in tmpls]
    where = f" {conj} ".join(f"({p})" for p in preds)
    sel = ", ".join(
        f"CAST(({p}) AS STRING) AS c{i}" for i, p in enumerate(preds)
    )
    order = "ORDER BY i NULLS FIRST, j NULLS FIRST"
    # predicate position
    got = [
        tuple(x)
        for x in win_env.sql_query(
            f"SELECT r.i, r.j FROM diff_r r WHERE {where} {order}"
        ).collect()
    ]
    exp = duck.execute(
        f"SELECT r.i, r.j FROM r r "
        f"WHERE {where.replace('diff_w', 'w')} {order}"
    ).fetchall()
    assert got == exp, ("WHERE", op, tmpls, conj, got, exp)
    # value position (three-valued results projected)
    got = [
        tuple(x)
        for x in win_env.sql_query(
            f"SELECT r.i, r.j, {sel} FROM diff_r r {order}"
        ).collect()
    ]
    d_sel = sel.replace("diff_w", "w").replace("STRING", "VARCHAR")
    exp = duck.execute(
        f"SELECT r.i, r.j, {d_sel} FROM r r {order}"
    ).fetchall()
    assert got == exp, ("SELECT", op, tmpls, conj, got, exp)


def test_known_deviation_complementary_subquery_dedup(spark, duck,
                                                      spark_rel, win_rel,
                                                      win_env):
    """Sharper r11 characterization of the r10 filter-context find:
    upstream plans SINGLE [NOT] IN disjuncts null-aware correctly
    (pinned below) — the filter deviance specifically requires
    COMPLEMENTARY same-subquery predicates sharing a disjunction
    (`P OR NOT P` in any spelling): the planner dedups both arms onto
    one two-valued existence variable and the filter collapses to
    const-TRUE, admitting every row the standard says UNKNOWN. The
    dialect rewrite of the effectively-negated arm breaks the dedup and
    restores the standard answer (asserted per spelling)."""
    std = [42]  # the single genuine match; UNKNOWN excludes the rest
    all_rows = [None, None, -100, -7, 0, 9, 42, 100]
    complements = [
        "r.i IN (SELECT v FROM diff_w) OR r.i NOT IN (SELECT v FROM diff_w)",
        "r.i IN (SELECT v FROM diff_w) OR NOT (r.i IN (SELECT v FROM diff_w))",
        "r.i NOT IN (SELECT v FROM diff_w) OR NOT (r.i NOT IN (SELECT v FROM diff_w))",
    ]
    for c in complements:
        q = f"SELECT i FROM diff_r r WHERE {c} ORDER BY i NULLS FIRST"
        dq = q.replace("diff_r r", "r r").replace("diff_w", "w")
        assert [t[0] for t in duck.execute(dq).fetchall()] == std, c
        assert [r.i for r in spark.sql(q).collect()] == all_rows, c
        assert [r.i for r in win_env.sql_query(q).collect()] == std, c
    # single disjuncts and NNF'd negations: upstream CORRECT — the
    # dialect layer's extra rewrite of the NOT IN spellings must agree
    singles = [
        "r.i = 42 OR r.i NOT IN (SELECT v FROM diff_w)",
        "r.i = 42 OR (r.i > -1000 AND r.i NOT IN (SELECT v FROM diff_w))",
        "NOT (r.i < -1000 OR r.i NOT IN (SELECT v FROM diff_w))",
        "NOT (r.i > -1000 AND r.i NOT IN (SELECT v FROM diff_w))",
        "r.i = 42 OR r.i IN (SELECT v FROM diff_w)",
    ]
    for c in singles:
        q = f"SELECT i FROM diff_r r WHERE {c} ORDER BY i NULLS FIRST"
        dq = q.replace("diff_r r", "r r").replace("diff_w", "w")
        exp = [t[0] for t in duck.execute(dq).fetchall()]
        assert [r.i for r in spark.sql(q).collect()] == exp, c
        assert [r.i for r in win_env.sql_query(q).collect()] == exp, c


# --- tuple-probe [NOT] IN subqueries (r12) ---------------------------------------
#
# Row-value probes `(a, b) [NOT] IN (SELECT x, y ...)` — the last
# documented deviance the dialect layer passed through (r11 scope cut).
# Upstream Spark 4.1.2 mirrors the single-column surface exactly
# (mapped empirically this round): value position yields FALSE where
# the standard says NULL for BOTH operators, complementary
# same-subquery disjunctions collapse to const-TRUE, conjunctive
# filters and single disjuncts are planned null-aware correctly.
# DuckDB cannot parse multi-column IN at all ("Subquery returns 2
# columns"), so the oracle side spells the SQL-standard definition
# from first principles — a CASE over a pairwise-equality EXISTS
# (TRUE), an UNKNOWN-row EXISTS (NULL), else FALSE — which is a
# genuinely independent formulation of the same semantics, not an echo
# of the engine's composite. Reference parity: Calcite plans row-value
# IN null-aware everywhere (FlinkSubQueryRemoveRule.scala).


def _tin3(pairs: list[tuple[str, str]], flt: str = "") -> str:
    """DuckDB first-principles three-valued row-IN: pairs are
    (probe_expr, w_column) against table alias ``w``."""
    match = " AND ".join(f"(w.{c} = {p})" for p, c in pairs)
    return (
        f"CASE WHEN EXISTS (SELECT 1 FROM w WHERE ({match})"
        f"{' AND (' + flt + ')' if flt else ''}) THEN TRUE "
        f"WHEN EXISTS (SELECT 1 FROM w WHERE (({match})) IS NULL"
        f"{' AND (' + flt + ')' if flt else ''}) THEN NULL "
        f"ELSE FALSE END"
    )


def _tuple_atom(cols: list[tuple[str, str]], neg: bool, flt_s: str = "",
                flt_d: str = "") -> tuple[str, str]:
    """(spark_pred, duck_pred) for `(probes) [NOT] IN (SELECT wcols)`."""
    probes = ", ".join(p for p, _ in cols)
    wcols = ", ".join(c for _, c in cols)
    inner = f"SELECT {wcols} FROM diff_w" + (
        f" WHERE {flt_s}" if flt_s else ""
    )
    sp = f"({probes}) {'NOT ' if neg else ''}IN ({inner})"
    du = _tin3(cols, flt_d)
    return sp, (f"NOT ({du})" if neg else f"({du})")


_TUPLE_ATOMS = [
    _tuple_atom([("r.i", "v"), ("r.j", "id")], neg=False),
    _tuple_atom([("r.i", "v"), ("r.j", "id")], neg=True),
    _tuple_atom([("r.i", "v"), ("r.i", "v")], neg=True),
    _tuple_atom([("r.j", "id"), ("r.j", "id")], neg=True),  # null-free set
    _tuple_atom([("r.t", "g"), ("r.j", "v")], neg=False),
    _tuple_atom([("r.t", "g"), ("r.j", "v")], neg=True),
    _tuple_atom(
        [("r.i", "v"), ("r.j", "id")], neg=True,
        flt_s="v IS NOT NULL", flt_d="w.v IS NOT NULL",
    ),
]


@given(
    st.lists(st.sampled_from(range(len(_TUPLE_ATOMS))), min_size=1,
             max_size=3, unique=True),
    st.sampled_from(["{p}", "({p}) IS NULL", "NOT ({p})",
                     "CASE WHEN {p} THEN 'y' ELSE 'n' END",
                     "coalesce({p}, FALSE)"]),
)
@settings(max_examples=25, deadline=None, derandomize=True)
def test_tuple_in_value_position_agree(spark, duck, spark_rel, win_rel,
                                       win_env, idxs, wrap):
    """VALUE-position tuple probes through every FALSE/UNKNOWN-
    distinguishing wrapper, vs DuckDB's first-principles expansion."""
    atoms = [_TUPLE_ATOMS[i] for i in idxs]
    sel_s = ", ".join(
        f"CAST({wrap.format(p=sp)} AS STRING) AS c{i}"
        for i, (sp, _) in enumerate(atoms)
    )
    sel_d = ", ".join(
        f"CAST({wrap.format(p=dp)} AS VARCHAR) AS c{i}"
        for i, (_, dp) in enumerate(atoms)
    )
    order = "ORDER BY i NULLS FIRST, j NULLS FIRST"
    got = [
        tuple(x)
        for x in win_env.sql_query(
            f"SELECT r.i, r.j, {sel_s} FROM diff_r r {order}"
        ).collect()
    ]
    exp = duck.execute(
        f"SELECT r.i, r.j, {sel_d} FROM r r {order}"
    ).fetchall()
    assert got == exp, (idxs, wrap, got, exp)


@given(
    st.lists(st.sampled_from(range(len(_TUPLE_ATOMS))), min_size=1,
             max_size=2, unique=True),
    st.sampled_from(["AND", "OR"]),
    st.sampled_from(["", "NOT "]),
)
@settings(max_examples=25, deadline=None, derandomize=True)
def test_tuple_in_filter_agree(spark, duck, spark_rel, win_rel, win_env,
                               idxs, conj, outer_not):
    """FILTER-position tuple probes under AND/OR/NOT compositions —
    covers the complementary-dedup shapes (a tuple IN and its NOT IN
    twin under OR) and the NNF'd spellings the classifier must
    re-route, plus conjunctive pass-through paths."""
    atoms = [_TUPLE_ATOMS[i] for i in idxs]
    where_s = f" {conj} ".join(f"({sp})" for sp, _ in atoms)
    where_d = f" {conj} ".join(f"({dp})" for _, dp in atoms)
    order = "ORDER BY i NULLS FIRST, j NULLS FIRST"
    got = [
        tuple(x)
        for x in win_env.sql_query(
            f"SELECT r.i, r.j FROM diff_r r "
            f"WHERE {outer_not}({where_s}) {order}"
        ).collect()
    ]
    exp = duck.execute(
        f"SELECT r.i, r.j FROM r r WHERE {outer_not}({where_d}) {order}"
    ).fetchall()
    assert got == exp, (idxs, conj, outer_not, got, exp)


def test_known_deviation_tuple_not_in_subquery(spark, duck, spark_rel,
                                               win_rel, win_env):
    """Pins the upstream tuple-probe deviance the r12 rewrite fixes:
    in value position Spark 4.1.2 yields FALSE where the standard says
    NULL for row-value [NOT] IN (same class as the single-column
    deviance r11 fixed), and the complementary disjunction collapses to
    const-TRUE. Conjunctive filters are upstream-correct (also pinned,
    so the byte-identical pass-through stays justified). If a Spark
    upgrade fixes the deviance, the plain-spark assertions fail: drop
    the tuple branch of the rewrite and this pin together."""
    proj = ("SELECT r.i, (r.i, r.i) NOT IN (SELECT v, v FROM diff_w) "
            "AS f FROM diff_r r WHERE r.i IS NULL OR r.i IN (0, 42) "
            "ORDER BY i NULLS FIRST")
    # upstream: FALSE everywhere (three-valued logic lost)
    assert [r.f for r in spark.sql(proj).collect()] == [
        False, False, False, False
    ]
    # standard: NULL probe -> UNKNOWN; 0 -> UNKNOWN (NULL v rows);
    # 42 matches (42,42) via w row v=42 -> definite FALSE for NOT IN
    duck_pred = _tin3([("r.i", "v"), ("r.i", "v")])
    exp = duck.execute(
        f"SELECT r.i, NOT ({duck_pred}) AS f FROM r r "
        "WHERE r.i IS NULL OR r.i IN (0, 42) ORDER BY i NULLS FIRST"
    ).fetchall()
    assert [t[1] for t in exp] == [None, None, None, False]
    # the dialect layer restores the standard answer
    got = [r.f for r in win_env.sql_query(proj).collect()]
    assert got == [None, None, None, False]
    # complementary disjunction: upstream admits every row
    comp = ("SELECT i FROM diff_r r WHERE (r.i, r.i) IN (SELECT v, v "
            "FROM diff_w) OR (r.i, r.i) NOT IN (SELECT v, v FROM diff_w) "
            "ORDER BY i NULLS FIRST")
    assert [r.i for r in spark.sql(comp).collect()] == [
        None, None, -100, -7, 0, 9, 42, 100
    ]
    assert [r.i for r in win_env.sql_query(comp).collect()] == [42]
    # conjunctive filter: upstream CORRECT (null-aware row-value anti
    # join) — and the rewrite leaves it byte-identical
    conj = ("SELECT i FROM diff_r r WHERE (r.i, r.j) NOT IN "
            "(SELECT v, id FROM diff_w) ORDER BY i NULLS FIRST")
    from flink_spark.catalog import _rewrite_nonconjunctive_not_in
    assert _rewrite_nonconjunctive_not_in(conj) == conj
    duck_c = _tin3([("r.i", "v"), ("r.j", "id")])
    exp_c = [t[0] for t in duck.execute(
        f"SELECT i FROM r r WHERE NOT ({duck_c}) ORDER BY i NULLS FIRST"
    ).fetchall()]
    assert [r.i for r in spark.sql(conj).collect()] == exp_c


# --- paired boolean trees with tuple-IN and quantified leaves (r12) --------------
#
# The r11 generative tree surface found two real classifier bugs
# precisely when a new leaf type was added (NNF collapse, probe
# ordering); tuple probes are the next leaf, and they interact with the
# NNF accounting the same way. DuckDB cannot parse tuple IN, so this
# twin generator composes PAIRED (spark, duck) expressions structurally
# — same tree, per-engine leaf spelling.

_BT2_ATOMS = [
    ("r.i > 0", "r.i > 0"),
    ("r.j = 3", "r.j = 3"),
    ("r.i IN (SELECT v FROM diff_w)",
     "r.i IN (SELECT v FROM w)"),
    ("r.i NOT IN (SELECT v FROM diff_w)",
     "r.i NOT IN (SELECT v FROM w)"),
    _TUPLE_ATOMS[1],   # (r.i, r.j) NOT IN (v, id)
    _TUPLE_ATOMS[2],   # (r.i, r.i) NOT IN (v, v)
    _TUPLE_ATOMS[4],   # (r.t, r.j) IN (g, v)
    ("r.i >= ALL (SELECT v FROM diff_w)",
     "r.i >= ALL (SELECT v FROM w)"),
    ("r.j < ANY (SELECT v FROM diff_w)",
     "r.j < ANY (SELECT v FROM w)"),
]


def _btrees2(depth: int):
    leaf = st.sampled_from(_BT2_ATOMS)
    if depth == 0:
        return leaf
    sub = _btrees2(depth - 1)
    return st.one_of(
        leaf,
        st.tuples(sub, sub).map(
            lambda t: (f"({t[0][0]} AND {t[1][0]})",
                       f"({t[0][1]} AND {t[1][1]})")
        ),
        st.tuples(sub, sub).map(
            lambda t: (f"({t[0][0]} OR {t[1][0]})",
                       f"({t[0][1]} OR {t[1][1]})")
        ),
        sub.map(lambda e: (f"(NOT {e[0]})", f"(NOT {e[1]})")),
    )


@given(_btrees2(2))
@settings(max_examples=40, deadline=None, derandomize=True)
def test_boolean_tree_tuple_quantified_agree(spark, duck, spark_rel,
                                             win_rel, win_env, tree):
    ts, td = tree
    order = "ORDER BY i NULLS FIRST, j NULLS FIRST"
    pairs = [
        (f"SELECT r.i, r.j FROM diff_r r WHERE {ts} {order}",
         f"SELECT r.i, r.j FROM r r WHERE {td} {order}"),
        (f"SELECT r.i, r.j, CAST({ts} AS STRING) AS c0 "
         f"FROM diff_r r {order}",
         f"SELECT r.i, r.j, CAST({td} AS VARCHAR) AS c0 "
         f"FROM r r {order}"),
    ]
    for qs, qd in pairs:
        got = [tuple(x) for x in win_env.sql_query(qs).collect()]
        exp = duck.execute(qd).fetchall()
        assert got == exp, (qs, got, exp)


# --- correlated quantified comparisons (r12) -------------------------------------
#
# `X op ANY|ALL (<correlated Q>)` — reference parity:
# flink-table-planner SubQueryITCase covers quantified comparisons over
# correlated subqueries (Calcite SqlQuantifyOperator + decorrelation).
# Spark 4.1.2 resolves outer references nested inside the rewrite's
# derived-table wrap (measured this round — the r11 "one level too
# deep" note is obsolete), so the SAME EXISTS composite carries
# correlated Q; shapes whose outer references sit MORE than one
# subquery level from the predicate raise the engine's clean
# unsupported-shape error (pinned in test_rewrite_fuzz).
#
# ORACLE NOTE: DuckDB 1.0.0's NATIVE correlated quantified comparison
# is itself deviant — `r.i = ANY (SELECT k.v FROM w k WHERE k.u = r.j)`
# returns TRUE for a NULL probe against a NULL-element set (standard:
# UNKNOWN), disagreeing with DuckDB's own first-principles expansion
# (pinned below). So this surface uses the first-principles CASE-over-
# EXISTS spelling on the DuckDB side, same device as the tuple-IN
# surface.

_CQ_SHAPES = [
    # (spark Q, duck Q-body ending in a top-level WHERE so the
    # comparison appends with AND, element column) — correlated on r.j
    # against diff_w(id non-null, g nullable string, v nullable long)
    ("(SELECT k.v FROM diff_w k WHERE k.id >= r.j)",
     "FROM w k WHERE (k.id >= r.j)", "k.v"),
    ("(SELECT k.v FROM diff_w k WHERE k.id = r.j)",
     "FROM w k WHERE (k.id = r.j)", "k.v"),
    ("(SELECT MAX(k.v) FROM diff_w k WHERE k.id >= r.j GROUP BY k.g)",
     "FROM (SELECT MAX(k2.v) AS mv FROM w k2 WHERE k2.id >= r.j "
     "GROUP BY k2.g) k WHERE TRUE", "k.mv"),
    ("(SELECT SUM(k.v) FROM diff_w k WHERE k.id = r.j)",
     "FROM (SELECT SUM(k2.v) AS sv FROM w k2 WHERE k2.id = r.j) k "
     "WHERE TRUE", "k.sv"),
    ("(SELECT DISTINCT k.v FROM diff_w k WHERE k.id <= r.j)",
     "FROM (SELECT DISTINCT k2.v AS dv FROM w k2 WHERE k2.id <= r.j) k "
     "WHERE TRUE", "k.dv"),
]


def _cq_duck(op: str, quant: str, body: str, col: str) -> str:
    """First-principles three-valued quantified comparison for DuckDB."""
    t = f"(r.i {op} {col})"
    if quant == "ALL":
        return (f"CASE WHEN EXISTS (SELECT 1 {body} AND NOT {t}) "
                f"THEN FALSE WHEN EXISTS (SELECT 1 {body} AND "
                f"({t} IS NULL)) THEN NULL ELSE TRUE END")
    return (f"CASE WHEN EXISTS (SELECT 1 {body} AND {t}) THEN TRUE "
            f"WHEN EXISTS (SELECT 1 {body} AND ({t} IS NULL)) "
            f"THEN NULL ELSE FALSE END")


@given(
    st.sampled_from(["=", "<>", "<", "<=", ">", ">="]),
    st.sampled_from(["ANY", "ALL"]),
    st.sampled_from(range(len(_CQ_SHAPES))),
)
@settings(max_examples=40, deadline=None, derandomize=True)
def test_correlated_quantified_agree(spark, duck, spark_rel, win_rel,
                                     win_env, op, quant, qi):
    sq, body, col = _CQ_SHAPES[qi]
    pred_s = f"r.i {op} {quant} {sq}"
    pred_d = _cq_duck(op, quant, body, col)
    order = "ORDER BY i NULLS FIRST, j NULLS FIRST"
    # predicate position
    got = [tuple(x) for x in win_env.sql_query(
        f"SELECT r.i, r.j FROM diff_r r WHERE {pred_s} {order}"
    ).collect()]
    exp = duck.execute(
        f"SELECT r.i, r.j FROM r r WHERE {pred_d} {order}"
    ).fetchall()
    assert got == exp, ("WHERE", op, quant, qi, got, exp)
    # value position (three-valued result projected)
    got = [tuple(x) for x in win_env.sql_query(
        f"SELECT r.i, r.j, CAST({pred_s} AS STRING) AS c0 "
        f"FROM diff_r r {order}"
    ).collect()]
    exp = duck.execute(
        f"SELECT r.i, r.j, CAST({pred_d} AS VARCHAR) AS c0 "
        f"FROM r r {order}"
    ).fetchall()
    assert got == exp, ("SELECT", op, quant, qi, got, exp)


def test_known_deviation_duckdb_correlated_any(duck, win_rel):
    """Pins WHY the correlated-quantified oracles use first-principles
    spelling: DuckDB 1.0.0's native correlated `= ANY` in FILTER
    position admits a NULL-probe row whose candidate set is all-NULL —
    a row DuckDB's OWN value-position evaluation of the same predicate
    marks NULL (UNKNOWN), which a standard filter must exclude (and
    DuckDB's own CASE-over-EXISTS expansion does exclude). If a DuckDB
    upgrade fixes this, the native assertion fails: the surfaces can
    then drop the first-principles device for correlated shapes."""
    duck.execute("CREATE OR REPLACE TEMP TABLE cqr AS SELECT * FROM "
                 "(VALUES (NULL::BIGINT, 1), (0, 2), (5, 3)) t(i, j)")
    duck.execute("CREATE OR REPLACE TEMP TABLE cqw AS SELECT * FROM "
                 "(VALUES (1, NULL::BIGINT), (2, 5), "
                 "(2, NULL::BIGINT), (3, 7)) t(u, v)")
    filt = ("SELECT r.i, r.j FROM cqr r WHERE r.i = ANY "
            "(SELECT k.v FROM cqw k WHERE k.u = r.j) ORDER BY j")
    val = ("SELECT r.i, r.j, (r.i = ANY (SELECT k.v FROM cqw k "
           "WHERE k.u = r.j)) AS f FROM cqr r ORDER BY j")
    got_filt = duck.execute(filt).fetchall()
    got_val = duck.execute(val).fetchall()
    # native value position: row (NULL, 1) evaluates to NULL (UNKNOWN)
    assert got_val == [(None, 1, None), (0, 2, None), (5, 3, False)]
    # ...yet the native FILTER admits exactly that row (the deviance)
    assert got_filt == [(None, 1)]
    # the first-principles expansion excludes it, per the standard
    t = "(r.i = k.v)"
    fp = (f"SELECT r.i, r.j FROM cqr r WHERE CASE WHEN EXISTS "
          f"(SELECT 1 FROM cqw k WHERE (k.u = r.j) AND {t}) THEN TRUE "
          f"WHEN EXISTS (SELECT 1 FROM cqw k WHERE (k.u = r.j) AND "
          f"({t} IS NULL)) THEN NULL ELSE FALSE END ORDER BY j")
    assert duck.execute(fp).fetchall() == []


# --- distinct / filtered aggregates (r12, audit sev-1) ---------------------------
#
# DISTINCT aggs ride Spark's expand-based split path and FILTER
# (WHERE ...) clauses ride per-agg conditional evaluation — both are
# easy to get subtly wrong against NULL groups/values, and the existing
# grouped surface covered neither. Exact comparison vs DuckDB across
# agg x filter x grouping combinations over the NULL-bearing diff_w.

_DF_AGGS = [
    "COUNT(DISTINCT v)",
    "COUNT(DISTINCT g)",
    "CAST(SUM(DISTINCT v) AS STRING)",
    "COUNT(*) FILTER (WHERE v > 7)",
    "COUNT(v) FILTER (WHERE g = 'a')",
    "CAST(SUM(v) FILTER (WHERE g IS NULL) AS STRING)",
    "CAST(MIN(v) FILTER (WHERE v > 0) AS STRING)",
    "CAST(MAX(v) FILTER (WHERE g <> 'a') AS STRING)",
    "COUNT(DISTINCT v) FILTER (WHERE g = 'b')",
    "CAST(CAST(AVG(DISTINCT v) AS DECIMAL(20, 4)) AS STRING)",
]
_DF_GROUPS = ["g", "COALESCE(g, 'zz')", "v % 3", ""]


@given(
    st.lists(st.sampled_from(_DF_AGGS), min_size=2, max_size=4,
             unique=True),
    st.sampled_from(_DF_GROUPS),
)
@settings(max_examples=30, deadline=None, derandomize=True)
def test_distinct_filtered_aggregates_agree(spark, duck, win_rel, win_env,
                                            aggs, grp):
    sel = ", ".join(f"{a} AS c{i}" for i, a in enumerate(aggs))
    if grp:
        q = (f"SELECT CAST({grp} AS STRING) AS k, {sel} FROM diff_w "
             f"GROUP BY {grp} ORDER BY k NULLS FIRST")
    else:
        q = f"SELECT {sel} FROM diff_w"
    got = [tuple(x) for x in win_env.sql_query(q).collect()]
    exp = duck.execute(
        q.replace("diff_w", "w").replace("AS STRING", "AS VARCHAR")
    ).fetchall()
    assert got == exp, (aggs, grp, got, exp)


# --- theta / band joins (r12, audit sev-1) ---------------------------------------
#
# Non-equi joins plan as BroadcastNestedLoopJoin; the band predicates
# here sweep width (empty through all-pairs), strictness, an extra
# equi conjunct (→ hash join with residual), and inner/left types over
# the NULL-bearing fixtures. Exact agreement with DuckDB required.

_TJ_CONDS = [
    "w.v BETWEEN r.i - {b} AND r.i + {b}",
    "w.v > r.i - {b} AND w.v < r.i + {b}",
    "w.v >= r.i AND w.v <= r.i + {b}",
    "ABS(w.v - r.i) <= {b}",
]


@given(
    st.sampled_from(_TJ_CONDS),
    st.sampled_from([0, 3, 50, 1000]),
    st.sampled_from(["JOIN", "LEFT JOIN"]),
    st.booleans(),
)
@settings(max_examples=30, deadline=None, derandomize=True)
def test_theta_band_join_agree(spark, duck, spark_rel, win_rel, win_env,
                               cond, b, jt, extra_equi):
    on = cond.format(b=b)
    if extra_equi:
        on = f"({on}) AND w.id = r.j"
    q = (f"SELECT r.i, r.j, w.id, w.v FROM diff_r r {jt} diff_w w "
         f"ON {on} ORDER BY i NULLS FIRST, j NULLS FIRST, "
         f"id NULLS FIRST, v NULLS FIRST")
    got = [tuple(x) for x in win_env.sql_query(q).collect()]
    exp = duck.execute(
        q.replace("diff_r", "r").replace("diff_w", "w")
    ).fetchall()
    assert got == exp, (on, jt, got, exp)


# --- sort / limit / offset (r12, audit sev-1) ------------------------------------
#
# Full ORDER BY x LIMIT/OFFSET over every direction x NULLS placement,
# with a unique (i, j) tiebreak so both engines see a TOTAL order and
# the prefix is well-defined. Covers the sort-limit operator family's
# null-ordering corners the single gate can't sweep.

_SL_KEYS = [
    "i {d} NULLS {n}",
    "j {d} NULLS {n}",
    "s {d} NULLS {n}",
    "COALESCE(i, -999) {d}",
    "(i + j) {d} NULLS {n}",
]


@given(
    st.sampled_from(_SL_KEYS),
    st.sampled_from(["ASC", "DESC"]),
    st.sampled_from(["FIRST", "LAST"]),
    st.sampled_from([0, 1, 3, 8, 20]),
    st.sampled_from([0, 2, 7]),
)
@settings(max_examples=40, deadline=None, derandomize=True)
def test_sort_limit_offset_agree(spark, duck, spark_rel, win_env,
                                 key, d, n, lim, off):
    k = key.format(d=d, n=n)
    q = (f"SELECT i, j FROM diff_r ORDER BY {k}, "
         f"i ASC NULLS FIRST, j ASC NULLS FIRST "
         f"LIMIT {lim} OFFSET {off}")
    got = [tuple(x) for x in win_env.sql_query(q).collect()]
    exp = duck.execute(q.replace("diff_r", "r")).fetchall()
    assert got == exp, (k, lim, off, got, exp)


# --- UNNEST / lateral explode (r12, audit sev-1) ---------------------------------
#
# Paired spellings (engines disagree on syntax): Spark LATERAL VIEW
# explode/posexplode vs DuckDB unnest/generate_subscripts — over the
# array fixture's NULL and EMPTY arrays (the rows both engines must
# DROP without OUTER, and preserve with OUTER/LEFT LATERAL).

def test_unnest_lateral_agree(spark, duck, arr_rel, win_env):
    cases = [
        # plain explode drops NULL and empty arrays
        ("SELECT n, x FROM diff_a LATERAL VIEW explode(a) t AS x "
         "ORDER BY n, x NULLS FIRST",
         "SELECT n, unnest(a) AS x FROM arr "
         "ORDER BY n, x NULLS FIRST"),
        # WITH ORDINALITY (1-based) — posexplode pos is 0-based
        ("SELECT n, p + 1 AS o, x FROM diff_a "
         "LATERAL VIEW posexplode(a) t AS p, x ORDER BY n, o",
         "SELECT n, generate_subscripts(a, 1) AS o, unnest(a) AS x "
         "FROM arr ORDER BY n, o"),
        # OUTER explode keeps NULL/empty rows with NULL element
        ("SELECT n, x FROM diff_a LATERAL VIEW OUTER explode(a) t AS x "
         "ORDER BY n, x NULLS FIRST",
         "SELECT r.n, u.x FROM arr r LEFT JOIN LATERAL "
         "(SELECT unnest(r.a) AS x) u ON TRUE "
         "ORDER BY n, x NULLS FIRST"),
        # aggregate over the exploded rows
        ("SELECT n, COUNT(x) AS c, CAST(SUM(x) AS STRING) AS s FROM "
         "(SELECT n, x FROM diff_a LATERAL VIEW explode(a) t AS x) "
         "GROUP BY n ORDER BY n",
         "SELECT n, COUNT(x) AS c, CAST(SUM(x) AS VARCHAR) AS s FROM "
         "(SELECT n, unnest(a) AS x FROM arr) GROUP BY n ORDER BY n"),
    ]
    for qs, qd in cases:
        got = [tuple(x) for x in win_env.sql_query(qs).collect()]
        exp = duck.execute(qd).fetchall()
        assert got == exp, (qs, got, exp)
