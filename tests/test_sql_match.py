"""MATCH_RECOGNIZE SQL front-end vs the CEP operator API: the SQL text
must produce exactly what the equivalent Pattern program produces."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_spark.catalog import TableEnvironment
from flink_spark.operators.cep import Pattern, match_pattern
from flink_spark.sources.tables import load_table


def test_match_recognize_sql_equals_pattern_api(spark, sf_dir):
    env = TableEnvironment(spark)
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 150)
    ev.createOrReplaceTempView("mr_events")

    got = env.execute_sql("""
        SELECT * FROM mr_events MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES FIRST(A.event_id) AS first_click,
                     LAST(B.event_id) AS buy_id,
                     COUNT(A.*) AS n_clicks,
                     B.value AS buy_value
            ONE ROW PER MATCH
            AFTER MATCH SKIP PAST LAST ROW
            PATTERN (A+ B)
            DEFINE A AS A.event_type = 'click',
                   B AS B.event_type = 'purchase'
        )
    """)

    pat = (
        Pattern.begin("A", lambda r: r["event_type"] == "click")
        .one_or_more(greedy=True)
        .next("B", lambda r: r["event_type"] == "purchase")
    )
    long_df = match_pattern(
        ev, pat, key_cols=["user_id"], ts_col="ts", order_cols=["ts", "event_id"]
    )
    isa = F.col("var") == "A"
    isb = F.col("var") == "B"
    expected = (
        long_df.groupBy("user_id", "match_id")
        .agg(
            F.min_by(F.when(isa, F.col("event_id")), F.when(isa, F.col("seq_no")))
            .alias("first_click"),
            F.max_by(F.when(isb, F.col("event_id")), F.when(isb, F.col("seq_no")))
            .alias("buy_id"),
            F.sum(F.when(isa, 1).otherwise(0)).alias("n_clicks"),
            F.max_by(F.when(isb, F.col("value")), F.when(isb, F.col("seq_no")))
            .alias("buy_value"),
        )
        .drop("match_id")
    )
    got_rows = sorted(map(tuple, got.collect()))
    exp_rows = sorted(map(tuple, expected.collect()))
    assert got_rows == exp_rows and len(got_rows) > 0


def test_match_recognize_within_and_skip(spark, sf_dir):
    env = TableEnvironment(spark)
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 80)
    ev.createOrReplaceTempView("mr_events2")
    got = env.execute_sql("""
        SELECT * FROM mr_events2 MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES FIRST(E.event_id) AS first_err, COUNT(E.*) AS n_err
            AFTER MATCH SKIP TO NEXT ROW
            PATTERN (E E)
            WITHIN INTERVAL '30' MINUTE
            DEFINE E AS E.event_type = 'error'
        )
    """)
    rows = got.collect()
    assert all(r["n_err"] == 2 for r in rows)


def _mk_seq(spark, seq):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, i, t0 + dt.timedelta(minutes=i), s) for i, s in enumerate(seq)]
    return spark.createDataFrame(
        rows, "k INT, event_id INT, ts TIMESTAMP, t STRING"
    )


def test_match_recognize_alternation_and_classifier(spark):
    env = TableEnvironment(spark)
    _mk_seq(spark, ["a", "b", "a", "c", "x", "b", "c"]).createOrReplaceTempView(
        "mr_alt"
    )
    got = env.execute_sql("""
        SELECT * FROM mr_alt MATCH_RECOGNIZE (
            PARTITION BY k
            ORDER BY ts, event_id
            MEASURES MATCH_NUMBER() AS mn,
                     CLASSIFIER() AS last_var,
                     COUNT(A.*) AS n_a,
                     COUNT(B.*) AS n_b,
                     LAST(C.event_id) AS c_id
            ONE ROW PER MATCH
            PATTERN ((A|B)+ C)
            DEFINE A AS A.t = 'a', B AS B.t = 'b', C AS C.t = 'c'
        )
    """)
    rows = sorted(map(tuple, got.select("mn", "last_var", "n_a", "n_b", "c_id")
                      .collect()))
    # match 1: a b a c → 2 a's, 1 b, C=3; match 2: b c → 0 a, 1 b, C=6
    assert rows == [(1, "C", 2, 1, 3), (2, "C", 0, 1, 6)]


def test_match_recognize_times_quantifier(spark):
    env = TableEnvironment(spark)
    _mk_seq(spark, ["e", "e", "e", "e", "x", "e", "e"]).createOrReplaceTempView(
        "mr_times"
    )
    got = env.execute_sql("""
        SELECT * FROM mr_times MATCH_RECOGNIZE (
            PARTITION BY k
            ORDER BY ts, event_id
            MEASURES FIRST(E.event_id) AS first_e, COUNT(E.*) AS n_e
            ONE ROW PER MATCH
            PATTERN (E{2,3})
            DEFINE E AS E.t = 'e'
        )
    """)
    rows = sorted(map(tuple, got.select("first_e", "n_e").collect()))
    # greedy: rows 0-2 (3 e's), then row 3 alone can't reach 2... but rows
    # 3 is a single leftover 'e' → no match; rows 5-6 → one match of 2
    assert rows == [(0, 3), (5, 2)]


def test_match_recognize_all_rows_per_match(spark):
    env = TableEnvironment(spark)
    _mk_seq(spark, ["a", "b", "b", "c", "a", "c"]).createOrReplaceTempView(
        "mr_allrows"
    )
    got = env.execute_sql("""
        SELECT * FROM mr_allrows MATCH_RECOGNIZE (
            PARTITION BY k
            ORDER BY ts, event_id
            MEASURES MATCH_NUMBER() AS mn,
                     CLASSIFIER() AS cls,
                     COUNT(B.*) AS running_b,
                     FIRST(A.event_id) AS a_id
            ALL ROWS PER MATCH
            PATTERN (A B* C)
            DEFINE A AS A.t = 'a', B AS B.t = 'b', C AS C.t = 'c'
        )
    """)
    rows = sorted(
        map(tuple, got.select("event_id", "mn", "cls", "running_b", "a_id")
            .collect())
    )
    # match 1 rows: a(0) b(1) b(2) c(3); match 2 rows: a(4) c(5)
    assert rows == [
        (0, 1, "A", 0, 0),
        (1, 1, "B", 1, 0),
        (2, 1, "B", 2, 0),
        (3, 1, "C", 2, 0),
        (4, 2, "A", 0, 4),
        (5, 2, "C", 0, 4),
    ]


def test_match_recognize_reluctant_quantifier(spark):
    env = TableEnvironment(spark)
    _mk_seq(spark, ["a", "b", "b", "c"]).createOrReplaceTempView("mr_rel")
    got = env.execute_sql("""
        SELECT * FROM mr_rel MATCH_RECOGNIZE (
            PARTITION BY k
            ORDER BY ts, event_id
            MEASURES COUNT(B.*) AS n_b, LAST(X.event_id) AS x_id
            ONE ROW PER MATCH
            PATTERN (A B+? X)
            DEFINE A AS A.t = 'a', B AS B.t = 'b'
        )
    """)
    rows = sorted(map(tuple, got.select("n_b", "x_id").collect()))
    # reluctant B+?: shortest B run that lets X (any row) match → 1 b
    assert rows == [(1, 2)]


def test_after_match_skip_to_last_var_sql(spark):
    """AFTER MATCH SKIP TO LAST <var> parses and resumes scanning at the
    last row of that variable (overlap-capable strategy surface)."""
    import pandas as pd

    from flink_spark.catalog import TableEnvironment

    env = TableEnvironment(spark)
    pdf = pd.DataFrame({
        "k": ["x"] * 5,
        "event_id": [1, 2, 3, 4, 5],
        "etype": ["a", "b", "b", "c", "a"],
        "ts": pd.to_datetime([
            "2024-01-01 00:00:00", "2024-01-01 00:01:00",
            "2024-01-01 00:02:00", "2024-01-01 00:03:00",
            "2024-01-01 00:04:00",
        ]),
    })
    spark.createDataFrame(pdf).createOrReplaceTempView("skipvar_src")
    out = env.execute_sql("""
        SELECT * FROM skipvar_src MATCH_RECOGNIZE (
            PARTITION BY k
            ORDER BY ts
            MEASURES FIRST(A.event_id) AS a_id, LAST(B.event_id) AS last_b,
                     C.event_id AS c_id
            ONE ROW PER MATCH
            AFTER MATCH SKIP TO LAST B
            PATTERN (A B+ C)
            DEFINE A AS A.etype = 'a', B AS B.etype = 'b', C AS C.etype = 'c'
        )
    """).collect()
    assert [(r.a_id, r.last_b, r.c_id) for r in out] == [(1, 3, 4)]


def _script_events(spark, seq):
    """Minute-spaced single-user event script: list of (type, value)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, i, t0 + dt.timedelta(minutes=i), t, float(v))
        for i, (t, v) in enumerate(seq)
    ]
    return spark.createDataFrame(
        rows, "user_id INT, event_id INT, ts TIMESTAMP, event_type STRING, "
              "value DOUBLE"
    )


def test_subset_union_variable_measures(spark):
    """SUBSET U = (A, B): union variable usable in MEASURES aggregations
    (Calcite SqlMatchRecognize subsetList; Flink MatchRecognizeITCase)."""
    env = TableEnvironment(spark)
    _script_events(spark, [
        ("up", 10), ("up", 20), ("down", 5), ("flat", 0),
        ("up", 30), ("down", 7), ("flat", 0),
    ]).createOrReplaceTempView("mr_subset_events")

    got = env.execute_sql("""
        SELECT * FROM mr_subset_events MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES COUNT(U.*) AS n_moves,
                     FIRST(U.value) AS first_move,
                     LAST(U.value) AS last_move,
                     LAST(C.value) AS flat_value
            ONE ROW PER MATCH
            PATTERN (A+ B C)
            SUBSET U = (A, B)
            DEFINE A AS A.event_type = 'up',
                   B AS B.event_type = 'down',
                   C AS C.event_type = 'flat'
        )
    """)
    rows = sorted(map(tuple, got.collect()))
    # match 1: up(10) up(20) down(5) flat → U covers 3 rows, 10..5
    # match 2: up(30) down(7) flat       → U covers 2 rows, 30..7
    assert rows == [(1, 2, 30.0, 7.0, 0.0), (1, 3, 10.0, 5.0, 0.0)]


def test_pattern_exclusion_all_rows(spark):
    """{- B -}: excluded rows are matched (and feed running measures) but
    omitted from ALL ROWS PER MATCH output (SQL:2016 exclusion)."""
    env = TableEnvironment(spark)
    _script_events(spark, [
        ("a", 1), ("b", 2), ("b", 3), ("c", 4), ("a", 5), ("c", 6),
    ]).createOrReplaceTempView("mr_excl_events")

    got = env.execute_sql("""
        SELECT * FROM mr_excl_events MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES MATCH_NUMBER() AS mno, COUNT(B.*) AS n_b
            ALL ROWS PER MATCH
            PATTERN (A {- B* -} C)
            DEFINE A AS A.event_type = 'a',
                   B AS B.event_type = 'b',
                   C AS C.event_type = 'c'
        )
    """)
    rows = sorted(
        (r.event_id, r.mno, r.n_b) for r in got.collect()
    )
    # B rows (ids 1,2) are dropped from output; C's running COUNT(B.*)
    # still saw both of them in match 1
    assert rows == [(0, 1, 0), (3, 1, 2), (4, 2, 0), (5, 2, 0)]


def test_permute_pattern(spark):
    """PATTERN (PERMUTE (A, B)): matches A B or B A (Calcite expands
    PERMUTE to the permutation alternation in declaration order)."""
    env = TableEnvironment(spark)
    _script_events(spark, [
        ("a", 1), ("b", 2), ("x", 0), ("b", 3), ("a", 4), ("x", 0), ("a", 9),
    ]).createOrReplaceTempView("mr_permute_events")

    got = env.execute_sql("""
        SELECT * FROM mr_permute_events MATCH_RECOGNIZE (
            PARTITION BY user_id
            ORDER BY ts, event_id
            MEASURES CLASSIFIER() AS last_var,
                     LAST(A.value) AS a_val,
                     LAST(B.value) AS b_val
            ONE ROW PER MATCH
            PATTERN (PERMUTE (A, B))
            DEFINE A AS A.event_type = 'a',
                   B AS B.event_type = 'b'
        )
    """)
    rows = sorted(map(tuple, got.collect()))
    # (a b) at 0-1 matches as A B; (b a) at 3-4 matches as B A; trailing
    # lone 'a' matches nothing
    assert rows == [(1, "A", 4.0, 3.0), (1, "B", 1.0, 2.0)]


# --- property fuzz vs a regex reference model (r10) ---------------------------

import re as _re

import pytest as _pytest

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    given = None

_QUANTS = ["", "+", "*", "?", "{2}", "{1,2}"]
_MIN1 = {"", "+", "{2}", "{1,2}"}


def _pattern_elems():
    elem = st.tuples(st.sampled_from("ABC"), st.sampled_from(_QUANTS))
    return st.lists(elem, min_size=1, max_size=3).filter(
        lambda es: any(q in _MIN1 for _, q in es)
    )


def _model_matches(s: str, rx: str):
    """SQL-standard MATCH_RECOGNIZE semantics on a symbol string: try a
    greedy leftmost match at each row; on a match, emit and SKIP PAST
    LAST ROW. With mutually-exclusive single-symbol DEFINEs this IS
    Python re's greedy matching, which makes it an independent oracle
    for the NFA in operators/cep.py."""
    out, i, pat = [], 0, _re.compile(rx)
    while i < len(s):
        m = pat.match(s, i)
        if m and m.end() > m.start():
            seg = s[m.start():m.end()]
            out.append((
                m.start(), m.end() - 1,
                seg.count("a"), seg.count("b"), seg.count("c"),
            ))
            i = m.end()
        else:
            i += 1
    return out


if given is not None:

    @given(
        _pattern_elems(),
        st.lists(
            st.text(alphabet="abc", min_size=0, max_size=12),
            min_size=1, max_size=3,
        ),
    )
    @settings(max_examples=15, deadline=None, derandomize=True)
    def test_match_recognize_fuzz_vs_regex_model(spark, elems, seqs):
        """Generative differential check of the whole SQL->NFA stack
        (reference analog: MatchRecognizeITCase breadth): random
        greedy-quantified patterns over mutually-exclusive symbol
        variables, random per-partition symbol sequences, compared
        against Python re's greedy semantics row-for-row."""
        env = TableEnvironment(spark)
        rows = [
            (p, i, ch)
            for p, s in enumerate(seqs)
            for i, ch in enumerate(s)
        ]
        if not rows:
            return
        spark.createDataFrame(
            rows, "p int, ts int, s string"
        ).createOrReplaceTempView("mr_fuzz")

        sql_pat = " ".join(f"{v}{q}" for v, q in elems)
        rx = "".join(f"{v.lower()}{q}" for v, q in elems)
        got = env.execute_sql(f"""
            SELECT * FROM mr_fuzz MATCH_RECOGNIZE (
                PARTITION BY p
                ORDER BY ts
                MEASURES FIRST(U.ts) AS t0, LAST(U.ts) AS t1,
                         COUNT(A.*) AS na, COUNT(B.*) AS nb,
                         COUNT(C.*) AS nc
                ONE ROW PER MATCH
                AFTER MATCH SKIP PAST LAST ROW
                PATTERN ({sql_pat})
                SUBSET U = (A, B, C)
                DEFINE A AS A.s = 'a', B AS B.s = 'b', C AS C.s = 'c'
            )
        """)
        got_rows = sorted(
            (r["p"], r["t0"], r["t1"], r["na"], r["nb"], r["nc"])
            for r in got.collect()
        )
        exp_rows = sorted(
            (p, *m) for p, s in enumerate(seqs) for m in _model_matches(s, rx)
        )
        assert got_rows == exp_rows, (sql_pat, seqs, got_rows, exp_rows)
