"""JSON_TABLE (SQL:2016; the reference's JSON shredding table function):
Python API + SQL FROM-clause rewrite."""

from __future__ import annotations

import pytest

from flink_spark.catalog import TableEnvironment
from flink_spark.functions.jsontable import json_table, parse_columns


ROWS = [
    (1, '{"items":[{"n":"a","q":1},{"n":"b","q":2}]}'),
    (2, '{"items":[{"n":"c","q":5}]}'),
    (3, '{"items":[]}'),
    (4, None),
]


def _src(spark):
    return spark.createDataFrame(ROWS, "id bigint, j string")


def test_json_table_python_api(spark):
    out = json_table(
        _src(spark), "j", "$.items[*]",
        "n STRING PATH '$.n', q INT PATH '$.q', idx FOR ORDINALITY",
    )
    got = sorted((r.id, r.idx, r.n, r.q) for r in out.collect())
    assert got == [(1, 1, "a", 1), (1, 2, "b", 2), (2, 1, "c", 5)]


def test_json_table_outer_keeps_empty(spark):
    out = json_table(
        _src(spark), "j", "$.items[*]",
        "n STRING PATH '$.n'", outer=True,
    )
    got = sorted(
        (r.id, r.n) for r in out.collect()
    )
    # empty array and NULL json keep their base row, null-padded
    assert got == [(1, "a"), (1, "b"), (2, "c"), (3, None), (4, None)]


def test_json_table_root_array_and_missing_fields(spark):
    df = spark.createDataFrame(
        [(1, '[{"x":10},{"y":2}]')], "id bigint, j string"
    )
    out = json_table(df, "j", "$", "x INT PATH '$.x', y INT PATH '$.y'")
    got = sorted(
        ((r.x, r.y) for r in out.collect()),
        key=lambda t: (t[0] is None, t),
    )
    assert got == [(10, None), (None, 2)]  # NULL ON ERROR default


def test_json_table_sql_rewrite(spark):
    env = TableEnvironment(spark)
    _src(spark).createOrReplaceTempView("jt_src")
    out = env.execute_sql("""
        SELECT jt.id, jt.idx, jt.n, jt.q
        FROM jt_src, JSON_TABLE(j, '$.items[*]' COLUMNS (
            n STRING PATH '$.n',
            q INT PATH '$.q',
            idx FOR ORDINALITY
        )) AS jt
        WHERE jt.q > 1
    """)
    got = sorted((r.id, r.idx, r.n, r.q) for r in out.collect())
    assert got == [(1, 2, "b", 2), (2, 1, "c", 5)]
    # a quoted JSON_TABLE call is data, not structure
    lit = env.execute_sql(
        "SELECT 'JSON_TABLE(j, COLUMNS (n STRING))' AS s FROM jt_src WHERE id = 1"
    )
    assert lit.first().s == "JSON_TABLE(j, COLUMNS (n STRING))"


def test_json_table_errors(spark):
    with pytest.raises(ValueError, match="single-level"):
        parse_columns("n STRING PATH '$.a.b'")
    with pytest.raises(ValueError, match="row path"):
        json_table(_src(spark), "j", "$..bad", "n STRING PATH '$.n'")
    with pytest.raises(ValueError, match="cannot parse"):
        parse_columns("just_a_name")
