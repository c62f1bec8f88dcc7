"""Property-based tests (hypothesis) for the custom join operators —
the §5 analog of the reference's randomized ITCase coverage: the
distributed implementation must agree with a brute-force single-process
model on arbitrary small inputs."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flink_spark.operators.joins import asof_join, interval_join

KEYS = ["a", "b", "c"]

left_rows = st.lists(
    st.tuples(st.sampled_from(KEYS), st.integers(0, 20)),
    min_size=1, max_size=12,
)
# unique (key, ts) on the right: the as-of winner among identical
# versions is unspecified (same as FOR SYSTEM_TIME AS OF)
right_rows = st.lists(
    st.tuples(st.sampled_from(KEYS), st.integers(0, 20), st.integers(-5, 5)),
    min_size=1, max_size=12,
    unique_by=lambda r: (r[0], r[1]),
)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lrows=left_rows, rrows=right_rows)
def test_asof_join_matches_bruteforce(spark, lrows, rrows):
    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lrows)], "k string, lts long, lid long"
    )
    right = spark.createDataFrame(rrows, "k string, rts long, val long")
    got = {
        (r["lid"]): (r["val"], r["rts"])
        for r in asof_join(
            left, right, key="k", left_ts="lts", right_ts="rts"
        ).collect()
    }
    for i, (k, t) in enumerate(lrows):
        cands = [(rt, v) for (rk, rt, v) in rrows if rk == k and rt <= t]
        expected = max(cands)[::-1] if cands else (None, None)
        assert got[i] == expected, (i, k, t, got[i], expected)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lrows=left_rows, rrows=right_rows)
def test_interval_join_matches_bruteforce(spark, lrows, rrows):
    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lrows)],
        "k string, lts long, lid long",
    ).selectExpr("k", "timestamp_seconds(lts) AS lts", "lid")
    right = spark.createDataFrame(
        rrows, "k string, rts long, val long"
    ).selectExpr("k", "timestamp_seconds(rts) AS rts", "val")
    got = sorted(
        (r["lid"], r["val"])
        for r in interval_join(
            left, right, keys=[("k", "k")],
            left_ts="lts", right_ts="rts",
            lower="'-3' SECOND", upper="'2' SECOND",
        ).collect()
    )
    expected = sorted(
        (i, v)
        for i, (k, t) in enumerate(lrows)
        for (rk, rt, v) in rrows
        if rk == k and t - 3 <= rt <= t + 2
    )
    assert got == expected


# ---------------------------------------------------------- avro codec ----

_avro_longs = st.one_of(st.none(), st.integers(-(2**63), 2**63 - 1))
_avro_strings = st.one_of(st.none(), st.text(max_size=40))
_avro_doubles = st.one_of(
    st.none(),
    st.floats(allow_nan=False, width=64),
)
_avro_bools = st.one_of(st.none(), st.booleans())
_avro_bytes = st.one_of(st.none(), st.binary(max_size=32))


@given(
    rows=st.lists(
        st.tuples(_avro_longs, _avro_strings, _avro_doubles, _avro_bools,
                  _avro_bytes),
        max_size=30,
    )
)
@settings(max_examples=200, deadline=None)
def test_avro_binary_roundtrip_property(rows):
    """Arbitrary nullable rows survive the Avro binary encode/decode
    bit-exactly — full 64-bit long range (10-byte zigzag varints),
    signed zeros/denormals, empty strings/bytes, NULL unions."""
    import pandas as pd
    from pyspark.sql import types as T

    from flink_spark.formats.avro import (
        _decode_records,
        _encode_records,
        _encoders,
        _finalize_pdf,
    )

    schema = T.StructType([
        T.StructField("l", T.LongType()),
        T.StructField("s", T.StringType()),
        T.StructField("d", T.DoubleType()),
        T.StructField("b", T.BooleanType()),
        T.StructField("raw", T.BinaryType()),
    ])
    encs = _encoders(schema)
    pdf = pd.DataFrame(rows, columns=["l", "s", "d", "b", "raw"], dtype=object)
    blob, n = _encode_records(pdf, encs)
    assert n == len(rows)
    back = _finalize_pdf(_decode_records(blob, 0, n, encs), encs)
    for i, row in enumerate(rows):
        for j, col in enumerate(["l", "s", "d", "b", "raw"]):
            got = back[col].iloc[i]
            want = row[j]
            if want is None:
                assert got is None or (isinstance(got, float) and got != got)
            elif col == "d":
                import struct as _struct

                assert _struct.pack("<d", got) == _struct.pack("<d", want)
            else:
                assert got == want


@given(n=st.integers(-(2**63), 2**63 - 1))
@settings(max_examples=500, deadline=None)
def test_zigzag_varint_roundtrip(n):
    from flink_spark.formats.avro import _read_long, _write_long

    buf = bytearray()
    _write_long(buf, n)
    got, i = _read_long(bytes(buf), 0)
    assert got == n and i == len(buf)


# -- row-level DML vs DuckDB (the r6-verdict NULL-predicate class) ---------

_dml_rows = st.lists(
    st.tuples(
        st.integers(0, 50),
        st.one_of(st.none(), st.integers(-20, 20)),
        st.one_of(st.none(), st.integers(-20, 20)),
    ),
    min_size=1, max_size=25,
)
_dml_preds = st.sampled_from([
    "v > 5", "v < 0", "v = w", "v <> w", "v + w > 0",
    "v > 5 AND w < 3", "v > 5 OR w < 3", "v IS NULL",
    "v IS NOT NULL AND v > w", "CASE WHEN k % 3 = 0 THEN NULL "
    "ELSE v > 0 END",
])


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_dml_rows, pred=_dml_preds)
def test_delete_update_match_duckdb(spark, rows, pred, tmp_path_factory):
    """Row-level DELETE and UPDATE agree with DuckDB under arbitrary
    NULL-bearing data and predicates that evaluate TRUE/FALSE/NULL —
    survivors, patched values, and rows_affected (the r6 verdict's
    NULL-predicate class, as a property instead of one repro)."""
    import duckdb

    from flink_spark.catalog import TableEnvironment

    env = TableEnvironment(spark)
    root = tmp_path_factory.mktemp("dmlprop")
    env.execute_sql("DROP TABLE IF EXISTS dml_prop")
    env.execute_sql(
        "CREATE TABLE dml_prop (k BIGINT, v BIGINT, w BIGINT) WITH ("
        f"'connector'='filesystem', 'path'='{root}/t', 'format'='parquet')"
    )
    data = [(i, v, w) for i, (_, v, w) in enumerate(rows)]
    spark.createDataFrame(
        data, "k bigint, v bigint, w bigint"
    ).createOrReplaceTempView("__dml_prop_src")
    env.execute_sql("INSERT INTO dml_prop SELECT * FROM __dml_prop_src")

    con = duckdb.connect()
    con.execute("CREATE TABLE t (k BIGINT, v BIGINT, w BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", data)

    # DELETE
    n = env.execute_sql(
        f"DELETE FROM dml_prop WHERE {pred}"
    ).collect()[0].rows_affected
    con.execute(f"DELETE FROM t WHERE {pred}")
    want = {tuple(r) for r in con.execute("SELECT * FROM t").fetchall()}
    got = {(r.k, r.v, r.w) for r in spark.table("dml_prop").collect()}
    assert got == want, (pred, got, want)
    assert n == len(data) - len(want), (pred, n)

    # UPDATE on the survivors with the same predicate family
    env.execute_sql(
        f"UPDATE dml_prop SET w = v + 100 WHERE {pred}"
    )
    con.execute(f"UPDATE t SET w = v + 100 WHERE {pred}")
    want = {tuple(r) for r in con.execute("SELECT * FROM t").fetchall()}
    got = {(r.k, r.v, r.w) for r in spark.table("dml_prop").collect()}
    assert got == want, (pred, got, want)
    env.execute_sql("DROP TABLE IF EXISTS dml_prop")


# -- dialect text-rewrite properties ------------------------------------

_DURATIONS = st.sampled_from(
    ["1h", "36000ms", "2 min", "90s", "1 d", "500", "3 hours"]
)
_SIBLINGS = st.sampled_from(
    ["BROADCAST(d)", "SHUFFLE_HASH(t1)", "MERGE(a, b)",
     "SHUFFLE_REPLICATE_NL(x)", "REPARTITION(8)"]
)


@settings(max_examples=60, deadline=None)
@given(
    pre=st.lists(_SIBLINGS, max_size=2),
    post=st.lists(_SIBLINGS, max_size=2),
    durs=st.lists(_DURATIONS, min_size=1, max_size=3),
)
def test_state_ttl_excision_preserves_siblings(spark, pre, post, durs):
    """For any placement of STATE_TTL among sibling hints, excision keeps
    every sibling (order preserved) and never raises for valid
    durations."""
    from flink_spark.catalog import TableEnvironment

    ttl = "STATE_TTL(" + ", ".join(
        f"'t{i}'='{d}'" for i, d in enumerate(durs)
    ) + ")"
    body = " " + ", ".join(pre + [ttl] + post) + " "
    out = TableEnvironment(spark)._fix_hint_block(body)
    assert "STATE_TTL" not in out.upper()
    if not pre and not post:
        assert out == ""
    else:
        # well-formed wrapped block: the rewriter splices this into the
        # statement where the original markers were already consumed
        assert out.startswith("/*+") and out.endswith("*/"), out
        inner = out.removeprefix("/*+").removesuffix("*/").strip()
        assert not inner.startswith(",") and not inner.endswith(",")
        assert ",," not in inner.replace(" ", "")
        # EVERY sibling survives, duplicates included, in order
        import re as _re

        kept = [h.strip() for h in _re.split(r",(?![^()]*\))", inner)]
        assert kept == pre + post, (body, out)


@settings(max_examples=40, deadline=None)
@given(
    s=st.text(
        alphabet=st.characters(
            whitelist_categories=("Lu", "Ll", "Nd"),
            whitelist_characters=" ()',",
        ),
        max_size=12,
    ),
    n=st.integers(1, 8),
    char_kind=st.booleans(),
)
def test_precision_cast_property(spark, s, n, char_kind):
    """CAST('<arbitrary literal>' AS CHAR/VARCHAR(n)) matches the
    reference pad/trim model (CharVarCharTrimPadCastRule) for any string
    content — including quotes, parens and commas inside the literal,
    which exercise the masked balanced-paren scan."""
    from flink_spark.catalog import TableEnvironment

    env = TableEnvironment(spark)
    lit = s.replace("'", "''")
    ty = "CHAR" if char_kind else "VARCHAR"
    got = env.execute_sql(
        f"SELECT CAST('{lit}' AS {ty}({n})) AS v"
    ).first().v
    exp = s[:n].ljust(n) if char_kind else s[:n]
    assert got == exp, (s, n, ty, got, exp)
