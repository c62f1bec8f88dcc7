"""Spark-vs-DuckDB comparison harness mirroring the driver's t2 gate:
row-count + schema-shape + order-insensitive value match. Stricter than the
driver where possible: exact equality (we engineer queries to be
bit-deterministic across engines; see flink_spark/queries/util.py)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duck_connection(sf_dir)
    try:
        return con.execute(sql).fetch_df()
    finally:
        con.close()


def _dtype_class(s: pd.Series) -> str:
    """Coarse dtype class used for the strictness gate. The driver's value
    hash is format-sensitive (int 12 vs float 12.0 hash differently), so the
    local gate must treat an int-vs-float pairing as a failure rather than
    silently coercing both to float64 (the r4 blind spot: DuckDB HUGEINT
    SUM/SUM OVER reaches pandas as float64 while Spark emits int64)."""
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    return "other"


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if s.dtype == object and len(s):
            # The driver's canonicalizer sort_values() crashes on unhashable
            # cells (numpy.ndarray from Spark/DuckDB list columns, dicts from
            # maps/structs): the r5 fn_array_suite2 red row. Fail the local
            # gate on any non-scalar cell so the class can't ship again —
            # gated queries must render arrays/maps to strings (ARRAY_JOIN /
            # array_to_string) on both engines.
            for v in s:
                if v is not None and not isinstance(
                    v, (str, bytes, int, float, bool)
                ) and not pd.api.types.is_scalar(v):
                    raise AssertionError(
                        f"non-scalar cell in column {c!r} ({type(v).__name__}):"
                        " driver canonicalizer cannot hash/sort this —"
                        " stringify arrays/maps in both query and oracle"
                    )
        if pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64")
        elif pd.api.types.is_bool_dtype(s):
            out[c] = s.astype("bool")
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("int64")  # unify widths, stay integer
        else:
            out[c] = s.astype(str)
    norm = pd.DataFrame(out)
    return norm.sort_values(by=list(norm.columns), kind="mergesort").reset_index(drop=True)


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str,
                        float_rel_tol: float = 0.0):
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} vs oracle {len(oracle_pdf)}"
    )
    a, b = _normalize(spark_pdf), _normalize(oracle_pdf)
    assert list(a.columns) == list(b.columns), (
        f"{name}: columns {list(a.columns)} vs {list(b.columns)}"
    )
    # Dtype-class strictness: the driver hash is format-sensitive, so an
    # int column on one side paired with a float column on the other is a
    # failure here even when every value is numerically equal. Exception:
    # a float column whose partner is int is tolerated only when the float
    # side actually contains NaN (pandas' only representation for NULL in
    # an integer column) — a genuine NULL would then mismatch value-wise.
    sa_cls = {c: _dtype_class(spark_pdf[c]) for c in spark_pdf.columns}
    sb_cls = {c: _dtype_class(oracle_pdf[c]) for c in oracle_pdf.columns}
    for c in a.columns:
        ca, cb = sa_cls.get(c), sb_cls.get(c)
        if ca == cb:
            continue
        pair = {ca, cb}
        if pair == {"int", "float"}:
            f_side = spark_pdf[c] if ca == "float" else oracle_pdf[c]
            if f_side.isna().any():
                continue
            raise AssertionError(
                f"{name}: column {c} dtype-class mismatch spark={ca} "
                f"oracle={cb} (driver hash is format-sensitive: 12 vs 12.0)"
            )
        raise AssertionError(
            f"{name}: column {c} dtype-class mismatch spark={ca} oracle={cb}"
        )
    for c in a.columns:
        sa, sb = a[c], b[c]
        if pd.api.types.is_float_dtype(sa):
            mismatch = ~(
                (sa.isna() & sb.isna())
                | (sa == sb)
                | _close(sa, sb, float_rel_tol)
            )
        else:
            mismatch = ~((sa.isna() & sb.isna()) | (sa == sb))
        if mismatch.any():
            i = mismatch.idxmax()
            raise AssertionError(
                f"{name}: column {c} differs at row {i}: "
                f"spark={sa[i]!r} oracle={sb[i]!r} "
                f"({int(mismatch.sum())}/{len(sa)} rows differ)"
            )


def _close(sa: pd.Series, sb: pd.Series, rel_tol: float) -> pd.Series:
    if rel_tol <= 0:
        return sa != sa  # all False
    return (sa - sb).abs() <= rel_tol * sb.abs().clip(lower=1e-300)


def is_finite_number(x) -> bool:
    try:
        return math.isfinite(float(x))
    except Exception:
        return False
