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


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s) or pd.api.types.is_bool_dtype(s):
            out[c] = s.astype("float64")  # unify int widths; exact ≤2^53
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
