"""Registry plumbing for the driver-facing queries()/oracle_sql() contract."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QueryEntry:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB-compatible ANSI SQL, or None → rows-only check
    doc: str = ""


QUERIES: dict[str, QueryEntry] = {}


def query(name: str, oracle: str | None = None):
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def deco(fn):
        QUERIES[name] = QueryEntry(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def get_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: e.fn for n, e in QUERIES.items()}


def get_oracles() -> dict[str, str]:
    return {n: e.oracle for n, e in QUERIES.items() if e.oracle is not None}
