"""The local mirror of the driver's t2 gate: run every registered query at
sf0.01 on Spark and on DuckDB (oracle SQL), assert exact match."""

from __future__ import annotations

import pytest

from flink_spark.queries.registry import QUERIES
from tests.compare import assert_frames_match, run_oracle

# Queries whose outputs are doubles computed through genuinely different
# float paths (documented per-query) get a small relative tolerance in the
# local gate; everything else must match exactly.
REL_TOL: dict[str, float] = {}


def _params():
    return [pytest.param(name, id=name) for name, e in QUERIES.items() if e.oracle]


@pytest.mark.parametrize("name", _params())
def test_query_matches_oracle(spark, sf_dir, name):
    entry = QUERIES[name]
    sdf = entry.fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    oracle_pdf = run_oracle(entry.oracle, sf_dir)
    assert_frames_match(
        spark_pdf, oracle_pdf, name, float_rel_tol=REL_TOL.get(name, 0.0)
    )


def _rows_only_params():
    # every gated query carries an exact oracle as of round 9; this
    # sentinel keeps the runner alive (instead of an empty-param skip)
    # should a future rows-only query ever be registered
    names = [name for name, e in QUERIES.items() if not e.oracle]
    return [pytest.param(n, id=n) for n in names] or [
        pytest.param(None, id="no_rows_only_queries")
    ]


@pytest.mark.parametrize("name", _rows_only_params())
def test_rows_only_queries_run(spark, sf_dir, name):
    if name is None:
        assert all(e.oracle for e in QUERIES.values())
        return
    entry = QUERIES[name]
    df = entry.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
