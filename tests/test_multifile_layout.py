"""Layout independence: a table split across many parquet part-files (the
100 TB-representative layout bench.py also measures) must produce exactly
the same results as the single-file layout — batch scans, streaming file
sources (symlink fan-in), and chunked streams all resolve directories."""

from __future__ import annotations

import pytest

from compare import assert_frames_match, run_oracle
from flink_spark.queries.registry import QUERIES

# a slice across operator families: batch agg/join, streaming window,
# dedup pipeline, inventory two-fact — plus every ORDER-SENSITIVE
# streaming file-source query (dedup/sort/CEP/changelog/delta-join/
# watermark operators), where a multifile layout would surface any
# mtime-tie or listing-order nondeterminism in the chunked sources
SAMPLE = [
    "tpch_q1_pricing_summary",
    "tpch_q18_large_volume_customer",
    "stream_tumble_agg",
    "llm_dedup_exact",
    "tpcds_q72_two_fact_correlation",
    "stream_dedup_first",
    "stream_dedup_first_ttl",
    "stream_temporal_sort",
    "stream_late_side_output",
    "stream_cep_timeout",
    "stream_changelog_normalize",
    "stream_topn_changelog",
    "stream_delta_join",
    "stream_drop_update_before",
    "cdc_debezium_materialize",
    "hybrid_source_backfill",
    "stream_state_reader",
]


@pytest.fixture(scope="module")
def mf_dir(sf_dir):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from bench import multifile_layout

    return multifile_layout(sf_dir, n_files=7)


@pytest.mark.parametrize("name", SAMPLE)
def test_multifile_matches_oracle(spark, sf_dir, mf_dir, name):
    q = QUERIES[name]
    got = q.fn(spark, mf_dir).toPandas()
    want = run_oracle(q.oracle, sf_dir)  # oracle reads the original layout
    assert_frames_match(got, want, f"{name}@multifile")
