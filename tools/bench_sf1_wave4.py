"""sf1 rehearsal, fourth wave (r12): every data-bearing gate the
evidence audit found WITHOUT a measured sf1 ratio — closing the sf1
column of COVERAGE.md's audit table. Two-pass per-query min at
/root/testdata/sf0.1 and /tmp/flink_spark_sf1 in one process (same
JVM/contention), printed as a BASELINE.md-ready markdown table sorted
by ratio (worst first). Queries whose inputs are fixed-size (DDL
round-trips, VALUES, generated micro-fixtures) are deliberately NOT
here — they are marked sf1-n/a in the audit manifest instead.

Usage: python tools/bench_sf1_wave4.py [names...]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

WAVE4 = [
    # joins
    "join_theta_band", "join_left_semi", "join_left_anti",
    "join_null_aware_anti", "asof_join_events",
    "temporal_table_function_sql", "lookup_join_events",
    "async_lookup_join_events", "async_calc_enrich",
    # streaming joins / sinks
    "stream_upsert_materialize", "stream_multiway_join",
    "window_join_events", "stream_window_join", "session_window_join",
    "stream_session_window_join", "stream_static_lookup_join",
    # aggs
    "agg_stddev_var_exact", "agg_variance_family", "agg_min_max_by",
    "agg_listagg", "agg_percentile_family", "agg_json_objectagg",
    "agg_collect_multiset", "agg_approx_count_distinct",
    "agg_table_agg_top2",
    # windows
    "window_tumble_legacy_sql", "window_session_legacy_sql",
    "window_count_tumble", "window_tumble_offset",
    "window_time_evictor", "window_count_evictor",
    "window_delta_evictor", "window_topn", "window_dedup",
    "stream_window_topn", "stream_window_dedup",
    # over windows
    "over_running_rows_frame", "over_sliding_rows_frame",
    "over_range_interval_frame", "over_rank_suite",
    "over_ntile_cume_percent", "over_lead_lag_first_last",
    "stream_over_rows", "stream_over_rows_bounded",
    "stream_over_range_bounded",
    # rank / dedup / changelog
    "topn_per_group", "lateral_topk_per_nation",
    "topn_variable_rank_range", "stream_changelog_normalize",
    "changelog_from_changelog", "changelog_to_changelog",
    "stream_drop_update_before",
    # sort / set ops / unnest / ptf
    "sort_limit_offset", "stream_temporal_sort",
    "stream_temporal_sort_ttl", "set_union_distinct", "set_intersect",
    "set_intersect_all", "set_except_all", "set_except_distinct",
    "unnest_words", "unnest_with_ordinality", "ptf_event_gaps",
    # CEP / MATCH_RECOGNIZE
    "cep_browse_then_buy", "cep_click_purchase_adjacent",
    "cep_error_burst", "cep_abandoned_click",
    "sql_match_all_rows_pairs", "sql_match_subset_union",
    # streaming machinery
    "stream_current_watermark", "stream_state_reader",
    "stream_coprocess_threshold",
    # LLM pack stragglers
    "stream_ivf_ingest", "stream_dedup_first_tws", "llm_simhash_pairs",
    "llm_ngram_jaccard_pairs", "llm_cosine_neardup_pairs",
    "pipe_kmeans_clusters", "pipe_semantic_neardup",
    "pipe_incremental_dedup",
    # data-bearing connector/DDL gates (events/orders-backed)
    "format_protobuf_roundtrip", "format_sequence_file_roundtrip",
    "format_compressed_write", "format_avro_confluent_roundtrip",
    "ddl_upsert_sink", "join_hints_gate", "hint_state_ttl_gate",
    "ddl_watermark_strategies",
]


def main() -> None:
    names = sys.argv[1:] or WAVE4
    sf01, sf1 = "/root/testdata/sf0.1", "/tmp/flink_spark_sf1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from flink_spark.queries.registry import QUERIES
    from flink_spark.session import get_spark

    spark = get_spark("flink_spark-bench-sf1-w4", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["tpch_q1_pricing_summary"].fn(spark, sf01).collect()  # warm

    def run(name: str, sf_dir: str) -> float | None:
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            try:
                QUERIES[name].fn(spark, sf_dir).collect()
            except Exception as exc:  # keep sweeping
                print(f"ERR {name} @ {sf_dir}: {exc}", file=sys.stderr)
                return None
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best

    rows = []
    for name in names:
        if name not in QUERIES:
            print(f"SKIP unknown {name}", file=sys.stderr)
            continue
        a = run(name, sf01)
        b = run(name, sf1) if a is not None else None
        if a is None or b is None:
            continue
        rows.append((b / a, name, a, b))
        print(f"  {name}: {a:.2f} -> {b:.2f} ({b/a:.2f}x)",
              file=sys.stderr, flush=True)

    rows.sort(reverse=True)
    print("| query | sf0.1 | sf1 | ratio |")
    print("|---|---|---|---|")
    for r, name, a, b in rows:
        print(f"| {name} | {a:.2f} s | {b:.2f} s | {r:.2f}× |")
    flagged = [name for r, name, _, _ in rows if r > 3.0]
    print()
    print(f"{len(rows)} measured; >3x flagged: {flagged or 'none'}")


if __name__ == "__main__":
    main()
