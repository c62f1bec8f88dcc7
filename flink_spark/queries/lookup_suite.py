"""Lookup join coverage (reference StreamExecLookupJoin.java:82,
LookupJoinRunner.java / AsyncLookupJoinRunner.java): probe an external
key-value system per input row, batched and cached.

The external system here is a deterministic in-process KV built from the
customer table (what a real deployment would back with Redis/JDBC/HTTP),
so the enrichment is value-checkable against a plain SQL join."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_spark.operators.joins import lookup_join
from flink_spark.queries.registry import query
from flink_spark.sources.tables import load_table


@query(
    "lookup_join_events",
    oracle="""
    SELECT e.event_id, e.user_id, c.c_name, c.c_mktsegment
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    WHERE e.event_id < 2000
    """,
)
def lookup_join_events(spark, sf_dir):
    """Arrow-batched lookup join: one cache probe per distinct key per
    batch (the Spark analog of Flink's LookupJoinRunner + LRU cache —
    mapInPandas keeps the cache executor-local, so at scale each executor
    pays one RPC per cold key, not one per row)."""
    import pyarrow.parquet as pq

    dim = pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_mktsegment"],
    ).to_pandas()
    kv = {
        int(r.c_custkey): {"c_name": r.c_name, "c_mktsegment": r.c_mktsegment}
        for r in dim.itertuples()
    }

    def build_lookup(keys):
        # stands in for the external probe; receives only cache misses
        return {k: kv.get(int(k), {}) for k in keys}

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000).select(
        "event_id", "user_id"
    )
    return lookup_join(
        ev, build_lookup, key="user_id",
        result_schema="c_name STRING, c_mktsegment STRING",
    )
