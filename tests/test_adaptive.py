"""Plan-level evidence for the natively-claimed scale features (COVERAGE
rows marked 'native'): AQE skew-join splitting and dynamic partition
pruning actually engage on this build — the 100 TB story is not just a
config name in a docstring."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.mark.slow
def test_aqe_splits_skewed_join(spark, tmp_path):
    """One hot key ~50× the others: with thresholds lowered to test
    scale, AQE's OptimizeSkewedJoin must mark the sort-merge join
    skew=true (reference parity: Flink's adaptive skewed join handling /
    FLIP-510 — Spark's AQE is the engine-native equivalent)."""
    # sha2 pad: incompressible payload that must travel THROUGH the
    # shuffle (and be in the join output — column pruning would otherwise
    # shrink the hot partition below any threshold)
    hot = spark.range(200_000).select(
        F.lit(1).alias("k"), F.col("id").alias("v"),
        F.sha2(F.col("id").cast("string"), 256).alias("pad"),
    )
    rest = spark.range(4_000).select(
        (F.col("id") % 40 + 2).alias("k"), F.col("id").alias("v"),
        F.lit("x").alias("pad"),
    )
    left = hot.unionByName(rest)
    right = spark.range(41).select(
        (F.col("id") + 1).alias("k"), F.col("id").alias("r"),
    )
    left.write.mode("overwrite").parquet(str(tmp_path / "l"))
    right.write.mode("overwrite").parquet(str(tmp_path / "r"))
    conf = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256kb",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64kb",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        l = spark.read.parquet(str(tmp_path / "l"))
        r = spark.read.parquet(str(tmp_path / "r"))
        # NOTE: no same-key aggregation downstream — AQE refuses to split
        # a skewed join whose output feeds an operator requiring hash
        # distribution on the join key (the split would break it). The
        # plan is inspected on the SAME DataFrame after an action: AQE
        # only finalizes (and annotates skew) once its stages ran.
        joined = l.join(r, "k").select("k", "pad", "r")
        assert len(joined.collect()) == 200_000 + 4_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_dynamic_partition_pruning_engages(spark, tmp_path):
    """Fact partitioned by key, dim filtered at runtime: the fact scan
    must carry a dynamicpruning subquery (Spark DPP — the engine-native
    form of Flink's BatchExecDynamicFilteringDataCollector)."""
    fact = spark.range(20_000).select(
        (F.col("id") % 50).alias("part_k"), F.col("id").alias("v")
    )
    fact.write.mode("overwrite").partitionBy("part_k").parquet(
        str(tmp_path / "fact")
    )
    dim = spark.range(50).select(
        F.col("id").alias("d_k"),
        F.when(F.col("id") < 5, "keep").otherwise("drop").alias("flag"),
    )
    dim.write.mode("overwrite").parquet(str(tmp_path / "dim"))
    f = spark.read.parquet(str(tmp_path / "fact"))
    d = spark.read.parquet(str(tmp_path / "dim")).filter(F.col("flag") == "keep")
    joined = f.join(d, f.part_k == d.d_k)
    optimized = joined._jdf.queryExecution().optimizedPlan().toString()
    exec_plan = joined._jdf.queryExecution().executedPlan().toString()
    assert ("dynamicpruning" in optimized.lower()
            or "dynamicpruning" in exec_plan.lower()), exec_plan[:2000]
    assert joined.count() == 5 * 400


def test_split_distinct_two_phase_plan_and_values(spark, sf_dir):
    """Split-distinct (reference SplitAggregateRule): values equal the
    plain COUNT(DISTINCT), and the plan shards the distinct key across
    buckets BEFORE the per-group merge — the hot-group state remedy."""
    from pyspark.sql import functions as F

    from flink_spark.operators.splitagg import split_distinct_count
    from flink_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    got = {
        r.event_type: (r.n_distinct, r.n_rows)
        for r in split_distinct_count(
            ev, ["event_type"], "user_id", n_buckets=8,
            extra_aggs=[F.sum("__cnt").cast("long").alias("n_rows")],
        ).collect()
    }
    want = {
        r.event_type: (r.nd, r.nr)
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("nd"),
            F.count("*").alias("nr"),
        )
        .collect()
    }
    assert got == want
    plan = (
        split_distinct_count(ev, ["event_type"], "user_id", n_buckets=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # three key-shuffles: (keys,bkt,user) dedup → (keys,bkt) bucket count
    # → (keys) merge; each with a map-side partial — the sharded phase-1
    # runs BEFORE the per-group merge, so no cell holds a hot group's
    # whole distinct set
    assert plan.count("HashAggregate") >= 4
    assert plan.count("Exchange hashpartitioning") == 3
