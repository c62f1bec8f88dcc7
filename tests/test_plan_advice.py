"""EXPLAIN PLAN_ADVICE rule engine (reference ExplainDetail#PLAN_ADVICE):
clean plans yield zero advice; each rule fires on a plan constructed to
violate it."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_spark.catalog import TableEnvironment
from flink_spark.plan_advice import advice_df, plan_advice


@pytest.fixture()
def pq(spark, tmp_path):
    p = str(tmp_path / "advice_pq")
    spark.range(1000).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("g"),
        (F.col("id") * 2).alias("v"),
    ).write.parquet(p)
    return p


def test_clean_plan_has_zero_advice(spark, pq):
    df = (
        spark.read.parquet(pq)
        .filter(F.col("k") > 100)
        .groupBy("g")
        .agg(F.sum("v").alias("s"))
    )
    assert plan_advice(df) == []


def test_cartesian_product_flagged(spark, pq):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.read.parquet(pq)
        b = spark.read.parquet(pq).withColumnRenamed("k", "k2")
        rules = [x.rule for x in plan_advice(a.crossJoin(b))]
        assert "cartesian-product" in rules
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_row_python_udf_flagged(spark, pq):
    from pyspark.sql.functions import udf

    plus1 = udf(lambda x: x + 1, "bigint")
    df = spark.read.parquet(pq).select(plus1(F.col("k")).alias("k1"))
    rules = [x.rule for x in plan_advice(df)]
    assert "row-python-udf" in rules
    # the Arrow path is NOT flagged
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("bigint")
    def plus1v(s):
        return s + 1

    assert plan_advice(
        spark.read.parquet(pq).select(plus1v(F.col("k")).alias("k1"))
    ) == []


def test_unpushed_filter_flagged(spark, pq):
    # wrapping the column in arithmetic defeats filter translation —
    # PushedFilters comes back empty and the scan reads everything
    df = spark.read.parquet(pq).filter((F.col("k") + 1) > 100)
    rules = [x.rule for x in plan_advice(df)]
    assert "filter-not-pushed" in rules
    # the directly-pushable form is NOT flagged
    assert plan_advice(spark.read.parquet(pq).filter(F.col("k") > 99)) == []


def test_explain_plan_advice_sql_route(spark, pq):
    env = TableEnvironment(spark)
    spark.read.parquet(pq).createOrReplaceTempView("advice_t")
    out = env.execute_sql(
        "EXPLAIN PLAN_ADVICE SELECT g, SUM(v) AS s FROM advice_t "
        "WHERE k > 100 GROUP BY g"
    )
    assert out.columns == ["rule", "severity", "node", "hint"]
    assert out.count() == 0


def test_explain_estimated_cost(spark, pq):
    """EXPLAIN ESTIMATED_COST (reference ExplainDetail#ESTIMATED_COST):
    per-node Catalyst statistics — sizeInBytes always, rowCount where the
    optimizer can derive it."""
    env = TableEnvironment(spark)
    spark.read.parquet(pq).createOrReplaceTempView("cost_t")
    out = env.execute_sql(
        "EXPLAIN ESTIMATED_COST SELECT g, SUM(v) AS s FROM cost_t GROUP BY g"
    )
    txt = out.first().plan_with_stats
    assert "sizeInBytes" in txt and "Statistics" in txt


def test_ndu_rule_flags_rand_in_stateful_operator(spark, sf_dir):
    """NDU advice (reference NonDeterministicUpdateAnalyzer): rand() in a
    join/aggregate key is flagged; deterministic expressions are not."""
    from pyspark.sql import functions as F

    from flink_spark.plan_advice import plan_advice
    from flink_spark.sources.tables import load_table

    o = load_table(spark, sf_dir, "orders").limit(1000)
    bad = (
        o.withColumn("nd_key", (F.rand(seed=1) * 10).cast("int"))
        .groupBy("nd_key").agg(F.count("*").alias("n"))
    )
    rules = {a.rule for a in plan_advice(bad)}
    assert "non-deterministic-update" in rules

    good = o.groupBy("o_orderstatus").agg(F.count("*").alias("n"))
    assert "non-deterministic-update" not in {
        a.rule for a in plan_advice(good)
    }


def test_topk_with_group_limit_not_flagged(spark, pq):
    """The well-planned per-group top-k (Partial+Final WindowGroupLimit)
    yields zero group-limit advice."""
    from pyspark.sql import Window

    w = Window.partitionBy("g").orderBy(F.desc("v"))
    df = (
        spark.read.parquet(pq)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
    )
    df.collect()  # finalize the AQE plan
    rules = {a.rule for a in plan_advice(df)}
    assert "topk-no-window-group-limit" not in rules
    assert "window-group-limit-no-partial" not in rules


def test_topk_without_group_limit_flagged(spark, pq):
    """Disabling InsertWindowGroupLimit reproduces the bad shape: every
    group's full row set sorts/shuffles before the rank filter."""
    from pyspark.sql import Window

    key = "spark.sql.optimizer.windowGroupLimitThreshold"
    old = spark.conf.get(key)
    spark.conf.set(key, "0")
    try:
        w = Window.partitionBy("g").orderBy(F.desc("v"))
        df = (
            spark.read.parquet(pq)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 3)
        )
        df.collect()
        rules = {a.rule for a in plan_advice(df)}
        assert "topk-no-window-group-limit" in rules
    finally:
        spark.conf.set(key, old)


def test_group_limit_partial_missing_flagged_on_synthetic_plan():
    """The Final-without-Partial shape can't be produced by the Spark
    optimizer directly; pin the rule on a handcrafted plan string."""
    from flink_spark.plan_advice import advise_plan_text

    bad = """Filter (rank#19 <= 3)
+- Window [row_number() windowspecdefinition(g#1L) AS rank#19], [g#1L], [v#2L DESC NULLS LAST]
   +- WindowGroupLimit [g#1L], [v#2L DESC NULLS LAST], row_number(), 3, Final
      +- Sort [g#1L ASC NULLS FIRST], false, 0
         +- Exchange hashpartitioning(g#1L, 4), ENSURE_REQUIREMENTS, [plan_id=1]
            +- FileScan parquet [g#1L,v#2L]"""
    rules = {a.rule for a in advise_plan_text(bad)}
    assert "window-group-limit-no-partial" in rules

    good = """Filter (rank#19 <= 3)
+- Window [row_number() windowspecdefinition(g#1L) AS rank#19], [g#1L], [v#2L DESC NULLS LAST]
   +- WindowGroupLimit [g#1L], [v#2L DESC NULLS LAST], row_number(), 3, Final
      +- Sort [g#1L ASC NULLS FIRST], false, 0
         +- Exchange hashpartitioning(g#1L, 4), ENSURE_REQUIREMENTS, [plan_id=1]
            +- WindowGroupLimit [g#1L], [v#2L DESC NULLS LAST], row_number(), 3, Partial
               +- Sort [g#1L ASC NULLS FIRST], false, 0
                  +- FileScan parquet [g#1L,v#2L]"""
    assert advise_plan_text(good) == []


def test_small_side_join_not_broadcast_flagged(spark, pq, tmp_path):
    """r9 rule (VERDICT r8 #7): an equi-join whose tiny side the planner
    shuffles (forced SHUFFLE_MERGE here) is flagged against the
    Statistics estimate; the same join left to the planner broadcasts
    and is NOT flagged."""
    tiny = str(tmp_path / "tiny_dim")
    spark.range(5).select(
        F.col("id").alias("g"), F.lit("x").alias("nm")
    ).write.parquet(tiny)
    big = spark.read.parquet(pq)
    dim = spark.read.parquet(tiny)

    bad = big.join(dim.hint("shuffle_merge"), "g")
    rules = [x.rule for x in plan_advice(bad)]
    assert "join-small-side-not-broadcast" in rules

    clean = big.join(dim, "g")
    assert [
        x.rule for x in plan_advice(clean)
        if x.rule == "join-small-side-not-broadcast"
    ] == []


def test_small_side_join_rule_ignores_big_sides(spark, pq):
    """Two genuinely big sides under a forced merge join: the estimate is
    above threshold, so the rule stays silent (no false positive)."""
    from flink_spark.plan_advice import join_strategy_advice

    a = spark.read.parquet(pq)
    b = spark.read.parquet(pq).withColumnRenamed("v", "v2")
    df = a.join(b.hint("shuffle_merge"), "g")
    qe = df._jdf.queryExecution()
    # a 1-byte threshold: nothing qualifies as small
    assert join_strategy_advice(
        qe.stringWithStats(), qe.executedPlan().toString(), 1.0
    ) == []


def test_collect_audit_clean():
    """Every driver-side .collect() in flink_spark/ is literal-limit
    bounded or allowlisted with a boundedness justification."""
    from flink_spark.plan_advice import audit_collect_sites

    assert audit_collect_sites() == []


def test_collect_audit_flags_unbounded(tmp_path):
    """A new unbounded collect is flagged; a literal-limit one is not."""
    from flink_spark.plan_advice import audit_collect_sites

    mod = tmp_path / "newop.py"
    mod.write_text(
        "def bad(df):\n"
        "    return df.collect()\n"
        "\n"
        "def ok(df):\n"
        "    return df.limit(10).collect()\n"
    )
    flagged = audit_collect_sites(str(tmp_path))
    assert [(f[0], f[1]) for f in flagged] == [("newop.py", "bad")]


def test_collect_audit_masks_triple_quoted_strings(tmp_path):
    """ADVICE r8: unbalanced brackets inside a triple-quoted docstring
    must not corrupt the statement-window walk — an adjacent statement's
    .limit() must not exempt an unbounded .collect(), and a bounded one
    must not be spuriously flagged."""
    from flink_spark.plan_advice import audit_collect_sites

    mod = tmp_path / "docop.py"
    mod.write_text(
        "def bad(df):\n"
        '    """docstring with unbalanced bracket ) and a paren (\n'
        "    spanning lines ))) .limit(5)\n"
        '    """\n'
        "    bounded = df.limit(3).collect()\n"
        "    return df.collect()\n"
        "\n"
        "def ok(df):\n"
        '    """another ))) unbalanced docstring"""\n'
        "    return df.limit(10).collect()\n"
    )
    flagged = audit_collect_sites(str(tmp_path))
    assert [(f[0], f[1], f[2]) for f in flagged] == [("docop.py", "bad", 6)]
