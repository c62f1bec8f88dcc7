"""Equivalence pins for the r13 plan-construction rewrites: the one-
expression spellings must be BIT-identical to the per-element Column
forms they replaced (same fold order, same literals, same tie-breaks) —
the same discipline as the r12 PQ-codec equivalence test."""

from __future__ import annotations

from pyspark.sql import functions as F


def _old_ranked(vec_col, centroids):
    """The pre-r13 per-element construction of the (dist, idx) ranking
    (clustering._dist_sq + sort_array(array(struct...))), rebuilt inline
    so the test keeps failing if the new spelling ever drifts."""
    def dist_sq(c):
        arr = F.array(*[F.lit(float(v)) for v in c])
        return F.aggregate(
            F.zip_with(vec_col, arr, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    return F.sort_array(
        F.array(*[
            F.struct(dist_sq(c).alias("d"), F.lit(i).alias("i"))
            for i, c in enumerate(centroids)
        ])
    )


def test_ranked_cells_sql_matches_lit_form(spark):
    from flink_spark.llm.clustering import _ranked_cells_sql

    # centroids with awkward doubles: repr round-trip must reproduce them
    cents = [
        [0.1, -0.2, 1e-9, 123456.789],
        [-6.58035e-4, 0.0, -0.0, 7.25],
        [1.0 / 3.0, 2.0 / 7.0, -1.0 / 9.0, 0.1 + 0.2],
    ]
    rows = [
        (1, [0.1, -0.2, 0.0, 123456.7]),
        (2, [0.0, 0.0, 0.0, 0.0]),
        (3, [1.0 / 3.0, 2.0 / 7.0, -1.0 / 9.0, 0.30000000000000004]),
        (4, [-1.0, 2.0, -3.0, 4.0]),
        (5, [0.1, -0.2, 1e-9, 123456.789]),  # exact centroid hit (d=0)
    ]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    new = df.select(
        "id", F.expr(_ranked_cells_sql("v", cents)).alias("r")
    ).collect()
    old = df.select("id", _old_ranked(F.col("v"), cents).alias("r")).collect()
    assert sorted(map(tuple, new)) == sorted(map(tuple, old))


def test_cc_sql_round_matches_dataframe_round(spark):
    """One connected-components round via the r13 SQL statement equals
    the old labels∪propagate∪jump DataFrame chain, row for row."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2), (10, 11), (11, 10), (3, 4), (4, 3)],
        "u long, v long",
    )
    labels = (
        edges.select(F.col("u").alias("node")).distinct()
        .withColumn("comp", F.col("node"))
    )
    # old chain
    prop = (
        edges.join(labels.select(F.col("node").alias("u"), "comp"), "u")
        .select(F.col("v").alias("node"), "comp")
    )
    jump = (
        labels.alias("l1")
        .join(
            labels.select(
                F.col("node").alias("comp"), F.col("comp").alias("comp2")
            ).alias("l2"),
            "comp",
        )
        .select(F.col("node"), F.col("comp2").alias("comp"))
    )
    old = (
        labels.union(prop).union(jump)
        .groupBy("node").agg(F.min("comp").alias("comp"))
    ).collect()
    # new SQL round (same text as llm.dedup.connected_components builds)
    edges.createOrReplaceTempView("__eq_edges")
    labels.createOrReplaceTempView("__eq_labels")
    new = spark.sql("""
        SELECT node, MIN(comp) AS comp FROM (
          SELECT node, comp FROM __eq_labels
          UNION ALL
          SELECT e.v AS node, l.comp FROM __eq_edges e
          JOIN __eq_labels l ON e.u = l.node
          UNION ALL
          SELECT l1.node, l2.comp FROM __eq_labels l1
          JOIN __eq_labels l2 ON l1.comp = l2.node
        ) GROUP BY node
    """).collect()
    assert sorted(map(tuple, new)) == sorted(map(tuple, old))
    spark.catalog.dropTempView("__eq_edges")
    spark.catalog.dropTempView("__eq_labels")


def test_expr_memo_columns_reusable_across_frames(spark):
    """Memoized Column trees must resolve correctly against DIFFERENT
    source DataFrames (they are unresolved-attribute wrappers, shared by
    every plan that embeds them)."""
    from flink_spark.llm.dedup import minhash_signatures_wide

    d1 = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    d2 = spark.createDataFrame(
        [(2, "one two three four five six")], "id long, body string"
    )
    w1 = minhash_signatures_wide(d1, "text", "doc_id").collect()
    w2 = minhash_signatures_wide(d2, "body", "id").collect()  # other names
    assert len(w1) == 1 and len(w2) == 1
    assert w1[0]["doc_id"] == 1 and w2[0]["id"] == 2
    # K agg columns present on both
    assert sum(c.startswith("mh_") for c in w1[0].asDict()) == 32
    assert sum(c.startswith("mh_") for c in w2[0].asDict()) == 32
