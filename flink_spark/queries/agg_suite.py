"""Aggregate-function families beyond the core suite (SURVEY §2.4, §2.12):
JSON_OBJECTAGG / JSON_ARRAYAGG, exact percentile / median (continuous and
discrete), COLLECT → MULTISET, table aggregate (UDTAF), and the BITMAP_*
aggregate/scalar family.

Reference: .../runtime/functions/aggregate/ JsonObjectAggFunction,
JsonArrayAggFunction, PercentileAggFunction, CollectAggFunction,
Bitmap*Agg; GroupTableAggFunction.java; scalar Bitmap*.java.

Determinism notes: JSON/collection outputs are serialized in a sorted,
engine-neutral form in BOTH engines (Spark `to_json(sort_array(...))`
versus DuckDB `string_agg(... ORDER BY ...)` building the same compact
JSON text). Percentiles run over integer inputs with binary-exact
fractions (.25/.5/.75), so linear interpolation is bit-identical.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from flink_spark.functions import bitmap as BM
from flink_spark.operators.tableagg import group_table_agg
from flink_spark.queries.registry import query
from flink_spark.sources.tables import load_table


@query(
    "agg_json_objectagg",
    oracle="""
    WITH g AS (SELECT o_orderpriority AS p, o_orderstatus AS s, COUNT(*) AS c
               FROM orders GROUP BY 1, 2)
    SELECT p,
           '{' || string_agg('"' || s || '":' || c, ',' ORDER BY s) || '}'
             AS status_obj,
           '[' || string_agg(CAST(c AS VARCHAR), ',' ORDER BY c, s) || ']'
             AS count_arr
    FROM g GROUP BY p
    """,
)
def agg_json_objectagg(spark, sf_dir):
    """JSON_OBJECTAGG / JSON_ARRAYAGG (reference JsonObjectAggFunction,
    JsonArrayAggFunction): per-priority JSON object of status→count and
    JSON array of counts. Two-level agg: the inner count is a plain
    hash agg, the outer collect is per-group small (|statuses|)."""
    o = load_table(spark, sf_dir, "orders")
    g = o.groupBy(
        F.col("o_orderpriority").alias("p"), F.col("o_orderstatus").alias("s")
    ).agg(F.count("*").alias("c"))
    return g.groupBy("p").agg(
        F.to_json(
            F.map_from_entries(F.sort_array(F.collect_list(F.struct("s", "c"))))
        ).alias("status_obj"),
        F.to_json(F.sort_array(F.collect_list(F.struct("c", "s")))).alias("__raw"),
    ).select(
        "p",
        "status_obj",
        # [{"c":976,...}] → [976,...]: project the counts back out in the
        # same (c, s) sort order the struct sort produced
        F.to_json(
            F.transform(
                F.from_json(F.col("__raw"), "array<struct<c:bigint,s:string>>"),
                lambda x: x["c"],
            )
        ).alias("count_arr"),
    )


@query(
    "agg_percentile_family",
    oracle="""
    SELECT event_type,
           CAST(quantile_cont(CAST(FLOOR(value*100) AS BIGINT), 0.25) AS DOUBLE) AS p25,
           CAST(quantile_cont(CAST(FLOOR(value*100) AS BIGINT), 0.50) AS DOUBLE) AS p50,
           CAST(quantile_cont(CAST(FLOOR(value*100) AS BIGINT), 0.75) AS DOUBLE) AS p75,
           CAST(quantile_disc(CAST(FLOOR(value*100) AS BIGINT), 0.50) AS DOUBLE) AS p50_disc,
           CAST(median(CAST(FLOOR(value*100) AS BIGINT)) AS DOUBLE) AS med
    FROM events GROUP BY event_type
    """,
)
def agg_percentile_family(spark, sf_dir):
    """PERCENTILE / PERCENTILE_DISC / MEDIAN (reference
    PercentileAggFunction.java). Exact percentile is a sort-based agg;
    at scale prefer approx_percentile — the exact variant shuffles full
    groups (documented trade-off, same as Flink's)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "v", F.expr("CAST(FLOOR(value*100) AS BIGINT)")
    )
    return ev.groupBy("event_type").agg(
        F.percentile("v", 0.25).alias("p25"),
        F.percentile("v", 0.50).alias("p50"),
        F.percentile("v", 0.75).alias("p75"),
        F.expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY v) AS DOUBLE)")
        .alias("p50_disc"),
        F.median("v").cast("double").alias("med"),
    )


@query(
    "agg_collect_multiset",
    oracle="""
    WITH g AS (SELECT user_id, event_type AS e, COUNT(*) AS c
               FROM events WHERE user_id <= 200 GROUP BY 1, 2)
    SELECT user_id,
           '{' || string_agg('"' || e || '":' || c, ',' ORDER BY e) || '}'
             AS type_multiset
    FROM g GROUP BY user_id
    """,
)
def agg_collect_multiset(spark, sf_dir):
    """COLLECT → MULTISET (reference CollectAggFunction.java; MULTISET's
    runtime encoding is exactly map<elem,count> — SURVEY §1.2), serialized
    as sorted JSON for engine-neutral comparison."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 200)
    g = ev.groupBy("user_id", F.col("event_type").alias("e")).agg(
        F.count("*").alias("c")
    )
    return g.groupBy("user_id").agg(
        F.to_json(
            F.map_from_entries(F.sort_array(F.collect_list(F.struct("e", "c"))))
        ).alias("type_multiset")
    )


@query(
    "agg_table_agg_top2",
    oracle="""
    SELECT s_nationkey, s_suppkey, s_acctbal, rank_in_nation FROM (
      SELECT s_nationkey, s_suppkey, s_acctbal,
             ROW_NUMBER() OVER (PARTITION BY s_nationkey
                                ORDER BY s_acctbal DESC, s_suppkey) AS rank_in_nation
      FROM supplier) t
    WHERE rank_in_nation <= 2
    """,
)
def agg_table_agg_top2(spark, sf_dir):
    """Table aggregate emitting multiple rows per group — the canonical
    Top2 UDTAF from the reference docs (TableAggregateFunction.java:39-68,
    GroupTableAggFunction.java) — via Arrow `applyInPandas`."""
    su = load_table(spark, sf_dir, "supplier").select(
        "s_nationkey", "s_suppkey", "s_acctbal"
    )

    def top2(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf.sort_values(
            ["s_acctbal", "s_suppkey"], ascending=[False, True]
        ).head(2)
        out = out.assign(rank_in_nation=range(1, len(out) + 1))
        return out

    return group_table_agg(
        su,
        ["s_nationkey"],
        top2,
        "s_nationkey long, s_suppkey long, s_acctbal double, rank_in_nation int",
    )


@query(
    "agg_bitmap_build",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS card,
           MIN(user_id) AS min_id,
           MAX(user_id) AS max_id
    FROM events GROUP BY event_type
    """,
)
def agg_bitmap_build(spark, sf_dir):
    """BITMAP_BUILD + BITMAP_CARDINALITY/MIN/MAX (reference Bitmap*Agg,
    scalar Bitmap*.java). Two-phase build: map-side partial bitmaps,
    OR-merge after a partials-only shuffle (see functions/bitmap.py)."""
    ev = load_table(spark, sf_dir, "events")
    bm = BM.bitmap_build(ev, "event_type", "user_id")
    return bm.select(
        "event_type",
        BM.bitmap_cardinality("bitmap").alias("card"),
        BM.bitmap_min("bitmap").alias("min_id"),
        BM.bitmap_max("bitmap").alias("max_id"),
    )


@query(
    "agg_bitmap_ops",
    oracle="""
    WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
         p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
    SELECT (SELECT COUNT(*) FROM c WHERE user_id IN (SELECT user_id FROM p))
             AS and_card,
           (SELECT COUNT(*) FROM (SELECT user_id FROM c UNION
                                  SELECT user_id FROM p) u) AS or_card,
           (SELECT COUNT(*) FROM c WHERE user_id NOT IN (SELECT user_id FROM p))
             AS andnot_card,
           (SELECT COUNT(*) FROM (SELECT user_id FROM c UNION SELECT user_id
             FROM p) u WHERE u.user_id NOT IN
             (SELECT user_id FROM c WHERE user_id IN (SELECT user_id FROM p)))
             AS xor_card
    """,
)
def agg_bitmap_ops(spark, sf_dir):
    """BITMAP_AND/OR/XOR/ANDNOT set algebra between the click and purchase
    audience bitmaps — the audience-overlap pattern bitmaps exist for:
    the set intersection runs on two small binary blobs, not a join of
    the underlying key sets."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    bm = BM.bitmap_build(ev, "event_type", "user_id")
    c = bm.filter(F.col("event_type") == "click").select(
        F.col("bitmap").alias("cb")
    )
    p = bm.filter(F.col("event_type") == "purchase").select(
        F.col("bitmap").alias("pb")
    )
    both = c.crossJoin(p)
    return both.select(
        BM.bitmap_cardinality(BM.bitmap_and("cb", "pb")).alias("and_card"),
        BM.bitmap_cardinality(BM.bitmap_or("cb", "pb")).alias("or_card"),
        BM.bitmap_cardinality(BM.bitmap_andnot("cb", "pb")).alias("andnot_card"),
        BM.bitmap_cardinality(BM.bitmap_xor("cb", "pb")).alias("xor_card"),
    )


@query(
    "agg_bitmap_merge_family",
    oracle="""
    WITH e AS (SELECT DISTINCT event_type, user_id,
                      CAST(day(ts) % 3 AS INT) AS sub
               FROM events),
         g AS (SELECT event_type, COUNT(DISTINCT sub) AS nsub
               FROM e GROUP BY event_type),
         k AS (SELECT event_type, user_id, COUNT(*) AS nk
               FROM e GROUP BY event_type, user_id)
    SELECT k.event_type,
           CAST(COUNT(*) AS BIGINT) AS or_card,
           CAST(SUM(CASE WHEN k.nk = g.nsub THEN 1 ELSE 0 END) AS BIGINT)
             AS and_card,
           CAST(SUM(CASE WHEN k.nk % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS xor_card,
           CAST(COUNT(*) AS BIGINT) AS build_card,
           TRUE AS rt_ok,
           '{1,2,3}' AS ts
    FROM k JOIN g ON k.event_type = g.event_type
    GROUP BY k.event_type
    """,
)
def agg_bitmap_merge_family(spark, sf_dir):
    """BITMAP_OR/AND/XOR_AGG (+_CARDINALITY_AGG twins),
    BITMAP_BUILD_CARDINALITY_AGG, BITMAP_TO_BYTES→BITMAP_FROM_BYTES
    Roaring roundtrip, BITMAP_TO_STRING (reference Bitmap*AggFunction,
    BitmapToBytesFunction/BitmapFromBytesFunction/BitmapToStringFunction;
    bytes per the public 32-bit RoaringFormatSpec). Per-(type, day-bucket)
    audience bitmaps merge per type: OR = reach, AND = present every
    bucket, XOR = odd-bucket parity — each merge shuffles small binary
    blobs, never the underlying key sets."""
    ev = load_table(spark, sf_dir, "events")
    ev2 = ev.withColumn(
        "g2",
        F.concat_ws(
            "|", "event_type", (F.dayofmonth("ts") % 3).cast("string")
        ),
    )
    per = BM.bitmap_build(ev2, "g2", "user_id", out="bmp").withColumn(
        "event_type", F.substring_index("g2", "|", 1)
    )
    # r13: one fused grouped pass for the OR bitmap + AND/XOR cardinalities.
    # The three separate aggregates re-executed the build lineage (8 parquet
    # scans / 8 MapInPandas in the r12 plan — exchange reuse never fires
    # across applyInPandas branches) and shuffled the partials three times;
    # per-group results are bit-identical (see bitmap_merge_family_agg).
    merged = BM.bitmap_merge_family_agg(
        per, "event_type", "bmp", or_out="orb",
        and_out="and_card", xor_out="xor_card",
    )
    rt = merged.select(
        "event_type",
        BM.bitmap_cardinality("orb").alias("or_card"),
        (
            BM.bitmap_cardinality(
                BM.bitmap_from_bytes(BM.bitmap_to_bytes("orb"))
            )
            == BM.bitmap_cardinality("orb")
        ).alias("rt_ok"),
        "and_card",
        "xor_card",
    )
    bc = BM.bitmap_build_cardinality_agg(
        ev, "event_type", "user_id", "build_card"
    )
    out = rt.join(bc, "event_type")
    return out.withColumn(
        "ts",
        BM.bitmap_to_string(
            BM.bitmap_from_array(F.array(F.lit(3), F.lit(1), F.lit(2)))
        ),
    ).select(
        "event_type", "or_card", "and_card", "xor_card", "build_card",
        "rt_ok", "ts",
    )


@query(
    "agg_group_id",
    oracle="""
    SELECT l_returnflag,
           CAST(0 AS BIGINT) AS gid,
           CAST(0 AS BIGINT) AS gmask,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM lineitem GROUP BY l_returnflag
    UNION ALL
    SELECT CAST(NULL AS VARCHAR), CAST(0 AS BIGINT), CAST(1 AS BIGINT),
           CAST(COUNT(*) AS BIGINT) FROM lineitem
    UNION ALL
    SELECT CAST(NULL AS VARCHAR), CAST(1 AS BIGINT), CAST(1 AS BIGINT),
           CAST(COUNT(*) AS BIGINT) FROM lineitem
    """,
)
def agg_group_id(spark, sf_dir):
    """GROUP_ID() over DUPLICATE grouping sets (reference
    FlinkSqlOperatorTable GROUP_ID, DecomposeGroupingSetsRule.java:369,
    CALCITE-1824): GROUPING SETS ((flag), (), ()) yields the grand-total
    row twice, distinguished by GROUP_ID 0 and 1, while GROUPING_ID
    keeps its native per-round value. Decomposed onto UNION ALL'd
    native grouping-sets aggregates by the dialect (catalog.py
    _rewrite_group_id)."""
    from flink_spark.catalog import TableEnvironment

    env = TableEnvironment(spark)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "__gid_lineitem"
    )
    return env.execute_sql("""
        SELECT l_returnflag,
               GROUP_ID() AS gid,
               CAST(GROUPING_ID(l_returnflag) AS BIGINT) AS gmask,
               COUNT(*) AS cnt
        FROM __gid_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (), ())
    """)


@query(
    "agg_split_distinct",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM events GROUP BY event_type
    """,
)
def agg_split_distinct(spark, sf_dir):
    """Split-distinct aggregation (reference SplitAggregateRule — the
    hot-group COUNT(DISTINCT) remedy): the distinct key is sharded by
    hash bucket so no single state cell holds a hot group's whole
    distinct set; two bounded phases, exact by construction (each value
    lands in exactly one bucket), so the oracle is the plain
    COUNT(DISTINCT). event_type has only a handful of values — exactly
    the skew shape the rule exists for."""
    from flink_spark.operators.splitagg import split_distinct_count

    ev = load_table(spark, sf_dir, "events")
    return split_distinct_count(
        ev, ["event_type"], "user_id", n_buckets=16,
        out_col="n_distinct",
        extra_aggs=[F.sum("__cnt").cast("long").alias("n_rows")],
    )


@query(
    "agg_variance_family",
    oracle="""
    SELECT o_orderstatus,
           round(stddev_pop(o_totalprice), 6) AS sd_pop,
           round(stddev_samp(o_totalprice), 6) AS sd_samp,
           round(var_pop(o_totalprice), 4) AS v_pop,
           round(var_samp(o_totalprice), 4) AS v_samp,
           array_to_string(
             list_sort(ifnull(list(o_orderkey) FILTER (o_orderkey <= 320), [])),
             '|') AS agg_keys
    FROM orders WHERE o_orderkey <= 5000
    GROUP BY o_orderstatus
    """,
)
def agg_variance_family(spark, sf_dir):
    """Statistical aggregate family by NAME (reference
    BuiltInFunctionDefinitions STDDEV_POP/STDDEV_SAMP/VAR_POP/VAR_SAMP +
    ARRAY_AGG; sql_functions.yml audit): two-pass-free native Spark
    aggregates, rounded to absorb the one-ulp summation-order wobble of
    a parallel variance; ARRAY_AGG compared order-insensitively via
    array_sort."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 5000)
    return o.groupBy("o_orderstatus").agg(
        F.round(F.stddev_pop("o_totalprice"), 6).alias("sd_pop"),
        F.round(F.stddev_samp("o_totalprice"), 6).alias("sd_samp"),
        F.round(F.var_pop("o_totalprice"), 4).alias("v_pop"),
        F.round(F.var_samp("o_totalprice"), 4).alias("v_samp"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.array_agg(
                        F.when(F.col("o_orderkey") <= 320, F.col("o_orderkey"))
                    )
                ),
                lambda x: x.cast("string"),
            ),
            "|",
        ).alias("agg_keys"),
    )
