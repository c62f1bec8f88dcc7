"""Scalar function coverage, part 2 — the §2.12 gap list beyond the core
families: SPLIT_INDEX / ELT / INITCAP / OVERLAY / FORMAT, regexp family
(COUNT/SUBSTR/EXTRACT_ALL), base64/hex codecs, higher-order array and map
functions, JSON accessors, and the extended temporal constructors.

Reference catalog: BuiltInFunctionDefinitions.java (~260 definitions);
runtime impls .../runtime/functions/scalar/ and SqlFunctionUtils.java.
Every function here is a JVM expression (whole-stage codegen) — no UDFs —
and each query pins the exact cross-engine semantics with a DuckDB oracle
(order-dependent collection results are sorted; maps exploded to entries).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_spark.queries.registry import query
from flink_spark.sources.tables import load_table


@query(
    "fn_string_suite2",
    oracle="""
    SELECT doc_id,
           string_split(text, ' ')[2] AS split_idx1,
           ['alpha','beta','gamma'][(CAST(doc_id % 3 AS INT)) + 1] AS elt_pick,
           array_to_string(
             list_transform(string_split(lang, ''),
                            x -> CASE WHEN x = lang[1:1] THEN upper(x) ELSE x END),
             '') AS initcapish,
           substr(source, 1, 3) || 'XX' || substr(source, 6) AS overlayed,
           printf('%s-%04d', lang, CAST(doc_id AS INT)) AS formatted,
           to_base64(encode(lang)) AS b64,
           hex(encode(source)) AS hexed,
           left(text, 5) AS l5,
           right(source, 2) AS r2,
           levenshtein(lang, 'en') AS lev_en
    FROM documents WHERE doc_id < 200
    """,
)
def fn_string_suite2(spark, sf_dir):
    """SPLIT_INDEX / ELT / INITCAP-on-first-char / OVERLAY / FORMAT /
    TO_BASE64 / HEX / LEFT / RIGHT / LEVENSHTEIN (reference
    BuiltInFunctionDefinitions string family; SqlFunctionUtils.java)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        F.split(F.col("text"), " ")[1].alias("split_idx1"),
        F.expr(
            "elt(CAST(doc_id % 3 AS INT) + 1, 'alpha', 'beta', 'gamma')"
        ).alias("elt_pick"),
        F.initcap(F.col("lang")).alias("initcapish"),
        F.overlay(F.col("source"), F.lit("XX"), 4, 2).alias("overlayed"),
        F.format_string("%s-%04d", F.col("lang"), F.col("doc_id").cast("int")).alias(
            "formatted"
        ),
        F.base64(F.encode(F.col("lang"), "UTF-8")).alias("b64"),
        F.hex(F.encode(F.col("source"), "UTF-8")).alias("hexed"),
        F.expr("left(text, 5)").alias("l5"),
        F.expr("right(source, 2)").alias("r2"),
        F.levenshtein(F.col("lang"), F.lit("en")).alias("lev_en"),
    )


@query(
    "fn_regexp_suite",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, 'table')) AS n_table,
           regexp_extract(text, '[a-z]+a[a-z]*') AS first_a_word,
           len(regexp_extract_all(text, '\\b\\w{5}\\b')) AS n_5letter,
           regexp_matches(text, 'spark.*window|window.*spark') AS has_both,
           regexp_replace(text, '\\bvalue\\b', 'VAL', 'g') LIKE '%VAL%' AS replaced
    FROM documents WHERE doc_id < 200
    """,
)
def fn_regexp_suite(spark, sf_dir):
    """REGEXP_COUNT / REGEXP_SUBSTR / REGEXP_EXTRACT_ALL / REGEXP (rlike) —
    reference regexp family (ScalarOperatorGens / StringCallGen)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        F.size(F.expr("regexp_extract_all(text, 'table', 0)")).alias("n_table"),
        F.regexp_extract(F.col("text"), r"[a-z]+a[a-z]*", 0).alias("first_a_word"),
        F.size(F.expr(r"regexp_extract_all(text, '\\b\\w{5}\\b', 0)")).alias(
            "n_5letter"
        ),
        F.col("text").rlike("spark.*window|window.*spark").alias("has_both"),
        F.regexp_replace(F.col("text"), r"\bvalue\b", "VAL")
        .like("%VAL%")
        .alias("replaced"),
    )


@query(
    "fn_array_suite2",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
               WHERE doc_id < 100)
    SELECT doc_id,
           array_to_string(list_sort(list_distinct(ws[1:8] || ws[5:12])), '|')
             AS union_sorted,
           array_to_string(list_sort(list_filter(list_distinct(ws[1:8]),
                 x -> NOT list_contains(ws[5:12], x))), '|') AS except_sorted,
           array_to_string(list_sort(list_filter(list_distinct(ws[1:8]),
                 x -> list_contains(ws[5:12], x))), '|') AS intersect_sorted,
           array_to_string(list_transform(ws[1:5], x -> upper(x)), '|') AS upper5,
           array_to_string(list_filter(ws[1:10], x -> length(x) > 4), '|')
             AS long_words,
           len(list_filter(ws, x -> x = 'table')) > 0 AS has_table,
           CAST(list_aggregate(list_transform(ws, x -> length(x)), 'sum') AS BIGINT) AS total_len,
           array_to_string(flatten([ws[1:2], ws[3:4]]), '|') AS flat,
           array_to_string(ws[1:2] || ['pad', 'pad'], '|') AS padded
    FROM t
    """,
)
def fn_array_suite2(spark, sf_dir):
    """Higher-order array functions: UNION/EXCEPT/INTERSECT (sorted for
    cross-engine order stability), TRANSFORM, FILTER, EXISTS, AGGREGATE,
    FLATTEN, resize/pad (reference Array*.java scalar impls; SURVEY §2.12
    array family)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    t = d.select("doc_id", F.split(F.col("text"), " ").alias("ws"))
    a = F.slice(F.col("ws"), 1, 8)
    b = F.slice(F.col("ws"), 5, 8)
    # Array results are rendered via ARRAY_JOIN on both engines: the
    # driver's canonicalizer sorts raw column values, and array-typed
    # cells (numpy.ndarray) are unhashable there — scalar strings keep
    # the higher-order-function exercise while staying gate-safe.
    return t.select(
        "doc_id",
        F.array_join(F.array_sort(F.array_union(a, b)), "|").alias("union_sorted"),
        F.array_join(F.array_sort(F.array_except(a, b)), "|").alias("except_sorted"),
        F.array_join(F.array_sort(F.array_intersect(a, b)), "|").alias(
            "intersect_sorted"
        ),
        F.array_join(
            F.transform(F.slice(F.col("ws"), 1, 5), lambda x: F.upper(x)), "|"
        ).alias("upper5"),
        F.array_join(
            F.filter(F.slice(F.col("ws"), 1, 10), lambda x: F.length(x) > 4), "|"
        ).alias("long_words"),
        F.exists(F.col("ws"), lambda x: x == "table").alias("has_table"),
        F.aggregate(
            F.transform(F.col("ws"), lambda x: F.length(x)),
            F.lit(0),
            lambda acc, v: acc + v,
        ).alias("total_len"),
        F.array_join(
            F.flatten(
                F.array(F.slice(F.col("ws"), 1, 2), F.slice(F.col("ws"), 3, 2))
            ),
            "|",
        ).alias("flat"),
        F.array_join(
            F.concat(
                F.slice(F.col("ws"), 1, 2),
                F.array_repeat(F.lit("pad"), 2),
            ),
            "|",
        ).alias("padded"),
    )


@query(
    "fn_map_suite2",
    oracle="""
    WITH t AS (SELECT doc_id, lang, source, n_chars FROM documents
               WHERE doc_id < 100),
    m AS (SELECT doc_id,
                 MAP {'lang': lang, 'source': source} AS meta,
                 MAP {'chars': n_chars, 'id': doc_id} AS nums
          FROM t)
    SELECT doc_id,
           meta['lang'][1] AS get_lang,
           array_to_string(list_sort(map_keys(map_concat(meta, MAP {'extra': 'x'}))), '|') AS keys_sorted,
           cardinality(nums) AS n_entries,
           nums['chars'][1] + nums['id'][1] AS summed
    FROM m
    """,
)
def fn_map_suite2(spark, sf_dir):
    """Map constructors + MAP_UNION/KEYS/CARDINALITY/element access
    (reference Map*.java scalar impls)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    meta = F.create_map(
        F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
    )
    nums = F.create_map(
        F.lit("chars"), F.col("n_chars"), F.lit("id"), F.col("doc_id")
    )
    return d.select(
        "doc_id",
        meta["lang"].alias("get_lang"),
        F.array_join(
            F.array_sort(
                F.map_keys(
                    F.map_concat(meta, F.create_map(F.lit("extra"), F.lit("x")))
                )
            ),
            "|",
        ).alias("keys_sorted"),
        F.size(nums).alias("n_entries"),
        (nums["chars"] + nums["id"]).alias("summed"),
    )


@query(
    "fn_json_suite2",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
           json_array_length('[1,2,3]') AS arr_len,
           json_valid(props) AS is_json,
           json_extract_string('{"a": {"b": "deep"}}', '$.a.b') AS deep
    FROM events WHERE event_id < 500
    """,
)
def fn_json_suite2(spark, sf_dir):
    """JSON accessor family: JSON_VALUE/EXISTS paths, IS_JSON,
    JSON_ARRAY_LENGTH (reference SqlJsonUtils.java; JsonFunctionsITCase)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    return ev.select(
        "event_id",
        F.get_json_object(F.col("props"), "$.k").cast("bigint").alias("k_val"),
        F.json_array_length(F.lit("[1,2,3]")).alias("arr_len"),
        F.expr("try_parse_json(props) IS NOT NULL").alias("is_json"),
        F.get_json_object(F.lit('{"a": {"b": "deep"}}'), "$.a.b").alias("deep"),
    )


@query(
    "fn_datetime_suite2",
    oracle="""
    SELECT event_id,
           make_date(2024, CAST(event_id % 12 AS INT) + 1, 15)::TIMESTAMP AS md,
           ts + INTERVAL 3 MONTH AS plus3m,
           date_trunc('month', ts) AS mon,
           dayname(ts) AS dname,
           isodow(ts) - 1 AS wkday,
           make_timestamp(1700000000000000) AS from_unix,
           greatest(ts, TIMESTAMP '1997-06-01') AS ts_clamped
    FROM events WHERE event_id < 500
    """,
)
def fn_datetime_suite2(spark, sf_dir):
    """Temporal constructors/arithmetic part 2: MAKE_DATE, month interval
    addition (end-of-month clamping matches), TRUNC-to-month, DAYNAME,
    WEEKDAY, FROM_UNIXTIME (reference temporal family, SURVEY §2.12)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    return ev.select(
        "event_id",
        F.make_date(
            F.lit(2024), (F.col("event_id") % 12).cast("int") + 1, F.lit(15)
        ).cast("timestamp_ntz").alias("md"),
        F.expr("ts + INTERVAL 3 MONTHS").alias("plus3m"),
        F.date_trunc("month", F.col("ts")).cast("timestamp_ntz").alias("mon"),
        F.date_format(F.col("ts"), "EEEE").alias("dname"),
        F.weekday(F.col("ts")).alias("wkday"),
        F.from_unixtime(F.lit(1700000000)).cast("timestamp_ntz").alias("from_unix"),
        F.greatest(
            F.col("ts"), F.lit("1997-06-01").cast("timestamp_ntz")
        ).alias("ts_clamped"),
    )
