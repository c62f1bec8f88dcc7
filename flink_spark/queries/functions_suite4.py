"""Scalar function families, part 4 (SURVEY §2.12 completeness pass):
hyperbolic + inverse trigonometry, factorial, extra string functions
(BTRIM/INSTR/ELT/SUBSTRING_INDEX/REGEXP_COUNT/REGEXP_SUBSTR), temporal
field extraction (HOUR/MINUTE/SECOND/EXTRACT/DAYNAME), and the remaining
array builtins (ARRAY_MIN/MAX/APPEND/PREPEND/COMPACT/REMOVE).

All columns are JVM expressions over deterministic inputs; inverse-trig /
hyperbolic doubles differ between the JVM's and DuckDB's libm in the last
ulp, so those columns are quantized to 9 dp on BOTH sides (validated over
the fixed sf0.01 inputs); everything else is exact.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_spark.queries.registry import query
from flink_spark.sources.tables import load_table


@query(
    "fn_trig_hyper_suite",
    oracle="""
    SELECT p_partkey,
           round((exp(p_retailprice / 1000.0) - exp(-(p_retailprice / 1000.0))) / 2, 9) AS sh,
           round((exp(p_retailprice / 1000.0) + exp(-(p_retailprice / 1000.0))) / 2, 9) AS ch,
           round((exp(p_retailprice / 1000.0) - exp(-(p_retailprice / 1000.0)))
                 / (exp(p_retailprice / 1000.0) + exp(-(p_retailprice / 1000.0))), 9) AS th,
           round(asin(sin(p_retailprice / 1000.0)), 9) AS asn,
           round(acos(cos(p_retailprice / 1000.0)), 9) AS acs,
           round(atan(p_retailprice / 1000.0), 9) AS atn,
           round(atan2(p_retailprice, 1.0 + (p_partkey % 7)), 9) AS at2,
           round(cot(1.0 + p_retailprice / 1000.0), 9) AS ct,
           CAST(factorial((p_partkey % 10)::INT) AS BIGINT) AS fct,
           pi() AS c_pi
    FROM part WHERE p_partkey <= 300
    """,
)
def fn_trig_hyper_suite(spark, sf_dir):
    """SINH/COSH/TANH/ASIN/ACOS/ATAN/ATAN2/COT/FACTORIAL/PI (reference
    flink-table/flink-table-common .../BuiltInFunctionDefinitions.java
    trig block)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 300)
    x = F.col("p_retailprice") / 1000.0
    return p.select(
        "p_partkey",
        # DuckDB has no hyperbolics: oracle uses the exp identity, which
        # differs from libm in the last ulp — both sides quantize to 9 dp
        # (validated bit-identical over the fixed sf0.01 inputs)
        F.round(F.sinh(x), 9).alias("sh"),
        F.round(F.cosh(x), 9).alias("ch"),
        F.round(F.tanh(x), 9).alias("th"),
        F.round(F.asin(F.sin(x)), 9).alias("asn"),
        F.round(F.acos(F.cos(x)), 9).alias("acs"),
        F.round(F.atan(x), 9).alias("atn"),
        F.round(F.atan2(F.col("p_retailprice"), (1.0 + F.col("p_partkey") % 7)), 9).alias("at2"),
        F.round(F.cot(F.lit(1.0) + x), 9).alias("ct"),
        F.factorial((F.col("p_partkey") % 10).cast("int")).alias("fct"),
        F.lit(3.141592653589793).alias("c_pi"),
    )


@query(
    "fn_string_extra_suite",
    oracle="""
    SELECT p_partkey,
           trim(p_brand, '#0123456789') AS btrimmed,
           instr(p_name, 'a') AS in_a,
           ['alpha','beta','gamma'][1 + (p_partkey % 3)::INT] AS elt_pick,
           array_to_string(list_slice(string_split(p_name, ' '), 1, 2), ' ')
             AS first2,
           len(regexp_extract_all(p_name, '[aeiou]')) AS n_vowels,
           regexp_extract(p_name, '[a-z]+') AS first_word,
           list_min(string_split(p_name, ' ')) AS min_word,
           list_max(string_split(p_name, ' ')) AS max_word,
           array_to_string(list_append(string_split(p_brand, '#'), 'end'), '|')
             AS appended,
           array_to_string(list_prepend('start', string_split(p_brand, '#')), '|')
             AS prepended,
           array_to_string(list_filter(string_split(p_name, ' '), w -> w <> 'the'), '|')
             AS no_the
    FROM part WHERE p_partkey <= 300
    """,
)
def fn_string_extra_suite(spark, sf_dir):
    """BTRIM/INSTR/ELT/SUBSTRING_INDEX/REGEXP_COUNT/REGEXP_SUBSTR +
    ARRAY_MIN/ARRAY_MAX/ARRAY_APPEND/ARRAY_PREPEND/ARRAY_REMOVE
    (dialect deltas: substring_index↔list_slice+join, regexp_count↔
    len(regexp_extract_all), array_remove↔list_filter)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 300)
    words = F.split(F.col("p_name"), " ")
    return p.select(
        "p_partkey",
        F.btrim(F.col("p_brand"), F.lit("#0123456789")).alias("btrimmed"),
        F.instr(F.col("p_name"), "a").alias("in_a"),
        F.elt(
            F.lit(1) + (F.col("p_partkey") % 3).cast("int"),
            F.lit("alpha"), F.lit("beta"), F.lit("gamma"),
        ).alias("elt_pick"),
        F.substring_index(F.col("p_name"), " ", 2).alias("first2"),
        F.regexp_count(F.col("p_name"), F.lit("[aeiou]")).alias("n_vowels"),
        F.regexp_substr(F.col("p_name"), F.lit("[a-z]+")).alias("first_word"),
        F.array_min(words).alias("min_word"),
        F.array_max(words).alias("max_word"),
        F.array_join(
            F.array_append(F.split(F.col("p_brand"), "#"), F.lit("end")), "|"
        ).alias("appended"),
        F.array_join(
            F.array_prepend(F.split(F.col("p_brand"), "#"), F.lit("start")), "|"
        ).alias("prepended"),
        F.array_join(F.array_remove(words, "the"), "|").alias("no_the"),
    )


@query(
    "fn_temporal_extract_suite",
    oracle="""
    SELECT event_id,
           hour(ts) AS h, minute(ts) AS m, second(ts) AS s,
           extract(dow FROM ts) AS dow,
           extract(doy FROM ts) AS doy,
           dayname(ts) AS dname,
           epoch_us(ts) AS us,
           CAST(ts AS DATE)::TIMESTAMP AS d,
           ts + INTERVAL 36 HOUR AS plus36h,
           date_trunc('minute', ts) AS tmin
    FROM events WHERE event_id < 500
    """,
)
def fn_temporal_extract_suite(spark, sf_dir):
    """HOUR/MINUTE/SECOND/EXTRACT(DOW|DOY)/DAYNAME/epoch micros/CAST DATE/
    interval arithmetic/FLOOR-to-minute (dialect deltas: DuckDB dow is
    0=Sunday, Spark dayofweek is 1=Sunday; epoch_us↔unix_micros)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    return ev.select(
        "event_id",
        F.hour("ts").alias("h"),
        F.minute("ts").alias("m"),
        F.second("ts").alias("s"),
        (F.dayofweek("ts") - 1).alias("dow"),
        F.dayofyear("ts").alias("doy"),
        F.date_format("ts", "EEEE").alias("dname"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.col("ts").cast("date").cast("timestamp_ntz").alias("d"),
        (F.col("ts") + F.expr("INTERVAL 36 HOURS")).alias("plus36h"),
        F.date_trunc("minute", "ts").alias("tmin"),
    )
