"""Scalar function families, part 5 (§2.12 stragglers): BIN, PMOD,
numeric TRUNCATE, fixed-offset CONVERT_TZ, SQL OVERLAPS, and the Spark-4
variant path for PARSE_JSON / JSON_VALUE / IS_JSON.

Dialect deltas: pmod↔((x%m)+m)%m, truncate↔floor-scale (that IS the
operator's definition), variant_get↔json_extract::cast, is_json↔
try_parse_json IS NOT NULL ↔ json_valid.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_spark.queries.registry import query
from flink_spark.sources.tables import load_table


@query(
    "fn_numeric_extra_suite",
    oracle="""
    SELECT p_partkey,
           bin(p_partkey) AS b,
           ((p_partkey % 7) + 7) % 7 AS pm,
           ((-p_partkey % 7) + 7) % 7 AS pm_neg,
           floor(p_retailprice * 100) / 100 AS trunc2,
           CAST(floor(p_retailprice / 10) AS BIGINT) * 10 AS trunc_neg1,
           p_partkey // 7 AS idiv
    FROM part WHERE p_partkey <= 300
    """,
)
def fn_numeric_extra_suite(spark, sf_dir):
    """BIN / PMOD (incl. negative operand) / TRUNCATE(x, ±d) / integer DIV
    (reference BuiltInFunctionDefinitions math block)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 300)
    return p.select(
        "p_partkey",
        F.bin("p_partkey").alias("b"),
        F.pmod(F.col("p_partkey"), F.lit(7)).alias("pm"),
        F.pmod(-F.col("p_partkey"), F.lit(7)).alias("pm_neg"),
        (F.floor(F.col("p_retailprice") * 100) / 100).alias("trunc2"),
        (F.floor(F.col("p_retailprice") / 10) * 10).alias("trunc_neg1"),
        F.expr("p_partkey DIV 7").alias("idiv"),
    )


@query(
    "fn_json_variant_suite",
    oracle="""
    SELECT event_id,
           json_extract(props, '$.k')::INT AS k_int,
           json_extract_string(props, '$.k') AS k_str,
           json_valid(props) AS is_json,
           ts - INTERVAL '5 hours' AS ts_est,
           (ts <= ts + INTERVAL '1 hour')
             AND (ts + INTERVAL '30 minutes' <= ts + INTERVAL '2 hours')
             AS periods_overlap
    FROM events WHERE event_id < 500
    """,
)
def fn_json_variant_suite(spark, sf_dir):
    """PARSE_JSON→VARIANT_GET (Spark 4 variant type) / JSON_VALUE /
    IS_JSON / fixed-offset CONVERT_TZ / SQL OVERLAPS predicate."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    v = F.parse_json(F.col("props"))
    s1, e1 = F.col("ts"), F.col("ts") + F.expr("INTERVAL 1 HOUR")
    s2 = F.col("ts") + F.expr("INTERVAL 30 MINUTES")
    e2 = F.col("ts") + F.expr("INTERVAL 2 HOURS")
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "int").alias("k_int"),
        F.variant_get(v, "$.k", "string").alias("k_str"),
        F.try_parse_json(F.col("props")).isNotNull().alias("is_json"),
        F.from_utc_timestamp(F.col("ts").cast("timestamp"), "EST")
        .cast("timestamp_ntz")
        .alias("ts_est"),
        ((s1 <= e2) & (s2 <= e1)).alias("periods_overlap"),
    )


@query(
    "fn_json_table",
    oracle="""
    WITH src AS (
      SELECT o_orderkey,
             '{"items":[{"n":"p' || CAST(o_orderkey % 5 AS VARCHAR)
               || '","q":' || CAST(o_orderkey % 7 AS VARCHAR)
               || '},{"n":"x","q":' || CAST(o_orderkey % 3 AS VARCHAR)
               || '}]}' AS j
      FROM orders),
    shred AS (
      SELECT s.o_orderkey, u.i AS idx,
             json_extract_string(json_extract(s.j,
               '$.items[' || (u.i - 1) || ']'), '$.n') AS n,
             CAST(json_extract(json_extract(s.j,
               '$.items[' || (u.i - 1) || ']'), '$.q') AS INT) AS q
      FROM src s, LATERAL (SELECT unnest(generate_series(1,
             CAST(json_array_length(s.j, '$.items') AS INT))) AS i) u)
    SELECT n, CAST(SUM(q) AS BIGINT) AS sq,
           CAST(COUNT(*) AS BIGINT) AS c,
           CAST(SUM(idx) AS BIGINT) AS si
    FROM shred GROUP BY n
    """,
)
def fn_json_table(spark, sf_dir):
    """JSON_TABLE (SQL:2016; reference JSON shredding table function,
    Flink 2.0 SQL surface): a deterministic JSON document is built per
    order with IDENTICAL text on both engines, shredded through the SQL
    FROM-clause rewrite (one from_json against the COLUMNS-derived struct
    schema + posexplode — JVM end to end), and aggregated per item name
    with FOR ORDINALITY sums proving element order survives."""
    from flink_spark.catalog import TableEnvironment

    env = TableEnvironment(spark)
    load_table(spark, sf_dir, "orders").selectExpr(
        "o_orderkey",
        """concat('{"items":[{"n":"p', CAST(o_orderkey % 5 AS STRING),
                  '","q":', CAST(o_orderkey % 7 AS STRING),
                  '},{"n":"x","q":', CAST(o_orderkey % 3 AS STRING),
                  '}]}') AS j""",
    ).createOrReplaceTempView("jt_orders")
    return env.execute_sql("""
        SELECT jt.n, CAST(SUM(jt.q) AS BIGINT) AS sq,
               CAST(COUNT(*) AS BIGINT) AS c,
               CAST(SUM(jt.idx) AS BIGINT) AS si
        FROM jt_orders, JSON_TABLE(j, '$.items[*]' COLUMNS (
            n STRING PATH '$.n',
            q INT PATH '$.q',
            idx FOR ORDINALITY
        )) AS jt
        GROUP BY jt.n
    """)


@query(
    "fn_name_parity_suite",
    oracle=r"""
    SELECT p_partkey,
           length(p_name) AS clen,
           ltrim('  ' || p_type || '  ') AS lt,
           rtrim('  ' || p_type || '  ') AS rt,
           string_split(p_name, ' ')[2] AS tok1,
           from_base64('Zmxpbms=')::VARCHAR AS b64,
           unhex('466C696E6B')::VARCHAR AS uh,
           sha256(p_name) AS sh2,
           ifnull(nullif(p_size, 1), -1) AS ifn,
           CAST(p_partkey AS VARCHAR) || '-' ||
             strftime(make_date(1998, 1, 1) + INTERVAL (p_partkey % 28) DAY,
                      '%Y-%m-%d') AS to_d,
           date_diff('hour', TIMESTAMP '1998-01-01 00:00:00',
                     TIMESTAMP '1998-01-01 00:00:00'
                       + INTERVAL (p_size) HOUR) AS tdiff,
           p_name ~ '^[A-Za-z]+$' AS isalpha,
           CAST(p_size AS VARCHAR) ~ '^[0-9]+$' AS isdigit,
           (CAST(p_retailprice AS VARCHAR) ~
             '^[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)([eE][+-]?[0-9]+)?$') AS isdec,
           array_to_string(
             list_sort(map_values(MAP {'a': p_size, 'b': p_size + 1})), '|')
             AS mvals,
           array_to_string(list_reverse(string_split(p_name, ' ')), '|') AS arev,
           array_to_string(string_split(p_name, ' ')[1:2], '|') AS aslice,
           array_to_string(string_split(p_name, ' ') || ['pad'], '|') AS aconcat,
           to_json('x' || CAST(p_size AS VARCHAR)) AS jquote
    FROM part WHERE p_partkey <= 300
    """,
)
def fn_name_parity_suite(spark, sf_dir):
    """Function-NAME parity sweep for reference built-ins whose exact
    spellings weren't exercised elsewhere (sql_functions.yml audit):
    CHAR_LENGTH, LTRIM/RTRIM, SPLIT_INDEX, FROM_BASE64, UNHEX, SHA2,
    IFNULL, TO_DATE (rendered), TIMESTAMPDIFF, IS_ALPHA/IS_DIGIT/
    IS_DECIMAL (functions/library.py JVM regexps), MAP_FROM_ARRAYS +
    MAP_VALUES, ARRAY_REVERSE, ARRAY_SLICE, ARRAY_CONCAT, JSON_QUOTE."""
    from flink_spark.functions.library import is_alpha, is_decimal, is_digit

    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 300)
    toks = F.split("p_name", " ")
    return p.select(
        "p_partkey",
        F.char_length("p_name").alias("clen"),
        F.ltrim(F.concat(F.lit("  "), F.col("p_type"), F.lit("  "))).alias("lt"),
        F.rtrim(F.concat(F.lit("  "), F.col("p_type"), F.lit("  "))).alias("rt"),
        F.element_at(toks, 2).alias("tok1"),  # SPLIT_INDEX(s, ' ', 1)
        F.unbase64(F.lit("Zmxpbms=")).cast("string").alias("b64"),
        F.unhex(F.lit("466C696E6B")).cast("string").alias("uh"),
        F.sha2(F.col("p_name").cast("binary"), 256).alias("sh2"),
        F.ifnull(F.nullif("p_size", F.lit(1)), F.lit(-1)).alias("ifn"),
        F.concat_ws(
            "-", F.col("p_partkey").cast("string"),
            F.to_date(
                F.date_add(F.lit("1998-01-01"), (F.col("p_partkey") % 28).cast("int"))
            ).cast("string"),
        ).alias("to_d"),
        F.expr(
            "timestampdiff(HOUR, TIMESTAMP '1998-01-01 00:00:00', "
            "TIMESTAMP '1998-01-01 00:00:00' + make_interval(0,0,0,0,p_size))"
        ).cast("long").alias("tdiff"),
        is_alpha("p_name").alias("isalpha"),
        is_digit(F.col("p_size").cast("string")).alias("isdigit"),
        is_decimal(F.col("p_retailprice").cast("string")).alias("isdec"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.map_values(
                        F.map_from_arrays(
                            F.array(F.lit("a"), F.lit("b")),
                            F.array(F.col("p_size"), F.col("p_size") + 1),
                        )
                    )
                ),
                lambda x: x.cast("string"),
            ),
            "|",
        ).alias("mvals"),
        F.array_join(F.reverse(toks), "|").alias("arev"),
        F.array_join(F.slice(toks, 1, 2), "|").alias("aslice"),
        F.array_join(F.concat(toks, F.array(F.lit("pad"))), "|").alias("aconcat"),
        # JSON_QUOTE: quote a bare string as a JSON scalar
        F.concat(F.lit('"'), F.lit("x"), F.col("p_size").cast("string"),
                 F.lit('"')).alias("jquote"),
    )


@query(
    "fn_hash_json_random_suite",
    oracle="""
    SELECT p_partkey, p_size,
           '23097d223405d8228642a477bda255b32aadbce4bda0b3f7e36c9da7'
             AS h224,
           'cb00753f45a35e8bb5a03d699ac65007272c32ab0eded1631a8b605a43ff5bed8086072ba1e7cc2358baeca134c825a7'
             AS h384,
           'ddaf35a193617abacc417349ae20413112e6fa4e89a97ea20a9eeee64b55d39a2192992a274fc1a836ba3c23a3feebbd454d4423643ce80e2a9ac94fa54ca49f'
             AS h512,
           'a9993e364706816aba3e25717850c26c9cd0d89d' AS h1,
           CASE WHEN regexp_matches(p_name, '[aeiou]')
                THEN CAST(strpos(p_name, regexp_extract(p_name, '[aeiou]'))
                          AS BIGINT)
                ELSE 0 END AS rxi,
           CAST(0 AS BIGINT) AS rxi0,
           CAST(json_array_length('[' || repeat('1,', p_partkey % 5) || '9]')
                AS BIGINT) AS jl_arr,
           CAST(len(json_keys('{"a":1,"b":{"c":2,"d":3}}')) AS BIGINT)
             AS jl_obj,
           CAST(len(json_keys(json_extract('{"a":1,"b":{"c":2,"d":3}}',
                                           '$.b'))) AS BIGINT) AS jl_path,
           CAST(1 AS BIGINT) AS jl_scalar,
           TRUE AS jl_bad_null,
           TRUE AS riv,
           TRUE AS rsv,
           (now() >= TIMESTAMP '2020-01-01 00:00:00') AS crt,
           TRUE AS u8,
           p_name AS mv,
           to_json(p_size) AS js_num,
           to_json(p_type) AS js_str,
           to_json(p_size > 25) AS js_bool,
           to_json([p_size, p_size + 1]) AS js_arr,
           (to_json(CAST(NULL AS INT)) IS NULL) AS js_null
    FROM part WHERE p_partkey <= 250
    """,
)
def fn_hash_json_random_suite(spark, sf_dir):
    """SHA1/SHA224/SHA384/SHA512 (NIST known-answer vectors in the
    oracle), REGEXP_INSTR, JSON_LENGTH (array/object/path/scalar/
    invalid), JSON_STRING (number/string/bool/array/NULL),
    RAND_INTEGER 1-arg (SQL function) + 2-arg seeded (dialect rewrite
    onto RAND(seed)), CURRENT_ROW_TIMESTAMP, IS_VALID_UTF8 /
    MAKE_VALID_UTF8 — the sql_functions.yml names Spark lacks,
    registered as inlined SQL functions (functions/builtins_ext.py) so
    every spelling stays a whole-stage-codegen JVM expression."""
    from flink_spark.catalog import TableEnvironment
    from flink_spark.functions.jsonfn import json_string

    env = TableEnvironment(spark)
    load_table(spark, sf_dir, "part").filter(
        F.col("p_partkey") <= 250
    ).createOrReplaceTempView("__fnext_part")
    df = env.execute_sql("""
        SELECT p_partkey, p_size, p_type,
               sha224('abc') AS h224,
               sha384('abc') AS h384,
               sha512('abc') AS h512,
               sha1('abc') AS h1,
               CAST(regexp_instr(p_name, '[aeiou]') AS BIGINT) AS rxi,
               CAST(regexp_instr(p_name, 'zzz9q') AS BIGINT) AS rxi0,
               CAST(json_length('[' || repeat('1,', p_partkey % 5) || '9]')
                    AS BIGINT) AS jl_arr,
               CAST(json_length('{"a":1,"b":{"c":2,"d":3}}') AS BIGINT)
                 AS jl_obj,
               CAST(json_length('{"a":1,"b":{"c":2,"d":3}}', '$.b')
                    AS BIGINT) AS jl_path,
               CAST(json_length('42') AS BIGINT) AS jl_scalar,
               (json_length('oops{') IS NULL) AS jl_bad_null,
               (rand_integer(10) BETWEEN 0 AND 9) AS riv,
               (RAND_INTEGER(42, 100) BETWEEN 0 AND 99) AS rsv,
               (current_row_timestamp()
                  >= TIMESTAMP '2020-01-01 00:00:00') AS crt,
               is_valid_utf8(CAST(p_name AS BINARY)) AS u8,
               CAST(make_valid_utf8(CAST(p_name AS BINARY)) AS STRING)
                 AS mv
        FROM __fnext_part
    """)
    return (
        df.withColumn("js_num", json_string(F.col("p_size")))
        .withColumn("js_str", json_string(F.col("p_type")))
        .withColumn("js_bool", json_string(F.col("p_size") > 25))
        .withColumn(
            "js_arr",
            json_string(F.array(F.col("p_size"), F.col("p_size") + 1)),
        )
        .withColumn(
            "js_null", json_string(F.lit(None).cast("int")).isNull()
        )
        .drop("p_type")
    )


@query(
    "fn_overlaps_suite",
    oracle="""
    SELECT event_id,
           (greatest(ts, ts + INTERVAL 30 MINUTE)
              >= TIMESTAMP '1997-06-01 00:00:00'
            AND TIMESTAMP '1997-06-01 06:00:00'
              >= least(ts, ts + INTERVAL 30 MINUTE)) AS ov_window,
           (greatest(ts, ts - INTERVAL 1 HOUR) >= ts
            AND greatest(ts, ts + INTERVAL 1 HOUR) >= least(ts, ts - INTERVAL 1 HOUR))
             AS ov_touching
    FROM events WHERE event_id < 500
    """,
)
def fn_overlaps_suite(spark, sf_dir):
    """(tp, temporal) OVERLAPS (tp, temporal) predicate (reference
    sql_functions.yml temporal family, TemporalOverlapsConverter.java):
    interval members added to the time point, endpoints normalized,
    INCLUSIVE bounds — the touching case (shared endpoint) is TRUE.
    Routed through the dialect's text expansion onto native comparisons."""
    from flink_spark.catalog import TableEnvironment

    env = TableEnvironment(spark)
    load_table(spark, sf_dir, "events").filter(
        F.col("event_id") < 500
    ).createOrReplaceTempView("__ov_events")
    return env.execute_sql("""
        SELECT event_id,
               (ts, INTERVAL '30' MINUTE) OVERLAPS
                 (TIMESTAMP '1997-06-01 00:00:00',
                  TIMESTAMP '1997-06-01 06:00:00') AS ov_window,
               (ts, ts - INTERVAL '1' HOUR) OVERLAPS
                 (ts, INTERVAL '1' HOUR) AS ov_touching
        FROM __ov_events
    """)


@query(
    "fn_object_of_suite",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority AS prio,
           CAST(o_orderkey % 7 AS INTEGER) AS bucket,
           'URGENT-OVERRIDE' AS upd_prio,
           CAST(o_orderkey % 7 AS INTEGER) AS upd_bucket,
           o_orderkey * 2 AS upd_key
    FROM orders WHERE o_orderkey <= 500
    """,
)
def fn_object_of_suite(spark, sf_dir):
    """Structured-type value constructors (FLIP-520; reference
    BuiltInFunctionDefinitions.java OBJECT_OF/OBJECT_UPDATE): build a
    typed object per order in SQL, update two of its fields through
    OBJECT_UPDATE over the inline constructor, and read every field back
    as scalars. The SQL path runs through the named_struct rewrite
    (flink_spark/functions/objects.py) — all JVM, one codegen span, no
    shuffle beyond the scan."""
    from flink_spark.catalog import TableEnvironment

    env = TableEnvironment(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("obj_orders")
    return env.execute_sql("""
        WITH objs AS (
            SELECT o_orderkey,
                   OBJECT_OF('com.example.Order',
                             'key', o_orderkey,
                             'prio', o_orderpriority,
                             'bucket', CAST(o_orderkey % 7 AS INT)) AS o,
                   OBJECT_UPDATE(
                       OBJECT_OF('com.example.Order',
                                 'key', o_orderkey,
                                 'prio', o_orderpriority,
                                 'bucket', CAST(o_orderkey % 7 AS INT)),
                       'prio', 'URGENT-OVERRIDE',
                       'key', o_orderkey * 2) AS u
            FROM obj_orders WHERE o_orderkey <= 500
        )
        SELECT o_orderkey,
               o.prio AS prio,
               o.bucket AS bucket,
               u.prio AS upd_prio,
               u.bucket AS upd_bucket,
               u.key AS upd_key
        FROM objs
    """)


@query(
    "fn_json_construct_suite",
    oracle="""
    SELECT event_id,
           '{"id":' || event_id || ',"opt":null}' AS jo_null,
           '{"id":' || event_id || '}' AS jo_absent,
           '[' || event_id || ',"x"]' AS ja_absent,
           '[' || event_id || ',null,"x"]' AS ja_null,
           '[' || (event_id % 3) || ',' || (event_id % 5) || ']' AS jq,
           CASE WHEN event_id % 2 = 0 THEN NULL
                ELSE '{"a":' || (event_id % 3) || '}' END AS jq_obj,
           'p' || event_id AS ju,
           '"p' || event_id || '"' AS jquote,
           event_id AS tltz_epoch
    FROM events WHERE event_id < 400
    """,
)
def fn_json_construct_suite(spark, sf_dir):
    """SQL:2016 JSON construction + fragment family (reference
    BuiltInFunctionDefinitions JSON_OBJECT / JSON_ARRAY / JSON_QUERY /
    JSON_UNQUOTE / JSON_QUOTE, TO_TIMESTAMP_LTZ; runtime
    SqlJsonUtils.java): objects with NULL-vs-ABSENT ON NULL, arrays with
    both null policies, JSON_QUERY returning object/array fragments (and
    NULL on scalar matches), quote/unquote round-trip, and
    TO_TIMESTAMP_LTZ(ms, 3) pinned via epoch round-trip. All JVM
    expressions (flink_spark/functions/jsonfn.py) — one codegen span."""
    from flink_spark.functions import jsonfn as J

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 400)
    doc = F.concat(F.lit('{"items":['), F.col("event_id") % 3, F.lit(","),
                   F.col("event_id") % 5, F.lit('],"s":1,"o":{"a":'),
                   F.col("event_id") % 3, F.lit("}}"))
    quoted = F.concat(F.lit('"p'), F.col("event_id").cast("string"),
                      F.lit('"'))
    return ev.select(
        "event_id",
        J.json_object(id=F.col("event_id"),
                      opt=F.lit(None).cast("string")).alias("jo_null"),
        J.json_object(absent_on_null=True, id=F.col("event_id"),
                      opt=F.lit(None).cast("string")).alias("jo_absent"),
        J.json_array(F.col("event_id"), F.lit(None).cast("string"),
                     F.lit("x")).alias("ja_absent"),
        J.json_array(F.col("event_id"), F.lit(None).cast("string"),
                     F.lit("x"), absent_on_null=False).alias("ja_null"),
        J.json_query(doc, "$.items").alias("jq"),
        # object fragment on odd ids; '$.s' matches a SCALAR → NULL
        F.when(F.col("event_id") % 2 == 1,
               J.json_query(doc, "$.o")).otherwise(
            J.json_query(doc, "$.s")).alias("jq_obj"),
        J.json_unquote(quoted).alias("ju"),
        J.json_quote(F.concat(F.lit("p"),
                              F.col("event_id").cast("string"))).alias("jquote"),
        # epoch → TIMESTAMP_LTZ → epoch round-trip is tz-independent
        F.unix_timestamp(
            J.to_timestamp_ltz(F.col("event_id") * 1000, 3)
        ).alias("tltz_epoch"),
    )


@query(
    "fn_type_precision_suite",
    oracle="""
    SELECT event_id,
           CAST(CAST(value AS DECIMAL(18,4)) * CAST(0.07 AS DECIMAL(18,4))
                AS DECIMAL(38,6))::VARCHAR AS mul_edge,
           CAST(round(value / 7, 6) AS DECIMAL(38,6))::VARCHAR AS div7,
           CAST(round(value / 2.5, 6) AS DECIMAL(38,6))::VARCHAR AS div25,
           rpad(event_type, 12, ' ') AS c12,
           length(rpad(event_type, 12, ' ')) AS c12_len,
           rpad(CAST(event_id AS VARCHAR), 10, ' ') AS c10_num,
           left(event_type, 3) AS v3,
           ts AS t6,
           date_trunc('milliseconds', ts) AS t3,
           date_trunc('second', ts) AS t0,
           CAST('2024-01-01 00:00:00.123456789' AS TIMESTAMP) AS t9_lit
    FROM events WHERE event_id < 300
    """,
)
def fn_type_precision_suite(spark, sf_dir):
    """Precision corners (SURVEY §7.3 ⑦) through the SQL dialect layer:

    - DECIMAL(p,s) × / ÷ result types at the p=38 edge — DECIMAL(18,4)
      products and DECIMAL(38,2)/int division both derive (38,6) with
      HALF_UP rounding at the reduced scale (reference
      LogicalTypeMerging.java adjustPrecisionScale, the Hive/Spark rule);
      div7 is non-terminating so the scale-6 rounding is actually
      exercised, and the string cast pins scale rendering ('864.196900').
    - CHAR(n)/VARCHAR(n) CAST pad/trim (reference
      CharVarCharTrimPadCastRule.java:64): CHAR pads with spaces AND
      trims; VARCHAR only trims; numerics stringify before padding.
    - TIMESTAMP(n) casts (reference TimestampToTimestampCastRule.java:97):
      precision reduction TRUNCATES fractional seconds (not rounds);
      TIMESTAMP(9) degrades to Spark's microsecond domain, so a
      nanosecond literal truncates to micros.
    """
    from flink_spark.catalog import TableEnvironment

    env = TableEnvironment(spark)
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "tp_events"
    )
    return env.execute_sql("""
        SELECT event_id,
               CAST(CAST(value AS DECIMAL(20,4)) * CAST(0.07 AS DECIMAL(20,4))
                    AS STRING) AS mul_edge,
               CAST(CAST(value AS DECIMAL(38,2)) / 7 AS STRING) AS div7,
               CAST(CAST(value AS DECIMAL(18,2)) / CAST(2.5 AS DECIMAL(3,1))
                    AS STRING) AS div25,
               CAST(event_type AS CHAR(12)) AS c12,
               LENGTH(CAST(event_type AS CHAR(12))) AS c12_len,
               CAST(event_id AS CHAR(10)) AS c10_num,
               CAST(event_type AS VARCHAR(3)) AS v3,
               CAST(ts AS TIMESTAMP(6)) AS t6,
               CAST(ts AS TIMESTAMP(3)) AS t3,
               CAST(ts AS TIMESTAMP(0)) AS t0,
               CAST('2024-01-01 00:00:00.123456789' AS TIMESTAMP(9))
                   AS t9_lit
        FROM tp_events WHERE event_id < 300
    """)
