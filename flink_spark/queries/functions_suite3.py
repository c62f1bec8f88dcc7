"""Scalar function coverage, part 3 — the rest of the §2.12 gap list:
STR_TO_MAP, TYPEOF, TRY_CAST, WIDTH_BUCKET, IS_JSON, TIMESTAMPADD,
PARSE_URL / URL_ENCODE / URL_DECODE, and INET_ATON / INET_NTOA (the two
with no Spark builtin — implemented through our ScalarFunction UDF
surface, reference .../runtime/functions/scalar/ and
BuiltInFunctionDefinitions.java).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_spark.queries.registry import query
from flink_spark.sources.tables import load_table


@query(
    "fn_misc_suite",
    oracle="""
    SELECT doc_id,
           '{"lang":"' || lang || '","src":"' || source || '"}' AS m_json,
           'double' AS ty_dbl,
           'bigint' AS ty_int,
           TRY_CAST(lang AS INTEGER) AS try_bad,
           TRY_CAST(CAST(doc_id AS VARCHAR) AS INTEGER) AS try_ok,
           CASE WHEN n_chars < 0 THEN 0
                WHEN n_chars >= 4000 THEN 11
                ELSE CAST(FLOOR(n_chars / 400.0) AS INT) + 1 END AS bucket,
           TIMESTAMP '2024-01-15 00:00:00'
             + INTERVAL 3 HOUR + INTERVAL 45 MINUTE AS ts_shift
    FROM documents WHERE doc_id < 400
    """,
)
def fn_misc_suite(spark, sf_dir):
    """STR_TO_MAP / TYPEOF / TRY_CAST / WIDTH_BUCKET / TIMESTAMPADD
    (reference StrToMapFunction, TypeOfFunction, TRY_CAST planner rule,
    BuiltInFunctionDefinitions temporal family). The map is serialized as
    sorted JSON for engine-neutral comparison; the width_bucket oracle
    spells out the bucketing formula."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    return d.select(
        "doc_id",
        F.to_json(
            F.map_from_entries(
                F.sort_array(
                    F.map_entries(
                        F.expr(
                            "str_to_map(concat('lang:', lang, ',src:', source), ',', ':')"
                        )
                    )
                )
            )
        ).alias("m_json"),
        F.expr("typeof(CAST(n_chars AS DOUBLE))").alias("ty_dbl"),
        F.expr("typeof(doc_id)").alias("ty_int"),
        F.expr("TRY_CAST(lang AS INTEGER)").alias("try_bad"),
        F.expr("TRY_CAST(CAST(doc_id AS STRING) AS INTEGER)").alias("try_ok"),
        F.expr("width_bucket(n_chars, 0, 4000, 10)").cast("int").alias("bucket"),
        F.expr(
            "timestampadd(MINUTE, 45, timestampadd(HOUR, 3, "
            "TIMESTAMP_NTZ '2024-01-15 00:00:00'))"
        ).alias("ts_shift"),
    )


@query(
    "fn_url_inet_suite",
    oracle="""
    SELECT doc_id,
           source || '.example.com' AS host,
           '/docs/' || doc_id AS path,
           'lang=' || lang AS query_str,
           lang AS q_lang,
           TRUE AS roundtrip_ok,
           167772160 + 256 * (doc_id % 256) + (doc_id % 199) AS ip_num,
           '10.0.' || (doc_id % 256) || '.' || (doc_id % 199) AS ip_str
    FROM documents WHERE doc_id < 400
    """,
)
def fn_url_inet_suite(spark, sf_dir):
    """PARSE_URL family (reference SqlFunctionUtils.java parseUrl) via the
    Spark builtin, URL_ENCODE/URL_DECODE as an exact roundtrip (DuckDB has
    no url codec to compare text against), and INET_ATON/INET_NTOA — no
    Spark builtin — through the ScalarFunction UDF surface (vectorized
    eval_batch, §2.14)."""
    import pandas as pd

    from flink_spark.functions.udf import ScalarFunction, scalar_udf

    def make_inet():
        class InetAton(ScalarFunction):
            result_type = "bigint"

            def eval_batch(self, col: pd.Series) -> pd.Series:
                def conv(s):
                    a, b, c, d = (int(x) for x in s.split("."))
                    return (a << 24) | (b << 16) | (c << 8) | d

                return col.map(conv)

        class InetNtoa(ScalarFunction):
            result_type = "string"

            def eval_batch(self, col: pd.Series) -> pd.Series:
                return col.map(
                    lambda n: f"{(n >> 24) & 255}.{(n >> 16) & 255}."
                    f"{(n >> 8) & 255}.{n & 255}"
                )

        return scalar_udf(InetAton()), scalar_udf(InetNtoa())

    inet_aton, inet_ntoa = make_inet()
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"), F.lit("?lang="), F.col("lang"),
    )
    ip = F.concat(
        F.lit("10.0."), (F.col("doc_id") % 256).cast("string"),
        F.lit("."), (F.col("doc_id") % 199).cast("string"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query_str"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("q_lang"),
        (F.url_decode(F.url_encode(F.col("text"))) == F.col("text")).alias(
            "roundtrip_ok"
        ),
        inet_aton(ip).alias("ip_num"),
        inet_ntoa(inet_aton(ip)).alias("ip_str"),
    )
