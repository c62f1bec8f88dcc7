"""Reference built-in spellings Spark lacks, registered as pure-SQL
temporary functions (reference docs/data/sql_functions.yml entries for
SHA224/SHA384/SHA512, RAND_INTEGER, CURRENT_ROW_TIMESTAMP, JSON_LENGTH;
runtime flink-table/flink-table-runtime/.../functions/SqlFunctionUtils /
SqlJsonUtils).

These are Spark SQL scalar functions (``CREATE FUNCTION ... RETURN
<expr>``), so the bodies inline into the caller's plan at analysis time
— whole-stage-codegen'd JVM expressions, zero Python in the row path.

Name-parity notes:
 - SHA1, SHA2, MD5, REGEXP_INSTR, IS_VALID_UTF8, MAKE_VALID_UTF8 are
   native Spark spellings already matching the reference — nothing to
   register.
 - RAND_INTEGER(bound) registers here; the seeded two-arg form
   RAND_INTEGER(seed, bound) cannot be a SQL function (Spark requires a
   foldable seed, which a function parameter is not at definition time)
   — TableEnvironment.execute_sql rewrites it textually onto
   RAND(seed) instead.
 - CURRENT_ROW_TIMESTAMP(): the reference evaluates it per record; a
   batch/micro-batch engine freezes the clock per query (Spark's
   CURRENT_TIMESTAMP contract), which is the same value-stability
   guarantee the reference gives WITHIN one batch.
 - JSON_STRING(value) is type-generic so it cannot be a (typed) SQL
   function; use :func:`flink_spark.functions.jsonfn.json_string`.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_DEFS: list[str] = [
    # SHA-2 family spellings (reference: hex string, NULL on NULL input)
    """CREATE OR REPLACE TEMPORARY FUNCTION sha224(s STRING) RETURNS STRING
       RETURN sha2(CAST(s AS BINARY), 224)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION sha384(s STRING) RETURNS STRING
       RETURN sha2(CAST(s AS BINARY), 384)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION sha512(s STRING) RETURNS STRING
       RETURN sha2(CAST(s AS BINARY), 512)""",
    # RAND_INTEGER(bound): pseudorandom int in [0, bound)
    """CREATE OR REPLACE TEMPORARY FUNCTION rand_integer(bound INT)
       RETURNS INT RETURN CAST(floor(rand() * bound) AS INT)""",
    # CURRENT_ROW_TIMESTAMP() -> TIMESTAMP_LTZ(3)-equivalent
    """CREATE OR REPLACE TEMPORARY FUNCTION current_row_timestamp()
       RETURNS TIMESTAMP RETURN current_timestamp()""",
    # PROCTIME() (reference sql_functions.yml temporal section /
    # ProctimeMaterializeSqlFunction): the processing-time attribute.
    # In batch/micro-batch execution processing time materializes to the
    # statement clock — the same value-stability contract the reference
    # gives when it materializes proctime on a boundary (e.g. a sink or
    # a batch-mode plan), and the same per-query freeze
    # CURRENT_ROW_TIMESTAMP gets above.
    """CREATE OR REPLACE TEMPORARY FUNCTION proctime()
       RETURNS TIMESTAMP RETURN current_timestamp()""",
    # JSON_LENGTH(doc[, path]): elements of an array, keys of an object,
    # 1 for a located scalar, NULL for NULL/invalid/missing path
    """CREATE OR REPLACE TEMPORARY FUNCTION json_length(
         doc STRING, path STRING DEFAULT NULL) RETURNS INT
       RETURN CASE
         WHEN doc IS NULL THEN CAST(NULL AS INT)
         WHEN path IS NOT NULL THEN
           CASE
             WHEN get_json_object(doc, path) IS NULL THEN CAST(NULL AS INT)
             WHEN json_array_length(get_json_object(doc, path)) IS NOT NULL
               THEN json_array_length(get_json_object(doc, path))
             WHEN json_object_keys(get_json_object(doc, path)) IS NOT NULL
               THEN size(json_object_keys(get_json_object(doc, path)))
             ELSE 1
           END
         WHEN json_array_length(doc) IS NOT NULL THEN json_array_length(doc)
         WHEN json_object_keys(doc) IS NOT NULL
           THEN size(json_object_keys(doc))
         WHEN get_json_object(doc, '$') IS NOT NULL THEN 1
         ELSE CAST(NULL AS INT)
       END""",
]


def register_reference_builtins(spark: SparkSession) -> None:
    """Idempotently register the reference spellings on a session.

    Called from ``prepare_session`` so every entry point (driver-handed
    vanilla sessions included) sees the names. A per-session flag keeps
    repeat calls to one spark.conf read.
    """
    if getattr(spark, "_flink_spark_builtins", False):
        return
    for ddl in _DEFS:
        spark.sql(ddl)
    spark._flink_spark_builtins = True
