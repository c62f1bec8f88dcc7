"""ML_PREDICT + async-calc coverage (SURVEY §2.12 ML/vector row, §2.2
async calc row): model serving over a table column and an asynchronous
scalar function inside a projection.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_spark.functions.ml import FixedPointLinearModel, ml_predict
from flink_spark.operators.asynccalc import async_calc
from flink_spark.queries.registry import query
from flink_spark.sources.tables import load_table


@query(
    "ml_predict_linear",
    oracle="""
    WITH t AS (
      SELECT vec_id,
             ((((i * 37) % 21)) - 10)
               * CAST(FLOOR(embedding[i]::DOUBLE * 1000) AS BIGINT) AS term
      FROM embeddings, LATERAL (SELECT generate_subscripts(embedding, 1) AS i) s
      WHERE vec_id < 500)
    SELECT vec_id, CAST(SUM(term) AS BIGINT) AS score,
           CAST(ABS(SUM(term)) % 3 AS BIGINT) AS pred_label
    FROM t GROUP BY vec_id
    """,
)
def ml_predict_linear(spark, sf_dir):
    """ML_PREDICT over the embeddings table (reference PredictFunction.java,
    StreamExecMLPredictTableFunction): Arrow-batched model serving with a
    deterministic fixed-point linear model; the oracle replays the integer
    arithmetic in SQL."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 500)
    return ml_predict(
        emb.select("vec_id", "embedding"),
        FixedPointLinearModel,
        "embedding",
    ).select("vec_id", "score", "pred_label")


@query(
    "ml_evaluate_metrics",
    oracle="""
    WITH t AS (
      SELECT vec_id,
             ((((i * 37) % 21)) - 10)
               * CAST(FLOOR(embedding[i]::DOUBLE * 1000) AS BIGINT) AS term
      FROM embeddings, LATERAL (SELECT generate_subscripts(embedding, 1) AS i) s
      WHERE vec_id < 500),
    s AS (SELECT vec_id, CAST(SUM(term) AS BIGINT) AS score,
                 CAST(ABS(SUM(term)) % 3 AS BIGINT) AS pred_label
          FROM t GROUP BY vec_id),
    l AS (SELECT vec_id, score, pred_label,
                 CAST(score + (vec_id % 5) - 2 AS DOUBLE) AS label,
                 CAST(CASE WHEN vec_id % 10 = 0
                           THEN (pred_label + 1) % 3
                           ELSE pred_label END AS DOUBLE) AS label_cls
          FROM s),
    e AS (SELECT label - CAST(score AS DOUBLE) AS err, label,
                 (label_cls = CAST(pred_label AS DOUBLE)) AS hit
          FROM l)
    SELECT sqrt(avg(err * err)) AS rmse,
           avg(abs(err)) AS mae,
           round(1 - sum(err * err) / (var_pop(label) * count(*)), 6) AS r2,
           CAST(count(*) AS DOUBLE) AS n,
           avg(CASE WHEN hit THEN 1.0 ELSE 0.0 END) AS accuracy
    FROM e
    """,
)
def ml_evaluate_metrics(spark, sf_dir):
    """ML_EVALUATE(TABLE t, MODEL m, DESCRIPTOR(label),
    DESCRIPTOR(features), task) (reference
    SqlMLEvaluateTableFunction.java — parser-only in the reference, no
    exec node; executable here): regression rmse/mae/r2/count and
    classification accuracy as one JVM aggregate over the ML_PREDICT
    serving path, surfaced through the documented
    `result MAP<STRING, DOUBLE>` row. Labels are the model's own outputs
    plus deterministic residuals/flips, so every metric is an exact
    rational both engines reproduce bit-for-bit."""
    from flink_spark.catalog import TableEnvironment

    env = TableEnvironment(spark)
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 500
    )
    scored = ml_predict(
        emb.select("vec_id", "embedding"), FixedPointLinearModel, "embedding"
    ).select("vec_id", "score", "pred_label")
    labeled = (
        emb.join(scored, "vec_id")
        .withColumn(
            "label",
            (F.col("score") + F.col("vec_id") % 5 - 2).cast("double"),
        )
        .withColumn(
            "label_cls",
            F.when(
                F.col("vec_id") % 10 == 0,
                (F.col("pred_label") + 1) % 3,
            ).otherwise(F.col("pred_label")).cast("double"),
        )
        .select("vec_id", "embedding", "label", "label_cls")
    )
    labeled.createOrReplaceTempView("__mle_in")
    env.execute_sql("DROP MODEL IF EXISTS __mle_lin")
    env.execute_sql(
        "CREATE MODEL __mle_lin INPUT (x ARRAY<FLOAT>) "
        "OUTPUT (score BIGINT, pred_label BIGINT) "
        "WITH ('provider' = 'fixed-point-linear')"
    )
    reg = env.execute_sql("""
        SELECT result['rmse'] AS rmse, result['mae'] AS mae,
               result['r2'] AS r2, result['count'] AS n
        FROM ML_EVALUATE(TABLE __mle_in, MODEL __mle_lin,
                         DESCRIPTOR(label), DESCRIPTOR(embedding),
                         'regression')
    """)
    cls = env.execute_sql("""
        SELECT result['accuracy'] AS accuracy
        FROM ML_EVALUATE(TABLE __mle_in, MODEL __mle_lin,
                         DESCRIPTOR(label_cls), DESCRIPTOR(embedding),
                         'classification')
    """)
    return reg.crossJoin(cls)


@query(
    "async_calc_enrich",
    oracle="""
    SELECT doc_id, md5(text) AS digest, upper(lang) AS lang_uc
    FROM documents WHERE doc_id < 300
    """,
)
def async_calc_enrich(spark, sf_dir):
    """Async scalar function in a projection (reference StreamExecAsyncCalc,
    AsyncScalarFunction.java): each Arrow batch fans out through an asyncio
    loop (ordered gather — Flink's ORDERED AsyncWaitOperator mode). The
    awaitable stands in for an external service call; md5 keeps it
    deterministic and SQL-checkable."""
    import hashlib

    async def enrich(row: dict) -> dict:
        return {
            "digest": hashlib.md5(row["text"].encode()).hexdigest(),
            "lang_uc": row["lang"].upper(),
        }

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 300
    ).select("doc_id", "text", "lang")
    return async_calc(docs, enrich, "digest string, lang_uc string").select(
        "doc_id", "digest", "lang_uc"
    )


@query(
    "ml_predict_sql",
    oracle="""
    WITH t AS (
      SELECT vec_id,
             ((((i * 37) % 21)) - 10)
               * CAST(FLOOR(embedding[i]::DOUBLE * 1000) AS BIGINT) AS term
      FROM embeddings, LATERAL (SELECT generate_subscripts(embedding, 1) AS i) s
      WHERE vec_id < 500)
    SELECT vec_id, CAST(SUM(term) AS BIGINT) AS score,
           CAST(ABS(SUM(term)) % 3 AS BIGINT) AS pred_label
    FROM t GROUP BY vec_id
    """,
)
def ml_predict_sql(spark, sf_dir):
    """The full model-DDL path (reference SqlCreateModel.java, catalog
    CatalogModel, StreamExecMLPredictTableFunction): CREATE MODEL with a
    provider + OUTPUT schema, then ML_PREDICT(TABLE t, MODEL m,
    DESCRIPTOR(col)) invoked from SQL — the statement is rewritten onto
    the same mapInPandas serving path as the function-level entry, so the
    exact fixed-point oracle carries over unchanged."""
    from flink_spark.catalog import TableEnvironment

    env = TableEnvironment(spark)
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 500)
    emb.select("vec_id", "embedding").createOrReplaceTempView("mlp_embeddings")
    env.execute_sql("DROP MODEL IF EXISTS scorer")
    env.execute_sql("""
        CREATE MODEL scorer
        INPUT (embedding ARRAY<FLOAT>)
        OUTPUT (score BIGINT, pred_label BIGINT)
        WITH ('provider' = 'fixed-point-linear')
    """)
    return env.execute_sql(
        "SELECT vec_id, score, pred_label "
        "FROM ML_PREDICT(TABLE mlp_embeddings, MODEL scorer, "
        "DESCRIPTOR(embedding))"
    )
