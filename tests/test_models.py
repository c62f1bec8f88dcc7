"""Model DDL catalog surface (reference SqlCreateModel/SqlAlterModel/
SqlDropModel, CatalogModel; flink-models providers): lifecycle, SHOW
MODELS, ML_PREDICT SQL rewrite, remote-provider capability gate."""

from __future__ import annotations

import pytest

from flink_spark.catalog import TableEnvironment


@pytest.fixture()
def env(spark):
    return TableEnvironment(spark)


def test_model_ddl_roundtrip(env):
    env.execute_sql("DROP MODEL IF EXISTS m1")
    env.execute_sql(
        "CREATE MODEL m1 INPUT (x ARRAY<FLOAT>) "
        "OUTPUT (score BIGINT, pred_label BIGINT) "
        "WITH ('provider' = 'fixed-point-linear')"
    )
    rows = {r.model_name: r for r in env.execute_sql("SHOW MODELS").collect()}
    assert rows["m1"].provider == "fixed-point-linear"
    # duplicate without IF NOT EXISTS → error; with it → no-op
    with pytest.raises(ValueError, match="already exists"):
        env.execute_sql("CREATE MODEL m1 WITH ('provider' = 'openai')")
    env.execute_sql(
        "CREATE MODEL IF NOT EXISTS m1 WITH ('provider' = 'openai')"
    )
    assert (
        env.model_manager.models["m1"].provider == "fixed-point-linear"
    )  # unchanged
    env.execute_sql("ALTER MODEL m1 SET ('batch.size' = '512')")
    assert env.model_manager.models["m1"].options["batch.size"] == "512"
    env.execute_sql("DROP MODEL m1")
    with pytest.raises(ValueError, match="does not exist"):
        env.execute_sql("DROP MODEL m1")
    env.execute_sql("DROP MODEL IF EXISTS m1")  # no-op


def test_ml_predict_sql_composes_with_surrounding_query(env, spark):
    spark.createDataFrame(
        [(1, [0.5, 1.0]), (2, [2.0, 0.25]), (3, [0.0, 0.0])],
        "id INT, emb ARRAY<DOUBLE>",
    ).createOrReplaceTempView("mdl_t")
    env.execute_sql("DROP MODEL IF EXISTS lin")
    env.execute_sql(
        "CREATE MODEL lin OUTPUT (score BIGINT, pred_label BIGINT) "
        "WITH ('provider' = 'fixed-point-linear')"
    )
    # w = [(1*37)%21-10, (2*37)%21-10] = [6, 1]
    # id1: 6*500 + 1*1000 = 4000 ; id2: 6*2000 + 1*250 = 12250
    got = {
        r.id: (r.score, r.pred_label)
        for r in env.execute_sql(
            "SELECT id, score, pred_label "
            "FROM ML_PREDICT(TABLE mdl_t, MODEL lin, DESCRIPTOR(emb)) "
            "WHERE id < 3 ORDER BY id"
        ).collect()
    }
    assert got == {1: (4000, 4000 % 3), 2: (12250, 12250 % 3)}


def test_remote_provider_is_capability_gated(env, spark):
    env.execute_sql("DROP MODEL IF EXISTS gpt")
    env.execute_sql(
        "CREATE MODEL gpt WITH ('provider' = 'openai', "
        "'endpoint' = 'https://example.invalid/v1/embeddings', "
        "'api-key' = 'sk-test', 'model' = 'text-embedding-3')"
    )
    spark.createDataFrame([(1, [1.0])], "id INT, emb ARRAY<DOUBLE>") \
        .createOrReplaceTempView("mdl_remote_t")
    with pytest.raises(NotImplementedError, match="network"):
        env.execute_sql(
            "SELECT * FROM ML_PREDICT(TABLE mdl_remote_t, MODEL gpt, "
            "DESCRIPTOR(emb))"
        )
    with pytest.raises(ValueError, match="provider"):
        env.execute_sql("CREATE MODEL bad WITH ('provider' = 'what')")


def test_temporary_python_model(env, spark):
    import numpy as np

    class Doubler:
        def __call__(self, x):
            s = x.sum(axis=1) * 2
            return {"doubled": s.astype(np.int64)}

    env.create_temporary_model("dbl", lambda dim: Doubler(),
                               output_schema="doubled BIGINT")
    spark.createDataFrame([(1, [1.0, 2.0]), (2, [3.0, 4.0])],
                          "id INT, emb ARRAY<DOUBLE>") \
        .createOrReplaceTempView("mdl_tmp_t")
    got = {r.id: r.doubled for r in env.execute_sql(
        "SELECT id, doubled FROM ML_PREDICT(TABLE mdl_tmp_t, MODEL dbl, "
        "DESCRIPTOR(emb))"
    ).collect()}
    assert got == {1: 6, 2: 14}


class TestProviderOptionSurface:
    """Option-schema parity with the reference provider factories
    (OpenAIModelProviderFactory/OpenAIOptions, TritonModelProviderFactory/
    TritonOptions): accepted and rejected option sets, FactoryUtil-shaped
    error messages, and openai endpoint-suffix dispatch."""

    def _v(self, provider, opts):
        from flink_spark.model_providers import validate_provider_options

        return validate_provider_options(provider, opts)

    def test_openai_chat_minimal_accepted(self):
        r = self._v("openai", {
            "provider": "openai",
            "endpoint": "https://api.example.com/v1/chat/completions",
            "api-key": "k", "model": "gpt-x",
        })
        assert r["__function_kind"] == "chat"
        assert r["system-prompt"] == "You are a helpful assistant."
        assert r["retry-num"] == 100

    def test_openai_embedding_dispatch_with_trailing_slash(self):
        r = self._v("openai", {
            "endpoint": "https://api.example.com/v1/EMBEDDINGS///",
            "api-key": "k", "model": "te3",
            "dimension": "256",
        })
        assert r["__function_kind"] == "embedding"
        assert r["dimension"] == 256

    def test_openai_unsupported_endpoint(self):
        import pytest

        with pytest.raises(ValueError, match="Unsupported endpoint"):
            self._v("openai", {
                "endpoint": "https://api.example.com/v1/other",
                "api-key": "k", "model": "m",
            })

    def test_openai_missing_required_lists_keys(self):
        import pytest

        with pytest.raises(ValueError, match=r"(?s)required options are "
                                              r"missing.*api-key.*endpoint"):
            self._v("openai", {"model": "m"})

    def test_openai_unknown_key_lists_supported(self):
        import pytest

        with pytest.raises(ValueError, match=r"(?s)Unsupported options.*"
                                              r"tempreture.*Supported "
                                              r"options.*temperature"):
            self._v("openai", {
                "endpoint": "https://x/v1/chat/completions",
                "api-key": "k", "model": "m", "tempreture": "0.5",
            })

    def test_openai_enum_and_numeric_parsing(self):
        import pytest

        r = self._v("openai", {
            "endpoint": "https://x/v1/chat/completions",
            "api-key": "k", "model": "m",
            "error-handling-strategy": "IGNORE",
            "context-overflow-action": "truncated-tail-log",
            "temperature": "0.2", "max-tokens": "512", "seed": "7",
            "response-format": "json_object",
        })
        assert r["error-handling-strategy"] == "ignore"
        assert r["max-tokens"] == 512 and r["temperature"] == 0.2
        with pytest.raises(ValueError, match=r"Could not parse value 'hot' "
                                              r"for key 'temperature'"):
            self._v("openai", {
                "endpoint": "https://x/v1/chat/completions",
                "api-key": "k", "model": "m", "temperature": "hot",
            })
        with pytest.raises(ValueError, match=r"Could not parse value "
                                              r"'sometimes'"):
            self._v("openai", {
                "endpoint": "https://x/v1/chat/completions",
                "api-key": "k", "model": "m",
                "error-handling-strategy": "sometimes",
            })

    def test_triton_accepted_with_typed_options(self):
        r = self._v("triton", {
            "endpoint": "http://triton:8000",
            "model-name": "resnet",
            "timeout": "10s", "flatten-batch-dim": "true",
            "custom-headers": "x-a:1,x-b:2", "priority": "3",
        })
        assert r["model-version"] == "latest"
        assert r["flatten-batch-dim"] is True
        assert r["custom-headers"] == {"x-a": "1", "x-b": "2"}

    def test_triton_rejections(self):
        import pytest

        with pytest.raises(ValueError, match=r"(?s)missing.*model-name"):
            self._v("triton", {"endpoint": "http://t:8000"})
        with pytest.raises(ValueError, match=r"Could not parse value 'fast' "
                                              r"for key 'timeout'"):
            self._v("triton", {
                "endpoint": "http://t:8000", "model-name": "m",
                "timeout": "fast",
            })
        with pytest.raises(ValueError, match=r"Could not parse value 'yes' "
                                              r"for key 'sequence-start'"):
            self._v("triton", {
                "endpoint": "http://t:8000", "model-name": "m",
                "sequence-start": "yes",
            })

    def test_create_model_ddl_validates_remote_provider(self, spark):
        import pytest

        from flink_spark.catalog import TableEnvironment

        env = TableEnvironment(spark)
        env.execute_sql("DROP MODEL IF EXISTS provider_gate_ok")
        env.execute_sql("""
            CREATE MODEL provider_gate_ok WITH (
              'provider' = 'openai',
              'endpoint' = 'https://api.example.com/v1/embeddings',
              'api-key' = 'k', 'model' = 'te3')
        """)
        with pytest.raises(ValueError, match="Unsupported options"):
            env.execute_sql("""
                CREATE MODEL provider_gate_bad WITH (
                  'provider' = 'openai',
                  'endpoint' = 'https://api.example.com/v1/embeddings',
                  'api-key' = 'k', 'model' = 'te3', 'no-such-key' = '1')
            """)
        env.execute_sql("DROP MODEL IF EXISTS provider_gate_ok")


def test_describe_model_and_function(spark):
    """DESCRIBE FUNCTION [EXTENDED] (DescribeFunctionOperation.java row
    shape) and DESCRIBE MODEL [EXTENDED] (DescribeModelOperation.java
    input/output schema rows)."""
    import pytest

    from flink_spark.catalog import TableEnvironment

    env = TableEnvironment(spark)
    env.execute_sql("DROP MODEL IF EXISTS desc_m")
    env.execute_sql("""
        CREATE MODEL desc_m
          INPUT (x ARRAY<FLOAT>)
          OUTPUT (score BIGINT, pred_label BIGINT)
          WITH ('provider' = 'fixed-point-linear')
    """)
    rows = [tuple(r) for r in env.execute_sql("DESCRIBE MODEL desc_m").collect()]
    assert ("x", "ARRAY<FLOAT>", True, True) in rows
    assert ("score", "BIGINT", True, False) in rows
    ext = env.execute_sql("DESC MODEL EXTENDED desc_m").collect()
    assert any(r[0] == "option:provider" for r in ext)
    with pytest.raises(ValueError, match="doesn't exist"):
        env.execute_sql("DESCRIBE MODEL nope_m")
    env.execute_sql("DROP MODEL IF EXISTS desc_m")

    env.execute_sql("DROP FUNCTION IF EXISTS desc_fn")
    env.execute_sql(
        "CREATE FUNCTION desc_fn AS "
        "'flink_spark.functions.library.BitCountFn' LANGUAGE PYTHON"
    )
    info = {r[0]: r[1] for r in
            env.execute_sql("DESCRIBE FUNCTION desc_fn").collect()}
    assert info["is system function"] == "false"
    assert info["is temporary"] == "true"
    assert info["class name"] == "flink_spark.functions.library.BitCountFn"
    assert info["function language"] == "PYTHON"
    ext = {r[0]: r[1] for r in
           env.execute_sql("DESC FUNCTION EXTENDED desc_fn").collect()}
    assert ext["kind"] == "SCALAR" and ext["is deterministic"] == "true"
    # system function
    sysinfo = {r[0]: r[1] for r in
               env.execute_sql("DESCRIBE FUNCTION abs").collect()}
    assert sysinfo["is system function"] == "true"
    with pytest.raises(ValueError, match="doesn't exist"):
        env.execute_sql("DESCRIBE FUNCTION no_such_fn_xyz")
    env.execute_sql("DROP FUNCTION IF EXISTS desc_fn")


def test_ml_evaluate_sql(env, spark):
    """ML_EVALUATE (reference SqlMLEvaluateTableFunction.java — parser-only
    there): result MAP row shape, regression + classification metrics on a
    perfectly-labeled table, optional config map accepted, TaskType
    validation, unimplemented tasks gated honestly."""
    env.execute_sql("DROP MODEL IF EXISTS mle_m")
    env.execute_sql(
        "CREATE MODEL mle_m INPUT (x ARRAY<FLOAT>) "
        "OUTPUT (score BIGINT, pred_label BIGINT) "
        "WITH ('provider' = 'fixed-point-linear')"
    )
    from flink_spark.functions.ml import FixedPointLinearModel, ml_predict
    from pyspark.sql import functions as F

    base = spark.createDataFrame(
        [(i, [float(i) / 10, float(i % 3)]) for i in range(20)],
        "rid long, emb array<float>",
    )
    scored = ml_predict(base, FixedPointLinearModel, "emb")
    scored.withColumn("label", F.col("score").cast("double")).withColumn(
        "label_cls", F.col("pred_label").cast("double")
    ).createOrReplaceTempView("mle_t")
    row = env.execute_sql(
        "SELECT result FROM ML_EVALUATE(TABLE mle_t, MODEL mle_m, "
        "DESCRIPTOR(label), DESCRIPTOR(emb), 'regression')"
    ).first()
    assert row.result["rmse"] == 0.0 and row.result["mae"] == 0.0
    assert row.result["count"] == 20.0
    # classification + a config map (accepted, reference PARAM_ARGS)
    row = env.execute_sql(
        "SELECT result FROM ML_EVALUATE(TABLE mle_t, MODEL mle_m, "
        "DESCRIPTOR(label_cls), DESCRIPTOR(emb), 'classification', "
        "MAP['threshold', '0.5'])"
    ).first()
    assert row.result["accuracy"] == 1.0

    with pytest.raises(ValueError, match="unknown task"):
        env.execute_sql(
            "SELECT result FROM ML_EVALUATE(TABLE mle_t, MODEL mle_m, "
            "DESCRIPTOR(label), DESCRIPTOR(emb), 'ranking')"
        )
    with pytest.raises(NotImplementedError, match="remote provider"):
        env.execute_sql(
            "SELECT result FROM ML_EVALUATE(TABLE mle_t, MODEL mle_m, "
            "DESCRIPTOR(label), DESCRIPTOR(emb), 'text_generation')"
        )
    with pytest.raises(ValueError, match="does not exist"):
        env.execute_sql(
            "SELECT result FROM ML_EVALUATE(TABLE mle_t, MODEL nope_m, "
            "DESCRIPTOR(label), DESCRIPTOR(emb), 'regression')"
        )
    env.execute_sql("DROP MODEL mle_m")


def test_ml_predict_config_and_named_params(env, spark):
    """ML_PREDICT extended surface (reference model-inference.md):
    named parameters (INPUT/MODEL/ARGS/CONFIG =>), multi-column
    descriptor assembling the feature vector, async ordered window
    (identical results to sync), timeout parsing, unknown config keys
    rejected, output-name collision renaming (note 3)."""
    from pyspark.sql import functions as F

    env.execute_sql("DROP MODEL IF EXISTS mlp_m")
    env.execute_sql(
        "CREATE MODEL mlp_m INPUT (x ARRAY<FLOAT>) "
        "OUTPUT (score BIGINT, pred_label BIGINT) "
        "WITH ('provider' = 'fixed-point-linear')"
    )
    spark.createDataFrame(
        [(i, float(i) / 10, float(i % 3)) for i in range(40)],
        "rid long, f1 double, f2 double",
    ).createOrReplaceTempView("mlp_t")
    sync_rows = env.execute_sql(
        "SELECT rid, score FROM ML_PREDICT(TABLE mlp_t, MODEL mlp_m, "
        "DESCRIPTOR(f1, f2)) ORDER BY rid"
    ).collect()
    assert len(sync_rows) == 40
    # named params + async config: same values, ordered window path
    async_rows = env.execute_sql(
        "SELECT rid, score FROM ML_PREDICT(INPUT => TABLE mlp_t, "
        "MODEL => MODEL mlp_m, ARGS => DESCRIPTOR(f1, f2), "
        "CONFIG => MAP['async', 'true', 'timeout', '100s', "
        "'max-concurrent-operations', '2']) ORDER BY rid"
    ).collect()
    assert [tuple(r) for r in async_rows] == [tuple(r) for r in sync_rows]

    with pytest.raises(ValueError, match="unsupported options"):
        env.execute_sql(
            "SELECT * FROM ML_PREDICT(TABLE mlp_t, MODEL mlp_m, "
            "DESCRIPTOR(f1, f2), MAP['retries', '3'])"
        )
    with pytest.raises(ValueError, match="duration"):
        env.execute_sql(
            "SELECT * FROM ML_PREDICT(TABLE mlp_t, MODEL mlp_m, "
            "DESCRIPTOR(f1, f2), MAP['timeout', 'soon'])"
        )

    # collision renaming: input already has a 'score' column → score0
    spark.createDataFrame(
        [(1, [0.5, 1.0], 99)], "rid long, emb array<float>, score long"
    ).createOrReplaceTempView("mlp_coll")
    row = env.execute_sql(
        "SELECT * FROM ML_PREDICT(TABLE mlp_coll, MODEL mlp_m, "
        "DESCRIPTOR(emb))"
    ).first()
    assert row.score == 99 and hasattr(row, "score0")

    # async against a sync-only provider → AsyncPredictRuntimeProvider error
    from flink_spark.functions.ml import ml_predict

    class SyncOnly:
        def __init__(self, dim):
            pass

        def __call__(self, x):
            import numpy as np

            return {"score": np.zeros(len(x), dtype=np.int64)}

    env.model_manager.create_temporary_model(
        "mlp_sync_only", SyncOnly, output_schema="score BIGINT"
    ) if hasattr(env.model_manager, "create_temporary_model") else None
    with pytest.raises(ValueError, match="AsyncPredictRuntimeProvider"):
        ml_predict(
            spark.table("mlp_coll"), SyncOnly, "emb",
            config={"async": "true"},
        ).collect()
    env.execute_sql("DROP MODEL mlp_m")


def test_ml_predict_output_mode(env, spark):
    """output-mode config (reference ml_predict_runtime_config):
    ALLOW_UNORDERED emits the same row set (order within a partition is
    free), invalid values are rejected."""
    env.execute_sql("DROP MODEL IF EXISTS mlo_m")
    env.execute_sql(
        "CREATE MODEL mlo_m INPUT (x ARRAY<FLOAT>) "
        "OUTPUT (score BIGINT, pred_label BIGINT) "
        "WITH ('provider' = 'fixed-point-linear')"
    )
    spark.createDataFrame(
        [(i, [float(i) / 10, float(i % 3)]) for i in range(30)],
        "rid long, emb array<float>",
    ).createOrReplaceTempView("mlo_t")
    base = sorted(
        tuple(r)
        for r in env.execute_sql(
            "SELECT rid, score FROM ML_PREDICT(TABLE mlo_t, MODEL mlo_m, "
            "DESCRIPTOR(emb))"
        ).collect()
    )
    un = sorted(
        tuple(r)
        for r in env.execute_sql(
            "SELECT rid, score FROM ML_PREDICT(TABLE mlo_t, MODEL mlo_m, "
            "DESCRIPTOR(emb), MAP['async', 'true', "
            "'output-mode', 'ALLOW_UNORDERED', "
            "'max-concurrent-operations', '3'])"
        ).collect()
    )
    assert un == base
    with pytest.raises(ValueError, match="output-mode"):
        env.execute_sql(
            "SELECT * FROM ML_PREDICT(TABLE mlo_t, MODEL mlo_m, "
            "DESCRIPTOR(emb), MAP['output-mode', 'SHUFFLED'])"
        )
    env.execute_sql("DROP MODEL mlo_m")


def test_ml_predict_async_equivalence_property(spark):
    """Property: for arbitrary row counts and window widths, the sync
    path, the ORDERED sliding window and the ALLOW_UNORDERED window all
    produce exactly the same (rid, score) set — the window is a pure
    scheduling change."""
    from pyspark.sql import functions as F

    from flink_spark.functions.ml import FixedPointLinearModel, ml_predict

    for n, conc in [(1, 1), (7, 2), (64, 3), (257, 8)]:
        df = spark.range(n).select(
            F.col("id").alias("rid"),
            F.array(
                (F.col("id") / 10).cast("float"),
                (F.col("id") % 5).cast("float"),
            ).alias("emb"),
        ).repartition(4)
        base = sorted(
            (r.rid, r.score)
            for r in ml_predict(
                df, FixedPointLinearModel, "emb"
            ).select("rid", "score").collect()
        )
        for mode in ("ORDERED", "ALLOW_UNORDERED"):
            got = sorted(
                (r.rid, r.score)
                for r in ml_predict(
                    df, FixedPointLinearModel, "emb",
                    config={
                        "async": "true",
                        "max-concurrent-operations": str(conc),
                        "output-mode": mode,
                    },
                ).select("rid", "score").collect()
            )
            assert got == base, (n, conc, mode)
