"""Model DDL + ML_PREDICT table function SQL surface (reference
flink-table/flink-sql-parser/.../ddl/SqlCreateModel.java,
SqlAlterModel.java, SqlDropModel.java; catalog objects
CatalogModel/ResolvedCatalogModel; runtime
StreamExecMLPredictTableFunction; providers
flink-models/{flink-model-openai,flink-model-triton}).

Statements:

    CREATE MODEL [IF NOT EXISTS] m
        [INPUT (x ARRAY<FLOAT>)]
        [OUTPUT (score BIGINT, pred_label BIGINT)]
        WITH ('provider' = 'fixed-point-linear', ...)
    ALTER MODEL m SET ('k' = 'v')
    DROP MODEL [IF EXISTS] m
    SHOW MODELS
    SELECT ... FROM ML_PREDICT(TABLE t, MODEL m, DESCRIPTOR(col)) ...

Provider resolution: ``fixed-point-linear`` binds the in-repo
deterministic FixedPointLinearModel (functions/ml.py), so the whole DDL →
predict path is value-checkable against a SQL oracle. Remote providers
(``openai``, ``triton``) are registrable as catalog objects — their WITH
options are validated and stored — but invoking them raises a clear
capability error in this offline environment (the reference calls their
HTTP endpoints at the same point). Custom Python factories register via
``TableEnvironment.create_temporary_model`` (the
``CatalogModel``-via-Table-API analog).

ML_PREDICT lowering: the call is rewritten to a temp view produced by
``functions.ml.ml_predict`` (mapInPandas — executor-local model, one
invocation per Arrow batch), then the surrounding statement runs through
Spark SQL unchanged, so projections/filters/joins around ML_PREDICT all
compose."""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_OPT_RE = re.compile(r"'(?P<k>[^']+)'\s*=\s*'(?P<v>[^']*)'")

MODEL_CREATE_RE = re.compile(
    r"^\s*CREATE\s+MODEL\s+(?:(?P<ine>IF\s+NOT\s+EXISTS)\s+)?(?P<name>[\w.]+)"
    r"\s*(?:INPUT\s*\(\s*(?P<input>[^)]*?)\s*\)\s*)?"
    r"(?:OUTPUT\s*\(\s*(?P<output>[^)]*?)\s*\)\s*)?"
    r"WITH\s*\(\s*(?P<opts>.*?)\s*\)\s*$",
    re.IGNORECASE | re.DOTALL,
)
MODEL_ALTER_RE = re.compile(
    r"^\s*ALTER\s+MODEL\s+(?:(?P<ife>IF\s+EXISTS)\s+)?(?P<name>[\w.]+)"
    r"\s+SET\s*\(\s*(?P<opts>.*?)\s*\)\s*$",
    re.IGNORECASE | re.DOTALL,
)
#: SqlAlterModelRename.java / SqlAlterModelReset.java
MODEL_ALTER_RENAME_RE = re.compile(
    r"^\s*ALTER\s+MODEL\s+(?:(?P<ife>IF\s+EXISTS)\s+)?(?P<name>[\w.]+)"
    r"\s+RENAME\s+TO\s+(?P<new>[\w.]+)\s*$",
    re.IGNORECASE,
)
MODEL_ALTER_RESET_RE = re.compile(
    r"^\s*ALTER\s+MODEL\s+(?:(?P<ife>IF\s+EXISTS)\s+)?(?P<name>[\w.]+)"
    r"\s+RESET\s*\(\s*(?P<keys>.*?)\s*\)\s*$",
    re.IGNORECASE | re.DOTALL,
)
#: SqlCreateModelAs.java — CREATE MODEL ... WITH (...) AS SELECT: the
#: training relation is a query; explicit INPUT columns are rejected
#: (the input schema derives from the query's columns).
MODEL_CREATE_AS_RE = re.compile(
    r"^\s*CREATE\s+MODEL\s+(?:(?P<ine>IF\s+NOT\s+EXISTS)\s+)?(?P<name>[\w.]+)"
    r"\s*(?:INPUT\s*\(\s*(?P<input>[^)]*?)\s*\)\s*)?"
    r"(?:OUTPUT\s*\(\s*(?P<output>[^)]*?)\s*\)\s*)?"
    r"WITH\s*\(\s*(?P<opts>.*?)\s*\)\s*AS\s+(?P<q>SELECT\b.+)$",
    re.IGNORECASE | re.DOTALL,
)
MODEL_DROP_RE = re.compile(
    r"^\s*DROP\s+MODEL\s+(?:(?P<ife>IF\s+EXISTS)\s+)?(?P<name>[\w.]+)\s*$",
    re.IGNORECASE,
)
SHOW_MODELS_RE = re.compile(r"^\s*SHOW\s+MODELS\s*$", re.IGNORECASE)

#: reference model-inference.md syntax: positional or named
#: (INPUT => TABLE t, MODEL => MODEL m, ARGS => DESCRIPTOR(...),
#: CONFIG => MAP[...]), multi-column descriptor, optional config map
ML_PREDICT_RE = re.compile(
    r"ML_PREDICT\s*\(\s*(?:INPUT\s*=>\s*)?TABLE\s+(?P<tbl>[\w.]+)\s*,\s*"
    r"(?:MODEL\s*=>\s*)?MODEL\s+(?P<model>[\w.]+)\s*,\s*"
    r"(?:ARGS\s*=>\s*)?DESCRIPTOR\s*\(\s*(?P<cols>\w+(?:\s*,\s*\w+)*)\s*\)"
    r"(?:\s*,\s*(?:CONFIG\s*=>\s*)?MAP\s*\[(?P<cfg>[^\]]*)\])?\s*\)",
    re.IGNORECASE,
)


def _parse_config_map(cfg_text: str | None) -> dict:
    """MAP['k', 'v', ...] literal body → dict (pairs of string literals)."""
    if not cfg_text:
        return {}
    vals = re.findall(r"'([^']*)'", cfg_text)
    if len(vals) % 2:
        raise ValueError(
            f"config MAP[...] needs an even number of string literals, "
            f"got {len(vals)}"
        )
    return dict(zip(vals[0::2], vals[1::2]))

#: SqlMLEvaluateTableFunction.java — ML_EVALUATE(TABLE t, MODEL m,
#: DESCRIPTOR(label), DESCRIPTOR(features), task[, config MAP]); the task
#: literal interior is masked at match time, read back from the original.
ML_EVALUATE_RE = re.compile(
    r"ML_EVALUATE\s*\(\s*TABLE\s+(?P<tbl>[\w.]+)\s*,\s*MODEL\s+"
    r"(?P<model>[\w.]+)\s*,\s*DESCRIPTOR\s*\(\s*(?P<label>\w+)\s*\)\s*,\s*"
    r"DESCRIPTOR\s*\(\s*(?P<col>\w+)\s*\)\s*,\s*'(?P<task>[^']*)'"
    r"(?:\s*,\s*MAP\s*\[(?P<cfg>[^\]]*)\])?\s*\)",
    re.IGNORECASE,
)

#: reference TaskType.java values
_EVALUATE_TASKS = (
    "regression", "clustering", "classification", "embedding",
    "text_generation",
)

#: providers whose invocation needs a network endpoint — registrable,
#: not callable here (reference flink-model-openai / flink-model-triton)
_REMOTE_PROVIDERS = ("openai", "triton")


@dataclass
class ModelSpec:
    """One catalog model object (reference CatalogModel: input/output
    schema + provider options)."""

    name: str
    input_schema: str | None
    output_schema: str
    options: dict[str, str] = field(default_factory=dict)
    factory: object | None = None  # Callable[[int], model] for temporaries

    @property
    def provider(self) -> str:
        return self.options.get("provider", "")


class ModelManager:
    """Catalog model registry + ML_PREDICT statement rewriting."""

    DEFAULT_OUTPUT = "score BIGINT, pred_label BIGINT"

    def __init__(self, spark) -> None:
        self.spark = spark
        self.models: dict[str, ModelSpec] = {}
        self._view_seq = 0
        # set by TableEnvironment: the FLIP-529 connection registry a
        # model's 'connection' option resolves against
        self.connection_manager = None

    def _effective_options(self, options: dict) -> dict:
        """Provider-visible options: a model that names a 'connection'
        (FLIP-529) inherits the connection's resolved options (endpoint,
        credentials — secrets read back from the secret store); the
        model's own options win on conflict. The 'connection' key itself
        is consumed here, not passed to the provider factory."""
        conn_name = options.get("connection")
        own = {k: v for k, v in options.items() if k != "connection"}
        if not conn_name:
            return own
        if self.connection_manager is None:
            raise ValueError(
                f"model references connection {conn_name!r} but no "
                "connection registry is attached"
            )
        inherited = self.connection_manager.resolved_options(conn_name)
        inherited.pop("type", None)  # FactoryUtil.CONNECTION_TYPE, consumed
        return {**inherited, **own}

    # -- DDL ---------------------------------------------------------------

    def create(self, m: re.Match):
        return self._create_impl(
            name=m.group("name"),
            if_not_exists=bool(m.group("ine")),
            input_schema=m.group("input"),
            output_schema=m.group("output"),
            opts_str=m.group("opts"),
        )

    def _create_impl(self, name: str, if_not_exists: bool,
                     input_schema: str | None, output_schema: str | None,
                     opts_str: str, extra_options: dict | None = None):
        if name in self.models:
            if if_not_exists:
                return None
            raise ValueError(f"model {name!r} already exists")
        options = {o.group("k"): o.group("v")
                   for o in _OPT_RE.finditer(opts_str)}
        provider = options.get("provider", "")
        if not provider:
            raise ValueError(
                "CREATE MODEL requires a 'provider' option "
                "(fixed-point-linear, openai, triton)"
            )
        if provider not in ("fixed-point-linear", *_REMOTE_PROVIDERS):
            raise ValueError(f"unknown model provider {provider!r}")
        if provider in _REMOTE_PROVIDERS:
            # option-surface parity with the reference provider factories
            # (FactoryUtil helper.validate()): unknown keys, missing
            # required keys, and unparseable values are rejected AT DDL
            # TIME, exactly where the reference factory validates —
            # invocation stays env-blocked, validation does not
            from flink_spark.model_providers import (
                provider_option_keys,
                validate_provider_options,
            )

            merged = self._effective_options(options)
            # options inherited from a connection that this provider
            # doesn't consume are ignored (a connection is shared across
            # providers); the model's OWN unknown keys still reject
            known = provider_option_keys(provider)
            merged = {
                k: v for k, v in merged.items()
                if k in known or k in options or k == "provider"
            }
            validate_provider_options(provider, merged)
        if extra_options:
            # engine-recorded options (e.g. 'training-query') merge after
            # provider validation — they are not factory keys
            options.update(extra_options)
        self.models[name] = ModelSpec(
            name=name,
            input_schema=input_schema,
            output_schema=output_schema or self.DEFAULT_OUTPUT,
            options=options,
        )
        return None

    def create_temporary(self, name: str, factory,
                         output_schema: str | None = None) -> None:
        """Table-API registration of a Python model factory
        (``Callable[[dim], model]`` with the functions/ml.py batch-callable
        contract)."""
        self.models[name] = ModelSpec(
            name=name,
            input_schema=None,
            output_schema=output_schema or self.DEFAULT_OUTPUT,
            options={"provider": "python-temporary"},
            factory=factory,
        )

    def alter(self, m: re.Match):
        if m.group("name") not in self.models and m.group("ife"):
            return None
        spec = self._get(m.group("name"))
        spec.options.update(
            {o.group("k"): o.group("v")
             for o in _OPT_RE.finditer(m.group("opts"))}
        )
        return None

    def alter_rename(self, m: re.Match):
        """ALTER MODEL [IF EXISTS] m RENAME TO m2
        (reference SqlAlterModelRename.java)."""
        name = m.group("name")
        if name not in self.models and m.group("ife"):
            return None
        spec = self._get(name)
        new = m.group("new")
        if new in self.models:
            raise ValueError(f"model {new!r} already exists")
        del self.models[name]
        spec.name = new
        self.models[new] = spec
        return None

    def alter_reset(self, m: re.Match):
        """ALTER MODEL [IF EXISTS] m RESET ('k', ...) (reference
        SqlAlterModelReset.java — 'provider' cannot be reset, mirroring
        the connector-key guard on tables)."""
        name = m.group("name")
        if name not in self.models and m.group("ife"):
            return None
        spec = self._get(name)
        keys = [k.strip().strip("'") for k in m.group("keys").split(",")
                if k.strip()]
        if not keys:
            raise ValueError("ALTER MODEL RESET requires at least one key")
        for k in keys:
            if k == "provider":
                raise ValueError("ALTER MODEL RESET cannot remove 'provider'")
            spec.options.pop(k, None)
        return None

    def create_as(self, m: re.Match, env=None):
        """CREATE MODEL ... WITH (...) AS SELECT (reference
        SqlCreateModelAs.java): the training relation is a query; the
        model's input schema derives from the query columns. Explicit
        INPUT columns are rejected (the reference validator's rule).
        Providers that need a network to actually train stay
        registration-only, same as plain CREATE MODEL."""
        if m.group("input"):
            raise ValueError(
                "CREATE MODEL AS SELECT syntax does not support to "
                "specify explicit input columns."
            )
        name = m.group("name")
        if name in self.models:
            if m.group("ine"):
                return None
            raise ValueError(f"model {name!r} already exists")
        q = m.group("q").strip()
        runner = env.execute_sql if env is not None else self.spark.sql
        probe = runner(q)
        input_schema = ", ".join(
            f"{f.name} {f.dataType.simpleString().upper()}"
            for f in probe.schema.fields
        )
        self._create_impl(
            name=name, if_not_exists=bool(m.group("ine")),
            input_schema=input_schema, output_schema=m.group("output"),
            opts_str=m.group("opts"),
            extra_options={"training-query": q},
        )
        return None

    def drop(self, m: re.Match):
        name = m.group("name")
        if name not in self.models:
            if m.group("ife"):
                return None
            raise ValueError(f"model {name!r} does not exist")
        del self.models[name]
        return None

    def show(self):
        rows = [(s.name, s.provider, s.output_schema)
                for s in self.models.values()]
        return self.spark.createDataFrame(
            rows or [], "model_name string, provider string, output string"
        )

    # -- ML_PREDICT --------------------------------------------------------

    def _get(self, name: str) -> ModelSpec:
        if name not in self.models:
            raise ValueError(f"model {name!r} does not exist")
        return self.models[name]

    def _factory_of(self, spec: ModelSpec):
        if spec.factory is not None:
            return spec.factory
        if spec.provider == "fixed-point-linear":
            from flink_spark.functions.ml import FixedPointLinearModel

            return FixedPointLinearModel
        if spec.provider in _REMOTE_PROVIDERS:
            endpoint = spec.options.get("endpoint", "no endpoint configured")
            raise NotImplementedError(
                f"model {spec.name!r} uses remote provider "
                f"{spec.provider!r} ({endpoint}): invoking it requires "
                "network access this environment does not have; register "
                "a local factory via create_temporary_model instead"
            )
        raise ValueError(f"model {spec.name!r} has no callable provider")

    def rewrite_ml_predict(self, stmt: str) -> str:
        """Replace every ML_PREDICT(TABLE t, MODEL m, DESCRIPTOR(cols)
        [, CONFIG => MAP[...]]) call with a temp view holding the
        prediction-extended table, leaving the surrounding SQL for Spark
        to plan. A multi-column descriptor assembles the named scalar
        feature columns into the model's input vector (reference
        model-inference.md: "The number of feature columns ... must
        match the model's input schema")."""
        from pyspark.sql import functions as F

        from flink_spark.functions.ml import ml_predict

        def sub(mo: re.Match) -> str:
            spec = self._get(mo.group("model"))
            cfg = _parse_config_map(mo.group("cfg"))
            cols = [c.strip() for c in mo.group("cols").split(",")]
            inp = self.spark.table(mo.group("tbl"))
            feat, drop_feat = cols[0], False
            if len(cols) > 1:
                feat, drop_feat = "__mlp_feat", True
                inp = inp.withColumn(
                    feat,
                    F.array(*[F.col(c).cast("double") for c in cols]),
                )
            out = ml_predict(
                inp,
                self._factory_of(spec),
                feat,
                result_schema=spec.output_schema,
                config=cfg,
            )
            if drop_feat:
                out = out.drop(feat)
            self._view_seq += 1
            view = f"__mlp_{mo.group('model')}_{self._view_seq}"
            out.createOrReplaceTempView(view)
            return view

        from flink_spark.sqltok import sub_outside_literals

        # mask-matched: ML_PREDICT(...) inside a string literal is data
        return sub_outside_literals(ML_PREDICT_RE, sub, stmt)

    # -- ML_EVALUATE ---------------------------------------------------------

    def rewrite_ml_evaluate(self, stmt: str) -> str:
        """ML_EVALUATE(TABLE t, MODEL m, DESCRIPTOR(label),
        DESCRIPTOR(features), task[, config]) → one row with a
        `result MAP<STRING, DOUBLE>` column (reference
        SqlMLEvaluateTableFunction.java — which the reference ships as
        parser/validation only, with no exec node yet; here it executes:
        the table scores through the same Arrow-batched serving path
        ML_PREDICT uses, then ONE JVM aggregate computes the task's
        metrics — nothing is collected to the driver)."""
        from pyspark.sql import functions as F

        from flink_spark.functions.ml import ml_predict

        def sub(mo: re.Match) -> str:
            task = mo.group("task").strip().lower()
            if task not in _EVALUATE_TASKS:
                raise ValueError(
                    f"ML_EVALUATE: unknown task {task!r}; expected one of "
                    f"{sorted(_EVALUATE_TASKS)}"  # reference TaskType.java
                )
            if task not in ("regression", "classification"):
                raise NotImplementedError(
                    f"ML_EVALUATE task {task!r} requires a remote "
                    "provider/judge endpoint this environment does not "
                    "have; regression and classification evaluate locally"
                )
            spec = self._get(mo.group("model"))
            # project to (label, features) under reserved names first:
            # the input table may itself carry columns named like the
            # model's outputs, and only these two matter for evaluation
            inp = self.spark.table(mo.group("tbl")).select(
                F.col(mo.group("label")).alias("__mle_label"),
                F.col(mo.group("col")).alias("__mle_feat"),
            )
            # the evaluate config carries task-specific args too
            # (reference PARAM_ARGS); only the serving keys route to the
            # prediction path
            from flink_spark.functions.ml import _CONFIG_KEYS

            cfg = _parse_config_map(mo.group("cfg"))
            serving = {k: v for k, v in cfg.items() if k in _CONFIG_KEYS}
            scored = ml_predict(
                inp,
                self._factory_of(spec),
                "__mle_feat",
                result_schema=spec.output_schema,
                config=serving,
            )
            from flink_spark.sqltok import split_top_commas

            # split_top_commas, not str.split: output types may carry
            # commas (MAP<STRING,DOUBLE>, DECIMAL(10,2), ...)
            out_cols = [
                c.strip().split()[0]
                for c in split_top_commas(spec.output_schema)
                if c.strip()
            ]
            label = F.col("__mle_label").cast("double")
            if task == "classification":
                pred_name = (
                    "pred_label" if "pred_label" in out_cols else out_cols[-1]
                )
                pred = F.col(pred_name).cast("double")
                result = scored.agg(
                    F.create_map(
                        F.lit("accuracy"),
                        F.avg((label == pred).cast("double")),
                        F.lit("count"),
                        F.count(F.lit(1)).cast("double"),
                    ).alias("result")
                )
            else:
                pred = F.col(out_cols[0]).cast("double")
                err = label - pred
                # r2 = 1 - SSE/SST with SST = var_pop(label)·n; rounded so
                # the two engines' variance summation orders agree
                result = scored.agg(
                    F.create_map(
                        F.lit("rmse"), F.sqrt(F.avg(err * err)),
                        F.lit("mae"), F.avg(F.abs(err)),
                        F.lit("r2"),
                        F.round(
                            F.lit(1.0)
                            - F.sum(err * err)
                            / (F.var_pop(label) * F.count(F.lit(1))),
                            6,
                        ),
                        F.lit("count"), F.count(F.lit(1)).cast("double"),
                    ).alias("result")
                )
            self._view_seq += 1
            view = f"__mle_{mo.group('model')}_{self._view_seq}"
            result.createOrReplaceTempView(view)
            return view

        from flink_spark.sqltok import sub_outside_literals

        return sub_outside_literals(ML_EVALUATE_RE, sub, stmt)
