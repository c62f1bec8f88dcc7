"""ML_PREDICT surface (reference PredictFunction.java, exec
StreamExecMLPredictTableFunction, model DDL flink-models/
{flink-model-openai,flink-model-triton}): run a model over a table column,
emitting prediction columns.

The model contract is a batch callable: ndarray[batch, dim] → dict of
output arrays. Real deployments plug an endpoint client here (the
flink-model-openai/-triton analog); the Arrow batch is the RPC batch.
`FixedPointLinearModel` is the in-repo deterministic stand-in: integer
weights over fixed-point (1e-3) quantized inputs → bit-exact, so the
whole serving path is value-checkable against a SQL oracle.

Runtime config (reference docs/sql/reference/queries/model-inference.md
"Configuration Options" + ml_predict_runtime_config):
  - 'async': 'true' routes batches through an ORDERED sliding
    bounded-concurrency window (the AsyncPredictRuntimeProvider analog; requires the
    factory to advertise ``supports_async``),
  - 'timeout': per-batch inference deadline ('100s', '500 ms', ...),
  - 'max-concurrent-operations': the async window width.
Output-name collisions rename with an index suffix (prediction →
prediction0), per the reference's documented note 3.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

_CONFIG_KEYS = {"async", "timeout", "max-concurrent-operations",
                "output-mode"}


class FixedPointLinearModel:
    """score = Σ_j w_j · floor(x_j · 1000), w_j = ((j·37) mod 21) − 10
    (j 1-based) — integer arithmetic end-to-end, engine-reproducible."""

    #: the AsyncPredictRuntimeProvider analog: safe to invoke from the
    #: async serving window (pure function of its batch)
    supports_async = True

    def __init__(self, dim: int):
        j = np.arange(1, dim + 1, dtype=np.int64)
        self.w = (j * 37) % 21 - 10

    def __call__(self, x: np.ndarray) -> dict[str, np.ndarray]:
        xq = np.floor(x.astype(np.float64) * 1000).astype(np.int64)
        score = xq @ self.w
        return {"score": score, "pred_label": np.abs(score) % 3}


def _parse_duration(text: str) -> float:
    """Flink-style duration literal → seconds ('100s', '500 ms', '2 min',
    '1 h'; bare numbers are milliseconds, the reference's default unit)."""
    m = re.match(r"^\s*(\d+(?:\.\d+)?)\s*(ms|s|sec|min|m|h)?\s*$",
                 str(text), re.IGNORECASE)
    if not m:
        raise ValueError(f"ML_PREDICT config: cannot parse duration {text!r}")
    n = float(m.group(1))
    unit = (m.group(2) or "ms").lower()
    return n * {"ms": 1e-3, "s": 1.0, "sec": 1.0, "min": 60.0, "m": 60.0,
                "h": 3600.0}[unit]


def _validate_config(config: dict | None) -> dict:
    cfg = dict(config or {})
    unknown = set(cfg) - _CONFIG_KEYS
    if unknown:
        raise ValueError(
            f"ML_PREDICT config: unsupported options {sorted(unknown)}; "
            f"supported: {sorted(_CONFIG_KEYS)}"
        )
    return cfg


def _collision_renames(df_cols: list[str], result_schema: str):
    """Reference model-inference.md note 3: an output column whose name
    already exists in the input renames to name+index (first free)."""
    from flink_spark.sqltok import split_top_commas

    taken = set(df_cols)
    renames: dict[str, str] = {}
    items = []
    for item in split_top_commas(result_schema):
        name, _, rest = item.strip().partition(" ")
        if name in taken:
            i = 0
            while f"{name}{i}" in taken:
                i += 1
            renames[name] = f"{name}{i}"
            name = f"{name}{i}"
        taken.add(name)
        items.append(f"{name} {rest}")
    return renames, ", ".join(items)


def ml_predict(
    df: DataFrame,
    model_factory,  # Callable[[int], model] — instantiated once per executor task
    input_col: str,
    result_schema: str = "score bigint, pred_label bigint",
    config: dict | None = None,
) -> DataFrame:
    """ML_PREDICT(TABLE df, MODEL m, DESCRIPTOR(input_col)[, CONFIG]):
    append the model's outputs. mapInPandas → one model invocation per
    Arrow batch (the batch IS the serving micro-batch; executor-local
    model instance, loaded once per task, never on the driver). With
    'async'='true', batches inside a partition serve through an ordered
    sliding bounded-concurrency window instead of strictly sequentially."""
    cfg = _validate_config(config)
    renames, result_schema = _collision_renames(df.columns, result_schema)
    is_async = str(cfg.get("async", "false")).lower() == "true"
    if is_async and not getattr(model_factory, "supports_async", False):
        raise ValueError(
            "ML_PREDICT with 'async'='true': the model provider does not "
            "implement the AsyncPredictRuntimeProvider contract "
            "(factory lacks supports_async)"
        )
    timeout = _parse_duration(cfg["timeout"]) if "timeout" in cfg else None
    max_conc = int(cfg.get("max-concurrent-operations", 10))
    if max_conc < 1:
        raise ValueError("ML_PREDICT config: max-concurrent-operations >= 1")
    out_mode = str(cfg.get("output-mode", "ORDERED")).upper()
    if out_mode not in ("ORDERED", "ALLOW_UNORDERED"):
        raise ValueError(
            f"ML_PREDICT config: output-mode must be ORDERED or "
            f"ALLOW_UNORDERED, got {out_mode!r}"
        )
    unordered = out_mode == "ALLOW_UNORDERED"

    def _emit(pdf, out):
        if renames:
            out = {renames.get(k, k): v for k, v in out.items()}
        return pd.concat([pdf, pd.DataFrame(out, index=pdf.index)], axis=1)

    def mapper(it):
        model = None
        for pdf in it:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf[input_col].to_numpy())
            if model is None:
                model = model_factory(x.shape[1])
            yield _emit(pdf, model(x))

    def mapper_async(it):
        # SLIDING ordered window of max_conc in-flight batches — the
        # AsyncWaitOperator ORDERED-mode analog: as each head batch
        # completes, the next one is admitted immediately (no chunk
        # barrier, so one slow batch never idles the other slots);
        # memory stays bounded by the window, emission order equals
        # arrival order
        import concurrent.futures
        import threading
        from collections import deque

        model = None
        init_lock = threading.Lock()

        def run(pdf):
            nonlocal model
            x = np.stack(pdf[input_col].to_numpy())
            with init_lock:  # window threads race the lazy init
                if model is None:
                    model = model_factory(x.shape[1])
            return pdf, model(x)

        live = (p for p in it if len(p))
        with concurrent.futures.ThreadPoolExecutor(max_conc) as pool:
            pending: deque = deque()

            def refill():
                while len(pending) < max_conc:
                    try:
                        pdf = next(live)
                    except StopIteration:
                        return
                    pending.append(pool.submit(run, pdf))

            refill()
            if unordered:
                # ALLOW_UNORDERED (reference ml_predict_runtime_config
                # output-mode → AsyncDataStream.OutputMode.UNORDERED):
                # emit completions as they land, topping the window back
                # up to max_conc IN-FLIGHT futures (in-flight, not
                # per-round submissions — the window must bound memory)
                live_set = set(pending)
                pending.clear()
                while live_set:
                    done, live_set = concurrent.futures.wait(
                        live_set, timeout=timeout,
                        return_when=concurrent.futures.FIRST_COMPLETED,
                    )
                    if not done:
                        raise TimeoutError(
                            f"ML_PREDICT: batch inference exceeded the "
                            f"configured timeout of {timeout}s"
                        )
                    for f in done:
                        pdf, out = f.result()
                        yield _emit(pdf, out)
                    while len(live_set) < max_conc:
                        try:
                            nxt = next(live)
                        except StopIteration:
                            break
                        live_set.add(pool.submit(run, nxt))
                return
            while pending:
                head = pending.popleft()
                try:
                    pdf, out = head.result(timeout=timeout)
                except concurrent.futures.TimeoutError:
                    raise TimeoutError(
                        f"ML_PREDICT: batch inference exceeded the "
                        f"configured timeout of {timeout}s"
                    ) from None
                refill()
                yield _emit(pdf, out)

    out_schema = df.schema.simpleString()[7:-1] + "," + result_schema
    return df.mapInPandas(
        mapper_async if is_async else mapper, schema=out_schema
    )
