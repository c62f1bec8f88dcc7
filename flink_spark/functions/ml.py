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
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


class FixedPointLinearModel:
    """score = Σ_j w_j · floor(x_j · 1000), w_j = ((j·37) mod 21) − 10
    (j 1-based) — integer arithmetic end-to-end, engine-reproducible."""

    def __init__(self, dim: int):
        j = np.arange(1, dim + 1, dtype=np.int64)
        self.w = (j * 37) % 21 - 10

    def __call__(self, x: np.ndarray) -> dict[str, np.ndarray]:
        xq = np.floor(x.astype(np.float64) * 1000).astype(np.int64)
        score = xq @ self.w
        return {"score": score, "pred_label": np.abs(score) % 3}


def ml_predict(
    df: DataFrame,
    model_factory,  # Callable[[int], model] — instantiated once per executor task
    input_col: str,
    result_schema: str = "score bigint, pred_label bigint",
) -> DataFrame:
    """ML_PREDICT(TABLE df, MODEL m, DESCRIPTOR(input_col)): append the
    model's outputs. mapInPandas → one model invocation per Arrow batch
    (the batch IS the serving micro-batch; executor-local model instance,
    loaded once per task, never on the driver)."""

    def mapper(it):
        model = None
        for pdf in it:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf[input_col].to_numpy())
            if model is None:
                model = model_factory(x.shape[1])
            out = model(x)
            yield pd.concat(
                [pdf, pd.DataFrame(out, index=pdf.index)], axis=1
            )

    out_schema = df.schema.simpleString()[7:-1] + "," + result_schema
    return df.mapInPandas(mapper, schema=out_schema)
