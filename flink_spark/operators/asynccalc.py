"""Async calc: an asynchronous scalar function inside a projection
(reference StreamExecAsyncCalc / AsyncScalarFunction.java; DataStream
analog AsyncWaitOperator.java — ordered mode).

Spark mapping: `mapInPandas` batches rows through an asyncio event loop —
every row in the Arrow batch issues its awaitable concurrently and results
are gathered back IN ROW ORDER (Flink's ORDERED output mode; per-partition
order is preserved end-to-end). At scale each executor core drives its own
loop, so total in-flight concurrency = cores × batch concurrency, without
any thread pools or row-at-a-time latency stacking.
"""

from __future__ import annotations

import asyncio
from collections.abc import Awaitable, Callable

from pyspark.sql import DataFrame


def async_calc(
    df: DataFrame,
    async_fn: "Callable[[dict], Awaitable[dict]]",
    result_schema: str,
    concurrency: int = 64,
) -> DataFrame:
    """Append columns computed by ``async_fn(row_dict) -> dict`` awaited
    concurrently (bounded by ``concurrency``) per Arrow batch. A result
    dict may omit columns — absent values null-pad (same contract as
    the lookup joins; see joins._null_padded)."""
    import pandas as pd

    from flink_spark.operators.joins import (
        _null_padded,
        _result_field_names,
    )

    res_names = _result_field_names(result_schema)

    async def run_batch(rows: list[dict]) -> list[dict]:
        sem = asyncio.Semaphore(concurrency)

        async def one(r):
            async with sem:
                return await async_fn(r)

        return list(await asyncio.gather(*[one(r) for r in rows]))

    def mapper(it):
        for pdf in it:
            results = asyncio.run(run_batch(pdf.to_dict("records")))
            res = _null_padded(pd, results, pdf.index, res_names)
            yield pd.concat([pdf, res], axis=1)

    out_schema = df.schema.simpleString()[7:-1] + "," + result_schema
    return df.mapInPandas(mapper, schema=out_schema)
