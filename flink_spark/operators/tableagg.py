"""Table aggregate (UDTAF) operator: an aggregate that emits 0..n rows per
group (reference TableAggregateFunction.java; runtime
.../operators/aggregate/GroupTableAggFunction.java, exec
StreamExecGroupTableAggregate).

Spark mapping: `groupBy(keys).applyInPandas(fn, schema)` — Arrow-batched,
one shuffle on the group keys, the emit function runs group-local on
executors. At scale this behaves exactly like a hash aggregate whose
accumulator can flush multiple rows; skewed groups are the same hazard as
any groupBy and get the same remedies (salt + re-merge, AQE skew split).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame


def group_table_agg(
    df: DataFrame,
    keys: list[str],
    emit: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str,
) -> DataFrame:
    """Apply a table-aggregate `emit` (pandas in → pandas out, any number
    of rows) per distinct key combination."""
    return df.groupBy(*keys).applyInPandas(emit, schema)
