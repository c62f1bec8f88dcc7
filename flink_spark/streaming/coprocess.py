"""Connected streams / co-process (reference DataStream.connect →
ConnectedStreams, CoProcessFunction; broadcast-state pattern
BroadcastProcessFunction — SURVEY §2.13 "union/connect/broadcast state").

Spark mapping: Structured Streaming has no two-input operator, so the two
streams are tagged and UNIONed (schemas null-padded onto a common shape),
then a single keyed stateful processor sees both sides' rows per key and
micro-batch — exactly the classic Flink workaround *and* what connect
lowers to in a shuffle-based runtime anyway: both inputs hash to the same
key partition.

The canonical use — a slow control/rules stream steering a fast data
stream — keeps the latest rule per key in state (the keyed analog of
broadcast state; a truly global rule uses a constant key plus a
repartition of the data stream onto it, or a `foreachBatch` stream-static
join when rules live in a table).

Scale: one shuffle of both streams on the key; state is whatever the
co-process keeps (for rules: O(1) per key).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import BinaryType, StructField, StructType


def co_process(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    fn: "Callable",  # fn(key, left_pdf, right_pdf, state: dict) -> pandas df
    out_schema: str,
    left_seq: list[str],
    right_seq: list[str],
) -> DataFrame:
    """Keyed two-input processor: ``fn`` receives, per key and micro-batch,
    both sides' rows (each ordered by its seq cols) plus a persistent dict.
    Column names may overlap between the sides — they are disambiguated
    internally and restored before ``fn`` sees them."""
    import pandas as pd
    import pickle

    from pyspark.sql.types import _parse_datatype_string

    lcols = [c for c in left.columns if c not in key_cols]
    rcols = [c for c in right.columns if c not in key_cols]

    l_tag = left.select(
        *key_cols,
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in rcols],
    )
    r_tag = right.select(
        *key_cols,
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in lcols],
        *[F.col(c).alias(f"__r_{c}") for c in rcols],
    )
    unioned = l_tag.unionByName(r_tag)

    out_struct = StructType(
        _parse_datatype_string(f"struct<{out_schema}>").fields
    )
    state_schema = StructType([StructField("blob", BinaryType(), True)])

    def runner(key, pdfs, state):
        pdf = pd.concat(list(pdfs), ignore_index=True)
        lp = pdf[pdf["__side"] == 0][[*key_cols, *[f"__l_{c}" for c in lcols]]]
        lp.columns = [*key_cols, *lcols]
        if left_seq:
            lp = lp.sort_values(left_seq, kind="mergesort")
        rp = pdf[pdf["__side"] == 1][[*key_cols, *[f"__r_{c}" for c in rcols]]]
        rp.columns = [*key_cols, *rcols]
        if right_seq:
            rp = rp.sort_values(right_seq, kind="mergesort")
        st = pickle.loads(state.get[0]) if state.exists else {}
        out = fn(key, lp, rp, st)
        state.update((pickle.dumps(st),))
        if out is not None and len(out):
            yield out

    return unioned.groupBy(*key_cols).applyInPandasWithState(
        runner, out_struct, state_schema, "append", GroupStateTimeout.NoTimeout
    )
