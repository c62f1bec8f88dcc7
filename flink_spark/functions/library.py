"""Small library of ready-made ScalarFunctions resolvable from SQL-text
function DDL (``CREATE FUNCTION f AS 'flink_spark.functions.library.X'``)
— the analog of the reference's test/function catalog classes used
throughout FunctionITCase (flink-table/flink-table-planner/src/test/.../
runtime/stream/sql/FunctionITCase.java)."""

from __future__ import annotations

import pandas as pd

from flink_spark.functions.udf import ScalarFunction


class BitCountFn(ScalarFunction):
    """Population count of a non-negative integer (per-bit semantics of
    the two's-complement value, matching DuckDB/Spark ``bit_count``)."""

    result_type = "int"

    def eval(self, x):
        return None if x is None else bin(x & (2**64 - 1)).count("1")

    def eval_batch(self, col: pd.Series) -> pd.Series:
        return col.map(self.eval).astype("Int32")


class DigitSumFn(ScalarFunction):
    """Sum of the decimal digits of a non-negative integer."""

    result_type = "int"

    def eval(self, x):
        return None if x is None else sum(int(c) for c in str(abs(int(x))))

    def eval_batch(self, col: pd.Series) -> pd.Series:
        return col.map(self.eval).astype("Int32")


def upper_trim(s):
    """Plain-callable example (non-ScalarFunction path of the DDL)."""
    return None if s is None else s.strip().upper()
