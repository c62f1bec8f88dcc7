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


# -- Flink character-classification scalars (reference IS_ALPHA /
# -- IS_DECIMAL / IS_DIGIT in BuiltInFunctionDefinitions; implemented as
# -- JVM regexp expressions — codegen'd, no Python in the hot path) -------

def is_alpha(col):
    """IS_ALPHA(s): true iff every character is a letter (reference
    BuiltInFunctionDefinitions.IS_ALPHA). NULL-propagating; empty string
    is false, matching the reference."""
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    return c.rlike("^[A-Za-z]+$")


def is_digit(col):
    """IS_DIGIT(s): true iff every character is a decimal digit."""
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    return c.rlike("^[0-9]+$")


def is_decimal(col):
    """IS_DECIMAL(s): true iff the string parses as a SQL decimal
    (optional sign, digits, optional fraction, optional exponent)."""
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(r"^[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)([eE][+-]?[0-9]+)?$")
