"""Cross-engine numeric determinism helpers.

The correctness gate hash-matches values between Spark and DuckDB. Floating
sums are order-dependent, so every aggregate over DOUBLE columns follows one
discipline, applied identically in the Spark program and the oracle SQL:

  1. per-row arithmetic in DOUBLE (both engines execute the same IEEE ops),
  2. cast each row term to DECIMAL before SUM → exact, order-independent,
  3. cast the final decimal back to DOUBLE (well-defined nearest rounding),
  4. averages = CAST(decimal_sum AS DOUBLE) / count — one IEEE division.

This yields bit-identical doubles on both engines regardless of row order,
partitioning, or partial-aggregation splits — which is exactly what makes it
safe at 1000-executor scale too (no nondeterministic reduce trees).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Decimal wide enough for sf100-scale sums of money-sized terms.
DEC = "DECIMAL(30,6)"


def dsum(col: Column | str, alias: str) -> Column:
    """Order-independent exact sum of a double expression → DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """avg = double(exact decimal sum) / count, one IEEE division."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST(({expr}) AS {DEC})) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST(({expr}) AS {DEC})) AS DOUBLE) / COUNT({expr}) AS {alias}"
    )
