"""Scalar/aggregate helpers shared by the query library.

Determinism contract: the driver hash-compares Spark results against a
DuckDB oracle. Floating-point SUM/AVG are order-dependent, and Spark's
parallel partial aggregation sums in a different order than DuckDB's
scan — so any double SUM can differ in the last ulps and break the
hash. The fix is to make the aggregate exact: cast each input to a
DECIMAL before summing (decimal aggregation is exact in both engines),
then cast the final value back to DOUBLE (a well-defined
nearest-double conversion both engines perform identically).

Scale choice: scale >= 2 means the rounding boundary (x.xx5) is never
exactly representable in binary, so Spark's HALF_UP and any
round-to-nearest disagree on no actual double input.

The SQL-side mirror of each helper lives in the oracle strings
(see queries/*.py); keep the two in sync.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def exact_sum(col: Column | str, scale: int = 2, precision: int = 30) -> Column:
    """Order-independent SUM over a double column → DOUBLE.

    Spark mirror of ``CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def exact_avg(col: Column | str, scale: int = 2, precision: int = 30) -> Column:
    """Order-independent AVG over a double column → DOUBLE.

    Computed as exact-decimal SUM cast to double, divided by COUNT in
    IEEE double — one double division, identical in Spark and DuckDB.
    SQL mirror: ``CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE) / COUNT(x)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return exact_sum(c, scale, precision) / F.count(c)


def sum_sql(expr: str, scale: int = 2, precision: int = 30) -> str:
    """DuckDB oracle fragment mirroring :func:`exact_sum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL({precision},{scale}))) AS DOUBLE)"


def avg_sql(expr: str, scale: int = 2, precision: int = 30) -> str:
    """DuckDB oracle fragment mirroring :func:`exact_avg`."""
    return f"{sum_sql(expr, scale, precision)} / COUNT({expr})"
