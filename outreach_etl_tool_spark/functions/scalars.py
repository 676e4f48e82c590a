"""Scalar/aggregate helpers shared by the query library.

Determinism contract: the driver hash-compares Spark results against a
DuckDB oracle. Floating-point SUM/AVG are order-dependent, and Spark's
parallel partial aggregation sums in a different order than DuckDB's
scan — so any double SUM can differ in the last ulps and break the
hash. The fix is to make the aggregate exact: round each input to a
scaled 64-bit integer and sum integers (exact and order-free in both
engines), then divide back in one IEEE operation both engines perform
identically. Rounding agreement: both Spark (BigDecimal HALF_UP) and
DuckDB (half-away-from-zero) resolve an exactly-.5 scaled double away
from zero, and both compute the identical IEEE product first.

The SQL-side mirror of each helper lives in the oracle strings
(see queries/*.py); keep the two in sync.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def exact_sum(col: Column | str, scale: int = 2, precision: int = 30) -> Column:
    """Order-independent SUM over a double column → DOUBLE.

    Implementation: scaled-integer summation — ``round(x·10^s)`` to a
    BIGINT, summed exactly, divided back. Bit-identical to the same
    formula in DuckDB (``round`` is round-half-away-from-zero on the
    identical IEEE product in both engines) and ~2× faster than
    decimal aggregation, which this replaced. Headroom: 2^63/10^s —
    at scale 2 that is ~9·10^16 currency units; raise ``precision``
    ``scale`` trade-offs only via the SQL mirror in lockstep.
    """
    c = F.col(col) if isinstance(col, str) else col
    factor = 10**scale
    return (
        F.sum(F.round(c * factor).cast("bigint")).cast("double") / factor
    )


def exact_avg(col: Column | str, scale: int = 2, precision: int = 30) -> Column:
    """Order-independent AVG over a double column → DOUBLE: exact
    scaled-integer SUM, then one IEEE double division by COUNT —
    identical in Spark and DuckDB."""
    c = F.col(col) if isinstance(col, str) else col
    return exact_sum(c, scale, precision) / F.count(c)


def sum_sql(expr: str, scale: int = 2, precision: int = 30) -> str:
    """DuckDB oracle fragment mirroring :func:`exact_sum`."""
    factor = 10**scale
    return (
        f"CAST(SUM(CAST(ROUND(({expr}) * {factor}) AS BIGINT)) AS DOUBLE)"
        f" / {factor}"
    )


def avg_sql(expr: str, scale: int = 2, precision: int = 30) -> str:
    """DuckDB oracle fragment mirroring :func:`exact_avg`."""
    return f"({sum_sql(expr, scale, precision)}) / COUNT({expr})"
