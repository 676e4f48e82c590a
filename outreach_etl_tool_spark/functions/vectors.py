"""Vector math over ArrayType(FloatType) embedding columns.

All computation stays JVM-side via higher-order functions (transform /
zip_with / aggregate) — no Python UDF in the hot path. Elements are
cast to double BEFORE multiplying so each product is exact (a
float×float product fits in a double's 53-bit mantissa), and the fold
is a deterministic left-to-right sum — matching DuckDB's
list_dot_product on DOUBLE[] bit-for-bit for oracle comparison.

At 100 TB these expressions run inside whole-stage codegen; the 64-dim
dot product is ~64 fused multiply-adds per row, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _to_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two float/double array columns → double."""
    prods = F.zip_with(_to_double_array(a), _to_double_array(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column | str) -> Column:
    """Euclidean (L2) norm → double."""
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity → double. Zero-norm inputs yield null (ANSI
    mode would otherwise fail the whole job on one degenerate vector)."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))


# --- SQL-text builders -----------------------------------------------------
# Building the HOF tree through the Column API costs one py4j round trip
# per lambda/lit node (~400 for a 64-dim cosine — ~0.15 s of pure driver
# latency PER PLAN BUILD). Emitting the same expression as one SQL
# string parsed JVM-side collapses that to a single call; the resolved
# tree (and therefore the arithmetic) is identical.

def _dbl_sql(col_sql: str) -> str:
    return f"transform({col_sql}, x -> CAST(x AS DOUBLE))"


def dot_sql(a_sql: str, b_sql: str) -> str:
    """SQL text for the same left-fold dot product as :func:`dot`."""
    return (
        f"aggregate(zip_with({_dbl_sql(a_sql)}, {_dbl_sql(b_sql)},"
        f" (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def lit_vec_sql(vec: list[float]) -> str:
    """SQL array literal of doubles (repr round-trips exactly)."""
    return "array(" + ",".join(f"CAST({float(v)!r} AS DOUBLE)" for v in vec) + ")"


def cosine_vs_lit_sql(vec_sql: str, query: list[float], qnorm: float) -> str:
    """SQL text for cosine(vec, query-literal) with the query norm
    pre-folded driver-side (same left-to-right IEEE fold)."""
    q = lit_vec_sql(query)
    return (
        f"try_divide({dot_sql(vec_sql, q)},"
        f" sqrt({dot_sql(vec_sql, vec_sql)}) * CAST({float(qnorm)!r} AS DOUBLE))"
    )
