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
