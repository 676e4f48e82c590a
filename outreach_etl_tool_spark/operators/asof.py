"""As-of join: for each left row, the most recent right row at or
before the left timestamp, per key (SURVEY.md §2.3 J8 — "latest
sequence state at mailing time").

Spark has no native as-of join. The naive form (theta-join on
``r.ts <= l.ts`` + groupBy max) explodes to O(|L|·|R|) rows per key
before aggregating — unusable at 100 TB. This implementation is the
union-sort-window algorithm:

1. tag both sides, union by name (right rows carry their payload,
   left rows carry null payload);
2. one shuffle: window partitioned by key, ordered by
   (ts, side) with right rows sorting before left rows on ts ties so
   "at or before" is inclusive;
3. ``last(payload, ignorenulls=True)`` over the unbounded-preceding
   frame gives every left row the latest right payload.

Cost: ONE shuffle of |L|+|R| rows on the join key — the same cost as
a regular sort-merge join, no row explosion, skew handled by AQE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    how: str = "left",
) -> DataFrame:
    """Attach the latest ``right`` payload at-or-before each left row.

    Returns ``left``'s columns plus ``payload`` columns from ``right``
    (null when no right row precedes, unless ``how='inner'`` which
    drops such rows).
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")

    l_tag = left.select(
        F.col(on).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*left.columns).alias("__left"),
        *[F.lit(None).cast(right.schema[p].dataType).alias(p) for p in payload],
    )
    r_tag = right.select(
        F.col(on).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l_tag.schema["__left"].dataType).alias("__left"),
        *[F.col(p) for p in payload],
    )

    unioned = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy("__key")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "__side",
        "__left",
        *[F.last(p, ignorenulls=True).over(w).alias(p) for p in payload],
    ).filter(F.col("__side") == 1)

    out = filled.select("__left.*", *payload)
    if how == "inner":
        non_null: Column = F.lit(False)
        for p in payload:
            non_null = non_null | F.col(p).isNotNull()
        out = out.filter(non_null)
    return out
