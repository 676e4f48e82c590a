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
The forward and nearest directions (pandas merge_asof parity) reuse
the same single-shuffle design: forward flips the tie order and fills
from a FOLLOWING frame; nearest computes backward and forward fills
over one sorted partition and picks the closer (ties -> backward).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _ordinal(c: Column, dtype) -> Column:
    """Monotone integer image of a timestamp/numeric order column, for
    the nearest-direction distance compare. TIMESTAMP_NTZ goes through
    a cast to TIMESTAMP first (the session runs UTC, so the wall-clock
    reinterpretation is the identity and unix_micros stays exact)."""
    if dtype.typeName() == "timestamp_ntz":
        return F.unix_micros(c.cast("timestamp"))
    if dtype.typeName().startswith("timestamp"):
        return F.unix_micros(c)
    return c.cast("long")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    how: str = "left",
    direction: str = "backward",
) -> DataFrame:
    """Attach a ``right`` payload row to each left row by time.

    ``direction`` (pandas merge_asof parity):
      * ``backward`` — latest right row at or before the left ts;
      * ``forward``  — earliest right row at or after the left ts;
      * ``nearest``  — whichever of the two is closer; exact ties
        resolve BACKWARD (distance 0 is the equal-ts right row, which
        both sides see — documented, deterministic).

    Returns ``left``'s columns plus ``payload`` columns from ``right``
    (null when no right row qualifies, unless ``how='inner'`` which
    drops such rows). Every direction costs the SAME one shuffle of
    |L|+|R| rows: forward is the backward algorithm under the reversed
    tie order with a FOLLOWING frame; nearest computes both fills over
    one sorted partition (two frames, one sort)."""
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")

    rts_type = right.schema[right_ts].dataType
    l_tag = left.select(
        F.col(on).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*left.columns).alias("__left"),
        F.lit(None).cast(rts_type).alias("__rts"),
        *[F.lit(None).cast(right.schema[p].dataType).alias(p) for p in payload],
    )
    r_tag = right.select(
        F.col(on).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l_tag.schema["__left"].dataType).alias("__left"),
        F.col(right_ts).alias("__rts"),
        *[F.col(p) for p in payload],
    )
    unioned = l_tag.unionByName(r_tag)

    if direction == "backward":
        w = (
            Window.partitionBy("__key")
            .orderBy("__ts", "__side")  # right (0) before left on ties
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = unioned.select(
            "__side",
            "__left",
            *[F.last(p, ignorenulls=True).over(w).alias(p) for p in payload],
        )
    elif direction == "forward":
        # ascending ts with LEFT (1) first on ties, so an equal-ts right
        # row lands in the following frame — "at or after" stays inclusive
        w = (
            Window.partitionBy("__key")
            .orderBy("__ts", F.desc("__side"))
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        filled = unioned.select(
            "__side",
            "__left",
            *[F.first(p, ignorenulls=True).over(w).alias(p) for p in payload],
        )
    else:  # nearest: both fills over ONE sorted partition
        base = (
            Window.partitionBy("__key").orderBy("__ts", "__side")
        )
        wb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        wf = base.rowsBetween(1, Window.unboundedFollowing)
        # the strictly-following frame misses an equal-ts right row, but
        # that row is distance 0 on the backward side and ties resolve
        # backward — the chooser still picks it
        both = unioned.select(
            "__side",
            "__left",
            "__ts",
            F.last("__rts", ignorenulls=True).over(wb).alias("__brts"),
            F.first("__rts", ignorenulls=True).over(wf).alias("__frts"),
            *[F.last(p, ignorenulls=True).over(wb).alias(f"__b_{p}") for p in payload],
            *[F.first(p, ignorenulls=True).over(wf).alias(f"__f_{p}") for p in payload],
        )
        bw_dist = _ordinal(F.col("__ts"), rts_type) - _ordinal(
            F.col("__brts"), rts_type
        )
        fw_dist = _ordinal(F.col("__frts"), rts_type) - _ordinal(
            F.col("__ts"), rts_type
        )
        use_bw = F.col("__brts").isNotNull() & (
            F.col("__frts").isNull() | (bw_dist <= fw_dist)
        )
        filled = both.select(
            "__side",
            "__left",
            *[
                F.when(use_bw, F.col(f"__b_{p}"))
                .otherwise(F.col(f"__f_{p}"))
                .alias(p)
                for p in payload
            ],
        )

    out = filled.filter(F.col("__side") == 1).select("__left.*", *payload)
    if how == "inner":
        non_null: Column = F.lit(False)
        for p in payload:
            non_null = non_null | F.col(p).isNotNull()
        out = out.filter(non_null)
    return out
