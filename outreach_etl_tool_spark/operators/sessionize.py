"""Batch sessionization: gap-based session assignment (SURVEY.md §2.9 T3).

The streaming form is `session_window(ts, gap)` (streaming/ module);
this is the batch-SQL-equivalent used for oracle-checked queries and
backfills: per key, a new session starts when the gap from the
previous event exceeds the threshold; the session id is the cumulative
count of session starts.

Cost: one shuffle on the key (two window passes over the same
partitioning — Spark reuses the sort). Scales linearly; no state kept
beyond the sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_seconds: int,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Add a ``session_id`` column (1-based per key, ordered by time).

    ``order_tiebreak`` disambiguates equal timestamps so the session
    assignment is deterministic.
    """
    order: list[Column] = [F.col(ts)]
    if order_tiebreak:
        order.append(F.col(order_tiebreak))
    w = Window.partitionBy(key).orderBy(*order)
    # exact integer µs arithmetic (ntz → instant under the UTC session tz)
    ts_us = F.unix_micros(F.col(ts).cast("timestamp"))
    prev_us = F.lag(ts_us).over(w)
    is_new = F.when(
        prev_us.isNull() | (ts_us - prev_us > F.lit(gap_seconds * 1_000_000)), 1
    ).otherwise(0)
    cum = Window.partitionBy(key).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("session_id", F.sum(is_new).over(cum))
