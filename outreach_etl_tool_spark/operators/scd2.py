"""SCD2 history building: change-compressed validity intervals
(SURVEY.md §2.9 T6 extension — the warehouse-side shape of the
reference's re-pull-and-replace sync).

The reference replaces each endpoint's rows wholesale per sync
(outreach_etl.py:227-229), losing history. The warehouse-standard
alternative is a type-2 slowly-changing dimension: one row per
(key, version) with ``valid_from``/``valid_to``/``is_current``, where
consecutive observations whose tracked attributes did not change are
COMPRESSED into one interval (a CRM pulls the same unchanged prospect
every day — storing 365 identical dailies per prospect is pure waste).

Both steps are single-window DataFrame compositions (shuffle by key,
sort by observation time — the same cost profile as `win_latest_per_key`),
so the build is oracle-checkable and scales like any keyed window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _order(ts: str, tiebreak: list[str] | None):
    # nulls-first is Spark's asc default, but spelled explicitly: a
    # null-ts observation must sort BEFORE real timestamps (it is the
    # oldest knowledge we have), and relying on the engine default
    # would silently flip if a caller ports the window to SQL
    return [F.asc_nulls_first(ts), *(F.asc(c) for c in (tiebreak or []))]


def compress_history(
    observations: DataFrame,
    key: str,
    ts: str,
    tracked: list[str],
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Drop consecutive observations whose ``tracked`` columns are all
    unchanged from the previous observation of the same key (the first
    observation of each key always survives). Null-safe comparison:
    null → null is "unchanged", null → value is a change. ``tiebreak``
    columns make equal-timestamp observations deterministic."""
    w = Window.partitionBy(key).orderBy(*_order(ts, tiebreak))
    changed = F.lit(False)
    for c in tracked:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
    # first row by position, NOT lag(ts).isNull(): the lag form also
    # fires when the PREVIOUS row's ts is null, letting an unchanged
    # successor of a null-ts observation survive compression
    is_first = F.row_number().over(w) == 1
    return (
        observations.withColumn("__keep", is_first | changed)
        .filter(F.col("__keep"))
        .drop("__keep")
    )


def scd2_intervals(
    changes: DataFrame,
    key: str,
    ts: str,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Attach validity: ``valid_from`` = the change's own timestamp,
    ``valid_to`` = the next change's timestamp for the key (null while
    current), ``is_current`` on the open interval."""
    w = Window.partitionBy(key).orderBy(*_order(ts, tiebreak))
    valid_to = F.lead(ts).over(w)
    return (
        changes.withColumn("valid_from", F.col(ts))
        .withColumn("valid_to", valid_to)
        .withColumn("is_current", valid_to.isNull())
    )


def build_scd2(
    observations: DataFrame,
    key: str,
    ts: str,
    tracked: list[str],
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Change-compress then interval-ize: the full SCD2 build from a
    raw observation log. One logical shuffle — both windows share the
    (key, ts) sort, so Catalyst reuses the exchange."""
    return scd2_intervals(
        compress_history(observations, key, ts, tracked, tiebreak),
        key, ts, tiebreak,
    )
