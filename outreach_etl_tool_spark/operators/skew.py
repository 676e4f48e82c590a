"""Skew mitigation (SURVEY.md §4; BASELINE.json 100 TB clause).

AQE's skew-join splitting (on in session.py) handles most cases at
runtime; these explicit forms cover what AQE cannot: broadcast-infeasible
skewed joins planned ahead of time, and count-distinct hot keys (a
single reducer receiving one giant group).

- :func:`salted_join` — the left (large, skewed) side gets a
  deterministic salt in [0, salt); the right side is replicated ×salt.
  The join key becomes (key, salt), splitting each hot key's rows
  across `salt` reducers. Replication cost: |right| × salt rows —
  choose the smaller side as `right`.
- :func:`salted_count_distinct` — two-phase distinct: phase 1 dedups
  (key, value-hash-salt, value) partitions, phase 2 sums partial
  distinct counts per key. A hot key's distinct set never convenes on
  one task.

Both are plain DataFrame compositions — deterministic (hash salts, not
rand()), so results are reproducible and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_col(cols: list[str], salt: int) -> Column:
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(salt)).cast("int")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    salt: int = 16,
    how: str = "inner",
    salt_by: list[str] | None = None,
) -> DataFrame:
    """Equi-join with the left side's hot keys split across ``salt``
    reducers. ``salt_by`` names left columns whose hash spreads rows
    within a key (defaults to all non-key columns)."""
    if how not in ("inner", "left", "left_semi", "left_anti"):
        # right/full outer would emit each unmatched right row ×salt
        raise ValueError(f"salted_join supports left-shaped joins, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    spread = salt_by or [c for c in left.columns if c not in keys]
    if not spread:
        spread = keys  # degenerate: nothing to spread by
    l_salted = left.withColumn("__salt", _salt_col(spread, salt))
    r_salted = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = l_salted.join(r_salted, [*keys, "__salt"], how)
    return out.drop("__salt")


def salted_count_distinct(
    df: DataFrame,
    key: str,
    value: str,
    salt: int = 16,
) -> DataFrame:
    """count(DISTINCT value) per key without convening any key's full
    distinct set on one task.

    Phase 1 groups by (key, hash(value) % salt) and counts distinct
    values inside each salt bucket — buckets partition the value space,
    so bucket-local distinct counts are disjoint and exact. Phase 2
    sums the bucket counts per key."""
    bucket = F.pmod(F.xxhash64(F.col(value)), F.lit(salt)).cast("int")
    partial = (
        df.select(F.col(key), F.col(value), bucket.alias("__b"))
        .groupBy(key, "__b")
        .agg(F.countDistinct(value).alias("__d"))
    )
    return partial.groupBy(key).agg(F.sum("__d").alias("n_distinct"))
