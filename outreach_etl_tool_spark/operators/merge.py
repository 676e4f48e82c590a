"""MERGE INTO / CDC-apply: reconcile a change feed with a base snapshot.

The reference's incremental sync re-pulls updated rows and overwrites
downstream (SURVEY.md §2.8 T6; outreach_etl.py's updatedAt window) —
the general form of that operation is the three-way MERGE every
warehouse engine ships (upsert + delete + insert in one pass). Spark
has no built-in MERGE over plain parquet, so this operator expresses
it as the canonical two-shuffle plan:

1. compact the change feed to the latest change per key (row_number
   over (key ORDER BY seq DESC) — a CDC stream may carry many changes
   for one key; last writer wins);
2. full-outer join base ⋈ compacted-changes on the key (full outer:
   unmatched base rows pass through, unmatched 'U' changes insert);
3. resolve per row: no change → base values; 'U' → change values
   (replace-or-insert); 'D' → drop.

Scale shape: one window shuffle over the (small) change feed, one
full-outer sort-merge shuffle on the key — the same plan Delta/Iceberg
produce for unpartitioned MERGE. Changes are typically ≪ base; the
base side never moves more than once. No driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: change-operation codes understood by :func:`merge_cdc`
OP_UPSERT = "U"
OP_DELETE = "D"


def merge_cdc(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    op_col: str = "op",
    seq_col: str | None = None,
) -> DataFrame:
    """Apply ``changes`` (columns = base columns + op [+ seq]) to ``base``.

    ``op`` is 'U' (insert-or-replace) or 'D' (delete). With ``seq_col``
    the highest sequence number per key wins before the merge; without
    it the feed must be at most one change per key (enforced nowhere —
    callers with raw CDC streams should always pass a sequence).
    """
    value_cols = [c for c in base.columns if c not in keys]
    if seq_col is not None:
        w = Window.partitionBy(*keys).orderBy(F.desc(seq_col))
        changes = (
            changes.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", seq_col)
        )
    ch = changes.select(
        *[F.col(k).alias(f"__k_{k}") for k in keys],
        F.col(op_col).alias("__op"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    cond = None
    for k in keys:
        c = base[k] == ch[f"__k_{k}"]
        cond = c if cond is None else (cond & c)
    joined = base.join(ch, cond, "full_outer")
    # resolve: deletes drop; 'U' takes change values; untouched rows
    # keep base values; inserted keys come from the change key columns
    resolved = joined.filter(
        F.col("__op").isNull() | (F.col("__op") != OP_DELETE)
    )
    out_cols = [
        F.coalesce(base[k], F.col(f"__k_{k}")).alias(k) for k in keys
    ] + [
        F.when(F.col("__op") == OP_UPSERT, F.col(f"__v_{c}"))
        .otherwise(base[c])
        .alias(c)
        for c in value_cols
    ]
    return resolved.select(*out_cols)
