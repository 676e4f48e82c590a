"""Data-layout control: clustered writes for scan pruning.

At 100 TB the cheapest query is the one that never reads the data:
partition pruning (write_partitioned) covers coarse categorical keys;
for range predicates the tool is *clustering* — repartitionByRange +
sortWithinPartitions before writing, so every output file covers a
narrow, disjoint range and parquet's row-group min/max statistics let
the reader skip almost all of them. (Z-order generalizes this to
multiple columns; for the one-column case, range-sorting IS optimal.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered on ``cluster_cols``: ranges are disjoint
    across files and sorted within each, so min/max pruning works for
    range predicates on those columns."""
    (
        df.repartitionByRange(n_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode(mode)
        .parquet(path)
    )


def compact_parquet(
    spark,
    src: str,
    dest: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> int:
    """Small-file compaction: rewrite a fragmented parquet directory
    into ``ceil(total_bytes / target)`` right-sized files, returning
    the output file count.

    The small-files problem is a top operational cost at 100 TB —
    every micro-batch/upsert leaves files far below the HDFS/S3 sweet
    spot, and scan planning then pays per-file open/footer overhead.
    Sizing uses the source FILE LISTING only (driver-side metadata, no
    data read); the rewrite is one distributed pass. ``sort_cols``
    optionally restores clustering during the rewrite (compaction is
    the natural moment to re-sort); plain compaction uses coalesce()
    — no shuffle, each output file concatenates input splits.

    Writes to ``dest`` rather than in place: an in-place rewrite that
    fails mid-way loses data, so callers swap directories (or manifest
    pointers — sinks/manifest.py) after the write commits.
    """
    import math
    from pathlib import Path

    total = sum(
        f.stat().st_size
        for f in Path(src).rglob("*.parquet")
        if not f.name.startswith((".", "_"))
    )
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src)
    if sort_cols:
        out = df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        out = df.coalesce(n_files)
    out.write.mode(mode).parquet(dest)
    return n_files


def zorder_key(df: DataFrame, cols: list[str], bits: int = 8) -> Column:
    """Morton (z-order) key over ``cols``: each column is equal-width
    bucketed into ``2^bits`` buckets between its observed min/max, and
    the bucket bits are interleaved. Rows close in z-key are close in
    EVERY keyed dimension, so range-sorting on it gives each output
    file a narrow min/max envelope on all the columns at once — the
    multi-column generalization of write_clustered.

    The only driver-side state is 2·len(cols) scalars (one min/max
    agg); bucketing + interleaving are pure JVM projections inside
    whole-stage codegen. Equal-width bucketing is the deliberate
    trade: quantile cutpoints handle skew better but cost a pass per
    column — callers with pathological skew should pre-transform
    (e.g. log) the column instead.
    """
    n_buckets = 1 << bits
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"lo_{i}") for i, c in enumerate(cols)],
        *[F.max(c).cast("double").alias(f"hi_{i}") for i, c in enumerate(cols)],
    ).first()
    bucketed: list[Column] = []
    for i, c in enumerate(cols):
        lo, hi = stats[f"lo_{i}"], stats[f"hi_{i}"]
        if lo is None or hi is None or hi <= lo:
            bucketed.append(F.lit(0).cast("long"))
            continue
        wb = F.width_bucket(
            F.col(c).cast("double"), F.lit(lo), F.lit(hi), F.lit(n_buckets)
        )
        # width_bucket maps the upper boundary (and any null→0 edge)
        # outside 1..n; clamp, then shift to 0-based
        bucketed.append(
            (F.greatest(F.lit(1), F.least(F.lit(n_buckets), wb)) - 1).cast("long")
        )
    z = F.lit(0).cast("long")
    k = len(cols)
    for bit in range(bits):
        for i, b in enumerate(bucketed):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(b, bit).bitwiseAND(F.lit(1)), bit * k + i
                )
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    bits: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write parquet z-ordered on ``cols``: range-partition + sort on
    the interleaved Morton key, so parquet min/max stats stay narrow
    on every keyed column and a predicate on ANY of them skips most
    row groups — where single-column clustering only serves its one
    column. The helper key column never reaches the files (projection
    after the sort preserves row order; no exchange in between)."""
    zdf = df.withColumn("__zorder", zorder_key(df, cols, bits=bits))
    (
        zdf.repartitionByRange(n_files, "__zorder")
        .sortWithinPartitions("__zorder")
        .drop("__zorder")
        .write.mode(mode)
        .parquet(path)
    )
