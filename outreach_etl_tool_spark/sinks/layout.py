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

from pyspark.sql import DataFrame


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
