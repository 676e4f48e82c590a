"""Physical-plan hygiene helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition iff the input is under-split for the cluster.

    Compute-heavy narrow operators (shingling, hashing, vector math)
    inherit the scan's partitioning. A parquet file with one row group
    is unsplittable — on local[32] it pins the whole operator to one
    core. On a real cluster inputs arrive in many splits and this is a
    no-op; locally it costs one round-robin shuffle and buys full CPU
    utilization.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= max(2, target // 2):
        return df
    return df.repartition(target)
