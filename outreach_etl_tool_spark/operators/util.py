"""Physical-plan hygiene helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame

# (applicationId, analyzed-plan semanticHash) → scan partition count.
# Deriving the RDD to count partitions costs ~65 ms of driver-side
# physical planning PER QUERY BUILD; the semantic hash costs ~20 ms and
# repeats across builds of the same table scan (every registry query
# loads from the same catalog), so the probe amortizes to one RDD
# conversion per distinct plan per session. Staleness is bounded by the
# key: applicationId is unique per SparkContext lifetime (unlike id(),
# which the allocator can reuse after a stopped context is GC'd), and
# same-plan-over-changed-files reuse is harmless for perf-only
# repartitioning and impossible for the read-only testdata. Entries
# from dead applications are evicted whenever a new application shows
# up, so the module-level dict can't grow across sessions.
_PARTITIONS_CACHE: dict[tuple[str, int], int] = {}


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
    try:
        # semanticHash has no public pyspark wrapper; if the private
        # surface drifts on a Spark upgrade, degrade to uncached probes
        # (correct, just ~65 ms slower per build) instead of breaking.
        key = (sc.applicationId, df._jdf.queryExecution().analyzed().semanticHash())
    except Exception:  # noqa: BLE001
        key = None
    n = _PARTITIONS_CACHE.get(key) if key is not None else None
    if n is None:
        n = df.rdd.getNumPartitions()
        if key is not None:
            if any(app != key[0] for app, _ in _PARTITIONS_CACHE):
                stale = [k for k in _PARTITIONS_CACHE if k[0] != key[0]]
                for k in stale:
                    del _PARTITIONS_CACHE[k]
            _PARTITIONS_CACHE[key] = n
    if n >= max(2, target // 2):
        return df
    return df.repartition(target)
