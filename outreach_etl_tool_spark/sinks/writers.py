"""Batch writers.

Scale notes:
- Partitioned parquet: one directory per partition value → partition
  pruning at read time (the durable analog of the reference's per-day
  scan chunking, outreach_etl.py:157-188). Data is repartitioned on
  the partition columns first so each partition writes a handful of
  files instead of num_tasks small files — the classic small-files
  failure at 100 TB.
- Bucketed tables: pre-shuffled on the bucket key at write time; joins
  and aggregations on that key then skip the exchange entirely
  (verified in tests by asserting the absence of a shuffle in the
  join plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    files_per_partition: int = 1,
) -> None:
    """Write parquet partitioned by ``partition_cols``."""
    out = df.repartition(*partition_cols) if files_per_partition == 1 else (
        df.repartition(files_per_partition, *partition_cols)
    )
    out.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Save as a bucketed (+optionally sorted) managed table."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


class BigQuerySink:
    """Reference-parity BigQuery loader (etl_tools.py:67-77).

    Delegates to the spark-bigquery connector, which runs a parallel
    load job from executors — unlike the reference's single-process
    in-memory upload. The connector jar is not shipped in this
    environment, so construction succeeds but ``write`` raises until
    one is on the classpath (documented stub, SURVEY.md §2.1 S4).
    """

    def __init__(self, project: str, dataset: str) -> None:
        self.project = project
        self.dataset = dataset

    def write(self, df: DataFrame, table: str, mode: str = "overwrite") -> None:
        target = f"{self.project}.{self.dataset}.{table}"
        try:
            (
                df.write.format("bigquery")
                .option("table", target)
                .option("writeMethod", "direct")
                .mode(mode)
                .save()
            )
        except Exception as exc:  # noqa: BLE001 — connector absent here
            raise NotImplementedError(
                "spark-bigquery connector not on the classpath; add "
                "com.google.cloud.spark:spark-bigquery-with-dependencies "
                "to spark.jars.packages to enable this sink"
            ) from exc
