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

from dataclasses import dataclass
from typing import Callable

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
    path: str | None = None,
) -> None:
    """Save as a bucketed (+optionally sorted) table.

    ``path`` makes it an EXTERNAL table at that location instead of a
    managed one under spark.sql.warehouse.dir — bucketing metadata
    lives in the session catalog either way (plain parquet readers see
    ordinary files; only ``spark.table(name)`` gets the exchange-free
    join)."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


@dataclass(frozen=True)
class LoadRequest:
    """One assembled BigQuery load: the staged parquet files plus the
    job parameters a client needs. Mirrors what the reference's
    ``client.load_table_from_dataframe`` call carries
    (etl_tools.py:67-77), with the data already distributed-written
    instead of held in driver memory."""

    project: str
    dataset: str
    table: str
    staging_dir: str
    files: tuple[str, ...]
    write_disposition: str  # WRITE_TRUNCATE | WRITE_APPEND
    schema_json: str


_DISPOSITION = {"overwrite": "WRITE_TRUNCATE", "append": "WRITE_APPEND"}


class BigQuerySink:
    """Reference-parity BigQuery loader (etl_tools.py:67-77) with two
    paths:

    - **Connector path** (default): the spark-bigquery connector runs
      a parallel write from executors — unlike the reference's
      single-process in-memory upload. The jar is not shipped in this
      environment, so ``write`` raises until one is on the classpath.
    - **Load-job path** (``load_job=`` + ``staging_dir=``): the
      standard stage-then-load pattern — Spark distributed-writes
      parquet to the staging dir (GCS in deployment), and the
      injectable ``load_job`` callable submits the assembled
      :class:`LoadRequest` (in deployment a thin wrapper over
      google-cloud-bigquery's load API; in tests a recorder). All
      sink logic — staging write, file manifest, mode→disposition
      mapping, job assembly — is exercised without any Google SDK.
    """

    def __init__(
        self,
        project: str,
        dataset: str,
        load_job: "Callable[[LoadRequest], None] | None" = None,
        staging_dir: str | None = None,
    ) -> None:
        self.project = project
        self.dataset = dataset
        self.load_job = load_job
        self.staging_dir = staging_dir

    def write(self, df: DataFrame, table: str, mode: str = "overwrite") -> None:
        if mode not in _DISPOSITION:
            raise ValueError(f"mode must be one of {sorted(_DISPOSITION)}")
        if self.load_job is not None:
            if self.staging_dir is None:
                raise ValueError("load_job path requires staging_dir")
            import uuid
            from pathlib import Path

            staging = Path(self.staging_dir) / f"{table}_{uuid.uuid4().hex[:12]}"
            df.write.mode("error").parquet(str(staging))
            files = tuple(
                sorted(str(p) for p in staging.glob("*.parquet"))
            )
            self.load_job(
                LoadRequest(
                    project=self.project,
                    dataset=self.dataset,
                    table=table,
                    staging_dir=str(staging),
                    files=files,
                    write_disposition=_DISPOSITION[mode],
                    schema_json=df.schema.json(),
                )
            )
            return
        target = f"{self.project}.{self.dataset}.{table}"
        try:
            (
                df.write.format("bigquery")
                .option("table", target)
                .option("writeMethod", "direct")
                .mode(mode)
                .save()
            )
        except Exception as exc:  # noqa: BLE001 — classify, don't mask
            # Only a missing-connector failure becomes the actionable
            # NotImplementedError; anything else (credentials, dataset,
            # quota) must surface as itself — translating every error
            # into "jar absent" sends the operator debugging classpath
            # config while the real failure repeats.
            msg = str(exc)
            if (
                "ClassNotFoundException" in msg
                or "NoClassDefFoundError" in msg
                or "Failed to find data source: bigquery" in msg
                or "DATA_SOURCE_NOT_FOUND" in msg
            ):
                raise NotImplementedError(
                    "spark-bigquery connector not on the classpath; add "
                    "com.google.cloud.spark:spark-bigquery-with-dependencies "
                    "to spark.jars.packages to enable this sink (or pass "
                    "load_job= + staging_dir= for the stage-then-load path)"
                ) from exc
            raise
