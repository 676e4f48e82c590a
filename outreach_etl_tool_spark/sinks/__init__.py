"""Sinks (SURVEY.md §2.1 S4/S5, §7 step 9).

The reference's sinks are a whole-table BigQuery load
(etl_tools.py:67-77) and a log-email notification
(etl_tools.py:83-171). Here: partitioned/bucketed parquet writers (the
lakehouse-native equivalents that enable partition pruning and
shuffle-free joins downstream), a BigQuery writer that delegates to
the spark-bigquery connector when present, and a pluggable notifier.
"""

from .layout import write_clustered
from .manifest import ManifestTable
from .writers import BigQuerySink, write_bucketed, write_partitioned
from .notify import (
    EmailNotifier,
    FileTransport,
    LogNotifier,
    MemoryTransport,
    Message,
    Notifier,
    notify_run_log,
)

__all__ = [
    "ManifestTable",
    "write_partitioned",
    "write_bucketed",
    "write_clustered",
    "BigQuerySink",
    "Notifier",
    "LogNotifier",
    "EmailNotifier",
    "Message",
    "MemoryTransport",
    "FileTransport",
    "notify_run_log",
]
