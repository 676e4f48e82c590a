"""Structured Streaming forms of the event-time operators (SURVEY.md
§2.9 T1-T6).

The reference's replication is a watermark-driven daily micro-batch
(outreach_etl.py:115-117,223-229) — exactly Structured Streaming's
incremental model. The batch-SQL equivalents (oracle-checked) live in
queries/events.py; this package holds the true streaming forms:
windowed aggregation with watermarks, session windows, stateful
dedup, and the foreachBatch keep-latest upsert sink.
"""

from .streams import (
    EVENT_SCHEMA,
    interval_join_streams,
    read_events_stream,
    running_user_totals,
    session_counts,
    sessionize_with_timeout,
    sliding_counts,
    stream_dedup,
    tumbling_counts,
    audio_dedup_ingest_sink,
    dedup_ingest_sink,
    image_dedup_ingest_sink,
    image_neardup_ingest_sink,
    neardup_ingest_sink,
    span_ingest_sink,
    manifest_upsert_sink,
    upsert_sink,
)

__all__ = [
    "EVENT_SCHEMA",
    "read_events_stream",
    "tumbling_counts",
    "sliding_counts",
    "session_counts",
    "sessionize_with_timeout",
    "stream_dedup",
    "interval_join_streams",
    "running_user_totals",
    "upsert_sink",
    "manifest_upsert_sink",
    "audio_dedup_ingest_sink",
    "dedup_ingest_sink",
    "image_dedup_ingest_sink",
    "image_neardup_ingest_sink",
    "neardup_ingest_sink",
    "span_ingest_sink",
]
