"""Driver-visible Structured Streaming runs (SURVEY.md §2.9 T4/T5).

Watermark late-drop (T4) and stateful stream dedup (T5) were
pytest-only through round 5 — the one SURVEY family with no registry
evidence. These queries run the REAL streaming operators from
``streaming/streams.py`` through a deterministic ``availableNow``
replay of the events table and return the materialized sink, with
EXACT oracles derived from how the replay is constructed:

- The events table is split into ts-range TERTILE slices (computed
  from the table's actual min/max ts, so any regenerated span works);
  each slice is one file and ``maxFilesPerTrigger=1`` makes it one
  micro-batch (file mtimes are pinned to fixed increasing values so
  the file source replays slices in order). In-order slices can never
  produce a late row — slice i+1's minimum ts is past slice i's
  maximum — so every drop observed below is one the fixture injected
  deliberately, which is what makes the output SQL-expressible.

- T4 routes every ``event_id % 50 == 0`` row from the first QUARTER
  of the ts range out of order into a final file. Spark propagates
  the event-time watermark with a deliberate batch lag (the late
  filter of batch k uses stats from earlier batches — measured:
  batch 3 filtered against stats through batch 1), so the fixture
  does not assume any particular lag: routed rows all predate
  ``max(slice 0 ts) - delay`` by ~span/12 (the tertile/quarter gap —
  over 2 days at a 30-day span), making them late under EVERY
  watermark that has seen at least the first batch. All routed rows
  are provably dropped, and append mode's final flush emits exactly
  the hour windows over in-order rows with ``window_end <= max_ts -
  delay`` — plain SQL over the events table (the routing predicate
  is integer epoch-micros arithmetic, mirrored bit-exactly in the
  oracle and invariant under uniform timezone shifts).

- T5 re-sends a copy of every ``event_id % 7 == 0`` row one slice
  later. A copy is dropped whichever way the race goes: if the
  original's state is still within the watermark horizon the copy is
  a duplicate; if the state was evicted, the watermark has passed the
  copy's (identical) event time, so it is late. Originals are never
  late (in-order slices; copies carry old timestamps and cannot
  advance the watermark). The sink is therefore exactly the original
  events table.

The fixture build is itself distributed (day-range filters, one
Spark JSON write per slice — no collect); only the mtime pinning
touches the local filesystem, which is inherent to replaying the
file source deterministically. Timestamps cross the JSON boundary as
epoch micros (``unix_micros``/``timestamp_micros``), sidestepping
text timestamp formats entirely; the sink's TimestampType is cast
back to TIMESTAMP_NTZ in the same session, so the round trip is the
identity for any session timezone (verified: zero mismatches).
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..streaming.streams import (
    interval_join_streams,
    running_user_totals,
    sessionize_with_timeout,
    stream_dedup,
    tumbling_counts,
    tws_user_totals,
)
from . import QuerySpec
from .fixtures import atomic_fixture

_REPLAY_SCHEMA = (
    "event_id long, ts_us long, user_id long, event_type string, value double"
)
_SINK_T4 = "bucket_start timestamp, event_type string, n long"
_SINK_T5 = (
    "event_id long, ts timestamp, user_id long, event_type string, value double"
)

# bump to invalidate cached replay fixtures when their construction changes
_FIXTURE_VERSION = 3


def _slice_idx(lo_us: int, hi_us: int) -> F.Column:
    """Tertile slice index over the events' actual ts range — span-
    agnostic (the driver regenerates testdata between rounds; a
    day-of-month rule would silently break on a multi-month span and
    red the gate). Boundaries are integer epoch-micros arithmetic so
    the oracle can reproduce the routing predicate bit-exactly."""
    span = hi_us - lo_us
    b1, b2 = lo_us + span // 3, lo_us + 2 * (span // 3)
    return (
        F.when(F.col("ts_us") <= b1, 0)
        .when(F.col("ts_us") <= b2, 1)
        .otherwise(2)
    )


def _write_slices(slices: list[DataFrame], root: Path) -> None:
    for i, sl in enumerate(slices):
        sl.coalesce(1).write.mode("overwrite").json(str(root / f"s{i}"))
    # pin mtimes to fixed increasing epochs: the file source orders new
    # files by modification time, and this makes slice order == batch
    # order on any filesystem, independent of write wall-clock
    for i in range(len(slices)):
        for p in (root / f"s{i}").glob("part-*.json"):
            os.utime(p, (1_000_000_000 + i * 60, 1_000_000_000 + i * 60))


def _build_replay(spark: SparkSession, sf_dir: str, variant: str) -> Path:
    """Materialize the deterministic replay fixture for `variant`
    (cached per sf_dir — same inputs produce equivalent slices;
    build-into-tmp + atomic rename via :func:`atomic_fixture`)."""
    key = hashlib.sha1(
        f"{_FIXTURE_VERSION}:{variant}:{Path(sf_dir).resolve()}".encode()
    ).hexdigest()[:12]
    dest = Path(tempfile.gettempdir()) / "outreach_etl_spark_replay" / (
        f"{variant}_{key}"
    )

    def build(root: Path) -> None:
        base = load_table(spark, sf_dir, "events").select(
            "event_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            "user_id",
            "event_type",
            "value",
        )
        lo_us, hi_us = base.agg(F.min("ts_us"), F.max("ts_us")).first()
        ev = base.withColumn("slice", _slice_idx(lo_us, hi_us))
        if variant == "inorder":
            slices = [ev.filter(F.col("slice") == i) for i in range(3)]
        elif variant == "latedrop":
            # routed rows leave the first ts-ordered slice for the final
            # file; the first-quarter cut keeps them ~span/12 below
            # max(slice 0) - delay (span/3 tertile vs span/4 routing cut
            # — >2 days at a 30-day span, >1h down to a 1-day span), so
            # they are late under any batch-lagged watermark (module
            # doc); tests/test_streaming.py pins the margin
            routed = (F.col("event_id") % 50 == 0) & (
                F.col("ts_us") < lo_us + (hi_us - lo_us) // 4
            )
            slices = [
                ev.filter(~routed & (F.col("slice") == i)) for i in range(3)
            ] + [ev.filter(routed)]
        elif variant == "dedup":
            # copies of slice i's marked rows re-arrive in file i+1
            copied = F.col("event_id") % 7 == 0
            slices = [ev.filter(F.col("slice") == 0)]
            for i in range(1, 4):
                cur = ev.filter(F.col("slice") == i) if i < 3 else None
                dup = ev.filter(copied & (F.col("slice") == i - 1))
                slices.append(dup if cur is None else cur.unionByName(dup))
        else:  # pragma: no cover
            raise ValueError(f"unknown replay variant {variant!r}")
        _write_slices([sl.drop("slice") for sl in slices], root)

    return atomic_fixture(dest, build)


_DOCS_REPLAY_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def _build_docs_replay(spark: SparkSession, sf_dir: str) -> Path:
    """Documents as three doc_id-RANGED slices (JSON, pinned mtimes).
    Id-ranged order is what makes the ingest sink's retention rule
    SQL-expressible: the first slice containing a text's sha also
    holds its minimum doc_id, and the in-batch rule keeps min id — so
    the retained set is exactly `min(doc_id) per distinct text`."""
    key = hashlib.sha1(
        f"{_FIXTURE_VERSION}:docs:{Path(sf_dir).resolve()}".encode()
    ).hexdigest()[:12]
    dest = Path(tempfile.gettempdir()) / "outreach_etl_spark_replay" / (
        f"docs_{key}"
    )

    def build(root: Path) -> None:
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text", "lang", "source", "n_chars"
        )
        m = docs.agg(F.max("doc_id")).first()[0]
        b1, b2 = m // 3, 2 * m // 3
        _write_slices(
            [
                docs.filter(F.col("doc_id") <= b1),
                docs.filter((F.col("doc_id") > b1) & (F.col("doc_id") <= b2)),
                docs.filter(F.col("doc_id") > b2),
            ],
            root,
        )

    return atomic_fixture(dest, build)


def _read_replay(spark: SparkSession, dest: Path) -> DataFrame:
    return (
        spark.readStream.schema(_REPLAY_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(f"{dest}/s*/part-*.json")
        .select(
            "event_id",
            F.timestamp_micros("ts_us").alias("ts"),
            "user_id",
            "event_type",
            "value",
        )
    )


def _run_to_parquet(stream: DataFrame, sink_schema: str) -> DataFrame:
    spark = stream.sparkSession
    out = tempfile.mkdtemp(prefix="stream_sink_")
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    if q.exception() is not None:
        raise q.exception()
    # explicit schema: an all-dropped run leaves no parquet files
    return spark.read.schema(sink_schema).parquet(out)


def stream_latedrop_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4+T1: the production tumbling_counts operator (withWatermark +
    window groupBy) over the late-routed replay; append mode emits only
    watermark-closed windows, and the routed rows provably never reach
    the sink (module docstring)."""
    replay = _build_replay(spark, sf_dir, "latedrop")
    agg = tumbling_counts(
        _read_replay(spark, replay), window="1 hour", watermark="1 hour"
    ).select("bucket_start", "event_type", "n")
    sink = _run_to_parquet(agg, _SINK_T4)
    return sink.select(
        F.col("bucket_start").cast("timestamp_ntz").alias("bucket_start"),
        "event_type",
        "n",
    )


STREAM_LATEDROP_TUMBLING_SQL = """
WITH bounds AS (
  SELECT MIN(EPOCH_US(ts)) AS lo, MAX(EPOCH_US(ts)) AS hi FROM events
)
SELECT DATE_TRUNC('hour', ts) AS bucket_start, event_type, COUNT(*) AS n
FROM events, bounds
WHERE NOT (event_id % 50 = 0 AND EPOCH_US(ts) < lo + (hi - lo) // 4)
  AND DATE_TRUNC('hour', ts) + INTERVAL 2 HOUR <= (SELECT MAX(ts) FROM events)
GROUP BY 1, 2
"""


def stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5: the production stream_dedup operator
    (dropDuplicatesWithinWatermark) over the duplicate-injected replay;
    every injected copy is dropped as duplicate-or-late, so the sink
    reconstructs the original table exactly (module docstring)."""
    replay = _build_replay(spark, sf_dir, "dedup")
    ded = stream_dedup(
        _read_replay(spark, replay), keys=["event_id"], watermark="1 day"
    )
    sink = _run_to_parquet(ded, _SINK_T5)
    return sink.select(
        "event_id",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        "user_id",
        "event_type",
        "value",
    )


STREAM_DEDUP_WATERMARK_SQL = """
SELECT event_id, ts, user_id, event_type, value FROM events
"""


_SINK_T7 = (
    "event_id_a long, event_id_b long, user_id long, "
    "ts_a timestamp, ts_b timestamp"
)
_SINK_T8 = "bucket_start timestamp, c_mktsegment string, n long"


def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T8: stream-static enrichment — the watermarked event stream
    broadcast-joined to the static customer dim (re-resolvable per
    micro-batch, never shuffled, no state), then hourly counts per
    market segment in append mode.

    The watermark is applied BEFORE the join so it advances on every
    event regardless of whether the dim matches it — that makes the
    final-flush bound ``window_end ≤ max(all ts) − delay`` exact and
    oracle-expressible without reasoning about which rows survive the
    join. (On the current generator every event user_id has a
    customer row — custkeys cover 0..n ⊇ users — so the inner join
    drops nothing here; the oracle's plain JOIN matches whichever way
    a regenerated domain lands, since both engines apply the same
    join.) In-order slices mean nothing is ever late."""
    replay = _build_replay(spark, sf_dir, "inorder")
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    enriched = (
        _read_replay(spark, replay)
        .withWatermark("ts", "1 hour")
        .join(F.broadcast(customer), "user_id", "inner")
    )
    agg = (
        enriched.groupBy(F.window("ts", "1 hour").alias("w"), "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("bucket_start"), "c_mktsegment", "n"
        )
    )
    sink = _run_to_parquet(agg, _SINK_T8)
    return sink.select(
        F.col("bucket_start").cast("timestamp_ntz").alias("bucket_start"),
        "c_mktsegment",
        "n",
    )


STREAM_STATIC_ENRICH_SQL = """
SELECT DATE_TRUNC('hour', ts) AS bucket_start, c_mktsegment, COUNT(*) AS n
FROM events JOIN customer ON user_id = c_custkey
WHERE DATE_TRUNC('hour', ts) + INTERVAL 2 HOUR <= (SELECT MAX(ts) FROM events)
GROUP BY 1, 2
"""


def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7: the production interval_join_streams operator (stream⋈stream
    with watermarks + two-sided time bound) over the in-order replay,
    self-joined: each event paired with the same user's strictly-later
    events within 1 hour.

    Why the final sink is SQL-expressible: slices are ts-ordered, so a
    left row's state can only be evicted once the watermark passes
    ``ts + 1h`` — and every ts' ≤ ts + 1h then lies below the
    watermark + delay ≤ the max processed ts, i.e. in an
    already-processed slice. Eviction therefore never precedes a
    pending match, inner join emits each pair exactly once, and the
    converged sink equals the batch interval join over the whole
    table — the oracle below."""
    replay = _build_replay(spark, sf_dir, "inorder")
    joined = interval_join_streams(
        _read_replay(spark, replay),
        _read_replay(spark, replay),
        delay="30 minutes",
        within="INTERVAL 1 HOUR",
    )
    sink = _run_to_parquet(joined, _SINK_T7)
    return sink.select(
        "event_id_a",
        "event_id_b",
        "user_id",
        F.col("ts_a").cast("timestamp_ntz").alias("ts_a"),
        F.col("ts_b").cast("timestamp_ntz").alias("ts_b"),
    )


STREAM_INTERVAL_JOIN_SQL = """
SELECT a.event_id AS event_id_a, b.event_id AS event_id_b,
       a.user_id AS user_id, a.ts AS ts_a, b.ts AS ts_b
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL 1 HOUR
"""


def stream_outer_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7b: stream-stream LEFT OUTER interval join — the outer half of
    the streaming join matrix. Matched pairs emit exactly like the
    inner join (eviction never precedes a pending match over the
    in-order replay; see stream_interval_join). Unmatched left rows
    emit null-extended only once the watermark passes ``ts + 1h`` —
    and that happens inside the run because availableNow executes a
    no-data micro-batch after the last file whenever the watermark
    advances (``spark.sql.streaming.noDataMicroBatches``, on by
    default): the final watermark is ``max(ts) − 30min``, so every
    unmatched left row with ``ts + 1h`` below it has provably
    flushed. The returned frame keeps matched pairs plus unmatched
    rows at least one minute BELOW that bound (a knife-edge row at
    the exact boundary would hinge on the eviction comparison's
    strictness; the margin makes both engines agree without modeling
    it), and the oracle applies the identical integer-micros bound to
    a batch LEFT JOIN."""
    replay = _build_replay(spark, sf_dir, "inorder")
    joined = interval_join_streams(
        _read_replay(spark, replay),
        _read_replay(spark, replay),
        delay="30 minutes",
        within="INTERVAL 1 HOUR",
        how="left_outer",
    )
    sink = _run_to_parquet(joined, _SINK_T7)
    hi_us = (
        load_table(spark, sf_dir, "events")
        .agg(F.max(F.unix_micros(F.col("ts").cast("timestamp"))))
        .first()[0]
    )
    # unmatched kept iff ts_a + 1h <= (hi − 30min) − 1min margin
    bound_us = hi_us - 91 * 60 * 1_000_000
    return sink.filter(
        F.col("event_id_b").isNotNull()
        | (F.unix_micros("ts_a") <= F.lit(bound_us))
    ).select(
        "event_id_a",
        "event_id_b",
        "user_id",
        F.col("ts_a").cast("timestamp_ntz").alias("ts_a"),
        F.col("ts_b").cast("timestamp_ntz").alias("ts_b"),
    )


STREAM_OUTER_INTERVAL_JOIN_SQL = """
WITH mx AS (SELECT MAX(epoch_us(ts)) AS hi FROM events)
SELECT a.event_id AS event_id_a, b.event_id AS event_id_b,
       a.user_id AS user_id, a.ts AS ts_a, b.ts AS ts_b
FROM events a
LEFT JOIN events b
  ON a.user_id = b.user_id
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL 1 HOUR
CROSS JOIN mx
WHERE b.event_id IS NOT NULL
   OR epoch_us(a.ts) <= hi - 5460000000
"""


def stream_full_outer_interval_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """T7c: stream-stream FULL OUTER interval join — both unmatched
    sides null-extend at their own state-expiry horizons. The left
    horizon is the left-outer one (``ts_a + 1h`` must pass the
    watermark); the RIGHT horizon is earlier: the condition
    ``ts_b > ts_a`` means a right row can never match a LATER-arriving
    left (in-order slices ⟹ later arrivals carry larger ts, and a
    match needs ``ts_a < ts_b``), so right state evicts — and its
    null-extension emits — once the watermark passes ``ts_b`` itself.
    The trailing no-data batch applies the final watermark
    ``max(ts) − 30min``; the query keeps matched pairs plus each
    side's unmatched rows one margin-minute below its own bound, and
    the oracle applies the identical two integer-micros bounds to a
    batch FULL JOIN."""
    replay = _build_replay(spark, sf_dir, "inorder")
    joined = interval_join_streams(
        _read_replay(spark, replay),
        _read_replay(spark, replay),
        delay="30 minutes",
        within="INTERVAL 1 HOUR",
        how="full_outer",
    )
    sink = _run_to_parquet(
        joined,
        "event_id_a long, event_id_b long, user_id long, "
        "ts_a timestamp, ts_b timestamp",
    )
    hi_us = (
        load_table(spark, sf_dir, "events")
        .agg(F.max(F.unix_micros(F.col("ts").cast("timestamp"))))
        .first()[0]
    )
    left_bound = hi_us - 91 * 60 * 1_000_000   # (hi − 30m − 1h) − 1m
    right_bound = hi_us - 31 * 60 * 1_000_000  # (hi − 30m) − 1m
    return sink.filter(
        (F.col("event_id_a").isNotNull() & F.col("event_id_b").isNotNull())
        | (
            F.col("event_id_b").isNull()
            & (F.unix_micros("ts_a") <= F.lit(left_bound))
        )
        | (
            F.col("event_id_a").isNull()
            & (F.unix_micros("ts_b") <= F.lit(right_bound))
        )
    ).select(
        "event_id_a",
        "event_id_b",
        "user_id",
        F.col("ts_a").cast("timestamp_ntz").alias("ts_a"),
        F.col("ts_b").cast("timestamp_ntz").alias("ts_b"),
    )


def stream_right_outer_interval_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """T7d: the RIGHT outer variant, completing the
    inner/left/right/full enumeration — unmatched RIGHT rows
    null-extend at the right-side horizon (watermark > ts_b; see
    stream_full_outer_interval_join for why the right horizon is
    ``ts_b`` itself), matched pairs emit as in the inner join."""
    replay = _build_replay(spark, sf_dir, "inorder")
    joined = interval_join_streams(
        _read_replay(spark, replay),
        _read_replay(spark, replay),
        delay="30 minutes",
        within="INTERVAL 1 HOUR",
        how="right_outer",
    )
    sink = _run_to_parquet(
        joined,
        "event_id_a long, event_id_b long, user_id long, "
        "ts_a timestamp, ts_b timestamp",
    )
    hi_us = (
        load_table(spark, sf_dir, "events")
        .agg(F.max(F.unix_micros(F.col("ts").cast("timestamp"))))
        .first()[0]
    )
    right_bound = hi_us - 31 * 60 * 1_000_000  # (hi − 30m) − 1m margin
    return sink.filter(
        F.col("event_id_a").isNotNull()
        | (F.unix_micros("ts_b") <= F.lit(right_bound))
    ).select(
        "event_id_a",
        "event_id_b",
        "user_id",
        F.col("ts_a").cast("timestamp_ntz").alias("ts_a"),
        F.col("ts_b").cast("timestamp_ntz").alias("ts_b"),
    )


STREAM_RIGHT_OUTER_INTERVAL_JOIN_SQL = """
WITH mx AS (SELECT MAX(epoch_us(ts)) AS hi FROM events)
SELECT a.event_id AS event_id_a, b.event_id AS event_id_b,
       COALESCE(a.user_id, b.user_id) AS user_id,
       a.ts AS ts_a, b.ts AS ts_b
FROM events a
RIGHT JOIN events b
  ON a.user_id = b.user_id
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL 1 HOUR
CROSS JOIN mx
WHERE a.event_id IS NOT NULL
   OR epoch_us(b.ts) <= hi - 1860000000
"""


STREAM_FULL_OUTER_INTERVAL_JOIN_SQL = """
WITH mx AS (SELECT MAX(epoch_us(ts)) AS hi FROM events)
SELECT a.event_id AS event_id_a, b.event_id AS event_id_b,
       COALESCE(a.user_id, b.user_id) AS user_id,
       a.ts AS ts_a, b.ts AS ts_b
FROM events a
FULL JOIN events b
  ON a.user_id = b.user_id
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL 1 HOUR
CROSS JOIN mx
WHERE (a.event_id IS NOT NULL AND b.event_id IS NOT NULL)
   OR (b.event_id IS NULL AND epoch_us(a.ts) <= hi - 5460000000)
   OR (a.event_id IS NULL AND epoch_us(b.ts) <= hi - 1860000000)
"""


def stream_custom_state_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState) under the
    oracle gate: running_user_totals carries per-user state across the
    in-order replay's micro-batches in update mode; each batch's
    emissions land in the sink stamped with their epoch, and the final
    per-user row (max epoch) IS the converged state — by construction
    equal to the batch aggregate over all events, independent of how
    the replay was split into batches. Only order-independent fields
    (count, max) are compared; a running float SUM's value depends on
    accumulation order and is excluded from the hash surface."""
    import tempfile

    from pyspark.sql.window import Window

    replay = _build_replay(spark, sf_dir, "inorder")
    totals = running_user_totals(_read_replay(spark, replay))
    out = tempfile.mkdtemp(prefix="stream_state_sink_")
    ckpt = tempfile.mkdtemp(prefix="stream_state_ckpt_")

    def sink(batch: DataFrame, epoch_id: int) -> None:
        batch.withColumn("epoch", F.lit(epoch_id)).write.mode(
            "append"
        ).parquet(out)

    q = (
        totals.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    if q.exception() is not None:
        raise q.exception()
    sunk = spark.read.schema(
        "user_id long, n_events long, total_value double, "
        "max_value double, epoch long"
    ).parquet(out)
    w = Window.partitionBy("user_id").orderBy(F.desc("epoch"))
    return (
        sunk.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "max_value")
    )


STREAM_CUSTOM_STATE_TOTALS_SQL = """
SELECT user_id, COUNT(*) AS n_events, MAX(value) AS max_value
FROM events
GROUP BY user_id
"""


def stream_tws_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5c: transformWithStateInPandas (Spark 4 stateful v2, typed
    ValueState, RocksDB-backed) over the in-order replay, same
    convergence argument as stream_custom_state_totals — the final
    per-user emission (max epoch) is the converged state and equals
    the batch aggregate regardless of batch splits. The RocksDB
    provider the operator requires is set for this query and restored
    after (same conf discipline as join_runtime_filter); only order-
    independent fields (count, max) are on the hash surface.

    NOT in the registry: the operator's Python worker speaks the state
    protocol over protobuf (pyspark/sql/streaming/proto), and
    ``google.protobuf`` is not installed in this environment — the
    query is exercised by tests/test_streaming.py behind an
    importable-protobuf skip gate and registers automatically the
    moment the dependency exists (see QUERIES note below)."""
    import tempfile

    from pyspark.sql.window import Window

    replay = _build_replay(spark, sf_dir, "inorder")
    out = tempfile.mkdtemp(prefix="stream_tws_sink_")
    ckpt = tempfile.mkdtemp(prefix="stream_tws_ckpt_")

    def sink(batch: DataFrame, epoch_id: int) -> None:
        batch.withColumn("epoch", F.lit(epoch_id)).write.mode(
            "append"
        ).parquet(out)

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(provider_key, None)
    try:
        spark.conf.set(
            provider_key,
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        totals = tws_user_totals(_read_replay(spark, replay))
        q = (
            totals.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        if q.exception() is not None:
            raise q.exception()
    finally:
        if prev is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev)
    sunk = spark.read.schema(
        "user_id long, n_events long, max_value double, epoch long"
    ).parquet(out)
    w = Window.partitionBy("user_id").orderBy(F.desc("epoch"))
    return (
        sunk.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "max_value")
    )


STREAM_TWS_TOTALS_SQL = STREAM_CUSTOM_STATE_TOTALS_SQL


def stream_session_timeout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3b/T5 under the oracle gate: event-time-TIMER sessionization
    (applyInPandasWithState + EventTimeTimeout) over the in-order
    replay. Emission rule, derived from the operator: every session
    FOLLOWED by another event of its user closes inline when that
    event is processed (emitted unconditionally); each user's LAST
    session closes only when the watermark passes ``last + gap``,
    which the trailing no-data batch guarantees for sessions ending
    below ``max(ts) − delay``. Timer safety: with delay == gap, the
    watermark at the batch carrying a session-extending event is
    provably below the timer's fire point, so a timer can never
    preempt a pending extension (in-order slices). The query keeps
    non-final sessions plus final sessions a 1-minute margin below
    the flush bound; the oracle replays the identical rule on a
    gaps-and-islands sessionization."""
    replay = _build_replay(spark, sf_dir, "inorder")
    sess = sessionize_with_timeout(
        _read_replay(spark, replay), gap_minutes=30, watermark="30 minutes"
    )
    sink = _run_to_parquet(
        sess,
        "user_id long, session_start timestamp, "
        "session_end timestamp, n_events long",
    )
    ev = load_table(spark, sf_dir, "events")
    hi_us = ev.agg(
        F.max(F.unix_micros(F.col("ts").cast("timestamp")))
    ).first()[0]
    bound_us = hi_us - 31 * 60 * 1_000_000  # delay 30min + 1min margin
    gap_us = 30 * 60 * 1_000_000
    # "non-final" must come from the EVENTS table, not the sink: when a
    # user's true final session is never flushed (timer past the final
    # watermark), the sink's last session is the penultimate one —
    # judging finality from the sink would bound-filter a session the
    # oracle keeps unconditionally (caught at sf0.1: one such user).
    # A session is non-final iff the user has any event past its last
    # event (= session_end − gap), exact integer-micros both sides.
    user_hi = ev.groupBy("user_id").agg(
        F.max(F.unix_micros(F.col("ts").cast("timestamp"))).alias(
            "user_hi_us"
        )
    )
    return (
        sink.join(user_hi, "user_id")
        .filter(
            (F.col("user_hi_us")
             > F.unix_micros("session_end") - F.lit(gap_us))
            | (F.unix_micros("session_end") <= F.lit(bound_us))
        )
        .select(
            "user_id",
            F.col("session_start").cast("timestamp_ntz").alias("session_start"),
            F.col("session_end").cast("timestamp_ntz").alias("session_end"),
            "n_events",
        )
    )


STREAM_SESSION_TIMEOUT_SQL = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR EPOCH(ts) - EPOCH(LAG(ts) OVER w) > 1800 THEN 1
              ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  -- the running SUM orders by (ts, event_id) — the same total order
  -- is_new was computed over — so equal-ts boundary events can't get
  -- an engine-chosen peer order that diverges from the Spark side
  SELECT user_id, ts,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_id
  FROM flagged
), sess AS (
  SELECT user_id, session_id,
         MIN(ts) AS session_start,
         MAX(ts) + INTERVAL 1800 SECOND AS session_end,
         COUNT(*) AS n_events
  FROM numbered
  GROUP BY user_id, session_id
), uhi AS (
  SELECT user_id, MAX(epoch_us(ts)) AS user_hi FROM events GROUP BY user_id
), mx AS (SELECT MAX(epoch_us(ts)) AS hi FROM events)
SELECT sess.user_id AS user_id, session_start, session_end, n_events
FROM sess JOIN uhi USING (user_id) CROSS JOIN mx
WHERE user_hi > epoch_us(session_end) - 1800000000
   OR epoch_us(session_end) <= hi - 1860000000
"""


def stream_ingest_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6c: the streaming corpus-ingest sink (foreachBatch incremental
    exact dedup + manifest append) under the oracle gate. Each
    micro-batch anti-joins its content hashes against everything
    already retained and appends survivors as one atomic snapshot;
    with the doc_id-ranged replay the retained table is exactly
    `min(doc_id) per distinct text` (see _build_docs_replay)."""
    import tempfile as _tf

    from ..streaming.streams import dedup_ingest_sink

    replay = _build_docs_replay(spark, sf_dir)
    docs = (
        spark.readStream.schema(_DOCS_REPLAY_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(f"{replay}/s*/part-*.json")
    )
    table_path = _tf.mkdtemp(prefix="stream_ingest_table_")
    ckpt = _tf.mkdtemp(prefix="stream_ingest_ckpt_")
    q = (
        dedup_ingest_sink(docs, table_path, ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    if q.exception() is not None:
        raise q.exception()

    from ..sinks.manifest import ManifestTable

    return ManifestTable(table_path).read(spark).select(
        "doc_id", "lang", "source", "n_chars"
    )


STREAM_INGEST_DEDUP_SQL = """
SELECT doc_id, lang, source, n_chars FROM (
  SELECT doc_id, lang, source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
  FROM documents
) WHERE rn = 1
"""


def stream_decontaminate_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6c/L4: streaming decontamination at ingest — each arriving
    train micro-batch probed against the FIXED eval-set gram store
    (same k=4 token grams and doc_id % 97 eval split as the batch
    `decontaminate` query), retained ANNOTATED with its leakage
    counts. The annotation is a pure function of (text, eval store),
    so the retained table is batch-structure-invariant and the oracle
    is the exact LEFT-JOIN replica over the static table — zeros for
    clean docs, decontaminate's counts for leaky ones."""
    import tempfile as _tf

    from ..streaming.streams import decontaminate_ingest_sink

    # eval gram store: built once from the static table (in production
    # this is the benchmark-suite artifact, versioned next to the corpus)
    from .pipeline import _DECON_K, _EVAL_MOD, _grams

    docs_static = load_table(spark, sf_dir, "documents")
    eval_store = _tf.mkdtemp(prefix="stream_decon_evalgrams_")
    (
        docs_static.filter(F.col("doc_id") % _EVAL_MOD == 0)
        .select(
            F.col("doc_id").alias("eval_id"),
            F.explode(F.array_distinct(_grams("text", _DECON_K))).alias("gram"),
        )
        .write.mode("overwrite")
        .parquet(eval_store)
    )

    replay = _build_docs_replay(spark, sf_dir)
    docs = (
        spark.readStream.schema(_DOCS_REPLAY_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(f"{replay}/s*/part-*.json")
    )
    table_path = _tf.mkdtemp(prefix="stream_decon_table_")
    ckpt = _tf.mkdtemp(prefix="stream_decon_ckpt_")
    q = (
        decontaminate_ingest_sink(
            docs, table_path, eval_store, ckpt,
            eval_mod=_EVAL_MOD, k=_DECON_K,
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    if q.exception() is not None:
        raise q.exception()

    from ..sinks.manifest import ManifestTable

    return (
        ManifestTable(table_path)
        .read(spark)
        .select("doc_id", "n_shared_grams", "n_eval_docs")
        .orderBy("doc_id")
    )


def _stream_decontaminate_ingest_sql() -> str:
    from .pipeline import _DECON_K, _EVAL_MOD

    return f"""
WITH grams AS (
    SELECT DISTINCT doc_id,
           array_to_string(list_slice(arr, i, i + {_DECON_K - 1}), ' ') AS gram
    FROM (SELECT doc_id,
                 regexp_extract_all(LOWER(text), '[a-zA-Z]+') AS arr
          FROM documents),
         UNNEST(generate_series(1, LEN(arr) - {_DECON_K - 1})) AS t(i)
), ev AS (
    SELECT doc_id AS eval_id, gram FROM grams WHERE doc_id % {_EVAL_MOD} = 0
), tr AS (
    SELECT doc_id, gram FROM grams WHERE doc_id % {_EVAL_MOD} <> 0
), hits AS (
    SELECT tr.doc_id,
           COUNT(DISTINCT tr.gram) AS n_shared_grams,
           COUNT(DISTINCT ev.eval_id) AS n_eval_docs
    FROM tr JOIN ev ON tr.gram = ev.gram
    GROUP BY tr.doc_id
)
SELECT d.doc_id,
       COALESCE(h.n_shared_grams, 0) AS n_shared_grams,
       COALESCE(h.n_eval_docs, 0) AS n_eval_docs
FROM (SELECT doc_id FROM documents WHERE doc_id % {_EVAL_MOD} <> 0) d
LEFT JOIN hits h USING (doc_id)
ORDER BY d.doc_id
"""


STREAM_DECONTAMINATE_INGEST_SQL = _stream_decontaminate_ingest_sql()


def stream_pii_scrub_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6c/L4ac: streaming PII scrub at ingest — every arriving doc's
    email/phone/IPv4 token spans detected and excised byte-exactly
    before landing (streams.pii_scrub_ingest_sink; the batch
    `pii_extents`/`pii_excise` machinery). The scrub is a pure
    per-doc function of the text, so the retained table is
    batch-structure-invariant and the oracle is the batch excise
    replica plus the span count — md5-certifying the scrubbed bytes
    of every streamed document."""
    import tempfile as _tf

    from ..streaming.streams import pii_scrub_ingest_sink

    replay = _build_docs_replay(spark, sf_dir)
    docs = (
        spark.readStream.schema(_DOCS_REPLAY_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(f"{replay}/s*/part-*.json")
    )
    table_path = _tf.mkdtemp(prefix="stream_pii_table_")
    ckpt = _tf.mkdtemp(prefix="stream_pii_ckpt_")
    q = (
        pii_scrub_ingest_sink(docs, table_path, ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    if q.exception() is not None:
        raise q.exception()

    from ..sinks.manifest import ManifestTable

    return (
        ManifestTable(table_path)
        .read(spark)
        .select("doc_id", "n_pii_spans", "n_chars", "kept_chars", "cleaned_md5")
        .orderBy("doc_id")
    )


def _stream_pii_scrub_ingest_sql() -> str:
    from .llm import _PII_SPANS_CTES

    return f"""
WITH {_PII_SPANS_CTES}, ivls AS (
    SELECT doc_id, span_start AS ivl_start,
           span_start + span_len AS ivl_end
    FROM typed WHERE pii_type IS NOT NULL
), spancnt AS (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_pii_spans
    FROM typed WHERE pii_type IS NOT NULL GROUP BY doc_id
), gaps AS (
    SELECT doc_id,
           COALESCE(LAG(ivl_end) OVER (PARTITION BY doc_id
                                       ORDER BY ivl_start), 1) AS gs,
           ivl_start AS ge
    FROM ivls
    UNION ALL
    SELECT doc_id, MAX(ivl_end) AS gs, NULL AS ge
    FROM ivls GROUP BY doc_id
), segs AS (
    SELECT g.doc_id, g.gs,
           substr(d.ctext, CAST(g.gs AS INTEGER),
                  CAST(COALESCE(g.ge, LENGTH(d.ctext) + 1) - g.gs AS INTEGER))
               AS seg
    FROM gaps g JOIN contaminated d USING (doc_id)
), rebuilt AS (
    SELECT doc_id, STRING_AGG(seg, '' ORDER BY gs) AS cleaned
    FROM segs GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(s.n_pii_spans, 0) AS n_pii_spans,
       CAST(LENGTH(d.ctext) AS BIGINT) AS n_chars,
       CAST(LENGTH(COALESCE(r.cleaned, d.ctext)) AS BIGINT) AS kept_chars,
       md5(COALESCE(r.cleaned, d.ctext)) AS cleaned_md5
FROM contaminated d
LEFT JOIN rebuilt r USING (doc_id)
LEFT JOIN spancnt s USING (doc_id)
ORDER BY d.doc_id
"""


STREAM_PII_SCRUB_INGEST_SQL = _stream_pii_scrub_ingest_sql()


def stream_audio_dedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6c/L5d (round-13 — VERDICT r12 #7): streaming AUDIO ingest
    with at-most-once content semantics — every arriving asset is
    codec-decoded and fingerprinted (`multimodal/afp.py`), then
    exact-fingerprint-deduplicated against everything retained
    (bloom-gated store probe — fingerprints are near-uniform, so
    bloom, not min/max, is the right gate) and within its batch
    (keep-first by id). With the doc_id-ranged replay the retained
    table is exactly `min(asset_id) per distinct fingerprint`, which
    the oracle recomputes bit-for-bit from the documents table (the
    batch near-dup query's fingerprint CTE chain)."""
    import tempfile as _tf

    from ..streaming.streams import audio_dedup_ingest_sink

    replay = _build_docs_replay(spark, sf_dir)
    assets = (
        spark.readStream.schema(_DOCS_REPLAY_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(f"{replay}/s*/part-*.json")
        .select(F.col("doc_id").alias("asset_id"))
    )
    table_path = _tf.mkdtemp(prefix="stream_audiodedup_table_")
    ckpt = _tf.mkdtemp(prefix="stream_audiodedup_ckpt_")
    q = (
        audio_dedup_ingest_sink(assets, table_path, ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    if q.exception() is not None:
        raise q.exception()

    from ..sinks.manifest import ManifestTable

    return (
        ManifestTable(table_path)
        .read(spark)
        .select("asset_id", "afp")
        .orderBy("asset_id")
    )


def _stream_audio_dedup_ingest_sql() -> str:
    from .udfs import AFP_FP_CTES

    # CAST the fingerprint to BIGINT: DuckDB's integer SUM yields
    # HUGEINT, which pandas materializes as float64 — 62-bit values
    # exceed the 53-bit mantissa and silently lose low bits
    return f"""
WITH {AFP_FP_CTES}
SELECT aid AS asset_id, CAST(afp AS BIGINT) AS afp FROM (
  SELECT aid, CAST(afp AS BIGINT) AS afp,
         ROW_NUMBER() OVER (PARTITION BY CAST(afp AS BIGINT)
                            ORDER BY aid) AS rn
  FROM fp
) WHERE rn = 1
ORDER BY asset_id
"""


STREAM_AUDIO_DEDUP_INGEST_SQL = _stream_audio_dedup_ingest_sql()


def stream_image_dedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6c/L5 (round-14 — VERDICT r13 #7: the media×streaming matrix
    completes): streaming IMAGE ingest with at-most-once content
    semantics — every arriving asset is synthesized → REAL PPM codec
    round-trip → block-mean resized → aHash64-fingerprinted
    (`multimodal/phash.py:image_fingerprints`), then
    exact-fingerprint-deduplicated against everything retained
    (per-value bloom-gated store probe) and within its batch
    (keep-first by id), through the generic media dedup-ingest sink.
    With the doc_id-ranged replay the retained table is exactly
    `min(asset_id) per distinct phash`, which the oracle recomputes
    bit-for-bit: every pixel of every synthetic image is closed-form
    in the id, so the block means, the 64 threshold bits, and the
    signed MSB-first pack are re-derived in SQL."""
    import tempfile as _tf

    from ..streaming.streams import image_dedup_ingest_sink

    replay = _build_docs_replay(spark, sf_dir)
    assets = (
        spark.readStream.schema(_DOCS_REPLAY_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(f"{replay}/s*/part-*.json")
        .select(F.col("doc_id").alias("asset_id"))
    )
    table_path = _tf.mkdtemp(prefix="stream_imagededup_table_")
    ckpt = _tf.mkdtemp(prefix="stream_imagededup_ckpt_")
    q = (
        image_dedup_ingest_sink(assets, table_path, ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    if q.exception() is not None:
        raise q.exception()

    from ..sinks.manifest import ManifestTable

    return (
        ManifestTable(table_path)
        .read(spark)
        .select("asset_id", "phash")
        .orderBy("asset_id")
    )


# aHash-from-closed-form CTE chain shared by the image ingest
# oracles: pixels of the synthetic gray PPM are ((t²+3t) mod p) mod
# 256 with t = (b·97 + y·w + x) mod p (b = aid−1 for exact-dup
# plants, aid−2 for NEAR-dup plants whose row-0 first 4 pixels are
# forced to 255), the 12-row image crops to 8 rows (bh = 12//8 = 1)
# and w ∈ [16, 24) crops to 16 cols (bw = 2 for every id), each
# output pixel is the truncated 2-pixel block mean, bit_p is the
# exact-integer mean test s·64 > Σs, and the hash is the signed
# MSB-first pack (bit 0 → −2^63). Intermediate SUMs go through
# HUGEINT — the final CAST to BIGINT dodges the float64
# materialization seam. Yields CTE `ifp` = (aid, phash).
_IMG_FP_CTES = """bb AS (
  SELECT doc_id AS aid,
         CAST(CASE WHEN doc_id % 10 = 1 THEN doc_id - 1
                   WHEN doc_id % 10 = 2 THEN doc_id - 2
                   ELSE doc_id END AS BIGINT) AS b,
         doc_id % 10 = 2 AS near,
         CAST(16 + (CASE WHEN doc_id % 10 = 1 THEN doc_id - 1
                         WHEN doc_id % 10 = 2 THEN doc_id - 2
                         ELSE doc_id END) % 8 AS BIGINT) AS w
  FROM documents
), px AS (
  SELECT aid, y, x,
         CASE WHEN near AND y = 0 AND x < 4 THEN 255
              ELSE ((t*t + 3*t) % 1000003) % 256 END AS p
  FROM (
    SELECT aid, near, y, x, (b*97 + y*w + x) % 1000003 AS t
    FROM bb,
         UNNEST(generate_series(CAST(0 AS BIGINT), CAST(7 AS BIGINT)))
             AS ty(y),
         UNNEST(generate_series(CAST(0 AS BIGINT), CAST(15 AS BIGINT)))
             AS tx(x)
  )
), sm AS (
  SELECT aid, y, x // 2 AS gx, SUM(p) // 2 AS s
  FROM px GROUP BY aid, y, x // 2
), tot AS (
  SELECT aid, SUM(s) AS ts FROM sm GROUP BY aid
), bits AS (
  SELECT sm.aid, (y*8 + gx) AS pos,
         CASE WHEN s*64 > ts THEN 1 ELSE 0 END AS bit
  FROM sm JOIN tot ON sm.aid = tot.aid
), ifp AS (
  SELECT aid,
         CAST(SUM(CASE WHEN pos = 0 THEN -9223372036854775808 * bit
                       ELSE bit * (CAST(1 AS BIGINT) << CAST(63 - pos AS INT))
                  END) AS BIGINT) AS phash
  FROM bits GROUP BY aid
)"""

STREAM_IMAGE_DEDUP_INGEST_SQL = f"""
WITH {_IMG_FP_CTES}
SELECT aid AS asset_id, phash FROM (
  SELECT aid, phash,
         ROW_NUMBER() OVER (PARTITION BY phash ORDER BY aid) AS rn
  FROM ifp
) WHERE rn = 1
ORDER BY asset_id
"""


def stream_image_neardup_ingest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """T6c/L5×L2 (round-14): streaming image NEAR-DUP annotation at
    ingest — the banded-store probe generalized beyond minhash.
    Arriving assets are aHash-fingerprinted and probed against the
    persistent BANDED phash store (4×16-bit band keys; Hamming ≤ 3
    < 4 bands is pigeonhole-exhaustive, so band equality finds every
    qualifying pair); retained rows are annotated (n_near_dups,
    best_dup_of, best_hamming) vs EARLIER batches. Batch membership
    is the max(doc_id) thirds and every pixel is closed-form in the
    id, so the oracle recomputes every annotation bit-for-bit from
    the DEFINITIONAL O(n²) form (all earlier-batch pairs with
    popcount(xor) ≤ 3) — independent of the engine's banding."""
    import tempfile as _tf

    from ..streaming.streams import image_neardup_ingest_sink

    replay = _build_docs_replay(spark, sf_dir)
    assets = (
        spark.readStream.schema(_DOCS_REPLAY_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(f"{replay}/s*/part-*.json")
        .select(F.col("doc_id").alias("asset_id"))
    )
    table_path = _tf.mkdtemp(prefix="stream_imgneardup_table_")
    store_path = _tf.mkdtemp(prefix="stream_imgneardup_store_")
    ckpt = _tf.mkdtemp(prefix="stream_imgneardup_ckpt_")
    # same discipline as the minhash query above: knobs sized so the
    # stepped-merge maintenance runs under the oracle gate (~670
    # banded rows/batch at B=256 share a level ⇒ batch 2 merges batch 1)
    q = (
        image_neardup_ingest_sink(
            assets, table_path, store_path, ckpt,
            compact_factor=2, rows_per_file=256,
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    if q.exception() is not None:
        raise q.exception()

    from ..sinks.manifest import ManifestTable

    return (
        ManifestTable(table_path)
        .read(spark)
        .select(
            "asset_id", "phash", "n_near_dups",
            "best_dup_of", "best_hamming",
        )
        .orderBy("asset_id")
    )


def _stream_image_neardup_ingest_sql() -> str:
    batch = (
        "(CASE WHEN {c} <= mm.m // 3 THEN 0 "
        "WHEN {c} <= (2 * mm.m) // 3 THEN 1 ELSE 2 END)"
    )
    bn = batch.format(c="n.aid")
    bh = batch.format(c="h.aid")
    return f"""
WITH {_IMG_FP_CTES}, hits AS (
    SELECT n.aid AS id_new, h.aid AS id_hist,
           bit_count(xor(n.phash, h.phash)) AS hamming
    FROM ifp n
    JOIN ifp h ON n.aid <> h.aid
    JOIN (SELECT MAX(doc_id) AS m FROM documents) mm ON TRUE
    WHERE bit_count(xor(n.phash, h.phash)) <= 3
      AND {bh} < {bn}
), ranked AS (
    SELECT id_new, id_hist, hamming,
           CAST(COUNT(*) OVER (PARTITION BY id_new) AS BIGINT)
               AS n_near_dups,
           ROW_NUMBER() OVER (PARTITION BY id_new
                              ORDER BY hamming ASC, id_hist ASC) AS rn
    FROM hits
)
SELECT f.aid AS asset_id, f.phash,
       COALESCE(r.n_near_dups, 0) AS n_near_dups,
       r.id_hist AS best_dup_of,
       CAST(r.hamming AS BIGINT) AS best_hamming
FROM ifp f
LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) r ON f.aid = r.id_new
ORDER BY asset_id
"""


STREAM_IMAGE_NEARDUP_INGEST_SQL = _stream_image_neardup_ingest_sql()


def stream_neardup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6c/L2 (round-13): streaming minhash NEAR-DUP annotation at
    ingest — every arriving doc probed against the persistent
    signature store (band-key candidates, signature-agreement Jaccard
    estimate; history text never re-read) and retained ANNOTATED with
    (n_near_dups, best_dup_of, best_est_jaccard) vs everything from
    EARLIER batches. Because batch membership is a pure function of
    max(doc_id) (the `_build_docs_replay` thirds — the span-ingest
    oracle trick) and the signatures are the parity formulation, the
    oracle recomputes every annotation bit-for-bit: candidates =
    banded pairs with batch(hist) < batch(new), score = exact
    agreement count / 32, best = (agreement desc, id asc)."""
    import tempfile as _tf

    from ..streaming.streams import neardup_ingest_sink

    replay = _build_docs_replay(spark, sf_dir)
    docs = (
        spark.readStream.schema(_DOCS_REPLAY_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(f"{replay}/s*/part-*.json")
    )
    table_path = _tf.mkdtemp(prefix="stream_neardup_table_")
    store_path = _tf.mkdtemp(prefix="stream_neardup_store_")
    ckpt = _tf.mkdtemp(prefix="stream_neardup_ckpt_")
    # compaction knobs sized so the stepped-merge maintenance path
    # actually RUNS under the oracle gate at driver scale (defaults
    # never trigger on 3 small batches): ~10.7k banded rows/batch at
    # B=1024 buckets at level 3, so batch 2's same-level append merges batch 1's run —
    # the merge is value-preserving, so the hash gate certifies it
    q = (
        neardup_ingest_sink(
            docs, table_path, store_path, ckpt,
            compact_factor=2, rows_per_file=1024,
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    if q.exception() is not None:
        raise q.exception()

    from ..sinks.manifest import ManifestTable

    return (
        ManifestTable(table_path)
        .read(spark)
        .select(
            "doc_id", "source", "n_chars", "n_near_dups",
            "best_dup_of", "best_est_jaccard",
        )
        .orderBy("doc_id")
    )


def _stream_neardup_ingest_sql() -> str:
    from ..dedup.parity import _MH_NUM, minhash_pair_ctes

    batch = (
        "(CASE WHEN {c} <= mm.m // 3 THEN 0 "
        "WHEN {c} <= (2 * mm.m) // 3 THEN 1 ELSE 2 END)"
    )
    ctes = minhash_pair_ctes(
        cand_join="JOIN (SELECT MAX(doc_id) AS m FROM documents) mm ON TRUE",
        cand_where=(
            batch.format(c="n.id") + " > " + batch.format(c="h.id")
        ),
    )
    return f"""
WITH {ctes}, qual AS (
    SELECT id_new, id_hist, n_agree
    FROM scored WHERE n_agree >= 16
), ranked AS (
    SELECT id_new, id_hist, n_agree,
           CAST(COUNT(*) OVER (PARTITION BY id_new) AS BIGINT)
               AS n_near_dups,
           ROW_NUMBER() OVER (PARTITION BY id_new
                              ORDER BY n_agree DESC, id_hist ASC) AS rn
    FROM qual
)
SELECT d.doc_id, d.source, CAST(d.n_chars AS BIGINT) AS n_chars,
       COALESCE(r.n_near_dups, 0) AS n_near_dups,
       r.id_hist AS best_dup_of,
       CAST(r.n_agree AS DOUBLE) / {float(_MH_NUM)} AS best_est_jaccard
FROM documents d
LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) r ON d.doc_id = r.id_new
ORDER BY d.doc_id
"""


STREAM_NEARDUP_INGEST_SQL = _stream_neardup_ingest_sql()


def stream_span_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6c/L2k: streaming span-aware ingest under the oracle gate.
    Each doc_id-ranged micro-batch is annotated with duplicated-char
    extents relative to earlier batches (gram store probe) plus
    in-batch repeats (see streams.span_ingest_sink). Because the
    replay's three batch boundaries are a pure function of
    max(doc_id) (m//3, 2m//3 — `_build_docs_replay`), the oracle can
    recompute batch membership and replicate the flag rule exactly:
    first_batch(gram) < batch(doc) OR in-batch count >= 2."""
    import tempfile as _tf

    from ..streaming.streams import span_ingest_sink

    replay = _build_docs_replay(spark, sf_dir)
    docs = (
        spark.readStream.schema(_DOCS_REPLAY_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(f"{replay}/s*/part-*.json")
    )
    table_path = _tf.mkdtemp(prefix="stream_span_table_")
    store_path = _tf.mkdtemp(prefix="stream_span_store_")
    ckpt = _tf.mkdtemp(prefix="stream_span_ckpt_")
    q = (
        span_ingest_sink(docs, table_path, store_path, ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    if q.exception() is not None:
        raise q.exception()

    from pyspark.sql.window import Window

    from ..sinks.manifest import ManifestTable

    # read-time doc_id dedup keeps the MINIMUM (dup_chars, n_extents)
    # row: a checkpoint replay that re-annotates a batch AFTER its own
    # grams landed in the store can only inflate dup_chars (self-
    # flagging), so min deterministically recovers the original
    # annotation (see span_ingest_sink's durability note)
    wmin = Window.partitionBy("doc_id").orderBy("dup_chars", "n_extents")
    return (
        ManifestTable(table_path)
        .read(spark)
        .withColumn("rn", F.row_number().over(wmin))
        .filter(F.col("rn") == 1)
        .select("doc_id", "source", "n_chars", "dup_chars", "n_extents")
        .orderBy("doc_id")
    )


STREAM_SPAN_INGEST_SQL = """
WITH m AS (SELECT MAX(doc_id) AS mx FROM documents),
assigned AS (
    SELECT doc_id, text, source, n_chars,
           CASE WHEN doc_id <= mx // 3 THEN 0
                WHEN doc_id <= (2 * mx) // 3 THEN 1
                ELSE 2 END AS batch
    FROM documents CROSS JOIN m
), fanout AS (
    SELECT doc_id, batch, text,
           unnest(generate_series(0,
               CAST(LENGTH(text) - 64 AS BIGINT))) AS k
    FROM assigned
    WHERE LENGTH(text) >= 64
), grams AS (
    SELECT doc_id, batch, k + 1 AS pos,
           md5(substr(text, CAST(k + 1 AS INTEGER), 64)) AS h
    FROM fanout
), hb AS (
    SELECT h, batch, COUNT(*) AS c FROM grams GROUP BY h, batch
), firstb AS (
    SELECT h, MIN(batch) AS fb FROM hb GROUP BY h
), flagged AS (
    SELECT g.doc_id, g.pos
    FROM grams g
    JOIN firstb f ON f.h = g.h
    JOIN hb ON hb.h = g.h AND hb.batch = g.batch
    WHERE f.fb < g.batch OR hb.c >= 2
), marked AS (
    SELECT doc_id, pos,
           CASE WHEN LAG(pos) OVER w IS NULL
                  OR pos - LAG(pos) OVER w > 64 THEN 1
                ELSE 0 END AS is_new
    FROM flagged
    WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
), numbered AS (
    SELECT doc_id, pos,
           SUM(is_new) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ext_id
    FROM marked
), extents AS (
    SELECT doc_id, MAX(pos) - MIN(pos) + 64 AS ext_len
    FROM numbered GROUP BY doc_id, ext_id
), stats AS (
    SELECT doc_id,
           CAST(SUM(ext_len) AS BIGINT) AS dup_chars,
           CAST(COUNT(*) AS BIGINT) AS n_extents
    FROM extents GROUP BY doc_id
)
SELECT a.doc_id, a.source, a.n_chars,
       COALESCE(s.dup_chars, 0) AS dup_chars,
       COALESCE(s.n_extents, 0) AS n_extents
FROM assigned a LEFT JOIN stats s USING (doc_id)
ORDER BY a.doc_id
"""


QUERIES: dict[str, QuerySpec] = {
    "stream_span_ingest": QuerySpec(
        stream_span_ingest,
        STREAM_SPAN_INGEST_SQL,
        tags=("T6", "L2", "L1", "W3"),
        doc="streaming span-aware ingest: per-batch duplicated-extent "
        "annotation vs a persistent gram store + in-batch repeats, "
        "exact-oracled via the deterministic batch boundaries",
    ),
    "stream_latedrop_tumbling": QuerySpec(
        stream_latedrop_tumbling,
        STREAM_LATEDROP_TUMBLING_SQL,
        tags=("T4", "T1"),
        doc="real availableNow stream: watermark late-drop + append-mode "
        "window finalization, exact-oracled via a deterministic replay",
    ),
    "stream_dedup_watermark": QuerySpec(
        stream_dedup_watermark,
        STREAM_DEDUP_WATERMARK_SQL,
        tags=("T5", "T4"),
        doc="real availableNow stream: dropDuplicatesWithinWatermark "
        "removes injected re-sends, exact-oracled via replay construction",
    ),
    "stream_custom_state_totals": QuerySpec(
        stream_custom_state_totals,
        STREAM_CUSTOM_STATE_TOTALS_SQL,
        tags=("T5", "UDAF"),
        doc="applyInPandasWithState per-user running state across "
        "micro-batches; converged state == batch aggregate, exact-oracled",
    ),
    "stream_static_enrich": QuerySpec(
        stream_static_enrich,
        STREAM_STATIC_ENRICH_SQL,
        tags=("T1", "T4", "J2"),
        doc="stream-static broadcast enrichment + watermarked hourly "
        "rollup per segment; append flush bound mirrored in the oracle",
    ),
    "stream_interval_join": QuerySpec(
        stream_interval_join,
        STREAM_INTERVAL_JOIN_SQL,
        tags=("T7", "J7", "T4"),
        doc="real availableNow stream-stream interval join (watermarked, "
        "bounded state); converged sink == batch interval join, "
        "exact-oracled",
    ),
    "stream_session_timeout": QuerySpec(
        stream_session_timeout,
        STREAM_SESSION_TIMEOUT_SQL,
        tags=("T3", "T5", "UDAF"),
        doc="event-time-timer sessionization (EventTimeTimeout state); "
        "inline closes + timer flush bound mirrored in the oracle",
    ),
    "stream_right_outer_interval_join": QuerySpec(
        stream_right_outer_interval_join,
        STREAM_RIGHT_OUTER_INTERVAL_JOIN_SQL,
        tags=("T7", "J4", "T4"),
        doc="stream-stream RIGHT OUTER interval join: right-horizon "
        "null extension, flush bound mirrored in the oracle",
    ),
    "stream_full_outer_interval_join": QuerySpec(
        stream_full_outer_interval_join,
        STREAM_FULL_OUTER_INTERVAL_JOIN_SQL,
        tags=("T7", "J4", "T4"),
        doc="stream-stream FULL OUTER interval join: per-side expiry "
        "horizons, both flush bounds mirrored in the oracle",
    ),
    "stream_outer_interval_join": QuerySpec(
        stream_outer_interval_join,
        STREAM_OUTER_INTERVAL_JOIN_SQL,
        tags=("T7", "J4", "T4"),
        doc="stream-stream LEFT OUTER interval join: null-extended rows "
        "emitted at watermark expiry; flush bound mirrored in the oracle",
    ),
    "stream_pii_scrub_ingest": QuerySpec(
        stream_pii_scrub_ingest,
        STREAM_PII_SCRUB_INGEST_SQL,
        tags=("T6", "L4", "F1", "W3"),
        doc="streaming PII scrub at ingest: arriving docs' email/phone/"
        "IPv4 token spans excised byte-exactly before landing, span "
        "count + scrubbed-text md5 committed per doc; replay-safe "
        "anti-join; batch-structure-invariant, exact batch-replica "
        "oracle",
    ),
    "stream_decontaminate_ingest": QuerySpec(
        stream_decontaminate_ingest,
        STREAM_DECONTAMINATE_INGEST_SQL,
        tags=("T6", "L4", "L1", "J2"),
        doc="streaming decontamination at ingest: train batches probed "
        "against the fixed eval gram store (broadcast), retained "
        "annotated with leakage counts; batch-structure-invariant, "
        "exact LEFT-JOIN oracle",
    ),
    "stream_ingest_dedup": QuerySpec(
        stream_ingest_dedup,
        STREAM_INGEST_DEDUP_SQL,
        tags=("T6", "J6", "S6"),
        doc="foreachBatch incremental-dedup ingest into a manifest table; "
        "retained set == min(doc_id) per distinct text, exact-oracled",
    ),
    "stream_neardup_ingest": QuerySpec(
        stream_neardup_ingest,
        STREAM_NEARDUP_INGEST_SQL,
        tags=("T6", "L2", "J1", "W1"),
        doc="streaming minhash NEAR-DUP annotation at ingest: arriving "
        "docs probed against the persistent signature store (band-key "
        "candidates, signature-agreement Jaccard estimate - history "
        "text never re-read), retained annotated with (n_near_dups, "
        "best_dup_of, best_est_jaccard) vs earlier batches; "
        "exact-oracled via the parity signatures + the batch-thirds "
        "membership trick; three idempotence guards make every "
        "checkpoint-replay crash window safe",
    ),
    "stream_audio_dedup_ingest": QuerySpec(
        stream_audio_dedup_ingest,
        STREAM_AUDIO_DEDUP_INGEST_SQL,
        tags=("T6", "L5", "M1", "J6"),
        doc="streaming AUDIO ingest with at-most-once content "
        "semantics: arriving assets codec-decoded + fingerprinted "
        "(one Arrow pass), exact-fingerprint-deduped against the "
        "retained table (bloom-gated store probe - fingerprints are "
        "near-uniform) and within-batch; retained set == "
        "min(asset_id) per distinct fingerprint, exact-oracled (the "
        "oracle recomputes every fingerprint bit)",
    ),
    "stream_image_dedup_ingest": QuerySpec(
        stream_image_dedup_ingest,
        STREAM_IMAGE_DEDUP_INGEST_SQL,
        tags=("T6", "L5", "M1", "J6"),
        doc="streaming IMAGE ingest with at-most-once content "
        "semantics: arriving assets run the real PPM codec round-trip "
        "+ block-mean resize + aHash64 (one Arrow pass), then "
        "exact-fingerprint dedup against the retained table "
        "(per-value bloom-gated probe) and within-batch; retained "
        "set == min(asset_id) per distinct phash, exact-oracled (the "
        "oracle re-derives every pixel, block mean, and hash bit "
        "from the closed form)",
    ),
    "stream_image_neardup_ingest": QuerySpec(
        stream_image_neardup_ingest,
        STREAM_IMAGE_NEARDUP_INGEST_SQL,
        tags=("T6", "L5", "L2", "M1"),
        doc="streaming image NEAR-DUP annotation at ingest: the "
        "banded-store probe generalized beyond minhash - 4x16-bit "
        "phash band keys (Hamming<=3 is pigeonhole-exhaustive), the "
        "same bloom-sidecar + file-stabbing + stepped-merge store "
        "discipline; retained assets annotated (n_near_dups, "
        "best_dup_of, best_hamming) vs earlier batches; oracle is "
        "the DEFINITIONAL O(n^2) popcount form, independent of the "
        "engine's banding",
    ),
}


def _protobuf_available() -> bool:
    """transformWithStateInPandas' Python worker speaks the state-store
    protocol over protobuf; without google.protobuf the worker crashes
    at init (observed: STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE
    importing pyspark/sql/streaming/proto/StateMessage_pb2)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


# Env-gated registration: the stateful-v2 query joins the registry the
# moment its one missing dependency exists (it does on any real Spark
# cluster — protobuf ships with most distros; this container omits it).
# tests/test_streaming.py carries the matching skip-gated exercise.
if _protobuf_available():  # pragma: no cover — dep absent here
    QUERIES["stream_tws_totals"] = QuerySpec(
        stream_tws_totals,
        STREAM_TWS_TOTALS_SQL,
        tags=("T5", "UDAF"),
        doc="transformWithStateInPandas (stateful v2, typed ValueState, "
        "RocksDB) running totals; converged state == batch aggregate",
    )
