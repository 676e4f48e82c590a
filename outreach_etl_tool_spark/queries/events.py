"""Event-time queries T1-T3/T6 in batch form (SURVEY.md §2.9).

The reference's sync is a watermark-driven daily micro-batch over
updatedAt (outreach_etl.py:115-117,223-229); these queries are the
event-time operator family that model generalizes to. Each has a
batch-SQL oracle; the true Structured Streaming forms (withWatermark,
session_window, dropDuplicatesWithinWatermark, foreachBatch upsert)
live in streaming/ and are covered by rows-only tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.scalars import exact_sum, sum_sql
from ..operators.sessionize import sessionize
from . import QuerySpec


# T1 — tumbling window aggregation via the window() operator; the oracle
# uses date_trunc (tumbling windows of 1h are epoch-aligned in both).
def evt_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), exact_sum("value").alias("total_value"))
        .select(
            F.col("window.start").alias("bucket_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


EVT_TUMBLING_SQL = f"""
SELECT DATE_TRUNC('hour', ts) AS bucket_start, event_type,
       COUNT(*) AS n, {sum_sql('value')} AS total_value
FROM events
GROUP BY 1, 2
"""


# T2 — sliding window (1h window, 15m slide): each event lands in 4
# windows. The oracle expands the window membership explicitly: window
# starts are the 15-minute buckets k=0..3 steps back from the event's
# bucket (identical alignment: Spark slides are epoch-aligned).
def evt_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes"))
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("win_start"), "n")
    )


EVT_SLIDING_SQL = """
SELECT MAKE_TIMESTAMP(
         (CAST(FLOOR(EPOCH(ts) / 900) AS BIGINT) * 900 - k * 900) * 1000000
       ) AS win_start,
       COUNT(*) AS n
FROM events, UNNEST([0, 1, 2, 3]) AS t(k)
GROUP BY 1
"""


# T3 — gap-based sessionization in batch (operators/sessionize.py), then
# per-session rollup. The oracle replicates the lag+cumsum trick with
# ANSI window functions; tiebreak on event_id pins equal-ts ordering.
_GAP_S = 1800  # 30 minutes


def evt_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sessions = sessionize(
        ev, key="user_id", ts="ts", gap_seconds=_GAP_S, order_tiebreak="event_id"
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        exact_sum("value").alias("session_value"),
    )


EVT_SESSIONS_SQL = f"""
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR EPOCH(ts) - EPOCH(LAG(ts) OVER w) > {_GAP_S} THEN 1
              ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts, value,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_id
  FROM flagged
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       {sum_sql('value')} AS session_value
FROM numbered
GROUP BY user_id, session_id
"""


# T6 — incremental upsert compaction in batch: replay a day of "updates"
# (events as CDC rows keyed by user) and keep the latest state per key —
# the reference's re-pull-replaces-by-id semantics (outreach_etl.py:227-229)
# without its duplicate bugs (SURVEY.md §2.12).
def evt_upsert_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("ts").alias("latest_ts"),
            F.col("event_type").alias("latest_type"),
            F.col("value").alias("latest_value"),
        )
    )


EVT_UPSERT_COMPACT_SQL = """
SELECT user_id, ts AS latest_ts, event_type AS latest_type, value AS latest_value
FROM (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


# Ordered funnel: per user, first 'view', first 'click' AFTER that
# view, first 'purchase' AFTER that click. Each step conditions on the
# previous step's timestamp, so it's a chain of per-user min-aggregates
# joined back — all tiny per-user tables after the first aggregation;
# AQE broadcasts every subsequent join. The product-analytics staple
# (conversion funnels) and the per-entity ordered-sequence shape that a
# plain groupBy cannot express.
def evt_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click_after"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("first_click_after"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase_after"))
    )
    users = ev.select("user_id").distinct()
    return (
        users.join(v, "user_id", "left")
        .join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id", "first_view", "first_click_after", "first_purchase_after"
        )
    )


EVT_FUNNEL_STEPS_SQL = """
WITH v AS (
    SELECT user_id, MIN(ts) AS first_view
    FROM events WHERE event_type = 'view' GROUP BY user_id
), c AS (
    SELECT e.user_id, MIN(e.ts) AS first_click_after
    FROM events e JOIN v ON e.user_id = v.user_id
    WHERE e.event_type = 'click' AND e.ts > v.first_view
    GROUP BY e.user_id
), p AS (
    SELECT e.user_id, MIN(e.ts) AS first_purchase_after
    FROM events e JOIN c ON e.user_id = c.user_id
    WHERE e.event_type = 'purchase' AND e.ts > c.first_click_after
    GROUP BY e.user_id
)
SELECT u.user_id, v.first_view, c.first_click_after, p.first_purchase_after
FROM (SELECT DISTINCT user_id FROM events) u
LEFT JOIN v ON u.user_id = v.user_id
LEFT JOIN c ON u.user_id = c.user_id
LEFT JOIN p ON u.user_id = p.user_id
"""


# Cohort retention: users grouped by first-activity day, counted on
# each later active day by offset. Two aggregations over the events
# scan (first-day per user; distinct user-days) joined on user — the
# first-day table is per-user-small, AQE broadcast-joins it into the
# distinct-day stream. The standard growth-analytics rollup.
def evt_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    activity = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    return (
        activity.join(first, "user_id")
        .groupBy("cohort_day", F.datediff("d", F.col("cohort_day")).alias("day_offset"))
        .agg(F.count("*").alias("n_users"))
    )


EVT_RETENTION_SQL = """
WITH first AS (
    SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
    FROM events GROUP BY user_id
), activity AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
)
SELECT first.cohort_day,
       CAST(activity.d - first.cohort_day AS INTEGER) AS day_offset,
       COUNT(*) AS n_users
FROM activity JOIN first ON activity.user_id = first.user_id
GROUP BY first.cohort_day, day_offset
"""


# T6b — SCD2 history build (operators/scd2.py): the warehouse-side
# alternative to the reference's re-pull-and-replace sync. Events act
# as the observation log: per user, consecutive same-event_type
# observations compress into one validity interval with
# valid_from/valid_to/is_current. Oracle: LAG change filter + LEAD
# intervals, same (ts, event_id) deterministic ordering.
def evt_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.scd2 import build_scd2

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    out = build_scd2(
        ev, key="user_id", ts="ts", tracked=["event_type"],
        tiebreak=["event_id"],
    )
    return out.select(
        "user_id", "event_id", "event_type",
        "valid_from", "valid_to", "is_current",
    )


EVT_SCD2_HISTORY_SQL = """
WITH chg AS (
    SELECT user_id, ts, event_id, event_type FROM (
        SELECT user_id, ts, event_id, event_type,
               LAG(event_type) OVER w AS prev_type,
               LAG(ts) OVER w AS prev_ts
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ) WHERE prev_ts IS NULL OR event_type IS DISTINCT FROM prev_type
)
SELECT user_id, event_id, event_type,
       ts AS valid_from,
       LEAD(ts) OVER w2 AS valid_to,
       LEAD(ts) OVER w2 IS NULL AS is_current
FROM chg
WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# T1b/W1 — OHLC time-series resample: the financial/telemetry
# downsampling operator — per (user, 6-hour epoch-aligned bucket):
# open/close = the first/last value in the bucket's (ts, event_id)
# total order, high/low = extrema, n_events = volume. Pure value
# PICKING (no float arithmetic), so the oracle matches bit-for-bit
# with zero decimal gymnastics. Plan shape: both row_numbers and the
# final aggregate share ONE (user_id, bucket) hash partitioning —
# a single exchange; Spark's epoch-aligned `window()` equals
# day-trunc + 6h*floor(hour/6) because 21600 divides 86400.
def evt_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    b = ev.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.window("ts", "6 hours").start.alias("bucket_start"),
    )
    w = Window.partitionBy("user_id", "bucket_start")
    ranked = b.select(
        "user_id",
        "bucket_start",
        "value",
        F.row_number().over(w.orderBy("ts", "event_id")).alias("rn_a"),
        F.row_number()
        .over(w.orderBy(F.desc("ts"), F.desc("event_id")))
        .alias("rn_d"),
    )
    return (
        ranked.groupBy("user_id", "bucket_start")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias(
                "open_value"
            ),
            F.max("value").alias("high_value"),
            F.min("value").alias("low_value"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias(
                "close_value"
            ),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id", "bucket_start")
    )


EVT_OHLC_RESAMPLE_SQL = """
WITH ranked AS (
    SELECT user_id,
           DATE_TRUNC('day', ts)
               + (CAST(EXTRACT(hour FROM ts) AS BIGINT) // 6)
                 * INTERVAL 6 HOUR AS bucket_start,
           value,
           ROW_NUMBER() OVER (PARTITION BY user_id,
               DATE_TRUNC('day', ts)
                   + (CAST(EXTRACT(hour FROM ts) AS BIGINT) // 6)
                     * INTERVAL 6 HOUR
               ORDER BY ts, event_id) AS rn_a,
           ROW_NUMBER() OVER (PARTITION BY user_id,
               DATE_TRUNC('day', ts)
                   + (CAST(EXTRACT(hour FROM ts) AS BIGINT) // 6)
                     * INTERVAL 6 HOUR
               ORDER BY ts DESC, event_id DESC) AS rn_d
    FROM events
    WHERE value IS NOT NULL
)
SELECT user_id, bucket_start,
       MAX(CASE WHEN rn_a = 1 THEN value END) AS open_value,
       MAX(value) AS high_value,
       MIN(value) AS low_value,
       MAX(CASE WHEN rn_d = 1 THEN value END) AS close_value,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM ranked
GROUP BY user_id, bucket_start
ORDER BY user_id, bucket_start
"""


# T16 — WINDOWED CONVERSION: the time-bounded funnel metric product
# teams actually report — of the users whose FIRST view happened on
# day D, how many purchased within 24 hours of that first view. The
# unconstrained funnel (evt_funnel_steps) only orders steps; the
# window bound changes both the join predicate (purchase ts in
# [first_view, first_view + 24h]) and the cohort attribution (to the
# first-view day). Exact: timestamps compare directly, counts are
# integers, the rate is one division. Scale shape: one user rollup
# for first views, a user-equi semi-join-shaped probe for in-window
# purchases, one day rollup.
_CONV_WINDOW_H = 24


def evt_windowed_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    fv = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts")
    )
    converted = (
        fv.join(purchases, "user_id")
        .filter(
            (F.col("pts") >= F.col("first_view"))
            & (
                F.col("pts")
                <= F.col("first_view") + F.expr(f"INTERVAL {_CONV_WINDOW_H} HOURS")
            )
        )
        .select("user_id")
        .distinct()
        .withColumn("converted", F.lit(1))
    )
    return (
        fv.join(converted, "user_id", "left")
        .groupBy(F.to_date("first_view").alias("cohort_day"))
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(F.coalesce("converted", F.lit(0))).cast("long").alias(
                "n_converted"
            ),
        )
        .withColumn(
            "conversion_rate",
            F.col("n_converted").cast("double") / F.col("n_users"),
        )
        .orderBy("cohort_day")
    )


EVT_WINDOWED_CONVERSION_SQL = f"""
WITH fv AS (
    SELECT user_id, MIN(ts) AS first_view
    FROM events WHERE event_type = 'view' GROUP BY user_id
), conv AS (
    SELECT DISTINCT fv.user_id
    FROM fv JOIN events p
      ON p.user_id = fv.user_id AND p.event_type = 'purchase'
     AND p.ts >= fv.first_view
     AND p.ts <= fv.first_view + INTERVAL {_CONV_WINDOW_H} HOUR
)
SELECT CAST(first_view AS DATE) AS cohort_day,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN conv.user_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_converted,
       CAST(SUM(CASE WHEN conv.user_id IS NOT NULL THEN 1 ELSE 0 END)
            AS DOUBLE) / COUNT(*) AS conversion_rate
FROM fv LEFT JOIN conv ON conv.user_id = fv.user_id
GROUP BY cohort_day
ORDER BY cohort_day
"""


# T15 — ACTIVITY STREAKS (gaps-and-islands over calendar days): runs
# of CONSECUTIVE active days per user via the classic day_number −
# row_number grouping constant (consecutive days share it; any gap
# shifts it), then the corpus-wide streak-length histogram plus the
# longest streak and its owner count. Everything is integer
# arithmetic on date ordinals — bit-exact. Scale shape: one distinct
# (user, day) rollup, one user-keyed window, one streak rollup, one
# tiny histogram rollup; nothing global.
def evt_active_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    grouped = days.select(
        "user_id",
        (F.datediff("day", F.lit("1970-01-01")) - F.row_number().over(w)).alias(
            "grp"
        ),
    )
    streaks = grouped.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("streak_len")
    )
    return (
        streaks.groupBy("streak_len")
        .agg(
            F.count(F.lit(1)).alias("n_streaks"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("streak_len")
    )


EVT_ACTIVE_STREAKS_SQL = """
WITH days AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), grouped AS (
    SELECT user_id,
           DATEDIFF('day', DATE '1970-01-01', day)
               - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS grp
    FROM days
), streaks AS (
    SELECT user_id, grp, CAST(COUNT(*) AS BIGINT) AS streak_len
    FROM grouped GROUP BY user_id, grp
)
SELECT streak_len,
       CAST(COUNT(*) AS BIGINT) AS n_streaks,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM streaks
GROUP BY streak_len
ORDER BY streak_len
"""


# T14 — POINT-IN-TIME SCD2 JOIN: enrich each purchase with the
# dimension VERSION valid at purchase time — the warehouse temporal
# join every versioned dim serves. The dim is the change-compressed
# SCD2 of non-purchase activity per user (operators/scd2.py, the same
# build evt_scd2_history oracles); the join is user-equi +
# [valid_from, valid_to) interval containment, so fan-out is bounded
# by per-user version count and the open-ended current row matches
# everything after its start. Zero-width versions (two observations at
# one instant; the id-tiebreak loser) match nothing by construction.
# Oracle is DEFINITIONAL — "type of the last non-purchase observation
# at or before the purchase" via a correlated rank, independent of the
# interval derivation (compression provably cannot change the
# point-in-time answer, and the oracle proves it every run).
def evt_pointintime_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.scd2 import build_scd2

    ev = load_table(spark, sf_dir, "events")
    obs = ev.filter(F.col("event_type") != "purchase").select(
        "user_id", "ts", "event_id", "event_type"
    )
    dim = build_scd2(
        obs, key="user_id", ts="ts", tracked=["event_type"],
        tiebreak=["event_id"],
    ).select(
        F.col("user_id").alias("d_user"),
        F.col("event_type").alias("state"),
        "valid_from",
        "valid_to",
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    cond = (
        (facts.user_id == dim.d_user)
        & (facts.ts >= dim.valid_from)
        & (dim.valid_to.isNull() | (facts.ts < dim.valid_to))
    )
    return (
        facts.join(dim, cond, "left")
        .select("event_id", "user_id", "ts", "state")
        .orderBy("event_id")
    )


EVT_POINTINTIME_JOIN_SQL = """
WITH p AS (
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), obs AS (
    SELECT user_id, ts, event_id, event_type
    FROM events WHERE event_type <> 'purchase'
), ranked AS (
    SELECT p.event_id, p.user_id, p.ts, o.event_type,
           ROW_NUMBER() OVER (PARTITION BY p.event_id
                              ORDER BY o.ts DESC, o.event_id DESC) AS rn
    FROM p LEFT JOIN obs o
      ON o.user_id = p.user_id AND o.ts <= p.ts
)
SELECT event_id, user_id, ts, event_type AS state
FROM ranked WHERE rn = 1
ORDER BY event_id
"""


# T13 — PEAK CONCURRENCY (interval sweep-line): for each day, the
# maximum number of simultaneously-open sessions and the first instant
# it is reached — the capacity-planning number. Sessions come from the
# shared gap-sessionizer; each [start, end] interval is exploded
# across the DAYS it touches with the start clipped to day-open and
# the −1 emitted only on the end day (a session spanning onward simply
# never decrements inside this day) — so concurrency within each day
# is exact INCLUDING sessions that started earlier, and the sweep
# partitions by day (no global ordered window over the corpus; per-day
# work is session-count-bounded). At equal timestamps +1 sorts before
# −1, making touching intervals count as concurrent (inclusive [st,
# en]; deterministic by construction — rows with identical (ts, delta)
# are interchangeable for both MAX(running) and MIN(ts at peak)).
def evt_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    spans = (
        sessionize(ev, key="user_id", ts="ts", gap_seconds=_GAP_S,
                   order_tiebreak="event_id")
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("st"), F.max("ts").alias("en"))
    )
    touched = spans.select(
        "st",
        "en",
        F.explode(F.sequence(F.to_date("st"), F.to_date("en"))).alias("day"),
    )
    starts = touched.select(
        "day",
        F.greatest("st", F.col("day").cast("timestamp_ntz")).alias("ts"),
        F.lit(1).alias("delta"),
    )
    ends = touched.filter(F.to_date("en") == F.col("day")).select(
        "day", F.col("en").alias("ts"), F.lit(-1).alias("delta")
    )
    wrun = (
        Window.partitionBy("day")
        .orderBy(F.asc("ts"), F.desc("delta"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = starts.unionAll(ends).withColumn(
        "running", F.sum("delta").over(wrun)
    )
    peaked = run.withColumn(
        "peak", F.max("running").over(Window.partitionBy("day"))
    )
    return (
        peaked.filter(F.col("running") == F.col("peak"))
        .groupBy("day", F.col("peak").cast("long").alias("peak_concurrency"))
        .agg(F.min("ts").alias("peak_first_ts"))
        .select("day", "peak_concurrency", "peak_first_ts")
        .orderBy("day")
    )


EVT_PEAK_CONCURRENCY_SQL = f"""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR EPOCH(ts) - EPOCH(LAG(ts) OVER w) > {_GAP_S} THEN 1
              ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
), spans AS (
  SELECT user_id, session_id, MIN(ts) AS st, MAX(ts) AS en
  FROM numbered GROUP BY user_id, session_id
), touched AS (
  SELECT st, en, CAST(d AS DATE) AS day
  FROM spans, UNNEST(generate_series(CAST(CAST(st AS DATE) AS TIMESTAMP),
                                     CAST(CAST(en AS DATE) AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS t(d)
), deltas AS (
  SELECT day, GREATEST(st, CAST(day AS TIMESTAMP)) AS ts, 1 AS delta
  FROM touched
  UNION ALL
  SELECT day, en, -1 FROM touched WHERE CAST(en AS DATE) = day
), run AS (
  SELECT day, ts, delta,
         SUM(delta) OVER (PARTITION BY day ORDER BY ts, delta DESC
                          ROWS UNBOUNDED PRECEDING) AS running
  FROM deltas
), peaks AS (
  SELECT day, ts, running, MAX(running) OVER (PARTITION BY day) AS peak
  FROM run
)
SELECT day, CAST(peak AS BIGINT) AS peak_concurrency,
       MIN(ts) AS peak_first_ts
FROM peaks WHERE running = peak
GROUP BY day, peak
ORDER BY day
"""


# T12 — TOP JOURNEY PATHS: the k most common opening event-type
# sequences (first 5 events per user in (ts, event_id) order, joined
# as a path string) — the product-analytics "user journey" report and
# the sequence-level complement of the Markov matrix below. Scale
# shape: the rn <= 5 prune rides the user window BEFORE any
# aggregation, the per-user rollup reuses the window's partitioning
# (no second user exchange), paths collapse to |types|^5 distinct
# strings at most, and the top-k is TakeOrdered (no global sort).
# sort_array over (rn, type) structs makes the collect deterministic.
_PATH_LEN, _PATH_TOPK = 5, 20


def evt_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first_n = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _PATH_LEN)
    )
    seq = first_n.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(F.struct("rn", "event_type"))
        ).alias("s")
    )
    path = F.concat_ws(
        ">", F.transform("s", lambda x: x["event_type"])
    ).alias("path")
    return (
        seq.select(path)
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.desc("n_users"), "path")
        .limit(_PATH_TOPK)
    )


EVT_TOP_PATHS_SQL = f"""
WITH ranked AS (
    SELECT user_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS rn
    FROM events
), seq AS (
    SELECT user_id,
           array_to_string(list(event_type ORDER BY rn), '>') AS path
    FROM ranked WHERE rn <= {_PATH_LEN}
    GROUP BY user_id
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
FROM seq
GROUP BY path
ORDER BY n_users DESC, path
LIMIT {_PATH_TOPK}
"""


# T11 — LAST-TOUCH ATTRIBUTION: attribute each purchase's revenue to
# the campaign of the most recent preceding click/view by the same
# user ('organic' when none) — the marketing-attribution report shape.
# Campaign = props.k mod 5 from the touch event's JSON. No as-of JOIN
# is needed: a single per-user window with last(ignorenulls) carries
# the latest touch forward along the (ts, event_id) total order, so
# the corpus is shuffled ONCE on user_id; the rollup sums revenue
# through the exact scaled-integer sum (order-independent, both
# engines bit-equal).
def evt_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    touch = F.when(
        F.col("event_type").isin("click", "view"),
        F.concat(F.lit("c"), (k % 5).cast("string")),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    attributed = ev.select(
        "user_id", "ts", "event_id", "event_type", "value", touch.alias("touch")
    ).withColumn(
        "campaign",
        F.coalesce(F.last("touch", ignorenulls=True).over(w), F.lit("organic")),
    )
    return (
        attributed.filter(F.col("event_type") == "purchase")
        .groupBy("campaign")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            exact_sum("value").alias("revenue"),
        )
        .orderBy("campaign")
    )


EVT_ATTRIBUTION_LAST_TOUCH_SQL = f"""
WITH tagged AS (
    SELECT user_id, ts, event_id, event_type, value,
           CASE WHEN event_type IN ('click', 'view')
                THEN 'c' || CAST(CAST(json_extract_string(props, '$.k')
                                      AS BIGINT) % 5 AS VARCHAR)
           END AS touch
    FROM events
), attributed AS (
    SELECT event_type, value,
           COALESCE(LAST_VALUE(touch IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               'organic') AS campaign
    FROM tagged
)
SELECT campaign,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       {sum_sql('value')} AS revenue
FROM attributed
WHERE event_type = 'purchase'
GROUP BY campaign
ORDER BY campaign
"""


# T10 — event-type Markov transition matrix: P(next_type | type) from
# per-user time-ordered event streams — the behavioral bigram model a
# product pipeline builds for journey analysis / next-event baselines
# (and the events-table twin of the text bigram LM in lm_quality_score).
# Order is made total with the (ts, event_id) tie-break so both engines
# pick identical successors. Scale shape: ONE user-keyed window pass
# (lead), then counts collapse to |event_types|² rows — tiny — so the
# denominator window and the probability division run on a frame
# thousands of times smaller than the corpus; the only corpus-sized
# exchange is the user partitioning.
def evt_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = ev.select(
        F.col("event_type").alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
    ).filter(F.col("next_type").isNotNull())
    counts = t.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n_trans")
    )
    wp = Window.partitionBy("prev_type")
    return (
        counts.withColumn("n_from", F.sum("n_trans").over(wp))
        .select(
            "prev_type",
            "next_type",
            "n_trans",
            "n_from",
            (F.col("n_trans").cast("double") / F.col("n_from").cast("double")).alias(
                "p_next"
            ),
        )
        .orderBy("prev_type", "next_type")
    )


EVT_MARKOV_TRANSITIONS_SQL = """
WITH seq AS (
    SELECT event_type AS prev_type,
           LEAD(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS next_type
    FROM events
), counts AS (
    SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n_trans
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY prev_type, next_type
)
SELECT prev_type, next_type, n_trans,
       CAST(SUM(n_trans) OVER (PARTITION BY prev_type) AS BIGINT) AS n_from,
       CAST(n_trans AS DOUBLE)
           / CAST(SUM(n_trans) OVER (PARTITION BY prev_type) AS DOUBLE)
           AS p_next
FROM counts
ORDER BY prev_type, next_type
"""


QUERIES: dict[str, QuerySpec] = {
    "evt_windowed_conversion": QuerySpec(
        evt_windowed_conversion, EVT_WINDOWED_CONVERSION_SQL,
        tags=("A2", "J5", "F2"),
        doc="time-bounded funnel: purchase within 24h of first view, "
        "attributed to the first-view day cohort; exact timestamps and "
        "integer counts",
    ),
    "evt_active_streaks": QuerySpec(
        evt_active_streaks, EVT_ACTIVE_STREAKS_SQL, tags=("W1", "A2", "A3"),
        doc="consecutive-active-day streak histogram (gaps-and-islands "
        "via the day-ordinal minus row_number constant); all integer, "
        "user-partitioned",
    ),
    "evt_pointintime_join": QuerySpec(
        evt_pointintime_join, EVT_POINTINTIME_JOIN_SQL,
        tags=("T6", "J7", "W2"),
        doc="point-in-time SCD2 enrichment: user-equi + interval "
        "containment against the compressed version table; oracle is "
        "the definitional last-observation rank (derivation-"
        "independent)",
    ),
    "evt_peak_concurrency": QuerySpec(
        evt_peak_concurrency, EVT_PEAK_CONCURRENCY_SQL,
        tags=("T3", "W3", "A2"),
        doc="per-day peak concurrent sessions (interval sweep-line): "
        "day-clipped explode keeps the sweep partitioned by day, "
        "spanning sessions never decrement mid-day; inclusive overlap",
    ),
    "evt_top_paths": QuerySpec(
        evt_top_paths, EVT_TOP_PATHS_SQL, tags=("W1", "A2", "O3"),
        doc="top-k opening user-journey paths (first 5 event types per "
        "user, deterministic order); rn prune before aggregation, "
        "TakeOrdered top-k",
    ),
    "evt_attribution_last_touch": QuerySpec(
        evt_attribution_last_touch, EVT_ATTRIBUTION_LAST_TOUCH_SQL,
        tags=("W2", "A2", "F7"),
        doc="last-touch revenue attribution: per-user carry-forward "
        "window (no as-of join), campaign from touch JSON, exact "
        "scaled-integer revenue sums",
    ),
    "evt_markov_transitions": QuerySpec(
        evt_markov_transitions, EVT_MARKOV_TRANSITIONS_SQL,
        tags=("W2", "A2"),
        doc="event-type Markov transition matrix P(next|prev) from "
        "per-user time-ordered streams; one user-keyed lead window, "
        "counts collapse to |types|^2 before the probability pass",
    ),
    "evt_ohlc_resample": QuerySpec(
        evt_ohlc_resample, EVT_OHLC_RESAMPLE_SQL, tags=("T1", "W1", "A2"),
        doc="OHLC downsample per (user, 6h epoch bucket): first/last by "
        "total order + extrema, value-picking only — bit-exact oracle",
    ),
    "evt_tumbling": QuerySpec(evt_tumbling, EVT_TUMBLING_SQL, tags=("T1",), bench=True),
    "evt_retention": QuerySpec(
        evt_retention, EVT_RETENTION_SQL, tags=("A2", "A3", "F2", "J2"),
        doc="cohort retention: first-day cohorts × active-day offsets",
    ),
    "evt_funnel_steps": QuerySpec(
        evt_funnel_steps, EVT_FUNNEL_STEPS_SQL, tags=("A2", "J4", "P4"),
        doc="ordered conversion funnel: step minima conditioned on prior step",
    ),
    "evt_sliding": QuerySpec(evt_sliding, EVT_SLIDING_SQL, tags=("T2",)),
    "evt_sessions": QuerySpec(evt_sessions, EVT_SESSIONS_SQL, tags=("T3",), bench=True),
    "evt_upsert_compact": QuerySpec(
        evt_upsert_compact, EVT_UPSERT_COMPACT_SQL, tags=("T6", "W1")
    ),
    "evt_scd2_history": QuerySpec(
        evt_scd2_history, EVT_SCD2_HISTORY_SQL, tags=("T6", "W2", "W1"),
        doc="change-compressed SCD2 validity intervals from an event log",
    ),
}
