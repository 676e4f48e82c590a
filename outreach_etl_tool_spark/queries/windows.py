"""Window-function queries W1-W4 (SURVEY.md §2.5).

W1 is the reference's upsert semantics made explicit: incremental
replication re-pulls updated rows (outreach_etl.py:227-229) and the
latest updatedAt must win — keep-latest-per-key via row_number. Every
window has a deterministic total order (tiebreak on the key) so the
oracle hash is stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from . import QuerySpec


# W1 — keep-latest-per-key (upsert/T6 batch semantics): latest order per
# customer. One shuffle on the partition key; at scale this is the
# standard CDC-compaction plan.
def win_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    )


WIN_LATEST_PER_KEY_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
) WHERE rn = 1
"""


# W1b — ranking trio on one window.
def win_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    ).filter(F.col("rn") <= 50)


WIN_RANK_ORDERS_SQL = """
SELECT o_orderkey, o_orderstatus, rn, rnk, drnk FROM (
  SELECT o_orderkey, o_orderstatus,
         CAST(ROW_NUMBER() OVER w AS INTEGER) AS rn,
         CAST(RANK() OVER w AS INTEGER) AS rnk,
         CAST(DENSE_RANK() OVER w AS INTEGER) AS drnk
  FROM orders
  WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey ASC)
) WHERE rn <= 50
"""


# W2 — lag/lead: days between consecutive orders per customer ("time
# between touches").
def win_lag_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag(F.to_date("o_orderdate")).over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.to_date("o_orderdate"), prev).alias("days_since_prev"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )


WIN_LAG_GAP_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(DATE_DIFF('day',
            LAG(CAST(o_orderdate AS DATE)) OVER w,
            CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_prev,
       LEAD(o_orderkey) OVER w AS next_orderkey
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


# W3 — aggregate-over-frame: running revenue + 3-row moving average per
# customer. Frame sums run left-to-right over a deterministic order in
# both engines; inputs go through exact decimal so increments are exact.
def win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    dec = F.col("o_totalprice").cast("decimal(30,2)")
    running = (
        F.sum(dec)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
    )
    moving_sum = (
        F.sum(dec).over(w.rowsBetween(-2, Window.currentRow)).cast("double")
    )
    moving_n = F.count("o_totalprice").over(w.rowsBetween(-2, Window.currentRow))
    return orders.select(
        "o_custkey",
        "o_orderkey",
        running.alias("running_revenue"),
        (moving_sum / moving_n).alias("moving_avg_3"),
    )


WIN_RUNNING_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2)))
            OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_revenue,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2)))
            OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
         / COUNT(o_totalprice) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
         AS moving_avg_3
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


# W4 — ntile / percent_rank (score-quartile shape: engagedScore,
# schemas/prospects.json:308-310). Quartiles are PER NATION: an
# unpartitioned ranking window moves every row to one partition
# (WindowExec warns exactly this) — a sequential bottleneck at scale.
# The partitioned form keeps the W4 semantics (rank within a cohort)
# and shuffles by key like any grouped operator.
def win_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return customer.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.ntile(4).over(w).alias("balance_quartile"),
        F.percent_rank().over(w).alias("balance_pct_rank"),
    )


WIN_QUARTILES_SQL = """
SELECT c_custkey, c_nationkey, c_acctbal,
       CAST(NTILE(4) OVER w AS INTEGER) AS balance_quartile,
       PERCENT_RANK() OVER w AS balance_pct_rank
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
"""


# W3b — RANGE-interval frame: per-user trailing-1-hour event count and
# value sum, anchored on EVENT TIME, not row offsets — the "activity
# in the last hour at each event" shape a rows-frame cannot express
# (gaps and bursts change how many rows one hour covers). The order
# key is integer epoch-micros so the frame bound is exact arithmetic
# in both engines; equal-timestamp peers are included by RANGE
# semantics identically. One exchange on user_id; the sum is
# scaled-integer exact.
def win_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(ts_us)
        .rangeBetween(-3_600_000_000, 0)
    )
    sp = F.round(F.col("value") * 100).cast("bigint")
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        (F.sum(sp).over(w).cast("double") / 100).alias("value_last_hour"),
    )


WIN_RANGE_INTERVAL_SQL = """
SELECT event_id, user_id,
       COUNT(*) OVER w AS n_last_hour,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS DOUBLE) / 100
           AS value_last_hour
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY EPOCH_US(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""


# W3c — running DISTINCT count: how many distinct event types each
# user has touched as of every event (the "behavioral breadth over
# time" shape; also the engagement-funnel prerequisite "has the user
# done all K actions yet?"). Spark has no COUNT(DISTINCT) OVER, so the
# running frame folds a collect_set and takes its size — per-row state
# is bounded by the DISTINCT DOMAIN (event types: small and fixed),
# not the frame length; for unbounded domains the right tool is the
# HLL-sketch variant (agg_hll_rollup), not this operator. One exchange
# on user_id; the (ts, event_id) order key is a total order so both
# engines see identical prefixes at every row.
def win_cume_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.size(F.collect_set("event_type").over(w)).alias("n_types_seen"),
        F.count(F.lit(1)).over(w).alias("n_events_seen"),
    )


WIN_CUME_DISTINCT_SQL = """
SELECT event_id, user_id,
       CAST(COUNT(DISTINCT event_type) OVER w AS INTEGER) AS n_types_seen,
       COUNT(*) OVER w AS n_events_seen
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


QUERIES: dict[str, QuerySpec] = {
    "win_cume_distinct": QuerySpec(
        win_cume_distinct, WIN_CUME_DISTINCT_SQL, tags=("W3", "A3"),
        doc="running distinct-count per user: collect_set-fold frame, "
        "state bounded by the type domain",
    ),
    "win_latest_per_key": QuerySpec(
        win_latest_per_key, WIN_LATEST_PER_KEY_SQL, tags=("W1", "T6", "U3"), bench=True
    ),
    "win_rank_orders": QuerySpec(win_rank_orders, WIN_RANK_ORDERS_SQL, tags=("W1",)),
    "win_lag_gap": QuerySpec(win_lag_gap, WIN_LAG_GAP_SQL, tags=("W2",)),
    "win_running": QuerySpec(win_running, WIN_RUNNING_SQL, tags=("W3",)),
    "win_quartiles": QuerySpec(win_quartiles, WIN_QUARTILES_SQL, tags=("W4",)),
    "win_range_interval": QuerySpec(
        win_range_interval, WIN_RANGE_INTERVAL_SQL, tags=("W3", "F2"),
        doc="RANGE-interval frame: trailing-1h per-user activity at "
        "each event, epoch-micros order key",
    ),
}
