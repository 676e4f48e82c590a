"""Join queries J1-J9 (SURVEY.md §2.3).

The reference's data model is relational (FK columns,
schemas/prospects.json:488-619, SURVEY.md §1.3) but every join ran
downstream in BigQuery; here they are first-class. Physical strategy
notes per query: dims are broadcast explicitly, fact⋈fact goes through
sort-merge (AQE may switch at runtime), and the as-of join uses the
single-shuffle union-window algorithm (operators/asof.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.scalars import avg_sql, exact_sum, sum_sql
from ..operators.asof import asof_join
from . import QuerySpec


# J1 — inner equi join (prospect⋈account shape). Row-level output so the
# oracle checks join semantics, not just aggregates.
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return customer.join(
        nation, customer.c_nationkey == nation.n_nationkey, "inner"
    ).select("c_custkey", "c_name", "n_name")


JOIN_INNER_SQL = """
SELECT c_custkey, c_name, n_name
FROM customer JOIN nation ON c_nationkey = n_nationkey
"""


# J2 — explicit broadcast of the small dims (region: 5 rows, nation: 25 at
# every sf — broadcasting removes both shuffles of the customer fact).
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            exact_sum("c_acctbal").alias("total_acctbal"),
        )
    )


JOIN_BROADCAST_DIMS_SQL = f"""
SELECT r_name, COUNT(*) AS n_customers, {sum_sql('c_acctbal')} AS total_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# J3 — fact⋈fact sort-merge join (orders⋈lineitem). The merge hint pins
# SMJ so the query demonstrates the shuffle-join path even when AQE would
# broadcast at small sf; on 100 TB this IS the plan (both sides huge),
# shuffled on the join key once and reused by nothing downstream.
def join_fact_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        orders.hint("merge")
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            exact_sum(revenue, scale=6).alias("revenue"),
        )
    )


JOIN_FACT_FACT_SQL = f"""
SELECT o_orderpriority, COUNT(*) AS n_lines,
       {sum_sql('l_extendedprice * (1 - l_discount)', scale=6)} AS revenue
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
"""


# J4 — left outer join: every customer, order count (0 for orderless —
# COUNT(col) skips the null-extended rows in both engines).
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            exact_sum("o_totalprice").alias("lifetime_value"),
        )
    )


JOIN_LEFT_OUTER_SQL = f"""
SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
       {sum_sql('o_totalprice')} AS lifetime_value
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
"""


# J4b — full outer join across fact domains: per-customer order counts
# vs per-user event counts, keyed on the shared entity id. The key
# domains genuinely diverge (custkeys run far past the event user
# range), so the events-side null extension is exercised structurally,
# not by luck of the data (the orders side null-extends whenever a
# user id lacks orders). Full outer cannot broadcast either side (both must
# null-extend), so this is the shape that MUST sort-merge at scale —
# but each side is pre-aggregated to its distinct keys first, so the
# shuffle moves one row per entity, not per fact.
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    per_user = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return (
        per_cust.join(
            per_user, per_cust.o_custkey == per_user.user_id, "full_outer"
        )
        .select(
            F.coalesce("o_custkey", "user_id").alias("entity_id"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
        )
    )


JOIN_FULL_OUTER_SQL = """
SELECT COALESCE(o.o_custkey, e.user_id) AS entity_id,
       COALESCE(o.n_orders, 0) AS n_orders,
       COALESCE(e.n_events, 0) AS n_events
FROM (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey) o
FULL OUTER JOIN
     (SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id) e
ON o.o_custkey = e.user_id
"""


# J5 — left semi join ("prospects with ≥1 mailing" shape): customers that
# have at least one urgent order. Semi join shuffles only distinct keys of
# the right side — never materializes the match multiplicity.
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return customer.join(
        urgent, customer.c_custkey == urgent.o_custkey, "left_semi"
    ).select("c_custkey", "c_mktsegment")


JOIN_SEMI_SQL = """
SELECT c_custkey, c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
"""


# J6 — left anti join ("never-contacted" shape): customers with no orders.
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_acctbal")


JOIN_ANTI_SQL = """
SELECT c_custkey, c_name, c_acctbal
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


# J7 — theta/range join against a small band table. The band side is a
# literal dim → broadcast nested-loop join, which is exactly right: the
# fact side streams through executors once, no shuffle.
_BANDS = [
    (0.0, 50.0, "micro"),
    (50.0, 100.0, "small"),
    (100.0, 150.0, "mid"),
    (150.0, 1e18, "large"),
]


def join_range_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bands = spark.createDataFrame(_BANDS, "lo double, hi double, band string")
    return (
        ev.join(
            F.broadcast(bands),
            (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
        )
        .groupBy("band")
        .agg(F.count("*").alias("n"), exact_sum("value").alias("total_value"))
    )


JOIN_RANGE_BANDS_SQL = f"""
WITH bands(lo, hi, band) AS (
  VALUES (0.0, 50.0, 'micro'), (50.0, 100.0, 'small'),
         (100.0, 150.0, 'mid'), (150.0, 1e18, 'large')
)
SELECT band, COUNT(*) AS n, {sum_sql('value')} AS total_value
FROM events JOIN bands ON value >= lo AND value < hi
GROUP BY band
"""


# J8 — as-of join (latest click at-or-before each purchase, per user).
# Implemented with the union-window algorithm (operators/asof.py): one
# shuffle of |purchases|+|clicks| rows, no pairwise explosion. The oracle
# is the O(n²)-shaped correlated-subquery form — semantically identical.
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", F.col("ts").alias("click_ts"))
    )
    return asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="click_ts",
        payload=["click_ts"],
        how="left",
    ).select("event_id", "user_id", "ts", F.col("click_ts").alias("last_click_ts"))


JOIN_ASOF_SQL = """
SELECT p.event_id, p.user_id, p.ts,
       (SELECT MAX(c.ts) FROM events c
        WHERE c.user_id = p.user_id AND c.event_type = 'click'
          AND c.ts <= p.ts) AS last_click_ts
FROM events p
WHERE p.event_type = 'purchase'
"""


# J8b/J8c — forward and nearest as-of directions (pandas merge_asof
# parity), same one-shuffle union-sort-window operator. Oracles are
# DEFINITIONAL correlated aggregates (MIN over at-or-after / the
# closer of the two extremes with ties backward), independent of the
# window derivation.
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    return asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="click_ts",
        payload=["click_ts"],
        how="left",
        direction="forward",
    ).select("event_id", "user_id", "ts", F.col("click_ts").alias("next_click_ts"))


JOIN_ASOF_FORWARD_SQL = """
SELECT p.event_id, p.user_id, p.ts,
       (SELECT MIN(c.ts) FROM events c
        WHERE c.user_id = p.user_id AND c.event_type = 'click'
          AND c.ts >= p.ts) AS next_click_ts
FROM events p
WHERE p.event_type = 'purchase'
"""


def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    return asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="click_ts",
        payload=["click_ts"],
        how="left",
        direction="nearest",
    ).select(
        "event_id", "user_id", "ts", F.col("click_ts").alias("nearest_click_ts")
    )


JOIN_ASOF_NEAREST_SQL = """
WITH p AS (
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), b AS (
    SELECT p.event_id, MAX(c.ts) AS bts
    FROM p LEFT JOIN events c
      ON c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts
    GROUP BY p.event_id
), f AS (
    SELECT p.event_id, MIN(c.ts) AS fts
    FROM p LEFT JOIN events c
      ON c.user_id = p.user_id AND c.event_type = 'click' AND c.ts >= p.ts
    GROUP BY p.event_id
)
SELECT p.event_id, p.user_id, p.ts,
       CASE WHEN b.bts IS NOT NULL AND (f.fts IS NULL
                  OR epoch_us(p.ts) - epoch_us(b.bts)
                     <= epoch_us(f.fts) - epoch_us(p.ts))
            THEN b.bts ELSE f.fts END AS nearest_click_ts
FROM p
JOIN b ON b.event_id = p.event_id
JOIN f ON f.event_id = p.event_id
"""


# J9 — interval self-join on time: pairs of events by the same user within
# a 10-minute window. Equi-join on user bounds the blow-up; the range
# predicate is applied post-join (Catalyst folds it into the join cond).
def join_self_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    a = ev.select(
        F.col("user_id"), F.col("event_id").alias("eid_a"), F.col("ts").alias("ts_a")
    )
    b = ev.select(
        F.col("user_id"), F.col("event_id").alias("eid_b"), F.col("ts").alias("ts_b")
    )
    pairs = a.join(b, "user_id").filter(
        (F.col("ts_b") > F.col("ts_a"))
        & (F.col("ts_b") <= F.col("ts_a") + F.expr("INTERVAL 10 MINUTES"))
    )
    return pairs.groupBy("user_id").agg(F.count("*").alias("n_pairs_10m"))


JOIN_SELF_INTERVAL_SQL = """
SELECT a.user_id, COUNT(*) AS n_pairs_10m
FROM events a JOIN events b ON a.user_id = b.user_id
WHERE b.ts > a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTE
GROUP BY a.user_id
"""


# J1b — SALTED skew join (operators/skew.py): events are Zipf-hot on
# event_type (a handful of keys, millions of rows each at scale); the
# salt splits every hot key across `salt` reducers when broadcast is
# infeasible and AQE's runtime split is not available (e.g. a planned
# bucketed write). The oracle is the PLAIN join — salting must be
# invisible in the result.
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_join

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    dim = ev.groupBy("event_type").agg(
        F.count("*").alias("n_type_events")
    )
    return salted_join(ev, dim, on="event_type", salt=8).select(
        "event_id", "event_type", "value", "n_type_events"
    )


JOIN_SKEW_SALTED_SQL = """
WITH dim AS (
    SELECT event_type, COUNT(*) AS n_type_events FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type, e.value, d.n_type_events
FROM events e JOIN dim d USING (event_type)
"""


# J3b — explicit shuffle-hash join: for fact⋈fact where one side is
# much smaller than the other but too big to broadcast, hashing the
# smaller side per-partition skips BOTH sort phases of SMJ. The hint is
# the engine's strategy-control surface; AQE may still override it at
# runtime with better stats.
def join_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders.hint("shuffle_hash"), li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_items"),
            exact_sum("l_extendedprice").alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


JOIN_SHUFFLE_HASH_SQL = f"""
SELECT o_orderstatus, COUNT(*) AS n_items,
       {sum_sql('l_extendedprice')} AS total_price
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


# Correlated subquery — Catalyst decorrelates it into a join+agg plan
# (SURVEY.md §4 "subquery decorrelation: nothing to build"); identical
# ANSI text runs on both engines.
# exact scaled-integer AVG (functions/scalars.py mirror) so the
# boundary comparison cannot flip on summation-order ulps
SQL_CORRELATED = f"""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders o
WHERE o_totalprice > 2 * (
    SELECT {avg_sql('i.o_totalprice')}
    FROM orders i WHERE i.o_custkey = o.o_custkey
)
ORDER BY o_orderkey
"""


def sql_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(SQL_CORRELATED)


# J3b — runtime bloom-filter semi-join reduction. The shape that
# decides 100 TB join cost: a selective predicate on one side should
# prune the OTHER side's scan before its shuffle, not after the join.
# Spark 3.3+ ships this as injected runtime filters
# (InjectRuntimeFilter → BloomFilterAggregate / might_contain); it is
# off by default, and at toy scale the application side sits far under
# the 10 GB scan threshold, so the query pins the confs, forces plan
# materialization inside that window (QueryExecution caches its
# optimized plan), then restores every conf — later queries in the
# same session plan untouched. The bloom only PRUNES (false positives
# die in the exact join), so the oracle is the plain join. At real
# scale only the default-off master switch is needed; the threshold
# override exists for the toy-sf demonstration.
def _rtf_confs(n_build: int) -> dict:
    """Runtime-bloom confs SIZED TO THE BUILD SIDE (round-14 ADVICE:
    the previous fixed 100k-item / 2^20-bit pin silently degraded fpp
    once the build side outgrew ~100k rows). ~10 bits/item for ~1%
    fpp, rounded up to a power of two; the default 1M-item / 8M-bit
    bloom serialized ~1 MiB into EVERY probe-stage task binary (the
    round-13 WARN source), so right-sizing is both a pruning and a
    task-binary fix. Floors keep degenerate builds sane; at real
    scale the same arithmetic runs off the build side's row estimate
    (here: an exact count of the already-filtered dimension — one
    pushed-down scan, amortized by the plan it saves)."""
    items = max(4096, int(n_build))
    bits = 1 << max(16, (items * 10 - 1).bit_length())
    return {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.expectedNumItems": str(
            items
        ),
        "spark.sql.optimizer.runtime.bloomFilter.numBits": str(bits),
    }


def join_runtime_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    df = (
        lineitem.join(urgent, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy(F.date_trunc("month", "o_orderdate").alias("order_month"))
        .agg(
            exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=6
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("order_month")
    )
    confs = _rtf_confs(urgent.count())
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # materialize the cached QueryExecution while the injection
        # confs are live; collect()/toPandas() reuse it
        df._jdf.queryExecution().executedPlan()
    except Exception:
        pass  # plan still correct without the injected filter
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return df


JOIN_RUNTIME_FILTER_SQL = f"""
SELECT DATE_TRUNC('month', o_orderdate) AS order_month,
       {sum_sql('l_extendedprice * (1 - l_discount)', scale=6)} AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY order_month
ORDER BY order_month
"""


# J1c — edit-distance fuzzy self-join (entity resolution / catalog
# near-match). Semantics: part pairs in the same brand whose names are
# within Levenshtein distance 2 (excluding exact duplicates), lowest
# key first. Blocking is (brand, length-bucket): brand-only blocks
# grow linearly with the catalog (quadratic pair expansion at 100 TB),
# so the probe side replicates into buckets {b−1, b, b+1} of width 3 —
# LOSSLESS for dist ≤ 2, since length difference lower-bounds edit
# distance and any |Δlen| ≤ 2 pair shares a probed bucket (exactly one
# probe matches → no pair dedup). The levenshtein kernel itself stays
# JVM codegen, applied after the |Δlen| band. One shuffle on the
# blocking key; monitor residual block skew the same way bucket_pairs
# does for LSH buckets.
def fuzzy_join_editdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    bucket = F.floor(F.length("p_name") / 3).cast("long")
    a = part.select(
        F.col("p_brand").alias("brand"),
        F.col("p_partkey").alias("key_a"),
        F.col("p_name").alias("name_a"),
        bucket.alias("bk"),
    )
    b = part.select(
        F.col("p_brand").alias("brand"),
        F.col("p_partkey").alias("key_b"),
        F.col("p_name").alias("name_b"),
        F.explode(F.array(bucket - 1, bucket, bucket + 1)).alias("bk"),
    )
    return (
        a.join(b, ["brand", "bk"])
        .filter(
            (F.col("key_a") < F.col("key_b"))
            & (
                F.abs(F.length("name_a") - F.length("name_b")) <= 2
            )
            & (F.col("name_a") != F.col("name_b"))
        )
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= 2)
        .select("brand", "key_a", "key_b", "name_a", "name_b", "dist")
    )


FUZZY_JOIN_EDITDIST_SQL = """
SELECT a.p_brand AS brand,
       a.p_partkey AS key_a, b.p_partkey AS key_b,
       a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
FROM part a JOIN part b
  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
WHERE a.p_name <> b.p_name
  AND levenshtein(a.p_name, b.p_name) <= 2
"""


# J1c — null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL
# keys match each other instead of vanishing, the semantics every CDC
# or entity-resolution merge needs when the business key is nullable.
# Both sides pre-aggregate to ~101 rows before the join, so the
# null-safe comparison (which blocks hash-key pushdown niceties on
# some engines) touches bounded data; Spark plans it as a regular
# equi-join on a null-safe key. Keys are derived deterministically
# (o_orderkey % 7 == 0 → NULL) so both engines build identical inputs.
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")

    def keyed(null_mod: int, alias: str) -> DataFrame:
        key = (
            F.when(
                F.col("o_orderkey") % null_mod == 0,
                F.lit(None).cast("bigint"),
            )
            .otherwise(F.col("o_orderkey") % 100)
        )
        return orders.groupBy(key.alias("k")).agg(
            F.count(F.lit(1)).alias(alias)
        )

    a = keyed(7, "n_a")
    b = keyed(5, "n_b").withColumnRenamed("k", "kb")
    return (
        a.join(b, a.k.eqNullSafe(F.col("kb")))
        .select("k", "n_a", "n_b")
        .orderBy(F.asc_nulls_first("k"))
    )


JOIN_NULL_SAFE_SQL = """
WITH a AS (
    SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL
                ELSE o_orderkey % 100 END AS k,
           COUNT(*) AS n_a
    FROM orders GROUP BY 1
), b AS (
    SELECT CASE WHEN o_orderkey % 5 = 0 THEN NULL
                ELSE o_orderkey % 100 END AS k,
           COUNT(*) AS n_b
    FROM orders GROUP BY 1
)
SELECT a.k AS k, n_a, n_b
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
ORDER BY k NULLS FIRST
"""


QUERIES: dict[str, QuerySpec] = {
    "join_null_safe": QuerySpec(
        join_null_safe, JOIN_NULL_SAFE_SQL, tags=("J1", "F4"),
        doc="null-safe equality join: NULL keys match (IS NOT DISTINCT FROM)",
    ),
    "join_inner": QuerySpec(join_inner, JOIN_INNER_SQL, tags=("J1",)),
    "join_shuffle_hash": QuerySpec(
        join_shuffle_hash, JOIN_SHUFFLE_HASH_SQL, tags=("J3",)
    ),
    "sql_correlated": QuerySpec(
        sql_correlated, SQL_CORRELATED, tags=("J1", "A2"),
        doc="correlated subquery; Catalyst decorrelation",
    ),
    "join_broadcast_dims": QuerySpec(
        join_broadcast_dims, JOIN_BROADCAST_DIMS_SQL, tags=("J2",)
    ),
    "join_fact_fact": QuerySpec(
        join_fact_fact, JOIN_FACT_FACT_SQL, tags=("J3",), bench=True
    ),
    "join_left_outer": QuerySpec(join_left_outer, JOIN_LEFT_OUTER_SQL, tags=("J4",)),
    "join_full_outer": QuerySpec(
        join_full_outer, JOIN_FULL_OUTER_SQL, tags=("J4",),
        doc="full outer across fact domains; null extension structural",
    ),
    "join_semi": QuerySpec(join_semi, JOIN_SEMI_SQL, tags=("J5",)),
    "join_anti": QuerySpec(join_anti, JOIN_ANTI_SQL, tags=("J6",)),
    "join_range_bands": QuerySpec(
        join_range_bands, JOIN_RANGE_BANDS_SQL, tags=("J7",)
    ),
    "join_asof": QuerySpec(join_asof, JOIN_ASOF_SQL, tags=("J8",), bench=True),
    "join_asof_forward": QuerySpec(
        join_asof_forward, JOIN_ASOF_FORWARD_SQL, tags=("J8",),
        doc="forward as-of direction (earliest right at-or-after), same "
        "one-shuffle union-sort-window operator; definitional oracle",
    ),
    "join_asof_nearest": QuerySpec(
        join_asof_nearest, JOIN_ASOF_NEAREST_SQL, tags=("J8",),
        doc="nearest as-of direction (closer of backward/forward, ties "
        "backward) — both fills over one sorted partition, one shuffle; "
        "definitional oracle",
    ),
    "join_self_interval": QuerySpec(
        join_self_interval, JOIN_SELF_INTERVAL_SQL, tags=("J9",)
    ),
    "join_skew_salted": QuerySpec(
        join_skew_salted, JOIN_SKEW_SALTED_SQL, tags=("J1", "J3"),
        doc="hot-key salted join; oracle is the plain join",
    ),
    "join_runtime_filter": QuerySpec(
        join_runtime_filter, JOIN_RUNTIME_FILTER_SQL, tags=("J3", "J5", "P4"),
        doc="runtime bloom semi-join reduction: selective side's keys "
        "prune the fact scan before its shuffle",
    ),
    "fuzzy_join_editdist": QuerySpec(
        fuzzy_join_editdist, FUZZY_JOIN_EDITDIST_SQL, tags=("J1", "J9", "F1"),
        doc="edit-distance fuzzy self-join: brand blocking + lossless "
        "length-band prefilter before levenshtein",
    ),
}
