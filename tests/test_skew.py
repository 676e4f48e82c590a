"""Skew operator tests: salted forms must be exactly equivalent to the
plain forms, and the salt must actually spread the hot key."""

from __future__ import annotations

from pyspark.sql import functions as F

from outreach_etl_tool_spark.operators.skew import (
    salted_count_distinct,
    salted_join,
)


def skewed_df(spark):
    # one hot key (0) with 900 rows, 10 cold keys with 10 each
    rows = [(0, i, f"v{i % 37}") for i in range(900)]
    rows += [(k, i, f"v{i}") for k in range(1, 11) for i in range(10)]
    return spark.createDataFrame(rows, "k int, payload int, val string")


def test_salted_join_matches_plain_join(spark):
    left = skewed_df(spark)
    right = spark.createDataFrame(
        [(k, f"dim-{k}") for k in range(8)], "k int, label string"
    )
    plain = left.join(right, "k").select("k", "payload", "label")
    salted = salted_join(left, right, "k", salt=8).select("k", "payload", "label")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer(spark):
    left = skewed_df(spark)
    right = spark.createDataFrame([(0, "only-hot")], "k int, label string")
    out = salted_join(left, right, "k", salt=4, how="left")
    got = out.groupBy("label").count().collect()
    by_label = {r["label"]: r["count"] for r in got}
    assert by_label["only-hot"] == 900
    assert by_label[None] == 100


def test_salt_spreads_hot_key(spark):
    left = skewed_df(spark)
    from outreach_etl_tool_spark.operators.skew import _salt_col

    salted = left.withColumn("__salt", _salt_col(["payload", "val"], 8))
    buckets = (
        salted.filter(F.col("k") == 0).groupBy("__salt").count().collect()
    )
    # the 900 hot-key rows land in all 8 salt buckets, none dominant
    assert len(buckets) == 8
    assert max(r["count"] for r in buckets) < 900 * 0.5


def test_salted_count_distinct_exact(spark):
    df = skewed_df(spark)
    plain = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.countDistinct("val").alias("n")).collect()
    }
    salted = {
        r["k"]: r["n_distinct"]
        for r in salted_count_distinct(df, "k", "val", salt=8).collect()
    }
    assert plain == salted
