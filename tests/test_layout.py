"""Bucketed shuffle-free joins + salted skew joins."""

from __future__ import annotations

from pyspark.sql import functions as F

from bike_data_flow_spark.operators.layout import (
    bucketed_join_is_shuffle_free,
    salted_join,
    write_bucketed,
)


def test_bucketed_join_has_no_exchange(spark):
    a = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    write_bucketed(a, "bkt_a", ["k"], n_buckets=4, sort_cols=["k"])
    write_bucketed(b, "bkt_b", ["k"], n_buckets=4, sort_cols=["k"])
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force sort-merge so the assertion is about bucketing, not broadcast
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        assert bucketed_join_is_shuffle_free(spark, "bkt_a", "bkt_b", ["k"])
        joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_salted_join_matches_plain_join(spark):
    # one pathologically hot key + normal keys
    big = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(k, 0) for k in range(2, 10)], ["k", "v"]
    )
    small = spark.createDataFrame([(k, f"dim{k}") for k in range(1, 10)], ["k", "name"])
    plain = big.join(small, "k").select("k", "v", "name")
    salted = salted_join(big, small, "k").select("k", "v", "name")
    assert salted.count() == plain.count() == 508
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, 10), (99, 20)], ["k", "v"])
    small = spark.createDataFrame([(1, "a")], ["k", "name"])
    out = salted_join(big, small, "k", how="left").collect()
    rows = {r["k"]: r["name"] for r in out}
    assert rows == {1: "a", 99: None}
