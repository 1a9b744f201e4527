"""Bloom filter operator (operators/bloom.py): soundness (no false
negatives, the property that makes it safe as a prefilter), bounded
false positives at the documented rate, and a plan check that the
probe side never shuffles."""

from __future__ import annotations

import pyspark.sql.functions as F

from bike_data_flow_spark.operators import bloom as B


def _keys(spark, n, prefix="key-"):
    return spark.range(n).select(
        F.concat(F.lit(prefix), F.col("id")).alias("s"), F.col("id")
    )


def test_bloom_no_false_negatives(spark):
    members = _keys(spark, 2000)
    bf = B.bloom_build(members, F.col("s"))
    probe = B.with_bloom_flag(_keys(spark, 6000), bf, F.col("s"))
    missed = probe.filter(~F.col("in_bloom") & (F.col("id") < 2000)).count()
    assert missed == 0


def test_bloom_false_positive_rate_bounded(spark):
    members = _keys(spark, 2000)
    bf = B.bloom_build(members, F.col("s"))
    # disjoint probe universe: every hit is a false positive
    probe = B.with_bloom_flag(_keys(spark, 20000, "other-"), bf, F.col("s"))
    fp = probe.filter("in_bloom").count()
    # (kn/m)^k at n=2000 defaults ≈ 5e-10; 20k probes → expect ~0.
    # Allow a handful so the test never flakes on hash accidents.
    assert fp <= 5


def test_bloom_probe_is_shuffle_free(spark):
    members = _keys(spark, 100)
    bf = B.bloom_build(members, F.col("s"))
    probe = B.with_bloom_flag(_keys(spark, 100), bf, F.col("s"))
    plan = probe._jdf.queryExecution().executedPlan().toString()
    # the only exchanges allowed are inside the (already-aggregated)
    # broadcast bitmap build, never on the probe side above the
    # BroadcastNestedLoopJoin
    probe_side = plan.split("BroadcastNestedLoopJoin")[0]
    assert "Exchange hashpartitioning" not in probe_side


def test_bloom_bitmap_is_fixed_size(spark):
    small = B.bloom_build(_keys(spark, 10), F.col("s")).collect()[0]["bloom"]
    big = B.bloom_build(_keys(spark, 5000), F.col("s")).collect()[0]["bloom"]
    assert len(small) == len(big) == B.BLOOM_BITS_DEFAULT // 64
    assert sum(1 for w in big if w) > sum(1 for w in small if w)
