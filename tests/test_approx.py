"""Approximate aggregates — the scalable spellings of distinct/quantile
(SURVEY §2.4 note: engine surface beyond the reference). Not
oracle-checkable (sketch implementations differ per engine), so pinned
by error-bound tests against exact results.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bike_data_flow_spark.tables import load

SF = "/root/testdata/sf0.001"


def test_approx_count_distinct_within_rsd(spark):
    ev = load(spark, SF, "events")
    exact = ev.select(F.countDistinct("user_id")).collect()[0][0]
    approx = ev.select(F.approx_count_distinct("user_id", rsd=0.05)).collect()[0][0]
    assert abs(approx - exact) <= max(1, 0.15 * exact)


def test_approx_percentile_close_to_exact(spark):
    li = load(spark, SF, "lineitem")
    row = li.select(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("ap"),
        F.percentile("l_extendedprice", F.lit(0.5)).alias("ex"),
    ).collect()[0]
    assert abs(row["ap"] - row["ex"]) / row["ex"] < 0.02
