"""Sixth wave: ordered string aggregation, distribution window
functions (percent_rank / cume_dist), and date arithmetic. All
oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load
from . import query


# Ordered string aggregation (list-valued results, hash-safe as strings).
@query(
    "region_nation_lists",
    oracle="""
    SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations,
           count(*) AS n_nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def region_nation_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region")
    return (
        nat.join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


# Distribution window functions over a deterministic total order.
@query(
    "customer_balance_ranks",
    oracle="""
    SELECT c_custkey,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6)    AS cume,
           rank() OVER (ORDER BY c_mktsegment)  AS seg_rank
    FROM customer
    WINDOW w AS (ORDER BY c_acctbal ASC, c_custkey ASC)
    """,
)
def customer_balance_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    w = Window.orderBy(F.asc("c_acctbal"), F.asc("c_custkey"))
    wseg = Window.orderBy("c_mktsegment")
    return c.select(
        "c_custkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.rank().over(wseg).alias("seg_rank"),
    )


# Date arithmetic: order age in days/weeks at a fixed reference date.
@query(
    "order_age_buckets",
    oracle="""
    SELECT CAST(date_diff('day', o_orderdate, TIMESTAMP '2026-01-01') // 365 AS BIGINT)
             AS age_years,
           count(*) AS n_orders,
           round(avg(o_totalprice), 2) AS avg_price
    FROM orders
    GROUP BY 1
    """,
)
def order_age_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    age_days = F.datediff(
        F.lit("2026-01-01").cast("date"), F.col("o_orderdate").cast("date")
    )
    return (
        o.groupBy((age_days / 365).cast("long").alias("age_years"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        )
    )


# Gap-filled daily series: a calendar spine (sequence of days) LEFT
# JOINed to the daily aggregate, empty days zero-filled — the standard
# time-series completion every dashboard/trainer needs. The spine is
# one row per day (tiny, broadcast); the aggregate is one partial-agg
# shuffle.
@query(
    "daily_event_counts_gapfilled",
    oracle="""
    WITH bounds AS (
      SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1 FROM events
    ),
    spine AS (
      SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day FROM bounds
    ),
    daily AS (
      SELECT CAST(ts AS DATE) AS day, count(*) AS cnt FROM events GROUP BY 1
    )
    SELECT strftime(spine.day, '%Y-%m-%d') AS day_str,
           coalesce(daily.cnt, 0) AS cnt
    FROM spine LEFT JOIN daily USING (day)
    """,
)
def daily_event_counts_gapfilled(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    bounds = ev.select(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    spine = bounds.select(
        F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day")
    )
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return (
        spine.join(daily, "day", "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day_str"),
            F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"),
        )
    )


# Semi-structured key profiling: which JSON keys exist in the props
# payload, corpus-wide — map_keys explode vs DuckDB json_keys unnest.
@query(
    "props_key_histogram",
    oracle="""
    SELECT k, count(*) AS cnt
    FROM (SELECT unnest(json_keys(props)) AS k FROM events)
    GROUP BY k
    """,
)
def props_key_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,string>")
    return (
        ev.select(F.explode(F.map_keys(m)).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
