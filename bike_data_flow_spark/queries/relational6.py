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
