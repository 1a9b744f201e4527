"""Fourth wave: promo-share style conditional ratios over a fact-dim
join, GROUPING SETS via the SQL entry point (spark.sql is first-class
engine surface), single-pass table profiling, and conditional distinct
counts. All oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load, register_all
from . import query


# TPC-H Q14-flavored: revenue share of 'red' parts per month.
# lineitem ⨝ part on partkey: part is the dimension → broadcast at these
# SFs; AQE shifts to shuffled-hash when part outgrows the threshold.
@query(
    "red_part_revenue_share",
    oracle="""
    SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m') AS month,
           round(100.0 * sum(CASE WHEN p_name LIKE '%red%'
                             THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS red_share_pct,
           count(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1
    """,
    bench=True,
)
def red_part_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_name")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM").alias("month")
        )
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_name").like("%red%"), rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("red_share_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# GROUPING SETS through spark.sql — the SQL API is part of the engine
# surface; grouping_id() disambiguates real NULLs from subtotal rows.
@query(
    "orders_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CASE WHEN GROUPING(o_orderstatus) = 1 AND GROUPING(o_orderpriority) = 1 THEN 3
                WHEN GROUPING(o_orderpriority) = 1 THEN 1
                WHEN GROUPING(o_orderstatus) = 1 THEN 2
                ELSE 0 END AS gid,
           count(*) AS cnt
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), (o_orderstatus, o_orderpriority), ())
    """,
)
def orders_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_all(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CASE WHEN grouping(o_orderstatus) = 1 AND grouping(o_orderpriority) = 1 THEN 3
                    WHEN grouping(o_orderpriority) = 1 THEN 1
                    WHEN grouping(o_orderstatus) = 1 THEN 2
                    ELSE 0 END AS gid,
               count(*) AS cnt
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), (o_orderstatus, o_orderpriority), ())
        """
    )


# Single-pass table profile (data-quality surface beyond P13): one
# aggregate job computes null counts, distincts, and ranges for every
# profiled column — no per-column scans.
@query(
    "lineitem_profile",
    oracle="""
    SELECT count(*)                                   AS n_rows,
           count(DISTINCT l_orderkey)                 AS d_orderkey,
           count(DISTINCT l_returnflag)               AS d_returnflag,
           count(*) - count(l_quantity)               AS nulls_quantity,
           round(min(l_quantity), 2)                  AS min_quantity,
           round(max(l_quantity), 2)                  AS max_quantity,
           round(min(l_extendedprice), 2)             AS min_price,
           round(max(l_extendedprice), 2)             AS max_price,
           epoch_ms(min(l_shipdate))                  AS min_shipdate_ms,
           epoch_ms(max(l_shipdate))                  AS max_shipdate_ms
    FROM lineitem
    """,
)
def lineitem_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three independent aggregate branches, crossJoined 1-row results.

    Why branches instead of one combined aggregate: mixing a
    countDistinct with plain aggregates forces EVERY buffer through
    the distinct-key-grouped partial (147k orderkey groups × 10
    buffers + their shuffle — measured 1.15 s at sf0.1 in both the
    Catalyst one-distinct rewrite and a manual two-stage spelling).
    The branches' column sets are DISJOINT, so with parquet column
    pruning the three scans together read each column exactly once —
    the same total bytes as a single full-width pass — while the
    simple-stats branch skips the orderkey shuffle entirely and the
    independent stages run concurrently (0.58 s at sf0.1). Each
    distinct branch still shuffles only NDV rows, so the shape holds
    at 100 TB."""
    li = load(spark, sf_dir, "lineitem")
    simple = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("l_quantity")).alias("nulls_quantity"),
        F.round(F.min("l_quantity"), 2).alias("min_quantity"),
        F.round(F.max("l_quantity"), 2).alias("max_quantity"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        # parquet ms-timestamps read as TIMESTAMP_NTZ; cast is value-
        # preserving under the UTC session and unlocks unix_millis
        F.unix_millis(F.min("l_shipdate").cast("timestamp")).alias("min_shipdate_ms"),
        F.unix_millis(F.max("l_shipdate").cast("timestamp")).alias("max_shipdate_ms"),
    )
    d_okey = li.agg(F.countDistinct("l_orderkey").alias("d_orderkey"))
    d_flag = li.agg(F.countDistinct("l_returnflag").alias("d_returnflag"))
    return (
        simple.crossJoin(F.broadcast(d_okey))
        .crossJoin(F.broadcast(d_flag))
        .select(
            "n_rows",
            "d_orderkey",
            "d_returnflag",
            "nulls_quantity",
            "min_quantity",
            "max_quantity",
            "min_price",
            "max_price",
            "min_shipdate_ms",
            "max_shipdate_ms",
        )
    )


# TPC-H Q13-style two-level aggregation: distribution of customers by
# their order count (incl. zero-order customers via left join).
@query(
    "customer_order_distribution",
    oracle="""
    SELECT n_orders, count(*) AS n_customers FROM (
      SELECT c_custkey, count(o_orderkey) AS n_orders
      FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      GROUP BY c_custkey
    )
    GROUP BY n_orders
    """,
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


# TPC-H Q2-style correlated min: parts at their per-(brand,type) minimum
# retail price — decorrelated as a groupBy + equi-join on (group, min).
@query(
    "cheapest_parts_per_brand_type",
    oracle="""
    SELECT p.p_partkey, p.p_brand, p.p_type, round(p.p_retailprice, 2) AS price
    FROM part p
    WHERE p.p_retailprice = (
      SELECT min(p2.p_retailprice) FROM part p2
      WHERE p2.p_brand = p.p_brand AND p2.p_type = p.p_type
    )
    """,
)
def cheapest_parts_per_brand_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    mins = p.groupBy(
        F.col("p_brand").alias("b"), F.col("p_type").alias("t")
    ).agg(F.min("p_retailprice").alias("min_price"))
    return (
        p.join(
            F.broadcast(mins),
            (p.p_brand == mins.b)
            & (p.p_type == mins.t)
            & (p.p_retailprice == mins.min_price),
        )
        .select(
            "p_partkey",
            "p_brand",
            "p_type",
            F.round("p_retailprice", 2).alias("price"),
        )
    )


# Linear-regression aggregates: per-user value trend over time.
# epoch-ms x-axis keeps both engines in exact integer arithmetic.
@query(
    "user_value_trend",
    oracle="""
    SELECT user_id,
           round(regr_slope(value, epoch_ms(ts) / 3600000.0), 6) + 0.0
             AS slope_per_hour,
           round(regr_r2(value, epoch_ms(ts) / 3600000.0), 6)    AS r2,
           count(*) AS n
    FROM events GROUP BY user_id
    """,
)
def user_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    x = F.expr("ts_ns div 1000000") / F.lit(3600000.0)
    return ev.groupBy("user_id").agg(
        (F.round(F.regr_slope(F.col("value"), x), 6) + F.lit(0.0)).alias(
            "slope_per_hour"
        ),
        F.round(F.regr_r2(F.col("value"), x), 6).alias("r2"),
        F.count(F.lit(1)).alias("n"),
    )


# Conditional distinct: distinct purchasers vs clickers per day-of-week.
@query(
    "distinct_users_by_dow",
    oracle="""
    SELECT dayofweek(ts) AS dow,
           count(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END) AS purchasers,
           count(DISTINCT CASE WHEN event_type = 'click' THEN user_id END)    AS clickers,
           count(*) AS n_events
    FROM events GROUP BY 1
    """,
)
def distinct_users_by_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    # Spark dayofweek: 1=Sunday..7; DuckDB: 0=Sunday..6 — align to 0-based
    return ev.groupBy((F.dayofweek("ts") - 1).alias("dow")).agg(
        F.countDistinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("purchasers"),
        F.countDistinct(
            F.when(F.col("event_type") == "click", F.col("user_id"))
        ).alias("clickers"),
        F.count(F.lit(1)).alias("n_events"),
    )
