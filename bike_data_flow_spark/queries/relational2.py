"""Second wave of relational engine-surface queries: window frames,
cube, intersect/except, percentiles, pivot-style conditional agg,
date/string functions, scalar subqueries, HAVING, explode, TPC-H-style
scan-heavy filters. All oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.text import tokens
from ..tables import load
from . import query

# Window FRAME (rowsBetween): 4-row moving average per user.
@query(
    "moving_avg",
    oracle="""
    SELECT user_id, event_id,
           round(avg(value) OVER (PARTITION BY user_id
                                  ORDER BY ts ASC, event_id ASC
                                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4)
             AS value_ma4
    FROM events
    """,
)
def moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts_ns"), F.asc("event_id"))
        .rowsBetween(-3, 0)
    )
    return ev.select(
        "user_id", "event_id", F.round(F.avg("value").over(w), 4).alias("value_ma4")
    )


# CUBE over two dims.
@query(
    "orders_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS cnt, round(avg(o_totalprice), 2) AS avg_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def orders_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        )
    )


# INTERSECT / EXCEPT.
@query(
    "nation_overlap",
    oracle="""
    SELECT 'both' AS side, n.nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      INTERSECT
      SELECT s_nationkey FROM supplier
    ) n
    UNION ALL
    SELECT 'customer_only' AS side, n.nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      EXCEPT
      SELECT s_nationkey FROM supplier
    ) n
    """,
)
def nation_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    # subtract = EXCEPT (distinct) — exceptAll would keep multiplicity
    # differences and resurrect keys present on both sides
    both = c.intersect(s).select(F.lit("both").alias("side"), "nationkey")
    only = c.subtract(s).select(F.lit("customer_only").alias("side"), "nationkey")
    return both.unionByName(only)


# Exact interpolated percentiles (Spark `percentile` ≡ DuckDB quantile_cont).
@query(
    "quantity_percentiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 4) AS p50,
           round(quantile_cont(l_quantity, 0.9), 4) AS p90,
           round(quantile_cont(l_quantity, 0.99), 4) AS p99
    FROM lineitem GROUP BY l_returnflag
    """,
)
def quantity_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("l_quantity", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("l_quantity", F.lit(0.99)), 4).alias("p99"),
    )


# Pivot-style conditional aggregation (wide per-user activity profile).
@query(
    "user_activity_pivot",
    oracle="""
    SELECT user_id,
           count(CASE WHEN event_type = 'click' THEN 1 END)    AS click_cnt,
           count(CASE WHEN event_type = 'view' THEN 1 END)     AS view_cnt,
           count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase_cnt,
           count(CASE WHEN event_type = 'error' THEN 1 END)    AS error_cnt,
           round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 2)
             AS purchase_value
    FROM events GROUP BY user_id
    """,
)
def user_activity_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    cnt = lambda t: F.count(F.when(F.col("event_type") == t, 1)).alias(f"{t}_cnt")  # noqa: E731
    return ev.groupBy("user_id").agg(
        cnt("click"),
        cnt("view"),
        cnt("purchase"),
        cnt("error"),
        F.round(
            F.sum(F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)),
            2,
        ).alias("purchase_value"),
    )


# Date bucketing (monthly revenue).
@query(
    "monthly_revenue",
    oracle="""
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
           count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
    FROM orders GROUP BY 1
    """,
)
def monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


# String functions: LIKE filter + upper/substring/concat projection.
@query(
    "part_name_features",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_uc,
           substr(p_name, 1, 5) AS name_prefix,
           p_brand || '/' || p_type AS brand_type,
           length(p_name) AS name_len
    FROM part WHERE p_name LIKE '%red%' OR p_name LIKE 'small%'
    """,
)
def part_name_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").like("%red%") | F.col("p_name").like("small%")
    ).select(
        "p_partkey",
        F.upper("p_brand").alias("brand_uc"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").alias("name_len"),
    )


# Scalar subquery: customers above the average balance.
@query(
    "above_avg_balance",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_above
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
    GROUP BY c_mktsegment
    """,
)
def above_avg_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    avg_bal = c.agg(F.avg("c_acctbal").alias("_avg"))
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg"))
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_above"))
    )


# HAVING clause.
@query(
    "busy_users",
    oracle="""
    SELECT user_id, count(*) AS n_events
    FROM events GROUP BY user_id HAVING count(*) > 75
    """,
)
def busy_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .filter(F.col("n_events") > 75)
    )


# Explode / unnest: global token frequencies, top 20.
@query(
    "token_frequencies",
    oracle="""
    SELECT tok, count(*) AS freq FROM (
      SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
      FROM documents
    )
    GROUP BY tok
    ORDER BY freq DESC, tok ASC
    LIMIT 20
    """,
)
def token_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("tok"))
        .limit(20)
    )


# TPC-H Q6-style scan: tight filters that must push down to parquet.
@query(
    "forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24
    """,
    bench=True,
)
def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_discount").between(0.02, 0.06) & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# TPC-H Q3-style: join + filter + grouped agg + top-k on computed measure.
@query(
    "shipping_priority",
    oracle="""
    SELECT o_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'O'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey ASC
    LIMIT 10
    """,
    bench=True,
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


# Vector norms via higher-order fold (array surface without similarity).
@query(
    "embedding_norms",
    oracle="""
    SELECT vec_id,
           round(sqrt(list_sum([CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)
                                FOR i IN generate_series(1, len(embedding))])), 6) AS l2_norm,
           len(embedding) AS dim
    FROM embeddings
    """,
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import norm

    e = load(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.round(norm(F.col("embedding")), 6).alias("l2_norm"),
        F.size("embedding").alias("dim"),
    )
