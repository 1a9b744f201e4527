"""Relational operator queries (SURVEY.md §2.2–§2.7) over the driver's
synthetic tables.

Each query re-expresses a reference operator family Spark-first:
aggregations (A1–A9), the latest-per-key window (W1,
create_enhanced_views.py:84-94), sorts/top-k (O1–O6), set ops (U1),
the grid-density bin rewrite (A6/J1,
bike_spatial_density_analysis.py:136-190 — O(cells×N) nested loop
replaced by O(N) bin arithmetic + one shuffle), joins (§2.3: the
engine surface the reference stores data for but never executes), and
first/last-by-time (A8, iceberg_assets.py:192-201 — made
deterministic with an explicit intra-group order, SURVEY §7.4.2).

Scale notes inline; everything stays in whole-stage codegen (no Python
UDFs), aggregates are map-side partial, small dims are broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load
from . import query

# ---------------------------------------------------------------------------
# A5 multi-stat grouped aggregation (iceberg_assets.py:159-169 pattern):
# the flagship query. Pure map-side-combinable agg: scales linearly,
# shuffle carries only |groups| rows per mapper.
# ---------------------------------------------------------------------------


@query(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                          AS sum_qty,
           round(sum(l_extendedprice), 2)                     AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)  AS sum_disc_price,
           round(avg(l_quantity), 2)                          AS avg_qty,
           round(avg(l_extendedprice), 2)                     AS avg_price,
           round(avg(l_discount), 4)                          AS avg_disc,
           count(*)                                           AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    bench=True,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "sum_disc_price"
        ),
        F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


# ---------------------------------------------------------------------------
# W1 latest-per-key (wrm_stations_latest view): ROW_NUMBER ... rn=1.
# Catalyst rewrites the rn=1 filter into a per-partition top-1
# (InferWindowGroupLimit), so only one row per key survives each map task.
# ---------------------------------------------------------------------------


@query(
    "latest_per_key",
    oracle="""
    SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, event_type, value
    FROM (
      SELECT user_id, event_id, ts, event_type, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    bench=True,
)
def latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Orders on the raw nanosecond long (ts_ns) — identical total order to
    # the oracle's TIMESTAMP_NS; outputs epoch-millis (µs-vs-ns safe).
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts_ns"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            F.expr("ts_ns div 1000000").alias("ts_ms"),
            "event_type",
            "value",
        )
    )


# A2 group-by count (record_type distribution pattern).
@query(
    "event_type_counts",
    oracle="SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type",
)
def event_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "events").groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )


# A4 min/max bounds with null rejection (bounding box pattern).
@query(
    "value_bounds",
    oracle="""
    SELECT round(min(value), 2) AS min_value, round(max(value), 2) AS max_value,
           epoch_ms(min(ts)) AS min_ts_ms, epoch_ms(max(ts)) AS max_ts_ms
    FROM events WHERE value IS NOT NULL
    """,
)
def value_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return ev.agg(
        F.round(F.min("value"), 2).alias("min_value"),
        F.round(F.max("value"), 2).alias("max_value"),
        # integer div — ts_ns (~1.7e18) would lose precision through double
        F.expr("min(ts_ns) div 1000000").alias("min_ts_ms"),
        F.expr("max(ts_ns) div 1000000").alias("max_ts_ms"),
    )


# ---------------------------------------------------------------------------
# A6/J1 grid density — the reference's O(cells×N) Python nested loop
# (bike_spatial_density_analysis.py:136-190) redesigned as O(N) bin
# arithmetic + a single partial-aggregated shuffle. At 100 TB this is
# the only shape that works: no grid broadcast, no theta join.
# ---------------------------------------------------------------------------


@query(
    "grid_density",
    oracle="""
    SELECT CAST(floor(l_discount * 100) AS BIGINT) AS bin_disc,
           CAST(floor(l_tax * 100) AS BIGINT)      AS bin_tax,
           round(sum(l_quantity), 2)               AS sum_qty,
           count(*)                                AS cnt
    FROM lineitem
    WHERE l_discount IS NOT NULL AND l_tax IS NOT NULL
    GROUP BY 1, 2
    """,
    bench=True,
)
def grid_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_discount").isNotNull() & F.col("l_tax").isNotNull()
    )
    return (
        li.withColumn("bin_disc", F.floor(F.col("l_discount") * 100))
        .withColumn("bin_tax", F.floor(F.col("l_tax") * 100))
        .groupBy("bin_disc", "bin_tax")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


# O1/O2 multi-key sort + top-k. Spark executes as TakeOrderedAndProject —
# each partition keeps k rows, driver merges: no global sort at scale.
@query(
    "latest_orders_top10",
    oracle="""
    SELECT o_orderkey, o_orderdate, o_totalprice, o_orderstatus
    FROM orders
    ORDER BY o_orderdate DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def latest_orders_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .orderBy(F.desc("o_orderdate"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_orderdate", "o_totalprice", "o_orderstatus")
    )


# ---------------------------------------------------------------------------
# A8 first/last-by-time per group (movement summary pattern). The
# reference's pandas first/last depends on concat order; here the order
# is explicit (ts, event_id) so the result is deterministic (SURVEY §7.4.2).
# Single window pass → single shuffle; conditional agg collapses to one row
# per key.
# ---------------------------------------------------------------------------


@query(
    "first_last_by_time",
    oracle="""
    SELECT user_id,
           max(CASE WHEN rn_a = 1 THEN value END)  AS first_value,
           max(CASE WHEN rn_d = 1 THEN value END)  AS last_value,
           round(stddev_samp(value), 4)            AS std_value,
           count(*)                                AS n_events
    FROM (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts ASC,  event_id ASC)  AS rn_a,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    GROUP BY user_id
    """,
)
def first_last_by_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    wa = Window.partitionBy("user_id").orderBy(F.asc("ts_ns"), F.asc("event_id"))
    wd = Window.partitionBy("user_id").orderBy(F.desc("ts_ns"), F.desc("event_id"))
    return (
        ev.select(
            "user_id",
            "value",
            F.row_number().over(wa).alias("rn_a"),
            F.row_number().over(wd).alias("rn_d"),
        )
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("first_value"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("last_value"),
            F.round(F.stddev_samp("value"), 4).alias("std_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# §2.3 joins — the engine surface. Small dims (nation: 25, region: 5)
# are broadcast: zero shuffle on the build side, fact side streams.
# ---------------------------------------------------------------------------


@query(
    "region_customer_stats",
    oracle="""
    SELECT r_name,
           count(*)                      AS n_customers,
           round(sum(c_acctbal), 2)      AS total_acctbal,
           round(avg(c_acctbal), 2)      AS avg_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    bench=True,
)
def region_customer_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
            F.round(F.avg("c_acctbal"), 2).alias("avg_acctbal"),
        )
    )


@query(
    "revenue_by_nation",
    oracle="""
    SELECT n_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    bench=True,
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = load(spark, sf_dir, "nation")
    # customer is small relative to orders at every sf → broadcast; at true
    # 100 TB scale customer would exceed the broadcast threshold and AQE
    # falls back to shuffled hash join on the equi-key automatically.
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


# Left-anti join (NOT EXISTS): customers with no orders.
@query(
    "customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").select("o_custkey")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


# Left-semi join (EXISTS): per-segment count of customers having orders.
@query(
    "segments_with_orders",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_active
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    """,
)
def segments_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").select("o_custkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


# U1 union + distinct.
@query(
    "active_nationkeys",
    oracle="""
    SELECT DISTINCT nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT s_nationkey AS nationkey FROM supplier
    )
    """,
)
def active_nationkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


# Grouping sets family (engine surface beyond the reference — SURVEY §2.4 note).
@query(
    "orders_rollup",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS cnt, round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


# Analytic window (lag) — implied by the movement-tracking use case (SURVEY §2.5).
@query(
    "event_value_deltas",
    oracle="""
    SELECT user_id, event_id,
           round(value - lag(value) OVER (PARTITION BY user_id
                                          ORDER BY ts ASC, event_id ASC), 2)
             + 0.0 AS delta
    FROM events
    """,
)
def event_value_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts_ns"), F.asc("event_id"))
    return ev.select(
        "user_id",
        "event_id",
        (F.round(F.col("value") - F.lag("value").over(w), 2) + F.lit(0.0)).alias(
            "delta"
        ),
    )


# Semi-structured access: JSON path extraction from the events props payload.
@query(
    "props_k_by_type",
    oracle="""
    SELECT event_type,
           count(*) AS cnt,
           round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
    FROM events
    GROUP BY event_type
    """,
)
def props_k_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.avg(k), 4).alias("avg_k"),
        F.sum(k).alias("sum_k"),
    )


# Exact distinct counts (the scalable spelling is approx_count_distinct —
# exposed in operators/; here exact so the oracle matches bit-for-bit).
@query(
    "distinct_counts",
    oracle="""
    SELECT count(DISTINCT user_id) AS n_users,
           count(DISTINCT event_type) AS n_types
    FROM events
    """,
)
def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_type").alias("n_types"),
    )
