"""Eighth wave: the remaining multi-join TPC-H shapes, adapted to the
driver's schema (no partsupp / shipmode — lineitem facts and the
nation/region dims stand in):

- Q7  bi-directional nation-pair revenue flow   (volume_shipping)
- Q8  market share of one supplier nation       (nation_market_share)
- Q9  per-nation/per-year product-line revenue  (color_part_profit)
- Q12 late-shipment counts by priority class    (late_shipment_priority)
- Q15 argmax supplier by windowed revenue       (top_revenue_supplier)
- Q2  per-part minimum unit price + best count  (min_unit_price_parts)

Scale notes common to the wave: nation/region/supplier/part are
dimensions — broadcast them (a 25-row nation table must never shuffle
a 100 TB lineitem). The only unavoidable big shuffle is lineitem ⨝
orders on orderkey (fact-fact); every query here funnels dimension
filters into the fact scan *before* that shuffle so the exchanged
bytes are the post-filter residue, not the raw fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..tables import load
from . import query

def _rev() -> F.Column:
    # built lazily — a module-level Column would require an active
    # SparkContext at import time, and the driver imports first
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# Double summation is order-dependent, and a distributed engine sums in
# whatever order partitions arrive — a group whose true total sits at a
# half-cent boundary then rounds differently run-to-run (observed:
# 1330629.89 vs .90). Casting each term to decimal BEFORE the sum makes
# the aggregation exact and associative (same answer for any partition
# order), which is also the right call at 100 TB: Spark's decimal sum is
# still one partial-agg shuffle, just with a 16-byte accumulator.
def _rev_dec() -> F.Column:
    return _rev().cast("decimal(30,6)")


# TPC-H Q7 shape: revenue flowing between a pair of nations, by
# direction and ship year. Supplier-side and customer-side nation
# filters each reduce their dim to ~1/12 of rows before broadcast;
# lineitem is pre-filtered by the broadcast semi on suppkey, so the
# orderkey shuffle carries only the two nations' traffic (~0.7% of
# lines at uniform nation spread).
@query(
    "volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(round(sum(CAST(volume AS DECIMAL(30,6))), 2) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    pair = ("NATION_1", "NATION_2")
    nation = load(spark, sf_dir, "nation").filter(F.col("n_name").isin(*pair))
    supp = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = load(spark, sf_dir, "lineitem").join(
        F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey")
    )
    orders = load(spark, sf_dir, "orders").join(
        F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(_rev_dec()), 2).cast("double").alias("revenue"))
    )


# TPC-H Q8 shape: one supplier nation's share of PROMO-part revenue
# sold to customers in region AMERICA, by order year. The share is a
# conditional-sum ratio inside one aggregation — a single partial-agg
# shuffle keyed on the (tiny) year, never a second pass.
@query(
    "nation_market_share",
    oracle="""
    SELECT o_year,
           round(100.0 * sum(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0 END)
                 / sum(volume), 4) AS mkt_share_pct,
           count(*) AS n_lines
    FROM (
      SELECT year(o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n1.n_name AS supp_nation
      FROM lineitem
      JOIN part     ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region   ON n2.n_regionkey = r_regionkey
      WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
    )
    GROUP BY o_year
    """,
)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    supp = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    america = (
        load(spark, sf_dir, "nation")
        .join(
            F.broadcast(load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    cust = (
        load(spark, sf_dir, "customer")
        .join(F.broadcast(america), F.col("c_nationkey") == F.col("cn_key"))
        .select("c_custkey")
    )
    orders = load(spark, sf_dir, "orders").join(
        F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"), "left_semi"
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("supp_nation") == "NATION_5", _rev()).otherwise(0.0))
                / F.sum(_rev()),
                4,
            ).alias("mkt_share_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# TPC-H Q9 shape: revenue for one product line ('blue …' parts) by
# supplier nation and order year. part and supplier⨝nation broadcast;
# the blue-part semi filter reaches the lineitem scan before the
# fact-fact orderkey shuffle (~1/8 of lines survive).
@query(
    "color_part_profit",
    oracle="""
    SELECT supp_nation, o_year,
           CAST(round(sum(CAST(volume AS DECIMAL(30,6))), 2) AS DOUBLE) AS revenue
    FROM (
      SELECT n_name AS supp_nation, year(o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM lineitem
      JOIN part     ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN orders   ON l_orderkey = o_orderkey
      WHERE p_name LIKE 'blue%'
    )
    GROUP BY supp_nation, o_year
    """,
)
def color_part_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("blue%"))
        .select("p_partkey")
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("supp_nation", F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(_rev_dec()), 2).cast("double").alias("revenue"))
    )


# TPC-H Q12 shape (no shipmode column — priority class stands in):
# lines shipped >90 days after the order date, split into high/low
# priority counts per ship year. One fact-fact shuffle, then a tiny
# partial-agg; the 90-day predicate is a row-local comparison that
# whole-stage codegen fuses into the join's output projection.
@query(
    "late_shipment_priority",
    oracle="""
    SELECT year(l_shipdate) AS ship_year,
           count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                 THEN 1 END) AS high_line_count,
           count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                 THEN 1 END) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
    GROUP BY 1
    """,
)
def late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


# TPC-H Q15 shape: the supplier(s) with maximum revenue over a
# three-month ship window. Revenue is rounded to cents BEFORE the max
# comparison on both engines so tie semantics are exact, not
# float-luck. The max is a window over the |suppliers|-row aggregate —
# an unpartitioned window is safe there because the aggregate, not the
# fact table, flows into it.
@query(
    "top_revenue_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))), 2)
                  AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
)
def top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.round(F.sum(_rev_dec()), 2).cast("double").alias("total_revenue")
    )
    best = rev.withColumn(
        "_max", F.max("total_revenue").over(Window.partitionBy())
    ).filter(F.col("total_revenue") == F.col("_max"))
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        best.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# TPC-H Q2 shape (no partsupp — observed sale prices stand in for
# supply cost): for each large part (p_size >= 45) sold by a EUROPE
# supplier, the minimum per-unit price and how many suppliers hit that
# minimum. The correlated-min + correlated-count subqueries decorrelate
# into one groupBy plus a same-key window — the window's hash
# partitioning is reused by the final aggregation, so the whole query
# is two shuffles (per-(part,supp) agg, then per-part) regardless of
# fact size. Unit prices round to cents before comparison so the
# "achieves the minimum" set is engine-independent.
@query(
    "min_unit_price_parts",
    oracle="""
    WITH su AS (
      SELECT l_partkey, l_suppkey, min(round(l_extendedprice / l_quantity, 2)) AS unit
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
      GROUP BY l_partkey, l_suppkey
    ),
    m AS (SELECT l_partkey, min(unit) AS min_unit FROM su GROUP BY l_partkey)
    SELECT m.l_partkey AS p_partkey, p_name, m.min_unit,
           (SELECT count(*) FROM su
            WHERE su.l_partkey = m.l_partkey AND su.unit = m.min_unit) AS n_best_suppliers
    FROM m JOIN part ON m.l_partkey = p_partkey
    WHERE p_size >= 45
    """,
)
def min_unit_price_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    eu_supp = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load(spark, sf_dir, "nation").join(
                    F.broadcast(
                        load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
                    ),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    li = load(spark, sf_dir, "lineitem").join(
        F.broadcast(eu_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi"
    )
    su = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.round(F.col("l_extendedprice") / F.col("l_quantity"), 2)).alias("unit")
    )
    w = Window.partitionBy("l_partkey")
    per_part = (
        su.withColumn("min_unit", F.min("unit").over(w))
        .filter(F.col("unit") == F.col("min_unit"))
        .groupBy("l_partkey")
        .agg(
            F.first("min_unit").alias("min_unit"),
            F.count(F.lit(1)).alias("n_best_suppliers"),
        )
    )
    big_parts = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_size") >= 45)
        .select("p_partkey", "p_name")
    )
    return per_part.join(
        F.broadcast(big_parts), F.col("l_partkey") == F.col("p_partkey")
    ).select("p_partkey", "p_name", "min_unit", "n_best_suppliers")
