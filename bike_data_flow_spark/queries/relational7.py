"""Seventh wave: TPC-H's correlated-subquery shapes, adapted to the
driver's schema (no partsupp / commitdate — returns stand in for
lateness). These are the decorrelation patterns every warehouse engine
must handle:

- EXISTS            -> left_semi join           (priority_with_returns, Q4)
- correlated AVG    -> self-agg + broadcast join (small_quantity_part_revenue, Q17)
- correlated share  -> join vs per-key totals    (dominant_supplier_parts, Q20)
- EXISTS+NOT EXISTS -> left_semi + left_anti     (sole_return_suppliers, Q21)

Spark's Catalyst decorrelates SQL subqueries into exactly these joins;
writing them as explicit DataFrame joins keeps the plan deterministic
and lets us pick the broadcast side ourselves. All oracles use the
subquery spelling so the comparison also proves the decorrelation is
semantics-preserving.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load
from . import query


# TPC-H Q4 shape: count orders per priority that have at least one
# returned lineitem. Correlated EXISTS -> left_semi join on the fact
# table; the semi join shuffles on l_orderkey (uniform) and the
# priority agg is a tiny partial-agg shuffle.
@query(
    "priority_with_returns",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
    )
    GROUP BY o_orderpriority
    """,
)
def priority_with_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# TPC-H Q17 shape: revenue from "small" orders — lineitems whose
# quantity is below 20% of the average quantity for their part.
# Correlated scalar AVG subquery -> aggregate lineitem once by part
# (partial-agg shuffle on l_partkey) and broadcast the per-part
# averages back; at 100 TB the avg table is |parts| rows (small
# relative to the fact), so the probe side never shuffles.
@query(
    "small_quantity_part_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    WHERE l.l_quantity < (
      SELECT 0.2 * avg(l_quantity) FROM lineitem li
      WHERE li.l_partkey = l.l_partkey
    )
    """,
)
def small_quantity_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * F.lit(0.2)).alias("qty_cutoff")
    )
    return (
        li.join(
            F.broadcast(per_part.withColumnRenamed("l_partkey", "pk")),
            li.l_partkey == F.col("pk"),
        )
        .filter(F.col("l_quantity") < F.col("qty_cutoff"))
        .agg(F.round(F.sum("l_extendedprice") / F.lit(7.0), 2).alias("avg_yearly"))
    )


# TPC-H Q20 shape (partsupp-free): suppliers that dominate a part —
# shipped more than 15% of that part's total quantity. Correlated
# share subquery -> join the (part, supplier) rollup against the
# per-part totals; both aggregates reuse the same l_partkey
# shuffle partitioning, so the join is co-partitioned (no extra
# exchange on the big side).
@query(
    "dominant_supplier_parts",
    oracle="""
    SELECT s_name, count(*) AS parts_dominated
    FROM (
      SELECT l_partkey, l_suppkey, sum(l_quantity) AS supp_qty
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ) ps
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE supp_qty > 0.15 * (
      SELECT sum(l_quantity) FROM lineitem l WHERE l.l_partkey = ps.l_partkey
    )
    GROUP BY s_name
    """,
)
def dominant_supplier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    sup = load(spark, sf_dir, "supplier")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("supp_qty")
    )
    totals = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.sum("l_quantity") * F.lit(0.15)).alias("qty_bar")
    )
    return (
        ps.join(totals, ps.l_partkey == totals.pk)
        .filter(F.col("supp_qty") > F.col("qty_bar"))
        .join(F.broadcast(sup), ps.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("parts_dominated"))
    )


# TPC-H Q21 shape: suppliers who were the SOLE supplier with a return
# in a multi-supplier order. EXISTS (another supplier in the order)
# -> left_semi; NOT EXISTS (another supplier with a return) ->
# left_anti. All three legs shuffle on l_orderkey, so AQE coalesces
# them onto one exchange footprint; top-20 is TakeOrderedAndProject.
@query(
    "sole_return_suppliers",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
          WHERE l_returnflag = 'R') l1
    JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
    )
    AND NOT EXISTS (
      SELECT 1 FROM lineitem l3
      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_returnflag = 'R'
    )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def sole_return_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    sup = load(spark, sf_dir, "supplier")
    l1 = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    others = li.select(
        F.col("l_orderkey").alias("o_ok"), F.col("l_suppkey").alias("o_sk")
    )
    other_returns = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("r_ok"), F.col("l_suppkey").alias("r_sk")
    )
    has_other = l1.join(
        others,
        (l1.l_orderkey == others.o_ok) & (l1.l_suppkey != others.o_sk),
        "left_semi",
    )
    sole = has_other.join(
        other_returns,
        (has_other.l_orderkey == F.col("r_ok"))
        & (has_other.l_suppkey != F.col("r_sk")),
        "left_anti",
    )
    return (
        sole.join(F.broadcast(sup), sole.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )
