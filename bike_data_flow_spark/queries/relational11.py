"""Eleventh wave: gaps-and-islands streaks and interval sweep-line
concurrency — two classic warehouse shapes the registry still lacked.

- user_activity_streaks: longest run of CONSECUTIVE active days per
  user via the date-minus-row_number anchor trick (no self-join, no
  recursion): two user-partitioned windows + one bounded aggregate.
- in_flight_lineitems_peak: sweep-line peak concurrency over
  [o_orderdate, l_shipdate) intervals — each interval becomes a +1/-1
  boundary pair, a date-bounded aggregate nets the deltas, and one
  running sum over |distinct dates| rows (calendar-bounded, NOT
  corpus-bounded) yields the in-flight count; top-10 peak days out.

Both are pure integer/date arithmetic — no float-fold concerns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..tables import load
from . import query


# Gaps-and-islands without a join: for each user's ordered distinct
# active days, day − row_number is CONSTANT within a consecutive run —
# grouping by that anchor labels the islands. Shuffles: one distinct
# (user, day) aggregate, one user-partitioned window, one
# (user, anchor) count, one per-user max — all bounded by |user-days|.
# The reference has no streak analytics; this is the standard
# retention-adjacent shape its daily summaries feed into.
@query(
    "user_activity_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    runs AS (
      SELECT user_id, d,
             d - CAST(row_number() OVER (
                   PARTITION BY user_id ORDER BY d ASC) AS INTEGER) AS anchor
      FROM days
    ),
    islands AS (
      SELECT user_id, anchor, count(*) AS streak
      FROM runs GROUP BY user_id, anchor
    )
    SELECT user_id,
           CAST(max(streak) AS BIGINT) AS longest_streak,
           CAST(sum(streak) AS BIGINT) AS n_active_days,
           count(*) AS n_streaks
    FROM islands GROUP BY user_id
    """,
)
def user_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    days = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy(F.asc("d"))
    runs = days.withColumn(
        "anchor", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    islands = runs.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("streak")
    )
    return islands.groupBy("user_id").agg(
        F.max("streak").alias("longest_streak"),
        F.sum("streak").alias("n_active_days"),
        F.count(F.lit(1)).alias("n_streaks"),
    )


_PEAK_K = 10


# Sweep-line concurrency: an order line is "in flight" on day d when
# o_orderdate <= d < l_shipdate. Exploding each interval into a +1/-1
# boundary pair and netting per day makes the running sum's input
# |distinct dates| rows — calendar-bounded (~2.5k days for TPC-H
# regardless of SF), so the single ordered cumulative window is NOT a
# corpus-sized single-partition scan; the corpus-sized work is the
# fact-fact orders⋈lineitem join (key-partitioned) and the per-day
# delta aggregate, both shuffle-bounded and AQE-planned.
@query(
    "in_flight_lineitems_peak",
    oracle=f"""
    WITH bounds AS (
      SELECT o.o_orderdate AS d, 1 AS delta
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      UNION ALL
      SELECT l.l_shipdate AS d, -1 AS delta
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    daily AS (
      SELECT d, CAST(sum(delta) AS BIGINT) AS net FROM bounds GROUP BY d
    ),
    running AS (
      SELECT d, sum(net) OVER (ORDER BY d ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS in_flight
      FROM daily
    )
    SELECT d, CAST(in_flight AS BIGINT) AS in_flight FROM running
    ORDER BY in_flight DESC, d ASC LIMIT {_PEAK_K}
    """,
)
def in_flight_lineitems_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    joined = li.join(
        orders, li.l_orderkey == orders.o_orderkey, "inner"
    ).select("o_orderdate", "l_shipdate")
    # ONE join: each interval explodes map-side into its ±1 boundary
    # pair (a union of two selects would duplicate the fact-fact join
    # subtree — twice the shuffle at any scale)
    bounds = joined.select(
        F.explode(
            F.array(
                F.struct(F.col("o_orderdate").alias("d"), F.lit(1).alias("delta")),
                F.struct(F.col("l_shipdate").alias("d"), F.lit(-1).alias("delta")),
            )
        ).alias("b")
    ).select("b.d", "b.delta")
    daily = bounds.groupBy("d").agg(F.sum("delta").alias("net"))
    w = (
        Window.orderBy(F.asc("d"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = daily.withColumn("in_flight", F.sum("net").over(w))
    return (
        running.select("d", "in_flight")
        .orderBy(F.desc("in_flight"), F.asc("d"))
        .limit(_PEAK_K)
    )


_SSSP_SRC = 0
_SSSP_ROUNDS = 3


# Weighted shortest path over the co-purchase graph: edge weight =
# ceil(100 / support) — frequently co-bought parts are "close", rare
# pairings are far — and Bellman-Ford min-plus relaxation finds the
# cheapest ≤3-edge path from the seed part. Integer weights keep the
# semiring exact on both engines; the oracle's recursive CTE
# enumerates bounded paths and min-collapses them. The edge build is
# keyed on the ORDER (Σ basket² work, never parts²).
@query(
    "copurchase_cheapest_path",
    oracle=f"""
    WITH RECURSIVE items AS (
      SELECT DISTINCT l_orderkey AS okey, l_partkey AS part FROM lineitem
    ),
    support AS (
      SELECT a.part AS src, b.part AS dst, count(*) AS s
      FROM items a JOIN items b ON a.okey = b.okey
      WHERE a.part <> b.part
      GROUP BY 1, 2
    ),
    edges AS (
      SELECT src, dst, CAST(ceil(100.0 / s) AS BIGINT) AS w FROM support
    ),
    walk(node, cost, hop) AS (
      SELECT CAST({_SSSP_SRC} AS BIGINT), CAST(0 AS BIGINT), 0
      UNION
      SELECT edges.dst, walk.cost + edges.w, walk.hop + 1
      FROM walk JOIN edges ON edges.src = walk.node
      WHERE walk.hop < {_SSSP_ROUNDS}
    )
    SELECT node, min(cost) AS cost FROM walk GROUP BY node
    """,
)
def copurchase_cheapest_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import bellman_ford

    li = load(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("part")
    ).distinct()
    a = items.select(F.col("okey"), F.col("part").alias("src"))
    b = items.select(F.col("okey"), F.col("part").alias("dst"))
    support = (
        a.join(b, "okey")
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("s"))
    )
    edges = support.select(
        "src",
        "dst",
        F.ceil(F.lit(100.0) / F.col("s")).cast("long").alias("w"),
    ).cache()
    seed = spark.range(1).select(F.lit(_SSSP_SRC).cast("long").alias("node"))
    return bellman_ford(edges, seed, rounds=_SSSP_ROUNDS)


_ER_MAX_DIST = 4


# Entity resolution end-to-end: blocked Levenshtein candidate pairs
# (the similar_part_names shape) collapsed into canonical entity
# clusters by connected components — (a,b),(b,c) must land in ONE
# entity even when a,c were never compared. Node ids are min-partkey
# per name (integers, so the CC small-residue union-find fast path
# applies); the oracle closes the same edge set with a recursive CTE.
@query(
    "fuzzy_entity_clusters",
    oracle=f"""
    WITH RECURSIVE n AS (
      SELECT p_name, CAST(min(p_partkey) AS BIGINT) AS nid
      FROM part GROUP BY p_name
    ),
    b AS (SELECT p_name, nid, string_split(p_name, ' ')[-1] AS blk FROM n),
    pairs AS MATERIALIZED (
      SELECT a.nid AS id_a, c.nid AS id_b
      FROM b a JOIN b c ON a.blk = c.blk AND a.p_name < c.p_name
      WHERE levenshtein(a.p_name, c.p_name) <= {_ER_MAX_DIST}
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b, id_a FROM pairs
    ),
    walk AS (
      SELECT nid AS id, nid AS label FROM n
      UNION
      SELECT e.dst AS id, w.label FROM walk w JOIN edges e ON e.src = w.id
    )
    SELECT n.p_name AS name, CAST(min(w.label) AS BIGINT) AS cluster_id
    FROM n JOIN walk w ON w.id = n.nid
    GROUP BY n.p_name
    """,
)
def fuzzy_entity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import connected_components

    part = load(spark, sf_dir, "part")
    n = part.groupBy("p_name").agg(
        F.min("p_partkey").cast("long").alias("nid")
    ).cache()
    blk = F.element_at(F.split(F.col("p_name"), " "), -1)
    a = n.select(F.col("p_name").alias("na"), F.col("nid").alias("id_a"), blk.alias("blk"))
    c = n.select(F.col("p_name").alias("nb"), F.col("nid").alias("id_b"), blk.alias("blk"))
    pairs = (
        a.join(c, "blk")
        .filter(F.col("na") < F.col("nb"))
        .filter(F.levenshtein(F.col("na"), F.col("nb")) <= _ER_MAX_DIST)
        .select("id_a", "id_b")
    )
    cc = connected_components(pairs, n.select("nid"), id_col="nid")
    return n.join(cc, "nid").select(
        F.col("p_name").alias("name"), "cluster_id"
    )
