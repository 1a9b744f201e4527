"""Unit fixtures for the gaps-and-islands streak and interval
sweep-line queries (queries/relational11.py) — hand-computed expected
values on tiny frames, independent of the oracle gate."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _streaks(spark, rows):
    """Inline copy of the islands pipeline over (user_id, d) rows."""
    days = spark.createDataFrame(rows, "user_id long, d date").distinct()
    w = Window.partitionBy("user_id").orderBy(F.asc("d"))
    runs = days.withColumn("anchor", F.date_sub(F.col("d"), F.row_number().over(w)))
    islands = runs.groupBy("user_id", "anchor").agg(F.count(F.lit(1)).alias("streak"))
    return {
        r["user_id"]: (r["longest"], r["total"], r["n"])
        for r in islands.groupBy("user_id")
        .agg(
            F.max("streak").alias("longest"),
            F.sum("streak").alias("total"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }


def test_streaks_islands(spark):
    d = dt.date
    rows = [
        # user 1: 3-day run, gap, 2-day run
        (1, d(2024, 1, 1)),
        (1, d(2024, 1, 2)),
        (1, d(2024, 1, 3)),
        (1, d(2024, 1, 10)),
        (1, d(2024, 1, 11)),
        # user 2: isolated days only
        (2, d(2024, 1, 1)),
        (2, d(2024, 1, 5)),
        # duplicate activity on one day must not inflate the streak
        (1, d(2024, 1, 2)),
    ]
    out = _streaks(spark, rows)
    assert out[1] == (3, 5, 2)
    assert out[2] == (1, 2, 2)


def test_sweep_line_concurrency(spark):
    d = dt.date
    # intervals [start, end): a=[1,4) b=[2,3) c=[2,6) -> peak 3 on day 2
    iv = spark.createDataFrame(
        [
            (d(2024, 1, 1), d(2024, 1, 4)),
            (d(2024, 1, 2), d(2024, 1, 3)),
            (d(2024, 1, 2), d(2024, 1, 6)),
        ],
        "s date, e date",
    )
    bounds = iv.select(F.col("s").alias("d"), F.lit(1).alias("delta")).unionAll(
        iv.select(F.col("e").alias("d"), F.lit(-1).alias("delta"))
    )
    daily = bounds.groupBy("d").agg(F.sum("delta").alias("net"))
    w = Window.orderBy(F.asc("d")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    run = {
        r["d"]: r["c"]
        for r in daily.withColumn("c", F.sum("net").over(w)).collect()
    }
    assert run[d(2024, 1, 2)] == 3  # a+b+c in flight
    assert run[d(2024, 1, 3)] == 2  # b closed (half-open)
    assert run[d(2024, 1, 4)] == 1  # a closed
    assert run[d(2024, 1, 6)] == 0  # all closed


def test_registry_rows(spark):
    from bike_data_flow_spark import queries

    queries.load_all()
    sf = "/root/testdata/sf0.001"
    peak = queries.REGISTRY["in_flight_lineitems_peak"].fn(spark, sf).collect()
    assert len(peak) == 10
    # peak ordering: non-increasing in_flight
    vals = [r["in_flight"] for r in peak]
    assert vals == sorted(vals, reverse=True)
    streaks = queries.REGISTRY["user_activity_streaks"].fn(spark, sf)
    row = streaks.filter(F.col("longest_streak") > 0).limit(1).collect()
    assert row and row[0]["n_active_days"] >= row[0]["longest_streak"]


def test_bellman_ford_known_graph(spark):
    from bike_data_flow_spark.operators.graph import bellman_ford
    from pyspark.sql import functions as F

    # 0 -1-> 1 -1-> 2 ; 0 -5-> 2 : cheapest 0->2 is 2 via two hops
    edges = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 1), (0, 2, 5)], "src long, dst long, w long"
    )
    seed = spark.range(1).select(F.lit(0).cast("long").alias("node"))
    got = {r["node"]: r["cost"] for r in bellman_ford(edges, seed, rounds=3).collect()}
    assert got == {0: 0, 1: 1, 2: 2}
    # one round only: the 2-hop path is not yet relaxed
    got1 = {r["node"]: r["cost"] for r in bellman_ford(edges, seed, rounds=1).collect()}
    assert got1[2] == 5


def test_fuzzy_clusters_transitive(spark):
    """(a,b) and (b,c) within distance but (a,c) beyond it must still
    share one cluster."""
    from pyspark.sql import functions as F
    from bike_data_flow_spark.operators.dedup import connected_components

    names = spark.createDataFrame(
        [("aaaa x", 1), ("aaab x", 2), ("aabb x", 3), ("zzzz x", 9)],
        "p_name string, nid long",
    )
    blk = F.element_at(F.split(F.col("p_name"), " "), -1)
    a = names.select(F.col("p_name").alias("na"), F.col("nid").alias("id_a"), blk.alias("blk"))
    c = names.select(F.col("p_name").alias("nb"), F.col("nid").alias("id_b"), blk.alias("blk"))
    pairs = (
        a.join(c, "blk")
        .filter(F.col("na") < F.col("nb"))
        .filter(F.levenshtein(F.col("na"), F.col("nb")) <= 2)
        .select("id_a", "id_b")
    )
    cc = {
        r["nid"]: r["cluster_id"]
        for r in connected_components(pairs, names.select("nid"), id_col="nid").collect()
    }
    assert cc[1] == cc[2] == cc[3] == 1  # chain collapses to min id
    assert cc[9] == 9  # singleton stays its own entity
