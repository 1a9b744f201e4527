"""Views (W1, P9) + analytics (grid density, daily summaries) contracts,
including the bin-arithmetic grid vs a brute-force per-cell oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from bike_data_flow_spark.operators.analytics import (
    bounding_box,
    daily_bike_summary,
    daily_station_summary,
    grid_density,
    make_grid,
    record_type_distribution,
    station_summary,
    top_density_cells,
)
from bike_data_flow_spark.operators.enhance import enhance
from bike_data_flow_spark.operators.parse import read_raw_partition
from bike_data_flow_spark.operators.views import create_views, latest_per_station


def _enhanced(spark, landing):
    d1 = enhance(read_raw_partition(spark, str(landing), "2025-05-01"), "2025-05-01")
    d2 = enhance(read_raw_partition(spark, str(landing), "2025-05-02"), "2025-05-02")
    return d1.unionByName(d2)


def test_latest_per_station_one_row_per_key(spark, landing):
    enhanced = _enhanced(spark, landing)
    latest = latest_per_station(enhanced)
    per_key = latest.groupBy("station_id").count().collect()
    assert all(r["count"] == 1 for r in per_key)
    # station 002 appears on both days → latest must be the 05-02 snapshot
    r = latest.filter(F.col("station_id") == "002").collect()[0]
    assert r["date"].strftime("%Y-%m-%d") == "2025-05-02"


def test_views_registered_and_filtered(spark, landing):
    enhanced = _enhanced(spark, landing)
    create_views(spark, enhanced)
    assert spark.table("wrm_bikes_only").filter(F.col("record_type") != "bike").count() == 0
    assert spark.table("wrm_stations_only").filter(
        F.col("record_type") != "station"
    ).count() == 0
    total = spark.table("wrm_stations_all").count()
    assert total == enhanced.count()


def test_record_type_distribution(spark, landing):
    enhanced = _enhanced(spark, landing)
    dist = {r["record_type"]: r["cnt"] for r in record_type_distribution(enhanced).collect()}
    assert dist["bike"] == 2  # fb10001 on both days... (d1 file1+file2=1? check by data)
    assert sum(dist.values()) == enhanced.count()


def test_station_summary_shape(spark, landing):
    enhanced = _enhanced(spark, landing)
    s = station_summary(enhanced, top_n=3)
    assert s["total_records"] == enhanced.count()
    assert len(s["latest_sample"]) == 3


def test_grid_density_matches_bruteforce(spark, landing):
    enhanced = _enhanced(spark, landing)
    stations = enhanced.collect()
    bounds = bounding_box(enhanced).collect()[0].asDict()
    grid = make_grid(bounds, target_cells=16)
    got = {
        (r["bin_lat"], r["bin_lon"]): (r["bike_count"], r["station_records"], r["bike_records"])
        for r in grid_density(enhanced, grid).collect()
    }
    # brute force: assign each point to a cell the O(cells×N) way
    import collections

    side = grid.n_cells_side
    exp = collections.defaultdict(lambda: [0, 0, 0])
    for r in stations:
        if r["lat"] is None or r["lon"] is None:
            continue
        bl = min(int((r["lat"] - grid.min_lat) / grid.lat_delta), side - 1)
        bo = min(int((r["lon"] - grid.min_lon) / grid.lon_delta), side - 1)
        exp[(bl, bo)][0] += r["bikes"]
        exp[(bl, bo)][1] += r["record_type"] == "station"
        exp[(bl, bo)][2] += r["record_type"] == "bike"
    assert got == {k: tuple(v) for k, v in exp.items()}
    top = top_density_cells(grid_density(enhanced, grid), k=2).collect()
    assert len(top) == 2
    assert top[0]["bike_count"] >= top[1]["bike_count"]


def test_daily_summaries_deterministic_first_last(spark, landing):
    enhanced = _enhanced(spark, landing)
    stations = enhanced.filter(F.col("record_type") == "station")
    summ = daily_station_summary(stations)
    r = {x["station_id"]: x for x in summ.collect()}
    # station 001 appears twice on 05-01 (both files), bikes=5 both times
    assert r["001"]["bikes_mean"] == 5.0 and r["001"]["total_docks_first"] == 15
    assert r["001"]["installed_fraction"] == 1.0
    bikes = enhanced.filter(F.col("record_type") == "bike")
    bs = daily_bike_summary(bikes).collect()
    assert all(x["lat_first"] is not None and x["lon_last"] is not None for x in bs)


def test_skyline_2d_partition_invariant_and_exact(spark):
    """The two-stage skyline must (a) equal brute-force dominance on a
    tie-heavy input and (b) return identical rows under any partition
    layout (the distributive-merge property it relies on)."""
    import random

    from bike_data_flow_spark.operators.analytics import skyline_2d

    random.seed(7)
    rows = [
        (i, float(random.randint(0, 6)), random.randint(0, 6))
        for i in range(200)
    ]
    brute = {
        (k, x, y)
        for k, x, y in rows
        if not any(
            x2 >= x and y2 >= y and (x2 > x or y2 > y)
            for k2, x2, y2 in rows
            if k2 != k
        )
    }
    df = spark.createDataFrame(rows, "k long, x double, y long")
    for parts in (1, 3, 17):
        got = {
            (r["k"], r["x"], r["y"])
            for r in skyline_2d(df.repartition(parts), "x", "y").collect()
        }
        assert got == brute, parts
