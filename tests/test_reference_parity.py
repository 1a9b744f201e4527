"""Reference-query parity: run the semantics of the reference's DuckDB
views (create_enhanced_views.py:60-107 — latest-per-station, filtered
views, record-type distribution, ordered main view) in ACTUAL DuckDB
over the enhanced parquet our pipeline wrote, and require our Spark
views to return identical results. SQL below is written from the
SURVEY §2 semantics (W1/P9/O1/A2), not copied.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from bike_data_flow_spark.operators.enhance import enhance, read_enhanced, write_enhanced
from bike_data_flow_spark.operators.parse import read_raw_partition
from bike_data_flow_spark.operators.views import create_views, latest_per_station


@pytest.fixture()
def enhanced_zone(spark, landing, tmp_path):
    out = tmp_path / "enhanced"
    for dt in ("2025-05-01", "2025-05-02"):
        write_enhanced(
            enhance(read_raw_partition(spark, str(landing), dt), dt),
            str(out),
            partition_date=dt,
        )
    return out


def _duck(enhanced_zone):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW enhanced AS SELECT * FROM "
        f"read_parquet('{enhanced_zone}/dt=*/*.parquet', hive_partitioning=true)"
    )
    return con


def test_latest_view_matches_duckdb(spark, enhanced_zone):
    df = read_enhanced(spark, str(enhanced_zone))
    got = {
        (r["station_id"], r["bikes"], str(r["file_timestamp"]))
        for r in latest_per_station(df).collect()
    }
    con = _duck(enhanced_zone)
    want = {
        (r[0], r[1], str(r[2]))
        for r in con.execute(
            """
            SELECT station_id, bikes, file_timestamp FROM (
              SELECT *, row_number() OVER (PARTITION BY station_id
                        ORDER BY date DESC, file_timestamp DESC) AS rn
              FROM enhanced WHERE record_type = 'station'
            ) WHERE rn = 1
            """
        ).fetchall()
    }
    assert got == want


def test_distribution_and_filtered_views_match_duckdb(spark, enhanced_zone):
    df = read_enhanced(spark, str(enhanced_zone))
    create_views(spark, df)
    con = _duck(enhanced_zone)
    want = dict(
        con.execute(
            "SELECT record_type, count(*) FROM enhanced GROUP BY record_type"
        ).fetchall()
    )
    got = {
        r["record_type"]: r["cnt"]
        for r in spark.sql(
            "SELECT record_type, count(*) AS cnt FROM wrm_stations_all GROUP BY record_type"
        ).collect()
    }
    assert got == want
    assert (
        spark.table("wrm_bikes_only").count()
        == con.execute("SELECT count(*) FROM enhanced WHERE record_type='bike'").fetchone()[0]
    )


def test_ordered_main_view_matches_duckdb(spark, enhanced_zone):
    df = read_enhanced(spark, str(enhanced_zone))
    got = [
        (r["station_id"], str(r["date"]), str(r["file_timestamp"]))
        for r in df.orderBy(
            F.desc("date"), F.desc("file_timestamp"), F.asc("station_id")
        ).collect()
    ]
    con = _duck(enhanced_zone)
    want = [
        (r[0], str(r[1]), str(r[2]))
        for r in con.execute(
            """
            SELECT station_id, date, file_timestamp FROM enhanced
            ORDER BY date DESC, file_timestamp DESC, station_id
            """
        ).fetchall()
    ]
    assert got == want
