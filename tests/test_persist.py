from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from bike_data_flow_spark.operators.persist import (
    iceberg_available,
    normalize_timestamps,
    read_table,
    with_station_capacity,
    write_table,
)


def test_write_table_parquet_fallback(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", "2025-05-01", 1), ("b", "2025-05-02", 2)], ["k", "dt", "v"]
    )
    assert not iceberg_available(spark)
    kind = write_table(df, "t1", "dt", str(tmp_path))
    assert kind == "parquet"
    back = spark.read.parquet(str(tmp_path / "t1"))
    assert back.count() == 2
    assert {str(r["dt"]) for r in back.select("dt").collect()} == {
        "2025-05-01",
        "2025-05-02",
    }


def test_normalize_ns_columns(spark):
    df = spark.createDataFrame([(1, 1704067798778549000)], ["id", "ts_ns"])
    out = normalize_timestamps(df)
    assert "ts_ns" not in out.columns and "ts" in out.columns
    assert out.collect()[0]["ts"] == datetime(2024, 1, 1, 0, 9, 58, 778549)


def test_schema_evolution_roundtrip_with_ns_cast(spark, tmp_path):
    """Mirrors iceberg_assets.py:96-139 on the parquet fallback: daily
    partitions written before a column existed read back with NULLs,
    and ns-precision longs land as µs timestamps (Iceberg compat)."""
    day1 = spark.createDataFrame(
        [("s1", "2025-05-01", 1704067798778549123)], ["k", "dt", "ts_ns"]
    )
    write_table(day1, "evo", "dt", str(tmp_path))

    # later partition gains a column (schema evolution)
    day2 = spark.createDataFrame(
        [("s2", "2025-05-02", 1704154198000000999, 87)],
        ["k", "dt", "ts_ns", "battery_level"],
    )
    write_table(day2, "evo", "dt", str(tmp_path))

    back = read_table(spark, "evo", str(tmp_path))
    assert set(back.columns) == {"k", "dt", "ts", "battery_level"}
    rows = {r["k"]: r for r in back.collect()}
    assert len(rows) == 2  # dynamic overwrite kept day1's partition
    # ns → µs: sub-µs digits truncated, not rounded/overflowed
    assert rows["s1"]["ts"] == datetime(2024, 1, 1, 0, 9, 58, 778549)
    assert rows["s2"]["ts"] == datetime(2024, 1, 2, 0, 9, 58, 0)
    assert rows["s1"]["battery_level"] is None  # evolved column backfills NULL
    assert rows["s2"]["battery_level"] == 87


def test_station_capacity_division_edge(spark):
    df = spark.createDataFrame(
        [(1, 5, 15), (2, 0, 0)], ["station_id", "available_bikes", "available_docks"]
    )
    out = {r["station_id"]: r for r in with_station_capacity(df).collect()}
    assert out[1]["total_capacity"] == 20 and out[1]["utilization_rate"] == 0.25
    assert out[2]["utilization_rate"] is None  # both-zero edge → NULL
