"""Parser contracts pinned by the reference's test_processed.py
(row drops, typing, composite split, filename-timestamp lineage)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from bike_data_flow_spark.operators.parse import read_raw_partition
from bike_data_flow_spark.schemas import PROCESSED_SCHEMA

from tests.conftest import BAD_NUMERIC, GOOD_ROWS, write_raw_file


def test_good_rows_parse_with_types(spark, landing):
    df = read_raw_partition(spark, str(landing), "2025-05-01")
    assert df.columns == [f.name for f in PROCESSED_SCHEMA.fields]
    rows = {r["station_id"]: r for r in df.collect()}
    s1 = rows["001"]
    assert s1["name"] == "Station 1"
    assert s1["lat"] == 51.1089 and s1["lon"] == 17.0377
    assert s1["bikes"] == 5 and s1["total_docks"] == 15
    assert s1["installed"] is True and s1["locked"] is False
    assert s1["gmt_local_diff_sec"] == 3600
    assert s1["gmt_servertime_diff_sec"] == -3600
    # epoch 1705147845.123 → fractional seconds preserved (µs)
    assert s1["timestamp"] == datetime(2024, 1, 13, 12, 10, 45, 123000)


def test_malformed_rows_dropped_not_failed(spark, landing):
    # file 2 of dt=2025-05-01 has 1 good + composite-bad + short + empty-flag
    df = read_raw_partition(spark, str(landing), "2025-05-01")
    per_file = (
        df.groupBy("s3_source_key").count().orderBy("s3_source_key").collect()
    )
    counts = [r["count"] for r in per_file]
    assert counts == [3, 2]  # 3 good; (1 good + empty-flag row), 2 dropped


def test_empty_pedelec_flag_maps_false(spark, landing):
    df = read_raw_partition(spark, str(landing), "2025-05-01")
    r = df.filter(F.col("station_id") == "006").collect()[0]
    assert r["givesbonus_acceptspedelecs_fbbattlevel"] is False
    assert r["installed"] is True  # 'True' mixed case accepted


def test_bad_numeric_row_dropped(spark, tmp_path):
    root = tmp_path / "raw"
    write_raw_file(root, "2025-06-01", "2025-06-01_08-00-00", GOOD_ROWS + [BAD_NUMERIC])
    df = read_raw_partition(spark, str(root), "2025-06-01")
    assert df.count() == 3
    assert "005" not in {r["station_id"] for r in df.collect()}


def test_filename_timestamp_extraction(spark, landing):
    df = read_raw_partition(spark, str(landing), "2025-05-02")
    fts = {r["file_timestamp"] for r in df.collect()}
    assert fts == {datetime(2025, 5, 2, 9, 0, 0)}


def test_mtime_fallback_when_filename_unparseable(spark, tmp_path):
    root = tmp_path / "raw"
    d = root / "dt=2025-06-02"
    d.mkdir(parents=True)
    p = d / "oddly_named.txt"
    from tests.conftest import HEADER

    p.write_text("\n".join([HEADER] + GOOD_ROWS) + "\n")
    df = read_raw_partition(spark, str(root), "2025-06-02")
    fts = [r["file_timestamp"] for r in df.collect()]
    assert all(ft is not None for ft in fts)  # fell back to mtime


def test_missing_partition_raises_filenotfound(spark, landing):
    import pytest

    from bike_data_flow_spark.operators.parse import process_partition

    with pytest.raises(FileNotFoundError):
        process_partition(spark, str(landing), "1999-01-01")


def test_all_corrupt_partition_raises_valueerror(spark, tmp_path):
    import pytest

    from bike_data_flow_spark.operators.parse import process_partition
    from tests.conftest import MALFORMED_COMPOSITE, SHORT_ROW

    root = tmp_path / "raw"
    write_raw_file(root, "2025-07-01", "2025-07-01_08-00-00", [MALFORMED_COMPOSITE, SHORT_ROW])
    with pytest.raises(ValueError, match="No valid data found"):
        process_partition(spark, str(root), "2025-07-01")


def test_header_only_file_contributes_nothing(spark, tmp_path):
    import pytest

    from bike_data_flow_spark.operators.parse import process_partition

    root = tmp_path / "raw"
    write_raw_file(root, "2025-07-02", "2025-07-02_08-00-00", [])
    with pytest.raises(ValueError):
        process_partition(spark, str(root), "2025-07-02")
    # but a good file alongside rescues the partition
    write_raw_file(root, "2025-07-02", "2025-07-02_09-00-00", GOOD_ROWS)
    assert process_partition(spark, str(root), "2025-07-02").count() == 3


def test_all_files_of_partition_unioned(spark, landing):
    df = read_raw_partition(spark, str(landing), "2025-05-01")
    assert df.select("s3_source_key").distinct().count() == 2
