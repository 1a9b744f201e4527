"""Python Data Source connector (sources/station_feed.py): batch scan
partitioned per file, dt= filter pushdown pruning the listing, stream
reader draining the landing zone incrementally, and parse-pipeline
compatibility."""

from __future__ import annotations

import pyspark.sql.functions as F

from bike_data_flow_spark.operators.parse import parse_raw_lines, read_raw_partition
from bike_data_flow_spark.sources.station_feed import (
    StationFeedReader,
    register,
)
from tests.conftest import GOOD_ROWS, write_raw_file


def _landing(tmp_path):
    root = tmp_path / "raw"
    write_raw_file(root, "2025-05-01", "2025-05-01_10-00-00", GOOD_ROWS)
    write_raw_file(root, "2025-05-01", "2025-05-01_10-05-00", GOOD_ROWS[:2])
    write_raw_file(root, "2025-05-02", "2025-05-02_10-00-00", GOOD_ROWS[:1])
    return root


def test_batch_scan_reads_all_files(spark, tmp_path):
    root = _landing(tmp_path)
    register(spark)
    df = spark.read.format("station_feed").option("path", str(root)).load()
    assert df.columns == ["value", "src_file", "dt"]
    # 3 headers + 3+2+1 data rows
    assert df.count() == 9
    assert df.select("src_file").distinct().count() == 3


def test_dt_filter_prunes_listing(spark, tmp_path):
    root = _landing(tmp_path)
    register(spark)
    df = (
        spark.read.format("station_feed")
        .option("path", str(root))
        .load()
        .filter(F.col("dt") == "2025-05-02")
    )
    assert df.count() == 2  # header + 1 data row
    # pushdown actually prunes partitions (not just post-filters rows)
    reader = StationFeedReader({"path": str(root)})
    from pyspark.sql.datasource import EqualTo

    leftover = list(reader.pushFilters([EqualTo(("dt",), "2025-05-02")]))
    assert leftover == []
    assert len(reader.partitions()) == 1


def test_dt_in_filter_pushdown(spark, tmp_path):
    """Regression for the In-filter field fix (f.values -> f.value):
    any `dt IN (...)` query used to raise AttributeError inside
    pushFilters. Assert both the query result and the actual pruning."""
    root = _landing(tmp_path)
    write_raw_file(root, "2025-05-03", "2025-05-03_10-00-00", GOOD_ROWS[:1])
    register(spark)
    df = (
        spark.read.format("station_feed")
        .option("path", str(root))
        .load()
        .filter(F.col("dt").isin("2025-05-02", "2025-05-03"))
    )
    assert sorted(r["dt"] for r in df.select("dt").distinct().collect()) == [
        "2025-05-02",
        "2025-05-03",
    ]
    assert df.count() == 4  # (header + 1 row) per matched dt
    reader = StationFeedReader({"path": str(root)})
    from pyspark.sql.datasource import In

    leftover = list(
        reader.pushFilters([In(("dt",), ("2025-05-02", "2025-05-03"))])
    )
    assert leftover == []  # fully absorbed by the source
    assert len(reader.partitions()) == 2  # listing pruned, not post-filtered


def test_stream_reader_drains_incrementally(spark, tmp_path):
    root = _landing(tmp_path)
    register(spark)
    q = (
        spark.readStream.format("station_feed")
        .option("path", str(root))
        .load()
        .groupBy("dt")
        .count()
        .writeStream.format("memory")
        .queryName("station_feed_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["dt"]: r["count"] for r in spark.sql(
        "SELECT * FROM station_feed_counts"
    ).collect()}
    assert got == {"2025-05-01": 7, "2025-05-02": 2}


def test_connector_rows_match_native_scan_through_parser(spark, tmp_path):
    root = _landing(tmp_path)
    register(spark)
    via_connector = parse_raw_lines(
        spark.read.format("station_feed").option("path", str(root)).load()
    )
    # read_raw_partition = native text scan + the same parser; no-dt
    # mode scans the whole dt= tree natively (the old workaround of
    # embedding /dt=* in the landing path would now double the glob)
    via_text_scan = read_raw_partition(spark, str(root))
    a = sorted(via_connector.select("station_id", "bikes").collect())
    b = sorted(via_text_scan.select("station_id", "bikes").collect())
    assert a == b and len(a) == 6
