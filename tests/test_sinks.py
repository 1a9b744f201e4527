"""S11 sink coverage: CSV / JSON-lines / text round-trips with the
enhanced table (the reference's IO-manager format dispatch,
resources.py:226-258, is spark's format() parameter)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bike_data_flow_spark.operators.enhance import enhance
from bike_data_flow_spark.operators.parse import read_raw_partition


def _enhanced(spark, landing):
    return enhance(read_raw_partition(spark, str(landing), "2025-05-01"), "2025-05-01")


def test_csv_round_trip(spark, landing, tmp_path):
    df = _enhanced(spark, landing).select(
        "station_id", "name", "bikes", "spaces", "record_type"
    )
    out = tmp_path / "csv_out"
    df.write.csv(str(out), header=True)
    back = spark.read.csv(str(out), header=True, inferSchema=True)
    assert back.count() == df.count()
    assert {r["station_id"] for r in back.collect()} == {
        r["station_id"] for r in df.collect()
    }


def test_jsonlines_round_trip(spark, landing, tmp_path):
    df = _enhanced(spark, landing).select("station_id", "bikes", "installed", "lat")
    out = tmp_path / "json_out"
    df.write.json(str(out))
    back = spark.read.json(str(out))
    rows = {r["station_id"]: r for r in back.collect()}
    orig = {r["station_id"]: r for r in df.collect()}
    assert rows.keys() == orig.keys()
    for k in rows:
        assert rows[k]["bikes"] == orig[k]["bikes"]
        assert rows[k]["installed"] == orig[k]["installed"]


def test_orc_round_trip_preserves_schema(spark, landing, tmp_path):
    """ORC is the other columnar format Spark ships natively; the
    enhanced table must round-trip with types intact (timestamps,
    booleans, doubles — the ones CSV would flatten)."""
    df = _enhanced(spark, landing)
    out = tmp_path / "orc_out"
    df.write.orc(str(out))
    back = spark.read.orc(str(out))
    # formats don't persist non-null constraints: compare names + types
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in df.schema.fields
    ]
    assert back.count() == df.count()
    a = {r["station_id"]: r for r in back.collect()}
    b = {r["station_id"]: r for r in df.collect()}
    for k in b:
        assert a[k]["timestamp"] == b[k]["timestamp"]
        assert a[k]["installed"] == b[k]["installed"]
        assert a[k]["lat"] == b[k]["lat"]


def test_text_sink_single_column(spark, landing, tmp_path):
    df = _enhanced(spark, landing).select(
        F.concat_ws("|", "station_id", "record_type").alias("value")
    )
    out = tmp_path / "text_out"
    df.write.text(str(out))
    back = spark.read.text(str(out))
    assert {r["value"] for r in back.collect()} == {r["value"] for r in df.collect()}
