"""Classification (enhanced_all.py:54-68) + validation (P13) contracts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bike_data_flow_spark.operators.enhance import enhance, record_type
from bike_data_flow_spark.operators.parse import read_raw_partition
from bike_data_flow_spark.operators.quality import (
    SchemaValidationError,
    validate,
)
from bike_data_flow_spark.schemas import ENHANCED_SCHEMA, PROCESSED_SCHEMA


def test_record_type_classification(spark):
    df = spark.createDataFrame(
        [
            ("001", "Station 1"),  # digits + non-BIKE → station
            ("fb10001", "BIKE 64731"),  # fb + BIKE → bike
            ("fb10002", "Station X"),  # fb + non-BIKE → unknown
            ("007", "BIKE 1"),  # digits + BIKE → unknown
            ("x9", "whatever"),  # neither → unknown
        ],
        ["station_id", "name"],
    )
    got = {
        r["station_id"]: r["rt"]
        for r in df.select(
            "station_id", record_type(F.col("station_id"), F.col("name")).alias("rt")
        ).collect()
    }
    assert got == {
        "001": "station",
        "fb10001": "bike",
        "fb10002": "unknown",
        "007": "unknown",
        "x9": "unknown",
    }


def test_enhance_produces_pinned_column_order(spark, landing):
    processed = read_raw_partition(spark, str(landing), "2025-05-01")
    enhanced = enhance(processed, "2025-05-01")
    assert enhanced.columns == [f.name for f in ENHANCED_SCHEMA.fields]
    # The reference's literal 20-column order (enhanced_all.py:77-84):
    # record_type sits at position 16, between pedelecs and s3_source_key.
    assert enhanced.columns == [
        "station_id", "name", "timestamp", "gmt_local_diff_sec",
        "gmt_servertime_diff_sec", "lat", "lon", "bikes", "spaces",
        "installed", "locked", "temporary", "total_docks",
        "givesbonus_acceptspedelecs_fbbattlevel", "pedelecs", "record_type",
        "s3_source_key", "file_timestamp", "date", "processed_at",
    ]
    r = enhanced.filter(F.col("station_id") == "fb10001").collect()[0]
    assert r["record_type"] == "bike"
    assert r["date"].strftime("%Y-%m-%d") == "2025-05-01"


def test_validate_passes_clean_data(spark, landing):
    processed = read_raw_partition(spark, str(landing), "2025-05-01")
    report = validate(processed, PROCESSED_SCHEMA)
    assert report.ok


def test_validate_collects_constraint_failures(spark, landing):
    processed = read_raw_partition(spark, str(landing), "2025-05-01")
    bad = processed.withColumn(
        "bikes", F.when(F.col("station_id") == "001", F.lit(-5)).otherwise(F.col("bikes"))
    ).withColumn(
        "total_docks", F.lit(0).cast("long")
    )
    with pytest.raises(SchemaValidationError) as exc:
        validate(bad, PROCESSED_SCHEMA)
    msgs = "\n".join(exc.value.failures)
    assert "bikes ge 0: 2" in msgs  # station 001 appears in both files
    assert "total_docks ge 1" in msgs


def test_validate_detects_type_mismatch_not_casts(spark, landing):
    processed = read_raw_partition(spark, str(landing), "2025-05-01")
    wrong = processed.withColumn("bikes", F.col("bikes").cast("string"))
    with pytest.raises(SchemaValidationError) as exc:
        validate(wrong, PROCESSED_SCHEMA)
    assert any("type string != expected bigint" in m for m in exc.value.failures)


def test_validate_detects_column_order(spark, landing):
    processed = read_raw_partition(spark, str(landing), "2025-05-01")
    shuffled = processed.select(*reversed(processed.columns))
    with pytest.raises(SchemaValidationError) as exc:
        validate(shuffled, PROCESSED_SCHEMA)
    assert any("column order" in m for m in exc.value.failures)


def test_observed_validation_piggybacks_on_write(spark, landing, tmp_path):
    from bike_data_flow_spark.operators.quality import (
        observed_validation,
        raise_on_violations,
    )

    processed = read_raw_partition(spark, str(landing), "2025-05-01")
    bad = processed.withColumn(
        "bikes", F.when(F.col("station_id") == "001", -5).otherwise(F.col("bikes"))
    )
    out, obs = observed_validation(bad, PROCESSED_SCHEMA)
    # ONE job: the parquet write; the constraint counters ride along.
    out.write.mode("overwrite").parquet(str(tmp_path / "observed_out"))
    metrics = obs.get
    assert metrics["check__bikes__ge"] == 2  # station 001 is in both files
    assert sum(v for k, v in metrics.items() if k != "check__bikes__ge") == 0
    try:
        raise_on_violations(metrics)
        raised = False
    except SchemaValidationError:
        raised = True
    assert raised


def test_enhance_all_matches_per_dt_loop(spark, landing):
    """The single-scan backfill (enhance_all deriving date from the dt=
    path) produces exactly the rows of the per-day enhance loop."""
    from bike_data_flow_spark.operators.enhance import enhance, enhance_all

    dts = ["2025-05-01", "2025-05-02"]
    parts = [
        enhance(read_raw_partition(spark, str(landing), dt), dt) for dt in dts
    ]
    looped = parts[0].unionByName(parts[1])
    single = enhance_all(read_raw_partition(spark, str(landing)))
    cols = [c for c in single.columns if c != "processed_at"]  # wall clock
    a = sorted(map(tuple, looped.select(*cols).collect()))
    b = sorted(map(tuple, single.select(*cols).collect()))
    assert a == b and len(a) > 0
