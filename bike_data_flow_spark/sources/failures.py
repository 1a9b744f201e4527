"""Failures CSV source (S10/S14) + the demo equi-join to stations.

Reference: storage/wrm_data/failures/{fetch,read}.py — a one-shot CSV
download read back with pandas, folder-loop variant included. In Spark
the whole folder loop is one `spark.read.csv(dir)` call; the join to
stations (by name) is the natural broadcast equi-join the reference
stores data for but never executes (SURVEY §2.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DateType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# FIXTURES.md §5 synthetic stand-in schema.
FAILURES_SCHEMA = StructType(
    [
        StructField("report_id", LongType(), False),
        StructField("bike_number", StringType(), True),
        StructField("station_name", StringType(), True),
        StructField("report_date", DateType(), True),
        StructField("failure_type", StringType(), True),
        StructField("description", StringType(), True),
    ]
)


def read_failures(spark: SparkSession, path: str) -> DataFrame:
    """CSV scan with an explicit schema — no inference job, columns prune
    at the scan (one call covers a whole folder of daily files)."""
    return spark.read.csv(path, header=True, schema=FAILURES_SCHEMA)


def failures_per_station(failures: DataFrame, latest_stations: DataFrame) -> DataFrame:
    """Failure counts joined onto current station state by name.

    Stations-latest is one row per station → broadcast; the failures
    fact streams through map-side. Null-safe on station_name (unmatched
    reports are kept under a NULL station via left join from failures).
    """
    counts = failures.groupBy("station_name", "failure_type").agg(
        F.count(F.lit(1)).alias("n_reports")
    )
    dim = F.broadcast(
        latest_stations.select("station_id", F.col("name").alias("station_name"), "bikes", "total_docks")
    )
    return counts.join(dim, "station_name", "left")
