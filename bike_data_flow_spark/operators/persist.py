"""Table persistence (S13): Iceberg when a catalog is configured,
partitioned-parquet table fallback otherwise.

Reference: assets/iceberg_assets.py:11-49 — pandas frames written
through an Iceberg IO manager with `partition_expr`, with an ns→µs
timestamp cast for Iceberg compatibility. Spark-first: `df.writeTo(...)
.using("iceberg").partitionedBy(...)`. This container ships no Iceberg
runtime jar, so `write_table` probes the catalog and falls back to a
plain partitioned parquet table with identical layout + semantics
(dynamic partition overwrite); the Iceberg path is the same two lines
either way.

Also provides the FIXTURES.md §6 derived-column logic
(sample_iceberg_asset.py:88-91): utilization_rate with the
divide-by-zero edge handled explicitly (NULL, not NaN/error).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession, catalog: str = "iceberg") -> bool:
    try:
        impl = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
    except Exception:  # pragma: no cover - conf access never raises in practice
        impl = None
    return impl is not None


def normalize_timestamps(df: DataFrame) -> DataFrame:
    """ns→µs normalization (iceberg_assets.py:40-42): Spark TimestampType
    is already µs, so only long ns columns (e.g. events.ts_ns) need
    converting if present."""
    out = df
    for f in df.schema.fields:
        if f.name.endswith("_ns") and f.dataType.simpleString() == "bigint":
            out = out.withColumn(
                f.name[:-3], F.expr(f"timestamp_micros({f.name} div 1000)")
            ).drop(f.name)
    return out


def write_table(
    df: DataFrame,
    name: str,
    partition_col: str,
    path: str,
    spark: SparkSession | None = None,
    catalog: str = "iceberg",
) -> str:
    """Persist df as a partitioned table; returns 'iceberg' or 'parquet'
    describing the path taken."""
    spark = spark or df.sparkSession
    df = normalize_timestamps(df)
    if iceberg_available(spark, catalog):
        (
            df.writeTo(f"{catalog}.{name}")
            .partitionedBy(F.col(partition_col))
            .using("iceberg")
            .createOrReplace()
        )
        return "iceberg"
    (
        df.repartition(partition_col)
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(f"{path}/{name}")
    )
    return "parquet"


def read_table(spark: SparkSession, name: str, path: str) -> DataFrame:
    """Read back a parquet-fallback table with schema evolution enabled
    (mergeSchema): partitions written before a column existed surface it
    as NULL — mirroring Iceberg's add-column evolution, which the
    reference relies on when assets gain columns across daily
    partitions (iceberg_assets.py:96-139)."""
    return spark.read.option("mergeSchema", "true").parquet(f"{path}/{name}")


def with_station_capacity(df: DataFrame) -> DataFrame:
    """FIXTURES.md §6 derived columns: total capacity + utilization with
    the both-zero edge yielding NULL (the reference would divide by
    zero, sample_iceberg_asset.py:88-91)."""
    total = F.col("available_bikes") + F.col("available_docks")
    return df.withColumns(
        {
            "total_capacity": total,
            "utilization_rate": F.when(
                total > 0, F.round(F.col("available_bikes") / total, 4)
            ),
        }
    )
