"""Streaming-executed queries in the correctness gate.

These run a real Structured Streaming query (availableNow trigger over
the same parquet, memory sink) and return the materialized result —
so the DuckDB oracle validates results computed BY the streaming
engine, not just batch twins.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query


@query(
    "tumbling_event_counts",
    oracle="""
    SELECT epoch_ms(time_bucket(INTERVAL 1 HOUR, ts)) AS window_start_ms,
           event_type, count(*) AS cnt, round(sum(value), 2) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def tumbling_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch spelling of the ST6 tumbling window (same F.window operator
    the streaming path uses); oracle via DuckDB time_bucket."""
    from ..tables import load

    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window(F.col("ts"), "1 hour").alias("win"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.unix_millis(F.col("win.start").cast("timestamp")).alias(
                "window_start_ms"
            ),
            "event_type",
            "cnt",
            "total_value",
        )
    )


@query(
    "streamed_event_type_counts",
    oracle="SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type",
)
def streamed_event_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """event_type histogram computed through readStream + complete-mode
    aggregation (the streaming twin of event_type_counts)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    schema = (
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string"
    )
    name = f"stream_etc_{uuid.uuid4().hex[:8]}"
    # file source needs a directory; pathGlobFilter scopes it to events
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name)
