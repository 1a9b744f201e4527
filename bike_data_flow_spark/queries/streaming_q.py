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
    "sliding_event_counts",
    oracle="""
    SELECT window_start_ms, event_type, count(*) AS cnt
    FROM (
      SELECT epoch_ms(time_bucket(INTERVAL 5 MINUTE, ts)
                      - (k * INTERVAL 5 MINUTE)) AS window_start_ms,
             event_type
      FROM events, unnest([0, 1]) AS t(k)
    )
    GROUP BY 1, 2
    """,
)
def sliding_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-min windows sliding every 5 min (each event lands in exactly 2
    windows); oracle derives the same membership from shifted
    time_buckets."""
    from ..tables import load

    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window(F.col("ts"), "10 minutes", "5 minutes").alias("win"),
            F.col("event_type"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.unix_millis(F.col("win.start").cast("timestamp")).alias("window_start_ms"),
            "event_type",
            "cnt",
        )
    )


@query(
    "props_map_profile",
    oracle="""
    SELECT event_id,
           array_to_string(json_keys(props), ',') AS keys_csv,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT) AS k_regex
    FROM events
    """,
)
def props_map_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access three ways: JSON→MapType, JSON path, and
    raw regex extraction — all agreeing on the same payload."""
    from ..tables import load

    ev = load(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,bigint>")
    return ev.select(
        "event_id",
        F.array_join(F.map_keys(m), ",").alias("keys_csv"),
        F.element_at(m, "k").alias("k_val"),
        F.regexp_extract(F.col("props"), '"k":\\s*(\\d+)', 1).cast("bigint").alias(
            "k_regex"
        ),
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
