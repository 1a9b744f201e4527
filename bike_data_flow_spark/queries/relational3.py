"""Third wave: temporal/sequence operators a large-scale event pipeline
needs — sessionization, as-of join, top-n per group, ntile bucketing,
correlation aggregates, min_by/max_by. All oracle-checked.

Time arithmetic is done on epoch integers (ts_ns/epoch_ms) so Spark and
the DuckDB oracle compare exactly (events carry nanosecond timestamps,
see tables._load_events).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load
from . import query

SESSION_GAP_MS = 30 * 60 * 1000  # 30 minutes


# Sessionization: new session when the gap to the previous event of the
# same user exceeds 30 min; session_id = cumulative new-session count.
# Two window passes over one user-partitioned sort — a single shuffle.
@query(
    "sessionize",
    oracle=f"""
    SELECT user_id, event_id,
           CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS session_id
    FROM (
      SELECT user_id, event_id, ts,
             CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts))
                       OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
                       > {SESSION_GAP_MS}
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
                       IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    )
    """,
)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts_ns"), F.asc("event_id"))
    gap_ms = (F.col("ts_ns") - F.lag("ts_ns").over(w)) / F.lit(1_000_000)
    is_new = F.when(
        gap_ms.isNull() | (gap_ms > SESSION_GAP_MS), F.lit(1)
    ).otherwise(F.lit(0))
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "user_id",
        "event_id",
        F.sum(is_new).over(wcum).alias("session_id"),
    )


# Session-level rollup on top of sessionization (composition).
@query(
    "session_stats",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts))
                       OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
                       > {SESSION_GAP_MS}
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
                       IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    tagged AS (
      SELECT user_id, event_id, ts, value,
             CAST(sum(is_new) OVER (
                PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           count(*) AS n_events,
           epoch_ms(max(ts)) - epoch_ms(min(ts)) AS duration_ms,
           round(sum(value), 2) AS total_value
    FROM tagged GROUP BY user_id, session_id
    """,
)
def session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts_ns"), F.asc("event_id"))
    gap_ms = (F.col("ts_ns") - F.lag("ts_ns").over(w)) / F.lit(1_000_000)
    is_new = F.when(
        gap_ms.isNull() | (gap_ms > SESSION_GAP_MS), F.lit(1)
    ).otherwise(F.lit(0))
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged = ev.select(
        "user_id",
        "event_id",
        "ts_ns",
        "value",
        F.sum(is_new).over(wcum).alias("session_id"),
    )
    return tagged.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr("(max(ts_ns) div 1000000) - (min(ts_ns) div 1000000)").alias(
            "duration_ms"
        ),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


# RANGE-frame windowed aggregation: a true event-time sliding sum
# (everything within the trailing hour), not a row-count frame — the
# frame Spark evaluates with rangeBetween over the epoch-ms sort key.
@query(
    "value_sum_1h_range",
    oracle="""
    SELECT event_id, user_id, epoch_ms(ts) AS epoch_ms,
           round(sum(value) OVER (
             PARTITION BY user_id ORDER BY epoch_ms(ts)
             RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW), 2) AS sum_1h
    FROM events
    """,
)
def value_sum_1h_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    staged = ev.select(
        "event_id", "user_id", "value", F.expr("ts_ns div 1000000").alias("epoch_ms")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("epoch_ms"))
        .rangeBetween(-3_600_000, 0)
    )
    return staged.select(
        "event_id",
        "user_id",
        "epoch_ms",
        F.round(F.sum("value").over(w), 2).alias("sum_1h"),
    )


# Native session windows (F.session_window — the same operator Spark
# runs in Structured Streaming with state): 30-min-gap sessions per
# user. Boundaries are half-open, so a new session starts when the gap
# is >= the timeout at µs precision; the oracle mirrors via epoch_us.
@query(
    "session_window_stats",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                       OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
                       >= {SESSION_GAP_MS * 1000}
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
                       IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    tagged AS (
      SELECT user_id, ts, value,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_no
      FROM flagged
    )
    SELECT user_id,
           epoch_us(min(ts)) // 1000 AS session_start_ms,
           epoch_us(max(ts)) // 1000 + {SESSION_GAP_MS} AS session_end_ms,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM tagged GROUP BY user_id, session_no
    """,
)
def session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    g = ev.groupBy(
        "user_id", F.session_window(F.col("ts"), "30 minutes").alias("w")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    return g.select(
        "user_id",
        F.unix_millis(F.col("w.start")).alias("session_start_ms"),
        F.unix_millis(F.col("w.end")).alias("session_end_ms"),
        "n_events",
        "total_value",
    )


# As-of join (the operator Spark lacks natively, SURVEY §2.3 note):
# for every purchase, the most recent preceding click by the same user.
# Spelled as last(..., ignorenulls) over an event-time window — ONE
# shuffle on user_id, no range-join explosion.
@query(
    "purchase_attribution",
    oracle="""
    SELECT user_id, event_id AS purchase_id, last_click_id
    FROM (
      SELECT user_id, event_id, event_type,
             last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_id
      FROM events
    )
    WHERE event_type = 'purchase'
    """,
)
def purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts_ns"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    click_id = F.when(F.col("event_type") == "click", F.col("event_id"))
    return (
        ev.select(
            "user_id",
            "event_id",
            "event_type",
            F.last(click_id, ignorenulls=True).over(w).alias("last_click_id"),
        )
        .filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("event_id").alias("purchase_id"), "last_click_id")
    )


# Top-N per group (rank family beyond rn=1).
@query(
    "top3_users_per_type",
    oracle="""
    SELECT event_type, user_id, n_events, rnk FROM (
      SELECT event_type, user_id, count(*) AS n_events,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY count(*) DESC, user_id ASC) AS rnk
      FROM events GROUP BY event_type, user_id
    ) WHERE rnk <= 3
    """,
)
def top3_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    counts = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.desc("n_events"), F.asc("user_id")
    )
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("event_type", "user_id", "n_events", "rnk")
    )


# ntile bucketing (deterministic total order).
@query(
    "balance_quartiles",
    oracle="""
    SELECT quartile, c_mktsegment, count(*) AS cnt,
           round(min(c_acctbal), 2) AS min_bal, round(max(c_acctbal), 2) AS max_bal
    FROM (
      SELECT c_mktsegment, c_acctbal,
             ntile(4) OVER (ORDER BY c_acctbal ASC, c_custkey ASC) AS quartile
      FROM customer
    )
    GROUP BY quartile, c_mktsegment
    """,
)
def balance_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    w = Window.orderBy(F.asc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.select("c_mktsegment", "c_acctbal", F.ntile(4).over(w).alias("quartile"))
        .groupBy("quartile", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        )
    )


# Correlation / covariance aggregates.
@query(
    "price_quantity_corr",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 4) + 0.0 AS qty_price_corr,
           round(covar_samp(l_quantity, l_discount), 4) + 0.0 AS qty_disc_covar
    FROM lineitem GROUP BY l_returnflag
    """,
)
def price_quantity_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        (F.round(F.corr("l_quantity", "l_extendedprice"), 4) + F.lit(0.0)).alias(
            "qty_price_corr"
        ),
        (F.round(F.covar_samp("l_quantity", "l_discount"), 4) + F.lit(0.0)).alias(
            "qty_disc_covar"
        ),
    )


# min_by / max_by (argmin/argmax aggregates, O6 family).
@query(
    "latest_event_per_type",
    oracle="""
    SELECT event_type,
           max_by(event_id, ts) AS latest_event_id,
           min_by(event_id, ts) AS first_event_id,
           count(*) AS cnt
    FROM events GROUP BY event_type
    """,
)
def latest_event_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.max_by("event_id", "ts_ns").alias("latest_event_id"),
        F.min_by("event_id", "ts_ns").alias("first_event_id"),
        F.count(F.lit(1)).alias("cnt"),
    )
