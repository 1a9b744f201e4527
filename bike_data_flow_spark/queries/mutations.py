"""Mutation-surface queries: MERGE upsert and SCD2 dimension builds
(operators/merge.py), oracle-checked against their set-algebra SQL
spellings. The reference pipeline rewrites day partitions in place
(enhanced parquet, late-file rebuilds); these queries prove the
general MERGE lowering the same machinery supports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.merge import merge_upsert, scd2_from_changelog
from ..tables import load
from . import query


# MERGE INTO customer USING per-user event deltas:
#   WHEN MATCHED     -> balance += delta (then delete if it went negative)
#   WHEN NOT MATCHED -> insert a shell row for the unknown user.
# The changeset (|users| rows) broadcasts; the customer side never
# shuffles — the 100 TB case (a day's changes vs years of history) is
# exactly this plan. Deltas sum in decimal so the changeset is
# partition-order-exact before it ever meets the target.
@query(
    "customer_upsert",
    oracle="""
    WITH delta AS (
      SELECT user_id,
             CAST(round(sum(CAST(value AS DECIMAL(30,6))), 2) AS DOUBLE) AS d
      FROM events GROUP BY user_id
    ),
    src AS (
      SELECT user_id AS k, c_name AS s_name,
             round(coalesce(c_acctbal, 0) + d, 2) AS s_bal
      FROM delta LEFT JOIN customer ON c_custkey = user_id
    )
    SELECT c_custkey, c_name, c_acctbal FROM (
      SELECT c.c_custkey, c.c_name,
             CASE WHEN s.k IS NOT NULL THEN s.s_bal ELSE c.c_acctbal END AS c_acctbal,
             s.k IS NOT NULL AS matched
      FROM customer c LEFT JOIN src s ON c.c_custkey = s.k
    ) WHERE NOT (matched AND c_acctbal < 0)
    UNION ALL
    SELECT k, s_name, s_bal FROM src
    WHERE k NOT IN (SELECT c_custkey FROM customer)
    """,
)
def customer_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    delta = ev.groupBy("user_id").agg(
        F.round(F.sum(F.col("value").cast("decimal(30,6)")), 2)
        .cast("double")
        .alias("d")
    )
    src = (
        delta.join(cust, delta.user_id == cust.c_custkey, "left")
        .select(
            F.col("user_id").alias("c_custkey"),
            F.col("c_name"),
            F.round(F.coalesce(F.col("c_acctbal"), F.lit(0.0)) + F.col("d"), 2).alias(
                "c_acctbal"
            ),
        )
    )
    return merge_upsert(
        cust,
        src,
        ["c_custkey"],
        delete_condition=F.col("c_acctbal") < 0,
    )


# SCD2 build from the event changelog: per-user validity intervals of
# the banded value (floor(value/10)), consecutive same-band rows
# collapsed into one interval. One shuffle total — the lag filter and
# the lead share the (user_id, ts, event_id) sort.
@query(
    "user_value_scd2",
    oracle="""
    WITH t AS (
      SELECT user_id, ts, event_id,
             CAST(floor(value / 10) AS BIGINT) AS value_band
      FROM events
    ),
    chg AS (
      SELECT user_id, ts, event_id, value_band FROM (
        SELECT *, lag(value_band) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS prev
        FROM t
      ) WHERE prev IS NULL OR value_band <> prev
    )
    SELECT user_id, value_band,
           epoch_ms(ts) AS valid_from_ms,
           lead(epoch_ms(ts)) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS valid_to_ms,
           lead(ts) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) IS NULL AS is_current
    FROM chg
    """,
)
def user_value_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "ts_ns",
        "event_id",
        F.floor(F.col("value") / 10).alias("value_band"),
    )
    scd = scd2_from_changelog(
        ev, "user_id", ["ts_ns", "event_id"], ["value_band"]
    )
    return scd.select(
        "user_id",
        "value_band",
        F.expr("valid_from div 1000000").alias("valid_from_ms"),
        F.expr("valid_to div 1000000").alias("valid_to_ms"),
        "is_current",
    )


@query(
    "point_in_time_value_band",
    oracle="""
    WITH t AS (
      SELECT user_id, ts, event_id,
             CAST(floor(value / 10) AS BIGINT) AS value_band
      FROM events
    ),
    chg AS (
      SELECT user_id, ts, event_id, value_band FROM (
        SELECT *, lag(value_band) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS prev
        FROM t
      ) WHERE prev IS NULL OR value_band <> prev
    ),
    p AS (
      SELECT user_id, event_id, ts FROM events
      WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id,
           epoch_ms(p.ts) AS purchase_ts_ms,
           CASE WHEN c.ts <= p.ts THEN c.value_band END AS band_at_purchase
    FROM p LEFT JOIN chg c
      ON c.user_id = p.user_id
    QUALIFY row_number() OVER (
      PARTITION BY p.event_id
      ORDER BY (c.ts <= p.ts) DESC, c.ts DESC, c.event_id DESC) = 1
    """,
)
def point_in_time_value_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup: each purchase gets the user's
    value-band STATE at purchase time — the as-of join against the
    SCD2 changelog that makes historical features leakage-free (a
    plain latest-value join would read the future). Spark side: the
    generic asof_join operator (union + last-ignorenulls window, one
    (key, ts) sort); the oracle ranks preceding changes per purchase.

    The oracle's QUALIFY orders matches-first so a purchase with NO
    preceding change still emits one row, and the band projection is
    guarded (CASE WHEN c.ts <= p.ts) so that row carries NULL rather
    than a FUTURE change's band — identical to the operator's left
    semantics (unreachable with current data, where every user's first
    event is a change, but the gate shouldn't rely on that)."""
    from pyspark.sql.window import Window

    from ..operators.joins import asof_join

    ev = load(spark, sf_dir, "events")
    bands = ev.select(
        "user_id",
        "ts_ns",
        "event_id",
        F.floor(F.col("value") / 10).alias("value_band"),
    )
    # the changelog stage of SCD2 (lag filter), with the event id kept
    # so the as-of tie-break at equal timestamps matches the oracle's
    # event_id ordering exactly
    w = Window.partitionBy("user_id").orderBy(F.asc("ts_ns"), F.asc("event_id"))
    chg = (
        bands.withColumn("_prev", F.lag("value_band").over(w))
        .filter(F.col("_prev").isNull() | (F.col("value_band") != F.col("_prev")))
        .select(
            "user_id",
            F.col("ts_ns").alias("chg_ts_ns"),
            F.col("event_id").alias("chg_event_id"),
            "value_band",
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts_ns", F.col("ts").alias("purchase_ts")
    )
    joined = asof_join(
        purchases,
        chg,
        on="user_id",
        left_ts="ts_ns",
        right_ts="chg_ts_ns",
        right_id="chg_event_id",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_millis(F.col("purchase_ts")).alias("purchase_ts_ms"),
        F.col("r_value_band").alias("band_at_purchase"),
    )
