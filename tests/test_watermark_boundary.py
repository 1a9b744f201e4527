"""Watermark-closure strictness pinned at exact boundaries.

The streaming oracles in queries/streaming_q.py hardcode the engine's
empirically observed eviction strictness:

- hourly append windows finalize when  window_end <= watermark  (<=)
- outer-join state null-extends when   click_end  <  watermark  (strict <)
- session windows emit when            session_end <= watermark (<=)

These tests feed the REAL engine fixtures with events landing exactly
ON each boundary, so a Spark upgrade that flips </<= eviction (or a
change to availableNow's final-watermark computation) fails HERE with
a named assertion instead of as an opaque oracle hash-mismatch at the
correctness gate. If one of these starts failing after a version bump,
flip the matching comparator in the oracle SQL (streaming_q.py) too.
"""

from __future__ import annotations

import uuid
from datetime import datetime

from pyspark.sql import functions as F

SCHEMA = "user_id string, event_id long, event_type string, ts timestamp"
DELAY = "30 minutes"  # same watermark delay the gate queries use


def _ts(h, m, s=0, us=0):
    return datetime(2025, 5, 1, h, m, s, us)


def _stream(spark, tmp_path, rows, name):
    src = tmp_path / name
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(str(src))
    return spark.readStream.schema(SCHEMA).parquet(str(src))


def _collect(spark, df, mode):
    qn = f"wmb_{uuid.uuid4().hex[:8]}"
    q = (
        df.writeStream.format("memory")
        .queryName(qn)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {qn}").collect()


def test_hourly_window_closes_at_exact_watermark(spark, tmp_path):
    """window_end == final watermark → EMITTED (the oracle's
    `w_start + 1h <= cutoff`). Max event 11:30, delay 30min → wm 11:00;
    the [10:00, 11:00) window's end sits exactly on it."""
    rows = [
        ("u1", 1, "click", _ts(10, 5)),
        ("u1", 2, "click", _ts(11, 5)),  # [11:00,12:00) stays open
        ("zz", 9, "click", _ts(11, 30)),  # advances wm to 11:00 exactly
    ]
    ev = _stream(spark, tmp_path, rows, "hw_src")
    agg = (
        ev.withWatermark("ts", DELAY)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("ws"), "cnt")
    )
    got = {r["ws"].strftime("%H:%M"): r["cnt"] for r in _collect(spark, agg, "append")}
    assert got == {"10:00": 1}, (
        f"engine emitted {got}: hourly-window eviction is no longer "
        "window_end <= watermark — update the <= in streamed windowed "
        "oracles (streaming_q.py)"
    )


def test_outer_join_withholds_click_closing_at_exact_watermark(spark, tmp_path):
    """The engine's TRUE outer-join eviction bound, probed empirically:
    a click null-extends iff  click_ts + delay + 1ms <= watermark  —
    Spark's join state-watermark math is millisecond-granular with one
    conservative unit subtracted. So: exactly on the boundary (uA) is
    withheld, 999µs early (uC) still withheld, 1ms early (uB) emitted.
    The oracle's strict `c.us + delay < wm` agrees with this for any
    ms-coarse event data (which the testdata is); sub-ms timestamps in
    the open interval (wm−delay−1ms, wm−delay) would diverge — if THIS
    test breaks on a Spark bump, recalibrate that comparator.
    Sentinels put max=12:00 in BOTH streams → wm 11:30."""
    clicks = [
        ("uA", 1, "click", _ts(11, 0)),  # 11:00+30m == 11:30 == wm
        ("uC", 3, "click", _ts(10, 59, 59, 999001)),  # 999µs early: withheld
        ("uB", 2, "click", _ts(10, 59, 59, 999000)),  # 1ms early: emitted
        ("zc", 8, "click", _ts(12, 0)),  # sentinel, own window open
    ]
    purchases = [
        ("zp", 9, "purchase", _ts(12, 0)),  # sentinel only — no matches
    ]
    c = (
        _stream(spark, tmp_path, clicks, "oj_clicks")
        .select("user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", DELAY)
    )
    p = (
        _stream(spark, tmp_path, purchases, "oj_purch")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", DELAY)
    )
    joined = c.join(
        p,
        (F.col("p_user_id") == F.col("user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
        "leftOuter",
    ).select("user_id", "click_id", "purchase_id")
    unmatched = {
        r["user_id"] for r in _collect(spark, joined, "append") if r["purchase_id"] is None
    }
    assert unmatched == {"uB"}, (
        f"engine null-extended {unmatched}: outer-join eviction is no "
        "longer `click_end + 1ms <= watermark` — recalibrate the strict "
        "< in the streamed_*_outer oracles (streaming_q.py)"
    )


def test_session_window_closes_at_exact_watermark(spark, tmp_path):
    """session_end (last event + gap) == final watermark → EMITTED
    (the oracle's `session_end_ms <= cutoff`); one millisecond later →
    withheld. Gap 30min, delay 30min, max 12:00 → wm 11:30."""
    rows = [
        ("uA", 1, "click", _ts(11, 0)),  # end 11:30 == wm
        ("uB", 2, "click", _ts(11, 0, 0, 1000)),  # end 11:30:00.001 > wm
        ("zz", 9, "click", _ts(12, 0)),  # sentinel, own session open
    ]
    ev = _stream(spark, tmp_path, rows, "sw_src")
    agg = (
        ev.withWatermark("ts", DELAY)
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user_id", "n")
    )
    users = {r["user_id"] for r in _collect(spark, agg, "append")}
    assert users == {"uA"}, (
        f"engine emitted sessions for {users}: session eviction is no "
        "longer session_end <= watermark — update the <= in the "
        "streamed_session_stats oracle (streaming_q.py)"
    )
