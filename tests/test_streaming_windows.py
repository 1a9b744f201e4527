"""Event-time windows, streaming dedup, and stateful operator tests.

Driven through real streaming queries over a file source (parquet
micro-batches) — the same execution path production would use.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from bike_data_flow_spark.streaming.windows import (
    dedup_stream,
    running_station_totals,
    windowed_counts,
)

SCHEMA = "station_id string, timestamp timestamp, bikes long"


def _rows():
    t = lambda m, s=0: datetime(2025, 5, 1, 10, m, s)  # noqa: E731
    return [
        ("001", t(0), 5),
        ("001", t(4), 6),
        ("001", t(11), 7),  # second 10-min window
        ("002", t(2), 1),
        ("002", t(2), 1),  # exact duplicate row (for dedup test)
        ("002", t(25), 2),
    ]


@pytest.fixture()
def source_dir(spark, tmp_path):
    src = tmp_path / "events_src"
    spark.createDataFrame(_rows(), SCHEMA).coalesce(1).write.parquet(str(src))
    return str(src)


def _stream(spark, source_dir):
    return spark.readStream.schema(SCHEMA).parquet(source_dir)


def _run_to_memory(spark, df, name, tmp_path, output_mode):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_tumbling_window_counts(spark, source_dir, tmp_path):
    # complete mode: every window state emitted each trigger (append mode
    # only emits once the watermark passes a window's end — see
    # test_append_mode_finalizes_windows_via_watermark)
    agg = windowed_counts(
        _stream(spark, source_dir), window_duration="10 minutes", watermark="30 minutes"
    )
    out = _run_to_memory(spark, agg, "win_counts", tmp_path, "complete")
    got = {
        (r["window_start"].strftime("%H:%M"), r["station_id"]): r["n_events"]
        for r in out.collect()
    }
    assert got == {
        ("10:00", "001"): 2,
        ("10:10", "001"): 1,
        ("10:00", "002"): 2,
        ("10:20", "002"): 1,
    }


def test_sliding_window_counts(spark, source_dir, tmp_path):
    agg = windowed_counts(
        _stream(spark, source_dir),
        window_duration="10 minutes",
        slide_duration="5 minutes",
        watermark="30 minutes",
    )
    out = _run_to_memory(spark, agg, "win_slide", tmp_path, "complete")
    rows = [r for r in out.collect() if r["station_id"] == "001"]
    # event at 10:00 belongs to windows [09:55,10:05) and [10:00,10:10)
    starts = {r["window_start"].strftime("%H:%M") for r in rows}
    assert "09:55" in starts and "10:00" in starts


def test_append_mode_finalizes_windows_via_watermark(spark, tmp_path):
    # batch 1: the real events; batch 2: a sentinel far in the future that
    # advances the watermark past every window end → batch-1 windows emit
    src = tmp_path / "append_src"
    spark.createDataFrame(_rows(), SCHEMA).coalesce(1).write.parquet(str(src))
    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(
        str(src)
    )
    agg = windowed_counts(stream, window_duration="10 minutes", watermark="30 minutes")
    out_dir = str(tmp_path / "win_out")

    def run():
        q = (
            agg.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out_dir)
            .option("checkpointLocation", str(tmp_path / "ckpt_append"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    assert spark.read.parquet(out_dir).count() == 0  # nothing finalized yet

    sentinel = [("zzz", datetime(2025, 5, 1, 12, 0), 0)]
    spark.createDataFrame(sentinel, SCHEMA).coalesce(1).write.mode("append").parquet(
        str(src)
    )
    run()
    got = {
        (r["window_start"].strftime("%H:%M"), r["station_id"]): r["n_events"]
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got[("10:00", "001")] == 2 and got[("10:20", "002")] == 1


def test_dedup_stream_drops_exact_duplicates(spark, source_dir, tmp_path):
    dd = dedup_stream(
        _stream(spark, source_dir),
        hash_cols=["station_id", "timestamp", "bikes"],
        watermark="1 hour",
    )
    out = _run_to_memory(spark, dd, "dedup_out", tmp_path, "append")
    assert out.count() == 5  # 6 rows, one exact dup removed
    assert (
        out.filter((F.col("station_id") == "002") & (F.col("bikes") == 1)).count() == 1
    )


def test_running_station_totals_state(spark, source_dir, tmp_path):
    st = running_station_totals(_stream(spark, source_dir))
    out = _run_to_memory(spark, st, "running_tot", tmp_path, "update")
    got = {r["station_id"]: r for r in out.collect()}
    assert got["001"]["running_total"] == 3
    assert got["001"]["running_max_bikes"] == 7
    assert got["002"]["running_total"] == 3
    assert got["002"]["running_max_bikes"] == 2


def test_streaming_session_windows_merge_and_finalize(spark, tmp_path):
    from bike_data_flow_spark.streaming.windows import session_counts

    src = tmp_path / "sess_src"
    spark.createDataFrame(_rows(), SCHEMA).coalesce(1).write.parquet(str(src))
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    agg = session_counts(stream, gap="10 minutes", watermark="30 minutes")
    out_dir = str(tmp_path / "sess_out")

    def run():
        q = (
            agg.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out_dir)
            .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    sentinel = [("zzz", datetime(2025, 5, 1, 12, 0), 0)]
    spark.createDataFrame(sentinel, SCHEMA).coalesce(1).write.mode("append").parquet(
        str(src)
    )
    run()
    got = {
        (r["station_id"], r["session_start"].strftime("%H:%M")): (
            r["session_end"].strftime("%H:%M"),
            r["n_events"],
        )
        for r in spark.read.parquet(out_dir).collect()
    }
    # 001: events at 10:00/10:04/10:11 chain into ONE merged session
    # (each gap < 10 min) ending 10:21; 002's 10:02 duplicates collapse
    # into one session of 2 events, 10:25 starts a fresh session.
    assert got[("001", "10:00")] == ("10:21", 3)
    assert got[("002", "10:02")] == ("10:12", 2)
    assert got[("002", "10:25")] == ("10:35", 1)


def test_transform_with_state_running_stats(spark, tmp_path):
    """transformWithStateInPandas keeps per-key (count, max) across
    micro-batches: batch 2 must fold into batch 1's state, not reset."""
    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="TWS python runner speaks protobuf to the JVM; lib absent "
        "in this container (applyInPandasWithState covers the surface)",
    )
    from bike_data_flow_spark.streaming.windows import running_key_stats_tws

    src = tmp_path / "tws_src"
    spark.createDataFrame(_rows(), SCHEMA).coalesce(1).write.parquet(str(src))
    stats = running_key_stats_tws(_stream(spark, str(src)))
    out1 = _run_to_memory(spark, stats, "tws1", tmp_path / "a", "update")
    got1 = {r["station_id"]: (r["n_events"], r["max_value"]) for r in out1.collect()}
    assert got1["001"] == (3, 7.0)
    assert got1["002"] == (3, 2.0)

    # second batch arrives: state must accumulate (same checkpoint)
    more = [("001", datetime(2025, 5, 1, 11, 0), 9), ("003", datetime(2025, 5, 1, 11, 1), 4)]
    spark.createDataFrame(more, SCHEMA).coalesce(1).write.mode("append").parquet(str(src))
    stats2 = running_key_stats_tws(_stream(spark, str(src)))
    q = (
        stats2.writeStream.format("memory")
        .queryName("tws2")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "a" / "ckpt_tws1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got2 = {r["station_id"]: (r["n_events"], r["max_value"]) for r in spark.table("tws2").collect()}
    assert got2["001"] == (4, 9.0)  # 3 prior + 1 new, new max
    assert got2["003"] == (1, 4.0)  # fresh key


def test_funnel_snapshots_multibatch_out_of_order(spark, tmp_path):
    """The CEP funnel must survive a multi-batch split where the
    completing events arrive out of chronological order: user 1's 'v'
    arrives LAST (batch 3) with the EARLIEST timestamp, so only the
    state-log re-sort can complete the v->c->p match; user 2 never
    completes. Also pins final_snapshot_per_key: with 3 batches the
    memory sink holds up to 3 snapshots per user and only each user's
    last may survive."""
    from bike_data_flow_spark.streaming.windows import (
        final_snapshot_per_key,
        funnel_snapshots,
    )

    schema = "user_id long, ts_ns long, event_id long, i string"
    src = tmp_path / "funnel_src"
    batches = [
        [(1, 200, 11, "c"), (2, 100, 20, "p")],   # c before v arrives
        [(1, 300, 12, "p"), (2, 200, 21, "c")],
        [(1, 100, 10, "v")],                       # earliest ts, last arrival
    ]
    for b in batches:
        spark.createDataFrame(b, schema).coalesce(1).write.mode("append").parquet(
            str(src)
        )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    name = "funnel_mb"
    q = (
        funnel_snapshots(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    raw = spark.table(name)
    assert raw.count() > 2  # several per-batch snapshots actually landed
    got = {
        r["user_id"]: (r["n_events"], r["funnel_complete"])
        for r in final_snapshot_per_key(raw, "user_id", "n_events").collect()
    }
    assert got == {1: (3, True), 2: (2, False)}


def test_cusum_snapshots_multibatch_out_of_order(spark, tmp_path):
    """The streaming CUSUM must re-fold in (ts, id) order even when the
    earliest event arrives last: user 1's +10 deviation lands in batch
    3 with the earliest timestamp, changing the running extremes that
    earlier snapshots computed without it."""
    from bike_data_flow_spark.streaming.windows import (
        cusum_snapshots,
        final_snapshot_per_key,
    )

    schema = "user_id long, ts_ns long, event_id long, value double"
    src = tmp_path / "cusum_src"
    batches = [
        [(1, 200, 11, 480.0), (2, 100, 20, 490.0)],
        [(1, 300, 12, 530.0)],
        [(1, 100, 10, 510.0)],  # earliest ts, last arrival
    ]
    for b in batches:
        spark.createDataFrame(b, schema).coalesce(1).write.mode("append").parquet(
            str(src)
        )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    name = "cusum_mb"
    q = (
        cusum_snapshots(stream, target=500.0)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    raw = spark.table(name)
    got = {
        r["user_id"]: (r["n_events"], r["max_pos_drift"], r["max_neg_drift"])
        for r in final_snapshot_per_key(raw, "user_id", "n_events").collect()
    }
    # user 1 in (ts,id) order: +10 -> -10 -> +20  => hi 20, lo -10
    assert got[1] == (3, 20.0, -10.0)
    assert got[2] == (1, -10.0, -10.0)


def test_cusum_state_bounded_by_watermark(spark, tmp_path):
    """State per key must be O(watermark buffer), not O(all events):
    with in-order batches and a 1-second disorder bound, earlier
    batches finalize into the prefix fold as the watermark advances,
    so n_buffered stays at ~batch size while n_events keeps growing —
    and the emitted extremes still equal the exact full-history fold."""
    from bike_data_flow_spark.streaming.windows import (
        cusum_snapshots,
        final_snapshot_per_key,
    )

    schema = "user_id long, ts_ns long, event_id long, value double"
    src = tmp_path / "cusum_bounded_src"
    sec = 1_000_000_000
    n_batches, batch_sz = 4, 50
    rows = []
    for b in range(n_batches):
        batch = [
            (
                1,
                (b * batch_sz + i) * 60 * sec,  # 1 event/min, in order
                b * batch_sz + i,
                500.0 + ((b * batch_sz + i) % 7) - 3,  # drifting values
            )
            for i in range(batch_sz)
        ]
        rows.append(batch)
        spark.createDataFrame(batch, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    name = "cusum_bounded"
    q = (
        cusum_snapshots(stream, target=500.0, watermark_delay="1 second")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    raw = spark.table(name).collect()
    # Every snapshot after the first batch holds far fewer events in
    # state than it has seen: the watermark finalized earlier batches.
    snaps = sorted(
        ((r["n_events"], r["n_buffered"]) for r in raw if r["user_id"] == 1)
    )
    assert snaps[-1][0] == n_batches * batch_sz
    late = [buf for n, buf in snaps if n > 2 * batch_sz]
    assert late, "watermark never advanced — test setup broken"
    # buffer ≤ one batch + the boundary tie straggler, never the full log
    assert all(buf <= batch_sz + 1 for buf in late)
    # and the snapshot extremes are still the exact full-history fold
    flat = sorted((r for b in rows for r in b), key=lambda r: (r[1], r[2]))
    s, hi, lo = 0.0, None, None
    for _, _, _, v in flat:
        s += v - 500.0
        hi = s if hi is None or s > hi else hi
        lo = s if lo is None or s < lo else lo
    last = {
        r["user_id"]: (r["n_events"], r["max_pos_drift"], r["max_neg_drift"])
        for r in final_snapshot_per_key(
            spark.table(name), "user_id", "n_events"
        ).collect()
    }
    assert last[1] == (n_batches * batch_sz, hi, lo)
