"""Streaming MERGE sink (streaming/upsert_sink.py): continuous keyed
upsert through foreachBatch, exactly-once table contents."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from bike_data_flow_spark.streaming.upsert_sink import (
    streaming_upsert,
    upsert_batch,
)


def test_upsert_batch_applies_merge_and_swaps(spark, tmp_path: Path):
    table = str(tmp_path / "state")
    b1 = spark.createDataFrame(
        [(1, 10, "a"), (2, 10, "b"), (2, 20, "b2")], "k int, ts int, v string"
    )
    upsert_batch(spark, table, b1, ["k"], "ts")
    got = {r["k"]: r["v"] for r in spark.read.parquet(table).collect()}
    assert got == {1: "a", 2: "b2"}  # in-batch dedup kept the newest

    b2 = spark.createDataFrame(
        [(2, 30, "b3"), (3, 5, "c")], "k int, ts int, v string"
    )
    upsert_batch(spark, table, b2, ["k"], "ts")
    got = {r["k"]: r["v"] for r in spark.read.parquet(table).collect()}
    assert got == {1: "a", 2: "b3", 3: "c"}  # update + insert, no fan-out


def test_upsert_batch_is_idempotent(spark, tmp_path: Path):
    table = str(tmp_path / "state")
    b = spark.createDataFrame([(1, 10, "a"), (2, 10, "b")], "k int, ts int, v string")
    upsert_batch(spark, table, b, ["k"], "ts")
    upsert_batch(spark, table, b, ["k"], "ts")  # replay after "failure"
    rows = spark.read.parquet(table).collect()
    assert {(r["k"], r["v"]) for r in rows} == {(1, "a"), (2, "b")}
    assert len(rows) == 2


def test_streaming_upsert_end_to_end(spark, tmp_path: Path):
    src = tmp_path / "in"
    src.mkdir()
    table = str(tmp_path / "state")
    spark.createDataFrame(
        [(1, 10, "a"), (2, 11, "b")], "k int, ts int, v string"
    ).coalesce(1).write.mode("overwrite").parquet(str(src / "f1"))
    spark.createDataFrame(
        [(1, 20, "a2"), (3, 12, "c")], "k int, ts int, v string"
    ).coalesce(1).write.mode("overwrite").parquet(str(src / "f2"))

    stream = (
        spark.readStream.schema("k int, ts int, v string")
        .option("maxFilesPerTrigger", "1")  # force multiple micro-batches
        .parquet(str(src / "*"))
    )
    q = (
        stream.writeStream.foreachBatch(
            streaming_upsert(spark, table, ["k"], "ts")
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["k"]: (r["ts"], r["v"]) for r in spark.read.parquet(table).collect()}
    # last-writer-wins by ts regardless of which micro-batch applied
    # first — the ts=20 update survives even if its file processed first
    assert got == {1: (20, "a2"), 2: (11, "b"), 3: (12, "c")}


def test_upsert_batch_recovers_from_stale_tmp_dirs(spark, tmp_path: Path):
    """A crashed apply can leave __tmp/__old behind; the next apply must
    clear them and commit normally instead of failing the rename."""
    table = str(tmp_path / "state")
    b1 = spark.createDataFrame([(1, 10, "a")], "k int, ts int, v string")
    upsert_batch(spark, table, b1, ["k"], "ts")
    # simulate a crash that left both scratch dirs on disk
    for stale in (f"{table}__tmp", f"{table}__old"):
        p = Path(stale)
        p.mkdir()
        (p / "junk").write_text("leftover")
    b2 = spark.createDataFrame([(2, 11, "b")], "k int, ts int, v string")
    upsert_batch(spark, table, b2, ["k"], "ts")
    got = {r["k"]: r["v"] for r in spark.read.parquet(table).collect()}
    assert got == {1: "a", 2: "b"}
    assert not Path(f"{table}__tmp").exists() and not Path(f"{table}__old").exists()


def test_upsert_batch_restores_table_lost_mid_commit(spark, tmp_path: Path):
    """Crash between the two commit renames leaves table_dir missing and
    __old holding the only full copy — the next apply must restore it,
    not delete it (the batch replays via the stream checkpoint)."""
    import os

    table = str(tmp_path / "state")
    b1 = spark.createDataFrame([(1, 10, "a"), (2, 10, "b")], "k int, ts int, v string")
    upsert_batch(spark, table, b1, ["k"], "ts")
    os.rename(table, f"{table}__old")  # simulate death mid-commit
    b2 = spark.createDataFrame([(3, 11, "c")], "k int, ts int, v string")
    upsert_batch(spark, table, b2, ["k"], "ts")
    got = {r["k"]: r["v"] for r in spark.read.parquet(table).collect()}
    assert got == {1: "a", 2: "b", 3: "c"}  # old state survived the crash
