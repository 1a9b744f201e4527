"""Streaming CDF source over the snapshot table format
(sources/snapshot_cdf.py): each append commit arrives as one
micro-batch of version-tagged inserts; overwrites fail loudly."""

from __future__ import annotations

from pathlib import Path

import pytest

from bike_data_flow_spark.operators.snapshots import snapshot_write
from bike_data_flow_spark.sources.snapshot_cdf import register


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


def _run_once(spark, table_dir, ckpt, out_dir):
    stream = spark.readStream.format("snapshot_cdf").option("path", table_dir).load()
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_appends_stream_as_versioned_inserts(spark, tmp_path: Path):
    register(spark)
    t = str(tmp_path / "tbl")
    snapshot_write(_df(spark, [(1, "a"), (2, "b")]), t)
    snapshot_write(_df(spark, [(3, "c")]), t)

    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
    _run_once(spark, t, ckpt, out)
    got = {
        (r["k"], r["v"], r["_commit_version"], r["_change_type"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == {
        (1, "a", 1, "insert"),
        (2, "b", 1, "insert"),
        (3, "c", 2, "insert"),
    }

    # restart from the SAME checkpoint after a new commit: only the
    # unconsumed version arrives (exactly-once over restarts)
    snapshot_write(_df(spark, [(4, "d")]), t)
    _run_once(spark, t, ckpt, out)
    got2 = {
        (r["k"], r["_commit_version"]) for r in spark.read.parquet(out).collect()
    }
    assert got2 == {(1, 1), (2, 1), (3, 2), (4, 3)}


def test_schema_evolution_nulls_pre_evolution_appends(spark, tmp_path: Path):
    register(spark)
    t = str(tmp_path / "tbl")
    snapshot_write(_df(spark, [(1, "a")]), t)
    snapshot_write(
        spark.createDataFrame([(2, "b", 9.5)], "k int, v string, w double"), t
    )
    out = str(tmp_path / "out")
    _run_once(spark, t, str(tmp_path / "ckpt"), out)
    rows = {r["k"]: r["w"] for r in spark.read.parquet(out).collect()}
    assert rows == {1: None, 2: 9.5}


def test_overwrite_in_range_fails_loudly(spark, tmp_path: Path):
    register(spark)
    t = str(tmp_path / "tbl")
    snapshot_write(_df(spark, [(1, "a")]), t)
    snapshot_write(_df(spark, [(9, "z")]), t, mode="overwrite")
    stream = spark.readStream.format("snapshot_cdf").option("path", t).load()
    q = (
        stream.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="append-only"):
        q.awaitTermination(120)
        raise RuntimeError(str(q.exception() or "stream did not fail"))


def test_table_to_table_replication_end_to_end(spark, tmp_path: Path):
    """The incremental-pipeline composition the pieces exist for:
    upstream snapshot table → CDF stream → txn-fenced snapshot sink →
    downstream table. Restarting after new upstream commits replays
    only the unconsumed versions, and the fence keeps the downstream
    duplicate-free."""
    from bike_data_flow_spark.operators.snapshots import snapshot_read
    from bike_data_flow_spark.streaming.snapshot_sink import (
        write_stream_snapshots,
    )

    register(spark)
    up, down = str(tmp_path / "up"), str(tmp_path / "down")
    ckpt = str(tmp_path / "ckpt")
    snapshot_write(_df(spark, [(1, "a"), (2, "b")]), up)
    snapshot_write(_df(spark, [(3, "c")]), up)

    def replicate():
        stream = (
            spark.readStream.format("snapshot_cdf")
            .option("path", up)
            .load()
            .select("k", "v")
        )
        q = write_stream_snapshots(stream, down, ckpt)
        q.awaitTermination(120)

    replicate()
    assert {
        (r["k"], r["v"]) for r in snapshot_read(spark, down).collect()
    } == {(1, "a"), (2, "b"), (3, "c")}

    snapshot_write(_df(spark, [(4, "d")]), up)
    replicate()
    got = sorted(
        (r["k"], r["v"]) for r in snapshot_read(spark, down).collect()
    )
    assert got == [(1, "a"), (2, "b"), (3, "c"), (4, "d")]  # no duplicates


def _run_once_from(spark, table_dir, ckpt, out_dir, starting_version):
    stream = (
        spark.readStream.format("snapshot_cdf")
        .option("path", table_dir)
        .option("startingVersion", str(starting_version))
        .load()
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_starting_version_begins_past_an_overwrite(spark, tmp_path: Path):
    """ADVICE r5: after a table rewrite, a NEW stream must have a
    supported way to start — startingVersion at the overwrite emits it
    as the initial load; later appends follow normally."""
    register(spark)
    t = str(tmp_path / "tbl")
    snapshot_write(_df(spark, [(1, "a")]), t)  # v1
    snapshot_write(_df(spark, [(2, "b")]), t)  # v2 append
    snapshot_write(_df(spark, [(9, "z")]), t, mode="overwrite")  # v3 rewrite
    snapshot_write(_df(spark, [(10, "y")]), t)  # v4 append

    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
    _run_once_from(spark, t, ckpt, out, starting_version=3)
    got = {
        (r["k"], r["_commit_version"]) for r in spark.read.parquet(out).collect()
    }
    # the overwrite itself arrives as the initial load; v1/v2 never do
    assert got == {(9, 3), (10, 4)}


def test_starting_version_after_the_overwrite_skips_it(spark, tmp_path: Path):
    register(spark)
    t = str(tmp_path / "tbl")
    snapshot_write(_df(spark, [(1, "a")]), t)  # v1
    snapshot_write(_df(spark, [(9, "z")]), t, mode="overwrite")  # v2
    snapshot_write(_df(spark, [(10, "y")]), t)  # v3

    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
    _run_once_from(spark, t, ckpt, out, starting_version=3)
    got = {
        (r["k"], r["_commit_version"]) for r in spark.read.parquet(out).collect()
    }
    assert got == {(10, 3)}


def test_starting_version_rejects_garbage(spark, tmp_path: Path):
    register(spark)
    t = str(tmp_path / "tbl")
    snapshot_write(_df(spark, [(1, "a")]), t)
    from bike_data_flow_spark.sources.snapshot_cdf import SnapshotCdfStreamReader
    from pyspark.sql.types import IntegerType, StructType

    schema = StructType().add("k", IntegerType())
    with pytest.raises(ValueError, match="startingVersion"):
        SnapshotCdfStreamReader(schema, {"path": t, "startingversion": "soon"})
    with pytest.raises(ValueError, match="startingVersion"):
        SnapshotCdfStreamReader(schema, {"path": t, "startingversion": "0"})


def test_compaction_commit_streams_through_without_changes(spark, tmp_path: Path):
    """An OPTIMIZE (snapshot_compact) in the unconsumed range emits
    ZERO change rows and does NOT trip the overwrite guard; appends
    before and after it stream normally through one checkpoint."""
    from bike_data_flow_spark.operators.snapshots import snapshot_compact

    register(spark)
    t, ckpt, out = (
        str(tmp_path / "t"),
        str(tmp_path / "ckpt"),
        str(tmp_path / "out"),
    )
    snapshot_write(_df(spark, [(1, "a")]), t)
    _run_once(spark, t, ckpt, out)
    snapshot_write(_df(spark, [(2, "b")]), t)          # v2 append
    snapshot_compact(spark, t)                          # v3 compaction
    snapshot_write(_df(spark, [(3, "c")]), t)          # v4 append
    _run_once(spark, t, ckpt, out)
    rows = spark.read.parquet(out).collect()
    got = {(r["k"], r["_commit_version"]) for r in rows}
    assert got == {(1, 1), (2, 2), (3, 4)}  # nothing from v3


def test_partitioned_appends_and_empty_commit_stream_correctly(
    spark, tmp_path: Path
):
    """Hive-layout tables stream through the CDF source: the partition
    column round-trips through the executor-side pyarrow read (hive
    discovery), and an EMPTY partitioned append (fileless dir — the
    ADVICE r8 case) emits zero rows instead of crashing the stream."""
    from pyspark.sql import functions as F

    register(spark)
    t, ckpt, out = (
        str(tmp_path / "t"),
        str(tmp_path / "ckpt"),
        str(tmp_path / "out"),
    )

    def pdf(rows):
        return spark.createDataFrame(rows, "k int, v string, p int")

    snapshot_write(
        pdf([(1, "a", 0), (2, "b", 1)]), t, mode="overwrite",
        partition_by=["p"],
    )
    snapshot_write(pdf([(3, "c", 0)]), t, partition_by=["p"])
    snapshot_write(
        pdf([(9, "z", 0)]).filter(F.lit(False)), t, partition_by=["p"]
    )  # v3: EMPTY append — fileless dir
    snapshot_write(pdf([(4, "d", 1)]), t, partition_by=["p"])
    _run_once(spark, t, ckpt, out)
    rows = spark.read.parquet(out).collect()
    got = {(r["k"], r["p"], r["_commit_version"]) for r in rows}
    # partition col values intact; nothing from the empty v3
    assert got == {(1, 0, 1), (2, 1, 1), (3, 0, 2), (4, 1, 4)}
