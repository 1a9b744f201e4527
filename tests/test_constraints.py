"""CHECK-constraint enforcement on snapshot tables
(operators/snapshots.py set_check_constraints / snapshot_write)."""

from __future__ import annotations

import os

import pytest

from bike_data_flow_spark.operators import snapshots as SN


def _t(tmp_path, name="tbl"):
    return os.path.join(str(tmp_path), name)


def test_valid_writes_pass_and_constraints_persist(spark, tmp_path):
    t = _t(tmp_path)
    SN.set_check_constraints(
        t, {"v_nonneg": "v >= 0", "k_set": "k IS NOT NULL"}
    )
    df = spark.createDataFrame([(1, 10), (2, 0)], "k long, v long")
    assert SN.snapshot_write(df, t, mode="overwrite") == 1
    assert SN.snapshot_write(df, t, mode="append") == 2
    assert SN.check_constraints(t) == {
        "v_nonneg": "v >= 0",
        "k_set": "k IS NOT NULL",
    }
    assert SN.snapshot_read(spark, t).count() == 4


def test_violating_write_refused_and_table_untouched(spark, tmp_path):
    t = _t(tmp_path)
    SN.set_check_constraints(t, {"v_nonneg": "v >= 0"})
    good = spark.createDataFrame([(1, 10)], "k long, v long")
    SN.snapshot_write(good, t, mode="overwrite")
    bad = spark.createDataFrame([(2, -5), (3, 7), (4, -1)], "k long, v long")
    with pytest.raises(SN.ConstraintViolation, match="v_nonneg.*2 row"):
        SN.snapshot_write(bad, t, mode="append")
    # no partial commit: version unchanged, data unchanged, no garbage
    # data dir was even written (refusal precedes the write)
    assert SN.current_version(t) == 1
    assert SN.snapshot_read(spark, t).count() == 1
    data_root = os.path.join(t, "data")
    assert len(os.listdir(data_root)) == 1


def test_null_counts_as_violation(spark, tmp_path):
    t = _t(tmp_path)
    SN.set_check_constraints(t, {"v_nonneg": "v >= 0"})
    df = spark.createDataFrame([(1, None)], "k long, v long")
    with pytest.raises(SN.ConstraintViolation, match="v_nonneg"):
        SN.snapshot_write(df, t, mode="overwrite")
    # coalesce spelling lets NULLs pass when that is the intent
    SN.set_check_constraints(t, {"v_nonneg": "coalesce(v >= 0, true)"})
    assert SN.snapshot_write(df, t, mode="overwrite") == 1


def test_maintenance_rewrites_skip_validation(spark, tmp_path):
    """Constraints added AFTER data landed must not brick OPTIMIZE:
    compaction rewrites history without re-validating it."""
    t = _t(tmp_path)
    df = spark.createDataFrame([(1, -99), (2, 5)], "k long, v long")
    SN.snapshot_write(df, t, mode="overwrite")
    SN.snapshot_write(
        spark.createDataFrame([(3, 6)], "k long, v long"), t, mode="append"
    )
    # retroactive constraint the EXISTING data violates
    SN.set_check_constraints(t, {"v_nonneg": "v >= 0"})
    v = SN.snapshot_compact(spark, t)
    assert SN.is_compaction(t, v)
    assert SN.snapshot_read(spark, t).count() == 3
    # ...but new admissions are gated
    with pytest.raises(SN.ConstraintViolation):
        SN.snapshot_write(
            spark.createDataFrame([(4, -1)], "k long, v long"),
            t,
            mode="append",
        )


def test_drop_constraints_reopens_writes(spark, tmp_path):
    t = _t(tmp_path)
    SN.set_check_constraints(t, {"v_nonneg": "v >= 0"})
    bad = spark.createDataFrame([(1, -1)], "k long, v long")
    with pytest.raises(SN.ConstraintViolation):
        SN.snapshot_write(bad, t, mode="overwrite")
    SN.set_check_constraints(t, {})
    assert SN.snapshot_write(bad, t, mode="overwrite") == 1


def test_constraints_survive_expire_and_partitioned_tables(spark, tmp_path):
    t = _t(tmp_path)
    SN.set_check_constraints(t, {"v_nonneg": "v >= 0"})
    df = spark.createDataFrame(
        [(1, 1, "a"), (2, 2, "b")], "k long, v long, p string"
    )
    for _ in range(3):
        SN.snapshot_write(df, t, mode="append", partition_by=["p"])
    SN.expire_snapshots(t, keep_last=1)
    assert SN.check_constraints(t) == {"v_nonneg": "v >= 0"}
    with pytest.raises(SN.ConstraintViolation):
        SN.snapshot_write(
            spark.createDataFrame([(9, -9, "c")], "k long, v long, p string"),
            t,
            mode="append",
            partition_by=["p"],
        )


def test_streaming_snapshot_sink_enforces_constraints(spark, tmp_path):
    """The streaming sink commits through snapshot_write with no
    maintenance marker, so CHECK constraints gate every micro-batch:
    a violating batch fails the stream LOUDLY and commits nothing."""
    from pyspark.sql.streaming import StreamingQueryException

    from bike_data_flow_spark.streaming.snapshot_sink import (
        write_stream_snapshots,
    )

    src = str(tmp_path / "src")
    spark.createDataFrame([(1, 5), (2, -3)], "k long, v long").write.parquet(
        src
    )
    t = _t(tmp_path, "stream_tbl")
    SN.set_check_constraints(t, {"v_nonneg": "v >= 0"})
    stream = spark.readStream.schema("k long, v long").parquet(src)
    q = write_stream_snapshots(
        stream, t, checkpoint_dir=str(tmp_path / "ckpt")
    )
    with pytest.raises(StreamingQueryException, match="v_nonneg"):
        q.awaitTermination()
    assert SN.current_version(t) is None  # nothing committed


def test_streaming_snapshot_sink_passes_valid_batches(spark, tmp_path):
    from bike_data_flow_spark.streaming.snapshot_sink import (
        write_stream_snapshots,
    )

    src = str(tmp_path / "src")
    spark.createDataFrame([(1, 5), (2, 3)], "k long, v long").write.parquet(
        src
    )
    t = _t(tmp_path, "stream_tbl")
    SN.set_check_constraints(t, {"v_nonneg": "v >= 0"})
    stream = spark.readStream.schema("k long, v long").parquet(src)
    q = write_stream_snapshots(
        stream, t, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination()
    assert SN.snapshot_read(spark, t).count() == 2
