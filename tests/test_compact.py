from __future__ import annotations

from pyspark.sql import functions as F

from bike_data_flow_spark.operators.compact import compact_partitions, partition_sizes


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    out = tmp_path / "zone"
    df = spark.range(0, 10000).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, "2025-05-01").otherwise("2025-05-02").alias("dt"),
    )
    # deliberately fragment: many small files per partition
    df.repartition(16).write.partitionBy("dt").parquet(str(out))
    before = partition_sizes(out)
    assert all(n >= 8 for n, _ in before.values())

    done = compact_partitions(spark, out, target_file_bytes=10**9)
    after = partition_sizes(out)
    assert set(done) == {"2025-05-01", "2025-05-02"}
    assert all(n == 1 for n, _ in after.values())
    back = spark.read.parquet(str(out))
    assert back.count() == 10000
    assert back.select("dt").distinct().count() == 2


def test_compaction_skips_single_file_partitions(spark, tmp_path):
    out = tmp_path / "zone"
    spark.range(0, 10).select(F.col("id"), F.lit("2025-05-01").alias("dt")).coalesce(
        1
    ).write.partitionBy("dt").parquet(str(out))
    done = compact_partitions(spark, out)
    assert done == {}  # nothing to do


def test_compaction_restores_partition_if_swap_fails(spark, tmp_path, monkeypatch):
    """A crash mid-swap must not strand data in dt=X.old — the old
    partition comes back and readers see the original rows."""
    from pathlib import Path

    import pytest

    out = tmp_path / "zone"
    spark.range(0, 1000).select(
        F.col("id"), F.lit("2025-05-01").alias("dt")
    ).repartition(4).write.partitionBy("dt").parquet(str(out))

    real_rename = Path.rename

    def failing_rename(self, target):
        if self.name.startswith(".compact-"):
            raise OSError("simulated crash during swap")
        return real_rename(self, target)

    monkeypatch.setattr(Path, "rename", failing_rename)
    with pytest.raises(OSError, match="simulated crash"):
        compact_partitions(spark, out, target_file_bytes=10**9)
    monkeypatch.undo()

    assert (out / "dt=2025-05-01").exists()
    assert not (out / "dt=2025-05-01.old").exists()
    assert spark.read.parquet(str(out)).count() == 1000
