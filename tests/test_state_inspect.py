"""State-store inspection: read a checkpoint's keyed state back as a
DataFrame and verify it matches what the streaming agg actually holds."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from bike_data_flow_spark.streaming.state_inspect import (
    read_state,
    state_key_counts,
    state_metadata,
)


def _run_grouped_count(spark, tmp_path: Path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "a"), (4, "c")], ["id", "k"]
    ).write.parquet(src)
    stream = spark.readStream.schema("id long, k string").parquet(src)
    q = (
        stream.groupBy("k")
        .count()
        .writeStream.format("noop")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    return ckpt


def test_read_state_matches_aggregate(spark, tmp_path: Path):
    ckpt = _run_grouped_count(spark, tmp_path)
    st = read_state(spark, ckpt)
    got = {r["key"]["k"]: r["value"]["count"] for r in st.collect()}
    assert got == {"a": 2, "b": 1, "c": 1}


def test_state_metadata_lists_the_operator(spark, tmp_path: Path):
    ckpt = _run_grouped_count(spark, tmp_path)
    meta = state_metadata(spark, ckpt).collect()
    assert len(meta) == 1
    assert meta[0]["operatorId"] == 0
    assert meta[0]["operatorName"] == "stateStoreSave"


def test_state_key_counts_sum_to_key_count(spark, tmp_path: Path):
    ckpt = _run_grouped_count(spark, tmp_path)
    per_part = state_key_counts(spark, ckpt).collect()
    assert sum(r["n_keys"] for r in per_part) == 3
    # every partition_id reported exists in the state read itself
    parts = {r["partition_id"] for r in read_state(spark, ckpt).collect()}
    assert {r["partition_id"] for r in per_part} == parts
