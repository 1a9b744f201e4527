"""Streaming state-store inspection (Spark 4 state data source).

The ops/debugging surface for Structured Streaming checkpoints: read a
running (or stopped) query's keyed state as a DataFrame — what keys
are live, what partial aggregates they hold, how state is spread over
shuffle partitions — without touching the query. This is how you
answer "why is my state store growing" and "is the watermark actually
expiring keys" in production; pairs with the skew profiler
(queries/maintenance.key_skew_profile) when one hot key bloats a
single state partition.

Reads are executor-parallel (one task per state partition) and touch
only the checkpoint's state files — no interaction with the live
query beyond ordinary file reads, safe at any state size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_state(
    spark: SparkSession,
    checkpoint: str,
    batch_id: int | None = None,
    operator_id: int = 0,
    store_name: str | None = None,
) -> DataFrame:
    """Keyed state of a streaming query's stateful operator as
    (key struct, value struct, partition_id) rows. ``batch_id`` pins a
    historical micro-batch (default: latest committed); stateful
    operators beyond the first are addressed by ``operator_id``, and
    multi-store operators (stream-stream joins) by ``store_name``."""
    r = spark.read.format("statestore").option("operatorId", operator_id)
    if batch_id is not None:
        r = r.option("batchId", batch_id)
    if store_name is not None:
        r = r.option("storeName", store_name)
    return r.load(checkpoint)


def state_metadata(spark: SparkSession, checkpoint: str) -> DataFrame:
    """Per-operator state metadata (operator name/id, store names,
    partition count, batch-id range held) — the catalog you consult
    before read_state on an unfamiliar checkpoint."""
    return spark.read.format("state-metadata").load(checkpoint)


def state_key_counts(
    spark: SparkSession, checkpoint: str, operator_id: int = 0
) -> DataFrame:
    """Live-key count per state partition — the state-skew histogram
    (a partition holding most of the keys is the streaming analogue of
    a hot join key). One keys-bounded aggregate over the state read."""
    from pyspark.sql import functions as F

    st = read_state(spark, checkpoint, operator_id=operator_id)
    return st.groupBy("partition_id").agg(F.count(F.lit(1)).alias("n_keys"))
