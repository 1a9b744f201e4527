"""Streaming sink into the snapshot table format: every micro-batch
commits as one append snapshot, so the table gains time travel and
snapshot isolation for free and a crash mid-commit can never expose a
half-written batch (reference: iceberg_assets.py persists frames to
Iceberg; this is the streaming spelling of that persistence path,
wrm_pipeline/wrm_pipeline/assets/iceberg_assets.py:11-49).

Exactly-once: foreachBatch is at-least-once — after a failure the
engine REPLAYS the last unacknowledged batch. The sink fences on the
batch id recorded in each commit's manifest meta: a replayed batch id
≤ the last committed one is skipped, so the data dirs never double-
append. (Spark's own file sink achieves the same with a _spark_metadata
log; here the table's manifest IS that log.) The table_dir must be
owned by one stream — a concurrent manual snapshot_write would reset
the fence.

At 100 TB: each commit is O(1) manifest metadata regardless of batch
size; run expire_snapshots periodically to bound manifest count, and
compact small per-batch data dirs with a maintenance overwrite commit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators import snapshots as S


def write_stream_snapshots(
    stream_df: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Start a foreachBatch stream committing each batch as an append
    snapshot, batch-id-fenced for idempotent replays."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        last = S.latest_meta(table_dir).get("batch_id")
        if last is not None and batch_id <= last:
            return  # replay of an already-committed batch
        S.snapshot_write(
            batch_df, table_dir, mode="append", meta={"batch_id": batch_id}
        )

    writer = (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
