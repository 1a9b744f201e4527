"""Streaming sink into the snapshot table format: every micro-batch
commits as one append snapshot, so the table gains time travel and
snapshot isolation for free and a crash mid-commit can never expose a
half-written batch (reference: iceberg_assets.py persists frames to
Iceberg; this is the streaming spelling of that persistence path,
wrm_pipeline/wrm_pipeline/assets/iceberg_assets.py:11-49).

Exactly-once: foreachBatch is at-least-once — after a failure the
engine REPLAYS the last unacknowledged batch. The sink fences commits
Delta-style on a (txn_app_id, txn_version) pair recorded in the
manifest meta: the app id identifies THIS stream (derived from its
checkpoint location — the engine's own identity for a run lineage),
the version is the batch id. A replayed batch (version ≤ the writer's
last committed) is skipped. Because the fence scans retained manifests
newest-to-oldest past commits from OTHER writers — manual appends,
maintenance compaction overwrites — those can never disarm it.
Restarting with a NEW checkpoint dir is a new writer by definition:
its batches all commit (Delta's txn semantics; the operator chose
reprocessing, and silently dropping the new stream's data would be
worse than duplicating — document, don't guess).

Concurrency contract: the fence is check-then-write, so exactly-once
assumes ONE active writer per commit sequence at a time (the normal
Structured Streaming deployment — one driver per checkpoint). The
failure mode is still safe, not silent: if a zombie driver races a
restarted stream on the same version, snapshot_write's conditional
manifest publish (O_EXCL-style link) makes the loser ERROR instead of
last-write-winning, so a double-commit cannot slip through unnoticed.

CHECK constraints (snapshots.set_check_constraints) gate every batch:
the sink commits with no maintenance marker, so a violating batch
raises ConstraintViolation inside foreachBatch and FAILS THE STREAM
before any data file lands — loud and uncommitted, never silently
dropped rows (tests/test_constraints.py pins both directions).

At 100 TB: each commit is O(1) manifest metadata regardless of batch
size; run expire_snapshots periodically to bound manifest count —
but keep retention LONGER than the maximum stream downtime, or the
fence loses the writer's history and a replayed batch commits twice —
and compact small per-batch data dirs with a maintenance overwrite
commit (safe: it carries no txn meta, so the fence is unaffected).
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators import snapshots as S


def _app_id(checkpoint_dir: str) -> str:
    norm = os.path.abspath(checkpoint_dir)
    return hashlib.md5(norm.encode()).hexdigest()[:16]


def commit_batch(
    batch_df: DataFrame, batch_id: int, table_dir: str, app_id: str
) -> bool:
    """Fenced append of one micro-batch; returns False when the batch
    is a replay (already committed by this writer).

    Layout-aware (r9): a pre-existing Hive-layout target keeps its
    partition_by — the append adopts the table's recorded layout and
    routes one task per partition value (the one-file-per-dir write
    discipline). The pre-fix spelling appended layout-less, so every
    batch into a partitioned table was refused by the mixed-layout
    guard and the stream died on its first commit."""
    last = S.last_txn_version(table_dir, app_id)
    if last is not None and batch_id <= last:
        return False
    layout = S.table_layout(table_dir)
    if layout:
        batch_df = batch_df.repartition(*layout)
    S.snapshot_write(
        batch_df,
        table_dir,
        mode="append",
        meta={"txn_app_id": app_id, "txn_version": batch_id},
        partition_by=layout or None,
    )
    return True


def write_stream_snapshots(
    stream_df: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Start a foreachBatch stream committing each batch as an append
    snapshot, txn-fenced for idempotent replays."""
    app = _app_id(checkpoint_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        commit_batch(batch_df, batch_id, table_dir, app)

    writer = (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
