"""foreachBatch probes (and optional fenced admission) of BOTH
persisted dedup stores — the MinHash signature store (operators/
sigstore.py) and its embedding twin, the vector index (operators/
vecstore.py) — the HIGH-FREQUENCY spelling of the streamed store
probe.

Why not a stream-static join (queries/streaming_q.py
``streamed_incremental_dedup``)? Two reasons, both documented as the
r8 scale seam (SCALE.md) this operator closes:

1. **Cost**: a stream-static join re-executes the static side's PLAN
   every micro-batch but cannot apply the persisted bloom (a
   broadcast-within-foreachBatch construct) — at monitoring rates
   that's fine, at high batch frequency it rescans the store's band
   keys per batch. Here each batch runs the full two-layer prune from
   operators/sigstore.py: Δ's bounded occupied-shard IN-list lands as
   PartitionFilters on the store's Hive layout (only matching
   directories are LISTED), then the persisted one-row bloom drops
   non-colliding Δ keys map-side. Per-batch cost is
   O(|Δ_batch| minhash + colliding keys) — independent of store size.
2. **Liveness**: snapshot_read resolves the manifest to concrete
   version dirs at CALL time, so a stream-static join pins the store
   version for the stream's whole lifetime — appends land in new dirs
   the pinned file index never sees. foreachBatch re-resolves the
   store EVERY batch, so admissions by a concurrent batch job (or by
   this stream's own ``admit=True`` loop) are picked up live.

Output contract: candidate pairs append to ``pairs_out_dir`` tagged
with the producing batch id. foreachBatch is at-least-once — a
replayed batch re-appends its pairs, so consumers dedupe on
(id_a, id_b) or filter on batch id (the admission path, by contrast,
IS exactly-once via the txn fence). Pairs are the Δ×store arm only:
within-batch duplicates belong to the admission loop, where each
committed batch becomes store for the next.

Reference parity: extends the reference's sensor→asset streaming loop
(wrm_pipeline sensors poll + hand batches to assets) with the dedup
admission shape the reference never had — north-star operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators import snapshots as S
from ..operators.sigstore import admit_delta, band_keys_for, probe_store_pairs
from ..operators.vecstore import (
    admit_vector_delta,
    bucket_rows_for,
    probe_vector_pairs,
    validate_store_dials,
)
from .snapshot_sink import _app_id


def probe_batch(
    batch_df: DataFrame,
    batch_id: int,
    table_dir: str,
    pairs_out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    admit: bool = False,
    app_id: str | None = None,
) -> None:
    """One micro-batch of the loop: minhash Δ once, probe the store
    (bloom + shard prune), append the candidate pairs, then optionally
    admit Δ under the txn fence. Exposed separately so tests can drive
    the exact per-batch semantics without a running stream."""
    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    # ONE minhash pass per batch: the probe and the admission both read
    # this pinned frame
    delta = band_keys_for(batch_df, id_col, text_col).localCheckpoint()
    pairs = probe_store_pairs(spark, delta, table_dir, id_col).distinct()
    (
        pairs.withColumn("_batch_id", F.lit(batch_id))
        .write.mode("append")
        .parquet(pairs_out_dir)
    )
    if admit:
        # Delta-style txn fence (streaming/snapshot_sink.py): a
        # replayed batch (engine at-least-once) must not admit twice —
        # double band keys would emit every colliding pair twice and
        # double-count the bloom (harmless) but break the store ≡
        # band_keys(corpus) maintenance contract.
        last = S.last_txn_version(table_dir, app_id)
        if last is not None and batch_id <= last:
            return
        admit_delta(
            spark,
            delta,
            table_dir,
            extra_meta={"txn_app_id": app_id, "txn_version": batch_id},
        )


def stream_store_probe(
    docs_stream: DataFrame,
    table_dir: str,
    pairs_out_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    admit: bool = False,
    available_now: bool = True,
) -> StreamingQuery:
    """Start the foreachBatch probe loop over a document stream.
    ``admit=True`` turns it into the full streaming admission pipeline:
    probe, emit pairs, then commit the batch's band keys to the store
    exactly-once (txn-fenced on this stream's checkpoint identity)."""
    app = _app_id(checkpoint_dir)

    def _fb(batch_df: DataFrame, batch_id: int) -> None:
        probe_batch(
            batch_df,
            batch_id,
            table_dir,
            pairs_out_dir,
            id_col,
            text_col,
            admit=admit,
            app_id=app,
        )

    writer = docs_stream.writeStream.foreachBatch(_fb).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def vector_probe_batch(
    batch_df: DataFrame,
    batch_id: int,
    table_dir: str,
    pairs_out_dir: str,
    dim: int,
    tau: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    admit: bool = False,
    app_id: str | None = None,
) -> None:
    """The embedding twin of ``probe_batch``: bucket Δ once (under the
    store's validated dim/planes dials), probe the vector index
    (shard PartitionFilters + Δ-bucket bloom + exact cosine verify),
    append the scored pairs, then optionally admit Δ under the txn
    fence. Same at-least-once pairs / exactly-once admission contract."""
    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    validate_store_dials(table_dir, dim)
    delta = bucket_rows_for(batch_df, dim, id_col, vec_col).localCheckpoint()
    pairs = probe_vector_pairs(spark, delta, table_dir, tau, id_col, vec_col)
    (
        pairs.withColumn("_batch_id", F.lit(batch_id))
        .write.mode("append")
        .parquet(pairs_out_dir)
    )
    if admit:
        last = S.last_txn_version(table_dir, app_id)
        if last is not None and batch_id <= last:
            return
        admit_vector_delta(
            spark,
            delta,
            table_dir,
            extra_meta={"txn_app_id": app_id, "txn_version": batch_id},
        )


def stream_vector_probe(
    vecs_stream: DataFrame,
    table_dir: str,
    pairs_out_dir: str,
    checkpoint_dir: str,
    dim: int,
    tau: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    admit: bool = False,
    available_now: bool = True,
) -> StreamingQuery:
    """Start the foreachBatch probe loop over an embedding stream —
    live semantic near-dup monitoring against the persisted vector
    index; ``admit=True`` closes the admission loop exactly-once."""
    app = _app_id(checkpoint_dir)

    def _fb(batch_df: DataFrame, batch_id: int) -> None:
        vector_probe_batch(
            batch_df,
            batch_id,
            table_dir,
            pairs_out_dir,
            dim,
            tau,
            id_col,
            vec_col,
            admit=admit,
            app_id=app,
        )

    writer = vecs_stream.writeStream.foreachBatch(_fb).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
