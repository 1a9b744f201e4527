"""Incremental MinHash-LSH dedup against a PERSISTED signature store.

How a 100 TB pipeline actually runs dedup daily: the corpus's LSH band
keys are computed once and committed as a snapshot table
(operators/snapshots.py — atomic versioned manifests, time travel,
race-safe publish); each new batch (Δ) minhashes ITS OWN documents
only and probes the store with the band equi-join, so per-day work is
O(|Δ| shingles + band matches) instead of a full-corpus rescan.
Candidate semantics are exactly the batch operator's
(dedup.minhash_lsh_candidates): the store holds the same
(doc_id, band, band_key) rows that operator derives, so
    probe(Δ, store)  ≡  full-corpus LSH pairs restricted to pairs
                         touching Δ
— the contract the incremental-maintenance test and the
``incremental_dedup_pairs`` oracle pin.

Scale notes:
- The store is rows, not state: band keys append per batch
  (snapshot append = manifest union, no rewrite); compaction and
  expiry come free from snapshots.py.
- A bloom filter over the store's combined band keys broadcasts to the
  probe side and drops non-colliding Δ keys MAP-SIDE before the
  shuffle join (most new docs collide with nothing — that is the
  point of dedup). False positives just reach the exact equi-join;
  false negatives cannot occur, so results are unchanged.
- The bloom is PERSISTED (sibling one-row snapshot table) and
  maintained by OR-merging each admitted Δ's bitmap — a probe never
  scans the store to build its prefilter, which at 100 TB would be a
  daily TBs-of-band-keys scan. Commit order is bloom-then-append, so
  a crash between the two errs on false positives, never negatives.
- Contract: Δ's ids are disjoint from the store's (the ingest layer's
  duplicate-payload gate guarantees exactly-once admission upstream).

Reference parity: the reference has no incremental dedup — this is a
north-star extension; semantics anchor to dedup.minhash_lsh_candidates
which mirrors the reference's batch near-dup intent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .bloom import bloom_build, with_bloom_flag
from .dedup import (
    MINHASH_BANDS,
    MINHASH_K,
    minhash_band_keys,
    minhash_signatures,
)
from .snapshots import current_version, snapshot_read, snapshot_write


def _bloom_table(table_dir: str) -> str:
    """Sibling snapshot table holding ONE row: the store's combined
    band-key bloom bitmap. Persisted so a probe never scans the store
    to build its prefilter (at 100 TB the store itself is TBs of band
    keys — rescanning it per daily probe would defeat the whole
    incremental contract); maintained by OR-merging each admitted Δ's
    bitmap (bitmap of a union IS the bitwise OR of the bitmaps, same
    bits/k/hashes, so the stored bloom stays exactly equal to one
    built from scratch — pinned by tests/test_sigstore.py)."""
    return table_dir.rstrip("/") + "_bloom"


def _or_blooms(a, b):
    """Elementwise OR of two one-row [bloom: array<long>] frames."""
    return a.crossJoin(b.select(F.col("bloom").alias("_b2"))).select(
        F.zip_with(
            "bloom", "_b2", lambda x, y: x.bitwiseOR(y)
        ).alias("bloom")
    )

def _combine():
    """band_key < 2^46 (base-31 Horner over 4 longs < 2^31) and band <
    MINHASH_BANDS, so band_key * MINHASH_BANDS + band is a
    collision-free combine well inside BIGINT — the bloom's probe
    value. (Built lazily: Columns need a live SparkContext.)"""
    return (
        F.col("band_key") * F.lit(MINHASH_BANDS) + F.col("band")
    ).alias("_bk_comb")


def band_keys_for(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
) -> DataFrame:
    """(id, band, band_key) — the store's row format, identical to the
    batch operator's band stage."""
    return minhash_band_keys(
        minhash_signatures(docs, id_col, text_col, n, k), id_col, k, bands
    )


def signature_store_init(
    docs: DataFrame,
    table_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> int:
    """Bootstrap (or reset) the store from a corpus; returns version.
    Also bootstraps the sibling bloom table (built from the freshly
    written store — one bootstrap-time read, never repeated by
    probes)."""
    version = snapshot_write(
        band_keys_for(docs, id_col, text_col),
        table_dir,
        mode="overwrite",
        meta={"format": "minhash_band_keys", "k": MINHASH_K,
              "bands": MINHASH_BANDS},
    )
    spark = docs.sparkSession
    snapshot_write(
        bloom_build(
            snapshot_read(spark, table_dir).select(_combine()),
            F.col("_bk_comb"),
        ),
        _bloom_table(table_dir),
        mode="overwrite",
        meta={"covers_store_version": version},
    )
    return version


def incremental_lsh_pairs(
    spark: SparkSession,
    new_docs: DataFrame,
    table_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    commit: bool = True,
    use_bloom: bool = True,
) -> DataFrame:
    """Distinct candidate near-dup pairs (id_a < id_b) that TOUCH the
    new batch: Δ×store band collisions plus Δ×Δ collisions — without
    rescanning the stored corpus.

    ``commit=True`` appends Δ's band keys to the store in the same
    call (the daily-ingest shape: probe, then admit), so consecutive
    calls maintain the store incrementally. Δ's keys are pinned with an
    eager localCheckpoint first — the probe, the self-join, and the
    commit all read the pinned rows, so the shingle→minhash pipeline
    runs exactly once per batch and the commit cannot observe a
    different recomputation than the probe did.
    """
    delta = band_keys_for(new_docs, id_col, text_col).localCheckpoint()
    store = snapshot_read(spark, table_dir)
    bloom_dir = _bloom_table(table_dir)
    has_bloom_table = current_version(bloom_dir) is not None

    probe = delta
    stored_bloom = None
    if use_bloom:
        # the persisted one-row bitmap — NO store scan per probe; a
        # store bootstrapped outside signature_store_init falls back
        # to building it once from the store (and from then on the
        # commit path below keeps nothing, preserving old behavior)
        stored_bloom = (
            snapshot_read(spark, bloom_dir)
            if has_bloom_table
            else bloom_build(store.select(_combine()), F.col("_bk_comb"))
        )
        probe = (
            with_bloom_flag(delta, stored_bloom, _combine(), flag="_hit")
            .filter(F.col("_hit"))
            .drop("_hit")
        )

    cross = (
        probe.select(F.col(id_col).alias("_did"), "band", "band_key")
        .join(
            store.select(F.col(id_col).alias("_sid"), "band", "band_key"),
            ["band", "band_key"],
        )
        .select(
            F.least("_did", "_sid").alias("id_a"),
            F.greatest("_did", "_sid").alias("id_b"),
        )
    )
    a = delta.select(F.col(id_col).alias("id_a"), "band", "band_key")
    b = delta.select(F.col(id_col).alias("id_b"), "band", "band_key")
    within = (
        a.join(b, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    pairs = cross.unionByName(within).distinct()
    if commit:
        if has_bloom_table:
            # bloom FIRST, store append second: a crash in between
            # leaves extra bits in the bloom (false positives — the
            # exact join absorbs them); the reverse order could leave
            # admitted keys missing from the bloom, and a bloom false
            # NEGATIVE would silently drop real candidates forever
            merged = _or_blooms(
                stored_bloom
                if stored_bloom is not None
                else snapshot_read(spark, bloom_dir),
                bloom_build(delta.select(_combine()), F.col("_bk_comb")),
            )
            snapshot_write(
                merged,
                bloom_dir,
                mode="overwrite",
                # the bloom is written BEFORE the store append, so it
                # covers the current store version PLUS the in-flight Δ
                meta={
                    "includes_delta_beyond_store_version": current_version(
                        table_dir
                    )
                },
            )
        snapshot_write(delta, table_dir, mode="append")
    return pairs
