"""Incremental embedding near-dup against a PERSISTED vector index.

The embedding twin of operators/sigstore.py, for the other half of a
daily curation pipeline: semantic (embedding-cosine) near-dup of each
new batch against a corpus whose index was built once. The corpus's
hyperplane-LSH bucket rows — (vec_id, bucket, embedding), i.e. a
bucket-keyed vector index table with the payload riding along — are
committed as a snapshot table (operators/snapshots.py); each new batch
(Δ) buckets ITS OWN vectors only and probes the store with the bucket
equi-join + exact-cosine verify, so per-day work is
O(|Δ| + bucket collisions) instead of a full-corpus O(N²) rerun.

Contract (pinned by tests/test_vecstore.py and the
``incremental_embedding_dedup`` oracle):

    probe(Δ, store)  ≡  full-corpus bucketed near-dup pairs
                        (same bucket ∧ round(cos,6) ≥ τ)
                        restricted to pairs touching Δ

Scale notes:
- Unlike MinHash banding, a vector has exactly ONE bucket, so every
  colliding pair is produced once by the equi-join — no distinct.
- The store is the BIG side, pruned in two layers before the join
  shuffles anything: (1) it persists Hive-partitioned on
  pmod(bucket, VECSTORE_SHARDS), and Δ's occupied shards — a literal
  list bounded by VECSTORE_SHARDS, never corpus-sized — prune the scan
  at the FILE LISTING level (PartitionFilters); (2) a bloom over Δ's
  occupied buckets drops surviving non-colliding store rows MAP-SIDE
  before the shuffle. Bloom false positives just reach the exact
  equi-join; false negatives cannot occur.
- Exact verify runs at CANDIDATE cardinality with the same left-fold
  cosine the batch operators use (similarity.cosine) — the bucket join
  only selects which pairs get scored, it never approximates a value.
- The planes dial (similarity.N_HYPERPLANES, resolved at call time)
  governs expected per-bucket collision work exactly as in the batch
  kNN family; the store records the plane count it was built with and
  ``incremental_cosine_pairs`` refuses a probe under a different dial
  (a bucket id is only meaningful under the planes that produced it).
- Contract: Δ's ids are disjoint from the store's (the ingest layer's
  duplicate-payload gate guarantees exactly-once admission upstream),
  and vectors are non-zero (cosine of a zero-norm vector is NaN, which
  Spark's comparison semantics order ABOVE any threshold — screen
  degenerate embeddings at ingest, like the expectation-suite checks
  do for scalar columns).

Reference parity: the reference has no vector stack at all — this is a
north-star extension; semantics anchor to the batch pair
(`embedding_near_dup_pairs` exact join, `hyperplane_bucket` LSH).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .bloom import bloom_build, with_bloom_flag
from .similarity import cosine, hyperplane_bucket
from .snapshots import (
    current_version,
    latest_meta,
    snapshot_read,
    snapshot_write,
    table_layout,
)

# Directory-layout shard: the store persists Hive-partitioned on
# pmod(bucket, VECSTORE_SHARDS), NOT on bucket itself — the bucket
# count is 2^planes (dial-scaled to ~corpus/cap at 100 TB, far too
# many directories), while the shard count is bounded by construction,
# so Δ's occupied shards collect to a bounded literal IN-list
# that prunes the store scan at the FILE LISTING level
# (PartitionFilters) before the bloom prunes surviving rows map-side.
# Like sigstore.SIGSTORE_SHARDS (r9) this is a RUNTIME DIAL, resolved
# at store-INIT time and RECORDED in the manifest; probes and appends
# derive shard values from the recorded modulus, so redialing never
# breaks an existing store. Occupied dirs = min(2^planes, shards):
# the gate default 64 keeps per-commit file counts commensurate with
# gate-scale corpora; a 100 TB deployment dials it up with the planes.
VECSTORE_SHARDS = 64


def store_shards(table_dir: str) -> int:
    """The shard modulus the store was built with (manifest property);
    falls back to the current dial for stores predating the record."""
    return latest_meta(table_dir).get("shards", VECSTORE_SHARDS)


def bucket_rows_for(
    vecs: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | None = None,
    n_shards: int | None = None,
) -> DataFrame:
    """(id, bucket, embedding, _shard) — the store's row format.
    ``n_planes`` resolves to the CURRENT similarity.N_HYPERPLANES at
    call time inside hyperplane_bucket, honoring the runtime dial;
    ``n_shards`` likewise — callers touching an existing store pass
    that store's recorded modulus instead."""
    if n_shards is None:
        n_shards = VECSTORE_SHARDS
    return vecs.select(
        F.col(id_col),
        hyperplane_bucket(F.col(vec_col), dim, n_planes).alias("bucket"),
        F.col(vec_col),
    ).withColumn(
        "_shard", F.pmod(F.col("bucket"), F.lit(n_shards)).cast("int")
    )


def _planes() -> int:
    from . import similarity as S

    return S.N_HYPERPLANES


def vector_store_init(
    vecs: DataFrame,
    table_dir: str,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | None = None,
) -> int:
    """Bootstrap (or reset) the index from a corpus; returns version.
    The manifest records dim + planes so later probes can verify they
    run under the same bucketing. Rows repartition on _shard first so
    the Hive-partitioned write emits one file per shard per commit —
    partitionBy alone writes one file per (task × shard), spraying
    thousands of tiny files that drown later probes in file opens."""
    planes = n_planes if n_planes is not None else _planes()
    n_shards = VECSTORE_SHARDS
    return snapshot_write(
        bucket_rows_for(
            vecs, dim, id_col, vec_col, planes, n_shards
        ).repartition("_shard"),
        table_dir,
        mode="overwrite",
        meta={"format": "hyperplane_buckets", "dim": dim, "planes": planes,
              "shards": n_shards},
        partition_by=["_shard"],
    )


def validate_store_dials(table_dir: str, dim: int) -> dict:
    """Refuse a probe whose bucketing could not match the store's: the
    manifest records the planes dial and dim the index was built with,
    and a mismatch on EITHER silently buckets Δ through a different
    projection, dropping real collisions — so both fail loudly instead.
    Returns the store's meta for the caller to carry forward."""
    meta = latest_meta(table_dir)
    planes = _planes()
    if meta and meta.get("planes") != planes:
        raise ValueError(
            f"store {table_dir} was bucketed at planes={meta.get('planes')}, "
            f"current dial is {planes}: rebuild the store or match the dial "
            "(bucket ids are only comparable under the planes that made them)"
        )
    if meta and meta.get("dim") != dim:
        # same failure mode as a planes mismatch, so the same loud
        # refusal: a different dim projects through different
        # hyperplane components, silently bucketing Δ elsewhere and
        # dropping real collisions instead of erroring
        raise ValueError(
            f"store {table_dir} was built at dim={meta.get('dim')}, probe "
            f"requested dim={dim}: rebuild the store or match the dim "
            "(bucket ids are only comparable under the projection that "
            "made them)"
        )
    return meta


def probe_vector_pairs(
    spark: SparkSession,
    delta: DataFrame,
    table_dir: str,
    tau: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    use_bloom: bool = True,
) -> DataFrame:
    """Δ×store near-dup pairs from PRECOMPUTED Δ bucket rows (the
    ``bucket_rows_for`` format, ideally localCheckpointed by the
    caller); exact-verified at round(cos,6) ≥ tau. The building block
    the batch entry point (incremental_cosine_pairs) and the streaming
    foreachBatch probe (streaming/store_probe.py) share — one
    bucketing pass per batch. The caller is responsible for
    ``validate_store_dials`` (the dials govern how Δ was bucketed)."""
    store = snapshot_read(spark, table_dir)

    if "_shard" in store.columns:
        # directory-level prune FIRST: Δ's occupied shards are a
        # bounded literal list (≤ the store's recorded modulus by
        # construction — collecting it can never be corpus-sized), and
        # _shard is the store's Hive partition column, so this lands
        # as PartitionFilters — only the matching directories are even
        # LISTED, let alone scanned. Shard values derive from the
        # STORE's recorded modulus, not Δ's _shard column (the runtime
        # dial may have moved). Column-gated for symmetry with
        # sigstore: a legacy store without the column still probes,
        # just without the directory skip.
        n_shards = store_shards(table_dir)
        shards = [
            r[0]
            for r in delta.select(
                F.pmod(F.col("bucket"), F.lit(n_shards))
                .cast("int")
                .alias("_s")
            )
            .distinct()
            .collect()
        ]
        store = store.filter(F.col("_shard").isin(shards))

    if use_bloom:
        # Δ is the SMALL side here (the reverse of sigstore's direction):
        # bloom its occupied buckets and drop non-colliding STORE rows
        # map-side, before the store's vectors ever enter the shuffle.
        bl = bloom_build(delta.select("bucket"), F.col("bucket"))
        store = (
            with_bloom_flag(store, bl, F.col("bucket"), flag="_hit")
            .filter(F.col("_hit"))
            .drop("_hit")
        )

    return (
        delta.select(
            F.col(id_col).alias("_did"), "bucket", F.col(vec_col).alias("_dv")
        )
        .join(
            store.select(
                F.col(id_col).alias("_sid"),
                "bucket",
                F.col(vec_col).alias("_sv"),
            ),
            "bucket",
        )
        .select(
            F.least("_did", "_sid").alias("id_a"),
            F.greatest("_did", "_sid").alias("id_b"),
            F.round(cosine(F.col("_dv"), F.col("_sv")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= tau)
    )


def admit_vector_delta(
    spark: SparkSession,
    delta: DataFrame,
    table_dir: str,
    extra_meta: dict | None = None,
) -> int | None:
    """Admit PRECOMPUTED Δ bucket rows into the index. Returns the new
    version, or None for an empty Δ — no version bump for a no-op day
    (a partitionBy write of zero rows emits a fileless dir;
    snapshot_read tolerates those since r9, but the manifest chain
    should not grow at all). Meta/layout are carried forward so
    latest_meta keeps the dim/planes dials validatable after any
    number of appends — minus any txn fence keys a previous writer
    wrote (the fence must only see keys its own commit wrote);
    ``extra_meta`` rides beside the carried properties."""
    if delta.isEmpty():
        return None
    props = {
        k: v
        for k, v in latest_meta(table_dir).items()
        if not k.startswith("txn_")
    }
    meta = {**props, **(extra_meta or {})}
    # adopt the EXISTING table's layout (a legacy layout-less store
    # appends layout-less — forcing ["_shard"] onto it would trip the
    # mixed-layout guard); only a brand-new table gets the sharded
    # default
    layout = (
        table_layout(table_dir)
        if current_version(table_dir) is not None
        else ["_shard"]
    )
    if "_shard" in layout:
        # re-derive _shard under the STORE's recorded modulus (the
        # runtime dial may differ since init)
        delta = delta.withColumn(
            "_shard",
            F.pmod(F.col("bucket"), F.lit(store_shards(table_dir))).cast(
                "int"
            ),
        )
    if layout:
        # one file per Hive dir per commit (see vector_store_init's
        # repartition note)
        delta = delta.repartition(*layout)
    return snapshot_write(
        delta,
        table_dir,
        mode="append",
        meta=meta or None,
        partition_by=layout or None,
    )


def incremental_cosine_pairs(
    spark: SparkSession,
    new_vecs: DataFrame,
    table_dir: str,
    dim: int,
    tau: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    commit: bool = True,
    use_bloom: bool = True,
    include_within: bool = True,
) -> DataFrame:
    """(id_a < id_b, cos_sim) near-dup pairs that TOUCH the new batch:
    Δ×store bucket collisions plus (``include_within``) Δ×Δ
    collisions, exact-verified at round(cos,6) ≥ tau — without
    rescanning the stored corpus. ``include_within=False`` returns the
    Δ×store arm only — the monitoring-probe shape (streaming
    foreachBatch), where within-batch pairs belong to the admission
    loop that will commit the batch.

    ``commit=True`` appends Δ's bucket rows to the store in the same
    call (the daily-ingest shape: probe, then admit). Δ's rows are
    pinned with an eager localCheckpoint first, so the probe, the
    self-join, and the commit all read one materialization.
    """
    validate_store_dials(table_dir, dim)
    delta = bucket_rows_for(
        new_vecs, dim, id_col, vec_col, _planes()
    ).localCheckpoint()
    cross = probe_vector_pairs(
        spark, delta, table_dir, tau, id_col, vec_col, use_bloom
    )
    if include_within:
        a = delta.select(
            F.col(id_col).alias("id_a"), "bucket", F.col(vec_col).alias("_ea")
        )
        b = delta.select(
            F.col(id_col).alias("id_b"), "bucket", F.col(vec_col).alias("_eb")
        )
        within = (
            a.join(b, "bucket")
            .filter(F.col("id_a") < F.col("id_b"))
            .select(
                "id_a",
                "id_b",
                F.round(cosine(F.col("_ea"), F.col("_eb")), 6).alias(
                    "cos_sim"
                ),
            )
            .filter(F.col("cos_sim") >= tau)
        )
        # cos is a SYMMETRIC fold (zip_with pairs elementwise, the sum
        # folds left-to-right over positions), so least/greatest id
        # ordering cannot change the value; Δ∩store = ∅ keeps the two
        # arms disjoint.
        pairs = cross.unionByName(within)
    else:
        pairs = cross
    if commit:
        admit_vector_delta(spark, delta, table_dir)
    return pairs
