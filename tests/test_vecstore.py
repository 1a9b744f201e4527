"""Incremental embedding near-dup index (operators/vecstore.py): probe
results must equal the batch bucketed near-dup restricted to the batch,
and the index must stay correct across consecutive appends."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from bike_data_flow_spark.operators import similarity as S
from bike_data_flow_spark.operators import vecstore as V
from bike_data_flow_spark.operators.snapshots import (
    current_version,
    snapshot_read,
)
from bike_data_flow_spark.tables import load

_DIM = 64
_TAU = 0.4


@pytest.fixture()
def store_dir():
    d = os.path.join(
        tempfile.gettempdir(), f"vecstore_test_{os.getpid()}", "vecs"
    )
    shutil.rmtree(os.path.dirname(d), ignore_errors=True)
    yield d
    shutil.rmtree(os.path.dirname(d), ignore_errors=True)


def _pairs(df):
    return {(r.id_a, r.id_b, r.cos_sim) for r in df.collect()}


def _batch_bucketed_pairs(emb):
    """The from-scratch truth: same-bucket pairs with round(cos,6) ≥ τ."""
    e = emb.select(
        "vec_id",
        S.hyperplane_bucket(F.col("embedding"), _DIM).alias("bucket"),
        "embedding",
    )
    a = e.select(
        F.col("vec_id").alias("id_a"), "bucket", F.col("embedding").alias("_ea")
    )
    b = e.select(
        F.col("vec_id").alias("id_b"), "bucket", F.col("embedding").alias("_eb")
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(S.cosine(F.col("_ea"), F.col("_eb")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= _TAU)
    )


def test_incremental_equals_batch_across_two_appends(spark, store_dir):
    """Bootstrap with part A, probe+commit batch B, probe+commit batch
    C. The union of (batch pairs within A) + (probe B) + (probe C) must
    equal the full-corpus batch pairs — daily incremental semantic
    dedup finds exactly what a from-scratch rerun would, and the two
    appends maintained the index correctly."""
    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    part = F.pmod(F.col("vec_id"), F.lit(3))
    a_vecs = emb.filter(part == 0)
    b_vecs = emb.filter(part == 1)
    c_vecs = emb.filter(part == 2)

    V.vector_store_init(a_vecs, store_dir, dim=_DIM)
    v1 = current_version(store_dir)
    got = _pairs(_batch_bucketed_pairs(a_vecs))
    got |= _pairs(
        V.incremental_cosine_pairs(
            spark, b_vecs, store_dir, dim=_DIM, tau=_TAU, commit=True
        )
    )
    assert current_version(store_dir) == v1 + 1  # B's rows admitted
    got |= _pairs(
        V.incremental_cosine_pairs(
            spark, c_vecs, store_dir, dim=_DIM, tau=_TAU, commit=True
        )
    )
    assert current_version(store_dir) == v1 + 2

    want = _pairs(_batch_bucketed_pairs(emb))
    assert got == want
    assert len(want) > 0

    # the maintained index is exactly the full corpus's bucket rows
    full = {
        (r.vec_id, r.bucket)
        for r in V.bucket_rows_for(emb, _DIM).collect()
    }
    stored = {
        (r.vec_id, r.bucket)
        for r in snapshot_read(spark, store_dir).collect()
    }
    assert stored == full


def test_bloom_prefilter_changes_nothing(spark, store_dir):
    """use_bloom=False must yield the identical pair set (the bloom is
    a pure map-side store prefilter: false positives reach the exact
    join, false negatives are impossible)."""
    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    delta_flag = F.pmod(F.col("vec_id"), F.lit(4)) == 0
    V.vector_store_init(emb.filter(~delta_flag), store_dir, dim=_DIM)
    with_bloom = _pairs(
        V.incremental_cosine_pairs(
            spark, emb.filter(delta_flag), store_dir, dim=_DIM, tau=_TAU,
            commit=False,
        )
    )
    without = _pairs(
        V.incremental_cosine_pairs(
            spark, emb.filter(delta_flag), store_dir, dim=_DIM, tau=_TAU,
            commit=False, use_bloom=False,
        )
    )
    assert with_bloom == without
    assert len(with_bloom) > 0


def test_planes_dial_mismatch_refused(spark, store_dir):
    """A probe under a different planes dial than the store was built
    with must fail loudly — bucket ids are not comparable across
    dials."""
    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    delta_flag = F.pmod(F.col("vec_id"), F.lit(4)) == 0
    V.vector_store_init(
        emb.filter(~delta_flag), store_dir, dim=_DIM, n_planes=4
    )
    old = S.N_HYPERPLANES
    S.N_HYPERPLANES = 8
    try:
        with pytest.raises(ValueError, match="planes"):
            V.incremental_cosine_pairs(
                spark, emb.filter(delta_flag), store_dir, dim=_DIM, tau=_TAU
            )
    finally:
        S.N_HYPERPLANES = old
