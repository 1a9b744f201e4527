"""Incremental dedup signature store (operators/sigstore.py): probe
results must equal the batch operator's pairs restricted to the batch,
and the store must stay correct across consecutive appends."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from bike_data_flow_spark.operators import dedup as D
from bike_data_flow_spark.operators import sigstore as G
from bike_data_flow_spark.operators.snapshots import (
    current_version,
    snapshot_read,
)
from bike_data_flow_spark.tables import load


@pytest.fixture()
def store_dir():
    d = os.path.join(
        tempfile.gettempdir(), f"sigstore_test_{os.getpid()}", "sigs"
    )
    shutil.rmtree(os.path.dirname(d), ignore_errors=True)
    yield d
    shutil.rmtree(os.path.dirname(d), ignore_errors=True)


def _pairs(df):
    return {(r.id_a, r.id_b) for r in df.collect()}


def test_incremental_equals_batch_across_two_appends(spark, store_dir):
    """Bootstrap with part A, probe+commit batch B, probe+commit batch
    C. The union of (batch pairs within A) + (probe B) + (probe C) must
    equal the full-corpus batch candidates — i.e. daily incremental
    dedup finds exactly the pairs a from-scratch rerun would, and the
    two appends maintained the store correctly."""
    docs = load(spark, "/root/testdata/sf0.001", "documents")
    part = F.pmod(F.col("doc_id"), F.lit(3))
    a_docs = docs.filter(part == 0)
    b_docs = docs.filter(part == 1)
    c_docs = docs.filter(part == 2)

    G.signature_store_init(a_docs, store_dir)
    v1 = current_version(store_dir)
    got = _pairs(D.minhash_lsh_candidates(a_docs))
    got |= _pairs(
        G.incremental_lsh_pairs(spark, b_docs, store_dir, commit=True)
    )
    assert current_version(store_dir) == v1 + 1  # B's keys admitted
    got |= _pairs(
        G.incremental_lsh_pairs(spark, c_docs, store_dir, commit=True)
    )
    assert current_version(store_dir) == v1 + 2

    want = _pairs(D.minhash_lsh_candidates(docs))
    assert got == want
    assert len(want) > 0

    # the maintained store is exactly the full corpus's band keys
    full_keys = {
        tuple(r) for r in G.band_keys_for(docs).collect()
    }
    stored = {tuple(r) for r in snapshot_read(spark, store_dir).collect()}
    assert stored == full_keys


def test_bloom_prefilter_changes_nothing(spark, store_dir):
    """use_bloom=False must yield the identical pair set (the bloom is
    a pure map-side prefilter: false positives reach the exact join,
    false negatives are impossible)."""
    docs = load(spark, "/root/testdata/sf0.001", "documents")
    delta_flag = F.pmod(F.col("doc_id"), F.lit(4)) == 0
    G.signature_store_init(docs.filter(~delta_flag), store_dir)
    with_bloom = _pairs(
        G.incremental_lsh_pairs(
            spark, docs.filter(delta_flag), store_dir, commit=False
        )
    )
    without = _pairs(
        G.incremental_lsh_pairs(
            spark,
            docs.filter(delta_flag),
            store_dir,
            commit=False,
            use_bloom=False,
        )
    )
    assert with_bloom == without
    assert len(with_bloom) > 0


def test_persisted_bloom_stays_equal_to_from_scratch(spark, store_dir):
    """The OR-maintained bloom bitmap must stay EXACTLY equal to one
    built from scratch over the full store after every append (bitmap
    of a union = bitwise OR of the bitmaps), and a probe reading the
    persisted bloom must match the store-scanning spelling."""
    from bike_data_flow_spark.operators.bloom import bloom_build
    from bike_data_flow_spark.operators.sigstore import (
        _bloom_table,
        _combine,
    )

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    part = F.pmod(F.col("doc_id"), F.lit(3))
    G.signature_store_init(docs.filter(part == 0), store_dir)
    G.incremental_lsh_pairs(
        spark, docs.filter(part == 1), store_dir, commit=True
    ).collect()
    G.incremental_lsh_pairs(
        spark, docs.filter(part == 2), store_dir, commit=True
    ).collect()

    stored = snapshot_read(spark, _bloom_table(store_dir)).first()["bloom"]
    scratch = bloom_build(
        snapshot_read(spark, store_dir).select(_combine()), F.col("_bk_comb")
    ).first()["bloom"]
    assert list(stored) == list(scratch)
    assert any(w != 0 for w in stored)


def test_bloomless_store_falls_back(spark, store_dir):
    """A store bootstrapped WITHOUT signature_store_init (no bloom
    table) must still probe correctly — the prefilter builds from the
    store once, and the commit path leaves no half-maintained bloom."""
    from bike_data_flow_spark.operators.sigstore import _bloom_table
    from bike_data_flow_spark.operators.snapshots import (
        current_version as cv,
        snapshot_write,
    )

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    delta_flag = F.pmod(F.col("doc_id"), F.lit(4)) == 0
    snapshot_write(
        G.band_keys_for(docs.filter(~delta_flag)), store_dir, mode="overwrite"
    )
    want = _pairs(
        G.incremental_lsh_pairs(
            spark,
            docs.filter(delta_flag),
            store_dir,
            commit=False,
            use_bloom=False,
        )
    )
    got = _pairs(
        G.incremental_lsh_pairs(
            spark, docs.filter(delta_flag), store_dir, commit=True
        )
    )
    assert got == want and len(got) > 0
    assert cv(_bloom_table(store_dir)) is None  # stayed bloomless
