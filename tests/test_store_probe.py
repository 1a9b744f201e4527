"""foreachBatch store probe (streaming/store_probe.py): per-batch
probe equals the batch operator's Δ×store arm, admissions are picked
up live by the next batch, and replayed batches admit exactly once."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from bike_data_flow_spark.operators import sigstore as G
from bike_data_flow_spark.operators.snapshots import (
    current_version,
    snapshot_read,
)
from bike_data_flow_spark.streaming.store_probe import (
    probe_batch,
    stream_store_probe,
)
from bike_data_flow_spark.tables import load

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def dirs():
    base = os.path.join(tempfile.gettempdir(), f"store_probe_test_{os.getpid()}")
    shutil.rmtree(base, ignore_errors=True)
    yield {
        "store": os.path.join(base, "store"),
        "pairs": os.path.join(base, "pairs"),
        "ckpt": os.path.join(base, "ckpt"),
    }
    shutil.rmtree(base, ignore_errors=True)


def _pairs(df):
    return {(r.id_a, r.id_b) for r in df.collect()}


def _out_pairs(spark, out_dir, batch_id=None):
    df = spark.read.parquet(out_dir)
    if batch_id is not None:
        df = df.filter(F.col("_batch_id") == batch_id)
    return _pairs(df.select("id_a", "id_b"))


def test_probe_batch_admission_loop_and_replay_fence(spark, dirs):
    """Drive the per-batch function directly: batch 0 probes store A
    and admits; batch 1 must see batch 0's admission LIVE (store
    re-resolved per batch); a REPLAY of batch 1 re-emits pairs
    (at-least-once sink, documented) but admits nothing (txn fence)."""
    docs = load(spark, SF, "documents")
    part = F.pmod(F.col("doc_id"), F.lit(3))
    a, b1, b2 = (docs.filter(part == i) for i in range(3))
    G.signature_store_init(a, dirs["store"])

    want_b1 = _pairs(
        G.incremental_lsh_pairs(
            spark, b1, dirs["store"], commit=False, include_within=False
        )
    )
    probe_batch(b1, 0, dirs["store"], dirs["pairs"], admit=True, app_id="w")
    assert _out_pairs(spark, dirs["pairs"], 0) == want_b1
    v_after_b1 = current_version(dirs["store"])

    # batch 1's expectation is computed against the UPDATED store —
    # matching proves the probe re-resolves the store per batch
    want_b2 = _pairs(
        G.incremental_lsh_pairs(
            spark, b2, dirs["store"], commit=False, include_within=False
        )
    )
    probe_batch(b2, 1, dirs["store"], dirs["pairs"], admit=True, app_id="w")
    assert _out_pairs(spark, dirs["pairs"], 1) == want_b2
    assert want_b2 - want_b1, "b2 must collide with b1's admitted docs too"
    v_after_b2 = current_version(dirs["store"])
    assert v_after_b2 == v_after_b1 + 1

    # REPLAY batch 1 (engine at-least-once): no second admission
    probe_batch(b2, 1, dirs["store"], dirs["pairs"], admit=True, app_id="w")
    assert current_version(dirs["store"]) == v_after_b2  # fence held

    # the maintained store is exactly the full corpus's band keys, and
    # the persisted bloom stays bit-equal to a from-scratch build
    from bike_data_flow_spark.operators.bloom import bloom_build

    full = {
        (r.doc_id, r.band, r.band_key) for r in G.band_keys_for(docs).collect()
    }
    stored = {
        (r.doc_id, r.band, r.band_key)
        for r in snapshot_read(spark, dirs["store"]).collect()
    }
    assert stored == full
    got_bloom = snapshot_read(spark, G._bloom_table(dirs["store"])).first()[
        "bloom"
    ]
    scratch = bloom_build(
        snapshot_read(spark, dirs["store"]).select(G._combine()),
        F.col("_bk_comb"),
    ).first()["bloom"]
    assert list(got_bloom) == list(scratch)


def test_stream_equivalence_with_stream_static_spelling(spark, dirs):
    """The real streaming engine driving the foreachBatch probe must
    emit exactly the Δ×store pairs the batch operator (and therefore
    the stream-static gate query) finds for the same split."""
    docs = load(spark, SF, "documents")
    delta_flag = F.pmod(F.col("doc_id"), F.lit(4)) == 0
    G.signature_store_init(docs.filter(~delta_flag), dirs["store"])
    want = _pairs(
        G.incremental_lsh_pairs(
            spark,
            docs.filter(delta_flag),
            dirs["store"],
            commit=False,
            include_within=False,
        )
    )

    schema = spark.read.parquet(f"{SF}/documents.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(SF)
        .filter(delta_flag)
    )
    q = stream_store_probe(stream, dirs["store"], dirs["pairs"], dirs["ckpt"])
    q.awaitTermination(120)
    assert _out_pairs(spark, dirs["pairs"]) == want
    assert len(want) > 0
    # probe-only: the store was not touched
    assert current_version(dirs["store"]) == 1


def test_empty_batch_is_a_noop(spark, dirs):
    """An empty micro-batch writes nothing and admits nothing."""
    docs = load(spark, SF, "documents")
    G.signature_store_init(docs, dirs["store"])
    probe_batch(
        docs.filter(F.lit(False)), 0, dirs["store"], dirs["pairs"],
        admit=True, app_id="w",
    )
    assert not os.path.exists(dirs["pairs"])  # no sink write at all
    assert current_version(dirs["store"]) == 1


# ---- embedding twin (stream_vector_probe) --------------------------------

_DIM = 64
_TAU = 0.4


def test_vector_probe_batch_admission_and_replay_fence(spark, dirs):
    """The vector twin: batch 0 probes index A and admits; batch 1 sees
    the admission live; replay admits nothing; maintained index equals
    the full corpus's bucket rows."""
    from bike_data_flow_spark.operators import vecstore as V
    from bike_data_flow_spark.streaming.store_probe import vector_probe_batch

    emb = load(spark, SF, "embeddings")
    part = F.pmod(F.col("vec_id"), F.lit(3))
    a, b1, b2 = (emb.filter(part == i) for i in range(3))
    V.vector_store_init(a, dirs["store"], dim=_DIM)

    def _want(batch):
        return {
            (r.id_a, r.id_b, r.cos_sim)
            for r in V.incremental_cosine_pairs(
                spark, batch, dirs["store"], dim=_DIM, tau=_TAU,
                commit=False, include_within=False,
            ).collect()
        }

    def _got(batch_id):
        df = spark.read.parquet(dirs["pairs"]).filter(
            F.col("_batch_id") == batch_id
        )
        return {(r.id_a, r.id_b, r.cos_sim) for r in df.collect()}

    want_b1 = _want(b1)
    vector_probe_batch(
        b1, 0, dirs["store"], dirs["pairs"], _DIM, _TAU, admit=True,
        app_id="w",
    )
    assert _got(0) == want_b1
    v1 = current_version(dirs["store"])

    want_b2 = _want(b2)  # computed against the UPDATED store
    vector_probe_batch(
        b2, 1, dirs["store"], dirs["pairs"], _DIM, _TAU, admit=True,
        app_id="w",
    )
    assert _got(1) == want_b2
    v2 = current_version(dirs["store"])
    assert v2 == v1 + 1

    vector_probe_batch(  # replay: fence must hold
        b2, 1, dirs["store"], dirs["pairs"], _DIM, _TAU, admit=True,
        app_id="w",
    )
    assert current_version(dirs["store"]) == v2

    from bike_data_flow_spark.operators.vecstore import bucket_rows_for

    full = {(r.vec_id, r.bucket) for r in bucket_rows_for(emb, _DIM).collect()}
    stored = {
        (r.vec_id, r.bucket)
        for r in snapshot_read(spark, dirs["store"]).collect()
    }
    assert stored == full


def test_vector_stream_equivalence(spark, dirs):
    """The real streaming engine driving the vector probe must emit
    exactly the batch operator's Δ×store arm for the same split."""
    from bike_data_flow_spark.operators import vecstore as V
    from bike_data_flow_spark.streaming.store_probe import stream_vector_probe

    emb = load(spark, SF, "embeddings")
    delta_flag = F.pmod(F.col("vec_id"), F.lit(4)) == 0
    V.vector_store_init(emb.filter(~delta_flag), dirs["store"], dim=_DIM)
    want = {
        (r.id_a, r.id_b, r.cos_sim)
        for r in V.incremental_cosine_pairs(
            spark, emb.filter(delta_flag), dirs["store"], dim=_DIM,
            tau=_TAU, commit=False, include_within=False,
        ).collect()
    }

    schema = spark.read.parquet(f"{SF}/embeddings.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "embeddings.parquet")
        .parquet(SF)
        .filter(delta_flag)
    )
    q = stream_vector_probe(
        stream, dirs["store"], dirs["pairs"], dirs["ckpt"], dim=_DIM,
        tau=_TAU,
    )
    q.awaitTermination(120)
    got = {
        (r.id_a, r.id_b, r.cos_sim)
        for r in spark.read.parquet(dirs["pairs"])
        .select("id_a", "id_b", "cos_sim")
        .collect()
    }
    assert got == want and len(want) > 0
    assert current_version(dirs["store"]) == 1  # probe-only
