"""End-to-end invariants of the composed curation funnel (curation_v2):
the DuckDB oracle pins exact values at three SFs; these pin the
structural contracts a refactor of any single stage could silently
break while still producing *plausible* numbers."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from bike_data_flow_spark.queries.textops4 import (  # noqa: E402
    _BUDGET_TOKENS,
    curation_v2,
)
from bike_data_flow_spark.tables import load  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def test_curation_v2_funnel_invariants(spark):
    rows = curation_v2(spark, SF_DIR).collect()
    assert rows, "curation funnel produced no strata"

    # split labels are the closed three-way partition
    assert {r["split"] for r in rows} <= {"train", "val", "test"}

    # every stratum is non-degenerate and the epoch algebra is exact:
    # full_epochs/oversample_frac must re-derive from the integers
    for r in rows:
        assert r["n_docs"] > 0 and r["n_tokens"] > 0
        assert r["full_epochs"] == r["target_tokens"] // r["n_tokens"]
        frac = (r["target_tokens"] % r["n_tokens"]) / r["n_tokens"]
        assert abs(r["oversample_frac"] - round(frac, 6)) < 1e-12

    # per split, the temperature mixture allocates the whole budget
    # (integer rounding leaves at most |sources|/2 tokens of drift)
    by_split: dict[str, int] = {}
    n_sources: dict[str, int] = {}
    for r in rows:
        by_split[r["split"]] = by_split.get(r["split"], 0) + r["target_tokens"]
        n_sources[r["split"]] = n_sources.get(r["split"], 0) + 1
    for split, total in by_split.items():
        assert abs(total - _BUDGET_TOKENS) <= n_sources[split], (
            split,
            total,
        )

    # the funnel only ever REMOVES: curated token mass is bounded by the
    # corpus total, and curated docs by the corpus count
    docs = load(spark, SF_DIR, "documents")
    corpus = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size(F.split(F.trim(F.lower("text")), r"\s+"))).alias("tok"),
    ).first()
    assert sum(r["n_docs"] for r in rows) <= corpus["n"]
    assert sum(r["n_tokens"] for r in rows) <= corpus["tok"]


def test_embedding_curation_funnel_invariants(spark):
    from bike_data_flow_spark.queries.vectors import (
        _EC_MAX_ABS,
        _SEM_K,
        embedding_curation,
    )

    rows = embedding_curation(spark, SF_DIR).collect()
    assert rows, "embedding funnel produced no strata"
    assert {r["split"] for r in rows} <= {"train", "val", "test"}
    for r in rows:
        assert r["n_vecs"] > 0
        assert 1 <= r["n_clusters"] <= _SEM_K

    # removal-only: the curated census never exceeds the quality-gated
    # population (the funnel's widest stage)
    emb = load(spark, SF_DIR, "embeddings")
    vd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    gated = emb.filter(
        F.array_max(F.transform(vd, F.abs)) <= F.lit(_EC_MAX_ABS)
    ).count()
    kept = sum(r["n_vecs"] for r in rows)
    assert 0 < kept <= gated < emb.count(), (kept, gated)


def test_incremental_curation_funnel_invariants(spark):
    """Structural invariants of the INCREMENTAL funnel's gate output
    (the oracle pins exact values; these pin the shape a reader
    reasons with): one row per corpus doc; store rows keep their
    pre-existing store state; every admitted doc is fully present in
    both stores (MINHASH_BANDS band rows, 1 bucket row); every
    rejected doc is absent from both; splits exist exactly for
    admitted docs."""
    from bike_data_flow_spark.operators.dedup import MINHASH_BANDS
    from bike_data_flow_spark.queries import load_all

    out = load_all()["incremental_curation"].fn(spark, SF_DIR).collect()
    docs = load(spark, SF_DIR, "documents")
    emb = load(spark, SF_DIR, "embeddings")
    corpus_n = docs.join(
        emb.select(F.col("vec_id").alias("doc_id")), "doc_id", "left_semi"
    ).count()
    assert len(out) == corpus_n
    for r in out:
        is_store = r["doc_id"] % 4 != 0
        if is_store:
            assert r["decision"] == "store"
        else:
            assert r["decision"] in {
                "admitted", "rejected_quality", "rejected_exact",
                "rejected_near_text", "rejected_near_vec",
                "rejected_within_text", "rejected_within_vec",
            }
        member = is_store or r["decision"] == "admitted"
        assert (r["split"] is not None) == (r["decision"] == "admitted")
        if member:
            assert r["vec_rows"] == 1
            assert r["sig_rows"] in (0, MINHASH_BANDS)  # 0 = no shingles
        else:
            assert r["sig_rows"] == 0 and r["vec_rows"] == 0
    # the funnel is non-trivial on the gate corpus: something admitted,
    # something rejected by each store arm
    decs = {r["decision"] for r in out}
    assert {"admitted", "rejected_near_text", "rejected_near_vec"} <= decs
