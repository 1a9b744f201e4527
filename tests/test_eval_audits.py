"""Fixture-level checks for the NDCG eval, calibration bins,
chi-square ranking, and zone-map pruning queries (round 6)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from bike_data_flow_spark import queries

SF = "/root/testdata/sf0.001"


def _q(name):
    queries.load_all()
    return queries.REGISTRY[name].fn


def test_ndcg_bounds(spark):
    row = _q("retrieval_ndcg")(spark, SF).collect()[0]
    assert row["k"] == 10
    assert 0 < row["ndcg"] <= 1.0
    assert row["dcg_scaled"] <= row["idcg_scaled"]
    # ideal list of the top graded docs: idcg at least the max single
    # gain (a rel=4 doc exists in the corpus: all four terms present)
    assert row["idcg_scaled"] >= (2**4 - 1) * 1_000_000_000 * 0.9


def test_ndcg_discount_literals():
    from bike_data_flow_spark.queries.retrieval_q import _DISC

    for r, d in _DISC.items():
        assert float(d) == 1.0 / math.log2(r + 1)


def test_calibration_bins_partition(spark):
    rows = _q("score_calibration_bins")(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_docs = docs.filter(F.length(F.trim("text")) > 0).count()
    # empty-text docs still get features (ratio features of [''])
    assert sum(r["n"] for r in rows) >= n_docs
    for r in rows:
        assert 0 <= r["bin"] <= 9
        assert 0.0 <= r["pos_rate"] <= 1.0
        assert 0.0 <= r["mean_p"] <= 1.0


def test_chi2_known_contingency(spark):
    # 4 docs: token 'x' in both en docs and neither de doc -> perfect
    # association; chi2 = N = 4. token 'z' in one of each -> chi2 = 0.
    df = spark.createDataFrame(
        [
            (1, "x q", "en"),
            (2, "x w", "en"),
            (3, "z w", "de"),
            (4, "q z", "de"),
        ],
        "doc_id long, text string, lang string",
    )
    from bike_data_flow_spark.operators import text as T

    staged = df.select(
        (F.col("lang") == "en").cast("int").alias("y"),
        F.explode(F.array_distinct(T.tokens(F.col("text")))).alias("token"),
    )
    per = staged.groupBy("token").agg(
        F.count(F.lit(1)).alias("nt"), F.sum("y").cast("long").alias("a")
    )
    got = {r["token"]: (r["nt"], r["a"]) for r in per.collect()}
    n, p = 4, 2
    for tok, expected in (("x", 4.0), ("z", 4.0), ("q", 0.0), ("w", 0.0)):
        nt, a = got[tok]
        ad_bc = a * (n - p - nt + a) - (nt - a) * (p - a)
        chi2 = n * ad_bc * ad_bc / (nt * (n - nt) * p * (n - p))
        assert chi2 == expected, tok
    # registry query returns k rows with non-negative scores
    out = _q("chi2_token_ranking")(spark, SF).collect()
    assert len(out) == 20 and all(r["chi2"] >= 0 for r in out)


def test_zone_map_partitions_corpus(spark):
    rows = {r["zone_class"]: r for r in _q("zone_map_pruning")(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet")
    assert sum(r["n_rows"] for r in rows.values()) == ev.count()
    # Z-order locality must let SOME buckets prune for a 100x300 box
    assert rows["pruned"]["n_buckets"] > 0
