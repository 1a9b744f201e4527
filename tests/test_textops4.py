"""Fixture checks for the mixture epoch plan and the source dedup
crosstab (queries/textops4.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bike_data_flow_spark import queries

SF = "/root/testdata/sf0.001"


def _q(name):
    queries.load_all()
    return queries.REGISTRY[name].fn


def test_epoch_plan_identities(spark):
    rows = _q("mixture_epoch_plan")(spark, SF).collect()
    total_target = sum(r["target_tokens"] for r in rows)
    # per-source rounding keeps the plan within |sources|/2 tokens of budget
    assert abs(total_target - 1_000_000) <= len(rows)
    for r in rows:
        assert (
            r["full_epochs"] * r["n_tokens"] + r["remainder_tokens"]
            == r["target_tokens"]
        )
        assert 0.0 <= r["oversample_frac"] < 1.0
        assert r["remainder_tokens"] < r["n_tokens"]


def test_crosstab_pair_algebra(spark):
    # 2 copies of X in src a, 1 copy of X in src b, unique doc in b:
    # X group k=3: a has ks=2 -> within 1, cross 2; b ks=1 -> within 0, cross 2
    df = spark.createDataFrame(
        [
            (1, "same text", "a"),
            (2, "same  text", "a"),  # whitespace-normalized duplicate
            (3, "same text", "b"),
            (4, "unique", "b"),
        ],
        "doc_id long, text string, source string",
    )
    from bike_data_flow_spark.operators.dedup import normalized_text

    per = (
        df.select(F.md5(normalized_text(F.col("text"))).alias("h"), "source")
        .groupBy("h", "source")
        .agg(F.count(F.lit(1)).alias("ks"))
    )
    tot = per.groupBy("h").agg(F.sum("ks").alias("k"))
    out = {
        r["source"]: r
        for r in per.join(tot, "h")
        .groupBy("source")
        .agg(
            F.sum(F.when(F.col("k") >= 2, F.col("ks")).otherwise(0)).alias("dup_docs"),
            F.sum((F.col("ks") * (F.col("ks") - 1) / 2).cast("long")).alias(
                "within_pairs"
            ),
            F.sum(F.col("ks") * (F.col("k") - F.col("ks"))).alias("cross_links"),
        )
        .collect()
    }
    assert (out["a"]["dup_docs"], out["a"]["within_pairs"], out["a"]["cross_links"]) == (2, 1, 2)
    assert (out["b"]["dup_docs"], out["b"]["within_pairs"], out["b"]["cross_links"]) == (1, 0, 2)
    # registry query: cross_links symmetric sum is even
    rows = _q("source_dedup_crosstab")(spark, SF).collect()
    assert sum(r["cross_links"] for r in rows) % 2 == 0
