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


def test_ols_recovers_known_coefficients(spark):
    """y = 200 + 300·q + 5·d exactly (in dollars, q∈ints, d in
    hundredths): the closed-form solve must recover the coefficients
    and r2 == 1."""
    import itertools

    from bike_data_flow_spark.queries.mlops import (
        _REG_OUT,
    )

    rows = []
    for q, d100 in itertools.product(range(1, 8), range(0, 11, 2)):
        d = d100 / 100.0
        y = 200.0 + 300.0 * q + 5.0 * d
        rows.append((float(q), d, y))
    df = spark.createDataFrame(
        rows, "l_quantity double, l_discount double, l_extendedprice double"
    )
    from pyspark.sql import functions as F

    raw = df.select(
        F.col("l_quantity").cast("bigint").alias("q"),
        F.round(F.col("l_discount") * 100).cast("bigint").alias("d"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("y"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    g = raw.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(dec(F.col("q"))).cast("double").alias("sq"),
        F.sum(dec(F.col("d"))).cast("double").alias("sd"),
        F.sum(dec(F.col("q") * F.col("q"))).cast("double").alias("sqq"),
        F.sum(dec(F.col("q") * F.col("d"))).cast("double").alias("sqd"),
        F.sum(dec(F.col("d") * F.col("d"))).cast("double").alias("sdd"),
        F.sum(dec(F.col("y"))).cast("double").alias("sy"),
        F.sum(dec(F.col("q") * F.col("y"))).cast("double").alias("sqy"),
        F.sum(dec(F.col("d") * F.col("y"))).cast("double").alias("sdy"),
        F.sum(dec(F.col("y")) * dec(F.col("y"))).cast("double").alias("syy"),
    )
    out = g.select(
        F.expr(_REG_OUT["b0"]).alias("b0"),
        F.expr(_REG_OUT["b1"]).alias("b1"),
        F.expr(_REG_OUT["b2"]).alias("b2"),
        F.expr(_REG_OUT["r2"]).alias("r2"),
    ).collect()[0]
    assert abs(out["b0"] - 200.0) < 1e-4
    assert abs(out["b1"] - 300.0) < 1e-4
    assert abs(out["b2"] - 5.0) < 1e-4
    assert out["r2"] == 1.0


def test_welch_ttest_detects_known_shift(spark):
    """Two groups with means 10 and 13 (sd≈1): t must be strongly
    negative (m1 < m2) and df near n1+n2-2 for equal variances."""
    import datetime as dt

    from bike_data_flow_spark import queries

    queries.load_all()
    rows = []
    base = dt.datetime(2024, 1, 1)
    late = dt.datetime(2024, 1, 20)
    for i in range(40):
        rows.append((base + dt.timedelta(minutes=i), "a", 10.0 + (i % 3) - 1))
        rows.append((late + dt.timedelta(minutes=i), "a", 13.0 + (i % 3) - 1))
    df = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    from pyspark.sql import functions as F

    split = F.to_timestamp(F.lit("2024-01-16"))
    xi = F.round(F.col("value") * 100).cast("bigint")
    first = F.col("ts") < split
    m = df.groupBy("event_type").agg(
        F.sum(F.when(first, 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(first, xi).otherwise(0)).cast("bigint").alias("s1"),
        F.sum(F.when(first, xi * xi).otherwise(0)).cast("bigint").alias("ss1"),
        F.sum(F.when(~first, 1).otherwise(0)).cast("bigint").alias("n2"),
        F.sum(F.when(~first, xi).otherwise(0)).cast("bigint").alias("s2"),
        F.sum(F.when(~first, xi * xi).otherwise(0)).cast("bigint").alias("ss2"),
    ).collect()[0]
    n1, s1, ss1, n2, s2, ss2 = (
        m["n1"], m["s1"], m["ss1"], m["n2"], m["s2"], m["ss2"]
    )
    m1, m2 = s1 / n1, s2 / n2
    se1 = (ss1 - s1 * s1 / n1) / (n1 - 1) / n1
    se2 = (ss2 - s2 * s2 / n2) / (n2 - 1) / n2
    t = (m1 - m2) / (se1 + se2) ** 0.5
    assert t < -10  # 3-sd shift over 40+40 samples is unmissable
    df_w = (se1 + se2) ** 2 / (se1**2 / (n1 - 1) + se2**2 / (n2 - 1))
    assert 70 <= df_w <= 78  # equal variances -> close to n1+n2-2


def test_did_cancels_common_trend(spark):
    """Both cohorts drift +5 over time; treatment adds +2 on top for
    the odd cohort. DiD must isolate the +2 and ignore the trend."""
    import datetime as dt

    rows = []
    pre, post = dt.datetime(2024, 1, 2), dt.datetime(2024, 1, 20)
    for u in range(1, 9):
        treated = u % 2
        rows.append((pre, u, 10.0))
        rows.append((post, u, 10.0 + 5.0 + 2.0 * treated))
    df = spark.createDataFrame(rows, "ts timestamp, user_id long, value double")
    from pyspark.sql import functions as F

    split = F.to_timestamp(F.lit("2024-01-16"))
    cells = df.groupBy(
        (F.col("user_id") % 2).cast("bigint").alias("treated"),
        F.when(F.col("ts") >= split, 1).otherwise(0).alias("post"),
    ).agg(F.avg("value").alias("m"))
    got = {(r["treated"], r["post"]): r["m"] for r in cells.collect()}
    did = (got[(1, 1)] - got[(1, 0)]) - (got[(0, 1)] - got[(0, 0)])
    assert abs(did - 2.0) < 1e-9


def test_conformal_q_covers(spark):
    """The q90 absolute residual from the registry query must cover
    ~90% of lineitem rows at sf0.001 (sanity of the interval width)."""
    from bike_data_flow_spark import queries

    queries.load_all()
    row = queries.REGISTRY["regression_conformal_q"].fn(spark, SF).collect()[0]
    assert row["q90_abs_residual"] > 0
    ols = queries.REGISTRY["price_regression_ols"].fn(spark, SF).collect()[0]
    assert 0 < ols["r2"] <= 1
