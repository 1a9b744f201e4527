"""Fellegi–Sunter record linkage (operators/linkage.py)."""

from __future__ import annotations

import math

import pytest
from itertools import combinations

from pyspark.sql import functions as F

from bike_data_flow_spark.operators import linkage as L


def _records(spark):
    rows = [
        (1, "acme corp", "red", 10),
        (2, "acme corp", "red", 10),
        (3, "acme corp", "blue", 10),
        (4, "zenith ltd", "red", 20),
        (5, "zenith ltd", "green", 20),
        (6, "other co", "red", 30),
    ]
    return spark.createDataFrame(rows, "rid long, name string, color string, size long")


def test_field_u_matches_brute_force(spark):
    df = _records(spark)
    rows = df.collect()
    got = {
        r["field"]: r["u"]
        for r in L.field_u_long(df, ["name", "color", "size"]).collect()
    }
    n = len(rows)
    for f in ("name", "color", "size"):
        agree = sum(
            1 for a, b in combinations(rows, 2) if a[f] == b[f]
        )
        expect = agree / (n * (n - 1) / 2)
        assert got[f] == expect, f


def test_field_u_probabilities_pivots_wide(spark):
    row = L.field_u_probabilities(_records(spark), ["name", "color"]).collect()
    assert len(row) == 1
    assert set(row[0].asDict()) == {"name", "color"}


def test_blocked_pairs_multi_pass_union_dedup(spark):
    df = _records(spark).withColumn("blk_a", F.col("color")).withColumn(
        "blk_b", F.col("size")
    )
    pairs = L.blocked_pairs(
        df, "rid", [["blk_a"], ["blk_b"]], carry=["name"]
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    rows = df.collect()
    expect = {
        (a["rid"], b["rid"])
        for a, b in combinations(rows, 2)
        if a["color"] == b["color"] or a["size"] == b["size"]
    }
    assert got == expect
    assert len(pairs) == len(got)  # de-duplicated across passes
    # carried comparison columns present on both sides
    assert {"name_a", "name_b"} <= set(pairs[0].asDict())


def test_fs_score_weight_math_and_thresholds(spark):
    # one agreeing and one disagreeing pair on a single field
    pairs = spark.createDataFrame(
        [(1, 2, "x", "x"), (3, 4, "x", "y")],
        "id_a long, id_b long, f_a string, f_b string",
    )
    u_row = spark.createDataFrame([(0.25,)], "f double")
    m = 0.9
    agree_w = round(math.log2(m / 0.25), 4)
    disagree_w = round(math.log2((1 - m) / 0.75), 4)

    out = {
        (r["id_a"], r["id_b"]): r
        for r in L.fs_score(
            pairs,
            u_row,
            {"f": m},
            match_threshold=agree_w - 0.1,
            possible_threshold=disagree_w - 0.1,
        ).collect()
    }
    assert out[(1, 2)]["score"] == agree_w
    assert out[(1, 2)]["decision"] == "match"
    assert out[(3, 4)]["score"] == disagree_w
    assert out[(3, 4)]["decision"] == "possible"


def test_fs_score_drops_below_possible_threshold(spark):
    pairs = spark.createDataFrame(
        [(1, 2, "x", "y")], "id_a long, id_b long, f_a string, f_b string"
    )
    u_row = spark.createDataFrame([(0.25,)], "f double")
    out = L.fs_score(
        pairs, u_row, {"f": 0.9}, match_threshold=5.0, possible_threshold=0.0
    )
    assert out.count() == 0


def test_blocked_pairs_stripe_cap_bounds_and_subsets(spark):
    """Hash striping: output is a SUBSET of the exact blocked pairs,
    per-block pair volume drops to ~|b|·cap/2, and a cap larger than
    every block is a no-op."""
    rows = [(i, "blk", f"n{i}") for i in range(20)]
    df = spark.createDataFrame(rows, "rid long, b string, name string")

    full = {
        (r["id_a"], r["id_b"])
        for r in L.blocked_pairs(df, "rid", [["b"]], carry=["name"]).collect()
    }
    assert len(full) == 20 * 19 // 2

    capped = {
        (r["id_a"], r["id_b"])
        for r in L.blocked_pairs(
            df, "rid", [["b"]], carry=["name"], stripe_cap=5
        ).collect()
    }
    assert capped < full
    # 4 stripes of ~5 → at most Σ s_i·(s_i−1)/2 with Σs_i=20, far
    # below the quadratic full set; generous bound: half the full set
    assert len(capped) <= len(full) // 2

    noop = {
        (r["id_a"], r["id_b"])
        for r in L.blocked_pairs(
            df, "rid", [["b"]], carry=["name"], stripe_cap=50
        ).collect()
    }
    assert noop == full


def test_blocked_pairs_rotated_stripe_passes(spark):
    """VERDICT r11 ask #5: a second ROTATED striping pass is
    deterministic, strictly widens single-pass coverage toward the
    exact set, and stays a subset of it; passes without a cap are a
    no-op."""
    rows = [(i, "blk", f"n{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "rid long, b string, name string")

    def pairs(**kw):
        return {
            (r["id_a"], r["id_b"])
            for r in L.blocked_pairs(
                df, "rid", [["b"]], carry=["name"], **kw
            ).collect()
        }

    full = pairs()
    one = pairs(stripe_cap=5)
    two = pairs(stripe_cap=5, stripe_passes=2)
    # determinism: same inputs → identical union, twice
    assert two == pairs(stripe_cap=5, stripe_passes=2)
    # rotation 0 is the single-pass striping, so the union ⊇ one pass
    assert one < two <= full
    # each rotation is a valid striping → union of 2 is ≤ ~2× one pass
    assert len(two) <= 2 * len(one)
    # passes dial without striping: exact output unchanged
    assert pairs(stripe_passes=3) == full
    # module dial spelling
    L.BLOCK_STRIPE_CAP, L.BLOCK_STRIPE_PASSES = 5, 2
    try:
        assert pairs() == two
    finally:
        L.BLOCK_STRIPE_CAP, L.BLOCK_STRIPE_PASSES = None, 1


def test_blocked_pairs_module_dial_is_picked_up(spark):
    rows = [(i, "blk", "x") for i in range(12)]
    df = spark.createDataFrame(rows, "rid long, b string, name string")
    before = L.blocked_pairs(df, "rid", [["b"]], carry=["name"]).count()
    L.BLOCK_STRIPE_CAP = 3
    try:
        dialed = L.blocked_pairs(df, "rid", [["b"]], carry=["name"]).count()
    finally:
        L.BLOCK_STRIPE_CAP = None
    assert before == 12 * 11 // 2
    assert dialed < before


def test_fs_model_properties_hypothesis(spark):
    """Model invariants over randomized records: u lands in (0, 1],
    all-field agreement scores strictly above all-field disagreement,
    and every pair's score is bounded by the sum of per-field extreme
    weights."""
    import math
    import random

    rng = random.Random(0)
    for trial in range(3):
        n = rng.randrange(6, 14)
        rows = [
            (
                i,
                rng.choice(["a", "b", "c"]),
                rng.choice(["x", "y"]),
                rng.randrange(3),
            )
            for i in range(n)
        ]
        df = spark.createDataFrame(rows, "rid long, f1 string, f2 string, f3 long")
        us = {
            r["field"]: r["u"]
            for r in L.field_u_long(df, ["f1", "f2", "f3"]).collect()
        }
        assert all(0.0 < u <= 1.0 for u in us.values()), us

        m = {"f1": 0.9, "f2": 0.8, "f3": 0.7}

        def weights(f):
            agree = math.log2(m[f] / us[f])
            if us[f] >= 1.0:  # disagreement impossible: only agree
                return (agree, agree)
            return (agree, math.log2((1 - m[f]) / (1 - us[f])))

        hi = sum(max(weights(f)) for f in m)
        lo = sum(min(weights(f)) for f in m)
        assert hi >= lo
        pairs = L.blocked_pairs(
            df.withColumn("blk", F.lit(1)), "rid", [["blk"]],
            carry=["f1", "f2", "f3"],
        )
        u_row = L.field_u_probabilities(df, ["f1", "f2", "f3"])
        scored = L.fs_score(
            pairs, u_row, m, match_threshold=hi, possible_threshold=-1e9
        ).collect()
        assert len(scored) == n * (n - 1) // 2
        eps = 1e-4
        assert all(lo - eps <= r["score"] <= hi + eps for r in scored)


def test_fs_weight_clamps_degenerate_u(spark):
    """A CONSTANT compared field has u = 1.0; before the clamp the
    disagree weight was log2(x/0) = NULL, which NULLed every pair's
    total score and silently emptied the output (ADVICE r9). With the
    clamp, scores stay finite and pairs survive."""
    rows = [
        (1, "same", "red"),
        (2, "same", "red"),
        (3, "same", "blue"),
    ]
    df = spark.createDataFrame(rows, "rid long, konst string, color string")
    u_row = L.field_u_probabilities(df, ["konst", "color"])
    u = u_row.first()
    assert u["konst"] == 1.0  # the degenerate case is real on this data
    pairs = L.blocked_pairs(
        df, "rid", [["konst"]], carry=["konst", "color"]
    )
    scored = L.fs_score(
        pairs,
        u_row,
        {"konst": 0.9, "color": 0.9},
        match_threshold=100.0,      # nothing reaches 'match'
        possible_threshold=-1000.0,  # nothing is dropped
    ).collect()
    assert len(scored) == 3  # all C(3,2) pairs survive
    for r in scored:
        assert r["score"] is not None and math.isfinite(r["score"])


def test_field_u_excludes_nulls(spark):
    """NULL can never AGREE in the score stage (equality is NULL →
    disagreement), so the u histogram must not count the NULL group as
    one giant agreeing value: u = agree-pairs among NON-NULL values /
    C(n_nonnull, 2)."""
    rows = [
        (1, "a"),
        (2, "a"),
        (3, "b"),
        (4, None),
        (5, None),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "rid long, f string")
    u = {
        r["field"]: r["u"] for r in L.field_u_long(df, ["f"]).collect()
    }["f"]
    # non-null values: a,a,b → 1 agreeing pair of C(3,2)=3
    assert u == 1 / 3
    # counting the 3 NULLs as one value would have given (1+3)/C(6,2)
    assert u != 4 / 15


def test_fs_weight_null_u_contributes_zero_evidence(spark):
    """An entirely-NULL compared field has NO u row (field_u_long's
    NULL-free histogram), so the pivot hands fs_score a NULL u — which
    must contribute ZERO evidence, not read as u≈1 through the
    NULL-skipping least/greatest clamp (ADVICE r10: that scored every
    comparison on the dead field as log2((1-m)/ε) ≈ +36, enormous
    evidence FOR a match from a field with no information)."""
    rows = [
        (1, "acme", None),
        (2, "acme", None),
        (3, "zen", None),
    ]
    df = spark.createDataFrame(rows, "rid long, name string, dead string")
    u_row = L.field_u_probabilities(df, ["name", "dead"])
    assert u_row.first()["dead"] is None  # the degenerate case is real
    pairs = L.blocked_pairs(
        df.withColumn("blk", F.lit(1)), "rid", [["blk"]],
        carry=["name", "dead"],
    )
    m = {"name": 0.9, "dead": 0.9}
    scored = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in L.fs_score(
            pairs, u_row, m,
            match_threshold=100.0, possible_threshold=-1000.0,
        ).collect()
    }
    # name-only model on the same pairs = the expected scores
    expected = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in L.fs_score(
            pairs, u_row, {"name": 0.9},
            match_threshold=100.0, possible_threshold=-1000.0,
        ).collect()
    }
    assert scored == expected  # the dead field moved nothing


def test_fs_field_weights_oracle_mirrors_clamp_on_degenerate_u(spark):
    """Engine/oracle parity on the FS weights must be data-INdependent
    (ADVICE r10): on a constant field (u = 1) and a unique field
    (u = 0) both engines must produce the same large-but-finite clamped
    weights, not Spark-finite vs DuckDB ±inf/NULL."""
    import duckdb

    uc = L.fs_clamped_u(F.col("u"))
    spark_w = {
        r["field"]: (r["wa"], r["wd"])
        for r in L.field_u_long(
            spark.createDataFrame(
                [(1, "k", "u1"), (2, "k", "u2"), (3, "k", "u3")],
                "rid long, konst string, uniq string",
            ),
            ["konst", "uniq"],
        )
        .select(
            "field",
            F.round(F.log2(F.lit(0.9) / uc), 4).alias("wa"),
            F.round(
                F.log2((F.lit(1.0) - F.lit(0.9)) / (F.lit(1.0) - uc)), 4
            ).alias("wd"),
        )
        .collect()
    }
    hi, lo = repr(1.0 - L._U_EPS), repr(L._U_EPS)
    duck_w = {
        f: duckdb.sql(
            f"SELECT round(log2(0.9 / greatest(least({u}, {hi}), {lo})), 4),"
            f" round(log2((1 - CAST(0.9 AS DOUBLE))"
            f"            / (1.0 - greatest(least({u}, {hi}), {lo}))), 4)"
        ).fetchone()
        for f, u in (("konst", "1.0"), ("uniq", "0.0"))
    }
    for f in ("konst", "uniq"):
        assert spark_w[f] == duck_w[f], (f, spark_w[f], duck_w[f])
        assert all(math.isfinite(x) for x in spark_w[f])


def test_global_sort_index_is_the_total_order_rank(spark):
    """_snm_idx must equal the brute-force rank under (keys…, id) —
    including heavy key duplication (ties broken by id) — and be
    INVARIANT to the partition count: range bounds decide where each
    rank is computed, never what it is."""
    rows = [
        (i, ["b", "a", "c", "a", "b"][i % 5], i % 3) for i in range(57)
    ]
    df = spark.createDataFrame(rows, "rid long, k string, n int")
    expect = {
        rid: rank + 1
        for rank, (k, n, rid) in enumerate(
            sorted((k, n, rid) for rid, k, n in rows)
        )
    }
    for n_parts in (1, 3, 16):
        got = {
            r["rid"]: r["_snm_idx"]
            for r in L.global_sort_index(
                df, "rid", ["k", "n"], n_parts=n_parts
            ).collect()
        }
        assert got == expect, n_parts


def test_sorted_neighborhood_pairs_match_bruteforce_window(spark):
    """SNM candidates must be EXACTLY the pairs whose total-order ranks
    differ by < window, per pass, unioned — id-canonical (id_a < id_b)
    with the carried columns following their ids — and deterministic
    across repeated evaluation (the global index is pinned to one
    materialization; a resampled range exchange would corrupt it)."""
    rows = [(i, ["x", "y", "z"][i % 3], f"v{i % 7}") for i in range(40)]
    df = spark.createDataFrame(rows, "rid long, k string, val string")
    w = 4

    def brute(keys_of):
        order = sorted(rows, key=keys_of)
        pairs = set()
        for i, a in enumerate(order):
            for b in order[i + 1 : i + w]:
                pairs.add((min(a[0], b[0]), max(a[0], b[0])))
        return pairs

    expect = brute(lambda r: (r[1], r[0])) | brute(lambda r: (r[2], r[0]))
    out = L.sorted_neighborhood_pairs(
        df, "rid", [["k"], ["val"]], window=w, carry=["val"]
    )
    got = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert got == expect
    # repeated evaluation of the SAME frame: identical (determinism)
    assert {(r["id_a"], r["id_b"]) for r in out.collect()} == expect
    # carried columns belong to their ids after the canonical swap
    vals = dict((r[0], r[2]) for r in rows)
    for r in out.collect():
        assert r["val_a"] == vals[r["id_a"]], r
        assert r["val_b"] == vals[r["id_b"]], r
    # pair volume bound: ≤ passes · n·(w−1)
    assert len(got) <= 2 * len(rows) * (w - 1)


def test_sorted_neighborhood_window_guard(spark):
    df = spark.createDataFrame([(1, "a")], "rid long, k string")
    with pytest.raises(ValueError, match="window"):
        L.sorted_neighborhood_pairs(df, "rid", [["k"]], window=1, carry=[])
