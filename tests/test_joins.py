"""as-of join and range join vs brute-force oracles."""

from __future__ import annotations

from pyspark.sql import functions as F

from bike_data_flow_spark.operators.joins import asof_join, range_join


def test_asof_join_backward(spark):
    trades = spark.createDataFrame(
        [("A", 10, 100.0), ("A", 20, 101.0), ("A", 5, 99.0), ("B", 7, 50.0)],
        ["sym", "t", "price"],
    )
    quotes = spark.createDataFrame(
        [("A", 8, 99.5), ("A", 10, 100.1), ("A", 15, 100.7), ("B", 9, 49.9)],
        ["sym", "t", "bid"],
    )
    out = asof_join(trades, quotes, on="sym", left_ts="t", right_ts="t")
    got = {(r["sym"], r["t"]): r["r_bid"] for r in out.collect()}
    assert got == {
        ("A", 5): None,  # nothing at or before t=5
        ("A", 10): 100.1,  # quote at exactly t=10 counts (≤)
        ("A", 20): 100.7,  # latest ≤ 20 is t=15
        ("B", 7): None,  # B's only quote is later
    }
    assert out.count() == trades.count()  # every left row survives


def test_asof_join_duplicate_left_rows_stay_one_to_one(spark):
    trades = spark.createDataFrame(
        [("A", 10, "x"), ("A", 10, "y"), ("A", 12, "z")], ["sym", "t", "side"]
    )
    quotes = spark.createDataFrame([("A", 9, 1.0), ("A", 11, 2.0)], ["sym", "t", "bid"])
    out = asof_join(trades, quotes, on="sym", left_ts="t", right_ts="t")
    assert out.count() == 3  # no fan-out from the duplicated (A, 10)
    got = sorted((r["t"], r["side"], r["r_bid"]) for r in out.collect())
    assert got == [(10, "x", 1.0), (10, "y", 1.0), (12, "z", 2.0)]


def test_asof_join_matches_bruteforce_on_events(spark):
    import random

    rng = random.Random(7)
    left = [(k, rng.randint(0, 100)) for k in "ab" for _ in range(30)]
    right = [(k, rng.randint(0, 100), rng.random()) for k in "ab" for _ in range(20)]
    ldf = spark.createDataFrame(left, ["k", "t"])
    rdf = spark.createDataFrame(right, ["k", "t", "v"])
    out = asof_join(ldf, rdf, on="k", left_ts="t", right_ts="t")
    # brute force: max right t ≤ left t; among ties the operator picks a
    # deterministic one — compare on the matched TIME, not the value
    got = {}
    for r in out.collect():
        got.setdefault((r["k"], r["t"]), r["r_t"])
    for k, t in {(x[0], x[1]) for x in left}:
        prior = [rt for (rk, rt, _) in right if rk == k and rt <= t]
        expect = max(prior) if prior else None
        assert got[(k, t)] == expect, (k, t)


def test_range_join_matches_theta_join(spark):
    points = spark.createDataFrame(
        [(i, float(i)) for i in range(50)], ["pid", "x"]
    )
    intervals = spark.createDataFrame(
        [(1, 0.0, 10.0), (2, 5.0, 6.5), (3, 40.0, 55.0), (4, 60.0, 70.0)],
        ["iid", "lo", "hi"],
    )
    fast = {
        (r["pid"], r["iid"])
        for r in range_join(points, intervals, "x", "lo", "hi", bin_size=8.0).collect()
    }
    theta = {
        (r["pid"], r["iid"])
        for r in points.join(
            intervals, (F.col("x") >= F.col("lo")) & (F.col("x") < F.col("hi"))
        ).collect()
    }
    assert fast == theta and len(fast) > 0


def test_asof_tiebreak_stable_across_partition_layouts(spark):
    """Duplicate (key, ts) right rows with different payloads must
    resolve to the SAME winner regardless of partitioning (the old
    monotonically_increasing_id tie-break depended on layout)."""
    trades = spark.createDataFrame([("A", 10, "x")], ["sym", "t", "side"])
    quotes = spark.createDataFrame(
        [("A", 9, 1.0), ("A", 9, 2.0), ("A", 9, 3.0)], ["sym", "t", "bid"]
    )
    winners = set()
    for n_parts in (1, 2, 3, 7):
        out = asof_join(
            trades, quotes.repartition(n_parts), on="sym", left_ts="t", right_ts="t"
        )
        rows = out.collect()
        assert len(rows) == 1
        winners.add(rows[0]["r_bid"])
    assert len(winners) == 1  # same duplicate wins under every layout


def test_asof_caller_supplied_tiebreak_id(spark):
    trades = spark.createDataFrame([("A", 10, "x")], ["sym", "t", "side"])
    quotes = spark.createDataFrame(
        [("A", 9, 1.0, 1), ("A", 9, 2.0, 5), ("A", 9, 3.0, 3)],
        ["sym", "t", "bid", "qid"],
    )
    out = asof_join(
        trades, quotes, on="sym", left_ts="t", right_ts="t", right_id="qid"
    )
    assert out.collect()[0]["r_bid"] == 2.0  # largest qid wins


def test_asof_string_uuid_right_id(spark):
    """A non-numeric right_id (string UUID) must still produce matches:
    the old cast('long') surrogate silently became NULL for every row,
    so no left row ever matched."""
    trades = spark.createDataFrame(
        [("A", 10, "x"), ("A", 20, "y")], ["sym", "t", "side"]
    )
    quotes = spark.createDataFrame(
        [
            ("A", 8, 99.5, "3e0f7a1c-9a1b-4b3e-8f2a-000000000001"),
            ("A", 15, 100.7, "3e0f7a1c-9a1b-4b3e-8f2a-000000000002"),
        ],
        ["sym", "t", "bid", "quote_uuid"],
    )
    out = asof_join(
        trades, quotes, on="sym", left_ts="t", right_ts="t", right_id="quote_uuid"
    )
    got = {r["t"]: (r["r_bid"], r["r_quote_uuid"]) for r in out.collect()}
    assert got[10] == (99.5, "3e0f7a1c-9a1b-4b3e-8f2a-000000000001")
    assert got[20] == (100.7, "3e0f7a1c-9a1b-4b3e-8f2a-000000000002")


def test_range_join_left_preserves_unmatched_points(spark):
    points = spark.createDataFrame(
        [(1, 5.0), (2, 30.0), (3, 65.0)], ["pid", "x"]
    )
    intervals = spark.createDataFrame(
        [(1, 0.0, 10.0), (4, 60.0, 70.0)], ["iid", "lo", "hi"]
    )
    got = {
        r["pid"]: r["iid"]
        for r in range_join(
            points, intervals, "x", "lo", "hi", bin_size=8.0, how="left"
        ).collect()
    }
    assert got == {1: 1, 2: None, 3: 4}  # pid=2 survives null-extended


def test_range_join_rejects_interval_preserving_outer(spark):
    import pytest

    points = spark.createDataFrame([(1, 5.0)], ["pid", "x"])
    intervals = spark.createDataFrame([(1, 0.0, 10.0)], ["iid", "lo", "hi"])
    with pytest.raises(ValueError, match="inner"):
        range_join(points, intervals, "x", "lo", "hi", bin_size=8.0, how="right")
