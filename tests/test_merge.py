"""MERGE upsert + SCD2 operator semantics (operators/merge.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bike_data_flow_spark.operators.merge import merge_upsert, scd2_from_changelog


def _target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", -5.0), (3, "c", 30.0)],
        "id int, name string, bal double",
    )


def test_merge_update_insert_and_matched_only_delete(spark):
    target = _target(spark)
    # id=1 updated positive, id=3 updated negative (deleted), id=9 inserted;
    # id=2 untouched — its pre-existing negative balance must SURVIVE
    # (delete applies to matched rows only, per MERGE semantics).
    source = spark.createDataFrame(
        [(1, 11.0), (3, -1.0), (9, 99.0)], "id int, bal double"
    )
    out = merge_upsert(
        target, source, ["id"], delete_condition=F.col("bal") < 0
    )
    rows = {r["id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 9}
    assert rows[1]["bal"] == 11.0 and rows[1]["name"] == "a"  # update keeps other cols
    assert rows[2]["bal"] == -5.0  # unmatched negative row NOT deleted
    assert rows[9]["bal"] == 99.0 and rows[9]["name"] is None  # insert fills nulls


def test_merge_duplicate_source_keys_raise(spark):
    import pytest

    target = _target(spark)
    dup_source = spark.createDataFrame(
        [(1, 11.0), (1, 12.0), (9, 99.0)], "id int, bal double"
    )
    out = merge_upsert(target, dup_source, ["id"])
    with pytest.raises(Exception, match="duplicate source rows"):
        out.collect()
    # explicit opt-in restores the old fan-out behavior
    out = merge_upsert(
        target, dup_source, ["id"], allow_duplicate_source_keys=True
    )
    assert sum(1 for r in out.collect() if r["id"] == 1) == 2


def test_merge_null_source_value_keeps_target(spark):
    target = _target(spark)
    source = spark.createDataFrame([(1, None)], "id int, bal double")
    out = merge_upsert(target, source, ["id"])
    assert {r["id"]: r["bal"] for r in out.collect()}[1] == 10.0


def test_scd2_null_attr_transitions(spark):
    """Regression for the eqNullSafe + row_number fix: a non-null→NULL
    attr transition is a CHANGE (plain != yields NULL there, which
    filter() drops, silently extending the prior interval), consecutive
    NULLs collapse, NULL→non-null opens a new interval, and a key whose
    FIRST value is NULL still gets its opening row."""
    log = spark.createDataFrame(
        [
            # key u: a -> NULL -> NULL -> a
            ("u", 100, "a"),
            ("u", 200, None),
            ("u", 300, None),
            ("u", 400, "a"),
            # key v: leading NULL
            ("v", 50, None),
            ("v", 60, "q"),
        ],
        "k string, ts long, a string",
    )
    out = scd2_from_changelog(log, "k", ["ts"], ["a"])
    rows = sorted(
        (r["k"], r["valid_from"], r["a"], r["valid_to"], r["is_current"])
        for r in out.collect()
    )
    assert rows == [
        ("u", 100, "a", 200, False),  # closed by the a->NULL change
        ("u", 200, None, 400, False),  # spans the suppressed NULL at 300
        ("u", 400, "a", None, True),  # NULL->a reopens
        ("v", 50, None, 60, False),  # leading-NULL first row kept
        ("v", 60, "q", None, True),
    ]


def test_scd2_collapses_unchanged_and_orders_intervals(spark):
    log = spark.createDataFrame(
        [
            # key, ts, seq, attr — two consecutive 'x' collapse; ts tie broken by seq
            ("u", 100, 0, "x"),
            ("u", 200, 0, "x"),
            ("u", 300, 0, "y"),
            ("u", 300, 1, "z"),
            ("v", 50, 0, "q"),
        ],
        "k string, ts long, seq int, a string",
    )
    out = scd2_from_changelog(log, "k", ["ts", "seq"], ["a"])
    rows = sorted(
        [(r["k"], r["a"], r["valid_from"], r["valid_to"], r["is_current"]) for r in out.collect()]
    )
    assert rows == [
        ("u", "x", 100, 300, False),  # spans the suppressed ts=200 duplicate
        ("u", "y", 300, 300, False),  # zero-length version, tie-broken by seq
        ("u", "z", 300, None, True),
        ("v", "q", 50, None, True),
    ]
