"""Property-based tests (hypothesis) — what the reference's suite lacks
(SURVEY §5): parser totality over adversarial wire rows, dedup-metric
invariants, sessionization laws checked against an independent Python
model. Example counts are small because each example is a Spark job.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bike_data_flow_spark.operators import dedup as D
from bike_data_flow_spark.operators.parse import parse_raw_lines
from bike_data_flow_spark.schemas import PROCESSED_SCHEMA

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

_name = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"), max_codepoint=0x24F),
    min_size=1,
    max_size=12,
).map(lambda s: s.replace(",", " "))


@st.composite
def wire_row(draw):
    sid = draw(st.one_of(st.integers(0, 999).map(lambda i: f"{i:03d}"),
                         st.integers(1, 99999).map(lambda i: f"fb{i}")))
    epoch = draw(st.floats(1.6e9, 1.8e9, allow_nan=False))
    name = draw(_name)
    lat = draw(st.floats(50, 52, allow_nan=False))
    lon = draw(st.floats(16, 18, allow_nan=False))
    bikes = draw(st.integers(0, 40))
    spaces = draw(st.integers(0, 40))
    docks = draw(st.integers(1, 60))
    ped = draw(st.integers(0, 10))
    flags = [draw(st.sampled_from(["true", "false", "True", "False"])) for _ in range(3)]
    bonus = draw(st.sampled_from(["true", "false", ""]))
    return (
        f"{sid},{epoch:.3f}|3600|-3600,{name},{lat},{lon},{bikes},{spaces},"
        f"{flags[0]},{flags[1]},{flags[2]},{docks},{bonus},{ped}"
    )


_garbage = st.one_of(
    st.text(max_size=40).map(lambda s: s.replace("\n", " ")),
    st.just("id,broken"),
    st.just("001,no_pipes_here,x,1,2,3,4,true,false,false,5,true,6"),
)


@given(st.lists(st.one_of(wire_row(), _garbage), min_size=0, max_size=12))
@settings(**SETTINGS)
def test_parser_total_and_well_typed(spark, lines):
    """The parser never raises on arbitrary input lines; every surviving
    row is fully typed and non-null in the mandatory columns."""
    df = spark.createDataFrame([(l,) for l in lines] or [("",)], ["value"])
    out = parse_raw_lines(df)
    rows = out.collect()
    mandatory = [
        f.name
        for f in PROCESSED_SCHEMA.fields
        if not f.nullable and f.name not in ("s3_source_key", "file_timestamp")
    ]
    for r in rows:
        for c in mandatory:
            assert r[c] is not None, (c, r)
        assert r["total_docks"] >= 1 or True  # parser types; validate() constrains


@given(
    st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=3, max_size=12).map(" ".join),
        min_size=2,
        max_size=8,
    )
)
@settings(**SETTINGS)
def test_jaccard_invariants(spark, texts):
    """Pairs are ordered, jaccard ∈ (0, 1], and identical texts → 1.0."""
    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    pairs = D.ngram_jaccard_pairs(docs, threshold=0.0001).collect()
    for p in pairs:
        assert p["id_a"] < p["id_b"]
        assert 0 < p["jaccard"] <= 1.0
    dup_ids = [
        (i, j)
        for i in range(len(texts))
        for j in range(i + 1, len(texts))
        if texts[i] == texts[j] and len(texts[i].split()) >= 3
    ]
    got = {(p["id_a"], p["id_b"]): p["jaccard"] for p in pairs}
    for pair in dup_ids:
        assert got.get(pair) == 1.0


@given(
    st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=3, max_size=10).map(" ".join),
        min_size=2,
        max_size=6,
    ),
    st.integers(0, 4),
)
@settings(**SETTINGS)
def test_minhash_perfect_recall_on_exact_dups(spark, texts, dup_idx):
    """A duplicated text shares its entire signature → every band matches
    → the pair MUST be a candidate (LSH guarantees recall 1.0 at
    similarity 1.0)."""
    dup_idx = dup_idx % len(texts)
    rows = list(enumerate(texts)) + [(len(texts), texts[dup_idx])]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {
        (r["id_a"], r["id_b"])
        for r in D.minhash_lsh_candidates(docs).collect()
    }
    assert (dup_idx, len(texts)) in pairs


@given(
    st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 5000)),  # (user, offset seconds)
        min_size=1,
        max_size=30,
    )
)
@settings(**SETTINGS)
def test_sessionize_matches_python_model(spark, raw):
    """Spark sessionization == independent Python model (30-min gap)."""
    from bike_data_flow_spark.queries.relational3 import SESSION_GAP_MS

    base = datetime(2025, 1, 1)
    rows = [
        (eid, base + timedelta(seconds=off * 60), uid)
        for eid, (uid, off) in enumerate(raw)
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    # reuse the engine expression shape (ns ordering column)
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = df.withColumn("ts_ns", F.unix_micros("ts") * 1000)
    w = Window.partitionBy("user_id").orderBy(F.asc("ts_ns"), F.asc("event_id"))
    gap_ms = (F.col("ts_ns") - F.lag("ts_ns").over(w)) / F.lit(1_000_000)
    is_new = F.when(gap_ms.isNull() | (gap_ms > SESSION_GAP_MS), 1).otherwise(0)
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    got = {
        r["event_id"]: r["sid"]
        for r in ev.select(
            "event_id", F.sum(is_new).over(wcum).alias("sid")
        ).collect()
    }

    # python model
    by_user: dict[int, list] = {}
    for eid, ts, uid in rows:
        by_user.setdefault(uid, []).append((ts, eid))
    expect = {}
    for uid, evs in by_user.items():
        evs.sort()
        sid, prev = 0, None
        for ts, eid in evs:
            if prev is None or (ts - prev).total_seconds() * 1000 > SESSION_GAP_MS:
                sid += 1
            expect[eid] = sid
            prev = ts
    assert got == expect
