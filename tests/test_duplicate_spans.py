"""Substring-level exact dedup (operators/dedup.duplicate_spans).

Reference model: Lee et al. 2021 "Deduplicating Training Data Makes
Language Models Better" — any substring of >= window tokens occurring
more than once in the corpus is duplicated; all its window-length
subwindows fingerprint-match, and the per-doc island merge must
recover the maximal span.
"""

from __future__ import annotations

from bike_data_flow_spark.operators.dedup import (
    drop_duplicate_spans,
    duplicate_spans,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


def _tok(s):
    return s.strip().lower().split()


def test_shared_phrase_marks_maximal_span_in_both_docs(spark):
    # 12 shared tokens embedded at different offsets; window=5 → the
    # merged span must cover exactly the shared region in each doc.
    shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima"
    d1 = "one two three " + shared + " x1 y1 z1"
    d2 = "p q " + shared + " r s t u"
    out = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in duplicate_spans(_docs(spark, [(1, d1), (2, d2)]), window=5).collect()
    }
    # doc 1: shared starts at token 4 (1-based), ends at 15
    # doc 2: shared starts at token 3, ends at 14
    assert out == {(1, 4, 15, 12), (2, 3, 14, 12)}


def test_within_doc_repeat_is_also_flagged(spark):
    # the duplicated text occurs twice in ONE doc — min_occurrences
    # counts total occurrences, not distinct docs (Lee et al. semantics)
    phrase = "red green blue cyan magenta"
    text = phrase + " sep1 sep2 sep3 sep4 sep5 sep6 " + phrase
    out = sorted(
        (r["span_start"], r["span_end"])
        for r in duplicate_spans(_docs(spark, [(1, text)]), window=5).collect()
    )
    assert out == [(1, 5), (12, 16)]


def test_no_duplication_yields_empty(spark):
    rows = [(1, "a b c d e f g h"), (2, "q w e r t y u i")]
    assert duplicate_spans(_docs(spark, rows), window=5).count() == 0


def test_short_docs_do_not_crash(spark):
    # fewer tokens than the window → no fingerprints, no rows
    rows = [(1, "just three tokens"), (2, "just three tokens")]
    assert duplicate_spans(_docs(spark, rows), window=5).count() == 0


def test_adjacent_windows_merge_but_distant_do_not(spark):
    # two duplicated regions separated by > window unique tokens must
    # stay two islands
    a = "m1 m2 m3 m4 m5"
    b = "n1 n2 n3 n4 n5"
    filler = " f1 f2 f3 f4 f5 f6 f7 "
    d1 = a + filler + b
    d2 = a + " g1 g2 g3 g4 g5 g6 g7 g8 " + b
    out = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicate_spans(_docs(spark, [(1, d1), (2, d2)]), window=5).collect()
    )
    assert out == [(1, 1, 5), (1, 13, 17), (2, 1, 5), (2, 14, 18)]


def test_drop_duplicate_spans_removes_flagged_tokens_only(spark):
    shared = "alpha bravo charlie delta echo"
    d1 = "one two " + shared + " tail1 tail2"
    d2 = shared + " other words here four"
    out = {
        r["doc_id"]: r["text"]
        for r in drop_duplicate_spans(
            _docs(spark, [(1, d1), (2, d2)]), window=5
        ).collect()
    }
    assert out[1] == "one two tail1 tail2"
    assert out[2] == "other words here four"


def test_drop_passes_clean_docs_through_verbatim(spark):
    rows = [(1, "Unique Text With Case  and   spacing"), (2, "b c d e f g h i")]
    out = {r["doc_id"]: r["text"] for r in drop_duplicate_spans(_docs(spark, rows), window=5).collect()}
    # no spans → original text unchanged, including case and spacing
    assert out[1] == "Unique Text With Case  and   spacing"
    assert out[2] == "b c d e f g h i"
