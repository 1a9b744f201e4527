"""Distributed logistic-regression trainer (operators/ml.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from bike_data_flow_spark.operators.ml import (
    hashed_token_features,
    logreg_score,
    logreg_train,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string, y int")


def test_separable_classes_reach_perfect_accuracy(spark):
    # class 1 and class 0 use DISJOINT vocabularies → linearly
    # separable in hashed-ratio space; GD must actually learn it
    rows = []
    for i in range(20):
        rows.append((i, "alpha bravo charlie alpha bravo", 1))
        rows.append((100 + i, "xray yankee zulu zulu xray", 0))
    feats = hashed_token_features(
        _docs(spark, rows), label=F.col("y"), n_buckets=8
    )
    w = logreg_train(feats, n_buckets=8, n_iter=25, lr=20.0)
    out = logreg_score(feats, w, n_buckets=8)
    acc = out.agg(
        F.avg((F.col("y") == F.col("predicted")).cast("int"))
    ).first()[0]
    assert acc == 1.0


def test_training_reduces_log_loss_even_without_separability(spark):
    # labels independent of text: the only learnable structure is the
    # base rate — the bias must move toward logit(mean(y)), dropping
    # log-loss below the zero-weights 0.693
    rows = [(i, "same words every time", 1 if i % 4 == 0 else 0) for i in range(40)]
    feats = hashed_token_features(_docs(spark, rows), label=F.col("y"), n_buckets=4)
    w = logreg_train(feats, n_buckets=4, n_iter=10, lr=5.0)
    scored = logreg_score(feats, w, n_buckets=4)
    eps = 1e-9
    loss = scored.agg(
        F.avg(
            -(
                F.col("y") * F.log(F.col("p") + eps)
                + (1 - F.col("y")) * F.log(1 - F.col("p") + eps)
            )
        )
    ).first()[0]
    assert loss < math.log(2) - 0.05


def test_weights_are_deterministic_across_runs(spark):
    rows = [(i, f"tok{i % 5} tok{i % 3} filler", i % 2) for i in range(30)]
    feats = hashed_token_features(_docs(spark, rows), label=F.col("y"), n_buckets=8)
    w1 = logreg_train(feats, n_buckets=8, n_iter=3, lr=1.0)
    w2 = logreg_train(feats, n_buckets=8, n_iter=3, lr=1.0)
    assert w1 == w2
    # round-6 contract: every weight is exactly representable at 6dp
    assert all(abs(w - round(w, 6)) < 1e-12 for w in w1)


def test_empty_docs_are_dropped_from_features(spark):
    rows = [(1, "a b c", 1), (2, "   ", 0)]
    feats = hashed_token_features(_docs(spark, rows), label=F.col("y"))
    ids = {r["doc_id"] for r in feats.select("doc_id").collect()}
    # doc 2 tokenizes to one empty token; it still carries a bucket —
    # both engines agree on that, so it stays
    assert 1 in ids
