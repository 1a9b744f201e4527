"""Distributed classifier training/scoring queries (operators/ml.py).

The oracle unrolls the full gradient-descent training into CTEs (the
same technique as the k-means and BPE oracles): w0 starts at zero,
each round's CTE computes the round-6 gradient update from the feature
CTE, and the final select scores every doc with the learned weights —
so DuckDB *trains the same classifier* and the value hash checks the
whole optimization, not just a frozen scoring pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import ml as M
from ..tables import load
from .textops import _sql_hash
from . import query

_B = M.LOGREG_BUCKETS
_ITERS = M.LOGREG_ITERS
_LR = M.LOGREG_LR
_TOKS = "string_split_regex(lower(trim(text)), '\\s+')"


def _feature_cte() -> str:
    bucket = _sql_hash("tok") + f" % {_B}"
    xs = ",\n             ".join(
        f"sum(CASE WHEN {bucket} = {b} THEN 1 ELSE 0 END)"
        f" / count(*) AS x{b}"
        for b in range(_B)
    )
    return f"""f AS (
      SELECT doc_id, y,
             {xs}
      FROM (
        SELECT doc_id,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
               unnest({_TOKS}) AS tok
        FROM documents
      )
      GROUP BY doc_id, y
    )"""


def _z_sql(prefix: str) -> str:
    """w0 + w1*x0 + ... folded left-to-right in ascending bucket order
    (must match operators/ml._z_expr exactly)."""
    terms = [f"{prefix}.w0"] + [
        f"{prefix}.w{b + 1} * f.x{b}" for b in range(_B)
    ]
    return " + ".join(terms)


def _p_sql(prefix: str) -> str:
    return f"round(1.0 / (1.0 + exp(-({_z_sql(prefix)}))), 6)"


def _train_ctes() -> list[str]:
    ctes = [_feature_cte()]
    # round 1 from zero weights: z = 0, p = round(1/(1+exp(0)),6) = 0.5
    prev = None
    for t in range(1, _ITERS + 1):
        p = "0.5" if prev is None else _p_sql(prev)
        src = "f" if prev is None else f"f, {prev}"
        # prev-round weights appear OUTSIDE aggregates in an aggregate
        # query; any_value() over the 1-row CTE keeps DuckDB's binder
        # happy without changing the value
        pw = (
            (lambda i: "0.0")
            if prev is None
            else (lambda i, _p=prev: f"any_value({_p}.w{i})")
        )
        cols = [
            f"round({pw(0)} + {_LR} * round(sum(f.y - {p}) / count(*), 6), 6) AS w0"
        ] + [
            f"round({pw(b + 1)} + {_LR} * "
            f"round(sum((f.y - {p}) * f.x{b}) / count(*), 6), 6) AS w{b + 1}"
            for b in range(_B)
        ]
        ctes.append(f"g{t} AS (\n      SELECT " + ",\n             ".join(cols) + f"\n      FROM {src}\n    )")
        prev = f"g{t}"
    return ctes


@query(
    "quality_classifier_scores",
    oracle="WITH "
    + ",\n    ".join(_train_ctes())
    + f"""
    SELECT f.doc_id, f.y,
           {_p_sql(f"g{_ITERS}")} AS p,
           CAST({_p_sql(f"g{_ITERS}")} >= 0.5 AS INT) AS predicted
    FROM f, g{_ITERS}
    """,
    bench=True,
)
def quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the fastText-style linear filter (logistic regression on
    hashed token ratios, full-batch GD, fixed rounds) on the corpus'
    own language labels, then score every doc — the quality/language
    filter stage of GPT-3/CCNet-style pipelines. Training state is
    B+1 doubles per round; scoring is map-only.

    Honesty note: the synthetic corpus draws every language from ONE
    shared 31-word vocabulary (verified), so no bag-of-words model can
    beat the base rate here — this gate verifies the DISTRIBUTED
    OPTIMIZATION end-to-end (both engines run the same GD and must
    land on hash-identical weights/scores); actual learning is pinned
    by tests/test_ml.py on a separable fixture (accuracy 1.0).
    See operators/ml.py for the float-parity contract."""
    docs = load(spark, sf_dir, "documents")
    feats = M.hashed_token_features(
        docs, label=(F.col("lang") == "en").cast("int")
    ).cache()
    weights = M.logreg_train(feats)
    out = M.logreg_score(feats, weights)
    return out.select("doc_id", "y", "p", "predicted")
