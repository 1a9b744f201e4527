"""Corpus selection under a token budget.

The standard curation step after quality scoring: keep the
highest-quality documents whose cumulative token count fits the
training budget (greedy prefix of the (score DESC, id ASC) order —
the semantics a SQL `QUALIFY sum(w) OVER (ORDER BY ...) <= budget`
expresses).

The naive spelling is a GLOBAL ordered cumsum — an un-partitioned
window, i.e. every row through one task: a scale-killer. This
operator computes the identical result set in two phases, neither of
which ever concentrates the corpus:

1. **Histogram cutoff**: scores bucket into ``bins`` histogram bins
   (floor(score·bins) — monotone in score, so bin order == score
   order). Per-bin token totals aggregate map-side; the running-total
   window runs over ≤ bins+1 rows. Bins whose prefix fits entirely
   are kept whole; bins past the budget drop whole.
2. **Boundary fill**: only the ONE bin the budget crosses is sorted
   (score DESC, id ASC) for a bin-local cumsum against the remaining
   budget — ~1/bins of the corpus through that window, dialed by
   ``bins``.

Ties and boundaries behave exactly like the global prefix: a document
whose weight overshoots the remaining budget is excluded and ends the
prefix (greedy, not knapsack).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def select_within_token_budget(
    df: DataFrame,
    budget: int,
    score_col: str = "score",
    weight_col: str = "n_tokens",
    id_col: str = "doc_id",
    bins: int = 100,
) -> DataFrame:
    """Rows of ``df`` forming the greedy (score DESC, id ASC) prefix
    whose cumulative ``weight_col`` stays ≤ ``budget``. ``score_col``
    must be in [0, 1] (quality scores are); NULL scores are excluded.
    Returns the input columns, unordered (set semantics)."""
    d = df.filter(F.col(score_col).isNotNull()).select(
        id_col, score_col, weight_col
    )
    # cached: three consumers (bin totals, full-bin keep, boundary
    # fill) would otherwise re-run the caller's scoring pipeline —
    # typically regex-heavy quality metrics — once each
    binned = d.withColumn("_bin", F.floor(F.col(score_col) * bins)).cache()
    totals = binned.groupBy("_bin").agg(F.sum(weight_col).alias("_bin_w"))
    wdesc = Window.orderBy(F.desc("_bin")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    marked = totals.withColumn(
        "_above", F.coalesce(F.sum("_bin_w").over(wdesc), F.lit(0))
    )
    full_bins = marked.filter(F.col("_above") + F.col("_bin_w") <= budget).select(
        "_bin"
    )
    boundary = marked.filter(
        (F.col("_above") < budget) & (F.col("_above") + F.col("_bin_w") > budget)
    ).select("_bin", (F.lit(budget) - F.col("_above")).alias("_remaining"))

    kept_full = binned.join(F.broadcast(full_bins), "_bin", "left_semi")
    wbin = Window.partitionBy("_bin").orderBy(
        F.desc(score_col), F.asc(id_col)
    ).rowsBetween(Window.unboundedPreceding, 0)
    kept_partial = (
        binned.join(F.broadcast(boundary), "_bin")
        .withColumn("_cum", F.sum(weight_col).over(wbin))
        .filter(F.col("_cum") <= F.col("_remaining"))
        .drop("_remaining", "_cum")
    )
    return kept_full.unionByName(kept_partial).drop("_bin")
