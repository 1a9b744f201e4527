"""Incremental aggregate maintenance — update a stored aggregate with a
delta partition WITHOUT rescanning history.

The algebra: distributive/algebraic aggregates (count, sum, min, max,
and anything rebuilt from them: avg = sum/count) merge by unioning the
stored per-key partials with the delta's partials and re-aggregating —
|keys| + |delta| rows instead of |history| + |delta|. This is the
batch twin of streaming state-store updates, and the reason a daily
100 TB pipeline costs one day's scan, not the archive's.

Non-mergeable exact aggregates (countDistinct, exact percentiles)
don't fit this path — use their sketch forms (HLL, GK; see
queries/sketches.py) whose partial state IS mergeable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# partial-state columns for each supported measure
_MERGE = {
    "count": F.sum,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


def partial_aggregate(
    df: DataFrame, keys: Sequence[str], measures: dict[str, tuple[str, str]]
) -> DataFrame:
    """Per-key partial state: measures maps output column ->
    (agg, input column) with agg in {count, sum, min, max}."""
    aggs = []
    for out, (how, col) in measures.items():
        if how == "count":
            aggs.append(F.count(col).alias(out))
        elif how == "sum":
            aggs.append(F.sum(col).alias(out))
        elif how == "min":
            aggs.append(F.min(col).alias(out))
        elif how == "max":
            aggs.append(F.max(col).alias(out))
        else:
            raise ValueError(f"non-mergeable aggregate {how!r}")
    return df.groupBy(*keys).agg(*aggs)


def merge_partials(
    stored: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    measures: dict[str, tuple[str, str]],
) -> DataFrame:
    """Fold a delta's partial state into the stored state: union the two
    partial tables and re-merge per key (counts/sums add, min/max
    combine). One shuffle over |stored keys| + |delta keys| rows —
    history is never read."""
    merged_aggs = [
        _MERGE[how if how in ("min", "max") else "sum"](out).alias(out)
        for out, (how, _) in measures.items()
    ]
    return stored.unionByName(delta).groupBy(*keys).agg(*merged_aggs)
