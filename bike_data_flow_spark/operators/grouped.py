"""Grouped-map pandas operators (applyInPandas) — the per-group Python
escape hatch, with a correctness pin against the native expression.

trend_slope_pandas computes the same per-user least-squares slope as
the native regr_slope aggregate (queries/relational4.user_value_trend);
tests assert equality. Use the native one in production — the pandas
twin documents the pattern for group algorithms Spark genuinely lacks
(e.g. per-group model fits).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def trend_slope_pandas(
    events: DataFrame, out_ddl: str = "user_id long, slope_per_hour double, n long"
) -> DataFrame:
    """Per-user OLS slope of value vs hours, via applyInPandas."""

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x = (pdf["ts_ns"] // 1_000_000) / 3_600_000.0
        y = pdf["value"]
        n = len(pdf)
        if n < 2 or x.nunique() < 2:
            slope = float("nan")
        else:
            mx, my = x.mean(), y.mean()
            slope = ((x - mx) * (y - my)).sum() / ((x - mx) ** 2).sum()
        return pd.DataFrame(
            [{"user_id": pdf["user_id"].iloc[0], "slope_per_hour": slope, "n": n}]
        )

    return events.select("user_id", "ts_ns", "value").groupBy("user_id").applyInPandas(
        fit, out_ddl
    )
