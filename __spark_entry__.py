"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query (pricing_summary) at sf0.001.
queries()     — every implemented operator from SURVEY.md §2 + the
                north-star extensions, as (spark, sf_dir) -> DataFrame.
oracle_sql()  — matching DuckDB SQL per query (omitted only for
                genuinely non-SQL-expressible ops).

The real implementations live in bike_data_flow_spark/queries/*; this
module is a thin adapter over that registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bike_data_flow_spark.queries import load_all  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    registry = load_all()
    return registry["pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
