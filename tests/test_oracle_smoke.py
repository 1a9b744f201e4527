"""DuckDB-side canary: every registered oracle must EXECUTE.

The Spark-side twin is tests/test_registry_smoke.py. This one costs no
JVM at all (~seconds for all oracles at sf0.001) and fails the moment
an oracle references a missing view/column, uses a function the
container's DuckDB build lacks, or breaks on a testdata schema change —
the drift classes that would otherwise only surface in the driver's
correctness gate.
"""

from __future__ import annotations

import duckdb
import pytest

from bike_data_flow_spark.queries import load_all
from bike_data_flow_spark.tables import TABLES

from .conftest import SF_DIR

_ORACLES = sorted(n for n, q in load_all().items() if q.oracle)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


@pytest.mark.parametrize("name", _ORACLES)
def test_oracle_executes(con, name):
    q = load_all()[name]
    out = con.execute(q.oracle).fetchdf()
    assert out.shape[1] > 0  # produced a real result frame
