"""Physical-plan snapshot regression gate for the bench queries.

A lost broadcast, a new shuffle, or an unpushed filter changes the
canonical plan skeleton and fails here BEFORE it costs bench time.
After an INTENTIONAL plan change, review the diff this test prints and
regenerate with `python tools/plan_snapshots.py [NAME...]`.
"""

from __future__ import annotations

import difflib
import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)
from plan_snapshots import SF_DIR, SNAP_DIR, current_plan  # noqa: E402

from bike_data_flow_spark.queries import load_all  # noqa: E402

_REGISTRY = load_all()
_BENCH = [q for q in _REGISTRY.values() if q.bench]


@pytest.mark.parametrize("q", _BENCH, ids=lambda q: q.name)
def test_bench_plan_matches_snapshot(spark, q):
    snap_path = f"{SNAP_DIR}/{q.name}.txt"
    assert os.path.exists(snap_path), (
        f"no plan snapshot for bench query {q.name} — run "
        "`python tools/plan_snapshots.py` and commit tests/plan_snapshots/"
    )
    with open(snap_path, encoding="utf-8") as fh:
        want = fh.read()
    got = current_plan(spark, q, SF_DIR)
    if got != want:
        # One re-capture before failing: queries that EXECUTE during
        # plan construction (connected components, store probes) embed
        # AQE final plans whose exchange-reuse shape can wobble with
        # transient session state (observed once on curation_v2, r11) —
        # a REAL plan regression reproduces identically on a fresh
        # capture, a one-shot AQE wobble does not.
        spark.sparkContext._jvm.System.gc()
        got = current_plan(spark, q, SF_DIR)
    if got != want:
        diff = "\n".join(
            difflib.unified_diff(
                want.splitlines(), got.splitlines(),
                "snapshot", "current", lineterm="",
            )
        )
        pytest.fail(
            f"physical plan of {q.name} changed:\n{diff}\n\n"
            "If intentional: python tools/plan_snapshots.py "
            f"{q.name} && git add tests/plan_snapshots/"
        )
