"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully materialized through the noop sink (computes every
output column on executors, ships nothing to the driver).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bike_data_flow_spark.queries import load_all  # noqa: E402
from bike_data_flow_spark.session import get_spark  # noqa: E402


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    registry = load_all()
    bench_queries = [q for q in registry.values() if q.bench]

    # Warm every query shape once (JVM JIT + codegen + file-index caches),
    # then time steady-state execution — the regime a long-lived cluster
    # actually runs in. Best-of-2 per query: single-shot timings on a
    # busy host carry ±25% scheduler noise that swamps real deltas.
    for q in bench_queries:
        materialize(q.fn(spark, sf_dir))

    timings: dict[str, float] = {}
    for q in bench_queries:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            materialize(q.fn(spark, sf_dir))
            best = min(best, time.time() - t0)
        timings[q.name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
