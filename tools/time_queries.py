"""Isolated per-query timing for optimization A/B runs.

Usage: python tools/time_queries.py QUERY [QUERY ...] [--reps N]

Same methodology as bench.py (noop sink, warm run, then best-of-N
timed reps, clearCache + GC between queries, SPARK_GRAFT_* env
contract) but over an explicit query list, so a single optimization's
before/after can be measured without paying the full 44-query suite.
Prints one line per query: name, best, all reps.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bike_data_flow_spark.queries import load_all  # noqa: E402
from bike_data_flow_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 3
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("time-queries")
    registry = load_all()
    for name in args:
        q = registry[name]
        spark.sparkContext.setJobDescription(f"warm: {name}")
        q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times = []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"timed[{i}]: {name}")
            t0 = time.time()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
        print(f"{name}: best={min(times)} reps={times}", flush=True)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    spark.stop()


if __name__ == "__main__":
    main()
