"""Interleaved A/B of runtime SQL confs over a query list.

The round-12 verdict left the session-wide shuffled-hash-join default
unaudited on the relational tail (shipping_priority 0.47x etc. in the
driver's bench). Wall time on this host swings +-50% between windows
(external page-cache drops), so a valid A/B must (a) interleave the
two configurations inside ONE JVM/session, (b) run both orders, and
(c) report the deterministic shape counters (jobs/stages/task_ms)
next to wall. This tool does exactly that for confs that are
runtime-settable (spark.sql.*): for each query it warms both configs,
then alternates A,B,A,B,... reps (and B,A,B,A on the second pass).

Usage:
  python tools/ab_conf.py --conf spark.sql.join.preferSortMergeJoin=true:false \
      [--conf k=vA:vB ...] [--reps=N] QUERY [QUERY ...]

A = first value, B = second value. Current session defaults are in
bike_data_flow_spark/session.py (A should normally be the committed
default so "A" mirrors the shipped tree).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bike_data_flow_spark.queries import load_all  # noqa: E402
from bike_data_flow_spark.session import get_spark  # noqa: E402
from tools.profile_queries import _job_stage_task  # noqa: E402


def main() -> None:
    confs: list[tuple[str, str, str]] = []
    names: list[str] = []
    reps = 4
    args = iter(sys.argv[1:])
    for a in args:
        if a == "--conf" or a.startswith("--conf="):
            kv = a.split("=", 1)[1] if "=" in a else next(args)
            k, vals = kv.split("=", 1)
            va, vb = vals.split(":", 1)
            confs.append((k, va, vb))
        elif a.startswith("--reps"):
            reps = int(a.split("=", 1)[1])
        else:
            names.append(a)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-conf")
    registry = load_all()

    def set_side(side: str) -> None:
        for k, va, vb in confs:
            spark.conf.set(k, va if side == "A" else vb)

    results: dict[str, dict[str, list]] = {}
    for name in names:
        q = registry[name]
        rows: dict[str, list] = {"A": [], "B": []}
        for first in ("A", "B"):  # both orders
            order = [first, "B" if first == "A" else "A"]
            for side in order:  # warm each side once per pass
                set_side(side)
                spark.sparkContext.setJobDescription(f"warm[{side}]: {name}")
                q.fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            for i in range(reps):
                for side in order:
                    set_side(side)
                    spark.sparkContext.setJobDescription(
                        f"timed[{side}{i}]: {name}"
                    )
                    j0, s0, t0 = _job_stage_task(spark)
                    w0 = time.time()
                    q.fn(spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    wall = time.time() - w0
                    j1, s1, t1 = _job_stage_task(spark)
                    rows[side].append(
                        (wall, j1 - j0, s1 - s0, t1 - t0, first)
                    )
                    print(
                        f"{name} [{side} pass={first}] rep{i}: "
                        f"wall={wall:.3f} jobs={j1 - j0} stages={s1 - s0} "
                        f"task_ms={t1 - t0}",
                        flush=True,
                    )
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        results[name] = rows

    print("\n== summary (best / median wall; jobs; task_ms median) ==")
    for name, rows in results.items():
        line = [name]
        for side in ("A", "B"):
            walls = sorted(r[0] for r in rows[side])
            tasks = sorted(r[3] for r in rows[side])
            jobs = rows[side][0][1]
            line.append(
                f"{side}: best={walls[0]:.3f} "
                f"med={walls[len(walls) // 2]:.3f} jobs={jobs} "
                f"task_med={tasks[len(tasks) // 2]}"
            )
        print(" | ".join(line), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
