"""Decompose the sf0.1 per-query wall clock into named floor
components (VERDICT r7 item 1): Python/JVM plan CONSTRUCTION (the
`QUERIES[name](spark, sf_dir)` call — DataFrame API round-trips +
analysis), and ACTION (optimize + codegen-cache hit + AQE stage
round-trips + task scheduling + execution) — measured separately,
steady-state, same protocol as bench.py (2 warmups, median of 3).

Optional env:
  SPARK_GRAFT_SF_DIR      input dir (default /root/testdata/sf0.1)
  FLOOR_QUERIES           comma-separated subset
  FLOOR_EXTRA_CONF        k=v,k=v applied on top of engine defaults
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from bench import HEADLINE, materialize  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ["SPARK_GRAFT_SF_DIR"] = sf_dir  # session sizing sees it
    names = HEADLINE
    if sub := os.environ.get("FLOOR_QUERIES"):
        names = [q for q in names if q in set(sub.split(","))]
    extra = {}
    if raw := os.environ.get("FLOOR_EXTRA_CONF"):
        extra = dict(kv.split("=", 1) for kv in raw.split(","))

    from sample_iceberg_schema_evolution_pyiceberg_spark.operators import QUERIES
    from sample_iceberg_schema_evolution_pyiceberg_spark.session import get_spark

    spark = get_spark(app_name="floor_profile", extra_conf={
        "spark.ui.showConsoleProgress": "false", **extra,
    })
    spark.sparkContext.setLogLevel("ERROR")

    for _ in range(2):
        for name in names:
            materialize(QUERIES[name](spark, sf_dir))

    out = {}
    sc = spark.sparkContext
    for name in names:
        fn = QUERIES[name]
        cons, act, tasks, jobs = [], [], [], []
        for _ in range(3):
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            tracker = sc.statusTracker()
            before = tracker.getJobIdsForGroup(None)
            materialize(df)
            t2 = time.time()
            after = tracker.getJobIdsForGroup(None)
            new_jobs = set(after) - set(before)
            ntasks = 0
            for jid in new_jobs:
                ji = tracker.getJobInfo(jid)
                if ji is None:
                    continue
                for sid in ji.stageIds:
                    si = tracker.getStageInfo(sid)
                    if si is not None:
                        ntasks += si.numTasks
            cons.append(t1 - t0)
            act.append(t2 - t1)
            tasks.append(ntasks)
            jobs.append(len(new_jobs))
        med = lambda s: round(sorted(s)[len(s) // 2], 3)  # noqa: E731
        out[name] = {
            "construct": med(cons),
            "action": med(act),
            "tasks": sorted(tasks)[1],
            "jobs": sorted(jobs)[1],
        }
    total_c = round(sum(v["construct"] for v in out.values()), 3)
    total_a = round(sum(v["action"] for v in out.values()), 3)
    print(json.dumps({
        "sf_dir": sf_dir, "per_query": out,
        "construct_total": total_c, "action_total": total_a,
        "total": round(total_c + total_a, 3),
    }, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
