"""Per-query job/stage profiler for the headline bench set.

Runs each headline query warm (same protocol as bench.py) and reports
wall time plus how many Spark jobs and stages the materialization
triggered. On local[32] each job pays a ~0.2 s scheduling/codegen floor,
so job count is the structural lower bound on query latency at small SF
— a query that is fast per-stage but runs 4 jobs cannot beat 0.8 s.

Usage: python tools/profile_bench.py [query ...]   (default: bench HEADLINE)
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from bench import HEADLINE, materialize  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or HEADLINE

    from sample_iceberg_schema_evolution_pyiceberg_spark.operators import QUERIES
    from sample_iceberg_schema_evolution_pyiceberg_spark.session import get_spark

    spark = get_spark(app_name="profile_bench")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    for _ in range(2):
        for name in names:
            materialize(QUERIES[name](spark, sf_dir))

    print(f"{'query':<28} {'sec':>7} {'jobs':>5} {'stages':>7} {'tasks':>6}")
    for name in names:
        fn = QUERIES[name]
        before = set(tracker.getJobIdsForGroup(None) or [])
        # fresh job group so we can attribute jobs to this query
        sc.setJobGroup(name, name)
        t0 = time.time()
        materialize(fn(spark, sf_dir))
        dt = time.time() - t0
        jobs = [j for j in (tracker.getJobIdsForGroup(name) or []) if j not in before]
        stages, tasks = 0, 0
        for j in jobs:
            info = tracker.getJobInfo(j)
            if info is None:
                continue
            stages += len(info.stageIds)
            for s in info.stageIds:
                si = tracker.getStageInfo(s)
                if si is not None:
                    tasks += si.numTasks
        print(f"{name:<28} {dt:7.3f} {len(jobs):>5} {stages:>7} {tasks:>6}")
        sc.setJobGroup("idle", "idle")

    spark.stop()


if __name__ == "__main__":
    main()
