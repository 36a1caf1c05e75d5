"""Time every registry query through the noop sink at the given SF dir
(guide §1: measure first). b/c/s keys get 1 warmup + 3 timed passes
(median); a-keys (bounded DDL/evolution episodes) run once, timed, for
completeness. Output: sorted 'seconds  key' lines.

Usage: python tools/r16_registry_times.py [sf_dir] [key_prefix_filter]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
prefix = sys.argv[2] if len(sys.argv) > 2 else ""
os.environ["SPARK_GRAFT_SF_DIR"] = sf


def main() -> None:
    from bench import materialize
    from sample_iceberg_schema_evolution_pyiceberg_spark.operators import (
        QUERIES,
    )
    from sample_iceberg_schema_evolution_pyiceberg_spark.session import (
        get_spark,
    )

    spark = get_spark(
        app_name="registry_times",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, float] = {}
    for name, fn in QUERIES.items():
        if prefix and not name.startswith(prefix):
            continue
        spark.sparkContext.setJobDescription(name)
        try:
            if name.startswith("a"):
                t0 = time.time()
                materialize(fn(spark, sf))
                results[name] = time.time() - t0
            else:
                materialize(fn(spark, sf))  # warm
                ts = []
                for _ in range(3):
                    t0 = time.time()
                    materialize(fn(spark, sf))
                    ts.append(time.time() - t0)
                results[name] = sorted(ts)[1]
        except Exception as e:  # noqa: BLE001
            print(f"ERR {name}: {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
        print(f"done {name} {results.get(name, -1):.3f}", flush=True)
    print("\n=== sorted by median seconds ===")
    for name, sec in sorted(results.items(), key=lambda kv: -kv[1]):
        print(f"{sec:8.3f}  {name}")
    spark.stop()


if __name__ == "__main__":
    main()
