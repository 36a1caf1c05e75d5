"""Measure AQE on/off wall-clock at small SF for the headline set.

AQE materializes every shuffle exchange as its own job; on local[32]
each job carries a ~0.2 s scheduling floor, so at sub-GB input the
materialization overhead can dominate. This experiment quantifies that
so the small-input planning heuristic in session.py is evidence-based,
not folklore. At 100 TB AQE's runtime re-planning (skew joins,
partition coalescing) is strictly worth it — the question is only where
the crossover sits.

Usage: python tools/aqe_experiment.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from bench import HEADLINE, materialize  # noqa: E402


def run_mode(aqe: bool, names: list[str], sf_dir: str) -> dict[str, float]:
    from sample_iceberg_schema_evolution_pyiceberg_spark.operators import QUERIES
    from sample_iceberg_schema_evolution_pyiceberg_spark.session import get_spark

    spark = get_spark(
        app_name=f"aqe_{aqe}",
        extra_conf={"spark.sql.adaptive.enabled": str(aqe).lower()},
    )
    spark.sparkContext.setLogLevel("ERROR")
    assert spark.conf.get("spark.sql.adaptive.enabled") == str(aqe).lower()
    for _ in range(2):
        for name in names:
            materialize(QUERIES[name](spark, sf_dir))
    out: dict[str, float] = {}
    for name in names:
        samples = []
        for _ in range(3):
            t0 = time.time()
            materialize(QUERIES[name](spark, sf_dir))
            samples.append(time.time() - t0)
        out[name] = sorted(samples)[1]
    spark.stop()
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or HEADLINE
    on = run_mode(True, names, sf_dir)
    off = run_mode(False, names, sf_dir)
    print(f"{'query':<28} {'aqe_on':>8} {'aqe_off':>8} {'delta':>8}")
    for n in names:
        print(f"{n:<28} {on[n]:8.3f} {off[n]:8.3f} {on[n] - off[n]:+8.3f}")
    print(f"{'TOTAL':<28} {sum(on.values()):8.3f} {sum(off.values()):8.3f}")


if __name__ == "__main__":
    main()
