"""Scale-decade bench for the perf-weak set (b12/b13/b21 + optional
extras): same protocol as bench.py (2 warmups, median of 3,
back-to-back per-query sampling) against a derived scale dir that may
hold only the tables these queries touch (lineitem). Accepts both a
single-file `lineitem.parquet` and a chunked `lineitem.parquet/`
directory (DuckDB reads the glob, Spark reads the dir).

Usage: python tools/weakset_bench.py --sf-dir benchdata/sf100 --sf 100
       [--queries b12_agg_pricing_summary b13_agg_count_distinct b21_topk]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from bench import materialize, plan_fingerprint  # noqa: E402

DEFAULT = ["b12_agg_pricing_summary", "b13_agg_count_distinct", "b21_topk"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--queries", nargs="*", default=DEFAULT)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from sample_iceberg_schema_evolution_pyiceberg_spark.operators import (
        ORACLES,
        QUERIES,
    )
    from sample_iceberg_schema_evolution_pyiceberg_spark.session import get_spark

    spark = get_spark(app_name="weakset_bench")
    spark.sparkContext.setLogLevel("ERROR")

    warmups, runs = 2, 3
    for _ in range(warmups):
        for name in args.queries:
            materialize(QUERIES[name](spark, args.sf_dir))
    samples = {n: [] for n in args.queries}
    fingerprints = {}
    for name in args.queries:
        fn = QUERIES[name]
        fingerprints[name] = plan_fingerprint(fn(spark, args.sf_dir))
        for _ in range(runs):
            t0 = time.time()
            materialize(fn(spark, args.sf_dir))
            samples[name].append(time.time() - t0)
    times = {n: round(sorted(s)[len(s) // 2], 3) for n, s in samples.items()}
    spread = {
        n: {"min": round(min(s), 3), "max": round(max(s), 3)}
        for n, s in samples.items()
    }
    spark.stop()
    if args.out:
        # flush the Spark half immediately: at large SFs the DuckDB
        # phase can die (an unbounded in-memory DB cannot spill a
        # 100 GB multi-distinct hash table) and must not take the
        # Spark measurements down with it — learned at sf300, where
        # the OOM killer reaped the process after 45 min of Spark
        Path(args.out + ".spark").write_text(
            json.dumps({"queries": times, "query_spread": spread,
                        "sf": args.sf}) + "\n"
        )

    import duckdb

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    # bound DuckDB and give it a spill path — the same courtesy the
    # Spark side gets from its own memory manager; without a
    # temp_directory an in-memory DuckDB OOMs instead of spilling
    con.execute("SET memory_limit = '96GB'")
    tmp = Path(args.sf_dir).parent / "duck_tmp"
    tmp.mkdir(parents=True, exist_ok=True)
    con.execute(f"SET temp_directory = '{tmp}'")
    for p in sorted(Path(args.sf_dir).iterdir()):
        tb = p.name.replace(".parquet", "")
        glob = f"{p}/*.parquet" if p.is_dir() else str(p)
        con.execute(
            f"CREATE VIEW {tb} AS SELECT * FROM read_parquet('{glob}')"
        )
    d_samples = {n: [] for n in args.queries if n in ORACLES}
    for _ in range(warmups):
        for name in d_samples:
            con.execute(ORACLES[name]).fetchall()
    for _ in range(runs):
        for name in d_samples:
            t0 = time.time()
            con.execute(ORACLES[name]).fetchall()
            d_samples[name].append(time.time() - t0)
    duck = {n: round(sorted(s)[len(s) // 2], 3) for n, s in d_samples.items()}

    record = {
        "metric": "weakset_wall_clock",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": args.sf,
        "query_spread": spread,
        "plan_fingerprints": fingerprints,
        "duckdb_queries": duck,
        "ratios": {
            n: round(times[n] / duck[n], 2) for n in duck if duck[n] > 0
        },
    }
    line = json.dumps(record)
    print(line)
    if args.out:
        Path(args.out).write_text(line + "\n")


if __name__ == "__main__":
    main()
