"""Generic operator decade probe (r16): time one registry key's
Spark query against its own DuckDB oracle on a given corpus dir
(median of N after warmups — the c37_decade_r15 protocol, made
reusable). Writes bench_results/<key>_decade_<tag>.json.

Usage: python tools/op_decade_probe.py KEY [KEY ...]
         [--sf benchdata/sf1] [--runs 3] [--warmups 2] [--tag r16]
"""

from __future__ import annotations

import argparse
import json
import statistics
import time
from pathlib import Path

import sys

sys.path.insert(0, str(Path(__file__).parent.parent))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="+")
    ap.add_argument("--sf", default="benchdata/sf1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--warmups", type=int, default=2)
    ap.add_argument("--tag", default="r16")
    ap.add_argument(
        "--duck-mem", default=None,
        help="optional DuckDB memory_limit (e.g. 48GB); always sets a "
        "spill dir so big replays complete out-of-core",
    )
    args = ap.parse_args()

    import duckdb

    from pyspark.sql import SparkSession

    from __spark_entry__ import oracle_sql, queries

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .appName("op_decade_probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    q, o = queries(), oracle_sql()
    con = duckdb.connect()
    # out-of-core: a spill dir lets big replays complete instead of
    # OOMing (the c38 sf10 replay needs it); the memory cap stays an
    # explicit flag so small boxes keep DuckDB's own default
    con.execute("SET temp_directory='/tmp/duck_spill'")
    if args.duck_mem:
        con.execute(f"SET memory_limit='{args.duck_mem}'")
    for t in TABLES:
        p = Path(args.sf) / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    out = {}
    for key in args.keys:
        spark_times, duck_times = [], []
        for i in range(args.warmups + args.runs):
            t0 = time.time()
            n = len(q[key](spark, args.sf).collect())
            dt = time.time() - t0
            if i >= args.warmups:
                spark_times.append(dt)
        for i in range(args.warmups + args.runs):
            t0 = time.time()
            con.execute(o[key]).fetchall()
            dt = time.time() - t0
            if i >= args.warmups:
                duck_times.append(dt)
        sp = statistics.median(spark_times)
        du = statistics.median(duck_times)
        rec = {
            "sf_dir": args.sf,
            "rows": n,
            "spark_sec": round(sp, 3),
            "duck_sec": round(du, 3),
            "ratio": round(sp / du, 3),
            "runs": args.runs,
            "warmups": args.warmups,
        }
        out[key] = rec
        print(json.dumps({key: rec}))
        Path("bench_results").mkdir(exist_ok=True)
        Path(
            f"bench_results/{key}_decade_{args.tag}.json"
        ).write_text(json.dumps(rec, indent=2))


if __name__ == "__main__":
    main()
