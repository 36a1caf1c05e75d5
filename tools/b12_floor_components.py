"""Named-component decomposition of the b12 residual (VERDICT r8
item 3's 'final floor' branch): measure, on BOTH engines at the same
scale dir, a nested sequence of queries that isolates where the wall
time goes —

  scan_filter   count(*) under the shipdate filter: parquet scan of
                one column + predicate, no agg arithmetic.
  global_agg    the full fixed-point pipeline (quantize, multiply,
                hi/lo sums, count) folded into ONE group (no group-by
                columns): adds column decode + per-row arithmetic +
                agg-buffer updates, but no group-key hashing.
  full          b12 itself: adds the two string group-key columns and
                the per-row hash-probe into the 4-group hash table.

Deltas name the components: (global_agg - scan_filter) = decode +
arithmetic + buffer updates; (full - global_agg) = group-key decode +
hashing/probing. rows/s figures use the filter-passing row count.

Usage: python tools/b12_floor_components.py --sf-dir benchdata/sf300 --sf 300
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402

from bench import materialize  # noqa: E402

TS = "2000-09-01 00:00:00"


def q_scan_filter(spark: SparkSession, sf: str) -> DataFrame:
    from sample_iceberg_schema_evolution_pyiceberg_spark.operators.relational import t

    return (
        t(spark, sf, "lineitem")
        .filter(F.col("l_shipdate") <= F.lit(TS).cast("timestamp_ntz"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_global_agg(spark: SparkSession, sf: str) -> DataFrame:
    from sample_iceberg_schema_evolution_pyiceberg_spark.operators.relational import t

    return (
        t(spark, sf, "lineitem")
        .filter(F.col("l_shipdate") <= F.lit(TS).cast("timestamp_ntz"))
        .selectExpr(
            "cast(round(l_quantity * 10000) as bigint) as qty_e4",
            "cast(round(l_extendedprice * 10000) as bigint) as ext_e4",
            "10000 - cast(round(l_discount * 10000) as bigint) as f_e4",
        )
        .selectExpr("qty_e4", "ext_e4", "ext_e4 * f_e4 as dp_e8")
        .agg(
            F.expr("sum(qty_e4)").alias("q"),
            F.expr("sum(ext_e4 div 1000000000)").alias("bhi"),
            F.expr("sum(ext_e4 % 1000000000)").alias("blo"),
            F.expr("sum(dp_e8 div 1000000000)").alias("dhi"),
            F.expr("sum(dp_e8 % 1000000000)").alias("dlo"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_full(spark: SparkSession, sf: str) -> DataFrame:
    from sample_iceberg_schema_evolution_pyiceberg_spark.operators.relational import (
        b12_agg_pricing_summary,
    )

    return b12_agg_pricing_summary(spark, sf)


SPARK_Q = {"scan_filter": q_scan_filter, "global_agg": q_global_agg,
           "full": q_full}

DUCK_Q = {
    "scan_filter": f"""
        SELECT COUNT(*) AS n FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '{TS}'
    """,
    "global_agg": f"""
        SELECT SUM(CAST(l_quantity AS DECIMAL(18,4))) AS q,
               SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS b,
               SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                   * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS d,
               COUNT(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '{TS}'
    """,
    # full = the registered b12 oracle (pulled from ORACLES below)
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    os.environ["SPARK_GRAFT_SF_DIR"] = args.sf_dir
    from sample_iceberg_schema_evolution_pyiceberg_spark.operators import ORACLES
    from sample_iceberg_schema_evolution_pyiceberg_spark.session import get_spark

    DUCK_Q["full"] = ORACLES["b12_agg_pricing_summary"]

    spark = get_spark(app_name="b12_floor_components")
    spark.sparkContext.setLogLevel("ERROR")

    n_pass = q_scan_filter(spark, args.sf_dir).collect()[0]["n"]

    spark_t = {}
    for name, fn in SPARK_Q.items():
        for _ in range(2):
            materialize(fn(spark, args.sf_dir))
        s = []
        for _ in range(3):
            t0 = time.time()
            materialize(fn(spark, args.sf_dir))
            s.append(time.time() - t0)
        spark_t[name] = round(sorted(s)[1], 3)
        print("spark", name, spark_t[name], flush=True)
    spark.stop()

    import duckdb

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    con.execute("SET memory_limit = '96GB'")
    tmp = Path(args.sf_dir).parent / "duck_tmp"
    tmp.mkdir(parents=True, exist_ok=True)
    con.execute(f"SET temp_directory = '{tmp}'")
    for p in sorted(Path(args.sf_dir).iterdir()):
        tb = p.name.replace(".parquet", "")
        glob = f"{p}/*.parquet" if p.is_dir() else str(p)
        con.execute(f"CREATE VIEW {tb} AS SELECT * FROM read_parquet('{glob}')")
    duck_t = {}
    for name, sql in DUCK_Q.items():
        for _ in range(2):
            con.execute(sql).fetchall()
        s = []
        for _ in range(3):
            t0 = time.time()
            con.execute(sql).fetchall()
            s.append(time.time() - t0)
        duck_t[name] = round(sorted(s)[1], 3)
        print("duckdb", name, duck_t[name], flush=True)

    def mrows(dt: float) -> float:
        return round(n_pass / dt / 1e6, 1)

    record = {
        "sf": args.sf,
        "rows_passing_filter": n_pass,
        "spark": spark_t,
        "duckdb": duck_t,
        "components": {
            "scan_filter": {
                "spark": spark_t["scan_filter"],
                "duckdb": duck_t["scan_filter"],
            },
            "decode_arith_buffers": {
                "spark": round(spark_t["global_agg"] - spark_t["scan_filter"], 3),
                "duckdb": round(duck_t["global_agg"] - duck_t["scan_filter"], 3),
            },
            "groupkey_hash_probe": {
                "spark": round(spark_t["full"] - spark_t["global_agg"], 3),
                "duckdb": round(duck_t["full"] - duck_t["global_agg"], 3),
            },
        },
        "mrows_per_sec_full": {
            "spark": mrows(spark_t["full"]),
            "duckdb": mrows(duck_t["full"]),
        },
    }
    line = json.dumps(record)
    print(line)
    if args.out:
        Path(args.out).write_text(line + "\n")


if __name__ == "__main__":
    main()
