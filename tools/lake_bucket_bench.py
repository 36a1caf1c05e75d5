"""Decade bench of the LAKE-RESIDENT bucketed fact-fact join (the a28/
b66 layout, VERDICT r8 item 1's payoff) against (a) the parquet-source
bucketed-cache layout the b03 headline benches and (b) the DuckDB
oracle — all in one box session, warm, median of 3.

What it proves at a work-dominated scale: a lake table written with
`PARTITIONED BY (bucket(N, key))` + `write.bucket-layout=spark`
schedules the orderkey join with NO exchange on either fact side, and
the table-format read path (snapshot resolution, manifest consumption,
catalog adoption of the bucket layout) adds ~zero overhead over the
raw bucketed parquet cache. The lake ingest writes are one-time and
reported separately (ingest cost, amortized per table).

Usage: python tools/lake_bucket_bench.py --sf-dir benchdata/sf10 --sf 10
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402

from bench import materialize, plan_fingerprint  # noqa: E402


def lake_join(spark: SparkSession, wh: str, sf_dir: str) -> DataFrame:
    """b03's exact query shape, fact arms read from the LAKE tables."""
    from sample_iceberg_schema_evolution_pyiceberg_spark.operators.registry import t
    from sample_iceberg_schema_evolution_pyiceberg_spark.table_format import (
        LakeCatalog,
    )

    cat = LakeCatalog(wh)
    l = cat.load_table("bench", "lineitem").to_df(spark).selectExpr(
        "l_orderkey",
        "cast(round(l_extendedprice * 10000) as bigint)"
        " * (10000 - cast(round(l_discount * 10000) as bigint))"
        " as dp_e8",
    )
    o = cat.load_table("bench", "orders").to_df(spark)
    c, n = t(spark, sf_dir, "customer"), t(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.expr("sum(dp_e8 div 1000000000)").alias("dhi"),
            F.expr("sum(dp_e8 % 1000000000)").alias("dlo"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .selectExpr(
            "n_name",
            "round(cast(cast(dhi * 10 as decimal(20,0))"
            " + cast(dlo as decimal(19,0)) / 100000000 as double), 6)"
            " as revenue",
            "n_lineitems",
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--lake-only", action="store_true",
        help="sf dir holds only the dims (facts live in the lake "
             "warehouse): skip the parquet-cache variant and the "
             "DuckDB denominator (compare against a recorded run)",
    )
    ap.add_argument(
        "--wh", default=None,
        help="existing lake warehouse to measure (skips ingest)",
    )
    ap.add_argument(
        "--layout", default="spark", choices=("spark", "dual"),
        help="write.bucket-layout for the lake ingest (dual = spec-"
             "murmur hive dirs + Spark bucket files; export-true)",
    )
    args = ap.parse_args()

    os.environ["SPARK_GRAFT_SF_DIR"] = args.sf_dir
    from sample_iceberg_schema_evolution_pyiceberg_spark.operators import (
        ORACLES,
        QUERIES,
    )
    from sample_iceberg_schema_evolution_pyiceberg_spark.partitioning import (
        compile_partition_spec,
    )
    from sample_iceberg_schema_evolution_pyiceberg_spark.session import get_spark
    from sample_iceberg_schema_evolution_pyiceberg_spark.sources import buckets_for
    from sample_iceberg_schema_evolution_pyiceberg_spark.table_format import (
        LakeCatalog,
    )

    spark = get_spark(app_name="lake_bucket_bench")
    spark.sparkContext.setLogLevel("ERROR")
    buckets = buckets_for(args.sf_dir)

    suffix = "" if args.layout == "spark" else f"_{args.layout}"
    wh = args.wh or str(
        Path(args.sf_dir).parent / f"lake_bkt_wh_sf{args.sf}{suffix}"
    )
    ingest = {}
    if not Path(wh).exists():
        cat = LakeCatalog(wh)
        for name, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
            df = spark.read.parquet(f"{args.sf_dir}/{name}.parquet")
            spec = compile_partition_spec(
                {"partitions": [
                    {"column_name": key, "transform": f"bucket[{buckets}]"}
                ]}
            )
            tbl = cat.create_table(
                "bench", name, df.schema, partition_spec=spec,
                properties={"write.bucket-layout": args.layout},
            )
            t0 = time.time()
            tbl.append(df)
            ingest[name] = round(time.time() - t0, 1)
            print("ingest", name, ingest[name], "s", flush=True)

    variants = {
        f"lake_bucketed_{args.layout}": lambda: lake_join(
            spark, wh, args.sf_dir
        ),
    }
    if not args.lake_only:
        variants["parquet_cache (b03)"] = lambda: QUERIES[
            "b03_join_inner_3way"
        ](spark, args.sf_dir)
    results, fps = {}, {}
    for name, fn in variants.items():
        plan = fn()._jdf.queryExecution().executedPlan().toString()
        fps[name] = plan_fingerprint(fn())
        for _ in range(2):
            materialize(fn())
        s = []
        for _ in range(3):
            t0 = time.time()
            materialize(fn())
            s.append(time.time() - t0)
        results[name] = {
            "median": round(sorted(s)[1], 3),
            "min": round(min(s), 3), "max": round(max(s), 3),
        }
        print(name, json.dumps(results[name]), flush=True)
    # the layout claim on the LAKE variant, from the measured session:
    # nothing below the fact-fact SortMergeJoin may be an Exchange
    ex = lake_join(spark, wh, args.sf_dir)._jdf.queryExecution(
    ).executedPlan().toString()
    # the claim: no shuffle ever repartitions a fact side on the
    # orderkey. Covers both physical shapes — the SMJ decade plan
    # (bucketed scans joined exchange-free) and the small-sf shape
    # where the orders side BROADCASTS (equally fact-shuffle-free;
    # the only hash exchange left is the final |groups| aggregate).
    no_exchange = not re.search(
        r"Exchange hashpartitioning\((?:l_orderkey|o_orderkey)", ex
    )
    # SelectedBucketsCount from the measured session: the bucketed
    # scans must actually engage bucket scheduling
    selected = ex.count("SelectedBucketsCount")
    spark.stop()

    import duckdb

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    con.execute("SET memory_limit = '96GB'")
    for p in sorted(Path(args.sf_dir).iterdir()):
        tb = p.name.replace(".parquet", "")
        glob = f"{p}/*.parquet" if p.is_dir() else str(p)
        con.execute(f"CREATE VIEW {tb} AS SELECT * FROM read_parquet('{glob}')")
    duck = None
    if not args.lake_only:
        sql = ORACLES["b03_join_inner_3way"]
        for _ in range(2):
            con.execute(sql).fetchall()
        s = []
        for _ in range(3):
            t0 = time.time()
            con.execute(sql).fetchall()
            s.append(time.time() - t0)
        duck = round(sorted(s)[1], 3)

    record = {
        "metric": "lake_bucketed_join_decade",
        "layout": args.layout,
        "sf": args.sf,
        "buckets": buckets,
        "ingest_sec": ingest,
        "variants": results,
        "plan_fingerprints": fps,
        "no_exchange_on_fact_arms": no_exchange,
        "selected_buckets_scans": selected,
        "duckdb": duck,
        "ratios": (
            {k: round(v["median"] / duck, 2) for k, v in results.items()}
            if duck
            else None
        ),
    }
    line = json.dumps(record)
    print(line)
    if args.out:
        Path(args.out).write_text(line + "\n")


if __name__ == "__main__":
    main()
