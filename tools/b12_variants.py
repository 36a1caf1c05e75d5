"""A/B harness for the b12 HashAggregate residual (VERDICT r8 item 3).

Variants, all required to be BIT-IDENTICAL to the shipped b12 output
(sorted-collect compare before any timing is believed):

  current   the shipped fixed-point hi/lo kernel (relational.py:340)
  dec38     single wide-decimal accumulators instead of the hi/lo long
            pairs — sum(cast(x as decimal(38,0))). Fewer agg buffers,
            but precision>18 decimals leave Spark's mutable-long
            UnsafeRow fast path; the r8 verdict asked for this measured.
  intkey    the hi/lo kernel but grouping on ONE int key
            (ascii(flag)*256+ascii(status)) instead of two UTF8String
            keys, recovering the strings in the |groups|-row final
            projection — per-row group-key hashing/equality drops from
            two string probes to one int.
Usage: python tools/b12_variants.py --sf-dir benchdata/sf10 \
           [--variants current intkey dec38] [--runs 3]
Prints one JSON line per variant {variant, median, min, max} plus an
identical-output verdict.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402

from bench import materialize  # noqa: E402


def _scan(spark: SparkSession, sf: str) -> DataFrame:
    from sample_iceberg_schema_evolution_pyiceberg_spark.operators.relational import t

    l = t(spark, sf, "lineitem")
    return l.filter(
        F.col("l_shipdate") <= F.lit("2000-09-01 00:00:00").cast("timestamp_ntz")
    )


def v_current(spark: SparkSession, sf: str) -> DataFrame:
    from sample_iceberg_schema_evolution_pyiceberg_spark.operators.relational import (
        b12_agg_pricing_summary,
    )

    return b12_agg_pricing_summary(spark, sf)


def v_dec38(spark: SparkSession, sf: str) -> DataFrame:
    return (
        _scan(spark, sf)
        .selectExpr(
            "l_returnflag", "l_linestatus",
            "cast(round(l_quantity * 10000) as bigint) as qty_e4",
            "cast(round(l_extendedprice * 10000) as bigint) as ext_e4",
            "10000 - cast(round(l_discount * 10000) as bigint) as f_e4",
        )
        .selectExpr(
            "l_returnflag", "l_linestatus", "qty_e4", "ext_e4",
            "ext_e4 * f_e4 as dp_e8",
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.expr("sum(qty_e4)").alias("q"),
            F.expr("sum(cast(ext_e4 as decimal(28,0)))").alias("b"),
            F.expr("sum(cast(dp_e8 as decimal(28,0)))").alias("d"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .selectExpr(
            "l_returnflag", "l_linestatus",
            "round(cast(cast(q as decimal(20,0)) / 10000 as double), 6)"
            " as sum_qty",
            "round(cast(b / 10000 as double), 6) as sum_base_price",
            "round(cast(d / 100000000 as double), 6) as sum_disc_price",
            "count_order",
        )
    )


def v_intkey(spark: SparkSession, sf: str) -> DataFrame:
    return (
        _scan(spark, sf)
        .selectExpr(
            "ascii(l_returnflag) * 256 + ascii(l_linestatus) as gk",
            "cast(round(l_quantity * 10000) as bigint) as qty_e4",
            "cast(round(l_extendedprice * 10000) as bigint) as ext_e4",
            "10000 - cast(round(l_discount * 10000) as bigint) as f_e4",
        )
        .selectExpr(
            "gk", "qty_e4", "ext_e4",
            "ext_e4 * f_e4 as dp_e8",
        )
        .groupBy("gk")
        .agg(
            F.expr("sum(qty_e4)").alias("q"),
            F.expr("sum(ext_e4 div 1000000000)").alias("bhi"),
            F.expr("sum(ext_e4 % 1000000000)").alias("blo"),
            F.expr("sum(dp_e8 div 1000000000)").alias("dhi"),
            F.expr("sum(dp_e8 % 1000000000)").alias("dlo"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .selectExpr(
            "char(gk div 256) as l_returnflag",
            "char(gk % 256) as l_linestatus",
            "round(cast(cast(q as decimal(20,0)) / 10000 as double), 6)"
            " as sum_qty",
            "round(cast(cast(bhi * 100000 as decimal(20,0))"
            " + cast(blo as decimal(19,0)) / 10000 as double), 6)"
            " as sum_base_price",
            "round(cast(cast(dhi * 10 as decimal(20,0))"
            " + cast(dlo as decimal(19,0)) / 100000000 as double), 6)"
            " as sum_disc_price",
            "count_order",
        )
    )


VARIANTS = {"current": v_current, "dec38": v_dec38, "intkey": v_intkey}


def rows_key(df: DataFrame):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--variants", nargs="*", default=list(VARIANTS))
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    import os

    os.environ["SPARK_GRAFT_SF_DIR"] = args.sf_dir
    from sample_iceberg_schema_evolution_pyiceberg_spark.session import get_spark

    spark = get_spark(app_name="b12_variants")
    spark.sparkContext.setLogLevel("ERROR")

    base = rows_key(VARIANTS["current"](spark, args.sf_dir))
    for name in args.variants:
        if name == "current":
            continue
        got = rows_key(VARIANTS[name](spark, args.sf_dir))
        assert got == base, f"{name} output differs from current"
        print(f"{name}: bit-identical to current", flush=True)

    for name in args.variants:
        fn = VARIANTS[name]
        for _ in range(2):
            materialize(fn(spark, args.sf_dir))
        samples = []
        for _ in range(args.runs):
            t0 = time.time()
            materialize(fn(spark, args.sf_dir))
            samples.append(time.time() - t0)
        print(json.dumps({
            "variant": name,
            "median": round(sorted(samples)[len(samples) // 2], 3),
            "min": round(min(samples), 3),
            "max": round(max(samples), 3),
        }), flush=True)


if __name__ == "__main__":
    main()
