"""Build the sf100 LAKE-RESIDENT b03 fixture without the ~50 GB of
intermediate source parquet r9's flow needed (disk budget: the box
holds ~73 GB free; sources + lake copies of both facts do not fit).

- dims (customer / nation / region) land as parquet in
  benchdata/sf100 via make_sf1's exact stride scheme from sf10 —
  the b03 shape reads dims from the sf dir;
- facts (lineitem / orders) are written DIRECTLY into lake tables
  (bucket[32] on the orderkey, write.bucket-layout=spark) as ten
  key-shifted appends of the sf10 source — one append per copy, the
  fragmented-union shape the bucketed-fact lifecycle test pins
  (unions of bucketed snapshots keep the zero-exchange join;
  compact() folds them when wanted).

Key arithmetic matches tools/make_sf1.py: copy g shifts each key by
g * pow10_stride(table) — orderkey stride 1e8, custkey stride 1e7 at
the sf10 source — so revenue-per-key workload is identical to sf10,
just 10x more of it.

Usage: python tools/make_sf100_lake.py [--layout spark|dual]

--layout dual (r12) builds the export-true dual-layout twin
(lake_bkt_wh_sf100.0_dual) for the decade A/B VERDICT r10 item 4
prescribes: same ten key-shifted appends, write.bucket-layout=dual.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent))

from make_sf1 import pow10_stride  # noqa: E402

SRC = str(Path(__file__).parent.parent / "benchdata" / "sf10")
DST = Path(__file__).parent.parent / "benchdata" / "sf100"
COPIES = 10
BUCKETS = 32

_ap = argparse.ArgumentParser()
_ap.add_argument("--layout", default="spark", choices=("spark", "dual"))
ARGS = _ap.parse_args() if __name__ == "__main__" else None
LAYOUT = ARGS.layout if ARGS else "spark"
_suffix = "" if LAYOUT == "spark" else f"_{LAYOUT}"
WH = (
    Path(__file__).parent.parent
    / "benchdata"
    / f"lake_bkt_wh_sf100.0{_suffix}"
)


def build_dims() -> None:
    con = duckdb.connect()
    DST.mkdir(parents=True, exist_ok=True)
    for t in ("nation", "region"):
        if (DST / f"{t}.parquet").exists():
            continue
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{DST}/{t}.parquet' (FORMAT parquet)"
        )
        print(t, "copied (fixed dim)", flush=True)
    if not (DST / "customer.parquet").exists():
        stride = pow10_stride(con, SRC, "customer", "c_custkey")
        cols = [
            c[0]
            for c in con.sql(
                f"DESCRIBE SELECT * FROM read_parquet('{SRC}/customer.parquet')"
            ).fetchall()
        ]
        exprs = [
            f"k.g * {stride} + {c} AS {c}" if c == "c_custkey" else c
            for c in cols
        ]
        con.execute(
            f"COPY (SELECT {', '.join(exprs)} "
            f"FROM read_parquet('{SRC}/customer.parquet') "
            f"CROSS JOIN range({COPIES}) k(g)) "
            f"TO '{DST}/customer.parquet' (FORMAT parquet)"
        )
        print("customer scaled", flush=True)


def ingest_facts() -> None:
    from pyspark.sql import functions as F

    from sample_iceberg_schema_evolution_pyiceberg_spark.partitioning import (
        compile_partition_spec,
    )
    from sample_iceberg_schema_evolution_pyiceberg_spark.session import get_spark
    from sample_iceberg_schema_evolution_pyiceberg_spark.table_format import (
        LakeCatalog,
    )

    spark = get_spark(app_name="make_sf100_lake")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    o_stride = pow10_stride(con, SRC, "orders", "o_orderkey")
    c_stride = pow10_stride(con, SRC, "customer", "c_custkey")
    cat = LakeCatalog(str(WH))

    # b03's column needs only — a full-width lineitem would double the
    # fixture for columns the measured query prunes anyway
    shifted = {
        "lineitem": lambda df, g: df.select(
            (F.col("l_orderkey") + g * o_stride).alias("l_orderkey"),
            "l_extendedprice",
            "l_discount",
        ),
        "orders": lambda df, g: df.select(
            (F.col("o_orderkey") + g * o_stride).alias("o_orderkey"),
            (F.col("o_custkey") + g * c_stride).alias("o_custkey"),
            "o_orderpriority",
        ),
    }
    for name, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        if cat.table_exists("bench", name):
            print(name, "already ingested", flush=True)
            continue
        src = spark.read.parquet(f"{SRC}/{name}.parquet")
        schema = shifted[name](src, 0).schema
        spec = compile_partition_spec(
            {"partitions": [
                {"column_name": key, "transform": f"bucket[{BUCKETS}]"}
            ]}
        )
        tbl = cat.create_table(
            "bench", name, schema, partition_spec=spec,
            properties={"write.bucket-layout": LAYOUT},
        )
        for g in range(COPIES):
            t0 = time.time()
            tbl.append(shifted[name](src, g))
            print(
                f"{name} copy {g}: {round(time.time() - t0, 1)}s",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    build_dims()
    ingest_facts()
    print("sf100 lake fixture ready", flush=True)
