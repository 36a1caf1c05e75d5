"""Local emulation of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the
same parquet, compare row count, column names, and an order-insensitive
value comparison.

Usage: python tools/check_correctness.py [--sf DIR] [name ...]
"""

from __future__ import annotations

import argparse
import math
import sys
import time
from decimal import Decimal
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if isinstance(v, Decimal):
        return ("dec", str(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    return v


def compare(spark_rows, duck_rows, cols):
    a = sorted([tuple(canon(v) for v in r) for r in spark_rows], key=repr)
    b = sorted([tuple(canon(v) for v in r) for r in duck_rows], key=repr)
    if a == b:
        return True, None
    for i, (x, y) in enumerate(zip(a, b)):
        if x != y:
            return False, f"first diff at sorted row {i}:\n  spark={x}\n  duck ={y}"
    return False, f"row sets differ in length {len(a)} vs {len(b)}"


def hash_unsafe_types(sdf, con, sql) -> str | None:
    """Detect final output types the driver's value-hasher canonicalizes
    differently per engine (round-1 root cause of 11 hash failures):
    Spark DecimalType on one side, DuckDB DECIMAL/HUGEINT on the other.
    Canonicalize to ROUND(CAST(... AS DOUBLE), 6) / CAST(... AS BIGINT)
    on BOTH sides instead."""
    from pyspark.sql import types as T  # noqa: PLC0415

    bad = [f.name for f in sdf.schema.fields
           if isinstance(f.dataType, T.DecimalType)]
    if bad:
        return f"spark DecimalType output: {bad}"
    if con is not None and sql is not None:
        desc = con.execute(f"DESCRIBE {sql}").fetchall()
        bad = [f"{name}:{ct}" for name, ct, *_ in desc
               if "DECIMAL" in ct.upper() or "HUGEINT" in ct.upper()]
        if bad:
            return f"duckdb DECIMAL/HUGEINT output: {bad}"
    return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--first", type=int, default=None,
                    help="only the first N registry-order queries "
                         "(emulates the driver's bounded window)")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entrymod
    from sample_iceberg_schema_evolution_pyiceberg_spark.session import get_spark

    spark = get_spark(app_name="check_correctness")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    # registry order (the order the driver walks), not alphabetical
    names = args.names or list(qs)
    if args.first:
        names = names[: args.first]
    # coverage self-audit: every registered query must be checkable here;
    # a key in ORACLES without a QUERIES entry (or vice versa misuse)
    # is the silent-coverage-hole class from round 1
    orphan_oracles = set(oracles) - set(qs)
    if orphan_oracles:
        print(f"FAIL  coverage: oracles without queries: {orphan_oracles}")
        return 1

    con = duckdb.connect()
    for tb in TABLES:
        con.execute(
            f"CREATE VIEW {tb} AS SELECT * FROM "
            f"read_parquet('{args.sf}/{tb}.parquet')"
        )

    n_pass = n_fail = n_weak = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf)
            spark_cols = sorted(sdf.columns)
            srows = [
                tuple(r[c] for c in spark_cols) for r in sdf.collect()
            ]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            tw = hash_unsafe_types(sdf, None, None)
            note = f" [TYPEWARN {tw}]" if tw else ""
            print(f"weak  {name}: rows-only ({len(srows)} rows, "
                  f"{time.time()-t0:.1f}s){note}")
            n_weak += 1
            continue
        try:
            res = con.execute(oracles[name])
            duck_cols = sorted(d[0] for d in res.description)
            idx = [
                [d[0] for d in res.description].index(c) for c in duck_cols
            ]
            drows = [tuple(r[i] for i in idx) for r in res.fetchall()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        if spark_cols != duck_cols:
            print(f"FAIL  {name}: cols spark={spark_cols} duck={duck_cols}")
            n_fail += 1
            continue
        if len(srows) != len(drows):
            print(f"FAIL  {name}: rows spark={len(srows)} duck={len(drows)}")
            n_fail += 1
            continue
        tw = hash_unsafe_types(sdf, con, oracles[name])
        if tw:
            print(f"FAIL  {name}: hash-unsafe output type — {tw}")
            n_fail += 1
            continue
        ok, detail = compare(srows, drows, spark_cols)
        if ok:
            print(f"pass  {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
        else:
            print(f"FAIL  {name}: {detail}")
            n_fail += 1
    # coverage audit: when running the full registry, every key must have
    # produced a line above (this loop guarantees it); surface the count
    # so a driver-side bounded window is visible in the logs
    if not args.names and not args.first:
        missing = [k for k in qs if k not in names]
        if missing:
            print(f"FAIL  coverage: registered but unchecked: {missing}")
            return 1
    print(f"\n{n_pass} pass, {n_weak} weak (rows-only), {n_fail} fail "
          f"({len(names)}/{len(qs)} registry keys checked)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
