"""Scale a testdata directory 10x for large-scale bench evidence
(/root/testdata is read-only, so derived scales live under the repo in
a gitignored dir). Composes: sf0.1 -> sf1 -> sf10 by pointing --src at
the previous output.

Replication strategy: 10 key-shifted copies of every fact/dim that
scales with sf (region/nation stay fixed, like TPC-H). Foreign keys are
shifted by the same per-table stride so join fan-out per key matches
sf0.1 exactly — the workload per row is identical, there is just 10x
more of it. Document text gets a per-copy suffix token so near-dup
workloads don't degenerate into 10x exact-duplicate clusters (which
would quadratically inflate pair counts and measure a different
workload, not a bigger one); copy 0 stays byte-identical to sf0.1.

Usage: python tools/make_sf1.py [--src /root/testdata/sf0.1] [--dst benchdata/sf1]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import duckdb

COPIES = 10

# per-table key stride = pow10 ceiling of max key, so shifted keys never
# collide and stay readable (copy k of key x -> k*stride + x)
SCALED = {
    "customer": {"keys": ["c_custkey"], "fks": {}},
    "supplier": {"keys": ["s_suppkey"], "fks": {}},
    "part": {"keys": ["p_partkey"], "fks": {}},
    "orders": {"keys": ["o_orderkey"], "fks": {"o_custkey": "customer"}},
    "lineitem": {
        "keys": [],
        "fks": {
            "l_orderkey": "orders",
            "l_partkey": "part",
            "l_suppkey": "supplier",
        },
    },
    "events": {"keys": ["event_id"], "fks": {"user_id": "customer"}},
    "documents": {"keys": ["doc_id"], "fks": {}},
    "embeddings": {"keys": ["vec_id"], "fks": {}},
}
FIXED = ["region", "nation"]


def pow10_stride(con: duckdb.DuckDBPyConnection, src: str, table: str,
                 key: str) -> int:
    mx = con.sql(
        f"SELECT max({key}) FROM read_parquet('{src}/{table}.parquet')"
    ).fetchone()[0]
    stride = 1
    while stride <= mx:
        stride *= 10
    return stride


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--copies", type=int, default=COPIES,
                    help="replication factor (default 10; e.g. 3 for a sf30 point from sf10)")
    ap.add_argument("--dst", default=str(Path(__file__).parent.parent
                                        / "benchdata" / "sf1"))
    args = ap.parse_args()
    dst = Path(args.dst)
    dst.mkdir(parents=True, exist_ok=True)

    con = duckdb.connect()

    # primary-key stride per scaled table (FKs reuse the target's stride)
    stride = {
        t: pow10_stride(con, args.src, t, spec["keys"][0])
        for t, spec in SCALED.items()
        if spec["keys"]
    }

    for t in FIXED:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{args.src}/{t}.parquet')) "
            f"TO '{dst}/{t}.parquet' (FORMAT parquet)"
        )
        print(t, "copied (fixed dim)")

    for t, spec in SCALED.items():
        cols = [c[0] for c in con.sql(
            f"DESCRIBE SELECT * FROM read_parquet('{args.src}/{t}.parquet')"
        ).fetchall()]
        exprs = []
        for c in cols:
            if c in spec["keys"]:
                exprs.append(f"k.g * {stride[t]} + {c} AS {c}")
            elif c in spec["fks"]:
                exprs.append(f"k.g * {stride[spec['fks'][c]]} + {c} AS {c}")
            elif t == "documents" and c == "text":
                exprs.append(
                    "CASE WHEN k.g = 0 THEN text "
                    "ELSE text || ' rep' || k.g END AS text"
                )
            elif t == "documents" and c == "n_chars":
                exprs.append(
                    "CASE WHEN k.g = 0 THEN n_chars "
                    "ELSE n_chars + length(' rep' || k.g) END AS n_chars"
                )
            else:
                exprs.append(c)
        con.execute(
            f"COPY (SELECT {', '.join(exprs)} "
            f"FROM read_parquet('{args.src}/{t}.parquet') "
            f"CROSS JOIN range({args.copies}) k(g)) "
            f"TO '{dst}/{t}.parquet' (FORMAT parquet)"
        )
        n = con.sql(
            f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')"
        ).fetchone()[0]
        print(t, n, "rows")


if __name__ == "__main__":
    main()
