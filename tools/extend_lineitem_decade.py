"""Extend a benchdata decade with a key-shifted lineitem replication,
written as a CHUNKED parquet directory (one file per copy) so neither
duckdb nor the final artifact needs the whole decade in one buffer.

Same stride scheme as make_sf1: copy g of key x -> g*stride + x, where
stride is the pow10 ceiling of the SOURCE DECADE's max key. l_orderkey
uses the stride of the source decade's orders table when present (so
extend_sf100.py's orders/customer shift lines up exactly and the join
fan-out per key stays identical to the source decade); otherwise — and
for l_partkey/l_suppkey when part/supplier are absent — the stride
falls back to the column's own max (join-irrelevant decades like the
lineitem-only sf300 used for b12).

Usage:
  python tools/extend_lineitem_decade.py --src benchdata/sf10 \
      --dst benchdata/sf100 --copies 10
  python tools/extend_lineitem_decade.py --src benchdata/sf100 \
      --dst benchdata/sf300 --copies 3
"""

from __future__ import annotations

import argparse
from pathlib import Path

import duckdb


def src_glob(src: Path, table: str) -> str:
    p = src / f"{table}.parquet"
    return f"{p}/*.parquet" if p.is_dir() else str(p)


def pow10_of(con: duckdb.DuckDBPyConnection, rel: str, col: str) -> int:
    mx = con.sql(f"SELECT max({col}) FROM read_parquet('{rel}')").fetchone()[0]
    stride = 1
    while stride <= mx:
        stride *= 10
    return stride


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--dst", required=True)
    ap.add_argument("--copies", type=int, required=True)
    args = ap.parse_args()
    src, dst = Path(args.src), Path(args.dst)
    out = dst / "lineitem.parquet"
    out.mkdir(parents=True, exist_ok=True)

    con = duckdb.connect()
    li = src_glob(src, "lineitem")
    fk_anchor = {"l_orderkey": "orders", "l_partkey": "part",
                 "l_suppkey": "supplier"}
    fk_key = {"l_orderkey": "o_orderkey", "l_partkey": "p_partkey",
              "l_suppkey": "s_suppkey"}
    stride = {}
    for fk, anchor in fk_anchor.items():
        anchor_path = src / f"{anchor}.parquet"
        if anchor_path.exists():
            stride[fk] = pow10_of(con, src_glob(src, anchor), fk_key[fk])
        else:
            stride[fk] = pow10_of(con, li, fk)
        print(fk, "stride", stride[fk],
              "(from", anchor if anchor_path.exists() else "lineitem", ")")

    cols = [c[0] for c in con.sql(
        f"DESCRIBE SELECT * FROM read_parquet('{li}')").fetchall()]
    # one output file per (copy, source chunk): footer size stays at the
    # source chunk's scale. A single 13 GB file carries a ~4.5 MB
    # serialized footer that EVERY 2 MB-split scan task re-parses —
    # measured 4x wall on b12 at sf300 before this was split (199 s vs
    # ~50 s). Real lakes never write 13 GB files either; ~1 GB is the
    # conventional target.
    src_chunks = (
        sorted(str(p) for p in (src / "lineitem.parquet").glob("*.parquet"))
        if (src / "lineitem.parquet").is_dir()
        else [str(src / "lineitem.parquet")]
    )
    for g in range(args.copies):
        exprs = [
            f"{g} * {stride[c]} + {c} AS {c}" if c in stride else c
            for c in cols
        ]
        for i, chunk in enumerate(src_chunks):
            con.execute(
                f"COPY (SELECT {', '.join(exprs)} "
                f"FROM read_parquet('{chunk}')) "
                f"TO '{out}/copy{g:02d}_{i:03d}.parquet' (FORMAT parquet)"
            )
        print("copy", g, "written", f"({len(src_chunks)} chunks)")
    n = con.sql(
        f"SELECT count(*) FROM read_parquet('{out}/*.parquet')"
    ).fetchone()[0]
    n_src = con.sql(f"SELECT count(*) FROM read_parquet('{li}')").fetchone()[0]
    assert n == n_src * args.copies, (n, n_src, args.copies)
    print("lineitem", n, "rows OK")


if __name__ == "__main__":
    main()
