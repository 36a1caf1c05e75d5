"""One-off: extend benchdata/sf100 (lineitem only, r8) with the
orders/customer/nation/region tables b03 needs, using make_sf1's exact
key-shift scheme from benchdata/sf10 so the keys line up with the
existing sf100 lineitem. Validated after generation by a join-count
identity (see __main__)."""

from __future__ import annotations

from pathlib import Path

import duckdb

from make_sf1 import pow10_stride  # same stride rule, same src

SRC = str(Path(__file__).parent.parent / "benchdata" / "sf10")
DST = Path(__file__).parent.parent / "benchdata" / "sf100"
COPIES = 10


def main() -> None:
    con = duckdb.connect()
    DST.mkdir(parents=True, exist_ok=True)
    for t in ("nation", "region"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{DST}/{t}.parquet' (FORMAT parquet)"
        )
        print(t, "copied (fixed dim)")
    stride = {
        "customer": pow10_stride(con, SRC, "customer", "c_custkey"),
        "orders": pow10_stride(con, SRC, "orders", "o_orderkey"),
    }
    con.execute(
        f"COPY (SELECT k.g * {stride['customer']} + c_custkey AS c_custkey, "
        "c_name, c_nationkey, c_acctbal, c_mktsegment "
        f"FROM read_parquet('{SRC}/customer.parquet') "
        f"CROSS JOIN range({COPIES}) k(g)) "
        f"TO '{DST}/customer.parquet' (FORMAT parquet)"
    )
    print("customer done")
    con.execute(
        f"COPY (SELECT k.g * {stride['orders']} + o_orderkey AS o_orderkey, "
        f"k.g * {stride['customer']} + o_custkey AS o_custkey, "
        "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority "
        f"FROM read_parquet('{SRC}/orders.parquet') "
        f"CROSS JOIN range({COPIES}) k(g)) "
        f"TO '{DST}/orders.parquet' (FORMAT parquet)"
    )
    print("orders done")
    # validation: every sf100 lineitem row must join exactly one order,
    # and the join count must be 10x the sf10 lineitem count
    n_li = con.sql(
        f"SELECT count(*) FROM read_parquet('{DST}/lineitem.parquet/*.parquet')"
    ).fetchone()[0]
    n_join = con.sql(
        f"SELECT count(*) FROM read_parquet('{DST}/lineitem.parquet/*.parquet') l "
        f"JOIN read_parquet('{DST}/orders.parquet') o ON l.l_orderkey = o.o_orderkey"
    ).fetchone()[0]
    n_cjoin = con.sql(
        f"SELECT count(*) FROM read_parquet('{DST}/orders.parquet') o "
        f"JOIN read_parquet('{DST}/customer.parquet') c ON o.o_custkey = c.c_custkey"
    ).fetchone()[0]
    n_orders = con.sql(
        f"SELECT count(*) FROM read_parquet('{DST}/orders.parquet')"
    ).fetchone()[0]
    print("lineitem:", n_li, "join:", n_join, "orders:", n_orders,
          "orders-cust join:", n_cjoin)
    assert n_join == n_li, (n_join, n_li)
    assert n_cjoin == n_orders, (n_cjoin, n_orders)
    print("OK")


if __name__ == "__main__":
    main()
