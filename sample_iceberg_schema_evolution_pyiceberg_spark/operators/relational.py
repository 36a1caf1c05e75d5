"""Tier B relational query surface (SURVEY.md §2, B1-B38): the declared
operators of the engine, each hash-checked against a DuckDB oracle.

All plans are declarative DataFrame API — Catalyst handles pushdown,
pruning, join strategy (broadcast for dims under the threshold, AQE for
skew/coalesce at runtime). No driver-side collect() anywhere; every
query is a single distributed plan that scales by partition count.
"""

from __future__ import annotations

import pandas as pd  # module-level so pandas_udf type hints resolve

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from .registry import ORACLES, QUERIES, query, t  # noqa: F401

DEC = "decimal(18,4)"  # exact money math; see registry docstring


# ---------------------------------------------------------------------------
# Scan / projection / filter (B1, B6, B7)
# ---------------------------------------------------------------------------


@query(
    "b01_scan_projection",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
    WHERE l_orderkey <= 1000
    """,
)
def b01_scan_projection(spark: SparkSession, sf: str) -> DataFrame:
    """Parquet scan + column pruning: ReadSchema in the plan carries only
    the 3 projected columns (verified in tests/test_plans.py)."""
    return (
        t(spark, sf, "lineitem")
        .filter(F.col("l_orderkey") <= 1000)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


@query(
    "b02_filter_predicates",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_size, p_retailprice
    FROM part
    WHERE p_size BETWEEN 10 AND 30
      AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
      AND p_name LIKE '%a%'
      AND (p_retailprice > 500 OR p_size < 15)
      AND NOT (p_size = 22)
      AND p_type IS NOT NULL
    """,
)
def b02_filter_predicates(spark: SparkSession, sf: str) -> DataFrame:
    """=, BETWEEN, IN, LIKE, AND/OR/NOT, IS NOT NULL — all pushed to the
    parquet scan (PushedFilters, see tests/test_plans.py)."""
    p = t(spark, sf, "part")
    return p.filter(
        F.col("p_size").between(10, 30)
        & F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
        & F.col("p_name").like("%a%")
        & ((F.col("p_retailprice") > 500) | (F.col("p_size") < 15))
        & ~(F.col("p_size") == 22)
        & F.col("p_type").isNotNull()
    ).select("p_partkey", "p_name", "p_brand", "p_size", "p_retailprice")


# ---------------------------------------------------------------------------
# Joins (B8-B13)
# ---------------------------------------------------------------------------


@query(
    "b03_join_inner_3way",
    memo_plan=True,  # pure constructor: prepared-plan memo (r16)
    oracle="""
    SELECT n.n_name,
           ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE), 6)
             AS revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def b03_join_inner_3way(spark: SparkSession, sf: str) -> DataFrame:
    """Fact-to-dim star join. The fact-fact arm (lineitem⋈orders on
    orderkey) reads both facts from a bucketed-by-orderkey storage
    layout (sources.bucketed_table), so the join needs NO exchange on
    either side at any scale — the Iceberg bucket[N]-transform layout a
    100 TB deployment would write at ingest. customer/nation are
    broadcast by Catalyst (small side under the
    autoBroadcastJoinThreshold) so the big fact never reshuffles for
    them either."""
    from ..sources import bucketed_table  # noqa: PLC0415

    l = bucketed_table(spark, sf, "lineitem", "l_orderkey")
    o = bucketed_table(spark, sf, "orders", "o_orderkey")
    c, n = t(spark, sf, "customer"), t(spark, sf, "nation")
    # money math in fixed-point longs through the join + partial agg
    # (the b12 pattern, relational.py:319): quantize once to e4 units
    # on the scan projection, multiply/sum as pure long codegen with
    # the hi/lo split at 1e9 (safe past sf1000), recombine to exact
    # decimals only in the |nations|-row final projection. Bit-
    # identical to the decimal(18,4) formulation (A/B-verified at
    # sf0.1) — no BigDecimal ever rides the fact-sized agg buffers.
    l = l.selectExpr(
        "l_orderkey",
        "cast(round(l_extendedprice * 10000) as bigint)"
        " * (10000 - cast(round(l_discount * 10000) as bigint))"
        " as dp_e8",  # <= 1e14/row: long-exact
    )
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
            # hi*1e9/1e8 = hi*10 long-exact; lo/1e8 -> scale 10, exact
            "round(cast(cast(dhi * 10 as decimal(20,0))"
            " + cast(dlo as decimal(19,0)) / 100000000 as double), 6)"
            " as revenue",
            "n_lineitems",
        )
    )


@query(
    "b04_join_left_outer",
    oracle="""
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
)
def b04_join_left_outer(spark: SparkSession, sf: str) -> DataFrame:
    c, o = t(spark, sf, "customer"), t(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "b05_join_right_outer",
    oracle="""
    SELECT o.o_orderkey, c.c_name
    FROM customer c
    RIGHT JOIN orders o ON c.c_custkey = o.o_custkey
    WHERE o.o_orderkey <= 2000
    """,
)
def b05_join_right_outer(spark: SparkSession, sf: str) -> DataFrame:
    c, o = t(spark, sf, "customer"), t(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "right")
        .filter(F.col("o_orderkey") <= 2000)
        .select("o_orderkey", "c_name")
    )


@query(
    "b06_join_full_outer",
    oracle="""
    WITH cc AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust
                FROM customer GROUP BY c_nationkey),
         ss AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp
                FROM supplier GROUP BY s_nationkey)
    SELECT COALESCE(cc.nk, ss.nk) AS nationkey,
           COALESCE(cc.n_cust, 0) AS n_cust,
           COALESCE(ss.n_supp, 0) AS n_supp
    FROM cc FULL OUTER JOIN ss ON cc.nk = ss.nk
    """,
)
def b06_join_full_outer(spark: SparkSession, sf: str) -> DataFrame:
    cc = (
        t(spark, sf, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    ss = (
        t(spark, sf, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk2"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return cc.join(ss, cc.nk == ss.nk2, "full").select(
        F.coalesce("nk", "nk2").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@query(
    "b07_join_left_semi",
    oracle="""
    SELECT c.c_mktsegment, COUNT(*) AS n_customers_with_orders
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c.c_mktsegment
    """,
)
def b07_join_left_semi(spark: SparkSession, sf: str) -> DataFrame:
    c, o = t(spark, sf, "customer"), t(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers_with_orders"))
    )


@query(
    "b08_join_left_anti",
    oracle="""
    SELECT c.c_nationkey, COUNT(*) AS n_customers_no_orders
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c.c_nationkey
    """,
)
def b08_join_left_anti(spark: SparkSession, sf: str) -> DataFrame:
    c, o = t(spark, sf, "customer"), t(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers_no_orders"))
    )


@query(
    "b09_join_cross",
    oracle="""
    SELECT a.r_name AS r1, b.r_name AS r2
    FROM region a CROSS JOIN region b
    """,
)
def b09_join_cross(spark: SparkSession, sf: str) -> DataFrame:
    """Cross join of tiny dims only (25 rows) — never a fact table."""
    a = t(spark, sf, "region").select(F.col("r_name").alias("r1"))
    b = t(spark, sf, "region").select(F.col("r_name").alias("r2"))
    return a.crossJoin(b)


@query(
    "b10_join_broadcast_hint",
    oracle="""
    SELECT p.p_brand,
           ROUND(CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE), 6)
             AS sum_qty
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size <= 15
    GROUP BY p.p_brand
    """,
)
def b10_join_broadcast_hint(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit broadcast() of the filtered dim: the fact table streams
    map-side with zero shuffle for the join (only the final small agg
    shuffles). At 100 TB this is the difference between minutes and
    hours — tests assert BroadcastHashJoin in the plan."""
    l = t(spark, sf, "lineitem")
    p = t(spark, sf, "part").filter(F.col("p_size") <= 15)
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(F.round(F.sum(F.col("l_quantity").cast(DEC)).cast("double"), 6).alias("sum_qty"))
    )


@query(
    "b11_join_range",
    oracle="""
    SELECT b.label, COUNT(*) AS n_parts,
           ROUND(CAST(SUM(CAST(p.p_retailprice AS DECIMAL(18,4))) AS DOUBLE), 6)
             AS sum_price
    FROM part p
    JOIN (VALUES (1, 10, 'small'), (11, 25, 'medium'), (26, 50, 'large'))
         AS b(lo, hi, label)
      ON p.p_size BETWEEN b.lo AND b.hi
    GROUP BY b.label
    """,
)
def b11_join_range(spark: SparkSession, sf: str) -> DataFrame:
    """Theta/range join against a tiny literal bucket table — executes
    as BroadcastNestedLoopJoin (small side broadcast, the only sane
    physical strategy for non-equi conditions)."""
    p = t(spark, sf, "part")
    buckets = spark.createDataFrame(
        [(1, 10, "small"), (11, 25, "medium"), (26, 50, "large")],
        "lo INT, hi INT, label STRING",
    )
    return (
        p.join(
            F.broadcast(buckets),
            (p.p_size >= buckets.lo) & (p.p_size <= buckets.hi),
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(
                F.sum(F.col("p_retailprice").cast(DEC)).cast("double"), 6
            ).alias("sum_price"),
        )
    )


# ---------------------------------------------------------------------------
# Aggregation (B14-B18)
# ---------------------------------------------------------------------------


@query(
    "b12_agg_pricing_summary",
    memo_plan=True,  # pure constructor: prepared-plan memo (r16)
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 6) AS sum_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 6) AS sum_base_price,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 6) AS sum_disc_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def b12_agg_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary (the engine's flagship query).
    Partial aggregation is map-side (HashAggregate x2 around one
    exchange of only |groups| rows) — scale-invariant.

    Money math runs in FIXED-POINT LONGS through the hot path (the r8
    answer to the four-decade b12 'BigDecimal partial aggregation'
    floor, SCALE.md): each value quantizes once to e4 units (exactly
    the oracle's own CAST(double AS DECIMAL(18,4)) quantum — for a
    double that is the nearest-double of a <=4-decimal money value,
    round(x*10000) and BigDecimal-valueOf-setScale(4) both recover the
    same integer, since x*10000 lands within ~1e-6 of it), products
    and sums are pure long codegen, and ONLY the final |groups|-row
    projection recombines to exact decimals before the rounded-double
    output. Sums that could exceed long range by sf300 (base price
    e4 x 1.8e9 rows ~ 2e19) accumulate as hi/lo pairs split at 1e9
    (lo-sum bound 1e9 x rows, hi-sum bound 1e5 x rows — both safe past
    sf1000) and recombine in decimal space where the division scale
    rules are provably exact (divisor precision + 1 < scale headroom,
    no 38-precision cap anywhere). Values are bit-identical to the
    decimal(18,4) formulation this replaces (A/B-verified at sf0.1/1/
    10); sf10 wall 4.99 s -> 2.27 s."""
    l = t(spark, sf, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2000-09-01 00:00:00").cast("timestamp_ntz"))
        .selectExpr(
            "l_returnflag", "l_linestatus",
            "cast(round(l_quantity * 10000) as bigint) as qty_e4",
            "cast(round(l_extendedprice * 10000) as bigint) as ext_e4",
            "10000 - cast(round(l_discount * 10000) as bigint) as f_e4",
        )
        .selectExpr(
            "l_returnflag", "l_linestatus", "qty_e4", "ext_e4",
            "ext_e4 * f_e4 as dp_e8",  # <= 1e14/row: long-exact
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.expr("sum(qty_e4)").alias("q"),
            F.expr("sum(ext_e4 div 1000000000)").alias("bhi"),
            F.expr("sum(ext_e4 % 1000000000)").alias("blo"),
            F.expr("sum(dp_e8 div 1000000000)").alias("dhi"),
            F.expr("sum(dp_e8 % 1000000000)").alias("dlo"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .selectExpr(
            "l_returnflag", "l_linestatus",
            # decimal(20,0)/1e4 -> scale 6, precision 26: exact, uncapped
            "round(cast(cast(q as decimal(20,0)) / 10000 as double), 6)"
            " as sum_qty",
            # hi*1e9/1e4 = hi*1e5 stays long-exact; lo/1e4 exact decimal
            "round(cast(cast(bhi * 100000 as decimal(20,0))"
            " + cast(blo as decimal(19,0)) / 10000 as double), 6)"
            " as sum_base_price",
            # hi*1e9/1e8 = hi*10 long-exact; lo/1e8 -> scale 10, exact
            "round(cast(cast(dhi * 10 as decimal(20,0))"
            " + cast(dlo as decimal(19,0)) / 100000000 as double), 6)"
            " as sum_disc_price",
            "count_order",
        )
    )


@query(
    "b13_agg_count_distinct",
    memo_plan=True,  # pure constructor: prepared-plan memo (r16)
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS n_suppliers,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def b13_agg_count_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-distinct via ONE scan: ``stack`` each row into narrow
    ``(flag, kind, key)`` pairs (kind = supplier|part), then a single
    hash aggregate on that triple — map-side partial combine means only
    distinct triples cross the wire (|keys| rows, not 3x|fact| like the
    Expand plan Catalyst emits for multi-countDistinct). A second tiny
    aggregate folds the distinct stream into per-flag counts; ``n_rows``
    rides along as sum of the supplier-kind duplicate counts, so no
    separate count(*) scan. One fact-sized shuffle total (the r2 shape
    paid three scans + three shuffles; VERDICT r2 flagged the 0.87 s
    regression)."""
    l = t(spark, sf, "lineitem")
    ex = l.select(
        "l_returnflag",
        F.expr(
            "stack(2, 's', cast(l_suppkey as bigint),"
            "         'p', cast(l_partkey as bigint)) as (kind, key)"
        ),
    )
    per_key = ex.groupBy("l_returnflag", "kind", "key").agg(
        F.count(F.lit(1)).alias("dup_cnt")
    )
    # fold the distinct (flag, kind, key) stream straight to per-flag
    # counts: each surviving row IS one distinct key, so conditional
    # sums deliver both distinct counts and (via the supplier-kind
    # duplicate counts) the row total in ONE more aggregate — two
    # exchanges end to end, not three (the (flag, kind) intermediate
    # added an exchange + an AQE stage for no reduction: its input is
    # already |keys|-sized)
    return (
        per_key.groupBy("l_returnflag")
        .agg(
            F.sum(F.when(F.col("kind") == "s", 1)).alias("n_suppliers"),
            F.sum(F.when(F.col("kind") == "p", 1)).alias("n_parts"),
            F.sum(
                F.when(F.col("kind") == "s", F.col("dup_cnt"))
            ).alias("n_rows"),
        )
        .select("l_returnflag", "n_suppliers", "n_parts", "n_rows")
    )


@query(
    "b14_agg_rollup",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n, GROUPING(o_orderstatus) + GROUPING(o_orderpriority) AS lvl
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def b14_agg_rollup(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.grouping("o_orderstatus") + F.grouping("o_orderpriority")).alias("lvl"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "lvl",
        )
    )


@query(
    "b15_agg_cube",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS rf,
           COALESCE(l_linestatus, 'ALL') AS ls,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def b15_agg_cube(spark: SparkSession, sf: str) -> DataFrame:
    l = t(spark, sf, "lineitem")
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "n",
        )
    )


@query(
    "b16_agg_having",
    memo_plan=True,  # pure constructor: prepared-plan memo (r16)
    oracle="""
    SELECT o_custkey,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 6)
             AS total_spent,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 3
    """,
)
def b16_agg_having(spark: SparkSession, sf: str) -> DataFrame:
    """HAVING over a per-customer money sum. Same fixed-point long
    pattern as b12 (see its docstring for the quantization-equivalence
    and hi/lo overflow argument; here the per-group bound scales with
    orders-per-customer, not table size — the split is pure insurance):
    sf1 0.66 -> 0.54 s measured, values bit-identical."""
    o = t(spark, sf, "orders")
    return (
        o.selectExpr(
            "o_custkey",
            "cast(round(o_totalprice * 10000) as bigint) as tp_e4",
        )
        .groupBy("o_custkey")
        .agg(
            F.expr("sum(tp_e4 div 1000000000)").alias("hi"),
            F.expr("sum(tp_e4 % 1000000000)").alias("lo"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .filter(F.col("n_orders") >= 3)
        .selectExpr(
            "o_custkey",
            "round(cast(cast(hi * 100000 as decimal(20,0))"
            " + cast(lo as decimal(19,0)) / 10000 as double), 6)"
            " as total_spent",
            "n_orders",
        )
    )


@query(
    "b17_agg_minmax_stats",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n,
           MIN(c_acctbal) AS min_bal,
           MAX(c_acctbal) AS max_bal,
           ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def b17_agg_minmax_stats(spark: SparkSession, sf: str) -> DataFrame:
    """avg emitted as one double division over an exact decimal sum —
    identical bit pattern on both engines regardless of row order."""
    c = t(spark, sf, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("c_acctbal").alias("min_bal"),
        F.max("c_acctbal").alias("max_bal"),
        F.round(
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_bal"),
    )


# ---------------------------------------------------------------------------
# Windows (B19-B21)
# ---------------------------------------------------------------------------


@query(
    "b18_window_ranking",
    memo_plan=True,  # pure constructor: prepared-plan memo (r16)
    oracle="""
    SELECT * FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             ROW_NUMBER() OVER w AS rn,
             RANK() OVER w AS rnk,
             DENSE_RANK() OVER w AS drnk,
             NTILE(4) OVER w AS quartile
      FROM customer
      WINDOW w AS (PARTITION BY c_mktsegment
                   ORDER BY c_acctbal DESC, c_custkey)
    ) WHERE rn <= 5
    """,
)
def b18_window_ranking(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .filter(F.col("rn") <= 5)
    )


@query(
    "b19_window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(o_orderdate AS DATE) AS od,
           LAG(o_orderkey) OVER w AS prev_order,
           LEAD(o_orderkey) OVER w AS next_order,
           DATE_DIFF('day', LAG(o_orderdate) OVER w, o_orderdate)
             AS days_since_prev
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def b19_window_lag_lead(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("od"),
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate").cast("date")).over(w),
        ).cast("bigint").alias("days_since_prev"),
    )


@query(
    "b20_window_running_frame",
    memo_plan=True,  # pure constructor: prepared-plan memo (r16)
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE), 6) AS running_total
    FROM orders
    """,
)
def b20_window_running_frame(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double"), 6
        ).alias("running_total"),
    )


# ---------------------------------------------------------------------------
# Sort / limit / top-k (B22, B23)
# ---------------------------------------------------------------------------


@query(
    "b21_topk",
    memo_plan=True,  # pure constructor: prepared-plan memo (r16)
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 100
    """,
)
def b21_topk(spark: SparkSession, sf: str) -> DataFrame:
    """orderBy+limit compiles to TakeOrderedAndProject — per-partition
    top-k then a k-row merge on the driver; never a full global sort.
    Additionally zone-map pruned: a provably-safe threshold from
    parquet row-group statistics (sources.topk_prune_threshold — the
    k-th largest row-group max retains every top-k row) is pushed into
    the scan, so row groups that cannot contain a top-k row are
    skipped wholesale. This is the ahead-of-time form of the dynamic
    zone-map top-k vectorized engines run; without it the top-k scan
    reads the full table while the single-node baseline reads ~k row
    groups (measured 6x at sf300)."""
    from ..sources import topk_prune_threshold  # noqa: PLC0415

    l = t(spark, sf, "lineitem")
    thr = topk_prune_threshold(sf, "lineitem", "l_extendedprice", 100)
    if thr is not None:
        # >= : ties at the bound stay in (the proof needs the closed
        # bound); pushed to the parquet scan (PushedFilters)
        l = l.filter(F.col("l_extendedprice") >= F.lit(thr))
    return (
        l.orderBy(
            F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
        )
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .limit(100)
    )


@query(
    "b22_sort_nulls",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
    FROM customer
    ORDER BY bal ASC NULLS FIRST, c_custkey
    LIMIT 200
    """,
)
def b22_sort_nulls(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer")
    bal = F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(
        F.col("c_acctbal")
    )
    return (
        c.select("c_custkey", bal.alias("bal"))
        .orderBy(F.col("bal").asc_nulls_first(), "c_custkey")
        .limit(200)
    )


# ---------------------------------------------------------------------------
# Set operations (B24)
# ---------------------------------------------------------------------------


@query(
    "b23_union_all",
    oracle="""
    SELECT kind, key, name FROM (
      SELECT 'C' AS kind, c_custkey AS key, c_name AS name FROM customer
      UNION ALL
      SELECT 'S' AS kind, s_suppkey AS key, s_name AS name FROM supplier
    ) WHERE key <= 500
    """,
)
def b23_union_all(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer").select(
        F.lit("C").alias("kind"),
        F.col("c_custkey").alias("key"),
        F.col("c_name").alias("name"),
    )
    s = t(spark, sf, "supplier").select(
        F.lit("S").alias("kind"),
        F.col("s_suppkey").alias("key"),
        F.col("s_name").alias("name"),
    )
    return c.unionAll(s).filter(F.col("key") <= 500)


@query(
    "b24_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
)
def b24_union_distinct(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@query(
    "b25_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def b25_intersect(spark: SparkSession, sf: str) -> DataFrame:
    c = (
        t(spark, sf, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    s = t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "b26_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier WHERE s_acctbal > 0
    """,
)
def b26_except(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = (
        t(spark, sf, "supplier")
        .filter(F.col("s_acctbal") > 0)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return c.subtract(s)  # EXCEPT (set semantics); exceptAll = EXCEPT ALL


# ---------------------------------------------------------------------------
# Scalar functions (B25-B33)
# ---------------------------------------------------------------------------


@query(
    "b27_string_funcs",
    oracle="""
    SELECT p_partkey,
           UPPER(p_brand) AS brand_up,
           LOWER(p_type) AS type_lo,
           LENGTH(p_name) AS name_len,
           SUBSTRING(p_name, 1, 5) AS name_pfx,
           CONCAT(p_brand, ':', p_type) AS brand_type,
           TRIM(p_name) AS name_trim,
           LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
           STR_SPLIT(p_name, ' ')[1] AS first_word,
           REGEXP_EXTRACT(p_brand, '([0-9]+)', 1) AS brand_num
    FROM part WHERE p_partkey <= 1000
    """,
)
def b27_string_funcs(spark: SparkSession, sf: str) -> DataFrame:
    p = t(spark, sf, "part").filter(F.col("p_partkey") <= 1000)
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_up"),
        F.lower("p_type").alias("type_lo"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_pfx"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.trim(F.col("p_name")).alias("name_trim"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.split("p_name", " ").getItem(0).alias("first_word"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
    )


@query(
    "b28_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INT) AS yr,
           CAST(MONTH(o_orderdate) AS INT) AS mo,
           CAST(DAY(o_orderdate) AS INT) AS dom,
           CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
           CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS due,
           STRFTIME(o_orderdate, '%Y-%m') AS ym
    FROM orders WHERE o_orderkey <= 2000
    """,
)
def b28_date_funcs(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders").filter(F.col("o_orderkey") <= 2000)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30)
        .cast("timestamp_ntz")
        .alias("due"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    )


@query(
    "b29_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ABS(l_discount - 0.05) AS d1,
           ROUND(l_extendedprice, 1) AS p_round,
           CAST(FLOOR(l_quantity) AS BIGINT) AS q_floor,
           CAST(CEIL(l_quantity) AS BIGINT) AS q_ceil,
           ((l_orderkey % 7) + 7) % 7 AS m7,
           SQRT(l_quantity) AS q_sqrt,
           ROUND(LN(l_extendedprice), 9) AS p_ln,
           POW(l_tax + 1, 2) AS tax_sq
    FROM lineitem WHERE l_orderkey <= 500
    """,
)
def b29_math_funcs(spark: SparkSession, sf: str) -> DataFrame:
    l = t(spark, sf, "lineitem").filter(F.col("l_orderkey") <= 500)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("d1"),
        F.round("l_extendedprice", 1).alias("p_round"),
        F.floor("l_quantity").alias("q_floor"),
        F.ceil("l_quantity").alias("q_ceil"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).alias("m7"),
        F.sqrt("l_quantity").alias("q_sqrt"),
        # ln differs in the last ulp between JVM and libm: round to 9
        F.round(F.log(F.col("l_extendedprice")), 9).alias("p_ln"),
        F.pow(F.col("l_tax") + 1, 2).alias("tax_sq"),
    )


@query(
    "b30_conditional_null",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal > 5000 THEN 'high'
                WHEN c_acctbal > 0 THEN 'mid'
                ELSE 'low' END AS tier,
           COALESCE(NULLIF(c_mktsegment, 'UNKNOWN'), 'n/a') AS seg,
           CASE WHEN ISNAN(c_acctbal) THEN 1 ELSE 0 END AS bad
    FROM customer
    """,
)
def b30_conditional_null(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") > 5000, "high")
        .when(F.col("c_acctbal") > 0, "mid")
        .otherwise("low")
        .alias("tier"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("UNKNOWN")), F.lit("n/a")).alias(
            "seg"
        ),
        F.when(F.isnan("c_acctbal"), 1).otherwise(0).alias("bad"),
    )


@query(
    "b31_array_funcs",
    oracle="""
    SELECT l_orderkey,
           LEN(LIST(l_linenumber ORDER BY l_linenumber)) AS n_items,
           LIST(l_linenumber ORDER BY l_linenumber)[1] AS first_ln,
           CAST(LIST_AGGREGATE(RANGE(1, CAST(MAX(l_linenumber) AS BIGINT) + 1),
                               'sum') AS BIGINT) AS tri_sum,
           CAST(LIST_CONTAINS(LIST(l_linenumber), 1) AS INT) AS has_first
    FROM lineitem
    WHERE l_orderkey <= 2000
    GROUP BY l_orderkey
    """,
)
def b31_array_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """Array construction (collect_list+sort_array), element access,
    higher-order aggregate() over sequence(), array_contains — all
    JVM-side Catalyst expressions."""
    l = t(spark, sf, "lineitem").filter(F.col("l_orderkey") <= 2000)
    arr = F.sort_array(F.collect_list("l_linenumber"))
    return l.groupBy("l_orderkey").agg(
        F.size(arr).alias("n_items"),
        F.element_at(arr, 1).alias("first_ln"),
        F.aggregate(
            F.sequence(F.lit(1).cast("bigint"), F.max("l_linenumber").cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("tri_sum"),
        F.array_contains(F.collect_list("l_linenumber"), 1)
        .cast("int")
        .alias("has_first"),
    )


@query(
    "b32_map_struct_funcs",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus AS status_from_map,
           o_orderpriority AS prio_from_struct,
           CONCAT(o_orderstatus, '/', o_orderpriority) AS packed
    FROM orders WHERE o_orderkey <= 2000
    """,
)
def b32_map_struct_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """Round-trips values through MAP and STRUCT constructors +
    element_at/getField/withField — the oracle sees the identity."""
    o = t(spark, sf, "orders").filter(F.col("o_orderkey") <= 2000)
    m = F.create_map(F.lit("status"), F.col("o_orderstatus"))
    s = F.struct(
        F.col("o_orderstatus").alias("st"), F.col("o_orderpriority").alias("pr")
    ).withField("extra", F.lit("x"))
    return o.select(
        "o_orderkey",
        F.element_at(m, "status").alias("status_from_map"),
        s.getField("pr").alias("prio_from_struct"),
        F.concat_ws("/", s.getField("st"), s.dropFields("extra").getField("pr")).alias(
            "packed"
        ),
    )


@query(
    "b33_json_funcs",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           MIN(CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def b33_json_funcs(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


@query(
    "b34_from_json_schema",
    oracle="""
    SELECT event_id, CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k
    FROM events WHERE event_id <= 2000
    """,
)
def b34_from_json_schema(spark: SparkSession, sf: str) -> DataFrame:
    """from_json with an explicit schema (B32's typed-parse variant)."""
    e = t(spark, sf, "events").filter(F.col("event_id") <= 2000)
    parsed = F.from_json("props", T.StructType([T.StructField("k", T.LongType())]))
    return e.select("event_id", parsed.getField("k").alias("k"))


@query(
    "b35_cast_promotion",
    oracle="""
    SELECT l_orderkey,
           CAST(l_linenumber AS BIGINT) AS ln_long,
           CAST(CAST(l_quantity AS REAL) AS DOUBLE) AS qty_dbl,
           CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DOUBLE) AS price_dec,
           CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DECIMAL(18,2))
                AS DOUBLE) AS price_wide,
           CAST(l_shipdate AS DATE) AS ship_day
    FROM lineitem WHERE l_orderkey <= 500
    """,
)
def b35_cast_promotion(spark: SparkSession, sf: str) -> DataFrame:
    """The legal promotions of the evolution engine (int->long,
    float->double, decimal widening) as expressions — A14 mirrored in
    the query layer."""
    l = t(spark, sf, "lineitem").filter(F.col("l_orderkey") <= 500)
    return l.select(
        "l_orderkey",
        F.col("l_linenumber").cast("bigint").alias("ln_long"),
        F.col("l_quantity").cast("float").cast("double").alias("qty_dbl"),
        F.col("l_extendedprice")
        .cast("decimal(12,2)")
        .cast("double")
        .alias("price_dec"),
        F.col("l_extendedprice")
        .cast("decimal(12,2)")
        .cast("decimal(18,2)")
        .cast("double")
        .alias("price_wide"),
        F.col("l_shipdate").cast("date").alias("ship_day"),
    )


# ---------------------------------------------------------------------------
# Dedup / sampling (B34, B35)
# ---------------------------------------------------------------------------


@query(
    "b36_dedup_keep_first",
    memo_plan=True,  # pure constructor: prepared-plan memo (r16)
    oracle="""
    SELECT user_id, event_type, event_id AS first_event
    FROM (
      SELECT user_id, event_type, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def b36_dedup_keep_first(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic dedup: keep the min-event_id row per key.
    (dropDuplicates picks an arbitrary row — this is the reproducible
    form, and the same shape C1 uses at scale.)"""
    e = t(spark, sf, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("event_id")
    return (
        e.select(
            "user_id", "event_type", "event_id", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", F.col("event_id").alias("first_event"))
    )


@query("b37_sample")  # engine-specific RNG -> rows-only check (SURVEY B35)
def b37_sample(spark: SparkSession, sf: str) -> DataFrame:
    l = t(spark, sf, "lineitem")
    return l.sample(fraction=0.1, seed=42).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@query(
    "b37b_deterministic_sample",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE (('0x' || substr(md5(l_orderkey || '-' || l_linenumber), 1, 15))
           ::BIGINT) % 10 = 0
    """,
)
def b37b_deterministic_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Hash-bucket sampling (SURVEY B35's scale face): rows where a
    deterministic key hash lands in bucket 0 of 10 — a ~10% sample
    that is REPRODUCIBLE across runs, engines, partitionings, and
    cluster sizes, unlike ``df.sample`` whose per-partition RNG
    stream changes under repartitioning. This is how a training
    pipeline pins an eval split at 100 TB: the sample membership is a
    pure function of the key, so incremental reruns agree with the
    original draw. Pure Catalyst (md5 + conv), hash-gated via the
    md5_hash60 DuckDB twin."""
    from ..functions import md5_hash60  # noqa: PLC0415

    l = t(spark, sf, "lineitem")
    key = F.concat_ws("-", "l_orderkey", "l_linenumber")
    return l.filter(md5_hash60(key) % 10 == 0).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@query("b38_approx_count_distinct")  # approximate by design (SURVEY B16)
def b38_approx_count_distinct(spark: SparkSession, sf: str) -> DataFrame:
    l = t(spark, sf, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )


@query("b60_approx_percentile")  # approximate by design (sketch class)
def b60_approx_percentile(spark: SparkSession, sf: str) -> DataFrame:
    """approx_percentile: the bounded-memory quantile sketch that
    replaces exact percentiles (b53) at 100 TB — mergeable partials,
    accuracy set by the last arg (10000). Emitted alongside the exact
    values so the bench/test can assert the error bound; rows-only for
    the driver gate (approximate by design)."""
    l = t(spark, sf, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(10000)).alias(
            "approx_p50"
        ),
        F.percentile("l_extendedprice", F.lit(0.5)).alias("exact_p50"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# UDF surfaces (B36-B38)
# ---------------------------------------------------------------------------


@query(
    "b39_python_udf",
    oracle="""
    SELECT p_partkey, REVERSE(p_name) AS name_rev,
           LENGTH(p_name) AS name_len
    FROM part WHERE p_partkey <= 500
    """,
)
def b39_python_udf(spark: SparkSession, sf: str) -> DataFrame:
    """Row-at-a-time Python UDF — declared for surface coverage; the
    engine's guidance is to prefer built-ins/pandas_udf (B37) in hot
    paths. Kept to a 500-row slice for exactly that reason."""
    p = t(spark, sf, "part").filter(F.col("p_partkey") <= 500)
    rev = F.udf(lambda s: s[::-1] if s is not None else None, T.StringType())
    return p.select(
        "p_partkey",
        rev("p_name").alias("name_rev"),
        F.length("p_name").cast("bigint").alias("name_len"),
    )


@query(
    "b40_pandas_udf",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS disc_price
    FROM lineitem WHERE l_orderkey <= 500
    """,
)
def b40_pandas_udf(spark: SparkSession, sf: str) -> DataFrame:
    """Vectorized (Arrow) scalar pandas_udf: elementwise IEEE double ops
    — bit-identical to the oracle's C implementation."""
    from pyspark.sql.functions import pandas_udf  # noqa: PLC0415

    # postponed annotations (PEP 563) break pandas_udf hint inspection;
    # build the hints eagerly
    def _disc_price(price, disc):
        return price * (1 - disc)

    _disc_price.__annotations__ = {
        "price": pd.Series, "disc": pd.Series, "return": pd.Series
    }
    disc_price = pandas_udf(_disc_price, "double")

    l = t(spark, sf, "lineitem").filter(F.col("l_orderkey") <= 500)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        disc_price("l_extendedprice", "l_discount").alias("disc_price"),
    )


@query(
    "b41_grouped_agg_pandas_udf",
    oracle="""
    SELECT l_returnflag,
           SUM(l_quantity) AS total_qty
    FROM lineitem WHERE l_orderkey <= 5000
    GROUP BY l_returnflag
    """,
)
def b41_grouped_agg_pandas_udf(spark: SparkSession, sf: str) -> DataFrame:
    """UDAF surface: grouped-agg pandas_udf. pandas .sum() uses pairwise
    summation — restricted to a small slice where double addition is
    exact regardless of order (quantities are small integers-as-doubles)."""
    from pyspark.sql.functions import pandas_udf  # noqa: PLC0415

    def _total(qty):
        return float(qty.sum())

    _total.__annotations__ = {"qty": pd.Series, "return": float}
    total = pandas_udf(_total, "double")

    l = t(spark, sf, "lineitem").filter(F.col("l_orderkey") <= 5000)
    return l.groupBy("l_returnflag").agg(total("l_quantity").alias("total_qty"))


@query(
    "b50_python_udtf",
    oracle="""
    SELECT p_partkey, word, pos
    FROM (SELECT p_partkey, p_name FROM part WHERE p_partkey <= 200) p,
         LATERAL (SELECT UNNEST(STR_SPLIT(p.p_name, ' ')) AS word,
                         UNNEST(RANGE(1, LEN(STR_SPLIT(p.p_name, ' ')) + 1))
                           AS pos)
    """,
)
def b50_python_udtf(spark: SparkSession, sf: str) -> DataFrame:
    """Real Python UDTF (Spark 3.5+ @udtf): tokenize with positions —
    one input row expands to N output rows through the UDTF protocol
    (lateral join). Kept to a 200-row slice: UDTFs are row-at-a-time
    Python, the explode() form (b42) is the hot-path equivalent."""
    from pyspark.sql.functions import lit, udtf  # noqa: PLC0415

    @udtf(returnType="word: string, pos: int")
    class Tokenize:
        def eval(self, partkey: int, name: str):  # noqa: ANN001
            for i, w in enumerate(name.split(" "), start=1):
                yield w, i

    spark.udtf.register("gate_tokenize", Tokenize)
    p = _view_of(
        t(spark, sf, "part").filter(F.col("p_partkey") <= 200), "udtf_part"
    )
    return spark.sql(
        f"""SELECT p.p_partkey, t.word, t.pos
            FROM {p} p, LATERAL gate_tokenize(p.p_partkey, p.p_name) t"""
    )


def _view_of(df: DataFrame, prefix: str) -> str:
    import uuid  # noqa: PLC0415

    name = f"{prefix}_{uuid.uuid4().hex[:8]}"
    df.createOrReplaceTempView(name)
    return name


@query(
    "b51_window_first_last",
    oracle="""
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_order,
           LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_order,
           CAST(FIRST_VALUE(o_totalprice) OVER w AS DOUBLE) AS first_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def b51_window_first_last(spark: SparkSession, sf: str) -> DataFrame:
    """Window analytics first/last (SURVEY B20): customer's first and
    last order over a deterministic (date, key) order; last_value needs
    the full-partition frame on both engines."""
    o = t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(wfull).alias("last_order"),
        F.first("o_totalprice").over(w).cast("double").alias("first_price"),
    )


@query(
    "b52_grouping_sets",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS rflag,
           COALESCE(l_linestatus, 'ALL') AS lstatus,
           COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 6)
             AS sum_qty,
           GROUPING(l_returnflag) + GROUPING(l_linestatus) AS lvl
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                            (l_returnflag), ())
    """,
)
def b52_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit GROUPING SETS (SURVEY B17; rollup/cube are b14/b15) —
    SQL surface; one shuffle produces all three grouping levels."""
    lv = _view_of(t(spark, sf, "lineitem"), "gsets_lineitem")
    return spark.sql(
        f"""
        SELECT COALESCE(l_returnflag, 'ALL') AS rflag,
               COALESCE(l_linestatus, 'ALL') AS lstatus,
               COUNT(*) AS n,
               ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 6)
                 AS sum_qty,
               GROUPING(l_returnflag) + GROUPING(l_linestatus) AS lvl
        FROM {lv}
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
        """
    )


@query(
    "b53_percentile_median",
    oracle="""
    SELECT c_mktsegment,
           ROUND(QUANTILE_CONT(c_acctbal, 0.25), 6) AS p25,
           ROUND(MEDIAN(c_acctbal), 6) AS p50,
           ROUND(QUANTILE_CONT(c_acctbal, 0.75), 6) AS p75,
           COUNT(*) AS n
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def b53_percentile_median(spark: SparkSession, sf: str) -> DataFrame:
    """Exact interpolated percentiles + median per group. Spark's
    percentile() and DuckDB's quantile_cont() both use linear
    interpolation; rounded to 6 for the hash gate. (At 100 TB prefer
    approx_percentile — bounded memory; the exact form shown here is
    the oracle-checkable baseline.)"""
    c = t(spark, sf, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.round(F.percentile("c_acctbal", F.lit(0.25)), 6).alias("p25"),
        F.round(F.median("c_acctbal"), 6).alias("p50"),
        F.round(F.percentile("c_acctbal", F.lit(0.75)), 6).alias("p75"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "b54_sessionize_batch",
    memo_plan=True,  # pure constructor: prepared-plan memo (r16)
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, EPOCH_US(CAST(ts AS TIMESTAMP)) AS us
      FROM events
    ),
    m AS (
      SELECT user_id, event_id, us,
             CASE WHEN LAG(us) OVER w IS NULL
                    OR us - LAG(us) OVER w > 1800000000 THEN 1
                  ELSE 0 END AS new_s
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ),
    s AS (
      SELECT user_id, us,
             CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM m
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(us) AS start_us, MAX(us) AS end_us
    FROM s GROUP BY user_id, session_id
    """,
)
def b54_sessionize_batch(spark: SparkSession, sf: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands, 30-min gap): the batch
    twin of the streaming session window (s04), but hash-checkable.
    Two window passes over one (user_id)-partitioned sort — a single
    shuffle; session counts stay bounded per user at any scale."""
    e = t(spark, sf, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gap_us = 30 * 60 * 1_000_000
    new_s = F.when(
        F.lag("us").over(w).isNull()
        | (F.col("us") - F.lag("us").over(w) > gap_us),
        1,
    ).otherwise(0)
    s = e.withColumn("new_s", new_s).withColumn(
        "session_id",
        F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("us").alias("start_us"),
        F.max("us").alias("end_us"),
    )


@query(
    "b61_null_safe_join",
    oracle="""
    WITH a AS (SELECT p_partkey,
                      CASE WHEN p_size < 15 THEN NULL ELSE p_brand END AS brand
               FROM part WHERE p_partkey <= 1000),
         b AS (SELECT p_partkey AS pk2,
                      CASE WHEN p_size < 15 THEN NULL ELSE p_brand END AS brand2
               FROM part WHERE p_partkey <= 1000)
    SELECT a.p_partkey, b.pk2, a.brand
    FROM a JOIN b ON a.brand IS NOT DISTINCT FROM b.brand2
                 AND a.p_partkey = b.pk2
    """,
)
def b61_null_safe_join(spark: SparkSession, sf: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other instead of vanishing — the semantics SCD-style
    dimension joins need. Plans as a hash join on the null-safe key,
    same shuffle shape as a plain equi-join."""
    p = t(spark, sf, "part").filter(F.col("p_partkey") <= 1000)
    brand = F.when(F.col("p_size") < 15, None).otherwise(F.col("p_brand"))
    a = p.select("p_partkey", brand.alias("brand"))
    b = p.select(
        F.col("p_partkey").alias("pk2"), brand.alias("brand2")
    )
    return a.join(
        b,
        a["brand"].eqNullSafe(b["brand2"]) & (a["p_partkey"] == b["pk2"]),
    ).select("p_partkey", "pk2", "brand")


@query(
    "c16_salted_hot_key_agg",
    oracle="""
    SELECT event_type,
           COUNT(*) AS count_value,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
             AS sum_value
    FROM events GROUP BY event_type
    """,
)
def c16_salted_hot_key_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Skew-safe aggregation as a first-class operator: events has only
    5 event_type values, the degenerate hot-key case where one reducer
    would take a whole key. functions.salted_agg spreads each key over
    16 salted partials and merges — results identical to the plain
    groupBy (the oracle), which is the whole point."""
    from ..functions import salted_agg  # noqa: PLC0415

    ev = t(spark, sf, "events").withColumn(
        "value", F.col("value").cast("decimal(18,6)")
    )
    out = salted_agg(
        ev, ["event_type"], {"value": "sum"}, salt=16
    )
    cnt = salted_agg(ev, ["event_type"], {"value": "count"}, salt=16)
    return (
        cnt.join(out, "event_type")
        .select(
            "event_type",
            F.col("count_value"),
            F.round(F.col("sum_value").cast("double"), 6).alias("sum_value"),
        )
    )


@query(
    "b59_map_hof",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_quantity * 2 AS DOUBLE) AS qty_doubled,
           CASE WHEN l_quantity > 25 THEN 'qty' END AS big_key,
           2 AS n_entries
    FROM lineitem WHERE l_orderkey <= 1000
    """,
)
def b59_map_hof(spark: SparkSession, sf: str) -> DataFrame:
    """Map higher-order functions: map_from_arrays -> transform_values
    -> map_filter -> map_keys/element_at, all in one codegen'd
    projection. The oracle sees the equivalent scalar arithmetic —
    identity-style check that the map pipeline loses nothing."""
    l = t(spark, sf, "lineitem").filter(F.col("l_orderkey") <= 1000)
    m = F.map_from_arrays(
        F.array(F.lit("qty"), F.lit("price")),
        F.array(F.col("l_quantity"), F.col("l_extendedprice")),
    )
    doubled = F.transform_values(m, lambda k, v: v * 2)
    big = F.map_filter(m, lambda k, v: (k == "qty") & (v > 25))
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.element_at(doubled, "qty").cast("double").alias("qty_doubled"),
        F.try_element_at(F.map_keys(big), F.lit(1)).alias("big_key"),
        F.size(m).alias("n_entries"),
    )


@query(
    "b58_grouped_map_pandas",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           ROUND(c_acctbal - AVG(c_acctbal) OVER (PARTITION BY c_mktsegment), 6)
             AS bal_centered
    FROM customer WHERE c_custkey <= 3000
    """,
)
def b58_grouped_map_pandas(spark: SparkSession, sf: str) -> DataFrame:
    """Grouped-map pandas UDF (applyInPandas): per-segment mean-centering
    — the split-apply-combine escape hatch when per-group logic exceeds
    SQL (model scoring, per-group fitting). One shuffle on the group
    key; each group becomes one Arrow batch in one Python worker.
    Mean computed with numpy float64 over a bounded slice so it matches
    the window-AVG oracle at 6 decimals."""
    c = t(spark, sf, "customer").filter(F.col("c_custkey") <= 3000).select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        mean = float(pdf["c_acctbal"].to_numpy().mean())
        return pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "c_mktsegment": pdf["c_mktsegment"],
                "bal_centered": (pdf["c_acctbal"] - mean).round(6),
            }
        )

    return c.groupBy("c_mktsegment").applyInPandas(
        center, "c_custkey bigint, c_mktsegment string, bal_centered double"
    )


@query(
    "b55_pivot",
    oracle="""
    SELECT l_returnflag,
           ROUND(CAST(SUM(CASE WHEN l_linestatus = 'F'
                    THEN CAST(l_quantity AS DECIMAL(18,4)) END)
                AS DOUBLE), 6) AS qty_f,
           ROUND(CAST(SUM(CASE WHEN l_linestatus = 'O'
                    THEN CAST(l_quantity AS DECIMAL(18,4)) END)
                AS DOUBLE), 6) AS qty_o
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def b55_pivot(spark: SparkSession, sf: str) -> DataFrame:
    """Pivot (wide aggregation): status columns from row values.
    Explicit value list — no extra distinct-scan job, and the plan is a
    single hash aggregate exactly like the CASE-WHEN form."""
    l = t(spark, sf, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.sum(F.col("l_quantity").cast(DEC)).cast("double"), 6))
        .withColumnRenamed("F", "qty_f")
        .withColumnRenamed("O", "qty_o")
    )


@query(
    "b56_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, metric, val FROM (
      SELECT l_orderkey, l_linenumber, 'quantity' AS metric,
             CAST(l_quantity AS DOUBLE) AS val
      FROM lineitem WHERE l_orderkey <= 500
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'extendedprice',
             CAST(l_extendedprice AS DOUBLE)
      FROM lineitem WHERE l_orderkey <= 500
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'discount', CAST(l_discount AS DOUBLE)
      FROM lineitem WHERE l_orderkey <= 500
    )
    """,
)
def b56_unpivot(spark: SparkSession, sf: str) -> DataFrame:
    """Unpivot/melt (narrow transformation): measure columns to
    (metric, value) rows — one generate stage, no shuffle."""
    l = t(spark, sf, "lineitem").filter(F.col("l_orderkey") <= 500)
    return l.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "metric",
        "val",
    ).withColumn("metric", F.regexp_replace("metric", "^l_", ""))


@query(
    "b57_string_agg",
    oracle="""
    SELECT r.r_name,
           STRING_AGG(n.n_name, ',' ORDER BY n.n_name) AS members,
           COUNT(*) AS n_nations
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def b57_string_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered string aggregation: collect_list -> array_sort ->
    array_join gives the deterministic STRING_AGG(... ORDER BY)
    equivalent (collect_list alone is partition-order-dependent —
    never hashable without the sort)."""
    n, r = t(spark, sf, "nation"), t(spark, sf, "region")
    return (
        n.join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
                "members"
            ),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


@query(
    "b42_udtf_explode",
    memo_plan=True,  # pure constructor: prepared-plan memo (r16)
    oracle="""
    SELECT word, COUNT(*) AS n
    FROM (SELECT UNNEST(STR_SPLIT(p_name, ' ')) AS word
          FROM part WHERE p_partkey <= 2000)
    GROUP BY word
    """,
)
def b42_udtf_explode(spark: SparkSession, sf: str) -> DataFrame:
    """Table-generating surface: explode() of a split array (the
    engine's UDTF pattern — SURVEY B38)."""
    p = t(spark, sf, "part").filter(F.col("p_partkey") <= 2000)
    return (
        p.select(F.explode(F.split("p_name", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "b62_asof_join",
    memo_plan=True,  # pure constructor: prepared-plan memo (r16)
    oracle="""
    WITH dim AS (
      SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice
      FROM orders
      WHERE o_custkey < 100
      QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
                                 ORDER BY o_orderkey DESC) = 1
    )
    SELECT e.event_id, e.user_id,
           STRFTIME(e.ts, '%Y-%m-%d %H:%M:%S') AS event_ts,
           dim.o_orderkey AS asof_orderkey,
           dim.o_totalprice AS asof_totalprice
    FROM events e ASOF LEFT JOIN dim
      ON e.user_id = dim.o_custkey AND e.ts >= dim.o_orderdate
    """,
)
def b62_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    """Temporal as-of join (functions.asof_join): each event picks the
    latest order of the same user at-or-before its timestamp — the
    point-in-time dimension lookup every feature/training pipeline
    needs. The union-merge plan is one shuffle on the key + a running
    window, linear in rows (join+argmax would fan out per-key
    quadratically). The dimension keeps only o_custkey < 100 so events
    from users 100-149 exercise the unmatched-NULL path; equal-time
    right rows are pre-deduped to max orderkey (the determinism
    contract), mirrored by the oracle's QUALIFY + ASOF LEFT JOIN."""
    from ..functions import asof_join  # noqa: PLC0415

    ev = t(spark, sf, "events").select("event_id", "user_id", "ts")
    o = t(spark, sf, "orders").filter(F.col("o_custkey") < 100)
    # equal-time dedup as an AGGREGATE, not a ranking window: same
    # keep-max-orderkey contract (orderkey is unique, so max_by ties
    # are impossible), but partial aggregation shrinks the map side
    # and no per-partition sort is needed — the asof union's own
    # key-ordered window is the only sort in the plan
    dim = o.groupBy("o_custkey", "o_orderdate").agg(
        F.max("o_orderkey").alias("o_orderkey"),
        F.max_by("o_totalprice", "o_orderkey").alias("o_totalprice"),
    )
    res = asof_join(
        ev, dim, on=("user_id", "o_custkey"),
        left_time="ts", right_time="o_orderdate",
    )
    return res.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("event_ts"),
        F.col("o_orderkey").alias("asof_orderkey"),
        F.col("o_totalprice").alias("asof_totalprice"),
    )


@query(
    "b63_recursive_cte_hierarchy",
    oracle="""
    WITH RECURSIVE edges AS (
      SELECT 'c' || c_custkey AS child, 'n' || c_nationkey AS parent
      FROM customer WHERE c_custkey <= 2000
      UNION ALL
      SELECT 'n' || n_nationkey, 'r' || n_regionkey FROM nation
    ),
    walk AS (
      SELECT r_regionkey AS rk, 'r' || r_regionkey AS node, 0 AS depth
      FROM region
      UNION ALL
      SELECT w.rk, e.child, w.depth + 1
      FROM walk w JOIN edges e ON e.parent = w.node
    )
    SELECT r.r_name AS region_name,
           CAST(SUM(CASE WHEN w.depth = 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_customers,
           CAST(MAX(w.depth) AS INTEGER) AS max_depth
    FROM walk w JOIN region r ON r.r_regionkey = w.rk
    GROUP BY region_name
    """,
)
def b63_recursive_cte_hierarchy(spark: SparkSession, sf: str) -> DataFrame:
    """Recursive CTE (WITH RECURSIVE — new in Spark 4.x; the standard
    SQL hierarchy/transitive-closure operator): resolve every node of
    a customer -> nation -> region hierarchy to its ROOT region by
    iterated self-join over an edge list, then count the leaves and
    depth per root. The recursion is data-bounded (each iteration is
    one distributed join; it stops when an iteration adds no rows),
    so the same query walks an N-level org or BOM hierarchy at any
    scale — depth iterations of shuffles, never a driver loop. DuckDB
    replays the identical recursion."""
    c = t(spark, sf, "customer")
    n = t(spark, sf, "nation")
    r = t(spark, sf, "region")
    return spark.sql(
        """
        WITH RECURSIVE edges AS (
          SELECT concat('c', c_custkey) AS child,
                 concat('n', c_nationkey) AS parent
          FROM {c} WHERE c_custkey <= 2000
          UNION ALL
          SELECT concat('n', n_nationkey), concat('r', n_regionkey)
          FROM {n}
        ),
        walk AS (
          SELECT r_regionkey AS rk,
                 concat('r', r_regionkey) AS node, 0 AS depth
          FROM {r}
          UNION ALL
          SELECT w.rk, e.child, w.depth + 1
          FROM walk w JOIN edges e ON e.parent = w.node
        )
        SELECT r.r_name AS region_name,
               sum(CASE WHEN w.depth = 2 THEN 1 ELSE 0 END) AS n_customers,
               cast(max(w.depth) AS int) AS max_depth
        FROM walk w JOIN {r} r ON r.r_regionkey = w.rk
        GROUP BY region_name
        """,
        c=c, n=n, r=r,
    )


@query(
    "b64_lateral_topn",
    oracle="""
    SELECT n.n_name AS nation, c.c_custkey AS custkey,
           c.c_acctbal AS acctbal
    FROM nation n,
    LATERAL (SELECT c_custkey, c_acctbal FROM customer
             WHERE c_nationkey = n.n_nationkey
             ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c
    """,
)
def b64_lateral_topn(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated LATERAL subquery (SQL:1999 lateral derived table):
    top-2 customers by balance PER NATION, the classic top-N-per-group
    expressed as a correlated sub-select instead of a ranking window.
    Catalyst decorrelates the lateral into a join + per-key limit
    (DomainJoin rewrite), so the plan stays distributed — no
    per-outer-row re-execution at any scale. DuckDB runs the identical
    LATERAL."""
    n = t(spark, sf, "nation")
    c = t(spark, sf, "customer")
    return spark.sql(
        """
        SELECT n.n_name AS nation, c.c_custkey AS custkey,
               c.c_acctbal AS acctbal
        FROM {n} n,
        LATERAL (SELECT c_custkey, c_acctbal FROM {c}
                 WHERE c_nationkey = n.n_nationkey
                 ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c
        """,
        n=n, c=c,
    )


@query(
    "b65_window_time_range_frame",
    oracle="""
    SELECT event_id,
           COUNT(*) OVER w AS n_1h,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w
                 AS DOUBLE), 6) AS sum_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                 AND CURRENT ROW)
    """,
)
def b65_window_time_range_frame(spark: SparkSession, sf: str) -> DataFrame:
    """Time-RANGE window frame (RANGE BETWEEN INTERVAL ... PRECEDING —
    value-based frame boundaries, the family b20/b21's ROWS frames
    cannot express): each event's trailing-one-hour per-user count and
    value sum. The frame is defined by the ORDER BY column's VALUE, so
    ties and gaps behave by time, not by row position — the standard
    rolling-window feature shape. Decimal accumulation keeps the sum
    order-independent under ts ties. Same one-exchange-per-partition-
    key plan as any window; DuckDB runs the identical frame."""
    e = t(spark, sf, "events")
    return spark.sql(
        """
        SELECT event_id,
               count(*) OVER w AS n_1h,
               round(cast(sum(cast(value AS decimal(18,6))) OVER w
                     AS double), 6) AS sum_1h
        FROM {e}
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                     AND CURRENT ROW)
        """,
        e=e,
    )
