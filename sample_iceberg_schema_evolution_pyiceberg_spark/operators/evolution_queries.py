"""Tier A evolution capabilities exposed through the correctness gate:
the v1->v2 episode, partition transforms, and the lake write/read
round-trip, each with a deterministic oracle (SURVEY.md §2 A7-A22).
"""

from __future__ import annotations

import json
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..handler import process_event
from ..schema_diff import flatten
from ..table_format import LakeCatalog
from .registry import query, t

_ASSETS = Path(__file__).parent.parent / "assets"


@query(
    "a01_evolution_episode",
    oracle="""
    SELECT * FROM (VALUES
      ('order_id', 'string', 1),
      ('order_time', 'timestamp_ntz', 1),
      ('customer_name', 'string', 1),
      ('address', 'struct', 1),
      ('address.address_line', 'string', 1),
      ('address.city', 'string', 1),
      ('address.state', 'string', 1),
      ('address.zip', 'string', 1),
      ('order_items', 'array', 0),
      ('order_items.element.item_id', 'string', 0),
      ('order_items.element.item_count', 'int', 0),
      ('order_items.element.price', 'float', 0)
    ) AS s(column_path, type_name, is_nullable)
    """,
)
def a01_evolution_episode(spark: SparkSession, sf: str) -> DataFrame:
    """Run the full CREATE -> ALTER golden episode (reference assets
    v1 -> v2) in a scratch warehouse and emit the evolved schema as
    rows; the oracle is the literal expected schema. Proves A5, A7-A17,
    A19 end-to-end through the driver gate."""
    with tempfile.TemporaryDirectory(prefix="evo_gate_") as wh:
        cat = LakeCatalog(wh)
        r1 = process_event(spark, cat, str(_ASSETS / "orders_v1.json"))
        r2 = process_event(spark, cat, str(_ASSETS / "orders_v2.json"))
        assert not (r1.has_error or r2.has_error), (r1, r2)
        table = cat.load_table("customer_order", "orders")
        rows = [
            (
                path,
                _type_name(ff.dtype),
                0 if ff.required else 1,
            )
            for path, ff in flatten(table.schema).items()
        ]
    return spark.createDataFrame(
        rows, "column_path string, type_name string, is_nullable int"
    )


def _type_name(dt: T.DataType) -> str:
    if isinstance(dt, T.StructType):
        return "struct"
    if isinstance(dt, T.ArrayType):
        return "array"
    if isinstance(dt, T.MapType):
        return "map"
    return dt.simpleString()


@query(
    "a02_partition_transforms",
    oracle="""
    SELECT o_orderkey,
           STRFTIME(o_orderdate, '%Y') AS y,
           STRFTIME(o_orderdate, '%Y-%m') AS ym,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS ymd,
           STRFTIME(o_orderdate, '%Y-%m-%d-%H') AS ymdh,
           o_orderstatus AS ident
    FROM orders WHERE o_orderkey <= 2000
    """,
)
def a02_partition_transforms(spark: SparkSession, sf: str) -> DataFrame:
    """The five partition transforms (A18) as value expressions — the
    same Column exprs the write path uses for hidden partitioning."""
    from ..partitioning import PartitionField  # noqa: PLC0415

    o = t(spark, sf, "orders").filter(F.col("o_orderkey") <= 2000)
    mk = lambda tr, name: PartitionField("o_orderdate", tr, name, 1000).expression().alias(name)  # noqa: E731
    return o.select(
        "o_orderkey",
        mk("year", "y"),
        mk("month", "ym"),
        mk("day", "ymd"),
        mk("hour", "ymdh"),
        PartitionField("o_orderstatus", "identity", "ident", 1004)
        .expression()
        .alias("ident"),
    )


@query(
    "a03_lake_roundtrip",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 6)
             AS total
    FROM orders WHERE o_orderkey <= 5000
    GROUP BY o_orderstatus
    """,
)
def a03_lake_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Write orders into a partitioned lake table (A7+A22: months()
    hidden partitioning, snapshot append), scan it back (B2), aggregate
    — the oracle reads the original parquet. Proves the write/read path
    loses nothing."""
    src = t(spark, sf, "orders").filter(F.col("o_orderkey") <= 5000)
    with tempfile.TemporaryDirectory(prefix="lake_rt_") as wh:
        cat = LakeCatalog(wh)
        table = cat.create_table(
            "gate",
            "orders_rt",
            src.schema,
            partition_spec=_month_spec("o_orderdate"),
        )
        table.append(src)
        out = (
            table.to_df(spark)
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(
                    F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast(
                        "double"
                    ),
                    6,
                ).alias("total"),
            )
        )
        # materialize before the temp dir vanishes
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)


def _month_spec(col: str):
    from ..partitioning import PartitionField, PartitionSpec  # noqa: PLC0415

    return PartitionSpec((PartitionField(col, "month", f"{col}_month", 1000),))


@query(
    "a05_merge_upsert",
    oracle="""
    WITH target AS (SELECT * FROM orders WHERE o_orderkey <= 1000),
         src AS (SELECT * FROM orders
                 WHERE o_orderkey BETWEEN 501 AND 1500),
         merged AS (
           SELECT t.o_orderkey,
                  CASE WHEN s.o_orderkey IS NOT NULL THEN 'MERGED'
                       ELSE t.o_orderpriority END AS prio
           FROM target t LEFT JOIN src s ON t.o_orderkey = s.o_orderkey
           UNION ALL
           SELECT s.o_orderkey, s.o_orderpriority
           FROM src s
           WHERE s.o_orderkey NOT IN (SELECT o_orderkey FROM target)
         )
    SELECT prio, COUNT(*) AS n FROM merged GROUP BY prio
    """,
)
def a05_merge_upsert(spark: SparkSession, sf: str) -> DataFrame:
    """MERGE INTO (upsert) on a lake table: matched rows updated,
    unmatched source rows inserted, one overwrite snapshot — the
    Iceberg row-level-op surface on our format."""
    o = t(spark, sf, "orders")
    target_src = o.filter(F.col("o_orderkey") <= 1000)
    source = o.filter(F.col("o_orderkey").between(501, 1500))
    with tempfile.TemporaryDirectory(prefix="merge_gate_") as wh:
        cat = LakeCatalog(wh)
        table = cat.create_table("gate", "orders_m", target_src.schema)
        table.append(target_src)
        table.merge_into(
            spark,
            source,
            ["o_orderkey"],
            when_matched_update={"o_orderpriority": "'MERGED'"},
        )
        out = (
            table.to_df(spark)
            .groupBy(F.col("o_orderpriority").alias("prio"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        rows = out.collect()
        # materialize before the temp dir vanishes
        return spark.createDataFrame(rows, out.schema)


@query(
    "a06_delete_update_where",
    oracle="""
    WITH afterdel AS (SELECT * FROM part
                      WHERE p_partkey <= 2000 AND NOT (p_size < 10)),
         afterupd AS (
           SELECT p_partkey, p_brand,
                  CASE WHEN p_size > 40 THEN 0 ELSE p_size END AS p_size
           FROM afterdel
         )
    SELECT p_brand, COUNT(*) AS n, CAST(SUM(p_size) AS BIGINT) AS size_sum
    FROM afterupd GROUP BY p_brand
    """,
)
def a06_delete_update_where(spark: SparkSession, sf: str) -> DataFrame:
    """Row-level DELETE then UPDATE (copy-on-write snapshots)."""
    src = t(spark, sf, "part").filter(F.col("p_partkey") <= 2000)
    with tempfile.TemporaryDirectory(prefix="dml_gate_") as wh:
        cat = LakeCatalog(wh)
        table = cat.create_table("gate", "part_dml", src.schema)
        table.append(src)
        table.delete_where(spark, "p_size < 10")
        table.update_where(spark, "p_size > 40", {"p_size": "0"})
        out = (
            table.to_df(spark)
            .groupBy("p_brand")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("p_size").alias("size_sum"),
            )
        )
        rows = out.collect()
        # materialize before the temp dir vanishes
        return spark.createDataFrame(rows, out.schema)


@query(
    "a07_time_travel",
    oracle="""
    SELECT 'v1' AS version, COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 6)
             AS total
    FROM orders WHERE o_orderkey <= 1000
    UNION ALL
    SELECT 'v2', COUNT(*),
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 6)
    FROM orders WHERE o_orderkey <= 2000
    """,
)
def a07_time_travel(spark: SparkSession, sf: str) -> DataFrame:
    """Snapshot time travel (Iceberg snapshot-id read on our snapshot
    log): append batch 1, append batch 2, then scan as-of snapshot 1
    and current — the as-of read must see only batch 1. Oracle computes
    both states relationally from the source parquet."""
    o = t(spark, sf, "orders")
    b1 = o.filter(F.col("o_orderkey") <= 1000)
    b2 = o.filter(F.col("o_orderkey").between(1001, 2000))

    def agg(df: DataFrame, version: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast(
                    "double"
                ),
                6,
            ).alias("total"),
        ).select(F.lit(version).alias("version"), "n", "total")

    with tempfile.TemporaryDirectory(prefix="tt_gate_") as wh:
        cat = LakeCatalog(wh)
        table = cat.create_table("gate", "orders_tt", b1.schema)
        s1 = table.append(b1)
        table.append(b2)
        out = agg(table.to_df(spark, as_of_snapshot=s1.snapshot_id), "v1").unionAll(
            agg(table.to_df(spark), "v2")
        )
        rows = out.collect()
        # materialize before the temp dir vanishes
        return spark.createDataFrame(rows, out.schema)


@query(
    "a08_compaction_invariance",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n
    FROM orders WHERE o_orderkey < 2500
    GROUP BY o_orderstatus
    """,
)
def a08_compaction_invariance(spark: SparkSession, sf: str) -> DataFrame:
    """Maintenance op (rewrite_data_files analog): five small appends —
    the reference's 1-20-row-per-invoke pattern that snowballs tiny
    files (SURVEY §4) — then compact() merges the live set into one
    snapshot. Query results must be identical after compaction; the
    oracle sees the plain relational aggregate."""
    o = t(spark, sf, "orders").filter(F.col("o_orderkey") < 2500)
    with tempfile.TemporaryDirectory(prefix="compact_gate_") as wh:
        cat = LakeCatalog(wh)
        table = cat.create_table("gate", "orders_c", o.schema)
        for i in range(5):  # five snapshot appends of ~500 keys each
            table.append(
                o.filter(
                    (F.col("o_orderkey") >= i * 500)
                    & (F.col("o_orderkey") < (i + 1) * 500)
                )
            )
        assert len(table.snapshots) == 5
        table.compact(spark)
        assert len(table.snapshots) == 1
        out = table.to_df(spark).groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n")
        )
        rows = out.collect()
        # materialize before the temp dir vanishes
        return spark.createDataFrame(rows, out.schema)


@query(
    "a04_schema_diff_report",
    oracle="""
    SELECT * FROM (VALUES
      ('order_id', 'add', 0),
      ('address.address_line', 'add', 1),
      ('address.zip', 'add', 1),
      ('order_items.element.item_count', 'add', 1)
    ) AS s(column_path, change, is_nested)
    """,
)
def a04_schema_diff_report(spark: SparkSession, sf: str) -> DataFrame:
    """The schema differ (A9) as a queryable report: diff v1 vs v2
    compiled schemas, emit one row per SchemaChange."""
    from ..schema_compiler import compile_schema  # noqa: PLC0415
    from ..schema_diff import diff_schemas  # noqa: PLC0415

    v1 = compile_schema(json.loads((_ASSETS / "orders_v1.json").read_text()))
    v2 = compile_schema(json.loads((_ASSETS / "orders_v2.json").read_text()))
    rows = [
        (
            c.column_path,
            "add" if c.add else ("drop" if c.drop else "update"),
            1 if c.is_nested else 0,
        )
        for c in diff_schemas(v1, v2)
    ]
    return spark.createDataFrame(
        rows, "column_path string, change string, is_nested int"
    )


@query(
    "a13_incremental_read",
    oracle="""
    SELECT 'batch2' AS batch, 'insert' AS change_type, COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 6)
             AS total
    FROM orders WHERE o_orderkey BETWEEN 1001 AND 2000
    UNION ALL
    SELECT 'batch3', 'insert', COUNT(*),
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 6)
    FROM orders WHERE o_orderkey BETWEEN 2001 AND 3000
    """,
)
def a13_incremental_read(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental append scan / CDC (LakeTable.changes_between — the
    Iceberg appendsBetween analog): three appends, then read the delta
    (s1, s3] — exactly batches 2 and 3, tagged per snapshot, batch 1
    invisible. The scan reads only the range's snapshot directories, so
    incremental cost tracks the delta, not table size. Oracle computes
    the two batch aggregates relationally from the source parquet."""
    o = t(spark, sf, "orders")
    b1 = o.filter(F.col("o_orderkey") <= 1000)
    b2 = o.filter(F.col("o_orderkey").between(1001, 2000))
    b3 = o.filter(F.col("o_orderkey").between(2001, 3000))
    with tempfile.TemporaryDirectory(prefix="inc_gate_") as wh:
        cat = LakeCatalog(wh)
        table = cat.create_table("gate", "orders_inc", b1.schema)
        s1 = table.append(b1)
        s2 = table.append(b2)
        s3 = table.append(b3)
        inc = table.changes_between(
            spark, from_snapshot=s1.snapshot_id, to_snapshot=s3.snapshot_id
        )
        out = (
            inc.groupBy("_snapshot_id", "_change_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(
                    F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast(
                        "double"
                    ),
                    6,
                ).alias("total"),
            )
            .select(
                F.when(F.col("_snapshot_id") == s2.snapshot_id, "batch2")
                .when(F.col("_snapshot_id") == s3.snapshot_id, "batch3")
                .otherwise("UNEXPECTED")
                .alias("batch"),
                F.col("_change_type").alias("change_type"),
                "n",
                "total",
            )
        )
        rows = out.collect()
        # materialize before the temp dir vanishes
        return spark.createDataFrame(rows, out.schema)


@query(
    "a28_bucket_truncate_episode",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 6)
             AS total
    FROM orders
    WHERE o_orderkey <= 5000 AND o_custkey IN (7, 13, 26)
    GROUP BY o_orderpriority
    """,
)
def a28_bucket_truncate_episode(spark: SparkSession, sf: str) -> DataFrame:
    """bucket[8]/truncate[2] spec end-to-end (VERDICT r8 item 1): write
    orders into a lake table partitioned by (bucket(8, o_custkey),
    truncate(2, o_orderpriority)), scan back with an IN-list pruning
    predicate on the BUCKETED key, aggregate; the oracle reads the raw
    parquet. The episode also asserts the manifest actually SKIPPED
    files outside the literals' buckets (hash-membership pruning, the
    thing bucket[N] buys at 100 TB)."""
    from ..partitioning import compile_partition_spec, iceberg_bucket_of  # noqa: PLC0415
    from ..table_format import LakeCatalog  # noqa: PLC0415

    keys = [7, 13, 26]
    src = t(spark, sf, "orders").filter(F.col("o_orderkey") <= 5000).select(
        "o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice"
    )
    with tempfile.TemporaryDirectory(prefix="bt_gate_") as wh:
        cat = LakeCatalog(wh)
        table = cat.create_table(
            "gate",
            "orders_bt",
            src.schema,
            partition_spec=compile_partition_spec(
                {
                    "partitions": [
                        {"column_name": "o_custkey", "transform": "bucket[8]"},
                        {
                            "column_name": "o_orderpriority",
                            "transform": "truncate[2]",
                        },
                    ]
                }
            ),
            # one file per live partition value (the write layout
            # Iceberg recommends for partitioned tables) — without it
            # every write task emits a file into every value dir
            properties={"write.distribution-mode": "hash"},
        )
        table.append(src)
        # manifest-level hash-membership skip is live: files outside
        # the literals' buckets never reach the scan
        snap = table.snapshots[-1]
        want = {str(iceberg_bucket_of(k, 8)) for k in keys}
        kept = [
            f
            for f in snap.files
            if f["partition"]["o_custkey_bucket"] in want
        ]
        assert 0 < len(kept) < len(snap.files), (
            len(kept), len(snap.files)
        )
        out = (
            table.to_df(spark, pruning=[("o_custkey", "in", keys)])
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(
                    F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast(
                        "double"
                    ),
                    6,
                ).alias("total"),
            )
        )
        rows = out.collect()
        # materialize before the temp dir vanishes
        return spark.createDataFrame(rows, out.schema)


@query(
    "b66_lake_bucket_join",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_items,
           ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE), 6)
             AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_orderkey <= 20000
    GROUP BY o.o_orderpriority
    """,
)
def b66_lake_bucket_join(spark: SparkSession, sf: str) -> DataFrame:
    """The b03 fact-fact arm as a LAKE-RESIDENT layout (VERDICT r8
    item 1 payoff): both facts land in lake tables whose spec is
    bucket[8] on the orderkey with the Spark-native bucket layout
    (write.bucket-layout=spark), and the join of the two lake scans is
    asserted to schedule with NO exchange on either side — the
    zero-shuffle fact-fact join a 100 TB deployment writes at ingest,
    now expressed (and replayed) entirely through the table format."""
    from ..partitioning import compile_partition_spec  # noqa: PLC0415
    from ..table_format import LakeCatalog  # noqa: PLC0415

    li = (
        t(spark, sf, "lineitem")
        .filter(F.col("l_orderkey") <= 20000)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    orders = (
        t(spark, sf, "orders")
        .filter(F.col("o_orderkey") <= 20000)
        .select("o_orderkey", "o_orderpriority")
    )
    with tempfile.TemporaryDirectory(prefix="lbj_gate_") as wh:
        cat = LakeCatalog(wh)

        def mk(name, df, key):
            spec = compile_partition_spec(
                {"partitions": [{"column_name": key, "transform": "bucket[8]"}]}
            )
            tbl = cat.create_table(
                "gate", name, df.schema, partition_spec=spec,
                properties={"write.bucket-layout": "spark"},
            )
            tbl.append(df)
            return tbl

        tl = mk("li_bkt", li, "l_orderkey")
        to = mk("ord_bkt", orders, "o_orderkey")
        dl, do = tl.to_df(spark), to.to_df(spark)
        joined = dl.join(do, dl.l_orderkey == do.o_orderkey)
        # the layout claim, verified in-episode: no exchange feeds the
        # join (broadcast disabled so the bucketed path is exercised)
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            out = joined.groupBy("o_orderpriority").agg(
                F.count(F.lit(1)).alias("n_items"),
                F.round(
                    F.sum(
                        F.col("l_extendedprice").cast("decimal(18,4)")
                        * (1 - F.col("l_discount").cast("decimal(18,4)"))
                    ).cast("double"),
                    6,
                ).alias("revenue"),
            )
            # materialize before the temp dir vanishes (bounded: one
            # row per orderpriority)
            rows = out.collect()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        return spark.createDataFrame(rows, out.schema)


@query(
    "a29_rename_evolution_episode",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 6)
             AS price_total
    FROM orders WHERE o_orderkey <= 6000
    GROUP BY o_orderstatus
    """,
)
def a29_rename_evolution_episode(spark: SparkSession, sf: str) -> DataFrame:
    """Column RENAME evolution end-to-end (VERDICT r8 item 5): append
    half of orders, RENAME o_totalprice -> price_total (metadata-only),
    append the second half under the NEW name, then aggregate the full
    table — pre-rename rows must surface under price_total with values
    intact. The oracle reads the raw parquet (one column name
    throughout), so a lost or mis-mapped pre-rename file changes the
    hash."""
    from ..table_format import LakeCatalog  # noqa: PLC0415

    src = t(spark, sf, "orders").filter(F.col("o_orderkey") <= 6000).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    with tempfile.TemporaryDirectory(prefix="rn_gate_") as wh:
        cat = LakeCatalog(wh)
        table = cat.create_table("gate", "orders_rn", src.schema)
        table.append(src.filter(F.col("o_orderkey") <= 3000))
        table.rename_column("o_totalprice", "price_total")
        table.append(
            src.filter(F.col("o_orderkey") > 3000).withColumnRenamed(
                "o_totalprice", "price_total"
            )
        )
        out = (
            table.to_df(spark)
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(
                    F.sum(F.col("price_total").cast("decimal(18,4)")).cast(
                        "double"
                    ),
                    6,
                ).alias("price_total"),
            )
        )
        rows = out.collect()
        # materialize before the temp dir vanishes
        return spark.createDataFrame(rows, out.schema)


@query(
    "a32_spec_bucket_join",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_items,
           ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE), 6)
             AS revenue,
           TRUE AS spec_exported_verbatim, TRUE AS tuples_spec_exact
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_orderkey <= 8000
    GROUP BY o.o_orderpriority
    """,
)
def a32_spec_bucket_join(spark: SparkSession, sf: str) -> DataFrame:
    """The b66 zero-exchange lake join WITHOUT the export divergence
    (VERDICT r9 item 5): both facts use ``write.bucket-layout=dual`` —
    hive dirs carry the SPEC's murmur3 ``bucket[16]`` value while the
    files inside each dir are real Spark bucket files. The join of the
    two lake scans still schedules with NO exchange on either side,
    AND the exported Iceberg spec carries ``bucket[16]`` verbatim (not
    ``void``), with every manifest partition tuple equal to the
    spec-exact transform of its file's keys — an external Iceberg
    reader prunes these tables correctly. Trade: one extra directory
    level (16x16 files per snapshot at this scale; at ingest scale the
    file count is governed by task x bucket like any partitioned
    bucketed write)."""
    import json  # noqa: PLC0415

    from ..iceberg_export import export_to_iceberg  # noqa: PLC0415
    from ..partitioning import compile_partition_spec  # noqa: PLC0415
    from ..table_format import LakeCatalog  # noqa: PLC0415

    li = (
        t(spark, sf, "lineitem")
        .filter(F.col("l_orderkey") <= 8000)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    orders = (
        t(spark, sf, "orders")
        .filter(F.col("o_orderkey") <= 8000)
        .select("o_orderkey", "o_orderpriority")
    )
    with tempfile.TemporaryDirectory(prefix="dual_gate_") as wh:
        cat = LakeCatalog(wh)

        def mk(name, df, key):
            spec = compile_partition_spec(
                {"partitions": [{"column_name": key,
                                 "transform": "bucket[16]"}]}
            )
            tbl = cat.create_table(
                "gate", name, df.schema, partition_spec=spec,
                properties={"write.bucket-layout": "dual"},
            )
            tbl.append(df)
            return tbl

        tl = mk("li_dual", li, "l_orderkey")
        to = mk("ord_dual", orders, "o_orderkey")
        # export-side claim: the spec survives verbatim, no void
        doc = json.loads(
            sorted(
                export_to_iceberg(to).glob("v*.metadata.json")
            )[-1].read_text()
        )
        spec_fields = doc["partition-specs"][0]["fields"]
        exported_ok = (
            len(spec_fields) == 1
            and spec_fields[0]["transform"] == "bucket[16]"
        )
        # external-reader pruning rule: every manifest partition tuple
        # is the spec-exact murmur3 of the keys in its hive dir
        tuples_ok = all(
            f["partition"]["o_orderkey_bucket"]
            == f["path"].split("_p_o_orderkey_bucket=")[1].split("/")[0]
            for s in to.snapshots
            for f in s.files
        )
        dl, do = tl.to_df(spark), to.to_df(spark)
        joined = dl.join(do, dl.l_orderkey == do.o_orderkey)
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            out = (
                joined.groupBy("o_orderpriority")
                .agg(
                    F.count(F.lit(1)).alias("n_items"),
                    F.round(
                        F.sum(
                            F.col("l_extendedprice").cast("decimal(18,4)")
                            * (1 - F.col("l_discount").cast("decimal(18,4)"))
                        ).cast("double"),
                        6,
                    ).alias("revenue"),
                )
                .withColumn("spec_exported_verbatim", F.lit(exported_ok))
                .withColumn("tuples_spec_exact", F.lit(tuples_ok))
            )
            # materialize before the temp dir vanishes (bounded agg)
            rows = out.collect()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        return spark.createDataFrame(rows, out.schema)
