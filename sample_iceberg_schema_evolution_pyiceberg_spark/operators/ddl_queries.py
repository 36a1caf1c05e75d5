"""Driver-gate queries for the SQL DDL front-end (ddl.py) and the
Iceberg v1 exporter (iceberg_export.py): both run their full pipeline
in a scratch warehouse and emit deterministic, oracle-checkable rows.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..ddl import DdlFrontend
from ..iceberg_export import export_to_iceberg, read_iceberg_table
from ..schema_diff import flatten
from ..table_format import LakeCatalog, TableFormatError
from ..partitioning import PartitionField, PartitionSpec
from .evolution_queries import _type_name
from .registry import query, t

GOLDEN_CREATE_V1 = """
CREATE TABLE customer_order.orders (
    order_time TIMESTAMP_NTZ,
    customer_name STRING,
    address STRUCT<city: STRING, state: STRING>,
    order_items ARRAY<STRUCT<item_id: STRING NOT NULL,
                             price: FLOAT NOT NULL>> NOT NULL
) PARTITIONED BY (year(order_time))
"""

GOLDEN_ALTER_V2 = [
    "ALTER TABLE customer_order.orders ADD COLUMN order_id STRING",
    "ALTER TABLE customer_order.orders ALTER COLUMN order_id FIRST",
    "ALTER TABLE customer_order.orders ADD COLUMN address.address_line STRING",
    "ALTER TABLE customer_order.orders ALTER COLUMN address.address_line FIRST",
    "ALTER TABLE customer_order.orders ADD COLUMN address.zip STRING",
    "ALTER TABLE customer_order.orders "
    "ADD COLUMN order_items.element.item_count INT NOT NULL",
    "ALTER TABLE customer_order.orders "
    "ALTER COLUMN order_items.element.item_count AFTER item_id",
    "ALTER TABLE customer_order.orders DROP PARTITION FIELD year(order_time)",
    "ALTER TABLE customer_order.orders ADD PARTITION FIELD month(order_time)",
]


@query(
    "a09_sql_ddl_episode",
    # same expected end state as a01 — the episode is the reference's
    # golden v1->v2 evolution, here driven purely by SQL strings
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
      ('order_items.element.price', 'float', 0),
      ('_partition', 'order_time month', 0)
    ) AS s(column_path, type_name, is_nullable)
    """,
)
def a09_sql_ddl_episode(spark: SparkSession, sf: str) -> DataFrame:
    """The golden v1->v2 evolution episode driven purely through the
    SQL DDL front-end (CREATE, nested ADD COLUMN incl. array-element
    struct, FIRST/AFTER reorder, partition-field swap); emits the final
    schema paths plus a `_partition` row carrying the evolved spec."""
    with tempfile.TemporaryDirectory(prefix="ddl_gate_") as wh:
        ddl = DdlFrontend(spark, LakeCatalog(wh))
        for stmt in [GOLDEN_CREATE_V1, *GOLDEN_ALTER_V2]:
            r = ddl.sql(stmt)
            assert not r.has_error, (stmt, r.message_list)
        table = ddl.catalog.load_table("customer_order", "orders")
        rows = [
            (path, _type_name(ff.dtype), 0 if ff.required else 1)
            for path, ff in flatten(table.schema).items()
        ]
        rows.append(
            (
                "_partition",
                " ".join(
                    f"{f.source_column} {f.transform}"
                    for f in table.partition_spec.fields
                ),
                0,
            )
        )
    return spark.createDataFrame(
        rows, "column_path string, type_name string, is_nullable int"
    )


@query(
    "a10_iceberg_export_roundtrip",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 6)
             AS total
    FROM orders WHERE o_orderkey <= 4000
    GROUP BY o_orderstatus
    """,
)
def a10_iceberg_export_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Write orders into a partitioned lake table (two snapshot
    appends), export Iceberg v1 metadata (manifests via the pure-Python
    Avro writer), then read the table back EXTERNALLY — file list taken
    from the manifests as decoded by the JVM's Apache Avro library, not
    from the engine's own metadata — and aggregate. The oracle reads
    the original parquet: export + external read must lose nothing."""
    src = t(spark, sf, "orders").filter(F.col("o_orderkey") <= 4000)
    with tempfile.TemporaryDirectory(prefix="ice_gate_") as wh:
        cat = LakeCatalog(wh)
        table = cat.create_table(
            "gate",
            "orders_ice",
            src.schema,
            # year transform: a handful of partition dirs at gate scale
            # (month would mean ~60 dirs of 2k rows — file-count, not
            # fidelity; the month path is covered by a03)
            partition_spec=PartitionSpec(
                (PartitionField("o_orderdate", "year", "o_orderdate_year", 1000),)
            ),
        )
        # gate-scale write hygiene: one task per append (2k rows) so the
        # month-partitioned layout is file-per-partition-value, not
        # file-per-(task, value) — same pattern a cluster writer uses
        # (repartition by partition key before write)
        table.append(src.filter(F.col("o_orderkey") <= 2000).repartition(1))
        table.append(src.filter(F.col("o_orderkey") > 2000).repartition(1))
        export_to_iceberg(table)
        external, _doc = read_iceberg_table(spark, table.location)
        out = (
            external.groupBy("o_orderstatus")
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
        # materialize before the temp dir vanishes (bounded: grouped agg)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)


@query(
    "a11_sql_dml_episode",
    oracle="""
    WITH base AS (
      SELECT o_orderkey AS k, o_orderstatus AS status,
             o_totalprice AS total
      FROM orders WHERE o_orderkey <= 1000
    ), upd AS (
      SELECT k, status,
             CASE WHEN status = 'O' THEN total * 1.1 ELSE total END AS total
      FROM base
    ), del AS (
      SELECT * FROM upd WHERE k % 7 <> 0
    ), merged AS (
      SELECT k,
             CASE WHEN k = 1 THEN 'X' ELSE status END AS status,
             CASE WHEN k = 1 THEN 0.0 ELSE total END AS total
      FROM del
      UNION ALL SELECT 1000001, 'N', 42.0
    )
    SELECT status, COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(total AS DECIMAL(18,6))) AS DOUBLE), 6)
             AS total
    FROM merged GROUP BY status
    """,
)
def a11_sql_dml_episode(spark: SparkSession, sf: str) -> DataFrame:
    """Full DML episode through the SQL front-end: CTAS seed, UPDATE
    with expression, DELETE, MERGE (matched update + unmatched insert),
    then an aggregated read — the oracle replays the same mutations
    relationally. Copy-on-write snapshots all the way down."""
    src = (
        t(spark, sf, "orders")
        .filter(F.col("o_orderkey") <= 1000)
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").alias("total"),
        )
    )
    src.createOrReplaceTempView("a11_src")
    with tempfile.TemporaryDirectory(prefix="dml_gate_") as wh:
        ddl = DdlFrontend(spark, LakeCatalog(wh))
        stmts = [
            "CREATE TABLE gate.dml AS SELECT * FROM a11_src",
            "UPDATE gate.dml SET total = total * 1.1 WHERE status = 'O'",
            "DELETE FROM gate.dml WHERE k % 7 = 0",
            "MERGE INTO gate.dml USING "
            "(SELECT * FROM VALUES (1, 'X', 0.0), (1000001, 'N', 42.0) "
            " AS m(k, status, total)) ON (k) "
            "WHEN MATCHED THEN UPDATE SET status = s_status, total = s_total "
            "WHEN NOT MATCHED THEN INSERT",
        ]
        for s in stmts:
            r = ddl.sql(s)
            assert not r.has_error, (s, r.message_list)
        out = ddl.query(
            "SELECT status, COUNT(*) AS n, "
            "ROUND(CAST(SUM(CAST(total AS DECIMAL(18,6))) AS DOUBLE), 6) "
            "AS total FROM gate.dml GROUP BY status"
        )
        # materialize before the temp dir vanishes (bounded: grouped agg)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)


@query(
    "a12_sql_merge_conditional",
    oracle="""
    WITH tgt AS (
      SELECT o_orderkey AS k, o_orderstatus AS status,
             o_totalprice AS total
      FROM orders WHERE o_orderkey <= 600
    ), src AS (
      SELECT o_orderkey AS k, o_totalprice * 2 AS amount
      FROM orders WHERE o_orderkey BETWEEN 301 AND 900
    ), m AS (
      SELECT t.k, t.status, t.total, s.amount,
             s.k IS NOT NULL AS hit
      FROM tgt t LEFT JOIN src s ON t.k = s.k
    ), kept AS (
      /* first-match-wins replay: c1 delete (total >= 300000),
         c2 update total (status = 'O'), c3 update status (else) */
      SELECT k,
             CASE WHEN hit AND NOT (total >= 300000)
                       AND NOT (status = 'O') THEN 'M'
                  ELSE status END AS status,
             CASE WHEN hit AND NOT (total >= 300000)
                       AND status = 'O' THEN amount
                  ELSE total END AS total
      FROM m WHERE NOT (hit AND total >= 300000)
    ), ins AS (
      SELECT s.k, 'I' AS status, s.amount / 2 AS total
      FROM src s LEFT JOIN tgt t ON s.k = t.k
      WHERE t.k IS NULL AND s.amount < 400000
    ), final AS (
      SELECT * FROM kept UNION ALL SELECT * FROM ins
    )
    SELECT status, COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(total AS DECIMAL(18,6))) AS DOUBLE), 6)
             AS total
    FROM final GROUP BY status
    """,
)
def a12_sql_merge_conditional(spark: SparkSession, sf: str) -> DataFrame:
    """Conditional MERGE surface end-to-end (round-5 grammar): multiple
    WHEN MATCHED [AND cond] clauses with first-match-wins, plus a
    conditional column-list INSERT ... VALUES with null-free mapping.
    The oracle replays the same clause cascade relationally (CASE over
    disjoint branch conditions + filtered anti-join insert)."""
    tgt = (
        t(spark, sf, "orders")
        .filter(F.col("o_orderkey") <= 600)
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").alias("total"),
        )
    )
    src = (
        t(spark, sf, "orders")
        .filter(F.col("o_orderkey").between(301, 900))
        .select(
            F.col("o_orderkey").alias("k"),
            (F.col("o_totalprice") * 2).alias("amount"),
        )
    )
    tgt.createOrReplaceTempView("a12_tgt")
    src.createOrReplaceTempView("a12_src")
    with tempfile.TemporaryDirectory(prefix="merge_gate_") as wh:
        ddl = DdlFrontend(spark, LakeCatalog(wh))
        stmts = [
            "CREATE TABLE gate.m AS SELECT * FROM a12_tgt",
            "MERGE INTO gate.m USING (SELECT * FROM a12_src) ON (k) "
            "WHEN MATCHED AND total >= 300000 THEN DELETE "
            "WHEN MATCHED AND status = 'O' THEN UPDATE SET total = s_amount "
            "WHEN MATCHED THEN UPDATE SET status = 'M' "
            "WHEN NOT MATCHED AND amount < 400000 THEN INSERT "
            "(k, status, total) VALUES (k, 'I', amount / 2)",
        ]
        for s in stmts:
            r = ddl.sql(s)
            assert not r.has_error, (s, r.message_list)
        out = ddl.query(
            "SELECT status, COUNT(*) AS n, "
            "ROUND(CAST(SUM(CAST(total AS DECIMAL(18,6))) AS DOUBLE), 6) "
            "AS total FROM gate.m GROUP BY status"
        )
        # materialize before the temp dir vanishes (bounded: grouped agg)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)


@query(
    "a14_metadata_tables",
    oracle="""
    SELECT 'append' AS metric, 3 AS val
    UNION ALL SELECT 'replace', 1
    UNION ALL SELECT 'files_records',
      (SELECT COUNT(*) FROM orders WHERE o_orderkey <= 1500)
    """,
)
def a14_metadata_tables(spark: SparkSession, sf: str) -> DataFrame:
    """Iceberg-style metadata tables through the SQL surface:
    ``db.tbl.snapshots`` (the commit log, liveness + tombstones) and
    ``db.tbl.files`` (live file inventory with footer row counts).
    Three appends then a compaction: the snapshot log must show 3
    history appends + 1 live replace (compaction's content-preserving
    Iceberg summary label), and the file inventory's
    record_count sum must equal the table's rows — tying the
    metadata-table view to the data it describes."""
    o = t(spark, sf, "orders").filter(F.col("o_orderkey") <= 1500)
    with tempfile.TemporaryDirectory(prefix="meta_gate_") as wh:
        cat = LakeCatalog(wh)
        table = cat.create_table("gate", "md", o.schema)
        for lo, hi in ((0, 500), (501, 1000), (1001, 1500)):
            table.append(o.filter(F.col("o_orderkey").between(lo, hi)))
        table.compact(spark)
        fe = DdlFrontend(spark, cat)
        snaps = fe.query(
            "SELECT operation AS metric, COUNT(*) AS val "
            "FROM gate.md.snapshots GROUP BY operation"
        )
        files = fe.query(
            "SELECT 'files_records' AS metric, SUM(record_count) AS val "
            "FROM gate.md.files"
        )
        out = snaps.unionByName(files).select(
            "metric", F.col("val").cast("long").alias("val")
        )
        rows = out.collect()
        # materialize before the temp dir vanishes
        return spark.createDataFrame(rows, out.schema)


@query(
    "a15_sql_rollback_episode",
    oracle="""
    SELECT 'ts_of_first' AS step, COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 6)
             AS total
    FROM orders WHERE o_orderkey <= 500
    UNION ALL
    SELECT 'after_rollback', COUNT(*),
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 6)
    FROM orders WHERE o_orderkey <= 1000
    """,
)
def a15_sql_rollback_episode(spark: SparkSession, sf: str) -> DataFrame:
    """Rollback + timestamp travel through the SQL surface: three
    INSERT batches, read the first batch back via TIMESTAMP AS OF its
    commit instant, then CALL system.rollback_to_snapshot to batch 2 —
    the current read must equal batches 1+2 exactly (batch 3's fork
    destroyed, per the documented destructive-rollback semantics).
    Oracle computes both states relationally from the source parquet."""
    o = t(spark, sf, "orders").filter(F.col("o_orderkey") <= 1500)
    with tempfile.TemporaryDirectory(prefix="rb_gate_") as wh:
        cat = LakeCatalog(wh)
        table = cat.create_table("gate", "rb", o.schema)
        for lo, hi in ((0, 500), (501, 1000), (1001, 1500)):
            table.append(o.filter(F.col("o_orderkey").between(lo, hi)))
        fe = DdlFrontend(spark, cat)
        s = cat.load_table("gate", "rb").snapshots

        def agg(from_clause: str, step: str) -> DataFrame:
            return fe.query(
                f"SELECT '{step}' AS step, COUNT(*) AS n, "
                "ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) "
                "AS DOUBLE), 6) AS total "
                f"FROM {from_clause}"
            )

        ts_read = agg(
            f"gate.rb TIMESTAMP AS OF '{s[0].timestamp_ms}'", "ts_of_first"
        )
        r = fe.sql(
            "CALL system.rollback_to_snapshot('gate.rb', "
            f"snapshot_id => '{s[1].snapshot_id}')"
        )
        assert not r.has_error, r.message_list
        out = ts_read.unionByName(agg("gate.rb", "after_rollback"))
        rows = out.collect()
        # materialize before the temp dir vanishes
        return spark.createDataFrame(rows, out.schema)


@query(
    "a16_merge_on_read_delete",
    oracle="""
    WITH b12 AS (SELECT * FROM orders WHERE o_orderkey <= 1000),
         d AS (SELECT * FROM b12 WHERE NOT (o_orderstatus = 'F')),
         b3 AS (SELECT * FROM orders
                WHERE o_orderkey BETWEEN 1001 AND 1500),
         a AS (SELECT * FROM d UNION ALL SELECT * FROM b3)
    SELECT 'after_delete' AS step, COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 6)
             AS total
    FROM d
    UNION ALL SELECT 'after_append', COUNT(*),
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 6)
    FROM a
    UNION ALL SELECT 'after_compact', COUNT(*),
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 6)
    FROM a
    """,
)
def a16_merge_on_read_delete(spark: SparkSession, sf: str) -> DataFrame:
    """Merge-on-read DELETE episode through the SQL surface: two
    INSERT batches, write.delete.mode flipped to merge-on-read, a
    predicate DELETE (O(metadata) — nothing rewritten), an append the
    predicate must NOT touch, then compact() folding the predicate
    into data. All three reads hash-match a relational replay — the
    delete-without-rewrite path is exactly as correct as the
    copy-on-write one."""
    o = t(spark, sf, "orders").filter(F.col("o_orderkey") <= 1500)
    with tempfile.TemporaryDirectory(prefix="mor_gate_") as wh:
        cat = LakeCatalog(wh)
        table = cat.create_table("gate", "mor", o.schema)
        table.append(o.filter(F.col("o_orderkey") <= 500))
        table.append(o.filter(F.col("o_orderkey").between(501, 1000)))
        fe = DdlFrontend(spark, cat)
        r = fe.sql(
            "ALTER TABLE gate.mor SET TBLPROPERTIES "
            "('write.delete.mode' = 'merge-on-read')"
        )
        assert not r.has_error, r.message_list
        r = fe.sql("DELETE FROM gate.mor WHERE o_orderstatus = 'F'")
        assert not r.has_error and "merge_on_read" in r.message_list[-1]
        table = cat.load_table("gate", "mor")
        assert any(s.delete_predicate for s in table.snapshots)

        def agg(step: str) -> DataFrame:
            return fe.query(
                f"SELECT '{step}' AS step, COUNT(*) AS n, "
                "ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) "
                "AS DOUBLE), 6) AS total FROM gate.mor"
            )

        steps = [agg("after_delete")]
        table.append(o.filter(F.col("o_orderkey").between(1001, 1500)))
        steps.append(agg("after_append"))
        fe.sql("CALL system.rewrite_data_files('gate.mor')")
        assert all(
            s.delete_predicate is None
            for s in cat.load_table("gate", "mor").snapshots
        )
        steps.append(agg("after_compact"))
        out = steps[0]
        for s_df in steps[1:]:
            out = out.unionByName(s_df)
        rows = out.collect()
        # materialize before the temp dir vanishes
        return spark.createDataFrame(rows, out.schema)


@query(
    "a17_merge_on_read_merge",
    oracle="""
    SELECT 'after_merge' AS step, COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 6)
             AS total,
           CAST(SUM(CASE WHEN o_orderkey BETWEEN 501 AND 1000
               THEN 1 ELSE 0 END) AS BIGINT) AS n_merged
    FROM orders WHERE o_orderkey <= 1500
    UNION ALL
    SELECT 'after_append', COUNT(*),
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 6),
           CAST(SUM(CASE WHEN o_orderkey BETWEEN 501 AND 1000
                    THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders WHERE o_orderkey <= 2000
    UNION ALL
    SELECT 'after_compact', COUNT(*),
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 6),
           CAST(SUM(CASE WHEN o_orderkey BETWEEN 501 AND 1000
                    THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders WHERE o_orderkey <= 2000
    """,
)
def a17_merge_on_read_merge(spark: SparkSession, sf: str) -> DataFrame:
    """Merge-on-read MERGE episode through the SQL surface
    (``write.merge.mode=merge-on-read`` — Iceberg v2's equality-delete
    bulk-upsert path): two INSERT batches (keys <=1000), then MERGE
    from a source spanning 501-1500 — matched keys 501-1000 get
    o_orderstatus='M', unmatched 1001-1500 insert — committed as ONE
    equality-delete key file + ONE append (write cost follows the
    batch, nothing rewritten). An append of keys 1501-2000 afterwards
    must be untouched by the mask; compact() folds the key mask into
    data. All three reads hash-match a relational replay (the oracle
    counts merged rows BY KEY RANGE, the engine counts them BY THE
    'M' FLAG — they agree only if the mask+append pair behaved)."""
    o = t(spark, sf, "orders").filter(F.col("o_orderkey") <= 2000)
    with tempfile.TemporaryDirectory(prefix="mor_merge_gate_") as wh:
        cat = LakeCatalog(wh)
        table = cat.create_table("gate", "mm", o.schema)
        table.append(o.filter(F.col("o_orderkey") <= 500))
        table.append(o.filter(F.col("o_orderkey").between(501, 1000)))
        fe = DdlFrontend(spark, cat)
        r = fe.sql(
            "ALTER TABLE gate.mm SET TBLPROPERTIES "
            "('write.merge.mode' = 'merge-on-read')"
        )
        assert not r.has_error, r.message_list
        o.filter(F.col("o_orderkey").between(501, 1500)) \
            .createOrReplaceTempView("a17_merge_src")
        r = fe.sql(
            "MERGE INTO gate.mm USING "
            "(SELECT * FROM a17_merge_src) ON (o_orderkey) "
            "WHEN MATCHED THEN UPDATE SET o_orderstatus = 'M' "
            "WHEN NOT MATCHED THEN INSERT"
        )
        assert not r.has_error and "merge_on_read" in r.message_list[-1]
        table = cat.load_table("gate", "mm")
        assert any(s.delete_keys_dir for s in table.snapshots)

        def agg(step: str) -> DataFrame:
            return fe.query(
                f"SELECT '{step}' AS step, COUNT(*) AS n, "
                "ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) "
                "AS DOUBLE), 6) AS total, "
                "SUM(CASE WHEN o_orderstatus = 'M' THEN 1 ELSE 0 END) "
                "AS n_merged FROM gate.mm"
            )

        steps = [agg("after_merge")]
        table.append(o.filter(F.col("o_orderkey").between(1501, 2000)))
        steps.append(agg("after_append"))
        fe.sql("CALL system.rewrite_data_files('gate.mm')")
        assert all(
            not s.is_row_delete
            for s in cat.load_table("gate", "mm").snapshots
        )
        steps.append(agg("after_compact"))
        out = steps[0]
        for s_df in steps[1:]:
            out = out.unionByName(s_df)
        rows = out.collect()
        # materialize before the temp dir vanishes
        return spark.createDataFrame(rows, out.schema)


@query(
    "a18_merge_on_read_export",
    oracle="""
    WITH base AS (
      SELECT o_orderkey AS k, o_orderstatus AS status,
             CAST(o_totalprice AS DECIMAL(18,4)) AS total
      FROM orders WHERE o_orderkey <= 1000
    ), kept AS (
      SELECT * FROM base WHERE NOT (status = 'F')
    ), src AS (
      SELECT o_orderkey AS k, o_orderstatus AS status,
             CAST(o_totalprice AS DECIMAL(18,4)) AS total
      FROM orders WHERE o_orderkey BETWEEN 501 AND 1500
    ), updated AS (
      SELECT k,
             CASE WHEN k BETWEEN 501 AND 1000 THEN 'M' ELSE status END
               AS status,
             total
      FROM kept
    ), inserted AS (
      SELECT s.* FROM src s WHERE s.k NOT IN (SELECT k FROM kept)
    ), final AS (
      SELECT * FROM updated UNION ALL SELECT * FROM inserted
    )
    SELECT status, COUNT(*) AS n,
           ROUND(CAST(SUM(total) AS DOUBLE), 6) AS total
    FROM final GROUP BY status
    """,
)
def a18_merge_on_read_export(spark: SparkSession, sf: str) -> DataFrame:
    """Iceberg **v2** export episode: a lake table carrying BOTH
    merge-on-read delete granularities — a predicate DELETE (exports
    as position-delete files computed from ``_metadata`` row ordinals)
    and an equality-key MERGE mask (exports as equality-delete files
    with ``equality_ids``) — exports as spec v2 instead of refusing,
    and is read back EXTERNALLY: file lists, delete files, and
    sequence-number applicability all come from the exported manifests
    as decoded by the JVM's Apache Avro library, never from the
    engine's own ``_meta``. The oracle replays the DELETE + MERGE
    relationally; a hash match proves export + external read lose
    nothing at either delete granularity. (Reference interop promise:
    external engines open the tables —
    /root/reference/lambda/iceberg_helper.py:104-122.)"""
    o = (
        t(spark, sf, "orders")
        .filter(F.col("o_orderkey") <= 1500)
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").alias("total"),
        )
    )
    with tempfile.TemporaryDirectory(prefix="mor_export_gate_") as wh:
        cat = LakeCatalog(wh)
        table = cat.create_table("gate", "me", o.schema)
        table.append(o.filter(F.col("k") <= 500))
        table.append(o.filter(F.col("k").between(501, 1000)))
        table.delete_where(spark, "status = 'F'", strategy="merge_on_read")
        table.merge_into(
            spark,
            o.filter(F.col("k").between(501, 1500)),
            ["k"],
            when_matched_update={"status": "'M'"},
            strategy="merge_on_read",
        )
        assert any(s.delete_predicate for s in table.snapshots)
        assert any(s.delete_keys_dir for s in table.snapshots)
        export_to_iceberg(table, spark=spark)
        external, doc = read_iceberg_table(spark, table.location)
        assert doc["format-version"] == 2, doc["format-version"]
        out = external.groupBy("status").agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("total").cast("decimal(18,4)")).cast("double"),
                6,
            ).alias("total"),
        )
        # materialize before the temp dir vanishes (bounded: grouped agg)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)


@query(
    "a19_glue_catalog_episode",
    # the episode's data outcome is a plain filter-append replay; the
    # audit columns pin the CATALOG protocol: exactly one losing
    # commit (conflicts=1) and a final Glue pointer at v4
    # (create=1, append=2, evolve=3, post-conflict append=4 — the
    # rejected commit must NOT consume a version)
    oracle="""
    SELECT status, COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                 AS DOUBLE), 6) AS total,
           1 AS conflicts, 4 AS ptr_version
    FROM (SELECT o_orderstatus AS status, o_totalprice
          FROM orders WHERE o_orderkey <= 1200)
    GROUP BY status
    """,
)
def a19_glue_catalog_episode(spark: SparkSession, sf: str) -> DataFrame:
    """Glue catalog-of-record episode (the reference's deployed
    posture: Glue catalog + S3 warehouse,
    /root/reference/lambda/iceberg_helper.py:104-112): create a table
    through GlueLakeCatalog over a real-boto3 S3 metadata backend
    (moto in-process), append, evolve the schema, lose a CAS race on a
    stale handle (ConcurrentCommitError; Glue pointer and store hint
    both unmoved by the rejected commit), refresh + retry, append
    again — then load the final state through the Glue POINTER alone
    and aggregate it. A hash match proves the catalog protocol loses
    no rows and the pointer advances exactly once per real commit."""
    import moto  # noqa: PLC0415 — optional dependency, import-gated

    import boto3  # noqa: PLC0415

    from ..fileio import ObjectStoreFileIO, S3ObjectStore  # noqa: PLC0415
    from ..glue_catalog import (  # noqa: PLC0415
        ConcurrentCommitError,
        GlueLakeCatalog,
    )

    o = (
        t(spark, sf, "orders")
        .filter(F.col("o_orderkey") <= 1200)
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").alias("total"),
        )
    )
    with tempfile.TemporaryDirectory(prefix="glue_gate_") as wh, \
            moto.mock_aws():
        boto3.client("s3", region_name="us-east-1").create_bucket(
            Bucket="gate-meta"
        )
        glue = boto3.client("glue", region_name="us-east-1")
        cat = GlueLakeCatalog(
            wh, io=ObjectStoreFileIO(S3ObjectStore("gate-meta", "wh")),
            glue=glue,
        )
        table = cat.create_table("gate", "g", o.schema)          # v1
        table.append(o.filter(F.col("k") <= 600))                # v2
        stale = cat.load_table("gate", "g")  # handle at v2
        evolved = T.StructType(
            [*o.schema.fields, T.StructField("flag", T.DoubleType(), True)]
        )
        table.commit_schema(evolved)                             # v3
        conflicts = 0
        try:
            stale.commit_schema(evolved)  # stale handle: must lose
        except ConcurrentCommitError:
            conflicts += 1
        fresh = cat.load_table("gate", "g")  # refresh-and-retry path
        fresh.append(                                            # v4
            o.filter(F.col("k") > 600).withColumn(
                "flag", F.lit(None).cast("double")
            )
        )
        ptr = glue.get_table(DatabaseName="gate", Name="g")["Table"][
            "Parameters"
        ]["metadata_location"]
        # pointer names are writer-unique (v{N}-{uuid}.metadata.json)
        import re  # noqa: PLC0415

        ptr_version = int(re.search(r"/v(\d+)[-.]", ptr).group(1))
        final = cat.load_table("gate", "g").to_df(spark)
        out = final.groupBy("status").agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("total").cast("decimal(18,4)")).cast("double"),
                6,
            ).alias("total"),
        ).withColumn("conflicts", F.lit(conflicts)).withColumn(
            "ptr_version", F.lit(ptr_version)
        )
        # materialize before the temp dir + mock vanish (bounded agg)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)


@query(
    "a20_pruned_scan_episode",
    # data outcome is a plain filter replay; `pruned_fewer` pins that
    # the manifest bounds actually removed files from the plan (the
    # sorted 8-file layout guarantees a k<=800 scan skips some file)
    oracle="""
    SELECT o_orderstatus AS status, COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                 AS DOUBLE), 6) AS total,
           TRUE AS pruned_fewer
    FROM orders WHERE o_orderkey <= 3000 AND o_orderkey <= 800
    GROUP BY status
    """,
)
def a20_pruned_scan_episode(spark: SparkSession, sf: str) -> DataFrame:
    """Manifest-level scan planning episode: append, sorted rewrite
    (rewrite_data_files with sort_by + target_files — the maintenance
    op that range-clusters the layout), then a pruned scan whose
    simple predicate is answered from commit-time file bounds. The
    hashed output carries the grouped aggregate of the PRUNED scan
    (proving no row was lost or duplicated by reading an explicit file
    subset) plus a flag that the plan really touched fewer files than
    the full scan (proving the bounds engaged). Iceberg analog:
    manifest lower/upper bound file skipping after rewrite_data_files
    with a sort order."""
    o = (
        t(spark, sf, "orders")
        .filter(F.col("o_orderkey") <= 3000)
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").alias("total"),
        )
    )
    with tempfile.TemporaryDirectory(prefix="prune_gate_") as wh:
        cat = LakeCatalog(wh)
        table = cat.create_table("gate", "pz", o.schema)
        table.append(o)
        table.compact(spark, sort_by=["k"], target_files=8)
        full = table.to_df(spark)
        pruned = table.to_df(spark, pruning=[("k", "<=", 800)])
        fewer = len(pruned.inputFiles()) < len(full.inputFiles())
        out = pruned.groupBy("status").agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("total").cast("decimal(18,4)")).cast("double"),
                6,
            ).alias("total"),
        ).withColumn("pruned_fewer", F.lit(fewer))
        # materialize before the temp dir vanishes (bounded agg)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)


@query(
    "a21_snapshot_tags_episode",
    oracle="""
    SELECT 'tagged' AS state, COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                 AS DOUBLE), 6) AS total
    FROM orders WHERE o_orderkey <= 900
    UNION ALL
    SELECT 'current', COUNT(*),
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                 AS DOUBLE), 6)
    FROM orders WHERE o_orderkey <= 1800
    """,
)
def a21_snapshot_tags_episode(spark: SparkSession, sf: str) -> DataFrame:
    """Snapshot-tag episode (Iceberg refs, tag type): append, CREATE
    TAG through SQL, append again, then read both VERSION AS OF
    'tag-name' (resolving the ref) and the current state — after a
    compaction and an age-blind expire_snapshots pass that the tagged
    snapshot must SURVIVE (refs pin their snapshots). The hashed
    output replays both states relationally: a match proves tag
    resolution, ref retention, and current reads all serve exact
    rows."""
    o = (
        t(spark, sf, "orders")
        .filter(F.col("o_orderkey") <= 1800)
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").alias("total"),
        )
    )
    with tempfile.TemporaryDirectory(prefix="tags_gate_") as wh:
        cat = LakeCatalog(wh)
        fe = DdlFrontend(spark, cat)
        table = cat.create_table("gate", "tz", o.schema)
        table.append(o.filter(F.col("k") <= 900))
        r = fe.sql("ALTER TABLE gate.tz CREATE TAG cut")
        assert not r.has_error, r.message_list
        table.refresh().append(o.filter(F.col("k") > 900))
        table.refresh().compact(spark)
        # age-blind expiration: everything unpinned goes; the tag holds
        table.refresh().expire_snapshots(older_than_ms=2**62)
        agg = lambda df, label: df.agg(  # noqa: E731
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("total").cast("decimal(18,4)")).cast("double"),
                6,
            ).alias("total"),
        ).select(F.lit(label).alias("state"), "n", "total")
        tagged = fe.query("SELECT * FROM gate.tz VERSION AS OF 'cut'")
        out = agg(tagged, "tagged").unionByName(
            agg(fe.query("SELECT * FROM gate.tz"), "current")
        )
        # materialize before the temp dir vanishes (bounded agg)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)


@query(
    "a22_write_audit_publish",
    oracle="""
    SELECT 'main_during_audit' AS state, COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                 AS DOUBLE), 6) AS total
    FROM orders WHERE o_orderkey <= 700
    UNION ALL
    SELECT 'branch_during_audit', COUNT(*),
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                 AS DOUBLE), 6)
    FROM orders WHERE o_orderkey <= 1400
    UNION ALL
    SELECT 'after_publish', COUNT(*),
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                 AS DOUBLE), 6)
    FROM orders WHERE o_orderkey <= 1400
    """,
)
def a22_write_audit_publish(spark: SparkSession, sf: str) -> DataFrame:
    """Write-audit-publish episode over staging branches: stage an
    append on a branch (SQL CREATE BRANCH; engine append), audit both
    states — main must NOT see the staged rows, the branch must — then
    publish via CALL system.fast_forward and read main again. The
    oracle replays the three states relationally; a hash match proves
    staged isolation, audit-read fidelity, and lossless publication
    (Iceberg's WAP workflow: branch ref + fast_forward procedure)."""
    o = (
        t(spark, sf, "orders")
        .filter(F.col("o_orderkey") <= 1400)
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").alias("total"),
        )
    )
    with tempfile.TemporaryDirectory(prefix="wap_gate_") as wh:
        cat = LakeCatalog(wh)
        fe = DdlFrontend(spark, cat)
        table = cat.create_table("gate", "wp", o.schema)
        table.append(o.filter(F.col("k") <= 700))
        r = fe.sql("ALTER TABLE gate.wp CREATE BRANCH audit")
        assert not r.has_error, r.message_list
        table.refresh().append(o.filter(F.col("k") > 700), branch="audit")

        def agg(df, label):
            return df.agg(
                F.count(F.lit(1)).alias("n"),
                F.round(
                    F.sum(
                        F.col("total").cast("decimal(18,4)")
                    ).cast("double"),
                    6,
                ).alias("total"),
            ).select(F.lit(label).alias("state"), "n", "total")

        table.refresh()
        out = agg(table.to_df(spark), "main_during_audit")
        out = out.unionByName(
            agg(table.to_df(spark, branch="audit"), "branch_during_audit")
        )
        r = fe.sql("CALL system.fast_forward('gate.wp', branch => 'audit')")
        assert not r.has_error, r.message_list
        out = out.unionByName(
            agg(cat.load_table("gate", "wp").to_df(spark), "after_publish")
        )
        # materialize before the temp dir vanishes (bounded agg)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)


@query(
    "a23_zorder_clustering_episode",
    # data outcome is a plain filter replay (rewrite invariance: the
    # z-ordered layout lost/duplicated nothing); the two flags pin that
    # the manifest bounds engaged on BOTH clustered dimensions —
    # including the TRAILING one, which a lexicographic sort_by layout
    # cannot prune (z-order's whole point; the layout puts the trailing
    # column's bin MSB at the top interleave bit, so a low-range
    # predicate on it always excludes the upper z-range files)
    oracle="""
    SELECT o_orderstatus AS status, COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                 AS DOUBLE), 6) AS total,
           TRUE AS pruned_lead, TRUE AS pruned_trail
    FROM orders WHERE o_orderkey <= 3000 AND o_orderkey <= 700
    GROUP BY status
    """,
)
def a23_zorder_clustering_episode(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-dimensional clustering episode (Delta OPTIMIZE ZORDER BY /
    Iceberg rewrite_data_files z-order strategy, which the reference's
    PyIceberg control plane leaves to table maintenance —
    /root/reference/lambda/iceberg_helper.py manages layout only via
    partition specs): append an unclustered layout, rewrite with
    ``compact(cluster_by=[ck, k])`` (interleaved-bit z-value from
    one-pass sampled equi-depth bins, table_format._zorder_column),
    then prune on EACH clustered dimension separately. The hashed
    output carries the grouped aggregate of the trailing-dimension
    pruned scan — proving the explicit file subset lost no rows — plus
    per-dimension pruned-fewer flags proving the bounds engaged."""
    o = (
        t(spark, sf, "orders")
        .filter(F.col("o_orderkey") <= 3000)
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_custkey").alias("ck"),
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").alias("total"),
        )
    )
    with tempfile.TemporaryDirectory(prefix="zorder_gate_") as wh:
        cat = LakeCatalog(wh)
        table = cat.create_table("gate", "zz", o.schema)
        table.append(o.repartition(8))  # hash layout: nothing prunable
        table.compact(spark, cluster_by=["ck", "k"], target_files=8)
        full = len(table.to_df(spark).inputFiles())
        lead = table.to_df(spark, pruning=[("ck", "<=", 300)])
        trail = table.to_df(spark, pruning=[("k", "<=", 700)])
        out = trail.groupBy("status").agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("total").cast("decimal(18,4)")).cast("double"),
                6,
            ).alias("total"),
        ).withColumn(
            "pruned_lead", F.lit(len(lead.inputFiles()) < full)
        ).withColumn(
            "pruned_trail", F.lit(len(trail.inputFiles()) < full)
        )
        # materialize before the temp dir vanishes (bounded agg)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)


@query(
    "a24_changelog_cdc",
    # the oracle replays each commit's emission relationally: appends
    # emit their batch, the merge-on-read DELETE emits the pre-state
    # rows matching its predicate, and the copy-on-write UPDATE emits
    # netted delete(pre-image)/insert(post-image) pairs under ONE
    # ordinal — carry-over rows (status <> 'O') emit nothing
    oracle="""
    WITH b1 AS (SELECT * FROM orders WHERE o_orderkey <= 500),
         b2 AS (SELECT * FROM orders
                WHERE o_orderkey BETWEEN 501 AND 1000),
         b3 AS (SELECT * FROM orders
                WHERE o_orderkey BETWEEN 1001 AND 1500),
         d AS (SELECT * FROM (SELECT * FROM b1
                              UNION ALL SELECT * FROM b2)
               WHERE o_orderstatus = 'F'),
         live AS (SELECT * FROM (SELECT * FROM b1
                                 UNION ALL SELECT * FROM b2)
                  WHERE NOT (o_orderstatus = 'F')
                  UNION ALL SELECT * FROM b3),
         upd AS (SELECT * FROM live WHERE o_orderstatus = 'O')
    SELECT CAST(0 AS INTEGER) AS ordinal, 'insert' AS change_type,
           COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                 AS DOUBLE), 6) AS total
    FROM b1
    UNION ALL SELECT 1, 'insert', COUNT(*),
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                 AS DOUBLE), 6)
    FROM b2
    UNION ALL SELECT 2, 'delete', COUNT(*),
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                 AS DOUBLE), 6)
    FROM d
    UNION ALL SELECT 3, 'insert', COUNT(*),
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                 AS DOUBLE), 6)
    FROM b3
    UNION ALL SELECT 4, 'delete', COUNT(*),
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                 AS DOUBLE), 6)
    FROM upd
    UNION ALL SELECT 4, 'insert', COUNT(*),
           ROUND(CAST(SUM(CAST(o_totalprice * 2 AS DECIMAL(18,4)))
                 AS DOUBLE), 6)
    FROM upd
    """,
)
def a24_changelog_cdc(spark: SparkSession, sf: str) -> DataFrame:
    """Full CDC changelog episode (``LakeTable.changelog_between`` —
    the Iceberg create_changelog_view / Delta change-data-feed analog;
    the reference's PyIceberg control plane exposes snapshots but no
    row-level change feed, /root/reference/lambda/iceberg_helper.py):
    two appends, a merge-on-read predicate DELETE, a third append, a
    copy-on-write UPDATE — then ONE changelog scan spanning all five
    commits, aggregated per (ordinal, change_type). Hash-checks every
    emission rule at once: append delta scans, pre-state predicate
    complements, and the netted adjacent-state diff (carry-overs
    silent, update as delete+insert under one ordinal)."""
    o = t(spark, sf, "orders").filter(F.col("o_orderkey") <= 1500)
    with tempfile.TemporaryDirectory(prefix="cdc_gate_") as wh:
        cat = LakeCatalog(wh)
        table = cat.create_table("gate", "cdc", o.schema)
        table.append(o.filter(F.col("o_orderkey") <= 500))
        table.append(o.filter(F.col("o_orderkey").between(501, 1000)))
        table.delete_where(
            spark, "o_orderstatus = 'F'", strategy="merge_on_read"
        )
        assert any(s.delete_predicate for s in table.snapshots)
        table.append(o.filter(F.col("o_orderkey").between(1001, 1500)))
        table.update_where(
            spark,
            "o_orderstatus = 'O'",
            {"o_totalprice": "o_totalprice * 2"},
            strategy="copy_on_write",
        )
        log = table.changelog_between(spark)
        out = (
            log.groupBy(
                F.col("_change_ordinal").alias("ordinal"),
                F.col("_change_type").alias("change_type"),
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(
                    F.sum(
                        F.col("o_totalprice").cast("decimal(18,4)")
                    ).cast("double"),
                    6,
                ).alias("total"),
            )
        )
        # materialize before the temp dir vanishes (bounded: <= 6
        # (ordinal, type) groups)
        rows = out.collect()
        # every commit kind must have emitted (TPC-H orderstatus
        # guarantees F and O rows exist in any non-empty slice)
        assert {(r["ordinal"], r["change_type"]) for r in rows} == {
            (0, "insert"), (1, "insert"), (2, "delete"),
            (3, "insert"), (4, "delete"), (4, "insert"),
        }, rows
        return spark.createDataFrame(rows, out.schema)


@query(
    "a25_cdc_replication",
    # the oracle replays the SOURCE's final state relationally — the
    # replica is synced purely from changelog ranges, so equality
    # proves the whole produce->consume CDC loop; the two flag columns
    # pin the O(delta) contract (merge-on-read sync commits, zero
    # replica rewrites)
    oracle="""
    WITH b1 AS (SELECT * FROM orders WHERE o_orderkey <= 700),
         upd AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                        CASE WHEN o_orderstatus = 'O'
                             THEN o_totalprice * 2 ELSE o_totalprice
                        END AS o_totalprice,
                        o_orderdate, o_orderpriority
                 FROM b1),
         d AS (SELECT * FROM upd WHERE NOT (o_orderstatus = 'F')),
         b2 AS (SELECT * FROM orders
                WHERE o_orderkey BETWEEN 701 AND 1200),
         fin AS (SELECT * FROM d UNION ALL SELECT * FROM b2)
    SELECT o_orderstatus AS status, COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                 AS DOUBLE), 6) AS total,
           TRUE AS mor_sync, TRUE AS no_rewrite
    FROM fin GROUP BY status
    """,
)
def a25_cdc_replication(spark: SparkSession, sf: str) -> DataFrame:
    """CDC replication episode — the produce->consume round-trip:
    a source table mutates (append, copy-on-write UPDATE,
    merge-on-read DELETE, append), a replica syncs from TWO
    consecutive ``changelog_between`` ranges via keyed
    ``apply_changelog`` (merge-on-read, O(delta): one equality-delete
    entry + one latest-image-per-key append per sync — the replica's
    live set is never read or rewritten), and the hashed output
    aggregates the REPLICA. Equality with the oracle's relational
    replay of the source proves both halves at once."""
    o = t(spark, sf, "orders").filter(F.col("o_orderkey") <= 1200)
    with tempfile.TemporaryDirectory(prefix="cdcrep_gate_") as wh:
        cat = LakeCatalog(wh)
        src = cat.create_table("gate", "src", o.schema)
        src.append(o.filter(F.col("o_orderkey") <= 700))
        src.update_where(
            spark,
            "o_orderstatus = 'O'",
            {"o_totalprice": "o_totalprice * 2"},
            strategy="copy_on_write",
        )
        mid = src.snapshots[-1]  # sync-1 consumes up to here
        src.delete_where(
            spark, "o_orderstatus = 'F'", strategy="merge_on_read"
        )
        src.append(o.filter(F.col("o_orderkey").between(701, 1200)))
        replica = cat.create_table("gate", "rep", o.schema)
        replica.apply_changelog(
            spark,
            src.changelog_between(spark, to_snapshot=mid.snapshot_id),
            key_cols=["o_orderkey"],
        )
        n_before = len(replica.snapshots)
        replica.apply_changelog(
            spark,
            src.changelog_between(spark, from_snapshot=mid.snapshot_id),
            key_cols=["o_orderkey"],
        )
        synced = replica.snapshots[n_before:]
        mor_sync = any(s.delete_keys_dir for s in synced)
        no_rewrite = all(
            not s.is_rewrite for s in replica.snapshots[1:]
        ) and len(replica.snapshots) >= n_before + 1
        out = (
            replica.to_df(spark)
            .groupBy(F.col("o_orderstatus").alias("status"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(
                    F.sum(
                        F.col("o_totalprice").cast("decimal(18,4)")
                    ).cast("double"),
                    6,
                ).alias("total"),
            )
            .withColumn("mor_sync", F.lit(bool(mor_sync)))
            .withColumn("no_rewrite", F.lit(bool(no_rewrite)))
        )
        # materialize before the temp dir vanishes (bounded agg)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)


@query(
    "a26_scd2_dimension_history",
    # the oracle constructs each interval class directly: every seed
    # row opens at ordinal 0 (closed at 1 by the update if 'O', at 2
    # by the merge-on-read delete if 'F', open otherwise); the update
    # re-opens 'O' rows at ordinal 1 with the doubled price, current
    oracle="""
    WITH b1 AS (SELECT * FROM orders WHERE o_orderkey <= 300)
    SELECT o_orderkey AS k, o_orderstatus AS status,
           ROUND(CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS DOUBLE), 6)
             AS total,
           0 AS valid_from,
           CASE WHEN o_orderstatus = 'O' THEN 1
                WHEN o_orderstatus = 'F' THEN 2 END AS valid_to,
           o_orderstatus NOT IN ('O', 'F') AS is_current
    FROM b1
    UNION ALL
    SELECT o_orderkey, o_orderstatus,
           ROUND(CAST(CAST(o_totalprice * 2 AS DECIMAL(18,4))
                 AS DOUBLE), 6),
           1, NULL, TRUE
    FROM b1 WHERE o_orderstatus = 'O'
    """,
)
def a26_scd2_dimension_history(spark: SparkSession, sf: str) -> DataFrame:
    """SCD Type 2 dimension history derived from the CDC changelog
    (table_format.scd2_history — the warehouse pattern downstream of
    any change feed): seed append, copy-on-write UPDATE (closes the
    'O' images at ordinal 1, opens doubled-price versions), then a
    merge-on-read DELETE (closes the 'F' images at ordinal 2). The
    FULL history table hashes against the oracle's direct interval
    construction — every version row, valid_from/valid_to/is_current
    included, no aggregation hiding drift."""
    from ..table_format import scd2_history  # noqa: PLC0415

    o = t(spark, sf, "orders").filter(F.col("o_orderkey") <= 300)
    with tempfile.TemporaryDirectory(prefix="scd2_gate_") as wh:
        cat = LakeCatalog(wh)
        table = cat.create_table("gate", "dim", o.schema)
        table.append(o)
        table.update_where(
            spark,
            "o_orderstatus = 'O'",
            {"o_totalprice": "o_totalprice * 2"},
            strategy="copy_on_write",
        )
        table.delete_where(
            spark, "o_orderstatus = 'F'", strategy="merge_on_read"
        )
        hist = scd2_history(
            table.changelog_between(spark), ["o_orderkey"]
        )
        out = hist.select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("status"),
            F.round(
                F.col("o_totalprice").cast("decimal(18,4)").cast("double"),
                6,
            ).alias("total"),
            "valid_from", "valid_to", "is_current",
        )
        # materialize before the temp dir vanishes (bounded: the seed
        # slice + its updated versions)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)


@query(
    "a30_scd2_incremental_apply",
    # IDENTICAL oracle to a26: the incremental maintenance path must
    # reconstruct exactly the history the from-scratch build declares
    oracle="""
    WITH b1 AS (SELECT * FROM orders WHERE o_orderkey <= 300)
    SELECT o_orderkey AS k, o_orderstatus AS status,
           ROUND(CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS DOUBLE), 6)
             AS total,
           0 AS valid_from,
           CASE WHEN o_orderstatus = 'O' THEN 1
                WHEN o_orderstatus = 'F' THEN 2 END AS valid_to,
           o_orderstatus NOT IN ('O', 'F') AS is_current
    FROM b1
    UNION ALL
    SELECT o_orderkey, o_orderstatus,
           ROUND(CAST(CAST(o_totalprice * 2 AS DECIMAL(18,4))
                 AS DOUBLE), 6),
           1, NULL, TRUE
    FROM b1 WHERE o_orderstatus = 'O'
    """,
)
def a30_scd2_incremental_apply(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental SCD2 maintenance end-to-end (scd2_apply, VERDICT r8
    item 7's operator promoted from property-pytest to the hash gate):
    the a26 mutation episode consumed as TWO changelog ranges — the
    seed range builds the history with scd2_history, then the
    update+delete range merges in with scd2_apply(ordinal_offset=1,
    the one consumed commit). The result must hash-equal the SAME
    oracle as a26's from-scratch construction: incremental == rebuild,
    adjudicated by DuckDB, interval ordinals included. Cost shape is
    the measured one (SCALE.md round-9): only open intervals + the new
    range enter the window's exchange."""
    from ..table_format import scd2_apply, scd2_history  # noqa: PLC0415

    o = t(spark, sf, "orders").filter(F.col("o_orderkey") <= 300)
    with tempfile.TemporaryDirectory(prefix="scd2a_gate_") as wh:
        cat = LakeCatalog(wh)
        table = cat.create_table("gate", "dim", o.schema)
        seed = table.append(o)
        h1 = scd2_history(
            table.changelog_between(spark, to_snapshot=seed.snapshot_id),
            ["o_orderkey"],
        )
        table.update_where(
            spark,
            "o_orderstatus = 'O'",
            {"o_totalprice": "o_totalprice * 2"},
            strategy="copy_on_write",
        )
        table.delete_where(
            spark, "o_orderstatus = 'F'", strategy="merge_on_read"
        )
        rng = table.changelog_between(
            spark, from_snapshot=seed.snapshot_id
        )
        hist = scd2_apply(h1, rng, ["o_orderkey"], ordinal_offset=1)
        out = hist.select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("status"),
            F.round(
                F.col("o_totalprice").cast("decimal(18,4)").cast("double"),
                6,
            ).alias("total"),
            "valid_from", "valid_to", "is_current",
        )
        # materialize before the temp dir vanishes (bounded: the seed
        # slice + its updated versions)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)


@query(
    "a27_position_delete_episode",
    # same relational replay shape as a16 (the predicate-granularity
    # twin): the position mask must remove exactly the 'F' rows
    # visible at delete time, leave the later append untouched, and
    # survive compaction folding
    oracle="""
    WITH b12 AS (SELECT * FROM orders WHERE o_orderkey <= 1000),
         d AS (SELECT * FROM b12 WHERE NOT (o_orderstatus = 'F')),
         b3 AS (SELECT * FROM orders
                WHERE o_orderkey BETWEEN 1001 AND 1500),
         a AS (SELECT * FROM d UNION ALL SELECT * FROM b3)
    SELECT 'after_delete' AS step, COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 6)
             AS total
    FROM d
    UNION ALL SELECT 'after_append', COUNT(*),
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 6)
    FROM a
    UNION ALL SELECT 'after_compact', COUNT(*),
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 6)
    FROM a
    """,
)
def a27_position_delete_episode(spark: SparkSession, sf: str) -> DataFrame:
    """Position-delete episode (Iceberg v2's position-delete-file
    granularity — delete_where(strategy='merge_on_read_position'),
    completing the three-granularity merge-on-read family a16/a17
    started): two appends, a DELETE committed as a (file, ordinal)
    tuple file — predicate evaluated ONCE at delete time, nothing
    rewritten, scan-time cost an exact anti-join — an append the mask
    must NOT touch, then compact() folding the positions into data.
    All three reads hash-match the relational replay."""
    o = t(spark, sf, "orders").filter(F.col("o_orderkey") <= 1500)
    with tempfile.TemporaryDirectory(prefix="posdel_gate_") as wh:
        cat = LakeCatalog(wh)
        table = cat.create_table("gate", "pos", o.schema)
        table.append(o.filter(F.col("o_orderkey") <= 500))
        table.append(o.filter(F.col("o_orderkey").between(501, 1000)))
        snap = table.delete_where(
            spark, "o_orderstatus = 'F'",
            strategy="merge_on_read_position",
        )
        assert snap is not None and snap.delete_pos_dir

        def agg(step: str) -> DataFrame:
            return (
                table.to_df(spark)
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.round(
                        F.sum(
                            F.col("o_totalprice").cast("decimal(18,4)")
                        ).cast("double"),
                        6,
                    ).alias("total"),
                )
                .select(F.lit(step).alias("step"), "n", "total")
            )

        steps = [agg("after_delete")]
        table.append(o.filter(F.col("o_orderkey").between(1001, 1500)))
        steps.append(agg("after_append"))
        table.compact(spark)
        assert all(not s.is_row_delete for s in table.snapshots)
        steps.append(agg("after_compact"))
        out = steps[0]
        for s_df in steps[1:]:
            out = out.unionByName(s_df)
        rows = out.collect()
        # materialize before the temp dir vanishes
        return spark.createDataFrame(rows, out.schema)


@query(
    "a31_sort_order_episode",
    # data outcome is a filter replay over orders; the flag columns pin
    # the layout claims: bounds tile (sorted files), the pruned plan
    # touched fewer files, SHOW CREATE re-parses to the same declared
    # order, and the Iceberg export carries a real sort-orders entry
    oracle="""
    SELECT o_orderstatus AS status, COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                 AS DOUBLE), 6) AS total,
           TRUE AS bounds_tiled, TRUE AS pruned_fewer,
           TRUE AS show_create_roundtrip, TRUE AS exported_order
    FROM orders WHERE o_orderkey <= 4000 AND o_orderkey > 3000
    GROUP BY status
    """,
)
def a31_sort_order_episode(spark: SparkSession, sf: str) -> DataFrame:
    """Declared-table-sort-order episode (Iceberg ``sort-orders`` /
    ``write.sort-order``): CREATE with the property, plain appends land
    range-clustered + sorted (no explicit compact needed), per-file
    manifest bounds tile the key space, a range predicate prunes files
    at plan time, SHOW CREATE round-trips the declaration, and
    export_to_iceberg emits a real order-id-1 ``sort-orders`` entry
    (direction + null-order + stable source-id). Iceberg analog:
    ``ALTER TABLE ... WRITE ORDERED BY`` metadata consumed by sorted
    writes and scan planning."""
    import json  # noqa: PLC0415

    o = (
        t(spark, sf, "orders")
        .filter(F.col("o_orderkey") <= 4000)
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").alias("total"),
        )
        # deliberately unsorted input: the WRITE must arrange layout
        .orderBy(F.md5(F.col("k").cast("string")))
    )
    with tempfile.TemporaryDirectory(prefix="sort_gate_") as wh:
        cat = LakeCatalog(wh)
        ddl = DdlFrontend(spark, cat)
        table = cat.create_table(
            "gate",
            "so",
            o.schema,
            properties={
                "write.sort-order": "k ASC NULLS FIRST",
                # split the sorted stream so bounds have files to tile
                "write.target-file-size-bytes": "20000",
            },
        )
        # two plain appends — each write honors the declared order
        table.append(o.filter(F.col("k") <= 2000))
        table.append(o.filter(F.col("k") > 2000))
        live = [f for s in table.snapshots for f in s.files]
        spans = sorted(
            (f["stats"]["k"][0], f["stats"]["k"][1]) for f in live
        )
        # bounds tile PER APPEND; across the two appends the k ranges
        # are disjoint by construction, so the global spans tile too
        tiled = len(spans) >= 4 and all(
            spans[i][1] <= spans[i + 1][0] for i in range(len(spans) - 1)
        )
        full = table.to_df(spark)
        pruned = table.to_df(
            spark, pruning=[("k", ">", 3000), ("k", "<=", 4000)]
        )
        fewer = len(pruned.inputFiles()) < len(full.inputFiles())
        # SHOW CREATE round-trip: re-run the emitted DDL in a second
        # namespace; the declared order must survive the parse
        # (bounded episode metadata: a one-row DDL statement)
        stmt = ddl.query("SHOW CREATE TABLE gate.so").collect()[0][0]
        r = ddl.sql(stmt.replace("gate.so", "gate2.so", 1))
        assert not r.has_error, r.message_list
        twin = cat.load_table("gate2", "so")
        roundtrip = twin.sort_order_fields == table.sort_order_fields
        # exported metadata carries the real sort order
        meta_dir = export_to_iceberg(table)
        docs = sorted(meta_dir.glob("v*.metadata.json"))
        doc = json.loads(docs[-1].read_text())
        orders = {o_["order-id"]: o_ for o_ in doc["sort-orders"]}
        exported = (
            doc["default-sort-order-id"] == 1
            and orders[1]["fields"][0]["direction"] == "asc"
            and orders[1]["fields"][0]["null-order"] == "nulls-first"
        )
        out = (
            pruned.groupBy("status")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(
                    F.sum(F.col("total").cast("decimal(18,4)")).cast(
                        "double"
                    ),
                    6,
                ).alias("total"),
            )
            .withColumn("bounds_tiled", F.lit(tiled))
            .withColumn("pruned_fewer", F.lit(fewer))
            .withColumn("show_create_roundtrip", F.lit(roundtrip))
            .withColumn("exported_order", F.lit(exported))
        )
        # materialize before the temp dir vanishes (bounded agg)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)


@query(
    "a33_column_metrics_episode",
    # data outcome replays the pruned filter; flags pin the per-column
    # metrics selection: full-bounds column prunes, counts column has
    # no bounds, truncate(4) bounds are <= 4 chars with the upper
    # rounded up, and SHOW CREATE re-parses the whole property set
    oracle="""
    SELECT o_orderstatus AS status, COUNT(*) AS n,
           TRUE AS full_prunes, TRUE AS counts_dropped_bounds,
           TRUE AS truncated_sound, TRUE AS show_create_roundtrip
    FROM orders WHERE o_orderkey <= 4000 AND o_orderkey <= 900
    GROUP BY status
    """,
)
def a33_column_metrics_episode(spark: SparkSession, sf: str) -> DataFrame:
    """Per-column metrics config driven from the reference's CONFIG
    DOCUMENT plane (one JSON document: columns + properties{}, the
    shape lambda_helper.load_table_def consumes): a table-def declaring
    ``write.metadata.metrics.default=counts`` with per-column ``full``
    and ``truncate(4)`` overrides lands via process_event, appends
    collect exactly the selected bounds, the full column still prunes
    files, and SHOW CREATE round-trips the property set. Iceberg
    analog: MetricsConfig properties, declared in the same table
    properties Iceberg's own CREATE carries."""
    import json  # noqa: PLC0415
    import os  # noqa: PLC0415

    from ..handler import process_event

    o = (
        t(spark, sf, "orders")
        .filter(F.col("o_orderkey") <= 4000)
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("clerk"),
        )
        .orderBy("k")
    )
    table_def = {
        "database_name": "gate",
        "table_name": "metrics_t",
        "columns": [
            {"column_name": "k", "data_type": "long", "required": True},
            {"column_name": "status", "data_type": "string"},
            {"column_name": "clerk", "data_type": "string"},
        ],
        "properties": {
            "write.metadata.metrics.default": "counts",
            "write.metadata.metrics.column.k": "full",
            "write.metadata.metrics.column.clerk": "truncate(4)",
            "write.sort-order": "k",
            "write.target-file-size-bytes": "20000",
        },
    }
    with tempfile.TemporaryDirectory(prefix="metrics_gate_") as wh:
        defpath = os.path.join(wh, "def.json")
        with open(defpath, "w") as fh:
            json.dump(table_def, fh)
        cat = LakeCatalog(os.path.join(wh, "warehouse"))
        r = process_event(spark, cat, defpath)
        assert not r.has_error, r.message_list
        table = cat.load_table("gate", "metrics_t")
        table.append(o)
        files = table.snapshots[-1].files
        stats = [f["stats"] for f in files]
        counts_dropped = all("status" not in st for st in stats)
        full_ok = all("k" in st for st in stats)
        trunc_ok = all(
            "clerk" in st
            and len(st["clerk"][0]) <= 4
            and len(st["clerk"][1]) <= 4
            for st in stats
        )
        # the truncated UPPER bound must still enclose the real max
        # (bounded episode metadata: a 1-row aggregate)
        real_max = o.agg(F.max("clerk")).collect()[0][0]
        trunc_ok = trunc_ok and all(
            st["clerk"][1] >= real_max[:4] for st in stats
        )
        full = table.to_df(spark)
        pruned = table.to_df(spark, pruning=[("k", "<=", 900)])
        full_prunes = len(pruned.inputFiles()) < len(full.inputFiles())
        ddl = DdlFrontend(spark, cat)
        # (bounded episode metadata: a one-row DDL statement)
        stmt = ddl.query("SHOW CREATE TABLE gate.metrics_t").collect()[0][0]
        rr = ddl.sql(stmt.replace("gate.metrics_t", "gate2.metrics_t", 1))
        assert not rr.has_error, rr.message_list
        twin = cat.load_table("gate2", "metrics_t")
        roundtrip = {
            k_: v_
            for k_, v_ in twin.properties.items()
            if k_.startswith("write.metadata.metrics")
        } == {
            k_: v_
            for k_, v_ in table.properties.items()
            if k_.startswith("write.metadata.metrics")
        }
        out = (
            pruned.filter(F.col("k") <= 900)
            .groupBy("status")
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("full_prunes", F.lit(full_prunes))
            .withColumn("counts_dropped_bounds", F.lit(counts_dropped))
            .withColumn("truncated_sound", F.lit(trunc_ok))
            .withColumn("show_create_roundtrip", F.lit(roundtrip))
        )
        # materialize before the temp dir vanishes (bounded agg)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)


@query(
    "a34_bucket_sort_compose",
    # data outcome is the a32-style zero-exchange lake join on a
    # narrower key range; the flag columns pin the r11 composition
    # claims: the join planned with no exchange on either fact arm
    # even though a sort order is declared, the bucket files are
    # physically sorted (key, then sort column) inside, and the
    # export carries BOTH the verbatim bucket spec field and the
    # order-1 sort order
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_items,
           ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE), 6)
             AS revenue,
           TRUE AS zero_exchange, TRUE AS files_sorted,
           TRUE AS export_bucket_verbatim, TRUE AS export_sort_order1
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_orderkey <= 6000
    GROUP BY o.o_orderpriority
    """,
)
def a34_bucket_sort_compose(spark: SparkSession, sf: str) -> DataFrame:
    """Iceberg's standard fact-table layout, composed (VERDICT r10
    item 1): ``bucket[16]`` partition spec + declared ``write.sort-
    order`` on a second column, under ``write.bucket-layout=dual``.
    The bucket writer sorts each file by (bucket key, sort columns) —
    the key stays the ordering PREFIX, so the exchange- and sort-free
    join contract is untouched — while the secondary sort orders rows
    within equal keys (row-group bounds on the sort column tighten for
    key-point + range predicates, and the export's consumers see the
    standard bucket-plus-sort declaration). Reference parity: the
    reference's metadata plane carries ``sort-orders`` alongside
    ``partition-specs``; composing them is what its users' fact
    tables do in production."""
    import json  # noqa: PLC0415

    from ..partitioning import compile_partition_spec  # noqa: PLC0415

    li = (
        t(spark, sf, "lineitem")
        .filter(F.col("l_orderkey") <= 6000)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    orders = (
        t(spark, sf, "orders")
        .filter(F.col("o_orderkey") <= 6000)
        .select("o_orderkey", "o_orderpriority")
    )
    with tempfile.TemporaryDirectory(prefix="bucket_sort_") as wh:
        cat = LakeCatalog(wh)
        spec = compile_partition_spec(
            {"partitions": [{"column_name": "l_orderkey",
                             "transform": "bucket[16]"}]}
        )
        tl = cat.create_table(
            "gate", "li_sorted", li.schema, partition_spec=spec,
            properties={
                "write.bucket-layout": "dual",
                "write.sort-order": "l_extendedprice",
            },
        )
        tl.append(li)
        ospec = compile_partition_spec(
            {"partitions": [{"column_name": "o_orderkey",
                             "transform": "bucket[16]"}]}
        )
        to = cat.create_table(
            "gate", "ord_dual", orders.schema, partition_spec=ospec,
            properties={"write.bucket-layout": "dual"},
        )
        to.append(orders)
        # physical claim, against the DATA: inside one bucket file the
        # rows are sorted by (key, sort column) — the write applied
        # the declaration, it is not metadata-only
        import pyarrow.parquet as pq  # noqa: PLC0415

        probe = next(
            f for f in tl.snapshots[-1].files if f["record_count"] > 1
        )
        tb = pq.read_table(
            str(tl.location / probe["path"]),
            columns=["l_orderkey", "l_extendedprice"],
        )
        pairs = list(
            zip(tb["l_orderkey"].to_pylist(),
                tb["l_extendedprice"].to_pylist())
        )
        files_sorted = pairs == sorted(pairs) and probe.get(
            "sorted_by"
        ) == ["l_orderkey", "l_extendedprice"]
        # export-side claim: bucket spec verbatim AND order-1 sort
        doc = json.loads(
            sorted(
                export_to_iceberg(tl).glob("v*.metadata.json")
            )[-1].read_text()
        )
        spec_fields = doc["partition-specs"][0]["fields"]
        bucket_ok = (
            len(spec_fields) == 1
            and spec_fields[0]["transform"] == "bucket[16]"
        )
        so = {o_["order-id"]: o_ for o_ in doc["sort-orders"]}
        cur_schema = next(
            s for s in doc["schemas"]
            if s["schema-id"] == doc["current-schema-id"]
        )
        by_id = {f["id"]: f["name"] for f in cur_schema["fields"]}
        # r12 (ADVICE r11): the exported order describes the PHYSICAL
        # write order — bucket key leading, declared secondary after
        # (a file sorted by (k, v) is not sorted by v alone)
        sort_ok = (
            doc["default-sort-order-id"] == 1
            and [
                (by_id[f["source-id"]], f["transform"], f["direction"])
                for f in so[1]["fields"]
            ]
            == [
                ("l_orderkey", "identity", "asc"),
                ("l_extendedprice", "identity", "asc"),
            ]
        )
        dl, do = tl.to_df(spark), to.to_df(spark)
        joined = dl.join(do, dl.l_orderkey == do.o_orderkey)
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            zero_exchange = "Exchange" not in plan
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
                .withColumn("zero_exchange", F.lit(zero_exchange))
                .withColumn("files_sorted", F.lit(files_sorted))
                .withColumn("export_bucket_verbatim", F.lit(bucket_ok))
                .withColumn("export_sort_order1", F.lit(sort_ok))
            )
            # materialize before the temp dir vanishes (bounded agg)
            rows = out.collect()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        return spark.createDataFrame(rows, out.schema)

@query(
    "a35_bucket_sort_rich_vocab",
    # the a34 composition with the FULL sort vocabulary (r13, VERDICT
    # r12 item 2): DESC + truncate-transform secondary orders inside
    # bucket files. Flags pin: zero-exchange join fingerprint
    # unchanged, files physically sorted (key asc, price DESC,
    # truncate(100, partkey) asc), the manifest claim trimmed to the
    # truthful asc prefix, and export order-1 carrying the transform
    # and direction verbatim.
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_items,
           ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE), 6)
             AS revenue,
           TRUE AS zero_exchange, TRUE AS files_rich_sorted,
           TRUE AS claim_is_prefix, TRUE AS export_rich_order1
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_orderkey <= 4000
    GROUP BY o.o_orderpriority
    """,
)
def a35_bucket_sort_rich_vocab(spark: SparkSession, sf: str) -> DataFrame:
    """Full sort-order vocabulary on a bucket layout (VERDICT r12
    item 2 lifts r11's asc-identity-only restriction): the table
    declares ``l_extendedprice DESC NULLS LAST, truncate(100,
    l_partkey)`` under ``bucket[16]`` + ``write.bucket-layout=dual``.
    The write pre-sorts each bucket with the declaration verbatim
    (legacy physical write path preserves it — table_format
    ``_write_files``), sortBy/manifest claim only the truthful
    asc-identity prefix (the bare key), and the export's order-1
    carries direction + transform verbatim. Reference parity: real
    Iceberg allows any sort order on a bucket-partitioned table
    (spec vocabulary the reference's metadata plane carries)."""
    import json  # noqa: PLC0415

    from ..partitioning import compile_partition_spec  # noqa: PLC0415

    li = (
        t(spark, sf, "lineitem")
        .filter(F.col("l_orderkey") <= 4000)
        .select("l_orderkey", "l_partkey", "l_extendedprice", "l_discount")
    )
    orders = (
        t(spark, sf, "orders")
        .filter(F.col("o_orderkey") <= 4000)
        .select("o_orderkey", "o_orderpriority")
    )
    with tempfile.TemporaryDirectory(prefix="bucket_rich_") as wh:
        cat = LakeCatalog(wh)
        spec = compile_partition_spec(
            {"partitions": [{"column_name": "l_orderkey",
                             "transform": "bucket[16]"}]}
        )
        tl = cat.create_table(
            "gate", "li_rich", li.schema, partition_spec=spec,
            properties={
                "write.bucket-layout": "dual",
                "write.sort-order":
                    "l_extendedprice DESC NULLS LAST, "
                    "truncate(100, l_partkey)",
            },
        )
        tl.append(li)
        ospec = compile_partition_spec(
            {"partitions": [{"column_name": "o_orderkey",
                             "transform": "bucket[16]"}]}
        )
        to = cat.create_table(
            "gate", "ord_rich", orders.schema, partition_spec=ospec,
            properties={"write.bucket-layout": "dual"},
        )
        to.append(orders)
        # physical claim, against the DATA: inside every multi-row
        # bucket file the rows follow (key asc, price DESC, truncated
        # partkey asc) — the rich declaration was applied, the
        # planned-write optimizer did not silently re-sort it away
        import pyarrow.parquet as pq  # noqa: PLC0415

        files_rich_sorted = True
        claim_is_prefix = True
        probed = 0
        for entry in tl.snapshots[-1].files:
            if entry["record_count"] < 2:
                continue
            tb = pq.read_table(
                str(tl.location / entry["path"]),
                columns=["l_orderkey", "l_extendedprice", "l_partkey"],
            )
            key = [
                (k, -p, pk - pk % 100)
                for k, p, pk in zip(
                    tb["l_orderkey"].to_pylist(),
                    tb["l_extendedprice"].to_pylist(),
                    tb["l_partkey"].to_pylist(),
                )
            ]
            files_rich_sorted = files_rich_sorted and key == sorted(key)
            claim_is_prefix = claim_is_prefix and entry.get(
                "sorted_by"
            ) == ["l_orderkey"]
            probed += 1
        files_rich_sorted = files_rich_sorted and probed > 0
        # export-side claim: order-1 carries direction + transform
        doc = json.loads(
            sorted(
                export_to_iceberg(tl).glob("v*.metadata.json")
            )[-1].read_text()
        )
        so = {o_["order-id"]: o_ for o_ in doc["sort-orders"]}
        cur_schema = next(
            s for s in doc["schemas"]
            if s["schema-id"] == doc["current-schema-id"]
        )
        by_id = {f["id"]: f["name"] for f in cur_schema["fields"]}
        export_rich_order1 = (
            doc["default-sort-order-id"] == 1
            and [
                (by_id[f["source-id"]], f["transform"], f["direction"],
                 f["null-order"])
                for f in so[1]["fields"]
            ]
            == [
                ("l_orderkey", "identity", "asc", "nulls-first"),
                ("l_extendedprice", "identity", "desc", "nulls-last"),
                ("l_partkey", "truncate[100]", "asc", "nulls-first"),
            ]
        )
        dl, do = tl.to_df(spark), to.to_df(spark)
        joined = dl.join(do, dl.l_orderkey == do.o_orderkey)
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            zero_exchange = "Exchange" not in plan
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
                .withColumn("zero_exchange", F.lit(zero_exchange))
                .withColumn("files_rich_sorted", F.lit(files_rich_sorted))
                .withColumn("claim_is_prefix", F.lit(claim_is_prefix))
                .withColumn("export_rich_order1", F.lit(export_rich_order1))
            )
            # materialize before the temp dir vanishes (bounded agg)
            rows = out.collect()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        return spark.createDataFrame(rows, out.schema)

@query(
    "a36_rewrite_manifests_episode",
    # rewrite_manifests (VERDICT r12 item 5): the data outcome is the
    # post-fold live scan aggregated per priority; the flag columns
    # pin the metadata-plane claims — the fold collapsed N live
    # manifest lists to 1, files_df served the union manifest, the
    # open-ended CDC delta skipped the fold, and time travel to a
    # pre-fold id still answers.
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 4)
             AS total_price,
           TRUE AS folded_to_one, TRUE AS files_df_invariant,
           TRUE AS cdc_skips_fold, TRUE AS time_travel_ok
    FROM orders WHERE o_orderkey <= 5000
    GROUP BY o_orderpriority
    """,
)
def a36_rewrite_manifests_episode(spark: SparkSession, sf: str) -> DataFrame:
    """``CALL system.rewrite_manifests`` episode: five single-file
    appends snowball five manifest lists (the reference's append
    pattern, data_generator.py:79); the procedure folds them into ONE
    metadata-only 'replace' entry whose union manifest serves every
    reader surface invariantly — data files never move. The third
    maintenance plane next to rewrite_data_files and
    rewrite_position_delete_files (Iceberg's procedure of the same
    name)."""
    orders = (
        t(spark, sf, "orders")
        .filter(F.col("o_orderkey") <= 5000)
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
    )
    with tempfile.TemporaryDirectory(prefix="rw_manifests_") as wh:
        cat = LakeCatalog(wh)
        tbl = cat.create_table("gate", "ord_m", orders.schema)
        bounds = [-1, 1000, 2000, 3000, 4000, 5000]  # o_orderkey 0 exists
        for lo, hi in zip(bounds, bounds[1:]):
            tbl.append(
                orders.filter(
                    (F.col("o_orderkey") > lo) & (F.col("o_orderkey") <= hi)
                ).coalesce(1)
            )
        originals = [s.snapshot_id for s in tbl.snapshots]
        pre_files = {
            # bounded episode metadata: files_df is manifest-sized
            (r["file_path"], r["record_count"])
            for r in tbl.files_df(spark).collect()
        }
        r = DdlFrontend(spark, cat).sql(
            "CALL system.rewrite_manifests('gate.ord_m')"
        )
        tbl = cat.load_table("gate", "ord_m")
        folded_to_one = (
            not r.has_error
            and len(tbl.snapshots) == 1
            and tbl.snapshots[0].source_snapshots == originals
        )
        post_files = {
            # bounded episode metadata: files_df is manifest-sized
            (r_["file_path"], r_["record_count"])
            for r_ in tbl.files_df(spark).collect()
        }
        files_df_invariant = post_files == pre_files
        # the open-ended incremental consumer survives the fold: only
        # the post-fold append arrives, the fold itself emits nothing
        extra = orders.filter(F.col("o_orderkey") <= 50).withColumn(
            "o_totalprice", F.col("o_totalprice") * 0
        )
        tbl.append(extra.coalesce(1))
        delta = tbl.changes_between(spark, originals[-1], None)
        cdc_skips_fold = delta.count() == extra.count()
        time_travel_ok = (
            tbl.to_df(spark, as_of_snapshot=originals[2]).count()
            == orders.filter(F.col("o_orderkey") <= 3000).count()
        )
        out = (
            tbl.to_df(spark)
            # exclude the post-fold CDC probe rows from the aggregate
            .filter(F.col("o_totalprice") > 0)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.round(
                    F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
                    .cast("double"),
                    4,
                ).alias("total_price"),
            )
            .withColumn("folded_to_one", F.lit(folded_to_one))
            .withColumn("files_df_invariant", F.lit(files_df_invariant))
            .withColumn("cdc_skips_fold", F.lit(cdc_skips_fold))
            .withColumn("time_travel_ok", F.lit(time_travel_ok))
        )
        # materialize before the temp dir vanishes (bounded agg)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)

@query(
    "a37_table_rename_episode",
    # ALTER TABLE ... RENAME TO (VERDICT r12 item 3): data outcome is
    # the post-rename scan aggregated per priority; flags pin that the
    # old name vanished, the new identifier committed, snapshots/time
    # travel survived the move, and post-rename appends land.
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           TRUE AS old_name_gone, TRUE AS identifier_updated,
           TRUE AS time_travel_ok, TRUE AS post_rename_append_ok
    FROM orders WHERE o_orderkey <= 3000
    GROUP BY o_orderpriority
    """,
)
def a37_table_rename_episode(spark: SparkSession, sf: str) -> DataFrame:
    """Table-level rename through the DDL front-end and the path
    catalog: the dir moves (atomic os.rename locally; the Glue flavor
    re-points the entry instead — test_s3_glue), every table-relative
    manifest path rides along, and time travel to a pre-rename
    snapshot answers under the new name. The routine Iceberg/Glue
    operation the reference's users run that had no surface here
    (VERDICT r12 'what's missing' 3)."""
    orders = (
        t(spark, sf, "orders")
        .filter(F.col("o_orderkey") <= 3000)
        .select("o_orderkey", "o_orderpriority")
    )
    with tempfile.TemporaryDirectory(prefix="rename_tbl_") as wh:
        cat = LakeCatalog(wh)
        tbl = cat.create_table("gate", "before", orders.schema)
        tbl.append(
            orders.filter(F.col("o_orderkey") <= 1500).coalesce(1)
        )
        first = tbl.snapshots[0].snapshot_id
        tbl.append(
            orders.filter(F.col("o_orderkey") > 1500).coalesce(1)
        )
        r = DdlFrontend(spark, cat).sql(
            "ALTER TABLE gate.before RENAME TO gate.after"
        )
        renamed = cat.load_table("gate", "after")
        old_name_gone = (
            not r.has_error and cat.load_table("gate", "before") is None
        )
        identifier_updated = (
            renamed is not None
            and renamed.meta["identifier"] == "gate.after"
        )
        pre_count = orders.filter(F.col("o_orderkey") <= 1500).count()
        time_travel_ok = (
            renamed.to_df(spark, as_of_snapshot=first).count() == pre_count
        )
        # post-rename append (excluded from the aggregate via a marker)
        renamed.append(
            orders.filter(F.col("o_orderkey") <= 5)
            .withColumn("o_orderpriority", F.lit("__probe__"))
            .coalesce(1)
        )
        post_rename_append_ok = renamed.to_df(spark).filter(
            F.col("o_orderpriority") == "__probe__"
        ).count() == orders.filter(F.col("o_orderkey") <= 5).count()
        out = (
            renamed.to_df(spark)
            .filter(F.col("o_orderpriority") != "__probe__")
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_orders"))
            .withColumn("old_name_gone", F.lit(old_name_gone))
            .withColumn("identifier_updated", F.lit(identifier_updated))
            .withColumn("time_travel_ok", F.lit(time_travel_ok))
            .withColumn(
                "post_rename_append_ok", F.lit(post_rename_append_ok)
            )
        )
        # materialize before the temp dir vanishes (bounded agg)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)

@query(
    "a38_add_files_import_episode",
    # system.add_files (r13): data outcome is the post-import scan
    # aggregated per priority; flags pin byte-identical import (no
    # rewrite), evolution-matrix promotion on import, the loud
    # extra-column refusal, and CDC composition over the imported
    # snapshot.
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           TRUE AS byte_identical, TRUE AS promotion_applied,
           TRUE AS extra_col_refused, TRUE AS cdc_composes
    FROM orders WHERE o_orderkey <= 2000
    GROUP BY o_orderpriority
    """,
)
def a38_add_files_import_episode(spark: SparkSession, sf: str) -> DataFrame:
    """Migration surface (Iceberg ``system.add_files``): parquet
    produced OUTSIDE the table format imports as one append snapshot
    with no decode/rewrite — byte-copied into a snapshot dir (the
    table-relative-manifest divergence from Iceberg's in-place
    reference, documented in add_files), footers validated against
    the current schema with the evolution promotion matrix
    (int->long here), extra columns refused loudly. The reference's
    users migrate existing S3 parquet exactly this way."""
    import hashlib  # noqa: PLC0415

    orders = (
        t(spark, sf, "orders")
        .filter(F.col("o_orderkey") <= 2000)
        .select(
            F.col("o_orderkey").cast("int").alias("o_orderkey"),
            "o_orderpriority",
        )
    )
    with tempfile.TemporaryDirectory(prefix="add_files_") as wh:
        src = f"{wh}/foreign_src"
        orders.coalesce(2).write.parquet(src)
        cat = LakeCatalog(f"{wh}/lake")
        schema = (
            spark.range(1)
            .selectExpr(
                "cast(id as long) o_orderkey",
                "cast('' as string) o_orderpriority",
            )
            .schema
        )
        tbl = cat.create_table("gate", "imp", schema)
        r = DdlFrontend(spark, cat).sql(
            f"CALL system.add_files('gate.imp', source_dir => '{src}')"
        )
        tbl = cat.load_table("gate", "imp")
        snap = tbl.snapshots[-1]
        from pathlib import Path as _P  # noqa: PLC0415

        src_h = {
            hashlib.md5(p.read_bytes()).hexdigest()
            for p in _P(src).rglob("*.parquet")
        }
        dst_h = {
            hashlib.md5((tbl.location / f["path"]).read_bytes()).hexdigest()
            for f in snap.files
        }
        byte_identical = not r.has_error and dst_h == src_h
        out_df = tbl.to_df(spark)
        promotion_applied = (
            out_df.schema["o_orderkey"].dataType.simpleString() == "bigint"
        )
        try:
            bad = f"{wh}/bad_src"
            orders.withColumn("rogue", F.lit(1)).coalesce(1).write.parquet(
                bad
            )
            tbl.add_files(bad)
            extra_col_refused = False
        except TableFormatError:
            extra_col_refused = True
        delta = tbl.changes_between(spark, None, snap.snapshot_id)
        cdc_composes = delta.count() == orders.count()
        out = (
            out_df.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_orders"))
            .withColumn("byte_identical", F.lit(byte_identical))
            .withColumn("promotion_applied", F.lit(promotion_applied))
            .withColumn("extra_col_refused", F.lit(extra_col_refused))
            .withColumn("cdc_composes", F.lit(cdc_composes))
        )
        # materialize before the temp dir vanishes (bounded agg)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)

@query(
    "a39_v3_initial_default_episode",
    # v3 read edge (r14, ICEBERG_CONFORMANCE rows 35-38): data outcome
    # is the external read with the evolved column's initial-default
    # filling PRE-EVOLUTION files only; flags pin the loud refusals of
    # a future format version and a variant-typed field on edited
    # twins of the same metadata.
    oracle="""
    SELECT status, COUNT(*) AS n,
           TRUE AS future_version_refused, TRUE AS variant_refused
    FROM (
      SELECT CASE WHEN o_orderkey <= 1000 THEN 'BACKFILL'
                  ELSE o_orderstatus END AS status
      FROM orders WHERE o_orderkey <= 2000
    )
    GROUP BY status
    """,
)
def a39_v3_initial_default_episode(spark: SparkSession, sf: str) -> DataFrame:
    """Iceberg v3 read edge as a gate episode: evolve a lake table
    (the first snapshot's files predate the added column), export,
    then declare the metadata format-version 3 with
    ``initial-default`` on the evolved column — the v3 spec's column
    defaults. The external read must fill the PRE-evolution files with
    the default while post-evolution files keep their real values
    (incl. none of the default leaking into them), and the v3 refusal
    surface (format-version 4, a NESTED variant field — top-level
    variant decodes since r16, conformance row 43) must refuse
    loudly on edited twins of the same metadata document."""
    import copy  # noqa: PLC0415
    import json as _json  # noqa: PLC0415
    from pathlib import Path as _P  # noqa: PLC0415

    src = t(spark, sf, "orders").filter(F.col("o_orderkey") <= 2000)
    with tempfile.TemporaryDirectory(prefix="v3_gate_") as wh:
        cat = LakeCatalog(wh)
        schema = (
            spark.range(1)
            .selectExpr(
                "cast(id as long) o_orderkey",
                "cast('' as string) o_orderpriority",
            )
            .schema
        )
        table = cat.create_table("gate", "v3t", schema)
        table.append(
            src.filter("o_orderkey <= 1000")
            .select("o_orderkey", "o_orderpriority")
            .repartition(1)
        )
        r = DdlFrontend(spark, cat).sql(
            "ALTER TABLE gate.v3t ADD COLUMN o_orderstatus STRING"
        )
        assert not r.has_error, r.message_list
        table = cat.load_table("gate", "v3t")
        table.append(
            src.filter("o_orderkey > 1000")
            .select("o_orderkey", "o_orderpriority", "o_orderstatus")
            .repartition(1)
        )
        export_to_iceberg(table)
        meta_dir = _P(table.location) / "metadata"
        hint = (meta_dir / "version-hint.text").read_text().strip()
        mpath = meta_dir / f"v{hint}.metadata.json"
        doc = _json.loads(mpath.read_text())
        doc["format-version"] = 3
        cur = next(
            s for s in doc["schemas"]
            if s["schema-id"] == doc["current-schema-id"]
        )
        for fld in cur["fields"]:
            if fld["name"] == "o_orderstatus":
                fld["initial-default"] = "BACKFILL"
        mpath.write_text(_json.dumps(doc))
        external, rdoc = read_iceberg_table(spark, table.location)
        # refusal twins: same document, one edit each
        d4 = copy.deepcopy(doc)
        d4["format-version"] = 4
        p4 = meta_dir / "v99.metadata.json"
        p4.write_text(_json.dumps(d4))
        try:
            read_iceberg_table(spark, table.location, metadata_file=p4)
            future_version_refused = False
        except ValueError:
            future_version_refused = True
        dv = copy.deepcopy(doc)
        cur2 = next(
            s for s in dv["schemas"]
            if s["schema-id"] == dv["current-schema-id"]
        )
        # NESTED variant: top-level variant DECODES since r16
        # (row 43), so the refusal twin pins the still-refused
        # nested surface
        cur2["fields"].append(
            {"id": 999, "name": "payload", "required": False,
             "type": {"type": "struct", "fields": [
                 {"id": 1000, "name": "v", "required": False,
                  "type": "variant"}]}}
        )
        p98 = meta_dir / "v98.metadata.json"
        p98.write_text(_json.dumps(dv))
        try:
            read_iceberg_table(spark, table.location, metadata_file=p98)
            variant_refused = False
        except ValueError:
            variant_refused = True
        out = (
            external.select(F.col("o_orderstatus").alias("status"))
            .groupBy("status")
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn(
                "future_version_refused", F.lit(future_version_refused)
            )
            .withColumn("variant_refused", F.lit(variant_refused))
        )
        # materialize before the temp dir vanishes (bounded agg)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)

@query(
    "a40_v3_deletion_vector_episode",
    # v3 deletion vectors (ICEBERG_CONFORMANCE row 35, now DECODED):
    # data outcome is the external read with a REAL puffin
    # roaring64 bitmap masking every 7th file position of the sorted
    # export; the oracle replays positions via ROW_NUMBER. The flag
    # pins the CRC refusal on a corrupted twin.
    oracle="""
    WITH ranked AS (
      SELECT o_orderpriority,
             ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS pos
      FROM orders WHERE o_orderkey <= 1000
    )
    SELECT o_orderpriority, COUNT(*) AS n, TRUE AS crc_refused
    FROM ranked WHERE pos % 7 <> 0
    GROUP BY o_orderpriority
    """,
)
def a40_v3_deletion_vector_episode(spark: SparkSession, sf: str) -> DataFrame:
    """Iceberg v3 deletion vectors end-to-end THROUGH REAL BYTES:
    export a sorted lake table as v2, then commit a deletion vector
    the way a v3 writer would — a puffin container holding a
    portable-roaring64 bitmap of deleted row positions, referenced by
    a delete manifest carrying referenced_data_file/content_offset/
    content_size_in_bytes — and read the table back externally. The
    positions are file row indices, so the sorted single-file write
    makes them replayable as ROW_NUMBER in the oracle. A corrupted
    blob CRC must refuse loudly (flag)."""
    import json as _json  # noqa: PLC0415
    import os as _os  # noqa: PLC0415
    from pathlib import Path as _P  # noqa: PLC0415

    from ..avro_ocf import write_ocf  # noqa: PLC0415
    from ..iceberg_export import (  # noqa: PLC0415
        _manifest_entry_schema,
        _manifest_file_schema,
        read_avro_jvm,
    )
    from ..puffin import dv_blob_serialize, write_puffin  # noqa: PLC0415

    src = (
        t(spark, sf, "orders")
        .filter(F.col("o_orderkey") <= 1000)
        .select("o_orderkey", "o_orderpriority")
    )
    with tempfile.TemporaryDirectory(prefix="v3_dv_gate_") as wh:
        cat = LakeCatalog(wh)
        table = cat.create_table("gate", "dvt", src.schema)
        table.append(
            src.repartition(1).sortWithinPartitions("o_orderkey")
        )
        export_to_iceberg(table, format_version=2)
        meta_dir = _P(table.location) / "metadata"
        hint = (meta_dir / "version-hint.text").read_text().strip()
        mpath = meta_dir / f"v{hint}.metadata.json"
        doc = _json.loads(mpath.read_text())
        doc["format-version"] = 3
        mpath.write_text(_json.dumps(doc))
        snap = next(
            s for s in doc["snapshots"]
            if s["snapshot-id"] == doc["current-snapshot-id"]
        )
        mlist_path = snap["manifest-list"]
        mlist = read_avro_jvm(spark, mlist_path)
        data_m = next(m for m in mlist if m.get("content") in (None, 0))
        [entry] = read_avro_jvm(spark, data_m["manifest_path"])
        dfile = entry["data_file"]["file_path"]
        n_rows = int(entry["data_file"]["record_count"])
        positions = [p for p in range(n_rows) if p % 7 == 0]

        blob = dv_blob_serialize(positions)
        ppath = meta_dir / "dv-0001.puffin"
        write_puffin(str(ppath), [{
            "data": blob, "type": "deletion-vector-v1", "fields": [],
            "snapshot-id": snap["snapshot-id"], "sequence-number": 2,
            "properties": {"referenced-data-file": str(dfile),
                           "cardinality": str(len(positions))},
        }])

        # delete manifest: the v2 entry schema + the three v3 DV
        # fields on data_file (ids 143/144/145 per the v3 spec)
        eschema = _manifest_entry_schema([], 2)
        df_rec = next(
            f for f in eschema["fields"] if f["name"] == "data_file"
        )
        df_rec["type"]["fields"] += [
            {"name": "referenced_data_file", "type": ["null", "string"],
             "default": None, "field-id": 143},
            {"name": "content_offset", "type": ["null", "long"],
             "default": None, "field-id": 144},
            {"name": "content_size_in_bytes", "type": ["null", "long"],
             "default": None, "field-id": 145},
        ]
        dv_manifest = meta_dir / "manifest-dv-0001.avro"
        write_ocf(
            str(dv_manifest), eschema,
            [{
                "status": 1,
                "snapshot_id": snap["snapshot-id"],
                "sequence_number": 2,
                "file_sequence_number": 2,
                "data_file": {
                    "content": 1,
                    "file_path": str(ppath),
                    "file_format": "PUFFIN",
                    "partition": {},
                    "record_count": len(positions),
                    "file_size_in_bytes": _os.path.getsize(ppath),
                    "block_size_in_bytes": 64 * 1024 * 1024,
                    "referenced_data_file": str(dfile),
                    "content_offset": 4,
                    "content_size_in_bytes": len(blob),
                },
            }],
            {"format-version": "2", "content": "deletes"},
        )
        mlist.append({
            "manifest_path": str(dv_manifest),
            "manifest_length": _os.path.getsize(dv_manifest),
            "partition_spec_id": 0,
            "content": 1,
            "sequence_number": 2,
            "min_sequence_number": 2,
            "added_snapshot_id": snap["snapshot-id"],
            "added_data_files_count": 1,
            "existing_data_files_count": 0,
            "deleted_data_files_count": 0,
            "added_rows_count": len(positions),
            "existing_rows_count": 0,
            "deleted_rows_count": 0,
        })
        write_ocf(
            mlist_path, _manifest_file_schema(2), mlist,
            {"format-version": "2"},
        )

        external, rdoc = read_iceberg_table(spark, table.location)
        # CRC guard: a corrupted blob copy must refuse loudly. Blob
        # layout: PFA1 0-3, BE combined length 4-7, DV magic 8-11,
        # vector 12.. — flip a VECTOR byte so the CRC-mismatch path is
        # what this gate pins (byte 8 would hit the bad-magic refusal
        # instead; r15 ADVICE)
        corrupted = bytearray(_P(ppath).read_bytes())
        corrupted[12] ^= 0xFF  # first roaring-vector byte, CRC now wrong
        _P(ppath).write_bytes(bytes(corrupted))
        try:
            read_iceberg_table(spark, table.location)[0].count()
            crc_refused = False
        except ValueError as e:
            # pin the CRC path specifically, not just "some refusal"
            crc_refused = "CRC mismatch" in str(e)
        out = (
            external.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("crc_refused", F.lit(crc_refused))
        )
        # materialize before the temp dir vanishes (bounded agg)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)


@query(
    "a41_v3_row_lineage_episode",
    # The oracle replays the ASSIGNMENT ARITHMETIC, not the reader:
    # appends of n1 then n2 rows occupy exactly [0, n1) and
    # [n1, n1+n2) of the row-id space (the v3 contract), so per-append
    # count / min / max / sum of _row_id are order-independent
    # closed forms over the same source slices.
    oracle="""
    WITH c AS (
      SELECT 1 AS last_seq, COUNT(*) AS n
      FROM orders WHERE o_orderkey <= 1200
      UNION ALL
      SELECT 2, COUNT(*)
      FROM orders WHERE o_orderkey > 1200 AND o_orderkey <= 2000
    ),
    b AS (
      SELECT last_seq, n,
             COALESCE(SUM(n) OVER (ORDER BY last_seq
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS base
      FROM c
    )
    SELECT CAST(last_seq AS BIGINT) AS last_seq,
           CAST(n AS BIGINT) AS n_rows,
           CAST(n AS BIGINT) AS n_distinct_ids,
           CAST(base AS BIGINT) AS min_row_id,
           CAST(base + n - 1 AS BIGINT) AS max_row_id,
           CAST(n * base + n * (n - 1) / 2 AS BIGINT) AS sum_row_id
    FROM b
    """,
)
def a41_v3_row_lineage_episode(spark: SparkSession, sf: str) -> DataFrame:
    """Iceberg v3 ROW LINEAGE read (r15, VERDICT r14 item 4): append
    two slices as two snapshots, export format_version=3 (the write
    side records per-snapshot first-row-id / next-row-id), then read
    the export back with ``lineage=True`` and aggregate the derived
    ``_row_id`` / ``_last_updated_sequence_number`` columns per
    snapshot. The gate pins the whole assignment contract: each
    append's rows occupy a contiguous, disjoint id block in commit
    order, every id is distinct, and the lineage sequence number is
    the committing snapshot's. A v2 twin of the same table must
    refuse the lineage request loudly."""
    src = t(spark, sf, "orders").filter(F.col("o_orderkey") <= 2000)
    with tempfile.TemporaryDirectory(prefix="v3_lineage_") as wh:
        cat = LakeCatalog(wh)
        schema = (
            spark.range(1)
            .selectExpr(
                "cast(id as long) o_orderkey",
                "cast('' as string) o_orderpriority",
            )
            .schema
        )
        table = cat.create_table("gate", "lint", schema)
        table.append(
            src.filter("o_orderkey <= 1200")
            .select("o_orderkey", "o_orderpriority")
            .repartition(2)
        )
        table = cat.load_table("gate", "lint")
        table.append(
            src.filter("o_orderkey > 1200")
            .select("o_orderkey", "o_orderpriority")
            .repartition(2)
        )
        table = cat.load_table("gate", "lint")
        export_to_iceberg(table, spark=spark, format_version=3)
        external, doc = read_iceberg_table(
            spark, table.location, lineage=True
        )
        assert doc["format-version"] == 3 and "next-row-id" in doc
        out = (
            external.groupBy(
                F.col("_last_updated_sequence_number").alias("last_seq")
            )
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.countDistinct("_row_id").alias("n_distinct_ids"),
                F.min("_row_id").alias("min_row_id"),
                F.max("_row_id").alias("max_row_id"),
                F.sum("_row_id").alias("sum_row_id"),
            )
        )
        # materialize before the temp dir vanishes (bounded agg)
        rows = out.collect()
        # the v2 export twin refuses the lineage request loudly
        export_to_iceberg(table, spark=spark, format_version=2)
        try:
            read_iceberg_table(spark, table.location, lineage=True)
            raise AssertionError("v2 lineage read did not refuse")
        except ValueError as e:
            assert "format-version 3" in str(e)
        return spark.createDataFrame(rows, out.schema)


@query(
    "a42_engine_row_lineage_episode",
    # Same order-independent closed form as a41 (appends occupy
    # contiguous disjoint id blocks), plus the cross-layer invariant
    # flag: the engine's own lineage scan and the external Iceberg
    # reader consuming the v3 export's EXPLICIT avro-level
    # first_row_id fields must assign identical ids.
    oracle="""
    WITH c AS (
      SELECT 1 AS last_seq, COUNT(*) AS n
      FROM orders WHERE o_orderkey <= 1200
      UNION ALL
      SELECT 2, COUNT(*)
      FROM orders WHERE o_orderkey > 1200 AND o_orderkey <= 2000
    ),
    b AS (
      SELECT last_seq, n,
             COALESCE(SUM(n) OVER (ORDER BY last_seq
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS base
      FROM c
    )
    SELECT CAST(last_seq AS BIGINT) AS last_seq,
           CAST(n AS BIGINT) AS n_rows,
           CAST(base AS BIGINT) AS min_row_id,
           CAST(base + n - 1 AS BIGINT) AS max_row_id,
           TRUE AS engine_external_match
    FROM b
    """,
)
def a42_engine_row_lineage_episode(spark: SparkSession, sf: str) -> DataFrame:
    """ENGINE-NATIVE row lineage (r15, a42): plain append commits
    assign each data file a first_row_id in the commit manifest and
    track next_row_id in table metadata; ``lineage_df`` surfaces
    ``_row_id`` / ``_last_updated_sequence_number`` over the engine's
    own scan (merge-on-read deletes never shift survivor ids — ids
    are positional). The v3 export then materializes the RECORDED
    assignments as explicit avro-level fields (data_file 142,
    manifest-list 520) — closing the conformance-row-39 divergence —
    and the external reader (a41's explicit-fields path) must derive
    the exact same ids from those bytes. The gate pins both the
    assignment arithmetic and the engine==external invariant."""
    src = t(spark, sf, "orders").filter(F.col("o_orderkey") <= 2000)
    with tempfile.TemporaryDirectory(prefix="a42_lineage_") as wh:
        cat = LakeCatalog(wh)
        schema = (
            spark.range(1)
            .selectExpr("cast(id as long) o_orderkey")
            .schema
        )
        table = cat.create_table("gate", "elin", schema)
        table.append(
            src.filter("o_orderkey <= 1200")
            .select("o_orderkey").repartition(2)
        )
        table = cat.load_table("gate", "elin")
        table.append(
            src.filter("o_orderkey > 1200")
            .select("o_orderkey").repartition(2)
        )
        table = cat.load_table("gate", "elin")
        engine = table.lineage_df(spark)
        # bounded episode metadata: the gate-sized id map both sides
        # of the engine==external invariant compare against
        engine_rows = engine.collect()
        engine_ids = {
            r.o_orderkey: (r._row_id, r._last_updated_sequence_number)
            for r in engine_rows
        }
        export_to_iceberg(table, spark=spark, format_version=3)
        external, doc = read_iceberg_table(
            spark, table.location, lineage=True
        )
        # bounded episode metadata: same gate-sized invariant map
        ext_rows = external.collect()
        ext_ids = {
            r.o_orderkey: (r._row_id, r._last_updated_sequence_number)
            for r in ext_rows
        }
        match = engine_ids == ext_ids and doc["next-row-id"] == int(
            table.meta["next_row_id"]
        )
        out = (
            engine.groupBy(
                F.col("_last_updated_sequence_number").alias("last_seq")
            )
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.min("_row_id").alias("min_row_id"),
                F.max("_row_id").alias("max_row_id"),
            )
            .withColumn("engine_external_match", F.lit(bool(match)))
        )
        # materialize before the temp dir vanishes (bounded agg)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)


@query(
    "a43_lineage_through_compaction_episode",
    # Closed form because the hashed VALUES are deletion-predicate
    # aggregates (survivor counts + key sums per original append
    # block) — survivor _row_ids themselves depend on physical file
    # order, so they gate through the two invariant flags instead:
    # ids_stable (per-key (_row_id, seq) map identical before and
    # after compact()) and engine_external_match (post-compaction
    # engine lineage == external Iceberg reader over the v3 export).
    oracle="""
    SELECT CAST(1 AS BIGINT) AS last_seq,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
           TRUE AS ids_stable, TRUE AS engine_external_match
    FROM orders WHERE o_orderkey <= 1200 AND o_orderkey % 10 <> 3
    UNION ALL
    SELECT CAST(2 AS BIGINT),
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(o_orderkey) AS BIGINT),
           TRUE, TRUE
    FROM orders
    WHERE o_orderkey > 1200 AND o_orderkey <= 2000
      AND o_orderkey % 10 <> 3
    """,
)
def a43_lineage_through_compaction_episode(
    spark: SparkSession, sf: str
) -> DataFrame:
    """Row lineage THROUGH REWRITES (r16, a43 — VERDICT r15 item 2,
    the spec's `_row_id` column materialization): ``compact()`` on a
    fully-assigned table derives each surviving row's lineage BEFORE
    the rewrite and writes ``_row_id`` /
    ``_last_updated_sequence_number`` as physical columns in the
    compacted files; the rewrite commit consumes a fresh
    ``first_row_id`` block as the null-slot inheritance base.
    ``lineage_df`` coalesces materialized values over positional
    derivation, so a compaction no longer forfeits lineage — and the
    v3 export references the materialized files in place, so the
    external Iceberg reader derives the identical ids (the spec rule:
    materialized ``_row_id`` takes precedence over inheritance).

    Episode: two appends (seq 1, 2) → merge-on-read DELETE (keys
    ending in 3) → ``compact()`` → survivor ids UNCHANGED (flag 1),
    engine == external over the export (flag 2). Reference parity:
    the reference's only write is an append
    (/root/reference/lambda/data_generator.py:79); lineage-preserving
    maintenance is engine surface it has no analog for."""
    src = t(spark, sf, "orders").filter(F.col("o_orderkey") <= 2000)
    with tempfile.TemporaryDirectory(prefix="a43_lineage_") as wh:
        cat = LakeCatalog(wh)
        schema = (
            spark.range(1)
            .selectExpr("cast(id as long) o_orderkey")
            .schema
        )
        table = cat.create_table("gate", "clin", schema)
        table.append(
            src.filter("o_orderkey <= 1200")
            .select("o_orderkey").repartition(2)
        )
        table = cat.load_table("gate", "clin")
        table.append(
            src.filter("o_orderkey > 1200")
            .select("o_orderkey").repartition(2)
        )
        table = cat.load_table("gate", "clin")
        table.delete_where(
            spark, "o_orderkey % 10 = 3", strategy="merge_on_read"
        )
        table = cat.load_table("gate", "clin")
        # bounded episode metadata: the gate-sized survivor id map
        # both invariants compare against
        pre = {
            r.o_orderkey: (r._row_id, r._last_updated_sequence_number)
            # bounded episode metadata (gate-sized)
            for r in table.lineage_df(spark).collect()
        }
        table.compact(spark)
        table = cat.load_table("gate", "clin")
        engine = table.lineage_df(spark)
        post = {
            r.o_orderkey: (r._row_id, r._last_updated_sequence_number)
            # bounded episode metadata (gate-sized)
            for r in engine.collect()
        }
        ids_stable = pre == post
        export_to_iceberg(table, spark=spark, format_version=3)
        external, doc = read_iceberg_table(
            spark, table.location, lineage=True
        )
        ext = {
            r.o_orderkey: (r._row_id, r._last_updated_sequence_number)
            # bounded episode metadata (gate-sized)
            for r in external.collect()
        }
        match = post == ext and doc["next-row-id"] == int(
            table.meta["next_row_id"]
        )
        out = (
            engine.groupBy(
                F.col("_last_updated_sequence_number").alias("last_seq")
            )
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("o_orderkey").alias("sum_key"),
            )
            .withColumn("ids_stable", F.lit(bool(ids_stable)))
            .withColumn("engine_external_match", F.lit(bool(match)))
        )
        # materialize before the temp dir vanishes (bounded agg)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)


@query(
    "a44_v3_variant_decode",
    # The oracle replays the deterministic JSON rendering contract
    # (module doc of variant.py): sorted keys, ints unquoted, strings
    # quoted — plain SQL string building over the same source rows.
    oracle="""
    SELECT o_orderkey,
           '{"k":' || o_orderkey || ',"p":"' || o_orderpriority || '"}'
             AS payload_json
    FROM orders WHERE o_orderkey <= 800
    """,
)
def a44_v3_variant_decode(spark: SparkSession, sf: str) -> DataFrame:
    """Iceberg-v3 VARIANT decode kernel (r16 — VERDICT r15 item 5):
    unshredded variant pairs (metadata/value binaries per the PUBLIC
    Parquet VariantEncoding spec, variant.py) written into a parquet
    fixture, then decoded DISTRIBUTED through the same Arrow-batched
    pandas UDF the external Iceberg reader applies
    (iceberg_export._variant_json_udf) and hash-gated against a plain
    SQL rendering of the same rows. Full read_iceberg_table
    integration — metadata-time type routing, per-file shredded
    refusal, null rows — is pinned by
    tests/test_iceberg_foreign_read.py::test_v3_unshredded_variant_decodes
    on an Avro-Java-written v3 fixture (conformance row 43)."""
    import pyarrow as pa  # noqa: PLC0415
    import pyarrow.parquet as pq  # noqa: PLC0415

    from ..iceberg_export import _variant_json_udf  # noqa: PLC0415
    from ..variant import encode_variant  # noqa: PLC0415

    src = (
        t(spark, sf, "orders")
        .filter(F.col("o_orderkey") <= 800)
        .select("o_orderkey", "o_orderpriority")
    )
    # bounded episode fixture build (gate-sized, like the ddl gate
    # tables): the DISTRIBUTED surface under test is the decode scan
    # bounded episode metadata (gate-sized)
    rows = src.collect()
    payload = pa.array(
        [
            dict(
                zip(
                    ("metadata", "value"),
                    encode_variant(
                        {"k": r.o_orderkey, "p": r.o_orderpriority}
                    ),
                )
            )
            for r in rows
        ],
        type=pa.struct(
            [("metadata", pa.binary()), ("value", pa.binary())]
        ),
    )
    with tempfile.TemporaryDirectory(prefix="a44_variant_") as d:
        fp = f"{d}/variant.parquet"
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array(
                        [r.o_orderkey for r in rows], pa.int64()
                    ),
                    "payload": payload,
                }
            ),
            fp,
        )
        out = (
            spark.read.parquet(fp)
            .repartition(8)  # the decode runs executor-parallel
            .select(
                "o_orderkey",
                _variant_json_udf()(F.col("payload")).alias(
                    "payload_json"
                ),
            )
        )
        # materialize before the temp dir vanishes (bounded episode)
        mat = out.collect()
        return spark.createDataFrame(mat, out.schema)


@query(
    "a45_lineage_through_cow_dml_episode",
    # Hashed values are closed-form DML-group aggregates (counts +
    # key sums per _last_updated_sequence_number after deterministic
    # CoW UPDATE and MERGE); id behavior gates through the flags:
    # ids_stable (every pre-DML row keeps its _row_id through both
    # rewrites) and engine_external_match (post-DML engine lineage ==
    # external Iceberg reader over the v3 export).
    oracle="""
    WITH t AS (
      SELECT o_orderkey AS k,
             CASE WHEN o_orderkey <= 1200 THEN 1 ELSE 2 END AS seq0
      FROM orders WHERE o_orderkey <= 2000
    ),
    final AS (
      SELECT k,
             CASE WHEN k <= 100 THEN 4
                  WHEN k % 7 = 0 THEN 3
                  ELSE seq0 END AS last_seq
      FROM t
      UNION ALL
      SELECT 2000001, 4
      UNION ALL
      SELECT 2000002, 4
    )
    SELECT CAST(last_seq AS BIGINT) AS last_seq,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(k) AS BIGINT) AS sum_key,
           TRUE AS ids_stable, TRUE AS engine_external_match
    FROM final GROUP BY last_seq
    """,
)
def a45_lineage_through_cow_dml_episode(
    spark: SparkSession, sf: str
) -> DataFrame:
    """Row lineage through COPY-ON-WRITE DML (r16, a45 — extends a43
    beyond compaction): CoW UPDATE keeps every row's ``_row_id`` and
    bumps ``_last_updated_sequence_number`` on exactly the updated
    rows; CoW MERGE keeps carried ids, bumps matched-updated rows,
    and inserts take fresh positional ids from the commit's
    first_row_id block (the spec's null-slot inheritance). All via
    the a43 machinery — lineage rides the rewrites as physical
    columns, the v3 export references them in place, and the external
    reader derives identical ids.

    Episode: two appends (seq 1, 2) → CoW UPDATE keys divisible by 7
    (seq 3) → CoW MERGE updating keys <= 100 and inserting two new
    keys (seq 4) → per-sequence aggregates + the two invariants."""
    src = t(spark, sf, "orders").filter(F.col("o_orderkey") <= 2000)
    with tempfile.TemporaryDirectory(prefix="a45_cow_") as wh:
        cat = LakeCatalog(wh)
        schema = (
            spark.range(1)
            .selectExpr(
                "cast(id as long) o_orderkey",
                "cast(0.0 as double) price",
            )
            .schema
        )
        table = cat.create_table("gate", "cowlin", schema)
        table.append(
            src.filter("o_orderkey <= 1200")
            .selectExpr("o_orderkey", "cast(o_totalprice as double) price")
            .repartition(2)
        )
        table = cat.load_table("gate", "cowlin")
        table.append(
            src.filter("o_orderkey > 1200")
            .selectExpr("o_orderkey", "cast(o_totalprice as double) price")
            .repartition(2)
        )
        table = cat.load_table("gate", "cowlin")
        pre = {
            r.o_orderkey: r._row_id
            # bounded episode metadata (gate-sized)
            for r in table.lineage_df(spark).collect()
        }
        table.update_where(
            spark,
            "o_orderkey % 7 = 0",
            {"price": "price + 1.0"},
            strategy="copy_on_write",
        )
        table = cat.load_table("gate", "cowlin")
        merge_src = spark.createDataFrame(
            [(2000001, 1.0), (2000002, 2.0)],
            "o_orderkey bigint, price double",
        ).unionByName(
            src.filter("o_orderkey <= 100").selectExpr(
                "o_orderkey", "cast(0.5 as double) price"
            )
        )
        table.merge_into(
            spark,
            merge_src,
            ["o_orderkey"],
            when_matched_update={"price": "s_price"},
            strategy="copy_on_write",
        )
        table = cat.load_table("gate", "cowlin")
        engine = table.lineage_df(spark)
        post = {
            r.o_orderkey: (r._row_id, r._last_updated_sequence_number)
            # bounded episode metadata (gate-sized)
            for r in engine.collect()
        }
        ids_stable = all(
            post[k][0] == rid for k, rid in pre.items()
        ) and len({v[0] for v in post.values()}) == len(post)
        export_to_iceberg(table, spark=spark, format_version=3)
        external, doc = read_iceberg_table(
            spark, table.location, lineage=True
        )
        ext = {
            r.o_orderkey: (r._row_id, r._last_updated_sequence_number)
            # bounded episode metadata (gate-sized)
            for r in external.collect()
        }
        match = post == ext and doc["next-row-id"] == int(
            table.meta["next_row_id"]
        )
        out = (
            engine.groupBy(
                F.col("_last_updated_sequence_number").alias("last_seq")
            )
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("o_orderkey").alias("sum_key"),
            )
            .withColumn("ids_stable", F.lit(bool(ids_stable)))
            .withColumn("engine_external_match", F.lit(bool(match)))
        )
        # materialize before the temp dir vanishes (bounded agg)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
