"""Driver-gate queries for the SQL DDL front-end (ddl.py) and the
Iceberg v1 exporter (iceberg_export.py): both run their full pipeline
in a scratch warehouse and emit deterministic, oracle-checkable rows.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ddl import DdlFrontend
from ..iceberg_export import export_to_iceberg, read_iceberg_table
from ..schema_diff import flatten
from ..table_format import LakeCatalog
from ..partitioning import PartitionField, PartitionSpec
from .evolution_queries import _type_name
from .registry import query, t

_CREATE_V1 = """
CREATE TABLE customer_order.orders (
    order_time TIMESTAMP_NTZ,
    customer_name STRING,
    address STRUCT<city: STRING, state: STRING>,
    order_items ARRAY<STRUCT<item_id: STRING NOT NULL,
                             price: FLOAT NOT NULL>> NOT NULL
) PARTITIONED BY (year(order_time))
"""

_ALTER_V2 = [
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
        for stmt in [_CREATE_V1, *_ALTER_V2]:
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
