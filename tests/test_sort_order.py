"""Declared table sort order (write.sort-order): declaration surfaces
(CREATE properties, SET/UNSET TBLPROPERTIES, compact sort_by), sorted
writes, manifest-bounds pruning, export, and the guard rails.

Reference parity note: the reference's tables carry Iceberg metadata
whose ``sort-orders`` / ``default-sort-order-id`` a sorted write path
consumes; the reference itself never declares one (its only write is
an unsorted append, data_generator.py:79) — this is the production
surface its users would reach for first. No code copied.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from sample_iceberg_schema_evolution_pyiceberg_spark.ddl import DdlFrontend
from sample_iceberg_schema_evolution_pyiceberg_spark.iceberg_export import (
    export_to_iceberg,
)
from sample_iceberg_schema_evolution_pyiceberg_spark.table_format import (
    LakeCatalog,
    LakeTable,
    TableFormatError,
    parse_sort_order,
)


def _source(spark, n=20000):
    return (
        spark.range(0, n)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 7).alias("g"),
            F.rand(42).alias("v"),
        )
        # deliberately unsorted: layout must come from the WRITE
        .orderBy(F.md5(F.col("id").cast("string")))
    )


@pytest.fixture()
def wh(tmp_path):
    return str(tmp_path / "wh")


def test_parse_sort_order_shapes(spark):
    schema = _source(spark).schema
    assert parse_sort_order("k", schema) == [
        {"column": "k", "direction": "asc", "null-order": "nulls-first"}
    ]
    # DESC defaults nulls-last (Iceberg + Spark convention)
    assert parse_sort_order("k DESC, g NULLS LAST", schema) == [
        {"column": "k", "direction": "desc", "null-order": "nulls-last"},
        {"column": "g", "direction": "asc", "null-order": "nulls-last"},
    ]
    with pytest.raises(TableFormatError, match="not in schema"):
        parse_sort_order("nope", schema)
    with pytest.raises(TableFormatError, match="unparseable"):
        parse_sort_order("k SIDEWAYS", schema)


def test_sorted_appends_tile_bounds_and_prune(spark, wh):
    """The a20 manifest-pruning seam criterion: a sorted table's
    bounds prune MORE files than an unsorted twin of the same data."""
    df = _source(spark)
    cat = LakeCatalog(wh)
    sorted_t = cat.create_table(
        "d",
        "s",
        df.schema,
        properties={
            "write.sort-order": "k",
            "write.target-file-size-bytes": "40000",
        },
    )
    plain_t = cat.create_table(
        "d",
        "p",
        df.schema,
        properties={"write.target-file-size-bytes": "40000"},
    )
    sorted_t.append(df)
    plain_t.append(df)
    pred = [("k", "<=", 1000)]
    s_full = len(sorted_t.to_df(spark).inputFiles())
    s_pruned = len(sorted_t.to_df(spark, pruning=pred).inputFiles())
    p_pruned = len(plain_t.to_df(spark, pruning=pred).inputFiles())
    assert s_full > 2
    assert s_pruned < p_pruned, (s_pruned, p_pruned)
    # value identity: pruning never changes the answer
    assert sorted_t.to_df(spark, pruning=pred).filter(
        F.col("k") <= 1000
    ).count() == 1001
    # and the sorted files' bounds tile (non-overlapping ranges)
    spans = sorted(
        (f["stats"]["k"][0], f["stats"]["k"][1])
        for f in sorted_t.snapshots[-1].files
    )
    assert all(
        spans[i][1] <= spans[i + 1][0] for i in range(len(spans) - 1)
    ), spans


def test_declaration_survives_reload_and_plain_compact(spark, wh):
    df = _source(spark, 5000)
    cat = LakeCatalog(wh)
    t = cat.create_table(
        "d", "s", df.schema, properties={"write.sort-order": "k DESC"}
    )
    t.append(df)
    t2 = LakeTable.load(t.location)
    assert t2.sort_order_fields == [
        {"column": "k", "direction": "desc", "null-order": "nulls-last"}
    ]
    # plain maintenance applies (not destroys) the declared order
    t2.compact(spark, target_files=4)
    assert t2.sort_order_fields, "compact() dropped the declared order"
    assert t2.to_df(spark).count() == 5000


def test_compact_sort_by_mirrors_into_property(spark, wh):
    df = _source(spark, 5000)
    cat = LakeCatalog(wh)
    t = cat.create_table("d", "s", df.schema)
    t.append(df)
    t.compact(spark, sort_by=["g"], target_files=4)
    assert t.properties["write.sort-order"] == "g"
    assert t.sort_order_fields[0]["column"] == "g"
    # the property now drives future declaration refreshes
    t.refresh_declared_sort_order()
    assert t.sort_order_fields[0]["column"] == "g"


def test_set_unset_tblproperties_declaration(spark, wh):
    df = _source(spark, 2000)
    cat = LakeCatalog(wh)
    ddl = DdlFrontend(spark, cat)
    cat.create_table("d", "s", df.schema)
    r = ddl.sql(
        "ALTER TABLE d.s SET TBLPROPERTIES ('write.sort-order' = 'k DESC')"
    )
    assert not r.has_error, r.message_list
    t = cat.load_table("d", "s")
    assert t.sort_order_fields[0]["direction"] == "desc"
    # invalid declaration fails the ALTER, and nothing commits
    r = ddl.sql(
        "ALTER TABLE d.s SET TBLPROPERTIES ('write.sort-order' = 'nope')"
    )
    assert r.has_error
    t = cat.load_table("d", "s")
    assert t.sort_order_fields[0]["column"] == "k"
    r = ddl.sql("ALTER TABLE d.s UNSET TBLPROPERTIES ('write.sort-order')")
    assert not r.has_error, r.message_list
    t = cat.load_table("d", "s")
    assert t.sort_order_fields == []


def test_bucket_layout_conflict_rejected(spark, wh):
    from sample_iceberg_schema_evolution_pyiceberg_spark.partitioning import (
        PartitionField,
        PartitionSpec,
    )

    df = _source(spark, 100)
    cat = LakeCatalog(wh)
    spec = PartitionSpec([PartitionField("k", "bucket[4]", "k_bucket", 1000)])
    with pytest.raises(TableFormatError, match="bucket-layout"):
        cat.create_table(
            "d",
            "b",
            df.schema,
            partition_spec=spec,
            properties={
                "write.bucket-layout": "spark",
                "write.sort-order": "g",
            },
        )


def test_export_carries_real_sort_order(spark, wh):
    df = _source(spark, 2000)
    cat = LakeCatalog(wh)
    t = cat.create_table(
        "d",
        "s",
        df.schema,
        properties={"write.sort-order": "k DESC NULLS LAST, g"},
    )
    t.append(df)
    meta_dir = export_to_iceberg(t)
    doc = json.loads(
        sorted(meta_dir.glob("v*.metadata.json"))[-1].read_text()
    )
    assert doc["default-sort-order-id"] == 1
    orders = {o["order-id"]: o for o in doc["sort-orders"]}
    assert orders[0]["fields"] == []  # the unsorted baseline stays
    got = orders[1]["fields"]
    assert [f["direction"] for f in got] == ["desc", "asc"]
    assert [f["null-order"] for f in got] == ["nulls-last", "nulls-first"]
    # source-ids resolve within the exported schema
    schema_ids = {
        f["id"]
        for d in doc["schemas"]
        for f in d["fields"]
    }
    assert all(f["source-id"] in schema_ids for f in got)
    # an unsorted table keeps the empty default
    t2 = cat.create_table("d", "u", df.schema)
    t2.append(df)
    doc2 = json.loads(
        sorted(export_to_iceberg(t2).glob("v*.metadata.json"))[-1].read_text()
    )
    assert doc2["default-sort-order-id"] == 0


def test_write_ordered_by_ddl_verbs(spark, wh):
    """Iceberg's own DDL spelling: ALTER TABLE ... WRITE ORDERED BY /
    WRITE UNORDERED — sugar over the write.sort-order property."""
    df = _source(spark, 1000)
    cat = LakeCatalog(wh)
    ddl = DdlFrontend(spark, cat)
    cat.create_table("d", "s", df.schema)
    r = ddl.sql("ALTER TABLE d.s WRITE ORDERED BY k DESC NULLS LAST, g")
    assert not r.has_error, r.message_list
    t = cat.load_table("d", "s")
    assert t.sort_order_fields == [
        {"column": "k", "direction": "desc", "null-order": "nulls-last"},
        {"column": "g", "direction": "asc", "null-order": "nulls-first"},
    ]
    assert t.properties["write.sort-order"] == "k DESC NULLS LAST, g"
    # bad column fails the DDL; committed state unchanged
    r = ddl.sql("ALTER TABLE d.s WRITE ORDERED BY nope")
    assert r.has_error
    assert cat.load_table("d", "s").sort_order_fields[0]["column"] == "k"
    r = ddl.sql("ALTER TABLE d.s WRITE UNORDERED")
    assert not r.has_error, r.message_list
    t = cat.load_table("d", "s")
    assert t.sort_order_fields == []
    assert "write.sort-order" not in t.properties


def test_streaming_sink_honors_declared_sort_order(spark, wh):
    """Composition: a lake SINK table with a declared sort order gets
    sorted, bounds-tiled files from every micro-batch append — the
    streaming path and the batch path share _write_files, so the
    declaration applies to both without sink-side code."""
    df = _source(spark, 6000)
    cat = LakeCatalog(wh)
    t = cat.create_table(
        "s",
        "sink",
        df.schema,
        properties={
            "write.sort-order": "k",
            "write.target-file-size-bytes": "20000",
        },
    )

    def _sink(bdf, _bid):
        t.append(bdf)

    q = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", "2000")
        .option("numPartitions", "2")
        .load()
        .selectExpr(
            "value * 7 % 6000 as k",  # deliberately unsorted stream
            "value % 7 as g",
            "cast(value as double) as v",
        )
        .writeStream.foreachBatch(_sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(Path(wh) / "_chk"))
        .start()
    )
    assert q.awaitTermination(120), "stream did not drain"
    snaps = [s for s in t.snapshots if s.files]
    assert snaps, "no appends landed"
    for s in snaps:
        spans = sorted(
            (f["stats"]["k"][0], f["stats"]["k"][1]) for f in s.files
        )
        # bounds tile WITHIN each micro-batch append
        assert all(
            spans[i][1] <= spans[i + 1][0]
            for i in range(len(spans) - 1)
        ), (s.snapshot_id, spans)
