"""FileIO contract tests: the catalog's metadata plane must behave
identically over the local filesystem and an object-store-model fake
(dict-backed blobs, prefix-implied directories) — proving an S3
metadata backend is one FileIO subclass away, the reference's Glue/S3
posture (iceberg_helper.py:89-110) without network."""

from __future__ import annotations

import pytest

from pyspark.sql import types as T

from sample_iceberg_schema_evolution_pyiceberg_spark.fileio import (
    InMemoryFileIO,
    LocalFileIO,
)
from sample_iceberg_schema_evolution_pyiceberg_spark.partitioning import (
    PartitionField,
    PartitionSpec,
)
from sample_iceberg_schema_evolution_pyiceberg_spark.table_format import (
    LakeCatalog,
    TableFormatError,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("v", T.StringType(), True),
    ]
)


@pytest.fixture(params=["local", "memory"])
def catalog(request, tmp_path):
    if request.param == "local":
        return LakeCatalog(tmp_path / "wh", io=LocalFileIO())
    # the fake needs no real directory; use a path that must NOT exist
    # on disk afterwards (asserted below)
    return LakeCatalog(tmp_path / "mem_wh", io=InMemoryFileIO())


def test_catalog_metadata_contract(catalog, tmp_path):
    assert not catalog.table_exists("db", "t")
    assert catalog.load_table("db", "t") is None
    assert catalog.list_tables() == []

    spec = PartitionSpec((PartitionField("v", "identity", "v", 1000),))
    table = catalog.create_table("db", "t", SCHEMA, spec, {"k": "val"})
    assert catalog.table_exists("db", "t")
    with pytest.raises(TableFormatError):
        catalog.create_table("db", "t", SCHEMA)

    # load round-trips the committed metadata through the same io
    loaded = catalog.load_table("db", "t")
    assert loaded is not None
    assert loaded.schema == SCHEMA
    assert loaded.properties == {"k": "val"}
    assert loaded.partition_spec.fields[0].transform == "identity"

    # metadata-only evolution commits version 2 and survives reload
    new_schema = T.StructType(
        [*SCHEMA.fields, T.StructField("added", T.DoubleType(), True)]
    )
    loaded.commit_schema(new_schema)
    assert catalog.load_table("db", "t").schema == new_schema
    assert loaded.refresh().schema == new_schema

    catalog.create_table("db2", "u", SCHEMA)
    assert catalog.list_tables() == [("db", "t"), ("db2", "u")]

    catalog.drop_table("db", "t")
    assert not catalog.table_exists("db", "t")
    assert catalog.list_tables() == [("db2", "u")]

    # the fake must never have touched the real filesystem
    if isinstance(catalog.io, InMemoryFileIO):
        assert not (tmp_path / "mem_wh").exists()


def test_memory_io_blob_semantics():
    io = InMemoryFileIO()
    io.write_text("/a/b/c.txt", "x")
    assert io.exists("/a/b/c.txt")
    assert io.exists("/a/b")
    assert io.read_text("/a/b/c.txt") == "x"
    io.mkdirs("/a/d")
    assert io.list_subdirs("/a") == ["b", "d"]
    io.delete_recursive("/a/b")
    assert not io.exists("/a/b/c.txt")
    assert io.list_subdirs("/a") == ["d"]
    with pytest.raises(FileNotFoundError):
        io.read_text("/a/b/c.txt")


def test_data_plane_still_works_with_explicit_local_io(spark, tmp_path):
    """End-to-end (metadata via FileIO, data via Spark): append + scan
    must behave exactly as before the indirection."""
    from pyspark.sql import Row

    catalog = LakeCatalog(tmp_path / "wh", io=LocalFileIO())
    table = catalog.create_table("db", "t", SCHEMA)
    table.append(
        spark.createDataFrame([Row(id=1, v="a"), Row(id=2, v="b")], SCHEMA)
    )
    got = sorted(r["v"] for r in table.to_df(spark).collect())
    assert got == ["a", "b"]


def test_ddl_control_plane_over_memory_io(spark, tmp_path):
    """The SQL control plane (CREATE/ALTER/DROP — metadata-only
    statements) must run entirely against the object-store-model
    backend: schema evolution through DDL strings with not one byte on
    the local filesystem."""
    from sample_iceberg_schema_evolution_pyiceberg_spark.ddl import DdlFrontend

    io = InMemoryFileIO()
    catalog = LakeCatalog(tmp_path / "mem_wh", io=io)
    ddl = DdlFrontend(spark, catalog)
    for stmt in [
        "CREATE TABLE db.t (id BIGINT NOT NULL, v STRING, "
        "meta STRUCT<src: STRING>) PARTITIONED BY (id)",
        "ALTER TABLE db.t ADD COLUMN added DOUBLE",
        "ALTER TABLE db.t ADD COLUMN meta.tag STRING",
        "ALTER TABLE db.t ALTER COLUMN added FIRST",
        "ALTER TABLE db.t DROP COLUMN v",
    ]:
        r = ddl.sql(stmt)
        assert not r.has_error, (stmt, r.message_list)
    table = catalog.load_table("db", "t")
    names = [f.name for f in table.schema.fields]
    assert names == ["added", "id", "meta"]
    assert [f.name for f in table.schema["meta"].dataType.fields] == [
        "src", "tag",
    ]
    # five metadata versions committed (create + 4 alters), all in the
    # fake, nothing on disk
    assert io.read_text(str(table.location / "_meta" / "version-hint.text"))
    assert not (tmp_path / "mem_wh").exists()
    r = ddl.sql("DROP TABLE db.t")
    assert not r.has_error
    assert catalog.list_tables() == []


def test_local_write_text_is_atomic_overwrite(tmp_path):
    """Metadata writes must never be observable half-written: the
    version-hint torn-read race (streaming source worker reading an
    empty hint mid-commit) is prevented by temp-file + rename."""
    import os
    from sample_iceberg_schema_evolution_pyiceberg_spark.fileio import LocalFileIO

    io = LocalFileIO()
    p = str(tmp_path / "ns" / "version-hint.text")
    io.write_text(p, "1")
    io.write_text(p, "2")
    assert io.read_text(p) == "2"
    # no temp debris left beside the target
    assert os.listdir(tmp_path / "ns") == ["version-hint.text"]
