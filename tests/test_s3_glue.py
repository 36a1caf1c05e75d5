"""Real-boto3 backend tests against moto: the S3 metadata plane and
the reference's config-from-S3 load, exercised with the actual AWS
client library instead of the in-repo fakes.

Two moto modes are used deliberately:

- ``moto.mock_aws()`` (in-process botocore patching) for driver-only
  paths — store primitives, atomic commit, DDL, config load;
- ``ThreadedMotoServer`` (a real local HTTP endpoint) for the
  streaming round trip, because the log-driven source's reader runs
  in a SEPARATE Python worker process that must reach the store over
  the network exactly as a deployed reader reaches S3. Credentials
  resolve through the standard AWS chain (dummy env set in conftest
  before the JVM starts), never through serialized options.

Reference posture being modeled: boto3 S3 config loads
(lambda_helper.py:81-99) and a Glue/S3 warehouse (iceberg_helper.py:
89-110). No code copied; the reference drives pyiceberg, this repo
drives its own table format.
"""

from __future__ import annotations

import json

import pytest

moto = pytest.importorskip("moto")
boto3 = pytest.importorskip("boto3")

from pyspark.sql import types as T  # noqa: E402

from sample_iceberg_schema_evolution_pyiceberg_spark.fileio import (  # noqa: E402
    ObjectStoreFileIO,
    S3ObjectStore,
    fileio_from_options,
)
from sample_iceberg_schema_evolution_pyiceberg_spark.table_format import (  # noqa: E402
    LakeCatalog,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("v", T.StringType(), True),
    ]
)


@pytest.fixture
def s3_store():
    with moto.mock_aws():
        boto3.client("s3", region_name="us-east-1").create_bucket(
            Bucket="graft-meta"
        )
        yield S3ObjectStore("graft-meta", prefix="wh")


def test_s3_store_primitive_semantics(s3_store):
    """put/get/delete/list over real boto3 calls: whole-object PUT,
    idempotent DELETE, prefix listing — byte-for-byte the contract the
    fakes model."""
    s3_store.put_object("db/t/_meta/v1.json", b"{}")
    s3_store.put_object("db/t/data/f1.bin", b"\x00\x01")
    assert s3_store.get_object("db/t/data/f1.bin") == b"\x00\x01"
    assert s3_store.list_objects("db/t") == [
        "db/t/_meta/v1.json",
        "db/t/data/f1.bin",
    ]
    assert s3_store.list_objects("db/other") == []
    # overwrite is a whole-object replace, not an append
    s3_store.put_object("db/t/_meta/v1.json", b'{"x": 1}')
    assert s3_store.get_object("db/t/_meta/v1.json") == b'{"x": 1}'
    s3_store.delete_object("db/t/data/f1.bin")
    s3_store.delete_object("db/t/data/f1.bin")  # idempotent
    assert s3_store.list_objects("db/t") == ["db/t/_meta/v1.json"]
    with pytest.raises(FileNotFoundError):
        s3_store.get_object("db/t/data/f1.bin")
    # keys never leak the store-level prefix
    raw = boto3.client("s3", region_name="us-east-1").list_objects_v2(
        Bucket="graft-meta"
    )
    assert {o["Key"] for o in raw["Contents"]} == {"wh/db/t/_meta/v1.json"}


def test_s3_store_listing_paginates(s3_store):
    """ListObjectsV2 caps pages at 1000 keys; the store must walk the
    paginator, not truncate — a lake's metadata plane crosses 1000
    objects within its first thousand commits."""
    for i in range(1003):
        s3_store.put_object(f"pages/k{i:04d}", b"x")
    keys = s3_store.list_objects("pages/")
    assert len(keys) == 1003
    assert keys[0] == "pages/k0000" and keys[-1] == "pages/k1002"


def test_atomic_commit_over_s3(s3_store):
    """The no-rename commit protocol on the real client: immutable
    metadata objects + whole-object hint PUT, prior versions
    byte-stable after evolution."""
    io = ObjectStoreFileIO(s3_store)
    catalog = LakeCatalog("/wh", io=io)
    table = catalog.create_table("db", "t", SCHEMA)
    hint = str(table.location / "_meta" / "version-hint.text")
    v1 = int(io.read_text(hint))
    meta_v1 = io.read_text(
        str(table.location / "_meta" / f"v{v1}.metadata.json")
    )
    table.commit_schema(
        T.StructType(
            [*SCHEMA.fields, T.StructField("added", T.DoubleType(), True)]
        )
    )
    assert int(io.read_text(hint)) == v1 + 1
    assert (
        io.read_text(str(table.location / "_meta" / f"v{v1}.metadata.json"))
        == meta_v1
    )
    assert catalog.load_table("db", "t").schema.fieldNames()[-1] == "added"


def test_ddl_control_plane_over_s3(spark, tmp_path, s3_store):
    """CREATE/ALTER/DROP end to end with metadata living in (mock)
    S3: not one metadata byte on the local filesystem."""
    from sample_iceberg_schema_evolution_pyiceberg_spark.ddl import DdlFrontend

    catalog = LakeCatalog(tmp_path / "s3_wh", io=ObjectStoreFileIO(s3_store))
    ddl = DdlFrontend(spark, catalog)
    for stmt in [
        "CREATE TABLE db.t (id BIGINT NOT NULL, v STRING)",
        "ALTER TABLE db.t ADD COLUMN added DOUBLE",
        "ALTER TABLE db.t DROP COLUMN v",
    ]:
        r = ddl.sql(stmt)
        assert not r.has_error, (stmt, r.message_list)
    table = catalog.load_table("db", "t")
    assert [f.name for f in table.schema.fields] == ["id", "added"]
    assert not (tmp_path / "s3_wh").exists()


def test_s3_options_roundtrip(s3_store):
    """to_options/from_options reconstructs a LIVE view of the same
    bucket+prefix; credentials never appear in the options."""
    io = ObjectStoreFileIO(s3_store)
    io.write_text("/wh2/hint.txt", "7")
    opts = io.to_options()
    assert opts == {"io": "s3", "iobucket": "graft-meta", "ioprefix": "wh"}
    assert not any("key" in k or "secret" in k for k in opts)
    rebuilt = fileio_from_options(opts)
    assert rebuilt.read_text("/wh2/hint.txt") == "7"
    io.write_text("/wh2/hint.txt", "8")
    assert rebuilt.read_text("/wh2/hint.txt") == "8"


def test_config_load_table_def_from_s3():
    """The reference-parity config loader (lambda_helper.py:81-99)
    against real boto3: s3:// URIs load, missing keys accumulate an
    error message instead of raising."""
    from sample_iceberg_schema_evolution_pyiceberg_spark.config import (
        load_table_def,
    )

    with moto.mock_aws():
        c = boto3.client("s3", region_name="us-east-1")
        c.create_bucket(Bucket="cfg-bucket")
        c.put_object(
            Bucket="cfg-bucket",
            Key="defs/orders.json",
            Body=json.dumps(
                {"database_name": "db", "table_name": "orders", "columns": []}
            ).encode(),
        )
        ok, doc = load_table_def("s3://cfg-bucket/defs/orders.json")
        assert ok and doc["table_name"] == "orders"
        ok, msgs = load_table_def("s3://cfg-bucket/defs/missing.json")
        assert not ok and "missing.json" in msgs[0]


# ---------------------------------------------------------------------------
# Cross-process: streaming over a real S3 endpoint (moto server)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def moto_server():
    from moto.server import ThreadedMotoServer

    server = ThreadedMotoServer(port=0, verbose=False)
    server.start()
    host, port = server._server.socket.getsockname()[:2]
    yield f"http://127.0.0.1:{port}"
    server.stop()


def test_lake_stream_over_s3_metadata(spark, tmp_path, moto_server):
    """append -> stream -> append -> stream with table METADATA in S3
    (moto server): the reader worker rebuilds the boto3 backend from
    the serialized bucket/endpoint options in its OWN process and
    observes snapshots committed after the stream started."""
    from pyspark.sql import functions as F

    boto3.client(
        "s3", region_name="us-east-1", endpoint_url=moto_server
    ).create_bucket(Bucket="stream-meta")
    io = ObjectStoreFileIO(
        S3ObjectStore(
            "stream-meta",
            prefix="wh",
            region="us-east-1",
            endpoint_url=moto_server,
        )
    )
    df = spark.range(0, 30).select(F.col("id"))
    table = LakeCatalog(tmp_path / "wh", io=io).create_table(
        "stream", "s3_src", df.schema
    )
    table.append(df.filter("id < 10"))
    q = (
        table.stream_changes(spark)
        .writeStream.format("memory")
        .queryName("s3_src_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.table("s3_src_sink").count() == 10
        table.append(df.filter("id >= 10 AND id < 20"))
        q.processAllAvailable()
        assert spark.table("s3_src_sink").count() == 20
        table.append(df.filter("id >= 20"))
        q.processAllAvailable()
        got = sorted(r.id for r in spark.table("s3_src_sink").collect())
        assert got == list(range(30))  # lossless, duplicate-free
    finally:
        q.stop()
