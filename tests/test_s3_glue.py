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
import re

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
# Glue catalog-of-record
# ---------------------------------------------------------------------------


@pytest.fixture
def glue_s3():
    """The reference's full deployed posture: Glue catalog + S3
    metadata warehouse, both mocked by moto in-process."""
    with moto.mock_aws():
        boto3.client("s3", region_name="us-east-1").create_bucket(
            Bucket="glue-meta"
        )
        yield (
            boto3.client("glue", region_name="us-east-1"),
            S3ObjectStore("glue-meta", prefix="wh"),
        )


def test_glue_catalog_pointer_lifecycle(spark, tmp_path, glue_s3):
    """Create registers a Glue entry whose metadata_location names the
    current metadata JSON; every commit advances the pointer (keeping
    previous_metadata_location); load resolves through the pointer,
    not the hint."""
    from pyspark.sql import functions as F

    from sample_iceberg_schema_evolution_pyiceberg_spark.glue_catalog import (
        GlueLakeCatalog,
    )

    glue, store = glue_s3
    cat = GlueLakeCatalog(
        tmp_path / "wh", io=ObjectStoreFileIO(store), glue=glue
    )
    assert not cat.table_exists("db", "t")
    assert cat.load_table("db", "t") is None
    t = cat.create_table("db", "t", SCHEMA)
    entry = glue.get_table(DatabaseName="db", Name="t")["Table"]
    p1 = entry["Parameters"]["metadata_location"]
    assert entry["Parameters"]["table_type"] == "LAKE"
    # metadata object names are writer-unique (no deterministic key a
    # racing writer could overwrite), pointer still carries the version
    assert re.search(r"/v1-[0-9a-f]{8}\.metadata\.json$", p1)

    t.append(spark.range(0, 5).select(F.col("id"), F.lit("a").alias("v")))
    entry = glue.get_table(DatabaseName="db", Name="t")["Table"]
    p2 = entry["Parameters"]["metadata_location"]
    assert re.search(r"/v2-[0-9a-f]{8}\.metadata\.json$", p2)
    assert entry["Parameters"]["previous_metadata_location"] == p1

    # pointer-driven load sees the appended state and keeps committing
    t2 = cat.load_table("db", "t")
    assert t2.to_df(spark).count() == 5
    t2.commit_schema(
        T.StructType(
            [*SCHEMA.fields, T.StructField("added", T.DoubleType(), True)]
        )
    )
    _p3 = glue.get_table(DatabaseName="db", Name="t")["Table"][
        "Parameters"
    ]["metadata_location"]
    assert re.search(r"/v3-[0-9a-f]{8}\.metadata\.json$", _p3)

    assert cat.list_tables() == [("db", "t")]
    cat.drop_table("db", "t")
    assert not cat.table_exists("db", "t")
    assert cat.list_tables() == []


def test_glue_catalog_concurrent_commit_conflict(spark, tmp_path, glue_s3):
    """Two handles to the same table: the first commit wins, the
    second must raise ConcurrentCommitError instead of silently
    overwriting the pointer — Iceberg's Glue optimistic-lock
    contract.

    Endpoint caveat (on record, ADVICE r7): moto TRACKS VersionId but
    does not ENFORCE it on UpdateTable, so what these tests exercise is
    the client-side get->compare->update guard. Two writers racing
    INSIDE that window could both pass the compare against moto; real
    Glue rejects the second UpdateTable server-side via VersionId. The
    sequential interleavings here (commit A fully, then commit B) are
    exactly the races the client-side guard does catch on any
    endpoint."""
    from sample_iceberg_schema_evolution_pyiceberg_spark.glue_catalog import (
        ConcurrentCommitError,
        GlueLakeCatalog,
    )

    glue, store = glue_s3
    cat = GlueLakeCatalog(
        tmp_path / "wh", io=ObjectStoreFileIO(store), glue=glue
    )
    cat.create_table("db", "t", SCHEMA)
    a = cat.load_table("db", "t")
    b = cat.load_table("db", "t")
    a.commit_schema(
        T.StructType(
            [*SCHEMA.fields, T.StructField("x", T.DoubleType(), True)]
        )
    )
    io = cat.io
    hint_path = str(a.location / "_meta" / "version-hint.text")
    hint_before = io.read_text(hint_path)
    with pytest.raises(ConcurrentCommitError, match="refresh and retry"):
        b.commit_schema(
            T.StructType(
                [*SCHEMA.fields, T.StructField("y", T.DoubleType(), True)]
            )
        )
    # the CAS is the commit: a rejected publish must NOT advance the
    # store-level hint (streaming readers would see a phantom version)
    assert io.read_text(hint_path) == hint_before
    # the loser refreshes through the catalog and can then commit
    b2 = cat.load_table("db", "t")
    b2.commit_schema(
        T.StructType(
            [*b2.schema.fields, T.StructField("y", T.DoubleType(), True)]
        )
    )
    assert cat.load_table("db", "t").schema.fieldNames() == [
        "id", "v", "x", "y",
    ]


def test_handler_episode_over_glue_catalog(spark, tmp_path, glue_s3):
    """The reference's Lambda flow (config event -> Glue-cataloged
    table, iceberg_helper.py:104-112) end to end: process_event drives
    GlueLakeCatalog interchangeably with LakeCatalog — create from
    orders_v1, evolve to orders_v2, Glue pointer advancing
    throughout."""
    from sample_iceberg_schema_evolution_pyiceberg_spark.glue_catalog import (
        GlueLakeCatalog,
    )
    from sample_iceberg_schema_evolution_pyiceberg_spark.handler import (
        process_event,
    )

    glue, store = glue_s3
    cat = GlueLakeCatalog(
        tmp_path / "wh", io=ObjectStoreFileIO(store), glue=glue
    )
    assets = (
        "/root/repo/sample_iceberg_schema_evolution_pyiceberg_spark/assets"
    )
    r1 = process_event(
        spark, cat, f"{assets}/orders_v1.json", generate_data_version="v1"
    )
    assert not r1.has_error, r1.message_list
    p1 = glue.get_table(DatabaseName=r1.database_name, Name=r1.table_name)[
        "Table"
    ]["Parameters"]["metadata_location"]
    r2 = process_event(
        spark, cat, f"{assets}/orders_v2.json", generate_data_version="v2"
    )
    assert not r2.has_error, r2.message_list
    p2 = glue.get_table(DatabaseName=r2.database_name, Name=r2.table_name)[
        "Table"
    ]["Parameters"]["metadata_location"]
    assert p2 != p1  # evolution advanced the catalog pointer
    t = cat.load_table(r2.database_name, r2.table_name)
    assert t.to_df(spark).count() > 0


def test_register_and_read_iceberg_export_via_glue(spark, tmp_path, glue_s3):
    """The interop promise, catalog edition: export_to_iceberg output
    registered in Glue with table_type=ICEBERG, then opened from the
    catalog pointer ALONE (no version hint) and matching the engine
    scan; a re-export re-registration advances the pointer."""
    from pyspark.sql import functions as F

    from sample_iceberg_schema_evolution_pyiceberg_spark.glue_catalog import (
        read_registered_iceberg_table,
        register_iceberg_export,
    )
    from sample_iceberg_schema_evolution_pyiceberg_spark.iceberg_export import (
        export_to_iceberg,
    )

    glue, _store = glue_s3
    # the exported table itself is a local lake (export reads parquet
    # footers; the GLUE side is what this test exercises)
    table = LakeCatalog(tmp_path / "wh").create_table("db", "ice", SCHEMA)
    table.append(
        spark.range(0, 7).select(
            F.col("id"), F.concat(F.lit("v"), F.col("id")).alias("v")
        )
    )
    meta_dir = export_to_iceberg(table)
    loc1 = register_iceberg_export(glue, "db", "ice", meta_dir)
    entry = glue.get_table(DatabaseName="db", Name="ice")["Table"]
    assert entry["Parameters"]["table_type"] == "ICEBERG"
    assert entry["Parameters"]["metadata_location"] == loc1

    got, doc = read_registered_iceberg_table(spark, glue, "db", "ice")
    assert sorted(r.id for r in got.collect()) == list(range(7))
    assert doc["format-version"] in (1, 2)

    table.append(
        spark.range(7, 10).select(
            F.col("id"), F.concat(F.lit("v"), F.col("id")).alias("v")
        )
    )
    meta_dir = export_to_iceberg(table)
    loc2 = register_iceberg_export(glue, "db", "ice", meta_dir)
    assert loc2 != loc1
    entry = glue.get_table(DatabaseName="db", Name="ice")["Table"]
    assert entry["Parameters"]["previous_metadata_location"] == loc1
    got, _doc = read_registered_iceberg_table(spark, glue, "db", "ice")
    assert sorted(r.id for r in got.collect()) == list(range(10))


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


def test_stream_sink_into_glue_catalog_table(spark, tmp_path, glue_s3):
    """The CDC landing-zone loop over the deployed posture: a stream
    lands micro-batches in a Glue-cataloged, S3-metadata lake table
    via foreachBatch appends — each batch is one snapshot commit whose
    Glue pointer CAS runs on the driver — and the final table answers
    from a fresh pointer-driven load, losslessly."""
    from pyspark.sql import functions as F

    from sample_iceberg_schema_evolution_pyiceberg_spark.glue_catalog import (
        GlueLakeCatalog,
    )

    glue, store = glue_s3
    cat = GlueLakeCatalog(
        tmp_path / "wh", io=ObjectStoreFileIO(store), glue=glue
    )
    src_dir = tmp_path / "src"
    spark.range(0, 120).select(
        F.col("id"), (F.col("id") % 4).alias("k")
    ).repartition(3).write.parquet(str(src_dir))

    ev = spark.readStream.schema("id long, k long").option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src_dir))
    table = cat.create_table("stream", "landing", ev.schema)
    p0 = glue.get_table(DatabaseName="stream", Name="landing")["Table"][
        "Parameters"
    ]["metadata_location"]
    q = (
        ev.writeStream.foreachBatch(
            lambda bdf, _bid: (table.append(bdf), None)[1]
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "chk"))
        .start()
    )
    assert q.awaitTermination(300), "stream-to-lake sink timed out"
    # one snapshot per micro-batch, pointer advanced past the create
    final = cat.load_table("stream", "landing")
    assert len(final.snapshots) >= 2
    p1 = glue.get_table(DatabaseName="stream", Name="landing")["Table"][
        "Parameters"
    ]["metadata_location"]
    assert p1 != p0
    got = sorted(r.id for r in final.to_df(spark).collect())
    assert got == list(range(120))  # lossless, duplicate-free


def test_handler_saves_output_to_s3(spark, tmp_path):
    """Reference-parity output persist (lambda_helper.py:138-159): the
    response JSON lands at s3://bucket/output/{uuid}.json with
    output_location recorded; a failed save accumulates the error in
    message_list instead of raising."""
    from sample_iceberg_schema_evolution_pyiceberg_spark.handler import (
        process_event,
    )

    assets = (
        "/root/repo/sample_iceberg_schema_evolution_pyiceberg_spark/assets"
    )
    with moto.mock_aws():
        c = boto3.client("s3", region_name="us-east-1")
        c.create_bucket(Bucket="out-bucket")
        r = process_event(
            spark,
            LakeCatalog(tmp_path / "wh"),
            f"{assets}/orders_v1.json",
            output_dir="s3://out-bucket/output",
            generate_data_version="v1",
        )
        assert not r.has_error, r.message_list
        assert r.output_location.startswith("s3://out-bucket/output/")
        key = r.output_location.split("out-bucket/", 1)[1]
        saved = json.loads(
            c.get_object(Bucket="out-bucket", Key=key)["Body"].read()
        )
        assert saved["database_name"] == r.database_name
        # failed save: error accumulated, not raised (missing bucket)
        r2 = process_event(
            spark,
            LakeCatalog(tmp_path / "wh2"),
            f"{assets}/orders_v1.json",
            output_dir="s3://no-such-bucket-graft/output",
            generate_data_version="v1",
        )
        assert any("Failed to save output" in m for m in r2.message_list)
        assert r2.output_location.startswith("Error saving output")


def test_commit_with_retries_replays_on_conflict(spark, tmp_path, glue_s3):
    """The optimistic-commit loop: a writer that loses the CAS race
    (another append lands between its load and its commit) reloads
    and replays; both writers' rows survive, and the loop gives up
    loudly when attempts are exhausted."""
    from pyspark.sql import functions as F

    from sample_iceberg_schema_evolution_pyiceberg_spark.glue_catalog import (
        ConcurrentCommitError,
        GlueLakeCatalog,
        commit_with_retries,
    )

    glue, store = glue_s3
    cat = GlueLakeCatalog(
        tmp_path / "wh", io=ObjectStoreFileIO(store), glue=glue
    )
    cat.create_table("db", "t", SCHEMA)
    mk = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
        F.col("id"), F.lit("w").alias("v")
    )
    calls = {"n": 0}

    def append_racing(t):
        calls["n"] += 1
        if calls["n"] == 1:
            # a competing writer lands AFTER our load, BEFORE our commit
            cat.load_table("db", "t").append(mk(100, 110))
        t.append(mk(0, 10))

    commit_with_retries(cat, "db", "t", append_racing)
    assert calls["n"] == 2  # first attempt lost, replay won
    got = sorted(
        r.id for r in cat.load_table("db", "t").to_df(spark).collect()
    )
    assert got == list(range(0, 10)) + list(range(100, 110))

    # exhausted attempts re-raise the conflict
    def always_racing(t):
        cat.load_table("db", "t").append(mk(500, 501))
        t.append(mk(600, 601))

    with pytest.raises(ConcurrentCommitError):
        commit_with_retries(cat, "db", "t", always_racing, attempts=2)


def test_racing_commit_cannot_overwrite_winner_metadata(spark, tmp_path, glue_s3):
    """The corruption scenario unique metadata names exist for: two
    handles race from the same base, both allocating version N. The
    loser's metadata PUT must land on its OWN object — never the
    winner's — so after the rejected CAS the catalog pointer still
    resolves the winner's exact committed state."""
    from sample_iceberg_schema_evolution_pyiceberg_spark.glue_catalog import (
        ConcurrentCommitError,
        GlueLakeCatalog,
    )

    glue, store = glue_s3
    cat = GlueLakeCatalog(
        tmp_path / "wh", io=ObjectStoreFileIO(store), glue=glue
    )
    cat.create_table("db", "t", SCHEMA)
    a = cat.load_table("db", "t")
    b = cat.load_table("db", "t")
    a.commit_schema(
        T.StructType(
            [*SCHEMA.fields, T.StructField("winner", T.DoubleType(), True)]
        )
    )
    winner_ptr = glue.get_table(DatabaseName="db", Name="t")["Table"][
        "Parameters"
    ]["metadata_location"]
    winner_bytes = cat.io.read_text(winner_ptr)
    with pytest.raises(ConcurrentCommitError):
        b.commit_schema(
            T.StructType(
                [*SCHEMA.fields, T.StructField("loser", T.DoubleType(), True)]
            )
        )
    # the winner's committed object is byte-identical after the race
    assert cat.io.read_text(winner_ptr) == winner_bytes
    assert cat.load_table("db", "t").schema.fieldNames() == [
        "id", "v", "winner",
    ]


def test_refresh_and_retry_after_lost_race(spark, tmp_path, glue_s3):
    """The error message says 'refresh and retry' — table.refresh()
    must actually resync the CAS base so the retried commit wins."""
    from sample_iceberg_schema_evolution_pyiceberg_spark.glue_catalog import (
        ConcurrentCommitError,
        GlueLakeCatalog,
    )

    glue, store = glue_s3
    cat = GlueLakeCatalog(
        tmp_path / "wh", io=ObjectStoreFileIO(store), glue=glue
    )
    cat.create_table("db", "t", SCHEMA)
    h = cat.load_table("db", "t")
    cat.load_table("db", "t").commit_schema(
        T.StructType(
            [*SCHEMA.fields, T.StructField("x", T.DoubleType(), True)]
        )
    )
    with pytest.raises(ConcurrentCommitError):
        h.commit_schema(
            T.StructType(
                [*SCHEMA.fields, T.StructField("y", T.DoubleType(), True)]
            )
        )
    h.refresh()  # the advertised recovery path on the SAME handle
    h.commit_schema(
        T.StructType(
            [*h.schema.fields, T.StructField("y", T.DoubleType(), True)]
        )
    )
    assert cat.load_table("db", "t").schema.fieldNames() == [
        "id", "v", "x", "y",
    ]


def test_load_table_tolerates_foreign_entries(spark, tmp_path, glue_s3):
    """Glue catalogs hold tables this layer didn't create: entries
    with no metadata pointer read as absent; ICEBERG-export entries
    refuse loudly with a pointer to the right reader."""
    from sample_iceberg_schema_evolution_pyiceberg_spark.glue_catalog import (
        GlueLakeCatalog,
    )
    from sample_iceberg_schema_evolution_pyiceberg_spark.table_format import (
        TableFormatError,
    )

    glue, store = glue_s3
    cat = GlueLakeCatalog(
        tmp_path / "wh", io=ObjectStoreFileIO(store), glue=glue
    )
    glue.create_database(DatabaseInput={"Name": "ext"})
    glue.create_table(
        DatabaseName="ext",
        TableInput={"Name": "crawler_csv", "TableType": "EXTERNAL_TABLE"},
    )
    glue.create_table(
        DatabaseName="ext",
        TableInput={
            "Name": "ice",
            "Parameters": {
                "table_type": "ICEBERG",
                "metadata_location": "/nowhere/metadata/v1.metadata.json",
            },
        },
    )
    assert cat.load_table("ext", "crawler_csv") is None
    with pytest.raises(TableFormatError, match="ICEBERG"):
        cat.load_table("ext", "ice")
    assert ("ext", "crawler_csv") in cat.list_tables()


def test_pointer_swap_preserves_foreign_entry_fields(spark, tmp_path, glue_s3):
    """Glue UpdateTable replaces the whole definition; the pointer
    swap must carry fields set OUTSIDE this layer (console/crawler/
    Terraform) instead of stripping them."""
    from sample_iceberg_schema_evolution_pyiceberg_spark.glue_catalog import (
        GlueLakeCatalog,
    )

    glue, store = glue_s3
    cat = GlueLakeCatalog(
        tmp_path / "wh", io=ObjectStoreFileIO(store), glue=glue
    )
    t = cat.create_table("db", "t", SCHEMA)
    # an operator enriches the entry out-of-band
    entry = glue.get_table(DatabaseName="db", Name="t")["Table"]
    glue.update_table(
        DatabaseName="db",
        TableInput={
            "Name": "t",
            "TableType": entry["TableType"],
            "Parameters": {**entry["Parameters"], "owner_team": "data-eng"},
            "StorageDescriptor": entry["StorageDescriptor"],
            "Description": "orders landing table",
            "Retention": 30,
        },
    )
    t.refresh()  # resync the CAS base past the out-of-band update...
    # ...which moved Parameters only additively, so commit must win
    t.append(spark.range(0, 3).select(F_id(), F_lit_v()))
    after = glue.get_table(DatabaseName="db", Name="t")["Table"]
    assert after["Description"] == "orders landing table"
    assert after["Retention"] == 30
    assert after["Parameters"]["owner_team"] == "data-eng"
    assert after["Parameters"]["metadata_location"] != entry["Parameters"][
        "metadata_location"
    ]


def F_id():
    from pyspark.sql import functions as F

    return F.col("id")


def F_lit_v():
    from pyspark.sql import functions as F

    return F.lit("w").alias("v")


def test_stream_changes_over_glue_created_table(spark, tmp_path, moto_server):
    """A Glue-created table stores FILENAME-form version hints (its
    metadata objects are writer-unique); the log-driven source's
    reader worker must resolve that hint form over the real S3
    endpoint and deliver appends losslessly."""
    from pyspark.sql import functions as F

    from sample_iceberg_schema_evolution_pyiceberg_spark.glue_catalog import (
        GlueLakeCatalog,
    )

    kw = dict(region_name="us-east-1", endpoint_url=moto_server)
    boto3.client("s3", **kw).create_bucket(Bucket="glue-hint-stream")
    cat = GlueLakeCatalog(
        tmp_path / "wh",
        io=ObjectStoreFileIO(
            S3ObjectStore(
                "glue-hint-stream",
                "wh",
                region="us-east-1",
                endpoint_url=moto_server,
            )
        ),
        glue=boto3.client("glue", **kw),
    )
    df = spark.range(0, 20).select(F.col("id"))
    t = cat.create_table("s", "g", df.schema)
    t.append(df.filter("id < 10"))
    q = (
        t.stream_changes(spark)
        .writeStream.format("memory")
        .queryName("glue_hint_sink")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.table("glue_hint_sink").count() == 10
        t.append(df.filter("id >= 10"))
        q.processAllAvailable()
        got = sorted(r.id for r in spark.table("glue_hint_sink").collect())
        assert got == list(range(20))
    finally:
        q.stop()


def test_ref_commits_advance_glue_pointer(spark, tmp_path, glue_s3):
    """Tag and branch operations are metadata commits: each must
    publish through the Glue CAS like any other commit."""
    from sample_iceberg_schema_evolution_pyiceberg_spark.glue_catalog import (
        GlueLakeCatalog,
    )

    glue, store = glue_s3
    cat = GlueLakeCatalog(
        tmp_path / "wh", io=ObjectStoreFileIO(store), glue=glue
    )
    t = cat.create_table("db", "t", SCHEMA)
    t.append(spark.range(0, 4).select(F_id(), F_lit_v()))

    def ptr():
        return glue.get_table(DatabaseName="db", Name="t")["Table"][
            "Parameters"
        ]["metadata_location"]

    p0 = ptr()
    t.create_tag("cut")
    p1 = ptr()
    assert p1 != p0
    t.create_branch("stage")
    p2 = ptr()
    assert p2 != p1
    t.append(spark.range(4, 9).select(F_id(), F_lit_v()), branch="stage")
    t.fast_forward("stage")
    assert ptr() != p2
    fresh = cat.load_table("db", "t")
    assert fresh.tags == {"cut": t.tags["cut"]}
    assert fresh.to_df(spark).count() == 9


def test_plain_handle_refuses_uncataloged_commit(spark, tmp_path, glue_s3):
    """Split-brain guard (ADVICE r7): a Glue-managed table opened via
    the plain store path (LakeTable.load) must refuse to commit — a
    hint-advancing commit with no pointer publish would silently
    diverge hint readers from catalog readers. The catalog-of-record
    marker rides in table metadata, so the plain loader needs no Glue
    access to enforce it; the explicit escape hatch still works and
    keeps unique metadata names (cannot clobber a catalog writer's
    object)."""
    from pyspark.sql import types as T

    from sample_iceberg_schema_evolution_pyiceberg_spark.glue_catalog import (
        GlueLakeCatalog,
    )
    from sample_iceberg_schema_evolution_pyiceberg_spark.table_format import (
        LakeTable,
        TableFormatError,
    )

    glue, store = glue_s3
    io = ObjectStoreFileIO(store)
    cat = GlueLakeCatalog(tmp_path / "wh", io=io, glue=glue)
    schema = T.StructType([T.StructField("id", T.LongType(), True)])
    t = cat.create_table("db", "t", schema)
    assert t.properties["catalog-of-record"] == "glue"

    plain = LakeTable.load(t.location, io=io)
    assert plain.unique_metadata_names  # forced by the marker
    with pytest.raises(TableFormatError, match="catalog-of-record"):
        plain.commit_schema(
            T.StructType(
                [*schema.fields, T.StructField("x", T.LongType(), True)]
            )
        )
    # catalog pointer and hint still agree; catalog handle commits fine
    cat.load_table("db", "t").commit_schema(
        T.StructType([*schema.fields, T.StructField("y", T.LongType(), True)])
    )
    assert cat.load_table("db", "t").schema.fieldNames() == ["id", "y"]

    # escape hatch: explicit, and the store lineage fork is honest
    plain2 = LakeTable.load(t.location, io=io)
    plain2.allow_uncataloged_commit = True
    plain2.commit_schema(
        T.StructType([*schema.fields, T.StructField("z", T.LongType(), True)])
    )
    # hint moved, catalog pointer did not — exactly the documented fork
    assert LakeTable.load(t.location, io=io).schema.fieldNames() == [
        "id", "z",
    ]
    assert cat.load_table("db", "t").schema.fieldNames() == ["id", "y"]

def test_glue_rename_table_preserves_snapshots(spark, tmp_path, glue_s3):
    """r13 (VERDICT r12 item 3, Glue half): rename re-points the
    catalog — same metadata pointer and storage LOCATION under the new
    name, old entry gone; not a byte moves, so snapshots and time
    travel survive verbatim. Commits after the rename publish through
    the new entry's pointer CAS."""
    from pyspark.sql import functions as F

    from sample_iceberg_schema_evolution_pyiceberg_spark.glue_catalog import (
        GlueLakeCatalog,
    )
    from sample_iceberg_schema_evolution_pyiceberg_spark.table_format import (
        TableFormatError,
    )

    glue, store = glue_s3
    cat = GlueLakeCatalog(
        tmp_path / "wh", io=ObjectStoreFileIO(store), glue=glue
    )
    t = cat.create_table("db", "orig", SCHEMA)
    t.append(spark.range(0, 5).select(F.col("id"), F.lit("a").alias("v")))
    t.append(spark.range(5, 9).select(F.col("id"), F.lit("b").alias("v")))
    first_snap = t.snapshots[0].snapshot_id
    old_loc = str(t.location)

    t2 = cat.rename_table("db", "orig", "db", "renamed")
    # old name gone, new name live, location FIXED
    assert not cat.table_exists("db", "orig")
    assert cat.table_exists("db", "renamed")
    entry = glue.get_table(DatabaseName="db", Name="renamed")["Table"]
    assert entry["StorageDescriptor"]["Location"] == old_loc
    assert t2.meta["identifier"] == "db.renamed"
    # snapshots + time travel preserved
    assert t2.to_df(spark).count() == 9
    assert t2.to_df(spark, as_of_snapshot=first_snap).count() == 5
    # commits keep publishing through the new entry
    t2.append(spark.range(9, 12).select(F.col("id"), F.lit("c").alias("v")))
    t3 = cat.load_table("db", "renamed")
    assert str(t3.location) == old_loc
    assert t3.to_df(spark).count() == 12
    # target-exists guard
    cat.create_table("db", "blocker", SCHEMA)
    with pytest.raises(TableFormatError, match="already exists"):
        cat.rename_table("db", "renamed", "db", "blocker")
    # the path catalog refuses to dir-move a catalog-of-record table
    # (addressed by its PATH name — the dir kept the original name)
    with pytest.raises(TableFormatError, match="catalog-of-record"):
        cat._inner.rename_table("db", "orig", "db", "elsewhere")

def test_glue_drop_and_recreate_after_rename(spark, tmp_path, glue_s3):
    """r13 review finding: after a rename keeps the location fixed,
    drop_table must delete the REGISTERED location (deleting the
    name-derived dir would orphan every byte of the table), and the
    old name must be re-creatable (a unique location is minted when
    the name-derived dir is still occupied by the renamed table)."""
    from pyspark.sql import functions as F

    from sample_iceberg_schema_evolution_pyiceberg_spark.glue_catalog import (
        GlueLakeCatalog,
    )

    glue, store = glue_s3
    cat = GlueLakeCatalog(
        tmp_path / "wh", io=ObjectStoreFileIO(store), glue=glue
    )
    t = cat.create_table("db", "a", SCHEMA)
    t.append(spark.range(0, 7).select(F.col("id"), F.lit("x").alias("v")))
    old_loc = str(t.location)
    cat.rename_table("db", "a", "db", "b")

    # re-creating the renamed-away name mints a fresh location and
    # does NOT disturb the renamed table
    t_a2 = cat.create_table("db", "a", SCHEMA)
    assert str(t_a2.location) != old_loc
    t_a2.append(spark.range(0, 3).select(F.col("id"), F.lit("y").alias("v")))
    assert cat.load_table("db", "a").to_df(spark).count() == 3
    assert cat.load_table("db", "b").to_df(spark).count() == 7

    # dropping the renamed table deletes its REGISTERED location...
    cat.drop_table("db", "b")
    assert not cat.table_exists("db", "b")
    assert not cat.io.exists(old_loc + "/_meta/version-hint.text")
    # ...and the re-created 'a' is untouched
    assert cat.load_table("db", "a").to_df(spark).count() == 3


def _crash_rename(glue, database, table, new_table):
    """Replicate rename_table's crash window: the in-flight markers
    were stamped and the create of the new entry succeeded, but the
    delete of the old one did not — both names point at the same
    metadata/location, each carrying a marker naming its twin (r15:
    the markers are what drop_table's O(1) twin lookup follows)."""
    from sample_iceberg_schema_evolution_pyiceberg_spark.glue_catalog import (
        _table_input_from_entry,
    )

    entry = glue.get_table(DatabaseName=database, Name=table)["Table"]
    src_ti = _table_input_from_entry(entry)
    src_ti["Name"] = table
    src_params = dict(src_ti.get("Parameters") or {})
    src_params["rename_pending_to"] = f"{database}.{new_table}"
    src_ti["Parameters"] = src_params
    glue.update_table(DatabaseName=database, TableInput=src_ti)
    ti = _table_input_from_entry(entry)
    ti["Name"] = new_table
    params = dict(ti.get("Parameters") or {})
    params["rename_pending_from"] = f"{database}.{table}"
    ti["Parameters"] = params
    glue.create_table(DatabaseName=database, TableInput=ti)


def test_glue_rename_retry_converges_after_crash(spark, tmp_path, glue_s3):
    """r13 ADVICE (medium): re-running a rename whose first attempt
    crashed between create and delete must CONVERGE (recognize the
    target entry carrying the source's pointer as our half-finished
    rename and just drop the stale source entry) — not raise 'already
    exists'."""
    from pyspark.sql import functions as F

    from sample_iceberg_schema_evolution_pyiceberg_spark.glue_catalog import (
        GlueLakeCatalog,
    )
    from sample_iceberg_schema_evolution_pyiceberg_spark.table_format import (
        TableFormatError,
    )

    glue, store = glue_s3
    cat = GlueLakeCatalog(
        tmp_path / "wh", io=ObjectStoreFileIO(store), glue=glue
    )
    t = cat.create_table("db", "src", SCHEMA)
    t.append(spark.range(0, 6).select(F.col("id"), F.lit("x").alias("v")))
    _crash_rename(glue, "db", "src", "dst")

    t2 = cat.rename_table("db", "src", "db", "dst")  # the retry
    assert not cat.table_exists("db", "src")
    assert cat.table_exists("db", "dst")
    assert t2.meta["identifier"] == "db.dst"
    assert t2.to_df(spark).count() == 6
    # a genuinely DIFFERENT existing target still refuses
    cat.create_table("db", "other", SCHEMA)
    cat.create_table("db", "blocker", SCHEMA)
    with pytest.raises(TableFormatError, match="already exists"):
        cat.rename_table("db", "other", "db", "blocker")


def test_glue_drop_of_stale_rename_twin_is_catalog_only(
    spark, tmp_path, glue_s3
):
    """r13 ADVICE (medium): after a crashed rename both names share
    one location; dropping the STALE old entry must delete the
    catalog entry only — delete_recursive on the shared location
    would destroy the live renamed table's data and metadata."""
    from pyspark.sql import functions as F

    from sample_iceberg_schema_evolution_pyiceberg_spark.glue_catalog import (
        GlueLakeCatalog,
    )

    glue, store = glue_s3
    cat = GlueLakeCatalog(
        tmp_path / "wh", io=ObjectStoreFileIO(store), glue=glue
    )
    t = cat.create_table("db", "src", SCHEMA)
    t.append(spark.range(0, 4).select(F.col("id"), F.lit("x").alias("v")))
    _crash_rename(glue, "db", "src", "dst")

    cat.drop_table("db", "src")  # the documented recovery
    assert not cat.table_exists("db", "src")
    # the live twin keeps its bytes and stays readable
    live = cat.load_table("db", "dst")
    assert live is not None
    assert live.to_df(spark).count() == 4
    # a NON-shared drop still reclaims storage
    loc = str(live.location)
    cat.drop_table("db", "dst")
    assert not cat.io.exists(loc + "/_meta/version-hint.text")


def test_glue_rename_backfills_missing_location(spark, tmp_path, glue_s3):
    """r13 ADVICE (low): renaming a legacy entry that has no
    StorageDescriptor.Location must backfill it from the OLD
    name-derived dir — otherwise the renamed entry would fall back to
    the NEW name-derived dir, which holds nothing."""
    from pyspark.sql import functions as F

    from sample_iceberg_schema_evolution_pyiceberg_spark.glue_catalog import (
        GlueLakeCatalog,
        _table_input_from_entry,
    )

    glue, store = glue_s3
    cat = GlueLakeCatalog(
        tmp_path / "wh", io=ObjectStoreFileIO(store), glue=glue
    )
    t = cat.create_table("db", "legacy", SCHEMA)
    t.append(spark.range(0, 5).select(F.col("id"), F.lit("x").alias("v")))
    old_dir = str(t.location)
    # strip the StorageDescriptor the way a pre-location registration
    # would look
    entry = glue.get_table(DatabaseName="db", Name="legacy")["Table"]
    ti = _table_input_from_entry(entry)
    ti.pop("StorageDescriptor", None)
    glue.update_table(DatabaseName="db", TableInput=ti)

    t2 = cat.rename_table("db", "legacy", "db", "moved")
    entry = glue.get_table(DatabaseName="db", Name="moved")["Table"]
    assert entry["StorageDescriptor"]["Location"] == old_dir
    assert str(t2.location) == old_dir
    assert t2.to_df(spark).count() == 5


def test_glue_crashed_rename_with_diverged_pointers(spark, tmp_path, glue_s3):
    """r14 review finding: commits published through either name AFTER
    a crashed rename diverge the two entries' pointers (split-brain).
    Neither recovery may silently discard the newer metadata: the
    rename retry refuses naming the newer pointer, dropping the
    NEWER-pointer entry refuses, dropping the STALE-pointer twin is
    catalog-only — after which the rename retry converges and the
    post-crash commit is visible."""
    from pyspark.sql import functions as F

    from sample_iceberg_schema_evolution_pyiceberg_spark.glue_catalog import (
        GlueLakeCatalog,
    )
    from sample_iceberg_schema_evolution_pyiceberg_spark.table_format import (
        TableFormatError,
    )

    glue, store = glue_s3
    cat = GlueLakeCatalog(
        tmp_path / "wh", io=ObjectStoreFileIO(store), glue=glue
    )
    t = cat.create_table("db", "src", SCHEMA)
    t.append(spark.range(0, 5).select(F.col("id"), F.lit("x").alias("v")))
    _crash_rename(glue, "db", "src", "dst")
    # a writer keeps using the OLD name: its pointer advances past dst's
    t2 = cat.load_table("db", "src")
    t2.append(spark.range(5, 9).select(F.col("id"), F.lit("y").alias("v")))

    with pytest.raises(TableFormatError, match="DIVERGED"):
        cat.rename_table("db", "src", "db", "dst")
    with pytest.raises(TableFormatError, match="NEWER metadata pointer"):
        cat.drop_table("db", "src")  # src carries the newer pointer
    # the safe recovery: drop the STALE twin (catalog-only)...
    cat.drop_table("db", "dst")
    assert cat.load_table("db", "src").to_df(spark).count() == 9
    # ...then the rename retry converges with the post-crash commit
    t3 = cat.rename_table("db", "src", "db", "dst")
    assert t3.to_df(spark).count() == 9
    assert not cat.table_exists("db", "src")


def test_glue_drop_common_path_never_scans_catalog(spark, tmp_path, glue_s3):
    """r15 ADVICE (medium): the twin search on drop must be
    marker-directed O(1) Glue calls, not a get_databases × get_tables
    sweep of the whole catalog. A routine drop (no rename in flight)
    and even a crashed-rename recovery drop must complete without ever
    touching the paginators; the exhaustive sweep only runs behind
    scan_catalog_on_drop=True."""
    from pyspark.sql import functions as F

    from sample_iceberg_schema_evolution_pyiceberg_spark.glue_catalog import (
        GlueLakeCatalog,
    )

    glue, store = glue_s3
    cat = GlueLakeCatalog(
        tmp_path / "wh", io=ObjectStoreFileIO(store), glue=glue
    )
    t = cat.create_table("db", "plain", SCHEMA)
    t.append(spark.range(0, 3).select(F.col("id"), F.lit("x").alias("v")))
    t2 = cat.create_table("db", "renamed_src", SCHEMA)
    t2.append(spark.range(0, 4).select(F.col("id"), F.lit("y").alias("v")))
    _crash_rename(glue, "db", "renamed_src", "renamed_dst")

    real_paginator = glue.get_paginator

    def forbidden(_name):
        raise AssertionError(
            "drop_table paged the catalog on the common path"
        )

    glue.get_paginator = forbidden
    try:
        cat.drop_table("db", "plain")  # routine drop: no markers
        # crashed-rename recovery still converges via the markers
        cat.drop_table("db", "renamed_src")
    finally:
        glue.get_paginator = real_paginator
    assert not cat.table_exists("db", "plain")
    live = cat.load_table("db", "renamed_dst")
    assert live.to_df(spark).count() == 4
    # the surviving twin's marker was cleared by the recovery drop
    entry = glue.get_table(DatabaseName="db", Name="renamed_dst")["Table"]
    assert "rename_pending_from" not in (entry.get("Parameters") or {})
    # a COMPLETED rename leaves no markers either
    t3 = cat.create_table("db", "m_src", SCHEMA)
    t3.append(spark.range(0, 2).select(F.col("id"), F.lit("z").alias("v")))
    cat.rename_table("db", "m_src", "db", "m_dst")
    entry = glue.get_table(DatabaseName="db", Name="m_dst")["Table"]
    params = entry.get("Parameters") or {}
    assert "rename_pending_from" not in params
    assert "rename_pending_to" not in params


def test_glue_drop_opt_in_scan_finds_markerless_debris(
    spark, tmp_path, glue_s3
):
    """scan_catalog_on_drop=True restores the exhaustive sweep for
    catalogs holding crashed-rename debris from pre-marker writers:
    the marker-less stale twin is still recognized and the drop stays
    catalog-only."""
    from pyspark.sql import functions as F

    from sample_iceberg_schema_evolution_pyiceberg_spark.glue_catalog import (
        GlueLakeCatalog,
        _table_input_from_entry,
    )

    glue, store = glue_s3
    cat = GlueLakeCatalog(
        tmp_path / "wh", io=ObjectStoreFileIO(store), glue=glue,
        scan_catalog_on_drop=True,
    )
    t = cat.create_table("db", "src", SCHEMA)
    t.append(spark.range(0, 4).select(F.col("id"), F.lit("x").alias("v")))
    # pre-marker crash debris: twin entry with NO rename markers
    entry = glue.get_table(DatabaseName="db", Name="src")["Table"]
    ti = _table_input_from_entry(entry)
    ti["Name"] = "dst"
    glue.create_table(DatabaseName="db", TableInput=ti)

    cat.drop_table("db", "src")
    assert not cat.table_exists("db", "src")
    assert cat.load_table("db", "dst").to_df(spark).count() == 4


def test_glue_chained_rename_finishes_crashed_recovery(
    spark, tmp_path, glue_s3
):
    """r15 review finding: rename src->dst crashes, then the user
    renames dst->dst2. The second rename must FINISH the first one's
    recovery (delete stale src catalog-only) — otherwise dst2 loses
    its markers while stale src still points at the shared location,
    and a later drop_table(src) would delete the live table's data."""
    from pyspark.sql import functions as F

    from sample_iceberg_schema_evolution_pyiceberg_spark.glue_catalog import (
        GlueLakeCatalog,
    )

    glue, store = glue_s3
    cat = GlueLakeCatalog(
        tmp_path / "wh", io=ObjectStoreFileIO(store), glue=glue
    )
    t = cat.create_table("db", "src", SCHEMA)
    t.append(spark.range(0, 6).select(F.col("id"), F.lit("x").alias("v")))
    _crash_rename(glue, "db", "src", "dst")

    t2 = cat.rename_table("db", "dst", "db", "dst2")  # chained rename
    # the stale source was removed as part of the chain
    assert not cat.table_exists("db", "src")
    assert t2.to_df(spark).count() == 6
    # and a drop of dst2 (now the only entry) behaves normally
    cat.drop_table("db", "dst2")
    assert not cat.table_exists("db", "dst2")


def test_glue_rename_of_stale_half_to_third_name_refuses(
    spark, tmp_path, glue_s3
):
    """Renaming the STALE half of a crashed rename to a third name
    would duplicate the table identity; it must refuse, pointing at
    the retry/drop recoveries — while the retry itself still works."""
    from pyspark.sql import functions as F

    from sample_iceberg_schema_evolution_pyiceberg_spark.glue_catalog import (
        GlueLakeCatalog,
    )
    from sample_iceberg_schema_evolution_pyiceberg_spark.table_format import (
        TableFormatError,
    )

    glue, store = glue_s3
    cat = GlueLakeCatalog(
        tmp_path / "wh", io=ObjectStoreFileIO(store), glue=glue
    )
    t = cat.create_table("db", "src", SCHEMA)
    t.append(spark.range(0, 4).select(F.col("id"), F.lit("x").alias("v")))
    _crash_rename(glue, "db", "src", "dst")

    with pytest.raises(TableFormatError, match="stale half"):
        cat.rename_table("db", "src", "db", "elsewhere")
    # the documented recovery still converges
    t2 = cat.rename_table("db", "src", "db", "dst")
    assert t2.to_df(spark).count() == 4
    assert not cat.table_exists("db", "src")
