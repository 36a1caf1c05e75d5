"""Iceberg v1 export interop tests.

The "second engine" here is the Apache Avro *Java* implementation
bundled in Spark's JVM (avro-1.12.x.jar): every Avro file the exporter
writes is decoded by a codec this repo did not implement, and an
external-reader path reconstructs table rows purely from the exported
Iceberg metadata (never from the engine's own ``_meta``)."""

from __future__ import annotations

import json
from datetime import date, datetime

import pytest

from pyspark.sql import Row
from pyspark.sql import types as T

from sample_iceberg_schema_evolution_pyiceberg_spark.iceberg_export import (
    encode_partition_value,
    export_to_iceberg,
    read_avro_jvm,
    read_iceberg_table,
    schema_to_iceberg,
)
from sample_iceberg_schema_evolution_pyiceberg_spark.partitioning import (
    PartitionField,
    PartitionSpec,
)
from sample_iceberg_schema_evolution_pyiceberg_spark.table_format import LakeCatalog


@pytest.fixture()
def catalog(tmp_path):
    return LakeCatalog(tmp_path / "wh")


def _orders_table(spark, catalog):
    schema = T.StructType(
        [
            T.StructField("order_id", T.LongType(), False),
            T.StructField("ts", T.TimestampNTZType(), True),
            T.StructField("amount", T.DoubleType(), True),
        ]
    )
    spec = PartitionSpec((PartitionField("ts", "day", "ts_day", 1000),))
    table = catalog.create_table("db", "orders", schema, spec)
    df1 = spark.createDataFrame(
        [
            Row(order_id=1, ts=datetime(2024, 3, 1, 10), amount=10.0),
            Row(order_id=2, ts=datetime(2024, 3, 2, 11), amount=20.0),
        ],
        schema,
    )
    df2 = spark.createDataFrame(
        [Row(order_id=3, ts=datetime(2024, 3, 2, 12), amount=30.0)],
        schema,
    )
    table.append(df1)
    table.append(df2)
    return table


def test_export_roundtrip_via_jvm_avro(spark, catalog):
    table = _orders_table(spark, catalog)
    meta_dir = export_to_iceberg(table)

    # external reader: metadata.json -> manifest list -> manifests ->
    # parquet, all Avro decoding done by org.apache.avro (Java)
    got, doc = read_iceberg_table(spark, table.location)
    want = table.to_df(spark)
    key = lambda r: r["order_id"]  # noqa: E731
    assert sorted(got.select(*want.columns).collect(), key=key) == sorted(
        want.collect(), key=key
    )

    # spec-level assertions on the metadata document
    assert doc["format-version"] == 1
    assert doc["partition-specs"][0]["fields"][0]["transform"] == "day"
    assert doc["current-snapshot-id"] == doc["snapshots"][-1]["snapshot-id"]
    assert (meta_dir / "version-hint.text").read_text() == "1"


def test_manifest_contents_match_snapshots(spark, catalog):
    table = _orders_table(spark, catalog)
    export_to_iceberg(table)
    _, doc = read_iceberg_table(spark, table.location)
    snap = doc["snapshots"][-1]

    manifests = read_avro_jvm(spark, snap["manifest-list"])
    assert len(manifests) == 2  # one per contributing append snapshot
    total_rows = 0
    for m in manifests:
        assert m["partition_spec_id"] == 0
        entries = read_avro_jvm(spark, m["manifest_path"])
        assert len(entries) == m["added_files_count"]
        for e in entries:
            dfile = e["data_file"]
            assert dfile["file_format"] == "PARQUET"
            assert dfile["file_size_in_bytes"] > 0
            # day transform: int days since epoch (spec encoding)
            day = dfile["partition"]["ts_day"]
            assert isinstance(day, int)
            assert day in (
                (date(2024, 3, 1) - date(1970, 1, 1)).days,
                (date(2024, 3, 2) - date(1970, 1, 1)).days,
            )
            total_rows += dfile["record_count"]
    assert total_rows == 3
    assert snap["summary"]["total-records"] == "3"


def test_overwrite_resets_live_set(spark, catalog):
    schema = T.StructType([T.StructField("v", T.LongType(), True)])
    table = catalog.create_table("db", "plain", schema, PartitionSpec())
    table.append(spark.createDataFrame([Row(v=1)], schema))
    table.overwrite(spark.createDataFrame([Row(v=2)], schema))
    table.append(spark.createDataFrame([Row(v=3)], schema))
    export_to_iceberg(table)
    got, doc = read_iceberg_table(spark, table.location)
    assert sorted(r["v"] for r in got.collect()) == [2, 3]
    assert len(read_avro_jvm(spark, doc["snapshots"][-1]["manifest-list"])) == 2


def test_schema_to_iceberg_nested_ids():
    schema = T.StructType(
        [
            T.StructField("a", T.LongType(), False),
            T.StructField(
                "s",
                T.StructType(
                    [
                        T.StructField("x", T.StringType(), True),
                        T.StructField(
                            "items",
                            T.ArrayType(
                                T.StructType(
                                    [T.StructField("q", T.IntegerType(), False)]
                                ),
                                containsNull=False,
                            ),
                            True,
                        ),
                    ]
                ),
                True,
            ),
            T.StructField(
                "m", T.MapType(T.StringType(), T.DoubleType(), True), True
            ),
        ]
    )
    doc = schema_to_iceberg(schema)
    last = doc.pop("_last_column_id")

    ids: list[int] = []

    def walk(t):
        if isinstance(t, dict):
            if t.get("type") == "struct":
                for f in t["fields"]:
                    ids.append(f["id"])
                    walk(f["type"])
            elif t.get("type") == "list":
                ids.append(t["element-id"])
                walk(t["element"])
            elif t.get("type") == "map":
                ids.append(t["key-id"])
                ids.append(t["value-id"])
                walk(t["key"])
                walk(t["value"])

    walk(doc)
    assert len(ids) == len(set(ids)) == last  # unique, dense
    assert doc["fields"][0]["type"] == "long"
    assert doc["fields"][0]["required"] is True
    s = doc["fields"][1]["type"]
    assert s["type"] == "struct"
    arr = s["fields"][1]["type"]
    assert arr["type"] == "list" and arr["element-required"] is True
    m = doc["fields"][2]["type"]
    assert m["type"] == "map" and m["value-required"] is False


def test_partition_value_encodings():
    assert encode_partition_value("year", "2024", T.TimestampNTZType()) == 54
    assert encode_partition_value("month", "2024-03", T.TimestampNTZType()) == (
        54 * 12 + 2
    )
    assert encode_partition_value("day", "1970-01-02", T.TimestampNTZType()) == 1
    assert (
        encode_partition_value("hour", "1970-01-02-05", T.TimestampNTZType())
        == 29
    )
    assert encode_partition_value("identity", "7", T.LongType()) == 7
    assert encode_partition_value("identity", "us", T.StringType()) == "us"
    assert (
        encode_partition_value("day", "__HIVE_DEFAULT_PARTITION__", T.DateType())
        is None
    )


def test_export_evolved_table_external_read(spark, catalog):
    """Files written under schema v1 resolve to the evolved schema on
    the external read path: added column null-filled, promoted type
    cast — Iceberg's read-time projection semantics."""
    from sample_iceberg_schema_evolution_pyiceberg_spark.evolution import (
        evolve_table,
    )

    v1 = T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("qty", T.IntegerType(), True),
        ]
    )
    table = catalog.create_table("db", "evo", v1, PartitionSpec())
    table.append(spark.createDataFrame([Row(k=1, qty=10)], v1))

    v2 = T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("qty", T.LongType(), True),  # int -> long
            T.StructField("note", T.StringType(), True),  # added
        ]
    )
    res = evolve_table(table, v2)
    assert not res.has_error
    table.append(
        spark.createDataFrame([Row(k=2, qty=20, note="new")], v2)
    )

    export_to_iceberg(table)
    got, doc = read_iceberg_table(spark, table.location)
    assert got.schema["qty"].dataType == T.LongType()
    rows = {r["k"]: (r["qty"], r["note"]) for r in got.collect()}
    assert rows == {1: (10, None), 2: (20, "new")}
    # full schema history with STABLE field IDs: the promoted column
    # keeps its ID across versions, the added column mints a new one
    cur = next(
        s for s in doc["schemas"] if s["schema-id"] == doc["current-schema-id"]
    )
    v1doc = next(s for s in doc["schemas"] if s["schema-id"] == 1)
    assert v1doc["fields"][1]["type"] == "int"
    assert cur["fields"][1]["type"] == "long"
    assert v1doc["fields"][1]["id"] == cur["fields"][1]["id"]
    new_ids = {f["name"]: f["id"] for f in cur["fields"]}
    assert new_ids["note"] == doc["last-column-id"]


def test_avro_writer_roundtrip_property(spark, tmp_path):
    """Property-style check of the hand-rolled OCF writer against the
    JVM's Apache Avro reader: varied record shapes, nullable unions,
    negative/large zigzag values, empty strings, nested records."""
    from sample_iceberg_schema_evolution_pyiceberg_spark.avro_ocf import write_ocf
    from sample_iceberg_schema_evolution_pyiceberg_spark.iceberg_export import (
        read_avro_jvm,
    )

    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "i", "type": "int"},
            {"name": "l", "type": "long"},
            {"name": "s", "type": "string"},
            {"name": "ob", "type": ["null", "boolean"], "default": None},
            {"name": "ol", "type": ["null", "long"], "default": None},
            {
                "name": "nested",
                "type": {
                    "type": "record",
                    "name": "inner",
                    "fields": [
                        {"name": "x", "type": "string"},
                        {"name": "y", "type": ["null", "int"], "default": None},
                    ],
                },
            },
        ],
    }
    records = [
        {
            "i": i * (-1) ** i * 1_000_003,
            "l": (1 << 62) - i if i % 2 else -(1 << 61) - i,
            "s": "" if i % 3 == 0 else f"val-{i}-é",
            "ob": None if i % 2 else bool(i % 4),
            "ol": None if i % 3 else i * 7,
            "nested": {"x": f"n{i}", "y": None if i % 5 == 0 else i},
        }
        for i in range(50)
    ]
    path = str(tmp_path / "prop.avro")
    write_ocf(path, schema, records)
    got = read_avro_jvm(spark, path)
    assert len(got) == 50
    for want, have in zip(records, got):
        assert have["i"] == want["i"]
        assert have["l"] == want["l"]
        assert have["s"] == want["s"]
        assert have["ob"] == want["ob"]
        assert have["ol"] == want["ol"]
        assert have["nested"]["x"] == want["nested"]["x"]
        assert have["nested"]["y"] == want["nested"]["y"]


def test_export_partition_spec_evolution(spark, catalog):
    """year -> month spec evolution: each snapshot's manifest carries
    its own spec id and spec-encoded partition values; metadata lists
    the full spec history."""
    from sample_iceberg_schema_evolution_pyiceberg_spark.evolution import (
        evolve_table,
    )

    schema = T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("ts", T.TimestampNTZType(), True),
        ]
    )
    year_spec = PartitionSpec((PartitionField("ts", "year", "ts_year", 1000),))
    table = catalog.create_table("db", "spev", schema, year_spec)
    table.append(
        spark.createDataFrame([Row(k=1, ts=datetime(2023, 5, 1))], schema)
    )
    month_spec = PartitionSpec(
        (PartitionField("ts", "month", "ts_month", 1000),)
    )
    res = evolve_table(table, schema, month_spec)
    assert not res.has_error and res.new_spec_id == 1
    table.append(
        spark.createDataFrame([Row(k=2, ts=datetime(2024, 2, 1))], schema)
    )

    export_to_iceberg(table)
    got, doc = read_iceberg_table(spark, table.location)
    assert sorted(r["k"] for r in got.collect()) == [1, 2]
    assert doc["default-spec-id"] == 1
    assert [s["spec-id"] for s in doc["partition-specs"]] == [0, 1]
    assert doc["partition-specs"][0]["fields"][0]["transform"] == "year"
    assert doc["partition-specs"][1]["fields"][0]["transform"] == "month"

    manifests = read_avro_jvm(spark, doc["snapshots"][-1]["manifest-list"])
    by_spec = {m["partition_spec_id"]: m for m in manifests}
    assert set(by_spec) == {0, 1}
    e0 = read_avro_jvm(spark, by_spec[0]["manifest_path"])
    e1 = read_avro_jvm(spark, by_spec[1]["manifest_path"])
    assert e0[0]["data_file"]["partition"]["ts_year"] == 2023 - 1970
    assert e1[0]["data_file"]["partition"]["ts_month"] == (
        (2024 - 1970) * 12 + 1
    )


def test_avro_writer_hypothesis_vs_jvm(spark, tmp_path):
    """Randomized writer-vs-JVM-reader agreement: ints/longs across the
    zigzag range, arbitrary unicode strings, null unions. Bounded
    example count — every example is a py4j round-trip."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from sample_iceberg_schema_evolution_pyiceberg_spark.avro_ocf import write_ocf
    from sample_iceberg_schema_evolution_pyiceberg_spark.iceberg_export import (
        read_avro_jvm,
    )

    schema = {
        "type": "record",
        "name": "h",
        "fields": [
            {"name": "i", "type": "int"},
            {"name": "l", "type": "long"},
            {"name": "s", "type": "string"},
            {"name": "ol", "type": ["null", "long"], "default": None},
        ],
    }
    rec = st.fixed_dictionaries(
        {
            "i": st.integers(min_value=-(2**31), max_value=2**31 - 1),
            "l": st.integers(min_value=-(2**63), max_value=2**63 - 1),
            "s": st.text(max_size=40),
            "ol": st.none() | st.integers(min_value=-(2**63), max_value=2**63 - 1),
        }
    )
    counter = iter(range(10**6))

    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(st.lists(rec, min_size=0, max_size=8))
    def roundtrip(records):
        path = str(tmp_path / f"hyp-{next(counter)}.avro")
        write_ocf(path, schema, records)
        got = read_avro_jvm(spark, path)
        assert len(got) == len(records)
        for want, have in zip(records, got):
            assert have["i"] == want["i"]
            assert have["l"] == want["l"]
            assert have["s"] == want["s"]
            assert have["ol"] == want["ol"]

    roundtrip()


def test_identity_partition_spec_encodings():
    from datetime import date as _date

    assert encode_partition_value(
        "identity", "2024-03-01", T.DateType()
    ) == (_date(2024, 3, 1) - _date(1970, 1, 1)).days
    assert encode_partition_value(
        "identity", "2024-03-01 00:00:00", T.TimestampNTZType()
    ) == int(
        (datetime(2024, 3, 1) - datetime(1970, 1, 1)).total_seconds() * 1e6
    )


def test_partition_value_hive_unescape():
    # hive-escaped directory values decode to real values in manifests
    assert (
        encode_partition_value("identity", "a%20b%2Fc", T.StringType())
        == "a b/c"
    )
    assert encode_partition_value(
        "identity", "2024-03-01%2000%3A00%3A00", T.TimestampNTZType()
    ) == int(
        (datetime(2024, 3, 1) - datetime(1970, 1, 1)).total_seconds() * 1e6
    )


def test_read_empty_exported_table(spark, catalog):
    schema = T.StructType([T.StructField("v", T.LongType(), True)])
    table = catalog.create_table("db", "empty", schema, PartitionSpec())
    export_to_iceberg(table)
    got, doc = read_iceberg_table(spark, table.location)
    assert got.count() == 0
    assert got.schema == schema
    assert doc["current-snapshot-id"] == -1


# ---------------------------------------------------------------------------
# Format v2: merge-on-read delete state exports as spec delete files
# ---------------------------------------------------------------------------


def _metadata_doc(table):
    meta_dir = table.location / "metadata"
    version = (meta_dir / "version-hint.text").read_text().strip()
    return json.loads((meta_dir / f"v{version}.metadata.json").read_text())


def _rowset(df):
    return sorted(tuple(r) for r in df.collect())


def _mor_table(spark, catalog, name="mor"):
    from pyspark.sql import functions as F

    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 10).alias("grp"),
        F.lit("old").alias("tag"),
    )
    table = catalog.create_table("db", name, df.schema)
    table.append(df.filter("id < 50"))
    table.append(df.filter("id >= 50"))
    return table


def test_v2_export_equality_deletes_roundtrip(spark, catalog):
    from pyspark.sql import functions as F

    table = _mor_table(spark, catalog)
    src = spark.range(40, 60).select(F.col("id"), F.lit("u").alias("tag"))
    table.merge_into(
        spark, src, ["id"], when_matched_update={"tag": "s_tag"},
        insert_not_matched=False, strategy="merge_on_read",
    )
    assert any(s.delete_keys_dir for s in table.snapshots)
    export_to_iceberg(table)  # auto-upgrades to v2, no spark needed
    doc = _metadata_doc(table)
    assert doc["format-version"] == 2
    assert doc["last-sequence-number"] == table.meta["last_sequence_number"]
    assert "schema" not in doc and "partition-spec" not in doc  # v2 drops
    assert [s["summary"]["operation"] for s in doc["snapshots"]] == [
        "append", "append", "delete", "append",
    ]
    assert [s["sequence-number"] for s in doc["snapshots"]] == [1, 2, 3, 4]

    got, _doc = read_iceberg_table(spark, table.location)
    assert _rowset(got) == _rowset(table.to_df(spark))

    # the delete manifest decodes via JVM Avro with spec v2 fields
    mlist = read_avro_jvm(spark, doc["snapshots"][-1]["manifest-list"])
    assert [m["content"] for m in mlist] == [0, 0, 1, 0]
    assert [m["sequence_number"] for m in mlist] == [1, 2, 3, 4]
    assert all("added_data_files_count" in m for m in mlist)
    del_m = next(m for m in mlist if m["content"] == 1)
    entries = read_avro_jvm(spark, del_m["manifest_path"])
    id_fid = next(
        f["id"]
        for f in doc["schemas"][-1]["fields"]
        if f["name"] == "id"
    )
    for e in entries:
        assert e["sequence_number"] is None  # inherited from the list
        assert e["data_file"]["content"] == 2  # EQUALITY_DELETES
        assert e["data_file"]["equality_ids"] == [id_fid]


def test_v2_export_position_deletes_roundtrip(spark, catalog):
    table = _mor_table(spark, catalog, "morpos")
    table.delete_where(spark, "grp = 3", strategy="merge_on_read")
    # an append AFTER the delete must not be touched by the mask
    from pyspark.sql import functions as F

    table.append(
        spark.range(100, 110).select(
            F.col("id"), F.lit(3).alias("grp"), F.lit("new").alias("tag")
        )
    )
    with pytest.raises(RuntimeError, match="spark"):
        export_to_iceberg(table)  # position deletes need a session
    export_to_iceberg(table, spark=spark)
    doc = _metadata_doc(table)
    assert doc["format-version"] == 2

    got, _doc = read_iceberg_table(spark, table.location)
    want = table.to_df(spark)
    assert _rowset(got) == _rowset(want)
    assert got.filter("id >= 100").count() == 10  # post-delete append

    # the computed position-delete file: sorted (file_path, pos),
    # applied rows match the predicate's row count in earlier snapshots
    mlist = read_avro_jvm(spark, doc["snapshots"][-1]["manifest-list"])
    del_m = next(m for m in mlist if m["content"] == 1)
    entries = read_avro_jvm(spark, del_m["manifest_path"])
    assert all(e["data_file"]["content"] == 1 for e in entries)
    rows = spark.read.parquet(
        *[e["data_file"]["file_path"] for e in entries]
    ).collect()
    assert len(rows) == 10  # grp=3 in the two pre-delete snapshots
    tuples = [(r.file_path, r.pos) for r in rows]
    assert tuples == sorted(tuples)


def test_v2_export_combined_deletes_and_partitioned(spark, catalog):
    """Predicate + equality deletes on a PARTITIONED table: the delete
    manifests reference a synthesized unpartitioned spec and the
    external reader still reproduces the engine scan exactly."""
    from pyspark.sql import functions as F

    df = spark.range(0, 100).select(
        F.col("id"),
        (F.col("id") % 4).cast("string").alias("bucket"),
        F.lit("old").alias("tag"),
    )
    spec = PartitionSpec(
        (PartitionField("bucket", "identity", "bucket", 1000),)
    )
    table = catalog.create_table("db", "morpart", df.schema, spec)
    table.append(df)
    table.delete_where(spark, "id >= 90", strategy="merge_on_read")
    src = spark.range(0, 10).select(F.col("id"), F.lit("u").alias("tag"))
    table.merge_into(
        spark, src, ["id"], when_matched_update={"tag": "s_tag"},
        insert_not_matched=False, strategy="merge_on_read",
    )
    export_to_iceberg(table, spark=spark)
    doc = _metadata_doc(table)
    # the synthesized unpartitioned spec exists and delete manifests use it
    unpart = [s for s in doc["partition-specs"] if not s["fields"]]
    assert len(unpart) == 1
    mlist = read_avro_jvm(spark, doc["snapshots"][-1]["manifest-list"])
    for m in mlist:
        if m["content"] == 1:
            assert m["partition_spec_id"] == unpart[0]["spec-id"]
    got, _doc = read_iceberg_table(spark, table.location)
    assert _rowset(got) == _rowset(table.to_df(spark))
    assert got.count() == 90


def test_v2_export_clean_table_explicit(spark, catalog):
    """format_version=2 on a table WITHOUT deletes: valid v2 layout,
    no delete manifests, same rows."""
    table = _orders_table(spark, catalog)
    export_to_iceberg(table, format_version=2)
    doc = _metadata_doc(table)
    assert doc["format-version"] == 2
    assert "last-sequence-number" in doc
    mlist = read_avro_jvm(spark, doc["snapshots"][-1]["manifest-list"])
    assert [m["content"] for m in mlist] == [0, 0]
    got, _doc = read_iceberg_table(spark, table.location)
    assert got.count() == 3


def test_v2_external_time_travel(spark, catalog):
    """An external reader can open ANY exported snapshot by id —
    including the delete half of a MoR pair (sees the masked state)
    and pre-delete history (sees unmasked rows). Engine as-of scans
    are the ground truth."""
    from pyspark.sql import functions as F
    from sample_iceberg_schema_evolution_pyiceberg_spark.iceberg_export import (
        _snapshot_int_id,
    )

    table = _mor_table(spark, catalog, "mortt")
    table.delete_where(spark, "grp = 3", strategy="merge_on_read")
    table.append(
        spark.range(100, 110).select(
            F.col("id"), F.lit(0).alias("grp"), F.lit("new").alias("tag")
        )
    )
    export_to_iceberg(table, spark=spark)
    for snap in table.snapshots:
        ext, _doc = read_iceberg_table(
            spark, table.location, snapshot_id=_snapshot_int_id(snap)
        )
        want = table.to_df(spark, as_of_snapshot=snap.snapshot_id)
        assert _rowset(ext) == _rowset(want), snap.operation
    with pytest.raises(ValueError, match="not in exported"):
        read_iceberg_table(spark, table.location, snapshot_id=12345)


def test_exported_refs_resolve_for_external_tag_reads(spark, tmp_path):
    """Engine tags export as spec 'refs' (plus the main branch ref);
    an external reader resolves a tag to its snapshot id and
    time-travels to the tagged state from the exported metadata
    alone."""
    import json as _json

    from pyspark.sql import functions as F

    from sample_iceberg_schema_evolution_pyiceberg_spark.table_format import (
        LakeCatalog,
    )

    df = spark.range(0, 50).select(F.col("id"))
    table = LakeCatalog(tmp_path / "wh").create_table("db", "tr", df.schema)
    table.append(df.filter("id < 20"))
    table.create_tag("cut")
    table.append(df.filter("id >= 20"))
    meta_dir = export_to_iceberg(table)
    hint = (meta_dir / "version-hint.text").read_text().strip()
    doc = _json.loads((meta_dir / f"v{hint}.metadata.json").read_text())
    assert doc["refs"]["main"]["snapshot-id"] == doc["current-snapshot-id"]
    assert doc["refs"]["cut"]["type"] == "tag"
    tagged_id = doc["refs"]["cut"]["snapshot-id"]
    assert tagged_id != doc["current-snapshot-id"]
    ext, _ = read_iceberg_table(spark, table.location, snapshot_id=tagged_id)
    assert sorted(r.id for r in ext.collect()) == list(range(20))
    full, _ = read_iceberg_table(spark, table.location)
    assert sorted(r.id for r in full.collect()) == list(range(50))


def test_v3_export_deletion_vectors_roundtrip(spark, catalog):
    """r14: format_version=3 exports position/predicate deletes as
    REAL deletion vectors — one puffin per delete snapshot, one
    portable-roaring64 blob per referenced data file — and the
    external reader reproduces the engine scan exactly. Manifest
    entries carry referenced_data_file/content_offset/
    content_size_in_bytes matching the container's own footer; v3
    metadata carries next-row-id and per-snapshot first-row-id."""
    from pyspark.sql import functions as F

    from sample_iceberg_schema_evolution_pyiceberg_spark.puffin import (
        read_dv_for_file,
    )

    table = _mor_table(spark, catalog, "v3dv")
    table.delete_where(spark, "grp = 3", strategy="merge_on_read")
    table.append(
        spark.range(100, 110).select(
            F.col("id"), F.lit(3).alias("grp"), F.lit("new").alias("tag")
        )
    )
    export_to_iceberg(table, spark=spark, format_version=3)
    doc = _metadata_doc(table)
    assert doc["format-version"] == 3
    # row lineage assignment state: next-row-id covers all data rows,
    # first-row-id is cumulative and monotone (deletes assign no rows)
    firsts = [s["first-row-id"] for s in doc["snapshots"]]
    assert firsts[0] == 0 and firsts == sorted(firsts)
    assert doc["next-row-id"] == table.to_df(spark).count() + 10
    # (engine scan excludes the 10 masked rows; total written = +10)

    got, _rdoc = read_iceberg_table(spark, table.location)
    want = table.to_df(spark)
    assert _rowset(got) == _rowset(want)
    assert got.filter("id >= 100").count() == 10  # post-delete append

    # the delete manifest is a PUFFIN DV manifest, coordinates match
    # the container footer, and the blobs decode to 10 masked rows
    mlist = read_avro_jvm(spark, doc["snapshots"][-1]["manifest-list"])
    del_m = next(m for m in mlist if m["content"] == 1)
    entries = read_avro_jvm(spark, del_m["manifest_path"])
    assert entries and all(
        e["data_file"]["file_format"] == "PUFFIN" for e in entries
    )
    total = 0
    for e in entries:
        d = e["data_file"]
        assert d["referenced_data_file"]
        positions = read_dv_for_file(
            d["file_path"], d["content_offset"], d["content_size_in_bytes"]
        )
        assert len(positions) == d["record_count"]
        total += len(positions)
    assert total == 10  # grp=3 rows in the two pre-delete snapshots
