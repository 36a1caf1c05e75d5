"""Foreign-dialect Iceberg READ fixtures (VERDICT r7 item 3).

``read_iceberg_table`` had only ever opened tables written by
``export_to_iceberg`` — a shared writer/reader misconception would be
invisible to round-trips. These tests hand-author v1 and v2 table
layouts FROM THE PUBLIC SPEC with deliberately foreign choices the
in-repo writer never produces (field orders, optional fields, legacy
keys, spec/schema history, delete-file subsets, null sequence numbers),
encode every Avro byte with the Apache Avro JAVA library (zero in-repo
Avro writer code in the path), and assert the reader's answers against
literal row sets plus a DuckDB relational replay of the v2 delete
arithmetic.

Fixture family: tests/goldens/iceberg/foreign/ (see its README).
Reference posture: the reference's product is tables that external
engines open through a catalog (iceberg_helper.py:104-122); a user
pointing this engine at an Athena/Trino-written table exercises exactly
these paths.
"""

from __future__ import annotations

import json
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

FOREIGN = Path(__file__).parent / "goldens" / "iceberg" / "foreign"


# ---------------------------------------------------------------------------
# Apache-Avro-Java writer (py4j): the fixture bytes are produced by the
# bundled third-party library, not by avro_ocf.py
# ---------------------------------------------------------------------------


def _avro_json(node, value):
    """Wrap a plain-python record into Avro's JSON encoding for the
    given schema node (unions become single-key objects named by the
    branch type) — typed materialization then happens entirely inside
    the Java library's JsonDecoder, because py4j auto-unboxes
    java.lang.Long/Integer back to python ints and a GenericRecord can
    therefore never be built correctly from the Python side."""
    if isinstance(node, list):  # union
        if value is None:
            return None
        branch = next(b for b in node if b != "null")
        if isinstance(branch, dict):
            key = branch.get("name") if branch["type"] == "record" else branch["type"]
        else:
            key = branch
        return {key: _avro_json(branch, value)}
    if isinstance(node, dict):
        t = node["type"]
        if t == "record":
            return {
                f["name"]: _avro_json(f["type"], value.get(f["name"]))
                for f in node["fields"]
            }
        if t == "array":
            return [_avro_json(node["items"], v) for v in value]
    return value


def write_avro_java(spark, path: Path, schema_json: str, records) -> None:
    """Write an Avro OCF whose every byte is produced by the Apache
    Avro JAVA library: records travel as Avro-JSON text, the Java
    JsonDecoder materializes them with schema-correct types, and
    DataFileWriter encodes the binary container."""
    jvm = spark._jvm
    schema_py = json.loads(schema_json)
    schema = jvm.org.apache.avro.Schema.Parser().parse(schema_json)
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    )
    writer.create(schema, jvm.java.io.File(str(path)))
    reader = jvm.org.apache.avro.generic.GenericDatumReader(schema)
    factory = jvm.org.apache.avro.io.DecoderFactory.get()
    for r in records:
        dec = factory.jsonDecoder(schema, json.dumps(_avro_json(schema_py, r)))
        writer.append(reader.read(None, dec))
    writer.close()


def _df(path, status, **kw):
    d = {
        "record_count": kw.get("record_count", 1),
        "file_path": str(path),
        "file_size_in_bytes": Path(path).stat().st_size
        if Path(path).exists()
        else 1,
        "file_format": "PARQUET",
    }
    d.update(kw)
    return {"status": status, "snapshot_id": None, "data_file": d}


# ---------------------------------------------------------------------------
# v1: schema history (int->long + added column), foreign field orders,
# legacy keys, spec history, refs, DELETED entries, time travel
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def v1_table(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("foreign_v1")
    (root / "metadata").mkdir()
    (root / "data").mkdir()

    # file A: written under schema 0 — id is INT32, no score column
    pq.write_table(
        pa.table(
            {
                "id": pa.array([1, 2], pa.int32()),
                "name": pa.array(["a", "b"]),
            }
        ),
        root / "data" / "A.parquet",
    )
    # file B: schema 1, column order REVERSED vs the table schema
    pq.write_table(
        pa.table(
            {
                "score": pa.array([0.5, 0.75], pa.float64()),
                "name": pa.array(["c", "d"]),
                "id": pa.array([3, 4], pa.int64()),
            }
        ),
        root / "data" / "B.parquet",
    )

    mschema = (FOREIGN / "v1_manifest.avsc").read_text()
    lschema = (FOREIGN / "v1_manifest_list.avsc").read_text()
    write_avro_java(
        spark,
        root / "metadata" / "m1.avro",
        mschema,
        [_df(root / "data" / "A.parquet", 1)],
    )
    write_avro_java(
        spark,
        root / "metadata" / "m2.avro",
        mschema,
        [
            _df(root / "data" / "B.parquet", 1),
            # DELETED entry pointing nowhere: readers must skip it
            _df(root / "data" / "GONE.parquet", 2),
        ],
    )

    def mlist(path, manifests):
        write_avro_java(
            spark,
            path,
            lschema,
            [
                {
                    "added_snapshot_id": 101,
                    "manifest_path": str(m),
                    "added_data_files_count": 1,
                    "manifest_length": Path(m).stat().st_size,
                    "partition_spec_id": 0,
                }
                for m in manifests
            ],
        )

    mlist(root / "metadata" / "snap-101.avro", [root / "metadata" / "m1.avro"])
    mlist(
        root / "metadata" / "snap-202.avro",
        [root / "metadata" / "m1.avro", root / "metadata" / "m2.avro"],
    )

    meta = (FOREIGN / "v1_metadata.json.tmpl").read_text().replace(
        "{root}", str(root)
    )
    (root / "metadata" / "v3.metadata.json").write_text(meta)
    (root / "metadata" / "version-hint.text").write_text("3")
    return root


def test_v1_foreign_current_read(spark, v1_table):
    """Current snapshot: file A resolves through schema history
    (int32 id promoted to long, score null-filled), file B's reversed
    column order aligns by name, the DELETED entry is skipped, and the
    legacy/unknown metadata keys are ignored."""
    from sample_iceberg_schema_evolution_pyiceberg_spark.iceberg_export import (
        read_iceberg_table,
    )

    df, doc = read_iceberg_table(spark, v1_table)
    assert [(f.name, f.dataType.simpleString()) for f in df.schema.fields] == [
        ("id", "bigint"), ("name", "string"), ("score", "double"),
    ]
    rows = sorted((r.id, r.name, r.score) for r in df.collect())
    assert rows == [
        (1, "a", None), (2, "b", None), (3, "c", 0.5), (4, "d", 0.75),
    ]
    assert doc["current-snapshot-id"] == 202


def test_v1_foreign_time_travel_and_refs(spark, v1_table):
    """snapshot-id time travel reads the older manifest list; the
    refs map (a branch and a tag — layouts the exporter writes
    differently) resolves to snapshots this reader can open."""
    from sample_iceberg_schema_evolution_pyiceberg_spark.iceberg_export import (
        read_iceberg_table,
    )

    df, doc = read_iceberg_table(spark, v1_table, snapshot_id=101)
    assert sorted((r.id, r.name) for r in df.collect()) == [
        (1, "a"), (2, "b"),
    ]
    # ref resolution is metadata-level: audit tag -> 101, main -> 202
    assert doc["refs"]["audit"]["snapshot-id"] == 101
    tag_df, _ = read_iceberg_table(
        spark, v1_table, snapshot_id=doc["refs"]["audit"]["snapshot-id"]
    )
    assert tag_df.count() == 2
    with pytest.raises(ValueError, match="not in exported metadata"):
        read_iceberg_table(spark, v1_table, snapshot_id=999)


# ---------------------------------------------------------------------------
# v2: position deletes on a strict file subset, equality deletes at two
# sequence numbers (strictly-smaller rule), null entry seq inheritance
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def v2_table(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("foreign_v2")
    (root / "metadata").mkdir()
    (root / "data").mkdir()

    d1 = root / "data" / "D1.parquet"
    d2 = root / "data" / "D2.parquet"
    pq.write_table(
        pa.table(
            {
                "id": pa.array([1, 2, 3, 4], pa.int64()),
                "name": pa.array(["r1", "r2", "r3", "r4"]),
            }
        ),
        d1,
    )
    pq.write_table(
        pa.table(
            {
                "id": pa.array([5, 6, 7, 8], pa.int64()),
                "name": pa.array(["r5", "r6", "r7", "r8"]),
            }
        ),
        d2,
    )
    # position deletes referencing ONLY D1 (rows 0 and 2 -> ids 1, 3)
    pdel = root / "data" / "P.parquet"
    pq.write_table(
        pa.table(
            {
                "file_path": pa.array([str(d1), str(d1)]),
                "pos": pa.array([0, 2], pa.int64()),
            }
        ),
        pdel,
    )
    # equality deletes: E applies at seq 3 (> both data arms' seq 1):
    # ids 4 and 5. E2 sits at seq 1 == the arms' seq -> the
    # strictly-smaller rule REFUSES it (id 7 must survive).
    edel = root / "data" / "E.parquet"
    pq.write_table(pa.table({"id": pa.array([4, 5], pa.int64())}), edel)
    edel2 = root / "data" / "E2.parquet"
    pq.write_table(pa.table({"id": pa.array([7], pa.int64())}), edel2)

    mschema = (FOREIGN / "v2_manifest.avsc").read_text()
    lschema = (FOREIGN / "v2_manifest_list.avsc").read_text()

    def entry(path, content, seq, **kw):
        e = _df(path, 1, content=content, **kw)
        e["sequence_number"] = seq
        e["file_sequence_number"] = seq
        return e

    write_avro_java(
        spark, root / "metadata" / "md1.avro", mschema,
        [entry(d1, 0, 1)],
    )
    write_avro_java(
        spark, root / "metadata" / "md2.avro", mschema,
        [entry(d2, 0, 1)],
    )
    # delete manifest entries carry sequence_number: null -> the reader
    # must inherit the manifest-list sequence number
    write_avro_java(
        spark, root / "metadata" / "mp.avro", mschema,
        [entry(pdel, 1, None)],
    )
    write_avro_java(
        spark, root / "metadata" / "me.avro", mschema,
        [entry(edel, 2, None, equality_ids=[1])],
    )
    write_avro_java(
        spark, root / "metadata" / "me2.avro", mschema,
        [entry(edel2, 2, None, equality_ids=[1])],
    )

    write_avro_java(
        spark,
        root / "metadata" / "snap-301.avro",
        lschema,
        [
            {
                "manifest_path": str(root / "metadata" / "md1.avro"),
                "manifest_length": 1, "partition_spec_id": 0,
                "content": 0, "sequence_number": 1,
                "min_sequence_number": 1, "added_snapshot_id": 301,
            },
            {
                "manifest_path": str(root / "metadata" / "md2.avro"),
                "manifest_length": 1, "partition_spec_id": 0,
                "content": 0, "sequence_number": 1,
                "min_sequence_number": 1, "added_snapshot_id": 301,
            },
            {
                "manifest_path": str(root / "metadata" / "mp.avro"),
                "manifest_length": 1, "partition_spec_id": 0,
                "content": 1, "sequence_number": 2,
                "min_sequence_number": 2, "added_snapshot_id": 301,
            },
            {
                "manifest_path": str(root / "metadata" / "me.avro"),
                "manifest_length": 1, "partition_spec_id": 0,
                "content": 1, "sequence_number": 3,
                "min_sequence_number": 3, "added_snapshot_id": 301,
            },
            {
                "manifest_path": str(root / "metadata" / "me2.avro"),
                "manifest_length": 1, "partition_spec_id": 0,
                "content": 1, "sequence_number": 1,
                "min_sequence_number": 1, "added_snapshot_id": 301,
            },
        ],
    )
    meta = (FOREIGN / "v2_metadata.json.tmpl").read_text().replace(
        "{root}", str(root)
    )
    (root / "metadata" / "v1.metadata.json").write_text(meta)
    (root / "metadata" / "version-hint.text").write_text("1")
    return root


def test_v2_foreign_row_level_deletes(spark, v2_table):
    """The full v2 delete arithmetic on a foreign layout: position
    deletes hit only their referenced file, the seq-3 equality delete
    masks both arms (strictly smaller), the seq-1 equality delete is
    refused by the same rule, and null entry sequence numbers inherit
    from the manifest list."""
    from sample_iceberg_schema_evolution_pyiceberg_spark.iceberg_export import (
        read_iceberg_table,
    )

    df, doc = read_iceberg_table(spark, v2_table)
    rows = sorted(r.id for r in df.collect())
    # {1..4} minus pos{1,3} minus eq{4}; {5..8} minus eq{5}; 7 survives
    assert rows == [2, 6, 7, 8]
    assert doc["format-version"] == 2


def test_v2_foreign_matches_duckdb_replay(spark, v2_table):
    """Relational oracle: DuckDB replays the same delete arithmetic
    (position anti-join scoped to the referenced file, equality
    anti-join where delete seq > arm seq) over the same parquet —
    value-for-value agreement with the reader."""
    duckdb = pytest.importorskip("duckdb")

    from sample_iceberg_schema_evolution_pyiceberg_spark.iceberg_export import (
        read_iceberg_table,
    )

    root = v2_table
    con = duckdb.connect()
    expected = con.execute(
        f"""
        WITH d1 AS (
          SELECT *, row_number() OVER () - 1 AS pos
          FROM read_parquet('{root}/data/D1.parquet')
        ),
        d2 AS (SELECT * FROM read_parquet('{root}/data/D2.parquet')),
        p AS (SELECT * FROM read_parquet('{root}/data/P.parquet')),
        e AS (SELECT * FROM read_parquet('{root}/data/E.parquet')),
        kept1 AS (
          SELECT id, name FROM d1
          WHERE pos NOT IN (
            SELECT pos FROM p WHERE file_path = '{root}/data/D1.parquet')
          AND id NOT IN (SELECT id FROM e)
        ),
        kept2 AS (
          SELECT id, name FROM d2 WHERE id NOT IN (SELECT id FROM e)
        )
        SELECT id, name FROM kept1 UNION ALL SELECT id, name FROM kept2
        ORDER BY id
        """
    ).fetchall()
    df, _ = read_iceberg_table(spark, v2_table)
    got = sorted((r.id, r.name) for r in df.collect())
    assert got == [tuple(r) for r in expected]


# ---------------------------------------------------------------------------
# uuid/time type fidelity (VERDICT r10 item 5): a FOREIGN table with the
# spec's real uuid (fixed[16] parquet) and time (INT64 TIME micros) types
# reads into the same representations config.py picks for those config
# types (canonical string / micros long); the engine's own export keeps
# the documented string/long divergence and round-trips.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def uuid_time_table(spark, tmp_path_factory):
    import datetime
    import uuid as uuid_mod

    root = tmp_path_factory.mktemp("foreign_uuid_time")
    (root / "metadata").mkdir()
    (root / "data").mkdir()
    uids = [uuid_mod.UUID(int=(i + 1) << 64) for i in range(2)]
    # real spec physical types a Java Iceberg writer would produce:
    # uuid = FIXED_LEN_BYTE_ARRAY(16), time = INT64 TIME(MICROS)
    pq.write_table(
        pa.table(
            {
                "id": pa.array([1, 2, 3], pa.int64()),
                "u": pa.array(
                    [u.bytes for u in uids] + [None], pa.binary(16)
                ),
                "tm": pa.array(
                    [
                        datetime.time(1, 2, 3, 123456),
                        datetime.time(23, 59, 59),
                        None,
                    ],
                    pa.time64("us"),
                ),
            }
        ),
        root / "data" / "A.parquet",
    )
    mschema = (FOREIGN / "v1_manifest.avsc").read_text()
    lschema = (FOREIGN / "v1_manifest_list.avsc").read_text()
    write_avro_java(
        spark,
        root / "metadata" / "m1.avro",
        mschema,
        [_df(root / "data" / "A.parquet", 1, record_count=3)],
    )
    write_avro_java(
        spark,
        root / "metadata" / "snap-1.avro",
        lschema,
        [
            {
                "added_snapshot_id": 1,
                "manifest_path": str(root / "metadata" / "m1.avro"),
                "added_data_files_count": 1,
                "manifest_length": (root / "metadata" / "m1.avro")
                .stat()
                .st_size,
                "partition_spec_id": 0,
            }
        ],
    )
    schema = {
        "type": "struct",
        "schema-id": 0,
        "fields": [
            {"id": 1, "name": "id", "required": False, "type": "long"},
            {"id": 2, "name": "u", "required": False, "type": "uuid"},
            {"id": 3, "name": "tm", "required": False, "type": "time"},
        ],
    }
    meta = {
        "format-version": 1,
        "table-uuid": "7f9c9c1e-0000-4000-8000-00000000000a",
        "location": str(root),
        "last-updated-ms": 1700000000000,
        "last-column-id": 3,
        "schema": schema,
        "schemas": [schema],
        "current-schema-id": 0,
        "partition-spec": [],
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-spec-id": 0,
        "last-partition-id": 999,
        "properties": {},
        "current-snapshot-id": 1,
        "snapshots": [
            {
                "snapshot-id": 1,
                "timestamp-ms": 1700000000000,
                "manifest-list": str(root / "metadata" / "snap-1.avro"),
                "schema-id": 0,
                "summary": {"operation": "append"},
            }
        ],
    }
    (root / "metadata" / "v1.metadata.json").write_text(json.dumps(meta))
    (root / "metadata" / "version-hint.text").write_text("1")
    return root


def test_foreign_uuid_time_types_read(spark, uuid_time_table):
    """A foreign table declaring uuid/time with real physical encodings
    surfaces as the engine's config representations: uuid -> canonical
    lowercase-hyphenated string, time -> micros-since-midnight long
    (reference constants.py:64,:80 map the same config types to real
    TimeType/UUIDType; this engine's Spark substrate can't, so the
    reader converges both worlds onto one queryable representation)."""
    import uuid as uuid_mod

    from sample_iceberg_schema_evolution_pyiceberg_spark.iceberg_export import (
        read_iceberg_table,
    )

    df, doc = read_iceberg_table(spark, uuid_time_table)
    assert [(f.name, f.dataType.simpleString()) for f in df.schema.fields] == [
        ("id", "bigint"), ("u", "string"), ("tm", "bigint"),
    ]
    rows = sorted(df.collect(), key=lambda r: r.id)
    assert rows[0].u == str(uuid_mod.UUID(int=1 << 64))
    assert rows[1].u == str(uuid_mod.UUID(int=2 << 64))
    assert rows[2].u is None
    # 01:02:03.123456 and 23:59:59 as micros since midnight
    assert rows[0].tm == (1 * 3600 + 2 * 60 + 3) * 1_000_000 + 123456
    assert rows[1].tm == (23 * 3600 + 59 * 60 + 59) * 1_000_000
    assert rows[2].tm is None


def test_uuid_time_config_export_roundtrip(spark, tmp_path):
    """The engine's own side of the divergence: a config-created table
    with uuid/time fields stores string/long (config.py:56,:64), the
    export declares string/long (documented in ICEBERG_CONFORMANCE.md
    — NOT the spec's uuid/time, which would misdescribe the BYTE_ARRAY
    UTF8 / plain INT64 physical data to external readers), and the
    exported table round-trips value-for-value through the reader."""
    import uuid as uuid_mod

    from pyspark.sql import functions as F

    from sample_iceberg_schema_evolution_pyiceberg_spark.config import map_config_type
    from sample_iceberg_schema_evolution_pyiceberg_spark.iceberg_export import (
        export_to_iceberg,
        read_iceberg_table,
    )
    from sample_iceberg_schema_evolution_pyiceberg_spark.table_format import (
        LakeCatalog,
    )
    import pyspark.sql.types as T

    assert map_config_type("uuid").simpleString() == "string"
    assert map_config_type("time").simpleString() == "bigint"
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("u", map_config_type("uuid")),
            T.StructField("tm", map_config_type("time")),
        ]
    )
    vals = [
        (1, str(uuid_mod.UUID(int=7)), 3_723_000_000),
        (2, str(uuid_mod.UUID(int=8)), 86_399_000_000),
        (3, None, None),
    ]
    cat = LakeCatalog(str(tmp_path / "wh"))
    t = cat.create_table("d", "ut", schema)
    t.append(spark.createDataFrame(vals, schema))
    export_to_iceberg(t)
    doc = json.loads(
        sorted((Path(t.location) / "metadata").glob("v*.metadata.json"))[-1]
        .read_text()
    )
    cur = next(
        s for s in doc["schemas"] if s["schema-id"] == doc["current-schema-id"]
    )
    types = {f["name"]: f["type"] for f in cur["fields"]}
    assert types == {"id": "long", "u": "string", "tm": "long"}
    df, _ = read_iceberg_table(spark, t.location)
    got = sorted(
        ((r.id, r.u, r.tm) for r in df.collect()), key=lambda x: x[0]
    )
    assert got == vals


def test_foreign_uuid_only_and_promoted_history(spark, tmp_path):
    """r12 review findings 2+5: (a) a uuid-only foreign table (no time
    column) takes the explicit-schema read path — real Iceberg writers
    annotate fixed[16] with the parquet UUID logical type, which
    Spark's inference rejects the same way it rejects TIME; (b) under
    the explicit schema, files written before an int->long promotion
    still read (Spark 4 parquet widening), so schema-evolved foreign
    tables keep working on this path."""
    import uuid as uuid_mod

    from sample_iceberg_schema_evolution_pyiceberg_spark.iceberg_export import (
        read_iceberg_table,
    )

    root = tmp_path / "fuuid"
    (root / "metadata").mkdir(parents=True)
    (root / "data").mkdir()
    uids = [uuid_mod.UUID(int=(i + 9) << 32) for i in range(2)]
    # file A: schema 0 era — id INT32, has uuid
    pq.write_table(
        pa.table(
            {
                "id": pa.array([1], pa.int32()),
                "u": pa.array([uids[0].bytes], pa.binary(16)),
                "tm": pa.array([3_600_000_000], pa.int64()),
            }
        ),
        root / "data" / "A.parquet",
    )
    # file B: schema 1 era — id promoted to INT64
    pq.write_table(
        pa.table(
            {
                "id": pa.array([2], pa.int64()),
                "u": pa.array([uids[1].bytes], pa.binary(16)),
                "tm": pa.array([7_200_000_000], pa.int64()),
            }
        ),
        root / "data" / "B.parquet",
    )
    mschema = (FOREIGN / "v1_manifest.avsc").read_text()
    lschema = (FOREIGN / "v1_manifest_list.avsc").read_text()
    write_avro_java(
        spark, root / "metadata" / "m1.avro", mschema,
        [_df(root / "data" / "A.parquet", 1),
         _df(root / "data" / "B.parquet", 1)],
    )
    write_avro_java(
        spark, root / "metadata" / "snap-1.avro", lschema,
        [{
            "added_snapshot_id": 1,
            "manifest_path": str(root / "metadata" / "m1.avro"),
            "added_data_files_count": 2,
            "manifest_length": (root / "metadata" / "m1.avro").stat().st_size,
            "partition_spec_id": 0,
        }],
    )
    schema = {
        "type": "struct", "schema-id": 1,
        "fields": [
            {"id": 1, "name": "id", "required": False, "type": "long"},
            {"id": 2, "name": "u", "required": False, "type": "uuid"},
            {"id": 3, "name": "tm", "required": False, "type": "time"},
        ],
    }
    meta = {
        "format-version": 1, "table-uuid": "0" * 8 + "-0000-4000-8000-" + "0" * 12,
        "location": str(root), "last-updated-ms": 1700000000000,
        "last-column-id": 3, "schema": schema, "schemas": [schema],
        "current-schema-id": 1, "partition-spec": [],
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-spec-id": 0, "last-partition-id": 999, "properties": {},
        "current-snapshot-id": 1,
        "snapshots": [{
            "snapshot-id": 1, "timestamp-ms": 1700000000000,
            "manifest-list": str(root / "metadata" / "snap-1.avro"),
            "schema-id": 1, "summary": {"operation": "append"},
        }],
    }
    (root / "metadata" / "v1.metadata.json").write_text(json.dumps(meta))
    (root / "metadata" / "version-hint.text").write_text("1")
    df, _ = read_iceberg_table(spark, root)
    rows = sorted(df.collect(), key=lambda r: r.id)
    assert [r.id for r in rows] == [1, 2]  # INT32 file widened to long
    assert rows[0].u == str(uids[0]) and rows[1].u == str(uids[1])
    assert [r.tm for r in rows] == [3_600_000_000, 7_200_000_000]


def test_foreign_nested_uuid_time_fails_loudly(spark, tmp_path):
    """r12 review finding 4: nested uuid/time would decode to garbage
    (binary cast to bytes-as-UTF8) or crash inference — the reader
    refuses loudly with guidance instead."""
    from sample_iceberg_schema_evolution_pyiceberg_spark.iceberg_export import (
        read_iceberg_table,
    )

    root = tmp_path / "fnested"
    (root / "metadata").mkdir(parents=True)
    schema = {
        "type": "struct", "schema-id": 0,
        "fields": [
            {"id": 1, "name": "id", "required": False, "type": "long"},
            {"id": 2, "name": "info", "required": False, "type": {
                "type": "struct",
                "fields": [
                    {"id": 3, "name": "u", "required": False,
                     "type": "uuid"},
                ],
            }},
        ],
    }
    meta = {
        "format-version": 1, "table-uuid": "1" * 8 + "-0000-4000-8000-" + "0" * 12,
        "location": str(root), "last-updated-ms": 1700000000000,
        "last-column-id": 3, "schema": schema, "schemas": [schema],
        "current-schema-id": 0, "partition-spec": [],
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-spec-id": 0, "last-partition-id": 999, "properties": {},
        "current-snapshot-id": None, "snapshots": [],
    }
    (root / "metadata" / "v1.metadata.json").write_text(json.dumps(meta))
    (root / "metadata" / "version-hint.text").write_text("1")
    with pytest.raises(ValueError, match="nested uuid/time"):
        read_iceberg_table(spark, root)

def test_foreign_uuid_logical_type_annotation_read(spark, tmp_path):
    """VERDICT r12 item 7: a data file whose fixed[16] column carries
    the REAL parquet UUID logical-type annotation (what a Java Iceberg
    writer emits — Spark's own reader rejects it outright with
    PARQUET_TYPE_ILLEGAL at inference) decodes through the
    conformance-row-33 path identically to the unannotated fixed[16]
    fixtures. The file is authored by DuckDB's native UUID type, whose
    parquet writer annotates FIXED_LEN_BYTE_ARRAY(16) with
    LogicalType=UUID (verified below from the footer), and TIME as
    annotated INT64 TIME(MICROS)."""
    import duckdb

    from sample_iceberg_schema_evolution_pyiceberg_spark.iceberg_export import (
        read_iceberg_table,
    )

    root = tmp_path / "annotated"
    (root / "metadata").mkdir(parents=True)
    (root / "data").mkdir()
    data_file = root / "data" / "A.parquet"
    duckdb.sql(
        f"""
        COPY (SELECT * FROM (VALUES
          (1::BIGINT, uuid '00000000-0000-0001-0000-000000000000',
           TIME '01:02:03.123456'),
          (2, uuid '00000000-0000-0002-0000-000000000000',
           TIME '23:59:59'),
          (3, NULL::UUID, NULL::TIME)) t(id, u, tm))
        TO '{data_file}' (FORMAT parquet)
        """
    )
    # the footer really carries the annotations this test exists for
    col_u = pq.ParquetFile(data_file).schema.column(1)
    assert str(col_u.logical_type) == "UUID", str(col_u.logical_type)
    col_tm = pq.ParquetFile(data_file).schema.column(2)
    assert "Time" in str(col_tm.logical_type), str(col_tm.logical_type)

    mschema = (FOREIGN / "v1_manifest.avsc").read_text()
    lschema = (FOREIGN / "v1_manifest_list.avsc").read_text()
    write_avro_java(
        spark,
        root / "metadata" / "m1.avro",
        mschema,
        [_df(data_file, 1, record_count=3)],
    )
    write_avro_java(
        spark,
        root / "metadata" / "snap-1.avro",
        lschema,
        [
            {
                "added_snapshot_id": 1,
                "manifest_path": str(root / "metadata" / "m1.avro"),
                "added_data_files_count": 1,
                "manifest_length": (root / "metadata" / "m1.avro")
                .stat()
                .st_size,
                "partition_spec_id": 0,
            }
        ],
    )
    schema = {
        "type": "struct",
        "schema-id": 0,
        "fields": [
            {"id": 1, "name": "id", "required": False, "type": "long"},
            {"id": 2, "name": "u", "required": False, "type": "uuid"},
            {"id": 3, "name": "tm", "required": False, "type": "time"},
        ],
    }
    meta = {
        "format-version": 1,
        "table-uuid": "7f9c9c1e-0000-4000-8000-00000000000b",
        "location": str(root),
        "last-updated-ms": 1700000000000,
        "last-column-id": 3,
        "schema": schema,
        "schemas": [schema],
        "current-schema-id": 0,
        "partition-spec": [],
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-spec-id": 0,
        "last-partition-id": 999,
        "properties": {},
        "current-snapshot-id": 1,
        "snapshots": [
            {
                "snapshot-id": 1,
                "timestamp-ms": 1700000000000,
                "manifest-list": str(root / "metadata" / "snap-1.avro"),
                "schema-id": 0,
                "summary": {"operation": "append"},
            }
        ],
    }
    (root / "metadata" / "v1.metadata.json").write_text(json.dumps(meta))
    (root / "metadata" / "version-hint.text").write_text("1")

    df, _doc = read_iceberg_table(spark, root)
    assert [(f.name, f.dataType.simpleString()) for f in df.schema.fields] == [
        ("id", "bigint"), ("u", "string"), ("tm", "bigint"),
    ]
    rows = sorted(df.collect(), key=lambda r: r.id)
    # identical decode to the unannotated fixed[16] fixture
    assert rows[0].u == "00000000-0000-0001-0000-000000000000"
    assert rows[1].u == "00000000-0000-0002-0000-000000000000"
    assert rows[2].u is None
    assert rows[0].tm == (1 * 3600 + 2 * 60 + 3) * 1_000_000 + 123456
    assert rows[1].tm == (23 * 3600 + 59 * 60 + 59) * 1_000_000
    assert rows[2].tm is None


# ---------------------------------------------------------------------------
# v3 (r14, VERDICT r13 item 8): initial-default column defaults are
# IMPLEMENTED; deletion vectors / variant-class types / future format
# versions refuse loudly at the exact feature site.
# ---------------------------------------------------------------------------


def _v3_meta(root, schema_fields, last_col, extra=None):
    doc = {
        "format-version": 3,
        "table-uuid": "7f9c9c1e-0000-4000-8000-000000000003",
        "location": str(root),
        "last-sequence-number": 1,
        "last-updated-ms": 1700000003000,
        "last-column-id": last_col,
        "schemas": [
            {"type": "struct", "schema-id": 0, "fields": schema_fields}
        ],
        "current-schema-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-spec-id": 0,
        "last-partition-id": 999,
        "properties": {},
        "refs": {"main": {"snapshot-id": 901, "type": "branch"}},
        "current-snapshot-id": 901,
        "snapshot-log": [{"timestamp-ms": 1700000003000, "snapshot-id": 901}],
        "snapshots": [
            {
                "snapshot-id": 901,
                "timestamp-ms": 1700000003000,
                "sequence-number": 1,
                "manifest-list": str(root / "metadata" / "snap-901.avro"),
                "schema-id": 0,
                "summary": {"operation": "append"},
            }
        ],
    }
    doc.update(extra or {})
    (root / "metadata").mkdir(exist_ok=True)
    (root / "metadata" / "v1.metadata.json").write_text(json.dumps(doc))
    (root / "metadata" / "version-hint.text").write_text("1")
    return doc


def _mlist_entry(root, name, content, seq):
    return {
        "manifest_path": str(root / "metadata" / name),
        "manifest_length": 1, "partition_spec_id": 0,
        "content": content, "sequence_number": seq,
        "min_sequence_number": seq, "added_snapshot_id": 901,
    }


def test_v3_initial_default_read(spark, tmp_path):
    """v3 initial-default semantics: files written before the column
    existed read as the default (not null); files that materialize the
    column keep their own values INCLUDING real nulls."""
    from sample_iceberg_schema_evolution_pyiceberg_spark.iceberg_export import (
        read_iceberg_table,
    )

    root = tmp_path / "v3_defaults"
    (root / "data").mkdir(parents=True)
    (root / "metadata").mkdir()
    d1 = root / "data" / "old.parquet"  # pre-evolution: no score
    pq.write_table(
        pa.table({"id": pa.array([1, 2], pa.int64()),
                  "name": pa.array(["a", "b"])}), d1,
    )
    d2 = root / "data" / "new.parquet"  # has score, with a real null
    pq.write_table(
        pa.table({"id": pa.array([3, 4], pa.int64()),
                  "name": pa.array(["c", "d"]),
                  "score": pa.array([7, None], pa.int64())}), d2,
    )
    mschema = (FOREIGN / "v2_manifest.avsc").read_text()
    lschema = (FOREIGN / "v2_manifest_list.avsc").read_text()

    def entry(path):
        e = _df(path, 1, content=0)
        e["sequence_number"] = 1
        e["file_sequence_number"] = 1
        return e

    write_avro_java(spark, root / "metadata" / "m1.avro", mschema, [entry(d1)])
    write_avro_java(spark, root / "metadata" / "m2.avro", mschema, [entry(d2)])
    write_avro_java(
        spark, root / "metadata" / "snap-901.avro", lschema,
        [_mlist_entry(root, "m1.avro", 0, 1),
         _mlist_entry(root, "m2.avro", 0, 1)],
    )
    _v3_meta(root, [
        {"id": 1, "name": "id", "required": False, "type": "long"},
        {"id": 2, "name": "name", "required": False, "type": "string"},
        {"id": 3, "name": "score", "required": False, "type": "long",
         "initial-default": 42},
    ], last_col=3)

    df, doc = read_iceberg_table(spark, root)
    assert doc["format-version"] == 3
    got = {r.id: r.score for r in df.collect()}
    assert got == {1: 42, 2: 42, 3: 7, 4: None}


def test_v3_initial_default_binary_refuses(spark, tmp_path):
    """r15 ADVICE (low): binary/fixed initial-defaults are JSON
    hex strings and `time` is a text clock reading — a blind
    F.lit(text).cast() would keep the UTF-8 bytes of the hex (or
    null the long), a SILENT misread. The reader must refuse loudly,
    mirroring the nested-default refusal; whitelisted encodings
    (e.g. string) still fill."""
    from sample_iceberg_schema_evolution_pyiceberg_spark.iceberg_export import (
        read_iceberg_table,
    )

    mschema = (FOREIGN / "v2_manifest.avsc").read_text()
    lschema = (FOREIGN / "v2_manifest_list.avsc").read_text()

    def build(name, field):
        root = tmp_path / name
        (root / "data").mkdir(parents=True)
        (root / "metadata").mkdir()
        d1 = root / "data" / "old.parquet"  # pre-evolution file
        pq.write_table(
            pa.table({"id": pa.array([1, 2], pa.int64())}), d1,
        )
        e = _df(d1, 1, content=0)
        e["sequence_number"] = 1
        e["file_sequence_number"] = 1
        write_avro_java(spark, root / "metadata" / "m1.avro", mschema, [e])
        write_avro_java(
            spark, root / "metadata" / "snap-901.avro", lschema,
            [_mlist_entry(root, "m1.avro", 0, 1)],
        )
        _v3_meta(root, [
            {"id": 1, "name": "id", "required": False, "type": "long"},
            dict(field, id=2, required=False),
        ], last_col=2)
        return root

    for bad in (
        {"name": "payload", "type": "binary", "initial-default": "0xDEAD"},
        {"name": "tag", "type": "fixed[4]", "initial-default": "0xCAFE"},
        {"name": "at", "type": "time", "initial-default": "10:15:00"},
    ):
        with pytest.raises(ValueError, match="initial-default"):
            read_iceberg_table(spark, build("bad_" + bad["name"], bad))

    root = build(
        "good_str",
        {"name": "src", "type": "string", "initial-default": "legacy"},
    )
    df, _ = read_iceberg_table(spark, root)
    assert {r.src for r in df.collect()} == {"legacy"}


def _dv_table(spark, tmp_path, name, dv_specs, corrupt_crc=False):
    """v3 fixture: one 4-row data file + REAL puffin deletion vectors.
    dv_specs = [(seq, positions)] — multiple entries reference the
    SAME data file to exercise latest-DV-wins."""
    from sample_iceberg_schema_evolution_pyiceberg_spark.puffin import (
        dv_blob_serialize,
        write_puffin,
    )

    root = tmp_path / name
    (root / "data").mkdir(parents=True)
    (root / "metadata").mkdir()
    d1 = root / "data" / "d.parquet"
    pq.write_table(
        pa.table({"id": pa.array([1, 2, 3, 4], pa.int64()),
                  "name": pa.array(["a", "b", "c", "d"])}), d1,
    )
    m3 = (FOREIGN / "v3_manifest.avsc").read_text()
    m2 = (FOREIGN / "v2_manifest.avsc").read_text()
    lschema = (FOREIGN / "v2_manifest_list.avsc").read_text()
    dd = _df(d1, 1, content=0)
    dd["sequence_number"] = 1
    dd["file_sequence_number"] = 1
    write_avro_java(spark, root / "metadata" / "m1.avro", m2, [dd])
    mlist = [_mlist_entry(root, "m1.avro", 0, 1)]
    for i, (seq, positions) in enumerate(dv_specs):
        blob = dv_blob_serialize(positions)
        if corrupt_crc:
            blob = blob[:-4] + b"\x00\x00\x00\x00"
        ppath = root / "data" / f"dv{i}.puffin"
        write_puffin(ppath, [{
            "data": blob, "type": "deletion-vector-v1", "fields": [],
            "properties": {"referenced-data-file": str(d1),
                           "cardinality": str(len(positions))},
        }])
        de = _df(ppath, 1, content=1, file_format="PUFFIN")
        de["data_file"]["referenced_data_file"] = str(d1)
        de["data_file"]["content_offset"] = 4
        de["data_file"]["content_size_in_bytes"] = len(blob)
        de["sequence_number"] = seq
        de["file_sequence_number"] = seq
        write_avro_java(
            spark, root / "metadata" / f"mdv{i}.avro", m3, [de]
        )
        mlist.append(_mlist_entry(root, f"mdv{i}.avro", 1, seq))
    write_avro_java(
        spark, root / "metadata" / "snap-901.avro", lschema, mlist
    )
    _v3_meta(root, [
        {"id": 1, "name": "id", "required": False, "type": "long"},
        {"id": 2, "name": "name", "required": False, "type": "string"},
    ], last_col=2)
    return root


def test_v3_deletion_vector_decodes(spark, tmp_path):
    """v3 deletion vectors are DECODED (r14 second pass): a real
    puffin file's portable-roaring64 bitmap masks exactly its
    positions; with TWO DVs for one data file the LATEST sequence
    wins outright (a DV replaces its predecessor — deltas are never
    merged); a corrupt blob CRC refuses loudly."""
    from sample_iceberg_schema_evolution_pyiceberg_spark.iceberg_export import (
        read_iceberg_table,
    )

    root = _dv_table(spark, tmp_path, "v3_dv", [(2, [0, 2])])
    df, doc = read_iceberg_table(spark, root)
    assert sorted(r.id for r in df.collect()) == [2, 4]

    root2 = _dv_table(
        spark, tmp_path, "v3_dv_latest", [(2, [0, 2]), (3, [1])]
    )
    df2, _ = read_iceberg_table(spark, root2)
    assert sorted(r.id for r in df2.collect()) == [1, 3, 4]

    root3 = _dv_table(
        spark, tmp_path, "v3_dv_bad", [(2, [0])], corrupt_crc=True
    )
    with pytest.raises(ValueError, match="CRC mismatch"):
        read_iceberg_table(spark, root3)


def test_v3_variant_and_future_version_refuse(spark, tmp_path):
    """variant-class v3 types and format versions beyond 3 refuse
    loudly at metadata time, naming the offending field/version."""
    from sample_iceberg_schema_evolution_pyiceberg_spark.iceberg_export import (
        read_iceberg_table,
    )

    # NESTED variant still refuses (top-level decodes since r16)
    root = tmp_path / "v3_variant"
    (root / "data").mkdir(parents=True)
    _v3_meta(root, [
        {"id": 1, "name": "id", "required": False, "type": "long"},
        {"id": 2, "name": "s", "required": False, "type": {
            "type": "struct", "fields": [
                {"id": 3, "name": "payload", "required": False,
                 "type": "variant"},
            ]}},
    ], last_col=3)
    with pytest.raises(ValueError, match="s.payload"):
        read_iceberg_table(spark, root)

    root4 = tmp_path / "v4_future"
    (root4 / "data").mkdir(parents=True)
    _v3_meta(root4, [
        {"id": 1, "name": "id", "required": False, "type": "long"},
    ], last_col=1, extra={"format-version": 4})
    with pytest.raises(ValueError, match="format-version 4"):
        read_iceberg_table(spark, root4)

    # nested unsupported type is caught with its path
    root5 = tmp_path / "v3_nested_geo"
    (root5 / "data").mkdir(parents=True)
    _v3_meta(root5, [
        {"id": 1, "name": "s", "required": False, "type": {
            "type": "struct", "fields": [
                {"id": 2, "name": "g", "required": False,
                 "type": "geometry(srid=4326)"},
            ]}},
    ], last_col=2)
    with pytest.raises(ValueError, match="s.g"):
        read_iceberg_table(spark, root5)


def test_v3_initial_default_mixed_manifest(spark, tmp_path):
    """r14 review finding: ONE manifest mixing pre- and post-evolution
    files (Iceberg writers merge manifests; rewrite_manifests folds
    them) must fill the default per-FILE, not per inferred-arm-schema
    — pre-evolution rows get the default, post-evolution rows keep
    real values (including real nulls), inside the same manifest."""
    from sample_iceberg_schema_evolution_pyiceberg_spark.iceberg_export import (
        read_iceberg_table,
    )

    root = tmp_path / "v3_mixed"
    (root / "data").mkdir(parents=True)
    (root / "metadata").mkdir()
    d_old = root / "data" / "old.parquet"  # pre-evolution
    pq.write_table(
        pa.table({"id": pa.array([1, 2], pa.int64()),
                  "name": pa.array(["a", "b"])}), d_old,
    )
    d_new = root / "data" / "new.parquet"  # has score incl. a real null
    pq.write_table(
        pa.table({"id": pa.array([3, 4], pa.int64()),
                  "name": pa.array(["c", "d"]),
                  "score": pa.array([7, None], pa.int64())}), d_new,
    )
    mschema = (FOREIGN / "v2_manifest.avsc").read_text()
    lschema = (FOREIGN / "v2_manifest_list.avsc").read_text()

    def entry(path):
        e = _df(path, 1, content=0)
        e["sequence_number"] = 1
        e["file_sequence_number"] = 1
        return e

    # BOTH files in ONE manifest — the shape that broke the arm-level
    # fill
    write_avro_java(
        spark, root / "metadata" / "m1.avro", mschema,
        [entry(d_old), entry(d_new)],
    )
    write_avro_java(
        spark, root / "metadata" / "snap-901.avro", lschema,
        [_mlist_entry(root, "m1.avro", 0, 1)],
    )
    _v3_meta(root, [
        {"id": 1, "name": "id", "required": False, "type": "long"},
        {"id": 2, "name": "name", "required": False, "type": "string"},
        {"id": 3, "name": "score", "required": False, "type": "long",
         "initial-default": 42},
    ], last_col=3)

    df, _doc = read_iceberg_table(spark, root)
    got = {r.id: r.score for r in df.collect()}
    assert got == {1: 42, 2: 42, 3: 7, 4: None}


# ---------------------------------------------------------------------------
# v3 row lineage read (r15, VERDICT r14 item 4)
# ---------------------------------------------------------------------------


def _lineage_schemas():
    """Fixture manifest/list schemas extended with the v3 row-lineage
    fields (data_file.first_row_id id 142; manifest_file.first_row_id
    id 520) the base fixtures omit."""
    m = json.loads((FOREIGN / "v2_manifest.avsc").read_text())
    df_rec = next(f for f in m["fields"] if f["name"] == "data_file")
    df_rec["type"]["fields"].append(
        {"name": "first_row_id", "type": ["null", "long"],
         "default": None, "field-id": 142}
    )
    lst = json.loads((FOREIGN / "v2_manifest_list.avsc").read_text())
    lst["fields"].append(
        {"name": "first_row_id", "type": ["null", "long"],
         "default": None, "field-id": 520}
    )
    return json.dumps(m), json.dumps(lst)


def test_v3_lineage_explicit_ids_honored(spark, tmp_path):
    """A foreign v3 writer materializes first_row_id explicitly:
    entry-level ids win outright (including EXISTING entries), and a
    manifest-list first_row_id seeds inheritance for null entries —
    even when the snapshot itself records no first-row-id."""
    from sample_iceberg_schema_evolution_pyiceberg_spark.iceberg_export import (
        read_iceberg_table,
    )

    root = tmp_path / "v3_lin_explicit"
    (root / "data").mkdir(parents=True)
    (root / "metadata").mkdir()
    files = {}
    for name, ids in (("f1", [1, 2]), ("f2", [3, 4]), ("f3", [5, 6])):
        p = root / "data" / f"{name}.parquet"
        pq.write_table(pa.table({"id": pa.array(ids, pa.int64())}), p)
        files[name] = p
    mschema, lschema = _lineage_schemas()

    def entry(path, status, first_row_id):
        e = _df(path, status, record_count=2, content=0)
        e["data_file"]["first_row_id"] = first_row_id
        e["sequence_number"] = 1
        e["file_sequence_number"] = 1
        return e

    # m1: one ADDED + one EXISTING entry, both explicit
    write_avro_java(
        spark, root / "metadata" / "m1.avro", mschema,
        [entry(files["f1"], 1, 100), entry(files["f2"], 0, 500)],
    )
    # m2: null entry id, the manifest-list base (1000) seeds it
    write_avro_java(
        spark, root / "metadata" / "m2.avro", mschema,
        [entry(files["f3"], 1, None)],
    )
    e1 = _mlist_entry(root, "m1.avro", 0, 1)
    e2 = _mlist_entry(root, "m2.avro", 0, 1)
    e2["first_row_id"] = 1000
    write_avro_java(
        spark, root / "metadata" / "snap-901.avro", lschema, [e1, e2]
    )
    _v3_meta(root, [
        {"id": 1, "name": "id", "required": False, "type": "long"},
    ], last_col=1)  # note: snapshot has NO first-row-id on purpose

    df, _ = read_iceberg_table(spark, root, lineage=True)
    got = {r.id: r._row_id for r in df.collect()}
    assert got == {1: 100, 2: 101, 3: 500, 4: 501, 5: 1000, 6: 1001}
    assert {
        r._last_updated_sequence_number for r in df.collect()
    } == {1}


def test_v3_lineage_existing_without_id_refuses(spark, tmp_path):
    """An EXISTING entry with no explicit first_row_id cannot be
    derived (the spec requires existing entries to materialize their
    assignment) — the lineage read must refuse, not invent ids."""
    from sample_iceberg_schema_evolution_pyiceberg_spark.iceberg_export import (
        read_iceberg_table,
    )

    root = tmp_path / "v3_lin_bad"
    (root / "data").mkdir(parents=True)
    (root / "metadata").mkdir()
    p = root / "data" / "f.parquet"
    pq.write_table(pa.table({"id": pa.array([1, 2], pa.int64())}), p)
    mschema, lschema = _lineage_schemas()
    e = _df(p, 0, record_count=2, content=0)  # status EXISTING
    e["data_file"]["first_row_id"] = None
    e["sequence_number"] = 1
    e["file_sequence_number"] = 1
    write_avro_java(spark, root / "metadata" / "m1.avro", mschema, [e])
    write_avro_java(
        spark, root / "metadata" / "snap-901.avro", lschema,
        [_mlist_entry(root, "m1.avro", 0, 1)],
    )
    doc = _v3_meta(root, [
        {"id": 1, "name": "id", "required": False, "type": "long"},
    ], last_col=1)
    # give the snapshot a first-row-id so the refusal is specifically
    # about the EXISTING entry, not a missing snapshot base
    doc["snapshots"][0]["first-row-id"] = 0
    (root / "metadata" / "v1.metadata.json").write_text(json.dumps(doc))

    with pytest.raises(ValueError, match="EXISTING"):
        read_iceberg_table(spark, root, lineage=True)
    # without lineage the same table reads fine
    df, _ = read_iceberg_table(spark, root)
    assert df.count() == 2


def test_v3_lineage_with_deletion_vectors(spark, tmp_path):
    """Row ids are assigned from the ORIGINAL file positions, so a DV
    masking rows never shifts the survivors' ids."""
    from sample_iceberg_schema_evolution_pyiceberg_spark.iceberg_export import (
        read_iceberg_table,
    )

    root = _dv_table(spark, tmp_path, "v3_lin_dv", [(2, [0, 2])])
    # retrofit the lineage assignment state the fixture omits
    meta_path = root / "metadata" / "v1.metadata.json"
    doc = json.loads(meta_path.read_text())
    doc["snapshots"][0]["first-row-id"] = 0
    doc["next-row-id"] = 4
    meta_path.write_text(json.dumps(doc))

    df, _ = read_iceberg_table(spark, root, lineage=True)
    got = {r.id: r._row_id for r in df.collect()}
    # positions 0 and 2 masked; survivors keep positions 1 and 3
    assert got == {2: 1, 4: 3}


def test_v3_lineage_mixed_explicit_and_derived_manifests(spark, tmp_path):
    """r15 review finding: a snapshot mixing an explicit-base manifest
    with a derived-base one must not reuse the explicit sibling's id
    block — the cursor advances for BOTH, and a genuinely overlapping
    assignment (rebased explicit ids) refuses loudly."""
    from sample_iceberg_schema_evolution_pyiceberg_spark.iceberg_export import (
        read_iceberg_table,
    )

    mschema, lschema = _lineage_schemas()

    def build(name, m1_base, snap_first):
        root = tmp_path / name
        (root / "data").mkdir(parents=True)
        (root / "metadata").mkdir()
        files = {}
        for fname, ids in (("f1", [1, 2]), ("f2", [3, 4])):
            fp = root / "data" / f"{fname}.parquet"
            pq.write_table(pa.table({"id": pa.array(ids, pa.int64())}), fp)
            files[fname] = fp

        def entry(path, first_row_id):
            e = _df(path, 1, record_count=2, content=0)
            e["data_file"]["first_row_id"] = first_row_id
            e["sequence_number"] = 1
            e["file_sequence_number"] = 1
            return e

        # m1: manifest-list explicit base, null entry id (inherits)
        write_avro_java(
            spark, root / "metadata" / "m1.avro", mschema,
            [entry(files["f1"], None)],
        )
        # m2: NO explicit base anywhere — derives from the snapshot
        write_avro_java(
            spark, root / "metadata" / "m2.avro", mschema,
            [entry(files["f2"], None)],
        )
        e1 = _mlist_entry(root, "m1.avro", 0, 1)
        e1["first_row_id"] = m1_base
        e2 = _mlist_entry(root, "m2.avro", 0, 1)
        write_avro_java(
            spark, root / "metadata" / "snap-901.avro", lschema, [e1, e2]
        )
        doc = _v3_meta(root, [
            {"id": 1, "name": "id", "required": False, "type": "long"},
        ], last_col=1)
        doc["snapshots"][0]["first-row-id"] = snap_first
        (root / "metadata" / "v1.metadata.json").write_text(json.dumps(doc))
        return root

    # canonical writer: m1's explicit base IS the snapshot base; m2
    # derives AFTER m1's block -> 100,101 then 102,103
    root = build("mixed_ok", m1_base=100, snap_first=100)
    df, _ = read_iceberg_table(spark, root, lineage=True)
    got = {r.id: r._row_id for r in df.collect()}
    assert got == {1: 100, 2: 101, 3: 102, 4: 103}

    # rebased explicit ids that collide with the derivation refuse
    root2 = build("mixed_overlap", m1_base=103, snap_first=100)
    with pytest.raises(ValueError, match="overlap"):
        read_iceberg_table(spark, root2, lineage=True)


def _variant_table(spark, tmp_path, name, shredded=False):
    """v3 table with one unshredded (or, for the refusal twin,
    shredded) variant column, manifests written by Avro-Java."""
    from sample_iceberg_schema_evolution_pyiceberg_spark.variant import (
        encode_variant,
    )

    root = tmp_path / name
    (root / "data").mkdir(parents=True)
    (root / "metadata").mkdir()
    m1, v1 = encode_variant({"a": 1, "b": "x"})
    m2, v2 = encode_variant([1, 2.5, None, "s"])
    if shredded:
        typ = pa.struct([
            ("metadata", pa.binary()),
            ("value", pa.binary()),
            ("typed_value", pa.int64()),
        ])
        payload = pa.array(
            [
                {"metadata": m1, "value": v1, "typed_value": None},
                {"metadata": m2, "value": None, "typed_value": 7},
                None,
            ],
            type=typ,
        )
    else:
        typ = pa.struct([("metadata", pa.binary()), ("value", pa.binary())])
        payload = pa.array(
            [
                {"metadata": m1, "value": v1},
                {"metadata": m2, "value": v2},
                None,
            ],
            type=typ,
        )
    d1 = root / "data" / "d.parquet"
    pq.write_table(
        pa.table({
            "id": pa.array([1, 2, 3], pa.int64()),
            "payload": payload,
        }),
        d1,
    )
    m2s = (FOREIGN / "v2_manifest.avsc").read_text()
    lschema = (FOREIGN / "v2_manifest_list.avsc").read_text()
    dd = _df(d1, 1, content=0, record_count=3)
    dd["sequence_number"] = 1
    dd["file_sequence_number"] = 1
    write_avro_java(spark, root / "metadata" / "m1.avro", m2s, [dd])
    write_avro_java(
        spark,
        root / "metadata" / "snap-901.avro",
        lschema,
        [_mlist_entry(root, "m1.avro", 0, 1)],
    )
    _v3_meta(root, [
        {"id": 1, "name": "id", "required": False, "type": "long"},
        {"id": 2, "name": "payload", "required": False, "type": "variant"},
    ], last_col=2)
    return root


def test_v3_unshredded_variant_decodes(spark, tmp_path):
    """r16 (VERDICT r15 item 5, conformance row 43): a TOP-LEVEL
    unshredded variant column reads as its deterministic JSON text —
    objects, arrays, mixed scalar types, and a null variant row —
    while a SHREDDED file (typed_value present) refuses loudly
    naming the column and file."""
    from sample_iceberg_schema_evolution_pyiceberg_spark.iceberg_export import (
        read_iceberg_table,
    )

    root = _variant_table(spark, tmp_path, "v3_variant_ok")
    df, _doc = read_iceberg_table(spark, root)
    got = {r.id: r.payload for r in df.collect()}
    assert got == {
        1: '{"a":1,"b":"x"}',
        2: '[1,2.5,null,"s"]',
        3: None,
    }
    assert dict(df.dtypes)["payload"] == "string"

    root2 = _variant_table(
        spark, tmp_path, "v3_variant_shredded", shredded=True
    )
    with pytest.raises(ValueError, match="SHREDDED"):
        read_iceberg_table(spark, root2).__class__  # force the read


def test_v3_materialized_lineage_with_uuid_column(spark, tmp_path):
    """r16 review finding: a table whose schema forces the
    explicit-read_schema path (uuid/time columns) must still surface
    MATERIALIZED _row_id columns — the first cut omitted them from
    the read schema, silently falling back to positional ids. The
    manifest's first_row_id here is a decoy base (100): only the
    materialized values (5, 6) prove the column was read."""
    from sample_iceberg_schema_evolution_pyiceberg_spark.iceberg_export import (
        read_iceberg_table,
    )

    root = tmp_path / "v3_mat_uuid"
    (root / "data").mkdir(parents=True)
    (root / "metadata").mkdir()
    p = root / "data" / "f.parquet"
    pq.write_table(
        pa.table({
            "id": pa.array([1, 2], pa.int64()),
            "u": pa.array(
                [b"\x00" * 16, b"\x11" * 16], pa.binary(16)
            ),
            "_row_id": pa.array([5, 6], pa.int64()),
            "_last_updated_sequence_number": pa.array(
                [1, 1], pa.int64()
            ),
        }),
        p,
    )
    mschema, lschema = _lineage_schemas()
    e = _df(p, 1, record_count=2, content=0)
    e["data_file"]["first_row_id"] = 100  # decoy inheritance base
    e["sequence_number"] = 1
    e["file_sequence_number"] = 1
    write_avro_java(spark, root / "metadata" / "m1.avro", mschema, [e])
    write_avro_java(
        spark, root / "metadata" / "snap-901.avro", lschema,
        [_mlist_entry(root, "m1.avro", 0, 1)],
    )
    _v3_meta(root, [
        {"id": 1, "name": "id", "required": False, "type": "long"},
        {"id": 2, "name": "u", "required": False, "type": "uuid"},
    ], last_col=2)
    df, _ = read_iceberg_table(spark, root, lineage=True)
    got = {r.id: (r._row_id, r.u) for r in df.collect()}
    # materialized ids win over the decoy base; uuid decodes too
    assert got[1] == (5, "00000000-0000-0000-0000-000000000000")
    assert got[2][0] == 6 and got[2][1].startswith("11111111-")
    # without lineage the physical columns stay hidden
    df2, _ = read_iceberg_table(spark, root)
    assert set(df2.columns) == {"id", "u"}


def test_variant_probe_handles_file_uris(spark, tmp_path):
    """r16 review finding: _probe_variant_physical must normalize
    file: URIs from real writers' manifests before the pyarrow
    footer probe (spark.read handles URIs; pyarrow does not)."""
    from sample_iceberg_schema_evolution_pyiceberg_spark.iceberg_export import (
        read_iceberg_table,
    )
    from sample_iceberg_schema_evolution_pyiceberg_spark.variant import (
        encode_variant,
    )

    root = tmp_path / "v3_variant_uri"
    (root / "data").mkdir(parents=True)
    (root / "metadata").mkdir()
    m1, v1 = encode_variant({"a": 1})
    p = root / "data" / "f.parquet"
    pq.write_table(
        pa.table({
            "id": pa.array([1], pa.int64()),
            "payload": pa.array(
                [{"metadata": m1, "value": v1}],
                pa.struct([("metadata", pa.binary()),
                           ("value", pa.binary())]),
            ),
        }),
        p,
    )
    m2s = (FOREIGN / "v2_manifest.avsc").read_text()
    lschema = (FOREIGN / "v2_manifest_list.avsc").read_text()
    dd = _df(f"file://{p}", 1, content=0, record_count=1)
    dd["sequence_number"] = 1
    dd["file_sequence_number"] = 1
    write_avro_java(spark, root / "metadata" / "m1.avro", m2s, [dd])
    write_avro_java(
        spark, root / "metadata" / "snap-901.avro", lschema,
        [_mlist_entry(root, "m1.avro", 0, 1)],
    )
    _v3_meta(root, [
        {"id": 1, "name": "id", "required": False, "type": "long"},
        {"id": 2, "name": "payload", "required": False,
         "type": "variant"},
    ], last_col=2)
    df, _ = read_iceberg_table(spark, root)
    assert [r.payload for r in df.collect()] == ['{"a":1}']
