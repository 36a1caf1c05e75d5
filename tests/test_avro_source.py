"""Avro OCF batch source (b68, r15): the pure-Python OCF reader
cross-checked against files produced by the independent Apache Avro
JAVA implementation bundled with Spark (deflate codec, multi-block),
and the registered Spark Python data source round-tripping every
mapped type including the decimal / date / local-timestamp-micros
logical encodings."""

from __future__ import annotations

import json
from datetime import date, datetime
from decimal import Decimal

import pytest

from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql import types as T

from sample_iceberg_schema_evolution_pyiceberg_spark.avro_ocf import (
    read_ocf,
    read_ocf_header,
    write_ocf,
)
from sample_iceberg_schema_evolution_pyiceberg_spark.sources.avro_source import (
    avro_schema_to_spark,
    register_avro_ocf,
    spark_schema_to_avro,
)


def test_read_ocf_reads_java_written_deflate_multiblock(spark, tmp_path):
    """Files whose every byte comes from the Avro JAVA library —
    deflate codec, sync interval forced low so multiple data blocks
    exist — decode exactly with the pure-Python reader."""
    schema_json = json.dumps(
        {
            "type": "record",
            "name": "row",
            "fields": [
                {"name": "k", "type": "long"},
                {"name": "s", "type": ["null", "string"], "default": None},
                {"name": "x", "type": "double"},
            ],
        }
    )
    jvm = spark._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(schema_json)
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    )
    writer.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    writer.setSyncInterval(64)  # force several blocks for 300 records
    path = tmp_path / "java_deflate.avro"
    writer.create(schema, jvm.java.io.File(str(path)))
    reader = jvm.org.apache.avro.generic.GenericDatumReader(schema)
    factory = jvm.org.apache.avro.io.DecoderFactory.get()
    expect = [
        {"k": i, "s": None if i % 3 == 0 else f"v{i}", "x": i * 0.5}
        for i in range(300)
    ]
    for r in expect:
        payload = dict(r)
        if payload["s"] is not None:
            payload["s"] = {"string": payload["s"]}
        dec = factory.jsonDecoder(schema, json.dumps(payload))
        writer.append(reader.read(None, dec))
    writer.close()

    got_schema, meta, records = read_ocf(str(path))
    assert meta["avro.codec"] == "deflate"
    assert records == expect
    assert got_schema["fields"][0]["name"] == "k"
    # header-only probe sees the same metadata without decoding blocks
    assert json.loads(read_ocf_header(str(path))["avro.schema"]) == got_schema


def test_read_ocf_refusals(tmp_path):
    sch = {"type": "record", "name": "r",
           "fields": [{"name": "a", "type": "long"}]}
    p = tmp_path / "ok.avro"
    write_ocf(str(p), sch, [{"a": 1}, {"a": 2}])
    raw = p.read_bytes()
    with pytest.raises(ValueError, match="bad magic"):
        read_ocf(b"NOPE" + raw[4:])
    # corrupt the trailing sync marker
    bad_sync = bytearray(raw)
    bad_sync[-1] ^= 0xFF
    with pytest.raises(ValueError, match="sync marker"):
        read_ocf(bytes(bad_sync))
    # unknown codec refuses before any block decode
    snappy = raw.replace(b"\x08null", b"\x0csnappy")
    with pytest.raises(ValueError, match="codec"):
        read_ocf(snappy)


def test_avro_datasource_roundtrip_all_types(spark, tmp_path):
    """Every mapped type survives write -> read byte-exactly,
    including nulls, negative decimals, and the logical encodings."""
    register_avro_ocf(spark)
    schema = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("n32", T.IntegerType(), True),
        T.StructField("s", T.StringType(), True),
        T.StructField("flag", T.BooleanType(), True),
        T.StructField("x", T.DoubleType(), True),
        T.StructField("dec", T.DecimalType(18, 4), True),
        T.StructField("d", T.DateType(), True),
        T.StructField("ts", T.TimestampNTZType(), True),
        T.StructField("blob", T.BinaryType(), True),
    ])
    rows = [
        (1, 7, "alpha", True, 1.5, Decimal("12.3400"),
         date(2024, 2, 29), datetime(2024, 2, 29, 23, 59, 59, 123456),
         b"\x00\xff"),
        (2, None, None, None, None, Decimal("-98765.4321"),
         date(1969, 12, 31), datetime(1969, 12, 31, 23, 0, 0), None),
        (3, -1, "", False, -0.0, Decimal("0.0001"),
         date(1970, 1, 1), datetime(1970, 1, 1, 0, 0, 0), b""),
    ]
    df = spark.createDataFrame(rows, schema)
    target = str(tmp_path / "all_types")
    df.repartition(2).write.format("avro_ocf").mode("append").save(target)
    back = spark.read.format("avro_ocf").load(target)
    # inferred schema matches the written one (names, types, nulls)
    assert dict((f.name, f.dataType) for f in back.schema.fields) == dict(
        (f.name, f.dataType) for f in schema.fields
    )
    assert sorted(back.collect()) == sorted(df.collect())
    # overwrite replaces, append accumulates
    df.limit(1).write.format("avro_ocf").mode("overwrite").save(target)
    assert spark.read.format("avro_ocf").load(target).count() == 1


def test_avro_datasource_unsupported_type_refuses(spark, tmp_path):
    register_avro_ocf(spark)
    df = spark.range(3).select(F.array(F.col("id")).alias("arr"))
    with pytest.raises(Exception, match="unsupported Spark type"):
        df.write.format("avro_ocf").mode("append").save(
            str(tmp_path / "bad")
        )


def test_avro_schema_mapping_is_inverse():
    schema = T.StructType([
        T.StructField("a", T.LongType(), False),
        T.StructField("b", T.StringType(), True),
        T.StructField("c", T.DecimalType(10, 2), True),
        T.StructField("d", T.DateType(), True),
        T.StructField("e", T.TimestampNTZType(), False),
    ])
    assert avro_schema_to_spark(spark_schema_to_avro(schema)) == schema


def test_avro_writer_commit_protocol(spark, tmp_path):
    """r15 review findings: task files land in _tmp and only commit()
    publishes them — an abort (failed job) leaves previously-committed
    data intact even in overwrite mode, and uncommitted attempt files
    never surface to the reader."""
    from sample_iceberg_schema_evolution_pyiceberg_spark.sources.avro_source import (
        AvroOcfWriter,
    )

    register_avro_ocf(spark)
    schema = T.StructType([T.StructField("id", T.LongType(), False)])
    df = spark.createDataFrame([(1,), (2,)], schema)
    target = str(tmp_path / "proto")
    df.write.format("avro_ocf").mode("append").save(target)
    assert spark.read.format("avro_ocf").load(target).count() == 2

    # a failed OVERWRITE job: write an attempt, then abort — the old
    # files must survive (the old code deleted them at planning time)
    w = AvroOcfWriter(target, schema, overwrite=True)
    msg = w.write(iter([(99,)]))
    import os as _os

    assert "_tmp" in msg.file_path  # staged, not published
    # the reader never sees staged attempts
    assert spark.read.format("avro_ocf").load(target).count() == 2
    w.abort([msg])
    assert spark.read.format("avro_ocf").load(target).count() == 2
    assert not _os.path.exists(msg.file_path)

    # a SUCCESSFUL overwrite commit: old files replaced, losers of
    # speculative races (staged but not in messages) are dropped
    w2 = AvroOcfWriter(target, schema, overwrite=True)
    winner = w2.write(iter([(7,)]))
    _loser = w2.write(iter([(7,)]))  # duplicate attempt, not committed
    w2.commit([winner])
    got = [r.id for r in spark.read.format("avro_ocf").load(target).collect()]
    assert got == [7]


def test_avro_reader_refuses_heterogeneous_directory(spark, tmp_path):
    """A directory mixing writer schemas must refuse loudly, not
    silently null-fill the columns a file lacks (r15 review)."""
    d = tmp_path / "hetero"
    d.mkdir()
    s1 = {"type": "record", "name": "r",
          "fields": [{"name": "a", "type": "long"}]}
    s2 = {"type": "record", "name": "r",
          "fields": [{"name": "a", "type": "long"},
                     {"name": "b", "type": ["null", "string"],
                      "default": None}]}
    write_ocf(str(d / "p1.avro"), s1, [{"a": 1}])
    write_ocf(str(d / "p2.avro"), s2, [{"a": 2, "b": "x"}])
    register_avro_ocf(spark)
    with pytest.raises(Exception, match="heterogeneous"):
        spark.read.format("avro_ocf").load(str(d)).collect()


def test_varlong_rejects_overlong_varint():
    """An 11-byte continuation sequence must refuse (a 64-bit zigzag
    long is at most 10 bytes); r15 review: the guard was off by one."""
    from sample_iceberg_schema_evolution_pyiceberg_spark.avro_ocf import _Buf

    ok = _Buf(b"\xff\xff\xff\xff\xff\xff\xff\xff\xff\x01")  # 10 bytes
    assert isinstance(ok.varlong(), int)
    bad = _Buf(b"\xff" * 11 + b"\x01")
    with pytest.raises(ValueError, match="varint"):
        bad.varlong()


def test_avro_pruned_reader_skips_files_by_stats(spark, tmp_path):
    """The pruned format's pushFilters + header min/max stats skip
    whole files for selective predicates while every filter stays
    residual (results identical to the unpruned read)."""
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        In,
        LessThanOrEqual,
    )

    from sample_iceberg_schema_evolution_pyiceberg_spark.sources.avro_source import (
        AvroOcfPrunedReader,
    )

    register_avro_ocf(spark)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    schema = T.StructType([
        T.StructField("k", T.LongType(), False),
        T.StructField("s", T.StringType(), True),
    ])
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(100)], schema
    )
    target = str(tmp_path / "pruned")
    df.repartitionByRange(4, "k").write.format("avro_ocf").mode(
        "append"
    ).save(target)

    def kept(filters):
        r = AvroOcfPrunedReader(target, schema)
        residual = r.pushFilters(filters)
        assert list(residual) == list(filters)  # all residual
        return len(r.partitions())

    assert kept([]) == 4
    assert kept([LessThanOrEqual(("k",), 10)]) < 4
    assert kept([EqualTo(("k",), 99)]) == 1
    assert kept([In(("k",), (0, 99))]) == 2
    assert kept([GreaterThan(("k",), 1000)]) == 1  # empty scan keeps 1
    # string stats prune too
    assert kept([EqualTo(("s",), "v0")]) < 4
    # e2e: the pruned format returns exactly the filtered rows
    got = (
        spark.read.format("avro_ocf_pruned")
        .load(target)
        .filter("k <= 10")
        .collect()
    )
    assert sorted(r.k for r in got) == list(range(11))


def test_avro_pruned_stats_nan_and_long_strings_never_prune(spark, tmp_path):
    """r15 review: a file holding NaN must never be pruned on that
    column (Spark orders NaN largest, so `x > hi` can still match),
    and string columns with values beyond the stats cap carry no
    stats (an untruncated bound could overflow the header probe)."""
    from pyspark.sql.datasource import GreaterThan

    from sample_iceberg_schema_evolution_pyiceberg_spark.avro_ocf import (
        read_ocf_header,
    )
    from sample_iceberg_schema_evolution_pyiceberg_spark.sources.avro_source import (
        AvroOcfPrunedReader,
    )

    register_avro_ocf(spark)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    schema = T.StructType([
        T.StructField("x", T.DoubleType(), True),
        T.StructField("s", T.StringType(), True),
    ])
    df = spark.createDataFrame(
        [(5.0, "a"), (float("nan"), "b"), (100.0, "x" * 500)], schema
    )
    target = str(tmp_path / "nanstats")
    df.coalesce(1).write.format("avro_ocf").mode("append").save(target)

    import glob as _glob
    import json as _json

    (f,) = _glob.glob(target + "/*.avro")
    stats = _json.loads(read_ocf_header(f).get("spark.col.stats", "{}"))
    assert "x" not in stats  # NaN present -> no stats for the column
    assert "s" not in stats  # >64-char value -> no stats
    r = AvroOcfPrunedReader(target, schema)
    r.pushFilters([GreaterThan(("x",), 1000.0)])
    assert len(r.partitions()) == 1  # never pruned
    got = (
        spark.read.format("avro_ocf_pruned")
        .load(target)
        .filter("x > 1000.0")
        .collect()
    )
    # Spark's NaN-is-largest semantics: the NaN row matches
    assert len(got) == 1 and str(got[0].x) == "nan"


def test_avro_mergeschema_reads_add_only_evolution(spark, tmp_path):
    """.option('mergeschema', 'true'): the union schema is inferred
    across files, rows from files lacking a column null-fill (the
    column becomes nullable), extra-column refusal is gone — while
    type conflicts and missing non-nullable columns still refuse."""
    d = tmp_path / "merge"
    d.mkdir()
    s1 = {"type": "record", "name": "r",
          "fields": [{"name": "a", "type": "long"}]}
    s2 = {"type": "record", "name": "r",
          "fields": [{"name": "a", "type": "long"},
                     {"name": "b", "type": ["null", "string"],
                      "default": None}]}
    write_ocf(str(d / "p1.avro"), s1, [{"a": 1}])
    write_ocf(str(d / "p2.avro"), s2, [{"a": 2, "b": "x"}])
    register_avro_ocf(spark)
    back = (
        spark.read.format("avro_ocf")
        .option("mergeschema", "true")
        .load(str(d))
    )
    assert back.schema["b"].nullable
    got = sorted((r.a, r.b) for r in back.collect())
    assert got == [(1, None), (2, "x")]
    # without the option the heterogeneous dir still refuses
    with pytest.raises(Exception, match="mergeschema"):
        spark.read.format("avro_ocf").load(str(d)).collect()

    # type conflict refuses even under mergeschema
    d2 = tmp_path / "conflict"
    d2.mkdir()
    write_ocf(str(d2 / "p1.avro"), s1, [{"a": 1}])
    write_ocf(
        str(d2 / "p2.avro"),
        {"type": "record", "name": "r",
         "fields": [{"name": "a", "type": "string"}]},
        [{"a": "oops"}],
    )
    with pytest.raises(Exception, match="type conflicts|conflict"):
        spark.read.format("avro_ocf").option(
            "mergeschema", "true"
        ).load(str(d2)).collect()

    # a user-supplied schema with a NON-nullable column some file
    # lacks refuses (cannot null-fill a required column)
    strict = T.StructType([
        T.StructField("a", T.LongType(), False),
        T.StructField("b", T.StringType(), False),
    ])
    with pytest.raises(Exception, match="non-nullable"):
        spark.read.format("avro_ocf").option(
            "mergeschema", "true"
        ).schema(strict).load(str(d)).collect()


def test_avro_mergeschema_user_schema_type_conflict_refuses(
    spark, tmp_path
):
    """r15 review: with a USER-supplied schema the union inference
    never runs, so the per-file read must still refuse a present
    field whose file type conflicts — not crash opaquely in Arrow.
    Non-record top-level files refuse under merge inference too."""
    d = tmp_path / "uschema"
    d.mkdir()
    write_ocf(
        str(d / "p1.avro"),
        {"type": "record", "name": "r",
         "fields": [{"name": "a", "type": "string"}]},
        [{"a": "text"}],
    )
    register_avro_ocf(spark)
    user = T.StructType([T.StructField("a", T.LongType(), True)])
    with pytest.raises(Exception, match="type conflicts"):
        spark.read.format("avro_ocf").option(
            "mergeschema", "true"
        ).schema(user).load(str(d)).collect()

    d2 = tmp_path / "nonrecord"
    d2.mkdir()
    write_ocf(str(d2 / "p1.avro"), "long", [])
    with pytest.raises(Exception, match="non-record"):
        spark.read.format("avro_ocf").option(
            "mergeschema", "true"
        ).load(str(d2)).collect()


def test_avro_mergeschema_widens_legal_promotions(spark, tmp_path):
    """r16 (VERDICT r15 item 6): Avro schema-resolution promotions —
    int->long, int/long/float->double — merge to the WIDER type with
    a per-file value cast at read; narrowing and non-numeric
    conflicts still refuse."""
    d = tmp_path / "widen"
    d.mkdir()
    s_int = {"type": "record", "name": "r",
             "fields": [{"name": "a", "type": "int"},
                        {"name": "b", "type": "float"}]}
    s_wide = {"type": "record", "name": "r",
              "fields": [{"name": "a", "type": "long"},
                         {"name": "b", "type": "double"}]}
    write_ocf(str(d / "p1.avro"), s_int, [{"a": 1, "b": 1.5}])
    write_ocf(str(d / "p2.avro"), s_wide,
              [{"a": 2**40, "b": 2.25}])
    register_avro_ocf(spark)
    back = (
        spark.read.format("avro_ocf")
        .option("mergeschema", "true")
        .load(str(d))
    )
    assert back.schema["a"].dataType == T.LongType()
    assert back.schema["b"].dataType == T.DoubleType()
    got = sorted((r.a, r.b) for r in back.collect())
    assert got == [(1, 1.5), (2**40, 2.25)]

    # int file + float file for the same field: no direct promotion
    # either way, but both legally widen to double (common supremum)
    d2 = tmp_path / "supremum"
    d2.mkdir()
    write_ocf(
        str(d2 / "p1.avro"),
        {"type": "record", "name": "r",
         "fields": [{"name": "x", "type": "int"}]},
        [{"x": 3}],
    )
    write_ocf(
        str(d2 / "p2.avro"),
        {"type": "record", "name": "r",
         "fields": [{"name": "x", "type": "float"}]},
        [{"x": 0.5}],
    )
    back2 = (
        spark.read.format("avro_ocf")
        .option("mergeschema", "true")
        .load(str(d2))
    )
    assert back2.schema["x"].dataType == T.DoubleType()
    assert sorted(r.x for r in back2.collect()) == [0.5, 3.0]

    # USER-supplied wide schema + mergeschema: per-file gate allows
    # the promotion (int file read as long/double)
    user = T.StructType([
        T.StructField("a", T.DoubleType(), True),
        T.StructField("b", T.DoubleType(), True),
    ])
    got3 = sorted(
        (r.a, r.b)
        for r in spark.read.format("avro_ocf")
        .option("mergeschema", "true")
        .schema(user)
        .load(str(d))
        .collect()
    )
    assert got3 == [(1.0, 1.5), (1099511627776.0, 2.25)]

    # narrowing (long file, int scan) still refuses under mergeschema
    narrow = T.StructType([
        T.StructField("a", T.IntegerType(), True),
        T.StructField("b", T.DoubleType(), True),
    ])
    with pytest.raises(Exception, match="not an Avro-legal widening"):
        spark.read.format("avro_ocf").option(
            "mergeschema", "true"
        ).schema(narrow).load(str(d)).collect()


def test_avro_plain_read_same_names_different_types_refuses(
    spark, tmp_path
):
    """r15 advice: WITHOUT mergeschema, a directory whose files share
    field names but differ in decoded types must refuse with the
    typed message, not fail later as an opaque Arrow error."""
    d = tmp_path / "plainconflict"
    d.mkdir()
    write_ocf(
        str(d / "p1.avro"),
        {"type": "record", "name": "r",
         "fields": [{"name": "a", "type": "long"}]},
        [{"a": 1}],
    )
    write_ocf(
        str(d / "p2.avro"),
        {"type": "record", "name": "r",
         "fields": [{"name": "a", "type": "string"}]},
        [{"a": "oops"}],
    )
    register_avro_ocf(spark)
    user = T.StructType([T.StructField("a", T.LongType(), True)])
    with pytest.raises(Exception, match="mergeschema"):
        spark.read.format("avro_ocf").schema(user).load(
            str(d)
        ).collect()


def test_read_ocf_header_grows_past_probe_limit(tmp_path):
    """r15 advice: a header whose metadata map exceeds the 1 MiB
    probe re-reads with a doubled cap instead of failing as
    'truncated avro data'; a genuinely truncated file still raises
    the truncation error."""
    import json as _json

    schema = {"type": "record", "name": "r",
              "fields": [{"name": "a", "type": "long"}]}
    p = tmp_path / "big_header.avro"
    # hand-assemble an OCF whose metadata map is ~3 MiB
    def vlong(n: int) -> bytes:
        n = (n << 1) ^ (n >> 63)
        out = bytearray()
        while True:
            b = n & 0x7F
            n >>= 7
            if n:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    pad = b"x" * (3 << 20)
    sj = _json.dumps(schema).encode()
    buf = bytearray(b"Obj\x01")
    buf += vlong(3)
    for k, v in [(b"avro.schema", sj), (b"avro.codec", b"null"),
                 (b"pad", pad)]:
        buf += vlong(len(k)) + k + vlong(len(v)) + v
    buf += vlong(0)
    buf += b"S" * 16  # sync marker
    p.write_bytes(bytes(buf))
    meta = read_ocf_header(str(p))
    assert _json.loads(meta["avro.schema"]) == schema
    assert len(meta["pad"]) == 3 << 20

    # truncated mid-header (file ends before the map closes): the
    # whole file was read, so the truncation error surfaces as-is
    q = tmp_path / "trunc.avro"
    q.write_bytes(bytes(buf[: 1 << 10]))
    with pytest.raises(ValueError, match="truncated avro data"):
        read_ocf_header(str(q))
