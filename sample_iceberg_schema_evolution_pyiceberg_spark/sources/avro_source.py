"""Avro OCF batch data source (SURVEY B5 family; r15, VERDICT r14
item 5) — completes parquet/JSON/CSV/ORC/**Avro** source parity.

The container ships no spark-avro datasource jar and no Python avro
package, so this registers a Spark 4 *Python data source*
(``spark.dataSource.register``, the same public API the streaming
lake source uses) backed by the repo's pure-Python OCF codec
(``avro_ocf.write_ocf`` / ``read_ocf`` — public Apache Avro 1.x
binary spec, cross-checked against the bundled Avro *Java* library in
tests).

Scale posture: reads are one InputPartition per ``.avro`` file —
file-parallel across executors exactly like Spark's file sources (an
OCF is block-sync'd internally, but files are the unit real lake
ingest directories shard by); writes emit one OCF per task partition.
Paths are local-filesystem (the test/interchange shape); a deployment
would swap ``os.listdir``/``open`` for its FileIO — the source's
schema mapping, partition planning, and codec are storage-agnostic.

Type mapping (both directions): long/int/double/float/string/boolean/
binary are primitive-for-primitive; DateType <-> ``{"type": "int",
"logicalType": "date"}`` (epoch days); TimestampNTZType <->
``{"type": "long", "logicalType": "local-timestamp-micros"}`` (wall
clock, timezone-free — deterministic across engines); DecimalType <->
``{"type": "bytes", "logicalType": "decimal"}`` (big-endian
two's-complement unscaled int, per the Avro spec). Nullable fields
are ``["null", T]`` unions.
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass
from datetime import date, datetime, timedelta
from decimal import Decimal
from typing import Any, Iterator

from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

SOURCE_NAME = "avro_ocf"

_EPOCH_DATE = date(1970, 1, 1)
_EPOCH_NTZ = datetime(1970, 1, 1)

_PRIMITIVE_TO_AVRO = {
    T.LongType: "long",
    T.IntegerType: "int",
    T.ShortType: "int",
    T.ByteType: "int",
    T.DoubleType: "double",
    T.FloatType: "float",
    T.StringType: "string",
    T.BooleanType: "boolean",
    T.BinaryType: "bytes",
}


def spark_field_to_avro(f: T.StructField) -> dict[str, Any]:
    dt = f.dataType
    avro: Any
    if isinstance(dt, T.DateType):
        avro = {"type": "int", "logicalType": "date"}
    elif isinstance(dt, T.TimestampNTZType):
        avro = {"type": "long", "logicalType": "local-timestamp-micros"}
    elif isinstance(dt, T.DecimalType):
        avro = {
            "type": "bytes",
            "logicalType": "decimal",
            "precision": dt.precision,
            "scale": dt.scale,
        }
    elif type(dt) in _PRIMITIVE_TO_AVRO:
        avro = _PRIMITIVE_TO_AVRO[type(dt)]
    else:
        raise ValueError(
            f"avro_ocf: unsupported Spark type {dt.simpleString()} for "
            f"field {f.name!r} (primitives, date, timestamp_ntz, "
            "decimal)"
        )
    return {
        "name": f.name,
        "type": ["null", avro] if f.nullable else avro,
    }


def spark_schema_to_avro(schema: T.StructType) -> dict[str, Any]:
    return {
        "type": "record",
        "name": "spark_row",
        "fields": [spark_field_to_avro(f) for f in schema.fields],
    }


def _unwrap_union(t: Any) -> "tuple[Any, bool]":
    """(branch, nullable) of a possibly-``["null", T]`` union."""
    if isinstance(t, list):
        branches = [b for b in t if b != "null"]
        if len(branches) != 1:
            raise ValueError(
                f"avro_ocf: only [null, T] unions supported, got {t!r}"
            )
        return branches[0], True
    return t, False


def avro_field_to_spark(f: dict[str, Any]) -> T.StructField:
    branch, nullable = _unwrap_union(f["type"])
    if isinstance(branch, dict):
        lt = branch.get("logicalType")
        if lt == "date":
            dt: T.DataType = T.DateType()
        elif lt in ("local-timestamp-micros",):
            dt = T.TimestampNTZType()
        elif lt == "timestamp-micros":
            dt = T.TimestampType()
        elif lt == "decimal":
            dt = T.DecimalType(
                int(branch["precision"]), int(branch.get("scale", 0))
            )
        else:
            raise ValueError(
                f"avro_ocf: unsupported nested/logical type {branch!r} "
                f"for field {f['name']!r}"
            )
    else:
        inv = {
            "long": T.LongType(), "int": T.IntegerType(),
            "double": T.DoubleType(), "float": T.FloatType(),
            "string": T.StringType(), "boolean": T.BooleanType(),
            "bytes": T.BinaryType(),
        }
        if branch not in inv:
            raise ValueError(
                f"avro_ocf: unsupported avro type {branch!r} for field "
                f"{f['name']!r}"
            )
        dt = inv[branch]
    return T.StructField(f["name"], dt, nullable)


def avro_schema_to_spark(schema: dict[str, Any]) -> T.StructType:
    if schema.get("type") != "record":
        raise ValueError("avro_ocf: top-level schema must be a record")
    return T.StructType(
        [avro_field_to_spark(f) for f in schema["fields"]]
    )


# -- value conversions (python <-> avro-decoded) ----------------------------


def _to_avro_value(v: Any, f: T.StructField) -> Any:
    if v is None:
        return None
    dt = f.dataType
    if isinstance(dt, T.DateType):
        return (v - _EPOCH_DATE).days
    if isinstance(dt, T.TimestampNTZType):
        return (v - _EPOCH_NTZ) // timedelta(microseconds=1)
    if isinstance(dt, T.DecimalType):
        unscaled = int(v.scaleb(dt.scale).to_integral_value())
        n = max(1, (unscaled.bit_length() + 8) // 8)
        return unscaled.to_bytes(n, "big", signed=True)
    return v


def _from_avro_value(v: Any, f: T.StructField) -> Any:
    if v is None:
        return None
    dt = f.dataType
    if isinstance(dt, T.DateType):
        return _EPOCH_DATE + timedelta(days=v)
    if isinstance(dt, T.TimestampNTZType):
        return _EPOCH_NTZ + timedelta(microseconds=v)
    if isinstance(dt, T.TimestampType):
        from datetime import timezone  # noqa: PLC0415

        # integer timedelta arithmetic, NOT fromtimestamp(v / 1e6):
        # the float division loses sub-microsecond precision for
        # modern epochs (float64 spacing ~0.5 us at 2023 values) and
        # can shift a value by 1 us (r15 review finding)
        return (
            datetime(1970, 1, 1, tzinfo=timezone.utc)
            + timedelta(microseconds=v)
        )
    if isinstance(dt, T.DecimalType):
        unscaled = int.from_bytes(v, "big", signed=True)
        return Decimal(unscaled).scaleb(-dt.scale)
    if isinstance(dt, T.BinaryType):
        return bytes(v)
    return v


def _list_avro_files(path: str) -> list[str]:
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, n)
            for n in os.listdir(path)
            if n.endswith(".avro")
        )
    else:
        files = [path]
    if not files:
        raise FileNotFoundError(f"avro_ocf: no .avro files under {path}")
    return files


@dataclass
class _AvroFilePartition(InputPartition):
    file_path: str


_HEADER_CACHE: dict[tuple, dict] = {}


def _cached_header(path: str) -> dict:
    """OCF header metadata with a per-process cache keyed by
    (path, mtime, size) — merge-mode inference and stats-based pruning
    both probe headers driver-side; without the cache one scan reads
    every header twice (r15 review)."""
    from ..avro_ocf import read_ocf_header  # noqa: PLC0415

    st = os.stat(path)
    key = (path, st.st_mtime_ns, st.st_size)
    hit = _HEADER_CACHE.get(key)
    if hit is None:
        if len(_HEADER_CACHE) > 4096:  # bound the cache
            _HEADER_CACHE.clear()
        hit = _HEADER_CACHE[key] = read_ocf_header(path)
    return hit


# Avro-spec-legal numeric widenings (Avro 1.11 "Schema Resolution"):
# a reader may resolve a writer's narrower type into these wider scan
# types. Kept to the lossless-or-spec-named set — int->long,
# int->double, long->double, float->double; narrowings and the lossy
# long->float never promote. The per-file "cast" is value-level: a
# decoded Python int feeding a DoubleType scan column is made float
# before Arrow conversion (everything else is identity in Python).
_PROMOTIONS: dict = {
    T.IntegerType(): {T.LongType(), T.DoubleType()},
    T.LongType(): {T.DoubleType()},
    T.FloatType(): {T.DoubleType()},
}


def _promotes_to(file_dt: T.DataType, scan_dt: T.DataType) -> bool:
    """True when a file's decoded ``file_dt`` may legally widen into
    the scan's ``scan_dt`` (r16: Avro schema-resolution promotions)."""
    return scan_dt in _PROMOTIONS.get(file_dt, ())


def _widen(a: T.DataType, b: T.DataType) -> "T.DataType | None":
    """The wider of two types when they sit on a legal promotion
    chain, else None (the conflict-refusal path)."""
    if a == b:
        return a
    if _promotes_to(a, b):
        return b
    if _promotes_to(b, a):
        return a
    # int vs float: no direct promotion either way in our set, but
    # both widen to double — take the common supremum
    if {a, b} == {T.IntegerType(), T.FloatType()} or (
        {a, b} == {T.LongType(), T.FloatType()}
    ):
        return T.DoubleType()
    return None


def merged_avro_schema(paths: "list[str]") -> T.StructType:
    """Union of every file's schema (the ``mergeschema`` inference):
    fields match by name; a field absent from some file is nullable in
    the union (its rows null-fill). Types must agree up to the
    Avro-legal widenings in ``_PROMOTIONS`` (r16) — the union takes
    the wider type and each file casts at read. Any other type
    conflict refuses loudly — schema MERGING is ADD-plus-widen
    evolution, never type rewriting."""
    import json as _json  # noqa: PLC0415

    merged: dict[str, T.StructField] = {}
    seen_in: dict[str, int] = {}
    for path in paths:
        doc = _json.loads(_cached_header(path)["avro.schema"])
        if not isinstance(doc, dict) or doc.get("type") != "record":
            # same refusal as the non-merge path — a non-record
            # top-level schema must not silently contribute zero
            # fields (r15 review)
            raise ValueError(
                f"avro_ocf mergeschema: {path} has a non-record "
                "top-level schema — only record files merge"
            )
        for f in doc.get("fields", []):
            sf = avro_field_to_spark(f)
            prev = merged.get(sf.name)
            if prev is None:
                # nullability for absent-from-some-file fields is
                # decided by the seen_in pass below
                merged[sf.name] = sf
            elif prev.dataType != sf.dataType:
                wide = _widen(prev.dataType, sf.dataType)
                if wide is None:
                    raise ValueError(
                        f"avro_ocf mergeschema: field {sf.name!r} is "
                        f"{prev.dataType.simpleString()} in one file "
                        f"and {sf.dataType.simpleString()} in {path} "
                        "— not an Avro-legal widening, type conflicts "
                        "are not merged"
                    )
                merged[sf.name] = T.StructField(
                    sf.name, wide, prev.nullable or sf.nullable
                )
            elif sf.nullable and not prev.nullable:
                merged[sf.name] = T.StructField(
                    sf.name, prev.dataType, True
                )
            seen_in[sf.name] = seen_in.get(sf.name, 0) + 1
    n_files = len(paths)
    return T.StructType(
        [
            T.StructField(
                f.name, f.dataType,
                f.nullable or seen_in[f.name] < n_files,
            )
            for f in merged.values()
        ]
    )


class AvroOcfReader(DataSourceReader):
    def __init__(
        self, path: str, schema: T.StructType, merge: bool = False
    ) -> None:
        self._files = _list_avro_files(path)
        self._schema = schema
        self._merge = merge

    def partitions(self) -> list[_AvroFilePartition]:
        # one partition per file: executor-parallel, like Spark's own
        # file sources split their listings
        return [_AvroFilePartition(f) for f in self._files]

    def read(self, partition: _AvroFilePartition) -> Iterator[tuple]:
        from ..avro_ocf import read_ocf  # noqa: PLC0415

        file_schema, _meta, records = read_ocf(partition.file_path)
        fields = self._schema.fields
        file_names = {f["name"] for f in file_schema.get("fields", [])}
        expect = [f.name for f in fields]
        # per-file promotion plan: file fields whose decoded type
        # legally widens into the scan type (mergeschema only) — the
        # value-level "cast" is applied at yield time below
        promote_float: set[str] = set()
        if self._merge:
            # explicit opt-in (.option("mergeschema", "true")):
            # ADD-only evolution — a field a file lacks must be
            # NULLABLE in the scan schema (null-fill); extra file
            # fields were either merged into the schema or the user
            # projected them away. PRESENT fields must match the scan
            # type exactly — with a user-supplied schema the union
            # inference never ran, so the per-file check is the only
            # type gate (r15 review: a mismatch would otherwise
            # surface as an opaque Arrow crash or silent corruption)
            file_types = {
                f["name"]: avro_field_to_spark(f).dataType
                for f in file_schema.get("fields", [])
            }
            for f in fields:
                if f.name not in file_names:
                    if not f.nullable:
                        raise ValueError(
                            f"avro_ocf mergeschema: "
                            f"{partition.file_path} lacks "
                            f"non-nullable field {f.name!r} — "
                            "cannot null-fill a required column"
                        )
                elif file_types[f.name] != f.dataType:
                    if _promotes_to(file_types[f.name], f.dataType):
                        # Avro-legal widening (r16): the file decodes
                        # at its own narrower type; only int->double
                        # needs an explicit Python float() — the rest
                        # are identity at the value level
                        if f.dataType == T.DoubleType():
                            promote_float.add(f.name)
                    else:
                        raise ValueError(
                            f"avro_ocf mergeschema: field {f.name!r} "
                            f"is {file_types[f.name].simpleString()} "
                            f"in {partition.file_path} but the scan "
                            f"schema expects "
                            f"{f.dataType.simpleString()} — not an "
                            "Avro-legal widening, type conflicts are "
                            "not merged"
                        )
        else:
            if sorted(file_names) != sorted(expect):
                # schema came from ONE file (or the user): a file
                # whose own writer schema differs would silently
                # null-fill missing columns and drop extras — refuse
                # loudly (r15 review finding; same posture as the
                # lake scan); heterogeneous dirs read via mergeschema
                raise ValueError(
                    f"avro_ocf: {partition.file_path} carries fields "
                    f"{sorted(file_names)} but the scan schema "
                    f"expects {sorted(expect)} — heterogeneous "
                    "directories are not silently aligned; pass "
                    '.option("mergeschema", "true") for ADD-only '
                    "evolution, or rewrite the files under one schema"
                )
            # names match — the types must too: a same-named field of
            # a different decoded type would otherwise surface as an
            # opaque Arrow conversion error instead of this typed
            # refusal (r15 advice); widenings require the explicit
            # mergeschema opt-in
            file_types = {
                f["name"]: avro_field_to_spark(f).dataType
                for f in file_schema.get("fields", [])
            }
            for f in fields:
                if file_types[f.name] != f.dataType:
                    raise ValueError(
                        f"avro_ocf: field {f.name!r} is "
                        f"{file_types[f.name].simpleString()} in "
                        f"{partition.file_path} but the scan schema "
                        f"expects {f.dataType.simpleString()} — pass "
                        '.option("mergeschema", "true") to widen '
                        "Avro-promotable types, or rewrite the files "
                        "under one schema"
                    )
        if promote_float:
            for rec in records:
                yield tuple(
                    (
                        float(v)
                        if f.name in promote_float
                        and (v := rec.get(f.name)) is not None
                        else _from_avro_value(rec.get(f.name), f)
                    )
                    for f in fields
                )
            return
        for rec in records:
            yield tuple(
                _from_avro_value(rec.get(f.name), f) for f in fields
            )


@dataclass
class _AvroCommit(WriterCommitMessage):
    file_path: str
    n_rows: int


_TMP_DIR = "_tmp"


class AvroOcfWriter(DataSourceWriter):
    """Task attempts write into ``path/_tmp/`` (invisible to the
    reader's ``*.avro`` top-level listing); ``commit()`` publishes
    exactly the files named by the SUCCESSFUL attempts' commit
    messages via rename, then clears the temp dir — so failed or
    speculative duplicate attempts never surface rows, and an
    ``overwrite`` removes the previous files only at commit time (a
    failed overwrite job leaves the old data intact; r15 review
    findings)."""

    def __init__(
        self, path: str, schema: T.StructType, overwrite: bool
    ) -> None:
        self._path = path
        self._schema = schema
        self._avro = spark_schema_to_avro(schema)
        self._overwrite = overwrite
        os.makedirs(os.path.join(path, _TMP_DIR), exist_ok=True)

    # strings longer than this carry no stats: untruncated bounds
    # could overflow the reader's bounded header probe, and a sound
    # truncated upper bound needs the UnicodeUtil increment — dropping
    # the column's stats is always safe (no stats = never pruned)
    _STATS_MAX_STR = 64

    def write(self, iterator: Iterator[Any]) -> _AvroCommit:
        import json as _json  # noqa: PLC0415

        from ..avro_ocf import write_ocf  # noqa: PLC0415

        fields = self._schema.fields
        # single pass: convert AND fold per-column min/max (r15 review:
        # materializing the raw rows next to the converted records
        # doubled peak task memory). Stats come from the CONVERTED
        # values — identical for the int/float/string columns they
        # cover (conversion only rewrites date/ts/decimal).
        stat_cols = {
            f.name
            for f in fields
            if isinstance(
                f.dataType,
                (T.LongType, T.IntegerType, T.ShortType, T.ByteType,
                 T.DoubleType, T.FloatType, T.StringType),
            )
        }
        stats: dict[str, list] = {}
        dropped: set[str] = set()
        records = []
        for row in iterator:
            rec = {
                f.name: _to_avro_value(row[i], f)
                for i, f in enumerate(fields)
            }
            records.append(rec)
            for name in stat_cols:
                if name in dropped:
                    continue
                v = rec[name]
                if v is None:
                    continue
                # NaN is not ordered by min/max but IS matched by
                # Spark's NaN-is-largest comparisons — a file holding
                # NaN must never be pruned on this column (r15 review)
                if isinstance(v, float) and v != v:
                    dropped.add(name)
                    stats.pop(name, None)
                    continue
                if (
                    isinstance(v, str)
                    and len(v) > self._STATS_MAX_STR
                ):
                    dropped.add(name)
                    stats.pop(name, None)
                    continue
                cur = stats.get(name)
                if cur is None:
                    stats[name] = [v, v]
                elif v < cur[0]:
                    cur[0] = v
                elif v > cur[1]:
                    cur[1] = v
        out = os.path.join(
            self._path, _TMP_DIR, f"part-{uuid.uuid4().hex}.avro"
        )
        write_ocf(
            out, self._avro, records,
            {"spark.col.stats": _json.dumps(stats)} if stats else None,
        )
        return _AvroCommit(out, len(records))

    def commit(self, messages) -> None:
        import shutil  # noqa: PLC0415

        if self._overwrite:
            for n in os.listdir(self._path):
                if n.endswith(".avro"):
                    os.remove(os.path.join(self._path, n))
        for m in messages:
            if m is None:
                continue
            final = os.path.join(self._path, os.path.basename(m.file_path))
            os.replace(m.file_path, final)
        # losers of speculative races / failed attempts stay in _tmp —
        # drop them with the dir
        shutil.rmtree(os.path.join(self._path, _TMP_DIR), ignore_errors=True)

    def abort(self, messages) -> None:
        import shutil  # noqa: PLC0415

        shutil.rmtree(os.path.join(self._path, _TMP_DIR), ignore_errors=True)


class AvroOcfDataSource(DataSource):
    """``spark.read.format("avro_ocf").load(path)`` /
    ``df.write.format("avro_ocf").save(path)``."""

    @classmethod
    def name(cls) -> str:
        return SOURCE_NAME

    def _merge(self) -> bool:
        return str(
            self.options.get("mergeschema", "false")
        ).lower() == "true"

    def schema(self) -> T.StructType:
        import json as _json  # noqa: PLC0415

        from ..avro_ocf import read_ocf_header  # noqa: PLC0415

        files = _list_avro_files(self.options["path"])
        if self._merge():
            return merged_avro_schema(files)
        meta = read_ocf_header(files[0])
        return avro_schema_to_spark(_json.loads(meta["avro.schema"]))

    def reader(self, schema: T.StructType) -> AvroOcfReader:
        return AvroOcfReader(
            self.options["path"], schema, merge=self._merge()
        )

    def writer(self, schema: T.StructType, overwrite: bool) -> AvroOcfWriter:
        return AvroOcfWriter(self.options["path"], schema, overwrite)


PRUNED_SOURCE_NAME = "avro_ocf_pruned"


class AvroOcfPrunedReader(AvroOcfReader):
    """avro_ocf reader with FILTER-PUSHDOWN file pruning: comparison
    filters on single columns are checked against each file's embedded
    min/max header stats (written by AvroOcfWriter) and files the
    stats provably exclude are never opened — the parquet
    row-group-stats idea at file granularity, which is what makes a
    100 TB ingest directory scannable for a selective predicate.
    Every filter is also returned as residual, so Spark re-applies the
    exact predicate row-level: pruning can only skip files, never
    change results. Registered as a SEPARATE format because a reader
    that implements pushFilters hard-fails under the default
    ``spark.sql.python.filterPushdown.enabled=false`` — the plain
    avro_ocf format must stay usable on vanilla sessions."""

    def __init__(
        self, path: str, schema: T.StructType, merge: bool = False
    ) -> None:
        super().__init__(path, schema, merge=merge)
        self._pruning: list = []

    def pushFilters(self, filters):
        from pyspark.sql.datasource import (  # noqa: PLC0415
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            In,
            LessThan,
            LessThanOrEqual,
        )

        usable = (
            EqualTo, GreaterThan, GreaterThanOrEqual, LessThan,
            LessThanOrEqual, In,
        )
        # eager, not a generator: the pruning list must be complete
        # even if the caller never exhausts the returned iterable
        self._pruning = [
            f
            for f in filters
            if isinstance(f, usable) and len(f.attribute) == 1
        ]
        return list(filters)  # ALL residual: Spark re-applies them

    @staticmethod
    def _excludes(f, lo, hi) -> bool:
        """True when file range [lo, hi] provably has no matching row."""
        from pyspark.sql.datasource import (  # noqa: PLC0415
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            In,
            LessThan,
            LessThanOrEqual,
        )

        try:
            if isinstance(f, EqualTo):
                return f.value < lo or f.value > hi
            if isinstance(f, In):
                return all(v < lo or v > hi for v in f.value)
            if isinstance(f, GreaterThan):
                return hi <= f.value
            if isinstance(f, GreaterThanOrEqual):
                return hi < f.value
            if isinstance(f, LessThan):
                return lo >= f.value
            if isinstance(f, LessThanOrEqual):
                return lo > f.value
        except TypeError:
            return False  # incomparable types: keep the file
        return False

    def partitions(self) -> list[_AvroFilePartition]:
        import json as _json  # noqa: PLC0415

        parts = super().partitions()
        if not self._pruning:
            return parts
        kept = []
        for p in parts:
            stats = _json.loads(
                _cached_header(p.file_path).get("spark.col.stats", "{}")
            )
            excluded = False
            for f in self._pruning:
                rng = stats.get(f.attribute[0])
                if rng is not None and self._excludes(f, rng[0], rng[1]):
                    excluded = True
                    break
            if not excluded:
                kept.append(p)
        # an empty scan still needs one partition to carry the schema
        return kept or parts[:1]


class AvroOcfPrunedDataSource(AvroOcfDataSource):
    """``spark.read.format("avro_ocf_pruned")`` — requires
    ``spark.sql.python.filterPushdown.enabled=true`` (Spark refuses a
    pushFilters reader under the default conf)."""

    @classmethod
    def name(cls) -> str:
        return PRUNED_SOURCE_NAME

    def reader(self, schema: T.StructType) -> AvroOcfPrunedReader:
        return AvroOcfPrunedReader(
            self.options["path"], schema, merge=self._merge()
        )


def register_avro_ocf(spark: SparkSession) -> None:
    """Idempotent session registration of both avro_ocf formats."""
    spark.dataSource.register(AvroOcfDataSource)
    spark.dataSource.register(AvroOcfPrunedDataSource)
