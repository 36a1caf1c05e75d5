"""Log-driven streaming source for lake tables (Spark 4 Python Data
Source API): the snapshot log IS the offset log.

``LakeTable.stream_changes`` (table_format.py) can also stream via
Spark's file source, which trusts the *filesystem* — uncommitted
debris from a crashed write would be streamed, and type-promoted
history can fail the fixed file-source schema. This source closes
both gaps by driving micro-batches from the COMMITTED metadata, the
way Iceberg's own streaming read walks its snapshot log:

- offsets are snapshot sequence numbers (``{"seq": N}``): a
  micro-batch is exactly the append snapshots committed in
  ``(start.seq, end.seq]`` — a file that never got a metadata commit
  can never be streamed;
- a FRESH stream on a table whose history contains rewrites
  (overwrite/compact/DML) starts at the LATEST rewrite: that
  snapshot's full state is the base load, then appends stream
  incrementally. A rewrite landing inside an already-running (or
  checkpoint-recovered) stream's range fails loudly — the consumer
  holds pre-rewrite rows, so no append-only delta exists
  (``changes_between``'s contract);
- ``partitions()`` lists each snapshot's parquet files (driver-side,
  metadata-priced); ``read()`` runs ON EXECUTORS and yields Arrow
  record batches — one task per data file, scan parallelism = file
  count, same as the batch path;
- schema alignment happens per file in Arrow and is RECURSIVE
  (missing columns/struct fields -> nulls, promoted types -> cast,
  incl. structs and arrays-of-structs), mirroring the batch scan's
  ``_align_df``;
- no per-batch admission control: ``latestOffset`` has no start
  argument and the Python runner may use separate reader instances
  per call, so a rate cap can't be tracked reliably — backfill
  arrives as one batch (the same shape as the availableNow
  fallback). Bound backfills operationally by starting streams
  before large histories accumulate, or compact first.

Requires table metadata on the local filesystem (the reader runs in
its own worker process and re-reads the log each batch; a
non-filesystem metadata backend can't be shared with it —
``stream_changes`` raises before starting in that case and points at
``source="files"``).

Usage::

    register_lake_stream(spark)          # once per session
    (spark.readStream.format("lake_stream")
          .option("path", str(table.location)).load())

Rows carry the CDC metadata columns ``_snapshot_id`` and
``_change_type`` ('insert'), like ``changes_between``. Triggers:
micro-batch and availableNow both work; Spark runs availableNow for
Python data sources as a single catch-up batch (no
SupportsTriggerAvailableNow in the Python bridge), which preserves
its process-everything-then-stop semantics coarsely.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

SOURCE_NAME = "lake_stream"
_META_FIELDS = [
    T.StructField("_snapshot_id", T.StringType()),
    T.StructField("_change_type", T.StringType()),
]


@dataclass
class _FilePartition(InputPartition):
    file_path: str
    snapshot_id: str


def _align_arrow(arr, target):
    """Recursive Arrow alignment to a target type: struct fields are
    matched by name (missing -> nulls, extra -> dropped), lists recurse
    into their element type, everything else casts. The Arrow twin of
    table_format._align_expr — a plain ``cast`` throws on structs whose
    field sets differ, which is exactly the add-nested-field evolution
    this format supports."""
    import pyarrow as pa  # noqa: PLC0415

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.type.equals(target):
        return arr
    if pa.types.is_struct(target) and pa.types.is_struct(arr.type):
        children = []
        for i in range(target.num_fields):
            f = target.field(i)
            if arr.type.get_field_index(f.name) >= 0:
                children.append(_align_arrow(arr.field(f.name), f.type))
            else:
                children.append(pa.nulls(len(arr), type=f.type))
        return pa.StructArray.from_arrays(
            children,
            fields=[target.field(i) for i in range(target.num_fields)],
            mask=arr.is_null(),
        )
    if (
        pa.types.is_list(target) or pa.types.is_large_list(target)
    ) and (
        pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type)
    ):
        values = _align_arrow(arr.values, target.value_type)
        return pa.ListArray.from_arrays(
            arr.offsets.cast(pa.int32()), values, mask=arr.is_null()
        )
    return arr.cast(target)


class LakeStreamReader(DataSourceStreamReader):
    def __init__(self, location: str, schema: T.StructType):
        self.location = location
        self.schema = schema

    # -- metadata-plane (driver-side worker) ---------------------------

    def _snapshots(self):
        """Committed snapshots, live + history, in commit order."""
        from ..table_format import LakeTable  # noqa: PLC0415

        return LakeTable.load(self.location).all_snapshots()

    def initialOffset(self) -> dict:
        """Fresh stream: start at the latest rewrite boundary — the
        rewrite snapshot itself becomes the base load (its dir IS the
        table state), then appends stream incrementally. The base-load
        grant rides IN the offset (``base``): offsets are durable and
        replayed verbatim from the checkpoint, and the Python runner
        may use separate reader instances per call, so instance state
        would be neither shared nor recoverable — the offset is the
        only reliable carrier."""
        # full-state rewrites only: a predicate-delete snapshot has no
        # data dir and cannot serve as a base load (tables carrying
        # live delete predicates need a compact() before streaming)
        snaps = self._snapshots()
        rewrites = [s for s in snaps if s.is_rewrite]
        if rewrites:
            base = rewrites[-1].sequence_number
            return {"seq": base - 1, "base": base}
        # legacy pre-sequence-number metadata: every snapshot carries
        # sequence_number 0 — starting at seq 0 would place ALL existing
        # rows outside the half-open (start, end] range and silently
        # never stream them; start below the log instead
        if snaps and all(s.sequence_number == 0 for s in snaps):
            return {"seq": -1}
        return {"seq": 0}

    def latestOffset(self) -> dict:
        snaps = self._snapshots()
        return {"seq": snaps[-1].sequence_number if snaps else 0}

    def partitions(self, start: dict, end: dict):
        from ..table_format import TableFormatError  # noqa: PLC0415

        rng = [
            s
            for s in self._snapshots()
            if start["seq"] < s.sequence_number <= end["seq"]
        ]
        # a non-append snapshot streams ONLY as the base load its own
        # initial offset granted (start.base) — any other rewrite in
        # range means the consumer holds pre-rewrite rows
        bad = [
            s.snapshot_id
            for s in rng
            if s.operation != "append"
            and s.sequence_number != start.get("base")
        ]
        if bad:
            raise TableFormatError(
                f"streaming read range crosses non-append snapshot(s) "
                f"{bad}: the consumer holds pre-rewrite rows, no "
                "append-only delta exists — start a NEW stream (a fresh "
                "stream base-loads from the latest rewrite)"
            )
        parts: list[InputPartition] = []
        for s in rng:
            root = os.path.join(self.location, s.data_dir)
            for dirpath, _dirs, files in os.walk(root):
                parts.extend(
                    _FilePartition(os.path.join(dirpath, f), s.snapshot_id)
                    for f in sorted(files)
                    if f.endswith(".parquet")
                )
        return parts

    def commit(self, end: dict) -> None:
        pass

    # -- data-plane (executors) ----------------------------------------

    def read(self, partition: _FilePartition):
        """Executor-side: one parquet file -> aligned Arrow batches.
        Alignment mirrors the batch scan's ``_align_df`` (recursive —
        see ``_align_arrow``); hidden ``_p_*`` partition columns drop,
        CDC metadata columns append."""
        import pyarrow as pa  # noqa: PLC0415
        import pyarrow.parquet as pq  # noqa: PLC0415
        from pyspark.sql.pandas.types import to_arrow_schema  # noqa: PLC0415

        from ..partitioning import PARTITION_COL_PREFIX  # noqa: PLC0415

        data_fields = self.schema.fields[: -len(_META_FIELDS)]
        target = to_arrow_schema(T.StructType(data_fields))
        src = pq.read_table(partition.file_path)
        src = src.drop_columns(
            [c for c in src.column_names if c.startswith(PARTITION_COL_PREFIX)]
        )
        n = src.num_rows
        cols = []
        for field in target:
            if field.name in src.column_names:
                cols.append(_align_arrow(src[field.name], field.type))
            else:
                cols.append(pa.nulls(n, type=field.type))
        cols.append(pa.array([partition.snapshot_id] * n, type=pa.string()))
        cols.append(pa.array(["insert"] * n, type=pa.string()))
        out_schema = pa.schema(
            list(target)
            + [
                pa.field("_snapshot_id", pa.string()),
                pa.field("_change_type", pa.string()),
            ]
        )
        yield from pa.table(cols, schema=out_schema).to_batches()


class LakeStreamDataSource(DataSource):
    """``spark.readStream.format("lake_stream")`` — see module
    docstring. Required option: ``path`` (the table location)."""

    @classmethod
    def name(cls) -> str:
        return SOURCE_NAME

    def schema(self) -> T.StructType:
        from ..table_format import LakeTable  # noqa: PLC0415

        table = LakeTable.load(self.options["path"])
        return T.StructType(list(table.schema.fields) + _META_FIELDS)

    def streamReader(self, schema: T.StructType) -> LakeStreamReader:
        return LakeStreamReader(self.options["path"], schema)


def register_lake_stream(spark: SparkSession) -> None:
    """Idempotent session registration of the lake_stream source."""
    spark.dataSource.register(LakeStreamDataSource)
