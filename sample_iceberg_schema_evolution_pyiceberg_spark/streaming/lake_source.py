"""Log-driven streaming source for lake tables (Spark 4 Python Data
Source API): the snapshot log IS the offset log.

``LakeTable.stream_changes`` (table_format.py) streams via Spark's
file source, which trusts the *filesystem* — uncommitted debris from a
crashed write would be streamed, and type-promoted history can fail
the fixed file-source schema. This source closes both gaps by driving
micro-batches from the COMMITTED metadata instead, the way Iceberg's
own streaming read walks its snapshot log:

- offsets are snapshot sequence numbers (``{"seq": N}``): a
  micro-batch is exactly the append snapshots committed in
  ``(start.seq, end.seq]`` — a file that never got a metadata commit
  can never be streamed;
- ``partitions()`` lists each snapshot's parquet files (driver-side,
  metadata-priced); ``read()`` runs ON EXECUTORS and yields Arrow
  record batches — one task per data file, scan parallelism = file
  count, same as the batch path;
- schema alignment happens per file in Arrow (missing columns ->
  nulls, promoted types -> cast), so add-column AND type-promotion
  history both stream correctly;
- a non-append snapshot inside the consumed range raises loudly
  (``changes_between``'s contract: rewrites have no append-only
  delta).

Usage::

    register_lake_stream(spark)          # once per session
    (spark.readStream.format("lake_stream")
          .option("path", str(table.location)).load())

Rows carry the CDC metadata columns ``_snapshot_id`` and
``_change_type`` ('insert'), like ``changes_between``.
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


class LakeStreamReader(DataSourceStreamReader):
    def __init__(self, location: str, schema: T.StructType):
        self.location = location
        self.schema = schema

    # -- metadata-plane (driver) ---------------------------------------

    def _snapshots(self):
        """Committed snapshots, live + history, in commit order."""
        from ..table_format import LakeTable, Snapshot  # noqa: PLC0415

        table = LakeTable.load(self.location)
        snaps = [
            Snapshot.from_json(s)
            for s in table.meta.get("snapshot_history", [])
        ] + table.snapshots
        snaps.sort(key=lambda s: s.sequence_number)
        return snaps

    def initialOffset(self) -> dict:
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
        bad = [s.snapshot_id for s in rng if s.operation != "append"]
        if bad:
            raise TableFormatError(
                f"streaming read range crosses non-append snapshot(s) "
                f"{bad}: rewrites have no append-only delta — restart "
                "the stream from a full snapshot"
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
        Alignment mirrors the batch scan's ``_align_df``: missing
        columns null-fill, promoted types cast, hidden ``_p_*``
        partition columns drop, CDC metadata columns append."""
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
                cols.append(src[field.name].cast(field.type))
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
