"""Partition specs: identity/year/month/day/hour transforms, hidden
partitioning, and spec evolution.

Reference parity (no code copied):
- spec compile: ``/root/reference/lambda/iceberg_helper.py:398-425``
  (``_get_partition_spec``: transforms identity/hour/day/month/year,
  default field name ``{col}_{transform}``, spec field IDs from 1000).
- spec evolution: ``iceberg_helper.py:364-378`` — strict field-list
  equality check, then drop-all-old / add-all-new rebuild.
- source column re-resolution by config position:
  ``iceberg_helper.py:391-396``.

Spark-first realization: each partition field becomes a derived column
``_p_{name}`` computed by a Catalyst expression over the source column;
writes ``partitionBy`` those columns (hive-style directories), and the
scan layer rewrites predicates on the *source* column into predicates on
the partition column so directory pruning kicks in without the user ever
referencing partition columns — Iceberg's "hidden partitioning"
contract, re-expressed with Spark's native partition discovery.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

TRANSFORMS = ("identity", "year", "month", "day", "hour")
PARTITION_COL_PREFIX = "_p_"
SPEC_FIELD_ID_START = 1000  # reference: iceberg_helper.py:398-425


@dataclass(frozen=True)
class PartitionField:
    source_column: str
    transform: str  # one of TRANSFORMS
    name: str  # defaults to {col}_{transform} like the reference
    spec_field_id: int

    @property
    def partition_column(self) -> str:
        return f"{PARTITION_COL_PREFIX}{self.name}"

    def expression(self) -> Column:
        """Catalyst expression computing the partition value.

        Values are strings with lexicographic order == chronological
        order, so range predicates prune directories correctly.
        """
        c = F.col(self.source_column)
        if self.transform == "identity":
            return c
        if self.transform == "year":
            return F.date_format(c, "yyyy")
        if self.transform == "month":
            return F.date_format(c, "yyyy-MM")
        if self.transform == "day":
            return F.date_format(c, "yyyy-MM-dd")
        if self.transform == "hour":
            return F.date_format(c, "yyyy-MM-dd-HH")
        raise ValueError(f"unknown transform {self.transform!r}")

    def truncate_literal(self, value: Any) -> Any:
        """Map a source-column literal to its partition value (for
        predicate rewriting). ``value`` is an ISO date/timestamp string
        or a python datetime/date."""
        if self.transform == "identity":
            return value
        s = str(value)
        widths = {"year": 4, "month": 7, "day": 10, "hour": 13}
        s = s.replace(" ", "-").replace("T", "-")
        return s[: widths[self.transform]]


@dataclass(frozen=True)
class PartitionSpec:
    fields: tuple[PartitionField, ...] = ()

    def __bool__(self) -> bool:
        return bool(self.fields)

    def partition_columns(self) -> list[str]:
        return [f.partition_column for f in self.fields]

    def to_json(self) -> list[dict[str, Any]]:
        return [
            {
                "source_column": f.source_column,
                "transform": f.transform,
                "name": f.name,
                "spec_field_id": f.spec_field_id,
            }
            for f in self.fields
        ]

    @staticmethod
    def from_json(data: list[dict[str, Any]]) -> "PartitionSpec":
        return PartitionSpec(
            tuple(
                PartitionField(
                    d["source_column"],
                    d["transform"],
                    d["name"],
                    int(d["spec_field_id"]),
                )
                for d in data
            )
        )


def compile_partition_spec(
    table_def: dict[str, Any], start_field_id: int = SPEC_FIELD_ID_START
) -> PartitionSpec:
    """partitions config -> PartitionSpec (reference:
    iceberg_helper.py:398-425). Default name ``{col}_{transform}``;
    spec field IDs sequential from 1000."""
    parts = table_def.get("partitions") or []
    fields: list[PartitionField] = []
    fid = start_field_id
    for p in parts:
        col = p["column_name"]
        transform = str(p.get("transform", "identity")).lower()
        if transform not in TRANSFORMS:
            raise ValueError(
                f"partition transform {transform!r} not in {TRANSFORMS}"
            )
        name = p.get("name") or f"{col}_{transform}"
        fields.append(PartitionField(col, transform, name, fid))
        fid += 1
    return PartitionSpec(tuple(fields))


def specs_equal(a: PartitionSpec, b: PartitionSpec) -> bool:
    """Strict field-list equality — the reference's change detector
    (iceberg_helper.py:368)."""
    return [
        (f.source_column, f.transform, f.name) for f in a.fields
    ] == [(f.source_column, f.transform, f.name) for f in b.fields]


def evolve_spec(old: PartitionSpec, new: PartitionSpec) -> PartitionSpec:
    """Drop-all-then-add rebuild (reference: iceberg_helper.py:371-378),
    minting fresh spec field IDs after the old max."""
    if specs_equal(old, new):
        return old
    next_id = max(
        [f.spec_field_id for f in old.fields] + [SPEC_FIELD_ID_START - 1]
    ) + 1
    return PartitionSpec(
        tuple(
            PartitionField(f.source_column, f.transform, f.name, next_id + i)
            for i, f in enumerate(new.fields)
        )
    )


# ---------------------------------------------------------------------------
# Hidden-partitioning predicate rewrite (scan-side pruning)
# ---------------------------------------------------------------------------


def derive_pruning_predicate(
    spec: PartitionSpec,
    source_column: str,
    op: str,
    literal: Any,
) -> Column | None:
    """Rewrite ``source_column <op> literal`` into a predicate on the
    hidden partition column so Spark prunes hive directories.

    Sound because every transform is monotone: for ``t = trunc(x)``,
    ``x >= v  =>  t >= trunc(v)`` and ``x <= v  =>  t <= trunc(v)``;
    equality implies partition equality. The rewritten predicate is a
    *necessary* condition — the original predicate is still applied to
    rows, the rewrite only prunes files.
    """
    for f in spec.fields:
        if f.source_column != source_column:
            continue
        if op == "in":
            # IN-list: partition must hold one of the truncated values
            return F.col(f.partition_column).isin(
                [f.truncate_literal(v) for v in literal]
            )
        lit = F.lit(f.truncate_literal(literal))
        pc = F.col(f.partition_column)
        if op in ("=", "=="):
            return pc == lit
        if op in (">=", ">"):
            return pc >= lit
        if op in ("<=", "<"):
            return pc <= lit
    return None
