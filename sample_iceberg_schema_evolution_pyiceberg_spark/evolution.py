"""Schema-evolution planner/applier: ordered application of
``SchemaChange`` records onto a live table.

Reference parity (no code copied) — the apply order inside one
evolution transaction mirrors ``/root/reference/lambda/iceberg_helper.py:303-363``:

1. drop columns absent from target (:305-310)
2. add root columns — children of a newly added struct are suppressed,
   the parent add carries them (:311-323)
3. add nested columns via dotted paths, incl. array-element structs
   (:324-329)
4. update column types — **primitives only**, nested update flags are
   skipped (:330-336)
5. reorder root columns to target order == target field_id order
   (:338-347)
6. reorder struct children the same way (:349-363)

Then partition-spec evolution: strict equality check, drop-all/add-all
rebuild (:364-378).

Enforcement note: the reference computes ``data_type_change_allowed``
but only logs it (:297-299), relying on PyIceberg's
``allow_incompatible_changes=False`` to raise — which its outer handler
converts to error messages (:379-389). We enforce pre-flight and produce
the same observable contract: illegal changes -> error messages, no
partial commit.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from pyspark.sql import types as T

from .schema_compiler import max_field_id
from .schema_diff import SchemaChange, diff_schemas
from .partitioning import PartitionSpec, evolve_spec, specs_equal
from .table_format import LakeTable


@dataclass
class EvolutionResult:
    changed: bool = False
    messages: list[str] = dc_field(default_factory=list)
    errors: list[str] = dc_field(default_factory=list)
    new_schema_version: int | None = None
    new_spec_id: int | None = None

    @property
    def has_error(self) -> bool:
        return bool(self.errors)


def evolve_table(
    table: LakeTable,
    target_schema: T.StructType,
    target_spec: PartitionSpec | None = None,
    renames: "list[dict] | None" = None,
) -> EvolutionResult:
    """Diff live schema vs target and apply the evolution transaction
    (metadata-only; no data rewrite).

    ``renames`` ([{from, to}] — the table-def's explicit rename
    directives) apply FIRST, so the subsequent diff sees the renamed
    column as unchanged rather than drop+add. Documented divergence
    from the reference (iceberg_helper.py:254-295), whose config diff
    has no rename vocabulary and destroys column history on rename."""
    res = EvolutionResult()
    for r in renames or []:
        frm, to = r["from"], r["to"]
        if frm == to:
            continue
        live_names = set(table.schema.fieldNames())
        if frm not in live_names and to in live_names:
            continue  # already applied (idempotent re-run of a config)
        try:
            res.new_schema_version = table.rename_column(frm, to)
        except Exception as e:  # noqa: BLE001 — accumulate, don't raise
            res.errors.append(f"Rename {frm} -> {to} failed: {e}")
            return res
        res.messages.append(f"Renamed column {frm} to {to}")
        res.changed = True
    live = table.schema
    changes = diff_schemas(live, target_schema)

    # pre-flight validation (we enforce; reference logs + lets the
    # library reject — same net contract)
    for ch in changes:
        ok, errs = ch.data_type_change_allowed()
        if not ok:
            res.errors.extend(errs)
    if res.errors:
        return res

    if changes:
        new_schema = _apply_changes(live, target_schema, changes, res)
        res.new_schema_version = table.commit_schema(new_schema)
        res.changed = True

    if target_spec is not None and not specs_equal(
        table.partition_spec, target_spec
    ):
        old = table.partition_spec
        new = evolve_spec(old, target_spec)
        res.new_spec_id = table.commit_spec(new)
        res.messages.append(
            "Updated partition spec: "
            f"removed {[f.name for f in old.fields]}, "
            f"added {[f.name for f in new.fields]}"
        )
        res.changed = True
    return res


# ---------------------------------------------------------------------------


def _apply_changes(
    live: T.StructType,
    target: T.StructType,
    changes: list[SchemaChange],
    res: EvolutionResult,
) -> T.StructType:
    schema = live
    drops = [c for c in changes if c.drop]
    adds = [c for c in changes if c.add]
    updates = [c for c in changes if c.update]
    added_paths = {c.column_path for c in adds}

    # 1. drops — children of a dropped parent vanish with it
    dropped_roots: set[str] = set()
    for ch in drops:
        if any(
            ch.column_path.startswith(p + ".")
            for p in dropped_roots | {d.column_path for d in drops if d is not ch}
            if ch.column_path.startswith(p + ".")
        ):
            continue
        schema = _drop_path(schema, ch.column_path)
        dropped_roots.add(ch.column_path)
        res.messages.append(f"Dropped column {ch.column_path}")

    # 2. root adds (append at end; reorder pass fixes position)
    for ch in adds:
        if ch.is_nested:
            continue
        schema = T.StructType(
            [*schema.fields, _target_field(target, ch.column_path)]
        )
        res.messages.append(f"Added column {ch.column_path}")

    # 3. nested adds — skip children whose parent (or any ancestor) was
    #    itself just added (reference: iceberg_helper.py:316-321)
    for ch in adds:
        if not ch.is_nested:
            continue
        if _ancestor_added(ch.column_path, added_paths):
            continue
        schema = _add_nested(schema, ch.column_path, _target_field(target, ch.column_path))
        res.messages.append(f"Added column {ch.column_path}")

    # 4. type updates — primitives only (reference: iceberg_helper.py:330-336)
    for ch in updates:
        if isinstance(
            ch.target_type, (T.StructType, T.ArrayType, T.MapType)
        ) or isinstance(ch.existing_type, (T.StructType, T.ArrayType, T.MapType)):
            res.messages.append(
                f"Skipped nested type update for {ch.column_path}"
            )
            continue
        schema = _update_path_type(schema, ch.column_path, ch.target_type)
        res.messages.append(
            f"Updated column {ch.column_path} to {ch.target_type.simpleString()}"
        )

    # 5 + 6. reorder roots and struct children to target order
    schema = _reorder(schema, target)
    return schema


def _ancestor_added(path: str, added: set[str]) -> bool:
    parts = path.split(".")
    return any(".".join(parts[:i]) in added for i in range(1, len(parts)))


def _target_field(target: T.StructType, path: str) -> T.StructField:
    """Resolve a dotted path in the target schema to its StructField,
    re-assigning fresh metadata untouched."""
    dt: T.DataType = target
    fld: T.StructField | None = None
    for part in path.split("."):
        if part == "element":
            dt = dt.elementType  # type: ignore[union-attr]
            continue
        if part in ("key", "value") and isinstance(dt, T.MapType):
            dt = dt.keyType if part == "key" else dt.valueType
            continue
        assert isinstance(dt, T.StructType), path
        fld = dt[part]
        dt = fld.dataType
    assert fld is not None
    return fld


def _edit_struct_at(
    schema: T.StructType, parts: list[str], edit
) -> T.StructType:
    """Apply ``edit(StructType) -> StructType`` at the struct addressed
    by ``parts`` (navigating struct fields, array ``element``, map
    ``key``/``value``)."""
    if not parts:
        return edit(schema)

    head, *rest = parts

    def rebuild(dt: T.DataType, path_parts: list[str]) -> T.DataType:
        if not path_parts:
            assert isinstance(dt, T.StructType)
            return edit(dt)
        p, *r = path_parts
        if p == "element":
            assert isinstance(dt, T.ArrayType)
            return T.ArrayType(rebuild(dt.elementType, r), dt.containsNull)
        if p in ("key", "value") and isinstance(dt, T.MapType):
            if p == "key":
                return T.MapType(rebuild(dt.keyType, r), dt.valueType, dt.valueContainsNull)
            return T.MapType(dt.keyType, rebuild(dt.valueType, r), dt.valueContainsNull)
        assert isinstance(dt, T.StructType), (p, dt)
        return T.StructType(
            [
                T.StructField(
                    f.name,
                    rebuild(f.dataType, r) if f.name == p else f.dataType,
                    f.nullable,
                    dict(f.metadata),
                )
                for f in dt.fields
            ]
        )

    return rebuild(schema, [head, *rest])  # type: ignore[return-value]


def _drop_path(schema: T.StructType, path: str) -> T.StructType:
    *parents, leaf = path.split(".")

    def edit(st: T.StructType) -> T.StructType:
        return T.StructType([f for f in st.fields if f.name != leaf])

    return _edit_struct_at(schema, parents, edit)


def _add_nested(
    schema: T.StructType, path: str, new_field: T.StructField
) -> T.StructType:
    *parents, _leaf = path.split(".")

    def edit(st: T.StructType) -> T.StructType:
        return T.StructType([*st.fields, new_field])

    return _edit_struct_at(schema, parents, edit)


def _update_path_type(
    schema: T.StructType, path: str, new_type: T.DataType
) -> T.StructType:
    *parents, leaf = path.split(".")

    def edit(st: T.StructType) -> T.StructType:
        return T.StructType(
            [
                T.StructField(f.name, new_type, f.nullable, dict(f.metadata))
                if f.name == leaf
                else f
                for f in st.fields
            ]
        )

    return _edit_struct_at(schema, parents, edit)


def _reorder(schema: T.StructType, target: T.StructType) -> T.StructType:
    """Order fields to match target order at every struct level (the
    reference reorders by target field_id, which equals target config
    order — iceberg_helper.py:338-363). Fields not present in the target
    (shouldn't exist post-drop) keep relative order at the end."""

    def order(st: T.StructType, tgt: T.StructType) -> T.StructType:
        pos = {f.name: i for i, f in enumerate(tgt.fields)}
        ordered = sorted(
            st.fields, key=lambda f: (pos.get(f.name, len(pos)),)
        )
        out = []
        tmap = {f.name: f for f in tgt.fields}
        for f in ordered:
            dt = f.dataType
            tf = tmap.get(f.name)
            if tf is not None:
                dt = _order_nested(dt, tf.dataType, order)
            out.append(T.StructField(f.name, dt, f.nullable, dict(f.metadata)))
        return T.StructType(out)

    return order(schema, target)


def _order_nested(dt: T.DataType, tdt: T.DataType, order) -> T.DataType:
    if isinstance(dt, T.StructType) and isinstance(tdt, T.StructType):
        return order(dt, tdt)
    if isinstance(dt, T.ArrayType) and isinstance(tdt, T.ArrayType):
        return T.ArrayType(
            _order_nested(dt.elementType, tdt.elementType, order), dt.containsNull
        )
    if isinstance(dt, T.MapType) and isinstance(tdt, T.MapType):
        return T.MapType(
            dt.keyType,
            _order_nested(dt.valueType, tdt.valueType, order),
            dt.valueContainsNull,
        )
    return dt
