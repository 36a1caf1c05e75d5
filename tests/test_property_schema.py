"""Property-based tests (hypothesis) for the schema compiler and
differ — the reference's core domain (SURVEY A4-A5, A9-A10). Pure
Python: no Spark session needed."""

from __future__ import annotations

import hypothesis.strategies as st
from hypothesis import given, settings
from pyspark.sql import types as T

from sample_iceberg_schema_evolution_pyiceberg_spark.schema_diff import (
    SchemaChange,
    diff_schemas,
    flatten,
)

_NAMES = ["a", "b", "c", "d", "e", "f"]
_PRIMS = [
    T.IntegerType(),
    T.LongType(),
    T.DoubleType(),
    T.StringType(),
    T.BooleanType(),
    T.DateType(),
]


@st.composite
def _struct(draw, depth: int = 2) -> T.StructType:
    n = draw(st.integers(1, 4))
    names = draw(
        st.lists(st.sampled_from(_NAMES), unique=True, min_size=n, max_size=n)
    )
    fields = []
    for name in names:
        kind = draw(st.integers(0, 3)) if depth > 0 else 0
        if kind == 0:
            dtype: T.DataType = draw(st.sampled_from(_PRIMS))
        elif kind == 1:
            dtype = draw(_struct(depth=depth - 1))
        elif kind == 2:
            dtype = T.ArrayType(draw(_struct(depth=depth - 1)))
        else:
            dtype = T.MapType(T.StringType(), draw(_struct(depth=depth - 1)))
        fields.append(T.StructField(name, dtype, draw(st.booleans())))
    return T.StructType(fields)


@settings(max_examples=150, deadline=None)
@given(_struct())
def test_diff_self_is_empty(schema):
    assert diff_schemas(schema, schema) == []


@settings(max_examples=150, deadline=None)
@given(_struct(), _struct())
def test_diff_partitions_paths(existing, target):
    """Adds are exactly want-not-live, drops exactly live-not-want,
    updates only on shared paths with differing types — and applying
    the path-set algebra reconstructs the target path set."""
    live, want = set(flatten(existing)), set(flatten(target))
    changes = diff_schemas(existing, target)
    adds = {c.column_path for c in changes if c.add}
    drops = {c.column_path for c in changes if c.drop}
    updates = {c.column_path for c in changes if c.update}
    assert adds == want - live
    assert drops == live - want
    assert updates <= (live & want)
    assert (live - drops) | adds == want
    # each change carries exactly one flag
    for c in changes:
        assert [c.add, c.drop, c.update].count(True) == 1


@settings(max_examples=150, deadline=None)
@given(_struct(), _struct())
def test_diff_antisymmetry(existing, target):
    fwd = diff_schemas(existing, target)
    rev = diff_schemas(target, existing)
    assert {c.column_path for c in fwd if c.add} == {
        c.column_path for c in rev if c.drop
    }
    assert {c.column_path for c in fwd if c.drop} == {
        c.column_path for c in rev if c.add
    }
    assert {c.column_path for c in fwd if c.update} == {
        c.column_path for c in rev if c.update
    }


def _upd(old: T.DataType, new: T.DataType) -> SchemaChange:
    return SchemaChange(
        column_path="x", existing_type=old, target_type=new, update=True
    )


def test_promotion_matrix():
    """Iceberg's compatibility matrix: int->long and float->double (and
    decimal widening at equal scale) are the only legal primitive
    promotions; the reverse directions are rejected."""
    ok = [
        (T.IntegerType(), T.LongType()),
        (T.FloatType(), T.DoubleType()),
        (T.DecimalType(10, 2), T.DecimalType(12, 2)),
    ]
    bad = [
        (T.LongType(), T.IntegerType()),
        (T.DoubleType(), T.FloatType()),
        (T.DecimalType(12, 2), T.DecimalType(10, 2)),
        (T.DecimalType(10, 2), T.DecimalType(12, 3)),
        (T.StringType(), T.IntegerType()),
        (T.IntegerType(), T.StructType([T.StructField("a", T.LongType())])),
    ]
    for old, new in ok:
        allowed, msgs = _upd(old, new).data_type_change_allowed()
        assert allowed, msgs
    for old, new in bad:
        allowed, _ = _upd(old, new).data_type_change_allowed()
        assert not allowed, f"{old} -> {new} should be rejected"


@settings(max_examples=100, deadline=None)
@given(_struct())
def test_flatten_paths_are_consistent(schema):
    """Every flattened path's parent prefix is itself a flattened path
    (after stripping the element/value addressing segments)."""
    flat = flatten(schema)
    for path, f in flat.items():
        if f.parent is not None:
            parent_path = f.parent
            for suffix in (".element", ".value"):
                if parent_path.endswith(suffix):
                    parent_path = parent_path[: -len(suffix)]
            assert parent_path in flat, (path, f.parent)
        assert f.nest_level == path.count(".") - path.count(".element.") - path.count(".value.")
