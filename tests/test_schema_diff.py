"""Unit tests: schema diff -> SchemaChange records (no Spark session).
Mirrors reference diff semantics (iceberg_helper.py:254-295) on the
v1 -> v2 golden episode."""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import types as T

from sample_iceberg_schema_evolution_pyiceberg_spark.schema_compiler import compile_schema
from sample_iceberg_schema_evolution_pyiceberg_spark.schema_diff import (
    SchemaChange,
    diff_schemas,
)

ASSETS = Path(__file__).parent.parent / "sample_iceberg_schema_evolution_pyiceberg_spark" / "assets"


def _schemas():
    v1 = compile_schema(json.loads((ASSETS / "orders_v1.json").read_text()))
    v2 = compile_schema(json.loads((ASSETS / "orders_v2.json").read_text()))
    return v1, v2


def test_v1_to_v2_changes():
    v1, v2 = _schemas()
    changes = diff_schemas(v1, v2)
    adds = {c.column_path for c in changes if c.add}
    assert adds == {
        "order_id",
        "address.address_line",
        "address.zip",
        "order_items.element.item_count",
    }
    assert not any(c.drop for c in changes)
    assert not any(c.update for c in changes)
    by_path = {c.column_path: c for c in changes}
    assert by_path["order_id"].is_nested is False
    assert by_path["address.zip"].is_nested is True
    assert by_path["address.zip"].parent_path == "address"
    assert by_path["order_items.element.item_count"].nest_level == 1


def test_drop_detected_in_reverse():
    v1, v2 = _schemas()
    changes = diff_schemas(v2, v1)
    drops = {c.column_path for c in changes if c.drop}
    assert "order_id" in drops
    assert "address.zip" in drops


def test_type_update_and_promotion_rules():
    a = T.StructType([T.StructField("x", T.IntegerType())])
    b = T.StructType([T.StructField("x", T.LongType())])
    (ch,) = diff_schemas(a, b)
    assert ch.update
    ok, _ = ch.data_type_change_allowed()
    assert ok  # int -> long is a legal promotion

    (rev,) = diff_schemas(b, a)
    ok, errs = rev.data_type_change_allowed()
    assert not ok and errs  # long -> int is not


def test_primitive_nested_flip_rejected():
    a = T.StructType([T.StructField("x", T.StringType())])
    b = T.StructType(
        [T.StructField("x", T.StructType([T.StructField("y", T.StringType())]))]
    )
    changes = diff_schemas(a, b)
    flip = next(c for c in changes if c.column_path == "x")
    ok, errs = flip.data_type_change_allowed()
    assert not ok
    assert "primitive" in errs[0]


def test_decimal_widening():
    ch = SchemaChange(
        column_path="d",
        existing_type=T.DecimalType(10, 2),
        target_type=T.DecimalType(20, 2),
        update=True,
    )
    assert ch.data_type_change_allowed()[0]
    ch2 = SchemaChange(
        column_path="d",
        existing_type=T.DecimalType(10, 2),
        target_type=T.DecimalType(10, 4),
        update=True,
    )
    assert not ch2.data_type_change_allowed()[0]
