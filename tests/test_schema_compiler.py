"""Unit tests: config -> StructType compiler + type mapping (no Spark
session needed). Mirrors the reference's compile semantics
(SURVEY.md §1.2, A4-A5)."""

from __future__ import annotations

import json
from pathlib import Path

import pytest
from pyspark.sql import types as T

from sample_iceberg_schema_evolution_pyiceberg_spark.config import (
    map_config_type,
    validate_table_def,
)
from sample_iceberg_schema_evolution_pyiceberg_spark.schema_compiler import (
    compile_schema,
    field_id,
    max_field_id,
)

ASSETS = Path(__file__).parent.parent / "sample_iceberg_schema_evolution_pyiceberg_spark" / "assets"


def _load(name: str) -> dict:
    return json.loads((ASSETS / name).read_text())


@pytest.mark.parametrize(
    ("cfg", "expected"),
    [
        ("boolean", T.BooleanType()),
        ("bool", T.BooleanType()),
        ("int", T.IntegerType()),
        ("integer", T.IntegerType()),
        ("bigint", T.LongType()),
        ("long", T.LongType()),
        ("float", T.FloatType()),
        ("double", T.DoubleType()),
        ("date", T.DateType()),
        ("timestamp", T.TimestampNTZType()),
        ("timezone", T.TimestampType()),
        ("string", T.StringType()),
        ("STR", T.StringType()),
        ("uuid", T.StringType()),
        ("binary", T.BinaryType()),
        ("fixed", T.BinaryType()),
        ("decimal(12,2)", T.DecimalType(12, 2)),
        ("what-is-this", T.StringType()),  # unknown -> string fallback
    ],
)
def test_type_mapping(cfg, expected):
    assert map_config_type(cfg) == expected


def test_compile_orders_v1():
    schema = compile_schema(_load("orders_v1.json"))
    assert [f.name for f in schema.fields] == [
        "order_time", "customer_name", "address", "order_items",
    ]
    assert schema["order_time"].dataType == T.TimestampNTZType()
    addr = schema["address"].dataType
    assert isinstance(addr, T.StructType)
    assert [f.name for f in addr.fields] == ["city", "state"]
    items = schema["order_items"].dataType
    assert isinstance(items, T.ArrayType)
    # array's own required propagates to element nullability
    assert items.containsNull is False
    assert schema["order_items"].nullable is False
    elem = items.elementType
    assert [f.name for f in elem.fields] == ["item_id", "price"]
    assert elem["price"].dataType == T.FloatType()
    assert elem["price"].nullable is False
    # root field IDs are the first contiguous block in config order
    assert [field_id(f) for f in schema.fields] == [1, 2, 3, 4]
    assert max_field_id(schema) > 4  # nested got IDs after roots


def test_compile_roundtrips_through_json():
    schema = compile_schema(_load("orders_v2.json"))
    again = T.StructType.fromJson(json.loads(schema.json()))
    assert again == schema
    assert field_id(again["order_id"]) == 1


def test_validation_catches_missing_struct_def():
    bad = {
        "database_name": "db",
        "table_name": "t",
        "columns": [{"column_name": "s", "data_type": "struct"}],
    }
    ok, errs = validate_table_def(bad)
    assert not ok
    assert any("struct_def" in e for e in errs)


def test_validation_accepts_assets():
    for name in ("orders_v1.json", "orders_v2.json"):
        ok, errs = validate_table_def(_load(name))
        assert ok, errs


def test_map_def_compiles():
    td = {
        "database_name": "db",
        "table_name": "t",
        "columns": [
            {
                "column_name": "attrs",
                "data_type": "map",
                "map_def": {
                    "key": {"column_name": "k", "data_type": "string"},
                    "value": {"column_name": "v", "data_type": "int", "required": True},
                },
            }
        ],
    }
    schema = compile_schema(td)
    m = schema["attrs"].dataType
    assert m == T.MapType(T.StringType(), T.IntegerType(), valueContainsNull=False)
