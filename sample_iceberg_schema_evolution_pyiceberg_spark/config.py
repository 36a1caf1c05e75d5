"""Config plane: table-definition loading, validation, type mapping.

Reference behavior being re-expressed (cites are for parity checking,
no code is copied):

- type-string -> type mapping: ``/root/reference/lambda/constants.py:8-150``
  (enum ``IcebergDataType`` + ``map_config_type_to_iceberg_type``). The
  reference prefix-matches ``array*``/``struct*``/``map*``, lowercases
  otherwise, and falls back unknown -> string.
- config load: ``/root/reference/lambda/lambda_helper.py:81-113``
  (S3 + local JSON).
- validation: ``/root/reference/lambda/lambda_helper.py:45-79`` defines a
  JSON-Schema validator that is dead code (never called). We make it
  live, accepting the union of the metamodel vocabulary and the type
  strings the shipped samples actually use.

Deliberate fixes vs the reference (SURVEY.md §1.2):
- ``decimal`` is parameterized ``decimal(p,s)`` (default 38,6) instead of
  the hardcoded ``DecimalType(5,5)`` (constants.py:27).
- ``fixed`` maps to binary (Spark has no fixed-length binary).
- validation actually runs.
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Any

from pyspark.sql import types as T

try:  # optional: only needed when validating against the metamodel
    import jsonschema
except ImportError:  # pragma: no cover
    jsonschema = None

# ---------------------------------------------------------------------------
# Type mapping (reference: lambda/constants.py:8-150)
# ---------------------------------------------------------------------------

_DECIMAL_RE = re.compile(r"^decimal\s*(?:\(\s*(\d+)\s*,\s*(\d+)\s*\))?$")

_PRIMITIVES: dict[str, T.DataType] = {
    "boolean": T.BooleanType(),
    "bool": T.BooleanType(),
    "integer": T.IntegerType(),
    "int": T.IntegerType(),
    "bigint": T.LongType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "number": T.DoubleType(),  # metamodel vocabulary (schema.json:22-34)
    "date": T.DateType(),
    # Spark has no TIME type; store as microseconds-since-midnight.
    "time": T.LongType(),
    # reference: "timestamp" -> no-tz, "timezone" -> tz-aware alias
    # (constants.py:65-78)
    "timestamp": T.TimestampNTZType(),
    "timezone": T.TimestampType(),
    "string": T.StringType(),
    "str": T.StringType(),
    # Spark has no UUID type; Iceberg-Spark reads UUID as string.
    "uuid": T.StringType(),
    "binary": T.BinaryType(),
    "fixed": T.BinaryType(),
}


def map_config_type(data_type: str) -> T.DataType:
    """config type string -> Spark type (reference: constants.py:136-150).

    Prefix rules for nested kinds, case-insensitive lookup otherwise,
    unknown -> string (the reference's documented fallback).  Nested
    kinds returned here are empty shells; `schema_compiler` fills them
    from ``struct_def``/``array_def``/``map_def``.
    """
    s = (data_type or "").strip().lower()
    if s.startswith(("array", "list")):
        return T.ArrayType(T.StringType())
    if s.startswith("struct"):
        return T.StructType([])
    if s.startswith("map"):
        return T.MapType(T.StringType(), T.StringType())
    m = _DECIMAL_RE.match(s)
    if m:
        p = int(m.group(1) or 38)
        sc = int(m.group(2) or 6)
        return T.DecimalType(p, sc)
    return _PRIMITIVES.get(s, T.StringType())


def is_nested_type_string(data_type: str) -> bool:
    s = (data_type or "").strip().lower()
    return s.startswith(("array", "list", "struct", "map"))


# ---------------------------------------------------------------------------
# Table-definition loading (reference: lambda_helper.py:81-113)
# ---------------------------------------------------------------------------


def load_table_def(path: str | Path) -> tuple[bool, dict[str, Any] | list[str]]:
    """Load a table-definition JSON from local disk or s3://.

    Returns ``(ok, table_def | error_messages)`` — the reference's
    non-raising error contract (lambda_helper.py:27-43: errors accumulate
    in a message list, never raise out).
    """
    p = str(path)
    if p.startswith("s3://"):
        return _s3_load_table_def(p)
    try:
        with open(p, encoding="utf-8") as f:
            return True, json.load(f)
    except (OSError, json.JSONDecodeError) as e:
        return False, [f"Failed to load table definition from {p}: {e}"]


def _s3_load_table_def(uri: str) -> tuple[bool, dict[str, Any] | list[str]]:
    """S3 config load (reference: lambda_helper.py:81-99). Gated behind
    an import-try; this environment has no AWS access."""
    try:
        import boto3  # noqa: PLC0415
    except ImportError:
        return False, [f"boto3 unavailable; cannot load {uri}"]
    from urllib.parse import urlparse  # noqa: PLC0415

    u = urlparse(uri)
    try:
        obj = boto3.client("s3").get_object(Bucket=u.netloc, Key=u.path.lstrip("/"))
        return True, json.loads(obj["Body"].read().decode("utf-8"))
    except Exception as e:  # noqa: BLE001 — reference accumulates, never raises
        return False, [f"Failed to load table definition from {uri}: {e}"]


# ---------------------------------------------------------------------------
# Validation (reference defines but never calls: lambda_helper.py:45-79)
# ---------------------------------------------------------------------------

# Metamodel equivalent to /root/reference/lambda/schema.json:1-162, with the
# data_type enum widened to the strings the live samples use (the reference's
# enum would reject its own orders_v1.json 'float': SURVEY.md §1.2).
TABLE_DEF_METAMODEL: dict[str, Any] = {
    "$schema": "https://json-schema.org/draft/2020-12/schema",
    "type": "object",
    "required": ["database_name", "table_name", "columns"],
    "properties": {
        "database_name": {"type": "string", "minLength": 1},
        "table_name": {"type": "string", "minLength": 1},
        "columns": {
            "type": "array",
            "minItems": 1,
            "items": {"$ref": "#/$defs/field_def"},
        },
        "partitions": {
            "type": "array",
            "items": {
                "type": "object",
                "required": ["column_name"],
                "properties": {
                    "column_name": {"type": "string"},
                    "transform": {
                        "anyOf": [
                            {
                                "enum": [
                                    "identity", "year", "month",
                                    "day", "hour",
                                ]
                            },
                            # Iceberg's parameterized transforms,
                            # serialized exactly as the spec writes them
                            {"pattern": r"^(bucket|truncate)\[[0-9]+\]$"},
                        ]
                    },
                    "name": {"type": "string"},
                },
            },
        },
        # explicit rename directives: the diff reads a missing+new
        # column pair as drop+add (the reference's destructive
        # reading); a rename entry preserves column identity instead
        "renames": {
            "type": "array",
            "items": {
                "type": "object",
                "required": ["from", "to"],
                "properties": {
                    "from": {"type": "string", "minLength": 1},
                    "to": {"type": "string", "minLength": 1},
                },
            },
        },
        "properties": {"type": "object"},
    },
    "$defs": {
        "field_def": {
            "type": "object",
            "required": ["column_name", "data_type"],
            "properties": {
                "column_name": {"type": "string", "minLength": 1},
                "data_type": {"type": "string", "minLength": 1},
                "required": {"type": "boolean"},
                "struct_def": {
                    "type": "array",
                    "items": {"$ref": "#/$defs/field_def"},
                },
                "array_def": {"$ref": "#/$defs/field_def"},
                "map_def": {
                    "type": "object",
                    "required": ["key", "value"],
                    "properties": {
                        "key": {"$ref": "#/$defs/field_def"},
                        "value": {"$ref": "#/$defs/field_def"},
                    },
                },
            },
        }
    },
}


def validate_table_def(table_def: dict[str, Any]) -> tuple[bool, list[str]]:
    """Live validation of a table definition against the metamodel."""
    if jsonschema is None:  # pragma: no cover
        return True, ["jsonschema unavailable; skipped validation"]
    validator = jsonschema.Draft202012Validator(TABLE_DEF_METAMODEL)
    errors = [
        f"{'/'.join(str(p) for p in e.absolute_path) or '<root>'}: {e.message}"
        for e in validator.iter_errors(table_def)
    ]
    # structural cross-checks the metamodel can't express
    for col in table_def.get("columns", []) if not errors else []:
        errors.extend(_check_nested_defs(col, col.get("column_name", "?")))
    return (not errors), errors


def _check_nested_defs(col: dict[str, Any], path: str) -> list[str]:
    errs: list[str] = []
    dt = str(col.get("data_type", ""))
    if dt.lower().startswith("struct") and not col.get("struct_def"):
        errs.append(f"{path}: struct type requires struct_def")
    if dt.lower().startswith(("array", "list")) and not col.get("array_def"):
        errs.append(f"{path}: array type requires array_def")
    if dt.lower().startswith("map") and not col.get("map_def"):
        errs.append(f"{path}: map type requires map_def")
    for child in col.get("struct_def", []) or []:
        errs.extend(_check_nested_defs(child, f"{path}.{child.get('column_name', '?')}"))
    if col.get("array_def"):
        errs.extend(_check_nested_defs(col["array_def"], f"{path}.element"))
    if col.get("map_def"):
        errs.extend(_check_nested_defs(col["map_def"].get("key", {}), f"{path}.key"))
        errs.extend(_check_nested_defs(col["map_def"].get("value", {}), f"{path}.value"))
    return errs
