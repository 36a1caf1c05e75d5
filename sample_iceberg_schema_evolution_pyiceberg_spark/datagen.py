"""Deterministic synthetic row generation for the ``orders`` evolution
fixture + append write path.

Reference parity (no code copied):
- row shape: ``/root/reference/lambda/data_generator.py:10-65`` —
  ``order_time`` random timestamp in 2020-2025, ``customer_name``,
  ``address`` struct, ``order_items`` array<struct>; v2 adds
  ``order_id``, address ``address_line``/``zip``, item ``item_count``.
- append: ``data_generator.py:67-79`` — build rows, convert with the
  table's schema, one append snapshot.

Difference by design: the reference is seedless-random; we take an
explicit seed so golden tests are reproducible (SURVEY.md §5).
"""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import SparkSession

from .table_format import LakeTable

_CITIES = ["Seattle", "Austin", "Boston", "Denver", "Chicago"]
_STATES = ["WA", "TX", "MA", "CO", "IL"]
_NAMES = ["alice", "bob", "carol", "dave", "erin", "frank"]


def random_orders(
    version: str, n_min: int = 1, n_max: int = 20, seed: int = 42
) -> list[dict]:
    """1-20 random orders, 1-50 items each (reference bounds:
    data_generator.py:71,:56)."""
    rng = random.Random(seed)
    rows = []
    for i in range(rng.randint(n_min, n_max)):
        ts = dt.datetime(2020, 1, 1) + dt.timedelta(
            seconds=rng.randint(0, 5 * 365 * 24 * 3600)
        )
        addr = {
            "city": rng.choice(_CITIES),
            "state": rng.choice(_STATES),
        }
        items = [
            {
                "item_id": f"item-{rng.randint(1, 999):03d}",
                "price": round(rng.uniform(1.0, 500.0), 2),
            }
            for _ in range(rng.randint(1, 50))
        ]
        row = {
            "order_time": ts,
            "customer_name": rng.choice(_NAMES),
            "address": addr,
            "order_items": items,
        }
        if version == "v2":
            row["order_id"] = f"ord-{seed}-{i:04d}"
            addr["address_line"] = f"{rng.randint(1, 9999)} Main St"
            addr["zip"] = f"{rng.randint(10000, 99999)}"
            for it in items:
                it["item_count"] = rng.randint(1, 9)
        rows.append(row)
    return rows


def insert_orders(
    spark: SparkSession, table: LakeTable, version: str, seed: int = 42
) -> int:
    """Generate rows and append one snapshot (reference:
    data_generator.py:67-79). Returns the row count appended."""
    rows = random_orders(version, seed=seed)
    schema = table.schema
    df = spark.createDataFrame(
        [_conform(r, schema) for r in rows], schema=schema
    )
    table.append(df)
    return len(rows)


def _conform(row: dict, schema) -> tuple:
    """Order dict values to the table schema (nested structs included);
    missing keys -> None."""
    from pyspark.sql import types as T  # noqa: PLC0415

    def conv(value, dtype):
        if value is None:
            return None
        if isinstance(dtype, T.StructType):
            return tuple(
                conv(value.get(f.name), f.dataType) for f in dtype.fields
            )
        if isinstance(dtype, T.ArrayType):
            return [conv(v, dtype.elementType) for v in value]
        if isinstance(dtype, T.MapType):
            return {
                conv(k, dtype.keyType): conv(v, dtype.valueType)
                for k, v in value.items()
            }
        return value

    return tuple(conv(row.get(f.name), f.dataType) for f in schema.fields)
