"""Variant binary encoding (r16): golden byte sequences hand-derived
from the PUBLIC Parquet VariantEncoding spec pin the decoder; the
fixture writer round-trips through them. Conformance row 43."""

from __future__ import annotations

from datetime import date, datetime, timezone
from decimal import Decimal

import pytest

from sample_iceberg_schema_evolution_pyiceberg_spark.variant import (
    VariantError,
    decode_metadata,
    decode_variant,
    encode_metadata,
    encode_variant,
    variant_to_json,
)

# metadata with an EMPTY dictionary: version 1, offset_size 1,
# dict_size 0, one offset (0)
META_EMPTY = bytes([0x01, 0x00, 0x00])
# dictionary ["a", "b"]: header, size 2, offsets 0/1/2, bytes "ab"
META_AB = bytes([0x01, 0x02, 0x00, 0x01, 0x02]) + b"ab"


def test_golden_primitives():
    cases = [
        (bytes([0 << 2]), "null"),
        (bytes([1 << 2]), "true"),
        (bytes([2 << 2]), "false"),
        (bytes([3 << 2, 0x9C]), "-100"),  # int8 -100
        (bytes([4 << 2]) + (1000).to_bytes(2, "little"), "1000"),
        (bytes([5 << 2]) + (70000).to_bytes(4, "little"), "70000"),
        (
            bytes([6 << 2]) + (1 << 40).to_bytes(8, "little"),
            str(1 << 40),
        ),
        (bytes([7 << 2]) + b"\x00\x00\x00\x00\x00\x00\xf8?", "1.5"),
        # decimal8 scale 2, unscaled 1234 -> 12.34
        (
            bytes([9 << 2, 2]) + (1234).to_bytes(8, "little"),
            "12.34",
        ),
        # date: 18399 days = 2020-05-17
        (
            bytes([11 << 2]) + (18399).to_bytes(4, "little"),
            '"2020-05-17"',
        ),
        # short string "hi"
        (bytes([2 << 2 | 1]) + b"hi", '"hi"'),
        # long string
        (
            bytes([16 << 2]) + (70).to_bytes(4, "little") + b"x" * 70,
            '"' + "x" * 70 + '"',
        ),
        # binary -> base64
        (
            bytes([15 << 2]) + (2).to_bytes(4, "little") + b"\x01\x02",
            '"AQI="',
        ),
    ]
    for raw, want in cases:
        assert variant_to_json(META_EMPTY, raw) == want, raw.hex()


def test_golden_timestamps_and_uuid():
    us = 1672628645123456  # 2023-01-02T03:04:05.123456 UTC
    tz = bytes([12 << 2]) + us.to_bytes(8, "little")
    ntz = bytes([13 << 2]) + us.to_bytes(8, "little")
    assert (
        variant_to_json(META_EMPTY, tz)
        == '"2023-01-02T03:04:05.123456+00:00"'
    )
    assert (
        variant_to_json(META_EMPTY, ntz)
        == '"2023-01-02T03:04:05.123456"'
    )
    u = bytes(range(16))
    uu = bytes([20 << 2]) + u
    assert (
        variant_to_json(META_EMPTY, uu)
        == '"00010203-0405-0607-0809-0a0b0c0d0e0f"'
    )
    # time µs since midnight: 01:02:03.000004
    t = bytes([17 << 2]) + (3723000004).to_bytes(8, "little")
    assert variant_to_json(META_EMPTY, t) == '"01:02:03.000004"'


def test_golden_object_and_array():
    # {"a": 1, "b": "z"}: object basic_type 2, small, 1-byte sizes
    inner_a = bytes([3 << 2]) + (1).to_bytes(1, "little", signed=True)
    inner_b = bytes([1 << 2 | 1]) + b"z"
    obj = (
        bytes([0 << 2 | 2, 2, 0, 1, 0, len(inner_a),
               len(inner_a) + len(inner_b)])
        + inner_a
        + inner_b
    )
    assert variant_to_json(META_AB, obj) == '{"a":1,"b":"z"}'
    # [1, null]: array basic_type 3
    arr = (
        bytes([0 << 2 | 3, 2, 0, len(inner_a), len(inner_a) + 1])
        + inner_a
        + bytes([0])
    )
    assert variant_to_json(META_EMPTY, arr) == "[1,null]"


def test_roundtrip_fixture_writer():
    obj = {
        "name": "alice",
        "age": 30,
        "pi": 3.5,
        "bal": Decimal("99.95"),
        "ok": True,
        "none": None,
        "joined": date(2021, 2, 3),
        "ts": datetime(2024, 6, 1, 12, 0, 0, tzinfo=timezone.utc),
        "ts_ntz": datetime(2024, 6, 1, 12, 0, 0),
        "blob": b"\xff\x00",
        "tags": ["x", "y", {"deep": [1, 2]}],
    }
    m, v = encode_variant(obj)
    back = decode_variant(m, v)
    assert back["name"] == "alice"
    assert back["age"] == 30
    assert back["bal"] == Decimal("99.95")
    assert back["tags"][2]["deep"] == [1, 2]
    js = variant_to_json(m, v)
    assert '"name":"alice"' in js
    assert '"bal":99.95' in js
    assert '"tags":["x","y",{"deep":[1,2]}]' in js
    # keys render in stored (sorted) field order -> deterministic
    assert js == variant_to_json(m, v)


def test_large_forms_and_wide_offsets():
    # >255 array elements forces the is_large form; a long dictionary
    # with >255 bytes of keys forces 2-byte metadata offsets
    arr = list(range(300))
    m, v = encode_variant(arr)
    assert decode_variant(m, v) == arr
    keys = [f"key_{i:03d}" for i in range(50)]
    obj = {k: i for i, k in enumerate(keys)}
    m2, v2 = encode_variant(obj)
    assert decode_metadata(m2) == sorted(keys)
    assert decode_variant(m2, v2) == obj


def test_refusals():
    with pytest.raises(VariantError, match="version"):
        decode_metadata(bytes([0x02, 0x00, 0x00]))
    with pytest.raises(VariantError, match="truncated"):
        decode_variant(META_EMPTY, bytes([16 << 2, 0xFF, 0xFF]))
    with pytest.raises(VariantError, match="unknown variant primitive"):
        decode_variant(META_EMPTY, bytes([30 << 2]))
    # field id outside the dictionary
    bad_obj = bytes([0 << 2 | 2, 1, 7, 0, 1, 0])
    with pytest.raises(VariantError, match="outside metadata"):
        decode_variant(META_AB, bad_obj)


def test_review_fixes_r16():
    """r16 review findings: truncated fixed-width primitives refuse
    (not silently decode to 0), NaN/Inf render as quoted strings,
    ns timestamps keep full precision incl. negative instants,
    positive-exponent Decimals rescale, oversized Decimals refuse
    with VariantError."""
    # truncated int32 payload
    with pytest.raises(VariantError, match="truncated"):
        decode_variant(META_EMPTY, bytes([5 << 2, 0x01, 0x02]))
    # truncated short string
    with pytest.raises(VariantError, match="truncated"):
        decode_variant(META_EMPTY, bytes([5 << 2 | 1]) + b"ab")
    # truncated uuid
    with pytest.raises(VariantError, match="truncated"):
        decode_variant(META_EMPTY, bytes([20 << 2]) + b"\x00" * 8)
    # NaN / Infinity doubles -> quoted tokens (valid JSON)
    import struct as _struct

    nan = bytes([7 << 2]) + _struct.pack("<d", float("nan"))
    inf = bytes([7 << 2]) + _struct.pack("<d", float("inf"))
    assert variant_to_json(META_EMPTY, nan) == '"NaN"'
    assert variant_to_json(META_EMPTY, inf) == '"Infinity"'
    # ns timestamps: full precision; -1 ns is one ns before epoch
    one_ns = bytes([19 << 2]) + (1).to_bytes(8, "little", signed=True)
    neg_ns = bytes([19 << 2]) + (-1).to_bytes(8, "little", signed=True)
    assert (
        variant_to_json(META_EMPTY, one_ns)
        == '"1970-01-01T00:00:00.000000001"'
    )
    assert (
        variant_to_json(META_EMPTY, neg_ns)
        == '"1969-12-31T23:59:59.999999999"'
    )
    # positive-exponent Decimal rescales to scale 0
    m, v = encode_variant({"x": Decimal("1E+2")})
    assert decode_variant(m, v)["x"] == Decimal(100)
    # huge unscaled goes to decimal16; >128-bit refuses typed
    m2, v2 = encode_variant({"x": Decimal(2**100)})
    assert decode_variant(m2, v2)["x"] == Decimal(2**100)
    with pytest.raises(VariantError, match="decimal16"):
        encode_variant({"x": Decimal(2**130)})
