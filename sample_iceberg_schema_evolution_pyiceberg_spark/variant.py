"""Parquet/Iceberg-v3 VARIANT binary encoding (r16): decode + a
writer for fixtures.

Pure-Python implementation of the PUBLIC Parquet variant encoding
spec (parquet-format VariantEncoding.md, the encoding Iceberg v3
adopts for its `variant` type). An unshredded variant value is a pair
of binaries:

- **metadata**: ``header | dictionary_size | offsets[dict_size + 1] |
  bytes`` — header packs ``version (low 4 bits, = 1)``,
  ``sorted_strings (bit 4)``, ``offset_size - 1 (bits 6-7)``;
  dictionary_size and every offset are little-endian unsigned ints of
  ``offset_size`` bytes. The dictionary holds the distinct object
  keys.
- **value**: first byte packs ``basic_type (low 2 bits)`` and
  ``value_header (high 6 bits)``:

  - basic_type 0 — primitive; value_header is the primitive type id
    (0 null, 1 true, 2 false, 3 int8, 4 int16, 5 int32, 6 int64,
    7 double, 8/9/10 decimal4/8/16 (1-byte scale + LE unscaled),
    11 date (int32 days), 12 timestamp µs UTC, 13 timestamp µs ntz,
    14 float, 15 binary (u32 len + bytes), 16 string (u32 len +
    UTF-8), 17 time µs ntz, 18/19 timestamp ns UTC/ntz, 20 uuid).
  - basic_type 1 — short string; value_header is the length (0-63).
  - basic_type 2 — object; value_header packs
    ``field_offset_size - 1 (bits 0-1)``, ``field_id_size - 1
    (bits 2-3)``, ``is_large (bit 4)``; then num_elements (u8, or u32
    when is_large), field_ids (num × field_id_size LE, sorted by key
    per spec), field_offsets ((num + 1) × field_offset_size LE into
    the trailing values bytes), values.
  - basic_type 3 — array; value_header packs
    ``field_offset_size - 1 (bits 0-1)``, ``is_large (bit 2)``; then
    num_elements, offsets (num + 1), values.

``variant_to_json`` renders the decoded value as a DETERMINISTIC JSON
string surface (the read-side shape a SQL user can get at with
Spark's JSON functions): object keys in stored field order, strings/
binary/temporal values quoted (binary as base64, date ISO, timestamps
ISO with ``+00:00`` for the UTC-adjusted flavors and no offset for
ntz, uuid canonical lowercase), numbers unquoted with decimals
emitted at their stored scale.

SHREDDED variants (a ``typed_value`` field alongside ``value``) are
a different physical layout this module does not decode — the reader
refuses them loudly (ICEBERG_CONFORMANCE.md row 43).

No code from any engine was copied; the byte layout is implemented
from the public spec text and golden byte sequences are pinned in
tests/test_variant.py.
"""

from __future__ import annotations

import base64
import json
import struct
from datetime import date, datetime, timedelta, timezone
from decimal import Decimal
from typing import Any

_EPOCH_DATE = date(1970, 1, 1)
_EPOCH_UTC = datetime(1970, 1, 1, tzinfo=timezone.utc)
_EPOCH_NTZ = datetime(1970, 1, 1)


class VariantError(ValueError):
    pass


def _take(b: bytes, off: int, n: int) -> bytes:
    """Bounds-checked slice — every fixed-width read goes through
    this so truncated buffers refuse loudly instead of decoding to
    silently wrong values (int.from_bytes over a short slice returns
    a small int; an empty slice returns 0)."""
    if off + n > len(b) or off < 0:
        raise VariantError(
            f"truncated variant: need {n} bytes at offset {off}, "
            f"have {len(b) - off}"
        )
    return b[off : off + n]


def _uint(b: bytes, off: int, n: int) -> int:
    return int.from_bytes(_take(b, off, n), "little")


def decode_metadata(meta: bytes) -> list[str]:
    """The metadata dictionary as a list of keys (index = field id)."""
    if not meta:
        raise VariantError("empty variant metadata")
    header = meta[0]
    version = header & 0x0F
    if version != 1:
        raise VariantError(
            f"unsupported variant metadata version {version} (only 1)"
        )
    offset_size = ((header >> 6) & 0x03) + 1
    pos = 1
    dict_size = _uint(meta, pos, offset_size)
    pos += offset_size
    offsets = [
        _uint(meta, pos + i * offset_size, offset_size)
        for i in range(dict_size + 1)
    ]
    pos += (dict_size + 1) * offset_size
    out: list[str] = []
    for i in range(dict_size):
        s, e = offsets[i], offsets[i + 1]
        if s > e or pos + e > len(meta):
            raise VariantError(
                f"variant metadata offset out of range ({s}, {e})"
            )
        out.append(meta[pos + s : pos + e].decode("utf-8"))
    return out


def _decode_value(val: bytes, off: int, keys: list[str]) -> Any:
    """Decode one value at ``off``; returns a Python object tree
    (dict/list/primitive). Decimals stay Decimal, temporals stay
    date/datetime/int-µs, binary stays bytes — the JSON renderer
    decides the text form."""
    if off >= len(val):
        raise VariantError(f"truncated variant value at offset {off}")
    b0 = val[off]
    basic = b0 & 0x03
    hdr = b0 >> 2
    if basic == 0:  # primitive
        p = off + 1
        if hdr == 0:
            return None
        if hdr == 1:
            return True
        if hdr == 2:
            return False
        if hdr == 3:
            return int.from_bytes(_take(val, p, 1), "little", signed=True)
        if hdr == 4:
            return int.from_bytes(_take(val, p, 2), "little", signed=True)
        if hdr == 5:
            return int.from_bytes(_take(val, p, 4), "little", signed=True)
        if hdr == 6:
            return int.from_bytes(_take(val, p, 8), "little", signed=True)
        if hdr == 7:
            return struct.unpack("<d", _take(val, p, 8))[0]
        if hdr in (8, 9, 10):
            scale = _take(val, p, 1)[0]
            n = {8: 4, 9: 8, 10: 16}[hdr]
            unscaled = int.from_bytes(
                _take(val, p + 1, n), "little", signed=True
            )
            # tuple construction is exact at any width — scaleb
            # ROUNDS at the context precision (28 digits default)
            return Decimal(
                (
                    1 if unscaled < 0 else 0,
                    tuple(int(c) for c in str(abs(unscaled))),
                    -scale,
                )
            )
        if hdr == 11:
            days = int.from_bytes(_take(val, p, 4), "little", signed=True)
            return _EPOCH_DATE + timedelta(days=days)
        if hdr in (12, 13):
            us = int.from_bytes(_take(val, p, 8), "little", signed=True)
            epoch = _EPOCH_UTC if hdr == 12 else _EPOCH_NTZ
            return epoch + timedelta(microseconds=us)
        if hdr == 14:
            return struct.unpack("<f", _take(val, p, 4))[0]
        if hdr == 15:
            n = _uint(val, p, 4)
            return bytes(_take(val, p + 4, n))
        if hdr == 16:
            n = _uint(val, p, 4)
            return _take(val, p + 4, n).decode("utf-8")
        if hdr == 17:  # time without time zone, µs since midnight
            us = int.from_bytes(_take(val, p, 8), "little", signed=True)
            return ("time", us)
        if hdr in (18, 19):  # nanosecond timestamps
            ns = int.from_bytes(_take(val, p, 8), "little", signed=True)
            return ("ts_ns" if hdr == 18 else "ts_ns_ntz", ns)
        if hdr == 20:  # uuid: 16 bytes, big-endian per spec
            u = _take(val, p, 16).hex()
            return ("uuid", f"{u[:8]}-{u[8:12]}-{u[12:16]}-{u[16:20]}-{u[20:]}")
        raise VariantError(f"unknown variant primitive type id {hdr}")
    if basic == 1:  # short string
        p = off + 1
        return _take(val, p, hdr).decode("utf-8")
    if basic == 2:  # object
        field_offset_size = (hdr & 0x03) + 1
        field_id_size = ((hdr >> 2) & 0x03) + 1
        is_large = bool((hdr >> 4) & 0x01)
        p = off + 1
        nsz = 4 if is_large else 1
        num = _uint(val, p, nsz)
        p += nsz
        ids = [
            _uint(val, p + i * field_id_size, field_id_size)
            for i in range(num)
        ]
        p += num * field_id_size
        offs = [
            _uint(val, p + i * field_offset_size, field_offset_size)
            for i in range(num + 1)
        ]
        p += (num + 1) * field_offset_size
        out: dict[str, Any] = {}
        for i in range(num):
            if ids[i] >= len(keys):
                raise VariantError(
                    f"variant field id {ids[i]} outside metadata "
                    f"dictionary of {len(keys)} keys"
                )
            out[keys[ids[i]]] = _decode_value(val, p + offs[i], keys)
        return out
    # basic == 3: array
    field_offset_size = (hdr & 0x03) + 1
    is_large = bool((hdr >> 2) & 0x01)
    p = off + 1
    nsz = 4 if is_large else 1
    num = _uint(val, p, nsz)
    p += nsz
    offs = [
        _uint(val, p + i * field_offset_size, field_offset_size)
        for i in range(num + 1)
    ]
    p += (num + 1) * field_offset_size
    return [_decode_value(val, p + offs[i], keys) for i in range(num)]


def decode_variant(metadata: bytes, value: bytes) -> Any:
    """(metadata, value) -> Python object tree."""
    return _decode_value(
        bytes(value), 0, decode_metadata(bytes(metadata))
    )


def _json_scalar(v: Any) -> str:
    if v is None:
        return "null"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, str):
        return json.dumps(v, ensure_ascii=False)
    if isinstance(v, bytes):
        return json.dumps(base64.b64encode(v).decode("ascii"))
    if isinstance(v, Decimal):
        return str(v)  # unquoted number at the stored scale
    if isinstance(v, float):
        if v != v or v in (float("inf"), float("-inf")):
            # bare NaN/Infinity tokens are not JSON — quote them so
            # the surface stays parseable by Spark's JSON functions
            return json.dumps(
                "NaN" if v != v else
                ("Infinity" if v > 0 else "-Infinity")
            )
        return json.dumps(v)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, datetime):
        return json.dumps(v.isoformat())
    if isinstance(v, date):
        return json.dumps(v.isoformat())
    if isinstance(v, tuple):  # tagged rare types
        tag, payload = v
        if tag == "time":
            us = payload
            h, rem = divmod(us, 3_600_000_000)
            m, rem = divmod(rem, 60_000_000)
            s, frac = divmod(rem, 1_000_000)
            return json.dumps(f"{h:02d}:{m:02d}:{s:02d}.{frac:06d}")
        if tag in ("ts_ns", "ts_ns_ntz"):
            # full nanosecond precision: floor-divmod keeps negative
            # instants exact (-1 ns -> ...:59.999999999), no silent
            # truncation to µs
            secs, frac = divmod(payload, 1_000_000_000)
            epoch = _EPOCH_UTC if tag == "ts_ns" else _EPOCH_NTZ
            base = epoch + timedelta(seconds=secs)
            text = base.strftime("%Y-%m-%dT%H:%M:%S") + f".{frac:09d}"
            if tag == "ts_ns":
                text += "+00:00"
            return json.dumps(text)
        if tag == "uuid":
            return json.dumps(payload)
    raise VariantError(f"unrenderable variant scalar {type(v)}")


def _to_json(v: Any) -> str:
    if isinstance(v, dict):
        return (
            "{"
            + ",".join(
                f"{json.dumps(k, ensure_ascii=False)}:{_to_json(x)}"
                for k, x in v.items()
            )
            + "}"
        )
    if isinstance(v, list):
        return "[" + ",".join(_to_json(x) for x in v) + "]"
    return _json_scalar(v)


def variant_to_json(metadata: bytes, value: bytes) -> str:
    """(metadata, value) -> deterministic JSON text (see module doc
    for the rendering rules)."""
    return _to_json(decode_variant(metadata, value))


# -- fixture writer ---------------------------------------------------------


def _pack_uint(n: int, size: int) -> bytes:
    return int(n).to_bytes(size, "little")


def _min_size(n: int) -> int:
    for size in (1, 2, 3, 4):
        if n < (1 << (8 * size)):
            return size
    raise VariantError(f"value {n} exceeds u32")


def encode_metadata(keys: list[str], sorted_strings: bool = False) -> bytes:
    """Variant metadata for a key dictionary (fixture writer)."""
    blobs = [k.encode("utf-8") for k in keys]
    offsets = [0]
    for b in blobs:
        offsets.append(offsets[-1] + len(b))
    offset_size = max(_min_size(max(offsets[-1], len(keys))), 1)
    header = 1 | (0x10 if sorted_strings else 0) | ((offset_size - 1) << 6)
    out = bytearray([header])
    out += _pack_uint(len(keys), offset_size)
    for o in offsets:
        out += _pack_uint(o, offset_size)
    for b in blobs:
        out += b
    return bytes(out)


def encode_value(obj: Any, keys: list[str]) -> bytes:
    """Encode a Python object tree as a variant value against the key
    dictionary ``keys`` (fixture writer; small-footprint choices:
    1-byte sizes where values fit). Strings <= 63 bytes use the short
    form; ints use the narrowest signed width; floats encode as
    double; Decimal as decimal8."""
    if obj is None:
        return bytes([0 << 2 | 0])
    if obj is True:
        return bytes([1 << 2 | 0])
    if obj is False:
        return bytes([2 << 2 | 0])
    if isinstance(obj, str):
        b = obj.encode("utf-8")
        if len(b) <= 63:
            return bytes([len(b) << 2 | 1]) + b
        return bytes([16 << 2 | 0]) + _pack_uint(len(b), 4) + b
    if isinstance(obj, bytes):
        return bytes([15 << 2 | 0]) + _pack_uint(len(obj), 4) + obj
    if isinstance(obj, bool):  # pragma: no cover — caught above
        raise AssertionError
    if isinstance(obj, int):
        for tid, n in ((3, 1), (4, 2), (5, 4), (6, 8)):
            if -(1 << (8 * n - 1)) <= obj < (1 << (8 * n - 1)):
                return bytes([tid << 2 | 0]) + obj.to_bytes(
                    n, "little", signed=True
                )
        raise VariantError(f"int {obj} exceeds int64")
    if isinstance(obj, float):
        return bytes([7 << 2 | 0]) + struct.pack("<d", obj)
    if isinstance(obj, Decimal):
        if not obj.is_finite():
            raise VariantError(f"non-finite Decimal {obj} unencodable")
        sign, digits, exponent = obj.as_tuple()
        scale = max(0, -exponent)  # 1E+2 rescales to scale 0
        # exact integer arithmetic from the tuple — Decimal.scaleb
        # ROUNDS at the context precision (28 digits by default), so
        # a 31-digit unscaled value would silently corrupt
        unscaled = int("".join(map(str, digits)) or "0") * 10 ** (
            exponent + scale
        )
        if sign:
            unscaled = -unscaled
        for tid, n in ((9, 8), (10, 16)):
            if -(1 << (8 * n - 1)) <= unscaled < (1 << (8 * n - 1)):
                return (
                    bytes([tid << 2 | 0, scale])
                    + unscaled.to_bytes(n, "little", signed=True)
                )
        raise VariantError(
            f"Decimal {obj} exceeds decimal16 (unscaled > 128 bits)"
        )
    if isinstance(obj, datetime):
        tid = 12 if obj.tzinfo is not None else 13
        epoch = _EPOCH_UTC if obj.tzinfo is not None else _EPOCH_NTZ
        us = round((obj - epoch).total_seconds() * 1_000_000)
        return bytes([tid << 2 | 0]) + int(us).to_bytes(
            8, "little", signed=True
        )
    if isinstance(obj, date):
        days = (obj - _EPOCH_DATE).days
        return bytes([11 << 2 | 0]) + days.to_bytes(
            4, "little", signed=True
        )
    if isinstance(obj, dict):
        # spec: object fields sorted by key name (binary-searchable)
        items = sorted(obj.items())
        vals = [encode_value(v, keys) for _k, v in items]
        offsets = [0]
        for v in vals:
            offsets.append(offsets[-1] + len(v))
        ids = []
        for k, _v in items:
            try:
                ids.append(keys.index(k))
            except ValueError:
                raise VariantError(
                    f"object key {k!r} missing from metadata dictionary"
                ) from None
        fo = _min_size(max(offsets[-1], 1))
        fi = _min_size(max(ids, default=0))
        num = len(items)
        is_large = num > 255
        hdr = (fo - 1) | ((fi - 1) << 2) | (int(is_large) << 4)
        out = bytearray([hdr << 2 | 2])
        out += _pack_uint(num, 4 if is_large else 1)
        for i in ids:
            out += _pack_uint(i, fi)
        for o in offsets:
            out += _pack_uint(o, fo)
        for v in vals:
            out += v
        return bytes(out)
    if isinstance(obj, (list, tuple)):
        vals = [encode_value(v, keys) for v in obj]
        offsets = [0]
        for v in vals:
            offsets.append(offsets[-1] + len(v))
        fo = _min_size(max(offsets[-1], 1))
        num = len(vals)
        is_large = num > 255
        hdr = (fo - 1) | (int(is_large) << 2)
        out = bytearray([hdr << 2 | 3])
        out += _pack_uint(num, 4 if is_large else 1)
        for o in offsets:
            out += _pack_uint(o, fo)
        for v in vals:
            out += v
        return bytes(out)
    raise VariantError(f"unencodable fixture value {type(obj)}")


def collect_keys(obj: Any, acc: "set[str] | None" = None) -> list[str]:
    """All object keys in an object tree, sorted (the dictionary a
    fixture writer needs; spec writers sort keys for binary search)."""
    top = acc is None
    if acc is None:
        acc = set()
    if isinstance(obj, dict):
        for k, v in obj.items():
            acc.add(k)
            collect_keys(v, acc)
    elif isinstance(obj, (list, tuple)):
        for v in obj:
            collect_keys(v, acc)
    return sorted(acc) if top else []


def encode_variant(obj: Any) -> "tuple[bytes, bytes]":
    """(metadata, value) for a Python object tree (fixture writer)."""
    keys = collect_keys(obj)
    return (
        encode_metadata(keys, sorted_strings=True),
        encode_value(obj, keys),
    )
