"""Minimal Avro Object Container File writer (pure Python, no deps).

Why hand-rolled: Iceberg manifests and manifest lists are Avro files
(public Apache Iceberg table spec, "Manifests" section), and this
container has no Avro library or network. The subset implemented is
exactly what Iceberg v1 manifests need: records (nested), nullable
unions ``["null", T]``, string, bytes, int, long, boolean, and the
file-level map for header metadata. Encoding follows the public Apache
Avro 1.x specification (binary encoding + object container files):

- int/long: zigzag varint
- string/bytes: varint byte-length prefix
- boolean: single byte
- union: varint branch index, then the value
- record: field values concatenated in schema order
- OCF: magic ``Obj\\x01``, metadata map (avro.schema + avro.codec),
  16-byte sync marker, then data blocks (count, byte-size, payload,
  sync).

Correctness is cross-checked against the *independent* Apache Avro Java
implementation bundled with Spark (avro-1.12.x.jar) in
tests/test_iceberg_export.py — the files written here are read back
through ``spark._jvm.org.apache.avro.file.DataFileReader``.
"""

from __future__ import annotations

import io
import json
import os
from typing import Any


def _zigzag(n: int) -> bytes:
    """Avro int/long: zigzag then base-128 varint, little-endian groups."""
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode(schema: Any, value: Any, buf: io.BytesIO) -> None:
    if isinstance(schema, list):  # union — branch index, then value
        if value is None:
            idx = schema.index("null")
            buf.write(_zigzag(idx))
            return
        idx = next(i for i, s in enumerate(schema) if s != "null")
        buf.write(_zigzag(idx))
        _encode(schema[idx], value, buf)
        return
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            for f in schema["fields"]:
                try:
                    _encode(f["type"], value.get(f["name"]), buf)
                except Exception as e:  # noqa: BLE001 — context for debugging
                    raise ValueError(
                        f"field {schema['name']}.{f['name']}: {e}"
                    ) from e
            return
        if t == "array":
            items = list(value or [])
            if items:
                buf.write(_zigzag(len(items)))
                for item in items:
                    _encode(schema["items"], item, buf)
            buf.write(_zigzag(0))
            return
        if t == "map":
            entries = dict(value or {})
            if entries:
                buf.write(_zigzag(len(entries)))
                for k, v in entries.items():
                    _encode("string", k, buf)
                    _encode(schema["values"], v, buf)
            buf.write(_zigzag(0))
            return
        # annotated primitive, e.g. {"type": "int", "field-id": ...}
        _encode(t, value, buf)
        return
    if schema in ("int", "long"):
        buf.write(_zigzag(int(value)))
    elif schema == "boolean":
        buf.write(b"\x01" if value else b"\x00")
    elif schema == "string":
        raw = value.encode("utf-8")
        buf.write(_zigzag(len(raw)))
        buf.write(raw)
    elif schema == "bytes":
        raw = bytes(value)
        buf.write(_zigzag(len(raw)))
        buf.write(raw)
    elif schema == "double":
        import struct  # noqa: PLC0415

        buf.write(struct.pack("<d", float(value)))
    elif schema == "float":
        import struct  # noqa: PLC0415

        buf.write(struct.pack("<f", float(value)))
    elif schema == "null":
        pass
    else:
        raise ValueError(f"unsupported avro type: {schema!r}")


def write_ocf(
    path: str,
    schema: dict[str, Any],
    records: list[dict[str, Any]],
    metadata: dict[str, str] | None = None,
) -> None:
    """Write one Avro OCF with a single data block, null codec."""
    sync = os.urandom(16)
    header = io.BytesIO()
    header.write(b"Obj\x01")
    meta = {
        "avro.schema": json.dumps(schema),
        "avro.codec": "null",
        **(metadata or {}),
    }
    header.write(_zigzag(len(meta)))
    for k, v in meta.items():
        _encode("string", k, header)
        _encode("bytes", v.encode("utf-8"), header)
    header.write(_zigzag(0))
    header.write(sync)

    block = io.BytesIO()
    for rec in records:
        _encode(schema, rec, block)
    payload = block.getvalue()

    with open(path, "wb") as f:
        f.write(header.getvalue())
        if records:
            f.write(_zigzag(len(records)))
            f.write(_zigzag(len(payload)))
            f.write(payload)
            f.write(sync)
