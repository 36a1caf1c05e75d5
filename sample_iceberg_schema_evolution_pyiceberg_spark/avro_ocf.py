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


# ---------------------------------------------------------------------------
# Reader (r15, VERDICT r14 item 5): the decode inverse of the writer
# above, same public-spec subset plus the deflate codec and multi-block
# files (both of which independent writers produce even though write_ocf
# does not). Cross-checked in tests against files written by the
# bundled Apache Avro Java implementation.
# ---------------------------------------------------------------------------


class _Buf:
    """Byte cursor with the Avro binary primitives."""

    __slots__ = ("b", "i")

    def __init__(self, b: bytes) -> None:
        self.b = b
        self.i = 0

    def take(self, n: int) -> bytes:
        if self.i + n > len(self.b):
            raise ValueError(
                f"truncated avro data: need {n} bytes at offset {self.i}, "
                f"have {len(self.b) - self.i}"
            )
        out = self.b[self.i : self.i + n]
        self.i += n
        return out

    def at_end(self) -> bool:
        return self.i >= len(self.b)

    def varlong(self) -> int:
        shift = 0
        acc = 0
        while True:
            (byte,) = self.take(1)
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
            # a 64-bit zigzag long is at most 10 bytes: continuation
            # shifts run 0..63; shift 70 would be an 11th byte
            # (r15 review: the previous `> 70` accepted it)
            if shift > 63:
                raise ValueError("malformed avro varint (>10 bytes)")
        return (acc >> 1) ^ -(acc & 1)  # un-zigzag


def _decode(schema: Any, buf: _Buf) -> Any:
    if isinstance(schema, list):  # union
        idx = buf.varlong()
        if not 0 <= idx < len(schema):
            raise ValueError(f"union branch {idx} out of range")
        branch = schema[idx]
        return None if branch == "null" else _decode(branch, buf)
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            return {
                f["name"]: _decode(f["type"], buf)
                for f in schema["fields"]
            }
        if t == "array":
            out = []
            while True:
                n = buf.varlong()
                if n == 0:
                    return out
                if n < 0:  # negative count: byte size follows (spec)
                    n = -n
                    buf.varlong()
                for _ in range(n):
                    out.append(_decode(schema["items"], buf))
        if t == "map":
            out = {}
            while True:
                n = buf.varlong()
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    buf.varlong()
                for _ in range(n):
                    k = _decode("string", buf)
                    out[k] = _decode(schema["values"], buf)
        if t == "enum":
            symbols = schema["symbols"]
            idx = buf.varlong()
            if not 0 <= idx < len(symbols):
                raise ValueError(f"enum index {idx} out of range")
            return symbols[idx]
        if t == "fixed":
            return buf.take(int(schema["size"]))
        # annotated primitive, e.g. {"type": "int", "logicalType": ...}
        return _decode(t, buf)
    if schema in ("int", "long"):
        return buf.varlong()
    if schema == "boolean":
        return buf.take(1) != b"\x00"
    if schema == "string":
        return buf.take(buf.varlong()).decode("utf-8")
    if schema == "bytes":
        return buf.take(buf.varlong())
    if schema == "double":
        import struct  # noqa: PLC0415

        return struct.unpack("<d", buf.take(8))[0]
    if schema == "float":
        import struct  # noqa: PLC0415

        return struct.unpack("<f", buf.take(4))[0]
    if schema == "null":
        return None
    raise ValueError(f"unsupported avro type: {schema!r}")


def read_ocf(
    data: "bytes | str",
) -> "tuple[dict[str, Any], dict[str, str], list[dict[str, Any]]]":
    """Read one Avro Object Container File: ``(schema, metadata,
    records)``. Accepts a path or the raw bytes. Handles the null and
    deflate codecs and any number of data blocks; refuses unknown
    codecs, bad magic, and sync-marker mismatches loudly."""
    import zlib  # noqa: PLC0415

    if isinstance(data, bytes):
        raw = data
    else:
        with open(data, "rb") as f:
            raw = f.read()
    buf = _Buf(raw)
    if buf.take(4) != b"Obj\x01":
        raise ValueError("not an avro object container file (bad magic)")
    meta: dict[str, str] = {}
    while True:
        n = buf.varlong()
        if n == 0:
            break
        if n < 0:
            n = -n
            buf.varlong()
        for _ in range(n):
            k = buf.take(buf.varlong()).decode("utf-8")
            v = buf.take(buf.varlong())
            meta[k] = v.decode("utf-8", errors="replace")
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", "null")
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec {codec!r}")
    sync = buf.take(16)
    records: list[dict[str, Any]] = []
    while not buf.at_end():
        count = buf.varlong()
        size = buf.varlong()
        payload = buf.take(size)
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)  # raw deflate
        block = _Buf(payload)
        for _ in range(count):
            records.append(_decode(schema, block))
        if not block.at_end():
            raise ValueError(
                f"avro block declared {count} records but "
                f"{len(payload) - block.i} bytes remain"
            )
        if buf.take(16) != sync:
            raise ValueError("avro sync marker mismatch (corrupt block)")
    return schema, meta, records


def read_ocf_header(data: "bytes | str") -> dict[str, str]:
    """Parse only the OCF header metadata map (schema inference must
    not decode the data blocks). Probes 1 MiB and doubles the read on
    exhaustion up to 64 MiB — a giant schema/stats map parses instead
    of failing as a misleading "truncated avro data" (r15 advice);
    past the ceiling the error names the real problem."""
    if isinstance(data, bytes):
        return _parse_ocf_header(_Buf(data))
    cap = 1 << 20  # common case: header fits well within 1 MiB
    while True:
        with open(data, "rb") as f:
            raw = f.read(cap)
        short = len(raw) < cap  # whole file read — no bigger re-read
        try:
            return _parse_ocf_header(_Buf(raw))
        except ValueError as e:
            if short or "truncated avro data" not in str(e):
                raise
            if cap >= (1 << 26):
                raise ValueError(
                    f"avro OCF header exceeds the {cap >> 20} MiB "
                    f"probe limit in {data!r} — metadata map too "
                    "large to be a plausible header"
                ) from e
            cap <<= 1


def _parse_ocf_header(buf: "_Buf") -> dict[str, str]:
    if buf.take(4) != b"Obj\x01":
        raise ValueError("not an avro object container file (bad magic)")
    meta: dict[str, str] = {}
    while True:
        n = buf.varlong()
        if n == 0:
            return meta
        if n < 0:
            n = -n
            buf.varlong()
        for _ in range(n):
            k = buf.take(buf.varlong()).decode("utf-8")
            v = buf.take(buf.varlong())
            meta[k] = v.decode("utf-8", errors="replace")
