"""Puffin + deletion-vector codec (Iceberg v3): byte-level golden pins
from the PUBLIC specs (Puffin spec, TableSpec v3 deletion vectors,
RoaringFormatSpec), roundtrips across container kinds, and loud
refusals — the same posture/shape as the BMP codec tests."""

from __future__ import annotations

import struct
import zlib

import pytest

from sample_iceberg_schema_evolution_pyiceberg_spark.puffin import (
    DV_MAGIC,
    PUFFIN_MAGIC,
    dv_blob_deserialize,
    dv_blob_serialize,
    read_dv_for_file,
    read_puffin_footer,
    roaring64_deserialize,
    roaring64_serialize,
    write_puffin,
)


def test_roaring64_golden_bytes_tiny():
    """Spec-pinned layout for {3, 5}: one bucket (high key 0), no-run
    cookie 12346, one array container key 0 card 2, offsets section,
    sorted uint16 values."""
    raw = roaring64_serialize([5, 3])
    expect = (
        struct.pack("<Q", 1)          # 1 bucket
        + struct.pack("<I", 0)        # high 32 bits
        + struct.pack("<II", 12346, 1)  # cookie, 1 container
        + struct.pack("<HH", 0, 1)    # key 0, cardinality-1 = 1
        + struct.pack("<I", 16)       # offset: 4+4+4+4 = 16
        + struct.pack("<HH", 3, 5)    # sorted values
    )
    assert raw == expect
    assert roaring64_deserialize(raw) == [3, 5]


def test_roaring64_roundtrip_all_container_kinds():
    # array (small), bitmap (>4096 dense), cross-container,
    # cross-bucket (>2^32), duplicate collapse
    vals = (
        [1, 2, 3, 70000, 70001]                      # two containers
        + list(range(100000, 104200))                # bitmap container
        + [(7 << 32) + 9, (7 << 32) + 11]            # high bucket
    )
    got = roaring64_deserialize(roaring64_serialize(vals + [1, 1, 2]))
    assert got == sorted(set(vals))


def test_roaring32_run_cookie_read():
    """Hand-built run-aware serialization (cookie 12347): one run
    container [10..14] — the reader must decode the run form even
    though the writer never emits it."""
    body = (
        struct.pack("<Q", 1)
        + struct.pack("<I", 0)
        + struct.pack("<I", 12347 | (0 << 16))  # run cookie, size 1
        + b"\x01"                               # run flag bitset: c0 is run
        + struct.pack("<HH", 0, 4)              # key 0, card-1 = 4
        + struct.pack("<H", 1)                  # 1 run
        + struct.pack("<HH", 10, 4)             # start 10, length-1 = 4
    )
    assert roaring64_deserialize(body) == [10, 11, 12, 13, 14]


def test_dv_blob_layout_and_guards():
    blob = dv_blob_serialize([0, 2, 9])
    vec = roaring64_serialize([0, 2, 9])
    # BE combined length | magic | vector | BE crc32(magic+vector)
    assert blob[:4] == struct.pack(">I", 4 + len(vec))
    assert blob[4:8] == DV_MAGIC
    assert blob[8 : 8 + len(vec)] == vec
    assert blob[-4:] == struct.pack(
        ">I", zlib.crc32(DV_MAGIC + vec) & 0xFFFFFFFF
    )
    assert dv_blob_deserialize(blob) == [0, 2, 9]
    bad_crc = blob[:-4] + b"\x00\x00\x00\x00"
    with pytest.raises(ValueError, match="CRC mismatch"):
        dv_blob_deserialize(bad_crc)
    bad_magic = blob[:4] + b"XXXX" + blob[8:]
    with pytest.raises(ValueError, match="bad magic"):
        dv_blob_deserialize(bad_magic)


def test_puffin_container_roundtrip(tmp_path):
    p = tmp_path / "dv.puffin"
    blob = dv_blob_serialize([1, 3])
    write_puffin(
        p,
        [{
            "data": blob,
            "type": "deletion-vector-v1",
            "fields": [],
            "properties": {"referenced-data-file": "/d/x.parquet",
                           "cardinality": "2"},
        }],
    )
    raw = p.read_bytes()
    assert raw[:4] == PUFFIN_MAGIC and raw[-4:] == PUFFIN_MAGIC
    descs = read_puffin_footer(raw)
    assert len(descs) == 1
    d = descs[0]
    assert d["type"] == "deletion-vector-v1"
    assert d["offset"] == 4 and d["length"] == len(blob)
    assert read_dv_for_file(p, d["offset"], d["length"]) == [1, 3]
    # compressed footer refuses loudly
    flagged = bytearray(raw)
    struct.pack_into("<I", flagged, len(raw) - 8, 1)
    with pytest.raises(ValueError, match="compressed"):
        read_puffin_footer(bytes(flagged))
    with pytest.raises(ValueError, match="PFA1"):
        read_puffin_footer(b"not a puffin")
