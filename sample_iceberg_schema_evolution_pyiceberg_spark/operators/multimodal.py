"""Tier C multimodal columns (SURVEY.md §2 C5): opaque binary payloads
with typed metadata, decode/feature-extract plumbing via Arrow-batched
mapInPandas.

IMAGE decode is REAL as of r14 (encode_bmp/decode_bmp: stdlib
struct-level 24bpp BMP codecs, c12b hash-gated on actually-decoded
pixels) and AUDIO decode is REAL as of r15 (encode_wav/decode_wav:
stdlib ``wave`` RIFF/PCM codecs, c12c hash-gated on actually-decoded
samples). Only VIDEO decode remains a clearly marked deterministic
stub (sample_frames_stub — the stdlib has no video codec and pyav is
genuinely absent from the container); its Spark-side plumbing (binary
schema, batch iteration, fan-out shape, partition behavior) is real
and tested, so swapping the stub for a codec is a one-function change.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import query, t

FEATURE_DIM = 8


@query(
    "c11_multimodal_binary_meta",
    oracle="""
    SELECT doc_id,
           OCTET_LENGTH(ENCODE(text)) AS n_bytes,
           MD5(text) AS digest,
           CASE WHEN OCTET_LENGTH(ENCODE(text)) >= 256 THEN 'large'
                ELSE 'small' END AS size_class
    FROM documents
    """,
)
def c11_multimodal_binary_meta(spark: SparkSession, sf: str) -> DataFrame:
    """Binary-column metadata pass: payload synthesized by utf-8
    encoding the text (testdata has no real media), then byte length,
    digest, size class — all JVM-side, the pattern for petabyte media
    manifests (metadata scan never touches payload bytes at read time
    when stored columnar)."""
    d = t(spark, sf, "documents")
    payload = F.encode("text", "utf-8")
    return d.select(
        "doc_id",
        F.length(payload).cast("bigint").alias("n_bytes"),
        F.md5(payload).alias("digest"),
        F.when(F.length(payload) >= 256, "large")
        .otherwise("small")
        .alias("size_class"),
    )


def decode_media_stub(payload: bytes) -> list[float]:
    """STUB decoder kept for the generic c12 feature-plumbing query: a
    real deployment replaces this with its media decoder. Real stdlib
    codecs now exist for IMAGE (decode_bmp, c12b) and AUDIO
    (decode_wav, c12c); only video lacks one. Deterministic fake
    features derived from the payload digest so tests are stable."""
    h = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in h[:FEATURE_DIM]]


def decode_features_array(spark: SparkSession, sf: str) -> DataFrame:
    """Decode/feature-extract over binary payloads with mapInPandas:
    Arrow batches in, feature vectors out. The batch shape, output
    schema (vec_id/feature array/width), and partition-preserving
    execution are the real contract; the decoder itself is the stub
    above. This array-valued form is the user-facing API; the
    registered c12 query below explodes it so the result is
    canonicalizable (and DuckDB-oracle-expressible)."""
    d = t(spark, sf, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )

    def extract(batches):
        for pdf in batches:
            feats = pdf["payload"].apply(
                lambda p: decode_media_stub(bytes(p))
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "features": feats,
                    "feature_dim": feats.apply(len),
                }
            )

    return d.mapInPandas(
        extract, "doc_id bigint, features array<double>, feature_dim int"
    )


@query(
    "c12_multimodal_decode_features",
    # The stub features are sha256(payload) bytes / 255.0 and the text
    # payloads are pure ASCII, so DuckDB's VARCHAR sha256 hashes the
    # same bytes; hex pairs -> byte values via strpos arithmetic.
    oracle=f"""
    SELECT d.doc_id,
           CAST(i.g AS INT) AS feature_idx,
           ((strpos('0123456789abcdef',
                    substr(sha256(d.text), CAST(2 * i.g + 1 AS INT), 1)) - 1) * 16
            + (strpos('0123456789abcdef',
                      substr(sha256(d.text), CAST(2 * i.g + 2 AS INT), 1)) - 1)
           ) / 255.0 AS feature_value
    FROM documents d CROSS JOIN range({FEATURE_DIM}) i(g)
    """,
)
def c12_multimodal_decode_features(spark: SparkSession, sf: str) -> DataFrame:
    """Canonical (doc_id, feature_idx, feature_value) view of the
    mapInPandas decode above — one row per feature slot. The values are
    IEEE-exact on both engines (integer byte / 255.0), so the query is
    hash-gateable."""
    return decode_features_array(spark, sf).select(
        "doc_id",
        F.posexplode("features").alias("feature_idx", "feature_value"),
    )


FRAME_INTERVAL = 64  # stub "frame" stride in payload bytes


def sample_frames_stub(payload: bytes) -> list[tuple[int, str]]:
    """STUB frame sampler: a real deployment decodes video and samples
    frames (e.g. pyav keyframe iteration — not in this container).
    Deterministic fake: one "frame" per FRAME_INTERVAL bytes,
    fingerprinted by the md5 of its byte window, so the fan-out shape
    (1 row in -> N frame rows out) and schema are real and testable."""
    return [
        (i // FRAME_INTERVAL, hashlib.md5(payload[i : i + FRAME_INTERVAL]).hexdigest())
        for i in range(0, len(payload), FRAME_INTERVAL)
    ]


@query(
    "c14_multimodal_frame_sample",
    # Frames are md5 over fixed 64-byte windows of the utf-8 payload;
    # payloads are pure ASCII so DuckDB's VARCHAR substr/md5 hash the
    # same bytes. unnest(range(n)) reproduces the per-doc fan-out.
    oracle=f"""
    WITH f AS (
        SELECT doc_id, text,
               unnest(range(CAST(ceil(length(text) / {FRAME_INTERVAL}.0)
                                 AS BIGINT))) AS g
        FROM documents
    )
    SELECT doc_id,
           CAST(g AS INT) AS frame_idx,
           md5(substr(text, CAST(g * {FRAME_INTERVAL} + 1 AS INT),
               {FRAME_INTERVAL})) AS frame_fingerprint,
           CAST(g * {FRAME_INTERVAL} AS BIGINT) AS byte_offset
    FROM f
    """,
)
def c14_multimodal_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Frame sampling over binary media via mapInPandas: each payload
    expands to one row per sampled frame (frame index + fingerprint +
    byte offsets). The expansion happens inside the Arrow batch
    iterator — no explode of a driver-built array, no row-at-a-time
    UDF — so a 1 PB video corpus fans out partition-locally with
    bounded memory per batch."""
    d = t(spark, sf, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )

    def sample(batches):
        for pdf in batches:
            out_doc, out_idx, out_fp, out_off = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for idx, fp in sample_frames_stub(bytes(payload)):
                    out_doc.append(doc_id)
                    out_idx.append(idx)
                    out_fp.append(fp)
                    out_off.append(idx * FRAME_INTERVAL)
            yield pd.DataFrame(
                {
                    "doc_id": out_doc,
                    "frame_idx": out_idx,
                    "frame_fingerprint": out_fp,
                    "byte_offset": out_off,
                }
            )

    return d.mapInPandas(
        sample,
        "doc_id bigint, frame_idx int, frame_fingerprint string, "
        "byte_offset bigint",
    )


# ---------------------------------------------------------------------------
# c12b: REAL image decode (r14, VERDICT r13 item 4). The container has
# no media libraries, but BMP needs none — the writer/parser below are
# stdlib struct-level implementations of the 24bpp BI_RGB format
# (14-byte file header, 40-byte BITMAPINFOHEADER, BGR rows padded to 4
# bytes, bottom-up unless height < 0). With this, the decode stage of
# the multimodal pipeline is real decoded pixels; audio decode became
# real in r15 (stdlib `wave` RIFF/PCM, c12c), so only VIDEO decode
# remains stubbed (sample_frames_stub above — pyav is genuinely
# absent from the container).
# ---------------------------------------------------------------------------

IMG_W, IMG_H = 6, 4  # fixture dims: 18-byte rows force 2 pad bytes


def encode_bmp(width: int, height: int, pixels: "list[list[tuple[int, int, int]]]") -> bytes:
    """Real 24-bit BMP writer. ``pixels[y][x] = (r, g, b)`` with y=0 the
    TOP row; rows are emitted bottom-up per the format."""
    import struct  # noqa: PLC0415

    row_len = width * 3
    pad = (-row_len) % 4
    img_size = (row_len + pad) * height
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size,
        2835, 2835, 0, 0,
    )
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up
        row = bytearray()
        for x in range(width):
            r, g, b = pixels[y][x]
            row += bytes((b, g, r))  # BGR on disk
        row += b"\x00" * pad
        rows.append(bytes(row))
    return header + info + b"".join(rows)


def decode_bmp(payload: bytes) -> "tuple[int, int, list[list[tuple[int, int, int]]]]":
    """Real 24-bit BMP parser: returns ``(width, height, pixels)`` with
    ``pixels[y][x] = (r, g, b)``, y=0 the top row. Handles row padding
    and both bottom-up (height > 0) and top-down (height < 0) layouts;
    refuses non-BMP magic, compressed, or non-24bpp payloads loudly."""
    import struct  # noqa: PLC0415

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing BM magic)")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    width, raw_h = struct.unpack_from("<ii", payload, 18)
    (planes, bpp) = struct.unpack_from("<HH", payload, 26)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0 or planes != 1:
        raise ValueError(
            f"unsupported BMP: bpp={bpp} compression={compression} "
            f"planes={planes} (only 24bpp BI_RGB)"
        )
    # corrupt-header guard (r14 review): a non-positive width or zero
    # height would silently yield an empty/garbage grid; refuse loudly
    # like every other malformed-payload path, and bound the pixel
    # data against the actual payload size before indexing.
    if width <= 0 or raw_h == 0:
        raise ValueError(
            f"malformed BMP header: width={width} height={raw_h}"
        )
    height = abs(raw_h)
    stride_check = width * 3 + ((-(width * 3)) % 4)
    if data_off + height * stride_check > len(payload):
        raise ValueError(
            f"malformed BMP: declared {width}x{height} pixels exceed "
            f"the {len(payload)}-byte payload"
        )
    top_down = raw_h < 0
    row_len = width * 3
    stride = row_len + ((-row_len) % 4)
    pixels: list[list[tuple[int, int, int]]] = []
    for i in range(height):
        y_src = i if top_down else height - 1 - i
        off = data_off + y_src * stride
        row = []
        for x in range(width):
            b, g, r = payload[off + 3 * x : off + 3 * x + 3]
            row.append((r, g, b))
        pixels.append(row)
    return width, height, pixels


def _fixture_pixel(doc_id: int, x: int, y: int) -> "tuple[int, int, int]":
    """Deterministic synthetic pixel — x and y enter each channel with
    different weights, so a parser that misreads padding, row order, or
    channel order produces different stats (the gate would catch it)."""
    return (
        (doc_id + 3 * x + 7 * y) % 256,
        (2 * doc_id + 5 * x + 11 * y) % 256,
        (3 * doc_id + x + 13 * y) % 256,
    )


def encode_image_fixture(spark: SparkSession, sf: str) -> DataFrame:
    """(doc_id, payload): one real BMP per document, pixels from
    ``_fixture_pixel``. Encoding runs inside mapInPandas — the payload
    column is born distributed, exactly like ingesting real media."""
    d = t(spark, sf, "documents").select("doc_id")

    def enc(batches):
        for pdf in batches:
            payloads = [
                encode_bmp(
                    IMG_W,
                    IMG_H,
                    [
                        [_fixture_pixel(int(doc), x, y) for x in range(IMG_W)]
                        for y in range(IMG_H)
                    ],
                )
                for doc in pdf["doc_id"]
            ]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    return d.mapInPandas(enc, "doc_id bigint, payload binary")


@query(
    "c12b_multimodal_real_decode",
    # The oracle computes the SAME stats directly from the pixel
    # formula — the Spark side must round-trip them through real BMP
    # bytes (writer -> parser), so any padding/row-order/channel-order
    # misread in the decoder breaks the hash.
    oracle=f"""
    WITH px AS (
      SELECT d.doc_id,
             (d.doc_id + 3 * x.g + 7 * y.g) % 256 AS r,
             (2 * d.doc_id + 5 * x.g + 11 * y.g) % 256 AS g,
             (3 * d.doc_id + x.g + 13 * y.g) % 256 AS b
      FROM documents d
      CROSS JOIN range({IMG_W}) x(g) CROSS JOIN range({IMG_H}) y(g)
    )
    SELECT doc_id,
           {IMG_W} AS width, {IMG_H} AS height,
           CAST(SUM(r) AS BIGINT) AS sum_r,
           CAST(SUM(g) AS BIGINT) AS sum_g,
           CAST(SUM(b) AS BIGINT) AS sum_b,
           CAST(MIN(r) AS BIGINT) AS min_r, CAST(MAX(r) AS BIGINT) AS max_r,
           CAST(MIN(b) AS BIGINT) AS min_b, CAST(MAX(b) AS BIGINT) AS max_b,
           ROUND(CAST(SUM(r) AS DOUBLE) / ({IMG_W} * {IMG_H}), 6) AS mean_r
    FROM px GROUP BY doc_id
    """,
)
def c12b_multimodal_real_decode(spark: SparkSession, sf: str) -> DataFrame:
    """REAL decode features: encode each doc's fixture image as actual
    BMP bytes, then parse those bytes back with the stdlib decoder and
    aggregate per-channel sums/extrema/mean of the DECODED pixels.
    Both stages are Arrow-batched mapInPandas over the binary column —
    the same plumbing a PIL-backed deployment would use, with the
    decode itself no longer a stub."""
    imgs = encode_image_fixture(spark, sf)

    def dec(batches):
        for pdf in batches:
            out = {
                k: []
                for k in (
                    "doc_id", "width", "height", "sum_r", "sum_g",
                    "sum_b", "min_r", "max_r", "min_b", "max_b", "mean_r",
                )
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, px = decode_bmp(bytes(payload))
                rs = [p[0] for row in px for p in row]
                gs = [p[1] for row in px for p in row]
                bs = [p[2] for row in px for p in row]
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["sum_r"].append(sum(rs))
                out["sum_g"].append(sum(gs))
                out["sum_b"].append(sum(bs))
                out["min_r"].append(min(rs))
                out["max_r"].append(max(rs))
                out["min_b"].append(min(bs))
                out["max_b"].append(max(bs))
                out["mean_r"].append(round(sum(rs) / (w * h), 6))
            yield pd.DataFrame(out)

    return imgs.mapInPandas(
        dec,
        "doc_id bigint, width int, height int, sum_r bigint, sum_g bigint, "
        "sum_b bigint, min_r bigint, max_r bigint, min_b bigint, "
        "max_b bigint, mean_r double",
    )


# ---------------------------------------------------------------------------
# c12c: REAL audio decode (r15, VERDICT r14 item 2). Python's stdlib
# `wave` module reads/writes RIFF/PCM WAV with no external deps, so —
# like the BMP move in r14 — "no media libs in the container" no
# longer excuses an audio stub. The fixture encodes one real 16-bit
# PCM WAV per document inside mapInPandas; the decode stage parses
# those bytes back with `wave` and aggregates sample statistics of the
# ACTUALLY-DECODED frames, hash-gated against a formula oracle. Only
# VIDEO decode remains stubbed (sample_frames_stub above — the stdlib
# has no video codec).
# ---------------------------------------------------------------------------

N_FRAMES = 64   # fixture frames per clip
SAMPLE_RATE = 8000


def _fixture_sample(doc_id: int, i: int) -> int:
    """Deterministic synthetic int16 sample. doc_id and the frame index
    enter with different weights (including a quadratic term), so a
    decoder that misreads endianness, sample width, or frame order
    produces different stats and the gate catches it."""
    return ((doc_id * 7919 + i * i * 31 + i * 1009) % 65536) - 32768


def encode_wav(sample_rate: int, samples: "list[int]", channels: int = 1) -> bytes:
    """Real RIFF/PCM WAV writer (stdlib ``wave``): 16-bit little-endian
    PCM, ``samples`` interleaved when ``channels > 1``."""
    import io  # noqa: PLC0415
    import struct  # noqa: PLC0415
    import wave  # noqa: PLC0415

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def decode_wav(payload: bytes) -> "tuple[int, int, list[int]]":
    """Real RIFF/PCM WAV parser (stdlib ``wave``): returns
    ``(sample_rate, channels, samples)`` with samples interleaved
    across channels. Refuses non-WAV payloads and non-16-bit or
    compressed encodings loudly (same posture as ``decode_bmp``)."""
    import io  # noqa: PLC0415
    import struct  # noqa: PLC0415
    import wave  # noqa: PLC0415

    try:
        w = wave.open(io.BytesIO(payload), "rb")
    except (wave.Error, EOFError) as e:
        raise ValueError(f"not a RIFF/PCM WAV payload: {e}") from e
    with w:
        if w.getcomptype() != "NONE":
            raise ValueError(
                f"unsupported WAV compression {w.getcomptype()!r} "
                "(only PCM)"
            )
        if w.getsampwidth() != 2:
            raise ValueError(
                f"unsupported WAV sample width {w.getsampwidth()} "
                "bytes (only 16-bit PCM)"
            )
        n = w.getnframes()
        raw = w.readframes(n)
        channels = w.getnchannels()
        expected = n * channels * 2
        if len(raw) != expected:
            raise ValueError(
                f"truncated WAV: header declares {n} frames x "
                f"{channels} ch ({expected} bytes), payload carries "
                f"{len(raw)}"
            )
        samples = list(struct.unpack(f"<{n * channels}h", raw))
        return w.getframerate(), channels, samples


def encode_audio_fixture(spark: SparkSession, sf: str) -> DataFrame:
    """(doc_id, payload): one real mono 16-bit PCM WAV per document,
    samples from ``_fixture_sample``. Encoding runs inside mapInPandas
    — the payload column is born distributed, like ingesting real
    recordings."""
    d = t(spark, sf, "documents").select("doc_id")

    def enc(batches):
        for pdf in batches:
            payloads = [
                encode_wav(
                    SAMPLE_RATE,
                    [_fixture_sample(int(doc), i) for i in range(N_FRAMES)],
                )
                for doc in pdf["doc_id"]
            ]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    return d.mapInPandas(enc, "doc_id bigint, payload binary")


@query(
    "c12c_multimodal_audio_decode",
    # The oracle computes the SAME stats directly from the sample
    # formula — the Spark side must round-trip them through real WAV
    # bytes (wave writer -> wave parser), so an endianness / sample
    # width / frame-count misread breaks the hash.
    oracle=f"""
    WITH s AS (
      SELECT d.doc_id,
             ((d.doc_id * 7919 + i.g * i.g * 31 + i.g * 1009) % 65536)
               - 32768 AS v
      FROM documents d CROSS JOIN range({N_FRAMES}) i(g)
    )
    SELECT doc_id,
           {N_FRAMES} AS n_frames, {SAMPLE_RATE} AS sample_rate,
           1 AS channels,
           CAST(SUM(v) AS BIGINT) AS sum_s,
           CAST(MIN(v) AS BIGINT) AS min_s,
           CAST(MAX(v) AS BIGINT) AS max_s,
           CAST(SUM(v * v) AS BIGINT) AS sum_sq,
           ROUND(CAST(SUM(v) AS DOUBLE) / {N_FRAMES}, 6) AS mean_s
    FROM s GROUP BY doc_id
    """,
)
def c12c_multimodal_audio_decode(spark: SparkSession, sf: str) -> DataFrame:
    """REAL audio decode features: encode each doc's fixture clip as
    actual RIFF/PCM WAV bytes, then parse those bytes back with the
    stdlib ``wave`` decoder and aggregate sample sum/extrema/energy of
    the DECODED frames. Both stages are Arrow-batched mapInPandas over
    the binary column — the same plumbing a librosa-backed deployment
    would use, with the decode itself no longer a stub. sum_sq is the
    integer energy (the RMS numerator), kept integral so the gate is
    IEEE-exact on both engines."""
    clips = encode_audio_fixture(spark, sf)

    def dec(batches):
        for pdf in batches:
            out = {
                k: []
                for k in (
                    "doc_id", "n_frames", "sample_rate", "channels",
                    "sum_s", "min_s", "max_s", "sum_sq", "mean_s",
                )
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, channels, samples = decode_wav(bytes(payload))
                out["doc_id"].append(doc_id)
                out["n_frames"].append(len(samples) // channels)
                out["sample_rate"].append(rate)
                out["channels"].append(channels)
                out["sum_s"].append(sum(samples))
                out["min_s"].append(min(samples))
                out["max_s"].append(max(samples))
                out["sum_sq"].append(sum(v * v for v in samples))
                out["mean_s"].append(
                    round(sum(samples) / (len(samples) or 1), 6)
                )
            yield pd.DataFrame(out)

    return clips.mapInPandas(
        dec,
        "doc_id bigint, n_frames int, sample_rate int, channels int, "
        "sum_s bigint, min_s bigint, max_s bigint, sum_sq bigint, "
        "mean_s double",
    )
