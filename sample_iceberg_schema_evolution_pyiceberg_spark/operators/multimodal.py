"""Tier C multimodal columns (SURVEY.md §2 C5): opaque binary payloads
with typed metadata, decode/feature-extract plumbing via Arrow-batched
mapInPandas.

The container has no image/audio libraries, so the *decode* step is a
clearly marked deterministic stub — the Spark-side plumbing (binary
schema, batch iteration, output schema, partition behavior) is real and
tested; swapping the stub for PIL/librosa is a one-function change.
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
    """STUB decoder: a real deployment replaces this with image/audio
    decoding (PIL.Image.open / librosa.load — not in this container).
    Deterministic fake features derived from the payload digest so
    tests are stable."""
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
