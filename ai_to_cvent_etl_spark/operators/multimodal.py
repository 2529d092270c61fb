"""Multimodal column support: opaque binary payloads + typed metadata.

The engine treats images/audio/video as `binary` columns accompanied by a
typed metadata struct, processed with Arrow-batched `mapInPandas` — the
decode step itself is pluggable. In this environment no media libraries are
installed, so the real decoders are import-gated stubs raising
``NotImplementedError``; the Spark-side plumbing (schemas, batch iteration,
partitioning, UDF signatures) is real and tested with a deterministic fake
(byte-bucket histogram "features").

100 TB design notes:
  * Payloads stay opaque bytes end-to-end: no shuffle ever moves decoded
    frames, only compact feature vectors. Feature extraction is a map-only
    stage — scale by adding executors; `spark.sql.files.maxPartitionBytes`
    bounds per-task memory since payloads ride in the scanned row group.
  * `mapInPandas` streams Arrow record batches; peak executor memory is one
    batch of payloads + one batch of features, independent of partition size.
  * Metadata (media_type, n_bytes, dims) is columnar and filterable WITHOUT
    touching payload bytes — predicate pushdown on metadata prunes row
    groups before any byte is read (parquet column chunks are lazy).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

N_FEATURE_BUCKETS = 8  # byte-value buckets of width 32 (0..255)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(LongType())),
        StructField("top_bucket", LongType()),
    ]
)

PAYLOAD_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
    ]
)


def attach_payload(docs: DataFrame) -> DataFrame:
    """Attach a deterministic binary payload column to the documents table.

    In a real pipeline the payload is read from the source system (S3 object,
    BLOB column, tar shard); here the utf-8 encoding of ``text`` stands in —
    byte-exact and reproducible, so every downstream op is oracle-checkable.
    """
    return docs.select(
        "doc_id",
        F.lit("text/plain").alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )


def decode_image(payload: bytes):  # pragma: no cover - stub by design
    """Decode an image payload to HxWxC pixels. Requires a real image
    library (PIL/opencv), not installed in this environment."""
    raise NotImplementedError(
        "image decode requires PIL/opencv; wire a decoder via extract_features(decoder=...)"
    )


def decode_audio(payload: bytes):  # pragma: no cover - stub by design
    """Decode audio to a waveform array. Requires librosa/soundfile."""
    raise NotImplementedError("audio decode requires librosa/soundfile")


def sample_frames(payload: bytes, every_n: int = 30):  # pragma: no cover
    """Sample every-nth frame from a video payload. Requires ffmpeg/opencv."""
    raise NotImplementedError("frame sampling requires ffmpeg/opencv")


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_no", LongType()),
        StructField("offset", LongType()),
        StructField("frame_md5", StringType()),
    ]
)

FRAME_BYTES = 32   # bytes per "frame" of the stand-in codec
FRAME_STRIDE = 128  # sample every 4th frame


def sample_frame_bytes(with_payload: DataFrame) -> DataFrame:
    """One-to-many frame sampling over binary payloads via mapInPandas.

    The deterministic stand-in codec treats the payload as fixed-size
    32-byte frames and samples every 4th one (stride 128 bytes) — the same
    row-expanding shape as real video frame extraction (``sample_frames``
    is the ffmpeg-gated hook). Emits (doc_id, frame_no, byte offset, md5 of
    the frame bytes); payload bytes never leave the map task — only the
    fixed-width digests shuffle, which is the entire point at 100 TB.
    """
    import hashlib

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_no": [], "offset": [], "frame_md5": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:  # corrupt row: nothing to chunk/sample
                    continue
                data = bytes(payload)
                n_frames = (
                    (len(data) - FRAME_BYTES) // FRAME_STRIDE + 1
                    if len(data) >= FRAME_BYTES
                    else 0
                )
                for i in range(n_frames):
                    off = i * FRAME_STRIDE
                    out["doc_id"].append(doc_id)
                    out["frame_no"].append(i)
                    out["offset"].append(off)
                    out["frame_md5"].append(
                        hashlib.md5(data[off : off + FRAME_BYTES]).hexdigest()
                    )
            yield pd.DataFrame(out).astype(
                {"doc_id": "int64", "frame_no": "int64", "offset": "int64"}
            )

    return with_payload.mapInPandas(_sample, FRAME_SCHEMA)


def _byte_histogram(payload: bytes) -> list[int]:
    """Deterministic fake 'feature extractor': 8-bucket byte-value histogram.
    Stands in for an embedding model; same shape (fixed-length vector).
    r8 (guide §4.2): vectorized — np.bincount over the byte array instead
    of a per-byte Python loop (b // 32 == b >> 5; identical counts)."""
    import numpy as np

    return (
        np.bincount(
            np.frombuffer(payload, dtype=np.uint8) >> 5,
            minlength=N_FEATURE_BUCKETS,
        )
        .astype(int)
        .tolist()
    )


def extract_features(
    with_payload: DataFrame,
    decoder: Callable[[bytes], list[int]] = _byte_histogram,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via mapInPandas.

    ``decoder`` maps payload bytes -> fixed-length int vector; the default is
    the deterministic byte-histogram fake. Swap in a real model/decoder at
    deployment — the plumbing (batch iteration, schema, memory shape) is
    identical.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["payload"].notna()]  # corrupt rows: no features
            feats = pdf["payload"].map(lambda p: decoder(bytes(p)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "features": feats,
                    "top_bucket": feats.map(
                        # argmax with lowest-index tie-break — deterministic
                        lambda v: max(range(len(v)), key=lambda i: (v[i], -i))
                    ).astype("int64"),
                }
            )

    return with_payload.mapInPandas(_extract, FEATURE_SCHEMA)


CHUNK_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("chunk_no", LongType()),
        StructField("offset", LongType()),
        StructField("length", LongType()),
        StructField("chunk_md5", StringType()),
    ]
)

CDC_WINDOW = 8        # rolling-hash window (bytes)
CDC_BASE = 33         # polynomial base
CDC_MASK_MOD = 64     # boundary when hash % 64 == 0 -> ~64B expected chunks


def cdc_chunk_bytes(with_payload: DataFrame) -> DataFrame:
    """Content-defined chunking over binary payloads via mapInPandas.

    Rabin-style CDC (the rsync/restic/LBFS device): a boundary falls after
    byte i when the polynomial hash of the trailing 8-byte window —
    sum(b[i-j] * 33^j for j in 0..7) — is divisible by 64, so chunk
    boundaries depend only on LOCAL content. Insert one byte near the front
    of a payload and every fixed-size-block scheme re-digests the whole
    tail; CDC re-digests only the chunk containing the edit — which is why
    dedup storage for 100 TB media archives chunks this way. Emits the
    chunk manifest (doc_id, chunk_no, offset, length, md5); payload bytes
    never leave the map task, only ~16-byte digests shuffle.
    """
    import hashlib

    import numpy as np

    pows = [CDC_BASE**j for j in range(CDC_WINDOW)]

    def _chunks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [],
                "chunk_no": [],
                "offset": [],
                "length": [],
                "chunk_md5": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:  # corrupt row: nothing to chunk/sample
                    continue
                data = bytes(payload)
                n = len(data)
                if n == 0:
                    continue
                # r8 (guide §4.2): the boundary scan was a per-byte Python
                # loop with an inner 8-term sum — O(8n) interpreted ops per
                # payload. Vectorized: 8 shifted int64 multiply-adds over
                # the whole byte array (same polynomial, same modulus; max
                # value 8*255*33^7 ≈ 8.7e13 << 2^63, so int64 arithmetic is
                # exact and boundaries are bit-identical — pinned by the
                # unchanged oracle hash).
                if n > CDC_WINDOW:
                    arr = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
                    s = np.zeros(n - CDC_WINDOW, dtype=np.int64)
                    # window ENDING at 0-based pos i-1 for 1-based i in
                    # [CDC_WINDOW, n): byte j-back is arr[i-1-j]
                    for j in range(CDC_WINDOW):
                        s += arr[CDC_WINDOW - 1 - j : n - 1 - j] * pows[j]
                    bounds = (
                        (np.nonzero(s % CDC_MASK_MOD == 0)[0] + CDC_WINDOW)
                        .tolist()
                    )
                else:
                    bounds = []
                starts = [1] + [b + 1 for b in bounds]
                ends = bounds + [n]
                for k, (s, e) in enumerate(zip(starts, ends)):
                    out["doc_id"].append(doc_id)
                    out["chunk_no"].append(k)
                    out["offset"].append(s - 1)
                    out["length"].append(e - s + 1)
                    out["chunk_md5"].append(
                        hashlib.md5(data[s - 1 : e]).hexdigest()
                    )
            yield pd.DataFrame(out).astype(
                {
                    "doc_id": "int64",
                    "chunk_no": "int64",
                    "offset": "int64",
                    "length": "int64",
                }
            )

    return with_payload.mapInPandas(_chunks, CHUNK_SCHEMA)
