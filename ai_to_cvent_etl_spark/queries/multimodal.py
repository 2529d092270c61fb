"""Multimodal column queries (north-star extension, M1-M2).

M1 pins the opaque-binary + typed-metadata data model (payload bytes never
interpreted, metadata computed engine-side). M2 pins the Arrow-batched
`mapInPandas` feature-extraction path end-to-end against a SQL oracle — the
deterministic byte-histogram fake stands in for a real decoder/model
(operators/multimodal.py), so the whole Python boundary (batch iteration,
schema, arrow round-trip) is hash-checked, not just smoke-tested.

Oracle note: document text is pure 7-bit ASCII (probed at every sf), so the
char-codepoint histogram DuckDB computes equals the byte histogram the
extractor computes over the utf-8 payload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.operators.multimodal import (
    attach_payload,
    cdc_chunk_bytes,
    extract_features,
    sample_frame_bytes,
)
from ai_to_cvent_etl_spark.registry import register
from pyspark.sql import DataFrame, SparkSession, Window


@register(
    "q_multimodal_meta",
    oracle="""
        SELECT doc_id,
               'text/plain' AS media_type,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               md5(text) AS payload_md5
        FROM documents
    """,
    section="M1",
    doc="Binary payload metadata: byte length + md5 digest computed on the "
    "opaque payload column; payload bytes never decoded. Row-local.",
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    p = attach_payload(docs)
    return p.select(
        "doc_id",
        "media_type",
        F.octet_length("payload").cast("bigint").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
    )


@register(
    "q_multimodal_features",
    tags=("python_boundary",),
    oracle="""
        WITH chars AS (
            SELECT doc_id,
                   octet_length(encode(text)) AS n_bytes,
                   list_transform(string_split(text, ''), c -> ascii(c)) AS cs
            FROM documents
        ),
        h AS (
            SELECT doc_id, n_bytes,
                   list_transform(range(0, 8),
                       b -> CAST(len(list_filter(cs, v -> v // 32 = b)) AS BIGINT))
                       AS features
            FROM chars
        )
        SELECT doc_id,
               'text/plain' AS media_type,
               CAST(n_bytes AS BIGINT) AS n_bytes,
               array_to_string(features, '|') AS features,
               CAST(list_position(features, list_max(features)) - 1 AS BIGINT)
                   AS top_bucket
        FROM h
    """,
    section="M2",
    doc="Arrow-batched mapInPandas feature extraction over binary payloads "
    "(deterministic byte-histogram fake decoder); map-only stage, oracle-"
    "checked through the full Python/Arrow boundary. The feature vector is "
    "serialized to a '|'-joined string at the query boundary (the driver's "
    "value-hash canonicalizer cannot hash lists, ADVICE r1); the operator "
    "itself still returns a real array column.",
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Deliberately NO repartition before mapInPandas: that would shuffle the
    # binary payloads (the heaviest bytes in the pipeline). At scale the
    # parquet scan's own splits parallelize the map stage; payload bytes
    # should only ever move scan -> task.
    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(attach_payload(docs))
    return feats.select(
        "doc_id",
        "media_type",
        "n_bytes",
        F.array_join(F.col("features").cast("array<string>"), "|").alias(
            "features"
        ),
        "top_bucket",
    )


@register(
    "q_multimodal_frame_sample",
    tags=("python_boundary",),
    oracle="""
        SELECT d.doc_id,
               CAST(t.i AS BIGINT) AS frame_no,
               CAST(t.i * 128 AS BIGINT) AS offset,
               md5(substr(d.text, CAST(t.i * 128 + 1 AS INTEGER), 32))
                   AS frame_md5
        FROM documents d
        CROSS JOIN unnest(range(0, CASE
            WHEN octet_length(encode(d.text)) >= 32
            THEN (octet_length(encode(d.text)) - 32) // 128 + 1
            ELSE 0 END)) AS t(i)
    """,
    section="M3",
    doc="One-to-many frame sampling over binary payloads (mapInPandas, "
    "operators/multimodal.py sample_frame_bytes): payload treated as "
    "32-byte frames, every 4th sampled (stride 128) — the video "
    "frame-extraction shape with a deterministic byte-slice codec standing "
    "in for ffmpeg. Emits (frame_no, offset, frame md5); payloads never "
    "shuffle, only fixed-width digests leave the map task. Oracle slices "
    "the same bytes with substr (documents are 7-bit ASCII, probed).",
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return sample_frame_bytes(attach_payload(docs))


@register(
    "q_multimodal_feature_dedup",
    tags=("python_boundary",),
    oracle="""
        WITH chars AS (
            SELECT doc_id,
                   list_transform(string_split(text, ''), c -> ascii(c)) AS cs
            FROM documents
        ),
        h AS (
            SELECT doc_id,
                   array_to_string(list_transform(range(0, 8),
                       b -> CAST(len(list_filter(cs, v -> v // 32 = b))
                                 AS BIGINT)), '|') AS fkey
            FROM chars
        )
        SELECT fkey,
               CAST(MIN(doc_id) AS BIGINT) AS canonical_doc,
               CAST(COUNT(*) AS BIGINT) AS n_payloads
        FROM h
        GROUP BY fkey
        HAVING COUNT(*) >= 2
    """,
    section="M4",
    doc="Multimodal content dedup by DECODED-feature fingerprint: payloads "
    "whose extracted feature vectors (M2's Arrow mapInPandas byte-"
    "histogram extractor) are identical collapse to one canonical doc — "
    "the image/audio dedup shape where raw bytes differ (re-encodes, "
    "reorders) but decoded content matches; this corpus's token-shuffled "
    "near-dups have identical histograms, so groups are non-trivial at "
    "every SF. Payloads never shuffle: only the fixed-width feature key "
    "leaves the map task, then one keyed aggregation.",
)
def q_multimodal_feature_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(attach_payload(docs))
    keyed = feats.select(
        "doc_id",
        F.array_join(F.col("features").cast("array<string>"), "|").alias(
            "fkey"
        ),
    )
    return (
        keyed.groupBy("fkey")
        .agg(
            F.min("doc_id").alias("canonical_doc"),
            F.count(F.lit(1)).alias("n_payloads"),
        )
        .filter(F.col("n_payloads") >= 2)
    )


# ==== from analytics_r4l ===========================================

@register(
    "q_multimodal_route",
    oracle="""
        WITH payloads AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 3 = 0 THEN 'PNG!' || text
                        WHEN doc_id % 3 = 1 THEN 'RIFF' || text
                        ELSE text END AS payload
            FROM documents
        ),
        routed AS (
            SELECT doc_id,
                   CASE WHEN substr(payload, 1, 4) = 'PNG!' THEN 'image'
                        WHEN substr(payload, 1, 4) = 'RIFF' THEN 'audio'
                        ELSE 'text' END AS modality,
                   octet_length(encode(payload)) AS n_bytes
            FROM payloads
        )
        SELECT modality,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
               CAST(MIN(n_bytes) AS BIGINT) AS min_bytes,
               CAST(MAX(n_bytes) AS BIGINT) AS max_bytes,
               MIN(doc_id) AS first_doc
        FROM routed
        GROUP BY modality
    """,
    section="M5",
    doc="Modality dispatch by MAGIC-BYTE sniffing: mixed payloads (a "
    "deterministic third carry a PNG-style magic, a third a RIFF/WAV "
    "magic, the rest plain text) routed on their first four bytes — "
    "never decoded — with per-modality doc counts and byte "
    "statistics. This is the ingest fan-out in front of M2's "
    "per-modality mapInPandas decoders: sniff cheap, partition by "
    "modality on write, and each decoder then streams a HOMOGENEOUS "
    "partition (mixed batches waste decoder setup per row). Pure "
    "byte/string logic; map-only + one 3-group reduction.",
)
def q_multimodal_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    payload = (
        F.when(F.col("doc_id") % 3 == 0, F.concat(F.lit("PNG!"), F.col("text")))
        .when(F.col("doc_id") % 3 == 1, F.concat(F.lit("RIFF"), F.col("text")))
        .otherwise(F.col("text"))
    )
    routed = docs.select(
        "doc_id",
        F.when(F.substring(payload, 1, 4) == "PNG!", "image")
        .when(F.substring(payload, 1, 4) == "RIFF", "audio")
        .otherwise("text")
        .alias("modality"),
        F.octet_length(F.encode(payload, "UTF-8")).cast("long").alias(
            "n_bytes"
        ),
    )
    return routed.groupBy("modality").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_bytes").alias("total_bytes"),
        F.min("n_bytes").alias("min_bytes"),
        F.max("n_bytes").alias("max_bytes"),
        F.min("doc_id").alias("first_doc"),
    )


# --- M6: aspect-ratio bucketing plan ----------------------------------------

# Training ladder of canonical aspect ratios (portrait .. widescreen) and the
# midpoint boundaries that assign an image to its nearest rung.
_AR_LADDER = (0.5, 0.75, 1.0, 1.3333, 1.7778)
_AR_BOUNDS = (0.625, 0.875, 1.16665, 1.55555)


def _ar_case(width: str, height: str) -> str:
    """SQL CASE assigning aspect = w/h to the nearest ladder rung."""
    a = f"(CAST({width} AS DOUBLE) / {height})"
    branches = []
    for bound, rung in zip(_AR_BOUNDS, _AR_LADDER[:-1]):
        branches.append(f"WHEN {a} <= {bound} THEN CAST({rung} AS DOUBLE)")
    return (
        "CASE "
        + " ".join(branches)
        + f" ELSE CAST({_AR_LADDER[-1]} AS DOUBLE) END"
    )


@register(
    "q_multimodal_aspect_bucket",
    oracle=f"""
        WITH dims AS (
            SELECT doc_id,
                   256 + (doc_id * 37) % 1024 AS w,
                   256 + (doc_id * 53) % 768 AS h
            FROM documents
        ),
        assigned AS (
            SELECT w, h,
                   {_ar_case('w', 'h')} AS bucket_aspect,
                   CAST(w AS DOUBLE) / h AS aspect
            FROM dims
        ),
        tot AS (SELECT COUNT(*) AS n_total FROM dims)
        SELECT bucket_aspect,
               CAST(COUNT(*) AS BIGINT) AS n_images,
               ROUND(COUNT(*) / CAST(t.n_total AS DOUBLE), 4) AS share,
               ROUND(CAST(SUM(w * h) AS DOUBLE) / 1e6, 2)
                   AS total_megapixels,
               ROUND(CAST(SUM(CAST(floor(abs(aspect - bucket_aspect) * 1e9)
                                   AS BIGINT)) AS DOUBLE)
                     / 1e9 / COUNT(*), 6) AS mean_aspect_gap
        FROM assigned CROSS JOIN tot t
        GROUP BY bucket_aspect, t.n_total
    """,
    section="M6",
    doc="Aspect-ratio bucketing plan over image dimension metadata: each "
    "image snaps to the nearest rung of a canonical aspect ladder "
    "(midpoint boundaries, no per-row log calls), and the plan emits "
    "per-bucket volume, share, total megapixels, and the mean "
    "aspect gap (crop/pad waste) — the batching layout diffusion-"
    "style image training uses so a batch never mixes aspect shapes "
    "(resize-to-bucket beats center-crop waste). Dimensions here "
    "derive deterministically from doc_id, standing in for the "
    "width/height a real decoder writes into the M1 typed-metadata "
    "columns (operators/multimodal.py documents the import-gated "
    "real decoders); everything downstream of the dims is the real "
    "plan. Exactness: dims and pixel sums are exact integers; the "
    "gap sum is per-row floored to BIGINT before aggregation. "
    "Scale: map-only assignment + one bucket-keyed agg over a "
    "CONSTANT bucket domain — payload bytes are never touched, the "
    "plan runs on metadata alone.",
)
def q_multimodal_aspect_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    dims = docs.select(
        "doc_id",
        (256 + (F.col("doc_id") * 37) % 1024).alias("w"),
        (256 + (F.col("doc_id") * 53) % 768).alias("h"),
    )
    aspect = F.col("w").cast("double") / F.col("h")
    bucket = F.lit(float(_AR_LADDER[-1]))
    for bound, rung in zip(reversed(_AR_BOUNDS), reversed(_AR_LADDER[:-1])):
        bucket = F.when(aspect <= bound, F.lit(float(rung))).otherwise(bucket)
    n_total = dims.count()
    assigned = dims.select(
        "w", "h", bucket.alias("bucket_aspect"), aspect.alias("aspect")
    )
    gap_int = F.floor(
        F.abs(F.col("aspect") - F.col("bucket_aspect")) * 1e9
    ).cast("bigint")
    return assigned.groupBy("bucket_aspect").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_images"),
        F.round(F.count(F.lit(1)) / F.lit(float(n_total)), 4).alias("share"),
        F.round(F.sum(F.col("w") * F.col("h")).cast("double") / 1e6, 2).alias(
            "total_megapixels"
        ),
        F.round(
            F.sum(gap_int).cast("double") / 1e9 / F.count(F.lit(1)), 6
        ).alias("mean_aspect_gap"),
    )


# ==== wave 166a: content-defined chunking manifest ==================


@register(
    "q_multimodal_cdc_chunks",
    tags=("python_boundary",),
    oracle="""
        WITH chars AS (
            SELECT doc_id, text,
                   list_transform(string_split(text, ''),
                                  c -> CAST(ascii(c) AS BIGINT)) AS cs,
                   octet_length(encode(text)) AS n
            FROM documents
            WHERE octet_length(encode(text)) > 0
        ),
        bnd AS (
            SELECT doc_id, text, n,
                   list_filter(range(8, n),
                       i -> (cs[i] * 1 + cs[i-1] * 33 + cs[i-2] * 1089
                             + cs[i-3] * 35937 + cs[i-4] * 1185921
                             + cs[i-5] * 39135393 + cs[i-6] * 1291467969
                             + cs[i-7] * 42618442977) % 64 = 0) AS bs
            FROM chars
        ),
        seg AS (
            SELECT doc_id, text, n,
                   list_prepend(1, list_transform(bs, b -> b + 1)) AS starts,
                   list_append(bs, n) AS ends
            FROM bnd
        )
        SELECT s.doc_id,
               CAST(t.k AS BIGINT) AS chunk_no,
               CAST(s.starts[t.k + 1] - 1 AS BIGINT) AS offset,
               CAST(s.ends[t.k + 1] - s.starts[t.k + 1] + 1 AS BIGINT)
                   AS length,
               md5(substr(s.text, CAST(s.starts[t.k + 1] AS INTEGER),
                          CAST(s.ends[t.k + 1] - s.starts[t.k + 1] + 1
                               AS INTEGER))) AS chunk_md5
        FROM seg s
        CROSS JOIN unnest(range(0, len(s.starts))) AS t(k)
    """,
    section="M7",
    doc="Content-defined chunking manifest over binary payloads "
    "(operators/multimodal.py cdc_chunk_bytes): Rabin-style rolling "
    "hash — boundary after byte i when sum(b[i-j]*33^j, j=0..7) is "
    "divisible by 64 — so chunk edges follow CONTENT, not offsets; "
    "an insertion re-digests one chunk, not the whole tail (the "
    "rsync/LBFS/restic dedup-storage device, and how a 100 TB media "
    "archive dedups at the sub-file grain). Runs through the real "
    "Arrow/mapInPandas boundary; the oracle replays the same "
    "polynomial over ascii codepoints (documents are 7-bit ASCII, "
    "probed at every SF) with range/list_filter. All integer + md5 "
    "digests. Scale: map-only over the payload scan — bytes never "
    "shuffle, only the ~40-byte manifest rows leave the task.",
)
def q_multimodal_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(
        F.octet_length(F.encode("text", "utf-8")) > 0
    )
    return cdc_chunk_bytes(attach_payload(docs))


# ==== wave 181b: payload shard packing plan (M8) ====================

_SHARD_CAP = 65536   # 64 KiB target shard size for the packing plan


@register(
    "q_multimodal_shard_packing",
    oracle=f"""
        WITH sizes AS (
            SELECT doc_id,
                   CAST(octet_length(encode(text)) AS BIGINT) AS b
            FROM documents
        ),
        placed AS (
            SELECT doc_id, b,
                   CAST(COALESCE(SUM(b) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS BIGINT) AS off
            FROM sizes
        )
        SELECT CAST(off // {_SHARD_CAP} AS BIGINT) AS shard_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(b) AS BIGINT) AS shard_bytes,
               CAST(MIN(doc_id) AS BIGINT) AS first_doc,
               CAST(MAX(doc_id) AS BIGINT) AS last_doc,
               ROUND(CAST(SUM(b) AS DOUBLE) / {_SHARD_CAP}, 6)
                   AS fill_ratio
        FROM placed GROUP BY 1
    """,
    section="M8",
    doc=f"Shard-packing plan for binary payloads (target "
    f"{_SHARD_CAP} bytes): assign each payload to shard "
    "floor(byte_offset / cap) where byte_offset is the running sum "
    "of payload sizes in doc_id order — the linear-packing rule "
    "behind WebDataset tar shards / parquet row-group sizing, where "
    "a shard may overrun by at most one payload tail but assignment "
    "is a pure window function (true bin packing is sequential; "
    "this is the relational contract every distributed writer "
    "actually implements). Payload bytes themselves NEVER shuffle — "
    "only (doc_id, size) pairs move; the plan is joined back to "
    "payloads at write time as a map-only stage. All offsets/sizes "
    "exact int64; fill_ratio is the only double. Scale: one "
    "ordered-prefix window over sizes (range-partition the sort at "
    "100 TB) and a shard-grain agg; output is n_bytes/cap rows.",
)
def q_multimodal_shard_packing(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sizes = attach_payload(docs).select(
        "doc_id", F.octet_length("payload").cast("bigint").alias("b")
    )
    # Scale note (r6): the exclusive byte-offset prefix sum runs on the
    # distributed two-pass running-aggregate operator (payload bytes were
    # already dropped — only (doc_id, b) shuffles).
    from ai_to_cvent_etl_spark.operators.ranking import global_running

    placed = global_running(
        sizes,
        ["doc_id"],
        {"off_raw": ("sum", F.col("b"))},
        exclusive=True,
    ).select(
        "doc_id",
        "b",
        F.coalesce(F.col("off_raw"), F.lit(0)).cast("bigint").alias("off"),
    )
    return placed.groupBy(
        F.expr(f"off div {_SHARD_CAP}").cast("bigint").alias("shard_id")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("b").cast("bigint").alias("shard_bytes"),
        F.min("doc_id").cast("bigint").alias("first_doc"),
        F.max("doc_id").cast("bigint").alias("last_doc"),
        F.round(
            F.sum("b").cast("double") / F.lit(float(_SHARD_CAP)), 6
        ).alias("fill_ratio"),
    )


# ==== wave 196b: payload byte-entropy sniffing (M9) =================


@register(
    "q_multimodal_byte_entropy",
    oracle="""
        WITH hx AS (
            SELECT source, upper(hex(encode(text))) AS h
            FROM documents
        ),
        bytes AS (
            SELECT source, unnest(regexp_extract_all(h, '..')) AS byt
            FROM hx
        ),
        hist AS (
            SELECT source, byt, CAST(COUNT(*) AS BIGINT) AS c
            FROM bytes GROUP BY source, byt
        ),
        ent AS (
            SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS n_distinct_bytes,
                   CAST(SUM(c) AS BIGINT) AS n_bytes,
                   CAST(SUM(CAST(floor(1e6 * c * ln(CAST(c AS DOUBLE)))
                        AS BIGINT)) AS BIGINT) AS clnc
            FROM hist GROUP BY source
        )
        SELECT source, n_bytes, n_distinct_bytes,
               ROUND((ln(CAST(n_bytes AS DOUBLE))
                      - CAST(clnc AS DOUBLE) / 1e6 / n_bytes)
                     / ln(2.0), 4) AS byte_entropy_bits,
               CASE WHEN (ln(CAST(n_bytes AS DOUBLE))
                          - CAST(clnc AS DOUBLE) / 1e6 / n_bytes)
                         / ln(2.0) > 7.0
                    THEN 'compressed_or_encrypted'
                    WHEN (ln(CAST(n_bytes AS DOUBLE))
                          - CAST(clnc AS DOUBLE) / 1e6 / n_bytes)
                         / ln(2.0) > 4.5
                    THEN 'binary_like'
                    ELSE 'text_like' END AS media_guess
        FROM ent
    """,
    section="M9",
    doc="Byte-level Shannon entropy of binary payloads per source: "
    "hex-encode the payload, histogram the 256 byte values, and "
    "report entropy in bits/byte — the standard content-sniffing "
    "signal a multimodal router applies BEFORE attempting a decode "
    "(>7 bits ~ compressed/encrypted, 4.5-7 general binary, below 4.5 text; "
    "plain English sits near 4.1), complementing M5's magic-byte "
    "routing for payloads with no recognizable header. The "
    "histogram is exact int64 counts; the entropy sum quantizes "
    "floor(1e6 * c ln c) per byte value (<= 256 bounded terms, "
    "V39 device) and rebuilds as (ln N - sum/(1e6 N))/ln 2. "
    "Payload bytes explode to (source, byte) pairs ONCE — 2 "
    "hex chars per byte, map-side — and never shuffle again after "
    "the 256-cell histogram. Scale: histogram state is 20x256 "
    "cells regardless of corpus size.",
)
def q_multimodal_byte_entropy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    hx = attach_payload(docs).select(
        "doc_id",
        F.upper(F.hex(F.col("payload"))).alias("h"),
    ).join(docs.select("doc_id", "source"), "doc_id")
    bytes_ = hx.select(
        "source",
        F.explode(F.expr("regexp_extract_all(h, '..', 0)")).alias(
            "byt"
        ),
    )
    hist = bytes_.groupBy("source", "byt").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    ent = hist.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_bytes"),
        F.sum("c").cast("bigint").alias("n_bytes"),
        F.sum(
            F.floor(
                F.lit(1e6) * F.col("c") * F.log(F.col("c").cast("double"))
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("clnc"),
    )
    h_bits = (
        F.log(F.col("n_bytes").cast("double"))
        - F.col("clnc").cast("double") / F.lit(1e6) / F.col("n_bytes")
    ) / F.log(F.lit(2.0))
    return ent.select(
        "source",
        "n_bytes",
        "n_distinct_bytes",
        F.round(h_bits, 4).alias("byte_entropy_bits"),
        F.when(h_bits > F.lit(7.0), F.lit("compressed_or_encrypted"))
        .when(h_bits > F.lit(4.5), F.lit("binary_like"))
        .otherwise(F.lit("text_like"))
        .alias("media_guess"),
    )


# ==== wave 205a: CDC chunk-dedup storage savings (M10) ==============


@register(
    "q_multimodal_chunk_dedup_savings",
    tags=("python_boundary",),
    oracle="""
        WITH chars AS (
            SELECT doc_id, text,
                   list_transform(string_split(text, ''),
                                  c -> CAST(ascii(c) AS BIGINT)) AS cs,
                   octet_length(encode(text)) AS n
            FROM documents
            WHERE octet_length(encode(text)) > 0
        ),
        bnd AS (
            SELECT doc_id, text, n,
                   list_filter(range(8, n),
                       i -> (cs[i] * 1 + cs[i-1] * 33 + cs[i-2] * 1089
                             + cs[i-3] * 35937 + cs[i-4] * 1185921
                             + cs[i-5] * 39135393 + cs[i-6] * 1291467969
                             + cs[i-7] * 42618442977) % 64 = 0) AS bs
            FROM chars
        ),
        seg AS (
            SELECT doc_id, text, n,
                   list_prepend(1, list_transform(bs, b -> b + 1))
                       AS starts,
                   list_append(bs, n) AS ends
            FROM bnd
        ),
        manifest AS (
            SELECT CAST(s.ends[t.k + 1] - s.starts[t.k + 1] + 1
                        AS BIGINT) AS length,
                   md5(substr(s.text,
                       CAST(s.starts[t.k + 1] AS INTEGER),
                       CAST(s.ends[t.k + 1] - s.starts[t.k + 1] + 1
                            AS INTEGER))) AS chunk_md5
            FROM seg s
            CROSS JOIN unnest(range(0, len(s.starts))) AS t(k)
        ),
        uniq AS (
            SELECT chunk_md5, CAST(MIN(length) AS BIGINT) AS length,
                   CAST(COUNT(*) AS BIGINT) AS refs
            FROM manifest GROUP BY chunk_md5
        )
        SELECT CAST(SUM(refs) AS BIGINT) AS total_chunks,
               CAST(COUNT(*) AS BIGINT) AS unique_chunks,
               CAST(SUM(refs * length) AS BIGINT) AS logical_bytes,
               CAST(SUM(length) AS BIGINT) AS stored_bytes,
               ROUND(1.0 - CAST(SUM(length) AS DOUBLE)
                     / SUM(refs * length), 6) AS dedup_savings,
               CAST(MAX(refs) AS BIGINT) AS hottest_chunk_refs
        FROM uniq
    """,
    section="M10",
    doc="CDC chunk-dedup storage accounting — the payoff step of "
    "M7's manifest: group chunk digests across ALL payloads, count "
    "references, and report logical vs stored bytes and the dedup "
    "savings ratio — the number a content-addressed store "
    "(restic/borg/artifact cache) quotes, and the reason CDC beats "
    "fixed blocks (shared shingled near-dup regions land on "
    "IDENTICAL chunk digests despite different offsets; this "
    "corpus's token-shuffled near-dups produce real cross-doc "
    "chunk hits). Digest grouping keys are 16-byte md5s (MIN(length)"
    " per digest is well-defined: same content => same length); all "
    "byte accounting exact int64. Scale: map-only chunking "
    "(payloads never shuffle) + ONE digest-keyed agg — the dedup "
    "index shuffle is digests, not content.",
)
def q_multimodal_chunk_dedup_savings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(
        F.octet_length(F.encode("text", "utf-8")) > 0
    )
    manifest = cdc_chunk_bytes(attach_payload(docs)).select(
        "length", "chunk_md5"
    )
    uniq = manifest.groupBy("chunk_md5").agg(
        F.min("length").cast("bigint").alias("length"),
        F.count(F.lit(1)).cast("bigint").alias("refs"),
    )
    return uniq.agg(
        F.sum("refs").cast("bigint").alias("total_chunks"),
        F.count(F.lit(1)).cast("bigint").alias("unique_chunks"),
        F.sum(F.col("refs") * F.col("length"))
        .cast("bigint")
        .alias("logical_bytes"),
        F.sum("length").cast("bigint").alias("stored_bytes"),
        F.round(
            F.lit(1.0)
            - F.sum("length").cast("double")
            / F.sum(F.col("refs") * F.col("length")),
            6,
        ).alias("dedup_savings"),
        F.max("refs").cast("bigint").alias("hottest_chunk_refs"),
    )
