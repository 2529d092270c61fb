"""Fortieth-wave operators (r3 continuation): multimodal routing, RFM
segmentation.

  M5  q_multimodal_route — modality dispatch by magic-byte sniffing:
                           mixed binary payloads (synthetic PNG/RIFF
                           magics on a deterministic subset) routed by
                           their leading bytes, per-modality counts and
                           byte statistics — the ingest fan-out that
                           decides which decoder pipeline (M2's
                           mapInPandas) each payload enters.
  A50 q_agg_rfm          — RFM customer segmentation: recency /
                           frequency / monetary tercile scores (ntile
                           with unique tie-breaks), the 27 composite
                           segments with sizes and exact monetary
                           means — the canonical customer-value
                           segmentation.

Determinism notes (SURVEY §5.3):
  * M5 is pure byte/string logic; the magic prefixes are deterministic
    functions of doc_id, and payload byte lengths are exact.
  * A50's ntile windows order by (metric, custkey) — no peer rows, so
    tercile assignment is exact; monetary means are decimal-exact.

Scale notes:
  * M5 is map-only sniffing + one low-cardinality reduction — the
    router in front of per-modality mapInPandas decoders (M2), each of
    which then processes a homogeneous partition (partitionBy modality
    on write); sniffing never decodes.
  * A50 is one per-customer reduction + three ntile windows over the
    collapsed |customers| relation + one segment rollup. At larger
    scale the terciles come from A20's approximate quantiles as fixed
    cutoffs — the segment logic is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register

# --- M5: modality routing by magic bytes -------------------------------------


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


# --- A50: RFM segmentation ---------------------------------------------------


@register(
    "q_agg_rfm",
    oracle="""
        WITH per_cust AS (
            SELECT o_custkey,
                   MAX(o_orderdate) AS last_order,
                   CAST(COUNT(*) AS BIGINT) AS freq,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
            FROM orders GROUP BY o_custkey
        ),
        scored AS (
            SELECT o_custkey, freq, monetary,
                   ntile(3) OVER (ORDER BY last_order, o_custkey) AS r,
                   ntile(3) OVER (ORDER BY freq, o_custkey) AS f,
                   ntile(3) OVER (ORDER BY monetary, o_custkey) AS m
            FROM per_cust
        )
        SELECT CAST(r AS INT) AS r, CAST(f AS INT) AS f,
               CAST(m AS INT) AS m,
               CAST(r AS VARCHAR) || CAST(f AS VARCHAR)
               || CAST(m AS VARCHAR) AS segment,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(monetary) AS DOUBLE) / COUNT(*) AS avg_monetary
        FROM scored
        GROUP BY r, f, m
    """,
    section="A50",
    doc="RFM customer segmentation — the canonical customer-value "
    "model: per-customer recency (last order date), frequency, and "
    "monetary total; tercile scores via ntile(3) ordered by (metric, "
    "custkey) — the unique tie-break makes tercile boundaries exact "
    "(§5.3 rule 3); the 27 composite segments with sizes and "
    "decimal-exact monetary means (3=best on every axis: '333' is "
    "the champion segment, '111' the churn-risk one). One "
    "per-customer reduction + three windows over the collapsed "
    "relation + one rollup; at larger scale fixed cutoffs from A20's "
    "quantile sketch replace the global ntile sort.",
)
def q_agg_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("freq"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("monetary"),
    )
    scored = per_cust.select(
        "o_custkey",
        "freq",
        "monetary",
        F.ntile(3)
        .over(Window.orderBy("last_order", "o_custkey"))
        .alias("r"),
        F.ntile(3).over(Window.orderBy("freq", "o_custkey")).alias("f"),
        F.ntile(3).over(Window.orderBy("monetary", "o_custkey")).alias("m"),
    )
    return scored.groupBy("r", "f", "m").agg(
        F.count("*").alias("n_customers"),
        (F.sum("monetary").cast("double") / F.count("*")).alias(
            "avg_monetary"
        ),
    ).select(
        F.col("r").cast("int").alias("r"),
        F.col("f").cast("int").alias("f"),
        F.col("m").cast("int").alias("m"),
        F.concat(
            F.col("r").cast("string"),
            F.col("f").cast("string"),
            F.col("m").cast("string"),
        ).alias("segment"),
        "n_customers",
        "avg_monetary",
    )
