"""Thirty-third-wave operators (r3 continuation): CUPED adjustment,
shard manifests, struct-column surgery.

  A45 q_agg_cuped       — CUPED variance reduction: post-period
                          customer revenue adjusted by the pre-period
                          covariate (θ = Cov/Var), with the achieved
                          variance-reduction ratio — the modern
                          experimentation-sensitivity technique.
  E29 q_etl_shard_manifest — training-shard manifest: documents packed
                          into ~fixed-byte shards by cumulative size
                          (L15's prefix device on bytes), per-shard
                          doc counts, byte totals, and id ranges — the
                          writer-side manifest a dataloader consumes.
  F23 q_struct_surgery  — struct column surgery: build a nested struct,
                          withField (add/overwrite), dropFields, then
                          extract typed scalars — the nested-schema
                          evolution surface (Column.withField /
                          dropFields), mirrored by struct rebuild in
                          DuckDB.

Determinism notes (SURVEY §5.3):
  * A45: per-customer revenues quantized to whole k$ → all moments are
    exact BIGINTs ≪ 2^53 (§5.3 rule 10); θ, adjusted variance, and the
    reduction ratio are single IEEE formulas rounded 6dp. Customers
    without pre-period history take covariate 0 on both sides.
  * E29 is pure integer prefix math (cumulative bytes, DIV shard size).
  * F23 outputs typed scalars only — structs never cross the hash
    boundary (F9's rule).

Scale notes:
  * A45 is two keyed reductions (per-customer periods, then global
    moments) — map-side partials carry everything.
  * E29: the global prefix sum is the L15 two-pass pattern at scale;
    the manifest is ≤|shards| rows and the shard id doubles as the
    writer's partition key, so packing and writing are one pass.
  * F23 is map-only; withField/dropFields rewrite the struct without
    re-projecting unrelated fields — the cheap path for nested-schema
    evolution (vs exploding and rebuilding whole rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register

# --- A45: CUPED variance reduction -------------------------------------------


@register(
    "q_agg_cuped",
    oracle="""
        WITH per_cust AS (
            SELECT o_custkey,
                   CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
                       THEN CAST(o_totalprice AS DECIMAL(18,2))
                       ELSE CAST(0 AS DECIMAL(18,2)) END) * 100 AS BIGINT)
                       // 100000 AS x,
                   CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01'
                       THEN CAST(o_totalprice AS DECIMAL(18,2))
                       ELSE CAST(0 AS DECIMAL(18,2)) END) * 100 AS BIGINT)
                       // 100000 AS y
            FROM orders GROUP BY o_custkey
        ),
        m AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                   CAST(SUM(x) AS DOUBLE) AS sx,
                   CAST(SUM(y) AS DOUBLE) AS sy,
                   CAST(SUM(x * x) AS DOUBLE) AS sxx,
                   CAST(SUM(y * y) AS DOUBLE) AS syy,
                   CAST(SUM(x * y) AS DOUBLE) AS sxy
            FROM per_cust
        )
        SELECT CAST(n AS BIGINT) AS n_customers,
               ROUND((sxy / n - (sx / n) * (sy / n))
                     / (sxx / n - (sx / n) * (sx / n)), 6) AS theta,
               ROUND(syy / n - (sy / n) * (sy / n), 4) AS var_y,
               ROUND((syy / n - (sy / n) * (sy / n))
                     - (sxy / n - (sx / n) * (sy / n))
                       * (sxy / n - (sx / n) * (sy / n))
                       / (sxx / n - (sx / n) * (sx / n)), 4)
                   AS var_y_cuped,
               ROUND((sxy / n - (sx / n) * (sy / n))
                     * (sxy / n - (sx / n) * (sy / n))
                     / ((sxx / n - (sx / n) * (sx / n))
                        * (syy / n - (sy / n) * (sy / n))), 6)
                   AS variance_reduction
        FROM m
    """,
    section="A45",
    doc="CUPED variance reduction: per-customer post-period revenue "
    "(1998+) adjusted by the pre-period covariate (1995-97 revenue) "
    "with θ = Cov(x,y)/Var(x); reports θ, the raw and adjusted metric "
    "variances (Var_cuped = Var_y·(1−ρ²)), and the achieved reduction "
    "ρ² — the experimentation-sensitivity technique that shrinks "
    "required sample sizes by the pre/post correlation. Per-customer "
    "revenues are quantized to WHOLE k$ so every moment is an exact "
    "BIGINT far below 2^53 (§5.3 rule 10 — the wide-decimal squares "
    "hit the int128 conversion divergence at sf0.1); customers "
    "without pre-period history carry covariate 0 identically on "
    "both engines. Two keyed reductions, map-side partials.",
)
def q_agg_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_totalprice").cast("decimal(18,2)")
    z = F.lit(0).cast("decimal(18,2)")
    pre = F.col("o_orderdate") < "1998-01-01"
    per_cust = orders.groupBy("o_custkey").agg(
        F.expr(
            "CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01' "
            "THEN CAST(o_totalprice AS DECIMAL(18,2)) "
            "ELSE CAST(0 AS DECIMAL(18,2)) END) * 100 AS BIGINT) "
            "DIV 100000"
        ).alias("x"),
        F.expr(
            "CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01' "
            "THEN CAST(o_totalprice AS DECIMAL(18,2)) "
            "ELSE CAST(0 AS DECIMAL(18,2)) END) * 100 AS BIGINT) "
            "DIV 100000"
        ).alias("y"),
    )
    m = per_cust.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    n = F.col("n")
    cov = F.col("sxy") / n - (F.col("sx") / n) * (F.col("sy") / n)
    vx = F.col("sxx") / n - (F.col("sx") / n) * (F.col("sx") / n)
    vy = F.col("syy") / n - (F.col("sy") / n) * (F.col("sy") / n)
    return m.select(
        n.cast("long").alias("n_customers"),
        F.round(cov / vx, 6).alias("theta"),
        F.round(vy, 4).alias("var_y"),
        F.round(vy - cov * cov / vx, 4).alias("var_y_cuped"),
        F.round(cov * cov / (vx * vy), 6).alias("variance_reduction"),
    )


# --- E29: training-shard manifest --------------------------------------------

_SHARD_BYTES = 20_000


@register(
    "q_etl_shard_manifest",
    oracle=f"""
        WITH c AS (
            SELECT doc_id, n_chars,
                   CAST(SUM(n_chars) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS cum
            FROM documents
        ),
        assigned AS (
            SELECT doc_id, n_chars,
                   (cum - n_chars) // {_SHARD_BYTES} AS shard
            FROM c
        )
        SELECT shard AS shard_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_bytes,
               MIN(doc_id) AS first_doc,
               MAX(doc_id) AS last_doc
        FROM assigned
        GROUP BY shard
    """,
    section="E29",
    doc=f"Training-shard manifest: documents packed into ~{_SHARD_BYTES}"
    "-byte shards by cumulative size (shard = prefix-bytes DIV target "
    "— L15's prefix device on bytes, so shards are contiguous in "
    "doc_id order and sizes land within one document of the target); "
    "per shard: doc counts, byte totals, and the id range — exactly "
    "the manifest a dataloader or resumable exporter consumes. Pure "
    "integer prefix math. The shard id doubles as the writer's "
    "partitionBy key, so packing and writing are ONE pass; at 100 TB "
    "the prefix sum is the two-pass per-partition-offset pattern and "
    "the manifest stays ≤|shards| rows.",
)
def q_etl_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    c = docs.select(
        "doc_id", "n_chars", F.sum("n_chars").over(w).alias("cum")
    )
    assigned = c.select(
        "doc_id",
        "n_chars",
        F.expr(f"(cum - n_chars) DIV {_SHARD_BYTES}").alias("shard"),
    )
    return assigned.groupBy(F.col("shard").alias("shard_id")).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_bytes"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


# --- F23: struct-column surgery ----------------------------------------------


@register(
    "q_struct_surgery",
    oracle="""
        SELECT doc_id,
               lang AS meta_lang,
               n_chars * 2 AS meta_weight,
               'v2' AS meta_version,
               CAST(3 AS INT) AS n_fields_after_drop
        FROM documents
    """,
    section="F23",
    doc="Struct-column surgery — the nested-schema evolution surface: "
    "build meta = struct(lang, chars), ADD a version field and "
    "OVERWRITE chars with a derived weight via Column.withField, "
    "remove the original chars via dropFields, then extract typed "
    "scalars (structs never cross the hash boundary — F9's rule; the "
    "field count via json_object_keys(to_json(meta)) pins that the "
    "drop actually happened — 3 fields survive, not 4). withField/"
    "dropFields rewrite one field without re-projecting the rest of "
    "the struct — the cheap path for evolving deeply nested event "
    "schemas in place (vs exploding and rebuilding whole rows). "
    "Map-only.",
)
def q_struct_surgery(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    meta = F.struct(
        F.col("lang").alias("lang"), F.col("n_chars").alias("chars")
    )
    evolved = (
        meta.withField("version", F.lit("v2"))
        .withField("weight", F.col("n_chars") * 2)
        .dropFields("chars")
    )
    d = docs.select("doc_id", evolved.alias("meta"))
    return d.select(
        "doc_id",
        F.col("meta.lang").alias("meta_lang"),
        F.col("meta.weight").alias("meta_weight"),
        F.col("meta.version").alias("meta_version"),
        F.expr("size(json_object_keys(to_json(meta)))")
        .cast("int")
        .alias("n_fields_after_drop"),
    )
