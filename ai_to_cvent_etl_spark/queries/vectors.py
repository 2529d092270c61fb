"""SURVEY §2.10 — vector / similarity operators (V1-V4).

All vector math uses Spark higher-order functions (transform / zip_with /
aggregate) — JVM-side, codegen-friendly, no Python UDF in any declared path.
Floats are widened to DOUBLE before arithmetic on both engines; folds run
left-to-right; irrational outputs are rounded to 4dp (§5.3 rule 2).

V3's output is ids+rank only — immune to float drift unless two similarities
are within ~1e-12 of each other (vanishingly unlikely for random vectors).
At 100 TB the brute-force cross join becomes block-partitioned broadcast k-NN
(queries/dedup_scale.py q_ann_ivf_topk); this exact form stays as the
correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register


def _sq_norm(col: str) -> Column:
    """Sum of squares as a left-to-right double fold (matches list_sum order)."""
    return F.aggregate(
        F.transform(F.col(col), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _dot(a: str, b: str) -> Column:
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


@register(
    "q_vec_norm",
    oracle="""
        SELECT vec_id,
               ROUND(sqrt(list_sum(list_transform(embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm
        FROM embeddings
    """,
    section="V1",
    doc="Per-vector L2 norm via higher-order fold, rounded 4dp.",
)
def q_vec_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", F.round(F.sqrt(_sq_norm("embedding")), 4).alias("l2_norm")
    )


@register(
    "q_vec_centroid_norm",
    oracle="""
        WITH dims AS (
            SELECT label, u.pos AS pos, AVG(CAST(u.val AS DOUBLE)) AS c
            FROM (
                SELECT label,
                       unnest(list_transform(embedding,
                              (x, i) -> struct_pack(val := x, pos := i))) AS u
                FROM embeddings
            )
            GROUP BY label, u.pos
        )
        SELECT label, ROUND(sqrt(SUM(c * c)), 4) AS centroid_norm
        FROM dims GROUP BY label
    """,
    section="V2",
    doc="Per-label centroid (mean vector) L2 norm: posexplode -> avg per dim -> re-aggregate.",
)
def q_vec_centroid_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    dims = (
        emb.select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(F.avg(F.col("val").cast("double")).alias("c"))
    )
    return dims.groupBy("label").agg(
        F.round(F.sqrt(F.sum(F.col("c") * F.col("c"))), 4).alias("centroid_norm")
    )


@register(
    "q_vec_cosine_topk",
    oracle="""
        SELECT query_id, neighbor_id, rank FROM (
            SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                   CAST(ROW_NUMBER() OVER (
                        PARTITION BY q.vec_id
                        ORDER BY list_cosine_similarity(q.embedding, n.embedding) DESC,
                                 n.vec_id
                   ) AS BIGINT) AS rank
            FROM (SELECT * FROM embeddings WHERE vec_id < 10) q
            JOIN embeddings n ON n.vec_id <> q.vec_id
        ) WHERE rank <= 5
    """,
    section="V3",
    doc="Brute-force cosine k-NN for 10 query vectors; ids+rank output only.",
)
def q_vec_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import fan_out

    emb = load_table(spark, sf_dir, "embeddings")
    # norms once per vector (O(n)), not once per pair (O(n*k))
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    ).withColumn("q_norm", F.sqrt(_sq_norm("q_emb")))
    n = fan_out(
        emb.select(
            F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("n_emb")
        ).withColumn("n_norm", F.sqrt(_sq_norm("n_emb")))
    )
    sim = _dot("q_emb", "n_emb") / (F.col("q_norm") * F.col("n_norm"))
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        F.broadcast(q)
        .join(n, F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "rank")
    )


@register(
    "q_vec_label_pair_sim",
    oracle="""
        WITH dims AS (
            SELECT label, u.pos AS pos, AVG(CAST(u.val AS DOUBLE)) AS c
            FROM (
                SELECT label,
                       unnest(list_transform(embedding,
                              (x, i) -> struct_pack(val := x, pos := i))) AS u
                FROM embeddings WHERE label IN (0, 1)
            )
            GROUP BY label, u.pos
        )
        SELECT CAST(0 AS INTEGER) AS label_a, CAST(1 AS INTEGER) AS label_b,
               ROUND(SUM(a.c * b.c) / (sqrt(SUM(a.c * a.c)) * sqrt(SUM(b.c * b.c))), 4) AS centroid_cosine
        FROM (SELECT pos, c FROM dims WHERE label = 0) a
        JOIN (SELECT pos, c FROM dims WHERE label = 1) b USING (pos)
    """,
    section="V4",
    doc="Cosine between the centroids of two labels (vectors through joins).",
)
def q_vec_label_pair_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    dims = (
        emb.filter(F.col("label").isin(0, 1))
        .select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(F.avg(F.col("val").cast("double")).alias("c"))
    )
    a = dims.filter(F.col("label") == 0).select("pos", F.col("c").alias("ca"))
    b = dims.filter(F.col("label") == 1).select("pos", F.col("c").alias("cb"))
    joined = a.join(b, "pos")
    return joined.agg(
        F.lit(0).alias("label_a"),
        F.lit(1).alias("label_b"),
        F.round(
            F.sum(F.col("ca") * F.col("cb"))
            / (
                F.sqrt(F.sum(F.col("ca") * F.col("ca")))
                * F.sqrt(F.sum(F.col("cb") * F.col("cb")))
            ),
            4,
        ).alias("centroid_cosine"),
    )


@register(
    "q_vec_mips_topk",
    oracle="""
        SELECT query_id, neighbor_id, rank FROM (
            SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                   CAST(ROW_NUMBER() OVER (
                        PARTITION BY q.vec_id
                        ORDER BY list_sum(list_transform(range(1, 65),
                            k -> CAST(q.embedding[k] AS DOUBLE)
                                 * CAST(n.embedding[k] AS DOUBLE))) DESC,
                                 n.vec_id
                   ) AS BIGINT) AS rank
            FROM (SELECT * FROM embeddings WHERE vec_id < 10) q
            JOIN embeddings n ON n.vec_id <> q.vec_id
        ) WHERE rank <= 5
    """,
    section="V10",
    doc="Brute-force maximum-inner-product search (MIPS) for 10 query "
    "vectors, top-5 by raw dot product — the retrieval objective for "
    "learned (non-normalized) embedding spaces, where MIPS and cosine "
    "rank DIFFERENTLY (norm matters); V3 is the cosine twin. Dot products "
    "are fixed left-to-right folds (identical on both engines), output "
    "ids+rank only. Queries broadcast; the corpus side never shuffles — "
    "same 100 TB shape as V3/V7.",
)
def q_vec_mips_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import fan_out

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    n = fan_out(
        emb.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("n_emb"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("ip").desc(), F.col("neighbor_id").asc()
    )
    return (
        F.broadcast(q)
        .join(n, F.col("neighbor_id") != F.col("query_id"))
        .withColumn("ip", _dot("q_emb", "n_emb"))
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "rank")
    )
