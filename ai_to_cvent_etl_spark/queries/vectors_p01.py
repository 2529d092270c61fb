"""Registered queries q_vec_norm..q_vec_pca_explained (chunk 1 of 2 split from vectors.py — see vectors_shared.py for shared helpers)."""

from __future__ import annotations
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.types import DecimalType
import pandas as pd
from ai_to_cvent_etl_spark.queries._util import dec2
from pyspark.sql import DataFrame, SparkSession
from ai_to_cvent_etl_spark.queries.analytics_r2 import (  # noqa: E402
    _KM_CTES as _DUNN_KM_CTES,
)

from ai_to_cvent_etl_spark.queries.vectors_shared import (  # noqa: F401
    _COS_DUCK,
    _HAM_NQ,
    _HAM_TOPK,
    _HUB_K,
    _KNN_K,
    _MAXSIM_NQ,
    _MKNN_CAP,
    _MKNN_K,
    _MMR_K,
    _MMR_POOL,
    _MMR_QUERY_ID,
    _PCA_IT_DUCK,
    _PCA_ROUNDS,
    _PRUNE_KEEP,
    _QS,
    _QSUM_DUCK,
    _SCALE_DIMS,
    _SIL_SEEDS,
    _TWONN_CAP,
    _dot,
    _knn_oracle,
    _mmr_sel_ctes,
    _pack_duck,
    _pack_spark,
    _qsum,
    _recall_oracle,
    _sq_norm,
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

@register(
    "q_vec_minmax_scale",
    oracle=f"""
        WITH x AS (
            SELECT vec_id, u.pos AS pos, u.val AS x
            FROM (
                SELECT vec_id,
                       unnest(list_transform(embedding,
                              (x, i) -> struct_pack(val := x, pos := i))) AS u
                FROM embeddings
            )
            WHERE u.pos <= {_SCALE_DIMS}
        ),
        st AS (
            SELECT pos, MIN(x) AS mn, MAX(x) AS mx FROM x GROUP BY pos
        )
        SELECT x.vec_id, CAST(x.pos AS INTEGER) AS pos, x.x,
               (CAST(x.x AS DOUBLE) - CAST(st.mn AS DOUBLE))
               / (CAST(st.mx AS DOUBLE) - CAST(st.mn AS DOUBLE)) AS scaled
        FROM x JOIN st USING (pos)
        WHERE st.mx > st.mn
    """,
    section="V11",
    doc="Per-dimension min-max feature scaling (the fit+transform ML-prep "
    f"pass), first {_SCALE_DIMS} dims long-form: posexplode -> exact FLOAT "
    "order statistics per dimension -> broadcast the |dims|-row stats "
    "table back over the corpus (map-only transform; the corpus never "
    "shuffles for the transform, only the tiny stats aggregation "
    "shuffles). The scale expression is a fixed IEEE tree over exact "
    "float->double conversions — bit-deterministic; degenerate dims "
    "(mx == mn) are excluded on both engines.",
)
def q_vec_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos0", "x")
    ).select(
        "vec_id", (F.col("pos0") + 1).alias("pos"), "x"
    ).where(F.col("pos") <= _SCALE_DIMS)
    st = x.groupBy("pos").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    return (
        x.join(F.broadcast(st), "pos")
        .where(F.col("mx") > F.col("mn"))
        .select(
            "vec_id",
            F.col("pos").cast("int"),
            "x",
            (
                (F.col("x").cast("double") - F.col("mn").cast("double"))
                / (F.col("mx").cast("double") - F.col("mn").cast("double"))
            ).alias("scaled"),
        )
    )

@register(
    "q_vec_ann_recall",
    oracle=_recall_oracle(),
    section="V12",
    doc="ANN quality gate: recall@3 of the D4 sign-bit IVF index against "
    "the V3 brute-force cosine ground truth, per query — the measurement "
    "every approximate index needs before it replaces the exact path "
    "(bench-vs-baseline for indexes). Composes the two already-gated "
    "queries and joins their bounded (10 x 3) outputs; recall is one "
    "IEEE division over integer match counts. The underlying scans "
    "inherit their own queries' scale shapes (queries broadcast, corpus "
    "never shuffles).",
)
def q_vec_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries.dedup_scale import q_ann_ivf_topk
    from ai_to_cvent_etl_spark.queries.vectors_p01 import q_vec_cosine_topk

    exact3 = (
        q_vec_cosine_topk(spark, sf_dir)
        .where(F.col("rank") <= 3)
        .select("query_id", "neighbor_id")
    )
    approx3 = q_ann_ivf_topk(spark, sf_dir).select(
        F.col("query_id").alias("aq"), F.col("neighbor_id").alias("an")
    )
    j = exact3.join(
        approx3,
        (F.col("query_id") == F.col("aq"))
        & (F.col("neighbor_id") == F.col("an")),
        "left",
    )
    return j.groupBy("query_id").agg(
        F.count("an").alias("n_match"),
        (F.count("an").cast("double") / F.lit(3.0)).alias("recall_at_3"),
    )

@register(
    "q_vec_dim_prune",
    oracle=f"""
        WITH x AS (
            SELECT u.pos AS pos,
                   CAST(floor(CAST(u.val AS DOUBLE) * 1e6) AS BIGINT) AS qx
            FROM (
                SELECT unnest(list_transform(embedding,
                       (x, i) -> struct_pack(val := x, pos := i))) AS u
                FROM embeddings
            )
        ),
        m AS (
            SELECT pos, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(qx) AS BIGINT) AS s,
                   CAST(SUM(qx * qx) AS BIGINT) AS s2
            FROM x GROUP BY pos
        ),
        v AS (
            SELECT CAST(pos AS INTEGER) AS pos, n,
                   CAST(s2 AS DOUBLE) / n
                   - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)
                       AS variance_q
            FROM m
        )
        SELECT pos, n, variance_q, CAST(rnk AS INTEGER) AS var_rank
        FROM (
            SELECT *, row_number() OVER (
                ORDER BY variance_q DESC, pos
            ) AS rnk FROM v
        ) WHERE rnk <= {_PRUNE_KEEP}
    """,
    section="V13",
    doc=f"Variance-based feature selection: keep the top-{_PRUNE_KEEP} "
    "highest-variance embedding dimensions (the zero-information-dim "
    "pruning pass before indexing/training). Each float dim is quantized "
    "floor(x*1e6) to BIGINT (the float->double widening is exact; one "
    "correctly-rounded multiply on identical operands), variance comes "
    "from exact integer moment sums, ranking ties break on position. One "
    "posexplode + keyed agg over the corpus; the rank runs on |dims| "
    "rows. Population variance in quantized units — the selection "
    "ordering is what matters.",
)
def q_vec_dim_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select(F.posexplode("embedding").alias("pos0", "v")).select(
        (F.col("pos0") + 1).alias("pos"),
        F.expr("cast(floor(cast(v as double) * 1e6) as bigint)").alias("qx"),
    )
    m = x.groupBy("pos").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("qx").alias("s"),
        F.sum(F.col("qx") * F.col("qx")).alias("s2"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    v = m.select(
        F.col("pos").cast("int"),
        "n",
        (F.col("s2").cast("double") / F.col("n") - mean * mean).alias(
            "variance_q"
        ),
    )
    rnk = F.row_number().over(Window.orderBy(F.desc("variance_q"), F.asc("pos")))
    return (
        v.withColumn("var_rank", rnk.cast("int"))
        .where(F.col("var_rank") <= _PRUNE_KEEP)
    )

# ==== from analytics_r3h ===========================================

@register(
    "q_vec_embedding_drift",
    oracle="""
        WITH x AS (
            SELECT vec_id % 2 AS half, u.pos AS pos,
                   CAST(floor(CAST(u.val AS DOUBLE) * 1e6) AS BIGINT) AS qx
            FROM (
                SELECT vec_id,
                       unnest(list_transform(embedding,
                              (x, i) -> struct_pack(val := x, pos := i))) AS u
                FROM embeddings
            )
        ),
        m AS (
            SELECT half, pos, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(qx) AS BIGINT) AS s
            FROM x GROUP BY half, pos
        )
        SELECT CAST(a.pos AS INTEGER) AS pos,
               a.n AS n_a, b.n AS n_b,
               CAST(a.s AS DOUBLE) / a.n AS mean_qa,
               CAST(b.s AS DOUBLE) / b.n AS mean_qb,
               abs(CAST(a.s AS DOUBLE) / a.n - CAST(b.s AS DOUBLE) / b.n)
                   AS abs_shift
        FROM m a JOIN m b ON a.pos = b.pos AND a.half = 0 AND b.half = 1
    """,
    section="V14",
    doc="Per-dimension embedding drift monitor: centroid shift between "
    "two corpus halves (the check run between data/model versions before "
    "an index rebuild — a large shift invalidates trained centroids like "
    "V6's). Dims quantized floor(x*1e6) to exact integers; means are "
    "single divisions of exact moments; the shift is a fixed IEEE tree. "
    "One posexplode + keyed agg; the halves join on a |dims|-row table.",
)
def q_vec_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select(
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode("embedding").alias("pos0", "v"),
    ).select(
        "half",
        (F.col("pos0") + 1).alias("pos"),
        F.expr("cast(floor(cast(v as double) * 1e6) as bigint)").alias("qx"),
    )
    m = x.groupBy("half", "pos").agg(
        F.count(F.lit(1)).alias("n"), F.sum("qx").alias("s")
    )
    a = m.where(F.col("half") == 0).select(
        "pos", F.col("n").alias("n_a"), F.col("s").alias("s_a")
    )
    b = m.where(F.col("half") == 1).select(
        "pos", F.col("n").alias("n_b"), F.col("s").alias("s_b")
    )
    ma = F.col("s_a").cast("double") / F.col("n_a")
    mb = F.col("s_b").cast("double") / F.col("n_b")
    return (
        a.join(b, "pos")
        .select(
            F.col("pos").cast("int"),
            "n_a",
            "n_b",
            ma.alias("mean_qa"),
            mb.alias("mean_qb"),
            F.abs(ma - mb).alias("abs_shift"),
        )
    )

@register(
    "q_vec_knn_classify",
    oracle=_knn_oracle(),
    section="V15",
    doc=f"k-NN label classification (k={_KNN_K}): majority vote over the "
    "V3 brute-force cosine neighbors, ties to the smallest label, "
    "scored against the gold labels — the lazy-classifier evaluation "
    "loop (the second model-eval op beside L14's confusion matrix). "
    "Inherits V3's scale shape (queries broadcast, corpus never "
    "shuffles); voting and scoring run on 10 x k rows. Integer votes, "
    "fully tie-broken argmax — exact.",
)
def q_vec_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries.vectors_p01 import q_vec_cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    nn = q_vec_cosine_topk(spark, sf_dir).where(F.col("rank") <= _KNN_K)
    votes = (
        nn.join(
            emb.select(F.col("vec_id").alias("neighbor_id"), "label"),
            "neighbor_id",
        )
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    rnk = F.row_number().over(
        Window.partitionBy("query_id").orderBy(
            F.desc("n_votes"), F.asc("label")
        )
    )
    pred = (
        votes.withColumn("rnk", rnk)
        .where(F.col("rnk") == 1)
        .select("query_id", F.col("label").alias("pred_label"))
    )
    gold = emb.select(
        F.col("vec_id").alias("query_id"),
        F.col("label").cast("int").alias("true_label"),
    )
    return pred.join(gold, "query_id").select(
        "query_id",
        "pred_label",
        "true_label",
        F.when(F.col("pred_label") == F.col("true_label"), 1)
        .otherwise(0)
        .alias("is_correct"),
    )

@register(
    "q_vec_pca_power",
    oracle=(
        """
        WITH ex AS (
            SELECT vec_id, u.i AS i, CAST(u.x AS DOUBLE) AS x
            FROM (
                SELECT vec_id,
                       unnest(list_transform(embedding,
                              (x, i) -> struct_pack(x := x, i := i))) AS u
                FROM embeddings
            )
        ),
        mean AS (
            SELECT i, {qmean} / COUNT(*) AS m FROM ex GROUP BY i
        ),
        cx AS (
            SELECT e.vec_id, e.i, e.x - m.m AS cx
            FROM ex e JOIN mean m ON m.i = e.i
        ),
        cov AS (
            SELECT a.i AS i, b.i AS j,
                   {qcov} / (COUNT(*) - 1) AS c
            FROM cx a JOIN cx b ON a.vec_id = b.vec_id
            GROUP BY a.i, b.i
        ),
        v0 AS (
            SELECT DISTINCT i, CAST(0.125 AS DOUBLE) AS x FROM ex
        ),""".format(
            qmean=_QSUM_DUCK.format(x="x"),
            qcov=_QSUM_DUCK.format(x="a.cx * b.cx"),
        )
        + ",".join(
            _PCA_IT_DUCK.format(i=i, j=i - 1) for i in range(1, _PCA_ROUNDS + 1)
        )
        + f"""
        SELECT v.i AS dim,
               ROUND(v.x, 6) AS loading,
               ROUND(n.nrm, 4) AS eigenvalue
        FROM v{_PCA_ROUNDS} v CROSS JOIN nrm{_PCA_ROUNDS} n
    """
    ),
    section="V16",
    doc="Top principal component of the embedding cloud: mean-center, "
    "build the 64x64 covariance as the relational outer product "
    "(posexplode^2 self-join co-keyed on vec_id), then three unrolled "
    "power-iteration rounds (matvec -> L2-normalize), starting from the "
    "exact-in-binary uniform unit vector 1/8. EVERY float reduction — "
    "dim means, covariance cells, matvec terms, norm squares — goes "
    "through the floor(x*1e12) DECIMAL quantization (G1's device), so "
    "the whole iteration is bit-identical cross-engine with no "
    "intermediate rounding. The eigenvalue is the final matvec norm "
    "(the Rayleigh estimate under unit input). The matrix and vector "
    "are bounded 64-row relations — matvecs are broadcast-size joins, "
    "never driver collects.",
)
def q_vec_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id", F.posexplode("embedding").alias("i", "xf")
    ).select("vec_id", (F.col("i") + 1).alias("i"), F.col("xf").cast("double").alias("x"))
    # r9: mean is dimension-grain (64 rows at ANY scale factor — bounded
    # by the embedding dim, not the corpus), so broadcast it explicitly;
    # derived-stats conservatism otherwise plans a shuffle join of the
    # exploded corpus against 64 rows.
    mean = ex.groupBy("i").agg((_qsum(F.col("x")) / F.count("*")).alias("m"))
    cx = ex.join(F.broadcast(mean), "i").select(
        "vec_id", "i", (F.col("x") - F.col("m")).alias("cx")
    )
    a, b = cx.alias("a"), cx.alias("b")
    cov = (
        a.join(b, "vec_id")
        .select(
            F.col("a.i").alias("i"),
            F.col("b.i").alias("j"),
            (F.col("a.cx") * F.col("b.cx")).alias("p"),
        )
        .groupBy("i", "j")
        .agg((_qsum(F.col("p")) / (F.count("*") - 1)).alias("c"))
    )
    cov = cov.localCheckpoint(eager=False)
    v = ex.select("i").distinct().select("i", F.lit(0.125).alias("x"))
    nrm = None
    for _ in range(_PCA_ROUNDS):
        # r9: the checkpointed covariance carries no size stats, so every
        # matvec round planned as a sort-merge join; v is dimension-grain
        # (d rows, d=64 at any SF) — broadcast-safe by construction. Same
        # no-stats-after-checkpoint pathology and fix as the graph
        # closure loops (q_graph_percolation_profile).
        mv = (
            cov.join(F.broadcast(v.withColumnRenamed("i", "j")), "j")
            .select("i", (F.col("c") * F.col("x")).alias("p"))
            .groupBy("i")
            .agg(_qsum(F.col("p")).alias("s"))
        )
        nrm = mv.agg(F.sqrt(_qsum(F.col("s") * F.col("s"))).alias("nrm"))
        v = mv.crossJoin(F.broadcast(nrm)).select(
            "i", (F.col("s") / F.col("nrm")).alias("x")
        )
    return v.crossJoin(nrm).select(
        F.col("i").cast("long").alias("dim"),
        F.round("x", 6).alias("loading"),
        F.round("nrm", 4).alias("eigenvalue"),
    )

@register(
    "q_vec_hamming_topk",
    oracle=f"""
        WITH words AS (
            SELECT vec_id, {_pack_duck(1)} AS wlo, {_pack_duck(33)} AS whi
            FROM embeddings
        ),
        q AS (SELECT vec_id AS qid, wlo AS qlo, whi AS qhi FROM words
              WHERE vec_id < {_HAM_NQ}),
        d AS (
            SELECT q.qid, c.vec_id AS nid,
                   CAST(bit_count(xor(q.qlo, c.wlo))
                        + bit_count(xor(q.qhi, c.whi)) AS INT) AS hamming
            FROM q JOIN words c ON c.vec_id <> q.qid
        ),
        r AS (
            SELECT qid, nid, hamming,
                   row_number() OVER (
                       PARTITION BY qid ORDER BY hamming, nid
                   ) AS rnk
            FROM d
        )
        SELECT qid, nid, hamming, CAST(rnk AS INT) AS rnk
        FROM r WHERE rnk <= {_HAM_TOPK}
    """,
    section="V17",
    doc="Binary-quantized ANN (the modern binary-embedding serving "
    "path): each 64-dim vector packs its SIGN BITS into two 32-bit "
    "words via a codegen'd indexed-lambda fold (64x compression, no "
    "UDF; 32-bit halves keep shifts clear of DuckDB's checked 1<<63), then top-10 neighbors per query (vec_id<10) by Hamming "
    "distance = popcount(XOR) — integer ops only after the sign test, "
    "so ranking is exactly deterministic (neighbor-id tie-break). The "
    "query side broadcasts; the corpus word table is one BIGINT per "
    "vector and never shuffles. At d>64, pack into a word ARRAY and "
    "sum popcounts; at 100 TB combine with V7's IVF cells so only "
    "probed cells pay the XOR scan. Distinct from D2 SimHash (text "
    "fingerprinting) — this is embedding-space quantized retrieval.",
)
def q_vec_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    words = emb.select(
        "vec_id",
        F.expr(_pack_spark(1)).alias("wlo"),
        F.expr(_pack_spark(33)).alias("whi"),
    )
    q = words.where(F.col("vec_id") < _HAM_NQ).select(
        F.col("vec_id").alias("qid"),
        F.col("wlo").alias("qlo"),
        F.col("whi").alias("qhi"),
    )
    d = (
        words.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("nid"),
            (
                F.bit_count(F.col("qlo").bitwiseXOR(F.col("wlo")))
                + F.bit_count(F.col("qhi").bitwiseXOR(F.col("whi")))
            ).alias("hamming"),
        )
    )
    rnk = F.row_number().over(
        Window.partitionBy("qid").orderBy("hamming", "nid")
    )
    return (
        d.withColumn("rnk", rnk)
        .where(F.col("rnk") <= _HAM_TOPK)
        .select("qid", "nid", "hamming", F.col("rnk").cast("int").alias("rnk"))
    )

@register(
    "q_vec_maxsim",
    oracle=f"""
        WITH q AS (
            SELECT vec_id AS qid, embedding FROM embeddings
            WHERE vec_id < {_MAXSIM_NQ}
        ),
        c AS (
            SELECT vec_id, label, embedding FROM embeddings
            WHERE vec_id >= {_MAXSIM_NQ}
        ),
        sims AS (
            SELECT q.qid, c.label, {_COS_DUCK} AS cos
            FROM q CROSS JOIN c
        ),
        best AS (
            SELECT qid, label, MAX(cos) AS m
            FROM sims GROUP BY qid, label
        )
        SELECT label,
               CAST(COUNT(*) AS BIGINT) AS n_query_vecs,
               ROUND(CAST(SUM(CAST(floor(m * 1e12) AS DECIMAL(38,0)))
                          AS DOUBLE) / 1e12, 4) AS maxsim
        FROM best GROUP BY label
    """,
    section="V18",
    doc="ColBERT-style late-interaction (MaxSim) scoring: a multi-vector "
    f"query ({_MAXSIM_NQ} token vectors, vec_id<{_MAXSIM_NQ}) scored "
    "against each label's vector set as sum-over-query-vectors of the "
    "maximum cosine — the retrieval primitive that preserves per-token "
    "matching where single-vector cosine (V3) collapses the query to "
    "one point. Per-pair cosines are fixed-order HOF folds (identical "
    "bits cross-engine, V1's rule); per-query maxima compare those "
    "bits; the per-label sum quantizes each max before an exact "
    "DECIMAL reduction. Queries broadcast; the corpus scans once "
    "map-side; both reductions are partial-agg friendly — compose with "
    "V7's IVF cells at scale exactly like single-vector search.",
)
def q_vec_maxsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < _MAXSIM_NQ).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    c = emb.where(F.col("vec_id") >= _MAXSIM_NQ).select(
        "label", F.col("embedding").alias("ce")
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("qe"),
            F.col("ce"),
            lambda a, b: a.cast("double") * b.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )

    def norm(col):
        return F.sqrt(
            F.aggregate(
                F.transform(col, lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )

    sims = c.crossJoin(F.broadcast(q)).select(
        "qid",
        "label",
        (dot / (norm(F.col("qe")) * norm(F.col("ce")))).alias("cos"),
    )
    best = sims.groupBy("qid", "label").agg(F.max("cos").alias("m"))
    return best.groupBy("label").agg(
        F.count("*").alias("n_query_vecs"),
        F.round(
            F.sum(F.floor(F.col("m") * 1e12).cast("decimal(38,0)")).cast(
                "double"
            )
            / 1e12,
            4,
        ).alias("maxsim"),
    )

# ==== from analytics_r3y ===========================================

@register(
    "q_vec_scalar_quantize",
    oracle="""
        WITH ex AS (
            SELECT vec_id, u.i AS i, CAST(u.x AS DOUBLE) AS x
            FROM (
                SELECT vec_id,
                       unnest(list_transform(embedding,
                              (x, i) -> struct_pack(x := x, i := i))) AS u
                FROM embeddings
            )
        ),
        rng AS (
            SELECT i, MIN(x) AS lo, MAX(x) AS hi FROM ex GROUP BY i
        ),
        q AS (
            SELECT e.vec_id, e.i, e.x, r.lo, r.hi,
                   CASE WHEN r.hi = r.lo THEN 0
                        ELSE CAST(floor((e.x - r.lo) / (r.hi - r.lo)
                                        * 255.0) AS BIGINT) END AS code
            FROM ex e JOIN rng r ON r.i = e.i
        ),
        err AS (
            SELECT i,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(floor(
                       (x - (lo + (least(code, 255) + 0.5)
                             * (hi - lo) / 256.0))
                       * (x - (lo + (least(code, 255) + 0.5)
                               * (hi - lo) / 256.0)) * 1e12)
                       AS DECIMAL(38,0))) AS DOUBLE) / 1e12 AS sse
            FROM q GROUP BY i
        )
        SELECT CAST(e.i AS BIGINT) AS dim,
               ROUND(r.lo, 6) AS lo,
               ROUND(r.hi, 6) AS hi,
               ROUND(e.sse / e.n, 12) AS mse
        FROM err e JOIN rng r ON r.i = e.i
    """,
    section="V19",
    doc="Int8 scalar quantization of embeddings (the standard 4× "
    "serving compression): per-dimension min/max ranges from one "
    "posexplode reduction, linear codes floor((x−lo)/(hi−lo)·255), "
    "mid-rise dequantization lo + (code+0.5)·range/256, and the exact "
    "per-dimension reconstruction MSE (squared errors quantized "
    "floor(x·1e12) before the DECIMAL sum) — the measured error "
    "budget that says whether int8 is safe for this corpus' recall "
    "target. Quantize/dequantize are IEEE-identical expressions over "
    "exact ranges; at 100 TB ranges come from a maintained stats "
    "table and the quantize map is a pure column expression.",
)
def q_vec_scalar_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id", F.posexplode("embedding").alias("i0", "xf")
    ).select(
        "vec_id",
        (F.col("i0") + 1).alias("i"),
        F.col("xf").cast("double").alias("x"),
    )
    rng = ex.groupBy("i").agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    code = F.when(F.col("hi") == F.col("lo"), F.lit(0).cast("long")).otherwise(
        F.floor(
            (F.col("x") - F.col("lo")) / (F.col("hi") - F.col("lo")) * 255.0
        ).cast("long")
    )
    q = ex.join(rng, "i").select("i", "x", "lo", "hi", code.alias("code"))
    deq = F.col("lo") + (
        F.least(F.col("code"), F.lit(255)) + 0.5
    ) * (F.col("hi") - F.col("lo")) / 256.0
    err2 = (F.col("x") - deq) * (F.col("x") - deq)
    err = q.groupBy("i").agg(
        F.count("*").alias("n"),
        (
            F.sum(F.floor(err2 * 1e12).cast("decimal(38,0)")).cast("double")
            / 1e12
        ).alias("sse"),
    )
    return err.join(rng, "i").select(
        F.col("i").cast("long").alias("dim"),
        F.round("lo", 6).alias("lo"),
        F.round("hi", 6).alias("hi"),
        F.round(F.col("sse") / F.col("n"), 12).alias("mse"),
    )

@register(
    "q_vec_ood_score",
    oracle=f"""
        WITH ex AS (
            SELECT vec_id, label, u.i AS i, CAST(u.x AS DOUBLE) AS x
            FROM (
                SELECT vec_id, label,
                       unnest(list_transform(embedding,
                              (x, i) -> struct_pack(x := x, i := i))) AS u
                FROM embeddings
            )
        ),
        cent AS (
            SELECT label, i, {_QS.format(x='x')} / COUNT(*) AS c
            FROM ex GROUP BY label, i
        ),
        dist AS (
            SELECT e.vec_id, e.label,
                   {_QS.format(x='(e.x - c.c) * (e.x - c.c)')} AS d2
            FROM ex e JOIN cent c ON c.label = e.label AND c.i = e.i
            GROUP BY e.vec_id, e.label
        ),
        mom AS (
            SELECT label,
                   CAST(COUNT(*) AS DOUBLE) AS n,
                   {_QS.format(x='d2')} AS s1,
                   {_QS.format(x='d2 * d2')} AS s2
            FROM dist GROUP BY label
        )
        SELECT d.vec_id, d.label,
               ROUND(d.d2, 6) AS dist2,
               ROUND((d.d2 - m.s1 / m.n)
                     / sqrt(m.s2 / m.n - (m.s1 / m.n) * (m.s1 / m.n)), 4)
                   AS z,
               (d.d2 - m.s1 / m.n)
               / sqrt(m.s2 / m.n - (m.s1 / m.n) * (m.s1 / m.n)) > 3.0
                   AS is_ood
        FROM dist d JOIN mom m ON m.label = d.label
    """,
    section="V20",
    doc="Out-of-distribution scoring for embedding QA: each vector's "
    "squared distance to its LABEL centroid (quantized-sum exact — "
    "centroid means, per-vector distances, and the per-label distance "
    "moments all go through the floor(x·1e12) DECIMAL device), "
    "z-scored against the label's own distance distribution, flagged "
    "at z > 3 on identical bits. The embedding-hygiene gate that "
    "catches mislabeled or corrupt vectors before they poison "
    "training or skew V6's centroids; labels absent → swap in V6's "
    "learned cells, same shape. Two keyed reductions + one map-side "
    "score pass.",
)
def q_vec_ood_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("i0", "xf")
    ).select(
        "vec_id",
        "label",
        (F.col("i0") + 1).alias("i"),
        F.col("xf").cast("double").alias("x"),
    )

    def qsum(c):
        return (
            F.sum(F.floor(c * 1e12).cast("decimal(38,0)")).cast("double")
            / 1e12
        )

    cent = ex.groupBy("label", "i").agg(
        (qsum(F.col("x")) / F.count("*")).alias("c")
    )
    dist = (
        ex.join(cent, ["label", "i"])
        .groupBy("vec_id", "label")
        .agg(
            qsum((F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))).alias(
                "d2"
            )
        )
    )
    mom = dist.groupBy("label").agg(
        F.count("*").cast("double").alias("n"),
        qsum(F.col("d2")).alias("s1"),
        qsum(F.col("d2") * F.col("d2")).alias("s2"),
    )
    j = dist.join(mom, "label")
    mean = F.col("s1") / F.col("n")
    sd = F.sqrt(F.col("s2") / F.col("n") - mean * mean)
    z = (F.col("d2") - mean) / sd
    return j.select(
        "vec_id",
        "label",
        F.round("d2", 6).alias("dist2"),
        F.round(z, 4).alias("z"),
        (z > 3.0).alias("is_ood"),
    )

# ==== forty-eighth wave (r4) ==================================================


@register(
    "q_vec_matryoshka_recall",
    oracle="""
        WITH sliced AS (
            SELECT d.dim, vec_id, list_slice(embedding, 1, d.dim) AS v
            FROM embeddings, (VALUES (8), (16), (32), (64)) AS d(dim)
        ),
        ranked AS (
            SELECT q.dim, q.vec_id AS query_id, n.vec_id AS neighbor_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.dim, q.vec_id
                       ORDER BY list_cosine_similarity(q.v, n.v) DESC,
                                n.vec_id
                   ) AS rn
            FROM (SELECT * FROM sliced WHERE vec_id < 10) q
            JOIN sliced n ON n.dim = q.dim AND n.vec_id <> q.vec_id
        ),
        top5 AS (SELECT dim, query_id, neighbor_id FROM ranked WHERE rn <= 5),
        base AS (SELECT query_id, neighbor_id FROM top5 WHERE dim = 64),
        hits AS (
            SELECT t.dim, CAST(COUNT(*) AS BIGINT) AS n_hits
            FROM top5 t JOIN base b
              ON t.query_id = b.query_id AND t.neighbor_id = b.neighbor_id
            GROUP BY t.dim
        )
        SELECT CAST(dim AS INTEGER) AS dim,
               CAST((SELECT COUNT(DISTINCT query_id) FROM base) AS BIGINT)
                   AS n_queries,
               ROUND(n_hits / (5.0 * (SELECT COUNT(DISTINCT query_id)
                                      FROM base)), 4) AS recall_at5
        FROM hits
    """,
    section="V21",
    doc="Matryoshka-style prefix-dimension ANN recall: top-5 cosine "
    "neighbors computed on the first d ∈ {8,16,32,64} coordinates of "
    "each embedding (MRL embeddings are trained so prefixes remain "
    "usable), scored as recall@5 against the full-dimension top-5 — "
    "the measurement that tells you how far you can truncate stored "
    "vectors before retrieval degrades (4x-8x memory/IO reduction at "
    "serving time if recall holds). V3's established parity devices: "
    "ids+rank output shape, sim ties broken by neighbor id, left-to-"
    "right double folds matching list_cosine_similarity. Recall itself "
    "is exact integer counting (hits / 5·queries, one final division). "
    "Scale: queries are broadcast (10 rows x 4 dims); the corpus side "
    "is fanned out and NEVER shuffles — each task scans its corpus "
    "slice once per dim against the broadcast probes; the per-dim "
    "rank window partitions by (dim, query) = 40 small groups after a "
    "candidates-only shuffle of (dim, query, neighbor, sim) rows.",
)
def q_vec_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import fan_out

    emb = load_table(spark, sf_dir, "embeddings")
    dims = F.explode(F.array(*[F.lit(d) for d in (8, 16, 32, 64)])).alias("dim")
    sliced_q = (
        emb.filter(F.col("vec_id") < 10)
        .select(F.col("vec_id").alias("query_id"), "embedding")
        .select("query_id", dims, "embedding")
        .select(
            "dim",
            "query_id",
            F.slice("embedding", F.lit(1), F.col("dim")).alias("qv"),
        )
    )
    sliced_n = fan_out(
        emb.select(F.col("vec_id").alias("neighbor_id"), "embedding")
    ).select(
        F.explode(F.array(*[F.lit(d) for d in (8, 16, 32, 64)])).alias("dim"),
        "neighbor_id",
        "embedding",
    ).select(
        "dim",
        "neighbor_id",
        F.slice("embedding", F.lit(1), F.col("dim")).alias("nv"),
    )
    sim = _dot("qv", "nv") / (
        F.sqrt(_sq_norm("qv")) * F.sqrt(_sq_norm("nv"))
    )
    w = Window.partitionBy("dim", "query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    sliced_n = sliced_n.withColumnRenamed("dim", "ndim")
    top5 = (
        F.broadcast(sliced_q)
        .join(
            sliced_n,
            (F.col("dim") == F.col("ndim"))
            & (F.col("neighbor_id") != F.col("query_id")),
        )
        .withColumn("sim", sim)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("dim", "query_id", "neighbor_id")
    )
    base = top5.filter(F.col("dim") == 64).select(
        F.col("query_id").alias("bq"), F.col("neighbor_id").alias("bn")
    )
    nq = base.agg(
        F.countDistinct("bq").cast("bigint").alias("n_queries")
    )
    hits = (
        top5.join(
            base,
            (F.col("query_id") == F.col("bq"))
            & (F.col("neighbor_id") == F.col("bn")),
        )
        .groupBy("dim")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hits"))
    )
    return (
        hits.crossJoin(F.broadcast(nq))
        .select(
            F.col("dim").cast("int").alias("dim"),
            "n_queries",
            F.round(
                F.col("n_hits") / (5.0 * F.col("n_queries")), 4
            ).alias("recall_at5"),
        )
    )

@register(
    "q_vec_binary_quantize_recall",
    oracle="""
        WITH words AS (
            SELECT vec_id, embedding,
                   CAST(list_sum(list_transform(
                       list_slice(embedding, 1, 32),
                       (x, i) -> CASE WHEN x > 0
                                      THEN CAST(1 AS BIGINT) << (i - 1)
                                      ELSE 0 END)) AS BIGINT) AS w_lo,
                   CAST(list_sum(list_transform(
                       list_slice(embedding, 33, 64),
                       (x, i) -> CASE WHEN x > 0
                                      THEN CAST(1 AS BIGINT) << (i - 1)
                                      ELSE 0 END)) AS BIGINT) AS w_hi
            FROM embeddings
        ),
        ham5 AS (
            SELECT query_id, neighbor_id FROM (
                SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY bit_count(xor(q.w_lo, n.w_lo))
                                    + bit_count(xor(q.w_hi, n.w_hi)),
                                    n.vec_id
                       ) AS rn
                FROM (SELECT * FROM words WHERE vec_id < 10) q
                JOIN words n ON n.vec_id <> q.vec_id
            ) WHERE rn <= 5
        ),
        exact5 AS (
            SELECT query_id, neighbor_id FROM (
                SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY list_cosine_similarity(
                                        q.embedding, n.embedding) DESC,
                                    n.vec_id
                       ) AS rn
                FROM (SELECT * FROM words WHERE vec_id < 10) q
                JOIN words n ON n.vec_id <> q.vec_id
            ) WHERE rn <= 5
        )
        SELECT CAST((SELECT COUNT(DISTINCT query_id) FROM exact5) AS BIGINT)
                   AS n_queries,
               ROUND((SELECT COUNT(*) FROM ham5 h JOIN exact5 e
                      ON h.query_id = e.query_id
                     AND h.neighbor_id = e.neighbor_id)
                     / (5.0 * (SELECT COUNT(DISTINCT query_id) FROM exact5)),
                     4) AS recall_at5
    """,
    section="V22",
    doc="Binary (1-bit sign) quantization retrieval quality: each 64-dim "
    "embedding collapses to 64 sign bits packed into two BIGINT words "
    "(exact integer construction — bit i set iff x_i > 0), candidates "
    "ranked by Hamming distance (bit_count of XOR — integer, so the "
    "RANKING KEY carries zero float-parity risk, unlike V21's float "
    "cosine), scored as recall@5 against the exact cosine top-5. This "
    "is the 32x-compression regime modern vector stores ship "
    "(binary quantization + rescoring); together with V21 (prefix "
    "truncation) and V8 (PQ) it completes the quantization-tradeoff "
    "surface. Scale: sign-packing is row-local (2 words/vector "
    "regardless of corpus size — 16 bytes of index per vector); "
    "queries broadcast; the corpus never shuffles; Hamming is two "
    "XOR+POPCNT per candidate — the cheapest possible scan kernel.",
)
def q_vec_binary_quantize_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")

    def word(lo: int):
        return F.expr(
            f"aggregate(zip_with(slice(embedding, {lo}, 32), "
            "sequence(0, 31), "
            "(x, i) -> if(x > cast(0 as float), shiftleft(1L, i), 0L)), "
            "0L, (acc, v) -> acc + v)"
        )

    words = emb.select(
        "vec_id",
        "embedding",
        word(1).alias("w_lo"),
        word(33).alias("w_hi"),
    )
    q = F.broadcast(
        words.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("w_lo").alias("q_lo"),
            F.col("w_hi").alias("q_hi"),
        )
    )
    from ai_to_cvent_etl_spark.queries._util import fan_out

    n = fan_out(
        words.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("n_emb"),
            F.col("w_lo").alias("n_lo"),
            F.col("w_hi").alias("n_hi"),
        )
    )
    joined = q.join(n, F.col("neighbor_id") != F.col("query_id"))
    ham = F.bit_count(
        F.col("q_lo").bitwiseXOR(F.col("n_lo"))
    ) + F.bit_count(F.col("q_hi").bitwiseXOR(F.col("n_hi")))
    wh = Window.partitionBy("query_id").orderBy(
        F.col("hamd").asc(), F.col("neighbor_id").asc()
    )
    ham5 = (
        joined.withColumn("hamd", ham)
        .withColumn("rn", F.row_number().over(wh))
        .filter(F.col("rn") <= 5)
        .select("query_id", "neighbor_id")
    )
    cos = _dot("q_emb", "n_emb") / (
        F.sqrt(_sq_norm("q_emb")) * F.sqrt(_sq_norm("n_emb"))
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    exact5 = (
        joined.withColumn("sim", cos)
        .withColumn("rn", F.row_number().over(wc))
        .filter(F.col("rn") <= 5)
        .select(
            F.col("query_id").alias("eq"), F.col("neighbor_id").alias("en")
        )
    )
    nq = exact5.agg(F.countDistinct("eq").cast("bigint").alias("n_queries"))
    hits = ham5.join(
        exact5,
        (F.col("query_id") == F.col("eq"))
        & (F.col("neighbor_id") == F.col("en")),
    ).agg(F.count(F.lit(1)).alias("n_hits"))
    return (
        nq.crossJoin(hits)
        .select(
            "n_queries",
            F.round(
                F.col("n_hits") / (5.0 * F.col("n_queries")), 4
            ).alias("recall_at5"),
        )
    )

@register(
    "q_vec_rerank_recall",
    oracle="""
        WITH words AS (
            SELECT vec_id, embedding,
                   CAST(list_sum(list_transform(
                       list_slice(embedding, 1, 32),
                       (x, i) -> CASE WHEN x > 0
                                      THEN CAST(1 AS BIGINT) << (i - 1)
                                      ELSE 0 END)) AS BIGINT) AS w_lo,
                   CAST(list_sum(list_transform(
                       list_slice(embedding, 33, 64),
                       (x, i) -> CASE WHEN x > 0
                                      THEN CAST(1 AS BIGINT) << (i - 1)
                                      ELSE 0 END)) AS BIGINT) AS w_hi
            FROM embeddings
        ),
        cand AS (
            SELECT query_id, neighbor_id, q_emb, n_emb FROM (
                SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                       q.embedding AS q_emb, n.embedding AS n_emb,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY bit_count(xor(q.w_lo, n.w_lo))
                                    + bit_count(xor(q.w_hi, n.w_hi)),
                                    n.vec_id
                       ) AS rn
                FROM (SELECT * FROM words WHERE vec_id < 10) q
                JOIN words n ON n.vec_id <> q.vec_id
            ) WHERE rn <= 20
        ),
        rer5 AS (
            SELECT query_id, neighbor_id FROM (
                SELECT query_id, neighbor_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY query_id
                           ORDER BY list_cosine_similarity(q_emb, n_emb)
                                    DESC, neighbor_id
                       ) AS rn
                FROM cand
            ) WHERE rn <= 5
        ),
        exact5 AS (
            SELECT query_id, neighbor_id FROM (
                SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY list_cosine_similarity(
                                        q.embedding, n.embedding) DESC,
                                    n.vec_id
                       ) AS rn
                FROM (SELECT * FROM words WHERE vec_id < 10) q
                JOIN words n ON n.vec_id <> q.vec_id
            ) WHERE rn <= 5
        )
        SELECT CAST((SELECT COUNT(DISTINCT query_id) FROM exact5) AS BIGINT)
                   AS n_queries,
               ROUND((SELECT COUNT(*) FROM rer5 h JOIN exact5 e
                      ON h.query_id = e.query_id
                     AND h.neighbor_id = e.neighbor_id)
                     / (5.0 * (SELECT COUNT(DISTINCT query_id) FROM exact5)),
                     4) AS recall_at5
    """,
    section="V23",
    doc="Two-stage retrieval — binary-Hamming shortlist (k=20 from the "
    "V22 sign-bit words, integer ranking) then EXACT cosine rerank of "
    "the 20 candidates, scored as recall@5 vs full exact search. This "
    "is the production serving pattern every vector store ships "
    "(cheap quantized prefilter + float rescoring of a tiny "
    "candidate set): V22 measures what 1-bit search alone loses, this "
    "measures what rescoring buys back — measured at sf0.1: 0.08 "
    "(binary alone) -> 0.30 (rerank@20) at ~1/100th of the float "
    "work. The absolute numbers are a WORST CASE: the fixture vectors "
    "are isotropic random noise, where sign bits carry minimal "
    "information; real trained embeddings are anisotropic and "
    "binary+rerank typically lands near exact recall — the operator "
    "measures exactly this corpus-dependent tradeoff, which is the "
    "point. Scale: "
    "stage 1 scans two BIGINT words per corpus vector (queries "
    "broadcast, corpus never shuffles); stage 2 touches only "
    "20 x |queries| float vectors — the expensive kernel runs on a "
    "candidate set INDEPENDENT of corpus size.",
)
def q_vec_rerank_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")

    def word(lo: int):
        return F.expr(
            f"aggregate(zip_with(slice(embedding, {lo}, 32), "
            "sequence(0, 31), "
            "(x, i) -> if(x > cast(0 as float), shiftleft(1L, i), 0L)), "
            "0L, (acc, v) -> acc + v)"
        )

    words = emb.select(
        "vec_id", "embedding", word(1).alias("w_lo"), word(33).alias("w_hi")
    )
    q = F.broadcast(
        words.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("w_lo").alias("q_lo"),
            F.col("w_hi").alias("q_hi"),
        )
    )
    from ai_to_cvent_etl_spark.queries._util import fan_out

    n = fan_out(
        words.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("n_emb"),
            F.col("w_lo").alias("n_lo"),
            F.col("w_hi").alias("n_hi"),
        )
    )
    joined = q.join(n, F.col("neighbor_id") != F.col("query_id"))
    ham = F.bit_count(
        F.col("q_lo").bitwiseXOR(F.col("n_lo"))
    ) + F.bit_count(F.col("q_hi").bitwiseXOR(F.col("n_hi")))
    wh = Window.partitionBy("query_id").orderBy(
        F.col("hamd").asc(), F.col("neighbor_id").asc()
    )
    cand = (
        joined.withColumn("hamd", ham)
        .withColumn("rn", F.row_number().over(wh))
        .filter(F.col("rn") <= 20)
        .select("query_id", "neighbor_id", "q_emb", "n_emb")
    )
    cos = _dot("q_emb", "n_emb") / (
        F.sqrt(_sq_norm("q_emb")) * F.sqrt(_sq_norm("n_emb"))
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    rer5 = (
        cand.withColumn("sim", cos)
        .withColumn("rn", F.row_number().over(wc))
        .filter(F.col("rn") <= 5)
        .select("query_id", "neighbor_id")
    )
    exact5 = (
        joined.withColumn("sim", cos)
        .withColumn("rn", F.row_number().over(wc))
        .filter(F.col("rn") <= 5)
        .select(
            F.col("query_id").alias("eq"), F.col("neighbor_id").alias("en")
        )
    )
    nq = exact5.agg(F.countDistinct("eq").cast("bigint").alias("n_queries"))
    hits = rer5.join(
        exact5,
        (F.col("query_id") == F.col("eq"))
        & (F.col("neighbor_id") == F.col("en")),
    ).agg(F.count(F.lit(1)).alias("n_hits"))
    return nq.crossJoin(hits).select(
        "n_queries",
        F.round(F.col("n_hits") / (5.0 * F.col("n_queries")), 4).alias(
            "recall_at5"
        ),
    )

@register(
    "q_vec_mmr_diverse",
    oracle=f"""
        WITH q AS MATERIALIZED (
            SELECT embedding FROM embeddings WHERE vec_id = {_MMR_QUERY_ID}
        ),
        ranked AS MATERIALIZED (
            SELECT e.vec_id, e.embedding,
                   CAST(floor(list_cosine_similarity(
                        e.embedding, q.embedding) * 1e6) AS BIGINT) AS relq
            FROM embeddings e CROSS JOIN q
            WHERE e.vec_id <> {_MMR_QUERY_ID}
        ),
        cands AS MATERIALIZED (
            SELECT vec_id, embedding, relq FROM (
                SELECT *, row_number() OVER (
                    ORDER BY relq DESC, vec_id) AS rn
                FROM ranked
            ) WHERE rn <= {_MMR_POOL}
        ),
        sims AS MATERIALIZED (
            SELECT a.vec_id AS a, b.vec_id AS b,
                   CAST(floor(list_cosine_similarity(
                        a.embedding, b.embedding) * 1e6) AS BIGINT) AS simq
            FROM cands a JOIN cands b ON a.vec_id <> b.vec_id
        ),
        {{sel}}
        SELECT * FROM (
            {" UNION ALL ".join(
                f"SELECT CAST({r} AS BIGINT) AS pick_rank, vec_id FROM sel{r}"
                for r in range(1, _MMR_K + 1)
            )}
        )
    """.replace("{sel}", _mmr_sel_ctes()),
    section="V24",
    doc="Maximal Marginal Relevance re-ranking: from the top-20 cosine "
    "candidates for one query vector, greedily pick 5 maximizing "
    "0.7*relevance - 0.3*max-similarity-to-already-picked — the "
    "diversity-aware serving layer over V3's raw top-k (RAG context "
    "assembly, dedup'd search results). Determinism device: both "
    "relevance and pairwise sims are quantized floor(cos*1e6) to "
    "BIGINT, and the lambda mix is scaled x10 so every greedy "
    "comparison is the EXACT integer 7*relq - 3*msimq with a vec_id "
    "tie-break — the unrolled selection is bit-reproducible (only "
    "the floor boundary carries the last-ulp tail risk shared with "
    "V3, SURVEY 5.3). Scale: relevance scan is one broadcast-query "
    "map pass; the greedy runs on the 20-row pool (broadcast-size "
    "by construction) — pool size, not corpus size, bounds the "
    "unrolled joins; the corpus never shuffles.",
)
def q_vec_mmr_diverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == _MMR_QUERY_ID).select(
        F.col("embedding").alias("q_emb")
    )
    ranked = (
        emb.where(F.col("vec_id") != _MMR_QUERY_ID)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "embedding",
            F.floor(
                _dot("embedding", "q_emb")
                / (F.sqrt(_sq_norm("embedding")) * F.sqrt(_sq_norm("q_emb")))
                * 1e6
            ).cast("bigint").alias("relq"),
        )
    )
    wr = Window.orderBy(F.col("relq").desc(), F.col("vec_id"))
    # The greedy unroll below references the pool once per (pick, candidate)
    # pair, so without a lineage cut Catalyst re-plans the full-corpus scan +
    # window O(K^2) times (measured 10.5 s warm at sf0.1). localCheckpoint
    # materializes the <=20-row pool once; everything downstream is
    # pool-sized (same device as operators/dedup.py label-prop rounds).
    cands = (
        ranked.withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") <= _MMR_POOL)
        .select("vec_id", "embedding", "relq")
        .localCheckpoint()
    )
    ca = cands.select(
        F.col("vec_id").alias("a"), F.col("embedding").alias("ea")
    )
    cb = cands.select(
        F.col("vec_id").alias("b"), F.col("embedding").alias("eb")
    )
    sims = (
        ca.crossJoin(cb)
        .where(F.col("a") != F.col("b"))
        .select(
            "a",
            "b",
            F.floor(
                _dot("ea", "eb")
                / (F.sqrt(_sq_norm("ea")) * F.sqrt(_sq_norm("eb")))
                * 1e6
            ).cast("bigint").alias("simq"),
        )
    )
    pool = cands.select("vec_id", "relq")
    # Each 1-row pick is checkpointed too: pick r's plan references picks
    # 1..r-1, so without the cut the unroll is exponential in K (each level
    # re-runs every earlier level's join tree).
    sel = [
        pool.orderBy(F.col("relq").desc(), "vec_id")
        .limit(1)
        .select("vec_id")
        .localCheckpoint()
    ]
    for _ in range(2, _MMR_K + 1):
        picked = sel[0]
        for s in sel[1:]:
            picked = picked.unionAll(s)
        # r9: picked (<= K rows) and msim (<= pool rows) are bounded by
        # the MMR constants at ANY scale factor, but ride checkpointed
        # stat-less frames, so Catalyst planned sort-merge joins per
        # pick. Broadcast them — safe by construction, and each greedy
        # level loses its exchanges.
        msim = (
            sims.join(
                F.broadcast(picked.withColumnRenamed("vec_id", "b")), "b"
            )
            .groupBy("a")
            .agg(F.max("simq").alias("msimq"))
        )
        scores = (
            pool.join(F.broadcast(picked), "vec_id", "left_anti")
            .join(F.broadcast(msim), pool.vec_id == F.col("a"))
            .select(
                "vec_id",
                (7 * F.col("relq") - 3 * F.col("msimq")).alias("score"),
            )
        )
        sel.append(
            scores.orderBy(F.col("score").desc(), "vec_id")
            .limit(1)
            .select("vec_id")
            .localCheckpoint()
        )
    out = None
    for r, s in enumerate(sel, start=1):
        row = s.select(
            F.lit(r).cast("bigint").alias("pick_rank"), "vec_id"
        )
        out = row if out is None else out.unionAll(row)
    return out

@register(
    "q_vec_cluster_purity",
    oracle="""
        WITH cells AS MATERIALIZED (
            SELECT (CASE WHEN embedding[1] >= 0 THEN 8 ELSE 0 END
                    + CASE WHEN embedding[2] >= 0 THEN 4 ELSE 0 END
                    + CASE WHEN embedding[3] >= 0 THEN 2 ELSE 0 END
                    + CASE WHEN embedding[4] >= 0 THEN 1 ELSE 0 END)
                       AS cell,
                   label
            FROM embeddings
        ),
        joint AS MATERIALIZED (
            SELECT cell, label, CAST(COUNT(*) AS BIGINT) AS n_kl
            FROM cells GROUP BY cell, label
        ),
        mk AS (SELECT cell, CAST(SUM(n_kl) AS BIGINT) AS n_k
               FROM joint GROUP BY cell),
        ml AS (SELECT label, CAST(SUM(n_kl) AS BIGINT) AS n_l
               FROM joint GROUP BY label),
        nn AS (SELECT CAST(SUM(n_kl) AS BIGINT) AS n FROM joint),
        pure AS (
            SELECT CAST(SUM(mx) AS BIGINT) AS agree FROM (
                SELECT cell, MAX(n_kl) AS mx FROM joint GROUP BY cell
            )
        ),
        mi AS (
            SELECT CAST(SUM(CAST(floor(
                       (CAST(j.n_kl AS DOUBLE) / nn.n)
                       * ln(CAST(nn.n AS DOUBLE) * j.n_kl
                            / (CAST(mk.n_k AS DOUBLE) * ml.n_l)) * 1e12)
                       AS DECIMAL(38,0))) AS DOUBLE) / 1e12 AS mi
            FROM joint j
            JOIN mk USING (cell) JOIN ml USING (label) CROSS JOIN nn
        ),
        hc AS (
            SELECT CAST(SUM(CAST(floor(
                       -(CAST(n_k AS DOUBLE) / nn.n)
                       * ln(CAST(n_k AS DOUBLE) / nn.n) * 1e12)
                       AS DECIMAL(38,0))) AS DOUBLE) / 1e12 AS hc
            FROM mk CROSS JOIN nn
        ),
        hl AS (
            SELECT CAST(SUM(CAST(floor(
                       -(CAST(n_l AS DOUBLE) / nn.n)
                       * ln(CAST(n_l AS DOUBLE) / nn.n) * 1e12)
                       AS DECIMAL(38,0))) AS DOUBLE) / 1e12 AS hl
            FROM ml CROSS JOIN nn
        )
        SELECT nn.n,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM mk) AS n_clusters,
               ROUND(CAST(pure.agree AS DOUBLE) / nn.n, 4) AS purity,
               ROUND(mi.mi / sqrt(hc.hc * hl.hl), 4) AS nmi
        FROM nn CROSS JOIN pure CROSS JOIN mi CROSS JOIN hc CROSS JOIN hl
    """,
    section="V25",
    doc="External clustering evaluation (purity + NMI) of the 4-bit "
    "sign-LSH cell assignment against the true labels — the quality "
    "gate for ANY unsupervised index (the same readout evaluates "
    "IVF cells or kmeans partitions; sign-LSH is the deterministic, "
    "iteration-free baseline every learned index must beat). Purity "
    "= exact rational (per-cell max label count / N); NMI = "
    "MI/sqrt(H_C*H_L) with every entropy/MI term computed from "
    "exact integer counts and quantized floor(x*1e12) before the "
    "exact DECIMAL sum (L18 device) — no float aggregation order "
    "anywhere. Scale: the contingency table is (cells x labels) "
    "rows — index-size-bounded, not corpus-bounded; one map-only "
    "sign pass + one keyed count.",
)
def q_vec_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    bit = lambda i, w: F.when(F.col("embedding")[i] >= 0, w).otherwise(0)
    cells = emb.select(
        (bit(0, 8) + bit(1, 4) + bit(2, 2) + bit(3, 1)).alias("cell"),
        "label",
    )
    joint = cells.groupBy("cell", "label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kl")
    )
    mk = joint.groupBy("cell").agg(
        F.sum("n_kl").cast("bigint").alias("n_k")
    )
    ml = joint.groupBy("label").agg(
        F.sum("n_kl").cast("bigint").alias("n_l")
    )
    nn = joint.agg(F.sum("n_kl").cast("bigint").alias("n"))
    pure = (
        joint.groupBy("cell")
        .agg(F.max("n_kl").alias("mx"))
        .agg(F.sum("mx").cast("bigint").alias("agree"))
    )

    def qsum(term):
        return F.sum(
            F.floor(term * 1e12).cast(DecimalType(38, 0))
        ).cast("double") / 1e12

    mi = (
        joint.join(mk, "cell")
        .join(ml, "label")
        .crossJoin(F.broadcast(nn))
        .agg(
            qsum(
                (F.col("n_kl").cast("double") / F.col("n"))
                * F.log(
                    F.col("n").cast("double") * F.col("n_kl")
                    / (F.col("n_k").cast("double") * F.col("n_l"))
                )
            ).alias("mi")
        )
    )
    hc = mk.crossJoin(F.broadcast(nn)).agg(
        qsum(
            -(F.col("n_k").cast("double") / F.col("n"))
            * F.log(F.col("n_k").cast("double") / F.col("n"))
        ).alias("hc")
    )
    hl = ml.crossJoin(F.broadcast(nn)).agg(
        qsum(
            -(F.col("n_l").cast("double") / F.col("n"))
            * F.log(F.col("n_l").cast("double") / F.col("n"))
        ).alias("hl")
    )
    ncl = mk.agg(F.count(F.lit(1)).cast("bigint").alias("n_clusters"))
    return (
        nn.crossJoin(ncl)
        .crossJoin(pure)
        .crossJoin(mi)
        .crossJoin(hc)
        .crossJoin(hl)
        .select(
            "n",
            "n_clusters",
            F.round(F.col("agree").cast("double") / F.col("n"), 4).alias(
                "purity"
            ),
            F.round(
                F.col("mi") / F.sqrt(F.col("hc") * F.col("hl")), 4
            ).alias("nmi"),
        )
    )

@register(
    "q_vec_silhouette",
    oracle=f"""
        WITH seeds AS MATERIALIZED (
            SELECT vec_id AS seed_id,
                   embedding AS s_emb,
                   list_sum(list_transform(embedding,
                        x -> floor(CAST(x AS DOUBLE)
                                   * CAST(x AS DOUBLE) * 1e12))) AS s_n2
            FROM embeddings
            WHERE vec_id IN {_SIL_SEEDS}
        ),
        base AS MATERIALIZED (
            SELECT vec_id, embedding,
                   list_sum(list_transform(embedding,
                        x -> floor(CAST(x AS DOUBLE)
                                   * CAST(x AS DOUBLE) * 1e12))) AS e_n2
            FROM embeddings
        ),
        sims AS (
            SELECT b.vec_id, s.seed_id,
                   list_sum(list_transform(
                        list_zip(b.embedding, s.s_emb),
                        p -> floor(CAST(p[1] AS DOUBLE)
                                   * CAST(p[2] AS DOUBLE) * 1e12)))
                   / sqrt(b.e_n2 * s.s_n2) AS sim
            FROM base b JOIN seeds s ON TRUE
        ),
        ranked AS (
            SELECT vec_id, seed_id, sim,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY sim DESC, seed_id) AS rk
            FROM sims
        ),
        sil AS (
            SELECT a.vec_id, a.seed_id AS cluster_seed,
                   CASE WHEN greatest(1.0 - a.sim, 1.0 - b.sim) > 0
                        THEN ((1.0 - b.sim) - (1.0 - a.sim))
                             / greatest(1.0 - a.sim, 1.0 - b.sim)
                        ELSE 0.0 END AS s
            FROM (SELECT * FROM ranked WHERE rk = 1) a
            JOIN (SELECT * FROM ranked WHERE rk = 2) b USING (vec_id)
        )
        SELECT CAST(cluster_seed AS BIGINT) AS cluster_seed,
               CAST(COUNT(*) AS BIGINT) AS n_members,
               ROUND(CAST(SUM(CAST(floor(s * 1e12) AS DECIMAL(38,0)))
                          AS DOUBLE) / 1e12 / COUNT(*), 4)
                   AS mean_silhouette
        FROM sil GROUP BY cluster_seed
    """,
    section="V26",
    doc="Centroid silhouette score per cluster against 4 fixed seed "
    "vectors: each embedding is assigned to its nearest seed by "
    "cosine (a = 1-sim to best, b = 1-sim to runner-up, "
    "s = (b-a)/max(a,b)); per-cluster n + mean s is the separation "
    "audit run after ANY clustering/IVF build (V13 trains; this "
    "scores) — low mean s flags clusters to re-train before they "
    "poison IVF routing. Exactness device: dot products and squared "
    "norms are per-term floor(x*y*1e12) folds — integer-valued "
    "doubles < 2^53, so the sums are EXACT and order-free on both "
    "engines without decimal casts; every downstream sim/s value is "
    "then bit-identical IEEE arithmetic, and the mean uses the "
    "quantized DECIMAL fold (rule 10). Scale: seeds broadcast, corpus "
    "never shuffles (V3's shape); one 16-byte-key agg for the means.",
)
def q_vec_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import fan_out

    emb = load_table(spark, sf_dir, "embeddings")

    def _n2(col: str):
        return F.aggregate(
            F.transform(
                F.col(col),
                lambda x: F.floor(
                    x.cast("double") * x.cast("double") * F.lit(1e12)
                ).cast("double"),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    seeds = (
        emb.filter(F.col("vec_id").isin(*_SIL_SEEDS))
        .select(
            F.col("vec_id").alias("seed_id"),
            F.col("embedding").alias("s_emb"),
        )
        .withColumn("s_n2", _n2("s_emb"))
    )
    base = fan_out(
        emb.select("vec_id", "embedding").withColumn("e_n2", _n2("embedding"))
    )
    dotq = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("s_emb"),
            lambda x, y: F.floor(
                x.cast("double") * y.cast("double") * F.lit(1e12)
            ).cast("double"),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    sims = base.join(F.broadcast(seeds), F.lit(True)).select(
        "vec_id",
        "seed_id",
        (dotq / F.sqrt(F.col("e_n2") * F.col("s_n2"))).alias("sim"),
    )
    rk = F.row_number().over(
        Window.partitionBy("vec_id").orderBy(
            F.desc("sim"), F.asc("seed_id")
        )
    )
    ranked = sims.withColumn("rk", rk)
    a = ranked.where(F.col("rk") == 1).select(
        "vec_id",
        F.col("seed_id").alias("cluster_seed"),
        (1.0 - F.col("sim")).alias("da"),
    )
    b = ranked.where(F.col("rk") == 2).select(
        "vec_id", (1.0 - F.col("sim")).alias("db")
    )
    sil = a.join(b, "vec_id").select(
        "cluster_seed",
        F.when(
            F.greatest("da", "db") > 0,
            (F.col("db") - F.col("da")) / F.greatest("da", "db"),
        )
        .otherwise(0.0)
        .alias("s"),
    )
    return sil.groupBy(
        F.col("cluster_seed").cast("bigint").alias("cluster_seed")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.round(
            F.sum(
                F.floor(F.col("s") * 1e12).cast("decimal(38,0)")
            ).cast("double")
            / 1e12
            / F.count(F.lit(1)),
            4,
        ).alias("mean_silhouette"),
    )

@register(
    "q_vec_davies_bouldin",
    oracle=f"""
        WITH seeds AS MATERIALIZED (
            SELECT vec_id AS seed_id,
                   embedding AS s_emb,
                   list_sum(list_transform(embedding,
                        x -> floor(CAST(x AS DOUBLE)
                                   * CAST(x AS DOUBLE) * 1e12))) AS s_n2
            FROM embeddings
            WHERE vec_id IN {_SIL_SEEDS}
        ),
        base AS MATERIALIZED (
            SELECT vec_id, embedding,
                   list_sum(list_transform(embedding,
                        x -> floor(CAST(x AS DOUBLE)
                                   * CAST(x AS DOUBLE) * 1e12))) AS e_n2
            FROM embeddings
        ),
        sims AS (
            SELECT b.vec_id, s.seed_id,
                   list_sum(list_transform(
                        list_zip(b.embedding, s.s_emb),
                        p -> floor(CAST(p[1] AS DOUBLE)
                                   * CAST(p[2] AS DOUBLE) * 1e12)))
                   / sqrt(b.e_n2 * s.s_n2) AS sim
            FROM base b JOIN seeds s ON TRUE
        ),
        assigned AS (
            SELECT vec_id, seed_id, 1.0 - sim AS dist FROM (
                SELECT vec_id, seed_id, sim,
                       ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY sim DESC, seed_id) AS rk
                FROM sims
            ) WHERE rk = 1
        ),
        scatter AS (
            SELECT seed_id,
                   CAST(COUNT(*) AS BIGINT) AS n_members,
                   CAST(SUM(CAST(floor(dist * 1e12) AS DECIMAL(38,0)))
                        AS DOUBLE) / 1e12 / COUNT(*) AS s
            FROM assigned GROUP BY seed_id
        ),
        seed_dist AS (
            SELECT a.seed_id AS i, b.seed_id AS j,
                   1.0 - list_sum(list_transform(
                        list_zip(a.s_emb, b.s_emb),
                        p -> floor(CAST(p[1] AS DOUBLE)
                                   * CAST(p[2] AS DOUBLE) * 1e12)))
                   / sqrt(a.s_n2 * b.s_n2) AS m
            FROM seeds a JOIN seeds b ON a.seed_id <> b.seed_id
        )
        SELECT CAST(si.seed_id AS BIGINT) AS cluster_seed,
               si.n_members,
               ROUND(si.s, 6) AS s_scatter,
               ROUND(MAX((si.s + sj.s) / sd.m), 4) AS db_component
        FROM scatter si
        JOIN seed_dist sd ON sd.i = si.seed_id
        JOIN scatter sj ON sj.seed_id = sd.j
        GROUP BY si.seed_id, si.n_members, si.s
    """,
    section="V27",
    doc="Davies-Bouldin separation index per cluster against the V26 "
    "fixed seeds: worst-case (S_i+S_j)/M_ij ratio over the other "
    "clusters, where S is the quantized-mean member distance to the "
    "assigned seed and M the seed-seed cosine distance — the "
    "clustering quality number that PENALIZES close centroids, "
    "complementing the silhouette's per-point view (V26 says how "
    "well points fit; DB says which CLUSTER PAIR to merge or "
    "re-split before an IVF build). Shares V26's exactness device "
    "(per-term floor folds -> bit-identical sims; quantized DECIMAL "
    "scatter means), so the max-ratio argmax is deterministic. "
    "Scale: corpus touched once (broadcast seeds, no shuffle of "
    "payloads); everything after the member collapse is k^2 = 16 "
    "rows of arithmetic.",
)
def q_vec_davies_bouldin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import fan_out

    emb = load_table(spark, sf_dir, "embeddings")

    def _n2(col: str):
        return F.aggregate(
            F.transform(
                F.col(col),
                lambda x: F.floor(
                    x.cast("double") * x.cast("double") * F.lit(1e12)
                ).cast("double"),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    def _dotq(a: str, b: str):
        return F.aggregate(
            F.zip_with(
                F.col(a),
                F.col(b),
                lambda x, y: F.floor(
                    x.cast("double") * y.cast("double") * F.lit(1e12)
                ).cast("double"),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    seeds = (
        emb.filter(F.col("vec_id").isin(*_SIL_SEEDS))
        .select(
            F.col("vec_id").alias("seed_id"),
            F.col("embedding").alias("s_emb"),
        )
        .withColumn("s_n2", _n2("s_emb"))
    )
    base = fan_out(
        emb.select("vec_id", "embedding").withColumn("e_n2", _n2("embedding"))
    )
    sims = base.join(F.broadcast(seeds), F.lit(True)).select(
        "vec_id",
        "seed_id",
        (
            _dotq("embedding", "s_emb")
            / F.sqrt(F.col("e_n2") * F.col("s_n2"))
        ).alias("sim"),
    )
    rk = F.row_number().over(
        Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("seed_id"))
    )
    assigned = (
        sims.withColumn("rk", rk)
        .where(F.col("rk") == 1)
        .select("vec_id", "seed_id", (1.0 - F.col("sim")).alias("dist"))
    )
    scatter = assigned.groupBy("seed_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        (
            F.sum(
                F.floor(F.col("dist") * 1e12).cast("decimal(38,0)")
            ).cast("double")
            / 1e12
            / F.count(F.lit(1))
        ).alias("s"),
    )
    sa = seeds.select("seed_id", "s_emb", "s_n2")
    sb = sa.select(
        F.col("seed_id").alias("seed_j"),
        F.col("s_emb").alias("j_emb"),
        F.col("s_n2").alias("j_n2"),
    )
    seed_dist = (
        sa.join(sb, F.col("seed_id") != F.col("seed_j"))
        .select(
            F.col("seed_id").alias("i"),
            F.col("seed_j").alias("j"),
            (
                1.0
                - _dotq("s_emb", "j_emb")
                / F.sqrt(F.col("s_n2") * F.col("j_n2"))
            ).alias("m"),
        )
    )
    si = scatter.select(
        F.col("seed_id").alias("i"),
        "n_members",
        F.col("s").alias("s_i"),
    )
    sj = scatter.select(
        F.col("seed_id").alias("j"), F.col("s").alias("s_j")
    )
    return (
        si.join(F.broadcast(seed_dist), "i")
        .join(F.broadcast(sj), "j")
        .groupBy(
            F.col("i").cast("bigint").alias("cluster_seed"),
            "n_members",
            "s_i",
        )
        .agg(
            F.round(
                F.max((F.col("s_i") + F.col("s_j")) / F.col("m")), 4
            ).alias("db_component")
        )
        .select(
            "cluster_seed",
            "n_members",
            F.round("s_i", 6).alias("s_scatter"),
            "db_component",
        )
    )

@register(
    "q_vec_mutual_knn",
    oracle=f"""
        WITH base AS MATERIALIZED (
            SELECT vec_id, embedding,
                   list_sum(list_transform(embedding,
                        x -> floor(CAST(x AS DOUBLE)
                                   * CAST(x AS DOUBLE) * 1e12))) AS n2
            FROM embeddings WHERE vec_id < {_MKNN_CAP}
        ),
        sims AS (
            SELECT a.vec_id AS u, b.vec_id AS v,
                   list_sum(list_transform(
                        list_zip(a.embedding, b.embedding),
                        p -> floor(CAST(p[1] AS DOUBLE)
                                   * CAST(p[2] AS DOUBLE) * 1e12)))
                   / sqrt(a.n2 * b.n2) AS sim
            FROM base a JOIN base b ON a.vec_id <> b.vec_id
        ),
        topk AS (
            SELECT u, v FROM (
                SELECT u, v,
                       ROW_NUMBER() OVER (PARTITION BY u
                                          ORDER BY sim DESC, v) AS rk
                FROM sims
            ) WHERE rk <= {_MKNN_K}
        ),
        mutual AS (
            SELECT a.u, a.v FROM topk a
            JOIN topk b ON a.u = b.v AND a.v = b.u
        ),
        deg AS (
            SELECT n.vec_id,
                   CAST(COUNT(m.v) AS BIGINT) AS d
            FROM base n LEFT JOIN mutual m ON m.u = n.vec_id
            GROUP BY n.vec_id
        )
        SELECT d AS mutual_degree,
               CAST(COUNT(*) AS BIGINT) AS n_nodes
        FROM deg GROUP BY d
    """,
    section="V28",
    doc=f"Mutual-kNN graph degree histogram (k={_MKNN_K}, corpus slice "
    f"vec_id < {_MKNN_CAP}): an edge survives only if BOTH endpoints "
    "rank each other top-k — the symmetrization every kNN-graph "
    "clustering / UMAP-style pipeline applies, because one-way "
    "nearest edges from hubs create false bridges. The degree "
    "histogram is the graph's health readout: a fat degree-0 bucket "
    "means the corpus is hub-dominated and k must rise before "
    "community detection. Exactness: V26's per-term floor dot fold "
    "makes every sim bit-identical cross-engine, so ranks and the "
    "mutual intersection are deterministic. Scale: the exact "
    "all-pairs build is capped to the slice; the full-corpus path is "
    "the LSH/IVF blocked candidate generation (D7/V6) feeding the "
    "SAME mutual filter — only candidate pairs, never n^2, shuffle.",
)
def q_vec_mutual_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import fan_out

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < _MKNN_CAP
    )

    def _n2(col: str):
        return F.aggregate(
            F.transform(
                F.col(col),
                lambda x: F.floor(
                    x.cast("double") * x.cast("double") * F.lit(1e12)
                ).cast("double"),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    base = emb.select("vec_id", "embedding").withColumn(
        "n2", _n2("embedding")
    )
    a = fan_out(
        base.select(
            F.col("vec_id").alias("u"),
            F.col("embedding").alias("a_emb"),
            F.col("n2").alias("a_n2"),
        )
    )
    b = base.select(
        F.col("vec_id").alias("v"),
        F.col("embedding").alias("b_emb"),
        F.col("n2").alias("b_n2"),
    )
    dotq = F.aggregate(
        F.zip_with(
            F.col("a_emb"),
            F.col("b_emb"),
            lambda x, y: F.floor(
                x.cast("double") * y.cast("double") * F.lit(1e12)
            ).cast("double"),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    sims = a.join(F.broadcast(b), F.col("u") != F.col("v")).select(
        "u",
        "v",
        (dotq / F.sqrt(F.col("a_n2") * F.col("b_n2"))).alias("sim"),
    )
    rk = F.row_number().over(
        Window.partitionBy("u").orderBy(F.desc("sim"), F.asc("v"))
    )
    topk = (
        sims.withColumn("rk", rk).where(F.col("rk") <= _MKNN_K)
        .select("u", "v")
    )
    rev = topk.select(F.col("v").alias("u"), F.col("u").alias("v"))
    mutual = topk.intersect(rev)
    deg = (
        base.select(F.col("vec_id").alias("u"))
        .join(mutual, "u", "left")
        .groupBy("u")
        .agg(F.count(F.col("v")).cast("bigint").alias("d"))
    )
    return deg.groupBy(F.col("d").alias("mutual_degree")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes")
    )

@register(
    "q_vec_intrinsic_dim",
    oracle=f"""
        WITH base AS MATERIALIZED (
            SELECT vec_id, embedding,
                   list_sum(list_transform(embedding,
                        x -> floor(CAST(x AS DOUBLE)
                                   * CAST(x AS DOUBLE) * 1e12))) AS n2
            FROM embeddings WHERE vec_id < {_TWONN_CAP}
        ),
        sims AS (
            SELECT a.vec_id AS u, b.vec_id AS v,
                   list_sum(list_transform(
                        list_zip(a.embedding, b.embedding),
                        p -> floor(CAST(p[1] AS DOUBLE)
                                   * CAST(p[2] AS DOUBLE) * 1e12)))
                   / sqrt(a.n2 * b.n2) AS sim
            FROM base a JOIN base b ON a.vec_id <> b.vec_id
        ),
        nn2 AS (
            SELECT u,
                   MAX(CASE WHEN rk = 1 THEN 1.0 - sim END) AS d1,
                   MAX(CASE WHEN rk = 2 THEN 1.0 - sim END) AS d2
            FROM (
                SELECT u, sim,
                       ROW_NUMBER() OVER (PARTITION BY u
                                          ORDER BY sim DESC, v) AS rk
                FROM sims
            ) WHERE rk <= 2
            GROUP BY u
        ),
        terms AS (
            SELECT u, ln(d2 / d1) AS lmu
            FROM nn2 WHERE d1 > 0
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
               ROUND(CAST(SUM(CAST(floor(lmu * 1e9) AS DECIMAL(38,0)))
                          AS DOUBLE) / 1e9 / COUNT(*), 6) AS mean_log_mu,
               ROUND(COUNT(*)
                     / (CAST(SUM(CAST(floor(lmu * 1e9) AS DECIMAL(38,0)))
                             AS DOUBLE) / 1e9), 3) AS intrinsic_dim
        FROM terms
    """,
    section="V30",
    doc="TwoNN intrinsic-dimension estimate (Facco et al. 2017) of the "
    "embedding manifold: id = n / sum(ln(d2/d1)) over each point's "
    "two nearest cosine distances — the diagnostic that tells you "
    "whether 64 ambient dims hide a ~10-dim manifold (then V16's "
    "dim-prune and V21's Matryoshka truncation are safe) or the "
    "data genuinely fills the space (then aggressive PQ will hurt "
    "recall). Distance ratios d2/d1 need NO density assumptions — "
    "only that the manifold is locally uniform between the first "
    "two neighbors. Exactness: V26's quantized-dot sims make "
    "d1/d2 bit-identical; the ln terms fold through the floor-1e9 "
    "DECIMAL device so summation order can't flip the hash "
    "(rule 10; the 4-6dp output rounding absorbs grid-edge ulps). "
    "Scale: capped exact slice here; at corpus scale the estimator "
    "needs only each point's top-2 neighbors — exactly what the "
    "D7/V6 blocked kNN already produces.",
)
def q_vec_intrinsic_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import fan_out

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < _TWONN_CAP
    )

    def _n2(col: str):
        return F.aggregate(
            F.transform(
                F.col(col),
                lambda x: F.floor(
                    x.cast("double") * x.cast("double") * F.lit(1e12)
                ).cast("double"),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    base = emb.select("vec_id", "embedding").withColumn("n2", _n2("embedding"))
    a = fan_out(
        base.select(
            F.col("vec_id").alias("u"),
            F.col("embedding").alias("a_emb"),
            F.col("n2").alias("a_n2"),
        )
    )
    b = base.select(
        F.col("vec_id").alias("v"),
        F.col("embedding").alias("b_emb"),
        F.col("n2").alias("b_n2"),
    )
    dotq = F.aggregate(
        F.zip_with(
            F.col("a_emb"),
            F.col("b_emb"),
            lambda x, y: F.floor(
                x.cast("double") * y.cast("double") * F.lit(1e12)
            ).cast("double"),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    sims = a.join(F.broadcast(b), F.col("u") != F.col("v")).select(
        "u",
        "v",
        (dotq / F.sqrt(F.col("a_n2") * F.col("b_n2"))).alias("sim"),
    )
    rk = F.row_number().over(
        Window.partitionBy("u").orderBy(F.desc("sim"), F.asc("v"))
    )
    nn2 = (
        sims.withColumn("rk", rk)
        .where(F.col("rk") <= 2)
        .groupBy("u")
        .agg(
            F.max(F.when(F.col("rk") == 1, 1.0 - F.col("sim"))).alias("d1"),
            F.max(F.when(F.col("rk") == 2, 1.0 - F.col("sim"))).alias("d2"),
        )
    )
    terms = nn2.where(F.col("d1") > 0).select(
        F.log(F.col("d2") / F.col("d1")).alias("lmu")
    )
    qsum = (
        F.sum(F.floor(F.col("lmu") * 1e9).cast("decimal(38,0)")).cast(
            "double"
        )
        / 1e9
    )
    return terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        F.round(qsum / F.count(F.lit(1)), 6).alias("mean_log_mu"),
        F.round(F.count(F.lit(1)) / qsum, 3).alias("intrinsic_dim"),
    )

@register(
    "q_vec_hubness",
    oracle=f"""
        WITH base AS MATERIALIZED (
            SELECT vec_id, embedding,
                   list_sum(list_transform(embedding,
                        x -> floor(CAST(x AS DOUBLE)
                                   * CAST(x AS DOUBLE) * 1e12))) AS n2
            FROM embeddings WHERE vec_id < {_MKNN_CAP}
        ),
        sims AS (
            SELECT a.vec_id AS u, b.vec_id AS v,
                   list_sum(list_transform(
                        list_zip(a.embedding, b.embedding),
                        p -> floor(CAST(p[1] AS DOUBLE)
                                   * CAST(p[2] AS DOUBLE) * 1e12)))
                   / sqrt(a.n2 * b.n2) AS sim
            FROM base a JOIN base b ON a.vec_id <> b.vec_id
        ),
        topk AS (
            SELECT u, v FROM (
                SELECT u, v,
                       ROW_NUMBER() OVER (PARTITION BY u
                                          ORDER BY sim DESC, v) AS rk
                FROM sims
            ) WHERE rk <= {_HUB_K}
        ),
        indeg AS (
            SELECT b.vec_id,
                   CAST(COUNT(t.u) AS BIGINT) AS k_occ
            FROM base b LEFT JOIN topk t ON t.v = b.vec_id
            GROUP BY b.vec_id
        ),
        m AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(k_occ) AS BIGINT) AS s,
                   CAST(SUM(k_occ * k_occ) AS BIGINT) AS q2,
                   CAST(SUM(k_occ * k_occ * k_occ) AS BIGINT) AS q3,
                   CAST(MAX(k_occ) AS BIGINT) AS max_occ,
                   CAST(SUM(CASE WHEN k_occ = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_antihubs
            FROM indeg
        )
        SELECT n, max_occ, n_antihubs,
               ROUND((CAST(q3 AS DOUBLE) / n
                      - 3.0 * (CAST(s AS DOUBLE) / n)
                        * (CAST(q2 AS DOUBLE) / n)
                      + 2.0 * (CAST(s AS DOUBLE) / n)
                        * (CAST(s AS DOUBLE) / n)
                        * (CAST(s AS DOUBLE) / n))
                     / pow(CAST(q2 AS DOUBLE) / n
                           - (CAST(s AS DOUBLE) / n)
                             * (CAST(s AS DOUBLE) / n), 1.5), 4)
                   AS k_skewness
        FROM m
    """,
    section="V31",
    doc=f"Hubness diagnostic of the directed {_HUB_K}-NN graph: the "
    "k-occurrence distribution (how often each vector appears in "
    "OTHERS' top-k) summarized as max in-degree, anti-hub count "
    "(k_occ=0), and the skewness of k_occ — THE high-dimensionality "
    "pathology metric (Radovanovic et al.): skewness rising with "
    "dimension means a few hub vectors dominate every neighbor "
    "list, silently degrading kNN classification, MMR diversity, "
    "and mutual-kNN graphs (V28 shows the symmetrized aftermath; "
    "this measures the cause). All in-degree moments are exact "
    "integers on the bit-identical ranks of the V26 quantized-dot "
    "device; the population-skewness formula is one IEEE tree "
    "(rule 10). Scale: same capped-slice contract as V28 — at "
    "corpus scale the in-degree histogram falls out of the D7/V6 "
    "blocked kNN's edge list with one 8-byte-key count.",
)
def q_vec_hubness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import fan_out

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < _MKNN_CAP
    )

    def _n2(col: str):
        return F.aggregate(
            F.transform(
                F.col(col),
                lambda x: F.floor(
                    x.cast("double") * x.cast("double") * F.lit(1e12)
                ).cast("double"),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    base = emb.select("vec_id", "embedding").withColumn("n2", _n2("embedding"))
    a = fan_out(
        base.select(
            F.col("vec_id").alias("u"),
            F.col("embedding").alias("a_emb"),
            F.col("n2").alias("a_n2"),
        )
    )
    b = base.select(
        F.col("vec_id").alias("v"),
        F.col("embedding").alias("b_emb"),
        F.col("n2").alias("b_n2"),
    )
    dotq = F.aggregate(
        F.zip_with(
            F.col("a_emb"),
            F.col("b_emb"),
            lambda x, y: F.floor(
                x.cast("double") * y.cast("double") * F.lit(1e12)
            ).cast("double"),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    sims = a.join(F.broadcast(b), F.col("u") != F.col("v")).select(
        "u",
        "v",
        (dotq / F.sqrt(F.col("a_n2") * F.col("b_n2"))).alias("sim"),
    )
    rk = F.row_number().over(
        Window.partitionBy("u").orderBy(F.desc("sim"), F.asc("v"))
    )
    topk = (
        sims.withColumn("rk", rk)
        .where(F.col("rk") <= _HUB_K)
        .select("u", "v")
    )
    indeg = (
        base.select(F.col("vec_id").alias("v"))
        .join(topk, "v", "left")
        .groupBy("v")
        .agg(F.count(F.col("u")).cast("bigint").alias("k_occ"))
    )
    m = indeg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("k_occ").cast("bigint").alias("s"),
        F.sum(F.col("k_occ") * F.col("k_occ")).cast("bigint").alias("q2"),
        F.sum(F.col("k_occ") * F.col("k_occ") * F.col("k_occ"))
        .cast("bigint")
        .alias("q3"),
        F.max("k_occ").cast("bigint").alias("max_occ"),
        F.sum(F.when(F.col("k_occ") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_antihubs"),
    )
    nd = F.col("n")
    mean = F.col("s").cast("double") / nd
    m2 = F.col("q2").cast("double") / nd
    m3 = F.col("q3").cast("double") / nd
    return m.select(
        "n",
        "max_occ",
        "n_antihubs",
        F.round(
            (m3 - 3.0 * mean * m2 + 2.0 * mean * mean * mean)
            / F.pow(m2 - mean * mean, 1.5),
            4,
        ).alias("k_skewness"),
    )

@register(
    "q_vec_pca_explained",
    oracle=(
        """
        WITH ex AS (
            SELECT vec_id, u.i AS i, CAST(u.x AS DOUBLE) AS x
            FROM (
                SELECT vec_id,
                       unnest(list_transform(embedding,
                              (x, i) -> struct_pack(x := x, i := i))) AS u
                FROM embeddings
            )
        ),
        mean AS (
            SELECT i, {qmean} / COUNT(*) AS m FROM ex GROUP BY i
        ),
        cx AS (
            SELECT e.vec_id, e.i, e.x - m.m AS cx
            FROM ex e JOIN mean m ON m.i = e.i
        ),
        nv AS (
            SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n FROM cx
        ),
        trace AS (
            SELECT {qtrace} / (MAX(nv.n) - 1) AS tr
            FROM cx CROSS JOIN nv
        ),
        cov AS (
            SELECT a.i AS i, b.i AS j,
                   {qcov} / (COUNT(*) - 1) AS c
            FROM cx a JOIN cx b ON a.vec_id = b.vec_id
            GROUP BY a.i, b.i
        ),
        v0 AS (
            SELECT DISTINCT i, CAST(0.125 AS DOUBLE) AS x FROM ex
        ),""".format(
            qmean=_QSUM_DUCK.format(x="x"),
            qtrace=_QSUM_DUCK.format(x="cx.cx * cx.cx"),
            qcov=_QSUM_DUCK.format(x="a.cx * b.cx"),
        )
        + ",".join(
            _PCA_IT_DUCK.format(i=i, j=i - 1)
            for i in range(1, _PCA_ROUNDS + 1)
        )
        + f"""
        SELECT ROUND(n.nrm, 4) AS eigenvalue_1,
               ROUND(t.tr, 4) AS trace_total,
               ROUND(ROUND(n.nrm, 4) / t.tr, 6) AS explained_ratio
        FROM nrm{_PCA_ROUNDS} n CROSS JOIN trace t
    """
    ),
    section="V32",
    doc="Explained-variance ratio of the top principal component: "
    "V16's power-iteration eigenvalue divided by the covariance "
    "TRACE (total variance) — the anisotropy number that decides "
    "whether to mean-center/common-direction-remove embeddings "
    "before cosine retrieval (a dominant PC1 means cosine is "
    "mostly measuring the shared direction, the classic 'all "
    "sentence embeddings look alike' failure; V30's intrinsic "
    "dimension asks how many directions matter, this asks how much "
    "ONE direction eats). Reuses V16's bit-identical quantized "
    "iteration verbatim; the trace is ONE flat floor-1e12 DECIMAL "
    "fold over all centered squares (no per-dim float re-fold). "
    "Scale: V16's shape — 64-row relations, broadcast matvecs, one "
    "corpus scan for the outer product.",
)
def q_vec_pca_explained(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id", F.posexplode("embedding").alias("i", "xf")
    ).select(
        "vec_id",
        (F.col("i") + 1).alias("i"),
        F.col("xf").cast("double").alias("x"),
    )
    mean = ex.groupBy("i").agg(
        (_qsum(F.col("x")) / F.count(F.lit(1))).alias("m")
    )
    cx = ex.join(F.broadcast(mean), "i").select(
        "vec_id", "i", (F.col("x") - F.col("m")).alias("cx")
    )
    nv = cx.agg(F.countDistinct("vec_id").cast("bigint").alias("n"))
    trace = cx.crossJoin(F.broadcast(nv)).agg(
        (
            _qsum(F.col("cx") * F.col("cx")) / (F.max("n") - 1)
        ).alias("tr")
    )
    ev = q_vec_pca_power(spark, sf_dir).agg(
        F.max("eigenvalue").alias("eigenvalue_1")
    )
    return ev.crossJoin(F.broadcast(trace)).select(
        "eigenvalue_1",
        F.round("tr", 4).alias("trace_total"),
        F.round(F.col("eigenvalue_1") / F.col("tr"), 6).alias(
            "explained_ratio"
        ),
    )
