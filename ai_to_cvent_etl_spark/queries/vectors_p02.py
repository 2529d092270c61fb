"""Registered queries q_vec_energy_distance..q_vec_index_memory_budget (chunk 2 of 2 split from vectors.py — see vectors_shared.py for shared helpers)."""

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
    _D2_DUCK,
    _DUNN_CAP,
    _HAM_NQ,
    _IMB_DIM,
    _IMB_K,
    _IMB_M,
    _LOF_CAP,
    _LOF_K,
    _MRR_K,
    _MRR_LCM,
    _MRR_NQ,
    _NDCG_DISC,
    _NDCG_K,
    _NDCG_NQ,
    _NDCG_PREFIX,
    _RBO_K,
    _RBO_P,
    _RBO_W_Q12,
    _RRF_K,
    _RRF_Q12,
    _SHAP_K,
    _SH_CAP,
    _SH_K,
    _TWONN_CAP,
    _dot,
    _pack_duck,
    _pack_spark,
    _sq_norm,
)

@register(
    "q_vec_energy_distance",
    oracle="""
        WITH x AS MATERIALIZED (
            SELECT vec_id, embedding FROM embeddings WHERE label = 0
        ),
        y AS MATERIALIZED (
            SELECT vec_id, embedding FROM embeddings WHERE label = 1
        ),
        dxy AS (
            SELECT sqrt(list_sum(list_transform(
                        list_zip(a.embedding, b.embedding),
                        p -> floor((CAST(p[1] AS DOUBLE)
                                    - CAST(p[2] AS DOUBLE))
                                   * (CAST(p[1] AS DOUBLE)
                                      - CAST(p[2] AS DOUBLE))
                                   * 1e12)) ) / 1e12) AS d
            FROM x a JOIN y b ON TRUE
        ),
        dxx AS (
            SELECT sqrt(list_sum(list_transform(
                        list_zip(a.embedding, b.embedding),
                        p -> floor((CAST(p[1] AS DOUBLE)
                                    - CAST(p[2] AS DOUBLE))
                                   * (CAST(p[1] AS DOUBLE)
                                      - CAST(p[2] AS DOUBLE))
                                   * 1e12)) ) / 1e12) AS d
            FROM x a JOIN x b ON a.vec_id < b.vec_id
        ),
        dyy AS (
            SELECT sqrt(list_sum(list_transform(
                        list_zip(a.embedding, b.embedding),
                        p -> floor((CAST(p[1] AS DOUBLE)
                                    - CAST(p[2] AS DOUBLE))
                                   * (CAST(p[1] AS DOUBLE)
                                      - CAST(p[2] AS DOUBLE))
                                   * 1e12)) ) / 1e12) AS d
            FROM y a JOIN y b ON a.vec_id < b.vec_id
        ),
        m AS (
            SELECT
                (SELECT CAST(SUM(CAST(floor(d * 1e9) AS DECIMAL(38,0)))
                             AS DOUBLE) / 1e9 / COUNT(*) FROM dxy) AS exy,
                (SELECT CAST(SUM(CAST(floor(d * 1e9) AS DECIMAL(38,0)))
                             AS DOUBLE) / 1e9 / COUNT(*) FROM dxx) AS exx,
                (SELECT CAST(SUM(CAST(floor(d * 1e9) AS DECIMAL(38,0)))
                             AS DOUBLE) / 1e9 / COUNT(*) FROM dyy) AS eyy,
                (SELECT CAST(COUNT(*) AS BIGINT) FROM x) AS nx,
                (SELECT CAST(COUNT(*) AS BIGINT) FROM y) AS ny
        )
        SELECT nx, ny,
               ROUND(exy, 6) AS mean_cross_dist,
               ROUND(2 * exy - exx - eyy, 6) AS energy_distance
        FROM m
    """,
    section="V33",
    doc="Energy distance between the label-0 and label-1 embedding "
    "clouds: 2*E|X-Y| - E|X-X'| - E|Y-Y'| over Euclidean distances "
    "— the MULTIVARIATE two-sample test (zero iff the distributions "
    "are identical) that certifies what V11's per-dimension moment "
    "drift can only screen: two clouds can match every marginal "
    "moment and still differ jointly, and embedding-distribution "
    "shift between training snapshots is exactly such a joint "
    "property. Exactness: squared-difference terms go through the "
    "per-term floor-1e12 fold (exact integer-valued sums), sqrt on "
    "bit-identical input is IEEE-exact, and the three distance "
    "means fold through floor-1e9 DECIMAL sums (rule 10). Within-"
    "group means use the vec_id < vec_id pair convention on both "
    "engines. Scale: the slices are label-partition-bounded; at "
    "corpus scale sample a fixed per-label reservoir (E9's hash "
    "rule) — the statistic needs only thousands of pairs.",
)
def q_vec_energy_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import fan_out

    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.filter(F.col("label") == 0).select("vec_id", "embedding")
    y = emb.filter(F.col("label") == 1).select("vec_id", "embedding")

    def _dist(a_emb: str, b_emb: str):
        return F.sqrt(
            F.aggregate(
                F.zip_with(
                    F.col(a_emb),
                    F.col(b_emb),
                    lambda p, q: F.floor(
                        (p.cast("double") - q.cast("double"))
                        * (p.cast("double") - q.cast("double"))
                        * F.lit(1e12)
                    ).cast("double"),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            / F.lit(1e12)
        )

    def _qmean(df):
        return df.agg(
            (
                F.sum(
                    F.floor(F.col("d") * 1e9).cast("decimal(38,0)")
                ).cast("double")
                / 1e9
                / F.count(F.lit(1))
            ).alias("m")
        )

    xa = fan_out(
        x.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("ea"))
    )
    yb = y.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("eb"))
    dxy = xa.join(F.broadcast(yb), F.lit(True)).select(
        _dist("ea", "eb").alias("d")
    )
    xb = x.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("eb"))
    dxx = xa.join(
        F.broadcast(xb), F.col("ia") < F.col("ib")
    ).select(_dist("ea", "eb").alias("d"))
    ya = fan_out(
        y.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("ea"))
    )
    dyy = ya.join(
        F.broadcast(yb), F.col("ia") < F.col("ib")
    ).select(_dist("ea", "eb").alias("d"))
    exy = _qmean(dxy).select(F.col("m").alias("exy"))
    exx = _qmean(dxx).select(F.col("m").alias("exx"))
    eyy = _qmean(dyy).select(F.col("m").alias("eyy"))
    nx = x.agg(F.count(F.lit(1)).cast("bigint").alias("nx"))
    ny = y.agg(F.count(F.lit(1)).cast("bigint").alias("ny"))
    return (
        nx.crossJoin(ny)
        .crossJoin(exy)
        .crossJoin(exx)
        .crossJoin(eyy)
        .select(
            "nx",
            "ny",
            F.round("exy", 6).alias("mean_cross_dist"),
            F.round(
                2 * F.col("exy") - F.col("exx") - F.col("eyy"), 6
            ).alias("energy_distance"),
        )
    )

@register(
    "q_vec_centroid_margin",
    oracle="""
        WITH ex AS MATERIALIZED (
            SELECT vec_id, label, u.i AS i, CAST(u.x AS DOUBLE) AS x
            FROM (
                SELECT vec_id, label,
                       unnest(list_transform(embedding,
                              (x, i) -> struct_pack(x := x, i := i))) AS u
                FROM embeddings
            )
        ),
        cent AS MATERIALIZED (
            SELECT label AS clabel, i,
                   CAST(SUM(CAST(floor(x * 1e12) AS DECIMAL(38,0)))
                        AS DOUBLE) / 1e12 / COUNT(*) AS c
            FROM ex GROUP BY label, i
        ),
        cn AS (
            SELECT clabel,
                   CAST(SUM(CAST(floor(c * c * 1e12) AS DECIMAL(38,0)))
                        AS DOUBLE) / 1e12 AS cn2
            FROM cent GROUP BY clabel
        ),
        vn AS (
            SELECT vec_id,
                   CAST(SUM(CAST(floor(x * x * 1e12) AS DECIMAL(38,0)))
                        AS DOUBLE) / 1e12 AS n2
            FROM ex GROUP BY vec_id
        ),
        sims AS (
            SELECT e.vec_id, e.label, c.clabel,
                   CAST(SUM(CAST(floor(e.x * c.c * 1e12)
                                 AS DECIMAL(38,0))) AS DOUBLE) / 1e12
                   / sqrt(v.n2 * n.cn2) AS sim
            FROM ex e
            JOIN cent c ON c.i = e.i
            JOIN vn v ON v.vec_id = e.vec_id
            JOIN cn n ON n.clabel = c.clabel
            GROUP BY e.vec_id, e.label, c.clabel, v.n2, n.cn2
        ),
        margin AS (
            SELECT vec_id, label,
                   MAX(CASE WHEN clabel = label THEN sim END)
                   - MAX(CASE WHEN clabel <> label THEN sim END) AS m
            FROM sims GROUP BY vec_id, label
        )
        SELECT CAST(label AS INTEGER) AS label,
               CAST(COUNT(*) AS BIGINT) AS n_vectors,
               ROUND(CAST(SUM(CAST(floor(m * 1e9) AS DECIMAL(38,0)))
                          AS DOUBLE) / 1e9 / COUNT(*), 4) AS mean_margin,
               CAST(SUM(CASE WHEN m < 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_negative_margin
        FROM margin GROUP BY label
    """,
    section="V34",
    doc="Supervised class-separability margin: per vector, cosine to "
    "its OWN label centroid minus the best rival centroid cosine, "
    "aggregated per label (mean margin + count of negative-margin "
    "vectors) — the label-aware audit V26's silhouette can't give "
    "(silhouette scores geometric clusters; this scores whether the "
    "LABELS are geometrically recoverable, and a label with fat "
    "negative-margin mass either has noisy annotations or needs a "
    "nonlinear probe — run BEFORE trusting V15's kNN eval). "
    "Exactness: centroids are quantized per-dim means, every dot/"
    "norm is a floor-1e12 DECIMAL fold over the relational "
    "(dim-keyed) product, margins fold at 1e9 (rule 10 throughout) "
    "— bit-identical cross-engine including the rival argmax. "
    "Scale: the only big table is (vec x dim x label) products, "
    "dim-keyed and label-bounded; centroids broadcast.",
)
def q_vec_centroid_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("i", "xf")
    ).select(
        "vec_id",
        "label",
        (F.col("i") + 1).alias("i"),
        F.col("xf").cast("double").alias("x"),
    )

    def _q12(c):
        return (
            F.sum(F.floor(c * 1e12).cast("decimal(38,0)")).cast("double")
            / 1e12
        )

    cent = ex.groupBy(F.col("label").alias("clabel"), "i").agg(
        (_q12(F.col("x")) / F.count(F.lit(1))).alias("c")
    )
    cn = cent.groupBy("clabel").agg(
        _q12(F.col("c") * F.col("c")).alias("cn2")
    )
    vn = ex.groupBy("vec_id").agg(_q12(F.col("x") * F.col("x")).alias("n2"))
    sims = (
        ex.join(F.broadcast(cent), "i")
        .groupBy("vec_id", "label", "clabel")
        .agg(_q12(F.col("x") * F.col("c")).alias("dq"))
        .join(vn, "vec_id")
        .join(F.broadcast(cn), "clabel")
        .select(
            "vec_id",
            "label",
            "clabel",
            (F.col("dq") / F.sqrt(F.col("n2") * F.col("cn2"))).alias("sim"),
        )
    )
    margin = sims.groupBy("vec_id", "label").agg(
        (
            F.max(F.when(F.col("clabel") == F.col("label"), F.col("sim")))
            - F.max(
                F.when(F.col("clabel") != F.col("label"), F.col("sim"))
            )
        ).alias("m")
    )
    return margin.groupBy(F.col("label").cast("int").alias("label")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        F.round(
            F.sum(F.floor(F.col("m") * 1e9).cast("decimal(38,0)")).cast(
                "double"
            )
            / 1e9
            / F.count(F.lit(1)),
            4,
        ).alias("mean_margin"),
        F.sum(F.when(F.col("m") < 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_negative_margin"),
    )

@register(
    "q_vec_nn_label_error",
    oracle=f"""
        WITH base AS MATERIALIZED (
            SELECT vec_id, label, embedding,
                   list_sum(list_transform(embedding,
                        x -> floor(CAST(x AS DOUBLE)
                                   * CAST(x AS DOUBLE) * 1e12))) AS n2
            FROM embeddings WHERE vec_id < {_TWONN_CAP}
        ),
        sims AS (
            SELECT a.vec_id AS u, a.label AS ul, b.label AS vl,
                   list_sum(list_transform(
                        list_zip(a.embedding, b.embedding),
                        p -> floor(CAST(p[1] AS DOUBLE)
                                   * CAST(p[2] AS DOUBLE) * 1e12)))
                   / sqrt(a.n2 * b.n2) AS sim
            FROM base a JOIN base b ON a.vec_id <> b.vec_id
        ),
        best AS (
            SELECT u, ul,
                   MAX(CASE WHEN vl = ul THEN sim END) AS best_same,
                   MAX(CASE WHEN vl <> ul THEN sim END) AS best_diff
            FROM sims GROUP BY u, ul
        )
        SELECT CAST(ul AS INTEGER) AS label,
               CAST(COUNT(*) AS BIGINT) AS n_vectors,
               CAST(SUM(CASE WHEN best_diff > best_same
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
               ROUND(CAST(SUM(CASE WHEN best_diff > best_same
                              THEN 1 ELSE 0 END) AS DOUBLE)
                     / COUNT(*), 4) AS violation_rate
        FROM best GROUP BY ul
    """,
    section="V35",
    doc="Instance-level 1-NN label error: per vector, is the nearest "
    "SAME-label neighbor closer than the nearest DIFFERENT-label "
    "neighbor, aggregated to a per-label violation rate — the "
    "leave-one-out lower bound on any metric-space classifier "
    "(V34's centroid margin can look healthy while a label's "
    "BOUNDARY vectors all violate — centroids average that away; "
    "the violation rate is also the standard label-noise "
    "estimator: clean corpora run ~2x the Bayes rate). Strict "
    "inequality = tie-safe (ties count as non-violations on both "
    "engines since sims are bit-identical by the V26 quantized-dot "
    "device). Scale: capped exact slice; at corpus scale the two "
    "MAX-per-group reductions run over the D7/V6 blocked candidate "
    "edge list.",
)
def q_vec_nn_label_error(spark: SparkSession, sf_dir: str) -> DataFrame:
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

    base = emb.select("vec_id", "label", "embedding").withColumn(
        "n2", _n2("embedding")
    )
    a = fan_out(
        base.select(
            F.col("vec_id").alias("u"),
            F.col("label").alias("ul"),
            F.col("embedding").alias("a_emb"),
            F.col("n2").alias("a_n2"),
        )
    )
    b = base.select(
        F.col("vec_id").alias("v"),
        F.col("label").alias("vl"),
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
        "ul",
        "vl",
        (dotq / F.sqrt(F.col("a_n2") * F.col("b_n2"))).alias("sim"),
    )
    best = sims.groupBy("u", "ul").agg(
        F.max(F.when(F.col("vl") == F.col("ul"), F.col("sim"))).alias(
            "best_same"
        ),
        F.max(F.when(F.col("vl") != F.col("ul"), F.col("sim"))).alias(
            "best_diff"
        ),
    )
    viol = F.when(F.col("best_diff") > F.col("best_same"), 1).otherwise(0)
    return best.groupBy(F.col("ul").cast("int").alias("label")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        F.sum(viol).cast("bigint").alias("n_violations"),
        F.round(
            F.sum(viol).cast("double") / F.count(F.lit(1)), 4
        ).alias("violation_rate"),
    )

@register(
    "q_vec_concentration",
    oracle="""
        WITH n2 AS MATERIALIZED (
            SELECT vec_id, embedding,
                   list_sum(list_transform(embedding,
                        x -> floor(CAST(x AS DOUBLE)
                                   * CAST(x AS DOUBLE) * 1e12))) / 1e12
                       AS sq
            FROM embeddings
        ),
        norms AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(floor(sqrt(sq) * 1e9)
                                 AS DECIMAL(38,0))) AS DOUBLE) / 1e9
                       AS s_norm,
                   CAST(SUM(CAST(floor(sq * 1e9) AS DECIMAL(38,0)))
                        AS DOUBLE) / 1e9 AS s_sq
            FROM n2
        ),
        unit AS (
            SELECT u.i AS i,
                   CAST(SUM(CAST(floor(CAST(u.x AS DOUBLE) / sqrt(v.sq)
                                       * 1e9) AS DECIMAL(38,0)))
                        AS DOUBLE) / 1e9 AS su
            FROM (
                SELECT vec_id, sq,
                       unnest(list_transform(embedding,
                              (x, i) -> struct_pack(x := x, i := i))) AS u
                FROM n2
            ) v(vec_id, sq, u)
            GROUP BY u.i
        ),
        r AS (
            SELECT CAST(SUM(CAST(floor(su * su * 1e9) AS DECIMAL(38,0)))
                        AS DOUBLE) / 1e9 AS r2
            FROM unit
        )
        SELECT norms.n AS n_vectors,
               ROUND(s_norm / n, 4) AS mean_norm,
               ROUND(sqrt(greatest(s_sq / n
                          - (s_norm / n) * (s_norm / n), 0))
                     / (s_norm / n), 6) AS norm_cv,
               ROUND(sqrt(r.r2) / norms.n, 6) AS mean_resultant_length
        FROM norms CROSS JOIN r
    """,
    section="V36",
    doc="High-dimensional concentration audit: the norm coefficient of "
    "variation (concentration of measure says norms CONCENTRATE in "
    "honest high-dim data — a fat norm_cv means heterogeneous "
    "embedding scales, where cosine and dot-product retrieval "
    "rankings silently diverge and V10's MIPS needs the norm "
    "augmentation) and the mean resultant length of the UNIT "
    "vectors (||mean direction||: near 0 = directions spread over "
    "the sphere, near 1 = a common-direction pile-up — the "
    "circular-statistics reading of what V32's PC1 ratio measures "
    "spectrally; disagreement between the two flags a non-linear "
    "concentration PCA can't see). Norms/unit coordinates fold "
    "through floor-quantized DECIMAL sums at every stage "
    "(rule 10). Scale: two scans (norms, unit-coordinate means), "
    "both map-side-combinable; the resultant is a 64-row "
    "reduction.",
)
def q_vec_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")

    def _n2(col: str):
        return (
            F.aggregate(
                F.transform(
                    F.col(col),
                    lambda x: F.floor(
                        x.cast("double") * x.cast("double") * F.lit(1e12)
                    ).cast("double"),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            / F.lit(1e12)
        )

    n2 = emb.select("vec_id", "embedding").withColumn("sq", _n2("embedding"))

    def _q9(c):
        return (
            F.sum(F.floor(c * 1e9).cast("decimal(38,0)")).cast("double")
            / 1e9
        )

    norms = n2.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        _q9(F.sqrt(F.col("sq"))).alias("s_norm"),
        _q9(F.col("sq")).alias("s_sq"),
    )
    unit = (
        n2.select(
            "sq", F.posexplode("embedding").alias("i", "xf")
        )
        .select(
            (F.col("i") + 1).alias("i"),
            (F.col("xf").cast("double") / F.sqrt(F.col("sq"))).alias("ux"),
        )
        .groupBy("i")
        .agg(_q9(F.col("ux")).alias("su"))
    )
    r = unit.agg(_q9(F.col("su") * F.col("su")).alias("r2"))
    mn = F.col("s_norm") / F.col("n")
    return norms.crossJoin(F.broadcast(r)).select(
        F.col("n").alias("n_vectors"),
        F.round(mn, 4).alias("mean_norm"),
        F.round(
            F.sqrt(
                F.greatest(
                    F.col("s_sq") / F.col("n") - mn * mn, F.lit(0.0)
                )
            )
            / mn,
            6,
        ).alias("norm_cv"),
        F.round(F.sqrt(F.col("r2")) / F.col("n"), 6).alias(
            "mean_resultant_length"
        ),
    )

# --- V37: Calinski-Harabasz cluster-validity index --------------------------


@register(
    "q_vec_calinski_harabasz",
    oracle="""
        WITH q AS (
            SELECT label, u.pos AS pos,
                   CAST(floor(CAST(u.val AS DOUBLE) * 1e7) AS BIGINT) AS qv
            FROM (
                SELECT label,
                       unnest(list_transform(embedding,
                              (x, i) -> struct_pack(val := x, pos := i))) AS u
                FROM embeddings
            )
        ),
        dims AS (
            SELECT label, pos, SUM(qv) AS s FROM q GROUP BY label, pos
        ),
        ln AS (SELECT label, COUNT(*) AS n_k FROM embeddings GROUP BY label),
        cent AS (
            SELECT d.label,
                   any_value(l.n_k) AS n_k,
                   list(CAST(s AS DOUBLE) / (CAST(l.n_k AS DOUBLE) * 1e7)
                        ORDER BY pos) AS c_arr
            FROM dims d JOIN ln l USING (label)
            GROUP BY d.label
        ),
        tot AS (SELECT COUNT(*) AS n FROM embeddings),
        gcent AS (
            SELECT list(CAST(gs AS DOUBLE) / (CAST(n AS DOUBLE) * 1e7)
                        ORDER BY pos) AS g_arr
            FROM (SELECT pos, SUM(s) AS gs FROM dims GROUP BY pos)
            CROSS JOIN tot GROUP BY n
        ),
        b AS (
            SELECT SUM(n_k * list_sum(list_transform(
                       list_zip(c_arr, g_arr),
                       p -> floor((CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                                  * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                                  * 1e12)))) AS b_int,
                   COUNT(*) AS k
            FROM cent CROSS JOIN gcent
        ),
        w AS (
            SELECT SUM(list_sum(list_transform(
                       list_zip(e.embedding, c.c_arr),
                       p -> floor((CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                                  * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                                  * 1e9)))) AS w_int
            FROM embeddings e JOIN cent c USING (label)
        )
        SELECT CAST(t.n AS BIGINT) AS n,
               CAST(b.k AS BIGINT) AS k,
               ROUND(CAST(b.b_int AS DOUBLE) / 1e12, 4) AS between_ss,
               ROUND(CAST(w.w_int AS DOUBLE) / 1e9, 4) AS within_ss,
               ROUND((CAST(b.b_int AS DOUBLE) / 1e12 / (b.k - 1))
                     / (CAST(w.w_int AS DOUBLE) / 1e9 / (t.n - b.k)), 4)
                   AS ch_index
        FROM b CROSS JOIN w CROSS JOIN tot t
    """,
    section="V37",
    doc="Calinski-Harabasz (variance-ratio) index over the label "
    "clustering: (B/(k-1)) / (W/(n-k)) with B the size-weighted "
    "between-centroid scatter and W the within-cluster scatter — the "
    "GLOBAL cluster-validity scalar completing the trio with the "
    "per-point silhouette (V26) and the per-pair Davies-Bouldin "
    "(V27): one number to compare labelings/k choices before an IVF "
    "build, where silhouette is O(n*k) per point and DB only ranks "
    "pairs. Exactness device: centroids from integer-quantized "
    "per-dim sums (exact at every order), every squared difference "
    "per-term floored to an integer before any cross-row sum — no "
    "float accumulation; B and W are exact BIGINTs divided once. "
    "Scale: one posexplode shuffle (rows x dims) for centroids, one "
    "broadcast join back for W (centroid table is k rows) — the "
    "corpus is scanned twice and never shuffled whole.",
)
def q_vec_calinski_harabasz(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "label", F.posexplode("embedding").alias("pos", "val")
    ).select(
        "label",
        "pos",
        F.floor(F.col("val").cast("double") * 1e7).cast("bigint").alias("qv"),
    )
    dims = q.groupBy("label", "pos").agg(F.sum("qv").alias("s"))
    ln = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n_k"))
    cent = (
        dims.join(ln, "label")
        .withColumn(
            "c",
            F.col("s").cast("double")
            / (F.col("n_k").cast("double") * F.lit(1e7)),
        )
        .groupBy("label")
        .agg(
            F.first("n_k").alias("n_k"),
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "c"))),
                lambda st: st["c"],
            ).alias("c_arr"),
        )
    )
    n = emb.count()
    gcent = (
        dims.groupBy("pos")
        .agg(F.sum("s").alias("gs"))
        .withColumn(
            "g",
            F.col("gs").cast("double") / (F.lit(float(n)) * F.lit(1e7)),
        )
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "g"))),
                lambda st: st["g"],
            ).alias("g_arr")
        )
    )

    def _sq_int(scale: float):
        def f(a, b):
            d = a.cast("double") - b.cast("double")
            return F.floor(d * d * F.lit(scale))

        return f

    b = (
        cent.crossJoin(F.broadcast(gcent))
        .select(
            "label",
            "n_k",
            F.aggregate(
                F.zip_with("c_arr", "g_arr", _sq_int(1e12)),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("b_int_k"),
        )
        .agg(
            F.sum(F.col("n_k") * F.col("b_int_k")).cast("bigint").alias(
                "b_int"
            ),
            F.count(F.lit(1)).alias("k"),
        )
    )
    w = (
        emb.join(F.broadcast(cent.select("label", "c_arr")), "label")
        .select(
            F.aggregate(
                F.zip_with("embedding", "c_arr", _sq_int(1e9)),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            .cast("bigint")
            .alias("w_row")
        )
        .agg(F.sum("w_row").alias("w_int"))
    )
    bb = F.col("b_int").cast("double") / 1e12
    ww = F.col("w_int").cast("double") / 1e9
    return (
        b.crossJoin(w)
        .select(
            F.lit(n).cast("bigint").alias("n"),
            F.col("k").cast("bigint").alias("k"),
            F.round(bb, 4).alias("between_ss"),
            F.round(ww, 4).alias("within_ss"),
            F.round(
                (bb / (F.col("k") - 1))
                / (ww / (F.lit(float(n)) - F.col("k"))),
                4,
            ).alias("ch_index"),
        )
    )

@register(
    "q_vec_ndcg",
    oracle=f"""
        WITH q AS MATERIALIZED (
            SELECT vec_id AS qid, embedding AS qe, label AS qlabel
            FROM embeddings WHERE vec_id < {_NDCG_NQ}
        ),
        s AS (
            SELECT q.qid,
                   e.vec_id AS cid,
                   CASE WHEN e.label = q.qlabel THEN 1 ELSE 0 END AS rel,
                   CAST(floor(list_cosine_similarity(e.embedding, q.qe)
                              * 1e6) AS BIGINT) AS simq
            FROM embeddings e JOIN q ON e.vec_id <> q.qid
        ),
        r AS (
            SELECT qid, rel,
                   row_number() OVER (
                       PARTITION BY qid ORDER BY simq DESC, cid) AS rn
            FROM s
        ),
        d AS (
            SELECT qid,
                   CAST(SUM(rel) AS BIGINT) AS n_rel,
                   CAST(SUM(CASE WHEN rn <= {_NDCG_K} THEN rel *
                        ([{", ".join(map(str, _NDCG_DISC))}])[rn]
                        ELSE 0 END) AS BIGINT) AS dcg_q
            FROM r GROUP BY qid
        )
        SELECT qid, n_rel, dcg_q,
               CASE WHEN n_rel > 0 THEN CAST(
                   ([{", ".join(map(str, _NDCG_PREFIX))}])
                       [LEAST(n_rel, {_NDCG_K})] AS BIGINT) END AS idcg_q,
               ROUND(CAST(dcg_q AS DOUBLE) /
                     CASE WHEN n_rel > 0 THEN
                         ([{", ".join(map(str, _NDCG_PREFIX))}])
                             [LEAST(n_rel, {_NDCG_K})] END, 6) AS ndcg
        FROM d
    """,
    section="V38",
    doc=f"NDCG@{_NDCG_K} of cosine retrieval against label relevance: for "
    f"each of {_NDCG_NQ} query vectors, rank the rest of the corpus by "
    "quantized cosine (V3's floor(cos*1e6) device), score binary "
    "relevance (label match), and compute DCG/IDCG with "
    "round(1e9/log2(r+1)) integer discounts — the GRADED ranking "
    "metric that recall@k (V12) flattens: a relevant hit at rank 1 "
    "must beat one at rank 10, which is what embedding-model evals "
    "(MTEB-style) actually grade. IDCG comes from the prefix-sum "
    "ladder of the same discounts at LEAST(n_rel, k) — exact BIGINT "
    "throughout, ONE division at the end (n_rel=0 yields NULL ndcg "
    "identically in both engines). Determinism: the log2 discounts "
    "are 10 shared integer LITERALS computed once, so no libm call "
    "crosses engines and the DCG fold is order-insensitive integer "
    "addition. Scale: queries broadcast, the corpus never shuffles; "
    "per-query top-k is a bounded window after a map-side score pass "
    "(at 1000 executors the rank window keys on qid — 10 partitions "
    "of corpus-size each; swap to the V12 aggregate-top-k shape if "
    "nq grows).",
)
def q_vec_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < _NDCG_NQ).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.col("label").alias("qlabel"),
    )
    scored = (
        emb.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("cid"),
            F.when(F.col("label") == F.col("qlabel"), 1)
            .otherwise(0)
            .alias("rel"),
            F.floor(
                _dot("embedding", "qe")
                / (F.sqrt(_sq_norm("embedding")) * F.sqrt(_sq_norm("qe")))
                * 1e6
            )
            .cast("bigint")
            .alias("simq"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("simq").desc(), "cid")
    disc = F.array(*[F.lit(d) for d in _NDCG_DISC])
    prefix = F.array(*[F.lit(p) for p in _NDCG_PREFIX])
    ranked = scored.withColumn("rn", F.row_number().over(w))
    d = ranked.groupBy("qid").agg(
        F.sum("rel").cast("bigint").alias("n_rel"),
        F.sum(
            F.when(
                F.col("rn") <= _NDCG_K,
                F.col("rel") * F.element_at(disc, F.col("rn").cast("int")),
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("dcg_q"),
    )
    idcg = F.when(
        F.col("n_rel") > 0,
        F.element_at(
            prefix, F.least(F.col("n_rel"), F.lit(_NDCG_K)).cast("int")
        ).cast("bigint"),
    )
    return d.select(
        "qid",
        "n_rel",
        "dcg_q",
        idcg.alias("idcg_q"),
        F.round(F.col("dcg_q").cast("double") / idcg, 6).alias("ndcg"),
    )

@register(
    "q_vec_mrr",
    oracle=f"""
        WITH q AS (
            SELECT vec_id AS qid, label AS qlabel, embedding
            FROM embeddings WHERE vec_id < {_MRR_NQ}
        ),
        c AS (
            SELECT vec_id, label, embedding
            FROM embeddings WHERE vec_id >= {_MRR_NQ}
        ),
        ranked AS (
            SELECT q.qid, q.qlabel, c.label,
                   row_number() OVER (
                       PARTITION BY q.qid
                       ORDER BY {_COS_DUCK} DESC, c.vec_id
                   ) AS rnk
            FROM q CROSS JOIN c
        ),
        hits AS (
            SELECT qid,
                   MIN(CASE WHEN label = qlabel AND rnk <= {_MRR_K}
                            THEN rnk END) AS hit_rank
            FROM ranked GROUP BY qid, qlabel
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
               CAST(SUM(CASE WHEN hit_rank IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
               ROUND(CAST(SUM(COALESCE({_MRR_LCM} / hit_rank, 0))
                          AS DOUBLE) / {_MRR_LCM} / COUNT(*), 6) AS mrr
        FROM hits
    """,
    section="V21",
    doc=f"Mean reciprocal rank at k={_MRR_K} over cosine retrieval "
    f"({_MRR_NQ} label-carrying queries vs the rest of the corpus): "
    "the first-relevant-result metric that complements V12's "
    "recall@k (recall counts any hit, MRR rewards putting it FIRST) "
    "and q_vec_ndcg's graded gains. The reciprocal-rank sum uses the "
    f"lcm(1..{_MRR_K})={_MRR_LCM} integer device — 2520/r is exact "
    "for every admissible rank, so the mean is an exact integer sum "
    "scaled once, never a float accumulation of 1/3-style repeating "
    "fractions. Cosines are fixed-order HOF folds (bit-identical "
    "cross-engine, V1's rule); rank ties break on vec_id. Scale: "
    "queries broadcast, the corpus scans once, per-query state is "
    "one (best-rank) scalar after the rank window — at 100 TB the "
    "rank window swaps for V12's aggregate-top-k shape unchanged.",
)
def q_vec_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < _MRR_NQ).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.col("embedding").alias("qe"),
    )
    c = emb.where(F.col("vec_id") >= _MRR_NQ).select(
        "vec_id", "label", F.col("embedding").alias("ce")
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

    def _norm(col):
        return F.sqrt(
            F.aggregate(
                F.transform(
                    col, lambda x: x.cast("double") * x.cast("double")
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )

    sims = c.crossJoin(F.broadcast(q)).select(
        "qid",
        "qlabel",
        "label",
        "vec_id",
        (dot / (_norm(F.col("qe")) * _norm(F.col("ce")))).alias("cos"),
    )
    rnk = F.row_number().over(
        Window.partitionBy("qid").orderBy(F.col("cos").desc(), "vec_id")
    )
    hits = (
        sims.withColumn("rnk", rnk)
        .groupBy("qid", "qlabel")
        .agg(
            F.min(
                F.when(
                    (F.col("label") == F.col("qlabel"))
                    & (F.col("rnk") <= _MRR_K),
                    F.col("rnk"),
                )
            ).alias("hit_rank")
        )
    )
    return hits.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
        F.sum(
            F.when(F.col("hit_rank").isNotNull(), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_hit"),
        F.round(
            F.sum(
                F.coalesce(
                    (F.lit(_MRR_LCM) / F.col("hit_rank")).cast("bigint"),
                    F.lit(0),
                )
            ).cast("double")
            / _MRR_LCM
            / F.count(F.lit(1)),
            6,
        ).alias("mrr"),
    )

@register(
    "q_vec_kmeanspp_init",
    oracle=f"""
        WITH c1 AS (
            SELECT vec_id AS id1, embedding AS e1 FROM embeddings
            ORDER BY vec_id LIMIT 1
        ),
        d1 AS (
            SELECT v.vec_id, v.embedding,
                   {_D2_DUCK.format(a="v.embedding", b="c1.e1")} AS d
            FROM embeddings v CROSS JOIN c1
        ),
        c2 AS (
            SELECT vec_id AS id2, embedding AS e2 FROM (
                SELECT vec_id, embedding,
                       row_number() OVER (ORDER BY d DESC, vec_id) AS rn
                FROM d1
            ) WHERE rn = 1
        ),
        d2 AS (
            SELECT d1.vec_id, d1.embedding,
                   LEAST(d1.d,
                         {_D2_DUCK.format(a="d1.embedding", b="c2.e2")})
                       AS d
            FROM d1 CROSS JOIN c2
        ),
        c3 AS (
            SELECT vec_id AS id3, embedding AS e3 FROM (
                SELECT vec_id, embedding,
                       row_number() OVER (ORDER BY d DESC, vec_id) AS rn
                FROM d2
            ) WHERE rn = 1
        ),
        d3 AS (
            SELECT d2.vec_id,
                   LEAST(d2.d,
                         {_D2_DUCK.format(a="d2.embedding", b="c3.e3")})
                       AS d
            FROM d2 CROSS JOIN c3
        )
        SELECT (SELECT id1 FROM c1) AS centroid_1,
               (SELECT id2 FROM c2) AS centroid_2,
               (SELECT id3 FROM c3) AS centroid_3,
               ROUND(sqrt(MAX(d)), 4) AS coverage_radius
        FROM d3
    """,
    section="V22",
    doc="Farthest-first (k-means++-style, deterministic maximin "
    "variant) centroid initialization, k=3 unrolled: seed with the "
    "lowest vec_id, then twice pick the point maximizing the "
    "min-distance to the chosen set; report the chosen ids and the "
    "final coverage radius (max-min distance = the 2-approximation "
    "bound of Gonzalez's algorithm for k-center). Squared "
    "distances are fixed-order HOF folds (bit-identical "
    "cross-engine, V1's rule); every argmax carries a vec_id "
    "tie-break; only the reported radius is rounded. The "
    "deterministic maximin rule replaces k-means++'s D^2 SAMPLING "
    "so the oracle can be exact — same O(nk) distance-pass "
    "structure, no randomness. Scale: each round is one broadcast "
    "of a single centroid row + a map-only distance update + a "
    "1-row argmax reduction — k rounds, never a shuffle of the "
    "corpus; the running min-distance column is the carry, exactly "
    "how k-means|| implements its oversampling passes.",
)
def q_vec_kmeanspp_init(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")

    def d2(a, b):
        return F.aggregate(
            F.zip_with(
                a,
                b,
                lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    c1 = (
        emb.orderBy("vec_id")
        .limit(1)
        .select(
            F.col("vec_id").alias("id1"), F.col("embedding").alias("e1")
        )
    )
    d1 = emb.crossJoin(F.broadcast(c1)).select(
        "vec_id",
        "embedding",
        "id1",
        d2(F.col("embedding"), F.col("e1")).alias("d"),
    )
    c2 = (
        d1.withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy(F.col("d").desc(), "vec_id")
            ),
        )
        .where(F.col("rn") == 1)
        .select(
            F.col("vec_id").alias("id2"), F.col("embedding").alias("e2")
        )
    )
    d2_df = d1.crossJoin(F.broadcast(c2)).select(
        "vec_id",
        "embedding",
        "id1",
        "id2",
        F.least(F.col("d"), d2(F.col("embedding"), F.col("e2"))).alias(
            "d"
        ),
    )
    c3 = (
        d2_df.withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy(F.col("d").desc(), "vec_id")
            ),
        )
        .where(F.col("rn") == 1)
        .select(
            F.col("vec_id").alias("id3"), F.col("embedding").alias("e3")
        )
    )
    d3 = d2_df.crossJoin(F.broadcast(c3)).select(
        "id1",
        "id2",
        "id3",
        F.least(F.col("d"), d2(F.col("embedding"), F.col("e3"))).alias(
            "d"
        ),
    )
    return d3.groupBy("id1", "id2", "id3").agg(
        F.round(F.sqrt(F.max("d")), 4).alias("coverage_radius")
    ).select(
        F.col("id1").alias("centroid_1"),
        F.col("id2").alias("centroid_2"),
        F.col("id3").alias("centroid_3"),
        "coverage_radius",
    )

@register(
    "q_vec_knn_shapley",
    oracle=f"""
        WITH ranked AS MATERIALIZED (
            SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                   CASE WHEN q.label = n.label THEN 1 ELSE 0 END AS m,
                   ROW_NUMBER() OVER (
                        PARTITION BY q.vec_id
                        -- ordered-fold cosine, bit-identical to the Spark
                        -- side's aggregate() fold (r6: list_cosine_similarity
                        -- uses a different summation order, and a single
                        -- flipped rank poisons the whole suffix sum at sf1)
                        ORDER BY list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65), i -> CAST(q.embedding[i] AS DOUBLE) * CAST(n.embedding[i] AS DOUBLE))), (a, v) -> a + v)
                                 / (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65), i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))), (a, v) -> a + v)) * sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65), i -> CAST(n.embedding[i] AS DOUBLE) * CAST(n.embedding[i] AS DOUBLE))), (a, v) -> a + v))) DESC,
                                 n.vec_id
                   ) AS rank,
                   COUNT(*) OVER (PARTITION BY q.vec_id) AS n_total
            FROM (SELECT * FROM embeddings WHERE vec_id < 10) q
            JOIN embeddings n ON n.vec_id <> q.vec_id
        ),
        terms AS (
            SELECT query_id, neighbor_id, rank,
                   CASE WHEN m_next IS NULL
                        THEN CAST(m AS DOUBLE) / n_total
                        ELSE CAST(m - m_next AS DOUBLE)
                             * CAST(LEAST(rank, {_SHAP_K}) AS DOUBLE)
                             / CAST({_SHAP_K} * rank AS DOUBLE)
                   END AS contrib
            FROM (
                SELECT *, LEAD(m) OVER (
                    PARTITION BY query_id ORDER BY rank
                ) AS m_next
                FROM ranked
            )
        ),
        sv AS (
            SELECT query_id, neighbor_id,
                   SUM(CAST(floor(contrib * 1e12) AS BIGINT)) OVER (
                        PARTITION BY query_id ORDER BY rank DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS s_q12
            FROM terms
        )
        SELECT neighbor_id AS vec_id,
               CAST(SUM(s_q12) AS DOUBLE) / 1e12 AS shapley
        FROM sv GROUP BY neighbor_id
    """,
    section="V21",
    doc=f"KNN-Shapley data valuation (Jia et al., PVLDB 2019 closed form, "
    f"k={_SHAP_K}): the exact Shapley value of every training point for a "
    "k-NN surrogate classifier, summed over the 10 gold-labeled query "
    "points — the standard 'which training examples help/hurt' curation "
    "signal, computable in ONE pass unlike Monte-Carlo Data Shapley. The "
    "recursion s_i = s_(i+1) + (m_i - m_(i+1)) * min(K,i)/(K*i) (points "
    "ranked near->far) is a SUFFIX SUM, so it runs as a window over the "
    "V3 ranking: per-rank increment terms, quantized floor(x*1e12) -> "
    "BIGINT (the §5.3 _qsum device — each term is one int-subtract, one "
    "multiply, one divide, bit-identical IEEE on both engines), then an "
    "integer running sum ordered rank DESC and an integer per-neighbor "
    "total across queries; ONE decimal->double conversion at the end. "
    "Scale: inherits V3's shape (queries broadcast, corpus never "
    "shuffles); the window partitions by query_id (tiny), the final agg "
    "shuffles 10*N int rows on neighbor_id — no all-pairs materialization "
    "beyond the scored candidate set.",
)
def q_vec_knn_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import fan_out

    emb = load_table(spark, sf_dir, "embeddings")
    q = (
        emb.filter(F.col("vec_id") < 10)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("label").alias("q_label"),
        )
        .withColumn("q_norm", F.sqrt(_sq_norm("q_emb")))
    )
    n = fan_out(
        emb.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("n_emb"),
            F.col("label").alias("n_label"),
        ).withColumn("n_norm", F.sqrt(_sq_norm("n_emb")))
    )
    sim = _dot("q_emb", "n_emb") / (F.col("q_norm") * F.col("n_norm"))
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    w_all = Window.partitionBy("query_id")
    ranked = (
        F.broadcast(q)
        .join(n, F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w_rank))
        .withColumn("n_total", F.count(F.lit(1)).over(w_all))
        .withColumn(
            "m",
            F.when(F.col("q_label") == F.col("n_label"), 1).otherwise(0),
        )
        .select("query_id", "neighbor_id", "rank", "n_total", "m")
    )
    w_next = Window.partitionBy("query_id").orderBy("rank")
    contrib = F.when(
        F.col("m_next").isNull(),
        F.col("m").cast("double") / F.col("n_total"),
    ).otherwise(
        (F.col("m") - F.col("m_next")).cast("double")
        * F.least(F.col("rank"), F.lit(_SHAP_K)).cast("double")
        / (F.lit(_SHAP_K) * F.col("rank")).cast("double")
    )
    w_suffix = (
        Window.partitionBy("query_id")
        .orderBy(F.col("rank").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sv = (
        ranked.withColumn("m_next", F.lead("m").over(w_next))
        .withColumn("contrib", contrib)
        .withColumn(
            "s_q12",
            F.sum(
                F.floor(F.col("contrib") * F.lit(1e12)).cast("bigint")
            ).over(w_suffix),
        )
    )
    return (
        sv.groupBy(F.col("neighbor_id").alias("vec_id"))
        .agg((F.sum("s_q12").cast("double") / F.lit(1e12)).alias("shapley"))
    )

@register(
    "q_vec_rbo_overlap",
    oracle=f"""
        WITH words AS (
            SELECT vec_id, {_pack_duck(1)} AS wlo, {_pack_duck(33)} AS whi
            FROM embeddings
        ),
        hq AS (SELECT vec_id AS qid, wlo AS qlo, whi AS qhi FROM words
               WHERE vec_id < {_HAM_NQ}),
        ham AS (
            SELECT qid, nid, rnk FROM (
                SELECT hq.qid, c.vec_id AS nid,
                       row_number() OVER (
                           PARTITION BY hq.qid
                           ORDER BY bit_count(xor(hq.qlo, c.wlo))
                                    + bit_count(xor(hq.qhi, c.whi)), c.vec_id
                       ) AS rnk
                FROM hq JOIN words c ON c.vec_id <> hq.qid
            ) WHERE rnk <= {_RBO_K}
        ),
        cos AS (
            SELECT query_id, neighbor_id, rank FROM (
                SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                       ROW_NUMBER() OVER (
                            PARTITION BY q.vec_id
                            ORDER BY list_cosine_similarity(
                                         q.embedding, n.embedding) DESC,
                                     n.vec_id
                       ) AS rank
                FROM (SELECT * FROM embeddings WHERE vec_id < {_HAM_NQ}) q
                JOIN embeddings n ON n.vec_id <> q.vec_id
            ) WHERE rank <= {_RBO_K}
        ),
        common AS (
            SELECT c.query_id,
                   CASE WHEN m = 1 THEN CAST(235416399425 AS BIGINT) WHEN m = 2 THEN CAST(135416399425 AS BIGINT) WHEN m = 3 THEN CAST(90416399425 AS BIGINT) WHEN m = 4 THEN CAST(63416399425 AS BIGINT) WHEN m = 5 THEN CAST(45191399425 AS BIGINT) WHEN m = 6 THEN CAST(32069399425 AS BIGINT) WHEN m = 7 THEN CAST(22227899425 AS BIGINT) WHEN m = 8 THEN CAST(14635885139 AS BIGINT) WHEN m = 9 THEN CAST(8657173890 AS BIGINT) WHEN m = 10 THEN CAST(3874204890 AS BIGINT) END AS w_q12
            FROM cos c JOIN ham h
              ON h.qid = c.query_id AND h.nid = c.neighbor_id,
            LATERAL (SELECT GREATEST(c.rank, h.rnk) AS m) x
        ),
        qs AS (SELECT DISTINCT query_id FROM cos)
        SELECT qs.query_id,
               CAST(COALESCE(n_common, 0) AS BIGINT) AS n_common,
               ROUND(CAST(COALESCE(s_q12, 0) AS DOUBLE) / 1e12, 6) AS rbo
        FROM qs LEFT JOIN (
            SELECT query_id, COUNT(*) AS n_common, SUM(w_q12) AS s_q12
            FROM common GROUP BY query_id
        ) agg USING (query_id)
    """,
    section="V22",
    doc=f"Rank-biased overlap (Webber et al. 2010, truncated at depth "
    f"{_RBO_K}, p = {_RBO_P}) between the exact cosine ranking (V3) and "
    "the binary sign-bit Hamming ranking (V17), per query — the "
    "top-weighted agreement metric that tells you how much retrieval "
    "quality the 64x-compressed serving path loses WHERE IT MATTERS "
    "(rank 1 counts more than rank 10), complementing V12's flat "
    "recall@k. Determinism device: a common neighbor whose worse rank "
    "is m contributes a FIXED mass sum_(d=m..K) (1-p)p^(d-1)/d — the "
    "ten masses are computed once in Python, embedded as floor(x*1e12) "
    "BIGINT literals in both engines, and summed as integers: the "
    "engines never do float math at all until one final /1e12. Scale: "
    "both rankings inherit the V3/V17 shape (queries broadcast, corpus "
    "never shuffles); the overlap join runs on 10*K-row ranking tables.",
)
def q_vec_rbo_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    from ai_to_cvent_etl_spark.queries._util import fan_out

    words = emb.select(
        "vec_id",
        F.expr(_pack_spark(1)).alias("wlo"),
        F.expr(_pack_spark(33)).alias("whi"),
    )
    hq = words.where(F.col("vec_id") < _HAM_NQ).select(
        F.col("vec_id").alias("qid"),
        F.col("wlo").alias("qlo"),
        F.col("whi").alias("qhi"),
    )
    ham = (
        words.join(F.broadcast(hq), F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("nid"),
            (
                F.bit_count(F.col("qlo").bitwiseXOR(F.col("wlo")))
                + F.bit_count(F.col("qhi").bitwiseXOR(F.col("whi")))
            ).alias("hamming"),
        )
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("qid").orderBy("hamming", "nid")
            ),
        )
        .where(F.col("rnk") <= _RBO_K)
    )
    q = emb.filter(F.col("vec_id") < _HAM_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    ).withColumn("q_norm", F.sqrt(_sq_norm("q_emb")))
    n = fan_out(
        emb.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("n_emb"),
        ).withColumn("n_norm", F.sqrt(_sq_norm("n_emb")))
    )
    sim = _dot("q_emb", "n_emb") / (F.col("q_norm") * F.col("n_norm"))
    wc = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    cos = (
        F.broadcast(q)
        .join(n, F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(wc))
        .where(F.col("rank") <= _RBO_K)
        .select("query_id", "neighbor_id", "rank")
    )
    m = F.greatest(F.col("rank"), F.col("rnk"))
    w_expr = F.lit(None).cast("bigint")
    for i in range(_RBO_K, 0, -1):
        w_expr = F.when(m == i, F.lit(_RBO_W_Q12[i - 1])).otherwise(w_expr)
    common = cos.join(
        ham,
        (F.col("qid") == F.col("query_id"))
        & (F.col("nid") == F.col("neighbor_id")),
    ).select("query_id", w_expr.alias("w_q12"))
    agg = common.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_common"),
        F.sum("w_q12").alias("s_q12"),
    )
    qs = cos.select("query_id").distinct()
    return qs.join(agg, "query_id", "left").select(
        "query_id",
        F.coalesce(F.col("n_common"), F.lit(0)).cast("bigint").alias(
            "n_common"
        ),
        F.round(
            F.coalesce(F.col("s_q12"), F.lit(0)).cast("double") / F.lit(1e12),
            6,
        ).alias("rbo"),
    )

# ==== wave 147b: linear CKA between embedding halves ===============


@register(
    "q_vec_cka_halves",
    oracle="""
        WITH ex AS (
            SELECT vec_id, CAST(u.pos AS BIGINT) - 1 AS pos,
                   CAST(u.val AS DOUBLE) AS val
            FROM (
                SELECT vec_id,
                       unnest(list_transform(embedding,
                           (x, i) -> struct_pack(val := x, pos := i))) AS u
                FROM embeddings
            )
        ),
        nn AS (SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n FROM ex),
        mq AS (
            SELECT pos,
                   CAST(SUM(CAST(floor(val * 1e7) AS BIGINT)) AS BIGINT)
                       AS m_q7
            FROM ex GROUP BY pos
        ),
        centered AS (
            SELECT e.vec_id, e.pos,
                   e.val - CAST(m.m_q7 AS DOUBLE) / (nn.n * 1e7) AS c
            FROM ex e JOIN mq m ON e.pos = m.pos CROSS JOIN nn
        ),
        lo AS (SELECT vec_id, pos AS i, c FROM centered WHERE pos < 32),
        hi AS (SELECT vec_id, pos - 32 AS j, c FROM centered
               WHERE pos >= 32),
        cxy AS (
            SELECT a.i, b.j,
                   CAST(SUM(CAST(floor(a.c * b.c * 1e10) AS BIGINT))
                        AS BIGINT) AS q
            FROM lo a JOIN hi b ON a.vec_id = b.vec_id
            GROUP BY a.i, b.j
        ),
        cxx AS (
            SELECT a.i, b.i AS i2,
                   CAST(SUM(CAST(floor(a.c * b.c * 1e10) AS BIGINT))
                        AS BIGINT) AS q
            FROM lo a JOIN lo b ON a.vec_id = b.vec_id
            GROUP BY a.i, b.i
        ),
        cyy AS (
            SELECT a.j, b.j AS j2,
                   CAST(SUM(CAST(floor(a.c * b.c * 1e10) AS BIGINT))
                        AS BIGINT) AS q
            FROM hi a JOIN hi b ON a.vec_id = b.vec_id
            GROUP BY a.j, b.j
        ),
        frob AS (
            SELECT
                (SELECT CAST(SUM(CAST(floor(
                     (CAST(q AS DOUBLE) / 1e10)
                     * (CAST(q AS DOUBLE) / 1e10) * 1e6) AS BIGINT))
                     AS BIGINT) FROM cxy) AS sxy_q6,
                (SELECT CAST(SUM(CAST(floor(
                     (CAST(q AS DOUBLE) / 1e10)
                     * (CAST(q AS DOUBLE) / 1e10) * 1e6) AS BIGINT))
                     AS BIGINT) FROM cxx) AS sxx_q6,
                (SELECT CAST(SUM(CAST(floor(
                     (CAST(q AS DOUBLE) / 1e10)
                     * (CAST(q AS DOUBLE) / 1e10) * 1e6) AS BIGINT))
                     AS BIGINT) FROM cyy) AS syy_q6
        )
        SELECT (SELECT n FROM nn) AS n_vectors,
               ROUND((CAST(sxy_q6 AS DOUBLE) / 1e6)
                     / (sqrt(CAST(sxx_q6 AS DOUBLE) / 1e6)
                        * sqrt(CAST(syy_q6 AS DOUBLE) / 1e6)), 6)
                   AS linear_cka
        FROM frob
    """,
    section="V23",
    doc="Linear CKA (Kornblith et al. 2019) between the FIRST and "
    "SECOND halves of the embedding space: ||Y'X||_F^2 / (||X'X||_F "
    "||Y'Y||_F) over column-centered halves — the representation-"
    "similarity metric at dimension-group grain, here auditing how "
    "much the back 32 dims merely re-encode the front 32 (high CKA "
    "=> truncation to 32 dims is nearly free; the quantitative twin "
    "of V19's matryoshka recall). Everything reduces to three small "
    "Gram matrices (32x32) built relationally from the posexploded "
    "dims; every cross term is floor-quantized BEFORE summation "
    "(floor(c_a c_b 1e10) -> BIGINT) and the Frobenius squares are "
    "quantized again (1e6), so despite ~5M float products the sums "
    "are order-insensitive integers end-to-end. Scale: the Gram "
    "build joins on vec_id (the natural grain) and emits 32^2-row "
    "matrices regardless of corpus size — the classic 'small Gram, "
    "big data' shape; means broadcast.",
)
def q_vec_cka_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "valf")
    ).select("vec_id", "pos", F.col("valf").cast("double").alias("val"))
    nn = ex.agg(F.countDistinct("vec_id").cast("bigint").alias("n"))
    mq = ex.groupBy("pos").agg(
        F.sum(F.floor(F.col("val") * F.lit(1e7)).cast("bigint"))
        .cast("bigint")
        .alias("m_q7")
    )
    centered = (
        ex.join(F.broadcast(mq), "pos")
        .crossJoin(F.broadcast(nn))
        .select(
            "vec_id",
            "pos",
            (
                F.col("val")
                - F.col("m_q7").cast("double") / (F.col("n") * F.lit(1e7))
            ).alias("c"),
        )
    ).localCheckpoint(eager=False)
    lo = centered.where(F.col("pos") < 32).select(
        "vec_id", F.col("pos").alias("i"), F.col("c").alias("ca")
    )
    hi = centered.where(F.col("pos") >= 32).select(
        F.col("vec_id").alias("v2"),
        (F.col("pos") - 32).alias("j"),
        F.col("c").alias("cb"),
    )
    lo2 = centered.where(F.col("pos") < 32).select(
        F.col("vec_id").alias("v2"),
        F.col("pos").alias("j"),
        F.col("c").alias("cb"),
    )
    hi1 = centered.where(F.col("pos") >= 32).select(
        "vec_id", (F.col("pos") - 32).alias("i"), F.col("c").alias("ca")
    )

    def gram(a, b):
        return (
            a.join(b, a.vec_id == b.v2)
            .groupBy("i", "j")
            .agg(
                F.sum(
                    F.floor(F.col("ca") * F.col("cb") * F.lit(1e10)).cast(
                        "bigint"
                    )
                )
                .cast("bigint")
                .alias("q")
            )
        )

    def frob(g):
        qd = F.col("q").cast("double") / F.lit(1e10)
        return g.agg(
            F.sum(F.floor(qd * qd * F.lit(1e6)).cast("bigint"))
            .cast("bigint")
            .alias("s_q6")
        )

    sxy = frob(gram(lo, hi)).select(F.col("s_q6").alias("sxy_q6"))
    sxx = frob(gram(lo, lo2)).select(F.col("s_q6").alias("sxx_q6"))
    syy = frob(gram(hi1, hi)).select(F.col("s_q6").alias("syy_q6"))
    out = (
        sxy.crossJoin(F.broadcast(sxx))
        .crossJoin(F.broadcast(syy))
        .crossJoin(F.broadcast(nn))
    )
    return out.select(
        F.col("n").alias("n_vectors"),
        F.round(
            (F.col("sxy_q6").cast("double") / F.lit(1e6))
            / (
                F.sqrt(F.col("sxx_q6").cast("double") / F.lit(1e6))
                * F.sqrt(F.col("syy_q6").cast("double") / F.lit(1e6))
            ),
            6,
        ).alias("linear_cka"),
    )

# ==== wave 149b: recommendation-quality pair — coverage & diversity


@register(
    "q_vec_intra_list_diversity",
    oracle="""
        WITH words AS (
            SELECT vec_id, embedding FROM embeddings
        ),
        nn AS (
            SELECT query_id, neighbor_id FROM (
                SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                       ROW_NUMBER() OVER (
                            PARTITION BY q.vec_id
                            ORDER BY list_cosine_similarity(
                                         q.embedding, n.embedding) DESC,
                                     n.vec_id
                       ) AS rank
                FROM (SELECT * FROM embeddings WHERE vec_id < 10) q
                JOIN embeddings n ON n.vec_id <> q.vec_id
            ) WHERE rank <= 5
        ),
        pairs AS (
            SELECT a.query_id,
                   CAST(floor(list_cosine_similarity(ea.embedding,
                                                     eb.embedding) * 1e8)
                        AS BIGINT) AS sim_q8
            FROM nn a JOIN nn b
              ON a.query_id = b.query_id
             AND a.neighbor_id < b.neighbor_id
            JOIN words ea ON ea.vec_id = a.neighbor_id
            JOIN words eb ON eb.vec_id = b.neighbor_id
        ),
        ild AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   CAST(SUM(sim_q8) AS BIGINT) AS s_q8
            FROM pairs
        ),
        cov AS (
            SELECT CAST(COUNT(DISTINCT neighbor_id) AS BIGINT)
                       AS n_recommended,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings)
                       AS n_catalog
            FROM nn
        )
        SELECT (SELECT CAST(COUNT(DISTINCT query_id) AS BIGINT) FROM nn)
                   AS n_queries,
               c.n_recommended, c.n_catalog,
               ROUND(CAST(c.n_recommended AS DOUBLE) / c.n_catalog, 6)
                   AS catalog_coverage,
               ROUND(1 - CAST(i.s_q8 AS DOUBLE) / 1e8 / i.n_pairs, 6)
                   AS mean_ild
        FROM ild i CROSS JOIN cov c
    """,
    section="V24",
    doc="Recommendation-quality pair over the V3 top-5 lists: catalog "
    "COVERAGE (share of the corpus any list ever surfaces — low "
    "coverage means the retriever recycles the same popular items) "
    "and intra-list DIVERSITY (1 - mean pairwise cosine WITHIN each "
    "list, pooled) — the two metrics that expose a retriever which "
    "aces V12's recall while returning five near-copies of the same "
    "thing; together with V20's MMR re-ranker they form the "
    "diversity measure-and-fix pair. Per-pair similarities are "
    "floor(sim*1e8)-quantized before the pooled sum (10 queries x "
    "C(5,2) pairs — integer, order-insensitive); coverage is pure "
    "counting. Scale: the pair stage is k^2 per query on ALREADY-"
    "RANKED lists (never the corpus); the neighbor-embedding joins "
    "broadcast the 50-row list table against the corpus.",
)
def q_vec_intra_list_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries.vectors_p01 import q_vec_cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    nn = q_vec_cosine_topk(spark, sf_dir).select("query_id", "neighbor_id")
    a = nn.select("query_id", F.col("neighbor_id").alias("na"))
    b = nn.select(
        F.col("query_id").alias("q2"), F.col("neighbor_id").alias("nb")
    )
    ea = emb.select(
        F.col("vec_id").alias("na"), F.col("embedding").alias("emb_a")
    ).withColumn("norm_a", F.sqrt(_sq_norm("emb_a")))
    eb = emb.select(
        F.col("vec_id").alias("nb"), F.col("embedding").alias("emb_b")
    ).withColumn("norm_b", F.sqrt(_sq_norm("emb_b")))
    sim = _dot("emb_a", "emb_b") / (F.col("norm_a") * F.col("norm_b"))
    pairs = (
        a.join(
            b,
            (F.col("query_id") == F.col("q2"))
            & (F.col("na") < F.col("nb")),
        )
        .join(ea, "na")
        .join(eb, "nb")
        .select(
            F.floor(sim * F.lit(1e8)).cast("bigint").alias("sim_q8")
        )
    )
    ild = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("sim_q8").cast("bigint").alias("s_q8"),
    )
    cov = nn.agg(
        F.countDistinct("query_id").cast("bigint").alias("n_queries"),
        F.countDistinct("neighbor_id").cast("bigint").alias("n_recommended"),
    ).crossJoin(
        F.broadcast(
            emb.agg(F.count(F.lit(1)).cast("bigint").alias("n_catalog"))
        )
    )
    return ild.crossJoin(F.broadcast(cov)).select(
        "n_queries",
        "n_recommended",
        "n_catalog",
        F.round(
            F.col("n_recommended").cast("double") / F.col("n_catalog"), 6
        ).alias("catalog_coverage"),
        F.round(
            1
            - F.col("s_q8").cast("double")
            / F.lit(1e8)
            / F.col("n_pairs"),
            6,
        ).alias("mean_ild"),
    )

@register(
    "q_vec_rrf_fusion",
    oracle=f"""
        WITH words AS (
            SELECT vec_id, {_pack_duck(1)} AS wlo, {_pack_duck(33)} AS whi
            FROM embeddings
        ),
        hq AS (SELECT vec_id AS qid, wlo AS qlo, whi AS qhi FROM words
               WHERE vec_id < {_HAM_NQ}),
        ham AS (
            SELECT qid, nid, rnk FROM (
                SELECT hq.qid, c.vec_id AS nid,
                       row_number() OVER (
                           PARTITION BY hq.qid
                           ORDER BY bit_count(xor(hq.qlo, c.wlo))
                                    + bit_count(xor(hq.qhi, c.whi)), c.vec_id
                       ) AS rnk
                FROM hq JOIN words c ON c.vec_id <> hq.qid
            ) WHERE rnk <= 10
        ),
        cos AS (
            SELECT query_id, neighbor_id, rank FROM (
                SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                       ROW_NUMBER() OVER (
                            PARTITION BY q.vec_id
                            ORDER BY list_cosine_similarity(
                                         q.embedding, n.embedding) DESC,
                                     n.vec_id
                       ) AS rank
                FROM (SELECT * FROM embeddings WHERE vec_id < {_HAM_NQ}) q
                JOIN embeddings n ON n.vec_id <> q.vec_id
            ) WHERE rank <= 10
        ),
        scored AS (
            SELECT COALESCE(c.query_id, h.qid) AS query_id,
                   COALESCE(c.neighbor_id, h.nid) AS neighbor_id,
                   COALESCE(CASE WHEN c.rank = 1 THEN CAST(16393442622 AS BIGINT) WHEN c.rank = 2 THEN CAST(16129032258 AS BIGINT) WHEN c.rank = 3 THEN CAST(15873015873 AS BIGINT) WHEN c.rank = 4 THEN CAST(15625000000 AS BIGINT) WHEN c.rank = 5 THEN CAST(15384615384 AS BIGINT) WHEN c.rank = 6 THEN CAST(15151515151 AS BIGINT) WHEN c.rank = 7 THEN CAST(14925373134 AS BIGINT) WHEN c.rank = 8 THEN CAST(14705882352 AS BIGINT) WHEN c.rank = 9 THEN CAST(14492753623 AS BIGINT) WHEN c.rank = 10 THEN CAST(14285714285 AS BIGINT) END, 0)
                   + COALESCE(CASE WHEN h.rnk = 1 THEN CAST(16393442622 AS BIGINT) WHEN h.rnk = 2 THEN CAST(16129032258 AS BIGINT) WHEN h.rnk = 3 THEN CAST(15873015873 AS BIGINT) WHEN h.rnk = 4 THEN CAST(15625000000 AS BIGINT) WHEN h.rnk = 5 THEN CAST(15384615384 AS BIGINT) WHEN h.rnk = 6 THEN CAST(15151515151 AS BIGINT) WHEN h.rnk = 7 THEN CAST(14925373134 AS BIGINT) WHEN h.rnk = 8 THEN CAST(14705882352 AS BIGINT) WHEN h.rnk = 9 THEN CAST(14492753623 AS BIGINT) WHEN h.rnk = 10 THEN CAST(14285714285 AS BIGINT) END, 0) AS s_q12
            FROM cos c FULL OUTER JOIN ham h
              ON c.query_id = h.qid AND c.neighbor_id = h.nid
        ),
        fused AS (
            SELECT query_id, neighbor_id, s_q12,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_id
                       ORDER BY s_q12 DESC, neighbor_id) AS fused_rank
            FROM scored
        )
        SELECT query_id, neighbor_id,
               CAST(fused_rank AS BIGINT) AS fused_rank,
               ROUND(CAST(s_q12 AS DOUBLE) / 1e12, 8) AS rrf_score
        FROM fused WHERE fused_rank <= 5
    """,
    section="V25",
    doc=f"Reciprocal-rank fusion (k = {_RRF_K}) of the exact cosine "
    "ranking (V3) and the binary Hamming ranking (V17), top-5 fused "
    "per query — THE hybrid-retrieval merge (RRF is what search "
    "engines use to fuse lexical + vector lists precisely because it "
    "needs only RANKS, no score calibration between incomparable "
    "systems). A doc absent from one list contributes zero from it — "
    "the standard convention, realized as a FULL OUTER join of the "
    "two top-10 lists. Determinism: the ten possible 1/(k+r) masses "
    "are Python-precomputed floor(1e12/(k+r)) BIGINT literals (the "
    "V22 device), so fusion is integer addition and the fused "
    "ordering ties break on neighbor id. Scale: inherits V3/V17 "
    "serving shapes; fusion itself touches only 10+10 rows/query.",
)
def q_vec_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    from ai_to_cvent_etl_spark.queries._util import fan_out

    words = emb.select(
        "vec_id",
        F.expr(_pack_spark(1)).alias("wlo"),
        F.expr(_pack_spark(33)).alias("whi"),
    )
    hq = words.where(F.col("vec_id") < _HAM_NQ).select(
        F.col("vec_id").alias("qid"),
        F.col("wlo").alias("qlo"),
        F.col("whi").alias("qhi"),
    )
    ham = (
        words.join(F.broadcast(hq), F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("nid"),
            (
                F.bit_count(F.col("qlo").bitwiseXOR(F.col("wlo")))
                + F.bit_count(F.col("qhi").bitwiseXOR(F.col("whi")))
            ).alias("hamming"),
        )
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("qid").orderBy("hamming", "nid")
            ),
        )
        .where(F.col("rnk") <= 10)
        .select("qid", "nid", "rnk")
    )
    q = emb.filter(F.col("vec_id") < _HAM_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    ).withColumn("q_norm", F.sqrt(_sq_norm("q_emb")))
    n = fan_out(
        emb.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("n_emb"),
        ).withColumn("n_norm", F.sqrt(_sq_norm("n_emb")))
    )
    sim = _dot("q_emb", "n_emb") / (F.col("q_norm") * F.col("n_norm"))
    cos = (
        F.broadcast(q)
        .join(n, F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", sim)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("sim").desc(), F.col("neighbor_id").asc()
                )
            ),
        )
        .where(F.col("rank") <= 10)
        .select("query_id", "neighbor_id", "rank")
    )

    def mass(rank_col):
        e = F.lit(0).cast("bigint")
        for r in range(10, 0, -1):
            e = F.when(rank_col == r, F.lit(_RRF_Q12[r - 1])).otherwise(e)
        return F.coalesce(e, F.lit(0))

    scored = cos.join(
        ham,
        (cos.query_id == ham.qid) & (cos.neighbor_id == ham.nid),
        "full_outer",
    ).select(
        F.coalesce(F.col("query_id"), F.col("qid")).alias("query_id"),
        F.coalesce(F.col("neighbor_id"), F.col("nid")).alias("neighbor_id"),
        (mass(F.col("rank")) + mass(F.col("rnk"))).alias("s_q12"),
    )
    fused = scored.withColumn(
        "fused_rank",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(
                F.col("s_q12").desc(), F.col("neighbor_id").asc()
            )
        ),
    ).where(F.col("fused_rank") <= 5)
    return fused.select(
        "query_id",
        "neighbor_id",
        F.col("fused_rank").cast("bigint").alias("fused_rank"),
        F.round(F.col("s_q12").cast("double") / F.lit(1e12), 8).alias(
            "rrf_score"
        ),
    )

@register(
    "q_vec_lof",
    oracle=f"""
        WITH base AS MATERIALIZED (
            SELECT vec_id, embedding FROM embeddings
            WHERE vec_id < {_LOF_CAP}
        ),
        dist AS MATERIALIZED (
            SELECT a.vec_id AS u, b.vec_id AS v,
                   CAST(list_sum(list_transform(
                        list_zip(a.embedding, b.embedding),
                        p -> floor((CAST(p[1] AS DOUBLE)
                                    - CAST(p[2] AS DOUBLE))
                                   * (CAST(p[1] AS DOUBLE)
                                      - CAST(p[2] AS DOUBLE))
                                   * 1e12))) AS BIGINT) AS qd
            FROM base a JOIN base b ON a.vec_id <> b.vec_id
        ),
        knn AS MATERIALIZED (
            SELECT u, v, qd FROM (
                SELECT u, v, qd,
                       ROW_NUMBER() OVER (PARTITION BY u
                                          ORDER BY qd, v) AS rk
                FROM dist
            ) WHERE rk <= {_LOF_K}
        ),
        kd AS (SELECT u, MAX(qd) AS kdist FROM knn GROUP BY u),
        reach AS (
            SELECT k.u, k.v, GREATEST(d.kdist, k.qd) AS rd
            FROM knn k JOIN kd d ON d.u = k.v
        ),
        ssum AS (
            SELECT u, CAST(SUM(rd) AS BIGINT) AS s
            FROM reach GROUP BY u
        ),
        lofq AS (
            SELECT k.u,
                   CAST(SUM(CAST(floor(1e8 * CAST(su.s AS DOUBLE)
                                       / CAST(so.s AS DOUBLE))
                                 AS BIGINT)) AS BIGINT) AS lq
            FROM knn k
            JOIN ssum su ON su.u = k.u
            JOIN ssum so ON so.u = k.v
            GROUP BY k.u
        )
        SELECT l.u AS vec_id, d.kdist AS kdist_q, s.s AS reach_sum,
               ROUND(CAST(l.lq AS DOUBLE) / {_LOF_K}e8, 6) AS lof
        FROM lofq l
        JOIN kd d ON d.u = l.u
        JOIN ssum s ON s.u = l.u
    """,
    section="V39",
    doc=f"Local Outlier Factor (k={_LOF_K}, slice vec_id < {_LOF_CAP}) "
    "over the embedding corpus — THE density-based anomaly score for "
    "embedding curation: LOF >> 1 flags points whose local density is "
    "far below their neighbors' (mislabeled / off-distribution docs), "
    "which a global distance threshold misses in corpora with mixed "
    "cluster densities. Pipeline: quantized squared L2 (per-term "
    "floor((x-y)^2 * 1e12) fold, V26 device => every distance an "
    "exact int64, ranks deterministic), top-k by (qd, v), k-distance "
    "= max qd in the neighborhood, reachability rd = max(kdist(o), "
    "d(u,o)), lrd^-1 = sum(rd), and LOF rebuilt order-insensitively "
    "as sum(floor(1e8 * S_u/S_o))/(k*1e8) — the per-neighbor ratio "
    "quantizes to int64 BEFORE the sum so no double accumulation "
    "order can leak. Scale: the all-pairs build is capped to the "
    "slice as the correctness oracle; the full-corpus path feeds the "
    "SAME kdist/reach/ratio algebra from IVF/LSH candidate kNN "
    "(D4/D7) — only candidate pairs shuffle, and everything after "
    "kNN is k rows per point.",
)
def q_vec_lof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import fan_out

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < _LOF_CAP
    )
    base = emb.select("vec_id", "embedding")
    a = fan_out(
        base.select(
            F.col("vec_id").alias("u"), F.col("embedding").alias("a_emb")
        )
    )
    b = base.select(
        F.col("vec_id").alias("v"), F.col("embedding").alias("b_emb")
    )
    qd = F.aggregate(
        F.zip_with(
            F.col("a_emb"),
            F.col("b_emb"),
            lambda x, y: F.floor(
                (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double"))
                * F.lit(1e12)
            ).cast("double"),
        ),
        F.lit(0.0),
        lambda acc, t: acc + t,
    ).cast("bigint")
    dist = a.join(F.broadcast(b), F.col("u") != F.col("v")).select(
        "u", "v", qd.alias("qd")
    )
    rk = F.row_number().over(
        Window.partitionBy("u").orderBy(F.asc("qd"), F.asc("v"))
    )
    knn = (
        dist.withColumn("rk", rk)
        .where(F.col("rk") <= _LOF_K)
        .select("u", "v", "qd")
    )
    kd = knn.groupBy("u").agg(F.max("qd").alias("kdist"))
    reach = knn.join(
        F.broadcast(kd.select(F.col("u").alias("v"),
                              F.col("kdist").alias("kdist_o"))),
        "v",
    ).select("u", "v", F.greatest(F.col("kdist_o"), F.col("qd")).alias("rd"))
    ssum = reach.groupBy("u").agg(F.sum("rd").cast("bigint").alias("s"))
    pairs = (
        knn.select("u", "v")
        .join(F.broadcast(ssum), "u")
        .join(
            F.broadcast(ssum.select(F.col("u").alias("v"),
                                    F.col("s").alias("s_o"))),
            "v",
        )
    )
    lofq = pairs.groupBy("u").agg(
        F.sum(
            F.floor(
                F.lit(1e8) * F.col("s").cast("double")
                / F.col("s_o").cast("double")
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("lq")
    )
    return (
        lofq.join(F.broadcast(kd), "u")
        .join(F.broadcast(ssum), "u")
        .select(
            F.col("u").alias("vec_id"),
            F.col("kdist").alias("kdist_q"),
            F.col("s").alias("reach_sum"),
            F.round(
                F.col("lq").cast("double") / F.lit(float(_LOF_K) * 1e8), 6
            ).alias("lof"),
        )
    )

@register(
    "q_vec_knn_label_test",
    oracle=f"""
        WITH base AS MATERIALIZED (
            SELECT vec_id, label, embedding FROM embeddings
            WHERE vec_id < {_SH_CAP}
        ),
        dist AS MATERIALIZED (
            SELECT a.vec_id AS u, a.label AS ul, b.label AS vl,
                   CAST(list_sum(list_transform(
                        list_zip(a.embedding, b.embedding),
                        p -> floor((CAST(p[1] AS DOUBLE)
                                    - CAST(p[2] AS DOUBLE))
                                   * (CAST(p[1] AS DOUBLE)
                                      - CAST(p[2] AS DOUBLE))
                                   * 1e12))) AS BIGINT) AS qd,
                   b.vec_id AS v
            FROM base a JOIN base b ON a.vec_id <> b.vec_id
        ),
        knn AS (
            SELECT ul, vl FROM (
                SELECT ul, vl,
                       ROW_NUMBER() OVER (PARTITION BY u
                                          ORDER BY qd, v) AS rk
                FROM dist
            ) WHERE rk <= {_SH_K}
        ),
        obs AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
                   CAST(SUM(CASE WHEN ul = vl THEN 1 ELSE 0 END)
                        AS BIGINT) AS s_same
            FROM knn
        ),
        marg AS (
            SELECT CAST(SUM(ng) AS BIGINT) AS n,
                   CAST(SUM(ng * (ng - 1)) AS BIGINT) AS same_pairs
            FROM (SELECT CAST(COUNT(*) AS BIGINT) AS ng
                  FROM base GROUP BY label)
        )
        SELECT m.n, o.n_edges, o.s_same,
               ROUND(CAST(o.s_same AS DOUBLE) / o.n_edges, 6) AS t_obs,
               ROUND(CAST(m.same_pairs AS DOUBLE)
                     / (CAST(m.n AS DOUBLE) * (m.n - 1)), 6) AS t_null,
               ROUND(CAST(o.s_same AS DOUBLE) / o.n_edges
                     / (CAST(m.same_pairs AS DOUBLE)
                        / (CAST(m.n AS DOUBLE) * (m.n - 1))), 6)
                   AS clustering_ratio
        FROM obs o CROSS JOIN marg m
    """,
    section="V40",
    doc=f"Schilling-Henze kNN multisample test (k={_SH_K}, slice "
    f"vec_id < {_SH_CAP}): the fraction of kNN edges whose endpoints "
    "share a label, against its exact permutation-null expectation "
    "sum_g n_g(n_g-1) / (n(n-1)) — clustering_ratio >> 1 means the "
    "label classes occupy separated regions of embedding space "
    "(labels are learnable from geometry); ~1 means the labels are "
    "geometrically random. This is THE nonparametric check that an "
    "embedding model actually separates a taxonomy, and the "
    "closed-form null is what V29's raw nn-label-error lacks. "
    "Same quantized-int64 distance fold as V39 (ranks exact), "
    "observed and null are pure integer counts, three divisions at "
    "the end. Scale: all-pairs capped to the slice as oracle; the "
    "full-corpus statistic rides any blocked kNN (D4/D7) since only "
    "label pairs per edge aggregate — one global sum.",
)
def q_vec_knn_label_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import fan_out

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < _SH_CAP
    )
    base = emb.select("vec_id", "label", "embedding")
    a = fan_out(
        base.select(
            F.col("vec_id").alias("u"),
            F.col("label").alias("ul"),
            F.col("embedding").alias("a_emb"),
        )
    )
    b = base.select(
        F.col("vec_id").alias("v"),
        F.col("label").alias("vl"),
        F.col("embedding").alias("b_emb"),
    )
    qd = F.aggregate(
        F.zip_with(
            F.col("a_emb"),
            F.col("b_emb"),
            lambda x, y: F.floor(
                (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double"))
                * F.lit(1e12)
            ).cast("double"),
        ),
        F.lit(0.0),
        lambda acc, t: acc + t,
    ).cast("bigint")
    dist = a.join(F.broadcast(b), F.col("u") != F.col("v")).select(
        "u", "ul", "vl", qd.alias("qd"), "v"
    )
    rk = F.row_number().over(
        Window.partitionBy("u").orderBy(F.asc("qd"), F.asc("v"))
    )
    knn = dist.withColumn("rk", rk).where(F.col("rk") <= _SH_K)
    obs = knn.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_edges"),
        F.sum(F.when(F.col("ul") == F.col("vl"), 1).otherwise(0))
        .cast("bigint")
        .alias("s_same"),
    )
    marg = (
        base.groupBy("label")
        .agg(F.count(F.lit(1)).cast("bigint").alias("ng"))
        .agg(
            F.sum("ng").cast("bigint").alias("n"),
            F.sum(F.col("ng") * (F.col("ng") - 1))
            .cast("bigint")
            .alias("same_pairs"),
        )
    )
    t_obs = F.col("s_same").cast("double") / F.col("n_edges")
    t_null = F.col("same_pairs").cast("double") / (
        F.col("n").cast("double") * (F.col("n") - 1)
    )
    return obs.crossJoin(F.broadcast(marg)).select(
        "n",
        "n_edges",
        "s_same",
        F.round(t_obs, 6).alias("t_obs"),
        F.round(t_null, 6).alias("t_null"),
        F.round(t_obs / t_null, 6).alias("clustering_ratio"),
    )

@register(
    "q_vec_dunn_index",
    oracle=f"""
        WITH {{km}},
        pts AS (
            SELECT a2.vec_id, a2.cluster, e.embedding
            FROM a2 JOIN embeddings e USING (vec_id)
            WHERE a2.vec_id < {_DUNN_CAP}
        ),
        pd AS (
            SELECT a.cluster AS ca, b.cluster AS cb,
                   CAST(list_sum(list_transform(
                        list_zip(a.embedding, b.embedding),
                        p -> floor((CAST(p[1] AS DOUBLE)
                                    - CAST(p[2] AS DOUBLE))
                                   * (CAST(p[1] AS DOUBLE)
                                      - CAST(p[2] AS DOUBLE))
                                   * 1e12))) AS BIGINT) AS qd
            FROM pts a JOIN pts b ON a.vec_id < b.vec_id
        ),
        agg AS (
            SELECT CAST(MIN(CASE WHEN ca <> cb THEN qd END) AS BIGINT)
                       AS min_inter,
                   CAST(MAX(CASE WHEN ca = cb THEN qd END) AS BIGINT)
                       AS max_intra,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs
            FROM pd
        )
        SELECT n_pairs, min_inter, max_intra,
               ROUND(sqrt(CAST(min_inter AS DOUBLE))
                     / sqrt(CAST(max_intra AS DOUBLE)), 6)
                   AS dunn_index
        FROM agg
    """.format(km=_DUNN_KM_CTES),
    section="V42",
    doc=f"Dunn index of the V6 k-means clustering (slice vec_id < "
    f"{_DUNN_CAP}): min inter-cluster point distance / max "
    "intra-cluster diameter — the worst-case cluster-validity "
    "index that complements the averaged views (V23 silhouette, "
    "V33 Calinski-Harabasz, V34 Davies-Bouldin): one pair of "
    "touching clusters tanks Dunn even when every average looks "
    "healthy, which is exactly the failure mode that matters for "
    "IVF routing (V41's imbalance says cells are even; Dunn says "
    "whether their BOUNDARIES are clean). Both extremes are exact "
    "int64 quantized distances (V26 fold), so the index is one "
    "sqrt ratio. Scale: all-pairs on the slice as oracle; the "
    "full-corpus path takes min/max over IVF candidate pairs only "
    "— extremes are trivially mergeable map-side.",
)
def q_vec_dunn_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.operators.kmeans import kmeans_fit_assign
    from ai_to_cvent_etl_spark.queries._util import fan_out

    emb = load_table(spark, sf_dir, "embeddings")
    assigned = kmeans_fit_assign(emb, k=8, iters=2, cache_key=sf_dir)
    pts = (
        assigned.select("vec_id", "cluster")
        .join(emb.select("vec_id", "embedding"), "vec_id")
        .where(F.col("vec_id") < _DUNN_CAP)
        .select("vec_id", "cluster", "embedding")
    )
    a = fan_out(
        pts.select(
            F.col("vec_id").alias("ua"),
            F.col("cluster").alias("ca"),
            F.col("embedding").alias("a_emb"),
        )
    )
    b = pts.select(
        F.col("vec_id").alias("ub"),
        F.col("cluster").alias("cb"),
        F.col("embedding").alias("b_emb"),
    )
    qd = F.aggregate(
        F.zip_with(
            F.col("a_emb"),
            F.col("b_emb"),
            lambda x, y: F.floor(
                (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double"))
                * F.lit(1e12)
            ).cast("double"),
        ),
        F.lit(0.0),
        lambda acc, t: acc + t,
    ).cast("bigint")
    pd_ = a.join(F.broadcast(b), F.col("ua") < F.col("ub")).select(
        "ca", "cb", qd.alias("qd")
    )
    agg = pd_.agg(
        F.min(F.when(F.col("ca") != F.col("cb"), F.col("qd")))
        .cast("bigint")
        .alias("min_inter"),
        F.max(F.when(F.col("ca") == F.col("cb"), F.col("qd")))
        .cast("bigint")
        .alias("max_intra"),
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
    )
    return agg.select(
        "n_pairs",
        "min_inter",
        "max_intra",
        F.round(
            F.sqrt(F.col("min_inter").cast("double"))
            / F.sqrt(F.col("max_intra").cast("double")),
            6,
        ).alias("dunn_index"),
    )

# ==== wave 193b: participation ratio of per-dim variances (V43) =====


@register(
    "q_vec_participation_ratio",
    oracle="""
        WITH comps AS (
            SELECT u.pos AS dim,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(u.q) AS BIGINT) AS s,
                   CAST(SUM(u.q * u.q) AS BIGINT) AS qq
            FROM (
                SELECT unnest(list_transform(embedding,
                       (x, i) -> struct_pack(
                           q := CAST(floor(CAST(x AS DOUBLE) * 1000000.0)
                                     AS BIGINT),
                           pos := i))) AS u
                FROM embeddings
            )
            GROUP BY u.pos
        ),
        vars AS (
            SELECT dim,
                   (CAST(qq AS DOUBLE)
                    - CAST(s AS DOUBLE) * s / n) / n AS v
            FROM comps
        ),
        agg AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS d,
                   CAST(SUM(CAST(floor(v) AS BIGINT)) AS BIGINT) AS sv,
                   CAST(SUM(CAST(floor(v / 1e6) AS BIGINT)
                            * CAST(floor(v / 1e6) AS BIGINT))
                        AS BIGINT) AS sv2
            FROM vars
        )
        SELECT d AS n_dims,
               ROUND(CAST(sv AS DOUBLE) / 1e12, 6) AS total_var,
               ROUND(CAST(sv AS DOUBLE) / 1e12 * (CAST(sv AS DOUBLE)
                     / 1e12) / (CAST(sv2 AS DOUBLE) / 1e12), 4)
                   AS participation_ratio,
               ROUND(CAST(sv AS DOUBLE) * sv / sv2 / 1e12 / d, 6)
                   AS pr_fraction
        FROM agg
    """,
    section="V43",
    doc="Participation ratio of per-dimension variances: PR = "
    "(sum v_d)^2 / sum v_d^2 — the effective number of dimensions "
    "the embedding actually uses (isotropic Gaussian -> PR = d; a "
    "collapsed representation -> PR << d), the cheap anisotropy "
    "diagnostic representation-learning papers report next to the "
    "eigen-spectrum, and unlike V16/V22's power-iteration PCA it "
    "needs NO iteration: only the per-dimension second moments. "
    "Embedding components quantize floor(x*1e6) to int64 first, so "
    "per-dim sums and sums-of-squares are exact; per-dim variances "
    "re-quantize (floor(v) for the sum, floor(v/1e6) for the "
    "squares, keeping sv2 within int64 at any corpus size) before "
    "the 64-term reduction — no double accumulation order anywhere. "
    "Scale: one (dim)-keyed agg after a map-side explode — 64 rows "
    "of state; at 100 TB this is the cheapest representation-health "
    "probe there is.",
)
def q_vec_participation_ratio(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    comps = (
        emb.select(
            F.posexplode(
                F.transform(
                    F.col("embedding"),
                    lambda x: F.floor(
                        x.cast("double") * F.lit(1000000.0)
                    ).cast("bigint"),
                )
            ).alias("pos0", "q")
        )
        .select((F.col("pos0") + 1).alias("dim"), "q")
        .groupBy("dim")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("q").cast("bigint").alias("s"),
            F.sum(F.col("q") * F.col("q")).cast("bigint").alias("qq"),
        )
    )
    v = (
        F.col("qq").cast("double")
        - F.col("s").cast("double") * F.col("s") / F.col("n")
    ) / F.col("n")
    vars_ = comps.select("dim", v.alias("v"))
    agg = vars_.agg(
        F.count(F.lit(1)).cast("bigint").alias("d"),
        F.sum(F.floor(F.col("v")).cast("bigint"))
        .cast("bigint")
        .alias("sv"),
        F.sum(
            F.floor(F.col("v") / F.lit(1e6)).cast("bigint")
            * F.floor(F.col("v") / F.lit(1e6)).cast("bigint")
        )
        .cast("bigint")
        .alias("sv2"),
    )
    sv_d = F.col("sv").cast("double")
    return agg.select(
        F.col("d").alias("n_dims"),
        F.round(sv_d / F.lit(1e12), 6).alias("total_var"),
        F.round(
            sv_d / F.lit(1e12) * (sv_d / F.lit(1e12))
            / (F.col("sv2").cast("double") / F.lit(1e12)),
            4,
        ).alias("participation_ratio"),
        F.round(
            sv_d * F.col("sv") / F.col("sv2") / F.lit(1e12) / F.col("d"),
            6,
        ).alias("pr_fraction"),
    )

@register(
    "q_vec_index_memory_budget",
    oracle=f"""
        WITH stats AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings
        ),
        plans AS (
            SELECT 'flat' AS index_type,
                   n * {_IMB_DIM} * 4 + n * 8 AS bytes
            FROM stats
            UNION ALL
            SELECT 'ivf_flat',
                   n * {_IMB_DIM} * 4 + n * 8
                   + {_IMB_K} * {_IMB_DIM} * 4 + n * 8
            FROM stats
            UNION ALL
            SELECT 'ivf_pq',
                   n * {_IMB_M} + n * 8
                   + {_IMB_K} * {_IMB_DIM} * 4
                   + {_IMB_M} * 256 * ({_IMB_DIM} // {_IMB_M}) * 4
            FROM stats
        )
        SELECT p.index_type,
               (SELECT n FROM stats) AS n_vectors,
               CAST(p.bytes AS BIGINT) AS bytes_est,
               ROUND(CAST(p.bytes AS DOUBLE)
                     / ((SELECT n FROM stats) * {_IMB_DIM} * 4), 6)
                   AS ratio_vs_raw,
               CASE WHEN p.bytes <= 134217728 THEN 'fits_128mb_exec'
                    ELSE 'needs_sharding' END AS placement
        FROM plans p
    """,
    section="V45",
    doc=f"ANN index memory budget from corpus stats — the FAISS "
    "sizing table as a query: flat (n*d*4 + ids), IVF-flat (+ "
    f"{_IMB_K} coarse centroids + inverted-list ids), IVF-PQ "
    f"(n*{_IMB_M}-byte codes + codebooks) for the exact V6/V8 "
    "configurations this engine trains — capacity planning BEFORE "
    "building (ratio_vs_raw is the compression the PQ path buys: "
    "~16x here, 64x with production dims; placement says whether "
    "the serving index fits a 128 MiB executor slice or must "
    "shard). Every size is exact integer arithmetic off ONE "
    "count; the only doubles are the ratio and nothing else. "
    "Scale: one COUNT — the cheapest query in the registry, and "
    "the one you run first at 100 TB.",
)
def q_vec_index_memory_budget(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    stats = emb.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    d4 = _IMB_DIM * 4
    rows = [
        ("flat", lambda n: n * d4 + n * 8),
        (
            "ivf_flat",
            lambda n: n * d4 + n * 8 + _IMB_K * d4 + n * 8,
        ),
        (
            "ivf_pq",
            lambda n: n * _IMB_M
            + n * 8
            + _IMB_K * d4
            + _IMB_M * 256 * (_IMB_DIM // _IMB_M) * 4,
        ),
    ]
    outs = []
    for name, fn in rows:
        b = fn(F.col("n"))
        outs.append(
            stats.select(
                F.lit(name).alias("index_type"),
                F.col("n").alias("n_vectors"),
                b.cast("bigint").alias("bytes_est"),
                F.round(
                    b.cast("double")
                    / (F.col("n") * F.lit(d4)),
                    6,
                ).alias("ratio_vs_raw"),
                F.when(
                    b <= F.lit(134217728), F.lit("fits_128mb_exec")
                )
                .otherwise(F.lit("needs_sharding"))
                .alias("placement"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionAll(o)
    return res
