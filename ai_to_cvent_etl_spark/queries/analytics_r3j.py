"""Twelfth-wave operators (r3 continuation): period-over-period growth,
network assortativity, and k-NN classification evaluation.

  W22 q_win_growth_rates   — day-over-day and week-over-week revenue
                             growth (the BI period-over-period staple,
                             composed on a gap-free daily spine).
  G9  q_graph_assortativity — degree assortativity of the shared trade
                             graph (do high-degree nodes link to
                             high-degree nodes?) via A26's exact-moment
                             Pearson device on the edge list.
  V15 q_vec_knn_classify   — k-NN label prediction + accuracy against
                             gold labels (majority vote over V3's
                             brute-force top-5; the lazy-classifier
                             eval loop).

Determinism notes (SURVEY §5.3):
  * W22 sums revenue in DECIMAL on a generated day spine (gap days are
    exact zeros); each growth rate is one IEEE division of
    deterministic decimal->double conversions; divide-by-zero days
    yield NULL identically on both engines.
  * G9 is integer degree moments (degree <= 8 by the shared graph's
    bound: all sums tiny) with one fixed IEEE expression for r.
  * V15's vote is an integer count; ties break on the SMALLEST label
    (deterministic argmax via min over max-count labels); accuracy is
    one division.

Scale notes:
  * W22 aggregates to the day spine first; the lag windows run on
    |days| rows.
  * G9 runs entirely on the bounded edge list (degree joins are
    |nodes|-sized).
  * V15 inherits V3's shape: 10 queries broadcast against the corpus,
    corpus never shuffles; the vote/accuracy stages run on 50 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register

# --- W22: period-over-period growth -----------------------------------------


@register(
    "q_win_growth_rates",
    oracle="""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
            FROM orders GROUP BY 1
        ),
        bounds AS (
            SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily
        ),
        spine AS (
            SELECT CAST(unnest(generate_series(lo, hi,
                        INTERVAL 1 DAY)) AS DATE) AS day
            FROM bounds
        ),
        filled AS (
            SELECT s.day,
                   COALESCE(CAST(d.rev AS DOUBLE), 0.0) AS revenue
            FROM spine s LEFT JOIN daily d ON s.day = d.day
        ),
        lagged AS (
            SELECT day, revenue,
                   lag(revenue, 1) OVER (ORDER BY day) AS prev_day,
                   lag(revenue, 7) OVER (ORDER BY day) AS prev_week
            FROM filled
        )
        SELECT day, revenue,
               CASE WHEN prev_day > 0
                    THEN (revenue - prev_day) / prev_day END AS dod_growth,
               CASE WHEN prev_week > 0
                    THEN (revenue - prev_week) / prev_week END AS wow_growth
        FROM lagged
    """,
    section="W22",
    doc="Day-over-day and week-over-week revenue growth on a gap-free "
    "generated day spine (the period-over-period BI staple; the spine "
    "matters — a missing day silently turns lag(7) into lag(7 present "
    "days)). Revenue is an exact DECIMAL daily sum; growth is one IEEE "
    "division; zero-revenue baselines yield NULL on both engines. The "
    "corpus collapses to |days| rows before any window runs. The lag "
    "window is a single ordered pass over the bounded spine.",
)
def q_win_growth_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    daily = od.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast(DecimalType(18, 2))).alias("rev")
    )
    bounds = daily.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("day")
    )
    filled = spine.join(daily, "day", "left").select(
        "day",
        F.coalesce(F.col("rev").cast("double"), F.lit(0.0)).alias("revenue"),
    )
    w = Window.orderBy("day")
    lagged = filled.select(
        "day",
        "revenue",
        F.lag("revenue", 1).over(w).alias("prev_day"),
        F.lag("revenue", 7).over(w).alias("prev_week"),
    )
    return lagged.select(
        "day",
        "revenue",
        F.when(
            F.col("prev_day") > 0,
            (F.col("revenue") - F.col("prev_day")) / F.col("prev_day"),
        ).alias("dod_growth"),
        F.when(
            F.col("prev_week") > 0,
            (F.col("revenue") - F.col("prev_week")) / F.col("prev_week"),
        ).alias("wow_growth"),
    )


# --- G9: degree assortativity -----------------------------------------------


def _assortativity_oracle() -> str:
    from ai_to_cvent_etl_spark.queries.analytics_r3b import _EDGE_CTES

    return f"""
        WITH {_EDGE_CTES},
        adj AS MATERIALIZED (
            SELECT lo AS a, hi AS b FROM edges
            UNION ALL SELECT hi, lo FROM edges
        ),
        deg AS MATERIALIZED (
            SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS d
            FROM adj GROUP BY a
        ),
        ed AS MATERIALIZED (
            SELECT da.d AS dx, db.d AS dy
            FROM adj j
            JOIN deg da ON da.node = j.a
            JOIN deg db ON db.node = j.b
        ),
        m AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(dx) AS BIGINT) AS sx,
                   CAST(SUM(dy) AS BIGINT) AS sy,
                   CAST(SUM(dx * dy) AS BIGINT) AS sxy,
                   CAST(SUM(dx * dx) AS BIGINT) AS sxx,
                   CAST(SUM(dy * dy) AS BIGINT) AS syy
            FROM ed
        )
        SELECT n,
               (CAST(n AS DOUBLE) * sxy
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (sqrt(CAST(n AS DOUBLE) * sxx
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * sqrt(CAST(n AS DOUBLE) * syy
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                   AS assortativity
        FROM m
    """


@register(
    "q_graph_assortativity",
    oracle=_assortativity_oracle(),
    section="G9",
    doc="Degree assortativity of the shared trade graph: Pearson "
    "correlation of endpoint degrees over the DIRECTED edge incidence "
    "(both orientations — the standard Newman formulation), telling "
    "whether well-connected suppliers trade with each other or with the "
    "periphery. Uses A26's exact-integer-moment Pearson device; degrees "
    "are <= 8 by the shared bound so every sum is tiny BIGINT. One "
    "bounded moment aggregation; a 1-row output.",
)
def q_graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries.analytics_r3b import (
        _mutual_affinity_edges,
    )

    edges = _mutual_affinity_edges(spark, sf_dir)
    adj = edges.select(F.col("lo").alias("a"), F.col("hi").alias("b")).unionByName(
        edges.select(F.col("hi").alias("a"), F.col("lo").alias("b"))
    )
    deg = adj.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    )
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("dx"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("dy"))
    ed = adj.join(da, "a").join(db, "b").select("dx", "dy")
    m = ed.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dx").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    return m.select(
        "n",
        (
            (nd * F.col("sxy") - sx * sy)
            / (
                F.sqrt(nd * F.col("sxx") - sx * sx)
                * F.sqrt(nd * F.col("syy") - sy * sy)
            )
        ).alias("assortativity"),
    )


# --- V15: k-NN label classification + accuracy ------------------------------

_KNN_K = 5


def _knn_oracle() -> str:
    return f"""
        WITH nn AS MATERIALIZED (
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
            ) WHERE rank <= {_KNN_K}
        ),
        votes AS (
            SELECT nn.query_id, e.label,
                   CAST(COUNT(*) AS BIGINT) AS n_votes
            FROM nn JOIN embeddings e ON nn.neighbor_id = e.vec_id
            GROUP BY nn.query_id, e.label
        ),
        pred AS (
            SELECT query_id, label AS pred_label FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id ORDER BY n_votes DESC, label
                ) AS rnk FROM votes
            ) WHERE rnk = 1
        )
        SELECT p.query_id, p.pred_label,
               CAST(g.label AS INTEGER) AS true_label,
               CASE WHEN p.pred_label = g.label THEN 1 ELSE 0 END AS is_correct
        FROM pred p JOIN embeddings g ON p.query_id = g.vec_id
    """


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
    from ai_to_cvent_etl_spark.queries.vectors import q_vec_cosine_topk

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
