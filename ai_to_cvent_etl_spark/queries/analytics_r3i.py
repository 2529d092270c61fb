"""Eleventh-wave operators (r3 continuation): robust statistics, graph
clustering structure, freshness auditing, and order-statistic sketches.

  W21 q_win_rolling_mad    — rolling median absolute deviation + robust
                             outlier score over the W17 frame (the
                             MAD-score companion to TS4's z-score).
  G8  q_graph_clustering_coeff — per-node local clustering coefficient
                             (triangles / possible wedges) over the
                             shared mutual top-8 graph.
  E18 q_etl_freshness_audit — per-source watermark/freshness audit: max
                             event time and lag vs the global watermark
                             (the data-SLA gate before a publish).
  SK4 q_sketch_kmv_distinct — K-Minimum-Values distinct-count sketch:
                             unlike HLL (A4/SK3, rows-only), KMV over a
                             deterministic md5 hash is EXACTLY
                             reproducible cross-engine, so the estimate
                             itself carries an exact oracle.

Determinism notes (SURVEY §5.3):
  * W21 works on floor(v*100) integers; the deviation array uses
    |2v - 2*med2| where med2 = a+b (the UNDOUBLED median sum of the two
    middle elements) so every intermediate stays integral — the final
    median/MAD halve exact even integers, and the robust score is one
    fixed IEEE division.
  * G8 is integer triangle/degree counts + one division.
  * E18 compares BIGINT microseconds (unix_micros == epoch_us, both
    exact integers on a µs-precision column).
  * SK4's hash is a 48-bit md5 prefix (exact in BIGINT and DOUBLE); the
    k-th order statistic is deterministic; the estimator
    (k-1) * 2^48 / h_k is one fixed IEEE expression — bit-identical.

Scale notes:
  * W21 is one window sort per user with a 7-row frame; the MAD is
    row-local array arithmetic on that bounded frame.
  * G8 reuses the degree-bounded shared graph; triangle counting
    inherits G2's <= 64-wedges-per-node bound.
  * E18 is one map-side-combinable keyed aggregation + a 1-row broadcast.
  * SK4 is the POINT of KMV: per-group state is the k smallest hashes
    (rank <= k over a keyed window), the corpus collapses to k rows per
    group before the estimator runs — bounded memory at any cardinality,
    and sketches from disjoint partitions union by re-ranking (the
    mergeable property, same as SK3's HLL but exactly reproducible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register

# --- W21: rolling median absolute deviation ---------------------------------

_MAD_FRAME = 7

# median*2 of a sorted BIGINT array (sum of the two middle elements, or
# twice the single middle) — stays integral so downstream |2v - med2| is
# exact; halved only at the very end.
_MED2 = (
    "case when size({a}) % 2 = 1"
    " then 2 * element_at({a}, cast((size({a}) + 1) div 2 as int))"
    " else element_at({a}, cast(size({a}) div 2 as int))"
    "      + element_at({a}, cast(size({a}) div 2 + 1 as int)) end"
)
_MED2_DUCK = (
    "CASE WHEN len({a}) % 2 = 1"
    " THEN 2 * {a}[(len({a}) + 1) // 2]"
    " ELSE {a}[len({a}) // 2] + {a}[len({a}) // 2 + 1] END"
)


@register(
    "q_win_rolling_mad",
    oracle=f"""
        WITH q AS (
            SELECT event_id, user_id, ts,
                   CAST(floor(value * 100) AS BIGINT) AS qv
            FROM events
        ),
        w AS (
            SELECT event_id, user_id, qv,
                   list_sort(list(qv) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN {_MAD_FRAME - 1} PRECEDING AND CURRENT ROW
                   )) AS arr
            FROM q
        ),
        m AS (
            SELECT event_id, user_id, qv, arr,
                   {_MED2_DUCK.format(a='arr')} AS med2
            FROM w
        ),
        d AS (
            SELECT event_id, user_id, qv, med2,
                   list_sort(list_transform(arr,
                       v -> abs(2 * v - med2))) AS dev
            FROM m
        )
        SELECT event_id, user_id, qv,
               CAST(med2 AS DOUBLE) / 2.0 AS med,
               CAST({_MED2_DUCK.format(a='dev')} AS DOUBLE) / 4.0 AS mad,
               CASE WHEN {_MED2_DUCK.format(a='dev')} > 0
                    THEN abs(2 * qv - med2) * 2.0
                         / CAST({_MED2_DUCK.format(a='dev')} AS DOUBLE)
               END AS mad_score
        FROM d
    """,
    section="W21",
    doc=f"Rolling median absolute deviation + robust MAD outlier score "
    f"over a trailing {_MAD_FRAME}-row frame per user — the "
    "robust-statistics companion to TS4's mean/σ z-score (immune to the "
    "outliers it hunts). Every intermediate is integral: values are "
    "floor(v*100) ints, medians are carried DOUBLED (sum of middle pair) "
    "and deviations as |2v - med2|, halved only in the final projection "
    "— bit-exact, no rounding. One window sort per user; the MAD is "
    "row-local arithmetic on the bounded sorted frame array.",
)
def q_win_rolling_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    f = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_MAD_FRAME - 1), Window.currentRow)
    )
    q = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.expr("cast(floor(value * 100) as bigint)").alias("qv"),
    )
    w = q.select(
        "event_id",
        "user_id",
        "qv",
        F.sort_array(F.collect_list("qv").over(f)).alias("arr"),
    )
    m = w.withColumn("med2", F.expr(_MED2.format(a="arr")))
    d = m.withColumn(
        "dev",
        F.expr("array_sort(transform(arr, v -> abs(2 * v - med2)))"),
    )
    dev_med2 = F.expr(_MED2.format(a="dev"))
    return d.select(
        "event_id",
        "user_id",
        "qv",
        (F.col("med2").cast("double") / F.lit(2.0)).alias("med"),
        (dev_med2.cast("double") / F.lit(4.0)).alias("mad"),
        F.when(
            dev_med2 > 0,
            F.abs(2 * F.col("qv") - F.col("med2"))
            * F.lit(2.0)
            / dev_med2.cast("double"),
        ).alias("mad_score"),
    )


# --- G8: local clustering coefficient ---------------------------------------


def _clustering_oracle() -> str:
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
        tri AS MATERIALIZED (
            SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
            FROM edges e1
            JOIN edges e2 ON e2.lo = e1.hi
            JOIN edges e3 ON e3.lo = e1.lo AND e3.hi = e2.hi
        ),
        tcount AS MATERIALIZED (
            SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri FROM (
                SELECT a AS node FROM tri
                UNION ALL SELECT b FROM tri
                UNION ALL SELECT c FROM tri
            ) GROUP BY node
        )
        SELECT deg.node, deg.d AS degree,
               COALESCE(tcount.n_tri, 0) AS n_triangles,
               CASE WHEN deg.d >= 2
                    THEN CAST(2 * COALESCE(tcount.n_tri, 0) AS DOUBLE)
                         / (deg.d * (deg.d - 1))
               END AS clustering_coeff
        FROM deg LEFT JOIN tcount ON deg.node = tcount.node
    """


@register(
    "q_graph_clustering_coeff",
    oracle=_clustering_oracle(),
    section="G8",
    doc="Per-node local clustering coefficient 2T/(d(d-1)) over the "
    "shared mutual top-8 graph — how tightly each supplier's partners "
    "trade among themselves (community density; composes G2's triangle "
    "count with G3's degrees). Inherits the degree-8 wedge bound; "
    "integer counts + one IEEE division; degree<2 nodes yield NULL on "
    "both engines. Oracle CTEs MATERIALIZED (G5's lesson).",
)
def q_graph_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries.analytics_r3b import (
        _mutual_affinity_edges,
    )

    edges = _mutual_affinity_edges(spark, sf_dir)
    adj = edges.select(F.col("lo").alias("a"), F.col("hi").alias("b")).unionByName(
        edges.select(F.col("hi").alias("a"), F.col("lo").alias("b"))
    )
    deg = adj.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    e1 = edges.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    e2 = edges.select(F.col("lo").alias("b2"), F.col("hi").alias("c"))
    e3 = edges.select(F.col("lo").alias("a3"), F.col("hi").alias("c3"))
    tri = (
        e1.join(e2, F.col("b") == F.col("b2"))
        .join(e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")))
        .select("a", "b", "c")
    )
    tcount = (
        tri.select(F.col("a").alias("node"))
        .unionByName(tri.select(F.col("b").alias("node")))
        .unionByName(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    j = deg.join(tcount, "node", "left").select(
        "node",
        "degree",
        F.coalesce(F.col("n_tri"), F.lit(0)).alias("n_triangles"),
    )
    return j.select(
        "*",
        F.when(
            F.col("degree") >= 2,
            (2 * F.col("n_triangles")).cast("double")
            / (F.col("degree") * (F.col("degree") - 1)),
        ).alias("clustering_coeff"),
    ).select("node", "degree", "n_triangles", "clustering_coeff")


# --- E18: freshness / watermark audit ---------------------------------------


@register(
    "q_etl_freshness_audit",
    oracle="""
        WITH s AS (
            SELECT event_type AS source,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(MAX(epoch_us(ts)) AS BIGINT) AS max_ts_us,
                   CAST(MIN(epoch_us(ts)) AS BIGINT) AS min_ts_us
            FROM events GROUP BY event_type
        ),
        g AS (SELECT CAST(MAX(max_ts_us) AS BIGINT) AS wm FROM s)
        SELECT s.source, s.n_rows, s.max_ts_us, s.min_ts_us,
               CAST(g.wm - s.max_ts_us AS BIGINT) AS lag_us,
               CAST(g.wm - s.max_ts_us AS BIGINT) > 3600000000 AS is_stale
        FROM s CROSS JOIN g
    """,
    section="E18",
    doc="Per-source freshness/watermark audit: latest event time and lag "
    "vs the global high-water mark, with a 1-hour staleness flag — the "
    "data-SLA gate run before every downstream publish (a stale source "
    "silently truncates joins and aggregates). One map-side-combinable "
    "keyed aggregation + a 1-row broadcast; BIGINT-µs arithmetic — exact.",
)
def q_etl_freshness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    s = ev.groupBy(F.col("event_type").alias("source")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.max(F.expr("unix_micros(ts)")).alias("max_ts_us"),
        F.min(F.expr("unix_micros(ts)")).alias("min_ts_us"),
    )
    g = s.agg(F.max("max_ts_us").alias("wm"))
    lag = F.col("wm") - F.col("max_ts_us")
    return s.crossJoin(F.broadcast(g)).select(
        "source",
        "n_rows",
        "max_ts_us",
        "min_ts_us",
        lag.alias("lag_us"),
        (lag > 3600000000).alias("is_stale"),
    )


# --- SK4: K-Minimum-Values distinct sketch (exactly reproducible) -----------

# k=8, not the textbook 64+: the smallest fixture (sf0.001) has only 15
# distinct users per type, and a k above the true cardinality yields no
# k-th order statistic at all (vacuous 0-row result, which the selfcheck
# forbids). Accuracy scales with k in production; the machinery is
# k-independent.
_KMV_K = 8
_H48_SPARK = (
    "cast(conv(substr(md5(cast(user_id as string)), 1, 12), 16, 10)"
    " as bigint)"
)
_H48_DUCK = (
    "CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12)) AS BIGINT)"
)


@register(
    "q_sketch_kmv_distinct",
    oracle=f"""
        WITH h AS (
            SELECT DISTINCT event_type, {_H48_DUCK} AS h48
            FROM events
        ),
        ranked AS (
            SELECT event_type, h48,
                   row_number() OVER (
                       PARTITION BY event_type ORDER BY h48
                   ) AS rnk
            FROM h
        ),
        kth AS (
            SELECT event_type, h48 AS hk,
                   CAST((SELECT COUNT(DISTINCT user_id) FROM events e
                         WHERE e.event_type = ranked.event_type) AS BIGINT)
                       AS exact_users
            FROM ranked WHERE rnk = {_KMV_K}
        )
        SELECT event_type,
               CAST({_KMV_K - 1} AS DOUBLE) * 281474976710656.0
                   / CAST(hk AS DOUBLE) AS kmv_estimate,
               exact_users
        FROM kth
    """,
    section="SK4",
    doc=f"K-Minimum-Values distinct-count sketch (k={_KMV_K}) per event "
    "type over a 48-bit md5 hash: estimate = (k-1)*2^48 / h_(k) — and "
    "because the hash and the order statistic are deterministic, the "
    "ESTIMATE itself is exactly reproducible cross-engine (unlike HLL "
    "A4/SK3, which are rows-only): a sketch with an exact oracle. "
    "Per-group state is the k smallest hashes (rank-k keyed window on "
    "the DISTINCT hash table) — bounded memory at any cardinality, and "
    "sketches union by re-ranking (mergeable, like SK3). Exact distinct "
    "count carried alongside as the accuracy reference.",
)
def q_sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    h = ev.select("event_type", F.expr(_H48_SPARK).alias("h48")).distinct()
    rnk = F.row_number().over(
        Window.partitionBy("event_type").orderBy("h48")
    )
    kth = h.withColumn("rnk", rnk).where(F.col("rnk") == _KMV_K)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return (
        kth.join(exact, "event_type")
        .select(
            "event_type",
            (
                F.lit(float(_KMV_K - 1))
                * F.lit(281474976710656.0)
                / F.col("h48").cast("double")
            ).alias("kmv_estimate"),
            "exact_users",
        )
    )
