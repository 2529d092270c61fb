"""Fifth-wave operators (r3 continuation): time-series anomaly detection
and interpolation, degree-bounded graph analytics, contamination
checking, BPE statistics, and the nearest as-of join.

  TS4 q_ts_anomaly_zscore — trailing-window z-score outlier detection per
                            user (the monitoring / data-quality primitive).
  TS5 q_ts_interpolate    — linear interpolation of missing days in a
                            sparse daily series (spine + ffill/bfill).
  G2  q_graph_triangles   — per-node triangle counts over the mutual
                            top-8 trade-affinity supplier graph.
  L8  q_text_contamination — GPT-3/Pile-style train/eval n-gram
                            decontamination check.
  T9  q_text_bpe_pairs    — BPE-trainer round-1 merge statistics.
  G4  q_graph_link_predict — common-neighbor link prediction over the
                            G2 graph (all-integer Adamic-Adar variant).
  J17 q_join_asof_nearest — pandas merge_asof direction='nearest',
                            composed from the J10/J13 as-of operators.

Determinism notes (SURVEY §5.3):
  * TS4 quantizes values with floor(value * 1e4) to BIGINT, then takes
    integer window sums (exact, order-insensitive) and rebuilds
    mean/variance/z with the identical IEEE double expression on both
    engines — no rounding of the output is needed. DuckDB SUM(BIGINT)
    returns HUGEINT, so the oracle casts the sums back to BIGINT before
    the double arithmetic (values fit: |qv| <= 5e6, qv^2 <= 2.5e13,
    20-row frame => |s2| <= 5e14 << 2^63).
  * TS5's series values are exact DECIMAL(12,2) daily sums; the
    interpolation fraction is an integer-day ratio. double division /
    multiply / add are correctly-rounded IEEE ops, identical cross-engine,
    so the interpolated value is bit-deterministic without rounding.
  * G2 is all-integer (counts + row_number with full tie-break) — exact.

Scale notes:
  * TS4 is one window sort per user with a bounded 20-row frame —
    constant per-row state; anomalies stream out map-side after the sort.
  * TS5's spine is |types| x |days| (tiny, broadcast); the two
    ignore-nulls window passes are per-type sorts over spine-sized data.
  * G2 bounds the graph by construction: top-8 partners per node caps
    degree at 8, so the triangle join touches <= 64 candidate wedges per
    node regardless of how dense the raw co-supply relation is (at sf0.1
    the raw supplier co-supply graph is COMPLETE — 499,500 pairs — which
    is why the affinity-ranked sparsification is the scalable shape; the
    same trick is how production triangle counts survive power-law
    degrees: rank/limit neighbors, then count on the bounded graph).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register

# --- TS4: trailing-window z-score anomaly detection -------------------------

_Z_FRAME = 20  # trailing frame size (rows)
_Z_MIN_N = 10  # minimum observations before scoring
_Z_T = 2.5     # |z| threshold


@register(
    "q_ts_anomaly_zscore",
    oracle=f"""
        WITH q AS (
            SELECT event_id, user_id, ts,
                   CAST(floor(value * 1e4) AS BIGINT) AS qv
            FROM events
        ),
        w AS (
            SELECT event_id, user_id, qv,
                   CAST(COUNT(*) OVER f AS BIGINT) AS n,
                   CAST(SUM(qv) OVER f AS BIGINT) AS s,
                   CAST(SUM(qv * qv) OVER f AS BIGINT) AS s2
            FROM q
            WINDOW f AS (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN {_Z_FRAME - 1} PRECEDING AND CURRENT ROW
            )
        )
        SELECT event_id, user_id,
               (CAST(qv AS DOUBLE) - CAST(s AS DOUBLE) / n)
               / sqrt(CAST(s2 AS DOUBLE) / n
                      - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))
                   AS zscore
        FROM w
        WHERE n >= {_Z_MIN_N}
          AND CAST(s2 AS DOUBLE) / n
              - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n) > 0
          AND abs((CAST(qv AS DOUBLE) - CAST(s AS DOUBLE) / n)
                  / sqrt(CAST(s2 AS DOUBLE) / n
                         - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)))
              > {_Z_T}
    """,
    section="TS4",
    doc="Trailing-20-event z-score anomaly detection per user: values "
    "quantized floor(v*1e4) to BIGINT so the window sums are exact "
    "integers (order-insensitive), then mean/population-variance/z are "
    "rebuilt with the identical IEEE double expression on both engines — "
    "bit-deterministic, no output rounding. Bounded ROWS frame = constant "
    "per-row state; one window sort per user at any scale.",
)
def q_ts_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    f = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_Z_FRAME - 1), Window.currentRow)
    )
    q = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.expr("cast(floor(value * 1e4) as bigint)").alias("qv"),
    )
    w = q.select(
        "event_id",
        "user_id",
        "qv",
        F.count(F.lit(1)).over(f).alias("n"),
        F.sum("qv").over(f).alias("s"),
        F.sum(F.col("qv") * F.col("qv")).over(f).alias("s2"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    var = F.col("s2").cast("double") / F.col("n") - mean * mean
    z = (F.col("qv").cast("double") - mean) / F.sqrt(var)
    return (
        w.filter((F.col("n") >= _Z_MIN_N) & (var > 0) & (F.abs(z) > _Z_T))
        .select("event_id", "user_id", z.alias("zscore"))
    )


# --- TS5: linear interpolation over a daily spine ---------------------------

_TS5_MIN_VALUE = 250.0  # rare high-value slice => genuinely sparse series


@register(
    "q_ts_interpolate",
    oracle=f"""
        WITH spine AS (
            SELECT t.event_type, CAST(d.d AS DATE) AS day
            FROM (SELECT DISTINCT event_type FROM events) t
            CROSS JOIN generate_series(DATE '2024-01-01', DATE '2024-01-30',
                                       INTERVAL 1 DAY) d(d)
        ),
        daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS v
            FROM events WHERE value >= {_TS5_MIN_VALUE}
            GROUP BY 1, 2
        ),
        j AS (
            SELECT s.event_type, s.day, d.v FROM spine s
            LEFT JOIN daily d ON d.event_type = s.event_type AND d.day = s.day
        ),
        f AS (
            SELECT event_type, day, v,
                   last_value(v IGNORE NULLS) OVER (
                       PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS pv,
                   last_value(CASE WHEN v IS NOT NULL THEN day END
                              IGNORE NULLS) OVER (
                       PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS pd,
                   first_value(v IGNORE NULLS) OVER (
                       PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
                   ) AS nv,
                   first_value(CASE WHEN v IS NOT NULL THEN day END
                               IGNORE NULLS) OVER (
                       PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
                   ) AS nd
            FROM j
        )
        SELECT event_type, day,
               CASE WHEN v IS NOT NULL THEN v
                    WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                        pv + (nv - pv)
                        * (CAST(date_diff('day', pd, day) AS DOUBLE)
                           / CAST(date_diff('day', pd, nd) AS DOUBLE))
                    WHEN pv IS NOT NULL THEN pv
                    WHEN nv IS NOT NULL THEN nv
               END AS filled,
               CASE WHEN v IS NOT NULL THEN 'actual'
                    WHEN pv IS NOT NULL AND nv IS NOT NULL THEN 'interp'
                    WHEN pv IS NOT NULL THEN 'ffill'
                    WHEN nv IS NOT NULL THEN 'bfill'
                    ELSE 'empty' END AS fill_kind
        FROM f
    """,
    section="TS5",
    doc="Linear interpolation of a sparse daily series (per-type sums of "
    "rare high-value events) over a generated day spine: previous/next "
    "present values via IGNORE-NULLS windows, gaps filled "
    "pv + (nv-pv)*(day-pd)/(nd-pd), edges forward/back-filled, each row "
    "tagged actual/interp/ffill/bfill. Series values are exact DECIMAL "
    "sums and the fraction is an integer-day ratio, so the IEEE result "
    "is bit-identical cross-engine — no rounding. Spine is tiny "
    "(types x 30 days) and broadcast; window passes sort spine-sized "
    "data per type.",
)
def q_ts_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    spine = (
        ev.select("event_type")
        .distinct()
        .crossJoin(
            spark.range(1).select(
                F.explode(
                    F.expr(
                        "sequence(date'2024-01-01', date'2024-01-30',"
                        " interval 1 day)"
                    )
                ).alias("day")
            )
        )
    )
    daily = (
        ev.filter(F.col("value") >= _TS5_MIN_VALUE)
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(F.col("value").cast(DecimalType(12, 2)))
            .cast("double")
            .alias("v")
        )
    )
    j = spine.join(F.broadcast(daily), ["event_type", "day"], "left")
    wb = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    day_if_present = F.when(F.col("v").isNotNull(), F.col("day"))
    f = j.select(
        "event_type",
        "day",
        "v",
        F.last("v", ignorenulls=True).over(wb).alias("pv"),
        F.last(day_if_present, ignorenulls=True).over(wb).alias("pd"),
        F.first("v", ignorenulls=True).over(wf).alias("nv"),
        F.first(day_if_present, ignorenulls=True).over(wf).alias("nd"),
    )
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        F.datediff(F.col("day"), F.col("pd")).cast("double")
        / F.datediff(F.col("nd"), F.col("pd")).cast("double")
    )
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNotNull() & F.col("nv").isNotNull(), interp)
        .when(F.col("pv").isNotNull(), F.col("pv"))
        .when(F.col("nv").isNotNull(), F.col("nv"))
    )
    kind = (
        F.when(F.col("v").isNotNull(), F.lit("actual"))
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(), F.lit("interp")
        )
        .when(F.col("pv").isNotNull(), F.lit("ffill"))
        .when(F.col("nv").isNotNull(), F.lit("bfill"))
        .otherwise(F.lit("empty"))
    )
    return f.select(
        "event_type", "day", filled.alias("filled"), kind.alias("fill_kind")
    )


# --- G2: triangle counting on the mutual top-8 affinity graph ---------------

_TOP_PARTNERS = 8


_EDGE_CTES = f"""
        ps AS (
            SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
        ),
        pairs AS (
            SELECT a.l_suppkey AS s1, b.l_suppkey AS s2,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM ps a JOIN ps b
              ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
            GROUP BY 1, 2
        ),
        dir AS (
            SELECT s1 AS src, s2 AS dst, cnt FROM pairs
            UNION ALL
            SELECT s2 AS src, s1 AS dst, cnt FROM pairs
        ),
        top5 AS (
            SELECT src, dst FROM (
                SELECT src, dst,
                       row_number() OVER (
                           PARTITION BY src ORDER BY cnt DESC, dst
                       ) AS rn
                FROM dir
            ) WHERE rn <= {_TOP_PARTNERS}
        ),
        edges AS (
            SELECT a.src AS lo, a.dst AS hi
            FROM top5 a JOIN top5 b ON a.src = b.dst AND a.dst = b.src
            WHERE a.src < a.dst
        )"""


# Checkpointed edge lists memoized per (Spark app, dataset): the graph is
# shared by G2/G4/G5/G6, and rebuilding it costs a lineitem self-join each
# time. Staleness contract (same as operators/kmeans.py _MODEL_CACHE): the
# cache assumes the parquet under sf_dir is immutable for the process
# lifetime — true for the read-only /root/testdata fixtures; call
# _EDGE_CACHE.clear() if a dataset is ever rewritten in-process.
_EDGE_CACHE: dict = {}


def _mutual_affinity_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual top-k trade-affinity supplier edges as (lo, hi), lo < hi —
    the shared sparsified graph under G2 (triangles), G4 (link
    prediction), G5 (k-core) and G6 (BFS). Degree <= _TOP_PARTNERS by
    construction. The result is localCheckpoint-truncated and memoized
    per (Spark app, dataset) so the four graph queries build it once."""
    cache_key = (spark.sparkContext.applicationId, sf_dir)
    cached = _EDGE_CACHE.get(cache_key)
    if cached is not None:
        return cached
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    a = ps.select(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("s1")
    )
    b = ps.select(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("s2")
    )
    pairs = (
        a.join(b, (a.pk == b.pk) & (F.col("s1") < F.col("s2")))
        .groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    direct = pairs.select(
        F.col("s1").alias("src"), F.col("s2").alias("dst"), "cnt"
    ).unionByName(
        pairs.select(F.col("s2").alias("src"), F.col("s1").alias("dst"), "cnt")
    )
    rn = F.row_number().over(
        Window.partitionBy("src").orderBy(F.desc("cnt"), F.asc("dst"))
    )
    top5 = (
        direct.withColumn("rn", rn)
        .filter(F.col("rn") <= _TOP_PARTNERS)
        .select("src", "dst")
    )
    rev = top5.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    edges = (
        top5.intersect(rev)
        .filter(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("lo"), F.col("dst").alias("hi"))
        .localCheckpoint(eager=False)
    )
    _EDGE_CACHE[cache_key] = edges
    return edges


@register(
    "q_graph_triangles",
    oracle=f"""
        WITH {_EDGE_CTES},
        tri AS (
            SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
            FROM edges e1
            JOIN edges e2 ON e2.lo = e1.hi
            JOIN edges e3 ON e3.lo = e1.lo AND e3.hi = e2.hi
        )
        SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM (
            SELECT a AS node FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri
        )
        GROUP BY node
    """,
    section="G2",
    doc="Per-node triangle counts over the mutual top-8 trade-affinity "
    "supplier graph (edge iff each supplier ranks the other in its top-8 "
    "co-supply partners by shared-part count, full tie-break). The raw "
    "co-supply relation is complete at sf0.1 (499,500 pairs), so the "
    "rank/limit sparsification is the point: degree <= 8 by construction "
    "bounds the wedge join to <= 64 candidates per node at any scale — "
    "the standard defense against power-law hubs in distributed triangle "
    "counting. All-integer, fully tie-broken => exact.",
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _mutual_affinity_edges(spark, sf_dir)
    e1 = edges.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    e2 = edges.select(F.col("lo").alias("b2"), F.col("hi").alias("c"))
    e3 = edges.select(F.col("lo").alias("a3"), F.col("hi").alias("c3"))
    tri = (
        e1.join(e2, F.col("b") == F.col("b2"))
        .join(
            e3,
            (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")),
        )
        .select("a", "b", "c")
    )
    nodes = (
        tri.select(F.col("a").alias("node"))
        .unionByName(tri.select(F.col("b").alias("node")))
        .unionByName(tri.select(F.col("c").alias("node")))
    )
    return nodes.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )


# --- L8: benchmark-contamination check (n-gram decontamination) -------------

_CONTAM_K = 8   # word-n-gram size (GPT-3/Pile-style decontamination uses 8-13)
_CONTAM_M = 29  # benchmark set = docs with doc_id % 29 == 0 (~3% of corpus)

_CSH_SPARK = (
    f"case when size(split(text, ' ')) >= {_CONTAM_K} then "
    f"array_distinct(transform("
    f"sequence(1, size(split(text, ' ')) - {_CONTAM_K} + 1),"
    f" i -> array_join(slice(split(text, ' '), i, {_CONTAM_K}), ' '))) "
    f"else array() end"
)
_CSH_DUCK = (
    f"list_distinct(list_transform("
    f"range(1, greatest(len(string_split(text, ' ')) - {_CONTAM_K} + 1, 0)"
    f" + 1), i -> array_to_string("
    f"list_slice(string_split(text, ' '), i, i + {_CONTAM_K} - 1), ' ')))"
)


@register(
    "q_text_contamination",
    oracle=f"""
        WITH sh AS (
            SELECT doc_id, {_CSH_DUCK} AS gs FROM documents
        ),
        ex AS (
            SELECT doc_id, len(gs) AS n_shingles, unnest(gs) AS g FROM sh
        ),
        bench AS (
            SELECT DISTINCT g FROM ex WHERE doc_id % {_CONTAM_M} = 0
        )
        SELECT e.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_hits,
               CAST(MIN(e.n_shingles) AS BIGINT) AS n_shingles,
               CAST(COUNT(*) AS DOUBLE) / MIN(e.n_shingles)
                   AS contamination_ratio
        FROM ex e JOIN bench b ON e.g = b.g
        WHERE e.doc_id % {_CONTAM_M} <> 0
        GROUP BY e.doc_id
    """,
    section="L8",
    doc="Train/eval contamination check — the GPT-3/Pile-style n-gram "
    "decontamination pass: flag corpus documents sharing any word-8-gram "
    "with a held-out benchmark slice (doc_id % 29 == 0 stands in for the "
    "eval set). Shingles are row-local and distinct per doc; the "
    "benchmark shingle set is eval-sized (small by definition) and "
    "broadcast, so the corpus never shuffles — the check is map-side at "
    "any corpus scale. Ratio is an exact int/int IEEE division — no "
    "rounding needed.",
)
def q_text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", F.expr(_CSH_SPARK).alias("gs")
    ).select(
        "doc_id",
        F.size("gs").alias("n_shingles"),
        F.explode("gs").alias("g"),
    )
    bench = (
        sh.filter(F.col("doc_id") % _CONTAM_M == 0).select("g").distinct()
    )
    return (
        sh.filter(F.col("doc_id") % _CONTAM_M != 0)
        .join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.min("n_shingles").cast("bigint").alias("n_shingles"),
            (
                F.count(F.lit(1)).cast("double") / F.min("n_shingles")
            ).alias("contamination_ratio"),
        )
    )


# --- T9: BPE merge-candidate pair counts ------------------------------------


@register(
    "q_text_bpe_pairs",
    oracle="""
        WITH tok AS (
            SELECT unnest(string_split(text, ' ')) AS t FROM documents
        ),
        tf AS (
            SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY t
        ),
        pairs AS (
            SELECT unnest(list_transform(range(1, length(t)),
                          i -> substring(t, i, 2))) AS pair,
                   c
            FROM tf WHERE length(t) >= 2
        )
        SELECT pair, CAST(SUM(c) AS BIGINT) AS merge_count
        FROM pairs
        GROUP BY pair
        ORDER BY merge_count DESC, pair
        LIMIT 30
    """,
    section="T9",
    doc="BPE tokenizer-training inner loop, round 1: corpus-weighted "
    "adjacent-character-pair frequencies (the statistic argmaxed by every "
    "byte-pair-encoding merge step). Token frequencies are one keyed "
    "shuffle over exploded tokens; pair extraction then runs on the "
    "DISTINCT-token table (vocabulary-sized, not corpus-sized) — the same "
    "work-sharing real BPE trainers use. All-integer counts, fully "
    "tie-broken top-30 => exact.",
)
def q_text_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(F.split("text", " ")).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pairs = (
        tf.filter(F.length("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(t) - 1),"
                    " i -> substring(t, i, 2))"
                )
            ).alias("pair"),
            "c",
        )
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("c").alias("merge_count"))
        .orderBy(F.desc("merge_count"), F.asc("pair"))
        .limit(30)
    )


# --- G4: common-neighbor link prediction ------------------------------------

_LP_MIN_SCORE = 2


@register(
    "q_graph_link_predict",
    oracle=f"""
        WITH {_EDGE_CTES},
        adj AS (
            SELECT lo AS x, hi AS n FROM edges
            UNION ALL
            SELECT hi AS x, lo AS n FROM edges
        ),
        wedge AS (
            SELECT a.x AS u, b.x AS v, CAST(COUNT(*) AS BIGINT) AS score
            FROM adj a JOIN adj b ON a.n = b.n AND a.x < b.x
            GROUP BY a.x, b.x
        )
        SELECT w.u, w.v, w.score
        FROM wedge w
        LEFT JOIN edges e ON e.lo = w.u AND e.hi = w.v
        WHERE e.lo IS NULL AND w.score >= {_LP_MIN_SCORE}
    """,
    section="G4",
    doc="Common-neighbor link prediction over the mutual top-8 affinity "
    "graph: for each NON-adjacent supplier pair, the number of shared "
    "neighbors (>= 2) — the classic recommendation score (all-integer: "
    "Adamic-Adar's 1/ln(deg) weighting is deliberately avoided because "
    "libm ln() is not bit-identical across JVM and C). The wedge join "
    "inherits G2's degree bound (<= 8), so candidate pairs per node are "
    "bounded at any scale; one keyed agg + one anti-join.",
)
def q_graph_link_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _mutual_affinity_edges(spark, sf_dir).localCheckpoint(eager=False)
    adj = edges.select(F.col("lo").alias("x"), F.col("hi").alias("n")).unionByName(
        edges.select(F.col("hi").alias("x"), F.col("lo").alias("n"))
    )
    a = adj.select(F.col("x").alias("u"), "n")
    b = adj.select(F.col("x").alias("v"), F.col("n").alias("n2"))
    wedge = (
        a.join(b, (F.col("n") == F.col("n2")) & (F.col("u") < F.col("v")))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("score"))
    )
    return (
        wedge.join(
            edges,
            (wedge.u == edges.lo) & (wedge.v == edges.hi),
            "left_anti",
        )
        .filter(F.col("score") >= _LP_MIN_SCORE)
        .select("u", "v", "score")
    )


# --- J17: nearest as-of join -------------------------------------------------


@register(
    "q_join_asof_nearest",
    oracle="""
        WITH l AS (
            SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'purchase'
        ),
        r AS (
            SELECT event_id, user_id, ts FROM events
            WHERE event_type <> 'purchase'
        ),
        bwd AS (
            SELECT * FROM (
                SELECT l.event_id, l.user_id, l.ts,
                       r.event_id AS b_id, r.ts AS b_ts,
                       ROW_NUMBER() OVER (PARTITION BY l.event_id
                           ORDER BY r.ts DESC, r.event_id DESC) AS rn
                FROM l LEFT JOIN r
                  ON l.user_id = r.user_id AND r.ts <= l.ts
            ) WHERE rn = 1
        ),
        fwd AS (
            SELECT * FROM (
                SELECT l.event_id,
                       r.event_id AS f_id, r.ts AS f_ts,
                       ROW_NUMBER() OVER (PARTITION BY l.event_id
                           ORDER BY r.ts ASC, r.event_id ASC) AS rn
                FROM l LEFT JOIN r
                  ON l.user_id = r.user_id AND r.ts >= l.ts
            ) WHERE rn = 1
        )
        SELECT b.event_id, b.user_id, b.ts,
               CASE WHEN f.f_id IS NULL THEN b.b_id
                    WHEN b.b_id IS NULL THEN f.f_id
                    WHEN epoch_us(b.ts) - epoch_us(b.b_ts)
                         <= epoch_us(f.f_ts) - epoch_us(b.ts) THEN b.b_id
                    ELSE f.f_id END AS matched_id,
               CASE WHEN f.f_id IS NULL THEN b.b_ts
                    WHEN b.b_id IS NULL THEN f.f_ts
                    WHEN epoch_us(b.ts) - epoch_us(b.b_ts)
                         <= epoch_us(f.f_ts) - epoch_us(b.ts) THEN b.b_ts
                    ELSE f.f_ts END AS matched_ts,
               CASE WHEN f.f_id IS NULL AND b.b_id IS NULL THEN 'none'
                    WHEN f.f_id IS NULL THEN 'backward'
                    WHEN b.b_id IS NULL THEN 'forward'
                    WHEN epoch_us(b.ts) - epoch_us(b.b_ts)
                         <= epoch_us(f.f_ts) - epoch_us(b.ts) THEN 'backward'
                    ELSE 'forward' END AS direction
        FROM bwd b JOIN fwd f ON f.event_id = b.event_id
    """,
    section="J17",
    doc="NEAREST as-of join (pandas merge_asof direction='nearest'): the "
    "closest non-purchase event per purchase in either time direction, "
    "ties preferring backward (pandas semantics). Composed from the "
    "backward (J10) and forward (J13) union+window as-of operators — two "
    "by-key window shuffles + one equi-join on the left key; BIGINT-"
    "microsecond distances, exact. Completes the as-of family: "
    "backward/forward/nearest.",
)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.operators.asof import asof_join

    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    others = events.filter(F.col("event_type") != "purchase").select(
        "event_id", "user_id", "ts"
    )
    bwd = asof_join(
        purchases, others, on="ts", by="user_id",
        right_payload=["event_id", "ts"], tiebreak="event_id",
    ).select(
        "event_id", "user_id", "ts",
        F.col("event_id_matched").alias("b_id"),
        F.col("ts_matched").alias("b_ts"),
    )
    fwd = asof_join(
        purchases, others, on="ts", by="user_id",
        right_payload=["event_id", "ts"], tiebreak="event_id",
        direction="forward",
    ).select(
        F.col("event_id").alias("f_event_id"),
        F.col("event_id_matched").alias("f_id"),
        F.col("ts_matched").alias("f_ts"),
    )
    j = bwd.join(fwd, bwd.event_id == fwd.f_event_id)
    db = F.unix_micros("ts") - F.unix_micros("b_ts")
    df2 = F.unix_micros("f_ts") - F.unix_micros("ts")
    pick_b = F.col("f_id").isNull() | (
        F.col("b_id").isNotNull() & (db <= df2)
    )
    return j.select(
        "event_id",
        "user_id",
        "ts",
        F.when(pick_b, F.col("b_id")).otherwise(F.col("f_id")).alias(
            "matched_id"
        ),
        F.when(pick_b, F.col("b_ts")).otherwise(F.col("f_ts")).alias(
            "matched_ts"
        ),
        F.when(
            F.col("b_id").isNull() & F.col("f_id").isNull(), F.lit("none")
        )
        .when(pick_b, F.lit("backward"))
        .otherwise(F.lit("forward"))
        .alias("direction"),
    )


# --- W15: longest activity streak (gaps-and-islands) ------------------------


@register(
    "q_win_streak",
    oracle="""
        WITH days AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        ),
        marked AS (
            SELECT user_id, day,
                   CASE WHEN date_diff('day',
                            lag(day) OVER (PARTITION BY user_id ORDER BY day),
                            day) = 1
                        THEN 0 ELSE 1 END AS brk
            FROM days
        ),
        islands AS (
            SELECT user_id, day,
                   CAST(SUM(brk) OVER (
                       PARTITION BY user_id ORDER BY day
                   ) AS BIGINT) AS streak_id
            FROM marked
        ),
        streaks AS (
            SELECT user_id, streak_id,
                   CAST(COUNT(*) AS BIGINT) AS len,
                   MIN(day) AS streak_start
            FROM islands GROUP BY user_id, streak_id
        )
        SELECT user_id,
               CAST(MAX(len) AS BIGINT) AS longest_streak,
               CAST(COUNT(*) AS BIGINT) AS n_streaks,
               CAST(SUM(len) AS BIGINT) AS active_days,
               MIN(CASE WHEN len = ml THEN streak_start END) AS best_start
        FROM (
            SELECT s.*, MAX(len) OVER (PARTITION BY user_id) AS ml
            FROM streaks s
        )
        GROUP BY user_id
    """,
    section="W15",
    doc="Longest consecutive-active-day streak per user (gaps-and-islands "
    "over distinct activity days): break flags from lag(day), running sum "
    "as island id, two keyed aggregations — the engagement-streak metric "
    "every product-analytics warehouse computes. best_start disambiguates "
    "equal-length streaks by earliest start (deterministic). All-integer "
    "+ dates => exact. One window sort + two aggs per user at any scale.",
)
def q_win_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    marked = days.withColumn(
        "brk",
        F.when(
            F.datediff(F.col("day"), F.lag("day").over(w)) == 1, F.lit(0)
        ).otherwise(F.lit(1)),
    )
    islands = marked.withColumn(
        "streak_id", F.sum("brk").over(w).cast("bigint")
    )
    streaks = islands.groupBy("user_id", "streak_id").agg(
        F.count(F.lit(1)).alias("len"),
        F.min("day").alias("streak_start"),
    )
    wml = Window.partitionBy("user_id")
    s2 = streaks.withColumn("ml", F.max("len").over(wml))
    return s2.groupBy("user_id").agg(
        F.max("len").alias("longest_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.sum("len").alias("active_days"),
        F.min(
            F.when(F.col("len") == F.col("ml"), F.col("streak_start"))
        ).alias("best_start"),
    )


# --- E11: referential-integrity (FK orphan) audit ---------------------------


@register(
    "q_etl_fk_audit",
    oracle="""
        WITH t1 AS (
            SELECT 'lineitem->orders_open' AS relationship,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(CASE WHEN o.o_orderkey IS NULL
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
            FROM lineitem l
            LEFT JOIN (SELECT o_orderkey FROM orders
                       WHERE o_orderstatus = 'O') o
              ON l.l_orderkey = o.o_orderkey
        ),
        t2 AS (
            SELECT 'orders->customer_positive' AS relationship,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(CASE WHEN c.c_custkey IS NULL
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
            FROM orders o
            LEFT JOIN (SELECT c_custkey FROM customer
                       WHERE c_acctbal > 0) c
              ON o.o_custkey = c.c_custkey
        )
        SELECT relationship, n_rows, n_orphans,
               CAST(n_orphans AS DOUBLE) / n_rows AS orphan_ratio
        FROM (SELECT * FROM t1 UNION ALL SELECT * FROM t2)
    """,
    section="E11",
    doc="Referential-integrity audit: orphan counts per FK relationship "
    "against CONSTRAINED target slices (open orders / positive-balance "
    "customers) so drift is non-trivially exercised — the DQ gate an ETL "
    "load runs before publishing. Each relationship is one broadcast-or-"
    "shuffle left join + conditional count (map-side combinable); ratio "
    "is int/int IEEE division, exact. At 100 TB the dim key-sets "
    "broadcast (keys only, not rows) or the joins bucket on the FK.",
)
def q_etl_fk_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    open_orders = orders.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey"
    )
    pos_cust = cust.filter(F.col("c_acctbal") > 0).select("c_custkey")
    t1 = (
        li.join(open_orders, li.l_orderkey == open_orders.o_orderkey, "left")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)
            ).alias("n_orphans"),
        )
        .select(
            F.lit("lineitem->orders_open").alias("relationship"),
            "n_rows",
            "n_orphans",
        )
    )
    t2 = (
        orders.join(pos_cust, orders.o_custkey == pos_cust.c_custkey, "left")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.when(F.col("c_custkey").isNull(), 1).otherwise(0)
            ).alias("n_orphans"),
        )
        .select(
            F.lit("orders->customer_positive").alias("relationship"),
            "n_rows",
            "n_orphans",
        )
    )
    return t1.unionByName(t2).select(
        "relationship",
        "n_rows",
        "n_orphans",
        (F.col("n_orphans").cast("double") / F.col("n_rows")).alias(
            "orphan_ratio"
        ),
    )
