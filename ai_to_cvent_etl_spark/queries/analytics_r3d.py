"""Sixth-wave operators, part 2 (r3 continuation): weighted sparse
similarity, feature scaling, engagement analytics, quality-filter
pipelines, and graph traversal.

  L9  q_text_tfidf_cosine  — TF-IDF-weighted cosine doc-pair similarity
                             (token-blocked sparse-vector join), top-3
                             neighbors per doc.
  V11 q_vec_minmax_scale   — per-dimension min-max feature scaling with a
                             broadcast global-stats table (ML prep).
  TS8 q_ts_active_users    — DAU / trailing-7-day WAU / stickiness via
                             bounded day-expansion (the scalable sliding
                             COUNT DISTINCT).
  L10 q_text_filter_chain  — ordered quality-filter chain with first-
                             failure attribution (C4/Gopher-style rule
                             telemetry: WHICH rule dropped each doc).
  G6  q_graph_bfs_khop     — 3-hop BFS distances from a seed set over the
                             mutual trade-affinity graph.

Determinism notes (SURVEY §5.3):
  * L9's weights are ALL-INTEGER rational TF-IDF: qw = tf * ((N*1000) DIV
    df) — no libm log, so quantization cannot drift at a floor boundary.
    Dot products and norms are exact BIGINT sums (bounds: qw <= 5e7,
    qw^2 <= 2.5e15, <= 31 terms => < 8e16 << 2^63); cosine is one fixed
    IEEE expression over them; ties broken by doc_hi.
  * V11's min/max are exact FLOAT order statistics; the scale expression
    is a fixed IEEE tree over float->double conversions (exact).
  * TS8 is all-integer counts + one stickiness division.
  * L10's rule ratios are single int/int divisions compared to literal
    thresholds — exact; rule ORDER is part of the contract (first failure
    wins), encoded as one CASE chain on both engines.
  * G6 is all-integer (min hop over unions).

Scale notes:
  * L9 scopes the pair join to one language partition (the realistic
    dedup/similarity unit). This corpus's 31-token vocabulary makes EVERY
    token a stop token (df ~ |corpus|), so df-pruning — the production
    lever that keeps a token-blocked join linear — would empty the join;
    the language block bounds it instead. The join is blocked on token,
    aggregates map-side, and the top-3 rank bounds the output at 3 rows
    per doc.
  * V11's stats table is |dims| rows — broadcast; everything else is
    row-local.
  * TS8 expands each (day, user) observation into exactly 7 window rows —
    a bounded constant fan-out, then two keyed aggregations. This is the
    scalable form of sliding-window COUNT DISTINCT (W13's lesson: no
    unbounded per-window state).
  * L10 is map-only over per-doc token stats (one keyed agg to build
    them), then a 4-row summary-ready verdict column.
  * G6 peels 3 fixed rounds; each round is one join frontier->adjacency
    (degree <= 8 by the shared graph's construction) + a keyed min;
    lineage localCheckpoint-truncated per round like G1/G5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register

# --- L9: rational TF-IDF cosine pairs ---------------------------------------

_TFIDF_LANG = "de"
_TFIDF_TOPK = 3
_IDF_SCALE = 1000


@register(
    "q_text_tfidf_cosine",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, text FROM documents WHERE lang = '{_TFIDF_LANG}'
        ),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM d),
        tok AS (
            SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
            FROM d
        ),
        tf AS (
            SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
            FROM tok GROUP BY doc_id, token
        ),
        idf AS (
            SELECT token,
                   (SELECT n_docs FROM n) * {_IDF_SCALE}
                       // CAST(COUNT(*) AS BIGINT) AS idf_q
            FROM tf GROUP BY token
        ),
        w AS (
            SELECT tf.doc_id, tf.token,
                   CAST(tf.tf * idf.idf_q AS BIGINT) AS qw
            FROM tf JOIN idf USING (token)
        ),
        nrm AS (
            SELECT doc_id, CAST(SUM(qw * qw) AS BIGINT) AS n2
            FROM w GROUP BY doc_id
        ),
        dot AS (
            SELECT a.doc_id AS doc_lo, b.doc_id AS doc_hi,
                   CAST(SUM(a.qw * b.qw) AS BIGINT) AS dp
            FROM w a JOIN w b
              ON a.token = b.token AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        ),
        cosed AS (
            SELECT doc_lo, doc_hi,
                   CAST(dp AS DOUBLE)
                   / (sqrt(CAST(na.n2 AS DOUBLE))
                      * sqrt(CAST(nb.n2 AS DOUBLE))) AS cos_sim
            FROM dot
            JOIN nrm na ON dot.doc_lo = na.doc_id
            JOIN nrm nb ON dot.doc_hi = nb.doc_id
        )
        SELECT doc_lo, doc_hi, cos_sim,
               CAST(rnk AS INTEGER) AS rank
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY doc_lo ORDER BY cos_sim DESC, doc_hi
            ) AS rnk
            FROM cosed
        ) WHERE rnk <= {_TFIDF_TOPK}
    """,
    section="L9",
    doc="TF-IDF-weighted cosine document similarity, top-3 neighbors per "
    "doc (the weighted upgrade of T5/D6's set-overlap joins). Weights are "
    f"ALL-INTEGER rational TF-IDF (tf * (N*{_IDF_SCALE} DIV df)) — no "
    "libm log so no quantization drift; dot products and norms are exact "
    "BIGINT sums; cosine is one fixed IEEE expression. Token-blocked "
    "sparse join scoped to one language partition (this corpus's 31-token "
    "vocabulary makes df-pruning degenerate — see module docstring); "
    "map-side partial aggs; output bounded at top-3 rows per doc.",
)
def q_text_tfidf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("lang") == _TFIDF_LANG
    )
    tok = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("token")
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    idf = (
        tf.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n))
        .select(
            "token",
            F.expr(f"(n_docs * {_IDF_SCALE}) div df").alias("idf_q"),
        )
    )
    w = tf.join(idf, "token").select(
        "doc_id", "token", (F.col("tf") * F.col("idf_q")).alias("qw")
    )
    nrm = w.groupBy("doc_id").agg(F.sum(F.col("qw") * F.col("qw")).alias("n2"))
    a = w.select(
        F.col("doc_id").alias("doc_lo"), "token", F.col("qw").alias("qa")
    )
    b = w.select(
        F.col("doc_id").alias("doc_hi"), "token", F.col("qw").alias("qb")
    )
    dot = (
        a.join(b, (a.token == b.token) & (F.col("doc_lo") < F.col("doc_hi")))
        .groupBy("doc_lo", "doc_hi")
        .agg(F.sum(F.col("qa") * F.col("qb")).alias("dp"))
    )
    na = nrm.select(F.col("doc_id").alias("doc_lo"), F.col("n2").alias("na2"))
    nb = nrm.select(F.col("doc_id").alias("doc_hi"), F.col("n2").alias("nb2"))
    cosed = (
        dot.join(na, "doc_lo")
        .join(nb, "doc_hi")
        .select(
            "doc_lo",
            "doc_hi",
            (
                F.col("dp").cast("double")
                / (
                    F.sqrt(F.col("na2").cast("double"))
                    * F.sqrt(F.col("nb2").cast("double"))
                )
            ).alias("cos_sim"),
        )
    )
    rnk = F.row_number().over(
        Window.partitionBy("doc_lo").orderBy(F.desc("cos_sim"), F.asc("doc_hi"))
    )
    return (
        cosed.withColumn("rank", rnk)
        .where(F.col("rank") <= _TFIDF_TOPK)
        .select("doc_lo", "doc_hi", "cos_sim", F.col("rank").cast("int"))
    )


# --- V11: per-dimension min-max scaling -------------------------------------

_SCALE_DIMS = 8  # emit the first k dims long-form (output stays bounded)


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


# --- TS8: DAU / WAU / stickiness --------------------------------------------

_WAU_DAYS = 7


@register(
    "q_ts_active_users",
    oracle=f"""
        WITH du AS (
            SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
        ),
        dau AS (
            SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM du GROUP BY day
        ),
        expanded AS (
            SELECT du.day + CAST(o.off AS INTEGER) AS wday, du.user_id
            FROM du CROSS JOIN (
                SELECT unnest(range(0, {_WAU_DAYS})) AS off
            ) o
        ),
        wau AS (
            SELECT wday AS day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
            FROM expanded GROUP BY wday
        )
        SELECT dau.day, dau.dau, wau.wau,
               CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE)
                   AS stickiness
        FROM dau JOIN wau USING (day)
    """,
    section="TS8",
    doc="Daily active users, trailing-7-day weekly active users, and "
    "DAU/WAU stickiness — the product-engagement headline metrics. The "
    "sliding COUNT DISTINCT uses bounded day-expansion: each distinct "
    "(day, user) observation emits exactly 7 window-membership rows, then "
    "one keyed distinct-count per window day — constant fan-out, no "
    "per-window unbounded state (the scalable alternative W13 "
    "documented). All-integer; stickiness is one IEEE division.",
)
def q_ts_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(
        F.col("ts").cast("date").alias("day"), "user_id"
    ).distinct()
    dau = du.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    expanded = du.select(
        F.explode(F.sequence(F.lit(0), F.lit(_WAU_DAYS - 1))).alias("off"),
        "day",
        "user_id",
    ).select(F.expr("date_add(day, off)").alias("wday"), "user_id")
    wau = expanded.groupBy(F.col("wday").alias("day")).agg(
        F.countDistinct("user_id").alias("wau")
    )
    return dau.join(wau, "day").select(
        "day",
        "dau",
        "wau",
        (F.col("dau").cast("double") / F.col("wau").cast("double")).alias(
            "stickiness"
        ),
    )


# --- L10: ordered quality-filter chain with attribution ---------------------

_MIN_CHARS = 100
_MAX_REP_RATIO = 0.15
_MIN_DIVERSITY = 0.45


@register(
    "q_text_filter_chain",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
            FROM documents
        ),
        tf AS (
            SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS c
            FROM tok GROUP BY doc_id, t
        ),
        st AS (
            SELECT doc_id,
                   CAST(MAX(c) AS BIGINT) AS max_tf,
                   CAST(SUM(c) AS BIGINT) AS n_tokens,
                   CAST(COUNT(*) AS BIGINT) AS n_distinct
            FROM tf GROUP BY doc_id
        )
        SELECT d.doc_id, d.n_chars, st.n_tokens,
               CASE
                   WHEN d.n_chars < {_MIN_CHARS} THEN 'too_short'
                   WHEN CAST(st.max_tf AS DOUBLE) / st.n_tokens
                        > {_MAX_REP_RATIO} THEN 'repetitive'
                   WHEN CAST(st.n_distinct AS DOUBLE) / st.n_tokens
                        < {_MIN_DIVERSITY} THEN 'low_diversity'
                   ELSE 'pass'
               END AS verdict
        FROM documents d JOIN st ON d.doc_id = st.doc_id
    """,
    section="L10",
    doc="Ordered quality-filter chain with first-failure attribution "
    "(C4/Gopher-style cleaning telemetry: WHICH rule dropped each doc, "
    "not just that it dropped): too-short -> max-token-repetition -> "
    "type/token diversity, evaluated as one fixed CASE chain so rule "
    "precedence is part of the contract. Per-doc stats come from one "
    "keyed token aggregation; the verdict itself is map-only. Ratios are "
    "single int/int IEEE divisions against literal thresholds — exact.",
)
def q_text_filter_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("t")
    )
    st = (
        tok.groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.max("c").alias("max_tf"),
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
        )
    )
    j = docs.select("doc_id", "n_chars").join(st, "doc_id")
    verdict = (
        F.when(F.col("n_chars") < _MIN_CHARS, "too_short")
        .when(
            F.col("max_tf").cast("double") / F.col("n_tokens") > _MAX_REP_RATIO,
            "repetitive",
        )
        .when(
            F.col("n_distinct").cast("double") / F.col("n_tokens")
            < _MIN_DIVERSITY,
            "low_diversity",
        )
        .otherwise("pass")
    )
    return j.select("doc_id", "n_chars", "n_tokens", verdict.alias("verdict"))


# --- G6: k-hop BFS from a seed set ------------------------------------------

_BFS_HOPS = 3
_BFS_SEED_MOD = 7


def _bfs_oracle() -> str:
    from ai_to_cvent_etl_spark.queries.analytics_r3b import _EDGE_CTES

    # AS MATERIALIZED: DuckDB inlines plain CTEs per reference; adj is
    # referenced once per hop, so without it the join-heavy edge CTEs
    # would be re-evaluated every round (G5's lesson).
    parts = [
        f"WITH {_EDGE_CTES}",
        """
        adj AS MATERIALIZED (
            SELECT lo AS src, hi AS dst FROM edges
            UNION ALL SELECT hi, lo FROM edges
        ),
        v0 AS MATERIALIZED (
            SELECT s_suppkey AS node FROM supplier
            WHERE s_suppkey % {mod} = 0
        )""".format(mod=_BFS_SEED_MOD),
    ]
    prev = "v0"
    for r in range(1, _BFS_HOPS + 1):
        parts.append(
            f"""
        v{r} AS MATERIALIZED (
            SELECT DISTINCT adj.dst AS node
            FROM adj JOIN {prev} ON adj.src = {prev}.node
        )"""
        )
        prev = f"v{r}"
    union = " UNION ALL ".join(
        f"SELECT node, {r} AS d FROM v{r}" for r in range(_BFS_HOPS + 1)
    )
    parts.append(
        f"""
        lv AS ({union})"""
    )
    return (
        ",".join(parts)
        + """
        SELECT node, CAST(MIN(d) AS INTEGER) AS dist
        FROM lv GROUP BY node
    """
    )


@register(
    "q_graph_bfs_khop",
    oracle=_bfs_oracle(),
    section="G6",
    doc=f"{_BFS_HOPS}-hop BFS distances from a seed set (every "
    f"{_BFS_SEED_MOD}th supplier) over the mutual top-8 trade-affinity "
    "graph shared with G2/G4/G5 — the reachability / blast-radius "
    "primitive. Fixed rounds keep the oracle expressible as chained CTEs "
    "and the Spark plan depth static; each round joins the frontier to "
    "the degree-bounded adjacency (<= 8 per node) and takes a keyed min; "
    "lineage is localCheckpoint-truncated per round (G1/G5's device). "
    "All-integer — exact.",
)
def q_graph_bfs_khop(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries.analytics_r3b import (
        _mutual_affinity_edges,
    )

    sup = load_table(spark, sf_dir, "supplier")
    edges = _mutual_affinity_edges(spark, sf_dir)
    adj = edges.select(
        F.col("lo").alias("src"), F.col("hi").alias("dst")
    ).unionByName(edges.select(F.col("hi").alias("src"), F.col("lo").alias("dst")))
    seeds = sup.where(F.col("s_suppkey") % _BFS_SEED_MOD == 0).select(
        F.col("s_suppkey").alias("node")
    )
    levels = seeds.select("node", F.lit(0).alias("d"))
    frontier = seeds
    for r in range(1, _BFS_HOPS + 1):
        frontier = (
            adj.join(
                frontier.select(F.col("node").alias("src")), "src", "left_semi"
            )
            .select(F.col("dst").alias("node"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        levels = levels.unionByName(frontier.select("node", F.lit(r).alias("d")))
    return levels.groupBy("node").agg(F.min("d").cast("int").alias("dist"))
