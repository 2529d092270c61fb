"""Sketch / sampling / containment operators (fifth wave, r3).

  SK1 q_sketch_countmin_topk — Count-Min-sketch heavy hitters: the
                               bounded-memory frequency estimator.
  E9  q_etl_sample_weighted  — deterministic weighted priority sampling
                               (reproducible training-subset selection).
  D8  q_dedup_containment    — token-set containment near-dup pairs
                               (doc-inside-doc / quote detection).

Determinism notes (SURVEY §5.3):
  * SK1 buckets are md5-derived (identical string inputs on both engines,
    first 2 hex chars => 0..255); all counts are integers; top-20 fully
    tie-broken (estimate desc, token asc).
  * E9's priority is u48 / weight where u48 is a 48-bit md5 prefix of the
    key: one IEEE double division of bit-identical operands — exact and
    reproducible cross-engine AND cross-run (retry-stable sampling, the
    same property E4's stratified sampler pins).
  * D8's containment ratio is int/int double division, ROUND 4 on both
    sides.

Scale notes:
  * SK1 is the POINT of a sketch: the corpus-sized token stream collapses
    into a d x w = 4 x 256 cell table (map-side partial agg, 1024-row
    shuffle), and estimates come from joining the VOCABULARY (not the
    corpus) against the broadcast cell table. The cell table is bounded
    by construction — the broadcast can never invert at scale.
  * E9 selects top-k by priority via orderBy().limit() — Spark plans
    TakeOrderedAndProject (per-partition heaps + driver merge of k), NOT
    a global sort; the row_number ranking runs on the k surviving rows.
  * D8 blocks pairs on `source` and samples the probe side (doc_id%3),
    with the D1/D3/D6 `corpus_side()` strategy switch on the build side —
    'auto' lets Catalyst/AQE pick broadcast vs shuffle by size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.queries._util import corpus_side, fan_out
from ai_to_cvent_etl_spark.registry import register

# --- SK1: Count-Min sketch heavy hitters ------------------------------------

_CM_D = 4    # hash rows
_CM_TOPK = 20

_CM_BUCKET_SPARK = (
    "cast(conv(substr(md5(concat('cm', cast(d as string), ':', t)), 1, 2),"
    " 16, 10) as int)"
)
_CM_BUCKET_DUCK = (
    "CAST(('0x' || substr(md5('cm' || CAST(d AS VARCHAR) || ':' || t),"
    " 1, 2)) AS BIGINT)"
)


@register(
    "q_sketch_countmin_topk",
    oracle=f"""
        WITH tok AS (
            SELECT unnest(string_split(text, ' ')) AS t FROM documents
        ),
        dd AS (SELECT unnest([0, 1, 2, 3]) AS d),
        hashed AS (
            SELECT t, d, {_CM_BUCKET_DUCK} AS b FROM tok CROSS JOIN dd
        ),
        cms AS (
            SELECT d, b, CAST(COUNT(*) AS BIGINT) AS c
            FROM hashed GROUP BY d, b
        ),
        tf AS (
            SELECT t, CAST(COUNT(*) AS BIGINT) AS exact_count
            FROM tok GROUP BY t
        ),
        cand AS (
            SELECT tf.t, tf.exact_count, dd.d, {_CM_BUCKET_DUCK} AS b
            FROM tf CROSS JOIN dd
        ),
        est AS (
            SELECT cand.t AS token,
                   CAST(MIN(cand.exact_count) AS BIGINT) AS exact_count,
                   CAST(MIN(cms.c) AS BIGINT) AS cm_estimate
            FROM cand JOIN cms ON cms.d = cand.d AND cms.b = cand.b
            GROUP BY cand.t
        )
        SELECT token, cm_estimate, exact_count
        FROM est
        ORDER BY cm_estimate DESC, token
        LIMIT {_CM_TOPK}
    """,
    section="SK1",
    doc="Count-Min-sketch heavy hitters over the corpus token stream: "
    "d=4 md5-derived hash rows x w=256 buckets, estimate = min over rows "
    "of the bucket count (classic CM upper bound; exact_count output "
    "beside it exposes the overestimate). The corpus-sized stream "
    "collapses into a 1024-cell table via map-side partial aggregation — "
    "bounded memory at ANY corpus size — and estimates join the "
    "vocabulary (not the corpus) against the broadcast cell table. "
    "All-integer, fully tie-broken top-20 => exact.",
)
def q_sketch_countmin_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(F.split("text", " ")).alias("t"))
    dd = spark.range(_CM_D).select(F.col("id").cast("int").alias("d"))
    hashed = tok.crossJoin(F.broadcast(dd)).withColumn(
        "b", F.expr(_CM_BUCKET_SPARK)
    )
    cms = hashed.groupBy("d", "b").agg(F.count(F.lit(1)).alias("c"))
    tf = tok.groupBy("t").agg(F.count(F.lit(1)).alias("exact_count"))
    cand = tf.crossJoin(F.broadcast(dd)).withColumn(
        "b", F.expr(_CM_BUCKET_SPARK)
    )
    est = (
        cand.join(F.broadcast(cms), ["d", "b"])
        .groupBy(F.col("t").alias("token"))
        .agg(
            F.min("exact_count").alias("exact_count"),
            F.min("c").alias("cm_estimate"),
        )
    )
    return est.select("token", "cm_estimate", "exact_count").orderBy(
        F.desc("cm_estimate"), F.asc("token")
    ).limit(_CM_TOPK)


# --- E9: deterministic weighted priority sampling ---------------------------

_WS_K = 200


@register(
    "q_etl_sample_weighted",
    oracle=f"""
        WITH pri AS (
            SELECT o_orderkey, o_totalprice,
                   CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),
                                        1, 12)) AS BIGINT)
                   / o_totalprice AS priority
            FROM orders
        ),
        top AS (
            SELECT * FROM pri ORDER BY priority, o_orderkey LIMIT {_WS_K}
        )
        SELECT o_orderkey, o_totalprice, priority,
               CAST(row_number() OVER (ORDER BY priority, o_orderkey)
                    AS BIGINT) AS sample_rank
        FROM top
    """,
    section="E9",
    doc="Deterministic weighted priority sampling (top-k of u/w where u "
    "is a 48-bit md5 prefix of the key): higher-weight rows get smaller "
    "priorities more often, giving a weighted-without-replacement sample "
    "that is bit-reproducible across engines, runs, and retries — the "
    "importance-sampled training-subset primitive beside E4's uniform "
    "stratified sampler. Selection is orderBy().limit() => Spark plans "
    "TakeOrderedAndProject (per-partition top-k heaps + driver merge), "
    "never a global sort; ranking runs on the k survivors.",
)
def q_etl_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    pri = orders.select(
        "o_orderkey",
        "o_totalprice",
        (
            F.expr(
                "cast(conv(substr(md5(cast(o_orderkey as string)), 1, 12),"
                " 16, 10) as bigint)"
            ).cast("double")
            / F.col("o_totalprice")
        ).alias("priority"),
    )
    top = pri.orderBy("priority", "o_orderkey").limit(_WS_K)
    rn = F.row_number().over(Window.orderBy("priority", "o_orderkey"))
    return top.select(
        "o_orderkey", "o_totalprice", "priority", rn.alias("sample_rank")
    )


# --- D8: token-set containment near-dup pairs -------------------------------

_CONTAIN_T = 0.8
_CONTAIN_MIN_SZ = 10
_CONTAIN_TOPN = 3


@register(
    "q_dedup_containment",
    oracle=f"""
        WITH ts AS (
            SELECT doc_id, source,
                   list_distinct(string_split(text, ' ')) AS toks,
                   len(list_distinct(string_split(text, ' '))) AS sz
            FROM documents
        ),
        pairs AS (
            SELECT a.doc_id AS doc_lo, b.doc_id AS doc_hi,
                   ROUND(CAST(len(list_filter(a.toks,
                                  x -> list_contains(b.toks, x)))
                              AS DOUBLE)
                         / least(a.sz, b.sz), 4) AS containment
            FROM ts a JOIN ts b
              ON a.source = b.source AND a.doc_id < b.doc_id
             AND a.doc_id % 3 = 0
            WHERE a.sz >= {_CONTAIN_MIN_SZ} AND b.sz >= {_CONTAIN_MIN_SZ}
              AND CAST(len(list_filter(a.toks,
                               x -> list_contains(b.toks, x)))
                       AS DOUBLE) / least(a.sz, b.sz) >= {_CONTAIN_T}
        )
        SELECT doc_lo, doc_hi, containment
        FROM pairs
        QUALIFY row_number() OVER (
            PARTITION BY doc_lo ORDER BY containment DESC, doc_hi
        ) <= {_CONTAIN_TOPN}
    """,
    section="D8",
    doc="Token-set CONTAINMENT near-dup pairs — |A intersect B| / min(|A|,"
    "|B|): catches a small document embedded in a larger one (quotes, "
    "boilerplate wrappers) that symmetric Jaccard dilutes below its "
    "threshold. Same scale shape as D6: token sets row-local, pair join "
    "blocked on source with the probe side sampled (doc_id%3) and the "
    "build side under the corpus_side() strategy switch; output capped "
    "at the top-3 containers per probe doc (row_number, full tie-break) "
    "so result size stays LINEAR in the corpus even though this fixture "
    "is pathologically dup-heavy (quadratic pair count). Ratio is "
    "int/int IEEE division, ROUND 4 both sides.",
)
def q_dedup_containment(
    spark: SparkSession, sf_dir: str, strategy: str = "auto"
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ts = docs.select(
        "doc_id",
        "source",
        F.array_distinct(F.split("text", " ")).alias("toks"),
        F.size(F.array_distinct(F.split("text", " "))).alias("sz"),
    ).filter(F.col("sz") >= _CONTAIN_MIN_SZ)
    a = fan_out(
        ts.filter(F.col("doc_id") % 3 == 0).select(
            F.col("doc_id").alias("doc_lo"),
            F.col("source"),
            F.col("toks").alias("toks_a"),
            F.col("sz").alias("sz_a"),
        )
    )
    b = ts.select(
        F.col("doc_id").alias("doc_hi"),
        F.col("source").alias("source_b"),
        F.col("toks").alias("toks_b"),
        F.col("sz").alias("sz_b"),
    )
    paired = a.join(
        corpus_side(b, strategy),
        (F.col("source") == F.col("source_b"))
        & (F.col("doc_lo") < F.col("doc_hi")),
    ).withColumn(
        "i", F.size(F.array_intersect(F.col("toks_a"), F.col("toks_b")))
    )
    cont = F.col("i").cast("double") / F.least(F.col("sz_a"), F.col("sz_b"))
    pairs = paired.filter(cont >= _CONTAIN_T).select(
        "doc_lo", "doc_hi", F.round(cont, 4).alias("containment")
    )
    rn = F.row_number().over(
        Window.partitionBy("doc_lo").orderBy(
            F.desc("containment"), F.asc("doc_hi")
        )
    )
    return (
        pairs.withColumn("rn", rn)
        .filter(F.col("rn") <= _CONTAIN_TOPN)
        .select("doc_lo", "doc_hi", "containment")
    )
