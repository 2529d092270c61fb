"""Sketch / sampling / containment operators (fifth wave, r3).

  SK1 q_sketch_countmin_topk — Count-Min-sketch heavy hitters: the
                               bounded-memory frequency estimator.
  E9  q_etl_sample_weighted  — deterministic weighted priority sampling
                               (reproducible training-subset selection).
  D8  q_dedup_containment    — token-set containment near-dup pairs
                               (doc-inside-doc / quote detection).
  TS6 q_ts_autocorr          — per-user lag-1 autocorrelation via exact
                               integer moment sums.
  V9  q_vec_random_projection — Johnson-Lindenstrauss 64d->8d sketch with
                               a deterministic md5-parity +/-1 matrix.

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

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.queries._util import corpus_side, fan_out
from ai_to_cvent_etl_spark.registry import register
from pyspark.sql.types import DecimalType
from ai_to_cvent_etl_spark.queries._util import dec2

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
        "o_orderkey",
        "o_totalprice",
        "priority",
        rn.cast("bigint").alias("sample_rank"),
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


# --- TS6: per-user lag-1 autocorrelation ------------------------------------
#
# Pearson correlation between consecutive event values per user — the
# seasonality / burstiness signal. Same exactness device as TS4: values are
# quantized floor(v*1e4) to BIGINT, all five moment sums (n, Sx, Sy, Sxx,
# Syy, Sxy) are exact integer aggregations (order-insensitive under any
# partitioning — no window-frame summation order to trust), and the final
# r = (n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2) * (n*Syy - Sy^2))
# is rebuilt with the identical IEEE expression on both engines. Products
# fit: |qv| <= 5e6, Sxy <= 86 * 2.5e13 ~ 2.2e15 << 2^63; n*Sxy <= 1.9e17.

_AC_MIN_N = 10


@register(
    "q_ts_autocorr",
    oracle=f"""
        WITH q AS (
            SELECT user_id,
                   CAST(floor(value * 1e4) AS BIGINT) AS x,
                   lag(CAST(floor(value * 1e4) AS BIGINT)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS y
            FROM events
        ),
        m AS (
            SELECT user_id,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x * x) AS BIGINT) AS sxx,
                   CAST(SUM(y * y) AS BIGINT) AS syy,
                   CAST(SUM(x * y) AS BIGINT) AS sxy
            FROM q WHERE y IS NOT NULL
            GROUP BY user_id
        )
        SELECT user_id, n,
               (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
               / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                      * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
                   AS autocorr
        FROM m
        WHERE n >= {_AC_MIN_N}
          AND CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
          AND CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy > 0
    """,
    section="TS6",
    doc="Per-user lag-1 autocorrelation of event values (burstiness / "
    "seasonality signal): one lag window per user, then five exact "
    "integer moment sums over floor(v*1e4)-quantized values — "
    "order-insensitive under any partitioning, so unlike a raw-double "
    "corr() the result is bit-identical cross-engine and cross-run; "
    "Pearson r rebuilt with the identical IEEE expression. One window "
    "sort + one keyed aggregation at any scale.",
)
def q_ts_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    q = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.expr("cast(floor(value * 1e4) as bigint)").alias("x"),
    ).withColumn("y", F.lag("x").over(w))
    m = (
        q.filter(F.col("y").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
        )
    )
    nd = F.col("n").cast("double")
    vx = nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    vy = nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    r = (nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")) / (
        F.sqrt(vx * vy)
    )
    return m.filter(
        (F.col("n") >= _AC_MIN_N) & (vx > 0) & (vy > 0)
    ).select("user_id", "n", r.alias("autocorr"))


# --- V9: Johnson-Lindenstrauss random projection ----------------------------

_RP_OUT = 8  # 64-d -> 8-d


def _rp_signs(j: int, dim: int = 64) -> list[int]:
    """Deterministic +/-1 projection row j: md5 parity, identical literal
    on both engines (same device as D7's hyperplanes)."""
    out = []
    for i in range(dim):
        h = int(hashlib.md5(f"rp{j}:{i}".encode()).hexdigest()[:2], 16)
        out.append(1 if h % 2 == 0 else -1)
    return out


_RP_ROWS = [_rp_signs(j) for j in range(_RP_OUT)]


def _rp_proj_spark(j: int) -> str:
    arr = f"array({', '.join(f'{v}D' for v in _RP_ROWS[j])})"
    # trailing + 0D: IEEE -0.0 + 0.0 = +0.0 — normalizes negative zero
    # (sign-flipped sf1 replicas produce exact -0.0 sums whose repr
    # differs cross-engine while == holds)
    return (
        f"round(aggregate(zip_with(embedding, {arr},"
        f" (x, y) -> cast(x as double) * y), 0D, (a, v) -> a + v), 4) + 0D"
    )


def _rp_proj_duck(j: int) -> str:
    # list_reduce, NOT list_sum: the fold must be left-to-right to be
    # IEEE-identical to Spark's aggregate(..., (a, v) -> a + v) —
    # list_sum's summation order is unspecified and at sf1 scale a value
    # landed on a ROUND(...,4) half boundary where the orders disagree
    # (r6, found by the full sf1 sweep)
    arr = f"[{', '.join(str(v) for v in _RP_ROWS[j])}]"
    return (
        f"ROUND(list_reduce(list_prepend(CAST(0 AS DOUBLE),"
        f" list_transform(range(1, 65),"
        f" i -> CAST(embedding[i] AS DOUBLE) * ({arr})[i])),"
        f" (a, v) -> a + v), 4) + 0.0"
    )


@register(
    "q_vec_random_projection",
    oracle=(
        "SELECT vec_id, "
        + ", ".join(f"{_rp_proj_duck(j)} AS p{j}" for j in range(_RP_OUT))
        + " FROM embeddings"
    ),
    section="V9",
    doc="Johnson-Lindenstrauss random projection 64-d -> 8-d with a "
    "deterministic md5-parity +/-1 matrix (Achlioptas-style sparse JL): "
    "each output dim is a fixed left-to-right higher-order fold over the "
    "embedding (V1's device) — bit-deterministic before the ROUND 4. "
    "Row-local, zero shuffle at any scale; the 8-d sketch is the cheap "
    "distance-preserving key for downstream LSH/clustering passes.",
)
def q_vec_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        *[
            F.expr(_rp_proj_spark(j)).alias(f"p{j}")
            for j in range(_RP_OUT)
        ],
    )


# ==== from analytics_r3c ===========================================

_BLOOM_M = 4096  # bits

_BLOOM_K = 3     # hash functions

_BLOOM_POS_SPARK = (
    "cast(conv(substr(md5(concat('bf', cast(seed as string), ':',"
    " cast(k as string))), 1, 4), 16, 10) as bigint) % {m}"
)

_BLOOM_POS_DUCK = (
    "CAST(('0x' || substr(md5('bf' || CAST(seed AS VARCHAR) || ':' ||"
    " CAST(k AS VARCHAR)), 1, 4)) AS BIGINT) % {m}"
)

@register(
    "q_sketch_bloom",
    oracle=f"""
        WITH seeds AS (SELECT unnest([0, 1, 2]) AS seed),
        build AS (
            SELECT DISTINCT c_custkey AS k FROM customer
            WHERE c_mktsegment = 'BUILDING'
        ),
        bits AS (
            SELECT DISTINCT {_BLOOM_POS_DUCK.format(m=_BLOOM_M)} AS pos
            FROM build CROSS JOIN seeds
        ),
        probe AS (SELECT DISTINCT o_custkey AS k FROM orders),
        probe_pos AS (
            SELECT k, {_BLOOM_POS_DUCK.format(m=_BLOOM_M)} AS pos
            FROM probe CROSS JOIN seeds
        ),
        hits AS (
            SELECT p.k, CAST(COUNT(b.pos) AS BIGINT) AS n_hit
            FROM probe_pos p LEFT JOIN bits b ON p.pos = b.pos
            GROUP BY p.k
        ),
        flagged AS (
            SELECT h.k,
                   CASE WHEN h.n_hit = {_BLOOM_K} THEN 1 ELSE 0 END AS bloom_pass,
                   CASE WHEN bu.k IS NOT NULL THEN 1 ELSE 0 END AS truth
            FROM hits h LEFT JOIN build bu ON h.k = bu.k
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_probe,
               CAST(SUM(bloom_pass) AS BIGINT) AS n_pass,
               CAST(SUM(truth) AS BIGINT) AS n_true,
               CAST(SUM(CASE WHEN bloom_pass = 1 AND truth = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
               CAST(SUM(CASE WHEN bloom_pass = 0 AND truth = 1
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_false_neg,
               CAST(SUM(CASE WHEN bloom_pass = 1 AND truth = 0
                             THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(COUNT(*) AS BIGINT) AS fp_rate
        FROM flagged
    """,
    section="SK2",
    doc=f"Bloom-filter semi-join pre-filter, measured: an m={_BLOOM_M}-bit "
    f"k={_BLOOM_K}-hash filter is built from the BUILDING-segment customer "
    "keys (md5-derived positions — identical bits cross-engine) and probed "
    "with every ordering customer; output = pass/true/false-positive "
    "counts and the FP rate (the always-zero false-negative column pins "
    "the no-false-negative Bloom invariant). This is the runtime-filter "
    "pattern Spark itself uses for join pruning: the bit set is bounded "
    f"({_BLOOM_M} rows max) and broadcast, the probe side never shuffles; "
    "all counts are integers, fp_rate is one IEEE division.",
)
def q_sketch_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    seeds = spark.range(_BLOOM_K).select(F.col("id").cast("int").alias("seed"))
    build = (
        cu.where(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("k"))
        .distinct()
    )
    pos_expr = F.expr(_BLOOM_POS_SPARK.format(m=_BLOOM_M))
    bits = (
        build.crossJoin(F.broadcast(seeds)).select(pos_expr.alias("pos")).distinct()
    )
    probe = od.select(F.col("o_custkey").alias("k")).distinct()
    probe_pos = probe.crossJoin(F.broadcast(seeds)).select(
        "k", pos_expr.alias("pos")
    )
    hits = (
        probe_pos.join(
            F.broadcast(bits.select(F.col("pos").alias("bpos"))),
            F.col("pos") == F.col("bpos"),
            "left",
        )
        .groupBy("k")
        .agg(F.count("bpos").alias("n_hit"))
    )
    flagged = hits.join(
        build.select(F.col("k").alias("bk")), F.col("k") == F.col("bk"), "left"
    ).select(
        F.when(F.col("n_hit") == _BLOOM_K, 1).otherwise(0).alias("bloom_pass"),
        F.when(F.col("bk").isNotNull(), 1).otherwise(0).alias("truth"),
    )
    return flagged.agg(
        F.count(F.lit(1)).alias("n_probe"),
        F.sum("bloom_pass").alias("n_pass"),
        F.sum("truth").alias("n_true"),
        F.sum(
            F.when((F.col("bloom_pass") == 1) & (F.col("truth") == 0), 1).otherwise(0)
        ).alias("n_false_pos"),
        F.sum(
            F.when((F.col("bloom_pass") == 0) & (F.col("truth") == 1), 1).otherwise(0)
        ).alias("n_false_neg"),
        (
            F.sum(
                F.when(
                    (F.col("bloom_pass") == 1) & (F.col("truth") == 0), 1
                ).otherwise(0)
            ).cast("double")
            / F.count(F.lit(1))
        ).alias("fp_rate"),
    )

# ==== from analytics_r3e ===========================================

@register(
    "q_sketch_hll_union",
    oracle=None,  # rows-only BY DESIGN: HLL estimates are engine-specific
    # (A4/A20's reason); tests/golden pins within-Spark determinism.
    section="SK3",
    doc="HyperLogLog partial-sketch workflow: per-event-type user "
    "sketches (hll_sketch_agg, lgK=12 => ~4 KB bounded state each), "
    "per-type estimates, PLUS the union-merged overall estimate "
    "(hll_union_agg) — the mergeable-aggregate pattern that computes "
    "group-level AND total distincts in ONE corpus pass at 100 TB "
    "(re-aggregating sketches instead of re-shuffling raw keys). "
    "Exact twin A3 is the semantics oracle; estimates are rows-only "
    "by design with a golden test (A4/A20 precedent).",
)
def q_sketch_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sk = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sketch"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    per_type = sk.select(
        "event_type",
        F.hll_sketch_estimate("sketch").alias("approx_users"),
        "exact_users",
    )
    overall = sk.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_users"),
        F.sum(F.lit(0)).cast("bigint").alias("_z"),
    ).select(
        F.lit("__all__").alias("event_type"),
        "approx_users",
        F.lit(None).cast("bigint").alias("exact_users"),
    )
    return per_type.unionByName(overall)

# ==== from analytics_r3i ===========================================

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

# ==== from analytics_r3m ===========================================

_KMVJ_K = 16

@register(
    "q_sketch_kmv_jaccard",
    oracle=f"""
        WITH h AS (
            SELECT {_H48_DUCK} AS h48,
                   MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                       AS in_a,
                   MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS in_b
            FROM events
            WHERE event_type IN ('click', 'purchase')
            GROUP BY user_id
        ),
        ranked AS (
            SELECT h48, in_a, in_b,
                   row_number() OVER (ORDER BY h48) AS rnk
            FROM h
        ),
        sk AS (
            SELECT CAST(SUM(in_a * in_b) AS DOUBLE) / {_KMVJ_K}
                       AS jaccard_est
            FROM ranked WHERE rnk <= {_KMVJ_K}
        ),
        ex AS (
            SELECT CAST(SUM(in_a * in_b) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS jaccard_exact,
                   CAST(COUNT(*) AS BIGINT) AS n_union
            FROM h
        )
        SELECT CAST({_KMVJ_K} AS INT) AS k,
               sk.jaccard_est, ex.jaccard_exact, ex.n_union
        FROM sk CROSS JOIN ex
    """,
    section="SK5",
    doc=f"KMV set-similarity sketch: the Jaccard similarity between the "
    "'click' and 'purchase' user sets estimated from the k={_KMVJ_K} "
    "minimum 48-bit hashes of the UNION (the fraction of the k-min "
    "sample lying in the intersection — the classic bottom-k estimator), "
    "with the exact Jaccard and union size alongside. Pure hash/integer "
    "logic over SK4's md5 hash: the estimate is a ratio of exact "
    "integers, so — like SK4 and unlike HLL — the sketch output itself "
    "hash-matches cross-engine. Per-side state is the k smallest "
    "hashes; sketches merge by re-ranking (mergeable across partitions "
    "and time windows).",
)
def q_sketch_kmv_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    h = (
        ev.where(F.col("event_type").isin("click", "purchase"))
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ).alias("in_a"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("in_b"),
        )
        .select(F.expr(_H48_SPARK).alias("h48"), "in_a", "in_b")
    )
    ranked = h.withColumn(
        "rnk", F.row_number().over(Window.orderBy("h48"))
    )
    sk = ranked.where(F.col("rnk") <= _KMVJ_K).agg(
        (F.sum(F.col("in_a") * F.col("in_b")).cast("double") / _KMVJ_K).alias(
            "jaccard_est"
        )
    )
    ex = h.agg(
        (
            F.sum(F.col("in_a") * F.col("in_b")).cast("double")
            / F.count("*").cast("double")
        ).alias("jaccard_exact"),
        F.count("*").alias("n_union"),
    )
    return sk.crossJoin(ex).select(
        F.lit(_KMVJ_K).alias("k"), "jaccard_est", "jaccard_exact", "n_union"
    )

# ==== from analytics_r3t ===========================================

@register(
    "q_sketch_bitmap_distinct",
    oracle="""
        SELECT event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events
        GROUP BY event_type
    """,
    section="SK6",
    doc="Exact distinct counting via Spark's bitmap aggregate family: "
    "user ids split into (bucket, bit position), per-bucket bitmaps "
    "built with bitmap_construct_agg, popcounts summed — equals "
    "COUNT(DISTINCT) bit-for-bit, which IS the oracle. The dense-id "
    "sketch: bitmaps OR-combine map-side and across time windows "
    "(mergeable like SK3/SK4 HLL/KMV but EXACT), memory |id-range|/8 "
    "bits per key split across fixed-size buckets — the right tool "
    "when ids are dense integers (user ids, row ids); for sparse "
    "64-bit keys fall back to SK4's KMV or A4's HLL. Two keyed "
    "reductions, both partial-agg friendly.",
)
def q_sketch_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_bucket = (
        ev.select(
            "event_type",
            F.expr("bitmap_bucket_number(user_id)").alias("bkt"),
            F.expr("bitmap_bit_position(user_id)").alias("pos"),
        )
        .groupBy("event_type", "bkt")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
    )
    return per_bucket.groupBy("event_type").agg(
        F.expr("CAST(sum(bitmap_count(bm)) AS BIGINT)").alias("n_users")
    )

# ==== from analytics_r3y ===========================================

_SK7_K = 10

_H48_DOC = (
    "cast(conv(substr(md5(cast(doc_id as string)), 1, 12), 16, 10) as bigint)"
)

_H48_DOC_DUCK = (
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT)"
)

@register(
    "q_sketch_consistent_sample",
    oracle=f"""
        WITH h AS (
            SELECT lang, doc_id, n_chars, {_H48_DOC_DUCK} AS h48
            FROM documents
        ),
        r AS (
            SELECT lang, doc_id, n_chars,
                   row_number() OVER (
                       PARTITION BY lang ORDER BY h48, doc_id
                   ) AS rnk
            FROM h
        )
        SELECT lang, doc_id, n_chars, CAST(rnk AS INT) AS rnk
        FROM r WHERE rnk <= {_SK7_K}
    """,
    section="SK7",
    doc=f"Consistent bottom-k-by-hash sample: the {_SK7_K} documents with "
    "the smallest id-hashes per language — because selection depends "
    "only on the key's hash, ANY snapshot, replica, or engine picks "
    "the SAME documents (minus deletions), so samples of two datasets "
    "are directly comparable row-by-row: the cross-snapshot QA "
    "primitive (eyeball the same docs before/after a pipeline change; "
    "diff their bytes with E21). Contrast E4/E9: those sample "
    "proportions, this samples IDENTITIES. Bottom-k per group is "
    "SK4's rank window; two-level heads merge at scale.",
)
def q_sketch_consistent_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = docs.select("lang", "doc_id", "n_chars", F.expr(_H48_DOC).alias("h48"))
    rnk = F.row_number().over(
        Window.partitionBy("lang").orderBy("h48", "doc_id")
    )
    return (
        h.withColumn("rnk", rnk)
        .where(F.col("rnk") <= _SK7_K)
        .select("lang", "doc_id", "n_chars", F.col("rnk").cast("int"))
    )


_LC_M = 65536  # linear-counting bitmap width


@register(
    "q_sketch_linear_counting",
    oracle=f"""
        WITH b AS (
            SELECT DISTINCT
                   CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)),
                                        1, 12)) AS BIGINT) % {_LC_M}
                       AS bucket
            FROM orders
        ),
        z AS (
            SELECT CAST({_LC_M} - COUNT(*) AS BIGINT) AS z_empty FROM b
        ),
        x AS (
            SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_exact
            FROM orders
        )
        SELECT {_LC_M} AS m, n_exact, z_empty,
               CASE WHEN z_empty = 0 THEN NULL
                    ELSE ROUND({_LC_M} * ln({_LC_M} / (1.0 * z_empty)), 4)
               END AS lc_estimate,
               z_empty = 0 AS saturated
        FROM z CROSSJOIN_TOKEN x
    """.replace("CROSSJOIN_TOKEN", "CROSS JOIN"),
    section="SK8",
    doc="Linear counting distinct estimate of active customers: hash "
    "each key into a 1024-slot bitmap (48-bit md5 device — the SAME "
    "hash both engines, so unlike HLL (A4/SK3, rows-only) this "
    "sketch has an EXACT oracle, the SK4-KMV property), count empty "
    "slots z, estimate = m*ln(m/z). THE low-cardinality-regime "
    "sketch: below ~m distinct keys its error beats HLL at equal "
    "memory, which is why production HLLs (and Spark's own) switch "
    "to linear counting under a fill threshold — this query "
    "exposes the regime explicitly beside the exact count, and "
    "reports saturation (z=0, estimate NULL) instead of dividing "
    "by zero — the documented fallback point where a production "
    "sketch hands over to HLL. Scale: the bitmap is a 65536-row "
    "DISTINCT — constant state, map-side combinable, mergeable "
    "across shards by construction.",
)
def q_sketch_linear_counting(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    b = od.select(
        (
            F.expr(
                "cast(conv(substr(md5(cast(o_custkey as string)), 1, 12),"
                " 16, 10) as bigint)"
            )
            % _LC_M
        ).alias("bucket")
    ).distinct()
    z = b.agg((_LC_M - F.count(F.lit(1))).cast("bigint").alias("z_empty"))
    x = od.agg(
        F.countDistinct("o_custkey").cast("bigint").alias("n_exact")
    )
    return z.crossJoin(x).select(
        F.lit(_LC_M).cast("int").alias("m"),
        "n_exact",
        "z_empty",
        F.when(F.col("z_empty") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                _LC_M
                * F.log(_LC_M / (1.0 * F.col("z_empty"))),
                4,
            )
        )
        .alias("lc_estimate"),
        (F.col("z_empty") == 0).alias("saturated"),
    )


_CMS_WIDTHS = (64, 256, 1024)
_CMS_TOP = 5       # audit the top-5 tokens by exact count


@register(
    "q_sketch_cms_width_sweep",
    oracle=f"""
        WITH tf AS MATERIALIZED (
            SELECT u AS tok, CAST(COUNT(*) AS BIGINT) AS n
            FROM (SELECT unnest(string_split(text, ' ')) AS u
                  FROM documents)
            WHERE u <> ''
            GROUP BY u
        ),
        top AS MATERIALIZED (
            SELECT tok, n FROM (
                SELECT tok, n,
                       row_number() OVER (ORDER BY n DESC, tok) AS rn
                FROM tf
            ) WHERE rn <= {_CMS_TOP}
        ),
        widths AS (SELECT unnest([{", ".join(map(str, _CMS_WIDTHS))}])
                       AS w),
        cells AS MATERIALIZED (
            SELECT w, r,
                   CAST(('0x' || substr(md5(CAST(r AS VARCHAR) || ':'
                                        || tok), 1, 12)) AS BIGINT)
                       % w AS cell,
                   CAST(SUM(n) AS BIGINT) AS cell_n
            FROM tf CROSS JOIN widths
            CROSS JOIN (SELECT unnest([0, 1]) AS r)
            GROUP BY w, r, cell
        ),
        est AS (
            SELECT t.tok, t.n, c.w,
                   CAST(MIN(c.cell_n) AS BIGINT) AS cms_est
            FROM top t
            CROSS JOIN (SELECT unnest([0, 1]) AS r) rr
            JOIN cells c
              ON c.w IN ({", ".join(map(str, _CMS_WIDTHS))})
             AND c.r = rr.r
             AND c.cell = CAST(('0x' || substr(md5(CAST(rr.r AS VARCHAR)
                               || ':' || t.tok), 1, 12)) AS BIGINT) % c.w
            GROUP BY t.tok, t.n, c.w
        )
        SELECT CAST(w AS INT) AS width, tok,
               n AS exact_count, cms_est,
               CAST(cms_est - n AS BIGINT) AS overestimate
        FROM est
    """,
    section="SK9",
    doc="Count-Min width calibration sweep: the same depth-2 md5 CMS "
    "at widths 64/256/1024, audited against exact counts for the "
    "top-5 tokens — overestimate = collision mass, the number that "
    "prices sketch memory BEFORE a 100 TB frequency job commits to "
    "a width (CMS error ~ N/w; tripling the exponent should shrink "
    "it ~16x per step, visible in the output). SK1's fixed-width "
    "CMS made the sketch declarable; this makes its ERROR CURVE "
    "declarable — same hash both engines (48-bit md5 device), so "
    "estimates are EXACT-oracle, not rows-only. Scale: the sweep "
    "runs entirely on the vocabulary-bounded token-count table "
    "(corpus scanned once for tf); cells are (width x 2 x w) rows.",
)
def q_sketch_cms_width_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import fan_out

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        fan_out(docs)
        .select(F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    wt = Window.orderBy(F.col("n").desc(), F.col("tok"))
    top = (
        tf.withColumn("rn", F.row_number().over(wt))
        .where(F.col("rn") <= _CMS_TOP)
        .select("tok", "n")
    )
    widths = spark.createDataFrame(
        [(w,) for w in _CMS_WIDTHS], "w int"
    ).select(F.col("w").cast("bigint").alias("w"))
    rows2 = spark.createDataFrame([(0,), (1,)], "r int").select(
        F.col("r").cast("bigint").alias("r")
    )

    def cell_of(tok_col):
        return (
            F.expr(
                "cast(conv(substr(md5(concat(cast(r as string), ':', "
                f"{tok_col})), 1, 12), 16, 10) as bigint)"
            )
            % F.col("w")
        )

    # r8 (guide §1.2 per-task work): the 48-bit md5 cell hash depends only
    # on (r, tok) — hoist it ABOVE the width fan-out so it is computed
    # vocab x 2 times instead of vocab x 6 (the % w projection per width
    # is integer-cheap). Same cells bit-for-bit.
    raw_hash = F.expr(
        "cast(conv(substr(md5(concat(cast(r as string), ':', tok)), "
        "1, 12), 16, 10) as bigint)"
    )
    hashed = (
        tf.crossJoin(F.broadcast(rows2))
        .select("r", "n", raw_hash.alias("hv"))
    )
    cells = (
        hashed.crossJoin(F.broadcast(widths))
        .select("w", "r", (F.col("hv") % F.col("w")).alias("cell"), "n")
        .groupBy("w", "r", "cell")
        .agg(F.sum("n").cast("bigint").alias("cell_n"))
    )
    probes = (
        F.broadcast(top)
        .crossJoin(F.broadcast(widths))
        .crossJoin(F.broadcast(rows2))
        .select("tok", "n", "w", "r", cell_of("tok").alias("cell"))
    )
    est = (
        probes.join(cells, ["w", "r", "cell"])
        .groupBy("tok", "n", "w")
        .agg(F.min("cell_n").cast("bigint").alias("cms_est"))
    )
    return est.select(
        F.col("w").cast("int").alias("width"),
        "tok",
        F.col("n").alias("exact_count"),
        "cms_est",
        (F.col("cms_est") - F.col("n")).cast("bigint").alias("overestimate"),
    )


# --- SK10: manual HyperLogLog with cross-engine-exact registers -------------

_HLL_M = 64        # 2^6 registers
_HLL_ALPHA = 0.709  # standard alpha_64 (Flajolet et al. 2007)
_HLL_PAY = 4398046511104  # 2^42: payload modulus below the 6 bucket bits


@register(
    "q_sketch_hll_manual",
    oracle=f"""
        WITH h AS (
            SELECT DISTINCT o_custkey,
                   CAST(list_sum(list_transform(range(1, 13),
                        i -> (strpos('0123456789abcdef',
                                     substr(md5(CAST(o_custkey AS VARCHAR)),
                                            i, 1)) - 1)
                             * power(16, 12 - i))) AS BIGINT) AS v
            FROM orders
        ),
        reg AS (
            SELECT v // {_HLL_PAY} AS bucket,
                   MAX(CASE WHEN v % {_HLL_PAY} = 0 THEN 43
                            ELSE 43 - length(bin(v % {_HLL_PAY})) END)
                       AS m_b
            FROM h GROUP BY 1
        ),
        s AS (
            SELECT SUM(power(2.0, -m_b)) + ({_HLL_M} - COUNT(*)) AS denom,
                   {_HLL_M} - COUNT(*) AS v_zero
            FROM reg
        ),
        est AS (
            SELECT v_zero,
                   CASE WHEN {_HLL_ALPHA} * {_HLL_M} * {_HLL_M} / denom
                             <= 2.5 * {_HLL_M} AND v_zero > 0
                        THEN {_HLL_M} * ln(CAST({_HLL_M} AS DOUBLE) / v_zero)
                        ELSE {_HLL_ALPHA} * {_HLL_M} * {_HLL_M} / denom
                   END AS e
            FROM s
        ),
        exact AS (
            SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS nd
            FROM orders
        )
        SELECT CAST({_HLL_M} AS BIGINT) AS m,
               CAST(v_zero AS BIGINT) AS v_zero,
               ROUND(e, 4) AS hll_estimate,
               nd AS exact_distinct,
               ROUND((e - nd) / nd, 4) AS rel_err
        FROM est CROSS JOIN exact
    """,
    section="SK10",
    doc="Manual HyperLogLog built register-by-register from md5-derived "
    "48-bit hashes (6 bucket bits, 42 payload bits, rho via the "
    "binary-string length both engines print identically): the "
    "estimate itself — alpha*m^2 / sum 2^-M with the small-range "
    "linear-counting correction — is EXACT-ORACLE-CHECKED, which the "
    "builtin approx_count_distinct (A4) can never be (engine-private "
    "hash). The denominator is a sum of dyadic rationals spanning "
    "2^6..2^-43 = 50 mantissa bits, so every partial sum is exactly "
    "representable and the float SUM is order-insensitive by "
    "construction. Emits the exact distinct count and relative error "
    "alongside — the sketch-vs-truth audit in one row. Scale: the "
    "register table is a 64-row agg of a map-side-combinable MAX — "
    "the whole sketch is mergeable across any partitioning, which is "
    "the point of HLL; the DISTINCT pre-collapse bounds the hash "
    "work at one row per key.",
)
def q_sketch_hll_manual(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    h = orders.select("o_custkey").distinct().select(
        F.conv(
            F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 12),
            16,
            10,
        )
        .cast("bigint")
        .alias("v")
    )
    pay = F.col("v") % _HLL_PAY
    rho = F.when(pay == 0, F.lit(43)).otherwise(
        F.lit(43) - F.length(F.bin(pay))
    )
    reg = h.groupBy(
        F.floor(F.col("v") / _HLL_PAY).alias("bucket")
    ).agg(F.max(rho).alias("m_b"))
    s = reg.agg(
        (
            F.sum(F.pow(F.lit(2.0), -F.col("m_b")))
            + (F.lit(_HLL_M) - F.count(F.lit(1)))
        ).alias("denom"),
        (F.lit(_HLL_M) - F.count(F.lit(1))).alias("v_zero"),
    )
    raw = F.lit(_HLL_ALPHA) * _HLL_M * _HLL_M / F.col("denom")
    e = F.when(
        (raw <= 2.5 * _HLL_M) & (F.col("v_zero") > 0),
        F.lit(_HLL_M) * F.log(F.lit(float(_HLL_M)) / F.col("v_zero")),
    ).otherwise(raw)
    exact = orders.agg(
        F.countDistinct("o_custkey").cast("bigint").alias("exact_distinct")
    )
    return (
        s.crossJoin(exact)
        .select(
            F.lit(_HLL_M).cast("bigint").alias("m"),
            F.col("v_zero").cast("bigint").alias("v_zero"),
            F.round(e, 4).alias("hll_estimate"),
            "exact_distinct",
            F.round(
                (e - F.col("exact_distinct")) / F.col("exact_distinct"), 4
            ).alias("rel_err"),
        )
    )


# ---------------------------------------------------------------------------
# Wave 115 (r5): sketch family III — AMS F2, theta a-not-b, histogram
# quantiles.
# ---------------------------------------------------------------------------

_AMS_ROWS = 9  # odd => integer-exact median of the row estimates


@register(
    "q_sketch_ams_f2",
    oracle=f"""
        WITH counts AS (
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY user_id
        ),
        rows_ AS (SELECT unnest(range({_AMS_ROWS})) AS i),
        signed AS (
            SELECT r.i,
                   SUM(CASE WHEN substr(md5(CAST(r.i AS VARCHAR) || ':'
                                        || CAST(k.user_id AS VARCHAR)),
                                 1, 1) < '8'
                            THEN k.c ELSE -k.c END) AS z
            FROM counts k CROSS JOIN rows_ r
            GROUP BY r.i
        ),
        ests AS (SELECT i, z * z AS est FROM signed),
        med AS (
            SELECT est AS f2_est FROM (
                SELECT est, row_number() OVER (ORDER BY est, i) AS rn
                FROM ests
            ) WHERE rn = {(_AMS_ROWS + 1) // 2}
        )
        SELECT CAST((SELECT SUM(c * c) FROM counts) AS BIGINT)
                   AS f2_exact,
               CAST(f2_est AS BIGINT) AS f2_est,
               ROUND((f2_est - (SELECT SUM(c * c) FROM counts))
                     / CAST((SELECT SUM(c * c) FROM counts) AS DOUBLE),
                     4) AS rel_err
        FROM med
    """,
    section="SK8",
    doc=f"AMS (Alon-Matias-Szegedy) second-moment sketch, "
    f"{_AMS_ROWS} sign rows: each row folds the frequency vector "
    "through a +/-1 hash (md5 first hex digit < '8') and squares the "
    "signed sum; the median row is the F2 estimate. Every row "
    "estimate is an exact integer (signed sums of exact counts), the "
    "median of an odd row count is order-statistic exact, and the "
    "hash is engine-identical — so this classically-randomized "
    "sketch carries a full exact oracle (the SK4 KMV trick applied "
    "to moment estimation). F2 = self-join size = the quantity that "
    "decides whether a key set is safely joinable or needs skew "
    "handling at 100 TB. Scale: per-row state is ONE signed sum "
    "(9 longs total); the only shuffle is the user-grain count; the "
    "9-row cross join multiplies partials, not raw events.",
)
def q_sketch_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    rows = spark.range(_AMS_ROWS).select(F.col("id").alias("i"))
    sign_src = F.substring(
        F.md5(
            F.concat(
                F.col("i").cast("string"),
                F.lit(":"),
                F.col("user_id").cast("string"),
            )
        ),
        1,
        1,
    )
    signed = (
        counts.crossJoin(F.broadcast(rows))
        .groupBy("i")
        .agg(
            F.sum(
                F.when(sign_src < "8", F.col("c")).otherwise(-F.col("c"))
            ).alias("z")
        )
    )
    ests = signed.select("i", (F.col("z") * F.col("z")).alias("est"))
    med = (
        ests.withColumn(
            "rn", F.row_number().over(Window.orderBy("est", "i"))
        )
        .where(F.col("rn") == (_AMS_ROWS + 1) // 2)
        .select(F.col("est").alias("f2_est"))
    )
    exact = counts.agg(
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("f2_exact")
    )
    return (
        med.crossJoin(F.broadcast(exact))
        .select(
            "f2_exact",
            F.col("f2_est").cast("bigint").alias("f2_est"),
            F.round(
                (F.col("f2_est") - F.col("f2_exact"))
                / F.col("f2_exact").cast("double"),
                4,
            ).alias("rel_err"),
        )
    )


_THETA_K = 64
_H48_MAX = 281474976710656.0  # 2^48

_THETA_H_SPARK = (
    "CAST(CONV(substr(md5(CAST(event_id AS STRING)), 1, 12), 16, 10) "
    "AS BIGINT)"
)
_THETA_H_DUCK = (
    "CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 12)) "
    "AS BIGINT)"
)


@register(
    "q_sketch_theta_diff",
    oracle=f"""
        WITH a AS (
            SELECT DISTINCT event_id, {_THETA_H_DUCK} AS h
            FROM events WHERE event_type = 'click'
        ),
        b AS (
            SELECT DISTINCT event_id, {_THETA_H_DUCK} AS h
            FROM events WHERE value < 100
        ),
        ta AS (
            SELECT h AS theta FROM (
                SELECT h, row_number() OVER (ORDER BY h) AS rn FROM a
            ) WHERE rn = {_THETA_K}
        ),
        tb AS (
            SELECT h AS theta FROM (
                SELECT h, row_number() OVER (ORDER BY h) AS rn FROM b
            ) WHERE rn = {_THETA_K}
        ),
        theta AS (
            SELECT LEAST((SELECT theta FROM ta),
                         (SELECT theta FROM tb)) AS t
        ),
        retained AS (
            SELECT a.event_id FROM a, theta
            WHERE a.h < theta.t
              AND a.event_id NOT IN (SELECT event_id FROM b)
        )
        SELECT CAST((SELECT COUNT(*) FROM retained) AS BIGINT)
                   AS retained_cnt,
               ROUND((SELECT COUNT(*) FROM retained)
                     * {_H48_MAX} / (SELECT t FROM theta), 4)
                   AS est_diff,
               CAST((SELECT COUNT(*) FROM (
                       SELECT event_id FROM a
                       EXCEPT
                       SELECT event_id FROM b)) AS BIGINT)
                   AS exact_diff
        FROM (SELECT 1)
    """,
    section="SK9",
    doc=f"Theta-sketch A-NOT-B (k={_THETA_K}) over two event-id sets "
    "(A = click events, B = low-value events): each side keeps its k "
    "smallest 48-bit hashes, theta = min of the two k-th order "
    "statistics, and |A \\ B| is estimated from A's sub-theta hashes "
    "that miss B, scaled by 2^48/theta — the set-ALGEBRA sketch "
    "(Apache DataSketches' workhorse) that KMV/HLL union (SK3/SK4) "
    "can't express, because difference and intersection need the "
    "retained-hash SAMPLE, not just the estimate. Deterministic "
    "hash + order statistics => full exact oracle, with the exact "
    "EXCEPT count carried as the accuracy reference. Scale: "
    "per-side state is k hashes; the NOT-IN probe is a broadcast "
    "anti-join of <= k rows against B's distinct keys; nothing "
    "beyond the two DISTINCTs shuffles.",
)
def q_sketch_theta_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    a = (
        ev.where(F.col("event_type") == "click")
        .select("event_id", F.expr(_THETA_H_SPARK).alias("h"))
        .distinct()
    )
    b = (
        ev.where(F.col("value") < 100)
        .select("event_id", F.expr(_THETA_H_SPARK).alias("h"))
        .distinct()
    )

    def kth(df):
        return (
            df.withColumn(
                "rn", F.row_number().over(Window.orderBy("h"))
            )
            .where(F.col("rn") == _THETA_K)
            .select(F.col("h").alias("theta"))
        )

    theta = (
        kth(a)
        .crossJoin(kth(b).withColumnRenamed("theta", "theta_b"))
        .select(F.least("theta", "theta_b").alias("t"))
    )
    retained = (
        a.crossJoin(F.broadcast(theta))
        .where(F.col("h") < F.col("t"))
        .join(b.select("event_id"), "event_id", "left_anti")
    )
    stats = retained.agg(
        F.count(F.lit(1)).cast("bigint").alias("retained_cnt")
    )
    exact = (
        a.select("event_id")
        .exceptAll(b.select("event_id"))
        .distinct()
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_diff"))
    )
    return (
        stats.crossJoin(F.broadcast(theta))
        .crossJoin(F.broadcast(exact))
        .select(
            "retained_cnt",
            F.round(
                F.col("retained_cnt") * F.lit(_H48_MAX) / F.col("t"), 4
            ).alias("est_diff"),
            "exact_diff",
        )
    )


_HQ_BINS = 32
_HQ_PS = ("0.5", "0.9", "0.99")


@register(
    "q_sketch_histogram_quantile",
    oracle=f"""
        WITH stats AS (
            SELECT MIN(value) AS mn, MAX(value) AS mx,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events
        ),
        binned AS (
            SELECT LEAST(CAST(FLOOR((e.value - s.mn)
                                    / ((s.mx - s.mn) / {_HQ_BINS}))
                              AS INTEGER), {_HQ_BINS - 1}) AS b,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events e, stats s
            GROUP BY 1
        ),
        cum AS (
            SELECT b, c,
                   SUM(c) OVER (ORDER BY b) AS cum_c
            FROM binned
        ),
        ps (p) AS (VALUES {", ".join(f"({p})" for p in _HQ_PS)}),
        hit AS (
            SELECT ps.p, MIN(cum.b) AS hit_b
            FROM ps JOIN cum
              ON cum.cum_c >= ps.p * (SELECT n FROM stats)
            GROUP BY ps.p
        )
        SELECT CAST(hit.p AS DOUBLE) AS p,
               ROUND(s.mn + ((s.mx - s.mn) / {_HQ_BINS})
                     * (hit.b + (hit.p * s.n - COALESCE(prev.cum_c, 0))
                        / hit.c), 4) AS est_q
        FROM (
            SELECT h.p, h.hit_b AS b, c.c, c.cum_c
            FROM hit h JOIN cum c ON c.b = h.hit_b
        ) hit
        LEFT JOIN cum prev ON prev.b = (
            SELECT MAX(b) FROM cum WHERE b < hit.b
        )
        CROSS JOIN stats s
    """,
    section="SK10",
    doc=f"Equal-width histogram quantile sketch ({_HQ_BINS} bins): "
    "p50/p90/p99 estimated by linear interpolation inside the first "
    "bin whose cumulative count crosses p*n — the fixed-memory "
    "quantile summary (the idea under t-digest/KLL, with "
    "deterministic bin boundaries instead of randomized centroids, "
    "which is what makes a full exact oracle possible where A20's "
    "approx_percentile is rows-only). All bin counts are exact "
    "BIGINT; min/max/interpolation are identical IEEE doubles on "
    "both engines, ROUND(...,4)-pinned. Scale: state is "
    f"{_HQ_BINS} longs after one map-combinable groupBy; min/max "
    "broadcast as 1-row scalars; mergeable across shards by adding "
    "bin vectors (same property t-digest is used for).",
)
def q_sketch_histogram_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    stats = ev.agg(
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    width = (F.col("mx") - F.col("mn")) / _HQ_BINS
    binned = (
        ev.crossJoin(F.broadcast(stats))
        .groupBy(
            F.least(
                F.floor((F.col("value") - F.col("mn")) / width).cast(
                    "int"
                ),
                F.lit(_HQ_BINS - 1),
            ).alias("b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    cum = binned.withColumn(
        "cum_c",
        F.sum("c").over(
            Window.orderBy("b").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )
    ps = spark.createDataFrame(
        [(float(p),) for p in _HQ_PS], "p double"
    )
    hit = (
        ps.crossJoin(F.broadcast(stats.select("n")))
        .join(
            cum,
            F.col("cum_c") >= F.col("p") * F.col("n"),
        )
        .groupBy("p", "n")
        .agg(F.min("b").alias("b"))
    )
    prev = cum.select(
        F.col("b").alias("pb"), F.col("cum_c").alias("prev_cum")
    )
    w_prev = (
        cum.select("b")
        .crossJoin(prev)
        .where(F.col("pb") < F.col("b"))
        .groupBy("b")
        .agg(F.max("pb").alias("prev_b"))
        .join(prev, F.col("prev_b") == F.col("pb"))
        .select("b", "prev_cum")
    )
    return (
        hit.join(cum.select("b", "c"), "b")
        .join(w_prev, "b", "left")
        .crossJoin(F.broadcast(stats.select("mn", "mx")))
        .select(
            "p",
            F.round(
                F.col("mn")
                + ((F.col("mx") - F.col("mn")) / _HQ_BINS)
                * (
                    F.col("b")
                    + (
                        F.col("p") * F.col("n")
                        - F.coalesce(F.col("prev_cum"), F.lit(0))
                    )
                    / F.col("c")
                ),
                4,
            ).alias("est_q"),
        )
    )


# ==== wave 166b: Chebyshev tail bound vs actual exceedance ==========


@register(
    "q_sketch_chebyshev_tail",
    oracle="""
        WITH c AS (
            SELECT p.p_brand AS brand,
                   CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                       AS cents
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        ),
        mom AS (
            SELECT brand,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(cents) AS BIGINT) AS sx,
                   CAST(CAST(SUM(CAST(cents AS DECIMAL(38,0))
                                 * CAST(cents AS DECIMAL(38,0))) AS HUGEINT)
                        // 4294967296 AS DOUBLE) * 4294967296.0
                   + CAST(CAST(SUM(CAST(cents AS DECIMAL(38,0))
                                   * CAST(cents AS DECIMAL(38,0))) AS HUGEINT)
                          % 4294967296 AS DOUBLE) AS sxx
            FROM c GROUP BY brand
        ),
        stats AS (
            SELECT brand, n,
                   CAST(sx AS DOUBLE) / n AS mu,
                   sqrt((CAST(n AS DOUBLE) * sxx
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
                       AS s
            FROM mom
        ),
        tails AS (
            SELECT c.brand, st.n, st.mu, st.s,
                   CAST(SUM(CASE WHEN abs(CAST(c.cents AS DOUBLE) - st.mu)
                                      >= 2.0 * st.s
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_ge_2sd,
                   CAST(SUM(CASE WHEN abs(CAST(c.cents AS DOUBLE) - st.mu)
                                      >= 3.0 * st.s
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_ge_3sd
            FROM c JOIN stats st ON c.brand = st.brand
            GROUP BY c.brand, st.n, st.mu, st.s
        )
        SELECT brand, n, n_ge_2sd, n_ge_3sd,
               ROUND(mu, 4) AS mean_cents,
               ROUND(s, 4) AS sd_cents,
               ROUND(CAST(n_ge_2sd AS DOUBLE) / n, 6) AS actual_k2,
               ROUND(CAST(n_ge_3sd AS DOUBLE) / n, 6) AS actual_k3,
               CAST(0.25 AS DOUBLE) AS cheb_bound_k2,
               ROUND(1.0 / 9.0, 6) AS cheb_bound_k3
        FROM tails
    """,
    section="SK8",
    doc="Chebyshev tail-bound audit per brand: the distribution-free "
    "guarantee P(|X-mu| >= k*sigma) <= 1/k^2 checked against the "
    "ACTUAL exceedance fraction of line-item prices — the "
    "moments-sketch idea in audit form: two exact moments (n, sum, "
    "sum-of-squares) bound any tail without storing the "
    "distribution, and the gap between bound and actual measures "
    "how much the sketch over-guarantees on real data. Price "
    "squares overflow 2^53 so the A26 hi/lo device rebuilds sxx; "
    "the per-row exceedance compare uses the identical pinned "
    "mu/s doubles on both engines. Scale: one moment agg to 25 "
    "rows, the 25-row stats broadcast back for the tail count — "
    "two map-side-combinable passes, no sort anywhere.",
)
def q_sketch_chebyshev_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    c = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        F.col("p_brand").alias("brand"),
        F.floor(F.col("l_extendedprice") * 100 + 0.5)
        .cast("bigint")
        .alias("cents"),
    ).localCheckpoint(eager=False)
    mom = c.groupBy("brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("sx"),
        F.sum(
            F.col("cents").cast(DecimalType(38, 0))
            * F.col("cents").cast(DecimalType(38, 0))
        ).alias("sxxd"),
    )
    stats = mom.select(
        "brand",
        "n",
        (F.col("sx").cast("double") / F.col("n")).alias("mu"),
        F.sqrt(
            (
                F.col("n").cast("double")
                * F.expr(
                    "cast(sxxd div 4294967296 as double) * 4294967296.0d"
                    " + cast(sxxd % 4294967296 as double)"
                )
                - F.col("sx").cast("double") * F.col("sx").cast("double")
            )
            / (
                F.col("n").cast("double")
                * (F.col("n").cast("double") - F.lit(1.0))
            )
        ).alias("s"),
    )
    tails = (
        c.join(F.broadcast(stats), "brand")
        .groupBy("brand", "n", "mu", "s")
        .agg(
            F.sum(
                F.when(
                    F.abs(F.col("cents").cast("double") - F.col("mu"))
                    >= F.lit(2.0) * F.col("s"),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_ge_2sd"),
            F.sum(
                F.when(
                    F.abs(F.col("cents").cast("double") - F.col("mu"))
                    >= F.lit(3.0) * F.col("s"),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_ge_3sd"),
        )
    )
    return tails.select(
        "brand",
        "n",
        "n_ge_2sd",
        "n_ge_3sd",
        F.round("mu", 4).alias("mean_cents"),
        F.round("s", 4).alias("sd_cents"),
        F.round(F.col("n_ge_2sd").cast("double") / F.col("n"), 6).alias(
            "actual_k2"
        ),
        F.round(F.col("n_ge_3sd").cast("double") / F.col("n"), 6).alias(
            "actual_k3"
        ),
        F.lit(0.25).alias("cheb_bound_k2"),
        F.round(F.lit(1.0) / F.lit(9.0), 6).alias("cheb_bound_k3"),
    )


# ==== wave 169b: AQP hash-sample estimate vs truth ==================


@register(
    "q_sketch_aqp_error",
    oracle="""
        WITH base AS (
            SELECT n.n_name AS nation,
                   CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)
                       AS cents,
                   CAST(('0x' || substr(md5(CAST(o.o_orderkey AS VARCHAR)),
                                        1, 12)) AS BIGINT) % 50 = 0
                       AS in_sample
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
        ),
        agg AS (
            SELECT nation,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(cents) AS BIGINT) AS exact_cents,
                   CAST(SUM(CASE WHEN in_sample THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_sampled,
                   CAST(50 * SUM(CASE WHEN in_sample THEN cents ELSE 0 END)
                        AS BIGINT) AS est_cents
            FROM base GROUP BY nation
        )
        SELECT nation, n_rows, n_sampled, exact_cents, est_cents,
               CAST(est_cents - exact_cents AS BIGINT) AS err_cents,
               ROUND(abs(CAST(est_cents AS DOUBLE)
                         - CAST(exact_cents AS DOUBLE))
                     * 10000.0 / CAST(exact_cents AS DOUBLE), 2)
                   AS rel_err_bp
        FROM agg
    """,
    section="SK9",
    doc="Approximate-query-processing error audit: a deterministic "
    "2% hash sample (48-bit md5 prefix of the order key, mod 50 — "
    "the E9/E4 retry-stable sampling device, so the SAME rows sample "
    "on both engines and on every run) scaled up Horvitz-Thompson "
    "style (x50) against the exact per-nation revenue, reporting the "
    "signed error and relative error in basis points — the audit "
    "loop every AQP deployment needs before trusting sampled "
    "dashboards, and all integer until the final display ratio. "
    "Scale: sampling is a row-local predicate (no shuffle to "
    "sample); exact and estimate come from ONE shared keyed agg "
    "pass, not two scans.",
)
def q_sketch_aqp_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    base = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.floor(F.col("o_totalprice") * 100 + 0.5)
            .cast("bigint")
            .alias("cents"),
            (
                F.expr(
                    "cast(conv(substr(md5(cast(o_orderkey as string)), "
                    "1, 12), 16, 10) as bigint)"
                )
                % 50
                == 0
            ).alias("in_sample"),
        )
    )
    agg = base.groupBy("nation").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("cents").cast("bigint").alias("exact_cents"),
        F.sum(F.when(F.col("in_sample"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_sampled"),
        (
            F.lit(50)
            * F.sum(F.when(F.col("in_sample"), F.col("cents")).otherwise(0))
        )
        .cast("bigint")
        .alias("est_cents"),
    )
    return agg.select(
        "nation",
        "n_rows",
        "n_sampled",
        "exact_cents",
        "est_cents",
        (F.col("est_cents") - F.col("exact_cents"))
        .cast("bigint")
        .alias("err_cents"),
        F.round(
            F.abs(
                F.col("est_cents").cast("double")
                - F.col("exact_cents").cast("double")
            )
            * F.lit(10000.0)
            / F.col("exact_cents").cast("double"),
            2,
        ).alias("rel_err_bp"),
    )
