"""Twenty-seventh-wave operators (r3 continuation): Wilson interval,
waterfall join, consistent sampling, int8 scalar quantization.

  A40 q_agg_wilson_ci      — Wilson score confidence interval for the
                             per-event-type purchase-conversion
                             proportion — the A/B-testing interval that
                             behaves at small n and extreme p (unlike
                             the naive Wald interval).
  J22 q_join_waterfall     — hierarchical fallback matching: orders
                             match a rate table on (status, year),
                             falling back to the status-level default —
                             the MDM/pricing 'waterfall join'.
  SK7 q_sketch_consistent_sample — bottom-k-by-hash CONSISTENT sample
                             per language: the same keys are chosen in
                             any snapshot/replica, so samples of two
                             datasets are directly comparable — the
                             cross-snapshot QA sampling primitive.
  V19 q_vec_scalar_quantize — int8 scalar quantization of embeddings:
                             per-dimension min/max ranges, linear
                             quantize/dequantize, exact reconstruction
                             MSE — the standard 4× embedding
                             compression with a measured error budget.

Determinism notes (SURVEY §5.3):
  * A40: counts exact; the Wilson formula is one IEEE expression with
    literal z=1.96, rounded 6dp.
  * J22 is exact decimal/integer logic; the rate table is a literal.
  * SK7 is pure hash/rank logic (SK4's 48-bit md5 device).
  * V19: per-dim min/max of floats are exact comparisons; the quantize
    expression floor((x−min)/(max−min)·255) is IEEE-identical; squared
    errors are quantized floor(x·1e12) before the exact DECIMAL sum
    (errors ≤ range²/4·1e-4 — §5.3 rule 10 margin huge).

Scale notes:
  * A40 collapses to |event types| rows in one pass.
  * J22 is two broadcast joins against literal tables + a coalesce —
    the fallback hierarchy never rescans the fact side.
  * SK7's rank-k per group is the bottom-k window on the hash — at
    100 TB use a two-level bottom-k (per-partition heads, then global)
    exactly like SK4 merging; consistency is the point: hash order is
    partition- and snapshot-invariant.
  * V19: per-dim ranges are one posexplode reduction (64·n rows,
    partial min/max map-side); quantization is then map-only. At
    100 TB ranges come from a sample or a maintained stats table —
    the quantize map never changes shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register

# --- A40: Wilson score interval ----------------------------------------------

_Z = 1.96


@register(
    "q_agg_wilson_ci",
    oracle=f"""
        WITH c AS (
            SELECT user_id,
                   MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS converted
            FROM events GROUP BY user_id
        ),
        m AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(converted) AS BIGINT) AS k
            FROM c
        )
        SELECT n, k,
               ROUND(CAST(k AS DOUBLE) / n, 6) AS p_hat,
               ROUND((CAST(k AS DOUBLE) / n + {_Z} * {_Z} / (2.0 * n)
                      - {_Z} * sqrt((CAST(k AS DOUBLE) / n)
                                    * (1.0 - CAST(k AS DOUBLE) / n) / n
                                    + {_Z} * {_Z} / (4.0 * n * n)))
                     / (1.0 + {_Z} * {_Z} / n), 6) AS ci_lo,
               ROUND((CAST(k AS DOUBLE) / n + {_Z} * {_Z} / (2.0 * n)
                      + {_Z} * sqrt((CAST(k AS DOUBLE) / n)
                                    * (1.0 - CAST(k AS DOUBLE) / n) / n
                                    + {_Z} * {_Z} / (4.0 * n * n)))
                     / (1.0 + {_Z} * {_Z} / n), 6) AS ci_hi
        FROM m
    """,
    section="A40",
    doc="Wilson score 95% confidence interval for the user-level "
    "purchase-conversion proportion (a user converts if they have ≥1 "
    "purchase event): exact user/conversion counts, then the Wilson "
    "formula — the interval that stays inside [0,1] and behaves at "
    "small n and extreme p where the naive Wald interval fails, which "
    "is why it is the A/B-testing default. Two exact reductions "
    "(per-user flag, then totals); the interval is one IEEE formula "
    "with literal z, rounded 6dp.",
)
def q_agg_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    )
    m = c.agg(
        F.count("*").alias("n"), F.sum("converted").alias("k")
    )
    n = F.col("n").cast("double")
    p = F.col("k").cast("double") / n
    z2 = _Z * _Z
    rad = F.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n))
    den = 1.0 + z2 / n
    return m.select(
        "n",
        "k",
        F.round(p, 6).alias("p_hat"),
        F.round((p + z2 / (2.0 * n) - _Z * rad) / den, 6).alias("ci_lo"),
        F.round((p + z2 / (2.0 * n) + _Z * rad) / den, 6).alias("ci_hi"),
    )


# --- J22: waterfall (hierarchical fallback) join -----------------------------

_RATES = [
    # (status, year, fee_bps) — specific rules
    ("F", 1996, 25),
    ("F", 1997, 30),
    ("O", 1996, 40),
    ("P", 1995, 10),
]
_DEFAULTS = [("F", 20), ("O", 35), ("P", 15)]  # status-level fallback


@register(
    "q_join_waterfall",
    oracle=f"""
        WITH rates AS (
            SELECT * FROM (VALUES
                {', '.join(f"('{s}', {y}, {b})" for s, y, b in _RATES)}
            ) t(st, yr, fee_bps)
        ),
        defaults AS (
            SELECT * FROM (VALUES
                {', '.join(f"('{s}', {b})" for s, b in _DEFAULTS)}
            ) t(st, fee_bps)
        )
        , resolved AS (
            SELECT o.o_orderstatus,
                   CAST(date_part('year', o.o_orderdate) AS INT) AS yr,
                   CAST(o.o_totalprice AS DECIMAL(18,2)) AS price,
                   coalesce(r.fee_bps, d.fee_bps) AS fee
            FROM orders o
            LEFT JOIN rates r
                   ON r.st = o.o_orderstatus
                  AND r.yr = CAST(date_part('year', o.o_orderdate) AS INT)
            LEFT JOIN defaults d ON d.st = o.o_orderstatus
        )
        SELECT o_orderstatus, yr,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(MIN(fee) AS INT) AS fee_bps,
               CAST(SUM(price * fee) AS DOUBLE) / 10000.0 AS fee_total
        FROM resolved
        GROUP BY o_orderstatus, yr
    """,
    section="J22",
    doc="Waterfall (hierarchical fallback) join — the pricing/MDM match "
    "pattern: each order takes the most specific matching rate, "
    "(status, year) first, falling back to the status-level default "
    "via coalesce over two LEFT joins; per (status, year): order "
    "counts, the resolved rate, and the exact decimal fee total. Both "
    "rule tables are literals (broadcast by construction); the fact "
    "side is scanned ONCE and never rescanned per tier — the fallback "
    "hierarchy is joins + coalesce, not a UNION of filtered rescans. "
    "Rates are unique per key, so MIN() inside the group is exact "
    "passthrough.",
)
def q_join_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    rates = orders.sparkSession.createDataFrame(
        _RATES, "r_st string, r_yr int, r_fee int"
    )
    defaults = orders.sparkSession.createDataFrame(
        _DEFAULTS, "d_st string, d_fee int"
    )
    o = orders.withColumn("yr", F.year("o_orderdate").cast("int"))
    j = (
        o.join(
            F.broadcast(rates),
            (F.col("o_orderstatus") == F.col("r_st"))
            & (F.col("yr") == F.col("r_yr")),
            "left",
        )
        .join(
            F.broadcast(defaults),
            F.col("o_orderstatus") == F.col("d_st"),
            "left",
        )
    )
    fee = F.min(F.coalesce(F.col("r_fee"), F.col("d_fee")))
    return j.groupBy("o_orderstatus", "yr").agg(
        F.count("*").alias("n_orders"),
        fee.cast("int").alias("fee_bps"),
        (
            F.sum(
                F.col("o_totalprice").cast("decimal(18,2)")
                * F.coalesce(F.col("r_fee"), F.col("d_fee"))
            ).cast("double")
            / 10000.0
        ).alias("fee_total"),
    )


# --- SK7: consistent bottom-k-by-hash sample ---------------------------------

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


# --- V19: int8 scalar quantization -------------------------------------------


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
