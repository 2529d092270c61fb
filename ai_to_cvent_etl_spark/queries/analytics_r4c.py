"""Thirty-first-wave operators (r3 continuation): cross-corpus dedup,
ratio-metric confidence interval, Mann-Kendall trend test.

  D15 q_dedup_cross_corpus — train-vs-eval DECONTAMINATION at pair
                             level: bipartite MinHash-LSH between two
                             corpora (even/odd doc split), exact-
                             Jaccard verify — D1's machinery without
                             the self-join (candidates only ACROSS
                             corpora).
  A44 q_agg_ratio_ci       — delta-method 95% CI for a RATIO metric
                             (revenue per order, by segment): the
                             experiment-analysis primitive naive
                             per-row averaging gets wrong (ratio
                             variance needs the covariance term).
  TS17 q_ts_mann_kendall   — Mann-Kendall nonparametric trend test on
                             monthly revenue: the S statistic over all
                             month pairs, tie-corrected variance,
                             z score — trend significance with no
                             linearity assumption (A31's OLS slope
                             assumes one).

Determinism notes (SURVEY §5.3):
  * D15 is D1's md5-string machinery (exact) with an across-corpora
    join predicate; the Jaccard verify is an integer ratio rounded 4dp.
  * A44: all five moments per segment are exact (counts, DECIMAL sums,
    width-19 squares and cross products); the ratio, its delta-method
    variance, and the CI are single IEEE formulas rounded 6dp.
  * TS17: the pairwise sign sum is exact integer arithmetic on
    BIGINT-cent monthly sums; tie groups are exact counts; z is one
    IEEE formula rounded 4dp (the ±1 continuity correction included).

Scale notes:
  * D15 keeps D1's full shape — band keys shuffle, candidates emit
    within band buckets, and the FIRST-COLLIDING-BAND filter is
    row-local (no pair-distinct shuffle; the groupBy formulation
    OOM'd at sf0.1) — while the bipartite predicate halves the pair
    space and composes with incremental ingest: band-key tables for
    the frozen eval set persist, and each new training shard joins
    against them (never re-hashing the eval side).
  * A44 is one keyed reduction carrying six moments map-side.
  * TS17's pair join is |months|² — bounded by the spine (TS7's
    rule); at long horizons the O(n log n) inversion-count form
    replaces the pair join, same S.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register

# --- D15: bipartite cross-corpus dedup ---------------------------------------

_N_PERM = 8
_N_BANDS = 4
_D15_T = 0.8


def _mh_spark(i: int) -> str:
    return (
        f"array_min(transform(ts, t -> substr(md5(concat('{i}:', t)), 1, 16)))"
    )


def _mh_duck(i: int) -> str:
    return f"list_min(list_transform(ts, t -> substr(md5('{i}:' || t), 1, 16)))"


@register(
    "q_dedup_cross_corpus",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, doc_id % 2 = 0 AS is_train,
                   list_distinct(string_split(text, ' ')) AS ts
            FROM documents
        ),
        sig AS (
            SELECT doc_id, is_train,
                   {', '.join(f'{_mh_duck(i)} AS mh{i}' for i in range(_N_PERM))}
            FROM toks
        ),
        bands AS (
            {' UNION ALL '.join(
                f"SELECT doc_id, is_train, {b} AS band, "
                f"md5(mh{2 * b} || mh{2 * b + 1}) AS bkey FROM sig"
                for b in range(_N_BANDS))}
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS train_doc, b.doc_id AS eval_doc
            FROM bands a
            JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
                        AND a.is_train AND NOT b.is_train
        )
        SELECT train_doc, eval_doc,
               ROUND(CAST(len(list_filter(ta.ts,
                              x -> list_contains(tb.ts, x))) AS DOUBLE)
                     / (len(ta.ts) + len(tb.ts)
                        - len(list_filter(ta.ts,
                              x -> list_contains(tb.ts, x)))), 4) AS jaccard
        FROM cand
        JOIN toks ta ON ta.doc_id = cand.train_doc
        JOIN toks tb ON tb.doc_id = cand.eval_doc
        WHERE CAST(len(list_filter(ta.ts, x -> list_contains(tb.ts, x)))
                   AS DOUBLE)
              / (len(ta.ts) + len(tb.ts)
                 - len(list_filter(ta.ts, x -> list_contains(tb.ts, x))))
              >= {_D15_T}
    """,
    section="D15",
    doc="Train-vs-eval decontamination at PAIR level: the corpus splits "
    "into train (even doc_id) and eval (odd), MinHash-LSH candidates "
    "form only ACROSS the two sides (bipartite band join — no "
    "self-pairs, half the pair space of D1), and candidates verify "
    "with exact Jaccard ≥ 0.8. The leakage report L8's containment "
    "check summarizes; this emits the actual contaminated pairs for "
    "removal. Incremental shape at scale: the frozen eval side's band "
    "keys persist, and each new training shard joins against them "
    "without re-hashing eval — decontamination becomes a per-shard "
    "lookup, not a corpus-wide rescan.",
)
def q_dedup_cross_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import fan_out

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        (F.col("doc_id") % 2 == 0).alias("is_train"),
        F.array_distinct(F.split("text", " ")).alias("ts"),
    )
    sig = fan_out(
        toks.select(
            "doc_id",
            "is_train",
            "ts",
            F.array(
                *[
                    F.md5(
                        F.concat(
                            F.expr(_mh_spark(2 * b)),
                            F.expr(_mh_spark(2 * b + 1)),
                        )
                    )
                    for b in range(_N_BANDS)
                ]
            ).alias("bks"),
        )
    )
    bands = sig.select(
        "doc_id",
        "is_train",
        "ts",
        "bks",
        F.posexplode("bks").alias("band", "bkey"),
    )
    a = bands.where("is_train").select(
        F.col("doc_id").alias("train_doc"),
        F.col("ts").alias("ts_a"),
        F.col("bks").alias("bks_a"),
        "band",
        "bkey",
    )
    b = bands.where(~F.col("is_train")).select(
        F.col("doc_id").alias("eval_doc"),
        F.col("ts").alias("ts_b"),
        F.col("bks").alias("bks_b"),
        "band",
        "bkey",
    )
    # D1's first-colliding-band device, bipartite: both sides carry ALL
    # their band keys, and a pair colliding in several bands is emitted
    # ONLY from its lowest matching band — a ROW-LOCAL filter, so no
    # pair-distinct shuffle ever materializes the candidate multiset
    # (the groupBy formulation carried token arrays through a pair-keyed
    # exchange and OOM'd the sf0.1 selfcheck session).
    first_band = F.expr(
        "size(filter(zip_with(slice(bks_a, 1, band), slice(bks_b, 1, band), "
        "(x, y) -> x = y), m -> m)) = 0"
    )
    cand = a.join(b, ["band", "bkey"]).where(first_band)
    inter = F.size(F.array_intersect(F.col("ts_a"), F.col("ts_b")))
    jac = inter.cast("double") / (
        F.size("ts_a") + F.size("ts_b") - inter
    )
    return cand.where(jac >= _D15_T).select(
        "train_doc", "eval_doc", F.round(jac, 4).alias("jaccard")
    )


# --- A44: delta-method CI for a ratio metric ---------------------------------

_Z95 = 1.96


@register(
    "q_agg_ratio_ci",
    oracle=f"""
        WITH j AS (
            SELECT c.c_mktsegment AS segment, o.o_custkey AS ck,
                   CAST(COUNT(*) AS BIGINT) AS x,
                   SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS y
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
            GROUP BY c.c_mktsegment, o.o_custkey
        ),
        m AS (
            SELECT segment,
                   CAST(COUNT(*) AS DOUBLE) AS n,
                   CAST(SUM(x) AS DOUBLE) AS sx,
                   CAST(SUM(x * x) AS DOUBLE) AS sxx,
                   CAST(SUM(y) AS DOUBLE) AS sy,
                   CAST(SUM(CAST(y AS DECIMAL(19,2))
                            * CAST(y AS DECIMAL(19,2))) AS DOUBLE) AS syy,
                   CAST(SUM(CAST(x AS DECIMAL(10,0))
                            * CAST(y AS DECIMAL(19,2))) AS DOUBLE) AS sxy
            FROM j GROUP BY segment
        )
        SELECT segment,
               CAST(n AS BIGINT) AS n_customers,
               ROUND(sy / sx, 4) AS revenue_per_order,
               ROUND(sqrt(greatest(0.0,
                   (syy / n - (sy / n) * (sy / n))
                   - 2.0 * (sy / sx) * (sxy / n - (sx / n) * (sy / n))
                   + (sy / sx) * (sy / sx)
                     * (sxx / n - (sx / n) * (sx / n)))
                   / n) / (sx / n), 6) AS se,
               ROUND(sy / sx - {_Z95} * sqrt(greatest(0.0,
                   (syy / n - (sy / n) * (sy / n))
                   - 2.0 * (sy / sx) * (sxy / n - (sx / n) * (sy / n))
                   + (sy / sx) * (sy / sx)
                     * (sxx / n - (sx / n) * (sx / n)))
                   / n) / (sx / n), 4) AS ci_lo,
               ROUND(sy / sx + {_Z95} * sqrt(greatest(0.0,
                   (syy / n - (sy / n) * (sy / n))
                   - 2.0 * (sy / sx) * (sxy / n - (sx / n) * (sy / n))
                   + (sy / sx) * (sy / sx)
                     * (sxx / n - (sx / n) * (sx / n)))
                   / n) / (sx / n), 4) AS ci_hi
        FROM m
    """,
    section="A44",
    doc="Delta-method 95% CI for a RATIO metric — revenue per order by "
    "segment, with the CUSTOMER as the randomization unit: per-"
    "customer (orders x, revenue y) pairs, then Var(ȳ/x̄) ≈ (Var y − "
    "2R·Cov(x,y) + R²·Var x)/(n·x̄²) — the covariance term naive "
    "per-row averaging drops, which is the classic A/B ratio-metric "
    "mistake. All moments exact (integer x, DECIMAL y, width-19 "
    "squares/cross-products per the §2.28 rule); ratio/SE/CI are "
    "single IEEE formulas. Two keyed reductions; moments ride "
    "map-side partials.",
)
def q_agg_ratio_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    j = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"), "o_custkey")
        .agg(
            F.count("*").alias("x"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("y"),
        )
    )
    m = j.groupBy("segment").agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(
            F.col("y").cast("decimal(19,2)") * F.col("y").cast("decimal(19,2)")
        )
        .cast("double")
        .alias("syy"),
        F.sum(
            F.col("x").cast("decimal(10,0)") * F.col("y").cast("decimal(19,2)")
        )
        .cast("double")
        .alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    r = sy / sx
    var = (
        (F.col("syy") / n - (sy / n) * (sy / n))
        - 2.0 * r * (F.col("sxy") / n - (sx / n) * (sy / n))
        + r * r * (F.col("sxx") / n - (sx / n) * (sx / n))
    )
    se = F.sqrt(F.greatest(F.lit(0.0), var) / n) / (sx / n)
    return m.select(
        "segment",
        n.cast("long").alias("n_customers"),
        F.round(r, 4).alias("revenue_per_order"),
        F.round(se, 6).alias("se"),
        F.round(r - _Z95 * se, 4).alias("ci_lo"),
        F.round(r + _Z95 * se, 4).alias("ci_hi"),
    )


# --- TS17: Mann-Kendall trend test -------------------------------------------


@register(
    "q_ts_mann_kendall",
    oracle="""
        WITH monthly AS (
            SELECT (date_part('year', o_orderdate) - 1995) * 12
                   + date_part('month', o_orderdate) - 1 AS m,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) AS cents
            FROM orders GROUP BY 1
        ),
        s AS (
            SELECT CAST(SUM(CASE WHEN b.cents > a.cents THEN 1
                                 WHEN b.cents < a.cents THEN -1
                                 ELSE 0 END) AS BIGINT) AS s_stat
            FROM monthly a JOIN monthly b ON b.m > a.m
        ),
        t AS (
            SELECT CAST(SUM(c * (c - 1) * (2 * c + 5)) AS BIGINT) AS tie_term
            FROM (SELECT CAST(COUNT(*) AS BIGINT) AS c
                  FROM monthly GROUP BY cents)
        ),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM monthly)
        SELECT nn.n, s.s_stat,
               ROUND((CAST(s.s_stat AS DOUBLE)
                      - CAST(sign(s.s_stat) AS DOUBLE))
                     / sqrt((CAST(nn.n AS DOUBLE) * (nn.n - 1)
                             * (2 * nn.n + 5)
                             - CAST(t.tie_term AS DOUBLE)) / 18.0), 4) AS z
        FROM s CROSS JOIN t CROSS JOIN nn
    """,
    section="TS17",
    doc="Mann-Kendall nonparametric trend test on monthly revenue: "
    "S = Σ sign(x_j − x_i) over all month pairs (j > i), tie-corrected "
    "variance n(n−1)(2n+5)/18 − Σ t(t−1)(2t+5)/18, and the continuity-"
    "corrected z — monotone-trend significance with NO linearity "
    "assumption (A31's OLS slope assumes one; Mann-Kendall survives "
    "level shifts and outliers). All-integer S on exact BIGINT-cent "
    "monthly sums; z is one IEEE formula. The pair join is |months|² "
    "— spine-bounded; at long horizons the O(n log n) inversion-count "
    "form computes the same S.",
)
def q_ts_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    mo = (F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate") - 1
    monthly = orders.groupBy(mo.alias("m")).agg(
        F.expr(
            "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)"
        ).alias("cents")
    )
    a = monthly.alias("a")
    b = monthly.alias("b")
    s = (
        a.join(b, F.col("b.m") > F.col("a.m"))
        .agg(
            F.sum(
                F.when(F.col("b.cents") > F.col("a.cents"), 1)
                .when(F.col("b.cents") < F.col("a.cents"), -1)
                .otherwise(0)
            ).alias("s_stat")
        )
    )
    t = (
        monthly.groupBy("cents")
        .agg(F.count("*").alias("c"))
        .agg(
            F.sum(
                F.col("c") * (F.col("c") - 1) * (2 * F.col("c") + 5)
            ).alias("tie_term")
        )
    )
    nn = monthly.agg(F.count("*").alias("n"))
    joined = s.crossJoin(F.broadcast(t)).crossJoin(F.broadcast(nn))
    nd = F.col("n").cast("double")
    var = (nd * (F.col("n") - 1) * (2 * F.col("n") + 5) - F.col(
        "tie_term"
    ).cast("double")) / 18.0
    z = (
        F.col("s_stat").cast("double")
        - F.signum(F.col("s_stat").cast("double"))
    ) / F.sqrt(var)
    return joined.select("n", "s_stat", F.round(z, 4).alias("z"))
