"""Registered queries q_agg_price_elasticity..q_agg_weighted_kappa (chunk 3 of 4 split from aggregates.py — see aggregates_shared.py for shared helpers)."""

from __future__ import annotations
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType
from ai_to_cvent_etl_spark.io import load_table, table_path
from ai_to_cvent_etl_spark.registry import register
from pyspark.sql import DataFrame, SparkSession, Window
from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.queries._util import dec2
from ai_to_cvent_etl_spark.queries._util import ORACLE_MONEY_SUM
from ai_to_cvent_etl_spark.queries._util import ORACLE_DISC_PRICE, disc_price

from ai_to_cvent_etl_spark.queries.aggregates_shared import (  # noqa: F401
    _BOOT_B,
    _DID_CUT,
    _FLEISS_N,
    _GUM_C10,
    _GUM_C100,
    _GUM_GAMMA,
    _GUM_SQRT6_PI,
    _IDX_Y0,
    _IDX_Y1,
    _JT_GROUPS,
    _LN_HALF_Q12,
    _PCORR_COLS,
    _PINBALL_TAUS,
    _POIS1_P,
    _Q_SPARK,
    _RMST_TAU,
    _TRIM_FRAC_DEN,
    _TRIM_FRAC_NUM,
    _boot_w,
    _jt_oracle,
    _pcorr_oracle,
)

@register(
    "q_agg_price_elasticity",
    oracle="""
        WITH obs AS (
            SELECT ln(l_extendedprice / l_quantity) AS lp,
                   ln(l_quantity) AS lq
            FROM lineitem
            WHERE l_quantity > 0 AND l_extendedprice > 0
        ),
        folded AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(floor(lp * 1e12) AS DECIMAL(38,0)))
                        AS DOUBLE) / 1e12 AS sp,
                   CAST(SUM(CAST(floor(lq * 1e12) AS DECIMAL(38,0)))
                        AS DOUBLE) / 1e12 AS sq,
                   CAST(SUM(CAST(floor(lp * lp * 1e12)
                        AS DECIMAL(38,0))) AS DOUBLE) / 1e12 AS spp,
                   CAST(SUM(CAST(floor(lp * lq * 1e12)
                        AS DECIMAL(38,0))) AS DOUBLE) / 1e12 AS spq
            FROM obs
        )
        SELECT ROUND((n * spq - sp * sq) / (n * spp - sp * sp), 6)
                   AS elasticity,
               ROUND((sq - (n * spq - sp * sq) / (n * spp - sp * sp)
                           * sp) / n, 6) AS log_intercept,
               n AS n_obs
        FROM folded
    """,
    section="A111",
    doc="Own-price elasticity of demand: the slope of ln(quantity) on "
    "ln(unit price) — the log-log regression whose coefficient IS "
    "the elasticity (a 1% price change moves quantity by "
    "elasticity %), the pricing-analytics primitive behind every "
    "demand curve fit. Unlike A102's raw-moment OLS (where 2dp "
    "inputs make decimal sums exact), the log transform produces "
    "irrational terms — so every per-row ln product goes through "
    "the floor-1e12 DECIMAL fold (rule 10) before summation, "
    "making the four sufficient statistics order-free; the slope "
    "solve is float on four identical scalars, ROUND(6). Scale: "
    "one map-combinable scan, four quantized-decimal partials — "
    "the A102 shape with the fold bolted on where exactness runs "
    "out.",
)
def q_agg_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0)
    )
    lp = F.log(F.col("l_extendedprice") / F.col("l_quantity"))
    lq = F.log("l_quantity")

    def fold12(expr):
        return F.sum(F.floor(expr * 1e12).cast("decimal(38,0)")).cast(
            "double"
        ) / 1e12

    folded = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        fold12(lp).alias("sp"),
        fold12(lq).alias("sq"),
        fold12(lp * lp).alias("spp"),
        fold12(lp * lq).alias("spq"),
    )
    n, sp, sq = F.col("n"), F.col("sp"), F.col("sq")
    spp, spq = F.col("spp"), F.col("spq")
    slope = (n * spq - sp * sq) / (n * spp - sp * sp)
    return folded.select(
        F.round(slope, 6).alias("elasticity"),
        F.round((sq - slope * sp) / n, 6).alias("log_intercept"),
        F.col("n").alias("n_obs"),
    )

@register(
    "q_agg_crps_empirical",
    oracle="""
        WITH fx AS (
            SELECT CAST(value AS DECIMAL(18,2)) AS v
            FROM events WHERE event_type = 'view'
        ),
        obs AS (
            SELECT CAST(value AS DECIMAL(18,2)) AS y
            FROM events WHERE event_type = 'purchase'
        ),
        xg AS (
            SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM fx GROUP BY v
        ),
        xc AS (
            SELECT v, c,
                   SUM(c) OVER (ORDER BY v) - c AS b,
                   SUM(v * c) OVER (ORDER BY v) - v * c AS sb,
                   (SELECT SUM(c) FROM xg) AS n,
                   (SELECT SUM(v * c) FROM xg) AS st
            FROM xg
        ),
        exx AS (
            SELECT 2.0 * CAST(SUM(v * c * (b - (n - b - c)))
                              AS DOUBLE)
                   / (CAST(MAX(n) AS DOUBLE) * MAX(n)) AS e_xx
            FROM xc
        ),
        merged AS (
            SELECT v AS val, c AS xc_, CAST(0 AS DECIMAL(18,2)) AS y,
                   0 AS is_obs FROM xg
            UNION ALL
            SELECT y AS val, 0 AS xc_, y, 1 AS is_obs FROM obs
        ),
        walked AS (
            SELECT val, y, is_obs,
                   SUM(xc_) OVER (ORDER BY val, is_obs) AS below_cnt,
                   SUM(val * xc_) OVER (ORDER BY val, is_obs)
                       AS below_sum,
                   (SELECT SUM(c) FROM xg) AS n,
                   (SELECT SUM(v * c) FROM xg) AS st
            FROM merged
        ),
        exy AS (
            SELECT CAST(SUM(below_cnt * y - below_sum
                            + (st - below_sum)
                            - (n - below_cnt) * y) AS DOUBLE)
                   / (MAX(n) * COUNT(*)) AS e_xy
            FROM walked WHERE is_obs = 1
        )
        SELECT ROUND(exy.e_xy, 6) AS mean_e_xy,
               ROUND(exx.e_xx, 6) AS e_xx,
               ROUND(exy.e_xy - 0.5 * exx.e_xx, 6) AS crps
        FROM exy CROSS JOIN exx
    """,
    section="A112",
    doc="CRPS of an empirical forecast ensemble ('view' event values "
    "as the predictive distribution) against held-out observations "
    "('purchase' values), by the kernel identity "
    "CRPS = E|X-y| - 0.5 E|X-X'| — the proper scoring rule for "
    "DISTRIBUTIONAL forecasts (A?-brier scores binary ones; "
    "pinball scores one quantile; CRPS integrates over all of "
    "them). Both expectations collapse to ORDER-STATISTIC closed "
    "forms on the value grain: E|X-X'| from each value's "
    "below/above counts (v*c*(b-(n-b-c)) summed — no pairwise "
    "join), and each E|X-y| from a merged sorted walk where the "
    "running count/sum of forecast mass below y give "
    "|X-y| = (2*below_cnt-n)*y - 2*below_sum + total in one "
    "expression. Every term is an exact DECIMAL/BIGINT product; "
    "doubles appear only in the final three divisions. With-"
    "replacement pair convention (n^2 denominator). Scale: "
    "value-grain windows (~thousands of rows), one sorted merge "
    "of grain+observations — the all-pairs kernel never "
    "materializes, the same collapse as A107's Walsh cells.",
)
def q_agg_crps_empirical(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import dec2

    ev = load_table(spark, sf_dir, "events")
    fx = ev.where(F.col("event_type") == "view").select(
        dec2(F.col("value")).alias("v")
    )
    obs = ev.where(F.col("event_type") == "purchase").select(
        dec2(F.col("value")).alias("y")
    )
    xg = fx.groupBy("v").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    tot = xg.agg(
        F.sum("c").alias("n"), F.sum(F.col("v") * F.col("c")).alias("st")
    )
    # Scale note (r6): both corpus-wide cumulative walks run on the
    # distributed two-pass prefix-sum operator (range shuffle + keyed
    # windows + broadcast partition offsets) — no single-partition window.
    from ai_to_cvent_etl_spark.operators.ranking import global_cumulative

    xc = (
        global_cumulative(
            xg,
            ["v"],
            {"cum_c": F.col("c"), "cum_vc": F.col("v") * F.col("c")},
        )
        .select(
            "v",
            "c",
            (F.col("cum_c") - F.col("c")).alias("b"),
            (F.col("cum_vc") - F.col("v") * F.col("c")).alias("sb"),
        )
        .crossJoin(F.broadcast(tot))
    )
    exx = xc.agg(
        (
            2.0
            * F.sum(
                F.col("v")
                * F.col("c")
                * (F.col("b") - (F.col("n") - F.col("b") - F.col("c")))
            ).cast("double")
            / (F.max("n").cast("double") * F.max("n"))
        ).alias("e_xx")
    )
    zero = F.lit(0).cast("decimal(18,2)")
    merged = xg.select(
        F.col("v").alias("val"),
        F.col("c").alias("xc_"),
        zero.alias("y"),
        F.lit(0).alias("is_obs"),
    ).unionAll(
        obs.select(
            F.col("y").alias("val"),
            F.lit(0).cast("bigint").alias("xc_"),
            F.col("y"),
            F.lit(1).alias("is_obs"),
        )
    )
    # (val, is_obs) is not a total order — duplicate observations tie —
    # but tied rows all carry xc_ = 0, so every tie order yields the same
    # prefix sums (and matches the original RANGE-frame window exactly).
    walked = global_cumulative(
        merged,
        ["val", "is_obs"],
        {
            "below_cnt": F.col("xc_"),
            "below_sum": F.col("val") * F.col("xc_"),
        },
    ).crossJoin(F.broadcast(tot))
    exy = walked.where(F.col("is_obs") == 1).agg(
        (
            F.sum(
                F.col("below_cnt") * F.col("y")
                - F.col("below_sum")
                + (F.col("st") - F.col("below_sum"))
                - (F.col("n") - F.col("below_cnt")) * F.col("y")
            ).cast("double")
            / (F.max("n") * F.count(F.lit(1)))
        ).alias("e_xy")
    )
    return exy.crossJoin(F.broadcast(exx)).select(
        F.round("e_xy", 6).alias("mean_e_xy"),
        F.round("e_xx", 6).alias("e_xx"),
        F.round(F.col("e_xy") - 0.5 * F.col("e_xx"), 6).alias("crps"),
    )

@register(
    "q_agg_pinball_loss",
    oracle=f"""
        WITH fx AS (
            SELECT CAST(value AS DECIMAL(18,2)) AS v
            FROM events WHERE event_type = 'view'
        ),
        obs AS (
            SELECT CAST(value AS DECIMAL(18,2)) AS y
            FROM events WHERE event_type = 'purchase'
        ),
        taus (tau) AS (VALUES {", ".join(f"({t})" for t in _PINBALL_TAUS)}),
        qs AS (
            SELECT t.tau,
                   (SELECT MIN(r.v) FROM (
                       SELECT v,
                              CAST(SUM(1) OVER (ORDER BY v) AS BIGINT)
                                  AS cc,
                              (SELECT COUNT(*) FROM fx) AS n
                       FROM fx
                   ) r WHERE r.cc >= t.tau * r.n) AS q
            FROM taus t
        ),
        losses AS (
            SELECT qs.tau, qs.q,
                   SUM(CASE WHEN o.y >= qs.q
                            THEN CAST(qs.tau AS DECIMAL(8,4))
                                 * (o.y - qs.q)
                            ELSE CAST(1 - qs.tau AS DECIMAL(8,4))
                                 * (qs.q - o.y) END) AS tot,
                   CAST(COUNT(*) AS BIGINT) AS n_obs
            FROM obs o CROSS JOIN qs
            GROUP BY qs.tau, qs.q
        )
        SELECT CAST(tau AS DOUBLE) AS tau,
               CAST(q AS DOUBLE) AS forecast_q,
               ROUND(CAST(tot AS DOUBLE) / n_obs, 6) AS pinball
        FROM losses
    """,
    section="A113",
    doc="Pinball (quantile) loss of the empirical q10/q50/q90 of the "
    "'view' value distribution used as quantile forecasts for "
    "held-out 'purchase' values — the proper scoring rule for "
    "QUANTILE forecasts (what quantile-regression models and "
    "prediction-interval systems are graded on; A112's CRPS is "
    "its integral over tau). Forecast quantiles are inverted-CDF "
    "order statistics on the exact decimal grain (MIN v with "
    "cumcount >= tau*n — no interpolation, engine-identical); "
    "each loss term is an exact DECIMAL product (tau at 4dp times "
    "a 2dp difference), summed exactly, ONE division per tau at "
    "render. Scale: the quantile lookup is a value-grain "
    "cumulative; the loss pass is one map-combinable conditional "
    "aggregate per tau over a broadcast 3-row quantile table.",
)
def q_agg_pinball_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import dec2

    ev = load_table(spark, sf_dir, "events")
    fx = ev.where(F.col("event_type") == "view").select(
        dec2(F.col("value")).alias("v")
    )
    obs = ev.where(F.col("event_type") == "purchase").select(
        dec2(F.col("value")).alias("y")
    )
    nfx = fx.agg(F.count(F.lit(1)).cast("bigint").alias("nfx"))
    # Scale note (r6): the RANGE-frame cumulative count #{v' <= v} is the
    # same per distinct value, so collapse to value counts first and run
    # the distributed prefix-sum operator over distinct values — the
    # single-partition window (and the per-row walk) disappear, and the
    # min-over-threshold quantile selection is unchanged.
    from ai_to_cvent_etl_spark.operators.ranking import global_cumulative

    vg = fx.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    cum = global_cumulative(vg, ["v"], {"cc": F.col("c")}).select(
        "v", F.col("cc").cast("bigint").alias("cc")
    )
    taus = spark.createDataFrame(
        [(float(t),) for t in _PINBALL_TAUS], "tau double"
    )
    qs = (
        taus.crossJoin(cum)
        .crossJoin(F.broadcast(nfx))
        .where(F.col("cc") >= F.col("tau") * F.col("nfx"))
        .groupBy("tau")
        .agg(F.min("v").alias("q"))
    )
    tau_d = F.col("tau").cast("decimal(8,4)")
    loss = F.when(
        F.col("y") >= F.col("q"), tau_d * (F.col("y") - F.col("q"))
    ).otherwise(
        (F.lit(1).cast("decimal(8,4)") - tau_d)
        * (F.col("q") - F.col("y"))
    )
    losses = (
        obs.crossJoin(F.broadcast(qs))
        .groupBy("tau", "q")
        .agg(
            F.sum(loss).alias("tot"),
            F.count(F.lit(1)).cast("bigint").alias("n_obs"),
        )
    )
    return losses.select(
        F.col("tau").cast("double").alias("tau"),
        F.col("q").cast("double").alias("forecast_q"),
        F.round(
            F.col("tot").cast("double") / F.col("n_obs"), 6
        ).alias("pinball"),
    )

@register(
    "q_agg_chain_ladder",
    oracle=f"""
        WITH cells AS (
            SELECT year(o.o_orderdate) AS origin,
                   year(l.l_shipdate) - year(o.o_orderdate) AS dev,
                   SUM({ORACLE_DISC_PRICE}) AS x
            FROM orders o JOIN lineitem l
              ON o.o_orderkey = l.l_orderkey
            WHERE year(l.l_shipdate) >= year(o.o_orderdate)
            GROUP BY 1, 2
        ),
        cum AS (
            SELECT origin, dev,
                   SUM(x) OVER (PARTITION BY origin ORDER BY dev) AS c
            FROM cells
        ),
        mx AS (SELECT MAX(origin + dev) AS maxcal FROM cum),
        pairs AS (
            SELECT a.dev,
                   SUM(a.c) AS c_d,
                   SUM(b.c) AS c_d1,
                   CAST(COUNT(*) AS BIGINT) AS n_origins
            FROM cum a
            JOIN cum b ON a.origin = b.origin AND b.dev = a.dev + 1
            CROSS JOIN mx
            WHERE a.origin + a.dev + 1 <= mx.maxcal
            GROUP BY a.dev
        )
        SELECT CAST(dev AS BIGINT) AS dev, n_origins,
               CAST(c_d AS DOUBLE) AS cum_at_dev,
               ROUND(CAST(c_d1 AS DOUBLE) / CAST(c_d AS DOUBLE), 6)
                   AS dev_factor
        FROM pairs
    """,
    section="A114",
    doc="Chain-ladder development factors over the order-to-ship run-"
    "off triangle: origin year x development lag cells of exact-"
    "decimal revenue, cumulated within origin, and the volume-"
    "weighted link ratio f_d = sum(C_{o,d+1})/sum(C_{o,d}) over "
    "origins whose d+1 diagonal is observable — the actuarial "
    "reserving primitive (Mack's chain ladder) whose product of "
    "factors projects every open origin to ultimate; the same "
    "triangle arithmetic prices any cohort run-off (claims, "
    "refunds, LTV maturation). Determinism: cells and cumulatives "
    "are exact DECIMAL sums; the observability cut (origin + dev "
    "+ 1 <= latest calendar) is integer; one double division per "
    "dev lag. Scale: the fact collapses to the ~7x7 triangle "
    "grain in one map-combinable pass; everything after is "
    "driver-sized.",
)
def q_agg_chain_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("origin")
    )
    li = load_table(spark, sf_dir, "lineitem")
    cells = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(F.year("l_shipdate") >= F.col("origin"))
        .groupBy(
            "origin",
            (F.year("l_shipdate") - F.col("origin")).alias("dev"),
        )
        .agg(F.sum(disc_price()).alias("x"))
    )
    w = Window.partitionBy("origin").orderBy("dev")
    cum = cells.select(
        "origin", "dev", F.sum("x").over(w).alias("c")
    )
    mx = cum.agg(F.max(F.col("origin") + F.col("dev")).alias("maxcal"))
    a = cum.select("origin", "dev", F.col("c").alias("ca"))
    b = cum.select(
        F.col("origin").alias("ob"),
        F.col("dev").alias("db"),
        F.col("c").alias("cb"),
    )
    pairs = (
        a.join(
            b,
            (F.col("origin") == F.col("ob"))
            & (F.col("db") == F.col("dev") + 1),
        )
        .crossJoin(F.broadcast(mx))
        .where(F.col("origin") + F.col("dev") + 1 <= F.col("maxcal"))
        .groupBy("dev")
        .agg(
            F.sum("ca").alias("c_d"),
            F.sum("cb").alias("c_d1"),
            F.count(F.lit(1)).cast("bigint").alias("n_origins"),
        )
    )
    return pairs.select(
        F.col("dev").cast("bigint").alias("dev"),
        "n_origins",
        F.col("c_d").cast("double").alias("cum_at_dev"),
        F.round(
            F.col("c_d1").cast("double") / F.col("c_d").cast("double"),
            6,
        ).alias("dev_factor"),
    )

@register(
    "q_agg_trimmed_mean",
    oracle=f"""
        WITH vg AS (
            SELECT CAST(l_extendedprice AS DECIMAL(18,2)) AS v,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM lineitem GROUP BY 1
        ),
        tot AS (
            SELECT CAST(SUM(c) AS BIGINT) AS n,
                   CAST(SUM(c) * {_TRIM_FRAC_NUM}
                        / {_TRIM_FRAC_DEN} AS BIGINT) AS k
            FROM vg
        ),
        cum AS (
            SELECT v, c,
                   SUM(c) OVER (ORDER BY v) - c AS b,
                   t.n, t.k
            FROM vg CROSS JOIN tot t
        ),
        interior AS (
            SELECT v,
                   GREATEST(CAST(0 AS BIGINT),
                       LEAST(b + c, n - k) - GREATEST(b, k)) AS keep,
                   n, k
            FROM cum
        )
        SELECT CAST(MAX(n) AS BIGINT) AS n_rows,
               CAST(MAX(k) AS BIGINT) AS k_trimmed_per_tail,
               ROUND(CAST(SUM(v * keep) AS DOUBLE)
                     / (MAX(n) - 2 * MAX(k)), 6) AS trimmed_mean
        FROM interior
    """,
    section="A115",
    doc=f"{100 * _TRIM_FRAC_NUM // _TRIM_FRAC_DEN}%-per-tail trimmed "
    "mean of l_extendedprice — the robust location estimate that "
    "DROPS the tails where A?-winsorized CLAMPS them (different "
    "influence functions: trimming zeroes outlier influence, "
    "winsorizing caps it). Row-rank semantics with duplicate "
    "values are handled on the VALUE grain: each value keeps "
    "max(0, min(b+c, n-k) - max(b, k)) of its c copies — the "
    "overlap of its rank interval [b, b+c) with the kept band "
    "[k, n-k) — so the result equals sorting all rows and "
    "dropping exactly k per side, without sorting the fact. "
    "Integer floor k = n/10 matches on both engines (BIGINT "
    "arithmetic); the kept mass is an exact DECIMAL sum, one "
    "division at render. Scale: value-grain cumulative (distinct "
    "prices), map-combinable collapse first — the A107 shape.",
)
def q_agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import dec2

    li = load_table(spark, sf_dir, "lineitem")
    vg = li.groupBy(dec2(F.col("l_extendedprice")).alias("v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    tot = vg.agg(
        F.sum("c").cast("bigint").alias("n"),
        (F.sum("c") * _TRIM_FRAC_NUM / _TRIM_FRAC_DEN)
        .cast("bigint")
        .alias("k"),
    )
    w = Window.orderBy("v")
    cum = vg.crossJoin(F.broadcast(tot)).select(
        "v",
        "c",
        (F.sum("c").over(w) - F.col("c")).alias("b"),
        "n",
        "k",
    )
    keep = F.greatest(
        F.lit(0).cast("bigint"),
        F.least(F.col("b") + F.col("c"), F.col("n") - F.col("k"))
        - F.greatest(F.col("b"), F.col("k")),
    )
    return cum.select("v", keep.alias("keep"), "n", "k").agg(
        F.max("n").cast("bigint").alias("n_rows"),
        F.max("k").cast("bigint").alias("k_trimmed_per_tail"),
        F.round(
            F.sum(F.col("v") * F.col("keep")).cast("double")
            / (F.max("n") - 2 * F.max("k")),
            6,
        ).alias("trimmed_mean"),
    )

@register(
    "q_agg_jonckheere",
    oracle=_jt_oracle(),
    section="A116",
    doc="Jonckheere-Terpstra ordered-alternative trend test: does "
    "o_totalprice trend monotonically across the FIVE ORDERED priority "
    "classes (1-URGENT < ... < 5-LOW)? The statistic J = sum over "
    "group pairs i<j of Mann-Whitney U counts — the test A59 "
    "(Kruskal-Wallis) cannot replace because KW ignores group order. "
    "The naive form is all-pairs O(n^2); this runs it at the VALUE "
    "GRAIN: per-(group, exact-decimal-price) counts, one ordered "
    "window giving each group's strictly-less cumulative, then "
    "2J = sum_j c_j * (2*less_i + c_i) pairwise over the 5 group "
    "columns — ties get the standard half credit via the doubled "
    "statistic, which keeps EVERYTHING int64-exact until the final "
    "pinned double z-score (no-ties normal approximation). Scale: one "
    "count at the distinct-price grain, one global ordered window "
    "over it (value-grain spine, not the fact), one scalar rollup.",
)
def q_agg_jonckheere(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import dec2

    gs = _JT_GROUPS
    orders = load_table(spark, sf_dir, "orders")
    vc = (
        orders.groupBy(
            F.col("o_orderpriority").alias("grp"),
            dec2(F.col("o_totalprice")).alias("v"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    val = vc.groupBy("v").agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("grp") == g, F.col("c"))), F.lit(0)
            )
            .cast("bigint")
            .alias(f"c{i}")
            for i, g in enumerate(gs)
        ]
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = val.select(
        "*",
        *[
            (F.sum(f"c{i}").over(w) - F.col(f"c{i}")).alias(f"less{i}")
            for i in range(len(gs))
        ],
    )
    contrib = None
    for j in range(len(gs)):
        for i in range(j):
            term = F.col(f"c{j}") * (
                2 * F.col(f"less{i}") + F.col(f"c{i}")
            )
            contrib = term if contrib is None else contrib + term
    tot = cum.agg(
        F.sum(contrib).cast("bigint").alias("j2"),
        *[
            F.sum(f"c{i}").cast("bigint").alias(f"n{i}")
            for i in range(len(gs))
        ],
    )
    n_total = None
    nsq = None
    nvar = None
    for i in range(len(gs)):
        ni = F.col(f"n{i}")
        n_total = ni if n_total is None else n_total + ni
        nsq = ni * ni if nsq is None else nsq + ni * ni
        nv = ni * ni * (2 * ni + 3)
        nvar = nv if nvar is None else nvar + nv
    nd = n_total.cast("double")
    nsqd = nsq.cast("double")
    nvard = nvar.cast("double")
    jt = F.col("j2").cast("double") / 2
    expected = (nd * nd - nsqd) / 4
    z = (jt - expected) / F.sqrt((nd * nd * (2 * nd + 3) - nvard) / 72)
    return tot.select(
        jt.alias("jt_stat"),
        n_total.cast("bigint").alias("n_total"),
        expected.alias("expected_jt"),
        F.round(z, 6).alias("z_score"),
    )

# ==== wave 135: ordered repeated measures, multi-rater agreement ===


@register(
    "q_agg_page_trend",
    oracle="""
        WITH cells AS (
            SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
                   CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS j,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS v
            FROM orders GROUP BY 1, 2
        ),
        complete AS (
            SELECT y FROM cells GROUP BY y HAVING COUNT(*) = 5
        ),
        ranked AS (
            SELECT c.y, c.j,
                   2 * RANK() OVER (PARTITION BY c.y ORDER BY c.v)
                   + COUNT(*) OVER (PARTITION BY c.y, c.v) - 1 AS r2
            FROM cells c JOIN complete USING (y)
        ),
        tot AS (
            SELECT CAST(SUM(j * r2) AS BIGINT) AS l2,
                   CAST(COUNT(*) / 5 AS BIGINT) AS b
            FROM ranked
        )
        SELECT CAST(l2 AS DOUBLE) / 2 AS l_stat,
               b AS n_blocks,
               CAST(b * 5 * 36 AS DOUBLE) / 4 AS expected_l,
               ROUND((CAST(l2 AS DOUBLE) / 2
                      - CAST(b * 5 * 36 AS DOUBLE) / 4)
                     / sqrt(CAST(25 * b AS DOUBLE)), 6) AS z_score
        FROM tot
    """,
    section="A117",
    doc="Page's L trend test for ordered alternatives under blocking: "
    "does yearly revenue trend monotonically across the five ORDERED "
    "priority classes WITHIN each order-year block? The blocked sibling "
    "of A116 (Jonckheere, unblocked) and the ordered sibling of A61 "
    "(Friedman, unordered): L = sum over blocks of sum_j j*r_j with "
    "treatments ranked inside each block. Only complete blocks (all 5 "
    "classes present) enter, so the closed-form moments hold. "
    "Determinism: cell values are exact decimal sums; average-rank tie "
    "handling uses the DOUBLED rank 2r = 2*RANK() + tie_count - 1 "
    "(int64), so L2 = sum j*2r is all-integer; for k = 5 the variance "
    "collapses to 25b exactly, leaving one pinned double z expression. "
    "Scale: one (year, priority) agg (35 cells), window over cells.",
)
def q_agg_page_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import dec2

    orders = load_table(spark, sf_dir, "orders")
    cells = orders.groupBy(
        F.year("o_orderdate").cast("bigint").alias("y"),
        F.substring("o_orderpriority", 1, 1).cast("bigint").alias("j"),
    ).agg(F.sum(dec2(F.col("o_totalprice"))).alias("v"))
    complete = (
        cells.groupBy("y")
        .agg(F.count(F.lit(1)).alias("nc"))
        .where(F.col("nc") == 5)
        .select("y")
    )
    wr = Window.partitionBy("y").orderBy("v")
    wt = Window.partitionBy("y", "v")
    ranked = cells.join(F.broadcast(complete), "y").select(
        "j",
        (
            2 * F.rank().over(wr) + F.count(F.lit(1)).over(wt) - 1
        ).alias("r2"),
    )
    tot = ranked.agg(
        F.sum(F.col("j") * F.col("r2")).cast("bigint").alias("l2"),
        (F.count(F.lit(1)) / 5).cast("bigint").alias("b"),
    )
    l_stat = F.col("l2").cast("double") / 2
    expected = (F.col("b") * 5 * 36).cast("double") / 4
    z = (l_stat - expected) / F.sqrt((25 * F.col("b")).cast("double"))
    return tot.select(
        l_stat.alias("l_stat"),
        F.col("b").alias("n_blocks"),
        expected.alias("expected_l"),
        F.round(z, 6).alias("z_score"),
    )

@register(
    "q_agg_fleiss_kappa",
    oracle=f"""
        WITH eligible AS (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey HAVING COUNT(*) = {_FLEISS_N}
        ),
        nij AS (
            SELECT l.l_orderkey, l.l_returnflag,
                   CAST(COUNT(*) AS BIGINT) AS nij
            FROM lineitem l JOIN eligible e USING (l_orderkey)
            GROUP BY 1, 2
        ),
        s AS (
            SELECT CAST(SUM(nij * (nij - 1)) AS BIGINT) AS a,
                   CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_items
            FROM nij
        ),
        cat AS (
            SELECT CAST(SUM(tj * tj) AS BIGINT) AS b FROM (
                SELECT l_returnflag, CAST(SUM(nij) AS BIGINT) AS tj
                FROM nij GROUP BY 1
            )
        )
        SELECT n_items,
               CAST({_FLEISS_N} AS BIGINT) AS n_raters,
               ROUND(CAST(a AS DOUBLE)
                     / CAST(12 * n_items AS DOUBLE), 6) AS p_bar,
               ROUND(CAST(b AS DOUBLE)
                     / CAST(16 * n_items * n_items AS DOUBLE), 6) AS p_e,
               ROUND(CAST(4 * n_items * a - 3 * b AS DOUBLE)
                     / CAST(48 * n_items * n_items - 3 * b AS DOUBLE),
                     6) AS kappa
        FROM s, cat
    """,
    section="A118",
    doc=f"Fleiss' kappa over orders with exactly {_FLEISS_N} line items: "
    f"treat each order as an item rated by its {_FLEISS_N} lines and "
    "l_returnflag as the category — do lines of the same order agree "
    "on return status beyond chance? The MULTI-rater generalization of "
    "A14's Cohen kappa (two raters), and the fixed-panel complement of "
    "A35's ICC (continuous). Everything is counting: agreement mass "
    "A = sum n_ij(n_ij-1), category mass B = sum t_j^2, and kappa "
    "reduces to the EXACT integer ratio (4NA - 3B)/(48N^2 - 3B) after "
    "clearing denominators (n = 4 raters pins n(n-1) = 12, (Nn)^2 = "
    "16N^2) — one double division, no intermediate float. Scale: two "
    "keyed aggs on l_orderkey (the fact grain) + a 3-row category "
    "rollup; the eligibility semi-join broadcasts.",
)
def q_agg_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    eligible = (
        li.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("nl"))
        .where(F.col("nl") == _FLEISS_N)
        .select("l_orderkey")
    )
    nij = (
        li.join(eligible, "l_orderkey")
        .groupBy("l_orderkey", "l_returnflag")
        .agg(F.count(F.lit(1)).cast("bigint").alias("nij"))
    )
    s = nij.agg(
        F.sum(F.col("nij") * (F.col("nij") - 1)).cast("bigint").alias("a"),
        F.countDistinct("l_orderkey").cast("bigint").alias("n_items"),
    )
    cat = (
        nij.groupBy("l_returnflag")
        .agg(F.sum("nij").cast("bigint").alias("tj"))
        .agg(F.sum(F.col("tj") * F.col("tj")).cast("bigint").alias("b"))
    )
    out = s.crossJoin(cat)
    n = F.col("n_items")
    return out.select(
        "n_items",
        F.lit(_FLEISS_N).cast("bigint").alias("n_raters"),
        F.round(
            F.col("a").cast("double") / (12 * n).cast("double"), 6
        ).alias("p_bar"),
        F.round(
            F.col("b").cast("double") / (16 * n * n).cast("double"), 6
        ).alias("p_e"),
        F.round(
            (4 * n * F.col("a") - 3 * F.col("b")).cast("double")
            / (48 * n * n - 3 * F.col("b")).cast("double"),
            6,
        ).alias("kappa"),
    )

# ==== wave 136a: average precision (PR-AUC companion to A58) =======


@register(
    "q_agg_average_precision",
    oracle="""
        WITH s AS (
            SELECT CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
                       AS cents,
                   CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1
                                 ELSE 0 END) AS BIGINT) AS np,
                   CAST(COUNT(*) AS BIGINT) AS nt
            FROM events
            GROUP BY 1
        ),
        c AS (
            SELECT np,
                   SUM(np) OVER (ORDER BY cents DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS tp,
                   SUM(nt) OVER (ORDER BY cents DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS k
            FROM s
        ),
        t AS (
            SELECT CAST(SUM(CASE WHEN np > 0 THEN CAST(floor(
                       CAST(np * tp AS DOUBLE)
                       / CAST((SELECT SUM(np) FROM s) * k AS DOUBLE)
                       * 1e12) AS BIGINT) ELSE 0 END) AS BIGINT) AS ap_q12,
                   CAST((SELECT SUM(np) FROM s) AS BIGINT) AS p,
                   CAST((SELECT SUM(nt) - SUM(np) FROM s) AS BIGINT) AS n,
                   CAST((SELECT COUNT(*) FROM s) AS BIGINT) AS n_scores
            FROM c
        )
        SELECT p AS n_pos, n AS n_neg, n_scores,
               ROUND(CAST(ap_q12 AS DOUBLE) / 1e12, 6) AS avg_precision
        FROM t
    """,
    section="A119",
    doc="Average precision (the PR-AUC summary) of the value score "
    "against the purchase label — A58's AUC-ROC companion that stays "
    "informative under CLASS IMBALANCE, where ROC saturates. Computed "
    "at the distinct-score grain with NO global row sort: descending "
    "cumulative (tp, k), each score block contributing "
    "Δtp/P · precision-at-block-end — the tie-safe step convention "
    "(a tied block is atomic, so the metric cannot depend on "
    "within-tie order). Each block term is ONE pinned double division "
    "(int64 numerator np·tp, int64 denominator P·k) quantized "
    "floor(x·1e12) -> BIGINT, so the cross-block sum is integer-exact. "
    "Scale: one agg to the score grain, one ordered window over "
    "distinct scores, one rollup — same shape as A58.",
)
def q_agg_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import dec2

    ev = load_table(spark, sf_dir, "events")
    s = ev.groupBy(
        (dec2(F.col("value")) * 100).cast("bigint").alias("cents")
    ).agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        )
        .cast("bigint")
        .alias("np"),
        F.count(F.lit(1)).cast("bigint").alias("nt"),
    )
    w = Window.orderBy(F.col("cents").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    c = s.select(
        "np",
        F.sum("np").over(w).alias("tp"),
        F.sum("nt").over(w).alias("k"),
    )
    tot = s.agg(
        F.sum("np").cast("bigint").alias("p"),
        (F.sum("nt") - F.sum("np")).cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_scores"),
    )
    term = F.floor(
        (F.col("np") * F.col("tp")).cast("double")
        / (F.col("p") * F.col("k")).cast("double")
        * F.lit(1e12)
    ).cast("bigint")
    ap = (
        c.crossJoin(F.broadcast(tot))
        .select(
            F.when(F.col("np") > 0, term).otherwise(0).alias("t_q12"),
            "p",
            "n",
            "n_scores",
        )
        .groupBy("p", "n", "n_scores")
        .agg(F.sum("t_q12").cast("bigint").alias("ap_q12"))
    )
    return ap.select(
        F.col("p").alias("n_pos"),
        F.col("n").alias("n_neg"),
        "n_scores",
        F.round(F.col("ap_q12").cast("double") / F.lit(1e12), 6).alias(
            "avg_precision"
        ),
    )

@register(
    "q_agg_gumbel_return",
    oracle=f"""
        WITH blocks AS (
            SELECT CAST(ts AS DATE) AS d,
                   MAX(CAST(value AS DECIMAL(18,2))) AS mx
            FROM events GROUP BY 1
        ),
        s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(mx) * 100 AS BIGINT) AS s1c,
                   CAST(SUM(mx * mx) * 10000 AS BIGINT) AS s2c
            FROM blocks
        ),
        fit AS (
            SELECT n,
                   CAST(s1c AS DOUBLE) / 100 / n AS mean_mx,
                   sqrt((CAST(n AS DOUBLE) * (CAST(s2c AS DOUBLE) / 10000)
                         - (CAST(s1c AS DOUBLE) / 100)
                           * (CAST(s1c AS DOUBLE) / 100))
                        / (CAST(n AS DOUBLE) * (n - 1))) AS sd_mx
            FROM s
        )
        SELECT n AS n_blocks,
               ROUND(mean_mx - {_GUM_GAMMA} * (sd_mx * {_GUM_SQRT6_PI}),
                     4) AS mu,
               ROUND(sd_mx * {_GUM_SQRT6_PI}, 4) AS beta,
               ROUND(mean_mx - {_GUM_GAMMA} * (sd_mx * {_GUM_SQRT6_PI})
                     + (sd_mx * {_GUM_SQRT6_PI}) * {_GUM_C10}, 4)
                   AS return_level_10,
               ROUND(mean_mx - {_GUM_GAMMA} * (sd_mx * {_GUM_SQRT6_PI})
                     + (sd_mx * {_GUM_SQRT6_PI}) * {_GUM_C100}, 4)
                   AS return_level_100
        FROM fit
    """,
    section="A120",
    doc="Gumbel extreme-value fit with return levels — the capacity-"
    "planning question ('what peak event value do we see once per 10 "
    "/ 100 days?') answered from daily block maxima via method-of-"
    "moments: beta = s*sqrt(6)/pi, mu = mean - gamma*beta, and "
    "x_T = mu + beta*(-ln(-ln(1-1/T))). Every transcendental constant "
    "(Euler-Mascheroni, sqrt(6)/pi, the two reduced variates) is "
    "computed ONCE in Python and embedded as an identical double "
    "literal in both engines, so neither engine ever calls ln(): the "
    "fit itself is exact decimal block maxima -> integer cent moments "
    "-> pinned double mean/sd (IEEE sqrt correctly rounded). The EVT "
    "complement of A64's Hill tail index (Hill estimates the tail "
    "EXPONENT from upper order statistics; this fits the max-domain "
    "location/scale and extrapolates). Scale: one day-grain max "
    "collapse and a scalar fit — all map-combinable.",
)
def q_agg_gumbel_return(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import dec2

    ev = load_table(spark, sf_dir, "events")
    blocks = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.max(dec2(F.col("value"))).alias("mx")
    )
    s = blocks.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (F.sum("mx") * 100).cast("bigint").alias("s1c"),
        (F.sum(F.col("mx") * F.col("mx")) * 10000)
        .cast("bigint")
        .alias("s2c"),
    )
    n = F.col("n")
    nd = n.cast("double")
    mean_mx = F.col("s1c").cast("double") / 100 / n
    sd_mx = F.sqrt(
        (
            nd * (F.col("s2c").cast("double") / 10000)
            - (F.col("s1c").cast("double") / 100)
            * (F.col("s1c").cast("double") / 100)
        )
        / (nd * (n - 1))
    )
    beta = sd_mx * F.lit(_GUM_SQRT6_PI)
    mu = mean_mx - F.lit(_GUM_GAMMA) * beta
    return s.select(
        n.alias("n_blocks"),
        F.round(mu, 4).alias("mu"),
        F.round(beta, 4).alias("beta"),
        F.round(mu + beta * F.lit(_GUM_C10), 4).alias("return_level_10"),
        F.round(mu + beta * F.lit(_GUM_C100), 4).alias("return_level_100"),
    )

@register(
    "q_agg_bootstrap_median",
    oracle=f"""
        WITH reps AS (SELECT CAST(r.range AS BIGINT) AS b
                      FROM range({_BOOT_B}) r),
        seeds AS (
            SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS cents,
                   CAST(('0x' || substr(h, 1, 12)) AS BIGINT) % {_POIS1_P}
                       AS sa,
                   CAST(('0x' || substr(h, 13, 12)) AS BIGINT) % {_POIS1_P}
                       AS sc
            FROM (SELECT l_extendedprice,
                         md5(CAST(l_orderkey AS VARCHAR) || '-'
                             || CAST(l_linenumber AS VARCHAR)) AS h
                  FROM lineitem)
        ),
        grain AS (
            SELECT b, cents,
                   CAST(SUM({_boot_w("((sa + b * sc) % " + str(_POIS1_P) + ")")})
                        AS BIGINT) AS w
            FROM seeds CROSS JOIN reps
            GROUP BY b, cents
        ),
        cum AS (
            SELECT b, cents, w,
                   SUM(w) OVER (PARTITION BY b ORDER BY cents
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cw,
                   SUM(w) OVER (PARTITION BY b) AS tw
            FROM grain
        ),
        med AS (
            SELECT b, MIN(cents) AS med_cents
            FROM cum WHERE 2 * cw >= tw GROUP BY b
        ),
        ranked AS (
            SELECT med_cents,
                   ROW_NUMBER() OVER (ORDER BY med_cents, b) AS rk
            FROM med
        ),
        pt AS (
            SELECT MIN(cents) AS pm FROM (
                SELECT cents,
                       SUM(n) OVER (ORDER BY cents
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cn,
                       SUM(n) OVER () AS tn
                FROM (SELECT cents, CAST(COUNT(*) AS BIGINT) AS n
                      FROM seeds GROUP BY cents)
            ) WHERE 2 * cn >= tn
        )
        SELECT CAST({_BOOT_B} AS BIGINT) AS n_boot,
               (SELECT pm FROM pt) AS point_median_cents,
               MAX(CASE WHEN rk = 2 THEN med_cents END) AS ci_lo_cents,
               MAX(CASE WHEN rk = {_BOOT_B - 1} THEN med_cents END)
                   AS ci_hi_cents
        FROM ranked
    """,
    section="A121",
    doc="Poisson-bootstrap confidence interval for the MEDIAN line "
    "price — the quantile counterpart of A56 (whose CLT-free CI only "
    "covers the mean; a median has no closed-form standard error, "
    "which is exactly when the bootstrap earns its keep). Same "
    "deterministic replica machinery as A56 (one md5 per row, affine "
    "(a + b*c) mod 2^48-59 per replica, integer Poisson(1) CDF "
    "thresholds), but the statistic needs a different distributed "
    "shape: weights collapse to the (replica, distinct-cents) GRAIN, "
    "one cumulative-weight window per replica, and the weighted lower "
    "median is the smallest value with 2*cumw >= total — all-integer "
    "compares, no division anywhere. CI = 2nd/31st order statistics "
    "of the 32 replica medians (~93.75% coverage, documented); the "
    "point estimate is the exact lower median of the raw data. "
    "Scale: B*|distinct prices| rows after the grain collapse "
    "(map-combinable), 32 small partition-local windows — the fact "
    "never sorts globally.",
)
def q_agg_bootstrap_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    seeds = li.select(
        F.expr(
            "cast(cast(l_extendedprice as decimal(18,2)) * 100 as bigint)"
        ).alias("cents"),
        F.expr(
            "md5(concat(cast(l_orderkey as string), '-', "
            "cast(l_linenumber as string)))"
        ).alias("h"),
    ).select(
        "cents",
        F.expr(
            f"cast(conv(substr(h, 1, 12), 16, 10) as bigint) % {_POIS1_P}"
        ).alias("sa"),
        F.expr(
            f"cast(conv(substr(h, 13, 12), 16, 10) as bigint) % {_POIS1_P}"
        ).alias("sc"),
    ).localCheckpoint(eager=False)
    w_expr = _boot_w(f"((sa + b * sc) % {_POIS1_P})")
    # Two-phase distributed exact weighted median (the value grain is
    # ~row grain for prices, so a single value-grain pass would sort
    # B*n rows; measured 19.5 s at sf0.1 — the histogram pass + a
    # straddling-bucket refine runs the same statistic in ~3 s):
    # phase 1 — per-replica weight mass per coarse bucket (cents DIV
    # 1e4), A56's tiny-group map-combinable shape; find each replica's
    # straddling bucket and the cumulative mass BEFORE it.
    # r9 (VERDICT r8 item 3, guide §2.3 aggregate-before-shuffle): the
    # histogram pass used to EXPLODE every seed row into B=32 replica
    # rows (19.2M generated rows at sf0.1, each paying generator + agg
    # hash-probe overhead) before collapsing to (b, bucket). The replica
    # axis now pivots into 32 aggregate COLUMNS over the un-exploded
    # seeds (same 32 w-evaluations per row, zero row multiplication),
    # and stack() unpivots the 26x32 bucket moments back to (b, bucket)
    # grain. Identical integer sums — only the grouping route changed.
    bucketed = seeds.select(
        "sa", "sc", F.expr("cents DIV 10000").alias("bucket")
    )
    hist_piv = bucketed.groupBy("bucket").agg(
        *[
            F.expr(
                "cast(sum("
                + _boot_w(f"((sa + {b} * sc) % {_POIS1_P})")
                + f") as bigint) as bw{b}"
            )
            for b in range(_BOOT_B)
        ]
    )
    hist = hist_piv.selectExpr(
        "bucket",
        f"stack({_BOOT_B}, "
        + ", ".join(f"{b}, bw{b}" for b in range(_BOOT_B))
        + ") as (b, bw)",
    )
    wb = Window.partitionBy("b").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wtot = Window.partitionBy("b")
    cumh = hist.select(
        "b",
        "bucket",
        (F.sum("bw").over(wb) - F.col("bw")).alias("before"),
        F.sum("bw").over(wb).alias("through"),
        F.sum("bw").over(wtot).alias("tw"),
    )
    targets = cumh.where(
        (2 * F.col("through") >= F.col("tw"))
        & (2 * F.col("before") < F.col("tw"))
    ).select("b", "bucket", "before", "tw")
    # phase 2 — exact value-grain scan of ONLY the straddling buckets
    # (a handful of rows), offset by the phase-1 cumulative mass.
    fine = (
        seeds.withColumn("bucket", F.expr("cents DIV 10000"))
        .join(
            F.broadcast(targets.select("b", "bucket", "before", "tw")),
            "bucket",
        )
        .select("b", "cents", "before", "tw", F.expr(w_expr).alias("w"))
        .groupBy("b", "cents", "before", "tw")
        .agg(F.sum("w").cast("bigint").alias("w"))
    )
    wf = Window.partitionBy("b").orderBy("cents").rowsBetween(
        Window.unboundedPreceding, 0
    )
    med = (
        fine.withColumn("cw", F.sum("w").over(wf) + F.col("before"))
        .where(2 * F.col("cw") >= F.col("tw"))
        .groupBy("b")
        .agg(F.min("cents").alias("med_cents"))
    )
    ranked = med.withColumn(
        "rk",
        F.row_number().over(
            Window.orderBy(F.col("med_cents").asc(), F.col("b").asc())
        ),
    )
    # r8 (guide §2.4): the point-estimate's cumulative count ran as an
    # UNPARTITIONED window over the distinct-cents table (~row-grain for
    # prices — a single-task sort of ~450k rows at sf0.1, unbounded at
    # scale). global_cumulative keeps every stage parallel. r9 (VERDICT
    # r8 item 3): the whole-set total now rides OUT of the same P-row
    # offsets frame (with_totals) instead of a second aggregation pass
    # over the grain + crossJoin — one fewer Exchange and one fewer
    # aggregate in the plan. Identical values: the total is the sum of
    # the per-partition sums, exact bigint arithmetic either way.
    from ai_to_cvent_etl_spark.operators.ranking import global_cumulative

    pt_grain = seeds.groupBy("cents").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    pt = (
        global_cumulative(
            pt_grain, ["cents"], {"cn": F.col("n")}, with_totals=True
        )
        .where(2 * F.col("cn") >= F.col("cn_total"))
        .agg(F.min("cents").alias("pm"))
    )
    return (
        ranked.agg(
            F.max(F.when(F.col("rk") == 2, F.col("med_cents"))).alias(
                "ci_lo_cents"
            ),
            F.max(
                F.when(F.col("rk") == _BOOT_B - 1, F.col("med_cents"))
            ).alias("ci_hi_cents"),
        )
        .crossJoin(F.broadcast(pt))
        .select(
            F.lit(_BOOT_B).cast("bigint").alias("n_boot"),
            F.col("pm").alias("point_median_cents"),
            "ci_lo_cents",
            "ci_hi_cents",
        )
    )

@register(
    "q_agg_diff_in_diff",
    oracle=f"""
        WITH labeled AS (
            SELECT CASE WHEN r.r_name = 'EUROPE' THEN 1 ELSE 0 END AS treat,
                   CASE WHEN o.o_orderdate >= TIMESTAMP '{_DID_CUT} 00:00:00'
                        THEN 1 ELSE 0 END AS post,
                   CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS cents
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
        ),
        cells AS (
            SELECT treat, post,
                   CAST(SUM(cents) AS BIGINT) AS s,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM labeled GROUP BY treat, post
        ),
        wide AS (
            SELECT
                MAX(CASE WHEN treat = 1 AND post = 0 THEN CAST(s AS DOUBLE) / n END) AS m_t_pre,
                MAX(CASE WHEN treat = 1 AND post = 1 THEN CAST(s AS DOUBLE) / n END) AS m_t_post,
                MAX(CASE WHEN treat = 0 AND post = 0 THEN CAST(s AS DOUBLE) / n END) AS m_c_pre,
                MAX(CASE WHEN treat = 0 AND post = 1 THEN CAST(s AS DOUBLE) / n END) AS m_c_post,
                CAST(SUM(n) AS BIGINT) AS n_total
            FROM cells
        )
        SELECT n_total,
               ROUND(m_t_pre, 4) AS mean_treat_pre_cents,
               ROUND(m_t_post, 4) AS mean_treat_post_cents,
               ROUND(m_c_pre, 4) AS mean_ctrl_pre_cents,
               ROUND(m_c_post, 4) AS mean_ctrl_post_cents,
               ROUND((m_t_post - m_t_pre) - (m_c_post - m_c_pre), 4)
                   AS did_cents
        FROM wide
    """,
    section="A122",
    doc=f"Difference-in-differences: EUROPE-region customers as the "
    f"treated group, {_DID_CUT} as the policy cut, order value as the "
    "outcome — DiD = (treated post-pre change) - (control post-pre "
    "change), the parallel-trends estimator that differences away both "
    "the group level AND the common time shock (the workhorse quasi-"
    "experimental design beside A23's CUPED variance reduction and "
    "A108's SRM gate). All four cell means are exact BIGINT-cent sums "
    "over counts (one double division each), and the estimate is one "
    "pinned double expression over them. Scale: one 4-cell keyed agg "
    "over the joined fact — dims broadcast, map-combinable; the pivot "
    "is a 4-row MAX-CASE.",
)
def q_agg_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    labeled = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            F.when(F.col("r_name") == "EUROPE", 1).otherwise(0).alias("treat"),
            F.when(
                F.col("o_orderdate") >= F.lit(_DID_CUT).cast("timestamp"), 1
            )
            .otherwise(0)
            .alias("post"),
            F.expr(
                "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            ).alias("cents"),
        )
    )
    cells = labeled.groupBy("treat", "post").agg(
        F.sum("cents").cast("bigint").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    mean = F.col("s").cast("double") / F.col("n")

    def _cell(t, p):
        return F.max(
            F.when((F.col("treat") == t) & (F.col("post") == p), mean)
        )

    wide = cells.agg(
        _cell(1, 0).alias("m_t_pre"),
        _cell(1, 1).alias("m_t_post"),
        _cell(0, 0).alias("m_c_pre"),
        _cell(0, 1).alias("m_c_post"),
        F.sum("n").cast("bigint").alias("n_total"),
    )
    return wide.select(
        "n_total",
        F.round("m_t_pre", 4).alias("mean_treat_pre_cents"),
        F.round("m_t_post", 4).alias("mean_treat_post_cents"),
        F.round("m_c_pre", 4).alias("mean_ctrl_pre_cents"),
        F.round("m_c_post", 4).alias("mean_ctrl_post_cents"),
        F.round(
            (F.col("m_t_post") - F.col("m_t_pre"))
            - (F.col("m_c_post") - F.col("m_c_pre")),
            4,
        ).alias("did_cents"),
    )

@register(
    "q_agg_stratified_ate",
    oracle="""
        WITH labeled AS (
            SELECT CAST((l_quantity - 1) AS BIGINT) // 10 AS stratum,
                   CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END AS treat,
                   CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS cents
            FROM lineitem
        ),
        cells AS (
            SELECT stratum, treat,
                   CAST(SUM(cents) AS BIGINT) AS s,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM labeled GROUP BY stratum, treat
        ),
        wide AS (
            SELECT stratum,
                   MAX(CASE WHEN treat = 1 THEN n END) AS n_treat,
                   MAX(CASE WHEN treat = 0 THEN n END) AS n_ctrl,
                   MAX(CASE WHEN treat = 1 THEN CAST(s AS DOUBLE) / n END)
                       AS m1,
                   MAX(CASE WHEN treat = 0 THEN CAST(s AS DOUBLE) / n END)
                       AS m0
            FROM cells GROUP BY stratum
            HAVING MAX(CASE WHEN treat = 1 THEN n END) IS NOT NULL
               AND MAX(CASE WHEN treat = 0 THEN n END) IS NOT NULL
        ),
        strata AS (
            SELECT CAST(stratum AS VARCHAR) AS stratum,
                   n_treat, n_ctrl,
                   ROUND(m1, 4) AS mean_treated_cents,
                   ROUND(m0, 4) AS mean_control_cents,
                   ROUND(m1 - m0, 4) AS effect_cents
            FROM wide
        ),
        overall AS (
            SELECT 'ALL' AS stratum,
                   CAST(SUM(n_treat) AS BIGINT) AS n_treat,
                   CAST(SUM(n_ctrl) AS BIGINT) AS n_ctrl,
                   CAST(NULL AS DOUBLE) AS mean_treated_cents,
                   CAST(NULL AS DOUBLE) AS mean_control_cents,
                   ROUND(CAST(SUM(CAST(floor((m1 - m0)
                                    * (n_treat + n_ctrl) * 1e6)
                                 AS BIGINT)) AS DOUBLE) / 1e6
                         / SUM(n_treat + n_ctrl), 4) AS effect_cents
            FROM wide
        )
        SELECT * FROM strata UNION ALL SELECT * FROM overall
    """,
    section="A123",
    doc="Stratified average treatment effect: high-discount (>5%) line "
    "items as 'treated', extended price as outcome, QUANTITY DECILE-"
    "BANDS (5 strata of 10 units) as the confounder blocks — the "
    "stratification estimator that removes quantity's confounding the "
    "way A23 (CUPED) removes pre-period variance: per-stratum "
    "treated/control mean gaps, then the population-weighted pooled "
    "ATE (weights = stratum sizes). Strata missing either arm are "
    "excluded (pinned HAVING on both engines). Cell means are exact "
    "cent sums over counts; the pooled row's weighted sum runs over "
    "<=5 stratum rows. Scale: ONE (stratum, arm) keyed agg over the "
    "fact — map-combinable; everything after is a <=10-row pivot.",
)
def q_agg_stratified_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    labeled = li.select(
        F.expr("CAST((l_quantity - 1) AS BIGINT) DIV 10").alias("stratum"),
        F.when(F.col("l_discount") > 0.05, 1).otherwise(0).alias("treat"),
        F.expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("cents"),
    )
    cells = labeled.groupBy("stratum", "treat").agg(
        F.sum("cents").cast("bigint").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    wide = (
        cells.groupBy("stratum")
        .agg(
            F.max(F.when(F.col("treat") == 1, F.col("n"))).alias("n_treat"),
            F.max(F.when(F.col("treat") == 0, F.col("n"))).alias("n_ctrl"),
            F.max(F.when(F.col("treat") == 1, mean)).alias("m1"),
            F.max(F.when(F.col("treat") == 0, mean)).alias("m0"),
        )
        .where(F.col("n_treat").isNotNull() & F.col("n_ctrl").isNotNull())
    )
    strata = wide.select(
        F.col("stratum").cast("string").alias("stratum"),
        "n_treat",
        "n_ctrl",
        F.round("m1", 4).alias("mean_treated_cents"),
        F.round("m0", 4).alias("mean_control_cents"),
        F.round(F.col("m1") - F.col("m0"), 4).alias("effect_cents"),
    )
    overall = wide.agg(
        F.sum("n_treat").cast("bigint").alias("n_treat"),
        F.sum("n_ctrl").cast("bigint").alias("n_ctrl"),
        F.round(
            F.sum(
                F.floor(
                    (F.col("m1") - F.col("m0"))
                    * (F.col("n_treat") + F.col("n_ctrl"))
                    * F.lit(1e6)
                ).cast("bigint")
            ).cast("double")
            / F.lit(1e6)
            / F.sum(F.col("n_treat") + F.col("n_ctrl")),
            4,
        ).alias("effect_cents"),
    ).select(
        F.lit("ALL").alias("stratum"),
        "n_treat",
        "n_ctrl",
        F.lit(None).cast("double").alias("mean_treated_cents"),
        F.lit(None).cast("double").alias("mean_control_cents"),
        "effect_cents",
    )
    return strata.unionByName(overall)

@register(
    "q_agg_partial_correlation",
    oracle=_pcorr_oracle(),
    section="A124",
    doc="First-order partial correlations over the lineitem numeric "
    "triple: for each pair, the correlation REMAINING after the third "
    "variable is partialled out — r_xy.z = (r_xy - r_xz r_zy)/"
    "sqrt((1-r_xz^2)(1-r_zy^2)), the screen that separates direct "
    "association from common-cause artifacts (A26's raw matrix cannot "
    "distinguish them). Inherits A26's full exactness machinery: one "
    "map-combinable moment vector (exact cent integers, DECIMAL(38,0) "
    "cross-moments, hi/lo 32-bit double reconstruction so DuckDB's "
    "non-correctly-rounded hugeint->double cast never enters), then "
    "every r and the partial combination is ONE fixed IEEE expression "
    "tree evaluated identically on both engines. Scale: one scan, one "
    "1-row shuffle, 3 output rows assembled row-locally.",
)
def q_agg_partial_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cols = _PCORR_COLS
    q = li.select(
        *[
            F.expr(_Q_SPARK.format(c=cols[i])).alias(f"q{i}")
            for i in range(len(cols))
        ]
    )
    # r9 (VERDICT r8 item 1): batched-string expression construction —
    # probe measured 0.89 s build vs 0.03 s exec; same expressions and
    # aliases as SQL strings (one JVM parse each) with the 6-withColumn
    # chain collapsed into one projection. Plan and results identical.
    aggs = ["count(1) as n"]
    for i in range(len(cols)):
        aggs.append(f"sum(q{i}) as s{i}")
        for j in range(i, len(cols)):
            aggs.append(
                f"sum(cast(q{i} * q{j} as decimal(38,0))) as pd{i}{j}"
            )
    m = q.agg(*[F.expr(a) for a in aggs]).selectExpr(
        "*",
        *[
            f"cast(pd{i}{j} div 4294967296 as double) * 4294967296.0d"
            f" + cast(pd{i}{j} % 4294967296 as double) as p{i}{j}"
            for i in range(len(cols))
            for j in range(i, len(cols))
        ],
    ).localCheckpoint(eager=False)

    def r(i: int, j: int) -> str:
        i, j = min(i, j), max(i, j)
        nd, si, sj = (
            "cast(n as double)",
            f"cast(s{i} as double)",
            f"cast(s{j} as double)",
        )
        return (
            f"(({nd} * p{i}{j} - {si} * {sj})"
            f" / (sqrt({nd} * p{i}{i} - {si} * {si})"
            f" * sqrt({nd} * p{j}{j} - {sj} * {sj})))"
        )

    outs = []
    for x, y, z in [(0, 1, 2), (0, 2, 1), (1, 2, 0)]:
        rxy, rxz, rzy = r(x, y), r(x, z), r(z, y)
        outs.append(
            m.selectExpr(
                f"'{cols[x]}' as col_x",
                f"'{cols[y]}' as col_y",
                f"'{cols[z]}' as control",
                "n",
                f"round({rxy}, 6) as r_xy",
                f"round(({rxy} - {rxz} * {rzy})"
                f" / sqrt((1 - {rxz} * {rxz}) * (1 - {rzy} * {rzy})), 6)"
                f" as r_partial",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out

@register(
    "q_agg_tail_dependence",
    oracle="""
        WITH pts AS (
            SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS x,
                   CAST(l_quantity AS BIGINT) AS y
            FROM lineitem
        ),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pts),
        tx AS (
            SELECT MIN(x) AS tx FROM (
                SELECT x, SUM(c) OVER (ORDER BY x
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS cum
                FROM (SELECT x, CAST(COUNT(*) AS BIGINT) AS c
                      FROM pts GROUP BY x)
            ), nn WHERE cum >= (19 * n + 19) // 20
        ),
        ty AS (
            SELECT MIN(y) AS ty FROM (
                SELECT y, SUM(c) OVER (ORDER BY y
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS cum
                FROM (SELECT y, CAST(COUNT(*) AS BIGINT) AS c
                      FROM pts GROUP BY y)
            ), nn WHERE cum >= (19 * n + 19) // 20
        ),
        counts AS (
            SELECT CAST(SUM(CASE WHEN p.x > tx.tx AND p.y > ty.ty
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_joint,
                   CAST(SUM(CASE WHEN p.y > ty.ty THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_cond
            FROM pts p CROSS JOIN tx CROSS JOIN ty
        )
        SELECT CAST(0.95 AS DOUBLE) AS q, tx.tx AS x_threshold, ty.ty AS y_threshold,
               c.n_joint, c.n_cond,
               CASE WHEN c.n_cond = 0 THEN NULL
                    ELSE ROUND(CAST(c.n_joint AS DOUBLE) / c.n_cond, 6)
               END AS lambda_upper
        FROM counts c CROSS JOIN tx CROSS JOIN ty
    """,
    section="A125",
    doc="Empirical upper-tail dependence lambda_U(0.95) between line "
    "price and quantity: P(price exceeds its 95th percentile | "
    "quantity exceeds its own) — the extreme-co-movement gauge that "
    "A26's Pearson and A107's Spearman both miss (they average over "
    "the body; portfolios and capacity plans die in the joint tail). "
    "Thresholds are NEAREST-RANK order statistics via value-grain "
    "cumulative counts (k = ceil(0.95n) as the integer (19n+19) DIV "
    "20 — no float quantile), exceedance is a strict integer compare, "
    "and lambda is one division of two counts. NULL when the "
    "conditioning tail is empty (pinned both engines). Scale: two "
    "value-grain cumulants + one scan with two broadcast scalar "
    "thresholds — no sort of the fact.",
)
def q_agg_tail_dependence(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pts = li.select(
        F.expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("x"),
        F.col("l_quantity").cast("bigint").alias("y"),
    )
    nn = pts.agg(F.count(F.lit(1)).cast("bigint").alias("n"))

    def thresh(col):
        grain = pts.groupBy(col).agg(
            F.count(F.lit(1)).cast("bigint").alias("c")
        )
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, 0)
        cum = grain.select(col, F.sum("c").over(w).alias("cum"))
        return (
            cum.crossJoin(F.broadcast(nn))
            .where(F.col("cum") >= F.expr("(19 * n + 19) DIV 20"))
            .agg(F.min(col).alias(f"t{col}"))
        )

    tx, ty = thresh("x"), thresh("y")
    counts = (
        pts.crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
        .agg(
            F.sum(
                F.when(
                    (F.col("x") > F.col("tx")) & (F.col("y") > F.col("ty")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_joint"),
            F.sum(F.when(F.col("y") > F.col("ty"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_cond"),
            F.max("tx").alias("x_threshold"),
            F.max("ty").alias("y_threshold"),
        )
    )
    return counts.select(
        F.lit(0.95).alias("q"),
        "x_threshold",
        "y_threshold",
        "n_joint",
        "n_cond",
        F.when(
            F.col("n_cond") > 0,
            F.round(
                F.col("n_joint").cast("double") / F.col("n_cond"), 6
            ),
        ).alias("lambda_upper"),
    )

# ==== wave 146: multivariate location test, inequality index =======


@register(
    "q_agg_hotelling_t2",
    oracle="""
        WITH pts AS (
            SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS g,
                   CAST(l_quantity AS BIGINT) AS x,
                   CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS y
            FROM lineitem
        ),
        m AS MATERIALIZED (
            SELECT g,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x * x) AS BIGINT) AS sxx,
                   CAST(CAST(SUM(CAST(y * y AS DECIMAL(38,0))) AS HUGEINT)
                        // 4294967296 AS DOUBLE) * 4294967296.0
                   + CAST(CAST(SUM(CAST(y * y AS DECIMAL(38,0))) AS HUGEINT)
                          % 4294967296 AS DOUBLE) AS syy,
                   CAST(SUM(x * y) AS BIGINT) AS sxy
            FROM pts GROUP BY g
        ),
        f AS (
            SELECT a.n AS n1, b.n AS n2,
                   CAST(a.sx AS DOUBLE) / a.n
                       - CAST(b.sx AS DOUBLE) / b.n AS dx,
                   CAST(a.sy AS DOUBLE) / a.n
                       - CAST(b.sy AS DOUBLE) / b.n AS dy,
                   ((CAST(a.sxx AS DOUBLE)
                     - CAST(a.sx AS DOUBLE) * CAST(a.sx AS DOUBLE) / a.n)
                    + (CAST(b.sxx AS DOUBLE)
                       - CAST(b.sx AS DOUBLE) * CAST(b.sx AS DOUBLE) / b.n))
                   / (a.n + b.n - 2) AS vxx,
                   ((a.syy
                     - CAST(a.sy AS DOUBLE) * CAST(a.sy AS DOUBLE) / a.n)
                    + (b.syy
                       - CAST(b.sy AS DOUBLE) * CAST(b.sy AS DOUBLE) / b.n))
                   / (a.n + b.n - 2) AS vyy,
                   ((CAST(a.sxy AS DOUBLE)
                     - CAST(a.sx AS DOUBLE) * CAST(a.sy AS DOUBLE) / a.n)
                    + (CAST(b.sxy AS DOUBLE)
                       - CAST(b.sx AS DOUBLE) * CAST(b.sy AS DOUBLE) / b.n))
                   / (a.n + b.n - 2) AS vxy
            FROM (SELECT * FROM m WHERE g = 1) a
            CROSS JOIN (SELECT * FROM m WHERE g = 0) b
        )
        SELECT n1, n2,
               ROUND(CAST(n1 AS DOUBLE) * n2 / (n1 + n2)
                     * (dx * (vyy * dx - vxy * dy)
                        + dy * (vxx * dy - vxy * dx))
                     / (vxx * vyy - vxy * vxy), 6) AS t2,
               ROUND(CAST(n1 AS DOUBLE) * n2 / (n1 + n2)
                     * (dx * (vyy * dx - vxy * dy)
                        + dy * (vxx * dy - vxy * dx))
                     / (vxx * vyy - vxy * vxy)
                     * (n1 + n2 - 3)
                     / (2.0 * (n1 + n2 - 2)), 6) AS f_stat
        FROM f
    """,
    section="A126",
    doc="Hotelling's two-sample T^2 on the (quantity, price) mean "
    "vector, returned vs kept lines — the suite's first MULTIVARIATE "
    "location test: unlike running A113-style t-tests per column, "
    "T^2 = (n1 n2/(n1+n2)) d' S_pooled^-1 d respects the correlation "
    "between the two outcomes (a shift along the quantity-price ridge "
    "is judged differently from one across it); the F conversion uses "
    "the exact rational (n-p-1)/(p(n-2)) factor at p = 2. The 2x2 "
    "inverse is closed-form, so everything reduces to exact integer "
    "moments (the y^2 cross-moment exceeds 2^53 and uses A26's hi/lo "
    "32-bit double reconstruction) flowing through one pinned IEEE "
    "tree. Scale: one 2-group moment agg — map-combinable, 1-row "
    "output.",
)
def q_agg_hotelling_t2(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pts = li.select(
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("g"),
        F.col("l_quantity").cast("bigint").alias("x"),
        F.expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("y"),
    )
    # r9 (VERDICT r8 item 1 + guide §2.4): the two group branches were
    # separate filtered slices of a groupBy crossJoined back together.
    # One CASE-pivoted aggregate computes both groups' moments in a
    # single pass (g partitions every row into exactly one group, so the
    # disjoint-subset sums are identical). Expressions are batched SQL
    # strings (r9 construction rewrite).
    hi_lo = (
        "cast({0} div 4294967296 as double) * 4294967296.0d"
        " + cast({0} % 4294967296 as double)"
    )
    aggs = []
    for pre, gv in (("a", 1), ("b", 0)):
        aggs += [
            f"cast(count_if(g = {gv}) as bigint) as {pre}_n",
            f"cast(sum(case when g = {gv} then x end) as bigint)"
            f" as {pre}_sx",
            f"cast(sum(case when g = {gv} then y end) as bigint)"
            f" as {pre}_sy",
            f"cast(sum(case when g = {gv} then x * x end) as bigint)"
            f" as {pre}_sxx",
            f"sum(case when g = {gv} then cast(y * y as decimal(38,0))"
            f" end) as {pre}_syyd",
            f"cast(sum(case when g = {gv} then x * y end) as bigint)"
            f" as {pre}_sxy",
        ]
    j = pts.agg(*[F.expr(a) for a in aggs]).selectExpr(
        "*",
        f"{hi_lo.format('a_syyd')} as a_syy",
        f"{hi_lo.format('b_syyd')} as b_syy",
    )
    dx = "(cast(a_sx as double) / a_n - cast(b_sx as double) / b_n)"
    dy = "(cast(a_sy as double) / a_n - cast(b_sy as double) / b_n)"
    dof = "(a_n + b_n - 2)"
    vxx = (
        "(((cast(a_sxx as double) - cast(a_sx as double)"
        " * cast(a_sx as double) / a_n) + (cast(b_sxx as double)"
        " - cast(b_sx as double) * cast(b_sx as double) / b_n))"
        f" / {dof})"
    )
    vyy = (
        "(((a_syy - cast(a_sy as double) * cast(a_sy as double) / a_n)"
        " + (b_syy - cast(b_sy as double) * cast(b_sy as double) / b_n))"
        f" / {dof})"
    )
    vxy = (
        "(((cast(a_sxy as double) - cast(a_sx as double)"
        " * cast(a_sy as double) / a_n) + (cast(b_sxy as double)"
        " - cast(b_sx as double) * cast(b_sy as double) / b_n))"
        f" / {dof})"
    )
    t2 = (
        f"(cast(a_n as double) * b_n / (a_n + b_n)"
        f" * ({dx} * ({vyy} * {dx} - {vxy} * {dy})"
        f" + {dy} * ({vxx} * {dy} - {vxy} * {dx}))"
        f" / ({vxx} * {vyy} - {vxy} * {vxy}))"
    )
    return j.selectExpr(
        "a_n as n1",
        "b_n as n2",
        f"round({t2}, 6) as t2",
        f"round({t2} * (a_n + b_n - 3) / (2.0d * (a_n + b_n - 2)), 6)"
        f" as f_stat",
    )

@register(
    "q_agg_atkinson",
    oracle="""
        WITH v AS (
            SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS cents
            FROM orders
        ),
        s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(cents) AS BIGINT) AS tot,
                   CAST(SUM(CAST(1000000000000 AS BIGINT) // cents)
                        AS BIGINT) AS recip_q12
            FROM v
        )
        SELECT n,
               ROUND(CAST(tot AS DOUBLE) / n, 4) AS mean_cents,
               ROUND(CAST(n AS DOUBLE) * 1e12 / CAST(recip_q12 AS DOUBLE),
                     4) AS harmonic_mean_cents,
               ROUND(1 - (CAST(n AS DOUBLE) * 1e12
                          / CAST(recip_q12 AS DOUBLE))
                         / (CAST(tot AS DOUBLE) / n), 6)
                   AS atkinson_eps2
        FROM s
    """,
    section="A127",
    doc="Atkinson inequality index at aversion epsilon = 2 over order "
    "values: A(2) = 1 - harmonic_mean/mean — the welfare-founded "
    "inequality measure whose aversion knob A33's Gini lacks (at "
    "eps = 2 it weights the poor end quadratically, so it moves when "
    "the bottom of the distribution moves and Gini barely does). The "
    "determinism device is the INTEGER RECIPROCAL: cents >= 1 are "
    "int64, so each 1e12 DIV cents term is an exact integer division "
    "(no float reciprocal anywhere) and the harmonic mean's "
    "denominator is a pure BIGINT sum — order-insensitive by "
    "construction; the final index is two pinned divisions. Scale: "
    "one map-combinable 3-scalar agg over the fact.",
)
def q_agg_atkinson(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    v = orders.select(
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("cents")
    )
    s = v.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("tot"),
        F.sum(F.expr("CAST(1000000000000 AS BIGINT) DIV cents"))
        .cast("bigint")
        .alias("recip_q12"),
    )
    mean = F.col("tot").cast("double") / F.col("n")
    hmean = F.col("n").cast("double") * F.lit(1e12) / F.col(
        "recip_q12"
    ).cast("double")
    return s.select(
        "n",
        F.round(mean, 4).alias("mean_cents"),
        F.round(hmean, 4).alias("harmonic_mean_cents"),
        F.round(1 - hmean / mean, 6).alias("atkinson_eps2"),
    )

@register(
    "q_agg_survival_rmst",
    oracle=f"""
        WITH gaps AS (
            SELECT date_diff('day', o_orderdate,
                             lead(o_orderdate) OVER (
                                 PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey
                             )) AS gap
            FROM orders
        ),
        ev AS (
            SELECT gap AS t, CAST(COUNT(*) AS BIGINT) AS d
            FROM gaps WHERE gap IS NOT NULL GROUP BY gap
        ),
        km AS (
            SELECT t, d,
                   CAST(SUM(d) OVER () AS BIGINT)
                   - CAST(SUM(d) OVER w AS BIGINT) + d AS n_risk
            FROM ev
            WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)
        ),
        lg AS (
            SELECT t, d, n_risk,
                   CASE WHEN d < n_risk
                        THEN ln(1.0 - CAST(d AS DOUBLE) / n_risk)
                        END AS term,
                   MAX(CASE WHEN d >= n_risk THEN 1 ELSE 0 END) OVER w
                       AS dead
            FROM km
            WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)
        ),
        surv AS (
            SELECT t, dead,
                   CAST(SUM(CAST(floor(term * 1e12) AS DECIMAL(38,0)))
                        OVER w AS BIGINT) AS ls_q12,
                   LEAD(t) OVER (ORDER BY t) AS nxt
            FROM lg
            WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)
        ),
        segs AS (
            SELECT t,
                   CASE WHEN dead = 1 THEN 0.0
                        ELSE exp(CAST(ls_q12 AS DOUBLE) / 1e12) END AS s,
                   GREATEST(LEAST(COALESCE(nxt, {_RMST_TAU}),
                                  {_RMST_TAU}) - t, 0) AS dt
            FROM surv WHERE t < {_RMST_TAU}
        ),
        area AS (
            SELECT CAST(SUM(CAST(floor(s * dt * 1e8) AS BIGINT))
                        AS BIGINT) AS a_q8
            FROM segs WHERE dt > 0
        ),
        head AS (
            SELECT CAST(LEAST(MIN(t), {_RMST_TAU}) AS BIGINT) AS t1
            FROM ev
        ),
        med AS (
            SELECT CAST(MIN(t) AS BIGINT) AS median_t
            FROM surv WHERE dead = 1 OR ls_q12 <= {_LN_HALF_Q12}
        )
        SELECT CAST({_RMST_TAU} AS BIGINT) AS tau_days,
               ROUND(h.t1 + CAST(a.a_q8 AS DOUBLE) / 1e8, 4)
                   AS rmst_days,
               m.median_t AS median_survival_days
        FROM area a CROSS JOIN head h CROSS JOIN med m
    """,
    section="A128",
    doc=f"Restricted mean survival time to tau = {_RMST_TAU} days plus "
    "the median survival time, on A33's Kaplan-Meier curve (customer "
    "inter-order gaps): RMST = area under S(t) up to tau — the "
    "effect measure of choice when hazards are not proportional (a "
    "mean with a guaranteed finite horizon), and the single number "
    "('average days of customer life in the first 60') that the full "
    "A33 curve makes you eyeball. Devices: S(t) comes from the SAME "
    "quantized log-sum as A33 (bit-identical partials), each area "
    "segment floor(S*dt*1e8)-quantizes BEFORE the sum (order-"
    "insensitive), the leading S=1 segment is exact integer days, "
    "and the MEDIAN needs no float compare at all — S <= 1/2 iff the "
    "integer log-sum is <= floor(ln(1/2)*1e12), a Python literal. "
    "Scale: identical to A33 (|customers| lead window, |gaps| curve).",
)
def q_agg_survival_rmst(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    wn = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = orders.select(
        F.datediff(F.lead("o_orderdate").over(wn), F.col("o_orderdate")).alias(
            "gap"
        )
    ).where(F.col("gap").isNotNull())
    ev = gaps.groupBy(F.col("gap").alias("t")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    km = ev.select(
        "t",
        "d",
        (
            F.sum("d").over(wall).cast("bigint")
            - F.sum("d").over(w).cast("bigint")
            + F.col("d")
        ).alias("n_risk"),
    )
    lg = km.select(
        "t",
        "d",
        "n_risk",
        F.when(
            F.col("d") < F.col("n_risk"),
            F.log(F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk")),
        ).alias("term"),
        F.max(
            F.when(F.col("d") >= F.col("n_risk"), 1).otherwise(0)
        )
        .over(w)
        .alias("dead"),
    )
    surv = lg.select(
        "t",
        "dead",
        F.sum(
            F.floor(F.col("term") * F.lit(1e12)).cast(DecimalType(38, 0))
        )
        .over(w)
        .cast("bigint")
        .alias("ls_q12"),
        F.lead("t").over(Window.orderBy("t")).alias("nxt"),
    ).localCheckpoint(eager=False)
    segs = surv.where(F.col("t") < _RMST_TAU).select(
        F.when(F.col("dead") == 1, F.lit(0.0))
        .otherwise(F.exp(F.col("ls_q12").cast("double") / F.lit(1e12)))
        .alias("s"),
        F.greatest(
            F.least(
                F.coalesce(F.col("nxt"), F.lit(_RMST_TAU)),
                F.lit(_RMST_TAU),
            )
            - F.col("t"),
            F.lit(0),
        ).alias("dt"),
    )
    area = segs.where(F.col("dt") > 0).agg(
        F.sum(
            F.floor(F.col("s") * F.col("dt") * F.lit(1e8)).cast("bigint")
        )
        .cast("bigint")
        .alias("a_q8")
    )
    head = ev.agg(
        F.least(F.min("t"), F.lit(_RMST_TAU)).cast("bigint").alias("t1")
    )
    med = surv.where(
        (F.col("dead") == 1) | (F.col("ls_q12") <= F.lit(_LN_HALF_Q12))
    ).agg(F.min("t").cast("bigint").alias("median_t"))
    return (
        area.crossJoin(F.broadcast(head))
        .crossJoin(F.broadcast(med))
        .select(
            F.lit(_RMST_TAU).cast("bigint").alias("tau_days"),
            F.round(
                F.col("t1") + F.col("a_q8").cast("double") / F.lit(1e8), 4
            ).alias("rmst_days"),
            F.col("median_t").alias("median_survival_days"),
        )
    )

# ==== wave 151: classifier panel, modern dependence ================


@register(
    "q_agg_binary_metrics",
    oracle="""
        WITH pred AS (
            SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                       AS y,
                   CASE WHEN value > 150 THEN 1 ELSE 0 END AS p
            FROM events
        ),
        c AS (
            SELECT CAST(SUM(y * p) AS BIGINT) AS tp,
                   CAST(SUM((1 - y) * p) AS BIGINT) AS fp,
                   CAST(SUM(y * (1 - p)) AS BIGINT) AS fn,
                   CAST(SUM((1 - y) * (1 - p)) AS BIGINT) AS tn
            FROM pred
        )
        SELECT tp, fp, fn, tn,
               ROUND(CAST(tp AS DOUBLE) / (tp + fp), 6) AS precision,
               ROUND(CAST(tp AS DOUBLE) / (tp + fn), 6) AS recall,
               ROUND(CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn), 6)
                   AS f1,
               ROUND((CAST(tp AS DOUBLE) * tn
                      - CAST(fp AS DOUBLE) * fn)
                     / sqrt((CAST(tp + fp AS DOUBLE))
                            * (CAST(tp + fn AS DOUBLE))
                            * (CAST(tn + fp AS DOUBLE))
                            * (CAST(tn + fn AS DOUBLE))), 6) AS mcc
        FROM c
    """,
    section="A129",
    doc="The binary-classifier panel (value>150 predicting purchase, "
    "the A57 setup): confusion counts plus precision, recall, F1, and "
    "Matthews correlation — MCC being the one scalar that stays "
    "honest under imbalance AND label inversion (F1 is asymmetric in "
    "the positive class; A119's AP needs scores, this needs only the "
    "hard decision). The panel A58/A119 presuppose but nothing in "
    "the suite emitted directly. Four integer cell counts, four "
    "pinned expressions (the MCC product stays inside double range: "
    "each factor <= n, n^4 <= 1e24 representable). Scale: one "
    "map-combinable 4-scalar agg.",
)
def q_agg_binary_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pred = ev.select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        F.when(F.col("value") > 150, 1).otherwise(0).alias("p"),
    )
    c = pred.agg(
        F.sum(F.col("y") * F.col("p")).cast("bigint").alias("tp"),
        F.sum((1 - F.col("y")) * F.col("p")).cast("bigint").alias("fp"),
        F.sum(F.col("y") * (1 - F.col("p"))).cast("bigint").alias("fn"),
        F.sum((1 - F.col("y")) * (1 - F.col("p")))
        .cast("bigint")
        .alias("tn"),
    )
    tp, fp, fn, tn = (F.col(c_) for c_ in ["tp", "fp", "fn", "tn"])
    return c.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(tp.cast("double") / (tp + fp), 6).alias("precision"),
        F.round(tp.cast("double") / (tp + fn), 6).alias("recall"),
        F.round((2 * tp).cast("double") / (2 * tp + fp + fn), 6).alias(
            "f1"
        ),
        F.round(
            (tp.cast("double") * tn - fp.cast("double") * fn)
            / F.sqrt(
                (tp + fp).cast("double")
                * (tp + fn).cast("double")
                * (tn + fp).cast("double")
                * (tn + fn).cast("double")
            ),
            6,
        ).alias("mcc"),
    )

@register(
    "q_agg_chatterjee_xi",
    oracle="""
        WITH pts AS (
            SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS x,
                   CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00',
                                  o_orderdate) AS BIGINT) AS y,
                   o_orderkey AS k
            FROM orders
        ),
        ranked AS (
            SELECT x, k,
                   CAST(ROW_NUMBER() OVER (ORDER BY y, k) AS BIGINT)
                       AS ry
            FROM pts
        ),
        seq AS (
            SELECT ry,
                   LEAD(ry) OVER (ORDER BY x, k) AS ry_next
            FROM ranked
        ),
        s AS (
            SELECT CAST(SUM(abs(ry_next - ry)) AS BIGINT) AS sum_adj,
                   CAST(COUNT(*) + 1 AS BIGINT) AS n
            FROM seq WHERE ry_next IS NOT NULL
        )
        SELECT n,
               ROUND(1 - CAST(3 * sum_adj AS DOUBLE)
                         / (CAST(n AS DOUBLE) * n - 1), 6) AS xi
        FROM s
    """,
    section="A130",
    doc="Chatterjee's xi correlation (2020) between order value and "
    "order date: xi = 1 - 3 sum|r_(i+1) - r_i| / (n^2 - 1) over "
    "y-ranks taken in x-order — the modern dependence coefficient "
    "that is ~0 iff independent and -> 1 iff y is a measurable "
    "FUNCTION of x, so unlike A26 (linear) and A107 (monotone) it "
    "detects oscillating or V-shaped dependence; its price is "
    "asymmetry (xi(x,y) != xi(y,x)), which is the point — it tests "
    "'does x determine y'. Ranks are strict row_numbers under fully "
    "tie-broken (value, key) orders (the vanishing-tie convention, "
    "pinned identically on both engines); the adjacent-rank sum is "
    "pure int64; one final pinned division. Scale: two ordered "
    "windows over the value grain and a scalar rollup — at cluster "
    "scale both are range-partitioned sorts of narrow int pairs.",
)
def q_agg_chatterjee_xi(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    pts = orders.select(
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("x"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")
        )
        .cast("bigint")
        .alias("y"),
        F.col("o_orderkey").alias("k"),
    )
    # Scale note (r6): both global orderings run on the distributed
    # two-pass rank operator; the lead() over the x-order becomes an
    # rx -> rx+1 self-join on the dense global rank (hash join, parallel)
    # instead of a second single-partition window.
    from ai_to_cvent_etl_spark.operators.ranking import global_row_number

    ranked = global_row_number(
        global_row_number(pts, ["y", "k"], out_col="ry"),
        ["x", "k"],
        out_col="rx",
    ).localCheckpoint(eager=False)
    nxt = ranked.select(
        (F.col("rx") - 1).alias("rx"), F.col("ry").alias("ry_next")
    )
    seq = ranked.select("rx", "ry").join(nxt, "rx", "left")
    s = seq.where(F.col("ry_next").isNotNull()).agg(
        F.sum(F.abs(F.col("ry_next") - F.col("ry")))
        .cast("bigint")
        .alias("sum_adj"),
        (F.count(F.lit(1)) + 1).cast("bigint").alias("n"),
    )
    return s.select(
        "n",
        F.round(
            1
            - (3 * F.col("sum_adj")).cast("double")
            / (F.col("n").cast("double") * F.col("n") - 1),
            6,
        ).alias("xi"),
    )

# ==== wave 152: tail risk and factor exposure ======================


@register(
    "q_agg_expected_shortfall",
    oracle="""
        WITH v AS (
            SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS cents
            FROM orders
        ),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
        thr AS (
            SELECT MIN(cents) AS var95 FROM (
                SELECT cents, SUM(c) OVER (ORDER BY cents
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS cum
                FROM (SELECT cents, CAST(COUNT(*) AS BIGINT) AS c
                      FROM v GROUP BY cents)
            ), nn WHERE cum >= (19 * n + 19) // 20
        ),
        tail AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_tail,
                   CAST(SUM(v.cents) AS BIGINT) AS s_tail
            FROM v CROSS JOIN thr WHERE v.cents >= thr.var95
        )
        SELECT nn.n, thr.var95 AS var95_cents,
               t.n_tail,
               ROUND(CAST(t.s_tail AS DOUBLE) / t.n_tail, 4)
                   AS es95_cents
        FROM nn CROSS JOIN thr CROSS JOIN tail t
    """,
    section="A131",
    doc="Value-at-Risk and Expected Shortfall at the 95th percentile "
    "of order values: VaR as the NEAREST-RANK order statistic "
    "(A125's integer (19n+19) DIV 20 device — no float quantile), "
    "ES as the exact conditional mean AT OR BEYOND it — the "
    "coherent tail-risk pair (ES is subadditive where VaR is not, "
    "which is why Basel moved to it), and the one-variable sibling "
    "of A125's joint tail. All counts and sums are integer cents; "
    "one division. Scale: one value-grain cumulant for the "
    "threshold + one scan with a broadcast scalar — no sort of the "
    "fact.",
)
def q_agg_expected_shortfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    v = orders.select(
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("cents")
    )
    nn = v.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    grain = v.groupBy("cents").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    thr = (
        grain.select("cents", F.sum("c").over(w).alias("cum"))
        .crossJoin(F.broadcast(nn))
        .where(F.col("cum") >= F.expr("(19 * n + 19) DIV 20"))
        .agg(F.min("cents").alias("var95"))
    )
    tail = (
        v.crossJoin(F.broadcast(thr))
        .where(F.col("cents") >= F.col("var95"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tail"),
            F.sum("cents").cast("bigint").alias("s_tail"),
            F.max("var95").alias("var95_cents"),
        )
    )
    return tail.crossJoin(F.broadcast(nn)).select(
        "n",
        "var95_cents",
        "n_tail",
        F.round(
            F.col("s_tail").cast("double") / F.col("n_tail"), 4
        ).alias("es95_cents"),
    )

@register(
    "q_agg_market_beta",
    oracle="""
        WITH monthly AS (
            SELECT n.n_name AS nation,
                   (date_part('year', o.o_orderdate) - 1995) * 12
                   + date_part('month', o.o_orderdate) - 1 AS m,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) AS cents
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1, 2
        ),
        mkt AS (
            SELECT m, CAST(SUM(cents) AS BIGINT) AS mkt_cents
            FROM monthly GROUP BY m
        ),
        paired AS (
            SELECT mo.nation, mo.cents AS y, k.mkt_cents AS x
            FROM monthly mo JOIN mkt k ON mo.m = k.m
        ),
        moments AS (
            SELECT nation,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(CAST(SUM(CAST(x AS DECIMAL(38,0))
                                 * CAST(x AS DECIMAL(38,0))) AS HUGEINT)
                        // 4294967296 AS DOUBLE) * 4294967296.0
                   + CAST(CAST(SUM(CAST(x AS DECIMAL(38,0))
                                   * CAST(x AS DECIMAL(38,0))) AS HUGEINT)
                          % 4294967296 AS DOUBLE) AS sxx,
                   CAST(CAST(SUM(CAST(x AS DECIMAL(38,0))
                                 * CAST(y AS DECIMAL(38,0))) AS HUGEINT)
                        // 4294967296 AS DOUBLE) * 4294967296.0
                   + CAST(CAST(SUM(CAST(x AS DECIMAL(38,0))
                                   * CAST(y AS DECIMAL(38,0))) AS HUGEINT)
                          % 4294967296 AS DOUBLE) AS sxy
            FROM paired GROUP BY nation
        )
        SELECT nation, n,
               ROUND((CAST(n AS DOUBLE) * sxy
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (CAST(n AS DOUBLE) * sxx
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
                   AS beta,
               ROUND((CAST(sy AS DOUBLE)
                      - (CAST(n AS DOUBLE) * sxy
                         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                        / (CAST(n AS DOUBLE) * sxx
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * CAST(sx AS DOUBLE)) / n, 4) AS alpha_cents
        FROM moments
    """,
    section="A132",
    doc="Per-nation market beta: each nation's monthly revenue "
    "regressed on the TOTAL market's monthly revenue — beta > 1 "
    "nations amplify the aggregate cycle, beta ~ 0 nations are "
    "idiosyncratic; with the alpha intercept this is the one-factor "
    "exposure model (CAPM shape) as a grouped closed-form OLS, the "
    "panel complement of W33's cross-sectional momentum. The x^2 "
    "and xy cross-moments exceed 2^53 (market cents ~ 1e10 squared), "
    "so both engines rebuild the doubles with A26's hi/lo 32-bit "
    "device over DECIMAL(38,0) sums; slope/intercept are pinned "
    "IEEE. Scale: the factor series is a broadcast |months|-row "
    "table; one (nation, month) agg + one nation-grain moment agg.",
)
def q_agg_market_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    mo = (F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate") - 1
    monthly = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), mo.alias("m"))
        .agg(
            F.expr(
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 "
                "AS BIGINT)"
            ).alias("cents")
        )
    ).localCheckpoint(eager=False)
    mkt = monthly.groupBy("m").agg(
        F.sum("cents").cast("bigint").alias("mkt_cents")
    )
    paired = monthly.join(F.broadcast(mkt), "m").select(
        "nation",
        F.col("cents").alias("y"),
        F.col("mkt_cents").alias("x"),
    )
    # r9 (VERDICT r8 item 1): batched-string expression construction —
    # same expressions/aliases, identical plan and results.
    hi_lo = (
        "cast({0} div 4294967296 as double) * 4294967296.0d"
        " + cast({0} % 4294967296 as double)"
    )
    moments = paired.groupBy("nation").agg(
        *[
            F.expr(a)
            for a in (
                "cast(count(1) as bigint) as n",
                "cast(sum(x) as bigint) as sx",
                "cast(sum(y) as bigint) as sy",
                "sum(cast(x as decimal(38,0)) * cast(x as decimal(38,0)))"
                " as sxxd",
                "sum(cast(x as decimal(38,0)) * cast(y as decimal(38,0)))"
                " as sxyd",
            )
        ]
    ).selectExpr(
        "*",
        f"{hi_lo.format('sxxd')} as sxx",
        f"{hi_lo.format('sxyd')} as sxy",
    )
    beta = (
        "((cast(n as double) * sxy - cast(sx as double) * cast(sy as"
        " double)) / (cast(n as double) * sxx - cast(sx as double)"
        " * cast(sx as double)))"
    )
    return moments.selectExpr(
        "nation",
        "n",
        f"round({beta}, 6) as beta",
        f"round((cast(sy as double) - {beta} * cast(sx as double)) / n,"
        f" 4) as alpha_cents",
    )

# ==== wave 153: instrumental variables, gap decomposition ==========


@register(
    "q_agg_iv_wald",
    oracle="""
        WITH pts AS (
            SELECT o.o_orderkey,
                   CAST(substring(o.o_orderpriority, 1, 1) AS BIGINT) AS z,
                   CAST(date_diff('day', o.o_orderdate, MAX(l.l_shipdate))
                        AS BIGINT) AS x,
                   CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS y
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate,
                     o.o_totalprice
            HAVING MAX(l.l_shipdate) >= o.o_orderdate
        ),
        m AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(z) AS BIGINT) AS sz,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(z * z) AS BIGINT) AS szz,
                   CAST(SUM(z * x) AS BIGINT) AS szx,
                   CAST(SUM(z * y) AS BIGINT) AS szy,
                   CAST(SUM(x * x) AS BIGINT) AS sxx,
                   CAST(SUM(x * y) AS BIGINT) AS sxy
            FROM pts
        )
        SELECT n,
               ROUND((CAST(n AS DOUBLE) * sxy
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (CAST(n AS DOUBLE) * sxx
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
                   AS beta_ols,
               ROUND((CAST(n AS DOUBLE) * szy
                      - CAST(sz AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (CAST(n AS DOUBLE) * szx
                        - CAST(sz AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
                   AS beta_iv,
               ROUND((CAST(n AS DOUBLE) * szx
                      - CAST(sz AS DOUBLE) * CAST(sx AS DOUBLE))
                     / (CAST(n AS DOUBLE) * szz
                        - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)), 6)
                   AS first_stage_slope
        FROM m
    """,
    section="A133",
    doc="Instrumental-variable (Wald/2SLS, one instrument) estimate of "
    "fulfillment delay's effect on order value: priority class (the "
    "digit) instruments the delay — beta_IV = cov(z,y)/cov(z,x), "
    "reported NEXT TO the naive OLS slope so the confounding bias is "
    "visible as their gap, plus the first-stage slope (instrument "
    "strength; near-zero => weak-instrument territory and beta_IV is "
    "garbage). Completes the causal toolkit: A122 DiD (parallel "
    "trends), A123 stratification (observables), TS34 ITS (pre-"
    "trend), now IV (exclusion restriction). All moments are exact "
    "BIGINTs at the order grain (delay <= ~2.5k days, z <= 5 — far "
    "under int64); the three ratios are pinned IEEE. Scale: one "
    "order-grain agg (max shipdate per order) + one 9-scalar "
    "map-combinable moment agg.",
)
def q_agg_iv_wald(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pts = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderpriority", "o_orderdate", "o_totalprice")
        .agg(F.max("l_shipdate").alias("dep"))
        .where(F.col("dep") >= F.col("o_orderdate"))
        .select(
            F.substring("o_orderpriority", 1, 1).cast("bigint").alias("z"),
            F.datediff("dep", "o_orderdate").cast("bigint").alias("x"),
            F.expr(
                "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            ).alias("y"),
        )
    )
    m = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("z").cast("bigint").alias("sz"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("z") * F.col("z")).cast("bigint").alias("szz"),
        F.sum(F.col("z") * F.col("x")).cast("bigint").alias("szx"),
        F.sum(F.col("z") * F.col("y")).cast("bigint").alias("szy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    nd = F.col("n").cast("double")

    def cov(sab, sa, sb):
        return nd * F.col(sab) - F.col(sa).cast("double") * F.col(
            sb
        ).cast("double")

    return m.select(
        "n",
        F.round(cov("sxy", "sx", "sy") / cov("sxx", "sx", "sx"), 6).alias(
            "beta_ols"
        ),
        F.round(cov("szy", "sz", "sy") / cov("szx", "sz", "sx"), 6).alias(
            "beta_iv"
        ),
        F.round(cov("szx", "sz", "sx") / cov("szz", "sz", "sz"), 6).alias(
            "first_stage_slope"
        ),
    )

@register(
    "q_agg_oaxaca_blinder",
    oracle="""
        WITH pts AS (
            SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS g,
                   CAST(l_quantity AS BIGINT) AS x,
                   CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS y
            FROM lineitem
        ),
        m AS MATERIALIZED (
            SELECT g,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x * x) AS BIGINT) AS sxx,
                   CAST(SUM(x * y) AS BIGINT) AS sxy
            FROM pts GROUP BY g
        ),
        fits AS (
            SELECT g, n,
                   CAST(sx AS DOUBLE) / n AS mx,
                   CAST(sy AS DOUBLE) / n AS my,
                   (CAST(n AS DOUBLE) * sxy
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (CAST(n AS DOUBLE) * sxx
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b
            FROM m
        )
        SELECT a.n AS n_a, b2.n AS n_b,
               ROUND(a.my - b2.my, 4) AS total_gap_cents,
               ROUND((a.mx - b2.mx) * b2.b, 4) AS endowment_cents,
               ROUND(a.mx * (a.b - b2.b)
                     + ((a.my - a.b * a.mx)
                        - (b2.my - b2.b * b2.mx)), 4)
                   AS coefficient_cents
        FROM (SELECT * FROM fits WHERE g = 1) a
        CROSS JOIN (SELECT * FROM fits WHERE g = 0) b2
    """,
    section="A134",
    doc="Oaxaca-Blinder decomposition of the returned-vs-kept price "
    "gap: mean price difference split into the ENDOWMENT part "
    "((x̄_A - x̄_B)·β_B — returned lines ship different quantities) "
    "and the COEFFICIENT part (x̄_A(β_A - β_B) + Δintercept — the "
    "price-per-quantity relationship itself differs), using the "
    "two-fold decomposition with group B coefficients as reference. "
    "The audit-the-gap operator (pay equity, conversion gaps) that "
    "A122/A123 don't cover: it explains a DESCRIPTIVE difference "
    "rather than estimating a causal effect, and the two parts sum "
    "exactly to the total gap by construction — a built-in checksum. "
    "Group fits are closed-form simple OLS over exact integer "
    "moments; every reported number is a pinned IEEE expression. "
    "Scale: one 2-group moment agg, a 1x1 cross join.",
)
def q_agg_oaxaca_blinder(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pts = li.select(
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("g"),
        F.col("l_quantity").cast("bigint").alias("x"),
        F.expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("y"),
    )
    m = pts.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    nd = F.col("n").cast("double")
    mx = F.col("sx").cast("double") / F.col("n")
    my = F.col("sy").cast("double") / F.col("n")
    b = (nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy").cast("double")) / (
        nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    fits = m.select(
        "g", "n", mx.alias("mx"), my.alias("my"), b.alias("b")
    )
    a = fits.where(F.col("g") == 1).select(
        *[F.col(c).alias(f"a_{c}") for c in ["n", "mx", "my", "b"]]
    )
    bb = fits.where(F.col("g") == 0).select(
        *[F.col(c).alias(f"b_{c}") for c in ["n", "mx", "my", "b"]]
    )
    j = a.crossJoin(bb)
    return j.select(
        F.col("a_n").alias("n_a"),
        F.col("b_n").alias("n_b"),
        F.round(F.col("a_my") - F.col("b_my"), 4).alias("total_gap_cents"),
        F.round(
            (F.col("a_mx") - F.col("b_mx")) * F.col("b_b"), 4
        ).alias("endowment_cents"),
        F.round(
            F.col("a_mx") * (F.col("a_b") - F.col("b_b"))
            + (
                (F.col("a_my") - F.col("a_b") * F.col("a_mx"))
                - (F.col("b_my") - F.col("b_b") * F.col("b_mx"))
            ),
            4,
        ).alias("coefficient_cents"),
    )

@register(
    "q_agg_fisher_index",
    oracle=f"""
        WITH py AS (
            SELECT l_partkey,
                   date_part('year', l_shipdate) AS yr,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) AS value_cents,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
            FROM lineitem
            WHERE date_part('year', l_shipdate) IN ({_IDX_Y0}, {_IDX_Y1})
            GROUP BY 1, 2
        ),
        paired AS (
            SELECT a.l_partkey,
                   a.value_cents AS v0, a.qty AS q0,
                   b.value_cents AS v1, b.qty AS q1
            FROM (SELECT * FROM py WHERE yr = {_IDX_Y0}) a
            JOIN (SELECT * FROM py WHERE yr = {_IDX_Y1}) b
              USING (l_partkey)
            WHERE a.qty > 0 AND b.qty > 0
        ),
        s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
                   CAST(SUM(v1 * q0) AS BIGINT) AS s_p1q0,
                   CAST(SUM(v0 * q1) AS BIGINT) AS s_p0q1,
                   CAST(SUM(v0 * q0) AS BIGINT) AS s_p0q0,
                   CAST(SUM(v1 * q1) AS BIGINT) AS s_p1q1
            FROM paired
        )
        SELECT n_parts,
               ROUND(CAST(s_p1q0 AS DOUBLE) / s_p0q0, 6) AS laspeyres,
               ROUND(CAST(s_p1q1 AS DOUBLE) / s_p0q1, 6) AS paasche,
               ROUND(sqrt((CAST(s_p1q0 AS DOUBLE) / s_p0q0)
                          * (CAST(s_p1q1 AS DOUBLE) / s_p0q1)), 6)
                   AS fisher
        FROM s
    """,
    section="A135",
    doc=f"Laspeyres / Paasche / Fisher price indices, {_IDX_Y0} -> "
    f"{_IDX_Y1}, over parts traded in BOTH years: with per-(part, "
    "year) unit values p = value/qty, Laspeyres weights by base-year "
    "baskets (Σp1q0/Σp0q0), Paasche by current baskets, Fisher is "
    "their geometric mean — the index-number triad of every CPI/PPI "
    "shop, and the deflator a revenue 'growth' claim should be "
    "divided by. Exactness: unit values (v/q, ragged rationals) "
    "never materialize — the indices here are defined on per-part "
    "period VALUES as the price proxy (the unit-value index "
    "convention, documented): v1·q0 / v0·q0 and v1·q1 / v0·q1, so "
    "every basket sum is an int64 product of cents x quantity "
    "(<= 1e7 * 1e5 per part — safe), "
    "one division each, sqrt IEEE. Scale: one (part, year) agg, one "
    "part-grain join, one scalar rollup.",
)
def q_agg_fisher_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    py = (
        li.where(F.year("l_shipdate").isin(_IDX_Y0, _IDX_Y1))
        .groupBy("l_partkey", F.year("l_shipdate").alias("yr"))
        .agg(
            F.expr(
                "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 "
                "AS BIGINT)"
            ).alias("value_cents"),
            F.sum(F.col("l_quantity").cast("bigint"))
            .cast("bigint")
            .alias("qty"),
        )
    )
    a = py.where(F.col("yr") == _IDX_Y0).select(
        "l_partkey",
        F.col("value_cents").alias("v0"),
        F.col("qty").alias("q0"),
    )
    b = py.where(F.col("yr") == _IDX_Y1).select(
        "l_partkey",
        F.col("value_cents").alias("v1"),
        F.col("qty").alias("q1"),
    )
    paired = a.join(b, "l_partkey").where(
        (F.col("q0") > 0) & (F.col("q1") > 0)
    )
    s = paired.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.sum(F.col("v1") * F.col("q0")).cast("bigint").alias("s_p1q0"),
        F.sum(F.col("v0") * F.col("q1")).cast("bigint").alias("s_p0q1"),
        F.sum(F.col("v0") * F.col("q0")).cast("bigint").alias("s_p0q0"),
        F.sum(F.col("v1") * F.col("q1")).cast("bigint").alias("s_p1q1"),
    )
    lasp = F.col("s_p1q0").cast("double") / F.col("s_p0q0")
    paas = F.col("s_p1q1").cast("double") / F.col("s_p0q1")
    return s.select(
        "n_parts",
        F.round(lasp, 6).alias("laspeyres"),
        F.round(paas, 6).alias("paasche"),
        F.round(F.sqrt(lasp * paas), 6).alias("fisher"),
    )

# ==== wave 156: mediation and inequality decomposition =============


@register(
    "q_agg_mediation",
    oracle="""
        WITH pts AS (
            SELECT CAST(substring(o.o_orderpriority, 1, 1) AS BIGINT) AS z,
                   CAST(date_diff('day', o.o_orderdate, MAX(l.l_shipdate))
                        AS BIGINT) AS m,
                   CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS y
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate,
                     o.o_totalprice
            HAVING MAX(l.l_shipdate) >= o.o_orderdate
        ),
        mo AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(z) AS BIGINT) AS sz,
                   CAST(SUM(m) AS BIGINT) AS sm,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(z * z) AS BIGINT) AS szz,
                   CAST(SUM(z * m) AS BIGINT) AS szm,
                   CAST(SUM(z * y) AS BIGINT) AS szy,
                   CAST(SUM(m * m) AS BIGINT) AS smm,
                   CAST(SUM(m * y) AS BIGINT) AS smy
            FROM pts
        ),
        c AS (
            SELECT n,
                   CAST(n AS DOUBLE) * szz
                       - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE) AS czz,
                   CAST(n AS DOUBLE) * szm
                       - CAST(sz AS DOUBLE) * CAST(sm AS DOUBLE) AS czm,
                   CAST(n AS DOUBLE) * szy
                       - CAST(sz AS DOUBLE) * CAST(sy AS DOUBLE) AS czy,
                   CAST(n AS DOUBLE) * smm
                       - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE) AS cmm,
                   CAST(n AS DOUBLE) * smy
                       - CAST(sm AS DOUBLE) * CAST(sy AS DOUBLE) AS cmy
            FROM mo
        )
        SELECT n,
               ROUND(czm / czz, 6) AS a_path,
               ROUND((czz * cmy - czm * czy) / (czz * cmm - czm * czm), 6)
                   AS b_path,
               ROUND(czy / czz, 6) AS total_effect,
               ROUND((czm / czz)
                     * ((czz * cmy - czm * czy)
                        / (czz * cmm - czm * czm)), 6) AS indirect_effect,
               ROUND((czm / czz)
                     * ((czz * cmy - czm * czy)
                        / (czz * cmm - czm * czm))
                     / (czy / czz), 6) AS prop_mediated
        FROM c
    """,
    section="A136",
    doc="Mediation analysis (product-of-coefficients) on the A133 "
    "triple: how much of priority's effect on order value flows "
    "THROUGH fulfillment delay? a = slope(delay ~ priority), b = "
    "delay's partial coefficient in value ~ priority + delay (the "
    "two-regressor closed form via centered co-moments — no matrix "
    "solve), indirect = a*b, and the proportion mediated against the "
    "total effect; the identity total = direct + indirect holds by "
    "OLS algebra, making the row self-checking. Completes the "
    "causal-mechanism axis the toolkit lacked: A133 asks 'is the "
    "effect real', this asks 'through WHAT does it act'. All "
    "co-moments are exact int64; every path is a pinned IEEE ratio. "
    "Scale: one order-grain agg + one 9-scalar moment agg (shared "
    "shape with A133 — AQE reuses the exchange when both run).",
)
def q_agg_mediation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pts = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy(
            "o_orderkey", "o_orderpriority", "o_orderdate", "o_totalprice"
        )
        .agg(F.max("l_shipdate").alias("dep"))
        .where(F.col("dep") >= F.col("o_orderdate"))
        .select(
            F.substring("o_orderpriority", 1, 1).cast("bigint").alias("z"),
            F.datediff("dep", "o_orderdate").cast("bigint").alias("m"),
            F.expr(
                "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            ).alias("y"),
        )
    )
    mo = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("z").cast("bigint").alias("sz"),
        F.sum("m").cast("bigint").alias("sm"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("z") * F.col("z")).cast("bigint").alias("szz"),
        F.sum(F.col("z") * F.col("m")).cast("bigint").alias("szm"),
        F.sum(F.col("z") * F.col("y")).cast("bigint").alias("szy"),
        F.sum(F.col("m") * F.col("m")).cast("bigint").alias("smm"),
        F.sum(F.col("m") * F.col("y")).cast("bigint").alias("smy"),
    )
    nd = F.col("n").cast("double")

    def cm(sab, sa, sb):
        return nd * F.col(sab) - F.col(sa).cast("double") * F.col(
            sb
        ).cast("double")

    czz = cm("szz", "sz", "sz")
    czm = cm("szm", "sz", "sm")
    czy = cm("szy", "sz", "sy")
    cmm = cm("smm", "sm", "sm")
    cmy = cm("smy", "sm", "sy")
    a = czm / czz
    b = (czz * cmy - czm * czy) / (czz * cmm - czm * czm)
    total = czy / czz
    return mo.select(
        "n",
        F.round(a, 6).alias("a_path"),
        F.round(b, 6).alias("b_path"),
        F.round(total, 6).alias("total_effect"),
        F.round(a * b, 6).alias("indirect_effect"),
        F.round(a * b / total, 6).alias("prop_mediated"),
    )

@register(
    "q_agg_theil_decomposition",
    oracle="""
        WITH v AS (
            SELECT n.n_name AS g,
                   CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS x
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS s
            FROM v
        ),
        t_total AS (
            SELECT CAST(SUM(CAST(floor(
                       (CAST(x AS DOUBLE) / (CAST(s AS DOUBLE) / n))
                       * ln(CAST(x AS DOUBLE) / (CAST(s AS DOUBLE) / n))
                       * 1e12) AS BIGINT)) AS BIGINT) AS q
            FROM v CROSS JOIN tot
        ),
        grp AS (
            SELECT g, CAST(COUNT(*) AS BIGINT) AS ng,
                   CAST(SUM(x) AS BIGINT) AS sg
            FROM v GROUP BY g
        ),
        t_between AS (
            SELECT CAST(SUM(CAST(floor(
                       (CAST(sg AS DOUBLE) / s)
                       * ln((CAST(sg AS DOUBLE) / ng)
                            / (CAST(s AS DOUBLE) / n))
                       * 1e12) AS BIGINT)) AS BIGINT) AS q
            FROM grp CROSS JOIN tot
        )
        SELECT t.n,
               ROUND(CAST(tt.q AS DOUBLE) / 1e12 / t.n, 6) AS theil_total,
               ROUND(CAST(tb.q AS DOUBLE) / 1e12, 6) AS theil_between,
               ROUND(CAST(tt.q AS DOUBLE) / 1e12 / t.n
                     - CAST(tb.q AS DOUBLE) / 1e12, 6) AS theil_within
        FROM tot t CROSS JOIN t_total tt CROSS JOIN t_between tb
    """,
    section="A137",
    doc="Theil T decomposition of order-value inequality by customer "
    "nation: T_total = T_between + T_within — the additive split that "
    "is Theil's entire reason to exist over Gini (A54's doc promises "
    "it; this delivers it): T_between asks 'are nations unequal "
    "relative to each other', T_within (reported as the exact "
    "difference, so additivity holds by construction) asks 'is "
    "inequality inside nations'. Per-row r·ln r terms and per-group "
    "share·ln(mean ratio) terms are floor(x·1e12)-quantized BEFORE "
    "their sums (A54's device), so both components are order-"
    "insensitive integer sums with one descale each. Scale: one "
    "fact pass + one 25-row group pass; dims broadcast.",
)
def q_agg_theil_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    v = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("g"),
            F.expr(
                "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            ).alias("x"),
        )
    ).localCheckpoint(eager=False)
    tot = v.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
    )
    mu = F.col("s").cast("double") / F.col("n")
    r = F.col("x").cast("double") / mu
    t_total = (
        v.crossJoin(F.broadcast(tot))
        .select(
            F.floor(r * F.log(r) * F.lit(1e12)).cast("bigint").alias("t")
        )
        .agg(F.sum("t").cast("bigint").alias("q_total"))
    )
    grp = v.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("ng"),
        F.sum("x").cast("bigint").alias("sg"),
    )
    share = F.col("sg").cast("double") / F.col("s")
    mean_ratio = (F.col("sg").cast("double") / F.col("ng")) / (
        F.col("s").cast("double") / F.col("n")
    )
    t_between = (
        grp.crossJoin(F.broadcast(tot))
        .select(
            F.floor(share * F.log(mean_ratio) * F.lit(1e12))
            .cast("bigint")
            .alias("t")
        )
        .agg(F.sum("t").cast("bigint").alias("q_between"))
    )
    out = (
        tot.crossJoin(F.broadcast(t_total))
        .crossJoin(F.broadcast(t_between))
    )
    tt = F.col("q_total").cast("double") / F.lit(1e12) / F.col("n")
    tb = F.col("q_between").cast("double") / F.lit(1e12)
    return out.select(
        "n",
        F.round(tt, 6).alias("theil_total"),
        F.round(tb, 6).alias("theil_between"),
        F.round(tt - tb, 6).alias("theil_within"),
    )

# ==== wave 158: uplift evaluation, social choice ===================


@register(
    "q_agg_qini_curve",
    oracle="""
        WITH pts AS (
            SELECT CASE WHEN CAST(('0x' || substr(md5(
                            CAST(event_id AS VARCHAR)), 1, 12)) AS BIGINT)
                        % 2 = 0 THEN 1 ELSE 0 END AS treat,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                       AS resp,
                   CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
                       AS score,
                   event_id
            FROM events
        ),
        ranked AS (
            SELECT treat, resp,
                   NTILE(10) OVER (ORDER BY score DESC, event_id)
                       AS decile
            FROM pts
        ),
        cells AS (
            SELECT decile,
                   CAST(SUM(treat) AS BIGINT) AS nt,
                   CAST(SUM(1 - treat) AS BIGINT) AS nc,
                   CAST(SUM(treat * resp) AS BIGINT) AS rt,
                   CAST(SUM((1 - treat) * resp) AS BIGINT) AS rc
            FROM ranked GROUP BY decile
        ),
        cum AS (
            SELECT decile,
                   SUM(nt) OVER w AS cnt, SUM(nc) OVER w AS cnc,
                   SUM(rt) OVER w AS crt, SUM(rc) OVER w AS crc
            FROM cells
            WINDOW w AS (ORDER BY decile
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        )
        SELECT CAST(decile AS BIGINT) AS decile,
               CAST(cnt AS BIGINT) AS cum_treated,
               CAST(cnc AS BIGINT) AS cum_control,
               CAST(crt AS BIGINT) AS cum_treated_resp,
               CAST(crc AS BIGINT) AS cum_control_resp,
               ROUND(crt - CAST(crc AS DOUBLE) * cnt / cnc, 4)
                   AS qini_uplift
        FROM cum
    """,
    section="A138",
    doc="Qini curve by score decile: events split into a reproducible "
    "hash-half 'treatment' and control, ranked by the value score, "
    "and at each cumulative decile the Qini uplift crt - crc·(nt/nc) "
    "— incremental responses the targeting captured beyond the "
    "control baseline at the same depth. THE evaluation curve for "
    "uplift/targeting models, which A119's average precision cannot "
    "replace (AP scores response prediction; Qini scores INCREMENTAL "
    "response — a model can ace one and fail the other). Decile "
    "assignment is NTILE under a fully tie-broken (score, event_id) "
    "order; all masses are integer; the control-scaling term is one "
    "pinned double per row. Scale: one decile agg + a 10-row "
    "cumulative window.",
)
def q_agg_qini_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        (
            F.expr(
                "cast(conv(substr(md5(cast(event_id as string)), 1, 12), "
                "16, 10) as bigint)"
            )
            % 2
            == 0
        )
        .cast("int")
        .alias("treat"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "resp"
        ),
        F.expr(
            "CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)"
        ).alias("score"),
        "event_id",
    )
    # Scale note (r6): NTILE(10) over a global order single-tasks the
    # corpus; compute it arithmetically from the distributed global row
    # number instead.
    from ai_to_cvent_etl_spark.operators.ranking import (
        global_row_number,
        ntile_from_rn,
    )

    npts = pts.agg(F.count(F.lit(1)).alias("__n"))
    ranked = (
        global_row_number(
            pts, [F.col("score").desc(), F.col("event_id")], out_col="_grn"
        )
        .crossJoin(F.broadcast(npts))
        .select(
            "treat",
            "resp",
            ntile_from_rn(F.col("_grn"), F.col("__n"), 10)
            .cast("int")
            .alias("decile"),
        )
    )
    cells = ranked.groupBy("decile").agg(
        F.sum("treat").cast("bigint").alias("nt"),
        F.sum(1 - F.col("treat")).cast("bigint").alias("nc"),
        F.sum(F.col("treat") * F.col("resp")).cast("bigint").alias("rt"),
        F.sum((1 - F.col("treat")) * F.col("resp"))
        .cast("bigint")
        .alias("rc"),
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    cum = cells.select(
        "decile",
        F.sum("nt").over(w).alias("cnt"),
        F.sum("nc").over(w).alias("cnc"),
        F.sum("rt").over(w).alias("crt"),
        F.sum("rc").over(w).alias("crc"),
    )
    return cum.select(
        F.col("decile").cast("bigint").alias("decile"),
        F.col("cnt").cast("bigint").alias("cum_treated"),
        F.col("cnc").cast("bigint").alias("cum_control"),
        F.col("crt").cast("bigint").alias("cum_treated_resp"),
        F.col("crc").cast("bigint").alias("cum_control_resp"),
        F.round(
            F.col("crt")
            - F.col("crc").cast("double") * F.col("cnt") / F.col("cnc"),
            4,
        ).alias("qini_uplift"),
    )

@register(
    "q_agg_borda_copeland",
    oracle="""
        WITH monthly AS (
            SELECT n.n_name AS nation,
                   (date_part('year', o.o_orderdate) - 1995) * 12
                   + date_part('month', o.o_orderdate) - 1 AS m,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) AS cents
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1, 2
        ),
        ranked AS (
            SELECT nation, m,
                   CAST(COUNT(*) OVER (PARTITION BY m) AS BIGINT) AS k,
                   CAST(RANK() OVER (PARTITION BY m
                                     ORDER BY cents DESC, nation)
                        AS BIGINT) AS r
            FROM monthly
        ),
        borda AS (
            SELECT nation,
                   CAST(SUM(k - r) AS BIGINT) AS borda_score,
                   CAST(COUNT(*) AS BIGINT) AS n_months
            FROM ranked GROUP BY nation
        ),
        duels AS (
            SELECT a.nation AS na, b.nation AS nb,
                   CAST(SUM(CASE WHEN a.cents > b.cents THEN 1
                                 WHEN a.cents < b.cents THEN -1
                                 ELSE 0 END) AS BIGINT) AS net
            FROM monthly a JOIN monthly b
              ON a.m = b.m AND a.nation < b.nation
            GROUP BY 1, 2
        ),
        copeland AS (
            SELECT nation, CAST(SUM(pts) AS BIGINT) AS copeland_score
            FROM (
                SELECT na AS nation,
                       CASE WHEN net > 0 THEN 2 WHEN net = 0 THEN 1
                            ELSE 0 END AS pts
                FROM duels
                UNION ALL
                SELECT nb,
                       CASE WHEN net < 0 THEN 2 WHEN net = 0 THEN 1
                            ELSE 0 END
                FROM duels
            ) GROUP BY nation
        )
        SELECT b.nation, b.n_months, b.borda_score, c.copeland_score
        FROM borda b JOIN copeland c USING (nation)
    """,
    section="A139",
    doc="Social-choice league table over nations: each month is a "
    "'voter' ranking nations by revenue — Borda score (k - rank "
    "summed across months; positional consensus) and Copeland score "
    "(2 points per pairwise head-to-head majority across months, 1 "
    "per exact tie; majority consensus). The two aggregation rules "
    "disagree precisely when a nation is consistently mid-table vs "
    "spiky — which is why ranking-aggregation literature keeps both; "
    "A73's D'Hondt is the seat-allocation member of this family. "
    "Month-ranks carry full (cents DESC, nation) tie-breaks; duels "
    "compare exact cents per month with the doubled-points device "
    "keeping ties integer. Scale: ranks are per-month windows on the "
    "(nation x month) grain; duels join the same grain on m — both "
    "calendar-bounded, never fact-sized.",
)
def q_agg_borda_copeland(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    mo = (F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate") - 1
    monthly = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), mo.alias("m"))
        .agg(
            F.expr(
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 "
                "AS BIGINT)"
            ).alias("cents")
        )
    ).localCheckpoint(eager=False)
    wm = Window.partitionBy("m")
    ranked = monthly.select(
        "nation",
        "m",
        F.count(F.lit(1)).over(wm).cast("bigint").alias("k"),
        F.rank()
        .over(wm.orderBy(F.col("cents").desc(), F.col("nation")))
        .cast("bigint")
        .alias("r"),
    )
    borda = ranked.groupBy("nation").agg(
        F.sum(F.col("k") - F.col("r")).cast("bigint").alias("borda_score"),
        F.count(F.lit(1)).cast("bigint").alias("n_months"),
    )
    a = monthly.select(
        F.col("nation").alias("na"), "m", F.col("cents").alias("ca")
    )
    b = monthly.select(
        F.col("nation").alias("nb"),
        F.col("m").alias("m2"),
        F.col("cents").alias("cb"),
    )
    duels = (
        a.join(b, (F.col("m") == F.col("m2")) & (F.col("na") < F.col("nb")))
        .groupBy("na", "nb")
        .agg(
            F.sum(
                F.when(F.col("ca") > F.col("cb"), 1)
                .when(F.col("ca") < F.col("cb"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("net")
        )
    )
    pts_a = duels.select(
        F.col("na").alias("nation"),
        F.when(F.col("net") > 0, 2)
        .when(F.col("net") == 0, 1)
        .otherwise(0)
        .alias("pts"),
    )
    pts_b = duels.select(
        F.col("nb").alias("nation"),
        F.when(F.col("net") < 0, 2)
        .when(F.col("net") == 0, 1)
        .otherwise(0)
        .alias("pts"),
    )
    copeland = (
        pts_a.unionByName(pts_b)
        .groupBy("nation")
        .agg(F.sum("pts").cast("bigint").alias("copeland_score"))
    )
    return borda.join(copeland, "nation").select(
        "nation", "n_months", "borda_score", "copeland_score"
    )

# ==== wave 159: standardized ratios, credibility shrinkage =========


@register(
    "q_agg_smr",
    oracle="""
        WITH pts AS (
            SELECT n.n_name AS nation,
                   CAST((l.l_quantity - 1) AS BIGINT) // 10 AS stratum,
                   CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS ev
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
        ),
        ref AS (
            SELECT stratum,
                   CAST(SUM(ev) AS BIGINT) AS r_s,
                   CAST(COUNT(*) AS BIGINT) AS n_s
            FROM pts GROUP BY stratum
        ),
        cell AS (
            SELECT nation, stratum,
                   CAST(COUNT(*) AS BIGINT) AS n_ns,
                   CAST(SUM(ev) AS BIGINT) AS o_ns
            FROM pts GROUP BY nation, stratum
        ),
        agg AS (
            SELECT c.nation,
                   CAST(SUM(c.o_ns) AS BIGINT) AS observed,
                   CAST(SUM(c.n_ns) AS BIGINT) AS exposure,
                   CAST(SUM(CAST(floor(CAST(c.n_ns AS DOUBLE) * r.r_s
                                       / r.n_s * 1e6) AS BIGINT))
                        AS BIGINT) AS expected_q6
            FROM cell c JOIN ref r USING (stratum)
            GROUP BY c.nation
        )
        SELECT nation, exposure, observed,
               ROUND(CAST(expected_q6 AS DOUBLE) / 1e6, 4) AS expected,
               ROUND(CAST(observed AS DOUBLE) * 1e6 / expected_q6, 6)
                   AS smr
        FROM agg
    """,
    section="A140",
    doc="Standardized morbidity/return ratio per nation (indirect "
    "standardization): expected returns = each nation's quantity-band "
    "exposure times the CORPUS-WIDE band return rate, SMR = observed/"
    "expected — the case-mix-adjusted league table that raw return "
    "rates get wrong when nations ship different quantity profiles "
    "(A45's Mantel-Haenszel tests the adjusted association; SMR "
    "REPORTS the adjusted burden per group, which is what ops teams "
    "rank by). The per-cell expected term n_ns·r_s/n_s is a ragged "
    "rational, floor(x·1e6)-quantized BEFORE the per-nation sum "
    "(int64, order-insensitive); the SMR division runs on the "
    "quantized integer so no boundary rides a float. Scale: one "
    "(nation, band) agg + a broadcast 5-row reference-rate table.",
)
def q_agg_smr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    pts = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.expr("CAST((l_quantity - 1) AS BIGINT) DIV 10").alias(
                "stratum"
            ),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("ev"),
        )
    )
    ref = pts.groupBy("stratum").agg(
        F.sum("ev").cast("bigint").alias("r_s"),
        F.count(F.lit(1)).cast("bigint").alias("n_s"),
    )
    cell = pts.groupBy("nation", "stratum").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ns"),
        F.sum("ev").cast("bigint").alias("o_ns"),
    )
    agg = (
        cell.join(F.broadcast(ref), "stratum")
        .groupBy("nation")
        .agg(
            F.sum("o_ns").cast("bigint").alias("observed"),
            F.sum("n_ns").cast("bigint").alias("exposure"),
            F.sum(
                F.floor(
                    F.col("n_ns").cast("double")
                    * F.col("r_s")
                    / F.col("n_s")
                    * F.lit(1e6)
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("expected_q6"),
        )
    )
    return agg.select(
        "nation",
        "exposure",
        "observed",
        F.round(F.col("expected_q6").cast("double") / F.lit(1e6), 4).alias(
            "expected"
        ),
        F.round(
            F.col("observed").cast("double")
            * F.lit(1e6)
            / F.col("expected_q6"),
            6,
        ).alias("smr"),
    )

@register(
    "q_agg_buhlmann_credibility",
    oracle="""
        WITH v AS (
            SELECT n.n_name AS g,
                   CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS x
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
        ),
        grp AS MATERIALIZED (
            SELECT g,
                   CAST(COUNT(*) AS BIGINT) AS ng,
                   CAST(SUM(x) AS BIGINT) AS sg,
                   CAST(CAST(SUM(CAST(x AS DECIMAL(38,0))
                                 * CAST(x AS DECIMAL(38,0))) AS HUGEINT)
                        // 4294967296 AS DOUBLE) * 4294967296.0
                   + CAST(CAST(SUM(CAST(x AS DECIMAL(38,0))
                                   * CAST(x AS DECIMAL(38,0))) AS HUGEINT)
                          % 4294967296 AS DOUBLE) AS sqq
            FROM v GROUP BY g
        ),
        tot AS (
            SELECT CAST(SUM(ng) AS BIGINT) AS n,
                   CAST(SUM(sg) AS BIGINT) AS s,
                   CAST(COUNT(*) AS BIGINT) AS k
            FROM grp
        ),
        within AS (
            SELECT CAST(SUM(CAST(floor(
                       (sqq - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / ng)
                       / 1e4) AS BIGINT)) AS BIGINT) AS ssw_int,
                   CAST(SUM(ng - 1) AS BIGINT) AS dfw
            FROM grp
        ),
        between_ AS (
            SELECT CAST(SUM(CAST(floor(
                       ng * (CAST(sg AS DOUBLE) / ng
                             - CAST(t.s AS DOUBLE) / t.n)
                          * (CAST(sg AS DOUBLE) / ng
                             - CAST(t.s AS DOUBLE) / t.n) / 1e4)
                       AS BIGINT)) AS BIGINT) AS ssb_int
            FROM grp CROSS JOIN tot t
        )
        SELECT g.g AS nation, g.ng AS n_orders,
               ROUND(CAST(g.sg AS DOUBLE) / g.ng, 4) AS raw_mean_cents,
               ROUND(CAST(g.ng AS DOUBLE)
                     / (g.ng + (CAST(w.ssw_int AS DOUBLE) / w.dfw)
                        / ((CAST(b.ssb_int AS DOUBLE) / (t.k - 1)
                            - (CAST(w.ssw_int AS DOUBLE) / w.dfw)
                              * 1.0)
                           / (CAST(t.n AS DOUBLE) / t.k))), 6)
                   AS credibility_z,
               ROUND(CAST(g.ng AS DOUBLE)
                     / (g.ng + (CAST(w.ssw_int AS DOUBLE) / w.dfw)
                        / ((CAST(b.ssb_int AS DOUBLE) / (t.k - 1)
                            - (CAST(w.ssw_int AS DOUBLE) / w.dfw)
                              * 1.0)
                           / (CAST(t.n AS DOUBLE) / t.k)))
                     * (CAST(g.sg AS DOUBLE) / g.ng)
                     + (1 - CAST(g.ng AS DOUBLE)
                          / (g.ng + (CAST(w.ssw_int AS DOUBLE) / w.dfw)
                             / ((CAST(b.ssb_int AS DOUBLE) / (t.k - 1)
                                 - (CAST(w.ssw_int AS DOUBLE) / w.dfw)
                                   * 1.0)
                                / (CAST(t.n AS DOUBLE) / t.k))))
                       * (CAST(t.s AS DOUBLE) / t.n), 4)
                   AS credibility_premium_cents
        FROM grp g CROSS JOIN tot t CROSS JOIN within w
        CROSS JOIN between_ b
    """,
    section="A141",
    doc="Bühlmann credibility premiums per nation: Z_i = n_i/(n_i + "
    "K) with K = (within-group variance) / (between-group variance "
    "of means), premium = Z·own mean + (1-Z)·collective mean — the "
    "actuarial shrinkage estimator (the A112 chain-ladder's "
    "rate-setting sibling, and the principled version of 'small "
    "nations borrow strength from the book'). Method-of-moments K "
    "from the one-way ANOVA decomposition: within SS per group and "
    "weighted between SS are computed from exact moments (x^2 via "
    "the hi/lo device), each floor-quantized to integer 1e4-cents^2 "
    "units before the cross-group sums (cents^2 alone overflows "
    "int64 at sf0.1 — the common 1e-4 scale cancels in K) so both "
    "variance components are "
    "order-insensitive; all ratios are pinned IEEE. Scale: one "
    "group-moment agg + scalar rollups; dims broadcast.",
)
def q_agg_buhlmann_credibility(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    v = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("g"),
            F.expr(
                "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            ).alias("x"),
        )
    )
    grp = (
        v.groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("ng"),
            F.sum("x").cast("bigint").alias("sg"),
            F.sum(
                F.col("x").cast(DecimalType(38, 0))
                * F.col("x").cast(DecimalType(38, 0))
            ).alias("sqqd"),
        )
        .withColumn(
            "sqq",
            F.expr(
                "cast(sqqd div 4294967296 as double) * 4294967296.0d"
                " + cast(sqqd % 4294967296 as double)"
            ),
        )
        .localCheckpoint(eager=False)
    )
    tot = grp.agg(
        F.sum("ng").cast("bigint").alias("n"),
        F.sum("sg").cast("bigint").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    within = grp.agg(
        F.sum(
            F.floor(
                (
                    F.col("sqq")
                    - F.col("sg").cast("double")
                    * F.col("sg").cast("double")
                    / F.col("ng")
                )
                / F.lit(1e4)
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("ssw_int"),
        F.sum(F.col("ng") - 1).cast("bigint").alias("dfw"),
    )
    between = (
        grp.crossJoin(F.broadcast(tot))
        .select(
            F.floor(
                F.col("ng")
                * (
                    F.col("sg").cast("double") / F.col("ng")
                    - F.col("s").cast("double") / F.col("n")
                )
                * (
                    F.col("sg").cast("double") / F.col("ng")
                    - F.col("s").cast("double") / F.col("n")
                )
                / F.lit(1e4)
            )
            .cast("bigint")
            .alias("t")
        )
        .agg(F.sum("t").cast("bigint").alias("ssb_int"))
    )
    j = (
        grp.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(within))
        .crossJoin(F.broadcast(between))
    )
    s2w = F.col("ssw_int").cast("double") / F.col("dfw")
    var_means = (
        F.col("ssb_int").cast("double") / (F.col("k") - 1) - s2w * F.lit(1.0)
    ) / (F.col("n").cast("double") / F.col("k"))
    kk = s2w / var_means
    z = F.col("ng").cast("double") / (F.col("ng") + kk)
    own = F.col("sg").cast("double") / F.col("ng")
    grand = F.col("s").cast("double") / F.col("n")
    return j.select(
        F.col("g").alias("nation"),
        F.col("ng").alias("n_orders"),
        F.round(own, 4).alias("raw_mean_cents"),
        F.round(z, 6).alias("credibility_z"),
        F.round(z * own + (1 - z) * grand, 4).alias(
            "credibility_premium_cents"
        ),
    )

# ==== wave 162b: cooperative cost allocation =======================


@register(
    "q_agg_airport_shapley",
    oracle="""
        WITH demand AS (
            SELECT r.r_name AS region,
                   CAST(MAX(mc) AS BIGINT) AS peak_cents
            FROM (
                SELECT c.c_nationkey,
                       (date_part('year', o.o_orderdate) - 1995) * 12
                       + date_part('month', o.o_orderdate) - 1 AS m,
                       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))
                            * 100 AS BIGINT) AS mc
                FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                GROUP BY 1, 2
            ) x
            JOIN nation n ON x.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY r.r_name
        ),
        ranked AS (
            SELECT region, peak_cents,
                   CAST(ROW_NUMBER() OVER (ORDER BY peak_cents, region)
                        AS BIGINT) AS j,
                   CAST(COUNT(*) OVER () AS BIGINT) AS k,
                   CAST(COALESCE(LAG(peak_cents) OVER (
                       ORDER BY peak_cents, region), 0) AS BIGINT) AS prev
            FROM demand
        ),
        phi AS (
            SELECT region, peak_cents, j, k,
                   CAST(SUM((peak_cents - prev) * 60 / (k - j + 1))
                        OVER (ORDER BY j
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS BIGINT) AS phi60
            FROM ranked
        )
        SELECT region, peak_cents,
               ROUND(CAST(phi60 AS DOUBLE) / 60, 4) AS shapley_cents,
               ROUND(CAST(phi60 AS DOUBLE) / 60
                     / (SELECT MAX(peak_cents) FROM demand), 6)
                   AS cost_share
        FROM phi
    """,
    section="A142",
    doc="Airport-game Shapley cost allocation across the five regions: "
    "the shared 'runway' is capacity sized to the LARGEST region's "
    "peak monthly revenue, and each region's fair share of that "
    "capacity cost is the Shapley value — which for max-type cost "
    "functions has the exact closed form phi_i = sum_(j<=i) "
    "(d_j - d_(j-1))/(n-j+1) over ascending demands (each increment "
    "is split equally among everyone who needs it): the canonical "
    "cooperative-game allocation, complementing A44's Hamilton "
    "largest-remainder (proportional) with the marginal-contribution "
    "principle, and A106's Shapley-R2 (regression attribution) with "
    "the cost-sharing original. Determinism: increments x 60 are "
    "divisible by every denominator 1..5 (the G12 LCM device), so "
    "phi60 is an exact integer cumulative; efficiency (sum phi = "
    "max demand) holds by telescoping — self-checking. Scale: 5-row "
    "game after one (nation, month) agg.",
)
def q_agg_airport_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    mo = (F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate") - 1
    natmonth = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_nationkey", mo.alias("m"))
        .agg(
            F.expr(
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 "
                "AS BIGINT)"
            ).alias("mc")
        )
    )
    demand = (
        natmonth.join(
            F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"))
        .agg(F.max("mc").cast("bigint").alias("peak_cents"))
    )
    wr = Window.orderBy("peak_cents", "region")
    wall = Window.partitionBy()
    ranked = demand.select(
        "region",
        "peak_cents",
        F.row_number().over(wr).cast("bigint").alias("j"),
        F.count(F.lit(1)).over(wall).cast("bigint").alias("k"),
        F.coalesce(F.lag("peak_cents").over(wr), F.lit(0))
        .cast("bigint")
        .alias("prev"),
    )
    wcum = Window.orderBy("j").rowsBetween(Window.unboundedPreceding, 0)
    phi = ranked.select(
        "region",
        "peak_cents",
        F.sum(
            (F.col("peak_cents") - F.col("prev"))
            * 60
            / (F.col("k") - F.col("j") + 1)
        )
        .over(wcum)
        .cast("bigint")
        .alias("phi60"),
    )
    mx = demand.agg(F.max("peak_cents").alias("max_demand"))
    return phi.crossJoin(F.broadcast(mx)).select(
        "region",
        "peak_cents",
        F.round(F.col("phi60").cast("double") / 60, 4).alias(
            "shapley_cents"
        ),
        F.round(
            F.col("phi60").cast("double") / 60 / F.col("max_demand"), 6
        ).alias("cost_share"),
    )

# ==== wave 164a: newsvendor critical-ratio stocking =================


@register(
    "q_agg_newsvendor",
    oracle="""
        WITH daily AS (
            SELECT p.p_brand AS brand,
                   CAST(l.l_shipdate AS DATE) AS d,
                   CAST(SUM(CAST(floor(l.l_quantity) AS BIGINT))
                        AS BIGINT) AS dem
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY 1, 2
        ),
        levels AS (
            SELECT brand, dem, CAST(COUNT(*) AS BIGINT) AS days
            FROM daily GROUP BY brand, dem
        ),
        cum AS (
            SELECT brand, dem, days,
                   SUM(days) OVER (PARTITION BY brand ORDER BY dem
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cd,
                   SUM(days) OVER (PARTITION BY brand) AS n_days
            FROM levels
        ),
        qstar AS (
            SELECT brand, CAST(MIN(n_days) AS BIGINT) AS n_days,
                   CAST(MIN(dem) AS BIGINT) AS q_star
            FROM cum WHERE 4 * cd >= 3 * n_days
            GROUP BY brand
        )
        SELECT q.brand, q.n_days, q.q_star,
               CAST(SUM(GREATEST(q.q_star - d.dem, 0)) AS BIGINT)
                   AS over_units,
               CAST(SUM(GREATEST(d.dem - q.q_star, 0)) AS BIGINT)
                   AS under_units,
               CAST(SUM(GREATEST(q.q_star - d.dem, 0))
                    + 3 * SUM(GREATEST(d.dem - q.q_star, 0)) AS BIGINT)
                   AS cost_units
        FROM qstar q JOIN daily d ON q.brand = d.brand
        GROUP BY q.brand, q.n_days, q.q_star
    """,
    section="A143",
    doc="Newsvendor critical-ratio stocking per brand: with underage "
    "cost 3 and overage cost 1 the optimal stock is the 3/4 quantile "
    "of the empirical daily-demand distribution — q* = the smallest "
    "demand level whose cumulative day count clears 4*cd >= 3*n (the "
    "A121/W38 weighted nearest-rank device, here with days as the "
    "weights), then the realized over/under unit balance and total "
    "cost of stocking q* every day. All integer (l_quantity floors "
    "to BIGINT — floor, never a bare cast: DuckDB rounds double-> "
    "BIGINT half-even while Spark truncates). Scale: one (brand, "
    "day) agg, level-grain windows per 25-brand partition, and the "
    "q* join back to daily broadcasts a 25-row table.",
)
def q_agg_newsvendor(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    daily = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("l_shipdate").cast("date").alias("d"),
        )
        .agg(
            F.sum(F.floor("l_quantity").cast("bigint"))
            .cast("bigint")
            .alias("dem")
        )
        .localCheckpoint(eager=False)
    )
    levels = daily.groupBy("brand", "dem").agg(
        F.count(F.lit(1)).cast("bigint").alias("days")
    )
    wcum = (
        Window.partitionBy("brand")
        .orderBy("dem")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("brand")
    cum = levels.select(
        "brand",
        "dem",
        F.sum("days").over(wcum).alias("cd"),
        F.sum("days").over(wall).alias("n_days"),
    )
    qstar = (
        cum.where(4 * F.col("cd") >= 3 * F.col("n_days"))
        .groupBy("brand")
        .agg(
            F.min("n_days").cast("bigint").alias("n_days"),
            F.min("dem").cast("bigint").alias("q_star"),
        )
    )
    over = F.greatest(F.col("q_star") - F.col("dem"), F.lit(0))
    under = F.greatest(F.col("dem") - F.col("q_star"), F.lit(0))
    return (
        daily.join(F.broadcast(qstar), "brand")
        .groupBy("brand", "n_days", "q_star")
        .agg(
            F.sum(over).cast("bigint").alias("over_units"),
            F.sum(under).cast("bigint").alias("under_units"),
            (F.sum(over) + 3 * F.sum(under)).cast("bigint").alias(
                "cost_units"
            ),
        )
    )

# ==== wave 164/165: SPC process-capability indices ==================


@register(
    "q_agg_process_capability",
    oracle="""
        WITH q AS (
            SELECT p.p_brand AS brand,
                   CAST(floor(l.l_quantity) AS BIGINT) AS x
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        ),
        mom AS (
            SELECT brand,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(x * x) AS BIGINT) AS sxx,
                   CAST(SUM(CASE WHEN x < 5 OR x > 45 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_oos
            FROM q GROUP BY brand
        )
        SELECT brand, n, n_oos,
               ROUND(CAST(sx AS DOUBLE) / n, 6) AS mean_qty,
               ROUND(sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                          / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))),
                     6) AS sd_qty,
               ROUND(40.0
                     / (6.0 * sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                          / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))),
                     6) AS cp,
               ROUND(LEAST(45.0 - CAST(sx AS DOUBLE) / n,
                           CAST(sx AS DOUBLE) / n - 5.0)
                     / (3.0 * sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                          / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))),
                     6) AS cpk
        FROM mom
    """,
    section="A144",
    doc="SPC process-capability indices per brand over order "
    "quantities against spec limits [5, 45]: Cp = (USL-LSL)/6s "
    "measures the process spread vs the spec band, Cpk = "
    "min(USL-mu, mu-LSL)/3s additionally penalizes de-centering — "
    "the manufacturing acceptance complement of TS16's SPC run "
    "rules (which watch the chart; this grades the process). "
    "Quantities floor to BIGINT so n/sx/sxx/n_oos are exact integer "
    "moments (sxx <= 2500 per row — far under 2^53); mean, sample "
    "sd, Cp, Cpk rebuild from one pinned IEEE expression per "
    "column (div, sub, sqrt, least are all correctly rounded). "
    "Scale: one map-side-combinable keyed agg to 25 rows; the "
    "broadcast part join is the only other shuffle input.",
)
def q_agg_process_capability(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    q = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        F.col("p_brand").alias("brand"),
        F.floor("l_quantity").cast("bigint").alias("x"),
    )
    mom = q.groupBy("brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(
            F.when((F.col("x") < 5) | (F.col("x") > 45), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_oos"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    sxxd = F.col("sxx").cast("double")
    mean = sxd / F.col("n")
    sd = F.sqrt((nd * sxxd - sxd * sxd) / (nd * (nd - F.lit(1.0))))
    return mom.select(
        "brand",
        "n",
        "n_oos",
        F.round(mean, 6).alias("mean_qty"),
        F.round(sd, 6).alias("sd_qty"),
        F.round(F.lit(40.0) / (F.lit(6.0) * sd), 6).alias("cp"),
        F.round(
            F.least(F.lit(45.0) - mean, mean - F.lit(5.0))
            / (F.lit(3.0) * sd),
            6,
        ).alias("cpk"),
    )

# ==== wave 167a: Bradley-Terry pairwise-preference ranking ==========


@register(
    "q_agg_bradley_terry",
    oracle="""
        WITH bq AS (
            SELECT l.l_orderkey AS ok, p.p_brand AS brand,
                   CAST(SUM(CAST(floor(l.l_quantity) AS BIGINT)) AS BIGINT)
                       AS q
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY 1, 2
        ),
        duels AS (
            SELECT CASE WHEN a.q > b.q THEN a.brand ELSE b.brand END AS w,
                   CASE WHEN a.q > b.q THEN b.brand ELSE a.brand END AS l
            FROM bq a JOIN bq b
              ON a.ok = b.ok AND a.brand < b.brand AND a.q <> b.q
        ),
        wins AS (
            SELECT w AS brand, CAST(COUNT(*) AS BIGINT) AS wi
            FROM duels GROUP BY w
        ),
        games AS (
            SELECT brand, CAST(SUM(c) AS BIGINT) AS ni FROM (
                SELECT w AS brand, COUNT(*) AS c FROM duels GROUP BY w
                UNION ALL
                SELECT l AS brand, COUNT(*) AS c FROM duels GROUP BY l
            ) GROUP BY brand
        ),
        nmat AS (
            SELECT brand_i, brand_j, CAST(SUM(c) AS BIGINT) AS nij FROM (
                SELECT w AS brand_i, l AS brand_j, COUNT(*) AS c
                FROM duels GROUP BY w, l
                UNION ALL
                SELECT l AS brand_i, w AS brand_j, COUNT(*) AS c
                FROM duels GROUP BY l, w
            ) GROUP BY brand_i, brand_j
        ),
        p1 AS (
            SELECT g.brand,
                   COALESCE(2.0 * w.wi, 0.0) / g.ni AS p
            FROM games g LEFT JOIN wins w ON g.brand = w.brand
        ),
        terms AS (
            SELECT m.brand_i AS brand,
                   CAST(SUM(CAST(floor(CAST(m.nij AS DOUBLE)
                                       / (pi.p + pj.p)
                                       * 1048576.0) AS BIGINT))
                        AS BIGINT) AS s
            FROM nmat m
            JOIN p1 pi ON m.brand_i = pi.brand
            JOIN p1 pj ON m.brand_j = pj.brand
            GROUP BY m.brand_i
        ),
        p2 AS (
            SELECT t.brand,
                   g.ni,
                   COALESCE(w.wi, 0) AS wi,
                   p1.p AS p_it1,
                   COALESCE(CAST(w.wi AS DOUBLE), 0.0) * 1048576.0
                       / CAST(t.s AS DOUBLE) AS p
            FROM terms t
            JOIN games g ON t.brand = g.brand
            JOIN p1 ON t.brand = p1.brand
            LEFT JOIN wins w ON t.brand = w.brand
        )
        SELECT brand, wi AS wins, ni AS n_games,
               ROUND(p_it1, 6) AS p_iter1,
               ROUND(p, 6) AS p_iter2,
               CAST(ROW_NUMBER() OVER (ORDER BY p DESC, brand) AS BIGINT)
                   AS bt_rank
        FROM p2
    """,
    section="A145",
    doc="Bradley-Terry preference strengths across brands from "
    "within-order quantity duels (brand A beats brand B when the "
    "same order carries more of A), fit with TWO unrolled MM "
    "iterations from the uniform start: iteration 1 collapses to "
    "the exact rational 2*W_i/N_i (one IEEE division), iteration "
    "2's denominator sum_j n_ij/(p_i+p_j) is order-sensitive in "
    "doubles so each term is quantized floor(term * 2^20) and "
    "summed as BIGINT — exact under any partitioning — then the "
    "strength rebuilds as W_i * 2^20 / S_i, one pinned expression "
    "per engine. Ties are excluded from wins AND games (standard "
    "BT). Scale: duels aggregate to a <=600-row directed matrix; "
    "both MM rounds are joins over that tiny broadcastable table — "
    "corpus-size work is one keyed agg + one within-order pair "
    "join bounded by brands-per-order.",
)
def q_agg_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    bq = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("brand"))
        .agg(
            F.sum(F.floor("l_quantity").cast("bigint"))
            .cast("bigint")
            .alias("q")
        )
    )
    a = bq.alias("a")
    b = bq.alias("b")
    duels = (
        a.join(
            b,
            (F.col("a.ok") == F.col("b.ok"))
            & (F.col("a.brand") < F.col("b.brand"))
            & (F.col("a.q") != F.col("b.q")),
        )
        .select(
            F.when(F.col("a.q") > F.col("b.q"), F.col("a.brand"))
            .otherwise(F.col("b.brand"))
            .alias("w"),
            F.when(F.col("a.q") > F.col("b.q"), F.col("b.brand"))
            .otherwise(F.col("a.brand"))
            .alias("l"),
        )
        .localCheckpoint(eager=False)
    )
    dir_counts = duels.groupBy("w", "l").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    # r9 (guide §2.3 aggregate-before-shuffle): wins used to be a SECOND
    # full aggregation pass over the (order x brand-pair)-sized duels
    # frame; it is exactly the w-marginal of dir_counts (<= |brands|^2
    # rows) — same integer counts, one duel pass instead of two.
    wins = dir_counts.groupBy(F.col("w").alias("brand")).agg(
        F.sum("c").cast("bigint").alias("wi")
    )
    games = (
        dir_counts.select(F.col("w").alias("brand"), "c")
        .unionByName(dir_counts.select(F.col("l").alias("brand"), "c"))
        .groupBy("brand")
        .agg(F.sum("c").cast("bigint").alias("ni"))
    )
    nmat = (
        dir_counts.select(
            F.col("w").alias("brand_i"), F.col("l").alias("brand_j"), "c"
        )
        .unionByName(
            dir_counts.select(
                F.col("l").alias("brand_i"), F.col("w").alias("brand_j"), "c"
            )
        )
        .groupBy("brand_i", "brand_j")
        .agg(F.sum("c").cast("bigint").alias("nij"))
    )
    p1 = games.join(wins, "brand", "left").select(
        "brand",
        (
            F.coalesce(F.lit(2.0) * F.col("wi"), F.lit(0.0)) / F.col("ni")
        ).alias("p"),
    )
    terms = (
        nmat.join(
            F.broadcast(p1.select(F.col("brand").alias("brand_i"), F.col("p").alias("pi"))),
            "brand_i",
        )
        .join(
            F.broadcast(p1.select(F.col("brand").alias("brand_j"), F.col("p").alias("pj"))),
            "brand_j",
        )
        .groupBy(F.col("brand_i").alias("brand"))
        .agg(
            F.sum(
                F.floor(
                    F.col("nij").cast("double")
                    / (F.col("pi") + F.col("pj"))
                    * F.lit(1048576.0)
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("s")
        )
    )
    p2 = (
        terms.join(games, "brand")
        .join(p1.withColumnRenamed("p", "p_it1"), "brand")
        .join(wins, "brand", "left")
        .select(
            "brand",
            F.coalesce(F.col("wi"), F.lit(0)).cast("bigint").alias("wins"),
            F.col("ni").alias("n_games"),
            "p_it1",
            (
                F.coalesce(F.col("wi").cast("double"), F.lit(0.0))
                * F.lit(1048576.0)
                / F.col("s").cast("double")
            ).alias("p"),
        )
    )
    return p2.select(
        "brand",
        "wins",
        "n_games",
        F.round("p_it1", 6).alias("p_iter1"),
        F.round("p", 6).alias("p_iter2"),
        F.row_number()
        .over(Window.orderBy(F.col("p").desc(), F.col("brand")))
        .cast("bigint")
        .alias("bt_rank"),
    )

# ==== wave 168b: h-index / g-index productivity profile =============


@register(
    "q_agg_h_index",
    oracle="""
        WITH oc AS (
            SELECT n.n_name AS nation, c.c_custkey,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1, 2
        ),
        ranked AS (
            SELECT nation, n_orders,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY nation
                       ORDER BY n_orders DESC, c_custkey
                   ) AS BIGINT) AS rn,
                   CAST(SUM(n_orders) OVER (
                       PARTITION BY nation
                       ORDER BY n_orders DESC, c_custkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS cum_orders
            FROM oc
        )
        SELECT nation,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(MAX(CASE WHEN n_orders >= rn THEN rn ELSE 0 END)
                    AS BIGINT) AS h_index,
               CAST(MAX(CASE WHEN cum_orders >= rn * rn THEN rn ELSE 0 END)
                    AS BIGINT) AS g_index,
               CAST(SUM(n_orders) AS BIGINT) AS total_orders
        FROM ranked
        GROUP BY nation
    """,
    section="A146",
    doc="h-index and g-index per nation over customer order counts: "
    "h = the largest k such that k customers each placed >= k "
    "orders (the bibliometric core-productivity statistic), g = the "
    "largest g such that the top-g customers together placed >= g^2 "
    "(Egghe's tail-weighted refinement, computed from the running "
    "cumulative on the SAME descending rank) — both reduce to "
    "integer compares between a row_number and a count, fully "
    "tie-broken by (n_orders DESC, custkey). Scale: one keyed agg "
    "to customer grain, one window sort per nation, one final "
    "25-row agg; no joins beyond the broadcast dims.",
)
def q_agg_h_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    oc = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), "c_custkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
    )
    wr = Window.partitionBy("nation").orderBy(
        F.col("n_orders").desc(), F.col("c_custkey")
    )
    ranked = oc.select(
        "nation",
        "n_orders",
        F.row_number().over(wr).cast("bigint").alias("rn"),
        F.sum("n_orders")
        .over(wr.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("cum_orders"),
    )
    return ranked.groupBy("nation").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.max(
            F.when(F.col("n_orders") >= F.col("rn"), F.col("rn")).otherwise(
                F.lit(0)
            )
        )
        .cast("bigint")
        .alias("h_index"),
        F.max(
            F.when(
                F.col("cum_orders") >= F.col("rn") * F.col("rn"), F.col("rn")
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("g_index"),
        F.sum("n_orders").cast("bigint").alias("total_orders"),
    )

# ==== wave 170a: Bass diffusion model fit ===========================


@register(
    "q_agg_bass_diffusion",
    oracle="""
        WITH first_order AS (
            SELECT o_custkey,
                   MIN(CAST(o_orderdate AS DATE)) AS fd
            FROM orders GROUP BY o_custkey
        ),
        adopters AS (
            SELECT fd, CAST(COUNT(*) AS BIGINT) AS n_t
            FROM first_order GROUP BY fd
        ),
        cum AS (
            SELECT fd, n_t,
                   CAST(SUM(n_t) OVER (ORDER BY fd
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        - n_t AS BIGINT) AS x
            FROM adopters
        ),
        mom AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(x * x) AS BIGINT) AS sx2,
                   CAST(SUM(n_t) AS BIGINT) AS sy,
                   CAST(SUM(x * n_t) AS BIGINT) AS sxy,
                   CAST(CAST(SUM(CAST(x AS DECIMAL(38,0))
                                 * CAST(x AS DECIMAL(38,0))
                                 * CAST(x AS DECIMAL(38,0))) AS HUGEINT)
                        // 4294967296 AS DOUBLE) * 4294967296.0
                   + CAST(CAST(SUM(CAST(x AS DECIMAL(38,0))
                                   * CAST(x AS DECIMAL(38,0))
                                   * CAST(x AS DECIMAL(38,0))) AS HUGEINT)
                          % 4294967296 AS DOUBLE) AS sx3,
                   CAST(CAST(SUM(CAST(x AS DECIMAL(38,0))
                                 * CAST(x AS DECIMAL(38,0))
                                 * CAST(x AS DECIMAL(38,0))
                                 * CAST(x AS DECIMAL(38,0))) AS HUGEINT)
                        // 4294967296 AS DOUBLE) * 4294967296.0
                   + CAST(CAST(SUM(CAST(x AS DECIMAL(38,0))
                                   * CAST(x AS DECIMAL(38,0))
                                   * CAST(x AS DECIMAL(38,0))
                                   * CAST(x AS DECIMAL(38,0))) AS HUGEINT)
                          % 4294967296 AS DOUBLE) AS sx4,
                   CAST(CAST(SUM(CAST(x AS DECIMAL(38,0))
                                 * CAST(x AS DECIMAL(38,0))
                                 * CAST(n_t AS DECIMAL(38,0))) AS HUGEINT)
                        // 4294967296 AS DOUBLE) * 4294967296.0
                   + CAST(CAST(SUM(CAST(x AS DECIMAL(38,0))
                                   * CAST(x AS DECIMAL(38,0))
                                   * CAST(n_t AS DECIMAL(38,0))) AS HUGEINT)
                          % 4294967296 AS DOUBLE) AS sx2y
            FROM cum
        ),
        f AS (
            SELECT CAST(n AS DOUBLE) AS n, CAST(sx AS DOUBLE) AS sx,
                   CAST(sx2 AS DOUBLE) AS sx2, CAST(sy AS DOUBLE) AS sy,
                   CAST(sxy AS DOUBLE) AS sxy, sx3, sx4, sx2y,
                   n AS n_days
            FROM mom
        ),
        dets AS (
            SELECT n_days,
                   n * (sx2 * sx4 - sx3 * sx3)
                   - sx * (sx * sx4 - sx3 * sx2)
                   + sx2 * (sx * sx3 - sx2 * sx2) AS d,
                   sy * (sx2 * sx4 - sx3 * sx3)
                   - sx * (sxy * sx4 - sx3 * sx2y)
                   + sx2 * (sxy * sx3 - sx2 * sx2y) AS da,
                   n * (sxy * sx4 - sx3 * sx2y)
                   - sy * (sx * sx4 - sx3 * sx2)
                   + sx2 * (sx * sx2y - sxy * sx2) AS db,
                   n * (sx2 * sx2y - sxy * sx3)
                   - sx * (sx * sx2y - sxy * sx2)
                   + sy * (sx * sx3 - sx2 * sx2) AS dc
            FROM f
        ),
        coef AS (
            SELECT n_days, da / d AS a, db / d AS b, dc / d AS c
            FROM dets
        )
        SELECT CAST(n_days AS BIGINT) AS n_days,
               ROUND(a, 4) AS coef_a,
               ROUND(b, 8) AS coef_b,
               ROUND(c, 12) AS coef_c,
               ROUND(b * b - 4.0 * a * c, 8) AS disc,
               CASE WHEN b * b - 4.0 * a * c > 0.0 AND c < 0.0
                    THEN ROUND((-b - sqrt(b * b - 4.0 * a * c)) / (2.0 * c),
                               2)
                    ELSE NULL END AS m_hat,
               CASE WHEN b * b - 4.0 * a * c > 0.0 AND c < 0.0
                    THEN ROUND(a / ((-b - sqrt(b * b - 4.0 * a * c))
                                    / (2.0 * c)), 8)
                    ELSE NULL END AS p_hat,
               CASE WHEN b * b - 4.0 * a * c > 0.0 AND c < 0.0
                    THEN ROUND(-c * ((-b - sqrt(b * b - 4.0 * a * c))
                                     / (2.0 * c)), 8)
                    ELSE NULL END AS q_hat
        FROM coef
    """,
    section="A147",
    doc="Bass diffusion model fit over daily customer adoption (first "
    "orders): the discrete Bass equation n_t = p*m + (q-p)*N - "
    "(q/m)*N^2 is a QUADRATIC regression of new adopters on "
    "cumulative adopters, fit exactly by 3x3 normal equations solved "
    "with Cramer's rule — determinants expanded in one pinned IEEE "
    "sequence per engine. Power moments through x^4 overflow both "
    "2^53 and (at sf1) BIGINT, so x^3/x^4/x^2y accumulate in "
    "DECIMAL(38,0) and rebuild through the sign-safe hi/lo device; "
    "x/x^2/xy stay exact in plain BIGINT. Market size m, innovation "
    "p and imitation q recover from the coefficient roots only when "
    "the discriminant is positive and c < 0 (a proper S-curve) — "
    "the guard is a compare of identical doubles, so the NULL "
    "pattern matches cross-engine. Scale: customer-grain min-date "
    "agg, day-grain cumsum window, single-row moment reduce.",
)
def q_agg_bass_diffusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    first = orders.groupBy("o_custkey").agg(
        F.min(F.col("o_orderdate").cast("date")).alias("fd")
    )
    adopters = first.groupBy("fd").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_t")
    )
    wc = Window.orderBy("fd").rowsBetween(Window.unboundedPreceding, 0)
    cum = adopters.select(
        "fd",
        "n_t",
        (F.sum("n_t").over(wc) - F.col("n_t")).cast("bigint").alias("x"),
    )
    dec = DecimalType(38, 0)
    hi_lo = (
        "cast({0} div 4294967296 as double) * 4294967296.0d"
        " + cast({0} % 4294967296 as double)"
    )
    mom = cum.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sx2"),
        F.sum("n_t").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("n_t")).cast("bigint").alias("sxy"),
        F.sum(
            F.col("x").cast(dec) * F.col("x").cast(dec) * F.col("x").cast(dec)
        ).alias("sx3d"),
        F.sum(
            F.col("x").cast(dec)
            * F.col("x").cast(dec)
            * F.col("x").cast(dec)
            * F.col("x").cast(dec)
        ).alias("sx4d"),
        F.sum(
            F.col("x").cast(dec)
            * F.col("x").cast(dec)
            * F.col("n_t").cast(dec)
        ).alias("sx2yd"),
    )
    f = mom.select(
        F.col("n").alias("n_days"),
        F.col("n").cast("double").alias("nd"),
        F.col("sx").cast("double").alias("sxd"),
        F.col("sx2").cast("double").alias("sx2d"),
        F.col("sy").cast("double").alias("syd"),
        F.col("sxy").cast("double").alias("sxyd"),
        F.expr(hi_lo.format("sx3d")).alias("sx3"),
        F.expr(hi_lo.format("sx4d")).alias("sx4"),
        F.expr(hi_lo.format("sx2yd")).alias("sx2y"),
    )
    n, sx, sx2 = F.col("nd"), F.col("sxd"), F.col("sx2d")
    sy, sxy = F.col("syd"), F.col("sxyd")
    sx3, sx4, sx2y = F.col("sx3"), F.col("sx4"), F.col("sx2y")
    d = (
        n * (sx2 * sx4 - sx3 * sx3)
        - sx * (sx * sx4 - sx3 * sx2)
        + sx2 * (sx * sx3 - sx2 * sx2)
    )
    da = (
        sy * (sx2 * sx4 - sx3 * sx3)
        - sx * (sxy * sx4 - sx3 * sx2y)
        + sx2 * (sxy * sx3 - sx2 * sx2y)
    )
    db = (
        n * (sxy * sx4 - sx3 * sx2y)
        - sy * (sx * sx4 - sx3 * sx2)
        + sx2 * (sx * sx2y - sxy * sx2)
    )
    dc = (
        n * (sx2 * sx2y - sxy * sx3)
        - sx * (sx * sx2y - sxy * sx2)
        + sy * (sx * sx3 - sx2 * sx2)
    )
    coef = f.select(
        "n_days",
        (da / d).alias("a"),
        (db / d).alias("b"),
        (dc / d).alias("c"),
    )
    a, b, c = F.col("a"), F.col("b"), F.col("c")
    disc = b * b - F.lit(4.0) * a * c
    m = (-b - F.sqrt(disc)) / (F.lit(2.0) * c)
    ok = (disc > F.lit(0.0)) & (c < F.lit(0.0))
    return coef.select(
        F.col("n_days").cast("bigint").alias("n_days"),
        F.round(a, 4).alias("coef_a"),
        F.round(b, 8).alias("coef_b"),
        F.round(c, 12).alias("coef_c"),
        F.round(disc, 8).alias("disc"),
        F.when(ok, F.round(m, 2)).otherwise(F.lit(None)).alias("m_hat"),
        F.when(ok, F.round(a / m, 8)).otherwise(F.lit(None)).alias("p_hat"),
        F.when(ok, F.round(-c * m, 8)).otherwise(F.lit(None)).alias("q_hat"),
    )

# ==== wave 172a: weighted kappa (ordinal agreement) =================


@register(
    "q_agg_weighted_kappa",
    oracle="""
        WITH lat AS (
            SELECT o.o_orderkey,
                   CAST(substr(o.o_orderpriority, 1, 1) AS BIGINT) AS r1,
                   date_diff('day', CAST(o.o_orderdate AS DATE),
                             CAST(MIN(l.l_shipdate) AS DATE)) AS lat_days
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
        ),
        rated AS (
            SELECT r1,
                   CAST(NTILE(5) OVER (ORDER BY lat_days, o_orderkey)
                        AS BIGINT) AS r2
            FROM lat
        ),
        obs AS (
            SELECT r1, r2, CAST(COUNT(*) AS BIGINT) AS o
            FROM rated GROUP BY r1, r2
        ),
        marg AS (
            SELECT r1.i, r2.j, r1.ri, r2.cj
            FROM (SELECT r1 AS i, CAST(SUM(o) AS BIGINT) AS ri
                  FROM obs GROUP BY r1) r1
            CROSS JOIN (SELECT r2 AS j, CAST(SUM(o) AS BIGINT) AS cj
                        FROM obs GROUP BY r2) r2
        ),
        sums AS (
            SELECT
                (SELECT CAST(SUM(o) AS BIGINT) FROM obs) AS n,
                (SELECT CAST(SUM((r1 - r2) * (r1 - r2) * o) AS BIGINT)
                 FROM obs) AS sq_o,
                (SELECT CAST(SUM(abs(r1 - r2) * o) AS BIGINT)
                 FROM obs) AS ln_o,
                (SELECT CAST(SUM((i - j) * (i - j) * ri * cj) AS BIGINT)
                 FROM marg) AS sq_e,
                (SELECT CAST(SUM(abs(i - j) * ri * cj) AS BIGINT)
                 FROM marg) AS ln_e
        )
        SELECT n, sq_o, ln_o, sq_e, ln_e,
               ROUND(1.0 - CAST(n AS DOUBLE) * CAST(sq_o AS DOUBLE)
                     / CAST(sq_e AS DOUBLE), 8) AS qwk,
               ROUND(1.0 - CAST(n AS DOUBLE) * CAST(ln_o AS DOUBLE)
                     / CAST(ln_e AS DOUBLE), 8) AS lwk
        FROM sums
    """,
    section="A148",
    doc="Quadratic- and linear-weighted Cohen's kappa between two "
    "ordinal raters — order priority (1-5, parsed from the priority "
    "string) vs ship-latency quintile (NTILE(5) fully tie-broken on "
    "(latency, orderkey)): QWK is THE ordinal-agreement metric "
    "(every ordinal Kaggle competition scores with it) and reduces "
    "to 1 - n*sum(w*O)/sum(w*R_i*C_j), i.e. ONE double division "
    "over all-integer weighted observed/expected sums — the "
    "expected matrix never materializes beyond the 25-cell marginal "
    "cross product. Linear weights |i-j| ride along in the same "
    "pass. Scale: one order-grain agg, one global NTILE sort "
    "(latency quantization is the only total sort; at 100 TB swap "
    "NTILE for approx-quantile cut points), then 25-cell tables.",
)
def q_agg_weighted_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lat = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderpriority", "o_orderdate")
        .agg(F.min(F.col("l_shipdate").cast("date")).alias("fs"))
        .select(
            "o_orderkey",
            F.substring("o_orderpriority", 1, 1)
            .cast("bigint")
            .alias("r1"),
            F.datediff(F.col("fs"), F.col("o_orderdate").cast("date")).alias(
                "lat_days"
            ),
        )
    )
    # r9 (guide §2.4): the rater-2 quintile ran as ntile(5) OVER an
    # UNPARTITIONED window — Exchange SinglePartition + one-task sort of
    # the whole order grain (the classic scale killer; also the measured
    # dominant leg locally). global_row_number + ntile_from_rn is the
    # repo's distributed equivalent (range-partitioned two-pass rank;
    # tests pin ntile_from_rn == F.ntile for any n, k).
    from ai_to_cvent_etl_spark.operators.ranking import (
        global_row_number,
        ntile_from_rn,
    )

    nn = lat.agg(F.count(F.lit(1)).cast("bigint").alias("nr"))
    rated = (
        global_row_number(lat, ["lat_days", "o_orderkey"], out_col="rn")
        .crossJoin(F.broadcast(nn))
        .select(
            "r1",
            ntile_from_rn(F.col("rn"), F.col("nr"), 5)
            .cast("bigint")
            .alias("r2"),
        )
    )
    obs = rated.groupBy("r1", "r2").agg(
        F.count(F.lit(1)).cast("bigint").alias("o")
    ).localCheckpoint(eager=False)
    ri = obs.groupBy(F.col("r1").alias("i")).agg(
        F.sum("o").cast("bigint").alias("ri")
    )
    cj = obs.groupBy(F.col("r2").alias("j")).agg(
        F.sum("o").cast("bigint").alias("cj")
    )
    # both marginals are <=5-row aggregates; broadcast so the k x k outer
    # product plans as BroadcastNestedLoopJoin, never CartesianProduct
    marg = ri.crossJoin(F.broadcast(cj))
    d = F.col("r1") - F.col("r2")
    so = obs.agg(
        F.sum("o").cast("bigint").alias("n"),
        F.sum(d * d * F.col("o")).cast("bigint").alias("sq_o"),
        F.sum(F.abs(d) * F.col("o")).cast("bigint").alias("ln_o"),
    )
    dm = F.col("i") - F.col("j")
    se = marg.agg(
        F.sum(dm * dm * F.col("ri") * F.col("cj"))
        .cast("bigint")
        .alias("sq_e"),
        F.sum(F.abs(dm) * F.col("ri") * F.col("cj"))
        .cast("bigint")
        .alias("ln_e"),
    )
    sums = so.crossJoin(F.broadcast(se))
    return sums.select(
        "n",
        "sq_o",
        "ln_o",
        "sq_e",
        "ln_e",
        F.round(
            F.lit(1.0)
            - F.col("n").cast("double")
            * F.col("sq_o").cast("double")
            / F.col("sq_e").cast("double"),
            8,
        ).alias("qwk"),
        F.round(
            F.lit(1.0)
            - F.col("n").cast("double")
            * F.col("ln_o").cast("double")
            / F.col("ln_e").cast("double"),
            8,
        ).alias("lwk"),
    )
