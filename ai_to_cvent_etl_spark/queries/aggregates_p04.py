"""Registered queries q_agg_james_stein..q_agg_sign_test (chunk 4 of 4 split from aggregates.py — see aggregates_shared.py for shared helpers)."""

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
    _GM_STEP,
    _NEM_Q5,
)

# ==== wave 173a: James-Stein shrinkage of per-customer means ========


@register(
    "q_agg_james_stein",
    oracle="""
        WITH vals AS (
            SELECT o_custkey,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) // 100 AS v
            FROM orders
        ),
        per AS (
            SELECT o_custkey AS custkey,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(v) AS BIGINT) AS s,
                   (CAST(SUM(v) AS BIGINT) // COUNT(*)) AS mu,
                   ((CAST(SUM(v) AS BIGINT) // COUNT(*)) * SUM(v)
                    + ((CAST(SUM(v) AS BIGINT) % COUNT(*)) * SUM(v))
                      // COUNT(*)) AS w,
                   CAST(SUM(v * v) AS BIGINT) AS q,
                   1000000 // COUNT(*) AS h
            FROM vals GROUP BY o_custkey
        ),
        scal AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS k,
                   CAST(SUM(n_orders) AS BIGINT) AS n,
                   CAST(SUM(mu) AS BIGINT) AS g,
                   CAST(SUM(mu * mu) AS BIGINT) AS ssq,
                   CAST(SUM(q) - SUM(w) AS BIGINT) AS ssw,
                   CAST(SUM(h) AS BIGINT) AS hh
            FROM per
        ),
        parts AS (
            SELECT k, g,
                   CAST(g AS DOUBLE) / k AS grand,
                   CAST(ssq AS DOUBLE)
                   - CAST(g AS DOUBLE) * CAST(g AS DOUBLE) / k AS s_btw,
                   CAST(ssw AS DOUBLE) / (n - k)
                   * CAST(hh AS DOUBLE)
                   / CAST(k * 1000000 AS DOUBLE) AS vbar
            FROM scal
        ),
        shrink AS (
            SELECT grand,
                   GREATEST(0.0, 1.0 - (k - 3) * vbar / s_btw) AS c
            FROM parts
        )
        SELECT p.custkey, p.n_orders, CAST(p.mu AS BIGINT) AS mu_dollars,
               ROUND(s.grand + s.c * (CAST(p.mu AS DOUBLE) - s.grand), 4)
                   AS js_mean,
               ROUND(s.c, 6) AS shrink_c
        FROM per p CROSS JOIN shrink s
    """,
    section="A149",
    doc="James-Stein shrinkage of per-customer mean order value toward "
    "the grand mean of customer means — THE small-n estimator fix "
    "(Efron-Morris): a customer with 8 orders gets an estimate pulled "
    "toward the population, dominating the raw MLE for k>=4 groups. "
    "c = max(0, 1 - (k-3)*vbar/S) with S = sum(mu^2) - G^2/k over "
    "WHOLE-DOLLAR quantized group means (mu = s div n, exact bigint, "
    "~5e5 max, so sum(mu^2) never leaves int64 even at sf1) and "
    "vbar = pooled within-variance * mean(1e6 div n)/1e6 — the "
    "floor(s^2/n) term uses the overflow-safe split "
    "(s div n)*s + ((s mod n)*s) div n so no s^2 ever materializes. "
    "Every cross-engine double is rebuilt from exact int64 sums with "
    "one fixed expression. Scale: one groupBy(custkey) shuffle, a "
    "map-side-combinable scalar reduction over k rows, and a "
    "broadcast of ONE scalar row back onto the per-customer frame.",
)
def q_agg_james_stein(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    vals = od.select(
        "o_custkey",
        F.expr(
            "cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)"
            " div 100"
        ).alias("v"),
    )
    s = F.sum("v").cast("bigint")
    n = F.count(F.lit(1))
    per = vals.groupBy(F.col("o_custkey").alias("custkey")).agg(
        n.cast("bigint").alias("n_orders"),
        s.alias("s"),
        F.expr(
            "cast(sum(v) as bigint) div count(*)"
        ).alias("mu"),
        F.expr(
            "(cast(sum(v) as bigint) div count(*)) * sum(v)"
            " + ((cast(sum(v) as bigint) % count(*)) * sum(v))"
            "   div count(*)"
        ).alias("w"),
        F.sum(F.col("v") * F.col("v")).cast("bigint").alias("q"),
        F.expr("1000000 div count(*)").alias("h"),
    )
    scal = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n_orders").cast("bigint").alias("n"),
        F.sum("mu").cast("bigint").alias("g"),
        F.sum(F.col("mu") * F.col("mu")).cast("bigint").alias("ssq"),
        (F.sum("q") - F.sum("w")).cast("bigint").alias("ssw"),
        F.sum("h").cast("bigint").alias("hh"),
    )
    grand = F.col("g").cast("double") / F.col("k")
    s_btw = (
        F.col("ssq").cast("double")
        - F.col("g").cast("double") * F.col("g").cast("double")
        / F.col("k")
    )
    vbar = (
        F.col("ssw").cast("double") / (F.col("n") - F.col("k"))
        * F.col("hh").cast("double")
        / (F.col("k") * F.lit(1000000)).cast("double")
    )
    shrink = scal.select(
        grand.alias("grand"),
        F.greatest(
            F.lit(0.0),
            F.lit(1.0) - (F.col("k") - 3) * vbar / s_btw,
        ).alias("c"),
    )
    return per.crossJoin(F.broadcast(shrink)).select(
        "custkey",
        "n_orders",
        F.col("mu").alias("mu_dollars"),
        F.round(
            F.col("grand")
            + F.col("c") * (F.col("mu").cast("double") - F.col("grand")),
            4,
        ).alias("js_mean"),
        F.round(F.col("c"), 6).alias("shrink_c"),
    )

# ==== wave 174a: Goodman-Kruskal lambda (PRE association) ===========


@register(
    "q_agg_gk_lambda",
    oracle="""
        WITH obs AS (
            SELECT o_orderpriority AS x, o_orderstatus AS y,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM orders GROUP BY 1, 2
        ),
        rowmax AS (
            SELECT CAST(SUM(m) AS BIGINT) AS sum_rowmax
            FROM (SELECT x, MAX(c) AS m FROM obs GROUP BY x)
        ),
        colmax AS (
            SELECT CAST(SUM(m) AS BIGINT) AS sum_colmax
            FROM (SELECT y, MAX(c) AS m FROM obs GROUP BY y)
        ),
        marg AS (
            SELECT CAST(SUM(c) AS BIGINT) AS n,
                   CAST(MAX(cy) AS BIGINT) AS max_col_marg,
                   CAST(MAX(cx) AS BIGINT) AS max_row_marg
            FROM (
                SELECT c,
                       SUM(c) OVER (PARTITION BY y) AS cy,
                       SUM(c) OVER (PARTITION BY x) AS cx
                FROM obs
            )
        )
        SELECT n, sum_rowmax, sum_colmax, max_col_marg, max_row_marg,
               ROUND(CAST(sum_rowmax - max_col_marg AS DOUBLE)
                     / (n - max_col_marg), 6) AS lambda_y_given_x,
               ROUND(CAST(sum_colmax - max_row_marg AS DOUBLE)
                     / (n - max_row_marg), 6) AS lambda_x_given_y,
               ROUND(CAST(sum_rowmax + sum_colmax - max_col_marg
                          - max_row_marg AS DOUBLE)
                     / (2 * n - max_col_marg - max_row_marg), 6)
                   AS lambda_sym
        FROM marg CROSS JOIN rowmax CROSS JOIN colmax
    """,
    section="A150",
    doc="Goodman-Kruskal lambda between order priority (X, 5 levels) "
    "and order status (Y, 3 levels) — the proportional-reduction-in-"
    "error association for NOMINAL pairs, where chi-square says "
    "'dependent' but not 'how much does knowing X help predict Y': "
    "lambda_Y|X = (sum_x max_y n_xy - max_y n_+y)/(n - max_y n_+y), "
    "i.e. the fraction of modal-guess errors knowing X removes. Both "
    "directions plus the symmetric pooled form ride on the SAME "
    "15-cell contingency — every numerator/denominator is an exact "
    "int64 count, so the three metrics are one double division each. "
    "Scale: one groupBy over two low-cardinality columns (map-side "
    "combinable to 15 rows) and constant-size algebra after.",
)
def q_agg_gk_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    obs = od.groupBy(
        F.col("o_orderpriority").alias("x"),
        F.col("o_orderstatus").alias("y"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    rowmax = (
        obs.groupBy("x").agg(F.max("c").alias("m"))
        .agg(F.sum("m").cast("bigint").alias("sum_rowmax"))
    )
    colmax = (
        obs.groupBy("y").agg(F.max("c").alias("m"))
        .agg(F.sum("m").cast("bigint").alias("sum_colmax"))
    )
    cy = F.sum("c").over(Window.partitionBy("y"))
    cx = F.sum("c").over(Window.partitionBy("x"))
    marg = (
        obs.select("c", cy.alias("cy"), cx.alias("cx"))
        .agg(
            F.sum("c").cast("bigint").alias("n"),
            F.max("cy").cast("bigint").alias("max_col_marg"),
            F.max("cx").cast("bigint").alias("max_row_marg"),
        )
    )
    out = marg.crossJoin(F.broadcast(rowmax)).crossJoin(
        F.broadcast(colmax)
    )
    return out.select(
        "n",
        "sum_rowmax",
        "sum_colmax",
        "max_col_marg",
        "max_row_marg",
        F.round(
            (F.col("sum_rowmax") - F.col("max_col_marg")).cast("double")
            / (F.col("n") - F.col("max_col_marg")),
            6,
        ).alias("lambda_y_given_x"),
        F.round(
            (F.col("sum_colmax") - F.col("max_row_marg")).cast("double")
            / (F.col("n") - F.col("max_row_marg")),
            6,
        ).alias("lambda_x_given_y"),
        F.round(
            (
                F.col("sum_rowmax")
                + F.col("sum_colmax")
                - F.col("max_col_marg")
                - F.col("max_row_marg")
            ).cast("double")
            / (
                2 * F.col("n")
                - F.col("max_col_marg")
                - F.col("max_row_marg")
            ),
            6,
        ).alias("lambda_sym"),
    )

# ==== wave 175a: Krippendorff's alpha (nominal, variable raters) ====


@register(
    "q_agg_krippendorff_alpha",
    oracle="""
        WITH ratings AS (
            SELECT l_orderkey AS unit,
                   (CAST(l_quantity AS INT) - 1) // 10 AS c
            FROM lineitem
        ),
        uc AS (
            SELECT unit, c, CAST(COUNT(*) AS BIGINT) AS n_uc
            FROM ratings GROUP BY unit, c
        ),
        per_unit AS (
            SELECT unit,
                   CAST(SUM(n_uc) AS BIGINT) AS m,
                   CAST(SUM(n_uc * n_uc) AS BIGINT) AS sq
            FROM uc GROUP BY unit
            HAVING SUM(n_uc) >= 2
        ),
        do_sum AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_units,
                   CAST(SUM((60 // (m - 1)) * (m * m - sq)) AS BIGINT)
                       AS do60
            FROM per_unit
        ),
        marg AS (
            SELECT CAST(SUM(n_uc) AS BIGINT) AS n,
                   CAST(SUM(nc * nc) AS BIGINT) AS sncsq
            FROM (
                SELECT CAST(SUM(u.n_uc) AS BIGINT) AS nc,
                       CAST(SUM(u.n_uc) AS BIGINT) AS n_uc
                FROM uc u JOIN per_unit p ON p.unit = u.unit
                GROUP BY u.c
            )
        )
        SELECT d.n_units, m.n AS n_ratings, d.do60,
               ROUND(1.0 - CAST(d.do60 AS DOUBLE) * (m.n - 1)
                     / (60.0 * (m.n * m.n - m.sncsq)), 6) AS alpha,
               ROUND(CAST(d.do60 AS DOUBLE) / (60.0 * m.n), 6)
                   AS pct_disagree
        FROM do_sum d CROSS JOIN marg m
    """,
    section="A151",
    doc="Krippendorff's alpha (nominal metric, variable raters per "
    "unit) treating each order as a unit and its lineitems' quantity "
    "deciles as independent 'ratings' — THE chance-corrected "
    "agreement coefficient that, unlike Cohen/Fleiss kappa, handles "
    "2..7 raters per unit and missing raters natively via the "
    "coincidence matrix. The per-unit disagreement 60*(m^2 - "
    "sum_c n_uc^2)/(m-1) is made EXACTLY integer by the LCM device: "
    "m-1 <= 6 always divides 60, so (60 div (m-1)) * (...) never "
    "leaves int64 (same trick as the distance-2 betweenness "
    "credits). Coincidence marginals collapse to plain per-category "
    "rating counts over pairable units, so alpha = 1 - do60*(n-1) / "
    "(60*(n^2 - sum nc^2)) is ONE double division over five exact "
    "integers. Scale: two keyed aggs (unit-grain, category-grain) "
    "plus a scalar join — no pair enumeration ever happens.",
)
def q_agg_krippendorff_alpha(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ratings = li.select(
        F.col("l_orderkey").alias("unit"),
        F.expr("(CAST(l_quantity AS INT) - 1) div 10").alias("c"),
    )
    uc = ratings.groupBy("unit", "c").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_uc")
    )
    per_unit = (
        uc.groupBy("unit")
        .agg(
            F.sum("n_uc").cast("bigint").alias("m"),
            F.sum(F.col("n_uc") * F.col("n_uc"))
            .cast("bigint")
            .alias("sq"),
        )
        .where(F.col("m") >= 2)
    )
    do_sum = per_unit.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_units"),
        F.sum(
            F.expr("60 div (m - 1)")
            * (F.col("m") * F.col("m") - F.col("sq"))
        )
        .cast("bigint")
        .alias("do60"),
    )
    marg = (
        uc.join(per_unit.select("unit"), "unit")
        .groupBy("c")
        .agg(F.sum("n_uc").cast("bigint").alias("nc"))
        .agg(
            F.sum("nc").cast("bigint").alias("n"),
            F.sum(F.col("nc") * F.col("nc")).cast("bigint").alias("sncsq"),
        )
    )
    out = do_sum.crossJoin(F.broadcast(marg))
    return out.select(
        "n_units",
        F.col("n").alias("n_ratings"),
        "do60",
        F.round(
            F.lit(1.0)
            - F.col("do60").cast("double") * (F.col("n") - 1)
            / (F.lit(60.0) * (F.col("n") * F.col("n") - F.col("sncsq"))),
            6,
        ).alias("alpha"),
        F.round(
            F.col("do60").cast("double") / (F.lit(60.0) * F.col("n")), 6
        ).alias("pct_disagree"),
    )

# ==== wave 177a: covariate balance audit (SMD) ======================


@register(
    "q_agg_covariate_balance",
    oracle="""
        WITH lagg AS (
            SELECT l_orderkey,
                   CAST(COUNT(*) AS BIGINT) AS nl,
                   CAST(SUM(CAST(l_quantity AS INT)) AS BIGINT) AS sq
            FROM lineitem GROUP BY l_orderkey
        ),
        frame AS (
            SELECT CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END AS treated,
                   CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) // 100 AS dollars,
                   l.nl, l.sq
            FROM orders o JOIN lagg l ON l.l_orderkey = o.o_orderkey
        ),
        long AS (
            SELECT treated, 'dollars' AS covariate, dollars AS v
            FROM frame
            UNION ALL
            SELECT treated, 'n_lines', nl FROM frame
            UNION ALL
            SELECT treated, 'sum_qty', sq FROM frame
        ),
        mom AS (
            SELECT covariate,
                   CAST(SUM(treated) AS BIGINT) AS n1,
                   CAST(SUM(1 - treated) AS BIGINT) AS n0,
                   CAST(SUM(treated * v) AS BIGINT) AS s1,
                   CAST(SUM((1 - treated) * v) AS BIGINT) AS s0,
                   CAST(SUM(treated * v * v) AS BIGINT) AS q1,
                   CAST(SUM((1 - treated) * v * v) AS BIGINT) AS q0
            FROM long GROUP BY covariate
        ),
        stats AS (
            SELECT covariate, n1, n0,
                   CAST(s1 AS DOUBLE) / n1 AS m1,
                   CAST(s0 AS DOUBLE) / n0 AS m0,
                   (CAST(q1 AS DOUBLE)
                    - CAST(s1 AS DOUBLE) * s1 / n1) / (n1 - 1) AS v1,
                   (CAST(q0 AS DOUBLE)
                    - CAST(s0 AS DOUBLE) * s0 / n0) / (n0 - 1) AS v0
            FROM mom
        )
        SELECT covariate, n1, n0,
               ROUND(m1, 4) AS mean_t,
               ROUND(m0, 4) AS mean_c,
               ROUND((m1 - m0) / sqrt((v1 + v0) / 2.0), 6) AS smd,
               ROUND(v1 / v0, 6) AS var_ratio
        FROM stats
    """,
    section="A152",
    doc="Covariate-balance audit for the urgent/high-priority "
    "'treatment': standardized mean difference (m1-m0)/"
    "sqrt((v1+v0)/2) and variance ratio per covariate (whole-dollar "
    "total, line count, quantity sum) — THE table every "
    "observational-causal analysis prints before trusting an effect "
    "estimate (|SMD| < 0.1 is the conventional balance bar, and "
    "A71's stratified ATE / A45's CUPED assume it was checked). "
    "One-pass conditional moments per covariate: every n/s/q is an "
    "exact int64 (treated flag multiplies values, the A66 ANOVA "
    "device), means/variances rebuild with one pinned IEEE "
    "expression. Scale: lineitem pre-aggregates to order grain, the "
    "long unpivot triples rows but map-side combines into 6 "
    "integers per covariate — a constant-size reduction.",
)
def q_agg_covariate_balance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lagg = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("nl"),
        F.sum(F.col("l_quantity").cast("int"))
        .cast("bigint")
        .alias("sq"),
    )
    frame = od.join(lagg, od.o_orderkey == lagg.l_orderkey).select(
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        )
        .otherwise(0)
        .alias("treated"),
        F.expr(
            "cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)"
            " div 100"
        ).alias("dollars"),
        "nl",
        "sq",
    )
    long = frame.select(
        "treated",
        F.expr(
            "stack(3, 'dollars', dollars, 'n_lines', nl,"
            " 'sum_qty', sq) as (covariate, v)"
        ),
    )
    t = F.col("treated")
    v = F.col("v")
    mom = long.groupBy("covariate").agg(
        F.sum(t).cast("bigint").alias("n1"),
        F.sum(1 - t).cast("bigint").alias("n0"),
        F.sum(t * v).cast("bigint").alias("s1"),
        F.sum((1 - t) * v).cast("bigint").alias("s0"),
        F.sum(t * v * v).cast("bigint").alias("q1"),
        F.sum((1 - t) * v * v).cast("bigint").alias("q0"),
    )
    m1 = F.col("s1").cast("double") / F.col("n1")
    m0 = F.col("s0").cast("double") / F.col("n0")
    v1 = (
        F.col("q1").cast("double")
        - F.col("s1").cast("double") * F.col("s1") / F.col("n1")
    ) / (F.col("n1") - 1)
    v0 = (
        F.col("q0").cast("double")
        - F.col("s0").cast("double") * F.col("s0") / F.col("n0")
    ) / (F.col("n0") - 1)
    return mom.select(
        "covariate",
        "n1",
        "n0",
        F.round(m1, 4).alias("mean_t"),
        F.round(m0, 4).alias("mean_c"),
        F.round((m1 - m0) / F.sqrt((v1 + v0) / F.lit(2.0)), 6).alias(
            "smd"
        ),
        F.round(v1 / v0, 6).alias("var_ratio"),
    )

# ==== wave 179a: Cramer-von Mises two-sample test ===================


@register(
    "q_agg_cramer_von_mises",
    oracle="""
        WITH vals AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 'x' ELSE 'y' END AS grp,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS cents
            FROM orders
        ),
        ranked AS (
            SELECT grp,
                   CAST(ROW_NUMBER() OVER (ORDER BY cents, o_orderkey)
                        AS BIGINT) AS r,
                   CAST(ROW_NUMBER() OVER (PARTITION BY grp
                                           ORDER BY cents, o_orderkey)
                        AS BIGINT) AS i
            FROM vals
        ),
        sums AS (
            SELECT
                CAST(SUM(CASE WHEN grp = 'x' THEN 1 ELSE 0 END)
                     AS BIGINT) AS n,
                CAST(SUM(CASE WHEN grp = 'y' THEN 1 ELSE 0 END)
                     AS BIGINT) AS m,
                CAST(SUM(CASE WHEN grp = 'x'
                              THEN (r - i) * (r - i) ELSE 0 END)
                     AS BIGINT) AS sx,
                CAST(SUM(CASE WHEN grp = 'y'
                              THEN (r - i) * (r - i) ELSE 0 END)
                     AS BIGINT) AS sy
            FROM ranked
        ),
        u AS (
            SELECT n, m, sx, sy,
                   CAST(n AS HUGEINT) * sx + CAST(m AS HUGEINT) * sy
                       AS uu
            FROM sums
        )
        SELECT n AS n_x, m AS n_y, sx, sy,
               ROUND((CAST(uu // 4294967296 AS DOUBLE) * 4294967296.0
                      + CAST(uu % 4294967296 AS DOUBLE))
                     / (CAST(n AS DOUBLE) * m * (n + m))
                     - (4.0 * CAST(n AS DOUBLE) * m - 1.0)
                       / (6.0 * (n + m)), 6) AS t_cvm
        FROM u
    """,
    section="A153",
    doc="Cramer-von Mises two-sample statistic between urgent/high "
    "and other order totals: T = U/(nmN) - (4nm-1)/(6N) with "
    "U = n*sum_x(r_i - i)^2 + m*sum_y(s_j - j)^2 — the "
    "integrated-squared-ECDF-difference test that weights the WHOLE "
    "distribution (A36's KS sees only the single largest gap; CvM "
    "catches spread/shape differences KS misses). Combined and "
    "within-group ranks are fully tie-broken by (cents, orderkey) — "
    "deterministic on both engines and documented in place of the "
    "midrank convention — so sx/sy are exact int64; U needs "
    "int128/DECIMAL(38,0) (n*sx ~ 1e20 at sf0.1) and rebuilds "
    "through the A26 hi/lo device. Scale: two rank windows (one "
    "global sort — at 100 TB use a range-partitioned sort) and one "
    "scalar reduction.",
)
def q_agg_cramer_von_mises(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    vals = od.select(
        "o_orderkey",
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "x"
        )
        .otherwise("y")
        .alias("grp"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("cents"),
    )
    # Scale note (r6): global rank via the distributed two-pass operator;
    # the within-group rank stays a keyed (parallel) window.
    from ai_to_cvent_etl_spark.operators.ranking import global_row_number

    ranked = global_row_number(
        vals, ["cents", "o_orderkey"], out_col="r"
    ).select(
        "grp",
        "r",
        F.row_number()
        .over(Window.partitionBy("grp").orderBy("cents", "o_orderkey"))
        .cast("bigint")
        .alias("i"),
    )
    d = F.col("r") - F.col("i")
    sums = ranked.agg(
        F.sum(F.when(F.col("grp") == "x", 1).otherwise(0))
        .cast("bigint")
        .alias("n"),
        F.sum(F.when(F.col("grp") == "y", 1).otherwise(0))
        .cast("bigint")
        .alias("m"),
        F.sum(F.when(F.col("grp") == "x", d * d).otherwise(0))
        .cast("bigint")
        .alias("sx"),
        F.sum(F.when(F.col("grp") == "y", d * d).otherwise(0))
        .cast("bigint")
        .alias("sy"),
    )
    u = sums.select(
        "n",
        "m",
        "sx",
        "sy",
        (
            F.col("n").cast(DecimalType(38, 0)) * F.col("sx")
            + F.col("m").cast(DecimalType(38, 0)) * F.col("sy")
        ).alias("uu"),
    )
    hi_lo = (
        "cast(uu div 4294967296 as double) * 4294967296.0d"
        " + cast(uu % 4294967296 as double)"
    )
    nd = F.col("n").cast("double")
    return u.select(
        F.col("n").alias("n_x"),
        F.col("m").alias("n_y"),
        "sx",
        "sy",
        F.round(
            F.expr(hi_lo)
            / (nd * F.col("m") * (F.col("n") + F.col("m")))
            - (F.lit(4.0) * nd * F.col("m") - F.lit(1.0))
            / (F.lit(6.0) * (F.col("n") + F.col("m"))),
            6,
        ).alias("t_cvm"),
    )

# ==== wave 180a: Lin's concordance correlation coefficient ==========


@register(
    "q_agg_lin_ccc",
    oracle="""
        WITH pairs AS (
            SELECT CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) // 100 AS x,
                   CAST(CAST(SUM(CAST(l.l_extendedprice
                                      AS DECIMAL(18,2))) * 100
                        AS BIGINT) // 100 AS BIGINT) AS y
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderkey, o.o_totalprice
        ),
        mom AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x * x) AS BIGINT) AS sxx,
                   CAST(SUM(y * y) AS BIGINT) AS syy,
                   CAST(SUM(x * y) AS BIGINT) AS sxy
            FROM pairs
        ),
        stats AS (
            SELECT n,
                   CAST(sx AS DOUBLE) / n AS mx,
                   CAST(sy AS DOUBLE) / n AS my,
                   CAST(sxx AS DOUBLE) / n
                   - (CAST(sx AS DOUBLE) / n)
                     * (CAST(sx AS DOUBLE) / n) AS vx,
                   CAST(syy AS DOUBLE) / n
                   - (CAST(sy AS DOUBLE) / n)
                     * (CAST(sy AS DOUBLE) / n) AS vy,
                   CAST(sxy AS DOUBLE) / n
                   - (CAST(sx AS DOUBLE) / n)
                     * (CAST(sy AS DOUBLE) / n) AS cxy
            FROM mom
        )
        SELECT n,
               ROUND(mx, 4) AS mean_header,
               ROUND(my, 4) AS mean_lines,
               ROUND(2.0 * cxy
                     / (vx + vy + (mx - my) * (mx - my)), 6) AS ccc,
               ROUND(cxy / sqrt(vx * vy), 6) AS pearson_r,
               ROUND(2.0 * cxy / (vx + vy + (mx - my) * (mx - my))
                     / (cxy / sqrt(vx * vy)), 6) AS c_b
        FROM stats
    """,
    section="A154",
    doc="Lin's concordance correlation coefficient between the order "
    "header total and the sum of its line extended prices (both in "
    "whole dollars): CCC = 2*s_xy / (s_x^2 + s_y^2 + (mx-my)^2), "
    "the agreement metric that punishes BOTH scatter and location/"
    "scale shift — Pearson r (reported alongside, with the bias "
    "factor C_b = CCC/r) would call y = 2x perfect agreement; CCC "
    "does not, which is why method-comparison studies (A95 Deming, "
    "A96 Bland-Altman are its siblings) report it. Header vs line "
    "sums differ by tax/discount composition, so agreement < 1 by "
    "construction. All six moments are exact int64 one-pass sums; "
    "every double rebuilds with one pinned expression. Scale: one "
    "order-grain agg then a scalar reduction — map-side all the "
    "way.",
)
def q_agg_lin_ccc(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pairs = (
        od.join(li, li.l_orderkey == od.o_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(
            F.expr(
                "CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))"
                " * 100 AS BIGINT) div 100 AS BIGINT)"
            ).alias("y")
        )
        .select(
            F.expr(
                "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
                " AS BIGINT) div 100"
            ).alias("x"),
            "y",
        )
    )
    mom = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    mx = F.col("sx").cast("double") / F.col("n")
    my = F.col("sy").cast("double") / F.col("n")
    vx = F.col("sxx").cast("double") / F.col("n") - mx * mx
    vy = F.col("syy").cast("double") / F.col("n") - my * my
    cxy = F.col("sxy").cast("double") / F.col("n") - mx * my
    ccc = F.lit(2.0) * cxy / (vx + vy + (mx - my) * (mx - my))
    r = cxy / F.sqrt(vx * vy)
    return mom.select(
        "n",
        F.round(mx, 4).alias("mean_header"),
        F.round(my, 4).alias("mean_lines"),
        F.round(ccc, 6).alias("ccc"),
        F.round(r, 6).alias("pearson_r"),
        F.round(ccc / r, 6).alias("c_b"),
    )

# ==== wave 181a: Quade test (weighted rank blocked ANOVA) ===========


@register(
    "q_agg_quade",
    oracle="""
        WITH cells AS (
            SELECT n.n_name AS blk, o.o_orderpriority AS trt,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) AS v
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1, 2
        ),
        full_blocks AS (
            SELECT blk FROM cells GROUP BY blk HAVING COUNT(*) = 5
        ),
        ranked AS (
            SELECT c.blk, c.trt, c.v,
                   CAST(RANK() OVER (PARTITION BY c.blk
                                     ORDER BY c.v, c.trt) AS BIGINT)
                       AS r,
                   CAST(MAX(c.v) OVER (PARTITION BY c.blk)
                        - MIN(c.v) OVER (PARTITION BY c.blk)
                        AS BIGINT) AS rng
            FROM cells c JOIN full_blocks f ON f.blk = c.blk
        ),
        weighted AS (
            SELECT blk, trt,
                   CAST(DENSE_RANK() OVER (ORDER BY rng, blk)
                        AS BIGINT) * (r - 3) AS s
            FROM ranked
        ),
        tj AS (
            SELECT trt, CAST(SUM(s) AS BIGINT) AS t
            FROM weighted GROUP BY trt
        ),
        scal AS (
            SELECT
                (SELECT CAST(COUNT(*) AS BIGINT) FROM full_blocks) AS b,
                (SELECT CAST(COUNT(*) AS BIGINT) FROM tj) AS k,
                (SELECT CAST(SUM(s * s) AS BIGINT) FROM weighted)
                    AS a_stat,
                (SELECT CAST(SUM(t * t) AS BIGINT) FROM tj) AS sum_tj2
        )
        SELECT b, k, a_stat, sum_tj2,
               ROUND((b - 1.0) * sum_tj2
                     / (CAST(b AS DOUBLE) * a_stat - sum_tj2), 6)
                   AS f_quade
        FROM scal
    """,
    section="A155",
    doc="Quade test across the 5 priority 'treatments' blocked by "
    "nation (25 complete blocks of revenue cells): Friedman's "
    "blocked rank test (A65 sibling) weights every block equally — "
    "Quade weights blocks by the DENSE_RANK of their within-block "
    "range, so nations where priority actually moves revenue count "
    "more; with k=5, (k+1)/2 = 3 keeps S = Q*(r-3) exactly integer "
    "(no half-rank doubling needed). Ranks are fully tie-broken "
    "((v, trt) within block, (range, blk) across blocks) and "
    "incomplete blocks are excluded by an explicit COUNT(*)=5 gate, "
    "so A and sum(T_j^2) are exact int64 and F = (b-1)B/(bA - B) is "
    "one double expression. Scale: one (nation, priority) agg, two "
    "block-partition windows, 125-cell algebra after.",
)
def q_agg_quade(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    cells = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .groupBy(
            F.col("n_name").alias("blk"),
            F.col("o_orderpriority").alias("trt"),
        )
        .agg(
            F.expr(
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 "
                "AS BIGINT)"
            ).alias("v")
        )
    )
    full_blocks = (
        cells.groupBy("blk")
        .agg(F.count(F.lit(1)).alias("nc"))
        .where(F.col("nc") == 5)
        .select("blk")
    )
    wb = Window.partitionBy("blk")
    ranked = cells.join(full_blocks, "blk").select(
        "blk",
        "trt",
        F.rank().over(wb.orderBy("v", "trt")).cast("bigint").alias("r"),
        (F.max("v").over(wb) - F.min("v").over(wb))
        .cast("bigint")
        .alias("rng"),
    )
    weighted = ranked.select(
        "blk",
        "trt",
        (
            F.dense_rank()
            .over(Window.orderBy("rng", "blk"))
            .cast("bigint")
            * (F.col("r") - 3)
        ).alias("s"),
    )
    tj = weighted.groupBy("trt").agg(
        F.sum("s").cast("bigint").alias("t")
    )
    scal = (
        weighted.agg(
            F.sum(F.col("s") * F.col("s")).cast("bigint").alias("a_stat")
        )
        .crossJoin(
            F.broadcast(
                full_blocks.agg(
                    F.count(F.lit(1)).cast("bigint").alias("b")
                )
            )
        )
        .crossJoin(
            F.broadcast(
                tj.agg(
                    F.count(F.lit(1)).cast("bigint").alias("k"),
                    F.sum(F.col("t") * F.col("t"))
                    .cast("bigint")
                    .alias("sum_tj2"),
                )
            )
        )
    )
    return scal.select(
        "b",
        "k",
        "a_stat",
        "sum_tj2",
        F.round(
            (F.col("b") - F.lit(1.0)) * F.col("sum_tj2")
            / (
                F.col("b").cast("double") * F.col("a_stat")
                - F.col("sum_tj2")
            ),
            6,
        ).alias("f_quade"),
    )

# ==== wave 182a: stratification design effect =======================


@register(
    "q_agg_design_effect",
    oracle="""
        WITH strata AS (
            SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS nh,
                   CAST(SUM(n_chars) AS BIGINT) AS sh,
                   CAST(SUM(n_chars * n_chars) AS BIGINT) AS qh
            FROM documents GROUP BY source
        ),
        quant AS (
            SELECT nh, sh, qh,
                   CAST(floor(1000000.0 * nh
                        * ((CAST(qh AS DOUBLE)
                            - CAST(sh AS DOUBLE) * sh / nh)
                           / (nh - 1))) AS BIGINT) AS th
            FROM strata
        ),
        scal AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
                   CAST(SUM(nh) AS BIGINT) AS n,
                   CAST(SUM(sh) AS BIGINT) AS s,
                   CAST(SUM(qh) AS BIGINT) AS q,
                   CAST(SUM(th) AS BIGINT) AS tq
            FROM quant
        )
        SELECT n, n_strata,
               ROUND(CAST(s AS DOUBLE) / n, 4) AS mean_chars,
               ROUND((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                     / (n - 1) / n, 6) AS v_srs,
               ROUND(CAST(tq AS DOUBLE) / 1000000.0
                     / (CAST(n AS DOUBLE) * n), 6) AS v_strat,
               ROUND(CAST(tq AS DOUBLE) / 1000000.0
                     / (CAST(n AS DOUBLE) * n)
                     / ((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                        / (n - 1) / n), 6) AS deff
        FROM scal
    """,
    section="A156",
    doc="Design effect of stratifying the document corpus by source "
    "when estimating mean document length: DEFF = "
    "Var_strat(mean)/Var_srs(mean) with proportional allocation "
    "Var_strat = sum_h n_h S_h^2 / n^2 — the survey-sampling number "
    "that says how many SRS samples one stratified sample is worth "
    "(DEFF < 1 = stratification gain; ~1 here because the synthetic "
    "sources are homogeneous, which is itself the audit's finding). "
    "Per-stratum variances rebuild from exact int64 (n, s, q) "
    "moments; the cross-stratum sum quantizes each n_h*S_h^2 with "
    "floor(1e6 * x) BEFORE summing so no double accumulation order "
    "leaks (20 strata, same device as V39's ratio sums). Scale: one "
    "groupBy(source) + a 20-row reduction — trivially map-side.",
)
def q_agg_design_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    strata = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("nh"),
        F.sum("n_chars").cast("bigint").alias("sh"),
        F.sum(F.col("n_chars") * F.col("n_chars"))
        .cast("bigint")
        .alias("qh"),
    )
    sh2 = (
        F.col("qh").cast("double")
        - F.col("sh").cast("double") * F.col("sh") / F.col("nh")
    ) / (F.col("nh") - 1)
    quant = strata.select(
        "nh",
        "sh",
        "qh",
        F.floor(F.lit(1000000.0) * F.col("nh") * sh2)
        .cast("bigint")
        .alias("th"),
    )
    scal = quant.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_strata"),
        F.sum("nh").cast("bigint").alias("n"),
        F.sum("sh").cast("bigint").alias("s"),
        F.sum("qh").cast("bigint").alias("q"),
        F.sum("th").cast("bigint").alias("tq"),
    )
    v_srs = (
        (
            F.col("q").cast("double")
            - F.col("s").cast("double") * F.col("s") / F.col("n")
        )
        / (F.col("n") - 1)
        / F.col("n")
    )
    v_strat = (
        F.col("tq").cast("double")
        / F.lit(1000000.0)
        / (F.col("n").cast("double") * F.col("n"))
    )
    return scal.select(
        "n",
        "n_strata",
        F.round(F.col("s").cast("double") / F.col("n"), 4).alias(
            "mean_chars"
        ),
        F.round(v_srs, 6).alias("v_srs"),
        F.round(v_strat, 6).alias("v_strat"),
        F.round(v_strat / v_srs, 6).alias("deff"),
    )

# ==== wave 183a: GPD tail fit via probability-weighted moments ======


@register(
    "q_agg_gpd_pwm",
    oracle="""
        WITH cents AS (
            SELECT o_orderkey,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS v
            FROM orders
        ),
        sized AS (
            SELECT o_orderkey, v,
                   ROW_NUMBER() OVER (ORDER BY v DESC, o_orderkey)
                       AS rd,
                   COUNT(*) OVER () AS n
            FROM cents
        ),
        tail AS (
            SELECT o_orderkey, v FROM sized WHERE rd <= n // 10
        ),
        thresh AS (
            SELECT CAST(MIN(v) AS BIGINT) AS u FROM tail
        ),
        exc AS (
            SELECT CAST(t.v - th.u AS BIGINT) AS y,
                   CAST(ROW_NUMBER() OVER (ORDER BY t.v, t.o_orderkey)
                        AS BIGINT) AS r
            FROM tail t CROSS JOIN thresh th
        ),
        mom AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS m,
                   CAST(SUM(y) AS BIGINT) AS s0,
                   CAST(SUM((r - 1) * y) AS BIGINT) AS s1
            FROM exc
        )
        SELECT m, (SELECT u FROM thresh) AS u_cents,
               ROUND(CAST(s0 AS DOUBLE) / m, 4) AS b0,
               ROUND(CAST(s1 AS DOUBLE) / (CAST(m AS DOUBLE) * (m - 1)),
                     4) AS b1,
               ROUND(CAST(s0 AS DOUBLE) / m
                     / (CAST(s0 AS DOUBLE) / m
                        - 2.0 * CAST(s1 AS DOUBLE)
                          / (CAST(m AS DOUBLE) * (m - 1))) - 2.0, 6)
                   AS k_shape,
               ROUND(2.0 * (CAST(s0 AS DOUBLE) / m)
                     * (CAST(s1 AS DOUBLE)
                        / (CAST(m AS DOUBLE) * (m - 1)))
                     / (CAST(s0 AS DOUBLE) / m
                        - 2.0 * CAST(s1 AS DOUBLE)
                          / (CAST(m AS DOUBLE) * (m - 1))), 4)
                   AS sigma
        FROM mom
    """,
    section="A157",
    doc="Generalized-Pareto tail fit by probability-weighted moments "
    "(Hosking-Wallis) on order-total excesses over the nearest-rank "
    "P90 threshold: b0 = mean excess, b1 = E[Y F(Y)] estimated by "
    "the rank-weighted sum sum((r-1) y)/(m(m-1)); then k = "
    "b0/(b0-2b1) - 2 and sigma = 2 b0 b1/(b0-2b1) in the "
    "F(y) = 1-(1-ky/sigma)^(1/k) convention (k < 0 = heavy tail). "
    "This closes the tail-risk pair with A127's Hill estimator — "
    "PWM is the closed-form fit practitioners use when MLE won't "
    "converge on small tails, and unlike Hill it also yields the "
    "scale. Ranks fully tie-broken by (value, orderkey); both "
    "moment sums exact int64 (rank*cents ~ 1e16 at sf0.1, within "
    "int64). Scale: one global sort for the threshold + one for "
    "tail ranks (range-partitioned at 100 TB), then a scalar "
    "reduction.",
)
def q_agg_gpd_pwm(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    cents = od.select(
        "o_orderkey",
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("v"),
    )
    # Scale note (r6): both global ranks (top-decile tail selection and
    # the PWM order weights) run on the distributed two-pass rank
    # operator; the count-all window becomes a broadcast scalar.
    from ai_to_cvent_etl_spark.operators.ranking import global_row_number

    nn = cents.agg(F.count(F.lit(1)).alias("n"))
    sized = global_row_number(
        cents, [F.desc("v"), F.asc("o_orderkey")], out_col="rd"
    ).crossJoin(F.broadcast(nn))
    tail = sized.where(F.col("rd") <= F.expr("n div 10")).select(
        "o_orderkey", "v"
    )
    thresh = tail.agg(F.min("v").cast("bigint").alias("u"))
    exc = (
        global_row_number(tail, ["v", "o_orderkey"], out_col="r")
        .crossJoin(F.broadcast(thresh))
        .select(
            (F.col("v") - F.col("u")).cast("bigint").alias("y"),
            F.col("r"),
        )
    )
    mom = exc.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("y").cast("bigint").alias("s0"),
        F.sum((F.col("r") - 1) * F.col("y")).cast("bigint").alias("s1"),
    ).crossJoin(F.broadcast(thresh))
    b0 = F.col("s0").cast("double") / F.col("m")
    b1 = F.col("s1").cast("double") / (
        F.col("m").cast("double") * (F.col("m") - 1)
    )
    denom = b0 - F.lit(2.0) * b1
    return mom.select(
        "m",
        F.col("u").alias("u_cents"),
        F.round(b0, 4).alias("b0"),
        F.round(b1, 4).alias("b1"),
        F.round(b0 / denom - F.lit(2.0), 6).alias("k_shape"),
        F.round(F.lit(2.0) * b0 * b1 / denom, 4).alias("sigma"),
    )

@register(
    "q_agg_geometric_median",
    oracle=f"""
        WITH pts AS (
            SELECT CAST(CAST(c.c_acctbal AS DECIMAL(12,2)) * 100
                        AS BIGINT) AS x,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100)
                        AS BIGINT) AS y
            FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
            GROUP BY c.c_custkey, c.c_acctbal
        ),
        c0 AS (
            SELECT CAST(SUM(x) AS DOUBLE) / COUNT(*) AS mx,
                   CAST(SUM(y) AS DOUBLE) / COUNT(*) AS my,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM pts
        ),
        a1 AS {_GM_STEP.format(c="c0")},
        c1 AS (
            SELECT CAST(sxw AS DOUBLE) * 1e6 / sw AS mx,
                   CAST(syw AS DOUBLE) * 1e6 / sw AS my,
                   sd AS sd0
            FROM a1
        ),
        a2 AS {_GM_STEP.format(c="c1")},
        c2 AS (
            SELECT CAST(sxw AS DOUBLE) * 1e6 / sw AS mx,
                   CAST(syw AS DOUBLE) * 1e6 / sw AS my
            FROM a2
        ),
        final AS {_GM_STEP.format(c="c2")}
        SELECT c0.n,
               ROUND(c0.mx, 2) AS centroid_x,
               ROUND(c0.my, 2) AS centroid_y,
               ROUND(c2.mx, 2) AS gmedian_x,
               ROUND(c2.my, 2) AS gmedian_y,
               c1.sd0 AS sum_dist_centroid,
               f.sd AS sum_dist_gmedian,
               ROUND(100.0 * (c1.sd0 - f.sd) / c1.sd0, 4)
                   AS improvement_pct
        FROM c0 CROSS JOIN c1 CROSS JOIN c2 CROSS JOIN final f
    """,
    section="A158",
    doc="Geometric median (L1 facility-location center) of customers "
    "in the (account balance, lifetime spend) plane via TWO unrolled "
    "Weiszfeld iterations from the centroid: m <- sum(x/d)/sum(1/d), "
    "the point minimizing total Euclidean distance — robust to the "
    "outliers that drag the centroid (the mean is the L2 answer, "
    "A100's medians are per-axis; the geometric median is the true "
    "2-D robust center). Determinism: each iteration's weights "
    "quantize per row (floor(1e6 x/d), floor(1e12/d), floor toward "
    "-inf on both engines even for negative balances) so the "
    "re-estimation ratio divides two exact int64 sums; d guards "
    "GREATEST(d, 1e-9) against an exact hit. Total distance is "
    "re-measured at the start and after round 2 (floor(d) cents). "
    "Scale: each iteration is ONE broadcast of a scalar row + one "
    "map-side-combinable reduction — no driver loop, the V16 "
    "pca_power pattern in 2-D.",
)
def q_agg_geometric_median(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    pts = (
        cust.join(od, od.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_acctbal")
        .agg(
            F.expr(
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100)"
                " AS BIGINT)"
            ).alias("y")
        )
        .select(
            F.expr(
                "CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)"
            ).alias("x"),
            "y",
        )
        # points with NULL coordinates (corrupt inputs) cannot weight the
        # Weiszfeld step — and a NULL distance would collapse GREATEST to
        # the 1e-9 floor, overflowing the quantized weight sum (no-op on
        # clean fixtures)
        .where("x IS NOT NULL AND y IS NOT NULL")
        .localCheckpoint(eager=False)
    )

    def step(c):
        d = (
            "sqrt((CAST(x AS DOUBLE) - mx) * (CAST(x AS DOUBLE) - mx)"
            " + (CAST(y AS DOUBLE) - my) * (CAST(y AS DOUBLE) - my))"
        )
        return pts.crossJoin(F.broadcast(c)).agg(
            F.expr(
                f"CAST(SUM(CAST(floor(1000000.0 * x"
                f" / GREATEST({d}, 1e-9)) AS BIGINT)) AS BIGINT)"
            ).alias("sxw"),
            F.expr(
                f"CAST(SUM(CAST(floor(1000000.0 * y"
                f" / GREATEST({d}, 1e-9)) AS BIGINT)) AS BIGINT)"
            ).alias("syw"),
            F.expr(
                f"CAST(SUM(CAST(floor(1e12"
                f" / GREATEST({d}, 1e-9)) AS BIGINT)) AS BIGINT)"
            ).alias("sw"),
            F.expr(
                f"CAST(SUM(CAST(floor({d}) AS BIGINT)) AS BIGINT)"
            ).alias("sd"),
        )

    c0 = pts.agg(
        (F.sum("x").cast("double") / F.count(F.lit(1))).alias("mx"),
        (F.sum("y").cast("double") / F.count(F.lit(1))).alias("my"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    ).localCheckpoint(eager=False)
    a1 = step(c0.select("mx", "my"))
    c1 = a1.select(
        (F.col("sxw").cast("double") * F.lit(1e6) / F.col("sw")).alias(
            "mx"
        ),
        (F.col("syw").cast("double") * F.lit(1e6) / F.col("sw")).alias(
            "my"
        ),
        F.col("sd").alias("sd0"),
    ).localCheckpoint(eager=False)
    a2 = step(c1.select("mx", "my"))
    c2 = a2.select(
        (F.col("sxw").cast("double") * F.lit(1e6) / F.col("sw")).alias(
            "mx2"
        ),
        (F.col("syw").cast("double") * F.lit(1e6) / F.col("sw")).alias(
            "my2"
        ),
    ).localCheckpoint(eager=False)
    final = step(
        c2.select(F.col("mx2").alias("mx"), F.col("my2").alias("my"))
    )
    return (
        c0.crossJoin(F.broadcast(c1.select("sd0")))
        .crossJoin(F.broadcast(c2))
        .crossJoin(F.broadcast(final.select("sd")))
        .select(
            "n",
            F.round("mx", 2).alias("centroid_x"),
            F.round("my", 2).alias("centroid_y"),
            F.round("mx2", 2).alias("gmedian_x"),
            F.round("my2", 2).alias("gmedian_y"),
            F.col("sd0").alias("sum_dist_centroid"),
            F.col("sd").alias("sum_dist_gmedian"),
            F.round(
                F.lit(100.0) * (F.col("sd0") - F.col("sd"))
                / F.col("sd0"),
                4,
            ).alias("improvement_pct"),
        )
    )

# ==== wave 185a: Bowker symmetry test (paired k x k) ================


@register(
    "q_agg_bowker_symmetry",
    oracle="""
        WITH firstlast AS (
            SELECT o_custkey,
                   arg_min(o_orderpriority,
                           CAST(o_orderdate AS DATE)::VARCHAR
                           || '|' || lpad(CAST(o_orderkey AS VARCHAR),
                                          12, '0')) AS p_first,
                   arg_max(o_orderpriority,
                           CAST(o_orderdate AS DATE)::VARCHAR
                           || '|' || lpad(CAST(o_orderkey AS VARCHAR),
                                          12, '0')) AS p_last
            FROM orders
            GROUP BY o_custkey
            HAVING COUNT(*) >= 2
        ),
        cells AS (
            SELECT p_first AS i, p_last AS j,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM firstlast GROUP BY 1, 2
        ),
        pairs AS (
            SELECT a.i, a.j,
                   a.c AS nij,
                   COALESCE(b.c, 0) AS nji
            FROM cells a
            LEFT JOIN cells b ON b.i = a.j AND b.j = a.i
            WHERE a.i < a.j
        ),
        terms AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS df,
                   CAST(SUM(CAST(floor(1e9
                        * CAST((nij - nji) * (nij - nji) AS DOUBLE)
                        / (nij + nji)) AS BIGINT)) AS BIGINT) AS sq,
                   CAST(SUM(nij + nji) AS BIGINT) AS n_off
            FROM pairs WHERE nij + nji > 0
        )
        SELECT df, n_off,
               ROUND(CAST(sq AS DOUBLE) / 1e9, 6) AS bowker_chi2
        FROM terms
    """,
    section="A159",
    doc="Bowker symmetry test on the paired (first-order priority, "
    "last-order priority) table of multi-order customers: chi2 = "
    "sum_(i<j) (n_ij - n_ji)^2/(n_ij + n_ji), the k-level "
    "generalization of A88's 2x2 McNemar — it asks whether customer "
    "priority MIGRATION is symmetric (upgrades balance downgrades) "
    "rather than whether the marginals differ, which is what a "
    "plain chi-square would test. First/last orders are picked by "
    "arg_min/arg_max over a zero-padded (date|orderkey) string key "
    "(the TS1 total-order device, since ties on date are real). "
    "Each off-diagonal term quantizes floor(1e9 * term) BEFORE the "
    "sum over <= 10 cell pairs, so no double accumulation order "
    "leaks; df = #pairs with n_ij + n_ji > 0. Scale: one customer-"
    "grain agg, one 25-cell pairing — constant-size tail.",
)
def q_agg_bowker_symmetry(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    key = F.concat(
        F.col("o_orderdate").cast("date").cast("string"),
        F.lit("|"),
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0"),
    )
    firstlast = (
        od.groupBy("o_custkey")
        .agg(
            F.expr(
                "min_by(o_orderpriority,"
                " CAST(CAST(o_orderdate AS DATE) AS STRING) || '|'"
                " || lpad(CAST(o_orderkey AS STRING), 12, '0'))"
            ).alias("p_first"),
            F.expr(
                "max_by(o_orderpriority,"
                " CAST(CAST(o_orderdate AS DATE) AS STRING) || '|'"
                " || lpad(CAST(o_orderkey AS STRING), 12, '0'))"
            ).alias("p_last"),
            F.count(F.lit(1)).alias("n_ord"),
        )
        .where(F.col("n_ord") >= 2)
    )
    cells = firstlast.groupBy(
        F.col("p_first").alias("i"), F.col("p_last").alias("j")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    rev = cells.select(
        F.col("j").alias("i"), F.col("i").alias("j"),
        F.col("c").alias("c_rev"),
    )
    pairs = (
        cells.join(rev, ["i", "j"], "left")
        .where(F.col("i") < F.col("j"))
        .select(
            F.col("c").alias("nij"),
            F.coalesce(F.col("c_rev"), F.lit(0)).alias("nji"),
        )
    )
    terms = pairs.where(F.col("nij") + F.col("nji") > 0).agg(
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.sum(
            F.floor(
                F.lit(1e9)
                * (
                    (F.col("nij") - F.col("nji"))
                    * (F.col("nij") - F.col("nji"))
                ).cast("double")
                / (F.col("nij") + F.col("nji"))
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("sq"),
        F.sum(F.col("nij") + F.col("nji"))
        .cast("bigint")
        .alias("n_off"),
    )
    return terms.select(
        "df",
        "n_off",
        F.round(F.col("sq").cast("double") / F.lit(1e9), 6).alias(
            "bowker_chi2"
        ),
    )

# ==== wave 186a: ridge regression path (closed form, 2 predictors) ==


@register(
    "q_agg_ridge_path",
    oracle="""
        WITH frame AS (
            SELECT CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) // 100 AS y,
                   CAST(SUM(CAST(l.l_quantity AS INT)) AS BIGINT) AS x1,
                   CAST(COUNT(*) AS BIGINT) AS x2
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderkey, o.o_totalprice
        ),
        mom AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x1) AS BIGINT) AS s1,
                   CAST(SUM(x2) AS BIGINT) AS s2,
                   CAST(SUM(x1 * x1) AS BIGINT) AS q11,
                   CAST(SUM(x2 * x2) AS BIGINT) AS q22,
                   CAST(SUM(x1 * x2) AS BIGINT) AS q12,
                   CAST(SUM(x1 * y) AS BIGINT) AS c1,
                   CAST(SUM(x2 * y) AS BIGINT) AS c2
            FROM frame
        ),
        cen AS (
            SELECT n,
                   CAST(sy AS DOUBLE) / n AS my,
                   CAST(s1 AS DOUBLE) / n AS m1,
                   CAST(s2 AS DOUBLE) / n AS m2,
                   CAST(q11 AS DOUBLE)
                   - CAST(s1 AS DOUBLE) * s1 / n AS a11,
                   CAST(q22 AS DOUBLE)
                   - CAST(s2 AS DOUBLE) * s2 / n AS a22,
                   CAST(q12 AS DOUBLE)
                   - CAST(s1 AS DOUBLE) * s2 / n AS a12,
                   CAST(c1 AS DOUBLE)
                   - CAST(s1 AS DOUBLE) * sy / n AS b1v,
                   CAST(c2 AS DOUBLE)
                   - CAST(s2 AS DOUBLE) * sy / n AS b2v
            FROM mom
        ),
        lams AS (SELECT CAST(unnest([0.0, 0.1, 1.0]) AS DOUBLE)
                     AS lam_frac),
        solved AS (
            SELECT c.n, l.lam_frac,
                   l.lam_frac * (c.a11 + c.a22) / 2.0 AS lam,
                   ((c.a22 + l.lam_frac * (c.a11 + c.a22) / 2.0) * c.b1v
                    - c.a12 * c.b2v)
                   / ((c.a11 + l.lam_frac * (c.a11 + c.a22) / 2.0)
                      * (c.a22 + l.lam_frac * (c.a11 + c.a22) / 2.0)
                      - c.a12 * c.a12) AS beta1,
                   ((c.a11 + l.lam_frac * (c.a11 + c.a22) / 2.0) * c.b2v
                    - c.a12 * c.b1v)
                   / ((c.a11 + l.lam_frac * (c.a11 + c.a22) / 2.0)
                      * (c.a22 + l.lam_frac * (c.a11 + c.a22) / 2.0)
                      - c.a12 * c.a12) AS beta2,
                   c.my, c.m1, c.m2
            FROM cen c CROSS JOIN lams l
        )
        SELECT n, lam_frac,
               ROUND(beta1, 6) AS beta_qty,
               ROUND(beta2, 6) AS beta_lines,
               ROUND(my - beta1 * m1 - beta2 * m2, 4) AS intercept,
               ROUND(sqrt(beta1 * beta1 + beta2 * beta2), 6)
                   AS coef_norm
        FROM solved
    """,
    section="A160",
    doc="Ridge regression path (closed form, 2 predictors) of order "
    "dollars on quantity sum and line count: solve (C + lambda I) "
    "beta = c by 2x2 Cramer on CENTERED co-moments, for lambda = "
    "{0, 0.1, 1.0} x trace(C)/2 — a scale-free regularization grid, "
    "so the output is the coefficient SHRINKAGE PATH (lam_frac = 0 "
    "reproduces A61's OLS; coef_norm strictly decreases), the "
    "standard diagnostic for collinearity between qty and lines. "
    "All nine moments are exact int64 one-pass sums; centering and "
    "the Cramer solve are pinned double expressions duplicated per "
    "lambda row (3-row unnest/explode — no iteration, the path is "
    "data-parallel). Scale: one order-grain agg + a scalar-row "
    "cross join with a 3-element literal array.",
)
def q_agg_ridge_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    frame = (
        od.join(li, li.l_orderkey == od.o_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(
            F.sum(F.col("l_quantity").cast("int"))
            .cast("bigint")
            .alias("x1"),
            F.count(F.lit(1)).cast("bigint").alias("x2"),
        )
        .select(
            F.expr(
                "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
                " AS BIGINT) div 100"
            ).alias("y"),
            "x1",
            "x2",
        )
    )
    mom = frame.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum("x1").cast("bigint").alias("s1"),
        F.sum("x2").cast("bigint").alias("s2"),
        F.sum(F.col("x1") * F.col("x1")).cast("bigint").alias("q11"),
        F.sum(F.col("x2") * F.col("x2")).cast("bigint").alias("q22"),
        F.sum(F.col("x1") * F.col("x2")).cast("bigint").alias("q12"),
        F.sum(F.col("x1") * F.col("y")).cast("bigint").alias("c1"),
        F.sum(F.col("x2") * F.col("y")).cast("bigint").alias("c2"),
    )
    cen = mom.select(
        "n",
        (F.col("sy").cast("double") / F.col("n")).alias("my"),
        (F.col("s1").cast("double") / F.col("n")).alias("m1"),
        (F.col("s2").cast("double") / F.col("n")).alias("m2"),
        (
            F.col("q11").cast("double")
            - F.col("s1").cast("double") * F.col("s1") / F.col("n")
        ).alias("a11"),
        (
            F.col("q22").cast("double")
            - F.col("s2").cast("double") * F.col("s2") / F.col("n")
        ).alias("a22"),
        (
            F.col("q12").cast("double")
            - F.col("s1").cast("double") * F.col("s2") / F.col("n")
        ).alias("a12"),
        (
            F.col("c1").cast("double")
            - F.col("s1").cast("double") * F.col("sy") / F.col("n")
        ).alias("b1v"),
        (
            F.col("c2").cast("double")
            - F.col("s2").cast("double") * F.col("sy") / F.col("n")
        ).alias("b2v"),
    )
    lams = cen.select(
        "*",
        F.explode(
            F.array(F.lit(0.0), F.lit(0.1), F.lit(1.0))
        ).alias("lam_frac"),
    )
    lam = F.col("lam_frac") * (F.col("a11") + F.col("a22")) / F.lit(2.0)
    det = (
        (F.col("a11") + lam) * (F.col("a22") + lam)
        - F.col("a12") * F.col("a12")
    )
    beta1 = ((F.col("a22") + lam) * F.col("b1v")
             - F.col("a12") * F.col("b2v")) / det
    beta2 = ((F.col("a11") + lam) * F.col("b2v")
             - F.col("a12") * F.col("b1v")) / det
    return lams.select(
        "n",
        "lam_frac",
        F.round(beta1, 6).alias("beta_qty"),
        F.round(beta2, 6).alias("beta_lines"),
        F.round(
            F.col("my") - beta1 * F.col("m1") - beta2 * F.col("m2"), 4
        ).alias("intercept"),
        F.round(F.sqrt(beta1 * beta1 + beta2 * beta2), 6).alias(
            "coef_norm"
        ),
    )

# ==== wave 187b: Kupiec proportion-of-failures VaR backtest =========


@register(
    "q_agg_kupiec_pof",
    oracle="""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS d,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) AS cents
            FROM orders GROUP BY 1
        ),
        diffs AS (
            SELECT d,
                   CAST(cents - LAG(cents) OVER (ORDER BY d) AS BIGINT)
                       AS r,
                   CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS t,
                   CAST(COUNT(*) OVER () AS BIGINT) AS n
            FROM daily
            QUALIFY r IS NOT NULL
        ),
        train AS (
            SELECT r, ROW_NUMBER() OVER (ORDER BY r, d) AS rk,
                   COUNT(*) OVER () AS nt
            FROM diffs WHERE 2 * t <= n
        ),
        var95 AS (
            SELECT CAST(r AS BIGINT) AS v,
                   CAST(nt AS BIGINT) AS n_train
            FROM train
            WHERE rk = CAST(ceil(0.05 * nt) AS BIGINT)
        ),
        test AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
                   CAST(SUM(CASE WHEN df.r < v.v THEN 1 ELSE 0 END)
                        AS BIGINT) AS x
            FROM (SELECT r FROM diffs WHERE 2 * t > n) df
            CROSS JOIN var95 v
        )
        SELECT v.n_train, t.n_test, v.v AS var95_cents, t.x
                   AS n_violations,
               ROUND(CAST(t.x AS DOUBLE) / t.n_test, 6) AS viol_rate,
               ROUND(-2.0 * ((t.n_test - t.x) * ln(0.95)
                     + t.x * ln(0.05)
                     - CASE WHEN t.x = 0 OR t.x = t.n_test THEN 0.0
                            ELSE (t.n_test - t.x)
                                 * ln(1.0 - CAST(t.x AS DOUBLE)
                                            / t.n_test)
                                 + t.x * ln(CAST(t.x AS DOUBLE)
                                            / t.n_test) END), 4)
                   AS kupiec_lr,
               CASE WHEN -2.0 * ((t.n_test - t.x) * ln(0.95)
                     + t.x * ln(0.05)
                     - CASE WHEN t.x = 0 OR t.x = t.n_test THEN 0.0
                            ELSE (t.n_test - t.x)
                                 * ln(1.0 - CAST(t.x AS DOUBLE)
                                            / t.n_test)
                                 + t.x * ln(CAST(t.x AS DOUBLE)
                                            / t.n_test) END) > 3.841
                    THEN 1 ELSE 0 END AS reject_95
        FROM var95 v CROSS JOIN test t
    """,
    section="A161",
    doc="Kupiec proportion-of-failures backtest of a historical "
    "VaR(95): train on the first half of daily revenue changes "
    "(nearest-rank 5th percentile, tie-broken by date), count "
    "strict violations in the held-out second half, and test "
    "x/n = 5% with the likelihood ratio LR = -2[ (n-x)ln(1-p) + "
    "x ln p - (n-x)ln(1-x/n) - x ln(x/n) ] ~ chi2(1) — the Basel "
    "coverage test that A145's VaR/ES computation (same family) is "
    "audited WITH in practice: a VaR that never trips is as wrong "
    "as one tripping constantly, and LR catches both sides. "
    "Violations/threshold are exact integer work; ln() runs only in "
    "the final scalar row (x=0 / x=n limits handled by an explicit "
    "CASE, not NaN), rounded 4dp. Scale: one day-grain agg, one lag "
    "window, one rank window over half the days, scalar algebra.",
)
def q_agg_kupiec_pof(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    daily = od.groupBy(
        F.col("o_orderdate").cast("date").alias("d")
    ).agg(
        F.expr(
            "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 "
            "AS BIGINT)"
        ).alias("cents")
    )
    w = Window.orderBy("d")
    diffs = daily.select(
        "d",
        (F.col("cents") - F.lag("cents").over(w))
        .cast("bigint")
        .alias("r"),
        F.row_number().over(w).cast("bigint").alias("t"),
        F.count(F.lit(1))
        .over(Window.partitionBy())
        .cast("bigint")
        .alias("n"),
    ).where(F.col("r").isNotNull())
    train = diffs.where(2 * F.col("t") <= F.col("n")).select(
        "r",
        "d",
        F.row_number().over(Window.orderBy("r", "d")).alias("rk"),
        F.count(F.lit(1))
        .over(Window.partitionBy())
        .cast("bigint")
        .alias("nt"),
    )
    var95 = train.where(
        F.col("rk") == F.ceil(F.lit(0.05) * F.col("nt")).cast("bigint")
    ).select(
        F.col("r").cast("bigint").alias("v"),
        F.col("nt").alias("n_train"),
    )
    test = (
        diffs.where(2 * F.col("t") > F.col("n"))
        .crossJoin(F.broadcast(var95))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum(F.when(F.col("r") < F.col("v"), 1).otherwise(0))
            .cast("bigint")
            .alias("x"),
        )
    )
    out = var95.crossJoin(F.broadcast(test))
    xr = F.col("x").cast("double") / F.col("n_test")
    lr = F.lit(-2.0) * (
        (F.col("n_test") - F.col("x")) * F.log(F.lit(0.95))
        + F.col("x") * F.log(F.lit(0.05))
        - F.when(
            (F.col("x") == 0) | (F.col("x") == F.col("n_test")),
            F.lit(0.0),
        ).otherwise(
            (F.col("n_test") - F.col("x")) * F.log(F.lit(1.0) - xr)
            + F.col("x") * F.log(xr)
        )
    )
    return out.select(
        "n_train",
        "n_test",
        F.col("v").alias("var95_cents"),
        F.col("x").alias("n_violations"),
        F.round(xr, 6).alias("viol_rate"),
        F.round(lr, 4).alias("kupiec_lr"),
        F.when(lr > F.lit(3.841), 1).otherwise(0).alias("reject_95"),
    )

# ==== wave 188a: exact 1-D Wasserstein distance =====================


@register(
    "q_agg_wasserstein_1d",
    oracle="""
        WITH vals AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END AS gx,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS cents
            FROM orders
        ),
        walk AS (
            SELECT cents, gx,
                   CAST(SUM(gx) OVER w AS BIGINT) AS cx,
                   CAST(SUM(1 - gx) OVER w AS BIGINT) AS cy,
                   CAST(LEAD(cents) OVER (ORDER BY cents, o_orderkey)
                        - cents AS BIGINT) AS gap
            FROM vals
            WINDOW w AS (ORDER BY cents, o_orderkey
                         ROWS UNBOUNDED PRECEDING)
        ),
        sums AS (
            SELECT
                (SELECT CAST(SUM(gx) AS BIGINT) FROM vals) AS n,
                (SELECT CAST(SUM(1 - gx) AS BIGINT) FROM vals) AS m,
                SUM(ABS(CAST((SELECT SUM(1 - gx) FROM vals) AS HUGEINT)
                        * cx
                        - CAST((SELECT SUM(gx) FROM vals) AS HUGEINT)
                          * cy) * gap) AS acc
            FROM walk WHERE gap IS NOT NULL
        )
        SELECT n AS n_x, m AS n_y,
               ROUND((CAST(acc // 4294967296 AS DOUBLE) * 4294967296.0
                      + CAST(acc % 4294967296 AS DOUBLE))
                     / (CAST(n AS DOUBLE) * m), 4) AS w1_cents
        FROM sums
    """,
    section="A162",
    doc="Exact 1-D Wasserstein-1 (earth mover's) distance between "
    "urgent/high and other order-total distributions: W1 = "
    "integral |F - G| dz computed as the sorted-merge sum of "
    "|m*cx - n*cy| * gap over consecutive distinct values — the "
    "optimal-transport metric that reports HOW FAR mass must move "
    "(in cents), where A153's CvM and A36's KS report only "
    "unit-free discrepancy; this is the number behind 'distribution "
    "shift cost' in drift monitoring. Cross-multiplying by n*m "
    "keeps every ECDF difference an exact integer (ties contribute "
    "gap = 0 automatically under the tie-broken sort); the "
    "accumulator crosses 2^63 (|m*cx|*gap ~ 1e17 per row) so it "
    "runs in int128/DECIMAL(38,0) and rebuilds through the A26 "
    "hi/lo device. Scale: ONE global sort + one prefix window — "
    "the same shape as a percentile, range-partition the sort at "
    "100 TB.",
)
def q_agg_wasserstein_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    vals = od.select(
        "o_orderkey",
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        )
        .otherwise(0)
        .alias("gx"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("cents"),
    )
    # Scale note (r6): one distributed prefix-sum pass yields the global
    # index t and both empirical CDF counts; lead(cents) becomes a t -> t+1
    # self-join on the dense index (hash join, parallel) — no
    # single-partition window anywhere.
    from ai_to_cvent_etl_spark.operators.ranking import global_cumulative

    cum = global_cumulative(
        vals,
        ["cents", "o_orderkey"],
        {"t": F.lit(1), "cx": F.col("gx"), "cy": 1 - F.col("gx")},
    ).localCheckpoint(eager=False)
    nxt = cum.select(
        (F.col("t") - 1).alias("t"), F.col("cents").alias("next_cents")
    )
    walk = (
        cum.join(nxt, "t", "left")
        .select(
            "cents",
            F.col("cx").cast("bigint").alias("cx"),
            F.col("cy").cast("bigint").alias("cy"),
            (F.col("next_cents") - F.col("cents"))
            .cast("bigint")
            .alias("gap"),
        )
    )
    tot = vals.agg(
        F.sum("gx").cast("bigint").alias("n"),
        F.sum(1 - F.col("gx")).cast("bigint").alias("m"),
    )
    sums = (
        walk.where(F.col("gap").isNotNull())
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                F.abs(
                    F.col("m").cast(DecimalType(38, 0)) * F.col("cx")
                    - F.col("n").cast(DecimalType(38, 0)) * F.col("cy")
                )
                * F.col("gap")
            ).alias("acc"),
            F.max("n").alias("n"),
            F.max("m").alias("m"),
        )
    )
    hi_lo = (
        "cast(acc div 4294967296 as double) * 4294967296.0d"
        " + cast(acc % 4294967296 as double)"
    )
    return sums.select(
        F.col("n").alias("n_x"),
        F.col("m").alias("n_y"),
        F.round(
            F.expr(hi_lo) / (F.col("n").cast("double") * F.col("m")), 4
        ).alias("w1_cents"),
    )

# ==== wave 189b: 3-way mutual-independence G-test ===================


@register(
    "q_agg_g_test_3way",
    oracle="""
        WITH base AS (
            SELECT o.o_orderpriority AS p, o.o_orderstatus AS s,
                   r.r_name AS g
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
        ),
        cells AS (
            SELECT p, s, g, CAST(COUNT(*) AS BIGINT) AS o
            FROM base GROUP BY 1, 2, 3
        ),
        margs AS (
            SELECT c.p, c.s, c.g, c.o,
                   SUM(c.o) OVER (PARTITION BY c.p) AS np,
                   SUM(c.o) OVER (PARTITION BY c.s) AS ns,
                   SUM(c.o) OVER (PARTITION BY c.g) AS ng,
                   SUM(c.o) OVER () AS n
            FROM cells c
        ),
        terms AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
                   CAST(MAX(n) AS BIGINT) AS n,
                   CAST(SUM(CAST(floor(1e6 * 2.0 * o
                        * ln(CAST(o AS DOUBLE)
                             * CAST(n AS DOUBLE) * n
                             / (CAST(np AS DOUBLE) * ns * ng)))
                        AS BIGINT)) AS BIGINT) AS gq
            FROM margs
        )
        SELECT n, n_cells,
               ROUND(CAST(gq AS DOUBLE) / 1e6, 4) AS g_stat,
               CAST((5 - 1) * (3 - 1) + (5 - 1) * (5 - 1)
                    + (3 - 1) * (5 - 1)
                    + (5 - 1) * (3 - 1) * (5 - 1) AS BIGINT) AS df
        FROM terms
    """,
    section="A163",
    doc="Three-way mutual-independence G-test over (priority, "
    "status, region): G = 2 sum o*ln(o n^2/(n_p n_s n_g)) — the "
    "log-likelihood-ratio generalization of A23's 2-way chi-square "
    "to the full 5x3x5 cube, testing whether the THREE margins "
    "jointly explain the cell counts (the saturated-vs-independence "
    "contrast that starts every log-linear model selection). "
    "Marginals ride window sums over the 75-cell frame; each cell's "
    "G term quantizes floor(1e6 * term) BEFORE the sum so ln()'s "
    "possible last-ulp engine difference can't reorder-accumulate "
    "(75 bounded terms, V39 device); df = rc + rt + ct + rct for "
    "mutual independence = 46. Empty cells never appear (GROUP BY "
    "emits observed cells only; o*ln(o..) -> o >= 1 always). "
    "Scale: one 3-key agg (75 cells max), window marginals over a "
    "constant-size frame.",
)
def q_agg_g_test_3way(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    base = (
        od.join(cust, od.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .join(
            F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey")
        )
        .select(
            F.col("o_orderpriority").alias("p"),
            F.col("o_orderstatus").alias("s"),
            F.col("r_name").alias("g"),
        )
    )
    cells = base.groupBy("p", "s", "g").agg(
        F.count(F.lit(1)).cast("bigint").alias("o")
    )
    margs = cells.select(
        "o",
        F.sum("o").over(Window.partitionBy("p")).alias("np"),
        F.sum("o").over(Window.partitionBy("s")).alias("ns"),
        F.sum("o").over(Window.partitionBy("g")).alias("ng"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    term = F.floor(
        F.lit(1e6)
        * F.lit(2.0)
        * F.col("o")
        * F.log(
            F.col("o").cast("double")
            * F.col("n").cast("double")
            * F.col("n")
            / (
                F.col("np").cast("double") * F.col("ns") * F.col("ng")
            )
        )
    ).cast("bigint")
    terms = margs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.max("n").cast("bigint").alias("n"),
        F.sum(term).cast("bigint").alias("gq"),
    )
    return terms.select(
        "n",
        "n_cells",
        F.round(F.col("gq").cast("double") / F.lit(1e6), 4).alias(
            "g_stat"
        ),
        F.lit(
            (5 - 1) * (3 - 1)
            + (5 - 1) * (5 - 1)
            + (3 - 1) * (5 - 1)
            + (5 - 1) * (3 - 1) * (5 - 1)
        )
        .cast("bigint")
        .alias("df"),
    )

@register(
    "q_agg_nemenyi_posthoc",
    oracle=f"""
        WITH cells AS (
            SELECT n.n_name AS blk, o.o_orderpriority AS trt,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) AS v
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1, 2
        ),
        full_blocks AS (
            SELECT blk FROM cells GROUP BY blk HAVING COUNT(*) = 5
        ),
        ranked AS (
            SELECT c.trt,
                   CAST(RANK() OVER (PARTITION BY c.blk
                                     ORDER BY c.v, c.trt) AS BIGINT)
                       AS r
            FROM cells c JOIN full_blocks f ON f.blk = c.blk
        ),
        rs AS (
            SELECT trt, CAST(SUM(r) AS BIGINT) AS rsum,
                   CAST((SELECT COUNT(*) FROM full_blocks) AS BIGINT)
                       AS b
            FROM ranked GROUP BY trt
        )
        SELECT a.trt AS trt_a, c.trt AS trt_b,
               a.rsum AS rank_sum_a, c.rsum AS rank_sum_b,
               ROUND(ABS(CAST(a.rsum - c.rsum AS DOUBLE)) / a.b, 4)
                   AS mean_rank_diff,
               ROUND({_NEM_Q5} * sqrt(5.0 * 6.0
                     / (6.0 * a.b)), 4) AS critical_difference,
               CASE WHEN ABS(CAST(a.rsum - c.rsum AS DOUBLE)) / a.b
                         > {_NEM_Q5} * sqrt(5.0 * 6.0 / (6.0 * a.b))
                    THEN 1 ELSE 0 END AS significant
        FROM rs a JOIN rs c ON a.trt < c.trt
    """,
    section="A164",
    doc="Nemenyi post-hoc critical-difference table after a Friedman "
    "test (nation blocks x priority treatments): pairwise mean-rank "
    "differences vs CD = q(0.05, k)/sqrt(2) * sqrt(k(k+1)/(6b)) — "
    "the multiple-comparison step A65/A155 require before claiming "
    "WHICH treatments differ (reporting a significant omnibus "
    "without a CD-controlled pairwise table is the classic "
    "rank-test misuse; this is also THE standard diagram for "
    "comparing classifiers across datasets, Demsar 2006). Per-block "
    "ranks are fully tie-broken, rank sums exact int64; the only "
    "constants are the studentized-range literal and k=5, so CD is "
    "one pinned expression and the 10 significance flags are "
    "deterministic compares. Scale: one (nation,priority) agg, one "
    "5-row self-join.",
)
def q_agg_nemenyi_posthoc(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    cells = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .groupBy(
            F.col("n_name").alias("blk"),
            F.col("o_orderpriority").alias("trt"),
        )
        .agg(
            F.expr(
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 "
                "AS BIGINT)"
            ).alias("v")
        )
    )
    full_blocks = (
        cells.groupBy("blk")
        .agg(F.count(F.lit(1)).alias("nc"))
        .where(F.col("nc") == 5)
        .select("blk")
    )
    ranked = cells.join(full_blocks, "blk").select(
        "trt",
        F.rank()
        .over(Window.partitionBy("blk").orderBy("v", "trt"))
        .cast("bigint")
        .alias("r"),
    )
    b_cnt = full_blocks.agg(
        F.count(F.lit(1)).cast("bigint").alias("b")
    )
    rs = (
        ranked.groupBy("trt")
        .agg(F.sum("r").cast("bigint").alias("rsum"))
        .crossJoin(F.broadcast(b_cnt))
    )
    a = rs.select(
        F.col("trt").alias("trt_a"),
        F.col("rsum").alias("rank_sum_a"),
        "b",
    )
    c = rs.select(
        F.col("trt").alias("trt_b"), F.col("rsum").alias("rank_sum_b")
    )
    # 5x5 treatment pairs: broadcast the right side so the theta join plans
    # as BroadcastNestedLoopJoin, never CartesianProduct
    pairs = a.join(F.broadcast(c), F.col("trt_a") < F.col("trt_b"))
    diff = (
        F.abs(
            (F.col("rank_sum_a") - F.col("rank_sum_b")).cast("double")
        )
        / F.col("b")
    )
    cd = F.lit(_NEM_Q5) * F.sqrt(
        F.lit(5.0) * F.lit(6.0) / (F.lit(6.0) * F.col("b"))
    )
    return pairs.select(
        "trt_a",
        "trt_b",
        "rank_sum_a",
        "rank_sum_b",
        F.round(diff, 4).alias("mean_rank_diff"),
        F.round(cd, 4).alias("critical_difference"),
        F.when(diff > cd, 1).otherwise(0).alias("significant"),
    )

# ==== wave 194a: Moran's I spatial autocorrelation ==================


@register(
    "q_agg_morans_i",
    oracle="""
        WITH natrev AS (
            SELECT n.n_nationkey AS nk, n.n_regionkey AS rk,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) AS x
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1, 2
        ),
        scal AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS s
            FROM natrev
        ),
        cent AS (
            SELECT nk, rk,
                   CAST(sc.n AS HUGEINT) * x - sc.s AS u
            FROM natrev CROSS JOIN scal sc
        ),
        cross_terms AS (
            SELECT SUM(a.u * b.u) AS num,
                   CAST(COUNT(*) AS BIGINT) AS w0
            FROM cent a JOIN cent b
              ON a.rk = b.rk AND a.nk <> b.nk
        ),
        selfsq AS (
            SELECT SUM(u * u) AS den FROM cent
        )
        SELECT sc.n, ct.w0,
               ROUND(CAST(sc.n AS DOUBLE) / ct.w0
                     * (CAST(ct.num // 4294967296 AS DOUBLE)
                        * 4294967296.0
                        + CAST(ct.num % 4294967296 AS DOUBLE))
                     / (CAST(ss.den // 4294967296 AS DOUBLE)
                        * 4294967296.0
                        + CAST(ss.den % 4294967296 AS DOUBLE)), 6)
                   AS morans_i,
               ROUND(-1.0 / (sc.n - 1), 6) AS e_null
        FROM cross_terms ct CROSS JOIN selfsq ss CROSS JOIN scal sc
    """,
    section="A166",
    doc="Moran's I spatial autocorrelation of nation revenue with "
    "same-region contiguity weights: I = (n/W0) * sum_ij w_ij z_i "
    "z_j / sum z_i^2 — THE spatial-clustering statistic (do "
    "neighboring economies move together?), with null expectation "
    "-1/(n-1), a question A20-style grouped means can't pose "
    "because it's about the CROSS terms. Determinism: center by "
    "u_i = n*x_i - S (exact int128 — the n-scaling cancels in the "
    "ratio), cross products u_i u_j ~ 1e24 accumulate in "
    "HUGEINT/DECIMAL(38,0), both sums rebuild through the A26 hi/lo "
    "device, and the weight matrix never materializes — the "
    "same-region self-join IS w_ij = 1. Scale: facts collapse to "
    "25 nation rows first; the spatial join is 25x25 within region "
    "blocks.",
)
def q_agg_morans_i(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    na = load_table(spark, sf_dir, "nation")
    natrev = (
        od.join(cu, od.o_custkey == cu.c_custkey)
        .join(
            F.broadcast(na), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .groupBy(
            F.col("n_nationkey").alias("nk"),
            F.col("n_regionkey").alias("rk"),
        )
        .agg(
            F.expr(
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 "
                "AS BIGINT)"
            ).alias("x")
        )
    )
    scal = natrev.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
    )
    cent = natrev.crossJoin(F.broadcast(scal)).select(
        "nk",
        "rk",
        "n",
        (
            F.col("n").cast(DecimalType(38, 0)) * F.col("x")
            - F.col("s")
        ).alias("u"),
    )
    a = cent.select(
        F.col("rk").alias("rk"), F.col("nk").alias("nka"),
        F.col("u").alias("ua"),
    )
    b = cent.select(
        F.col("rk").alias("rk"), F.col("nk").alias("nkb"),
        F.col("u").alias("ub"),
    )
    cross_terms = (
        a.join(b, "rk")
        .where(F.col("nka") != F.col("nkb"))
        .agg(
            F.sum(F.col("ua") * F.col("ub")).alias("num"),
            F.count(F.lit(1)).cast("bigint").alias("w0"),
        )
    )
    selfsq = cent.agg(F.sum(F.col("u") * F.col("u")).alias("den"))
    out = (
        cross_terms.crossJoin(F.broadcast(selfsq))
        .crossJoin(F.broadcast(scal))
    )
    hi_lo = (
        "cast({0} div 4294967296 as double) * 4294967296.0d"
        " + cast({0} % 4294967296 as double)"
    )
    return out.select(
        "n",
        "w0",
        F.round(
            F.col("n").cast("double") / F.col("w0")
            * F.expr(hi_lo.format("num"))
            / F.expr(hi_lo.format("den")),
            6,
        ).alias("morans_i"),
        F.round(F.lit(-1.0) / (F.col("n") - 1), 6).alias("e_null"),
    )

# ==== wave 195a: Hoover (Robin Hood) index ==========================


@register(
    "q_agg_hoover_index",
    oracle="""
        WITH rev AS (
            SELECT o_custkey,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100)
                        AS BIGINT) AS x
            FROM orders GROUP BY o_custkey
        ),
        scal AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS t
            FROM rev
        ),
        dev AS (
            SELECT SUM(ABS(CAST(s.n AS HUGEINT) * r.x - s.t)) AS sad,
                   CAST(MAX(s.n) AS BIGINT) AS n,
                   CAST(MAX(s.t) AS BIGINT) AS t
            FROM rev r CROSS JOIN scal s
        )
        SELECT n, t AS total_cents,
               ROUND((CAST(sad // 4294967296 AS DOUBLE) * 4294967296.0
                      + CAST(sad % 4294967296 AS DOUBLE))
                     / (2.0 * CAST(n AS DOUBLE) * t), 6)
                   AS hoover_index
        FROM dev
    """,
    section="A167",
    doc="Hoover (Robin Hood) index of customer revenue "
    "concentration: H = (1/2) sum |x_i/T - 1/n| — the fraction of "
    "total revenue that would have to be REDISTRIBUTED for "
    "perfect equality, the operational reading A29's Gini lacks "
    "(Gini is a rank-area abstraction; Hoover is 'move 23% of the "
    "dollars'), and equals the maximum vertical Lorenz-diagonal "
    "gap. Cross-multiplying clears every fraction: sum |n*x_i - T| "
    "runs in int128 (n*x ~ 1e16 at sf0.1) and rebuilds via the A26 "
    "hi/lo device into ONE division by 2nT. Scale: one customer "
    "agg, one scalar broadcast, one map-side absolute-deviation "
    "reduction.",
)
def q_agg_hoover_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    rev = od.groupBy("o_custkey").agg(
        F.expr(
            "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100)"
            " AS BIGINT)"
        ).alias("x")
    )
    scal = rev.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("t"),
    )
    dev = rev.crossJoin(F.broadcast(scal)).agg(
        F.sum(
            F.abs(
                F.col("n").cast(DecimalType(38, 0)) * F.col("x")
                - F.col("t")
            )
        ).alias("sad"),
        F.max("n").cast("bigint").alias("n"),
        F.max("t").cast("bigint").alias("t"),
    )
    hi_lo = (
        "cast(sad div 4294967296 as double) * 4294967296.0d"
        " + cast(sad % 4294967296 as double)"
    )
    return dev.select(
        "n",
        F.col("t").alias("total_cents"),
        F.round(
            F.expr(hi_lo)
            / (F.lit(2.0) * F.col("n").cast("double") * F.col("t")),
            6,
        ).alias("hoover_index"),
    )

# ==== wave 196a: Geary's C spatial contiguity ratio =================


@register(
    "q_agg_geary_c",
    oracle="""
        WITH natrev AS (
            SELECT n.n_nationkey AS nk, n.n_regionkey AS rk,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) AS x
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1, 2
        ),
        scal AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS s
            FROM natrev
        ),
        num AS (
            SELECT SUM(CAST(a.x - b.x AS HUGEINT) * (a.x - b.x))
                       AS sqd,
                   CAST(COUNT(*) AS BIGINT) AS w0
            FROM natrev a JOIN natrev b
              ON a.rk = b.rk AND a.nk <> b.nk
        ),
        den AS (
            SELECT SUM((CAST(sc.n AS HUGEINT) * r.x - sc.s)
                       * (CAST(sc.n AS HUGEINT) * r.x - sc.s)) AS ssq
            FROM natrev r CROSS JOIN scal sc
        )
        SELECT sc.n, nu.w0,
               ROUND((sc.n - 1.0) * CAST(sc.n AS DOUBLE) * sc.n
                     * (CAST(nu.sqd // 4294967296 AS DOUBLE)
                        * 4294967296.0
                        + CAST(nu.sqd % 4294967296 AS DOUBLE))
                     / (2.0 * nu.w0
                        * (CAST(de.ssq // 4294967296 AS DOUBLE)
                           * 4294967296.0
                           + CAST(de.ssq % 4294967296 AS DOUBLE))), 6)
                   AS geary_c
        FROM num nu CROSS JOIN den de CROSS JOIN scal sc
    """,
    section="A168",
    doc="Geary's C contiguity ratio on nation revenue with "
    "same-region weights: C = (n-1) sum w_ij (x_i - x_j)^2 / "
    "(2 W0 sum (x_i - xbar)^2) — Moran's I (A166) measures "
    "covariance-style clustering, Geary measures PAIRWISE "
    "difference and is more sensitive to local structure; "
    "reporting both (I high + C low = global cluster; I ~ 0 + "
    "C < 1 = local pockets) is standard spatial-stats practice. "
    "The numerator needs NO centering ((x_i - x_j)^2 is "
    "translation-invariant, exact int128); the denominator reuses "
    "A166's u = n*x - S integer centering (the n^2 it introduces "
    "is multiplied back in the C expression). Both sums rebuild "
    "via A26 hi/lo. Scale: same 25-row nation quotient + "
    "region-block self-join as A166.",
)
def q_agg_geary_c(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    na = load_table(spark, sf_dir, "nation")
    natrev = (
        od.join(cu, od.o_custkey == cu.c_custkey)
        .join(
            F.broadcast(na), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .groupBy(
            F.col("n_nationkey").alias("nk"),
            F.col("n_regionkey").alias("rk"),
        )
        .agg(
            F.expr(
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 "
                "AS BIGINT)"
            ).alias("x")
        )
        .localCheckpoint(eager=False)
    )
    scal = natrev.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
    )
    a = natrev.select(
        F.col("rk"), F.col("nk").alias("nka"), F.col("x").alias("xa")
    )
    b = natrev.select(
        F.col("rk"), F.col("nk").alias("nkb"), F.col("x").alias("xb")
    )
    num = (
        a.join(b, "rk")
        .where(F.col("nka") != F.col("nkb"))
        .agg(
            F.sum(
                (F.col("xa") - F.col("xb")).cast(DecimalType(38, 0))
                * (F.col("xa") - F.col("xb"))
            ).alias("sqd"),
            F.count(F.lit(1)).cast("bigint").alias("w0"),
        )
    )
    u = (
        F.col("n").cast(DecimalType(38, 0)) * F.col("x") - F.col("s")
    )
    den = natrev.crossJoin(F.broadcast(scal)).agg(
        F.sum(u * u).alias("ssq")
    )
    out = (
        num.crossJoin(F.broadcast(den))
        .crossJoin(F.broadcast(scal))
    )
    hi_lo = (
        "cast({0} div 4294967296 as double) * 4294967296.0d"
        " + cast({0} % 4294967296 as double)"
    )
    return out.select(
        "n",
        "w0",
        F.round(
            (F.col("n") - F.lit(1.0))
            * F.col("n").cast("double") * F.col("n")
            * F.expr(hi_lo.format("sqd"))
            / (
                F.lit(2.0) * F.col("w0")
                * F.expr(hi_lo.format("ssq"))
            ),
            6,
        ).alias("geary_c"),
    )

# ==== wave 197a: local Moran's I hotspot map (LISA) =================


@register(
    "q_agg_local_moran_hotspots",
    oracle="""
        WITH natrev AS (
            SELECT n.n_name AS nation, n.n_nationkey AS nk,
                   n.n_regionkey AS rk,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) AS x
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1, 2, 3
        ),
        scal AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS s
            FROM natrev
        ),
        cent AS (
            SELECT nation, nk, rk,
                   CAST(sc.n AS HUGEINT) * x - sc.s AS u
            FROM natrev CROSS JOIN scal sc
        ),
        lagged AS (
            SELECT a.nation, a.nk, a.u,
                   SUM(b.u) AS lag_u,
                   CAST(COUNT(b.nk) AS BIGINT) AS n_neigh
            FROM cent a JOIN cent b
              ON a.rk = b.rk AND a.nk <> b.nk
            GROUP BY a.nation, a.nk, a.u
        )
        SELECT nation, n_neigh,
               CASE WHEN u > 0 AND lag_u > 0 THEN 'HH'
                    WHEN u < 0 AND lag_u < 0 THEN 'LL'
                    WHEN u > 0 AND lag_u <= 0 THEN 'HL'
                    ELSE 'LH' END AS quadrant,
               CASE WHEN (u > 0 AND lag_u > 0)
                      OR (u < 0 AND lag_u < 0) THEN 1 ELSE 0 END
                   AS is_cluster
        FROM lagged
    """,
    section="A169",
    doc="Local Moran (LISA) hotspot map per nation with same-region "
    "neighbors: classify each nation by the sign pair of its own "
    "centered revenue u and its neighbors' sum — HH (hot spot), LL "
    "(cold spot), HL/LH (spatial outliers) — the per-unit "
    "decomposition of A166's global I, and the map an analyst "
    "actually acts on ('WHICH markets cluster', not 'is there "
    "clustering'). The u = n*x - S integer centering makes both "
    "signs exact int128 comparisons — no variance normalization "
    "is needed for the quadrant, so the whole classification is "
    "integer arithmetic (the magnitude-normalized I_i would add "
    "nothing to the labels). Scale: 25-row quotient, region-block "
    "self-join, group back to the unit.",
)
def q_agg_local_moran_hotspots(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    na = load_table(spark, sf_dir, "nation")
    natrev = (
        od.join(cu, od.o_custkey == cu.c_custkey)
        .join(
            F.broadcast(na), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("n_nationkey").alias("nk"),
            F.col("n_regionkey").alias("rk"),
        )
        .agg(
            F.expr(
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 "
                "AS BIGINT)"
            ).alias("x")
        )
    )
    scal = natrev.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
    )
    cent = natrev.crossJoin(F.broadcast(scal)).select(
        "nation",
        "nk",
        "rk",
        (
            F.col("n").cast(DecimalType(38, 0)) * F.col("x")
            - F.col("s")
        ).alias("u"),
    )
    b = cent.select(
        F.col("rk"), F.col("nk").alias("nkb"), F.col("u").alias("ub")
    )
    lagged = (
        cent.join(b, "rk")
        .where(F.col("nk") != F.col("nkb"))
        .groupBy("nation", "nk", "u")
        .agg(
            F.sum("ub").alias("lag_u"),
            F.count("nkb").cast("bigint").alias("n_neigh"),
        )
    )
    return lagged.select(
        "nation",
        "n_neigh",
        F.when(
            (F.col("u") > 0) & (F.col("lag_u") > 0), F.lit("HH")
        )
        .when((F.col("u") < 0) & (F.col("lag_u") < 0), F.lit("LL"))
        .when((F.col("u") > 0) & (F.col("lag_u") <= 0), F.lit("HL"))
        .otherwise(F.lit("LH"))
        .alias("quadrant"),
        F.when(
            ((F.col("u") > 0) & (F.col("lag_u") > 0))
            | ((F.col("u") < 0) & (F.col("lag_u") < 0)),
            1,
        )
        .otherwise(0)
        .alias("is_cluster"),
    )

# ==== wave 197b: Gallagher disproportionality index =================


@register(
    "q_agg_gallagher_index",
    oracle="""
        WITH per_nation AS (
            SELECT n.n_nationkey AS nk,
                   CAST(COUNT(*) AS BIGINT) AS orders_n,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100)
                        AS BIGINT) AS cents
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1
        ),
        tot AS (
            SELECT CAST(SUM(orders_n) AS BIGINT) AS tn,
                   CAST(SUM(cents) AS BIGINT) AS tc,
                   CAST(COUNT(*) AS BIGINT) AS k
            FROM per_nation
        ),
        gaps AS (
            SELECT p.nk,
                   CAST(p.orders_n AS DOUBLE) / t.tn
                   - CAST(p.cents AS DOUBLE) / t.tc AS gap
            FROM per_nation p CROSS JOIN tot t
        ),
        agg AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS k,
                   CAST(SUM(CAST(floor(1e12 * gap * gap) AS BIGINT))
                        AS BIGINT) AS sq
            FROM gaps
        )
        SELECT k AS n_nations,
               ROUND(100.0 * sqrt(CAST(sq AS DOUBLE) / 1e12 / 2.0), 6)
                   AS gallagher_pct,
               ROUND(CAST(sq AS DOUBLE) / 1e12, 8) AS sum_sq_gap
        FROM agg
    """,
    section="A170",
    doc="Gallagher (least-squares) disproportionality index between "
    "each nation's ORDER-COUNT share and its REVENUE share: LSq = "
    "sqrt(sum (v_i - s_i)^2 / 2) * 100 — the political-science "
    "seats-vs-votes index repurposed as a volume-vs-value "
    "misalignment audit (a nation with 10% of orders but 20% of "
    "revenue is a 'over-represented' premium market; A24's HHI "
    "sees concentration, not MISALIGNMENT between two share "
    "vectors). Shares are single divisions of exact int64 totals; "
    "each squared gap quantizes floor(1e12 * gap^2) BEFORE the "
    "25-term sum (V39 device), then one sqrt. Scale: one nation "
    "agg + scalar broadcast — constant state.",
)
def q_agg_gallagher_index(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    na = load_table(spark, sf_dir, "nation")
    per_nation = (
        od.join(cu, od.o_custkey == cu.c_custkey)
        .join(
            F.broadcast(na), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .groupBy(F.col("n_nationkey").alias("nk"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("orders_n"),
            F.expr(
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100)"
                " AS BIGINT)"
            ).alias("cents"),
        )
    )
    tot = per_nation.agg(
        F.sum("orders_n").cast("bigint").alias("tn"),
        F.sum("cents").cast("bigint").alias("tc"),
    )
    gaps = per_nation.crossJoin(F.broadcast(tot)).select(
        (
            F.col("orders_n").cast("double") / F.col("tn")
            - F.col("cents").cast("double") / F.col("tc")
        ).alias("gap")
    )
    agg = gaps.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(
            F.floor(
                F.lit(1e12) * F.col("gap") * F.col("gap")
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("sq"),
    )
    return agg.select(
        F.col("k").alias("n_nations"),
        F.round(
            F.lit(100.0)
            * F.sqrt(
                F.col("sq").cast("double") / F.lit(1e12) / F.lit(2.0)
            ),
            6,
        ).alias("gallagher_pct"),
        F.round(F.col("sq").cast("double") / F.lit(1e12), 8).alias(
            "sum_sq_gap"
        ),
    )

# ==== wave 199a: competing-risks cumulative incidence (A171) ========


@register(
    "q_agg_competing_risks_cif",
    oracle="""
        WITH firsts AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'purchase'
                       THEN CAST(date_diff('day',
                            TIMESTAMP '2024-01-01', ts) AS BIGINT)
                       END) AS tp,
                   MIN(CASE WHEN event_type = 'error'
                       THEN CAST(date_diff('day',
                            TIMESTAMP '2024-01-01', ts) AS BIGINT)
                       END) AS te
            FROM events GROUP BY user_id
        ),
        obs AS (
            SELECT CASE
                     WHEN tp IS NOT NULL AND (te IS NULL OR tp < te)
                         THEN tp
                     WHEN te IS NOT NULL THEN te
                     ELSE 30 END AS t,
                   CASE
                     WHEN te IS NOT NULL AND (tp IS NULL OR te <= tp)
                         THEN 'error'
                     WHEN tp IS NOT NULL THEN 'purchase'
                     ELSE 'censored' END AS cause
            FROM firsts
        ),
        ev AS (
            SELECT t,
                   CAST(SUM(CASE WHEN cause = 'purchase'
                            THEN 1 ELSE 0 END) AS BIGINT) AS dp,
                   CAST(SUM(CASE WHEN cause = 'error'
                            THEN 1 ELSE 0 END) AS BIGINT) AS de,
                   CAST(COUNT(*) AS BIGINT) AS leaving
            FROM obs GROUP BY t
        ),
        risk AS (
            SELECT t, dp, de,
                   CAST(SUM(leaving) OVER () AS BIGINT)
                   - CAST(SUM(leaving) OVER w AS BIGINT) + leaving
                       AS n_risk
            FROM ev
            WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)
        ),
        surv AS (
            SELECT t, dp, de, n_risk,
                   exp(CAST(SUM(CAST(floor(1e12
                       * ln(1.0 - CAST(dp + de AS DOUBLE) / n_risk))
                       AS DECIMAL(38,0))) OVER w AS DOUBLE) / 1e12)
                       AS s_t,
                   COALESCE(exp(CAST(SUM(CAST(floor(1e12
                       * ln(1.0 - CAST(dp + de AS DOUBLE) / n_risk))
                       AS DECIMAL(38,0))) OVER wp AS DOUBLE) / 1e12),
                       1.0) AS s_prev
            FROM risk
            WHERE dp + de < n_risk
            WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW),
                   wp AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING)
        )
        SELECT t, n_risk, dp AS d_purchase, de AS d_error,
               ROUND(s_t, 6) AS survival,
               ROUND(CAST(SUM(CAST(floor(1e12 * s_prev
                     * (CAST(dp AS DOUBLE) / n_risk)) AS BIGINT))
                     OVER w AS DOUBLE) / 1e12, 6) AS cif_purchase,
               ROUND(CAST(SUM(CAST(floor(1e12 * s_prev
                     * (CAST(de AS DOUBLE) / n_risk)) AS BIGINT))
                     OVER w AS DOUBLE) / 1e12, 6) AS cif_error
        FROM surv
        WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    """,
    section="A171",
    doc="Aalen-Johansen cumulative incidence under COMPETING risks: "
    "per user, first 'purchase' vs first 'error' compete (error "
    "wins day ties by the documented precedence), others censor at "
    "day 30; CIF_k(t) = sum S(u-) d_ku/n_u — the estimator that "
    "replaces 1-KM when causes compete (naive per-cause KM treats "
    "the other cause as censoring and OVERSTATES incidence — the "
    "textbook competing-risks bias; A33's KM is the single-cause "
    "ancestor). Determinism: the shared survival curve uses A33's "
    "quantized ln-sum product device; each CIF increment "
    "S(u-)*h_ku quantizes floor(1e12 * term) before its cumulative "
    "window sum, so both monotone curves are exact-integer "
    "accumulations of pinned per-row doubles. Scale: one user agg, "
    "one day-grain agg (<= 31 rows of state), three windows.",
)
def q_agg_competing_risks_cif(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    day = (
        (
            F.unix_micros("ts")
            - F.unix_micros(
                F.lit("2024-01-01 00:00:00").cast("timestamp")
            )
        )
        / F.lit(86400000000)
    ).cast("bigint")
    firsts = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "purchase", day)
        ).alias("tp"),
        F.min(F.when(F.col("event_type") == "error", day)).alias("te"),
    )
    obs = firsts.select(
        F.when(
            F.col("tp").isNotNull()
            & (F.col("te").isNull() | (F.col("tp") < F.col("te"))),
            F.col("tp"),
        )
        .when(F.col("te").isNotNull(), F.col("te"))
        .otherwise(F.lit(30))
        .alias("t"),
        F.when(
            F.col("te").isNotNull()
            & (F.col("tp").isNull() | (F.col("te") <= F.col("tp"))),
            F.lit("error"),
        )
        .when(F.col("tp").isNotNull(), F.lit("purchase"))
        .otherwise(F.lit("censored"))
        .alias("cause"),
    )
    evt = obs.groupBy("t").agg(
        F.sum(F.when(F.col("cause") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("dp"),
        F.sum(F.when(F.col("cause") == "error", 1).otherwise(0))
        .cast("bigint")
        .alias("de"),
        F.count(F.lit(1)).cast("bigint").alias("leaving"),
    )
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    wp = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    risk = evt.select(
        "t",
        "dp",
        "de",
        (
            F.sum("leaving").over(Window.partitionBy())
            - F.sum("leaving").over(w)
            + F.col("leaving")
        )
        .cast("bigint")
        .alias("n_risk"),
    )
    lnterm = F.floor(
        F.lit(1e12)
        * F.log(
            F.lit(1.0)
            - (F.col("dp") + F.col("de")).cast("double")
            / F.col("n_risk")
        )
    ).cast(DecimalType(38, 0))
    surv = risk.where(
        F.col("dp") + F.col("de") < F.col("n_risk")
    ).select(
        "t",
        "dp",
        "de",
        "n_risk",
        F.exp(
            F.sum(lnterm).over(w).cast("double") / F.lit(1e12)
        ).alias("s_t"),
        F.coalesce(
            F.exp(
                F.sum(lnterm).over(wp).cast("double") / F.lit(1e12)
            ),
            F.lit(1.0),
        ).alias("s_prev"),
    )
    cif_p = (
        F.sum(
            F.floor(
                F.lit(1e12)
                * F.col("s_prev")
                * (F.col("dp").cast("double") / F.col("n_risk"))
            ).cast("bigint")
        )
        .over(w)
        .cast("double")
        / F.lit(1e12)
    )
    cif_e = (
        F.sum(
            F.floor(
                F.lit(1e12)
                * F.col("s_prev")
                * (F.col("de").cast("double") / F.col("n_risk"))
            ).cast("bigint")
        )
        .over(w)
        .cast("double")
        / F.lit(1e12)
    )
    return surv.select(
        "t",
        "n_risk",
        F.col("dp").alias("d_purchase"),
        F.col("de").alias("d_error"),
        F.round("s_t", 6).alias("survival"),
        F.round(cif_p, 6).alias("cif_purchase"),
        F.round(cif_e, 6).alias("cif_error"),
    )

# ==== wave 199b: Kendall's W coefficient of concordance =============


@register(
    "q_agg_kendall_w",
    oracle="""
        WITH cells AS (
            SELECT r.r_name AS rater, o.o_orderpriority AS item,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) AS v
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY 1, 2
        ),
        ranked AS (
            SELECT rater, item,
                   CAST(RANK() OVER (PARTITION BY rater
                                     ORDER BY v, item) AS BIGINT) AS rk
            FROM cells
        ),
        rsums AS (
            SELECT item, CAST(SUM(rk) AS BIGINT) AS r
            FROM ranked GROUP BY item
        ),
        stat AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM((r - 15) * (r - 15)) AS BIGINT) AS s
            FROM rsums
        )
        SELECT n, 5 AS m, s,
               ROUND(12.0 * s / (25.0 * (n * n * n - n)), 6)
                   AS kendall_w,
               ROUND(5.0 * (n - 1)
                     * (12.0 * s / (25.0 * (n * n * n - n))), 4)
                   AS chi2_approx
        FROM stat
    """,
    section="A172",
    doc="Kendall's W coefficient of concordance: 5 region 'raters' "
    "each rank the 5 priority 'items' by revenue; W = 12S / "
    "(m^2(n^3 - n)) with S = sum (R_j - m(n+1)/2)^2 — the 0..1 "
    "agreement scale for m>2 rankers that A150-era pairwise "
    "correlations can't give (W = 1 means every region orders the "
    "priorities identically; the chi2 = m(n-1)W approximation "
    "rides along). m = n = 5 makes the mean rank sum m(n+1)/2 = 15 "
    "exactly integer, so S is an exact int64 over fully tie-broken "
    "within-rater ranks ((v, item) total order). Scale: one "
    "(region, priority) agg, one 5-row rank window per rater, "
    "25-cell algebra.",
)
def q_agg_kendall_w(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region")
    cells = (
        od.join(cu, od.o_custkey == cu.c_custkey)
        .join(
            F.broadcast(na), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .join(
            F.broadcast(re), F.col("n_regionkey") == F.col("r_regionkey")
        )
        .groupBy(
            F.col("r_name").alias("rater"),
            F.col("o_orderpriority").alias("item"),
        )
        .agg(
            F.expr(
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 "
                "AS BIGINT)"
            ).alias("v")
        )
    )
    ranked = cells.select(
        "item",
        F.rank()
        .over(Window.partitionBy("rater").orderBy("v", "item"))
        .cast("bigint")
        .alias("rk"),
    )
    rsums = ranked.groupBy("item").agg(
        F.sum("rk").cast("bigint").alias("r")
    )
    stat = rsums.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum((F.col("r") - 15) * (F.col("r") - 15))
        .cast("bigint")
        .alias("s"),
    )
    w_expr = (
        F.lit(12.0) * F.col("s")
        / (
            F.lit(25.0)
            * (F.col("n") * F.col("n") * F.col("n") - F.col("n"))
        )
    )
    return stat.select(
        "n",
        F.lit(5).cast("int").alias("m"),
        "s",
        F.round(w_expr, 6).alias("kendall_w"),
        F.round(F.lit(5.0) * (F.col("n") - 1) * w_expr, 4).alias(
            "chi2_approx"
        ),
    )

# ==== wave 201b: permutation distance audit (A173) ==================


@register(
    "q_agg_rank_distance_audit",
    oracle="""
        WITH per_nation AS (
            SELECT n.n_name AS nation,
                   CAST(COUNT(*) AS BIGINT) AS orders_n,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100)
                        AS BIGINT) AS cents
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1
        ),
        ranked AS (
            SELECT nation,
                   CAST(ROW_NUMBER() OVER (ORDER BY cents DESC, nation)
                        AS BIGINT) AS r_rev,
                   CAST(ROW_NUMBER() OVER (ORDER BY orders_n DESC,
                                           nation) AS BIGINT) AS r_vol
            FROM per_nation
        ),
        foot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(ABS(r_rev - r_vol)) AS BIGINT) AS footrule
            FROM ranked
        ),
        kd AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS discordant
            FROM ranked a JOIN ranked b
              ON a.nation < b.nation
            WHERE (a.r_rev - b.r_rev) * (a.r_vol - b.r_vol) < 0
        )
        SELECT f.n, f.footrule, k.discordant,
               ROUND(CAST(f.footrule AS DOUBLE)
                     / ((CAST(f.n AS DOUBLE) * f.n - f.n % 2) / 2.0),
                     6) AS footrule_norm,
               ROUND(CAST(k.discordant AS DOUBLE)
                     / (CAST(f.n AS DOUBLE) * (f.n - 1) / 2.0), 6)
                   AS kendall_distance_norm,
               ROUND(1.0 - 4.0 * CAST(k.discordant AS DOUBLE)
                     / (CAST(f.n AS DOUBLE) * (f.n - 1)), 6)
                   AS kendall_tau
        FROM foot f CROSS JOIN kd k
    """,
    section="A173",
    doc="Permutation-distance audit between the revenue ranking and "
    "the order-volume ranking of nations: Spearman footrule "
    "sum|r1 - r2|, Kendall distance (discordant pairs via the sign "
    "of the cross product — 300 pairs, exact), and the implied "
    "Kendall tau — the ranking-stability readout for 'does the "
    "league table change if we rank by volume instead of value', "
    "which V-family's RBO answers only for top-k retrieval lists "
    "(full-permutation distances are the leaderboard-governance "
    "version). Both rankings are fully tie-broken by nation name; "
    "footrule_norm divides by the maximum n^2/2 for even n. All "
    "distances exact int64; normalizations are pinned expressions. "
    "Scale: one nation agg, two 25-row rank windows, one 300-pair "
    "self-join.",
)
def q_agg_rank_distance_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    na = load_table(spark, sf_dir, "nation")
    per_nation = (
        od.join(cu, od.o_custkey == cu.c_custkey)
        .join(
            F.broadcast(na), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("orders_n"),
            F.expr(
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100)"
                " AS BIGINT)"
            ).alias("cents"),
        )
    )
    ranked = per_nation.select(
        "nation",
        F.row_number()
        .over(Window.orderBy(F.desc("cents"), F.asc("nation")))
        .cast("bigint")
        .alias("r_rev"),
        F.row_number()
        .over(Window.orderBy(F.desc("orders_n"), F.asc("nation")))
        .cast("bigint")
        .alias("r_vol"),
    ).localCheckpoint(eager=False)
    foot = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.abs(F.col("r_rev") - F.col("r_vol")))
        .cast("bigint")
        .alias("footrule"),
    )
    a = ranked.select(
        F.col("nation").alias("na"),
        F.col("r_rev").alias("ra"),
        F.col("r_vol").alias("va"),
    )
    b = ranked.select(
        F.col("nation").alias("nb"),
        F.col("r_rev").alias("rb"),
        F.col("r_vol").alias("vb"),
    )
    kd = (
        # 25x25 nation pairs: broadcast the right side (theta join ->
        # BroadcastNestedLoopJoin, never CartesianProduct)
        a.join(F.broadcast(b), F.col("na") < F.col("nb"))
        .where(
            (F.col("ra") - F.col("rb")) * (F.col("va") - F.col("vb"))
            < 0
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("discordant"))
    )
    out = foot.crossJoin(F.broadcast(kd))
    nd = F.col("n").cast("double")
    return out.select(
        "n",
        "footrule",
        "discordant",
        F.round(
            F.col("footrule").cast("double")
            / ((nd * F.col("n") - F.col("n") % 2) / F.lit(2.0)),
            6,
        ).alias("footrule_norm"),
        F.round(
            F.col("discordant").cast("double")
            / (nd * (F.col("n") - 1) / F.lit(2.0)),
            6,
        ).alias("kendall_distance_norm"),
        F.round(
            F.lit(1.0)
            - F.lit(4.0) * F.col("discordant").cast("double")
            / (nd * (F.col("n") - 1)),
            6,
        ).alias("kendall_tau"),
    )

# ==== wave 202b: Weibull fit by median-rank regression ==============


@register(
    "q_agg_weibull_mrr",
    oracle="""
        WITH gaps AS (
            SELECT date_diff('day', o_orderdate,
                             lead(o_orderdate) OVER (
                                 PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey
                             )) AS gap,
                   o_orderkey
            FROM orders
            QUALIFY gap IS NOT NULL AND gap >= 1
        ),
        ranked AS (
            SELECT CAST(gap AS BIGINT) AS gap,
                   CAST(ROW_NUMBER() OVER (ORDER BY gap, o_orderkey)
                        AS BIGINT) AS i,
                   CAST(COUNT(*) OVER () AS BIGINT) AS n
            FROM gaps
        ),
        pts AS (
            SELECT CAST(floor(1e9 * ln(CAST(gap AS DOUBLE)))
                        AS BIGINT) AS xq,
                   CAST(floor(1e9 * ln(-ln(1.0 - (i - 0.3)
                        / (n + 0.4)))) AS BIGINT) AS yq
            FROM ranked
        ),
        mom AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(xq) AS BIGINT) AS sx,
                   CAST(SUM(yq) AS BIGINT) AS sy,
                   SUM(CAST(xq AS HUGEINT) * xq) AS sxx,
                   SUM(CAST(xq AS HUGEINT) * yq) AS sxy
            FROM pts
        )
        SELECT n,
               ROUND((CAST(n AS DOUBLE)
                      * (CAST(sxy // 4294967296 AS DOUBLE)
                         * 4294967296.0
                         + CAST(sxy % 4294967296 AS DOUBLE))
                      - CAST(sx AS DOUBLE) * sy)
                     / (CAST(n AS DOUBLE)
                        * (CAST(sxx // 4294967296 AS DOUBLE)
                           * 4294967296.0
                           + CAST(sxx % 4294967296 AS DOUBLE))
                        - CAST(sx AS DOUBLE) * sx), 4) AS k_shape,
               ROUND(exp(-(((CAST(sy AS DOUBLE) / n)
                     - ((CAST(n AS DOUBLE)
                         * (CAST(sxy // 4294967296 AS DOUBLE)
                            * 4294967296.0
                            + CAST(sxy % 4294967296 AS DOUBLE))
                         - CAST(sx AS DOUBLE) * sy)
                        / (CAST(n AS DOUBLE)
                           * (CAST(sxx // 4294967296 AS DOUBLE)
                              * 4294967296.0
                              + CAST(sxx % 4294967296 AS DOUBLE))
                           - CAST(sx AS DOUBLE) * sx))
                       * (CAST(sx AS DOUBLE) / n)) / 1e9)
                     / ((CAST(n AS DOUBLE)
                         * (CAST(sxy // 4294967296 AS DOUBLE)
                            * 4294967296.0
                            + CAST(sxy % 4294967296 AS DOUBLE))
                         - CAST(sx AS DOUBLE) * sy)
                        / (CAST(n AS DOUBLE)
                           * (CAST(sxx // 4294967296 AS DOUBLE)
                              * 4294967296.0
                              + CAST(sxx % 4294967296 AS DOUBLE))
                           - CAST(sx AS DOUBLE) * sx))), 4)
                   AS lambda_scale_days
        FROM mom
    """,
    section="A174",
    doc="Weibull reliability fit by median-rank regression on "
    "customer inter-order gaps: plot ln(-ln(1 - F_i)) against "
    "ln(t_(i)) with Bernard's approximation F_i = (i-0.3)/(n+0.4) "
    "and read shape k = slope, scale lambda = exp(-intercept/k) — "
    "the Weibull-paper method reliability engineers use when MLE "
    "is overkill (k < 1 infant mortality, k ~ 1 memoryless like "
    "A58's exponential fit, k > 1 wear-out; for re-order gaps k "
    "says whether reorder propensity ages). Ranks fully tie-broken "
    "by (gap, orderkey); both log coordinates quantize floor(1e9 * "
    "ln) per row so the OLS moments are exact int64/int128 (the "
    "1e9 scale cancels in the slope; the intercept carries it, "
    "divided back at the end), rebuilt via A26 hi/lo. Scale: one "
    "lag window, one global rank (range-partition at 100 TB), one "
    "moment reduction.",
)
def q_agg_weibull_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    gaps = od.select(
        F.datediff(
            F.lead("o_orderdate").over(w), F.col("o_orderdate")
        ).alias("gap"),
        "o_orderkey",
    ).where(F.col("gap").isNotNull() & (F.col("gap") >= 1))
    # Scale note (r6): median-rank index i via the distributed global rank;
    # the count-all window becomes a broadcast scalar.
    from ai_to_cvent_etl_spark.operators.ranking import global_row_number

    ng = gaps.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    ranked = (
        global_row_number(gaps, ["gap", "o_orderkey"], out_col="i")
        .crossJoin(F.broadcast(ng))
        .select(
            F.col("gap").cast("bigint").alias("gap"),
            F.col("i"),
            F.col("n"),
        )
    )
    pts = ranked.select(
        F.floor(F.lit(1e9) * F.log(F.col("gap").cast("double")))
        .cast("bigint")
        .alias("xq"),
        F.floor(
            F.lit(1e9)
            * F.log(
                -F.log(
                    F.lit(1.0)
                    - (F.col("i") - F.lit(0.3))
                    / (F.col("n") + F.lit(0.4))
                )
            )
        )
        .cast("bigint")
        .alias("yq"),
    )
    mom = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("xq").cast("bigint").alias("sx"),
        F.sum("yq").cast("bigint").alias("sy"),
        F.sum(F.col("xq").cast(DecimalType(38, 0)) * F.col("xq")).alias(
            "sxx"
        ),
        F.sum(F.col("xq").cast(DecimalType(38, 0)) * F.col("yq")).alias(
            "sxy"
        ),
    )
    hi_lo = (
        "cast({0} div 4294967296 as double) * 4294967296.0d"
        " + cast({0} % 4294967296 as double)"
    )
    nd = F.col("n").cast("double")
    slope = (
        nd * F.expr(hi_lo.format("sxy"))
        - F.col("sx").cast("double") * F.col("sy")
    ) / (
        nd * F.expr(hi_lo.format("sxx"))
        - F.col("sx").cast("double") * F.col("sx")
    )
    intercept = (
        F.col("sy").cast("double") / F.col("n")
        - slope * (F.col("sx").cast("double") / F.col("n"))
    )
    return mom.select(
        "n",
        F.round(slope, 4).alias("k_shape"),
        F.round(
            F.exp(-(intercept / F.lit(1e9)) / slope), 4
        ).alias("lambda_scale_days"),
    )

# ==== wave 203a: minimum-variance two-asset portfolio ===============


@register(
    "q_agg_min_variance_portfolio",
    oracle="""
        WITH daily AS (
            SELECT CAST(o.o_orderdate AS DATE) AS d,
                   CAST(SUM(CASE WHEN r.r_name = 'AMERICA'
                        THEN CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                        ELSE 0 END) AS BIGINT) AS xa,
                   CAST(SUM(CASE WHEN r.r_name = 'EUROPE'
                        THEN CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                        ELSE 0 END) AS BIGINT) AS xe
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name IN ('AMERICA', 'EUROPE')
            GROUP BY 1
        ),
        mom AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(xa) AS BIGINT) AS sa,
                   CAST(SUM(xe) AS BIGINT) AS se,
                   SUM(CAST(xa AS HUGEINT) * xa) AS qaa,
                   SUM(CAST(xe AS HUGEINT) * xe) AS qee,
                   SUM(CAST(xa AS HUGEINT) * xe) AS qae
            FROM daily
        ),
        cov AS (
            SELECT n,
                   (CAST(qaa // 4294967296 AS DOUBLE) * 4294967296.0
                    + CAST(qaa % 4294967296 AS DOUBLE)) / n
                   - (CAST(sa AS DOUBLE) / n)
                     * (CAST(sa AS DOUBLE) / n) AS va,
                   (CAST(qee // 4294967296 AS DOUBLE) * 4294967296.0
                    + CAST(qee % 4294967296 AS DOUBLE)) / n
                   - (CAST(se AS DOUBLE) / n)
                     * (CAST(se AS DOUBLE) / n) AS ve,
                   (CAST(qae // 4294967296 AS DOUBLE) * 4294967296.0
                    + CAST(qae % 4294967296 AS DOUBLE)) / n
                   - (CAST(sa AS DOUBLE) / n)
                     * (CAST(se AS DOUBLE) / n) AS cae
            FROM mom
        )
        SELECT n,
               ROUND((ve - cae) / (va + ve - 2.0 * cae), 6)
                   AS w_america,
               ROUND(1.0 - (ve - cae) / (va + ve - 2.0 * cae), 6)
                   AS w_europe,
               ROUND(cae / sqrt(va * ve), 6) AS corr,
               ROUND(sqrt((va * ve - cae * cae)
                     / (va + ve - 2.0 * cae))
                     / sqrt(LEAST(va, ve)), 6) AS vol_vs_best_single
        FROM cov
    """,
    section="A175",
    doc="Minimum-variance two-asset portfolio between AMERICA and "
    "EUROPE daily revenue streams: w* = (s_e^2 - s_ae)/(s_a^2 + "
    "s_e^2 - 2 s_ae), the Markowitz closed form — the "
    "diversification readout (vol_vs_best_single < 1 quantifies "
    "how much combining the two streams beats holding the less "
    "volatile one; A143's market beta prices one stream against "
    "the market, this ALLOCATES between two). Per-day region cents "
    "are exact int64 (absent-region days contribute real zeros via "
    "the conditional sum, not dropped rows); second moments run in "
    "int128 and rebuild via A26 hi/lo; the weight, correlation, "
    "and min-variance vol (va*ve - cae^2)/(va+ve-2cae) are pinned "
    "expressions. Scale: one day-grain conditional agg — the whole "
    "frontier needs six integers.",
)
def q_agg_min_variance_portfolio(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region")
    daily = (
        od.join(cu, od.o_custkey == cu.c_custkey)
        .join(
            F.broadcast(na), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .join(
            F.broadcast(re), F.col("n_regionkey") == F.col("r_regionkey")
        )
        .where(F.col("r_name").isin("AMERICA", "EUROPE"))
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(
            F.expr(
                "CAST(SUM(CASE WHEN r_name = 'AMERICA'"
                " THEN CAST(o_totalprice AS DECIMAL(18,2)) * 100"
                " ELSE 0 END) AS BIGINT)"
            ).alias("xa"),
            F.expr(
                "CAST(SUM(CASE WHEN r_name = 'EUROPE'"
                " THEN CAST(o_totalprice AS DECIMAL(18,2)) * 100"
                " ELSE 0 END) AS BIGINT)"
            ).alias("xe"),
        )
    )
    mom = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("xa").cast("bigint").alias("sa"),
        F.sum("xe").cast("bigint").alias("se"),
        F.sum(F.col("xa").cast(DecimalType(38, 0)) * F.col("xa")).alias(
            "qaa"
        ),
        F.sum(F.col("xe").cast(DecimalType(38, 0)) * F.col("xe")).alias(
            "qee"
        ),
        F.sum(F.col("xa").cast(DecimalType(38, 0)) * F.col("xe")).alias(
            "qae"
        ),
    )
    hi_lo = (
        "cast({0} div 4294967296 as double) * 4294967296.0d"
        " + cast({0} % 4294967296 as double)"
    )
    nd = F.col("n").cast("double")
    ma = F.col("sa").cast("double") / F.col("n")
    me = F.col("se").cast("double") / F.col("n")
    va = F.expr(hi_lo.format("qaa")) / F.col("n") - ma * ma
    ve = F.expr(hi_lo.format("qee")) / F.col("n") - me * me
    cae = F.expr(hi_lo.format("qae")) / F.col("n") - ma * me
    w_a = (ve - cae) / (va + ve - F.lit(2.0) * cae)
    return mom.select(
        "n",
        F.round(w_a, 6).alias("w_america"),
        F.round(F.lit(1.0) - w_a, 6).alias("w_europe"),
        F.round(cae / F.sqrt(va * ve), 6).alias("corr"),
        F.round(
            F.sqrt(
                (va * ve - cae * cae)
                / (va + ve - F.lit(2.0) * cae)
            )
            / F.sqrt(F.least(va, ve)),
            6,
        ).alias("vol_vs_best_single"),
    )

# ==== wave 204b: Simpson's paradox detector =========================


@register(
    "q_agg_simpson_paradox",
    oracle="""
        WITH base AS (
            SELECT r.r_name AS region,
                   CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END AS t,
                   CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) // 100 AS v
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
        ),
        strata AS (
            SELECT region,
                   CAST(SUM(t) AS BIGINT) AS n1,
                   CAST(SUM(1 - t) AS BIGINT) AS n0,
                   CAST(SUM(t * v) AS BIGINT) AS s1,
                   CAST(SUM((1 - t) * v) AS BIGINT) AS s0
            FROM base GROUP BY region
        ),
        pooled AS (
            SELECT CAST(SUM(n1) AS BIGINT) AS n1,
                   CAST(SUM(n0) AS BIGINT) AS n0,
                   CAST(SUM(s1) AS BIGINT) AS s1,
                   CAST(SUM(s0) AS BIGINT) AS s0
            FROM strata
        )
        SELECT s.region, s.n1, s.n0,
               ROUND(CAST(s.s1 AS DOUBLE) / s.n1
                     - CAST(s.s0 AS DOUBLE) / s.n0, 4) AS diff_local,
               ROUND(CAST(g.s1 AS DOUBLE) / g.n1
                     - CAST(g.s0 AS DOUBLE) / g.n0, 4) AS diff_global,
               CASE WHEN (CAST(s.s1 AS HUGEINT) * s.n0
                          - CAST(s.s0 AS HUGEINT) * s.n1 > 0)
                         <> (CAST(g.s1 AS HUGEINT) * g.n0
                             - CAST(g.s0 AS HUGEINT) * g.n1 > 0)
                    THEN 1 ELSE 0 END AS sign_flip
        FROM strata s CROSS JOIN pooled g
    """,
    section="A176",
    doc="Simpson's-paradox detector for the priority 'treatment' "
    "effect on whole-dollar order value, stratified by region: "
    "per-stratum mean difference vs the pooled difference, with "
    "sign_flip = 1 where a stratum's effect direction CONTRADICTS "
    "the aggregate — the reporting hazard every dashboard rollup "
    "carries (A71's stratified ATE fixes the estimate; this audit "
    "tells you the fix MATTERS because the raw rollup would "
    "mislead). The flip test never touches doubles: mean1 > mean0 "
    "cross-multiplies to s1*n0 > s0*n1 in int128, so the flag is "
    "exact; the reported differences are single divisions. Scale: "
    "one pass of conditional integer moments per stratum, global "
    "row = the strata re-summed, 5-row output.",
)
def q_agg_simpson_paradox(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region")
    base = (
        od.join(cu, od.o_custkey == cu.c_custkey)
        .join(
            F.broadcast(na), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .join(
            F.broadcast(re), F.col("n_regionkey") == F.col("r_regionkey")
        )
        .select(
            F.col("r_name").alias("region"),
            F.when(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
            )
            .otherwise(0)
            .alias("t"),
            F.expr(
                "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
                " AS BIGINT) div 100"
            ).alias("v"),
        )
    )
    t = F.col("t")
    strata = base.groupBy("region").agg(
        F.sum(t).cast("bigint").alias("n1"),
        F.sum(1 - t).cast("bigint").alias("n0"),
        F.sum(t * F.col("v")).cast("bigint").alias("s1"),
        F.sum((1 - t) * F.col("v")).cast("bigint").alias("s0"),
    )
    glob = strata.agg(
        F.sum("n1").cast("bigint").alias("gn1"),
        F.sum("n0").cast("bigint").alias("gn0"),
        F.sum("s1").cast("bigint").alias("gs1"),
        F.sum("s0").cast("bigint").alias("gs0"),
    )
    out = strata.crossJoin(F.broadcast(glob))
    local_pos = (
        F.col("s1").cast(DecimalType(38, 0)) * F.col("n0")
        - F.col("s0").cast(DecimalType(38, 0)) * F.col("n1")
        > 0
    )
    glob_pos = (
        F.col("gs1").cast(DecimalType(38, 0)) * F.col("gn0")
        - F.col("gs0").cast(DecimalType(38, 0)) * F.col("gn1")
        > 0
    )
    return out.select(
        "region",
        "n1",
        "n0",
        F.round(
            F.col("s1").cast("double") / F.col("n1")
            - F.col("s0").cast("double") / F.col("n0"),
            4,
        ).alias("diff_local"),
        F.round(
            F.col("gs1").cast("double") / F.col("gn1")
            - F.col("gs0").cast("double") / F.col("gn0"),
            4,
        ).alias("diff_global"),
        F.when(local_pos != glob_pos, 1).otherwise(0).alias(
            "sign_flip"
        ),
    )

# ==== wave 205b: Youden-optimal cutpoint ============================


@register(
    "q_agg_youden_cutpoint",
    oracle="""
        WITH scored AS (
            SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END AS y,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS s
            FROM orders
        ),
        cuts AS (
            SELECT DISTINCT s AS cut FROM (
                SELECT s, ROW_NUMBER() OVER (ORDER BY s) AS rk,
                       COUNT(*) OVER () AS n
                FROM scored
            ) WHERE rk = CAST(ceil(n * 0.1) AS BIGINT)
               OR rk = CAST(ceil(n * 0.2) AS BIGINT)
               OR rk = CAST(ceil(n * 0.3) AS BIGINT)
               OR rk = CAST(ceil(n * 0.4) AS BIGINT)
               OR rk = CAST(ceil(n * 0.5) AS BIGINT)
               OR rk = CAST(ceil(n * 0.6) AS BIGINT)
               OR rk = CAST(ceil(n * 0.7) AS BIGINT)
               OR rk = CAST(ceil(n * 0.8) AS BIGINT)
               OR rk = CAST(ceil(n * 0.9) AS BIGINT)
        ),
        conf AS (
            SELECT c.cut,
                   CAST(SUM(CASE WHEN sc.s >= c.cut AND sc.y = 1
                            THEN 1 ELSE 0 END) AS BIGINT) AS tp,
                   CAST(SUM(CASE WHEN sc.s >= c.cut AND sc.y = 0
                            THEN 1 ELSE 0 END) AS BIGINT) AS fp,
                   CAST(SUM(sc.y) AS BIGINT) AS pos,
                   CAST(SUM(1 - sc.y) AS BIGINT) AS neg
            FROM cuts c CROSS JOIN scored sc
            GROUP BY c.cut
        ),
        j AS (
            SELECT cut, tp, fp, pos, neg,
                   CAST(tp AS DOUBLE) / pos
                   + CAST(neg - fp AS DOUBLE) / neg - 1.0 AS youden_j,
                   ROW_NUMBER() OVER (
                       ORDER BY CAST(tp AS HUGEINT) * neg
                                - CAST(fp AS HUGEINT) * pos DESC,
                                cut) AS pick
            FROM conf
        )
        SELECT cut AS best_cut_cents, tp, fp, pos, neg,
               ROUND(CAST(tp AS DOUBLE) / pos, 6) AS sensitivity,
               ROUND(CAST(neg - fp AS DOUBLE) / neg, 6) AS specificity,
               ROUND(youden_j, 6) AS youden_j
        FROM j WHERE pick = 1
    """,
    section="A177",
    doc="Youden-optimal decision cutpoint: sweep nine decile "
    "thresholds of the order-value 'score' against the urgent/high "
    "label and pick the cut maximizing J = sensitivity + "
    "specificity - 1 — the threshold-selection step that turns "
    "A30's AUC into an OPERATING POINT (AUC says the score ranks; "
    "Youden says where to cut when FP and FN cost the same). The "
    "argmax is decided on EXACT integers: J1 > J2 iff tp1*neg - "
    "fp1*pos > tp2*neg - fp2*pos (same pos/neg across cuts, int128 "
    "cross-multiplication), tie-broken by the cut value, so the "
    "winner is deterministic even when J's are equal to the last "
    "ulp. Scale: one rank pass for the cuts, one 9x conditional "
    "count agg — the ROC never materializes per-row.",
)
def q_agg_youden_cutpoint(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    scored = od.select(
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        )
        .otherwise(0)
        .alias("y"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("s"),
    ).localCheckpoint(eager=False)
    ranked = scored.select(
        "s",
        F.row_number().over(Window.orderBy("s")).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    cond = None
    for q in range(1, 10):
        c = F.col("rk") == F.ceil(
            F.col("n") * F.lit(q / 10.0)
        ).cast("bigint")
        cond = c if cond is None else (cond | c)
    # DISTINCT: ties spanning a decile boundary would otherwise emit the
    # same cut value twice, doubling every conf count for that cut (and
    # quadrupling the argmax key) — data-dependent, so pinned on both sides.
    cuts = ranked.where(cond).select(F.col("s").alias("cut")).distinct()
    conf = (
        F.broadcast(cuts)
        .crossJoin(scored)
        .groupBy("cut")
        .agg(
            F.sum(
                F.when((F.col("s") >= F.col("cut"))
                       & (F.col("y") == 1), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("tp"),
            F.sum(
                F.when((F.col("s") >= F.col("cut"))
                       & (F.col("y") == 0), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("fp"),
            F.sum("y").cast("bigint").alias("pos"),
            F.sum(1 - F.col("y")).cast("bigint").alias("neg"),
        )
    )
    key = (
        F.col("tp").cast(DecimalType(38, 0)) * F.col("neg")
        - F.col("fp").cast(DecimalType(38, 0)) * F.col("pos")
    )
    pick = F.row_number().over(Window.orderBy(F.desc_nulls_last(
        "jkey"), F.asc("cut")))
    best = (
        conf.withColumn("jkey", key)
        .withColumn("pick", pick)
        .where(F.col("pick") == 1)
    )
    return best.select(
        F.col("cut").alias("best_cut_cents"),
        "tp",
        "fp",
        "pos",
        "neg",
        F.round(F.col("tp").cast("double") / F.col("pos"), 6).alias(
            "sensitivity"
        ),
        F.round(
            (F.col("neg") - F.col("fp")).cast("double") / F.col("neg"),
            6,
        ).alias("specificity"),
        F.round(
            F.col("tp").cast("double") / F.col("pos")
            + (F.col("neg") - F.col("fp")).cast("double")
            / F.col("neg")
            - F.lit(1.0),
            6,
        ).alias("youden_j"),
    )

# ==== wave 207: Brunner-Munzel heteroscedastic rank test ============


@register(
    "q_agg_brunner_munzel",
    oracle="""
        WITH vals AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 'x' ELSE 'y' END AS grp,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS cents
            FROM orders
        ),
        ranked AS (
            SELECT grp,
                   CAST(ROW_NUMBER() OVER (ORDER BY cents, o_orderkey)
                        AS BIGINT)
                   - CAST(ROW_NUMBER() OVER (PARTITION BY grp
                          ORDER BY cents, o_orderkey) AS BIGINT) AS p
            FROM vals
        ),
        mom AS (
            SELECT
                CAST(SUM(CASE WHEN grp = 'x' THEN 1 ELSE 0 END)
                     AS BIGINT) AS n,
                CAST(SUM(CASE WHEN grp = 'y' THEN 1 ELSE 0 END)
                     AS BIGINT) AS m,
                CAST(SUM(CASE WHEN grp = 'x' THEN p ELSE 0 END)
                     AS BIGINT) AS sx,
                CAST(SUM(CASE WHEN grp = 'y' THEN p ELSE 0 END)
                     AS BIGINT) AS sy,
                SUM(CASE WHEN grp = 'x'
                    THEN CAST(p AS HUGEINT) * p ELSE 0 END) AS qx,
                SUM(CASE WHEN grp = 'y'
                    THEN CAST(p AS HUGEINT) * p ELSE 0 END) AS qy
            FROM ranked
        ),
        vr AS (
            SELECT n, m,
                   CAST(sx AS DOUBLE) / (CAST(n AS DOUBLE) * m)
                       AS p_hat,
                   ((CAST(qx // 4294967296 AS DOUBLE) * 4294967296.0
                     + CAST(qx % 4294967296 AS DOUBLE))
                    - CAST(sx AS DOUBLE) * sx / n) / (n - 1) AS s2x,
                   ((CAST(qy // 4294967296 AS DOUBLE) * 4294967296.0
                     + CAST(qy % 4294967296 AS DOUBLE))
                    - CAST(sy AS DOUBLE) * sy / m) / (m - 1) AS s2y
            FROM mom
        )
        SELECT n AS n_x, m AS n_y,
               ROUND(p_hat, 6) AS p_hat,
               ROUND(s2x, 4) AS s2x,
               ROUND(s2y, 4) AS s2y,
               ROUND((p_hat - 0.5)
                     / sqrt(s2x / (CAST(n AS DOUBLE) * m * m)
                            + s2y / (CAST(m AS DOUBLE) * n * n)), 6)
                   AS w_bm
        FROM vr
    """,
    section="A178",
    doc="Brunner-Munzel heteroscedastic rank test between urgent/"
    "high and other order totals: p_hat = P(Y < X) from placements "
    "p_i = combined_rank - within_rank (exact integer counts of "
    "cross-group wins under the tie-broken total order), "
    "studentized by per-group placement variances — the test to "
    "reach for when A87's Mann-Whitney assumption of equal shapes "
    "fails (MW conflates location with variance; BM estimates "
    "P(Y<X) directly and lets the two groups have DIFFERENT "
    "variances, the Behrens-Fisher situation in ranks). W = "
    "(p_hat - 1/2) / sqrt(S2x/(n m^2) + S2y/(m n^2)), the BM "
    "studentization over tie-broken placements (documented "
    "convention, same device as A153). Placement squares run in "
    "int128 and rebuild via A26 hi/lo; everything else is one-pass "
    "conditional integer moments. Scale: two rank windows over one "
    "global sort + a scalar reduction.",
)
def q_agg_brunner_munzel(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    vals = od.select(
        "o_orderkey",
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "x"
        )
        .otherwise("y")
        .alias("grp"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("cents"),
    )
    # Scale note (r6): the global placement rank comes from the
    # distributed two-pass row-number operator (range shuffle, never a
    # single-partition window); the within-group rank stays a keyed window.
    from ai_to_cvent_etl_spark.operators.ranking import global_row_number

    ranked = global_row_number(
        vals, ["cents", "o_orderkey"], out_col="_grn"
    ).select(
        "grp",
        (
            F.col("_grn")
            - F.row_number()
            .over(
                Window.partitionBy("grp").orderBy("cents", "o_orderkey")
            )
            .cast("bigint")
        ).alias("p"),
    )
    gx = F.col("grp") == "x"
    gy = F.col("grp") == "y"
    mom = ranked.agg(
        F.sum(F.when(gx, 1).otherwise(0)).cast("bigint").alias("n"),
        F.sum(F.when(gy, 1).otherwise(0)).cast("bigint").alias("m"),
        F.sum(F.when(gx, F.col("p")).otherwise(0))
        .cast("bigint")
        .alias("sx"),
        F.sum(F.when(gy, F.col("p")).otherwise(0))
        .cast("bigint")
        .alias("sy"),
        F.sum(
            F.when(
                gx, F.col("p").cast(DecimalType(38, 0)) * F.col("p")
            ).otherwise(F.lit(0).cast(DecimalType(38, 0)))
        ).alias("qx"),
        F.sum(
            F.when(
                gy, F.col("p").cast(DecimalType(38, 0)) * F.col("p")
            ).otherwise(F.lit(0).cast(DecimalType(38, 0)))
        ).alias("qy"),
    )
    hi_lo = (
        "cast({0} div 4294967296 as double) * 4294967296.0d"
        " + cast({0} % 4294967296 as double)"
    )
    nd = F.col("n").cast("double")
    md = F.col("m").cast("double")
    p_hat = F.col("sx").cast("double") / (nd * F.col("m"))
    s2x = (
        F.expr(hi_lo.format("qx"))
        - F.col("sx").cast("double") * F.col("sx") / F.col("n")
    ) / (F.col("n") - 1)
    s2y = (
        F.expr(hi_lo.format("qy"))
        - F.col("sy").cast("double") * F.col("sy") / F.col("m")
    ) / (F.col("m") - 1)
    return mom.select(
        F.col("n").alias("n_x"),
        F.col("m").alias("n_y"),
        F.round(p_hat, 6).alias("p_hat"),
        F.round(s2x, 4).alias("s2x"),
        F.round(s2y, 4).alias("s2y"),
        F.round(
            (p_hat - F.lit(0.5))
            / F.sqrt(
                s2x / (nd * F.col("m") * F.col("m"))
                + s2y / (md * F.col("n") * F.col("n"))
            ),
            6,
        ).alias("w_bm"),
    )

# ==== wave 208b: paired sign test ===================================


@register(
    "q_agg_sign_test",
    oracle="""
        WITH monthly AS (
            SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS m,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) AS cents
            FROM orders GROUP BY 1
        ),
        diffs AS (
            SELECT cents - LAG(cents) OVER (ORDER BY m) AS d
            FROM monthly
            QUALIFY d IS NOT NULL AND d <> 0
        ),
        counts AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_pos
            FROM diffs
        )
        SELECT n, n_pos, n - n_pos AS n_neg,
               ROUND((2.0 * n_pos - n) / sqrt(CAST(n AS DOUBLE)), 6)
                   AS z_sign,
               ROUND(CAST(n_pos AS DOUBLE) / n, 6) AS p_pos
        FROM counts
    """,
    section="A179",
    doc="Paired sign test on month-over-month revenue changes: count "
    "strictly positive vs negative deltas (exact zeros excluded, "
    "the standard convention) and z = (2*pos - n)/sqrt(n) against "
    "the p = 1/2 null — the assumption-free floor of the paired-"
    "test ladder (A91's Wilcoxon signed-rank adds magnitude ranks "
    "and assumes symmetry; the sign test assumes NOTHING but "
    "independent signs, which is why it's the referee when Wilcoxon "
    "and the t-test disagree). Everything is integer counting off "
    "one lag window; z is one pinned expression. Scale: month-grain "
    "agg, ~84-row window, scalar out.",
)
def q_agg_sign_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    monthly = od.groupBy(
        F.date_trunc("month", F.col("o_orderdate").cast("date")).alias(
            "m"
        )
    ).agg(
        F.expr(
            "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 "
            "AS BIGINT)"
        ).alias("cents")
    )
    w = Window.orderBy("m")
    diffs = monthly.select(
        (F.col("cents") - F.lag("cents").over(w)).alias("d")
    ).where(F.col("d").isNotNull() & (F.col("d") != 0))
    counts = diffs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("d") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_pos"),
    )
    return counts.select(
        "n",
        "n_pos",
        (F.col("n") - F.col("n_pos")).alias("n_neg"),
        F.round(
            (F.lit(2.0) * F.col("n_pos") - F.col("n"))
            / F.sqrt(F.col("n").cast("double")),
            6,
        ).alias("z_sign"),
        F.round(
            F.col("n_pos").cast("double") / F.col("n"), 6
        ).alias("p_pos"),
    )
