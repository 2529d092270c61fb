"""Thirty-fourth-wave operators (r3 continuation): power analysis,
backfill planning, LIKE ANY/ALL predicates.

  A46 q_agg_power_analysis — experiment sample-size calculator:
                             required n per arm for a set of minimum
                             detectable effects, from the measured
                             metric variance (α=.05, power=.80) — the
                             planning half of the A40/A44/A45
                             experimentation suite.
  E30 q_etl_backfill_plan  — partition backfill planner: the expected
                             month spine (generated) anti-joined with
                             present months; missing partitions carry a
                             neighbor-interpolated row estimate — the
                             planner that turns 'data looks thin' into
                             a concrete backfill worklist.
  P7  q_filter_like_any_all — LIKE ALL / LIKE ANY multi-pattern
                             predicates (and NOT LIKE ALL) vs their
                             expanded conjunction/disjunction forms —
                             the multi-pattern filter surface.

Determinism notes (SURVEY §5.3):
  * A46: variance from whole-k$ integer moments (rule 10, A45's
    device); required n is ceil of one IEEE expression with literal
    z-values — ceil after a strictly-off-integer expression (the
    z-sum squared is irrational, so the boundary cannot land on an
    integer).
  * E30 is integer month arithmetic; the estimate is an IEEE average
    of exact neighbor counts rounded 2dp.
  * P7 is pure string predicate logic.

Scale notes:
  * A46 is one reduction + a 3-row literal MDE fan-out.
  * E30: the spine generates map-side (F22's rule); presence is one
    keyed count; the anti join is broadcast-size (months, not rows).
  * P7: multi-pattern LIKEs stay in codegen; prefer startswith/
    contains forms where possible (they vectorize to substring
    scans), and push the cheapest pattern first — conjunct order is
    preserved into the scan filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register

# --- A46: sample-size / power analysis ---------------------------------------

_ZA = 1.959963984540054  # z_{0.975}
_ZB = 0.8416212335729143  # z_{0.80}
_MDES = (1.0, 2.5, 5.0)  # minimum detectable effects, in k$ per customer


@register(
    "q_agg_power_analysis",
    oracle=f"""
        WITH per_cust AS (
            SELECT o_custkey,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) // 100000 AS y
            FROM orders GROUP BY o_custkey
        ),
        m AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                   CAST(SUM(y) AS DOUBLE) AS sy,
                   CAST(SUM(y * y) AS DOUBLE) AS syy
            FROM per_cust
        ),
        mde AS (
            SELECT unnest([{', '.join(str(m) for m in _MDES)}]) AS mde
        )
        SELECT CAST(mde.mde AS DOUBLE) AS mde_kusd,
               ROUND(m.syy / m.n - (m.sy / m.n) * (m.sy / m.n), 4)
                   AS metric_variance,
               CAST(ceil(2.0 * ({_ZA} + {_ZB}) * ({_ZA} + {_ZB})
                         * (m.syy / m.n - (m.sy / m.n) * (m.sy / m.n))
                         / (mde.mde * mde.mde)) AS BIGINT)
                   AS n_per_arm
        FROM m CROSS JOIN mde
    """,
    section="A46",
    doc="Experiment sample-size calculator: required n per arm = "
    "2(z_α/2 + z_β)²·σ²/δ² at α=.05, power=.80, for three minimum "
    "detectable effects, with σ² MEASURED from the per-customer "
    "revenue metric (whole-k$ integer moments — rule 10, A45's "
    "device) rather than guessed — the planning half of the "
    "experimentation suite (A40 interval, A44 ratio CI, A45 CUPED; "
    "CUPED's variance-reduction ratio divides straight into these "
    "n's). One reduction + a literal MDE fan-out; ceil lands "
    "strictly off integers (the z-sum squared is irrational).",
)
def q_agg_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.expr(
            "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)"
            " DIV 100000"
        ).alias("y")
    )
    m = per_cust.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    mde = orders.sparkSession.createDataFrame(
        [(x,) for x in _MDES], "mde double"
    )
    var = F.col("syy") / F.col("n") - (F.col("sy") / F.col("n")) * (
        F.col("sy") / F.col("n")
    )
    zsum2 = (_ZA + _ZB) * (_ZA + _ZB)
    return m.crossJoin(F.broadcast(mde)).select(
        F.col("mde").alias("mde_kusd"),
        F.round(var, 4).alias("metric_variance"),
        F.ceil(2.0 * zsum2 * var / (F.col("mde") * F.col("mde")))
        .cast("long")
        .alias("n_per_arm"),
    )


# --- E30: partition backfill planner -----------------------------------------


@register(
    "q_etl_backfill_plan",
    oracle="""
        WITH present AS (
            SELECT (date_part('year', o_orderdate) - 1995) * 12
                   + date_part('month', o_orderdate) - 1 AS m,
                   CAST(COUNT(*) AS BIGINT) AS n_rows
            FROM orders
            WHERE ((date_part('year', o_orderdate) - 1995) * 12
                   + date_part('month', o_orderdate) - 1) % 7 <> 3
            GROUP BY 1
        ),
        spine AS (
            SELECT unnest(generate_series(
                       (SELECT CAST(MIN(m) AS INT) FROM present),
                       (SELECT CAST(MAX(m) AS INT) FROM present)))
                   AS m
        ),
        joined AS (
            SELECT s.m, p.n_rows,
                   (SELECT pp.n_rows FROM present pp WHERE pp.m < s.m
                    ORDER BY pp.m DESC LIMIT 1) AS prev_rows,
                   (SELECT pn.n_rows FROM present pn WHERE pn.m > s.m
                    ORDER BY pn.m LIMIT 1) AS next_rows
            FROM spine s LEFT JOIN present p ON p.m = s.m
        )
        SELECT CAST(m AS BIGINT) AS missing_month,
               ROUND((CAST(coalesce(prev_rows, next_rows) AS DOUBLE)
                      + CAST(coalesce(next_rows, prev_rows) AS DOUBLE))
                     / 2.0, 2) AS est_rows
        FROM joined
        WHERE n_rows IS NULL
    """,
    section="E30",
    doc="Partition backfill planner: the expected month spine "
    "(generated from the observed min/max — F22's generator rule) "
    "LEFT-joined with the months actually present (every month ≡3 mod 7 "
    "is deterministically dropped so the planner is exercised "
    "non-vacuously at every SF); missing months carry a "
    "neighbor-interpolated "
    "row estimate (IGNORE NULLS lag/lead, edge months fall back to "
    "their single neighbor). The worklist an orchestrator turns into "
    "backfill jobs. Spine and anti-join are month-cardinality — "
    "metadata-scale regardless of row count.",
)
def q_etl_backfill_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    mo = (F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate") - 1
    present = (
        orders.where(mo % 7 != 3)
        .groupBy(mo.alias("m"))
        .agg(F.count("*").alias("n_rows"))
    )
    bounds = present.agg(
        F.min("m").alias("lo"), F.max("m").alias("hi")
    )
    spine = bounds.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("m")
    )
    j = spine.join(present, "m", "left")
    joined = j.select(
        "m",
        "n_rows",
        F.expr("lag(n_rows) IGNORE NULLS OVER (ORDER BY m)").alias(
            "prev_rows"
        ),
        F.expr("lead(n_rows) IGNORE NULLS OVER (ORDER BY m)").alias(
            "next_rows"
        ),
    )
    return joined.where(F.col("n_rows").isNull()).select(
        F.col("m").cast("long").alias("missing_month"),
        F.round(
            (
                F.coalesce(F.col("prev_rows"), F.col("next_rows")).cast(
                    "double"
                )
                + F.coalesce(F.col("next_rows"), F.col("prev_rows")).cast(
                    "double"
                )
            )
            / 2.0,
            2,
        ).alias("est_rows"),
    )


# --- P7: LIKE ANY / LIKE ALL -------------------------------------------------


@register(
    "q_filter_like_any_all",
    oracle="""
        SELECT p_partkey, p_name, p_type
        FROM part
        WHERE (p_name LIKE '%re%' OR p_name LIKE '%bl%')
          AND p_type LIKE '%M%' AND p_type LIKE '%A%'
          AND NOT (p_name LIKE '%gear%' AND p_name LIKE '%red%')
    """,
    section="P7",
    doc="Multi-pattern predicates: p_name LIKE ANY ('%re%', '%bl%'), "
    "p_type LIKE ALL ('%M%', '%A%'), and NOT LIKE ALL — the "
    "multi-pattern filter surface, verified against the expanded "
    "disjunction/conjunction forms (the oracle — expansion IS the "
    "semantics). Multi-pattern LIKEs stay inside codegen as fused "
    "substring scans; conjunct order is preserved into the scan "
    "filter, so the cheapest/most-selective pattern belongs first.",
)
def q_filter_like_any_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.where(
        F.expr("p_name LIKE ANY ('%re%', '%bl%')")
        & F.expr("p_type LIKE ALL ('%M%', '%A%')")
        & ~F.expr("p_name LIKE ALL ('%gear%', '%red%')")
    ).select("p_partkey", "p_name", "p_type")
