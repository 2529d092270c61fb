"""Forty-seventh-wave operators (r3 continuation): odds ratio,
try-arithmetic overflow family.

  A53 q_agg_odds_ratio — odds ratio with log-OR 95% CI for the 2×2
                         (arm × converted) table — the effect size for
                         proportions (A38's Cramér's V covers r×c;
                         the OR is what case-control readouts report),
                         on the same hash-split A/A arms as A47.
  F26 q_try_arithmetic — the try_* arithmetic family: try_multiply /
                         try_add on deliberately overflow-prone
                         BIGINTs return NULL where plain operators
                         would ANSI-fail the job — the robustness
                         surface for untrusted numeric feeds (F13's
                         try_cast sibling), mirrored by explicit
                         overflow guards in DuckDB.

Determinism notes (SURVEY §5.3):
  * A53: cell counts exact (the +0.5 Haldane correction keeps zero
    cells defined identically); OR and the CI are single IEEE
    formulas rounded 4dp.
  * F26: overflow boundaries are exact integer comparisons — the
    DuckDB mirror guards with the same bound Spark's try_multiply
    checks (a > (2^63−1) DIV b), so NULLs land on identical rows.
    Caveat discovered while building this: wrap ONLY simple operands
    in try_* — a plain multiply nested inside the try argument joins
    the TryEval scope and NULLs the whole expression (probed).

Scale notes:
  * A53 is collapsed-count arithmetic on A47's reductions.
  * F26 is map-only; try_* keeps ANSI mode on (the safety default)
    while making specific columns overflow-tolerant — the per-column
    alternative to flipping spark.sql.ansi.enabled off globally,
    which silently wraps EVERY overflow in the job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register

_H48_USER_DUCK = (
    "CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12)) AS BIGINT)"
)
_H48_USER = (
    "cast(conv(substr(md5(cast(user_id as string)), 1, 12), 16, 10) as bigint)"
)
_Z95 = 1.96


# --- A53: odds ratio with log-OR CI ------------------------------------------


@register(
    "q_agg_odds_ratio",
    oracle=f"""
        WITH u AS (
            SELECT user_id,
                   {_H48_USER_DUCK} % 2 AS arm,
                   MAX(CASE WHEN event_type = 'purchase' AND value > 150
                            THEN 1 ELSE 0 END) AS conv
            FROM events GROUP BY user_id
        ),
        cells AS (
            SELECT CAST(SUM(CASE WHEN arm = 0 AND conv = 1 THEN 1 ELSE 0
                        END) AS BIGINT) AS a,
                   CAST(SUM(CASE WHEN arm = 0 AND conv = 0 THEN 1 ELSE 0
                        END) AS BIGINT) AS b,
                   CAST(SUM(CASE WHEN arm = 1 AND conv = 1 THEN 1 ELSE 0
                        END) AS BIGINT) AS c,
                   CAST(SUM(CASE WHEN arm = 1 AND conv = 0 THEN 1 ELSE 0
                        END) AS BIGINT) AS d
            FROM u
        )
        SELECT a, b, c, d,
               ROUND((a + 0.5) * (d + 0.5) / ((b + 0.5) * (c + 0.5)), 4)
                   AS odds_ratio,
               ROUND(exp(ln((a + 0.5) * (d + 0.5)
                            / ((b + 0.5) * (c + 0.5)))
                         - {_Z95} * sqrt(1.0 / (a + 0.5) + 1.0 / (b + 0.5)
                                         + 1.0 / (c + 0.5)
                                         + 1.0 / (d + 0.5))), 4) AS or_lo,
               ROUND(exp(ln((a + 0.5) * (d + 0.5)
                            / ((b + 0.5) * (c + 0.5)))
                         + {_Z95} * sqrt(1.0 / (a + 0.5) + 1.0 / (b + 0.5)
                                         + 1.0 / (c + 0.5)
                                         + 1.0 / (d + 0.5))), 4) AS or_hi
        FROM cells
    """,
    section="A53",
    doc="Odds ratio with the log-OR (Woolf) 95% CI for the 2×2 arm × "
    "converted table (A47's hash-split arms and conversion metric): "
    "OR = ad/bc with the Haldane +0.5 correction keeping zero cells "
    "defined identically on both engines, CI = exp(ln OR ± z·√Σ1/n). "
    "The effect size case-control readouts report — risk-free where "
    "relative risk needs cohort incidence; on the A/A fixture the CI "
    "must cover 1.0, another harness self-check. Exact cells, single "
    "IEEE formulas; collapsed-count arithmetic on A47's reductions.",
)
def q_agg_odds_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 150),
                1,
            ).otherwise(0)
        ).alias("conv")
    ).select((F.expr(_H48_USER) % 2).alias("arm"), "conv")
    cells = u.agg(
        F.sum(
            F.when((F.col("arm") == 0) & (F.col("conv") == 1), 1).otherwise(0)
        ).alias("a"),
        F.sum(
            F.when((F.col("arm") == 0) & (F.col("conv") == 0), 1).otherwise(0)
        ).alias("b"),
        F.sum(
            F.when((F.col("arm") == 1) & (F.col("conv") == 1), 1).otherwise(0)
        ).alias("c"),
        F.sum(
            F.when((F.col("arm") == 1) & (F.col("conv") == 0), 1).otherwise(0)
        ).alias("d"),
    )
    a = F.col("a") + 0.5
    b = F.col("b") + 0.5
    c = F.col("c") + 0.5
    d = F.col("d") + 0.5
    orx = a * d / (b * c)
    se = F.sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)
    return cells.select(
        "a",
        "b",
        "c",
        "d",
        F.round(orx, 4).alias("odds_ratio"),
        F.round(F.exp(F.log(orx) - _Z95 * se), 4).alias("or_lo"),
        F.round(F.exp(F.log(orx) + _Z95 * se), 4).alias("or_hi"),
    )


# --- F26: try_* arithmetic ---------------------------------------------------

_BIG = 9_000_000_000_000_000  # keys above 2^63/9e15 = 1024 overflow


@register(
    "q_try_arithmetic",
    oracle=f"""
        WITH t AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey <= 9223372036854775807 // {_BIG}
                        THEN o_orderkey * {_BIG} END AS big_product
            FROM orders
        )
        SELECT o_orderkey,
               big_product,
               CASE WHEN big_product IS NOT NULL
                         AND big_product <= 9223372036854775807 - {_BIG}
                    THEN big_product + {_BIG} END AS big_sum,
               o_orderkey > 9223372036854775807 // {_BIG} AS overflowed
        FROM t
    """,
    section="F26",
    doc="The try_* arithmetic family: try_multiply and try_add on "
    "deliberately overflow-prone BIGINT expressions (keys scaled by "
    "9e15 — keys ≤ 1024 survive, larger keys overflow int64, both "
    "branches populated at every SF; the composed try_add overflows "
    "a further band near the boundary) return NULL where the plain "
    "operators would "
    "ANSI-fail the whole job — the per-column overflow tolerance for "
    "untrusted numeric feeds (F13's try_cast sibling; the alternative "
    "is flipping spark.sql.ansi.enabled off globally, which silently "
    "WRAPS every overflow everywhere). The overflowed flag makes the "
    "NULL rows auditable (E22's quarantine consumes it). DuckDB has "
    "no try_* — the oracle guards with the identical exact bound "
    "|a| ≤ ⌊2⁶³−1 / b⌋. Map-only; non-vacuous at every SF (both "
    "branches populated).",
)
def q_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    bp = F.expr(f"try_multiply(o_orderkey, CAST({_BIG} AS BIGINT))")
    return orders.select(
        "o_orderkey",
        bp.alias("big_product"),
        F.expr(
            f"try_add(try_multiply(o_orderkey, CAST({_BIG} AS BIGINT)), "
            f"CAST({_BIG} AS BIGINT))"
        ).alias("big_sum"),
        (F.col("o_orderkey") > 9223372036854775807 // _BIG).alias(
            "overflowed"
        ),
    )
