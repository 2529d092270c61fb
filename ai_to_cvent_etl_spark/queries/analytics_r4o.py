"""Forty-third-wave operators (r3 continuation): churn-state transitions,
time-weighted averages.

  A52 q_agg_churn_transitions — monthly customer lifecycle accounting:
                          each active customer-month classified as
                          new / retained / reactivated by its gap to
                          the previous active month, plus the churn
                          outflow (actives whose next active month is
                          not consecutive) — the state-transition
                          ledger behind every growth report.
  TS20 q_ts_time_weighted_avg — time-weighted average concurrency:
                          the W27 sweep integrated over time
                          (Σ level·duration / horizon) plus peak —
                          the metric that bills/occupancy actually
                          follow (an event-weighted mean over-counts
                          bursts).

Determinism notes (SURVEY §5.3):
  * A52 is pure integer month arithmetic with lag/lead over (customer,
    month) — unique keys, no floats.
  * TS20: levels and durations are exact integers; the weighted sum is
    an exact BIGINT (≲ concurrency · horizon_us ≪ 2^53 at every SF —
    §5.3 rule 10); the average is one IEEE division rounded 4dp.

Scale notes:
  * A52: customer-months collapse from the fact table first; the
    lag/lead windows run per customer over their OWN active months —
    bounded state, one keyed shuffle.
  * TS20 reuses the W27 sweep (range-partitioned with offsets at
    scale); the integration adds one lead() over the same sort — no
    new shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register

# --- A52: churn-state transitions --------------------------------------------


@register(
    "q_agg_churn_transitions",
    oracle="""
        WITH cm AS (
            SELECT DISTINCT o_custkey AS ck,
                   (date_part('year', o_orderdate) - 1995) * 12
                   + date_part('month', o_orderdate) - 1 AS m
            FROM orders
        ),
        flagged AS (
            SELECT ck, m,
                   lag(m) OVER w AS prev_m,
                   lead(m) OVER w AS next_m,
                   CAST(MAX(m) OVER () AS BIGINT) AS horizon
            FROM cm
            WINDOW w AS (PARTITION BY ck ORDER BY m)
        )
        SELECT CAST(m AS BIGINT) AS month,
               CAST(SUM(CASE WHEN prev_m IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_new,
               CAST(SUM(CASE WHEN prev_m = m - 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_retained,
               CAST(SUM(CASE WHEN prev_m IS NOT NULL AND prev_m < m - 1
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_reactivated,
               CAST(SUM(CASE WHEN m < horizon
                             AND (next_m IS NULL OR next_m > m + 1)
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_churning_out
        FROM flagged
        GROUP BY m
    """,
    section="A52",
    doc="Monthly customer lifecycle ledger: distinct customer-months "
    "from the fact table, each classified by the gap to the SAME "
    "customer's previous active month — NEW (no prior), RETAINED "
    "(consecutive), REACTIVATED (gap > 1 month) — plus the churn "
    "outflow (actives whose next active month is not consecutive, "
    "horizon-guarded so the final month never fabricates churn). "
    "new + retained + reactivated = actives per month, and actives(m) "
    "− churning_out(m) + new/reactivated(m+1) reconciles the flow — "
    "the state-transition accounting behind every growth report, "
    "which A15's retention matrix summarizes but cannot decompose. "
    "Pure integer month arithmetic; per-customer windows over their "
    "own active months — one keyed shuffle.",
)
def q_agg_churn_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    mo = (F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate") - 1
    cm = orders.select(
        F.col("o_custkey").alias("ck"), mo.alias("m")
    ).distinct()
    w = Window.partitionBy("ck").orderBy("m")
    wall = Window.partitionBy()
    flagged = cm.select(
        "ck",
        "m",
        F.lag("m").over(w).alias("prev_m"),
        F.lead("m").over(w).alias("next_m"),
        F.max("m").over(wall).alias("horizon"),
    )
    return flagged.groupBy(F.col("m").cast("long").alias("month")).agg(
        F.sum(
            F.when(F.col("prev_m").isNull(), 1).otherwise(0)
        ).alias("n_new"),
        F.sum(
            F.when(F.col("prev_m") == F.col("m") - 1, 1).otherwise(0)
        ).alias("n_retained"),
        F.sum(
            F.when(
                F.col("prev_m").isNotNull()
                & (F.col("prev_m") < F.col("m") - 1),
                1,
            ).otherwise(0)
        ).alias("n_reactivated"),
        F.sum(
            F.when(
                (F.col("m") < F.col("horizon"))
                & (
                    F.col("next_m").isNull()
                    | (F.col("next_m") > F.col("m") + 1)
                ),
                1,
            ).otherwise(0)
        ).alias("n_churning_out"),
    )


# --- TS20: time-weighted average concurrency ---------------------------------

_TW_SESS_US = 300_000_000  # 5-minute sessions (W27's interval model)


@register(
    "q_ts_time_weighted_avg",
    oracle=f"""
        WITH b AS (
            SELECT epoch_us(ts) AS t, 1 AS delta, event_id FROM events
            UNION ALL
            SELECT epoch_us(ts) + {_TW_SESS_US}, -1, event_id FROM events
        ),
        sweep AS (
            SELECT t,
                   CAST(SUM(delta) OVER (
                       ORDER BY t, delta, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS level,
                   lead(t) OVER (ORDER BY t, delta, event_id) AS t_next
            FROM b
        ),
        seg AS (
            SELECT level, t_next - t AS dur
            FROM sweep WHERE t_next IS NOT NULL
        )
        SELECT CAST(SUM(dur) AS BIGINT) AS horizon_us,
               CAST(MAX(level) AS BIGINT) AS peak,
               ROUND(CAST(SUM(level * dur) AS DOUBLE)
                     / CAST(SUM(dur) AS DOUBLE), 4)
                   AS time_weighted_avg
        FROM seg
    """,
    section="TS20",
    doc="Time-weighted average concurrency: the W27 boundary sweep "
    "integrated over time — each constant-level segment (level, "
    "duration to the next boundary) contributes level·duration, and "
    "the average divides by the active horizon; peak rides along. "
    "THIS is the number occupancy, billing, and capacity baselines "
    "follow — an event-weighted mean over-counts bursty periods "
    "(many short segments) and under-counts quiet sustained load. "
    "All-integer sweep and weighted sums (exact BIGINTs, §5.3 rule "
    "10); one IEEE division. Adds one lead() to W27's sort — no new "
    "shuffle; range-partitioned with offsets at scale.",
)
def q_ts_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    starts = ev.select(
        F.unix_micros("ts").alias("t"), F.lit(1).alias("delta"), "event_id"
    )
    ends = ev.select(
        (F.unix_micros("ts") + _TW_SESS_US).alias("t"),
        F.lit(-1).alias("delta"),
        "event_id",
    )
    b = starts.unionAll(ends)
    order = Window.orderBy("t", "delta", "event_id")
    sweep = b.select(
        "t",
        F.sum("delta")
        .over(order.rowsBetween(Window.unboundedPreceding, 0))
        .alias("level"),
        F.lead("t").over(order).alias("t_next"),
    )
    seg = sweep.where(F.col("t_next").isNotNull()).select(
        "level", (F.col("t_next") - F.col("t")).alias("dur")
    )
    return seg.agg(
        F.sum("dur").alias("horizon_us"),
        F.max("level").alias("peak"),
        F.round(
            F.sum(F.col("level") * F.col("dur")).cast("double")
            / F.sum("dur").cast("double"),
            4,
        ).alias("time_weighted_avg"),
    )
