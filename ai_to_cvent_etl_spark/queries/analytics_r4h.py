"""Thirty-sixth-wave operators (r3 continuation): two-proportion z-test,
timezone conversions.

  A47 q_agg_two_proportion_z — the A/B conversion comparison: users
                               hash-split into two arms (E24's device),
                               per-arm conversion rates, pooled
                               two-proportion z — the simplest real
                               experiment readout, completing the
                               A40/A44/A45/A46 suite.
  F24 q_timezone_funcs       — timezone conversion surface:
                               to_utc_timestamp / from_utc_timestamp
                               against DuckDB's timezone() — wall-clock
                               parity across engines' tz databases,
                               plus the derived local hour.

Determinism notes (SURVEY §5.3):
  * A47: arm assignment is the 48-bit md5 hash mod 2 — exact; counts
    exact; the pooled z is one IEEE formula rounded 4dp.
  * F24: both engines resolve IANA zone rules; outputs are naive
    TIMESTAMPs (DuckDB's TIMESTAMPTZ cast back) and integer hours —
    wall-clock arithmetic on the fixture's date range is identical
    (modern tzdata on both sides).

Scale notes:
  * A47 is two keyed reductions (per-user flags, then per-arm) — the
    readout is collapsed-count arithmetic.
  * F24 is map-only; normalize event time to UTC at INGEST and keep
    tz conversion at the reporting edge — storing local wall-clock is
    the un-fixable bug at scale (ambiguous DST hours).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register

_H48_USER = (
    "cast(conv(substr(md5(cast(user_id as string)), 1, 12), 16, 10) as bigint)"
)
_H48_USER_DUCK = (
    "CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12)) AS BIGINT)"
)


# --- A47: two-proportion z-test ----------------------------------------------


@register(
    "q_agg_two_proportion_z",
    oracle=f"""
        WITH u AS (
            SELECT user_id,
                   {_H48_USER_DUCK} % 2 AS arm,
                   MAX(CASE WHEN event_type = 'purchase' AND value > 150
                            THEN 1 ELSE 0 END) AS converted
            FROM events GROUP BY user_id
        ),
        arms AS (
            SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_a,
                   CAST(SUM(CASE WHEN arm = 0 THEN converted ELSE 0 END)
                        AS BIGINT) AS k_a,
                   CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_b,
                   CAST(SUM(CASE WHEN arm = 1 THEN converted ELSE 0 END)
                        AS BIGINT) AS k_b
            FROM u
        )
        SELECT n_a, k_a, n_b, k_b,
               ROUND(CAST(k_a AS DOUBLE) / n_a, 6) AS p_a,
               ROUND(CAST(k_b AS DOUBLE) / n_b, 6) AS p_b,
               ROUND(CASE WHEN k_a + k_b > 0 AND k_a + k_b < n_a + n_b
                     THEN (CAST(k_a AS DOUBLE) / n_a
                           - CAST(k_b AS DOUBLE) / n_b)
                          / sqrt((CAST(k_a + k_b AS DOUBLE) / (n_a + n_b))
                                 * (1.0 - CAST(k_a + k_b AS DOUBLE)
                                          / (n_a + n_b))
                                 * (1.0 / n_a + 1.0 / n_b)) END, 4) AS z
        FROM arms
    """,
    section="A47",
    doc="Two-proportion z-test — the canonical A/B conversion readout: "
    "users hash-split into two arms (the 48-bit md5 device — stable, "
    "manifest-free assignment, E24's rule), per-arm user-level "
    "conversion rates (converted = any purchase over $150 — the "
    "threshold keeps both outcomes populated at every SF), and the "
    "pooled-proportion z statistic, NULL-guarded at the degenerate "
    "all/none-converted poles on both engines. Since "
    "the split is hash-random and both arms see the same data, z ≈ 0 "
    "here BY CONSTRUCTION — the A/A test, which is itself the "
    "standard harness validation (a non-null A/A z means the "
    "assignment or the metric is broken). Counts exact; z is one IEEE "
    "formula. Completes the experimentation suite: A46 plans, A47/A40 "
    "read out, A44 handles ratio metrics, A45 tightens variance.",
)
def q_agg_two_proportion_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 150),
                1,
            ).otherwise(0)
        ).alias("converted")
    ).select(
        (F.expr(_H48_USER) % 2).alias("arm"), "converted"
    )
    arms = u.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(
            F.when(F.col("arm") == 0, F.col("converted")).otherwise(0)
        ).alias("k_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(
            F.when(F.col("arm") == 1, F.col("converted")).otherwise(0)
        ).alias("k_b"),
    )
    pa = F.col("k_a").cast("double") / F.col("n_a")
    pb = F.col("k_b").cast("double") / F.col("n_b")
    pool = (F.col("k_a") + F.col("k_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    k_tot = F.col("k_a") + F.col("k_b")
    n_tot = F.col("n_a") + F.col("n_b")
    z = F.when(
        (k_tot > 0) & (k_tot < n_tot),
        (pa - pb)
        / F.sqrt(
            pool * (1.0 - pool) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
        ),
    )
    return arms.select(
        "n_a",
        "k_a",
        "n_b",
        "k_b",
        F.round(pa, 6).alias("p_a"),
        F.round(pb, 6).alias("p_b"),
        F.round(z, 4).alias("z"),
    )


# --- F24: timezone conversions -----------------------------------------------


@register(
    "q_timezone_funcs",
    oracle="""
        SELECT event_id,
               CAST(timezone('America/New_York', ts) AS TIMESTAMP)
                   AS utc_if_ny,
               CAST(timezone('Asia/Tokyo', timezone('UTC', ts))
                    AS TIMESTAMP) AS tokyo_local,
               CAST(date_part('hour', timezone('Asia/Tokyo',
                    timezone('UTC', ts))) AS INT) AS tokyo_hour
        FROM events
    """,
    section="F24",
    doc="Timezone conversion surface: to_utc_timestamp(ts, NY) — the "
    "instant this wall-clock reading denotes in New York, expressed "
    "in UTC — and from_utc_timestamp(ts, Tokyo) — the Tokyo wall "
    "clock for this UTC instant — plus the derived local hour, "
    "verified against DuckDB's timezone() (both resolve IANA rules; "
    "outputs are naive TIMESTAMPs so the hash boundary sees wall "
    "clocks, not zoned types). The operational rule this query "
    "documents: store UTC at ingest, convert at the reporting edge — "
    "local wall-clock storage is unrecoverable across DST folds. "
    "Map-only.",
)
def q_timezone_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.to_utc_timestamp("ts", "America/New_York").alias("utc_if_ny"),
        F.from_utc_timestamp("ts", "Asia/Tokyo").alias("tokyo_local"),
        F.hour(F.from_utc_timestamp("ts", "Asia/Tokyo"))
        .cast("int")
        .alias("tokyo_hour"),
    )
