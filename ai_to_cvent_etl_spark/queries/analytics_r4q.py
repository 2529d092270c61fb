"""Forty-fifth-wave operator (r3 continuation): fixed-frequency
periodogram.

  TS21 q_ts_periodogram — spectral seasonality detection: DFT power of
                          the daily revenue series at candidate periods
                          (7, 14, 30 days), normalized against total
                          variance — the frequency-domain complement of
                          TS9/TS12's calendar-keyed seasonality (which
                          must GUESS the period; the periodogram finds
                          it).

Determinism notes (SURVEY §5.3):
  * The series is mean-centered whole-k$ integers (rule 10, TS11's
    device); trig ANGLES are range-reduced with the exact integer
    modulo (t % period) BEFORE the division — libm range reduction of
    large arguments (~2150 rad) diverges across engines far beyond a
    ulp, small arguments agree (observed at every SF before the fix); every product is quantized
    floor(x·1e4) before the exact DECIMAL sum; power and the variance
    share are single IEEE formulas rounded 6dp.

Scale notes:
  * One spine aggregation + one map-side trig projection per candidate
    frequency (the frequency list is a generated literal — adding
    candidates adds columns in ONE pass, not passes); the reduction
    carries 2·|freqs| quantized sums map-side. A full FFT is
    unnecessary when the candidate set is small and physical (daily /
    weekly / monthly cadences) — and this shape IS how you scan a few
    thousand candidate periods at 100 TB: still one scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register

_PERIODS = (7, 14, 30)
_PI2 = 6.283185307179586


@register(
    "q_ts_periodogram",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(date_diff('day', TIMESTAMP '1995-01-01',
                                  o_orderdate) AS BIGINT) AS t,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) // 100000 AS v
            FROM orders GROUP BY o_orderdate
        ),
        cent AS (
            SELECT t,
                   CAST(v AS DOUBLE)
                   - CAST(SUM(v) OVER () AS DOUBLE)
                     / CAST(COUNT(*) OVER () AS DOUBLE) AS x
            FROM daily
        ),
        freqs AS (SELECT unnest([{', '.join(str(p) for p in _PERIODS)}]) AS period),
        proj AS (
            SELECT f.period,
                   CAST(COUNT(*) AS DOUBLE) AS n,
                   CAST(SUM(CAST(floor(c.x * cos({_PI2} * (c.t % f.period) / f.period)
                                       * 1e4) AS DECIMAL(38,0)))
                        AS DOUBLE) / 1e4 AS sc,
                   CAST(SUM(CAST(floor(c.x * sin({_PI2} * (c.t % f.period) / f.period)
                                       * 1e4) AS DECIMAL(38,0)))
                        AS DOUBLE) / 1e4 AS ss,
                   CAST(SUM(CAST(floor(c.x * c.x * 1e4) AS DECIMAL(38,0)))
                        AS DOUBLE) / 1e4 AS sxx
            FROM cent c CROSS JOIN freqs f
            GROUP BY f.period
        )
        SELECT CAST(period AS INT) AS period_days,
               ROUND((sc * sc + ss * ss) * 2.0 / n, 4) AS power,
               ROUND((sc * sc + ss * ss) * 2.0 / n / sxx, 6)
                   AS variance_share
        FROM proj
    """,
    section="TS21",
    doc="Fixed-frequency periodogram of daily revenue: DFT power at "
    f"candidate periods {_PERIODS} days over the mean-centered "
    "whole-k$ series — power = (Σx·cos + i·Σx·sin) magnitude scaled "
    "2/n, and the variance share says how much of the series each "
    "cadence explains. The frequency-domain complement of TS9/TS12: "
    "calendar-keyed seasonality must GUESS the period; the "
    "periodogram FINDS it (the 7-day line dominating confirms the "
    "weekly cadence before any dow decomposition is trusted). Trig "
    "factors are row-local IEEE over exact integer angles; every "
    "projection term quantizes before the exact DECIMAL sums (§5.3 "
    "rule 10). One spine pass regardless of candidate count. Residual "
    "flake budget: a 1-ulp cross-engine trig diff landing on a floor "
    "boundary can flip one 1e-4 quantum (§5.3 rule 10 addendum) — "
    "never observed in a sweep; treat a one-quantum one-row mismatch "
    "as that noise, not a regression.",
)
def q_ts_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy("o_orderdate").agg(
        F.expr(
            "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)"
            " DIV 100000"
        ).alias("v")
    ).select(
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01"))
        .cast("long")
        .alias("t"),
        "v",
    )
    from pyspark.sql import Window

    wall = Window.partitionBy()
    cent = daily.select(
        "t",
        (
            F.col("v").cast("double")
            - F.sum("v").over(wall).cast("double")
            / F.count("*").over(wall).cast("double")
        ).alias("x"),
    )
    freqs = orders.sparkSession.createDataFrame(
        [(p,) for p in _PERIODS], "period int"
    )

    def qsum4(c):
        return (
            F.sum(F.floor(c * 1e4).cast("decimal(38,0)")).cast("double")
            / 1e4
        )

    ang = F.lit(_PI2) * (F.col("t") % F.col("period")) / F.col("period")
    proj = cent.crossJoin(F.broadcast(freqs)).groupBy("period").agg(
        F.count("*").cast("double").alias("n"),
        qsum4(F.col("x") * F.cos(ang)).alias("sc"),
        qsum4(F.col("x") * F.sin(ang)).alias("ss"),
        qsum4(F.col("x") * F.col("x")).alias("sxx"),
    )
    power = (
        F.col("sc") * F.col("sc") + F.col("ss") * F.col("ss")
    ) * 2.0 / F.col("n")
    return proj.select(
        F.col("period").cast("int").alias("period_days"),
        F.round(power, 4).alias("power"),
        F.round(power / F.col("sxx"), 6).alias("variance_share"),
    )
