"""Time-series resampling / decay operators (r3).

  TS1 q_ts_resample_ohlc — 15-minute OHLC bars per event type: the classic
                           downsampling operator (open/high/low/close).
  TS2 q_ts_ewma           — exponentially weighted moving average over the
                            last 10 events per user (decay 1/2).
  TS3 q_ts_decay_sum      — half-life-decayed lifetime value per user
                            (weight halves every 14 days).

Determinism notes (SURVEY §5.3):
  * TS2/TS3 use decay factor 1/2 so every weight is an exact power of two:
    `v * 2^-k` only shifts the exponent — no rounding — making per-row
    products bit-identical across engines without trusting libm `pow`/`exp`
    (whose last-ulp behavior differs between JVM and C). TS3 goes further
    and builds the weight from an integer bit-shift.
  * TS3 quantizes per-row products with floor(x * 1e8) (floor is exactly
    defined on both engines; round() half-up vs half-even is not) and sums
    the resulting integers in DECIMAL — exact, associative,
    order-insensitive, so the result is stable under any partitioning.
  * TS1's open/close use min_by/max_by (arg_min/arg_max) on a
    zero-padded (unix_micros, event_id) string key — DuckDB 1.0 cannot
    order arg_min by a struct, and a padded string totally orders the same
    way on both engines.

Scale notes:
  * TS1/TS3 are single keyed aggregations (one shuffle, map-side partial).
  * TS2 is one window sort per user partition with a bounded 10-row frame —
    constant state per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register

# zero-padded total-order key over (unix_micros, event_id): cross-engine
# comparable as a plain VARCHAR
_KEY_SPARK = (
    "concat(lpad(cast(unix_micros(ts) as string), 20, '0'), '|',"
    " lpad(cast(event_id as string), 10, '0'))"
)
_KEY_DUCK = (
    "lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') || '|' ||"
    " lpad(CAST(event_id AS VARCHAR), 10, '0')"
)


@register(
    "q_ts_resample_ohlc",
    oracle=f"""
        SELECT event_type,
               time_bucket(INTERVAL 15 MINUTE, ts) AS bucket,
               arg_min(value, {_KEY_DUCK}) AS open,
               MAX(value) AS high,
               MIN(value) AS low,
               arg_max(value, {_KEY_DUCK}) AS close,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY event_type, bucket
    """,
    section="TS1",
    doc="15-minute OHLC downsampling per event type: open/close via "
    "arg_min/arg_max on a padded (unix_micros, event_id) key (total order, "
    "engine-portable), exact decimal volume sum. One keyed aggregation — "
    "a single map-side-combinable shuffle at any scale.",
)
def q_ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    key = F.expr(_KEY_SPARK)
    return (
        ev.groupBy(
            "event_type",
            F.window("ts", "15 minutes").start.alias("bucket"),
        )
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DecimalType(12, 2)))
            .cast("double")
            .alias("sum_value"),
        )
    )


@register(
    "q_ts_ewma",
    oracle="""
        WITH v AS (
            SELECT event_id, user_id, value,
                   list(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 9 PRECEDING AND CURRENT ROW
                   ) AS vals
            FROM events
        )
        SELECT event_id, user_id,
               ROUND(
                   list_sum(list_transform(vals,
                       (x, i) -> x / CAST(1::BIGINT << (len(vals) - i) AS DOUBLE)))
                   / list_sum(list_transform(vals,
                       (x, i) -> 1.0 / CAST(1::BIGINT << (len(vals) - i) AS DOUBLE))),
                   4) AS ewma
        FROM v
    """,
    section="TS2",
    doc="EWMA over the last 10 events per user, decay 1/2 per step "
    "(newest weight 1): weights are exact powers of two built by integer "
    "bit-shift, so per-element products are rounding-free on both engines; "
    "normalized weighted mean, ROUND 4. Bounded 10-row window frame — "
    "constant per-row state at any scale (unlike an unbounded EWMA "
    "recurrence, which is inherently sequential).",
)
def q_ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, 0)
    )
    vals = F.collect_list("value").over(w)
    # DuckDB lambda index i is 1-based (oldest element first); exponent
    # len-i runs n-1 (oldest) .. 0 (current row). Mirror with a descending
    # sequence zip.
    ewma = F.expr(
        "aggregate(zip_with(vals, sequence(1, size(vals)),"
        " (x, i) -> x / cast(shiftleft(1L, size(vals) - i) as double)),"
        " cast(0.0 as double), (a, x) -> a + x)"
        " / aggregate(transform(sequence(1, size(vals)),"
        " i -> 1.0 / cast(shiftleft(1L, size(vals) - i) as double)),"
        " cast(0.0 as double), (a, x) -> a + x)"
    )
    return (
        ev.select("event_id", "user_id", "value", vals.alias("vals"))
        .withColumn("ewma", F.round(ewma, 4))
        .drop("vals", "value")
    )


@register(
    "q_ts_decay_sum",
    oracle="""
        WITH q AS (
            SELECT user_id,
                   CAST(floor(
                       value / CAST(1::BIGINT << least(greatest(
                           CAST(floor(date_diff('day', CAST(ts AS DATE),
                                                DATE '2024-12-31') /
                                      CAST(14 AS DOUBLE)) AS BIGINT),
                           0), 62) AS DOUBLE)
                       * CAST(100000000 AS DOUBLE)) AS DECIMAL(28,0)) AS qv
            FROM events
        )
        SELECT user_id,
               CAST(SUM(qv) AS DOUBLE) / 100000000.0 AS decayed_value
        FROM q
        GROUP BY user_id
    """,
    section="TS3",
    doc="Half-life-decayed lifetime value per user (half-life 14 days, "
    "anchored at 2024-12-31): weight = 2^-floor(age/14) built by integer "
    "bit-shift (exact power of two — no libm), product quantized with "
    "floor(x*1e8) and summed in DECIMAL — exact, associative, "
    "order-insensitive under any partitioning. The freshness-weighting "
    "primitive for training-data recency sampling.",
)
def q_ts_decay_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    qv = F.expr(
        "cast(floor("
        " value / cast(shiftleft(1L, cast(least(greatest("
        "   cast(floor(datediff(date'2024-12-31', cast(ts as date))"
        "        / cast(14 as double)) as bigint),"
        "   0L), 62L) as int)) as double)"
        " * cast(100000000 as double)) as decimal(28,0))"
    )
    return (
        ev.select("user_id", qv.alias("qv"))
        .groupBy("user_id")
        .agg(
            (F.sum("qv").cast("double") / F.lit(100000000.0)).alias(
                "decayed_value"
            )
        )
    )
