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
from ai_to_cvent_etl_spark.queries._util import dec2
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

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


# ==== from analytics_r3b ===========================================

_Z_FRAME = 20  # trailing frame size (rows)

_Z_MIN_N = 10  # minimum observations before scoring

_Z_T = 2.5     # |z| threshold

_TS5_MIN_VALUE = 250.0  # rare high-value slice => genuinely sparse series

@register(
    "q_ts_anomaly_zscore",
    oracle=f"""
        WITH q AS (
            SELECT event_id, user_id, ts,
                   CAST(floor(value * 1e4) AS BIGINT) AS qv
            FROM events
        ),
        w AS (
            SELECT event_id, user_id, qv,
                   CAST(COUNT(*) OVER f AS BIGINT) AS n,
                   CAST(SUM(qv) OVER f AS BIGINT) AS s,
                   CAST(SUM(qv * qv) OVER f AS BIGINT) AS s2
            FROM q
            WINDOW f AS (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN {_Z_FRAME - 1} PRECEDING AND CURRENT ROW
            )
        )
        SELECT event_id, user_id,
               (CAST(qv AS DOUBLE) - CAST(s AS DOUBLE) / n)
               / sqrt(CAST(s2 AS DOUBLE) / n
                      - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))
                   AS zscore
        FROM w
        WHERE n >= {_Z_MIN_N}
          AND CAST(s2 AS DOUBLE) / n
              - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n) > 0
          AND abs((CAST(qv AS DOUBLE) - CAST(s AS DOUBLE) / n)
                  / sqrt(CAST(s2 AS DOUBLE) / n
                         - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)))
              > {_Z_T}
    """,
    section="TS4",
    doc="Trailing-20-event z-score anomaly detection per user: values "
    "quantized floor(v*1e4) to BIGINT so the window sums are exact "
    "integers (order-insensitive), then mean/population-variance/z are "
    "rebuilt with the identical IEEE double expression on both engines — "
    "bit-deterministic, no output rounding. Bounded ROWS frame = constant "
    "per-row state; one window sort per user at any scale.",
)
def q_ts_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    f = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_Z_FRAME - 1), Window.currentRow)
    )
    q = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.expr("cast(floor(value * 1e4) as bigint)").alias("qv"),
    )
    w = q.select(
        "event_id",
        "user_id",
        "qv",
        F.count(F.lit(1)).over(f).alias("n"),
        F.sum("qv").over(f).alias("s"),
        F.sum(F.col("qv") * F.col("qv")).over(f).alias("s2"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    var = F.col("s2").cast("double") / F.col("n") - mean * mean
    z = (F.col("qv").cast("double") - mean) / F.sqrt(var)
    return (
        w.filter((F.col("n") >= _Z_MIN_N) & (var > 0) & (F.abs(z) > _Z_T))
        .select("event_id", "user_id", z.alias("zscore"))
    )

@register(
    "q_ts_interpolate",
    oracle=f"""
        WITH spine AS (
            SELECT t.event_type, CAST(d.d AS DATE) AS day
            FROM (SELECT DISTINCT event_type FROM events) t
            CROSS JOIN generate_series(DATE '2024-01-01', DATE '2024-01-30',
                                       INTERVAL 1 DAY) d(d)
        ),
        daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS v
            FROM events WHERE value >= {_TS5_MIN_VALUE}
            GROUP BY 1, 2
        ),
        j AS (
            SELECT s.event_type, s.day, d.v FROM spine s
            LEFT JOIN daily d ON d.event_type = s.event_type AND d.day = s.day
        ),
        f AS (
            SELECT event_type, day, v,
                   last_value(v IGNORE NULLS) OVER (
                       PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS pv,
                   last_value(CASE WHEN v IS NOT NULL THEN day END
                              IGNORE NULLS) OVER (
                       PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS pd,
                   first_value(v IGNORE NULLS) OVER (
                       PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
                   ) AS nv,
                   first_value(CASE WHEN v IS NOT NULL THEN day END
                               IGNORE NULLS) OVER (
                       PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
                   ) AS nd
            FROM j
        )
        SELECT event_type, day,
               CASE WHEN v IS NOT NULL THEN v
                    WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                        pv + (nv - pv)
                        * (CAST(date_diff('day', pd, day) AS DOUBLE)
                           / CAST(date_diff('day', pd, nd) AS DOUBLE))
                    WHEN pv IS NOT NULL THEN pv
                    WHEN nv IS NOT NULL THEN nv
               END AS filled,
               CASE WHEN v IS NOT NULL THEN 'actual'
                    WHEN pv IS NOT NULL AND nv IS NOT NULL THEN 'interp'
                    WHEN pv IS NOT NULL THEN 'ffill'
                    WHEN nv IS NOT NULL THEN 'bfill'
                    ELSE 'empty' END AS fill_kind
        FROM f
    """,
    section="TS5",
    doc="Linear interpolation of a sparse daily series (per-type sums of "
    "rare high-value events) over a generated day spine: previous/next "
    "present values via IGNORE-NULLS windows, gaps filled "
    "pv + (nv-pv)*(day-pd)/(nd-pd), edges forward/back-filled, each row "
    "tagged actual/interp/ffill/bfill. Series values are exact DECIMAL "
    "sums and the fraction is an integer-day ratio, so the IEEE result "
    "is bit-identical cross-engine — no rounding. Spine is tiny "
    "(types x 30 days) and broadcast; window passes sort spine-sized "
    "data per type.",
)
def q_ts_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    spine = (
        ev.select("event_type")
        .distinct()
        .crossJoin(
            spark.range(1).select(
                F.explode(
                    F.expr(
                        "sequence(date'2024-01-01', date'2024-01-30',"
                        " interval 1 day)"
                    )
                ).alias("day")
            )
        )
    )
    daily = (
        ev.filter(F.col("value") >= _TS5_MIN_VALUE)
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(F.col("value").cast(DecimalType(12, 2)))
            .cast("double")
            .alias("v")
        )
    )
    j = spine.join(F.broadcast(daily), ["event_type", "day"], "left")
    wb = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    day_if_present = F.when(F.col("v").isNotNull(), F.col("day"))
    f = j.select(
        "event_type",
        "day",
        "v",
        F.last("v", ignorenulls=True).over(wb).alias("pv"),
        F.last(day_if_present, ignorenulls=True).over(wb).alias("pd"),
        F.first("v", ignorenulls=True).over(wf).alias("nv"),
        F.first(day_if_present, ignorenulls=True).over(wf).alias("nd"),
    )
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        F.datediff(F.col("day"), F.col("pd")).cast("double")
        / F.datediff(F.col("nd"), F.col("pd")).cast("double")
    )
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNotNull() & F.col("nv").isNotNull(), interp)
        .when(F.col("pv").isNotNull(), F.col("pv"))
        .when(F.col("nv").isNotNull(), F.col("nv"))
    )
    kind = (
        F.when(F.col("v").isNotNull(), F.lit("actual"))
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(), F.lit("interp")
        )
        .when(F.col("pv").isNotNull(), F.lit("ffill"))
        .when(F.col("nv").isNotNull(), F.lit("bfill"))
        .otherwise(F.lit("empty"))
    )
    return f.select(
        "event_type", "day", filled.alias("filled"), kind.alias("fill_kind")
    )

# ==== from analytics_r3d ===========================================

_WAU_DAYS = 7

@register(
    "q_ts_active_users",
    oracle=f"""
        WITH du AS (
            SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
        ),
        dau AS (
            SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM du GROUP BY day
        ),
        expanded AS (
            SELECT du.day + CAST(o.off AS INTEGER) AS wday, du.user_id
            FROM du CROSS JOIN (
                SELECT unnest(range(0, {_WAU_DAYS})) AS off
            ) o
        ),
        wau AS (
            SELECT wday AS day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
            FROM expanded GROUP BY wday
        )
        SELECT dau.day, dau.dau, wau.wau,
               CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE)
                   AS stickiness
        FROM dau JOIN wau USING (day)
    """,
    section="TS8",
    doc="Daily active users, trailing-7-day weekly active users, and "
    "DAU/WAU stickiness — the product-engagement headline metrics. The "
    "sliding COUNT DISTINCT uses bounded day-expansion: each distinct "
    "(day, user) observation emits exactly 7 window-membership rows, then "
    "one keyed distinct-count per window day — constant fan-out, no "
    "per-window unbounded state (the scalable alternative W13 "
    "documented). All-integer; stickiness is one IEEE division.",
)
def q_ts_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(
        F.col("ts").cast("date").alias("day"), "user_id"
    ).distinct()
    dau = du.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    expanded = du.select(
        F.explode(F.sequence(F.lit(0), F.lit(_WAU_DAYS - 1))).alias("off"),
        "day",
        "user_id",
    ).select(F.expr("date_add(day, off)").alias("wday"), "user_id")
    wau = expanded.groupBy(F.col("wday").alias("day")).agg(
        F.countDistinct("user_id").alias("wau")
    )
    return dau.join(wau, "day").select(
        "day",
        "dau",
        "wau",
        (F.col("dau").cast("double") / F.col("wau").cast("double")).alias(
            "stickiness"
        ),
    )

# ==== from analytics_r3e ===========================================

@register(
    "q_ts_dow_seasonality",
    oracle="""
        WITH d AS (
            SELECT event_type,
                   CAST(isodow(ts) AS INTEGER) AS dow,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(CAST(value AS DECIMAL(12,2))) AS sv
            FROM events GROUP BY event_type, isodow(ts)
        )
        SELECT event_type, dow, n,
               CAST(sv AS DOUBLE) AS sum_value,
               CAST(sv AS DOUBLE) / n AS avg_value,
               CAST(n AS DOUBLE)
                   / CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT)
                   AS share_of_type
        FROM d
    """,
    section="TS9",
    doc="Day-of-week seasonality profile per event type: event share and "
    "value stats by ISO weekday (Spark weekday()+1 == DuckDB isodow, "
    "probed) — the weekly-pattern extraction behind staffing/capacity "
    "models. One map-side-combinable aggregation collapses the corpus to "
    "a |types| x 7 table; the share window runs on that bounded table. "
    "DECIMAL sums; share/avg are fixed IEEE expressions — exact.",
)
def q_ts_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type",
        (F.expr("weekday(ts)") + 1).cast("int").alias("dow"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast(DecimalType(12, 2))).alias("sv"),
    )
    wt = Window.partitionBy("event_type")
    return d.select(
        "event_type",
        "dow",
        "n",
        F.col("sv").cast("double").alias("sum_value"),
        (F.col("sv").cast("double") / F.col("n")).alias("avg_value"),
        (
            F.col("n").cast("double") / F.sum("n").over(wt)
        ).alias("share_of_type"),
    )

@register(
    "q_ts_cusum",
    oracle="""
        WITH q AS (
            SELECT event_id, user_id, ts,
                   CAST(floor(value * 1e4) AS BIGINT) AS qv
            FROM events
        ),
        t AS (
            SELECT event_id, user_id, ts, qv,
                   CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n,
                   CAST(SUM(qv) OVER (PARTITION BY user_id) AS BIGINT) AS s
            FROM q
        ),
        r AS (
            SELECT user_id, n,
                   CAST(SUM(qv * n - s) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS cusum
            FROM t
        )
        SELECT user_id,
               CAST(MAX(n) AS BIGINT) AS n_events,
               CAST(MAX(cusum) AS BIGINT) AS max_cusum,
               CAST(MIN(cusum) AS BIGINT) AS min_cusum,
               CAST(MAX(cusum) - MIN(cusum) AS BIGINT) AS cusum_range
        FROM r GROUP BY user_id
    """,
    section="TS10",
    doc="CUSUM change detection per user: cumulative deviation of "
    "quantized values from the user's own mean, kept ALL-INTEGER by "
    "scaling the deviation with the user's event count (dev = qv*n - s) "
    "instead of forming a fractional mean — the running sum is exact "
    "under any partitioning, no rounding anywhere. max/min/range of the "
    "CUSUM path are the standard level-shift signals. Two window passes "
    "per user partition (totals, then ordered running sum) — constant "
    "per-row state.",
)
def q_ts_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    q = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.expr("cast(floor(value * 1e4) as bigint)").alias("qv"),
    )
    wu = Window.partitionBy("user_id")
    t = q.select(
        "event_id",
        "user_id",
        "ts",
        "qv",
        F.count(F.lit(1)).over(wu).alias("n"),
        F.sum("qv").over(wu).alias("s"),
    )
    run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = t.select(
        "user_id",
        "n",
        F.sum(F.col("qv") * F.col("n") - F.col("s")).over(run).alias("cusum"),
    )
    return r.groupBy("user_id").agg(
        F.max("n").alias("n_events"),
        F.max("cusum").alias("max_cusum"),
        F.min("cusum").alias("min_cusum"),
        (F.max("cusum") - F.min("cusum")).alias("cusum_range"),
    )

# ==== from analytics_r3k ===========================================

_ROLLCORR_ORACLE = """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS x,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS y
        FROM orders GROUP BY 1
    ),
    bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily),
    spine AS (
        SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
                   AS day
        FROM bounds
    ),
    filled AS (
        SELECT s.day,
               COALESCE(d.x, 0) AS x,
               CAST(COALESCE(d.y, 0) AS DECIMAL(19,2)) AS y
        FROM spine s LEFT JOIN daily d ON s.day = d.day
    ),
    mom AS (
        SELECT day,
               CAST(COUNT(*) OVER w AS BIGINT) AS n,
               CAST(SUM(x) OVER w AS BIGINT) AS sx,
               CAST(SUM(CAST(y AS DECIMAL(38,4))) OVER w AS DOUBLE) AS sy,
               CAST(SUM(CAST(x AS DECIMAL(19,2)) * y) OVER w AS DOUBLE)
                   AS sxy,
               CAST(SUM(x * x) OVER w AS BIGINT) AS sxx,
               CAST(SUM(y * y) OVER w AS DOUBLE) AS syy
        FROM filled
        WINDOW w AS (ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT day,
           CASE WHEN (CAST(n AS DOUBLE) * sxx
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
                 AND (CAST(n AS DOUBLE) * syy - sy * sy) > 0
                THEN ROUND(
                     (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                     / (sqrt(CAST(n AS DOUBLE) * sxx
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * sqrt(CAST(n AS DOUBLE) * syy - sy * sy)), 6)
           END AS rolling_corr
    FROM mom
    WHERE n = 14
"""

@register(
    "q_ts_rolling_corr",
    oracle=_ROLLCORR_ORACLE,
    section="TS7",
    doc="14-day rolling Pearson correlation between daily order count and "
    "daily revenue on a gap-free day spine (gap days contribute exact "
    "zeros). Built from exact sliding MOMENTS — integer counts and "
    "DECIMAL sums over a ROWS frame — with r as one IEEE formula at the "
    "end, instead of a native corr() window whose internal accumulation "
    "order differs across engines. Warmup rows (frame < 14 days) are "
    "excluded; zero-variance windows yield NULL identically. The corpus "
    "collapses to |days| rows before any window runs.",
)
def q_ts_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("x"),
        F.sum(dec2(F.col("o_totalprice"))).alias("y"),
    )
    bounds = daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("day")
    )
    # Narrow the sum-widened daily revenue to DECIMAL(19,2) (lossless: a
    # day's revenue fits at every SF). Width 19 keeps the squared moment
    # inside decimal-38 on both engines AND forces DuckDB off its
    # overflow-prone int64 multiply path (width<=18 factors multiply in
    # int64 and 1.5e9-cent days overflow it).
    filled = spine.join(daily, "day", "left").select(
        "day",
        F.coalesce(F.col("x"), F.lit(0)).alias("x"),
        F.coalesce(F.col("y"), F.lit(0)).cast("decimal(19,2)").alias("y"),
    )
    w = Window.orderBy("day").rowsBetween(-13, 0)
    mom = filled.select(
        "day",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,4)")).over(w).cast("double").alias("sy"),
        F.sum(F.col("x").cast("decimal(19,2)") * F.col("y"))
        .over(w).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).cast("double").alias("syy"),
    ).where(F.col("n") == 14)
    nd = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    varx = nd * F.col("sxx") - sx * sx
    vary = nd * F.col("syy") - F.col("sy") * F.col("sy")
    return mom.select(
        "day",
        F.when(
            (varx > 0) & (vary > 0),
            F.round(
                (nd * F.col("sxy") - sx * F.col("sy"))
                / (F.sqrt(varx) * F.sqrt(vary)),
                6,
            ),
        ).alias("rolling_corr"),
    )

# ==== from analytics_r3m ===========================================

_CP_MINSEG = 7

@register(
    "q_ts_changepoint",
    oracle=f"""
        WITH daily AS (
            SELECT o_orderdate AS day,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) // 100000 AS v
            FROM orders GROUP BY o_orderdate
        ),
        cum AS (
            SELECT day, v,
                   row_number() OVER w AS t,
                   COUNT(*) OVER () AS n,
                   CAST(SUM(v) OVER w AS BIGINT) AS cs,
                   CAST(SUM(v * v) OVER w AS BIGINT) AS cq,
                   CAST(SUM(v) OVER () AS BIGINT) AS ts,
                   CAST(SUM(v * v) OVER () AS BIGINT) AS tq
            FROM daily
            WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)
        ),
        cost AS (
            SELECT day, t, n,
                   CAST(cq AS DOUBLE)
                   - CAST(cs AS DOUBLE) * CAST(cs AS DOUBLE) / t
                   + (CAST(tq AS DOUBLE) - CAST(cq AS DOUBLE))
                   - (CAST(ts AS DOUBLE) - CAST(cs AS DOUBLE))
                     * (CAST(ts AS DOUBLE) - CAST(cs AS DOUBLE))
                     / (n - t) AS sse,
                   CAST(cs AS DOUBLE) / t AS mean_left,
                   (CAST(ts AS DOUBLE) - CAST(cs AS DOUBLE)) / (n - t)
                       AS mean_right
            FROM cum
            WHERE t >= {_CP_MINSEG} AND t <= n - {_CP_MINSEG}
        )
        SELECT day AS split_day,
               CAST(t AS BIGINT) AS n_left,
               CAST(n - t AS BIGINT) AS n_right,
               ROUND(mean_left, 4) AS mean_left,
               ROUND(mean_right, 4) AS mean_right,
               ROUND(sse, 4) AS sse
        FROM cost
        ORDER BY sse, day
        LIMIT 1
    """,
    section="TS11",
    doc="Single change-point detection on the daily revenue series: the "
    "split minimizing total two-segment SSE, scanned via exact "
    "cumulative moments — SSE_left(k) + SSE_right(k) come from "
    "prefix/total moment algebra (Q - S²/n per segment), so the whole "
    "candidate scan is ONE cumulative window pass, not n² segment "
    "aggregations. The series is the daily revenue in WHOLE k$ (exact "
    "decimal cents, integer-divided by 1e5), which keeps every moment "
    "an exact BIGINT far below 2^53 at all test SFs: integer→double "
    "casts are exact on both engines, sidestepping the int128/hugeint "
    "decimal→double conversion path, whose last-ulp rounding differs "
    "between Spark's BigDecimal and DuckDB's hugeint at ≥19 "
    "significant digits (observed at sf0.01 — the reason this query "
    "does NOT use wide-decimal moments). Cost bits are then identical "
    "cross-engine, so the argmin needs no pre-rounding; ties break on "
    f"the earlier day. Segments shorter than {_CP_MINSEG} days are "
    "excluded. Aggregates to the day grain first (TS7's "
    "window-on-spine rule): the window runs on |days| rows, constant "
    "memory at any corpus scale.",
)
def q_ts_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.expr(
            "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)"
            " DIV 100000"
        ).alias("v")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = daily.select(
        "day",
        F.row_number().over(Window.orderBy("day")).alias("t"),
        F.count("*").over(wall).alias("n"),
        F.sum("v").over(w).alias("cs"),
        F.sum(F.col("v") * F.col("v")).over(w).alias("cq"),
        F.sum("v").over(wall).alias("ts"),
        F.sum(F.col("v") * F.col("v")).over(wall).alias("tq"),
    )
    t = F.col("t").cast("double")
    nt = (F.col("n") - F.col("t")).cast("double")
    cs, cq = F.col("cs").cast("double"), F.col("cq").cast("double")
    ts_, tq = F.col("ts").cast("double"), F.col("tq").cast("double")
    cost = cum.where(
        (F.col("t") >= _CP_MINSEG) & (F.col("t") <= F.col("n") - _CP_MINSEG)
    ).select(
        "day",
        "t",
        "n",
        (cq - cs * cs / t + (tq - cq) - (ts_ - cs) * (ts_ - cs) / nt).alias(
            "sse"
        ),
        (cs / t).alias("mean_left"),
        ((ts_ - cs) / nt).alias("mean_right"),
    )
    return (
        cost.orderBy("sse", "day")
        .limit(1)
        .select(
            F.col("day").alias("split_day"),
            F.col("t").cast("long").alias("n_left"),
            (F.col("n") - F.col("t")).cast("long").alias("n_right"),
            F.round("mean_left", 4).alias("mean_left"),
            F.round("mean_right", 4).alias("mean_right"),
            F.round("sse", 4).alias("sse"),
        )
    )

# ==== from analytics_r3n ===========================================

_TS12_HALF = 14  # centered window: 14 before + current + 14 after

_TS12_QS = 1e4

@register(
    "q_ts_decompose",
    oracle=f"""
        WITH daily AS (
            SELECT o_orderdate AS day,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev,
                   CAST(date_diff('day', TIMESTAMP '1995-01-02',
                                  o_orderdate) AS BIGINT) % 7 AS dow
            FROM orders GROUP BY o_orderdate
        ),
        tr AS (
            SELECT day, dow, CAST(rev AS DOUBLE) AS v,
                   CAST(SUM(rev) OVER w AS DOUBLE)
                   / CAST(COUNT(*) OVER w AS DOUBLE) AS trend
            FROM daily
            WINDOW w AS (ORDER BY day ROWS BETWEEN {_TS12_HALF} PRECEDING
                         AND {_TS12_HALF} FOLLOWING)
        ),
        det AS (
            SELECT day, dow, v, trend, v - trend AS d FROM tr
        ),
        seas AS (
            SELECT dow,
                   CAST(SUM(CAST(floor(d * {_TS12_QS}) AS DECIMAL(38,0)))
                        AS DOUBLE) / {_TS12_QS} / COUNT(*) AS seasonal
            FROM det GROUP BY dow
        )
        SELECT det.day,
               ROUND(det.trend, 4) AS trend,
               ROUND(seas.seasonal, 4) AS seasonal,
               ROUND(det.d - seas.seasonal, 4) AS residual
        FROM det JOIN seas ON seas.dow = det.dow
    """,
    section="TS12",
    doc="Classical (moving-average) decomposition of the daily revenue "
    f"series: trend = centered {2 * _TS12_HALF + 1}-OBSERVATION moving "
    "average (exact DECIMAL window sum / window count — partial edge "
    "windows included, deterministically); seasonal = day-of-week mean "
    "of the detrended series, with each detrended value quantized "
    "floor(x·1e4) before the exact DECIMAL sum (§5.3 rule 10 keeps the "
    "backing integer ≪ 2^53); residual = detrended − seasonal. "
    "Day-of-week is datediff-mod-7 from a fixed Monday — NOT engine "
    "dayofweek numbering (the F5 trap). Aggregates to the day grain "
    "first (TS7's rule): every component runs on the |days| spine; the "
    "7-row seasonal side broadcasts.",
)
def q_ts_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
    ).withColumn(
        "dow",
        (F.datediff(F.col("day"), F.lit("1995-01-02")).cast("long")) % 7,
    )
    w = Window.orderBy("day").rowsBetween(-_TS12_HALF, _TS12_HALF)
    tr = daily.select(
        "day",
        "dow",
        F.col("rev").cast("double").alias("v"),
        (
            F.sum("rev").over(w).cast("double")
            / F.count("*").over(w).cast("double")
        ).alias("trend"),
    )
    det = tr.select(
        "day", "dow", "trend", (F.col("v") - F.col("trend")).alias("d")
    )
    seas = det.groupBy("dow").agg(
        (
            F.sum(
                F.floor(F.col("d") * _TS12_QS).cast("decimal(38,0)")
            ).cast("double")
            / _TS12_QS
            / F.count("*")
        ).alias("seasonal")
    )
    return det.join(seas, "dow").select(
        "day",
        F.round("trend", 4).alias("trend"),
        F.round("seasonal", 4).alias("seasonal"),
        F.round(F.col("d") - F.col("seasonal"), 4).alias("residual"),
    )

# ==== from analytics_r3r ===========================================

_FC_LAG = 7

@register(
    "q_ts_forecast_eval",
    oracle=f"""
        WITH daily AS (
            SELECT o_orderdate AS day,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) AS cents
            FROM orders GROUP BY o_orderdate
        ),
        fc AS (
            SELECT day, cents,
                   lag(cents, {_FC_LAG}) OVER (ORDER BY day) AS pred
            FROM daily
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
               ROUND(CAST(SUM(abs(cents - pred)) AS DOUBLE)
                     / COUNT(*) / 100.0, 4) AS mae_dollars,
               ROUND(CAST(SUM(abs(cents - pred)) AS DOUBLE)
                     / CAST(SUM(cents) AS DOUBLE), 6) AS wape,
               ROUND(CAST(SUM(cents - pred) AS DOUBLE)
                     / CAST(SUM(cents) AS DOUBLE), 6) AS bias
        FROM fc WHERE pred IS NOT NULL
    """,
    section="TS13",
    doc="Forecast evaluation against the seasonal-naive baseline "
    f"(prediction = revenue {_FC_LAG} OBSERVATIONS prior on the day "
    "spine): MAE (dollars), WAPE (the scale-free accuracy metric "
    "operations teams actually track), and bias — all ratios of exact "
    "BIGINT cent errors (int64-backed daily sums, §5.3 rule 10), "
    "rounded on output. The eval harness for any forecasting job: swap "
    "the lag column for a model's prediction column and the metrics "
    "are unchanged. Runs on the |days| spine (TS7's rule) — one "
    "aggregation, one lag window, one reduction.",
)
def q_ts_forecast_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.expr(
            "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)"
        ).alias("cents")
    )
    fc = daily.select(
        "cents",
        F.lag("cents", _FC_LAG).over(Window.orderBy("day")).alias("pred"),
    ).where(F.col("pred").isNotNull())
    err = F.col("cents") - F.col("pred")
    return fc.agg(
        F.count("*").alias("n_days"),
        F.round(
            F.sum(F.abs(err)).cast("double") / F.count("*") / 100.0, 4
        ).alias("mae_dollars"),
        F.round(
            F.sum(F.abs(err)).cast("double") / F.sum("cents").cast("double"),
            6,
        ).alias("wape"),
        F.round(
            F.sum(err).cast("double") / F.sum("cents").cast("double"), 6
        ).alias("bias"),
    )

# ==== from analytics_r3t ===========================================

@register(
    "q_ts_max_drawdown",
    oracle="""
        WITH daily AS (
            SELECT o_orderdate AS day,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) AS cents
            FROM orders GROUP BY o_orderdate
        ),
        cs AS (
            SELECT day,
                   CAST(SUM(cents) OVER w AS BIGINT) AS c
            FROM daily
            WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)
        ),
        cum AS (
            SELECT day, c,
                   CAST(MAX(c) OVER w AS BIGINT) AS peak
            FROM cs
            WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)
        )
        SELECT day AS trough_day,
               ROUND(CAST(peak - c AS DOUBLE) / 100.0, 2) AS drawdown,
               ROUND(CAST(peak AS DOUBLE) / 100.0, 2) AS peak_value,
               ROUND(CAST(c AS DOUBLE) / 100.0, 2) AS trough_value
        FROM cum
        ORDER BY peak - c DESC, day
        LIMIT 1
    """,
    section="TS14",
    doc="Maximum drawdown of the cumulative daily revenue curve: running "
    "sum (exact cents), running peak (cummax of the cumsum), drawdown "
    "= peak − current, argmax with earlier-day tie-break — the "
    "canonical path-dependent risk/regression metric (for a metric "
    "time series: the worst peak-to-trough regression). Pure integer "
    "window algebra until the final dollar formatting, so the argmax "
    "is exactly deterministic. Runs on the |days| spine; the TakeOrdered "
    "argmax never sorts more than the spine.",
)
def q_ts_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.expr(
            "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)"
        ).alias("cents")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cum = daily.select(
        "day",
        F.sum("cents").over(w).alias("c"),
    ).select(
        "day", "c", F.max("c").over(w).alias("peak")
    )
    return (
        cum.orderBy(F.desc(F.col("peak") - F.col("c")), F.asc("day"))
        .limit(1)
        .select(
            F.col("day").alias("trough_day"),
            F.round((F.col("peak") - F.col("c")).cast("double") / 100.0, 2)
            .alias("drawdown"),
            F.round(F.col("peak").cast("double") / 100.0, 2).alias(
                "peak_value"
            ),
            F.round(F.col("c").cast("double") / 100.0, 2).alias(
                "trough_value"
            ),
        )
    )

# ==== from analytics_r3x ===========================================

_TS15_HALF = 14

@register(
    "q_ts_seasonal_strength",
    oracle=f"""
        WITH daily AS (
            SELECT o_orderdate AS day,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev,
                   CAST(date_diff('day', TIMESTAMP '1995-01-02',
                                  o_orderdate) AS BIGINT) % 7 AS dow
            FROM orders GROUP BY o_orderdate
        ),
        tr AS (
            SELECT day, dow, CAST(rev AS DOUBLE) AS v,
                   CAST(SUM(rev) OVER w AS DOUBLE)
                   / CAST(COUNT(*) OVER w AS DOUBLE) AS trend
            FROM daily
            WINDOW w AS (ORDER BY day ROWS BETWEEN {_TS15_HALF} PRECEDING
                         AND {_TS15_HALF} FOLLOWING)
        ),
        det AS (SELECT day, dow, v, trend, v - trend AS d FROM tr),
        seas AS (
            SELECT dow,
                   CAST(SUM(CAST(floor(d * 1e4) AS DECIMAL(38,0)))
                        AS DOUBLE) / 1e4 / COUNT(*) AS s
            FROM det GROUP BY dow
        ),
        comp AS (
            SELECT CAST(floor((det.d - seas.s) / 1000.0) AS BIGINT) AS r_k,
                   CAST(floor(det.d / 1000.0) AS BIGINT) AS dr_k,
                   CAST(floor(det.trend / 1000.0) AS BIGINT) AS t_k,
                   CAST(floor((det.trend + det.d - seas.s) / 1000.0)
                        AS BIGINT) AS tr_k
            FROM det JOIN seas ON seas.dow = det.dow
        ),
        m AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                   CAST(SUM(r_k) AS DOUBLE) AS sr,
                   CAST(SUM(r_k * r_k) AS DOUBLE) AS srr,
                   CAST(SUM(dr_k) AS DOUBLE) AS sd,
                   CAST(SUM(dr_k * dr_k) AS DOUBLE) AS sdd,
                   CAST(SUM(tr_k) AS DOUBLE) AS st,
                   CAST(SUM(tr_k * tr_k) AS DOUBLE) AS stt
            FROM comp
        )
        SELECT ROUND(greatest(0.0,
                   1.0 - (srr / n - (sr / n) * (sr / n))
                         / (sdd / n - (sd / n) * (sd / n))), 6)
                   AS seasonal_strength,
               ROUND(greatest(0.0,
                   1.0 - (srr / n - (sr / n) * (sr / n))
                         / (stt / n - (st / n) * (st / n))), 6)
                   AS trend_strength
        FROM m
    """,
    section="TS15",
    doc="STL-style strength of seasonality and trend over the TS12 "
    "decomposition: seasonal strength = max(0, 1 − Var(remainder)/"
    "Var(detrended)) and trend strength = max(0, 1 − Var(remainder)/"
    "Var(trend + remainder)) — the scalar that says whether the "
    "day-of-week pattern or the trend is signal or noise. Component "
    "values are quantized to whole k$ BEFORE the moment sums, making "
    "every variance moment an exact BIGINT (§5.3 rule 10) and both "
    "ratios single IEEE formulas. Runs on the |days| spine with a "
    "7-row seasonal broadcast.",
)
def q_ts_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    ).withColumn(
        "dow",
        (F.datediff(F.col("day"), F.lit("1995-01-02")).cast("long")) % 7,
    )
    w = Window.orderBy("day").rowsBetween(-_TS15_HALF, _TS15_HALF)
    tr = daily.select(
        "day",
        "dow",
        F.col("rev").cast("double").alias("v"),
        (
            F.sum("rev").over(w).cast("double")
            / F.count("*").over(w).cast("double")
        ).alias("trend"),
    )
    det = tr.select(
        "dow", "trend", (F.col("v") - F.col("trend")).alias("d")
    )
    seas = det.groupBy("dow").agg(
        (
            F.sum(F.floor(F.col("d") * 1e4).cast("decimal(38,0)")).cast(
                "double"
            )
            / 1e4
            / F.count("*")
        ).alias("s")
    )
    comp = det.join(seas, "dow").select(
        F.floor((F.col("d") - F.col("s")) / 1000.0).cast("long").alias("r_k"),
        F.floor(F.col("d") / 1000.0).cast("long").alias("dr_k"),
        F.floor((F.col("trend") + F.col("d") - F.col("s")) / 1000.0)
        .cast("long")
        .alias("tr_k"),
    )
    m = comp.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("r_k").cast("double").alias("sr"),
        F.sum(F.col("r_k") * F.col("r_k")).cast("double").alias("srr"),
        F.sum("dr_k").cast("double").alias("sd"),
        F.sum(F.col("dr_k") * F.col("dr_k")).cast("double").alias("sdd"),
        F.sum("tr_k").cast("double").alias("st"),
        F.sum(F.col("tr_k") * F.col("tr_k")).cast("double").alias("stt"),
    )
    vr = F.col("srr") / F.col("n") - (F.col("sr") / F.col("n")) * (
        F.col("sr") / F.col("n")
    )
    vd = F.col("sdd") / F.col("n") - (F.col("sd") / F.col("n")) * (
        F.col("sd") / F.col("n")
    )
    vt = F.col("stt") / F.col("n") - (F.col("st") / F.col("n")) * (
        F.col("st") / F.col("n")
    )
    return m.select(
        F.round(F.greatest(F.lit(0.0), 1.0 - vr / vd), 6).alias(
            "seasonal_strength"
        ),
        F.round(F.greatest(F.lit(0.0), 1.0 - vr / vt), 6).alias(
            "trend_strength"
        ),
    )

# ==== from analytics_r3z ===========================================

_TS16_HALF = 14

_TS16_K = 5.0  # MAD multiplier

@register(
    "q_ts_anomaly_residual",
    oracle=f"""
        WITH daily AS (
            SELECT o_orderdate AS day,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev,
                   CAST(date_diff('day', TIMESTAMP '1995-01-02',
                                  o_orderdate) AS BIGINT) % 7 AS dow
            FROM orders GROUP BY o_orderdate
        ),
        tr AS (
            SELECT day, dow, CAST(rev AS DOUBLE) AS v,
                   CAST(SUM(rev) OVER w AS DOUBLE)
                   / CAST(COUNT(*) OVER w AS DOUBLE) AS trend
            FROM daily
            WINDOW w AS (ORDER BY day ROWS BETWEEN {_TS16_HALF} PRECEDING
                         AND {_TS16_HALF} FOLLOWING)
        ),
        det AS (SELECT day, dow, v - trend AS d FROM tr),
        seas AS (
            SELECT dow,
                   CAST(SUM(CAST(floor(d * 1e4) AS DECIMAL(38,0)))
                        AS DOUBLE) / 1e4 / COUNT(*) AS s
            FROM det GROUP BY dow
        ),
        res AS (
            SELECT det.day,
                   CAST(floor(abs(det.d - seas.s)) AS BIGINT) AS ar
            FROM det JOIN seas ON seas.dow = det.dow
        ),
        mad AS (
            SELECT ar AS m FROM (
                SELECT ar, row_number() OVER (ORDER BY ar, day) AS rn,
                       COUNT(*) OVER () AS n
                FROM res
            ) WHERE rn = CAST(ceil(n * 0.5) AS BIGINT)
        )
        SELECT r.day, r.ar AS abs_residual,
               m.m AS mad,
               r.ar > {_TS16_K} * m.m AS is_anomaly
        FROM res r CROSS JOIN mad m
    """,
    section="TS16",
    doc="Decomposition-residual anomaly detection: TS12's residuals "
    "(daily revenue minus centered-MA trend minus day-of-week "
    "seasonal), floor-quantized to whole dollars, scored against a "
    f"{_TS16_K}× nearest-rank median-absolute-residual threshold — the "
    "detector that ignores trend and weekday shape BY CONSTRUCTION, "
    "where raw z-scores (TS4) fire on every Monday. Pure integer "
    "threshold logic after the decomposition (nearest-rank median, "
    "W23's device), so the flag comparison is exact. Runs on the "
    "|days| spine; the 1-row MAD broadcasts.",
)
def q_ts_anomaly_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    ).withColumn(
        "dow",
        (F.datediff(F.col("day"), F.lit("1995-01-02")).cast("long")) % 7,
    )
    w = Window.orderBy("day").rowsBetween(-_TS16_HALF, _TS16_HALF)
    tr = daily.select(
        "day",
        "dow",
        (
            F.col("rev").cast("double")
            - F.sum("rev").over(w).cast("double")
            / F.count("*").over(w).cast("double")
        ).alias("d"),
    )
    seas = tr.groupBy("dow").agg(
        (
            F.sum(F.floor(F.col("d") * 1e4).cast("decimal(38,0)")).cast(
                "double"
            )
            / 1e4
            / F.count("*")
        ).alias("s")
    )
    res = tr.join(seas, "dow").select(
        "day",
        F.floor(F.abs(F.col("d") - F.col("s"))).cast("long").alias("ar"),
    )
    rn = F.row_number().over(Window.orderBy("ar", "day"))
    n = F.count("*").over(Window.partitionBy())
    mad = (
        res.select("ar", rn.alias("rn"), n.alias("n"))
        .where(F.col("rn") == F.ceil(F.col("n") * 0.5).cast("long"))
        .select(F.col("ar").alias("m"))
    )
    return res.crossJoin(F.broadcast(mad)).select(
        "day",
        F.col("ar").alias("abs_residual"),
        F.col("m").alias("mad"),
        (F.col("ar") > _TS16_K * F.col("m")).alias("is_anomaly"),
    )

# ==== from analytics_r4c ===========================================

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

# ==== from analytics_r4g ===========================================

@register(
    "q_ts_activity_heatmap",
    oracle="""
        WITH c AS (
            SELECT CAST(date_diff('day', TIMESTAMP '1995-01-02',
                                  date_trunc('day', ts)) AS BIGINT) % 7
                       AS dow,
                   CAST(date_part('hour', ts) AS INT) AS hour,
                   value
            FROM events
        )
        SELECT dow, hour,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(CAST(COUNT(*) AS DOUBLE)
                     / CAST(SUM(COUNT(*)) OVER () AS DOUBLE), 6)
                   AS share
        FROM c
        GROUP BY dow, hour
    """,
    section="TS18",
    doc="Day-of-week × hour activity heatmap with traffic shares — the "
    "load-shaping profile behind capacity scheduling, maintenance "
    "windows, and batch-slot placement. Day-of-week is datediff-mod-7 "
    "from a fixed Monday on the TRUNCATED day (the F5 numbering trap, "
    "avoided the same way as TS12); hour is a direct extraction. "
    "Collapses to ≤168 cells in one reduction; the share window runs "
    "over the collapsed cells.",
)
def q_ts_activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.select(
        (
            F.datediff(
                F.date_trunc("day", "ts"), F.lit("1995-01-02")
            ).cast("long")
            % 7
        ).alias("dow"),
        F.hour("ts").cast("int").alias("hour"),
    )
    g = c.groupBy("dow", "hour").agg(F.count("*").alias("n_events"))
    w = Window.partitionBy()
    return g.select(
        "dow",
        "hour",
        "n_events",
        F.round(
            F.col("n_events").cast("double")
            / F.sum("n_events").over(w).cast("double"),
            6,
        ).alias("share"),
    )

# ==== from analytics_r4k ===========================================

# dow (0=Mon..6=Sun) -> calendar days until the 5th business day
_BD5 = [(0, 7), (1, 7), (2, 7), (3, 7), (4, 7), (5, 6), (6, 5)]

@register(
    "q_ts_business_days",
    oracle=f"""
        WITH m AS (
            SELECT * FROM (VALUES
                {', '.join(f'({d}, {c})' for d, c in _BD5)}
            ) t(dow, cal_days)
        ),
        o AS (
            SELECT o_orderkey,
                   CAST(date_diff('day', TIMESTAMP '1995-01-02',
                                  o_orderdate) AS BIGINT) % 7 AS dow,
                   o_orderdate
            FROM orders
        )
        SELECT o.o_orderkey,
               CAST(o.dow AS INT) AS order_dow,
               CAST(o.o_orderdate + to_days(m.cal_days) AS DATE)
                   AS due_date,
               o.dow >= 5 AS weekend_start
        FROM o JOIN m ON m.dow = o.dow
    """,
    section="TS19",
    doc="Business-day arithmetic as POLICY DATA: the +5-business-day "
    "deadline per order via a 7-row (day-of-week → calendar days) "
    "mapping table — a weekday start lands on the same weekday next "
    "week (7 calendar days), Saturday needs 6, Sunday 5 — joined "
    "broadcast-side, with the weekend-start flag. Day-of-week is "
    "datediff-mod-7 from a fixed Monday (the F5 numbering trap). "
    "Policy-as-data is the point: holiday calendars append rows "
    "(date-specific overrides) and regional calendars key the table "
    "by region — nested CASE logic can do neither. Map-only plus one "
    "7-row broadcast.",
)
def q_ts_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    m = orders.sparkSession.createDataFrame(_BD5, "dow long, cal_days int")
    o = orders.select(
        "o_orderkey",
        (
            F.datediff(F.col("o_orderdate"), F.lit("1995-01-02")).cast("long")
            % 7
        ).alias("dow"),
        "o_orderdate",
    )
    return o.join(F.broadcast(m), "dow").select(
        "o_orderkey",
        F.col("dow").cast("int").alias("order_dow"),
        F.expr("CAST(o_orderdate + make_dt_interval(cal_days) AS DATE)")
        .alias("due_date"),
        (F.col("dow") >= 5).alias("weekend_start"),
    )

# ==== from analytics_r4o ===========================================

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
    # Scale note (r6): the sweep-line level is a distributed prefix sum;
    # lead(t) becomes an idx -> idx+1 self-join on the dense global index.
    from ai_to_cvent_etl_spark.operators.ranking import global_cumulative

    cum = global_cumulative(
        b,
        ["t", "delta", "event_id"],
        {"idx": F.lit(1), "level": F.col("delta")},
    ).localCheckpoint(eager=False)
    sweep = (
        cum.join(
            cum.select(
                (F.col("idx") - 1).alias("idx"), F.col("t").alias("t_next")
            ),
            "idx",
            "left",
        )
        .select("t", "level", "t_next")
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

# ==== from analytics_r4q ===========================================

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


# ==== forty-eighth wave (r4) ==================================================

_HURST_NS = (8, 16, 32)  # R/S window sizes (hours); 720 hourly buckets total


@register(
    "q_ts_hurst",
    oracle="""
        WITH hours AS (
            SELECT CAST(date_diff('hour', TIMESTAMP '2024-01-01',
                                  date_trunc('hour', ts)) AS BIGINT) AS h,
                   CAST(SUM(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT)
                       AS x
            FROM events GROUP BY 1
        ),
        e AS (
            SELECT n.n, h // n.n AS blk, h, x
            FROM hours, (VALUES (8), (16), (32)) AS n(n)
        ),
        rowed AS (
            SELECT n, blk, x,
                   CAST(ROW_NUMBER() OVER win AS BIGINT) AS k,
                   CAST(SUM(x) OVER (PARTITION BY n, blk ORDER BY h
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS prefix,
                   CAST(SUM(x) OVER (PARTITION BY n, blk) AS BIGINT) AS total
            FROM e
            WINDOW win AS (PARTITION BY n, blk ORDER BY h)
        ),
        blocks AS (
            SELECT n, blk,
                   CAST(COUNT(*) AS BIGINT) AS cnt,
                   MAX(n * prefix - k * total)
                       - MIN(n * prefix - k * total) AS rn,
                   n * CAST(SUM(x * x) AS BIGINT)
                       - MAX(total) * MAX(total) AS varnum
            FROM rowed GROUP BY n, blk
        ),
        rs AS (
            SELECT n,
                   CAST(COUNT(*) AS BIGINT) AS n_blocks,
                   ROUND(SUM(CAST(FLOOR(1e6 * rn / sqrt(varnum)) AS BIGINT))
                         / (COUNT(*) * 1e6), 4) AS rs_mean
            FROM blocks WHERE cnt = n AND varnum > 0
            GROUP BY n
        )
        SELECT MAX(CASE WHEN n = 8 THEN n_blocks END) AS blocks8,
               MAX(CASE WHEN n = 16 THEN n_blocks END) AS blocks16,
               MAX(CASE WHEN n = 32 THEN n_blocks END) AS blocks32,
               MAX(CASE WHEN n = 8 THEN rs_mean END) AS rs8,
               MAX(CASE WHEN n = 16 THEN rs_mean END) AS rs16,
               MAX(CASE WHEN n = 32 THEN rs_mean END) AS rs32,
               ROUND((ln(MAX(CASE WHEN n = 32 THEN rs_mean END))
                      - ln(MAX(CASE WHEN n = 8 THEN rs_mean END)))
                     / (2 * ln(2)), 4) AS hurst
        FROM rs
    """,
    section="TS22",
    doc="Hurst exponent of the hourly event-value series by rescaled-range "
    "(R/S) analysis: for window sizes n in {8,16,32} hours, complete "
    "blocks of n present hours yield R = max-min of the cumulative "
    "deviate series and S = population std; H = the OLS slope of "
    "ln(mean R/S) on ln(n) (evenly log-spaced 3-point OLS collapses to "
    "(ln rs32 - ln rs8)/(2 ln 2)). H~0.5 = random walk, >0.5 = "
    "long-range persistence — the memory diagnostic for load/telemetry "
    "series. Determinism by the integer-moments device (TS11/A45): "
    "hourly sums are exact cents (dec2), the cumulative deviate is "
    "scaled by n so every block ingredient is an exact BIGINT "
    "(n*prefix_k - k*total; n*Σx² - total²), leaving ONE sqrt+division "
    "per block; per-block R/S is floor-quantized at 1e6 and mean'd as "
    "exact integers (TS21 device, rule-10 flake budget documented); "
    "the final slope uses the 4dp-ROUNDED means so both engines feed "
    "ln() bit-identical inputs. Gap hours are absent samples — only "
    "all-present blocks enter (cnt = n). Scale: one keyed agg to "
    "~hours rows, then windows partitioned by (n, blk) — thousands of "
    "small independent groups, no global sort, no skew; block count "
    "grows linearly with the time range, never with event volume.",
)
def q_ts_hurst(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hours = (
        ev.groupBy(
            F.expr(
                "cast(timestampdiff(HOUR, TIMESTAMP '2024-01-01 00:00:00', "
                "date_trunc('hour', ts)) as bigint)"
            ).alias("h")
        )
        .agg(
            (F.sum(F.col("value").cast(DecimalType(12, 2))) * 100)
            .cast("bigint")
            .alias("x")
        )
    )
    e = hours.select(
        F.explode(
            F.array(*[F.lit(n) for n in _HURST_NS])
        ).alias("n"),
        "h",
        "x",
    ).withColumn("blk", F.expr("h div n"))
    win = Window.partitionBy("n", "blk").orderBy("h")
    full = Window.partitionBy("n", "blk")
    rowed = (
        e.withColumn("k", F.row_number().over(win).cast("bigint"))
        .withColumn(
            "prefix",
            F.sum("x").over(win.rowsBetween(Window.unboundedPreceding, 0))
            .cast("bigint"),
        )
        .withColumn("total", F.sum("x").over(full).cast("bigint"))
        .withColumn(
            "ncd", F.col("n") * F.col("prefix") - F.col("k") * F.col("total")
        )
    )
    blocks = rowed.groupBy("n", "blk").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        (F.max("ncd") - F.min("ncd")).alias("rn"),
        (
            F.first("n") * F.sum(F.col("x") * F.col("x")).cast("bigint")
            - F.max("total") * F.max("total")
        ).alias("varnum"),
    )
    rs = (
        blocks.filter((F.col("cnt") == F.col("n")) & (F.col("varnum") > 0))
        .groupBy("n")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
            F.round(
                F.sum(
                    F.floor(1e6 * F.col("rn") / F.sqrt(F.col("varnum")))
                    .cast("bigint")
                )
                / (F.count(F.lit(1)) * 1e6),
                4,
            ).alias("rs_mean"),
        )
    )
    pick = lambda n, c: F.max(F.when(F.col("n") == n, F.col(c)))  # noqa: E731
    return rs.agg(
        pick(8, "n_blocks").alias("blocks8"),
        pick(16, "n_blocks").alias("blocks16"),
        pick(32, "n_blocks").alias("blocks32"),
        pick(8, "rs_mean").alias("rs8"),
        pick(16, "rs_mean").alias("rs16"),
        pick(32, "rs_mean").alias("rs32"),
        F.round(
            (F.log(pick(32, "rs_mean")) - F.log(pick(8, "rs_mean")))
            / (2 * F.log(F.lit(2.0))),
            4,
        ).alias("hurst"),
    )


@register(
    "q_ts_granger_lite",
    oracle="""
        WITH daily AS (
            SELECT event_type,
                   CAST(date_diff('day', DATE '2024-01-01',
                                  CAST(date_trunc('day', ts) AS DATE))
                        AS BIGINT) AS d,
                   CAST(SUM(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT)
                       AS v
            FROM events WHERE event_type IN ('purchase', 'click')
            GROUP BY 1, 2
        ),
        pairs AS (
            SELECT yt.v AS y, yl.v AS yl, xl.v AS xl
            FROM (SELECT d, v FROM daily WHERE event_type = 'purchase') yt
            JOIN (SELECT d, v FROM daily WHERE event_type = 'purchase') yl
              ON yl.d = yt.d - 1
            JOIN (SELECT d, v FROM daily WHERE event_type = 'click') xl
              ON xl.d = yt.d - 1
        ),
        m AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(yl) AS BIGINT) AS s1,
                   CAST(SUM(xl) AS BIGINT) AS s2,
                   CAST(SUM(y * y) AS BIGINT) AS syy,
                   CAST(SUM(yl * yl) AS BIGINT) AS s11,
                   CAST(SUM(xl * xl) AS BIGINT) AS s22,
                   CAST(SUM(yl * xl) AS BIGINT) AS s12,
                   CAST(SUM(y * yl) AS BIGINT) AS s1y,
                   CAST(SUM(y * xl) AS BIGINT) AS s2y
            FROM pairs
        ),
        c AS (
            SELECT n,
                   n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy AS cyy,
                   n * CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 AS c11,
                   n * CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 AS c22,
                   n * CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * s2 AS c12,
                   n * CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * sy AS c1y,
                   n * CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * sy AS c2y
            FROM m
        ),
        f AS (
            SELECT n, cyy,
                   cyy - c1y * c1y / c11 AS sse1,
                   cyy - ((c1y * c22 - c2y * c12) * c1y
                          + (c2y * c11 - c1y * c12) * c2y)
                         / (c11 * c22 - c12 * c12) AS sse2,
                   (c1y * c22 - c2y * c12) / (c11 * c22 - c12 * c12) AS b1,
                   (c2y * c11 - c1y * c12) / (c11 * c22 - c12 * c12) AS b2
            FROM c
        )
        SELECT n AS n_days,
               ROUND(b1, 6) AS beta_ylag,
               ROUND(b2, 6) AS beta_xlag,
               ROUND(1 - sse1 / cyy, 6) AS r2_ar,
               ROUND(1 - sse2 / cyy, 6) AS r2_full,
               ROUND((sse1 - sse2) / (sse2 / (n - 3)), 4) AS f_stat,
               (sse1 - sse2) / (sse2 / (n - 3)) > 4.21 AS x_helps
        FROM f
    """,
    section="TS23",
    doc="Granger-style lagged-regression screen: does yesterday's click "
    "volume improve today's purchase-volume prediction beyond "
    "yesterday's purchases? Compares SSE of y_t ~ y_{t-1} vs "
    "y_t ~ y_{t-1} + x_{t-1} via the 2-predictor normal equations in "
    "closed form; reports both R² and the F(1, n-3) statistic "
    "(x_helps thresholds at the 5% critical value 4.21 for n=30). "
    "The lag alignment is an inner join on consecutive day indexes, so "
    "gap days drop out exactly the same way on both engines. "
    "Determinism (TS11/A45 integer-moments device): daily sums are "
    "exact cents; ALL ten raw moments are exact BIGINTs (width holds "
    "to ~1e8 cents/day — rescale units beyond); the centered-moment "
    "combinations run in DOUBLE on the exact BIGINT moments (int64 "
    "would overflow n*Σy² at sf0.1 widths; BIGINT→double conversion "
    "is identical IEEE rounding on both engines, so the fixed formula "
    "stays bit-deterministic), ROUND'ed at the end. Scale: one keyed "
    "agg to ~days rows, a 3-way join on day indexes (tiny), one "
    "10-moment reduction — collapses before any wide stage; moment "
    "accumulation is map-side combinable at any volume.",
)
def q_ts_granger_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type").isin("purchase", "click"))
        .groupBy(
            "event_type",
            F.expr(
                "cast(datediff(cast(date_trunc('day', ts) as date), "
                "date'2024-01-01') as bigint)"
            ).alias("d"),
        )
        .agg(
            (F.sum(F.col("value").cast(DecimalType(12, 2))) * 100)
            .cast("bigint")
            .alias("v")
        )
    )
    yt = daily.filter(F.col("event_type") == "purchase").select(
        F.col("d").alias("dt"), F.col("v").alias("y")
    )
    yl = daily.filter(F.col("event_type") == "purchase").select(
        F.col("d").alias("dl"), F.col("v").alias("ylag")
    )
    xl = daily.filter(F.col("event_type") == "click").select(
        F.col("d").alias("dx"), F.col("v").alias("xlag")
    )
    pairs = yt.join(yl, F.col("dl") == F.col("dt") - 1).join(
        xl, F.col("dx") == F.col("dt") - 1
    )
    m = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum("ylag").cast("bigint").alias("s1"),
        F.sum("xlag").cast("bigint").alias("s2"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("ylag") * F.col("ylag")).cast("bigint").alias("s11"),
        F.sum(F.col("xlag") * F.col("xlag")).cast("bigint").alias("s22"),
        F.sum(F.col("ylag") * F.col("xlag")).cast("bigint").alias("s12"),
        F.sum(F.col("y") * F.col("ylag")).cast("bigint").alias("s1y"),
        F.sum(F.col("y") * F.col("xlag")).cast("bigint").alias("s2y"),
    )
    c = m.select(
        "n",
        (F.col("n") * F.col("syy").cast("double")
         - F.col("sy").cast("double") * F.col("sy")).alias("cyy"),
        (F.col("n") * F.col("s11").cast("double")
         - F.col("s1").cast("double") * F.col("s1")).alias("c11"),
        (F.col("n") * F.col("s22").cast("double")
         - F.col("s2").cast("double") * F.col("s2")).alias("c22"),
        (F.col("n") * F.col("s12").cast("double")
         - F.col("s1").cast("double") * F.col("s2")).alias("c12"),
        (F.col("n") * F.col("s1y").cast("double")
         - F.col("s1").cast("double") * F.col("sy")).alias("c1y"),
        (F.col("n") * F.col("s2y").cast("double")
         - F.col("s2").cast("double") * F.col("sy")).alias("c2y"),
    )
    det = F.col("c11") * F.col("c22") - F.col("c12") * F.col("c12")
    b1 = (F.col("c1y") * F.col("c22") - F.col("c2y") * F.col("c12")) / det
    b2 = (F.col("c2y") * F.col("c11") - F.col("c1y") * F.col("c12")) / det
    sse1 = F.col("cyy") - F.col("c1y") * F.col("c1y") / F.col("c11")
    sse2 = F.col("cyy") - (
        (F.col("c1y") * F.col("c22") - F.col("c2y") * F.col("c12")) * F.col("c1y")
        + (F.col("c2y") * F.col("c11") - F.col("c1y") * F.col("c12")) * F.col("c2y")
    ) / det
    fstat = (sse1 - sse2) / (sse2 / (F.col("n") - 3))
    return c.select(
        F.col("n").alias("n_days"),
        F.round(b1, 6).alias("beta_ylag"),
        F.round(b2, 6).alias("beta_xlag"),
        F.round(1 - sse1 / F.col("cyy"), 6).alias("r2_ar"),
        F.round(1 - sse2 / F.col("cyy"), 6).alias("r2_full"),
        F.round(fstat, 4).alias("f_stat"),
        (fstat > 4.21).alias("x_helps"),
    )


_HOLT_A = 0.3  # level smoothing
_HOLT_B = 0.1  # trend smoothing


@register(
    "q_ts_holt_forecast",
    oracle=f"""
        WITH daily AS (
            SELECT event_type,
                   CAST(date_diff('day', DATE '2024-01-01',
                                  CAST(date_trunc('day', ts) AS DATE))
                        AS BIGINT) AS d,
                   CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) * 100
                             AS BIGINT) AS DOUBLE) AS v
            FROM events GROUP BY 1, 2
        ),
        series AS (
            SELECT event_type,
                   list_transform(
                       list_sort(list(struct_pack(d := d, v := v))),
                       x -> x.v) AS vals
            FROM daily GROUP BY event_type
        ),
        folded AS (
            SELECT event_type, len(vals) AS n_days,
                   list_reduce(
                       list_transform(vals,
                                      v -> [v, CAST('nan' AS DOUBLE)]),
                       (acc, x) -> CASE WHEN isnan(acc[2])
                           THEN [x[1], x[1] - acc[1]]
                           ELSE [{_HOLT_A} * x[1]
                                 + {1 - _HOLT_A} * (acc[1] + acc[2]),
                                 {_HOLT_B} * ({_HOLT_A} * x[1]
                                 + {1 - _HOLT_A} * (acc[1] + acc[2])
                                 - acc[1]) + {1 - _HOLT_B} * acc[2]]
                           END) AS st
            FROM series
        )
        SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
               ROUND(st[1], 4) AS level_cents,
               ROUND(st[2], 4) AS trend_cents,
               ROUND(st[1] + 1 * st[2], 4) AS forecast_1d,
               ROUND(st[1] + 2 * st[2], 4) AS forecast_2d,
               ROUND(st[1] + 3 * st[2], 4) AS forecast_3d
        FROM folded
    """,
    section="TS24",
    doc=f"Holt linear-trend exponential smoothing (alpha={_HOLT_A}, "
    f"beta={_HOLT_B}) per event type with 1/2/3-day-ahead forecasts — "
    "the recursive double-smoothing TS13's forecast-eval consumes, "
    "expressed WITHOUT recursion machinery: the per-series recurrence "
    "is a ROW-LOCAL left fold over the day-sorted value array with a "
    "2-element ARRAY accumulator [level, trend] (trend=NaN marks the "
    "un-initialized state; the first merge sets l=y2, b=y2-y1). "
    "Spark's aggregate() folds from an explicit zero over the tail; "
    "DuckDB's list_reduce seeds from the first element — identical "
    "IEEE operation sequence (hash-pinned). DISCOVERY (§5.3): DuckDB "
    "1.0.0's list_reduce updates a STRUCT accumulator field-by-field "
    "IN PLACE, so a later field's expression reads the NEW value of "
    "an earlier field (probed: the trend expression saw the updated "
    "level) — the array accumulator sidesteps the hazard; never use "
    "struct accumulators with cross-referencing fields in the oracle "
    "dialect. Daily inputs are exact cents. Scale: one keyed agg to "
    "~days rows, one sorted-collect per series (arrays bounded by the "
    "time range, not event volume), O(days) row-local fold, no "
    "shuffle beyond the two keyed aggs.",
)
def q_ts_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type",
            F.expr(
                "cast(datediff(cast(date_trunc('day', ts) as date), "
                "date'2024-01-01') as bigint)"
            ).alias("d"),
        )
        .agg(
            F.expr(
                "cast(cast(sum(cast(value as decimal(12,2))) * 100 "
                "as bigint) as double)"
            ).alias("v")
        )
    )
    series = daily.groupBy("event_type").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(d, v))), x -> x.v)"
        ).alias("vals")
    )
    a, one_a = _HOLT_A, 1 - _HOLT_A
    bb, one_b = _HOLT_B, 1 - _HOLT_B
    fold = (
        "aggregate("
        "  slice(vals, 2, size(vals) - 1),"
        "  array(vals[0], cast('nan' as double)),"
        "  (acc, x) -> CASE WHEN isnan(acc[1])"
        "    THEN array(x, x - acc[0])"
        f"   ELSE array({a} * x + {one_a} * (acc[0] + acc[1]),"
        f"              {bb} * ({a} * x + {one_a} * (acc[0] + acc[1])"
        f"              - acc[0]) + {one_b} * acc[1])"
        "    END)"
    )
    folded = series.select(
        "event_type",
        F.size("vals").cast("bigint").alias("n_days"),
        F.expr(fold).alias("st"),
    )
    return folded.select(
        "event_type",
        "n_days",
        F.round(F.expr("st[0]"), 4).alias("level_cents"),
        F.round(F.expr("st[1]"), 4).alias("trend_cents"),
        F.round(F.expr("st[0] + 1 * st[1]"), 4).alias("forecast_1d"),
        F.round(F.expr("st[0] + 2 * st[1]"), 4).alias("forecast_2d"),
        F.round(F.expr("st[0] + 3 * st[1]"), 4).alias("forecast_3d"),
    )


@register(
    "q_ts_sen_slope",
    oracle="""
        WITH daily AS (
            SELECT CAST(date_diff('day', DATE '2024-01-01',
                                  CAST(date_trunc('day', ts) AS DATE))
                        AS BIGINT) AS d,
                   CAST(SUM(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT)
                       AS x
            FROM events GROUP BY 1
        ),
        slopes AS (
            SELECT (b.x - a.x) / (1.0 * (b.d - a.d)) AS s
            FROM daily a JOIN daily b ON b.d > a.d
        )
        SELECT CAST((SELECT COUNT(*) FROM daily) AS BIGINT) AS n_days,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               ROUND(median(s), 4) AS sen_slope_cents_per_day,
               ROUND(MIN(s), 4) AS slope_min,
               ROUND(MAX(s), 4) AS slope_max
        FROM slopes
    """,
    section="TS25",
    doc="Sen's slope estimator on the daily revenue series: the MEDIAN of "
    "all pairwise slopes (x_j - x_i)/(j - i) — the robust trend "
    "magnitude that pairs with TS14's Mann-Kendall direction test "
    "(MK says IS there a monotone trend; Sen says HOW STEEP, immune "
    "to the outlier days that wreck an OLS slope). Each pairwise "
    "slope is one division of exact integers (cents, day indexes); "
    "the median sorts identical doubles on both engines and the "
    "even-count interpolation is a single identical IEEE average. "
    "Scale: pairwise over DAYS, not rows — the O(T²) pair space is "
    "bounded by the time range (30 days = 435 pairs; ten years of "
    "daily data = 6.6M pairs, still trivial) after the one "
    "map-side-combinable daily reduction; never O(rows²).",
)
def q_ts_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            F.expr(
                "cast(datediff(cast(date_trunc('day', ts) as date), "
                "date'2024-01-01') as bigint)"
            ).alias("d")
        )
        .agg(
            (F.sum(F.col("value").cast(DecimalType(12, 2))) * 100)
            .cast("bigint")
            .alias("x")
        )
    )
    a = daily.select(F.col("d").alias("da"), F.col("x").alias("xa"))
    b = daily.select(F.col("d").alias("db"), F.col("x").alias("xb"))
    slopes = a.join(b, F.col("db") > F.col("da")).select(
        ((F.col("xb") - F.col("xa")) / (1.0 * (F.col("db") - F.col("da")))).alias(
            "s"
        )
    )
    nd = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    return (
        slopes.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.round(F.expr("percentile(s, 0.5)"), 4).alias(
                "sen_slope_cents_per_day"
            ),
            F.round(F.min("s"), 4).alias("slope_min"),
            F.round(F.max("s"), 4).alias("slope_max"),
        )
        .crossJoin(F.broadcast(nd))
        .select(
            "n_days", "n_pairs", "sen_slope_cents_per_day",
            "slope_min", "slope_max",
        )
    )


@register(
    "q_ts_spc_rules",
    oracle="""
        WITH daily AS (
            SELECT CAST(date_diff('day', DATE '2024-01-01',
                                  CAST(date_trunc('day', ts) AS DATE))
                        AS BIGINT) AS d,
                   CAST(SUM(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT)
                       AS x
            FROM events GROUP BY 1
        ),
        m AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(x * x) AS BIGINT) AS sxx
            FROM daily
        ),
        z AS (
            SELECT d, x,
                   (x - sx / (1.0 * n))
                   / sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                          / (1.0 * n * n)) AS zs
            FROM daily CROSS JOIN m
        ),
        f AS (
            SELECT d, x, zs,
                   CAST(FLOOR(zs * 10000) AS BIGINT) AS zq,
                   CASE WHEN zs > 2 THEN 1 ELSE 0 END AS hi2,
                   CASE WHEN zs < -2 THEN 1 ELSE 0 END AS lo2,
                   CASE WHEN zs > 0 THEN 1 ELSE 0 END AS above
            FROM z
        ),
        rules AS (
            SELECT d, x, zq,
                   abs(zq) > 30000 AS rule1_beyond_3s,
                   SUM(hi2) OVER w3 >= 2 OR SUM(lo2) OVER w3 >= 2
                       AS rule2_two_of_three_2s,
                   SUM(above) OVER w8 = 8 OR SUM(above) OVER w8 = 0
                       AS rule3_eight_one_side
            FROM f
            WINDOW w3 AS (ORDER BY d ROWS BETWEEN 2 PRECEDING
                          AND CURRENT ROW),
                   w8 AS (ORDER BY d ROWS BETWEEN 7 PRECEDING
                          AND CURRENT ROW)
        )
        SELECT d AS day_index, x AS revenue_cents,
               ROUND(zq / 10000.0, 4) AS z_score,
               rule1_beyond_3s, rule2_two_of_three_2s, rule3_eight_one_side,
               rule1_beyond_3s OR rule2_two_of_three_2s
                   OR rule3_eight_one_side AS out_of_control
        FROM rules
    """,
    section="TS26",
    doc="Western Electric control-chart rules over the daily revenue "
    "series: rule 1 (one point beyond 3 sigma), rule 2 (two of three "
    "consecutive beyond 2 sigma, same side), rule 3 (eight consecutive "
    "on one side of center) — the SPC rule set that catches drifts and "
    "shifts a plain threshold (TS4's z-score) misses, emitting the "
    "full annotated chart (every day with its fired-rule flags — the "
    "A/A fixture fires none at small SFs, which is itself the null "
    "calibration). Center/sigma from "
    "exact BIGINT moments (population sigma, DOUBLE combination per "
    "the TS23 width rule); the rule-1 comparison runs on the 1e4-"
    "QUANTIZED z (integer compare — a 1-ulp sigma difference cannot "
    "flip it except exactly at a quantum boundary, the documented "
    "rule-10 budget); rules 2/3 count exact integer flags over "
    "3/8-row windows. Scale: one moment reduction + windows over "
    "DAYS (time-range bounded); the windows are unpartitioned but "
    "over ~30 rows — at a 10-year range still only 3650 rows on one "
    "task, microseconds; per-series partitioning is the obvious "
    "extension when charting thousands of metrics.",
)
def q_ts_spc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            F.expr(
                "cast(datediff(cast(date_trunc('day', ts) as date), "
                "date'2024-01-01') as bigint)"
            ).alias("d")
        )
        .agg(
            (F.sum(F.col("value").cast(DecimalType(12, 2))) * 100)
            .cast("bigint")
            .alias("x")
        )
    )
    m = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    z = daily.crossJoin(F.broadcast(m)).select(
        "d",
        "x",
        (
            (F.col("x") - F.col("sx") / (1.0 * F.col("n")))
            / F.sqrt(
                (
                    F.col("n") * F.col("sxx").cast("double")
                    - F.col("sx").cast("double") * F.col("sx")
                )
                / (1.0 * F.col("n") * F.col("n"))
            )
        ).alias("zs"),
    )
    f = z.select(
        "d",
        "x",
        F.floor(F.col("zs") * 10000).cast("bigint").alias("zq"),
        F.when(F.col("zs") > 2, 1).otherwise(0).alias("hi2"),
        F.when(F.col("zs") < -2, 1).otherwise(0).alias("lo2"),
        F.when(F.col("zs") > 0, 1).otherwise(0).alias("above"),
    )
    w3 = Window.orderBy("d").rowsBetween(-2, 0)
    w8 = Window.orderBy("d").rowsBetween(-7, 0)
    rules = f.select(
        "d",
        "x",
        "zq",
        (F.abs(F.col("zq")) > 30000).alias("rule1_beyond_3s"),
        ((F.sum("hi2").over(w3) >= 2) | (F.sum("lo2").over(w3) >= 2)).alias(
            "rule2_two_of_three_2s"
        ),
        ((F.sum("above").over(w8) == 8) | (F.sum("above").over(w8) == 0)).alias(
            "rule3_eight_one_side"
        ),
    )
    return rules.select(
        F.col("d").alias("day_index"),
        F.col("x").alias("revenue_cents"),
        F.round(F.col("zq") / 10000.0, 4).alias("z_score"),
        "rule1_beyond_3s",
        "rule2_two_of_three_2s",
        "rule3_eight_one_side",
        (
            F.col("rule1_beyond_3s")
            | F.col("rule2_two_of_three_2s")
            | F.col("rule3_eight_one_side")
        ).alias("out_of_control"),
    )


_PE_MIN_WINDOWS = 10


@register(
    "q_ts_permutation_entropy",
    oracle=f"""
        WITH q AS (
            SELECT user_id,
                   CAST(floor(value * 1e4) AS BIGINT) AS x1,
                   lead(CAST(floor(value * 1e4) AS BIGINT), 1) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS x2,
                   lead(CAST(floor(value * 1e4) AS BIGINT), 2) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS x3
            FROM events
        ),
        pat AS (
            SELECT user_id,
                   (CAST(sign(x2 - x1) AS BIGINT) + 1) * 9
                   + (CAST(sign(x3 - x2) AS BIGINT) + 1) * 3
                   + (CAST(sign(x3 - x1) AS BIGINT) + 1) AS pattern,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM q WHERE x3 IS NOT NULL
            GROUP BY user_id, pattern
        ),
        tot AS (
            SELECT user_id, CAST(SUM(n) AS BIGINT) AS n_windows,
                   CAST(COUNT(*) AS BIGINT) AS n_patterns
            FROM pat GROUP BY user_id
        )
        SELECT p.user_id, t.n_windows, t.n_patterns,
               ROUND(CAST(SUM(CAST(floor(
                   -(CAST(p.n AS DOUBLE) / t.n_windows)
                   * ln(CAST(p.n AS DOUBLE) / t.n_windows) * 1e12)
                   AS DECIMAL(38,0))) AS DOUBLE) / 1e12, 6)
                   AS perm_entropy_nats
        FROM pat p JOIN tot t ON t.user_id = p.user_id
        WHERE t.n_windows >= {_PE_MIN_WINDOWS}
        GROUP BY p.user_id, t.n_windows, t.n_patterns
    """,
    section="TS27",
    doc="Per-user permutation entropy (order-3 ordinal patterns): slide "
    "a 3-event window over each user's value sequence, encode the "
    "ordinal pattern as an exact integer over the three pairwise sign "
    "comparisons (27 classes incl. tie patterns — ties get their own "
    "classes instead of an arbitrary tie-break, keeping the encoding "
    "deterministic), then Shannon entropy (nats) of the per-user "
    "pattern distribution. The complexity measure of Bandt-Pompe: "
    "regular/periodic series score near 0, i.i.d. noise near "
    "ln(6) — complements TS6 autocorrelation (linear memory) with a "
    "nonlinearity-robust rank-based signal. Values quantized "
    "floor(v*1e4) (TS6 device); entropy terms quantized floor(x*1e12) "
    "before the exact per-user DECIMAL sum (L18 device) — no float "
    "aggregation-order nondeterminism. Scale: one per-user window "
    "(two leads share one sort), one (user,pattern) keyed count — "
    "the pattern table is at most 27 rows/user; linear, "
    "map-side-combinable.",
)
def q_ts_permutation_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    q = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.expr("cast(floor(value * 1e4) as bigint)").alias("x1"),
    ).select(
        "user_id",
        "x1",
        F.lead("x1", 1).over(w).alias("x2"),
        F.lead("x1", 2).over(w).alias("x3"),
    )
    pat = (
        q.where(F.col("x3").isNotNull())
        .select(
            "user_id",
            (
                (F.signum(F.col("x2") - F.col("x1")).cast("bigint") + 1) * 9
                + (F.signum(F.col("x3") - F.col("x2")).cast("bigint") + 1) * 3
                + (F.signum(F.col("x3") - F.col("x1")).cast("bigint") + 1)
            ).alias("pattern"),
        )
        .groupBy("user_id", "pattern")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tot = pat.groupBy("user_id").agg(
        F.sum("n").cast("bigint").alias("n_windows"),
        F.count(F.lit(1)).cast("bigint").alias("n_patterns"),
    )
    p = F.col("n").cast("double") / F.col("n_windows")
    term = F.floor(-p * F.log(p) * 1e12).cast(DecimalType(38, 0))
    return (
        pat.join(tot, "user_id")
        .where(F.col("n_windows") >= _PE_MIN_WINDOWS)
        .groupBy("user_id", "n_windows", "n_patterns")
        .agg(
            F.round(
                F.sum(term).cast("double") / 1e12, 6
            ).alias("perm_entropy_nats")
        )
    )


_XCORR_A = "view"       # leading series
_XCORR_B = "purchase"   # lagged series
_XCORR_MAX_LAG = 3


@register(
    "q_ts_cross_correlation",
    oracle=f"""
        WITH daily AS MATERIALIZED (
            SELECT CAST(ts AS DATE) AS day, event_type,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events
            WHERE event_type IN ('{_XCORR_A}', '{_XCORR_B}')
            GROUP BY 1, 2
        ),
        da AS (SELECT day, n AS x FROM daily
               WHERE event_type = '{_XCORR_A}'),
        db AS (SELECT day, n AS y FROM daily
               WHERE event_type = '{_XCORR_B}'),
        lags AS (SELECT unnest(range(0, {_XCORR_MAX_LAG + 1})) AS lag),
        j AS (
            SELECT l.lag, a.x, b.y
            FROM lags l
            JOIN da a ON TRUE
            JOIN db b ON b.day = a.day + l.lag * INTERVAL 1 DAY
        ),
        m AS (
            SELECT lag,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x * x) AS BIGINT) AS sxx,
                   CAST(SUM(y * y) AS BIGINT) AS syy,
                   CAST(SUM(x * y) AS BIGINT) AS sxy
            FROM j GROUP BY lag
        )
        SELECT CAST(lag AS BIGINT) AS lag, n AS n_days,
               ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                     / sqrt((CAST(n AS DOUBLE) * sxx
                             - CAST(sx AS DOUBLE) * sx)
                            * (CAST(n AS DOUBLE) * syy
                               - CAST(sy AS DOUBLE) * sy)), 4) AS xcorr
        FROM m
        WHERE CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
          AND CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy > 0
    """,
    section="TS28",
    doc="Lagged cross-correlation between the daily '"
    f"{_XCORR_A}' and '{_XCORR_B}"
    "' count series at lags 0..3 — the lead-lag detector (does "
    "today's browsing predict purchases k days out?) behind "
    "attribution windows and TS16's Granger screen (which regresses; "
    "this reports the raw correlation profile). Daily counts are "
    "exact integers, so all six moments per lag are exact BIGINTs "
    "(TS6 device, order-insensitive under any partitioning); Pearson "
    "r per lag rebuilt with identical IEEE expressions. The lag "
    "fan-out joins the (tiny, day-grain) aggregated series AFTER "
    "the row-count collapse — at 100 TB the daily table is a few "
    "thousand rows regardless of event volume, so the 4-lag join is "
    "broadcast-trivial; the only row-proportional work is the first "
    "keyed count.",
)
def q_ts_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.where(F.col("event_type").isin(_XCORR_A, _XCORR_B))
        .groupBy(
            F.col("ts").cast("date").alias("day"), "event_type"
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    da = daily.where(F.col("event_type") == _XCORR_A).select(
        "day", F.col("n").alias("x")
    )
    db = daily.where(F.col("event_type") == _XCORR_B).select(
        F.col("day").alias("day_b"), F.col("n").alias("y")
    )
    lags = spark.range(_XCORR_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    j = (
        da.crossJoin(F.broadcast(lags))
        .join(
            db,
            F.col("day_b") == F.date_add(F.col("day"), F.col("lag")),
        )
    )
    m = j.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    nd = F.col("n").cast("double")
    vx = nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    vy = nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    r = (nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")) / (
        F.sqrt(vx * vy)
    )
    return (
        m.where((vx > 0) & (vy > 0))
        .select(
            F.col("lag").cast("bigint").alias("lag"),
            F.col("n").alias("n_days"),
            F.round(r, 4).alias("xcorr"),
        )
    )


_ES_WINDOW = 3   # event-study window: relative days -3..+3


@register(
    "q_ts_event_study",
    oracle=f"""
        WITH anchors AS (
            SELECT user_id, MIN(CAST(ts AS DATE)) AS anchor_day
            FROM events
            WHERE event_type = 'purchase'
            GROUP BY user_id
        ),
        rel AS (
            SELECT e.user_id,
                   date_diff('day', a.anchor_day, CAST(e.ts AS DATE))
                       AS rel_day,
                   CAST(e.value AS DECIMAL(12,2)) AS v
            FROM events e JOIN anchors a ON a.user_id = e.user_id
            WHERE date_diff('day', a.anchor_day, CAST(e.ts AS DATE))
                  BETWEEN -{_ES_WINDOW} AND {_ES_WINDOW}
        ),
        ud AS (
            SELECT user_id, rel_day,
                   CAST(SUM(v) AS DECIMAL(18,2)) AS day_value
            FROM rel GROUP BY user_id, rel_day
        )
        SELECT CAST(rel_day AS BIGINT) AS rel_day,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               ROUND(CAST(SUM(day_value) AS DOUBLE) / COUNT(*), 4)
                   AS avg_day_value
        FROM ud GROUP BY rel_day
    """,
    section="TS29",
    doc="Event study around each user's FIRST purchase: average per-user "
    "daily spend at relative days -3..+3 — the before/after readout "
    "behind launch, promo, and incident impact analyses (the anchor "
    "is per-entity, so calendar-level confounders cancel in the "
    "alignment). Contributions are user-day DECIMAL-exact sums "
    "collapsed BEFORE the cross-user mean (one decimal sum / count "
    "per relative day — order-insensitive); users lacking events at "
    "a relative day contribute nothing to that day (documented "
    "unbalanced-panel contract; n_users per row makes it auditable). "
    "Scale: one keyed anchor reduction + one user-keyed join + two "
    "keyed collapses — the window filter prunes to 7 days per user "
    "before any aggregation.",
)
def q_ts_event_study(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    anchors = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(F.col("ts").cast("date")).alias("anchor_day"))
    )
    rel = (
        ev.join(anchors, "user_id")
        .select(
            "user_id",
            F.datediff(
                F.col("ts").cast("date"), F.col("anchor_day")
            ).alias("rel_day"),
            F.col("value").cast(DecimalType(12, 2)).alias("v"),
        )
        .where(F.col("rel_day").between(-_ES_WINDOW, _ES_WINDOW))
    )
    ud = rel.groupBy("user_id", "rel_day").agg(
        F.sum("v").cast(DecimalType(18, 2)).alias("day_value")
    )
    return ud.groupBy("rel_day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.round(
            F.sum("day_value").cast("double") / F.count(F.lit(1)), 4
        ).alias("avg_day_value"),
    ).select(
        F.col("rel_day").cast("bigint").alias("rel_day"),
        "n_users",
        "avg_day_value",
    )


_ACF_MAX_LAG = 7


@register(
    "q_ts_acf_profile",
    oracle=f"""
        WITH d AS MATERIALIZED (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1
        ),
        lags AS (SELECT unnest(range(1, {_ACF_MAX_LAG + 1})) AS lag),
        j AS (
            SELECT l.lag, a.x, b.x AS y
            FROM lags l
            JOIN d a ON TRUE
            JOIN d b ON b.day = a.day + l.lag * INTERVAL 1 DAY
        ),
        m AS (
            SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x * x) AS BIGINT) AS sxx,
                   CAST(SUM(y * y) AS BIGINT) AS syy,
                   CAST(SUM(x * y) AS BIGINT) AS sxy
            FROM j GROUP BY lag
        )
        SELECT CAST(lag AS BIGINT) AS lag, n AS n_days,
               ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                     / sqrt((CAST(n AS DOUBLE) * sxx
                             - CAST(sx AS DOUBLE) * sx)
                            * (CAST(n AS DOUBLE) * syy
                               - CAST(sy AS DOUBLE) * sy)), 4) AS acf
        FROM m
        WHERE CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
          AND CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy > 0
    """,
    section="TS30",
    doc="Autocorrelation PROFILE of the daily event-count series at "
    "lags 1..7 — TS6 gives one lag-1 point per user; the profile is "
    "how you actually pick a seasonality (the lag-7 spike = weekly "
    "cycle) and decide differencing before TS17's Holt or TS12's "
    "decomposition. Same exactness device as TS28: day-grain counts "
    "are exact integers, per-lag moments exact BIGITs, Pearson "
    "rebuilt identically; lag fan-out joins AFTER the day collapse "
    "(broadcast-trivial at any event volume). Degenerate-variance "
    "lags filtered on both engines.",
)
def q_ts_acf_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    lags = spark.range(1, _ACF_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    db = d.select(F.col("day").alias("day_b"), F.col("x").alias("y"))
    j = d.crossJoin(F.broadcast(lags)).join(
        db, F.col("day_b") == F.date_add(F.col("day"), F.col("lag"))
    )
    m = j.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    nd = F.col("n").cast("double")
    vx = nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    vy = nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    r = (nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")) / (
        F.sqrt(vx * vy)
    )
    return m.where((vx > 0) & (vy > 0)).select(
        F.col("lag").cast("bigint").alias("lag"),
        F.col("n").alias("n_days"),
        F.round(r, 4).alias("acf"),
    )


_PACF_R_DUCK = (
    "(CAST(n_{l} AS DOUBLE) * sxy_{l}"
    " - CAST(sx_{l} AS DOUBLE) * sy_{l})"
    " / sqrt((CAST(n_{l} AS DOUBLE) * sxx_{l}"
    "         - CAST(sx_{l} AS DOUBLE) * sx_{l})"
    "        * (CAST(n_{l} AS DOUBLE) * syy_{l}"
    "           - CAST(sy_{l} AS DOUBLE) * sy_{l}))"
)


@register(
    "q_ts_pacf",
    oracle=f"""
        WITH d AS MATERIALIZED (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1
        ),
        lags AS (SELECT unnest(range(1, 4)) AS lag),
        jp AS (
            SELECT l.lag, a.x, b.x AS y
            FROM lags l
            JOIN d a ON TRUE
            JOIN d b ON b.day = a.day + l.lag * INTERVAL 1 DAY
        ),
        piv AS (
            SELECT {{pivot}}
            FROM jp
        ),
        r AS (
            SELECT {_PACF_R_DUCK.format(l=1)} AS r1,
                   {_PACF_R_DUCK.format(l=2)} AS r2,
                   {_PACF_R_DUCK.format(l=3)} AS r3
            FROM piv
        ),
        dl2 AS (
            SELECT r1, r2, r3,
                   (r2 - r1 * r1) / (1 - r1 * r1) AS p2
            FROM r
        ),
        dl3 AS (
            SELECT r1, r2, r3, p2,
                   r1 - p2 * r1 AS phi21
            FROM dl2
        )
        SELECT ROUND(r1, 4) AS pacf_1,
               ROUND(p2, 4) AS pacf_2,
               ROUND((r3 - phi21 * r2 - p2 * r1)
                     / (1 - phi21 * r1 - p2 * r2), 4) AS pacf_3
        FROM dl3
    """.replace("{pivot}", ", ".join(
        f"CAST(SUM(CASE WHEN lag = {l} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS n_{l}, "
        f"CAST(SUM(CASE WHEN lag = {l} THEN x ELSE 0 END) AS BIGINT)"
        f" AS sx_{l}, "
        f"CAST(SUM(CASE WHEN lag = {l} THEN y ELSE 0 END) AS BIGINT)"
        f" AS sy_{l}, "
        f"CAST(SUM(CASE WHEN lag = {l} THEN x * x ELSE 0 END) AS BIGINT)"
        f" AS sxx_{l}, "
        f"CAST(SUM(CASE WHEN lag = {l} THEN y * y ELSE 0 END) AS BIGINT)"
        f" AS syy_{l}, "
        f"CAST(SUM(CASE WHEN lag = {l} THEN x * y ELSE 0 END) AS BIGINT)"
        f" AS sxy_{l}"
        for l in (1, 2, 3)
    )),
    section="TS31",
    doc="Partial autocorrelation of the daily event-count series at lags "
    "1..3 via the Durbin-Levinson recursion on TS30's exact-moment "
    "autocorrelations — the AR-order selector (PACF cuts off at the "
    "true AR order; ACF alone can't distinguish AR(1) from AR(2)). "
    "All six moments per lag reduce in ONE conditional-aggregation "
    "pass over the day-grain pair table (A9 device); the three "
    "pairwise-complete r's and the D-L formulas are scalar IEEE "
    "arithmetic written with identical nesting on both engines "
    "(SURVEY 5.3 rule 10). Scale: the pair table is |days| x 3 rows "
    "regardless of event volume — collapse-first, fan-out after.",
)
def q_ts_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    lags = spark.range(1, 4).select(F.col("id").cast("int").alias("lag"))
    db = d.select(F.col("day").alias("day_b"), F.col("x").alias("y"))
    jp = d.crossJoin(F.broadcast(lags)).join(
        db, F.col("day_b") == F.date_add(F.col("day"), F.col("lag"))
    )
    piv = jp.agg(
        *[
            agg
            for l in (1, 2, 3)
            for agg in (
                F.sum(F.when(F.col("lag") == l, 1).otherwise(0))
                .cast("bigint")
                .alias(f"n_{l}"),
                F.sum(F.when(F.col("lag") == l, F.col("x")).otherwise(0))
                .cast("bigint")
                .alias(f"sx_{l}"),
                F.sum(F.when(F.col("lag") == l, F.col("y")).otherwise(0))
                .cast("bigint")
                .alias(f"sy_{l}"),
                F.sum(
                    F.when(F.col("lag") == l, F.col("x") * F.col("x"))
                    .otherwise(0)
                )
                .cast("bigint")
                .alias(f"sxx_{l}"),
                F.sum(
                    F.when(F.col("lag") == l, F.col("y") * F.col("y"))
                    .otherwise(0)
                )
                .cast("bigint")
                .alias(f"syy_{l}"),
                F.sum(
                    F.when(F.col("lag") == l, F.col("x") * F.col("y"))
                    .otherwise(0)
                )
                .cast("bigint")
                .alias(f"sxy_{l}"),
            )
        ]
    )

    def _r(l: int):
        nd = F.col(f"n_{l}").cast("double")
        return (
            nd * F.col(f"sxy_{l}")
            - F.col(f"sx_{l}").cast("double") * F.col(f"sy_{l}")
        ) / F.sqrt(
            (
                nd * F.col(f"sxx_{l}")
                - F.col(f"sx_{l}").cast("double") * F.col(f"sx_{l}")
            )
            * (
                nd * F.col(f"syy_{l}")
                - F.col(f"sy_{l}").cast("double") * F.col(f"sy_{l}")
            )
        )

    r = piv.select(_r(1).alias("r1"), _r(2).alias("r2"), _r(3).alias("r3"))
    dl2 = r.select(
        "r1",
        "r2",
        "r3",
        (
            (F.col("r2") - F.col("r1") * F.col("r1"))
            / (1 - F.col("r1") * F.col("r1"))
        ).alias("p2"),
    )
    dl3 = dl2.select(
        "r1",
        "r2",
        "r3",
        "p2",
        (F.col("r1") - F.col("p2") * F.col("r1")).alias("phi21"),
    )
    return dl3.select(
        F.round("r1", 4).alias("pacf_1"),
        F.round("p2", 4).alias("pacf_2"),
        F.round(
            (
                F.col("r3")
                - F.col("phi21") * F.col("r2")
                - F.col("p2") * F.col("r1")
            )
            / (
                1
                - F.col("phi21") * F.col("r1")
                - F.col("p2") * F.col("r2")
            ),
            4,
        ).alias("pacf_3"),
    )


_CROSTON_MAX_PART = 50


@register(
    "q_ts_croston",
    oracle=f"""
        WITH demand AS (
            SELECT l.l_partkey AS part, o.o_orderdate AS day,
                   CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE l.l_partkey < {_CROSTON_MAX_PART}
            GROUP BY 1, 2
        ),
        per_part AS (
            SELECT part,
                   CAST(COUNT(*) AS BIGINT) AS n_demand_days,
                   CAST(SUM(qty) AS BIGINT) AS total_qty,
                   CAST(date_diff('day', MIN(day), MAX(day)) AS BIGINT)
                       AS span_days
            FROM demand GROUP BY part
        )
        SELECT part, n_demand_days, total_qty, span_days,
               ROUND((CAST(total_qty AS DOUBLE) / n_demand_days)
                     / (CAST(span_days AS DOUBLE)
                        / (n_demand_days - 1)), 4) AS croston_rate
        FROM per_part
        WHERE n_demand_days >= 3
    """,
    section="TS32",
    doc="Croston's intermittent-demand rate per slow-moving part "
    "(non-smoothed form): mean demand SIZE on demand days divided by "
    "the mean INTERVAL between demand days — the forecasting method "
    "for sparse series where TS17's Holt degenerates (most days are "
    "zero, so level-smoothing collapses toward zero and understates "
    "demand). Sizes, day counts, and the span are exact integers "
    "from one (part, day) collapse; the rate is one IEEE division "
    "chain (rule 10). Parts with <3 demand days are excluded (the "
    "interval is undefined). Scale: the fact join co-keys on "
    "l_orderkey (J-family shape), then everything reduces to the "
    "part grain — rows out track the PART DOMAIN, not order volume.",
)
def q_ts_croston(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_partkey") < _CROSTON_MAX_PART
    )
    od = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    demand = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy(
            F.col("l_partkey").alias("part"),
            F.col("o_orderdate").alias("day"),
        )
        .agg(F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("qty"))
    )
    per_part = demand.groupBy("part").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_demand_days"),
        F.sum("qty").cast("bigint").alias("total_qty"),
        F.datediff(F.max("day"), F.min("day"))
        .cast("bigint")
        .alias("span_days"),
    )
    return per_part.where(F.col("n_demand_days") >= 3).select(
        "part",
        "n_demand_days",
        "total_qty",
        "span_days",
        F.round(
            (F.col("total_qty").cast("double") / F.col("n_demand_days"))
            / (
                F.col("span_days").cast("double")
                / (F.col("n_demand_days") - 1)
            ),
            4,
        ).alias("croston_rate"),
    )


@register(
    "q_ts_mase",
    oracle="""
        WITH d AS MATERIALIZED (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1, 2
        ),
        lagd AS (
            SELECT event_type, day, x,
                   lag(x, 7) OVER (PARTITION BY event_type
                                   ORDER BY day) AS x7,
                   lag(x, 1) OVER (PARTITION BY event_type
                                   ORDER BY day) AS x1
            FROM d
        ),
        m AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_days,
                   CAST(SUM(CASE WHEN x7 IS NOT NULL
                            THEN abs(x - x7) END) AS BIGINT) AS se7,
                   CAST(SUM(CASE WHEN x7 IS NOT NULL
                            THEN 1 ELSE 0 END) AS BIGINT) AS n7,
                   CAST(SUM(CASE WHEN x1 IS NOT NULL
                            THEN abs(x - x1) END) AS BIGINT) AS se1,
                   CAST(SUM(CASE WHEN x1 IS NOT NULL
                            THEN 1 ELSE 0 END) AS BIGINT) AS n1
            FROM lagd GROUP BY event_type
        )
        SELECT event_type, n_days,
               ROUND((CAST(se7 AS DOUBLE) / n7)
                     / (CAST(se1 AS DOUBLE) / n1), 4) AS mase_weekly
        FROM m
    """,
    section="TS33",
    doc="MASE (mean absolute SCALED error) of the seasonal-naive lag-7 "
    "forecast per event-type daily series, scaled by the naive lag-1 "
    "in-sample MAE — the ONE forecast metric comparable ACROSS "
    "series of different volumes (TS13's MAE/WAPE are per-series; "
    "MASE<1 means the weekly pattern beats naive persistence, the "
    "go/no-go for shipping a seasonal model per segment). Day-grain "
    "counts and both error sums are exact integers from one collapse "
    "+ two lag windows; the scaled ratio is the only float op "
    "(rule 10). Scale: |types| x |days| table after collapse — "
    "window state is bounded by the collection window.",
)
def q_ts_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    w = Window.partitionBy("event_type").orderBy("day")
    lagd = d.select(
        "event_type",
        "x",
        F.lag("x", 7).over(w).alias("x7"),
        F.lag("x", 1).over(w).alias("x1"),
    )
    m = lagd.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum(
            F.when(
                F.col("x7").isNotNull(), F.abs(F.col("x") - F.col("x7"))
            )
        )
        .cast("bigint")
        .alias("se7"),
        F.sum(F.when(F.col("x7").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n7"),
        F.sum(
            F.when(
                F.col("x1").isNotNull(), F.abs(F.col("x") - F.col("x1"))
            )
        )
        .cast("bigint")
        .alias("se1"),
        F.sum(F.when(F.col("x1").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
    )
    return m.select(
        "event_type",
        "n_days",
        F.round(
            (F.col("se7").cast("double") / F.col("n7"))
            / (F.col("se1").cast("double") / F.col("n1")),
            4,
        ).alias("mase_weekly"),
    )


@register(
    "q_ts_peak_detect",
    oracle="""
        WITH d AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1, 2
        ),
        nb AS (
            SELECT event_type, day, x,
                   lag(x) OVER (PARTITION BY event_type
                                ORDER BY day) AS xl,
                   lead(x) OVER (PARTITION BY event_type
                                 ORDER BY day) AS xr
            FROM d
        )
        SELECT event_type, day, x AS daily_events,
               greatest(xl, xr) AS neighbor_max
        FROM nb
        WHERE xl IS NOT NULL AND xr IS NOT NULL
          AND x > xl AND x > xr
          AND (x - greatest(xl, xr)) * (x - greatest(xl, xr))
              >= greatest(xl, xr)
    """,
    section="TS34",
    doc="Prominent-peak detection per event-type daily series: strict "
    "local maxima whose excess over the taller neighbor clears one "
    "Poisson standard deviation — the spike catalog for incident "
    "review and campaign attribution, stricter than TS10's z-score "
    "anomalies (a z-spike on a rising ramp is not a PEAK; the "
    "neighbor-relative test is shift-invariant and needs no fitted "
    "variance). The prominence test is the INTEGER comparison "
    "(x-mn)^2 >= mn — i.e. x-mn >= sqrt(mn), Poisson-scaled so the "
    "peak yield stays stable as volumes grow 100x (a fixed "
    "percentage threshold goes vacuous: relative fluctuations "
    "shrink as 1/sqrt(n)) — and exact on both engines. Scale: two "
    "adjacent-row windows per type on the day spine after the TS7 "
    "collapse.",
)
def q_ts_peak_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    w = Window.partitionBy("event_type").orderBy("day")
    nb = d.select(
        "event_type",
        "day",
        "x",
        F.lag("x").over(w).alias("xl"),
        F.lead("x").over(w).alias("xr"),
    )
    mn = F.greatest("xl", "xr")
    return nb.where(
        F.col("xl").isNotNull()
        & F.col("xr").isNotNull()
        & (F.col("x") > F.col("xl"))
        & (F.col("x") > F.col("xr"))
        & ((F.col("x") - mn) * (F.col("x") - mn) >= mn)
    ).select(
        "event_type",
        "day",
        F.col("x").alias("daily_events"),
        mn.alias("neighbor_max"),
    )


_LB_MAX_LAG = 7


@register(
    "q_ts_ljung_box",
    oracle=f"""
        WITH d AS MATERIALIZED (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1
        ),
        n_tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM d),
        lags AS (SELECT unnest(range(1, {_LB_MAX_LAG + 1})) AS lag),
        jp AS (
            SELECT l.lag, a.x, b.x AS y
            FROM lags l
            JOIN d a ON TRUE
            JOIN d b ON b.day = a.day + l.lag * INTERVAL 1 DAY
        ),
        m AS (
            SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x * x) AS BIGINT) AS sxx,
                   CAST(SUM(y * y) AS BIGINT) AS syy,
                   CAST(SUM(x * y) AS BIGINT) AS sxy
            FROM jp GROUP BY lag
        ),
        r AS (
            SELECT lag,
                   (CAST(n AS DOUBLE) * sxy
                    - CAST(sx AS DOUBLE) * sy)
                   / sqrt((CAST(n AS DOUBLE) * sxx
                           - CAST(sx AS DOUBLE) * sx)
                          * (CAST(n AS DOUBLE) * syy
                             - CAST(sy AS DOUBLE) * sy)) AS rk
            FROM m
        ),
        terms AS (
            SELECT r.lag, t.nd,
                   rk * rk / (t.nd - r.lag) AS term
            FROM r CROSS JOIN n_tot t
        )
        SELECT CAST(MAX(nd) AS BIGINT) AS n_days,
               {_LB_MAX_LAG} AS max_lag,
               ROUND(CAST(MAX(nd) AS DOUBLE) * (MAX(nd) + 2)
                     * (CAST(SUM(CAST(floor(term * 1e12)
                                  AS DECIMAL(38,0))) AS DOUBLE) / 1e12),
                     4) AS lb_q
        FROM terms
    """,
    section="TS35",
    doc=f"Ljung-Box portmanteau whiteness test on the daily event-count "
    f"series: Q = n(n+2) * sum(r_k^2/(n-k)) over lags 1..{_LB_MAX_LAG} "
    "— the JOINT 'is there ANY autocorrelation' test that reads "
    "TS30's whole profile at once (TS30 shows which lag; A76's runs "
    "test checks signs; LB is the magnitude-weighted summary whose "
    "chi-square(7) tail is the standard residual-whiteness gate "
    "after fitting TS17/TS24 models — fit, subtract, re-run LB, and "
    "a small Q certifies the model captured the structure). Each "
    "r_k comes from TS30's exact pairwise-complete integer moments; "
    "the 7 r^2/(n-k) terms fold through the floor-1e12 DECIMAL "
    "device (rule 10). Scale: |days|-bounded pair tables, one "
    "scalar per lag.",
)
def q_ts_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    n_tot = d.agg(F.count(F.lit(1)).cast("bigint").alias("nd"))
    lags = spark.range(1, _LB_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    db = d.select(F.col("day").alias("day_b"), F.col("x").alias("y"))
    jp = d.crossJoin(F.broadcast(lags)).join(
        db, F.col("day_b") == F.date_add(F.col("day"), F.col("lag"))
    )
    m = jp.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    nd_ = F.col("n").cast("double")
    rk = (
        nd_ * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    ) / F.sqrt(
        (nd_ * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
        * (nd_ * F.col("syy") - F.col("sy").cast("double") * F.col("sy"))
    )
    r = m.select("lag", rk.alias("rk"))
    terms = r.crossJoin(F.broadcast(n_tot)).select(
        "nd",
        (F.col("rk") * F.col("rk") / (F.col("nd") - F.col("lag"))).alias(
            "term"
        ),
    )
    qsum = (
        F.sum(F.floor(F.col("term") * 1e12).cast("decimal(38,0)")).cast(
            "double"
        )
        / 1e12
    )
    return terms.agg(
        F.max("nd").cast("bigint").alias("n_days"),
        F.lit(_LB_MAX_LAG).cast("int").alias("max_lag"),
        F.round(
            F.max("nd").cast("double") * (F.max("nd") + 2) * qsum, 4
        ).alias("lb_q"),
    )


@register(
    "q_ts_kpss",
    oracle="""
        WITH d AS MATERIALIZED (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS s
            FROM d
        ),
        e AS (
            SELECT day, CAST(t.n * d.x - t.s AS BIGINT) AS en
            FROM d CROSS JOIN tot t
        ),
        ps AS (
            SELECT day, en,
                   CAST(SUM(en) OVER (ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS BIGINT) AS st
            FROM e
        ),
        lagd AS (
            SELECT en,
                   lag(en, 1) OVER (ORDER BY day) AS e1,
                   lag(en, 2) OVER (ORDER BY day) AS e2
            FROM ps
        ),
        m AS (
            SELECT
                (SELECT CAST(SUM(st * st) AS DECIMAL(38,0)) FROM ps)
                    AS ss2,
                CAST(SUM(en * en) AS DECIMAL(38,0)) AS g0,
                CAST(SUM(CASE WHEN e1 IS NOT NULL
                         THEN en * e1 END) AS DECIMAL(38,0)) AS g1,
                CAST(SUM(CASE WHEN e2 IS NOT NULL
                         THEN en * e2 END) AS DECIMAL(38,0)) AS g2,
                (SELECT MAX(n) FROM tot) AS n
            FROM lagd
        )
        SELECT CAST(n AS BIGINT) AS n_days,
               ROUND(CAST(ss2 AS DOUBLE)
                     / (CAST(n AS DOUBLE) * n)
                     / (CAST(g0 AS DOUBLE)
                        + 2 * (2.0 / 3.0) * CAST(g1 AS DOUBLE)
                        + 2 * (1.0 / 3.0) * CAST(g2 AS DOUBLE)), 4)
                   AS kpss_eta,
               CAST(CAST(ss2 AS DOUBLE)
                    / (CAST(n AS DOUBLE) * n)
                    / (CAST(g0 AS DOUBLE)
                       + 2 * (2.0 / 3.0) * CAST(g1 AS DOUBLE)
                       + 2 * (1.0 / 3.0) * CAST(g2 AS DOUBLE))
                    > 0.463 AS BOOLEAN) AS reject_stationarity
        FROM m
    """,
    section="TS36",
    doc="KPSS level-stationarity test on the daily event-count series "
    "(Bartlett bandwidth 2): eta = n^-2 * sum(S_t^2) / s2_lr, with "
    "the 5% critical value 0.463 verdict — the NULL-reversed "
    "complement of TS14's Mann-Kendall (MK's null is 'no trend'; "
    "KPSS's null is 'stationary', so MK-insignificant + KPSS-reject "
    "= a unit root, not a clean series: difference before Holt) and "
    "the gate that decides TS17/TS24's differencing step. Exactness "
    "device: residuals are kept as INTEGER NUMERATORS e = n*x - S "
    "(the mean's denominator n cancels between numerator and "
    "denominator of eta), so partial sums, their squares, and the "
    "Bartlett autocovariances are all exact DECIMAL(38,0) sums; "
    "the only float ops are the final weighted combination and "
    "ratio (rule 10). Scale: day-spine windows (TS7), one "
    "reduction.",
)
def q_ts_kpss(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    tot = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
    )
    e = d.crossJoin(F.broadcast(tot)).select(
        "day",
        "n",
        (F.col("n") * F.col("x") - F.col("s")).cast("bigint").alias("en"),
    )
    w = Window.orderBy("day")
    ps = e.select(
        "day",
        "n",
        "en",
        F.sum("en")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint")
        .alias("st"),
    )
    lagd = ps.select(
        "n",
        "en",
        "st",
        F.lag("en", 1).over(w).alias("e1"),
        F.lag("en", 2).over(w).alias("e2"),
    )
    m = lagd.agg(
        F.sum(F.col("st").cast("decimal(19,0)") * F.col("st"))
        .cast("decimal(38,0)")
        .alias("ss2"),
        F.sum(F.col("en").cast("decimal(19,0)") * F.col("en"))
        .cast("decimal(38,0)")
        .alias("g0"),
        F.sum(
            F.when(
                F.col("e1").isNotNull(),
                F.col("en").cast("decimal(19,0)") * F.col("e1"),
            )
        )
        .cast("decimal(38,0)")
        .alias("g1"),
        F.sum(
            F.when(
                F.col("e2").isNotNull(),
                F.col("en").cast("decimal(19,0)") * F.col("e2"),
            )
        )
        .cast("decimal(38,0)")
        .alias("g2"),
        F.max("n").cast("bigint").alias("n"),
    )
    s2lr = (
        F.col("g0").cast("double")
        + 2 * (2.0 / 3.0) * F.col("g1").cast("double")
        + 2 * (1.0 / 3.0) * F.col("g2").cast("double")
    )
    eta = (
        F.col("ss2").cast("double")
        / (F.col("n").cast("double") * F.col("n"))
        / s2lr
    )
    return m.select(
        F.col("n").alias("n_days"),
        F.round(eta, 4).alias("kpss_eta"),
        (eta > 0.463).alias("reject_stationarity"),
    )


def _se_fold(expr_fmt: str) -> str:
    t = expr_fmt.format(i=0)
    for i in range(1, len(_PERIODS)):
        t = f"({t} + {expr_fmt.format(i=i)})"
    return t


@register(
    "q_ts_spectral_entropy",
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
                        AS DOUBLE) / 1e4 AS ss
            FROM cent c CROSS JOIN freqs f
            GROUP BY f.period
        ),
        piv AS (
            SELECT {", ".join(
                f"MAX(CASE WHEN period = {p} THEN"
                f" (sc * sc + ss * ss) * 2.0 / n END) AS pw_{i}"
                for i, p in enumerate(_PERIODS)
            )}
            FROM proj
        ),
        norm AS (
            SELECT *, {_se_fold("pw_{i}")} AS total
            FROM piv
        )
        SELECT ROUND(-({_se_fold("pw_{i}/total * ln(pw_{i}/total)")})
                     / ln({len(_PERIODS)}.0), 4) AS spectral_entropy,
               ROUND(greatest({", ".join(f"pw_{i}" for i in range(len(_PERIODS)))})
                     / total, 4) AS dominant_share
        FROM norm
    """,
    section="TS37",
    doc="Normalized spectral entropy over TS21's fixed-frequency "
    f"periodogram (periods {_PERIODS}): the power distribution's "
    "entropy scaled to [0,1] by ln(k), plus the dominant line's "
    "share — THE forecastability index (entropy near 0 = one "
    "cadence owns the variance, seasonal models will work; near 1 "
    "= white-ish spectrum, TS17/TS24 will chase noise and the "
    "honest forecast is the TS13 naive baseline). Reuses TS21's "
    "exact quantized projections verbatim; the power pivot, "
    "normalization, and p·ln p terms fold over the FIXED period "
    "list with explicit left nesting (A66 device), so the only "
    "libm calls run on bit-identical doubles (rule 10). Scale: "
    "TS21's shape — |days| x |periods| projection, then scalar "
    "arithmetic.",
)
def q_ts_spectral_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    daily = od.groupBy("o_orderdate").agg(
        F.expr(
            "cast(sum(cast(o_totalprice as decimal(18,2))) * 100"
            " as bigint) div 100000"
        ).alias("v")
    ).select(
        F.expr(
            "cast(date_diff(DAY, timestamp '1995-01-01', o_orderdate)"
            " as bigint)"
        ).alias("t"),
        "v",
    )
    wall = Window.partitionBy()
    cent = daily.select(
        "t",
        (
            F.col("v").cast("double")
            - F.sum("v").over(wall).cast("double")
            / F.count(F.lit(1)).over(wall).cast("double")
        ).alias("x"),
    )
    freqs = spark.createDataFrame(
        [(p,) for p in _PERIODS], "period int"
    )
    ang = F.lit(_PI2) * (F.col("t") % F.col("period")) / F.col("period")
    proj = (
        cent.crossJoin(F.broadcast(freqs))
        .groupBy("period")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            (
                F.sum(
                    F.floor(F.col("x") * F.cos(ang) * 1e4).cast(
                        "decimal(38,0)"
                    )
                ).cast("double")
                / 1e4
            ).alias("sc"),
            (
                F.sum(
                    F.floor(F.col("x") * F.sin(ang) * 1e4).cast(
                        "decimal(38,0)"
                    )
                ).cast("double")
                / 1e4
            ).alias("ss"),
        )
    )
    pw = (F.col("sc") * F.col("sc") + F.col("ss") * F.col("ss")) * 2.0 / F.col(
        "n"
    )
    piv = proj.agg(
        *[
            F.max(F.when(F.col("period") == p, pw)).alias(f"pw_{i}")
            for i, p in enumerate(_PERIODS)
        ]
    )

    def _fold(make):
        t = make(0)
        for i in range(1, len(_PERIODS)):
            t = t + make(i)
        return t

    norm = piv.select("*", _fold(lambda i: F.col(f"pw_{i}")).alias("total"))
    ent = -_fold(
        lambda i: F.col(f"pw_{i}")
        / F.col("total")
        * F.log(F.col(f"pw_{i}") / F.col("total"))
    ) / F.log(F.lit(float(len(_PERIODS))))
    return norm.select(
        F.round(ent, 4).alias("spectral_entropy"),
        F.round(
            F.greatest(*[F.col(f"pw_{i}") for i in range(len(_PERIODS))])
            / F.col("total"),
            4,
        ).alias("dominant_share"),
    )


@register(
    "q_ts_tracking_signal",
    oracle="""
        WITH daily AS (
            SELECT o_orderdate AS day,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) // 100 AS dollars
            FROM orders GROUP BY o_orderdate
        ),
        fc AS (
            SELECT day, dollars,
                   lag(dollars, 7) OVER (ORDER BY day) AS pred
            FROM daily
        ),
        err AS (
            SELECT day,
                   dollars - pred AS e,
                   abs(dollars - pred) AS ae
            FROM fc WHERE pred IS NOT NULL
        ),
        run AS (
            SELECT day,
                   CAST(SUM(e) OVER w AS BIGINT) AS cum_e,
                   CAST(SUM(ae) OVER w AS BIGINT) AS cum_ae,
                   CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t
            FROM err
            WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)
        )
        SELECT day, cum_e,
               ROUND(CAST(cum_e AS DOUBLE) / (CAST(cum_ae AS DOUBLE) / t),
                     4) AS tracking_signal,
               CAST(abs(CAST(cum_e AS DOUBLE)
                        / (CAST(cum_ae AS DOUBLE) / t)) > 4.0
                    AS BOOLEAN) AS biased
        FROM run
        WHERE t % 7 = 0
    """,
    section="TS38",
    doc="Forecast tracking signal for the seasonal-naive lag-7 "
    "predictor: running sum of SIGNED errors divided by running MAD "
    "(cumulative MAE), sampled weekly, with the classic |TS| > 4 "
    "bias alarm — the MONITORING layer on top of TS13's one-shot "
    "MAE/WAPE and TS33's MASE: those score a forecast once; the "
    "tracking signal runs in production and fires when errors stop "
    "canceling (demand shifted, the model is now systematically "
    "under/over — retrain), which symmetric accuracy metrics are "
    "blind to by construction. Whole-dollar day sums keep both "
    "running sums exact BIGINTs; the ratio and alarm are per-row "
    "IEEE expressions (rule 10). Scale: day-spine windows (TS7).",
)
def q_ts_tracking_signal(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    daily = od.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.expr(
            "cast(sum(cast(o_totalprice as decimal(18,2))) * 100"
            " as bigint) div 100"
        ).alias("dollars")
    )
    w = Window.orderBy("day")
    fc = daily.select(
        "day", "dollars", F.lag("dollars", 7).over(w).alias("pred")
    )
    err = fc.where(F.col("pred").isNotNull()).select(
        "day",
        (F.col("dollars") - F.col("pred")).alias("e"),
        F.abs(F.col("dollars") - F.col("pred")).alias("ae"),
    )
    wrun = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    run = err.select(
        "day",
        F.sum("e").over(wrun).cast("bigint").alias("cum_e"),
        F.sum("ae").over(wrun).cast("bigint").alias("cum_ae"),
        F.row_number().over(Window.orderBy("day")).cast("bigint").alias("t"),
    )
    ts = F.col("cum_e").cast("double") / (
        F.col("cum_ae").cast("double") / F.col("t")
    )
    return run.where(F.col("t") % 7 == 0).select(
        "day",
        "cum_e",
        F.round(ts, 4).alias("tracking_signal"),
        (F.abs(ts) > 4.0).alias("biased"),
    )


@register(
    "q_ts_seasonal_stability",
    oracle="""
        WITH d AS MATERIALIZED (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1
        ),
        bounds AS (
            SELECT MIN(day) AS d0,
                   MIN(day) + CAST(CAST(date_diff('day', MIN(day),
                                                  MAX(day)) AS BIGINT)
                                   // 2 AS BIGINT)
                       * INTERVAL 1 DAY AS mid
            FROM d
        ),
        halves AS (
            SELECT CAST(date_diff('day', DATE '1970-01-05', d.day) % 7
                        AS INTEGER) AS dow,
                   CASE WHEN d.day < b.mid THEN 0 ELSE 1 END AS half,
                   d.x
            FROM d CROSS JOIN bounds b
        ),
        agg AS (
            SELECT dow, half,
                   CAST(SUM(x) AS BIGINT) AS c
            FROM halves GROUP BY dow, half
        ),
        tot AS (
            SELECT half, CAST(SUM(c) AS BIGINT) AS t
            FROM agg GROUP BY half
        ),
        sh AS (
            SELECT a.dow,
                   MAX(CASE WHEN a.half = 0 THEN
                       CAST(a.c AS DOUBLE) / t.t END) AS s0,
                   MAX(CASE WHEN a.half = 1 THEN
                       CAST(a.c AS DOUBLE) / t.t END) AS s1
            FROM agg a JOIN tot t ON a.half = t.half
            GROUP BY a.dow
        )
        SELECT dow,
               ROUND(s0, 6) AS share_first_half,
               ROUND(s1, 6) AS share_second_half,
               ROUND(abs(s0 - s1), 6) AS abs_shift
        FROM sh
    """,
    section="TS39",
    doc="Seasonal-profile STABILITY check: the day-of-week volume "
    "share computed separately on the first and second halves of "
    "the collection window, with the per-dow absolute shift — the "
    "validity precondition every dow-based model (TS9's "
    "seasonality, TS12's decomposition, TS33's weekly MASE) "
    "silently assumes: a profile that drifts between halves means "
    "those operators are averaging two different regimes and "
    "their 'seasonal' component is partly trend leakage (pair "
    "with A88's Chow on the level). Day-of-week via datediff-mod-7 "
    "from a fixed Monday (the F5 engine-numbering trap, re-hit and "
    "re-fixed here). Split at the exact midpoint "
    "day (integer floor-div of the span); shares are single "
    "divisions of exact counts per half. Scale: day-grain "
    "collapse, 14-cell arithmetic.",
)
def q_ts_seasonal_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    bounds = d.agg(
        F.min("day").alias("d0"),
        F.expr(
            "date_add(min(day),"
            " cast(cast(date_diff(DAY, min(day), max(day)) as bigint)"
            " div 2 as int))"
        ).alias("mid"),
    )
    halves = d.crossJoin(F.broadcast(bounds)).select(
        F.expr(
            "cast(date_diff(DAY, date '1970-01-05', day) % 7 as int)"
        ).alias("dow"),
        F.when(F.col("day") < F.col("mid"), 0).otherwise(1).alias("half"),
        "x",
    )
    agg = halves.groupBy("dow", "half").agg(
        F.sum("x").cast("bigint").alias("c")
    )
    tot = agg.groupBy("half").agg(F.sum("c").cast("bigint").alias("t"))
    sh = (
        agg.join(F.broadcast(tot), "half")
        .groupBy("dow")
        .agg(
            F.max(
                F.when(
                    F.col("half") == 0,
                    F.col("c").cast("double") / F.col("t"),
                )
            ).alias("s0"),
            F.max(
                F.when(
                    F.col("half") == 1,
                    F.col("c").cast("double") / F.col("t"),
                )
            ).alias("s1"),
        )
    )
    return sh.select(
        "dow",
        F.round("s0", 6).alias("share_first_half"),
        F.round("s1", 6).alias("share_second_half"),
        F.round(F.abs(F.col("s0") - F.col("s1")), 6).alias("abs_shift"),
    )


@register(
    "q_ts_run_lengths",
    oracle="""
        WITH d AS MATERIALIZED (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1
        ),
        med AS (
            SELECT CAST(2 * median(x) AS BIGINT) AS m2 FROM d
        ),
        flag AS (
            SELECT d.day,
                   CASE WHEN 2 * d.x > m.m2 THEN 1 ELSE 0 END AS hi
            FROM d CROSS JOIN med m
        ),
        runs AS (
            SELECT day, hi,
                   CAST(SUM(CASE WHEN hi <> prev_hi OR prev_hi IS NULL
                            THEN 1 ELSE 0 END)
                        OVER (ORDER BY day
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS BIGINT) AS run_id
            FROM (
                SELECT day, hi,
                       lag(hi) OVER (ORDER BY day) AS prev_hi
                FROM flag
            )
        ),
        lens AS (
            SELECT run_id, MAX(hi) AS hi,
                   CAST(COUNT(*) AS BIGINT) AS len
            FROM runs GROUP BY run_id
        )
        SELECT len AS run_length,
               CAST(SUM(CASE WHEN hi = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_high_runs,
               CAST(SUM(CASE WHEN hi = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_low_runs
        FROM lens GROUP BY len
    """,
    section="TS40",
    doc="Run-length DISTRIBUTION of above/below-median days: how long "
    "the daily series stays on one side of its median, split by "
    "side — the shape behind A76's runs test (A76 counts runs and "
    "z-scores the total; under exchangeability run lengths are "
    "geometric(1/2), so a fat tail here localizes the dependence "
    "— weekly clumping shows as a spike at 5-7 — where the runs "
    "test only says 'too few runs'). Median via the doubled-value "
    "device (A13); run ids from the gaps-and-islands flip-counter "
    "cumulative (W-family device); all counts exact. Scale: "
    "day-spine windows (TS7).",
)
def q_ts_run_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    med = d.agg(
        F.expr("cast(2 * percentile(x, 0.5) as bigint)").alias("m2")
    )
    flag = d.crossJoin(F.broadcast(med)).select(
        "day",
        F.when(2 * F.col("x") > F.col("m2"), 1).otherwise(0).alias("hi"),
    )
    w = Window.orderBy("day")
    runs = flag.select(
        "day",
        "hi",
        F.lag("hi").over(w).alias("prev_hi"),
    ).select(
        "day",
        "hi",
        F.sum(
            F.when(
                F.col("prev_hi").isNull()
                | (F.col("hi") != F.col("prev_hi")),
                1,
            ).otherwise(0)
        )
        .over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .cast("bigint")
        .alias("run_id"),
    )
    lens = runs.groupBy("run_id").agg(
        F.max("hi").alias("hi"),
        F.count(F.lit(1)).cast("bigint").alias("len"),
    )
    return lens.groupBy(F.col("len").alias("run_length")).agg(
        F.sum(F.when(F.col("hi") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_high_runs"),
        F.sum(F.when(F.col("hi") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_low_runs"),
    )


@register(
    "q_ts_hac_se",
    oracle="""
        WITH d AS MATERIALIZED (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS s
            FROM d
        ),
        e AS (
            SELECT day, CAST(t.n * d.x - t.s AS BIGINT) AS en, t.n
            FROM d CROSS JOIN tot t
        ),
        lagd AS (
            SELECT en, n,
                   lag(en, 1) OVER (ORDER BY day) AS e1,
                   lag(en, 2) OVER (ORDER BY day) AS e2
            FROM e
        ),
        m AS (
            SELECT CAST(MAX(n) AS BIGINT) AS n,
                   CAST(SUM(en * en) AS DECIMAL(38,0)) AS g0,
                   CAST(SUM(CASE WHEN e1 IS NOT NULL
                            THEN en * e1 END) AS DECIMAL(38,0)) AS g1,
                   CAST(SUM(CASE WHEN e2 IS NOT NULL
                            THEN en * e2 END) AS DECIMAL(38,0)) AS g2
            FROM lagd
        )
        SELECT n AS n_days,
               ROUND(sqrt((CAST(g0 AS DOUBLE)
                           / (CAST(n AS DOUBLE) * n * n)) / n), 4)
                   AS se_naive,
               ROUND(sqrt(((CAST(g0 AS DOUBLE)
                            + 2 * (2.0 / 3.0) * CAST(g1 AS DOUBLE)
                            + 2 * (1.0 / 3.0) * CAST(g2 AS DOUBLE))
                           / (CAST(n AS DOUBLE) * n * n)) / n), 4)
                   AS se_hac,
               ROUND(sqrt((CAST(g0 AS DOUBLE)
                           + 2 * (2.0 / 3.0) * CAST(g1 AS DOUBLE)
                           + 2 * (1.0 / 3.0) * CAST(g2 AS DOUBLE))
                          / CAST(g0 AS DOUBLE)), 4) AS inflation
        FROM m
    """,
    section="TS41",
    doc="Newey-West (HAC, Bartlett bandwidth 2) standard error of the "
    "mean daily event count, beside the naive IID s/sqrt(n) — the "
    "time-series counterpart of A92's design effect: when the "
    "series autocorrelates (TS30's profile), the IID error bar on "
    "'average daily volume' is too tight by exactly the inflation "
    "factor reported here, and every capacity plan built on it is "
    "overconfident. Shares TS36's integer-numerator residual "
    "device (e = n*x - S; the n powers cancel consistently in "
    "both SEs), so the autocovariances are exact DECIMAL sums and "
    "both SEs are single IEEE trees (rule 10). Scale: day-spine "
    "windows + one reduction.",
)
def q_ts_hac_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    tot = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
    )
    e = d.crossJoin(F.broadcast(tot)).select(
        "day",
        "n",
        (F.col("n") * F.col("x") - F.col("s")).cast("bigint").alias("en"),
    )
    w = Window.orderBy("day")
    lagd = e.select(
        "n",
        "en",
        F.lag("en", 1).over(w).alias("e1"),
        F.lag("en", 2).over(w).alias("e2"),
    )
    m = lagd.agg(
        F.max("n").cast("bigint").alias("n"),
        F.sum(F.col("en").cast("decimal(19,0)") * F.col("en"))
        .cast("decimal(38,0)")
        .alias("g0"),
        F.sum(
            F.when(
                F.col("e1").isNotNull(),
                F.col("en").cast("decimal(19,0)") * F.col("e1"),
            )
        )
        .cast("decimal(38,0)")
        .alias("g1"),
        F.sum(
            F.when(
                F.col("e2").isNotNull(),
                F.col("en").cast("decimal(19,0)") * F.col("e2"),
            )
        )
        .cast("decimal(38,0)")
        .alias("g2"),
    )
    nd = F.col("n").cast("double")
    g0d = F.col("g0").cast("double")
    lr = (
        g0d
        + 2 * (2.0 / 3.0) * F.col("g1").cast("double")
        + 2 * (1.0 / 3.0) * F.col("g2").cast("double")
    )
    return m.select(
        F.col("n").alias("n_days"),
        F.round(F.sqrt((g0d / (nd * F.col("n") * F.col("n"))) / F.col("n")), 4)
        .alias("se_naive"),
        F.round(
            F.sqrt((lr / (nd * F.col("n") * F.col("n"))) / F.col("n")), 4
        ).alias("se_hac"),
        F.round(F.sqrt(lr / g0d), 4).alias("inflation"),
    )


# --- TS42: Lo-MacKinlay variance-ratio test ---------------------------------

_VR_KS = (2, 5)


def _vr_oracle() -> str:
    per_k = []
    for k in _VR_KS:
        per_k.append(f"""
        SELECT {k} AS k, n_diffs,
               (SELECT COUNT(*) FROM ksum WHERE k = {k}) AS n_windows,
               ROUND(
                   ((SELECT CAST(sq AS DOUBLE) - CAST(sm AS DOUBLE)
                                 * CAST(sm AS DOUBLE) / cnt
                     FROM kstat WHERE k = {k})
                    / ((SELECT cnt FROM kstat WHERE k = {k}) - 1))
                   / ({k} * var1), 6) AS variance_ratio
        FROM base
        """)
    union = " UNION ALL ".join(per_k)
    return f"""
        WITH daily AS (
            SELECT o_orderdate AS d,
                   SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                            AS BIGINT)) AS cents
            FROM orders GROUP BY 1
        ),
        diffs AS (
            SELECT d, cents - lag(cents) OVER (ORDER BY d) AS x,
                   ROW_NUMBER() OVER (ORDER BY d) AS rn
            FROM daily
        ),
        dd AS (SELECT d, x, rn - 1 AS i FROM diffs WHERE x IS NOT NULL),
        ksum AS (
            SELECT k, i, SUM(x) OVER (PARTITION BY k ORDER BY i
                          ROWS BETWEEN k - 1 PRECEDING AND CURRENT ROW) AS y,
                   COUNT(*) OVER (PARTITION BY k ORDER BY i
                          ROWS BETWEEN k - 1 PRECEDING AND CURRENT ROW) AS w
            FROM dd CROSS JOIN (SELECT unnest([{', '.join(str(k) for k in _VR_KS)}]) AS k)
            QUALIFY w = k
        ),
        kstat AS (
            SELECT k,
                   SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS sq,
                   SUM(CAST(y AS HUGEINT)) AS sm,
                   COUNT(*) AS cnt
            FROM ksum GROUP BY k
        ),
        stat1 AS (
            SELECT SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sq1,
                   SUM(CAST(x AS HUGEINT)) AS sm1,
                   COUNT(*) AS cnt1
            FROM dd
        ),
        base AS (
            SELECT CAST(cnt1 AS BIGINT) AS n_diffs,
                   (CAST(sq1 AS DOUBLE)
                    - CAST(sm1 AS DOUBLE) * CAST(sm1 AS DOUBLE) / cnt1)
                   / (cnt1 - 1) AS var1
            FROM stat1
        )
        SELECT CAST(k AS BIGINT) AS k, n_diffs,
               CAST(n_windows AS BIGINT) AS n_windows, variance_ratio
        FROM ({union})
    """


@register(
    "q_ts_variance_ratio",
    oracle=_vr_oracle(),
    section="TS42",
    doc="Lo-MacKinlay variance-ratio test VR(k) = Var(k-period sum) / "
    "(k * Var(1-period)) on day-over-day revenue changes, k in (2, 5) "
    "— THE random-walk diagnostic: VR near 1 = increments "
    "uncorrelated (changes aggregate like noise), VR > 1 = momentum, "
    "VR < 1 = mean reversion; the one-number complement to the ACF "
    "profile (TS6) that aggregate-level forecast choices (Croston vs "
    "Holt vs naive) actually hinge on. Exactness device: daily "
    "revenue collapses to exact BIGINT cents, diffs and overlapping "
    "k-sums stay integer, and the variance pieces are exact 128-bit/"
    "DECIMAL sums divided ONCE into doubles — no float accumulation "
    "at any width. Scale: one date-keyed agg (map-combinable), then "
    "windows over the DAY-GRAIN series (row count = distinct days, "
    "not orders) — single-partition windows over a few thousand rows "
    "regardless of corpus size.",
)
def q_ts_variance_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import DecimalType

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(
            (F.col("o_totalprice").cast(DecimalType(12, 2)) * 100).cast(
                "bigint"
            )
        ).alias("cents")
    )
    wd = Window.orderBy("d")
    dd = (
        daily.select(
            "d", (F.col("cents") - F.lag("cents").over(wd)).alias("x")
        )
        .where(F.col("x").isNotNull())
        .withColumn("i", F.row_number().over(wd) - 1)
    )
    xdec = F.col("x").cast(DecimalType(19, 0))
    stat1 = dd.agg(
        F.sum(xdec * xdec).alias("sq1"),
        F.sum(xdec).alias("sm1"),
        F.count(F.lit(1)).alias("cnt1"),
    ).select(
        F.col("cnt1").cast("bigint").alias("n_diffs"),
        (
            (
                F.col("sq1").cast("double")
                - F.col("sm1").cast("double")
                * F.col("sm1").cast("double")
                / F.col("cnt1")
            )
            / (F.col("cnt1") - 1)
        ).alias("var1"),
    )
    out = None
    for k in _VR_KS:
        wk = Window.orderBy("i").rowsBetween(-(k - 1), 0)
        ks = (
            dd.select(
                F.sum("x").over(wk).alias("y"),
                F.count(F.lit(1)).over(wk).alias("w"),
            )
            .where(F.col("w") == k)
        )
        ydec = F.col("y").cast(DecimalType(19, 0))
        kstat = ks.agg(
            F.sum(ydec * ydec).alias("sq"),
            F.sum(ydec).alias("sm"),
            F.count(F.lit(1)).alias("cnt"),
        )
        row = kstat.crossJoin(stat1).select(
            F.lit(k).cast("bigint").alias("k"),
            "n_diffs",
            F.col("cnt").cast("bigint").alias("n_windows"),
            F.round(
                (
                    (
                        F.col("sq").cast("double")
                        - F.col("sm").cast("double")
                        * F.col("sm").cast("double")
                        / F.col("cnt")
                    )
                    / (F.col("cnt") - 1)
                )
                / (F.lit(float(k)) * F.col("var1")),
                6,
            ).alias("variance_ratio"),
        )
        out = row if out is None else out.unionByName(row)
    return out


# --- TS43: turning-points randomness test -----------------------------------


@register(
    "q_ts_turning_points",
    oracle="""
        WITH daily AS (
            SELECT o_orderdate AS d,
                   SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                            AS BIGINT)) AS cents
            FROM orders GROUP BY 1
        ),
        tri AS (
            SELECT cents,
                   lag(cents) OVER (ORDER BY d) AS prev,
                   lead(cents) OVER (ORDER BY d) AS nxt
            FROM daily
        ),
        t AS (
            SELECT CAST(COUNT(*) + 2 AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN cents > prev AND cents > nxt
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_peaks,
                   CAST(SUM(CASE WHEN cents < prev AND cents < nxt
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_troughs
            FROM tri WHERE prev IS NOT NULL AND nxt IS NOT NULL
        )
        SELECT n, n_peaks, n_troughs,
               n_peaks + n_troughs AS n_turning,
               ROUND(2.0 * (n - 2) / 3.0, 4) AS expected_turning,
               ROUND((n_peaks + n_troughs - 2.0 * (n - 2) / 3.0)
                     / sqrt((16.0 * n - 29.0) / 90.0), 4) AS z_score
        FROM t
    """,
    section="TS43",
    doc="Turning-points test on the daily-revenue series: count of strict "
    "local peaks and troughs vs the E[T] = 2(n-2)/3, "
    "Var[T] = (16n-29)/90 null of an iid sequence — the cheapest "
    "omnibus randomness check there is, reading oscillation "
    "frequency where the runs test (A31) reads sign persistence and "
    "Ljung-Box (TS33) reads linear autocorrelation: too FEW turns = "
    "trend/momentum, too MANY = negative autocorrelation (over-"
    "correction). Exact BIGINT cents make every peak/trough "
    "comparison integer-exact; the z-score is one IEEE expression "
    "4dp. Scale: one date-keyed map-combinable agg, then a single "
    "lag/lead window over the day-grain series — constant-size work "
    "after the reduction at any corpus size.",
)
def q_ts_turning_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import DecimalType

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(
            (F.col("o_totalprice").cast(DecimalType(12, 2)) * 100).cast(
                "bigint"
            )
        ).alias("cents")
    )
    w = Window.orderBy("d")
    tri = daily.select(
        "cents",
        F.lag("cents").over(w).alias("prev"),
        F.lead("cents").over(w).alias("nxt"),
    ).where(F.col("prev").isNotNull() & F.col("nxt").isNotNull())
    t = tri.agg(
        (F.count(F.lit(1)) + 2).cast("bigint").alias("n"),
        F.sum(
            F.when(
                (F.col("cents") > F.col("prev"))
                & (F.col("cents") > F.col("nxt")),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("n_peaks"),
        F.sum(
            F.when(
                (F.col("cents") < F.col("prev"))
                & (F.col("cents") < F.col("nxt")),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("n_troughs"),
    )
    turning = F.col("n_peaks") + F.col("n_troughs")
    expected = 2.0 * (F.col("n") - 2) / 3.0
    return t.select(
        "n",
        "n_peaks",
        "n_troughs",
        turning.alias("n_turning"),
        F.round(expected, 4).alias("expected_turning"),
        F.round(
            (turning - expected)
            / F.sqrt((16.0 * F.col("n") - 29.0) / 90.0),
            4,
        ).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# Wave 120 (r5): technical-analysis window trio — Bollinger, RSI, VWAP.
# ---------------------------------------------------------------------------

_BOLL_N = 20
_RSI_N = 14


@register(
    "q_ts_bollinger",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS d,
                   SUM(CAST(value AS DECIMAL(18,2))) AS t,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1
        ),
        roll AS (
            SELECT d, t,
                   SUM(t) OVER w AS st,
                   SUM(t * t) OVER w AS st2,
                   CAST(COUNT(*) OVER w AS BIGINT) AS k
            FROM daily
            WINDOW w AS (ORDER BY d
                         ROWS BETWEEN {_BOLL_N - 1} PRECEDING
                         AND CURRENT ROW)
        )
        SELECT d,
               CAST(t AS DOUBLE) AS daily_total,
               ROUND(CAST(st AS DOUBLE) / k, 4) AS mid,
               ROUND(CAST(st AS DOUBLE) / k
                     - 2 * sqrt((CAST(st2 AS DOUBLE)
                                 - CAST(st AS DOUBLE)
                                   * CAST(st AS DOUBLE) / k) / k), 4)
                   AS lower_band,
               ROUND(CAST(st AS DOUBLE) / k
                     + 2 * sqrt((CAST(st2 AS DOUBLE)
                                 - CAST(st AS DOUBLE)
                                   * CAST(st AS DOUBLE) / k) / k), 4)
                   AS upper_band,
               CAST(CAST(t AS DOUBLE) > CAST(st AS DOUBLE) / k
                    + 2 * sqrt((CAST(st2 AS DOUBLE)
                                - CAST(st AS DOUBLE)
                                  * CAST(st AS DOUBLE) / k) / k)
                    AS BOOLEAN) AS breakout_up
        FROM roll WHERE k = {_BOLL_N}
    """,
    section="TS22",
    doc=f"Bollinger bands ({_BOLL_N}-day, 2-sigma) over the daily "
    "event-value total, with upper-band breakout flags — the "
    "rolling mean/volatility channel. The determinism device: the "
    "rolling frame sums DECIMALS (daily totals and their exact "
    "decimal squares), which are associative — immune to the "
    "different in-frame accumulation orders of Spark's running "
    "frames vs DuckDB's segment trees, where rolling DOUBLE sums "
    "would drift — and the population-variance identity "
    "(st2 - st^2/k)/k runs on the exact scalars. Warm-up rows "
    f"(fewer than {_BOLL_N} days) are excluded so every band is "
    "full-width. Scale: daily collapse first (map-combinable), "
    "then a date-ordered window over the day-grain spine (the events "
    "range is one month at test SF; a year of data is still only 365 "
    "spine rows) — the "
    "W24 spine device; the fact never enters the window.",
)
def q_ts_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.sum(dec2(F.col("value"))).alias("t"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    w = Window.orderBy("d").rowsBetween(-(_BOLL_N - 1), 0)
    roll = daily.select(
        "d",
        "t",
        F.sum("t").over(w).alias("st"),
        F.sum(F.col("t") * F.col("t")).over(w).alias("st2"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("k"),
    ).where(F.col("k") == _BOLL_N)
    st, st2, k = (
        F.col("st").cast("double"),
        F.col("st2").cast("double"),
        F.col("k"),
    )
    mid = st / k
    sd = F.sqrt((st2 - st * st / k) / k)
    return roll.select(
        "d",
        F.col("t").cast("double").alias("daily_total"),
        F.round(mid, 4).alias("mid"),
        F.round(mid - 2 * sd, 4).alias("lower_band"),
        F.round(mid + 2 * sd, 4).alias("upper_band"),
        (F.col("t").cast("double") > mid + 2 * sd).alias("breakout_up"),
    )


@register(
    "q_ts_rsi",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS d,
                   SUM(CAST(value AS DECIMAL(18,2))) AS t
            FROM events GROUP BY 1
        ),
        chg AS (
            SELECT d,
                   t - LAG(t) OVER (ORDER BY d) AS diff
            FROM daily
        ),
        gl AS (
            SELECT d,
                   SUM(CASE WHEN diff > 0 THEN diff
                            ELSE CAST(0 AS DECIMAL(18,2)) END) OVER w
                       AS gains,
                   SUM(CASE WHEN diff < 0 THEN -diff
                            ELSE CAST(0 AS DECIMAL(18,2)) END) OVER w
                       AS losses,
                   CAST(COUNT(diff) OVER w AS BIGINT) AS k
            FROM chg
            WINDOW w AS (ORDER BY d
                         ROWS BETWEEN {_RSI_N - 1} PRECEDING
                         AND CURRENT ROW)
        )
        SELECT d,
               ROUND(100 - 100 / (1 + CAST(gains AS DOUBLE)
                                      / CAST(losses AS DOUBLE)), 4)
                   AS rsi
        FROM gl
        WHERE k = {_RSI_N} AND losses > 0
    """,
    section="TS23",
    doc=f"Relative Strength Index ({_RSI_N}-day simple variant, "
    "Cutler's RSI): rolling sums of up-moves vs down-moves of the "
    "daily value total, RSI = 100 - 100/(1+RS). Cutler's "
    "simple-average form is chosen over Wilder's recursive "
    "smoothing deliberately: the recursion is inherently "
    "sequential (every value depends on the seed), while the "
    "simple form is a pair of ROLLING DECIMAL SUMS — exact, "
    "associative, frame-order-independent — so it parallelizes "
    "AND cross-engine-hashes. Day diffs are exact decimal "
    "differences; flat-only windows (losses=0) are excluded "
    "rather than emitting an engine-dependent infinity. Scale: "
    "same day-grain spine as TS22 — collapse first, window the "
    "day-grain spine.",
)
def q_ts_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.sum(dec2(F.col("value"))).alias("t")
    )
    w_lag = Window.orderBy("d")
    chg = daily.select(
        "d", (F.col("t") - F.lag("t").over(w_lag)).alias("diff")
    )
    zero = F.lit(0).cast("decimal(18,2)")
    w = Window.orderBy("d").rowsBetween(-(_RSI_N - 1), 0)
    gl = chg.select(
        "d",
        F.sum(
            F.when(F.col("diff") > 0, F.col("diff")).otherwise(zero)
        )
        .over(w)
        .alias("gains"),
        F.sum(
            F.when(F.col("diff") < 0, -F.col("diff")).otherwise(zero)
        )
        .over(w)
        .alias("losses"),
        F.count("diff").over(w).cast("bigint").alias("k"),
    )
    return gl.where(
        (F.col("k") == _RSI_N) & (F.col("losses") > 0)
    ).select(
        "d",
        F.round(
            100
            - 100
            / (
                1
                + F.col("gains").cast("double")
                / F.col("losses").cast("double")
            ),
            4,
        ).alias("rsi"),
    )


@register(
    "q_ts_vwap",
    oracle="""
        SELECT CAST(l_shipdate AS DATE) AS d,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   AS vwap,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   AS volume
        FROM lineitem
        GROUP BY 1
    """,
    section="TS24",
    doc="Daily volume-weighted average price over the lineitem fact: "
    "sum(price*qty)/sum(qty) per ship day — the execution-quality "
    "benchmark price, and the canonical weighted-mean-per-bucket "
    "aggregate. Numerator and denominator are exact DECIMAL sums "
    "(2dp x 2dp products), one IEEE division per day at the end — "
    "order-insensitive by construction, no window needed at all. "
    "Scale: purely map-combinable over ~2.4k day groups at any "
    "fact size; the shape AQE cannot make faster because it is "
    "already one exchange of 2.4k partial pairs.",
)
def q_ts_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = dec2(F.col("l_extendedprice"))
    q = dec2(F.col("l_quantity"))
    return li.groupBy(
        F.col("l_shipdate").cast("date").alias("d")
    ).agg(
        (F.sum(p * q).cast("double") / F.sum(q).cast("double")).alias(
            "vwap"
        ),
        F.sum(q).cast("double").alias("volume"),
    )


@register(
    "q_ts_cusum_reset",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS d,
                   SUM(CAST(value AS DECIMAL(18,2))) AS t
            FROM events GROUP BY 1
        ),
        tot AS (
            SELECT SUM(t) AS big_t,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM daily
        ),
        r AS (
            SELECT d,
                   SUM(tot.n * daily.t) OVER (ORDER BY d)
                   - tot.big_t
                     * CAST(row_number() OVER (ORDER BY d) AS BIGINT)
                       AS rr,
                   tot.n AS n
            FROM daily CROSS JOIN tot
        )
        SELECT d,
               ROUND(CAST(rr - MIN(rr) OVER (ORDER BY d) AS DOUBLE)
                     / n, 4) AS cusum_up,
               ROUND(CAST(MAX(rr) OVER (ORDER BY d) - rr AS DOUBLE)
                     / n, 4) AS cusum_down
        FROM r
    """,
    section="TS25",
    doc="Reset-at-zero CUSUM control chart over daily value totals, "
    "via the prefix-extremum closed form (TS10's per-user CUSUM "
    "tracks the UNRESET path; this is the one-sided resetting "
    "statistic the Page test actually uses): the textbook recursion "
    "S_t = max(0, S_{t-1} + x_t - mean) is inherently sequential, "
    "but it equals R_t - min_{j<=t} R_j for the drift-adjusted "
    "running sum R — so the 'unparallelizable' recursion becomes "
    "two ordered windows (cumsum + running min), with the "
    "symmetric running-max giving the downward CUSUM. The mean "
    "adjustment is division-free: R is scaled by n (n*t_j - T are "
    "exact DECIMAL terms), one double division at render. The "
    "same trick computes reset-at-zero inventory balances and "
    "max-drawdown — the recursion class that defeats naive window "
    "translation. Scale: day-grain spine windows (W24 device); "
    "the fact only feeds the map-combinable daily collapse.",
)
def q_ts_cusum_reset(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.sum(dec2(F.col("value"))).alias("t")
    )
    tot = daily.agg(
        F.sum("t").alias("big_t"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    w = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = daily.crossJoin(F.broadcast(tot)).select(
        "d",
        (
            F.sum(F.col("n") * F.col("t")).over(w)
            - F.col("big_t")
            * F.row_number().over(Window.orderBy("d")).cast("bigint")
        ).alias("rr"),
        "n",
    )
    return r.select(
        "d",
        F.round(
            (F.col("rr") - F.min("rr").over(w)).cast("double")
            / F.col("n"),
            4,
        ).alias("cusum_up"),
        F.round(
            (F.max("rr").over(w) - F.col("rr")).cast("double")
            / F.col("n"),
            4,
        ).alias("cusum_down"),
    )


_MP_M = 7  # subsequence length
_MP_TYPE = "click"


@register(
    "q_ts_matrix_profile",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS d,
                   SUM(CAST(value AS DECIMAL(18,2))) AS t
            FROM events
            WHERE event_type = '{_MP_TYPE}'
            GROUP BY 1
        ),
        idx AS (
            SELECT d, t,
                   CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i
            FROM daily
        ),
        win AS (
            SELECT i, d,
                   list(CAST(t AS DOUBLE)) OVER w AS v,
                   CAST(SUM(t) OVER w AS DOUBLE) AS s,
                   CAST(SUM(t * t) OVER w AS DOUBLE) AS s2,
                   CAST(COUNT(*) OVER w AS BIGINT) AS k
            FROM idx
            WINDOW w AS (ORDER BY i
                         ROWS BETWEEN CURRENT ROW
                         AND {_MP_M - 1} FOLLOWING)
        ),
        full_w AS (
            SELECT i, d, v, s / {_MP_M} AS mu,
                   sqrt(s2 / {_MP_M} - (s / {_MP_M}) * (s / {_MP_M}))
                       AS sd
            FROM win
            WHERE k = {_MP_M}
              AND s2 / {_MP_M} - (s / {_MP_M}) * (s / {_MP_M}) > 0
        ),
        pairs AS (
            SELECT a.i AS ai, a.d AS ad, b.i AS bi, b.d AS bd,
                   list_sum(list_transform(a.v, (x, n) ->
                       ((x - a.mu) / a.sd - (b.v[n] - b.mu) / b.sd)
                       * ((x - a.mu) / a.sd
                          - (b.v[n] - b.mu) / b.sd))) AS d2
            FROM full_w a JOIN full_w b
              ON abs(a.i - b.i) >= {_MP_M}
        )
        SELECT ad AS win_start,
               bd AS motif_start,
               ROUND(sqrt(d2), 4) AS profile_dist
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY ai ORDER BY d2, bi) AS rn
            FROM pairs
        ) WHERE rn = 1
    """,
    section="TS26",
    doc=f"Matrix profile (motif discovery) over the "
    f"'{_MP_TYPE}' daily series: for every {_MP_M}-day subsequence, "
    "the z-normalized Euclidean distance to its nearest "
    "NON-OVERLAPPING subsequence and where that motif partner "
    "starts — the UCR matrix-profile primitive behind motif/"
    "discord mining (a window whose profile distance is tiny has a "
    "repeated shape; a huge one is an anomaly/discord). Window "
    "means/variances come from exact DECIMAL rolling sums; the "
    "z-normalized fold runs in fixed array order on scalars both "
    "engines computed identically; argmin ties break on the "
    "partner index; zero-variance (flat) windows are excluded "
    "(z-normalization undefined). Scale: the series collapses to "
    "the day-grain spine FIRST, so the all-pairs stage is over "
    "~360 window rows (129k pairs), not the fact — and at a real "
    "100 TB deployment the pair stage swaps for the STOMP "
    "streaming-dot-product recurrence over the same spine, or "
    "D1-style banding over window sketches; the relational shape "
    "here is the exact-verification tier.",
)
def q_ts_matrix_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == _MP_TYPE
    )
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.sum(dec2(F.col("value"))).alias("t")
    )
    idx = daily.select(
        "d",
        "t",
        F.row_number().over(Window.orderBy("d")).cast("bigint").alias("i"),
    )
    wf = Window.orderBy("i").rowsBetween(0, _MP_M - 1)
    win = idx.select(
        "i",
        "d",
        F.collect_list(F.col("t").cast("double")).over(wf).alias("v"),
        F.sum("t").over(wf).cast("double").alias("s"),
        F.sum(F.col("t") * F.col("t")).over(wf).cast("double").alias("s2"),
        F.count(F.lit(1)).over(wf).cast("bigint").alias("k"),
    )
    var = F.col("s2") / _MP_M - (F.col("s") / _MP_M) * (
        F.col("s") / _MP_M
    )
    full_w = win.where((F.col("k") == _MP_M) & (var > 0)).select(
        "i",
        "d",
        "v",
        (F.col("s") / _MP_M).alias("mu"),
        F.sqrt(var).alias("sd"),
    )
    a = full_w.select(
        F.col("i").alias("ai"),
        F.col("d").alias("ad"),
        F.col("v").alias("av"),
        F.col("mu").alias("amu"),
        F.col("sd").alias("asd"),
    )
    b = full_w.select(
        F.col("i").alias("bi"),
        F.col("d").alias("bd"),
        F.col("v").alias("bv"),
        F.col("mu").alias("bmu"),
        F.col("sd").alias("bsd"),
    )
    diff = F.zip_with(
        F.col("av"),
        F.col("bv"),
        lambda x, y: (
            (x - F.col("amu")) / F.col("asd")
            - (y - F.col("bmu")) / F.col("bsd")
        )
        * (
            (x - F.col("amu")) / F.col("asd")
            - (y - F.col("bmu")) / F.col("bsd")
        ),
    )
    d2 = F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x)
    pairs = (
        a.join(b, F.abs(F.col("ai") - F.col("bi")) >= _MP_M)
        .select("ai", "ad", "bi", "bd", d2.alias("d2"))
    )
    return (
        pairs.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("ai").orderBy("d2", "bi")
            ),
        )
        .where(F.col("rn") == 1)
        .select(
            F.col("ad").alias("win_start"),
            F.col("bd").alias("motif_start"),
            F.round(F.sqrt("d2"), 4).alias("profile_dist"),
        )
    )


_SAX_SEG_DAYS = 5
_SAX_BP_LO, _SAX_BP_HI = -0.4307, 0.4307  # N(0,1) terciles


@register(
    "q_ts_sax_symbols",
    oracle=f"""
        WITH daily AS (
            SELECT event_type,
                   CAST(ts AS DATE) AS d,
                   SUM(CAST(value AS DECIMAL(18,2))) AS t
            FROM events GROUP BY 1, 2
        ),
        stats AS (
            SELECT event_type,
                   CAST(SUM(t) AS DOUBLE) / COUNT(*) AS mu,
                   sqrt(CAST(SUM(t * t) AS DOUBLE) / COUNT(*)
                        - (CAST(SUM(t) AS DOUBLE) / COUNT(*))
                          * (CAST(SUM(t) AS DOUBLE) / COUNT(*)))
                       AS sd,
                   MIN(d) AS d0
            FROM daily GROUP BY event_type
        ),
        paa AS (
            SELECT dl.event_type,
                   CAST(floor(date_diff('day', s.d0, dl.d)
                              / {_SAX_SEG_DAYS}) AS BIGINT) AS seg,
                   CAST(SUM(dl.t) AS DOUBLE) / COUNT(*) AS seg_mean,
                   MAX(s.mu) AS mu, MAX(s.sd) AS sd
            FROM daily dl JOIN stats s
              ON dl.event_type = s.event_type
            GROUP BY 1, 2
        )
        SELECT event_type, seg,
               CASE WHEN (seg_mean - mu) / sd < {_SAX_BP_LO} THEN 'a'
                    WHEN (seg_mean - mu) / sd < {_SAX_BP_HI} THEN 'b'
                    ELSE 'c' END AS sax_symbol,
               ROUND((seg_mean - mu) / sd, 4) AS seg_z
        FROM paa
    """,
    section="TS27",
    doc=f"SAX (Symbolic Aggregate approXimation) of each event type's "
    f"daily series: {_SAX_SEG_DAYS}-day PAA segment means, "
    "z-normalized per series, discretized at the N(0,1) tercile "
    "breakpoints (±0.4307) into a 3-letter alphabet — the "
    "time-series-mining front end that turns numeric streams into "
    "strings so TS26's motif search, the T-family's n-gram/chunk "
    "machinery, and the D-family's exact dedup can run on TIME "
    "SERIES (SAX's lower-bounding property is what makes that "
    "sound). Determinism: daily totals and their squares are "
    "exact decimals, so mu/sd/segment means are identical doubles "
    "cross-engine; the breakpoint CASE compares those identical "
    "doubles against exact literal constants; z is "
    "ROUND(4)-reported. Segment index is integer day arithmetic "
    "from the series' own first day. Scale: day-grain collapse, "
    "then a (type, segment)-grain aggregate — two map-combinable "
    "passes, no window at all.",
)
def q_ts_sax_symbols(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.sum(dec2(F.col("value"))).alias("t"))
    n = F.count(F.lit(1))
    stats = daily.groupBy("event_type").agg(
        (F.sum("t").cast("double") / n).alias("mu"),
        F.sqrt(
            F.sum(F.col("t") * F.col("t")).cast("double") / n
            - (F.sum("t").cast("double") / n)
            * (F.sum("t").cast("double") / n)
        ).alias("sd"),
        F.min("d").alias("d0"),
    )
    paa = (
        daily.join(F.broadcast(stats), "event_type")
        .groupBy(
            "event_type",
            F.floor(
                F.datediff(F.col("d"), F.col("d0")) / _SAX_SEG_DAYS
            )
            .cast("bigint")
            .alias("seg"),
        )
        .agg(
            (F.sum("t").cast("double") / F.count(F.lit(1))).alias(
                "seg_mean"
            ),
            F.max("mu").alias("mu"),
            F.max("sd").alias("sd"),
        )
    )
    z = (F.col("seg_mean") - F.col("mu")) / F.col("sd")
    return paa.select(
        "event_type",
        "seg",
        F.when(z < _SAX_BP_LO, "a")
        .when(z < _SAX_BP_HI, "b")
        .otherwise("c")
        .alias("sax_symbol"),
        F.round(z, 4).alias("seg_z"),
    )


@register(
    "q_ts_obv",
    oracle="""
        WITH daily AS (
            SELECT CAST(l_shipdate AS DATE) AS d,
                   SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                       * CAST(l_quantity AS DECIMAL(18,2))) AS pq,
                   SUM(CAST(l_quantity AS DECIMAL(18,2))) AS vol
            FROM lineitem GROUP BY 1
        ),
        chg AS (
            SELECT d, vol,
                   pq * LAG(vol) OVER (ORDER BY d)
                   - LAG(pq) OVER (ORDER BY d) * vol AS num
            FROM daily
        )
        SELECT d,
               CAST(SUM(CASE WHEN num > 0 THEN vol
                             WHEN num < 0 THEN -vol
                             ELSE CAST(0 AS DECIMAL(18,2)) END)
                    OVER (ORDER BY d) AS DOUBLE) AS obv
        FROM chg
    """,
    section="TS28",
    doc="On-balance volume over the daily lineitem tape: cumulative "
    "signed volume where the sign follows the day-over-day VWAP "
    "direction — the volume-flow confirmation indicator completing "
    "the TS22-24 TA family. The determinism device is the "
    "CROSS-MULTIPLIED comparison: 'vwap_t > vwap_{t-1}' is "
    "pq_t/vol_t > pq_prev/vol_prev, evaluated as "
    "pq_t*vol_prev - pq_prev*vol_t > 0 — EXACT decimal products, "
    "so the sign can never flip on a division ulp (volumes are "
    "positive, so the inequality direction is preserved); the "
    "running OBV is then a cumulative sum of exact decimal "
    "volumes — associative, frame-order-free. One cast to double "
    "at render. Scale: day-grain spine windows over the "
    "map-combinable daily collapse (the TS22 shape).",
)
def q_ts_obv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import dec2

    li = load_table(spark, sf_dir, "lineitem")
    p = dec2(F.col("l_extendedprice"))
    q = dec2(F.col("l_quantity"))
    daily = li.groupBy(
        F.col("l_shipdate").cast("date").alias("d")
    ).agg(
        F.sum(p * q).alias("pq"),
        F.sum(q).alias("vol"),
    )
    w = Window.orderBy("d")
    chg = daily.select(
        "d",
        "vol",
        (
            F.col("pq") * F.lag("vol").over(w)
            - F.lag("pq").over(w) * F.col("vol")
        ).alias("num"),
    )
    zero = F.lit(0).cast("decimal(18,2)")
    wc = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    signed = (
        F.when(F.col("num") > 0, F.col("vol"))
        .when(F.col("num") < 0, -F.col("vol"))
        .otherwise(zero)
    )
    return chg.select(
        "d", F.sum(signed).over(wc).cast("double").alias("obv")
    )


# ---------------------------------------------------------------------------
# Wave 132 (r5): oscillator pair — stochastic %K/%D and Aroon up/down.
# ---------------------------------------------------------------------------

_STO_N = 14
_STO_D = 3
_AROON_N = 10


@register(
    "q_ts_stochastic",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS d,
                   SUM(CAST(value AS DECIMAL(18,2))) AS t
            FROM events GROUP BY 1
        ),
        roll AS (
            SELECT d, t,
                   MIN(t) OVER w AS mn,
                   MAX(t) OVER w AS mx,
                   CAST(COUNT(*) OVER w AS BIGINT) AS k
            FROM daily
            WINDOW w AS (ORDER BY d
                         ROWS BETWEEN {_STO_N - 1} PRECEDING
                         AND CURRENT ROW)
        ),
        kline AS (
            SELECT d,
                   CAST(floor(CAST(t - mn AS DOUBLE) * 100
                              / CAST(mx - mn AS DOUBLE) * 1e8)
                        AS BIGINT) AS k_q8
            FROM roll WHERE k = {_STO_N} AND mx > mn
        ),
        dline AS (
            SELECT d, k_q8,
                   SUM(k_q8) OVER (ORDER BY d
                        ROWS BETWEEN {_STO_D - 1} PRECEDING
                        AND CURRENT ROW) AS s_q8,
                   CAST(COUNT(*) OVER (ORDER BY d
                        ROWS BETWEEN {_STO_D - 1} PRECEDING
                        AND CURRENT ROW) AS BIGINT) AS kd
            FROM kline
        )
        SELECT d,
               ROUND(CAST(k_q8 AS DOUBLE) / 1e8, 4) AS pct_k,
               ROUND(CAST(s_q8 AS DOUBLE) / {_STO_D}e8, 4) AS pct_d,
               CAST(k_q8 > 80 * CAST(1e8 AS BIGINT) AS BOOLEAN)
                   AS overbought
        FROM dline WHERE kd = {_STO_D}
    """,
    section="TS29",
    doc=f"Stochastic oscillator ({_STO_N}-day %K, {_STO_D}-day %D) over "
    "the daily event-value total: %K locates today inside the rolling "
    "high-low channel, %D smooths it — the classic momentum pair "
    "beside TS22's Bollinger channel. Determinism: rolling MIN/MAX of "
    "exact decimals are order-free; %K's single double expression "
    "(num*100/den) is pinned to the same op shape on both engines and "
    f"quantized floor(x*1e8)->BIGINT, so the %D smoothing is an "
    "INTEGER rolling sum (associative — immune to frame-accumulation "
    "order) with one final double division; the overbought flag "
    "compares quantized ints, so no boundary rides on a float. Scale: "
    "daily collapse first (map-combinable), windows over the day-grain "
    "spine only — the W24 spine device; the fact never enters a window.",
)
def q_ts_stochastic(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.sum(dec2(F.col("value"))).alias("t")
    )
    w = Window.orderBy("d").rowsBetween(-(_STO_N - 1), 0)
    roll = daily.select(
        "d",
        "t",
        F.min("t").over(w).alias("mn"),
        F.max("t").over(w).alias("mx"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("k"),
    ).where((F.col("k") == _STO_N) & (F.col("mx") > F.col("mn")))
    k_dbl = (
        (F.col("t") - F.col("mn")).cast("double")
        * 100
        / (F.col("mx") - F.col("mn")).cast("double")
    )
    kline = roll.select(
        "d",
        F.floor(k_dbl * F.lit(1e8)).cast("bigint").alias("k_q8"),
    )
    wd = Window.orderBy("d").rowsBetween(-(_STO_D - 1), 0)
    dline = kline.select(
        "d",
        "k_q8",
        F.sum("k_q8").over(wd).alias("s_q8"),
        F.count(F.lit(1)).over(wd).cast("bigint").alias("kd"),
    ).where(F.col("kd") == _STO_D)
    return dline.select(
        "d",
        F.round(F.col("k_q8").cast("double") / F.lit(1e8), 4).alias("pct_k"),
        F.round(
            F.col("s_q8").cast("double") / F.lit(float(_STO_D) * 1e8), 4
        ).alias("pct_d"),
        (F.col("k_q8") > F.lit(80 * 10**8)).alias("overbought"),
    )


@register(
    "q_ts_aroon",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS d,
                   SUM(CAST(value AS DECIMAL(18,2))) AS t
            FROM events GROUP BY 1
        ),
        spine AS (
            SELECT d, t,
                   CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS rn
            FROM daily
        ),
        win AS (
            SELECT a.d, a.rn AS rn_a, b.rn AS rn_b, b.t AS bt
            FROM spine a JOIN spine b
              ON b.rn BETWEEN a.rn - {_AROON_N - 1} AND a.rn
            WHERE a.rn >= {_AROON_N}
        ),
        hi AS (
            SELECT d, rn_a - rn_b AS since_high FROM (
                SELECT d, rn_a, rn_b, ROW_NUMBER() OVER (
                    PARTITION BY d ORDER BY bt DESC, rn_b DESC) AS r
                FROM win
            ) WHERE r = 1
        ),
        lo AS (
            SELECT d, rn_a - rn_b AS since_low FROM (
                SELECT d, rn_a, rn_b, ROW_NUMBER() OVER (
                    PARTITION BY d ORDER BY bt ASC, rn_b DESC) AS r
                FROM win
            ) WHERE r = 1
        )
        SELECT hi.d,
               CAST(since_high AS BIGINT) AS days_since_high,
               CAST(since_low AS BIGINT) AS days_since_low,
               CAST(({_AROON_N} - since_high) * (100 / {_AROON_N})
                    AS DOUBLE) AS aroon_up,
               CAST(({_AROON_N} - since_low) * (100 / {_AROON_N})
                    AS DOUBLE) AS aroon_down
        FROM hi JOIN lo USING (d)
    """,
    section="TS30",
    doc=f"Aroon indicator ({_AROON_N}-day): positions of the rolling "
    "high and low inside the lookback window, scaled to [0,100] — the "
    "trend-age gauge (fresh high => aroon_up 100). The rolling ARGMAX "
    "is a windowed MAX OVER STRUCTS on the Spark side — max(struct(t, "
    "rn)) is lexicographic, so ties on the exact decimal total break "
    "to the MORE RECENT row; argmin uses max(struct(-t, rn)) for the "
    "same recency tie-break; the oracle mirrors both with fully "
    "tie-broken row_numbers over a positional self-join (ROWS "
    "semantics pinned on both engines — no calendar-gap divergence). "
    f"All-integer outputs (100/{_AROON_N} is integral) => exact. "
    "Scale: windows run on the day-grain spine; at 100 TB the spine "
    "is still only one row per day — the W24 device.",
)
def q_ts_aroon(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.sum(dec2(F.col("value"))).alias("t")
    )
    spine = daily.withColumn(
        "rn", F.row_number().over(Window.orderBy("d")).cast("bigint")
    )
    w = Window.orderBy("rn").rowsBetween(-(_AROON_N - 1), 0)
    hi_rn = F.max(F.struct(F.col("t"), F.col("rn"))).over(w).getField("rn")
    lo_rn = (
        F.max(F.struct((-F.col("t")).alias("nt"), F.col("rn")))
        .over(w)
        .getField("rn")
    )
    scale = 100 // _AROON_N
    out = (
        spine.withColumn("hi_rn", hi_rn)
        .withColumn("lo_rn", lo_rn)
        .where(F.col("rn") >= _AROON_N)
    )
    since_high = F.col("rn") - F.col("hi_rn")
    since_low = F.col("rn") - F.col("lo_rn")
    return out.select(
        "d",
        since_high.alias("days_since_high"),
        since_low.alias("days_since_low"),
        ((F.lit(_AROON_N) - since_high) * F.lit(scale))
        .cast("double")
        .alias("aroon_up"),
        ((F.lit(_AROON_N) - since_low) * F.lit(scale))
        .cast("double")
        .alias("aroon_down"),
    )


# ---------------------------------------------------------------------------
# Wave 134b (r5): ulcer index — RMS drawdown.
# ---------------------------------------------------------------------------

_ULCER_N = 14


@register(
    "q_ts_ulcer",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS d,
                   SUM(CAST(value AS DECIMAL(18,2))) AS t
            FROM events GROUP BY 1
        ),
        dd AS (
            SELECT d,
                   CAST(floor(CAST(t - rm AS DOUBLE) * 100
                              / CAST(rm AS DOUBLE) * 1e4)
                        AS BIGINT) AS dd_q4
            FROM (
                SELECT d, t,
                       MAX(t) OVER (ORDER BY d
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS rm
                FROM daily
            )
        ),
        roll AS (
            SELECT d, dd_q4,
                   SUM(dd_q4 * dd_q4) OVER w AS s2,
                   CAST(COUNT(*) OVER w AS BIGINT) AS k
            FROM dd
            WINDOW w AS (ORDER BY d
                         ROWS BETWEEN {_ULCER_N - 1} PRECEDING
                         AND CURRENT ROW)
        )
        SELECT d,
               ROUND(CAST(dd_q4 AS DOUBLE) / 1e4, 4) AS drawdown_pct,
               ROUND(sqrt(CAST(s2 AS DOUBLE) / {_ULCER_N}) / 1e4, 4)
                   AS ulcer_index
        FROM roll WHERE k = {_ULCER_N}
    """,
    section="TS31",
    doc=f"Ulcer index ({_ULCER_N}-day): root-mean-square of the percent "
    "drawdown from the RUNNING all-time high of the daily event-value "
    "total — the depth-AND-duration risk gauge where TS-family "
    "max_drawdown reports only the single worst dip. Determinism: the "
    "running max is a decimal extremum (order-free); the drawdown "
    "percent is ONE pinned double expression quantized floor(x*1e4) -> "
    "BIGINT, so the rolling mean-of-squares is an INTEGER window sum "
    "(q4^2 <= 1e12, x14 — far under int64), and sqrt is IEEE "
    "correctly-rounded on both engines; one /1e4 descale at the end. "
    "Scale: daily collapse first, windows over the day-grain spine — "
    "the W24 device; the fact never enters a window.",
)
def q_ts_ulcer(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.sum(dec2(F.col("value"))).alias("t")
    )
    w_run = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    dd = daily.select(
        "d",
        F.floor(
            (F.col("t") - F.max("t").over(w_run)).cast("double")
            * 100
            / F.max("t").over(w_run).cast("double")
            * F.lit(1e4)
        )
        .cast("bigint")
        .alias("dd_q4"),
    )
    w = Window.orderBy("d").rowsBetween(-(_ULCER_N - 1), 0)
    roll = dd.select(
        "d",
        "dd_q4",
        F.sum(F.col("dd_q4") * F.col("dd_q4")).over(w).alias("s2"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("k"),
    ).where(F.col("k") == _ULCER_N)
    return roll.select(
        "d",
        F.round(F.col("dd_q4").cast("double") / F.lit(1e4), 4).alias(
            "drawdown_pct"
        ),
        F.round(
            F.sqrt(F.col("s2").cast("double") / F.lit(float(_ULCER_N)))
            / F.lit(1e4),
            4,
        ).alias("ulcer_index"),
    )


# ---------------------------------------------------------------------------
# Wave 137b (r5): binary segmentation — two-level changepoint tree.
# ---------------------------------------------------------------------------


@register(
    "q_ts_binseg",
    oracle=f"""
        WITH daily AS MATERIALIZED (
            SELECT o_orderdate AS day,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) // 100000 AS v
            FROM orders GROUP BY o_orderdate
        ),
        cum AS MATERIALIZED (
            SELECT day, v,
                   row_number() OVER w AS t,
                   COUNT(*) OVER () AS n,
                   CAST(SUM(v) OVER w AS BIGINT) AS cs,
                   CAST(SUM(v * v) OVER w AS BIGINT) AS cq,
                   CAST(SUM(v) OVER () AS BIGINT) AS ts,
                   CAST(SUM(v * v) OVER () AS BIGINT) AS tq
            FROM daily
            WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)
        ),
        best1 AS MATERIALIZED (
            SELECT t AS k, day AS kday, cs AS kcs, cq AS kcq, n, ts, tq
            FROM cum
            WHERE t >= {_CP_MINSEG} AND t <= n - {_CP_MINSEG}
            ORDER BY CAST(cq AS DOUBLE)
                     - CAST(cs AS DOUBLE) * CAST(cs AS DOUBLE) / t
                     + (CAST(tq AS DOUBLE) - CAST(cq AS DOUBLE))
                     - (CAST(ts AS DOUBLE) - CAST(cs AS DOUBLE))
                       * (CAST(ts AS DOUBLE) - CAST(cs AS DOUBLE))
                       / (n - t),
                     day
            LIMIT 1
        ),
        root AS (
            SELECT 'root' AS segment, b.kday AS split_day,
                   CAST(b.k AS BIGINT) AS n_left,
                   CAST(b.n - b.k AS BIGINT) AS n_right,
                   ROUND(CAST(b.kcq AS DOUBLE)
                         - CAST(b.kcs AS DOUBLE) * CAST(b.kcs AS DOUBLE)
                           / b.k
                         + (CAST(b.tq AS DOUBLE) - CAST(b.kcq AS DOUBLE))
                         - (CAST(b.ts AS DOUBLE) - CAST(b.kcs AS DOUBLE))
                           * (CAST(b.ts AS DOUBLE) - CAST(b.kcs AS DOUBLE))
                           / (b.n - b.k), 4) AS sse_split,
                   ROUND(CAST(b.tq AS DOUBLE)
                         - CAST(b.ts AS DOUBLE) * CAST(b.ts AS DOUBLE)
                           / b.n, 4) AS sse_single
            FROM best1 b
        ),
        lft AS (
            SELECT 'left' AS segment, c.day AS split_day,
                   CAST(c.t AS BIGINT) AS n_left,
                   CAST(b.k - c.t AS BIGINT) AS n_right,
                   ROUND(CAST(c.cq AS DOUBLE)
                         - CAST(c.cs AS DOUBLE) * CAST(c.cs AS DOUBLE)
                           / c.t
                         + (CAST(b.kcq - c.cq AS DOUBLE))
                         - CAST(b.kcs - c.cs AS DOUBLE)
                           * CAST(b.kcs - c.cs AS DOUBLE)
                           / (b.k - c.t), 4) AS sse_split,
                   ROUND(CAST(b.kcq AS DOUBLE)
                         - CAST(b.kcs AS DOUBLE) * CAST(b.kcs AS DOUBLE)
                           / b.k, 4) AS sse_single
            FROM cum c CROSS JOIN best1 b
            WHERE c.t >= {_CP_MINSEG} AND c.t <= b.k - {_CP_MINSEG}
            ORDER BY CAST(c.cq AS DOUBLE)
                     - CAST(c.cs AS DOUBLE) * CAST(c.cs AS DOUBLE) / c.t
                     + (CAST(b.kcq - c.cq AS DOUBLE))
                     - CAST(b.kcs - c.cs AS DOUBLE)
                       * CAST(b.kcs - c.cs AS DOUBLE) / (b.k - c.t),
                     c.day
            LIMIT 1
        ),
        rgt AS (
            SELECT 'right' AS segment, c.day AS split_day,
                   CAST(c.t - b.k AS BIGINT) AS n_left,
                   CAST(b.n - c.t AS BIGINT) AS n_right,
                   ROUND(CAST(c.cq - b.kcq AS DOUBLE)
                         - CAST(c.cs - b.kcs AS DOUBLE)
                           * CAST(c.cs - b.kcs AS DOUBLE) / (c.t - b.k)
                         + (CAST(b.tq - c.cq AS DOUBLE))
                         - CAST(b.ts - c.cs AS DOUBLE)
                           * CAST(b.ts - c.cs AS DOUBLE)
                           / (b.n - c.t), 4) AS sse_split,
                   ROUND(CAST(b.tq - b.kcq AS DOUBLE)
                         - CAST(b.ts - b.kcs AS DOUBLE)
                           * CAST(b.ts - b.kcs AS DOUBLE)
                           / (b.n - b.k), 4) AS sse_single
            FROM cum c CROSS JOIN best1 b
            WHERE c.t >= b.k + {_CP_MINSEG} AND c.t <= b.n - {_CP_MINSEG}
            ORDER BY CAST(c.cq - b.kcq AS DOUBLE)
                     - CAST(c.cs - b.kcs AS DOUBLE)
                       * CAST(c.cs - b.kcs AS DOUBLE) / (c.t - b.k)
                     + (CAST(b.tq - c.cq AS DOUBLE))
                     - CAST(b.ts - c.cs AS DOUBLE)
                       * CAST(b.ts - c.cs AS DOUBLE) / (b.n - c.t),
                     c.day
            LIMIT 1
        )
        SELECT * FROM root
        UNION ALL SELECT * FROM lft
        UNION ALL SELECT * FROM rgt
    """,
    section="TS32",
    doc="Binary segmentation, two levels: TS11's single change-point "
    "argmin, then the best sub-split INSIDE each resulting segment — "
    "the classic top-down multiple-changepoint tree (up to 3 splits / "
    "4 segments), each row reporting the segment's 2-way split SSE "
    "against its unsplit SSE so the reduction is readable. The key "
    "algebra: a sub-segment's prefix moments are DIFFERENCES of the "
    "GLOBAL prefix moments (cs(t)-cs(k), cq(t)-cq(k)), so level 2 "
    "costs no new window pass — one cross join against the 1-row "
    "level-1 winner. Inherits TS11's exactness device (whole-k$ "
    "BIGINT moments, exact int->double casts, ties to earlier day); "
    "sub-segments shorter than the min length yield no row (pinned "
    "on both engines). Scale: the windows run once on the day-grain "
    "spine; both argmins are TakeOrdered(1), not full sorts.",
)
def q_ts_binseg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.expr(
            "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)"
            " DIV 100000"
        ).alias("v")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = daily.select(
        "day",
        F.row_number().over(Window.orderBy("day")).alias("t"),
        F.count("*").over(wall).alias("n"),
        F.sum("v").over(w).alias("cs"),
        F.sum(F.col("v") * F.col("v")).over(w).alias("cq"),
        F.sum("v").over(wall).alias("ts"),
        F.sum(F.col("v") * F.col("v")).over(wall).alias("tq"),
    ).localCheckpoint(eager=False)

    def _sse(cs, cq, nn):
        return cq.cast("double") - cs.cast("double") * cs.cast(
            "double"
        ) / nn.cast("double")

    root_cost = cum.where(
        (F.col("t") >= _CP_MINSEG) & (F.col("t") <= F.col("n") - _CP_MINSEG)
    ).select(
        "day",
        "t",
        "n",
        "cs",
        "cq",
        "ts",
        "tq",
        (
            _sse(F.col("cs"), F.col("cq"), F.col("t"))
            + _sse(
                F.col("ts") - F.col("cs"),
                F.col("tq") - F.col("cq"),
                F.col("n") - F.col("t"),
            )
        ).alias("sse"),
    )
    best1 = (
        root_cost.orderBy("sse", "day")
        .limit(1)
        .select(
            F.col("t").alias("k"),
            F.col("day").alias("kday"),
            F.col("cs").alias("kcs"),
            F.col("cq").alias("kcq"),
            F.col("n").alias("bn"),
            F.col("ts").alias("bts"),
            F.col("tq").alias("btq"),
            F.col("sse").alias("root_sse"),
        )
    )
    root = best1.select(
        F.lit("root").alias("segment"),
        F.col("kday").alias("split_day"),
        F.col("k").cast("bigint").alias("n_left"),
        (F.col("bn") - F.col("k")).cast("bigint").alias("n_right"),
        F.round(F.col("root_sse"), 4).alias("sse_split"),
        F.round(_sse(F.col("bts"), F.col("btq"), F.col("bn")), 4).alias(
            "sse_single"
        ),
    )
    joined = cum.crossJoin(F.broadcast(best1))
    lft_cost = joined.where(
        (F.col("t") >= _CP_MINSEG) & (F.col("t") <= F.col("k") - _CP_MINSEG)
    ).select(
        "day",
        "t",
        "k",
        "kcs",
        "kcq",
        (
            _sse(F.col("cs"), F.col("cq"), F.col("t"))
            + _sse(
                F.col("kcs") - F.col("cs"),
                F.col("kcq") - F.col("cq"),
                F.col("k") - F.col("t"),
            )
        ).alias("sse2"),
    )
    lft = (
        lft_cost.orderBy("sse2", "day")
        .limit(1)
        .select(
            F.lit("left").alias("segment"),
            F.col("day").alias("split_day"),
            F.col("t").cast("bigint").alias("n_left"),
            (F.col("k") - F.col("t")).cast("bigint").alias("n_right"),
            F.round(F.col("sse2"), 4).alias("sse_split"),
            F.round(_sse(F.col("kcs"), F.col("kcq"), F.col("k")), 4).alias(
                "sse_single"
            ),
        )
    )
    rgt_cost = joined.where(
        (F.col("t") >= F.col("k") + _CP_MINSEG)
        & (F.col("t") <= F.col("bn") - _CP_MINSEG)
    ).select(
        "day",
        "t",
        "k",
        "bn",
        "kcs",
        "kcq",
        "bts",
        "btq",
        (
            _sse(
                F.col("cs") - F.col("kcs"),
                F.col("cq") - F.col("kcq"),
                F.col("t") - F.col("k"),
            )
            + _sse(
                F.col("bts") - F.col("cs"),
                F.col("btq") - F.col("cq"),
                F.col("bn") - F.col("t"),
            )
        ).alias("sse2"),
    )
    rgt = (
        rgt_cost.orderBy("sse2", "day")
        .limit(1)
        .select(
            F.lit("right").alias("segment"),
            F.col("day").alias("split_day"),
            (F.col("t") - F.col("k")).cast("bigint").alias("n_left"),
            (F.col("bn") - F.col("t")).cast("bigint").alias("n_right"),
            F.round(F.col("sse2"), 4).alias("sse_split"),
            F.round(
                _sse(
                    F.col("bts") - F.col("kcs"),
                    F.col("btq") - F.col("kcq"),
                    F.col("bn") - F.col("k"),
                ),
                4,
            ).alias("sse_single"),
        )
    )
    return root.unionByName(lft).unionByName(rgt)


# ---------------------------------------------------------------------------
# Wave 139a (r5): seasonal Mann-Kendall — deseasonalized trend test.
# ---------------------------------------------------------------------------


@register(
    "q_ts_seasonal_mann_kendall",
    oracle="""
        WITH monthly AS (
            SELECT date_part('month', o_orderdate) AS season,
                   date_part('year', o_orderdate) AS yr,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) AS cents
            FROM orders GROUP BY 1, 2
        ),
        s AS (
            SELECT CAST(SUM(CASE WHEN b.cents > a.cents THEN 1
                                 WHEN b.cents < a.cents THEN -1
                                 ELSE 0 END) AS BIGINT) AS s_stat
            FROM monthly a JOIN monthly b
              ON a.season = b.season AND b.yr > a.yr
        ),
        v AS (
            SELECT CAST(SUM(n * (n - 1) * (2 * n + 5)) AS BIGINT) AS var18,
                   CAST(COUNT(*) AS BIGINT) AS n_seasons,
                   CAST(SUM(n) AS BIGINT) AS n_points
            FROM (SELECT season, CAST(COUNT(*) AS BIGINT) AS n
                  FROM monthly GROUP BY season)
        ),
        t AS (
            SELECT CAST(COALESCE(SUM(c * (c - 1) * (2 * c + 5)), 0)
                        AS BIGINT) AS tie_term
            FROM (SELECT season, cents, CAST(COUNT(*) AS BIGINT) AS c
                  FROM monthly GROUP BY season, cents)
            WHERE c > 1
        )
        SELECT v.n_seasons, v.n_points, s.s_stat,
               ROUND((CAST(s.s_stat AS DOUBLE)
                      - CAST(sign(s.s_stat) AS DOUBLE))
                     / sqrt((CAST(v.var18 AS DOUBLE)
                             - CAST(t.tie_term AS DOUBLE)) / 18.0), 4) AS z
        FROM s CROSS JOIN v CROSS JOIN t
    """,
    section="TS33",
    doc="Seasonal Mann-Kendall (Hirsch-Slack): TS17's monotone-trend "
    "test computed WITHIN each calendar month across years, then "
    "pooled — the standard fix when annual seasonality would otherwise "
    "masquerade as (or mask) a trend, since only same-season pairs are "
    "ever compared. S' = sum of per-season S statistics; Var = sum of "
    "per-season tie-corrected variances (independence across seasons); "
    "continuity-corrected z. All-integer S' on exact BIGINT-cent "
    "(month, year) sums, one IEEE z formula. Scale: the pair join is "
    "per-season |years|^2 on the month-grain spine — bounded at any "
    "corpus size; the inversion-count form applies per season at long "
    "horizons.",
)
def q_ts_seasonal_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.month("o_orderdate").alias("season"),
        F.year("o_orderdate").alias("yr"),
    ).agg(
        F.expr(
            "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)"
        ).alias("cents")
    ).localCheckpoint(eager=False)
    a = monthly.select("season", F.col("yr").alias("ya"), F.col("cents").alias("ca"))
    b = monthly.select(
        F.col("season").alias("sb"), F.col("yr").alias("yb"), F.col("cents").alias("cb")
    )
    s = (
        a.join(b, (F.col("season") == F.col("sb")) & (F.col("yb") > F.col("ya")))
        .agg(
            F.sum(
                F.when(F.col("cb") > F.col("ca"), 1)
                .when(F.col("cb") < F.col("ca"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("s_stat")
        )
    )
    per_season = monthly.groupBy("season").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    v = per_season.agg(
        F.sum(
            F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
        )
        .cast("bigint")
        .alias("var18"),
        F.count(F.lit(1)).cast("bigint").alias("n_seasons"),
        F.sum("n").cast("bigint").alias("n_points"),
    )
    ties = (
        monthly.groupBy("season", "cents")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .where(F.col("c") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("c") * (F.col("c") - 1) * (2 * F.col("c") + 5)),
                F.lit(0),
            )
            .cast("bigint")
            .alias("tie_term")
        )
    )
    out = s.crossJoin(F.broadcast(v)).crossJoin(F.broadcast(ties))
    z = (
        F.col("s_stat").cast("double")
        - F.signum(F.col("s_stat").cast("double"))
    ) / F.sqrt(
        (F.col("var18").cast("double") - F.col("tie_term").cast("double"))
        / F.lit(18.0)
    )
    return out.select(
        "n_seasons", "n_points", "s_stat", F.round(z, 4).alias("z")
    )


# ---------------------------------------------------------------------------
# Wave 143 (r5): interrupted time series + cross-sectional factor backtest.
# ---------------------------------------------------------------------------

_ITS_CUT_M = 36  # (1998 - 1995) * 12: months since 1995-01


@register(
    "q_ts_intervention",
    oracle=f"""
        WITH monthly AS (
            SELECT (date_part('year', o_orderdate) - 1995) * 12
                   + date_part('month', o_orderdate) - 1 AS m,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) AS cents
            FROM orders GROUP BY 1
        ),
        seg AS (
            SELECT CASE WHEN m < {_ITS_CUT_M} THEN 0 ELSE 1 END AS post,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(m) AS BIGINT) AS st,
                   CAST(SUM(cents) AS BIGINT) AS sy,
                   CAST(SUM(m * m) AS BIGINT) AS stt,
                   CAST(SUM(m * cents) AS BIGINT) AS sty
            FROM monthly GROUP BY 1
        ),
        fits AS (
            SELECT post, n,
                   (CAST(n AS DOUBLE) * sty
                    - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (CAST(n AS DOUBLE) * stt
                      - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)) AS slope,
                   (CAST(sy AS DOUBLE)
                    - (CAST(n AS DOUBLE) * sty
                       - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE))
                      / (CAST(n AS DOUBLE) * stt
                         - CAST(st AS DOUBLE) * CAST(st AS DOUBLE))
                      * CAST(st AS DOUBLE))
                   / CAST(n AS DOUBLE) AS intercept
            FROM seg
        )
        SELECT pre.n AS n_pre, post.n AS n_post,
               ROUND(pre.slope, 4) AS slope_pre,
               ROUND(post.slope, 4) AS slope_post,
               ROUND((post.intercept + post.slope * {_ITS_CUT_M})
                     - (pre.intercept + pre.slope * {_ITS_CUT_M}), 4)
                   AS level_change,
               ROUND(post.slope - pre.slope, 4) AS slope_change
        FROM (SELECT * FROM fits WHERE post = 0) pre
        CROSS JOIN (SELECT * FROM fits WHERE post = 1) post
    """,
    section="TS34",
    doc="Interrupted time series (segmented regression) around the "
    f"1998-01 cut: separate OLS lines on the pre and post monthly "
    "revenue segments, reporting the LEVEL jump at the cut and the "
    "SLOPE change — the single-series sibling of A122's DiD (no "
    "control group; identification rides on the pre-trend). Fully "
    "interacted two-line form == the textbook [1, t, post, "
    "post*(t-t0)] regression, but two 2x2 closed forms need no 4x4 "
    "Cramer. All moments are exact BIGINTs on the month spine "
    "(m*cents far under int64 at any SF); slopes/intercepts/"
    "contrasts are pinned IEEE expressions. Scale: one month-grain "
    "agg (map-combinable), a 2-row fit, a 1x1 cross join.",
)
def q_ts_intervention(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    mo = (F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate") - 1
    monthly = orders.groupBy(mo.alias("m")).agg(
        F.expr(
            "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)"
        ).alias("cents")
    )
    seg = monthly.groupBy(
        F.when(F.col("m") < _ITS_CUT_M, 0).otherwise(1).alias("post")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("m").cast("bigint").alias("st"),
        F.sum("cents").cast("bigint").alias("sy"),
        F.sum(F.col("m") * F.col("m")).cast("bigint").alias("stt"),
        F.sum(F.col("m") * F.col("cents")).cast("bigint").alias("sty"),
    )
    nd = F.col("n").cast("double")
    st = F.col("st").cast("double")
    sy = F.col("sy").cast("double")
    slope = (nd * F.col("sty") - st * sy) / (
        nd * F.col("stt") - st * st
    )
    intercept = (sy - slope * st) / nd
    fits = seg.select(
        "post", "n", slope.alias("slope"), intercept.alias("intercept")
    )
    pre = fits.where(F.col("post") == 0).select(
        F.col("n").alias("n_pre"),
        F.col("slope").alias("slope_pre"),
        F.col("intercept").alias("i_pre"),
    )
    post = fits.where(F.col("post") == 1).select(
        F.col("n").alias("n_post"),
        F.col("slope").alias("slope_post"),
        F.col("intercept").alias("i_post"),
    )
    return pre.crossJoin(post).select(
        "n_pre",
        "n_post",
        F.round("slope_pre", 4).alias("slope_pre"),
        F.round("slope_post", 4).alias("slope_post"),
        F.round(
            (F.col("i_post") + F.col("slope_post") * _ITS_CUT_M)
            - (F.col("i_pre") + F.col("slope_pre") * _ITS_CUT_M),
            4,
        ).alias("level_change"),
        F.round(F.col("slope_post") - F.col("slope_pre"), 4).alias(
            "slope_change"
        ),
    )


# ---------------------------------------------------------------------------
# Wave 147a (r5): inter-event burstiness.
# ---------------------------------------------------------------------------


@register(
    "q_ts_interevent_burstiness",
    oracle="""
        WITH ordered AS (
            SELECT event_type,
                   CAST(epoch_us(ts) AS BIGINT) AS us,
                   event_id
            FROM events
        ),
        gaps AS (
            SELECT event_type,
                   (us - LAG(us) OVER (
                       PARTITION BY event_type
                       ORDER BY us, event_id)) // 1000 AS gap
            FROM ordered
        ),
        s AS (
            SELECT event_type,
                   CAST(COUNT(gap) AS BIGINT) AS n,
                   CAST(SUM(gap) AS BIGINT) AS s1,
                   CAST(SUM(gap * gap) AS BIGINT) AS s2
            FROM gaps WHERE gap IS NOT NULL
            GROUP BY event_type
        )
        SELECT event_type, n,
               ROUND(CAST(s1 AS DOUBLE) / n, 4) AS mean_gap_ms,
               ROUND(sqrt((CAST(n AS DOUBLE) * s2
                           - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                          / (CAST(n AS DOUBLE) * n)), 4) AS sd_gap_ms,
               ROUND((sqrt((CAST(n AS DOUBLE) * s2
                            - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                           / (CAST(n AS DOUBLE) * n))
                      - CAST(s1 AS DOUBLE) / n)
                     / (sqrt((CAST(n AS DOUBLE) * s2
                              - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                             / (CAST(n AS DOUBLE) * n))
                        + CAST(s1 AS DOUBLE) / n), 6) AS burstiness
        FROM s
    """,
    section="TS35",
    doc="Inter-event burstiness (Goh-Barabasi) per event type: "
    "B = (sigma - mu)/(sigma + mu) of the INTER-ARRIVAL times — "
    "B -> -1 for a metronome, 0 for a Poisson process, -> +1 for "
    "heavy-tailed bursts; the arrival-process fingerprint that decides "
    "queue sizing and rate-limit design, where TS-family counts "
    "(active_users, heatmaps) only see volume. Distinct from L-family "
    "TOKEN burstiness (word clustering in text) — this is the "
    "temporal point process. Gaps are exact integer MILLISECOND "
    "differences (epoch-micros BIGINTs, integer-divided — the ts "
    "carries sub-second precision, where a seconds cast ROUNDS in "
    "DuckDB but TRUNCATES in Spark) under a tie-broken (us, "
    "event_id) order; "
    "moments are BIGINTs (population sigma via the n*s2 - s1^2 "
    "identity), B is one pinned IEEE expression. Scale: per-type "
    "partitioned window + a map-combinable moment agg.",
)
def q_ts_interevent_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ordered = ev.select(
        "event_type",
        F.unix_micros("ts").cast("bigint").alias("us"),
        "event_id",
    )
    w = Window.partitionBy("event_type").orderBy("us", "event_id")
    gaps = ordered.select(
        "event_type",
        F.expr("(us - LAG(us) OVER (PARTITION BY event_type "
               "ORDER BY us, event_id)) DIV 1000").alias("gap"),
    ).where(F.col("gap").isNotNull())
    s = gaps.groupBy("event_type").agg(
        F.count("gap").cast("bigint").alias("n"),
        F.sum("gap").cast("bigint").alias("s1"),
        F.sum(F.col("gap") * F.col("gap")).cast("bigint").alias("s2"),
    )
    nd = F.col("n").cast("double")
    s1 = F.col("s1").cast("double")
    mu = s1 / F.col("n")
    sd = F.sqrt((nd * F.col("s2") - s1 * s1) / (nd * F.col("n")))
    return s.select(
        "event_type",
        "n",
        F.round(mu, 4).alias("mean_gap_ms"),
        F.round(sd, 4).alias("sd_gap_ms"),
        F.round((sd - mu) / (sd + mu), 6).alias("burstiness"),
    )


# ---------------------------------------------------------------------------
# Wave 154a (r5): Haar wavelet energy decomposition.
# ---------------------------------------------------------------------------

_HAAR_N = 16  # last 16 days: 4 dyadic levels


def _haar_levels_sql() -> str:
    ctes = ["""
        daily AS (
            SELECT CAST(ts AS DATE) AS d,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
                       AS cents
            FROM events GROUP BY 1
        ),
        lvl0 AS (
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS i,
                   cents AS s
            FROM (
                SELECT d, cents,
                       ROW_NUMBER() OVER (ORDER BY d DESC) AS rdesc
                FROM daily
            ) WHERE rdesc <= 16
        )"""]
    rows = []
    for k in range(1, 5):
        ctes.append(f"""
        lvl{k} AS (
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY grp) AS BIGINT) AS i,
                   ssum AS s, sdiff AS dd
            FROM (
                SELECT (i - 1) // 2 AS grp,
                       CAST(SUM(s) AS BIGINT) AS ssum,
                       CAST(SUM(CASE WHEN i % 2 = 1 THEN s
                                     ELSE -s END) AS BIGINT) AS sdiff
                FROM lvl{k - 1} GROUP BY (i - 1) // 2
            )
        )""")
        rows.append(
            f"SELECT CAST({k} AS BIGINT) AS level,"
            f" CAST(COUNT(*) AS BIGINT) AS n_coeffs,"
            f" CAST(SUM(dd * dd) AS BIGINT) AS raw_energy,"
            f" CAST(SUM(dd * dd) AS DOUBLE) / {2 ** k} AS energy"
            f" FROM lvl{k}"
        )
    return "WITH " + ",".join(ctes) + " " + " UNION ALL ".join(rows)


@register(
    "q_ts_haar_energy",
    oracle=f"""
        WITH lv AS ({_haar_levels_sql()})
        SELECT level, n_coeffs, raw_energy,
               ROUND(energy, 4) AS energy,
               ROUND(energy / SUM(energy) OVER (), 6) AS energy_share
        FROM lv
    """,
    section="TS36",
    doc=f"Haar wavelet energy decomposition of the last {_HAAR_N} days "
    "of daily event value: four dyadic detail levels (2-day, 4-day, "
    "8-day, 16-day structure), each level's energy and share — the "
    "TRANSIENT-frequency profile that TS-family periodogram (global "
    "sinusoids) smears: a one-off spike loads the fine levels, a "
    "regime shift loads the coarse ones. The entire transform is "
    "INTEGER: unnormalized Haar sums/differences on exact cents "
    "(4 unrolled pair-folds — s' = a+b, d = a-b keyed by i DIV 2), "
    "raw energies are int64 sums of squares, and the orthonormal "
    "1/2^k rescale is an exact dyadic double division; shares divide "
    "exact dyadic rationals (the window SUM adds four exactly-"
    "representable doubles — exact). Scale: the day spine is "
    f"{_HAAR_N} rows; everything after the daily collapse is "
    "constant-size at any corpus scale.",
)
def q_ts_haar_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.expr(
            "CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)"
        ).alias("cents")
    )
    last = (
        daily.withColumn(
            "rdesc", F.row_number().over(Window.orderBy(F.col("d").desc()))
        )
        .where(F.col("rdesc") <= _HAAR_N)
        .withColumn(
            "i",
            F.row_number().over(Window.orderBy("d")).cast("bigint"),
        )
        .select("i", F.col("cents").alias("s"))
    )
    lvl = last
    outs = []
    for k in range(1, 5):
        grouped = (
            lvl.groupBy(F.expr("(i - 1) DIV 2").alias("grp"))
            .agg(
                F.sum("s").cast("bigint").alias("ssum"),
                F.sum(
                    F.when(F.col("i") % 2 == 1, F.col("s")).otherwise(
                        -F.col("s")
                    )
                )
                .cast("bigint")
                .alias("dd"),
            )
            .withColumn(
                "i",
                F.row_number().over(Window.orderBy("grp")).cast("bigint"),
            )
        )
        outs.append(
            grouped.agg(
                F.lit(k).cast("bigint").alias("level"),
                F.count(F.lit(1)).cast("bigint").alias("n_coeffs"),
                F.sum(F.col("dd") * F.col("dd"))
                .cast("bigint")
                .alias("raw_energy"),
                (
                    F.sum(F.col("dd") * F.col("dd")).cast("double")
                    / F.lit(float(2**k))
                ).alias("energy_raw"),
            )
        )
        lvl = grouped.select("i", F.col("ssum").alias("s"))
    lv = outs[0]
    for o in outs[1:]:
        lv = lv.unionByName(o)
    wall = Window.partitionBy()
    return lv.select(
        "level",
        "n_coeffs",
        "raw_energy",
        F.round(F.col("energy_raw"), 4).alias("energy"),
        F.round(
            F.col("energy_raw") / F.sum("energy_raw").over(wall), 6
        ).alias("energy_share"),
    )


# ---------------------------------------------------------------------------
# Wave 160a (r5): relative-strength rotation quadrants.
# ---------------------------------------------------------------------------

_RRG_M = 79  # final month index of the 1995-2001 span (2001-08)


@register(
    "q_ts_rs_rotation",
    oracle=f"""
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
            SELECT m, CAST(SUM(cents) AS BIGINT) AS mc
            FROM monthly GROUP BY m
        ),
        allnations AS (
            SELECT DISTINCT nation FROM monthly
        ),
        last3 AS (
            SELECT an.nation,
                   CAST(COALESCE(SUM(CASE WHEN mo.m BETWEEN 77 AND 79
                                 THEN mo.cents END), 0) AS BIGINT) AS y1,
                   CAST(COALESCE(SUM(CASE WHEN mo.m BETWEEN 71 AND 73
                                 THEN mo.cents END), 0) AS BIGINT) AS y0
            FROM allnations an
            LEFT JOIN monthly mo ON mo.nation = an.nation
            GROUP BY an.nation
        ),
        mwin AS (
            SELECT CAST(SUM(CASE WHEN m BETWEEN 77 AND 79
                                 THEN mc END) AS BIGINT) AS m1,
                   CAST(SUM(CASE WHEN m BETWEEN 71 AND 73
                                 THEN mc END) AS BIGINT) AS m0
            FROM mkt
        ),
        avgshare AS (
            SELECT mo.nation,
                   CAST(SUM(mo.cents) AS BIGINT) AS tot_n,
                   CAST(SUM(k.mc) AS BIGINT) AS tot_m
            FROM monthly mo JOIN mkt k ON mo.m = k.m
            GROUP BY mo.nation
        )
        SELECT l.nation,
               ROUND(CAST(l.y1 AS DOUBLE) / w.m1
                     / (CAST(a.tot_n AS DOUBLE) / a.tot_m), 6)
                   AS rs_ratio,
               ROUND(CAST(l.y1 AS DOUBLE) / w.m1
                     - CAST(l.y0 AS DOUBLE) / w.m0, 6) AS rs_momentum,
               CASE
                   WHEN CAST(l.y1 AS HUGEINT) * a.tot_m
                            > CAST(a.tot_n AS HUGEINT) * w.m1
                        AND l.y1 * CAST(w.m0 AS HUGEINT)
                            > l.y0 * CAST(w.m1 AS HUGEINT)
                       THEN 'leading'
                   WHEN CAST(l.y1 AS HUGEINT) * a.tot_m
                            > CAST(a.tot_n AS HUGEINT) * w.m1
                       THEN 'weakening'
                   WHEN l.y1 * CAST(w.m0 AS HUGEINT)
                            > l.y0 * CAST(w.m1 AS HUGEINT)
                       THEN 'improving'
                   ELSE 'lagging'
               END AS quadrant
        FROM last3 l CROSS JOIN mwin w JOIN avgshare a USING (nation)
    """,
    section="TS37",
    doc="Relative-strength rotation (the RRG quadrant chart) over the "
    "final quarter (months 77-79) vs two quarters prior (71-73): "
    "each nation's window market share vs its own full-period "
    "average share (strength axis) and the share CHANGE between the "
    "two windows "
    "(momentum axis) classify it leading / weakening / improving / "
    "lagging — the sector-rotation screen, and the panel analog of "
    "W33's long-short momentum (W33 trades the ranking; this names "
    "each unit's phase). Determinism device: every axis test is a "
    "CROSS-MULTIPLIED integer compare (y1·M > Y·m1 instead of "
    "share ratios — the TS28 sign device; one product needs 128-bit "
    "headroom, taken via HUGEINT in DuckDB and Spark's DECIMAL(38) "
    "promotion), so the quadrant label never rides a float; the "
    "reported ratios are display-only pinned doubles. Scale: "
    "(nation x month) grain throughout — calendar-bounded.",
)
def q_ts_rs_rotation(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        F.sum("cents").cast("bigint").alias("mc")
    )
    j = monthly.join(F.broadcast(mkt), "m")
    allnations = monthly.select("nation").distinct()
    ysum = (
        monthly.groupBy("nation")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("m").between(77, 79), F.col("cents")
                    )
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("y1"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("m").between(71, 73), F.col("cents")
                    )
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("y0"),
        )
    )
    last3 = allnations.join(ysum, "nation", "left").select(
        "nation",
        F.coalesce(F.col("y1"), F.lit(0)).cast("bigint").alias("y1"),
        F.coalesce(F.col("y0"), F.lit(0)).cast("bigint").alias("y0"),
    )
    mwin = mkt.agg(
        F.sum(F.when(F.col("m").between(77, 79), F.col("mc")))
        .cast("bigint")
        .alias("m1"),
        F.sum(F.when(F.col("m").between(71, 73), F.col("mc")))
        .cast("bigint")
        .alias("m0"),
    )
    avgshare = j.groupBy("nation").agg(
        F.sum("cents").cast("bigint").alias("tot_n"),
        F.sum("mc").cast("bigint").alias("tot_m"),
    )
    out = last3.crossJoin(F.broadcast(mwin)).join(avgshare, "nation")
    d38 = DecimalType(38, 0)
    strong = (
        F.col("y1").cast(d38) * F.col("tot_m").cast(d38)
        > F.col("tot_n").cast(d38) * F.col("m1").cast(d38)
    )
    rising = (
        F.col("y1").cast(d38) * F.col("m0").cast(d38)
        > F.col("y0").cast(d38) * F.col("m1").cast(d38)
    )
    return out.select(
        "nation",
        F.round(
            F.col("y1").cast("double")
            / F.col("m1")
            / (F.col("tot_n").cast("double") / F.col("tot_m")),
            6,
        ).alias("rs_ratio"),
        F.round(
            F.col("y1").cast("double") / F.col("m1")
            - F.col("y0").cast("double") / F.col("m0"),
            6,
        ).alias("rs_momentum"),
        F.when(strong & rising, "leading")
        .when(strong, "weakening")
        .when(rising, "improving")
        .otherwise("lagging")
        .alias("quadrant"),
    )


# ==== wave 163b: Dickey-Fuller unit-root test =======================


@register(
    "q_ts_dickey_fuller",
    oracle="""
        WITH daily AS (
            SELECT n.n_name AS nation,
                   CAST(o.o_orderdate AS DATE) AS d,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) AS cents
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1, 2
        ),
        pairs AS (
            SELECT nation,
                   LAG(cents) OVER (PARTITION BY nation ORDER BY d) AS x,
                   cents - LAG(cents) OVER (PARTITION BY nation ORDER BY d)
                       AS dy
            FROM daily
        ),
        moments AS (
            SELECT nation,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(dy) AS BIGINT) AS sdy,
                   CAST(CAST(SUM(CAST(x AS DECIMAL(38,0))
                                 * CAST(x AS DECIMAL(38,0))) AS HUGEINT)
                        // 4294967296 AS DOUBLE) * 4294967296.0
                   + CAST(CAST(SUM(CAST(x AS DECIMAL(38,0))
                                   * CAST(x AS DECIMAL(38,0))) AS HUGEINT)
                          % 4294967296 AS DOUBLE) AS sxx,
                   CAST(CAST(SUM(CAST(x AS DECIMAL(38,0))
                                 * CAST(dy AS DECIMAL(38,0))) AS HUGEINT)
                        // 4294967296 AS DOUBLE) * 4294967296.0
                   + CAST(CAST(SUM(CAST(x AS DECIMAL(38,0))
                                   * CAST(dy AS DECIMAL(38,0))) AS HUGEINT)
                          % 4294967296 AS DOUBLE) AS sxdy,
                   CAST(CAST(SUM(CAST(dy AS DECIMAL(38,0))
                                 * CAST(dy AS DECIMAL(38,0))) AS HUGEINT)
                        // 4294967296 AS DOUBLE) * 4294967296.0
                   + CAST(CAST(SUM(CAST(dy AS DECIMAL(38,0))
                                   * CAST(dy AS DECIMAL(38,0))) AS HUGEINT)
                          % 4294967296 AS DOUBLE) AS sdydy
            FROM pairs WHERE x IS NOT NULL
            GROUP BY nation
            HAVING COUNT(*) > 2
        ),
        fit AS (
            SELECT nation, n,
                   CAST(n AS DOUBLE) AS nd,
                   CAST(sx AS DOUBLE) AS sxd,
                   CAST(sdy AS DOUBLE) AS sdyd,
                   sxx, sxdy, sdydy
            FROM moments
        ),
        d2 AS (
            SELECT nation, n, nd, sxd, sdyd,
                   nd * sxx - sxd * sxd AS dxx,
                   nd * sxdy - sxd * sdyd AS dxy,
                   nd * sdydy - sdyd * sdyd AS dyy
            FROM fit
        ),
        b AS (
            SELECT nation, n, nd, sxd, sdyd, dxx, dxy, dyy,
                   dxy / dxx AS beta
            FROM d2
        )
        SELECT nation, n,
               ROUND(beta, 8) AS beta,
               ROUND(beta / sqrt((dyy - beta * dxy)
                                 / ((nd - 2.0) * dxx)), 6) AS df_t,
               ROUND((sdyd - beta * sxd) / nd, 4) AS drift_cents
        FROM b
        ORDER BY nation
    """,
    section="TS22",
    doc="Dickey-Fuller unit-root test per nation on the daily-revenue "
    "series: regress dy_t = alpha + beta*y_(t-1) via grouped "
    "closed-form OLS and report the DF t-statistic beta/SE(beta) — "
    "df_t strongly negative rejects the unit root (series "
    "mean-reverts), df_t near 0 says random-walk; the stationarity "
    "complement of q_ts_kpss (which tests the null the other way "
    "around). All moments are exact integer/DECIMAL(38,0) sums "
    "rebuilt into doubles with A26's hi/lo 32-bit device — sign-safe "
    "here because dy sums can be negative and both engines truncate "
    "integer division toward zero — then beta / SSE / t share one "
    "pinned IEEE expression (div, mul, sub, sqrt are all "
    "correctly-rounded). Scale: one (nation, day) agg, one bounded "
    "lag window per nation, one nation-grain moment agg — the "
    "per-series state never leaves the executors and the output is "
    "|nations| rows.",
)
def q_ts_dickey_fuller(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    daily = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("o_orderdate").cast("date").alias("d"),
        )
        .agg(
            F.expr(
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 "
                "AS BIGINT)"
            ).alias("cents")
        )
    )
    w = Window.partitionBy("nation").orderBy("d")
    pairs = daily.select(
        "nation",
        F.lag("cents").over(w).alias("x"),
        (F.col("cents") - F.lag("cents").over(w)).alias("dy"),
    ).where(F.col("x").isNotNull())
    moments = (
        pairs.groupBy("nation")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("x").cast("bigint").alias("sx"),
            F.sum("dy").cast("bigint").alias("sdy"),
            F.sum(
                F.col("x").cast(DecimalType(38, 0))
                * F.col("x").cast(DecimalType(38, 0))
            ).alias("sxxd"),
            F.sum(
                F.col("x").cast(DecimalType(38, 0))
                * F.col("dy").cast(DecimalType(38, 0))
            ).alias("sxdyd"),
            F.sum(
                F.col("dy").cast(DecimalType(38, 0))
                * F.col("dy").cast(DecimalType(38, 0))
            ).alias("sdydyd"),
        )
        .where(F.col("n") > 2)
    )
    hi_lo = (
        "cast({0} div 4294967296 as double) * 4294967296.0d"
        " + cast({0} % 4294967296 as double)"
    )
    fit = moments.select(
        "nation",
        "n",
        F.col("n").cast("double").alias("nd"),
        F.col("sx").cast("double").alias("sxd"),
        F.col("sdy").cast("double").alias("sdyd"),
        F.expr(hi_lo.format("sxxd")).alias("sxx"),
        F.expr(hi_lo.format("sxdyd")).alias("sxdy"),
        F.expr(hi_lo.format("sdydyd")).alias("sdydy"),
    )
    d2 = fit.select(
        "nation",
        "n",
        "nd",
        "sxd",
        "sdyd",
        (F.col("nd") * F.col("sxx") - F.col("sxd") * F.col("sxd")).alias(
            "dxx"
        ),
        (F.col("nd") * F.col("sxdy") - F.col("sxd") * F.col("sdyd")).alias(
            "dxy"
        ),
        (F.col("nd") * F.col("sdydy") - F.col("sdyd") * F.col("sdyd")).alias(
            "dyy"
        ),
    )
    b = d2.withColumn("beta", F.col("dxy") / F.col("dxx"))
    return b.select(
        "nation",
        "n",
        F.round("beta", 8).alias("beta"),
        F.round(
            F.col("beta")
            / F.sqrt(
                (F.col("dyy") - F.col("beta") * F.col("dxy"))
                / ((F.col("nd") - F.lit(2.0)) * F.col("dxx"))
            ),
            6,
        ).alias("df_t"),
        F.round(
            (F.col("sdyd") - F.col("beta") * F.col("sxd")) / F.col("nd"), 4
        ).alias("drift_cents"),
    )


# ==== wave 165a: Theta-method forecast ==============================


@register(
    "q_ts_theta_forecast",
    oracle="""
        WITH daily AS (
            SELECT event_type,
                   CAST(date_diff('day', DATE '2024-01-01',
                                  CAST(date_trunc('day', ts) AS DATE))
                        AS BIGINT) AS d,
                   CAST(SUM(CAST(value AS DECIMAL(12,2))) * 100
                        AS BIGINT) AS v
            FROM events GROUP BY 1, 2
        ),
        mom AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(d) AS BIGINT) AS sd,
                   CAST(SUM(v) AS BIGINT) AS sv,
                   CAST(SUM(d * d) AS BIGINT) AS sdd,
                   CAST(SUM(d * v) AS BIGINT) AS sdv
            FROM daily GROUP BY event_type
        ),
        ses AS (
            SELECT event_type,
                   list_reduce(
                       list_transform(
                           list_sort(list(struct_pack(d := d, v := v))),
                           x -> CAST(x.v AS DOUBLE)),
                       (acc, x) -> 0.5 * x + 0.5 * acc) AS level
            FROM daily GROUP BY event_type
        )
        SELECT m.event_type, m.n AS n_days,
               ROUND(s.level, 4) AS ses_level_cents,
               ROUND((CAST(m.n AS DOUBLE) * CAST(m.sdv AS DOUBLE)
                      - CAST(m.sd AS DOUBLE) * CAST(m.sv AS DOUBLE))
                     / (CAST(m.n AS DOUBLE) * CAST(m.sdd AS DOUBLE)
                        - CAST(m.sd AS DOUBLE) * CAST(m.sd AS DOUBLE))
                     / 2.0, 6) AS drift_cents,
               ROUND(s.level
                     + 1.0 * ((CAST(m.n AS DOUBLE) * CAST(m.sdv AS DOUBLE)
                        - CAST(m.sd AS DOUBLE) * CAST(m.sv AS DOUBLE))
                       / (CAST(m.n AS DOUBLE) * CAST(m.sdd AS DOUBLE)
                          - CAST(m.sd AS DOUBLE) * CAST(m.sd AS DOUBLE))
                       / 2.0), 4) AS forecast_1d,
               ROUND(s.level
                     + 7.0 * ((CAST(m.n AS DOUBLE) * CAST(m.sdv AS DOUBLE)
                        - CAST(m.sd AS DOUBLE) * CAST(m.sv AS DOUBLE))
                       / (CAST(m.n AS DOUBLE) * CAST(m.sdd AS DOUBLE)
                          - CAST(m.sd AS DOUBLE) * CAST(m.sd AS DOUBLE))
                       / 2.0), 4) AS forecast_7d,
               ROUND(s.level
                     + 28.0 * ((CAST(m.n AS DOUBLE) * CAST(m.sdv AS DOUBLE)
                        - CAST(m.sd AS DOUBLE) * CAST(m.sv AS DOUBLE))
                       / (CAST(m.n AS DOUBLE) * CAST(m.sdd AS DOUBLE)
                          - CAST(m.sd AS DOUBLE) * CAST(m.sd AS DOUBLE))
                       / 2.0), 4) AS forecast_28d
        FROM mom m JOIN ses s ON m.event_type = s.event_type
    """,
    section="TS23",
    doc="Theta-method forecast per event type via the Hyndman-Billah "
    "equivalence: Theta(0,2) == simple exponential smoothing plus a "
    "drift of HALF the fitted linear-trend slope — so the M3 "
    "benchmark winner decomposes into two devices this suite already "
    "pins: the TS24 row-local day-sorted fold (alpha=1/2, so every "
    "smoothing step is an exact halving of a correctly-rounded sum) "
    "for the SES level, and the A132 closed-form OLS slope from "
    "all-integer moments (d*v and d*d sums stay well under 2^53 — "
    "exact doubles, no hi/lo device needed). 1/7/28-day forecasts "
    "share one pinned IEEE expression. Scale: one keyed agg to "
    "~days-per-type rows, one bounded sorted-collect per series, "
    "both shuffles on the 10-value event_type key.",
)
def q_ts_theta_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.expr(
            "cast(datediff(cast(date_trunc('day', ts) as date), "
            "date'2024-01-01') as bigint)"
        ).alias("d"),
    ).agg(
        F.expr(
            "cast(sum(cast(value as decimal(12,2))) * 100 as bigint)"
        ).alias("v")
    ).localCheckpoint(eager=False)
    mom = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("d").cast("bigint").alias("sd"),
        F.sum("v").cast("bigint").alias("sv"),
        F.sum(F.col("d") * F.col("d")).cast("bigint").alias("sdd"),
        F.sum(F.col("d") * F.col("v")).cast("bigint").alias("sdv"),
    )
    ses = daily.groupBy("event_type").agg(
        F.expr(
            "aggregate("
            "  slice(transform(array_sort(collect_list(struct(d, v))),"
            "                  x -> cast(x.v as double)),"
            "        2, size(collect_list(struct(d, v))) - 1),"
            "  cast(transform(array_sort(collect_list(struct(d, v))),"
            "                 x -> cast(x.v as double))[0] as double),"
            "  (acc, x) -> 0.5d * x + 0.5d * acc)"
        ).alias("level")
    )
    nd = F.col("n").cast("double")
    sd = F.col("sd").cast("double")
    sv = F.col("sv").cast("double")
    sdd = F.col("sdd").cast("double")
    sdv = F.col("sdv").cast("double")
    drift = (nd * sdv - sd * sv) / (nd * sdd - sd * sd) / F.lit(2.0)
    return mom.join(ses, "event_type").select(
        "event_type",
        F.col("n").alias("n_days"),
        F.round("level", 4).alias("ses_level_cents"),
        F.round(drift, 6).alias("drift_cents"),
        F.round(F.col("level") + F.lit(1.0) * drift, 4).alias("forecast_1d"),
        F.round(F.col("level") + F.lit(7.0) * drift, 4).alias("forecast_7d"),
        F.round(F.col("level") + F.lit(28.0) * drift, 4).alias(
            "forecast_28d"
        ),
    )


# ==== wave 167b: Engle-Granger cointegration ========================


@register(
    "q_ts_cointegration_eg",
    oracle="""
        WITH daily AS (
            SELECT n.n_name AS nation,
                   CAST(o.o_orderdate AS DATE) AS d,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) AS y
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1, 2
        ),
        mkt AS (
            SELECT d, CAST(SUM(y) AS BIGINT) AS x FROM daily GROUP BY d
        ),
        paired AS (
            SELECT dy.nation, dy.d, dy.y, m.x
            FROM daily dy JOIN mkt m ON dy.d = m.d
        ),
        mom1 AS (
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
        ),
        fit1 AS (
            SELECT nation, n,
                   (CAST(n AS DOUBLE) * sxy
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (CAST(n AS DOUBLE) * sxx
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b,
                   (CAST(sy AS DOUBLE)
                    - (CAST(n AS DOUBLE) * sxy
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                      / (CAST(n AS DOUBLE) * sxx
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                      * CAST(sx AS DOUBLE)) / n AS a
            FROM mom1
        ),
        resid AS (
            SELECT p.nation, p.d,
                   CAST(floor(CAST(p.y AS DOUBLE)
                              - (f.a + f.b * CAST(p.x AS DOUBLE)))
                        AS BIGINT) AS z
            FROM paired p JOIN fit1 f ON p.nation = f.nation
        ),
        dfpairs AS (
            SELECT nation,
                   LAG(z) OVER (PARTITION BY nation ORDER BY d) AS u,
                   z - LAG(z) OVER (PARTITION BY nation ORDER BY d) AS dz
            FROM resid
        ),
        mom2 AS (
            SELECT nation,
                   CAST(COUNT(*) AS BIGINT) AS n2,
                   CAST(SUM(u) AS BIGINT) AS su,
                   CAST(SUM(dz) AS BIGINT) AS sdz,
                   CAST(CAST(SUM(CAST(u AS DECIMAL(38,0))
                                 * CAST(u AS DECIMAL(38,0))) AS HUGEINT)
                        // 4294967296 AS DOUBLE) * 4294967296.0
                   + CAST(CAST(SUM(CAST(u AS DECIMAL(38,0))
                                   * CAST(u AS DECIMAL(38,0))) AS HUGEINT)
                          % 4294967296 AS DOUBLE) AS suu,
                   CAST(CAST(SUM(CAST(u AS DECIMAL(38,0))
                                 * CAST(dz AS DECIMAL(38,0))) AS HUGEINT)
                        // 4294967296 AS DOUBLE) * 4294967296.0
                   + CAST(CAST(SUM(CAST(u AS DECIMAL(38,0))
                                   * CAST(dz AS DECIMAL(38,0))) AS HUGEINT)
                          % 4294967296 AS DOUBLE) AS sudz,
                   CAST(CAST(SUM(CAST(dz AS DECIMAL(38,0))
                                 * CAST(dz AS DECIMAL(38,0))) AS HUGEINT)
                        // 4294967296 AS DOUBLE) * 4294967296.0
                   + CAST(CAST(SUM(CAST(dz AS DECIMAL(38,0))
                                   * CAST(dz AS DECIMAL(38,0))) AS HUGEINT)
                          % 4294967296 AS DOUBLE) AS sdzdz
            FROM dfpairs WHERE u IS NOT NULL
            GROUP BY nation
            HAVING COUNT(*) > 2
        ),
        d2 AS (
            SELECT nation, n2,
                   CAST(n2 AS DOUBLE) AS nd,
                   CAST(n2 AS DOUBLE) * suu
                   - CAST(su AS DOUBLE) * CAST(su AS DOUBLE) AS dxx,
                   CAST(n2 AS DOUBLE) * sudz
                   - CAST(su AS DOUBLE) * CAST(sdz AS DOUBLE) AS dxy,
                   CAST(n2 AS DOUBLE) * sdzdz
                   - CAST(sdz AS DOUBLE) * CAST(sdz AS DOUBLE) AS dyy
            FROM mom2
        ),
        b2 AS (
            SELECT nation, n2, nd, dxx, dxy, dyy, dxy / dxx AS gamma
            FROM d2
        )
        SELECT f.nation, b2.n2 AS n_pairs,
               ROUND(f.b, 8) AS b_coint,
               ROUND(b2.gamma, 8) AS resid_beta,
               ROUND(b2.gamma / sqrt((b2.dyy - b2.gamma * b2.dxy)
                                     / ((b2.nd - 2.0) * b2.dxx)), 6)
                   AS resid_df_t
        FROM fit1 f JOIN b2 ON f.nation = b2.nation
        ORDER BY f.nation
    """,
    section="TS25",
    doc="Engle-Granger two-step cointegration test, nation vs the "
    "total market: step 1 fits the cointegrating regression y = a + "
    "b*x by the A132 closed-form OLS (hi/lo-rebuilt DECIMAL "
    "moments), step 2 runs the TS22 Dickey-Fuller regression on the "
    "CENT-QUANTIZED residuals z = floor(y - a - b*x) — strongly "
    "negative resid_df_t means the spread mean-reverts, i.e. the "
    "nation's revenue and the market share a common stochastic "
    "trend. Quantizing residuals to integer cents before the "
    "second-stage moments is what keeps stage 2 exact and "
    "partition-invariant (raw double residuals would make the "
    "moment sums order-dependent); a and b are identical pinned "
    "doubles on both engines, so floor lands identically. Scale: "
    "two keyed aggs + one bounded lag window per nation; the "
    "|days|-row market series joins on the day key.",
)
def q_ts_cointegration_eg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    daily = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("o_orderdate").cast("date").alias("d"),
        )
        .agg(
            F.expr(
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 "
                "AS BIGINT)"
            ).alias("y")
        )
        .localCheckpoint(eager=False)
    )
    mkt = daily.groupBy("d").agg(F.sum("y").cast("bigint").alias("x"))
    paired = daily.join(F.broadcast(mkt), "d").select(
        "nation", "d", "y", "x"
    ).localCheckpoint(eager=False)
    dec = DecimalType(38, 0)
    hi_lo = (
        "cast({0} div 4294967296 as double) * 4294967296.0d"
        " + cast({0} % 4294967296 as double)"
    )
    mom1 = paired.groupBy("nation").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("x").cast(dec)).alias("sxxd"),
        F.sum(F.col("x").cast(dec) * F.col("y").cast(dec)).alias("sxyd"),
    )
    mom1 = mom1.select(
        "nation",
        "n",
        "sx",
        "sy",
        F.expr(hi_lo.format("sxxd")).alias("sxx"),
        F.expr(hi_lo.format("sxyd")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    bexpr = (nd * F.col("sxy") - sxd * syd) / (nd * F.col("sxx") - sxd * sxd)
    fit1 = mom1.select(
        "nation",
        "n",
        bexpr.alias("b"),
        ((syd - bexpr * sxd) / F.col("n")).alias("a"),
    )
    resid = paired.join(F.broadcast(fit1), "nation").select(
        "nation",
        "d",
        F.floor(
            F.col("y").cast("double")
            - (F.col("a") + F.col("b") * F.col("x").cast("double"))
        )
        .cast("bigint")
        .alias("z"),
    )
    w = Window.partitionBy("nation").orderBy("d")
    dfpairs = resid.select(
        "nation",
        F.lag("z").over(w).alias("u"),
        (F.col("z") - F.lag("z").over(w)).alias("dz"),
    ).where(F.col("u").isNotNull())
    mom2 = (
        dfpairs.groupBy("nation")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n2"),
            F.sum("u").cast("bigint").alias("su"),
            F.sum("dz").cast("bigint").alias("sdz"),
            F.sum(F.col("u").cast(dec) * F.col("u").cast(dec)).alias("suud"),
            F.sum(F.col("u").cast(dec) * F.col("dz").cast(dec)).alias(
                "sudzd"
            ),
            F.sum(F.col("dz").cast(dec) * F.col("dz").cast(dec)).alias(
                "sdzdzd"
            ),
        )
        .where(F.col("n2") > 2)
    )
    mom2 = mom2.select(
        "nation",
        "n2",
        "su",
        "sdz",
        F.expr(hi_lo.format("suud")).alias("suu"),
        F.expr(hi_lo.format("sudzd")).alias("sudz"),
        F.expr(hi_lo.format("sdzdzd")).alias("sdzdz"),
    )
    n2d = F.col("n2").cast("double")
    sud = F.col("su").cast("double")
    sdzd = F.col("sdz").cast("double")
    d2 = mom2.select(
        "nation",
        "n2",
        n2d.alias("nd"),
        (n2d * F.col("suu") - sud * sud).alias("dxx"),
        (n2d * F.col("sudz") - sud * sdzd).alias("dxy"),
        (n2d * F.col("sdzdz") - sdzd * sdzd).alias("dyy"),
    )
    b2 = d2.withColumn("gamma", F.col("dxy") / F.col("dxx"))
    return fit1.join(b2, "nation").select(
        "nation",
        F.col("n2").alias("n_pairs"),
        F.round("b", 8).alias("b_coint"),
        F.round("gamma", 8).alias("resid_beta"),
        F.round(
            F.col("gamma")
            / F.sqrt(
                (F.col("dyy") - F.col("gamma") * F.col("dxy"))
                / ((F.col("nd") - F.lit(2.0)) * F.col("dxx"))
            ),
            6,
        ).alias("resid_df_t"),
    )


# ==== wave 170b: drawdown depth + underwater recovery ===============


@register(
    "q_ts_underwater_recovery",
    oracle="""
        WITH daily AS (
            SELECT n.n_name AS nation,
                   CAST(o.o_orderdate AS DATE) AS d,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) AS cents
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1, 2
        ),
        level AS (
            SELECT nation, d,
                   CAST(SUM(cents) OVER (PARTITION BY nation ORDER BY d
                        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS lv,
                   CAST(ROW_NUMBER() OVER (PARTITION BY nation ORDER BY d)
                        AS BIGINT) AS rn
            FROM daily
        ),
        lv8 AS (
            SELECT nation, d, lv FROM level WHERE rn >= 7
        ),
        runpeak AS (
            SELECT nation, d, lv,
                   MAX(struct_pack(lv := lv, nd := CAST(-(d - DATE
                       '1900-01-01') AS BIGINT))) OVER (
                       PARTITION BY nation ORDER BY d
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS pk
            FROM lv8
        ),
        trough AS (
            SELECT nation, d AS trough_d, lv AS trough_lv,
                   pk.lv AS peak_lv,
                   DATE '1900-01-01' - CAST(pk.nd AS INTEGER) AS peak_d,
                   CAST(pk.lv - lv AS BIGINT) AS depth,
                   ROW_NUMBER() OVER (
                       PARTITION BY nation
                       ORDER BY pk.lv - lv DESC, d
                   ) AS rnk
            FROM runpeak
        ),
        worst AS (
            SELECT nation, trough_d, peak_d, peak_lv, trough_lv, depth
            FROM trough WHERE rnk = 1
        ),
        rec AS (
            SELECT w.nation, MIN(l.d) AS recovery_d
            FROM worst w JOIN lv8 l
              ON l.nation = w.nation AND l.d > w.trough_d
                 AND l.lv >= w.peak_lv
            GROUP BY w.nation
        )
        SELECT w.nation, w.peak_d, w.trough_d, w.depth,
               CAST(w.peak_lv AS BIGINT) AS peak_lv,
               r.recovery_d,
               CAST(CASE WHEN r.recovery_d IS NULL THEN NULL
                    ELSE date_diff('day', w.peak_d, r.recovery_d)
                    END AS BIGINT) AS days_underwater
        FROM worst w LEFT JOIN rec r ON w.nation = r.nation
        ORDER BY w.nation
    """,
    section="TS26",
    doc="Maximum drawdown WITH recovery analysis per nation on the "
    "7-day trailing-revenue level: running peak via windowed "
    "struct-MAX over (level, -days) so the EARLIEST day holding the "
    "peak rides along (the D18 device flipped to argmax), the worst "
    "trough fully tie-broken (depth DESC, day ASC), then the "
    "recovery day = first later day whose level re-clears the peak "
    "— found by joining the 25-row worst-trough table back to the "
    "level series, NOT by an n^2 self-join; days_underwater = "
    "peak-to-recovery span, NULL while still underwater (the "
    "LEFT-join NULL matches cross-engine because peak/trough are "
    "all-integer). The first 6 warm-up rows are excluded so the "
    "trailing frame is always full. Scale: two windows per nation "
    "partition + one broadcast-sized join.",
)
def q_ts_underwater_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    daily = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("o_orderdate").cast("date").alias("d"),
        )
        .agg(
            F.expr(
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 "
                "AS BIGINT)"
            ).alias("cents")
        )
    )
    w7 = Window.partitionBy("nation").orderBy("d").rowsBetween(-6, 0)
    wrn = Window.partitionBy("nation").orderBy("d")
    lv8 = (
        daily.select(
            "nation",
            "d",
            F.sum("cents").over(w7).cast("bigint").alias("lv"),
            F.row_number().over(wrn).cast("bigint").alias("rn"),
        )
        .where(F.col("rn") >= 7)
        .drop("rn")
        .localCheckpoint(eager=False)
    )
    wpk = (
        Window.partitionBy("nation")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    runpeak = lv8.select(
        "nation",
        "d",
        "lv",
        F.max(
            F.struct(
                F.col("lv"),
                (-F.datediff(F.col("d"), F.lit("1900-01-01").cast("date")))
                .cast("bigint")
                .alias("nd"),
            )
        )
        .over(wpk)
        .alias("pk"),
    )
    trough = runpeak.select(
        "nation",
        F.col("d").alias("trough_d"),
        F.col("lv").alias("trough_lv"),
        F.col("pk.lv").alias("peak_lv"),
        F.date_add(
            F.lit("1900-01-01").cast("date"),
            (-F.col("pk.nd")).cast("int"),
        ).alias("peak_d"),
        (F.col("pk.lv") - F.col("lv")).cast("bigint").alias("depth"),
        F.row_number()
        .over(
            Window.partitionBy("nation").orderBy(
                (F.col("pk.lv") - F.col("lv")).desc(), F.col("d")
            )
        )
        .alias("rnk"),
    )
    worst = trough.where(F.col("rnk") == 1).select(
        "nation", "trough_d", "peak_d", "peak_lv", "trough_lv", "depth"
    )
    rec = (
        F.broadcast(worst)
        .join(
            lv8.select(
                F.col("nation").alias("n2"),
                F.col("d").alias("d2"),
                F.col("lv").alias("lv2"),
            ),
            (F.col("n2") == F.col("nation"))
            & (F.col("d2") > F.col("trough_d"))
            & (F.col("lv2") >= F.col("peak_lv")),
        )
        .groupBy("nation")
        .agg(F.min("d2").alias("recovery_d"))
    )
    return worst.join(rec, "nation", "left").select(
        "nation",
        "peak_d",
        "trough_d",
        "depth",
        F.col("peak_lv").cast("bigint").alias("peak_lv"),
        "recovery_d",
        F.when(
            F.col("recovery_d").isNull(), F.lit(None).cast("bigint")
        )
        .otherwise(
            F.datediff(F.col("recovery_d"), F.col("peak_d")).cast("bigint")
        )
        .alias("days_underwater"),
    )


# ==== wave 175b: Durbin-Watson autocorrelation test (TS44) ==========


@register(
    "q_ts_durbin_watson",
    oracle="""
        WITH daily AS (
            SELECT n.n_name AS nation,
                   CAST(o.o_orderdate AS DATE) AS d,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) AS cents
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1, 2
        ),
        idx AS (
            SELECT nation, cents,
                   CAST(row_number() OVER (PARTITION BY nation ORDER BY d)
                        AS BIGINT) AS t
            FROM daily
        ),
        mom AS (
            SELECT nation,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(t) AS BIGINT) AS st,
                   CAST(SUM(cents) AS BIGINT) AS sy,
                   CAST(SUM(t * t) AS BIGINT) AS stt,
                   CAST(SUM(t * cents) AS BIGINT) AS sty
            FROM idx GROUP BY nation
            HAVING COUNT(*) > 3
        ),
        sc AS (
            SELECT nation, n, st, sy,
                   CAST(n AS HUGEINT) * stt
                   - CAST(st AS HUGEINT) * st AS dd,
                   CAST(n AS HUGEINT) * sty
                   - CAST(st AS HUGEINT) * sy AS bb,
                   GREATEST(CAST(1 AS HUGEINT),
                            (CAST(n AS HUGEINT)
                             * (CAST(n AS HUGEINT) * stt
                                - CAST(st AS HUGEINT) * st)) // 16)
                       AS dv
            FROM mom
        ),
        resid AS (
            SELECT i.nation, i.t,
                   (CAST(s.n AS HUGEINT) * s.dd * i.cents
                    - s.dd * s.sy
                    + s.bb * s.st
                    - CAST(s.n AS HUGEINT) * s.bb * i.t)
                   // s.dv AS u
            FROM idx i JOIN sc s ON s.nation = i.nation
        ),
        lagd AS (
            SELECT nation,
                   CAST(u AS BIGINT) AS u,
                   CAST(u - LAG(u) OVER (PARTITION BY nation ORDER BY t)
                        AS BIGINT) AS du
            FROM resid
        ),
        sums AS (
            SELECT nation,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(CAST(u AS HUGEINT) * u) AS su2,
                   SUM(CAST(du AS HUGEINT) * du) AS sd2
            FROM lagd GROUP BY nation
        )
        SELECT nation, n,
               ROUND((CAST(sd2 // 4294967296 AS DOUBLE) * 4294967296.0
                      + CAST(sd2 % 4294967296 AS DOUBLE))
                     / (CAST(su2 // 4294967296 AS DOUBLE) * 4294967296.0
                        + CAST(su2 % 4294967296 AS DOUBLE)), 6) AS dw,
               ROUND(1.0 - (CAST(sd2 // 4294967296 AS DOUBLE)
                            * 4294967296.0
                            + CAST(sd2 % 4294967296 AS DOUBLE))
                     / (CAST(su2 // 4294967296 AS DOUBLE) * 4294967296.0
                        + CAST(su2 % 4294967296 AS DOUBLE)) / 2.0, 6)
                   AS rho_hat
        FROM sums
        ORDER BY nation
    """,
    section="TS44",
    doc="Durbin-Watson statistic per nation on the OLS-detrended "
    "daily-revenue series: DW = sum(e_t - e_(t-1))^2 / sum(e_t^2), "
    "~2 means no serial correlation, ->0 positive, ->4 negative; "
    "THE post-regression residual diagnostic (TS22's Dickey-Fuller "
    "asks about unit roots, DW asks whether the trend fit left "
    "correlated errors). Determinism device: the residual is scaled "
    "by n*D (D = n*stt - st^2) so u_t = nD*y_t - D*sy + bb*st - "
    "n*bb*t is EXACT integer algebra (HUGEINT / DECIMAL(38,0)); the "
    "scale cancels in the DW ratio. u quantizes by div "
    "greatest(1, nD div 16) — ADAPTIVE, so u' ~ 16*residual at "
    "every SF (a fixed divisor zeroes residuals at small SF; "
    "truncation toward zero matches Spark div / DuckDB // on "
    "negatives — the TS22 sign-safe note), squares accumulate in "
    "int128/DECIMAL(38,0), and the ratio rebuilds through the A26 "
    "hi/lo 32-bit device. Scale: one (nation,day) agg, one moment "
    "agg, a 25-row broadcast back, one lag window per nation.",
)
def q_ts_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    daily = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("o_orderdate").cast("date").alias("d"),
        )
        .agg(
            F.expr(
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 "
                "AS BIGINT)"
            ).alias("cents")
        )
    )
    idx = daily.select(
        "nation",
        "cents",
        F.row_number()
        .over(Window.partitionBy("nation").orderBy("d"))
        .cast("bigint")
        .alias("t"),
    )
    mom = (
        idx.groupBy("nation")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("t").cast("bigint").alias("st"),
            F.sum("cents").cast("bigint").alias("sy"),
            F.sum(F.col("t") * F.col("t")).cast("bigint").alias("stt"),
            F.sum(F.col("t") * F.col("cents"))
            .cast("bigint")
            .alias("sty"),
        )
        .where(F.col("n") > 3)
    )
    d38 = lambda c: F.col(c).cast(DecimalType(38, 0))  # noqa: E731
    sc = mom.select(
        "nation",
        "n",
        "st",
        "sy",
        (d38("n") * F.col("stt") - d38("st") * F.col("st")).alias("dd"),
        (d38("n") * F.col("sty") - d38("st") * F.col("sy")).alias("bb"),
        F.expr(
            "greatest(cast(1 as bigint),"
            " (cast(n as decimal(38,0))"
            "  * (cast(n as decimal(38,0)) * stt"
            "     - cast(st as decimal(38,0)) * st)) div 16)"
        ).alias("dv"),
    )
    resid = idx.join(F.broadcast(sc), "nation").select(
        "nation",
        "t",
        F.expr(
            "(CAST(n AS DECIMAL(38,0)) * dd * cents"
            " - dd * sy + bb * st"
            " - CAST(n AS DECIMAL(38,0)) * bb * t)"
            " div dv"
        ).alias("u"),
    )
    w = Window.partitionBy("nation").orderBy("t")
    lagd = resid.select(
        "nation",
        F.col("u").cast("bigint").alias("u"),
        (F.col("u") - F.lag("u").over(w)).cast("bigint").alias("du"),
    )
    sums = lagd.groupBy("nation").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("u").cast(DecimalType(38, 0)) * F.col("u")).alias(
            "su2"
        ),
        F.sum(F.col("du").cast(DecimalType(38, 0)) * F.col("du")).alias(
            "sd2"
        ),
    )
    hi_lo = (
        "cast({0} div 4294967296 as double) * 4294967296.0d"
        " + cast({0} % 4294967296 as double)"
    )
    dw = F.expr(hi_lo.format("sd2")) / F.expr(hi_lo.format("su2"))
    return sums.select(
        "nation",
        "n",
        F.round(dw, 6).alias("dw"),
        F.round(F.lit(1.0) - dw / F.lit(2.0), 6).alias("rho_hat"),
    )


# ==== wave 178a: Pettitt change-point test (TS45) ===================


@register(
    "q_ts_pettitt",
    oracle="""
        WITH daily AS (
            SELECT n.n_name AS nation,
                   CAST(o.o_orderdate AS DATE) AS d,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) AS cents
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1, 2
        ),
        ranked AS (
            SELECT nation, d, cents,
                   CAST(RANK() OVER (PARTITION BY nation ORDER BY cents)
                        - RANK() OVER (PARTITION BY nation
                                       ORDER BY cents DESC)
                        AS BIGINT) AS r,
                   CAST(ROW_NUMBER() OVER (PARTITION BY nation
                                           ORDER BY d) AS BIGINT) AS rn,
                   CAST(COUNT(*) OVER (PARTITION BY nation) AS BIGINT)
                       AS n
            FROM daily
        ),
        pref AS (
            SELECT nation, d, n,
                   CAST(SUM(r) OVER (PARTITION BY nation ORDER BY d
                                     ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) AS u
            FROM ranked
            QUALIFY rn <= n - 1
        ),
        best AS (
            SELECT nation, d, n, u, ABS(u) AS k
            FROM (
                SELECT nation, d, n, u,
                       ROW_NUMBER() OVER (PARTITION BY nation
                                          ORDER BY ABS(u) DESC, d)
                           AS pick
                FROM pref
            ) WHERE pick = 1
        )
        SELECT nation, n, k AS k_stat, u AS u_signed,
               d AS change_date,
               ROUND(2.0 * exp(-6.0 * CAST(k AS DOUBLE) * k
                     / (CAST(n AS DOUBLE) * n * n
                        + CAST(n AS DOUBLE) * n)), 8) AS p_approx
        FROM best
        ORDER BY nation
    """,
    section="TS45",
    doc="Pettitt change-point test per nation on daily revenue: "
    "K = max_t |U_t| with U_t = sum_(i<=t) sum_(j>t) sgn(x_i - x_j), "
    "the rank-based single-breakpoint detector (nonparametric twin "
    "of TS10's CUSUM — no variance estimate, robust to outliers). "
    "The O(n^2) double sum collapses to a CUMSUM via antisymmetry: "
    "R_i = #(x_j < x_i) - #(x_j > x_i) = rank_asc - rank_desc (ties "
    "contribute 0 automatically), and U_t = running sum of R_i — "
    "two rank windows + one frame window, all exact int64. The "
    "argmax is fully tie-broken (earliest date), and the classic "
    "approximate p-value 2 exp(-6K^2/(n^3+n^2)) is one pinned "
    "double expression. Scale: per-nation windows keep series state "
    "executor-local; output is |nations| rows.",
)
def q_ts_pettitt(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    daily = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("o_orderdate").cast("date").alias("d"),
        )
        .agg(
            F.expr(
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 "
                "AS BIGINT)"
            ).alias("cents")
        )
    )
    wn = Window.partitionBy("nation")
    ranked = daily.select(
        "nation",
        "d",
        (
            F.rank().over(wn.orderBy(F.asc("cents")))
            - F.rank().over(wn.orderBy(F.desc("cents")))
        )
        .cast("bigint")
        .alias("r"),
        F.row_number().over(wn.orderBy("d")).cast("bigint").alias("rn"),
        F.count(F.lit(1)).over(wn).cast("bigint").alias("n"),
    )
    pref = ranked.select(
        "nation",
        "d",
        "n",
        "rn",
        F.sum("r")
        .over(wn.orderBy("d").rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("u"),
    ).where(F.col("rn") <= F.col("n") - 1)
    pick = F.row_number().over(
        wn.orderBy(F.desc(F.abs(F.col("u"))), F.asc("d"))
    )
    best = (
        pref.withColumn("pick", pick)
        .where(F.col("pick") == 1)
        .select(
            "nation", "n", F.abs(F.col("u")).alias("k"),
            F.col("u").alias("u_signed"), F.col("d").alias("change_date"),
        )
    )
    nd = F.col("n").cast("double")
    return best.select(
        "nation",
        "n",
        F.col("k").alias("k_stat"),
        "u_signed",
        "change_date",
        F.round(
            F.lit(2.0)
            * F.exp(
                F.lit(-6.0) * F.col("k").cast("double") * F.col("k")
                / (nd * F.col("n") * F.col("n") + nd * F.col("n"))
            ),
            8,
        ).alias("p_approx"),
    )


# ==== wave 179b: ATR / Keltner-channel breakout audit (TS46) ========


@register(
    "q_ts_atr_keltner",
    oracle="""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS d,
                   CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2)) * 100)
                        AS BIGINT) AS h,
                   CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2)) * 100)
                        AS BIGINT) AS l,
                   CAST(arg_max(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                     * 100 AS BIGINT), o_orderkey)
                        AS BIGINT) AS c
            FROM orders GROUP BY 1
        ),
        tr AS (
            SELECT d, h, l, c,
                   CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS rn,
                   GREATEST(h - l,
                            ABS(h - LAG(c) OVER (ORDER BY d)),
                            ABS(l - LAG(c) OVER (ORDER BY d))) AS tru
            FROM daily
        ),
        roll AS (
            SELECT d, c, rn,
                   CAST(SUM(tru) OVER (ORDER BY rn
                        ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS sum_tr,
                   CAST(SUM(h + l + c) OVER (ORDER BY rn
                        ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS mid3
            FROM tr
        ),
        flags AS (
            SELECT CAST(year(d) AS INT) AS yr, sum_tr,
                   CASE WHEN 420 * c > 7 * mid3 + 60 * sum_tr
                        THEN 1 ELSE 0 END AS up,
                   CASE WHEN 420 * c < 7 * mid3 - 60 * sum_tr
                        THEN 1 ELSE 0 END AS dn
            FROM roll WHERE rn >= 21
        )
        SELECT yr,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(up) AS BIGINT) AS n_breakout_up,
               CAST(SUM(dn) AS BIGINT) AS n_breakout_down,
               ROUND(CAST(SUM(sum_tr) AS DOUBLE)
                     / (14.0 * COUNT(*)), 4) AS avg_atr_cents,
               ROUND(CAST(MAX(sum_tr) AS DOUBLE) / 14.0, 4)
                   AS max_atr_cents
        FROM flags GROUP BY yr
    """,
    section="TS46",
    doc="ATR(14) and Keltner-channel breakout audit on the daily "
    "order-price bar series (h/l = day's extreme order, c = last "
    "order by key via arg_max — an integer total-order key, so "
    "open/close need no padded-string device): true range = "
    "max(h-l, |h-c_prev|, |l-c_prev|), the volatility unit behind "
    "every channel/stop system, completing the TS indicator family "
    "(Bollinger measures sigma of closes; ATR measures the traded "
    "RANGE including gaps). Breakout tests clear fractions by the "
    "LCM: c > mid + 2*ATR becomes 420c > 7*mid3 + 60*sum_tr where "
    "mid3 is the 20-day sum of (h+l+c) — every comparison is exact "
    "int64, no float band edges. Simple-MA ATR (not Wilder's "
    "recursive EWMA) keeps the window a fixed 14-row frame. Scale: "
    "one day-grain agg and one global-sort window (range-partition "
    "the sort at 100 TB), per-year summary out.",
)
def q_ts_atr_keltner(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    cents = F.expr(
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
    )
    daily = od.groupBy(
        F.col("o_orderdate").cast("date").alias("d")
    ).agg(
        F.max(cents).cast("bigint").alias("h"),
        F.min(cents).cast("bigint").alias("l"),
        F.expr(
            "CAST(max_by(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
            " AS BIGINT), o_orderkey) AS BIGINT)"
        ).alias("c"),
    )
    w = Window.orderBy("d")
    tr = daily.select(
        "d",
        "h",
        "l",
        "c",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.greatest(
            F.col("h") - F.col("l"),
            F.abs(F.col("h") - F.lag("c").over(w)),
            F.abs(F.col("l") - F.lag("c").over(w)),
        ).alias("tru"),
    )
    wrn = Window.orderBy("rn")
    roll = tr.select(
        "d",
        "c",
        "rn",
        F.sum("tru")
        .over(wrn.rowsBetween(-13, 0))
        .cast("bigint")
        .alias("sum_tr"),
        F.sum(F.col("h") + F.col("l") + F.col("c"))
        .over(wrn.rowsBetween(-19, 0))
        .cast("bigint")
        .alias("mid3"),
    )
    flags = roll.where(F.col("rn") >= 21).select(
        F.year("d").cast("int").alias("yr"),
        "sum_tr",
        F.when(
            420 * F.col("c") > 7 * F.col("mid3") + 60 * F.col("sum_tr"),
            1,
        )
        .otherwise(0)
        .alias("up"),
        F.when(
            420 * F.col("c") < 7 * F.col("mid3") - 60 * F.col("sum_tr"),
            1,
        )
        .otherwise(0)
        .alias("dn"),
    )
    return flags.groupBy("yr").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("up").cast("bigint").alias("n_breakout_up"),
        F.sum("dn").cast("bigint").alias("n_breakout_down"),
        F.round(
            F.sum("sum_tr").cast("double")
            / (F.lit(14.0) * F.count(F.lit(1))),
            4,
        ).alias("avg_atr_cents"),
        F.round(F.max("sum_tr").cast("double") / F.lit(14.0), 4).alias(
            "max_atr_cents"
        ),
    )


# ==== wave 180b: Foster-Stuart records trend test (TS47) ============


@register(
    "q_ts_foster_stuart",
    oracle="""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS d,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) AS cents
            FROM orders GROUP BY 1
        ),
        recs AS (
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS t,
                   CASE WHEN cents > MAX(cents) OVER (ORDER BY d
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING) THEN 1 ELSE 0 END AS u,
                   CASE WHEN cents < MIN(cents) OVER (ORDER BY d
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING) THEN 1 ELSE 0 END AS l
            FROM daily
        ),
        sums AS (
            SELECT CAST(MAX(t) AS BIGINT) AS n,
                   CAST(SUM(u) AS BIGINT) AS n_high,
                   CAST(SUM(l) AS BIGINT) AS n_low,
                   CAST(SUM(u - l) AS BIGINT) AS d_stat,
                   CAST(SUM(u + l) AS BIGINT) AS s_stat,
                   CAST(SUM(1000000000000 // t) AS BIGINT) AS vq
            FROM recs WHERE t >= 2
        )
        SELECT n, n_high, n_low, d_stat, s_stat,
               ROUND(CAST(d_stat AS DOUBLE)
                     / sqrt(2.0 * CAST(vq AS DOUBLE) / 1e12), 6)
                   AS z_trend
        FROM sums
    """,
    section="TS47",
    doc="Foster-Stuart records test on daily revenue: D = #(record "
    "highs) - #(record lows) detects trend, S = their sum detects "
    "variance change — the records-only test that needs NO "
    "distributional assumption and survives any monotone transform "
    "of the data (W22 lists record highs; this turns records into "
    "an inference). Records use strict > / < against the "
    "UNBOUNDED..1 PRECEDING running extreme (ties are not records, "
    "t=1 excluded — both engines agree exactly). Var(D) = 2*sum_"
    "(t>=2) 1/t; the harmonic sum quantizes per row as "
    "floor(1e12/t) so the variance is an exact integer sum, and "
    "z = D/sqrt(var) is one pinned expression. Scale: one day-grain "
    "agg and one global-order window (range-partition at 100 TB); "
    "output is a single scalar row.",
)
def q_ts_foster_stuart(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    wprev = w.rowsBetween(Window.unboundedPreceding, -1)
    recs = daily.select(
        F.row_number().over(w).cast("bigint").alias("t"),
        F.when(F.col("cents") > F.max("cents").over(wprev), 1)
        .otherwise(0)
        .alias("u"),
        F.when(F.col("cents") < F.min("cents").over(wprev), 1)
        .otherwise(0)
        .alias("l"),
    )
    sums = recs.where(F.col("t") >= 2).agg(
        F.max("t").cast("bigint").alias("n"),
        F.sum("u").cast("bigint").alias("n_high"),
        F.sum("l").cast("bigint").alias("n_low"),
        F.sum(F.col("u") - F.col("l")).cast("bigint").alias("d_stat"),
        F.sum(F.col("u") + F.col("l")).cast("bigint").alias("s_stat"),
        F.sum(F.expr("1000000000000 div t")).cast("bigint").alias("vq"),
    )
    return sums.select(
        "n",
        "n_high",
        "n_low",
        "d_stat",
        "s_stat",
        F.round(
            F.col("d_stat").cast("double")
            / F.sqrt(
                F.lit(2.0) * F.col("vq").cast("double") / F.lit(1e12)
            ),
            6,
        ).alias("z_trend"),
    )


# ==== wave 184b: X-bar/R control chart (TS48) =======================

# Shewhart constants for subgroup size n = 5 (A2, D3, D4)
_XBR_A2 = 0.577
_XBR_D4 = 2.114


@register(
    "q_ts_xbar_r_chart",
    oracle=f"""
        WITH sub AS (
            SELECT d, s5, r5 FROM (
                SELECT CAST(o_orderdate AS DATE) AS d,
                       CAST(SUM(c) OVER w AS BIGINT) AS s5,
                       CAST(MAX(c) OVER w - MIN(c) OVER w AS BIGINT)
                           AS r5,
                       ROW_NUMBER() OVER (PARTITION BY CAST(o_orderdate
                           AS DATE) ORDER BY o_orderkey) AS rn
                FROM (
                    SELECT o_orderdate, o_orderkey,
                           CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                * 100 AS BIGINT) AS c
                    FROM orders
                )
                WINDOW w AS (PARTITION BY CAST(o_orderdate AS DATE)
                             ORDER BY o_orderkey
                             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
            ) WHERE rn = 5
        ),
        grand AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS dgroups,
                   CAST(SUM(s5) AS DOUBLE) / (5.0 * COUNT(*)) AS xbar,
                   CAST(SUM(r5) AS DOUBLE) / COUNT(*) AS rbar
            FROM sub
        )
        SELECT g.dgroups,
               ROUND(g.xbar, 4) AS xbar_grand,
               ROUND(g.rbar, 4) AS rbar,
               ROUND(g.xbar + {_XBR_A2} * g.rbar, 4) AS ucl_x,
               ROUND(g.xbar - {_XBR_A2} * g.rbar, 4) AS lcl_x,
               ROUND({_XBR_D4} * g.rbar, 4) AS ucl_r,
               CAST(SUM(CASE WHEN s.s5 / 5.0 > g.xbar
                                  + {_XBR_A2} * g.rbar
                             OR s.s5 / 5.0 < g.xbar
                                  - {_XBR_A2} * g.rbar
                        THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_xbar_violations,
               CAST(SUM(CASE WHEN CAST(s.r5 AS DOUBLE)
                                  > {_XBR_D4} * g.rbar
                        THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_r_violations
        FROM sub s CROSS JOIN grand g
        GROUP BY g.dgroups, g.xbar, g.rbar
    """,
    section="TS48",
    doc="Shewhart X-bar/R control chart over daily rational "
    "subgroups (the first 5 orders of each day by orderkey — a "
    "FIXED subgroup size so the classic n=5 constants A2=0.577, "
    "D4=2.114 apply): per-day mean and range, grand X-double-bar "
    "and R-bar, control limits, and violation counts on both "
    "charts — the subgroup-based SPC pair that TS31's individual-"
    "value Nelson rules cannot replace (the R chart separates "
    "within-day dispersion shifts from level shifts). Subgroup "
    "sums/ranges are exact int64 cents (5-row frame, rn=5 gate "
    "drops short days); limits and flags are pinned double "
    "expressions shared by both engines, so the violation counts "
    "are deterministic integers. Scale: one bounded 5-row window "
    "per day partition, then a day-grain reduction — no global "
    "sort.",
)
def q_ts_xbar_r_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    base = od.select(
        F.col("o_orderdate").cast("date").alias("d"),
        "o_orderkey",
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("c"),
    )
    w5 = (
        Window.partitionBy("d")
        .orderBy("o_orderkey")
        .rowsBetween(-4, 0)
    )
    wrn = Window.partitionBy("d").orderBy("o_orderkey")
    sub = (
        base.select(
            "d",
            F.sum("c").over(w5).cast("bigint").alias("s5"),
            (F.max("c").over(w5) - F.min("c").over(w5))
            .cast("bigint")
            .alias("r5"),
            F.row_number().over(wrn).alias("rn"),
        )
        .where(F.col("rn") == 5)
        .select("d", "s5", "r5")
    )
    grand = sub.agg(
        F.count(F.lit(1)).cast("bigint").alias("dgroups"),
        (
            F.sum("s5").cast("double")
            / (F.lit(5.0) * F.count(F.lit(1)))
        ).alias("xbar"),
        (F.sum("r5").cast("double") / F.count(F.lit(1))).alias("rbar"),
    )
    joined = sub.crossJoin(F.broadcast(grand))
    ucl_x = F.col("xbar") + F.lit(_XBR_A2) * F.col("rbar")
    lcl_x = F.col("xbar") - F.lit(_XBR_A2) * F.col("rbar")
    return joined.groupBy("dgroups", "xbar", "rbar").agg(
        F.sum(
            F.when(
                (F.col("s5") / F.lit(5.0) > ucl_x)
                | (F.col("s5") / F.lit(5.0) < lcl_x),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_xbar_violations"),
        F.sum(
            F.when(
                F.col("r5").cast("double")
                > F.lit(_XBR_D4) * F.col("rbar"),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_r_violations"),
    ).select(
        "dgroups",
        F.round("xbar", 4).alias("xbar_grand"),
        F.round("rbar", 4).alias("rbar"),
        F.round(F.col("xbar") + F.lit(_XBR_A2) * F.col("rbar"), 4).alias(
            "ucl_x"
        ),
        F.round(F.col("xbar") - F.lit(_XBR_A2) * F.col("rbar"), 4).alias(
            "lcl_x"
        ),
        F.round(F.lit(_XBR_D4) * F.col("rbar"), 4).alias("ucl_r"),
        "n_xbar_violations",
        "n_r_violations",
    )


# ==== wave 185b: POT declustering / extremal index (TS49) ===========


@register(
    "q_ts_pot_declustering",
    oracle="""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS d,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) AS cents
            FROM orders GROUP BY 1
        ),
        ranked AS (
            SELECT d, cents,
                   CAST(ROW_NUMBER() OVER (ORDER BY cents DESC, d)
                        AS BIGINT) AS rd,
                   CAST(COUNT(*) OVER () AS BIGINT) AS n,
                   CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS t
            FROM daily
        ),
        exceed AS (
            SELECT t FROM ranked WHERE rd <= n // 20
        ),
        runs AS (
            SELECT t,
                   CASE WHEN t - LAG(t) OVER (ORDER BY t) = 1
                        THEN 0 ELSE 1 END AS new_cluster
            FROM exceed
        ),
        agg AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_exceed,
                   CAST(SUM(COALESCE(new_cluster, 1)) AS BIGINT)
                       AS n_clusters
            FROM runs
        )
        SELECT n_exceed, n_clusters,
               ROUND(CAST(n_exceed AS DOUBLE) / n_clusters, 4)
                   AS mean_cluster_len,
               ROUND(CAST(n_clusters AS DOUBLE) / n_exceed, 6)
                   AS extremal_index
        FROM agg
    """,
    section="TS49",
    doc="Peaks-over-threshold runs declustering on daily revenue: "
    "exceedances = top 5% days (nearest-rank threshold, tie-broken), "
    "a cluster = a maximal run of CONSECUTIVE exceedance days, and "
    "the runs estimator of the extremal index theta = n_clusters / "
    "n_exceedances — theta = 1 means extremes arrive independently, "
    "theta << 1 means they cluster, which is exactly the dependence "
    "that breaks the iid assumption behind A157's GPD fit (the "
    "standard practice is: decluster with THIS estimator, then fit "
    "GPD to cluster maxima). Gaps-and-islands via LAG(t) = t-1 — "
    "all integer day indexes, the first exceedance COALESCEs to a "
    "new cluster. Scale: one day-grain agg, one global-order window "
    "pair, a scalar reduction; the exceedance set is 5% of days.",
)
def q_ts_pot_declustering(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    daily = od.groupBy(
        F.col("o_orderdate").cast("date").alias("d")
    ).agg(
        F.expr(
            "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 "
            "AS BIGINT)"
        ).alias("cents")
    )
    ranked = daily.select(
        "d",
        F.row_number()
        .over(Window.orderBy(F.desc("cents"), F.asc("d")))
        .cast("bigint")
        .alias("rd"),
        F.count(F.lit(1))
        .over(Window.partitionBy())
        .cast("bigint")
        .alias("n"),
        F.row_number()
        .over(Window.orderBy("d"))
        .cast("bigint")
        .alias("t"),
    )
    exceed = ranked.where(F.col("rd") <= F.expr("n div 20")).select("t")
    w = Window.orderBy("t")
    runs = exceed.select(
        F.when(F.col("t") - F.lag("t").over(w) == 1, 0)
        .otherwise(1)
        .alias("new_cluster")
    )
    agg = runs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exceed"),
        F.sum(F.coalesce(F.col("new_cluster"), F.lit(1)))
        .cast("bigint")
        .alias("n_clusters"),
    )
    return agg.select(
        "n_exceed",
        "n_clusters",
        F.round(
            F.col("n_exceed").cast("double") / F.col("n_clusters"), 4
        ).alias("mean_cluster_len"),
        F.round(
            F.col("n_clusters").cast("double") / F.col("n_exceed"), 6
        ).alias("extremal_index"),
    )


# ==== wave 187a: Rayleigh circular seasonality test (TS50) ==========

# cos/sin(2*pi*(m-1)/12) for month m = 1..12, written as shared literal
# constants so NO libm trig runs on either engine (last-ulp cos()
# differences between JVM and C would leak into the resultant).
_RAY_COS = [1.0, 0.8660254037844387, 0.5, 0.0, -0.5,
            -0.8660254037844387, -1.0, -0.8660254037844387, -0.5,
            0.0, 0.5, 0.8660254037844387]
_RAY_SIN = [0.0, 0.5, 0.8660254037844387, 1.0, 0.8660254037844387,
            0.5, 0.0, -0.5, -0.8660254037844387, -1.0,
            -0.8660254037844387, -0.5]
_RAY_COS_SQL = "[" + ", ".join(repr(v) for v in _RAY_COS) + "]"
_RAY_SIN_SQL = "[" + ", ".join(repr(v) for v in _RAY_SIN) + "]"


@register(
    "q_ts_rayleigh_seasonality",
    oracle=f"""
        WITH months AS (
            SELECT CAST(month(CAST(o_orderdate AS DATE)) AS INT) AS m,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM orders GROUP BY 1
        ),
        res AS (
            SELECT CAST(SUM(c) AS BIGINT) AS n,
                   CAST(SUM(CAST(floor(1e6 * c
                        * CAST(({_RAY_COS_SQL})[m] AS DOUBLE))
                        AS BIGINT)) AS BIGINT) / 1e6 AS cx,
                   CAST(SUM(CAST(floor(1e6 * c
                        * CAST(({_RAY_SIN_SQL})[m] AS DOUBLE))
                        AS BIGINT)) AS BIGINT) / 1e6 AS sy
            FROM months
        )
        SELECT n,
               ROUND(sqrt(cx * cx + sy * sy) / n, 6) AS r_bar,
               ROUND(CAST(n AS DOUBLE)
                     * (cx * cx + sy * sy) / (CAST(n AS DOUBLE) * n),
                     4) AS rayleigh_z,
               ROUND(cx / n, 6) AS mean_cos,
               ROUND(sy / n, 6) AS mean_sin
        FROM res
    """,
    section="TS50",
    doc="Rayleigh test for circular uniformity of order dates around "
    "the year: map each month to the unit circle, mean resultant "
    "length R-bar = |sum of unit vectors|/n, z = n R-bar^2 — the "
    "circular-statistics answer to 'is there an annual season at "
    "all', which TS12's day-of-week profile and TS16's seasonal "
    "strength assume rather than test (and unlike a month-bucket "
    "chi-square, Rayleigh is sensitive to the CONCENTRATION "
    "direction, not any deviation). Trig is eliminated: the 12 "
    "cos/sin values are shared literal constants (exact halves and "
    "0.8660254037844387), so no libm cos whose last ulp differs "
    "between JVM and C ever runs; each month's count-weighted term "
    "quantizes floor(1e6 * c * lit) to int64 BEFORE the 12-term sum "
    "(order-insensitive — and the explicit DOUBLE cast matters: "
    "DuckDB types bare decimal array literals as DECIMAL and the "
    "resultant square then overflows DECIMAL(38)). "
    "Scale: one 12-cell agg — the cheapest possible shape.",
)
def q_ts_rayleigh_seasonality(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    months = od.groupBy(
        F.month(F.col("o_orderdate").cast("date"))
        .cast("int")
        .alias("m")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    cos_arr = F.array(*[F.lit(v) for v in _RAY_COS])
    sin_arr = F.array(*[F.lit(v) for v in _RAY_SIN])
    res = months.agg(
        F.sum("c").cast("bigint").alias("n"),
        (
            F.sum(
                F.floor(
                    F.lit(1e6)
                    * F.col("c")
                    * F.element_at(cos_arr, F.col("m"))
                ).cast("bigint")
            ).cast("bigint")
            / F.lit(1e6)
        ).alias("cx"),
        (
            F.sum(
                F.floor(
                    F.lit(1e6)
                    * F.col("c")
                    * F.element_at(sin_arr, F.col("m"))
                ).cast("bigint")
            ).cast("bigint")
            / F.lit(1e6)
        ).alias("sy"),
    )
    return res.select(
        "n",
        F.round(
            F.sqrt(F.col("cx") * F.col("cx") + F.col("sy") * F.col("sy"))
            / F.col("n"),
            6,
        ).alias("r_bar"),
        F.round(
            F.col("n").cast("double")
            * (F.col("cx") * F.col("cx") + F.col("sy") * F.col("sy"))
            / (F.col("n").cast("double") * F.col("n")),
            4,
        ).alias("rayleigh_z"),
        F.round(F.col("cx") / F.col("n"), 6).alias("mean_cos"),
        F.round(F.col("sy") / F.col("n"), 6).alias("mean_sin"),
    )


# ==== wave 191b: dyadic SES grid search (TS51) ======================

_SES_K = 12   # truncated-SES window (tail weight <= 2^-12 per alpha)


def _ses_fc_expr(m: int) -> str:
    """Truncated-SES forecast for dyadic alpha = (2^m - 1)/2^m.

    alpha*(1-alpha)^j = (2^m - 1) / 2^(m*(j+1)) — every weight is an
    integer over a power of two, so each term y*c/2^e is EXACT in
    IEEE doubles, and the fixed left-to-right chain (identical text
    on both engines) pins the remaining rounding order bit-for-bit.
    """
    # integer literals only: Spark parses a bare `3.0` as DECIMAL(2,1)
    # and would run the whole chain in decimal arithmetic while DuckDB
    # runs doubles — CAST(l AS DOUBLE) * int / int keeps both engines
    # in IEEE doubles with exact power-of-two divisions.
    c = 2 ** m - 1
    terms = [
        f"(CAST(l{j} AS DOUBLE) * {c} / {2 ** (m * (j + 1))})"
        for j in range(_SES_K)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = f"({out} + {t})"
    return out


@register(
    "q_ts_ses_grid",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS d,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) AS cents
            FROM orders GROUP BY 1
        ),
        lags AS (
            SELECT cents,
                   {", ".join(
                       f"LAG(cents, {j + 1}) OVER (ORDER BY d) AS l{j}"
                       for j in range(_SES_K))}
            FROM daily
            QUALIFY l{_SES_K - 1} IS NOT NULL
        ),
        errs AS (
            SELECT
                {", ".join(
                    f"CAST(SUM(CAST(floor((cents - {_ses_fc_expr(m)})"
                    f" * (cents - {_ses_fc_expr(m)}) / 256)"
                    f" AS BIGINT)) AS BIGINT) AS sse_{m}"
                    for m in (1, 2, 3))},
                CAST(COUNT(*) AS BIGINT) AS n
            FROM lags
        ),
        long AS (
            SELECT n, CAST(0.5 AS DOUBLE) AS alpha, sse_1 AS sse_q
            FROM errs
            UNION ALL SELECT n, CAST(0.75 AS DOUBLE), sse_2 FROM errs
            UNION ALL SELECT n, CAST(0.875 AS DOUBLE), sse_3 FROM errs
        )
        SELECT alpha, n AS n_days, sse_q,
               ROUND(sqrt(CAST(sse_q AS DOUBLE) * 256.0 / n), 4)
                   AS rmse_cents,
               CASE WHEN RANK() OVER (ORDER BY sse_q, alpha) = 1
                    THEN 1 ELSE 0 END AS is_best
        FROM long
    """,
    section="TS51",
    doc="Simple-exponential-smoothing hyperparameter grid on daily "
    "revenue, alphas restricted to the DYADIC grid {1/2, 3/4, 7/8} "
    "so every smoothing weight alpha(1-alpha)^j = (2^m-1)/2^(m(j+1)) "
    "is an integer over a power of two: y*c/2^e is exact in IEEE "
    "doubles, and the forecast is a fixed left-to-right 12-term "
    "chain whose TEXT is shared verbatim by both engines — the TS2 "
    "power-of-two device extended from one alpha to a backtesting "
    "grid (this is how you pick alpha in production: one pass, all "
    "candidates, SSE per candidate, no refit loop). Truncation at "
    "12 lags is part of the operator contract (tail weight < 2^-12)."
    " Squared errors quantize floor(err^2/256) per row before the "
    "int64 sum; the winner flag is a rank over 3 scalar rows. "
    "Scale: one day-grain agg, 12 LAGs in ONE window pass, all "
    "three alphas share the same lag columns — the grid costs no "
    "extra shuffles.",
)
def q_ts_ses_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    lags = daily.select(
        "cents",
        *[
            F.lag("cents", j + 1).over(w).alias(f"l{j}")
            for j in range(_SES_K)
        ],
    ).where(F.col(f"l{_SES_K - 1}").isNotNull())
    errs = lags.agg(
        *[
            F.expr(
                f"CAST(SUM(CAST(floor((cents - {_ses_fc_expr(m)})"
                f" * (cents - {_ses_fc_expr(m)}) / 256)"
                f" AS BIGINT)) AS BIGINT)"
            ).alias(f"sse_{m}")
            for m in (1, 2, 3)
        ],
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    long = (
        errs.select(
            "n", F.lit(0.5).alias("alpha"),
            F.col("sse_1").alias("sse_q"),
        )
        .unionAll(
            errs.select(
                "n", F.lit(0.75).alias("alpha"),
                F.col("sse_2").alias("sse_q"),
            )
        )
        .unionAll(
            errs.select(
                "n", F.lit(0.875).alias("alpha"),
                F.col("sse_3").alias("sse_q"),
            )
        )
    )
    rk = F.rank().over(Window.orderBy("sse_q", "alpha"))
    return long.select(
        "alpha",
        F.col("n").alias("n_days"),
        "sse_q",
        F.round(
            F.sqrt(
                F.col("sse_q").cast("double") * F.lit(256.0) / F.col("n")
            ),
            4,
        ).alias("rmse_cents"),
        F.when(rk == 1, 1).otherwise(0).alias("is_best"),
    )


# ==== wave 194b: Fano factor dispersion curve (TS52) ================

_FANO_WINDOWS = [1, 4, 24]   # hours
_FANO_SPAN_H = 720           # fixture event range: 30 days


@register(
    "q_ts_fano_factor",
    oracle=f"""
        WITH hrs AS (
            SELECT CAST(date_diff('hour', TIMESTAMP '2024-01-01',
                        ts) AS BIGINT) AS hr
            FROM events
            WHERE ts >= TIMESTAMP '2024-01-01'
              AND date_diff('hour', TIMESTAMP '2024-01-01', ts)
                  < {_FANO_SPAN_H}
        ),
        ws AS (SELECT unnest({_FANO_WINDOWS}) AS w),
        blocks AS (
            SELECT w.w, g.b
            FROM ws w, range(0, {_FANO_SPAN_H}) t(i),
                 LATERAL (SELECT t.i AS b) g
            WHERE t.i < {_FANO_SPAN_H} // w.w
        ),
        counts AS (
            SELECT b.w, b.b,
                   CAST(COUNT(h.hr) AS BIGINT) AS c
            FROM blocks b
            LEFT JOIN hrs h ON h.hr // b.w = b.b
            GROUP BY b.w, b.b
        ),
        mom AS (
            SELECT w,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(c) AS BIGINT) AS s,
                   CAST(SUM(c * c) AS BIGINT) AS q
            FROM counts GROUP BY w
        )
        SELECT CAST(w AS BIGINT) AS w_hours, n AS n_blocks,
               ROUND(CAST(s AS DOUBLE) / n, 4) AS mean_count,
               ROUND((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                     / (n - 1) / (CAST(s AS DOUBLE) / n), 6)
                   AS fano,
               CASE WHEN (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                         / (n - 1) / (CAST(s AS DOUBLE) / n) > 1.5
                    THEN 'overdispersed'
                    WHEN (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                         / (n - 1) / (CAST(s AS DOUBLE) / n) < 0.75
                    THEN 'underdispersed'
                    ELSE 'poisson_like' END AS verdict
        FROM mom
    """,
    section="TS52",
    doc="Fano factor dispersion curve of event arrivals at window "
    "sizes {1, 4, 24} hours: F(w) = Var/Mean of per-window counts — "
    "1 for a Poisson process at EVERY scale, rising with w when "
    "arrivals cluster (the scale-dependence is the signal: TS34's "
    "interevent burstiness is one number, the Fano CURVE says at "
    "which timescale the clustering lives, the standard point-"
    "process diagnostic). Empty windows are REAL zeros: block ids "
    "generate from a literal range and left-join the counts "
    "(GROUP BY alone would silently drop them and bias Var down — "
    "the classic mistake). All moments exact int64 over complete "
    "windows of the fixed 720 h fixture span; Fano and the verdict "
    "thresholds are pinned double expressions. Scale: one hour-"
    "grain map + three window-grain aggs off the same frame.",
)
def q_ts_fano_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hrs = ev.select(
        (
            (
                F.unix_micros("ts")
                - F.unix_micros(
                    F.lit("2024-01-01 00:00:00").cast("timestamp")
                )
            )
            / F.lit(3600000000)
        )
        .cast("bigint")
        .alias("hr")
    ).where((F.col("hr") >= 0) & (F.col("hr") < _FANO_SPAN_H))
    outs = []
    for w in _FANO_WINDOWS:
        nb = _FANO_SPAN_H // w
        blocks = spark.range(nb).select(F.col("id").alias("b"))
        counts = (
            blocks.join(
                hrs.select(
                    F.expr(f"hr div {w}").alias("b")
                ).groupBy("b").agg(
                    F.count(F.lit(1)).cast("bigint").alias("c0")
                ),
                "b",
                "left",
            )
            .select(F.coalesce(F.col("c0"), F.lit(0)).alias("c"))
        )
        outs.append(
            counts.agg(
                F.lit(w).cast("bigint").alias("w_hours"),
                F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
                F.sum("c").cast("bigint").alias("s"),
                F.sum(F.col("c") * F.col("c")).cast("bigint").alias("q"),
            )
        )
    mom = outs[0]
    for o in outs[1:]:
        mom = mom.unionAll(o)
    fano = (
        (
            F.col("q").cast("double")
            - F.col("s").cast("double") * F.col("s") / F.col("n_blocks")
        )
        / (F.col("n_blocks") - 1)
        / (F.col("s").cast("double") / F.col("n_blocks"))
    )
    return mom.select(
        "w_hours",
        "n_blocks",
        F.round(
            F.col("s").cast("double") / F.col("n_blocks"), 4
        ).alias("mean_count"),
        F.round(fano, 6).alias("fano"),
        F.when(fano > F.lit(1.5), F.lit("overdispersed"))
        .when(fano < F.lit(0.75), F.lit("underdispersed"))
        .otherwise(F.lit("poisson_like"))
        .alias("verdict"),
    )


# ==== wave 195b: Allan variance curve (TS53) ========================


@register(
    "q_ts_allan_variance",
    oracle=f"""
        WITH hrs AS (
            SELECT CAST(date_diff('hour', TIMESTAMP '2024-01-01',
                        ts) AS BIGINT) AS hr
            FROM events
            WHERE ts >= TIMESTAMP '2024-01-01'
              AND date_diff('hour', TIMESTAMP '2024-01-01', ts) < 720
        ),
        ws AS (SELECT unnest([1, 4, 24]) AS w),
        blocks AS (
            SELECT w.w, t.i AS b
            FROM ws w, range(0, 720) t(i)
            WHERE t.i < 720 // w.w
        ),
        counts AS (
            SELECT b.w, b.b, CAST(COUNT(h.hr) AS BIGINT) AS c
            FROM blocks b
            LEFT JOIN hrs h ON h.hr // b.w = b.b
            GROUP BY b.w, b.b
        ),
        diffs AS (
            SELECT w,
                   CAST(c - LAG(c) OVER (PARTITION BY w ORDER BY b)
                        AS BIGINT) AS d
            FROM counts
            QUALIFY d IS NOT NULL
        ),
        mom AS (
            SELECT w,
                   CAST(COUNT(*) AS BIGINT) AS m,
                   CAST(SUM(d * d) AS BIGINT) AS sdd
            FROM diffs GROUP BY w
        )
        SELECT CAST(w AS BIGINT) AS tau_hours, m AS n_diffs,
               ROUND(CAST(sdd AS DOUBLE) / (2.0 * m), 6) AS allan_var,
               ROUND(sqrt(CAST(sdd AS DOUBLE) / (2.0 * m)), 6)
                   AS allan_dev
        FROM mom
    """,
    section="TS53",
    doc="Allan variance curve of hourly event counts at tau = "
    "{1, 4, 24} hours: AVAR(tau) = E[(c_(k+1) - c_k)^2]/2 over "
    "adjacent non-overlapping windows — the metrology-standard "
    "drift-vs-noise separator (white noise: AVAR ~ mean, flat "
    "Allan deviation in relative terms; rate DRIFT makes AVAR grow "
    "with tau — the slope distinguishes failure modes where plain "
    "variance cannot, because Allan differencing cancels any "
    "constant level exactly). Shares TS52's generated-zero-block "
    "device (empty hours are real zeros), adjacent diffs are exact "
    "int64 via one LAG per tau, and the only doubles are the final "
    "two divisions. Scale: hour-grain map + per-tau lag windows "
    "over at most 720 rows of state.",
)
def q_ts_allan_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hrs = ev.select(
        (
            (
                F.unix_micros("ts")
                - F.unix_micros(
                    F.lit("2024-01-01 00:00:00").cast("timestamp")
                )
            )
            / F.lit(3600000000)
        )
        .cast("bigint")
        .alias("hr")
    ).where((F.col("hr") >= 0) & (F.col("hr") < 720))
    outs = []
    for w in [1, 4, 24]:
        nb = 720 // w
        blocks = spark.range(nb).select(F.col("id").alias("b"))
        counts = blocks.join(
            hrs.select(F.expr(f"hr div {w}").alias("b"))
            .groupBy("b")
            .agg(F.count(F.lit(1)).cast("bigint").alias("c0")),
            "b",
            "left",
        ).select(
            "b", F.coalesce(F.col("c0"), F.lit(0)).alias("c")
        )
        wd = Window.orderBy("b")
        diffs = counts.select(
            (F.col("c") - F.lag("c").over(wd))
            .cast("bigint")
            .alias("d")
        ).where(F.col("d").isNotNull())
        outs.append(
            diffs.agg(
                F.lit(w).cast("bigint").alias("tau_hours"),
                F.count(F.lit(1)).cast("bigint").alias("n_diffs"),
                F.sum(F.col("d") * F.col("d"))
                .cast("bigint")
                .alias("sdd"),
            )
        )
    mom = outs[0]
    for o in outs[1:]:
        mom = mom.unionAll(o)
    avar = F.col("sdd").cast("double") / (
        F.lit(2.0) * F.col("n_diffs")
    )
    return mom.select(
        "tau_hours",
        "n_diffs",
        F.round(avar, 6).alias("allan_var"),
        F.round(F.sqrt(avar), 6).alias("allan_dev"),
    )


# ==== wave 201a: dyadic MACD crossover census (TS54) ================

_MACD_K = 12   # truncation depth for both EMAs


def _macd_ema_expr(kind: str) -> str:
    """Truncated EMA as an exact fixed chain (TS51 device).

    fast:  alpha = 1/2  -> weight_j = 1/2^(j+1)
    slow:  alpha = 1/4  -> weight_j = 3^j/4^(j+1) (3^j exact int64)
    """
    terms = []
    for j in range(_MACD_K):
        if kind == "fast":
            terms.append(f"(CAST(l{j} AS DOUBLE) / {2 ** (j + 1)})")
        else:
            terms.append(
                f"(CAST(l{j} AS DOUBLE) * {3 ** j}"
                f" / {4 ** (j + 1)})"
            )
    out = terms[0]
    for t in terms[1:]:
        out = f"({out} + {t})"
    return out


@register(
    "q_ts_macd_crossover",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS d,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) AS cents
            FROM orders GROUP BY 1
        ),
        lags AS (
            SELECT d,
                   {", ".join(
                       f"LAG(cents, {j}) OVER (ORDER BY d) AS l{j}"
                       for j in range(_MACD_K))}
            FROM daily
            QUALIFY l{_MACD_K - 1} IS NOT NULL
        ),
        macd AS (
            SELECT d,
                   CASE WHEN {_macd_ema_expr("fast")}
                             > {_macd_ema_expr("slow")}
                        THEN 1 ELSE 0 END AS above
            FROM lags
        ),
        flips AS (
            SELECT d, above,
                   CASE WHEN above
                             <> LAG(above) OVER (ORDER BY d)
                        THEN 1 ELSE 0 END AS flip,
                   CASE WHEN above = 1
                             AND LAG(above) OVER (ORDER BY d) = 0
                        THEN 1 ELSE 0 END AS golden
            FROM macd
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(above) AS BIGINT) AS n_days_above,
               CAST(SUM(flip) AS BIGINT) AS n_crossovers,
               CAST(SUM(golden) AS BIGINT) AS n_golden_crosses,
               CAST(MAX(CASE WHEN above = 1 THEN d END) AS DATE)
                   AS last_day_above
        FROM flips
    """,
    section="TS54",
    doc="MACD crossover census on dyadic EMAs: fast alpha = 1/2 "
    "(weights 1/2^(j+1)), slow alpha = 1/4 (weights 3^j/4^(j+1), "
    "3^j exact int64) — the momentum-crossing indicator completing "
    "the TS technical family, with every EMA term exact in IEEE "
    "doubles and both truncated chains shared VERBATIM between "
    "engines (TS51 device; the above/below flag is therefore a "
    "deterministic compare, and crossover counts are exact "
    "integers). Golden crosses (fast rising through slow) are the "
    "entry signal trading systems count; n_crossovers >> "
    "n_days/10 means the two horizons see only noise. Scale: one "
    "day-grain agg, 12 LAGs in one window pass, one lag on the "
    "flag — no state beyond the window frames.",
)
def q_ts_macd_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    lags = daily.select(
        "d",
        *[
            F.lag("cents", j).over(w).alias(f"l{j}")
            for j in range(_MACD_K)
        ],
    ).where(F.col(f"l{_MACD_K - 1}").isNotNull())
    macd = lags.select(
        "d",
        F.when(
            F.expr(_macd_ema_expr("fast"))
            > F.expr(_macd_ema_expr("slow")),
            1,
        )
        .otherwise(0)
        .alias("above"),
    )
    flips = macd.select(
        "d",
        "above",
        F.when(
            F.col("above") != F.lag("above").over(w), 1
        )
        .otherwise(0)
        .alias("flip"),
        F.when(
            (F.col("above") == 1)
            & (F.lag("above").over(w) == 0),
            1,
        )
        .otherwise(0)
        .alias("golden"),
    )
    return flips.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("above").cast("bigint").alias("n_days_above"),
        F.sum("flip").cast("bigint").alias("n_crossovers"),
        F.sum("golden").cast("bigint").alias("n_golden_crosses"),
        F.max(F.when(F.col("above") == 1, F.col("d")))
        .cast("date")
        .alias("last_day_above"),
    )


# ==== wave 204a: mean-reversion half-life of a spread (TS55) ========


@register(
    "q_ts_spread_halflife",
    oracle="""
        WITH daily AS (
            SELECT CAST(o.o_orderdate AS DATE) AS d,
                   CAST(SUM(CASE WHEN r.r_name = 'AMERICA'
                        THEN CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                        ELSE 0 END) AS BIGINT)
                   - CAST(SUM(CASE WHEN r.r_name = 'EUROPE'
                        THEN CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                        ELSE 0 END) AS BIGINT) AS s
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name IN ('AMERICA', 'EUROPE')
            GROUP BY 1
        ),
        pairs AS (
            SELECT LAG(s) OVER (ORDER BY d) AS x,
                   s - LAG(s) OVER (ORDER BY d) AS dy
            FROM daily
            QUALIFY x IS NOT NULL
        ),
        mom AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(dy) AS BIGINT) AS sdy,
                   SUM(CAST(x AS HUGEINT) * x) AS sxx,
                   SUM(CAST(x AS HUGEINT) * dy) AS sxdy
            FROM pairs
        ),
        beta AS (
            SELECT n,
                   (CAST(n AS DOUBLE)
                    * (CAST(sxdy // 4294967296 AS DOUBLE)
                       * 4294967296.0
                       + CAST(sxdy % 4294967296 AS DOUBLE))
                    - CAST(sx AS DOUBLE) * sdy)
                   / (CAST(n AS DOUBLE)
                      * (CAST(sxx // 4294967296 AS DOUBLE)
                         * 4294967296.0
                         + CAST(sxx % 4294967296 AS DOUBLE))
                      - CAST(sx AS DOUBLE) * sx) AS b
            FROM mom
        )
        SELECT n, ROUND(b, 8) AS beta,
               ROUND(CASE WHEN b > -1.0 AND b < 0.0
                     THEN -ln(2.0) / ln(1.0 + b) END, 4)
                   AS halflife_days,
               CASE WHEN b <= -1.0 THEN 'overshooting'
                    WHEN b >= 0.0 THEN 'non_reverting'
                    ELSE 'mean_reverting' END AS regime
        FROM beta
    """,
    section="TS55",
    doc="Mean-reversion half-life of the AMERICA-EUROPE revenue "
    "spread: fit ds_t = alpha + beta*s_(t-1) (the TS22 "
    "Dickey-Fuller regression on the SPREAD) and report halflife = "
    "-ln2 / ln(1+beta) — the pairs-trading number that converts a "
    "cointegration verdict (TS38) into a holding period: a 12-day "
    "half-life is tradeable, a 200-day one is not. Same integer-"
    "moment OLS device as TS22 (int128 cross moments, hi/lo "
    "rebuild); the half-life is defined only for -1 < beta < 0 — "
    "the regime CASE makes non-reverting and overshooting spreads "
    "explicit instead of NaN. Scale: day-grain conditional agg, "
    "one lag window, scalar algebra.",
)
def q_ts_spread_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
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
            (
                F.expr(
                    "CAST(SUM(CASE WHEN r_name = 'AMERICA'"
                    " THEN CAST(o_totalprice AS DECIMAL(18,2)) * 100"
                    " ELSE 0 END) AS BIGINT)"
                )
                - F.expr(
                    "CAST(SUM(CASE WHEN r_name = 'EUROPE'"
                    " THEN CAST(o_totalprice AS DECIMAL(18,2)) * 100"
                    " ELSE 0 END) AS BIGINT)"
                )
            ).alias("s")
        )
    )
    w = Window.orderBy("d")
    pairs = daily.select(
        F.lag("s").over(w).alias("x"),
        (F.col("s") - F.lag("s").over(w)).alias("dy"),
    ).where(F.col("x").isNotNull())
    mom = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("dy").cast("bigint").alias("sdy"),
        F.sum(F.col("x").cast(DecimalType(38, 0)) * F.col("x")).alias(
            "sxx"
        ),
        F.sum(F.col("x").cast(DecimalType(38, 0)) * F.col("dy")).alias(
            "sxdy"
        ),
    )
    hi_lo = (
        "cast({0} div 4294967296 as double) * 4294967296.0d"
        " + cast({0} % 4294967296 as double)"
    )
    nd = F.col("n").cast("double")
    b = (
        nd * F.expr(hi_lo.format("sxdy"))
        - F.col("sx").cast("double") * F.col("sdy")
    ) / (
        nd * F.expr(hi_lo.format("sxx"))
        - F.col("sx").cast("double") * F.col("sx")
    )
    return mom.select(
        "n",
        F.round(b, 8).alias("beta"),
        F.round(
            F.when(
                (b > F.lit(-1.0)) & (b < F.lit(0.0)),
                -F.log(F.lit(2.0)) / F.log(F.lit(1.0) + b),
            ),
            4,
        ).alias("halflife_days"),
        F.when(b <= F.lit(-1.0), F.lit("overshooting"))
        .when(b >= F.lit(0.0), F.lit("non_reverting"))
        .otherwise(F.lit("mean_reverting"))
        .alias("regime"),
    )
