"""Registered queries q_ts_resample_ohlc..q_ts_obv (chunk 1 of 2 split from timeseries.py — see timeseries_shared.py for shared helpers)."""

from __future__ import annotations
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType
from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register
from ai_to_cvent_etl_spark.queries._util import dec2
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ai_to_cvent_etl_spark.queries.timeseries_shared import (  # noqa: F401
    _ACF_MAX_LAG,
    _BD5,
    _BOLL_N,
    _CP_MINSEG,
    _CROSTON_MAX_PART,
    _ES_WINDOW,
    _FC_LAG,
    _HOLT_A,
    _HOLT_B,
    _HURST_NS,
    _KEY_DUCK,
    _KEY_SPARK,
    _LB_MAX_LAG,
    _MP_M,
    _MP_TYPE,
    _PACF_R_DUCK,
    _PERIODS,
    _PE_MIN_WINDOWS,
    _PI2,
    _ROLLCORR_ORACLE,
    _RSI_N,
    _SAX_BP_HI,
    _SAX_BP_LO,
    _SAX_SEG_DAYS,
    _TS12_HALF,
    _TS12_QS,
    _TS15_HALF,
    _TS16_HALF,
    _TS16_K,
    _TS5_MIN_VALUE,
    _TW_SESS_US,
    _VR_KS,
    _WAU_DAYS,
    _XCORR_A,
    _XCORR_B,
    _XCORR_MAX_LAG,
    _Z_FRAME,
    _Z_MIN_N,
    _Z_T,
    _se_fold,
    _vr_oracle,
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
    # r9 (guide §2.4 fewer passes): the per-k horizon sums ran one
    # bounded window + one aggregate PER k, crossJoined against the
    # diff-variance aggregate — 1 + 2|K| stages unioned. The k-window
    # sum over integer diffs equals a prefix-sum difference EXACTLY
    # (bigint arithmetic): y_k(i) = cs(i) - cs(i-k), defined for
    # i >= k-1 (the old COUNT(*)==k full-window condition). One window
    # pass computes the prefix sum and every lag (one WindowExec
    # evaluates all lag offsets over the same sort), one pivoted
    # aggregate computes every k's moments, and inline() emits the |K|
    # result rows from the single moment row. Day-grain bounded, same
    # values to the bit.
    wi = Window.orderBy("i")
    cums = dd.select(
        "i",
        "x",
        F.sum("x")
        .over(wi.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cs"),
    )
    ys = cums.select(
        "x",
        *[
            F.when(
                F.col("i") >= k - 1,
                F.col("cs")
                - F.coalesce(F.lag("cs", k).over(wi), F.lit(0)),
            ).alias(f"y{k}")
            for k in _VR_KS
        ],
    )
    aggs = [
        "sum(cast(x as decimal(19,0)) * cast(x as decimal(19,0))) as sq1",
        "sum(cast(x as decimal(19,0))) as sm1",
        "count(1) as cnt1",
    ]
    for k in _VR_KS:
        aggs += [
            f"sum(cast(y{k} as decimal(19,0))"
            f" * cast(y{k} as decimal(19,0))) as sq{k}",
            f"sum(cast(y{k} as decimal(19,0))) as sm{k}",
            f"count(y{k}) as cnt{k}",
        ]
    m = ys.agg(*[F.expr(a) for a in aggs])
    var1 = (
        "((cast(sq1 as double) - cast(sm1 as double)"
        " * cast(sm1 as double) / cnt1) / (cnt1 - 1))"
    )
    structs = ", ".join(
        f"named_struct('k', cast({k} as bigint),"
        f" 'n_diffs', cast(cnt1 as bigint),"
        f" 'n_windows', cast(cnt{k} as bigint),"
        f" 'variance_ratio', round(((cast(sq{k} as double)"
        f" - cast(sm{k} as double) * cast(sm{k} as double) / cnt{k})"
        f" / (cnt{k} - 1)) / ({float(k)}d * {var1}), 6))"
        for k in _VR_KS
    )
    return m.selectExpr(f"inline(array({structs}))")

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
