"""Registered queries q_ts_stochastic..q_ts_spread_halflife (chunk 2 of 2 split from timeseries.py — see timeseries_shared.py for shared helpers)."""

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
    _AROON_N,
    _CP_MINSEG,
    _FANO_SPAN_H,
    _FANO_WINDOWS,
    _HAAR_N,
    _ITS_CUT_M,
    _MACD_K,
    _RAY_COS,
    _RAY_COS_SQL,
    _RAY_SIN,
    _RAY_SIN_SQL,
    _SES_K,
    _STO_D,
    _STO_N,
    _ULCER_N,
    _XBR_A2,
    _XBR_D4,
    _haar_levels_sql,
    _macd_ema_expr,
    _ses_fc_expr,
)

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
            ORDER BY (CAST((CAST(cq AS HUGEINT) * (t) - CAST(cs AS HUGEINT) * (cs)) * ((n - t)) + (CAST((tq - cq) AS HUGEINT) * ((n - t)) - CAST((ts - cs) AS HUGEINT) * ((ts - cs))) * (t) AS DOUBLE) / CAST((t) * ((n - t)) AS DOUBLE)),
                     day
            LIMIT 1
        ),
        root AS (
            SELECT 'root' AS segment, b.kday AS split_day,
                   CAST(b.k AS BIGINT) AS n_left,
                   CAST(b.n - b.k AS BIGINT) AS n_right,
                   (CAST((CAST(b.kcq AS HUGEINT) * (b.k) - CAST(b.kcs AS HUGEINT) * (b.kcs)) * ((b.n - b.k)) + (CAST((b.tq - b.kcq) AS HUGEINT) * ((b.n - b.k)) - CAST((b.ts - b.kcs) AS HUGEINT) * ((b.ts - b.kcs))) * (b.k) AS DOUBLE) / CAST((b.k) * ((b.n - b.k)) AS DOUBLE)) AS sse_split,
                   (CAST(CAST(b.tq AS HUGEINT) * (b.n) - CAST(b.ts AS HUGEINT) * (b.ts) AS DOUBLE) / (b.n)) AS sse_single
            FROM best1 b
        ),
        lft AS (
            SELECT 'left' AS segment, c.day AS split_day,
                   CAST(c.t AS BIGINT) AS n_left,
                   CAST(b.k - c.t AS BIGINT) AS n_right,
                   (CAST((CAST(c.cq AS HUGEINT) * (c.t) - CAST(c.cs AS HUGEINT) * (c.cs)) * ((b.k - c.t)) + (CAST((b.kcq - c.cq) AS HUGEINT) * ((b.k - c.t)) - CAST((b.kcs - c.cs) AS HUGEINT) * ((b.kcs - c.cs))) * (c.t) AS DOUBLE) / CAST((c.t) * ((b.k - c.t)) AS DOUBLE)) AS sse_split,
                   (CAST(CAST(b.kcq AS HUGEINT) * (b.k) - CAST(b.kcs AS HUGEINT) * (b.kcs) AS DOUBLE) / (b.k)) AS sse_single
            FROM cum c CROSS JOIN best1 b
            WHERE c.t >= {_CP_MINSEG} AND c.t <= b.k - {_CP_MINSEG}
            ORDER BY (CAST((CAST(c.cq AS HUGEINT) * (c.t) - CAST(c.cs AS HUGEINT) * (c.cs)) * ((b.k - c.t)) + (CAST((b.kcq - c.cq) AS HUGEINT) * ((b.k - c.t)) - CAST((b.kcs - c.cs) AS HUGEINT) * ((b.kcs - c.cs))) * (c.t) AS DOUBLE) / CAST((c.t) * ((b.k - c.t)) AS DOUBLE)),
                     c.day
            LIMIT 1
        ),
        rgt AS (
            SELECT 'right' AS segment, c.day AS split_day,
                   CAST(c.t - b.k AS BIGINT) AS n_left,
                   CAST(b.n - c.t AS BIGINT) AS n_right,
                   (CAST((CAST((c.cq - b.kcq) AS HUGEINT) * ((c.t - b.k)) - CAST((c.cs - b.kcs) AS HUGEINT) * ((c.cs - b.kcs))) * ((b.n - c.t)) + (CAST((b.tq - c.cq) AS HUGEINT) * ((b.n - c.t)) - CAST((b.ts - c.cs) AS HUGEINT) * ((b.ts - c.cs))) * ((c.t - b.k)) AS DOUBLE) / CAST(((c.t - b.k)) * ((b.n - c.t)) AS DOUBLE)) AS sse_split,
                   (CAST(CAST((b.tq - b.kcq) AS HUGEINT) * ((b.n - b.k)) - CAST((b.ts - b.kcs) AS HUGEINT) * ((b.ts - b.kcs)) AS DOUBLE) / ((b.n - b.k))) AS sse_single
            FROM cum c CROSS JOIN best1 b
            WHERE c.t >= b.k + {_CP_MINSEG} AND c.t <= b.n - {_CP_MINSEG}
            ORDER BY (CAST((CAST((c.cq - b.kcq) AS HUGEINT) * ((c.t - b.k)) - CAST((c.cs - b.kcs) AS HUGEINT) * ((c.cs - b.kcs))) * ((b.n - c.t)) + (CAST((b.tq - c.cq) AS HUGEINT) * ((b.n - c.t)) - CAST((b.ts - c.cs) AS HUGEINT) * ((b.ts - c.cs))) * ((c.t - b.k)) AS DOUBLE) / CAST(((c.t - b.k)) * ((b.n - c.t)) AS DOUBLE)),
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
    "level-1 winner. r6 exactness device: every SSE is an exact integer "
    "numerator b*n - a*a (DECIMAL(38)/HUGEINT) with ONE double division "
    "at the end — bit-identical cross-engine at any SF (float "
    "association and 4dp rounds of 16-sig-digit values both diverged at "
    "sf1); ties to earlier day; "
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

    # r6 exactness device (sf1 sweep): SSE = (b*nn - a*a)/nn with the
    # NUMERATOR computed in exact DECIMAL(38,0)/HUGEINT integers and ONE
    # double division at the end — bit-identical cross-engine at any SF.
    # Float-association and ROUND(...,4)-at-16-sig-digits both diverged
    # between engines once the values crossed ~1e12.
    _D38 = DecimalType(38, 0)

    def _sse_num(a, b, nn):
        return b.cast(_D38) * nn - a.cast(_D38) * a

    def _sse_exact(a, b, nn):
        return _sse_num(a, b, nn).cast("double") / nn.cast("double")

    def _split_exact(a1, b1, n1, a2, b2, n2):
        num = _sse_num(a1, b1, n1) * n2 + _sse_num(a2, b2, n2) * n1
        return num.cast("double") / (n1 * n2).cast("double")

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
        _split_exact(
            F.col("cs"), F.col("cq"), F.col("t"),
            F.col("ts") - F.col("cs"),
            F.col("tq") - F.col("cq"),
            F.col("n") - F.col("t"),
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
        F.col("root_sse").alias("sse_split"),
        _sse_exact(F.col("bts"), F.col("btq"), F.col("bn")).alias(
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
        _split_exact(
            F.col("cs"), F.col("cq"), F.col("t"),
            F.col("kcs") - F.col("cs"),
            F.col("kcq") - F.col("cq"),
            F.col("k") - F.col("t"),
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
            F.col("sse2").alias("sse_split"),
            _sse_exact(F.col("kcs"), F.col("kcq"), F.col("k")).alias(
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
        _split_exact(
            F.col("cs") - F.col("kcs"),
            F.col("cq") - F.col("kcq"),
            F.col("t") - F.col("k"),
            F.col("bts") - F.col("cs"),
            F.col("btq") - F.col("cq"),
            F.col("bn") - F.col("t"),
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
            F.col("sse2").alias("sse_split"),
            _sse_exact(
                F.col("bts") - F.col("kcs"),
                F.col("btq") - F.col("kcq"),
                F.col("bn") - F.col("k"),
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
                    f" * (cents - {_ses_fc_expr(m)}) / 1048576)"
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
               ROUND(sqrt(CAST(sse_q AS DOUBLE) * 1048576.0 / n), 4)
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
    " Squared errors quantize floor(err^2/2^20) per row before the "
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
                f" * (cents - {_ses_fc_expr(m)}) / 1048576)"
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
                F.col("sse_q").cast("double") * F.lit(1048576.0) / F.col("n")
            ),
            4,
        ).alias("rmse_cents"),
        F.when(rk == 1, 1).otherwise(0).alias("is_best"),
    )

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
