"""SURVEY §2.5/§2.6 — window functions (W1-W7) and top-k (O1).

Every window ORDER BY ends in a unique key (§5.3 rule 3) so ranks and frames
are peer-free and deterministic. Windowed money sums are decimal-exact.
At scale: a window shuffles once on its partition key; the per-user/event
windows here partition on high-cardinality keys, so no executor ever
materializes more than one key-group of rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from ai_to_cvent_etl_spark.queries._util import ORACLE_MONEY_SUM


def _money(c):
    return c.cast(DecimalType(12, 2))


@register(
    "q_win_topk_per_group",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
            FROM orders
        ) WHERE rn <= 3
    """,
    section="W1",
    doc="Top-3 orders per customer (row_number, unique-key tie-break).",
)
def q_win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "q_win_rank_dense_ntile",
    oracle="""
        SELECT p_partkey, p_retailprice,
               CAST(RANK() OVER w AS BIGINT) AS rnk,
               CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
               CAST(NTILE(4) OVER w AS BIGINT) AS quartile
        FROM part
        WINDOW w AS (ORDER BY p_retailprice DESC, p_partkey)
    """,
    section="W2",
)
def q_win_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale note (r6): the W2 ordering (price DESC, partkey) is a total
    # order, so there are no peer groups and RANK = DENSE_RANK = the global
    # row number; NTILE(4) is arithmetic on rn given n (first n%4 buckets
    # get one extra row). Computed on the distributed global row number —
    # no single-partition window over the corpus.
    from ai_to_cvent_etl_spark.operators.ranking import global_row_number

    part = load_table(spark, sf_dir, "part")
    rn = global_row_number(
        part.select("p_partkey", "p_retailprice"),
        [F.col("p_retailprice").desc(), F.col("p_partkey").asc()],
    )
    n = part.agg(F.count(F.lit(1)).alias("__n"))
    q = F.col("__n") / 4  # integral div applied below with explicit floor
    base = F.floor(q).cast("bigint")
    rem = (F.col("__n") % 4).cast("bigint")
    big_span = rem * (base + 1)  # rows covered by the (base+1)-sized buckets
    quartile = F.when(
        F.col("rn") <= big_span,
        (F.col("rn") - 1) / (base + 1),
    ).otherwise(rem + F.floor((F.col("rn") - big_span - 1) / base))
    return rn.crossJoin(F.broadcast(n)).select(
        "p_partkey",
        "p_retailprice",
        F.col("rn").alias("rnk"),
        F.col("rn").alias("drnk"),
        (F.floor(quartile) + 1).cast("bigint").alias("quartile"),
    )


@register(
    "q_win_lag_lead",
    oracle="""
        SELECT event_id, user_id, ts,
               epoch_us(ts) - epoch_us(LAG(ts) OVER w) AS gap_us,
               LEAD(event_type) OVER w AS next_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    section="W3",
    doc="Per-user inter-event gap in exact integer microseconds.",
)
def q_win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "event_id",
        "user_id",
        "ts",
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))).alias(
            "gap_us"
        ),
        F.lead("event_type").over(w).alias("next_type"),
    )


@register(
    "q_win_running_sum",
    oracle="""
        SELECT o_custkey, o_orderkey, o_orderdate,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
                    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS running_total
        FROM orders
    """,
    section="W4",
)
def q_win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(_money(F.col("o_totalprice"))).over(w).cast("double").alias(
            "running_total"
        ),
    )


@register(
    "q_win_moving_avg",
    oracle="""
        SELECT event_id, user_id,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE)
                   / COUNT(value) OVER w AS mov_avg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    section="W5",
    doc="3-row moving average via decimal-exact windowed sum / count.",
)
def q_win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return events.select(
        "event_id",
        "user_id",
        (
            F.sum(_money(F.col("value"))).over(w).cast("double")
            / F.count("value").over(w)
        ).alias("mov_avg"),
    )


@register(
    "q_win_first_last",
    oracle="""
        SELECT event_id, user_id,
               FIRST_VALUE(value) OVER w AS first_val,
               LAST_VALUE(event_id) OVER w AS last_event
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    section="W6",
    doc="first/last with explicit full frame (last's default frame is a trap).",
)
def q_win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return events.select(
        "event_id",
        "user_id",
        F.first("value").over(w).alias("first_val"),
        F.last("event_id").over(w).alias("last_event"),
    )


@register(
    "q_win_range_frame",
    oracle="""
        SELECT o_orderkey, o_totalprice,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
                    PARTITION BY o_orderpriority
                    ORDER BY o_totalprice
                    RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING
               ) AS DOUBLE) AS nearby_sum
        FROM orders
    """,
    section="W7",
    doc="RANGE frame over a numeric ordering key (value-defined peer set), "
    "partition-bounded: an unpartitioned numeric range frame degenerates to "
    "ONE sorted task at any scale (SCALE.md 'Windows'), so the declared form "
    "carries a partition key like every production range-frame query should.",
)
def q_win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy(F.col("o_totalprice"))
        .rangeBetween(-1000, 1000)
    )
    return orders.select(
        "o_orderkey",
        "o_totalprice",
        F.sum(_money(F.col("o_totalprice"))).over(w).cast("double").alias(
            "nearby_sum"
        ),
    )


@register(
    "q_order_limit_topk",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10
    """,
    section="O1",
    doc="Global top-10 (TakeOrderedAndProject); tie-break makes the SET stable.",
)
def q_order_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "q_order_offset_page",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10 OFFSET 10
    """,
    section="O2",
    doc="Offset pagination: page 2 of the O1 total order (rows 11-20). The "
    "unique-key tie-break makes every page a stable set. Scale note: OFFSET "
    "is inherently a top-(offset+limit) computation — Spark runs "
    "GlobalLimit(20) then drops 10, fine for page-sized offsets; deep "
    "pagination at 100 TB should keyset-paginate (WHERE key > last_seen "
    "ORDER BY key LIMIT n) instead, which this query's tie-break enables.",
)
def q_order_offset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .offset(10)
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "q_win_pareto",
    oracle="""
        WITH spend AS (
            SELECT o_custkey,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS s
            FROM orders GROUP BY o_custkey
        ),
        ranked AS (
            SELECT o_custkey, s,
                   CAST(ROW_NUMBER() OVER (ORDER BY s DESC, o_custkey)
                        AS BIGINT) AS rnk,
                   SUM(s) OVER (ORDER BY s DESC, o_custkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS cum,
                   SUM(s) OVER () AS total
            FROM spend
        )
        SELECT o_custkey, rnk,
               CAST(s AS DOUBLE) AS spend,
               CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) AS cum_share
        FROM ranked
        WHERE rnk <= 100
    """,
    section="W16",
    doc="Pareto concentration curve: customers ranked by total spend, "
    "cumulative share of global revenue at each rank (the 80/20 "
    "diagnostic). Per-customer sums, running sum, and the global total "
    "are all EXACT DECIMAL (order-insensitive); the single double "
    "division is bit-deterministic. Output truncated at rank 100 with a "
    "unique-key tie-break. The ranking is one global sort of the "
    "CUSTOMER aggregate (not the orders table) — entity-level "
    "cardinality, fine to sort at any scale; the running sum rides the "
    "same sorted window.",
)
def q_win_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import dec2

    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(dec2(F.col("o_totalprice"))).alias("s")
    )
    w = Window.orderBy(F.desc("s"), F.asc("o_custkey"))
    ranked = spend.select(
        "o_custkey",
        "s",
        F.row_number().over(w).cast("bigint").alias("rnk"),
        F.sum("s")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum"),
        F.sum("s").over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("total"),
    )
    return ranked.filter(F.col("rnk") <= 100).select(
        "o_custkey",
        "rnk",
        F.col("s").cast("double").alias("spend"),
        (F.col("cum").cast("double") / F.col("total").cast("double")).alias(
            "cum_share"
        ),
    )


# ==== from analytics_r3b ===========================================

@register(
    "q_win_streak",
    oracle="""
        WITH days AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        ),
        marked AS (
            SELECT user_id, day,
                   CASE WHEN date_diff('day',
                            lag(day) OVER (PARTITION BY user_id ORDER BY day),
                            day) = 1
                        THEN 0 ELSE 1 END AS brk
            FROM days
        ),
        islands AS (
            SELECT user_id, day,
                   CAST(SUM(brk) OVER (
                       PARTITION BY user_id ORDER BY day
                   ) AS BIGINT) AS streak_id
            FROM marked
        ),
        streaks AS (
            SELECT user_id, streak_id,
                   CAST(COUNT(*) AS BIGINT) AS len,
                   MIN(day) AS streak_start
            FROM islands GROUP BY user_id, streak_id
        )
        SELECT user_id,
               CAST(MAX(len) AS BIGINT) AS longest_streak,
               CAST(COUNT(*) AS BIGINT) AS n_streaks,
               CAST(SUM(len) AS BIGINT) AS active_days,
               MIN(CASE WHEN len = ml THEN streak_start END) AS best_start
        FROM (
            SELECT s.*, MAX(len) OVER (PARTITION BY user_id) AS ml
            FROM streaks s
        )
        GROUP BY user_id
    """,
    section="W15",
    doc="Longest consecutive-active-day streak per user (gaps-and-islands "
    "over distinct activity days): break flags from lag(day), running sum "
    "as island id, two keyed aggregations — the engagement-streak metric "
    "every product-analytics warehouse computes. best_start disambiguates "
    "equal-length streaks by earliest start (deterministic). All-integer "
    "+ dates => exact. One window sort + two aggs per user at any scale.",
)
def q_win_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    marked = days.withColumn(
        "brk",
        F.when(
            F.datediff(F.col("day"), F.lag("day").over(w)) == 1, F.lit(0)
        ).otherwise(F.lit(1)),
    )
    islands = marked.withColumn(
        "streak_id", F.sum("brk").over(w).cast("bigint")
    )
    streaks = islands.groupBy("user_id", "streak_id").agg(
        F.count(F.lit(1)).alias("len"),
        F.min("day").alias("streak_start"),
    )
    wml = Window.partitionBy("user_id")
    s2 = streaks.withColumn("ml", F.max("len").over(wml))
    return s2.groupBy("user_id").agg(
        F.max("len").alias("longest_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.sum("len").alias("active_days"),
        F.min(
            F.when(F.col("len") == F.col("ml"), F.col("streak_start"))
        ).alias("best_start"),
    )

# ==== from analytics_r3c ===========================================

_MED_FRAME = 7

@register(
    "q_win_rolling_median",
    oracle=f"""
        WITH q AS (
            SELECT event_id, user_id, ts,
                   CAST(floor(value * 100) AS BIGINT) AS qv
            FROM events
        ),
        w AS (
            SELECT event_id, user_id, qv,
                   list_sort(list(qv) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN {_MED_FRAME - 1} PRECEDING AND CURRENT ROW
                   )) AS arr
            FROM q
        )
        SELECT event_id, user_id, qv,
               CAST(len(arr) AS INTEGER) AS n_win,
               CASE WHEN len(arr) % 2 = 1
                    THEN CAST(arr[(len(arr) + 1) // 2] AS DOUBLE)
                    ELSE (CAST(arr[len(arr) // 2] AS DOUBLE)
                          + CAST(arr[len(arr) // 2 + 1] AS DOUBLE)) / 2.0
               END AS med7
        FROM w
    """,
    section="W17",
    doc="Trailing-7 rolling median per user (robust outlier-proof "
    "smoother). Values quantized floor(v*100) to BIGINT; the median comes "
    "from a SORTED array built over the bounded ROWS frame — the "
    "even-count midpoint is (a+b)/2.0 of two exact integers, so the "
    "result is bit-deterministic. Bounded 7-row frame = constant per-row "
    "state; one window sort per user at any scale (Spark has no "
    "median-over-frame builtin — the sorted-frame-array composition IS "
    "the operator).",
)
def q_win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    f = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_MED_FRAME - 1), Window.currentRow)
    )
    q = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.expr("cast(floor(value * 100) as bigint)").alias("qv"),
    )
    w = q.select(
        "event_id",
        "user_id",
        "qv",
        F.sort_array(F.collect_list("qv").over(f)).alias("arr"),
    )
    n = F.size("arr")
    return w.select(
        "event_id",
        "user_id",
        "qv",
        n.cast("int").alias("n_win"),
        F.when(
            n % 2 == 1,
            F.element_at("arr", ((n + 1) / 2).cast("int")).cast("double"),
        )
        .otherwise(
            (
                F.element_at("arr", (n / 2).cast("int")).cast("double")
                + F.element_at("arr", (n / 2 + 1).cast("int")).cast("double")
            )
            / F.lit(2.0)
        )
        .alias("med7"),
    )

# ==== from analytics_r3f ===========================================

@register(
    "q_win_cume_dist",
    oracle="""
        SELECT c_custkey, c_mktsegment, c_acctbal,
               cume_dist() OVER w AS cd,
               CAST(ntile(4) OVER w AS INTEGER) AS quartile
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment
                     ORDER BY c_acctbal, c_custkey)
    """,
    section="W18",
    doc="cume_dist + ntile quartiles per market segment (completes the "
    "ranking-window family beside W2's rank/dense_rank/ntile and W8's "
    "percent_rank): cume_dist is the exact rational i/n — deterministic "
    "with the unique-key tie-break. One window sort per segment.",
)
def q_win_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return cu.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.cume_dist().over(w).alias("cd"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
    )

# ==== from analytics_r3i ===========================================

_MAD_FRAME = 7

# median*2 of a sorted BIGINT array (sum of the two middle elements, or
# twice the single middle) — stays integral so downstream |2v - med2| is
# exact; halved only at the very end.
_MED2 = (
    "case when size({a}) % 2 = 1"
    " then 2 * element_at({a}, cast((size({a}) + 1) div 2 as int))"
    " else element_at({a}, cast(size({a}) div 2 as int))"
    "      + element_at({a}, cast(size({a}) div 2 + 1 as int)) end"
)

_MED2_DUCK = (
    "CASE WHEN len({a}) % 2 = 1"
    " THEN 2 * {a}[(len({a}) + 1) // 2]"
    " ELSE {a}[len({a}) // 2] + {a}[len({a}) // 2 + 1] END"
)

@register(
    "q_win_rolling_mad",
    oracle=f"""
        WITH q AS (
            SELECT event_id, user_id, ts,
                   CAST(floor(value * 100) AS BIGINT) AS qv
            FROM events
        ),
        w AS (
            SELECT event_id, user_id, qv,
                   list_sort(list(qv) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN {_MAD_FRAME - 1} PRECEDING AND CURRENT ROW
                   )) AS arr
            FROM q
        ),
        m AS (
            SELECT event_id, user_id, qv, arr,
                   {_MED2_DUCK.format(a='arr')} AS med2
            FROM w
        ),
        d AS (
            SELECT event_id, user_id, qv, med2,
                   list_sort(list_transform(arr,
                       v -> abs(2 * v - med2))) AS dev
            FROM m
        )
        SELECT event_id, user_id, qv,
               CAST(med2 AS DOUBLE) / 2.0 AS med,
               CAST({_MED2_DUCK.format(a='dev')} AS DOUBLE) / 4.0 AS mad,
               CASE WHEN {_MED2_DUCK.format(a='dev')} > 0
                    THEN abs(2 * qv - med2) * 2.0
                         / CAST({_MED2_DUCK.format(a='dev')} AS DOUBLE)
               END AS mad_score
        FROM d
    """,
    section="W21",
    doc=f"Rolling median absolute deviation + robust MAD outlier score "
    f"over a trailing {_MAD_FRAME}-row frame per user — the "
    "robust-statistics companion to TS4's mean/σ z-score (immune to the "
    "outliers it hunts). Every intermediate is integral: values are "
    "floor(v*100) ints, medians are carried DOUBLED (sum of middle pair) "
    "and deviations as |2v - med2|, halved only in the final projection "
    "— bit-exact, no rounding. One window sort per user; the MAD is "
    "row-local arithmetic on the bounded sorted frame array.",
)
def q_win_rolling_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    f = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_MAD_FRAME - 1), Window.currentRow)
    )
    q = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.expr("cast(floor(value * 100) as bigint)").alias("qv"),
    )
    w = q.select(
        "event_id",
        "user_id",
        "qv",
        F.sort_array(F.collect_list("qv").over(f)).alias("arr"),
    )
    m = w.withColumn("med2", F.expr(_MED2.format(a="arr")))
    d = m.withColumn(
        "dev",
        F.expr("array_sort(transform(arr, v -> abs(2 * v - med2)))"),
    )
    dev_med2 = F.expr(_MED2.format(a="dev"))
    return d.select(
        "event_id",
        "user_id",
        "qv",
        (F.col("med2").cast("double") / F.lit(2.0)).alias("med"),
        (dev_med2.cast("double") / F.lit(4.0)).alias("mad"),
        F.when(
            dev_med2 > 0,
            F.abs(2 * F.col("qv") - F.col("med2"))
            * F.lit(2.0)
            / dev_med2.cast("double"),
        ).alias("mad_score"),
    )

# ==== from analytics_r3j ===========================================

@register(
    "q_win_growth_rates",
    oracle="""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
            FROM orders GROUP BY 1
        ),
        bounds AS (
            SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily
        ),
        spine AS (
            SELECT CAST(unnest(generate_series(lo, hi,
                        INTERVAL 1 DAY)) AS DATE) AS day
            FROM bounds
        ),
        filled AS (
            SELECT s.day,
                   COALESCE(CAST(d.rev AS DOUBLE), 0.0) AS revenue
            FROM spine s LEFT JOIN daily d ON s.day = d.day
        ),
        lagged AS (
            SELECT day, revenue,
                   lag(revenue, 1) OVER (ORDER BY day) AS prev_day,
                   lag(revenue, 7) OVER (ORDER BY day) AS prev_week
            FROM filled
        )
        SELECT day, revenue,
               CASE WHEN prev_day > 0
                    THEN (revenue - prev_day) / prev_day END AS dod_growth,
               CASE WHEN prev_week > 0
                    THEN (revenue - prev_week) / prev_week END AS wow_growth
        FROM lagged
    """,
    section="W22",
    doc="Day-over-day and week-over-week revenue growth on a gap-free "
    "generated day spine (the period-over-period BI staple; the spine "
    "matters — a missing day silently turns lag(7) into lag(7 present "
    "days)). Revenue is an exact DECIMAL daily sum; growth is one IEEE "
    "division; zero-revenue baselines yield NULL on both engines. The "
    "corpus collapses to |days| rows before any window runs. The lag "
    "window is a single ordered pass over the bounded spine.",
)
def q_win_growth_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    daily = od.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast(DecimalType(18, 2))).alias("rev")
    )
    bounds = daily.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("day")
    )
    filled = spine.join(daily, "day", "left").select(
        "day",
        F.coalesce(F.col("rev").cast("double"), F.lit(0.0)).alias("revenue"),
    )
    w = Window.orderBy("day")
    lagged = filled.select(
        "day",
        "revenue",
        F.lag("revenue", 1).over(w).alias("prev_day"),
        F.lag("revenue", 7).over(w).alias("prev_week"),
    )
    return lagged.select(
        "day",
        "revenue",
        F.when(
            F.col("prev_day") > 0,
            (F.col("revenue") - F.col("prev_day")) / F.col("prev_day"),
        ).alias("dod_growth"),
        F.when(
            F.col("prev_week") > 0,
            (F.col("revenue") - F.col("prev_week")) / F.col("prev_week"),
        ).alias("wow_growth"),
    )

# ==== from analytics_r3l ===========================================

@register(
    "q_win_outlier_iqr",
    oracle="""
        WITH r AS (
            SELECT o_orderstatus, o_totalprice,
                   row_number() OVER (
                       PARTITION BY o_orderstatus
                       ORDER BY o_totalprice, o_orderkey
                   ) AS rn,
                   COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
            FROM orders
        ),
        q AS (
            SELECT o_orderstatus,
                   MAX(CASE WHEN rn = CAST(ceil(n * 0.25) AS BIGINT)
                            THEN o_totalprice END) AS q1,
                   MAX(CASE WHEN rn = CAST(ceil(n * 0.75) AS BIGINT)
                            THEN o_totalprice END) AS q3,
                   MAX(n) AS n
            FROM r GROUP BY o_orderstatus
        )
        SELECT q.o_orderstatus,
               CAST(q.n AS BIGINT) AS n,
               q.q1, q.q3,
               q.q1 - 1.5 * (q.q3 - q.q1) AS fence_lo,
               q.q3 + 1.5 * (q.q3 - q.q1) AS fence_hi,
               CAST(SUM(CASE WHEN o.o_totalprice
                                  < q.q1 - 1.5 * (q.q3 - q.q1)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_out_lo,
               CAST(SUM(CASE WHEN o.o_totalprice
                                  > q.q3 + 1.5 * (q.q3 - q.q1)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_out_hi
        FROM q JOIN orders o ON o.o_orderstatus = q.o_orderstatus
        GROUP BY q.o_orderstatus, q.n, q.q1, q.q3
    """,
    section="W23",
    doc="Tukey-fence outlier audit of o_totalprice per order status: "
    "Q1/Q3 as NEAREST-RANK order statistics (rank = ceil(0.25·n) — n/4 "
    "is a power-of-two division, exact in binary; row_number tie-broken "
    "by o_orderkey), 1.5×IQR fences as one IEEE expression over raw 2dp "
    "doubles (bit-identical cross-engine, so the fence comparison can "
    "never flip), and low/high outlier counts from a bounds join back "
    "to orders. No percentile interpolation anywhere. The ≤3-row bounds "
    "side broadcasts by the size-based planner.",
)
def q_win_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    wp = Window.partitionBy("o_orderstatus")
    r = orders.select(
        "o_orderstatus",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wp).alias("n"),
    )
    q = r.groupBy("o_orderstatus").agg(
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.col("n") * 0.25).cast("long"),
                F.col("o_totalprice"),
            )
        ).alias("q1"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.col("n") * 0.75).cast("long"),
                F.col("o_totalprice"),
            )
        ).alias("q3"),
        F.max("n").alias("n"),
    )
    iqr = F.col("q3") - F.col("q1")
    bounds = q.select(
        "o_orderstatus",
        F.col("n").alias("n"),
        "q1",
        "q3",
        (F.col("q1") - 1.5 * iqr).alias("fence_lo"),
        (F.col("q3") + 1.5 * iqr).alias("fence_hi"),
    )
    joined = orders.select("o_orderstatus", "o_totalprice").join(
        bounds, "o_orderstatus"
    )
    return joined.groupBy(
        "o_orderstatus", "n", "q1", "q3", "fence_lo", "fence_hi"
    ).agg(
        F.sum(
            F.when(F.col("o_totalprice") < F.col("fence_lo"), 1).otherwise(0)
        ).alias("n_out_lo"),
        F.sum(
            F.when(F.col("o_totalprice") > F.col("fence_hi"), 1).otherwise(0)
        ).alias("n_out_hi"),
    )

# ==== from analytics_r3q ===========================================

_PATTERN = "v[ces]*p"  # a view converting to purchase without another view

@register(
    "q_win_event_pattern",
    oracle=f"""
        WITH seq AS (
            SELECT user_id,
                   string_agg(substr(event_type, 1, 1), ''
                              ORDER BY ts, event_id) AS s
            FROM events GROUP BY user_id
        )
        SELECT user_id,
               CAST(length(s) AS INT) AS seq_len,
               CAST(len(regexp_extract_all(s, '{_PATTERN}')) AS INT)
                   AS n_conversions,
               len(regexp_extract_all(s, '{_PATTERN}')) > 0 AS converted
        FROM seq
    """,
    section="W25",
    doc="MATCH_RECOGNIZE-style event-sequence pattern matching: each "
    "user's events collapse to an ordered initial string (c/e/p/s/v, "
    "sorted by ts with event_id tie-break), scanned with the greedy "
    f"non-overlapping regex '{_PATTERN}' — a view converting to a "
    "purchase with no intervening view. Output: sequence length, "
    "conversion count, converted flag. The sequence-mining primitive "
    "W11's time-windowed funnel can't express (arbitrary regular "
    "patterns over order, not fixed stages). Per-user state is the "
    "user's own events — one keyed sort-agg; streams run the same "
    "pattern incrementally via transformWithState keeping NFA state "
    "only.",
)
def q_win_event_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    seq = ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("ts"),
                            F.col("event_id"),
                            F.substring("event_type", 1, 1).alias("i"),
                        )
                    )
                ),
                lambda x: x["i"],
            ),
            "",
        ).alias("s")
    )
    n = F.regexp_count(F.col("s"), F.lit(_PATTERN))
    return seq.select(
        "user_id",
        F.length("s").alias("seq_len"),
        n.cast("int").alias("n_conversions"),
        (n > 0).alias("converted"),
    )

# ==== from analytics_r3w ===========================================

@register(
    "q_win_rank_delta",
    oracle="""
        WITH rev AS (
            SELECT c.c_nationkey AS nation,
                   SUM(CASE WHEN o.o_orderdate >= TIMESTAMP '1996-01-01'
                             AND o.o_orderdate < TIMESTAMP '1997-01-01'
                       THEN CAST(o.o_totalprice AS DECIMAL(18,2))
                       ELSE CAST(0 AS DECIMAL(18,2)) END) AS r96,
                   SUM(CASE WHEN o.o_orderdate >= TIMESTAMP '1997-01-01'
                             AND o.o_orderdate < TIMESTAMP '1998-01-01'
                       THEN CAST(o.o_totalprice AS DECIMAL(18,2))
                       ELSE CAST(0 AS DECIMAL(18,2)) END) AS r97
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
            GROUP BY c.c_nationkey
        )
        SELECT nation,
               CAST(r96 AS DOUBLE) AS rev_1996,
               CAST(r97 AS DOUBLE) AS rev_1997,
               CAST(row_number() OVER (ORDER BY r96 DESC, nation) AS INT)
                   AS rank_1996,
               CAST(row_number() OVER (ORDER BY r97 DESC, nation) AS INT)
                   AS rank_1997,
               CAST(row_number() OVER (ORDER BY r96 DESC, nation) AS INT)
               - CAST(row_number() OVER (ORDER BY r97 DESC, nation) AS INT)
                   AS rank_gain
        FROM rev
    """,
    section="W26",
    doc="Period-over-period rank movement ('movers' report): national "
    "revenue ranked within 1996 and within 1997 (exact DECIMAL sums, "
    "nation tie-break), with the rank delta (positive = climbed). One "
    "dim join + one conditional reduction to |nations| rows; both rank "
    "windows run over the collapsed relation. The standard "
    "leaderboard-drift query for any (entity, period, metric) triple.",
)
def q_win_rank_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    d = F.col("o_totalprice").cast("decimal(18,2)")
    z = F.lit(0).cast("decimal(18,2)")
    in96 = (F.col("o_orderdate") >= "1996-01-01") & (
        F.col("o_orderdate") < "1997-01-01"
    )
    in97 = (F.col("o_orderdate") >= "1997-01-01") & (
        F.col("o_orderdate") < "1998-01-01"
    )
    rev = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nation"))
        .agg(
            F.sum(F.when(in96, d).otherwise(z)).alias("r96"),
            F.sum(F.when(in97, d).otherwise(z)).alias("r97"),
        )
    )
    rk96 = F.row_number().over(Window.orderBy(F.desc("r96"), F.asc("nation")))
    rk97 = F.row_number().over(Window.orderBy(F.desc("r97"), F.asc("nation")))
    return rev.select(
        "nation",
        F.col("r96").cast("double").alias("rev_1996"),
        F.col("r97").cast("double").alias("rev_1997"),
        rk96.cast("int").alias("rank_1996"),
        rk97.cast("int").alias("rank_1997"),
        (rk96 - rk97).cast("int").alias("rank_gain"),
    )

# ==== from analytics_r3z ===========================================

_SESS_US = 300_000_000  # each event opens a 5-minute session

@register(
    "q_win_max_concurrency",
    oracle=f"""
        WITH b AS (
            SELECT epoch_us(ts) AS t, 1 AS delta, event_id FROM events
            UNION ALL
            SELECT epoch_us(ts) + {_SESS_US}, -1, event_id FROM events
        ),
        sweep AS (
            SELECT t, delta,
                   CAST(SUM(delta) OVER (
                       ORDER BY t, delta, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS conc
            FROM b
        )
        SELECT t AS at_us, conc AS max_concurrent
        FROM sweep
        ORDER BY conc DESC, t
        LIMIT 1
    """,
    section="W27",
    doc="Maximum concurrent sessions via the +1/−1 boundary sweep: every "
    "event opens a 5-minute session, boundaries sort by (time, delta, "
    "event_id) — a −1 end sorts before a +1 start at the same "
    "microsecond (closed-open interval convention, pinned identically "
    "in both engines) — and the running sum's peak is the answer. "
    "O(n log n) where the naive interval-overlap formulation (J16's "
    "join) is quadratic; pure integer logic, argmax tie-broken by "
    "time. The capacity-planning primitive (peak connections, peak "
    "GPU jobs, peak staged bytes). At 100 TB the sweep "
    "range-partitions by time with per-partition offsets (the L15 "
    "two-pass prefix pattern).",
)
def q_win_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    starts = ev.select(
        F.unix_micros("ts").alias("t"), F.lit(1).alias("delta"), "event_id"
    )
    ends = ev.select(
        (F.unix_micros("ts") + _SESS_US).alias("t"),
        F.lit(-1).alias("delta"),
        "event_id",
    )
    b = starts.unionAll(ends)
    # Scale note (r6): the concurrency sweep-line level is a distributed
    # prefix sum — no single-partition window; the argmax stays TakeOrdered.
    from ai_to_cvent_etl_spark.operators.ranking import global_cumulative

    sweep = global_cumulative(
        b, ["t", "delta", "event_id"], {"conc": F.col("delta")}
    ).select("t", "conc")
    return (
        sweep.orderBy(F.desc("conc"), F.asc("t"))
        .limit(1)
        .select(
            F.col("t").alias("at_us"),
            F.col("conc").cast("long").alias("max_concurrent"),
        )
    )

# ==== from analytics_r4a ===========================================

_W28_GAP = "10 minutes"

_W28_GAP_US = 600_000_000

@register(
    "q_win_session_window_builtin",
    oracle=f"""
        WITH o AS (
            SELECT user_id, epoch_us(ts) AS t
            FROM events
        ),
        flags AS (
            SELECT user_id, t,
                   CASE WHEN t - lag(t) OVER w > {_W28_GAP_US}
                             OR lag(t) OVER w IS NULL
                        THEN 1 ELSE 0 END AS new_sess
            FROM o
            WINDOW w AS (PARTITION BY user_id ORDER BY t)
        ),
        sess AS (
            SELECT user_id, t,
                   SUM(new_sess) OVER (
                       PARTITION BY user_id ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS sid
            FROM flags
        )
        SELECT user_id,
               MIN(t) AS session_start_us,
               MAX(t) + {_W28_GAP_US} AS session_end_us,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM sess
        GROUP BY user_id, sid
    """,
    section="W28",
    doc="The BUILT-IN session_window() aggregation in BATCH: 10-minute-"
    "gap user sessions with start/end/size — verified against manual "
    "gaps-and-islands sessionization (W10's device), which pins that "
    "the native operator implements exactly those semantics (session "
    "end = last event + gap, Spark's definition). Why the built-in "
    "matters at 100 TB: its partial sessions MERGE across partitions "
    "in the shuffle, where naive islanding needs each user's full "
    "sorted history in one task; and in streaming it is the SAME "
    "operator with state (ST3) — batch/stream session parity for "
    "free.",
)
def q_win_session_window_builtin(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", _W28_GAP).alias("w"), "user_id"
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n_events",
        )
    )

# ==== from analytics_r4b ===========================================

@register(
    "q_win_topk_ties",
    oracle="""
        WITH b AS (
            SELECT c_custkey, c_nationkey,
                   nullif(floor(c_acctbal / 1000.0) * 1000.0, 0.0)
                       AS bal_bucket
            FROM customer
        ),
        r AS (
            SELECT c_custkey, c_nationkey, bal_bucket,
                   rank() OVER (
                       PARTITION BY c_nationkey
                       ORDER BY bal_bucket DESC NULLS LAST
                   ) AS rnk
            FROM b
        )
        SELECT c_nationkey, c_custkey, bal_bucket, CAST(rnk AS INT) AS rnk
        FROM r WHERE rnk <= 3
    """,
    section="W29",
    doc="Top-3 WITH TIES per nation via rank() over a COARSE balance "
    "bucket (floor to 1000s — ties are real by construction, so the "
    "result genuinely includes whole tie groups and more than 3 rows "
    "per nation, which row_number W1 would cut arbitrarily), with the "
    "bucket NULLified at zero and ordered DESC NULLS LAST explicitly "
    "on both engines — pinning tie semantics AND null-ordering parity "
    "(Spark's DESC default is NULLS LAST, DuckDB's is NULLS FIRST: "
    "relying on either default is the dialect trap). No peer-dependent "
    "output beyond the tie group itself — rank is deterministic.",
)
def q_win_topk_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    bucket = F.nullif(
        F.floor(F.col("c_acctbal") / 1000.0) * 1000.0, F.lit(0.0)
    )
    b = c.select("c_custkey", "c_nationkey", bucket.alias("bal_bucket"))
    rnk = F.rank().over(
        Window.partitionBy("c_nationkey").orderBy(
            F.desc_nulls_last("bal_bucket")
        )
    )
    return (
        b.withColumn("rnk", rnk)
        .where(F.col("rnk") <= 3)
        .select(
            "c_nationkey", "c_custkey", "bal_bucket",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )

# ==== from analytics_r4d ===========================================

_W30_LEN_US = 420_000_000  # each event spans 7 minutes

@register(
    "q_win_interval_merge",
    oracle=f"""
        WITH iv AS (
            SELECT user_id, epoch_us(ts) AS s,
                   epoch_us(ts) + {_W30_LEN_US} AS e,
                   event_id
            FROM events
        ),
        flagged AS (
            SELECT user_id, s, e,
                   CASE WHEN s > MAX(e) OVER (
                            PARTITION BY user_id ORDER BY s, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING)
                             OR MAX(e) OVER (
                            PARTITION BY user_id ORDER BY s, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING) IS NULL
                        THEN 1 ELSE 0 END AS new_island
            FROM iv
        ),
        islands AS (
            SELECT user_id, s, e,
                   SUM(new_island) OVER (
                       PARTITION BY user_id ORDER BY s, e
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS island
            FROM flagged
        )
        SELECT user_id, CAST(island AS BIGINT) AS island_id,
               MIN(s) AS span_start_us,
               MAX(e) AS span_end_us,
               CAST(COUNT(*) AS BIGINT) AS n_intervals,
               MAX(e) - MIN(s) AS covered_us
        FROM islands
        GROUP BY user_id, island
    """,
    section="W30",
    doc="Merge overlapping intervals per user (each event spans 7 "
    "minutes): a new island starts where an interval's start exceeds "
    "the RUNNING MAX of all previous ends (the correct rule — "
    "comparing only the previous END mis-merges when an earlier long "
    "interval still covers the gap), islands numbered by a running "
    "flag sum, merged spans with counts and covered duration out. "
    "Pure integer microsecond logic, (start, event_id) tie-break. The "
    "interval-union primitive behind coverage accounting, on-call "
    "spans, and GPU-occupancy stitching; one keyed sort window per "
    "user — W28's sessionization shape with a data-driven merge "
    "rule.",
)
def q_win_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + _W30_LEN_US).alias("e"),
        "event_id",
    )
    wprev = Window.partitionBy("user_id").orderBy("s", "event_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    flagged = iv.select(
        "user_id",
        "s",
        "e",
        F.when(
            (F.col("s") > F.max("e").over(wprev))
            | F.max("e").over(wprev).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_island"),
    )
    wrun = Window.partitionBy("user_id").orderBy("s", "e").rowsBetween(
        Window.unboundedPreceding, 0
    )
    islands = flagged.select(
        "user_id", "s", "e", F.sum("new_island").over(wrun).alias("island")
    )
    return islands.groupBy(
        "user_id", F.col("island").alias("island_id")
    ).agg(
        F.min("s").alias("span_start_us"),
        F.max("e").alias("span_end_us"),
        F.count("*").alias("n_intervals"),
        (F.max("e") - F.min("s")).alias("covered_us"),
    )


@register(
    "q_win_lead_time",
    oracle="""
        WITH lt AS (
            SELECT date_trunc('month', o_orderdate) AS month,
                   CAST(date_diff('day', o_orderdate, l_shipdate)
                        AS BIGINT) AS lead_days
            FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        )
        SELECT CAST(month AS DATE) AS month,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               ROUND(quantile_cont(lead_days, 0.25), 4) AS p25,
               ROUND(quantile_cont(lead_days, 0.5), 4) AS p50,
               ROUND(quantile_cont(lead_days, 0.75), 4) AS p75,
               ROUND(quantile_cont(lead_days, 0.9), 4) AS p90
        FROM lt GROUP BY month
    """,
    section="W31",
    doc="Order-to-ship lead-time distribution per order month: p25/"
    "p50/p75/p90 of (shipdate - orderdate) in days — the operational "
    "SLA readout (tail percentiles, not means, are what fulfillment "
    "commitments are written against; the p90/p50 gap is the "
    "variability signal). Lead days are exact integers from date "
    "arithmetic; percentiles are Spark `percentile` vs DuckDB "
    "`quantile_cont` (both linear-interpolate — the A13 pairing, "
    "here verified at 4 quantile points). Scale: one key-collocated "
    "join (orderkey) + one month-keyed percentile aggregation; "
    "month grain bounds the output at any volume.",
)
def q_win_lead_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lt = od.join(li, od.o_orderkey == li.l_orderkey).select(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        F.datediff("l_shipdate", "o_orderdate")
        .cast("bigint")
        .alias("lead_days"),
    )
    return lt.groupBy("month").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.round(F.expr("percentile(lead_days, 0.25)"), 4).alias("p25"),
        F.round(F.expr("percentile(lead_days, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(lead_days, 0.75)"), 4).alias("p75"),
        F.round(F.expr("percentile(lead_days, 0.9)"), 4).alias("p90"),
    )


@register(
    "q_win_backlog",
    oracle="""
        WITH placed AS (
            SELECT o_orderdate AS day,
                   CAST(COUNT(*) AS BIGINT) AS n_placed
            FROM orders JOIN lineitem ON l_orderkey = o_orderkey
            GROUP BY o_orderdate
        ),
        shipped AS (
            SELECT l_shipdate AS day,
                   CAST(COUNT(*) AS BIGINT) AS n_shipped
            FROM lineitem GROUP BY l_shipdate
        ),
        spine AS (
            SELECT day, COALESCE(p.n_placed, 0) AS n_placed,
                   COALESCE(s.n_shipped, 0) AS n_shipped
            FROM placed p FULL OUTER JOIN shipped s USING (day)
        )
        SELECT day,
               CAST(SUM(n_placed) OVER w AS BIGINT) AS placed_cum,
               CAST(SUM(n_shipped) OVER w AS BIGINT) AS shipped_cum,
               CAST(SUM(n_placed) OVER w - SUM(n_shipped) OVER w
                    AS BIGINT) AS backlog
        FROM spine
        WINDOW w AS (ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    section="W32",
    doc="Order backlog curve: cumulative lines placed (by order date) "
    "minus cumulative lines shipped (by ship date) on the merged day "
    "spine — the operations readout behind capacity planning (a "
    "rising backlog = demand outpacing fulfillment; its peak dates "
    "the crunch). Two independent day-grain integer collapses "
    "full-outer-joined on day (COALESCE 0 for one-sided days), then "
    "exact running sums over the date-bounded spine. Scale: the "
    "corpus-proportional work is the two keyed counts; the window "
    "runs on the few-thousand-row spine regardless of line volume — "
    "same shape as E38's monitor.",
)
def q_win_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    placed = (
        od.join(li, od.o_orderkey == li.l_orderkey)
        .groupBy(F.col("o_orderdate").alias("day"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_placed"))
    )
    shipped = li.groupBy(F.col("l_shipdate").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shipped")
    )
    spine = (
        placed.join(shipped, "day", "full_outer")
        .select(
            "day",
            F.coalesce("n_placed", F.lit(0)).alias("n_placed"),
            F.coalesce("n_shipped", F.lit(0)).alias("n_shipped"),
        )
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return spine.select(
        "day",
        F.sum("n_placed").over(w).cast("bigint").alias("placed_cum"),
        F.sum("n_shipped").over(w).cast("bigint").alias("shipped_cum"),
        (F.sum("n_placed").over(w) - F.sum("n_shipped").over(w))
        .cast("bigint")
        .alias("backlog"),
    )


@register(
    "q_win_record_highs",
    oracle="""
        WITH d AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1
        ),
        r AS (
            SELECT day, x,
                   MAX(x) OVER (ORDER BY day
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS prior_max
            FROM d
        )
        SELECT day, x AS daily_events,
               COALESCE(prior_max, 0) AS prior_max,
               CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT)
                   AS record_seq
        FROM r
        WHERE prior_max IS NULL OR x > prior_max
    """,
    section="W33",
    doc="Record-high detection on the daily event-count series: days "
    "whose volume strictly exceeds EVERY prior day, with the "
    "standing record they broke and their sequence number — the "
    "extremes readout behind 'biggest day ever' alerting and "
    "capacity high-water-mark tracking (the record CADENCE also "
    "tests stationarity: under an i.i.d. null the k-th record "
    "arrives ~e^k days in, so records clustering late = trend, "
    "matching A76's runs verdict from a different angle). One "
    "running-max window (ROWS frame, no peer ambiguity) over the "
    "day spine; exact integers throughout. Scale: |days|-bounded "
    "after the TS7 collapse, single ordered window.",
)
def q_win_record_highs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    w = (
        Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    r = d.select(
        "day", "x", F.max("x").over(w).alias("prior_max")
    ).where(
        F.col("prior_max").isNull() | (F.col("x") > F.col("prior_max"))
    )
    return r.select(
        "day",
        F.col("x").alias("daily_events"),
        F.coalesce("prior_max", F.lit(0)).cast("bigint").alias("prior_max"),
        F.row_number()
        .over(Window.orderBy("day"))
        .cast("bigint")
        .alias("record_seq"),
    )


@register(
    "q_win_time_to_error",
    oracle="""
        WITH e AS (
            SELECT user_id, event_id, event_type, ts,
                   MIN(CASE WHEN event_type = 'error' THEN ts END)
                       OVER (PARTITION BY user_id
                             ORDER BY ts, event_id
                             ROWS BETWEEN 1 FOLLOWING
                             AND UNBOUNDED FOLLOWING) AS next_err_ts
            FROM events
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CASE WHEN next_err_ts IS NOT NULL
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_with_next,
               CAST(SUM(CASE WHEN next_err_ts IS NOT NULL THEN
                    date_diff('second', ts, next_err_ts) END) AS BIGINT)
                   AS total_secs_to_error,
               ROUND(CAST(SUM(CASE WHEN next_err_ts IS NOT NULL THEN
                          date_diff('second', ts, next_err_ts) END)
                          AS DOUBLE)
                     / SUM(CASE WHEN next_err_ts IS NOT NULL
                           THEN 1 ELSE 0 END), 2) AS mean_secs_to_error
        FROM e
        GROUP BY event_type
    """,
    section="W34",
    doc="Time-to-next-failure per event type: for every event, the "
    "seconds until the SAME user's next 'error' (a conditional "
    "forward-looking MIN over a 1-FOLLOWING..UNBOUNDED frame — the "
    "masked-column device turns 'next matching row' into a frame "
    "aggregate with no self-join), rolled up to exact per-type "
    "totals — the error-proximity readout behind 'what do users do "
    "right before things break' triage and MTBF-style monitoring "
    "(low mean time from 'click' = a breaking interaction; W6's "
    "funnel looks forward to conversions, this looks forward to "
    "failures). The frame starts at 1 FOLLOWING so an error's own "
    "row measures the gap to the NEXT error, not zero. Ordering "
    "totalized by (ts, event_id); integer epoch-second gaps. Scale: "
    "one user-key shuffle + one ordered window — W-family standard; "
    "state per user is O(1) (a running future-min).",
)
def q_win_time_to_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    e = ev.select(
        "event_type",
        "ts",
        F.min(
            F.when(F.col("event_type") == "error", F.col("ts"))
        )
        .over(w)
        .alias("next_err_ts"),
    )
    gap = F.col("next_err_ts").cast("long") - F.col("ts").cast("long")
    has = F.col("next_err_ts").isNotNull()
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.when(has, 1).otherwise(0)).cast("bigint").alias(
            "n_with_next"
        ),
        F.sum(F.when(has, gap)).cast("bigint").alias(
            "total_secs_to_error"
        ),
        F.round(
            F.sum(F.when(has, gap)).cast("double")
            / F.sum(F.when(has, 1).otherwise(0)),
            2,
        ).alias("mean_secs_to_error"),
    )


_DM_SPLIT = "1998-06-01"   # period boundary (fixture midpoint)


@register(
    "q_win_decile_migration",
    oracle=f"""
        WITH spend AS (
            SELECT o_custkey AS cust,
                   CASE WHEN o_orderdate < TIMESTAMP '{_DM_SPLIT}'
                        THEN 0 ELSE 1 END AS period,
                   CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                 * 100 AS BIGINT)) AS BIGINT) AS cents
            FROM orders GROUP BY 1, 2
        ),
        deciled AS (
            SELECT cust, period,
                   CAST(ntile(10) OVER (
                        PARTITION BY period
                        ORDER BY cents, cust) AS INT) AS decile
            FROM spend
        ),
        mig AS (
            SELECT a.decile AS decile_from, b.decile AS decile_to
            FROM (SELECT cust, decile FROM deciled WHERE period = 0) a
            JOIN (SELECT cust, decile FROM deciled WHERE period = 1) b
              ON a.cust = b.cust
        )
        SELECT decile_from, decile_to,
               CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM mig GROUP BY 1, 2
    """,
    section="W35",
    doc="Customer spend-decile MIGRATION matrix across a period "
    "boundary: decile in the early period vs decile in the late "
    "period, per-period ntile over exact cent totals with a "
    "customer-key tie-break — the rank-mobility readout behind "
    "CRM '(up/down)graded segments' and churn-risk models (A17's "
    "churn transitions track STATE labels; this tracks RELATIVE "
    "RANK, which moves even when absolute spend doesn't — the "
    "distinction between a shrinking customer and a shrinking "
    "market). Only customers present in BOTH periods appear (inner "
    "join = the survivor cohort; E-family audits count the exits). "
    "ntile over a totally-ordered key is deterministic; counts "
    "exact. Scale: two keyed collapses + per-period ntile windows "
    "(10-way split, value-domain ordered) + one co-keyed join.",
)
def q_win_decile_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    spend = od.groupBy(
        F.col("o_custkey").alias("cust"),
        F.when(
            F.col("o_orderdate") < F.lit(_DM_SPLIT).cast("timestamp"), 0
        )
        .otherwise(1)
        .alias("period"),
    ).agg(
        F.sum(
            F.expr(
                "cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)"
            )
        )
        .cast("bigint")
        .alias("cents")
    )
    w = Window.partitionBy("period").orderBy("cents", "cust")
    deciled = spend.select(
        "cust", "period", F.ntile(10).over(w).cast("int").alias("decile")
    )
    a = deciled.where(F.col("period") == 0).select(
        "cust", F.col("decile").alias("decile_from")
    )
    b = deciled.where(F.col("period") == 1).select(
        "cust", F.col("decile").alias("decile_to")
    )
    return (
        a.join(b, "cust")
        .groupBy("decile_from", "decile_to")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"))
    )


_LB_K = 10


@register(
    "q_win_leaderboard_churn",
    oracle=f"""
        WITH spend AS (
            SELECT o_custkey AS cust,
                   CASE WHEN o_orderdate < TIMESTAMP '{_DM_SPLIT}'
                        THEN 0 ELSE 1 END AS period,
                   CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                 * 100 AS BIGINT)) AS BIGINT) AS cents
            FROM orders GROUP BY 1, 2
        ),
        ranked AS (
            SELECT cust, period,
                   ROW_NUMBER() OVER (PARTITION BY period
                                      ORDER BY cents DESC, cust) AS rk
            FROM spend
        ),
        tops AS (
            SELECT period, cust FROM ranked WHERE rk <= {_LB_K}
        )
        SELECT CAST({_LB_K} AS INTEGER) AS k,
               CAST(COUNT(b.cust) AS BIGINT) AS n_retained,
               CAST({_LB_K} - COUNT(b.cust) AS BIGINT) AS n_churned,
               ROUND(CAST(COUNT(b.cust) AS DOUBLE) / {_LB_K}, 4)
                   AS retention_rate
        FROM (SELECT cust FROM tops WHERE period = 0) a
        LEFT JOIN (SELECT cust FROM tops WHERE period = 1) b
          ON a.cust = b.cust
    """,
    section="W36",
    doc=f"Top-{_LB_K} leaderboard churn across the period boundary: how "
    "many of the early period's top spenders remain top spenders "
    "later — the HEAD-of-distribution stability readout that W35's "
    "decile migration dilutes (a decile is 10% of customers; key-"
    "account management cares about the named top handful, and "
    "their churn rate is the early-warning KPI for revenue "
    "concentration risk, pairing with A35's HHI and A93's Lorenz "
    "curve). Fully tie-broken ranks over exact cents; retained "
    "count via one bounded semi-join of two {_LB_K}-row sets. "
    "Scale: two keyed collapses + per-period top-k (rank pushdown "
    "shape).",
)
def q_win_leaderboard_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    spend = od.groupBy(
        F.col("o_custkey").alias("cust"),
        F.when(
            F.col("o_orderdate") < F.lit(_DM_SPLIT).cast("timestamp"), 0
        )
        .otherwise(1)
        .alias("period"),
    ).agg(
        F.sum(
            F.expr(
                "cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)"
            )
        )
        .cast("bigint")
        .alias("cents")
    )
    w = Window.partitionBy("period").orderBy(F.desc("cents"), F.asc("cust"))
    tops = (
        spend.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _LB_K)
        .select("period", "cust")
    )
    a = tops.where(F.col("period") == 0).select("cust")
    b = tops.where(F.col("period") == 1).select(
        F.col("cust").alias("cust_b")
    )
    j = a.join(F.broadcast(b), F.col("cust") == F.col("cust_b"), "left")
    return j.agg(
        F.lit(_LB_K).cast("int").alias("k"),
        F.count("cust_b").cast("bigint").alias("n_retained"),
        (F.lit(_LB_K) - F.count("cust_b")).cast("bigint").alias("n_churned"),
        F.round(F.count("cust_b").cast("double") / _LB_K, 4).alias(
            "retention_rate"
        ),
    )


@register(
    "q_win_state_dwell",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type, ts,
                   lead(ts) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS next_ts
            FROM events
        )
        SELECT event_type AS state,
               CAST(COUNT(next_ts) AS BIGINT) AS n_intervals,
               CAST(SUM(date_diff('second', ts, next_ts)) AS BIGINT)
                   AS total_dwell_seconds,
               ROUND(CAST(SUM(date_diff('second', ts, next_ts))
                          AS DOUBLE) / COUNT(next_ts), 2)
                   AS mean_dwell_seconds
        FROM seq
        WHERE next_ts IS NOT NULL
        GROUP BY event_type
    """,
    section="W37",
    doc="State dwell-time accounting: each event opens a 'state' that "
    "lasts until the same user's next event — per state, interval "
    "counts, total and mean occupied seconds — the time-in-state "
    "ledger behind session quality ('how long do users sit on an "
    "error before the next action') and Markov-model holding times "
    "(A17's transition MATRIX says where users go; this says how "
    "LONG they stay, and together they parameterize a semi-Markov "
    "model). Last events per user are open intervals and excluded "
    "(the SCD2 open-row convention, identical both engines). One "
    "user-key window, exact epoch-second integers, ordering "
    "totalized by (ts, event_id). Scale: W-family standard — one "
    "shuffle on user_id, O(1) window state.",
)
def q_win_state_dwell(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", "ts", F.lead("ts").over(w).alias("next_ts")
    ).where(F.col("next_ts").isNotNull())
    gap = F.col("next_ts").cast("long") - F.col("ts").cast("long")
    return seq.groupBy(F.col("event_type").alias("state")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
        F.sum(gap).cast("bigint").alias("total_dwell_seconds"),
        F.round(
            F.sum(gap).cast("double") / F.count(F.lit(1)), 2
        ).alias("mean_dwell_seconds"),
    )


# ---------------------------------------------------------------------------
# Wave 116 (r5): multi-touch attribution.
# ---------------------------------------------------------------------------

_USHAPE_UNIT = 1_000_000  # micro-credits: one conversion = 1e6 exactly


@register(
    "q_win_attribution_ushape",
    oracle=f"""
        WITH ordered AS (
            SELECT user_id, event_id, event_type, ts,
                   SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING) AS journey
            FROM events
        ),
        journeys AS (
            SELECT user_id, COALESCE(journey, 0) AS journey,
                   event_id, event_type, ts
            FROM ordered
        ),
        converting AS (
            SELECT DISTINCT user_id, journey FROM journeys
            WHERE event_type = 'purchase'
        ),
        touches AS (
            SELECT j.user_id, j.journey, j.event_id, j.event_type,
                   row_number() OVER (
                       PARTITION BY j.user_id, j.journey
                       ORDER BY j.ts, j.event_id) AS pos,
                   COUNT(*) OVER (
                       PARTITION BY j.user_id, j.journey) AS n
            FROM journeys j
            JOIN converting c
              ON j.user_id = c.user_id AND j.journey = c.journey
            WHERE j.event_type <> 'purchase'
        ),
        credited AS (
            SELECT event_type,
                   CASE
                     WHEN n = 1 THEN {_USHAPE_UNIT}
                     WHEN n = 2 THEN {_USHAPE_UNIT // 2}
                     WHEN pos = 1 OR pos = n
                          THEN {_USHAPE_UNIT * 4 // 10}
                     ELSE CAST(floor({_USHAPE_UNIT // 5} / (n - 2))
                               AS BIGINT)
                   END AS credit
            FROM touches
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_touches,
               ROUND(CAST(SUM(credit) AS DOUBLE) / {_USHAPE_UNIT}, 6)
                   AS total_credit
        FROM credited
        GROUP BY event_type
    """,
    section="W35",
    doc="U-shaped (position-based) multi-touch attribution: every "
    "converting journey (touches between consecutive purchases of a "
    "user) splits one unit of conversion credit 40/20/40 — first "
    "touch 40%, last touch 40%, middles sharing 20% — the standard "
    "marketing model between W10's naive first/last-touch extremes. "
    "Journey ids are a gaps-and-islands cumulative purchase count "
    "(the 1-PRECEDING frame keeps each terminal purchase inside the "
    "journey it closes). Credits are exact MICRO-credit integers — "
    "floor(200000/(n-2)) for middles — so the per-channel totals are "
    "BIGINT sums with no float accumulation anywhere; one division "
    "at render. Scale: two windows and one aggregate, all keyed by "
    "(user_id, journey) — partition-local after a single user-keyed "
    "shuffle; no joins against the fact beyond the converting-set "
    "semi-join, which collapses to journey grain first.",
)
def q_win_attribution_ushape(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    journeys = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        F.coalesce(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).over(
                w_user.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("journey"),
    )
    converting = (
        journeys.where(F.col("event_type") == "purchase")
        .select("user_id", "journey")
        .distinct()
    )
    w_j = Window.partitionBy("user_id", "journey").orderBy(
        "ts", "event_id"
    )
    w_jn = Window.partitionBy("user_id", "journey")
    touches = (
        journeys.join(converting, ["user_id", "journey"])
        .where(F.col("event_type") != "purchase")
        .select(
            "event_type",
            F.row_number().over(w_j).alias("pos"),
            F.count(F.lit(1)).over(w_jn).alias("n"),
        )
    )
    credit = (
        F.when(F.col("n") == 1, F.lit(_USHAPE_UNIT))
        .when(F.col("n") == 2, F.lit(_USHAPE_UNIT // 2))
        .when(
            (F.col("pos") == 1) | (F.col("pos") == F.col("n")),
            F.lit(_USHAPE_UNIT * 4 // 10),
        )
        .otherwise(
            F.floor(
                F.lit(_USHAPE_UNIT // 5) / (F.col("n") - 2)
            ).cast("bigint")
        )
    )
    return (
        touches.select("event_type", credit.alias("credit"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_touches"),
            F.round(
                F.sum("credit").cast("double") / _USHAPE_UNIT, 6
            ).alias("total_credit"),
        )
    )


_CEP_GAP_MIN = 30


@register(
    "q_win_cep_pattern",
    oracle=f"""
        WITH seq AS (
            SELECT user_id, ts, event_type,
                   LAG(event_type, 1) OVER w AS t1,
                   LAG(event_type, 2) OVER w AS t2,
                   LAG(ts, 2) OVER w AS ts2
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        matched AS (
            SELECT user_id,
                   (t2 = 'view' AND t1 = 'click'
                    AND event_type = 'purchase'
                    AND ts - ts2 <= INTERVAL {_CEP_GAP_MIN} MINUTE)
                       AS strict_m,
                   (t2 = 'view' AND t1 <> 'error'
                    AND event_type = 'purchase'
                    AND ts - ts2 <= INTERVAL {_CEP_GAP_MIN} MINUTE)
                       AS relaxed_m
            FROM seq
        )
        SELECT CAST(SUM(CASE WHEN strict_m THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_strict,
               CAST(SUM(CASE WHEN relaxed_m THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_relaxed,
               CAST(COUNT(DISTINCT CASE WHEN strict_m THEN user_id END)
                    AS BIGINT) AS users_strict,
               CAST(COUNT(DISTINCT CASE WHEN relaxed_m THEN user_id END)
                    AS BIGINT) AS users_relaxed
        FROM matched
    """,
    section="W36",
    doc="Complex-event-processing pattern match over per-user event "
    "sequences — MATCH_RECOGNIZE semantics expressed with lag "
    "windows: the STRICT pattern (view, click, purchase as three "
    f"CONSECUTIVE events within {_CEP_GAP_MIN} minutes) and the "
    "RELAXED pattern with a NEGATION in the middle slot (view, "
    "anything-but-error, purchase) — negation is the CEP feature "
    "plain funnels (W7) can't state, because it constrains the "
    "events BETWEEN the endpoints, not just their order. Every "
    "match test is an exact string/interval comparison on lagged "
    "rows; counts exact BIGINT. Scale: one user-keyed shuffle, "
    "then entirely partition-local lags — the pattern never "
    "self-joins the fact (the naive 3-way CEP join), so cost is "
    "one sort per user partition regardless of pattern length.",
)
def q_win_cep_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "ts",
        "event_type",
        F.lag("event_type", 1).over(w).alias("t1"),
        F.lag("event_type", 2).over(w).alias("t2"),
        F.lag("ts", 2).over(w).alias("ts2"),
    )
    gap_ok = F.col("ts") <= F.col("ts2") + F.expr(
        f"INTERVAL {_CEP_GAP_MIN} MINUTE"
    )
    strict_m = (
        (F.col("t2") == "view")
        & (F.col("t1") == "click")
        & (F.col("event_type") == "purchase")
        & gap_ok
    )
    relaxed_m = (
        (F.col("t2") == "view")
        & (F.col("t1") != "error")
        & (F.col("event_type") == "purchase")
        & gap_ok
    )
    matched = seq.select(
        "user_id",
        strict_m.alias("strict_m"),
        relaxed_m.alias("relaxed_m"),
    )
    return matched.agg(
        F.sum(F.when(F.col("strict_m"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_strict"),
        F.sum(F.when(F.col("relaxed_m"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_relaxed"),
        F.countDistinct(
            F.when(F.col("strict_m"), F.col("user_id"))
        )
        .cast("bigint")
        .alias("users_strict"),
        F.countDistinct(
            F.when(F.col("relaxed_m"), F.col("user_id"))
        )
        .cast("bigint")
        .alias("users_relaxed"),
    )


@register(
    "q_win_pareto_frontier",
    oracle="""
        WITH pts AS (
            SELECT p_partkey, p_retailprice AS x,
                   CAST(p_size AS BIGINT) AS y
            FROM part
        ),
        xg AS (
            SELECT x, MAX(y) AS ymax FROM pts GROUP BY x
        ),
        fr AS (
            SELECT x, ymax,
                   MAX(ymax) OVER (ORDER BY x DESC
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING) AS better_y
            FROM xg
        ),
        frontier_x AS (
            SELECT x, ymax FROM fr
            WHERE better_y IS NULL OR ymax > better_y
        )
        SELECT p.p_partkey, p.x AS retail_price, p.y AS size
        FROM pts p
        JOIN frontier_x f ON p.x = f.x AND p.y = f.ymax
    """,
    section="W37",
    doc="2-D skyline (Pareto frontier) of parts maximizing "
    "(retailprice, size): a part is on the frontier iff no other "
    "part is >= on both axes and > on one — the SKYLINE operator "
    "of classic OLAP papers, computed WITHOUT the naive "
    "dominance self-join: collapse to x-grain maxima, then one "
    "descending prefix-max window — a point survives iff its "
    "y-max strictly beats every y at strictly larger x "
    "(1-PRECEDING frame excludes the point's own grain). All "
    "comparisons are exact stored doubles / BIGINTs; ALL parts "
    "tied on a frontier (x, ymax) cell return, so the set needs "
    "no tie-break. Scale: the window runs on the x-grain table "
    "(distinct prices), not the fact; the frontier re-join is a "
    "broadcast. The same collapse-then-prefix-extremum shape "
    "extends to d dimensions as d-1 nested windows — vs the "
    "O(n^2) dominance join the textbook starts from.",
)
def q_win_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    pts = part.select(
        "p_partkey",
        F.col("p_retailprice").alias("x"),
        F.col("p_size").cast("bigint").alias("y"),
    )
    xg = pts.groupBy("x").agg(F.max("y").alias("ymax"))
    w = Window.orderBy(F.col("x").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    fr = xg.select(
        "x", "ymax", F.max("ymax").over(w).alias("better_y")
    )
    frontier_x = fr.where(
        F.col("better_y").isNull() | (F.col("ymax") > F.col("better_y"))
    ).select(F.col("x").alias("fx"), F.col("ymax").alias("fy"))
    return pts.join(
        F.broadcast(frontier_x),
        (F.col("x") == F.col("fx")) & (F.col("y") == F.col("fy")),
    ).select(
        "p_partkey",
        F.col("x").alias("retail_price"),
        F.col("y").alias("size"),
    )


# ==== wave 143b: cross-sectional momentum backtest =================

_FB_LOOKBACK = 3


@register(
    "q_win_factor_backtest",
    oracle=f"""
        WITH cells AS (
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
        sig AS (
            SELECT nation, m, cents,
                   cents - LAG(cents, {_FB_LOOKBACK}) OVER w AS mom,
                   LEAD(cents, 1) OVER w - cents AS fwd
            FROM cells
            WINDOW w AS (PARTITION BY nation ORDER BY m)
        ),
        ranked AS (
            SELECT m, mom, fwd,
                   NTILE(3) OVER (PARTITION BY m
                                  ORDER BY mom, nation) AS tercile,
                   CAST(COUNT(*) OVER (PARTITION BY m) AS BIGINT)
                       AS n_nations
            FROM sig WHERE mom IS NOT NULL AND fwd IS NOT NULL
        )
        SELECT m AS month_idx, n_nations,
               ROUND(CAST(SUM(CASE WHEN tercile = 3 THEN fwd END)
                          AS DOUBLE)
                     / SUM(CASE WHEN tercile = 3 THEN 1 END), 4)
                   AS top_mean_fwd_cents,
               ROUND(CAST(SUM(CASE WHEN tercile = 1 THEN fwd END)
                          AS DOUBLE)
                     / SUM(CASE WHEN tercile = 1 THEN 1 END), 4)
                   AS bottom_mean_fwd_cents,
               ROUND(CAST(SUM(CASE WHEN tercile = 3 THEN fwd END)
                          AS DOUBLE)
                     / SUM(CASE WHEN tercile = 3 THEN 1 END)
                     - CAST(SUM(CASE WHEN tercile = 1 THEN fwd END)
                            AS DOUBLE)
                       / SUM(CASE WHEN tercile = 1 THEN 1 END), 4)
                   AS momentum_spread_cents
        FROM ranked
        GROUP BY m, n_nations
    """,
    section="W33",
    doc=f"Cross-sectional momentum backtest over nation revenue: each "
    f"month, nations rank into terciles by their {_FB_LOOKBACK}-month "
    "revenue change, and the NEXT month's change is averaged per "
    "tercile — top-minus-bottom is the momentum premium, the factor-"
    "research loop (signal -> rank -> forward return) in relational "
    "form, and the panel sibling of TS-family single-series momentum "
    "(TS28 OBV, TS29 stochastic). Determinism: signals and forward "
    "returns are integer cent DIFFERENCES (lag/lead on the month "
    "spine); NTILE's remainder rule is pinned by the full (mom, "
    "nation) tie-broken ordering identical on both engines; tercile "
    "means are BIGINT sums over counts. Months missing either the "
    "lookback or the forward observation drop on both engines. Scale: "
    "one (nation, month) agg (cells = dims x calendar, tiny at any "
    "corpus size); windows partition by nation/month — never the fact.",
)
def q_win_factor_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    mo = (F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate") - 1
    cells = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), mo.alias("m"))
        .agg(
            F.expr(
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 "
                "AS BIGINT)"
            ).alias("cents")
        )
    )
    w = Window.partitionBy("nation").orderBy("m")
    sig = cells.select(
        "nation",
        "m",
        (F.col("cents") - F.lag("cents", _FB_LOOKBACK).over(w)).alias("mom"),
        (F.lead("cents", 1).over(w) - F.col("cents")).alias("fwd"),
    ).where(F.col("mom").isNotNull() & F.col("fwd").isNotNull())
    wm = Window.partitionBy("m").orderBy("mom", "nation")
    wc = Window.partitionBy("m")
    ranked = sig.select(
        "m",
        "mom",
        "fwd",
        F.ntile(3).over(wm).alias("tercile"),
        F.count(F.lit(1)).over(wc).cast("bigint").alias("n_nations"),
    )
    top_sum = F.sum(F.when(F.col("tercile") == 3, F.col("fwd")))
    top_n = F.sum(F.when(F.col("tercile") == 3, 1))
    bot_sum = F.sum(F.when(F.col("tercile") == 1, F.col("fwd")))
    bot_n = F.sum(F.when(F.col("tercile") == 1, 1))
    top_mean = top_sum.cast("double") / top_n
    bot_mean = bot_sum.cast("double") / bot_n
    return (
        ranked.groupBy(
            F.col("m").cast("bigint").alias("month_idx"), "n_nations"
        )
        .agg(
            F.round(top_mean, 4).alias("top_mean_fwd_cents"),
            F.round(bot_mean, 4).alias("bottom_mean_fwd_cents"),
            F.round(top_mean - bot_mean, 4).alias("momentum_spread_cents"),
        )
    )


# ==== wave 145a: Little's law audit ================================


@register(
    "q_win_littles_law",
    oracle="""
        WITH spans AS (
            SELECT o.o_orderkey,
                   CAST(o.o_orderdate AS DATE) AS arr,
                   CAST(MAX(l.l_shipdate) AS DATE) AS dep
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            GROUP BY o.o_orderkey, o.o_orderdate
            HAVING MAX(l.l_shipdate) >= o.o_orderdate
        ),
        horizon AS (
            SELECT MIN(arr) AS t0, MAX(dep) AS t1,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(date_diff('day', arr, dep) + 1) AS BIGINT)
                       AS total_days
            FROM spans
        ),
        deltas AS (
            SELECT arr AS d, 1 AS delta FROM spans
            UNION ALL
            SELECT dep + INTERVAL 1 DAY, -1 FROM spans
        ),
        sweep AS (
            SELECT d, SUM(delta) AS dd FROM deltas GROUP BY d
        ),
        conc AS (
            SELECT d,
                   SUM(dd) OVER (ORDER BY d
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS level,
                   LEAD(d) OVER (ORDER BY d) AS nxt
            FROM sweep
        ),
        lsum AS (
            SELECT CAST(SUM(level * date_diff('day', d, nxt)) AS BIGINT)
                       AS area
            FROM conc WHERE nxt IS NOT NULL
        )
        SELECT h.n_orders,
               CAST(date_diff('day', h.t0, h.t1) + 1 AS BIGINT)
                   AS horizon_days,
               ROUND(CAST(l.area AS DOUBLE)
                     / (date_diff('day', h.t0, h.t1) + 1), 6) AS l_avg,
               ROUND(CAST(h.n_orders AS DOUBLE)
                     / (date_diff('day', h.t0, h.t1) + 1), 6) AS lambda_rate,
               ROUND(CAST(h.total_days AS DOUBLE) / h.n_orders, 6) AS w_avg,
               ROUND((CAST(l.area AS DOUBLE)
                      / (date_diff('day', h.t0, h.t1) + 1))
                     / ((CAST(h.n_orders AS DOUBLE)
                         / (date_diff('day', h.t0, h.t1) + 1))
                        * (CAST(h.total_days AS DOUBLE) / h.n_orders)),
                     6) AS little_ratio
        FROM horizon h CROSS JOIN lsum l
    """,
    section="W34",
    doc="Little's law audit over order fulfillment: L (time-average "
    "in-flight orders, via the +1/-1 sweep-line whose running level "
    "is integrated day-by-day), lambda (arrivals per day over the "
    "horizon), and W (mean order-to-last-ship residence time) each "
    "measured INDEPENDENTLY, then little_ratio = L/(lambda*W) — "
    "exactly 1 when the system is measured over a closed horizon, so "
    "the drift of this ratio is a data-quality alarm for truncated or "
    "double-counted event logs (the queueing-theory sibling of W13 "
    "max_concurrency, which reports the peak of the same sweep). "
    "The level integral is exact: level x day-gap products are "
    "BIGINTs on the day-grain sweep; the three rates are one pinned "
    "division each. Scale: the sweep is two map-side exploded deltas "
    "+ one day-grain agg + one ordered window over distinct days — "
    "the fact never globally sorts.",
)
def q_win_littles_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    spans = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").cast("date").alias("dep"))
        .where(F.col("dep") >= F.col("o_orderdate").cast("date"))
        .select(
            F.col("o_orderdate").cast("date").alias("arr"), "dep"
        )
    ).localCheckpoint(eager=False)
    horizon = spans.agg(
        F.min("arr").alias("t0"),
        F.max("dep").alias("t1"),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.datediff("dep", "arr") + 1).cast("bigint").alias(
            "total_days"
        ),
    )
    deltas = spans.select(
        F.col("arr").alias("d"), F.lit(1).alias("delta")
    ).unionByName(
        spans.select(
            F.date_add("dep", 1).alias("d"), F.lit(-1).alias("delta")
        )
    )
    sweep = deltas.groupBy("d").agg(F.sum("delta").alias("dd"))
    wlev = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    conc = sweep.select(
        "d",
        F.sum("dd").over(wlev).alias("level"),
        F.lead("d").over(Window.orderBy("d")).alias("nxt"),
    )
    lsum = conc.where(F.col("nxt").isNotNull()).agg(
        F.sum(F.col("level") * F.datediff("nxt", "d"))
        .cast("bigint")
        .alias("area")
    )
    out = horizon.crossJoin(F.broadcast(lsum))
    hd = (F.datediff("t1", "t0") + 1).cast("bigint")
    l_avg = F.col("area").cast("double") / hd
    lam = F.col("n_orders").cast("double") / hd
    w_avg = F.col("total_days").cast("double") / F.col("n_orders")
    return out.select(
        "n_orders",
        hd.alias("horizon_days"),
        F.round(l_avg, 6).alias("l_avg"),
        F.round(lam, 6).alias("lambda_rate"),
        F.round(w_avg, 6).alias("w_avg"),
        F.round(l_avg / (lam * w_avg), 6).alias("little_ratio"),
    )


# ==== wave 148: process mining — variants and directly-follows =====

_PV_TOPK = 20


@register(
    "q_win_process_variants",
    oracle=f"""
        WITH traces AS (
            SELECT user_id,
                   string_agg(event_type, '->'
                              ORDER BY epoch_us(ts), event_id) AS variant,
                   CAST(COUNT(*) AS BIGINT) AS trace_len
            FROM events
            GROUP BY user_id
        ),
        variants AS (
            SELECT variant,
                   CAST(COUNT(*) AS BIGINT) AS n_cases,
                   CAST(MIN(trace_len) AS BIGINT) AS trace_len
            FROM traces GROUP BY variant
        ),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_traces FROM traces),
        ranked AS (
            SELECT variant, n_cases, trace_len,
                   ROW_NUMBER() OVER (
                       ORDER BY n_cases DESC, variant) AS rk
            FROM variants
        )
        SELECT rk AS rank, variant, n_cases, trace_len,
               ROUND(CAST(n_cases AS DOUBLE) / t.n_traces, 6)
                   AS case_share
        FROM ranked CROSS JOIN tot t
        WHERE rk <= {_PV_TOPK}
    """,
    section="W35",
    doc=f"Process-variant explorer (the first screen of every process-"
    "mining tool): each user's event stream becomes its ordered "
    "variant string (event types joined '->'), identical variants "
    "collapse, and the top-{_PV_TOPK} variants report case counts and "
    "coverage — showing whether behavior concentrates on a few happy "
    "paths or fragments into a long tail (the W6 funnel generalized "
    "from ONE expected path to the observed path DISTRIBUTION). "
    "Determinism: the within-case order is (epoch-micros, event_id) — "
    "fully tie-broken integers (TS35's rule); the Spark side builds "
    "the same string via array_sort over (us, event_id, type) structs "
    "then a transform+join, because collect_list order is otherwise "
    "unspecified; ranking ties break on the variant string. Scale: "
    "one user-keyed agg (traces are short), one variant-keyed count, "
    "TakeOrdered({_PV_TOPK}) — no global sort.",
)
def q_win_process_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    traces = (
        ev.select(
            "user_id",
            F.struct(
                F.unix_micros("ts").alias("us"),
                F.col("event_id").alias("eid"),
                F.col("event_type").alias("et"),
            ).alias("s"),
        )
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("s")), lambda s: s["et"]
                ),
                "->",
            ).alias("variant"),
            F.count(F.lit(1)).cast("bigint").alias("trace_len"),
        )
    )
    variants = traces.groupBy("variant").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cases"),
        F.min("trace_len").cast("bigint").alias("trace_len"),
    )
    tot = traces.agg(F.count(F.lit(1)).cast("bigint").alias("n_traces"))
    rk = F.row_number().over(
        Window.orderBy(F.col("n_cases").desc(), F.col("variant").asc())
    )
    return (
        variants.withColumn("rank", rk)
        .where(F.col("rank") <= _PV_TOPK)
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("rank").cast("bigint").alias("rank"),
            "variant",
            "n_cases",
            "trace_len",
            F.round(
                F.col("n_cases").cast("double") / F.col("n_traces"), 6
            ).alias("case_share"),
        )
    )


@register(
    "q_win_process_dfg",
    oracle="""
        WITH ordered AS (
            SELECT user_id, event_type,
                   CAST(epoch_us(ts) AS BIGINT) AS us,
                   event_id
            FROM events
        ),
        hops AS (
            SELECT user_id,
                   LAG(event_type) OVER w AS src,
                   event_type AS dst,
                   us - LAG(us) OVER w AS gap_us
            FROM ordered
            WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        )
        SELECT src, dst,
               CAST(COUNT(*) AS BIGINT) AS n_hops,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_cases,
               ROUND(CAST(SUM(gap_us // 1000) AS DOUBLE)
                     / COUNT(*) / 1000, 4) AS mean_gap_s
        FROM hops WHERE src IS NOT NULL
        GROUP BY src, dst
    """,
    section="W36",
    doc="Directly-follows graph (the process-mining map behind every "
    "discovery algorithm — alpha miner, heuristics miner, inductive "
    "miner all start here): for each consecutive event pair within a "
    "user's tie-broken (micros, event_id) stream, the transition "
    "src->dst with hop counts, distinct traversing cases, and mean "
    "transition delay — W35 gives the path distribution, this gives "
    "the EDGE structure those paths walk (self-loops and back-edges "
    "expose rework; heavy skipping edges expose shortcut behavior). "
    "Gaps are integer milliseconds (TS35's epoch_us rule) summed as "
    "BIGINTs; the mean is one pinned division. Scale: one partitioned "
    "lag window + one (src, dst)-keyed agg over a bounded label "
    "alphabet — the result is |types|^2 rows at any corpus size.",
)
def q_win_process_dfg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ordered = ev.select(
        "user_id",
        "event_type",
        F.unix_micros("ts").cast("bigint").alias("us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    hops = ordered.select(
        "user_id",
        F.lag("event_type").over(w).alias("src"),
        F.col("event_type").alias("dst"),
        (F.col("us") - F.lag("us").over(w)).alias("gap_us"),
    ).where(F.col("src").isNotNull())
    return hops.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hops"),
        F.countDistinct("user_id").cast("bigint").alias("n_cases"),
        F.round(
            F.sum(F.expr("gap_us DIV 1000")).cast("double")
            / F.count(F.lit(1))
            / 1000,
            4,
        ).alias("mean_gap_s"),
    )


# ==== wave 161a: DAU growth accounting =============================


@register(
    "q_win_growth_accounting",
    oracle="""
        WITH ud AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
            FROM events
        ),
        flags AS (
            SELECT user_id, d,
                   LAG(d) OVER (PARTITION BY user_id ORDER BY d) AS prev_d,
                   MIN(d) OVER (PARTITION BY user_id) AS first_d
            FROM ud
        ),
        today AS (
            SELECT d,
                   CAST(SUM(CASE WHEN d = first_d THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_new,
                   CAST(SUM(CASE WHEN d <> first_d
                                 AND prev_d = d - INTERVAL 1 DAY
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
                   CAST(SUM(CASE WHEN d <> first_d
                                 AND prev_d < d - INTERVAL 1 DAY
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_resurrected,
                   CAST(COUNT(*) AS BIGINT) AS dau
            FROM flags GROUP BY d
        ),
        churn AS (
            SELECT d + INTERVAL 1 DAY AS d,
                   CAST(COUNT(*) AS BIGINT) AS n_churned
            FROM (
                SELECT user_id, d,
                       LEAD(d) OVER (PARTITION BY user_id ORDER BY d)
                           AS next_d
                FROM ud
            )
            WHERE next_d IS NULL OR next_d > d + INTERVAL 1 DAY
            GROUP BY d
        )
        SELECT CAST(t.d AS DATE) AS d, t.dau, t.n_new, t.n_retained,
               t.n_resurrected,
               CAST(COALESCE(c.n_churned, 0) AS BIGINT) AS n_churned_from
        FROM today t LEFT JOIN churn c ON t.d = CAST(c.d AS DATE)
    """,
    section="W37",
    doc="DAU growth accounting (the new/retained/resurrected/churned "
    "ledger): each active (user, day) classifies as NEW (first day "
    "ever), RETAINED (also active yesterday), or RESURRECTED (active "
    "before, but not yesterday), and each day also reports how many "
    "of its actives did NOT return tomorrow (churn attributed to the "
    "day after their last visit) — the accounting identity "
    "dau_t = new_t + retained_t + resurrected_t holds by partition, "
    "and dau growth reconciles as new + resurrected - churned, which "
    "is what makes this the product-analytics standard over raw "
    "TS-family DAU (it says WHY the number moved). All classification "
    "is lag/lead date compares per user; all counting integer. "
    "Scale: the user-day distinct collapse first, then per-user "
    "windows (the natural partition key) and a day-grain rollup.",
)
def q_win_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct().localCheckpoint(eager=False)
    wu = Window.partitionBy("user_id").orderBy("d")
    wa = Window.partitionBy("user_id")
    flags = ud.select(
        "user_id",
        "d",
        F.lag("d").over(wu).alias("prev_d"),
        F.min("d").over(wa).alias("first_d"),
    )
    today = flags.groupBy("d").agg(
        F.sum(F.when(F.col("d") == F.col("first_d"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_new"),
        F.sum(
            F.when(
                (F.col("d") != F.col("first_d"))
                & (F.col("prev_d") == F.date_sub("d", 1)),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_retained"),
        F.sum(
            F.when(
                (F.col("d") != F.col("first_d"))
                & (F.col("prev_d") < F.date_sub("d", 1)),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_resurrected"),
        F.count(F.lit(1)).cast("bigint").alias("dau"),
    )
    churn = (
        ud.select(
            "user_id", "d", F.lead("d").over(wu).alias("next_d")
        )
        .where(
            F.col("next_d").isNull()
            | (F.col("next_d") > F.date_add("d", 1))
        )
        .groupBy(F.date_add("d", 1).alias("d"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_churned"))
    )
    return today.join(churn, "d", "left").select(
        "d",
        "dau",
        "n_new",
        "n_retained",
        "n_resurrected",
        F.coalesce(F.col("n_churned"), F.lit(0))
        .cast("bigint")
        .alias("n_churned_from"),
    )


# ==== wave 163a: time-weighted queue-depth percentiles =============


@register(
    "q_win_queue_percentiles",
    oracle="""
        WITH spans AS (
            SELECT o.o_orderkey,
                   CAST(o.o_orderdate AS DATE) AS arr,
                   CAST(MAX(l.l_shipdate) AS DATE) AS dep
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            GROUP BY o.o_orderkey, o.o_orderdate
            HAVING MAX(l.l_shipdate) >= o.o_orderdate
        ),
        deltas AS (
            SELECT arr AS d, 1 AS delta FROM spans
            UNION ALL
            SELECT dep + INTERVAL 1 DAY, -1 FROM spans
        ),
        sweep AS (
            SELECT d, SUM(delta) AS dd FROM deltas GROUP BY d
        ),
        levels AS (
            SELECT SUM(dd) OVER (ORDER BY d
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS level,
                   CAST(date_diff('day', d, LEAD(d) OVER (ORDER BY d))
                        AS BIGINT) AS days
            FROM sweep
        ),
        lw AS (
            SELECT CAST(level AS BIGINT) AS level,
                   CAST(SUM(days) AS BIGINT) AS w
            FROM levels WHERE days IS NOT NULL
            GROUP BY level
        ),
        cum AS (
            SELECT level, w,
                   SUM(w) OVER (ORDER BY level
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cw,
                   SUM(w) OVER () AS tw
            FROM lw
        )
        SELECT
            (SELECT MIN(level) FROM cum WHERE 2 * cw >= tw) AS p50_level,
            (SELECT MIN(level) FROM cum WHERE 20 * cw >= 19 * tw)
                AS p95_level,
            (SELECT MAX(level) FROM cum) AS max_level,
            (SELECT CAST(SUM(level * w) AS BIGINT) FROM lw) AS level_days
    """,
    section="W38",
    doc="Time-weighted queue-depth percentiles of in-flight orders: "
    "the W34 sweep-line levels weighted by HOW LONG each level held "
    "(a level that lasted 40 days counts 40x one that lasted a day — "
    "the difference between 'median observed level' and 'median "
    "EXPERIENCED level', which is what capacity planning needs), "
    "then P50/P95 as weighted nearest-rank order statistics via "
    "integer cumulative-weight compares (2·cw >= tw, 20·cw >= 19·tw "
    "— the A121 weighted-median device generalized to any quantile) "
    "plus the peak and the total level-day integral. All integer. "
    "Scale: identical to W34 (day-grain sweep); the percentile scan "
    "runs on the distinct-level grain.",
)
def q_win_queue_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    spans = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").cast("date").alias("dep"))
        .where(F.col("dep") >= F.col("o_orderdate").cast("date"))
        .select(F.col("o_orderdate").cast("date").alias("arr"), "dep")
    )
    deltas = spans.select(
        F.col("arr").alias("d"), F.lit(1).alias("delta")
    ).unionByName(
        spans.select(F.date_add("dep", 1).alias("d"), F.lit(-1).alias("delta"))
    )
    sweep = deltas.groupBy("d").agg(F.sum("delta").alias("dd"))
    wlev = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    levels = sweep.select(
        F.sum("dd").over(wlev).alias("level"),
        F.datediff(F.lead("d").over(Window.orderBy("d")), F.col("d"))
        .cast("bigint")
        .alias("days"),
    ).where(F.col("days").isNotNull())
    lw = levels.groupBy(F.col("level").cast("bigint").alias("level")).agg(
        F.sum("days").cast("bigint").alias("w")
    )
    wc = Window.orderBy("level").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = lw.select(
        "level",
        "w",
        F.sum("w").over(wc).alias("cw"),
        F.sum("w").over(wall).alias("tw"),
    ).localCheckpoint(eager=False)
    p50 = cum.where(2 * F.col("cw") >= F.col("tw")).agg(
        F.min("level").alias("p50_level")
    )
    p95 = cum.where(20 * F.col("cw") >= 19 * F.col("tw")).agg(
        F.min("level").alias("p95_level")
    )
    mx = cum.agg(F.max("level").alias("max_level"))
    integ = lw.agg(
        F.sum(F.col("level") * F.col("w")).cast("bigint").alias("level_days")
    )
    return (
        p50.crossJoin(F.broadcast(p95))
        .crossJoin(F.broadcast(mx))
        .crossJoin(F.broadcast(integ))
    )


# ==== wave 168a: maximum-subarray (Kadane via prefix windows) =======


@register(
    "q_win_max_subarray",
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
        tot AS (
            SELECT nation, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(cents) AS BIGINT) AS sx
            FROM daily GROUP BY nation
        ),
        dev AS (
            SELECT d.nation, d.d, t.n,
                   t.n * d.cents - t.sx AS x
            FROM daily d JOIN tot t ON d.nation = t.nation
            UNION ALL
            SELECT nation, DATE '1900-01-01', n, 0 FROM tot
        ),
        pref AS (
            SELECT nation, d, n,
                   SUM(x) OVER (PARTITION BY nation ORDER BY d
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS p
            FROM dev
        ),
        best AS (
            SELECT nation, d, n, p,
                   MIN(struct_pack(p := p, d := d)) OVER (
                       PARTITION BY nation ORDER BY d
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS m
            FROM pref
        ),
        scored AS (
            SELECT nation, n,
                   CAST(p - m.p AS BIGINT) AS gain_scaled,
                   m.d AS from_excl, d AS d_to,
                   ROW_NUMBER() OVER (
                       PARTITION BY nation
                       ORDER BY p - m.p DESC, d
                   ) AS rn
            FROM best WHERE m IS NOT NULL
        )
        SELECT nation, n AS n_days, gain_scaled, from_excl, d_to,
               ROUND(CAST(gain_scaled AS DOUBLE) / n / 100.0, 2)
                   AS gain_dollars
        FROM scored WHERE rn = 1
    """,
    section="W39",
    doc="Maximum-subarray (Kadane) per nation over mean-deviation "
    "daily revenue: the hottest contiguous stretch of days relative "
    "to the nation's own average. Deviations are kept integer by "
    "scaling with n (x = n*cents - sum_cents, which sums to zero), "
    "and Kadane's sequential recurrence becomes two windows: a "
    "running prefix sum P_t, then best-ending-at-t = P_t - "
    "min_(s<t) P_s with the minimum taken over (P, d) STRUCTS (the "
    "D18 windowed struct-min device) so the argmin DATE comes back "
    "with the value and ties break to the earliest day; a sentinel "
    "P_0 = 0 row per nation makes the empty prefix a real row "
    "rather than a COALESCE special case. The interval is reported "
    "as (from_excl, d_to] with the exclusive left edge = the argmin "
    "day. All integer until the final display division. Scale: one "
    "keyed agg, two windows per nation partition, 25 output rows.",
)
def q_win_max_subarray(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        .localCheckpoint(eager=False)
    )
    tot = daily.groupBy("nation").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("sx"),
    )
    dev = (
        daily.join(F.broadcast(tot), "nation")
        .select(
            "nation",
            "d",
            "n",
            (F.col("n") * F.col("cents") - F.col("sx")).alias("x"),
        )
        .unionByName(
            tot.select(
                "nation",
                F.lit("1900-01-01").cast("date").alias("d"),
                "n",
                F.lit(0).cast("bigint").alias("x"),
            )
        )
    )
    wp = (
        Window.partitionBy("nation")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pref = dev.select(
        "nation", "d", "n", F.sum("x").over(wp).alias("p")
    )
    wm = (
        Window.partitionBy("nation")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    best = pref.select(
        "nation",
        "d",
        "n",
        "p",
        F.min(F.struct(F.col("p"), F.col("d"))).over(wm).alias("m"),
    ).where(F.col("m").isNotNull())
    scored = best.select(
        "nation",
        "n",
        (F.col("p") - F.col("m.p")).cast("bigint").alias("gain_scaled"),
        F.col("m.d").alias("from_excl"),
        F.col("d").alias("d_to"),
        F.row_number()
        .over(
            Window.partitionBy("nation").orderBy(
                (F.col("p") - F.col("m.p")).desc(), F.col("d")
            )
        )
        .alias("rn"),
    )
    return scored.where(F.col("rn") == 1).select(
        "nation",
        F.col("n").alias("n_days"),
        "gain_scaled",
        "from_excl",
        "d_to",
        F.round(
            F.col("gain_scaled").cast("double") / F.col("n") / F.lit(100.0), 2
        ).alias("gain_dollars"),
    )


# ==== wave 176b: trace conformance vs modal variant (W40) ===========


@register(
    "q_win_conformance",
    oracle="""
        WITH codes AS (
            SELECT event_type,
                   chr(CAST(64 + row_number() OVER (ORDER BY event_type)
                            AS INT)) AS code
            FROM (SELECT DISTINCT event_type FROM events)
        ),
        traces AS (
            SELECT e.user_id,
                   string_agg(c.code, '' ORDER BY e.ts, e.event_id)
                       AS trace
            FROM events e JOIN codes c ON c.event_type = e.event_type
            GROUP BY e.user_id
        ),
        variants AS (
            SELECT trace, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM traces GROUP BY trace
        ),
        modal AS (
            SELECT trace AS m_trace,
                   CAST(length(trace) AS BIGINT) AS m_len
            FROM variants ORDER BY cnt DESC, trace LIMIT 1
        ),
        fit AS (
            SELECT CAST(levenshtein(t.trace, m.m_trace) AS BIGINT)
                       AS dist,
                   GREATEST(CAST(length(t.trace) AS BIGINT), m.m_len)
                       AS l,
                   m.m_len
            FROM traces t CROSS JOIN modal m
        )
        SELECT dist,
               CAST(COUNT(*) AS BIGINT) AS n_traces,
               CAST(SUM(((l - dist) * 1000000) // l) AS BIGINT)
                   AS sum_fit_q,
               ROUND(CAST(SUM(((l - dist) * 1000000) // l) AS DOUBLE)
                     / (COUNT(*) * 1000000.0), 6) AS avg_fitness,
               MAX(m_len) AS modal_len
        FROM fit GROUP BY dist
    """,
    section="W40",
    doc="Process-conformance fitness: encode each user's event "
    "sequence as a trace string (per-type single chars, dictionary "
    "= row_number over the sorted distinct types so the coding is "
    "engine-independent), pick the modal variant (max count, "
    "lexicographic tie-break), and score every trace by Levenshtein "
    "distance to it — the alignment-lite conformance check process "
    "mining runs after W37's variant explorer: fitness = "
    "1 - d/max(|t|,|modal|), how far real behavior strays from the "
    "canonical path. Both engines implement unit-cost levenshtein "
    "identically on ASCII codes; per-trace fitness quantizes to "
    "((l-d)*1e6) div l EXACT integers before the group sum, so the "
    "per-distance average is one division. Scale: traces build with "
    "one groupBy(user) holding ordered structs (bounded per-user "
    "event counts), the modal row broadcasts, and levenshtein is "
    "row-local O(|t|*|modal|) — no pairwise trace comparison, only "
    "n_traces distance computations.",
)
def q_win_conformance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    codes = (
        ev.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.chr(
                F.lit(64)
                + F.row_number().over(Window.orderBy("event_type"))
            ).alias("code"),
        )
    )
    traces = (
        ev.join(F.broadcast(codes), "event_type")
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct("ts", "event_id", "code")
                        )
                    ),
                    lambda s: s.getField("code"),
                ),
                "",
            ).alias("trace")
        )
    )
    variants = traces.groupBy("trace").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    modal = (
        variants.orderBy(F.desc("cnt"), F.asc("trace"))
        .limit(1)
        .select(
            F.col("trace").alias("m_trace"),
            F.length("trace").cast("bigint").alias("m_len"),
        )
    )
    fit = traces.crossJoin(F.broadcast(modal)).select(
        F.levenshtein("trace", "m_trace").cast("bigint").alias("dist"),
        F.greatest(
            F.length("trace").cast("bigint"), F.col("m_len")
        ).alias("l"),
        "m_len",
    )
    return fit.groupBy("dist").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_traces"),
        F.sum(
            F.expr("((l - dist) * 1000000) div l")
        )
        .cast("bigint")
        .alias("sum_fit_q"),
        F.round(
            F.sum(F.expr("((l - dist) * 1000000) div l")).cast("double")
            / (F.count(F.lit(1)) * F.lit(1000000.0)),
            6,
        ).alias("avg_fitness"),
        F.max("m_len").alias("modal_len"),
    )


# ==== wave 182b: OEE from event logs (W41) ==========================

_OEE_RATE = 2   # benchmark events per hour for the performance term


@register(
    "q_win_oee",
    oracle=f"""
        WITH md AS (
            SELECT user_id,
                   CAST(date_trunc('day', ts) AS DATE) AS d,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN event_type = 'error'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_err,
                   CAST(MAX(epoch_us(ts)) - MIN(epoch_us(ts))
                        AS BIGINT) AS span
            FROM events GROUP BY 1, 2
        ),
        comp AS (
            SELECT d,
                   CAST(span AS DOUBLE) / 86400000000.0 AS avail,
                   LEAST(1.0, CAST(n AS DOUBLE) * 1800000000.0 / span)
                       AS perf,
                   CAST(n - n_err AS DOUBLE) / n AS qual
            FROM md WHERE n >= 2 AND span > 0
        ),
        quant AS (
            SELECT d,
                   CAST(floor(1e9 * avail) AS BIGINT) AS qa,
                   CAST(floor(1e9 * perf) AS BIGINT) AS qp,
                   CAST(floor(1e9 * qual) AS BIGINT) AS qq,
                   CAST(floor(1e9 * (avail * perf * qual)) AS BIGINT)
                       AS qo
            FROM comp
        )
        SELECT d,
               CAST(COUNT(*) AS BIGINT) AS n_machines,
               ROUND(CAST(SUM(qa) AS DOUBLE) / (COUNT(*) * 1e9), 6)
                   AS avg_availability,
               ROUND(CAST(SUM(qp) AS DOUBLE) / (COUNT(*) * 1e9), 6)
                   AS avg_performance,
               ROUND(CAST(SUM(qq) AS DOUBLE) / (COUNT(*) * 1e9), 6)
                   AS avg_quality,
               ROUND(CAST(SUM(qo) AS DOUBLE) / (COUNT(*) * 1e9), 6)
                   AS avg_oee
        FROM quant GROUP BY d
    """,
    section="W41",
    doc="Overall Equipment Effectiveness from raw event logs, "
    "treating each user as a 'machine' and each day as a shift: "
    "availability = active span / 24 h, performance = event rate vs "
    f"a {_OEE_RATE}/hour benchmark capped at 1, quality = 1 - error "
    "fraction, OEE = A*P*Q — the manufacturing KPI triple (and the "
    "reason OEE is reported as components: a 60% OEE from low A vs "
    "low Q demands opposite fixes). Per-machine-day components are "
    "single pinned double expressions over exact int64 counts and "
    "epoch-microsecond spans; each quantizes floor(1e9 * x) BEFORE "
    "the per-day average so the cross-machine sum is exact integer "
    "(V39 device). Machines with one event (span 0) are excluded by "
    "an explicit gate, not a silent NULL. Scale: one "
    "(user, day)-grain agg then a day-grain agg — two map-side-"
    "combinable shuffles, no windows at all despite the family "
    "name.",
)
def q_win_oee(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    md = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("bigint")
        .alias("n_err"),
        (F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts")))
        .cast("bigint")
        .alias("span"),
    )
    comp = md.where((F.col("n") >= 2) & (F.col("span") > 0)).select(
        "d",
        (F.col("span").cast("double") / F.lit(86400000000.0)).alias(
            "avail"
        ),
        F.least(
            F.lit(1.0),
            F.col("n").cast("double") * F.lit(1800000000.0)
            / F.col("span"),
        ).alias("perf"),
        ((F.col("n") - F.col("n_err")).cast("double") / F.col("n")).alias(
            "qual"
        ),
    )
    quant = comp.select(
        "d",
        F.floor(F.lit(1e9) * F.col("avail")).cast("bigint").alias("qa"),
        F.floor(F.lit(1e9) * F.col("perf")).cast("bigint").alias("qp"),
        F.floor(F.lit(1e9) * F.col("qual")).cast("bigint").alias("qq"),
        F.floor(
            F.lit(1e9) * (F.col("avail") * F.col("perf") * F.col("qual"))
        )
        .cast("bigint")
        .alias("qo"),
    )
    cnt = F.count(F.lit(1))
    return quant.groupBy("d").agg(
        cnt.cast("bigint").alias("n_machines"),
        F.round(
            F.sum("qa").cast("double") / (cnt * F.lit(1e9)), 6
        ).alias("avg_availability"),
        F.round(
            F.sum("qp").cast("double") / (cnt * F.lit(1e9)), 6
        ).alias("avg_performance"),
        F.round(
            F.sum("qq").cast("double") / (cnt * F.lit(1e9)), 6
        ).alias("avg_quality"),
        F.round(
            F.sum("qo").cast("double") / (cnt * F.lit(1e9)), 6
        ).alias("avg_oee"),
    )


# ==== wave 203b: renewal curve (W45) ================================

_RENEWAL_HORIZONS = [30, 90, 180]   # days after first order


@register(
    "q_win_renewal_curve",
    oracle=f"""
        WITH firsts AS (
            SELECT o_custkey,
                   MIN(CAST(o_orderdate AS DATE)) AS d0
            FROM orders GROUP BY o_custkey
        ),
        horizons AS (SELECT unnest({_RENEWAL_HORIZONS}) AS h),
        counted AS (
            SELECT h.h, f.o_custkey,
                   CAST(COUNT(CASE WHEN CAST(o.o_orderdate AS DATE)
                              > f.d0
                              AND date_diff('day', f.d0,
                                  CAST(o.o_orderdate AS DATE)) <= h.h
                              THEN 1 END) AS BIGINT) AS renewals
            FROM firsts f
            JOIN orders o ON o.o_custkey = f.o_custkey
            CROSS JOIN horizons h
            GROUP BY h.h, f.o_custkey
        )
        SELECT CAST(h AS BIGINT) AS horizon_days,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(renewals) AS BIGINT) AS total_renewals,
               ROUND(CAST(SUM(renewals) AS DOUBLE) / COUNT(*), 6)
                   AS renewal_fn,
               ROUND(CAST(SUM(CASE WHEN renewals > 0 THEN 1 ELSE 0 END)
                     AS DOUBLE) / COUNT(*), 6) AS p_any_renewal
        FROM counted GROUP BY h
    """,
    section="W45",
    doc="Empirical renewal function of customer re-ordering: for "
    "horizons {30, 90, 180} days after each customer's FIRST "
    "order, the mean number of subsequent orders (renewal_fn = "
    "m(t), the renewal-theory object behind warranty/repeat-"
    "purchase forecasting: its slope is the long-run re-order "
    "rate 1/mean-gap, and comparing m(180) with 6x m(30) reveals "
    "front-loading) plus the probability of any renewal — the "
    "count-based lifecycle complement to A42's money-based cohort "
    "LTV. Strictly-later orders only (same-day repeats of the "
    "first day are excluded by the > d0 gate, documented). All "
    "counts exact int64; two divisions per horizon. Scale: one "
    "customer-grain min, one fact re-join keyed on customer, 3x "
    "horizon fan-out of counts — payloads never widen.",
)
def q_win_renewal_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    firsts = od.groupBy("o_custkey").agg(
        F.min(F.col("o_orderdate").cast("date")).alias("d0")
    )
    joined = od.select(
        "o_custkey", F.col("o_orderdate").cast("date").alias("d")
    ).join(firsts, "o_custkey")
    outs = []
    for h in _RENEWAL_HORIZONS:
        counted = joined.groupBy("o_custkey").agg(
            F.count(
                F.when(
                    (F.col("d") > F.col("d0"))
                    & (F.datediff(F.col("d"), F.col("d0")) <= h),
                    1,
                )
            )
            .cast("bigint")
            .alias("renewals")
        )
        outs.append(
            counted.agg(
                F.lit(h).cast("bigint").alias("horizon_days"),
                F.count(F.lit(1)).cast("bigint").alias("n_customers"),
                F.sum("renewals").cast("bigint").alias("total_renewals"),
                F.round(
                    F.sum("renewals").cast("double")
                    / F.count(F.lit(1)),
                    6,
                ).alias("renewal_fn"),
                F.round(
                    F.sum(
                        F.when(F.col("renewals") > 0, 1).otherwise(0)
                    ).cast("double")
                    / F.count(F.lit(1)),
                    6,
                ).alias("p_any_renewal"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionAll(o)
    return res
