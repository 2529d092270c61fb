"""Twenty-eighth-wave operators (r3 continuation): concurrency sweep,
residual anomaly flags, grouped-map applyInPandas.

  W27 q_win_max_concurrency — maximum concurrent sessions via the
                              +1/−1 interval sweep (running sum over
                              boundary events) — the capacity-planning
                              query interval overlap joins (J16) can't
                              answer without quadratic work.
  TS16 q_ts_anomaly_residual — decomposition-residual anomaly flags:
                              TS12's trend/seasonal residuals scored
                              against a MAD-based robust threshold —
                              the anomaly detector that ignores trend
                              and weekday pattern by construction.
  X10 q_apply_in_pandas     — grouped-map applyInPandas: per-status
                              median-centering in pandas (sort-based,
                              deterministic) — the grouped-map rung of
                              the pandas ladder (X2 scalar, X3 agg, X6
                              cogroup, M2 mapInPandas).

Determinism notes (SURVEY §5.3):
  * W27 is pure integer sweep logic; boundary ordering is (time, delta
    asc, event_id) so session ends sort before starts at the same
    microsecond — the standard closed-interval convention, pinned
    identically in both engines; the argmax tie-breaks on time.
  * TS16: residuals come from the TS12 construction (exact decimal
    trend sums, quantized seasonal means); the MAD is a nearest-rank
    order statistic of floor-quantized |residuals| (pure integers),
    so the threshold comparison is exact.
  * X10's pandas function SORTS the group before computing the
    nearest-rank median (iloc[(n-1)//2]) — no dependence on Spark's
    arbitrary intra-group row order; centering is one IEEE subtraction
    of 2dp doubles.

Scale notes:
  * W27: the sweep is one keyed sort per day partition here; a global
    sweep at 100 TB range-partitions boundaries by time and carries
    partition-boundary offsets (the L15 two-pass prefix pattern).
  * TS16 runs on the |days| spine.
  * X10 streams one group per pandas call (Arrow batches); group size
    is the memory bound — the reason grouped-map is for per-entity
    model-ish logic, never whole-table transforms (the X-ladder rule).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register

# --- W27: maximum concurrency sweep ------------------------------------------

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
    w = Window.orderBy("t", "delta", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sweep = b.select("t", F.sum("delta").over(w).alias("conc"))
    return (
        sweep.orderBy(F.desc("conc"), F.asc("t"))
        .limit(1)
        .select(
            F.col("t").alias("at_us"),
            F.col("conc").cast("long").alias("max_concurrent"),
        )
    )


# --- TS16: residual-based anomaly flags --------------------------------------

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


# --- X10: grouped-map applyInPandas ------------------------------------------


def _center_on_median(pdf: pd.DataFrame) -> pd.DataFrame:
    """Nearest-rank median centering, SORT-based so the result does not
    depend on Spark's arbitrary intra-group row order."""
    s = pdf.sort_values(["o_totalprice", "o_orderkey"]).reset_index(drop=True)
    med = float(s["o_totalprice"].iloc[(len(s) - 1) // 2])
    return pd.DataFrame(
        {
            "o_orderkey": pdf["o_orderkey"],
            "o_orderstatus": pdf["o_orderstatus"],
            "group_median": med,
            "centered": pdf["o_totalprice"] - med,
        }
    )


@register(
    "q_apply_in_pandas",
    oracle="""
        WITH med AS (
            SELECT o_orderstatus,
                   MAX(CASE WHEN rn = (n - 1) // 2 + 1
                            THEN o_totalprice END) AS m
            FROM (
                SELECT o_orderstatus, o_totalprice,
                       row_number() OVER (
                           PARTITION BY o_orderstatus
                           ORDER BY o_totalprice, o_orderkey
                       ) AS rn,
                       COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
                FROM orders
            ) GROUP BY o_orderstatus
        )
        SELECT o.o_orderkey, o.o_orderstatus,
               med.m AS group_median,
               o.o_totalprice - med.m AS centered
        FROM orders o JOIN med ON med.o_orderstatus = o.o_orderstatus
    """,
    section="X10",
    doc="Grouped-map applyInPandas — the per-group pandas rung of the "
    "Python ladder (X2 scalar, X3 grouped-agg, X6 cogroup, M2 "
    "mapInPandas): each status group streams to one pandas call that "
    "computes the NEAREST-RANK median (sorting first, so the result "
    "is independent of Spark's arbitrary intra-group order — the "
    "grouped-map determinism trap) and centers every order on it. "
    "Mirrored by a rank-window median + join in SQL. One keyed "
    "shuffle; group size is the pandas memory bound, which is why "
    "grouped-map fits per-entity logic and never whole-table "
    "transforms.",
)
def q_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    return orders.groupBy("o_orderstatus").applyInPandas(
        _center_on_median,
        schema="o_orderkey long, o_orderstatus string, "
        "group_median double, centered double",
    )
