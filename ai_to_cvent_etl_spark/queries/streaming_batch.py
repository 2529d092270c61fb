"""SURVEY §2.11 — streaming operators in batch-equivalent form (ST1-ST3).

The driver's oracle is batch DuckDB SQL, so the declared forms compute the
same windowing semantics on the static events table. The true readStream
twins live in ai_to_cvent_etl_spark/streaming/ and are asserted equal to
these batch results in tests (stream-table duality).

Both engines align tumbling/sliding buckets to the epoch grid (probe-pinned
by the parity tests). Session windows (ST3) are gaps-and-islands: one lag +
one running sum + one group-by — identical SQL semantics on both engines,
exact because timestamps are integer microseconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register


@register(
    "q_stream_tumbling",
    oracle="""
        SELECT CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP) AS window_start,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
    section="ST1",
    doc="1-hour tumbling window counts + decimal-exact value sums per event type.",
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DecimalType(12, 2))).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "q_stream_sliding",
    oracle="""
        SELECT CAST(u AS TIMESTAMP) AS window_start,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM (
            SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
                           time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes']) AS u
            FROM events
        )
        GROUP BY 1
    """,
    section="ST2",
    doc="1-hour windows sliding 30 min: each event lands in exactly 2 windows.",
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


@register(
    "q_stream_session",
    oracle="""
        WITH gaps AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN LAG(ts) OVER w IS NULL
                          OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 600000000
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sessions AS (
            SELECT user_id, ts, event_id,
                   SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
            FROM gaps
        )
        SELECT user_id,
               CAST(session_id AS BIGINT) AS session_id,
               MIN(ts) AS session_start,
               MAX(ts) AS session_end,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM sessions
        GROUP BY user_id, session_id
    """,
    section="ST3",
    doc="Per-user session windows with 10-minute gap (gaps-and-islands; "
    "streaming twin uses session_window in streaming/jobs.py).",
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(gap_us.isNull() | (gap_us > 600_000_000), 1).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        events.withColumn("is_new", is_new)
        .withColumn("session_id", F.sum("is_new").over(run).cast("bigint"))
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# Wave 117 (r5): watermark late-data semantics as an exact batch twin.
# ---------------------------------------------------------------------------

_WM_DELAY_MIN = 5
_WM_WINDOW_MIN = 10


@register(
    "q_stream_watermark_drop",
    oracle=f"""
        WITH arrival AS (
            SELECT ts, event_id,
                   MAX(ts) OVER (ORDER BY event_id
                                 ROWS UNBOUNDED PRECEDING) AS max_seen
            FROM events
        ),
        flagged AS (
            SELECT ts, event_id,
                   ts < max_seen - INTERVAL {_WM_DELAY_MIN} MINUTE
                       AS is_late
            FROM arrival
        )
        SELECT CAST(time_bucket(INTERVAL '{_WM_WINDOW_MIN} minutes', ts)
                    AS TIMESTAMP) AS win_start,
               CAST(SUM(CASE WHEN is_late THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_kept,
               CAST(SUM(CASE WHEN is_late THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dropped
        FROM flagged
        GROUP BY 1
    """,
    section="ST13",
    doc=f"Watermark late-data semantics, exact batch twin: events arrive "
    "in event_id order, the watermark trails the running max event "
    f"time by {_WM_DELAY_MIN} minutes, and an event older than the "
    "watermark at its arrival is dropped; per "
    f"{_WM_WINDOW_MIN}-minute tumbling window, kept vs dropped "
    "counts. This pins the EXACT drop rule Structured Streaming "
    "applies (withWatermark + window agg discards below-watermark "
    "rows), with the one batch-computable refinement: arrival order "
    "is the deterministic event_id sequence, where a real stream's "
    "watermark is per-trigger. The ST1-3 twins check windowing; this "
    "one checks the DROP boundary — the part late-data bugs actually "
    "hit. Counts exact BIGINT; window start is integer epoch "
    "arithmetic. Scale note: the running max is a global ordered "
    "window here (driver-sized at test SF); on a real stream this "
    "state is O(1) per partition maintained by the engine — the "
    "batch twin trades parallelism for checkability, like W24's "
    "spine device.",
)
def q_stream_watermark_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # Scale note (r6): the running watermark max over arrival order runs
    # on the distributed two-pass running-aggregate operator — no
    # single-partition window over the stream history.
    from ai_to_cvent_etl_spark.operators.ranking import global_running

    flagged = global_running(
        ev.select("ts", "event_id"),
        ["event_id"],
        {"wm_max": ("max", F.col("ts"))},
    ).select(
        "ts",
        (
            F.col("ts")
            < F.col("wm_max") - F.expr(f"INTERVAL {_WM_DELAY_MIN} MINUTE")
        ).alias("is_late"),
    )
    return (
        flagged.groupBy(
            F.window("ts", f"{_WM_WINDOW_MIN} minutes")
            .getField("start")
            .alias("win_start")
        )
        .agg(
            F.sum(F.when(F.col("is_late"), 0).otherwise(1))
            .cast("bigint")
            .alias("n_kept"),
            F.sum(F.when(F.col("is_late"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_dropped"),
        )
    )


@register(
    "q_stream_dedup_within_watermark",
    oracle="""
        WITH keyed AS (
            SELECT user_id, event_type,
                   CAST(time_bucket(INTERVAL '10 minutes', ts)
                        AS TIMESTAMP) AS win_start,
                   event_id, ts,
                   row_number() OVER (
                       PARTITION BY user_id, event_type,
                                    time_bucket(INTERVAL '10 minutes', ts)
                       ORDER BY ts, event_id) AS rn,
                   CAST(COUNT(*) OVER (
                       PARTITION BY user_id, event_type,
                                    time_bucket(INTERVAL '10 minutes', ts))
                        AS BIGINT) AS n_in_group
            FROM events
        )
        SELECT user_id, event_type, win_start,
               event_id AS kept_event_id,
               CAST(n_in_group - 1 AS BIGINT) AS n_dropped
        FROM keyed WHERE rn = 1
    """,
    section="ST14",
    doc="Streaming dropDuplicates-within-watermark, exact batch twin: "
    "keep the FIRST event per (user, event_type) dedup key inside "
    "each 10-minute state window and count what the stream would "
    "have suppressed — the semantics of "
    "dropDuplicatesWithinWatermark, where state for a key is held "
    "one watermark-window and re-arrivals are dropped. First-wins "
    "is pinned by (ts, event_id) ordering, the same deterministic "
    "arrival order as ST13; the dropped count per surviving row "
    "makes suppression auditable (the number a dedup stream can't "
    "easily show you). Counts exact BIGINT, window starts via the "
    "ST1 time_bucket/F.window device. Scale: one shuffle on the "
    "dedup key + window — exactly the state layout the streaming "
    "engine keeps, with bounded per-key state by construction.",
)
def q_stream_dedup_within_watermark(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    win = F.window("ts", "10 minutes").getField("start")
    w = Window.partitionBy("user_id", "event_type", win).orderBy(
        "ts", "event_id"
    )
    wn = Window.partitionBy("user_id", "event_type", win)
    keyed = ev.select(
        "user_id",
        "event_type",
        win.alias("win_start"),
        "event_id",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).cast("bigint").alias("n_in_group"),
    )
    return keyed.where(F.col("rn") == 1).select(
        "user_id",
        "event_type",
        "win_start",
        F.col("event_id").alias("kept_event_id"),
        (F.col("n_in_group") - 1).cast("bigint").alias("n_dropped"),
    )
