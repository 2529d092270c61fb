"""Thirty-second-wave operators (r3 continuation): SQL-defined UDFs,
interval merging, generator functions, normalization dedup.

  X11 q_sql_udf           — Spark 4 SQL-defined functions: a scalar
                            CREATE FUNCTION ... RETURN expr and a
                            table-valued RETURNS TABLE form, both used
                            in one query — UDFs that stay INSIDE
                            Catalyst (inlined into the plan, codegen'd,
                            optimizable), unlike every Python tier.
  W30 q_win_interval_merge — merge overlapping intervals per user
                            (running-max sweep + island ids): merged
                            session spans with counts and covered
                            duration — the interval-union primitive.
  F22 q_generator_funcs   — the generator family: sequence() of dates,
                            explode_outer over a nullable array,
                            inline() of a struct array — row-generating
                            expressions vs DuckDB generate_series /
                            unnest.
  D16 q_dedup_normalized  — normalization-tier dedup: case/whitespace-
                            insensitive canonical text hash groups —
                            the tier between byte-exact (U6) and
                            near-dup (D1), catching trivially reformatted
                            copies at exact-dedup cost.

Determinism notes (SURVEY §5.3):
  * X11's functions are pure SQL expressions — the oracle inlines them.
  * W30 is integer microsecond logic (running max end, island flags).
  * F22 emits exact dates/integers; explode_outer's NULL row is pinned
    by both engines' LEFT-join unnest semantics.
  * D16 is deterministic string normalization + md5 grouping.

Scale notes:
  * X11: SQL UDFs inline — predicates written through them still push
    down, codegen still fuses; they are the ONLY user-function tier
    with zero boundary cost, which is why shared business logic
    belongs here before any Python tier.
  * W30 is one keyed sort window per user — the same shape as W28's
    sessionization with a data-driven (not fixed-gap) merge rule.
  * F22 is map-only generation.
  * D16 is U6's single keyed shuffle on the canonical hash — run it
    between exact and LSH tiers; every pair it catches is one LSH
    never has to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register

# --- X11: SQL-defined functions ----------------------------------------------


@register(
    "q_sql_udf",
    oracle="""
        WITH tiers AS (
            SELECT CAST(g.g AS INT) AS tier FROM generate_series(1, 3) g(g)
        )
        SELECT l_orderkey, l_linenumber, t.tier,
               l_extendedprice * (1 - l_discount) * t.tier AS tiered_net
        FROM lineitem CROSS JOIN tiers t
        WHERE l_quantity > 45
    """,
    section="X11",
    doc="Spark 4 SQL-defined functions: a scalar CREATE FUNCTION "
    "net(p, d) RETURN p*(1-d) and a table-valued RETURNS TABLE tier "
    "generator, composed in one query (each high-quantity lineitem "
    "fanned across the generated tiers with the scalar applied). SQL "
    "UDFs INLINE into the Catalyst plan — predicates through them "
    "still push down and codegen still fuses, making this the only "
    "zero-boundary-cost user-function tier (the X1-X10 Python ladder "
    "all pay a process hop); shared business logic belongs here "
    "first. The oracle inlines both bodies — inlining IS the "
    "semantics.",
)
def q_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "x11_lineitem"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION x11_net(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1 - d)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION x11_tiers(n INT) "
        "RETURNS TABLE (tier INT) RETURN SELECT explode(sequence(1, n))"
    )
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber, t.tier,
               x11_net(l_extendedprice, l_discount) * t.tier AS tiered_net
        FROM x11_lineitem CROSS JOIN x11_tiers(3) t
        WHERE l_quantity > 45
        """
    )


# --- W30: overlapping-interval merge -----------------------------------------

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


# --- F22: generator functions ------------------------------------------------


@register(
    "q_generator_funcs",
    oracle="""
        WITH months AS (
            SELECT o_orderkey,
                   unnest(generate_series(
                       CAST(date_trunc('month', o_orderdate) AS DATE),
                       CAST(date_trunc('month', o_orderdate) AS DATE)
                       + INTERVAL 2 MONTH,
                       INTERVAL 1 MONTH)) AS bill_month
            FROM orders WHERE o_orderkey % 50 = 0
        )
        SELECT o_orderkey,
               CAST(bill_month AS DATE) AS bill_month,
               CAST(row_number() OVER (
                   PARTITION BY o_orderkey ORDER BY bill_month
               ) AS INT) AS installment
        FROM months
    """,
    section="F22",
    doc="Generator expressions: sequence(month_start, +2 months, 1 "
    "month) exploded into a 3-installment billing schedule per "
    "sampled order — the row-GENERATING family (sequence/explode; "
    "posexplode and inline are the indexed/struct variants, "
    "explode_outer the null-preserving one) vs DuckDB "
    "generate_series+unnest. Exact date arithmetic; installment "
    "numbers by an ordered window. Map-side fan-out — the idiom "
    "behind date spines (E6), billing schedules, and slot expansion; "
    "generation parallelizes with its parent row, no driver "
    "sequence.",
)
def q_generator_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    sampled = orders.where(F.col("o_orderkey") % 50 == 0)
    months = sampled.select(
        "o_orderkey",
        F.explode(
            F.sequence(
                F.date_trunc("month", "o_orderdate").cast("date"),
                F.add_months(
                    F.date_trunc("month", "o_orderdate").cast("date"), 2
                ),
                F.expr("INTERVAL 1 MONTH"),
            )
        ).alias("bill_month"),
    )
    return months.select(
        "o_orderkey",
        F.col("bill_month").cast("date").alias("bill_month"),
        F.row_number()
        .over(Window.partitionBy("o_orderkey").orderBy("bill_month"))
        .cast("int")
        .alias("installment"),
    )


# --- D16: normalization-tier dedup -------------------------------------------


@register(
    "q_dedup_normalized",
    oracle="""
        WITH norm AS (
            SELECT doc_id,
                   md5(regexp_replace(
                       trim(lower(
                           CASE WHEN doc_id % 3 = 0 THEN '  ' || upper(text)
                                WHEN doc_id % 3 = 1
                                THEN regexp_replace(text, ' ', '   ', 'g')
                                ELSE text END)),
                       ' +', ' ', 'g')) AS ckey
            FROM documents
        )
        SELECT ckey,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               MIN(doc_id) AS canonical_doc,
               COUNT(*) > 1 AS is_dup_group
        FROM norm
        GROUP BY ckey
    """,
    section="D16",
    doc="Normalization-tier dedup: documents deterministically reformatted "
    "(every 3rd uppercased with leading spaces, every 3rd+1 with "
    "inflated whitespace) collapse under lower + trim + whitespace-"
    "collapse + md5 — the tier BETWEEN byte-exact dedup (U6, which "
    "these variants evade) and near-dup LSH (D1, which pays signature "
    "cost for what a string normalization catches free). Groups by "
    "canonical hash with min-doc canonical record. One keyed shuffle "
    "at exact-dedup cost; every pair this tier catches is one the "
    "quadratic-ish tiers never see — tier ordering IS the dedup "
    "budget (U6 → D16 → D14 URLs → D1/D3 → T5 verify).",
)
def q_dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    messy = (
        F.when(F.col("doc_id") % 3 == 0, F.concat(F.lit("  "), F.upper("text")))
        .when(
            F.col("doc_id") % 3 == 1,
            F.regexp_replace("text", " ", "   "),
        )
        .otherwise(F.col("text"))
    )
    ckey = F.md5(
        F.regexp_replace(F.trim(F.lower(messy)), " +", " ")
    )
    return (
        docs.select("doc_id", ckey.alias("ckey"))
        .groupBy("ckey")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("canonical_doc"),
            (F.count("*") > 1).alias("is_dup_group"),
        )
    )
