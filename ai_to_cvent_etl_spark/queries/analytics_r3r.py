"""Twentieth-wave operators (r3 continuation): train/test split, sequence
packing, forecast evaluation, target encoding.

  E24 q_etl_train_test_split — deterministic hash-based 80/10/10 corpus
                               split with per-split size/volume stats —
                               the reproducible-split primitive every
                               training pipeline starts with.
  L15 q_text_sequence_pack   — pretraining sequence packing math
                               (concat-and-chunk): each doc's span of
                               fixed-budget context windows from one
                               cumulative token count.
  TS13 q_ts_forecast_eval    — forecast evaluation: seasonal-naive
                               baseline (value 7 observations prior) vs
                               actual — MAE / WAPE / bias from exact
                               integer errors.
  A36 q_agg_target_encoding  — smoothed target (mean) encoding of a
                               categorical key: (n·mean + m·prior)/(n+m)
                               — the leakage-prone feature-engineering
                               staple, computed exactly.

Determinism notes (SURVEY §5.3):
  * E24 splits on the SK4 48-bit md5 hash mod 10 — exact integer
    assignment; shares are IEEE over exact counts, rounded 6dp.
  * L15 is pure integer window math (cumulative token counts, integer
    division by the budget).
  * TS13's errors are exact BIGINT cents (daily sums int64-backed,
    < 2^53 at every test SF — §5.3 rule 10); the three metrics are
    single IEEE ratios of exact integers, rounded 6dp.
  * A36: per-category counts and DECIMAL sums are exact; prior and
    encodings are IEEE over identical decimal→double casts, rounded
    4dp.

Scale notes:
  * E24 is map-only assignment + a 3-group reduction; the same hash
    expression IS the split column a writer partitions by — split
    membership never needs a lookup table.
  * L15 is one global cumulative window; at 100 TB the cumsum comes
    from a two-pass prefix (per-partition totals broadcast as
    offsets), which mapInPandas implements partition-locally — the
    chunk ids are then per-partition arithmetic.
  * TS13 runs on the |days| spine (TS7's rule).
  * A36 is one keyed reduction + a 1-row prior broadcast; serving
    joins the ≤|categories|-row encoding table broadcast-side. The
    leakage discipline (fit on train only, E24's split) is a
    composition note, not a new plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register

_H48_SPARK_DOC = (
    "cast(conv(substr(md5(cast(doc_id as string)), 1, 12), 16, 10) as bigint)"
)
_H48_DUCK_DOC = (
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT)"
)


# --- E24: deterministic train/val/test split ---------------------------------


@register(
    "q_etl_train_test_split",
    oracle=f"""
        WITH assigned AS (
            SELECT doc_id, n_chars,
                   CASE WHEN {_H48_DUCK_DOC} % 10 < 8 THEN 'train'
                        WHEN {_H48_DUCK_DOC} % 10 = 8 THEN 'val'
                        ELSE 'test' END AS split
            FROM documents
        )
        SELECT split,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               ROUND(CAST(COUNT(*) AS DOUBLE)
                     / CAST(SUM(COUNT(*)) OVER () AS DOUBLE), 6)
                   AS doc_share
        FROM assigned
        GROUP BY split
    """,
    section="E24",
    doc="Deterministic 80/10/10 train/val/test split on the 48-bit md5 "
    "hash of doc_id (SK4's hash device) — the reproducible-split "
    "primitive: membership is a pure function of the id, stable across "
    "runs, machines, and engine versions, so no split manifest is ever "
    "stored or joined. Output: per-split doc counts, char volume, and "
    "shares. Map-only assignment + a 3-group reduction; the same hash "
    "expression is the partitionBy column when writing the split "
    "shards, and new arriving docs self-assign without rebalancing "
    "(unlike a row_number split, which reshuffles membership on every "
    "insert).",
)
def q_etl_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = F.expr(_H48_SPARK_DOC) % 10
    split = (
        F.when(h < 8, "train").when(h == 8, "val").otherwise("test")
    )
    a = docs.select(split.alias("split"), "n_chars")
    w = Window.partitionBy()
    return a.groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    ).select(
        "split",
        "n_docs",
        "total_chars",
        F.round(
            F.col("n_docs").cast("double")
            / F.sum("n_docs").over(w).cast("double"),
            6,
        ).alias("doc_share"),
    )


# --- L15: pretraining sequence packing ---------------------------------------

_PACK_BUDGET = 512


@register(
    "q_text_sequence_pack",
    oracle=f"""
        WITH t AS (
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
            FROM documents
        ),
        c AS (
            SELECT doc_id, n_tok,
                   CAST(SUM(n_tok) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS cum
            FROM t
        )
        SELECT doc_id, n_tok,
               (cum - n_tok) // {_PACK_BUDGET} AS start_chunk,
               (cum - 1) // {_PACK_BUDGET} AS end_chunk,
               (cum - 1) // {_PACK_BUDGET}
               - (cum - n_tok) // {_PACK_BUDGET} + 1 AS n_chunks
        FROM c
    """,
    section="L15",
    doc="Pretraining sequence-packing math (concat-and-chunk): documents "
    "concatenate in doc_id order into one token stream cut into fixed "
    f"{_PACK_BUDGET}-token context windows; each doc's start/end chunk "
    "and span count come from ONE cumulative token count and integer "
    "division — no bin-packing search. Pure integer window logic. The "
    "span count is the cross-boundary diagnostic (n_chunks > 1 docs "
    "get split across contexts — the quantity attention-masking "
    "policies care about). At 100 TB the global cumsum is a two-pass "
    "prefix sum: per-partition totals broadcast as offsets, then "
    "partition-local arithmetic — the packing stays map-side.",
)
def q_text_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    c = t.select("doc_id", "n_tok", F.sum("n_tok").over(w).alias("cum"))
    start = F.expr(f"(cum - n_tok) DIV {_PACK_BUDGET}")
    end = F.expr(f"(cum - 1) DIV {_PACK_BUDGET}")
    return c.select(
        "doc_id",
        "n_tok",
        start.alias("start_chunk"),
        end.alias("end_chunk"),
        (end - start + 1).alias("n_chunks"),
    )


# --- TS13: forecast evaluation metrics ---------------------------------------

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


# --- A36: smoothed target encoding -------------------------------------------

_TE_M = 50.0


@register(
    "q_agg_target_encoding",
    oracle=f"""
        WITH j AS (
            SELECT c.c_nationkey AS nation,
                   CAST(o.o_totalprice AS DECIMAL(18,2)) AS y
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        ),
        g AS (
            SELECT nation,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(y) AS DOUBLE) AS s
            FROM j GROUP BY nation
        ),
        p AS (
            SELECT CAST(SUM(CAST(s AS DECIMAL(18,2))) AS DOUBLE)
                   / SUM(n) AS prior
            FROM g
        )
        SELECT g.nation, g.n,
               ROUND(g.s / g.n, 4) AS cat_mean,
               ROUND((g.s + {_TE_M} * p.prior) / (g.n + {_TE_M}), 4)
                   AS encoded
        FROM g CROSS JOIN p
    """,
    section="A36",
    doc="Smoothed target (mean) encoding of a categorical key (customer "
    "nation → mean order value): enc = (sum + m·prior)/(n + m) with "
    f"m={_TE_M} — shrinks small categories toward the global prior, "
    "the feature-engineering staple for high-cardinality categoricals. "
    "Per-category moments are exact (int counts, DECIMAL sums, "
    "int64-backed); prior and encodings are IEEE over identical casts, "
    "rounded 4dp. One keyed reduction + a 1-row prior broadcast; "
    "serving joins the ≤|categories| encoding table broadcast-side. "
    "Leakage discipline: fit on E24's train split only — composition, "
    "not a new plan.",
)
def q_agg_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    j = orders.join(customer, orders.o_custkey == customer.c_custkey).select(
        F.col("c_nationkey").alias("nation"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("y"),
    )
    g = j.groupBy("nation").agg(
        F.count("*").alias("n"), F.sum("y").cast("double").alias("s")
    )
    p = g.agg(
        (
            F.sum(F.col("s").cast("decimal(18,2)")).cast("double")
            / F.sum("n")
        ).alias("prior")
    )
    return g.crossJoin(F.broadcast(p)).select(
        "nation",
        "n",
        F.round(F.col("s") / F.col("n"), 4).alias("cat_mean"),
        F.round(
            (F.col("s") + _TE_M * F.col("prior")) / (F.col("n") + _TE_M), 4
        ).alias("encoded"),
    )
