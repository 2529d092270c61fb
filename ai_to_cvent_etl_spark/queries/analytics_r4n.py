"""Forty-second-wave operators (r3 continuation): keyword-in-context,
per-group exact allocation.

  T16 q_text_kwic      — keyword-in-context concordance: every
                         occurrence of a keyword with its ±2-token
                         window — the corpus-inspection primitive
                         behind search snippets and annotation review.
  J25 q_join_allocate_lines — grain-spreading allocation: each order's
                         1% fee spread across its lineitems
                         proportional to extended price, with
                         PER-ORDER largest-remainder rounding so every
                         order's line fees sum exactly to its fee
                         (A49's Hamilton device, applied per group
                         inside a join).

Determinism notes (SURVEY §5.3):
  * T16 is pure array/string logic; occurrence positions are exact and
    the (doc_id, pos) pair is a unique key.
  * J25: the per-order fee is an exact integer (cents DIV 100); share
    products are IEEE over exact integer cents — identical bits — so
    floor bases, remainders, and the per-order remainder rank (line
    tie-break) agree cross-engine.

Scale notes:
  * T16 rides the tokenization explode (fan-out rule); the window
    extraction is row-local slicing, no join.
  * J25 is one per-order window pass over lineitem co-keyed with the
    orders join — the allocation never shuffles twice; per-order sums
    are exact BY CONSTRUCTION, so downstream reconciliation (J23)
    closes without epsilon tolerances.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register

# --- T16: keyword-in-context -------------------------------------------------

_KWIC_TERM = "join"


@register(
    "q_text_kwic",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS sp FROM documents
        ),
        occ AS (
            SELECT doc_id, sp, u.pos AS pos
            FROM (
                SELECT doc_id, sp,
                       unnest(list_transform(sp,
                              (x, i) -> struct_pack(tok := x, pos := i)))
                           AS u
                FROM toks
            )
            WHERE u.tok = '{_KWIC_TERM}'
        )
        SELECT doc_id, CAST(pos AS INT) AS pos,
               coalesce(array_to_string(
                   list_slice(sp, greatest(1, pos - 2), pos - 1), ' '), '')
                   AS left_ctx,
               coalesce(array_to_string(
                   list_slice(sp, pos + 1,
                              least(len(sp), pos + 2)), ' '), '')
                   AS right_ctx
        FROM occ
    """,
    section="T16",
    doc=f"Keyword-in-context (KWIC) concordance: every occurrence of "
    f"'{_KWIC_TERM}' with its two tokens of left and right context "
    "(document-boundary clamped) — the corpus-inspection primitive "
    "behind search snippets, annotation review, and contamination "
    "spot checks (pair with SK7's consistent sample to review the "
    "SAME occurrences across snapshots). Positions are 1-based array "
    "indices — exact, and (doc_id, pos) is a unique key. Row-local "
    "slicing on the tokenization explode; no join, no shuffle beyond "
    "the explode fan-out.",
)
def q_text_kwic(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sp = F.split("text", " ")
    occ = docs.select(
        "doc_id",
        sp.alias("sp"),
        F.posexplode(sp).alias("pos0", "tok"),
    ).where(F.col("tok") == _KWIC_TERM).select(
        "doc_id", "sp", (F.col("pos0") + 1).alias("pos")
    )
    left = F.array_join(
        F.expr("slice(sp, greatest(1, pos - 2), "
               "pos - greatest(1, pos - 2))"),
        " ",
    )
    right = F.array_join(
        F.expr("slice(sp, pos + 1, least(size(sp), pos + 2) - pos)"), " "
    )
    return occ.select(
        "doc_id",
        F.col("pos").cast("int").alias("pos"),
        left.alias("left_ctx"),
        right.alias("right_ctx"),
    )


# --- J25: per-group exact fee allocation -------------------------------------


@register(
    "q_join_allocate_lines",
    oracle="""
        WITH fees AS (
            SELECT o_orderkey,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) // 100 AS fee_cents
            FROM orders WHERE o_orderkey % 20 = 0
        ),
        lines AS (
            SELECT l.l_orderkey, l.l_linenumber, f.fee_cents,
                   CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS line_cents,
                   CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                                 * 100 AS BIGINT))
                        OVER (PARTITION BY l.l_orderkey) AS BIGINT)
                       AS order_cents
            FROM lineitem l JOIN fees f ON f.o_orderkey = l.l_orderkey
        ),
        based AS (
            SELECT l_orderkey, l_linenumber, fee_cents,
                   CAST(floor(CAST(line_cents AS DOUBLE) / order_cents
                              * fee_cents) AS BIGINT) AS base,
                   CAST(line_cents AS DOUBLE) / order_cents * fee_cents
                   - floor(CAST(line_cents AS DOUBLE) / order_cents
                           * fee_cents) AS rem
            FROM lines
        ),
        ranked AS (
            SELECT l_orderkey, l_linenumber, base,
                   row_number() OVER (
                       PARTITION BY l_orderkey
                       ORDER BY rem DESC, l_linenumber
                   ) AS rnk,
                   CAST(fee_cents - SUM(base) OVER (PARTITION BY l_orderkey)
                        AS BIGINT) AS shortfall
            FROM based
        )
        SELECT l_orderkey, l_linenumber,
               CAST(base + CASE WHEN rnk <= shortfall THEN 1 ELSE 0 END
                    AS BIGINT) AS line_fee_cents
        FROM ranked
    """,
    section="J25",
    doc="Grain-spreading allocation: each sampled order's 1% fee (exact "
    "integer cents) spread across its OWN lineitems proportional to "
    "extended price, with PER-ORDER largest-remainder rounding "
    "(Hamilton's method, A49's device applied per group): floor "
    "bases, then the order's shortfall cents to its largest "
    "fractional remainders (line-number tie-break) — so every order's "
    "line fees sum EXACTLY to its fee and reconciliation (J23) closes "
    "without tolerances. The header-to-line allocation every billing "
    "ETL performs; naive per-line rounding leaves per-order drift "
    "that compounds forever. One co-keyed join + per-order windows — "
    "the allocation never shuffles twice.",
)
def q_join_allocate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    fees = orders.where(F.col("o_orderkey") % 20 == 0).select(
        "o_orderkey",
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            " DIV 100"
        ).alias("fee_cents"),
    )
    lines = li.join(fees, li.l_orderkey == fees.o_orderkey).select(
        "l_orderkey",
        "l_linenumber",
        "fee_cents",
        F.expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("line_cents"),
    )
    wo = Window.partitionBy("l_orderkey")
    lines = lines.withColumn("order_cents", F.sum("line_cents").over(wo))
    raw = (
        F.col("line_cents").cast("double")
        / F.col("order_cents")
        * F.col("fee_cents")
    )
    based = lines.select(
        "l_orderkey",
        "l_linenumber",
        "fee_cents",
        F.floor(raw).cast("long").alias("base"),
        (raw - F.floor(raw)).alias("rem"),
    )
    ranked = based.select(
        "l_orderkey",
        "l_linenumber",
        "base",
        F.row_number()
        .over(
            Window.partitionBy("l_orderkey").orderBy(
                F.desc("rem"), F.asc("l_linenumber")
            )
        )
        .alias("rnk"),
        (F.col("fee_cents") - F.sum("base").over(wo)).alias("shortfall"),
    )
    return ranked.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.col("base")
            + F.when(F.col("rnk") <= F.col("shortfall"), 1).otherwise(0)
        ).cast("long").alias("line_fee_cents"),
    )
