"""Thirty-seventh-wave operators (r3 continuation): bitemporal as-of,
sample-ratio-mismatch check, character-entropy gate.

  E31 q_etl_bitemporal    — bitemporal reconstruction: a (valid_from,
                            recorded_at) version store answering 'what
                            did we BELIEVE on transaction date T about
                            the state valid on date V' — J14's
                            point-in-time join with the second
                            (knowledge) time axis.
  A48 q_agg_srm_check     — sample-ratio mismatch: chi-square of
                            observed arm sizes against the designed
                            50/50 split — the experiment health check
                            that invalidates a readout BEFORE anyone
                            looks at the metric.
  L18 q_text_char_entropy — character-level Shannon entropy per
                            document — the gibberish/random-string
                            detector in the quality-gate family
                            (L3/L17), catching what word-level stats
                            miss.

Determinism notes (SURVEY §5.3):
  * E31 is exact timestamp/integer filtering (max-by over versions with
    unique version ids).
  * A48: counts exact; the chi statistic is one IEEE expression rounded
    4dp.
  * L18: per-character counts are exact; each p·ln p term is quantized
    floor(x·1e12) before the exact per-doc DECIMAL sum (≤ ~40 distinct
    chars/doc — rule 10 margin enormous); entropy rounded 6dp.

Scale notes:
  * E31: the version store is append-only; the two-axis as-of is one
    keyed max-by per (key, T, V) probe — at scale it rides J14's
    backward-asof machinery twice (recorded_at first, valid_from
    second), co-keyed, no new shuffle class.
  * A48 is collapsed-count arithmetic — run it on EVERY experiment
    readout (it is the cheapest guard against the most common
    experiment-invalidating bug: biased assignment or logging loss).
  * L18 is one char-explode + two keyed per-doc reductions; chars per
    doc bound the explode — the gate is linear in corpus bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register

# --- E31: bitemporal as-of reconstruction ------------------------------------


@register(
    "q_etl_bitemporal",
    oracle="""
        WITH versions AS (
            -- version 1: original price, recorded at order date,
            --            valid from order date
            SELECT o_orderkey AS k, 1 AS ver,
                   o_orderdate AS valid_from,
                   o_orderdate AS recorded_at,
                   CAST(o_totalprice AS DECIMAL(18,2)) AS price
            FROM orders
            UNION ALL
            -- version 2 (every 4th key): a RETROACTIVE correction —
            -- recorded 30 days later, but valid from the original date
            SELECT o_orderkey, 2,
                   o_orderdate,
                   o_orderdate + INTERVAL 30 DAY,
                   CAST(o_totalprice AS DECIMAL(18,2))
                   + CAST(5 AS DECIMAL(18,2))
            FROM orders WHERE o_orderkey % 4 = 0
            UNION ALL
            -- version 3 (every 6th key): a FUTURE-dated change —
            -- recorded 10 days after the order, valid from +60 days
            SELECT o_orderkey, 3,
                   o_orderdate + INTERVAL 60 DAY,
                   o_orderdate + INTERVAL 10 DAY,
                   CAST(o_totalprice AS DECIMAL(18,2))
                   + CAST(9 AS DECIMAL(18,2))
            FROM orders WHERE o_orderkey % 6 = 0
        ),
        visible AS (
            -- belief as of T = order date + 20 days,
            -- about validity date V = order date + 90 days
            SELECT v.k, v.ver, v.price,
                   row_number() OVER (
                       PARTITION BY v.k
                       ORDER BY v.valid_from DESC, v.ver DESC
                   ) AS rn
            FROM versions v
            JOIN orders o ON o.o_orderkey = v.k
            WHERE v.recorded_at <= o.o_orderdate + INTERVAL 20 DAY
              AND v.valid_from <= o.o_orderdate + INTERVAL 90 DAY
        )
        SELECT k AS o_orderkey,
               CAST(ver AS INT) AS believed_version,
               CAST(price AS DOUBLE) AS believed_price
        FROM visible WHERE rn = 1
    """,
    section="E31",
    doc="Bitemporal reconstruction — the two-axis as-of a warehouse "
    "needs for audits and restatements: an append-only version store "
    "carries (valid_from, recorded_at) per version (original record; "
    "a RETROACTIVE correction recorded 30 days later but valid from "
    "the start; a FUTURE-dated change recorded early but valid from "
    "+60 days), and the query answers 'what did we BELIEVE at T=+20d "
    "about the state valid at V=+90d': filter recorded_at ≤ T (the "
    "knowledge axis — the retro fix is visible, version 3 is too), "
    "then latest valid_from ≤ V wins (the validity axis — so the "
    "future-dated change applies at V=+90d where J14's single-axis "
    "PIT would miss the knowledge cut entirely). One keyed rank per "
    "probe; at scale both axes ride J14's backward-asof machinery "
    "co-keyed — no new shuffle class.",
)
def q_etl_bitemporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    p = F.col("o_totalprice").cast("decimal(18,2)")
    v1 = orders.select(
        F.col("o_orderkey").alias("k"),
        F.lit(1).alias("ver"),
        F.col("o_orderdate").alias("valid_from"),
        F.col("o_orderdate").alias("recorded_at"),
        p.alias("price"),
    )
    v2 = orders.where(F.col("o_orderkey") % 4 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.lit(2).alias("ver"),
        F.col("o_orderdate").alias("valid_from"),
        F.expr("o_orderdate + INTERVAL 30 DAY").alias("recorded_at"),
        (p + F.lit(5).cast("decimal(18,2)")).alias("price"),
    )
    v3 = orders.where(F.col("o_orderkey") % 6 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.lit(3).alias("ver"),
        F.expr("o_orderdate + INTERVAL 60 DAY").alias("valid_from"),
        F.expr("o_orderdate + INTERVAL 10 DAY").alias("recorded_at"),
        (p + F.lit(9).cast("decimal(18,2)")).alias("price"),
    )
    versions = v1.unionAll(v2).unionAll(v3)
    probes = orders.select(
        F.col("o_orderkey").alias("pk"),
        F.expr("o_orderdate + INTERVAL 20 DAY").alias("t_axis"),
        F.expr("o_orderdate + INTERVAL 90 DAY").alias("v_axis"),
    )
    j = versions.join(probes, versions.k == probes.pk).where(
        (F.col("recorded_at") <= F.col("t_axis"))
        & (F.col("valid_from") <= F.col("v_axis"))
    )
    from pyspark.sql import Window

    rn = F.row_number().over(
        Window.partitionBy("k").orderBy(
            F.desc("valid_from"), F.desc("ver")
        )
    )
    return (
        j.withColumn("rn", rn)
        .where(F.col("rn") == 1)
        .select(
            F.col("k").alias("o_orderkey"),
            F.col("ver").cast("int").alias("believed_version"),
            F.col("price").cast("double").alias("believed_price"),
        )
    )


# --- A48: sample-ratio mismatch ----------------------------------------------

_H48_USER = (
    "cast(conv(substr(md5(cast(user_id as string)), 1, 12), 16, 10) as bigint)"
)
_H48_USER_DUCK = (
    "CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12)) AS BIGINT)"
)


@register(
    "q_agg_srm_check",
    oracle=f"""
        WITH u AS (
            SELECT DISTINCT user_id, {_H48_USER_DUCK} % 2 AS arm
            FROM events
        ),
        c AS (
            SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_a,
                   CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_b
            FROM u
        )
        SELECT n_a, n_b,
               ROUND((CAST(n_a AS DOUBLE)
                      - CAST(n_a + n_b AS DOUBLE) / 2.0)
                     * (CAST(n_a AS DOUBLE)
                        - CAST(n_a + n_b AS DOUBLE) / 2.0)
                     / (CAST(n_a + n_b AS DOUBLE) / 2.0)
                     + (CAST(n_b AS DOUBLE)
                        - CAST(n_a + n_b AS DOUBLE) / 2.0)
                       * (CAST(n_b AS DOUBLE)
                          - CAST(n_a + n_b AS DOUBLE) / 2.0)
                       / (CAST(n_a + n_b AS DOUBLE) / 2.0), 4) AS chi2,
               abs(CAST(n_a AS DOUBLE) - CAST(n_b AS DOUBLE))
               / sqrt(CAST(n_a + n_b AS DOUBLE)) > 3.8906 AS srm_flag
        FROM c
    """,
    section="A48",
    doc="Sample-ratio-mismatch check: chi-square of observed arm sizes "
    "against the designed 50/50 hash split, plus the flag at the "
    "p≈0.0001 threshold (|n_a−n_b|/√n > 3.89 — SRM uses a tiny alpha "
    "because assignment bugs produce huge chi values and false alarms "
    "must be near-zero). THE experiment health gate: a readout whose "
    "arms fail SRM is invalid regardless of its metric p-values "
    "(biased assignment, logging loss, bot filtering asymmetry). "
    "Exact counts; the statistic is one IEEE expression. Run it on "
    "every readout — it costs one collapsed-count row.",
)
def q_agg_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    u = ev.select("user_id").distinct().select(
        (F.expr(_H48_USER) % 2).alias("arm")
    )
    c = u.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n_b"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    exp = (na + nb) / 2.0
    chi2 = (na - exp) * (na - exp) / exp + (nb - exp) * (nb - exp) / exp
    return c.select(
        "n_a",
        "n_b",
        F.round(chi2, 4).alias("chi2"),
        (F.abs(na - nb) / F.sqrt(na + nb) > 3.8906).alias("srm_flag"),
    )


# --- L18: character-entropy gate ---------------------------------------------


@register(
    "q_text_char_entropy",
    oracle="""
        WITH chars AS (
            SELECT doc_id, c, CAST(COUNT(*) AS BIGINT) AS n
            FROM (
                SELECT doc_id, unnest(string_split_regex(text, '')) AS c
                FROM documents
            )
            WHERE c <> ''
            GROUP BY doc_id, c
        ),
        tot AS (
            SELECT doc_id, CAST(SUM(n) AS BIGINT) AS total,
                   CAST(COUNT(*) AS BIGINT) AS n_distinct
            FROM chars GROUP BY doc_id
        )
        SELECT c.doc_id, t.total AS n_chars, t.n_distinct,
               ROUND(CAST(SUM(CAST(floor(
                   -(CAST(c.n AS DOUBLE) / t.total)
                   * ln(CAST(c.n AS DOUBLE) / t.total) * 1e12)
                   AS DECIMAL(38,0))) AS DOUBLE) / 1e12, 6) AS entropy_nats
        FROM chars c JOIN tot t ON t.doc_id = c.doc_id
        GROUP BY c.doc_id, t.total, t.n_distinct
    """,
    section="L18",
    doc="Character-level Shannon entropy per document (nats): per-char "
    "counts, −Σ p·ln p with each term quantized floor(x·1e12) before "
    "the exact per-doc DECIMAL sum — the gibberish detector in the "
    "quality-gate family: random strings score near ln(alphabet) "
    "(~maximal), single-char floods near 0, natural text in a narrow "
    "band between — catching base64 blobs, minified code, and "
    "key-mashing that word-level gates (L3 length/stopwords, L17 "
    "repetition) miss entirely. One char-explode + two keyed per-doc "
    "reductions — linear in corpus bytes.",
)
def q_text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    chars = (
        docs.select(
            "doc_id", F.explode(F.split("text", "")).alias("c")
        )
        .where(F.col("c") != "")
        .groupBy("doc_id", "c")
        .agg(F.count("*").alias("n"))
    )
    tot = chars.groupBy("doc_id").agg(
        F.sum("n").alias("total"), F.count("*").alias("n_distinct")
    )
    j = chars.join(tot, "doc_id")
    p = F.col("n").cast("double") / F.col("total")
    term = -p * F.log(p)
    return j.groupBy("doc_id", "total", "n_distinct").agg(
        F.round(
            F.sum(F.floor(term * 1e12).cast("decimal(38,0)")).cast("double")
            / 1e12,
            6,
        ).alias("entropy_nats")
    ).select(
        "doc_id",
        F.col("total").alias("n_chars"),
        "n_distinct",
        "entropy_nats",
    )
