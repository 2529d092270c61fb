"""Twenty-second-wave operators (r3 continuation): max drawdown, n-gram
novelty, bitmap distinct counting, Cramér's V.

  TS14 q_ts_max_drawdown     — maximum drawdown of the cumulative daily
                               revenue curve (running peak minus
                               current) — the canonical path-dependent
                               risk metric, computed on exact integers.
  T15 q_text_novelty         — per-document novelty: the fraction of a
                               doc's distinct 3-grams appearing in NO
                               earlier document (first-occurrence by
                               doc_id) — the marginal-contribution
                               curation score.
  SK6 q_sketch_bitmap_distinct — exact distinct counting via Spark's
                               bitmap aggregate family (bucket number /
                               bit position / construct / count) — the
                               dense-id sketch whose result is EXACT,
                               verified against COUNT(DISTINCT).
  A38 q_agg_cramers_v        — Cramér's V effect size for the segment ×
                               status contingency table — the
                               magnitude companion to A23's chi-square
                               independence test.

Determinism notes (SURVEY §5.3):
  * TS14 is pure integer window algebra (cents, running sum, running
    max, argmax with day tie-break).
  * T15 is integer counting; the novelty ratio is one IEEE division,
    rounded 6dp.
  * SK6's bitmaps are exact structures — the count equals
    COUNT(DISTINCT) bit-for-bit; only BIGINTs cross the output.
  * A38: observed/expected cells are IEEE over exact counts; chi2 and
    V are single formulas, rounded 4/6dp; dof from exact distinct
    counts.

Scale notes:
  * TS14 runs on the |days| spine (TS7's rule).
  * T15's n-gram explode is the heavy step (fan_out applies); the
    first-occurrence reduce keys on the n-gram — partial min map-side;
    the per-doc ratio joins the doc's own distinct-gram count (both
    keyed on doc).
  * SK6 is the dense-id distinct pattern: per (key, bucket) bitmaps
    OR-combine map-side and across sketches — mergeable like SK3/SK4
    but EXACT; memory is |id-range|/8 bits per key split across
    buckets. For sparse 64-bit ids, hash to a dense domain first (then
    it degrades to HLL-style approximation) or use SK4.
  * A38 is one dim join + one contingency reduction; the moment
    windows run over ≤15 collapsed cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register

# --- TS14: maximum drawdown --------------------------------------------------


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


# --- T15: n-gram novelty -----------------------------------------------------


@register(
    "q_text_novelty",
    oracle="""
        WITH grams AS (
            SELECT DISTINCT doc_id, g
            FROM (
                SELECT doc_id,
                       unnest(list_transform(
                           list_slice(string_split(text, ' '), 1,
                                      len(string_split(text, ' ')) - 2),
                           (x, i) -> x || ' '
                                     || string_split(text, ' ')[i + 1]
                                     || ' '
                                     || string_split(text, ' ')[i + 2]))
                           AS g
                FROM documents
            )
        ),
        first_seen AS (
            SELECT g, MIN(doc_id) AS first_doc FROM grams GROUP BY g
        )
        SELECT gr.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_grams,
               CAST(SUM(CASE WHEN fs.first_doc = gr.doc_id
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
               ROUND(CAST(SUM(CASE WHEN fs.first_doc = gr.doc_id
                             THEN 1 ELSE 0 END) AS DOUBLE)
                     / COUNT(*), 6) AS novelty
        FROM grams gr JOIN first_seen fs ON fs.g = gr.g
        GROUP BY gr.doc_id
    """,
    section="T15",
    doc="Per-document n-gram novelty: the fraction of a doc's DISTINCT "
    "word 3-grams that appear in no earlier document (first occurrence "
    "by doc_id order) — the marginal-contribution score a curation "
    "pipeline uses to rank near-redundant documents beyond pairwise "
    "dedup (a doc can evade every pairwise threshold yet contribute "
    "nothing new). Integer counting + one IEEE ratio. The n-gram "
    "explode is the heavy step (fan_out rule); first-occurrence is a "
    "keyed min with map-side partials; the per-doc ratio joins on the "
    "gram key. In streaming ingest the first_seen table is the "
    "accumulating state (ST5's dedup shape over grams).",
)
def q_text_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    tri = F.transform(
        F.slice(toks, 1, F.size(toks) - 2),
        lambda x, i: F.concat_ws(
            " ",
            x,
            F.element_at(toks, i + 2),
            F.element_at(toks, i + 3),
        ),
    )
    grams = (
        docs.select("doc_id", F.explode(tri).alias("g")).distinct()
    )
    first_seen = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    j = grams.join(first_seen, "g")
    novel = F.sum(
        F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    )
    return j.groupBy("doc_id").agg(
        F.count("*").alias("n_grams"),
        novel.alias("n_novel"),
        F.round(novel.cast("double") / F.count("*"), 6).alias("novelty"),
    )


# --- SK6: exact bitmap distinct counting -------------------------------------


@register(
    "q_sketch_bitmap_distinct",
    oracle="""
        SELECT event_type,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events
        GROUP BY event_type
    """,
    section="SK6",
    doc="Exact distinct counting via Spark's bitmap aggregate family: "
    "user ids split into (bucket, bit position), per-bucket bitmaps "
    "built with bitmap_construct_agg, popcounts summed — equals "
    "COUNT(DISTINCT) bit-for-bit, which IS the oracle. The dense-id "
    "sketch: bitmaps OR-combine map-side and across time windows "
    "(mergeable like SK3/SK4 HLL/KMV but EXACT), memory |id-range|/8 "
    "bits per key split across fixed-size buckets — the right tool "
    "when ids are dense integers (user ids, row ids); for sparse "
    "64-bit keys fall back to SK4's KMV or A4's HLL. Two keyed "
    "reductions, both partial-agg friendly.",
)
def q_sketch_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_bucket = (
        ev.select(
            "event_type",
            F.expr("bitmap_bucket_number(user_id)").alias("bkt"),
            F.expr("bitmap_bit_position(user_id)").alias("pos"),
        )
        .groupBy("event_type", "bkt")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
    )
    return per_bucket.groupBy("event_type").agg(
        F.expr("CAST(sum(bitmap_count(bm)) AS BIGINT)").alias("n_users")
    )


# --- A38: Cramér's V effect size ---------------------------------------------


@register(
    "q_agg_cramers_v",
    oracle="""
        WITH j AS (
            SELECT c.c_mktsegment AS seg, o.o_orderstatus AS st
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        ),
        cells AS (
            SELECT seg, st, CAST(COUNT(*) AS BIGINT) AS o
            FROM j GROUP BY seg, st
        ),
        m AS (
            SELECT seg, st, o,
                   CAST(SUM(o) OVER (PARTITION BY seg) AS DOUBLE) AS rs,
                   CAST(SUM(o) OVER (PARTITION BY st) AS DOUBLE) AS cs,
                   CAST(SUM(o) OVER () AS DOUBLE) AS n
            FROM cells
        ),
        chi AS (
            SELECT CAST(MAX(n) AS BIGINT) AS n,
                   CAST(SUM(CAST(floor(
                       (o - rs * cs / n) * (o - rs * cs / n)
                       / (rs * cs / n) * 1e9) AS DECIMAL(38,0)))
                       AS DOUBLE) / 1e9 AS chi2,
                   CAST(COUNT(DISTINCT seg) AS BIGINT) AS r,
                   CAST(COUNT(DISTINCT st) AS BIGINT) AS c
            FROM m
        )
        SELECT n, ROUND(chi2, 4) AS chi2,
               CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
               ROUND(sqrt(chi2 / (n * least(r - 1, c - 1))), 6)
                   AS cramers_v
        FROM chi
    """,
    section="A38",
    doc="Cramér's V effect size for the market-segment × order-status "
    "contingency table: chi-square from exact cell/margin counts (each "
    "cell's term quantized floor(x·1e9) before the exact DECIMAL sum — "
    "15 cells, rule-10 margin enormous), V = sqrt(chi2/(n·min(r−1,"
    "c−1))). The magnitude companion to A23's chi-square test: "
    "significance scales with n, V doesn't — at 100 TB everything is "
    "'significant' and only effect sizes rank real associations. One "
    "dim join + one contingency reduction; margins are windows over "
    "≤15 collapsed cells.",
)
def q_agg_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    j = orders.join(customer, orders.o_custkey == customer.c_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        F.col("o_orderstatus").alias("st"),
    )
    cells = j.groupBy("seg", "st").agg(F.count("*").alias("o"))
    m = cells.select(
        "seg",
        "st",
        "o",
        F.sum("o").over(Window.partitionBy("seg")).cast("double").alias("rs"),
        F.sum("o").over(Window.partitionBy("st")).cast("double").alias("cs"),
        F.sum("o").over(Window.partitionBy()).cast("double").alias("n"),
    )
    e = F.col("rs") * F.col("cs") / F.col("n")
    term = (F.col("o") - e) * (F.col("o") - e) / e
    chi = m.agg(
        F.max("n").cast("long").alias("n"),
        (
            F.sum(F.floor(term * 1e9).cast("decimal(38,0)")).cast("double")
            / 1e9
        ).alias("chi2"),
        F.countDistinct("seg").alias("r"),
        F.countDistinct("st").alias("c"),
    )
    return chi.select(
        "n",
        F.round("chi2", 4).alias("chi2"),
        ((F.col("r") - 1) * (F.col("c") - 1)).alias("dof"),
        F.round(
            F.sqrt(
                F.col("chi2")
                / (F.col("n") * F.least(F.col("r") - 1, F.col("c") - 1))
            ),
            6,
        ).alias("cramers_v"),
    )
