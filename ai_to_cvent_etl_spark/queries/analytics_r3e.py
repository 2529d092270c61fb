"""Seventh-wave operators (r3 continuation): seasonality profiles,
change detection, chunk-level dedup, mergeable sketches, and ANN
quality measurement.

  TS9  q_ts_dow_seasonality — day-of-week seasonal profile per event
                              type (share of weekly volume by weekday).
  TS10 q_ts_cusum           — all-integer CUSUM change detection per
                              user (max cumulative deviation from the
                              user's own mean).
  L12  q_text_chunk_dedup   — C4-style chunk-level cross-document dedup:
                              per-doc duplicated-chunk ratio over
                              10-token chunks.
  SK3  q_sketch_hll_union   — HyperLogLog partial-sketch build + union
                              (the mergeable-aggregate pattern that makes
                              two-level distinct counting work at 100 TB).
  V12  q_vec_ann_recall     — recall@3 of the D4 IVF index against the
                              V3 brute-force ground truth (the ANN
                              quality gate every index needs).

Determinism notes (SURVEY §5.3):
  * TS9: Spark ``weekday(ts)+1`` == DuckDB ``isodow`` (probed; Mon=1 …
    Sun=7); sums are exact DECIMAL; share/avg are fixed IEEE expressions
    over deterministic decimal->double conversions.
  * TS10 never forms a fractional mean: the deviation is scaled by the
    user's event count (dev = qv*n - s, all BIGINT) so the running CUSUM
    is an exact integer under any partitioning (bounds: qv <= 5e6,
    n <= 1e4 even at 100x => |dev| <= 5e10, cumsum < 1e15 << 2^63).
  * L12 chunking is index-arithmetic only: Spark ``slice(toks, i*10+1,
    10)`` == DuckDB ``list_slice(toks, i*10+1, i*10+10)`` (both clamp at
    the end, probed); chunk identity is md5 of the joined tokens.
  * SK3 is rows-only BY DESIGN (A4/A20's reason: sketch estimates are
    engine-specific); a golden test pins within-Spark determinism.
  * V12 composes two queries that each pass the exact gate independently;
    the recall division is one IEEE op over integer match counts.

Scale notes:
  * TS9 collapses to a |types| x 7 table in one map-side-combinable agg.
  * TS10 is two window passes per user partition (total sums, then the
    ordered running sum) — no unbounded state, anomalies stream out.
  * L12's chunk table is ~n_tokens/10 rows; the only shuffles are the
    keyed chunk-frequency count (on a 16-byte hash) and the per-doc
    re-aggregation. Identical shape to the C4 line-dedup pass.
  * SK3 is the POINT of sketch mergeability: per-group sketches are
    bounded (lgK=12 => ~4 KB each), the union folds |groups| sketches,
    and the corpus is touched exactly once — the two-phase distinct
    count that replaces a second full shuffle at 100 TB.
  * V12 joins two 10-query/bounded-rank outputs — trivially small; the
    underlying index/ground-truth scans inherit their own queries' scale
    properties (queries broadcast, corpus never shuffles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register

# --- TS9: day-of-week seasonality profile -----------------------------------


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


# --- TS10: all-integer CUSUM change detection -------------------------------


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


# --- L12: chunk-level cross-document dedup ----------------------------------

_CHUNK_TOKENS = 10


@register(
    "q_text_chunk_dedup",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, string_split(lower(text), ' ') AS tk
            FROM documents
        ),
        chunks AS (
            SELECT doc_id,
                   unnest(list_transform(
                       range(0, CAST(ceil(len(tk) / {_CHUNK_TOKENS}.0)
                                     AS BIGINT)),
                       i -> md5(array_to_string(
                                list_slice(tk, i * {_CHUNK_TOKENS} + 1,
                                           i * {_CHUNK_TOKENS}
                                           + {_CHUNK_TOKENS}), ' '))
                   )) AS chash
            FROM toks
        ),
        freq AS (
            SELECT chash, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
            FROM chunks GROUP BY chash
        )
        SELECT c.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_chunks,
               CAST(SUM(CASE WHEN f.n_docs > 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_dup_chunks,
               CAST(SUM(CASE WHEN f.n_docs > 1 THEN 1 ELSE 0 END) AS DOUBLE)
                   / COUNT(*) AS dup_ratio
        FROM chunks c JOIN freq f ON c.chash = f.chash
        GROUP BY c.doc_id
    """,
    section="L12",
    doc=f"Chunk-level cross-document dedup (the C4 line-dedup shape): "
    f"each doc is cut into consecutive {_CHUNK_TOKENS}-token chunks "
    "(row-local index arithmetic — Spark slice(start,len) == DuckDB "
    "list_slice(begin,end), both end-clamped, probed), chunks are "
    "identified by md5, and each doc reports how much of it appears in "
    "OTHER documents (boilerplate/quotation mass). Shuffles only on the "
    "16-byte chunk hash (frequency) and doc_id (re-aggregation) — the "
    "text itself never shuffles. Counts + one division — exact.",
)
def q_text_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    chunks = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, cast(ceil(size(split(lower(text),"
                f" ' ')) / {_CHUNK_TOKENS}.0) as int) - 1),"
                f" i -> md5(array_join(slice(split(lower(text), ' '),"
                f" i * {_CHUNK_TOKENS} + 1, {_CHUNK_TOKENS}), ' ')))"
            )
        ).alias("chash"),
    )
    freq = chunks.groupBy("chash").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    j = chunks.join(freq, "chash")
    dup = F.when(F.col("n_docs") > 1, 1).otherwise(0)
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(dup).alias("n_dup_chunks"),
        (F.sum(dup).cast("double") / F.count(F.lit(1))).alias("dup_ratio"),
    )


# --- SK3: HyperLogLog partial-sketch build + union --------------------------


@register(
    "q_sketch_hll_union",
    oracle=None,  # rows-only BY DESIGN: HLL estimates are engine-specific
    # (A4/A20's reason); tests/golden pins within-Spark determinism.
    section="SK3",
    doc="HyperLogLog partial-sketch workflow: per-event-type user "
    "sketches (hll_sketch_agg, lgK=12 => ~4 KB bounded state each), "
    "per-type estimates, PLUS the union-merged overall estimate "
    "(hll_union_agg) — the mergeable-aggregate pattern that computes "
    "group-level AND total distincts in ONE corpus pass at 100 TB "
    "(re-aggregating sketches instead of re-shuffling raw keys). "
    "Exact twin A3 is the semantics oracle; estimates are rows-only "
    "by design with a golden test (A4/A20 precedent).",
)
def q_sketch_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sk = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sketch"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    per_type = sk.select(
        "event_type",
        F.hll_sketch_estimate("sketch").alias("approx_users"),
        "exact_users",
    )
    overall = sk.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_users"),
        F.sum(F.lit(0)).cast("bigint").alias("_z"),
    ).select(
        F.lit("__all__").alias("event_type"),
        "approx_users",
        F.lit(None).cast("bigint").alias("exact_users"),
    )
    return per_type.unionByName(overall)


# --- V12: ANN recall against brute-force ground truth -----------------------


def _recall_oracle() -> str:
    from ai_to_cvent_etl_spark.queries.dedup_scale import _dot_duck, _nsq_duck

    return f"""
        WITH exact3 AS MATERIALIZED (
            SELECT query_id, neighbor_id FROM (
                SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                       ROW_NUMBER() OVER (
                            PARTITION BY q.vec_id
                            ORDER BY list_cosine_similarity(
                                         q.embedding, n.embedding) DESC,
                                     n.vec_id
                       ) AS rank
                FROM (SELECT * FROM embeddings WHERE vec_id < 10) q
                JOIN embeddings n ON n.vec_id <> q.vec_id
            ) WHERE rank <= 3
        ),
        cells AS MATERIALIZED (
            SELECT vec_id, embedding,
                   4 * (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END)
                 + 2 * (CASE WHEN embedding[2] >= 0 THEN 1 ELSE 0 END)
                 +     (CASE WHEN embedding[3] >= 0 THEN 1 ELSE 0 END) AS cell
            FROM embeddings
        ),
        approx3 AS MATERIALIZED (
            SELECT query_id, neighbor_id FROM (
                SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                       ROW_NUMBER() OVER (
                            PARTITION BY a.vec_id
                            ORDER BY {_dot_duck('a', 'b')}
                                     / ({_nsq_duck('a')} * {_nsq_duck('b')})
                                     DESC,
                                     b.vec_id
                       ) AS rank
                FROM (SELECT * FROM cells WHERE vec_id < 10) a
                JOIN cells b ON a.cell = b.cell AND b.vec_id <> a.vec_id
            ) WHERE rank <= 3
        )
        SELECT e.query_id,
               CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_match,
               CAST(COUNT(a.neighbor_id) AS DOUBLE) / 3.0 AS recall_at_3
        FROM exact3 e
        LEFT JOIN approx3 a
          ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
        GROUP BY e.query_id
    """


@register(
    "q_vec_ann_recall",
    oracle=_recall_oracle(),
    section="V12",
    doc="ANN quality gate: recall@3 of the D4 sign-bit IVF index against "
    "the V3 brute-force cosine ground truth, per query — the measurement "
    "every approximate index needs before it replaces the exact path "
    "(bench-vs-baseline for indexes). Composes the two already-gated "
    "queries and joins their bounded (10 x 3) outputs; recall is one "
    "IEEE division over integer match counts. The underlying scans "
    "inherit their own queries' scale shapes (queries broadcast, corpus "
    "never shuffles).",
)
def q_vec_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries.dedup_scale import q_ann_ivf_topk
    from ai_to_cvent_etl_spark.queries.vectors import q_vec_cosine_topk

    exact3 = (
        q_vec_cosine_topk(spark, sf_dir)
        .where(F.col("rank") <= 3)
        .select("query_id", "neighbor_id")
    )
    approx3 = q_ann_ivf_topk(spark, sf_dir).select(
        F.col("query_id").alias("aq"), F.col("neighbor_id").alias("an")
    )
    j = exact3.join(
        approx3,
        (F.col("query_id") == F.col("aq"))
        & (F.col("neighbor_id") == F.col("an")),
        "left",
    )
    return j.groupBy("query_id").agg(
        F.count("an").alias("n_match"),
        (F.count("an").cast("double") / F.lit(3.0)).alias("recall_at_3"),
    )
