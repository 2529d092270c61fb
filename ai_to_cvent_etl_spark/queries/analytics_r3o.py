"""Seventeenth-wave operators (r3 continuation): Kaplan-Meier survival,
quarantine routing, binary-Hamming ANN, union-by-name.

  A33 q_agg_survival_km     — Kaplan-Meier survival curve over customer
                              inter-order gaps: at-risk counts, event
                              counts, and the product-limit estimator
                              via an exactly-summed log transform.
  E22 q_etl_quarantine      — rule-based dead-letter routing: named
                              validation rules evaluated per row, rows
                              grouped by their failed-rule signature
                              (the quality-gate disposition report).
  V17 q_vec_hamming_topk    — binary-quantized ANN: sign bits packed
                              into two 32-bit words per vector (codegen
                              lambda fold), top-10 neighbors per query
                              by popcount Hamming distance.
  U7  q_union_by_name       — unionByName with allowMissingColumns:
                              schema-aligned union of heterogeneous
                              projections (missing columns NULL-filled),
                              vs DuckDB UNION ALL BY NAME.

Determinism notes (SURVEY §5.3):
  * A33: d/n are exact integers; each log term ln(1-d/n) is one IEEE
    expression over identical ratios, quantized floor(x·1e12) before
    the exact DECIMAL running sum (rule 10 holds: |sum| ≲ 1e2·1e12);
    the n==d terminal point is emitted as km=0 via a cummax flag, never
    ln(0). Survival rounded 6dp.
  * E22 is pure boolean/string logic; the failed-rule signature uses a
    fixed rule order (no sorting needed).
  * V17 is float-free after the sign test: exact bit packing (integer
    shifts), XOR + popcount distances, rank tie-broken by neighbor id.
    Spark's lambda index is 0-based, DuckDB's 1-based (i-1 shift).
  * U7's NULL-filled columns are typed identically on both engines
    (DOUBLE / VARCHAR); column order differs by engine but the driver
    compares by sorted name.

Scale notes:
  * A33 collapses orders → per-customer gaps (one lead window keyed by
    customer) → |distinct gaps| rows; the KM windows run on that
    bounded relation.
  * E22 is map-only rule evaluation + one low-cardinality signature
    reduction — adding rules adds expressions, not passes; route the
    quarantine arm to a dead-letter sink with partitionBy(signature).
  * V17 is the binary-embedding serving shape: 64× compression, the
    corpus word table is one BIGINT per vector, queries broadcast, and
    Hamming is XOR+popcount inside codegen — no float math per pair.
    At d>64 pack into an array of words and sum popcounts; at 100 TB
    combine with the IVF cells (V7) so only probed cells pay the scan.
  * U7 is the schema-drift union: a metadata-only alignment, no
    shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register

# --- A33: Kaplan-Meier survival over inter-order gaps ------------------------


@register(
    "q_agg_survival_km",
    oracle="""
        WITH gaps AS (
            SELECT date_diff('day', o_orderdate,
                             lead(o_orderdate) OVER (
                                 PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey
                             )) AS gap
            FROM orders
        ),
        ev AS (
            SELECT gap AS t, CAST(COUNT(*) AS BIGINT) AS d
            FROM gaps WHERE gap IS NOT NULL GROUP BY gap
        ),
        km AS (
            SELECT t, d,
                   CAST(SUM(d) OVER () AS BIGINT)
                   - CAST(SUM(d) OVER w AS BIGINT) + d AS n_risk
            FROM ev
            WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)
        ),
        lg AS (
            SELECT t, d, n_risk,
                   CASE WHEN d < n_risk
                        THEN ln(1.0 - CAST(d AS DOUBLE) / n_risk)
                        END AS term,
                   MAX(CASE WHEN d >= n_risk THEN 1 ELSE 0 END) OVER w
                       AS dead
            FROM km
            WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)
        )
        SELECT t, d, n_risk,
               ROUND(CASE WHEN dead = 1 THEN 0.0
                     ELSE exp(CAST(SUM(CAST(floor(term * 1e12)
                                            AS DECIMAL(38,0))) OVER w
                                   AS DOUBLE) / 1e12) END, 6) AS survival
        FROM lg
        WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    """,
    section="A33",
    doc="Kaplan-Meier product-limit survival curve over customer "
    "inter-order gaps (days to next order; no censoring — every "
    "non-final order has an observed gap): per distinct gap t, the "
    "event count d, the at-risk count n (total minus prior events), "
    "and S(t) = prod(1 - d/n) computed as exp of the RUNNING "
    "EXACT-DECIMAL sum of quantized log terms — a cumulative product "
    "of doubles would compound engine drift, the quantized log-sum "
    "keeps every partial bit-identical (G1's device). The terminal "
    "n==d point is emitted as survival=0 via a cummax flag, never "
    "ln(0). The churn/retention primitive: collapses 100 TB of orders "
    "to |customers| gap rows (one lead window) then |distinct gaps| "
    "curve rows.",
)
def q_agg_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    wn = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = orders.select(
        F.datediff(
            F.lead("o_orderdate").over(wn), F.col("o_orderdate")
        ).alias("gap")
    ).where(F.col("gap").isNotNull())
    ev = gaps.groupBy(F.col("gap").alias("t")).agg(F.count("*").alias("d"))
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    km = ev.select(
        "t",
        "d",
        (F.sum("d").over(wall) - F.sum("d").over(w) + F.col("d")).alias(
            "n_risk"
        ),
    )
    term = F.when(
        F.col("d") < F.col("n_risk"),
        F.log(F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk")),
    )
    lg = km.select(
        "t",
        "d",
        "n_risk",
        term.alias("term"),
        F.max(
            F.when(F.col("d") >= F.col("n_risk"), 1).otherwise(0)
        ).over(w).alias("dead"),
    )
    runsum = (
        F.sum(F.floor(F.col("term") * 1e12).cast("decimal(38,0)"))
        .over(w)
        .cast("double")
        / 1e12
    )
    return lg.select(
        F.col("t").cast("long").alias("t"),
        "d",
        "n_risk",
        F.round(
            F.when(F.col("dead") == 1, 0.0).otherwise(F.exp(runsum)), 6
        ).alias("survival"),
    )


# --- E22: rule-based quarantine routing --------------------------------------


@register(
    "q_etl_quarantine",
    oracle="""
        WITH checked AS (
            SELECT o_orderkey,
                   concat_ws('|',
                       CASE WHEN o_totalprice > 500000
                            THEN 'price_out_of_range' END,
                       CASE WHEN o_orderstatus = 'P'
                                 AND o_orderdate < TIMESTAMP '1996-01-01'
                            THEN 'stale_pending' END,
                       CASE WHEN o_orderkey % 101 = 0
                            THEN 'key_checksum' END) AS failed_rules
            FROM orders
        )
        SELECT failed_rules,
               failed_rules = '' AS is_clean,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               MIN(o_orderkey) AS first_key,
               MAX(o_orderkey) AS last_key
        FROM checked
        GROUP BY failed_rules
    """,
    section="E22",
    doc="Rule-based dead-letter routing (the quality gate's disposition "
    "report): three named validation rules — price out of range, "
    "stale pending status, synthetic key-checksum failure — evaluated "
    "per row in one map pass; rows grouped by their failed-rule "
    "SIGNATURE ('' = clean, 'a|b' = failed both) with counts and "
    "boundary keys. concat_ws skips NULLs identically on both engines, "
    "and the rule order is fixed, so the signature needs no sorting. "
    "Map-only evaluation + one low-cardinality reduction: adding rules "
    "adds expressions, not passes. In production the quarantine arm "
    "writes to a dead-letter sink partitioned by signature; E5's "
    "metrics and this router are the two halves of the gate.",
)
def q_etl_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    failed = F.concat_ws(
        "|",
        F.when(F.col("o_totalprice") > 500000, "price_out_of_range"),
        F.when(
            (F.col("o_orderstatus") == "P")
            & (F.col("o_orderdate") < "1996-01-01"),
            "stale_pending",
        ),
        F.when(F.col("o_orderkey") % 101 == 0, "key_checksum"),
    )
    return (
        orders.select("o_orderkey", failed.alias("failed_rules"))
        .groupBy("failed_rules")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("o_orderkey").alias("first_key"),
            F.max("o_orderkey").alias("last_key"),
        )
        .select(
            "failed_rules",
            (F.col("failed_rules") == "").alias("is_clean"),
            "n_rows",
            "first_key",
            "last_key",
        )
    )


# --- V17: binary-quantized Hamming ANN ---------------------------------------

_HAM_TOPK = 10
_HAM_NQ = 10

def _pack_spark(lo: int) -> str:
    """Pack 32 sign bits (dims lo..lo+31, 1-based) into one BIGINT; 32-bit
    halves keep every shift < 63 (a 1<<63 overflows DuckDB's checked
    BIGINT shift and wraps negative in Spark — word arrays generalize)."""
    return (
        f"aggregate(transform(slice(embedding, {lo}, 32), (x, i) -> "
        "IF(x > CAST(0.0 AS FLOAT), shiftleft(CAST(1 AS BIGINT), i), "
        "CAST(0 AS BIGINT))), CAST(0 AS BIGINT), (a, b) -> a + b)"
    )


def _pack_duck(lo: int) -> str:
    return (
        f"CAST(list_sum(list_transform(list_slice(embedding, {lo}, "
        f"{lo + 31}), (x, i) -> CASE WHEN x > 0 THEN "
        "(CAST(1 AS BIGINT) << (i - 1)) ELSE CAST(0 AS BIGINT) END)) "
        "AS BIGINT)"
    )


@register(
    "q_vec_hamming_topk",
    oracle=f"""
        WITH words AS (
            SELECT vec_id, {_pack_duck(1)} AS wlo, {_pack_duck(33)} AS whi
            FROM embeddings
        ),
        q AS (SELECT vec_id AS qid, wlo AS qlo, whi AS qhi FROM words
              WHERE vec_id < {_HAM_NQ}),
        d AS (
            SELECT q.qid, c.vec_id AS nid,
                   CAST(bit_count(xor(q.qlo, c.wlo))
                        + bit_count(xor(q.qhi, c.whi)) AS INT) AS hamming
            FROM q JOIN words c ON c.vec_id <> q.qid
        ),
        r AS (
            SELECT qid, nid, hamming,
                   row_number() OVER (
                       PARTITION BY qid ORDER BY hamming, nid
                   ) AS rnk
            FROM d
        )
        SELECT qid, nid, hamming, CAST(rnk AS INT) AS rnk
        FROM r WHERE rnk <= {_HAM_TOPK}
    """,
    section="V17",
    doc="Binary-quantized ANN (the modern binary-embedding serving "
    "path): each 64-dim vector packs its SIGN BITS into two 32-bit "
    "words via a codegen'd indexed-lambda fold (64x compression, no "
    "UDF; 32-bit halves keep shifts clear of DuckDB's checked 1<<63), then top-10 neighbors per query (vec_id<10) by Hamming "
    "distance = popcount(XOR) — integer ops only after the sign test, "
    "so ranking is exactly deterministic (neighbor-id tie-break). The "
    "query side broadcasts; the corpus word table is one BIGINT per "
    "vector and never shuffles. At d>64, pack into a word ARRAY and "
    "sum popcounts; at 100 TB combine with V7's IVF cells so only "
    "probed cells pay the XOR scan. Distinct from D2 SimHash (text "
    "fingerprinting) — this is embedding-space quantized retrieval.",
)
def q_vec_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    words = emb.select(
        "vec_id",
        F.expr(_pack_spark(1)).alias("wlo"),
        F.expr(_pack_spark(33)).alias("whi"),
    )
    q = words.where(F.col("vec_id") < _HAM_NQ).select(
        F.col("vec_id").alias("qid"),
        F.col("wlo").alias("qlo"),
        F.col("whi").alias("qhi"),
    )
    d = (
        words.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("nid"),
            (
                F.bit_count(F.col("qlo").bitwiseXOR(F.col("wlo")))
                + F.bit_count(F.col("qhi").bitwiseXOR(F.col("whi")))
            ).alias("hamming"),
        )
    )
    rnk = F.row_number().over(
        Window.partitionBy("qid").orderBy("hamming", "nid")
    )
    return (
        d.withColumn("rnk", rnk)
        .where(F.col("rnk") <= _HAM_TOPK)
        .select("qid", "nid", "hamming", F.col("rnk").cast("int").alias("rnk"))
    )


# --- U7: unionByName with missing columns ------------------------------------


@register(
    "q_union_by_name",
    oracle="""
        (SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_orderkey % 3 = 0)
        UNION ALL BY NAME
        (SELECT o_orderstatus, o_orderkey FROM orders
         WHERE o_orderkey % 3 = 1)
    """,
    section="U7",
    doc="Schema-drift union: two heterogeneous projections of orders "
    "(different column sets AND different column order) aligned by "
    "NAME with missing columns NULL-filled — Spark "
    "unionByName(allowMissingColumns=True) vs DuckDB UNION ALL BY "
    "NAME. The ETL shape for unioning feed versions across a schema "
    "change without positional bugs (a positional UNION would pair "
    "o_orderstatus with o_orderkey silently). Metadata-only alignment "
    "— map-side, no shuffle.",
)
def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = orders.where(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey", "o_totalprice"
    )
    b = orders.where(F.col("o_orderkey") % 3 == 1).select(
        "o_orderstatus", "o_orderkey"
    )
    return a.unionByName(b, allowMissingColumns=True)
