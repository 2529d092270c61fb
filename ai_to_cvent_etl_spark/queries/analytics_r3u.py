"""Twenty-third-wave operators (r3 continuation): MaxSim late interaction,
snapshot column diff, information gain, comparator sort.

  V18 q_vec_maxsim        — ColBERT-style late-interaction scoring: a
                            multi-vector query (8 token vectors) scored
                            against each label's vector set as
                            sum-over-query of max-cosine — the
                            multi-vector retrieval primitive single-
                            vector cosine (V3) can't express.
  E26 q_etl_column_diff   — snapshot column-level drift: per-column
                            changed-row counts and rates between a
                            table and its mutated replica — the
                            schema-aware diff that tells you WHICH
                            columns churned (E1 tells you which rows).
  A39 q_agg_info_gain     — information gain I(status; segment) =
                            H(status) − H(status|segment) from exact
                            contingency counts — the feature-selection
                            ranking metric.
  F18 q_comparator_sort   — array_sort with a CUSTOM comparator lambda
                            (length, then value) — the Spark lambda-
                            comparator surface, mirrored in DuckDB by
                            sort-key construction.

Determinism notes (SURVEY §5.3):
  * V18: per-pair cosines are left-to-right HOF folds over identical
    floats→doubles (V1's rule: fold order is fixed on both engines);
    per-query maxima compare identical bits; the 8 per-query maxima
    are quantized floor(x·1e12) before the exact DECIMAL sum; score
    rounded 4dp.
  * E26 is exact counting; rates are IEEE ratios rounded 6dp. The
    mutated replica is deterministic (keyed mod rules).
  * A39: cell probabilities are IEEE over exact counts; each p·ln p
    term is quantized floor(x·1e12) before the exact sum (≤20 terms);
    entropies and the gain rounded 6dp.
  * F18 is pure string logic; the DuckDB mirror sorts zero-padded
    '<len>|<token>' keys — identical total order (token lengths < 1000).

Scale notes:
  * V18 is the serving shape for late interaction: queries broadcast
    (8 rows), the corpus scans once computing per-(query, vector)
    cosines map-side, and the two reductions (max per query×label,
    sum per label) are partial-agg friendly. At 100 TB compose with
    IVF cells (V7) exactly like single-vector search.
  * E26 is one co-keyed join (bucketed layout at scale, E1's shape) +
    conditional counts; adding columns adds expressions, not passes.
  * A39 collapses to the |r×c| contingency immediately.
  * F18 is map-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register

# --- V18: ColBERT-style MaxSim -----------------------------------------------

_MAXSIM_NQ = 8

_COS_DUCK = """
    list_sum(list_transform(q.embedding,
             (x, i) -> CAST(x AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
    / (sqrt(list_sum(list_transform(q.embedding,
             (x, i) -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       * sqrt(list_sum(list_transform(c.embedding,
             (x, i) -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
"""


@register(
    "q_vec_maxsim",
    oracle=f"""
        WITH q AS (
            SELECT vec_id AS qid, embedding FROM embeddings
            WHERE vec_id < {_MAXSIM_NQ}
        ),
        c AS (
            SELECT vec_id, label, embedding FROM embeddings
            WHERE vec_id >= {_MAXSIM_NQ}
        ),
        sims AS (
            SELECT q.qid, c.label, {_COS_DUCK} AS cos
            FROM q CROSS JOIN c
        ),
        best AS (
            SELECT qid, label, MAX(cos) AS m
            FROM sims GROUP BY qid, label
        )
        SELECT label,
               CAST(COUNT(*) AS BIGINT) AS n_query_vecs,
               ROUND(CAST(SUM(CAST(floor(m * 1e12) AS DECIMAL(38,0)))
                          AS DOUBLE) / 1e12, 4) AS maxsim
        FROM best GROUP BY label
    """,
    section="V18",
    doc="ColBERT-style late-interaction (MaxSim) scoring: a multi-vector "
    f"query ({_MAXSIM_NQ} token vectors, vec_id<{_MAXSIM_NQ}) scored "
    "against each label's vector set as sum-over-query-vectors of the "
    "maximum cosine — the retrieval primitive that preserves per-token "
    "matching where single-vector cosine (V3) collapses the query to "
    "one point. Per-pair cosines are fixed-order HOF folds (identical "
    "bits cross-engine, V1's rule); per-query maxima compare those "
    "bits; the per-label sum quantizes each max before an exact "
    "DECIMAL reduction. Queries broadcast; the corpus scans once "
    "map-side; both reductions are partial-agg friendly — compose with "
    "V7's IVF cells at scale exactly like single-vector search.",
)
def q_vec_maxsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < _MAXSIM_NQ).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    c = emb.where(F.col("vec_id") >= _MAXSIM_NQ).select(
        "label", F.col("embedding").alias("ce")
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("qe"),
            F.col("ce"),
            lambda a, b: a.cast("double") * b.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )

    def norm(col):
        return F.sqrt(
            F.aggregate(
                F.transform(col, lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )

    sims = c.crossJoin(F.broadcast(q)).select(
        "qid",
        "label",
        (dot / (norm(F.col("qe")) * norm(F.col("ce")))).alias("cos"),
    )
    best = sims.groupBy("qid", "label").agg(F.max("cos").alias("m"))
    return best.groupBy("label").agg(
        F.count("*").alias("n_query_vecs"),
        F.round(
            F.sum(F.floor(F.col("m") * 1e12).cast("decimal(38,0)")).cast(
                "double"
            )
            / 1e12,
            4,
        ).alias("maxsim"),
    )


# --- E26: snapshot column-level diff -----------------------------------------


@register(
    "q_etl_column_diff",
    oracle="""
        WITH replica AS (
            SELECT o_orderkey,
                   o_totalprice
                   + CASE WHEN o_orderkey % 11 = 0 THEN 1.0 ELSE 0.0 END
                       AS r_price,
                   CASE WHEN o_orderkey % 13 = 0 THEN 'X'
                        ELSE o_orderstatus END AS r_status,
                   o_orderdate
                   + CASE WHEN o_orderkey % 17 = 0 THEN INTERVAL 1 DAY
                          ELSE INTERVAL 0 DAY END AS r_date
            FROM orders
        ),
        j AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN o.o_totalprice <> r.r_price
                            THEN 1 ELSE 0 END) AS BIGINT) AS d_price,
                   CAST(SUM(CASE WHEN o.o_orderstatus <> r.r_status
                            THEN 1 ELSE 0 END) AS BIGINT) AS d_status,
                   CAST(SUM(CASE WHEN o.o_orderdate <> r.r_date
                            THEN 1 ELSE 0 END) AS BIGINT) AS d_date
            FROM orders o JOIN replica r ON r.o_orderkey = o.o_orderkey
        )
        SELECT col_name, n_changed, n_rows,
               ROUND(CAST(n_changed AS DOUBLE) / n_rows, 6) AS change_rate
        FROM (
            SELECT 'o_totalprice' AS col_name, d_price AS n_changed,
                   n AS n_rows FROM j
            UNION ALL
            SELECT 'o_orderstatus', d_status, n FROM j
            UNION ALL
            SELECT 'o_orderdate', d_date, n FROM j
        )
    """,
    section="E26",
    doc="Snapshot column-level drift report: a deterministically mutated "
    "replica (price bump %11, status flip %13, date shift %17) joined "
    "back on the key, per-column changed-row counts and rates unpivoted "
    "to one row per column — the schema-aware complement to E1's "
    "row-level incremental diff (E1 says WHICH rows changed; this says "
    "WHICH COLUMNS churn, the signal that drives partial re-exports "
    "and CDC column filters). One co-keyed join (bucketed at scale, "
    "E1's layout) + conditional counts in a single reduction; columns "
    "are expressions, not passes.",
)
def q_etl_column_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    replica = orders.select(
        "o_orderkey",
        (
            F.col("o_totalprice")
            + F.when(F.col("o_orderkey") % 11 == 0, 1.0).otherwise(0.0)
        ).alias("r_price"),
        F.when(F.col("o_orderkey") % 13 == 0, "X")
        .otherwise(F.col("o_orderstatus"))
        .alias("r_status"),
        F.when(
            F.col("o_orderkey") % 17 == 0,
            F.col("o_orderdate") + F.expr("INTERVAL 1 DAY"),
        )
        .otherwise(F.col("o_orderdate"))
        .alias("r_date"),
    )
    j = orders.join(replica, "o_orderkey").agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(F.col("o_totalprice") != F.col("r_price"), 1).otherwise(0)
        ).alias("d_price"),
        F.sum(
            F.when(F.col("o_orderstatus") != F.col("r_status"), 1).otherwise(0)
        ).alias("d_status"),
        F.sum(
            F.when(F.col("o_orderdate") != F.col("r_date"), 1).otherwise(0)
        ).alias("d_date"),
    )
    long = j.selectExpr(
        """stack(3,
            'o_totalprice', d_price, n,
            'o_orderstatus', d_status, n,
            'o_orderdate', d_date, n
        ) AS (col_name, n_changed, n_rows)"""
    )
    return long.select(
        "col_name",
        "n_changed",
        "n_rows",
        F.round(
            F.col("n_changed").cast("double") / F.col("n_rows"), 6
        ).alias("change_rate"),
    )


# --- A39: information gain ---------------------------------------------------


@register(
    "q_agg_info_gain",
    oracle="""
        WITH j AS (
            SELECT c.c_mktsegment AS seg, o.o_orderstatus AS st
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        ),
        cells AS (
            SELECT seg, st, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM j GROUP BY seg, st
        ),
        m AS (
            SELECT seg, st, cnt,
                   CAST(SUM(cnt) OVER (PARTITION BY st) AS DOUBLE) AS sc,
                   CAST(SUM(cnt) OVER (PARTITION BY seg) AS DOUBLE) AS gc,
                   CAST(SUM(cnt) OVER () AS DOUBLE) AS n
            FROM cells
        ),
        h AS (
            SELECT
                CAST(SUM(CAST(floor(
                    CASE WHEN st_rn = 1
                         THEN -(sc / n) * ln(sc / n) ELSE 0.0 END * 1e12)
                    AS DECIMAL(38,0))) AS DOUBLE) / 1e12 AS h_status,
                CAST(SUM(CAST(floor(
                    -(cnt / n) * ln(cnt / gc) * 1e12)
                    AS DECIMAL(38,0))) AS DOUBLE) / 1e12 AS h_cond
            FROM (
                SELECT m.*,
                       row_number() OVER (PARTITION BY st
                                          ORDER BY seg) AS st_rn
                FROM m
            )
        )
        SELECT ROUND(h_status, 6) AS h_status,
               ROUND(h_cond, 6) AS h_cond,
               ROUND(h_status - h_cond, 6) AS info_gain
        FROM h
    """,
    section="A39",
    doc="Information gain I(status; segment) = H(status) − H(status | "
    "segment) from the exact contingency table: H(status) sums "
    "−p(st)·ln p(st) (each status counted once via a per-status "
    "row_number mask), the conditional entropy sums −p(seg,st)·ln "
    "p(st|seg) over all cells — every term quantized floor(x·1e12) "
    "before the exact DECIMAL sum (≤20 terms). The feature-selection "
    "ranking metric: unlike correlation (A26) it captures arbitrary "
    "categorical dependence, and unlike chi-square (A23) it is "
    "directly comparable across features in bits/nats. Collapses to "
    "the |r×c| contingency immediately; windows run over ≤15 cells.",
)
def q_agg_info_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    j = orders.join(customer, orders.o_custkey == customer.c_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        F.col("o_orderstatus").alias("st"),
    )
    cells = j.groupBy("seg", "st").agg(F.count("*").alias("cnt"))
    m = cells.select(
        "seg",
        "st",
        "cnt",
        F.sum("cnt").over(Window.partitionBy("st")).cast("double").alias("sc"),
        F.sum("cnt").over(Window.partitionBy("seg")).cast("double").alias("gc"),
        F.sum("cnt").over(Window.partitionBy()).cast("double").alias("n"),
        F.row_number()
        .over(Window.partitionBy("st").orderBy("seg"))
        .alias("st_rn"),
    )

    def qsum(c):
        return (
            F.sum(F.floor(c * 1e12).cast("decimal(38,0)")).cast("double")
            / 1e12
        )

    h_status_term = F.when(
        F.col("st_rn") == 1,
        -(F.col("sc") / F.col("n")) * F.log(F.col("sc") / F.col("n")),
    ).otherwise(0.0)
    h_cond_term = -(F.col("cnt") / F.col("n")) * F.log(
        F.col("cnt") / F.col("gc")
    )
    h = m.agg(
        qsum(h_status_term).alias("h_status"),
        qsum(h_cond_term).alias("h_cond"),
    )
    return h.select(
        F.round("h_status", 6).alias("h_status"),
        F.round("h_cond", 6).alias("h_cond"),
        F.round(F.col("h_status") - F.col("h_cond"), 6).alias("info_gain"),
    )


# --- F18: custom-comparator array sort ---------------------------------------


@register(
    "q_comparator_sort",
    oracle="""
        WITH t AS (
            SELECT doc_id,
                   list_sort(list_transform(
                       string_split(text, ' '),
                       x -> lpad(CAST(length(x) AS VARCHAR), 3, '0')
                            || '|' || x)) AS keyed
            FROM documents
        )
        SELECT doc_id,
               array_to_string(list_transform(
                   list_slice(keyed, 1, 5), k -> substr(k, 5)), ',')
                   AS first5,
               substr(keyed[len(keyed)], 5) AS longest_last
        FROM t
    """,
    section="F18",
    doc="array_sort with a CUSTOM COMPARATOR lambda — tokens ordered by "
    "(length, then value), the Spark lambda-comparator surface no "
    "other declared query touches. DuckDB has no comparator sort, so "
    "the oracle constructs an equivalent total order by sort-key "
    "('<zero-padded length>|<token>') — identical ordering for token "
    "lengths < 1000. Output: first five tokens and the last (longest) "
    "token, strings only. Map-only; comparator sorts run inside "
    "codegen like every other HOF (F14).",
)
def q_comparator_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sp = F.split("text", " ")
    cmp_sorted = F.array_sort(
        sp,
        lambda l, r: F.when(F.length(l) < F.length(r), -1)
        .when(F.length(l) > F.length(r), 1)
        .when(l < r, -1)
        .when(l > r, 1)
        .otherwise(0),
    )
    return docs.select(
        "doc_id",
        F.array_join(F.slice(cmp_sorted, 1, 5), ",").alias("first5"),
        F.element_at(cmp_sorted, -1).alias("longest_last"),
    )
