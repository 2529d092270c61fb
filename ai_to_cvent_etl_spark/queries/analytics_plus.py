"""Second-wave analytics operators (A12, W8, L5-L6, V5): exact percentiles,
distribution windows, edit-distance near-dup, TF-IDF, and vector
quantization.

Scale notes:
  * A12 exact percentiles need a full sort per group — at 100 TB prefer
    `approx_percentile` (t-digest, one pass); the exact form is the oracle
    twin, same plan shape as any sort-agg.
  * L6 TF-IDF is two shuffles (doc-term counts, term df) + one broadcast of
    the tiny df table back onto terms; the corpus scan happens once.
  * V5 scalar quantization is the storage-side half of IVF-PQ: row-local,
    turns 256-byte float vectors into 64-byte codes before any shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register


@register(
    "q_agg_percentile",
    oracle="""
        SELECT o_orderstatus,
               ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
               ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90_price
        FROM orders
        GROUP BY o_orderstatus
    """,
    section="A12",
    doc="Exact linear-interpolated percentiles per group (median, p90), "
    "rounded 4dp (interpolation formula order differs ~1e-15 across "
    "engines). At scale: approx_percentile t-digest, one pass, no sort.",
)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("median_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90_price"),
    )


@register(
    "q_win_percent_rank",
    oracle="""
        SELECT p_partkey,
               ROUND(percent_rank() OVER w, 6) AS pct_rank,
               ROUND(cume_dist() OVER w, 6) AS cume
        FROM part
        WINDOW w AS (ORDER BY p_retailprice, p_partkey)
    """,
    section="W8",
    doc="Distribution window functions percent_rank/cume_dist with a "
    "unique-key ordering (no peer groups -> deterministic). Rounded at 6dp, "
    "NOT 4: cume's value grid k/n lands exactly on 4dp round-half boundaries "
    "for round row counts (n=20000 at sf0.1 -> 573 rows where Spark's "
    "shortest-repr BigDecimal rounding and DuckDB's binary rounding "
    "disagree); at 6dp both grids k/n and k/(n-1) stay >= ~2.5e-11 away "
    "from every half boundary for all test row counts, far beyond double "
    "noise.",
)
def q_win_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale note (r6): an unpartitioned percent_rank window is an Exchange
    # SinglePartition of the corpus. With the unique (price, partkey)
    # ordering there are no peer groups, so percent_rank = (rn-1)/(n-1) and
    # cume_dist = rn/n on the distributed global row number — every stage
    # parallel (range shuffle + P-row offset join + scalar broadcast).
    from ai_to_cvent_etl_spark.operators.ranking import global_row_number

    part = load_table(spark, sf_dir, "part")
    rn = global_row_number(
        part.select("p_partkey", "p_retailprice"),
        ["p_retailprice", "p_partkey"],
    )
    n = part.agg(F.count(F.lit(1)).alias("__n"))
    return rn.crossJoin(F.broadcast(n)).select(
        "p_partkey",
        F.round(
            (F.col("rn") - 1).cast("double") / (F.col("__n") - 1), 6
        ).alias("pct_rank"),
        F.round(F.col("rn").cast("double") / F.col("__n"), 6).alias("cume"),
    )


@register(
    "q_text_edit_distance",
    oracle="""
        SELECT a.doc_id AS doc_lo, b.doc_id AS doc_hi,
               CAST(levenshtein(substr(a.text, 1, 30), substr(b.text, 1, 30))
                    AS BIGINT) AS edit_dist
        FROM documents a
        JOIN documents b
          ON a.source = b.source AND a.doc_id < b.doc_id AND a.doc_id % 7 = 0
        WHERE levenshtein(substr(a.text, 1, 30), substr(b.text, 1, 30)) <= 20
    """,
    section="L5",
    doc="Edit-distance (levenshtein) near-dup pairs over text prefixes, "
    "source-blocked + sampled query side: the fuzzy-matching ETL primitive "
    "(same function in both engines). Threshold 20: non-empty at every "
    "scale factor (<=10 returned 0 rows below sf0.1 — a vacuous check).",
)
def q_text_edit_distance(
    spark: SparkSession, sf_dir: str, strategy: str = "auto"
) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import corpus_side, fan_out

    docs = load_table(spark, sf_dir, "documents")
    a = fan_out(
        docs.filter(F.col("doc_id") % 7 == 0).select(
            F.col("doc_id").alias("doc_lo"),
            F.col("source"),
            F.substring("text", 1, 30).alias("pa"),
        )
    )
    b = docs.select(
        F.col("doc_id").alias("doc_hi"),
        F.col("source").alias("source_b"),
        F.substring("text", 1, 30).alias("pb"),
    )
    dist = F.levenshtein("pa", "pb")
    return (
        a.join(
            corpus_side(b, strategy),
            (F.col("source") == F.col("source_b"))
            & (F.col("doc_lo") < F.col("doc_hi")),
        )
        .withColumn("edit_dist", dist.cast("bigint"))
        .filter(F.col("edit_dist") <= 20)
        .select("doc_lo", "doc_hi", "edit_dist")
    )


@register(
    "q_text_tfidf",
    oracle="""
        WITH tf AS (
            SELECT doc_id, u AS tok, CAST(COUNT(*) AS BIGINT) AS tf
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS u FROM documents)
            GROUP BY doc_id, u
        ),
        df AS (
            SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok
        ),
        n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.tok,
                   tf.tf * ln(n.n_docs / df.df) AS tfidf
            FROM tf JOIN df USING (tok) CROSS JOIN n
        )
        SELECT doc_id, tok, ROUND(tfidf, 4) AS tfidf,
               CAST(rn AS BIGINT) AS rank
        FROM (
            SELECT doc_id, tok, tfidf,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                                      ORDER BY tfidf DESC, tok) AS rn
            FROM scored
        ) WHERE rn <= 3
    """,
    section="L6",
    doc="TF-IDF keyword extraction: term frequency per doc, document "
    "frequency per term (broadcast back), idf = ln(N/df), top-3 terms per "
    "doc. Two key-shuffles + one broadcast; corpus scanned once.",
)
def q_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import fan_out

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        fan_out(docs).select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = tf.join(F.broadcast(df_), "tok").crossJoin(F.broadcast(n)).select(
        "doc_id",
        "tok",
        (F.col("tf") * F.log(F.col("n_docs") / F.col("df"))).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("tok"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "doc_id",
            "tok",
            F.round("tfidf", 4).alias("tfidf"),
            F.col("rn").cast("bigint").alias("rank"),
        )
    )


@register(
    "q_vec_quantize",
    oracle="""
        SELECT vec_id,
               array_to_string(list_transform(embedding,
                   x -> CAST(greatest(-127, least(127,
                        floor(CAST(x AS DOUBLE) * 64 + 0.5))) AS INTEGER)), '|')
                   AS codes,
               ROUND(sqrt(list_sum(list_transform(embedding,
                   x -> (CAST(x AS DOUBLE)
                         - greatest(-127, least(127,
                               floor(CAST(x AS DOUBLE) * 64 + 0.5))) / 64.0)
                      * (CAST(x AS DOUBLE)
                         - greatest(-127, least(127,
                               floor(CAST(x AS DOUBLE) * 64 + 0.5))) / 64.0)))), 4)
                   AS recon_err
        FROM embeddings
    """,
    section="V5",
    doc="Int8-style scalar quantization (the storage half of IVF-PQ): "
    "codes = clamp(floor(x*64 + 0.5), ±127) — floor(+0.5) instead of round() "
    "sidesteps engine tie-break differences — plus L2 reconstruction error. "
    "Row-local; 4x memory reduction before any shuffle at scale. Codes are "
    "serialized to a '|'-joined string (driver hash cannot handle lists, "
    "ADVICE r1).",
)
def q_vec_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    code = (
        "greatest(cast(-127 as double), least(cast(127 as double),"
        " floor(cast(x as double) * 64 + 0.5)))"
    )
    codes = F.expr(
        f"array_join(transform(embedding,"
        f" x -> cast(cast({code} as int) as string)), '|')"
    )
    err = F.expr(
        f"round(sqrt(aggregate(transform(embedding,"
        f" x -> (cast(x as double) - {code} / 64.0d)"
        f"    * (cast(x as double) - {code} / 64.0d)),"
        f" cast(0.0 as double), (a, v) -> a + v)), 4)"
    )
    return emb.select(
        "vec_id", codes.alias("codes"), err.alias("recon_err")
    )
