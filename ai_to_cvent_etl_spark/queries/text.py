"""SURVEY §2.9 — text / LLM-pipeline operators (T1-T6).

Scale design notes:
  * T1/T2 word/ngram counts: tokenize per row (no shuffle), partial-aggregate
    per token map-side, one shuffle on the token key. Bigrams are generated
    with an indexed array transform — NO positional self-join, so the fact
    table is never shuffled twice.
  * T4 keyword scoring is a pure row-local array filter (broadcast-free).
  * T5 brute-force Jaccard is the correctness oracle for near-dedup; its
    token self-join explodes on hot tokens at 100 TB — the scale path is
    MinHash-LSH in queries/dedup_scale.py (same semantics, candidate pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register


@register(
    "q_text_wordcount",
    oracle="""
        SELECT tok, cnt FROM (
            SELECT u AS tok, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM (SELECT unnest(string_split(text, ' ')) AS u FROM documents)
            GROUP BY u
        ) ORDER BY cnt DESC, tok LIMIT 50
    """,
    section="T1",
    doc="Corpus word count, top-50 tokens (count desc, token asc tie-break).",
)
def q_text_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import fan_out

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("tok").asc())
        .limit(50)
    )


@register(
    "q_text_ngrams",
    oracle="""
        SELECT bigram, cnt FROM (
            SELECT u AS bigram, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM (
                SELECT unnest(list_transform(
                           list_slice(string_split(text, ' '), 1, len(string_split(text, ' ')) - 1),
                           (x, i) -> x || ' ' || string_split(text, ' ')[i + 1])) AS u
                FROM documents
            )
            GROUP BY u
        ) ORDER BY cnt DESC, bigram LIMIT 30
    """,
    section="T2",
    doc="Bigram extraction via indexed array transform (no positional self-join).",
)
def q_text_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import fan_out

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    bigrams = F.expr(
        "transform(slice(split(text, ' '), 1, size(split(text, ' ')) - 1),"
        " (x, i) -> concat(x, ' ', element_at(split(text, ' '), i + 2)))"
    )
    return (
        docs.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("bigram").asc())
        .limit(30)
    )


@register(
    "q_text_stats_by_lang",
    oracle="""
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
               CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) / COUNT(*) AS avg_tokens
        FROM documents
        GROUP BY lang
    """,
    section="T3",
)
def q_text_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n = F.count(F.lit(1))
    return docs.groupBy("lang").agg(
        n.alias("n_docs"),
        (F.sum("n_chars").cast("double") / n).alias("avg_chars"),  # int sums: exact
        (F.sum(F.size(F.split(F.col("text"), " "))).cast("double") / n).alias(
            "avg_tokens"
        ),
    )


_POS_LEX = ["fast", "merge", "join"]
_NEG_LEX = ["slow", "dup", "filter"]


@register(
    "q_text_keyword_score",
    oracle=f"""
        SELECT doc_id,
               CAST(len(list_filter(string_split(text, ' '),
                    x -> list_contains({_POS_LEX}, x))) AS BIGINT) AS pos_hits,
               CAST(len(list_filter(string_split(text, ' '),
                    x -> list_contains({_NEG_LEX}, x))) AS BIGINT) AS neg_hits,
               CAST(len(list_filter(string_split(text, ' '),
                    x -> list_contains({_POS_LEX}, x)))
                  - len(list_filter(string_split(text, ' '),
                    x -> list_contains({_NEG_LEX}, x))) AS BIGINT) AS score
        FROM documents
    """,
    section="T4",
    doc="Keyword-lexicon (sentiment-style) scoring: occurrence counts of "
    "positive/negative lexicon tokens, score = pos - neg. Row-local, no shuffle.",
)
def q_text_keyword_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    pos = F.size(F.filter(toks, lambda t: t.isin(_POS_LEX))).cast("bigint")
    neg = F.size(F.filter(toks, lambda t: t.isin(_NEG_LEX))).cast("bigint")
    return docs.select(
        "doc_id",
        pos.alias("pos_hits"),
        neg.alias("neg_hits"),
        (pos - neg).alias("score"),
    )


@register(
    "q_dedup_near_jaccard",
    oracle="""
        WITH tok AS (
            SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
            FROM documents
        ),
        sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM tok GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS doc_lo, b.doc_id AS doc_hi, CAST(COUNT(*) AS BIGINT) AS i
            FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT doc_lo, doc_hi,
               ROUND(i / (sa.sz + sb.sz - i), 4) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_lo
        JOIN sizes sb ON sb.doc_id = doc_hi
        WHERE i / (sa.sz + sb.sz - i) >= 0.8
    """,
    section="T5",
    doc="Near-duplicate pairs by token-set Jaccard >= 0.8 — exact, with the "
    "SSJoin/PPJoin prefix-filtering optimization: a pair with J >= t must "
    "share a token inside both docs' (|x| - ceil(t*|x|) + 1)-length prefixes "
    "under a global token order, so only prefixes are exploded/joined and "
    "the verify is a row-local array_intersect. Result provably identical "
    "to the full brute-force join the oracle runs.",
)
def q_dedup_near_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.operators.dedup import near_dup_pairs

    docs = load_table(spark, sf_dir, "documents")
    return near_dup_pairs(docs, threshold=0.8)


@register(
    "q_text_lang_filter_norm",
    oracle="""
        SELECT doc_id,
               lower(trim(text)) AS clean_text,
               CAST(length(trim(text)) AS BIGINT) AS clean_len,
               CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens,
               source
        FROM documents
        WHERE lang = 'en'
    """,
    section="T6",
    doc="ETL-style normalization: language filter + lower/trim + derived lengths.",
)
def q_text_lang_filter_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.col("lang") == "en").select(
        "doc_id",
        F.lower(F.trim(F.col("text"))).alias("clean_text"),
        F.length(F.trim(F.col("text"))).cast("bigint").alias("clean_len"),
        F.size(F.split(F.trim(F.col("text")), " ")).cast("bigint").alias("n_tokens"),
        "source",
    )
