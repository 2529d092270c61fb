"""LLM-pipeline text-analysis operators (north-star extension, SURVEY §2.9+).

L1 language-ID, L2 token counting, L3 quality scoring, L4 document
fingerprinting. All four are row-local (zero shuffle): at 100 TB each is a
single map stage over the documents scan — embarrassingly parallel, scales
linearly with executors, and Catalyst prunes the scan to exactly the columns
used. No Python UDFs: everything is built-in expressions inside whole-stage
codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register

# Per-language marker lexicons for the n-gram-heuristic language classifier.
# Disjoint token sets; a real deployment swaps in character-n-gram profiles —
# the aggregation/argmax shape (the part that matters for the engine) is
# identical. Ordered dict order = tie-break priority.
_LANG_MARKERS = {
    "de": ["table", "row", "merge"],
    "en": ["the", "a", "fast"],
    "es": ["data", "value", "sort"],
    "fr": ["query", "join", "filter"],
    "zh": ["spark", "stream", "batch"],
}


def _hits(toks: Column, markers: list[str]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(markers))).cast("bigint")


@register(
    "q_text_langid",
    oracle=f"""
        WITH scored AS (
            SELECT doc_id, lang,
                   {', '.join(
                       f"CAST(len(list_filter(string_split(text, ' '), "
                       f"x -> list_contains({m}, x))) AS BIGINT) AS s_{lg}"
                       for lg, m in _LANG_MARKERS.items())}
            FROM documents
        )
        SELECT doc_id,
               CASE
                   WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
                   WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
                   WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
                   WHEN s_fr >= s_zh THEN 'fr'
                   ELSE 'zh'
               END AS pred_lang,
               CASE
                   WHEN (CASE
                       WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
                       WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
                       WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
                       WHEN s_fr >= s_zh THEN 'fr'
                       ELSE 'zh'
                   END) = lang THEN 1 ELSE 0
               END AS is_correct
        FROM scored
    """,
    section="L1",
    doc="N-gram-heuristic language ID: marker-lexicon voting, argmax with "
    "fixed priority tie-break. Row-local map stage — no shuffle at any scale.",
)
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    scored = docs.select(
        "doc_id",
        "lang",
        *[_hits(toks, m).alias(f"s_{lg}") for lg, m in _LANG_MARKERS.items()],
    )
    s = {lg: F.col(f"s_{lg}") for lg in _LANG_MARKERS}
    pred = (
        F.when(
            (s["de"] >= s["en"]) & (s["de"] >= s["es"]) & (s["de"] >= s["fr"]) & (s["de"] >= s["zh"]),
            "de",
        )
        .when((s["en"] >= s["es"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["zh"]), "en")
        .when((s["es"] >= s["fr"]) & (s["es"] >= s["zh"]), "es")
        .when(s["fr"] >= s["zh"], "fr")
        .otherwise("zh")
    )
    return scored.select(
        "doc_id",
        pred.alias("pred_lang"),
        F.when(pred == F.col("lang"), 1).otherwise(0).alias("is_correct"),
    )


# BPE-ish pre-tokenizer: alpha runs, digit runs, or single non-space symbols —
# the standard byte-pair-encoding pre-split regex family, POSIX-safe in both
# dialects (no lookarounds).
_BPE_RE = "[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


@register(
    "q_text_token_count",
    oracle=f"""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
               CAST(len(regexp_extract_all(text, '{_BPE_RE}')) AS BIGINT) AS bpe_tokens,
               ROUND(CAST(length(text) AS DOUBLE)
                     / len(regexp_extract_all(text, '{_BPE_RE}')), 4) AS chars_per_token
        FROM documents
    """,
    section="L2",
    doc="Token counting: whitespace split vs BPE-ish regex pre-tokenizer; "
    "chars-per-token ratio. Row-local, codegen'd regex — no Python boundary.",
)
def q_text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bpe = F.regexp_extract_all(F.col("text"), F.lit(_BPE_RE), 0)
    return docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("ws_tokens"),
        F.size(bpe).cast("bigint").alias("bpe_tokens"),
        F.round(F.length("text").cast("double") / F.size(bpe), 4).alias(
            "chars_per_token"
        ),
    )


_STOPWORDS = ["the", "a", "of", "and", "to"]


@register(
    "q_text_quality_score",
    oracle=f"""
        WITH t AS (
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                   CAST(len(list_filter(string_split(text, ' '),
                        x -> list_contains({_STOPWORDS}, x))) AS BIGINT) AS n_stop,
                   CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq,
                   CAST(length(replace(text, ' ', '')) AS DOUBLE)
                       / len(string_split(text, ' ')) AS awl
            FROM documents
        )
        SELECT doc_id, n_tokens,
               ROUND(CAST(n_stop AS DOUBLE) / n_tokens, 4) AS stopword_ratio,
               ROUND(CAST(n_uniq AS DOUBLE) / n_tokens, 4) AS distinct_ratio,
               ROUND(awl, 4) AS avg_word_len,
               CASE WHEN n_tokens >= 20
                         AND CAST(n_stop AS DOUBLE) / n_tokens BETWEEN 0.05 AND 0.6
                         AND CAST(n_uniq AS DOUBLE) / n_tokens >= 0.3
                    THEN 'keep' ELSE 'drop' END AS quality_class
        FROM t
    """,
    section="L3",
    doc="Heuristic quality scoring (Gopher/C4-style filters): stopword ratio, "
    "distinct-token ratio, mean word length, keep/drop class. Row-local.",
)
def q_text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    t = docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.filter(toks, lambda t_: t_.isin(_STOPWORDS)))
        .cast("bigint")
        .alias("n_stop"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_uniq"),
        (
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
            / F.size(toks)
        ).alias("awl"),
    )
    stop_ratio = F.col("n_stop").cast("double") / F.col("n_tokens")
    uniq_ratio = F.col("n_uniq").cast("double") / F.col("n_tokens")
    return t.select(
        "doc_id",
        "n_tokens",
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(uniq_ratio, 4).alias("distinct_ratio"),
        F.round(F.col("awl"), 4).alias("avg_word_len"),
        F.when(
            (F.col("n_tokens") >= 20)
            & stop_ratio.between(0.05, 0.6)
            & (uniq_ratio >= 0.3),
            "keep",
        )
        .otherwise("drop")
        .alias("quality_class"),
    )


@register(
    "q_text_fingerprint",
    oracle="""
        WITH sh AS (
            SELECT doc_id,
                   list_transform(
                       list_slice(string_split(text, ' '), 1,
                                  greatest(len(string_split(text, ' ')) - 2, 1)),
                       (x, i) -> md5(x || ' '
                                     || coalesce(string_split(text, ' ')[i + 1], '')
                                     || ' '
                                     || coalesce(string_split(text, ' ')[i + 2], ''))
                   ) AS hashes
            FROM documents
        )
        SELECT doc_id,
               list_min(hashes) AS fingerprint,
               CAST(len(hashes) AS BIGINT) AS n_shingles
        FROM sh
    """,
    section="L4",
    doc="Document fingerprint: word-3-gram shingles, md5 rolling hash, "
    "winnowing-style min selection. Row-local; the fingerprint doubles as a "
    "1-permutation MinHash for coarse dedup bucketing at scale.",
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import fan_out

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    hashes = F.expr(
        "transform(slice(split(text, ' '), 1, greatest(size(split(text, ' ')) - 2, 1)),"
        " (x, i) -> md5(concat(x, ' ',"
        "   coalesce(element_at(split(text, ' '), i + 2), ''), ' ',"
        "   coalesce(element_at(split(text, ' '), i + 3), ''))))"
    )
    return docs.select(
        "doc_id",
        F.array_min(hashes).alias("fingerprint"),
        F.size(hashes).cast("bigint").alias("n_shingles"),
    )


# --- T10: RAKE keyword extraction -------------------------------------------
#
# Rapid Automatic Keyword Extraction: split texts into candidate phrases at
# stopwords, score each word by degree/frequency over the phrase graph, and
# score a phrase as the sum of its member word scores. All arithmetic stays
# INTEGER: word_score_q = (deg * 1e6) DIV freq (integer division, identical
# on both engines), phrase score = exact BIGINT sum — no float summation
# order to trust. Phrases of one word are excluded (single words are T1's
# wordcount); identical phrase text always scores identically (corpus-level
# word stats), so grouping by phrase text is well-defined.

_RAKE_TOPK = 20


@register(
    "q_text_rake_keywords",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, u.t AS t, u.pos AS pos,
                   list_contains({_STOPWORDS}, u.t) AS is_stop
            FROM (
                SELECT doc_id,
                       unnest(list_transform(string_split(text, ' '),
                              (x, i) -> struct_pack(t := x, pos := i))) AS u
                FROM documents
            )
        ),
        marked AS (
            SELECT doc_id, t, pos, is_stop,
                   CAST(SUM(CASE WHEN is_stop THEN 1 ELSE 0 END) OVER (
                       PARTITION BY doc_id ORDER BY pos
                   ) AS BIGINT) AS pid
            FROM tok
        ),
        members AS (
            SELECT doc_id, pid, pos, t FROM marked WHERE NOT is_stop
        ),
        plen AS (
            SELECT doc_id, pid, CAST(COUNT(*) AS BIGINT) AS len
            FROM members GROUP BY doc_id, pid
        ),
        wstat AS (
            SELECT m.t,
                   CAST(COUNT(*) AS BIGINT) AS freq,
                   CAST(SUM(p.len) AS BIGINT) AS deg
            FROM members m
            JOIN plen p ON p.doc_id = m.doc_id AND p.pid = m.pid
            GROUP BY m.t
        ),
        wscore AS (
            SELECT t, (deg * 1000000) // freq AS wq FROM wstat
        ),
        phrases AS (
            SELECT m.doc_id, m.pid,
                   array_to_string(list(m.t ORDER BY m.pos), ' ') AS phrase,
                   CAST(SUM(w.wq) AS BIGINT) AS score_q,
                   CAST(COUNT(*) AS BIGINT) AS n_words
            FROM members m JOIN wscore w ON w.t = m.t
            GROUP BY m.doc_id, m.pid
            HAVING COUNT(*) >= 2
        )
        SELECT phrase,
               CAST(MIN(score_q) AS BIGINT) AS score_q,
               CAST(COUNT(*) AS BIGINT) AS n_occurrences
        FROM phrases
        GROUP BY phrase
        ORDER BY score_q DESC, phrase
        LIMIT {_RAKE_TOPK}
    """,
    section="T10",
    doc="RAKE keyword extraction: candidate phrases split at stopwords "
    "(gaps-and-islands over token positions), word score = degree/freq "
    "over the phrase co-occurrence graph, phrase score = sum of member "
    "word scores — the classic unsupervised keyphrase extractor. All "
    "arithmetic is INTEGER ((deg*1e6) DIV freq; exact BIGINT sums), so "
    "the ranking is bit-deterministic cross-engine with no float "
    "summation order to trust. Two keyed shuffles over exploded tokens "
    "(phrase stats, word stats) + one vocabulary-sized join, then a "
    "fully tie-broken top-20.",
)
def q_text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "t"),
    ).withColumn("is_stop", F.col("t").isin(_STOPWORDS))
    w_run = Window.partitionBy("doc_id").orderBy("pos")
    marked = tok.withColumn(
        "pid",
        F.sum(F.col("is_stop").cast("int")).over(w_run).cast("bigint"),
    )
    members = marked.filter(~F.col("is_stop")).select(
        "doc_id", "pid", "pos", "t"
    )
    plen = members.groupBy("doc_id", "pid").agg(
        F.count(F.lit(1)).alias("len")
    )
    wstat = (
        members.join(plen, ["doc_id", "pid"])
        .groupBy("t")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            F.sum("len").alias("deg"),
        )
    )
    wscore = wstat.select(
        "t", F.expr("(deg * 1000000) div freq").alias("wq")
    )
    phrases = (
        members.join(F.broadcast(wscore), "t")
        .groupBy("doc_id", "pid")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "t"))),
                    lambda s: s.t,
                ),
                " ",
            ).alias("phrase"),
            F.sum("wq").alias("score_q"),
            F.count(F.lit(1)).alias("n_words"),
        )
        .filter(F.col("n_words") >= 2)
    )
    return (
        phrases.groupBy("phrase")
        .agg(
            F.min("score_q").alias("score_q"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .orderBy(F.desc("score_q"), F.asc("phrase"))
        .limit(_RAKE_TOPK)
    )
