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
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.types import DecimalType
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

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


# ==== from analytics_r3b ===========================================

_CONTAM_K = 8   # word-n-gram size (GPT-3/Pile-style decontamination uses 8-13)

_CONTAM_M = 29  # benchmark set = docs with doc_id % 29 == 0 (~3% of corpus)

_CSH_SPARK = (
    f"case when size(split(text, ' ')) >= {_CONTAM_K} then "
    f"array_distinct(transform("
    f"sequence(1, size(split(text, ' ')) - {_CONTAM_K} + 1),"
    f" i -> array_join(slice(split(text, ' '), i, {_CONTAM_K}), ' '))) "
    f"else array() end"
)

_CSH_DUCK = (
    f"list_distinct(list_transform("
    f"range(1, greatest(len(string_split(text, ' ')) - {_CONTAM_K} + 1, 0)"
    f" + 1), i -> array_to_string("
    f"list_slice(string_split(text, ' '), i, i + {_CONTAM_K} - 1), ' ')))"
)

@register(
    "q_text_contamination",
    oracle=f"""
        WITH sh AS (
            SELECT doc_id, {_CSH_DUCK} AS gs FROM documents
        ),
        ex AS (
            SELECT doc_id, len(gs) AS n_shingles, unnest(gs) AS g FROM sh
        ),
        bench AS (
            SELECT DISTINCT g FROM ex WHERE doc_id % {_CONTAM_M} = 0
        )
        SELECT e.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_hits,
               CAST(MIN(e.n_shingles) AS BIGINT) AS n_shingles,
               CAST(COUNT(*) AS DOUBLE) / MIN(e.n_shingles)
                   AS contamination_ratio
        FROM ex e JOIN bench b ON e.g = b.g
        WHERE e.doc_id % {_CONTAM_M} <> 0
        GROUP BY e.doc_id
    """,
    section="L8",
    doc="Train/eval contamination check — the GPT-3/Pile-style n-gram "
    "decontamination pass: flag corpus documents sharing any word-8-gram "
    "with a held-out benchmark slice (doc_id % 29 == 0 stands in for the "
    "eval set). Shingles are row-local and distinct per doc; the "
    "benchmark shingle set is eval-sized (small by definition) and "
    "broadcast, so the corpus never shuffles — the check is map-side at "
    "any corpus scale. Ratio is an exact int/int IEEE division — no "
    "rounding needed.",
)
def q_text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # r8 (guide §1.2 per-task work): _CSH_SPARK references split(text)
    # once per lambda element (~n re-tokenizations per doc — HOF lambda
    # bodies are not loop-invariant-hoisted); materializing the split in
    # its own projection makes it once per row. Measured on the shingle
    # stage alone: 2.14 s -> 0.66 s warm at sf0.1. Same arrays.
    pre = docs.select("doc_id", F.split("text", " ").alias("sp"))
    csh_pre = _CSH_SPARK.replace("split(text, ' ')", "sp")
    sh = pre.select(
        "doc_id", F.expr(csh_pre).alias("gs")
    ).select(
        "doc_id",
        F.size("gs").alias("n_shingles"),
        F.explode("gs").alias("g"),
    )
    bench = (
        sh.filter(F.col("doc_id") % _CONTAM_M == 0).select("g").distinct()
    )
    return (
        sh.filter(F.col("doc_id") % _CONTAM_M != 0)
        .join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.min("n_shingles").cast("bigint").alias("n_shingles"),
            (
                F.count(F.lit(1)).cast("double") / F.min("n_shingles")
            ).alias("contamination_ratio"),
        )
    )

# ==== from analytics_r3d ===========================================

_TFIDF_LANG = "de"

_TFIDF_TOPK = 3

_IDF_SCALE = 1000

_MIN_CHARS = 100

_MAX_REP_RATIO = 0.15

_MIN_DIVERSITY = 0.45

@register(
    "q_text_tfidf_cosine",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, text FROM documents WHERE lang = '{_TFIDF_LANG}'
        ),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM d),
        tok AS (
            SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
            FROM d
        ),
        tf AS (
            SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
            FROM tok GROUP BY doc_id, token
        ),
        idf AS (
            SELECT token,
                   (SELECT n_docs FROM n) * {_IDF_SCALE}
                       // CAST(COUNT(*) AS BIGINT) AS idf_q
            FROM tf GROUP BY token
        ),
        w AS (
            SELECT tf.doc_id, tf.token,
                   CAST(tf.tf * idf.idf_q AS BIGINT) AS qw
            FROM tf JOIN idf USING (token)
        ),
        nrm AS (
            SELECT doc_id, CAST(SUM(qw * qw) AS BIGINT) AS n2
            FROM w GROUP BY doc_id
        ),
        dot AS (
            SELECT a.doc_id AS doc_lo, b.doc_id AS doc_hi,
                   CAST(SUM(a.qw * b.qw) AS BIGINT) AS dp
            FROM w a JOIN w b
              ON a.token = b.token AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        ),
        cosed AS (
            SELECT doc_lo, doc_hi,
                   CAST(dp AS DOUBLE)
                   / (sqrt(CAST(na.n2 AS DOUBLE))
                      * sqrt(CAST(nb.n2 AS DOUBLE))) AS cos_sim
            FROM dot
            JOIN nrm na ON dot.doc_lo = na.doc_id
            JOIN nrm nb ON dot.doc_hi = nb.doc_id
        )
        SELECT doc_lo, doc_hi, cos_sim,
               CAST(rnk AS INTEGER) AS rank
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY doc_lo ORDER BY cos_sim DESC, doc_hi
            ) AS rnk
            FROM cosed
        ) WHERE rnk <= {_TFIDF_TOPK}
    """,
    section="L9",
    doc="TF-IDF-weighted cosine document similarity, top-3 neighbors per "
    "doc (the weighted upgrade of T5/D6's set-overlap joins). Weights are "
    f"ALL-INTEGER rational TF-IDF (tf * (N*{_IDF_SCALE} DIV df)) — no "
    "libm log so no quantization drift; dot products and norms are exact "
    "BIGINT sums; cosine is one fixed IEEE expression. Token-blocked "
    "sparse join scoped to one language partition (this corpus's 31-token "
    "vocabulary makes df-pruning degenerate — see module docstring); "
    "map-side partial aggs; output bounded at top-3 rows per doc.",
)
def q_text_tfidf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("lang") == _TFIDF_LANG
    )
    tok = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("token")
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    idf = (
        tf.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n))
        .select(
            "token",
            F.expr(f"(n_docs * {_IDF_SCALE}) div df").alias("idf_q"),
        )
    )
    w = tf.join(idf, "token").select(
        "doc_id", "token", (F.col("tf") * F.col("idf_q")).alias("qw")
    )
    nrm = w.groupBy("doc_id").agg(F.sum(F.col("qw") * F.col("qw")).alias("n2"))
    a = w.select(
        F.col("doc_id").alias("doc_lo"), "token", F.col("qw").alias("qa")
    )
    b = w.select(
        F.col("doc_id").alias("doc_hi"), "token", F.col("qw").alias("qb")
    )
    dot = (
        a.join(b, (a.token == b.token) & (F.col("doc_lo") < F.col("doc_hi")))
        .groupBy("doc_lo", "doc_hi")
        .agg(F.sum(F.col("qa") * F.col("qb")).alias("dp"))
    )
    na = nrm.select(F.col("doc_id").alias("doc_lo"), F.col("n2").alias("na2"))
    nb = nrm.select(F.col("doc_id").alias("doc_hi"), F.col("n2").alias("nb2"))
    cosed = (
        dot.join(na, "doc_lo")
        .join(nb, "doc_hi")
        .select(
            "doc_lo",
            "doc_hi",
            (
                F.col("dp").cast("double")
                / (
                    F.sqrt(F.col("na2").cast("double"))
                    * F.sqrt(F.col("nb2").cast("double"))
                )
            ).alias("cos_sim"),
        )
    )
    rnk = F.row_number().over(
        Window.partitionBy("doc_lo").orderBy(F.desc("cos_sim"), F.asc("doc_hi"))
    )
    return (
        cosed.withColumn("rank", rnk)
        .where(F.col("rank") <= _TFIDF_TOPK)
        .select("doc_lo", "doc_hi", "cos_sim", F.col("rank").cast("int"))
    )

@register(
    "q_text_filter_chain",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
            FROM documents
        ),
        tf AS (
            SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS c
            FROM tok GROUP BY doc_id, t
        ),
        st AS (
            SELECT doc_id,
                   CAST(MAX(c) AS BIGINT) AS max_tf,
                   CAST(SUM(c) AS BIGINT) AS n_tokens,
                   CAST(COUNT(*) AS BIGINT) AS n_distinct
            FROM tf GROUP BY doc_id
        )
        SELECT d.doc_id, d.n_chars, st.n_tokens,
               CASE
                   WHEN d.n_chars < {_MIN_CHARS} THEN 'too_short'
                   WHEN CAST(st.max_tf AS DOUBLE) / st.n_tokens
                        > {_MAX_REP_RATIO} THEN 'repetitive'
                   WHEN CAST(st.n_distinct AS DOUBLE) / st.n_tokens
                        < {_MIN_DIVERSITY} THEN 'low_diversity'
                   ELSE 'pass'
               END AS verdict
        FROM documents d JOIN st ON d.doc_id = st.doc_id
    """,
    section="L10",
    doc="Ordered quality-filter chain with first-failure attribution "
    "(C4/Gopher-style cleaning telemetry: WHICH rule dropped each doc, "
    "not just that it dropped): too-short -> max-token-repetition -> "
    "type/token diversity, evaluated as one fixed CASE chain so rule "
    "precedence is part of the contract. Per-doc stats come from one "
    "keyed token aggregation; the verdict itself is map-only. Ratios are "
    "single int/int IEEE divisions against literal thresholds — exact.",
)
def q_text_filter_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("t")
    )
    st = (
        tok.groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.max("c").alias("max_tf"),
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
        )
    )
    j = docs.select("doc_id", "n_chars").join(st, "doc_id")
    verdict = (
        F.when(F.col("n_chars") < _MIN_CHARS, "too_short")
        .when(
            F.col("max_tf").cast("double") / F.col("n_tokens") > _MAX_REP_RATIO,
            "repetitive",
        )
        .when(
            F.col("n_distinct").cast("double") / F.col("n_tokens")
            < _MIN_DIVERSITY,
            "low_diversity",
        )
        .otherwise("pass")
    )
    return j.select("doc_id", "n_chars", "n_tokens", verdict.alias("verdict"))

# ==== from analytics_r3e ===========================================

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

# ==== from analytics_r3f ===========================================

@register(
    "q_text_bigram_logprob",
    oracle="""
        WITH toks AS (
            SELECT doc_id, string_split(lower(text), ' ') AS tk
            FROM documents
        ),
        bg AS (
            SELECT doc_id,
                   unnest(list_transform(
                       range(1, len(tk)),
                       i -> tk[i] || ' ' || tk[i + 1]
                   )) AS bigram
            FROM toks WHERE len(tk) >= 2
        ),
        cb AS (
            SELECT bigram, CAST(COUNT(*) AS BIGINT) AS c2
            FROM bg GROUP BY bigram
        ),
        cu AS (
            SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM (
                SELECT string_split(bigram, ' ')[1] AS w1, c2 FROM cb
            ) GROUP BY w1
        )
        SELECT bg.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               ROUND(AVG(-ln(CAST(cb.c2 AS DOUBLE) / cu.c1)), 4) AS avg_nll
        FROM bg
        JOIN cb USING (bigram)
        JOIN cu ON string_split(bg.bigram, ' ')[1] = cu.w1
        GROUP BY bg.doc_id
    """,
    section="L13",
    doc="Bigram-LM quality scoring: mean negative conditional log-prob "
    "-ln(c(w1 w2)/c(w1-as-history)) per doc against the corpus bigram "
    "model — the n-gram upgrade of L7's unigram perplexity signal "
    "(catches scrambled-word docs a unigram LM scores as normal). LM "
    "tables are vocabulary-sized (<= |V|^2) and broadcast; the corpus "
    "contributes two token-keyed shuffles. ROUND 4 absorbs libm/fold "
    "drift (L7's accepted device); p itself is one exact division.",
)
def q_text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    from ai_to_cvent_etl_spark.queries._util import fan_out

    # fan_out: 5000 docs is ONE parquet split — without it the whole
    # bigram explosion runs on a single task (see _util.fan_out).
    # zip_with over two slices tokenizes each doc once per use instead of
    # once per bigram; the size>=2 guard matters because Spark's
    # sequence(1, n-1) DESCENDS when n-1 < 1 (would fabricate bigrams).
    bg = fan_out(docs).select(
        "doc_id", F.split(F.lower(F.col("text")), " ").alias("tk")
    ).where(F.expr("size(tk) >= 2")).select(
        "doc_id",
        F.explode(
            F.expr(
                "zip_with(slice(tk, 1, size(tk) - 1),"
                " slice(tk, 2, size(tk) - 1),"
                " (a, b) -> concat(a, ' ', b))"
            )
        ).alias("bigram"),
    )
    cb = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("c2"))
    cu = (
        cb.select(
            F.expr("element_at(split(bigram, ' '), 1)").alias("w1"), "c2"
        )
        .groupBy("w1")
        .agg(F.sum("c2").alias("c1"))
    )
    j = (
        bg.join(F.broadcast(cb), "bigram")
        .join(
            F.broadcast(cu),
            F.expr("element_at(split(bigram, ' '), 1)") == F.col("w1"),
        )
    )
    nll = -F.log(F.col("c2").cast("double") / F.col("c1"))
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg(nll), 4).alias("avg_nll"),
    )

# ==== from analytics_r3h ===========================================

def _confusion_oracle() -> str:
    from ai_to_cvent_etl_spark.queries.llm_text import _LANG_MARKERS

    scored = ", ".join(
        f"CAST(len(list_filter(string_split(text, ' '), "
        f"x -> list_contains({m}, x))) AS BIGINT) AS s_{lg}"
        for lg, m in _LANG_MARKERS.items()
    )
    pred = """
               CASE
                   WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
                   WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
                   WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
                   WHEN s_fr >= s_zh THEN 'fr'
                   ELSE 'zh'
               END"""
    return f"""
        WITH scored AS (
            SELECT doc_id, lang, {scored} FROM documents
        ),
        p AS (
            SELECT lang, {pred} AS pred_lang FROM scored
        ),
        cm AS (
            SELECT lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
            FROM p GROUP BY lang, pred_lang
        )
        SELECT lang, pred_lang, n,
               CAST(SUM(n) OVER (PARTITION BY lang) AS BIGINT) AS n_gold,
               CAST(CASE WHEN lang = pred_lang THEN n ELSE 0 END AS DOUBLE)
                   / CAST(SUM(n) OVER (PARTITION BY lang) AS BIGINT)
                   AS recall_if_diag
        FROM cm
    """

@register(
    "q_text_langid_confusion",
    oracle=_confusion_oracle(),
    section="L14",
    doc="Confusion matrix + per-class recall for the L1 language "
    "classifier against the gold lang labels — the evaluation loop every "
    "in-pipeline classifier needs (which languages leak into which). "
    "Scoring is L1's row-local integer marker voting; the matrix is "
    "|langs|^2 rows, so the recall window runs on a bounded table. "
    "Counts + one division — exact.",
)
def q_text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries.llm_text import _LANG_MARKERS, _hits

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    scored = docs.select(
        "lang",
        *[_hits(toks, m).alias(f"s_{lg}") for lg, m in _LANG_MARKERS.items()],
    )
    s = {lg: F.col(f"s_{lg}") for lg in _LANG_MARKERS}
    pred = (
        F.when(
            (s["de"] >= s["en"])
            & (s["de"] >= s["es"])
            & (s["de"] >= s["fr"])
            & (s["de"] >= s["zh"]),
            "de",
        )
        .when(
            (s["en"] >= s["es"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["zh"]),
            "en",
        )
        .when((s["es"] >= s["fr"]) & (s["es"] >= s["zh"]), "es")
        .when(s["fr"] >= s["zh"], "fr")
        .otherwise("zh")
    )
    cm = (
        scored.select("lang", pred.alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wl = Window.partitionBy("lang")
    return cm.select(
        "lang",
        "pred_lang",
        "n",
        F.sum("n").over(wl).alias("n_gold"),
        (
            F.when(F.col("lang") == F.col("pred_lang"), F.col("n"))
            .otherwise(0)
            .cast("double")
            / F.sum("n").over(wl)
        ).alias("recall_if_diag"),
    )

# ==== from analytics_r3r ===========================================

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
    # Scale note (r6): the token prefix-sum that assigns pack chunks runs
    # on the distributed two-pass cumulative operator.
    from ai_to_cvent_etl_spark.operators.ranking import global_cumulative

    c = global_cumulative(t, ["doc_id"], {"cum": F.col("n_tok")})
    start = F.expr(f"(cum - n_tok) DIV {_PACK_BUDGET}")
    end = F.expr(f"(cum - 1) DIV {_PACK_BUDGET}")
    return c.select(
        "doc_id",
        "n_tok",
        start.alias("start_chunk"),
        end.alias("end_chunk"),
        (end - start + 1).alias("n_chunks"),
    )

# ==== from analytics_r3v ===========================================

_MIX_SHARES = {"en": 0.5, "de": 0.15, "fr": 0.15, "es": 0.1, "zh": 0.1}

_MIX_BUDGET_FRAC = 0.5  # token budget = 50% of the corpus

@register(
    "q_text_domain_mixture",
    oracle=f"""
        WITH toks AS (
            SELECT lang,
                   CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                       AS n_tokens
            FROM documents GROUP BY lang
        ),
        planned AS (
            SELECT lang, n_tokens,
                   CAST(CASE lang
                     {' '.join(f"WHEN '{k}' THEN {v}" for k, v in _MIX_SHARES.items())}
                   END AS DOUBLE) AS target_share,
                   CAST(SUM(n_tokens) OVER () AS DOUBLE)
                       * {_MIX_BUDGET_FRAC} AS budget
            FROM toks
        )
        SELECT lang, n_tokens,
               target_share,
               ROUND(least(1.0, budget * target_share / n_tokens), 6)
                   AS sample_rate,
               CAST(floor(least(1.0, budget * target_share / n_tokens)
                          * n_tokens) AS BIGINT) AS effective_tokens
        FROM planned
    """,
    section="L16",
    doc="Pretraining data-mixture planning: per-language token counts, "
    f"target mixture shares ({_MIX_SHARES}), and a token budget of "
    f"{_MIX_BUDGET_FRAC:.0%} of the corpus → per-language sampling "
    "rate min(1, budget·share/available) and effective token yield. "
    "A rate pinned at 1.0 means the language is UNDER-REPRESENTED "
    "relative to its target (the budget wants more than exists) — the "
    "signal that drives up-weighting or extra sourcing. Exact token "
    "counts; rates are IEEE with literal weights; floor() on the "
    "yield. Collapses to |languages| rows; the plan feeds E9's "
    "weighted sampler to write the mixed corpus.",
)
def q_text_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.groupBy("lang").agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tokens")
    )
    share = F.create_map(
        *[F.lit(x) for kv in _MIX_SHARES.items() for x in kv]
    )[F.col("lang")]
    budget = (
        F.sum("n_tokens").over(Window.partitionBy()).cast("double")
        * _MIX_BUDGET_FRAC
    )
    planned = toks.select(
        "lang",
        "n_tokens",
        share.alias("target_share"),
        budget.alias("budget"),
    )
    rate = F.least(
        F.lit(1.0),
        F.col("budget") * F.col("target_share") / F.col("n_tokens"),
    )
    return planned.select(
        "lang",
        "n_tokens",
        "target_share",
        F.round(rate, 6).alias("sample_rate"),
        F.floor(rate * F.col("n_tokens")).cast("long").alias(
            "effective_tokens"
        ),
    )

# ==== from analytics_r3x ===========================================

@register(
    "q_text_repetition",
    oracle="""
        WITH toks AS (
            SELECT doc_id, u.tok AS tok, u.pos AS pos,
                   len(string_split(text, ' ')) AS n_tok
            FROM (
                SELECT doc_id, text,
                       unnest(list_transform(string_split(text, ' '),
                              (x, i) -> struct_pack(tok := x, pos := i)))
                           AS u
                FROM documents
            )
        ),
        runs AS (
            SELECT doc_id, tok,
                   pos - row_number() OVER (
                       PARTITION BY doc_id, tok ORDER BY pos
                   ) AS grp
            FROM toks
        ),
        run_len AS (
            SELECT doc_id, CAST(MAX(n) AS BIGINT) AS max_run
            FROM (
                SELECT doc_id, COUNT(*) AS n
                FROM runs GROUP BY doc_id, tok, grp
            ) GROUP BY doc_id
        ),
        big AS (
            SELECT doc_id, g, COUNT(*) AS c
            FROM (
                SELECT doc_id,
                       unnest(list_transform(
                           list_slice(string_split(text, ' '), 1,
                                      len(string_split(text, ' ')) - 1),
                           (x, i) -> x || ' '
                                     || string_split(text, ' ')[i + 1]))
                           AS g
                FROM documents
            ) GROUP BY doc_id, g
        ),
        top_big AS (
            SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_bigram,
                   CAST(SUM(c) AS BIGINT) AS n_bigrams
            FROM big GROUP BY doc_id
        ),
        base AS (
            SELECT doc_id,
                   CAST(MAX(n_tok) AS BIGINT) AS n_tok,
                   CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_distinct
            FROM toks GROUP BY doc_id
        )
        SELECT b.doc_id, b.n_tok,
               ROUND(CAST(b.n_distinct AS DOUBLE) / b.n_tok, 6)
                   AS distinct_ratio,
               ROUND(CAST(t.top_bigram AS DOUBLE) / t.n_bigrams, 6)
                   AS top_bigram_share,
               r.max_run
        FROM base b
        JOIN top_big t ON t.doc_id = b.doc_id
        JOIN run_len r ON r.doc_id = b.doc_id
    """,
    section="L17",
    doc="Gopher-style within-document repetition filters: distinct-token "
    "ratio, top-bigram share (the boilerplate signal), and the longest "
    "run of one repeated token (gaps-and-islands on pos − row_number) "
    "— the degenerate-text gates that pairwise dedup (D1/T5) never "
    "sees because a looping document is only similar to ITSELF. Exact "
    "integer counting; ratios rounded on output. One explode + keyed "
    "per-doc reductions, all co-partitioned on doc_id — run this gate "
    "BEFORE corpus-wide dedup so degenerate docs never enter LSH.",
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sp = F.split("text", " ")
    toks = docs.select(
        "doc_id",
        F.size(sp).alias("n_tok"),
        F.posexplode(sp).alias("pos", "tok"),
    )
    runs = toks.select(
        "doc_id",
        "tok",
        (
            F.col("pos")
            - F.row_number().over(
                Window.partitionBy("doc_id", "tok").orderBy("pos")
            )
        ).alias("grp"),
    )
    run_len = (
        runs.groupBy("doc_id", "tok", "grp")
        .agg(F.count("*").alias("n"))
        .groupBy("doc_id")
        .agg(F.max("n").alias("max_run"))
    )
    bi = F.transform(
        F.slice(sp, 1, F.size(sp) - 1),
        lambda x, i: F.concat_ws(" ", x, F.element_at(sp, i + 2)),
    )
    big = (
        docs.select("doc_id", F.explode(bi).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
    )
    top_big = big.groupBy("doc_id").agg(
        F.max("c").alias("top_bigram"), F.sum("c").alias("n_bigrams")
    )
    base = toks.groupBy("doc_id").agg(
        F.max("n_tok").cast("long").alias("n_tok"),
        F.countDistinct("tok").alias("n_distinct"),
    )
    return (
        base.join(top_big, "doc_id")
        .join(run_len, "doc_id")
        .select(
            "doc_id",
            "n_tok",
            F.round(
                F.col("n_distinct").cast("double") / F.col("n_tok"), 6
            ).alias("distinct_ratio"),
            F.round(
                F.col("top_bigram").cast("double") / F.col("n_bigrams"), 6
            ).alias("top_bigram_share"),
            "max_run",
        )
    )

# ==== from analytics_r4i ===========================================

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


# ==== forty-eighth wave (r4) ==================================================

_KN_D = 0.75  # absolute-discount mass


@register(
    "q_text_kneser_ney",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS ts
            FROM documents WHERE lang = 'en'
        ),
        bg AS (
            SELECT doc_id, u.u AS u, u.w AS w
            FROM (
                SELECT doc_id,
                       unnest(list_transform(
                           range(1, len(ts)),
                           i -> struct_pack(u := ts[i], w := ts[i + 1]))) AS u
                FROM toks
            )
        ),
        bc AS (
            SELECT u, w, CAST(COUNT(*) AS BIGINT) AS cuw
            FROM bg GROUP BY u, w
        ),
        uc AS (
            SELECT u, CAST(SUM(cuw) AS BIGINT) AS cu,
                   CAST(COUNT(*) AS BIGINT) AS fanout
            FROM bc GROUP BY u
        ),
        cont AS (
            SELECT w, CAST(COUNT(*) AS BIGINT) AS nleft
            FROM bc GROUP BY w
        ),
        tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_types FROM bc),
        scored AS (
            SELECT g.doc_id,
                   CAST(FLOOR(1e6 * log2(
                       GREATEST(b.cuw - {_KN_D}, 0) / (1.0 * c.cu)
                       + {_KN_D} * c.fanout / (1.0 * c.cu)
                         * n.nleft / (1.0 * t.n_types)
                   )) AS BIGINT) AS term
            FROM bg g
            JOIN bc b ON g.u = b.u AND g.w = b.w
            JOIN uc c ON g.u = c.u
            JOIN cont n ON g.w = n.w
            CROSS JOIN tt t
        )
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               ROUND(SUM(term) / (1e6 * COUNT(*)), 4) AS avg_log2_prob
        FROM scored GROUP BY doc_id
    """,
    section="L19",
    doc=f"Kneser-Ney smoothed bigram language-model scoring of every "
    f"English document against the corpus-level model: P(w|u) = "
    f"max(c(uw)-{_KN_D}, 0)/c(u) + {_KN_D}·N1+(u·)/c(u) · "
    "P_cont(w), with the CONTINUATION probability P_cont(w) = "
    "N1+(·w)/|bigram types| — the insight that separates KN from L7/"
    "L13's count smoothing: 'Francisco' is frequent but follows only "
    "'San', so its continuation mass is tiny; KN is what n-gram "
    "quality filters actually ship. Every model component is an exact "
    "integer count; per-bigram log2 terms are floor-quantized to "
    "micro-bits and summed as BIGINTs (TS21 device), one division at "
    "the end. No OOV term needed: docs are scored against the corpus "
    "they're in, so every bigram has c(uw) >= 1. Scale: model tables "
    "are VOCABULARY-sized (V and V² bounded, broadcast); the doc-side "
    "bigram explode is the only row-proportional stage and joins "
    "against broadcast models map-side — one keyed re-aggregation by "
    "doc_id ends the plan.",
)
def q_text_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    toks = docs.select("doc_id", F.split("text", " ").alias("ts"))
    # size filter: sequence(1, 0) yields DESCENDING [1, 0] and ts[1] then
    # faults under ANSI on 1-token docs — bigrams need >= 2 tokens
    bg = toks.where(F.size("ts") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(ts) - 1), "
                "i -> struct(ts[i - 1] as u, ts[i] as w))"
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.u").alias("u"), F.col("b.w").alias("w"))
    bc = bg.groupBy("u", "w").agg(F.count(F.lit(1)).cast("bigint").alias("cuw"))
    uc = bc.groupBy("u").agg(
        F.sum("cuw").cast("bigint").alias("cu"),
        F.count(F.lit(1)).cast("bigint").alias("fanout"),
    )
    cont = bc.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("nleft"))
    tt = bc.agg(F.count(F.lit(1)).cast("bigint").alias("n_types"))
    p = (
        F.greatest(F.col("cuw") - _KN_D, F.lit(0.0)) / (1.0 * F.col("cu"))
        + _KN_D
        * F.col("fanout")
        / (1.0 * F.col("cu"))
        * F.col("nleft")
        / (1.0 * F.col("n_types"))
    )
    scored = (
        bg.join(F.broadcast(bc), ["u", "w"])
        .join(F.broadcast(uc), "u")
        .join(F.broadcast(cont), "w")
        .crossJoin(F.broadcast(tt))
        .select(
            "doc_id",
            F.floor(1e6 * F.log2(p)).cast("bigint").alias("term"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.round(F.sum("term") / (1e6 * F.count(F.lit(1))), 4).alias(
            "avg_log2_prob"
        ),
    )


_SW_MIN_DF_RATIO = 0.30   # token present in >30% of docs => stopword candidate


@register(
    "q_text_stopword_discovery",
    oracle=f"""
        WITH dtok AS (
            SELECT DISTINCT doc_id, u AS tok
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS u
                  FROM documents)
            WHERE u <> ''
        ),
        df AS (
            SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM dtok
            GROUP BY tok
        ),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents)
        SELECT tok, df, n_docs,
               ROUND(CAST(df AS DOUBLE) / n_docs, 4) AS df_ratio
        FROM df CROSS JOIN n
        WHERE CAST(df AS DOUBLE) / n_docs > {_SW_MIN_DF_RATIO}
    """,
    section="L20",
    doc="Corpus-driven stopword discovery: tokens whose DOCUMENT "
    "frequency exceeds 30% of the corpus — the data-derived stopword "
    "list every retrieval/quality pipeline should prefer over a "
    "frozen English list (domain corpora have their own function "
    "words: boilerplate headers, license lines, markup tokens). "
    "Emits the evidence (df, ratio) rather than just the list so the "
    "threshold is auditable. Per-doc DISTINCT collapses before the "
    "global count (tf weights would inflate repetitive docs), so the "
    "shuffle carries (doc,token) pairs once; the df table is "
    "vocabulary-bounded — broadcast-size — and the ratio filter is "
    "row-local. One explode + two keyed reductions; linear in corpus "
    "tokens.",
)
def q_text_stopword_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import fan_out

    docs = load_table(spark, sf_dir, "documents")
    dtok = (
        fan_out(docs)
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .distinct()
    )
    df_ = dtok.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    n = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    return (
        df_.crossJoin(F.broadcast(n))
        .where(F.col("df").cast("double") / F.col("n_docs") > _SW_MIN_DF_RATIO)
        .select(
            "tok",
            "df",
            "n_docs",
            F.round(
                F.col("df").cast("double") / F.col("n_docs"), 4
            ).alias("df_ratio"),
        )
    )


_FT_TIER_STOP = 0.30   # L20's stopword threshold (df ratio)
_FT_TIER_FREQ = 0.02   # high-frequency tier: boilerplate/markup candidates


@register(
    "q_text_frequent_terms_tiered",
    oracle=f"""
        WITH dtok AS (
            SELECT DISTINCT doc_id, u AS tok
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS u
                  FROM documents)
            WHERE u <> ''
        ),
        df AS (
            SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM dtok
            GROUP BY tok
        ),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents)
        SELECT tok, df, n_docs,
               ROUND(CAST(df AS DOUBLE) / n_docs, 4) AS df_ratio,
               CASE WHEN CAST(df AS DOUBLE) / n_docs > {_FT_TIER_STOP}
                    THEN 'stopword' ELSE 'frequent' END AS tier
        FROM df CROSS JOIN n
        WHERE CAST(df AS DOUBLE) / n_docs > {_FT_TIER_FREQ}
    """,
    section="L20b",
    doc="Tiered frequent-term discovery: L20's corpus-driven stopword "
    "list (df > 30%) plus the HIGH-FREQUENCY tier (df > 2%) that "
    "boilerplate/markup filtering actually uses — on a real corpus the "
    "2% band is where license headers, navigation chrome and template "
    "fragments live, and a curation pipeline reviews that band rather "
    "than only the extreme stopwords. Same plan as L20 (one explode, "
    "per-doc DISTINCT collapse, vocabulary-bounded df table, row-local "
    "ratio tiering): linear in corpus tokens, zero extra shuffles. "
    "Scale/fixture note (r8, VERDICT r7 item 8): the generated SF "
    "fixtures cap shared-token document counts at a FIXED block so "
    "quadratic DuckDB oracles stay feasible, which makes the 30% tier "
    "vacuous above sf1 BY CONSTRUCTION; the 2% tier keeps "
    "discovery-threshold behavior exercised through sf3 (shared-slice "
    "df ratio ~10%) and sf10 (~3%) without unbounding any oracle.",
)
def q_text_frequent_terms_tiered(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import fan_out

    docs = load_table(spark, sf_dir, "documents")
    dtok = (
        fan_out(docs)
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .distinct()
    )
    df_ = dtok.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    n = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    ratio = F.col("df").cast("double") / F.col("n_docs")
    return (
        df_.crossJoin(F.broadcast(n))
        .where(ratio > _FT_TIER_FREQ)
        .select(
            "tok",
            "df",
            "n_docs",
            F.round(ratio, 4).alias("df_ratio"),
            F.when(ratio > _FT_TIER_STOP, F.lit("stopword"))
            .otherwise(F.lit("frequent"))
            .alias("tier"),
        )
    )


_LO_TOP_K = 10     # report the 10 most distinctive tokens per side
_LO_PRIOR = 0.5    # flat Dirichlet pseudo-count per token


@register(
    "q_text_log_odds_monroe",
    oracle=f"""
        WITH tok AS MATERIALIZED (
            SELECT CASE WHEN lang = 'en' THEN 'en' ELSE 'other' END AS grp,
                   u AS tok
            FROM (SELECT lang, unnest(string_split(text, ' ')) AS u
                  FROM documents)
            WHERE u <> ''
        ),
        counts AS MATERIALIZED (
            SELECT tok,
                   CAST(SUM(CASE WHEN grp = 'en' THEN 1 ELSE 0 END)
                        AS BIGINT) AS ya,
                   CAST(SUM(CASE WHEN grp = 'other' THEN 1 ELSE 0 END)
                        AS BIGINT) AS yb
            FROM tok GROUP BY tok
        ),
        tot AS (
            SELECT CAST(SUM(ya) AS BIGINT) AS na,
                   CAST(SUM(yb) AS BIGINT) AS nb,
                   CAST(COUNT(*) AS BIGINT) AS v
            FROM counts
        ),
        z AS (
            SELECT tok, ya, yb,
                   (ln((ya + {_LO_PRIOR})
                       / (na + v * {_LO_PRIOR} - ya - {_LO_PRIOR}))
                    - ln((yb + {_LO_PRIOR})
                         / (nb + v * {_LO_PRIOR} - yb - {_LO_PRIOR})))
                   / sqrt(1.0 / (ya + {_LO_PRIOR})
                          + 1.0 / (yb + {_LO_PRIOR})) AS zval
            FROM counts CROSS JOIN tot
        )
        SELECT tok, ya, yb, ROUND(zval, 4) AS z, side
        FROM (
            SELECT tok, ya, yb, zval, 'en' AS side,
                   row_number() OVER (ORDER BY zval DESC, tok) AS rn
            FROM z
            UNION ALL
            SELECT tok, ya, yb, zval, 'other' AS side,
                   row_number() OVER (ORDER BY zval ASC, tok) AS rn
            FROM z
        ) WHERE rn <= {_LO_TOP_K}
    """,
    section="L21",
    doc="Monroe-Colaresi-Quinn 'Fightin' Words' log-odds with a "
    "Dirichlet prior: which tokens distinguish English docs from the "
    "rest of the corpus, scored as the z of the prior-smoothed "
    "log-odds-ratio difference — THE principled replacement for raw "
    "tf-ratio contrasts (which explode on rare tokens; the prior + "
    "variance term damp exactly those). The device behind corpus "
    "drift readouts, subgroup vocabulary audits, and contamination "
    "forensics. Exact integer token counts per group in one "
    "conditional-aggregation pass; z is a row-local IEEE formula "
    "over (ya, yb, na, nb, V) — deterministic (rank-boundary ulps "
    "are the documented 5.3 tail; token tie-break pins order). "
    "Output: the top-10 most-distinctive tokens PER SIDE (rank, not "
    "threshold — scale-free, never vacuous at small corpora). "
    "Scale: one token-keyed count shuffle; totals broadcast; the "
    "rank window runs on the vocabulary-bounded score table.",
)
def q_text_log_odds_monroe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import fan_out

    docs = load_table(spark, sf_dir, "documents")
    tok = (
        fan_out(docs)
        .select(
            F.when(F.col("lang") == "en", "en").otherwise("other").alias("grp"),
            F.explode(F.split("text", " ")).alias("tok"),
        )
        .where(F.col("tok") != "")
    )
    counts = tok.groupBy("tok").agg(
        F.sum(F.when(F.col("grp") == "en", 1).otherwise(0))
        .cast("bigint")
        .alias("ya"),
        F.sum(F.when(F.col("grp") == "other", 1).otherwise(0))
        .cast("bigint")
        .alias("yb"),
    )
    tot = counts.agg(
        F.sum("ya").cast("bigint").alias("na"),
        F.sum("yb").cast("bigint").alias("nb"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
    )
    a = _LO_PRIOR
    zval = (
        F.log(
            (F.col("ya") + a)
            / (F.col("na") + F.col("v") * a - F.col("ya") - a)
        )
        - F.log(
            (F.col("yb") + a)
            / (F.col("nb") + F.col("v") * a - F.col("yb") - a)
        )
    ) / F.sqrt(1.0 / (F.col("ya") + a) + 1.0 / (F.col("yb") + a))
    scored = (
        counts.crossJoin(F.broadcast(tot)).withColumn("zval", zval)
    )
    return _lo_top(scored, False, "en").unionAll(
        _lo_top(scored, True, "other")
    )


def _lo_top(scored, asc: bool, side: str):
    order = (
        [F.col("zval").asc(), F.col("tok")]
        if asc
        else [F.col("zval").desc(), F.col("tok")]
    )
    w = Window.orderBy(*order)
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _LO_TOP_K)
        .select(
            "tok", "ya", "yb",
            F.round("zval", 4).alias("z"),
            F.lit(side).alias("side"),
        )
    )


_HEAPS_CKPTS = 5   # vocabulary-growth checkpoints (corpus fifths)


@register(
    "q_text_heaps_law",
    oracle=f"""
        WITH ranked_docs AS MATERIALIZED (
            SELECT doc_id,
                   row_number() OVER (ORDER BY doc_id) AS rk,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
            FROM documents
        ),
        nn AS (SELECT CAST(MAX(rk) AS BIGINT) AS n_docs FROM ranked_docs),
        firsts AS MATERIALIZED (
            SELECT tok, CAST(MIN(rk) AS BIGINT) AS first_rk
            FROM (
                SELECT r.rk, unnest(string_split(d.text, ' ')) AS tok
                FROM documents d JOIN ranked_docs r ON r.doc_id = d.doc_id
            )
            WHERE tok <> ''
            GROUP BY tok
        ),
        ckpts AS (
            SELECT k, (n_docs * k) // {_HEAPS_CKPTS} AS rk_cut
            FROM (SELECT unnest(range(1, {_HEAPS_CKPTS + 1})) AS k)
            CROSS JOIN nn
        ),
        rows_out AS MATERIALIZED (
            SELECT c.k, c.rk_cut,
                   (SELECT CAST(SUM(n_toks) AS BIGINT) FROM ranked_docs
                    WHERE rk <= c.rk_cut) AS tokens_cum,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM firsts
                    WHERE first_rk <= c.rk_cut) AS vocab_cum
            FROM ckpts c
        ),
        fit AS (
            SELECT (ln(CAST(l.vocab_cum AS DOUBLE))
                    - ln(CAST(f.vocab_cum AS DOUBLE)))
                   / (ln(CAST(l.tokens_cum AS DOUBLE))
                      - ln(CAST(f.tokens_cum AS DOUBLE))) AS beta
            FROM (SELECT * FROM rows_out WHERE k = 1) f
            CROSS JOIN (SELECT * FROM rows_out
                        WHERE k = {_HEAPS_CKPTS}) l
        )
        SELECT CAST(k AS INT) AS ckpt, rk_cut AS n_docs,
               tokens_cum, vocab_cum,
               ROUND(beta, 4) AS heaps_beta
        FROM rows_out CROSS JOIN fit
    """,
    section="L22",
    doc="Heaps'-law vocabulary growth: cumulative token count vs "
    "cumulative DISTINCT vocabulary at five corpus-order checkpoints "
    "(doc_id order — deterministic), plus the two-point log-log "
    "slope beta (V ~ K*T^beta; natural corpora sit near 0.4-0.6, "
    "synthetic/templated ones much lower) — with T13's Zipf fit, "
    "the pair of distributional fingerprints that expose templated "
    "or machine-generated corpora before training on them. First-"
    "occurrence rank per token = one MIN per token (no running "
    "windows over the corpus); checkpoint vocab counts are "
    "threshold counts over the vocabulary-bounded firsts table. "
    "Scale: one explode + token-keyed MIN + a 5-row checkpoint "
    "join; the only corpus-proportional work is the token shuffle.",
)
def q_text_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import fan_out

    docs = load_table(spark, sf_dir, "documents")
    # Scale note (r6): the corpus-order index comes from the distributed
    # two-pass rank operator, checkpointed once — the old unpartitioned
    # row_number window was single-task AND re-planned by every one of the
    # six consumers (12 copies in the executed plan).
    from ai_to_cvent_etl_spark.operators.ranking import global_row_number

    ranked = global_row_number(
        docs.select(
            "doc_id",
            F.size(F.split("text", " ")).cast("bigint").alias("n_toks"),
            "text",
        ),
        ["doc_id"],
        out_col="rk",
    ).localCheckpoint(eager=False)
    nn = ranked.agg(F.max("rk").cast("bigint").alias("n_docs"))
    firsts = (
        fan_out(ranked)
        .select("rk", F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.min("rk").cast("bigint").alias("first_rk"))
    )
    ckpts = (
        spark.range(1, _HEAPS_CKPTS + 1)
        .select(F.col("id").cast("bigint").alias("k"))
        .crossJoin(F.broadcast(nn))
        .select(
            "k", F.expr(f"(n_docs * k) div {_HEAPS_CKPTS}").alias("rk_cut")
        )
    )
    toks_cum = (
        ckpts.join(ranked, F.col("rk") <= F.col("rk_cut"))
        .groupBy("k", "rk_cut")
        .agg(F.sum("n_toks").cast("bigint").alias("tokens_cum"))
    )
    vocab_cum = (
        ckpts.join(firsts, F.col("first_rk") <= F.col("rk_cut"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("vocab_cum"))
    )
    rows_out = toks_cum.join(vocab_cum, "k")
    f_row = rows_out.where(F.col("k") == 1).select(
        F.col("tokens_cum").alias("t1"), F.col("vocab_cum").alias("v1")
    )
    l_row = rows_out.where(F.col("k") == _HEAPS_CKPTS).select(
        F.col("tokens_cum").alias("t5"), F.col("vocab_cum").alias("v5")
    )
    fit = f_row.crossJoin(l_row).select(
        (
            (F.log(F.col("v5").cast("double")) - F.log(F.col("v1").cast("double")))
            / (F.log(F.col("t5").cast("double")) - F.log(F.col("t1").cast("double")))
        ).alias("beta")
    )
    return rows_out.crossJoin(F.broadcast(fit)).select(
        F.col("k").cast("int").alias("ckpt"),
        F.col("rk_cut").alias("n_docs"),
        "tokens_cum",
        "vocab_cum",
        F.round("beta", 4).alias("heaps_beta"),
    )


@register(
    "q_text_vocab_overlap",
    oracle="""
        WITH tl AS MATERIALIZED (
            SELECT DISTINCT lang, unnest(string_split(text, ' ')) AS tok
            FROM documents
        ),
        sizes AS (
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS nv
            FROM tl GROUP BY lang
        ),
        inter AS (
            SELECT a.lang AS lang_a, b.lang AS lang_b,
                   CAST(COUNT(*) AS BIGINT) AS n_inter
            FROM tl a JOIN tl b
              ON a.tok = b.tok AND a.lang < b.lang
            GROUP BY 1, 2
        )
        SELECT i.lang_a, i.lang_b, i.n_inter,
               sa.nv + sb.nv - i.n_inter AS n_union,
               ROUND(CAST(i.n_inter AS DOUBLE)
                     / (sa.nv + sb.nv - i.n_inter), 6) AS jaccard
        FROM inter i
        JOIN sizes sa ON sa.lang = i.lang_a
        JOIN sizes sb ON sb.lang = i.lang_b
    """,
    section="L23",
    doc="Pairwise VOCABULARY Jaccard between language partitions — the "
    "corpus-level mixture audit that catches mislabeled languages "
    "and cross-lingual contamination at a glance (two 'different' "
    "langs sharing 90% vocabulary = one mislabeled crawl; L3's "
    "per-document langid can't see corpus structure). Distinct "
    "(lang, token) pairs collapse first, so the pair join runs on "
    "the VOCABULARY grain (types, not tokens — Heaps-bounded, "
    "~sqrt of corpus size); intersection/union counts are exact "
    "integers. Scale: one token-key shuffle of the type table; "
    "payload text never joins. The lang domain is small, so the "
    "output is a |langs|^2/2 matrix at any SF.",
)
def q_text_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tl = (
        docs.select(
            "lang", F.explode(F.split(F.col("text"), " ")).alias("tok")
        )
        .distinct()
    )
    sizes = tl.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("nv")
    )
    a = tl.select(F.col("lang").alias("lang_a"), "tok")
    b = tl.select(F.col("lang").alias("lang_b"), F.col("tok").alias("tok_b"))
    inter = (
        a.join(
            b,
            (F.col("tok") == F.col("tok_b"))
            & (F.col("lang_a") < F.col("lang_b")),
        )
        .groupBy("lang_a", "lang_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_inter"))
    )
    sa = sizes.select(F.col("lang").alias("lang_a"), F.col("nv").alias("nva"))
    sb = sizes.select(F.col("lang").alias("lang_b"), F.col("nv").alias("nvb"))
    uni = F.col("nva") + F.col("nvb") - F.col("n_inter")
    return (
        inter.join(F.broadcast(sa), "lang_a")
        .join(F.broadcast(sb), "lang_b")
        .select(
            "lang_a",
            "lang_b",
            "n_inter",
            uni.alias("n_union"),
            F.round(F.col("n_inter").cast("double") / uni, 6).alias(
                "jaccard"
            ),
        )
    )


_COV_SIZES = (100, 500, 2000)


@register(
    "q_text_vocab_coverage",
    oracle=f"""
        WITH occ AS MATERIALIZED (
            SELECT unnest(string_split(text, ' ')) AS tok
            FROM documents
        ),
        counts AS (
            SELECT tok, CAST(COUNT(*) AS BIGINT) AS n
            FROM occ GROUP BY tok
        ),
        ranked AS (
            SELECT n,
                   ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS rk,
                   SUM(n) OVER (ORDER BY n DESC, tok
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum_n
            FROM counts
        ),
        tot AS (
            SELECT CAST(SUM(n) AS BIGINT) AS total_occ,
                   CAST(COUNT(*) AS BIGINT) AS total_types
            FROM counts
        ),
        sizes AS (SELECT unnest([{", ".join(map(str, _COV_SIZES))}]) AS v)
        SELECT CAST(s.v AS INTEGER) AS vocab_size,
               CAST(LEAST(s.v, t.total_types) AS BIGINT) AS n_types_used,
               CAST(MAX(r.cum_n) AS BIGINT) AS occ_covered,
               t.total_occ,
               ROUND(CAST(MAX(r.cum_n) AS DOUBLE) / t.total_occ, 6)
                   AS coverage
        FROM sizes s
        CROSS JOIN tot t
        JOIN ranked r ON r.rk <= s.v
        GROUP BY s.v, t.total_types, t.total_occ
    """,
    section="L24",
    doc="Tokenizer vocabulary-coverage curve: the share of all token "
    "OCCURRENCES covered by the top-100/500/2000 most frequent "
    "types (frequency-ranked, token tie-break) — the budget chooser "
    "for vocabulary size before training a tokenizer (L22's Heaps "
    "curve says how fast types GROW; this says what a fixed budget "
    "BUYS, and the two disagree exactly when the tail is heavy). "
    "The elbow of this curve is where added vocab stops paying for "
    "its embedding rows. One token-key count, one ordered window "
    "over the TYPE table (Heaps-bounded), checkpoint fan-out joins "
    "the 3-row size list — exact integers to the final share "
    "division. Scale: occurrences collapse map-side; everything "
    "ordered runs on types, never tokens.",
)
def q_text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    w = Window.orderBy(F.desc("n"), F.asc("tok"))
    ranked = counts.select(
        "n",
        F.row_number().over(w).alias("rk"),
        F.sum("n")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum_n"),
    )
    tot = counts.agg(
        F.sum("n").cast("bigint").alias("total_occ"),
        F.count(F.lit(1)).cast("bigint").alias("total_types"),
    )
    sizes = spark.createDataFrame([(v,) for v in _COV_SIZES], "v int")
    return (
        F.broadcast(sizes)
        .crossJoin(F.broadcast(tot))
        .join(ranked, F.col("rk") <= F.col("v"))
        .groupBy(
            F.col("v").alias("vocab_size"),
            "total_types",
            "total_occ",
        )
        .agg(
            F.max("cum_n").cast("bigint").alias("occ_covered"),
            F.round(
                F.max("cum_n").cast("double") / F.col("total_occ"), 6
            ).alias("coverage"),
        )
        .select(
            "vocab_size",
            F.least(F.col("vocab_size").cast("bigint"), F.col("total_types"))
            .cast("bigint")
            .alias("n_types_used"),
            "occ_covered",
            "total_occ",
            "coverage",
        )
    )


@register(
    "q_text_hapax_ratio",
    oracle="""
        WITH counts AS (
            SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS n
            FROM (
                SELECT lang, unnest(string_split(text, ' ')) AS tok
                FROM documents
            )
            GROUP BY lang, tok
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_hapax,
               CAST(SUM(CASE WHEN n = 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dis,
               ROUND(CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END)
                          AS DOUBLE) / COUNT(*), 6) AS hapax_ratio
        FROM counts GROUP BY lang
    """,
    section="L25",
    doc="Hapax legomena profile per language partition: types seen "
    "exactly once (and twice — dis legomena), with the hapax share "
    "of the vocabulary — the lexical-richness tail statistic that "
    "L22's Heaps exponent integrates and L7's Zipf slope smooths "
    "over: a NATURAL corpus runs ~40-60% hapax; a templated or "
    "model-generated one collapses the tail (low hapax share at "
    "normal vocab size), and hapax mass is also exactly the "
    "unseen-event mass Good-Turing smoothing (L10's Kneser-Ney "
    "cousin) estimates from. One (lang, token) count, one 5-row "
    "rollup — exact integers to the final share. Scale: the count "
    "table is the vocabulary grain (Heaps-bounded), the only "
    "shuffle.",
)
def q_text_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(
            "lang", F.explode(F.split(F.col("text"), " ")).alias("tok")
        )
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    return counts.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.sum(F.when(F.col("n") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_hapax"),
        F.sum(F.when(F.col("n") == 2, 1).otherwise(0))
        .cast("bigint")
        .alias("n_dis"),
        F.round(
            F.sum(F.when(F.col("n") == 1, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("hapax_ratio"),
    )


_POS_TOP_K = 20


@register(
    "q_text_position_bias",
    oracle=f"""
        WITH ex AS MATERIALIZED (
            SELECT doc_id, u.tok AS tok,
                   CAST(u.i AS BIGINT) AS pos,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
            FROM (
                SELECT doc_id, text,
                       unnest(list_transform(string_split(text, ' '),
                              (t, i) -> struct_pack(tok := t, i := i))) AS u
                FROM documents
            )
        ),
        top AS (
            SELECT tok FROM (
                SELECT tok, COUNT(*) AS n,
                       ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok)
                           AS rk
                FROM ex GROUP BY tok
            ) WHERE rk <= {_POS_TOP_K}
        )
        SELECT e.tok,
               CAST(COUNT(*) AS BIGINT) AS n_occ,
               ROUND(CAST(SUM(CAST(floor((CAST(e.pos AS DOUBLE) - 1)
                                         / (e.n_tok - 1) * 1e9)
                                   AS DECIMAL(38,0))) AS DOUBLE)
                     / 1e9 / COUNT(*), 4) AS mean_rel_pos,
               CAST(SUM(CASE WHEN e.pos = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_doc_initial
        FROM ex e JOIN top t ON e.tok = t.tok
        GROUP BY e.tok
    """,
    section="L26",
    doc=f"Positional bias of the top-{_POS_TOP_K} tokens: mean RELATIVE "
    "position (0 = document start, 1 = end) and document-initial "
    "occurrence counts — the template-structure detector that "
    "complements D21's prefix hash: a frequent token whose mean "
    "position hugs 0 or 1 is boilerplate FURNITURE (headers, "
    "footers, signatures) even when the surrounding prefix varies "
    "enough to defeat exact-prefix hashing, and position-skewed "
    "tokens are what document-BM25 (L5) over-weights when "
    "boilerplate inflates their df. Positions are exact integers "
    "from the ordered explode; relative positions fold through "
    "floor-1e9 DECIMAL sums (rule 10). Scale: one token-key "
    "count + a broadcast top-k join; the explode is the L-family "
    "fan_out shape.",
)
def q_text_position_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ex = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " ")).alias("i", "tok"),
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tok"),
    ).select(
        "doc_id", "tok", (F.col("i") + 1).cast("bigint").alias("pos"), "n_tok"
    )
    top = (
        ex.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "tok",
            F.row_number()
            .over(Window.orderBy(F.desc("n"), F.asc("tok")))
            .alias("rk"),
        )
        .where(F.col("rk") <= _POS_TOP_K)
        .select("tok")
    )
    rel = (F.col("pos").cast("double") - 1) / (F.col("n_tok") - 1)
    return (
        ex.join(F.broadcast(top), "tok")
        .groupBy("tok")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_occ"),
            F.round(
                F.sum(
                    F.floor(rel * 1e9).cast("decimal(38,0)")
                ).cast("double")
                / 1e9
                / F.count(F.lit(1)),
                4,
            ).alias("mean_rel_pos"),
            F.sum(F.when(F.col("pos") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_doc_initial"),
        )
    )


@register(
    "q_text_cochran_q",
    oracle="""
        WITH m AS (
            SELECT doc_id,
                   n_chars,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
                   CAST(len(list_distinct(string_split(text, ' ')))
                        AS BIGINT) AS n_types
            FROM documents
        ),
        med AS (
            SELECT CAST(2 * median(n_chars) AS BIGINT) AS mc2,
                   CAST(2 * median(n_tok) AS BIGINT) AS mt2,
                   CAST(2 * median(n_types) AS BIGINT) AS my2
            FROM m
        ),
        g AS (
            SELECT CASE WHEN 2 * m.n_chars > d.mc2 THEN 1 ELSE 0 END AS g1,
                   CASE WHEN 2 * m.n_tok > d.mt2 THEN 1 ELSE 0 END AS g2,
                   CASE WHEN 2 * m.n_types > d.my2 THEN 1 ELSE 0 END AS g3
            FROM m CROSS JOIN med d
        ),
        s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(g1) AS BIGINT) AS c1,
                   CAST(SUM(g2) AS BIGINT) AS c2,
                   CAST(SUM(g3) AS BIGINT) AS c3,
                   CAST(SUM(g1 + g2 + g3) AS BIGINT) AS sr,
                   CAST(SUM((g1 + g2 + g3) * (g1 + g2 + g3)) AS BIGINT)
                       AS sr2
            FROM g
        )
        SELECT n, c1 AS above_med_chars, c2 AS above_med_tokens,
               c3 AS above_med_types,
               ROUND(2.0 * ((3 * ((c1 * c1 + c2 * c2) + c3 * c3))
                            - CAST(sr AS DOUBLE) * sr)
                     / (3.0 * sr - sr2), 4) AS cochran_q
        FROM s
    """,
    section="L27",
    doc="Cochran's Q over three binary document-quality gates "
    "(above-median chars / tokens / distinct types): do the gates "
    "fire at the same marginal rate, accounting for their within-"
    "document correlation — the k-related-proportions test that "
    "closes the rank-family's binary corner (A45 McNemar is the "
    "k=2 case; Friedman is its ordinal big sibling), and in a "
    "curation pipeline the operational question it answers is "
    "whether one gate in an AND-chain (L15) is doing all the work. "
    "Gate thresholds use the doubled-median device (A13), so every "
    "indicator, column total, and row-sum moment is an exact "
    "integer; Q is one IEEE expression with the explicit "
    "left-nested column fold (rule 10). Scale: one metric collapse "
    "per doc (map-only), one broadcast of 3 medians, one "
    "reduction.",
)
def q_text_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    m = docs.select(
        "n_chars",
        F.size(toks).cast("bigint").alias("n_tok"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_types"),
    )
    med = m.agg(
        F.expr("cast(2 * percentile(n_chars, 0.5) as bigint)").alias("mc2"),
        F.expr("cast(2 * percentile(n_tok, 0.5) as bigint)").alias("mt2"),
        F.expr("cast(2 * percentile(n_types, 0.5) as bigint)").alias("my2"),
    )
    g = m.crossJoin(F.broadcast(med)).select(
        F.when(2 * F.col("n_chars") > F.col("mc2"), 1)
        .otherwise(0)
        .alias("g1"),
        F.when(2 * F.col("n_tok") > F.col("mt2"), 1)
        .otherwise(0)
        .alias("g2"),
        F.when(2 * F.col("n_types") > F.col("my2"), 1)
        .otherwise(0)
        .alias("g3"),
    )
    r = F.col("g1") + F.col("g2") + F.col("g3")
    s = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("g1").cast("bigint").alias("c1"),
        F.sum("g2").cast("bigint").alias("c2"),
        F.sum("g3").cast("bigint").alias("c3"),
        F.sum(r).cast("bigint").alias("sr"),
        F.sum(r * r).cast("bigint").alias("sr2"),
    )
    csq = (
        F.col("c1") * F.col("c1") + F.col("c2") * F.col("c2")
    ) + F.col("c3") * F.col("c3")
    return s.select(
        "n",
        F.col("c1").alias("above_med_chars"),
        F.col("c2").alias("above_med_tokens"),
        F.col("c3").alias("above_med_types"),
        F.round(
            2.0
            * (3 * csq - F.col("sr").cast("double") * F.col("sr"))
            / (3.0 * F.col("sr") - F.col("sr2")),
            4,
        ).alias("cochran_q"),
    )


_DELTA_TOP_K = 15


@register(
    "q_text_burrows_delta",
    oracle=f"""
        WITH occ AS MATERIALIZED (
            SELECT source, unnest(string_split(text, ' ')) AS tok
            FROM documents
        ),
        top AS (
            SELECT tok FROM (
                SELECT tok, COUNT(*) AS n,
                       ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok)
                           AS rk
                FROM occ GROUP BY tok
            ) WHERE rk <= {_DELTA_TOP_K}
        ),
        src_tot AS (
            SELECT source, CAST(COUNT(*) AS BIGINT) AS nt
            FROM occ GROUP BY source
        ),
        freq AS (
            SELECT s.source, t.tok,
                   CAST(COUNT(o.tok) AS BIGINT) AS c,
                   MAX(s2.nt) AS nt
            FROM (SELECT DISTINCT source FROM occ) s
            CROSS JOIN top t
            LEFT JOIN occ o ON o.source = s.source AND o.tok = t.tok
            JOIN src_tot s2 ON s2.source = s.source
            GROUP BY s.source, t.tok
        ),
        rel AS (
            SELECT source, tok,
                   CAST(c AS DOUBLE) / nt AS f
            FROM freq
        ),
        stats AS (
            SELECT tok,
                   CAST(COUNT(*) AS BIGINT) AS k,
                   CAST(SUM(CAST(floor(f * 1e12) AS DECIMAL(38,0)))
                        AS DOUBLE) / 1e12 AS sf,
                   CAST(SUM(CAST(floor(f * f * 1e12) AS DECIMAL(38,0)))
                        AS DOUBLE) / 1e12 AS qf
            FROM rel GROUP BY tok
        ),
        z AS (
            SELECT r.source, r.tok,
                   (r.f - s.sf / s.k)
                   / sqrt((s.qf - s.sf * s.sf / s.k) / (s.k - 1)) AS z
            FROM rel r JOIN stats s ON s.tok = r.tok
        ),
        pairs AS (
            SELECT a.source AS src_a, b.source AS src_b,
                   CAST(SUM(CAST(floor(abs(a.z - b.z) * 1e9)
                                 AS DECIMAL(38,0))) AS DOUBLE) / 1e9
                   / {_DELTA_TOP_K} AS delta
            FROM z a JOIN z b
              ON a.tok = b.tok AND a.source < b.source
            GROUP BY a.source, b.source
        )
        SELECT src_a, src_b, ROUND(delta, 4) AS burrows_delta
        FROM pairs
        ORDER BY delta, src_a, src_b
        LIMIT 10
    """,
    section="L28",
    doc=f"Burrows' Delta stylometric distance between sources over the "
    f"top-{_DELTA_TOP_K} corpus tokens: per-source relative "
    "frequencies z-scored per token across sources, delta = mean "
    "|z difference| per pair, 10 MOST-SIMILAR pairs reported — the "
    "classical authorship-attribution measure, and in a crawl "
    "corpus the provenance-forensics readout (two 'independent' "
    "sources with near-zero Delta share a generator or a mirror, "
    "BEFORE any content-level dedup fires — function-word style "
    "survives paraphrase that defeats D1's token sets). Every "
    "frequency/z fold goes through floor-quantized DECIMAL sums "
    "(rule 10); the pair ranking orders on the rounded-stable "
    "delta with full key tie-breaks. Scale: top-k pivot is "
    "(sources x k) cells; the only corpus-size work is one token "
    "count.",
)
def q_text_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    occ = docs.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    top = (
        occ.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "tok",
            F.row_number()
            .over(Window.orderBy(F.desc("n"), F.asc("tok")))
            .alias("rk"),
        )
        .where(F.col("rk") <= _DELTA_TOP_K)
        .select("tok")
    )
    src_tot = occ.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("nt")
    )
    counts = (
        occ.join(F.broadcast(top), "tok")
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    grid = (
        src_tot.select("source", "nt")
        .crossJoin(F.broadcast(top))
        .join(counts, ["source", "tok"], "left")
        .select(
            "source",
            "tok",
            "nt",
            F.coalesce("c", F.lit(0)).cast("bigint").alias("c"),
        )
    )
    rel = grid.select(
        "source", "tok", (F.col("c").cast("double") / F.col("nt")).alias("f")
    )

    def _q12(c):
        return (
            F.sum(F.floor(c * 1e12).cast("decimal(38,0)")).cast("double")
            / 1e12
        )

    stats = rel.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        _q12(F.col("f")).alias("sf"),
        _q12(F.col("f") * F.col("f")).alias("qf"),
    )
    z = rel.join(F.broadcast(stats), "tok").select(
        "source",
        "tok",
        (
            (F.col("f") - F.col("sf") / F.col("k"))
            / F.sqrt(
                (F.col("qf") - F.col("sf") * F.col("sf") / F.col("k"))
                / (F.col("k") - 1)
            )
        ).alias("z"),
    )
    a = z.select(
        F.col("source").alias("src_a"), "tok", F.col("z").alias("za")
    )
    b = z.select(
        F.col("source").alias("src_b"),
        F.col("tok").alias("tok_b"),
        F.col("z").alias("zb"),
    )
    pairs = (
        a.join(
            b,
            (F.col("tok") == F.col("tok_b"))
            & (F.col("src_a") < F.col("src_b")),
        )
        .groupBy("src_a", "src_b")
        .agg(
            (
                F.sum(
                    F.floor(F.abs(F.col("za") - F.col("zb")) * 1e9).cast(
                        "decimal(38,0)"
                    )
                ).cast("double")
                / 1e9
                / _DELTA_TOP_K
            ).alias("delta")
        )
    )
    return (
        pairs.orderBy("delta", "src_a", "src_b")
        .limit(10)
        .select("src_a", "src_b", F.round("delta", 4).alias("burrows_delta"))
    )


@register(
    "q_text_entropy_rate",
    oracle="""
        WITH toks AS MATERIALIZED (
            SELECT lang, string_split(text, ' ') AS ts
            FROM documents
        ),
        bigrams AS (
            SELECT lang, w1, w2, CAST(COUNT(*) AS BIGINT) AS n12
            FROM (
                SELECT lang,
                       ts[i] AS w1, ts[i + 1] AS w2
                FROM toks, unnest(range(1, len(ts))) AS r(i)
            )
            GROUP BY lang, w1, w2
        ),
        uni AS (
            SELECT lang, w1, CAST(SUM(n12) AS BIGINT) AS n1
            FROM bigrams GROUP BY lang, w1
        ),
        terms AS (
            SELECT b.lang, b.n12, u.n1,
                   CAST(b.n12 AS DOUBLE)
                   * ln(CAST(b.n12 AS DOUBLE) / u.n1) AS t
            FROM bigrams b JOIN uni u
              ON u.lang = b.lang AND u.w1 = b.w1
        )
        SELECT lang,
               CAST(SUM(n12) AS BIGINT) AS n_bigrams,
               ROUND(-(CAST(SUM(CAST(floor(t * 1e6) AS DECIMAL(38,0)))
                            AS DOUBLE) / 1e6) / SUM(n12) / ln(2.0), 4)
                   AS entropy_rate_bits
        FROM terms GROUP BY lang
    """,
    section="L29",
    doc="Conditional entropy rate H(w2|w1) in bits per token, per "
    "language — the PREDICTABILITY scalar on top of L11's Markov "
    "transition matrix and L13's bigram LM (those carry the full "
    "tables; the rate is the one number that says how far a "
    "next-token predictor can possibly compress this corpus, and "
    "a rate collapsing toward 0 at normal vocabulary size is the "
    "signature of templated/machine-generated text from yet "
    "another angle than L22/L25 — the TAIL can look healthy while "
    "the SEQUENCES are deterministic). MLE estimate: sum over "
    "bigrams of n12*ln(n12/n1), folded through floor-1e6 DECIMAL "
    "(rule 10), normalized by bigram count and ln 2. Scale: one "
    "bigram count (the L13 shuffle), one vocabulary-bounded join, "
    "one reduction.",
)
def q_text_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    pairs = docs.select(
        "lang",
        F.posexplode(F.slice(toks, 1, F.size(toks) - 1)).alias("i", "w1"),
        toks.alias("ts"),
    ).select(
        "lang",
        "w1",
        F.element_at(F.col("ts"), F.col("i") + 2).alias("w2"),
    )
    bigrams = pairs.groupBy("lang", "w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("n12")
    )
    uni = bigrams.groupBy("lang", "w1").agg(
        F.sum("n12").cast("bigint").alias("n1")
    )
    terms = bigrams.join(uni, ["lang", "w1"]).select(
        "lang",
        "n12",
        (
            F.col("n12").cast("double")
            * F.log(F.col("n12").cast("double") / F.col("n1"))
        ).alias("t"),
    )
    return terms.groupBy("lang").agg(
        F.sum("n12").cast("bigint").alias("n_bigrams"),
        F.round(
            -(
                F.sum(F.floor(F.col("t") * 1e6).cast("decimal(38,0)")).cast(
                    "double"
                )
                / 1e6
            )
            / F.sum("n12")
            / F.log(F.lit(2.0)),
            4,
        ).alias("entropy_rate_bits"),
    )


# --- L30: boilerplate shingle discovery -------------------------------------

_BP_DF = 3  # a shingle seen in >= 3 distinct docs of a source is boilerplate


@register(
    "q_text_boilerplate_ngrams",
    oracle=f"""
        WITH sh AS (
            SELECT source, doc_id,
                   unnest(list_distinct(list_transform(
                       range(1, greatest(len(string_split(text, ' ')) - 1, 0)
                                + 1),
                       i -> array_to_string(
                           list_slice(string_split(text, ' '), i, i + 1),
                           ' ')))) AS shingle
            FROM documents
        ),
        df AS (
            SELECT source, shingle, CAST(COUNT(*) AS BIGINT) AS df
            FROM sh GROUP BY source, shingle
        ),
        ranked AS (
            SELECT source, shingle, df,
                   ROW_NUMBER() OVER (PARTITION BY source
                                      ORDER BY df DESC, shingle) AS rk
            FROM df
        )
        SELECT d.source,
               CAST(COUNT(*) AS BIGINT) AS n_shingles,
               CAST(SUM(CASE WHEN d.df >= {_BP_DF} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_boilerplate,
               ROUND(SUM(CASE WHEN d.df >= {_BP_DF} THEN 1 ELSE 0 END)
                     / CAST(COUNT(*) AS DOUBLE), 4) AS boilerplate_rate,
               any_value(r.shingle) AS top_shingle,
               any_value(r.df) AS top_df
        FROM df d
        JOIN (SELECT * FROM ranked WHERE rk = 1) r ON r.source = d.source
        GROUP BY d.source
    """,
    section="L30",
    doc="Boilerplate shingle discovery per source: distinct 2-token "
    "shingles per doc, document frequency per source, shingles hitting "
    "df >= 3 flagged as boilerplate with the per-source boilerplate "
    "rate and the top offender — the CCNet-style repeated-fragment "
    "census run BEFORE near-dup passes (boilerplate inflates every "
    "Jaccard/MinHash similarity; L12's chunk dedup removes repeats "
    "WITHIN a doc, this finds fragments repeated ACROSS docs, the "
    "headers/footers/nav text that survives exact dedup). Exact "
    "integer df counts; top-1 totalized by (df DESC, shingle). "
    "Scale: shingling is row-local behind a fan_out; the only "
    "shuffle is the (source, shingle) count agg — map-side "
    "combinable, key space bounded by the live bigram vocabulary; "
    "df >= k for the flag means a sampled-df sketch can replace the "
    "exact count when the vocabulary explodes.",
)
def q_text_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import fan_out

    # r8 (guide §1.2): materialize the tokenization in its own projection
    # so the shingle lambda references a computed column instead of
    # re-splitting text once per element (HOF lambda bodies are not
    # loop-invariant-hoisted). Same shingle arrays.
    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.split(F.col("text"), " ").alias("sp")
    )
    toks = F.col("sp")
    # sequence(1, 0) generates a DESCENDING [1, 0] (not empty!) whose i=0
    # start is an ANSI slice error — short docs must yield an empty array
    shingles = F.when(
        F.size(toks) >= 2,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 1),
                lambda i: F.concat_ws(" ", F.slice(toks, i, F.lit(2))),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    sh = fan_out(docs.select("source", shingles.alias("sh"))).select(
        "source", F.explode("sh").alias("shingle")
    )
    df = sh.groupBy("source", "shingle").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    w = Window.partitionBy("source").orderBy(
        F.col("df").desc(), F.col("shingle")
    )
    top = (
        df.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            F.col("source").alias("t_source"),
            F.col("shingle").alias("top_shingle"),
            F.col("df").alias("top_df"),
        )
    )
    is_bp = F.when(F.col("df") >= _BP_DF, 1).otherwise(0)
    per_src = df.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
        F.sum(is_bp).cast("bigint").alias("n_boilerplate"),
        F.round(
            F.sum(is_bp) / F.count(F.lit(1)).cast("double"), 4
        ).alias("boilerplate_rate"),
    )
    return per_src.join(
        F.broadcast(top), per_src.source == top.t_source
    ).select(
        "source",
        "n_shingles",
        "n_boilerplate",
        "boilerplate_rate",
        "top_shingle",
        "top_df",
    )


# --- L31: mean segmental type-token ratio -----------------------------------

_SEG_LEN = 25  # tokens per MSTTR segment


@register(
    "q_text_msttr",
    oracle=f"""
        WITH segs AS (
            SELECT lang, doc_id,
                   unnest(list_transform(
                       range(0, CAST(floor(len(string_split(text, ' '))
                                           / {_SEG_LEN}.0) AS BIGINT)),
                       s -> len(list_distinct(list_slice(
                                string_split(text, ' '),
                                s * {_SEG_LEN} + 1,
                                s * {_SEG_LEN} + {_SEG_LEN}))))) AS n_types
            FROM documents
        )
        SELECT lang,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(COUNT(*) AS BIGINT) AS n_segments,
               ROUND(SUM(n_types) / ({_SEG_LEN}.0 * COUNT(*)), 6) AS msttr
        FROM segs
        GROUP BY lang
    """,
    section="L31",
    doc="Mean segmental type-token ratio per language: documents split "
    "into fixed 25-token segments (trailing partials dropped), TTR "
    "per segment, segment-pooled mean — the length-INVARIANT lexical "
    "diversity number that raw TTR cannot be (TTR falls with doc "
    "length by Heaps' law, L21; fixed segments remove the "
    "denominator drift, so corpora of different doc lengths compare "
    "fairly). Complements hapax share (L26) and vocab coverage "
    "(L24) as the curation-dashboard diversity column. Exactness: "
    "per-segment type counts are exact integers; ONE division at "
    "the end (sum / 25·n_segments) — no float accumulation. Scale: "
    "segmentation and distinct-counting are row-local (fan_out "
    "before the explode); the only shuffle is the lang-keyed count "
    "agg.",
)
def q_text_msttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import fan_out

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_seg = F.floor(F.size(toks) / float(_SEG_LEN)).cast("bigint")
    seg_types = F.transform(
        F.sequence(F.lit(0), n_seg - 1),
        lambda s: F.size(
            F.array_distinct(
                F.slice(toks, (s * _SEG_LEN + 1).cast("int"), _SEG_LEN)
            )
        ),
    )
    segs = (
        fan_out(docs.select("lang", "doc_id", "text"))
        .where(F.size(toks) >= _SEG_LEN)
        .select("lang", "doc_id", F.explode(seg_types).alias("n_types"))
    )
    return segs.groupBy("lang").agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_segments"),
        F.round(
            F.sum("n_types") / (float(_SEG_LEN) * F.count(F.lit(1))), 6
        ).alias("msttr"),
    )


# ==== wave 133: lexical richness II ================================


@register(
    "q_text_yule_k",
    oracle="""
        WITH counts AS (
            SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS n
            FROM (
                SELECT lang, unnest(string_split(text, ' ')) AS tok
                FROM documents
            )
            GROUP BY lang, tok
        ),
        s AS (
            SELECT lang,
                   CAST(SUM(n) AS BIGINT) AS big_n,
                   CAST(SUM(n * n) AS BIGINT) AS s2,
                   CAST(COUNT(*) AS BIGINT) AS n_types
            FROM counts GROUP BY lang
        )
        SELECT lang, big_n AS n_tokens, n_types,
               ROUND(CAST(s2 - big_n AS DOUBLE) * 10000
                     / (CAST(big_n AS DOUBLE) * CAST(big_n AS DOUBLE)),
                     6) AS yule_k,
               ROUND(CAST(s2 - big_n AS DOUBLE)
                     / (CAST(big_n AS DOUBLE)
                        * CAST(big_n - 1 AS DOUBLE)), 9) AS simpson_d
        FROM s
    """,
    section="L26",
    doc="Yule's characteristic K and Simpson's diversity D per language "
    "partition: K = 10^4(S2 - N)/N^2 with S2 = sum of squared type "
    "frequencies — the repeat-rate statistic that is SIZE-INVARIANT "
    "(unlike TTR/hapax share, K does not drift as the corpus grows), "
    "so it is the cross-corpus comparable knob of the "
    "lexical-richness family (L22 Heaps, L25 hapax, L7 Zipf); "
    "Simpson's D = (S2-N)/(N(N-1)) is the same S2 scalar as the "
    "probability two random tokens are the same type. A high K "
    "flags templated/repetitive text the way L5's repetition score "
    "does, but at the corpus grain. Everything is integer (S2, N) "
    "until two final pinned double divisions — exact. Scale: one "
    "(lang, token) count at the Heaps-bounded vocabulary grain, one "
    "per-lang rollup; the S2 sum is map-combinable.",
)
def q_text_yule_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(
            "lang", F.explode(F.split(F.col("text"), " ")).alias("tok")
        )
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    s = counts.groupBy("lang").agg(
        F.sum("n").cast("bigint").alias("big_n"),
        F.sum(F.col("n") * F.col("n")).cast("bigint").alias("s2"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
    )
    big_n = F.col("big_n").cast("double")
    diff = (F.col("s2") - F.col("big_n")).cast("double")
    return s.select(
        "lang",
        F.col("big_n").alias("n_tokens"),
        "n_types",
        F.round(diff * 10000 / (big_n * big_n), 6).alias("yule_k"),
        F.round(
            diff / (big_n * (F.col("big_n") - 1).cast("double")), 9
        ).alias("simpson_d"),
    )


# ==== wave 142a: unseen-vocabulary extrapolation ===================


@register(
    "q_text_chao1_richness",
    oracle="""
        WITH counts AS (
            SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS n
            FROM (
                SELECT lang, unnest(string_split(text, ' ')) AS tok
                FROM documents
            )
            GROUP BY lang, tok
        ),
        s AS (
            SELECT lang,
                   CAST(COUNT(*) AS BIGINT) AS s_obs,
                   CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS f1,
                   CAST(SUM(CASE WHEN n = 2 THEN 1 ELSE 0 END) AS BIGINT)
                       AS f2
            FROM counts GROUP BY lang
        )
        SELECT lang, s_obs, f1, f2,
               ROUND(CAST(s_obs AS DOUBLE)
                     + CASE WHEN f2 > 0
                            THEN CAST(f1 * f1 AS DOUBLE)
                                 / CAST(2 * f2 AS DOUBLE)
                            ELSE CAST(f1 * (f1 - 1) AS DOUBLE) / 2
                       END, 4) AS chao1,
               ROUND(CASE WHEN f2 > 0
                          THEN CAST(f1 * f1 AS DOUBLE)
                               / CAST(2 * f2 AS DOUBLE)
                          ELSE CAST(f1 * (f1 - 1) AS DOUBLE) / 2
                     END
                     / (CAST(s_obs AS DOUBLE)
                        + CASE WHEN f2 > 0
                               THEN CAST(f1 * f1 AS DOUBLE)
                                    / CAST(2 * f2 AS DOUBLE)
                               ELSE CAST(f1 * (f1 - 1) AS DOUBLE) / 2
                          END), 6) AS unseen_share
        FROM s
    """,
    section="L27",
    doc="Chao1 species-richness estimator per language: how many "
    "vocabulary types does the corpus HAVEN'T seen yet? chao1 = S + "
    "f1^2/(2 f2) from the singleton/doubleton counts L25 already "
    "exposes (bias-corrected f1(f1-1)/2 form when f2 = 0, pinned on "
    "both engines) — the capture-recapture logic of A6 applied to the "
    "type-frequency spectrum, and the quantitative answer to 'will "
    "more data buy more vocabulary?' that L22's Heaps exponent only "
    "trends. unseen_share = estimated-unseen / chao1 is the headline "
    "knob (high => the corpus undersamples its domain). Integer "
    "(S, f1, f2) until two pinned double expressions. Scale: one "
    "(lang, token) count at the Heaps-bounded vocabulary grain, one "
    "5-ish-row rollup.",
)
def q_text_chao1_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(
            "lang", F.explode(F.split(F.col("text"), " ")).alias("tok")
        )
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    s = counts.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("s_obs"),
        F.sum(F.when(F.col("n") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("f1"),
        F.sum(F.when(F.col("n") == 2, 1).otherwise(0))
        .cast("bigint")
        .alias("f2"),
    )
    unseen = F.when(
        F.col("f2") > 0,
        (F.col("f1") * F.col("f1")).cast("double")
        / (2 * F.col("f2")).cast("double"),
    ).otherwise((F.col("f1") * (F.col("f1") - 1)).cast("double") / 2)
    chao1 = F.col("s_obs").cast("double") + unseen
    return s.select(
        "lang",
        "s_obs",
        "f1",
        "f2",
        F.round(chao1, 4).alias("chao1"),
        F.round(unseen / chao1, 6).alias("unseen_share"),
    )


# ==== wave 193a: Hill diversity profile of the source mix (L33) =====


@register(
    "q_text_hill_diversity",
    oracle="""
        WITH mass AS (
            SELECT source,
                   CAST(SUM(len(list_filter(string_split(text, ' '),
                                t -> t <> ''))) AS BIGINT) AS m
            FROM documents GROUP BY source
        ),
        agg AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS s,
                   CAST(SUM(m) AS BIGINT) AS mm,
                   CAST(SUM(m * m) AS BIGINT) AS m2,
                   CAST(SUM(CAST(floor(1e6 * m * ln(CAST(m AS DOUBLE)))
                        AS BIGINT)) AS BIGINT) AS mlnm
            FROM mass
        )
        SELECT s AS n_sources, mm AS total_tokens,
               CAST(s AS DOUBLE) AS hill_q0,
               ROUND(exp(ln(CAST(mm AS DOUBLE))
                     - CAST(mlnm AS DOUBLE) / 1e6 / mm), 4) AS hill_q1,
               ROUND(CAST(mm AS DOUBLE) * mm / m2, 4) AS hill_q2,
               ROUND(exp(ln(CAST(mm AS DOUBLE))
                     - CAST(mlnm AS DOUBLE) / 1e6 / mm)
                     / s, 6) AS evenness
        FROM agg
    """,
    section="L33",
    doc="Hill-number diversity profile of the pretraining source mix "
    "by token mass: q=0 source richness, q=1 exp(Shannon) = the "
    "'effective number of sources' under proportional weighting, "
    "q=2 inverse Simpson = effective sources under "
    "dominance-sensitive weighting — THE data-mixture diversity "
    "readout (a 20-source corpus where one source holds 80% of "
    "tokens has hill_q2 ~ 1.5, and mixture papers report exactly "
    "this collapse); L16 plans a target mix, this measures the mix "
    "you actually have, and evenness = q1/q0 is the single scalar "
    "to alert on. Token masses are exact int64; the Shannon sum "
    "quantizes floor(1e6 * m ln m) per source BEFORE summing "
    "(20 bounded terms, V39 device), and q2 is pure integer "
    "algebra. Scale: one source-grain agg over token counts — "
    "map-side combinable, 20 rows of state.",
)
def q_text_hill_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    mass = docs.groupBy("source").agg(
        F.sum(
            F.size(
                F.filter(
                    F.split(F.col("text"), " "),
                    lambda t: t != "",
                )
            )
        )
        .cast("bigint")
        .alias("m")
    )
    agg = mass.agg(
        F.count(F.lit(1)).cast("bigint").alias("s"),
        F.sum("m").cast("bigint").alias("mm"),
        F.sum(F.col("m") * F.col("m")).cast("bigint").alias("m2"),
        F.sum(
            F.floor(
                F.lit(1e6)
                * F.col("m")
                * F.log(F.col("m").cast("double"))
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("mlnm"),
    )
    h1 = F.exp(
        F.log(F.col("mm").cast("double"))
        - F.col("mlnm").cast("double") / F.lit(1e6) / F.col("mm")
    )
    return agg.select(
        F.col("s").alias("n_sources"),
        F.col("mm").alias("total_tokens"),
        F.col("s").cast("double").alias("hill_q0"),
        F.round(h1, 4).alias("hill_q1"),
        F.round(
            F.col("mm").cast("double") * F.col("mm") / F.col("m2"), 4
        ).alias("hill_q2"),
        F.round(h1 / F.col("s"), 6).alias("evenness"),
    )


# ==== wave 198a: dedup impact on mixture diversity (L34) ============


@register(
    "q_text_dedup_diversity_impact",
    oracle="""
        WITH toks AS (
            SELECT doc_id, source,
                   CAST(len(list_filter(string_split(text, ' '),
                            t -> t <> '')) AS BIGINT) AS m,
                   md5(lower(trim(text))) AS h
            FROM documents
        ),
        keep AS (
            SELECT * FROM (
                SELECT doc_id, source, m,
                       ROW_NUMBER() OVER (PARTITION BY h
                                          ORDER BY doc_id) AS rn
                FROM toks
            ) WHERE rn = 1
        ),
        stage_mass AS (
            SELECT 'raw' AS stage, source,
                   CAST(SUM(m) AS BIGINT) AS mass
            FROM toks GROUP BY source
            UNION ALL
            SELECT 'deduped', source, CAST(SUM(m) AS BIGINT)
            FROM keep GROUP BY source
        ),
        hill AS (
            SELECT stage,
                   CAST(COUNT(*) AS BIGINT) AS n_sources,
                   CAST(SUM(mass) AS BIGINT) AS tokens,
                   CAST(SUM(mass * mass) AS BIGINT) AS m2
            FROM stage_mass GROUP BY stage
        )
        SELECT stage, n_sources, tokens,
               ROUND(CAST(tokens AS DOUBLE) * tokens / m2, 4)
                   AS hill_q2,
               ROUND(CAST(tokens AS DOUBLE) * tokens / m2
                     / n_sources, 6) AS evenness_q2
        FROM hill
    """,
    section="L34",
    doc="Dedup impact on mixture diversity: the effective number of "
    "sources (Hill q=2, inverse Simpson over token mass) BEFORE and "
    "AFTER exact normalized-text dedup — the curation audit L33's "
    "single-shot profile can't answer: dedup preferentially removes "
    "mass from mirror-heavy sources, so the mix you TRAIN on is not "
    "the mix you measured pre-dedup (a diversity DROP after dedup "
    "means the apparent variety was duplicates all along). Dedup is "
    "the U6 device (md5 of lower/trim, min-doc_id winner, one hash "
    "shuffle); per-stage masses and m^2 sums are exact int64, "
    "hill_q2 is pure integer algebra. Scale: one dedup shuffle + "
    "two source-grain aggs — the before/after rides one frame.",
)
def q_text_dedup_diversity_impact(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.size(
            F.filter(F.split(F.col("text"), " "), lambda t: t != "")
        )
        .cast("bigint")
        .alias("m"),
        F.md5(F.lower(F.trim(F.col("text")))).alias("h"),
    )
    keep = (
        toks.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("h").orderBy("doc_id")
            ),
        )
        .where(F.col("rn") == 1)
        .select("source", "m")
    )
    stage_mass = (
        toks.groupBy("source")
        .agg(F.sum("m").cast("bigint").alias("mass"))
        .select(F.lit("raw").alias("stage"), "source", "mass")
        .unionAll(
            keep.groupBy("source")
            .agg(F.sum("m").cast("bigint").alias("mass"))
            .select(
                F.lit("deduped").alias("stage"), "source", "mass"
            )
        )
    )
    hill = stage_mass.groupBy("stage").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sources"),
        F.sum("mass").cast("bigint").alias("tokens"),
        F.sum(F.col("mass") * F.col("mass"))
        .cast("bigint")
        .alias("m2"),
    )
    q2 = (
        F.col("tokens").cast("double") * F.col("tokens") / F.col("m2")
    )
    return hill.select(
        "stage",
        "n_sources",
        "tokens",
        F.round(q2, 4).alias("hill_q2"),
        F.round(q2 / F.col("n_sources"), 6).alias("evenness_q2"),
    )
