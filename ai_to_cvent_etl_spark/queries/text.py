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
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.types import DecimalType


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


# ==== from analytics_r3b ===========================================

@register(
    "q_text_bpe_pairs",
    oracle="""
        WITH tok AS (
            SELECT unnest(string_split(text, ' ')) AS t FROM documents
        ),
        tf AS (
            SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY t
        ),
        pairs AS (
            SELECT unnest(list_transform(range(1, length(t)),
                          i -> substring(t, i, 2))) AS pair,
                   c
            FROM tf WHERE length(t) >= 2
        )
        SELECT pair, CAST(SUM(c) AS BIGINT) AS merge_count
        FROM pairs
        GROUP BY pair
        ORDER BY merge_count DESC, pair
        LIMIT 30
    """,
    section="T9",
    doc="BPE tokenizer-training inner loop, round 1: corpus-weighted "
    "adjacent-character-pair frequencies (the statistic argmaxed by every "
    "byte-pair-encoding merge step). Token frequencies are one keyed "
    "shuffle over exploded tokens; pair extraction then runs on the "
    "DISTINCT-token table (vocabulary-sized, not corpus-sized) — the same "
    "work-sharing real BPE trainers use. All-integer counts, fully "
    "tie-broken top-30 => exact.",
)
def q_text_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(F.split("text", " ")).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pairs = (
        tf.filter(F.length("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(t) - 1),"
                    " i -> substring(t, i, 2))"
                )
            ).alias("pair"),
            "c",
        )
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("c").alias("merge_count"))
        .orderBy(F.desc("merge_count"), F.asc("pair"))
        .limit(30)
    )

# ==== from analytics_r3c ===========================================

_POSTINGS_CAP = 20

@register(
    "q_text_markov_transitions",
    oracle="""
        WITH seq AS (
            SELECT event_type AS from_type,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS to_type
            FROM events
        ),
        pair AS (
            SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM seq WHERE to_type IS NOT NULL
            GROUP BY from_type, to_type
        )
        SELECT from_type, to_type, n,
               CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS n_from,
               CAST(n AS DOUBLE)
                   / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
        FROM pair
    """,
    section="T12",
    doc="First-order Markov next-event transition matrix over per-user "
    "event sequences: lead() window (constant state) -> pair counts -> "
    "row-normalized probabilities. p is one int/int IEEE division — exact "
    "cross-engine. The matrix is |event_types|^2 rows, so every step after "
    "the lead window runs on a bounded table.",
)
def q_text_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pair = (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wf = Window.partitionBy("from_type")
    return pair.select(
        "from_type",
        "to_type",
        "n",
        F.sum("n").over(wf).alias("n_from"),
        (
            F.col("n").cast("double") / F.sum("n").over(wf).cast("double")
        ).alias("p"),
    )

@register(
    "q_text_inverted_index",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
            FROM documents
        ),
        tf AS (
            SELECT token, CAST(COUNT(*) AS BIGINT) AS tf_total
            FROM tok GROUP BY token
        ),
        d AS (SELECT DISTINCT token, doc_id FROM tok),
        dfreq AS (
            SELECT token, CAST(COUNT(*) AS BIGINT) AS df_docs
            FROM d GROUP BY token
        ),
        ranked AS (
            SELECT token, doc_id,
                   row_number() OVER (
                       PARTITION BY token ORDER BY doc_id
                   ) AS rn
            FROM d
        ),
        post AS (
            SELECT token, list(doc_id ORDER BY doc_id) AS postings
            FROM ranked WHERE rn <= {_POSTINGS_CAP}
            GROUP BY token
        )
        SELECT tf.token, tf.tf_total, dfreq.df_docs, post.postings
        FROM tf JOIN dfreq USING (token) JOIN post USING (token)
    """,
    section="T11",
    doc="Inverted index build: token -> document frequency, total term "
    "frequency, and a CAPPED sorted posting-list head (first "
    f"{_POSTINGS_CAP} doc_ids). The cap is the scalable shape: a "
    "stop-token's full posting list is corpus-sized, so the head is "
    "selected by row_number over the DISTINCT (token, doc_id) relation "
    "(bounded per-group output), never by collecting an unbounded set. "
    "Two keyed shuffles (distinct + counts) over the token stream; the "
    "final join runs on vocabulary-sized tables.",
)
def q_text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("token"),
    )
    tf = tok.groupBy("token").agg(F.count(F.lit(1)).alias("tf_total"))
    d = tok.distinct()
    dfreq = d.groupBy("token").agg(F.count(F.lit(1)).alias("df_docs"))
    rn = F.row_number().over(Window.partitionBy("token").orderBy("doc_id"))
    post = (
        d.withColumn("rn", rn)
        .filter(F.col("rn") <= _POSTINGS_CAP)
        .groupBy("token")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("postings"))
    )
    return tf.join(dfreq, "token").join(post, "token")

# ==== from analytics_r3l ===========================================

_ZIPF_TOP = 100

@register(
    "q_text_zipf",
    oracle=f"""
        WITH tok AS (
            SELECT unnest(string_split(text, ' ')) AS tok FROM documents
        ),
        cnt AS (
            SELECT tok, CAST(COUNT(*) AS BIGINT) AS n
            FROM tok WHERE tok <> '' GROUP BY tok
        ),
        ranked AS (
            SELECT tok, n,
                   row_number() OVER (ORDER BY n DESC, tok) AS rnk
            FROM cnt
        ),
        head AS (
            SELECT CAST(ln(CAST(rnk AS DOUBLE)) AS DECIMAL(28,15)) AS x,
                   CAST(ln(CAST(n AS DOUBLE)) AS DECIMAL(28,15)) AS y,
                   CAST(ln(CAST(rnk AS DOUBLE)) * ln(CAST(rnk AS DOUBLE))
                        AS DECIMAL(28,15)) AS xx,
                   CAST(ln(CAST(rnk AS DOUBLE)) * ln(CAST(n AS DOUBLE))
                        AS DECIMAL(28,15)) AS xy
            FROM ranked WHERE rnk <= {_ZIPF_TOP}
        ),
        m AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS cnt,
                   CAST(SUM(x) AS DOUBLE) AS sx,
                   CAST(SUM(y) AS DOUBLE) AS sy,
                   CAST(SUM(xx) AS DOUBLE) AS sxx,
                   CAST(SUM(xy) AS DOUBLE) AS sxy
            FROM head
        )
        SELECT CAST(cnt AS BIGINT) AS n_tokens,
               ROUND((cnt * sxy - sx * sy) / (cnt * sxx - sx * sx), 6)
                   AS zipf_slope,
               ROUND((sy - (cnt * sxy - sx * sy) / (cnt * sxx - sx * sx)
                           * sx) / cnt, 6) AS zipf_intercept
        FROM m
    """,
    section="T13",
    doc=f"Zipf's-law fit over the corpus: token frequencies, deterministic "
    f"rank (count desc, token asc), and an OLS fit of ln(freq) on "
    f"ln(rank) over the top-{_ZIPF_TOP} tokens. Per-row ln() is IEEE "
    "row-local (last-ulp libm noise only); every moment term is "
    "quantized to DECIMAL(28,15) and summed exactly, so the only float "
    "reductions are over already-exact decimals; slope/intercept are "
    "one IEEE formula each, rounded at 6dp. A natural-text corpus fits "
    "slope ≈ -1; the synthetic 31-token corpus fits much shallower — "
    "the fit IS the diagnostic. Corpus collapses to a 100-row head "
    "before any float math.",
)
def q_text_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    cnt = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
    )
    rnk = F.row_number().over(Window.orderBy(F.desc("n"), F.asc("tok")))
    head = (
        cnt.withColumn("rnk", rnk)
        .where(F.col("rnk") <= _ZIPF_TOP)
        .select(
            F.log(F.col("rnk").cast("double")).alias("lx"),
            F.log(F.col("n").cast("double")).alias("ly"),
        )
        .select(
            F.col("lx").cast("decimal(28,15)").alias("x"),
            F.col("ly").cast("decimal(28,15)").alias("y"),
            (F.col("lx") * F.col("lx")).cast("decimal(28,15)").alias("xx"),
            (F.col("lx") * F.col("ly")).cast("decimal(28,15)").alias("xy"),
        )
    )
    m = head.agg(
        F.count("*").cast("double").alias("cnt"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum("xx").cast("double").alias("sxx"),
        F.sum("xy").cast("double").alias("sxy"),
    )
    slope = (F.col("cnt") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("cnt") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return m.select(
        F.col("cnt").cast("long").alias("n_tokens"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("cnt"), 6).alias(
            "zipf_intercept"
        ),
    )

# ==== from analytics_r3n ===========================================

_BM25_TERMS = ("join", "scan", "table")

_BM25_K1 = 1.2

_BM25_B = 0.75

_BM25_TOPK = 20

@register(
    "q_text_bm25",
    oracle=f"""
        WITH docs AS (
            SELECT doc_id, string_split(text, ' ') AS sp,
                   len(string_split(text, ' ')) AS dl
            FROM documents
        ),
        stats AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                   CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                       AS avgdl
            FROM docs
        ),
        terms AS (
            SELECT unnest(['join', 'scan', 'table']) AS term
        ),
        tf AS (
            SELECT d.doc_id, t.term, d.dl,
                   CAST(len(list_filter(d.sp, x -> x = t.term)) AS BIGINT)
                       AS tf
            FROM docs d CROSS JOIN terms t
        ),
        df AS (
            SELECT term, CAST(SUM(CASE WHEN tf > 0 THEN 1 ELSE 0 END)
                              AS DOUBLE) AS df
            FROM tf GROUP BY term
        ),
        scored AS (
            SELECT tf.doc_id, tf.term,
                   ln((s.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
                   * (CAST(tf.tf AS DOUBLE) * ({_BM25_K1} + 1.0))
                   / (CAST(tf.tf AS DOUBLE)
                      + {_BM25_K1} * (1.0 - {_BM25_B}
                                      + {_BM25_B} * tf.dl / s.avgdl))
                       AS score
            FROM tf JOIN df ON df.term = tf.term CROSS JOIN stats s
            WHERE tf.tf > 0
        ),
        ranked AS (
            SELECT doc_id, term, score,
                   row_number() OVER (
                       PARTITION BY term ORDER BY score DESC, doc_id
                   ) AS rnk
            FROM scored
        )
        SELECT term, doc_id, CAST(rnk AS INT) AS rnk,
               ROUND(score, 6) AS bm25
        FROM ranked WHERE rnk <= {_BM25_TOPK}
    """,
    section="T14",
    doc=f"BM25 relevance ranking of the corpus against the fixed query "
    f"terms {_BM25_TERMS} (k1={_BM25_K1}, b={_BM25_B}; the Lucene-style "
    "+1 idf floor): term frequencies via a codegen'd array filter, "
    "document frequencies and avgdl as broadcast-size aggregates, "
    "top-20 docs per term by a rank window. Every input to the score "
    "is an exact integer, so the IEEE score bits are identical "
    "cross-engine and the ranking is deterministic (doc_id tie-break) "
    "with rounding applied only on output. The search-engine scoring "
    "primitive for retrieval-based training-data curation.",
)
def q_text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.split("text", " ").alias("sp"),
        F.size(F.split("text", " ")).alias("dl"),
    )
    stats = docs.agg(
        F.count("*").cast("double").alias("n"),
        (F.sum("dl").cast("double") / F.count("*").cast("double")).alias(
            "avgdl"
        ),
    )
    terms = docs.sparkSession.createDataFrame(
        [(t,) for t in _BM25_TERMS], "term string"
    )
    tf = docs.crossJoin(F.broadcast(terms)).select(
        "doc_id",
        "term",
        "dl",
        F.size(
            F.filter(F.col("sp"), lambda x: x == F.col("term"))
        ).cast("long").alias("tf"),
    )
    df_ = tf.groupBy("term").agg(
        F.sum(F.when(F.col("tf") > 0, 1).otherwise(0))
        .cast("double")
        .alias("df")
    )
    t = F.col("tf").cast("double")
    idf = F.log(
        (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    score = idf * (t * (_BM25_K1 + 1.0)) / (
        t + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.where(F.col("tf") > 0)
        .join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "term", score.alias("score"))
    )
    rnk = F.row_number().over(
        Window.partitionBy("term").orderBy(F.desc("score"), F.asc("doc_id"))
    )
    return (
        scored.withColumn("rnk", rnk)
        .where(F.col("rnk") <= _BM25_TOPK)
        .select("term", "doc_id", F.col("rnk").cast("int"), F.round("score", 6).alias("bm25"))
    )

# ==== from analytics_r3t ===========================================

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
    # r8 (guide §1.2): pre-split tokenization into its own projection so
    # the trigram lambda references a computed column instead of
    # re-splitting text per element (HOF lambda bodies are not
    # loop-invariant-hoisted). Same trigrams.
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("sp")
    )
    toks = F.col("sp")
    tri = F.transform(
        # greatest(...,0): docs shorter than 3 tokens have no trigrams
        # (negative slice length is an ANSI runtime error)
        F.slice(toks, 1, F.greatest(F.size(toks) - 2, F.lit(0))),
        lambda x, i: F.concat_ws(
            " ",
            x,
            F.element_at(toks, i + 2),
            F.element_at(toks, i + 3),
        ),
    )
    # r8 (guide §2.3): shuffle keys, not payloads. The trigram STRING
    # (~25 UTF8 bytes) used to cross three exchanges (distinct, the
    # first-seen agg, and a gram-keyed join back) although it never
    # appears in the output — only per-doc counts do. Two changes, same
    # result set:
    #   * grams dedupe/aggregate on xxhash64(gram) — 8 fixed bytes per
    #     key (the near-dup verify's device; a 64-bit collision between
    #     DISTINCT grams would be needed to move a count: P ~ n^2/2^65,
    #     ~3e-10 at sf0.1, and the oracle hash pins exactness on every
    #     checked fixture);
    #   * the gram-keyed join is replaced by two independent per-doc
    #     aggregates — n_grams = |distinct grams of doc|, n_novel =
    #     |grams whose min-doc is doc| (algebraically identical), joined
    #     at DOC grain (corpus-bounded small) instead of gram grain.
    grams = (
        docs.select(
            "doc_id",
            F.explode(F.transform(tri, lambda x: F.xxhash64(x))).alias("g"),
        )
        .distinct()
    )
    n_grams = grams.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams")
    )
    n_novel = (
        grams.groupBy("g")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_novel"))
    )
    return (
        n_grams.join(n_novel, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_grams").cast("bigint").alias("n_grams"),
            F.coalesce(F.col("n_novel"), F.lit(0))
            .cast("bigint")
            .alias("n_novel"),
            F.round(
                F.coalesce(F.col("n_novel"), F.lit(0)).cast("double")
                / F.col("n_grams"),
                6,
            ).alias("novelty"),
        )
    )

# ==== from analytics_r4n ===========================================

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


# ==== forty-eighth wave (r4) ==================================================


@register(
    "q_text_complexity",
    oracle="""
        WITH toks AS (
            SELECT lang, doc_id, t.tok AS tok
            FROM (SELECT lang, doc_id, unnest(string_split(text, ' ')) AS tok
                  FROM documents) t
        ),
        s AS (
            SELECT lang,
                   CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
                   CAST(COUNT(*) AS BIGINT) AS total_words,
                   CAST(SUM(length(tok)) AS BIGINT) AS total_chars,
                   CAST(SUM(CASE WHEN length(tok) >= 7 THEN 1 ELSE 0 END)
                        AS BIGINT) AS long_words,
                   CAST(SUM(length(regexp_extract_all(tok, '[aeiouy]+')))
                        AS BIGINT) AS total_syll,
                   CAST(COUNT(DISTINCT tok) AS BIGINT) AS distinct_words
            FROM toks
            GROUP BY lang
        )
        SELECT lang, n_docs, total_words,
               ROUND(total_words / (1.0 * n_docs), 4) AS words_per_doc,
               ROUND(total_chars / (1.0 * total_words), 4) AS avg_word_len,
               ROUND(long_words / (1.0 * total_words), 6) AS long_word_ratio,
               ROUND(total_syll / (1.0 * total_words), 4) AS syllables_per_word,
               ROUND(distinct_words / (1.0 * total_words), 6) AS type_token_ratio
        FROM s
    """,
    section="T17",
    doc="Lexical-complexity quality signals per language: words/doc, mean "
    "word length, >=7-char long-word ratio (the LIX ingredient), vowel-"
    "cluster syllables per word ([aeiouy]+ runs — the standard cheap "
    "syllable estimator under Flesch-Kincaid), and type-token ratio. "
    "These are the readability-formula ingredients emitted raw — "
    "sentence-based formulas (FK/LIX proper) degenerate on this "
    "punctuation-free synthetic corpus (FIXTURES.md), and raw "
    "ingredients are what real pretraining quality gates threshold on "
    "anyway (Gopher/C4-style rules: mean word length bands, symbol "
    "ratios). Every metric is a ratio of exact BIGINT corpus sums with "
    "ONE final double division + ROUND — no float accumulation (§5.3 "
    "rule 10 by construction). Scale: one explode over tokens feeding "
    "ONE map-side-combinable keyed agg on a 5-value key; the two "
    "COUNT(DISTINCT)s expand to the standard two-level agg on "
    "(lang, doc_id)/(lang, tok) — bounded keys, no skew concern.",
)
def q_text_complexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang", "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    s = toks.groupBy("lang").agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("total_words"),
        F.sum(F.length("tok")).cast("bigint").alias("total_chars"),
        F.sum(
            F.when(F.length("tok") >= 7, 1).otherwise(0)
        ).cast("bigint").alias("long_words"),
        F.sum(
            F.size(F.expr("regexp_extract_all(tok, '[aeiouy]+', 0)"))
        ).cast("bigint").alias("total_syll"),
        F.countDistinct("tok").cast("bigint").alias("distinct_words"),
    )
    return s.select(
        "lang",
        "n_docs",
        "total_words",
        F.round(F.col("total_words") / (1.0 * F.col("n_docs")), 4).alias(
            "words_per_doc"
        ),
        F.round(F.col("total_chars") / (1.0 * F.col("total_words")), 4).alias(
            "avg_word_len"
        ),
        F.round(F.col("long_words") / (1.0 * F.col("total_words")), 6).alias(
            "long_word_ratio"
        ),
        F.round(F.col("total_syll") / (1.0 * F.col("total_words")), 4).alias(
            "syllables_per_word"
        ),
        F.round(
            F.col("distinct_words") / (1.0 * F.col("total_words")), 6
        ).alias("type_token_ratio"),
    )


@register(
    "q_text_burstiness",
    oracle="""
        WITH toks AS (
            SELECT doc_id, t.tok AS tok
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                  FROM documents WHERE lang = 'en') t
        ),
        dc AS (
            SELECT tok, doc_id, CAST(COUNT(*) AS BIGINT) AS c
            FROM toks GROUP BY tok, doc_id
        ),
        nd AS (
            SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS d
            FROM toks
        ),
        term AS (
            SELECT tok,
                   CAST(COUNT(*) AS BIGINT) AS df,
                   CAST(SUM(c) AS BIGINT) AS tw,
                   CAST(SUM(c * c) AS BIGINT) AS sq
            FROM dc GROUP BY tok
        )
        SELECT tok AS term, df, tw AS total_count,
               ROUND((d * sq - tw * tw) / (1.0 * d * tw), 4) AS burstiness
        FROM term CROSS JOIN nd
        WHERE df >= 5
        ORDER BY (d * sq - tw * tw) / (1.0 * d * tw) DESC, tok
        LIMIT 20
    """,
    section="T18",
    doc="Term burstiness (Church/Gale): the variance-to-mean ratio of "
    "per-document counts across the English corpus, zeros included — "
    "VMR 1 means Poisson scatter (function words), VMR >> 1 means the "
    "term CLUMPS into few documents (topical/boilerplate terms; the "
    "statistic AI-text detectors and keyword extractors both lean "
    "on, complementing TF-IDF's df-only view with the within-doc "
    "clumping signal). Absent-doc zeros contribute nothing to the "
    "sums, so VMR = (D·Σc² − (Σc)²)/(D·Σc) is ONE exact BIGINT "
    "numerator over one division — no per-doc zero materialization "
    "(the corpus-size-free trick that matters at scale: a V×D dense "
    "grid is never built). Top-20 by QUANTIZED-free exact ordering "
    "(the sort key is the same exact rational both engines compute "
    "identically; ties break on the term). Scale: two keyed integer "
    "aggs ((term, doc) then term — both map-side combinable) and a "
    "top-k over VOCABULARY-sized rows.",
)
def q_text_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    dc = toks.groupBy("tok", "doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    nd = toks.agg(F.countDistinct("doc_id").cast("bigint").alias("d"))
    term = dc.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.sum("c").cast("bigint").alias("tw"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("sq"),
    )
    vmr = (
        F.col("d") * F.col("sq") - F.col("tw") * F.col("tw")
    ) / (1.0 * F.col("d") * F.col("tw"))
    return (
        term.crossJoin(F.broadcast(nd))
        .filter(F.col("df") >= 5)
        .orderBy(vmr.desc(), F.col("tok").asc())
        .limit(20)
        .select(
            F.col("tok").alias("term"),
            "df",
            F.col("tw").alias("total_count"),
            F.round(vmr, 4).alias("burstiness"),
        )
    )


@register(
    "q_text_context_length_bins",
    oracle="""
        WITH binned AS (
            SELECT LENGTH(bin(n_chars)) AS len_bin,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS bin_chars
            FROM documents
            WHERE n_chars > 0
            GROUP BY 1
        )
        SELECT CAST(len_bin AS INTEGER) AS len_bin,
               n_docs, bin_chars,
               ROUND(CAST(SUM(bin_chars) OVER (ORDER BY len_bin)
                          AS DOUBLE)
                     / (SELECT SUM(bin_chars) FROM binned), 6)
                   AS cum_char_share
        FROM binned
    """,
    section="T17",
    doc="Context-length histogram on power-of-two bins with cumulative "
    "char share — the feasibility report for sequence packing: which "
    "context window covers what fraction of the corpus volume. The "
    "bin index is LENGTH(bin(n)) = floor(log2 n)+1, computed via the "
    "binary-string length on BOTH engines — integer-exact at exact "
    "powers of two, where floor(log2(double)) could round either "
    "way (the classic FP-boundary trap this device avoids). Counts "
    "and char sums are exact BIGINT; the cumulative share is one "
    "rounded division per bin over a ~10-row window. Scale: one "
    "map-combinable groupBy on the bin key; the window runs on "
    "~10 rows on the driver-side-sized partition — nothing else "
    "shuffles.",
)
def q_text_context_length_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("n_chars") > 0
    )
    binned = docs.groupBy(
        F.length(F.bin("n_chars")).cast("int").alias("len_bin")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("bin_chars"),
    )
    tot = binned.agg(F.sum("bin_chars").cast("double").alias("tot"))
    w = Window.orderBy("len_bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        binned.crossJoin(F.broadcast(tot))
        .select(
            "len_bin",
            "n_docs",
            "bin_chars",
            F.round(
                F.sum("bin_chars").over(w).cast("double") / F.col("tot"),
                6,
            ).alias("cum_char_share"),
        )
    )


# ---------------------------------------------------------------------------
# Wave 122 (r5): TextRank keyword extraction (graph-over-text composite).
# ---------------------------------------------------------------------------

_TR_LANG = "en"
_TR_WINDOW = 2
_TR_DAMP_NUM, _TR_DAMP_DEN = 85, 100  # d = 0.85 as an exact ratio
_TR_TOPK = 10


@register(
    "q_text_textrank",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(string_split(text, ' ')) AS tok,
                   unnest(range(1, len(string_split(text, ' ')) + 1))
                       AS pos
            FROM documents WHERE lang = '{_TR_LANG}'
        ),
        edges AS (
            SELECT a.tok AS src, b.tok AS dst,
                   CAST(COUNT(*) AS BIGINT) AS w
            FROM toks a JOIN toks b
              ON a.doc_id = b.doc_id
             AND b.pos - a.pos BETWEEN 1 AND {_TR_WINDOW}
             AND a.tok <> b.tok
            GROUP BY 1, 2
        ),
        und AS (
            SELECT src, dst, CAST(SUM(w) AS BIGINT) AS w FROM (
                SELECT src, dst, w FROM edges
                UNION ALL
                SELECT dst AS src, src AS dst, w FROM edges
            ) GROUP BY src, dst
        ),
        deg AS (
            SELECT src, CAST(SUM(w) AS BIGINT) AS wdeg
            FROM und GROUP BY src
        ),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nv FROM deg),
        r1 AS (
            SELECT u.dst AS tok,
                   CAST({_TR_DAMP_DEN - _TR_DAMP_NUM} AS DOUBLE)
                       / {_TR_DAMP_DEN} / n.nv
                   + CAST({_TR_DAMP_NUM} AS DOUBLE) / {_TR_DAMP_DEN}
                     * CAST(SUM(CAST(floor(
                           (CAST(u.w AS DOUBLE) / d.wdeg / n.nv) * 1e12
                       ) AS DECIMAL(38,0))) AS DOUBLE) / 1e12 AS pr
            FROM und u
            JOIN deg d ON u.src = d.src
            CROSS JOIN n
            GROUP BY u.dst, n.nv
        ),
        r2 AS (
            SELECT u.dst AS tok,
                   CAST({_TR_DAMP_DEN - _TR_DAMP_NUM} AS DOUBLE)
                       / {_TR_DAMP_DEN} / n.nv
                   + CAST({_TR_DAMP_NUM} AS DOUBLE) / {_TR_DAMP_DEN}
                     * CAST(SUM(CAST(floor(
                           (CAST(u.w AS DOUBLE) / d.wdeg * r1.pr) * 1e12
                       ) AS DECIMAL(38,0))) AS DOUBLE) / 1e12 AS pr
            FROM und u
            JOIN deg d ON u.src = d.src
            JOIN r1 ON r1.tok = u.src
            CROSS JOIN n
            GROUP BY u.dst, n.nv
        )
        SELECT tok, ROUND(pr, 6) AS textrank
        FROM (
            SELECT *, row_number() OVER (
                ORDER BY pr DESC, tok) AS rn
            FROM r2
        ) WHERE rn <= {_TR_TOPK}
    """,
    section="T18",
    doc=f"TextRank keyword extraction over the '{_TR_LANG}' corpus: "
    f"co-occurrence edges (tokens within {_TR_WINDOW} positions), "
    "two unrolled rounds of weighted PageRank "
    f"(d={_TR_DAMP_NUM}/{_TR_DAMP_DEN}), top-{_TR_TOPK} keywords — "
    "Mihalcea-Tarau's graph-based keyphrase primitive, composing "
    "the G-family's relational PageRank rounds with the T-family's "
    "positional tokenization. Each round's neighbor sum goes "
    "through the floor-1e12 DECIMAL fold (rule 10), so the "
    "accumulation is order-free and the round-2 ranking "
    "deterministic; edge weights and degrees are exact BIGINT; "
    "the damping mix uses exact integer ratios. Scale: the word "
    "graph is vocabulary-sized (tiny vs the corpus); the only "
    "fact-sized stage is the position self-join, which is "
    "doc-local (joins on doc_id + bounded offset); each PageRank "
    "round is one keyed join-agg over vocab-grain rows — the V16 "
    "unrolled-iteration device, 2 rounds suffice for keyword "
    "separation (documented TextRank practice).",
)
def q_text_textrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import fan_out

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("lang") == _TR_LANG
    )
    toks = fan_out(docs).select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos0", "tok"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    a = toks.select(
        F.col("doc_id").alias("da"),
        F.col("pos").alias("pa"),
        F.col("tok").alias("src"),
    )
    b = toks.select(
        F.col("doc_id").alias("db"),
        F.col("pos").alias("pb"),
        F.col("tok").alias("dst"),
    )
    edges = (
        a.join(
            b,
            (F.col("da") == F.col("db"))
            & (F.col("pb") - F.col("pa")).between(1, _TR_WINDOW)
            & (F.col("src") != F.col("dst")),
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    )
    und = (
        edges.select("src", "dst", "w")
        .unionAll(
            edges.select(
                F.col("dst").alias("src"),
                F.col("src").alias("dst"),
                "w",
            )
        )
        .groupBy("src", "dst")
        .agg(F.sum("w").cast("bigint").alias("w"))
    )
    deg = und.groupBy("src").agg(
        F.sum("w").cast("bigint").alias("wdeg")
    )
    n = deg.agg(F.count(F.lit(1)).cast("bigint").alias("nv"))
    base = (
        F.lit(float(_TR_DAMP_DEN - _TR_DAMP_NUM))
        / _TR_DAMP_DEN
        / F.col("nv")
    )
    damp = F.lit(float(_TR_DAMP_NUM)) / _TR_DAMP_DEN

    def fold(expr):
        return (
            F.sum(F.floor(expr * 1e12).cast("decimal(38,0)")).cast(
                "double"
            )
            / 1e12
        )

    ud = und.join(deg, "src")
    r1 = (
        ud.crossJoin(F.broadcast(n))
        .groupBy(F.col("dst").alias("tok"), "nv")
        .agg(
            fold(
                F.col("w").cast("double") / F.col("wdeg") / F.col("nv")
            ).alias("acc")
        )
        .select("tok", (base + damp * F.col("acc")).alias("pr"))
    )
    r2 = (
        ud.join(r1.withColumnRenamed("tok", "src"), "src")
        .crossJoin(F.broadcast(n))
        .groupBy(F.col("dst").alias("tok"), "nv")
        .agg(
            fold(
                F.col("w").cast("double") / F.col("wdeg") * F.col("pr")
            ).alias("acc")
        )
        .select("tok", (base + damp * F.col("acc")).alias("pr"))
    )
    return (
        r2.withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy(F.col("pr").desc(), "tok")
            ),
        )
        .where(F.col("rn") <= _TR_TOPK)
        .select("tok", F.round("pr", 6).alias("textrank"))
    )


# ==== wave 150b: dedup's distributional side-effect ================


@register(
    "q_dedup_mix_shift",
    oracle="""
        WITH raw AS (
            SELECT doc_id, source,
                   lower(trim(regexp_replace(text, ' +', ' ', 'g')))
                       AS norm
            FROM documents
        ),
        keep AS (
            SELECT MIN(doc_id) AS doc_id, arg_min(source, doc_id) AS k_source
            FROM raw GROUP BY norm
        ),
        pre AS (
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_pre
            FROM raw GROUP BY source
        ),
        post AS (
            SELECT k.k_source AS source, CAST(COUNT(*) AS BIGINT) AS n_post
            FROM keep k GROUP BY k.k_source
        ),
        tot AS (
            SELECT (SELECT CAST(SUM(n_pre) AS BIGINT) FROM pre) AS t_pre,
                   (SELECT CAST(SUM(n_post) AS BIGINT) FROM post) AS t_post
        )
        SELECT p.source, p.n_pre,
               CAST(COALESCE(q.n_post, 0) AS BIGINT) AS n_post,
               CAST(p.n_pre - COALESCE(q.n_post, 0) AS BIGINT) AS n_removed,
               ROUND(CAST(p.n_pre AS DOUBLE) / t.t_pre, 6) AS share_pre,
               ROUND(CAST(COALESCE(q.n_post, 0) AS DOUBLE) / t.t_post, 6)
                   AS share_post,
               ROUND(CAST(COALESCE(q.n_post, 0) AS DOUBLE) / t.t_post
                     - CAST(p.n_pre AS DOUBLE) / t.t_pre, 6)
                   AS share_shift
        FROM pre p LEFT JOIN post q ON p.source = q.source
        CROSS JOIN tot t
    """,
    section="D17",
    doc="Dedup's distributional side-effect, per source: corpus mix "
    "BEFORE vs AFTER exact dedup (U6's normalize-and-keep-min rule, "
    "with the kept doc's source attributed via min_by/arg_min on "
    "doc_id — ANY_VALUE would be nondeterministic when a norm group "
    "spans sources, which is exactly the cross-source case that "
    "matters here) — the audit "
    "LLM-data teams run because dedup is never mix-neutral: "
    "templated/mirrored sources lose disproportionate mass, so the "
    "post-dedup mixture silently drifts from the curated target "
    "(E-family temperature_resample then has to re-weight from "
    "THESE numbers, and D14's source_matrix shows WHERE the removed "
    "mass collided). All counts integer; shares are one division "
    "each. Scale: one 16-byte-key dedup shuffle + two source-grain "
    "rollups — nothing beyond D10's existing shape.",
)
def q_dedup_mix_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    raw = docs.select(
        "doc_id",
        "source",
        F.lower(
            F.trim(F.regexp_replace(F.col("text"), " +", " "))
        ).alias("norm"),
    )
    keep_w = Window.partitionBy("norm")
    keep = (
        raw.groupBy("norm")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min_by("source", "doc_id").alias("k_source"),
        )
    )
    pre = raw.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pre")
    )
    post = keep.groupBy(F.col("k_source").alias("source")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_post")
    )
    tot = pre.agg(F.sum("n_pre").cast("bigint").alias("t_pre")).crossJoin(
        post.agg(F.sum("n_post").cast("bigint").alias("t_post"))
    )
    j = pre.join(post, "source", "left").crossJoin(F.broadcast(tot))
    npost = F.coalesce(F.col("n_post"), F.lit(0))
    return j.select(
        "source",
        "n_pre",
        npost.cast("bigint").alias("n_post"),
        (F.col("n_pre") - npost).cast("bigint").alias("n_removed"),
        F.round(
            F.col("n_pre").cast("double") / F.col("t_pre"), 6
        ).alias("share_pre"),
        F.round(npost.cast("double") / F.col("t_post"), 6).alias(
            "share_post"
        ),
        F.round(
            npost.cast("double") / F.col("t_post")
            - F.col("n_pre").cast("double") / F.col("t_pre"),
            6,
        ).alias("share_shift"),
    )


# ==== wave 157a: winnowing fingerprint matching ====================

_WIN_W = 4  # winnow window (positions)
_WIN_MIN_SHARED = 2


@register(
    "q_dedup_winnowing",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, CAST(u.i AS BIGINT) AS pos, u.tok
            FROM (
                SELECT doc_id,
                       unnest(list_transform(string_split(text, ' '),
                           (t, i) -> struct_pack(tok := t, i := i))) AS u
                FROM documents
            )
        ),
        grams AS (
            SELECT doc_id, pos,
                   CAST(('0x' || substr(md5(tok || ' ' || t2 || ' ' || t3),
                                        1, 12)) AS BIGINT) AS h
            FROM (
                SELECT doc_id, pos, tok,
                       LEAD(tok, 1) OVER w AS t2,
                       LEAD(tok, 2) OVER w AS t3
                FROM toks
                WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
            ) WHERE t3 IS NOT NULL
        ),
        winnowed AS (
            SELECT DISTINCT doc_id, fp_h
            FROM (
                SELECT doc_id,
                       MIN(struct_pack(h := h, np := -pos)) OVER (
                           PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN {_WIN_W - 1} PRECEDING
                           AND CURRENT ROW
                       ).h AS fp_h,
                       CAST(COUNT(*) OVER (
                           PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN {_WIN_W - 1} PRECEDING
                           AND CURRENT ROW
                       ) AS BIGINT) AS k
                FROM grams
            ) WHERE k = {_WIN_W}
        ),
        pairs AS (
            SELECT a.doc_id AS doc_lo, b.doc_id AS doc_hi,
                   CAST(COUNT(*) AS BIGINT) AS n_shared
            FROM winnowed a JOIN winnowed b
              ON a.fp_h = b.fp_h AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT doc_lo, doc_hi, n_shared
        FROM pairs WHERE n_shared >= {_WIN_MIN_SHARED}
    """,
    section="D18",
    doc=f"Winnowing fingerprint matching (Schleimer-Wilkerson-Aiken, "
    "the MOSS algorithm): word-3-gram hashes per position, then each "
    f"{_WIN_W}-position window keeps its MINIMUM hash (ties to the "
    "rightmost via min over (h, -pos) structs) — the selection with "
    "the LOCAL guarantee MinHash lacks: any shared run of at least "
    f"w+k-1 tokens is provably caught, so it finds partial/ "
    "passage-level overlap where D1 (whole-document Jaccard) and "
    "T-family fingerprint (one global min = 1-perm MinHash) see "
    "nothing; pairs sharing >= {_WIN_MIN_SHARED} selected prints "
    "emit with their overlap count. Hashes are 48-bit md5 prefixes "
    "(int64 compares, both engines); the windowed struct-min is the "
    "TS30 argmax device. Scale: winnowing emits ~n/w prints per doc "
    "(density guarantee), the join keys on print hash — bucketed by "
    "construction like D1's bands, no all-pairs stage.",
)
def q_dedup_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "tok")
    )
    wd = Window.partitionBy("doc_id").orderBy("pos")
    grams = (
        toks.withColumn("t2", F.lead("tok", 1).over(wd))
        .withColumn("t3", F.lead("tok", 2).over(wd))
        .where(F.col("t3").isNotNull())
        .select(
            "doc_id",
            "pos",
            F.expr(
                "cast(conv(substr(md5(concat(tok, ' ', t2, ' ', t3)), "
                "1, 12), 16, 10) as bigint)"
            ).alias("h"),
        )
    )
    ww = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        -(_WIN_W - 1), 0
    )
    winnowed = (
        grams.select(
            "doc_id",
            F.min(F.struct(F.col("h"), (-F.col("pos")).alias("np")))
            .over(ww)
            .getField("h")
            .alias("fp_h"),
            F.count(F.lit(1)).over(ww).cast("bigint").alias("k"),
        )
        .where(F.col("k") == _WIN_W)
        .select("doc_id", "fp_h")
        .distinct()
    )
    a = winnowed.select(F.col("doc_id").alias("doc_lo"), "fp_h")
    b = winnowed.select(F.col("doc_id").alias("doc_hi"), F.col("fp_h").alias("fp2"))
    return (
        a.join(
            b,
            (F.col("fp_h") == F.col("fp2"))
            & (F.col("doc_lo") < F.col("doc_hi")),
        )
        .groupBy("doc_lo", "doc_hi")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .where(F.col("n_shared") >= _WIN_MIN_SHARED)
    )


# ==== wave 172b: BPE round 2 — apply the merge, recount =============


@register(
    "q_text_bpe_round2",
    oracle="""
        WITH tok AS (
            SELECT unnest(string_split(text, ' ')) AS t FROM documents
        ),
        tf AS (
            SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY t
        ),
        p1 AS (
            SELECT unnest(list_transform(range(1, length(t)),
                          i -> substring(t, i, 2))) AS pair, c
            FROM tf WHERE length(t) >= 2
        ),
        best AS (
            SELECT pair AS bp,
                   substring(pair, 1, 1) AS bx,
                   substring(pair, 2, 1) AS by
            FROM (
                SELECT pair, SUM(c) AS mc FROM p1 GROUP BY pair
                ORDER BY mc DESC, pair LIMIT 1
            )
        ),
        chars AS (
            SELECT tf.t, tf.c, u.i AS pos,
                   substring(tf.t, CAST(u.i AS INTEGER), 1) AS ch,
                   b.bp, b.bx, b.by
            FROM tf CROSS JOIN best b
            CROSS JOIN unnest(range(1, length(tf.t) + 1)) AS u(i)
        ),
        cands AS (
            SELECT t, c, pos, ch, bp, bx, by,
                   substring(t, CAST(pos AS INTEGER), 2) = bp AS cand,
                   CASE WHEN ch = bx THEN pos - ROW_NUMBER() OVER (
                       PARTITION BY t, (ch = bx) ORDER BY pos)
                   END AS isl
            FROM chars
        ),
        runs AS (
            SELECT t, c, pos, ch, bp, bx, by, cand,
                   CASE WHEN isl IS NOT NULL THEN
                       MIN(pos) OVER (PARTITION BY t, isl) END AS s
            FROM cands
        ),
        taken AS (
            SELECT t, c, pos, ch, bp,
                   cand AND (bx <> by OR (pos - s) % 2 = 0) AS tk
            FROM runs
        ),
        kept AS (
            SELECT t, c, pos,
                   CASE WHEN tk THEN bp ELSE ch END AS sym
            FROM (
                SELECT t, c, pos, ch, bp, tk,
                       COALESCE(LAG(tk) OVER (
                           PARTITION BY t ORDER BY pos), FALSE) AS consumed
                FROM taken
            ) WHERE NOT consumed
        ),
        p2 AS (
            SELECT sym || '+' || LEAD(sym) OVER (
                       PARTITION BY t ORDER BY pos) AS pair,
                   c
            FROM kept
        )
        SELECT pair, CAST(SUM(c) AS BIGINT) AS merge_count
        FROM p2 WHERE pair IS NOT NULL
        GROUP BY pair
        ORDER BY merge_count DESC, pair
        LIMIT 30
    """,
    section="T17",
    doc="BPE tokenizer training, round 2: APPLY the round-1 argmax "
    "merge across the vocabulary and recount adjacent-SYMBOL pairs "
    "— the step that makes BPE iterative, expressed relationally: "
    "greedy left-to-right merging is branch-free because when the "
    "best pair's halves differ, candidate sites can never overlap, "
    "and when they are equal (an 'xx' merge) the greedy choice is "
    "exactly the even offsets within each maximal run — a "
    "gaps-and-islands row_number device resolves run starts, one "
    "parity compare picks the survivors, and a LAG drops the "
    "consumed right halves. Round-2 pairs join symbols with '+' so "
    "('ab','c') never collides with ('a','bc'). All work past the "
    "one corpus token-frequency shuffle runs on the DISTINCT-token "
    "table (vocabulary-sized — the work-sharing trick real BPE "
    "trainers use), so 100 TB of text costs one keyed agg plus a "
    "vocab-local round. Fully tie-broken top-30, all integer.",
)
def q_text_bpe_round2(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(F.split("text", " ")).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=False)
    )
    p1 = tf.where(F.length("t") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(t) - 1),"
                " i -> substring(t, i, 2))"
            )
        ).alias("pair"),
        "c",
    )
    best = (
        p1.groupBy("pair")
        .agg(F.sum("c").alias("mc"))
        .orderBy(F.col("mc").desc(), F.col("pair"))
        .limit(1)
        .select(
            F.col("pair").alias("bp"),
            F.substring("pair", 1, 1).alias("bx"),
            F.substring("pair", 2, 1).alias("by"),
        )
    )
    chars = (
        tf.crossJoin(F.broadcast(best))
        .select(
            "t",
            "c",
            "bp",
            "bx",
            "by",
            F.posexplode(F.split(F.col("t"), "(?!^)(?=.)")).alias(
                "pos0", "ch"
            ),
        )
        .select(
            "t",
            "c",
            "bp",
            "bx",
            "by",
            (F.col("pos0") + 1).alias("pos"),
            "ch",
        )
    )
    wisl = Window.partitionBy("t", F.col("ch") == F.col("bx")).orderBy("pos")
    cands = chars.select(
        "t",
        "c",
        "pos",
        "ch",
        "bp",
        "bx",
        "by",
        (F.expr("substring(t, pos, 2)") == F.col("bp")).alias("cand"),
        F.when(
            F.col("ch") == F.col("bx"),
            F.col("pos") - F.row_number().over(wisl),
        ).alias("isl"),
    )
    runs = cands.withColumn(
        "s",
        F.when(
            F.col("isl").isNotNull(),
            F.min("pos").over(Window.partitionBy("t", "isl")),
        ),
    )
    taken = runs.select(
        "t",
        "c",
        "pos",
        "ch",
        "bp",
        (
            F.col("cand")
            & (
                (F.col("bx") != F.col("by"))
                | ((F.col("pos") - F.col("s")) % 2 == 0)
            )
        ).alias("tk"),
    )
    wt = Window.partitionBy("t").orderBy("pos")
    kept = (
        taken.withColumn(
            "consumed", F.coalesce(F.lag("tk").over(wt), F.lit(False))
        )
        .where(~F.col("consumed"))
        .select(
            "t",
            "c",
            "pos",
            F.when(F.col("tk"), F.col("bp")).otherwise(F.col("ch")).alias(
                "sym"
            ),
        )
    )
    p2 = kept.select(
        F.when(
            F.lead("sym").over(wt).isNotNull(),
            F.concat(F.col("sym"), F.lit("+"), F.lead("sym").over(wt)),
        ).alias("pair"),
        "c",
    ).where(F.col("pair").isNotNull())
    return (
        p2.groupBy("pair")
        .agg(F.sum("c").cast("bigint").alias("merge_count"))
        .orderBy(F.col("merge_count").desc(), F.col("pair"))
        .limit(30)
    )
