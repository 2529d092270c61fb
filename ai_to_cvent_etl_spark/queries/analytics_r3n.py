"""Sixteenth-wave operators (r3 continuation): BM25 ranking, Variant JSON,
phonetic blocking, seasonal decomposition, mix-shift, Merkle replica diff.

  T14 q_text_bm25          — BM25 relevance scoring of the corpus against
                             a fixed query-term set (k1=1.2, b=0.75),
                             top-20 docs per term.
  F15 q_json_variant       — the Spark 4 VariantType path: parse_json →
                             variant_get typed extraction (incl. a
                             constructed nested document and a
                             try_variant_get miss), mirrored by DuckDB
                             JSON extraction.
  D11 q_dedup_phonetic     — entity-resolution blocking: a soundex-class
                             phonetic key over part names (translate +
                             regexp vowel drop), groups with member
                             counts and a sorted name sample.
  TS12 q_ts_decompose      — classical decomposition of daily revenue:
                             centered 29-observation moving-average
                             trend, day-of-week seasonal means of the
                             detrended series, residuals.
  A32 q_agg_mix_shift      — Oaxaca-style mix-shift decomposition of the
                             period-over-period change in average order
                             value: within-segment, mix, and interaction
                             terms per market segment.
  E21 q_etl_merkle_diff    — anti-entropy replica comparison: per-bucket
                             XOR fingerprints of row hashes for two
                             replicas (one with a deterministic drift),
                             flagging unsynchronized buckets without
                             shipping rows.

Determinism notes (SURVEY §5.3):
  * T14: tf/df/dl/N are exact integers; avgdl, idf ln((N-df+.5)/(df+.5)),
    and the saturation term are single IEEE expressions over identical
    ints — identical bits — so ranking needs no pre-rounding (doc_id
    tie-break); scores rounded 6dp on output.
  * F15 outputs typed scalars only (BIGINT/INT/VARCHAR) — Variant never
    crosses the hash boundary.
  * D11 is pure string algebra (upper/translate/regexp_replace); the
    name sample is a '|'-joined SORTED distinct list on both engines
    (A10's rule) — no arrays in the output.
  * TS12: the trend is an exact DECIMAL window sum over a ROWS frame
    divided by the window count (IEEE, identical); day-of-week seasonal
    means quantize each detrended value with floor(x·1e4) before the
    exact DECIMAL sum (magnitudes ~1e6 × ~2.3k days keep the backing
    integer ≪ 2^53 — §5.3 rule 10); dow is datediff-mod-7 from a fixed
    Monday, not engine dayofweek numbering (F5 trap).
  * A32: all shares/means come from exact conditional counts and
    DECIMAL(18,2) sums (int64-backed at every test SF); the three
    decomposition terms are IEEE products of identical inputs, rounded
    6dp.
  * E21: row fingerprints are 48-bit md5 integers over canonical
    'key:cents' strings (cents are exact BIGINTs); XOR aggregation is
    exact, associative, and order-insensitive by construction — the
    whole query is float-free.

Scale notes:
  * T14: df/avgdl are broadcast-size aggregates; the per-(term, doc)
    scoring is map-side over the tokenized scan (|terms| × corpus, with
    |terms| tiny); top-20 per term is a rank window partitioned by term
    — the TakeOrdered shape. At 100 TB the tf computation rides the
    existing tokenization pass; no pairwise shuffle anywhere.
  * F15 is map-only columnar extraction — Variant's binary encoding
    exists precisely to make repeated path extraction cheap at scale.
  * D11 is the blocking half of entity resolution: one keyed shuffle on
    the phonetic key; the quadratic verify (T5's SSJoin) runs WITHIN
    blocks only — the same blocked shape as D1/D3.
  * TS12 aggregates to the day grain first (TS7's rule); all three
    components run on the |days| spine — constant memory.
  * A32 is one dim join (customer side broadcast-able per SCALE.md) +
    one 5-group conditional aggregation; the share windows run over 5
    collapsed rows.
  * E21 is THE scale pattern for replica sync: fingerprints collapse
    each replica to |buckets| rows (one keyed reduction each, partial
    XOR map-side), so comparing 100 TB replicas moves KBs. Mismatched
    buckets then re-split recursively (Merkle descent) — the bucket
    count is the fanout knob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register

# --- T14: BM25 ranking -------------------------------------------------------

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


# --- F15: Spark 4 Variant JSON path ------------------------------------------


@register(
    "q_json_variant",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(
                   '{"u":' || CAST(user_id AS VARCHAR) || ',"p":' || props
                   || '}', '$.u') AS BIGINT) AS u_long,
               CAST(json_extract_string(
                   '{"u":' || CAST(user_id AS VARCHAR) || ',"p":' || props
                   || '}', '$.p.k') AS INT) AS k_int,
               json_extract_string(props, '$.k') AS k_str,
               json_extract_string(props, '$.missing') IS NULL AS miss_is_null
        FROM events
    """,
    section="F15",
    doc="The Spark 4 VariantType path (semi-structured without schema "
    "declaration): a nested document constructed from columns is "
    "parse_json'd to VARIANT once, then variant_get extracts typed "
    "scalars by path ('$.u' as BIGINT, '$.p.k' as INT), plus a string "
    "extraction and a try_variant_get miss returning NULL. Only typed "
    "scalars cross the output boundary — Variant's binary encoding "
    "never hash-compares. Mirrored by DuckDB json_extract_string + "
    "casts. Map-only columnar extraction; at scale Variant exists "
    "precisely so repeated path access doesn't re-parse text (F7's "
    "get_json_object does — this is its indexed successor).",
)
def q_json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    j = F.concat(
        F.lit('{"u":'),
        F.col("user_id").cast("string"),
        F.lit(',"p":'),
        F.col("props"),
        F.lit("}"),
    )
    v = F.parse_json(j)
    return ev.select(
        "event_id",
        F.variant_get(v, "$.u", "bigint").alias("u_long"),
        F.variant_get(v, "$.p.k", "int").alias("k_int"),
        F.variant_get(F.parse_json(F.col("props")), "$.k", "string").alias(
            "k_str"
        ),
        F.try_variant_get(v, "$.missing", "int").isNull().alias(
            "miss_is_null"
        ),
    )


# --- D11: phonetic blocking key dedup ----------------------------------------

_SND_FROM = "BFPVCGJKQSXZDTLMNR"
_SND_TO = "111122222222334556"


@register(
    "q_dedup_phonetic",
    oracle=f"""
        WITH keyed AS (
            SELECT p_partkey, p_name,
                   substr(upper(p_name), 1, 1)
                   || regexp_replace(
                          translate(upper(substr(p_name, 2)),
                                    '{_SND_FROM}', '{_SND_TO}'),
                          '[^0-9]', '', 'g') AS pkey
            FROM part
        )
        SELECT pkey,
               CAST(COUNT(*) AS BIGINT) AS n_parts,
               CAST(COUNT(DISTINCT p_name) AS BIGINT) AS n_names,
               MIN(p_partkey) AS canonical_key,
               string_agg(DISTINCT p_name, '|' ORDER BY p_name) AS names
        FROM keyed
        GROUP BY pkey
    """,
    section="D11",
    doc="Entity-resolution BLOCKING via a soundex-class phonetic key "
    "over part names: first letter + consonant-class digits "
    "(B/F/P/V→1, C/G/J/K/Q/S/X/Z→2, D/T→3, L→4, M/N→5, R→6; vowels "
    "and non-mapped chars dropped via regexp), so 'red ring'/'rod "
    "rang'-style near-spellings collide. Output: block key, member and "
    "distinct-name counts, the min-key canonical record, and a "
    "'|'-joined SORTED distinct-name sample (A10's rule — no raw "
    "collect order). Pure string algebra — float-free. This is the "
    "blocking half of fuzzy entity resolution: one keyed shuffle; the "
    "quadratic verify (T5's prefix-filtered SSJoin) then runs within "
    "blocks only — the same blocked shape as D1/D3.",
)
def q_dedup_phonetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    pkey = F.concat(
        F.substring(F.upper("p_name"), 1, 1),
        F.regexp_replace(
            F.translate(
                F.upper(F.expr("substr(p_name, 2)")), _SND_FROM, _SND_TO
            ),
            "[^0-9]",
            "",
        ),
    )
    return (
        part.select("p_partkey", "p_name", pkey.alias("pkey"))
        .groupBy("pkey")
        .agg(
            F.count("*").alias("n_parts"),
            F.countDistinct("p_name").alias("n_names"),
            F.min("p_partkey").alias("canonical_key"),
            F.array_join(F.sort_array(F.collect_set("p_name")), "|").alias(
                "names"
            ),
        )
    )


# --- TS12: classical seasonal decomposition ----------------------------------

_TS12_HALF = 14  # centered window: 14 before + current + 14 after
_TS12_QS = 1e4


@register(
    "q_ts_decompose",
    oracle=f"""
        WITH daily AS (
            SELECT o_orderdate AS day,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev,
                   CAST(date_diff('day', TIMESTAMP '1995-01-02',
                                  o_orderdate) AS BIGINT) % 7 AS dow
            FROM orders GROUP BY o_orderdate
        ),
        tr AS (
            SELECT day, dow, CAST(rev AS DOUBLE) AS v,
                   CAST(SUM(rev) OVER w AS DOUBLE)
                   / CAST(COUNT(*) OVER w AS DOUBLE) AS trend
            FROM daily
            WINDOW w AS (ORDER BY day ROWS BETWEEN {_TS12_HALF} PRECEDING
                         AND {_TS12_HALF} FOLLOWING)
        ),
        det AS (
            SELECT day, dow, v, trend, v - trend AS d FROM tr
        ),
        seas AS (
            SELECT dow,
                   CAST(SUM(CAST(floor(d * {_TS12_QS}) AS DECIMAL(38,0)))
                        AS DOUBLE) / {_TS12_QS} / COUNT(*) AS seasonal
            FROM det GROUP BY dow
        )
        SELECT det.day,
               ROUND(det.trend, 4) AS trend,
               ROUND(seas.seasonal, 4) AS seasonal,
               ROUND(det.d - seas.seasonal, 4) AS residual
        FROM det JOIN seas ON seas.dow = det.dow
    """,
    section="TS12",
    doc="Classical (moving-average) decomposition of the daily revenue "
    f"series: trend = centered {2 * _TS12_HALF + 1}-OBSERVATION moving "
    "average (exact DECIMAL window sum / window count — partial edge "
    "windows included, deterministically); seasonal = day-of-week mean "
    "of the detrended series, with each detrended value quantized "
    "floor(x·1e4) before the exact DECIMAL sum (§5.3 rule 10 keeps the "
    "backing integer ≪ 2^53); residual = detrended − seasonal. "
    "Day-of-week is datediff-mod-7 from a fixed Monday — NOT engine "
    "dayofweek numbering (the F5 trap). Aggregates to the day grain "
    "first (TS7's rule): every component runs on the |days| spine; the "
    "7-row seasonal side broadcasts.",
)
def q_ts_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
    ).withColumn(
        "dow",
        (F.datediff(F.col("day"), F.lit("1995-01-02")).cast("long")) % 7,
    )
    w = Window.orderBy("day").rowsBetween(-_TS12_HALF, _TS12_HALF)
    tr = daily.select(
        "day",
        "dow",
        F.col("rev").cast("double").alias("v"),
        (
            F.sum("rev").over(w).cast("double")
            / F.count("*").over(w).cast("double")
        ).alias("trend"),
    )
    det = tr.select(
        "day", "dow", "trend", (F.col("v") - F.col("trend")).alias("d")
    )
    seas = det.groupBy("dow").agg(
        (
            F.sum(
                F.floor(F.col("d") * _TS12_QS).cast("decimal(38,0)")
            ).cast("double")
            / _TS12_QS
            / F.count("*")
        ).alias("seasonal")
    )
    return det.join(seas, "dow").select(
        "day",
        F.round("trend", 4).alias("trend"),
        F.round("seasonal", 4).alias("seasonal"),
        F.round(F.col("d") - F.col("seasonal"), 4).alias("residual"),
    )


# --- A32: mix-shift decomposition --------------------------------------------


@register(
    "q_agg_mix_shift",
    oracle="""
        WITH seg AS (
            SELECT c.c_mktsegment AS segment,
                   CAST(SUM(CASE WHEN o.o_orderdate < TIMESTAMP '1998-01-01'
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
                   SUM(CASE WHEN o.o_orderdate < TIMESTAMP '1998-01-01'
                       THEN CAST(o.o_totalprice AS DECIMAL(18,2))
                       ELSE CAST(0 AS DECIMAL(18,2)) END) AS s_b,
                   CAST(SUM(CASE WHEN o.o_orderdate >= TIMESTAMP '1998-01-01'
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
                   SUM(CASE WHEN o.o_orderdate >= TIMESTAMP '1998-01-01'
                       THEN CAST(o.o_totalprice AS DECIMAL(18,2))
                       ELSE CAST(0 AS DECIMAL(18,2)) END) AS s_c
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
            GROUP BY c.c_mktsegment
        ),
        m AS (
            SELECT segment, n_b, n_c,
                   CAST(n_b AS DOUBLE)
                   / CAST(SUM(n_b) OVER () AS DOUBLE) AS share_b,
                   CAST(n_c AS DOUBLE)
                   / CAST(SUM(n_c) OVER () AS DOUBLE) AS share_c,
                   CAST(s_b AS DOUBLE) / n_b AS mean_b,
                   CAST(s_c AS DOUBLE) / n_c AS mean_c
            FROM seg
        )
        SELECT segment, n_b, n_c,
               ROUND(share_b, 6) AS share_b,
               ROUND(share_c, 6) AS share_c,
               ROUND(mean_b, 4) AS mean_b,
               ROUND(mean_c, 4) AS mean_c,
               ROUND(share_b * (mean_c - mean_b), 4) AS within_term,
               ROUND((share_c - share_b) * mean_b, 4) AS mix_term,
               ROUND((share_c - share_b) * (mean_c - mean_b), 4)
                   AS interaction_term
        FROM m
    """,
    section="A32",
    doc="Oaxaca-style mix-shift decomposition of the period-over-period "
    "change in average order value (1995-97 base vs 1998+ current) by "
    "market segment: within_term (base share × mean change), mix_term "
    "(share change × base mean), interaction_term — the three sum to "
    "the overall AOV change, separating real per-segment movement from "
    "composition drift (Simpson's-paradox audit). All shares/means "
    "from exact conditional counts + DECIMAL sums (int64-backed); the "
    "terms are IEEE products of identical inputs, rounded on output. "
    "One dim join + one 5-group conditional aggregation; the share "
    "windows run over 5 collapsed rows.",
)
def q_agg_mix_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    is_b = F.col("o_orderdate") < "1998-01-01"
    d = F.col("o_totalprice").cast("decimal(18,2)")
    z = F.lit(0).cast("decimal(18,2)")
    seg = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.sum(F.when(is_b, 1).otherwise(0)).alias("n_b"),
            F.sum(F.when(is_b, d).otherwise(z)).alias("s_b"),
            F.sum(F.when(~is_b, 1).otherwise(0)).alias("n_c"),
            F.sum(F.when(~is_b, d).otherwise(z)).alias("s_c"),
        )
    )
    w = Window.partitionBy()
    share_b = F.col("n_b").cast("double") / F.sum("n_b").over(w).cast("double")
    share_c = F.col("n_c").cast("double") / F.sum("n_c").over(w).cast("double")
    mean_b = F.col("s_b").cast("double") / F.col("n_b")
    mean_c = F.col("s_c").cast("double") / F.col("n_c")
    return seg.select(
        "segment",
        "n_b",
        "n_c",
        F.round(share_b, 6).alias("share_b"),
        F.round(share_c, 6).alias("share_c"),
        F.round(mean_b, 4).alias("mean_b"),
        F.round(mean_c, 4).alias("mean_c"),
        F.round(share_b * (mean_c - mean_b), 4).alias("within_term"),
        F.round((share_c - share_b) * mean_b, 4).alias("mix_term"),
        F.round((share_c - share_b) * (mean_c - mean_b), 4).alias(
            "interaction_term"
        ),
    )


# --- E21: Merkle-style replica diff ------------------------------------------

_MERKLE_BUCKETS = 256


@register(
    "q_etl_merkle_diff",
    oracle=f"""
        WITH rows_ AS (
            SELECT o_orderkey % {_MERKLE_BUCKETS} AS bucket,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS cents_a,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)
                   + CASE WHEN o_orderkey % 97 = 0 THEN 100 ELSE 0 END
                       AS cents_b,
                   o_orderkey AS k
            FROM orders
        ),
        fp AS (
            SELECT bucket,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   bit_xor(CAST(('0x' || substr(md5(
                       CAST(k AS VARCHAR) || ':' || CAST(cents_a AS VARCHAR)
                   ), 1, 12)) AS BIGINT)) AS xor_a,
                   bit_xor(CAST(('0x' || substr(md5(
                       CAST(k AS VARCHAR) || ':' || CAST(cents_b AS VARCHAR)
                   ), 1, 12)) AS BIGINT)) AS xor_b
            FROM rows_ GROUP BY bucket
        )
        SELECT bucket, n_rows, xor_a = xor_b AS in_sync
        FROM fp
    """,
    section="E21",
    doc="Anti-entropy replica comparison (the Merkle-tree leaf level): "
    "two replicas of orders — B carries a deterministic drift (+$1.00 "
    f"on every 97th key) — collapse to {_MERKLE_BUCKETS} bucket "
    "fingerprints each: per-bucket XOR of 48-bit md5 row hashes over "
    "canonical 'key:cents' strings. XOR aggregation is exact, "
    "associative, order-insensitive AND subtractive (a changed row "
    "flips its bucket with probability 1-2^-48) — the whole query is "
    "float-free. Buckets with unequal fingerprints are the out-of-sync "
    "set. THE pattern for reconciling 100 TB replicas: each side "
    "reduces locally to |buckets| rows (partial XOR map-side), "
    "comparison moves KBs, and mismatched buckets re-split recursively "
    "(Merkle descent) — never ship or sort-merge the rows themselves.",
)
def q_etl_merkle_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cents = F.expr(
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
    )
    rows_ = orders.select(
        (F.col("o_orderkey") % _MERKLE_BUCKETS).alias("bucket"),
        F.col("o_orderkey").alias("k"),
        cents.alias("cents_a"),
        (
            cents
            + F.when(F.col("o_orderkey") % 97 == 0, 100).otherwise(0)
        ).alias("cents_b"),
    )

    def h48(cents_col: str):
        return F.expr(
            "cast(conv(substr(md5(concat(cast(k as string), ':', "
            f"cast({cents_col} as string))), 1, 12), 16, 10) as bigint)"
        )

    return rows_.groupBy("bucket").agg(
        F.count("*").alias("n_rows"),
        F.bit_xor(h48("cents_a")).alias("xor_a"),
        F.bit_xor(h48("cents_b")).alias("xor_b"),
    ).select(
        "bucket",
        "n_rows",
        (F.col("xor_a") == F.col("xor_b")).alias("in_sync"),
    )
