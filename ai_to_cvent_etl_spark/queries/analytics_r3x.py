"""Twenty-sixth-wave operators (r3 continuation): repetition filters,
seasonal strength, crypto functions, Arrow UDTF.

  L17 q_text_repetition   — Gopher-style within-document repetition
                            signals: distinct-token ratio, top-bigram
                            share, and the longest identical-token run
                            (gaps-and-islands) — the quality filters
                            that catch degenerate/boilerplate text
                            pairwise dedup never sees.
  TS15 q_ts_seasonal_strength — STL-style strength-of-trend and
                            strength-of-seasonality variance ratios
                            over the TS12 decomposition, on an integer-
                            quantized component grid.
  F19 q_crypto_funcs      — the cryptographic function family: md5 /
                            sha-256 digests, AES-ECB encrypt→decrypt
                            round-trip, deterministic ciphertext size.
  X9  q_udtf_arrow        — Arrow-optimized Python UDTF (useArrow=True)
                            in a LATERAL join: tokens with positions —
                            pins the Arrow UDTF execution path next to
                            X4's pickled row path.

Determinism notes (SURVEY §5.3):
  * L17 is exact integer counting end to end (ratios are single IEEE
    divisions rounded 6dp); the run-length islands use (pos −
    row_number) grouping with the unique pos order.
  * TS15 quantizes every component value to whole k$ BEFORE the moment
    sums, so all sums are exact BIGINTs ≪ 2^53 (§5.3 rule 10); the
    two strength ratios are single IEEE formulas rounded 6dp.
  * F19: md5/sha256 are exact; AES-ECB with a fixed key is
    deterministic (no IV — which is WHY real systems use GCM; the ECB
    choice here is what makes the round-trip testable), and the
    ciphertext size is closed-form from the text length (PKCS7).
  * X9 is exact string splitting; positions are 0-based indices.

Scale notes:
  * L17 is one explode + keyed reductions per signal, all co-keyed on
    doc_id — the per-doc quality-gate shape (L3/L10's family); run it
    BEFORE corpus-wide dedup so degenerate docs never enter LSH.
  * TS15 runs on the |days| spine.
  * F19 is map-only; digests at ingest are the E7/E21 fingerprint
    feed, and deterministic-size ciphertexts matter for storage
    budgeting of encrypted columns.
  * X9: Arrow UDTFs batch rows across the boundary (vs X4's pickled
    rows) — the right default for high-fanout UDTFs; still Python,
    still not for hot relational paths (the X-ladder rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register

# --- L17: within-document repetition signals ---------------------------------


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


# --- TS15: strength of trend / seasonality -----------------------------------

_TS15_HALF = 14


@register(
    "q_ts_seasonal_strength",
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
            WINDOW w AS (ORDER BY day ROWS BETWEEN {_TS15_HALF} PRECEDING
                         AND {_TS15_HALF} FOLLOWING)
        ),
        det AS (SELECT day, dow, v, trend, v - trend AS d FROM tr),
        seas AS (
            SELECT dow,
                   CAST(SUM(CAST(floor(d * 1e4) AS DECIMAL(38,0)))
                        AS DOUBLE) / 1e4 / COUNT(*) AS s
            FROM det GROUP BY dow
        ),
        comp AS (
            SELECT CAST(floor((det.d - seas.s) / 1000.0) AS BIGINT) AS r_k,
                   CAST(floor(det.d / 1000.0) AS BIGINT) AS dr_k,
                   CAST(floor(det.trend / 1000.0) AS BIGINT) AS t_k,
                   CAST(floor((det.trend + det.d - seas.s) / 1000.0)
                        AS BIGINT) AS tr_k
            FROM det JOIN seas ON seas.dow = det.dow
        ),
        m AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                   CAST(SUM(r_k) AS DOUBLE) AS sr,
                   CAST(SUM(r_k * r_k) AS DOUBLE) AS srr,
                   CAST(SUM(dr_k) AS DOUBLE) AS sd,
                   CAST(SUM(dr_k * dr_k) AS DOUBLE) AS sdd,
                   CAST(SUM(tr_k) AS DOUBLE) AS st,
                   CAST(SUM(tr_k * tr_k) AS DOUBLE) AS stt
            FROM comp
        )
        SELECT ROUND(greatest(0.0,
                   1.0 - (srr / n - (sr / n) * (sr / n))
                         / (sdd / n - (sd / n) * (sd / n))), 6)
                   AS seasonal_strength,
               ROUND(greatest(0.0,
                   1.0 - (srr / n - (sr / n) * (sr / n))
                         / (stt / n - (st / n) * (st / n))), 6)
                   AS trend_strength
        FROM m
    """,
    section="TS15",
    doc="STL-style strength of seasonality and trend over the TS12 "
    "decomposition: seasonal strength = max(0, 1 − Var(remainder)/"
    "Var(detrended)) and trend strength = max(0, 1 − Var(remainder)/"
    "Var(trend + remainder)) — the scalar that says whether the "
    "day-of-week pattern or the trend is signal or noise. Component "
    "values are quantized to whole k$ BEFORE the moment sums, making "
    "every variance moment an exact BIGINT (§5.3 rule 10) and both "
    "ratios single IEEE formulas. Runs on the |days| spine with a "
    "7-row seasonal broadcast.",
)
def q_ts_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    ).withColumn(
        "dow",
        (F.datediff(F.col("day"), F.lit("1995-01-02")).cast("long")) % 7,
    )
    w = Window.orderBy("day").rowsBetween(-_TS15_HALF, _TS15_HALF)
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
        "dow", "trend", (F.col("v") - F.col("trend")).alias("d")
    )
    seas = det.groupBy("dow").agg(
        (
            F.sum(F.floor(F.col("d") * 1e4).cast("decimal(38,0)")).cast(
                "double"
            )
            / 1e4
            / F.count("*")
        ).alias("s")
    )
    comp = det.join(seas, "dow").select(
        F.floor((F.col("d") - F.col("s")) / 1000.0).cast("long").alias("r_k"),
        F.floor(F.col("d") / 1000.0).cast("long").alias("dr_k"),
        F.floor((F.col("trend") + F.col("d") - F.col("s")) / 1000.0)
        .cast("long")
        .alias("tr_k"),
    )
    m = comp.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("r_k").cast("double").alias("sr"),
        F.sum(F.col("r_k") * F.col("r_k")).cast("double").alias("srr"),
        F.sum("dr_k").cast("double").alias("sd"),
        F.sum(F.col("dr_k") * F.col("dr_k")).cast("double").alias("sdd"),
        F.sum("tr_k").cast("double").alias("st"),
        F.sum(F.col("tr_k") * F.col("tr_k")).cast("double").alias("stt"),
    )
    vr = F.col("srr") / F.col("n") - (F.col("sr") / F.col("n")) * (
        F.col("sr") / F.col("n")
    )
    vd = F.col("sdd") / F.col("n") - (F.col("sd") / F.col("n")) * (
        F.col("sd") / F.col("n")
    )
    vt = F.col("stt") / F.col("n") - (F.col("st") / F.col("n")) * (
        F.col("st") / F.col("n")
    )
    return m.select(
        F.round(F.greatest(F.lit(0.0), 1.0 - vr / vd), 6).alias(
            "seasonal_strength"
        ),
        F.round(F.greatest(F.lit(0.0), 1.0 - vr / vt), 6).alias(
            "trend_strength"
        ),
    )


# --- F19: cryptographic function family --------------------------------------

_AES_KEY = "0123456789abcdef"


@register(
    "q_crypto_funcs",
    oracle="""
        SELECT doc_id,
               md5(text) AS md5_hex,
               sha256(text) AS sha256_hex,
               TRUE AS aes_roundtrip,
               CAST((octet_length(encode(text)) // 16 + 1) * 16 AS BIGINT)
                   AS ct_bytes
        FROM documents
    """,
    section="F19",
    doc="Cryptographic function family: md5 and SHA-256 digests (exact "
    "cross-engine), an AES-128-ECB encrypt→decrypt round-trip with a "
    "fixed key (asserted equal to the plaintext — ECB is the "
    "deterministic mode that makes the round-trip testable; real "
    "column encryption uses GCM, whose random IV is exactly why "
    "ciphertext never hash-compares), and the PKCS7 ciphertext size "
    "from the closed form (len/16 + 1)·16, which the oracle computes "
    "without any crypto. Map-only; digests at ingest feed the E7/E21 "
    "fingerprint machinery, and deterministic ciphertext sizing is "
    "the storage-budget input for encrypted columns.",
)
def q_crypto_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    rt = F.expr(
        f"CAST(aes_decrypt(aes_encrypt(text, '{_AES_KEY}', 'ECB'), "
        f"'{_AES_KEY}', 'ECB') AS STRING)"
    )
    ct = F.expr(f"aes_encrypt(text, '{_AES_KEY}', 'ECB')")
    return docs.select(
        "doc_id",
        F.md5("text").alias("md5_hex"),
        F.sha2(F.col("text"), 256).alias("sha256_hex"),
        (rt == F.col("text")).alias("aes_roundtrip"),
        F.octet_length(ct).cast("long").alias("ct_bytes"),
    )


# --- X9: Arrow-optimized Python UDTF -----------------------------------------

_X9_DOCS = 50


def _make_arrow_split_udtf():
    """Arrow-optimized UDTF (useArrow=True): rows cross the boundary as
    Arrow batches instead of pickled tuples. Cited API:
    pyspark.sql.functions.udtf(useArrow=True) (Spark 4)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="tok string, pos int", useArrow=True)
    class ArrowSplit:
        def eval(self, text: str):
            for i, w in enumerate(text.split(" ")):
                yield (w, i)

    return ArrowSplit


@register(
    "q_udtf_arrow",
    oracle=f"""
        SELECT doc_id, u.tok AS tok, u.pos AS pos
        FROM (
            SELECT doc_id,
                   unnest(list_transform(string_split(text, ' '),
                          (x, i) -> struct_pack(tok := x,
                                                pos := CAST(i - 1 AS INT))))
                       AS u
            FROM documents WHERE doc_id < {_X9_DOCS}
        )
    """,
    section="X9",
    doc="Arrow-optimized Python UDTF (useArrow=True) in a LATERAL join: "
    "tokenize with positions over a bounded doc window — the Arrow "
    "batch path for table functions, pinned next to X4's pickled-row "
    "UDTF and X8's TABLE-argument form (the full UDTF ladder). Exact "
    "string splitting, 0-based positions. Arrow batching is the right "
    "default for high-fanout UDTFs (one batch out per batch in, not "
    "one pickle per emitted row) — still Python, still out of hot "
    "relational paths.",
)
def q_udtf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < _X9_DOCS
    )
    docs.createOrReplaceTempView("x9_docs")
    spark.udtf.register("x9_arrow_split", _make_arrow_split_udtf())
    return spark.sql(
        "SELECT d.doc_id, s.tok, s.pos "
        "FROM x9_docs d, LATERAL x9_arrow_split(d.text) s"
    )
