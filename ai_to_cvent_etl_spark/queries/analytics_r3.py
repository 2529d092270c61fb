"""Fourth-wave operators (r3): the remaining brief-named dedup/ANN family
members plus ETL reconciliation and LM-based quality scoring.

  D6 q_dedup_ngram_jaccard   — character-3-gram (shingle) Jaccard near-dup,
                               the "n-gram Jaccard" dedup variant
  D7 q_ann_lsh_cosine        — random-hyperplane LSH-bucketed cosine ANN,
                               the "LSH-bucketed variant" of similarity search
  L7 q_text_unigram_logprob  — corpus-unigram-LM negative-log-likelihood
                               scoring (perplexity-style quality signal)
  W14 q_win_share_of_total   — per-row share of group total (ratio window)
  E7 q_etl_checksum          — order-insensitive per-partition content
                               checksum (cross-system reconciliation)

Scale notes:
  * D6 shingles are computed row-locally once per doc; candidates come from
    MinHash-LSH banding over the shingle sets (r7 — the within-source theta
    join it replaced measured quadratic at sf3), so candidate volume is
    output-bound, not block-size-bound; exact Jaccard verifies.
  * D7's hyperplane signatures are integer-exact (quantized embedding grid x
    integer plane vectors), so bucket assignment is bit-reproducible across
    engines — the same trick V6 uses for learned centroids. Buckets prune
    the candidate space 16x; queries broadcast, corpus never shuffles.
  * L7 is two token-key shuffles (doc-term, term-freq) + one broadcast —
    identical shape to TF-IDF; the LM table is vocabulary-sized.
  * E7's checksum is an integer SUM of per-row 48-bit md5 prefixes: exact,
    associative, order-insensitive — safe under any partitioning, which is
    the entire point of a distributed reconciliation checksum.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register

# --- D6: character-n-gram Jaccard near-dup ---------------------------------

_PFX = 120  # shingle the first 120 chars: bounds per-doc work, keeps near-dup
#             prefixes discriminative (docs are space-separated words)
_NGRAM_T = 0.45
_NG_BANDS = 4  # MinHash-LSH bands of 2 rows over the shingle sets (r7)

_SH_SPARK = (
    f"case when length(substr(text, 1, {_PFX})) >= 3 then "
    f"array_distinct(transform(sequence(1, length(substr(text, 1, {_PFX})) - 2),"
    f" i -> substring(substr(text, 1, {_PFX}), i, 3))) "
    f"else array() end"
)
_SH_DUCK = (
    f"list_distinct(list_transform("
    f"range(1, greatest(len(substr(text, 1, {_PFX})) - 2, 0) + 1),"
    f" i -> substr(substr(text, 1, {_PFX}), i, 3)))"
)


# r7 (VERDICT r6 task 3): the pre-r7 D6 was a theta join blocked only by
# `source`, measured super-linear at sf3 (warm ratio 13.7 at 3x data) —
# and the r6 prefix-filter attempt was honestly reverted (tau 0.45 over a
# ~31-token vocabulary prunes nothing, WAVE_NOTES r6). The re-scoped
# contract is the one production n-gram dedup actually ships: MinHash-LSH
# banding over the SHINGLE sets generates candidates (docs sharing at
# least one of 4 two-row band keys within a source), then the exact
# 3-gram Jaccard verifies. Candidate volume is output-bound (band buckets
# are near-dup clusters), not block-size-bound; the banding recall at the
# threshold is the standard LSH trade (P(candidate) = 1-(1-J^2)^4, ~0.59
# at J=0.45 rising to ~0.93 at J=0.7) and is part of the declared
# semantics, exactly as in D1.
_NG_MH = (
    lambda i: f"array_min(transform(gs, g -> substr(md5(concat('{i}:', g)), 1, 16)))"
)
_NG_MH_DUCK = (
    lambda i: f"list_min(list_transform(gs, g -> substr(md5('{i}:' || g), 1, 16)))"
)


@register(
    "q_dedup_ngram_jaccard",
    oracle=f"""
        WITH sh AS MATERIALIZED (
            SELECT doc_id, source, {_SH_DUCK} AS gs FROM documents
        ),
        sig AS MATERIALIZED (
            SELECT doc_id, source, gs,
                   {', '.join(f'md5({_NG_MH_DUCK(2 * b)} || {_NG_MH_DUCK(2 * b + 1)}) AS bk{b}' for b in range(_NG_BANDS))}
            FROM sh
        ),
        bands AS (
            {' UNION ALL '.join(f'SELECT doc_id, source, {b} AS band, bk{b} AS bkey FROM sig' for b in range(_NG_BANDS))}
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_lo, b.doc_id AS doc_hi
            FROM bands a JOIN bands b
              ON a.source = b.source AND a.band = b.band AND a.bkey = b.bkey
             AND a.doc_id < b.doc_id AND a.doc_id % 3 = 0
        )
        SELECT doc_lo, doc_hi,
               ROUND(CAST(len(list_filter(ta.gs, x -> list_contains(tb.gs, x))) AS DOUBLE)
                     / (len(ta.gs) + len(tb.gs)
                        - len(list_filter(ta.gs, x -> list_contains(tb.gs, x)))), 4)
                   AS jaccard
        FROM cand
        JOIN sh ta ON ta.doc_id = cand.doc_lo
        JOIN sh tb ON tb.doc_id = cand.doc_hi
        WHERE CAST(len(list_filter(ta.gs, x -> list_contains(tb.gs, x))) AS DOUBLE)
              / (len(ta.gs) + len(tb.gs)
                 - len(list_filter(ta.gs, x -> list_contains(tb.gs, x)))) >= {_NGRAM_T}
    """,
    section="D6",
    doc="Character-3-gram (shingle) Jaccard near-duplicate pairs — the "
    "n-gram dedup variant: robust to word-boundary edits that break "
    "token-level Jaccard (T5). r7 re-scope: candidates come from "
    f"MinHash-LSH banding over the shingle sets ({_NG_BANDS} bands x 2 "
    "rows, md5 band keys — engine-identical), joined on (source, band, "
    "bkey); the exact shingle Jaccard then verifies every candidate. "
    "Banding recall at the threshold (P = 1-(1-J^2)^4) is part of the "
    "declared semantics, as in D1 — the pre-r7 within-source theta join "
    "measured quadratic at sf3 and cannot run at corpus scale. Shingles "
    "row-local over a 120-char prefix; verify intersects xxhash64'd "
    "shingle arrays (collision-freedom pinned in tests/test_invariants).",
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import fan_out

    docs = load_table(spark, sf_dir, "documents")
    # One pass per doc computes shingles, their xxhash64 array (verify),
    # and the 4 md5 band keys (8 minhash perms x ~118 shingles of md5 is
    # the dominant cost); localCheckpoint so the three consumers below
    # (band explode + both verify sides) reuse it instead of recomputing
    # the hash work 3x. Linear-size (one row/doc), the D1-family device.
    per_doc = (
        fan_out(docs.select("doc_id", "source", F.expr(_SH_SPARK).alias("gs")))
        .select(
            "doc_id",
            "source",
            F.expr("transform(gs, g -> xxhash64(g))").alias("hs"),
            F.size("gs").alias("sz"),
            F.array(
                *[
                    F.md5(
                        F.concat(
                            F.expr(_NG_MH(2 * b)), F.expr(_NG_MH(2 * b + 1))
                        )
                    )
                    for b in range(_NG_BANDS)
                ]
            ).alias("bks"),
        )
        .localCheckpoint(eager=False)
    )
    bands = per_doc.select(
        "doc_id", "source", F.posexplode("bks").alias("band", "bkey")
    )
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("a.doc_id") % 3 == 0),
        )
        .select(
            F.col("a.doc_id").alias("doc_lo"),
            F.col("b.doc_id").alias("doc_hi"),
        )
        .distinct()
    )
    ta = per_doc.select(
        F.col("doc_id").alias("doc_lo"),
        F.col("hs").alias("hs_a"),
        F.col("sz").alias("sz_a"),
    )
    tb = per_doc.select(
        F.col("doc_id").alias("doc_hi"),
        F.col("hs").alias("hs_b"),
        F.col("sz").alias("sz_b"),
    )
    # r8 (guide §7.2): explode barrier — one array_intersect per candidate
    # (a filter on a generator output cannot push into the attach joins;
    # without it the jaccard gate became a join residual and the intersect
    # ran once per candidate there plus once per survivor). Deterministic.
    paired = (
        cand.join(ta, "doc_lo")
        .join(tb, "doc_hi")
        .select(
            "doc_lo",
            "doc_hi",
            "sz_a",
            "sz_b",
            F.explode(
                F.array(
                    F.size(F.array_intersect(F.col("hs_a"), F.col("hs_b")))
                )
            ).alias("i"),
        )
    )
    # try_divide: two empty shingle sets give a 0/0 pair under hostile
    # inputs (ANSI would fault); NULL fails the >= threshold, so the pair
    # set on well-formed data is unchanged
    jac = F.try_divide(
        F.col("i").cast("double"),
        F.col("sz_a") + F.col("sz_b") - F.col("i"),
    )
    return paired.filter(jac >= _NGRAM_T).select(
        "doc_lo", "doc_hi", F.round(jac, 4).alias("jaccard")
    )


# --- D7: random-hyperplane LSH-bucketed cosine ANN -------------------------

_N_PLANES = 4  # 16 buckets


def _plane_ints(p: int, dim: int = 64) -> list[int]:
    """Deterministic pseudo-random hyperplane as INTEGER components in
    [-32768, 32767]: md5-seeded so both engines inline identical literals.
    Integer components x a quantized embedding grid = exact BIGINT dot
    products, so the sign (bucket bit) is bit-reproducible cross-engine —
    a raw float dot product near zero could bucket differently per engine."""
    out = []
    for d in range(dim):
        h = int(hashlib.md5(f"plane{p}:{d}".encode()).hexdigest()[:8], 16)
        out.append(h % 65536 - 32768)
    return out


_PLANES = [_plane_ints(p) for p in range(_N_PLANES)]

# quantized grid: qx = floor(x*64 + 0.5) as BIGINT (V5's drift-safe rounding)
_QX_SPARK = "cast(floor(cast(x as double) * 64 + 0.5) as bigint)"
_QX_DUCK = "CAST(floor(CAST(embedding[i] AS DOUBLE) * 64 + 0.5) AS BIGINT)"


def _bucket_spark() -> str:
    bits = []
    for p, plane in enumerate(_PLANES):
        arr = f"array({', '.join(f'{v}L' for v in plane)})"
        proj = (
            f"aggregate(zip_with(embedding, {arr},"
            f" (x, y) -> {_QX_SPARK} * y), 0L, (a, v) -> a + v)"
        )
        bits.append(f"{1 << p} * (case when {proj} >= 0 then 1 else 0 end)")
    return " + ".join(bits)


def _bucket_duck() -> str:
    bits = []
    for p, plane in enumerate(_PLANES):
        arr = f"[{', '.join(str(v) for v in plane)}]"
        proj = (
            f"list_sum(list_transform(range(1, 65),"
            f" i -> {_QX_DUCK} * ({arr})[i]))"
        )
        bits.append(f"{1 << p} * (CASE WHEN {proj} >= 0 THEN 1 ELSE 0 END)")
    return " + ".join(bits)


def _dot_duck(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, 65),"
        f" k -> CAST({a}.embedding[k] AS DOUBLE) * CAST({b}.embedding[k] AS DOUBLE)))"
    )


def _nsq_duck(a: str) -> str:
    return (
        f"sqrt(list_sum(list_transform({a}.embedding,"
        f" x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    )


@register(
    "q_ann_lsh_cosine",
    oracle=f"""
        WITH buck AS (
            SELECT vec_id, embedding, {_bucket_duck()} AS bucket
            FROM embeddings
        )
        SELECT query_id, neighbor_id, rank FROM (
            SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                   CAST(ROW_NUMBER() OVER (
                        PARTITION BY a.vec_id
                        ORDER BY {_dot_duck('a', 'b')}
                                 / ({_nsq_duck('a')} * {_nsq_duck('b')}) DESC,
                                 b.vec_id
                   ) AS BIGINT) AS rank
            FROM (SELECT * FROM buck WHERE vec_id < 10) a
            JOIN buck b ON a.bucket = b.bucket AND b.vec_id <> a.vec_id
        ) WHERE rank <= 3
    """,
    section="D7",
    doc="LSH-bucketed approximate nearest neighbors: 4 md5-seeded random "
    "hyperplanes hash each vector to a 16-bucket signature (integer-exact "
    "projections — quantized grid x integer planes — so buckets are "
    "bit-reproducible cross-engine); candidates share the query's bucket, "
    "exact cosine top-3 within it, ids+rank output. The sign-random-"
    "projection twin of D4's IVF: same broadcast-queries/corpus-never-"
    "shuffles plan, quantizer needs no training.",
)
def q_ann_lsh_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import fan_out
    from ai_to_cvent_etl_spark.queries.dedup_scale import _dot_col, _norm_col

    emb = load_table(spark, sf_dir, "embeddings")
    buck = emb.select(
        "vec_id", "embedding", F.expr(_bucket_spark()).alias("bucket")
    )
    q = buck.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("bucket").alias("qbucket"),
    ).withColumn("nq", _norm_col("qe"))
    n = fan_out(
        buck.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("ne"),
            F.col("bucket").alias("nbucket"),
        ).withColumn("nn", _norm_col("ne"))
    )
    sim = _dot_col("qe", "ne") / (F.col("nq") * F.col("nn"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        F.broadcast(q)
        .join(
            n,
            (F.col("qbucket") == F.col("nbucket"))
            & (F.col("neighbor_id") != F.col("query_id")),
        )
        .withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 3)
        .select("query_id", "neighbor_id", "rank")
    )


# --- L7: unigram-LM negative log-likelihood --------------------------------


@register(
    "q_text_unigram_logprob",
    oracle="""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
        ),
        tf AS (
            SELECT tok, CAST(COUNT(*) AS DOUBLE) AS c FROM toks GROUP BY tok
        ),
        n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_total FROM toks)
        SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
               ROUND(AVG(-ln(tf.c / n.n_total)), 4) AS avg_nll
        FROM toks t JOIN tf ON t.tok = tf.tok CROSS JOIN n
        GROUP BY t.doc_id
    """,
    section="L7",
    doc="Perplexity-style quality scoring against a corpus unigram LM: "
    "p(tok) = tf/N over the whole corpus, score = mean negative log-prob "
    "per doc (high = surprising/rare tokens, low = boilerplate). The "
    "training-data quality signal next to L3's rule-based score. LM table "
    "is vocabulary-sized and broadcast; ROUND 4 absorbs float-sum order "
    "drift in the per-doc mean.",
)
def q_text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import fan_out

    docs = load_table(spark, sf_dir, "documents")
    toks = fan_out(docs).select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    tf = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("double").alias("c"))
    n = toks.agg(F.count(F.lit(1)).cast("double").alias("n_total"))
    return (
        toks.join(F.broadcast(tf), "tok")
        .crossJoin(F.broadcast(n))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(-F.log(F.col("c") / F.col("n_total"))), 4).alias(
                "avg_nll"
            ),
        )
    )


# --- W14: share of group total ---------------------------------------------


@register(
    "q_win_share_of_total",
    oracle="""
        SELECT o_orderkey, o_custkey,
               ROUND(o_totalprice /
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                          OVER (PARTITION BY o_custkey) AS DOUBLE), 6)
                   AS share
        FROM orders
    """,
    section="W14",
    doc="Per-row share of group total (ratio_to_report): each order's "
    "fraction of its customer's lifetime spend. Denominator is the exact "
    "DECIMAL window sum cast to DOUBLE (order-insensitive), so the IEEE "
    "division is bit-identical cross-engine; ROUND 6 for output hygiene.",
)
def q_win_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import dec2

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    total = F.sum(dec2(F.col("o_totalprice"))).over(w).cast("double")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") / total, 6).alias("share"),
    )


# --- E7: reconciliation checksum -------------------------------------------


@register(
    "q_etl_checksum",
    oracle="""
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(('0x' || substr(md5(concat_ws('|',
                       CAST(doc_id AS VARCHAR), lang, source,
                       CAST(n_chars AS VARCHAR), text)), 1, 12)) AS BIGINT))
                   AS BIGINT) AS checksum
        FROM documents
        GROUP BY lang
    """,
    section="E7",
    doc="Cross-system reconciliation checksum — the ETL validation "
    "primitive the reference's extract/load legs need: per-partition "
    "(lang) SUM of 48-bit md5 prefixes over canonicalized row content. "
    "Integer sum = exact, associative, order-insensitive, so the checksum "
    "is stable under any partitioning/engine; comparing per-partition "
    "(n_rows, checksum) between source and target detects every changed "
    "row without moving data.",
)
def q_etl_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    row_hash = F.expr(
        "cast(conv(substr(md5(concat_ws('|', cast(doc_id as string), lang,"
        " source, cast(n_chars as string), text)), 1, 12), 16, 10) as bigint)"
    )
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(row_hash).alias("checksum"),
    )


# --- E8: PII pseudonymization / masking ------------------------------------


@register(
    "q_etl_pii_mask",
    oracle="""
        SELECT substr(sha256('pepper-2026|' || CAST(c_custkey AS VARCHAR)), 1, 16)
                   AS pseudo_id,
               substr(c_name, 1, 2) ||
                   repeat('*', greatest(length(c_name) - 2, 0)) AS name_mask,
               CAST(floor(c_acctbal / CAST(1000 AS DOUBLE)) AS BIGINT)
                   AS acct_band,
               c_mktsegment
        FROM customer
    """,
    section="E8",
    doc="Deterministic PII pseudonymization — the compliance leg every "
    "training-data pipeline needs before sharing: salted-sha256 pseudonym "
    "(stable join key across datasets, irreversible without the pepper), "
    "prefix-preserving name mask, account balance generalized to 1000-wide "
    "bands (floor: exactly defined on both engines), quasi-identifier "
    "(segment) passed through. Row-local — map-only at any scale.",
)
def q_etl_pii_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        F.substring(
            F.sha2(
                F.concat(F.lit("pepper-2026|"), F.col("c_custkey").cast("string")),
                256,
            ),
            1,
            16,
        ).alias("pseudo_id"),
        F.concat(
            F.substring("c_name", 1, 2),
            F.expr("repeat('*', greatest(length(c_name) - 2, 0))"),
        ).alias("name_mask"),
        F.floor(F.col("c_acctbal") / F.lit(1000).cast("double"))
        .cast("bigint")
        .alias("acct_band"),
        "c_mktsegment",
    )


# --- J16: interval-overlap self-join ---------------------------------------


@register(
    "q_join_interval_overlap",
    oracle="""
        WITH iv AS (
            SELECT user_id, event_type,
                   MIN(ts) AS t_lo, MAX(ts) AS t_hi
            FROM events
            GROUP BY user_id, event_type
        )
        SELECT a.user_id,
               a.event_type AS type_a, b.event_type AS type_b,
               CAST(epoch_us(least(a.t_hi, b.t_hi))
                    - epoch_us(greatest(a.t_lo, b.t_lo)) AS BIGINT)
                   AS overlap_us
        FROM iv a JOIN iv b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        WHERE least(a.t_hi, b.t_hi) >= greatest(a.t_lo, b.t_lo)
    """,
    section="J16",
    doc="Interval-OVERLAP self-join (the range-join sibling of J12's "
    "containment and J14's point-in-time): per-(user, event_type) activity "
    "span [min ts, max ts]; pairs of event types whose spans overlap, with "
    "the overlap length in exact BIGINT microseconds. Blocked on user_id — "
    "the pair space is per-user-quadratic only, and the join shuffles once "
    "on the block key at any scale.",
)
def q_join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    iv = ev.groupBy("user_id", "event_type").agg(
        F.min("ts").alias("t_lo"), F.max("ts").alias("t_hi")
    )
    a = iv.alias("a")
    b = iv.select(
        F.col("user_id").alias("user_id_b"),
        F.col("event_type").alias("type_b"),
        F.col("t_lo").alias("t_lo_b"),
        F.col("t_hi").alias("t_hi_b"),
    )
    lo = F.greatest(F.col("a.t_lo"), F.col("t_lo_b"))
    hi = F.least(F.col("a.t_hi"), F.col("t_hi_b"))
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("user_id_b"))
            & (F.col("a.event_type") < F.col("type_b")),
        )
        .filter(hi >= lo)
        .select(
            F.col("a.user_id").alias("user_id"),
            F.col("a.event_type").alias("type_a"),
            F.col("type_b"),
            (F.unix_micros(hi) - F.unix_micros(lo)).alias("overlap_us"),
        )
    )
