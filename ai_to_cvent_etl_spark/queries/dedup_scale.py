"""Scale-path deduplication + ANN operators (north-star extension).

D1 MinHash+LSH near-dedup, D2 SimHash fingerprint dedup, D3 embedding-cosine
near-dup, D4 bucket-pruned approximate nearest neighbors.

100 TB design notes:
  * D1 (MinHash-LSH) is THE scale path for near-dedup: signatures and band
    keys are computed row-locally (one map stage, no shuffle); the only
    shuffle is the band-key self-join, whose buckets are tiny by construction
    (band collision probability ~ j^r). The brute-force token self-join
    (q_dedup_near_jaccard) explodes on hot tokens; this doesn't. The final
    exact-Jaccard verify joins candidate PAIRS (few) against per-doc token
    arrays and evaluates row-locally via array_intersect.
  * D2 (SimHash) is fully row-local until a single groupBy on the 16-bit
    fingerprint — a near-free shuffle (at most 65536 distinct keys, hit by
    AQE coalescing). Token hashes are computed ONCE per doc into an array,
    then each bit's vote is an array filter over the precomputed hashes.
  * D3 blocks the O(n^2) pair space by `label` (at 100 TB: by an IVF coarse
    cluster id) so the self-join shuffles on the block key and each block's
    pairs are generated locally.
  * D4 is the IVF idea itself: a deterministic coarse quantizer (sign bits of
    the leading dimensions = 8 cells) prunes the search space 8x; queries are
    broadcast, so the big side never shuffles. Swap the quantizer for learned
    centroids at scale — the plan shape is identical.

All hashing is md5-based (identical in Spark and DuckDB, probed), all float
math is widened to DOUBLE with left-to-right folds on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import DecimalType

_N_PERM = 8   # minhash permutations
_N_BANDS = 4  # LSH bands (2 rows each): P(candidate | j=0.8) = 1-(1-0.64)^4 ≈ 0.983
_SALT_TARGET = 256  # band-bucket rows per salt class (pair-gen task grain)
_SALT_MAX = 64      # salt fan-out ceiling (probe replication ≤ 64x per row)


def _mh_spark(i: int) -> str:
    return f"array_min(transform(ts, t -> substr(md5(concat('{i}:', t)), 1, 16)))"


def _mh_duck(i: int) -> str:
    return f"list_min(list_transform(ts, t -> substr(md5('{i}:' || t), 1, 16)))"


@register(
    "q_dedup_minhash_lsh",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, list_distinct(string_split(text, ' ')) AS ts FROM documents
        ),
        sig AS (
            SELECT doc_id,
                   {', '.join(f'{_mh_duck(i)} AS mh{i}' for i in range(_N_PERM))}
            FROM toks
        ),
        bands AS (
            {' UNION ALL '.join(
                f"SELECT doc_id, {b} AS band, md5(mh{2 * b} || mh{2 * b + 1}) AS bkey FROM sig"
                for b in range(_N_BANDS))}
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_lo, b.doc_id AS doc_hi
            FROM bands a
            JOIN bands b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
        )
        SELECT doc_lo, doc_hi,
               ROUND(CAST(len(list_filter(ta.ts, x -> list_contains(tb.ts, x))) AS DOUBLE)
                     / (len(ta.ts) + len(tb.ts)
                        - len(list_filter(ta.ts, x -> list_contains(tb.ts, x)))), 4) AS jaccard
        FROM cand
        JOIN toks ta ON ta.doc_id = cand.doc_lo
        JOIN toks tb ON tb.doc_id = cand.doc_hi
        WHERE CAST(len(list_filter(ta.ts, x -> list_contains(tb.ts, x))) AS DOUBLE)
              / (len(ta.ts) + len(tb.ts)
                 - len(list_filter(ta.ts, x -> list_contains(tb.ts, x)))) >= 0.8
    """,
    section="D1",
    doc="MinHash(8 perms) + LSH(4 bands x 2) candidate generation, exact "
    "Jaccard >= 0.8 verify. Row-local signatures; shuffle only on band keys.",
)
def q_dedup_minhash_lsh(
    spark: SparkSession,
    sf_dir: str,
    strategy: str = "auto",
    bucket_cap: int | str | None = "auto",
    auto_cap_mult: int = 64,
) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import corpus_side, fan_out

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.array_distinct(F.split(F.col("text"), " ")).alias("ts")
    )
    # fan_out AFTER the signature projection: the repartition exchange
    # materializes the md5 signatures, so Catalyst cannot collapse the
    # projection into the join and re-evaluate 8 minhash transforms per
    # join-output row (millions) instead of per doc (thousands).
    #
    # `hs` = per-doc xxhash64 of each distinct token: the exact-Jaccard
    # verify intersects 64-bit int arrays instead of string arrays — 2x
    # faster on the dominant cost (measured sf0.1: verify 12.4s -> 6.2s),
    # since the intersection hashes fixed-width longs, not variable-length
    # UTF8. |intersect(hs_a, hs_b)| == |intersect(ts_a, ts_b)| unless two
    # DISTINCT tokens of one pair collide in 64 bits (P ~ C(40,2)/2^64 per
    # pair, ~1e-10 over the whole corpus; tests/test_invariants.py pins
    # vocab-wide collision-freedom on the fixtures).
    sig = fan_out(
        toks.select(
            "doc_id",
            F.expr("transform(ts, t -> xxhash64(t))").alias("hs"),
            F.size("ts").alias("sz"),
            F.array(
                *[
                    F.md5(
                        F.concat(
                            F.expr(_mh_spark(2 * b)), F.expr(_mh_spark(2 * b + 1))
                        )
                    )
                    for b in range(_N_BANDS)
                ]
            ).alias("bks"),
        )
    )
    # hashed-token arrays and ALL band keys ride along the explode, so (a)
    # the verify is row-local (no rejoin) and (b) a pair colliding in several
    # bands is emitted ONLY from its lowest matching band — no pair-distinct
    # shuffle. The whole query is shuffle-free after the fan-out.
    bands = sig.select(
        "doc_id", "hs", "sz", "bks", F.posexplode("bks").alias("band", "bkey")
    )
    capped = bucket_cap is not None
    if capped:
        # Pathological-bucket cap (SCALE.md): boilerplate-heavy corpora
        # concentrate a large fraction of docs into a single band bucket,
        # turning the "tiny by construction" bucket join quadratic. Rows in
        # buckets above the cap are dropped BEFORE the join.
        #
        # `bucket_cap='auto'` (the default since r4) derives the cap from
        # the data as ceil(auto_cap_mult * sqrt(total band rows)): a bucket
        # of size b contributes ~b^2/2 candidate pairs, so capping b at
        # m*sqrt(R) bounds TOTAL worst-case candidates by (R/cap)*cap^2 =
        # m^2*R — linear in corpus size with an explicit constant, the
        # property that survives a 100 TB corpus. A percentile-of-histogram
        # rule was considered and rejected: the adversary (one giant
        # boilerplate bucket) sits IN the top percentile, so the rule
        # chases it upward; the sqrt rule is anchored to corpus size, not
        # to the skew itself. On the fixtures the auto cap never engages
        # (sf0.1: cap 64*sqrt(20000)=9052 vs max observed bucket 3921;
        # sf0.01: 2863 vs 383) so the default path is bit-identical to
        # uncapped — pinned by the oracle hash and
        # tests/test_skew.py::test_minhash_auto_cap.
        #
        # Recall contract when the cap DOES engage: a pair whose only
        # colliding bands are pruned is lost. In a boilerplate bucket the
        # shared band signature comes from the shared boilerplate tokens,
        # i.e. exactly the regime where band collision stops implying
        # near-duplication — the pruned pairs are overwhelmingly
        # verify-rejects (the adversarial test constructs this shape and
        # shows an UNCHANGED result set at 1/300th the candidate count).
        wcap = Window.partitionBy("band", "bkey")
        bands = bands.withColumn("bsz", F.count(F.lit(1)).over(wcap))
        if bucket_cap == "auto":
            cap_df = bands.groupBy().agg(
                F.ceil(F.lit(auto_cap_mult) * F.sqrt(F.count(F.lit(1)))).alias(
                    "cap"
                )
            )
            bands = bands.crossJoin(F.broadcast(cap_df))
        else:
            bands = bands.withColumn("cap", F.lit(int(bucket_cap)))
        # Per-doc survival mask over ALL its bands (one small doc_id-keyed
        # window shuffle, 4 rows/doc): with it, a pair is emitted from its
        # first band where BOTH rows survived the cap — exactly-once
        # emission WITHOUT a pair-distinct shuffle, fixing the r3 capped
        # path that paid a dropDuplicates over the (possibly huge) pair
        # stream. Every doc has exactly _N_PERM/2 band rows, so the sorted
        # mask is always index-aligned with `bks`.
        wdoc = Window.partitionBy("doc_id")
        bands = (
            bands.withColumn(
                "svraw",
                F.collect_list(
                    F.struct(
                        F.col("band").alias("band"),
                        (F.col("bsz") <= F.col("cap")).alias("ok"),
                    )
                ).over(wdoc),
            )
            .withColumn("svb", F.expr("transform(array_sort(svraw), x -> x.ok)"))
            .filter(F.col("bsz") <= F.col("cap"))
            .drop("svraw", "cap")
        )
        # CRITICAL: re-spread after the windows. The (band,bkey) window
        # shuffle leaves every bucket's rows CO-LOCATED in one partition,
        # so the band join's quadratic residual work for a hot bucket
        # (sf0.1: a 3,921-row bucket → ~15M pair evaluations) runs on a
        # single task — measured 8s → 56s when this repartition is
        # omitted (the r3 int-capped path had the same latent skew). A
        # round-robin exchange of the tiny band-row stream restores
        # probe-side parallelism: every task probes the broadcast/hash
        # table independently, so hot-bucket pairs are generated across
        # all cores.
        #
        # Bucket salting (sf1 stress finding): RR-respread fixes skew only
        # on the BROADCAST path. Once the band-row side outgrows the
        # broadcast threshold (measured at sf1/50k docs; certain at 100 TB
        # where band rows are ~400 B/doc), the planner picks a
        # shuffle join that re-co-locates each bucket on one task — the
        # sf1 sweep measured 140 s vs 51 s broadcast for identical work.
        # So surviving buckets bigger than _SALT_TARGET rows split into
        # k = ceil(bsz/_SALT_TARGET) salt classes: build rows hash to ONE
        # class (pmod(xxhash64(doc_id), k)), probe rows EXPLODE across all
        # k, and salt joins as an extra equi-key — a bucket's pair space
        # then spans k sub-keys that hash to different partitions under
        # any join strategy. Exactly-once by construction (a pair meets
        # only at the build row's class), so no dedup pass; k=1 for
        # ordinary buckets makes this a no-op row-wise. Probe replication
        # happens AFTER the RR exchange (row-local explode, never
        # shuffled), and the build side is untouched, so the broadcast
        # relation does not grow.
        bands = fan_out(bands).withColumn(
            "k",
            F.least(
                F.lit(_SALT_MAX), F.ceil(F.col("bsz") / F.lit(_SALT_TARGET))
            ).cast("int"),
        )
        bands_probe = bands.withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.col("k") - 1))
        ).drop("k", "bsz")
        bands_build = bands.withColumn(
            "salt",
            F.pmod(F.xxhash64(F.col("doc_id")), F.col("k")).cast("int"),
        ).drop("k", "bsz")
        a, b = bands_probe.alias("a"), bands_build.alias("b")
    else:
        a, b = bands.alias("a"), bands.alias("b")
    first_collision = F.lit(True)
    for j in range(_N_BANDS - 1):
        collides_j = F.element_at(F.col("a.bks"), j + 1) == F.element_at(
            F.col("b.bks"), j + 1
        )
        if capped:
            # an earlier band suppresses this emission only if BOTH rows
            # survived it there (a pruned band emits nothing)
            collides_j = (
                collides_j
                & F.element_at(F.col("a.svb"), j + 1)
                & F.element_at(F.col("b.svb"), j + 1)
            )
        first_collision = first_collision & ((F.col("a.band") <= j) | ~collides_j)
    # Length filter (lossless): J >= 0.8 forces 0.8*|a| <= |b| <= |a|/0.8.
    # Evaluated on precomputed int sizes in the join residual, it prunes
    # ~40% of candidate pairs BEFORE the array_intersect verify (the
    # dominant cost: integer compare vs per-pair set intersection). The
    # output set is unchanged, so the oracle needs no mirror.
    length_ok = (
        F.col("b.sz") * F.lit(0.8) <= F.col("a.sz")
    ) & (F.col("a.sz") * F.lit(0.8) <= F.col("b.sz"))
    join_cond = (
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bkey") == F.col("b.bkey"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
        & length_ok
    )
    if capped:
        join_cond = join_cond & (F.col("a.salt") == F.col("b.salt"))
    pairs = a.join(corpus_side(b, strategy), join_cond).filter(first_collision)
    paired = pairs.select(
        F.col("a.doc_id").alias("doc_lo"),
        F.col("b.doc_id").alias("doc_hi"),
        F.col("a.hs").alias("hs_a"),
        F.col("b.hs").alias("hs_b"),
        F.col("a.sz").alias("sz_a"),
        F.col("b.sz").alias("sz_b"),
    )
    # r8 (guide §7.2 duplicated-subtree): the jaccard filter used to push
    # into the band join as a residual condition, so array_intersect ran
    # once per CANDIDATE in the condition and again per SURVIVOR in the
    # project (~9M evaluations for ~6M candidates). Emitting the
    # intersection size through a one-element explode puts it behind a
    # Generate, and a filter on a generator OUTPUT column cannot be pushed
    # below the Generate — one intersect per candidate, deterministic.
    # Measured: verify leg 10.3 s -> ~3-5 s warm at sf0.1.
    verified = paired.select(
        "doc_lo",
        "doc_hi",
        "sz_a",
        "sz_b",
        F.explode(
            F.array(F.size(F.array_intersect(F.col("hs_a"), F.col("hs_b"))))
        ).alias("i"),
    )
    jac = F.col("i").cast("double") / (
        F.col("sz_a") + F.col("sz_b") - F.col("i")
    )
    return (
        verified.filter(jac >= 0.8)
        .select("doc_lo", "doc_hi", F.round(jac, 4).alias("jaccard"))
    )


_N_BITS = 16  # simhash width


@register(
    "q_dedup_simhash",
    oracle=f"""
        WITH h AS (
            SELECT doc_id,
                   list_transform(string_split(text, ' '),
                       t -> ('0x' || substr(md5(t), 1, 8))::BIGINT) AS hs
            FROM documents
        ),
        fp AS (
            SELECT doc_id,
                   CAST({' + '.join(
                       f"(CASE WHEN 2 * len(list_filter(hs, v -> ((v >> {i}) & 1) = 1))"
                       f" >= len(hs) THEN {1 << i} ELSE 0 END)"
                       for i in range(_N_BITS))} AS BIGINT) AS simhash
            FROM h
        )
        SELECT doc_id, simhash,
               MIN(doc_id) OVER (PARTITION BY simhash) AS group_rep
        FROM fp
    """,
    section="D2",
    doc="16-bit SimHash fingerprint (majority vote per bit over md5 token "
    "hashes, hashed once per doc) + dup-group representative by fingerprint.",
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import fan_out

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    h = docs.select(
        "doc_id",
        F.expr(
            "transform(split(text, ' '),"
            " t -> cast(conv(substr(md5(t), 1, 8), 16, 10) as bigint))"
        ).alias("hs"),
    )
    bit_terms = " + ".join(
        f"(case when 2 * size(filter(hs, v -> (shiftright(v, {i}) & 1) = 1))"
        f" >= size(hs) then {1 << i} else 0 end)"
        for i in range(_N_BITS)
    )
    fp = h.select("doc_id", F.expr(f"cast({bit_terms} as bigint)").alias("simhash"))
    return fp.select(
        "doc_id",
        "simhash",
        F.min("doc_id").over(Window.partitionBy("simhash")).alias("group_rep"),
    )


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


def _dot_col(a: str, b: str) -> Column:
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm_col(a: str) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(F.col(a), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


@register(
    "q_dedup_embedding_cosine",
    oracle=f"""
        SELECT a.vec_id AS vec_lo, b.vec_id AS vec_hi, a.label AS label,
               ROUND({_dot_duck('a', 'b')} / ({_nsq_duck('a')} * {_nsq_duck('b')}), 4)
                   AS cosine
        FROM embeddings a
        JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE ROUND({_dot_duck('a', 'b')} / ({_nsq_duck('a')} * {_nsq_duck('b')}), 4)
              >= 0.3
    """,
    section="D3",
    doc="Embedding-cosine near-duplicate pairs, label-blocked (the block key "
    "is an IVF coarse-cluster id at scale): pairs generated within blocks "
    "only, cosine in DOUBLE with left-to-right folds, threshold on the "
    "rounded value (drift-safe). Scale contract (measured, sf1 sweep): "
    "exact all-pairs-within-block is intrinsically QUADRATIC in block "
    "size — with the block count fixed, 10x rows measured 29x wall "
    "(100x candidate pairs). This operator is therefore the VERIFY stage "
    "you run on blocks whose size is already bounded by construction "
    "(IVF cells from V6, LSH buckets from D7 — both measured <= 3.9x at "
    "10x data); it is not the corpus-level discovery path (that is "
    "D1/D7).",
)
def q_dedup_embedding_cosine(
    spark: SparkSession, sf_dir: str, strategy: str = "auto"
) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import corpus_side, fan_out

    emb = load_table(spark, sf_dir, "embeddings")
    # norms computed ONCE per vector before the pair join (not per pair):
    # O(n) sqrt-folds instead of O(pairs)
    a = fan_out(
        emb.select(
            F.col("vec_id").alias("vec_lo"),
            F.col("label"),
            F.col("embedding").alias("ea"),
        ).withColumn("na", _norm_col("ea"))
    )
    b = emb.select(
        F.col("vec_id").alias("vec_hi"),
        F.col("label").alias("label_b"),
        F.col("embedding").alias("eb"),
    ).withColumn("nb", _norm_col("eb"))
    cos = F.round(_dot_col("ea", "eb") / (F.col("na") * F.col("nb")), 4)
    return (
        a.join(
            corpus_side(b, strategy),
            (F.col("label") == F.col("label_b")) & (F.col("vec_lo") < F.col("vec_hi")),
        )
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= 0.3)
        .select("vec_lo", "vec_hi", "label", "cosine")
    )


@register(
    "q_ann_ivf_topk",
    oracle=f"""
        WITH cells AS (
            SELECT vec_id, embedding,
                   4 * (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END)
                 + 2 * (CASE WHEN embedding[2] >= 0 THEN 1 ELSE 0 END)
                 +     (CASE WHEN embedding[3] >= 0 THEN 1 ELSE 0 END) AS cell
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
            FROM (SELECT * FROM cells WHERE vec_id < 10) a
            JOIN cells b ON a.cell = b.cell AND b.vec_id <> a.vec_id
        ) WHERE rank <= 3
    """,
    section="D4",
    doc="IVF-style bucket-pruned approximate k-NN: deterministic coarse "
    "quantizer (sign bits of dims 1-3 = 8 cells) prunes the candidate space; "
    "top-3 per query within the query's cell. Output ids+rank only "
    "(float-drift-immune). Queries broadcast; corpus side never shuffles.",
)
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cell = (
        (F.element_at("embedding", 1) >= 0).cast("int") * 4
        + (F.element_at("embedding", 2) >= 0).cast("int") * 2
        + (F.element_at("embedding", 3) >= 0).cast("int")
    )
    from ai_to_cvent_etl_spark.queries._util import fan_out

    cells = emb.select("vec_id", "embedding", cell.alias("cell"))
    q = cells.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("cell").alias("qcell"),
    ).withColumn("nq", _norm_col("qe"))
    n = fan_out(
        cells.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("ne"),
            F.col("cell").alias("ncell"),
        ).withColumn("nn", _norm_col("ne"))
    )
    sim = _dot_col("qe", "ne") / (F.col("nq") * F.col("nn"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        F.broadcast(q)
        .join(n, (F.col("qcell") == F.col("ncell")) & (F.col("neighbor_id") != F.col("query_id")))
        .withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 3)
        .select("query_id", "neighbor_id", "rank")
    )


@register(
    "q_dedup_components",
    oracle="""
        WITH RECURSIVE tok AS (
            SELECT doc_id, list_distinct(string_split(text, ' ')) AS ts
            FROM documents WHERE lang = 'de'
        ),
        pairs AS (
            SELECT a.doc_id AS doc_lo, b.doc_id AS doc_hi
            FROM tok a JOIN tok b ON a.doc_id < b.doc_id
            WHERE CAST(len(list_filter(a.ts, x -> list_contains(b.ts, x))) AS DOUBLE)
                  / (len(a.ts) + len(b.ts)
                     - len(list_filter(a.ts, x -> list_contains(b.ts, x)))) >= 0.95
        ),
        edges AS (
            SELECT doc_lo AS src, doc_hi AS dst FROM pairs
            UNION ALL
            SELECT doc_hi AS src, doc_lo AS dst FROM pairs
        ),
        walk(node, lab) AS (
            SELECT doc_id, doc_id FROM documents WHERE lang = 'de'
            UNION
            SELECT e.dst, w.lab FROM walk w JOIN edges e ON e.src = w.node
        )
        SELECT node AS doc_id, MIN(lab) AS component,
               CAST(COUNT(*) OVER (PARTITION BY MIN(lab)) AS BIGINT) AS cluster_size
        FROM walk GROUP BY node
    """,
    section="D5",
    doc="Dedup clustering: connected components over the Jaccard>=0.95 "
    "near-dup graph via iterative min-label propagation with pointer "
    "doubling (operators/dedup.py connected_components — localCheckpoint-"
    "truncated lineage, label-sum convergence, O(log diameter) rounds). "
    "component = min doc_id reachable; the canonical-doc choice every dedup "
    "pipeline needs after pair-finding. Scoped to one language partition — "
    "the realistic shape (dedup within partition); this corpus's full "
    "near-dup graph is adversarially dense (24% of all pairs). Oracle: "
    "DuckDB recursive CTE computing min reachable label.",
)
def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.operators.dedup import (
        connected_components,
        near_dup_pairs,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "de")
    pairs = near_dup_pairs(docs, threshold=0.95).select("doc_lo", "doc_hi")
    comp = connected_components(pairs, docs.select("doc_id"))
    w = Window.partitionBy("component")
    return comp.withColumn(
        "cluster_size", F.count(F.lit(1)).over(w).cast("bigint")
    )


@register(
    "q_dedup_cluster_stats",
    oracle="""
        WITH RECURSIVE tok AS (
            SELECT doc_id, list_distinct(string_split(text, ' ')) AS ts
            FROM documents WHERE lang = 'de'
        ),
        pairs AS (
            SELECT a.doc_id AS doc_lo, b.doc_id AS doc_hi
            FROM tok a JOIN tok b ON a.doc_id < b.doc_id
            WHERE CAST(len(list_filter(a.ts, x -> list_contains(b.ts, x))) AS DOUBLE)
                  / (len(a.ts) + len(b.ts)
                     - len(list_filter(a.ts, x -> list_contains(b.ts, x)))) >= 0.95
        ),
        edges AS (
            SELECT doc_lo AS src, doc_hi AS dst FROM pairs
            UNION ALL
            SELECT doc_hi AS src, doc_lo AS dst FROM pairs
        ),
        walk(node, lab) AS (
            SELECT doc_id, doc_id FROM documents WHERE lang = 'de'
            UNION
            SELECT e.dst, w.lab FROM walk w JOIN edges e ON e.src = w.node
        ),
        comp AS (
            SELECT node AS doc_id, MIN(lab) AS component
            FROM walk GROUP BY node
        ),
        clusters AS (
            SELECT component, CAST(COUNT(*) AS BIGINT) AS cluster_size
            FROM comp GROUP BY component
        )
        SELECT cluster_size,
               CAST(COUNT(*) AS BIGINT) AS n_clusters,
               CAST(COUNT(*) * cluster_size AS BIGINT) AS n_docs
        FROM clusters
        GROUP BY cluster_size
    """,
    section="D9",
    doc="Dedup-pipeline QA: duplicate-cluster size distribution over D5's "
    "connected components (how much of the corpus collapses, and into "
    "what shapes — the acceptance report run after every dedup pass; a "
    "sudden giant cluster means the threshold or blocking broke). Two "
    "keyed aggregations on top of the iterative components operator; "
    "all-integer, exact.",
)
def q_dedup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.operators.dedup import (
        connected_components,
        near_dup_pairs,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "de")
    pairs = near_dup_pairs(docs, threshold=0.95).select("doc_lo", "doc_hi")
    comp = connected_components(pairs, docs.select("doc_id"))
    clusters = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return clusters.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        (F.count(F.lit(1)) * F.col("cluster_size")).alias("n_docs"),
    )


# ==== from analytics_r3c ===========================================

_CANON_SPARK = (
    "md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' '),"
    " ' +', ' ')))"
)

_CANON_DUCK = (
    "md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ',"
    " 'g'), ' +', ' ', 'g')))"
)

@register(
    "q_dedup_canonicalize",
    oracle=f"""
        WITH c AS (
            SELECT doc_id, n_chars, {_CANON_DUCK} AS ckey
            FROM documents
        )
        SELECT ckey,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(MIN(doc_id) AS BIGINT) AS canonical_doc,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM c GROUP BY ckey
    """,
    section="D10",
    doc="Canonicalization dedup (the URL/text-normalization tier that runs "
    "BEFORE MinHash in a real pipeline): lowercase, strip punctuation, "
    "collapse whitespace, md5 the canonical form, keep min-doc_id per "
    "canonical group. Normalization is row-local (map-only); the single "
    "shuffle is the keyed group on the 16-byte canonical hash — never on "
    "the text itself. Regexes use the Java/RE2 common subset so both "
    "engines canonicalize identically.",
)
def q_dedup_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", "n_chars", F.expr(_CANON_SPARK).alias("ckey"))
        .groupBy("ckey")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("canonical_doc"),
            F.sum("n_chars").alias("total_chars"),
        )
    )

# ==== from analytics_r3n ===========================================

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

# ==== from analytics_r3q ===========================================

@register(
    "q_dedup_record_link",
    oracle="""
        WITH src AS (
            SELECT c_custkey, c_nationkey, c_acctbal, c_name FROM customer
        ),
        replica AS (
            SELECT c_nationkey, c_acctbal,
                   substr(c_name, 1,
                          CAST(c_custkey % length(c_name) AS INT))
                   || substr(c_name,
                             CAST(c_custkey % length(c_name) AS INT) + 2)
                       AS r_name
            FROM customer
        )
        SELECT s.c_custkey,
               r.r_name,
               CAST(levenshtein(s.c_name, r.r_name) AS INT) AS lev
        FROM src s
        JOIN replica r
          ON r.c_nationkey = s.c_nationkey AND r.c_acctbal = s.c_acctbal
        WHERE levenshtein(s.c_name, r.r_name) <= 1
    """,
    section="D12",
    doc="Fuzzy record LINKAGE across sources (master-data join — "
    "distinct from self-dedup D1-D11): a replica feed whose names "
    "carry a deterministic one-character deletion (position keyed by "
    "custkey) and NO shared primary key is re-linked to the source by "
    "equality BLOCKING on (nationkey, acctbal) with a Levenshtein≤1 "
    "verify inside blocks. Pure integer/string logic. The blocked-"
    "linkage shape: candidate pairs exist only within blocks, so the "
    "quadratic verify is per-block tiny; at scale multiple blocking "
    "passes (D11's phonetic key, sorted-neighborhood windows) union "
    "their candidates before one shared verify.",
)
def q_dedup_record_link(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    src = c.select("c_custkey", "c_nationkey", "c_acctbal", "c_name")
    pos = (F.col("c_custkey") % F.length("c_name")).cast("int")
    replica = c.select(
        "c_nationkey",
        "c_acctbal",
        F.concat(
            F.expr("substr(c_name, 1, CAST(c_custkey % length(c_name) AS INT))"),
            F.expr(
                "substr(c_name, CAST(c_custkey % length(c_name) AS INT) + 2)"
            ),
        ).alias("r_name"),
    )
    j = src.join(replica, ["c_nationkey", "c_acctbal"])
    lev = F.levenshtein(F.col("c_name"), F.col("r_name"))
    return j.where(lev <= 1).select(
        "c_custkey", "r_name", lev.cast("int").alias("lev")
    )

# ==== from analytics_r3v ===========================================

_D13_WINDOW = 50

_D13_PERM = 8

@register(
    "q_dedup_minhash_est",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, list_distinct(string_split(text, ' ')) AS ts
            FROM documents WHERE doc_id < {_D13_WINDOW}
        ),
        sig AS (
            SELECT doc_id, ts,
                   [{', '.join(_mh_duck(i) for i in range(_D13_PERM))}] AS mh
            FROM toks
        )
        SELECT a.doc_id AS doc_lo, b.doc_id AS doc_hi,
               CAST(len(list_filter(range(1, {_D13_PERM + 1}),
                        i -> a.mh[i] = b.mh[i])) AS DOUBLE)
                   / {_D13_PERM} AS est_jaccard,
               CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE)
                   / (len(a.ts) + len(b.ts)
                      - len(list_intersect(a.ts, b.ts))) AS exact_jaccard
        FROM sig a JOIN sig b ON b.doc_id > a.doc_id
        WHERE len(list_intersect(a.ts, b.ts)) > 0
    """,
    section="D13",
    doc=f"Minhash estimator calibration: for every overlapping pair in a "
    f"bounded doc window (doc_id < {_D13_WINDOW}), the signature-"
    f"agreement Jaccard estimate (fraction of {_D13_PERM} permutations "
    "agreeing — D1's exact permutation family) next to the exact "
    "token-set Jaccard. Estimates are k/8 fractions (exact in binary) "
    "and exact Jaccards are integer ratios — both bit-deterministic. "
    "This is how D1's LSH band/threshold parameters get tuned on a "
    "real corpus: the joint distribution of (estimate, truth) IS the "
    "collision-probability curve. Production calibration samples "
    "pairs from LSH candidates (no quadratic anywhere); the explicit "
    "window here keeps the declared query bounded at every SF.",
)
def q_dedup_minhash_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.where(F.col("doc_id") < _D13_WINDOW).select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("ts")
    )
    sig = toks.select(
        "doc_id",
        "ts",
        F.array(*[F.expr(_mh_spark(i)) for i in range(_D13_PERM)]).alias(
            "mh"
        ),
    )
    a = sig.alias("a")
    b = sig.alias("b")
    j = a.join(F.broadcast(b), F.col("b.doc_id") > F.col("a.doc_id"))
    inter = F.size(F.array_intersect(F.col("a.ts"), F.col("b.ts")))
    agree = F.size(
        F.filter(
            F.zip_with(
                F.col("a.mh"), F.col("b.mh"), lambda x, y: x == y
            ),
            lambda eq: eq,
        )
    )
    return j.where(inter > 0).select(
        F.col("a.doc_id").alias("doc_lo"),
        F.col("b.doc_id").alias("doc_hi"),
        (agree.cast("double") / _D13_PERM).alias("est_jaccard"),
        (
            inter.cast("double")
            / (F.size(F.col("a.ts")) + F.size(F.col("b.ts")) - inter)
        ).alias("exact_jaccard"),
    )

# ==== from analytics_r3w ===========================================

@register(
    "q_dedup_url_canonical",
    oracle="""
        WITH raw AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END
                   || '://'
                   || CASE WHEN doc_id % 4 < 2 THEN 'Example.ORG'
                           ELSE 'example.org' END
                   || CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END
                   || '/page/' || CAST(doc_id // 4 AS VARCHAR)
                   || CASE WHEN doc_id % 2 = 0 THEN '?b=2&a=1'
                           ELSE '?a=1&b=2' END
                   || CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END
                       AS url
            FROM documents
        ),
        canon AS (
            SELECT doc_id,
                   lower(regexp_extract(url, '^([a-zA-Z]+)://', 1)) || '://'
                   || lower(regexp_extract(url, '://([^/:?#]+)', 1))
                   || regexp_extract(url, '://[^/?#]+([^?#]*)', 1)
                   || '?'
                   || array_to_string(list_sort(string_split(
                          regexp_extract(url, '\\?([^#]*)', 1), '&')), '&')
                       AS curl
            FROM raw
        )
        SELECT curl,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               MIN(doc_id) AS canonical_doc
        FROM canon
        GROUP BY curl
    """,
    section="D14",
    doc="URL canonicalization dedup (the crawl-dedup step BEFORE any "
    "content hashing): deterministically messy variants — protocol/"
    "host case, explicit default :443 port, shuffled query-param "
    "order, fragments — collapse under a canonicalizer built from "
    "regexp extraction + lowercase + sorted param re-join + fragment "
    "drop; pages (doc_id÷4 path groups) then collapse to one "
    "canonical record (min doc_id). Pure string algebra. Map-only "
    "canonicalization + one keyed reduction; at crawl scale the "
    "canonical URL is the co-location key that puts every variant of "
    "a page in one bucket (F17 extracts the parts; this normalizes "
    "them).",
)
def q_dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.when(F.col("doc_id") % 2 == 0, "HTTPS").otherwise("https"),
        F.lit("://"),
        F.when(F.col("doc_id") % 4 < 2, "Example.ORG").otherwise(
            "example.org"
        ),
        F.when(F.col("doc_id") % 3 == 0, ":443").otherwise(""),
        F.lit("/page/"),
        F.expr("CAST(doc_id DIV 4 AS STRING)"),
        F.when(F.col("doc_id") % 2 == 0, "?b=2&a=1").otherwise("?a=1&b=2"),
        F.when(F.col("doc_id") % 5 == 0, "#frag").otherwise(""),
    )
    raw = docs.select("doc_id", url.alias("url"))
    curl = F.concat(
        F.lower(F.regexp_extract("url", r"^([a-zA-Z]+)://", 1)),
        F.lit("://"),
        F.lower(F.regexp_extract("url", r"://([^/:?#]+)", 1)),
        F.regexp_extract("url", r"://[^/?#]+([^?#]*)", 1),
        F.lit("?"),
        F.array_join(
            F.array_sort(
                F.split(F.regexp_extract("url", r"\?([^#]*)", 1), "&")
            ),
            "&",
        ),
    )
    return (
        raw.select("doc_id", curl.alias("curl"))
        .groupBy("curl")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("canonical_doc"),
        )
    )

# ==== from analytics_r4c ===========================================

_D15_T = 0.8

@register(
    "q_dedup_cross_corpus",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, doc_id % 2 = 0 AS is_train,
                   list_distinct(string_split(text, ' ')) AS ts
            FROM documents
        ),
        sig AS (
            SELECT doc_id, is_train,
                   {', '.join(f'{_mh_duck(i)} AS mh{i}' for i in range(_N_PERM))}
            FROM toks
        ),
        bands AS (
            {' UNION ALL '.join(
                f"SELECT doc_id, is_train, {b} AS band, "
                f"md5(mh{2 * b} || mh{2 * b + 1}) AS bkey FROM sig"
                for b in range(_N_BANDS))}
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS train_doc, b.doc_id AS eval_doc
            FROM bands a
            JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
                        AND a.is_train AND NOT b.is_train
        )
        SELECT train_doc, eval_doc,
               ROUND(CAST(len(list_filter(ta.ts,
                              x -> list_contains(tb.ts, x))) AS DOUBLE)
                     / (len(ta.ts) + len(tb.ts)
                        - len(list_filter(ta.ts,
                              x -> list_contains(tb.ts, x)))), 4) AS jaccard
        FROM cand
        JOIN toks ta ON ta.doc_id = cand.train_doc
        JOIN toks tb ON tb.doc_id = cand.eval_doc
        WHERE CAST(len(list_filter(ta.ts, x -> list_contains(tb.ts, x)))
                   AS DOUBLE)
              / (len(ta.ts) + len(tb.ts)
                 - len(list_filter(ta.ts, x -> list_contains(tb.ts, x))))
              >= {_D15_T}
    """,
    section="D15",
    doc="Train-vs-eval decontamination at PAIR level: the corpus splits "
    "into train (even doc_id) and eval (odd), MinHash-LSH candidates "
    "form only ACROSS the two sides (bipartite band join — no "
    "self-pairs, half the pair space of D1), and candidates verify "
    "with exact Jaccard ≥ 0.8. The leakage report L8's containment "
    "check summarizes; this emits the actual contaminated pairs for "
    "removal. Incremental shape at scale: the frozen eval side's band "
    "keys persist, and each new training shard joins against them "
    "without re-hashing eval — decontamination becomes a per-shard "
    "lookup, not a corpus-wide rescan.",
)
def q_dedup_cross_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import fan_out

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        (F.col("doc_id") % 2 == 0).alias("is_train"),
        F.array_distinct(F.split("text", " ")).alias("ts"),
    )
    sig = fan_out(
        toks.select(
            "doc_id",
            "is_train",
            "ts",
            F.array(
                *[
                    F.md5(
                        F.concat(
                            F.expr(_mh_spark(2 * b)),
                            F.expr(_mh_spark(2 * b + 1)),
                        )
                    )
                    for b in range(_N_BANDS)
                ]
            ).alias("bks"),
        )
    )
    bands = sig.select(
        "doc_id",
        "is_train",
        "ts",
        "bks",
        F.posexplode("bks").alias("band", "bkey"),
    )
    a = bands.where("is_train").select(
        F.col("doc_id").alias("train_doc"),
        F.col("ts").alias("ts_a"),
        F.col("bks").alias("bks_a"),
        "band",
        "bkey",
    )
    b = bands.where(~F.col("is_train")).select(
        F.col("doc_id").alias("eval_doc"),
        F.col("ts").alias("ts_b"),
        F.col("bks").alias("bks_b"),
        "band",
        "bkey",
    )
    # D1's first-colliding-band device, bipartite: both sides carry ALL
    # their band keys, and a pair colliding in several bands is emitted
    # ONLY from its lowest matching band — a ROW-LOCAL filter, so no
    # pair-distinct shuffle ever materializes the candidate multiset
    # (the groupBy formulation carried token arrays through a pair-keyed
    # exchange and OOM'd the sf0.1 selfcheck session).
    #
    # r8 (guide §1.2 per-task work): the gate was an interpreted
    # zip_with+filter+slice lambda chain evaluated once per enumerated
    # candidate (5.3M at sf0.1 — measured as the dominant leg); the
    # unrolled element_at conjunction below is the SAME predicate (no
    # earlier band has equal keys; bks entries are never null) in
    # codegen-able scalar form — D1's device.
    first_band = F.lit(True)
    for j in range(_N_BANDS - 1):
        first_band = first_band & (
            (F.col("band") <= j)
            | (
                F.element_at(F.col("bks_a"), j + 1)
                != F.element_at(F.col("bks_b"), j + 1)
            )
        )
    cand = a.join(b, ["band", "bkey"]).where(first_band)
    # r8 (guide §7.2): same explode barrier as D1/T5' — without it the
    # jaccard gate is pushed into the band join as a residual and the
    # (string-array!) intersect runs once per candidate there plus once
    # per survivor in the project. A filter on a generator output cannot
    # cross the Generate; one intersect per candidate, deterministic.
    ver = cand.select(
        "train_doc",
        "eval_doc",
        F.size("ts_a").alias("sz_a"),
        F.size("ts_b").alias("sz_b"),
        F.explode(
            F.array(F.size(F.array_intersect(F.col("ts_a"), F.col("ts_b"))))
        ).alias("i"),
    )
    jac = F.col("i").cast("double") / (
        F.col("sz_a") + F.col("sz_b") - F.col("i")
    )
    return ver.where(jac >= _D15_T).select(
        "train_doc", "eval_doc", F.round(jac, 4).alias("jaccard")
    )

# ==== from analytics_r4d ===========================================

@register(
    "q_dedup_normalized",
    oracle="""
        WITH norm AS (
            SELECT doc_id,
                   md5(regexp_replace(
                       trim(lower(
                           CASE WHEN doc_id % 3 = 0 THEN '  ' || upper(text)
                                WHEN doc_id % 3 = 1
                                THEN regexp_replace(text, ' ', '   ', 'g')
                                ELSE text END)),
                       ' +', ' ', 'g')) AS ckey
            FROM documents
        )
        SELECT ckey,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               MIN(doc_id) AS canonical_doc,
               COUNT(*) > 1 AS is_dup_group
        FROM norm
        GROUP BY ckey
    """,
    section="D16",
    doc="Normalization-tier dedup: documents deterministically reformatted "
    "(every 3rd uppercased with leading spaces, every 3rd+1 with "
    "inflated whitespace) collapse under lower + trim + whitespace-"
    "collapse + md5 — the tier BETWEEN byte-exact dedup (U6, which "
    "these variants evade) and near-dup LSH (D1, which pays signature "
    "cost for what a string normalization catches free). Groups by "
    "canonical hash with min-doc canonical record. One keyed shuffle "
    "at exact-dedup cost; every pair this tier catches is one the "
    "quadratic-ish tiers never see — tier ordering IS the dedup "
    "budget (U6 → D16 → D14 URLs → D1/D3 → T5 verify).",
)
def q_dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    messy = (
        F.when(F.col("doc_id") % 3 == 0, F.concat(F.lit("  "), F.upper("text")))
        .when(
            F.col("doc_id") % 3 == 1,
            F.regexp_replace("text", " ", "   "),
        )
        .otherwise(F.col("text"))
    )
    ckey = F.md5(
        F.regexp_replace(F.trim(F.lower(messy)), " +", " ")
    )
    return (
        docs.select("doc_id", ckey.alias("ckey"))
        .groupBy("ckey")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("canonical_doc"),
            (F.count("*") > 1).alias("is_dup_group"),
        )
    )


# ==== fifty-fifth wave (r4) ===================================================

_BBIT_K = 16      # permutations for the 1-bit signature
_BBIT_DOCS = 40   # calibration pair set: all pairs of the first 40 docs


def _bbit_sig_spark() -> str:
    mins = ", ".join(
        f"conv(substr({_mh_spark(i)}, 16, 1), 16, 10) % 2"
        for i in range(_BBIT_K)
    )
    return f"array({mins})"


def _bbit_sig_duck() -> str:
    mins = ", ".join(
        f"CAST(('0x' || substr({_mh_duck(i)}, 16, 1)) AS BIGINT) % 2"
        for i in range(_BBIT_K)
    )
    return f"[{mins}]"


@register(
    "q_dedup_bbit_minhash",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, string_split(text, ' ') AS ts
            FROM documents WHERE doc_id < {_BBIT_DOCS}
        ),
        sig AS (
            SELECT doc_id, ts, {_bbit_sig_duck()} AS bits
            FROM d
        ),
        pairs AS (
            SELECT a.doc_id AS lo, b.doc_id AS hi,
                   len(list_intersect(a.ts, b.ts))
                       / (1.0 * len(list_distinct(a.ts || b.ts))) AS j_exact,
                   GREATEST(
                       2.0 * list_sum(list_transform(range(1, {_BBIT_K} + 1),
                           i -> CASE WHEN a.bits[i] = b.bits[i]
                                     THEN 1 ELSE 0 END)) / {_BBIT_K} - 1,
                       0.0) AS j_bbit
            FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        )
        SELECT CAST(FLOOR(j_exact * 5) AS BIGINT) AS j_bin,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               ROUND(SUM(CAST(FLOOR(1e9 * j_exact) AS BIGINT))
                     / (1e9 * COUNT(*)), 6) AS mean_exact,
               ROUND(SUM(CAST(FLOOR(1e9 * j_bbit) AS BIGINT))
                     / (1e9 * COUNT(*)), 6) AS mean_bbit
        FROM pairs
        GROUP BY 1
    """,
    section="D17",
    doc=f"b-bit MinHash calibration (Li & Koenig, b=1): keep only the "
    f"LOWEST BIT of each of {_BBIT_K} minhash values — a {_BBIT_K}-bit "
    "signature, 32x smaller than D1's full signatures — and estimate "
    "Jaccard via J = 2·(bit-match fraction) − 1 (for b=1 the match "
    "probability is (1+J)/2). The calibration table bins exact Jaccard "
    "and compares the bbit estimate's mean per bin: the storage/"
    "accuracy tradeoff measurement that justifies (or rejects) "
    "shipping 1-bit signatures at 100 TB (D13 calibrates the full "
    "estimator; this prices its compressed form — variance is "
    f"2x/bit-dropped higher, visible in the wide bins). All "
    "ingredients exact: bit equality counts are integers, per-pair "
    "ratios are single divisions, cross-pair means use the "
    "floor-quantized BIGINT device. The pair set is the bounded "
    f"{_BBIT_DOCS}-doc calibration block — signature GENERATION is "
    "the production-scale part (row-local, one pass); all-pairs "
    "exact Jaccard exists only to measure the estimator, never as a "
    "corpus-scale path (T5's caveat).",
)
def q_dedup_bbit_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _BBIT_DOCS)
        .select("doc_id", F.split("text", " ").alias("ts"))
    )
    sig = docs.select(
        "doc_id", "ts", F.expr(_bbit_sig_spark()).alias("bits")
    )
    a = sig.select(
        F.col("doc_id").alias("lo"),
        F.col("ts").alias("tsa"),
        F.col("bits").alias("ba"),
    )
    b = sig.select(
        F.col("doc_id").alias("hi"),
        F.col("ts").alias("tsb"),
        F.col("bits").alias("bb"),
    )
    pairs = a.join(b, F.col("lo") < F.col("hi")).select(
        (
            F.size(F.array_intersect("tsa", "tsb"))
            / (1.0 * F.size(F.array_distinct(F.concat("tsa", "tsb"))))
        ).alias("j_exact"),
        F.greatest(
            2.0
            * F.expr(
                f"aggregate(zip_with(ba, bb, (x, y) -> "
                f"if(x = y, 1, 0)), 0, (acc, v) -> acc + v)"
            )
            / _BBIT_K
            - 1,
            F.lit(0.0),
        ).alias("j_bbit"),
    )
    return pairs.groupBy(
        F.floor(F.col("j_exact") * 5).cast("bigint").alias("j_bin")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.round(
            F.sum(F.floor(1e9 * F.col("j_exact")).cast("bigint"))
            / (1e9 * F.count(F.lit(1))),
            6,
        ).alias("mean_exact"),
        F.round(
            F.sum(F.floor(1e9 * F.col("j_bbit")).cast("bigint"))
            / (1e9 * F.count(F.lit(1))),
            6,
        ).alias("mean_bbit"),
    )


@register(
    "q_dedup_cluster_representative",
    oracle="""
        WITH RECURSIVE tok AS (
            SELECT doc_id, list_distinct(string_split(text, ' ')) AS ts
            FROM documents WHERE lang = 'de'
        ),
        pairs AS (
            SELECT a.doc_id AS doc_lo, b.doc_id AS doc_hi
            FROM tok a JOIN tok b ON a.doc_id < b.doc_id
            WHERE CAST(len(list_filter(a.ts, x -> list_contains(b.ts, x))) AS DOUBLE)
                  / (len(a.ts) + len(b.ts)
                     - len(list_filter(a.ts, x -> list_contains(b.ts, x)))) >= 0.95
        ),
        edges AS (
            SELECT doc_lo AS src, doc_hi AS dst FROM pairs
            UNION ALL
            SELECT doc_hi AS src, doc_lo AS dst FROM pairs
        ),
        walk(node, lab) AS (
            SELECT doc_id, doc_id FROM documents WHERE lang = 'de'
            UNION
            SELECT e.dst, w.lab FROM walk w JOIN edges e ON e.src = w.node
        ),
        comp AS (
            SELECT node AS doc_id, MIN(lab) AS component
            FROM walk GROUP BY node
        ),
        ranked AS (
            SELECT c.component, c.doc_id, d.n_chars,
                   row_number() OVER (
                       PARTITION BY c.component
                       ORDER BY d.n_chars DESC, c.doc_id
                   ) AS rn,
                   CAST(COUNT(*) OVER (PARTITION BY c.component)
                        AS BIGINT) AS n_members
            FROM comp c JOIN documents d ON d.doc_id = c.doc_id
        )
        SELECT component, doc_id AS rep_doc_id,
               CAST(n_chars AS BIGINT) AS rep_n_chars,
               n_members,
               CAST(n_members - 1 AS BIGINT) AS n_dropped
        FROM ranked WHERE rn = 1
    """,
    section="D18",
    doc="Canonical-representative selection per near-dup cluster: after "
    "D5's connected components over the >=0.95-Jaccard graph, KEEP "
    "exactly one doc per cluster — the longest (n_chars DESC, doc_id "
    "tie-break) — and report what got dropped. This is the step that "
    "turns dedup ANALYSIS into a dedup ACTION: D1/D2 find pairs, D5 "
    "clusters them, this emits the survivor list a curation pipeline "
    "joins back to drop duplicates (the document-corpus sibling of "
    "E20's record survivorship). Deterministic by the total "
    "(quality, id) order. Scale: adds ONE per-cluster window over "
    "the component table (labels + a scalar per doc, no payloads) "
    "on top of the D5 machinery — the rollup is label-keyed and "
    "map-side combinable.",
)
def q_dedup_cluster_representative(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ai_to_cvent_etl_spark.operators.dedup import (
        connected_components,
        near_dup_pairs,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("lang") == "de"
    )
    pairs = near_dup_pairs(docs, threshold=0.95).select("doc_lo", "doc_hi")
    comp = connected_components(pairs, docs.select("doc_id"))
    joined = comp.join(
        docs.select("doc_id", "n_chars"), "doc_id"
    )
    w = Window.partitionBy("component")
    wr = Window.partitionBy("component").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        joined.withColumn(
            "n_members", F.count(F.lit(1)).over(w).cast("bigint")
        )
        .withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") == 1)
        .select(
            "component",
            F.col("doc_id").alias("rep_doc_id"),
            F.col("n_chars").cast("bigint").alias("rep_n_chars"),
            "n_members",
            (F.col("n_members") - 1).cast("bigint").alias("n_dropped"),
        )
    )


@register(
    "q_dedup_band_histogram",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, list_distinct(string_split(text, ' ')) AS ts
            FROM documents
        ),
        sig AS MATERIALIZED (
            SELECT doc_id,
                   {', '.join(
                       f"md5({_mh_duck(2 * b)} || {_mh_duck(2 * b + 1)})"
                       f" AS bk_{b}"
                       for b in range(_N_BANDS))}
            FROM toks
        ),
        bands AS MATERIALIZED (
            {' UNION ALL '.join(
                f"SELECT doc_id, {b} AS band, bk_{b} AS bkey FROM sig"
                for b in range(_N_BANDS))}
        ),
        buckets AS MATERIALIZED (
            SELECT band, bkey, CAST(COUNT(*) AS BIGINT) AS bsz
            FROM bands GROUP BY band, bkey
        ),
        cap AS (
            SELECT CAST(ceil(64 * sqrt(COUNT(*))) AS BIGINT) AS auto_cap
            FROM bands
        )
        SELECT CAST(band AS INT) AS band,
               CAST(COUNT(*) AS BIGINT) AS n_buckets,
               CAST(MAX(bsz) AS BIGINT) AS max_bucket,
               CAST(SUM(bsz * (bsz - 1) / 2) AS BIGINT) AS candidate_pairs,
               MAX(auto_cap) AS auto_cap,
               MAX(bsz) > MAX(auto_cap) AS cap_engages
        FROM buckets CROSS JOIN cap
        GROUP BY band
    """,
    section="D19",
    doc="LSH band-bucket calibration histogram: per band, the bucket "
    "count, the largest bucket, the implied candidate-pair mass "
    "sum(b*(b-1)/2), and D1's auto bucket cap "
    "ceil(64*sqrt(band rows)) with whether it would engage — the "
    "auditable readout BEHIND q_dedup_minhash_lsh's self-tuning "
    "skew guard (SCALE.md): run this BEFORE a 100 TB dedup to see "
    "whether the corpus is boilerplate-skewed (one giant bucket = "
    "quadratic candidates) and what the cap will prune. Shares D1's "
    "exact md5 minhash band keys, so the histogram describes the "
    "REAL join the dedup will run, not a proxy. Scale: signatures "
    "are row-local; one (band,bkey)-keyed count — the histogram "
    "never materializes candidate pairs.",
)
def q_dedup_band_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.array_distinct(F.split(F.col("text"), " ")).alias("ts")
    )
    sig = toks.select(
        "doc_id",
        F.array(
            *[
                F.md5(
                    F.concat(
                        F.expr(_mh_spark(2 * b)), F.expr(_mh_spark(2 * b + 1))
                    )
                )
                for b in range(_N_BANDS)
            ]
        ).alias("bks"),
    )
    bands = sig.select(
        "doc_id", F.posexplode("bks").alias("band", "bkey")
    )
    buckets = bands.groupBy("band", "bkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("bsz")
    )
    cap = bands.agg(
        F.ceil(64 * F.sqrt(F.count(F.lit(1)))).cast("bigint").alias(
            "auto_cap"
        )
    )
    return (
        buckets.crossJoin(F.broadcast(cap))
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
            F.max("bsz").cast("bigint").alias("max_bucket"),
            F.sum(
                F.col("bsz") * (F.col("bsz") - 1) / 2
            ).cast("bigint").alias("candidate_pairs"),
            F.max("auto_cap").alias("auto_cap"),
            (F.max("bsz") > F.max("auto_cap")).alias("cap_engages"),
        )
        .select(
            F.col("band").cast("int").alias("band"),
            "n_buckets",
            "max_bucket",
            "candidate_pairs",
            "auto_cap",
            "cap_engages",
        )
    )


_YIELD_THRESHOLDS = (0.7, 0.8, 0.9, 0.95)
_YIELD_CAND = 0.5   # candidate floor: pairs below this never report


@register(
    "q_dedup_yield_curve",
    oracle=f"""
        WITH tok AS MATERIALIZED (
            SELECT doc_id, list_distinct(string_split(text, ' ')) AS ts
            FROM documents WHERE lang = 'de'
        ),
        pairs AS MATERIALIZED (
            SELECT a.doc_id AS lo, b.doc_id AS hi,
                   CAST(len(list_filter(a.ts,
                        x -> list_contains(b.ts, x))) AS DOUBLE)
                   / (len(a.ts) + len(b.ts)
                      - len(list_filter(a.ts,
                            x -> list_contains(b.ts, x)))) AS j
            FROM tok a JOIN tok b ON a.doc_id < b.doc_id
        ),
        cand AS MATERIALIZED (
            SELECT lo, hi, j FROM pairs WHERE j >= {_YIELD_CAND}
        ),
        th AS (SELECT CAST(unnest([{", ".join(map(str, _YIELD_THRESHOLDS))}])
                   AS DOUBLE) AS threshold)
        SELECT threshold,
               CAST(COUNT(j) AS BIGINT) AS n_pairs,
               CAST(COUNT(DISTINCT lo) + COUNT(DISTINCT hi)
                    AS BIGINT) AS n_doc_slots,
               ROUND(CASE WHEN COUNT(j) > 0 THEN
                   CAST(SUM(CAST(floor(j * 1e12) AS DECIMAL(38,0)))
                        AS DOUBLE) / COUNT(j) / 1e12 END, 4)
                   AS mean_jaccard
        FROM th LEFT JOIN cand ON j >= threshold
        GROUP BY threshold
    """,
    section="D20",
    doc="Dedup threshold yield curve: near-dup pair count, touched-doc "
    "mass, and mean similarity at Jaccard thresholds .7/.8/.9/.95 "
    "from ONE pass over the candidate pairs — the decision artifact "
    "for CHOOSING the dedup threshold before a 100 TB run (too low "
    "deletes distinct content, too high ships duplicates; the curve's "
    "elbow is the answer). Same exact-Jaccard pair semantics as "
    "T5/D5, scoped to the same language partition; thresholds fan "
    "out over the already-collapsed candidate table (>=0.5 floor), "
    "NOT over the corpus. mean_jaccard is AVG over a threshold-"
    "filtered set computed as a quantized floor(j*1e12) DECIMAL "
    "sum over n (L18 device — no float fold order). Scale: pair generation is the "
    "D1-banded path at size; here the partition is small enough for "
    "the exact join, and the curve itself is 4 threshold counts.",
)
def q_dedup_yield_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("lang") == "de"
    )
    tok = docs.select(
        "doc_id", F.array_distinct(F.split(F.col("text"), " ")).alias("ts")
    )
    # Inverted-index candidate generation (same device as D23's
    # rewrite): the pair's intersection size is an integer count off
    # one token equi-join, so j = inter/(sa+sb-inter) needs NO array
    # intersect and pairs sharing zero tokens never materialize at
    # all. j from integer counts is bit-identical to the array form,
    # and every candidate has j > 0 >= nothing below _YIELD_CAND.
    ex = tok.select(
        "doc_id",
        F.size("ts").alias("sz"),
        F.explode("ts").alias("t"),
    )
    ea = ex.select(
        F.col("doc_id").alias("lo"), F.col("sz").alias("sa"), "t"
    )
    eb = ex.select(
        F.col("doc_id").alias("hi"), F.col("sz").alias("sb"), "t"
    )
    pairs = (
        ea.join(eb, "t")
        .where(F.col("lo") < F.col("hi"))
        .groupBy("lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.max("sa").alias("sa"),
            F.max("sb").alias("sb"),
        )
        .select(
            "lo",
            "hi",
            (
                F.col("inter").cast("double")
                / (F.col("sa") + F.col("sb") - F.col("inter"))
            ).alias("j"),
        )
    )
    cand = pairs.where(F.col("j") >= _YIELD_CAND)
    th = spark.createDataFrame(
        [(t,) for t in _YIELD_THRESHOLDS], "threshold double"
    )
    return (
        F.broadcast(th)
        .join(cand, F.col("j") >= F.col("threshold"), "left")
        .groupBy("threshold")
        .agg(
            F.count(F.col("j")).cast("bigint").alias("n_pairs"),
            (
                F.countDistinct("lo") + F.countDistinct("hi")
            ).cast("bigint").alias("n_doc_slots"),
            F.round(
                F.when(
                    F.count(F.col("j")) > 0,
                    F.sum(
                        F.floor(F.col("j") * 1e12).cast(DecimalType(38, 0))
                    ).cast("double")
                    / F.count(F.col("j"))
                    / 1e12,
                ),
                4,
            ).alias("mean_jaccard"),
        )
    )


_PREFIX_K = 8   # tokens in the template-prefix key


@register(
    "q_dedup_prefix_template",
    oracle=f"""
        WITH p AS (
            SELECT doc_id, lang, source,
                   md5(array_to_string(
                        string_split(text, ' ')[1:{_PREFIX_K}], ' ')) AS ph
            FROM documents
        )
        SELECT ph AS prefix_hash,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
               CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
               CAST(MIN(doc_id) AS BIGINT) AS example_doc
        FROM p
        GROUP BY ph
        HAVING COUNT(*) >= 2
    """,
    section="D21",
    doc=f"Template-prefix duplicate detection: documents sharing their "
    f"first {_PREFIX_K} tokens verbatim (md5 of the joined prefix) are "
    "boilerplate-template candidates — the cheap screen that catches "
    "scraped page headers, license preambles, and generation-prompt "
    "echoes which FULL-document dedup (D1/D2) misses because the "
    "bodies differ. Cross-lang/cross-source counts per cluster tell "
    "curators whether the template is a site artifact (1 source) or "
    "an ecosystem idiom (many). Exact md5 keys both engines. Scale: "
    "map-only prefix hash + one 16-byte-key count — the D16 "
    "normalized-dedup shape; no token explode, no pair join.",
)
def q_dedup_prefix_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ph = F.md5(
        F.array_join(F.slice(F.split(F.col("text"), " "), 1, _PREFIX_K), " ")
    )
    return (
        docs.select(
            ph.alias("prefix_hash"), "doc_id", "lang", "source"
        )
        .groupBy("prefix_hash")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("lang").cast("bigint").alias("n_langs"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
            F.min("doc_id").cast("bigint").alias("example_doc"),
        )
        .where(F.col("n_docs") >= 2)
    )


_RC_KS = (1, 3, 5)


@register(
    "q_vec_recall_curve",
    oracle=f"""
        WITH cells AS MATERIALIZED (
            SELECT vec_id, embedding,
                   4 * (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END)
                 + 2 * (CASE WHEN embedding[2] >= 0 THEN 1 ELSE 0 END)
                 +     (CASE WHEN embedding[3] >= 0 THEN 1 ELSE 0 END)
                       AS cell
            FROM embeddings
        ),
        exact5 AS MATERIALIZED (
            SELECT query_id, neighbor_id, rank FROM (
                SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                       ROW_NUMBER() OVER (
                            PARTITION BY a.vec_id
                            ORDER BY {{dot}} / ({{nsqa}} * {{nsqb}}) DESC,
                                     b.vec_id
                       ) AS rank
                FROM (SELECT * FROM cells WHERE vec_id < 10) a
                JOIN cells b ON b.vec_id <> a.vec_id
            ) WHERE rank <= 5
        ),
        approx5 AS MATERIALIZED (
            SELECT query_id, neighbor_id, rank FROM (
                SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                       ROW_NUMBER() OVER (
                            PARTITION BY a.vec_id
                            ORDER BY {{dot}} / ({{nsqa}} * {{nsqb}}) DESC,
                                     b.vec_id
                       ) AS rank
                FROM (SELECT * FROM cells WHERE vec_id < 10) a
                JOIN cells b ON a.cell = b.cell AND b.vec_id <> a.vec_id
            ) WHERE rank <= 5
        ),
        ks AS (SELECT unnest([{", ".join(map(str, _RC_KS))}]) AS k)
        SELECT CAST(ks.k AS INTEGER) AS k,
               CAST(COUNT(DISTINCT e.query_id) AS BIGINT) AS n_queries,
               CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_matches,
               ROUND(CAST(COUNT(a.neighbor_id) AS DOUBLE)
                     / (COUNT(DISTINCT e.query_id) * ks.k), 4)
                   AS mean_recall
        FROM ks
        JOIN exact5 e ON e.rank <= ks.k
        LEFT JOIN approx5 a
          ON a.query_id = e.query_id
         AND a.neighbor_id = e.neighbor_id
         AND a.rank <= ks.k
        GROUP BY ks.k
    """.replace("{dot}", _dot_duck("a", "b"))
       .replace("{nsqa}", _nsq_duck("a"))
       .replace("{nsqb}", _nsq_duck("b")),
    section="V29",
    doc="ANN recall CURVE: mean recall@k for k=1/3/5 of the D4 sign-bit "
    "cell index against brute-force cosine ground truth — V12 gives "
    "the single recall@3 gate; the curve is how you actually CHOOSE "
    "k and the probe width before serving (recall@1 collapsing "
    "while recall@5 holds = the index ranks the right neighborhood "
    "but misorders within it -> raise k, don't retrain; all three "
    "collapsing = the partitioning is wrong). Same calibration-"
    "artifact pattern as SK9's width sweep and D20's threshold "
    "curve. Both rankings share the exact rank device of V3/D4; "
    "match counts are integers and the mean is one division. "
    "Scale: queries broadcast, corpus scanned twice (once "
    "unrestricted, once cell-pruned), never shuffled; the curve "
    "itself is 3 rows.",
)
def q_vec_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import fan_out

    emb = load_table(spark, sf_dir, "embeddings")
    cell = (
        (F.element_at("embedding", 1) >= 0).cast("int") * 4
        + (F.element_at("embedding", 2) >= 0).cast("int") * 2
        + (F.element_at("embedding", 3) >= 0).cast("int")
    )
    cells = emb.select("vec_id", "embedding", cell.alias("cell"))
    q = (
        cells.filter(F.col("vec_id") < 10)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
            F.col("cell").alias("qcell"),
        )
        .withColumn("nq", _norm_col("qe"))
    )
    n = fan_out(
        cells.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("ne"),
            F.col("cell").alias("ncell"),
        ).withColumn("nn", _norm_col("ne"))
    )
    sim = _dot_col("qe", "ne") / (F.col("nq") * F.col("nn"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )

    def _ranked(cond):
        return (
            F.broadcast(q)
            .join(n, cond & (F.col("neighbor_id") != F.col("query_id")))
            .withColumn("sim", sim)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5)
            .select("query_id", "neighbor_id", "rank")
        )

    exact5 = _ranked(F.lit(True))
    approx5 = _ranked(F.col("qcell") == F.col("ncell")).select(
        F.col("query_id").alias("aq"),
        F.col("neighbor_id").alias("an"),
        F.col("rank").alias("arank"),
    )
    ks = spark.createDataFrame([(k,) for k in _RC_KS], "k int")
    j = (
        F.broadcast(ks)
        .join(exact5, exact5.rank <= F.col("k"))
        .join(
            approx5,
            (F.col("aq") == F.col("query_id"))
            & (F.col("an") == F.col("neighbor_id"))
            & (F.col("arank") <= F.col("k")),
            "left",
        )
    )
    return j.groupBy("k").agg(
        F.countDistinct("query_id").cast("bigint").alias("n_queries"),
        F.count("an").cast("bigint").alias("n_matches"),
        F.round(
            F.count("an").cast("double")
            / (F.countDistinct("query_id") * F.col("k")),
            4,
        ).alias("mean_recall"),
    )


@register(
    "q_dedup_source_matrix",
    oracle="""
        WITH tok AS MATERIALIZED (
            SELECT doc_id, source,
                   list_distinct(string_split(text, ' ')) AS ts
            FROM documents WHERE lang = 'de'
        ),
        pairs AS (
            SELECT a.source AS s_a, b.source AS s_b
            FROM tok a JOIN tok b ON a.doc_id < b.doc_id
            WHERE CAST(len(list_filter(a.ts,
                        x -> list_contains(b.ts, x))) AS DOUBLE)
                  / (len(a.ts) + len(b.ts)
                     - len(list_filter(a.ts,
                           x -> list_contains(b.ts, x)))) >= 0.8
        )
        SELECT least(s_a, s_b) AS source_lo,
               greatest(s_a, s_b) AS source_hi,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(CASE WHEN s_a = s_b THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_intra
        FROM pairs
        GROUP BY 1, 2
    """,
    section="D22",
    doc="Cross-SOURCE near-duplicate matrix: T5's exact-Jaccard >= 0.8 "
    "pairs (same 'de' partition, same pair semantics) rolled up by "
    "unordered source pair, intra-source pairs flagged — the "
    "provenance readout that tells curators WHERE duplication comes "
    "from: a hot (srcA, srcB) off-diagonal cell means one crawl "
    "mirrors another (drop the later one wholesale — cheaper than "
    "per-pair dedup), a hot diagonal means a source self-templates "
    "(route to D21's prefix screen). D15 checks eval contamination, "
    "L23 compares vocabularies; this localizes actual near-dup MASS "
    "between corpus components. Exact pair set (no LSH recall "
    "loss), exact counts. Scale: pair generation is D1's banded "
    "path at size; the matrix itself is |sources|^2 cells.",
)
def q_dedup_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("lang") == "de"
    )
    # Pair set via the lossless T5 SSJoin prefix filter (same r6 rewrite
    # as q_dedup_blocking_quality: the literal all-pairs theta join is
    # quadratic in the slice, which grows with the corpus). Provably the
    # same pairs as the oracle's all-pairs scan; sources join back on
    # doc_id keyed joins.
    from ai_to_cvent_etl_spark.operators.dedup import near_dup_pairs

    src = docs.select("doc_id", "source")
    pairs = (
        near_dup_pairs(docs, threshold=0.8)
        .join(
            src.select(
                F.col("doc_id").alias("doc_lo"),
                F.col("source").alias("s_a"),
            ),
            "doc_lo",
        )
        .join(
            src.select(
                F.col("doc_id").alias("doc_hi"),
                F.col("source").alias("s_b"),
            ),
            "doc_hi",
        )
        .select("s_a", "s_b")
    )
    return (
        pairs.groupBy(
            F.least("s_a", "s_b").alias("source_lo"),
            F.greatest("s_a", "s_b").alias("source_hi"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(F.when(F.col("s_a") == F.col("s_b"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_intra"),
        )
    )


@register(
    "q_dedup_shingle_curve",
    oracle="""
        WITH tok AS MATERIALIZED (
            SELECT doc_id, string_split(text, ' ') AS toks
            FROM documents WHERE lang = 'de'
        ),
        sets AS MATERIALIZED (
            SELECT doc_id,
                   list_distinct(toks) AS s1,
                   list_distinct(list_transform(
                        range(1, len(toks)),
                        i -> toks[i] || ' ' || toks[i + 1])) AS s2,
                   list_distinct(list_transform(
                        range(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i + 1]
                             || ' ' || toks[i + 2])) AS s3
            FROM tok
        ),
        cand AS MATERIALIZED (
            SELECT a.doc_id AS lo, b.doc_id AS hi,
                   CAST(len(list_filter(a.s1,
                        x -> list_contains(b.s1, x))) AS DOUBLE)
                   / (len(a.s1) + len(b.s1)
                      - len(list_filter(a.s1,
                            x -> list_contains(b.s1, x)))) AS j1,
                   CAST(len(list_filter(a.s2,
                        x -> list_contains(b.s2, x))) AS DOUBLE)
                   / (len(a.s2) + len(b.s2)
                      - len(list_filter(a.s2,
                            x -> list_contains(b.s2, x)))) AS j2,
                   CAST(len(list_filter(a.s3,
                        x -> list_contains(b.s3, x))) AS DOUBLE)
                   / (len(a.s3) + len(b.s3)
                      - len(list_filter(a.s3,
                            x -> list_contains(b.s3, x)))) AS j3
            FROM sets a JOIN sets b ON a.doc_id < b.doc_id
            WHERE CAST(len(list_filter(a.s1,
                       x -> list_contains(b.s1, x))) AS DOUBLE)
                  / (len(a.s1) + len(b.s1)
                     - len(list_filter(a.s1,
                           x -> list_contains(b.s1, x)))) >= 0.5
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates,
               ROUND(CAST(SUM(CAST(floor(j1 * 1e12) AS DECIMAL(38,0)))
                          AS DOUBLE) / 1e12 / COUNT(*), 4) AS mean_j_w1,
               ROUND(CAST(SUM(CAST(floor(j2 * 1e12) AS DECIMAL(38,0)))
                          AS DOUBLE) / 1e12 / COUNT(*), 4) AS mean_j_w2,
               ROUND(CAST(SUM(CAST(floor(j3 * 1e12) AS DECIMAL(38,0)))
                          AS DOUBLE) / 1e12 / COUNT(*), 4) AS mean_j_w3,
               CAST(SUM(CASE WHEN j2 >= 0.5 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_pass_w2,
               CAST(SUM(CASE WHEN j3 >= 0.5 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_pass_w3
        FROM cand
    """,
    section="D23",
    doc="Shingle-width sensitivity curve: the >=0.5 unigram-Jaccard "
    "candidate pairs re-scored under 2-gram and 3-gram shingles — "
    "THE MinHash hyperparameter study (wider shingles demand "
    "word-ORDER agreement, so bag-of-words near-dups that survive "
    "w=1 die at w=3; how fast mean similarity and the survivor "
    "count decay tells you whether the corpus duplicates by "
    "copying (order preserved -> slow decay -> w=3 is safe and "
    "stricter) or by template-refilling (order broken -> fast "
    "decay -> w=3 would miss real dups). Complements D13's "
    "permutation-count calibration on the other MinHash axis. "
    "Shingle sets built row-local; pair join on the D20 candidate "
    "floor; means through the floor-1e12 DECIMAL fold (rule 10). "
    "Scale: at size the candidates come from D1's banding; the "
    "re-score is per-pair row-local.",
)
def q_dedup_shingle_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("lang") == "de"
    )
    toks = F.split(F.col("text"), " ")
    tok = docs.select("doc_id", toks.alias("toks"))

    def _sh(n):
        if n == 1:
            return F.array_distinct(F.col("toks"))
        return F.array_distinct(
            F.transform(
                # greatest(...,0): docs shorter than n tokens have no
                # n-shingles (negative slice length is an ANSI error)
                F.slice(
                    F.col("toks"),
                    1,
                    F.greatest(F.size("toks") - (n - 1), F.lit(0)),
                ),
                lambda x, i: F.concat_ws(
                    " ",
                    *[
                        F.element_at(F.col("toks"), i + k + 1)
                        for k in range(n)
                    ],
                ),
            )
        )

    sets = tok.select(
        "doc_id",
        _sh(1).alias("s1"),
        _sh(2).alias("s2"),
        _sh(3).alias("s3"),
    )
    # Candidate generation via the token inverted index instead of the
    # nested-loop pair join: the w=1 intersection size is an integer
    # count per co-occurring pair (one equi-join + one keyed agg), and
    # the >=0.5 gate becomes 3*inter >= |a|+|b| (exact cross-multiplied
    # integers, identical pair set). The heavy s2/s3 array intersects
    # then run ONLY on survivors — the same survivor-side plan the
    # 100 TB path (D1 banding -> verify) uses. j1 = inter/(sa+sb-inter)
    # from the integer counts is bit-identical to the array form.
    sets = sets.localCheckpoint(eager=False)
    ex = sets.select(
        "doc_id",
        F.size("s1").alias("sz"),
        F.explode("s1").alias("t"),
    )
    ea = ex.select(
        F.col("doc_id").alias("lo"), F.col("sz").alias("sa"), "t"
    )
    eb = ex.select(
        F.col("doc_id").alias("hi"), F.col("sz").alias("sb"), "t"
    )
    inter1 = (
        ea.join(eb, "t")
        .where(F.col("lo") < F.col("hi"))
        .groupBy("lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.max("sa").alias("sa"),
            F.max("sb").alias("sb"),
        )
        .where(3 * F.col("inter") >= F.col("sa") + F.col("sb"))
    )

    def _j(x, y):
        inter = F.size(F.array_intersect(x, y))
        return inter.cast("double") / (
            F.size(x) + F.size(y) - inter
        )

    cand = (
        inter1.join(
            sets.select(
                F.col("doc_id").alias("lo"),
                F.col("s2").alias("a2"),
                F.col("s3").alias("a3"),
            ),
            "lo",
        )
        .join(
            sets.select(
                F.col("doc_id").alias("hi"),
                F.col("s2").alias("b2"),
                F.col("s3").alias("b3"),
            ),
            "hi",
        )
        .select(
            (
                F.col("inter").cast("double")
                / (F.col("sa") + F.col("sb") - F.col("inter"))
            ).alias("j1"),
            _j("a2", "b2").alias("j2"),
            _j("a3", "b3").alias("j3"),
        )
    )

    def _qm(c):
        return (
            F.sum(F.floor(F.col(c) * 1e12).cast("decimal(38,0)")).cast(
                "double"
            )
            / 1e12
            / F.count(F.lit(1))
        )

    return cand.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
        F.round(_qm("j1"), 4).alias("mean_j_w1"),
        F.round(_qm("j2"), 4).alias("mean_j_w2"),
        F.round(_qm("j3"), 4).alias("mean_j_w3"),
        F.sum(F.when(F.col("j2") >= 0.5, 1).otherwise(0))
        .cast("bigint")
        .alias("n_pass_w2"),
        F.sum(F.when(F.col("j3") >= 0.5, 1).otherwise(0))
        .cast("bigint")
        .alias("n_pass_w3"),
    )


@register(
    "q_dedup_length_profile",
    oracle="""
        WITH tok AS MATERIALIZED (
            SELECT doc_id, n_chars,
                   list_distinct(string_split(text, ' ')) AS ts
            FROM documents WHERE lang = 'de'
        ),
        dup_docs AS (
            SELECT DISTINCT d FROM (
                SELECT a.doc_id AS d
                FROM tok a JOIN tok b ON a.doc_id < b.doc_id
                WHERE CAST(len(list_filter(a.ts,
                           x -> list_contains(b.ts, x))) AS DOUBLE)
                      / (len(a.ts) + len(b.ts)
                         - len(list_filter(a.ts,
                               x -> list_contains(b.ts, x)))) >= 0.8
                UNION ALL
                SELECT b.doc_id
                FROM tok a JOIN tok b ON a.doc_id < b.doc_id
                WHERE CAST(len(list_filter(a.ts,
                           x -> list_contains(b.ts, x))) AS DOUBLE)
                      / (len(a.ts) + len(b.ts)
                         - len(list_filter(a.ts,
                               x -> list_contains(b.ts, x)))) >= 0.8
            )
        ),
        binned AS (
            SELECT t.doc_id,
                   ntile(4) OVER (ORDER BY t.n_chars, t.doc_id)
                       AS len_quartile,
                   CASE WHEN d.d IS NOT NULL THEN 1 ELSE 0 END AS is_dup
            FROM tok t LEFT JOIN dup_docs d ON d.d = t.doc_id
        )
        SELECT CAST(len_quartile AS INTEGER) AS len_quartile,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(is_dup) AS BIGINT) AS n_in_near_dup,
               ROUND(CAST(SUM(is_dup) AS DOUBLE) / COUNT(*), 4)
                   AS dup_rate
        FROM binned GROUP BY len_quartile
    """,
    section="D24",
    doc="Near-duplication rate by document-LENGTH quartile: the share "
    "of docs in each length band that participate in any >=0.8 "
    "Jaccard pair (T5 semantics, 'de' partition) — the bias audit "
    "every dedup threshold needs before a 100 TB run: short docs "
    "reach high Jaccard by chance (small unions), so a flat "
    "threshold OVER-deletes the short tail while long near-dups "
    "slip under it, and a rising dup_rate toward quartile 1 is "
    "exactly that artifact (the remedy is D23's wider shingles or "
    "a length-banded threshold). Membership from the exact pair "
    "set (both endpoints), quartiles via tie-broken ntile over "
    "n_chars. Scale: pair generation is D1's banded path; the "
    "profile is 4 rows.",
)
def q_dedup_length_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("lang") == "de"
    )
    tok = docs.select(
        "doc_id",
        "n_chars",
        F.array_distinct(F.split(F.col("text"), " ")).alias("ts"),
    )
    # Inverted-index pair generation (D23/D24 rewrite device): the
    # 0.8 Jaccard gate cross-multiplies to 9*inter >= 4*(sa+sb) on
    # exact integer counts — identical pair set, no per-pair arrays.
    ex = tok.select(
        "doc_id",
        F.size("ts").alias("sz"),
        F.explode("ts").alias("t"),
    )
    ea = ex.select(
        F.col("doc_id").alias("lo"), F.col("sz").alias("sa"), "t"
    )
    eb = ex.select(
        F.col("doc_id").alias("hi"), F.col("sz").alias("sb"), "t"
    )
    pairs = (
        ea.join(eb, "t")
        .where(F.col("lo") < F.col("hi"))
        .groupBy("lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.max("sa").alias("sa"),
            F.max("sb").alias("sb"),
        )
        .where(
            9 * F.col("inter") >= 4 * (F.col("sa") + F.col("sb"))
        )
    )
    dup_docs = (
        pairs.select(F.col("lo").alias("d"))
        .unionAll(pairs.select(F.col("hi").alias("d")))
        .distinct()
    )
    binned = (
        tok.join(dup_docs, tok.doc_id == dup_docs.d, "left")
        .select(
            "doc_id",
            "n_chars",
            F.when(F.col("d").isNotNull(), 1).otherwise(0).alias("is_dup"),
        )
    )
    # Scale note (r6): NTILE(4) computed arithmetically from the
    # distributed global row number — no single-partition window.
    from ai_to_cvent_etl_spark.operators.ranking import (
        global_row_number,
        ntile_from_rn,
    )

    nb = binned.agg(F.count(F.lit(1)).alias("__n"))
    binned = (
        global_row_number(binned, ["n_chars", "doc_id"], out_col="_grn")
        .crossJoin(F.broadcast(nb))
        .select(
            ntile_from_rn(F.col("_grn"), F.col("__n"), 4)
            .cast("int")
            .alias("len_quartile"),
            "is_dup",
        )
    )
    return binned.groupBy("len_quartile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("is_dup").cast("bigint").alias("n_in_near_dup"),
        F.round(
            F.sum("is_dup").cast("double") / F.count(F.lit(1)), 4
        ).alias("dup_rate"),
    )


@register(
    "q_dedup_adjacent_similarity",
    oracle="""
        WITH tok AS MATERIALIZED (
            SELECT doc_id,
                   list_distinct(string_split(text, ' ')) AS ts
            FROM documents
        ),
        seq AS (
            SELECT doc_id, ts,
                   lead(doc_id) OVER (ORDER BY doc_id) AS next_id,
                   lead(ts) OVER (ORDER BY doc_id) AS next_ts
            FROM tok
        ),
        pairs AS (
            SELECT doc_id,
                   CAST(len(list_filter(ts,
                        x -> list_contains(next_ts, x))) AS DOUBLE)
                   / (len(ts) + len(next_ts)
                      - len(list_filter(ts,
                            x -> list_contains(next_ts, x)))) AS j
            FROM seq WHERE next_id IS NOT NULL
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_adjacent_pairs,
               ROUND(CAST(SUM(CAST(floor(j * 1e12) AS DECIMAL(38,0)))
                          AS DOUBLE) / 1e12 / COUNT(*), 6)
                   AS mean_adjacent_jaccard,
               CAST(SUM(CASE WHEN j >= 0.8 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_adjacent_near_dups,
               ROUND(CAST(SUM(CASE WHEN j >= 0.8 THEN 1 ELSE 0 END)
                          AS DOUBLE) / COUNT(*), 6)
                   AS adjacent_dup_rate
        FROM pairs
    """,
    section="D25",
    doc="Ingestion-order ADJACENCY similarity: Jaccard between each "
    "document and its successor in doc_id order — O(n) pairs, not "
    "O(n^2) — with the mean and the >=0.8 adjacent-near-dup rate. "
    "The signal is WHERE duplication sits in the ingest stream: "
    "crawls emit mirror pages consecutively, so an adjacent dup "
    "rate far above the corpus base rate (D1's pair density) means "
    "a cheap sorted-neighborhood pass (compare each doc to a "
    "window of w neighbors, linear cost) catches most duplicates "
    "BEFORE the full banded LSH runs — the classic SNM-vs-blocking "
    "decision, now measured instead of guessed. One ordered window "
    "over the token-set table; quantized mean fold (rule 10). "
    "Scale: linear in corpus size by construction — that is the "
    "point.",
)
def q_dedup_adjacent_similarity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.array_distinct(F.split(F.col("text"), " ")).alias("ts")
    )
    # Scale note (r6): lead() over the global doc_id order single-tasks
    # the corpus; the adjacent pair comes from the distributed global rank
    # and a t -> t+1 self-join instead (hash join on the dense index).
    from ai_to_cvent_etl_spark.operators.ranking import global_row_number

    r = global_row_number(tok, ["doc_id"], out_col="_t").localCheckpoint(
        eager=False
    )
    nxt = r.select(
        (F.col("_t") - 1).alias("_t"),
        F.col("doc_id").alias("next_id"),
        F.col("ts").alias("next_ts"),
    )
    seq = r.join(nxt, "_t").select("doc_id", "ts", "next_id", "next_ts")
    inter = F.size(F.array_intersect("ts", "next_ts"))
    union = F.size("ts") + F.size("next_ts") - inter
    pairs = seq.select((inter.cast("double") / union).alias("j"))
    return pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_adjacent_pairs"),
        F.round(
            F.sum(F.floor(F.col("j") * 1e12).cast("decimal(38,0)")).cast(
                "double"
            )
            / 1e12
            / F.count(F.lit(1)),
            6,
        ).alias("mean_adjacent_jaccard"),
        F.sum(F.when(F.col("j") >= 0.8, 1).otherwise(0))
        .cast("bigint")
        .alias("n_adjacent_near_dups"),
        F.round(
            F.sum(F.when(F.col("j") >= 0.8, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("adjacent_dup_rate"),
    )


# --- D26: LSH blocking quality (pairs completeness / reduction ratio) --------

_BQ_TAU = 0.7   # ground-truth near-dup threshold (exact unigram Jaccard)


@register(
    "q_dedup_blocking_quality",
    oracle=f"""
        WITH tok AS MATERIALIZED (
            SELECT doc_id, list_distinct(string_split(text, ' ')) AS ts
            FROM documents WHERE lang = 'de'
        ),
        sig AS MATERIALIZED (
            SELECT doc_id,
                   {', '.join(
                       f"md5({_mh_duck(2 * b)} || {_mh_duck(2 * b + 1)})"
                       f" AS bk_{b}"
                       for b in range(_N_BANDS))}
            FROM tok
        ),
        bands AS (
            {' UNION ALL '.join(
                f"SELECT doc_id, {b} AS band, bk_{b} AS bkey FROM sig"
                for b in range(_N_BANDS))}
        ),
        cand AS MATERIALIZED (
            SELECT DISTINCT a.doc_id AS lo, b.doc_id AS hi
            FROM bands a
            JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
                        AND a.doc_id < b.doc_id
        ),
        truth AS MATERIALIZED (
            SELECT a.doc_id AS lo, b.doc_id AS hi
            FROM tok a JOIN tok b ON a.doc_id < b.doc_id
            WHERE CAST(len(list_filter(a.ts,
                      x -> list_contains(b.ts, x))) AS DOUBLE)
                  / (len(a.ts) + len(b.ts)
                     - len(list_filter(a.ts,
                           x -> list_contains(b.ts, x)))) >= {_BQ_TAU}
        ),
        nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM tok),
        nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_true_pairs FROM truth),
        nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cand_pairs FROM cand),
        cap AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_captured
            FROM truth t SEMI JOIN cand c
              ON t.lo = c.lo AND t.hi = c.hi
        )
        SELECT nd.n_docs,
               nd.n_docs * (nd.n_docs - 1) / 2 AS total_pairs,
               nt.n_true_pairs,
               nc.n_cand_pairs,
               cap.n_captured,
               ROUND(CASE WHEN nt.n_true_pairs > 0 THEN
                   CAST(cap.n_captured AS DOUBLE) / nt.n_true_pairs END, 6)
                   AS completeness,
               ROUND(1.0 - CAST(nc.n_cand_pairs AS DOUBLE)
                     / (nd.n_docs * (nd.n_docs - 1) / 2), 6)
                   AS reduction_ratio
        FROM nd CROSS JOIN nt CROSS JOIN nc CROSS JOIN cap
    """,
    section="D26",
    doc=f"Blocking-quality audit of D1's LSH banding: pairs completeness "
    f"(fraction of TRUE >= {_BQ_TAU}-Jaccard pairs that collide in at "
    "least one of the 4 band buckets — the blocking RECALL) and "
    "reduction ratio (1 - candidate pairs / all C(n,2) pairs — the "
    "work the blocking saves), the two numbers every entity-"
    "resolution / near-dedup paper reports before trusting a blocker "
    "at scale: completeness bounds what the dedup CAN find, reduction "
    "ratio is why it finishes. Ground truth is the exact Jaccard "
    "pair set on the 'de' language slice (the D20 yield-curve device: "
    "at 100 TB you measure blocking quality on a bounded audit "
    "slice, never the full corpus — this IS that audit, not a "
    "scale-path dedup), computed with the T5 SSJoin prefix filter "
    "(lossless — provably the same pairs the oracle's all-pairs scan "
    "finds, r6 rewrite: the literal all-pairs theta join measured "
    "quadratic at sf1). Exactness: md5 band keys and integer "
    "intersection sizes are engine-identical; both ratios are single "
    "IEEE divisions of exact BIGINTs (n_true=0 yields NULL "
    "completeness identically). Scale: prefix-filter candidates and "
    "band candidates both key on token/16-byte values — AQE broadcasts "
    "the sides while they fit and falls back to keyed shuffles beyond "
    "(no pinned broadcast hints, ADVICE r6); the "
    "semi-join keys on (lo,hi) pairs of the small truth side.",
)
def q_dedup_blocking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("lang") == "de"
    )
    tok = docs.select(
        "doc_id", F.array_distinct(F.split(F.col("text"), " ")).alias("ts")
    )
    sig = tok.select(
        "doc_id",
        F.array(
            *[
                F.md5(
                    F.concat(
                        F.expr(_mh_spark(2 * b)),
                        F.expr(_mh_spark(2 * b + 1)),
                    )
                )
                for b in range(_N_BANDS)
            ]
        ).alias("bks"),
    )
    bands = sig.select("doc_id", F.posexplode("bks").alias("band", "bkey"))
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("lo"), F.col("b.doc_id").alias("hi")
        )
        .distinct()
    )
    # Truth side via the lossless SSJoin prefix filter (operators/dedup.py
    # near_dup_pairs — the T5 device): provably the same pair set as the
    # oracle's all-pairs scan, but candidates come from a prefix-token
    # equi-join + size band instead of an n^2 theta join. The r6 sf1 sweep
    # measured the old all-pairs form at 38.5 s warm (10x data -> ~100x
    # pair work); this form tracks the true-pair output instead.
    from ai_to_cvent_etl_spark.operators.dedup import near_dup_pairs

    truth = near_dup_pairs(docs, threshold=_BQ_TAU).select(
        F.col("doc_lo").alias("lo"), F.col("doc_hi").alias("hi")
    )
    nd = tok.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    nt = truth.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_true_pairs")
    )
    nc = cand.agg(F.count(F.lit(1)).cast("bigint").alias("n_cand_pairs"))
    cap = (
        truth.join(cand, ["lo", "hi"], "left_semi")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_captured"))
    )
    total_pairs = (
        F.col("n_docs") * (F.col("n_docs") - 1) / 2
    )
    return (
        nd.crossJoin(nt)
        .crossJoin(nc)
        .crossJoin(cap)
        .select(
            "n_docs",
            total_pairs.alias("total_pairs"),
            "n_true_pairs",
            "n_cand_pairs",
            "n_captured",
            F.round(
                F.when(
                    F.col("n_true_pairs") > 0,
                    F.col("n_captured").cast("double")
                    / F.col("n_true_pairs"),
                ),
                6,
            ).alias("completeness"),
            F.round(
                1.0 - F.col("n_cand_pairs").cast("double") / total_pairs,
                6,
            ).alias("reduction_ratio"),
        )
    )


# ==== wave 188b: idf-weighted Jaccard on adjacent pairs (D27) =======


@register(
    "q_dedup_weighted_jaccard",
    oracle="""
        WITH toks AS (
            SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
            FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                FROM documents
            ) WHERE tok <> ''
            GROUP BY doc_id, tok
        ),
        idf AS (
            SELECT tok,
                   CAST((SELECT COUNT(*) FROM documents) AS BIGINT)
                   // CAST(COUNT(*) AS BIGINT) AS w
            FROM toks GROUP BY tok
        ),
        pairs AS (
            SELECT doc_id AS a,
                   LEAD(doc_id) OVER (ORDER BY doc_id) AS b
            FROM documents
            QUALIFY b IS NOT NULL
        ),
        pa AS (
            SELECT p.a, p.b, t.tok, t.tf AS tfa
            FROM pairs p JOIN toks t ON t.doc_id = p.a
        ),
        pb AS (
            SELECT p.a, p.b, t.tok, t.tf AS tfb
            FROM pairs p JOIN toks t ON t.doc_id = p.b
        ),
        merged AS (
            SELECT COALESCE(pa.a, pb.a) AS a,
                   COALESCE(pa.b, pb.b) AS b,
                   i.w,
                   COALESCE(pa.tfa, 0) AS tfa,
                   COALESCE(pb.tfb, 0) AS tfb
            FROM pa FULL JOIN pb
              ON pa.a = pb.a AND pa.b = pb.b AND pa.tok = pb.tok
            JOIN idf i ON i.tok = COALESCE(pa.tok, pb.tok)
        ),
        scored AS (
            SELECT a, b,
                   CAST(SUM(w * LEAST(tfa, tfb)) AS BIGINT) AS num_w,
                   CAST(SUM(w * GREATEST(tfa, tfb)) AS BIGINT) AS den_w,
                   CAST(SUM(LEAST(tfa, tfb)) AS BIGINT) AS num_u,
                   CAST(SUM(GREATEST(tfa, tfb)) AS BIGINT) AS den_u
            FROM merged GROUP BY a, b
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
               ROUND(CAST(SUM(1000000 * num_w // den_w) AS DOUBLE)
                     / (COUNT(*) * 1e6), 6) AS mean_weighted_jaccard,
               ROUND(CAST(SUM(1000000 * num_u // den_u) AS DOUBLE)
                     / (COUNT(*) * 1e6), 6) AS mean_unweighted_jaccard,
               CAST(SUM(CASE WHEN 5 * num_w >= 3 * den_w
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dups_06
        FROM scored
    """,
    section="D27",
    doc="Idf-weighted Jaccard over the sorted-neighborhood pairs "
    "(each doc vs its doc_id successor): J_w = sum_tok w*min(tf_a, "
    "tf_b) / sum_tok w*max(tf_a,tf_b) with INTEGER idf w = N div df "
    "— rare tokens dominate the verdict, so boilerplate stopwords "
    "can't fake similarity the way they do in D22's unweighted "
    "adjacent Jaccard (reported alongside for the contrast, same "
    "pass). The pair token union materializes via a FULL JOIN on "
    "token within pair; every numerator/denominator is an exact "
    "int64, per-pair scores quantize 1e6*num div den before the "
    "mean, and the 0.6 dup gate cross-multiplies (5*num >= 3*den). "
    "Scale: token lists shuffle once on (doc, tok), idf is a "
    "token-grain agg joined back; the pair set is O(n) by "
    "construction — the sorted-neighborhood contract — not O(n^2).",
)
def q_dedup_weighted_jaccard(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.col("text"), " ")).alias("tok"),
        )
        .where(F.col("tok") != "")
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
        .localCheckpoint(eager=False)
    )
    n_docs = docs.agg(
        F.count(F.lit(1)).cast("bigint").alias("nd")
    )
    idf = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .select("tok", F.expr("nd div df").alias("w"))
    )
    # Scale note (r6): the adjacent (a, b) pair list comes from the
    # distributed global rank + t -> t+1 self-join, not a lead() over an
    # unpartitioned window.
    from ai_to_cvent_etl_spark.operators.ranking import global_row_number

    ids = global_row_number(
        docs.select("doc_id"), ["doc_id"], out_col="_t"
    ).localCheckpoint(eager=False)
    pairs = ids.select(F.col("_t"), F.col("doc_id").alias("a")).join(
        ids.select((F.col("_t") - 1).alias("_t"), F.col("doc_id").alias("b")),
        "_t",
    ).select("a", "b")
    ta = toks.select(
        F.col("doc_id").alias("a"), F.col("tok").alias("tok"),
        F.col("tf").alias("tfa"),
    )
    tb = toks.select(
        F.col("doc_id").alias("b"), F.col("tok").alias("tok"),
        F.col("tf").alias("tfb"),
    )
    pa = pairs.join(ta, "a").select("a", "b", "tok", "tfa")
    pb = pairs.join(tb, "b").select("a", "b", "tok", "tfb")
    merged = (
        pa.join(pb, ["a", "b", "tok"], "full")
        .select(
            "a",
            "b",
            "tok",
            F.coalesce(F.col("tfa"), F.lit(0)).alias("tfa"),
            F.coalesce(F.col("tfb"), F.lit(0)).alias("tfb"),
        )
        .join(idf, "tok")
    )
    scored = merged.groupBy("a", "b").agg(
        F.sum(F.col("w") * F.least("tfa", "tfb"))
        .cast("bigint")
        .alias("num_w"),
        F.sum(F.col("w") * F.greatest("tfa", "tfb"))
        .cast("bigint")
        .alias("den_w"),
        F.sum(F.least("tfa", "tfb")).cast("bigint").alias("num_u"),
        F.sum(F.greatest("tfa", "tfb")).cast("bigint").alias("den_u"),
    )
    return scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.round(
            F.sum(F.expr("1000000 * num_w div den_w")).cast("double")
            / (F.count(F.lit(1)) * F.lit(1e6)),
            6,
        ).alias("mean_weighted_jaccard"),
        F.round(
            F.sum(F.expr("1000000 * num_u div den_u")).cast("double")
            / (F.count(F.lit(1)) * F.lit(1e6)),
            6,
        ).alias("mean_unweighted_jaccard"),
        F.sum(
            F.when(5 * F.col("num_w") >= 3 * F.col("den_w"), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("n_dups_06"),
    )
