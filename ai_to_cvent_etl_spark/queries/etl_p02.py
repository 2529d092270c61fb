"""Registered queries q_etl_t_closeness..q_etl_storage_tiering_plan (chunk 2 of 2 split from etl.py — see etl_shared.py for shared helpers)."""

from __future__ import annotations
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register
from pyspark.sql.types import DecimalType
from ai_to_cvent_etl_spark.queries._util import dec2
from pyspark.sql import DataFrame, SparkSession

from ai_to_cvent_etl_spark.queries.etl_shared import (  # noqa: F401
    _CUR_LANGS,
    _CUR_MIN_CHARS,
    _CUR_MIN_TOKENS,
    _CUR_SHARD_BYTES,
    _ENC_COLS,
    _EPOCH_BUDGET_CHARS,
    _EPOCH_WEIGHTS,
    _ERASE_MOD,
    _FH_BUCKETS,
    _FUNNEL_STAGES,
    _JSA_BROADCAST_BYTES,
    _JSA_DIMS,
    _JSA_HASH_RATIO,
    _JSA_RELS,
    _PGE_GRAINS,
    _RB_FROM,
    _RB_TO,
    _RB_VNODES,
    _RESERVOIR_K,
    _SLO_TARGET_Q4,
    _TCL_T,
    _TEMP_ALPHA,
    _TIER_RATES,
    _WM_DELAYS_MIN,
    _ZM_PREDS,
    _ZM_SHARD_DOCS,
    _enc_surrogate_duck,
    _jsa_dim_sql,
    _pge_sql,
)

#               further than t from the corpus-wide distribution (TVD)


@register(
    "q_etl_t_closeness",
    oracle=f"""
        WITH banded AS (
            SELECT c_nationkey, c_mktsegment,
                   CAST(floor(c_acctbal / 2000.0) AS BIGINT) AS band
            FROM customer
        ),
        tot AS (SELECT COUNT(*) AS n_total FROM banded),
        gband AS (
            SELECT band, COUNT(*) AS g_cnt FROM banded GROUP BY band
        ),
        grp AS (
            SELECT c_nationkey, c_mktsegment, COUNT(*) AS n_g
            FROM banded GROUP BY c_nationkey, c_mktsegment
        ),
        cell AS (
            SELECT c_nationkey, c_mktsegment, band, COUNT(*) AS c_cnt
            FROM banded GROUP BY c_nationkey, c_mktsegment, band
        ),
        grid AS (
            SELECT g.c_nationkey, g.c_mktsegment, g.n_g,
                   gl.band, gl.g_cnt,
                   COALESCE(c.c_cnt, 0) AS c_cnt
            FROM grp g CROSS JOIN gband gl
            LEFT JOIN cell c
              ON c.c_nationkey = g.c_nationkey
             AND c.c_mktsegment = g.c_mktsegment
             AND c.band = gl.band
        )
        SELECT c_nationkey AS nationkey, c_mktsegment AS mktsegment,
               CAST(n_g AS BIGINT) AS n_g,
               ROUND(CAST(SUM(abs(c_cnt * t.n_total - g_cnt * n_g)) AS DOUBLE)
                     / (2.0 * n_g * t.n_total), 4) AS tvd,
               CAST(SUM(abs(c_cnt * t.n_total - g_cnt * n_g)) AS DOUBLE)
                   / (2.0 * n_g * t.n_total) > {_TCL_T} AS violates_t
        FROM grid CROSS JOIN tot t
        GROUP BY c_nationkey, c_mktsegment, n_g, t.n_total
    """,
    section="E46",
    doc="t-closeness audit over the (nation, mktsegment) quasi-identifier "
    "groups with banded account balance as the sensitive attribute: "
    "per-group total-variation distance to the corpus-wide sensitive "
    "distribution, flagged against t — the release gate k-anonymity "
    "(E21) and l-diversity (E27) cannot provide (a group can be large "
    "and diverse yet still leak because its distribution SKEWS from "
    "the population; t-closeness is the distributional completion of "
    "the privacy trio). Exactness device: TVD numerator is the "
    "integer sum |c*N - g*n| (order-insensitive, overflow-safe at "
    "BIGINT), divided ONCE at the end — no float accumulation "
    "anywhere. Scale: two count aggregations on the QI key plus a "
    "broadcast of the band marginal (bands are a constant, groups "
    "are bounded by the QI domain) — the grid join is "
    "groups x bands, never rows x bands.",
)
def q_etl_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    banded = cust.select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 2000.0).cast("bigint").alias("band"),
    )
    n_total = banded.count()
    glob = banded.groupBy("band").agg(F.count(F.lit(1)).alias("g_cnt"))
    grp = banded.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_g")
    )
    cell = banded.groupBy("c_nationkey", "c_mktsegment", "band").agg(
        F.count(F.lit(1)).alias("c_cnt")
    )
    grid = (
        grp.crossJoin(F.broadcast(glob))
        .join(
            cell,
            ["c_nationkey", "c_mktsegment", "band"],
            "left",
        )
        .withColumn("c_cnt", F.coalesce(F.col("c_cnt"), F.lit(0)))
    )
    num = F.sum(
        F.abs(
            F.col("c_cnt") * F.lit(n_total) - F.col("g_cnt") * F.col("n_g")
        )
    )
    tvd = num.cast("double") / (2.0 * F.col("n_g") * F.lit(n_total))
    return (
        grid.groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_mktsegment").alias("mktsegment"),
            "n_g",
        )
        .agg(
            F.round(tvd, 4).alias("tvd"),
            (tvd > _TCL_T).alias("violates_t"),
        )
        .withColumn("n_g", F.col("n_g").cast("bigint"))
        .select("nationkey", "mktsegment", "n_g", "tvd", "violates_t")
    )

@register(
    "q_etl_temperature_resample",
    oracle=f"""
        WITH counts AS (
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM documents GROUP BY lang
        ),
        powed AS (
            SELECT lang, n_docs,
                   n_docs / (SELECT CAST(SUM(n_docs) AS DOUBLE)
                             FROM counts) AS raw_share,
                   POWER(n_docs / (SELECT CAST(SUM(n_docs) AS DOUBLE)
                                   FROM counts), {_TEMP_ALPHA}) AS pw
            FROM counts
        )
        SELECT lang, n_docs,
               ROUND(raw_share, 6) AS raw_share,
               ROUND(pw / (SELECT SUM(pw) FROM powed), 6) AS temp_share
        FROM powed
    """,
    section="E45",
    doc=f"Temperature-based multilingual resampling (alpha="
    f"{_TEMP_ALPHA}): the sampling weights p_l^alpha / sum(p^alpha) "
    "that every multilingual pretraining recipe (mT5/XLM-R style) "
    "uses to up-weight low-resource languages — the exact knob a "
    "100 TB corpus mix is tuned with. POWER on identical doubles is "
    "evaluated on both engines and ROUND(...,6) absorbs the "
    "potential 1-ulp libm divergence (the §5.3 irrational device). "
    "Scale: one map-combinable count per language (5 groups), two "
    "1-row scalar subqueries broadcast back — nothing but the "
    "5-group count ever shuffles, at any corpus size.",
)
def q_etl_temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    tot = counts.agg(
        F.sum("n_docs").cast("double").alias("tot")
    )
    powed = counts.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        (F.col("n_docs") / F.col("tot")).alias("raw_share"),
        F.pow(F.col("n_docs") / F.col("tot"), F.lit(_TEMP_ALPHA)).alias(
            "pw"
        ),
    )
    z = powed.agg(F.sum("pw").alias("z"))
    return powed.crossJoin(F.broadcast(z)).select(
        "lang",
        "n_docs",
        F.round("raw_share", 6).alias("raw_share"),
        F.round(F.col("pw") / F.col("z"), 6).alias("temp_share"),
    )

@register(
    "q_etl_epoch_mixture",
    oracle=f"""
        WITH weights (lang, target_w) AS (
            VALUES {", ".join(f"('{l}', {w})" for l, w in _EPOCH_WEIGHTS)}
        ),
        corpus AS (
            SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS corpus_chars
            FROM documents GROUP BY lang
        )
        SELECT c.lang, c.corpus_chars,
               CAST(w.target_w AS DOUBLE) AS target_w,
               ROUND({_EPOCH_BUDGET_CHARS} * CAST(w.target_w AS DOUBLE)
                     / c.corpus_chars, 6) AS epochs
        FROM corpus c
        JOIN weights w ON c.lang = w.lang
    """,
    section="E46",
    doc="Epoch-mixture solver: given target mixture weights (an inline "
    "VALUES dim — also pins the literal-relation API surface on both "
    f"engines) and a {_EPOCH_BUDGET_CHARS}-char training budget, the "
    "repeat factor (epochs) each language's corpus needs to hit its "
    "target share — epochs > 1 flags languages the budget will "
    "up-sample (the Hoffmann/Chinchilla-style mix bookkeeping step). "
    "corpus_chars is an exact BIGINT sum; the single division per "
    "language is IEEE-identical and ROUND(...,6)-pinned. Scale: "
    "5-group map-combinable sum + a 5-row broadcast join; constant "
    "cost at any corpus size.",
)
def q_etl_epoch_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.groupBy("lang").agg(
        F.sum("n_chars").cast("bigint").alias("corpus_chars")
    )
    weights = spark.createDataFrame(
        [(l, float(w)) for l, w in _EPOCH_WEIGHTS],
        "lang string, target_w double",
    )
    return (
        corpus.join(F.broadcast(weights), "lang")
        .select(
            "lang",
            "corpus_chars",
            "target_w",
            F.round(
                F.lit(_EPOCH_BUDGET_CHARS)
                * F.col("target_w")
                / F.col("corpus_chars"),
                6,
            ).alias("epochs"),
        )
    )

@register(
    "q_etl_filter_funnel",
    oracle="""
        SELECT stage,
               CAST(n AS BIGINT) AS n_docs,
               CAST(chars AS BIGINT) AS n_chars,
               ROUND(CAST(n AS DOUBLE)
                     / (SELECT COUNT(*) FROM documents), 6)
                   AS survival_rate
        FROM (
    """
    + "\n            UNION ALL\n".join(
        f"""
            SELECT '{name}' AS stage, COUNT(*) AS n,
                   COALESCE(SUM(n_chars), 0) AS chars
            FROM documents WHERE {cond}
        """
        for name, cond in _FUNNEL_STAGES
    )
    + """
        )
    """,
    section="E47",
    doc="Quality-gate filter funnel: survivor count, char volume, and "
    "survival rate after each CUMULATIVE stage of a 4-gate curation "
    "chain (min-length, max-length, language, content marker) — the "
    "per-stage attrition report every corpus-cleaning pipeline "
    "publishes next to its dataset card. Implemented as ONE pass: "
    "each stage is a conditional aggregate over the same scan (not "
    "5 scans — the stages share all their work), which is the shape "
    "that matters at 100 TB; the oracle states the naive "
    "5-subquery UNION so the single-pass rewrite is hash-verified "
    "equivalent. Counts/chars exact BIGINT; one rounded division "
    "per stage.",
)
def q_etl_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    per_stage = docs.agg(
        F.count(F.lit(1)).cast("bigint").alias("total"),
        *[
            agg
            for name, cond in _FUNNEL_STAGES
            for agg in (
                F.sum(F.when(F.expr(cond), 1).otherwise(0))
                .cast("bigint")
                .alias(f"{name}_n"),
                F.sum(
                    F.when(F.expr(cond), F.col("n_chars")).otherwise(0)
                )
                .cast("bigint")
                .alias(f"{name}_c"),
            )
        ],
    )
    stacked = per_stage.select(
        F.col("total"),
        F.expr(
            "stack({}, {})".format(
                len(_FUNNEL_STAGES),
                ", ".join(
                    f"'{name}', {name}_n, {name}_c"
                    for name, _ in _FUNNEL_STAGES
                ),
            )
        ).alias("stage", "n_docs", "n_chars"),
    )
    return stacked.select(
        "stage",
        "n_docs",
        "n_chars",
        F.round(
            F.col("n_docs").cast("double") / F.col("total"), 6
        ).alias("survival_rate"),
    )

@register(
    "q_etl_reservoir_group",
    oracle=f"""
        WITH ranked AS (
            SELECT source, doc_id, n_chars,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS rnk,
                   CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT)
                       AS stratum_n
            FROM documents
        )
        SELECT source, doc_id, CAST(rnk AS INTEGER) AS rnk,
               n_chars, stratum_n
        FROM ranked WHERE rnk <= {_RESERVOIR_K}
    """,
    section="E48",
    doc=f"Fixed-k reservoir sample per stratum (k={_RESERVOIR_K} docs "
    "per source): rank by the uniform md5(doc_id) key and keep the "
    "k smallest — the hash-rank formulation of reservoir sampling, "
    "which unlike the sequential algorithm is embarrassingly "
    "parallel AND deterministic (same sample every run, every "
    "partition count — auditable pipelines need replayable "
    "samples). Completes the sampling triptych: E9 fixes a "
    "FRACTION, E41 fixes a BYTE budget, this fixes a COUNT. The "
    "stratum size rides along so downstream reweighting "
    "(Horvitz-Thompson k/N inverse-probability) needs no second "
    "scan. Scale: rank-k per group is a map-side top-k heap (k "
    "rows of state per stratum) feeding one small shuffle — "
    "never a full sort of the corpus.",
)
def q_etl_reservoir_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    wn = Window.partitionBy("source")
    return (
        docs.select(
            "source",
            "doc_id",
            "n_chars",
            F.row_number().over(w).alias("rnk"),
            F.count(F.lit(1)).over(wn).cast("bigint").alias("stratum_n"),
        )
        .where(F.col("rnk") <= _RESERVOIR_K)
        .select("source", "doc_id", "rnk", "n_chars", "stratum_n")
    )

@register(
    "q_etl_feature_hashing",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents
        ),
        hashed AS (
            SELECT doc_id,
                   CAST(('0x' || substr(md5(tok), 1, 4)) AS INTEGER)
                       % {_FH_BUCKETS} AS bucket,
                   CASE WHEN substr(md5(tok), 5, 1) < '8'
                        THEN 1 ELSE -1 END AS sgn
            FROM toks
        ),
        doc_feats AS (
            SELECT doc_id, bucket,
                   CAST(SUM(sgn) AS BIGINT) AS feat
            FROM hashed GROUP BY doc_id, bucket
        )
        SELECT bucket,
               CAST(COUNT(*) AS BIGINT) AS nnz_docs,
               CAST(SUM(ABS(feat)) AS BIGINT) AS l1_mass,
               CAST(SUM(CASE WHEN feat = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_cancelled
        FROM doc_feats
        GROUP BY bucket
    """,
    section="E49",
    doc=f"Hashing-trick featurizer (signed, {_FH_BUCKETS} buckets): "
    "tokens hash to buckets with a +/-1 sign (Weinberger et al.), "
    "per-document bucket values are signed counts, and the output "
    "audits the feature space per bucket — nonzero docs, L1 mass, "
    "and how many doc-bucket cells fully CANCELLED (the hashing-"
    "trick's signature failure mode the sign bit exists to "
    "mitigate; its rate is the thing you check before shrinking "
    "the bucket count). Bucket and sign both derive from "
    "engine-identical md5 hex prefixes; every aggregate is an "
    "exact integer. Scale: this is vocabulary-free by design — no "
    "vocab table, no broadcast, fixed "
    f"{_FH_BUCKETS}-wide feature space at any corpus size; one "
    "(doc, bucket) shuffle of integer partials, the shape that "
    "makes the hashing trick THE featurizer for 100 TB text.",
)
def q_etl_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import fan_out

    docs = load_table(spark, sf_dir, "documents")
    toks = fan_out(docs).select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    hashed = toks.select(
        "doc_id",
        (
            F.conv(F.substring(F.md5("tok"), 1, 4), 16, 10).cast("int")
            % _FH_BUCKETS
        ).alias("bucket"),
        F.when(F.substring(F.md5("tok"), 5, 1) < "8", 1)
        .otherwise(-1)
        .alias("sgn"),
    )
    doc_feats = hashed.groupBy("doc_id", "bucket").agg(
        F.sum("sgn").cast("bigint").alias("feat")
    )
    return doc_feats.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("nnz_docs"),
        F.sum(F.abs("feat")).cast("bigint").alias("l1_mass"),
        F.sum(F.when(F.col("feat") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_cancelled"),
    )

@register(
    "q_etl_zone_map_skipping",
    oracle=f"""
        WITH zones AS (
            SELECT doc_id // {_ZM_SHARD_DOCS} AS shard,
                   CAST(MIN(n_chars) AS BIGINT) AS zmin,
                   CAST(MAX(n_chars) AS BIGINT) AS zmax,
                   CAST(COUNT(*) AS BIGINT) AS n_rows
            FROM documents GROUP BY 1
        ),
        preds AS (
            SELECT * FROM (VALUES
                {", ".join(f"({p}, {lo}, {hi})" for p, lo, hi in _ZM_PREDS)}
            ) AS t(pred_id, lo, hi)
        ),
        eval AS (
            SELECT p.pred_id, p.lo, p.hi, z.shard, z.n_rows,
                   CASE WHEN z.zmax < p.lo OR z.zmin >= p.hi
                        THEN 1 ELSE 0 END AS skipped
            FROM preds p CROSS JOIN zones z
        ),
        matches AS (
            SELECT p.pred_id, CAST(COUNT(*) AS BIGINT) AS n_matching
            FROM preds p JOIN documents d
              ON d.n_chars >= p.lo AND d.n_chars < p.hi
            GROUP BY p.pred_id
        )
        SELECT e.pred_id,
               CAST(COUNT(*) AS BIGINT) AS n_shards,
               CAST(SUM(e.skipped) AS BIGINT) AS n_shards_skipped,
               CAST(SUM(CASE WHEN e.skipped = 0 THEN e.n_rows
                             ELSE 0 END) AS BIGINT) AS n_rows_scanned,
               CAST(COALESCE(ANY_VALUE(m.n_matching), 0) AS BIGINT)
                   AS n_rows_matching,
               CASE WHEN SUM(CASE WHEN e.skipped = 0 THEN e.n_rows
                             ELSE 0 END) = 0 THEN NULL
                    ELSE ROUND(
                        CAST(COALESCE(ANY_VALUE(m.n_matching), 0) AS DOUBLE)
                        / CAST(SUM(CASE WHEN e.skipped = 0 THEN e.n_rows
                                        ELSE 0 END) AS DOUBLE), 6)
               END AS scan_efficiency
        FROM eval e LEFT JOIN matches m ON m.pred_id = e.pred_id
        GROUP BY e.pred_id
    """,
    section="E35",
    doc=f"Zone-map data-skipping audit — the lakehouse planner readout: "
    f"documents packed into contiguous {_ZM_SHARD_DOCS}-doc shards, a "
    "min/max zone map built per shard, and five range predicates on "
    "n_chars evaluated AGAINST THE ZONE MAPS ONLY (shard skippable iff "
    "its [min,max] is disjoint from the predicate range), then scored "
    "against the true row matches: shards skipped, rows a zone-map scan "
    "still touches, and scan efficiency (matching/scanned — low means "
    "the layout, not the predicate, is the problem; E28's Z-order "
    "layout is the fix this metric motivates). All counts integer, one "
    "final division. Scale: the zone table is |shards| rows (the "
    "manifest grain); predicate x zone is a broadcast cross join; the "
    "truth side is one fact pass shared by all predicates.",
)
def q_etl_zone_map_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    zones = docs.groupBy(
        F.expr(f"doc_id DIV {_ZM_SHARD_DOCS}").alias("shard")
    ).agg(
        F.min("n_chars").cast("bigint").alias("zmin"),
        F.max("n_chars").cast("bigint").alias("zmax"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    )
    preds = docs.sparkSession.createDataFrame(
        _ZM_PREDS, "pred_id int, lo bigint, hi bigint"
    )
    ev = F.broadcast(preds).crossJoin(zones).select(
        "pred_id",
        "n_rows",
        F.when(
            (F.col("zmax") < F.col("lo")) | (F.col("zmin") >= F.col("hi")),
            1,
        )
        .otherwise(0)
        .alias("skipped"),
    )
    matches = (
        F.broadcast(preds)
        .join(
            docs,
            (docs.n_chars >= F.col("lo")) & (docs.n_chars < F.col("hi")),
        )
        .groupBy("pred_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_matching"))
    )
    agg = ev.groupBy("pred_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shards"),
        F.sum("skipped").cast("bigint").alias("n_shards_skipped"),
        F.sum(F.when(F.col("skipped") == 0, F.col("n_rows")).otherwise(0))
        .cast("bigint")
        .alias("n_rows_scanned"),
    )
    return agg.join(matches, "pred_id", "left").select(
        "pred_id",
        "n_shards",
        "n_shards_skipped",
        "n_rows_scanned",
        F.coalesce(F.col("n_matching"), F.lit(0))
        .cast("bigint")
        .alias("n_rows_matching"),
        F.when(
            F.col("n_rows_scanned") > 0,
            F.round(
                F.coalesce(F.col("n_matching"), F.lit(0)).cast("double")
                / F.col("n_rows_scanned").cast("double"),
                6,
            ),
        ).alias("scan_efficiency"),
    )

@register(
    "q_etl_encoding_advisor",
    oracle=f"""
        WITH stacked AS (
            {" UNION ALL ".join(
                f"SELECT '{c}' AS col_name, l_orderkey, l_linenumber, "
                f"{_enc_surrogate_duck(c)} AS val FROM lineitem"
                for c in _ENC_COLS
            )}
        ),
        runs AS (
            SELECT col_name,
                   CASE WHEN prev IS NULL OR prev <> val
                        THEN 1 ELSE 0 END AS is_run_start
            FROM (
                SELECT col_name, val,
                       LAG(val) OVER (
                           PARTITION BY col_name, l_orderkey
                           ORDER BY l_linenumber, val) AS prev
                FROM stacked
            )
        ),
        s AS (
            SELECT col_name,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(is_run_start) AS BIGINT) AS n_runs
            FROM runs GROUP BY col_name
        ),
        d AS (
            SELECT col_name, CAST(COUNT(DISTINCT val) AS BIGINT)
                       AS n_distinct
            FROM stacked GROUP BY col_name
        )
        SELECT s.col_name, s.n, d.n_distinct, s.n_runs,
               ROUND(CAST(s.n AS DOUBLE) / s.n_runs, 4) AS avg_run_len,
               CASE WHEN d.n_distinct <= 64 AND 2 * s.n >= 3 * s.n_runs
                        THEN 'DICT_RLE'
                    WHEN d.n_distinct <= 64 THEN 'DICT'
                    WHEN 2 * d.n_distinct > s.n THEN 'PLAIN'
                    ELSE 'DICT_PLAIN'
               END AS suggested_encoding
        FROM s JOIN d USING (col_name)
    """,
    section="E36",
    doc="Columnar encoding advisor: per audited lineitem column, the "
    "run-length and cardinality statistics a parquet writer's encoder "
    "decides on — n_distinct (dictionary viability), within-rowgroup "
    "run structure (RLE viability; runs measured INSIDE each order "
    "sorted by (line number, value) — the fixture's line numbers "
    "repeat, so the value joins the sort key to pin a deterministic "
    "surrogate for file order; the window stays partitioned and the "
    "fact never globally sorts), and a "
    "threshold rule mapping to DICT_RLE / DICT / DICT_PLAIN / PLAIN — "
    "the advisor that tells you WHY a column compressed badly and "
    "complements E28 (Z-order, which changes the run structure this "
    "measures). The run-length compare 2n >= 3·runs (avg run >= 1.5) "
    "is integer; the only double is the reported avg_run_len. Value "
    "surrogates are exact BIGINTs (ascii for the flag, cents for tax). "
    "Scale: the stack is column-parallel; per-(column, order) windows "
    "are partition-local; one distinct-count shuffle per column.",
)
def q_etl_encoding_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")

    def surrogate(c):
        if c == "l_returnflag":
            return F.ascii(F.col(c)).cast("bigint")
        if c == "l_tax":
            return F.expr(
                "CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS BIGINT)"
            )
        return F.col(c).cast("bigint")

    stacked = None
    for c in _ENC_COLS:
        part = li.select(
            F.lit(c).alias("col_name"),
            "l_orderkey",
            "l_linenumber",
            surrogate(c).alias("val"),
        )
        stacked = part if stacked is None else stacked.unionByName(part)
    w = Window.partitionBy("col_name", "l_orderkey").orderBy(
        "l_linenumber", "val"
    )
    runs = stacked.select(
        "col_name",
        F.when(
            F.lag("val").over(w).isNull()
            | (F.lag("val").over(w) != F.col("val")),
            1,
        )
        .otherwise(0)
        .alias("is_run_start"),
    )
    s = runs.groupBy("col_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("is_run_start").cast("bigint").alias("n_runs"),
    )
    d = stacked.groupBy("col_name").agg(
        F.countDistinct("val").cast("bigint").alias("n_distinct")
    )
    out = s.join(d, "col_name")
    return out.select(
        "col_name",
        "n",
        "n_distinct",
        "n_runs",
        F.round(F.col("n").cast("double") / F.col("n_runs"), 4).alias(
            "avg_run_len"
        ),
        F.when(
            (F.col("n_distinct") <= 64)
            & (2 * F.col("n") >= 3 * F.col("n_runs")),
            F.lit("DICT_RLE"),
        )
        .when(F.col("n_distinct") <= 64, F.lit("DICT"))
        .when(2 * F.col("n_distinct") > F.col("n"), F.lit("PLAIN"))
        .otherwise(F.lit("DICT_PLAIN"))
        .alias("suggested_encoding"),
    )

# ==== wave 144a: revenue-recognition calendarization ===============


@register(
    "q_etl_calendarize",
    oracle="""
        WITH spans AS (
            SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS cents,
                   CAST(o_orderdate AS DATE) AS d0,
                   CAST(l_shipdate AS DATE) AS d1,
                   CAST(date_diff('day', CAST(o_orderdate AS DATE),
                                  CAST(l_shipdate AS DATE)) + 1
                        AS BIGINT) AS td
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate >= o_orderdate
        ),
        exploded AS (
            SELECT cents, d0, d1, td,
                   CAST(u.m AS DATE) AS m
            FROM spans,
            LATERAL (SELECT unnest(generate_series(
                         date_trunc('month', d0),
                         date_trunc('month', d1),
                         INTERVAL 1 MONTH)) AS m) u
        ),
        alloc AS (
            SELECT m AS month_start,
                   CAST(date_diff('day', GREATEST(m, d0),
                                  LEAST(last_day(m), d1)) + 1
                        AS BIGINT) AS days_in,
                   cents, td
            FROM exploded
        )
        SELECT month_start,
               CAST(COUNT(*) AS BIGINT) AS n_line_months,
               CAST(SUM(days_in) AS BIGINT) AS total_days,
               CAST((SUM((cents * days_in * 10000) // td) + 5000)
                    // 10000 AS BIGINT) AS recognized_cents
        FROM alloc
        GROUP BY month_start
    """,
    section="E37",
    doc="Revenue-recognition calendarization: each line's value spreads "
    "evenly over its order-to-ship service interval, prorated by DAY "
    "OVERLAP with each calendar month — the contract-accounting "
    "operator (recognize revenue when earned, not when booked) that "
    "E-family allocation (A44/J24 Hamilton rounding) does not cover "
    "because the allocation basis here is a CALENDAR INTERSECTION, "
    "not a share of a fixed budget. Per-(line, month) terms are the "
    "integer division (cents·days·1e4) DIV total_days — exact int64 "
    "(<= 3e12), summed per month as BIGINTs with a half-up INTEGER "
    "descale to whole cents (r6 — a float descale diverged at sf1), "
    "so the ragged per-line denominators never meet a float. Spans "
    "explode to their covering month sequence (bounded: <= 82 months "
    "in this data, a pure map-side fan-out); negative spans drop on "
    "both engines. Scale: explode + one month-grain map-combinable "
    "agg; the month calendar is the only shuffle key.",
)
def q_etl_calendarize(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    spans = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select(
            F.expr(
                "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 "
                "AS BIGINT)"
            ).alias("cents"),
            F.col("o_orderdate").cast("date").alias("d0"),
            F.col("l_shipdate").cast("date").alias("d1"),
            (
                F.datediff(
                    F.col("l_shipdate").cast("date"),
                    F.col("o_orderdate").cast("date"),
                )
                + 1
            )
            .cast("bigint")
            .alias("td"),
        )
    )
    exploded = spans.select(
        "cents",
        "d0",
        "d1",
        "td",
        F.explode(
            F.sequence(
                F.trunc("d0", "month"),
                F.trunc("d1", "month"),
                F.expr("interval 1 month"),
            )
        ).alias("m"),
    )
    alloc = exploded.select(
        F.col("m").alias("month_start"),
        (
            F.datediff(
                F.least(F.last_day("m"), F.col("d1")),
                F.greatest(F.col("m"), F.col("d0")),
            )
            + 1
        )
        .cast("bigint")
        .alias("days_in"),
        "cents",
        "td",
    )
    return alloc.groupBy("month_start").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_line_months"),
        F.sum("days_in").cast("bigint").alias("total_days"),
        # r6: half-up integer descale to WHOLE cents — the 4dp round of a
        # 16-sig-digit double diverged cross-engine at sf1; this stays in
        # exact int64 end-to-end (terms <= 3e12, month sums <= ~3e15)
        F.expr(
            "CAST((SUM((cents * days_in * 10000) DIV td) + 5000) "
            "DIV 10000 AS BIGINT)"
        ).alias("recognized_cents"),
    )

# ==== wave 144b: FIFO matching via cumulative-interval overlap =====


@register(
    "q_etl_fifo_match",
    oracle="""
        WITH supply AS (
            SELECT l_partkey,
                   CAST(l_quantity AS BIGINT) AS q,
                   SUM(CAST(l_quantity AS BIGINT)) OVER w
                       - CAST(l_quantity AS BIGINT) AS lo,
                   SUM(CAST(l_quantity AS BIGINT)) OVER w AS hi
            FROM lineitem
            WHERE l_returnflag = 'N'
            WINDOW w AS (PARTITION BY l_partkey
                         ORDER BY l_shipdate, l_orderkey, l_linenumber,
                                  CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                                       * 100 AS BIGINT)
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        demand AS (
            SELECT l_partkey,
                   CAST(l_quantity AS BIGINT) AS q,
                   SUM(CAST(l_quantity AS BIGINT)) OVER w
                       - CAST(l_quantity AS BIGINT) AS lo,
                   SUM(CAST(l_quantity AS BIGINT)) OVER w AS hi
            FROM lineitem
            WHERE l_returnflag = 'R'
            WINDOW w AS (PARTITION BY l_partkey
                         ORDER BY l_shipdate, l_orderkey, l_linenumber,
                                  CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                                       * 100 AS BIGINT)
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        matched AS (
            SELECT s.l_partkey,
                   LEAST(s.hi, d.hi) - GREATEST(s.lo, d.lo) AS mq
            FROM supply s JOIN demand d
              ON s.l_partkey = d.l_partkey
             AND s.lo < d.hi AND d.lo < s.hi
        ),
        tot AS (
            SELECT l_partkey,
                   CAST(SUM(CASE WHEN l_returnflag = 'N'
                                 THEN CAST(l_quantity AS BIGINT)
                                 ELSE 0 END) AS BIGINT) AS supply_q,
                   CAST(SUM(CASE WHEN l_returnflag = 'R'
                                 THEN CAST(l_quantity AS BIGINT)
                                 ELSE 0 END) AS BIGINT) AS demand_q
            FROM lineitem GROUP BY l_partkey
        )
        SELECT t.l_partkey, t.supply_q, t.demand_q,
               CAST(COALESCE(m.n_matches, 0) AS BIGINT) AS n_matches,
               CAST(COALESCE(m.matched_q, 0) AS BIGINT) AS matched_q,
               CAST(t.demand_q - COALESCE(m.matched_q, 0) AS BIGINT)
                   AS unmatched_demand
        FROM tot t LEFT JOIN (
            SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_matches,
                   CAST(SUM(mq) AS BIGINT) AS matched_q
            FROM matched GROUP BY l_partkey
        ) m USING (l_partkey)
    """,
    section="E38",
    doc="FIFO inventory matching as RELATIONAL ALGEBRA: per part, "
    "'N'-flag lines are the supply stream and 'R'-flag lines the "
    "demand stream, each laid onto its CUMULATIVE-QUANTITY axis "
    "[cum-q, cum) by ship order — and FIFO matching is then exactly "
    "the INTERVAL-OVERLAP JOIN of the two cumulative axes (matched "
    "units of a pair = overlap length), replacing the sequential "
    "pop-the-queue algorithm accounting systems run with two windows "
    "and one banded join. The device generalizes to any first-in-"
    "first-out pairing (cost-basis lots, ticket-to-agent, "
    "order-to-inventory). All-integer: quantities are integral, the "
    "cumulative ordering carries a FULL tie-break (shipdate, order, "
    "line, cents — the fixture's line numbers repeat, E36's lesson), "
    "overlap arithmetic is int64. Scale: windows and the overlap join "
    "both key on l_partkey (the natural grain); per-part streams are "
    "small, and the join is banded by construction — a part's supply "
    "row only meets the demand rows its cum-interval overlaps "
    "(O(supply + demand) pairs total, NOT quadratic).",
)
def q_etl_fifo_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
    )

    def stream(flag):
        w = (
            Window.partitionBy("l_partkey")
            .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "tiebreak")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        return (
            li.where(F.col("l_returnflag") == flag)
            .select(
                "l_partkey",
                "l_shipdate",
                "l_orderkey",
                "l_linenumber",
                cents.alias("tiebreak"),
                F.col("l_quantity").cast("bigint").alias("q"),
            )
            .select(
                "l_partkey",
                (F.sum("q").over(w) - F.col("q")).alias("lo"),
                F.sum("q").over(w).alias("hi"),
            )
        )

    supply = stream("N").select(
        "l_partkey", F.col("lo").alias("s_lo"), F.col("hi").alias("s_hi")
    )
    demand = stream("R").select(
        F.col("l_partkey").alias("d_part"),
        F.col("lo").alias("d_lo"),
        F.col("hi").alias("d_hi"),
    )
    matched = (
        supply.join(
            demand,
            (F.col("l_partkey") == F.col("d_part"))
            & (F.col("s_lo") < F.col("d_hi"))
            & (F.col("d_lo") < F.col("s_hi")),
        )
        .groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_matches"),
            F.sum(
                F.least(F.col("s_hi"), F.col("d_hi"))
                - F.greatest(F.col("s_lo"), F.col("d_lo"))
            )
            .cast("bigint")
            .alias("matched_q"),
        )
    )
    tot = li.groupBy("l_partkey").agg(
        F.sum(
            F.when(
                F.col("l_returnflag") == "N",
                F.col("l_quantity").cast("bigint"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("supply_q"),
        F.sum(
            F.when(
                F.col("l_returnflag") == "R",
                F.col("l_quantity").cast("bigint"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("demand_q"),
    )
    return tot.join(matched, "l_partkey", "left").select(
        "l_partkey",
        "supply_q",
        "demand_q",
        F.coalesce(F.col("n_matches"), F.lit(0))
        .cast("bigint")
        .alias("n_matches"),
        F.coalesce(F.col("matched_q"), F.lit(0))
        .cast("bigint")
        .alias("matched_q"),
        (F.col("demand_q") - F.coalesce(F.col("matched_q"), F.lit(0)))
        .cast("bigint")
        .alias("unmatched_demand"),
    )

@register(
    "q_etl_curation_e2e",
    oracle=f"""
        WITH raw AS (
            SELECT doc_id, lang, n_chars,
                   lower(trim(regexp_replace(text, ' +', ' ', 'g')))
                       AS norm
            FROM documents
        ),
        dedup AS (
            SELECT MIN(doc_id) AS doc_id,
                   arg_min(lang, doc_id) AS lang,
                   MIN(n_chars) AS n_chars, norm
            FROM raw GROUP BY norm
        ),
        quality AS (
            SELECT * FROM dedup
            WHERE n_chars >= {_CUR_MIN_CHARS}
              AND len(string_split(norm, ' ')) >= {_CUR_MIN_TOKENS}
        ),
        langf AS (
            SELECT * FROM quality
            WHERE lang IN {str(_CUR_LANGS)}
        ),
        packed AS (
            SELECT doc_id, n_chars,
                   (SUM(n_chars) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    - n_chars) // {_CUR_SHARD_BYTES} AS shard
            FROM langf
        )
        SELECT 1 AS stage_no, 'raw' AS stage,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM raw) AS n_docs,
               (SELECT CAST(SUM(n_chars) AS BIGINT) FROM raw) AS n_bytes,
               CAST(NULL AS BIGINT) AS n_shards
        UNION ALL
        SELECT 2, 'exact_dedup',
               (SELECT CAST(COUNT(*) AS BIGINT) FROM dedup),
               (SELECT CAST(SUM(n_chars) AS BIGINT) FROM dedup),
               NULL
        UNION ALL
        SELECT 3, 'quality_gate',
               (SELECT CAST(COUNT(*) AS BIGINT) FROM quality),
               (SELECT CAST(SUM(n_chars) AS BIGINT) FROM quality),
               NULL
        UNION ALL
        SELECT 4, 'lang_filter',
               (SELECT CAST(COUNT(*) AS BIGINT) FROM langf),
               (SELECT CAST(SUM(n_chars) AS BIGINT) FROM langf),
               NULL
        UNION ALL
        SELECT 5, 'packed',
               (SELECT CAST(COUNT(*) AS BIGINT) FROM packed),
               (SELECT CAST(SUM(n_chars) AS BIGINT) FROM packed),
               (SELECT CAST(COUNT(DISTINCT shard) AS BIGINT) FROM packed)
    """,
    section="E39",
    doc="End-to-end curation pipeline as ONE gated query — the marquee "
    "composition of the LLM-data story the family queries tell "
    "piecewise: normalize (lower/trim/space-collapse) -> exact dedup "
    "on the normalized key (keep min doc_id) -> quality gate (length "
    f">= {_CUR_MIN_CHARS} chars, >= {_CUR_MIN_TOKENS} tokens) -> "
    f"language allowlist {_CUR_LANGS} -> byte-budget shard packing "
    "(E29's prefix device), emitting the stage-by-stage funnel "
    "(docs, bytes) and the final shard count. This is the query a "
    "user actually ships; every stage reuses a device already "
    "hash-proved in isolation (U6 normalization, E29 packing, L16 "
    "filter chains), so the composite's oracle doubles as an "
    "integration test of their interaction. All counting is integer; "
    "the kept doc's lang is min_by/arg_min on doc_id (deterministic "
    "winner attribution), never ANY_VALUE. Scale: dedup is one hash-key shuffle of 16-byte keys; the "
    "pack's global prefix sum is the documented two-pass pattern at "
    "cluster scale; filters are map-side.",
)
def q_etl_curation_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    raw = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        F.lower(
            F.trim(F.regexp_replace(F.col("text"), " +", " "))
        ).alias("norm"),
    )
    dedup = raw.groupBy("norm").agg(
        F.min("doc_id").alias("doc_id"),
        F.min_by("lang", "doc_id").alias("lang"),
        F.min("n_chars").alias("n_chars"),
    )
    quality = dedup.where(
        (F.col("n_chars") >= _CUR_MIN_CHARS)
        & (F.size(F.split(F.col("norm"), " ")) >= _CUR_MIN_TOKENS)
    )
    langf = quality.where(F.col("lang").isin(*_CUR_LANGS)).localCheckpoint(
        eager=False
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    packed = langf.select(
        "doc_id",
        "n_chars",
        F.expr(
            f"(SUM(n_chars) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED "
            f"PRECEDING AND CURRENT ROW) - n_chars) DIV {_CUR_SHARD_BYTES}"
        ).alias("shard"),
    )

    def stage(no, name, df, with_shards=None):
        aggs = [
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("n_bytes"),
        ]
        if with_shards is not None:
            aggs.append(
                F.countDistinct(with_shards).cast("bigint").alias("n_shards")
            )
        out = df.agg(*aggs)
        if with_shards is None:
            out = out.withColumn("n_shards", F.lit(None).cast("bigint"))
        return out.select(
            F.lit(no).alias("stage_no"),
            F.lit(name).alias("stage"),
            "n_docs",
            "n_bytes",
            "n_shards",
        )

    return (
        stage(1, "raw", raw)
        .unionByName(stage(2, "exact_dedup", dedup))
        .unionByName(stage(3, "quality_gate", quality))
        .unionByName(stage(4, "lang_filter", langf))
        .unionByName(stage(5, "packed", packed, with_shards="shard"))
    )

@register(
    "q_etl_rebalance_audit",
    oracle=f"""
        WITH keys AS (
            SELECT o_orderkey AS k,
                   CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),
                                        1, 12)) AS BIGINT) AS h
            FROM orders
        ),
        vn_a AS (
            SELECT CAST(v.range AS BIGINT) % {_RB_FROM} AS shard,
                   CAST(('0x' || substr(md5('vn-' ||
                        CAST(v.range AS VARCHAR)), 1, 12)) AS BIGINT) AS vh
            FROM range({_RB_FROM} * {_RB_VNODES}) v
        ),
        vn_b AS (
            SELECT CAST(v.range AS BIGINT) % {_RB_TO} AS shard,
                   CAST(('0x' || substr(md5('vn-' ||
                        CAST(v.range AS VARCHAR)), 1, 12)) AS BIGINT) AS vh
            FROM range({_RB_TO} * {_RB_VNODES}) v
        ),
        ring_a AS (
            SELECT k.k, COALESCE(
                (SELECT shard FROM vn_a
                 WHERE vh >= k.h ORDER BY vh, shard LIMIT 1),
                (SELECT shard FROM vn_a ORDER BY vh, shard LIMIT 1)
            ) AS shard
            FROM keys k
        ),
        ring_b AS (
            SELECT k.k, COALESCE(
                (SELECT shard FROM vn_b
                 WHERE vh >= k.h ORDER BY vh, shard LIMIT 1),
                (SELECT shard FROM vn_b ORDER BY vh, shard LIMIT 1)
            ) AS shard
            FROM keys k
        ),
        moved AS (
            SELECT 'mod' AS scheme,
                   CAST(SUM(CASE WHEN h % {_RB_FROM} <> h % {_RB_TO}
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_moved,
                   CAST(COUNT(*) AS BIGINT) AS n_keys
            FROM keys
            UNION ALL
            SELECT 'ring',
                   CAST(SUM(CASE WHEN a.shard <> b.shard
                                 THEN 1 ELSE 0 END) AS BIGINT),
                   CAST(COUNT(*) AS BIGINT)
            FROM ring_a a JOIN ring_b b ON a.k = b.k
        )
        SELECT scheme, n_keys, n_moved,
               ROUND(CAST(n_moved AS DOUBLE) / n_keys, 6) AS moved_share
        FROM moved
    """,
    section="E40",
    doc=f"Shard-rebalance audit, {_RB_FROM} -> {_RB_TO} shards: the "
    "fraction of keys that MOVE under naive modulo placement versus a "
    f"virtual-node consistent-hash ring ({_RB_VNODES} vnodes/shard, "
    "md5-positioned, successor-with-wraparound lookup) — the "
    "planning number that justifies ring placement (mod moves "
    "~(1 - 1/new) of ALL keys; the ring moves ~the 2/10 ideal), "
    "measured exactly on this corpus's keys rather than asserted. "
    "Every placement is integer hash compares (48-bit md5 prefixes, "
    "fully tie-broken successor choice); shares are one division. "
    "Scale: vnode tables are broadcast-sized constants; the ring "
    "lookup compiles to a sort-merge against 640 vnodes — at real "
    "scale the same lookup is a broadcast range join, and the audit "
    "is one map pass over keys.",
)
def q_etl_rebalance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import fan_out

    orders = load_table(spark, sf_dir, "orders")
    spark_ = orders.sparkSession
    # r8 (guide §2.5): orders at sf0.1 is ONE parquet split, and every key
    # downstream scans two broadcast ring arrays (512 + 640 vnodes) with
    # interpreted higher-order filters — ~170M lambda evaluations that all
    # ran in a single task. Fan the key scan across cores first; the ring
    # literals are broadcast so no other shuffle appears. Measured:
    # 9.1 s -> sub-second warm at sf0.1. At 100 TB the scan has thousands
    # of splits and the repartition is a no-op-grade rebalance.
    keys = fan_out(orders.select(
        F.col("o_orderkey").alias("k"),
        F.expr(
            "cast(conv(substr(md5(cast(o_orderkey as string)), 1, 12), "
            "16, 10) as bigint)"
        ).alias("h"),
    ))

    def vnodes(nshards):
        return spark_.range(nshards * _RB_VNODES).select(
            (F.col("id") % nshards).cast("bigint").alias("shard"),
            F.expr(
                "cast(conv(substr(md5(concat('vn-', cast(id as string))), "
                "1, 12), 16, 10) as bigint)"
            ).alias("vh"),
        )

    def ring_assign(nshards, alias):
        # The whole ring fits in ONE sorted array literal (640 vnodes),
        # so the successor lookup is a row-local filter+head instead of
        # a broadcast nested-loop join (the BNL materialized ~320
        # matching vnodes PER KEY before the min_by agg — 50M rows at
        # sf0.1, 20s; this plan is one crossJoin of a 1-row frame and
        # an in-codegen array scan, same results bit-for-bit: the
        # sorted struct order (vh, shard) reproduces the tie-broken
        # successor, and element 1 of the full ring is the wraparound).
        # parallel PRIMITIVE arrays (sorted by (vh, shard)): the
        # successor index is just the count of vh < h — a primitive
        # filter stays inside codegen where a struct-array getField
        # scan does not; ties keep the smaller shard because the
        # struct sort ordered them before the split.
        vn = vnodes(nshards)
        ring = vn.agg(
            F.sort_array(
                F.collect_list(F.struct("vh", "shard"))
            ).alias("r0")
        ).select(
            F.expr("transform(r0, x -> x.vh)").alias("vhs"),
            F.expr("transform(r0, x -> x.shard)").alias("shards"),
        )
        idx = (
            F.size(
                F.filter(F.col("vhs"), lambda v: v < F.col("h"))
            )
            + 1
        )
        return keys.crossJoin(F.broadcast(ring)).select(
            "k",
            "h",
            F.coalesce(
                F.try_element_at(F.col("shards"), idx),
                F.element_at(F.col("shards"), 1),
            ).alias(alias),
        )

    # both rings ride ONE pass over keys: two 1-row ring literals
    # cross-joined in, no re-join on k (the old plan recomputed the
    # md5 key hash twice and shuffled 150k rows to re-pair them)
    ring_a = ring_assign(_RB_FROM, "sa").select("k", "h", "sa")
    ring = (
        ring_a
        .crossJoin(
            F.broadcast(
                vnodes(_RB_TO)
                .agg(
                    F.sort_array(
                        F.collect_list(F.struct("vh", "shard"))
                    ).alias("r0")
                )
                .select(
                    F.expr("transform(r0, x -> x.vh)").alias("vhs_b"),
                    F.expr("transform(r0, x -> x.shard)").alias(
                        "shards_b"
                    ),
                )
            )
        )
        .select(
            "sa",
            F.coalesce(
                F.try_element_at(
                    F.col("shards_b"),
                    F.size(
                        F.filter(
                            F.col("vhs_b"), lambda v: v < F.col("h")
                        )
                    )
                    + 1,
                ),
                F.element_at(F.col("shards_b"), 1),
            ).alias("sb"),
        )
        .agg(
            F.sum(
                F.when(F.col("sa") != F.col("sb"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_moved"),
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        )
        .select(
            F.lit("ring").alias("scheme"), "n_keys", "n_moved"
        )
    )
    mod = keys.agg(
        F.sum(
            F.when(
                F.col("h") % _RB_FROM != F.col("h") % _RB_TO, 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_moved"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
    ).select(F.lit("mod").alias("scheme"), "n_keys", "n_moved")
    out = mod.unionByName(ring)
    return out.select(
        "scheme",
        "n_keys",
        "n_moved",
        F.round(
            F.col("n_moved").cast("double") / F.col("n_keys"), 6
        ).alias("moved_share"),
    )

@register(
    "q_etl_erasure_impact",
    oracle=f"""
        WITH erased AS (
            SELECT c_custkey FROM customer
            WHERE CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)),
                                       1, 12)) AS BIGINT)
                  % {_ERASE_MOD} = 0
        ),
        o AS (
            SELECT o_orderkey, o_custkey FROM orders
            WHERE o_custkey IN (SELECT c_custkey FROM erased)
        ),
        l AS (
            SELECT l.l_orderkey FROM lineitem l
            WHERE l.l_orderkey IN (SELECT o_orderkey FROM o)
        )
        SELECT 'customer' AS table_name,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM erased) AS n_entities,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM erased) AS n_rows,
               CAST(1 AS BIGINT) AS fanout_depth
        UNION ALL
        SELECT 'orders',
               (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM o),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM o),
               2
        UNION ALL
        SELECT 'lineitem',
               (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) FROM l),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM l),
               3
    """,
    section="E41",
    doc=f"Right-to-erasure impact analysis: a deterministic ~1/"
    f"{_ERASE_MOD} hash-sample of customers plays the erasure "
    "request batch, and the report walks the foreign-key fan-out "
    "(customer -> orders -> lineitem) counting entities and rows "
    "each table would lose — the GDPR/CCPA planning query a "
    "compliance pipeline runs BEFORE the delete, sizing tombstones "
    "and rewrite cost per table (E22's FK audit proves the edges "
    "this walk follows; E33's version pruning is the mechanism that "
    "later vacuums the deleted rows). All counting; the sample is "
    "the A56 48-bit md5 device so the 'requests' are reproducible. "
    "Scale: two semi-join hops keyed on the natural FKs — at 100 TB "
    "each hop is a broadcast of the (small) erased-key set, i.e. "
    "exactly the plan a DELETE with a runtime filter would use.",
)
def q_etl_erasure_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    erased = cust.where(
        F.expr(
            "cast(conv(substr(md5(cast(c_custkey as string)), 1, 12), "
            "16, 10) as bigint)"
        )
        % _ERASE_MOD
        == 0
    ).select("c_custkey")
    o = orders.join(
        F.broadcast(erased),
        orders.o_custkey == erased.c_custkey,
        "left_semi",
    ).select("o_orderkey", "o_custkey")
    l = li.join(
        F.broadcast(o.select("o_orderkey")),
        li.l_orderkey == o.o_orderkey,
        "left_semi",
    ).select("l_orderkey")

    def row(name, df, ent_col, depth):
        return df.agg(
            F.countDistinct(ent_col).cast("bigint").alias("n_entities"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        ).select(
            F.lit(name).alias("table_name"),
            "n_entities",
            "n_rows",
            F.lit(depth).cast("bigint").alias("fanout_depth"),
        )

    return (
        row("customer", erased, "c_custkey", 1)
        .unionByName(row("orders", o, "o_custkey", 2))
        .unionByName(row("lineitem", l, "l_orderkey", 3))
    )

# ==== wave 160b: ABC-XYZ inventory classification ==================


@register(
    "q_etl_abc_xyz",
    oracle="""
        WITH pv AS (
            SELECT l_partkey,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) AS cents
            FROM lineitem GROUP BY l_partkey
        ),
        abc AS (
            SELECT l_partkey, cents,
                   CASE WHEN cum * 100 <= tot * 80 THEN 'A'
                        WHEN cum * 100 <= tot * 95 THEN 'B'
                        ELSE 'C' END AS abc_class
            FROM (
                SELECT l_partkey, cents,
                       SUM(cents) OVER (ORDER BY cents DESC, l_partkey
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum,
                       SUM(cents) OVER () AS tot
                FROM pv
            )
        ),
        md AS (
            SELECT l_partkey,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(q) AS BIGINT) AS s1,
                   CAST(SUM(q * q) AS BIGINT) AS s2
            FROM (
                SELECT l_partkey,
                       (date_part('year', l_shipdate) - 1995) * 12
                       + date_part('month', l_shipdate) - 1 AS m,
                       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
                FROM lineitem GROUP BY 1, 2
            ) GROUP BY l_partkey
        ),
        xyz AS (
            SELECT l_partkey,
                   CASE WHEN 4 * (n * s2 - s1 * s1) <= s1 * s1 THEN 'X'
                        WHEN n * s2 - s1 * s1 <= s1 * s1 THEN 'Y'
                        ELSE 'Z' END AS xyz_class
            FROM md
        )
        SELECT a.abc_class, x.xyz_class,
               CAST(COUNT(*) AS BIGINT) AS n_parts,
               ROUND(CAST(SUM(a.cents) AS DOUBLE)
                     / (SELECT SUM(cents) FROM pv), 6) AS revenue_share
        FROM abc a JOIN xyz x USING (l_partkey)
        GROUP BY a.abc_class, x.xyz_class
    """,
    section="E42",
    doc="ABC-XYZ inventory classification — the 9-cell planning matrix "
    "(value importance x demand predictability) that decides stocking "
    "policy per part: ABC from the cumulative revenue curve (A = top "
    "80% of value, B to 95%, C rest — W16's Pareto curve turned into "
    "a label, boundaries as cum·100 <= tot·k INTEGER compares under a "
    "fully tie-broken descending order), XYZ from the coefficient of "
    "variation of monthly demand with the squared-threshold device: "
    "cv <= t  iff  (n·Σq² - S²) <= t²·S², so the 0.5/1.0 bands are "
    "pure int64 inequalities (4·var·n² <= S² and var·n² <= S²) — no "
    "sqrt, no float anywhere in the labels. Cell rollup reports part "
    "counts and revenue share. Scale: one part-grain value agg + one "
    "(part, month) demand agg; the ABC window runs on the part grain.",
)
def q_etl_abc_xyz(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(
        F.expr(
            "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 "
            "AS BIGINT)"
        ).alias("cents")
    )
    w = Window.orderBy(F.col("cents").desc(), F.col("l_partkey")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy()
    abc = pv.select(
        "l_partkey",
        "cents",
        F.sum("cents").over(w).alias("cum"),
        F.sum("cents").over(wall).alias("tot"),
    ).select(
        "l_partkey",
        "cents",
        F.when(F.col("cum") * 100 <= F.col("tot") * 80, "A")
        .when(F.col("cum") * 100 <= F.col("tot") * 95, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    mo = (F.year("l_shipdate") - 1995) * 12 + F.month("l_shipdate") - 1
    md = (
        li.groupBy("l_partkey", mo.alias("m"))
        .agg(
            F.sum(F.col("l_quantity").cast("bigint"))
            .cast("bigint")
            .alias("q")
        )
        .groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("q").cast("bigint").alias("s1"),
            F.sum(F.col("q") * F.col("q")).cast("bigint").alias("s2"),
        )
    )
    var_n2 = F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")
    xyz = md.select(
        "l_partkey",
        F.when(4 * var_n2 <= F.col("s1") * F.col("s1"), "X")
        .when(var_n2 <= F.col("s1") * F.col("s1"), "Y")
        .otherwise("Z")
        .alias("xyz_class"),
    )
    tot = pv.agg(F.sum("cents").cast("bigint").alias("tot_cents"))
    return (
        abc.join(xyz, "l_partkey")
        .groupBy("abc_class", "xyz_class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum("cents").cast("bigint").alias("cell_cents"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "abc_class",
            "xyz_class",
            "n_parts",
            F.round(
                F.col("cell_cents").cast("double") / F.col("tot_cents"), 6
            ).alias("revenue_share"),
        )
    )

@register(
    "q_etl_error_budget",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS d,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(CASE WHEN event_type = 'error' THEN 1
                                 ELSE 0 END) AS BIGINT) AS n_errors
            FROM events GROUP BY 1
        ),
        roll AS (
            SELECT d, n_events, n_errors,
                   CAST(SUM(n_events) OVER w7 AS BIGINT) AS n7,
                   CAST(SUM(n_errors) OVER w7 AS BIGINT) AS e7,
                   CAST(COUNT(*) OVER w7 AS BIGINT) AS k7
            FROM daily
            WINDOW w7 AS (ORDER BY d ROWS BETWEEN 6 PRECEDING
                          AND CURRENT ROW)
        )
        SELECT d, n_events, n_errors,
               ROUND(CAST(n_errors AS DOUBLE) / n_events, 6)
                   AS error_rate_1d,
               ROUND(CAST(e7 AS DOUBLE) / n7, 6) AS error_rate_7d,
               ROUND(CAST(e7 AS DOUBLE) / n7
                     / ((10000 - {_SLO_TARGET_Q4}) / 10000.0), 4)
                   AS burn_rate_7d,
               CAST(e7 * 10000 > ({10000 - _SLO_TARGET_Q4}) * n7 * 2
                    AS BOOLEAN) AS page_alert
        FROM roll WHERE k7 = 7
    """,
    section="E43",
    doc="SLO error-budget burn (the Google SRE multiwindow alert "
    "shape) on the events stream: daily and 7-day error rates "
    "against a 99.00% availability target, burn rate = rate / "
    "budget (burn 1.0 = spending the budget exactly on schedule), "
    "and the page alert fires when the 7-day burn exceeds 2x — "
    "evaluated as the INTEGER cross-multiplication e7·10000 > "
    "budget_bp·n7·2, so the alert boundary never rides a float "
    "(the same TS28 sign device; the reported rates are display "
    "doubles). The ops-reliability sibling of E-family "
    "volume_anomaly — this one is normative (against a target), "
    "not statistical. Scale: day-grain collapse, 7-row windows on "
    "the spine.",
)
def q_etl_error_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("bigint")
        .alias("n_errors"),
    )
    w7 = Window.orderBy("d").rowsBetween(-6, 0)
    roll = daily.select(
        "d",
        "n_events",
        "n_errors",
        F.sum("n_events").over(w7).cast("bigint").alias("n7"),
        F.sum("n_errors").over(w7).cast("bigint").alias("e7"),
        F.count(F.lit(1)).over(w7).cast("bigint").alias("k7"),
    ).where(F.col("k7") == 7)
    budget_bp = 10000 - _SLO_TARGET_Q4
    return roll.select(
        "d",
        "n_events",
        "n_errors",
        F.round(
            F.col("n_errors").cast("double") / F.col("n_events"), 6
        ).alias("error_rate_1d"),
        F.round(F.col("e7").cast("double") / F.col("n7"), 6).alias(
            "error_rate_7d"
        ),
        F.round(
            F.col("e7").cast("double")
            / F.col("n7")
            / F.lit(budget_bp / 10000.0),
            4,
        ).alias("burn_rate_7d"),
        (
            F.col("e7") * 10000 > F.lit(budget_bp) * F.col("n7") * 2
        ).alias("page_alert"),
    )

# ==== wave 171b: dynamic partition-overwrite plan ===================


@register(
    "q_etl_partition_overwrite_plan",
    oracle="""
        WITH cutoff AS (
            SELECT MAX(CAST(o_orderdate AS DATE)) - INTERVAL 90 DAY AS cut
            FROM orders
        ),
        parts AS (
            SELECT date_trunc('month', CAST(o.o_orderdate AS DATE)) AS mon,
                   CAST(COUNT(*) AS BIGINT) AS total_rows,
                   CAST(SUM(CASE WHEN CAST(o.o_orderdate AS DATE) > k.cut
                                 THEN 1 ELSE 0 END) AS BIGINT) AS batch_rows
            FROM orders o CROSS JOIN cutoff k
            GROUP BY 1
        )
        SELECT CAST(mon AS DATE) AS mon,
               total_rows, batch_rows,
               CAST(total_rows - batch_rows AS BIGINT) AS carried_rows,
               CASE WHEN batch_rows = 0 THEN 'untouched'
                    WHEN batch_rows = total_rows THEN 'full_overwrite'
                    ELSE 'partial_rewrite' END AS action
        FROM parts
        ORDER BY mon
    """,
    section="E44",
    doc="Dynamic partition-overwrite plan: given a 90-day incremental "
    "batch against a month-partitioned table, classify every "
    "partition as untouched / full_overwrite / partial_rewrite and "
    "count the rows the rewrite would carry forward — the audit run "
    "before INSERT OVERWRITE with "
    "spark.sql.sources.partitionOverwriteMode=dynamic, where "
    "'partial_rewrite' partitions are the dangerous ones (dynamic "
    "overwrite REPLACES the whole partition, so carried_rows is "
    "exactly the data you lose if the batch isn't a superset). All "
    "integer counts; the cutoff is a broadcast scalar. Scale: one "
    "keyed agg at partition grain with a conditional sum — the "
    "plan costs one scan regardless of table size, and partition "
    "pruning serves the same mon key at write time.",
)
def q_etl_partition_overwrite_plan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cut = orders.agg(
        F.date_sub(F.max(F.col("o_orderdate").cast("date")), 90).alias("cut")
    )
    parts = (
        orders.crossJoin(F.broadcast(cut))
        .groupBy(
            F.date_trunc("month", F.col("o_orderdate").cast("date"))
            .cast("date")
            .alias("mon")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("total_rows"),
            F.sum(
                F.when(
                    F.col("o_orderdate").cast("date") > F.col("cut"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("batch_rows"),
        )
    )
    return parts.select(
        "mon",
        "total_rows",
        "batch_rows",
        (F.col("total_rows") - F.col("batch_rows"))
        .cast("bigint")
        .alias("carried_rows"),
        F.when(F.col("batch_rows") == 0, "untouched")
        .when(F.col("batch_rows") == F.col("total_rows"), "full_overwrite")
        .otherwise("partial_rewrite")
        .alias("action"),
    )

@register(
    "q_etl_join_strategy_advisor",
    oracle=f"""
        WITH dims AS (
            {" UNION ALL ".join(_jsa_dim_sql(t) for t in _JSA_DIMS)}
        ),
        facts AS (
            SELECT 'lineitem' AS tname,
                   CAST(COUNT(*) AS BIGINT) AS rows_ FROM lineitem
            UNION ALL
            SELECT 'orders', CAST(COUNT(*) AS BIGINT) FROM orders
            UNION ALL
            SELECT 'customer', CAST(COUNT(*) AS BIGINT) FROM customer
            UNION ALL
            SELECT 'supplier', CAST(COUNT(*) AS BIGINT) FROM supplier
            UNION ALL
            SELECT 'nation', CAST(COUNT(*) AS BIGINT) FROM nation
        ),
        rels AS (
            {" UNION ALL ".join(
                f"SELECT '{f}' AS fact_table, '{d}' AS dim_table"
                for f, d in _JSA_RELS)}
        )
        SELECT r.fact_table, r.dim_table,
               f.rows_ AS fact_rows, d.rows_ AS dim_rows,
               d.est_bytes AS dim_est_bytes,
               CASE
                 WHEN d.est_bytes <= {_JSA_BROADCAST_BYTES}
                     THEN 'broadcast'
                 WHEN d.rows_ * {_JSA_HASH_RATIO} <= f.rows_
                     THEN 'shuffle_hash'
                 ELSE 'sort_merge'
               END AS strategy
        FROM rels r
        JOIN facts f ON f.tname = r.fact_table
        JOIN dims d ON d.tname = r.dim_table
    """,
    section="E50",
    doc="Cost-based join-strategy advisor over the schema's FK "
    "relationships: per dim table estimate in-memory bytes (fixed "
    "per-type widths + exact string-length sums — the same shape of "
    "estimate Catalyst's SizeInBytes statistics produce), then "
    "recommend broadcast (fits under "
    "spark.sql.autoBroadcastJoinThreshold's 10 MiB default), "
    "shuffle_hash (build side 16x smaller than probe), or "
    "sort_merge per relationship. This is the advisory readout a "
    "100 TB migration runs BEFORE submitting: it tells you which "
    "dims to pin as broadcast hints and which joins will shuffle "
    "both sides. All inputs are exact int64 (COUNT + SUM(length)); "
    "the CASE thresholds are integer compares. Scale: one "
    "map-side-combinable agg per table (count + length sums), "
    "union of 5+5 scalar rows, constant-size join after.",
)
def q_etl_join_strategy_advisor(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    dim_frames = []
    for t, (cols, fixed) in _JSA_DIMS.items():
        df = load_table(spark, sf_dir, t)
        lens = None
        for c in cols:
            term = F.sum(F.length(c))
            lens = term if lens is None else lens + term
        dim_frames.append(
            df.agg(
                F.count(F.lit(1)).alias("cnt"), lens.alias("slen")
            ).select(
                F.lit(t).alias("tname"),
                F.col("cnt").cast("bigint").alias("rows_"),
                (
                    (F.lit(fixed + 4 * len(cols)) * F.col("cnt"))
                    + F.col("slen")
                )
                .cast("bigint")
                .alias("est_bytes"),
            )
        )
    dims = dim_frames[0]
    for f_ in dim_frames[1:]:
        dims = dims.unionAll(f_)
    fact_frames = []
    for t in ["lineitem", "orders", "customer", "supplier", "nation"]:
        fact_frames.append(
            load_table(spark, sf_dir, t).agg(
                F.count(F.lit(1)).cast("bigint").alias("rows_")
            ).select(F.lit(t).alias("tname"), "rows_")
        )
    facts = fact_frames[0]
    for f_ in fact_frames[1:]:
        facts = facts.unionAll(f_)
    rels = spark.createDataFrame(
        _JSA_RELS, ["fact_table", "dim_table"]
    )
    out = (
        rels.join(
            F.broadcast(facts.select(F.col("tname").alias("fact_table"),
                                     F.col("rows_").alias("fact_rows"))),
            "fact_table",
        )
        .join(
            F.broadcast(
                dims.select(
                    F.col("tname").alias("dim_table"),
                    F.col("rows_").alias("dim_rows"),
                    F.col("est_bytes").alias("dim_est_bytes"),
                )
            ),
            "dim_table",
        )
    )
    return out.select(
        "fact_table",
        "dim_table",
        "fact_rows",
        "dim_rows",
        "dim_est_bytes",
        F.when(
            F.col("dim_est_bytes") <= _JSA_BROADCAST_BYTES,
            F.lit("broadcast"),
        )
        .when(
            F.col("dim_rows") * _JSA_HASH_RATIO <= F.col("fact_rows"),
            F.lit("shuffle_hash"),
        )
        .otherwise(F.lit("sort_merge"))
        .alias("strategy"),
    )

@register(
    "q_etl_partition_evolution_plan",
    oracle=f"""
        WITH {", ".join(
            f"g_{g} AS (SELECT date_trunc('{g}', CAST(o_orderdate AS "
            f"DATE)) AS p, CAST(COUNT(*) AS BIGINT) AS r FROM orders "
            f"GROUP BY 1)" for g in _PGE_GRAINS)}
        {" UNION ALL ".join(_pge_sql(g) for g in _PGE_GRAINS)}
    """,
    section="E51",
    doc="Partition-grain evolution plan (Iceberg-style partition-spec "
    "evolution, evaluated BEFORE rewriting): for candidate grains "
    "day/week/month over the order-date column, report partition "
    "count, max-partition rows, and the count of small partitions "
    "(< 1/4 of the mean), then verdict 'skewed' (max > 10x mean — "
    "coarsen or add a second key), 'too_fine' (majority small — the "
    "small-file problem at the metadata layer), or 'ok'. Every "
    "comparison clears fractions by cross-multiplication "
    "(4*r*P < total, max*P > 10*total) so the verdicts are exact "
    "int64 compares, no float thresholds. date_trunc('week') is "
    "ISO-Monday on both engines. Scale: three independent "
    "low-cardinality aggregations (map-side combinable) — the plan "
    "costs three passes over ONE int column, vs the full-table "
    "rewrite it gates.",
)
def q_etl_partition_evolution_plan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    outs = []
    for g in _PGE_GRAINS:
        parts = od.groupBy(
            F.date_trunc(g, F.col("o_orderdate").cast("date")).alias(
                "p"
            )
        ).agg(F.count(F.lit(1)).cast("bigint").alias("r"))
        scal = parts.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum("r").cast("bigint").alias("total_rows"),
            F.max("r").cast("bigint").alias("max_part_rows"),
        )
        small = (
            parts.crossJoin(F.broadcast(scal))
            .agg(
                F.sum(
                    F.when(
                        4 * F.col("r") * F.col("n_parts")
                        < F.col("total_rows"),
                        1,
                    ).otherwise(0)
                )
                .cast("bigint")
                .alias("n_small")
            )
        )
        outs.append(
            scal.crossJoin(F.broadcast(small)).select(
                F.lit(g).alias("grain"),
                "n_parts",
                "total_rows",
                "max_part_rows",
                "n_small",
                F.when(
                    F.col("max_part_rows") * F.col("n_parts")
                    > 10 * F.col("total_rows"),
                    F.lit("skewed"),
                )
                .when(
                    2 * F.col("n_small") > F.col("n_parts"),
                    F.lit("too_fine"),
                )
                .otherwise(F.lit("ok"))
                .alias("verdict"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionAll(o)
    return res

# ==== wave 189a: tamper-evident partition hash chain (E52) ==========


@register(
    "q_etl_partition_hash_chain",
    oracle="""
        WITH rowh AS (
            SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS m,
                   md5(CAST(o_orderkey AS VARCHAR) || '|'
                       || CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                               * 100 AS BIGINT) AS VARCHAR)) AS h
            FROM orders
        ),
        parth AS (
            SELECT m, md5(string_agg(h, ',' ORDER BY h)) AS ph
            FROM rowh GROUP BY m
        ),
        chain AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_partitions,
                   CAST(MIN(m) AS DATE) AS first_month,
                   CAST(MAX(m) AS DATE) AS last_month,
                   list_reduce(
                       list_prepend('genesis',
                           list(ph ORDER BY m)),
                       (acc, x) -> md5(acc || '|' || x)) AS chain_hash
            FROM parth
        )
        SELECT n_partitions, first_month, last_month, chain_hash
        FROM chain
    """,
    section="E52",
    doc="Tamper-evident partition hash chain over monthly order "
    "partitions: per-row md5 of the canonical (key|cents) string, "
    "per-partition md5 of the ORDER-BY-sorted row-hash "
    "concatenation (order-insensitive within the partition by "
    "construction), then a blockchain-style left fold "
    "chain = md5(chain || '|' || part_hash) in month order from a "
    "'genesis' seed — change ONE row in ANY month and the final "
    "chain hash differs, and unlike E8's flat checksum the chain "
    "also detects partition reordering/omission. The fold is the "
    "E-family's only sequential dependency and it runs over "
    "|months| scalar hashes (84 rows), not data: Spark "
    "F.aggregate over sort_array(collect_list), DuckDB list_reduce "
    "over list(ORDER BY) — identical left-to-right semantics. "
    "Scale: row hashing is map-only, partition hashes are one "
    "keyed agg; only 16-byte digests reach the driver-side fold.",
)
def q_etl_partition_hash_chain(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    rowh = od.select(
        F.date_trunc("month", F.col("o_orderdate").cast("date")).alias(
            "m"
        ),
        F.md5(
            F.concat(
                F.col("o_orderkey").cast("string"),
                F.lit("|"),
                F.expr(
                    "CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2))"
                    " * 100 AS BIGINT) AS STRING)"
                ),
            )
        ).alias("h"),
    )
    parth = rowh.groupBy("m").agg(
        F.md5(
            F.array_join(F.sort_array(F.collect_list("h")), ",")
        ).alias("ph")
    )
    chain = parth.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_partitions"),
        F.min("m").cast("date").alias("first_month"),
        F.max("m").cast("date").alias("last_month"),
        F.aggregate(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("m", "ph"))
                ),
                lambda s: s.getField("ph"),
            ),
            F.lit("genesis"),
            lambda acc, x: F.md5(F.concat(acc, F.lit("|"), x)),
        ).alias("chain_hash"),
    )
    return chain

# ==== wave 192a: generalization utility trade-off (E53) =============


@register(
    "q_etl_generalization_tradeoff",
    oracle="""
        WITH base AS (
            SELECT n.n_name AS nat, r.r_name AS reg, c.c_mktsegment AS seg
            FROM customer c
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
        ),
        l0 AS (
            SELECT 'L0_nation_segment' AS lvl,
                   CAST(COUNT(*) AS BIGINT) AS s
            FROM base GROUP BY nat, seg
        ),
        l1 AS (
            SELECT 'L1_region_segment' AS lvl,
                   CAST(COUNT(*) AS BIGINT) AS s
            FROM base GROUP BY reg, seg
        ),
        l2 AS (
            SELECT 'L2_region' AS lvl, CAST(COUNT(*) AS BIGINT) AS s
            FROM base GROUP BY reg
        ),
        classes AS (
            SELECT * FROM l0 UNION ALL
            SELECT * FROM l1 UNION ALL
            SELECT * FROM l2
        ),
        per_lvl AS (
            SELECT lvl,
                   CAST(COUNT(*) AS BIGINT) AS n_classes,
                   CAST(MIN(s) AS BIGINT) AS k_min,
                   CAST(SUM(s * s) AS BIGINT) AS discernibility,
                   CAST(SUM(s) AS BIGINT) AS n
            FROM classes GROUP BY lvl
        ),
        base_classes AS (
            SELECT n_classes AS nc0 FROM per_lvl
            WHERE lvl = 'L0_nation_segment'
        )
        SELECT p.lvl, p.n_classes, p.k_min, p.discernibility,
               ROUND(CAST(p.n AS DOUBLE) / p.n_classes, 4)
                   AS avg_class_size,
               ROUND(CAST(p.n_classes AS DOUBLE) / b.nc0, 6)
                   AS class_retention
        FROM per_lvl p CROSS JOIN base_classes b
    """,
    section="E53",
    doc="Privacy-utility trade-off of quasi-identifier "
    "generalization: for three generalization levels of the "
    "customer QI — (nation, segment) -> (region, segment) -> "
    "(region) — report k_min (the k-anonymity actually achieved, "
    "E21's metric), the discernibility cost sum(|class|^2) (the "
    "standard re-identification risk proxy: smaller classes = more "
    "discernible records), and class retention (how much analytic "
    "resolution survives). This is the table a privacy review "
    "reads to pick the COARSEST level meeting k: E21/E26/E27 "
    "measure one scheme, this ranks the ladder. Class sizes and "
    "sum-of-squares are exact int64; the two ratios are single "
    "divisions. Scale: three low-cardinality aggs over one joined "
    "frame — map-side combinable, 125-class ceiling.",
)
def q_etl_generalization_tradeoff(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region")
    base = (
        cu.join(
            F.broadcast(na), cu.c_nationkey == na.n_nationkey
        )
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .select(
            F.col("n_name").alias("nat"),
            F.col("r_name").alias("reg"),
            F.col("c_mktsegment").alias("seg"),
        )
    )
    lvls = [
        ("L0_nation_segment", ["nat", "seg"]),
        ("L1_region_segment", ["reg", "seg"]),
        ("L2_region", ["reg"]),
    ]
    frames = []
    for name, keys in lvls:
        frames.append(
            base.groupBy(*keys)
            .agg(F.count(F.lit(1)).cast("bigint").alias("s"))
            .select(F.lit(name).alias("lvl"), "s")
        )
    classes = frames[0]
    for f_ in frames[1:]:
        classes = classes.unionAll(f_)
    per_lvl = classes.groupBy("lvl").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.min("s").cast("bigint").alias("k_min"),
        F.sum(F.col("s") * F.col("s"))
        .cast("bigint")
        .alias("discernibility"),
        F.sum("s").cast("bigint").alias("n"),
    )
    base_classes = per_lvl.where(
        F.col("lvl") == "L0_nation_segment"
    ).select(F.col("n_classes").alias("nc0"))
    return per_lvl.crossJoin(F.broadcast(base_classes)).select(
        "lvl",
        "n_classes",
        "k_min",
        "discernibility",
        F.round(
            F.col("n").cast("double") / F.col("n_classes"), 4
        ).alias("avg_class_size"),
        F.round(
            F.col("n_classes").cast("double") / F.col("nc0"), 6
        ).alias("class_retention"),
    )

@register(
    "q_etl_watermark_completeness",
    oracle=f"""
        WITH arr AS (
            SELECT CAST(date_trunc('day', ts) AS DATE) AS event_day,
                   ts,
                   ts + to_minutes(
                       CAST(('0x' || substr(md5(
                            CAST(event_id AS VARCHAR)), 1, 8))
                            AS BIGINT) % 120
                       + CASE WHEN CAST(('0x' || substr(md5(
                            CAST(event_id AS VARCHAR)), 1, 8))
                            AS BIGINT) % 20 = 0
                         THEN 600 ELSE 0 END) AS arrival
            FROM events
        ),
        policies AS (SELECT unnest({_WM_DELAYS_MIN}) AS delay_min),
        flags AS (
            SELECT p.delay_min, a.event_day,
                   CASE WHEN a.arrival <= CAST(a.event_day AS TIMESTAMP)
                        + INTERVAL 1 DAY
                        + to_minutes(p.delay_min)
                        THEN 1 ELSE 0 END AS on_time
            FROM arr a CROSS JOIN policies p
        )
        SELECT CAST(delay_min AS BIGINT) AS watermark_delay_min,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(on_time) AS BIGINT) AS n_complete,
               ROUND(CAST(SUM(on_time) AS DOUBLE) / COUNT(*), 6)
                   AS completeness,
               CAST(COUNT(DISTINCT CASE WHEN on_time = 0
                          THEN event_day END) AS BIGINT)
                   AS days_with_late_data
        FROM flags GROUP BY delay_min
    """,
    section="E55",
    doc="Watermark completeness curve: simulate per-event arrival "
    "delay deterministically (md5-hex of the event id -> 0-119 "
    "minutes, with a 1-in-20 heavy tail of +10 h — the bimodal "
    "delay shape real pipelines see), then for candidate watermark "
    "delays {15, 60, 360} minutes past day close, report what "
    "fraction of each day's events would have arrived before the "
    "day's partition seals. THIS is how you choose "
    "withWatermark()'s delay: the curve's knee trades completeness "
    "against freshness, and days_with_late_data counts the "
    "partitions a backfill (E30) would still have to reopen. "
    "Hash-deterministic delays make the curve exact integer counts "
    "on both engines. Scale: row-local delay synthesis, one "
    "(policy x day-flag) aggregation — the 3x fan-out is counts, "
    "not payloads.",
)
def q_etl_watermark_completeness(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    h = F.expr(
        "cast(conv(substr(md5(cast(event_id as string)), 1, 8),"
        " 16, 10) as bigint)"
    )
    arr = ev.select(
        F.date_trunc("day", "ts").cast("date").alias("event_day"),
        (
            F.unix_micros("ts")
            + (h % 120) * F.lit(60000000)
            + F.when(h % 20 == 0, F.lit(36000000000))
            .otherwise(F.lit(0).cast("bigint"))
        ).alias("arrival_us"),
    )
    outs = []
    for d in _WM_DELAYS_MIN:
        cutoff = (
            F.unix_micros(
                F.col("event_day").cast("timestamp")
            )
            + F.lit((1440 + d) * 60000000)
        )
        flags = arr.select(
            "event_day",
            F.when(F.col("arrival_us") <= cutoff, 1)
            .otherwise(0)
            .alias("on_time"),
        )
        outs.append(
            flags.agg(
                F.lit(d).cast("bigint").alias("watermark_delay_min"),
                F.count(F.lit(1)).cast("bigint").alias("n_events"),
                F.sum("on_time").cast("bigint").alias("n_complete"),
                F.round(
                    F.sum("on_time").cast("double")
                    / F.count(F.lit(1)),
                    6,
                ).alias("completeness"),
                F.countDistinct(
                    F.when(F.col("on_time") == 0, F.col("event_day"))
                )
                .cast("bigint")
                .alias("days_with_late_data"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionAll(o)
    return res

@register(
    "q_etl_storage_tiering_plan",
    oracle=f"""
        WITH parts AS (
            SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS m,
                   CAST(COUNT(*) AS BIGINT) AS rows_,
                   CAST(COUNT(*) * 128 AS BIGINT) AS bytes_est,
                   CAST(date_diff('month',
                        date_trunc('month', CAST(o_orderdate AS DATE)),
                        (SELECT MAX(date_trunc('month',
                             CAST(o_orderdate AS DATE))) FROM orders))
                        AS BIGINT) AS age_months
            FROM orders
            GROUP BY date_trunc('month', CAST(o_orderdate AS DATE))
        ),
        tiered AS (
            SELECT CASE WHEN age_months <= 3 THEN 'hot'
                        WHEN age_months <= 12 THEN 'warm'
                        ELSE 'cold' END AS tier,
                   rows_, bytes_est
            FROM parts
        )
        SELECT tier,
               CAST(COUNT(*) AS BIGINT) AS n_partitions,
               CAST(SUM(rows_) AS BIGINT) AS total_rows,
               CAST(SUM(bytes_est) AS BIGINT) AS bytes_est,
               ROUND(CAST(SUM(bytes_est) AS DOUBLE) / 1073741824.0
                     * CASE tier WHEN 'hot' THEN {_TIER_RATES["hot"]}
                                 WHEN 'warm' THEN {_TIER_RATES["warm"]}
                                 ELSE {_TIER_RATES["cold"]} END, 8)
                   AS monthly_cost_usd
        FROM tiered GROUP BY tier
    """,
    section="E56",
    doc="Storage tiering plan over monthly order partitions: age "
    "since the newest partition buckets each month into hot "
    "(<= 3 mo), warm (<= 12 mo), cold, with byte estimates (fixed "
    "128 B/row, the E-family width convention) and projected "
    "monthly cost at S3-shaped literal rates — the lifecycle "
    "policy a lakehouse admin writes as an actual rule "
    "(transition-after-N-days), evaluated BEFORE flipping it on; "
    "complements E33's version pruning (reclaims) and E51's grain "
    "choice (layout) with the third lever: placement. Ages are "
    "integer month diffs against MAX(month) — data-relative, so "
    "the plan is deterministic at every SF; costs are single "
    "pinned multiplications by literals. Scale: one month-grain "
    "agg + a scalar max — trivially map-side.",
)
def q_etl_storage_tiering_plan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    parts = od.groupBy(
        F.date_trunc("month", F.col("o_orderdate").cast("date")).alias(
            "m"
        )
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("rows_"),
        (F.count(F.lit(1)) * 128).cast("bigint").alias("bytes_est"),
    )
    mx = parts.agg(F.max("m").alias("mx"))
    tiered = parts.crossJoin(F.broadcast(mx)).select(
        F.when(
            F.months_between(F.col("mx"), F.col("m")).cast("bigint")
            <= 3,
            F.lit("hot"),
        )
        .when(
            F.months_between(F.col("mx"), F.col("m")).cast("bigint")
            <= 12,
            F.lit("warm"),
        )
        .otherwise(F.lit("cold"))
        .alias("tier"),
        "rows_",
        "bytes_est",
    )
    rate = (
        F.when(F.col("tier") == "hot", F.lit(_TIER_RATES["hot"]))
        .when(F.col("tier") == "warm", F.lit(_TIER_RATES["warm"]))
        .otherwise(F.lit(_TIER_RATES["cold"]))
    )
    return tiered.groupBy("tier").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_partitions"),
        F.sum("rows_").cast("bigint").alias("total_rows"),
        F.sum("bytes_est").cast("bigint").alias("bytes_est"),
        F.round(
            F.sum("bytes_est").cast("double")
            / F.lit(1073741824.0)
            * F.max(rate),
            8,
        ).alias("monthly_cost_usd"),
    )
