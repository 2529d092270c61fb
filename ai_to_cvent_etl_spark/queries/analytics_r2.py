"""Third-wave analytics / ETL operators (r2): mode+exact-median aggregates,
SCD2 interval builds, deterministic stratified sampling, time-spine range
joins, time-RANGE window frames, and token co-occurrence mining.

Scale notes:
  * A13 mode/median: mode is two hash aggregations (group counts, then
    argmax-per-group via window over the tiny count table); exact median
    uses `percentile` (full sort per group partition at scale — swap to
    approx_percentile's t-digest when exactness isn't contractual).
  * E3 SCD2: one shuffle on the entity key, then a per-partition sorted
    window (lead) — the standard validity-interval build. At 100 TB the
    change log is already bucketed by entity; the window never crosses keys.
  * E4 stratified sample: pure row-local predicate on a cryptographic hash —
    zero shuffle, deterministic across engines/runs/retries, and the sample
    rate is exact-in-expectation per stratum. THE pattern for reproducible
    training-data subsampling (a seeded rand() is neither portable nor
    retry-stable on Spark).
  * J12 time-spine range join: the literal spine is tiny (~120 rows) and
    broadcast; Spark executes the range predicate as a
    BroadcastNestedLoopJoin of spine x events — at 100 TB invert it:
    bucket events row-locally (date_trunc) and group, or pre-bucket the
    spine per partition. Declared here to pin the generator (sequence/
    generate_series) + interval-containment surface.
  * W9 time-RANGE frame: per-user ordered window over microsecond offsets;
    partition-bounded (never a global RANGE frame — SCALE.md 'Windows').
  * T7 co-occurrence: per-doc distinct-token pairs via self-join on doc_id;
    pair volume is sum_d C(|d|,2) — bounded by the per-doc vocab, not the
    corpus. At 100 TB add a df-threshold prefilter (drop tokens with
    document frequency < k) before pairing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register


@register(
    "q_agg_mode_median",
    oracle="""
        WITH qty_counts AS (
            SELECT l_returnflag, l_quantity, CAST(COUNT(*) AS BIGINT) AS n
            FROM lineitem GROUP BY l_returnflag, l_quantity
        ),
        mode_q AS (
            SELECT l_returnflag, l_quantity AS mode_qty
            FROM (
                SELECT l_returnflag, l_quantity,
                       ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                          ORDER BY n DESC, l_quantity ASC) AS rn
                FROM qty_counts
            ) WHERE rn = 1
        ),
        med AS (
            SELECT l_returnflag,
                   ROUND(median(l_extendedprice), 4) AS median_price,
                   CAST(COUNT(*) AS BIGINT) AS n_rows
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT m.l_returnflag, mode_q.mode_qty, m.median_price, m.n_rows
        FROM med m JOIN mode_q ON m.l_returnflag = mode_q.l_returnflag
    """,
    section="A13",
    doc="Mode (most frequent value, lowest-value tie-break — never the "
    "engine's unspecified-tie mode()) and EXACT interpolated median per "
    "group. Mode = two hash aggs + a window over the tiny count table; "
    "median = Spark `percentile` vs DuckDB `median` (both interpolate at "
    "0.5, verified).",
)
def q_agg_mode_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("n").desc(), F.col("l_quantity").asc()
    )
    mode_q = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_returnflag", F.col("l_quantity").alias("mode_qty"))
    )
    med = li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias(
            "median_price"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return med.join(F.broadcast(mode_q), "l_returnflag").select(
        "l_returnflag", "mode_qty", "median_price", "n_rows"
    )


@register(
    "q_etl_scd2",
    oracle="""
        SELECT user_id,
               event_id,
               event_type,
               ts AS valid_from,
               LEAD(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS valid_to,
               CAST(LEAD(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                    AS BOOLEAN) AS is_current
        FROM events
    """,
    section="E3",
    doc="SCD2 validity-interval build from a change log: each record is "
    "effective [its ts, next change's ts); the latest per key stays open "
    "(valid_to NULL, is_current true). One shuffle on the entity key + one "
    "ordered window — the standard type-2 dimension load.",
)
def q_etl_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    valid_to = F.lead("ts").over(w)
    return events.select(
        "user_id",
        "event_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
    )


@register(
    "q_etl_sample_stratified",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders
        WHERE ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
              % 100
              < CASE o_orderstatus WHEN 'F' THEN 10
                                   WHEN 'O' THEN 20
                                   ELSE 50 END
    """,
    section="E4",
    doc="Deterministic stratified sampling for training-data curation: keep "
    "a row iff md5(key) mod 100 falls under its stratum's rate (F 10%, O "
    "20%, P 50%). Row-local, zero shuffle, engine-portable (md5 identical "
    "in Spark/DuckDB, probed r1), and stable across runs/retries — unlike "
    "seeded rand(), whose draw depends on partitioning.",
)
def q_etl_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    bucket = F.conv(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10
    ).cast("bigint") % 100
    rate = (
        F.when(F.col("o_orderstatus") == "F", 10)
        .when(F.col("o_orderstatus") == "O", 20)
        .otherwise(50)
    )
    return orders.filter(bucket < rate).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


@register(
    "q_join_range_interval",
    oracle="""
        WITH spine AS (
            SELECT ts AS bucket_start
            FROM generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                 TIMESTAMP '2024-01-31 00:00:00',
                                 INTERVAL 6 HOUR) t(ts)
        )
        SELECT s.bucket_start,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
        FROM spine s
        JOIN events e ON e.ts >= s.bucket_start
                     AND e.ts < s.bucket_start + INTERVAL 6 HOUR
        GROUP BY s.bucket_start
    """,
    section="J12",
    doc="Time-spine interval-containment join: a generated 6-hour spine "
    "(sequence/explode vs generate_series) joined to events by range "
    "predicate — Catalyst executes spine-side broadcast nested-loop, "
    "promoting the J11 BNLJ smoke row to an exact-oracle query. The "
    "calendar-spine join is the ETL idiom for gap-aware rollups (buckets "
    "with zero events drop under the inner join on both engines).",
)
def q_join_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    spine = spark.range(1).select(
        F.explode(
            F.expr(
                "sequence(timestamp'2024-01-01 00:00:00',"
                " timestamp'2024-01-31 00:00:00', interval 6 hours)"
            )
        ).alias("bucket_start")
    )
    joined = events.join(
        F.broadcast(spine),
        (F.col("ts") >= F.col("bucket_start"))
        & (F.col("ts") < F.col("bucket_start") + F.expr("interval 6 hours")),
    )
    return joined.groupBy("bucket_start").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "q_win_time_range",
    oracle="""
        SELECT user_id, event_id, ts,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (
                   PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS hour_sum
        FROM events
    """,
    section="W9",
    doc="Time-based RANGE frame: per-user rolling 1-hour sum. Spark has no "
    "interval RANGE frame, so the window orders by unix_micros(ts) with a "
    "microsecond rangeBetween — exactly DuckDB's RANGE INTERVAL semantics "
    "(both include ALL peer rows at equal ts). Money summed as DECIMAL "
    "(§5.3). Partition-bounded by user — never a global RANGE frame.",
)
def q_win_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return events.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(F.col("value").cast(DecimalType(12, 2)))
        .over(w)
        .cast("double")
        .alias("hour_sum"),
    )


@register(
    "q_text_cooccur",
    oracle="""
        WITH toks AS (
            SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
            FROM documents
        ),
        pairs AS (
            SELECT a.tok AS tok1, b.tok AS tok2, CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM toks a JOIN toks b
              ON a.doc_id = b.doc_id AND a.tok < b.tok
            GROUP BY a.tok, b.tok
        )
        SELECT tok1, tok2, n_docs, CAST(rn AS BIGINT) AS rank
        FROM (
            SELECT tok1, tok2, n_docs,
                   ROW_NUMBER() OVER (ORDER BY n_docs DESC, tok1, tok2) AS rn
            FROM pairs
        ) WHERE rn <= 20
    """,
    section="T7",
    doc="Token co-occurrence mining: count documents containing each "
    "distinct (tok1 < tok2) pair, top-20 with full tie-break. Pair volume "
    "is sum over docs of C(|vocab_d|, 2) — bounded per doc, not by corpus "
    "vocab squared; a document-frequency prefilter bounds it further at "
    "scale. The association-mining primitive under phrase detection / PMI.",
)
def q_text_cooccur(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import fan_out

    docs = load_table(spark, sf_dir, "documents")
    toks = fan_out(
        docs.select(
            "doc_id",
            F.explode(F.array_distinct(F.split("text", " "))).alias("tok"),
        )
    )
    a, b = toks.alias("a"), toks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.tok") < F.col("b.tok")),
        )
        .groupBy(F.col("a.tok").alias("tok1"), F.col("b.tok").alias("tok2"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    w = Window.orderBy(F.col("n_docs").desc(), "tok1", "tok2")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("tok1", "tok2", "n_docs", F.col("rn").cast("bigint").alias("rank"))
    )


_KM_DIST = """list_reduce(list_transform(list_zip(e.embedding, c.c),
                   p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                      * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))),
                   (acc, v) -> acc + v)"""

# The 2-round deterministic Lloyd chain (see q_vec_kmeans_ivf's doc) — shared
# between V6 (training output) and V7 (search over the trained cells).
_KM_CTES = f"""seeds AS (
            SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cluster
            FROM embeddings ORDER BY vec_id LIMIT 8
        ),
        c0 AS (
            SELECT s.cluster,
                   list_transform(e.embedding,
                       x -> floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5)
                            / 1000000.0) AS c
            FROM seeds s JOIN embeddings e USING (vec_id)
        ),
        a1 AS (
            SELECT vec_id, cluster FROM (
                SELECT e.vec_id, c.cluster,
                       ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                          ORDER BY {_KM_DIST}, c.cluster) AS rn
                FROM embeddings e CROSS JOIN c0 c
            ) WHERE rn = 1
        ),
        u1 AS (
            SELECT a1.cluster, d.i AS dim,
                   floor(CAST(SUM(CAST(
                             floor(CAST(e.embedding[d.i] AS DOUBLE)
                                   * 1000000.0 + 0.5) / 1000000.0
                         AS DECIMAL(18,6))) AS DOUBLE)
                         / COUNT(*) * 1000000.0 + 0.5) / 1000000.0 AS v
            FROM a1 JOIN embeddings e USING (vec_id), range(1, 65) d(i)
            GROUP BY a1.cluster, d.i
        ),
        c1 AS (
            SELECT cluster, list(v ORDER BY dim) AS c FROM u1 GROUP BY cluster
        ),
        a2 AS (
            SELECT vec_id, cluster, dist2 FROM (
                SELECT e.vec_id, c.cluster,
                       {_KM_DIST} AS dist2,
                       ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                          ORDER BY {_KM_DIST}, c.cluster) AS rn
                FROM embeddings e CROSS JOIN c1 c
            ) WHERE rn = 1
        )"""


@register(
    "q_vec_kmeans_ivf",
    oracle=f"""
        WITH {_KM_CTES}
        SELECT vec_id, CAST(cluster AS BIGINT) AS cluster,
               ROUND(dist2, 4) AS dist2
        FROM a2
    """,
    section="V6",
    doc="Learned-centroid IVF coarse quantizer: 2 deterministic Lloyd "
    "rounds (k=8) from the k-lowest-vec_id seeds. Cross-engine bit-"
    "reproducibility engineered via floor(x*1e6+0.5) grid quantization "
    "(pure double ops — decimal CASTs round half-lattice means "
    "differently per engine) + exact decimal sums in the centroid "
    "update and left-to-right distance folds with lowest-cluster "
    "tie-break (operators/kmeans.py). "
    "Assignment is map-only over broadcast-literal centroids; the update "
    "is one (cluster, dim)-keyed shuffle — the IVF training loop at any "
    "scale. Oracle: DuckDB recomputes both rounds in chained CTEs.",
)
def q_vec_kmeans_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.operators.kmeans import kmeans_fit_assign

    emb = load_table(spark, sf_dir, "embeddings")
    out = kmeans_fit_assign(emb, k=8, iters=2, cache_key=sf_dir)
    return out.select(
        "vec_id", "cluster", F.round("dist2", 4).alias("dist2")
    )


@register(
    "q_etl_data_quality",
    oracle="""
        SELECT 'o_orderkey' AS col_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
               CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_null,
               CAST(MIN(o_orderkey) AS DOUBLE) AS min_v,
               CAST(MAX(o_orderkey) AS DOUBLE) AS max_v
        FROM orders
        UNION ALL
        SELECT 'o_custkey',
               CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
               CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(MIN(o_custkey) AS DOUBLE),
               CAST(MAX(o_custkey) AS DOUBLE)
        FROM orders
        UNION ALL
        SELECT 'o_totalprice_nullif_under_1000',
               CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(DISTINCT NULLIF(LEAST(o_totalprice, 1000.0),
                                          1000.0)) AS BIGINT),
               CAST(SUM(CASE WHEN NULLIF(LEAST(o_totalprice, 1000.0), 1000.0)
                             IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(MIN(NULLIF(LEAST(o_totalprice, 1000.0), 1000.0)) AS DOUBLE),
               CAST(MAX(NULLIF(LEAST(o_totalprice, 1000.0), 1000.0)) AS DOUBLE)
        FROM orders
    """,
    section="E5",
    doc="Data-quality audit profile (the ETL pre-load gate): per-column "
    "row/distinct/null counts + numeric min/max, one scan per column batch "
    "via unioned aggregates. The third column manufactures NULLs via "
    "NULLIF(LEAST(...)) since the fixtures have none — pinning null "
    "accounting on both engines. At scale: one pass, partial aggs, no "
    "shuffle beyond the final 1-row-per-column reduce.",
)
def q_etl_data_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")

    def profile(col: F.Column, name: str) -> DataFrame:
        return orders.agg(
            F.lit(name).alias("col_name"),
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct(col).alias("n_distinct"),
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias("n_null"),
            F.min(col).cast("double").alias("min_v"),
            F.max(col).cast("double").alias("max_v"),
        )

    nulled = F.nullif(F.least(F.col("o_totalprice"), F.lit(1000.0)), F.lit(1000.0))
    return (
        profile(F.col("o_orderkey"), "o_orderkey")
        .unionByName(profile(F.col("o_custkey"), "o_custkey"))
        .unionByName(profile(nulled, "o_totalprice_nullif_under_1000"))
    )


@register(
    "q_text_pmi",
    oracle="""
        WITH toks AS (
            SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
            FROM documents
        ),
        n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n_docs FROM documents),
        df AS (SELECT tok, CAST(COUNT(*) AS DOUBLE) AS df FROM toks GROUP BY tok),
        pairs AS (
            SELECT a.tok AS tok1, b.tok AS tok2, CAST(COUNT(*) AS DOUBLE) AS n_pair
            FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND a.tok < b.tok
            GROUP BY a.tok, b.tok
        )
        SELECT tok1, tok2, CAST(n_pair AS BIGINT) AS n_docs,
               ROUND(ln((n_pair / n.n_docs)
                        / ((d1.df / n.n_docs) * (d2.df / n.n_docs))), 4) AS pmi
        FROM pairs
        CROSS JOIN n
        JOIN df d1 ON d1.tok = pairs.tok1
        JOIN df d2 ON d2.tok = pairs.tok2
        WHERE n_pair >= 5
    """,
    section="T8",
    doc="Pointwise mutual information over document-level token "
    "co-occurrence: pmi = ln(p(t1,t2) / (p(t1) p(t2))) with document "
    "frequencies, min-support 5, ROUND 4 (log outputs are irrational — "
    "never on the rounding lattice). The collocation/phrase-detection "
    "scorer; doc frequencies broadcast back onto the pair table.",
)
def q_text_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import fan_out

    docs = load_table(spark, sf_dir, "documents")
    toks = fan_out(
        docs.select(
            "doc_id",
            F.explode(F.array_distinct(F.split("text", " "))).alias("tok"),
        )
    )
    n_docs = docs.select(F.countDistinct("doc_id").cast("double").alias("n_docs"))
    df = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("double").alias("df"))
    a, b = toks.alias("a"), toks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.tok") < F.col("b.tok")),
        )
        .groupBy(F.col("a.tok").alias("tok1"), F.col("b.tok").alias("tok2"))
        .agg(F.count(F.lit(1)).cast("double").alias("n_pair"))
        .filter(F.col("n_pair") >= 5)
    )
    d1 = df.select(F.col("tok").alias("tok1"), F.col("df").alias("df1"))
    d2 = df.select(F.col("tok").alias("tok2"), F.col("df").alias("df2"))
    return (
        pairs.crossJoin(F.broadcast(n_docs))
        .join(F.broadcast(d1), "tok1")
        .join(F.broadcast(d2), "tok2")
        .select(
            "tok1",
            "tok2",
            F.col("n_pair").cast("bigint").alias("n_docs"),
            F.round(
                F.log(
                    (F.col("n_pair") / F.col("n_docs"))
                    / ((F.col("df1") / F.col("n_docs")) * (F.col("df2") / F.col("n_docs")))
                ),
                4,
            ).alias("pmi"),
        )
    )


@register(
    "q_agg_histogram",
    oracle="""
        SELECT CAST(floor(value / 20.0) AS BIGINT) AS bin,
               CAST(floor(value / 20.0) * 20.0 AS DOUBLE) AS bin_lo,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(MIN(value) AS DOUBLE) AS min_v,
               CAST(MAX(value) AS DOUBLE) AS max_v,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_v
        FROM events
        GROUP BY 1, 2
    """,
    section="A14",
    doc="Fixed-width histogram binning (width_bucket semantics via "
    "floor(x/w)): bin id, bound, count, min/max, DECIMAL-exact sum per "
    "bin. The distribution-profiling aggregate; one partial-agg shuffle "
    "keyed by bin at any scale.",
)
def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    bin_ = F.floor(F.col("value") / 20.0)
    return (
        events.groupBy(
            bin_.cast("bigint").alias("bin"),
            (bin_ * 20.0).cast("double").alias("bin_lo"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").cast("double").alias("min_v"),
            F.max("value").cast("double").alias("max_v"),
            F.sum(F.col("value").cast(DecimalType(12, 2)))
            .cast("double")
            .alias("sum_v"),
        )
    )


_PAIR_DIST = """list_reduce(list_transform(list_zip(q.embedding, x.embedding),
                   p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                      * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))),
                   (acc, v) -> acc + v)"""


@register(
    "q_vec_ivf_search_learned",
    oracle=f"""
        WITH {_KM_CTES},
        knn AS (
            SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                      ORDER BY {_PAIR_DIST}, x.vec_id) AS rn
            FROM embeddings q
            JOIN a2 aq ON aq.vec_id = q.vec_id
            JOIN a2 ax ON ax.cluster = aq.cluster
            JOIN embeddings x ON x.vec_id = ax.vec_id
                             AND x.vec_id <> q.vec_id
            WHERE q.vec_id < 10
        )
        SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rank
        FROM knn WHERE rn <= 3
    """,
    section="V7",
    doc="IVF search over the LEARNED cells (completes the V6 training "
    "loop): queries (vec_id < 10) probe only their own k-means cell; "
    "exact L2 top-3 inside the cell, tie-break by neighbor id; ids+rank "
    "output (fp-drift-immune, like V3). At scale this is THE ANN serving "
    "plan: corpus partitioned by cell id on disk, queries broadcast to "
    "their cell's partitions only — a 1/k scan instead of a full sweep "
    "(nprobe>1 = union over the nearest cells). Oracle: the shared Lloyd "
    "CTE chain, then cell-constrained brute force.",
)
def q_vec_ivf_search_learned(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.operators.kmeans import kmeans_fit_assign

    emb = load_table(spark, sf_dir, "embeddings")
    assigned = kmeans_fit_assign(emb, k=8, iters=2, cache_key=sf_dir).select(
        "vec_id", "cluster", "embedding"
    )
    q = assigned.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("cluster").alias("q_cluster"),
        F.col("embedding").alias("q_emb"),
    )
    pair_dist = F.aggregate(
        F.zip_with(
            F.col("q_emb"),
            F.col("embedding"),
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda a, v: a + v,
    )
    cand = (
        assigned.join(
            F.broadcast(q),
            (F.col("cluster") == F.col("q_cluster"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            pair_dist.alias("d2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy("d2", "neighbor_id")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("query_id", "neighbor_id", F.col("rn").cast("bigint").alias("rank"))
    )


@register(
    "q_join_asof_fwd",
    oracle="""
        WITH l AS (
            SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
        ),
        r AS (
            SELECT event_id, user_id, ts FROM events WHERE event_type <> 'purchase'
        ),
        ranked AS (
            SELECT l.event_id, l.user_id, l.ts,
                   r.event_id AS event_id_matched, r.ts AS ts_matched,
                   ROW_NUMBER() OVER (PARTITION BY l.event_id
                                      ORDER BY r.ts ASC, r.event_id ASC) AS rn
            FROM l LEFT JOIN r ON l.user_id = r.user_id AND r.ts >= l.ts
        )
        SELECT event_id, user_id, ts, event_id_matched, ts_matched
        FROM ranked WHERE rn = 1
    """,
    section="J13",
    doc="FORWARD as-of join: earliest following non-purchase event per "
    "purchase (exact-ts matches allowed; smallest-event_id tie-break). "
    "Same union+window machinery as J10 run in descending traversal "
    "(operators/asof.py direction='forward') — one shuffle on the by-key, "
    "no range-join explosion. Oracle: windowed LEFT JOIN (DuckDB ASOF is "
    "backward-only).",
)
def q_join_asof_fwd(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.operators.asof import asof_join

    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    others = events.filter(F.col("event_type") != "purchase").select(
        "event_id", "user_id", "ts"
    )
    return asof_join(
        purchases,
        others,
        on="ts",
        by="user_id",
        right_payload=["event_id", "ts"],
        tiebreak="event_id",
        direction="forward",
    )


@register(
    "q_join_point_in_time",
    oracle="""
        WITH dim AS (
            SELECT user_id, event_id AS dim_id, event_type AS dim_state,
                   ts AS valid_from,
                   LEAD(ts) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS valid_to
            FROM events WHERE event_type <> 'purchase'
        )
        SELECT f.event_id AS fact_id, f.user_id, f.ts,
               d.dim_id, d.dim_state, d.valid_from
        FROM events f
        JOIN dim d ON f.user_id = d.user_id
                  AND f.ts >= d.valid_from
                  AND (d.valid_to IS NULL OR f.ts < d.valid_to)
        WHERE f.event_type = 'purchase'
    """,
    section="J14",
    doc="Point-in-time (temporal) dimension lookup: facts join the SCD2 "
    "validity interval containing their timestamp — equi-join on the "
    "entity key with a half-open interval residual. Each fact matches at "
    "most one interval (intervals partition the timeline). The E3+J14 "
    "pair is the full SCD2 load-then-lookup cycle; at 100 TB both sides "
    "bucket on the entity key and the lookup is shuffle-free.",
)
def q_join_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dim = (
        events.filter(F.col("event_type") != "purchase")
        .select(
            F.col("user_id").alias("d_user_id"),
            F.col("event_id").alias("dim_id"),
            F.col("event_type").alias("dim_state"),
            F.col("ts").alias("valid_from"),
        )
        .withColumn(
            "valid_to",
            F.lead("valid_from").over(
                Window.partitionBy("d_user_id").orderBy("valid_from", "dim_id")
            ),
        )
    )
    facts = events.filter(F.col("event_type") == "purchase")
    return (
        facts.join(
            dim,
            (F.col("user_id") == F.col("d_user_id"))
            & (F.col("ts") >= F.col("valid_from"))
            & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to"))),
        )
        .select(
            F.col("event_id").alias("fact_id"),
            "user_id",
            "ts",
            "dim_id",
            "dim_state",
            "valid_from",
        )
    )


@register(
    "q_bitwise_funcs",
    oracle="""
        SELECT o_orderkey,
               CAST(o_orderkey & 255 AS BIGINT) AS band,
               CAST(o_orderkey | 16 AS BIGINT) AS bor,
               CAST(xor(o_orderkey, 85) AS BIGINT) AS bxor,
               CAST(o_orderkey << 2 AS BIGINT) AS shl,
               CAST(o_orderkey >> 3 AS BIGINT) AS shr,
               CAST(bit_count(o_orderkey) AS INTEGER) AS popcount
        FROM orders
    """,
    section="F10",
    doc="Bitwise operator surface: and/or/xor/shifts/popcount on the key "
    "column — the hash-partitioning / bloom-filter / bitmask-flag "
    "primitives. Row-local, codegen'd JVM-side.",
)
def q_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return orders.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("band"),
        k.bitwiseOR(F.lit(16)).alias("bor"),
        k.bitwiseXOR(F.lit(85)).alias("bxor"),
        F.shiftleft(k, 2).alias("shl"),
        F.shiftright(k, 3).alias("shr"),
        F.bit_count(k).alias("popcount"),
    )


@register(
    "q_udf_arrow",
    tags=("python_boundary",),
    oracle="""
        SELECT doc_id,
               regexp_replace(lower(text), '[aeiou]', '', 'g') AS fp,
               CAST(length(regexp_replace(lower(text), '[aeiou]', '', 'g'))
                    AS INTEGER) AS fp_len
        FROM documents
    """,
    section="X5",
    doc="Arrow-optimized scalar Python UDF (Spark 4 useArrow=True): the "
    "same vowel-strip fingerprint as X1/X2, pinning the third Python "
    "execution path (pickled-batch UDF, pandas UDF, arrow UDF). Arrow "
    "serialization without the pandas Series wrapper — the recommended "
    "modern default for row-wise Python logic.",
)
def q_udf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udf

    @udf("string", useArrow=True)
    def strip_vowels(s: str) -> str:
        return "".join(ch for ch in s.lower() if ch not in "aeiou")

    docs = load_table(spark, sf_dir, "documents")
    fp = strip_vowels(F.col("text"))
    return docs.select(
        "doc_id", fp.alias("fp"), F.length(fp).cast("int").alias("fp_len")
    )


@register(
    "q_win_session_attrib",
    oracle="""
        WITH ordered AS (
            SELECT user_id, event_id, event_type, ts,
                   CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id)
                             > INTERVAL 10 MINUTE
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        ),
        sess AS (
            SELECT user_id, event_id, event_type, ts,
                   SUM(new_session) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id
                                          ROWS UNBOUNDED PRECEDING) AS session_seq
            FROM ordered
        )
        SELECT user_id,
               CAST(session_seq AS BIGINT) AS session_seq,
               MIN(ts) AS session_start,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               first(event_type ORDER BY ts, event_id) AS first_touch,
               last(event_type ORDER BY ts, event_id) AS last_touch,
               CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) = 1
                    AS BOOLEAN) AS converted
        FROM sess
        GROUP BY user_id, session_seq
    """,
    section="W10",
    doc="Sessionization with attribution: gaps-and-islands session ids "
    "(strict >10min gap starts a session), then per-session first-touch / "
    "last-touch event types and conversion flag — the marketing-"
    "attribution rollup. DuckDB's order-sensitive first()/last() with the "
    "ORDER BY modifier mirrors Spark's min_by/max_by on a (ts, event_id) "
    "struct key (plain MIN(x ORDER BY ...) would still be a value-min). "
    "The gap compare runs on unix MICROS on both engines — casting ts to "
    "long truncates to seconds and silently merges 600.x-second gaps.",
)
def q_win_session_attrib(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    new_session = F.when(gap > 600_000_000, 1).otherwise(0)
    sess = events.withColumn(
        "session_seq",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    ord_key = F.struct(F.col("ts"), F.col("event_id"))
    return sess.groupBy("user_id", F.col("session_seq").cast("bigint").alias("session_seq")).agg(
        F.min("ts").alias("session_start"),
        F.count(F.lit(1)).alias("n_events"),
        F.min_by("event_type", ord_key).alias("first_touch"),
        F.max_by("event_type", ord_key).alias("last_touch"),
        (F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)) == 1).alias(
            "converted"
        ),
    )


@register(
    "q_win_funnel",
    oracle="""
        WITH v AS (
            SELECT user_id, MIN(ts) AS ts_view FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ),
        c AS (
            SELECT e.user_id, MIN(e.ts) AS ts_click
            FROM events e JOIN v ON v.user_id = e.user_id
            WHERE e.event_type = 'click' AND e.ts >= v.ts_view
            GROUP BY e.user_id
        ),
        p AS (
            SELECT e.user_id, MIN(e.ts) AS ts_purchase
            FROM events e JOIN c ON c.user_id = e.user_id
            WHERE e.event_type = 'purchase' AND e.ts >= c.ts_click
            GROUP BY e.user_id
        )
        SELECT u.user_id, v.ts_view, c.ts_click, p.ts_purchase,
               CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
                         WHEN c.user_id IS NOT NULL THEN 2
                         WHEN v.user_id IS NOT NULL THEN 1
                         ELSE 0 END AS INTEGER) AS funnel_stage
        FROM (SELECT DISTINCT user_id FROM events) u
        LEFT JOIN v ON v.user_id = u.user_id
        LEFT JOIN c ON c.user_id = u.user_id
        LEFT JOIN p ON p.user_id = u.user_id
    """,
    section="W11",
    doc="Ordered funnel analysis: per user, the earliest view -> first "
    "click AT/after it -> first purchase at/after that; funnel_stage "
    "0-3. Three chained conditional aggregations (each one key-shuffle, "
    "co-partitioned so AQE collapses the chain) — the product-analytics "
    "staple that window functions alone cannot express.",
)
def q_win_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    users = events.select("user_id").distinct()
    v = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts_view"))
    )
    c = (
        events.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("ts_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts_click"))
    )
    p = (
        events.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("ts_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts_purchase"))
    )
    stage = (
        F.when(F.col("ts_purchase").isNotNull(), 3)
        .when(F.col("ts_click").isNotNull(), 2)
        .when(F.col("ts_view").isNotNull(), 1)
        .otherwise(0)
    )
    return (
        users.join(v, "user_id", "left")
        .join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "ts_view",
            "ts_click",
            "ts_purchase",
            stage.cast("int").alias("funnel_stage"),
        )
    )


@register(
    "q_agg_cohort_retention",
    oracle="""
        WITH firsts AS (
            SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day FROM events
            GROUP BY user_id
        ),
        activity AS (
            SELECT DISTINCT e.user_id, f.cohort_day,
                   datediff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset
            FROM events e JOIN firsts f ON f.user_id = e.user_id
        )
        SELECT cohort_day, CAST(day_offset AS BIGINT) AS day_offset,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM activity
        GROUP BY cohort_day, day_offset
    """,
    section="A15",
    doc="Cohort retention: users grouped by first-activity day, counted on "
    "each later active day offset — the retention-curve aggregate. Two "
    "key-shuffles (first-day, then distinct activity), both partial-agg "
    "friendly; the cohort join broadcasts at any realistic cohort count.",
)
def q_agg_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    firsts = events.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("cohort_day")
    )
    activity = events.join(F.broadcast(firsts), "user_id").select(
        "user_id",
        "cohort_day",
        F.datediff(F.col("ts").cast("date"), F.col("cohort_day")).alias(
            "day_offset"
        ),
    )
    # countDistinct folds the dedup INTO the aggregation (partial aggs both
    # phases) instead of a standalone .distinct() shuffle + count; the
    # cohort table broadcasts (one row per user — small even at 100 TB of
    # events when users are bounded; shuffle-join if not).
    return activity.groupBy(
        "cohort_day", F.col("day_offset").cast("bigint").alias("day_offset")
    ).agg(F.countDistinct("user_id").alias("n_users"))


@register(
    "q_agg_quantiles",
    oracle="""
        SELECT l_returnflag,
               ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
               ROUND(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
               ROUND(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
               ROUND(quantile_cont(l_extendedprice, 0.75)
                     - quantile_cont(l_extendedprice, 0.25), 4) AS iqr
        FROM lineitem GROUP BY l_returnflag
    """,
    section="A16",
    doc="Multi-quantile profile: exact interpolated p25/p50/p75 + IQR per "
    "group in ONE sort pass (Spark percentile with a fraction array — the "
    "engine computes all three from a single ordered accumulation, not "
    "three sorts). Scale path: approx_percentile's t-digest, same call "
    "shape.",
)
def q_agg_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    qs = F.expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D))")
    return (
        li.groupBy("l_returnflag")
        .agg(qs.alias("__q"))
        .select(
            "l_returnflag",
            F.round(F.element_at("__q", 1), 4).alias("p25"),
            F.round(F.element_at("__q", 2), 4).alias("p50"),
            F.round(F.element_at("__q", 3), 4).alias("p75"),
            F.round(
                F.element_at("__q", 3) - F.element_at("__q", 1), 4
            ).alias("iqr"),
        )
    )


@register(
    "q_agg_string_bool",
    oracle="""
        SELECT n.n_name,
               string_agg(c.c_mktsegment, '|' ORDER BY c.c_mktsegment, c.c_custkey)
                   AS segments,
               bool_and(c.c_acctbal > 0) AS all_positive,
               bool_or(c.c_acctbal > 9000) AS any_rich,
               CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    """,
    section="A17",
    doc="Order-sensitive string aggregation (listagg/string_agg with full "
    "tie-broken ORDER BY — the only deterministic way to use it) plus "
    "bool_and/bool_or group predicates. Spark side: array_join over "
    "sort_array(collect_list(struct)) — identical ordered concatenation.",
)
def q_agg_string_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    ordered = F.transform(
        F.sort_array(
            F.collect_list(F.struct(F.col("c_mktsegment"), F.col("c_custkey")))
        ),
        lambda s: s["c_mktsegment"],
    )
    return (
        customer.join(
            F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .groupBy("n_name")
        .agg(
            F.array_join(ordered, "|").alias("segments"),
            F.bool_and(F.col("c_acctbal") > 0).alias("all_positive"),
            F.bool_or(F.col("c_acctbal") > 9000).alias("any_rich"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


@register(
    "q_etl_gap_fill",
    oracle="""
        WITH spine AS (
            SELECT CAST(d AS DATE) AS day
            FROM generate_series(DATE '2024-01-01', DATE '2024-01-30',
                                 INTERVAL 1 DAY) t(d)
        ),
        daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
            FROM events WHERE event_type = 'purchase'
            GROUP BY 1
        )
        SELECT s.day,
               COALESCE(d.n_events, 0) AS n_events,
               COALESCE(d.n_users, 0) AS n_users,
               CAST(d.day IS NULL AS BOOLEAN) AS gap_filled
        FROM spine s LEFT JOIN daily d ON d.day = s.day
    """,
    section="E6",
    doc="Calendar gap-filling: a generated day spine LEFT-joined to daily "
    "aggregates, missing days zero-filled and flagged — the reporting-"
    "table densification every ETL warehouse load needs (downstream "
    "windows/interpolation break on missing rows). Spine is literal-"
    "bounded (the fixture's fixed date domain) and broadcast.",
)
def q_etl_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    spine = spark.range(1).select(
        F.explode(
            F.expr("sequence(date'2024-01-01', date'2024-01-30', interval 1 day)")
        ).alias("day")
    )
    daily = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )
    return (
        F.broadcast(spine)
        .join(daily, "day", "left")
        .select(
            "day",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("n_users", F.lit(0)).alias("n_users"),
            F.col("n_events").isNull().alias("gap_filled"),
        )
    )


@register(
    "q_unpivot_melt",
    oracle="""
        SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
               CAST(l_quantity AS DOUBLE) AS value
        FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_extendedprice',
               CAST(l_extendedprice AS DOUBLE)
        FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_discount',
               CAST(l_discount AS DOUBLE)
        FROM lineitem
    """,
    section="A18",
    doc="UNPIVOT/melt (the inverse of A9's pivot): wide measure columns to "
    "long (key, measure, value) rows via df.unpivot — executed as a "
    "row-local Expand (each input row emits k output rows, no shuffle, no "
    "k-fold rescan; the oracle's UNION ALL formulation rescans k times, "
    "which is exactly why the engine-side Expand shape matters at scale).",
)
def q_unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("double").alias("l_quantity"),
        F.col("l_extendedprice").cast("double").alias("l_extendedprice"),
        F.col("l_discount").cast("double").alias("l_discount"),
    ).unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "value",
    )


@register(
    "q_filter_in_subquery",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_custkey IN (
            SELECT c_custkey FROM customer WHERE c_acctbal > 9000
        )
        AND o_orderkey NOT IN (
            SELECT l_orderkey FROM lineitem WHERE l_discount > 0.09
        )
    """,
    section="P6",
    doc="IN / NOT IN subquery predicates through the spark.sql entry point "
    "— Catalyst rewrites them to left-semi / null-aware left-anti joins "
    "(the NOT IN null-awareness is the classic correctness trap; fixture "
    "keys are non-null so both engines agree). Pins subquery planning, "
    "not just the DataFrame semi/anti API (J5/J6).",
)
def q_filter_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_custkey IN (
            SELECT c_custkey FROM customer WHERE c_acctbal > 9000
        )
        AND o_orderkey NOT IN (
            SELECT l_orderkey FROM lineitem WHERE l_discount > 0.09
        )
        """
    )


@register(
    "q_win_nth_value",
    oracle="""
        SELECT o_orderkey, o_custkey,
               nth_value(o_totalprice, 2) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS second_price,
               CAST(SUM(CASE WHEN o_totalprice > 100000.0 THEN 1 ELSE 0 END)
                    OVER (PARTITION BY o_custkey) AS BIGINT) AS n_big_orders
        FROM orders
    """,
    section="W12",
    doc="nth_value with an explicit full frame (the default running frame "
    "silently returns NULL for rows before the nth — the classic trap, "
    "same family as W6) + count_if as a windowed conditional count "
    "(DuckDB's count_if is a macro that cannot be windowed — the oracle "
    "uses SUM(CASE), same semantics). Orders per customer, (date, key)-"
    "tie-broken.",
)
def q_win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w_full = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    w_part = Window.partitionBy("o_custkey")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.nth_value("o_totalprice", 2).over(w_full).alias("second_price"),
        F.count_if(F.col("o_totalprice") > 100000.0)
        .over(w_part)
        .alias("n_big_orders"),
    )


@register(
    "q_str_funcs2",
    oracle="""
        SELECT c_custkey,
               translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_translated,
               repeat(left(c_name, 3), 2) AS name_rep,
               reverse(c_name) AS name_rev,
               CAST(strpos(c_name, '0') AS INTEGER) AS first_zero,
               right(c_name, 4) AS name_tail,
               CAST(ascii(c_mktsegment) AS INTEGER) AS seg_ascii,
               chr(65 + CAST(c_custkey % 26 AS INTEGER)) AS key_chr
        FROM customer
    """,
    section="F11",
    doc="String surface, wave 2: translate / repeat / reverse / position "
    "(Spark instr == DuckDB strpos, both 1-based 0-if-absent) / left / "
    "right / ascii / chr. Row-local, codegen'd.",
)
def q_str_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    return customer.select(
        "c_custkey",
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("seg_translated"),
        F.repeat(F.substring("c_name", 1, 3), 2).alias("name_rep"),
        F.reverse("c_name").alias("name_rev"),
        F.instr("c_name", "0").cast("int").alias("first_zero"),
        F.substring("c_name", -4, 4).alias("name_tail"),
        F.ascii("c_mktsegment").cast("int").alias("seg_ascii"),
        F.chr(F.lit(65) + (F.col("c_custkey") % 26).cast("int")).alias("key_chr"),
    )


@register(
    "q_math_funcs2",
    oracle="""
        SELECT event_id,
               ROUND(sin(value), 4) + 0.0 AS sin_v,
               ROUND(cos(value), 4) + 0.0 AS cos_v,
               ROUND(atan2(value, 10.0), 4) + 0.0 AS atan2_v,
               ROUND(log10(value), 4) + 0.0 AS log10_v,
               ROUND(log2(value), 4) + 0.0 AS log2_v,
               ROUND(cbrt(value), 4) AS cbrt_v,
               ROUND(degrees(value), 4) AS deg_v,
               ROUND(radians(value), 4) AS rad_v
        FROM events
        WHERE value > 0
    """,
    section="F12",
    doc="Math surface, wave 2: trig, atan2, log10/log2, cbrt, degrees/"
    "radians — all irrational outputs ROUND 4 on both engines (§5.3; "
    "libm implementations may differ in the last ulp, never at 4dp for "
    "non-lattice inputs). Guarded value > 0 on BOTH sides: events.value "
    "contains exact 0 from sf0.1 up (DuckDB raises on log(0), Spark "
    "returns null — the r1 divergence class). Sign-crossing outputs get "
    "`+ 0.0` in the oracle: DuckDB's ROUND preserves IEEE -0.0 where "
    "Spark's BigDecimal round normalizes it, and -0.0 + 0.0 == +0.0.",
)
def q_math_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    v = F.col("value")
    return events.filter(v > 0).select(
        "event_id",
        F.round(F.sin(v), 4).alias("sin_v"),
        F.round(F.cos(v), 4).alias("cos_v"),
        F.round(F.atan2(v, F.lit(10.0)), 4).alias("atan2_v"),
        F.round(F.log10(v), 4).alias("log10_v"),
        F.round(F.log2(v), 4).alias("log2_v"),
        F.round(F.cbrt(v), 4).alias("cbrt_v"),
        F.round(F.degrees(v), 4).alias("deg_v"),
        F.round(F.radians(v), 4).alias("rad_v"),
    )


@register(
    "q_agg_skew_kurt",
    oracle="""
        WITH mu AS (
            SELECT l_returnflag, AVG(l_quantity) AS m
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l.l_returnflag,
               ROUND(AVG(POW(l.l_quantity - mu.m, 3))
                     / POW(AVG(POW(l.l_quantity - mu.m, 2)), 1.5), 4) + 0.0
                   AS skew_qty,
               ROUND(AVG(POW(l.l_quantity - mu.m, 4))
                     / POW(AVG(POW(l.l_quantity - mu.m, 2)), 2) - 3.0, 4) + 0.0
                   AS kurt_qty,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM lineitem l JOIN mu USING (l_returnflag)
        GROUP BY l.l_returnflag
    """,
    section="A19",
    doc="Higher statistical moments per group: Spark's skewness/kurtosis "
    "use POPULATION moments (g1 = m3/m2^1.5, excess g2 = m4/m2^2 - 3); "
    "DuckDB's builtins are SAMPLE-corrected and would diverge, so the "
    "oracle recomputes Spark's definition from raw moments (two-pass, "
    "mean in a CTE, `+ 0.0` negative-zero normalization). ROUND 4 "
    "absorbs the one-pass-vs-two-pass fp summation difference (moments "
    "are non-lattice). Distribution profiling for feature QA.",
)
def q_agg_skew_kurt(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.skewness("l_quantity"), 4).alias("skew_qty"),
        F.round(F.kurtosis("l_quantity"), 4).alias("kurt_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "q_join_salted_skew",
    oracle="""
        SELECT p.p_type,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS revenue
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_type
    """,
    section="J15",
    doc="Skew-mitigated salted join (operators/skew.py): the fact side "
    "carries a deterministic hash salt, the dimension side is exploded "
    "k=4 ways, the join runs on (key, salt) so one hot key spreads over "
    "k partitions. Salting must be RESULT-INVARIANT — the oracle is the "
    "plain join, which is exactly the correctness contract the operator "
    "must honor (and why how='right'/'full' are rejected). DECIMAL-exact "
    "revenue per part type.",
)
def q_join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("p_partkey"), "l_extendedprice"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    joined = salted_join(li, part, on=["p_partkey"], k=4, how="inner")
    return joined.groupBy("p_type").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_extendedprice").cast(DecimalType(18, 2)))
        .cast("double")
        .alias("revenue"),
    )


@register(
    "q_win_distinct_running",
    oracle="""
        WITH dd AS (
            SELECT DISTINCT event_type, CAST(ts AS DATE) AS day, user_id
            FROM events
        )
        SELECT DISTINCT event_type, day,
               CAST(COUNT(DISTINCT user_id) OVER (
                   PARTITION BY event_type ORDER BY day
                   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cum_users
        FROM dd
    """,
    section="W13",
    doc="Running DISTINCT count (cumulative unique users per event type by "
    "day): Spark has no COUNT(DISTINCT) OVER, and the naive "
    "size(collect_set) window carries the whole cumulative user set as "
    "per-row state. The scale-safe same-answer plan: a user contributes to "
    "the cumulative count from their FIRST active day onward, so min(day) "
    "per (event_type, user) -> per-day first-seen counts -> running SUM "
    "over the day spine. Window state is one long per row (constant), "
    "both shuffles are keyed aggregations with map-side combine.",
)
def q_win_distinct_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    base = events.select(
        "event_type", F.col("ts").cast("date").alias("day"), "user_id"
    )
    # first day each user is seen per event type (a user's min day is always
    # a day present in the spine, so the left join below loses nothing)
    firsts = base.groupBy("event_type", "user_id").agg(F.min("day").alias("day"))
    new_per_day = firsts.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    days = base.select("event_type", "day").distinct()
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        days.join(new_per_day, ["event_type", "day"], "left")
        .withColumn(
            "cum_users",
            F.sum(F.coalesce(F.col("new_users"), F.lit(0))).over(w).cast("bigint"),
        )
        .select("event_type", "day", "cum_users")
    )


# ==== wave 184a: IVF cell-imbalance factor (V41) ====================


@register(
    "q_vec_ivf_imbalance",
    oracle=f"""
        WITH {_KM_CTES},
        cells AS (
            SELECT cluster, CAST(COUNT(*) AS BIGINT) AS s
            FROM a2 GROUP BY cluster
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(s) AS BIGINT) AS n,
               CAST(MAX(s) AS BIGINT) AS max_cell,
               CAST(MIN(s) AS BIGINT) AS min_cell,
               ROUND(CAST(COUNT(*) AS DOUBLE) * SUM(s * s)
                     / (CAST(SUM(s) AS DOUBLE) * SUM(s)), 6)
                   AS imbalance_factor,
               ROUND(CAST(SUM(s * s) AS DOUBLE) / SUM(s), 4)
                   AS exp_probe_candidates
        FROM cells
    """,
    section="V41",
    doc="IVF index imbalance factor over the V6 learned coarse "
    "quantizer's cells: k * sum(s^2) / (sum s)^2 — FAISS's own "
    "index-health metric (1.0 = perfectly balanced cells; 2.0 means "
    "queries hitting cells proportionally to data scan 2x the "
    "balanced candidate count). exp_probe_candidates = sum(s^2)/n "
    "is the expected short-list size for a data-distributed query "
    "at nprobe=1 — THE number that decides whether the V6/V7 "
    "serving path meets latency at 100 TB, and the trigger for "
    "re-training with more centroids or splitting hot cells. Cell "
    "sizes are exact int64 counts off the bit-reproducible Lloyd "
    "assignment (memoized model, map-only assign); the two ratios "
    "are pinned double expressions. Scale: one groupBy(cluster) "
    "over the assignment — k rows of state.",
)
def q_vec_ivf_imbalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.operators.kmeans import kmeans_fit_assign

    emb = load_table(spark, sf_dir, "embeddings")
    out = kmeans_fit_assign(emb, k=8, iters=2, cache_key=sf_dir)
    cells = out.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("bigint").alias("s")
    )
    return cells.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("s").cast("bigint").alias("n"),
        F.max("s").cast("bigint").alias("max_cell"),
        F.min("s").cast("bigint").alias("min_cell"),
        F.round(
            F.count(F.lit(1)).cast("double")
            * F.sum(F.col("s") * F.col("s"))
            / (F.sum("s").cast("double") * F.sum("s")),
            6,
        ).alias("imbalance_factor"),
        F.round(
            F.sum(F.col("s") * F.col("s")).cast("double") / F.sum("s"),
            4,
        ).alias("exp_probe_candidates"),
    )
