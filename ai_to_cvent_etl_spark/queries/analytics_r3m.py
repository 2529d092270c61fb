"""Fifteenth-wave operators (r3 continuation): PCA power iteration, lambda
higher-order functions, per-group OLS, KMV Jaccard, mapInArrow, changepoint.

  V16 q_vec_pca_power      — top principal component of the embedding
                             cloud via three unrolled power-iteration
                             rounds over an exactly-reproducible
                             covariance matrix (quantized-decimal sums,
                             the G1 PageRank device).
  F14 q_higher_order_funcs — the lambda higher-order-function family
                             (transform / aggregate / exists / forall /
                             zip_with / indexed filter) vs DuckDB's
                             list_* lambdas.
  A31 q_agg_linear_fit     — per-status OLS of o_totalprice on the order
                             day index: slope, intercept, r² from exact
                             decimal/integer moments.
  SK5 q_sketch_kmv_jaccard — KMV set-similarity sketch: Jaccard estimate
                             between two event-type user sets from the
                             k minimum hashes of the union, with the
                             exact Jaccard alongside — like SK4, a
                             sketch whose ESTIMATE is exactly
                             reproducible cross-engine.
  X7  q_map_in_arrow       — df.mapInArrow: zero-copy Arrow RecordBatch
                             transform using pyarrow.compute kernels
                             only (no pandas, no per-row Python).
  TS11 q_ts_changepoint    — single change-point detection on the daily
                             revenue series: argmin over two-segment SSE
                             from exact prefix moments.

Determinism notes (SURVEY §5.3):
  * V16 quantizes every float product with floor(x·1e12) → DECIMAL(38,0)
    before summation (exact, order-insensitive; floor is exactly
    defined on doubles everywhere — G1's device), so the covariance,
    every matvec, and every norm are bit-identical cross-engine; the
    iteration start vector 1/8 = 0.125 is exact in binary. Loadings
    rounded at 6dp, eigenvalue at 4dp. Sign is pinned by the
    deterministic start vector (power iteration preserves it).
  * F14 is integer/string/boolean lambda logic only — no floats.
    DuckDB's lambda index is 1-based vs Spark's 0-based (probed in T2):
    parity masks use i%2==0 (Spark) vs i%2=1 (DuckDB).
  * A31 keeps all five regression moments exact: integer n/Sx/Sxx,
    DECIMAL Sy/Sxy/Syy (y squared at width 19 → DuckDB int128 path,
    the §2.28 width rule); slope/intercept/r² are single IEEE formulas
    over identical decimal→double casts, rounded at 6dp.
  * SK5 is pure hash/integer logic over the SK4 48-bit md5 hash — the
    estimate itself is a ratio of exact integers, no rounding needed.
  * X7's Arrow kernels (utf8_length, utf8_reverse, utf8_slice_codeunits)
    are exact string ops mirrored by length/reverse/substr in DuckDB;
    the corpus is ASCII (probed in r1), so codeunit slicing == char
    slicing.
  * TS11's per-split SSE uses exact cumulative moments (integer counts,
    DECIMAL sums, width-19 squares); the cost is one IEEE expression
    over identical inputs — identical BITS cross-engine — so the argmin
    needs no pre-rounding; ties break on the earlier day. Output means
    and cost rounded at 4dp.

Scale notes:
  * V16's covariance is the relational outer-product (posexplode² self-
    join co-keyed on vec_id): d²=4096 terms/vector — fine for d=64; at
    d in the thousands the Gram accumulation moves into a mapInPandas
    partial (X-side d×d accumulator per partition, one reduce), same
    result. The 64×64 matrix and 64-row vector are bounded relations;
    each matvec is one broadcast-size join + keyed reduce, three rounds
    total — never a driver collect.
  * F14/X7 are map-only column pipelines — no shuffle at any scale; X7
    stays zero-copy Arrow end to end (no pandas materialization).
  * A31 is one scan → one 3-group reduction; partial aggregation
    carries all six moments map-side.
  * SK5's state is the k smallest hashes per side — the rank window
    runs on the DISTINCT hash relation like SK4; sketches merge by
    re-ranking (mergeable across partitions/days).
  * TS11 aggregates to the day grain FIRST (the TS7 window-on-spine
    rule), so the cumulative window and argmin run on |days| rows —
    single-partition by design, constant memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.queries._util import dec2
from ai_to_cvent_etl_spark.registry import register

# --- helpers: quantized-decimal exact sums (the G1 PageRank device) ----------

_Q = 1e12


def _qsum(c):
    """Exact, order-insensitive sum of a double column: quantize with
    floor(x*1e12) (exactly defined on doubles), sum as DECIMAL(38,0),
    convert back to double. Bit-identical on Spark and DuckDB."""
    return (
        F.sum(F.floor(c * F.lit(_Q)).cast("decimal(38,0)")).cast("double")
        / F.lit(_Q)
    )


_QSUM_DUCK = "CAST(SUM(CAST(floor(({x}) * 1e12) AS DECIMAL(38,0))) AS DOUBLE) / 1e12"


# --- V16: PCA top component via power iteration ------------------------------

_PCA_ROUNDS = 3

_PCA_IT_DUCK = """
        mv{i} AS (
            SELECT c.i AS i,
                   {qsum} AS s
            FROM cov c JOIN v{j} v ON v.i = c.j
            GROUP BY c.i
        ),
        nrm{i} AS (
            SELECT sqrt({qsum2}) AS nrm FROM mv{i}
        ),
        v{i} AS (
            SELECT i, s / nrm AS x FROM mv{i} CROSS JOIN nrm{i}
        )""".format(
    i="{i}",
    j="{j}",
    qsum=_QSUM_DUCK.format(x="c.c * v.x"),
    qsum2=_QSUM_DUCK.format(x="s * s"),
)


@register(
    "q_vec_pca_power",
    oracle=(
        """
        WITH ex AS (
            SELECT vec_id, u.i AS i, CAST(u.x AS DOUBLE) AS x
            FROM (
                SELECT vec_id,
                       unnest(list_transform(embedding,
                              (x, i) -> struct_pack(x := x, i := i))) AS u
                FROM embeddings
            )
        ),
        mean AS (
            SELECT i, {qmean} / COUNT(*) AS m FROM ex GROUP BY i
        ),
        cx AS (
            SELECT e.vec_id, e.i, e.x - m.m AS cx
            FROM ex e JOIN mean m ON m.i = e.i
        ),
        cov AS (
            SELECT a.i AS i, b.i AS j,
                   {qcov} / (COUNT(*) - 1) AS c
            FROM cx a JOIN cx b ON a.vec_id = b.vec_id
            GROUP BY a.i, b.i
        ),
        v0 AS (
            SELECT DISTINCT i, CAST(0.125 AS DOUBLE) AS x FROM ex
        ),""".format(
            qmean=_QSUM_DUCK.format(x="x"),
            qcov=_QSUM_DUCK.format(x="a.cx * b.cx"),
        )
        + ",".join(
            _PCA_IT_DUCK.format(i=i, j=i - 1) for i in range(1, _PCA_ROUNDS + 1)
        )
        + f"""
        SELECT v.i AS dim,
               ROUND(v.x, 6) AS loading,
               ROUND(n.nrm, 4) AS eigenvalue
        FROM v{_PCA_ROUNDS} v CROSS JOIN nrm{_PCA_ROUNDS} n
    """
    ),
    section="V16",
    doc="Top principal component of the embedding cloud: mean-center, "
    "build the 64x64 covariance as the relational outer product "
    "(posexplode^2 self-join co-keyed on vec_id), then three unrolled "
    "power-iteration rounds (matvec -> L2-normalize), starting from the "
    "exact-in-binary uniform unit vector 1/8. EVERY float reduction — "
    "dim means, covariance cells, matvec terms, norm squares — goes "
    "through the floor(x*1e12) DECIMAL quantization (G1's device), so "
    "the whole iteration is bit-identical cross-engine with no "
    "intermediate rounding. The eigenvalue is the final matvec norm "
    "(the Rayleigh estimate under unit input). The matrix and vector "
    "are bounded 64-row relations — matvecs are broadcast-size joins, "
    "never driver collects.",
)
def q_vec_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id", F.posexplode("embedding").alias("i", "xf")
    ).select("vec_id", (F.col("i") + 1).alias("i"), F.col("xf").cast("double").alias("x"))
    mean = ex.groupBy("i").agg((_qsum(F.col("x")) / F.count("*")).alias("m"))
    cx = ex.join(mean, "i").select(
        "vec_id", "i", (F.col("x") - F.col("m")).alias("cx")
    )
    a, b = cx.alias("a"), cx.alias("b")
    cov = (
        a.join(b, "vec_id")
        .select(
            F.col("a.i").alias("i"),
            F.col("b.i").alias("j"),
            (F.col("a.cx") * F.col("b.cx")).alias("p"),
        )
        .groupBy("i", "j")
        .agg((_qsum(F.col("p")) / (F.count("*") - 1)).alias("c"))
    )
    cov = cov.localCheckpoint(eager=False)
    v = ex.select("i").distinct().select("i", F.lit(0.125).alias("x"))
    nrm = None
    for _ in range(_PCA_ROUNDS):
        mv = (
            cov.join(v.withColumnRenamed("i", "j"), "j")
            .select("i", (F.col("c") * F.col("x")).alias("p"))
            .groupBy("i")
            .agg(_qsum(F.col("p")).alias("s"))
        )
        nrm = mv.agg(F.sqrt(_qsum(F.col("s") * F.col("s"))).alias("nrm"))
        v = mv.crossJoin(nrm).select("i", (F.col("s") / F.col("nrm")).alias("x"))
    return v.crossJoin(nrm).select(
        F.col("i").cast("long").alias("dim"),
        F.round("x", 6).alias("loading"),
        F.round("nrm", 4).alias("eigenvalue"),
    )


# --- F14: lambda higher-order functions --------------------------------------


@register(
    "q_higher_order_funcs",
    oracle="""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS sp FROM documents
        )
        SELECT doc_id,
               CAST(list_sum(list_transform(sp, x -> length(x)))
                    AS BIGINT) AS total_chars,
               len(list_filter(sp, x -> length(x) > 7)) > 0 AS has_long,
               len(list_filter(sp, x -> length(x) >= 20)) = 0 AS all_short,
               sp[1] || '~' || list_reverse(sp)[1] AS first_pair,
               CAST(len(list_filter(sp, (x, i) -> i % 2 = 1)) AS INT)
                   AS n_odd_pos
        FROM t
    """,
    section="F14",
    doc="The lambda higher-order-function family over token arrays — "
    "transform (per-token lengths), aggregate (integer fold to total "
    "chars), exists/forall (length predicates), zip_with (pair tokens "
    "with the reversed array), and INDEXED filter (odd positions; "
    "Spark's lambda index is 0-based, DuckDB's 1-based — the parity "
    "masks differ by one on purpose). All integer/string/boolean logic "
    "— no floats. Map-only at any scale: lambdas run inside "
    "whole-stage codegen, never in Python.",
)
def q_higher_order_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sp = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.aggregate(
            F.transform(sp, lambda x: F.length(x)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
        F.exists(sp, lambda x: F.length(x) > 7).alias("has_long"),
        F.forall(sp, lambda x: F.length(x) < 20).alias("all_short"),
        F.element_at(
            F.zip_with(sp, F.reverse(sp), lambda x, y: F.concat_ws("~", x, y)),
            1,
        ).alias("first_pair"),
        F.size(F.filter(sp, lambda x, i: i % 2 == 0)).alias("n_odd_pos"),
    )


# --- A31: per-group OLS linear fit -------------------------------------------


@register(
    "q_agg_linear_fit",
    oracle="""
        WITH d AS (
            SELECT o_orderstatus,
                   CAST(date_diff('day', TIMESTAMP '1995-01-01',
                                  o_orderdate) AS DECIMAL(10,0)) AS x,
                   CAST(o_totalprice AS DECIMAL(19,2)) AS y
            FROM orders
        ),
        m AS (
            SELECT o_orderstatus,
                   CAST(COUNT(*) AS DOUBLE) AS n,
                   CAST(SUM(x) AS DOUBLE) AS sx,
                   CAST(SUM(x * x) AS DOUBLE) AS sxx,
                   CAST(SUM(y) AS DOUBLE) AS sy,
                   CAST(SUM(y * y) AS DOUBLE) AS syy,
                   CAST(SUM(x * y) AS DOUBLE) AS sxy
            FROM d GROUP BY o_orderstatus
        )
        SELECT o_orderstatus,
               CAST(n AS BIGINT) AS n,
               ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
                   AS slope,
               ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
                     / n, 6) AS intercept,
               ROUND((n * sxy - sx * sy) * (n * sxy - sx * sy)
                     / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
                   AS r2
        FROM m
    """,
    section="A31",
    doc="Per-status OLS fit of o_totalprice on the order day index "
    "(days since 1995-01-01): slope, intercept, r² from the six exact "
    "moments — integer-valued DECIMAL x/Sx/Sxx, money-DECIMAL Sy/Sxy "
    "with y at width 19 before squaring (the §2.28 width rule: int128 "
    "multiply path on DuckDB, precision-exact on Spark). The fit "
    "formulas are single IEEE expressions over identical decimal→double "
    "casts, rounded at 6dp. One scan → one 3-group reduction; partial "
    "aggregation carries all moments map-side — the scalable trend-fit "
    "shape (vs native regr_* aggregates, whose double accumulation "
    "order differs cross-engine).",
)
def q_agg_linear_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    d = orders.select(
        "o_orderstatus",
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01"))
        .cast("decimal(10,0)")
        .alias("x"),
        F.col("o_totalprice").cast("decimal(19,2)").alias("y"),
    )
    m = d.groupBy("o_orderstatus").agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return m.select(
        "o_orderstatus",
        F.col("n").cast("long").alias("n"),
        F.round(num / den, 6).alias("slope"),
        F.round((F.col("sy") - num / den * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
        F.round(num * num / (den * deny), 6).alias("r2"),
    )


# --- SK5: KMV Jaccard set-similarity sketch ----------------------------------

_KMVJ_K = 16
_H48_SPARK = (
    "cast(conv(substr(md5(cast(user_id as string)), 1, 12), 16, 10)"
    " as bigint)"
)
_H48_DUCK = (
    "CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12)) AS BIGINT)"
)


@register(
    "q_sketch_kmv_jaccard",
    oracle=f"""
        WITH h AS (
            SELECT {_H48_DUCK} AS h48,
                   MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                       AS in_a,
                   MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS in_b
            FROM events
            WHERE event_type IN ('click', 'purchase')
            GROUP BY user_id
        ),
        ranked AS (
            SELECT h48, in_a, in_b,
                   row_number() OVER (ORDER BY h48) AS rnk
            FROM h
        ),
        sk AS (
            SELECT CAST(SUM(in_a * in_b) AS DOUBLE) / {_KMVJ_K}
                       AS jaccard_est
            FROM ranked WHERE rnk <= {_KMVJ_K}
        ),
        ex AS (
            SELECT CAST(SUM(in_a * in_b) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS jaccard_exact,
                   CAST(COUNT(*) AS BIGINT) AS n_union
            FROM h
        )
        SELECT CAST({_KMVJ_K} AS INT) AS k,
               sk.jaccard_est, ex.jaccard_exact, ex.n_union
        FROM sk CROSS JOIN ex
    """,
    section="SK5",
    doc=f"KMV set-similarity sketch: the Jaccard similarity between the "
    "'click' and 'purchase' user sets estimated from the k={_KMVJ_K} "
    "minimum 48-bit hashes of the UNION (the fraction of the k-min "
    "sample lying in the intersection — the classic bottom-k estimator), "
    "with the exact Jaccard and union size alongside. Pure hash/integer "
    "logic over SK4's md5 hash: the estimate is a ratio of exact "
    "integers, so — like SK4 and unlike HLL — the sketch output itself "
    "hash-matches cross-engine. Per-side state is the k smallest "
    "hashes; sketches merge by re-ranking (mergeable across partitions "
    "and time windows).",
)
def q_sketch_kmv_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    h = (
        ev.where(F.col("event_type").isin("click", "purchase"))
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ).alias("in_a"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("in_b"),
        )
        .select(F.expr(_H48_SPARK).alias("h48"), "in_a", "in_b")
    )
    ranked = h.withColumn(
        "rnk", F.row_number().over(Window.orderBy("h48"))
    )
    sk = ranked.where(F.col("rnk") <= _KMVJ_K).agg(
        (F.sum(F.col("in_a") * F.col("in_b")).cast("double") / _KMVJ_K).alias(
            "jaccard_est"
        )
    )
    ex = h.agg(
        (
            F.sum(F.col("in_a") * F.col("in_b")).cast("double")
            / F.count("*").cast("double")
        ).alias("jaccard_exact"),
        F.count("*").alias("n_union"),
    )
    return sk.crossJoin(ex).select(
        F.lit(_KMVJ_K).alias("k"), "jaccard_est", "jaccard_exact", "n_union"
    )


# --- X7: mapInArrow zero-copy batch transform --------------------------------


def _arrow_reverse_batches(it):
    """RecordBatch -> RecordBatch using pyarrow.compute kernels only:
    no pandas, no per-row Python. Cited API: pyspark DataFrame.mapInArrow
    (public since Spark 3.3)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in it:
        text = batch.column(batch.schema.get_field_index("text"))
        yield pa.RecordBatch.from_arrays(
            [
                batch.column(batch.schema.get_field_index("doc_id")),
                pc.cast(pc.utf8_length(text), pa.int32()),
                pc.utf8_slice_codeunits(pc.utf8_reverse(text), 0, 12),
            ],
            names=["doc_id", "n_chars_arrow", "rev_prefix"],
        )


@register(
    "q_map_in_arrow",
    oracle="""
        SELECT doc_id,
               CAST(length(text) AS INT) AS n_chars_arrow,
               substr(reverse(text), 1, 12) AS rev_prefix
        FROM documents
    """,
    section="X7",
    doc="df.mapInArrow zero-copy batch transform: the Python boundary at "
    "its cheapest — Arrow RecordBatches in, pyarrow.compute kernels "
    "(utf8_length / utf8_reverse / utf8_slice_codeunits), RecordBatches "
    "out; no pandas materialization, no per-row Python, columnar on "
    "both sides of the FFI. The corpus is ASCII (probed r1), so "
    "codeunit slicing equals character slicing and the DuckDB mirror "
    "is plain length/reverse/substr. Map-only — no shuffle at any "
    "scale; the X1-X7 family pins every tier of the Python boundary "
    "(row UDF, pandas UDF, Arrow UDF, UDTF, cogroup, mapInArrow).",
)
def q_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInArrow(
        _arrow_reverse_batches,
        "doc_id long, n_chars_arrow int, rev_prefix string",
    )


# --- TS11: two-segment changepoint detection ---------------------------------

_CP_MINSEG = 7


@register(
    "q_ts_changepoint",
    oracle=f"""
        WITH daily AS (
            SELECT o_orderdate AS day,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) // 100000 AS v
            FROM orders GROUP BY o_orderdate
        ),
        cum AS (
            SELECT day, v,
                   row_number() OVER w AS t,
                   COUNT(*) OVER () AS n,
                   CAST(SUM(v) OVER w AS BIGINT) AS cs,
                   CAST(SUM(v * v) OVER w AS BIGINT) AS cq,
                   CAST(SUM(v) OVER () AS BIGINT) AS ts,
                   CAST(SUM(v * v) OVER () AS BIGINT) AS tq
            FROM daily
            WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)
        ),
        cost AS (
            SELECT day, t, n,
                   CAST(cq AS DOUBLE)
                   - CAST(cs AS DOUBLE) * CAST(cs AS DOUBLE) / t
                   + (CAST(tq AS DOUBLE) - CAST(cq AS DOUBLE))
                   - (CAST(ts AS DOUBLE) - CAST(cs AS DOUBLE))
                     * (CAST(ts AS DOUBLE) - CAST(cs AS DOUBLE))
                     / (n - t) AS sse,
                   CAST(cs AS DOUBLE) / t AS mean_left,
                   (CAST(ts AS DOUBLE) - CAST(cs AS DOUBLE)) / (n - t)
                       AS mean_right
            FROM cum
            WHERE t >= {_CP_MINSEG} AND t <= n - {_CP_MINSEG}
        )
        SELECT day AS split_day,
               CAST(t AS BIGINT) AS n_left,
               CAST(n - t AS BIGINT) AS n_right,
               ROUND(mean_left, 4) AS mean_left,
               ROUND(mean_right, 4) AS mean_right,
               ROUND(sse, 4) AS sse
        FROM cost
        ORDER BY sse, day
        LIMIT 1
    """,
    section="TS11",
    doc="Single change-point detection on the daily revenue series: the "
    "split minimizing total two-segment SSE, scanned via exact "
    "cumulative moments — SSE_left(k) + SSE_right(k) come from "
    "prefix/total moment algebra (Q - S²/n per segment), so the whole "
    "candidate scan is ONE cumulative window pass, not n² segment "
    "aggregations. The series is the daily revenue in WHOLE k$ (exact "
    "decimal cents, integer-divided by 1e5), which keeps every moment "
    "an exact BIGINT far below 2^53 at all test SFs: integer→double "
    "casts are exact on both engines, sidestepping the int128/hugeint "
    "decimal→double conversion path, whose last-ulp rounding differs "
    "between Spark's BigDecimal and DuckDB's hugeint at ≥19 "
    "significant digits (observed at sf0.01 — the reason this query "
    "does NOT use wide-decimal moments). Cost bits are then identical "
    "cross-engine, so the argmin needs no pre-rounding; ties break on "
    f"the earlier day. Segments shorter than {_CP_MINSEG} days are "
    "excluded. Aggregates to the day grain first (TS7's "
    "window-on-spine rule): the window runs on |days| rows, constant "
    "memory at any corpus scale.",
)
def q_ts_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.expr(
            "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)"
            " DIV 100000"
        ).alias("v")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = daily.select(
        "day",
        F.row_number().over(Window.orderBy("day")).alias("t"),
        F.count("*").over(wall).alias("n"),
        F.sum("v").over(w).alias("cs"),
        F.sum(F.col("v") * F.col("v")).over(w).alias("cq"),
        F.sum("v").over(wall).alias("ts"),
        F.sum(F.col("v") * F.col("v")).over(wall).alias("tq"),
    )
    t = F.col("t").cast("double")
    nt = (F.col("n") - F.col("t")).cast("double")
    cs, cq = F.col("cs").cast("double"), F.col("cq").cast("double")
    ts_, tq = F.col("ts").cast("double"), F.col("tq").cast("double")
    cost = cum.where(
        (F.col("t") >= _CP_MINSEG) & (F.col("t") <= F.col("n") - _CP_MINSEG)
    ).select(
        "day",
        "t",
        "n",
        (cq - cs * cs / t + (tq - cq) - (ts_ - cs) * (ts_ - cs) / nt).alias(
            "sse"
        ),
        (cs / t).alias("mean_left"),
        ((ts_ - cs) / nt).alias("mean_right"),
    )
    return (
        cost.orderBy("sse", "day")
        .limit(1)
        .select(
            F.col("day").alias("split_day"),
            F.col("t").cast("long").alias("n_left"),
            (F.col("n") - F.col("t")).cast("long").alias("n_right"),
            F.round("mean_left", 4).alias("mean_left"),
            F.round("mean_right", 4).alias("mean_right"),
            F.round("sse", 4).alias("sse"),
        )
    )
