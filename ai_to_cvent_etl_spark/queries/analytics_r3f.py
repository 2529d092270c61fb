"""Eighth-wave operators (r3 continuation): multivariate statistics,
distribution comparison, lakehouse maintenance, window completeness,
and bigram language models.

  A26 q_agg_corr_matrix   — pairwise Pearson correlation matrix over the
                            lineitem numeric columns in ONE scan (exact
                            integer/decimal moment sums).
  A27 q_agg_ks_binned     — binned two-sample Kolmogorov-Smirnov
                            comparison of order-value distributions
                            between two priority classes.
  E14 q_etl_compaction_plan — small-file compaction planner: linear
                            bin-packing of month-partition row counts
                            into target-sized output files.
  W18 q_win_cume_dist     — cume_dist / ntile quartiles per segment
                            (completes the ranking-window family next to
                            W2/W8).
  L13 q_text_bigram_logprob — corpus-bigram-LM mean negative conditional
                            log-prob per doc (the n-gram upgrade of L7's
                            unigram perplexity signal).

Determinism notes (SURVEY §5.3):
  * A26 quantizes 2dp money to exact cent integers via DECIMAL(18,2)*100
    (never floor(x*100) on a raw double — 2dp doubles can sit a hair
    below the true cent value); cross-moment sums go through
    DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — exact, order-insensitive
    — and the correlation is ONE fixed IEEE expression tree over
    correctly-rounded big-number->double conversions.
  * A27 is integer bin counts + per-group single divisions; the ECDF
    difference and its running max compare bit-identical doubles.
  * E14 is all-integer (counts, exclusive running sums, DIV).
  * W18's cume_dist is the exact rational i/n; ordering ends in the
    unique customer key.
  * L13 reuses L7's accepted device: per-doc AVG of -ln(p) with ROUND 4
    absorbing libm/fold drift; p = bigram_count/unigram_count is a
    single exact division.

Scale notes:
  * A26 is ONE map-side-combinable aggregation producing a fixed
    14-value moment vector; the 6-row matrix is assembled row-locally
    (stack) from that single row. No second scan, no shuffle beyond the
    one global agg.
  * A27 collapses both distributions to <= ~600 value bins first; the
    ECDF windows run on that bounded spine (the binned KS is the
    scale-safe form — an exact KS is a global sort by construction).
  * E14 runs entirely on the month-partition manifest (bounded by the
    calendar), the same shape a real lakehouse compactor uses (plan on
    file metadata, never on data).
  * W18 is one window sort per segment partition.
  * L13's LM tables are vocabulary-sized (|V| and <= |V|^2 rows) and
    broadcast; the corpus contributes two token-keyed shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register

# --- A26: one-scan Pearson correlation matrix -------------------------------

_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]

# exact cent integers: decimal-cast FIRST (2dp doubles can round a hair
# under the true cent value, so floor(x*100) on the raw double is wrong)
_Q_SPARK = "cast(cast({c} as decimal(18,2)) * 100 as bigint)"
_Q_DUCK = "CAST(CAST({c} AS DECIMAL(18,2)) * 100 AS BIGINT)"


def _corr_oracle() -> str:
    cols = _CORR_COLS
    qs = ", ".join(
        f"{_Q_DUCK.format(c=c)} AS q{i}" for i, c in enumerate(cols)
    )
    moments = ["CAST(COUNT(*) AS BIGINT) AS n"]
    for i in range(len(cols)):
        moments.append(f"CAST(SUM(q{i}) AS BIGINT) AS s{i}")
        for j in range(i, len(cols)):
            # DECIMAL(38,0), not HUGEINT: DuckDB aggregates SUM(HUGEINT)
            # in DOUBLE (order-dependent); SUM(DECIMAL(38,0)) stays exact.
            # The exact sum exceeds 2^53, and DuckDB's hugeint->double cast
            # is NOT correctly rounded (two-limb arithmetic) while Spark's
            # BigDecimal.doubleValue is — so both engines rebuild the
            # double from exact 32-bit halves with the IDENTICAL two-step
            # expression (hi*2^32 + lo: one rounding each, same sequence).
            pd = f"SUM(CAST(q{i} * q{j} AS DECIMAL(38,0)))"
            moments.append(
                f"CAST(CAST({pd} AS HUGEINT) // 4294967296 AS DOUBLE)"
                f" * 4294967296.0"
                f" + CAST(CAST({pd} AS HUGEINT) % 4294967296 AS DOUBLE)"
                f" AS p{i}{j}"
            )
    pair_rows = []
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            expr = (
                f"(CAST(n AS DOUBLE) * p{i}{j}"
                f" - CAST(s{i} AS DOUBLE) * CAST(s{j} AS DOUBLE))"
                f" / (sqrt(CAST(n AS DOUBLE) * p{i}{i}"
                f"          - CAST(s{i} AS DOUBLE) * CAST(s{i} AS DOUBLE))"
                f"    * sqrt(CAST(n AS DOUBLE) * p{j}{j}"
                f"           - CAST(s{j} AS DOUBLE) * CAST(s{j} AS DOUBLE)))"
            )
            pair_rows.append(
                f"SELECT '{cols[i]}' AS col_a, '{cols[j]}' AS col_b, n,"
                f" {expr} AS pearson_r FROM m"
            )
    return (
        f"WITH q AS (SELECT {qs} FROM lineitem),"
        f" m AS MATERIALIZED (SELECT {', '.join(moments)} FROM q) "
        + " UNION ALL ".join(pair_rows)
    )


@register(
    "q_agg_corr_matrix",
    oracle=_corr_oracle(),
    section="A26",
    doc="Pairwise Pearson correlation matrix over the lineitem numeric "
    "columns (quantity/price/discount/tax) in ONE scan: a single "
    "map-side-combinable aggregation produces the full 14-value moment "
    "vector (exact cent-integer sums; cross-moments in DECIMAL(38,0)/"
    "HUGEINT — order-insensitive), and the 6 correlation rows are "
    "assembled row-locally from that one row with a fixed IEEE "
    "expression tree. The feature-correlation screen every ML pipeline "
    "runs — at 100 TB it costs exactly one pass and one 1-row shuffle.",
)
def q_agg_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cols = _CORR_COLS
    q = li.select(
        *[
            F.expr(_Q_SPARK.format(c=c)).alias(f"q{i}")
            for i in range(len(cols))
            for c in [cols[i]]
        ]
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    for i in range(len(cols)):
        aggs.append(F.sum(f"q{i}").alias(f"s{i}"))
        for j in range(i, len(cols)):
            aggs.append(
                F.sum(
                    (F.col(f"q{i}") * F.col(f"q{j}")).cast(DecimalType(38, 0))
                ).alias(f"pd{i}{j}")
            )
    m = q.agg(*aggs)
    # hi/lo double reconstruction mirroring the oracle (see _corr_oracle)
    for i in range(len(cols)):
        for j in range(i, len(cols)):
            m = m.withColumn(
                f"p{i}{j}",
                F.expr(
                    f"cast(pd{i}{j} div 4294967296 as double) * 4294967296.0d"
                    f" + cast(pd{i}{j} % 4294967296 as double)"
                ),
            )
    pair_cols = []
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            nd = F.col("n").cast("double")
            si = F.col(f"s{i}").cast("double")
            sj = F.col(f"s{j}").cast("double")
            r = (nd * F.col(f"p{i}{j}") - si * sj) / (
                F.sqrt(nd * F.col(f"p{i}{i}") - si * si)
                * F.sqrt(nd * F.col(f"p{j}{j}") - sj * sj)
            )
            pair_cols.append((cols[i], cols[j], r))
    m = m.select(
        "n", *[r.alias(f"r_{a}_{b}") for a, b, r in pair_cols]
    )
    stack_args = ", ".join(
        f"'{a}', '{b}', r_{a}_{b}" for a, b, _ in pair_cols
    )
    return m.selectExpr(
        f"stack({len(pair_cols)}, {stack_args}) as (col_a, col_b, pearson_r)",
        "n",
    ).select("col_a", "col_b", "n", "pearson_r")


# --- A27: binned two-sample Kolmogorov-Smirnov ------------------------------

_KS_BIN = 1000  # price-bin width
_KS_A = "1-URGENT"
_KS_B = "5-LOW"


@register(
    "q_agg_ks_binned",
    oracle=f"""
        WITH b AS (
            SELECT CAST(floor(o_totalprice / {_KS_BIN}) AS BIGINT) AS bin,
                   CAST(SUM(CASE WHEN o_orderpriority = '{_KS_A}'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
                   CAST(SUM(CASE WHEN o_orderpriority = '{_KS_B}'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS cb
            FROM orders
            WHERE o_orderpriority IN ('{_KS_A}', '{_KS_B}')
            GROUP BY 1
        ),
        c AS (
            SELECT bin,
                   CAST(SUM(ca) OVER w AS BIGINT) AS cum_a,
                   CAST(SUM(cb) OVER w AS BIGINT) AS cum_b,
                   CAST(SUM(ca) OVER () AS BIGINT) AS n_a,
                   CAST(SUM(cb) OVER () AS BIGINT) AS n_b
            FROM b
            WINDOW w AS (ORDER BY bin
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        e AS (
            SELECT bin,
                   CAST(cum_a AS DOUBLE) / n_a AS ecdf_a,
                   CAST(cum_b AS DOUBLE) / n_b AS ecdf_b,
                   abs(CAST(cum_a AS DOUBLE) / n_a
                       - CAST(cum_b AS DOUBLE) / n_b) AS abs_diff
            FROM c
        )
        SELECT bin, ecdf_a, ecdf_b, abs_diff,
               MAX(abs_diff) OVER () AS ks_stat
        FROM e
    """,
    section="A27",
    doc="Binned two-sample Kolmogorov-Smirnov comparison of the order-"
    "value distribution between two priority classes (the drift / A-B "
    "distribution test). Both samples collapse to <= ~600 value bins in "
    "one conditional aggregation — the scale-safe form (an exact KS is a "
    "global sort by construction); the ECDF running sums and the KS max "
    "run on that bounded spine. Integer counts, one division per group, "
    "bit-identical double comparisons.",
)
def q_agg_ks_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority").isin(_KS_A, _KS_B)
    )
    b = od.groupBy(
        F.expr(f"cast(floor(o_totalprice / {_KS_BIN}) as bigint)").alias("bin")
    ).agg(
        F.sum(
            F.when(F.col("o_orderpriority") == _KS_A, 1).otherwise(0)
        ).alias("ca"),
        F.sum(
            F.when(F.col("o_orderpriority") == _KS_B, 1).otherwise(0)
        ).alias("cb"),
    )
    w = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.partitionBy()
    c = b.select(
        "bin",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
        F.sum("ca").over(tot).alias("n_a"),
        F.sum("cb").over(tot).alias("n_b"),
    )
    ecdf_a = F.col("cum_a").cast("double") / F.col("n_a")
    ecdf_b = F.col("cum_b").cast("double") / F.col("n_b")
    e = c.select(
        "bin",
        ecdf_a.alias("ecdf_a"),
        ecdf_b.alias("ecdf_b"),
        F.abs(ecdf_a - ecdf_b).alias("abs_diff"),
    )
    return e.select(
        "*", F.max("abs_diff").over(Window.partitionBy()).alias("ks_stat")
    )


# --- E14: small-file compaction planner -------------------------------------

_COMPACT_TARGET = 3000  # rows per output file


@register(
    "q_etl_compaction_plan",
    oracle=f"""
        WITH manifest AS (
            SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS file_id,
                   CAST(COUNT(*) AS BIGINT) AS n_rows
            FROM orders GROUP BY 1
        ),
        planned AS (
            SELECT file_id, n_rows,
                   CAST(COALESCE(SUM(n_rows) OVER (
                       ORDER BY file_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS BIGINT) // {_COMPACT_TARGET} AS target_file
            FROM manifest
        )
        SELECT p.file_id, p.n_rows, p.target_file,
               CAST(SUM(p.n_rows) OVER (PARTITION BY p.target_file)
                    AS BIGINT) AS target_rows
        FROM planned p
    """,
    section="E14",
    doc="Small-file compaction planner (the lakehouse OPTIMIZE step): "
    "month-partition row counts are linearly bin-packed into "
    f"~{_COMPACT_TARGET}-row output files via an exclusive running sum "
    "DIV target — deterministic first-fit in file order. Runs entirely "
    "on the partition manifest (bounded by the calendar), exactly how a "
    "real compactor plans on file metadata without touching data. "
    "All-integer.",
)
def q_etl_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    manifest = od.groupBy(
        F.date_trunc("month", F.col("o_orderdate"))
        .cast("date")
        .alias("file_id")
    ).agg(F.count(F.lit(1)).alias("n_rows"))
    excl = Window.orderBy("file_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    planned = manifest.select(
        "file_id",
        "n_rows",
        F.coalesce(F.sum("n_rows").over(excl), F.lit(0))
        .cast("bigint")
        .alias("cum"),
    ).select(
        "file_id",
        "n_rows",
        F.expr(f"cum div {_COMPACT_TARGET}").alias("target_file"),
    )
    return planned.select(
        "*",
        F.sum("n_rows")
        .over(Window.partitionBy("target_file"))
        .alias("target_rows"),
    )


# --- W18: cume_dist / quartiles ---------------------------------------------


@register(
    "q_win_cume_dist",
    oracle="""
        SELECT c_custkey, c_mktsegment, c_acctbal,
               cume_dist() OVER w AS cd,
               CAST(ntile(4) OVER w AS INTEGER) AS quartile
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment
                     ORDER BY c_acctbal, c_custkey)
    """,
    section="W18",
    doc="cume_dist + ntile quartiles per market segment (completes the "
    "ranking-window family beside W2's rank/dense_rank/ntile and W8's "
    "percent_rank): cume_dist is the exact rational i/n — deterministic "
    "with the unique-key tie-break. One window sort per segment.",
)
def q_win_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return cu.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.cume_dist().over(w).alias("cd"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
    )


# --- L13: bigram LM negative log-likelihood ---------------------------------


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
