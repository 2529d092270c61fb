"""Ninth-wave operators (r3 continuation): two-sample inference, graph
edge scoring, feature selection, data-layout optimization, and
correlated-subquery planning.

  A28 q_agg_welch_t        — Welch's t statistic + Satterthwaite df
                             between two customer segments in one scan.
  G7  q_graph_edge_jaccard — neighborhood-Jaccard scoring of existing
                             edges (embeddedness: the graph-denoising /
                             tie-strength metric).
  V13 q_vec_dim_prune      — variance-based feature selection: keep the
                             top-8 highest-variance embedding dims.
  E15 q_etl_zorder_layout  — Morton (Z-order) layout vs linear layout:
                             per-file min/max spans for both, showing
                             the multi-column pruning win.
  J19 q_join_exists_correlated — correlated EXISTS / NOT EXISTS
                             subqueries through spark.sql (Catalyst
                             rewrites to semi/anti joins — the planning
                             path P6's IN subqueries don't cover).

Determinism notes (SURVEY §5.3):
  * A28: balances become exact cent integers via DECIMAL(18,2)*100; all
    five moments are exact integer sums (|s2| <= 1e12 * n << 2^63 at
    bench SFs — at larger corpora promote to DECIMAL(38,0) like A26);
    t and df are ONE fixed IEEE expression tree each.
  * G7 is integer counts + one division (Jaccard over neighbor sets).
  * V13 quantizes each float dim with floor(x_double * 1e6) (the
    float->double widening is exact; the scaled multiply is one
    correctly-rounded op on identical operands) and builds variance from
    exact integer sums; ranking ties break on dim position.
  * E15's Morton code is pure integer bit arithmetic (shift/mask/or),
    identical on both engines; spans are integer max-min.
  * J19 is ANSI SQL run verbatim on both engines.

Scale notes:
  * A28 collapses to a 10-value conditional moment vector in ONE
    map-side-combinable aggregation; the statistic is computed on one row.
  * G7 reuses the degree-bounded (<= 8) shared graph: the wedge join
    generates <= 64 candidates per node; scoring joins are keyed on the
    edge endpoints.
  * V13's stats table is |dims| rows; the corpus contributes one
    posexplode + keyed agg, and the top-8 rank runs on 64 rows.
  * E15 assigns files by Morton-value range (map-only DIV), NOT by a
    global row_number sort — no single-task window; per-file stats are
    one keyed agg. This is exactly how a lakehouse OPTIMIZE ZORDER
    assigns clustering targets before the physical rewrite.
  * J19's EXISTS subqueries become broadcast semi/anti joins on the
    bounded filtered orders slices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register

# --- A28: Welch's t statistic in one scan -----------------------------------

_T_A = "BUILDING"
_T_B = "MACHINERY"
_Q_BAL_SPARK = "cast(cast(c_acctbal as decimal(18,2)) * 100 as bigint)"
_Q_BAL_DUCK = "CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)"


@register(
    "q_agg_welch_t",
    oracle=f"""
        WITH q AS (
            SELECT c_mktsegment AS seg, {_Q_BAL_DUCK} AS qb FROM customer
            WHERE c_mktsegment IN ('{_T_A}', '{_T_B}')
        ),
        m AS (
            SELECT
                CAST(SUM(CASE WHEN seg = '{_T_A}' THEN 1 ELSE 0 END)
                     AS BIGINT) AS na,
                CAST(SUM(CASE WHEN seg = '{_T_A}' THEN qb ELSE 0 END)
                     AS BIGINT) AS sa,
                CAST(SUM(CASE WHEN seg = '{_T_A}' THEN qb * qb ELSE 0 END)
                     AS BIGINT) AS sa2,
                CAST(SUM(CASE WHEN seg = '{_T_B}' THEN 1 ELSE 0 END)
                     AS BIGINT) AS nb,
                CAST(SUM(CASE WHEN seg = '{_T_B}' THEN qb ELSE 0 END)
                     AS BIGINT) AS sb,
                CAST(SUM(CASE WHEN seg = '{_T_B}' THEN qb * qb ELSE 0 END)
                     AS BIGINT) AS sb2
            FROM q
        ),
        d AS (
            SELECT na, nb,
                   CAST(sa AS DOUBLE) / na AS ma,
                   CAST(sb AS DOUBLE) / nb AS mb,
                   (CAST(sa2 AS DOUBLE)
                    - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) / na)
                       / (na - 1) AS va,
                   (CAST(sb2 AS DOUBLE)
                    - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) / nb)
                       / (nb - 1) AS vb
            FROM m
        )
        SELECT na, nb, ma, mb, va, vb,
               (ma - mb) / sqrt(va / na + vb / nb) AS t_stat,
               (va / na + vb / nb) * (va / na + vb / nb)
               / ((va / na) * (va / na) / (na - 1)
                  + (vb / nb) * (vb / nb) / (nb - 1)) AS welch_df
        FROM d
    """,
    section="A28",
    doc=f"Welch's unequal-variance t statistic (+ Satterthwaite degrees "
    f"of freedom) for account balances, {_T_A} vs {_T_B} — the two-sample "
    "inference primitive behind every A/B readout. ONE conditional "
    "aggregation produces all six exact cent-integer moments map-side; t "
    "and df are single fixed IEEE expression trees over them — "
    "bit-deterministic, no rounding. Statistic computed on a 1-row table.",
)
def q_agg_welch_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment").isin(_T_A, _T_B)
    )
    qb = F.expr(_Q_BAL_SPARK)
    is_a = F.col("c_mktsegment") == _T_A
    is_b = F.col("c_mktsegment") == _T_B
    m = cu.select(qb.alias("qb"), is_a.alias("ia"), is_b.alias("ib")).agg(
        F.sum(F.when(F.col("ia"), 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("ia"), F.col("qb")).otherwise(0)).alias("sa"),
        F.sum(
            F.when(F.col("ia"), F.col("qb") * F.col("qb")).otherwise(0)
        ).alias("sa2"),
        F.sum(F.when(F.col("ib"), 1).otherwise(0)).alias("nb"),
        F.sum(F.when(F.col("ib"), F.col("qb")).otherwise(0)).alias("sb"),
        F.sum(
            F.when(F.col("ib"), F.col("qb") * F.col("qb")).otherwise(0)
        ).alias("sb2"),
    )
    na, nb = F.col("na"), F.col("nb")
    ma = F.col("sa").cast("double") / na
    mb = F.col("sb").cast("double") / nb
    va = (
        F.col("sa2").cast("double")
        - F.col("sa").cast("double") * F.col("sa").cast("double") / na
    ) / (na - 1)
    vb = (
        F.col("sb2").cast("double")
        - F.col("sb").cast("double") * F.col("sb").cast("double") / nb
    ) / (nb - 1)
    d = m.select(
        "na",
        "nb",
        ma.alias("ma"),
        mb.alias("mb"),
        va.alias("va"),
        vb.alias("vb"),
    )
    sea = F.col("va") / F.col("na")
    seb = F.col("vb") / F.col("nb")
    return d.select(
        "*",
        ((F.col("ma") - F.col("mb")) / F.sqrt(sea + seb)).alias("t_stat"),
        (
            (sea + seb)
            * (sea + seb)
            / (
                sea * sea / (F.col("na") - 1)
                + seb * seb / (F.col("nb") - 1)
            )
        ).alias("welch_df"),
    )


# --- G7: neighborhood-Jaccard edge scoring ----------------------------------


def _edge_jaccard_oracle() -> str:
    from ai_to_cvent_etl_spark.queries.analytics_r3b import _EDGE_CTES

    return f"""
        WITH {_EDGE_CTES},
        adj AS MATERIALIZED (
            SELECT lo AS a, hi AS b FROM edges
            UNION ALL SELECT hi, lo FROM edges
        ),
        deg AS MATERIALIZED (
            SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS d
            FROM adj GROUP BY a
        ),
        common AS MATERIALIZED (
            SELECT e.lo, e.hi, CAST(COUNT(*) AS BIGINT) AS c
            FROM edges e
            JOIN adj x ON x.a = e.lo
            JOIN adj y ON y.a = e.hi AND y.b = x.b
            GROUP BY e.lo, e.hi
        )
        SELECT e.lo, e.hi,
               COALESCE(c.c, 0) AS n_common,
               da.d AS deg_lo, db.d AS deg_hi,
               CAST(COALESCE(c.c, 0) AS DOUBLE)
                   / (da.d + db.d - COALESCE(c.c, 0)) AS edge_jaccard
        FROM edges e
        JOIN deg da ON da.node = e.lo
        JOIN deg db ON db.node = e.hi
        LEFT JOIN common c ON c.lo = e.lo AND c.hi = e.hi
    """


@register(
    "q_graph_edge_jaccard",
    oracle=_edge_jaccard_oracle(),
    section="G7",
    doc="Neighborhood-Jaccard scoring of EXISTING edges (embeddedness): "
    "|N(a) n N(b)| / |N(a) u N(b)| per edge of the shared mutual top-8 "
    "graph — the tie-strength / graph-denoising metric (low-embeddedness "
    "edges are bridges or noise; G4 scores non-edges, this scores "
    "edges). The wedge join inherits the degree-<=8 bound (<= 64 "
    "candidates per node); integer counts + one IEEE division — exact. "
    "Oracle CTEs MATERIALIZED (G5's lesson).",
)
def q_graph_edge_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries.analytics_r3b import (
        _mutual_affinity_edges,
    )

    edges = _mutual_affinity_edges(spark, sf_dir)
    adj = edges.select(F.col("lo").alias("a"), F.col("hi").alias("b")).unionByName(
        edges.select(F.col("hi").alias("a"), F.col("lo").alias("b"))
    )
    deg = adj.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    )
    x = adj.select(F.col("a").alias("lo"), F.col("b").alias("nb1"))
    y = adj.select(F.col("a").alias("hi2"), F.col("b").alias("nb2"))
    common = (
        edges.join(x, "lo")
        .join(
            y,
            (F.col("hi") == F.col("hi2")) & (F.col("nb1") == F.col("nb2")),
        )
        .groupBy("lo", "hi")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    da = deg.select(F.col("node").alias("lo"), F.col("d").alias("deg_lo"))
    db = deg.select(F.col("node").alias("hi"), F.col("d").alias("deg_hi"))
    j = (
        edges.join(da, "lo")
        .join(db, "hi")
        .join(common, ["lo", "hi"], "left")
        .select(
            "lo",
            "hi",
            F.coalesce(F.col("c"), F.lit(0)).alias("n_common"),
            "deg_lo",
            "deg_hi",
        )
    )
    return j.select(
        "*",
        (
            F.col("n_common").cast("double")
            / (F.col("deg_lo") + F.col("deg_hi") - F.col("n_common"))
        ).alias("edge_jaccard"),
    )


# --- V13: variance-based feature selection ----------------------------------

_PRUNE_KEEP = 8


@register(
    "q_vec_dim_prune",
    oracle=f"""
        WITH x AS (
            SELECT u.pos AS pos,
                   CAST(floor(CAST(u.val AS DOUBLE) * 1e6) AS BIGINT) AS qx
            FROM (
                SELECT unnest(list_transform(embedding,
                       (x, i) -> struct_pack(val := x, pos := i))) AS u
                FROM embeddings
            )
        ),
        m AS (
            SELECT pos, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(qx) AS BIGINT) AS s,
                   CAST(SUM(qx * qx) AS BIGINT) AS s2
            FROM x GROUP BY pos
        ),
        v AS (
            SELECT CAST(pos AS INTEGER) AS pos, n,
                   CAST(s2 AS DOUBLE) / n
                   - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)
                       AS variance_q
            FROM m
        )
        SELECT pos, n, variance_q, CAST(rnk AS INTEGER) AS var_rank
        FROM (
            SELECT *, row_number() OVER (
                ORDER BY variance_q DESC, pos
            ) AS rnk FROM v
        ) WHERE rnk <= {_PRUNE_KEEP}
    """,
    section="V13",
    doc=f"Variance-based feature selection: keep the top-{_PRUNE_KEEP} "
    "highest-variance embedding dimensions (the zero-information-dim "
    "pruning pass before indexing/training). Each float dim is quantized "
    "floor(x*1e6) to BIGINT (the float->double widening is exact; one "
    "correctly-rounded multiply on identical operands), variance comes "
    "from exact integer moment sums, ranking ties break on position. One "
    "posexplode + keyed agg over the corpus; the rank runs on |dims| "
    "rows. Population variance in quantized units — the selection "
    "ordering is what matters.",
)
def q_vec_dim_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select(F.posexplode("embedding").alias("pos0", "v")).select(
        (F.col("pos0") + 1).alias("pos"),
        F.expr("cast(floor(cast(v as double) * 1e6) as bigint)").alias("qx"),
    )
    m = x.groupBy("pos").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("qx").alias("s"),
        F.sum(F.col("qx") * F.col("qx")).alias("s2"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    v = m.select(
        F.col("pos").cast("int"),
        "n",
        (F.col("s2").cast("double") / F.col("n") - mean * mean).alias(
            "variance_q"
        ),
    )
    rnk = F.row_number().over(Window.orderBy(F.desc("variance_q"), F.asc("pos")))
    return (
        v.withColumn("var_rank", rnk.cast("int"))
        .where(F.col("var_rank") <= _PRUNE_KEEP)
    )


# --- E15: Z-order vs linear layout spans ------------------------------------

_Z_BITS = 10          # 10 bits per dimension
_Z_FILE_SPAN = 4096   # Morton values per planned file


def _morton_expr(x: str, y: str, shift_fn) -> str:
    """Interleave the low _Z_BITS bits of x (odd positions) and y (even):
    classic Morton code as a pure shift/mask/add expression."""
    terms = []
    for i in range(_Z_BITS):
        terms.append(shift_fn(f"(({x} >> {i}) & 1)", 2 * i + 1))
        terms.append(shift_fn(f"(({y} >> {i}) & 1)", 2 * i))
    return " + ".join(terms)


_X_SPARK = "cast(o_custkey % 1024 as bigint)"
_Y_SPARK = "cast(floor(o_totalprice / 1000) as bigint) % 1024"
_X_DUCK = "CAST(o_custkey % 1024 AS BIGINT)"
_Y_DUCK = "CAST(floor(o_totalprice / 1000) AS BIGINT) % 1024"


@register(
    "q_etl_zorder_layout",
    oracle=f"""
        WITH coded AS (
            SELECT x0 AS x, y0 AS y,
                   {_morton_expr('x0', 'y0', lambda e, s: f"({e} << {s})")}
                       AS morton
            FROM (SELECT {_X_DUCK} AS x0, {_Y_DUCK} AS y0 FROM orders)
        ),
        layouts AS (
            SELECT 'zorder' AS layout,
                   CAST(morton // {_Z_FILE_SPAN} AS BIGINT) AS file_id,
                   x, y
            FROM coded
            UNION ALL
            SELECT 'linear' AS layout,
                   CAST((x * 1024 + y) // {_Z_FILE_SPAN} AS BIGINT) AS file_id,
                   x, y
            FROM coded
        )
        SELECT layout, file_id,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(MAX(x) - MIN(x) AS BIGINT) AS x_span,
               CAST(MAX(y) - MIN(y) AS BIGINT) AS y_span
        FROM layouts GROUP BY layout, file_id
    """,
    section="E15",
    doc="Z-order (Morton) vs linear data-layout planning: orders are "
    "assigned to planned files by Morton-value range (map-only DIV — no "
    "global sort, unlike a row_number binning) and by the naive "
    "column-major layout; per-file min/max spans of both dimensions show "
    "the multi-column pruning win Z-ordering buys (the lakehouse "
    "OPTIMIZE ZORDER decision metric, computed before any rewrite). "
    "Morton codes are pure integer shift/mask arithmetic — identical on "
    "both engines; spans are integer max-min. One keyed agg per layout.",
)
def q_etl_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    base = od.select(
        F.expr(_X_SPARK).alias("x"), F.expr(_Y_SPARK).alias("y")
    )
    morton = F.expr(
        _morton_expr("x", "y", lambda e, s: f"shiftleft({e}, {s})")
    )
    coded = base.select("x", "y", morton.alias("morton"))
    z = coded.select(
        F.lit("zorder").alias("layout"),
        F.expr(f"morton div {_Z_FILE_SPAN}").alias("file_id"),
        "x",
        "y",
    )
    lin = coded.select(
        F.lit("linear").alias("layout"),
        F.expr(f"(x * 1024 + y) div {_Z_FILE_SPAN}").alias("file_id"),
        "x",
        "y",
    )
    return (
        z.unionByName(lin)
        .groupBy("layout", "file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.max("x") - F.min("x")).alias("x_span"),
            (F.max("y") - F.min("y")).alias("y_span"),
        )
    )


# --- J19: correlated EXISTS / NOT EXISTS ------------------------------------

_EXISTS_SQL = """
    SELECT c.c_custkey, c.c_mktsegment
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderpriority = '1-URGENT' AND o.o_orderstatus = 'O'
    )
    AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderpriority = '5-LOW'
    )
"""


@register(
    "q_join_exists_correlated",
    oracle=_EXISTS_SQL,
    section="J19",
    doc="Correlated EXISTS + NOT EXISTS subqueries run through "
    "spark.sql: customers with an open urgent order and no low-priority "
    "order. Catalyst rewrites the pair to a semi join + anti join on the "
    "filtered orders slices — the correlated-subquery planning path that "
    "P6's (NOT) IN rewrite does not cover (EXISTS has no null-aware "
    "special case). The identical ANSI text runs verbatim on DuckDB.",
)
def q_join_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("customer", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_EXISTS_SQL)
