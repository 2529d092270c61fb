"""Thirteenth-wave operators (r3 continuation): MERGE upsert, market
concentration, null-safe join, rolling correlation, k-anonymity audit.

  E16 q_etl_merge_upsert   — full MERGE INTO semantics (matched-update /
                             matched-delete / not-matched-insert) resolved
                             as one outer join, verified by a compact
                             post-merge aggregate.
  A29 q_agg_hhi            — Herfindahl-Hirschman concentration index per
                             market segment from exact decimal revenue
                             moments (sum and sum-of-squares).
  J18 q_join_null_safe     — null-safe equi-join (<=> / IS NOT DISTINCT
                             FROM): NULL keys match the NULL group instead
                             of dropping, a distinct physical join variant.
  TS7 q_ts_rolling_corr    — 14-day rolling Pearson correlation between
                             daily order count and daily revenue on a
                             gap-free day spine, via exact sliding moments.
  E17 q_etl_k_anonymity    — k-anonymity audit over quasi-identifier
                             columns: group sizes, violation flags, and
                             re-identification risk per group.

Determinism notes (SURVEY §5.3):
  * E16's update arm is one IEEE addition per row (+10.0 — no decimal
    rounding ties); the verification aggregate is an exact DECIMAL sum.
  * A29 keeps revenue in exact decimals through both moment sums
    (squares taken at width 19 so both engines stay inside decimal-38
    on an int128 path); HHI is one rounded IEEE expression over
    identical decimal->double conversions. Output doubles only.
  * J18's group revenue is an exact decimal sum; the join key NULLs are
    produced by the same NULLIF on both engines.
  * TS7's sliding moments are integer counts and DECIMAL sums (exact,
    order-insensitive); r is one IEEE formula over identical
    decimal->double casts, NULL when either variance term is zero.
  * E17 is pure integer counting plus one IEEE division.

Scale notes:
  * E16 is the CDC-merge shape: one keyed outer join between target and a
    (much smaller) change feed — at 100 TB the change feed broadcasts or
    the join co-locates on the bucketed key; no other shuffle.
  * A29 is two keyed reductions (customer then segment) — partial
    aggregation does the heavy lifting map-side.
  * J18's build side is a 3-row per-status aggregate: broadcast by the
    size-based planner, never hinted.
  * TS7 collapses the corpus to |days| rows before any window runs.
  * E17 is one groupBy over low-cardinality quasi-identifiers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.queries._util import dec2
from ai_to_cvent_etl_spark.registry import register

# --- E16: MERGE INTO upsert --------------------------------------------------

_MERGE_ORACLE = """
    WITH changes AS (
        SELECT o_orderkey AS key,
               CASE WHEN o_orderkey % 13 = 0 THEN 'U'
                    WHEN o_orderkey % 13 = 5 THEN 'D'
                    ELSE 'I' END AS op,
               o_orderkey + 100000000 AS new_key,
               o_totalprice + 10.0 AS new_price
        FROM orders
        WHERE o_orderkey % 13 IN (0, 5, 7)
    ),
    kept AS (
        SELECT t.o_orderkey,
               CASE WHEN c.op = 'U' THEN 'P' ELSE t.o_orderstatus END
                   AS o_orderstatus,
               CASE WHEN c.op = 'U' THEN c.new_price
                    ELSE t.o_totalprice END AS o_totalprice
        FROM orders t
        LEFT JOIN changes c ON c.key = t.o_orderkey AND c.op IN ('U', 'D')
        WHERE c.op IS NULL OR c.op <> 'D'
    ),
    merged AS (
        SELECT * FROM kept
        UNION ALL
        SELECT new_key, 'N', new_price FROM changes WHERE op = 'I'
    )
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price
    FROM merged
    GROUP BY o_orderstatus
"""


@register(
    "q_etl_merge_upsert",
    oracle=_MERGE_ORACLE,
    section="E16",
    doc="Full MERGE INTO semantics against the orders target from a "
    "deterministic synthetic change feed: matched-U rows update (price "
    "+10.0, status 'P'), matched-D rows delete, unmatched feed rows "
    "insert under a shifted key. Resolved as ONE left outer join plus a "
    "union of the insert arm — the CDC-merge shape where the change feed "
    "is the small side (broadcast or key-co-located at scale; the target "
    "never shuffles twice). Verified by a per-status count + exact "
    "decimal price sum over the merged table, so every arm (update, "
    "delete, insert, untouched) moves the aggregate.",
)
def q_etl_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_table(spark, sf_dir, "orders")
    changes = (
        t.where((F.col("o_orderkey") % 13).isin(0, 5, 7))
        .select(
            F.col("o_orderkey").alias("key"),
            F.when(F.col("o_orderkey") % 13 == 0, F.lit("U"))
            .when(F.col("o_orderkey") % 13 == 5, F.lit("D"))
            .otherwise(F.lit("I"))
            .alias("op"),
            (F.col("o_orderkey") + 100000000).alias("new_key"),
            (F.col("o_totalprice") + F.lit(10.0)).alias("new_price"),
        )
    )
    matched = changes.where(F.col("op").isin("U", "D"))
    kept = (
        t.join(matched, t.o_orderkey == matched.key, "left")
        .where(F.col("op").isNull() | (F.col("op") != "D"))
        .select(
            "o_orderkey",
            F.when(F.col("op") == "U", F.lit("P"))
            .otherwise(F.col("o_orderstatus"))
            .alias("o_orderstatus"),
            F.when(F.col("op") == "U", F.col("new_price"))
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
        )
    )
    inserts = changes.where(F.col("op") == "I").select(
        F.col("new_key").alias("o_orderkey"),
        F.lit("N").alias("o_orderstatus"),
        F.col("new_price").alias("o_totalprice"),
    )
    merged = kept.unionByName(inserts)
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(dec2(F.col("o_totalprice"))).cast("double").alias("total_price"),
    )


# --- A29: Herfindahl-Hirschman index -----------------------------------------

_HHI_ORACLE = """
    WITH rev AS (
        SELECT c.c_mktsegment AS segment, o.o_custkey,
               SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS r
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    ),
    m AS (
        SELECT segment,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(r) AS DOUBLE) AS tot,
               CAST(SUM(CAST(r AS DECIMAL(19,2)) * CAST(r AS DECIMAL(19,2)))
                    AS DOUBLE) AS sumsq
        FROM rev GROUP BY segment
    )
    SELECT segment, n_customers,
           tot AS total_revenue,
           CASE WHEN tot > 0 THEN ROUND(sumsq / (tot * tot), 6) END AS hhi
    FROM m
"""


@register(
    "q_agg_hhi",
    oracle=_HHI_ORACLE,
    section="A29",
    doc="Herfindahl-Hirschman concentration index per market segment: "
    "sum of squared customer revenue shares, computed as "
    "sum(r^2)/sum(r)^2 so both moments stay EXACT decimals until a "
    "single IEEE division (a share-then-square formulation would sum "
    "doubles in nondeterministic order). HHI -> 1/n for even markets, "
    "-> 1 for monopolies — the concentration dual of A23's Gini. Two "
    "keyed reductions (customer, then segment) with map-side partial "
    "aggregation; output is |segments| rows.",
)
def q_agg_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"), "o_custkey")
        .agg(F.sum(dec2(F.col("o_totalprice"))).alias("r"))
    )
    # Per-customer revenue fits DECIMAL(19,2) comfortably at every SF;
    # narrowing before the square keeps BOTH engines inside decimal-38,
    # and width 19 keeps DuckDB off its overflow-prone int64 multiply
    # path (width<=18 factors multiply in int64).
    r18 = F.col("r").cast("decimal(19,2)")
    m = rev.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("r").cast("double").alias("tot"),
        F.sum(r18 * r18).cast("double").alias("sumsq"),
    )
    return m.select(
        "segment",
        "n_customers",
        F.col("tot").alias("total_revenue"),
        F.when(
            F.col("tot") > 0,
            F.round(F.col("sumsq") / (F.col("tot") * F.col("tot")), 6),
        ).alias("hhi"),
    )


# --- J18: null-safe equi-join ------------------------------------------------

_NULL_SAFE_ORACLE = """
    WITH grp AS (
        SELECT NULLIF(o_orderstatus, 'O') AS nk,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS grp_rev,
               CAST(COUNT(*) AS BIGINT) AS grp_n
        FROM orders GROUP BY 1
    )
    SELECT o.o_orderkey, NULLIF(o.o_orderstatus, 'O') AS nk,
           g.grp_rev, g.grp_n
    FROM orders o
    JOIN grp g ON NULLIF(o.o_orderstatus, 'O') IS NOT DISTINCT FROM g.nk
    WHERE o.o_orderkey % 100 = 0
"""


@register(
    "q_join_null_safe",
    oracle=_NULL_SAFE_ORACLE,
    section="J18",
    doc="Null-safe equi-join (Spark <=> / SQL IS NOT DISTINCT FROM): the "
    "dominant 'O' status is NULLIF'd to NULL on both sides, so a plain "
    "equi-join would silently drop every such row while the null-safe "
    "variant matches them to the NULL group — a real physical-join "
    "variant (Spark plans EqualNullSafe as a hash join key, not a theta "
    "join). Probe side is a 1-percent keyed sample; build side is a 3-row "
    "per-status aggregate the size-based planner broadcasts unhinted.",
)
def q_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    nk = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    grp = o.groupBy(nk.alias("nk")).agg(
        F.sum(dec2(F.col("o_totalprice"))).cast("double").alias("grp_rev"),
        F.count(F.lit(1)).alias("grp_n"),
    )
    probe = o.where(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey", nk.alias("nk")
    )
    return probe.join(grp, probe.nk.eqNullSafe(grp.nk)).select(
        probe.o_orderkey, probe.nk, grp.grp_rev, grp.grp_n
    )


# --- TS7: rolling correlation ------------------------------------------------

_ROLLCORR_ORACLE = """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS x,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS y
        FROM orders GROUP BY 1
    ),
    bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily),
    spine AS (
        SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
                   AS day
        FROM bounds
    ),
    filled AS (
        SELECT s.day,
               COALESCE(d.x, 0) AS x,
               CAST(COALESCE(d.y, 0) AS DECIMAL(19,2)) AS y
        FROM spine s LEFT JOIN daily d ON s.day = d.day
    ),
    mom AS (
        SELECT day,
               CAST(COUNT(*) OVER w AS BIGINT) AS n,
               CAST(SUM(x) OVER w AS BIGINT) AS sx,
               CAST(SUM(CAST(y AS DECIMAL(38,4))) OVER w AS DOUBLE) AS sy,
               CAST(SUM(CAST(x AS DECIMAL(19,2)) * y) OVER w AS DOUBLE)
                   AS sxy,
               CAST(SUM(x * x) OVER w AS BIGINT) AS sxx,
               CAST(SUM(y * y) OVER w AS DOUBLE) AS syy
        FROM filled
        WINDOW w AS (ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT day,
           CASE WHEN (CAST(n AS DOUBLE) * sxx
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
                 AND (CAST(n AS DOUBLE) * syy - sy * sy) > 0
                THEN ROUND(
                     (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                     / (sqrt(CAST(n AS DOUBLE) * sxx
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * sqrt(CAST(n AS DOUBLE) * syy - sy * sy)), 6)
           END AS rolling_corr
    FROM mom
    WHERE n = 14
"""


@register(
    "q_ts_rolling_corr",
    oracle=_ROLLCORR_ORACLE,
    section="TS7",
    doc="14-day rolling Pearson correlation between daily order count and "
    "daily revenue on a gap-free day spine (gap days contribute exact "
    "zeros). Built from exact sliding MOMENTS — integer counts and "
    "DECIMAL sums over a ROWS frame — with r as one IEEE formula at the "
    "end, instead of a native corr() window whose internal accumulation "
    "order differs across engines. Warmup rows (frame < 14 days) are "
    "excluded; zero-variance windows yield NULL identically. The corpus "
    "collapses to |days| rows before any window runs.",
)
def q_ts_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("x"),
        F.sum(dec2(F.col("o_totalprice"))).alias("y"),
    )
    bounds = daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("day")
    )
    # Narrow the sum-widened daily revenue to DECIMAL(19,2) (lossless: a
    # day's revenue fits at every SF). Width 19 keeps the squared moment
    # inside decimal-38 on both engines AND forces DuckDB off its
    # overflow-prone int64 multiply path (width<=18 factors multiply in
    # int64 and 1.5e9-cent days overflow it).
    filled = spine.join(daily, "day", "left").select(
        "day",
        F.coalesce(F.col("x"), F.lit(0)).alias("x"),
        F.coalesce(F.col("y"), F.lit(0)).cast("decimal(19,2)").alias("y"),
    )
    w = Window.orderBy("day").rowsBetween(-13, 0)
    mom = filled.select(
        "day",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,4)")).over(w).cast("double").alias("sy"),
        F.sum(F.col("x").cast("decimal(19,2)") * F.col("y"))
        .over(w).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).cast("double").alias("syy"),
    ).where(F.col("n") == 14)
    nd = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    varx = nd * F.col("sxx") - sx * sx
    vary = nd * F.col("syy") - F.col("sy") * F.col("sy")
    return mom.select(
        "day",
        F.when(
            (varx > 0) & (vary > 0),
            F.round(
                (nd * F.col("sxy") - sx * F.col("sy"))
                / (F.sqrt(varx) * F.sqrt(vary)),
                6,
            ),
        ).alias("rolling_corr"),
    )


# --- E17: k-anonymity audit --------------------------------------------------

_K_ANON = 5

_KANON_ORACLE = f"""
    WITH grp AS (
        SELECT c_nationkey AS nationkey, c_mktsegment AS segment,
               CAST(COUNT(*) AS BIGINT) AS group_size
        FROM customer GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(SUM(group_size) AS BIGINT) AS n FROM grp)
    SELECT g.nationkey, g.segment, g.group_size,
           CASE WHEN g.group_size < {_K_ANON} THEN 1 ELSE 0 END
               AS violates_k,
           1.0 / CAST(g.group_size AS DOUBLE) AS reid_risk,
           CAST(g.group_size AS DOUBLE) / CAST(t.n AS DOUBLE) AS share
    FROM grp g CROSS JOIN tot t
"""


@register(
    "q_etl_k_anonymity",
    oracle=_KANON_ORACLE,
    section="E17",
    doc=f"k-anonymity audit (k={_K_ANON}) over the quasi-identifier pair "
    "(nationkey, mktsegment): per equivalence class, its size, a "
    "violation flag, the re-identification risk 1/|class|, and its share "
    "of the population — the governance gate a training-data pipeline "
    "runs before release (E11's PII mask handles direct identifiers; "
    "this catches identifying COMBINATIONS). One low-cardinality keyed "
    "reduction plus a broadcast 1-row total; output is bounded by the "
    "QI domain (<= 125 classes). Pure integer counts + IEEE divisions.",
)
def q_etl_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    grp = c.groupBy(
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_mktsegment").alias("segment"),
    ).agg(F.count(F.lit(1)).alias("group_size"))
    tot = grp.agg(F.sum("group_size").alias("n"))
    return grp.crossJoin(F.broadcast(tot)).select(
        "nationkey",
        "segment",
        "group_size",
        F.when(F.col("group_size") < _K_ANON, 1).otherwise(0).alias(
            "violates_k"
        ),
        (F.lit(1.0) / F.col("group_size").cast("double")).alias("reid_risk"),
        (
            F.col("group_size").cast("double") / F.col("n").cast("double")
        ).alias("share"),
    )
