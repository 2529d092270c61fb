"""Thirtieth-wave operators (r3 continuation): cohort LTV, top-k with
ties, row-level security, percent-of-parent.

  A42 q_agg_cohort_ltv   — cohort lifetime-value matrix: cumulative
                           revenue per (first-order cohort month,
                           months-since-first) — the revenue extension
                           of A15's retention counts.
  W29 q_win_topk_ties    — top-3 WITH TIES per status via rank() (vs
                           W1's row_number) over a NULLable ordering
                           key with explicit NULLS LAST — pins both
                           tie semantics and null-ordering parity.
  E28 q_etl_rls_filter   — row-level security as policy-data: a
                           (nation → allowed segment) policy table
                           enforced with a semi-join filter; per-nation
                           visible/hidden accounting — the governance
                           filter pattern.
  A43 q_agg_pct_of_parent — hierarchical percent-of-parent: nation
                           revenue as a share of its region, regions as
                           shares of total — the drill-down report
                           ratio (W14's share-of-total, one level
                           deeper).

Determinism notes (SURVEY §5.3):
  * A42: cohort/age keys are integer month arithmetic; revenue is
    exact DECIMAL summed twice (cell, then running over the ROWS
    frame); output doubles from int64-backed decimals.
  * W29: rank() ties are REAL (the balance-bucket key collides by
    construction); NULLS LAST is explicit on both engines; the
    nullable key is produced by the same nullif.
  * E28 is exact integer/boolean logic over a literal policy.
  * A43: exact decimal sums at both levels; shares are IEEE ratios
    rounded 6dp.

Scale notes:
  * A42 collapses to a ≤|cohorts|·|ages| matrix via two keyed
    reductions (first-order lookup broadcast back); the running LTV
    window partitions by cohort over ≤ decades of cells.
  * W29's rank-head is the TakeOrdered shape per group.
  * E28: the policy side is tiny and broadcast; at scale RLS compiles
    to the same semi-join (or a Bloom/runtime filter) and prunes
    BEFORE expensive operators — policy-as-data beats per-tenant
    query templating because one plan serves every tenant.
  * A43 is two reductions + a broadcast parent join — report-shaped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register

# --- A42: cohort LTV matrix --------------------------------------------------


@register(
    "q_agg_cohort_ltv",
    oracle="""
        WITH firsts AS (
            SELECT o_custkey AS ck,
                   MIN((date_part('year', o_orderdate) - 1995) * 12
                       + date_part('month', o_orderdate) - 1) AS cohort
            FROM orders GROUP BY o_custkey
        ),
        cells AS (
            SELECT f.cohort,
                   (date_part('year', o.o_orderdate) - 1995) * 12
                   + date_part('month', o.o_orderdate) - 1 - f.cohort
                       AS age,
                   SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders o JOIN firsts f ON f.ck = o.o_custkey
            GROUP BY 1, 2
        )
        SELECT CAST(cohort AS BIGINT) AS cohort_month,
               CAST(age AS BIGINT) AS age_months,
               n_orders,
               CAST(rev AS DOUBLE) AS period_revenue,
               CAST(SUM(rev) OVER (
                   PARTITION BY cohort ORDER BY age
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS cumulative_ltv
        FROM cells
    """,
    section="A42",
    doc="Cohort lifetime-value matrix: customers cohorted by first-order "
    "month (integer months since 1995-01 — F16's explicit month "
    "arithmetic, never fractional months_between), each cohort's "
    "revenue by months-since-first, and the running cumulative LTV "
    "per cohort — the revenue extension of A15's retention counts and "
    "the payback-period input. Exact DECIMAL revenue at the cell and "
    "running levels (ROWS frame over ≤ dozens of ages). Two keyed "
    "reductions with the first-order table joined back (broadcast-"
    "size: one row per customer collapses to per-cohort after the "
    "cell reduction).",
)
def q_agg_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    mo = (F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate") - 1
    firsts = orders.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.min(mo).alias("cohort")
    )
    cells = (
        orders.join(firsts, orders.o_custkey == firsts.ck)
        .groupBy(
            "cohort",
            (mo - F.col("cohort")).alias("age"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
            F.count("*").alias("n_orders"),
        )
    )
    w = Window.partitionBy("cohort").orderBy("age").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return cells.select(
        F.col("cohort").cast("long").alias("cohort_month"),
        F.col("age").cast("long").alias("age_months"),
        "n_orders",
        F.col("rev").cast("double").alias("period_revenue"),
        F.sum("rev").over(w).cast("double").alias("cumulative_ltv"),
    )


# --- W29: top-k WITH TIES + null ordering ------------------------------------


@register(
    "q_win_topk_ties",
    oracle="""
        WITH b AS (
            SELECT c_custkey, c_nationkey,
                   nullif(floor(c_acctbal / 1000.0) * 1000.0, 0.0)
                       AS bal_bucket
            FROM customer
        ),
        r AS (
            SELECT c_custkey, c_nationkey, bal_bucket,
                   rank() OVER (
                       PARTITION BY c_nationkey
                       ORDER BY bal_bucket DESC NULLS LAST
                   ) AS rnk
            FROM b
        )
        SELECT c_nationkey, c_custkey, bal_bucket, CAST(rnk AS INT) AS rnk
        FROM r WHERE rnk <= 3
    """,
    section="W29",
    doc="Top-3 WITH TIES per nation via rank() over a COARSE balance "
    "bucket (floor to 1000s — ties are real by construction, so the "
    "result genuinely includes whole tie groups and more than 3 rows "
    "per nation, which row_number W1 would cut arbitrarily), with the "
    "bucket NULLified at zero and ordered DESC NULLS LAST explicitly "
    "on both engines — pinning tie semantics AND null-ordering parity "
    "(Spark's DESC default is NULLS LAST, DuckDB's is NULLS FIRST: "
    "relying on either default is the dialect trap). No peer-dependent "
    "output beyond the tie group itself — rank is deterministic.",
)
def q_win_topk_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    bucket = F.nullif(
        F.floor(F.col("c_acctbal") / 1000.0) * 1000.0, F.lit(0.0)
    )
    b = c.select("c_custkey", "c_nationkey", bucket.alias("bal_bucket"))
    rnk = F.rank().over(
        Window.partitionBy("c_nationkey").orderBy(
            F.desc_nulls_last("bal_bucket")
        )
    )
    return (
        b.withColumn("rnk", rnk)
        .where(F.col("rnk") <= 3)
        .select(
            "c_nationkey", "c_custkey", "bal_bucket",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


# --- E28: row-level security policy filter -----------------------------------

_POLICY = [
    # (nationkey, allowed market segment)
    (0, "BUILDING"), (0, "MACHINERY"),
    (1, "AUTOMOBILE"),
    (2, "HOUSEHOLD"), (2, "FURNITURE"), (2, "BUILDING"),
    (3, "MACHINERY"),
]


@register(
    "q_etl_rls_filter",
    oracle=f"""
        WITH policy AS (
            SELECT * FROM (VALUES
                {', '.join(f"({n}, '{s}')" for n, s in _POLICY)}
            ) t(p_nation, p_segment)
        ),
        visible AS (
            SELECT c.c_nationkey, c.c_custkey
            FROM customer c
            WHERE EXISTS (
                SELECT 1 FROM policy p
                WHERE p.p_nation = c.c_nationkey
                  AND p.p_segment = c.c_mktsegment
            )
        )
        SELECT c.c_nationkey,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(COUNT(v.c_custkey) AS BIGINT) AS n_visible,
               CAST(COUNT(*) - COUNT(v.c_custkey) AS BIGINT) AS n_hidden
        FROM customer c
        LEFT JOIN visible v ON v.c_custkey = c.c_custkey
        GROUP BY c.c_nationkey
    """,
    section="E28",
    doc="Row-level security as POLICY DATA: a (nation → allowed market "
    "segment) policy table enforced with a semi-join filter, plus the "
    "per-nation visible/hidden accounting an auditor asks for. "
    "Policy-as-data beats per-tenant query templating: ONE plan "
    "serves every tenant, the policy side broadcasts, and at scale "
    "the semi-join compiles to a runtime/Bloom filter that prunes "
    "BEFORE expensive operators (the same mechanism as the "
    "dynamic-pruning test). Exact counting; nations absent from the "
    "policy show 100% hidden — deny-by-default.",
)
def q_etl_rls_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    policy = c.sparkSession.createDataFrame(
        _POLICY, "p_nation int, p_segment string"
    )
    visible = c.join(
        F.broadcast(policy),
        (F.col("c_nationkey") == F.col("p_nation"))
        & (F.col("c_mktsegment") == F.col("p_segment")),
        "left_semi",
    ).select(F.col("c_custkey").alias("v_key"))
    j = c.join(visible, c.c_custkey == F.col("v_key"), "left")
    return j.groupBy("c_nationkey").agg(
        F.count("*").alias("n_customers"),
        F.count("v_key").alias("n_visible"),
        (F.count("*") - F.count("v_key")).alias("n_hidden"),
    )


# --- A43: hierarchical percent-of-parent -------------------------------------


@register(
    "q_agg_pct_of_parent",
    oracle="""
        WITH nat AS (
            SELECT r.r_name AS region, n.n_name AS nation,
                   SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev
            FROM orders o
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n ON n.n_nationkey = c.c_nationkey
            JOIN region r ON r.r_regionkey = n.n_regionkey
            GROUP BY r.r_name, n.n_name
        )
        SELECT region, nation,
               CAST(rev AS DOUBLE) AS revenue,
               ROUND(CAST(rev AS DOUBLE)
                     / CAST(SUM(rev) OVER (PARTITION BY region) AS DOUBLE),
                     6) AS pct_of_region,
               ROUND(CAST(SUM(rev) OVER (PARTITION BY region) AS DOUBLE)
                     / CAST(SUM(rev) OVER () AS DOUBLE), 6)
                   AS region_pct_of_total
        FROM nat
    """,
    section="A43",
    doc="Hierarchical percent-of-parent: nation revenue as a share of "
    "its region and the region's share of the total — the drill-down "
    "report ratio one level beyond W14's flat share-of-total (a BI "
    "tree where every level's shares sum to 1 within its parent). "
    "Exact decimal sums at the leaf; both parent totals are windows "
    "over the ≤25-row collapsed relation; shares rounded 6dp. "
    "Dimension joins broadcast (nation 25, region 5 rows).",
)
def q_agg_pct_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    nat = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    )
    wr = Window.partitionBy("region")
    wt = Window.partitionBy()
    return nat.select(
        "region",
        "nation",
        F.col("rev").cast("double").alias("revenue"),
        F.round(
            F.col("rev").cast("double")
            / F.sum("rev").over(wr).cast("double"),
            6,
        ).alias("pct_of_region"),
        F.round(
            F.sum("rev").over(wr).cast("double")
            / F.sum("rev").over(wt).cast("double"),
            6,
        ).alias("region_pct_of_total"),
    )
