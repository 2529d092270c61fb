"""Registered queries q_agg_global..q_agg_cohens_kappa (chunk 1 of 4 split from aggregates.py — see aggregates_shared.py for shared helpers)."""

from __future__ import annotations
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType
from ai_to_cvent_etl_spark.io import load_table, table_path
from ai_to_cvent_etl_spark.registry import register
from pyspark.sql import DataFrame, SparkSession, Window
from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.queries._util import dec2
from ai_to_cvent_etl_spark.queries._util import ORACLE_MONEY_SUM
from ai_to_cvent_etl_spark.queries._util import ORACLE_DISC_PRICE, disc_price

from ai_to_cvent_etl_spark.queries.aggregates_shared import (  # noqa: F401
    _BASKET_MIN_CO,
    _BH_ALPHA,
    _BOOT_B,
    _BUDGET_CENTS,
    _CORR_COLS,
    _CRC_W1,
    _CRC_W2,
    _ECE_CAP,
    _ENTROPY_TYPES,
    _H48_USER,
    _H48_USER_DUCK,
    _HHI_ORACLE,
    _KAPPA_CATS,
    _KAPPA_T1,
    _KAPPA_T2,
    _KS_A,
    _KS_B,
    _KS_BIN,
    _KW_PRIORITIES,
    _LOGI,
    _MDES,
    _PERM_B,
    _POIS1_P,
    _Q_BAL_DUCK,
    _Q_BAL_SPARK,
    _Q_SPARK,
    _TE_M,
    _THEIL_QS,
    _TOST_MARGIN,
    _TOST_Z,
    _T_A,
    _T_B,
    _Z,
    _Z95,
    _ZA,
    _ZB,
    _boot_w,
    _corr_oracle,
    _delta_arm_sql,
    _entropy_expr_duck,
    _entropy_expr_spark,
    _frac,
    _kappa_bucket_sql,
    _kw_pivot_cols_duck,
    _money,
)

@register(
    "q_agg_global",
    oracle="""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               SUM(l_quantity) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
               MIN(l_extendedprice) AS min_price,
               MAX(l_extendedprice) AS max_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price
        FROM lineitem
    """,
    section="A1",
)
def q_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("l_quantity").alias("sum_qty"),  # integral doubles: exact any order
        F.sum(_money(F.col("l_extendedprice"))).cast("double").alias("sum_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        (
            F.sum(_money(F.col("l_extendedprice"))).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_price"),
    )

@register(
    "q_agg_groupby_pricing",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               SUM(l_quantity) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * CAST(1 - l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS sum_disc_price,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * CAST(1 - l_discount AS DECIMAL(4,2))
                        * CAST(1 + l_tax AS DECIMAL(4,2))), 2) AS DOUBLE) AS sum_charge,
               SUM(l_quantity) / COUNT(*) AS avg_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
               CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
               CAST(COUNT(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    section="A2",
    doc="TPC-H-Q1-style pricing summary: 8 aggregates per (returnflag, linestatus).",
)
def q_agg_groupby_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz")
    )
    price = _money(F.col("l_extendedprice"))
    disc = _frac(F.lit(1) - F.col("l_discount"))
    tax = _frac(F.lit(1) + F.col("l_tax"))
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.sum(price).cast("double").alias("sum_base_price"),
        # ROUND(...,2) before the double cast: the scale-4/6 decimal sums
        # exceed double's 53-bit mantissa by sf1 (>= 17 sig digits), where
        # the two engines' decimal->double casts can land on ADJACENT
        # doubles at half-ulp boundaries; cents-rounded sums stay exactly
        # representable to ~9e13 (r6, found by the full sf1 sweep)
        F.round(F.sum(price * disc), 2).cast("double").alias("sum_disc_price"),
        F.round(F.sum(price * disc * tax), 2).cast("double").alias("sum_charge"),
        (F.sum("l_quantity") / n).alias("avg_qty"),
        (F.sum(price).cast("double") / n).alias("avg_price"),
        (F.sum(_frac(F.col("l_discount"))).cast("double") / n).alias("avg_disc"),
        n.alias("count_order"),
    )

@register(
    "q_agg_count_distinct",
    oracle="""
        SELECT o_orderstatus,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY o_orderstatus
    """,
    section="A3",
)
def q_agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )

@register(
    "q_agg_approx_distinct",
    oracle=None,  # rows-only: Spark HLL++ estimates never hash-match DuckDB HLL
    section="A4",
    doc="HyperLogLog approximate distinct per group (rows-only by design).",
)
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey").alias("approx_customers")
    )

@register(
    "q_agg_having",
    oracle="""
        SELECT o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spent,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders
        GROUP BY o_custkey
        HAVING SUM(CAST(o_totalprice AS DECIMAL(12,2))) > 1500000
    """,
    section="A5",
)
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.sum(_money(F.col("o_totalprice"))).alias("_total_dec"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .filter(F.col("_total_dec") > 1500000)
        .select(
            "o_custkey",
            F.col("_total_dec").cast("double").alias("total_spent"),
            "n_orders",
        )
    )

@register(
    "q_agg_rollup",
    oracle="""
        SELECT r.r_name, n.n_name,
               CAST(GROUPING(r.r_name) AS BIGINT) AS g_region,
               CAST(GROUPING(n.n_name) AS BIGINT) AS g_nation,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_acctbal
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
    section="A6",
    doc="Hierarchical subtotals region -> nation with grouping() disambiguation.",
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = customer.join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    return joined.rollup("r_name", "n_name").agg(
        F.grouping("r_name").cast("bigint").alias("g_region"),
        F.grouping("n_name").cast("bigint").alias("g_nation"),
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(_money(F.col("c_acctbal"))).cast("double").alias("sum_acctbal"),
    )

@register(
    "q_agg_cube",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    section="A7",
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("bigint").alias("g_status"),
        F.grouping("o_orderpriority").cast("bigint").alias("g_priority"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(_money(F.col("o_totalprice"))).cast("double").alias("sum_price"),
    )

@register(
    "q_agg_grouping_sets",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    section="A8",
    doc="Explicit grouping sets via the spark.sql entry point.",
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = table_path(sf_dir, "orders")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        FROM parquet.`{path}`
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )

@register(
    "q_agg_conditional_pivot",
    oracle="""
        SELECT n.n_name,
               CAST(COALESCE(SUM(CASE WHEN c.c_mktsegment = 'AUTOMOBILE'
                    THEN CAST(c.c_acctbal AS DECIMAL(12,2)) END), 0) AS DOUBLE) AS automobile,
               CAST(COALESCE(SUM(CASE WHEN c.c_mktsegment = 'BUILDING'
                    THEN CAST(c.c_acctbal AS DECIMAL(12,2)) END), 0) AS DOUBLE) AS building,
               CAST(COALESCE(SUM(CASE WHEN c.c_mktsegment = 'FURNITURE'
                    THEN CAST(c.c_acctbal AS DECIMAL(12,2)) END), 0) AS DOUBLE) AS furniture,
               CAST(COALESCE(SUM(CASE WHEN c.c_mktsegment = 'HOUSEHOLD'
                    THEN CAST(c.c_acctbal AS DECIMAL(12,2)) END), 0) AS DOUBLE) AS household,
               CAST(COALESCE(SUM(CASE WHEN c.c_mktsegment = 'MACHINERY'
                    THEN CAST(c.c_acctbal AS DECIMAL(12,2)) END), 0) AS DOUBLE) AS machinery
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    """,
    section="A9",
    doc="Pivot market segments to columns (explicit value list => stable schema).",
)
def q_agg_conditional_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    segments = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    pivoted = (
        customer.join(
            F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .groupBy("n_name")
        .pivot("c_mktsegment", segments)
        .agg(F.sum(_money(F.col("c_acctbal"))))
    )
    cols = [F.col("n_name")] + [
        F.coalesce(F.col(s), F.lit(0)).cast("double").alias(s.lower())
        for s in segments
    ]
    return pivoted.select(*cols)

@register(
    "q_agg_collect_sorted",
    oracle="""
        SELECT n.n_name,
               array_to_string(list_sort(list(c.c_custkey)), '|') AS custkeys,
               CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    """,
    section="A10",
    doc=(
        "Per-group list aggregation, deterministically sorted (never raw "
        "collect_list). The list is serialized to a '|'-joined string: the "
        "driver's value-hash canonicalizer cannot hash Python lists, so "
        "array outputs must leave the engine as scalars (ADVICE r1)."
    ),
)
def q_agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        customer.join(
            F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .groupBy("n_name")
        .agg(
            F.array_join(
                F.sort_array(F.collect_list("c_custkey")).cast("array<string>"),
                "|",
            ).alias("custkeys"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )

@register(
    "q_agg_stats",
    oracle="""
        SELECT l_returnflag,
               ROUND(STDDEV_SAMP(l_quantity), 4) AS sd_qty,
               ROUND(VAR_SAMP(l_quantity), 4) AS var_qty,
               ROUND(CORR(l_quantity, l_extendedprice), 4) AS corr_qty_price
        FROM lineitem GROUP BY l_returnflag
    """,
    section="A11",
    doc="Statistical aggregates, ROUND(...,4) both sides (float drift guard).",
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
    )

@register(
    "q_agg_approx_percentile",
    oracle=None,  # rows-only: Spark t-digest != DuckDB approx_quantile
    section="A20",
    doc="approx_percentile (t-digest sketch) p50/p90/p99 per group — the "
    "bounded-memory quantile path for 100 TB data where A12/A16's exact "
    "sort-based percentiles are unaffordable. Sketch estimates are "
    "engine-specific by construction (same reason as A4's HLL), so this "
    "is declared rows-only; cross-run determinism within Spark is pinned "
    "by a golden test (estimates are deterministic per Spark version), "
    "and the EXACT twin (A12) is the correctness oracle for the metric "
    "itself. One map-side-combinable keyed aggregation.",
)
def q_agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr(
            "approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99), 1000)"
        )[0].alias("p50"),
        F.expr(
            "approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99), 1000)"
        )[1].alias("p90"),
        F.expr(
            "approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99), 1000)"
        )[2].alias("p99"),
    )

@register(
    "q_agg_weighted_avg",
    oracle="""
        SELECT l_returnflag,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   AS wavg_price,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_qty
        FROM lineitem
        GROUP BY l_returnflag
    """,
    section="A21",
    doc="Quantity-weighted average price per return flag (the VWAP shape): "
    "both the weighted numerator and the weight denominator are EXACT "
    "DECIMAL sums (order-insensitive under any partitioning), divided "
    "once in double — bit-deterministic without rounding, unlike a raw "
    "avg(price*qty) whose float partial sums depend on partitioning. "
    "One map-side-combinable keyed aggregation.",
)
def q_agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import dec2

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        (
            F.sum(dec2(F.col("l_extendedprice")) * dec2(F.col("l_quantity")))
            .cast("double")
            / F.sum(dec2(F.col("l_quantity"))).cast("double")
        ).alias("wavg_price"),
        F.sum(dec2(F.col("l_quantity"))).cast("double").alias("total_qty"),
    )

@register(
    "q_agg_entropy",
    oracle=f"""
        WITH c AS (
            SELECT user_id,
                   {', '.join(
                       f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t}"
                       for t in _ENTROPY_TYPES)},
                   CAST(COUNT(*) AS BIGINT) AS n_total
            FROM events
            GROUP BY user_id
        )
        SELECT user_id, n_total, {_entropy_expr_duck()} AS entropy_bits
        FROM c
    """,
    section="A22",
    doc="Per-user behavioral diversity: Shannon entropy (bits) of the "
    "event-type distribution. The distribution is pivoted into one row "
    "of exact integer counts per user (conditional aggregation over the "
    "5 known types — explicit value list, A9's device), so the entropy "
    "is a ROW-LOCAL expression with a FIXED left-to-right float fold — "
    "no aggregation-order nondeterminism; ROUND 4 absorbs libm log2 "
    "last-ulp differences (L6/L7 precedent). One map-side-combinable "
    "keyed aggregation at any scale.",
)
def q_agg_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.io import load_table as _lt

    ev = _lt(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(
        *[
            F.sum(
                F.when(F.col("event_type") == t, 1).otherwise(0)
            ).alias(f"n_{t}")
            for t in _ENTROPY_TYPES
        ],
        F.count(F.lit(1)).alias("n_total"),
    )
    return counts.select(
        "user_id",
        "n_total",
        F.expr(_entropy_expr_spark()).alias("entropy_bits"),
    )

@register(
    "q_agg_chisq",
    oracle="""
        WITH obs AS (
            SELECT o_orderpriority, o_orderstatus,
                   CAST(COUNT(*) AS BIGINT) AS obs
            FROM orders GROUP BY o_orderpriority, o_orderstatus
        ),
        m AS (
            SELECT o_orderpriority, o_orderstatus, obs,
                   CAST(SUM(obs) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS rt,
                   CAST(SUM(obs) OVER (PARTITION BY o_orderstatus) AS BIGINT) AS ct,
                   CAST(SUM(obs) OVER () AS BIGINT) AS t
            FROM obs
        ),
        e AS (
            SELECT *,
                   CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(t AS DOUBLE)
                       AS exp_v
            FROM m
        )
        SELECT o_orderpriority, o_orderstatus, obs, rt, ct, exp_v,
               (CAST(obs AS DOUBLE) - exp_v) * (CAST(obs AS DOUBLE) - exp_v)
                   / exp_v AS chisq_contrib
        FROM e
    """,
    section="A23",
    doc="Chi-square independence test contributions for the order "
    "priority x status contingency table (the A/B-test / feature-vs-label "
    "dependence screen). Expected counts and contributions are built with "
    "the IDENTICAL IEEE double expression tree from exact integer "
    "marginals on both engines — bit-deterministic, no rounding. The "
    "corpus collapses to a 15-row contingency table first; every marginal "
    "window runs on that bounded table.",
)
def q_agg_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    obs = od.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("obs")
    )
    m = obs.select(
        "*",
        F.sum("obs").over(Window.partitionBy("o_orderpriority")).alias("rt"),
        F.sum("obs").over(Window.partitionBy("o_orderstatus")).alias("ct"),
        F.sum("obs").over(
            Window.partitionBy()
        ).alias("t"),
    )
    e = m.withColumn(
        "exp_v",
        F.col("rt").cast("double") * F.col("ct").cast("double")
        / F.col("t").cast("double"),
    )
    d = F.col("obs").cast("double") - F.col("exp_v")
    return e.select(
        "o_orderpriority",
        "o_orderstatus",
        "obs",
        "rt",
        "ct",
        "exp_v",
        (d * d / F.col("exp_v")).alias("chisq_contrib"),
    )

@register(
    "q_agg_basket_lift",
    oracle=f"""
        WITH ob AS (
            SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        ),
        tot AS (SELECT CAST(COUNT(DISTINCT okey) AS BIGINT) AS n FROM ob),
        bc AS (
            SELECT brand, CAST(COUNT(*) AS BIGINT) AS nb
            FROM ob GROUP BY brand
        ),
        co AS (
            SELECT a.brand AS brand_a, b.brand AS brand_b,
                   CAST(COUNT(*) AS BIGINT) AS n_co
            FROM ob a JOIN ob b
              ON a.okey = b.okey AND a.brand < b.brand
            GROUP BY a.brand, b.brand
        )
        SELECT co.brand_a, co.brand_b, co.n_co,
               ca.nb AS n_a, cb.nb AS n_b, tot.n AS n_orders,
               CAST(co.n_co AS DOUBLE) / CAST(tot.n AS DOUBLE) AS support,
               (CAST(co.n_co AS DOUBLE) * CAST(tot.n AS DOUBLE))
                   / (CAST(ca.nb AS DOUBLE) * CAST(cb.nb AS DOUBLE)) AS lift
        FROM co
        JOIN bc ca ON co.brand_a = ca.brand
        JOIN bc cb ON co.brand_b = cb.brand
        CROSS JOIN tot
        WHERE co.n_co >= {_BASKET_MIN_CO}
    """,
    section="A24",
    doc="Market-basket association rules: brand co-purchase support and "
    "lift within orders. The only corpus-sized shuffle is the distinct "
    "(orderkey, brand) self-join, blocked on orderkey (fan-out bounded by "
    "brands-per-order^2 per key); brand marginals (25 rows) and the scalar "
    "order total are broadcast. support/lift are fixed IEEE expression "
    "trees over exact integer counts — bit-deterministic.",
)
def q_agg_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    ob = (
        li.join(pt, li.l_partkey == pt.p_partkey)
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
        .distinct()
    )
    tot = ob.agg(F.countDistinct("okey").alias("n_orders"))
    bc = ob.groupBy("brand").agg(F.count(F.lit(1)).alias("nb"))
    a = ob.alias("a")
    b = ob.alias("b")
    co = (
        a.join(
            b,
            (F.col("a.okey") == F.col("b.okey"))
            & (F.col("a.brand") < F.col("b.brand")),
        )
        .groupBy(
            F.col("a.brand").alias("brand_a"), F.col("b.brand").alias("brand_b")
        )
        .agg(F.count(F.lit(1)).alias("n_co"))
        .where(F.col("n_co") >= _BASKET_MIN_CO)
    )
    ca = F.broadcast(bc.select(F.col("brand").alias("brand_a"), F.col("nb").alias("n_a")))
    cb = F.broadcast(bc.select(F.col("brand").alias("brand_b"), F.col("nb").alias("n_b")))
    return (
        co.join(ca, "brand_a")
        .join(cb, "brand_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "brand_a",
            "brand_b",
            "n_co",
            "n_a",
            "n_b",
            "n_orders",
            (F.col("n_co").cast("double") / F.col("n_orders").cast("double")).alias(
                "support"
            ),
            (
                (F.col("n_co").cast("double") * F.col("n_orders").cast("double"))
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
            ).alias("lift"),
        )
    )

@register(
    "q_agg_gini",
    oracle="""
        WITH spend AS (
            SELECT o.o_custkey AS ck,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) AS xc
            FROM orders o GROUP BY o.o_custkey
        ),
        seg AS (
            SELECT c.c_mktsegment AS segment, s.ck, s.xc,
                   CAST(row_number() OVER (
                       PARTITION BY c.c_mktsegment ORDER BY s.xc, s.ck
                   ) AS BIGINT) AS i
            FROM spend s JOIN customer c ON s.ck = c.c_custkey
        ),
        m AS (
            SELECT segment,
                   CAST(COUNT(*) AS BIGINT) AS n_cust,
                   CAST(SUM(xc) AS BIGINT) AS sum_xc,
                   SUM(CAST(i AS HUGEINT) * xc) AS sum_ixc
            FROM seg GROUP BY segment
        )
        SELECT segment, n_cust,
               CAST(sum_xc AS DOUBLE) / 100 AS total_spend,
               CAST(2 * sum_ixc - CAST(n_cust + 1 AS HUGEINT) * sum_xc
                    AS DOUBLE)
               / CAST(CAST(n_cust AS HUGEINT) * sum_xc AS DOUBLE) AS gini
        FROM m
    """,
    section="A25",
    doc="Gini concentration coefficient of customer spend per market "
    "segment (revenue-inequality diagnostic; the 80/20 companion to W16's "
    "Pareto curve). Per-customer spend is an exact DECIMAL sum; ranks are "
    "integers with a unique-key tie-break; sum(i*x) stays in DECIMAL "
    "(exact, order-insensitive); the final Gini is ONE fixed IEEE "
    "expression tree over deterministic decimal->double conversions — "
    "bit-stable cross-engine. Two keyed shuffles + one per-segment sort.",
)
def q_agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    from pyspark.sql.types import DecimalType

    # r6 exactness device: all moments in exact cents integers
    # (bigint / DECIMAL(38,0)), ONE double division at the end — the old
    # decimal(38,2)->double conversion of sum(i*x) exceeded double
    # precision at sf1 and landed on adjacent doubles cross-engine.
    spend = od.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.expr(
            "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 "
            "AS BIGINT)"
        ).alias("xc")
    )
    seg = spend.join(cu, spend.ck == cu.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        "ck",
        "xc",
        F.row_number()
        .over(Window.partitionBy("c_mktsegment").orderBy("xc", "ck"))
        .cast("bigint")
        .alias("i"),
    )
    d38 = DecimalType(38, 0)
    m = seg.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.sum("xc").cast("bigint").alias("sum_xc"),
        F.sum(F.col("i").cast(d38) * F.col("xc")).alias("sum_ixc"),
    )
    num = (
        F.lit(2).cast(d38) * F.col("sum_ixc")
        - (F.col("n_cust") + 1).cast(d38) * F.col("sum_xc")
    )
    den = F.col("n_cust").cast(d38) * F.col("sum_xc")
    return m.select(
        "segment",
        "n_cust",
        (F.col("sum_xc").cast("double") / 100).alias("total_spend"),
        (num.cast("double") / den.cast("double")).alias("gini"),
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

# ==== from analytics_r3l ===========================================

@register(
    "q_agg_benford",
    oracle="""
        WITH d AS (
            SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                                    AS VARCHAR), 1, 1) AS INT) AS digit
            FROM orders
        ),
        c AS (
            SELECT digit, CAST(COUNT(*) AS BIGINT) AS n
            FROM d GROUP BY digit
        )
        SELECT digit, n,
               ROUND(CAST(n AS DOUBLE)
                     / SUM(CAST(n AS DOUBLE)) OVER (), 6) AS observed,
               ROUND(log10(1.0 + 1.0 / digit), 6) AS expected,
               ROUND((CAST(n AS DOUBLE) / SUM(CAST(n AS DOUBLE)) OVER ()
                      - log10(1.0 + 1.0 / digit))
                     * (CAST(n AS DOUBLE) / SUM(CAST(n AS DOUBLE)) OVER ()
                        - log10(1.0 + 1.0 / digit))
                     / log10(1.0 + 1.0 / digit), 6) AS chi_term
        FROM c
    """,
    section="A30",
    doc="Benford's-law audit of o_totalprice: leading significant digit "
    "via the decimal string of floor(price) (exact — no log-based digit "
    "extraction), observed share vs the Benford expectation log10(1+1/d), "
    "and the per-digit chi-square contribution (n·(O−E)²/E up to the "
    "common n factor). The classic fraud/data-quality screen: a synthetic "
    "or truncated money column shows immediately as fat chi terms. One "
    "9-group aggregation; the share window runs over 9 rows.",
)
def q_agg_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    digit = (
        F.substring(F.floor("o_totalprice").cast("long").cast("string"), 1, 1)
        .cast("int")
        .alias("digit")
    )
    c = orders.select(digit).groupBy("digit").agg(F.count("*").alias("n"))
    w = Window.partitionBy()
    observed = F.col("n").cast("double") / F.sum(F.col("n").cast("double")).over(w)
    expected = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return c.select(
        "digit",
        "n",
        F.round(observed, 6).alias("observed"),
        F.round(expected, 6).alias("expected"),
        F.round((observed - expected) * (observed - expected) / expected, 6).alias(
            "chi_term"
        ),
    )

# ==== from analytics_r3m ===========================================

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

# ==== from analytics_r3n ===========================================

@register(
    "q_agg_mix_shift",
    oracle="""
        WITH seg AS (
            SELECT c.c_mktsegment AS segment,
                   CAST(SUM(CASE WHEN o.o_orderdate < TIMESTAMP '1998-01-01'
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
                   SUM(CASE WHEN o.o_orderdate < TIMESTAMP '1998-01-01'
                       THEN CAST(o.o_totalprice AS DECIMAL(18,2))
                       ELSE CAST(0 AS DECIMAL(18,2)) END) AS s_b,
                   CAST(SUM(CASE WHEN o.o_orderdate >= TIMESTAMP '1998-01-01'
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
                   SUM(CASE WHEN o.o_orderdate >= TIMESTAMP '1998-01-01'
                       THEN CAST(o.o_totalprice AS DECIMAL(18,2))
                       ELSE CAST(0 AS DECIMAL(18,2)) END) AS s_c
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
            GROUP BY c.c_mktsegment
        ),
        m AS (
            SELECT segment, n_b, n_c,
                   CAST(n_b AS DOUBLE)
                   / CAST(SUM(n_b) OVER () AS DOUBLE) AS share_b,
                   CAST(n_c AS DOUBLE)
                   / CAST(SUM(n_c) OVER () AS DOUBLE) AS share_c,
                   CAST(s_b AS DOUBLE) / n_b AS mean_b,
                   CAST(s_c AS DOUBLE) / n_c AS mean_c
            FROM seg
        )
        SELECT segment, n_b, n_c,
               ROUND(share_b, 6) AS share_b,
               ROUND(share_c, 6) AS share_c,
               ROUND(mean_b, 4) AS mean_b,
               ROUND(mean_c, 4) AS mean_c,
               ROUND(share_b * (mean_c - mean_b), 4) AS within_term,
               ROUND((share_c - share_b) * mean_b, 4) AS mix_term,
               ROUND((share_c - share_b) * (mean_c - mean_b), 4)
                   AS interaction_term
        FROM m
    """,
    section="A32",
    doc="Oaxaca-style mix-shift decomposition of the period-over-period "
    "change in average order value (1995-97 base vs 1998+ current) by "
    "market segment: within_term (base share × mean change), mix_term "
    "(share change × base mean), interaction_term — the three sum to "
    "the overall AOV change, separating real per-segment movement from "
    "composition drift (Simpson's-paradox audit). All shares/means "
    "from exact conditional counts + DECIMAL sums (int64-backed); the "
    "terms are IEEE products of identical inputs, rounded on output. "
    "One dim join + one 5-group conditional aggregation; the share "
    "windows run over 5 collapsed rows.",
)
def q_agg_mix_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    is_b = F.col("o_orderdate") < "1998-01-01"
    d = F.col("o_totalprice").cast("decimal(18,2)")
    z = F.lit(0).cast("decimal(18,2)")
    seg = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.sum(F.when(is_b, 1).otherwise(0)).alias("n_b"),
            F.sum(F.when(is_b, d).otherwise(z)).alias("s_b"),
            F.sum(F.when(~is_b, 1).otherwise(0)).alias("n_c"),
            F.sum(F.when(~is_b, d).otherwise(z)).alias("s_c"),
        )
    )
    w = Window.partitionBy()
    share_b = F.col("n_b").cast("double") / F.sum("n_b").over(w).cast("double")
    share_c = F.col("n_c").cast("double") / F.sum("n_c").over(w).cast("double")
    mean_b = F.col("s_b").cast("double") / F.col("n_b")
    mean_c = F.col("s_c").cast("double") / F.col("n_c")
    return seg.select(
        "segment",
        "n_b",
        "n_c",
        F.round(share_b, 6).alias("share_b"),
        F.round(share_c, 6).alias("share_c"),
        F.round(mean_b, 4).alias("mean_b"),
        F.round(mean_c, 4).alias("mean_c"),
        F.round(share_b * (mean_c - mean_b), 4).alias("within_term"),
        F.round((share_c - share_b) * mean_b, 4).alias("mix_term"),
        F.round((share_c - share_b) * (mean_c - mean_b), 4).alias(
            "interaction_term"
        ),
    )

# ==== from analytics_r3o ===========================================

@register(
    "q_agg_survival_km",
    oracle="""
        WITH gaps AS (
            SELECT date_diff('day', o_orderdate,
                             lead(o_orderdate) OVER (
                                 PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey
                             )) AS gap
            FROM orders
        ),
        ev AS (
            SELECT gap AS t, CAST(COUNT(*) AS BIGINT) AS d
            FROM gaps WHERE gap IS NOT NULL GROUP BY gap
        ),
        km AS (
            SELECT t, d,
                   CAST(SUM(d) OVER () AS BIGINT)
                   - CAST(SUM(d) OVER w AS BIGINT) + d AS n_risk
            FROM ev
            WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)
        ),
        lg AS (
            SELECT t, d, n_risk,
                   CASE WHEN d < n_risk
                        THEN ln(1.0 - CAST(d AS DOUBLE) / n_risk)
                        END AS term,
                   MAX(CASE WHEN d >= n_risk THEN 1 ELSE 0 END) OVER w
                       AS dead
            FROM km
            WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)
        )
        SELECT t, d, n_risk,
               ROUND(CASE WHEN dead = 1 THEN 0.0
                     ELSE exp(CAST(SUM(CAST(floor(term * 1e12)
                                            AS DECIMAL(38,0))) OVER w
                                   AS DOUBLE) / 1e12) END, 6) AS survival
        FROM lg
        WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    """,
    section="A33",
    doc="Kaplan-Meier product-limit survival curve over customer "
    "inter-order gaps (days to next order; no censoring — every "
    "non-final order has an observed gap): per distinct gap t, the "
    "event count d, the at-risk count n (total minus prior events), "
    "and S(t) = prod(1 - d/n) computed as exp of the RUNNING "
    "EXACT-DECIMAL sum of quantized log terms — a cumulative product "
    "of doubles would compound engine drift, the quantized log-sum "
    "keeps every partial bit-identical (G1's device). The terminal "
    "n==d point is emitted as survival=0 via a cummax flag, never "
    "ln(0). The churn/retention primitive: collapses 100 TB of orders "
    "to |customers| gap rows (one lead window) then |distinct gaps| "
    "curve rows.",
)
def q_agg_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    wn = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = orders.select(
        F.datediff(
            F.lead("o_orderdate").over(wn), F.col("o_orderdate")
        ).alias("gap")
    ).where(F.col("gap").isNotNull())
    ev = gaps.groupBy(F.col("gap").alias("t")).agg(F.count("*").alias("d"))
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    km = ev.select(
        "t",
        "d",
        (F.sum("d").over(wall) - F.sum("d").over(w) + F.col("d")).alias(
            "n_risk"
        ),
    )
    term = F.when(
        F.col("d") < F.col("n_risk"),
        F.log(F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk")),
    )
    lg = km.select(
        "t",
        "d",
        "n_risk",
        term.alias("term"),
        F.max(
            F.when(F.col("d") >= F.col("n_risk"), 1).otherwise(0)
        ).over(w).alias("dead"),
    )
    runsum = (
        F.sum(F.floor(F.col("term") * 1e12).cast("decimal(38,0)"))
        .over(w)
        .cast("double")
        / 1e12
    )
    return lg.select(
        F.col("t").cast("long").alias("t"),
        "d",
        "n_risk",
        F.round(
            F.when(F.col("dead") == 1, 0.0).otherwise(F.exp(runsum)), 6
        ).alias("survival"),
    )

@register(
    "q_agg_theil",
    oracle=f"""
        WITH c AS (
            SELECT c_mktsegment AS segment,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS cents
            FROM orders JOIN customer ON c_custkey = o_custkey
        ),
        m AS (
            SELECT segment,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(cents) AS BIGINT) AS total
            FROM c GROUP BY segment
        ),
        t AS (
            SELECT c.segment, m.n, m.total,
                   CAST(c.cents AS DOUBLE) * m.n / m.total AS r
            FROM c JOIN m ON m.segment = c.segment
        )
        SELECT segment, n,
               ROUND(CAST(SUM(CAST(floor(r * ln(r) * {_THEIL_QS})
                                   AS DECIMAL(38,0))) AS DOUBLE)
                     / {_THEIL_QS} / n, 6) AS theil_t
        FROM t GROUP BY segment, n
    """,
    section="A34",
    doc="Theil T inequality index of order values per market segment: "
    "T = mean(r·ln r) with r = x/mean — the entropy-based member of "
    "the inequality family (A25 Gini is rank-based, A29 HHI is "
    "concentration-based; Theil is the only one decomposable into "
    "within/between-group terms). r is IEEE over exact cent integers "
    "(int64-backed, identical bits); each r·ln r term is quantized "
    "floor(x·1e6) before the exact per-segment DECIMAL sum (§5.3 rule "
    "10 margin: |terms| ≲ 1e7 over ≲1e5 rows). Two keyed reductions — "
    "per-segment totals then the log-moment — with the 5-row totals "
    "side joining back via the size-based planner's broadcast.",
)
def q_agg_theil(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    c = orders.join(
        customer, orders.o_custkey == customer.c_custkey
    ).select(
        F.col("c_mktsegment").alias("segment"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("cents"),
    )
    m = c.groupBy("segment").agg(
        F.count("*").alias("n"), F.sum("cents").alias("total")
    )
    t = c.join(m, "segment").select(
        "segment",
        "n",
        (
            F.col("cents").cast("double") * F.col("n") / F.col("total")
        ).alias("r"),
    )
    return t.groupBy("segment", "n").agg(
        F.round(
            F.sum(
                F.floor(F.col("r") * F.log("r") * _THEIL_QS).cast(
                    "decimal(38,0)"
                )
            ).cast("double")
            / _THEIL_QS
            / F.col("n"),
            6,
        ).alias("theil_t")
    )

# ==== from analytics_r3q ===========================================

@register(
    "q_agg_winsorized",
    oracle="""
        WITH r AS (
            SELECT o_orderstatus, o_totalprice,
                   row_number() OVER (
                       PARTITION BY o_orderstatus
                       ORDER BY o_totalprice, o_orderkey
                   ) AS rn,
                   COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
            FROM orders
        ),
        fences AS (
            SELECT o_orderstatus,
                   MAX(CASE WHEN rn = CAST(ceil(n * 0.05) AS BIGINT)
                            THEN o_totalprice END) AS p05,
                   MAX(CASE WHEN rn = CAST(ceil(n * 0.95) AS BIGINT)
                            THEN o_totalprice END) AS p95
            FROM r GROUP BY o_orderstatus
        )
        SELECT o.o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               f.p05, f.p95,
               CAST(SUM(CAST(
                   CASE WHEN o.o_totalprice < f.p05 THEN f.p05
                        WHEN o.o_totalprice > f.p95 THEN f.p95
                        ELSE o.o_totalprice END AS DECIMAL(18,2)))
                    AS DOUBLE) / COUNT(*) AS winsorized_mean,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   / COUNT(*) AS raw_mean
        FROM orders o JOIN fences f ON f.o_orderstatus = o.o_orderstatus
        GROUP BY o.o_orderstatus, f.p05, f.p95
    """,
    section="A35",
    doc="Winsorized mean of order values per status: clamp at the "
    "nearest-rank P05/P95 order statistics (ceil(n·p) ranks — exact in "
    "binary; W23's no-interpolation device), then an EXACT decimal "
    "mean of the clamped series (clamped values are raw 2dp doubles or "
    "the 2dp fence itself, so the DECIMAL(18,2) cast is lossless). Raw "
    "mean alongside shows the tail influence — the robust-statistics "
    "gate for reward/metric columns polluted by outliers. One ranked "
    "window + a ≤3-row fence broadcast + one keyed reduction.",
)
def q_agg_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    wp = Window.partitionBy("o_orderstatus")
    r = orders.select(
        "o_orderstatus",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wp).alias("n"),
    )
    fences = r.groupBy("o_orderstatus").agg(
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.col("n") * 0.05).cast("long"),
                F.col("o_totalprice"),
            )
        ).alias("p05"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.col("n") * 0.95).cast("long"),
                F.col("o_totalprice"),
            )
        ).alias("p95"),
    )
    j = orders.select("o_orderstatus", "o_totalprice").join(
        fences, "o_orderstatus"
    )
    clamped = (
        F.when(F.col("o_totalprice") < F.col("p05"), F.col("p05"))
        .when(F.col("o_totalprice") > F.col("p95"), F.col("p95"))
        .otherwise(F.col("o_totalprice"))
    )
    return j.groupBy("o_orderstatus", "p05", "p95").agg(
        F.count("*").alias("n"),
        (
            F.sum(clamped.cast("decimal(18,2)")).cast("double") / F.count("*")
        ).alias("winsorized_mean"),
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            / F.count("*")
        ).alias("raw_mean"),
    ).select(
        "o_orderstatus", "n", "p05", "p95", "winsorized_mean", "raw_mean"
    )

@register(
    "q_agg_target_encoding",
    oracle=f"""
        WITH j AS (
            SELECT c.c_nationkey AS nation,
                   CAST(o.o_totalprice AS DECIMAL(18,2)) AS y
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        ),
        g AS (
            SELECT nation,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(y) AS DOUBLE) AS s
            FROM j GROUP BY nation
        ),
        p AS (
            SELECT CAST(SUM(CAST(s AS DECIMAL(18,2))) AS DOUBLE)
                   / SUM(n) AS prior
            FROM g
        )
        SELECT g.nation, g.n,
               ROUND(g.s / g.n, 4) AS cat_mean,
               ROUND((g.s + {_TE_M} * p.prior) / (g.n + {_TE_M}), 4)
                   AS encoded
        FROM g CROSS JOIN p
    """,
    section="A36",
    doc="Smoothed target (mean) encoding of a categorical key (customer "
    "nation → mean order value): enc = (sum + m·prior)/(n + m) with "
    f"m={_TE_M} — shrinks small categories toward the global prior, "
    "the feature-engineering staple for high-cardinality categoricals. "
    "Per-category moments are exact (int counts, DECIMAL sums, "
    "int64-backed); prior and encodings are IEEE over identical casts, "
    "rounded 4dp. One keyed reduction + a 1-row prior broadcast; "
    "serving joins the ≤|categories| encoding table broadcast-side. "
    "Leakage discipline: fit on E24's train split only — composition, "
    "not a new plan.",
)
def q_agg_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    j = orders.join(customer, orders.o_custkey == customer.c_custkey).select(
        F.col("c_nationkey").alias("nation"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("y"),
    )
    g = j.groupBy("nation").agg(
        F.count("*").alias("n"), F.sum("y").cast("double").alias("s")
    )
    p = g.agg(
        (
            F.sum(F.col("s").cast("decimal(18,2)")).cast("double")
            / F.sum("n")
        ).alias("prior")
    )
    return g.crossJoin(F.broadcast(p)).select(
        "nation",
        "n",
        F.round(F.col("s") / F.col("n"), 4).alias("cat_mean"),
        F.round(
            (F.col("s") + _TE_M * F.col("prior")) / (F.col("n") + _TE_M), 4
        ).alias("encoded"),
    )

# ==== from analytics_r3s ===========================================

@register(
    "q_agg_mann_whitney",
    oracle="""
        WITH s AS (
            SELECT o_totalprice AS v,
                   CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS g
            FROM orders WHERE o_orderstatus IN ('F', 'O')
        ),
        r AS (
            SELECT v, g,
                   rank() OVER (ORDER BY v) AS rk,
                   COUNT(*) OVER (PARTITION BY v) AS tc
            FROM s
        ),
        m AS (
            SELECT CAST(SUM(g) AS BIGINT) AS n1,
                   CAST(SUM(1 - g) AS BIGINT) AS n2,
                   CAST(SUM(CASE WHEN g = 1 THEN
                       CAST(rk AS DECIMAL(38,1))
                       + CAST(tc - 1 AS DECIMAL(38,1)) / 2 END)
                       AS DOUBLE) AS r1
            FROM r
        ),
        ties AS (
            SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS t3
            FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM s GROUP BY v)
        )
        SELECT n1, n2,
               ROUND(r1 - CAST(n1 AS DOUBLE) * (n1 + 1) / 2.0, 1) AS u,
               ROUND((r1 - CAST(n1 AS DOUBLE) * (n1 + 1) / 2.0
                      - CAST(n1 AS DOUBLE) * n2 / 2.0)
                     / sqrt(CAST(n1 AS DOUBLE) * n2 / 12.0
                            * (CAST(n1 + n2 + 1 AS DOUBLE)
                               - CAST(t3 AS DOUBLE)
                                 / (CAST(n1 + n2 AS DOUBLE)
                                    * (n1 + n2 - 1)))), 4) AS z
        FROM m CROSS JOIN ties
    """,
    section="A37",
    doc="Mann-Whitney U two-sample test on order values (status F vs "
    "O): tie-averaged ranks rank() + (ties−1)/2 — exact .0/.5 halves, "
    "summed as DECIMAL(38,1) so the rank sum R1 is exact and "
    "order-insensitive; U = R1 − n1(n1+1)/2 and the TIE-CORRECTED "
    "normal z are single IEEE formulas over exact moments (the t³−t "
    "tie term sums as exact BIGINTs). The rank-based member of the "
    "two-sample family: A27 KS tests shape, A28 Welch tests means "
    "under normality, Mann-Whitney tests stochastic dominance with no "
    "distributional assumption — the robust default for skewed "
    "metrics. One ranked window + two bounded reductions.",
)
def q_agg_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale note (r6): rank(v) over an unpartitioned window single-tasks
    # the corpus. rank(v) = min(global_rn) within each tie group and the
    # tie count is a keyed window — both parallel once the global row
    # number comes from the distributed two-pass operator.
    from ai_to_cvent_etl_spark.operators.ranking import global_row_number

    orders = load_table(spark, sf_dir, "orders")
    s = orders.where(F.col("o_orderstatus").isin("F", "O")).select(
        F.col("o_totalprice").alias("v"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("g"),
        "o_orderkey",
    )
    wv = Window.partitionBy("v")
    r = global_row_number(s, ["v", "o_orderkey"], out_col="_grn").select(
        "v",
        "g",
        F.min("_grn").over(wv).alias("rk"),
        F.count("*").over(wv).alias("tc"),
    )
    avg_rank = (
        F.col("rk").cast("decimal(38,1)")
        + (F.col("tc") - 1).cast("decimal(38,1)") / 2
    )
    m = r.agg(
        F.sum("g").alias("n1"),
        F.sum(F.lit(1) - F.col("g")).alias("n2"),
        F.sum(F.when(F.col("g") == 1, avg_rank)).cast("double").alias("r1"),
    )
    ties = (
        s.groupBy("v")
        .agg(F.count("*").alias("t"))
        .agg(
            F.sum(
                F.col("t") * F.col("t") * F.col("t") - F.col("t")
            ).alias("t3")
        )
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    nd = (F.col("n1") + F.col("n2")).cast("double")
    u = F.col("r1") - n1d * (F.col("n1") + 1) / 2.0
    sigma = F.sqrt(
        n1d
        * n2d
        / 12.0
        * (
            (F.col("n1") + F.col("n2") + 1).cast("double")
            - F.col("t3").cast("double") / (nd * (F.col("n1") + F.col("n2") - 1))
        )
    )
    return m.crossJoin(F.broadcast(ties)).select(
        "n1",
        "n2",
        F.round(u, 1).alias("u"),
        F.round((u - n1d * n2d / 2.0) / sigma, 4).alias("z"),
    )

# ==== from analytics_r3t ===========================================

@register(
    "q_agg_cramers_v",
    oracle="""
        WITH j AS (
            SELECT c.c_mktsegment AS seg, o.o_orderstatus AS st
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        ),
        cells AS (
            SELECT seg, st, CAST(COUNT(*) AS BIGINT) AS o
            FROM j GROUP BY seg, st
        ),
        m AS (
            SELECT seg, st, o,
                   CAST(SUM(o) OVER (PARTITION BY seg) AS DOUBLE) AS rs,
                   CAST(SUM(o) OVER (PARTITION BY st) AS DOUBLE) AS cs,
                   CAST(SUM(o) OVER () AS DOUBLE) AS n
            FROM cells
        ),
        chi AS (
            SELECT CAST(MAX(n) AS BIGINT) AS n,
                   CAST(SUM(CAST(floor(
                       (o - rs * cs / n) * (o - rs * cs / n)
                       / (rs * cs / n) * 1e9) AS DECIMAL(38,0)))
                       AS DOUBLE) / 1e9 AS chi2,
                   CAST(COUNT(DISTINCT seg) AS BIGINT) AS r,
                   CAST(COUNT(DISTINCT st) AS BIGINT) AS c
            FROM m
        )
        SELECT n, ROUND(chi2, 4) AS chi2,
               CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
               ROUND(sqrt(chi2 / (n * least(r - 1, c - 1))), 6)
                   AS cramers_v
        FROM chi
    """,
    section="A38",
    doc="Cramér's V effect size for the market-segment × order-status "
    "contingency table: chi-square from exact cell/margin counts (each "
    "cell's term quantized floor(x·1e9) before the exact DECIMAL sum — "
    "15 cells, rule-10 margin enormous), V = sqrt(chi2/(n·min(r−1,"
    "c−1))). The magnitude companion to A23's chi-square test: "
    "significance scales with n, V doesn't — at 100 TB everything is "
    "'significant' and only effect sizes rank real associations. One "
    "dim join + one contingency reduction; margins are windows over "
    "≤15 collapsed cells.",
)
def q_agg_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    j = orders.join(customer, orders.o_custkey == customer.c_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        F.col("o_orderstatus").alias("st"),
    )
    cells = j.groupBy("seg", "st").agg(F.count("*").alias("o"))
    m = cells.select(
        "seg",
        "st",
        "o",
        F.sum("o").over(Window.partitionBy("seg")).cast("double").alias("rs"),
        F.sum("o").over(Window.partitionBy("st")).cast("double").alias("cs"),
        F.sum("o").over(Window.partitionBy()).cast("double").alias("n"),
    )
    e = F.col("rs") * F.col("cs") / F.col("n")
    term = (F.col("o") - e) * (F.col("o") - e) / e
    chi = m.agg(
        F.max("n").cast("long").alias("n"),
        (
            F.sum(F.floor(term * 1e9).cast("decimal(38,0)")).cast("double")
            / 1e9
        ).alias("chi2"),
        F.countDistinct("seg").alias("r"),
        F.countDistinct("st").alias("c"),
    )
    return chi.select(
        "n",
        F.round("chi2", 4).alias("chi2"),
        ((F.col("r") - 1) * (F.col("c") - 1)).alias("dof"),
        F.round(
            F.sqrt(
                F.col("chi2")
                / (F.col("n") * F.least(F.col("r") - 1, F.col("c") - 1))
            ),
            6,
        ).alias("cramers_v"),
    )

# ==== from analytics_r3u ===========================================

@register(
    "q_agg_info_gain",
    oracle="""
        WITH j AS (
            SELECT c.c_mktsegment AS seg, o.o_orderstatus AS st
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        ),
        cells AS (
            SELECT seg, st, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM j GROUP BY seg, st
        ),
        m AS (
            SELECT seg, st, cnt,
                   CAST(SUM(cnt) OVER (PARTITION BY st) AS DOUBLE) AS sc,
                   CAST(SUM(cnt) OVER (PARTITION BY seg) AS DOUBLE) AS gc,
                   CAST(SUM(cnt) OVER () AS DOUBLE) AS n
            FROM cells
        ),
        h AS (
            SELECT
                CAST(SUM(CAST(floor(
                    CASE WHEN st_rn = 1
                         THEN -(sc / n) * ln(sc / n) ELSE 0.0 END * 1e12)
                    AS DECIMAL(38,0))) AS DOUBLE) / 1e12 AS h_status,
                CAST(SUM(CAST(floor(
                    -(cnt / n) * ln(cnt / gc) * 1e12)
                    AS DECIMAL(38,0))) AS DOUBLE) / 1e12 AS h_cond
            FROM (
                SELECT m.*,
                       row_number() OVER (PARTITION BY st
                                          ORDER BY seg) AS st_rn
                FROM m
            )
        )
        SELECT ROUND(h_status, 6) AS h_status,
               ROUND(h_cond, 6) AS h_cond,
               ROUND(h_status - h_cond, 6) AS info_gain
        FROM h
    """,
    section="A39",
    doc="Information gain I(status; segment) = H(status) − H(status | "
    "segment) from the exact contingency table: H(status) sums "
    "−p(st)·ln p(st) (each status counted once via a per-status "
    "row_number mask), the conditional entropy sums −p(seg,st)·ln "
    "p(st|seg) over all cells — every term quantized floor(x·1e12) "
    "before the exact DECIMAL sum (≤20 terms). The feature-selection "
    "ranking metric: unlike correlation (A26) it captures arbitrary "
    "categorical dependence, and unlike chi-square (A23) it is "
    "directly comparable across features in bits/nats. Collapses to "
    "the |r×c| contingency immediately; windows run over ≤15 cells.",
)
def q_agg_info_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    j = orders.join(customer, orders.o_custkey == customer.c_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        F.col("o_orderstatus").alias("st"),
    )
    cells = j.groupBy("seg", "st").agg(F.count("*").alias("cnt"))
    m = cells.select(
        "seg",
        "st",
        "cnt",
        F.sum("cnt").over(Window.partitionBy("st")).cast("double").alias("sc"),
        F.sum("cnt").over(Window.partitionBy("seg")).cast("double").alias("gc"),
        F.sum("cnt").over(Window.partitionBy()).cast("double").alias("n"),
        F.row_number()
        .over(Window.partitionBy("st").orderBy("seg"))
        .alias("st_rn"),
    )

    def qsum(c):
        return (
            F.sum(F.floor(c * 1e12).cast("decimal(38,0)")).cast("double")
            / 1e12
        )

    h_status_term = F.when(
        F.col("st_rn") == 1,
        -(F.col("sc") / F.col("n")) * F.log(F.col("sc") / F.col("n")),
    ).otherwise(0.0)
    h_cond_term = -(F.col("cnt") / F.col("n")) * F.log(
        F.col("cnt") / F.col("gc")
    )
    h = m.agg(
        qsum(h_status_term).alias("h_status"),
        qsum(h_cond_term).alias("h_cond"),
    )
    return h.select(
        F.round("h_status", 6).alias("h_status"),
        F.round("h_cond", 6).alias("h_cond"),
        F.round(F.col("h_status") - F.col("h_cond"), 6).alias("info_gain"),
    )

@register(
    "q_agg_wilson_ci",
    oracle=f"""
        WITH c AS (
            SELECT user_id,
                   MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS converted
            FROM events GROUP BY user_id
        ),
        m AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(converted) AS BIGINT) AS k
            FROM c
        )
        SELECT n, k,
               ROUND(CAST(k AS DOUBLE) / n, 6) AS p_hat,
               ROUND((CAST(k AS DOUBLE) / n + {_Z} * {_Z} / (2.0 * n)
                      - {_Z} * sqrt((CAST(k AS DOUBLE) / n)
                                    * (1.0 - CAST(k AS DOUBLE) / n) / n
                                    + {_Z} * {_Z} / (4.0 * n * n)))
                     / (1.0 + {_Z} * {_Z} / n), 6) AS ci_lo,
               ROUND((CAST(k AS DOUBLE) / n + {_Z} * {_Z} / (2.0 * n)
                      + {_Z} * sqrt((CAST(k AS DOUBLE) / n)
                                    * (1.0 - CAST(k AS DOUBLE) / n) / n
                                    + {_Z} * {_Z} / (4.0 * n * n)))
                     / (1.0 + {_Z} * {_Z} / n), 6) AS ci_hi
        FROM m
    """,
    section="A40",
    doc="Wilson score 95% confidence interval for the user-level "
    "purchase-conversion proportion (a user converts if they have ≥1 "
    "purchase event): exact user/conversion counts, then the Wilson "
    "formula — the interval that stays inside [0,1] and behaves at "
    "small n and extreme p where the naive Wald interval fails, which "
    "is why it is the A/B-testing default. Two exact reductions "
    "(per-user flag, then totals); the interval is one IEEE formula "
    "with literal z, rounded 6dp.",
)
def q_agg_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    )
    m = c.agg(
        F.count("*").alias("n"), F.sum("converted").alias("k")
    )
    n = F.col("n").cast("double")
    p = F.col("k").cast("double") / n
    z2 = _Z * _Z
    rad = F.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n))
    den = 1.0 + z2 / n
    return m.select(
        "n",
        "k",
        F.round(p, 6).alias("p_hat"),
        F.round((p + z2 / (2.0 * n) - _Z * rad) / den, 6).alias("ci_lo"),
        F.round((p + z2 / (2.0 * n) + _Z * rad) / den, 6).alias("ci_hi"),
    )

# ==== from analytics_r4a ===========================================

@register(
    "q_agg_listagg",
    oracle="""
        SELECT n_nationkey,
               string_agg(c_name, '|' ORDER BY c_acctbal DESC, c_name)
                   AS top_names,
               CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM customer
        JOIN nation ON n_nationkey = c_nationkey
        WHERE c_acctbal > 9000
        GROUP BY n_nationkey
    """,
    section="A41",
    doc="SQL-standard LISTAGG ... WITHIN GROUP (ORDER BY ...): "
    "high-balance customer names per nation, ordered by (acctbal "
    "DESC, name) — deterministic ordered string aggregation through "
    "the standard surface (A10 pins the same contract via "
    "sort_array(collect_list)); DuckDB mirrors with string_agg ORDER "
    "BY. The WHERE bounds the group BEFORE aggregation — an unbounded "
    "LISTAGG group is the collect_list OOM in disguise (cap with a "
    "rank-window head at scale).",
)
def q_agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    j = customer.join(
        nation, customer.c_nationkey == nation.n_nationkey
    ).where(F.col("c_acctbal") > 9000)
    j.createOrReplaceTempView("a41_cust")
    return spark.sql(
        """
        SELECT n_nationkey,
               listagg(c_name, '|')
                   WITHIN GROUP (ORDER BY c_acctbal DESC, c_name)
                   AS top_names,
               COUNT(*) AS n_customers
        FROM a41_cust
        GROUP BY n_nationkey
        """
    )

# ==== from analytics_r4b ===========================================

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

@register(
    "q_agg_ratio_ci",
    oracle=f"""
        WITH j AS (
            SELECT c.c_mktsegment AS segment, o.o_custkey AS ck,
                   CAST(COUNT(*) AS BIGINT) AS x,
                   SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS y
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
            GROUP BY c.c_mktsegment, o.o_custkey
        ),
        m AS (
            SELECT segment,
                   CAST(COUNT(*) AS DOUBLE) AS n,
                   CAST(SUM(x) AS DOUBLE) AS sx,
                   CAST(SUM(x * x) AS DOUBLE) AS sxx,
                   CAST(SUM(y) AS DOUBLE) AS sy,
                   CAST(SUM(CAST(y AS DECIMAL(19,2))
                            * CAST(y AS DECIMAL(19,2))) AS DOUBLE) AS syy,
                   CAST(SUM(CAST(x AS DECIMAL(10,0))
                            * CAST(y AS DECIMAL(19,2))) AS DOUBLE) AS sxy
            FROM j GROUP BY segment
        )
        SELECT segment,
               CAST(n AS BIGINT) AS n_customers,
               ROUND(sy / sx, 4) AS revenue_per_order,
               ROUND(sqrt(greatest(0.0,
                   (syy / n - (sy / n) * (sy / n))
                   - 2.0 * (sy / sx) * (sxy / n - (sx / n) * (sy / n))
                   + (sy / sx) * (sy / sx)
                     * (sxx / n - (sx / n) * (sx / n)))
                   / n) / (sx / n), 6) AS se,
               ROUND(sy / sx - {_Z95} * sqrt(greatest(0.0,
                   (syy / n - (sy / n) * (sy / n))
                   - 2.0 * (sy / sx) * (sxy / n - (sx / n) * (sy / n))
                   + (sy / sx) * (sy / sx)
                     * (sxx / n - (sx / n) * (sx / n)))
                   / n) / (sx / n), 4) AS ci_lo,
               ROUND(sy / sx + {_Z95} * sqrt(greatest(0.0,
                   (syy / n - (sy / n) * (sy / n))
                   - 2.0 * (sy / sx) * (sxy / n - (sx / n) * (sy / n))
                   + (sy / sx) * (sy / sx)
                     * (sxx / n - (sx / n) * (sx / n)))
                   / n) / (sx / n), 4) AS ci_hi
        FROM m
    """,
    section="A44",
    doc="Delta-method 95% CI for a RATIO metric — revenue per order by "
    "segment, with the CUSTOMER as the randomization unit: per-"
    "customer (orders x, revenue y) pairs, then Var(ȳ/x̄) ≈ (Var y − "
    "2R·Cov(x,y) + R²·Var x)/(n·x̄²) — the covariance term naive "
    "per-row averaging drops, which is the classic A/B ratio-metric "
    "mistake. All moments exact (integer x, DECIMAL y, width-19 "
    "squares/cross-products per the §2.28 rule); ratio/SE/CI are "
    "single IEEE formulas. Two keyed reductions; moments ride "
    "map-side partials.",
)
def q_agg_ratio_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    j = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"), "o_custkey")
        .agg(
            F.count("*").alias("x"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("y"),
        )
    )
    m = j.groupBy("segment").agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(
            F.col("y").cast("decimal(19,2)") * F.col("y").cast("decimal(19,2)")
        )
        .cast("double")
        .alias("syy"),
        F.sum(
            F.col("x").cast("decimal(10,0)") * F.col("y").cast("decimal(19,2)")
        )
        .cast("double")
        .alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    r = sy / sx
    var = (
        (F.col("syy") / n - (sy / n) * (sy / n))
        - 2.0 * r * (F.col("sxy") / n - (sx / n) * (sy / n))
        + r * r * (F.col("sxx") / n - (sx / n) * (sx / n))
    )
    se = F.sqrt(F.greatest(F.lit(0.0), var) / n) / (sx / n)
    return m.select(
        "segment",
        n.cast("long").alias("n_customers"),
        F.round(r, 4).alias("revenue_per_order"),
        F.round(se, 6).alias("se"),
        F.round(r - _Z95 * se, 4).alias("ci_lo"),
        F.round(r + _Z95 * se, 4).alias("ci_hi"),
    )

# ==== from analytics_r4e ===========================================

@register(
    "q_agg_cuped",
    oracle="""
        WITH per_cust AS (
            SELECT o_custkey,
                   CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
                       THEN CAST(o_totalprice AS DECIMAL(18,2))
                       ELSE CAST(0 AS DECIMAL(18,2)) END) * 100 AS BIGINT)
                       // 100000 AS x,
                   CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01'
                       THEN CAST(o_totalprice AS DECIMAL(18,2))
                       ELSE CAST(0 AS DECIMAL(18,2)) END) * 100 AS BIGINT)
                       // 100000 AS y
            FROM orders GROUP BY o_custkey
        ),
        m AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                   CAST(SUM(x) AS DOUBLE) AS sx,
                   CAST(SUM(y) AS DOUBLE) AS sy,
                   CAST(SUM(x * x) AS DOUBLE) AS sxx,
                   CAST(SUM(y * y) AS DOUBLE) AS syy,
                   CAST(SUM(x * y) AS DOUBLE) AS sxy
            FROM per_cust
        )
        SELECT CAST(n AS BIGINT) AS n_customers,
               ROUND((sxy / n - (sx / n) * (sy / n))
                     / (sxx / n - (sx / n) * (sx / n)), 6) AS theta,
               ROUND(syy / n - (sy / n) * (sy / n), 4) AS var_y,
               ROUND((syy / n - (sy / n) * (sy / n))
                     - (sxy / n - (sx / n) * (sy / n))
                       * (sxy / n - (sx / n) * (sy / n))
                       / (sxx / n - (sx / n) * (sx / n)), 4)
                   AS var_y_cuped,
               ROUND((sxy / n - (sx / n) * (sy / n))
                     * (sxy / n - (sx / n) * (sy / n))
                     / ((sxx / n - (sx / n) * (sx / n))
                        * (syy / n - (sy / n) * (sy / n))), 6)
                   AS variance_reduction
        FROM m
    """,
    section="A45",
    doc="CUPED variance reduction: per-customer post-period revenue "
    "(1998+) adjusted by the pre-period covariate (1995-97 revenue) "
    "with θ = Cov(x,y)/Var(x); reports θ, the raw and adjusted metric "
    "variances (Var_cuped = Var_y·(1−ρ²)), and the achieved reduction "
    "ρ² — the experimentation-sensitivity technique that shrinks "
    "required sample sizes by the pre/post correlation. Per-customer "
    "revenues are quantized to WHOLE k$ so every moment is an exact "
    "BIGINT far below 2^53 (§5.3 rule 10 — the wide-decimal squares "
    "hit the int128 conversion divergence at sf0.1); customers "
    "without pre-period history carry covariate 0 identically on "
    "both engines. Two keyed reductions, map-side partials.",
)
def q_agg_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_totalprice").cast("decimal(18,2)")
    z = F.lit(0).cast("decimal(18,2)")
    pre = F.col("o_orderdate") < "1998-01-01"
    per_cust = orders.groupBy("o_custkey").agg(
        F.expr(
            "CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01' "
            "THEN CAST(o_totalprice AS DECIMAL(18,2)) "
            "ELSE CAST(0 AS DECIMAL(18,2)) END) * 100 AS BIGINT) "
            "DIV 100000"
        ).alias("x"),
        F.expr(
            "CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01' "
            "THEN CAST(o_totalprice AS DECIMAL(18,2)) "
            "ELSE CAST(0 AS DECIMAL(18,2)) END) * 100 AS BIGINT) "
            "DIV 100000"
        ).alias("y"),
    )
    m = per_cust.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    n = F.col("n")
    cov = F.col("sxy") / n - (F.col("sx") / n) * (F.col("sy") / n)
    vx = F.col("sxx") / n - (F.col("sx") / n) * (F.col("sx") / n)
    vy = F.col("syy") / n - (F.col("sy") / n) * (F.col("sy") / n)
    return m.select(
        n.cast("long").alias("n_customers"),
        F.round(cov / vx, 6).alias("theta"),
        F.round(vy, 4).alias("var_y"),
        F.round(vy - cov * cov / vx, 4).alias("var_y_cuped"),
        F.round(cov * cov / (vx * vy), 6).alias("variance_reduction"),
    )

@register(
    "q_agg_power_analysis",
    oracle=f"""
        WITH per_cust AS (
            SELECT o_custkey,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) // 100000 AS y
            FROM orders GROUP BY o_custkey
        ),
        m AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                   CAST(SUM(y) AS DOUBLE) AS sy,
                   CAST(SUM(y * y) AS DOUBLE) AS syy
            FROM per_cust
        ),
        mde AS (
            SELECT unnest([{', '.join(str(m) for m in _MDES)}]) AS mde
        )
        SELECT CAST(mde.mde AS DOUBLE) AS mde_kusd,
               ROUND(m.syy / m.n - (m.sy / m.n) * (m.sy / m.n), 4)
                   AS metric_variance,
               CAST(ceil(2.0 * ({_ZA} + {_ZB}) * ({_ZA} + {_ZB})
                         * (m.syy / m.n - (m.sy / m.n) * (m.sy / m.n))
                         / (mde.mde * mde.mde)) AS BIGINT)
                   AS n_per_arm
        FROM m CROSS JOIN mde
    """,
    section="A46",
    doc="Experiment sample-size calculator: required n per arm = "
    "2(z_α/2 + z_β)²·σ²/δ² at α=.05, power=.80, for three minimum "
    "detectable effects, with σ² MEASURED from the per-customer "
    "revenue metric (whole-k$ integer moments — rule 10, A45's "
    "device) rather than guessed — the planning half of the "
    "experimentation suite (A40 interval, A44 ratio CI, A45 CUPED; "
    "CUPED's variance-reduction ratio divides straight into these "
    "n's). One reduction + a literal MDE fan-out; ceil lands "
    "strictly off integers (the z-sum squared is irrational).",
)
def q_agg_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.expr(
            "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)"
            " DIV 100000"
        ).alias("y")
    )
    m = per_cust.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    mde = orders.sparkSession.createDataFrame(
        [(x,) for x in _MDES], "mde double"
    )
    var = F.col("syy") / F.col("n") - (F.col("sy") / F.col("n")) * (
        F.col("sy") / F.col("n")
    )
    zsum2 = (_ZA + _ZB) * (_ZA + _ZB)
    return m.crossJoin(F.broadcast(mde)).select(
        F.col("mde").alias("mde_kusd"),
        F.round(var, 4).alias("metric_variance"),
        F.ceil(2.0 * zsum2 * var / (F.col("mde") * F.col("mde")))
        .cast("long")
        .alias("n_per_arm"),
    )

@register(
    "q_agg_two_proportion_z",
    oracle=f"""
        WITH u AS (
            SELECT user_id,
                   {_H48_USER_DUCK} % 2 AS arm,
                   MAX(CASE WHEN event_type = 'purchase' AND value > 150
                            THEN 1 ELSE 0 END) AS converted
            FROM events GROUP BY user_id
        ),
        arms AS (
            SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_a,
                   CAST(SUM(CASE WHEN arm = 0 THEN converted ELSE 0 END)
                        AS BIGINT) AS k_a,
                   CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_b,
                   CAST(SUM(CASE WHEN arm = 1 THEN converted ELSE 0 END)
                        AS BIGINT) AS k_b
            FROM u
        )
        SELECT n_a, k_a, n_b, k_b,
               ROUND(CAST(k_a AS DOUBLE) / n_a, 6) AS p_a,
               ROUND(CAST(k_b AS DOUBLE) / n_b, 6) AS p_b,
               ROUND(CASE WHEN k_a + k_b > 0 AND k_a + k_b < n_a + n_b
                     THEN (CAST(k_a AS DOUBLE) / n_a
                           - CAST(k_b AS DOUBLE) / n_b)
                          / sqrt((CAST(k_a + k_b AS DOUBLE) / (n_a + n_b))
                                 * (1.0 - CAST(k_a + k_b AS DOUBLE)
                                          / (n_a + n_b))
                                 * (1.0 / n_a + 1.0 / n_b)) END, 4) AS z
        FROM arms
    """,
    section="A47",
    doc="Two-proportion z-test — the canonical A/B conversion readout: "
    "users hash-split into two arms (the 48-bit md5 device — stable, "
    "manifest-free assignment, E24's rule), per-arm user-level "
    "conversion rates (converted = any purchase over $150 — the "
    "threshold keeps both outcomes populated at every SF), and the "
    "pooled-proportion z statistic, NULL-guarded at the degenerate "
    "all/none-converted poles on both engines. Since "
    "the split is hash-random and both arms see the same data, z ≈ 0 "
    "here BY CONSTRUCTION — the A/A test, which is itself the "
    "standard harness validation (a non-null A/A z means the "
    "assignment or the metric is broken). Counts exact; z is one IEEE "
    "formula. Completes the experimentation suite: A46 plans, A47/A40 "
    "read out, A44 handles ratio metrics, A45 tightens variance.",
)
def q_agg_two_proportion_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 150),
                1,
            ).otherwise(0)
        ).alias("converted")
    ).select(
        (F.expr(_H48_USER) % 2).alias("arm"), "converted"
    )
    arms = u.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(
            F.when(F.col("arm") == 0, F.col("converted")).otherwise(0)
        ).alias("k_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(
            F.when(F.col("arm") == 1, F.col("converted")).otherwise(0)
        ).alias("k_b"),
    )
    pa = F.col("k_a").cast("double") / F.col("n_a")
    pb = F.col("k_b").cast("double") / F.col("n_b")
    pool = (F.col("k_a") + F.col("k_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    k_tot = F.col("k_a") + F.col("k_b")
    n_tot = F.col("n_a") + F.col("n_b")
    z = F.when(
        (k_tot > 0) & (k_tot < n_tot),
        (pa - pb)
        / F.sqrt(
            pool * (1.0 - pool) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
        ),
    )
    return arms.select(
        "n_a",
        "k_a",
        "n_b",
        "k_b",
        F.round(pa, 6).alias("p_a"),
        F.round(pb, 6).alias("p_b"),
        F.round(z, 4).alias("z"),
    )

# ==== from analytics_r4i ===========================================

@register(
    "q_agg_srm_check",
    oracle=f"""
        WITH u AS (
            SELECT DISTINCT user_id, {_H48_USER_DUCK} % 2 AS arm
            FROM events
        ),
        c AS (
            SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_a,
                   CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_b
            FROM u
        )
        SELECT n_a, n_b,
               ROUND((CAST(n_a AS DOUBLE)
                      - CAST(n_a + n_b AS DOUBLE) / 2.0)
                     * (CAST(n_a AS DOUBLE)
                        - CAST(n_a + n_b AS DOUBLE) / 2.0)
                     / (CAST(n_a + n_b AS DOUBLE) / 2.0)
                     + (CAST(n_b AS DOUBLE)
                        - CAST(n_a + n_b AS DOUBLE) / 2.0)
                       * (CAST(n_b AS DOUBLE)
                          - CAST(n_a + n_b AS DOUBLE) / 2.0)
                       / (CAST(n_a + n_b AS DOUBLE) / 2.0), 4) AS chi2,
               abs(CAST(n_a AS DOUBLE) - CAST(n_b AS DOUBLE))
               / sqrt(CAST(n_a + n_b AS DOUBLE)) > 3.8906 AS srm_flag
        FROM c
    """,
    section="A48",
    doc="Sample-ratio-mismatch check: chi-square of observed arm sizes "
    "against the designed 50/50 hash split, plus the flag at the "
    "p≈0.0001 threshold (|n_a−n_b|/√n > 3.89 — SRM uses a tiny alpha "
    "because assignment bugs produce huge chi values and false alarms "
    "must be near-zero). THE experiment health gate: a readout whose "
    "arms fail SRM is invalid regardless of its metric p-values "
    "(biased assignment, logging loss, bot filtering asymmetry). "
    "Exact counts; the statistic is one IEEE expression. Run it on "
    "every readout — it costs one collapsed-count row.",
)
def q_agg_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    u = ev.select("user_id").distinct().select(
        (F.expr(_H48_USER) % 2).alias("arm")
    )
    c = u.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n_b"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    exp = (na + nb) / 2.0
    chi2 = (na - exp) * (na - exp) / exp + (nb - exp) * (nb - exp) / exp
    return c.select(
        "n_a",
        "n_b",
        F.round(chi2, 4).alias("chi2"),
        (F.abs(na - nb) / F.sqrt(na + nb) > 3.8906).alias("srm_flag"),
    )

@register(
    "q_agg_allocate",
    oracle=f"""
        WITH rev AS (
            SELECT c.c_nationkey AS nation,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) AS cents
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
            GROUP BY c.c_nationkey
        ),
        shares AS (
            SELECT nation, cents,
                   CAST(floor(CAST(cents AS DOUBLE)
                              / CAST(SUM(cents) OVER () AS DOUBLE)
                              * {_BUDGET_CENTS}) AS BIGINT) AS base,
                   CAST(cents AS DOUBLE)
                   / CAST(SUM(cents) OVER () AS DOUBLE)
                   * {_BUDGET_CENTS}
                   - floor(CAST(cents AS DOUBLE)
                           / CAST(SUM(cents) OVER () AS DOUBLE)
                           * {_BUDGET_CENTS}) AS rem
            FROM rev
        ),
        ranked AS (
            SELECT nation, cents, base, rem,
                   row_number() OVER (ORDER BY rem DESC, nation) AS rnk,
                   CAST({_BUDGET_CENTS} - SUM(base) OVER () AS BIGINT)
                       AS shortfall
            FROM shares
        )
        SELECT nation, base,
               CAST(base + CASE WHEN rnk <= shortfall THEN 1 ELSE 0 END
                    AS BIGINT) AS allocated_cents,
               CAST(rnk AS INT) AS remainder_rank
        FROM ranked
    """,
    section="A49",
    doc=f"Largest-remainder (Hamilton) allocation: a fixed "
    f"{_BUDGET_CENTS}-cent budget spread across nations proportional "
    "to exact revenue such that integer allocations SUM EXACTLY to "
    "the budget — base = floor(share·budget), then the shortfall "
    "cents go to the largest fractional remainders (nation "
    "tie-break). Naive per-row rounding drifts by up to |entities|/2 "
    "cents and reconciliation (J23) flags it forever. Share products "
    "are IEEE over exact integer cents — identical bits, so floor, "
    "remainders, and the rank all agree cross-engine. The same shape "
    "allocates quotas and sampling targets (L16's mixture rates "
    "rounded to exact document counts). Collapses to |nations| rows.",
)
def q_agg_allocate(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    rev = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nation"))
        .agg(
            F.expr(
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 "
                "AS BIGINT)"
            ).alias("cents")
        )
    )
    w = Window.partitionBy()
    share = F.col("cents").cast("double") / F.sum("cents").over(w).cast(
        "double"
    )
    raw = share * _BUDGET_CENTS
    shares = rev.select(
        "nation",
        "cents",
        F.floor(raw).cast("long").alias("base"),
        (raw - F.floor(raw)).alias("rem"),
    )
    ranked = shares.select(
        "nation",
        "base",
        "rem",
        F.row_number()
        .over(Window.orderBy(F.desc("rem"), F.asc("nation")))
        .alias("rnk"),
        (F.lit(_BUDGET_CENTS) - F.sum("base").over(w)).alias("shortfall"),
    )
    return ranked.select(
        "nation",
        "base",
        (
            F.col("base")
            + F.when(F.col("rnk") <= F.col("shortfall"), 1).otherwise(0)
        ).cast("long").alias("allocated_cents"),
        F.col("rnk").cast("int").alias("remainder_rank"),
    )

# ==== from analytics_r4l ===========================================

@register(
    "q_agg_rfm",
    oracle="""
        WITH per_cust AS (
            SELECT o_custkey,
                   MAX(o_orderdate) AS last_order,
                   CAST(COUNT(*) AS BIGINT) AS freq,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
            FROM orders GROUP BY o_custkey
        ),
        scored AS (
            SELECT o_custkey, freq, monetary,
                   ntile(3) OVER (ORDER BY last_order, o_custkey) AS r,
                   ntile(3) OVER (ORDER BY freq, o_custkey) AS f,
                   ntile(3) OVER (ORDER BY monetary, o_custkey) AS m
            FROM per_cust
        )
        SELECT CAST(r AS INT) AS r, CAST(f AS INT) AS f,
               CAST(m AS INT) AS m,
               CAST(r AS VARCHAR) || CAST(f AS VARCHAR)
               || CAST(m AS VARCHAR) AS segment,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(monetary) AS DOUBLE) / COUNT(*) AS avg_monetary
        FROM scored
        GROUP BY r, f, m
    """,
    section="A50",
    doc="RFM customer segmentation — the canonical customer-value "
    "model: per-customer recency (last order date), frequency, and "
    "monetary total; tercile scores via ntile(3) ordered by (metric, "
    "custkey) — the unique tie-break makes tercile boundaries exact "
    "(§5.3 rule 3); the 27 composite segments with sizes and "
    "decimal-exact monetary means (3=best on every axis: '333' is "
    "the champion segment, '111' the churn-risk one). One "
    "per-customer reduction + three windows over the collapsed "
    "relation + one rollup; at larger scale fixed cutoffs from A20's "
    "quantile sketch replace the global ntile sort.",
)
def q_agg_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("freq"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("monetary"),
    )
    scored = per_cust.select(
        "o_custkey",
        "freq",
        "monetary",
        F.ntile(3)
        .over(Window.orderBy("last_order", "o_custkey"))
        .alias("r"),
        F.ntile(3).over(Window.orderBy("freq", "o_custkey")).alias("f"),
        F.ntile(3).over(Window.orderBy("monetary", "o_custkey")).alias("m"),
    )
    return scored.groupBy("r", "f", "m").agg(
        F.count("*").alias("n_customers"),
        (F.sum("monetary").cast("double") / F.count("*")).alias(
            "avg_monetary"
        ),
    ).select(
        F.col("r").cast("int").alias("r"),
        F.col("f").cast("int").alias("f"),
        F.col("m").cast("int").alias("m"),
        F.concat(
            F.col("r").cast("string"),
            F.col("f").cast("string"),
            F.col("m").cast("string"),
        ).alias("segment"),
        "n_customers",
        "avg_monetary",
    )

# ==== from analytics_r4m ===========================================

@register(
    "q_agg_lift_curve",
    oracle="""
        WITH scored AS (
            SELECT doc_id,
                   n_chars AS score,
                   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS positive,
                   ntile(10) OVER (ORDER BY n_chars DESC, doc_id) AS decile
            FROM documents
        ),
        d AS (
            SELECT decile,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(positive) AS BIGINT) AS pos
            FROM scored GROUP BY decile
        ),
        c AS (
            SELECT decile, n, pos,
                   CAST(SUM(pos) OVER w AS BIGINT) AS cum_pos,
                   CAST(SUM(n) OVER w AS BIGINT) AS cum_n,
                   CAST(SUM(pos) OVER () AS BIGINT) AS total_pos,
                   CAST(SUM(n) OVER () AS BIGINT) AS total_n
            FROM d
            WINDOW w AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)
        )
        SELECT CAST(decile AS INT) AS decile, n, pos,
               ROUND(CAST(cum_pos AS DOUBLE) / total_pos, 6)
                   AS cum_capture,
               ROUND((CAST(cum_pos AS DOUBLE) / total_pos)
                     / (CAST(cum_n AS DOUBLE) / total_n), 6) AS cum_lift
        FROM c
    """,
    section="A51",
    doc="Cumulative gains / lift curve for a ranking score: documents "
    "ranked into deciles by the score (n_chars standing in for a "
    "model score; positives = English docs), per-decile positive "
    "counts, cumulative capture rate, and cumulative lift vs random "
    "targeting — the ranking-model evaluation a single "
    "precision/recall point (V12, L14) can't show: WHERE on the "
    "ranked list the positives concentrate, which is what targeting "
    "and curation budgets act on. Deciles via ntile ordered by "
    "(score, doc_id) — exact; collapses to 10 rows; fixed sketch "
    "cutoffs replace the global sort at scale (A50's rule).",
)
def q_agg_lift_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # Scale note (r6): NTILE(10) from the distributed global row number —
    # no single-partition window over the corpus.
    from ai_to_cvent_etl_spark.operators.ranking import (
        global_row_number,
        ntile_from_rn,
    )

    nd_ = docs.agg(F.count(F.lit(1)).alias("__n"))
    scored = (
        global_row_number(
            docs.select("doc_id", "lang", "n_chars"),
            [F.desc("n_chars"), F.asc("doc_id")],
            out_col="_grn",
        )
        .crossJoin(F.broadcast(nd_))
        .select(
            "doc_id",
            F.when(F.col("lang") == "en", 1).otherwise(0).alias("positive"),
            ntile_from_rn(F.col("_grn"), F.col("__n"), 10)
            .cast("int")
            .alias("decile"),
        )
    )
    d = scored.groupBy("decile").agg(
        F.count("*").alias("n"), F.sum("positive").alias("pos")
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    c = d.select(
        "decile",
        "n",
        "pos",
        F.sum("pos").over(w).alias("cum_pos"),
        F.sum("n").over(w).alias("cum_n"),
        F.sum("pos").over(wall).alias("total_pos"),
        F.sum("n").over(wall).alias("total_n"),
    )
    return c.select(
        F.col("decile").cast("int").alias("decile"),
        "n",
        "pos",
        F.round(
            F.col("cum_pos").cast("double") / F.col("total_pos"), 6
        ).alias("cum_capture"),
        F.round(
            (F.col("cum_pos").cast("double") / F.col("total_pos"))
            / (F.col("cum_n").cast("double") / F.col("total_n")),
            6,
        ).alias("cum_lift"),
    )

# ==== from analytics_r4o ===========================================

@register(
    "q_agg_churn_transitions",
    oracle="""
        WITH cm AS (
            SELECT DISTINCT o_custkey AS ck,
                   (date_part('year', o_orderdate) - 1995) * 12
                   + date_part('month', o_orderdate) - 1 AS m
            FROM orders
        ),
        flagged AS (
            SELECT ck, m,
                   lag(m) OVER w AS prev_m,
                   lead(m) OVER w AS next_m,
                   CAST(MAX(m) OVER () AS BIGINT) AS horizon
            FROM cm
            WINDOW w AS (PARTITION BY ck ORDER BY m)
        )
        SELECT CAST(m AS BIGINT) AS month,
               CAST(SUM(CASE WHEN prev_m IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_new,
               CAST(SUM(CASE WHEN prev_m = m - 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_retained,
               CAST(SUM(CASE WHEN prev_m IS NOT NULL AND prev_m < m - 1
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_reactivated,
               CAST(SUM(CASE WHEN m < horizon
                             AND (next_m IS NULL OR next_m > m + 1)
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_churning_out
        FROM flagged
        GROUP BY m
    """,
    section="A52",
    doc="Monthly customer lifecycle ledger: distinct customer-months "
    "from the fact table, each classified by the gap to the SAME "
    "customer's previous active month — NEW (no prior), RETAINED "
    "(consecutive), REACTIVATED (gap > 1 month) — plus the churn "
    "outflow (actives whose next active month is not consecutive, "
    "horizon-guarded so the final month never fabricates churn). "
    "new + retained + reactivated = actives per month, and actives(m) "
    "− churning_out(m) + new/reactivated(m+1) reconciles the flow — "
    "the state-transition accounting behind every growth report, "
    "which A15's retention matrix summarizes but cannot decompose. "
    "Pure integer month arithmetic; per-customer windows over their "
    "own active months — one keyed shuffle.",
)
def q_agg_churn_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    mo = (F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate") - 1
    cm = orders.select(
        F.col("o_custkey").alias("ck"), mo.alias("m")
    ).distinct()
    w = Window.partitionBy("ck").orderBy("m")
    wall = Window.partitionBy()
    flagged = cm.select(
        "ck",
        "m",
        F.lag("m").over(w).alias("prev_m"),
        F.lead("m").over(w).alias("next_m"),
        F.max("m").over(wall).alias("horizon"),
    )
    return flagged.groupBy(F.col("m").cast("long").alias("month")).agg(
        F.sum(
            F.when(F.col("prev_m").isNull(), 1).otherwise(0)
        ).alias("n_new"),
        F.sum(
            F.when(F.col("prev_m") == F.col("m") - 1, 1).otherwise(0)
        ).alias("n_retained"),
        F.sum(
            F.when(
                F.col("prev_m").isNotNull()
                & (F.col("prev_m") < F.col("m") - 1),
                1,
            ).otherwise(0)
        ).alias("n_reactivated"),
        F.sum(
            F.when(
                (F.col("m") < F.col("horizon"))
                & (
                    F.col("next_m").isNull()
                    | (F.col("next_m") > F.col("m") + 1)
                ),
                1,
            ).otherwise(0)
        ).alias("n_churning_out"),
    )

# ==== from analytics_r4s ===========================================

@register(
    "q_agg_odds_ratio",
    oracle=f"""
        WITH u AS (
            SELECT user_id,
                   {_H48_USER_DUCK} % 2 AS arm,
                   MAX(CASE WHEN event_type = 'purchase' AND value > 150
                            THEN 1 ELSE 0 END) AS conv
            FROM events GROUP BY user_id
        ),
        cells AS (
            SELECT CAST(SUM(CASE WHEN arm = 0 AND conv = 1 THEN 1 ELSE 0
                        END) AS BIGINT) AS a,
                   CAST(SUM(CASE WHEN arm = 0 AND conv = 0 THEN 1 ELSE 0
                        END) AS BIGINT) AS b,
                   CAST(SUM(CASE WHEN arm = 1 AND conv = 1 THEN 1 ELSE 0
                        END) AS BIGINT) AS c,
                   CAST(SUM(CASE WHEN arm = 1 AND conv = 0 THEN 1 ELSE 0
                        END) AS BIGINT) AS d
            FROM u
        )
        SELECT a, b, c, d,
               ROUND((a + 0.5) * (d + 0.5) / ((b + 0.5) * (c + 0.5)), 4)
                   AS odds_ratio,
               ROUND(exp(ln((a + 0.5) * (d + 0.5)
                            / ((b + 0.5) * (c + 0.5)))
                         - {_Z95} * sqrt(1.0 / (a + 0.5) + 1.0 / (b + 0.5)
                                         + 1.0 / (c + 0.5)
                                         + 1.0 / (d + 0.5))), 4) AS or_lo,
               ROUND(exp(ln((a + 0.5) * (d + 0.5)
                            / ((b + 0.5) * (c + 0.5)))
                         + {_Z95} * sqrt(1.0 / (a + 0.5) + 1.0 / (b + 0.5)
                                         + 1.0 / (c + 0.5)
                                         + 1.0 / (d + 0.5))), 4) AS or_hi
        FROM cells
    """,
    section="A53",
    doc="Odds ratio with the log-OR (Woolf) 95% CI for the 2×2 arm × "
    "converted table (A47's hash-split arms and conversion metric): "
    "OR = ad/bc with the Haldane +0.5 correction keeping zero cells "
    "defined identically on both engines, CI = exp(ln OR ± z·√Σ1/n). "
    "The effect size case-control readouts report — risk-free where "
    "relative risk needs cohort incidence; on the A/A fixture the CI "
    "must cover 1.0, another harness self-check. Exact cells, single "
    "IEEE formulas; collapsed-count arithmetic on A47's reductions.",
)
def q_agg_odds_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 150),
                1,
            ).otherwise(0)
        ).alias("conv")
    ).select((F.expr(_H48_USER) % 2).alias("arm"), "conv")
    cells = u.agg(
        F.sum(
            F.when((F.col("arm") == 0) & (F.col("conv") == 1), 1).otherwise(0)
        ).alias("a"),
        F.sum(
            F.when((F.col("arm") == 0) & (F.col("conv") == 0), 1).otherwise(0)
        ).alias("b"),
        F.sum(
            F.when((F.col("arm") == 1) & (F.col("conv") == 1), 1).otherwise(0)
        ).alias("c"),
        F.sum(
            F.when((F.col("arm") == 1) & (F.col("conv") == 0), 1).otherwise(0)
        ).alias("d"),
    )
    a = F.col("a") + 0.5
    b = F.col("b") + 0.5
    c = F.col("c") + 0.5
    d = F.col("d") + 0.5
    orx = a * d / (b * c)
    se = F.sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)
    return cells.select(
        "a",
        "b",
        "c",
        "d",
        F.round(orx, 4).alias("odds_ratio"),
        F.round(F.exp(F.log(orx) - _Z95 * se), 4).alias("or_lo"),
        F.round(F.exp(F.log(orx) + _Z95 * se), 4).alias("or_hi"),
    )

@register(
    "q_agg_fdr_bh",
    oracle=f"""
        WITH u AS (
            SELECT event_type, user_id,
                   CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))
                        AS BIGINT) % 2 AS arm,
                   MAX(CASE WHEN value > 150 THEN 1 ELSE 0 END) AS conv
            FROM events GROUP BY 1, 2
        ),
        seg AS (
            SELECT event_type,
                   CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n0,
                   CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT)
                       AS c0,
                   CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n1,
                   CAST(SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT)
                       AS c1
            FROM u GROUP BY 1
        ),
        zt AS (
            SELECT *,
                   (c1 / (1.0 * n1) - c0 / (1.0 * n0))
                   / sqrt((c0 + c1) / (1.0 * (n0 + n1))
                          * (1 - (c0 + c1) / (1.0 * (n0 + n1)))
                          * (1.0 / n0 + 1.0 / n1)) AS z
            FROM seg
        ),
        pt AS (
            SELECT *, 2.0 / (1.0 + exp({_LOGI} * abs(z))) AS p
            FROM zt
        ),
        rk AS (
            SELECT *,
                   CAST(ROW_NUMBER() OVER (
                       ORDER BY CAST(FLOOR(abs(z) * 10000) AS BIGINT) DESC,
                                event_type) AS BIGINT) AS rnk,
                   CAST(COUNT(*) OVER () AS BIGINT) AS m
            FROM pt
        ),
        fl AS (
            SELECT *,
                   CASE WHEN ROUND(p, 6) <= ROUND(rnk * {_BH_ALPHA} / m, 6)
                        THEN rnk END AS ok
            FROM rk
        )
        SELECT event_type, n0, c0, n1, c1,
               ROUND(z, 4) AS z,
               ROUND(p, 6) AS p_value,
               rnk AS p_rank,
               ROUND(rnk * {_BH_ALPHA} / m, 6) AS bh_threshold,
               rnk <= COALESCE(MAX(ok) OVER (), 0) AS rejected
        FROM fl
    """,
    section="A54",
    doc="Benjamini-Hochberg FDR correction across the per-event-type "
    "two-proportion tests (alpha=0.10): per segment a hash-split A/A "
    "arm assignment (A47/A53's md5 device) and per-user conversion "
    "give exact integer 2x2 counts and a pooled z; the BH step-up "
    "orders p ascending (implemented as |z| QUANTIZED at 1e4 "
    "descending — the monotone-equivalent INTEGER sort key, immune to "
    "cross-engine exp() ulps), finds the largest rank k with "
    "p_(k) <= k/m*alpha, and rejects ranks <= k. The p-value is the "
    "logistic approximation 2/(1+exp(1.702|z|)) (|err| < 0.01 vs the "
    "normal two-sided p — BH consumes any monotone p-proxy "
    "identically in both engines; documented, deterministic, no erf "
    "dependency). The flag compares 6dp-ROUNDED p against the 6dp-"
    "ROUNDED threshold in both engines; residual boundary-flip risk "
    "is the documented rule-10 flake budget. On this A/A fixture "
    "rejections should be (and are) empty — the null-calibration "
    "self-check. Scale: one keyed agg to per-(segment,user) rows, one "
    "to per-segment rows (m rows), then windows over m<=5 rows on the "
    "driver-side-sized tail — the heavy lifting is all map-side "
    "combinable integer counting.",
)
def q_agg_fdr_bh(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    arm = (
        F.expr(
            "cast(conv(substr(md5(cast(user_id as string)), 1, 12), 16, 10) "
            "as bigint)"
        )
        % 2
    )
    u = (
        ev.groupBy("event_type", "user_id")
        .agg(F.max(F.when(F.col("value") > 150, 1).otherwise(0)).alias("conv"))
        .select("event_type", arm.alias("arm"), "conv")
    )
    seg = u.groupBy("event_type").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n0"),
        F.sum(F.when(F.col("arm") == 0, F.col("conv")).otherwise(0))
        .cast("bigint")
        .alias("c0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("arm") == 1, F.col("conv")).otherwise(0))
        .cast("bigint")
        .alias("c1"),
    )
    pp = (F.col("c0") + F.col("c1")) / (1.0 * (F.col("n0") + F.col("n1")))
    z = (
        F.col("c1") / (1.0 * F.col("n1")) - F.col("c0") / (1.0 * F.col("n0"))
    ) / F.sqrt(pp * (1 - pp) * (1.0 / F.col("n0") + 1.0 / F.col("n1")))
    zt = seg.withColumn("z", z).withColumn(
        "p", 2.0 / (1.0 + F.exp(_LOGI * F.abs(F.col("z"))))
    )
    wall = Window.partitionBy()
    rnk = F.row_number().over(
        wall.orderBy(
            F.floor(F.abs(F.col("z")) * 10000).cast("bigint").desc(),
            F.col("event_type").asc(),
        )
    ).cast("bigint")
    rk = zt.withColumn("rnk", rnk).withColumn(
        "m", F.count(F.lit(1)).over(wall).cast("bigint")
    )
    fl = rk.withColumn(
        "ok",
        F.when(
            F.round(F.col("p"), 6)
            <= F.round(F.col("rnk") * _BH_ALPHA / F.col("m"), 6),
            F.col("rnk"),
        ),
    )
    return fl.select(
        "event_type",
        "n0",
        "c0",
        "n1",
        "c1",
        F.round("z", 4).alias("z"),
        F.round("p", 6).alias("p_value"),
        F.col("rnk").alias("p_rank"),
        F.round(F.col("rnk") * _BH_ALPHA / F.col("m"), 6).alias(
            "bh_threshold"
        ),
        (
            F.col("rnk")
            <= F.coalesce(F.max("ok").over(wall), F.lit(0))
        ).alias("rejected"),
    )

@register(
    "q_agg_js_divergence",
    oracle="""
        WITH b AS (
            SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                       // 50000 AS bin,
                   CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                        AS BIGINT) AS a,
                   CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END)
                        AS BIGINT) AS c
            FROM lineitem
            WHERE l_returnflag IN ('R', 'A')
            GROUP BY 1
        ),
        tot AS (
            SELECT CAST(SUM(a) AS BIGINT) AS na, CAST(SUM(c) AS BIGINT) AS nc,
                   CAST(COUNT(*) AS BIGINT) AS n_bins
            FROM b
        ),
        terms AS (
            SELECT n_bins, na, nc,
                   a / (1.0 * na) AS p, c / (1.0 * nc) AS q
            FROM b CROSS JOIN tot
        ),
        qterms AS (
            SELECT n_bins, na, nc,
                   CAST(FLOOR(1e9 * (
                       (CASE WHEN p > 0
                             THEN p * ln(2 * p / (p + q)) ELSE 0 END)
                     + (CASE WHEN q > 0
                             THEN q * ln(2 * q / (p + q)) ELSE 0 END)
                   )) AS BIGINT) AS jsq,
                   CAST(FLOOR(1e9 * sqrt(p * q)) AS BIGINT) AS bcq
            FROM terms
        )
        SELECT n_bins, na AS n_r, nc AS n_a,
               ROUND(SUM(jsq) / 2e9, 4) AS jsd_nats,
               ROUND(sqrt(GREATEST(0, 1 - SUM(bcq) / 1e9)), 4) AS hellinger
        FROM qterms
        GROUP BY n_bins, na, nc
    """,
    section="A55",
    doc="Jensen-Shannon divergence + Hellinger distance between the "
    "l_extendedprice distributions of returnflag R vs A, binned on "
    "exact integer 500-currency-unit cells (cents DIV 50000 — the "
    "dec2 device makes the bin id exact). Complements PSI (E19, "
    "unbounded, asymmetric-ish) and binned KS (A28, max-statistic): "
    "JSD is the bounded symmetric f-divergence LLM data work uses for "
    "corpus-mixture drift. Per-bin terms are row-local doubles "
    "QUANTIZED to integer nano-nats (FLOOR at 1e9) and summed as "
    "BIGINTs — the TS21 device: the cross-row float sum is exact and "
    "order-free, cross-engine ln/sqrt ulp differences can flip a term "
    "by 1e-9 at a floor boundary, invisible at the 4dp output "
    "rounding (documented §5.3 rule-10 flake budget). 0·ln0 handled "
    "by explicit CASE on exact integer counts. Scale: ONE map-side-"
    "combinable agg to ~bins rows (bin count is bounded by the value "
    "domain, not the row count), then scalar arithmetic — the "
    "statistic collapses before any wide stage.",
)
def q_agg_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    b = (
        li.filter(F.col("l_returnflag").isin("R", "A"))
        .select(
            F.expr(
                "cast(cast(l_extendedprice as decimal(18,2)) * 100 as bigint)"
                " div 50000"
            ).alias("bin"),
            "l_returnflag",
        )
        .groupBy("bin")
        .agg(
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("bigint")
            .alias("a"),
            F.sum(F.when(F.col("l_returnflag") == "A", 1).otherwise(0))
            .cast("bigint")
            .alias("c"),
        )
    )
    tot = b.agg(
        F.sum("a").cast("bigint").alias("na"),
        F.sum("c").cast("bigint").alias("nc"),
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
    )
    terms = b.crossJoin(F.broadcast(tot)).select(
        "n_bins",
        "na",
        "nc",
        (F.col("a") / (1.0 * F.col("na"))).alias("p"),
        (F.col("c") / (1.0 * F.col("nc"))).alias("q"),
    )
    qterms = terms.select(
        "n_bins",
        "na",
        "nc",
        F.floor(
            1e9
            * (
                F.when(
                    F.col("p") > 0,
                    F.col("p")
                    * F.log(2 * F.col("p") / (F.col("p") + F.col("q"))),
                ).otherwise(0.0)
                + F.when(
                    F.col("q") > 0,
                    F.col("q")
                    * F.log(2 * F.col("q") / (F.col("p") + F.col("q"))),
                ).otherwise(0.0)
            )
        )
        .cast("bigint")
        .alias("jsq"),
        F.floor(1e9 * F.sqrt(F.col("p") * F.col("q")))
        .cast("bigint")
        .alias("bcq"),
    )
    return qterms.groupBy("n_bins", "na", "nc").agg(
        F.round(F.sum("jsq") / 2e9, 4).alias("jsd_nats"),
        F.round(
            F.sqrt(F.greatest(F.lit(0.0), 1 - F.sum("bcq") / 1e9)), 4
        ).alias("hellinger"),
    ).select(
        "n_bins",
        F.col("na").alias("n_r"),
        F.col("nc").alias("n_a"),
        "jsd_nats",
        "hellinger",
    )

@register(
    "q_agg_poisson_bootstrap",
    oracle=f"""
        WITH reps AS (SELECT CAST(r.range AS BIGINT) AS b FROM range({_BOOT_B}) r),
        seeds AS (
            SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                       AS cents,
                   CAST(('0x' || substr(h, 1, 12)) AS BIGINT) % {_POIS1_P}
                       AS sa,
                   CAST(('0x' || substr(h, 13, 12)) AS BIGINT) % {_POIS1_P}
                       AS sc
            FROM (SELECT l_extendedprice,
                         md5(CAST(l_orderkey AS VARCHAR) || '-'
                             || CAST(l_linenumber AS VARCHAR)) AS h
                  FROM lineitem)
        ),
        drawn AS (
            SELECT b, cents,
                   {_boot_w("((sa + b * sc) % " + str(_POIS1_P) + ")")} AS w
            FROM seeds CROSS JOIN reps
        ),
        means AS (
            SELECT b, SUM(w * cents) / (1.0 * SUM(w)) AS m
            FROM drawn GROUP BY b
        ),
        ranked AS (
            SELECT m, ROW_NUMBER() OVER (ORDER BY m, b) AS rk FROM means
        ),
        pt AS (
            SELECT SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                            AS BIGINT)) / (1.0 * COUNT(*)) AS pm
            FROM lineitem
        )
        SELECT CAST({_BOOT_B} AS BIGINT) AS n_boot,
               ROUND((SELECT pm FROM pt), 4) AS point_mean_cents,
               ROUND(MAX(CASE WHEN rk = 2 THEN m END), 4) AS ci_lo_cents,
               ROUND(MAX(CASE WHEN rk = {_BOOT_B - 1} THEN m END), 4)
                   AS ci_hi_cents
        FROM ranked
    """,
    section="A56",
    doc="Poisson bootstrap confidence interval for the mean line price: "
    "each of B=32 resamples assigns every row an INDEPENDENT Poisson(1) "
    "weight drawn deterministically against exact integer CDF "
    "thresholds from ONE md5 per row: the 128-bit digest yields two "
    "48-bit seeds (a, c) and replica b draws u_b = (a + b*c) mod p "
    "with p = 2^48-59 PRIME — marginally uniform and pairwise "
    "independent across replicas (affine family over a prime field), "
    "the independence bootstrap variance needs, at 1/32nd of the "
    "per-(row,replica) hashing cost (measured 21 s -> ~2 s at sf0.1). "
    "This is the "
    "bootstrap formulation that actually works on massive data "
    "(classical resampling needs n draws WITH replacement = a global "
    "shuffle per replica; Poisson weights are ROW-LOCAL, one pass for "
    "all B replicas, which is why it is the standard at web scale). "
    "CI = 2nd/31st order statistics of the replica means (~93.75% "
    "coverage, documented). Determinism: weights are exact integer "
    "hash-threshold comparisons (no float RNG anywhere); each replica "
    "mean is one BIGINT/BIGINT division; ranking ties break on the "
    "replica id. Scale: the whole computation is ONE map stage "
    "(explode B per row, all weights row-local) feeding ONE "
    "B-key map-side-combinable agg — B·n rows on the wire collapse to "
    "B partials per task; no resample materialization, no shuffle of "
    "data rows.",
)
def q_agg_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    seeds = li.select(
        F.expr(
            "cast(cast(l_extendedprice as decimal(18,2)) * 100 as bigint)"
        ).alias("cents"),
        F.expr(
            "md5(concat(cast(l_orderkey as string), '-', "
            "cast(l_linenumber as string)))"
        ).alias("h"),
    ).select(
        "cents",
        F.expr(
            f"cast(conv(substr(h, 1, 12), 16, 10) as bigint) % {_POIS1_P}"
        ).alias("sa"),
        F.expr(
            f"cast(conv(substr(h, 13, 12), 16, 10) as bigint) % {_POIS1_P}"
        ).alias("sc"),
    )
    w_expr = _boot_w(f"((sa + b * sc) % {_POIS1_P})")
    drawn = seeds.select(
        "cents",
        "sa",
        "sc",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
    ).select("b", "cents", F.expr(w_expr).alias("w"))
    means = drawn.groupBy("b").agg(
        (F.sum(F.col("w") * F.col("cents")) / (1.0 * F.sum("w"))).alias("m")
    )
    ranked = means.withColumn(
        "rk", F.row_number().over(Window.orderBy(F.col("m").asc(), F.col("b").asc()))
    )
    pt = li.agg(
        (
            F.sum(
                F.expr(
                    "cast(cast(l_extendedprice as decimal(18,2)) * 100 "
                    "as bigint)"
                )
            )
            / (1.0 * F.count(F.lit(1)))
        ).alias("pm")
    )
    return (
        ranked.agg(
            F.round(F.max(F.when(F.col("rk") == 2, F.col("m"))), 4).alias(
                "ci_lo_cents"
            ),
            F.round(
                F.max(F.when(F.col("rk") == _BOOT_B - 1, F.col("m"))), 4
            ).alias("ci_hi_cents"),
        )
        .crossJoin(F.broadcast(pt))
        .select(
            F.lit(_BOOT_B).cast("bigint").alias("n_boot"),
            F.round(F.col("pm"), 4).alias("point_mean_cents"),
            "ci_lo_cents",
            "ci_hi_cents",
        )
    )

@register(
    "q_agg_mcnemar",
    oracle="""
        WITH preds AS (
            SELECT event_type = 'purchase' AS truth,
                   value > 150 AS pred_a,
                   CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 12))
                        AS BIGINT) % 2 = 0 AS pred_b
            FROM events
        ),
        cells AS (
            SELECT CAST(SUM(CASE WHEN (pred_a = truth) AND (pred_b = truth)
                                 THEN 1 ELSE 0 END) AS BIGINT) AS both_right,
                   CAST(SUM(CASE WHEN (pred_a = truth) AND (pred_b <> truth)
                                 THEN 1 ELSE 0 END) AS BIGINT) AS only_a,
                   CAST(SUM(CASE WHEN (pred_a <> truth) AND (pred_b = truth)
                                 THEN 1 ELSE 0 END) AS BIGINT) AS only_b,
                   CAST(SUM(CASE WHEN (pred_a <> truth) AND (pred_b <> truth)
                                 THEN 1 ELSE 0 END) AS BIGINT) AS both_wrong
            FROM preds
        )
        SELECT both_right, only_a, only_b, both_wrong,
               ROUND((abs(only_a - only_b) - 1)
                     * (abs(only_a - only_b) - 1)
                     / (1.0 * (only_a + only_b)), 4) AS mcnemar_chi2,
               (abs(only_a - only_b) - 1) * (abs(only_a - only_b) - 1)
                   / (1.0 * (only_a + only_b)) > 3.841 AS significant
        FROM cells
    """,
    section="A57",
    doc="McNemar's paired test comparing two classifiers on the SAME "
    "examples — THE test for 'is eval candidate B actually better than "
    "A' (paired discordant counts, not two independent proportions: "
    "A19's two-proportion z is WRONG for shared eval sets because the "
    "per-example outcomes are correlated). Truth = event is a "
    "purchase; classifier A thresholds value, classifier B is a "
    "deterministic hash coin (the null baseline). Statistic = "
    "(|b-c|-1)²/(b+c) with continuity correction on the discordant "
    "cells, thresholded at the chi-square(1) 5% critical value 3.841. "
    "Exact integer cells, ONE final division (§5.3 rule 10 by "
    "construction). Scale: one map-side-combinable 4-cell reduction — "
    "collapses to a single row before any wide stage.",
)
def q_agg_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    preds = ev.select(
        (F.col("event_type") == "purchase").alias("truth"),
        (F.col("value") > 150).alias("pred_a"),
        (
            F.expr(
                "cast(conv(substr(md5(cast(event_id as string)), 1, 12), "
                "16, 10) as bigint)"
            )
            % 2
            == 0
        ).alias("pred_b"),
    )
    cells = preds.agg(
        F.sum(
            F.when(
                (F.col("pred_a") == F.col("truth"))
                & (F.col("pred_b") == F.col("truth")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("both_right"),
        F.sum(
            F.when(
                (F.col("pred_a") == F.col("truth"))
                & (F.col("pred_b") != F.col("truth")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("only_a"),
        F.sum(
            F.when(
                (F.col("pred_a") != F.col("truth"))
                & (F.col("pred_b") == F.col("truth")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("only_b"),
        F.sum(
            F.when(
                (F.col("pred_a") != F.col("truth"))
                & (F.col("pred_b") != F.col("truth")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("both_wrong"),
    )
    d = F.abs(F.col("only_a") - F.col("only_b")) - 1
    chi2 = d * d / (1.0 * (F.col("only_a") + F.col("only_b")))
    return cells.select(
        "both_right",
        "only_a",
        "only_b",
        "both_wrong",
        F.round(chi2, 4).alias("mcnemar_chi2"),
        (chi2 > 3.841).alias("significant"),
    )

@register(
    "q_agg_auc_roc",
    oracle="""
        WITH s AS (
            SELECT CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
                       AS cents,
                   CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1
                                 ELSE 0 END) AS BIGINT) AS np,
                   CAST(SUM(CASE WHEN event_type = 'purchase' THEN 0
                                 ELSE 1 END) AS BIGINT) AS nn
            FROM events
            GROUP BY 1
        ),
        c AS (
            SELECT np, nn,
                   CAST(COALESCE(SUM(nn) OVER (
                       ORDER BY cents
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS cum_neg_below
            FROM s
        ),
        t AS (
            SELECT CAST(SUM(np) AS BIGINT) AS p,
                   CAST(SUM(nn) AS BIGINT) AS n,
                   CAST(SUM(np * (2 * cum_neg_below + nn)) AS BIGINT)
                       AS num2,
                   CAST(COUNT(*) AS BIGINT) AS n_scores
            FROM c
        )
        SELECT p AS n_pos, n AS n_neg, n_scores,
               ROUND(num2 / (2.0 * p * n), 6) AS auc
        FROM t
    """,
    section="A58",
    doc="Exact AUC-ROC of the value score against the purchase label — "
    "THE ranking metric for scorer/filter evaluation (A37's "
    "Mann-Whitney U is its test-statistic sibling; this emits the "
    "metric itself). Computed WITHOUT a global row sort: rows collapse "
    "to per-distinct-score (pos, neg) counts first, then "
    "AUC = P(score_pos > score_neg) + 0.5 P(tie) = "
    "Σ np(s)·(2·cumneg(<s) + nn(s)) / 2PN over the ORDERED DISTINCT "
    "SCORES — an exact BIGINT numerator (ties handled by the +nn/2 "
    "term without fractional ranks) and ONE final division. Scale: "
    "the heavy stage is a map-side-combinable count agg on the score "
    "key; the ordered cumulative runs over DISTINCT VALUES (bounded "
    "by the 2dp value domain, ~50k cells, NOT row count) — the "
    "classic grouped-ROC device that makes AUC computable on "
    "billions of rows where rank-the-rows would need a global sort.",
)
def q_agg_auc_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    s = ev.groupBy(
        F.expr("cast(cast(value as decimal(12,2)) * 100 as bigint)").alias(
            "cents"
        )
    ).agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("np"),
        F.sum(F.when(F.col("event_type") == "purchase", 0).otherwise(1))
        .cast("bigint")
        .alias("nn"),
    )
    w = (
        Window.orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = s.withColumn(
        "cum_neg_below",
        F.coalesce(F.sum("nn").over(w), F.lit(0)).cast("bigint"),
    )
    t = c.agg(
        F.sum("np").cast("bigint").alias("p"),
        F.sum("nn").cast("bigint").alias("n"),
        F.sum(
            F.col("np") * (2 * F.col("cum_neg_below") + F.col("nn"))
        )
        .cast("bigint")
        .alias("num2"),
        F.count(F.lit(1)).cast("bigint").alias("n_scores"),
    )
    return t.select(
        F.col("p").alias("n_pos"),
        F.col("n").alias("n_neg"),
        "n_scores",
        F.round(F.col("num2") / (2.0 * F.col("p") * F.col("n")), 6).alias(
            "auc"
        ),
    )

@register(
    "q_agg_ece",
    oracle=f"""
        WITH p AS (
            SELECT LEAST(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT),
                         {_ECE_CAP}) AS capped,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                       AS truth
            FROM events
        ),
        b AS (
            SELECT LEAST(capped // {_ECE_CAP // 10}, 9) AS bin,
                   CAST(COUNT(*) AS BIGINT) AS n_b,
                   CAST(SUM(truth) AS BIGINT) AS pos_b,
                   CAST(SUM(capped) AS BIGINT) AS conf_sum
            FROM p GROUP BY 1
        ),
        e AS (
            SELECT bin, n_b, pos_b,
                   pos_b / (1.0 * n_b) AS acc,
                   conf_sum / ({_ECE_CAP}.0 * n_b) AS conf,
                   CAST(SUM(n_b) OVER () AS BIGINT) AS nn
            FROM b
        ),
        q AS (
            SELECT bin, n_b, acc, conf,
                   CAST(FLOOR(1e9 * n_b * abs(acc - conf) / nn) AS BIGINT)
                       AS term
            FROM e
        )
        SELECT bin, n_b,
               ROUND(acc, 6) AS accuracy,
               ROUND(conf, 6) AS confidence,
               ROUND(SUM(term) OVER () / 1e9, 4) AS ece
        FROM q
    """,
    section="A59",
    doc=f"Expected calibration error of a score used as a purchase-"
    "probability estimate: confidence = capped value / {0} (a LINEAR "
    "deterministic score — an exact rational, so the decile bin id is "
    "pure integer division, no libm in the binning), per-bin accuracy "
    "vs mean confidence, ECE = Σ (n_b/N)·|acc_b − conf_b|. THE "
    "calibration diagnostic for LLM-judge/filter scores — a scorer "
    "can have good AUC (A58) and terrible calibration, and "
    "temperature-scaling decisions hang on exactly this table. "
    "Per-bin ratios are single divisions of exact BIGINTs; the "
    "cross-bin sum is floor-quantized to nano-units (TS21 device). "
    "Emits the full reliability-diagram table (bin, n, acc, conf) "
    "with the scalar ECE repeated per row (G12's device). Scale: one "
    "map-side-combinable agg onto 10 bins — collapses immediately; "
    "the window over 10 rows is trivial.".format(_ECE_CAP),
)
def q_agg_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    p = ev.select(
        F.least(
            F.expr("cast(cast(value as decimal(12,2)) * 100 as bigint)"),
            F.lit(_ECE_CAP),
        ).alias("capped"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "truth"
        ),
    )
    b = p.groupBy(
        F.least(
            F.expr(f"capped div {_ECE_CAP // 10}"), F.lit(9)
        ).alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_b"),
        F.sum("truth").cast("bigint").alias("pos_b"),
        F.sum("capped").cast("bigint").alias("conf_sum"),
    )
    wall = Window.partitionBy()
    e = b.select(
        "bin",
        "n_b",
        (F.col("pos_b") / (1.0 * F.col("n_b"))).alias("acc"),
        (F.col("conf_sum") / (float(_ECE_CAP) * F.col("n_b"))).alias("conf"),
        F.sum("n_b").over(wall).cast("bigint").alias("nn"),
    )
    q = e.select(
        "bin",
        "n_b",
        "acc",
        "conf",
        F.floor(
            1e9 * F.col("n_b") * F.abs(F.col("acc") - F.col("conf")) / F.col("nn")
        )
        .cast("bigint")
        .alias("term"),
    )
    return q.select(
        "bin",
        "n_b",
        F.round("acc", 6).alias("accuracy"),
        F.round("conf", 6).alias("confidence"),
        F.round(F.sum("term").over(wall) / 1e9, 4).alias("ece"),
    )

@register(
    "q_agg_tost_equivalence",
    oracle=f"""
        WITH r AS (
            SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))
                        AS BIGINT) % 2 AS arm,
                   CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS x
            FROM events
        ),
        m AS (
            SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n0,
                   CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n1,
                   CAST(SUM(CASE WHEN arm = 0 THEN x ELSE 0 END) AS BIGINT)
                       AS s0,
                   CAST(SUM(CASE WHEN arm = 1 THEN x ELSE 0 END) AS BIGINT)
                       AS s1,
                   CAST(SUM(CASE WHEN arm = 0 THEN x * x ELSE 0 END)
                        AS BIGINT) AS q0,
                   CAST(SUM(CASE WHEN arm = 1 THEN x * x ELSE 0 END)
                        AS BIGINT) AS q1
            FROM r
        ),
        d AS (
            SELECT n0, n1,
                   s0 / (1.0 * n0) AS mean0,
                   s1 / (1.0 * n1) AS mean1,
                   s1 / (1.0 * n1) - s0 / (1.0 * n0) AS diff,
                   sqrt((n0 * CAST(q0 AS DOUBLE) - CAST(s0 AS DOUBLE) * s0)
                            / (1.0 * n0 * n0 * (n0 - 1))
                        + (n1 * CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1)
                            / (1.0 * n1 * n1 * (n1 - 1))) AS se
            FROM m
        )
        SELECT n0, n1,
               ROUND(mean0, 4) AS mean0_cents,
               ROUND(mean1, 4) AS mean1_cents,
               ROUND(diff, 4) AS diff_cents,
               ROUND(se, 4) AS se_cents,
               ROUND((diff + {_TOST_MARGIN}) / se, 4) AS t_lower,
               ROUND((diff - {_TOST_MARGIN}) / se, 4) AS t_upper,
               (diff + {_TOST_MARGIN}) / se > {_TOST_Z}
                   AND (diff - {_TOST_MARGIN}) / se < -{_TOST_Z}
                   AS equivalent
        FROM d
    """,
    section="A60",
    doc=f"TOST equivalence test (two one-sided tests) on the hash-split "
    f"A/A arms: is the mean event value PROVABLY within ±{_TOST_MARGIN} "
    "cents between arms? A non-significant Welch t (A13) is NOT "
    "evidence of equivalence — absence of evidence; TOST inverts the "
    "burden: both one-sided statistics must clear the 5% critical "
    "value, i.e. the 90% CI must sit inside the margin. The standard "
    "non-inferiority readout for 'did this infra change alter the "
    "metric'. On the A/A fixture equivalence must hold — a null-"
    "calibration self-check. Welch SE from six exact BIGINT moments "
    "(cents and cents² sums; the variance combination runs in DOUBLE "
    "per the TS23 width rule), two fixed formulas, ROUND at the end. "
    "Scale: one map-side-combinable 6-moment reduction; collapses to "
    "one row before anything wide.",
)
def q_agg_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    r = ev.select(
        (
            F.expr(
                "cast(conv(substr(md5(cast(user_id as string)), 1, 12), "
                "16, 10) as bigint)"
            )
            % 2
        ).alias("arm"),
        F.expr("cast(cast(value as decimal(12,2)) * 100 as bigint)").alias(
            "x"
        ),
    )
    m = r.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("arm") == 0, F.col("x")).otherwise(0))
        .cast("bigint")
        .alias("s0"),
        F.sum(F.when(F.col("arm") == 1, F.col("x")).otherwise(0))
        .cast("bigint")
        .alias("s1"),
        F.sum(F.when(F.col("arm") == 0, F.col("x") * F.col("x")).otherwise(0))
        .cast("bigint")
        .alias("q0"),
        F.sum(F.when(F.col("arm") == 1, F.col("x") * F.col("x")).otherwise(0))
        .cast("bigint")
        .alias("q1"),
    )
    mean0 = F.col("s0") / (1.0 * F.col("n0"))
    mean1 = F.col("s1") / (1.0 * F.col("n1"))
    diff = mean1 - mean0
    se = F.sqrt(
        (
            F.col("n0") * F.col("q0").cast("double")
            - F.col("s0").cast("double") * F.col("s0")
        )
        / (1.0 * F.col("n0") * F.col("n0") * (F.col("n0") - 1))
        + (
            F.col("n1") * F.col("q1").cast("double")
            - F.col("s1").cast("double") * F.col("s1")
        )
        / (1.0 * F.col("n1") * F.col("n1") * (F.col("n1") - 1))
    )
    return m.select(
        "n0",
        "n1",
        F.round(mean0, 4).alias("mean0_cents"),
        F.round(mean1, 4).alias("mean1_cents"),
        F.round(diff, 4).alias("diff_cents"),
        F.round(se, 4).alias("se_cents"),
        F.round((diff + _TOST_MARGIN) / se, 4).alias("t_lower"),
        F.round((diff - _TOST_MARGIN) / se, 4).alias("t_upper"),
        (
            ((diff + _TOST_MARGIN) / se > _TOST_Z)
            & ((diff - _TOST_MARGIN) / se < -_TOST_Z)
        ).alias("equivalent"),
    )

@register(
    "q_agg_delta_method_ratio",
    oracle=f"""
        WITH u AS (
            SELECT user_id,
                   CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))
                        AS BIGINT) % 2 AS arm,
                   CAST(SUM(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT)
                       AS y,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        ),
        a0 AS ({_delta_arm_sql(0)}),
        a1 AS ({_delta_arm_sql(1)}),
        d AS (
            SELECT a0.m AS m0, a1.m AS m1,
                   CAST(a0.sy AS DOUBLE) / a0.sn AS r0,
                   CAST(a1.sy AS DOUBLE) / a1.sn AS r1,
                   ((a0.m * CAST(a0.syy AS DOUBLE) - CAST(a0.sy AS DOUBLE) * a0.sy)
                    - 2 * (CAST(a0.sy AS DOUBLE) / a0.sn)
                        * (a0.m * CAST(a0.syn AS DOUBLE) - CAST(a0.sy AS DOUBLE) * a0.sn)
                    + (CAST(a0.sy AS DOUBLE) / a0.sn) * (CAST(a0.sy AS DOUBLE) / a0.sn)
                        * (a0.m * CAST(a0.snn AS DOUBLE) - CAST(a0.sn AS DOUBLE) * a0.sn))
                   / (a0.m * (a0.m - 1.0))
                   / (a0.m * (CAST(a0.sn AS DOUBLE) / a0.m)
                      * (CAST(a0.sn AS DOUBLE) / a0.m)) AS v0,
                   ((a1.m * CAST(a1.syy AS DOUBLE) - CAST(a1.sy AS DOUBLE) * a1.sy)
                    - 2 * (CAST(a1.sy AS DOUBLE) / a1.sn)
                        * (a1.m * CAST(a1.syn AS DOUBLE) - CAST(a1.sy AS DOUBLE) * a1.sn)
                    + (CAST(a1.sy AS DOUBLE) / a1.sn) * (CAST(a1.sy AS DOUBLE) / a1.sn)
                        * (a1.m * CAST(a1.snn AS DOUBLE) - CAST(a1.sn AS DOUBLE) * a1.sn))
                   / (a1.m * (a1.m - 1.0))
                   / (a1.m * (CAST(a1.sn AS DOUBLE) / a1.m)
                      * (CAST(a1.sn AS DOUBLE) / a1.m)) AS v1
            FROM a0 CROSS JOIN a1
        )
        SELECT m0, m1,
               ROUND(r0, 4) AS ratio0_cents,
               ROUND(r1, 4) AS ratio1_cents,
               ROUND(sqrt(v0), 6) AS se0,
               ROUND(sqrt(v1), 6) AS se1,
               ROUND((r1 - r0) / sqrt(v0 + v1), 4) AS z,
               abs((r1 - r0) / sqrt(v0 + v1)) > 1.96 AS significant
        FROM d
    """,
    section="A61",
    doc="Delta-method variance for a RATIO metric (revenue per event) "
    "under user-level randomization — the estimator every large A/B "
    "platform uses for ratio-of-sums metrics: users are the i.i.d. "
    "unit, events inside a user are correlated, so the naive "
    "per-event variance (A13/A19 on events) is WRONG (typically "
    "2-5x too small); Var(Y̅/N̅) ≈ (s_yy − 2R·s_yn + R²·s_nn)/"
    "(m·n̄²) from the per-user (y, n) moment matrix. Six exact "
    "BIGINT moments per arm, DOUBLE combinations per the TS23 width "
    "rule, fixed formula, ROUND at the end; A/A arms ⇒ "
    "significant=false is the null calibration. Scale: one keyed agg "
    "to per-user rows, one 6-moment reduction per arm — collapses "
    "before anything wide; the per-user stage is the same shuffle "
    "A47/A53 already pay.",
)
def q_agg_delta_method_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    u = (
        ev.groupBy("user_id")
        .agg(
            (F.sum(F.col("value").cast(DecimalType(12, 2))) * 100)
            .cast("bigint")
            .alias("y"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        .select(
            (
                F.expr(
                    "cast(conv(substr(md5(cast(user_id as string)), 1, 12), "
                    "16, 10) as bigint)"
                )
                % 2
            ).alias("arm"),
            "y",
            "n",
        )
    )

    # r9 (VERDICT r8 item 1 + guide §2.4): the two per-arm aggregates ran
    # as separate filtered aggregations crossJoined back together — two
    # aggregation passes over the per-user frame plus a join stage. One
    # CASE-pivoted aggregate computes all 12 moments in a single pass
    # (disjoint-subset integer sums — identical values; count ->
    # count_if, null-preserving CASE sums match the filtered sums on the
    # nonempty arms the md5 split guarantees). Expressions built as SQL
    # strings per the r9 batched-construction rewrite.
    aggs = []
    for a in (0, 1):
        aggs += [
            f"cast(count_if(arm = {a}) as bigint) as m{a}",
            f"cast(sum(case when arm = {a} then y end) as bigint) as sy{a}",
            f"cast(sum(case when arm = {a} then n end) as bigint) as sn{a}",
            f"cast(sum(case when arm = {a} then y * y end) as bigint)"
            f" as syy{a}",
            f"cast(sum(case when arm = {a} then n * n end) as bigint)"
            f" as snn{a}",
            f"cast(sum(case when arm = {a} then y * n end) as bigint)"
            f" as syn{a}",
        ]
    d = u.agg(*[F.expr(a) for a in aggs])

    def ratio(a: int) -> str:
        return f"(cast(sy{a} as double) / sn{a})"

    def var(a: int) -> str:
        r = ratio(a)
        cyy = (
            f"(m{a} * cast(syy{a} as double)"
            f" - cast(sy{a} as double) * sy{a})"
        )
        cnn = (
            f"(m{a} * cast(snn{a} as double)"
            f" - cast(sn{a} as double) * sn{a})"
        )
        cyn = (
            f"(m{a} * cast(syn{a} as double)"
            f" - cast(sy{a} as double) * sn{a})"
        )
        nbar = f"(cast(sn{a} as double) / m{a})"
        return (
            f"(({cyy} - 2 * {r} * {cyn} + {r} * {r} * {cnn})"
            f" / (m{a} * (m{a} - 1.0)) / (m{a} * {nbar} * {nbar}))"
        )

    z = f"(({ratio(1)} - {ratio(0)}) / sqrt({var(0)} + {var(1)}))"
    return d.selectExpr(
        "m0",
        "m1",
        f"round({ratio(0)}, 4) as ratio0_cents",
        f"round({ratio(1)}, 4) as ratio1_cents",
        f"round(sqrt({var(0)}), 6) as se0",
        f"round(sqrt({var(1)}), 6) as se1",
        f"round({z}, 4) as z",
        f"abs({z}) > 1.96 as significant",
    )

@register(
    "q_agg_bayes_beta",
    oracle="""
        WITH u AS (
            SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))
                        AS BIGINT) % 2 AS arm,
                   MAX(CASE WHEN event_type = 'purchase' AND value > 150
                            THEN 1 ELSE 0 END) AS conv
            FROM events GROUP BY user_id
        ),
        c AS (
            SELECT arm,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(conv) AS BIGINT) AS k
            FROM u GROUP BY arm
        ),
        p AS (
            SELECT arm, n, k,
                   CAST(k + 1 AS BIGINT) AS alpha,
                   CAST(n - k + 1 AS BIGINT) AS beta,
                   (k + 1) / (n + 2.0) AS post_mean,
                   (k + 1) * (n - k + 1.0)
                       / ((n + 2.0) * (n + 2.0) * (n + 3.0)) AS post_var
            FROM c
        )
        SELECT arm, n, k, alpha, beta,
               ROUND(post_mean, 6) AS posterior_mean,
               ROUND(post_mean - 1.96 * sqrt(post_var), 6) AS cred_lo,
               ROUND(post_mean + 1.96 * sqrt(post_var), 6) AS cred_hi
        FROM p
    """,
    section="A62",
    doc="Beta-Binomial Bayesian conversion readout per arm: with a "
    "uniform Beta(1,1) prior the posterior is Beta(k+1, n-k+1) in "
    "CLOSED FORM — exact integer parameters, posterior mean "
    "(k+1)/(n+2), and a normal-approximation 95% credible interval "
    "from the exact Beta variance (αβ/((α+β)²(α+β+1))). The Bayesian "
    "companion to the frequentist A/B family (A19/A47/A53): "
    "experiment platforms report exactly this posterior table, and "
    "downstream P(p1>p0) Monte Carlo consumes the (α, β) pairs — "
    "emitted here as exact integers so that consumer needs no "
    "re-aggregation. The normal approximation of the interval is the "
    "documented deterministic stand-in for Beta quantiles (no "
    "incomplete-beta in either engine's SQL); error < 1e-3 at these "
    "n. Scale: per-user reduction then a 2-row integer agg — "
    "collapses immediately, map-side combinable.",
)
def q_agg_bayes_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 150),
                1,
            ).otherwise(0)
        ).alias("conv")
    ).select(
        (
            F.expr(
                "cast(conv(substr(md5(cast(user_id as string)), 1, 12), "
                "16, 10) as bigint)"
            )
            % 2
        ).alias("arm"),
        "conv",
    )
    c = u.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("conv").cast("bigint").alias("k"),
    )
    post_mean = (F.col("k") + 1) / (F.col("n") + 2.0)
    post_var = (
        (F.col("k") + 1)
        * (F.col("n") - F.col("k") + 1.0)
        / ((F.col("n") + 2.0) * (F.col("n") + 2.0) * (F.col("n") + 3.0))
    )
    return c.select(
        "arm",
        "n",
        "k",
        (F.col("k") + 1).cast("bigint").alias("alpha"),
        (F.col("n") - F.col("k") + 1).cast("bigint").alias("beta"),
        F.round(post_mean, 6).alias("posterior_mean"),
        F.round(post_mean - 1.96 * F.sqrt(post_var), 6).alias("cred_lo"),
        F.round(post_mean + 1.96 * F.sqrt(post_var), 6).alias("cred_hi"),
    )

@register(
    "q_agg_permutation_test",
    oracle=f"""
        WITH seeds AS (
            SELECT CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100
                              AS BIGINT)) AS BIGINT) AS y,
                   CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))
                        AS BIGINT) % {_POIS1_P} AS sa,
                   CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 13, 12))
                        AS BIGINT) % {_POIS1_P} AS sc
            FROM events GROUP BY user_id
        ),
        reps AS (SELECT CAST(r.range AS BIGINT) AS b FROM range({_PERM_B}) r),
        drawn AS (
            SELECT b, y,
                   ((sa + b * sc) % {_POIS1_P}) % 2 AS arm
            FROM seeds CROSS JOIN reps
        ),
        diffs AS (
            SELECT b,
                   SUM(CASE WHEN arm = 1 THEN y ELSE 0 END)
                       / (1.0 * SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END))
                   - SUM(CASE WHEN arm = 0 THEN y ELSE 0 END)
                       / (1.0 * SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END))
                       AS d
            FROM drawn GROUP BY b
        ),
        obs AS (SELECT d AS d0 FROM diffs WHERE b = 0)
        SELECT CAST({_PERM_B} AS BIGINT) AS n_perms,
               ROUND((SELECT d0 FROM obs), 4) AS diff_obs_cents,
               ROUND((1 + SUM(CASE WHEN b > 0
                                    AND abs(d) >= abs((SELECT d0 FROM obs))
                                   THEN 1 ELSE 0 END))
                     / ({_PERM_B} * 1.0), 6) AS p_value,
               (1 + SUM(CASE WHEN b > 0
                              AND abs(d) >= abs((SELECT d0 FROM obs))
                             THEN 1 ELSE 0 END))
                   / ({_PERM_B} * 1.0) < 0.05 AS reject
        FROM diffs
    """,
    section="A63",
    doc=f"Hash-deterministic permutation test for the difference in mean "
    "per-user revenue between arms: replica b reassigns every user via "
    "the affine draw ((a + b·c) mod p) mod 2 from A56's per-user md5 "
    "seed pair (marginally uniform, pairwise independent across "
    f"replicas over the prime field), b=0 serving as the observed "
    f"assignment and b=1..{_PERM_B - 1} as the permutation null; "
    "p = (1 + #{{|d_b| ≥ |d_obs|}})/B with the +1 finite-sample "
    "correction. The assumption-free significance test — no "
    "normality, no variance formula, the inference IS the shuffle — "
    "made bit-reproducible by replacing the RNG with the hash family "
    "(the G13/A56 seedless-determinism device). Every replica diff "
    "is two BIGINT-ratio divisions; the comparison runs on "
    "identically-computed doubles. Scale: ONE map stage explodes "
    f"B={_PERM_B} affine arms per user row (seeds hashed once), ONE "
    "B-key map-side-combinable agg — the classical permutation "
    "test's B full re-shuffles become zero extra passes over data.",
)
def q_agg_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    seeds = ev.groupBy("user_id").agg(
        F.sum(
            F.expr("cast(cast(value as decimal(12,2)) * 100 as bigint)")
        )
        .cast("bigint")
        .alias("y")
    ).select(
        "y",
        F.expr(
            f"cast(conv(substr(md5(cast(user_id as string)), 1, 12), 16, 10) "
            f"as bigint) % {_POIS1_P}"
        ).alias("sa"),
        F.expr(
            f"cast(conv(substr(md5(cast(user_id as string)), 13, 12), 16, 10) "
            f"as bigint) % {_POIS1_P}"
        ).alias("sc"),
    )
    drawn = seeds.select(
        "y",
        "sa",
        "sc",
        F.explode(F.sequence(F.lit(0), F.lit(_PERM_B - 1))).alias("b"),
    ).select(
        "b", "y", F.expr(f"((sa + b * sc) % {_POIS1_P}) % 2").alias("arm")
    )
    diffs = drawn.groupBy("b").agg(
        (
            F.sum(F.when(F.col("arm") == 1, F.col("y")).otherwise(0))
            / (1.0 * F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)))
            - F.sum(F.when(F.col("arm") == 0, F.col("y")).otherwise(0))
            / (1.0 * F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)))
        ).alias("d")
    )
    obs = diffs.filter(F.col("b") == 0).select(F.col("d").alias("d0"))
    joined = diffs.crossJoin(F.broadcast(obs))
    pv = (
        1
        + F.sum(
            F.when(
                (F.col("b") > 0) & (F.abs(F.col("d")) >= F.abs(F.col("d0"))),
                1,
            ).otherwise(0)
        )
    ) / (_PERM_B * 1.0)
    return joined.groupBy().agg(
        F.lit(_PERM_B).cast("bigint").alias("n_perms"),
        F.round(F.max("d0"), 4).alias("diff_obs_cents"),
        F.round(pv, 6).alias("p_value"),
        (pv < 0.05).alias("reject"),
    )

@register(
    "q_agg_spearman",
    oracle="""
        WITH rows_kv AS (
            SELECT l_quantity AS xv,
                   CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS yv
            FROM lineitem
        ),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM rows_kv),
        rx AS (
            SELECT xv,
                   CAST(2 * (SUM(COUNT(*)) OVER (ORDER BY xv
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) - COUNT(*))
                        + COUNT(*) + 1 AS BIGINT) AS r2
            FROM rows_kv GROUP BY xv
        ),
        ry AS (
            SELECT yv,
                   CAST(2 * (SUM(COUNT(*)) OVER (ORDER BY yv
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) - COUNT(*))
                        + COUNT(*) + 1 AS BIGINT) AS r2
            FROM rows_kv GROUP BY yv
        ),
        q AS (
            SELECT (rx.r2 * 10000) // (2 * (nn.n + 1)) AS qx,
                   (ry.r2 * 10000) // (2 * (nn.n + 1)) AS qy
            FROM rows_kv
            JOIN rx USING (xv) JOIN ry USING (yv)
            CROSS JOIN nn
        ),
        m AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(qx) AS BIGINT) AS sx,
                   CAST(SUM(qy) AS BIGINT) AS sy,
                   CAST(SUM(qx * qx) AS BIGINT) AS sxx,
                   CAST(SUM(qy * qy) AS BIGINT) AS syy,
                   CAST(SUM(qx * qy) AS BIGINT) AS sxy
            FROM q
        )
        SELECT n,
               ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                     / (sqrt(n * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * sx)
                        * sqrt(n * CAST(syy AS DOUBLE)
                               - CAST(sy AS DOUBLE) * sy)), 4)
                   AS spearman_rho
        FROM m
    """,
    section="A64",
    doc="Spearman rank correlation between quantity and price — the "
    "monotone-association complement to Pearson (A23 family): "
    "outlier-immune, captures any monotone link. Computed WITHOUT a "
    "global row sort via the A58 grouped-rank device: average ranks "
    "come from cumulative counts over the DISTINCT-VALUE tables "
    "(doubled to stay integer: R2 = 2·cum_below + cnt + 1), joined "
    "back to rows on the value key. Ranks are then scaled to a 1e4 "
    "integer grid by PURE INTEGER division ((R2·10⁴) div 2(n+1)) so "
    "every moment stays an exact BIGINT to ~6 BILLION rows (raw "
    "integer ranks would overflow Σr² at ~2M) — precision cost is "
    "the 1e-4 rank grid, absorbed by the 4dp output rounding; "
    "Pearson's affine invariance makes the scaling exact in "
    "expectation. Final formula in DOUBLE per the TS23 width rule. "
    "Scale: two distinct-value rank tables (domain-bounded), two "
    "value-keyed joins (the only row-proportional shuffles), one "
    "6-moment reduction.",
)
def q_agg_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rows_kv = li.select(
        F.col("l_quantity").alias("xv"),
        F.expr(
            "cast(cast(l_extendedprice as decimal(18,2)) * 100 as bigint)"
        ).alias("yv"),
    )
    nn = rows_kv.agg(F.count(F.lit(1)).cast("bigint").alias("n"))

    # r8 (guide §2.4): the cumulative counts over the distinct-value
    # tables were UNPARTITIONED windows — single-task sorts over a value
    # domain that is ~row-grain for prices (~450k distinct cents at
    # sf0.1; unbounded at 100 TB). global_cumulative is the repo's
    # distributed prefix-sum (range-partitioned, every stage parallel).
    # r9 (VERDICT r8 item 3): BOTH rank axes now share ONE pass — rows
    # explode into (axis, value) pairs, one groupBy(axis, value), one
    # range partition, with the cumulative resetting per axis
    # (reset_cols) — instead of two separate groupBy + range pipelines.
    # Same bytes shuffled, half the stages. Values are identical: the
    # per-axis cumulative counts are the same exact bigint sums; the
    # value key rides as double (exact for quantities and cents < 2^53,
    # the same widening the join-back coercion applied before).
    from ai_to_cvent_etl_spark.operators.ranking import global_cumulative

    tagged = rows_kv.selectExpr(
        "explode(array(named_struct('ax', 0, 'val', cast(xv as double)),"
        " named_struct('ax', 1, 'val', cast(yv as double)))) as e"
    ).selectExpr("e.ax as ax", "e.val as val")
    grouped = tagged.groupBy("ax", "val").agg(F.expr("count(1) as cnt"))
    r2 = global_cumulative(
        grouped, ["val"], {"cum": F.col("cnt")}, reset_cols=["ax"]
    ).selectExpr(
        "ax", "val", "cast(2 * (cum - cnt) + cnt + 1 as bigint) as r2"
    )
    rx = r2.where("ax = 0").selectExpr("val as xv", "r2 as r2x")
    ry = r2.where("ax = 1").selectExpr("val as yv", "r2 as r2y")
    q = (
        rows_kv.join(rx, "xv")
        .join(ry, "yv")
        .crossJoin(F.broadcast(nn))
        .select(
            F.expr("(r2x * 10000) div (2 * (n + 1))").alias("qx"),
            F.expr("(r2y * 10000) div (2 * (n + 1))").alias("qy"),
        )
    )
    m = q.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("qx").cast("bigint").alias("sx"),
        F.sum("qy").cast("bigint").alias("sy"),
        F.sum(F.col("qx") * F.col("qx")).cast("bigint").alias("sxx"),
        F.sum(F.col("qy") * F.col("qy")).cast("bigint").alias("syy"),
        F.sum(F.col("qx") * F.col("qy")).cast("bigint").alias("sxy"),
    )
    num = F.col("n") * F.col("sxy").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sy")
    den = F.sqrt(
        F.col("n") * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx")
    ) * F.sqrt(
        F.col("n") * F.col("syy").cast("double")
        - F.col("sy").cast("double") * F.col("sy")
    )
    return m.select("n", F.round(num / den, 4).alias("spearman_rho"))

@register(
    "q_agg_kruskal_wallis",
    oracle=f"""
        WITH rows_kv AS (
            SELECT o_orderpriority AS grp,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS v
            FROM orders
        ),
        rk AS (
            SELECT v,
                   CAST(COUNT(*) AS BIGINT) AS t,
                   CAST(2 * (SUM(COUNT(*)) OVER (ORDER BY v
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) - COUNT(*))
                        + COUNT(*) + 1 AS BIGINT) AS r2
            FROM rows_kv GROUP BY v
        ),
        piv AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   {{pivot}}
            FROM rows_kv JOIN rk USING (v)
        ),
        ties AS (
            SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tie_sum FROM rk
        )
        SELECT n, 5 AS k, 4 AS df,
               ROUND(h_raw, 4) AS h_stat,
               ROUND(h_raw / (1.0 - CAST(tie_sum AS DOUBLE)
                              / (CAST(n AS DOUBLE) * n * n - n)), 4)
                   AS h_corrected
        FROM (
            SELECT n, tie_sum,
                   12.0 / (CAST(n AS DOUBLE) * (n + 1))
                   * ((((CAST(s_0 AS DOUBLE) * s_0 / (4.0 * n_0)
                        + CAST(s_1 AS DOUBLE) * s_1 / (4.0 * n_1))
                        + CAST(s_2 AS DOUBLE) * s_2 / (4.0 * n_2))
                        + CAST(s_3 AS DOUBLE) * s_3 / (4.0 * n_3))
                        + CAST(s_4 AS DOUBLE) * s_4 / (4.0 * n_4))
                   - 3.0 * (n + 1) AS h_raw
            FROM piv CROSS JOIN ties
        )
    """.replace("{pivot}", _kw_pivot_cols_duck()),
    section="A65",
    doc="Kruskal-Wallis H test: do order totals differ across the 5 "
    "priority classes? The k-group generalization of Mann-Whitney "
    "(A37) — rank-based, so outlier- and distribution-free where "
    "ANOVA assumes normality. Average ranks come from the A64 "
    "cumulative-count device over the DISTINCT-VALUE table (doubled "
    "to stay integer: R2 = 2*cum_below + cnt + 1) — NO global row "
    "sort; per-group rank sums are pivoted into ONE row via "
    "conditional aggregation over the explicit 5-value priority list "
    "(A9/A22 device), so H is a row-local fixed-fold expression — no "
    "float aggregation-order nondeterminism. Tie correction "
    "1 - sum(t^3-t)/(n^3-n) summed exactly in BIGINT (bound: t and n "
    "< ~2e6 rows per distinct value keeps t^3 in int64; at larger "
    "scale widen the tie sum to DECIMAL(38,0)). S_j = sum of R2 is "
    "exact BIGINT to n ~ 2e9 rows (S_j <= 2n^2); the final H is "
    "rebuilt with the identical IEEE expression both engines. Scale: "
    "one distinct-value rank table (domain-bounded), one value-keyed "
    "join, one 11-column map-side-combinable global reduction.",
)
def q_agg_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    rows_kv = od.select(
        F.col("o_orderpriority").alias("grp"),
        F.expr(
            "cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)"
        ).alias("v"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    rk = (
        rows_kv.groupBy("v")
        .agg(F.count(F.lit(1)).alias("t"))
        .withColumn("cum", F.sum("t").over(w))
        .select(
            "v",
            F.col("t"),
            (2 * (F.col("cum") - F.col("t")) + F.col("t") + 1)
            .cast("bigint")
            .alias("r2"),
        )
    )
    piv = rows_kv.join(rk, "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        *[
            agg
            for i, p in enumerate(_KW_PRIORITIES)
            for agg in (
                F.sum(F.when(F.col("grp") == p, 1).otherwise(0))
                .cast("bigint")
                .alias(f"n_{i}"),
                F.sum(F.when(F.col("grp") == p, F.col("r2")).otherwise(0))
                .cast("bigint")
                .alias(f"s_{i}"),
            )
        ],
    )
    ties = rk.agg(
        F.sum(
            F.col("t") * F.col("t") * F.col("t") - F.col("t")
        ).cast("bigint").alias("tie_sum")
    )
    nd = F.col("n").cast("double")
    term = None
    for i in range(5):
        t_i = (
            F.col(f"s_{i}").cast("double")
            * F.col(f"s_{i}")
            / (4.0 * F.col(f"n_{i}"))
        )
        term = t_i if term is None else term + t_i
    h_raw = 12.0 / (nd * (F.col("n") + 1)) * term - 3.0 * (F.col("n") + 1)
    c = 1.0 - F.col("tie_sum").cast("double") / (nd * F.col("n") * F.col("n") - F.col("n"))
    return (
        piv.crossJoin(F.broadcast(ties))
        .select(
            "n",
            F.lit(5).cast("int").alias("k"),
            F.lit(4).cast("int").alias("df"),
            F.round(h_raw, 4).alias("h_stat"),
            F.round(h_raw / c, 4).alias("h_corrected"),
        )
    )

@register(
    "q_agg_anova_f",
    oracle=f"""
        WITH rows_kv AS (
            SELECT o_orderpriority AS grp,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) // 100 AS v
            FROM orders
        ),
        piv AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   {{pivot}}
            FROM rows_kv
        )
        SELECT n, 4 AS df_between, n - 5 AS df_within,
               ROUND((ssb / 4) / ((sst - ssb) / (n - 5)), 4) AS f_stat,
               ROUND(ssb / sst, 6) AS eta_sq
        FROM (
            SELECT n,
                   ((((CAST(s_0 AS DOUBLE) * s_0 / n_0
                      + CAST(s_1 AS DOUBLE) * s_1 / n_1)
                      + CAST(s_2 AS DOUBLE) * s_2 / n_2)
                      + CAST(s_3 AS DOUBLE) * s_3 / n_3)
                      + CAST(s_4 AS DOUBLE) * s_4 / n_4)
                   - CAST(s_all AS DOUBLE) * s_all / n AS ssb,
                   CAST(q_all AS DOUBLE)
                   - CAST(s_all AS DOUBLE) * s_all / n AS sst
            FROM piv
        )
    """.replace("{pivot}", ", ".join(
        f"CAST(SUM(CASE WHEN grp = '{p}' THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS n_{i}, "
        f"CAST(SUM(CASE WHEN grp = '{p}' THEN v ELSE 0 END) AS BIGINT)"
        f" AS s_{i}"
        for i, p in enumerate(_KW_PRIORITIES)
    ) + ", CAST(SUM(v) AS BIGINT) AS s_all"
      ", CAST(SUM(v * v) AS BIGINT) AS q_all"),
    section="A66",
    doc="One-way ANOVA F across the 5 priority classes on order totals — "
    "the parametric sibling of A65's Kruskal-Wallis (same contrast, "
    "normality assumed instead of ranks; report both, disagree = "
    "heavy tails). Values quantized to WHOLE DOLLARS (floor cent-div-"
    "100) so the sum of squares stays an exact BIGINT to ~25M rows "
    "(cent-squares overflow int64 at ~2.5K rows; at larger scale "
    "widen q_all to DECIMAL(38,0) and mind §5.3 rule 10). All eight "
    "moments reduce in ONE pass (conditional aggregation over the "
    "explicit value list, A9 device — no second grand-mean pass); "
    "SS_between / SS_total are row-local fixed folds; F and eta^2 "
    "rebuilt with identical IEEE expressions. Scale: a single "
    "map-side-combinable global reduction — the cheapest query shape "
    "there is.",
)
def q_agg_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    rows_kv = od.select(
        F.col("o_orderpriority").alias("grp"),
        F.expr(
            "cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)"
            " div 100"
        ).alias("v"),
    )
    # r9 (VERDICT r8 item 1): batched-string expression construction —
    # same expressions/aliases, identical plan and results.
    aggs = ["cast(count(1) as bigint) as n"]
    for i, p in enumerate(_KW_PRIORITIES):
        aggs += [
            f"cast(sum(case when grp = '{p}' then 1 else 0 end)"
            f" as bigint) as n_{i}",
            f"cast(sum(case when grp = '{p}' then v else 0 end)"
            f" as bigint) as s_{i}",
        ]
    aggs += [
        "cast(sum(v) as bigint) as s_all",
        "cast(sum(v * v) as bigint) as q_all",
    ]
    piv = rows_kv.agg(*[F.expr(a) for a in aggs])
    ssb_terms = " + ".join(
        f"cast(s_{i} as double) * s_{i} / n_{i}" for i in range(5)
    )
    grand = "(cast(s_all as double) * s_all / n)"
    ssb = f"(({ssb_terms}) - {grand})"
    sst = f"(cast(q_all as double) - {grand})"
    return piv.selectExpr(
        "n",
        "cast(4 as int) as df_between",
        "n - 5 as df_within",
        f"round(({ssb} / 4) / (({sst} - {ssb}) / (n - 5)), 4) as f_stat",
        f"round({ssb} / {sst}, 6) as eta_sq",
    )

@register(
    "q_agg_capture_recapture",
    oracle=f"""
        WITH flags AS (
            SELECT user_id,
                   CAST(MAX(CASE WHEN ts >= TIMESTAMP '{_CRC_W1[0]}'
                                  AND ts < TIMESTAMP '{_CRC_W1[1]}'
                            THEN 1 ELSE 0 END) AS BIGINT) AS in1,
                   CAST(MAX(CASE WHEN ts >= TIMESTAMP '{_CRC_W2[0]}'
                                  AND ts < TIMESTAMP '{_CRC_W2[1]}'
                            THEN 1 ELSE 0 END) AS BIGINT) AS in2
            FROM events
            GROUP BY user_id
        )
        SELECT CAST(SUM(in1) AS BIGINT) AS n1,
               CAST(SUM(in2) AS BIGINT) AS n2,
               CAST(SUM(in1 * in2) AS BIGINT) AS m_both,
               CAST(COUNT(*) AS BIGINT) AS n_true,
               ROUND((CAST(SUM(in1) AS DOUBLE) + 1)
                     * (CAST(SUM(in2) AS DOUBLE) + 1)
                     / (CAST(SUM(in1 * in2) AS DOUBLE) + 1) - 1, 2)
                   AS chapman_estimate
        FROM flags
    """,
    section="A67",
    doc="Capture-recapture population estimate (Chapman's bias-corrected "
    "Lincoln-Petersen): users seen in capture window 1 vs window 2; "
    "N-hat = (n1+1)(n2+1)/(m+1) - 1 from the overlap m — the ecology "
    "estimator that data teams reuse to size a population only "
    "partially observed by any one probe (bot traffic, incident "
    "blast radius, dedup-rate sizing from two independent crawls). "
    "n_true (the actually-observed distinct count) sits beside the "
    "estimate so the readout shows the estimator's bias under "
    "non-independent captures. ONE pass: per-user window flags via "
    "conditional MAX, then a 4-column global reduction — no distinct "
    "sets, no joins; map-side-combinable at any scale.",
)
def q_agg_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def flag(w):
        return F.max(
            F.when(
                (F.col("ts") >= F.lit(w[0]).cast("timestamp"))
                & (F.col("ts") < F.lit(w[1]).cast("timestamp")),
                1,
            ).otherwise(0)
        ).cast("bigint")

    flags = ev.groupBy("user_id").agg(
        flag(_CRC_W1).alias("in1"), flag(_CRC_W2).alias("in2")
    )
    n1 = F.sum("in1").cast("bigint")
    n2 = F.sum("in2").cast("bigint")
    m = F.sum(F.col("in1") * F.col("in2")).cast("bigint")
    return flags.agg(
        n1.alias("n1"),
        n2.alias("n2"),
        m.alias("m_both"),
        F.count(F.lit(1)).cast("bigint").alias("n_true"),
        F.round(
            (n1.cast("double") + 1) * (n2.cast("double") + 1)
            / (m.cast("double") + 1)
            - 1,
            2,
        ).alias("chapman_estimate"),
    )

@register(
    "q_agg_cohens_kappa",
    oracle=f"""
        WITH lines AS (
            SELECT l_orderkey,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * 100)
                        AS BIGINT) AS line_cents
            FROM lineitem GROUP BY l_orderkey
        ),
        rated AS (
            SELECT {_kappa_bucket_sql(
                "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            )} AS ra,
                   {_kappa_bucket_sql("line_cents")} AS rb
            FROM orders JOIN lines ON l_orderkey = o_orderkey
        ),
        piv AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   {", ".join(
                       f"CAST(SUM(CASE WHEN ra = '{c}' AND rb = '{c}'"
                       f" THEN 1 ELSE 0 END) AS BIGINT) AS d_{c}, "
                       f"CAST(SUM(CASE WHEN ra = '{c}' THEN 1 ELSE 0 END)"
                       f" AS BIGINT) AS a_{c}, "
                       f"CAST(SUM(CASE WHEN rb = '{c}' THEN 1 ELSE 0 END)"
                       f" AS BIGINT) AS b_{c}"
                       for c in _KAPPA_CATS
                   )}
            FROM rated
        )
        SELECT n,
               CAST(d_low + d_mid + d_high AS BIGINT) AS n_agree,
               ROUND(CAST(d_low + d_mid + d_high AS DOUBLE) / n, 4)
                   AS po,
               ROUND(((CAST(a_low AS DOUBLE) * b_low
                      + CAST(a_mid AS DOUBLE) * b_mid)
                      + CAST(a_high AS DOUBLE) * b_high)
                     / (CAST(n AS DOUBLE) * n), 4) AS pe,
               ROUND((CAST(d_low + d_mid + d_high AS DOUBLE) / n
                      - ((CAST(a_low AS DOUBLE) * b_low
                         + CAST(a_mid AS DOUBLE) * b_mid)
                         + CAST(a_high AS DOUBLE) * b_high)
                        / (CAST(n AS DOUBLE) * n))
                     / (1.0 - ((CAST(a_low AS DOUBLE) * b_low
                               + CAST(a_mid AS DOUBLE) * b_mid)
                               + CAST(a_high AS DOUBLE) * b_high)
                              / (CAST(n AS DOUBLE) * n)), 4) AS kappa
        FROM piv
    """,
    section="A68",
    doc="Cohen's kappa between two 'raters' of order size: the bucket "
    "(low/mid/high on fixed cent thresholds) assigned from the header "
    "total vs from the summed line totals — chance-corrected "
    "agreement, the statistic behind labeler-consistency and "
    "dual-pipeline-consistency readouts (raw agreement po flatters "
    "whenever one bucket dominates; kappa subtracts the pe floor). "
    "Both ratings live in the same explicit 3-category space, so the "
    "confusion marginals pivot into ONE row (A9 device) of exact "
    "BIGINT counts: po, pe, kappa are row-local fixed folds over 9 "
    "integers — bit-deterministic. Scale: one co-keyed lineitem "
    "collapse (the J23/E34 reconciliation shape), one broadcast-size "
    "global reduction.",
)
def q_agg_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lines = li.groupBy("l_orderkey").agg(
        F.expr(
            "cast(sum(cast(l_extendedprice as decimal(18,2)) * 100)"
            " as bigint)"
        ).alias("line_cents")
    )

    def bucket(c):
        return (
            F.when(c < _KAPPA_T1, "low")
            .when(c < _KAPPA_T2, "mid")
            .otherwise("high")
        )

    rated = od.join(
        lines, od.o_orderkey == lines.l_orderkey
    ).select(
        bucket(
            F.expr(
                "cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)"
            )
        ).alias("ra"),
        bucket(F.col("line_cents")).alias("rb"),
    )
    piv = rated.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        *[
            agg
            for c in _KAPPA_CATS
            for agg in (
                F.sum(
                    F.when((F.col("ra") == c) & (F.col("rb") == c), 1)
                    .otherwise(0)
                ).cast("bigint").alias(f"d_{c}"),
                F.sum(F.when(F.col("ra") == c, 1).otherwise(0))
                .cast("bigint").alias(f"a_{c}"),
                F.sum(F.when(F.col("rb") == c, 1).otherwise(0))
                .cast("bigint").alias(f"b_{c}"),
            )
        ],
    )
    nd = F.col("n").cast("double")
    diag = F.col("d_low") + F.col("d_mid") + F.col("d_high")
    po = diag.cast("double") / F.col("n")
    pe = (
        (
            F.col("a_low").cast("double") * F.col("b_low")
            + F.col("a_mid").cast("double") * F.col("b_mid")
        )
        + F.col("a_high").cast("double") * F.col("b_high")
    ) / (nd * F.col("n"))
    return piv.select(
        "n",
        diag.cast("bigint").alias("n_agree"),
        F.round(po, 4).alias("po"),
        F.round(pe, 4).alias("pe"),
        F.round((po - pe) / (1.0 - pe), 4).alias("kappa"),
    )
