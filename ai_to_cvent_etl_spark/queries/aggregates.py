"""SURVEY §2.4 — aggregations (A1-A11).

Determinism strategy: money aggregates go through tight DECIMAL casts —
DECIMAL(12,2) for money, DECIMAL(4,2) for 2dp fractions — so products stay
well inside 38 digits of precision on BOTH engines (their decimal-widening
rules differ once a product overflows 38). Exact decimal sums are cast back
to DOUBLE for hash-stable output. Catalyst plans these as partial+final hash
aggregates (map-side combine), which is the shape that scales: the shuffle
carries one row per group per partition, not the fact table.
"""

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


def _money(c):  # exact for 2dp money columns (probed in FIXTURES.md)
    return c.cast(DecimalType(12, 2))


def _frac(c):  # exact for 2dp fractions like discount/tax
    return c.cast(DecimalType(4, 2))


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


_ENTROPY_TYPES = ["click", "error", "purchase", "signup", "view"]


def _entropy_expr_spark() -> str:
    # fixed left-to-right sum over the 5 known types => deterministic fold
    terms = " + ".join(
        f"(case when n_{t} = 0 then 0.0D else "
        f"-(cast(n_{t} as double) / n_total)"
        f" * log2(cast(n_{t} as double) / n_total) end)"
        for t in _ENTROPY_TYPES
    )
    return f"round({terms}, 4)"


def _entropy_expr_duck() -> str:
    terms = " + ".join(
        f"(CASE WHEN n_{t} = 0 THEN 0.0 ELSE "
        f"-(CAST(n_{t} AS DOUBLE) / n_total)"
        f" * log2(CAST(n_{t} AS DOUBLE) / n_total) END)"
        for t in _ENTROPY_TYPES
    )
    return f"ROUND({terms}, 4)"


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


# ==== from analytics_r3c ===========================================

_BASKET_MIN_CO = 10  # min co-occurrence count to report a pair

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
                   SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS x
            FROM orders o GROUP BY o.o_custkey
        ),
        seg AS (
            SELECT c.c_mktsegment AS segment, s.ck, s.x,
                   CAST(row_number() OVER (
                       PARTITION BY c.c_mktsegment ORDER BY s.x, s.ck
                   ) AS BIGINT) AS i
            FROM spend s JOIN customer c ON s.ck = c.c_custkey
        ),
        m AS (
            SELECT segment,
                   CAST(COUNT(*) AS BIGINT) AS n_cust,
                   SUM(x) AS sum_x,
                   SUM(i * x) AS sum_ix
            FROM seg GROUP BY segment
        )
        SELECT segment, n_cust,
               CAST(sum_x AS DOUBLE) AS total_spend,
               (2.0 * CAST(sum_ix AS DOUBLE)
                - (CAST(n_cust AS DOUBLE) + 1.0) * CAST(sum_x AS DOUBLE))
               / (CAST(n_cust AS DOUBLE) * CAST(sum_x AS DOUBLE)) AS gini
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

    spend = od.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.sum(F.col("o_totalprice").cast(DecimalType(18, 2))).alias("x")
    )
    seg = spend.join(cu, spend.ck == cu.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        "ck",
        "x",
        F.row_number()
        .over(Window.partitionBy("c_mktsegment").orderBy("x", "ck"))
        .cast("bigint")
        .alias("i"),
    )
    m = seg.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.sum("x").alias("sum_x"),
        F.sum(F.col("i") * F.col("x")).alias("sum_ix"),
    )
    n_d = F.col("n_cust").cast("double")
    sx = F.col("sum_x").cast("double")
    six = F.col("sum_ix").cast("double")
    return m.select(
        "segment",
        "n_cust",
        sx.alias("total_spend"),
        ((F.lit(2.0) * six - (n_d + F.lit(1.0)) * sx) / (n_d * sx)).alias("gini"),
    )

# ==== from analytics_r3f ===========================================

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

_KS_BIN = 1000  # price-bin width

_KS_A = "1-URGENT"

_KS_B = "5-LOW"

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

# ==== from analytics_r3g ===========================================

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

# ==== from analytics_r3k ===========================================

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

# ==== from analytics_r3p ===========================================

_THEIL_QS = 1e6

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

# ==== from analytics_r3r ===========================================

_TE_M = 50.0

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

# ==== from analytics_r3y ===========================================

_Z = 1.96

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

# ==== from analytics_r4c ===========================================

_Z95 = 1.96

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

# ==== from analytics_r4f ===========================================

_ZA = 1.959963984540054  # z_{0.975}

_ZB = 0.8416212335729143  # z_{0.80}

_MDES = (1.0, 2.5, 5.0)  # minimum detectable effects, in k$ per customer

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

# ==== from analytics_r4h ===========================================

_H48_USER = (
    "cast(conv(substr(md5(cast(user_id as string)), 1, 12), 16, 10) as bigint)"
)

_H48_USER_DUCK = (
    "CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12)) AS BIGINT)"
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

# ==== from analytics_r4j ===========================================

_BUDGET_CENTS = 1_000_000

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


# ==== forty-eighth wave (r4) ==================================================

_BH_ALPHA = 0.10
_LOGI = 1.702  # logistic approximation constant: Phi(z) ~ 1/(1+exp(-1.702 z))


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


# Poisson(1) CDF thresholds quantized against the 48-bit prime modulus
# p = 2^48 - 59: t_k = floor(P(Poisson(1) <= k) * p). A uniform draw
# u in [0, p) maps to weight w = #{k : u >= t_k} — an EXACT integer
# comparison chain, bit-identical on any engine with md5. One md5 per
# ROW yields two 48-bit seeds (a, c); replica b's draw is the affine
# u_b = (a + b*c) mod p — marginally uniform for every b and PAIRWISE
# independent across replicas (the map (a,c) -> (u_b, u_b') is linear
# with determinant b'-b, invertible mod the PRIME p), which is the
# independence the bootstrap variance needs — at 1/32nd of the hashing.
_POIS1_P = (1 << 48) - 59  # prime (Miller-Rabin verified)
_POIS1_T48 = (
    103548857136039,
    207097714272078,
    258872142840097,
    276130285696104,
    280444821410106,
    281307728552906,
    281451546410039,
    281472091818201,
)
_BOOT_B = 32


def _boot_w(u: str) -> str:
    return " + ".join(
        f"(CASE WHEN {u} >= {t} THEN 1 ELSE 0 END)" for t in _POIS1_T48
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


_ECE_CAP = 50000  # cents cap: conf = min(cents, cap)/cap, bins = conf decile


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


_TOST_MARGIN = 500  # cents: equivalence margin ±5$ on the mean
_TOST_Z = 1.645     # one-sided 5% normal critical value


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


def _delta_arm_sql(arm: int) -> str:
    """Exact per-arm moment extraction for the delta-method CTE."""
    return f"""
            SELECT CAST(COUNT(*) AS BIGINT) AS m,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(n) AS BIGINT) AS sn,
                   CAST(SUM(y * y) AS BIGINT) AS syy,
                   CAST(SUM(n * n) AS BIGINT) AS snn,
                   CAST(SUM(y * n) AS BIGINT) AS syn
            FROM u WHERE arm = {arm}"""


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

    def arm_moments(a: int):
        f = u.filter(F.col("arm") == a)
        return f.agg(
            F.count(F.lit(1)).cast("bigint").alias(f"m{a}"),
            F.sum("y").cast("bigint").alias(f"sy{a}"),
            F.sum("n").cast("bigint").alias(f"sn{a}"),
            F.sum(F.col("y") * F.col("y")).cast("bigint").alias(f"syy{a}"),
            F.sum(F.col("n") * F.col("n")).cast("bigint").alias(f"snn{a}"),
            F.sum(F.col("y") * F.col("n")).cast("bigint").alias(f"syn{a}"),
        )

    d = arm_moments(0).crossJoin(arm_moments(1))

    def ratio(a: int):
        return F.col(f"sy{a}").cast("double") / F.col(f"sn{a}")

    def var(a: int):
        m = F.col(f"m{a}")
        r = ratio(a)
        cyy = m * F.col(f"syy{a}").cast("double") - F.col(
            f"sy{a}"
        ).cast("double") * F.col(f"sy{a}")
        cnn = m * F.col(f"snn{a}").cast("double") - F.col(
            f"sn{a}"
        ).cast("double") * F.col(f"sn{a}")
        cyn = m * F.col(f"syn{a}").cast("double") - F.col(
            f"sy{a}"
        ).cast("double") * F.col(f"sn{a}")
        nbar = F.col(f"sn{a}").cast("double") / m
        return (
            (cyy - 2 * r * cyn + r * r * cnn)
            / (m * (m - 1.0))
            / (m * nbar * nbar)
        )

    z = (ratio(1) - ratio(0)) / F.sqrt(var(0) + var(1))
    return d.select(
        "m0",
        "m1",
        F.round(ratio(0), 4).alias("ratio0_cents"),
        F.round(ratio(1), 4).alias("ratio1_cents"),
        F.round(F.sqrt(var(0)), 6).alias("se0"),
        F.round(F.sqrt(var(1)), 6).alias("se1"),
        F.round(z, 4).alias("z"),
        (F.abs(z) > 1.96).alias("significant"),
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


_PERM_B = 64  # permutation replicas (b=0 is the "observed" assignment)


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

    def rank_table(col: str):
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, 0)
        return (
            rows_kv.groupBy(col)
            .agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn("cum", F.sum("cnt").over(w))
            .select(
                col,
                (2 * (F.col("cum") - F.col("cnt")) + F.col("cnt") + 1)
                .cast("bigint")
                .alias("r2"),
            )
        )

    rx = rank_table("xv").withColumnRenamed("r2", "r2x")
    ry = rank_table("yv").withColumnRenamed("r2", "r2y")
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


_KW_PRIORITIES = (
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
)


def _kw_pivot_cols_duck() -> str:
    return ", ".join(
        f"CAST(SUM(CASE WHEN grp = '{p}' THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS n_{i}, "
        f"CAST(SUM(CASE WHEN grp = '{p}' THEN r2 ELSE 0 END) AS BIGINT)"
        f" AS s_{i}"
        for i, p in enumerate(_KW_PRIORITIES)
    )


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
    piv = rows_kv.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        *[
            agg
            for i, p in enumerate(_KW_PRIORITIES)
            for agg in (
                F.sum(F.when(F.col("grp") == p, 1).otherwise(0))
                .cast("bigint")
                .alias(f"n_{i}"),
                F.sum(F.when(F.col("grp") == p, F.col("v")).otherwise(0))
                .cast("bigint")
                .alias(f"s_{i}"),
            )
        ],
        F.sum("v").cast("bigint").alias("s_all"),
        F.sum(F.col("v") * F.col("v")).cast("bigint").alias("q_all"),
    )
    ssb_terms = None
    for i in range(5):
        t_i = (
            F.col(f"s_{i}").cast("double")
            * F.col(f"s_{i}")
            / F.col(f"n_{i}")
        )
        ssb_terms = t_i if ssb_terms is None else ssb_terms + t_i
    grand = F.col("s_all").cast("double") * F.col("s_all") / F.col("n")
    ssb = ssb_terms - grand
    sst = F.col("q_all").cast("double") - grand
    return piv.select(
        "n",
        F.lit(4).cast("int").alias("df_between"),
        (F.col("n") - 5).alias("df_within"),
        F.round((ssb / 4) / ((sst - ssb) / (F.col("n") - 5)), 4).alias(
            "f_stat"
        ),
        F.round(ssb / sst, 6).alias("eta_sq"),
    )


_CRC_W1 = ("2024-01-01", "2024-01-08")   # [start, end) capture window 1
_CRC_W2 = ("2024-01-15", "2024-01-22")   # [start, end) capture window 2


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


# Cohen's kappa price-bucket thresholds in cents: low < $50k, mid < $200k.
_KAPPA_T1 = 50_000_00
_KAPPA_T2 = 200_000_00
_KAPPA_CATS = ("low", "mid", "high")


def _kappa_bucket_sql(col: str) -> str:
    return (
        f"CASE WHEN {col} < {_KAPPA_T1} THEN 'low' "
        f"WHEN {col} < {_KAPPA_T2} THEN 'mid' ELSE 'high' END"
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


@register(
    "q_agg_brier_decomp",
    oracle=f"""
        WITH p AS (
            SELECT LEAST(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT),
                         {_ECE_CAP}) AS c,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
            FROM events
        ),
        b AS (
            SELECT LEAST(c // {_ECE_CAP // 10}, 9) AS bin,
                   CAST(COUNT(*) AS BIGINT) AS n_b,
                   CAST(SUM(y) AS BIGINT) AS pos_b,
                   CAST(SUM(c) AS BIGINT) AS conf_sum,
                   CAST(SUM((c - y * {_ECE_CAP})
                            * (c - y * {_ECE_CAP})) AS BIGINT) AS sq_sum
            FROM p GROUP BY 1
        ),
        g AS (
            SELECT bin, n_b, pos_b, conf_sum, sq_sum,
                   CAST(SUM(n_b) OVER () AS BIGINT) AS nn,
                   CAST(SUM(pos_b) OVER () AS BIGINT) AS pos,
                   CAST(SUM(sq_sum) OVER () AS BIGINT) AS sq
            FROM b
        ),
        t AS (
            SELECT nn, pos, sq,
                   CAST(FLOOR(1e9 * n_b
                        * ((conf_sum / ({_ECE_CAP}.0 * n_b))
                           - pos_b / (1.0 * n_b))
                        * ((conf_sum / ({_ECE_CAP}.0 * n_b))
                           - pos_b / (1.0 * n_b)) / nn) AS BIGINT)
                       AS rel_term,
                   CAST(FLOOR(1e9 * n_b
                        * (pos_b / (1.0 * n_b) - pos / (1.0 * nn))
                        * (pos_b / (1.0 * n_b) - pos / (1.0 * nn)) / nn)
                        AS BIGINT) AS res_term
            FROM g
        )
        SELECT nn AS n,
               ROUND(MAX(sq) / ({_ECE_CAP}.0 * {_ECE_CAP} * nn), 6)
                   AS brier,
               ROUND(SUM(rel_term) / 1e9, 6) AS reliability,
               ROUND(SUM(res_term) / 1e9, 6) AS resolution,
               ROUND((MAX(pos) / (1.0 * nn))
                     * (1.0 - MAX(pos) / (1.0 * nn)), 6) AS uncertainty
        FROM t GROUP BY nn
    """,
    section="A69",
    doc="Brier score with the Murphy decomposition (reliability / "
    "resolution / uncertainty over the A59 decile bins) for the same "
    "purchase-probability score ECE audits: brier = mean((p-y)^2) "
    "computed as the EXACT integer sum of (c - y*CAP)^2 over capped "
    "cents (one division at the end — exact to ~3.6M rows in int64; "
    "widen to DECIMAL beyond), reliability/resolution as per-bin "
    "rational terms quantized floor(1e9*x) before the exact cross-bin "
    "sum (A59 device). Identity note: brier = unc - res + rel + "
    "within-bin conf variance — the within-bin term is NOT emitted, "
    "so the components are reported, not the identity. ONE pass, one "
    "10-row bin table, map-side-combinable.",
)
def q_agg_brier_decomp(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cap = _ECE_CAP
    p = ev.select(
        F.least(
            F.expr("cast(cast(value as decimal(12,2)) * 100 as bigint)"),
            F.lit(cap),
        ).alias("c"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    b = p.groupBy(
        F.least(F.expr(f"c div {cap // 10}"), F.lit(9)).alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_b"),
        F.sum("y").cast("bigint").alias("pos_b"),
        F.sum("c").cast("bigint").alias("conf_sum"),
        F.sum(
            (F.col("c") - F.col("y") * cap)
            * (F.col("c") - F.col("y") * cap)
        ).cast("bigint").alias("sq_sum"),
    )
    wall = Window.partitionBy()
    g = b.select(
        "bin",
        "n_b",
        "pos_b",
        "conf_sum",
        "sq_sum",
        F.sum("n_b").over(wall).cast("bigint").alias("nn"),
        F.sum("pos_b").over(wall).cast("bigint").alias("pos"),
        F.sum("sq_sum").over(wall).cast("bigint").alias("sq"),
    )
    conf_b = F.col("conf_sum") / (float(cap) * F.col("n_b"))
    acc_b = F.col("pos_b") / (1.0 * F.col("n_b"))
    ybar = F.col("pos") / (1.0 * F.col("nn"))
    t = g.select(
        "nn",
        "pos",
        "sq",
        F.floor(
            1e9 * F.col("n_b") * (conf_b - acc_b) * (conf_b - acc_b)
            / F.col("nn")
        ).cast("bigint").alias("rel_term"),
        F.floor(
            1e9 * F.col("n_b") * (acc_b - ybar) * (acc_b - ybar)
            / F.col("nn")
        ).cast("bigint").alias("res_term"),
    )
    return t.groupBy("nn").agg(
        F.round(
            F.max("sq") / (float(cap) * cap * F.col("nn")), 6
        ).alias("brier"),
        F.round(F.sum("rel_term") / 1e9, 6).alias("reliability"),
        F.round(F.sum("res_term") / 1e9, 6).alias("resolution"),
        F.round(
            (F.max("pos") / (1.0 * F.col("nn")))
            * (1.0 - F.max("pos") / (1.0 * F.col("nn"))),
            6,
        ).alias("uncertainty"),
    ).select(
        F.col("nn").alias("n"),
        "brier",
        "reliability",
        "resolution",
        "uncertainty",
    )


_TUKEY_Q_CRIT = 3.86   # studentized range q(k=5, df=inf, alpha=.05)


@register(
    "q_agg_tukey_hsd",
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
        ),
        msw AS (
            SELECT n,
                   (((((CAST(q_0 AS DOUBLE)
                        - CAST(s_0 AS DOUBLE) * s_0 / n_0)
                      + (CAST(q_1 AS DOUBLE)
                         - CAST(s_1 AS DOUBLE) * s_1 / n_1))
                      + (CAST(q_2 AS DOUBLE)
                         - CAST(s_2 AS DOUBLE) * s_2 / n_2))
                      + (CAST(q_3 AS DOUBLE)
                         - CAST(s_3 AS DOUBLE) * s_3 / n_3))
                      + (CAST(q_4 AS DOUBLE)
                         - CAST(s_4 AS DOUBLE) * s_4 / n_4))
                   / (n - 5) AS msw
            FROM piv
        ),
        groups AS (
            SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_j,
                   CAST(SUM(v) AS BIGINT) AS s_j
            FROM rows_kv GROUP BY grp
        )
        SELECT a.grp AS grp_a, b.grp AS grp_b,
               ROUND(CAST(a.s_j AS DOUBLE) / a.n_j
                     - CAST(b.s_j AS DOUBLE) / b.n_j, 4) AS mean_diff,
               ROUND(abs(CAST(a.s_j AS DOUBLE) / a.n_j
                         - CAST(b.s_j AS DOUBLE) / b.n_j)
                     / sqrt(msw / 2 * (1.0 / a.n_j + 1.0 / b.n_j)), 4)
                   AS q_stat,
               abs(CAST(a.s_j AS DOUBLE) / a.n_j
                   - CAST(b.s_j AS DOUBLE) / b.n_j)
               / sqrt(msw / 2 * (1.0 / a.n_j + 1.0 / b.n_j))
                   > {_TUKEY_Q_CRIT} AS significant
        FROM groups a JOIN groups b ON a.grp < b.grp
        CROSS JOIN msw
    """.replace("{pivot}", ", ".join(
        f"CAST(SUM(CASE WHEN grp = '{p}' THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS n_{i}, "
        f"CAST(SUM(CASE WHEN grp = '{p}' THEN v ELSE 0 END) AS BIGINT)"
        f" AS s_{i}, "
        f"CAST(SUM(CASE WHEN grp = '{p}' THEN v * v ELSE 0 END) AS BIGINT)"
        f" AS q_{i}"
        for i, p in enumerate(_KW_PRIORITIES)
    )),
    section="A70",
    doc="Tukey HSD post-hoc: all 10 pairwise priority-class contrasts "
    "after A66's ANOVA, studentized (q = |mean_i - mean_j| / "
    "sqrt(MSW/2 * (1/n_i + 1/n_j)), Tukey-Kramer unequal-n form) "
    "against the fixed q(5, inf, .05) = 3.86 critical — the "
    "which-groups-differ step an omnibus F can't answer, with the "
    "familywise error control that 10 naive t-tests forfeit. MSW "
    "comes from the SAME one-row integer-moment pivot as A66 (whole-"
    "dollar grid, fixed fold over the explicit class list); group "
    "means are exact-integer ratios; every pair row is arithmetic "
    "over broadcast scalars. Scale: one conditional-aggregation "
    "pass + a 5x5 self-join on a 5-row table.",
)
def q_agg_tukey_hsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    rows_kv = od.select(
        F.col("o_orderpriority").alias("grp"),
        F.expr(
            "cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)"
            " div 100"
        ).alias("v"),
    )
    piv = rows_kv.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        *[
            agg
            for i, p in enumerate(_KW_PRIORITIES)
            for agg in (
                F.sum(F.when(F.col("grp") == p, 1).otherwise(0))
                .cast("bigint").alias(f"n_{i}"),
                F.sum(F.when(F.col("grp") == p, F.col("v")).otherwise(0))
                .cast("bigint").alias(f"s_{i}"),
                F.sum(
                    F.when(F.col("grp") == p, F.col("v") * F.col("v"))
                    .otherwise(0)
                ).cast("bigint").alias(f"q_{i}"),
            )
        ],
    )
    ssw = None
    for i in range(5):
        t_i = F.col(f"q_{i}").cast("double") - F.col(f"s_{i}").cast(
            "double"
        ) * F.col(f"s_{i}") / F.col(f"n_{i}")
        ssw = t_i if ssw is None else ssw + t_i
    msw = piv.select((ssw / (F.col("n") - 5)).alias("msw"))
    groups = rows_kv.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_j"),
        F.sum("v").cast("bigint").alias("s_j"),
    )
    a = groups.select(
        F.col("grp").alias("grp_a"),
        F.col("n_j").alias("na"),
        F.col("s_j").alias("sa"),
    )
    b = groups.select(
        F.col("grp").alias("grp_b"),
        F.col("n_j").alias("nb"),
        F.col("s_j").alias("sb"),
    )
    diff = F.col("sa").cast("double") / F.col("na") - F.col("sb").cast(
        "double"
    ) / F.col("nb")
    qs = F.abs(diff) / F.sqrt(
        F.col("msw") / 2 * (1.0 / F.col("na") + 1.0 / F.col("nb"))
    )
    return (
        a.join(b, F.col("grp_a") < F.col("grp_b"))
        .crossJoin(F.broadcast(msw))
        .select(
            "grp_a",
            "grp_b",
            F.round(diff, 4).alias("mean_diff"),
            F.round(qs, 4).alias("q_stat"),
            (qs > _TUKEY_Q_CRIT).alias("significant"),
        )
    )


# Mantel-Haenszel strata: user activity tiers on fixed event-count cuts.
_MH_CUTS = (8, 12)   # tier 0: <8 events, tier 1: 8-12, tier 2: >12


def _mh_tier_sql(cnt: str) -> str:
    return (
        f"CASE WHEN {cnt} < {_MH_CUTS[0]} THEN 0 "
        f"WHEN {cnt} <= {_MH_CUTS[1]} THEN 1 ELSE 2 END"
    )


@register(
    "q_agg_mantel_haenszel",
    oracle=f"""
        WITH u AS (
            SELECT user_id,
                   {_H48_USER_DUCK} % 2 AS arm,
                   MAX(CASE WHEN event_type = 'purchase' AND value > 150
                            THEN 1 ELSE 0 END) AS conv,
                   {_mh_tier_sql("COUNT(*)")} AS tier
            FROM events GROUP BY user_id
        ),
        piv AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
                   {", ".join(
                       f"CAST(SUM(CASE WHEN tier = {t} AND arm = 0"
                       f" AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT)"
                       f" AS a_{t}, "
                       f"CAST(SUM(CASE WHEN tier = {t} AND arm = 0"
                       f" AND conv = 0 THEN 1 ELSE 0 END) AS BIGINT)"
                       f" AS b_{t}, "
                       f"CAST(SUM(CASE WHEN tier = {t} AND arm = 1"
                       f" AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT)"
                       f" AS c_{t}, "
                       f"CAST(SUM(CASE WHEN tier = {t} AND arm = 1"
                       f" AND conv = 0 THEN 1 ELSE 0 END) AS BIGINT)"
                       f" AS d_{t}"
                       for t in (0, 1, 2)
                   )}
            FROM u
        )
        SELECT n_users,
               ROUND(((CAST(a_0 + a_1 + a_2 AS DOUBLE) + 0.5)
                      * (CAST(d_0 + d_1 + d_2 AS DOUBLE) + 0.5))
                     / ((CAST(b_0 + b_1 + b_2 AS DOUBLE) + 0.5)
                        * (CAST(c_0 + c_1 + c_2 AS DOUBLE) + 0.5)), 4)
                   AS crude_or,
               ROUND(CASE WHEN ((CASE WHEN (a_0 + b_0 + c_0 + d_0) = 0 THEN 0.0 ELSE CAST(b_0 AS DOUBLE) * c_0 / (a_0 + b_0 + c_0 + d_0) END
                        + CASE WHEN (a_1 + b_1 + c_1 + d_1) = 0 THEN 0.0 ELSE CAST(b_1 AS DOUBLE) * c_1 / (a_1 + b_1 + c_1 + d_1) END)
                        + CASE WHEN (a_2 + b_2 + c_2 + d_2) = 0 THEN 0.0 ELSE CAST(b_2 AS DOUBLE) * c_2 / (a_2 + b_2 + c_2 + d_2) END) > 0 THEN
                     ((CASE WHEN (a_0 + b_0 + c_0 + d_0) = 0 THEN 0.0 ELSE CAST(a_0 AS DOUBLE) * d_0 / (a_0 + b_0 + c_0 + d_0) END
                      + CASE WHEN (a_1 + b_1 + c_1 + d_1) = 0 THEN 0.0 ELSE CAST(a_1 AS DOUBLE) * d_1 / (a_1 + b_1 + c_1 + d_1) END)
                      + CASE WHEN (a_2 + b_2 + c_2 + d_2) = 0 THEN 0.0 ELSE CAST(a_2 AS DOUBLE) * d_2 / (a_2 + b_2 + c_2 + d_2) END)
                     / ((CASE WHEN (a_0 + b_0 + c_0 + d_0) = 0 THEN 0.0 ELSE CAST(b_0 AS DOUBLE) * c_0 / (a_0 + b_0 + c_0 + d_0) END
                        + CASE WHEN (a_1 + b_1 + c_1 + d_1) = 0 THEN 0.0 ELSE CAST(b_1 AS DOUBLE) * c_1 / (a_1 + b_1 + c_1 + d_1) END)
                        + CASE WHEN (a_2 + b_2 + c_2 + d_2) = 0 THEN 0.0 ELSE CAST(b_2 AS DOUBLE) * c_2 / (a_2 + b_2 + c_2 + d_2) END) END, 4) AS mh_or
        FROM piv
    """,
    section="A71",
    doc="Mantel-Haenszel pooled odds ratio across activity-tier strata "
    "for the A47 hash-split A/A arms: the stratified effect estimate "
    "that defuses Simpson's paradox — a crude OR pools strata with "
    "different base rates and arm mixes and can point the WRONG WAY; "
    "MH weights each stratum's OR by b*c/n. Both ORs reported side "
    "by side (their gap IS the confounding readout; on the A/A "
    "split both ~1 by construction). All 12 cell counts pivot into "
    "ONE row over the explicit tier list (A9 device) in a single "
    "pass; MH numerator/denominator are fixed 3-term folds of exact-"
    "integer rationals with empty strata contributing 0 (the MH "
    "convention) and a NULL guard at a zero denominator; "
    "integer rationals; crude OR Haldane-corrected (A53 rule). "
    "Scale: one user-collapse + one 13-column global reduction.",
)
def q_agg_mantel_haenszel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 150),
                1,
            ).otherwise(0)
        ).alias("conv"),
        F.count(F.lit(1)).alias("cnt"),
    ).select(
        (F.expr(_H48_USER) % 2).alias("arm"),
        "conv",
        F.when(F.col("cnt") < _MH_CUTS[0], 0)
        .when(F.col("cnt") <= _MH_CUTS[1], 1)
        .otherwise(2)
        .alias("tier"),
    )
    cells = []
    for t in (0, 1, 2):
        for name, arm, conv in (
            ("a", 0, 1), ("b", 0, 0), ("c", 1, 1), ("d", 1, 0)
        ):
            cells.append(
                F.sum(
                    F.when(
                        (F.col("tier") == t)
                        & (F.col("arm") == arm)
                        & (F.col("conv") == conv),
                        1,
                    ).otherwise(0)
                ).cast("bigint").alias(f"{name}_{t}")
            )
    piv = u.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"), *cells
    )
    asum = F.col("a_0") + F.col("a_1") + F.col("a_2")
    bsum = F.col("b_0") + F.col("b_1") + F.col("b_2")
    csum = F.col("c_0") + F.col("c_1") + F.col("c_2")
    dsum = F.col("d_0") + F.col("d_1") + F.col("d_2")
    crude = ((asum.cast("double") + 0.5) * (dsum.cast("double") + 0.5)) / (
        (bsum.cast("double") + 0.5) * (csum.cast("double") + 0.5)
    )

    def term(x, y, t):
        n_t = (
            F.col(f"a_{t}") + F.col(f"b_{t}") + F.col(f"c_{t}")
            + F.col(f"d_{t}")
        )
        return F.when(n_t == 0, 0.0).otherwise(
            F.col(f"{x}_{t}").cast("double") * F.col(f"{y}_{t}") / n_t
        )

    num = (term("a", "d", 0) + term("a", "d", 1)) + term("a", "d", 2)
    den = (term("b", "c", 0) + term("b", "c", 1)) + term("b", "c", 2)
    return piv.select(
        "n_users",
        F.round(crude, 4).alias("crude_or"),
        F.round(F.when(den > 0, num / den), 4).alias("mh_or"),
    )


@register(
    "q_agg_cochran_armitage",
    oracle=f"""
        WITH u AS (
            SELECT user_id,
                   MAX(CASE WHEN event_type = 'purchase' AND value > 150
                            THEN 1 ELSE 0 END) AS conv,
                   {_mh_tier_sql("COUNT(*)")} AS tier
            FROM events GROUP BY user_id
        ),
        piv AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(conv) AS BIGINT) AS k,
                   {", ".join(
                       f"CAST(SUM(CASE WHEN tier = {t} THEN 1 ELSE 0 END)"
                       f" AS BIGINT) AS n_{t}, "
                       f"CAST(SUM(CASE WHEN tier = {t} THEN conv ELSE 0 END)"
                       f" AS BIGINT) AS k_{t}"
                       for t in (0, 1, 2)
                   )}
            FROM u
        )
        SELECT n, k,
               ROUND(((CAST(k_0 AS DOUBLE) * 0 + CAST(k_1 AS DOUBLE) * 1)
                      + CAST(k_2 AS DOUBLE) * 2)
                     - (CAST(k AS DOUBLE) / n)
                       * ((CAST(n_0 AS DOUBLE) * 0
                          + CAST(n_1 AS DOUBLE) * 1)
                          + CAST(n_2 AS DOUBLE) * 2), 4) AS trend_num,
               ROUND(CASE WHEN (CAST(k AS DOUBLE) / n)
                            * (1.0 - CAST(k AS DOUBLE) / n)
                            * (((CAST(n_0 AS DOUBLE) * 0 * 0
                                + CAST(n_1 AS DOUBLE) * 1 * 1)
                                + CAST(n_2 AS DOUBLE) * 2 * 2)
                               - ((CAST(n_0 AS DOUBLE) * 0
                                  + CAST(n_1 AS DOUBLE) * 1
                                  + CAST(n_2 AS DOUBLE) * 2)
                                  * (CAST(n_0 AS DOUBLE) * 0
                                     + CAST(n_1 AS DOUBLE) * 1
                                     + CAST(n_2 AS DOUBLE) * 2)) / n) > 0
                     THEN (((CAST(k_0 AS DOUBLE) * 0
                            + CAST(k_1 AS DOUBLE) * 1)
                       + CAST(k_2 AS DOUBLE) * 2)
                      - (CAST(k AS DOUBLE) / n)
                        * ((CAST(n_0 AS DOUBLE) * 0
                           + CAST(n_1 AS DOUBLE) * 1)
                           + CAST(n_2 AS DOUBLE) * 2))
                     / sqrt((CAST(k AS DOUBLE) / n)
                            * (1.0 - CAST(k AS DOUBLE) / n)
                            * (((CAST(n_0 AS DOUBLE) * 0 * 0
                                + CAST(n_1 AS DOUBLE) * 1 * 1)
                                + CAST(n_2 AS DOUBLE) * 2 * 2)
                               - ((CAST(n_0 AS DOUBLE) * 0
                                  + CAST(n_1 AS DOUBLE) * 1
                                  + CAST(n_2 AS DOUBLE) * 2)
                                  * (CAST(n_0 AS DOUBLE) * 0
                                     + CAST(n_1 AS DOUBLE) * 1
                                     + CAST(n_2 AS DOUBLE) * 2)) / n))
                     END, 4) AS z
        FROM piv
    """,
    section="A72",
    doc="Cochran-Armitage trend test: does conversion rate rise "
    "MONOTONICALLY with activity tier (scores 0,1,2)? The dose-"
    "response sibling of the A26 chi-square — chi-square asks 'any "
    "difference', CA asks 'ordered difference' and buys power "
    "exactly when tiers are ordinal (engagement bands, price tiers, "
    "dosage). Same one-pass pivot as A71 (explicit tier list, exact "
    "BIGINT n_t/k_t); trend numerator and the variance-normalized z "
    "are row-local fixed folds with the tier scores written out "
    "literally so both engines fold identically; z NULL-guarded "
    "at zero variance (single-tier or zero/full conversion "
    "degeneracy — hit at sf0.001). Scale: one user "
    "collapse + one 8-column global reduction.",
)
def q_agg_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 150),
                1,
            ).otherwise(0)
        ).alias("conv"),
        F.count(F.lit(1)).alias("cnt"),
    ).select(
        "conv",
        F.when(F.col("cnt") < _MH_CUTS[0], 0)
        .when(F.col("cnt") <= _MH_CUTS[1], 1)
        .otherwise(2)
        .alias("tier"),
    )
    piv = u.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("conv").cast("bigint").alias("k"),
        *[
            agg
            for t in (0, 1, 2)
            for agg in (
                F.sum(F.when(F.col("tier") == t, 1).otherwise(0))
                .cast("bigint").alias(f"n_{t}"),
                F.sum(F.when(F.col("tier") == t, F.col("conv")).otherwise(0))
                .cast("bigint").alias(f"k_{t}"),
            )
        ],
    )
    kd = lambda t: F.col(f"k_{t}").cast("double")
    ndt = lambda t: F.col(f"n_{t}").cast("double")
    pbar = F.col("k").cast("double") / F.col("n")
    sk = (kd(0) * 0 + kd(1) * 1) + kd(2) * 2
    sn = (ndt(0) * 0 + ndt(1) * 1) + ndt(2) * 2
    sn2 = (ndt(0) * 0 * 0 + ndt(1) * 1 * 1) + ndt(2) * 2 * 2
    sn_for_var = ndt(0) * 0 + ndt(1) * 1 + ndt(2) * 2
    num = sk - pbar * sn
    var = pbar * (1.0 - pbar) * (sn2 - (sn_for_var * sn_for_var) / F.col("n"))
    return piv.select(
        "n",
        "k",
        F.round(num, 4).alias("trend_num"),
        F.round(F.when(var > 0, num / F.sqrt(var)), 4).alias("z"),
    )


def _bf_fold_duck() -> str:
    """Left-fold of the five s_i^2/n_i terms, A66's explicit-nesting device."""
    t = "CAST(s_0 AS DOUBLE) * s_0 / n_0"
    for i in range(1, 5):
        t = f"({t} + CAST(s_{i} AS DOUBLE) * s_{i} / n_{i})"
    return t


@register(
    "q_agg_brown_forsythe",
    oracle=f"""
        WITH rows_kv AS (
            SELECT o_orderpriority AS grp,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) // 100 AS v
            FROM orders
        ),
        med AS (
            SELECT grp, CAST(2 * median(v) AS BIGINT) AS m2
            FROM rows_kv GROUP BY grp
        ),
        dev AS (
            SELECT r.grp, abs(2 * r.v - m.m2) AS a2
            FROM rows_kv r JOIN med m ON r.grp = m.grp
        ),
        piv AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   {{pivot}},
                   CAST(SUM(a2) AS BIGINT) AS s_all,
                   CAST(SUM(a2 * a2) AS BIGINT) AS q_all
            FROM dev
        )
        SELECT n, 4 AS df_between, n - 5 AS df_within,
               ROUND(((t - grand) / 4) / ((qd - t) / (n - 5)), 4)
                   AS bf_stat,
               ROUND((t - grand) / (qd - grand), 6) AS eta_sq
        FROM (
            SELECT n, {_bf_fold_duck()} AS t,
                   CAST(s_all AS DOUBLE) * s_all / n AS grand,
                   CAST(q_all AS DOUBLE) AS qd
            FROM piv
        )
    """.replace("{pivot}", ", ".join(
        f"CAST(SUM(CASE WHEN grp = '{p}' THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS n_{i}, "
        f"CAST(SUM(CASE WHEN grp = '{p}' THEN a2 ELSE 0 END) AS BIGINT)"
        f" AS s_{i}, "
        f"CAST(SUM(CASE WHEN grp = '{p}' THEN a2 * a2 ELSE 0 END) AS BIGINT)"
        f" AS q_{i}"
        for i, p in enumerate(_KW_PRIORITIES)
    )),
    section="A73",
    doc="Brown-Forsythe variance-homogeneity test across the 5 priority "
    "classes on whole-dollar order totals: one-way ANOVA F on absolute "
    "deviations from the GROUP MEDIAN — the assumption check that "
    "must pass before trusting A66's ANOVA F (unequal spreads inflate "
    "its false-positive rate; BF is the robust form of Levene). "
    "Exactness device: deviations are kept as the exact integer "
    "|2v - 2*median| (twice the deviation — medians interpolate at "
    ".5, doubling restores integrality; the factor cancels in F), so "
    "every moment is an exact BIGINT (a2<=1.2e6, q_all<9.2e18 to "
    "~4e6 rows; widen to DECIMAL(38,0) past that). The s_i^2/n_i "
    "fold uses A66's explicit left-nesting so both engines share the "
    "IEEE op order. Scale: one 5-row median pass (exact percentile "
    "per group), one broadcast join back, one map-side-combinable "
    "global reduction.",
)
def q_agg_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    rows_kv = od.select(
        F.col("o_orderpriority").alias("grp"),
        F.expr(
            "cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)"
            " div 100"
        ).alias("v"),
    )
    med = rows_kv.groupBy("grp").agg(
        F.expr("cast(2 * percentile(v, 0.5) as bigint)").alias("m2")
    )
    dev = rows_kv.join(F.broadcast(med), "grp").select(
        "grp", F.abs(2 * F.col("v") - F.col("m2")).alias("a2")
    )
    piv = dev.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        *[
            agg
            for i, p in enumerate(_KW_PRIORITIES)
            for agg in (
                F.sum(F.when(F.col("grp") == p, 1).otherwise(0))
                .cast("bigint")
                .alias(f"n_{i}"),
                F.sum(F.when(F.col("grp") == p, F.col("a2")).otherwise(0))
                .cast("bigint")
                .alias(f"s_{i}"),
                F.sum(
                    F.when(
                        F.col("grp") == p, F.col("a2") * F.col("a2")
                    ).otherwise(0)
                )
                .cast("bigint")
                .alias(f"q_{i}"),
            )
        ],
        F.sum("a2").cast("bigint").alias("s_all"),
        F.sum(F.col("a2") * F.col("a2")).cast("bigint").alias("q_all"),
    )
    t = None
    for i in range(5):
        term = (
            F.col(f"s_{i}").cast("double")
            * F.col(f"s_{i}")
            / F.col(f"n_{i}")
        )
        t = term if t is None else t + term
    mid = piv.select(
        "n",
        t.alias("t"),
        (F.col("s_all").cast("double") * F.col("s_all") / F.col("n")).alias(
            "grand"
        ),
        F.col("q_all").cast("double").alias("qd"),
    )
    return mid.select(
        "n",
        F.lit(4).cast("int").alias("df_between"),
        (F.col("n") - 5).alias("df_within"),
        F.round(
            ((F.col("t") - F.col("grand")) / 4)
            / ((F.col("qd") - F.col("t")) / (F.col("n") - 5)),
            4,
        ).alias("bf_stat"),
        F.round(
            (F.col("t") - F.col("grand")) / (F.col("qd") - F.col("grand")),
            6,
        ).alias("eta_sq"),
    )


_CRON_ITEMS_DUCK = (
    "CAST(l_quantity AS BIGINT) AS i1, "
    "CAST(round(l_discount * 100) AS BIGINT) AS i2, "
    "CAST(round(l_tax * 100) AS BIGINT) AS i3, "
    "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) // 100000"
    " AS i4"
)


@register(
    "q_agg_cronbach_alpha",
    oracle=f"""
        WITH items AS (
            SELECT {_CRON_ITEMS_DUCK},
                   CAST(l_quantity AS BIGINT)
                   + CAST(round(l_discount * 100) AS BIGINT)
                   + CAST(round(l_tax * 100) AS BIGINT)
                   + CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                          AS BIGINT) // 100000 AS t
            FROM lineitem
        ),
        m AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(i1) AS BIGINT) AS s1,
                   CAST(SUM(i2) AS BIGINT) AS s2,
                   CAST(SUM(i3) AS BIGINT) AS s3,
                   CAST(SUM(i4) AS BIGINT) AS s4,
                   CAST(SUM(i1 * i1) AS BIGINT) AS q1,
                   CAST(SUM(i2 * i2) AS BIGINT) AS q2,
                   CAST(SUM(i3 * i3) AS BIGINT) AS q3,
                   CAST(SUM(i4 * i4) AS BIGINT) AS q4,
                   CAST(SUM(t) AS BIGINT) AS st,
                   CAST(SUM(t * t) AS BIGINT) AS qt
            FROM items
        )
        SELECT n, 4 AS k_items,
               ROUND((4.0 / 3.0)
                     * (1 - CAST((((n * q1 - s1 * s1)
                                   + (n * q2 - s2 * s2))
                                   + (n * q3 - s3 * s3))
                                   + (n * q4 - s4 * s4) AS DOUBLE)
                         / (n * qt - st * st)), 4) AS cronbach_alpha
        FROM m
    """,
    section="A74",
    doc="Cronbach's alpha internal-consistency coefficient over 4 "
    "integer-quantized lineitem 'items' (quantity, discount bp, tax "
    "bp, price thousands) — the reliability gate for any composite "
    "score (quality scores, rubric sums) before averaging its "
    "components into one number. Item variances and the total-score "
    "variance all reduce from exact BIGINT moments in ONE pass; the "
    "n(n-1) variance denominators cancel in the ratio, so the only "
    "float op is the final division (rule 10, explicit fold "
    "nesting). Scale: a single map-side-combinable global reduction "
    "over 11 int64 moments — A66's shape.",
)
def q_agg_cronbach_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    i4 = F.expr(
        "cast(cast(l_extendedprice as decimal(18,2)) * 100 as bigint)"
        " div 100000"
    )
    items = li.select(
        F.col("l_quantity").cast("bigint").alias("i1"),
        F.round(F.col("l_discount") * 100).cast("bigint").alias("i2"),
        F.round(F.col("l_tax") * 100).cast("bigint").alias("i3"),
        i4.alias("i4"),
    ).withColumn(
        "t", F.col("i1") + F.col("i2") + F.col("i3") + F.col("i4")
    )
    m = items.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        *[
            agg
            for i in (1, 2, 3, 4)
            for agg in (
                F.sum(f"i{i}").cast("bigint").alias(f"s{i}"),
                F.sum(F.col(f"i{i}") * F.col(f"i{i}"))
                .cast("bigint")
                .alias(f"q{i}"),
            )
        ],
        F.sum("t").cast("bigint").alias("st"),
        F.sum(F.col("t") * F.col("t")).cast("bigint").alias("qt"),
    )
    v = None
    for i in (1, 2, 3, 4):
        vi = F.col("n") * F.col(f"q{i}") - F.col(f"s{i}") * F.col(f"s{i}")
        v = vi if v is None else v + vi
    vt = F.col("n") * F.col("qt") - F.col("st") * F.col("st")
    return m.select(
        "n",
        F.lit(4).cast("int").alias("k_items"),
        F.round(
            (F.lit(4.0) / 3.0) * (1 - v.cast("double") / vt), 4
        ).alias("cronbach_alpha"),
    )


@register(
    "q_agg_kendall_tau",
    oracle="""
        WITH d AS MATERIALIZED (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(SUM(CASE WHEN event_type = 'view'
                            THEN 1 ELSE 0 END) AS BIGINT) AS x,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                            THEN 1 ELSE 0 END) AS BIGINT) AS y
            FROM events GROUP BY 1
        ),
        pairs AS (
            SELECT CASE WHEN (a.x - b.x) * (a.y - b.y) > 0
                        THEN 1 ELSE 0 END AS conc,
                   CASE WHEN (a.x - b.x) * (a.y - b.y) < 0
                        THEN 1 ELSE 0 END AS disc,
                   CASE WHEN a.x = b.x AND a.y <> b.y
                        THEN 1 ELSE 0 END AS tx,
                   CASE WHEN a.y = b.y AND a.x <> b.x
                        THEN 1 ELSE 0 END AS ty
            FROM d a JOIN d b ON a.day < b.day
        ),
        m AS (
            SELECT CAST(SUM(conc) AS BIGINT) AS c,
                   CAST(SUM(disc) AS BIGINT) AS dd,
                   CAST(SUM(tx) AS BIGINT) AS tx,
                   CAST(SUM(ty) AS BIGINT) AS ty
            FROM pairs
        )
        SELECT c AS concordant, dd AS discordant,
               tx AS ties_x_only, ty AS ties_y_only,
               ROUND(CAST(c - dd AS DOUBLE)
                     / sqrt(CAST((c + dd + tx) AS DOUBLE)
                            * (c + dd + ty)), 4) AS tau_b
        FROM m
    """,
    section="A75",
    doc="Kendall tau-b rank correlation between daily view and purchase "
    "counts — the third correlation beside Pearson (A22) and Spearman "
    "(A64): tau's pair-concordance form is robust to outliers AND "
    "handles ties exactly (tau-b's denominator corrects for them), "
    "which Spearman's midrank device approximates. Computed on the "
    "DAY-GRAIN collapse first (TS7's rule), then the O(days^2) "
    "pair join runs on the |days| table — concordant/discordant/tie "
    "counts are exact integers; one sqrt at the end (rule 10). "
    "Scale: pair enumeration is bounded by the COLLECTION WINDOW "
    "(60 days = 1.7k pairs) at any event volume; for year-long "
    "windows the O(n log n) merge-sort tau applies, documented not "
    "implemented.",
)
def q_agg_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("y"),
    )
    a = d.select(
        F.col("day").alias("day_a"), F.col("x").alias("xa"),
        F.col("y").alias("ya"),
    )
    b = d.select(
        F.col("day").alias("day_b"), F.col("x").alias("xb"),
        F.col("y").alias("yb"),
    )
    dx = F.col("xa") - F.col("xb")
    dy = F.col("ya") - F.col("yb")
    pairs = a.join(b, F.col("day_a") < F.col("day_b")).select(
        F.when(dx * dy > 0, 1).otherwise(0).alias("conc"),
        F.when(dx * dy < 0, 1).otherwise(0).alias("disc"),
        F.when((dx == 0) & (dy != 0), 1).otherwise(0).alias("tx"),
        F.when((dy == 0) & (dx != 0), 1).otherwise(0).alias("ty"),
    )
    m = pairs.agg(
        F.sum("conc").cast("bigint").alias("c"),
        F.sum("disc").cast("bigint").alias("dd"),
        F.sum("tx").cast("bigint").alias("tx"),
        F.sum("ty").cast("bigint").alias("ty"),
    )
    return m.select(
        F.col("c").alias("concordant"),
        F.col("dd").alias("discordant"),
        F.col("tx").alias("ties_x_only"),
        F.col("ty").alias("ties_y_only"),
        F.round(
            (F.col("c") - F.col("dd")).cast("double")
            / F.sqrt(
                (F.col("c") + F.col("dd") + F.col("tx")).cast("double")
                * (F.col("c") + F.col("dd") + F.col("ty"))
            ),
            4,
        ).alias("tau_b"),
    )


@register(
    "q_agg_runs_test",
    oracle="""
        WITH d AS MATERIALIZED (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1
        ),
        sgn AS (
            SELECT day,
                   CASE WHEN x > lag(x) OVER (ORDER BY day) THEN 1
                        WHEN x < lag(x) OVER (ORDER BY day) THEN -1
                        ELSE 0 END AS s
            FROM d
        ),
        steps AS (
            SELECT day, s,
                   lag(s) OVER (ORDER BY day) AS prev_s
            FROM sgn WHERE s <> 0
        ),
        m AS (
            SELECT CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_up,
                   CAST(SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_down,
                   CAST(SUM(CASE WHEN prev_s IS NULL OR s <> prev_s
                            THEN 1 ELSE 0 END) AS BIGINT) AS runs
            FROM steps
        )
        SELECT n_up, n_down, runs,
               ROUND((runs - (2.0 * n_up * n_down
                              / (n_up + n_down) + 1))
                     / sqrt(2.0 * n_up * n_down
                            * (2.0 * n_up * n_down - n_up - n_down)
                            / ((CAST(n_up + n_down AS DOUBLE))
                               * (n_up + n_down)
                               * (n_up + n_down - 1))), 4) AS z
        FROM m
    """,
    section="A76",
    doc="Wald-Wolfowitz runs test on the daily event-count UP/DOWN "
    "direction sequence: counts runs of consecutive same-direction "
    "moves and standardizes against the exchangeable null — the "
    "randomness check that catches serial dependence TS6's "
    "autocorrelation misses when the magnitude is noisy but the "
    "SIGN streaks aren't (too few runs = trending, too many = "
    "oscillating feedback). Zero-change days are dropped (the "
    "standard tie handling, identical both engines); run boundaries "
    "come from one ordered lag over the day-grain sign sequence, so "
    "n_up/n_down/runs are exact integers and the z-score is one "
    "IEEE formula (rule 10). Scale: all windows run on the |days| "
    "spine after the TS7 collapse.",
)
def q_agg_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    w = Window.orderBy("day")
    sgn = d.select(
        "day",
        F.when(F.col("x") > F.lag("x").over(w), 1)
        .when(F.col("x") < F.lag("x").over(w), -1)
        .otherwise(0)
        .alias("s"),
    )
    steps = sgn.where(F.col("s") != 0).select(
        "day", "s", F.lag("s").over(w).alias("prev_s")
    )
    m = steps.agg(
        F.sum(F.when(F.col("s") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_up"),
        F.sum(F.when(F.col("s") == -1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_down"),
        F.sum(
            F.when(
                F.col("prev_s").isNull()
                | (F.col("s") != F.col("prev_s")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("runs"),
    )
    nu = F.col("n_up")
    nd = F.col("n_down")
    mu = 2.0 * nu * nd / (nu + nd) + 1
    var = (
        2.0
        * nu
        * nd
        * (2.0 * nu * nd - nu - nd)
        / (
            (nu + nd).cast("double")
            * (nu + nd)
            * (nu + nd - 1)
        )
    )
    return m.select(
        "n_up",
        "n_down",
        "runs",
        F.round((F.col("runs") - mu) / F.sqrt(var), 4).alias("z"),
    )


@register(
    "q_agg_dispersion",
    oracle="""
        WITH d AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1, 2
        ),
        m AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_days,
                   CAST(SUM(x) AS BIGINT) AS s,
                   CAST(SUM(x * x) AS BIGINT) AS q
            FROM d GROUP BY event_type
        )
        SELECT event_type, n_days,
               ROUND(CAST(s AS DOUBLE) / n_days, 4) AS mean_daily,
               ROUND(CAST(n_days * q - s * s AS DOUBLE)
                     / (CAST(n_days AS DOUBLE) * (n_days - 1))
                     / (CAST(s AS DOUBLE) / n_days), 4)
                   AS dispersion_index,
               CAST(CAST(n_days * q - s * s AS DOUBLE)
                    / (CAST(n_days AS DOUBLE) * (n_days - 1))
                    > 1.5 * (CAST(s AS DOUBLE) / n_days)
                    AS BOOLEAN) AS overdispersed
        FROM m
    """,
    section="A77",
    doc="Variance-to-mean dispersion index of daily counts per event "
    "type — THE model-choice gate for count data: index ~1 means "
    "Poisson assumptions (and Poisson-based alert thresholds like "
    "E38's) are safe; >1.5 flags overdispersion, where a negative-"
    "binomial model or wider control bands are required and Poisson "
    "confidence intervals silently over-alert. Sample variance and "
    "mean rebuilt from exact BIGINT day-grain moments (n*q - s^2 "
    "device); the 1.5 verdict threshold is applied to the same "
    "exact-moment expressions on both engines. Scale: one day-grain "
    "collapse then a 5-row reduction — TS7's rule.",
)
def q_agg_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    m = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("x").cast("bigint").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("q"),
    )
    mean = F.col("s").cast("double") / F.col("n_days")
    var = (
        F.col("n_days") * F.col("q") - F.col("s") * F.col("s")
    ).cast("double") / (
        F.col("n_days").cast("double") * (F.col("n_days") - 1)
    )
    return m.select(
        "event_type",
        "n_days",
        F.round(mean, 4).alias("mean_daily"),
        F.round(var / mean, 4).alias("dispersion_index"),
        (var > 1.5 * mean).alias("overdispersed"),
    )


@register(
    "q_agg_mad_robust",
    oracle="""
        WITH v AS (
            SELECT l_returnflag AS grp,
                   CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) // 100 AS x
            FROM lineitem
        ),
        med AS (
            SELECT grp, CAST(2 * median(x) AS BIGINT) AS m2
            FROM v GROUP BY grp
        ),
        dev AS (
            SELECT v.grp, v.x, abs(2 * v.x - m.m2) AS d2, m.m2
            FROM v JOIN med m ON v.grp = m.grp
        )
        SELECT grp AS l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(CAST(MIN(m2) AS DOUBLE) / 2, 1) AS median_dollars,
               ROUND(CAST(2 * median(d2) AS BIGINT) / 4.0, 2)
                   AS mad_dollars,
               ROUND((CAST(2 * median(d2) AS BIGINT) / 4.0)
                     / (CAST(MIN(m2) AS DOUBLE) / 2), 6) AS robust_cv
        FROM dev GROUP BY grp
    """,
    section="A78",
    doc="Median absolute deviation (MAD) robust scale per return-flag "
    "group on whole-dollar prices, with the robust coefficient of "
    "variation MAD/median — the outlier-immune spread estimate that "
    "A14's winsorized moments and W-family IQR approximate from "
    "different angles; MAD is the 50% breakdown-point gold standard "
    "and what robust z-scores (x-med)/(1.4826*MAD) divide by. "
    "Exactness: the DOUBLED-value device twice over — group median "
    "as exact integer 2*median, deviations as exact |2x - m2|, then "
    "the MAD itself as exact 2*median(d2), so the only floats are "
    "final display divisions (the .5-interpolated halves are exact "
    "binary fractions at every doubling level). Scale: two median "
    "passes (exact percentile per group) + one broadcast join — "
    "at 100 TB swap exact percentile for the t-digest twin (A20) "
    "per SCALE.md's quantile rule.",
)
def q_agg_mad_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    v = li.select(
        F.col("l_returnflag").alias("grp"),
        F.expr(
            "cast(cast(l_extendedprice as decimal(18,2)) * 100 as bigint)"
            " div 100"
        ).alias("x"),
    )
    med = v.groupBy("grp").agg(
        F.expr("cast(2 * percentile(x, 0.5) as bigint)").alias("m2")
    )
    dev = v.join(F.broadcast(med), "grp").select(
        "grp",
        F.abs(2 * F.col("x") - F.col("m2")).alias("d2"),
        "m2",
    )
    mad2 = F.expr("cast(2 * percentile(d2, 0.5) as bigint)")
    return dev.groupBy(F.col("grp").alias("l_returnflag")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.min("m2").cast("double") / 2, 1).alias("median_dollars"),
        F.round(mad2 / 4.0, 2).alias("mad_dollars"),
        F.round(
            (mad2 / 4.0) / (F.min("m2").cast("double") / 2), 6
        ).alias("robust_cv"),
    )


@register(
    "q_agg_group_jackknife",
    oracle="""
        WITH g AS (
            SELECT o_orderpriority AS grp,
                   CAST(COUNT(*) AS BIGINT) AS n_g,
                   CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                 * 100 AS BIGINT)) AS BIGINT) AS s_g
            FROM orders GROUP BY 1
        ),
        tot AS (
            SELECT CAST(SUM(n_g) AS BIGINT) AS n,
                   CAST(SUM(s_g) AS BIGINT) AS s,
                   CAST(COUNT(*) AS BIGINT) AS k
            FROM g
        ),
        pseudo AS (
            SELECT g.grp,
                   CAST(t.s - g.s_g AS DOUBLE) / (t.n - g.n_g) / 100
                       AS theta_minus,
                   t.k,
                   CAST(t.s AS DOUBLE) / t.n / 100 AS theta_hat
            FROM g CROSS JOIN tot t
        ),
        jk AS (
            SELECT k, theta_hat,
                   CAST(SUM(CAST(floor(theta_minus * 1e6)
                            AS DECIMAL(38,0))) AS DOUBLE) / 1e6 / k
                       AS theta_dot
            FROM pseudo GROUP BY k, theta_hat
        )
        SELECT CAST(p.k AS BIGINT) AS k_groups,
               ROUND(p.theta_hat, 4) AS mean_price,
               ROUND((CAST(p.k AS DOUBLE) - 1) / p.k
                     * (CAST(SUM(CAST(floor((p.theta_minus - j.theta_dot)
                                      * (p.theta_minus - j.theta_dot)
                                      * 1e6) AS DECIMAL(38,0)))
                             AS DOUBLE) / 1e6), 4) AS jk_variance
        FROM pseudo p CROSS JOIN jk j
        GROUP BY p.k, p.theta_hat, j.theta_dot
    """,
    section="A79",
    doc="Delete-one-GROUP jackknife variance of the mean order price "
    "over the 5 priority strata — the resampling-free uncertainty "
    "estimate for CLUSTERED data, where A49's Poisson bootstrap "
    "and IID formulas both understate error because rows within a "
    "stratum co-vary; delete-a-group is also exactly the recipe "
    "production pipelines use for error bars over data SHARDS "
    "(drop shard i, recompute, spread of the k leave-outs). Each "
    "leave-out mean comes from exact global-minus-group BIGINT cent "
    "sums (no recomputation pass per group); the two float folds "
    "(pseudo-value mean, squared deviations) quantize at 1e6 into "
    "DECIMAL so fold order can't flip the hash (rule 10). Scale: "
    "one group collapse + k-row arithmetic — adding shards adds "
    "rows to a 5-row table.",
)
def q_agg_group_jackknife(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    cents = F.expr(
        "cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)"
    )
    g = od.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum(cents).cast("bigint").alias("s_g"),
    )
    tot = g.agg(
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum("s_g").cast("bigint").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    pseudo = g.crossJoin(F.broadcast(tot)).select(
        "grp",
        (
            (F.col("s") - F.col("s_g")).cast("double")
            / (F.col("n") - F.col("n_g"))
            / 100
        ).alias("theta_minus"),
        "k",
        (F.col("s").cast("double") / F.col("n") / 100).alias("theta_hat"),
    )
    jk = pseudo.groupBy("k", "theta_hat").agg(
        (
            F.sum(
                F.floor(F.col("theta_minus") * 1e6).cast("decimal(38,0)")
            ).cast("double")
            / 1e6
            / F.col("k")
        ).alias("theta_dot")
    )
    dev = F.col("theta_minus") - F.col("theta_dot")
    return (
        pseudo.crossJoin(F.broadcast(jk.select("theta_dot")))
        .groupBy(
            F.col("k").cast("bigint").alias("k_groups"),
            F.round("theta_hat", 4).alias("mean_price"),
            "theta_dot",
        )
        .agg(
            F.round(
                (F.col("k_groups").cast("double") - 1)
                / F.col("k_groups")
                * (
                    F.sum(
                        F.floor(dev * dev * 1e6).cast("decimal(38,0)")
                    ).cast("double")
                    / 1e6
                ),
                4,
            ).alias("jk_variance")
        )
        .select("k_groups", "mean_price", "jk_variance")
    )


@register(
    "q_agg_cohens_d",
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
                   (CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb)
                       AS mean_diff,
                   ((CAST(sa2 AS DOUBLE)
                     - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) / na)
                    + (CAST(sb2 AS DOUBLE)
                       - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) / nb))
                       / (na + nb - 2) AS sp2
            FROM m
        )
        SELECT na, nb,
               ROUND(mean_diff / sqrt(sp2), 4) AS cohens_d,
               ROUND(mean_diff / sqrt(sp2)
                     * (1 - 3.0 / (4 * (na + nb) - 9)), 4) AS hedges_g
        FROM d
    """,
    section="A80",
    doc=f"Cohen's d (pooled-SD standardized mean difference) + the "
    f"small-sample Hedges' g correction for account balances, {_T_A} "
    f"vs {_T_B} — the EFFECT SIZE companion to A28's Welch t: t tells "
    "you a difference exists, d tells you whether it's big enough to "
    "act on (the gap between 'significant' and 'matters' that every "
    "large-n A/B test hits, where t explodes while d stays "
    "negligible). The pooled sum-of-squares (na-1)va + (nb-1)vb "
    "simplifies to exact (sa2 - sa^2/na) + (sb2 - sb^2/nb) cent "
    "moments from A28's ONE conditional pass; d and g are single "
    "IEEE expression trees over them, rounded 4dp. Scale: one "
    "map-side-combinable reduction — A66's shape.",
)
def q_agg_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment").isin(_T_A, _T_B)
    )
    qb = F.expr(_Q_BAL_SPARK)
    is_a = F.col("c_mktsegment") == _T_A
    is_b = F.col("c_mktsegment") == _T_B
    m = cu.select(qb.alias("qb"), is_a.alias("ia"), is_b.alias("ib")).agg(
        F.sum(F.when(F.col("ia"), 1).otherwise(0))
        .cast("bigint")
        .alias("na"),
        F.sum(F.when(F.col("ia"), F.col("qb")).otherwise(0))
        .cast("bigint")
        .alias("sa"),
        F.sum(F.when(F.col("ia"), F.col("qb") * F.col("qb")).otherwise(0))
        .cast("bigint")
        .alias("sa2"),
        F.sum(F.when(F.col("ib"), 1).otherwise(0))
        .cast("bigint")
        .alias("nb"),
        F.sum(F.when(F.col("ib"), F.col("qb")).otherwise(0))
        .cast("bigint")
        .alias("sb"),
        F.sum(F.when(F.col("ib"), F.col("qb") * F.col("qb")).otherwise(0))
        .cast("bigint")
        .alias("sb2"),
    )
    na, nb = F.col("na"), F.col("nb")
    mean_diff = F.col("sa").cast("double") / na - F.col(
        "sb"
    ).cast("double") / nb
    ssa = (
        F.col("sa2").cast("double")
        - F.col("sa").cast("double") * F.col("sa").cast("double") / na
    )
    ssb = (
        F.col("sb2").cast("double")
        - F.col("sb").cast("double") * F.col("sb").cast("double") / nb
    )
    d = m.select(
        "na",
        "nb",
        mean_diff.alias("mean_diff"),
        ((ssa + ssb) / (na + nb - 2)).alias("sp2"),
    )
    dd = F.col("mean_diff") / F.sqrt(F.col("sp2"))
    return d.select(
        "na",
        "nb",
        F.round(dd, 4).alias("cohens_d"),
        F.round(
            dd * (1 - 3.0 / (4 * (F.col("na") + F.col("nb")) - 9)), 4
        ).alias("hedges_g"),
    )


def _dl_fold(expr_fmt: str) -> str:
    """Explicit left-nested 5-term fold over stratum indices (A66 device)."""
    t = expr_fmt.format(i=0)
    for i in range(1, 5):
        t = f"({t} + {expr_fmt.format(i=i)})"
    return t


@register(
    "q_agg_meta_dl",
    oracle=f"""
        WITH piv AS (
            SELECT {{pivot}}
            FROM orders
        ),
        pv AS (
            SELECT *,
                   {", ".join(
                       f"CAST(k_{i} AS DOUBLE) / n_{i} AS p_{i}, "
                       f"CAST(k_{i} AS DOUBLE) / n_{i}"
                       f" * (1 - CAST(k_{i} AS DOUBLE) / n_{i}) / n_{i}"
                       f" AS v_{i}"
                       for i in range(5)
                   )}
            FROM piv
        ),
        wv AS (
            SELECT *, {", ".join(f"1 / v_{i} AS w_{i}" for i in range(5))}
            FROM pv
        ),
        s1 AS (
            SELECT *,
                   {_dl_fold("w_{i}")} AS sw,
                   {_dl_fold("w_{i} * p_{i}")} AS swp,
                   {_dl_fold("w_{i} * w_{i}")} AS sw2
            FROM wv
        ),
        s2 AS (
            SELECT *, swp / sw AS pf, sw - sw2 / sw AS c
            FROM s1
        ),
        s3 AS (
            SELECT *,
                   {_dl_fold("w_{i} * (p_{i} - pf) * (p_{i} - pf)")} AS q
            FROM s2
        ),
        s4 AS (
            SELECT *, greatest(0, (q - 4) / c) AS tau2
            FROM s3
        ),
        s5 AS (
            SELECT *,
                   {_dl_fold("1 / (v_{i} + tau2)")} AS sws,
                   {_dl_fold("p_{i} / (v_{i} + tau2)")} AS swsp
            FROM s4
        )
        SELECT 5 AS k_strata,
               ROUND(q, 4) AS q_stat,
               ROUND(tau2, 8) AS tau2,
               ROUND(pf, 6) AS pooled_fixed,
               ROUND(swsp / sws, 6) AS pooled_random,
               ROUND(swsp / sws - 1.96 * sqrt(1 / sws), 6) AS ci_low,
               ROUND(swsp / sws + 1.96 * sqrt(1 / sws), 6) AS ci_high
        FROM s5
    """.replace("{pivot}", ", ".join(
        f"CAST(SUM(CASE WHEN o_orderpriority = '{p}' THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS n_{i}, "
        f"CAST(SUM(CASE WHEN o_orderpriority = '{p}'"
        f" AND o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS k_{i}"
        for i, p in enumerate(_KW_PRIORITIES)
    )),
    section="A81",
    doc="DerSimonian-Laird random-effects meta-analysis of the "
    "fulfilled-order rate across the 5 priority strata: fixed-effect "
    "pooled rate, Cochran's Q heterogeneity, the DL between-stratum "
    "variance tau^2, and the random-effects pooled rate with 95% CI "
    "— the stratified-pooling operator that A71's Mantel-Haenszel "
    "deliberately is NOT (MH assumes one common effect; DL models "
    "strata drawn from a DISTRIBUTION of effects, and tau^2 > 0 is "
    "the evidence the common-effect assumption failed — run both, "
    "report DL when they disagree). All stratum rates come from one "
    "conditional-aggregation pass of exact integer counts; every "
    "weighted fold is the explicit left-nested A66 device so both "
    "engines share the IEEE op order through seven formula layers "
    "(rule 10). Scale: a single map-side-combinable reduction to a "
    "1-row table; adding strata widens the pivot, not the data "
    "path.",
)
def q_agg_meta_dl(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    piv = od.agg(
        *[
            agg
            for i, p in enumerate(_KW_PRIORITIES)
            for agg in (
                F.sum(
                    F.when(F.col("o_orderpriority") == p, 1).otherwise(0)
                )
                .cast("bigint")
                .alias(f"n_{i}"),
                F.sum(
                    F.when(
                        (F.col("o_orderpriority") == p)
                        & (F.col("o_orderstatus") == "F"),
                        1,
                    ).otherwise(0)
                )
                .cast("bigint")
                .alias(f"k_{i}"),
            )
        ]
    )
    pv = piv.select(
        "*",
        *[
            c
            for i in range(5)
            for c in (
                (F.col(f"k_{i}").cast("double") / F.col(f"n_{i}")).alias(
                    f"p_{i}"
                ),
                (
                    F.col(f"k_{i}").cast("double")
                    / F.col(f"n_{i}")
                    * (
                        1
                        - F.col(f"k_{i}").cast("double") / F.col(f"n_{i}")
                    )
                    / F.col(f"n_{i}")
                ).alias(f"v_{i}"),
            )
        ],
    )
    wv = pv.select(
        "*", *[(1 / F.col(f"v_{i}")).alias(f"w_{i}") for i in range(5)]
    )

    def _fold(make):
        t = make(0)
        for i in range(1, 5):
            t = t + make(i)
        return t

    s1 = wv.select(
        "*",
        _fold(lambda i: F.col(f"w_{i}")).alias("sw"),
        _fold(lambda i: F.col(f"w_{i}") * F.col(f"p_{i}")).alias("swp"),
        _fold(lambda i: F.col(f"w_{i}") * F.col(f"w_{i}")).alias("sw2"),
    )
    s2 = s1.select(
        "*",
        (F.col("swp") / F.col("sw")).alias("pf"),
        (F.col("sw") - F.col("sw2") / F.col("sw")).alias("c"),
    )
    s3 = s2.select(
        "*",
        _fold(
            lambda i: F.col(f"w_{i}")
            * (F.col(f"p_{i}") - F.col("pf"))
            * (F.col(f"p_{i}") - F.col("pf"))
        ).alias("q"),
    )
    s4 = s3.select(
        "*",
        F.greatest(F.lit(0.0), (F.col("q") - 4) / F.col("c")).alias("tau2"),
    )
    s5 = s4.select(
        "*",
        _fold(lambda i: 1 / (F.col(f"v_{i}") + F.col("tau2"))).alias("sws"),
        _fold(
            lambda i: F.col(f"p_{i}") / (F.col(f"v_{i}") + F.col("tau2"))
        ).alias("swsp"),
    )
    pr = F.col("swsp") / F.col("sws")
    half = 1.96 * F.sqrt(1 / F.col("sws"))
    return s5.select(
        F.lit(5).cast("int").alias("k_strata"),
        F.round("q", 4).alias("q_stat"),
        F.round("tau2", 8).alias("tau2"),
        F.round("pf", 6).alias("pooled_fixed"),
        F.round(pr, 6).alias("pooled_random"),
        F.round(pr - half, 6).alias("ci_low"),
        F.round(pr + half, 6).alias("ci_high"),
    )


@register(
    "q_agg_bland_altman",
    oracle="""
        WITH pair AS (
            SELECT o.o_orderkey,
                   CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS header_cents,
                   CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                                 * 100 AS BIGINT)) AS BIGINT) AS line_cents
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            GROUP BY o.o_orderkey, o.o_totalprice
        ),
        d AS (
            SELECT header_cents - line_cents AS diff FROM pair
        ),
        m AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(diff) AS BIGINT) AS s,
                   CAST(SUM(diff * diff) AS DECIMAL(38,0)) AS q
            FROM d
        )
        SELECT n,
               ROUND(CAST(s AS DOUBLE) / n / 100, 4) AS bias_dollars,
               ROUND(sqrt((CAST(q AS DOUBLE)
                           - CAST(s AS DOUBLE) * s / n) / (n - 1))
                     / 100, 4) AS sd_dollars,
               ROUND((CAST(s AS DOUBLE) / n
                      - 1.96 * sqrt((CAST(q AS DOUBLE)
                                     - CAST(s AS DOUBLE) * s / n)
                                    / (n - 1))) / 100, 4) AS loa_low,
               ROUND((CAST(s AS DOUBLE) / n
                      + 1.96 * sqrt((CAST(q AS DOUBLE)
                                     - CAST(s AS DOUBLE) * s / n)
                                    / (n - 1))) / 100, 4) AS loa_high
        FROM m
    """,
    section="A82",
    doc="Bland-Altman agreement analysis between the two 'measurements' "
    "of an order's value — the header o_totalprice vs the summed "
    "line prices: mean bias and the 95% limits of agreement "
    "(bias +/- 1.96 SD of the per-order differences). E34 CLASSIFIES "
    "individual gaps into tolerance bands; Bland-Altman is the "
    "STATISTICAL summary regulators and method-comparison studies "
    "expect — a tight LoA band certifies the two pipelines agree "
    "within noise, a wide one quantifies exactly how much slack a "
    "reconciliation tolerance needs. Per-order cent diffs are exact "
    "integers from one co-keyed collapse (J23's shape); the diff "
    "moments use a DECIMAL(38,0) square sum (cent-squares overflow "
    "int64 past ~2.5k-cent diffs x 1e5 rows); bias/SD/LoA are "
    "single IEEE trees (rule 10). Scale: one fact-key join + one "
    "global reduction.",
)
def q_agg_bland_altman(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pair = (
        od.join(li, od.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(
            F.sum(
                F.expr(
                    "cast(cast(l_extendedprice as decimal(18,2)) * 100"
                    " as bigint)"
                )
            )
            .cast("bigint")
            .alias("line_cents")
        )
        .select(
            (
                F.expr(
                    "cast(cast(o_totalprice as decimal(18,2)) * 100"
                    " as bigint)"
                )
                - F.col("line_cents")
            ).alias("diff")
        )
    )
    m = pair.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("diff").cast("bigint").alias("s"),
        F.sum(F.col("diff").cast("decimal(19,0)") * F.col("diff"))
        .cast("decimal(38,0)")
        .alias("q"),
    )
    sd = F.sqrt(
        (
            F.col("q").cast("double")
            - F.col("s").cast("double") * F.col("s") / F.col("n")
        )
        / (F.col("n") - 1)
    )
    bias = F.col("s").cast("double") / F.col("n")
    return m.select(
        "n",
        F.round(bias / 100, 4).alias("bias_dollars"),
        F.round(sd / 100, 4).alias("sd_dollars"),
        F.round((bias - 1.96 * sd) / 100, 4).alias("loa_low"),
        F.round((bias + 1.96 * sd) / 100, 4).alias("loa_high"),
    )


@register(
    "q_agg_friedman",
    oracle="""
        WITH cell AS (
            SELECT c.c_nationkey AS blk, o.o_orderpriority AS cond,
                   CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2))
                                 * 100 AS BIGINT)) AS BIGINT) AS cents,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2
        ),
        full_blk AS (
            SELECT blk FROM cell GROUP BY blk HAVING COUNT(*) = 5
        ),
        ranked AS (
            SELECT c.blk, c.cond,
                   CAST(ROW_NUMBER() OVER (
                        PARTITION BY c.blk
                        ORDER BY CAST(c.cents AS DOUBLE) / c.n, c.cond
                   ) AS BIGINT) AS rk
            FROM cell c JOIN full_blk f ON c.blk = f.blk
        ),
        rsum AS (
            SELECT cond, CAST(SUM(rk) AS BIGINT) AS r_j,
                   CAST(COUNT(*) AS BIGINT) AS n_blocks
            FROM ranked GROUP BY cond
        ),
        m AS (
            SELECT CAST(MAX(n_blocks) AS BIGINT) AS nb,
                   CAST(SUM(r_j * r_j) AS BIGINT) AS sr2
            FROM rsum
        )
        SELECT nb AS n_blocks, 5 AS k_conditions,
               ROUND(12.0 * sr2 / (nb * 5 * 6) - 3.0 * nb * 6, 4)
                   AS friedman_chi2
        FROM m
    """,
    section="A83",
    doc="Friedman blocked rank test: does mean order price differ "
    "across the 5 priorities when RANKED WITHIN each nation block — "
    "the repeated-measures completion of the rank-test family (A65 "
    "Kruskal-Wallis assumes independent groups; Friedman removes "
    "the between-nation level shift by ranking within block, which "
    "is exactly the paired design any per-tenant / per-region "
    "comparison needs). Per-cell means compared as one double "
    "division over exact cent sums with a condition tie-break, so "
    "within-block ranks (1..5, no ties by construction) are "
    "deterministic; rank sums and the chi-square are then pure "
    "integer arithmetic to one final expression. Blocks missing a "
    "condition are excluded (the balanced-design contract, "
    "identical both engines). Scale: one fact collapse to the "
    "(nation x priority) grain, one 5-row window per block — "
    "domain-bounded everywhere.",
)
def q_agg_friedman(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    cell = (
        od.join(cu, od.o_custkey == cu.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("blk"),
            F.col("o_orderpriority").alias("cond"),
        )
        .agg(
            F.sum(
                F.expr(
                    "cast(cast(o_totalprice as decimal(18,2)) * 100"
                    " as bigint)"
                )
            )
            .cast("bigint")
            .alias("cents"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    full_blk = cell.groupBy("blk").agg(
        F.count(F.lit(1)).alias("nc")
    ).where(F.col("nc") == 5).select("blk")
    w = Window.partitionBy("blk").orderBy(
        F.col("cents").cast("double") / F.col("n"), F.col("cond")
    )
    ranked = (
        cell.join(F.broadcast(full_blk), "blk")
        .select(
            "blk", "cond", F.row_number().over(w).cast("bigint").alias("rk")
        )
    )
    rsum = ranked.groupBy("cond").agg(
        F.sum("rk").cast("bigint").alias("r_j"),
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
    )
    m = rsum.agg(
        F.max("n_blocks").cast("bigint").alias("nb"),
        F.sum(F.col("r_j") * F.col("r_j")).cast("bigint").alias("sr2"),
    )
    return m.select(
        F.col("nb").alias("n_blocks"),
        F.lit(5).cast("int").alias("k_conditions"),
        F.round(
            12.0 * F.col("sr2") / (F.col("nb") * 5 * 6)
            - 3.0 * F.col("nb") * 6,
            4,
        ).alias("friedman_chi2"),
    )

@register(
    "q_agg_wilcoxon_signed_rank",
    oracle="""
        WITH d AS MATERIALIZED (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(SUM(CASE WHEN event_type = 'view'
                            THEN 1 ELSE 0 END) AS BIGINT)
                   - CAST(SUM(CASE WHEN event_type = 'purchase'
                              THEN 1 ELSE 0 END) AS BIGINT) AS diff
            FROM events GROUP BY 1
        ),
        nz AS (SELECT diff, abs(diff) AS ad FROM d WHERE diff <> 0),
        grp AS (
            SELECT ad,
                   CAST(COUNT(*) AS BIGINT) AS cnt,
                   CAST(SUM(CASE WHEN diff > 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_pos
            FROM nz GROUP BY ad
        ),
        mr AS (
            SELECT ad, cnt, n_pos,
                   2 * (CAST(SUM(cnt) OVER (ORDER BY ad
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS BIGINT) - cnt)
                   + cnt + 1 AS midrank2
            FROM grp
        ),
        m AS (
            SELECT CAST(SUM(cnt) AS BIGINT) AS n,
                   CAST(SUM(n_pos * midrank2) AS BIGINT) AS w2_plus,
                   CAST(SUM(cnt * midrank2 * midrank2) AS BIGINT) AS sr2
            FROM mr
        )
        SELECT n,
               CAST(w2_plus AS DOUBLE) / 2 AS w_plus,
               ROUND((CAST(w2_plus AS DOUBLE) / 2
                      - CAST(n AS DOUBLE) * (n + 1) / 4)
                     / sqrt(CAST(sr2 AS DOUBLE) / 16), 4) AS z
        FROM m
    """,
    section="A84",
    doc="Wilcoxon signed-rank test on paired daily view-vs-purchase "
    "counts: midranks of |diff| with exact tie handling, W+ = rank "
    "sum of the positive side, z standardized with the TIE-EXACT "
    "variance sum(r_i^2)/4 — the paired-sample completion of the "
    "rank family (A42 Mann-Whitney = independent two-sample, A65 "
    "KW = k-sample, A83 Friedman = blocked k-sample; signed rank is "
    "the workhorse for before/after comparisons where a sign test "
    "wastes magnitude information). Exactness device: midranks are "
    "computed on the |diff|-GROUPED table (one row per distinct "
    "magnitude, so the cumulative window has no within-tie order "
    "ambiguity — a row-grain cumulative would make each tied row's "
    "rank depend on physical position), carried as exact DOUBLED "
    "integers 2*(below) + cnt + 1 (the A64 device); W+ and the "
    "variance are exact integer sums to the final z. Zero diffs "
    "dropped (standard Wilcoxon). Scale: day-grain collapse, then "
    "one window over the MAGNITUDE-domain table.",
)
def q_agg_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        (
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
            - F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
        )
        .cast("bigint")
        .alias("diff")
    )
    nz = d.where(F.col("diff") != 0).select(
        "diff", F.abs(F.col("diff")).alias("ad")
    )
    grp = nz.groupBy("ad").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum(F.when(F.col("diff") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_pos"),
    )
    w = Window.orderBy("ad").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    mr = grp.select(
        "cnt",
        "n_pos",
        (
            2 * (F.sum("cnt").over(w).cast("bigint") - F.col("cnt"))
            + F.col("cnt")
            + 1
        ).alias("midrank2"),
    )
    m = mr.agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.sum(F.col("n_pos") * F.col("midrank2"))
        .cast("bigint")
        .alias("w2_plus"),
        F.sum(F.col("cnt") * F.col("midrank2") * F.col("midrank2"))
        .cast("bigint")
        .alias("sr2"),
    )
    wp = F.col("w2_plus").cast("double") / 2
    return m.select(
        "n",
        wp.alias("w_plus"),
        F.round(
            (wp - F.col("n").cast("double") * (F.col("n") + 1) / 4)
            / F.sqrt(F.col("sr2").cast("double") / 16),
            4,
        ).alias("z"),
    )


@register(
    "q_agg_rank_biserial",
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
        )
        SELECT n1, n2,
               ROUND((r1 - CAST(n1 AS DOUBLE) * (n1 + 1) / 2.0)
                     / (CAST(n1 AS DOUBLE) * n2), 6) AS cles,
               ROUND(2.0 * (r1 - CAST(n1 AS DOUBLE) * (n1 + 1) / 2.0)
                     / (CAST(n1 AS DOUBLE) * n2) - 1, 6)
                   AS rank_biserial_r
        FROM m
    """,
    section="A85",
    doc="Rank-biserial correlation + the common-language effect size "
    "(CLES = U/(n1*n2) = P(random F order exceeds random O order)) "
    "for A37's Mann-Whitney comparison — the effect-size member of "
    "the rank family, closing the significance-vs-magnitude gap the "
    "same way A80's Cohen's d does for A28's t: at large n the MW z "
    "is always 'significant' while CLES ~ 0.5 says the dominance is "
    "practically nil. Same tie-averaged DECIMAL rank sum as A37 "
    "(exact .0/.5 halves); both outputs are single divisions over "
    "exact moments. Scale: one ranked window + one reduction.",
)
def q_agg_rank_biserial(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale note (r6): same distributed-rank device as q_agg_mann_whitney —
    # rank(v) = min(global_rn) per tie group, both windows keyed by v.
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
        F.sum("g").cast("bigint").alias("n1"),
        F.sum(1 - F.col("g")).cast("bigint").alias("n2"),
        F.sum(F.when(F.col("g") == 1, avg_rank))
        .cast("double")
        .alias("r1"),
    )
    u = F.col("r1") - F.col("n1").cast("double") * (F.col("n1") + 1) / 2.0
    denom = F.col("n1").cast("double") * F.col("n2")
    return m.select(
        "n1",
        "n2",
        F.round(u / denom, 6).alias("cles"),
        F.round(2.0 * u / denom - 1, 6).alias("rank_biserial_r"),
    )


@register(
    "q_agg_ks_exact",
    oracle="""
        WITH s AS (
            SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS v,
                   CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS g
            FROM orders WHERE o_orderstatus IN ('F', 'O')
        ),
        grp AS (
            SELECT v,
                   CAST(SUM(g) AS BIGINT) AS c1,
                   CAST(SUM(1 - g) AS BIGINT) AS c2
            FROM s GROUP BY v
        ),
        cum AS (
            SELECT v,
                   CAST(SUM(c1) OVER (ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS BIGINT) AS f1,
                   CAST(SUM(c2) OVER (ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS BIGINT) AS f2
            FROM grp
        ),
        tot AS (
            SELECT CAST(SUM(c1) AS BIGINT) AS n1,
                   CAST(SUM(c2) AS BIGINT) AS n2
            FROM grp
        ),
        dmax AS (
            SELECT CAST(MAX(abs(f1 * t.n2 - f2 * t.n1)) AS BIGINT)
                       AS d_num,
                   CAST(MAX(t.n1) AS BIGINT) AS n1,
                   CAST(MAX(t.n2) AS BIGINT) AS n2
            FROM cum CROSS JOIN tot t
        )
        SELECT n1, n2, d_num,
               ROUND(CAST(d_num AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2), 6)
                   AS ks_d,
               ROUND(CAST(d_num AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2)
                     * sqrt(CAST(n1 AS DOUBLE) * n2 / (n1 + n2)), 4)
                   AS ks_stat_scaled
        FROM dmax
    """,
    section="A86",
    doc="EXACT two-sample Kolmogorov-Smirnov D on order values (status "
    "F vs O): the supremum ECDF gap evaluated at EVERY distinct "
    "value, not A27's fixed bins — the binned D is a lower bound "
    "that can miss a sharp distributional divergence falling inside "
    "one bin, so this is the certifying form (report binned for "
    "speed, exact when the verdict is close to the threshold). "
    "Exactness device: the gap is maximized as the INTEGER "
    "|F1*n2 - F2*n1| over cent-grain cumulative counts (value-"
    "grouped first, so the ECDF step points are unambiguous and no "
    "float division happens until the reported D) — argmax-free, "
    "tie-free, bit-exact. sqrt(n1*n2/(n1+n2))*D is the asymptotic "
    "KS statistic. Scale: one value-grain collapse + one ordered "
    "window over the VALUE DOMAIN (A27's rank-table contract), two "
    "scalar reductions.",
)
def q_agg_ks_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    s = orders.where(F.col("o_orderstatus").isin("F", "O")).select(
        F.expr(
            "cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)"
        ).alias("v"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("g"),
    )
    grp = s.groupBy("v").agg(
        F.sum("g").cast("bigint").alias("c1"),
        F.sum(1 - F.col("g")).cast("bigint").alias("c2"),
    )
    w = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = grp.select(
        F.sum("c1").over(w).cast("bigint").alias("f1"),
        F.sum("c2").over(w).cast("bigint").alias("f2"),
    )
    tot = grp.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
    )
    dmax = cum.crossJoin(F.broadcast(tot)).agg(
        F.max(
            F.abs(F.col("f1") * F.col("n2") - F.col("f2") * F.col("n1"))
        )
        .cast("bigint")
        .alias("d_num"),
        F.max("n1").cast("bigint").alias("n1"),
        F.max("n2").cast("bigint").alias("n2"),
    )
    d = F.col("d_num").cast("double") / (
        F.col("n1").cast("double") * F.col("n2")
    )
    return dmax.select(
        "n1",
        "n2",
        "d_num",
        F.round(d, 6).alias("ks_d"),
        F.round(
            d
            * F.sqrt(
                F.col("n1").cast("double")
                * F.col("n2")
                / (F.col("n1") + F.col("n2"))
            ),
            4,
        ).alias("ks_stat_scaled"),
    )


@register(
    "q_agg_prop_posthoc",
    oracle=f"""
        WITH g AS (
            SELECT o_orderpriority AS grp,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN o_orderstatus = 'F'
                            THEN 1 ELSE 0 END) AS BIGINT) AS k
            FROM orders GROUP BY 1
        ),
        pairs AS (
            SELECT a.grp AS grp_a, b.grp AS grp_b,
                   a.n AS na, a.k AS ka, b.n AS nb, b.k AS kb
            FROM g a JOIN g b ON a.grp < b.grp
        ),
        z AS (
            SELECT grp_a, grp_b,
                   (CAST(ka AS DOUBLE) / na - CAST(kb AS DOUBLE) / nb)
                   / sqrt((CAST(ka + kb AS DOUBLE) / (na + nb))
                          * (1 - CAST(ka + kb AS DOUBLE) / (na + nb))
                          * (1.0 / na + 1.0 / nb)) AS z
            FROM pairs
        ),
        ranked AS (
            SELECT grp_a, grp_b, z, abs(z) AS az,
                   CAST(ROW_NUMBER() OVER (ORDER BY abs(z) DESC,
                                           grp_a, grp_b) AS BIGINT) AS rk,
                   CAST(COUNT(*) OVER () AS BIGINT) AS m
            FROM z
        )
        SELECT grp_a, grp_b,
               ROUND(z, 4) AS z,
               rk AS severity_rank,
               CAST(az > 2.807 AS BOOLEAN) AS flagged_bonferroni
        FROM ranked
    """,
    section="A87",
    doc="Pairwise post-hoc z tests on fulfilled-order PROPORTIONS after "
    "an omnibus chi-square (A23): all 10 priority pairs' pooled-"
    "variance two-proportion z, severity-ranked, with a Bonferroni "
    "flag at the family-wise critical value z_{{0.05/(2*10)}} = 2.807 "
    "(the fixed constant is part of the contract) — A69's Tukey HSD does this for MEANS; "
    "proportions need their own post-hoc, and 'which pair drives "
    "the chi-square' is the actionable half of every segmentation "
    "readout. Counts exact, each z one IEEE tree, ranking fully "
    "tie-broken by the pair key. Scale: 5-row collapse, 10-row "
    "arithmetic.",
)
def q_agg_prop_posthoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    g = od.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
        .cast("bigint")
        .alias("k"),
    )
    a = g.select(
        F.col("grp").alias("grp_a"),
        F.col("n").alias("na"),
        F.col("k").alias("ka"),
    )
    b = g.select(
        F.col("grp").alias("grp_b"),
        F.col("n").alias("nb"),
        F.col("k").alias("kb"),
    )
    pairs = a.join(F.broadcast(b), F.col("grp_a") < F.col("grp_b"))
    pp = (F.col("ka") + F.col("kb")).cast("double") / (
        F.col("na") + F.col("nb")
    )
    zc = (
        F.col("ka").cast("double") / F.col("na")
        - F.col("kb").cast("double") / F.col("nb")
    ) / F.sqrt(pp * (1 - pp) * (1.0 / F.col("na") + 1.0 / F.col("nb")))
    z = pairs.select("grp_a", "grp_b", zc.alias("z"))
    wrk = Window.orderBy(F.desc(F.abs(F.col("z"))), "grp_a", "grp_b")
    ranked = z.select(
        "grp_a",
        "grp_b",
        "z",
        F.abs(F.col("z")).alias("az"),
        F.row_number().over(wrk).cast("bigint").alias("rk"),
        F.count(F.lit(1)).over(
            Window.partitionBy()
        ).cast("bigint").alias("m"),
    )
    return ranked.select(
        "grp_a",
        "grp_b",
        F.round("z", 4).alias("z"),
        F.col("rk").alias("severity_rank"),
        (F.col("az") > 2.807).alias("flagged_bonferroni"),
    )


_CHOW_SPLIT = "1998-06-01"   # tested break point (fixture midpoint)


def _chow_moments_duck(flt: str, sfx: str) -> str:
    return f"""
            SELECT CAST(COUNT(*) AS BIGINT) AS n_{sfx},
                   CAST(SUM(t) AS BIGINT) AS st_{sfx},
                   CAST(SUM(y) AS BIGINT) AS sy_{sfx},
                   CAST(SUM(t * t) AS BIGINT) AS stt_{sfx},
                   CAST(SUM(t * y) AS BIGINT) AS sty_{sfx},
                   CAST(SUM(y * y) AS BIGINT) AS syy_{sfx}
            FROM d WHERE {flt}"""


_CHOW_SSR_DUCK = (
    "((CAST(n_{s} AS DOUBLE) * CAST(syy_{s} AS DOUBLE)"
    "  - CAST(sy_{s} AS DOUBLE) * sy_{s})"
    " - (CAST(n_{s} AS DOUBLE) * sty_{s}"
    "    - CAST(st_{s} AS DOUBLE) * sy_{s})"
    "   * (CAST(n_{s} AS DOUBLE) * sty_{s}"
    "      - CAST(st_{s} AS DOUBLE) * sy_{s})"
    "   / (CAST(n_{s} AS DOUBLE) * stt_{s}"
    "      - CAST(st_{s} AS DOUBLE) * st_{s})) / n_{s}"
)


@register(
    "q_agg_chow_test",
    oracle=f"""
        WITH d AS MATERIALIZED (
            SELECT CAST(date_diff('day', DATE '1995-01-01',
                                  CAST(o_orderdate AS DATE))
                        AS BIGINT) AS t,
                   CAST(o_orderdate < TIMESTAMP '{_CHOW_SPLIT}'
                        AS BOOLEAN) AS pre,
                   CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                 * 100 AS BIGINT)) AS BIGINT) // 100000
                       AS y
            FROM orders GROUP BY 1, 2
        ),
        mp AS ({_chow_moments_duck("TRUE", "p")}),
        m1 AS ({_chow_moments_duck("pre", "1")}),
        m2 AS ({_chow_moments_duck("NOT pre", "2")}),
        ssr AS (
            SELECT {_CHOW_SSR_DUCK.format(s="p")} AS ssr_p,
                   {_CHOW_SSR_DUCK.format(s="1")} AS ssr_1,
                   {_CHOW_SSR_DUCK.format(s="2")} AS ssr_2,
                   mp.n_p AS n
            FROM mp CROSS JOIN m1 CROSS JOIN m2
        )
        SELECT CAST(n AS BIGINT) AS n_days,
               ROUND(ssr_p, 2) AS ssr_pooled,
               ROUND(ssr_1 + ssr_2, 2) AS ssr_split,
               ROUND(((ssr_p - (ssr_1 + ssr_2)) / 2)
                     / ((ssr_1 + ssr_2) / (n - 4)), 4) AS chow_f
        FROM ssr
    """,
    section="A88",
    doc=f"Chow structural-break test of the daily-revenue linear trend "
    f"at {_CHOW_SPLIT}: pooled-vs-segmented OLS residual sums, "
    "F = ((SSR_p - SSR_1 - SSR_2)/k) / ((SSR_1+SSR_2)/(n-2k)) with "
    "k=2 — TS11's changepoint DETECTS where a break might be; Chow "
    "TESTS a hypothesized break (a launch date, a pipeline "
    "migration) with an F verdict, the difference between "
    "exploration and certification. Each segment's SSR reduces "
    "from six exact moments (daily revenue quantized to exact "
    "THOUSANDS of dollars so every moment — including n*syy — stays "
    "under 2^53: raw cent squares overflow int64 AND their "
    "DECIMAL(38,0) sums round differently when cast to double "
    "cross-engine, both observed) with the identical centered-"
    "moment expression tree "
    "(rule 10); t is a calendar day index, no window needed. "
    "Scale: one day-grain collapse + three 6-moment reductions — "
    "map-side-combinable everywhere.",
)
def q_agg_chow_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    d = od.groupBy(
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        )
        .cast("bigint")
        .alias("t"),
        (
            F.col("o_orderdate") < F.lit(_CHOW_SPLIT).cast("timestamp")
        ).alias("pre"),
    ).agg(
        F.expr(
            "cast(sum(cast(cast(o_totalprice as decimal(18,2)) * 100"
            " as bigint)) as bigint) div 100000"
        ).alias("y")
    )

    def _moments(df, sfx):
        return df.agg(
            F.count(F.lit(1)).cast("bigint").alias(f"n_{sfx}"),
            F.sum("t").cast("bigint").alias(f"st_{sfx}"),
            F.sum("y").cast("bigint").alias(f"sy_{sfx}"),
            F.sum(F.col("t") * F.col("t")).cast("bigint").alias(f"stt_{sfx}"),
            F.sum(F.col("t") * F.col("y")).cast("bigint").alias(f"sty_{sfx}"),
            F.sum(F.col("y") * F.col("y")).cast("bigint").alias(f"syy_{sfx}"),
        )

    mp = _moments(d, "p")
    m1 = _moments(d.where(F.col("pre")), "1")
    m2 = _moments(d.where(~F.col("pre")), "2")

    def _ssr(s):
        n = F.col(f"n_{s}").cast("double")
        syy_c = n * F.col(f"syy_{s}").cast("double") - F.col(
            f"sy_{s}"
        ).cast("double") * F.col(f"sy_{s}")
        sty_c = n * F.col(f"sty_{s}") - F.col(f"st_{s}").cast(
            "double"
        ) * F.col(f"sy_{s}")
        stt_c = n * F.col(f"stt_{s}") - F.col(f"st_{s}").cast(
            "double"
        ) * F.col(f"st_{s}")
        return (syy_c - sty_c * sty_c / stt_c) / F.col(f"n_{s}")

    ssr = (
        mp.crossJoin(F.broadcast(m1))
        .crossJoin(F.broadcast(m2))
        .select(
            _ssr("p").alias("ssr_p"),
            _ssr("1").alias("ssr_1"),
            _ssr("2").alias("ssr_2"),
            F.col("n_p").alias("n"),
        )
    )
    return ssr.select(
        F.col("n").cast("bigint").alias("n_days"),
        F.round("ssr_p", 2).alias("ssr_pooled"),
        F.round(F.col("ssr_1") + F.col("ssr_2"), 2).alias("ssr_split"),
        F.round(
            ((F.col("ssr_p") - (F.col("ssr_1") + F.col("ssr_2"))) / 2)
            / ((F.col("ssr_1") + F.col("ssr_2")) / (F.col("n") - 4)),
            4,
        ).alias("chow_f"),
    )


def _bartlett_fold(expr_fmt: str) -> str:
    t = expr_fmt.format(i=0)
    for i in range(1, 5):
        t = f"({t} + {expr_fmt.format(i=i)})"
    return t


@register(
    "q_agg_bartlett",
    oracle=f"""
        WITH rows_kv AS (
            SELECT o_orderpriority AS grp,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) // 100 AS v
            FROM orders
        ),
        piv AS (
            SELECT {{pivot}}
            FROM rows_kv
        ),
        vr AS (
            SELECT *,
                   {", ".join(
                       f"(CAST(n_{i} AS DOUBLE) * q_{i}"
                       f" - CAST(s_{i} AS DOUBLE) * s_{i})"
                       f" / (CAST(n_{i} AS DOUBLE) * (n_{i} - 1))"
                       f" AS v_{i}"
                       for i in range(5)
                   )},
                   {_bartlett_fold("CAST(n_{i} AS BIGINT)")} AS n
            FROM piv
        ),
        sp AS (
            SELECT *,
                   {_bartlett_fold("(n_{i} - 1) * v_{i}")}
                       / (n - 5) AS s2p
            FROM vr
        ),
        chi AS (
            SELECT n, s2p,
                   (CAST(n - 5 AS DOUBLE) * ln(s2p)
                    - {_bartlett_fold("(n_{i} - 1) * ln(v_{i})")})
                   / (1 + ({_bartlett_fold("1.0 / (n_{i} - 1)")}
                           - 1.0 / (n - 5)) / 12.0) AS stat
            FROM sp
        )
        SELECT CAST(n AS BIGINT) AS n, 4 AS df,
               ROUND(stat, 4) AS bartlett_chi2
        FROM chi
    """.replace("{pivot}", ", ".join(
        f"CAST(SUM(CASE WHEN grp = '{p}' THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS n_{i}, "
        f"CAST(SUM(CASE WHEN grp = '{p}' THEN v ELSE 0 END) AS BIGINT)"
        f" AS s_{i}, "
        f"CAST(SUM(CASE WHEN grp = '{p}' THEN v * v ELSE 0 END) AS BIGINT)"
        f" AS q_{i}"
        for i, p in enumerate(_KW_PRIORITIES)
    )),
    section="A89",
    doc="Bartlett's variance-homogeneity chi-square across the 5 "
    "priority classes on whole-dollar totals — the PARAMETRIC "
    "sibling of A73's Brown-Forsythe (Bartlett is more powerful "
    "under normality but famously fragile to heavy tails; report "
    "both, and BF-pass + Bartlett-reject is itself a kurtosis "
    "signal). Group variances rebuild from the A66 one-pass exact "
    "BIGINT moments; the ln() terms and harmonic correction fold "
    "through the explicit left-nested device so both engines share "
    "one IEEE tree (rule 10 — ln on bit-identical inputs, 4dp "
    "output absorbs the libm ulp tail). Scale: one map-side "
    "reduction to a 1-row statistic.",
)
def q_agg_bartlett(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    rows_kv = od.select(
        F.col("o_orderpriority").alias("grp"),
        F.expr(
            "cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)"
            " div 100"
        ).alias("v"),
    )
    piv = rows_kv.agg(
        *[
            agg
            for i, p in enumerate(_KW_PRIORITIES)
            for agg in (
                F.sum(F.when(F.col("grp") == p, 1).otherwise(0))
                .cast("bigint")
                .alias(f"n_{i}"),
                F.sum(F.when(F.col("grp") == p, F.col("v")).otherwise(0))
                .cast("bigint")
                .alias(f"s_{i}"),
                F.sum(
                    F.when(F.col("grp") == p, F.col("v") * F.col("v"))
                    .otherwise(0)
                )
                .cast("bigint")
                .alias(f"q_{i}"),
            )
        ]
    )

    def _fold(make):
        t = make(0)
        for i in range(1, 5):
            t = t + make(i)
        return t

    vr = piv.select(
        "*",
        *[
            (
                (
                    F.col(f"n_{i}").cast("double") * F.col(f"q_{i}")
                    - F.col(f"s_{i}").cast("double") * F.col(f"s_{i}")
                )
                / (F.col(f"n_{i}").cast("double") * (F.col(f"n_{i}") - 1))
            ).alias(f"v_{i}")
            for i in range(5)
        ],
        _fold(lambda i: F.col(f"n_{i}").cast("bigint")).alias("n"),
    )
    sp = vr.select(
        "*",
        (
            _fold(lambda i: (F.col(f"n_{i}") - 1) * F.col(f"v_{i}"))
            / (F.col("n") - 5)
        ).alias("s2p"),
    )
    stat = (
        (F.col("n") - 5).cast("double") * F.log(F.col("s2p"))
        - _fold(lambda i: (F.col(f"n_{i}") - 1) * F.log(F.col(f"v_{i}")))
    ) / (
        1
        + (
            _fold(lambda i: 1.0 / (F.col(f"n_{i}") - 1))
            - 1.0 / (F.col("n") - 5)
        )
        / 12.0
    )
    return sp.select(
        F.col("n").cast("bigint").alias("n"),
        F.lit(4).cast("int").alias("df"),
        F.round(stat, 4).alias("bartlett_chi2"),
    )


@register(
    "q_agg_dist_fit",
    oracle="""
        WITH v AS (
            SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) // 100 AS x
            FROM orders
        ),
        m AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS s,
                   CAST(SUM(x * x) AS BIGINT) AS q,
                   CAST(SUM(CAST(floor(ln(CAST(x AS DOUBLE)) * 1e9)
                                 AS DECIMAL(38,0))) AS DOUBLE) / 1e9
                       AS sl,
                   CAST(SUM(CAST(floor(ln(CAST(x AS DOUBLE))
                                       * ln(CAST(x AS DOUBLE)) * 1e9)
                                 AS DECIMAL(38,0))) AS DOUBLE) / 1e9
                       AS ql
            FROM v
        ),
        p AS (
            SELECT n,
                   CAST(s AS DOUBLE) / n AS mu,
                   (CAST(q AS DOUBLE)
                    - CAST(s AS DOUBLE) * s / n) / (n - 1) AS var,
                   sl / n AS mu_ln,
                   (ql - sl * sl / n) / (n - 1) AS var_ln
            FROM m
        )
        SELECT n,
               ROUND(mu, 4) AS normal_mu,
               ROUND(sqrt(var), 4) AS normal_sigma,
               ROUND(mu_ln, 6) AS lognormal_mu,
               ROUND(sqrt(var_ln), 6) AS lognormal_sigma,
               ROUND(mu * mu / var, 4) AS gamma_shape,
               ROUND(var / mu, 4) AS gamma_scale
        FROM p
    """,
    section="A90",
    doc="Distribution moment-fit panel on whole-dollar order totals: "
    "normal (mu, sigma), lognormal (mean/sd of ln x), and gamma "
    "(method-of-moments shape mu^2/var, scale var/mu) parameter "
    "estimates in one pass — the parametric-modeling on-ramp every "
    "pricing/latency/LTV model starts from (fit all three, then "
    "A27/A86's KS against each fitted form picks the family; gamma "
    "shape >> 1 also certifies the CLT-normality A28 leans on). "
    "Integer moments exact; the ln and ln^2 terms fold through "
    "floor-1e9 DECIMAL sums (rule 10 — ln on bit-identical integer-"
    "valued doubles); every output is a single IEEE tree over the "
    "folded moments. Scale: ONE map-side-combinable reduction.",
)
def q_agg_dist_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    v = od.select(
        F.expr(
            "cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)"
            " div 100"
        ).alias("x")
    )
    lnx = F.log(F.col("x").cast("double"))
    m = v.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("q"),
        (
            F.sum(F.floor(lnx * 1e9).cast("decimal(38,0)")).cast("double")
            / 1e9
        ).alias("sl"),
        (
            F.sum(
                F.floor(lnx * lnx * 1e9).cast("decimal(38,0)")
            ).cast("double")
            / 1e9
        ).alias("ql"),
    )
    p = m.select(
        "n",
        (F.col("s").cast("double") / F.col("n")).alias("mu"),
        (
            (
                F.col("q").cast("double")
                - F.col("s").cast("double") * F.col("s") / F.col("n")
            )
            / (F.col("n") - 1)
        ).alias("var"),
        (F.col("sl") / F.col("n")).alias("mu_ln"),
        (
            (F.col("ql") - F.col("sl") * F.col("sl") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("var_ln"),
    )
    return p.select(
        "n",
        F.round("mu", 4).alias("normal_mu"),
        F.round(F.sqrt("var"), 4).alias("normal_sigma"),
        F.round("mu_ln", 6).alias("lognormal_mu"),
        F.round(F.sqrt("var_ln"), 6).alias("lognormal_sigma"),
        F.round(F.col("mu") * F.col("mu") / F.col("var"), 4).alias(
            "gamma_shape"
        ),
        F.round(F.col("var") / F.col("mu"), 4).alias("gamma_scale"),
    )


@register(
    "q_agg_deming",
    oracle="""
        WITH pair AS (
            SELECT CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) // 100000 AS x,
                   CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                                 * 100 AS BIGINT)) AS BIGINT) // 100000
                       AS y
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            GROUP BY o.o_orderkey, o.o_totalprice
        ),
        m AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x * x) AS BIGINT) AS sxx,
                   CAST(SUM(y * y) AS BIGINT) AS syy,
                   CAST(SUM(x * y) AS BIGINT) AS sxy
            FROM pair
        ),
        c AS (
            SELECT n,
                   CAST(n AS DOUBLE) * sxx
                   - CAST(sx AS DOUBLE) * sx AS cxx,
                   CAST(n AS DOUBLE) * syy
                   - CAST(sy AS DOUBLE) * sy AS cyy,
                   CAST(n AS DOUBLE) * sxy
                   - CAST(sx AS DOUBLE) * sy AS cxy,
                   CAST(sx AS DOUBLE) / n AS mx,
                   CAST(sy AS DOUBLE) / n AS my
            FROM m
        )
        SELECT n,
               ROUND((cyy - cxx + sqrt((cyy - cxx) * (cyy - cxx)
                                       + 4 * cxy * cxy))
                     / (2 * cxy), 6) AS deming_slope,
               ROUND(my - (cyy - cxx + sqrt((cyy - cxx) * (cyy - cxx)
                                            + 4 * cxy * cxy))
                          / (2 * cxy) * mx, 4) AS deming_intercept,
               ROUND(cxy / sqrt(cxx * cyy), 6) AS pearson_r
        FROM c
    """,
    section="A91",
    doc="Deming (errors-in-both-variables, lambda=1) regression of "
    "summed line value on header value per order, in exact whole "
    "thousands — the METHOD-COMPARISON fit that belongs beside "
    "A82's Bland-Altman: OLS assumes x is error-free and so biases "
    "the slope toward 0 when both measurements carry noise; the "
    "Deming slope's departure from 1 is the PROPORTIONAL bias "
    "(large orders drifting) that BA's constant limits of "
    "agreement can't represent. Closed form from six exact integer "
    "moments (k$ quantization keeps n*syy under 2^53 — A88's "
    "lesson); slope/intercept/r are single IEEE trees (rule 10). "
    "Scale: one co-keyed collapse + one reduction.",
)
def q_agg_deming(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pair = (
        od.join(li, od.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(
            F.expr(
                "cast(sum(cast(cast(l_extendedprice as decimal(18,2))"
                " * 100 as bigint)) as bigint) div 100000"
            ).alias("y")
        )
        .select(
            F.expr(
                "cast(cast(o_totalprice as decimal(18,2)) * 100"
                " as bigint) div 100000"
            ).alias("x"),
            "y",
        )
    )
    m = pair.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    nd = F.col("n").cast("double")
    cxx = nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    cyy = nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    cxy = nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    c = m.select(
        "n",
        cxx.alias("cxx"),
        cyy.alias("cyy"),
        cxy.alias("cxy"),
        (F.col("sx").cast("double") / F.col("n")).alias("mx"),
        (F.col("sy").cast("double") / F.col("n")).alias("my"),
    )
    slope = (
        F.col("cyy")
        - F.col("cxx")
        + F.sqrt(
            (F.col("cyy") - F.col("cxx")) * (F.col("cyy") - F.col("cxx"))
            + 4 * F.col("cxy") * F.col("cxy")
        )
    ) / (2 * F.col("cxy"))
    return c.select(
        "n",
        F.round(slope, 6).alias("deming_slope"),
        F.round(F.col("my") - slope * F.col("mx"), 4).alias(
            "deming_intercept"
        ),
        F.round(
            F.col("cxy") / F.sqrt(F.col("cxx") * F.col("cyy")), 6
        ).alias("pearson_r"),
    )


@register(
    "q_agg_icc",
    oracle="""
        WITH v AS (
            SELECT c.c_nationkey AS blk,
                   CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) // 100000 AS x
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ),
        g AS (
            SELECT blk,
                   CAST(COUNT(*) AS BIGINT) AS n_g,
                   CAST(SUM(x) AS BIGINT) AS s_g
            FROM v GROUP BY blk
        ),
        tot AS (
            SELECT CAST(SUM(n_g) AS BIGINT) AS n,
                   CAST(SUM(s_g) AS BIGINT) AS s,
                   CAST(COUNT(*) AS BIGINT) AS k,
                   CAST(SUM(CAST(floor(CAST(s_g AS DOUBLE) * s_g / n_g
                                       * 1e6) AS DECIMAL(38,0)))
                        AS DOUBLE) / 1e6 AS ssb_terms
            FROM g
        ),
        q AS (
            SELECT CAST(SUM(x * x) AS BIGINT) AS sq FROM v
        ),
        anova AS (
            SELECT t.n, t.k,
                   t.ssb_terms
                   - CAST(t.s AS DOUBLE) * t.s / t.n AS ssb,
                   CAST(q.sq AS DOUBLE) - t.ssb_terms AS ssw,
                   (CAST(t.n AS DOUBLE)
                    - CAST(SUM(CAST(floor(CAST(g.n_g AS DOUBLE) * g.n_g
                                          / t.n * 1e6)
                                    AS DECIMAL(38,0))) AS DOUBLE) / 1e6)
                   / (t.k - 1) AS n0
            FROM tot t CROSS JOIN q CROSS JOIN g
            GROUP BY t.n, t.k, t.ssb_terms, t.s, q.sq
        )
        SELECT CAST(n AS BIGINT) AS n_rows, CAST(k AS BIGINT) AS k_blocks,
               ROUND(n0, 4) AS n0_effective,
               ROUND((ssb / (k - 1) - ssw / (n - k))
                     / (ssb / (k - 1) + (n0 - 1) * (ssw / (n - k))), 6)
                   AS icc1
        FROM anova
    """,
    section="A92",
    doc="Intraclass correlation ICC(1) of order values within nation "
    "blocks (one-way random-effects ANOVA estimator with the "
    "unbalanced-design n0 correction): how much of total variance "
    "is BETWEEN-nation — the design-effect input that justifies "
    "A79's group jackknife (ICC ~ 0 means rows are exchangeable "
    "and IID error bars are fine; ICC > 0 inflates the effective-"
    "sample-size penalty 1+(m-1)*ICC that clustered pipelines "
    "must apply). MSB/MSW rebuild from exact BIGINT group sums "
    "over values quantized to whole THOUSANDS — Spark's "
    "floor(double) returns BIGINT and silently CLAMPS at "
    "Long.MAX, so a dollar-grain s_g^2/n_g*1e6 term (~4e19) "
    "corrupts the fold on one engine only (observed; DuckDB's "
    "floor stays double) — and the two variable-count folds over "
    "the 25-node block table (sum of s_g^2/n_g, sum of n_g^2/n) "
    "go through floor-1e6 DECIMAL quantization since the block "
    "domain isn't a fixed unrollable list (rule 10). Scale: one group collapse + "
    "25-row arithmetic.",
)
def q_agg_icc(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    v = od.join(cu, od.o_custkey == cu.c_custkey).select(
        F.col("c_nationkey").alias("blk"),
        F.expr(
            "cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)"
            " div 100000"
        ).alias("x"),
    )
    g = v.groupBy("blk").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum("x").cast("bigint").alias("s_g"),
    )
    tot_scalars = g.agg(
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum("s_g").cast("bigint").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        (
            F.sum(
                F.floor(
                    F.col("s_g").cast("double")
                    * F.col("s_g")
                    / F.col("n_g")
                    * 1e6
                ).cast("decimal(38,0)")
            ).cast("double")
            / 1e6
        ).alias("ssb_terms"),
    )
    sq = v.agg(F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sq"))
    n0df = (
        g.crossJoin(F.broadcast(tot_scalars))
        .agg(
            (
                F.sum(
                    F.floor(
                        F.col("n_g").cast("double")
                        * F.col("n_g")
                        / F.col("n")
                        * 1e6
                    ).cast("decimal(38,0)")
                ).cast("double")
                / 1e6
            ).alias("sum_ng2_over_n")
        )
    )
    anova = (
        tot_scalars.crossJoin(F.broadcast(sq))
        .crossJoin(F.broadcast(n0df))
        .select(
            "n",
            "k",
            (
                F.col("ssb_terms")
                - F.col("s").cast("double") * F.col("s") / F.col("n")
            ).alias("ssb"),
            (F.col("sq").cast("double") - F.col("ssb_terms")).alias("ssw"),
            (
                (F.col("n").cast("double") - F.col("sum_ng2_over_n"))
                / (F.col("k") - 1)
            ).alias("n0"),
        )
    )
    msb = F.col("ssb") / (F.col("k") - 1)
    msw = F.col("ssw") / (F.col("n") - F.col("k"))
    return anova.select(
        F.col("n").cast("bigint").alias("n_rows"),
        F.col("k").cast("bigint").alias("k_blocks"),
        F.round("n0", 4).alias("n0_effective"),
        F.round(
            (msb - msw) / (msb + (F.col("n0") - 1) * msw), 6
        ).alias("icc1"),
    )


@register(
    "q_agg_lorenz_points",
    oracle="""
        WITH cust AS (
            SELECT o_custkey,
                   CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                 * 100 AS BIGINT)) AS BIGINT) AS cents
            FROM orders GROUP BY o_custkey
        ),
        ranked AS (
            SELECT cents,
                   ntile(10) OVER (ORDER BY cents, o_custkey) AS decile
            FROM cust
        ),
        per_dec AS (
            SELECT decile,
                   CAST(COUNT(*) AS BIGINT) AS n_d,
                   CAST(SUM(cents) AS BIGINT) AS c_d
            FROM ranked GROUP BY decile
        ),
        tot AS (
            SELECT CAST(SUM(n_d) AS BIGINT) AS n,
                   CAST(SUM(c_d) AS BIGINT) AS c
            FROM per_dec
        )
        SELECT CAST(p.decile AS INTEGER) AS decile,
               CAST(SUM(p2.n_d) AS BIGINT) AS cum_customers,
               CAST(SUM(p2.c_d) AS BIGINT) AS cum_cents,
               ROUND(CAST(SUM(p2.n_d) AS DOUBLE) / MAX(t.n), 6)
                   AS pop_share,
               ROUND(CAST(SUM(p2.c_d) AS DOUBLE) / MAX(t.c), 6)
                   AS revenue_share
        FROM per_dec p
        JOIN per_dec p2 ON p2.decile <= p.decile
        CROSS JOIN tot t
        GROUP BY p.decile
    """,
    section="A93",
    doc="Lorenz curve coordinates at customer-revenue deciles: "
    "cumulative population share vs cumulative revenue share, "
    "poorest decile first — the CURVE whose enclosed area A19's "
    "Gini scalar integrates, and the actionable form ('bottom 50% "
    "of customers hold 9% of revenue') that concentration policies "
    "and HHI thresholds (A35) are argued from. Deciles via ntile "
    "over the totally-ordered exact cent totals (E42's remainder "
    "contract); the cumulative join runs on the 10-row decile "
    "table; every share is one division over exact BIGINTs. Scale: "
    "one customer collapse + a 10-row triangular self-join.",
)
def q_agg_lorenz_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    cust = od.groupBy("o_custkey").agg(
        F.sum(
            F.expr(
                "cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)"
            )
        )
        .cast("bigint")
        .alias("cents")
    )
    ranked = cust.select(
        "cents",
        F.ntile(10)
        .over(Window.orderBy("cents", "o_custkey"))
        .alias("decile"),
    )
    per_dec = ranked.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_d"),
        F.sum("cents").cast("bigint").alias("c_d"),
    )
    tot = per_dec.agg(
        F.sum("n_d").cast("bigint").alias("n"),
        F.sum("c_d").cast("bigint").alias("c"),
    )
    p2 = per_dec.select(
        F.col("decile").alias("d2"),
        F.col("n_d").alias("n2"),
        F.col("c_d").alias("c2"),
    )
    return (
        per_dec.join(F.broadcast(p2), F.col("d2") <= F.col("decile"))
        .crossJoin(F.broadcast(tot))
        .groupBy(F.col("decile").cast("int").alias("decile"))
        .agg(
            F.sum("n2").cast("bigint").alias("cum_customers"),
            F.sum("c2").cast("bigint").alias("cum_cents"),
            F.round(
                F.sum("n2").cast("double") / F.max("n"), 6
            ).alias("pop_share"),
            F.round(
                F.sum("c2").cast("double") / F.max("c"), 6
            ).alias("revenue_share"),
        )
    )


_SPRT_P0 = 0.24   # null conversion rate (fulfilled-order share)
_SPRT_P1 = 0.27   # alternative worth detecting
_SPRT_CHECK = 500  # checkpoint every N observations


@register(
    "q_agg_sprt",
    oracle=f"""
        WITH obs AS (
            SELECT md5(CAST(o_orderkey AS VARCHAR)) AS arrival,
                   CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END
                       AS conv
            FROM orders
        ),
        run AS (
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY arrival) AS BIGINT)
                       AS t,
                   CAST(SUM(conv) OVER (ORDER BY arrival
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS BIGINT) AS k
            FROM obs
        )
        SELECT t AS n_obs, k AS n_conv,
               ROUND(k * ln({_SPRT_P1} / {_SPRT_P0})
                     + (t - k) * ln((1 - {_SPRT_P1}) / (1 - {_SPRT_P0})),
                     4) AS llr,
               CASE
                 WHEN k * ln({_SPRT_P1} / {_SPRT_P0})
                      + (t - k) * ln((1 - {_SPRT_P1}) / (1 - {_SPRT_P0}))
                      >= ln(0.95 / 0.05) THEN 'reject_h0'
                 WHEN k * ln({_SPRT_P1} / {_SPRT_P0})
                      + (t - k) * ln((1 - {_SPRT_P1}) / (1 - {_SPRT_P0}))
                      <= ln(0.05 / 0.95) THEN 'accept_h0'
                 ELSE 'continue'
               END AS decision
        FROM run
        WHERE t % {_SPRT_CHECK} = 0
    """,
    section="A94",
    doc=f"Wald SPRT (sequential probability ratio test) trajectory for "
    f"the fulfilled-order rate, H0 p={_SPRT_P0} vs H1 p={_SPRT_P1}, "
    f"alpha=beta=0.05, checkpointed every {_SPRT_CHECK} observations "
    "in deterministic md5 arrival order — the ALWAYS-VALID "
    "sequential decision rule that fixed-n tests (A28/A31) cannot "
    "give: peeking at a fixed-n test inflates false positives, "
    "while the SPRT's Wald boundaries license stopping THE MOMENT "
    "the log-likelihood ratio exits (ln B, ln A) — the "
    "earliest-possible-decision property every ramp/holdback "
    "wants. The LLR is integer counts times two LITERAL log "
    "constants (k·c1 + (n-k)·c2 — constant-folded identically to "
    "within an ulp whose k-scaled effect the 4dp rounding "
    "absorbs); the boundary comparison constants are literals too "
    "(rule 10). Scale: one hash-ordered running count — the "
    "day-spine window shape on the observation stream.",
)
def q_agg_sprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    obs = od.select(
        F.md5(F.col("o_orderkey").cast("string")).alias("arrival"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("conv"),
    )
    # Scale note (r6): both the arrival index t and the running conversion
    # count k are prefix sums over the (unique) md5 arrival order — one
    # distributed two-pass cumulative, no single-partition window.
    from ai_to_cvent_etl_spark.operators.ranking import global_cumulative

    run = global_cumulative(
        obs, ["arrival"], {"t": F.lit(1), "k": F.col("conv")}
    ).select(
        F.col("t").cast("bigint").alias("t"),
        F.col("k").cast("bigint").alias("k"),
    )
    c1 = F.log(F.lit(_SPRT_P1) / F.lit(_SPRT_P0))
    c2 = F.log((1 - F.lit(_SPRT_P1)) / (1 - F.lit(_SPRT_P0)))
    llr = F.col("k") * c1 + (F.col("t") - F.col("k")) * c2
    hi = F.log(F.lit(0.95) / F.lit(0.05))
    lo = F.log(F.lit(0.05) / F.lit(0.95))
    return run.where(F.col("t") % _SPRT_CHECK == 0).select(
        F.col("t").alias("n_obs"),
        F.col("k").alias("n_conv"),
        F.round(llr, 4).alias("llr"),
        F.when(llr >= hi, "reject_h0")
        .when(llr <= lo, "accept_h0")
        .otherwise("continue")
        .alias("decision"),
    )


@register(
    "q_agg_grubbs",
    oracle="""
        WITH d AS (
            SELECT o_orderdate AS day,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) // 100000 AS v
            FROM orders GROUP BY o_orderdate
        ),
        m AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(v) AS BIGINT) AS s,
                   CAST(SUM(v * v) AS BIGINT) AS q
            FROM d
        ),
        dev AS (
            SELECT d.day, d.v,
                   abs(d.v * m.n - m.s) AS dev_num, m.n, m.s, m.q
            FROM d CROSS JOIN m
        ),
        top AS (
            SELECT day, v, dev_num, n, s, q
            FROM dev
            ORDER BY dev_num DESC, day
            LIMIT 1
        )
        SELECT CAST(n AS BIGINT) AS n_days,
               day AS flagged_day,
               CAST(v AS BIGINT) AS flagged_value_kd,
               ROUND((CAST(dev_num AS DOUBLE) / n)
                     / sqrt((CAST(q AS DOUBLE) * n - CAST(s AS DOUBLE) * s)
                            / (CAST(n AS DOUBLE) * (n - 1))), 4)
                   AS grubbs_g
        FROM top
    """,
    section="A95",
    doc="Grubbs' statistic with the flagged observation: the day whose "
    "revenue deviates most from the mean in standard-deviation "
    "units, G = max|x - mean|/s — the single-outlier TEST that "
    "names its suspect, where A14's winsorizing silently clips and "
    "W13's IQR fence flags in bulk (Grubbs is what incident review "
    "wants: ONE day, a defensible score, and n for the critical-"
    "value lookup). Exactness: deviations are compared as the "
    "integer |v*n - s| (mean denominator deferred — the A73/TS36 "
    "numerator device), so the argmax is exact and tie-broken by "
    "day; G itself is one IEEE tree over k$ moments (rule 10). "
    "Scale: day-grain collapse, one reduction + one bounded "
    "ORDER BY 1.",
)
def q_agg_grubbs(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    d = od.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.expr(
            "cast(sum(cast(o_totalprice as decimal(18,2))) * 100"
            " as bigint) div 100000"
        ).alias("v")
    )
    m = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("s"),
        F.sum(F.col("v") * F.col("v")).cast("bigint").alias("q"),
    )
    dev = d.crossJoin(F.broadcast(m)).select(
        "day",
        "v",
        F.abs(F.col("v") * F.col("n") - F.col("s")).alias("dev_num"),
        "n",
        "s",
        "q",
    )
    top = dev.orderBy(F.desc("dev_num"), F.asc("day")).limit(1)
    g = (F.col("dev_num").cast("double") / F.col("n")) / F.sqrt(
        (
            F.col("q").cast("double") * F.col("n")
            - F.col("s").cast("double") * F.col("s")
        )
        / (F.col("n").cast("double") * (F.col("n") - 1))
    )
    return top.select(
        F.col("n").alias("n_days"),
        F.col("day").alias("flagged_day"),
        F.col("v").cast("bigint").alias("flagged_value_kd"),
        F.round(g, 4).alias("grubbs_g"),
    )


_HILL_K = 100   # top order statistics used


@register(
    "q_agg_hill_tail",
    oracle=f"""
        WITH v AS (
            SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS cents,
                   o_orderkey
            FROM orders
        ),
        top AS (
            SELECT cents,
                   ROW_NUMBER() OVER (ORDER BY cents DESC, o_orderkey)
                       AS rk
            FROM v
        ),
        kth AS (
            SELECT cents AS x_k FROM top WHERE rk = {_HILL_K} + 1
        ),
        terms AS (
            SELECT ln(CAST(t.cents AS DOUBLE) / k.x_k) AS lr
            FROM top t CROSS JOIN kth k
            WHERE t.rk <= {_HILL_K}
        )
        SELECT {_HILL_K} AS k_order_stats,
               ROUND(CAST(SUM(CAST(floor(lr * 1e9) AS DECIMAL(38,0)))
                          AS DOUBLE) / 1e9 / {_HILL_K}, 6) AS mean_log_ratio,
               ROUND({_HILL_K}
                     / (CAST(SUM(CAST(floor(lr * 1e9) AS DECIMAL(38,0)))
                             AS DOUBLE) / 1e9), 4) AS hill_alpha
        FROM terms
    """,
    section="A96",
    doc=f"Hill tail-index estimator over the top {_HILL_K} order values: "
    "alpha = k / sum(ln(x_(i)/x_(k+1))) — the extreme-value-theory "
    "number that says WHETHER moments exist (alpha < 2 = infinite "
    "variance, and every A-family mean/variance readout on that "
    "column is formally meaningless; alpha < 1 = infinite MEAN), "
    "which is the question A51's skew/kurtosis and A90's gamma fit "
    "quietly assume away. Order statistics via a fully tie-broken "
    "rank on exact cents; the log-ratio terms fold through floor-"
    "1e9 DECIMAL sums (rule 10 — ln on bit-identical rationals). "
    "Scale: a top-(k+1) selection (rank pushdown shape) then k-row "
    "arithmetic — the scan dominates, as it should.",
)
def q_agg_hill_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    v = od.select(
        F.expr(
            "cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)"
        ).alias("cents"),
        "o_orderkey",
    )
    top = v.select(
        "cents",
        F.row_number()
        .over(Window.orderBy(F.desc("cents"), F.asc("o_orderkey")))
        .alias("rk"),
    )
    kth = top.where(F.col("rk") == _HILL_K + 1).select(
        F.col("cents").alias("x_k")
    )
    terms = (
        top.where(F.col("rk") <= _HILL_K)
        .crossJoin(F.broadcast(kth))
        .select(
            F.log(F.col("cents").cast("double") / F.col("x_k")).alias("lr")
        )
    )
    qs = (
        F.sum(F.floor(F.col("lr") * 1e9).cast("decimal(38,0)")).cast(
            "double"
        )
        / 1e9
    )
    return terms.agg(
        F.lit(_HILL_K).cast("int").alias("k_order_stats"),
        F.round(qs / _HILL_K, 6).alias("mean_log_ratio"),
        F.round(F.lit(_HILL_K) / qs, 4).alias("hill_alpha"),
    )


@register(
    "q_agg_log_rank",
    oracle="""
        WITH gaps AS (
            SELECT CAST(CAST('0x' || substr(md5(CAST(o_custkey
                                 AS VARCHAR)), 1, 8) AS BIGINT) % 2
                        AS INTEGER) AS arm,
                   date_diff('day', o_orderdate,
                             lead(o_orderdate) OVER (
                                 PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey
                             )) AS gap
            FROM orders
        ),
        ev AS (
            SELECT gap AS t,
                   CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS d1,
                   CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS d2
            FROM gaps WHERE gap IS NOT NULL GROUP BY gap
        ),
        risk AS (
            SELECT t, d1, d2,
                   CAST(SUM(d1) OVER () AS BIGINT)
                   - CAST(SUM(d1) OVER w AS BIGINT) + d1 AS n1,
                   CAST(SUM(d2) OVER () AS BIGINT)
                   - CAST(SUM(d2) OVER w AS BIGINT) + d2 AS n2
            FROM ev
            WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)
        ),
        terms AS (
            SELECT d1,
                   CAST(d1 + d2 AS DOUBLE) * n1 / (n1 + n2) AS e1,
                   CASE WHEN n1 + n2 > 1 THEN
                       CAST(d1 + d2 AS DOUBLE)
                       * (n1 + n2 - d1 - d2)
                       * n1 * n2
                       / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2)
                          * (n1 + n2 - 1)) ELSE 0 END AS v
            FROM risk
        )
        SELECT CAST(SUM(d1) AS BIGINT) AS observed_arm0,
               ROUND(CAST(SUM(CAST(floor(e1 * 1e9) AS DECIMAL(38,0)))
                          AS DOUBLE) / 1e9, 4) AS expected_arm0,
               ROUND((SUM(d1) - CAST(SUM(CAST(floor(e1 * 1e9)
                                      AS DECIMAL(38,0))) AS DOUBLE) / 1e9)
                     * (SUM(d1) - CAST(SUM(CAST(floor(e1 * 1e9)
                                        AS DECIMAL(38,0))) AS DOUBLE) / 1e9)
                     / (CAST(SUM(CAST(floor(v * 1e9) AS DECIMAL(38,0)))
                             AS DOUBLE) / 1e9), 4) AS log_rank_chi2
        FROM terms
    """,
    section="A97",
    doc="Log-rank test between two hash-split arms on the A33 "
    "inter-order-gap survival times: observed vs expected arm-0 "
    "events under the shared-hazard null, chi-square(1) with the "
    "hypergeometric variance — the two-GROUP completion of A33's "
    "Kaplan-Meier (KM describes one curve; the log-rank is THE "
    "test for 'does segment A repurchase faster', weighting every "
    "event time by its risk sets, which a naive median-gap compare "
    "throws away). The arm split is E9's md5-prefix device (A/A "
    "here, so chi2 ~ 1 is itself a calibration check); risk sets "
    "are exact reverse-cumulative integers; the e1 and variance "
    "terms fold through floor-1e9 DECIMAL sums (rule 10). Scale: "
    "one gap window + event-time-grain arithmetic (A33's shape).",
)
def q_agg_log_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = od.select(
        F.expr(
            "cast(cast(conv(substr(md5(cast(o_custkey as string)), 1, 8),"
            " 16, 10) as bigint) % 2 as int)"
        ).alias("arm"),
        F.datediff(
            F.lead("o_orderdate").over(w), F.col("o_orderdate")
        ).alias("gap"),
    ).where(F.col("gap").isNotNull())
    ev = gaps.groupBy(F.col("gap").alias("t")).agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("d1"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("d2"),
    )
    wcum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    risk = ev.select(
        "t",
        "d1",
        "d2",
        (
            F.sum("d1").over(wall) - F.sum("d1").over(wcum) + F.col("d1")
        )
        .cast("bigint")
        .alias("n1"),
        (
            F.sum("d2").over(wall) - F.sum("d2").over(wcum) + F.col("d2")
        )
        .cast("bigint")
        .alias("n2"),
    )
    ntot = F.col("n1") + F.col("n2")
    dtot = F.col("d1") + F.col("d2")
    terms = risk.select(
        "d1",
        (dtot.cast("double") * F.col("n1") / ntot).alias("e1"),
        F.when(
            ntot > 1,
            dtot.cast("double")
            * (ntot - dtot)
            * F.col("n1")
            * F.col("n2")
            / (ntot.cast("double") * ntot * (ntot - 1)),
        )
        .otherwise(0.0)
        .alias("v"),
    )

    def _q9(c):
        return (
            F.sum(F.floor(F.col(c) * 1e9).cast("decimal(38,0)")).cast(
                "double"
            )
            / 1e9
        )

    o1 = F.sum("d1")
    e1 = _q9("e1")
    return terms.agg(
        o1.cast("bigint").alias("observed_arm0"),
        F.round(e1, 4).alias("expected_arm0"),
        F.round((o1 - e1) * (o1 - e1) / _q9("v"), 4).alias(
            "log_rank_chi2"
        ),
    )


# --- A98: Goodman-Kruskal gamma + Somers' D (ordinal association trio) ------


@register(
    "q_agg_gamma_somers",
    oracle="""
        WITH cells AS (
            SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS x,
                   CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS y,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM orders GROUP BY 1, 2
        ),
        pairs AS (
            SELECT
                CAST(SUM(CASE WHEN b.x > a.x AND b.y > a.y
                              THEN a.n * b.n ELSE 0 END) AS BIGINT) AS c,
                CAST(SUM(CASE WHEN b.x > a.x AND b.y < a.y
                              THEN a.n * b.n ELSE 0 END) AS BIGINT) AS d,
                CAST(SUM(CASE WHEN b.x = a.x AND b.y > a.y
                              THEN a.n * b.n ELSE 0 END) AS BIGINT) AS t_x,
                CAST(SUM(CASE WHEN b.x > a.x AND b.y = a.y
                              THEN a.n * b.n ELSE 0 END) AS BIGINT) AS t_y
            FROM cells a CROSS JOIN cells b
        )
        SELECT c, d, t_x, t_y,
               ROUND((c - d) / CAST(c + d AS DOUBLE), 6) AS gamma,
               ROUND((c - d) / CAST(c + d + t_y AS DOUBLE), 6)
                   AS somers_d_yx,
               ROUND((c - d) / CAST(c + d + t_x AS DOUBLE), 6)
                   AS somers_d_xy
        FROM pairs
    """,
    section="A98",
    doc="Goodman-Kruskal gamma and both Somers' D asymmetries between "
    "order size band (50k totalprice buckets) and order priority rank "
    "— the ordinal-association trio completing Kendall tau-b (A40): "
    "gamma ignores ties entirely, D(Y|X) penalizes Y-ties only (the "
    "form credit scoring reports as Gini when Y is binary), D(X|Y) "
    "the reverse. All three come from ONE concordant/discordant/tied "
    "pair census computed on the r x c CONTINGENCY TABLE, not row "
    "pairs: C = sum n_ij * n_i'j' over cell pairs with i'>i, j'>j — "
    "exact BIGINT counts, each unordered row pair counted once via "
    "the orientation constraint, three single divisions at the end. "
    "Scale: one map-combinable count agg on (band, priority) then a "
    "constant cells^2 (~50x50) local cross join — row count never "
    "enters a join; the device that makes rank association O(n) at "
    "100 TB.",
)
def q_agg_gamma_somers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cells = orders.groupBy(
        F.floor(F.col("o_totalprice") / 50000.0).cast("bigint").alias("x"),
        F.substring("o_orderpriority", 1, 1).cast("bigint").alias("y"),
    ).agg(F.count(F.lit(1)).alias("n"))
    a = cells.select(
        F.col("x").alias("ax"), F.col("y").alias("ay"), F.col("n").alias("an")
    )
    b = cells.select(
        F.col("x").alias("bx"), F.col("y").alias("by"), F.col("n").alias("bn")
    )
    prod = F.col("an") * F.col("bn")
    pairs = a.crossJoin(F.broadcast(b)).agg(
        F.sum(
            F.when((F.col("bx") > F.col("ax")) & (F.col("by") > F.col("ay")), prod).otherwise(0)
        ).cast("bigint").alias("c"),
        F.sum(
            F.when((F.col("bx") > F.col("ax")) & (F.col("by") < F.col("ay")), prod).otherwise(0)
        ).cast("bigint").alias("d"),
        F.sum(
            F.when((F.col("bx") == F.col("ax")) & (F.col("by") > F.col("ay")), prod).otherwise(0)
        ).cast("bigint").alias("t_x"),
        F.sum(
            F.when((F.col("bx") > F.col("ax")) & (F.col("by") == F.col("ay")), prod).otherwise(0)
        ).cast("bigint").alias("t_y"),
    )
    cd = F.col("c") - F.col("d")
    return pairs.select(
        "c",
        "d",
        "t_x",
        "t_y",
        F.round(cd / (F.col("c") + F.col("d")).cast("double"), 6).alias(
            "gamma"
        ),
        F.round(
            cd / (F.col("c") + F.col("d") + F.col("t_y")).cast("double"), 6
        ).alias("somers_d_yx"),
        F.round(
            cd / (F.col("c") + F.col("d") + F.col("t_x")).cast("double"), 6
        ).alias("somers_d_xy"),
    )


# --- A99: isotonic calibration via the closed-form min-max identity ---------


@register(
    "q_agg_isotonic_calibration",
    oracle="""
        WITH bins AS (
            SELECT CAST(floor(value / 25.0) AS BIGINT) AS bin,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1
                                 ELSE 0 END) AS BIGINT) AS n_pos
            FROM events GROUP BY 1
        ),
        idx AS (
            SELECT bin, n, n_pos,
                   ROW_NUMBER() OVER (ORDER BY bin) AS i,
                   SUM(n) OVER (ORDER BY bin) AS cn,
                   SUM(n_pos) OVER (ORDER BY bin) AS cp
            FROM bins
        ),
        seg AS (
            SELECT j.i AS j, k.i AS k,
                   (k.cp - j.cp + j.n_pos) /
                       CAST(k.cn - j.cn + j.n AS DOUBLE) AS seg_avg
            FROM idx j JOIN idx k ON j.i <= k.i
        ),
        fit AS (
            SELECT b.i,
                   MAX(inner_min) AS iso
            FROM idx b
            JOIN (
                SELECT s.j, b2.i AS i, MIN(s.seg_avg) AS inner_min
                FROM seg s JOIN idx b2 ON s.j <= b2.i AND s.k >= b2.i
                GROUP BY s.j, b2.i
            ) m ON m.i = b.i AND m.j <= b.i
            GROUP BY b.i
        )
        SELECT idx.bin, idx.n, idx.n_pos,
               ROUND(idx.n_pos / CAST(idx.n AS DOUBLE), 6) AS raw_rate,
               ROUND(fit.iso, 6) AS isotonic_rate
        FROM idx JOIN fit ON fit.i = idx.i
    """,
    section="A99",
    doc="Isotonic (PAVA) calibration of purchase rate against the value "
    "score, computed DISTRIBUTED via the closed-form min-max identity "
    "fit(i) = max_{j<=i} min_{k>=i} weightedavg(j..k) on the binned "
    "score — the calibration step every scorer/filter pipeline runs "
    "before thresholding (A44's ECE MEASURES miscalibration; this "
    "FIXES it), and the sequential pool-adjacent-violators loop "
    "re-expressed as three joins over the bin-prefix table so no "
    "driver-side iteration exists. Exactness: bin counts are exact "
    "BIGINTs, every segment average is ONE division of integers "
    "(deterministic IEEE), min/max over exact doubles — the fit is "
    "bit-stable without rounding tricks. Scale: rows collapse to "
    "score bins first (map-combinable), the m^3 segment lattice runs "
    "on m ~ tens of bins — constant work after the reduction, "
    "regardless of corpus size.",
)
def q_agg_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bins = ev.groupBy(
        F.floor(F.col("value") / 25.0).cast("bigint").alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).cast("bigint").alias("n_pos"),
    )
    w = Window.orderBy("bin")
    idx = bins.select(
        "bin",
        "n",
        "n_pos",
        F.row_number().over(w).alias("i"),
        F.sum("n").over(w).alias("cn"),
        F.sum("n_pos").over(w).alias("cp"),
    ).localCheckpoint(eager=False)
    j = idx.select(
        F.col("i").alias("j"),
        F.col("cn").alias("jcn"),
        F.col("cp").alias("jcp"),
        F.col("n").alias("jn"),
        F.col("n_pos").alias("jnp"),
    )
    k = idx.select(
        F.col("i").alias("k"),
        F.col("cn").alias("kcn"),
        F.col("cp").alias("kcp"),
    )
    seg = j.join(F.broadcast(k), F.col("j") <= F.col("k")).select(
        "j",
        "k",
        (
            (F.col("kcp") - F.col("jcp") + F.col("jnp"))
            / (F.col("kcn") - F.col("jcn") + F.col("jn")).cast("double")
        ).alias("seg_avg"),
    )
    b2 = idx.select(F.col("i").alias("mid"))
    inner = (
        seg.join(
            F.broadcast(b2),
            (F.col("j") <= F.col("mid")) & (F.col("k") >= F.col("mid")),
        )
        .groupBy("j", "mid")
        .agg(F.min("seg_avg").alias("inner_min"))
    )
    fit = (
        inner.groupBy(F.col("mid").alias("i"))
        .agg(F.max("inner_min").alias("iso"))
    )
    return idx.join(fit, "i").select(
        "bin",
        "n",
        "n_pos",
        F.round(F.col("n_pos") / F.col("n").cast("double"), 6).alias(
            "raw_rate"
        ),
        F.round("iso", 6).alias("isotonic_rate"),
    )


# --- A100: split-conformal prediction interval -------------------------------


@register(
    "q_agg_conformal_interval",
    oracle="""
        WITH o AS (
            SELECT o_orderkey AS k, o_orderpriority AS g,
                   CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                        AS BIGINT) AS cents,
                   o_orderkey % 3 AS split
            FROM orders
        ),
        tr AS (
            SELECT g, cents,
                   row_number() OVER (
                       PARTITION BY g ORDER BY cents, k) AS rn,
                   COUNT(*) OVER (PARTITION BY g) AS n
            FROM o WHERE split = 0
        ),
        pred AS (
            SELECT g, cents AS pred FROM tr WHERE rn = (n + 1) // 2
        ),
        cal AS (
            SELECT abs(o.cents - p.pred) AS r
            FROM o JOIN pred p USING (g) WHERE o.split = 1
        ),
        kq AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_calib,
                   (9 * (COUNT(*) + 1) + 9) // 10 AS kk
            FROM cal
        ),
        qh AS (
            SELECT c.r AS qhat_cents
            FROM (SELECT r, row_number() OVER (ORDER BY r) AS rn
                  FROM cal) c CROSS JOIN kq
            WHERE c.rn = LEAST(kq.kk, kq.n_calib)
        ),
        te AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
                   CAST(SUM(CASE WHEN abs(o.cents - p.pred)
                                      <= qh.qhat_cents
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
            FROM o JOIN pred p USING (g) CROSS JOIN qh
            WHERE o.split = 2
        )
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM o WHERE split = 0)
                   AS n_train,
               kq.n_calib,
               te.n_test,
               CAST(qh.qhat_cents AS BIGINT) AS qhat_cents,
               te.n_covered,
               ROUND(CAST(te.n_covered AS DOUBLE) / te.n_test, 6)
                   AS coverage
        FROM kq CROSS JOIN qh CROSS JOIN te
    """,
    section="A100",
    doc="Split-conformal prediction interval with finite-sample coverage: "
    "orders split 3 ways by key (train/calibration/test), a per-"
    "priority train MEDIAN is the point predictor, the 90% conformal "
    "radius qhat is the ceil(0.9*(n+1))-th smallest absolute "
    "calibration residual, and test coverage verifies the "
    "distribution-free >=90% guarantee — the modern UQ wrapper every "
    "model-eval pipeline bolts onto a black-box predictor (isotonic "
    "A99 calibrates probabilities; this calibrates INTERVALS). "
    "Exactness: cents are exact BIGINT, the median and qhat are "
    "ORDER STATISTICS (row_number picks, duplicate-safe — the k-th "
    "smallest VALUE is tie-order invariant), the rank index "
    "ceil(9(n+1)/10) is pure integer arithmetic, every residual "
    "comparison is BIGINT; ONE division at the end. Scale: one "
    "5-group median window over the train split, one global rank "
    "over calibration residuals (at 100 TB: replace with a 2-pass "
    "count-then-select on the residual histogram), map-side "
    "coverage count; the 1-row pred/qhat relations broadcast.",
)
def q_agg_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("g"),
        (F.col("o_totalprice").cast(DecimalType(12, 2)) * 100)
        .cast("bigint")
        .alias("cents"),
        (F.col("o_orderkey") % 3).alias("split"),
    )
    wtr = Window.partitionBy("g").orderBy("cents", "k")
    tr = (
        o.where(F.col("split") == 0)
        .withColumn("rn", F.row_number().over(wtr))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("g")))
    )
    pred = tr.where(F.col("rn") == F.expr("(n + 1) div 2")).select(
        "g", F.col("cents").alias("pred")
    )
    cal = (
        o.where(F.col("split") == 1)
        .join(F.broadcast(pred), "g")
        .select(F.abs(F.col("cents") - F.col("pred")).alias("r"))
    )
    kq = cal.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_calib"),
        F.expr("(9 * (COUNT(*) + 1) + 9) div 10").alias("kk"),
    )
    # Scale note (r6): the k-th order statistic of the calibration
    # residuals comes from the distributed global rank (ties on r make the
    # rank assignment among equals arbitrary, but the SELECTED value at
    # position kk is the order statistic either way).
    from ai_to_cvent_etl_spark.operators.ranking import global_row_number

    qh = (
        global_row_number(cal, ["r"], out_col="rn")
        .crossJoin(F.broadcast(kq))
        .where(F.col("rn") == F.least(F.col("kk"), F.col("n_calib")))
        .select(F.col("r").alias("qhat_cents"))
    )
    te = (
        o.where(F.col("split") == 2)
        .join(F.broadcast(pred), "g")
        .crossJoin(F.broadcast(qh))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum(
                F.when(
                    F.abs(F.col("cents") - F.col("pred"))
                    <= F.col("qhat_cents"),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_covered"),
        )
    )
    ntr = o.where(F.col("split") == 0).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_train")
    )
    return (
        ntr.crossJoin(kq)
        .crossJoin(qh.select(F.col("qhat_cents").cast("bigint").alias("qhat_cents")))
        .crossJoin(te)
        .select(
            "n_train",
            "n_calib",
            "n_test",
            "qhat_cents",
            "n_covered",
            F.round(
                F.col("n_covered").cast("double") / F.col("n_test"), 6
            ).alias("coverage"),
        )
    )


# ---------------------------------------------------------------------------
# Wave 118 (r5): classical ML as relational algebra — Naive Bayes,
# multi-feature OLS, one Newton step of logistic regression.
# ---------------------------------------------------------------------------


@register(
    "q_agg_naive_bayes",
    oracle="""
        WITH train AS (
            SELECT * FROM documents WHERE doc_id % 5 <> 0
        ),
        test AS (
            SELECT * FROM documents WHERE doc_id % 5 = 0
        ),
        tr_toks AS (
            SELECT lang, unnest(string_split(text, ' ')) AS tok
            FROM train
        ),
        ct AS (
            SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS c
            FROM tr_toks GROUP BY lang, tok
        ),
        cls AS (
            SELECT lang,
                   CAST(SUM(c) AS DOUBLE) AS t_c,
                   (SELECT CAST(COUNT(DISTINCT tok) AS DOUBLE)
                    FROM tr_toks) AS v
            FROM ct GROUP BY lang
        ),
        prior AS (
            SELECT lang,
                   CAST(COUNT(*) AS DOUBLE)
                   / (SELECT COUNT(*) FROM train) AS p
            FROM train GROUP BY lang
        ),
        te_toks AS (
            SELECT doc_id, lang AS true_lang,
                   unnest(string_split(text, ' ')) AS tok
            FROM test
        ),
        scored AS (
            SELECT t.doc_id, t.true_lang, cls.lang AS cand,
                   ln((SELECT p FROM prior WHERE prior.lang = cls.lang))
                   + SUM(ln((COALESCE(ct.c, 0) + 1)
                            / (cls.t_c + cls.v))) AS score
            FROM te_toks t
            CROSS JOIN cls
            LEFT JOIN ct ON ct.lang = cls.lang AND ct.tok = t.tok
            GROUP BY t.doc_id, t.true_lang, cls.lang, cls.t_c, cls.v
        ),
        pred AS (
            SELECT doc_id, true_lang, cand AS pred_lang FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY doc_id
                    ORDER BY score DESC, cand) AS rn
                FROM scored
            ) WHERE rn = 1
        )
        SELECT true_lang, pred_lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM pred GROUP BY true_lang, pred_lang
    """,
    section="A101",
    doc="Multinomial Naive Bayes, trained and evaluated entirely in "
    "relational algebra: add-one-smoothed per-language token "
    "likelihoods from the doc_id%5 train split, log-posterior "
    "scoring of the held-out split, argmax prediction, and the "
    "confusion matrix as output — the canonical baseline text "
    "classifier as ONE declarative plan (train and inference are "
    "the same DAG, no driver loop, no model file). Log-likelihood "
    "sums are float with deterministic per-class tie-break on the "
    "language code; the output counts are exact BIGINT (the L7 "
    "rule: irrational arithmetic may order RANKS only where gaps "
    "are macroscopic — class scores differ by whole nats in this "
    "corpus). Scale: the model (lang x vocab counts, class totals, "
    "priors) is vocabulary-sized and broadcasts; test tokens fan "
    "out 5x (once per class) then collapse to doc grain — the "
    "shuffle carries (doc, class) partial log-sums, never raw "
    "text; at 100 TB this is the evaluate-a-quality-classifier "
    "pass every curation pipeline runs.",
)
def q_agg_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import fan_out

    docs = load_table(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 5 != 0)
    test = docs.where(F.col("doc_id") % 5 == 0)
    tr_toks = fan_out(train).select(
        "lang", F.explode(F.split("text", " ")).alias("tok")
    )
    ct = tr_toks.groupBy("lang", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    v = tr_toks.agg(
        F.countDistinct("tok").cast("double").alias("v")
    )
    cls = (
        ct.groupBy("lang")
        .agg(F.sum("c").cast("double").alias("t_c"))
        .crossJoin(F.broadcast(v))
    )
    n_train = train.agg(F.count(F.lit(1)).alias("n_tr"))
    prior = (
        train.groupBy("lang")
        .agg(F.count(F.lit(1)).cast("double").alias("n_c"))
        .crossJoin(F.broadcast(n_train))
        .select("lang", (F.col("n_c") / F.col("n_tr")).alias("p"))
    )
    te_toks = fan_out(test).select(
        "doc_id",
        F.col("lang").alias("true_lang"),
        F.explode(F.split("text", " ")).alias("tok"),
    )
    cand = cls.select(
        F.col("lang").alias("cand"), "t_c", "v"
    ).join(prior.select(F.col("lang").alias("cand"), "p"), "cand")
    scored = (
        te_toks.crossJoin(F.broadcast(cand))
        .join(
            F.broadcast(
                ct.select(
                    F.col("lang").alias("cand"),
                    "tok",
                    F.col("c").alias("ct_c"),
                )
            ),
            ["cand", "tok"],
            "left",
        )
        .groupBy("doc_id", "true_lang", "cand", "t_c", "v", "p")
        .agg(
            F.sum(
                F.log(
                    (F.coalesce(F.col("ct_c"), F.lit(0)) + 1)
                    / (F.col("t_c") + F.col("v"))
                )
            ).alias("ll")
        )
        .select(
            "doc_id",
            "true_lang",
            "cand",
            (F.log("p") + F.col("ll")).alias("score"),
        )
    )
    pred = (
        scored.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(
                    F.col("score").desc(), "cand"
                )
            ),
        )
        .where(F.col("rn") == 1)
        .select("true_lang", F.col("cand").alias("pred_lang"))
    )
    return pred.groupBy("true_lang", "pred_lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )


@register(
    "q_agg_ols_normal_eq",
    oracle="""
        WITH m AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s1,
                   CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS s2,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                            * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s11,
                   CAST(SUM(CAST(l_discount AS DECIMAL(18,2))
                            * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS s22,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                            * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS s12,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                            * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s1y,
                   CAST(SUM(CAST(l_discount AS DECIMAL(18,2))
                            * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s2y
            FROM lineitem
        )
        SELECT ROUND((
                 sy * (s11 * s22 - s12 * s12)
               - s1y * (s1 * s22 - s12 * s2)
               + s2y * (s1 * s12 - s11 * s2)
               ) / (
                 n * (s11 * s22 - s12 * s12)
               - s1 * (s1 * s22 - s12 * s2)
               + s2 * (s1 * s12 - s11 * s2)
               ), 6) AS b0,
               ROUND((
                 n * (s1y * s22 - s12 * s2y)
               - s1 * (sy * s22 - s2 * s2y)
               + s2 * (sy * s12 - s2 * s1y)
               ) / (
                 n * (s11 * s22 - s12 * s12)
               - s1 * (s1 * s22 - s12 * s2)
               + s2 * (s1 * s12 - s11 * s2)
               ), 6) AS b1,
               ROUND((
                 n * (s11 * s2y - s1y * s12)
               - s1 * (s1 * s2y - s2 * s1y)
               + sy * (s1 * s12 - s11 * s2)
               ) / (
                 n * (s11 * s22 - s12 * s12)
               - s1 * (s1 * s22 - s12 * s2)
               + s2 * (s1 * s12 - s11 * s2)
               ), 6) AS b2
        FROM m
    """,
    section="A102",
    doc="Two-feature OLS (price ~ quantity + discount) solved by "
    "Cramer's rule on the 3x3 normal equations — distributed "
    "multi-feature linear regression as ONE aggregation: the nine "
    "sufficient moments (n, sums, cross-products) are EXACT "
    "DECIMAL sums of exact 2dp-decimal products, so the only float "
    "arithmetic is the final determinant expressions on nine "
    "identical scalars — bit-identical cross-engine, ROUND(6)-"
    "pinned. Extends A?-linear_fit (1 feature) the way every MPP "
    "warehouse implements REGR_*: sufficient statistics "
    "map-combine; the model solve is O(p^3) on the driver-sized "
    "1-row result, here inlined relationally. Scale: one "
    "map-combinable scan at any SF; at 100 TB the same nine "
    "moments stream through partial aggregation unchanged.",
)
def q_agg_ols_normal_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import dec2

    li = load_table(spark, sf_dir, "lineitem")
    q = dec2(F.col("l_quantity"))
    d = dec2(F.col("l_discount"))
    y = dec2(F.col("l_extendedprice"))
    m = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(q).cast("double").alias("s1"),
        F.sum(d).cast("double").alias("s2"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(q * q).cast("double").alias("s11"),
        F.sum(d * d).cast("double").alias("s22"),
        F.sum(q * d).cast("double").alias("s12"),
        F.sum(q * y).cast("double").alias("s1y"),
        F.sum(d * y).cast("double").alias("s2y"),
    )
    n, s1, s2, sy = F.col("n"), F.col("s1"), F.col("s2"), F.col("sy")
    s11, s22, s12 = F.col("s11"), F.col("s22"), F.col("s12")
    s1y, s2y = F.col("s1y"), F.col("s2y")
    det = (
        n * (s11 * s22 - s12 * s12)
        - s1 * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s12 - s11 * s2)
    )
    b0 = (
        sy * (s11 * s22 - s12 * s12)
        - s1y * (s1 * s22 - s12 * s2)
        + s2y * (s1 * s12 - s11 * s2)
    ) / det
    b1 = (
        n * (s1y * s22 - s12 * s2y)
        - s1 * (sy * s22 - s2 * s2y)
        + s2 * (sy * s12 - s2 * s1y)
    ) / det
    b2 = (
        n * (s11 * s2y - s1y * s12)
        - s1 * (s1 * s2y - s2 * s1y)
        + sy * (s1 * s12 - s11 * s2)
    ) / det
    return m.select(
        F.round(b0, 6).alias("b0"),
        F.round(b1, 6).alias("b1"),
        F.round(b2, 6).alias("b2"),
    )


@register(
    "q_agg_logistic_newton",
    oracle="""
        WITH m AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                   CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sx,
                   CAST(SUM(CAST(l_discount AS DECIMAL(18,2))
                            * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
                   CAST(SUM(CASE WHEN l_returnflag = 'R'
                                 THEN CAST(1 AS DECIMAL(18,2))
                                 ELSE CAST(0 AS DECIMAL(18,2)) END
                            - CAST(0.5 AS DECIMAL(18,2))) AS DOUBLE) AS g0,
                   CAST(SUM(CAST(l_discount AS DECIMAL(18,2))
                            * (CASE WHEN l_returnflag = 'R'
                                    THEN CAST(1 AS DECIMAL(18,2))
                                    ELSE CAST(0 AS DECIMAL(18,2)) END
                               - CAST(0.5 AS DECIMAL(18,2))))
                        AS DOUBLE) AS g1
            FROM lineitem
        )
        SELECT ROUND((sxx * g0 - sx * g1)
                     / ((n * sxx - sx * sx) / 4), 6) AS w0,
               ROUND((n * g1 - sx * g0)
                     / ((n * sxx - sx * sx) / 4), 6) AS w1,
               CAST(n AS BIGINT) AS n_rows
        FROM m
    """,
    section="A103",
    doc="One Newton-Raphson step of logistic regression "
    "(P[returnflag='R'] ~ discount) from w=0: at the zero weight "
    "vector every p_i = 1/2, so the gradient is sum(x_i (y_i - "
    "1/2)) and the Hessian is (1/4) X'X — both EXACT decimal sums "
    "(y is 0/1, x is 2dp, 0.5 is exact decimal), making the "
    "textbook IRLS iteration a pure relational aggregate with a "
    "closed-form 2x2 solve on identical scalars (ROUND 6). This "
    "pins the pattern every distributed GLM implements: sufficient "
    "statistics map-combine per step, the tiny solve happens on "
    "the 1-row result; further steps would chain the same shape "
    "with p_i re-evaluated row-locally (the V16 unrolled-iteration "
    "device). Scale: one map-combinable scan per step, 5 scalars "
    "of state.",
)
def q_agg_logistic_newton(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import dec2

    li = load_table(spark, sf_dir, "lineitem")
    x = dec2(F.col("l_discount"))
    ymh = F.when(
        F.col("l_returnflag") == "R", F.lit(1).cast("decimal(18,2)")
    ).otherwise(F.lit(0).cast("decimal(18,2)")) - F.lit(0.5).cast(
        "decimal(18,2)"
    )
    m = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(ymh).cast("double").alias("g0"),
        F.sum(x * ymh).cast("double").alias("g1"),
    )
    det4 = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")) / 4
    return m.select(
        F.round(
            (F.col("sxx") * F.col("g0") - F.col("sx") * F.col("g1"))
            / det4,
            6,
        ).alias("w0"),
        F.round(
            (F.col("n") * F.col("g1") - F.col("sx") * F.col("g0"))
            / det4,
            6,
        ).alias("w1"),
        F.col("n").cast("bigint").alias("n_rows"),
    )


@register(
    "q_agg_decision_stump",
    oracle="""
        WITH pts AS (
            SELECT l_quantity AS x,
                   CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
            FROM lineitem
        ),
        per_v AS (
            SELECT x, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(y) AS BIGINT) AS pos
            FROM pts GROUP BY x
        ),
        tot AS (
            SELECT CAST(SUM(n) AS BIGINT) AS nt,
                   CAST(SUM(pos) AS BIGINT) AS post
            FROM per_v
        ),
        cand AS (
            SELECT x AS thr,
                   SUM(n) OVER (ORDER BY x) AS nl,
                   SUM(pos) OVER (ORDER BY x) AS posl
            FROM per_v
        ),
        scored AS (
            SELECT c.thr,
                   c.nl, t.nt - c.nl AS nr,
                   -- weighted Gini * nt, all in exact integer-ratio
                   -- form: nl*gini_l = nl - posl^2/nl - negl^2/nl
                   (CAST(c.nl AS DOUBLE)
                    - (CAST(c.posl AS DOUBLE) * c.posl
                       + CAST(c.nl - c.posl AS DOUBLE) * (c.nl - c.posl))
                      / c.nl)
                   + (CAST(t.nt - c.nl AS DOUBLE)
                      - (CAST(t.post - c.posl AS DOUBLE)
                         * (t.post - c.posl)
                         + CAST((t.nt - c.nl) - (t.post - c.posl)
                                AS DOUBLE)
                           * ((t.nt - c.nl) - (t.post - c.posl)))
                        / (t.nt - c.nl)) AS wgini_nt
            FROM cand c CROSS JOIN tot t
            WHERE c.nl < t.nt
        )
        SELECT thr AS best_threshold,
               CAST(nl AS BIGINT) AS n_left,
               CAST(nr AS BIGINT) AS n_right,
               ROUND(wgini_nt / (SELECT nt FROM tot), 6) AS weighted_gini
        FROM (
            SELECT *, row_number() OVER (
                ORDER BY wgini_nt, thr) AS rn
            FROM scored
        ) WHERE rn = 1
    """,
    section="A104",
    doc="Decision-tree stump: the best single split of "
    "P[returnflag='R'] on l_quantity by weighted Gini impurity — "
    "the NODE PRIMITIVE every distributed tree learner "
    "(XGBoost/LightGBM's exact mode) evaluates: collapse to "
    "per-value class histograms, prefix-sum them once, score every "
    "threshold from the cumulative counts, argmin. The impurity "
    "n_l*gini_l = n_l - (pos_l^2 + neg_l^2)/n_l is computed from "
    "exact BIGINT cumulative counts with one division per "
    "candidate — products of identical integers are exact doubles "
    "(< 2^53), so the argmin comparison is deterministic, with a "
    "threshold tie-break. Scale: the fact collapses to ~50 "
    "per-value rows BEFORE any window; the threshold sweep runs on "
    "that value-grain table — at 100 TB this is one map-combinable "
    "histogram + a driver-sized scan, the exact split-finding "
    "shape of a distributed GBDT.",
)
def q_agg_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    per_v = li.groupBy(F.col("l_quantity").alias("x")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
        )
        .cast("bigint")
        .alias("pos"),
    )
    tot = per_v.agg(
        F.sum("n").cast("bigint").alias("nt"),
        F.sum("pos").cast("bigint").alias("post"),
    )
    w = Window.orderBy("x").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cand = per_v.select(
        F.col("x").alias("thr"),
        F.sum("n").over(w).alias("nl"),
        F.sum("pos").over(w).alias("posl"),
    )
    j = cand.crossJoin(F.broadcast(tot)).where(
        F.col("nl") < F.col("nt")
    )
    nl, posl = F.col("nl"), F.col("posl")
    nt, post = F.col("nt"), F.col("post")
    negl = nl - posl
    nr = nt - nl
    posr = post - posl
    negr = nr - posr
    wgini_nt = (
        nl.cast("double")
        - (posl.cast("double") * posl + negl.cast("double") * negl)
        / nl
    ) + (
        nr.cast("double")
        - (posr.cast("double") * posr + negr.cast("double") * negr)
        / nr
    )
    scored = j.select(
        "thr",
        "nl",
        nr.alias("nr"),
        wgini_nt.alias("wgini_nt"),
        "nt",
    )
    return (
        scored.withColumn(
            "rn",
            F.row_number().over(Window.orderBy("wgini_nt", "thr")),
        )
        .where(F.col("rn") == 1)
        .select(
            F.col("thr").alias("best_threshold"),
            F.col("nl").cast("bigint").alias("n_left"),
            F.col("nr").cast("bigint").alias("n_right"),
            F.round(F.col("wgini_nt") / F.col("nt"), 6).alias(
                "weighted_gini"
            ),
        )
    )


_DH_SEATS = 20


@register(
    "q_agg_dhondt",
    oracle=f"""
        WITH votes AS (
            SELECT c_nationkey AS party,
                   CAST(COUNT(*) AS BIGINT) AS v
            FROM customer GROUP BY 1
        ),
        quot AS (
            SELECT party, v, d.d,
                   CAST(v AS DOUBLE) / d.d AS q
            FROM votes
            CROSS JOIN (SELECT unnest(range(1, {_DH_SEATS + 1})) AS d) d
        ),
        winners AS (
            SELECT party FROM (
                SELECT party,
                       row_number() OVER (
                           ORDER BY q DESC, party, d) AS rn
                FROM quot
            ) WHERE rn <= {_DH_SEATS}
        )
        SELECT v.party, v.v AS votes,
               CAST(COALESCE(w.seats, 0) AS BIGINT) AS seats
        FROM votes v
        LEFT JOIN (
            SELECT party, COUNT(*) AS seats
            FROM winners GROUP BY party
        ) w ON v.party = w.party
    """,
    section="A105",
    doc=f"D'Hondt divisor-method apportionment ({_DH_SEATS} seats by "
    "customer count per nation): the classically SEQUENTIAL "
    "seat-by-seat award has a closed form — party i wins as many "
    "seats as it has quotients v_i/d (d=1..k) in the global top-k "
    "— so the whole allocation is one cross join + one top-k "
    "window, no iteration. Quotients are IEEE divisions of "
    "identical integers (bit-identical cross-engine); ties break "
    "on (party, divisor), matching statutory lowest-party-number "
    "rules. Zero-seat parties are kept via the outer join (the "
    "Q13 device). The same shape computes Sainte-Laguë with odd "
    "divisors and any largest-quotient allocation — the "
    "proportional-fairness primitive for quota assignment and "
    "shard balancing. Scale: votes collapse to party grain first; "
    f"the quotient table is parties x {_DH_SEATS} rows — "
    "driver-sized at any corpus size.",
)
def q_agg_dhondt(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    votes = cust.groupBy(F.col("c_nationkey").alias("party")).agg(
        F.count(F.lit(1)).cast("bigint").alias("v")
    )
    divisors = spark.range(1, _DH_SEATS + 1).select(
        F.col("id").alias("d")
    )
    quot = votes.crossJoin(F.broadcast(divisors)).select(
        "party",
        "v",
        "d",
        (F.col("v").cast("double") / F.col("d")).alias("q"),
    )
    winners = (
        quot.withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy(F.col("q").desc(), "party", "d")
            ),
        )
        .where(F.col("rn") <= _DH_SEATS)
        .groupBy("party")
        .agg(F.count(F.lit(1)).alias("seats"))
    )
    return votes.join(F.broadcast(winners), "party", "left").select(
        "party",
        F.col("v").alias("votes"),
        F.coalesce(F.col("seats"), F.lit(0))
        .cast("bigint")
        .alias("seats"),
    )


@register(
    "q_agg_hodges_lehmann",
    oracle="""
        WITH vg AS (
            SELECT l_quantity AS v, CAST(COUNT(*) AS BIGINT) AS c
            FROM lineitem GROUP BY 1
        ),
        walsh AS (
            SELECT (a.v + b.v) / 2 AS wavg,
                   CASE WHEN a.v = b.v THEN a.c * (a.c + 1) / 2
                        ELSE a.c * b.c END AS m
            FROM vg a JOIN vg b ON a.v <= b.v
        ),
        grouped AS (
            SELECT wavg, CAST(SUM(m) AS BIGINT) AS m
            FROM walsh GROUP BY wavg
        ),
        cum AS (
            SELECT wavg, m,
                   SUM(m) OVER (ORDER BY wavg) AS cm,
                   (SELECT SUM(m) FROM grouped) AS nt
            FROM grouped
        )
        SELECT
            CAST((SELECT MIN(wavg) FROM cum
                  WHERE cm >= (nt + 1) / 2) AS DOUBLE) AS hl_lo,
            CAST((SELECT MIN(wavg) FROM cum
                  WHERE cm >= nt / 2 + 1) AS DOUBLE) AS hl_hi,
            CAST((SELECT MIN(wavg) FROM cum
                  WHERE cm >= (nt + 1) / 2) AS DOUBLE) / 2
            + CAST((SELECT MIN(wavg) FROM cum
                    WHERE cm >= nt / 2 + 1) AS DOUBLE) / 2 AS hl_estimate
        FROM (SELECT 1)
    """,
    section="A107",
    doc="Hodges-Lehmann location estimator of l_quantity: the median "
    "of all Walsh averages (v_i+v_j)/2, i<=j — the robust "
    "location estimate dual to the Wilcoxon signed-rank test "
    "(~95% Gaussian efficiency, 29% breakdown, vs the mean's 0%). "
    "The O(n^2) pair set collapses to VALUE-grain first: ~50 "
    "distinct quantities make 1275 weighted Walsh cells, each "
    "carrying its exact multiplicity (c_i*c_j off-diagonal, "
    "c(c+1)/2 diagonal), and the median comes from the cumulative "
    "multiplicity walk — low/high order statistics separately, "
    "averaged, so even-N behavior is deterministic. Walsh "
    "averages of 2dp values are exact binary halves; every count "
    "is BIGINT; no rounding anywhere. Scale: the pair stage is "
    "value-grain (distinct-value^2 / 2 cells, independent of fact "
    "size) — the same collapse that made A104's stump sweep and "
    "the W16 family scale-free.",
)
def q_agg_hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    vg = li.groupBy(F.col("l_quantity").alias("v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    a = vg.select(F.col("v").alias("va"), F.col("c").alias("ca"))
    b = vg.select(F.col("v").alias("vb"), F.col("c").alias("cb"))
    walsh = (
        a.join(F.broadcast(b), F.col("va") <= F.col("vb"))
        .select(
            ((F.col("va") + F.col("vb")) / 2).alias("wavg"),
            F.when(
                F.col("va") == F.col("vb"),
                F.col("ca") * (F.col("ca") + 1) / 2,
            )
            .otherwise(F.col("ca") * F.col("cb"))
            .cast("bigint")
            .alias("m"),
        )
        .groupBy("wavg")
        .agg(F.sum("m").cast("bigint").alias("m"))
    )
    w = Window.orderBy("wavg").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = walsh.agg(F.sum("m").alias("nt"))
    cum = walsh.select(
        "wavg", F.sum("m").over(w).alias("cm")
    ).crossJoin(F.broadcast(tot))
    lo = cum.where(
        F.col("cm") >= (F.col("nt") + 1) / 2
    ).agg(F.min("wavg").alias("hl_lo"))
    hi = cum.where(
        F.col("cm") >= F.col("nt") / 2 + 1
    ).agg(F.min("wavg").alias("hl_hi"))
    return (
        lo.crossJoin(F.broadcast(hi))
        .select(
            F.col("hl_lo").cast("double").alias("hl_lo"),
            F.col("hl_hi").cast("double").alias("hl_hi"),
            (
                F.col("hl_lo").cast("double") / 2
                + F.col("hl_hi").cast("double") / 2
            ).alias("hl_estimate"),
        )
    )


@register(
    "q_agg_nelson_aalen",
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
        risk AS (
            SELECT t, d,
                   CAST(SUM(d) OVER () AS BIGINT)
                   - CAST(SUM(d) OVER w AS BIGINT) + d AS n_risk
            FROM ev
            WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)
        )
        SELECT t, d, n_risk,
               ROUND(CAST(SUM(CAST(floor(
                         (CAST(d AS DOUBLE) / n_risk) * 1e12)
                         AS DECIMAL(38,0))) OVER w AS DOUBLE) / 1e12,
                     6) AS cum_hazard,
               ROUND(exp(-CAST(SUM(CAST(floor(
                         (CAST(d AS DOUBLE) / n_risk) * 1e12)
                         AS DECIMAL(38,0))) OVER w AS DOUBLE) / 1e12),
                     6) AS breslow_survival
        FROM risk
        WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    """,
    section="A108",
    doc="Nelson-Aalen cumulative-hazard estimator over customer "
    "inter-order gaps, with the Breslow survival exp(-H(t)) — the "
    "hazard-side dual of A33's Kaplan-Meier: H(t) = sum(d_i/n_i) "
    "over event times up to t estimates the integrated hazard "
    "directly (the quantity additive over time and therefore the "
    "one to compare across strata or feed a Cox baseline). Same "
    "at-risk construction as KM (total minus prior events); each "
    "d/n increment is quantized through the floor-1e12 DECIMAL "
    "fold so the RUNNING sum is order-free (rule 10 — a raw "
    "double cumulative would drift between Spark's running frames "
    "and DuckDB's segment trees); one exp at render. Scale: "
    "collapses to gap-grain (~hundreds of rows) before any "
    "window; the fact contributes one lead() pass per customer "
    "partition.",
)
def q_agg_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w_cust = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    gaps = orders.select(
        F.datediff(
            F.lead("o_orderdate").over(w_cust), F.col("o_orderdate")
        )
        .cast("bigint")
        .alias("gap")
    ).where(F.col("gap").isNotNull())
    ev = gaps.groupBy(F.col("gap").alias("t")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    w = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = ev.agg(F.sum("d").cast("bigint").alias("dt"))
    risk = ev.crossJoin(F.broadcast(tot)).select(
        "t",
        "d",
        (
            F.col("dt") - F.sum("d").over(w).cast("bigint") + F.col("d")
        ).alias("n_risk"),
    )
    inc = F.floor(
        (F.col("d").cast("double") / F.col("n_risk")) * 1e12
    ).cast("decimal(38,0)")
    cum = F.sum(inc).over(w).cast("double") / 1e12
    return risk.select(
        "t",
        "d",
        "n_risk",
        F.round(cum, 6).alias("cum_hazard"),
        F.round(F.exp(-cum), 6).alias("breslow_survival"),
    )


@register(
    "q_agg_shapley_r2",
    oracle="""
        WITH m AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s1,
                   CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS s2,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                            * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s11,
                   CAST(SUM(CAST(l_discount AS DECIMAL(18,2))
                            * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS s22,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                            * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS s12,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                            * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s1y,
                   CAST(SUM(CAST(l_discount AS DECIMAL(18,2))
                            * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s2y,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                            * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
            FROM lineitem
        ),
        c AS (
            SELECT (n * s1y - s1 * sy)
                   / sqrt((n * s11 - s1 * s1) * (n * syy - sy * sy))
                       AS r1y,
                   (n * s2y - s2 * sy)
                   / sqrt((n * s22 - s2 * s2) * (n * syy - sy * sy))
                       AS r2y,
                   (n * s12 - s1 * s2)
                   / sqrt((n * s11 - s1 * s1) * (n * s22 - s2 * s2))
                       AS r12
            FROM m
        ),
        v AS (
            SELECT r1y * r1y AS v1,
                   r2y * r2y AS v2,
                   (r1y * r1y + r2y * r2y - 2 * r1y * r2y * r12)
                   / (1 - r12 * r12) AS v12
            FROM c
        )
        SELECT ROUND(0.5 * v1 + 0.5 * (v12 - v2), 6) AS shapley_x1,
               ROUND(0.5 * v2 + 0.5 * (v12 - v1), 6) AS shapley_x2,
               ROUND(v12, 6) AS r2_full
        FROM v
    """,
    section="A109",
    doc="Shapley decomposition of regression R^2 (LMG / dominance "
    "analysis) for price ~ quantity + discount: each feature's "
    "fair-attribution share of the full model's R^2, averaging its "
    "marginal contribution over both entry orders — "
    "phi_1 = (R2({1}) + R2({1,2}) - R2({2}))/2 — the 2-feature "
    "closed form of the same game-theoretic attribution SHAP "
    "applies per-prediction, here applied to the MODEL (variance "
    "explained). Everything derives from the TEN exact-decimal "
    "moments of A102 plus syy: correlations, sub-model R^2s via "
    "the standard two-regressor identity, and the two Shapley "
    "values — float arithmetic only on identical 1-row scalars, "
    "ROUND(6). phi_1 + phi_2 = R2_full by construction "
    "(efficiency axiom), which the oracle equality implicitly "
    "verifies. Scale: one map-combinable scan; attribution is "
    "free once the moment matrix exists — the same p-moment "
    "pattern extends to p features with 2^p closed-form "
    "sub-model R^2s from the same matrix.",
)
def q_agg_shapley_r2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import dec2

    li = load_table(spark, sf_dir, "lineitem")
    q = dec2(F.col("l_quantity"))
    d = dec2(F.col("l_discount"))
    y = dec2(F.col("l_extendedprice"))
    m = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(q).cast("double").alias("s1"),
        F.sum(d).cast("double").alias("s2"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(q * q).cast("double").alias("s11"),
        F.sum(d * d).cast("double").alias("s22"),
        F.sum(q * d).cast("double").alias("s12"),
        F.sum(q * y).cast("double").alias("s1y"),
        F.sum(d * y).cast("double").alias("s2y"),
        F.sum(y * y).cast("double").alias("syy"),
    )
    n, s1, s2, sy = F.col("n"), F.col("s1"), F.col("s2"), F.col("sy")
    s11, s22, s12 = F.col("s11"), F.col("s22"), F.col("s12")
    s1y, s2y, syy = F.col("s1y"), F.col("s2y"), F.col("syy")
    r1y = (n * s1y - s1 * sy) / F.sqrt(
        (n * s11 - s1 * s1) * (n * syy - sy * sy)
    )
    r2y = (n * s2y - s2 * sy) / F.sqrt(
        (n * s22 - s2 * s2) * (n * syy - sy * sy)
    )
    r12 = (n * s12 - s1 * s2) / F.sqrt(
        (n * s11 - s1 * s1) * (n * s22 - s2 * s2)
    )
    c = m.select(
        r1y.alias("r1y"), r2y.alias("r2y"), r12.alias("r12")
    )
    v1 = F.col("r1y") * F.col("r1y")
    v2 = F.col("r2y") * F.col("r2y")
    v12 = (
        F.col("r1y") * F.col("r1y")
        + F.col("r2y") * F.col("r2y")
        - 2 * F.col("r1y") * F.col("r2y") * F.col("r12")
    ) / (1 - F.col("r12") * F.col("r12"))
    return c.select(
        F.round(0.5 * v1 + 0.5 * (v12 - v2), 6).alias("shapley_x1"),
        F.round(0.5 * v2 + 0.5 * (v12 - v1), 6).alias("shapley_x2"),
        F.round(v12, 6).alias("r2_full"),
    )


@register(
    "q_agg_mutual_information",
    oracle="""
        WITH joint AS (
            SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS nij
            FROM documents GROUP BY lang, source
        ),
        marg_l AS (
            SELECT lang, CAST(SUM(nij) AS BIGINT) AS ni
            FROM joint GROUP BY lang
        ),
        marg_s AS (
            SELECT source, CAST(SUM(nij) AS BIGINT) AS nj
            FROM joint GROUP BY source
        ),
        n AS (SELECT CAST(SUM(nij) AS BIGINT) AS nt FROM joint),
        terms AS (
            SELECT j.nij, l.ni, s.nj, n.nt,
                   CAST(floor(
                       (CAST(j.nij AS DOUBLE) / n.nt)
                       * ln(CAST(j.nij AS DOUBLE) * n.nt
                            / (CAST(l.ni AS DOUBLE) * s.nj))
                       * 1e12) AS DECIMAL(38,0)) AS q
            FROM joint j
            JOIN marg_l l ON j.lang = l.lang
            JOIN marg_s s ON j.source = s.source
            CROSS JOIN n
        ),
        hx AS (
            SELECT CAST(SUM(CAST(floor(
                       -(CAST(ni AS DOUBLE) / n.nt)
                       * ln(CAST(ni AS DOUBLE) / n.nt) * 1e12)
                       AS DECIMAL(38,0))) AS DOUBLE) / 1e12 AS h
            FROM marg_l CROSS JOIN n
        ),
        hy AS (
            SELECT CAST(SUM(CAST(floor(
                       -(CAST(nj AS DOUBLE) / n.nt)
                       * ln(CAST(nj AS DOUBLE) / n.nt) * 1e12)
                       AS DECIMAL(38,0))) AS DOUBLE) / 1e12 AS h
            FROM marg_s CROSS JOIN n
        )
        SELECT ROUND(CAST(SUM(q) AS DOUBLE) / 1e12, 6) AS mi_nats,
               ROUND(CAST(SUM(q) AS DOUBLE) / 1e12
                     / sqrt((SELECT h FROM hx)
                            * (SELECT h FROM hy)), 6) AS nmi
        FROM terms
    """,
    section="A110",
    doc="Mutual information between the lang and source columns (in "
    "nats) plus the sqrt-normalized NMI — the information-theoretic "
    "association measure that complements A?-cramers_v (effect "
    "size) and chisq (significance): MI answers 'how many nats "
    "does knowing the source tell you about the language', the "
    "quantity used to rank candidate partition/cluster columns and "
    "to detect leaking features. Every p*ln(p-ratio) term is "
    "quantized through the floor-1e12 DECIMAL fold (rule 10) so "
    "the sums over the contingency cells are order-free; counts "
    "and marginals are exact BIGINT. Scale: one map-combinable "
    "groupBy to the (lang x source) contingency grain (~100 "
    "cells); marginals and entropies derive from that table, "
    "never rescanning the fact.",
)
def q_agg_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    joint = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("nij")
    )
    marg_l = joint.groupBy("lang").agg(
        F.sum("nij").cast("bigint").alias("ni")
    )
    marg_s = joint.groupBy("source").agg(
        F.sum("nij").cast("bigint").alias("nj")
    )
    n = joint.agg(F.sum("nij").cast("bigint").alias("nt"))

    def fold12(expr):
        return F.sum(F.floor(expr * 1e12).cast("decimal(38,0)")).cast(
            "double"
        ) / 1e12

    terms = (
        joint.join(F.broadcast(marg_l), "lang")
        .join(F.broadcast(marg_s), "source")
        .crossJoin(F.broadcast(n))
    )
    mi = terms.agg(
        fold12(
            (F.col("nij").cast("double") / F.col("nt"))
            * F.log(
                F.col("nij").cast("double")
                * F.col("nt")
                / (F.col("ni").cast("double") * F.col("nj"))
            )
        ).alias("mi_nats")
    )
    hx = marg_l.crossJoin(F.broadcast(n)).agg(
        fold12(
            -(F.col("ni").cast("double") / F.col("nt"))
            * F.log(F.col("ni").cast("double") / F.col("nt"))
        ).alias("hx")
    )
    hy = marg_s.crossJoin(F.broadcast(n)).agg(
        fold12(
            -(F.col("nj").cast("double") / F.col("nt"))
            * F.log(F.col("nj").cast("double") / F.col("nt"))
        ).alias("hy")
    )
    return (
        mi.crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
        .select(
            F.round("mi_nats", 6).alias("mi_nats"),
            F.round(
                F.col("mi_nats") / F.sqrt(F.col("hx") * F.col("hy")), 6
            ).alias("nmi"),
        )
    )


@register(
    "q_agg_price_elasticity",
    oracle="""
        WITH obs AS (
            SELECT ln(l_extendedprice / l_quantity) AS lp,
                   ln(l_quantity) AS lq
            FROM lineitem
            WHERE l_quantity > 0 AND l_extendedprice > 0
        ),
        folded AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(floor(lp * 1e12) AS DECIMAL(38,0)))
                        AS DOUBLE) / 1e12 AS sp,
                   CAST(SUM(CAST(floor(lq * 1e12) AS DECIMAL(38,0)))
                        AS DOUBLE) / 1e12 AS sq,
                   CAST(SUM(CAST(floor(lp * lp * 1e12)
                        AS DECIMAL(38,0))) AS DOUBLE) / 1e12 AS spp,
                   CAST(SUM(CAST(floor(lp * lq * 1e12)
                        AS DECIMAL(38,0))) AS DOUBLE) / 1e12 AS spq
            FROM obs
        )
        SELECT ROUND((n * spq - sp * sq) / (n * spp - sp * sp), 6)
                   AS elasticity,
               ROUND((sq - (n * spq - sp * sq) / (n * spp - sp * sp)
                           * sp) / n, 6) AS log_intercept,
               n AS n_obs
        FROM folded
    """,
    section="A111",
    doc="Own-price elasticity of demand: the slope of ln(quantity) on "
    "ln(unit price) — the log-log regression whose coefficient IS "
    "the elasticity (a 1% price change moves quantity by "
    "elasticity %), the pricing-analytics primitive behind every "
    "demand curve fit. Unlike A102's raw-moment OLS (where 2dp "
    "inputs make decimal sums exact), the log transform produces "
    "irrational terms — so every per-row ln product goes through "
    "the floor-1e12 DECIMAL fold (rule 10) before summation, "
    "making the four sufficient statistics order-free; the slope "
    "solve is float on four identical scalars, ROUND(6). Scale: "
    "one map-combinable scan, four quantized-decimal partials — "
    "the A102 shape with the fold bolted on where exactness runs "
    "out.",
)
def q_agg_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0)
    )
    lp = F.log(F.col("l_extendedprice") / F.col("l_quantity"))
    lq = F.log("l_quantity")

    def fold12(expr):
        return F.sum(F.floor(expr * 1e12).cast("decimal(38,0)")).cast(
            "double"
        ) / 1e12

    folded = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        fold12(lp).alias("sp"),
        fold12(lq).alias("sq"),
        fold12(lp * lp).alias("spp"),
        fold12(lp * lq).alias("spq"),
    )
    n, sp, sq = F.col("n"), F.col("sp"), F.col("sq")
    spp, spq = F.col("spp"), F.col("spq")
    slope = (n * spq - sp * sq) / (n * spp - sp * sp)
    return folded.select(
        F.round(slope, 6).alias("elasticity"),
        F.round((sq - slope * sp) / n, 6).alias("log_intercept"),
        F.col("n").alias("n_obs"),
    )


@register(
    "q_agg_crps_empirical",
    oracle="""
        WITH fx AS (
            SELECT CAST(value AS DECIMAL(18,2)) AS v
            FROM events WHERE event_type = 'view'
        ),
        obs AS (
            SELECT CAST(value AS DECIMAL(18,2)) AS y
            FROM events WHERE event_type = 'purchase'
        ),
        xg AS (
            SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM fx GROUP BY v
        ),
        xc AS (
            SELECT v, c,
                   SUM(c) OVER (ORDER BY v) - c AS b,
                   SUM(v * c) OVER (ORDER BY v) - v * c AS sb,
                   (SELECT SUM(c) FROM xg) AS n,
                   (SELECT SUM(v * c) FROM xg) AS st
            FROM xg
        ),
        exx AS (
            SELECT 2.0 * CAST(SUM(v * c * (b - (n - b - c)))
                              AS DOUBLE)
                   / (CAST(MAX(n) AS DOUBLE) * MAX(n)) AS e_xx
            FROM xc
        ),
        merged AS (
            SELECT v AS val, c AS xc_, CAST(0 AS DECIMAL(18,2)) AS y,
                   0 AS is_obs FROM xg
            UNION ALL
            SELECT y AS val, 0 AS xc_, y, 1 AS is_obs FROM obs
        ),
        walked AS (
            SELECT val, y, is_obs,
                   SUM(xc_) OVER (ORDER BY val, is_obs) AS below_cnt,
                   SUM(val * xc_) OVER (ORDER BY val, is_obs)
                       AS below_sum,
                   (SELECT SUM(c) FROM xg) AS n,
                   (SELECT SUM(v * c) FROM xg) AS st
            FROM merged
        ),
        exy AS (
            SELECT CAST(SUM(below_cnt * y - below_sum
                            + (st - below_sum)
                            - (n - below_cnt) * y) AS DOUBLE)
                   / (MAX(n) * COUNT(*)) AS e_xy
            FROM walked WHERE is_obs = 1
        )
        SELECT ROUND(exy.e_xy, 6) AS mean_e_xy,
               ROUND(exx.e_xx, 6) AS e_xx,
               ROUND(exy.e_xy - 0.5 * exx.e_xx, 6) AS crps
        FROM exy CROSS JOIN exx
    """,
    section="A112",
    doc="CRPS of an empirical forecast ensemble ('view' event values "
    "as the predictive distribution) against held-out observations "
    "('purchase' values), by the kernel identity "
    "CRPS = E|X-y| - 0.5 E|X-X'| — the proper scoring rule for "
    "DISTRIBUTIONAL forecasts (A?-brier scores binary ones; "
    "pinball scores one quantile; CRPS integrates over all of "
    "them). Both expectations collapse to ORDER-STATISTIC closed "
    "forms on the value grain: E|X-X'| from each value's "
    "below/above counts (v*c*(b-(n-b-c)) summed — no pairwise "
    "join), and each E|X-y| from a merged sorted walk where the "
    "running count/sum of forecast mass below y give "
    "|X-y| = (2*below_cnt-n)*y - 2*below_sum + total in one "
    "expression. Every term is an exact DECIMAL/BIGINT product; "
    "doubles appear only in the final three divisions. With-"
    "replacement pair convention (n^2 denominator). Scale: "
    "value-grain windows (~thousands of rows), one sorted merge "
    "of grain+observations — the all-pairs kernel never "
    "materializes, the same collapse as A107's Walsh cells.",
)
def q_agg_crps_empirical(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import dec2

    ev = load_table(spark, sf_dir, "events")
    fx = ev.where(F.col("event_type") == "view").select(
        dec2(F.col("value")).alias("v")
    )
    obs = ev.where(F.col("event_type") == "purchase").select(
        dec2(F.col("value")).alias("y")
    )
    xg = fx.groupBy("v").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    tot = xg.agg(
        F.sum("c").alias("n"), F.sum(F.col("v") * F.col("c")).alias("st")
    )
    # Scale note (r6): both corpus-wide cumulative walks run on the
    # distributed two-pass prefix-sum operator (range shuffle + keyed
    # windows + broadcast partition offsets) — no single-partition window.
    from ai_to_cvent_etl_spark.operators.ranking import global_cumulative

    xc = (
        global_cumulative(
            xg,
            ["v"],
            {"cum_c": F.col("c"), "cum_vc": F.col("v") * F.col("c")},
        )
        .select(
            "v",
            "c",
            (F.col("cum_c") - F.col("c")).alias("b"),
            (F.col("cum_vc") - F.col("v") * F.col("c")).alias("sb"),
        )
        .crossJoin(F.broadcast(tot))
    )
    exx = xc.agg(
        (
            2.0
            * F.sum(
                F.col("v")
                * F.col("c")
                * (F.col("b") - (F.col("n") - F.col("b") - F.col("c")))
            ).cast("double")
            / (F.max("n").cast("double") * F.max("n"))
        ).alias("e_xx")
    )
    zero = F.lit(0).cast("decimal(18,2)")
    merged = xg.select(
        F.col("v").alias("val"),
        F.col("c").alias("xc_"),
        zero.alias("y"),
        F.lit(0).alias("is_obs"),
    ).unionAll(
        obs.select(
            F.col("y").alias("val"),
            F.lit(0).cast("bigint").alias("xc_"),
            F.col("y"),
            F.lit(1).alias("is_obs"),
        )
    )
    # (val, is_obs) is not a total order — duplicate observations tie —
    # but tied rows all carry xc_ = 0, so every tie order yields the same
    # prefix sums (and matches the original RANGE-frame window exactly).
    walked = global_cumulative(
        merged,
        ["val", "is_obs"],
        {
            "below_cnt": F.col("xc_"),
            "below_sum": F.col("val") * F.col("xc_"),
        },
    ).crossJoin(F.broadcast(tot))
    exy = walked.where(F.col("is_obs") == 1).agg(
        (
            F.sum(
                F.col("below_cnt") * F.col("y")
                - F.col("below_sum")
                + (F.col("st") - F.col("below_sum"))
                - (F.col("n") - F.col("below_cnt")) * F.col("y")
            ).cast("double")
            / (F.max("n") * F.count(F.lit(1)))
        ).alias("e_xy")
    )
    return exy.crossJoin(F.broadcast(exx)).select(
        F.round("e_xy", 6).alias("mean_e_xy"),
        F.round("e_xx", 6).alias("e_xx"),
        F.round(F.col("e_xy") - 0.5 * F.col("e_xx"), 6).alias("crps"),
    )


_PINBALL_TAUS = ("0.1", "0.5", "0.9")


@register(
    "q_agg_pinball_loss",
    oracle=f"""
        WITH fx AS (
            SELECT CAST(value AS DECIMAL(18,2)) AS v
            FROM events WHERE event_type = 'view'
        ),
        obs AS (
            SELECT CAST(value AS DECIMAL(18,2)) AS y
            FROM events WHERE event_type = 'purchase'
        ),
        taus (tau) AS (VALUES {", ".join(f"({t})" for t in _PINBALL_TAUS)}),
        qs AS (
            SELECT t.tau,
                   (SELECT MIN(r.v) FROM (
                       SELECT v,
                              CAST(SUM(1) OVER (ORDER BY v) AS BIGINT)
                                  AS cc,
                              (SELECT COUNT(*) FROM fx) AS n
                       FROM fx
                   ) r WHERE r.cc >= t.tau * r.n) AS q
            FROM taus t
        ),
        losses AS (
            SELECT qs.tau, qs.q,
                   SUM(CASE WHEN o.y >= qs.q
                            THEN CAST(qs.tau AS DECIMAL(8,4))
                                 * (o.y - qs.q)
                            ELSE CAST(1 - qs.tau AS DECIMAL(8,4))
                                 * (qs.q - o.y) END) AS tot,
                   CAST(COUNT(*) AS BIGINT) AS n_obs
            FROM obs o CROSS JOIN qs
            GROUP BY qs.tau, qs.q
        )
        SELECT CAST(tau AS DOUBLE) AS tau,
               CAST(q AS DOUBLE) AS forecast_q,
               ROUND(CAST(tot AS DOUBLE) / n_obs, 6) AS pinball
        FROM losses
    """,
    section="A113",
    doc="Pinball (quantile) loss of the empirical q10/q50/q90 of the "
    "'view' value distribution used as quantile forecasts for "
    "held-out 'purchase' values — the proper scoring rule for "
    "QUANTILE forecasts (what quantile-regression models and "
    "prediction-interval systems are graded on; A112's CRPS is "
    "its integral over tau). Forecast quantiles are inverted-CDF "
    "order statistics on the exact decimal grain (MIN v with "
    "cumcount >= tau*n — no interpolation, engine-identical); "
    "each loss term is an exact DECIMAL product (tau at 4dp times "
    "a 2dp difference), summed exactly, ONE division per tau at "
    "render. Scale: the quantile lookup is a value-grain "
    "cumulative; the loss pass is one map-combinable conditional "
    "aggregate per tau over a broadcast 3-row quantile table.",
)
def q_agg_pinball_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import dec2

    ev = load_table(spark, sf_dir, "events")
    fx = ev.where(F.col("event_type") == "view").select(
        dec2(F.col("value")).alias("v")
    )
    obs = ev.where(F.col("event_type") == "purchase").select(
        dec2(F.col("value")).alias("y")
    )
    nfx = fx.agg(F.count(F.lit(1)).cast("bigint").alias("nfx"))
    # Scale note (r6): the RANGE-frame cumulative count #{v' <= v} is the
    # same per distinct value, so collapse to value counts first and run
    # the distributed prefix-sum operator over distinct values — the
    # single-partition window (and the per-row walk) disappear, and the
    # min-over-threshold quantile selection is unchanged.
    from ai_to_cvent_etl_spark.operators.ranking import global_cumulative

    vg = fx.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    cum = global_cumulative(vg, ["v"], {"cc": F.col("c")}).select(
        "v", F.col("cc").cast("bigint").alias("cc")
    )
    taus = spark.createDataFrame(
        [(float(t),) for t in _PINBALL_TAUS], "tau double"
    )
    qs = (
        taus.crossJoin(cum)
        .crossJoin(F.broadcast(nfx))
        .where(F.col("cc") >= F.col("tau") * F.col("nfx"))
        .groupBy("tau")
        .agg(F.min("v").alias("q"))
    )
    tau_d = F.col("tau").cast("decimal(8,4)")
    loss = F.when(
        F.col("y") >= F.col("q"), tau_d * (F.col("y") - F.col("q"))
    ).otherwise(
        (F.lit(1).cast("decimal(8,4)") - tau_d)
        * (F.col("q") - F.col("y"))
    )
    losses = (
        obs.crossJoin(F.broadcast(qs))
        .groupBy("tau", "q")
        .agg(
            F.sum(loss).alias("tot"),
            F.count(F.lit(1)).cast("bigint").alias("n_obs"),
        )
    )
    return losses.select(
        F.col("tau").cast("double").alias("tau"),
        F.col("q").cast("double").alias("forecast_q"),
        F.round(
            F.col("tot").cast("double") / F.col("n_obs"), 6
        ).alias("pinball"),
    )


@register(
    "q_agg_chain_ladder",
    oracle=f"""
        WITH cells AS (
            SELECT year(o.o_orderdate) AS origin,
                   year(l.l_shipdate) - year(o.o_orderdate) AS dev,
                   SUM({ORACLE_DISC_PRICE}) AS x
            FROM orders o JOIN lineitem l
              ON o.o_orderkey = l.l_orderkey
            WHERE year(l.l_shipdate) >= year(o.o_orderdate)
            GROUP BY 1, 2
        ),
        cum AS (
            SELECT origin, dev,
                   SUM(x) OVER (PARTITION BY origin ORDER BY dev) AS c
            FROM cells
        ),
        mx AS (SELECT MAX(origin + dev) AS maxcal FROM cum),
        pairs AS (
            SELECT a.dev,
                   SUM(a.c) AS c_d,
                   SUM(b.c) AS c_d1,
                   CAST(COUNT(*) AS BIGINT) AS n_origins
            FROM cum a
            JOIN cum b ON a.origin = b.origin AND b.dev = a.dev + 1
            CROSS JOIN mx
            WHERE a.origin + a.dev + 1 <= mx.maxcal
            GROUP BY a.dev
        )
        SELECT CAST(dev AS BIGINT) AS dev, n_origins,
               CAST(c_d AS DOUBLE) AS cum_at_dev,
               ROUND(CAST(c_d1 AS DOUBLE) / CAST(c_d AS DOUBLE), 6)
                   AS dev_factor
        FROM pairs
    """,
    section="A114",
    doc="Chain-ladder development factors over the order-to-ship run-"
    "off triangle: origin year x development lag cells of exact-"
    "decimal revenue, cumulated within origin, and the volume-"
    "weighted link ratio f_d = sum(C_{o,d+1})/sum(C_{o,d}) over "
    "origins whose d+1 diagonal is observable — the actuarial "
    "reserving primitive (Mack's chain ladder) whose product of "
    "factors projects every open origin to ultimate; the same "
    "triangle arithmetic prices any cohort run-off (claims, "
    "refunds, LTV maturation). Determinism: cells and cumulatives "
    "are exact DECIMAL sums; the observability cut (origin + dev "
    "+ 1 <= latest calendar) is integer; one double division per "
    "dev lag. Scale: the fact collapses to the ~7x7 triangle "
    "grain in one map-combinable pass; everything after is "
    "driver-sized.",
)
def q_agg_chain_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("origin")
    )
    li = load_table(spark, sf_dir, "lineitem")
    cells = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(F.year("l_shipdate") >= F.col("origin"))
        .groupBy(
            "origin",
            (F.year("l_shipdate") - F.col("origin")).alias("dev"),
        )
        .agg(F.sum(disc_price()).alias("x"))
    )
    w = Window.partitionBy("origin").orderBy("dev")
    cum = cells.select(
        "origin", "dev", F.sum("x").over(w).alias("c")
    )
    mx = cum.agg(F.max(F.col("origin") + F.col("dev")).alias("maxcal"))
    a = cum.select("origin", "dev", F.col("c").alias("ca"))
    b = cum.select(
        F.col("origin").alias("ob"),
        F.col("dev").alias("db"),
        F.col("c").alias("cb"),
    )
    pairs = (
        a.join(
            b,
            (F.col("origin") == F.col("ob"))
            & (F.col("db") == F.col("dev") + 1),
        )
        .crossJoin(F.broadcast(mx))
        .where(F.col("origin") + F.col("dev") + 1 <= F.col("maxcal"))
        .groupBy("dev")
        .agg(
            F.sum("ca").alias("c_d"),
            F.sum("cb").alias("c_d1"),
            F.count(F.lit(1)).cast("bigint").alias("n_origins"),
        )
    )
    return pairs.select(
        F.col("dev").cast("bigint").alias("dev"),
        "n_origins",
        F.col("c_d").cast("double").alias("cum_at_dev"),
        F.round(
            F.col("c_d1").cast("double") / F.col("c_d").cast("double"),
            6,
        ).alias("dev_factor"),
    )


_TRIM_FRAC_NUM, _TRIM_FRAC_DEN = 1, 10  # 10% per tail


@register(
    "q_agg_trimmed_mean",
    oracle=f"""
        WITH vg AS (
            SELECT CAST(l_extendedprice AS DECIMAL(18,2)) AS v,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM lineitem GROUP BY 1
        ),
        tot AS (
            SELECT CAST(SUM(c) AS BIGINT) AS n,
                   CAST(SUM(c) * {_TRIM_FRAC_NUM}
                        / {_TRIM_FRAC_DEN} AS BIGINT) AS k
            FROM vg
        ),
        cum AS (
            SELECT v, c,
                   SUM(c) OVER (ORDER BY v) - c AS b,
                   t.n, t.k
            FROM vg CROSS JOIN tot t
        ),
        interior AS (
            SELECT v,
                   GREATEST(CAST(0 AS BIGINT),
                       LEAST(b + c, n - k) - GREATEST(b, k)) AS keep,
                   n, k
            FROM cum
        )
        SELECT CAST(MAX(n) AS BIGINT) AS n_rows,
               CAST(MAX(k) AS BIGINT) AS k_trimmed_per_tail,
               ROUND(CAST(SUM(v * keep) AS DOUBLE)
                     / (MAX(n) - 2 * MAX(k)), 6) AS trimmed_mean
        FROM interior
    """,
    section="A115",
    doc=f"{100 * _TRIM_FRAC_NUM // _TRIM_FRAC_DEN}%-per-tail trimmed "
    "mean of l_extendedprice — the robust location estimate that "
    "DROPS the tails where A?-winsorized CLAMPS them (different "
    "influence functions: trimming zeroes outlier influence, "
    "winsorizing caps it). Row-rank semantics with duplicate "
    "values are handled on the VALUE grain: each value keeps "
    "max(0, min(b+c, n-k) - max(b, k)) of its c copies — the "
    "overlap of its rank interval [b, b+c) with the kept band "
    "[k, n-k) — so the result equals sorting all rows and "
    "dropping exactly k per side, without sorting the fact. "
    "Integer floor k = n/10 matches on both engines (BIGINT "
    "arithmetic); the kept mass is an exact DECIMAL sum, one "
    "division at render. Scale: value-grain cumulative (distinct "
    "prices), map-combinable collapse first — the A107 shape.",
)
def q_agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import dec2

    li = load_table(spark, sf_dir, "lineitem")
    vg = li.groupBy(dec2(F.col("l_extendedprice")).alias("v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    tot = vg.agg(
        F.sum("c").cast("bigint").alias("n"),
        (F.sum("c") * _TRIM_FRAC_NUM / _TRIM_FRAC_DEN)
        .cast("bigint")
        .alias("k"),
    )
    w = Window.orderBy("v")
    cum = vg.crossJoin(F.broadcast(tot)).select(
        "v",
        "c",
        (F.sum("c").over(w) - F.col("c")).alias("b"),
        "n",
        "k",
    )
    keep = F.greatest(
        F.lit(0).cast("bigint"),
        F.least(F.col("b") + F.col("c"), F.col("n") - F.col("k"))
        - F.greatest(F.col("b"), F.col("k")),
    )
    return cum.select("v", keep.alias("keep"), "n", "k").agg(
        F.max("n").cast("bigint").alias("n_rows"),
        F.max("k").cast("bigint").alias("k_trimmed_per_tail"),
        F.round(
            F.sum(F.col("v") * F.col("keep")).cast("double")
            / (F.max("n") - 2 * F.max("k")),
            6,
        ).alias("trimmed_mean"),
    )


# ==== wave 133: ordered-alternative trend test =====================

_JT_GROUPS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def _jt_oracle() -> str:
    gs = _JT_GROUPS
    c_cols = ",\n                   ".join(
        f"CAST(COALESCE(SUM(CASE WHEN grp = '{g}' THEN c END), 0) "
        f"AS BIGINT) AS c{i}"
        for i, g in enumerate(gs)
    )
    cum_cols = ",\n                   ".join(
        f"SUM(c{i}) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING "
        f"AND CURRENT ROW) - c{i} AS less{i}"
        for i in range(len(gs))
    )
    contrib = " + ".join(
        f"c{j} * (2 * less{i} + c{i})"
        for j in range(len(gs))
        for i in range(j)
    )
    n_terms = " + ".join(f"n{i}" for i in range(len(gs)))
    nsq_terms = " + ".join(f"n{i} * n{i}" for i in range(len(gs)))
    nvar_terms = " + ".join(
        f"n{i} * n{i} * (2 * n{i} + 3)" for i in range(len(gs))
    )
    n_defs = ",\n                   ".join(
        f"CAST(SUM(c{i}) AS BIGINT) AS n{i}" for i in range(len(gs))
    )
    return f"""
        WITH vc AS (
            SELECT o_orderpriority AS grp,
                   CAST(o_totalprice AS DECIMAL(18,2)) AS v,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM orders GROUP BY 1, 2
        ),
        val AS (
            SELECT v,
                   {c_cols}
            FROM vc GROUP BY v
        ),
        cum AS (
            SELECT *,
                   {cum_cols}
            FROM val
        ),
        tot AS (
            SELECT CAST(SUM({contrib}) AS BIGINT) AS j2,
                   {n_defs}
            FROM cum
        )
        SELECT CAST(j2 AS DOUBLE) / 2 AS jt_stat,
               CAST({n_terms} AS BIGINT) AS n_total,
               (CAST(({n_terms}) AS DOUBLE) * CAST(({n_terms}) AS DOUBLE)
                - CAST(({nsq_terms}) AS DOUBLE)) / 4 AS expected_jt,
               ROUND((CAST(j2 AS DOUBLE) / 2
                      - (CAST(({n_terms}) AS DOUBLE)
                         * CAST(({n_terms}) AS DOUBLE)
                         - CAST(({nsq_terms}) AS DOUBLE)) / 4)
                     / sqrt((CAST(({n_terms}) AS DOUBLE)
                             * CAST(({n_terms}) AS DOUBLE)
                             * (2 * CAST(({n_terms}) AS DOUBLE) + 3)
                             - CAST(({nvar_terms}) AS DOUBLE)) / 72),
                     6) AS z_score
        FROM tot
    """


@register(
    "q_agg_jonckheere",
    oracle=_jt_oracle(),
    section="A116",
    doc="Jonckheere-Terpstra ordered-alternative trend test: does "
    "o_totalprice trend monotonically across the FIVE ORDERED priority "
    "classes (1-URGENT < ... < 5-LOW)? The statistic J = sum over "
    "group pairs i<j of Mann-Whitney U counts — the test A59 "
    "(Kruskal-Wallis) cannot replace because KW ignores group order. "
    "The naive form is all-pairs O(n^2); this runs it at the VALUE "
    "GRAIN: per-(group, exact-decimal-price) counts, one ordered "
    "window giving each group's strictly-less cumulative, then "
    "2J = sum_j c_j * (2*less_i + c_i) pairwise over the 5 group "
    "columns — ties get the standard half credit via the doubled "
    "statistic, which keeps EVERYTHING int64-exact until the final "
    "pinned double z-score (no-ties normal approximation). Scale: one "
    "count at the distinct-price grain, one global ordered window "
    "over it (value-grain spine, not the fact), one scalar rollup.",
)
def q_agg_jonckheere(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import dec2

    gs = _JT_GROUPS
    orders = load_table(spark, sf_dir, "orders")
    vc = (
        orders.groupBy(
            F.col("o_orderpriority").alias("grp"),
            dec2(F.col("o_totalprice")).alias("v"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    val = vc.groupBy("v").agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("grp") == g, F.col("c"))), F.lit(0)
            )
            .cast("bigint")
            .alias(f"c{i}")
            for i, g in enumerate(gs)
        ]
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = val.select(
        "*",
        *[
            (F.sum(f"c{i}").over(w) - F.col(f"c{i}")).alias(f"less{i}")
            for i in range(len(gs))
        ],
    )
    contrib = None
    for j in range(len(gs)):
        for i in range(j):
            term = F.col(f"c{j}") * (
                2 * F.col(f"less{i}") + F.col(f"c{i}")
            )
            contrib = term if contrib is None else contrib + term
    tot = cum.agg(
        F.sum(contrib).cast("bigint").alias("j2"),
        *[
            F.sum(f"c{i}").cast("bigint").alias(f"n{i}")
            for i in range(len(gs))
        ],
    )
    n_total = None
    nsq = None
    nvar = None
    for i in range(len(gs)):
        ni = F.col(f"n{i}")
        n_total = ni if n_total is None else n_total + ni
        nsq = ni * ni if nsq is None else nsq + ni * ni
        nv = ni * ni * (2 * ni + 3)
        nvar = nv if nvar is None else nvar + nv
    nd = n_total.cast("double")
    nsqd = nsq.cast("double")
    nvard = nvar.cast("double")
    jt = F.col("j2").cast("double") / 2
    expected = (nd * nd - nsqd) / 4
    z = (jt - expected) / F.sqrt((nd * nd * (2 * nd + 3) - nvard) / 72)
    return tot.select(
        jt.alias("jt_stat"),
        n_total.cast("bigint").alias("n_total"),
        expected.alias("expected_jt"),
        F.round(z, 6).alias("z_score"),
    )


# ==== wave 135: ordered repeated measures, multi-rater agreement ===


@register(
    "q_agg_page_trend",
    oracle="""
        WITH cells AS (
            SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
                   CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS j,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS v
            FROM orders GROUP BY 1, 2
        ),
        complete AS (
            SELECT y FROM cells GROUP BY y HAVING COUNT(*) = 5
        ),
        ranked AS (
            SELECT c.y, c.j,
                   2 * RANK() OVER (PARTITION BY c.y ORDER BY c.v)
                   + COUNT(*) OVER (PARTITION BY c.y, c.v) - 1 AS r2
            FROM cells c JOIN complete USING (y)
        ),
        tot AS (
            SELECT CAST(SUM(j * r2) AS BIGINT) AS l2,
                   CAST(COUNT(*) / 5 AS BIGINT) AS b
            FROM ranked
        )
        SELECT CAST(l2 AS DOUBLE) / 2 AS l_stat,
               b AS n_blocks,
               CAST(b * 5 * 36 AS DOUBLE) / 4 AS expected_l,
               ROUND((CAST(l2 AS DOUBLE) / 2
                      - CAST(b * 5 * 36 AS DOUBLE) / 4)
                     / sqrt(CAST(25 * b AS DOUBLE)), 6) AS z_score
        FROM tot
    """,
    section="A117",
    doc="Page's L trend test for ordered alternatives under blocking: "
    "does yearly revenue trend monotonically across the five ORDERED "
    "priority classes WITHIN each order-year block? The blocked sibling "
    "of A116 (Jonckheere, unblocked) and the ordered sibling of A61 "
    "(Friedman, unordered): L = sum over blocks of sum_j j*r_j with "
    "treatments ranked inside each block. Only complete blocks (all 5 "
    "classes present) enter, so the closed-form moments hold. "
    "Determinism: cell values are exact decimal sums; average-rank tie "
    "handling uses the DOUBLED rank 2r = 2*RANK() + tie_count - 1 "
    "(int64), so L2 = sum j*2r is all-integer; for k = 5 the variance "
    "collapses to 25b exactly, leaving one pinned double z expression. "
    "Scale: one (year, priority) agg (35 cells), window over cells.",
)
def q_agg_page_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import dec2

    orders = load_table(spark, sf_dir, "orders")
    cells = orders.groupBy(
        F.year("o_orderdate").cast("bigint").alias("y"),
        F.substring("o_orderpriority", 1, 1).cast("bigint").alias("j"),
    ).agg(F.sum(dec2(F.col("o_totalprice"))).alias("v"))
    complete = (
        cells.groupBy("y")
        .agg(F.count(F.lit(1)).alias("nc"))
        .where(F.col("nc") == 5)
        .select("y")
    )
    wr = Window.partitionBy("y").orderBy("v")
    wt = Window.partitionBy("y", "v")
    ranked = cells.join(F.broadcast(complete), "y").select(
        "j",
        (
            2 * F.rank().over(wr) + F.count(F.lit(1)).over(wt) - 1
        ).alias("r2"),
    )
    tot = ranked.agg(
        F.sum(F.col("j") * F.col("r2")).cast("bigint").alias("l2"),
        (F.count(F.lit(1)) / 5).cast("bigint").alias("b"),
    )
    l_stat = F.col("l2").cast("double") / 2
    expected = (F.col("b") * 5 * 36).cast("double") / 4
    z = (l_stat - expected) / F.sqrt((25 * F.col("b")).cast("double"))
    return tot.select(
        l_stat.alias("l_stat"),
        F.col("b").alias("n_blocks"),
        expected.alias("expected_l"),
        F.round(z, 6).alias("z_score"),
    )


_FLEISS_N = 4


@register(
    "q_agg_fleiss_kappa",
    oracle=f"""
        WITH eligible AS (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey HAVING COUNT(*) = {_FLEISS_N}
        ),
        nij AS (
            SELECT l.l_orderkey, l.l_returnflag,
                   CAST(COUNT(*) AS BIGINT) AS nij
            FROM lineitem l JOIN eligible e USING (l_orderkey)
            GROUP BY 1, 2
        ),
        s AS (
            SELECT CAST(SUM(nij * (nij - 1)) AS BIGINT) AS a,
                   CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_items
            FROM nij
        ),
        cat AS (
            SELECT CAST(SUM(tj * tj) AS BIGINT) AS b FROM (
                SELECT l_returnflag, CAST(SUM(nij) AS BIGINT) AS tj
                FROM nij GROUP BY 1
            )
        )
        SELECT n_items,
               CAST({_FLEISS_N} AS BIGINT) AS n_raters,
               ROUND(CAST(a AS DOUBLE)
                     / CAST(12 * n_items AS DOUBLE), 6) AS p_bar,
               ROUND(CAST(b AS DOUBLE)
                     / CAST(16 * n_items * n_items AS DOUBLE), 6) AS p_e,
               ROUND(CAST(4 * n_items * a - 3 * b AS DOUBLE)
                     / CAST(48 * n_items * n_items - 3 * b AS DOUBLE),
                     6) AS kappa
        FROM s, cat
    """,
    section="A118",
    doc=f"Fleiss' kappa over orders with exactly {_FLEISS_N} line items: "
    f"treat each order as an item rated by its {_FLEISS_N} lines and "
    "l_returnflag as the category — do lines of the same order agree "
    "on return status beyond chance? The MULTI-rater generalization of "
    "A14's Cohen kappa (two raters), and the fixed-panel complement of "
    "A35's ICC (continuous). Everything is counting: agreement mass "
    "A = sum n_ij(n_ij-1), category mass B = sum t_j^2, and kappa "
    "reduces to the EXACT integer ratio (4NA - 3B)/(48N^2 - 3B) after "
    "clearing denominators (n = 4 raters pins n(n-1) = 12, (Nn)^2 = "
    "16N^2) — one double division, no intermediate float. Scale: two "
    "keyed aggs on l_orderkey (the fact grain) + a 3-row category "
    "rollup; the eligibility semi-join broadcasts.",
)
def q_agg_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    eligible = (
        li.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("nl"))
        .where(F.col("nl") == _FLEISS_N)
        .select("l_orderkey")
    )
    nij = (
        li.join(eligible, "l_orderkey")
        .groupBy("l_orderkey", "l_returnflag")
        .agg(F.count(F.lit(1)).cast("bigint").alias("nij"))
    )
    s = nij.agg(
        F.sum(F.col("nij") * (F.col("nij") - 1)).cast("bigint").alias("a"),
        F.countDistinct("l_orderkey").cast("bigint").alias("n_items"),
    )
    cat = (
        nij.groupBy("l_returnflag")
        .agg(F.sum("nij").cast("bigint").alias("tj"))
        .agg(F.sum(F.col("tj") * F.col("tj")).cast("bigint").alias("b"))
    )
    out = s.crossJoin(cat)
    n = F.col("n_items")
    return out.select(
        "n_items",
        F.lit(_FLEISS_N).cast("bigint").alias("n_raters"),
        F.round(
            F.col("a").cast("double") / (12 * n).cast("double"), 6
        ).alias("p_bar"),
        F.round(
            F.col("b").cast("double") / (16 * n * n).cast("double"), 6
        ).alias("p_e"),
        F.round(
            (4 * n * F.col("a") - 3 * F.col("b")).cast("double")
            / (48 * n * n - 3 * F.col("b")).cast("double"),
            6,
        ).alias("kappa"),
    )


# ==== wave 136a: average precision (PR-AUC companion to A58) =======


@register(
    "q_agg_average_precision",
    oracle="""
        WITH s AS (
            SELECT CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
                       AS cents,
                   CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1
                                 ELSE 0 END) AS BIGINT) AS np,
                   CAST(COUNT(*) AS BIGINT) AS nt
            FROM events
            GROUP BY 1
        ),
        c AS (
            SELECT np,
                   SUM(np) OVER (ORDER BY cents DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS tp,
                   SUM(nt) OVER (ORDER BY cents DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS k
            FROM s
        ),
        t AS (
            SELECT CAST(SUM(CASE WHEN np > 0 THEN CAST(floor(
                       CAST(np * tp AS DOUBLE)
                       / CAST((SELECT SUM(np) FROM s) * k AS DOUBLE)
                       * 1e12) AS BIGINT) ELSE 0 END) AS BIGINT) AS ap_q12,
                   CAST((SELECT SUM(np) FROM s) AS BIGINT) AS p,
                   CAST((SELECT SUM(nt) - SUM(np) FROM s) AS BIGINT) AS n,
                   CAST((SELECT COUNT(*) FROM s) AS BIGINT) AS n_scores
            FROM c
        )
        SELECT p AS n_pos, n AS n_neg, n_scores,
               ROUND(CAST(ap_q12 AS DOUBLE) / 1e12, 6) AS avg_precision
        FROM t
    """,
    section="A119",
    doc="Average precision (the PR-AUC summary) of the value score "
    "against the purchase label — A58's AUC-ROC companion that stays "
    "informative under CLASS IMBALANCE, where ROC saturates. Computed "
    "at the distinct-score grain with NO global row sort: descending "
    "cumulative (tp, k), each score block contributing "
    "Δtp/P · precision-at-block-end — the tie-safe step convention "
    "(a tied block is atomic, so the metric cannot depend on "
    "within-tie order). Each block term is ONE pinned double division "
    "(int64 numerator np·tp, int64 denominator P·k) quantized "
    "floor(x·1e12) -> BIGINT, so the cross-block sum is integer-exact. "
    "Scale: one agg to the score grain, one ordered window over "
    "distinct scores, one rollup — same shape as A58.",
)
def q_agg_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import dec2

    ev = load_table(spark, sf_dir, "events")
    s = ev.groupBy(
        (dec2(F.col("value")) * 100).cast("bigint").alias("cents")
    ).agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        )
        .cast("bigint")
        .alias("np"),
        F.count(F.lit(1)).cast("bigint").alias("nt"),
    )
    w = Window.orderBy(F.col("cents").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    c = s.select(
        "np",
        F.sum("np").over(w).alias("tp"),
        F.sum("nt").over(w).alias("k"),
    )
    tot = s.agg(
        F.sum("np").cast("bigint").alias("p"),
        (F.sum("nt") - F.sum("np")).cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_scores"),
    )
    term = F.floor(
        (F.col("np") * F.col("tp")).cast("double")
        / (F.col("p") * F.col("k")).cast("double")
        * F.lit(1e12)
    ).cast("bigint")
    ap = (
        c.crossJoin(F.broadcast(tot))
        .select(
            F.when(F.col("np") > 0, term).otherwise(0).alias("t_q12"),
            "p",
            "n",
            "n_scores",
        )
        .groupBy("p", "n", "n_scores")
        .agg(F.sum("t_q12").cast("bigint").alias("ap_q12"))
    )
    return ap.select(
        F.col("p").alias("n_pos"),
        F.col("n").alias("n_neg"),
        "n_scores",
        F.round(F.col("ap_q12").cast("double") / F.lit(1e12), 6).alias(
            "avg_precision"
        ),
    )


# ==== wave 138: extreme-value return levels, bootstrap median ======

# Python-precomputed double literals (identical text in both engines):
# Euler-Mascheroni, sqrt(6)/pi, and the Gumbel reduced variates
# -ln(-ln(1-1/T)) for T = 10, 100.
_GUM_GAMMA = 0.5772156649015329
_GUM_SQRT6_PI = 0.779696801233676
_GUM_C10 = 2.2503673273124454
_GUM_C100 = 4.600149226776579


@register(
    "q_agg_gumbel_return",
    oracle=f"""
        WITH blocks AS (
            SELECT CAST(ts AS DATE) AS d,
                   MAX(CAST(value AS DECIMAL(18,2))) AS mx
            FROM events GROUP BY 1
        ),
        s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(mx) * 100 AS BIGINT) AS s1c,
                   CAST(SUM(mx * mx) * 10000 AS BIGINT) AS s2c
            FROM blocks
        ),
        fit AS (
            SELECT n,
                   CAST(s1c AS DOUBLE) / 100 / n AS mean_mx,
                   sqrt((CAST(n AS DOUBLE) * (CAST(s2c AS DOUBLE) / 10000)
                         - (CAST(s1c AS DOUBLE) / 100)
                           * (CAST(s1c AS DOUBLE) / 100))
                        / (CAST(n AS DOUBLE) * (n - 1))) AS sd_mx
            FROM s
        )
        SELECT n AS n_blocks,
               ROUND(mean_mx - {_GUM_GAMMA} * (sd_mx * {_GUM_SQRT6_PI}),
                     4) AS mu,
               ROUND(sd_mx * {_GUM_SQRT6_PI}, 4) AS beta,
               ROUND(mean_mx - {_GUM_GAMMA} * (sd_mx * {_GUM_SQRT6_PI})
                     + (sd_mx * {_GUM_SQRT6_PI}) * {_GUM_C10}, 4)
                   AS return_level_10,
               ROUND(mean_mx - {_GUM_GAMMA} * (sd_mx * {_GUM_SQRT6_PI})
                     + (sd_mx * {_GUM_SQRT6_PI}) * {_GUM_C100}, 4)
                   AS return_level_100
        FROM fit
    """,
    section="A120",
    doc="Gumbel extreme-value fit with return levels — the capacity-"
    "planning question ('what peak event value do we see once per 10 "
    "/ 100 days?') answered from daily block maxima via method-of-"
    "moments: beta = s*sqrt(6)/pi, mu = mean - gamma*beta, and "
    "x_T = mu + beta*(-ln(-ln(1-1/T))). Every transcendental constant "
    "(Euler-Mascheroni, sqrt(6)/pi, the two reduced variates) is "
    "computed ONCE in Python and embedded as an identical double "
    "literal in both engines, so neither engine ever calls ln(): the "
    "fit itself is exact decimal block maxima -> integer cent moments "
    "-> pinned double mean/sd (IEEE sqrt correctly rounded). The EVT "
    "complement of A64's Hill tail index (Hill estimates the tail "
    "EXPONENT from upper order statistics; this fits the max-domain "
    "location/scale and extrapolates). Scale: one day-grain max "
    "collapse and a scalar fit — all map-combinable.",
)
def q_agg_gumbel_return(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import dec2

    ev = load_table(spark, sf_dir, "events")
    blocks = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.max(dec2(F.col("value"))).alias("mx")
    )
    s = blocks.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (F.sum("mx") * 100).cast("bigint").alias("s1c"),
        (F.sum(F.col("mx") * F.col("mx")) * 10000)
        .cast("bigint")
        .alias("s2c"),
    )
    n = F.col("n")
    nd = n.cast("double")
    mean_mx = F.col("s1c").cast("double") / 100 / n
    sd_mx = F.sqrt(
        (
            nd * (F.col("s2c").cast("double") / 10000)
            - (F.col("s1c").cast("double") / 100)
            * (F.col("s1c").cast("double") / 100)
        )
        / (nd * (n - 1))
    )
    beta = sd_mx * F.lit(_GUM_SQRT6_PI)
    mu = mean_mx - F.lit(_GUM_GAMMA) * beta
    return s.select(
        n.alias("n_blocks"),
        F.round(mu, 4).alias("mu"),
        F.round(beta, 4).alias("beta"),
        F.round(mu + beta * F.lit(_GUM_C10), 4).alias("return_level_10"),
        F.round(mu + beta * F.lit(_GUM_C100), 4).alias("return_level_100"),
    )


@register(
    "q_agg_bootstrap_median",
    oracle=f"""
        WITH reps AS (SELECT CAST(r.range AS BIGINT) AS b
                      FROM range({_BOOT_B}) r),
        seeds AS (
            SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS cents,
                   CAST(('0x' || substr(h, 1, 12)) AS BIGINT) % {_POIS1_P}
                       AS sa,
                   CAST(('0x' || substr(h, 13, 12)) AS BIGINT) % {_POIS1_P}
                       AS sc
            FROM (SELECT l_extendedprice,
                         md5(CAST(l_orderkey AS VARCHAR) || '-'
                             || CAST(l_linenumber AS VARCHAR)) AS h
                  FROM lineitem)
        ),
        grain AS (
            SELECT b, cents,
                   CAST(SUM({_boot_w("((sa + b * sc) % " + str(_POIS1_P) + ")")})
                        AS BIGINT) AS w
            FROM seeds CROSS JOIN reps
            GROUP BY b, cents
        ),
        cum AS (
            SELECT b, cents, w,
                   SUM(w) OVER (PARTITION BY b ORDER BY cents
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cw,
                   SUM(w) OVER (PARTITION BY b) AS tw
            FROM grain
        ),
        med AS (
            SELECT b, MIN(cents) AS med_cents
            FROM cum WHERE 2 * cw >= tw GROUP BY b
        ),
        ranked AS (
            SELECT med_cents,
                   ROW_NUMBER() OVER (ORDER BY med_cents, b) AS rk
            FROM med
        ),
        pt AS (
            SELECT MIN(cents) AS pm FROM (
                SELECT cents,
                       SUM(n) OVER (ORDER BY cents
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cn,
                       SUM(n) OVER () AS tn
                FROM (SELECT cents, CAST(COUNT(*) AS BIGINT) AS n
                      FROM seeds GROUP BY cents)
            ) WHERE 2 * cn >= tn
        )
        SELECT CAST({_BOOT_B} AS BIGINT) AS n_boot,
               (SELECT pm FROM pt) AS point_median_cents,
               MAX(CASE WHEN rk = 2 THEN med_cents END) AS ci_lo_cents,
               MAX(CASE WHEN rk = {_BOOT_B - 1} THEN med_cents END)
                   AS ci_hi_cents
        FROM ranked
    """,
    section="A121",
    doc="Poisson-bootstrap confidence interval for the MEDIAN line "
    "price — the quantile counterpart of A56 (whose CLT-free CI only "
    "covers the mean; a median has no closed-form standard error, "
    "which is exactly when the bootstrap earns its keep). Same "
    "deterministic replica machinery as A56 (one md5 per row, affine "
    "(a + b*c) mod 2^48-59 per replica, integer Poisson(1) CDF "
    "thresholds), but the statistic needs a different distributed "
    "shape: weights collapse to the (replica, distinct-cents) GRAIN, "
    "one cumulative-weight window per replica, and the weighted lower "
    "median is the smallest value with 2*cumw >= total — all-integer "
    "compares, no division anywhere. CI = 2nd/31st order statistics "
    "of the 32 replica medians (~93.75% coverage, documented); the "
    "point estimate is the exact lower median of the raw data. "
    "Scale: B*|distinct prices| rows after the grain collapse "
    "(map-combinable), 32 small partition-local windows — the fact "
    "never sorts globally.",
)
def q_agg_bootstrap_median(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    ).localCheckpoint(eager=False)
    w_expr = _boot_w(f"((sa + b * sc) % {_POIS1_P})")
    # Two-phase distributed exact weighted median (the value grain is
    # ~row grain for prices, so a single value-grain pass would sort
    # B*n rows; measured 19.5 s at sf0.1 — the histogram pass + a
    # straddling-bucket refine runs the same statistic in ~3 s):
    # phase 1 — per-replica weight mass per coarse bucket (cents DIV
    # 1e4), A56's tiny-group map-combinable shape; find each replica's
    # straddling bucket and the cumulative mass BEFORE it.
    drawn = seeds.select(
        "cents",
        "sa",
        "sc",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
    ).select(
        "b",
        "cents",
        F.expr("cents DIV 10000").alias("bucket"),
        F.expr(w_expr).alias("w"),
    )
    hist = drawn.groupBy("b", "bucket").agg(
        F.sum("w").cast("bigint").alias("bw")
    )
    wb = Window.partitionBy("b").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wtot = Window.partitionBy("b")
    cumh = hist.select(
        "b",
        "bucket",
        (F.sum("bw").over(wb) - F.col("bw")).alias("before"),
        F.sum("bw").over(wb).alias("through"),
        F.sum("bw").over(wtot).alias("tw"),
    )
    targets = cumh.where(
        (2 * F.col("through") >= F.col("tw"))
        & (2 * F.col("before") < F.col("tw"))
    ).select("b", "bucket", "before", "tw")
    # phase 2 — exact value-grain scan of ONLY the straddling buckets
    # (a handful of rows), offset by the phase-1 cumulative mass.
    fine = (
        seeds.withColumn("bucket", F.expr("cents DIV 10000"))
        .join(
            F.broadcast(targets.select("b", "bucket", "before", "tw")),
            "bucket",
        )
        .select("b", "cents", "before", "tw", F.expr(w_expr).alias("w"))
        .groupBy("b", "cents", "before", "tw")
        .agg(F.sum("w").cast("bigint").alias("w"))
    )
    wf = Window.partitionBy("b").orderBy("cents").rowsBetween(
        Window.unboundedPreceding, 0
    )
    med = (
        fine.withColumn("cw", F.sum("w").over(wf) + F.col("before"))
        .where(2 * F.col("cw") >= F.col("tw"))
        .groupBy("b")
        .agg(F.min("cents").alias("med_cents"))
    )
    ranked = med.withColumn(
        "rk",
        F.row_number().over(
            Window.orderBy(F.col("med_cents").asc(), F.col("b").asc())
        ),
    )
    pt_grain = seeds.groupBy("cents").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    wc = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy()
    pt = (
        pt_grain.select(
            "cents",
            F.sum("n").over(wc).alias("cn"),
            F.sum("n").over(wt).alias("tn"),
        )
        .where(2 * F.col("cn") >= F.col("tn"))
        .agg(F.min("cents").alias("pm"))
    )
    return (
        ranked.agg(
            F.max(F.when(F.col("rk") == 2, F.col("med_cents"))).alias(
                "ci_lo_cents"
            ),
            F.max(
                F.when(F.col("rk") == _BOOT_B - 1, F.col("med_cents"))
            ).alias("ci_hi_cents"),
        )
        .crossJoin(F.broadcast(pt))
        .select(
            F.lit(_BOOT_B).cast("bigint").alias("n_boot"),
            F.col("pm").alias("point_median_cents"),
            "ci_lo_cents",
            "ci_hi_cents",
        )
    )


# ==== wave 140: causal-inference pair ==============================

_DID_CUT = "1998-01-01"


@register(
    "q_agg_diff_in_diff",
    oracle=f"""
        WITH labeled AS (
            SELECT CASE WHEN r.r_name = 'EUROPE' THEN 1 ELSE 0 END AS treat,
                   CASE WHEN o.o_orderdate >= TIMESTAMP '{_DID_CUT} 00:00:00'
                        THEN 1 ELSE 0 END AS post,
                   CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS cents
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
        ),
        cells AS (
            SELECT treat, post,
                   CAST(SUM(cents) AS BIGINT) AS s,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM labeled GROUP BY treat, post
        ),
        wide AS (
            SELECT
                MAX(CASE WHEN treat = 1 AND post = 0 THEN CAST(s AS DOUBLE) / n END) AS m_t_pre,
                MAX(CASE WHEN treat = 1 AND post = 1 THEN CAST(s AS DOUBLE) / n END) AS m_t_post,
                MAX(CASE WHEN treat = 0 AND post = 0 THEN CAST(s AS DOUBLE) / n END) AS m_c_pre,
                MAX(CASE WHEN treat = 0 AND post = 1 THEN CAST(s AS DOUBLE) / n END) AS m_c_post,
                CAST(SUM(n) AS BIGINT) AS n_total
            FROM cells
        )
        SELECT n_total,
               ROUND(m_t_pre, 4) AS mean_treat_pre_cents,
               ROUND(m_t_post, 4) AS mean_treat_post_cents,
               ROUND(m_c_pre, 4) AS mean_ctrl_pre_cents,
               ROUND(m_c_post, 4) AS mean_ctrl_post_cents,
               ROUND((m_t_post - m_t_pre) - (m_c_post - m_c_pre), 4)
                   AS did_cents
        FROM wide
    """,
    section="A122",
    doc=f"Difference-in-differences: EUROPE-region customers as the "
    f"treated group, {_DID_CUT} as the policy cut, order value as the "
    "outcome — DiD = (treated post-pre change) - (control post-pre "
    "change), the parallel-trends estimator that differences away both "
    "the group level AND the common time shock (the workhorse quasi-"
    "experimental design beside A23's CUPED variance reduction and "
    "A108's SRM gate). All four cell means are exact BIGINT-cent sums "
    "over counts (one double division each), and the estimate is one "
    "pinned double expression over them. Scale: one 4-cell keyed agg "
    "over the joined fact — dims broadcast, map-combinable; the pivot "
    "is a 4-row MAX-CASE.",
)
def q_agg_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    labeled = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            F.when(F.col("r_name") == "EUROPE", 1).otherwise(0).alias("treat"),
            F.when(
                F.col("o_orderdate") >= F.lit(_DID_CUT).cast("timestamp"), 1
            )
            .otherwise(0)
            .alias("post"),
            F.expr(
                "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            ).alias("cents"),
        )
    )
    cells = labeled.groupBy("treat", "post").agg(
        F.sum("cents").cast("bigint").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    mean = F.col("s").cast("double") / F.col("n")

    def _cell(t, p):
        return F.max(
            F.when((F.col("treat") == t) & (F.col("post") == p), mean)
        )

    wide = cells.agg(
        _cell(1, 0).alias("m_t_pre"),
        _cell(1, 1).alias("m_t_post"),
        _cell(0, 0).alias("m_c_pre"),
        _cell(0, 1).alias("m_c_post"),
        F.sum("n").cast("bigint").alias("n_total"),
    )
    return wide.select(
        "n_total",
        F.round("m_t_pre", 4).alias("mean_treat_pre_cents"),
        F.round("m_t_post", 4).alias("mean_treat_post_cents"),
        F.round("m_c_pre", 4).alias("mean_ctrl_pre_cents"),
        F.round("m_c_post", 4).alias("mean_ctrl_post_cents"),
        F.round(
            (F.col("m_t_post") - F.col("m_t_pre"))
            - (F.col("m_c_post") - F.col("m_c_pre")),
            4,
        ).alias("did_cents"),
    )


@register(
    "q_agg_stratified_ate",
    oracle="""
        WITH labeled AS (
            SELECT CAST((l_quantity - 1) AS BIGINT) // 10 AS stratum,
                   CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END AS treat,
                   CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS cents
            FROM lineitem
        ),
        cells AS (
            SELECT stratum, treat,
                   CAST(SUM(cents) AS BIGINT) AS s,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM labeled GROUP BY stratum, treat
        ),
        wide AS (
            SELECT stratum,
                   MAX(CASE WHEN treat = 1 THEN n END) AS n_treat,
                   MAX(CASE WHEN treat = 0 THEN n END) AS n_ctrl,
                   MAX(CASE WHEN treat = 1 THEN CAST(s AS DOUBLE) / n END)
                       AS m1,
                   MAX(CASE WHEN treat = 0 THEN CAST(s AS DOUBLE) / n END)
                       AS m0
            FROM cells GROUP BY stratum
            HAVING MAX(CASE WHEN treat = 1 THEN n END) IS NOT NULL
               AND MAX(CASE WHEN treat = 0 THEN n END) IS NOT NULL
        ),
        strata AS (
            SELECT CAST(stratum AS VARCHAR) AS stratum,
                   n_treat, n_ctrl,
                   ROUND(m1, 4) AS mean_treated_cents,
                   ROUND(m0, 4) AS mean_control_cents,
                   ROUND(m1 - m0, 4) AS effect_cents
            FROM wide
        ),
        overall AS (
            SELECT 'ALL' AS stratum,
                   CAST(SUM(n_treat) AS BIGINT) AS n_treat,
                   CAST(SUM(n_ctrl) AS BIGINT) AS n_ctrl,
                   CAST(NULL AS DOUBLE) AS mean_treated_cents,
                   CAST(NULL AS DOUBLE) AS mean_control_cents,
                   ROUND(CAST(SUM(CAST(floor((m1 - m0)
                                    * (n_treat + n_ctrl) * 1e6)
                                 AS BIGINT)) AS DOUBLE) / 1e6
                         / SUM(n_treat + n_ctrl), 4) AS effect_cents
            FROM wide
        )
        SELECT * FROM strata UNION ALL SELECT * FROM overall
    """,
    section="A123",
    doc="Stratified average treatment effect: high-discount (>5%) line "
    "items as 'treated', extended price as outcome, QUANTITY DECILE-"
    "BANDS (5 strata of 10 units) as the confounder blocks — the "
    "stratification estimator that removes quantity's confounding the "
    "way A23 (CUPED) removes pre-period variance: per-stratum "
    "treated/control mean gaps, then the population-weighted pooled "
    "ATE (weights = stratum sizes). Strata missing either arm are "
    "excluded (pinned HAVING on both engines). Cell means are exact "
    "cent sums over counts; the pooled row's weighted sum runs over "
    "<=5 stratum rows. Scale: ONE (stratum, arm) keyed agg over the "
    "fact — map-combinable; everything after is a <=10-row pivot.",
)
def q_agg_stratified_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    labeled = li.select(
        F.expr("CAST((l_quantity - 1) AS BIGINT) DIV 10").alias("stratum"),
        F.when(F.col("l_discount") > 0.05, 1).otherwise(0).alias("treat"),
        F.expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("cents"),
    )
    cells = labeled.groupBy("stratum", "treat").agg(
        F.sum("cents").cast("bigint").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    wide = (
        cells.groupBy("stratum")
        .agg(
            F.max(F.when(F.col("treat") == 1, F.col("n"))).alias("n_treat"),
            F.max(F.when(F.col("treat") == 0, F.col("n"))).alias("n_ctrl"),
            F.max(F.when(F.col("treat") == 1, mean)).alias("m1"),
            F.max(F.when(F.col("treat") == 0, mean)).alias("m0"),
        )
        .where(F.col("n_treat").isNotNull() & F.col("n_ctrl").isNotNull())
    )
    strata = wide.select(
        F.col("stratum").cast("string").alias("stratum"),
        "n_treat",
        "n_ctrl",
        F.round("m1", 4).alias("mean_treated_cents"),
        F.round("m0", 4).alias("mean_control_cents"),
        F.round(F.col("m1") - F.col("m0"), 4).alias("effect_cents"),
    )
    overall = wide.agg(
        F.sum("n_treat").cast("bigint").alias("n_treat"),
        F.sum("n_ctrl").cast("bigint").alias("n_ctrl"),
        F.round(
            F.sum(
                F.floor(
                    (F.col("m1") - F.col("m0"))
                    * (F.col("n_treat") + F.col("n_ctrl"))
                    * F.lit(1e6)
                ).cast("bigint")
            ).cast("double")
            / F.lit(1e6)
            / F.sum(F.col("n_treat") + F.col("n_ctrl")),
            4,
        ).alias("effect_cents"),
    ).select(
        F.lit("ALL").alias("stratum"),
        "n_treat",
        "n_ctrl",
        F.lit(None).cast("double").alias("mean_treated_cents"),
        F.lit(None).cast("double").alias("mean_control_cents"),
        "effect_cents",
    )
    return strata.unionByName(overall)


# ==== wave 141: conditional dependence pair ========================

_PCORR_COLS = ["l_quantity", "l_extendedprice", "l_discount"]


def _pcorr_oracle() -> str:
    cols = _PCORR_COLS
    qs = ", ".join(
        f"{_Q_DUCK.format(c=c)} AS q{i}" for i, c in enumerate(cols)
    )
    moments = ["CAST(COUNT(*) AS BIGINT) AS n"]
    for i in range(len(cols)):
        moments.append(f"CAST(SUM(q{i}) AS BIGINT) AS s{i}")
        for j in range(i, len(cols)):
            pd = f"SUM(CAST(q{i} * q{j} AS DECIMAL(38,0)))"
            moments.append(
                f"CAST(CAST({pd} AS HUGEINT) // 4294967296 AS DOUBLE)"
                f" * 4294967296.0"
                f" + CAST(CAST({pd} AS HUGEINT) % 4294967296 AS DOUBLE)"
                f" AS p{i}{j}"
            )

    def r(i, j):
        i, j = min(i, j), max(i, j)
        return (
            f"((CAST(n AS DOUBLE) * p{i}{j}"
            f" - CAST(s{i} AS DOUBLE) * CAST(s{j} AS DOUBLE))"
            f" / (sqrt(CAST(n AS DOUBLE) * p{i}{i}"
            f"          - CAST(s{i} AS DOUBLE) * CAST(s{i} AS DOUBLE))"
            f"    * sqrt(CAST(n AS DOUBLE) * p{j}{j}"
            f"           - CAST(s{j} AS DOUBLE) * CAST(s{j} AS DOUBLE))))"
        )

    rows = []
    for x, y, z in [(0, 1, 2), (0, 2, 1), (1, 2, 0)]:
        rows.append(
            f"SELECT '{cols[x]}' AS col_x, '{cols[y]}' AS col_y,"
            f" '{cols[z]}' AS control, n,"
            f" ROUND({r(x, y)}, 6) AS r_xy,"
            f" ROUND(({r(x, y)} - {r(x, z)} * {r(z, y)})"
            f" / sqrt((1 - {r(x, z)} * {r(x, z)})"
            f"        * (1 - {r(z, y)} * {r(z, y)})), 6) AS r_partial"
            f" FROM m"
        )
    return (
        f"WITH q AS (SELECT {qs} FROM lineitem),"
        f" m AS MATERIALIZED (SELECT {', '.join(moments)} FROM q) "
        + " UNION ALL ".join(rows)
    )


@register(
    "q_agg_partial_correlation",
    oracle=_pcorr_oracle(),
    section="A124",
    doc="First-order partial correlations over the lineitem numeric "
    "triple: for each pair, the correlation REMAINING after the third "
    "variable is partialled out — r_xy.z = (r_xy - r_xz r_zy)/"
    "sqrt((1-r_xz^2)(1-r_zy^2)), the screen that separates direct "
    "association from common-cause artifacts (A26's raw matrix cannot "
    "distinguish them). Inherits A26's full exactness machinery: one "
    "map-combinable moment vector (exact cent integers, DECIMAL(38,0) "
    "cross-moments, hi/lo 32-bit double reconstruction so DuckDB's "
    "non-correctly-rounded hugeint->double cast never enters), then "
    "every r and the partial combination is ONE fixed IEEE expression "
    "tree evaluated identically on both engines. Scale: one scan, one "
    "1-row shuffle, 3 output rows assembled row-locally.",
)
def q_agg_partial_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cols = _PCORR_COLS
    q = li.select(
        *[
            F.expr(_Q_SPARK.format(c=cols[i])).alias(f"q{i}")
            for i in range(len(cols))
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
    for i in range(len(cols)):
        for j in range(i, len(cols)):
            m = m.withColumn(
                f"p{i}{j}",
                F.expr(
                    f"cast(pd{i}{j} div 4294967296 as double) * 4294967296.0d"
                    f" + cast(pd{i}{j} % 4294967296 as double)"
                ),
            )
    m = m.localCheckpoint(eager=False)

    def r(i, j):
        i, j = min(i, j), max(i, j)
        nd = F.col("n").cast("double")
        si = F.col(f"s{i}").cast("double")
        sj = F.col(f"s{j}").cast("double")
        return (nd * F.col(f"p{i}{j}") - si * sj) / (
            F.sqrt(nd * F.col(f"p{i}{i}") - si * si)
            * F.sqrt(nd * F.col(f"p{j}{j}") - sj * sj)
        )

    outs = []
    for x, y, z in [(0, 1, 2), (0, 2, 1), (1, 2, 0)]:
        rxy, rxz, rzy = r(x, y), r(x, z), r(z, y)
        outs.append(
            m.select(
                F.lit(cols[x]).alias("col_x"),
                F.lit(cols[y]).alias("col_y"),
                F.lit(cols[z]).alias("control"),
                "n",
                F.round(rxy, 6).alias("r_xy"),
                F.round(
                    (rxy - rxz * rzy)
                    / F.sqrt((1 - rxz * rxz) * (1 - rzy * rzy)),
                    6,
                ).alias("r_partial"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


@register(
    "q_agg_tail_dependence",
    oracle="""
        WITH pts AS (
            SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS x,
                   CAST(l_quantity AS BIGINT) AS y
            FROM lineitem
        ),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pts),
        tx AS (
            SELECT MIN(x) AS tx FROM (
                SELECT x, SUM(c) OVER (ORDER BY x
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS cum
                FROM (SELECT x, CAST(COUNT(*) AS BIGINT) AS c
                      FROM pts GROUP BY x)
            ), nn WHERE cum >= (19 * n + 19) // 20
        ),
        ty AS (
            SELECT MIN(y) AS ty FROM (
                SELECT y, SUM(c) OVER (ORDER BY y
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS cum
                FROM (SELECT y, CAST(COUNT(*) AS BIGINT) AS c
                      FROM pts GROUP BY y)
            ), nn WHERE cum >= (19 * n + 19) // 20
        ),
        counts AS (
            SELECT CAST(SUM(CASE WHEN p.x > tx.tx AND p.y > ty.ty
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_joint,
                   CAST(SUM(CASE WHEN p.y > ty.ty THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_cond
            FROM pts p CROSS JOIN tx CROSS JOIN ty
        )
        SELECT CAST(0.95 AS DOUBLE) AS q, tx.tx AS x_threshold, ty.ty AS y_threshold,
               c.n_joint, c.n_cond,
               CASE WHEN c.n_cond = 0 THEN NULL
                    ELSE ROUND(CAST(c.n_joint AS DOUBLE) / c.n_cond, 6)
               END AS lambda_upper
        FROM counts c CROSS JOIN tx CROSS JOIN ty
    """,
    section="A125",
    doc="Empirical upper-tail dependence lambda_U(0.95) between line "
    "price and quantity: P(price exceeds its 95th percentile | "
    "quantity exceeds its own) — the extreme-co-movement gauge that "
    "A26's Pearson and A107's Spearman both miss (they average over "
    "the body; portfolios and capacity plans die in the joint tail). "
    "Thresholds are NEAREST-RANK order statistics via value-grain "
    "cumulative counts (k = ceil(0.95n) as the integer (19n+19) DIV "
    "20 — no float quantile), exceedance is a strict integer compare, "
    "and lambda is one division of two counts. NULL when the "
    "conditioning tail is empty (pinned both engines). Scale: two "
    "value-grain cumulants + one scan with two broadcast scalar "
    "thresholds — no sort of the fact.",
)
def q_agg_tail_dependence(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pts = li.select(
        F.expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("x"),
        F.col("l_quantity").cast("bigint").alias("y"),
    )
    nn = pts.agg(F.count(F.lit(1)).cast("bigint").alias("n"))

    def thresh(col):
        grain = pts.groupBy(col).agg(
            F.count(F.lit(1)).cast("bigint").alias("c")
        )
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, 0)
        cum = grain.select(col, F.sum("c").over(w).alias("cum"))
        return (
            cum.crossJoin(F.broadcast(nn))
            .where(F.col("cum") >= F.expr("(19 * n + 19) DIV 20"))
            .agg(F.min(col).alias(f"t{col}"))
        )

    tx, ty = thresh("x"), thresh("y")
    counts = (
        pts.crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
        .agg(
            F.sum(
                F.when(
                    (F.col("x") > F.col("tx")) & (F.col("y") > F.col("ty")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_joint"),
            F.sum(F.when(F.col("y") > F.col("ty"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_cond"),
            F.max("tx").alias("x_threshold"),
            F.max("ty").alias("y_threshold"),
        )
    )
    return counts.select(
        F.lit(0.95).alias("q"),
        "x_threshold",
        "y_threshold",
        "n_joint",
        "n_cond",
        F.when(
            F.col("n_cond") > 0,
            F.round(
                F.col("n_joint").cast("double") / F.col("n_cond"), 6
            ),
        ).alias("lambda_upper"),
    )


# ==== wave 146: multivariate location test, inequality index =======


@register(
    "q_agg_hotelling_t2",
    oracle="""
        WITH pts AS (
            SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS g,
                   CAST(l_quantity AS BIGINT) AS x,
                   CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS y
            FROM lineitem
        ),
        m AS MATERIALIZED (
            SELECT g,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x * x) AS BIGINT) AS sxx,
                   CAST(CAST(SUM(CAST(y * y AS DECIMAL(38,0))) AS HUGEINT)
                        // 4294967296 AS DOUBLE) * 4294967296.0
                   + CAST(CAST(SUM(CAST(y * y AS DECIMAL(38,0))) AS HUGEINT)
                          % 4294967296 AS DOUBLE) AS syy,
                   CAST(SUM(x * y) AS BIGINT) AS sxy
            FROM pts GROUP BY g
        ),
        f AS (
            SELECT a.n AS n1, b.n AS n2,
                   CAST(a.sx AS DOUBLE) / a.n
                       - CAST(b.sx AS DOUBLE) / b.n AS dx,
                   CAST(a.sy AS DOUBLE) / a.n
                       - CAST(b.sy AS DOUBLE) / b.n AS dy,
                   ((CAST(a.sxx AS DOUBLE)
                     - CAST(a.sx AS DOUBLE) * CAST(a.sx AS DOUBLE) / a.n)
                    + (CAST(b.sxx AS DOUBLE)
                       - CAST(b.sx AS DOUBLE) * CAST(b.sx AS DOUBLE) / b.n))
                   / (a.n + b.n - 2) AS vxx,
                   ((a.syy
                     - CAST(a.sy AS DOUBLE) * CAST(a.sy AS DOUBLE) / a.n)
                    + (b.syy
                       - CAST(b.sy AS DOUBLE) * CAST(b.sy AS DOUBLE) / b.n))
                   / (a.n + b.n - 2) AS vyy,
                   ((CAST(a.sxy AS DOUBLE)
                     - CAST(a.sx AS DOUBLE) * CAST(a.sy AS DOUBLE) / a.n)
                    + (CAST(b.sxy AS DOUBLE)
                       - CAST(b.sx AS DOUBLE) * CAST(b.sy AS DOUBLE) / b.n))
                   / (a.n + b.n - 2) AS vxy
            FROM (SELECT * FROM m WHERE g = 1) a
            CROSS JOIN (SELECT * FROM m WHERE g = 0) b
        )
        SELECT n1, n2,
               ROUND(CAST(n1 AS DOUBLE) * n2 / (n1 + n2)
                     * (dx * (vyy * dx - vxy * dy)
                        + dy * (vxx * dy - vxy * dx))
                     / (vxx * vyy - vxy * vxy), 6) AS t2,
               ROUND(CAST(n1 AS DOUBLE) * n2 / (n1 + n2)
                     * (dx * (vyy * dx - vxy * dy)
                        + dy * (vxx * dy - vxy * dx))
                     / (vxx * vyy - vxy * vxy)
                     * (n1 + n2 - 3)
                     / (2.0 * (n1 + n2 - 2)), 6) AS f_stat
        FROM f
    """,
    section="A126",
    doc="Hotelling's two-sample T^2 on the (quantity, price) mean "
    "vector, returned vs kept lines — the suite's first MULTIVARIATE "
    "location test: unlike running A113-style t-tests per column, "
    "T^2 = (n1 n2/(n1+n2)) d' S_pooled^-1 d respects the correlation "
    "between the two outcomes (a shift along the quantity-price ridge "
    "is judged differently from one across it); the F conversion uses "
    "the exact rational (n-p-1)/(p(n-2)) factor at p = 2. The 2x2 "
    "inverse is closed-form, so everything reduces to exact integer "
    "moments (the y^2 cross-moment exceeds 2^53 and uses A26's hi/lo "
    "32-bit double reconstruction) flowing through one pinned IEEE "
    "tree. Scale: one 2-group moment agg — map-combinable, 1-row "
    "output.",
)
def q_agg_hotelling_t2(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pts = li.select(
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("g"),
        F.col("l_quantity").cast("bigint").alias("x"),
        F.expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("y"),
    )
    m = pts.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(DecimalType(38, 0))).alias(
            "syyd"
        ),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    ).withColumn(
        "syy",
        F.expr(
            "cast(syyd div 4294967296 as double) * 4294967296.0d"
            " + cast(syyd % 4294967296 as double)"
        ),
    )
    a = m.where(F.col("g") == 1).select(
        *[F.col(c).alias(f"a_{c}") for c in ["n", "sx", "sy", "sxx", "syy", "sxy"]]
    )
    b = m.where(F.col("g") == 0).select(
        *[F.col(c).alias(f"b_{c}") for c in ["n", "sx", "sy", "sxx", "syy", "sxy"]]
    )
    j = a.crossJoin(b)
    n1, n2 = F.col("a_n"), F.col("b_n")
    dx = F.col("a_sx").cast("double") / n1 - F.col("b_sx").cast("double") / n2
    dy = F.col("a_sy").cast("double") / n1 - F.col("b_sy").cast("double") / n2
    dof = (n1 + n2 - 2)
    vxx = (
        (
            F.col("a_sxx").cast("double")
            - F.col("a_sx").cast("double") * F.col("a_sx").cast("double") / n1
        )
        + (
            F.col("b_sxx").cast("double")
            - F.col("b_sx").cast("double") * F.col("b_sx").cast("double") / n2
        )
    ) / dof
    vyy = (
        (
            F.col("a_syy")
            - F.col("a_sy").cast("double") * F.col("a_sy").cast("double") / n1
        )
        + (
            F.col("b_syy")
            - F.col("b_sy").cast("double") * F.col("b_sy").cast("double") / n2
        )
    ) / dof
    vxy = (
        (
            F.col("a_sxy").cast("double")
            - F.col("a_sx").cast("double") * F.col("a_sy").cast("double") / n1
        )
        + (
            F.col("b_sxy").cast("double")
            - F.col("b_sx").cast("double") * F.col("b_sy").cast("double") / n2
        )
    ) / dof
    t2 = (
        n1.cast("double")
        * n2
        / (n1 + n2)
        * (dx * (vyy * dx - vxy * dy) + dy * (vxx * dy - vxy * dx))
        / (vxx * vyy - vxy * vxy)
    )
    return j.select(
        n1.alias("n1"),
        n2.alias("n2"),
        F.round(t2, 6).alias("t2"),
        F.round(
            t2 * (n1 + n2 - 3) / (F.lit(2.0) * (n1 + n2 - 2)), 6
        ).alias("f_stat"),
    )


@register(
    "q_agg_atkinson",
    oracle="""
        WITH v AS (
            SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS cents
            FROM orders
        ),
        s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(cents) AS BIGINT) AS tot,
                   CAST(SUM(CAST(1000000000000 AS BIGINT) // cents)
                        AS BIGINT) AS recip_q12
            FROM v
        )
        SELECT n,
               ROUND(CAST(tot AS DOUBLE) / n, 4) AS mean_cents,
               ROUND(CAST(n AS DOUBLE) * 1e12 / CAST(recip_q12 AS DOUBLE),
                     4) AS harmonic_mean_cents,
               ROUND(1 - (CAST(n AS DOUBLE) * 1e12
                          / CAST(recip_q12 AS DOUBLE))
                         / (CAST(tot AS DOUBLE) / n), 6)
                   AS atkinson_eps2
        FROM s
    """,
    section="A127",
    doc="Atkinson inequality index at aversion epsilon = 2 over order "
    "values: A(2) = 1 - harmonic_mean/mean — the welfare-founded "
    "inequality measure whose aversion knob A33's Gini lacks (at "
    "eps = 2 it weights the poor end quadratically, so it moves when "
    "the bottom of the distribution moves and Gini barely does). The "
    "determinism device is the INTEGER RECIPROCAL: cents >= 1 are "
    "int64, so each 1e12 DIV cents term is an exact integer division "
    "(no float reciprocal anywhere) and the harmonic mean's "
    "denominator is a pure BIGINT sum — order-insensitive by "
    "construction; the final index is two pinned divisions. Scale: "
    "one map-combinable 3-scalar agg over the fact.",
)
def q_agg_atkinson(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    v = orders.select(
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("cents")
    )
    s = v.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("tot"),
        F.sum(F.expr("CAST(1000000000000 AS BIGINT) DIV cents"))
        .cast("bigint")
        .alias("recip_q12"),
    )
    mean = F.col("tot").cast("double") / F.col("n")
    hmean = F.col("n").cast("double") * F.lit(1e12) / F.col(
        "recip_q12"
    ).cast("double")
    return s.select(
        "n",
        F.round(mean, 4).alias("mean_cents"),
        F.round(hmean, 4).alias("harmonic_mean_cents"),
        F.round(1 - hmean / mean, 6).alias("atkinson_eps2"),
    )


# ==== wave 149a: restricted mean survival time =====================

_RMST_TAU = 60
# floor(ln(0.5) * 1e12): S(t) <= 0.5 iff the quantized log-sum is <=
# this integer — the median-survival compare never touches a float.
_LN_HALF_Q12 = -693147180560


@register(
    "q_agg_survival_rmst",
    oracle=f"""
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
        ),
        surv AS (
            SELECT t, dead,
                   CAST(SUM(CAST(floor(term * 1e12) AS DECIMAL(38,0)))
                        OVER w AS BIGINT) AS ls_q12,
                   LEAD(t) OVER (ORDER BY t) AS nxt
            FROM lg
            WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)
        ),
        segs AS (
            SELECT t,
                   CASE WHEN dead = 1 THEN 0.0
                        ELSE exp(CAST(ls_q12 AS DOUBLE) / 1e12) END AS s,
                   GREATEST(LEAST(COALESCE(nxt, {_RMST_TAU}),
                                  {_RMST_TAU}) - t, 0) AS dt
            FROM surv WHERE t < {_RMST_TAU}
        ),
        area AS (
            SELECT CAST(SUM(CAST(floor(s * dt * 1e8) AS BIGINT))
                        AS BIGINT) AS a_q8
            FROM segs WHERE dt > 0
        ),
        head AS (
            SELECT CAST(LEAST(MIN(t), {_RMST_TAU}) AS BIGINT) AS t1
            FROM ev
        ),
        med AS (
            SELECT CAST(MIN(t) AS BIGINT) AS median_t
            FROM surv WHERE dead = 1 OR ls_q12 <= {_LN_HALF_Q12}
        )
        SELECT CAST({_RMST_TAU} AS BIGINT) AS tau_days,
               ROUND(h.t1 + CAST(a.a_q8 AS DOUBLE) / 1e8, 4)
                   AS rmst_days,
               m.median_t AS median_survival_days
        FROM area a CROSS JOIN head h CROSS JOIN med m
    """,
    section="A128",
    doc=f"Restricted mean survival time to tau = {_RMST_TAU} days plus "
    "the median survival time, on A33's Kaplan-Meier curve (customer "
    "inter-order gaps): RMST = area under S(t) up to tau — the "
    "effect measure of choice when hazards are not proportional (a "
    "mean with a guaranteed finite horizon), and the single number "
    "('average days of customer life in the first 60') that the full "
    "A33 curve makes you eyeball. Devices: S(t) comes from the SAME "
    "quantized log-sum as A33 (bit-identical partials), each area "
    "segment floor(S*dt*1e8)-quantizes BEFORE the sum (order-"
    "insensitive), the leading S=1 segment is exact integer days, "
    "and the MEDIAN needs no float compare at all — S <= 1/2 iff the "
    "integer log-sum is <= floor(ln(1/2)*1e12), a Python literal. "
    "Scale: identical to A33 (|customers| lead window, |gaps| curve).",
)
def q_agg_survival_rmst(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    wn = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = orders.select(
        F.datediff(F.lead("o_orderdate").over(wn), F.col("o_orderdate")).alias(
            "gap"
        )
    ).where(F.col("gap").isNotNull())
    ev = gaps.groupBy(F.col("gap").alias("t")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    km = ev.select(
        "t",
        "d",
        (
            F.sum("d").over(wall).cast("bigint")
            - F.sum("d").over(w).cast("bigint")
            + F.col("d")
        ).alias("n_risk"),
    )
    lg = km.select(
        "t",
        "d",
        "n_risk",
        F.when(
            F.col("d") < F.col("n_risk"),
            F.log(F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk")),
        ).alias("term"),
        F.max(
            F.when(F.col("d") >= F.col("n_risk"), 1).otherwise(0)
        )
        .over(w)
        .alias("dead"),
    )
    surv = lg.select(
        "t",
        "dead",
        F.sum(
            F.floor(F.col("term") * F.lit(1e12)).cast(DecimalType(38, 0))
        )
        .over(w)
        .cast("bigint")
        .alias("ls_q12"),
        F.lead("t").over(Window.orderBy("t")).alias("nxt"),
    ).localCheckpoint(eager=False)
    segs = surv.where(F.col("t") < _RMST_TAU).select(
        F.when(F.col("dead") == 1, F.lit(0.0))
        .otherwise(F.exp(F.col("ls_q12").cast("double") / F.lit(1e12)))
        .alias("s"),
        F.greatest(
            F.least(
                F.coalesce(F.col("nxt"), F.lit(_RMST_TAU)),
                F.lit(_RMST_TAU),
            )
            - F.col("t"),
            F.lit(0),
        ).alias("dt"),
    )
    area = segs.where(F.col("dt") > 0).agg(
        F.sum(
            F.floor(F.col("s") * F.col("dt") * F.lit(1e8)).cast("bigint")
        )
        .cast("bigint")
        .alias("a_q8")
    )
    head = ev.agg(
        F.least(F.min("t"), F.lit(_RMST_TAU)).cast("bigint").alias("t1")
    )
    med = surv.where(
        (F.col("dead") == 1) | (F.col("ls_q12") <= F.lit(_LN_HALF_Q12))
    ).agg(F.min("t").cast("bigint").alias("median_t"))
    return (
        area.crossJoin(F.broadcast(head))
        .crossJoin(F.broadcast(med))
        .select(
            F.lit(_RMST_TAU).cast("bigint").alias("tau_days"),
            F.round(
                F.col("t1") + F.col("a_q8").cast("double") / F.lit(1e8), 4
            ).alias("rmst_days"),
            F.col("median_t").alias("median_survival_days"),
        )
    )


# ==== wave 151: classifier panel, modern dependence ================


@register(
    "q_agg_binary_metrics",
    oracle="""
        WITH pred AS (
            SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                       AS y,
                   CASE WHEN value > 150 THEN 1 ELSE 0 END AS p
            FROM events
        ),
        c AS (
            SELECT CAST(SUM(y * p) AS BIGINT) AS tp,
                   CAST(SUM((1 - y) * p) AS BIGINT) AS fp,
                   CAST(SUM(y * (1 - p)) AS BIGINT) AS fn,
                   CAST(SUM((1 - y) * (1 - p)) AS BIGINT) AS tn
            FROM pred
        )
        SELECT tp, fp, fn, tn,
               ROUND(CAST(tp AS DOUBLE) / (tp + fp), 6) AS precision,
               ROUND(CAST(tp AS DOUBLE) / (tp + fn), 6) AS recall,
               ROUND(CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn), 6)
                   AS f1,
               ROUND((CAST(tp AS DOUBLE) * tn
                      - CAST(fp AS DOUBLE) * fn)
                     / sqrt((CAST(tp + fp AS DOUBLE))
                            * (CAST(tp + fn AS DOUBLE))
                            * (CAST(tn + fp AS DOUBLE))
                            * (CAST(tn + fn AS DOUBLE))), 6) AS mcc
        FROM c
    """,
    section="A129",
    doc="The binary-classifier panel (value>150 predicting purchase, "
    "the A57 setup): confusion counts plus precision, recall, F1, and "
    "Matthews correlation — MCC being the one scalar that stays "
    "honest under imbalance AND label inversion (F1 is asymmetric in "
    "the positive class; A119's AP needs scores, this needs only the "
    "hard decision). The panel A58/A119 presuppose but nothing in "
    "the suite emitted directly. Four integer cell counts, four "
    "pinned expressions (the MCC product stays inside double range: "
    "each factor <= n, n^4 <= 1e24 representable). Scale: one "
    "map-combinable 4-scalar agg.",
)
def q_agg_binary_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pred = ev.select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        F.when(F.col("value") > 150, 1).otherwise(0).alias("p"),
    )
    c = pred.agg(
        F.sum(F.col("y") * F.col("p")).cast("bigint").alias("tp"),
        F.sum((1 - F.col("y")) * F.col("p")).cast("bigint").alias("fp"),
        F.sum(F.col("y") * (1 - F.col("p"))).cast("bigint").alias("fn"),
        F.sum((1 - F.col("y")) * (1 - F.col("p")))
        .cast("bigint")
        .alias("tn"),
    )
    tp, fp, fn, tn = (F.col(c_) for c_ in ["tp", "fp", "fn", "tn"])
    return c.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(tp.cast("double") / (tp + fp), 6).alias("precision"),
        F.round(tp.cast("double") / (tp + fn), 6).alias("recall"),
        F.round((2 * tp).cast("double") / (2 * tp + fp + fn), 6).alias(
            "f1"
        ),
        F.round(
            (tp.cast("double") * tn - fp.cast("double") * fn)
            / F.sqrt(
                (tp + fp).cast("double")
                * (tp + fn).cast("double")
                * (tn + fp).cast("double")
                * (tn + fn).cast("double")
            ),
            6,
        ).alias("mcc"),
    )


@register(
    "q_agg_chatterjee_xi",
    oracle="""
        WITH pts AS (
            SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS x,
                   CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00',
                                  o_orderdate) AS BIGINT) AS y,
                   o_orderkey AS k
            FROM orders
        ),
        ranked AS (
            SELECT x, k,
                   CAST(ROW_NUMBER() OVER (ORDER BY y, k) AS BIGINT)
                       AS ry
            FROM pts
        ),
        seq AS (
            SELECT ry,
                   LEAD(ry) OVER (ORDER BY x, k) AS ry_next
            FROM ranked
        ),
        s AS (
            SELECT CAST(SUM(abs(ry_next - ry)) AS BIGINT) AS sum_adj,
                   CAST(COUNT(*) + 1 AS BIGINT) AS n
            FROM seq WHERE ry_next IS NOT NULL
        )
        SELECT n,
               ROUND(1 - CAST(3 * sum_adj AS DOUBLE)
                         / (CAST(n AS DOUBLE) * n - 1), 6) AS xi
        FROM s
    """,
    section="A130",
    doc="Chatterjee's xi correlation (2020) between order value and "
    "order date: xi = 1 - 3 sum|r_(i+1) - r_i| / (n^2 - 1) over "
    "y-ranks taken in x-order — the modern dependence coefficient "
    "that is ~0 iff independent and -> 1 iff y is a measurable "
    "FUNCTION of x, so unlike A26 (linear) and A107 (monotone) it "
    "detects oscillating or V-shaped dependence; its price is "
    "asymmetry (xi(x,y) != xi(y,x)), which is the point — it tests "
    "'does x determine y'. Ranks are strict row_numbers under fully "
    "tie-broken (value, key) orders (the vanishing-tie convention, "
    "pinned identically on both engines); the adjacent-rank sum is "
    "pure int64; one final pinned division. Scale: two ordered "
    "windows over the value grain and a scalar rollup — at cluster "
    "scale both are range-partitioned sorts of narrow int pairs.",
)
def q_agg_chatterjee_xi(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    pts = orders.select(
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("x"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")
        )
        .cast("bigint")
        .alias("y"),
        F.col("o_orderkey").alias("k"),
    )
    # Scale note (r6): both global orderings run on the distributed
    # two-pass rank operator; the lead() over the x-order becomes an
    # rx -> rx+1 self-join on the dense global rank (hash join, parallel)
    # instead of a second single-partition window.
    from ai_to_cvent_etl_spark.operators.ranking import global_row_number

    ranked = global_row_number(
        global_row_number(pts, ["y", "k"], out_col="ry"),
        ["x", "k"],
        out_col="rx",
    ).localCheckpoint(eager=False)
    nxt = ranked.select(
        (F.col("rx") - 1).alias("rx"), F.col("ry").alias("ry_next")
    )
    seq = ranked.select("rx", "ry").join(nxt, "rx", "left")
    s = seq.where(F.col("ry_next").isNotNull()).agg(
        F.sum(F.abs(F.col("ry_next") - F.col("ry")))
        .cast("bigint")
        .alias("sum_adj"),
        (F.count(F.lit(1)) + 1).cast("bigint").alias("n"),
    )
    return s.select(
        "n",
        F.round(
            1
            - (3 * F.col("sum_adj")).cast("double")
            / (F.col("n").cast("double") * F.col("n") - 1),
            6,
        ).alias("xi"),
    )


# ==== wave 152: tail risk and factor exposure ======================


@register(
    "q_agg_expected_shortfall",
    oracle="""
        WITH v AS (
            SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS cents
            FROM orders
        ),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
        thr AS (
            SELECT MIN(cents) AS var95 FROM (
                SELECT cents, SUM(c) OVER (ORDER BY cents
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS cum
                FROM (SELECT cents, CAST(COUNT(*) AS BIGINT) AS c
                      FROM v GROUP BY cents)
            ), nn WHERE cum >= (19 * n + 19) // 20
        ),
        tail AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_tail,
                   CAST(SUM(v.cents) AS BIGINT) AS s_tail
            FROM v CROSS JOIN thr WHERE v.cents >= thr.var95
        )
        SELECT nn.n, thr.var95 AS var95_cents,
               t.n_tail,
               ROUND(CAST(t.s_tail AS DOUBLE) / t.n_tail, 4)
                   AS es95_cents
        FROM nn CROSS JOIN thr CROSS JOIN tail t
    """,
    section="A131",
    doc="Value-at-Risk and Expected Shortfall at the 95th percentile "
    "of order values: VaR as the NEAREST-RANK order statistic "
    "(A125's integer (19n+19) DIV 20 device — no float quantile), "
    "ES as the exact conditional mean AT OR BEYOND it — the "
    "coherent tail-risk pair (ES is subadditive where VaR is not, "
    "which is why Basel moved to it), and the one-variable sibling "
    "of A125's joint tail. All counts and sums are integer cents; "
    "one division. Scale: one value-grain cumulant for the "
    "threshold + one scan with a broadcast scalar — no sort of the "
    "fact.",
)
def q_agg_expected_shortfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    v = orders.select(
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("cents")
    )
    nn = v.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    grain = v.groupBy("cents").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    thr = (
        grain.select("cents", F.sum("c").over(w).alias("cum"))
        .crossJoin(F.broadcast(nn))
        .where(F.col("cum") >= F.expr("(19 * n + 19) DIV 20"))
        .agg(F.min("cents").alias("var95"))
    )
    tail = (
        v.crossJoin(F.broadcast(thr))
        .where(F.col("cents") >= F.col("var95"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tail"),
            F.sum("cents").cast("bigint").alias("s_tail"),
            F.max("var95").alias("var95_cents"),
        )
    )
    return tail.crossJoin(F.broadcast(nn)).select(
        "n",
        "var95_cents",
        "n_tail",
        F.round(
            F.col("s_tail").cast("double") / F.col("n_tail"), 4
        ).alias("es95_cents"),
    )


@register(
    "q_agg_market_beta",
    oracle="""
        WITH monthly AS (
            SELECT n.n_name AS nation,
                   (date_part('year', o.o_orderdate) - 1995) * 12
                   + date_part('month', o.o_orderdate) - 1 AS m,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) AS cents
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1, 2
        ),
        mkt AS (
            SELECT m, CAST(SUM(cents) AS BIGINT) AS mkt_cents
            FROM monthly GROUP BY m
        ),
        paired AS (
            SELECT mo.nation, mo.cents AS y, k.mkt_cents AS x
            FROM monthly mo JOIN mkt k ON mo.m = k.m
        ),
        moments AS (
            SELECT nation,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(CAST(SUM(CAST(x AS DECIMAL(38,0))
                                 * CAST(x AS DECIMAL(38,0))) AS HUGEINT)
                        // 4294967296 AS DOUBLE) * 4294967296.0
                   + CAST(CAST(SUM(CAST(x AS DECIMAL(38,0))
                                   * CAST(x AS DECIMAL(38,0))) AS HUGEINT)
                          % 4294967296 AS DOUBLE) AS sxx,
                   CAST(CAST(SUM(CAST(x AS DECIMAL(38,0))
                                 * CAST(y AS DECIMAL(38,0))) AS HUGEINT)
                        // 4294967296 AS DOUBLE) * 4294967296.0
                   + CAST(CAST(SUM(CAST(x AS DECIMAL(38,0))
                                   * CAST(y AS DECIMAL(38,0))) AS HUGEINT)
                          % 4294967296 AS DOUBLE) AS sxy
            FROM paired GROUP BY nation
        )
        SELECT nation, n,
               ROUND((CAST(n AS DOUBLE) * sxy
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (CAST(n AS DOUBLE) * sxx
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
                   AS beta,
               ROUND((CAST(sy AS DOUBLE)
                      - (CAST(n AS DOUBLE) * sxy
                         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                        / (CAST(n AS DOUBLE) * sxx
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * CAST(sx AS DOUBLE)) / n, 4) AS alpha_cents
        FROM moments
    """,
    section="A132",
    doc="Per-nation market beta: each nation's monthly revenue "
    "regressed on the TOTAL market's monthly revenue — beta > 1 "
    "nations amplify the aggregate cycle, beta ~ 0 nations are "
    "idiosyncratic; with the alpha intercept this is the one-factor "
    "exposure model (CAPM shape) as a grouped closed-form OLS, the "
    "panel complement of W33's cross-sectional momentum. The x^2 "
    "and xy cross-moments exceed 2^53 (market cents ~ 1e10 squared), "
    "so both engines rebuild the doubles with A26's hi/lo 32-bit "
    "device over DECIMAL(38,0) sums; slope/intercept are pinned "
    "IEEE. Scale: the factor series is a broadcast |months|-row "
    "table; one (nation, month) agg + one nation-grain moment agg.",
)
def q_agg_market_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    mo = (F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate") - 1
    monthly = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), mo.alias("m"))
        .agg(
            F.expr(
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 "
                "AS BIGINT)"
            ).alias("cents")
        )
    ).localCheckpoint(eager=False)
    mkt = monthly.groupBy("m").agg(
        F.sum("cents").cast("bigint").alias("mkt_cents")
    )
    paired = monthly.join(F.broadcast(mkt), "m").select(
        "nation",
        F.col("cents").alias("y"),
        F.col("mkt_cents").alias("x"),
    )
    moments = paired.groupBy("nation").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(
            F.col("x").cast(DecimalType(38, 0))
            * F.col("x").cast(DecimalType(38, 0))
        ).alias("sxxd"),
        F.sum(
            F.col("x").cast(DecimalType(38, 0))
            * F.col("y").cast(DecimalType(38, 0))
        ).alias("sxyd"),
    )
    moments = moments.withColumn(
        "sxx",
        F.expr(
            "cast(sxxd div 4294967296 as double) * 4294967296.0d"
            " + cast(sxxd % 4294967296 as double)"
        ),
    ).withColumn(
        "sxy",
        F.expr(
            "cast(sxyd div 4294967296 as double) * 4294967296.0d"
            " + cast(sxyd % 4294967296 as double)"
        ),
    )
    nd = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    beta = (nd * F.col("sxy") - sx * sy) / (nd * F.col("sxx") - sx * sx)
    alpha = (sy - beta * sx) / F.col("n")
    return moments.select(
        "nation",
        "n",
        F.round(beta, 6).alias("beta"),
        F.round(alpha, 4).alias("alpha_cents"),
    )


# ==== wave 153: instrumental variables, gap decomposition ==========


@register(
    "q_agg_iv_wald",
    oracle="""
        WITH pts AS (
            SELECT o.o_orderkey,
                   CAST(substring(o.o_orderpriority, 1, 1) AS BIGINT) AS z,
                   CAST(date_diff('day', o.o_orderdate, MAX(l.l_shipdate))
                        AS BIGINT) AS x,
                   CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS y
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate,
                     o.o_totalprice
            HAVING MAX(l.l_shipdate) >= o.o_orderdate
        ),
        m AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(z) AS BIGINT) AS sz,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(z * z) AS BIGINT) AS szz,
                   CAST(SUM(z * x) AS BIGINT) AS szx,
                   CAST(SUM(z * y) AS BIGINT) AS szy,
                   CAST(SUM(x * x) AS BIGINT) AS sxx,
                   CAST(SUM(x * y) AS BIGINT) AS sxy
            FROM pts
        )
        SELECT n,
               ROUND((CAST(n AS DOUBLE) * sxy
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (CAST(n AS DOUBLE) * sxx
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
                   AS beta_ols,
               ROUND((CAST(n AS DOUBLE) * szy
                      - CAST(sz AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (CAST(n AS DOUBLE) * szx
                        - CAST(sz AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
                   AS beta_iv,
               ROUND((CAST(n AS DOUBLE) * szx
                      - CAST(sz AS DOUBLE) * CAST(sx AS DOUBLE))
                     / (CAST(n AS DOUBLE) * szz
                        - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)), 6)
                   AS first_stage_slope
        FROM m
    """,
    section="A133",
    doc="Instrumental-variable (Wald/2SLS, one instrument) estimate of "
    "fulfillment delay's effect on order value: priority class (the "
    "digit) instruments the delay — beta_IV = cov(z,y)/cov(z,x), "
    "reported NEXT TO the naive OLS slope so the confounding bias is "
    "visible as their gap, plus the first-stage slope (instrument "
    "strength; near-zero => weak-instrument territory and beta_IV is "
    "garbage). Completes the causal toolkit: A122 DiD (parallel "
    "trends), A123 stratification (observables), TS34 ITS (pre-"
    "trend), now IV (exclusion restriction). All moments are exact "
    "BIGINTs at the order grain (delay <= ~2.5k days, z <= 5 — far "
    "under int64); the three ratios are pinned IEEE. Scale: one "
    "order-grain agg (max shipdate per order) + one 9-scalar "
    "map-combinable moment agg.",
)
def q_agg_iv_wald(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pts = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderpriority", "o_orderdate", "o_totalprice")
        .agg(F.max("l_shipdate").alias("dep"))
        .where(F.col("dep") >= F.col("o_orderdate"))
        .select(
            F.substring("o_orderpriority", 1, 1).cast("bigint").alias("z"),
            F.datediff("dep", "o_orderdate").cast("bigint").alias("x"),
            F.expr(
                "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            ).alias("y"),
        )
    )
    m = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("z").cast("bigint").alias("sz"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("z") * F.col("z")).cast("bigint").alias("szz"),
        F.sum(F.col("z") * F.col("x")).cast("bigint").alias("szx"),
        F.sum(F.col("z") * F.col("y")).cast("bigint").alias("szy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    nd = F.col("n").cast("double")

    def cov(sab, sa, sb):
        return nd * F.col(sab) - F.col(sa).cast("double") * F.col(
            sb
        ).cast("double")

    return m.select(
        "n",
        F.round(cov("sxy", "sx", "sy") / cov("sxx", "sx", "sx"), 6).alias(
            "beta_ols"
        ),
        F.round(cov("szy", "sz", "sy") / cov("szx", "sz", "sx"), 6).alias(
            "beta_iv"
        ),
        F.round(cov("szx", "sz", "sx") / cov("szz", "sz", "sz"), 6).alias(
            "first_stage_slope"
        ),
    )


@register(
    "q_agg_oaxaca_blinder",
    oracle="""
        WITH pts AS (
            SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS g,
                   CAST(l_quantity AS BIGINT) AS x,
                   CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS y
            FROM lineitem
        ),
        m AS MATERIALIZED (
            SELECT g,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x * x) AS BIGINT) AS sxx,
                   CAST(SUM(x * y) AS BIGINT) AS sxy
            FROM pts GROUP BY g
        ),
        fits AS (
            SELECT g, n,
                   CAST(sx AS DOUBLE) / n AS mx,
                   CAST(sy AS DOUBLE) / n AS my,
                   (CAST(n AS DOUBLE) * sxy
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (CAST(n AS DOUBLE) * sxx
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b
            FROM m
        )
        SELECT a.n AS n_a, b2.n AS n_b,
               ROUND(a.my - b2.my, 4) AS total_gap_cents,
               ROUND((a.mx - b2.mx) * b2.b, 4) AS endowment_cents,
               ROUND(a.mx * (a.b - b2.b)
                     + ((a.my - a.b * a.mx)
                        - (b2.my - b2.b * b2.mx)), 4)
                   AS coefficient_cents
        FROM (SELECT * FROM fits WHERE g = 1) a
        CROSS JOIN (SELECT * FROM fits WHERE g = 0) b2
    """,
    section="A134",
    doc="Oaxaca-Blinder decomposition of the returned-vs-kept price "
    "gap: mean price difference split into the ENDOWMENT part "
    "((x̄_A - x̄_B)·β_B — returned lines ship different quantities) "
    "and the COEFFICIENT part (x̄_A(β_A - β_B) + Δintercept — the "
    "price-per-quantity relationship itself differs), using the "
    "two-fold decomposition with group B coefficients as reference. "
    "The audit-the-gap operator (pay equity, conversion gaps) that "
    "A122/A123 don't cover: it explains a DESCRIPTIVE difference "
    "rather than estimating a causal effect, and the two parts sum "
    "exactly to the total gap by construction — a built-in checksum. "
    "Group fits are closed-form simple OLS over exact integer "
    "moments; every reported number is a pinned IEEE expression. "
    "Scale: one 2-group moment agg, a 1x1 cross join.",
)
def q_agg_oaxaca_blinder(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pts = li.select(
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("g"),
        F.col("l_quantity").cast("bigint").alias("x"),
        F.expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("y"),
    )
    m = pts.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    nd = F.col("n").cast("double")
    mx = F.col("sx").cast("double") / F.col("n")
    my = F.col("sy").cast("double") / F.col("n")
    b = (nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy").cast("double")) / (
        nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    fits = m.select(
        "g", "n", mx.alias("mx"), my.alias("my"), b.alias("b")
    )
    a = fits.where(F.col("g") == 1).select(
        *[F.col(c).alias(f"a_{c}") for c in ["n", "mx", "my", "b"]]
    )
    bb = fits.where(F.col("g") == 0).select(
        *[F.col(c).alias(f"b_{c}") for c in ["n", "mx", "my", "b"]]
    )
    j = a.crossJoin(bb)
    return j.select(
        F.col("a_n").alias("n_a"),
        F.col("b_n").alias("n_b"),
        F.round(F.col("a_my") - F.col("b_my"), 4).alias("total_gap_cents"),
        F.round(
            (F.col("a_mx") - F.col("b_mx")) * F.col("b_b"), 4
        ).alias("endowment_cents"),
        F.round(
            F.col("a_mx") * (F.col("a_b") - F.col("b_b"))
            + (
                (F.col("a_my") - F.col("a_b") * F.col("a_mx"))
                - (F.col("b_my") - F.col("b_b") * F.col("b_mx"))
            ),
            4,
        ).alias("coefficient_cents"),
    )


# ==== wave 155a: index numbers =====================================

_IDX_Y0, _IDX_Y1 = 1996, 1999


@register(
    "q_agg_fisher_index",
    oracle=f"""
        WITH py AS (
            SELECT l_partkey,
                   date_part('year', l_shipdate) AS yr,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) AS value_cents,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
            FROM lineitem
            WHERE date_part('year', l_shipdate) IN ({_IDX_Y0}, {_IDX_Y1})
            GROUP BY 1, 2
        ),
        paired AS (
            SELECT a.l_partkey,
                   a.value_cents AS v0, a.qty AS q0,
                   b.value_cents AS v1, b.qty AS q1
            FROM (SELECT * FROM py WHERE yr = {_IDX_Y0}) a
            JOIN (SELECT * FROM py WHERE yr = {_IDX_Y1}) b
              USING (l_partkey)
            WHERE a.qty > 0 AND b.qty > 0
        ),
        s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
                   CAST(SUM(v1 * q0) AS BIGINT) AS s_p1q0,
                   CAST(SUM(v0 * q1) AS BIGINT) AS s_p0q1,
                   CAST(SUM(v0 * q0) AS BIGINT) AS s_p0q0,
                   CAST(SUM(v1 * q1) AS BIGINT) AS s_p1q1
            FROM paired
        )
        SELECT n_parts,
               ROUND(CAST(s_p1q0 AS DOUBLE) / s_p0q0, 6) AS laspeyres,
               ROUND(CAST(s_p1q1 AS DOUBLE) / s_p0q1, 6) AS paasche,
               ROUND(sqrt((CAST(s_p1q0 AS DOUBLE) / s_p0q0)
                          * (CAST(s_p1q1 AS DOUBLE) / s_p0q1)), 6)
                   AS fisher
        FROM s
    """,
    section="A135",
    doc=f"Laspeyres / Paasche / Fisher price indices, {_IDX_Y0} -> "
    f"{_IDX_Y1}, over parts traded in BOTH years: with per-(part, "
    "year) unit values p = value/qty, Laspeyres weights by base-year "
    "baskets (Σp1q0/Σp0q0), Paasche by current baskets, Fisher is "
    "their geometric mean — the index-number triad of every CPI/PPI "
    "shop, and the deflator a revenue 'growth' claim should be "
    "divided by. Exactness: unit values (v/q, ragged rationals) "
    "never materialize — the indices here are defined on per-part "
    "period VALUES as the price proxy (the unit-value index "
    "convention, documented): v1·q0 / v0·q0 and v1·q1 / v0·q1, so "
    "every basket sum is an int64 product of cents x quantity "
    "(<= 1e7 * 1e5 per part — safe), "
    "one division each, sqrt IEEE. Scale: one (part, year) agg, one "
    "part-grain join, one scalar rollup.",
)
def q_agg_fisher_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    py = (
        li.where(F.year("l_shipdate").isin(_IDX_Y0, _IDX_Y1))
        .groupBy("l_partkey", F.year("l_shipdate").alias("yr"))
        .agg(
            F.expr(
                "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 "
                "AS BIGINT)"
            ).alias("value_cents"),
            F.sum(F.col("l_quantity").cast("bigint"))
            .cast("bigint")
            .alias("qty"),
        )
    )
    a = py.where(F.col("yr") == _IDX_Y0).select(
        "l_partkey",
        F.col("value_cents").alias("v0"),
        F.col("qty").alias("q0"),
    )
    b = py.where(F.col("yr") == _IDX_Y1).select(
        "l_partkey",
        F.col("value_cents").alias("v1"),
        F.col("qty").alias("q1"),
    )
    paired = a.join(b, "l_partkey").where(
        (F.col("q0") > 0) & (F.col("q1") > 0)
    )
    s = paired.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.sum(F.col("v1") * F.col("q0")).cast("bigint").alias("s_p1q0"),
        F.sum(F.col("v0") * F.col("q1")).cast("bigint").alias("s_p0q1"),
        F.sum(F.col("v0") * F.col("q0")).cast("bigint").alias("s_p0q0"),
        F.sum(F.col("v1") * F.col("q1")).cast("bigint").alias("s_p1q1"),
    )
    lasp = F.col("s_p1q0").cast("double") / F.col("s_p0q0")
    paas = F.col("s_p1q1").cast("double") / F.col("s_p0q1")
    return s.select(
        "n_parts",
        F.round(lasp, 6).alias("laspeyres"),
        F.round(paas, 6).alias("paasche"),
        F.round(F.sqrt(lasp * paas), 6).alias("fisher"),
    )


# ==== wave 156: mediation and inequality decomposition =============


@register(
    "q_agg_mediation",
    oracle="""
        WITH pts AS (
            SELECT CAST(substring(o.o_orderpriority, 1, 1) AS BIGINT) AS z,
                   CAST(date_diff('day', o.o_orderdate, MAX(l.l_shipdate))
                        AS BIGINT) AS m,
                   CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS y
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate,
                     o.o_totalprice
            HAVING MAX(l.l_shipdate) >= o.o_orderdate
        ),
        mo AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(z) AS BIGINT) AS sz,
                   CAST(SUM(m) AS BIGINT) AS sm,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(z * z) AS BIGINT) AS szz,
                   CAST(SUM(z * m) AS BIGINT) AS szm,
                   CAST(SUM(z * y) AS BIGINT) AS szy,
                   CAST(SUM(m * m) AS BIGINT) AS smm,
                   CAST(SUM(m * y) AS BIGINT) AS smy
            FROM pts
        ),
        c AS (
            SELECT n,
                   CAST(n AS DOUBLE) * szz
                       - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE) AS czz,
                   CAST(n AS DOUBLE) * szm
                       - CAST(sz AS DOUBLE) * CAST(sm AS DOUBLE) AS czm,
                   CAST(n AS DOUBLE) * szy
                       - CAST(sz AS DOUBLE) * CAST(sy AS DOUBLE) AS czy,
                   CAST(n AS DOUBLE) * smm
                       - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE) AS cmm,
                   CAST(n AS DOUBLE) * smy
                       - CAST(sm AS DOUBLE) * CAST(sy AS DOUBLE) AS cmy
            FROM mo
        )
        SELECT n,
               ROUND(czm / czz, 6) AS a_path,
               ROUND((czz * cmy - czm * czy) / (czz * cmm - czm * czm), 6)
                   AS b_path,
               ROUND(czy / czz, 6) AS total_effect,
               ROUND((czm / czz)
                     * ((czz * cmy - czm * czy)
                        / (czz * cmm - czm * czm)), 6) AS indirect_effect,
               ROUND((czm / czz)
                     * ((czz * cmy - czm * czy)
                        / (czz * cmm - czm * czm))
                     / (czy / czz), 6) AS prop_mediated
        FROM c
    """,
    section="A136",
    doc="Mediation analysis (product-of-coefficients) on the A133 "
    "triple: how much of priority's effect on order value flows "
    "THROUGH fulfillment delay? a = slope(delay ~ priority), b = "
    "delay's partial coefficient in value ~ priority + delay (the "
    "two-regressor closed form via centered co-moments — no matrix "
    "solve), indirect = a*b, and the proportion mediated against the "
    "total effect; the identity total = direct + indirect holds by "
    "OLS algebra, making the row self-checking. Completes the "
    "causal-mechanism axis the toolkit lacked: A133 asks 'is the "
    "effect real', this asks 'through WHAT does it act'. All "
    "co-moments are exact int64; every path is a pinned IEEE ratio. "
    "Scale: one order-grain agg + one 9-scalar moment agg (shared "
    "shape with A133 — AQE reuses the exchange when both run).",
)
def q_agg_mediation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pts = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy(
            "o_orderkey", "o_orderpriority", "o_orderdate", "o_totalprice"
        )
        .agg(F.max("l_shipdate").alias("dep"))
        .where(F.col("dep") >= F.col("o_orderdate"))
        .select(
            F.substring("o_orderpriority", 1, 1).cast("bigint").alias("z"),
            F.datediff("dep", "o_orderdate").cast("bigint").alias("m"),
            F.expr(
                "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            ).alias("y"),
        )
    )
    mo = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("z").cast("bigint").alias("sz"),
        F.sum("m").cast("bigint").alias("sm"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("z") * F.col("z")).cast("bigint").alias("szz"),
        F.sum(F.col("z") * F.col("m")).cast("bigint").alias("szm"),
        F.sum(F.col("z") * F.col("y")).cast("bigint").alias("szy"),
        F.sum(F.col("m") * F.col("m")).cast("bigint").alias("smm"),
        F.sum(F.col("m") * F.col("y")).cast("bigint").alias("smy"),
    )
    nd = F.col("n").cast("double")

    def cm(sab, sa, sb):
        return nd * F.col(sab) - F.col(sa).cast("double") * F.col(
            sb
        ).cast("double")

    czz = cm("szz", "sz", "sz")
    czm = cm("szm", "sz", "sm")
    czy = cm("szy", "sz", "sy")
    cmm = cm("smm", "sm", "sm")
    cmy = cm("smy", "sm", "sy")
    a = czm / czz
    b = (czz * cmy - czm * czy) / (czz * cmm - czm * czm)
    total = czy / czz
    return mo.select(
        "n",
        F.round(a, 6).alias("a_path"),
        F.round(b, 6).alias("b_path"),
        F.round(total, 6).alias("total_effect"),
        F.round(a * b, 6).alias("indirect_effect"),
        F.round(a * b / total, 6).alias("prop_mediated"),
    )


@register(
    "q_agg_theil_decomposition",
    oracle="""
        WITH v AS (
            SELECT n.n_name AS g,
                   CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS x
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS s
            FROM v
        ),
        t_total AS (
            SELECT CAST(SUM(CAST(floor(
                       (CAST(x AS DOUBLE) / (CAST(s AS DOUBLE) / n))
                       * ln(CAST(x AS DOUBLE) / (CAST(s AS DOUBLE) / n))
                       * 1e12) AS BIGINT)) AS BIGINT) AS q
            FROM v CROSS JOIN tot
        ),
        grp AS (
            SELECT g, CAST(COUNT(*) AS BIGINT) AS ng,
                   CAST(SUM(x) AS BIGINT) AS sg
            FROM v GROUP BY g
        ),
        t_between AS (
            SELECT CAST(SUM(CAST(floor(
                       (CAST(sg AS DOUBLE) / s)
                       * ln((CAST(sg AS DOUBLE) / ng)
                            / (CAST(s AS DOUBLE) / n))
                       * 1e12) AS BIGINT)) AS BIGINT) AS q
            FROM grp CROSS JOIN tot
        )
        SELECT t.n,
               ROUND(CAST(tt.q AS DOUBLE) / 1e12 / t.n, 6) AS theil_total,
               ROUND(CAST(tb.q AS DOUBLE) / 1e12, 6) AS theil_between,
               ROUND(CAST(tt.q AS DOUBLE) / 1e12 / t.n
                     - CAST(tb.q AS DOUBLE) / 1e12, 6) AS theil_within
        FROM tot t CROSS JOIN t_total tt CROSS JOIN t_between tb
    """,
    section="A137",
    doc="Theil T decomposition of order-value inequality by customer "
    "nation: T_total = T_between + T_within — the additive split that "
    "is Theil's entire reason to exist over Gini (A54's doc promises "
    "it; this delivers it): T_between asks 'are nations unequal "
    "relative to each other', T_within (reported as the exact "
    "difference, so additivity holds by construction) asks 'is "
    "inequality inside nations'. Per-row r·ln r terms and per-group "
    "share·ln(mean ratio) terms are floor(x·1e12)-quantized BEFORE "
    "their sums (A54's device), so both components are order-"
    "insensitive integer sums with one descale each. Scale: one "
    "fact pass + one 25-row group pass; dims broadcast.",
)
def q_agg_theil_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    v = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("g"),
            F.expr(
                "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            ).alias("x"),
        )
    ).localCheckpoint(eager=False)
    tot = v.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
    )
    mu = F.col("s").cast("double") / F.col("n")
    r = F.col("x").cast("double") / mu
    t_total = (
        v.crossJoin(F.broadcast(tot))
        .select(
            F.floor(r * F.log(r) * F.lit(1e12)).cast("bigint").alias("t")
        )
        .agg(F.sum("t").cast("bigint").alias("q_total"))
    )
    grp = v.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("ng"),
        F.sum("x").cast("bigint").alias("sg"),
    )
    share = F.col("sg").cast("double") / F.col("s")
    mean_ratio = (F.col("sg").cast("double") / F.col("ng")) / (
        F.col("s").cast("double") / F.col("n")
    )
    t_between = (
        grp.crossJoin(F.broadcast(tot))
        .select(
            F.floor(share * F.log(mean_ratio) * F.lit(1e12))
            .cast("bigint")
            .alias("t")
        )
        .agg(F.sum("t").cast("bigint").alias("q_between"))
    )
    out = (
        tot.crossJoin(F.broadcast(t_total))
        .crossJoin(F.broadcast(t_between))
    )
    tt = F.col("q_total").cast("double") / F.lit(1e12) / F.col("n")
    tb = F.col("q_between").cast("double") / F.lit(1e12)
    return out.select(
        "n",
        F.round(tt, 6).alias("theil_total"),
        F.round(tb, 6).alias("theil_between"),
        F.round(tt - tb, 6).alias("theil_within"),
    )


# ==== wave 158: uplift evaluation, social choice ===================


@register(
    "q_agg_qini_curve",
    oracle="""
        WITH pts AS (
            SELECT CASE WHEN CAST(('0x' || substr(md5(
                            CAST(event_id AS VARCHAR)), 1, 12)) AS BIGINT)
                        % 2 = 0 THEN 1 ELSE 0 END AS treat,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                       AS resp,
                   CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
                       AS score,
                   event_id
            FROM events
        ),
        ranked AS (
            SELECT treat, resp,
                   NTILE(10) OVER (ORDER BY score DESC, event_id)
                       AS decile
            FROM pts
        ),
        cells AS (
            SELECT decile,
                   CAST(SUM(treat) AS BIGINT) AS nt,
                   CAST(SUM(1 - treat) AS BIGINT) AS nc,
                   CAST(SUM(treat * resp) AS BIGINT) AS rt,
                   CAST(SUM((1 - treat) * resp) AS BIGINT) AS rc
            FROM ranked GROUP BY decile
        ),
        cum AS (
            SELECT decile,
                   SUM(nt) OVER w AS cnt, SUM(nc) OVER w AS cnc,
                   SUM(rt) OVER w AS crt, SUM(rc) OVER w AS crc
            FROM cells
            WINDOW w AS (ORDER BY decile
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        )
        SELECT CAST(decile AS BIGINT) AS decile,
               CAST(cnt AS BIGINT) AS cum_treated,
               CAST(cnc AS BIGINT) AS cum_control,
               CAST(crt AS BIGINT) AS cum_treated_resp,
               CAST(crc AS BIGINT) AS cum_control_resp,
               ROUND(crt - CAST(crc AS DOUBLE) * cnt / cnc, 4)
                   AS qini_uplift
        FROM cum
    """,
    section="A138",
    doc="Qini curve by score decile: events split into a reproducible "
    "hash-half 'treatment' and control, ranked by the value score, "
    "and at each cumulative decile the Qini uplift crt - crc·(nt/nc) "
    "— incremental responses the targeting captured beyond the "
    "control baseline at the same depth. THE evaluation curve for "
    "uplift/targeting models, which A119's average precision cannot "
    "replace (AP scores response prediction; Qini scores INCREMENTAL "
    "response — a model can ace one and fail the other). Decile "
    "assignment is NTILE under a fully tie-broken (score, event_id) "
    "order; all masses are integer; the control-scaling term is one "
    "pinned double per row. Scale: one decile agg + a 10-row "
    "cumulative window.",
)
def q_agg_qini_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        (
            F.expr(
                "cast(conv(substr(md5(cast(event_id as string)), 1, 12), "
                "16, 10) as bigint)"
            )
            % 2
            == 0
        )
        .cast("int")
        .alias("treat"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "resp"
        ),
        F.expr(
            "CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)"
        ).alias("score"),
        "event_id",
    )
    # Scale note (r6): NTILE(10) over a global order single-tasks the
    # corpus; compute it arithmetically from the distributed global row
    # number instead.
    from ai_to_cvent_etl_spark.operators.ranking import (
        global_row_number,
        ntile_from_rn,
    )

    npts = pts.agg(F.count(F.lit(1)).alias("__n"))
    ranked = (
        global_row_number(
            pts, [F.col("score").desc(), F.col("event_id")], out_col="_grn"
        )
        .crossJoin(F.broadcast(npts))
        .select(
            "treat",
            "resp",
            ntile_from_rn(F.col("_grn"), F.col("__n"), 10)
            .cast("int")
            .alias("decile"),
        )
    )
    cells = ranked.groupBy("decile").agg(
        F.sum("treat").cast("bigint").alias("nt"),
        F.sum(1 - F.col("treat")).cast("bigint").alias("nc"),
        F.sum(F.col("treat") * F.col("resp")).cast("bigint").alias("rt"),
        F.sum((1 - F.col("treat")) * F.col("resp"))
        .cast("bigint")
        .alias("rc"),
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    cum = cells.select(
        "decile",
        F.sum("nt").over(w).alias("cnt"),
        F.sum("nc").over(w).alias("cnc"),
        F.sum("rt").over(w).alias("crt"),
        F.sum("rc").over(w).alias("crc"),
    )
    return cum.select(
        F.col("decile").cast("bigint").alias("decile"),
        F.col("cnt").cast("bigint").alias("cum_treated"),
        F.col("cnc").cast("bigint").alias("cum_control"),
        F.col("crt").cast("bigint").alias("cum_treated_resp"),
        F.col("crc").cast("bigint").alias("cum_control_resp"),
        F.round(
            F.col("crt")
            - F.col("crc").cast("double") * F.col("cnt") / F.col("cnc"),
            4,
        ).alias("qini_uplift"),
    )


@register(
    "q_agg_borda_copeland",
    oracle="""
        WITH monthly AS (
            SELECT n.n_name AS nation,
                   (date_part('year', o.o_orderdate) - 1995) * 12
                   + date_part('month', o.o_orderdate) - 1 AS m,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) AS cents
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1, 2
        ),
        ranked AS (
            SELECT nation, m,
                   CAST(COUNT(*) OVER (PARTITION BY m) AS BIGINT) AS k,
                   CAST(RANK() OVER (PARTITION BY m
                                     ORDER BY cents DESC, nation)
                        AS BIGINT) AS r
            FROM monthly
        ),
        borda AS (
            SELECT nation,
                   CAST(SUM(k - r) AS BIGINT) AS borda_score,
                   CAST(COUNT(*) AS BIGINT) AS n_months
            FROM ranked GROUP BY nation
        ),
        duels AS (
            SELECT a.nation AS na, b.nation AS nb,
                   CAST(SUM(CASE WHEN a.cents > b.cents THEN 1
                                 WHEN a.cents < b.cents THEN -1
                                 ELSE 0 END) AS BIGINT) AS net
            FROM monthly a JOIN monthly b
              ON a.m = b.m AND a.nation < b.nation
            GROUP BY 1, 2
        ),
        copeland AS (
            SELECT nation, CAST(SUM(pts) AS BIGINT) AS copeland_score
            FROM (
                SELECT na AS nation,
                       CASE WHEN net > 0 THEN 2 WHEN net = 0 THEN 1
                            ELSE 0 END AS pts
                FROM duels
                UNION ALL
                SELECT nb,
                       CASE WHEN net < 0 THEN 2 WHEN net = 0 THEN 1
                            ELSE 0 END
                FROM duels
            ) GROUP BY nation
        )
        SELECT b.nation, b.n_months, b.borda_score, c.copeland_score
        FROM borda b JOIN copeland c USING (nation)
    """,
    section="A139",
    doc="Social-choice league table over nations: each month is a "
    "'voter' ranking nations by revenue — Borda score (k - rank "
    "summed across months; positional consensus) and Copeland score "
    "(2 points per pairwise head-to-head majority across months, 1 "
    "per exact tie; majority consensus). The two aggregation rules "
    "disagree precisely when a nation is consistently mid-table vs "
    "spiky — which is why ranking-aggregation literature keeps both; "
    "A73's D'Hondt is the seat-allocation member of this family. "
    "Month-ranks carry full (cents DESC, nation) tie-breaks; duels "
    "compare exact cents per month with the doubled-points device "
    "keeping ties integer. Scale: ranks are per-month windows on the "
    "(nation x month) grain; duels join the same grain on m — both "
    "calendar-bounded, never fact-sized.",
)
def q_agg_borda_copeland(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    mo = (F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate") - 1
    monthly = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), mo.alias("m"))
        .agg(
            F.expr(
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 "
                "AS BIGINT)"
            ).alias("cents")
        )
    ).localCheckpoint(eager=False)
    wm = Window.partitionBy("m")
    ranked = monthly.select(
        "nation",
        "m",
        F.count(F.lit(1)).over(wm).cast("bigint").alias("k"),
        F.rank()
        .over(wm.orderBy(F.col("cents").desc(), F.col("nation")))
        .cast("bigint")
        .alias("r"),
    )
    borda = ranked.groupBy("nation").agg(
        F.sum(F.col("k") - F.col("r")).cast("bigint").alias("borda_score"),
        F.count(F.lit(1)).cast("bigint").alias("n_months"),
    )
    a = monthly.select(
        F.col("nation").alias("na"), "m", F.col("cents").alias("ca")
    )
    b = monthly.select(
        F.col("nation").alias("nb"),
        F.col("m").alias("m2"),
        F.col("cents").alias("cb"),
    )
    duels = (
        a.join(b, (F.col("m") == F.col("m2")) & (F.col("na") < F.col("nb")))
        .groupBy("na", "nb")
        .agg(
            F.sum(
                F.when(F.col("ca") > F.col("cb"), 1)
                .when(F.col("ca") < F.col("cb"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("net")
        )
    )
    pts_a = duels.select(
        F.col("na").alias("nation"),
        F.when(F.col("net") > 0, 2)
        .when(F.col("net") == 0, 1)
        .otherwise(0)
        .alias("pts"),
    )
    pts_b = duels.select(
        F.col("nb").alias("nation"),
        F.when(F.col("net") < 0, 2)
        .when(F.col("net") == 0, 1)
        .otherwise(0)
        .alias("pts"),
    )
    copeland = (
        pts_a.unionByName(pts_b)
        .groupBy("nation")
        .agg(F.sum("pts").cast("bigint").alias("copeland_score"))
    )
    return borda.join(copeland, "nation").select(
        "nation", "n_months", "borda_score", "copeland_score"
    )


# ==== wave 159: standardized ratios, credibility shrinkage =========


@register(
    "q_agg_smr",
    oracle="""
        WITH pts AS (
            SELECT n.n_name AS nation,
                   CAST((l.l_quantity - 1) AS BIGINT) // 10 AS stratum,
                   CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS ev
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
        ),
        ref AS (
            SELECT stratum,
                   CAST(SUM(ev) AS BIGINT) AS r_s,
                   CAST(COUNT(*) AS BIGINT) AS n_s
            FROM pts GROUP BY stratum
        ),
        cell AS (
            SELECT nation, stratum,
                   CAST(COUNT(*) AS BIGINT) AS n_ns,
                   CAST(SUM(ev) AS BIGINT) AS o_ns
            FROM pts GROUP BY nation, stratum
        ),
        agg AS (
            SELECT c.nation,
                   CAST(SUM(c.o_ns) AS BIGINT) AS observed,
                   CAST(SUM(c.n_ns) AS BIGINT) AS exposure,
                   CAST(SUM(CAST(floor(CAST(c.n_ns AS DOUBLE) * r.r_s
                                       / r.n_s * 1e6) AS BIGINT))
                        AS BIGINT) AS expected_q6
            FROM cell c JOIN ref r USING (stratum)
            GROUP BY c.nation
        )
        SELECT nation, exposure, observed,
               ROUND(CAST(expected_q6 AS DOUBLE) / 1e6, 4) AS expected,
               ROUND(CAST(observed AS DOUBLE) * 1e6 / expected_q6, 6)
                   AS smr
        FROM agg
    """,
    section="A140",
    doc="Standardized morbidity/return ratio per nation (indirect "
    "standardization): expected returns = each nation's quantity-band "
    "exposure times the CORPUS-WIDE band return rate, SMR = observed/"
    "expected — the case-mix-adjusted league table that raw return "
    "rates get wrong when nations ship different quantity profiles "
    "(A45's Mantel-Haenszel tests the adjusted association; SMR "
    "REPORTS the adjusted burden per group, which is what ops teams "
    "rank by). The per-cell expected term n_ns·r_s/n_s is a ragged "
    "rational, floor(x·1e6)-quantized BEFORE the per-nation sum "
    "(int64, order-insensitive); the SMR division runs on the "
    "quantized integer so no boundary rides a float. Scale: one "
    "(nation, band) agg + a broadcast 5-row reference-rate table.",
)
def q_agg_smr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    pts = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.expr("CAST((l_quantity - 1) AS BIGINT) DIV 10").alias(
                "stratum"
            ),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("ev"),
        )
    )
    ref = pts.groupBy("stratum").agg(
        F.sum("ev").cast("bigint").alias("r_s"),
        F.count(F.lit(1)).cast("bigint").alias("n_s"),
    )
    cell = pts.groupBy("nation", "stratum").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ns"),
        F.sum("ev").cast("bigint").alias("o_ns"),
    )
    agg = (
        cell.join(F.broadcast(ref), "stratum")
        .groupBy("nation")
        .agg(
            F.sum("o_ns").cast("bigint").alias("observed"),
            F.sum("n_ns").cast("bigint").alias("exposure"),
            F.sum(
                F.floor(
                    F.col("n_ns").cast("double")
                    * F.col("r_s")
                    / F.col("n_s")
                    * F.lit(1e6)
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("expected_q6"),
        )
    )
    return agg.select(
        "nation",
        "exposure",
        "observed",
        F.round(F.col("expected_q6").cast("double") / F.lit(1e6), 4).alias(
            "expected"
        ),
        F.round(
            F.col("observed").cast("double")
            * F.lit(1e6)
            / F.col("expected_q6"),
            6,
        ).alias("smr"),
    )


@register(
    "q_agg_buhlmann_credibility",
    oracle="""
        WITH v AS (
            SELECT n.n_name AS g,
                   CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS x
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
        ),
        grp AS MATERIALIZED (
            SELECT g,
                   CAST(COUNT(*) AS BIGINT) AS ng,
                   CAST(SUM(x) AS BIGINT) AS sg,
                   CAST(CAST(SUM(CAST(x AS DECIMAL(38,0))
                                 * CAST(x AS DECIMAL(38,0))) AS HUGEINT)
                        // 4294967296 AS DOUBLE) * 4294967296.0
                   + CAST(CAST(SUM(CAST(x AS DECIMAL(38,0))
                                   * CAST(x AS DECIMAL(38,0))) AS HUGEINT)
                          % 4294967296 AS DOUBLE) AS sqq
            FROM v GROUP BY g
        ),
        tot AS (
            SELECT CAST(SUM(ng) AS BIGINT) AS n,
                   CAST(SUM(sg) AS BIGINT) AS s,
                   CAST(COUNT(*) AS BIGINT) AS k
            FROM grp
        ),
        within AS (
            SELECT CAST(SUM(CAST(floor(
                       (sqq - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / ng)
                       / 1e4) AS BIGINT)) AS BIGINT) AS ssw_int,
                   CAST(SUM(ng - 1) AS BIGINT) AS dfw
            FROM grp
        ),
        between_ AS (
            SELECT CAST(SUM(CAST(floor(
                       ng * (CAST(sg AS DOUBLE) / ng
                             - CAST(t.s AS DOUBLE) / t.n)
                          * (CAST(sg AS DOUBLE) / ng
                             - CAST(t.s AS DOUBLE) / t.n) / 1e4)
                       AS BIGINT)) AS BIGINT) AS ssb_int
            FROM grp CROSS JOIN tot t
        )
        SELECT g.g AS nation, g.ng AS n_orders,
               ROUND(CAST(g.sg AS DOUBLE) / g.ng, 4) AS raw_mean_cents,
               ROUND(CAST(g.ng AS DOUBLE)
                     / (g.ng + (CAST(w.ssw_int AS DOUBLE) / w.dfw)
                        / ((CAST(b.ssb_int AS DOUBLE) / (t.k - 1)
                            - (CAST(w.ssw_int AS DOUBLE) / w.dfw)
                              * 1.0)
                           / (CAST(t.n AS DOUBLE) / t.k))), 6)
                   AS credibility_z,
               ROUND(CAST(g.ng AS DOUBLE)
                     / (g.ng + (CAST(w.ssw_int AS DOUBLE) / w.dfw)
                        / ((CAST(b.ssb_int AS DOUBLE) / (t.k - 1)
                            - (CAST(w.ssw_int AS DOUBLE) / w.dfw)
                              * 1.0)
                           / (CAST(t.n AS DOUBLE) / t.k)))
                     * (CAST(g.sg AS DOUBLE) / g.ng)
                     + (1 - CAST(g.ng AS DOUBLE)
                          / (g.ng + (CAST(w.ssw_int AS DOUBLE) / w.dfw)
                             / ((CAST(b.ssb_int AS DOUBLE) / (t.k - 1)
                                 - (CAST(w.ssw_int AS DOUBLE) / w.dfw)
                                   * 1.0)
                                / (CAST(t.n AS DOUBLE) / t.k))))
                       * (CAST(t.s AS DOUBLE) / t.n), 4)
                   AS credibility_premium_cents
        FROM grp g CROSS JOIN tot t CROSS JOIN within w
        CROSS JOIN between_ b
    """,
    section="A141",
    doc="Bühlmann credibility premiums per nation: Z_i = n_i/(n_i + "
    "K) with K = (within-group variance) / (between-group variance "
    "of means), premium = Z·own mean + (1-Z)·collective mean — the "
    "actuarial shrinkage estimator (the A112 chain-ladder's "
    "rate-setting sibling, and the principled version of 'small "
    "nations borrow strength from the book'). Method-of-moments K "
    "from the one-way ANOVA decomposition: within SS per group and "
    "weighted between SS are computed from exact moments (x^2 via "
    "the hi/lo device), each floor-quantized to integer 1e4-cents^2 "
    "units before the cross-group sums (cents^2 alone overflows "
    "int64 at sf0.1 — the common 1e-4 scale cancels in K) so both "
    "variance components are "
    "order-insensitive; all ratios are pinned IEEE. Scale: one "
    "group-moment agg + scalar rollups; dims broadcast.",
)
def q_agg_buhlmann_credibility(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    v = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("g"),
            F.expr(
                "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            ).alias("x"),
        )
    )
    grp = (
        v.groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("ng"),
            F.sum("x").cast("bigint").alias("sg"),
            F.sum(
                F.col("x").cast(DecimalType(38, 0))
                * F.col("x").cast(DecimalType(38, 0))
            ).alias("sqqd"),
        )
        .withColumn(
            "sqq",
            F.expr(
                "cast(sqqd div 4294967296 as double) * 4294967296.0d"
                " + cast(sqqd % 4294967296 as double)"
            ),
        )
        .localCheckpoint(eager=False)
    )
    tot = grp.agg(
        F.sum("ng").cast("bigint").alias("n"),
        F.sum("sg").cast("bigint").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    within = grp.agg(
        F.sum(
            F.floor(
                (
                    F.col("sqq")
                    - F.col("sg").cast("double")
                    * F.col("sg").cast("double")
                    / F.col("ng")
                )
                / F.lit(1e4)
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("ssw_int"),
        F.sum(F.col("ng") - 1).cast("bigint").alias("dfw"),
    )
    between = (
        grp.crossJoin(F.broadcast(tot))
        .select(
            F.floor(
                F.col("ng")
                * (
                    F.col("sg").cast("double") / F.col("ng")
                    - F.col("s").cast("double") / F.col("n")
                )
                * (
                    F.col("sg").cast("double") / F.col("ng")
                    - F.col("s").cast("double") / F.col("n")
                )
                / F.lit(1e4)
            )
            .cast("bigint")
            .alias("t")
        )
        .agg(F.sum("t").cast("bigint").alias("ssb_int"))
    )
    j = (
        grp.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(within))
        .crossJoin(F.broadcast(between))
    )
    s2w = F.col("ssw_int").cast("double") / F.col("dfw")
    var_means = (
        F.col("ssb_int").cast("double") / (F.col("k") - 1) - s2w * F.lit(1.0)
    ) / (F.col("n").cast("double") / F.col("k"))
    kk = s2w / var_means
    z = F.col("ng").cast("double") / (F.col("ng") + kk)
    own = F.col("sg").cast("double") / F.col("ng")
    grand = F.col("s").cast("double") / F.col("n")
    return j.select(
        F.col("g").alias("nation"),
        F.col("ng").alias("n_orders"),
        F.round(own, 4).alias("raw_mean_cents"),
        F.round(z, 6).alias("credibility_z"),
        F.round(z * own + (1 - z) * grand, 4).alias(
            "credibility_premium_cents"
        ),
    )


# ==== wave 162b: cooperative cost allocation =======================


@register(
    "q_agg_airport_shapley",
    oracle="""
        WITH demand AS (
            SELECT r.r_name AS region,
                   CAST(MAX(mc) AS BIGINT) AS peak_cents
            FROM (
                SELECT c.c_nationkey,
                       (date_part('year', o.o_orderdate) - 1995) * 12
                       + date_part('month', o.o_orderdate) - 1 AS m,
                       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))
                            * 100 AS BIGINT) AS mc
                FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                GROUP BY 1, 2
            ) x
            JOIN nation n ON x.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY r.r_name
        ),
        ranked AS (
            SELECT region, peak_cents,
                   CAST(ROW_NUMBER() OVER (ORDER BY peak_cents, region)
                        AS BIGINT) AS j,
                   CAST(COUNT(*) OVER () AS BIGINT) AS k,
                   CAST(COALESCE(LAG(peak_cents) OVER (
                       ORDER BY peak_cents, region), 0) AS BIGINT) AS prev
            FROM demand
        ),
        phi AS (
            SELECT region, peak_cents, j, k,
                   CAST(SUM((peak_cents - prev) * 60 / (k - j + 1))
                        OVER (ORDER BY j
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS BIGINT) AS phi60
            FROM ranked
        )
        SELECT region, peak_cents,
               ROUND(CAST(phi60 AS DOUBLE) / 60, 4) AS shapley_cents,
               ROUND(CAST(phi60 AS DOUBLE) / 60
                     / (SELECT MAX(peak_cents) FROM demand), 6)
                   AS cost_share
        FROM phi
    """,
    section="A142",
    doc="Airport-game Shapley cost allocation across the five regions: "
    "the shared 'runway' is capacity sized to the LARGEST region's "
    "peak monthly revenue, and each region's fair share of that "
    "capacity cost is the Shapley value — which for max-type cost "
    "functions has the exact closed form phi_i = sum_(j<=i) "
    "(d_j - d_(j-1))/(n-j+1) over ascending demands (each increment "
    "is split equally among everyone who needs it): the canonical "
    "cooperative-game allocation, complementing A44's Hamilton "
    "largest-remainder (proportional) with the marginal-contribution "
    "principle, and A106's Shapley-R2 (regression attribution) with "
    "the cost-sharing original. Determinism: increments x 60 are "
    "divisible by every denominator 1..5 (the G12 LCM device), so "
    "phi60 is an exact integer cumulative; efficiency (sum phi = "
    "max demand) holds by telescoping — self-checking. Scale: 5-row "
    "game after one (nation, month) agg.",
)
def q_agg_airport_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    mo = (F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate") - 1
    natmonth = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_nationkey", mo.alias("m"))
        .agg(
            F.expr(
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 "
                "AS BIGINT)"
            ).alias("mc")
        )
    )
    demand = (
        natmonth.join(
            F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"))
        .agg(F.max("mc").cast("bigint").alias("peak_cents"))
    )
    wr = Window.orderBy("peak_cents", "region")
    wall = Window.partitionBy()
    ranked = demand.select(
        "region",
        "peak_cents",
        F.row_number().over(wr).cast("bigint").alias("j"),
        F.count(F.lit(1)).over(wall).cast("bigint").alias("k"),
        F.coalesce(F.lag("peak_cents").over(wr), F.lit(0))
        .cast("bigint")
        .alias("prev"),
    )
    wcum = Window.orderBy("j").rowsBetween(Window.unboundedPreceding, 0)
    phi = ranked.select(
        "region",
        "peak_cents",
        F.sum(
            (F.col("peak_cents") - F.col("prev"))
            * 60
            / (F.col("k") - F.col("j") + 1)
        )
        .over(wcum)
        .cast("bigint")
        .alias("phi60"),
    )
    mx = demand.agg(F.max("peak_cents").alias("max_demand"))
    return phi.crossJoin(F.broadcast(mx)).select(
        "region",
        "peak_cents",
        F.round(F.col("phi60").cast("double") / 60, 4).alias(
            "shapley_cents"
        ),
        F.round(
            F.col("phi60").cast("double") / 60 / F.col("max_demand"), 6
        ).alias("cost_share"),
    )


# ==== wave 164a: newsvendor critical-ratio stocking =================


@register(
    "q_agg_newsvendor",
    oracle="""
        WITH daily AS (
            SELECT p.p_brand AS brand,
                   CAST(l.l_shipdate AS DATE) AS d,
                   CAST(SUM(CAST(floor(l.l_quantity) AS BIGINT))
                        AS BIGINT) AS dem
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY 1, 2
        ),
        levels AS (
            SELECT brand, dem, CAST(COUNT(*) AS BIGINT) AS days
            FROM daily GROUP BY brand, dem
        ),
        cum AS (
            SELECT brand, dem, days,
                   SUM(days) OVER (PARTITION BY brand ORDER BY dem
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cd,
                   SUM(days) OVER (PARTITION BY brand) AS n_days
            FROM levels
        ),
        qstar AS (
            SELECT brand, CAST(MIN(n_days) AS BIGINT) AS n_days,
                   CAST(MIN(dem) AS BIGINT) AS q_star
            FROM cum WHERE 4 * cd >= 3 * n_days
            GROUP BY brand
        )
        SELECT q.brand, q.n_days, q.q_star,
               CAST(SUM(GREATEST(q.q_star - d.dem, 0)) AS BIGINT)
                   AS over_units,
               CAST(SUM(GREATEST(d.dem - q.q_star, 0)) AS BIGINT)
                   AS under_units,
               CAST(SUM(GREATEST(q.q_star - d.dem, 0))
                    + 3 * SUM(GREATEST(d.dem - q.q_star, 0)) AS BIGINT)
                   AS cost_units
        FROM qstar q JOIN daily d ON q.brand = d.brand
        GROUP BY q.brand, q.n_days, q.q_star
    """,
    section="A143",
    doc="Newsvendor critical-ratio stocking per brand: with underage "
    "cost 3 and overage cost 1 the optimal stock is the 3/4 quantile "
    "of the empirical daily-demand distribution — q* = the smallest "
    "demand level whose cumulative day count clears 4*cd >= 3*n (the "
    "A121/W38 weighted nearest-rank device, here with days as the "
    "weights), then the realized over/under unit balance and total "
    "cost of stocking q* every day. All integer (l_quantity floors "
    "to BIGINT — floor, never a bare cast: DuckDB rounds double-> "
    "BIGINT half-even while Spark truncates). Scale: one (brand, "
    "day) agg, level-grain windows per 25-brand partition, and the "
    "q* join back to daily broadcasts a 25-row table.",
)
def q_agg_newsvendor(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    daily = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("l_shipdate").cast("date").alias("d"),
        )
        .agg(
            F.sum(F.floor("l_quantity").cast("bigint"))
            .cast("bigint")
            .alias("dem")
        )
        .localCheckpoint(eager=False)
    )
    levels = daily.groupBy("brand", "dem").agg(
        F.count(F.lit(1)).cast("bigint").alias("days")
    )
    wcum = (
        Window.partitionBy("brand")
        .orderBy("dem")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("brand")
    cum = levels.select(
        "brand",
        "dem",
        F.sum("days").over(wcum).alias("cd"),
        F.sum("days").over(wall).alias("n_days"),
    )
    qstar = (
        cum.where(4 * F.col("cd") >= 3 * F.col("n_days"))
        .groupBy("brand")
        .agg(
            F.min("n_days").cast("bigint").alias("n_days"),
            F.min("dem").cast("bigint").alias("q_star"),
        )
    )
    over = F.greatest(F.col("q_star") - F.col("dem"), F.lit(0))
    under = F.greatest(F.col("dem") - F.col("q_star"), F.lit(0))
    return (
        daily.join(F.broadcast(qstar), "brand")
        .groupBy("brand", "n_days", "q_star")
        .agg(
            F.sum(over).cast("bigint").alias("over_units"),
            F.sum(under).cast("bigint").alias("under_units"),
            (F.sum(over) + 3 * F.sum(under)).cast("bigint").alias(
                "cost_units"
            ),
        )
    )


# ==== wave 164/165: SPC process-capability indices ==================


@register(
    "q_agg_process_capability",
    oracle="""
        WITH q AS (
            SELECT p.p_brand AS brand,
                   CAST(floor(l.l_quantity) AS BIGINT) AS x
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        ),
        mom AS (
            SELECT brand,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(x * x) AS BIGINT) AS sxx,
                   CAST(SUM(CASE WHEN x < 5 OR x > 45 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_oos
            FROM q GROUP BY brand
        )
        SELECT brand, n, n_oos,
               ROUND(CAST(sx AS DOUBLE) / n, 6) AS mean_qty,
               ROUND(sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                          / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))),
                     6) AS sd_qty,
               ROUND(40.0
                     / (6.0 * sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                          / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))),
                     6) AS cp,
               ROUND(LEAST(45.0 - CAST(sx AS DOUBLE) / n,
                           CAST(sx AS DOUBLE) / n - 5.0)
                     / (3.0 * sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                          / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))),
                     6) AS cpk
        FROM mom
    """,
    section="A144",
    doc="SPC process-capability indices per brand over order "
    "quantities against spec limits [5, 45]: Cp = (USL-LSL)/6s "
    "measures the process spread vs the spec band, Cpk = "
    "min(USL-mu, mu-LSL)/3s additionally penalizes de-centering — "
    "the manufacturing acceptance complement of TS16's SPC run "
    "rules (which watch the chart; this grades the process). "
    "Quantities floor to BIGINT so n/sx/sxx/n_oos are exact integer "
    "moments (sxx <= 2500 per row — far under 2^53); mean, sample "
    "sd, Cp, Cpk rebuild from one pinned IEEE expression per "
    "column (div, sub, sqrt, least are all correctly rounded). "
    "Scale: one map-side-combinable keyed agg to 25 rows; the "
    "broadcast part join is the only other shuffle input.",
)
def q_agg_process_capability(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    q = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        F.col("p_brand").alias("brand"),
        F.floor("l_quantity").cast("bigint").alias("x"),
    )
    mom = q.groupBy("brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(
            F.when((F.col("x") < 5) | (F.col("x") > 45), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_oos"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    sxxd = F.col("sxx").cast("double")
    mean = sxd / F.col("n")
    sd = F.sqrt((nd * sxxd - sxd * sxd) / (nd * (nd - F.lit(1.0))))
    return mom.select(
        "brand",
        "n",
        "n_oos",
        F.round(mean, 6).alias("mean_qty"),
        F.round(sd, 6).alias("sd_qty"),
        F.round(F.lit(40.0) / (F.lit(6.0) * sd), 6).alias("cp"),
        F.round(
            F.least(F.lit(45.0) - mean, mean - F.lit(5.0))
            / (F.lit(3.0) * sd),
            6,
        ).alias("cpk"),
    )


# ==== wave 167a: Bradley-Terry pairwise-preference ranking ==========


@register(
    "q_agg_bradley_terry",
    oracle="""
        WITH bq AS (
            SELECT l.l_orderkey AS ok, p.p_brand AS brand,
                   CAST(SUM(CAST(floor(l.l_quantity) AS BIGINT)) AS BIGINT)
                       AS q
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY 1, 2
        ),
        duels AS (
            SELECT CASE WHEN a.q > b.q THEN a.brand ELSE b.brand END AS w,
                   CASE WHEN a.q > b.q THEN b.brand ELSE a.brand END AS l
            FROM bq a JOIN bq b
              ON a.ok = b.ok AND a.brand < b.brand AND a.q <> b.q
        ),
        wins AS (
            SELECT w AS brand, CAST(COUNT(*) AS BIGINT) AS wi
            FROM duels GROUP BY w
        ),
        games AS (
            SELECT brand, CAST(SUM(c) AS BIGINT) AS ni FROM (
                SELECT w AS brand, COUNT(*) AS c FROM duels GROUP BY w
                UNION ALL
                SELECT l AS brand, COUNT(*) AS c FROM duels GROUP BY l
            ) GROUP BY brand
        ),
        nmat AS (
            SELECT brand_i, brand_j, CAST(SUM(c) AS BIGINT) AS nij FROM (
                SELECT w AS brand_i, l AS brand_j, COUNT(*) AS c
                FROM duels GROUP BY w, l
                UNION ALL
                SELECT l AS brand_i, w AS brand_j, COUNT(*) AS c
                FROM duels GROUP BY l, w
            ) GROUP BY brand_i, brand_j
        ),
        p1 AS (
            SELECT g.brand,
                   COALESCE(2.0 * w.wi, 0.0) / g.ni AS p
            FROM games g LEFT JOIN wins w ON g.brand = w.brand
        ),
        terms AS (
            SELECT m.brand_i AS brand,
                   CAST(SUM(CAST(floor(CAST(m.nij AS DOUBLE)
                                       / (pi.p + pj.p)
                                       * 1048576.0) AS BIGINT))
                        AS BIGINT) AS s
            FROM nmat m
            JOIN p1 pi ON m.brand_i = pi.brand
            JOIN p1 pj ON m.brand_j = pj.brand
            GROUP BY m.brand_i
        ),
        p2 AS (
            SELECT t.brand,
                   g.ni,
                   COALESCE(w.wi, 0) AS wi,
                   p1.p AS p_it1,
                   COALESCE(CAST(w.wi AS DOUBLE), 0.0) * 1048576.0
                       / CAST(t.s AS DOUBLE) AS p
            FROM terms t
            JOIN games g ON t.brand = g.brand
            JOIN p1 ON t.brand = p1.brand
            LEFT JOIN wins w ON t.brand = w.brand
        )
        SELECT brand, wi AS wins, ni AS n_games,
               ROUND(p_it1, 6) AS p_iter1,
               ROUND(p, 6) AS p_iter2,
               CAST(ROW_NUMBER() OVER (ORDER BY p DESC, brand) AS BIGINT)
                   AS bt_rank
        FROM p2
    """,
    section="A145",
    doc="Bradley-Terry preference strengths across brands from "
    "within-order quantity duels (brand A beats brand B when the "
    "same order carries more of A), fit with TWO unrolled MM "
    "iterations from the uniform start: iteration 1 collapses to "
    "the exact rational 2*W_i/N_i (one IEEE division), iteration "
    "2's denominator sum_j n_ij/(p_i+p_j) is order-sensitive in "
    "doubles so each term is quantized floor(term * 2^20) and "
    "summed as BIGINT — exact under any partitioning — then the "
    "strength rebuilds as W_i * 2^20 / S_i, one pinned expression "
    "per engine. Ties are excluded from wins AND games (standard "
    "BT). Scale: duels aggregate to a <=600-row directed matrix; "
    "both MM rounds are joins over that tiny broadcastable table — "
    "corpus-size work is one keyed agg + one within-order pair "
    "join bounded by brands-per-order.",
)
def q_agg_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    bq = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("brand"))
        .agg(
            F.sum(F.floor("l_quantity").cast("bigint"))
            .cast("bigint")
            .alias("q")
        )
    )
    a = bq.alias("a")
    b = bq.alias("b")
    duels = (
        a.join(
            b,
            (F.col("a.ok") == F.col("b.ok"))
            & (F.col("a.brand") < F.col("b.brand"))
            & (F.col("a.q") != F.col("b.q")),
        )
        .select(
            F.when(F.col("a.q") > F.col("b.q"), F.col("a.brand"))
            .otherwise(F.col("b.brand"))
            .alias("w"),
            F.when(F.col("a.q") > F.col("b.q"), F.col("b.brand"))
            .otherwise(F.col("a.brand"))
            .alias("l"),
        )
        .localCheckpoint(eager=False)
    )
    wins = duels.groupBy(F.col("w").alias("brand")).agg(
        F.count(F.lit(1)).cast("bigint").alias("wi")
    )
    dir_counts = duels.groupBy("w", "l").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    games = (
        dir_counts.select(F.col("w").alias("brand"), "c")
        .unionByName(dir_counts.select(F.col("l").alias("brand"), "c"))
        .groupBy("brand")
        .agg(F.sum("c").cast("bigint").alias("ni"))
    )
    nmat = (
        dir_counts.select(
            F.col("w").alias("brand_i"), F.col("l").alias("brand_j"), "c"
        )
        .unionByName(
            dir_counts.select(
                F.col("l").alias("brand_i"), F.col("w").alias("brand_j"), "c"
            )
        )
        .groupBy("brand_i", "brand_j")
        .agg(F.sum("c").cast("bigint").alias("nij"))
    )
    p1 = games.join(wins, "brand", "left").select(
        "brand",
        (
            F.coalesce(F.lit(2.0) * F.col("wi"), F.lit(0.0)) / F.col("ni")
        ).alias("p"),
    )
    terms = (
        nmat.join(
            F.broadcast(p1.select(F.col("brand").alias("brand_i"), F.col("p").alias("pi"))),
            "brand_i",
        )
        .join(
            F.broadcast(p1.select(F.col("brand").alias("brand_j"), F.col("p").alias("pj"))),
            "brand_j",
        )
        .groupBy(F.col("brand_i").alias("brand"))
        .agg(
            F.sum(
                F.floor(
                    F.col("nij").cast("double")
                    / (F.col("pi") + F.col("pj"))
                    * F.lit(1048576.0)
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("s")
        )
    )
    p2 = (
        terms.join(games, "brand")
        .join(p1.withColumnRenamed("p", "p_it1"), "brand")
        .join(wins, "brand", "left")
        .select(
            "brand",
            F.coalesce(F.col("wi"), F.lit(0)).cast("bigint").alias("wins"),
            F.col("ni").alias("n_games"),
            "p_it1",
            (
                F.coalesce(F.col("wi").cast("double"), F.lit(0.0))
                * F.lit(1048576.0)
                / F.col("s").cast("double")
            ).alias("p"),
        )
    )
    return p2.select(
        "brand",
        "wins",
        "n_games",
        F.round("p_it1", 6).alias("p_iter1"),
        F.round("p", 6).alias("p_iter2"),
        F.row_number()
        .over(Window.orderBy(F.col("p").desc(), F.col("brand")))
        .cast("bigint")
        .alias("bt_rank"),
    )


# ==== wave 168b: h-index / g-index productivity profile =============


@register(
    "q_agg_h_index",
    oracle="""
        WITH oc AS (
            SELECT n.n_name AS nation, c.c_custkey,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1, 2
        ),
        ranked AS (
            SELECT nation, n_orders,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY nation
                       ORDER BY n_orders DESC, c_custkey
                   ) AS BIGINT) AS rn,
                   CAST(SUM(n_orders) OVER (
                       PARTITION BY nation
                       ORDER BY n_orders DESC, c_custkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS cum_orders
            FROM oc
        )
        SELECT nation,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(MAX(CASE WHEN n_orders >= rn THEN rn ELSE 0 END)
                    AS BIGINT) AS h_index,
               CAST(MAX(CASE WHEN cum_orders >= rn * rn THEN rn ELSE 0 END)
                    AS BIGINT) AS g_index,
               CAST(SUM(n_orders) AS BIGINT) AS total_orders
        FROM ranked
        GROUP BY nation
    """,
    section="A146",
    doc="h-index and g-index per nation over customer order counts: "
    "h = the largest k such that k customers each placed >= k "
    "orders (the bibliometric core-productivity statistic), g = the "
    "largest g such that the top-g customers together placed >= g^2 "
    "(Egghe's tail-weighted refinement, computed from the running "
    "cumulative on the SAME descending rank) — both reduce to "
    "integer compares between a row_number and a count, fully "
    "tie-broken by (n_orders DESC, custkey). Scale: one keyed agg "
    "to customer grain, one window sort per nation, one final "
    "25-row agg; no joins beyond the broadcast dims.",
)
def q_agg_h_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    oc = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), "c_custkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
    )
    wr = Window.partitionBy("nation").orderBy(
        F.col("n_orders").desc(), F.col("c_custkey")
    )
    ranked = oc.select(
        "nation",
        "n_orders",
        F.row_number().over(wr).cast("bigint").alias("rn"),
        F.sum("n_orders")
        .over(wr.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("cum_orders"),
    )
    return ranked.groupBy("nation").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.max(
            F.when(F.col("n_orders") >= F.col("rn"), F.col("rn")).otherwise(
                F.lit(0)
            )
        )
        .cast("bigint")
        .alias("h_index"),
        F.max(
            F.when(
                F.col("cum_orders") >= F.col("rn") * F.col("rn"), F.col("rn")
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("g_index"),
        F.sum("n_orders").cast("bigint").alias("total_orders"),
    )


# ==== wave 170a: Bass diffusion model fit ===========================


@register(
    "q_agg_bass_diffusion",
    oracle="""
        WITH first_order AS (
            SELECT o_custkey,
                   MIN(CAST(o_orderdate AS DATE)) AS fd
            FROM orders GROUP BY o_custkey
        ),
        adopters AS (
            SELECT fd, CAST(COUNT(*) AS BIGINT) AS n_t
            FROM first_order GROUP BY fd
        ),
        cum AS (
            SELECT fd, n_t,
                   CAST(SUM(n_t) OVER (ORDER BY fd
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        - n_t AS BIGINT) AS x
            FROM adopters
        ),
        mom AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(x * x) AS BIGINT) AS sx2,
                   CAST(SUM(n_t) AS BIGINT) AS sy,
                   CAST(SUM(x * n_t) AS BIGINT) AS sxy,
                   CAST(CAST(SUM(CAST(x AS DECIMAL(38,0))
                                 * CAST(x AS DECIMAL(38,0))
                                 * CAST(x AS DECIMAL(38,0))) AS HUGEINT)
                        // 4294967296 AS DOUBLE) * 4294967296.0
                   + CAST(CAST(SUM(CAST(x AS DECIMAL(38,0))
                                   * CAST(x AS DECIMAL(38,0))
                                   * CAST(x AS DECIMAL(38,0))) AS HUGEINT)
                          % 4294967296 AS DOUBLE) AS sx3,
                   CAST(CAST(SUM(CAST(x AS DECIMAL(38,0))
                                 * CAST(x AS DECIMAL(38,0))
                                 * CAST(x AS DECIMAL(38,0))
                                 * CAST(x AS DECIMAL(38,0))) AS HUGEINT)
                        // 4294967296 AS DOUBLE) * 4294967296.0
                   + CAST(CAST(SUM(CAST(x AS DECIMAL(38,0))
                                   * CAST(x AS DECIMAL(38,0))
                                   * CAST(x AS DECIMAL(38,0))
                                   * CAST(x AS DECIMAL(38,0))) AS HUGEINT)
                          % 4294967296 AS DOUBLE) AS sx4,
                   CAST(CAST(SUM(CAST(x AS DECIMAL(38,0))
                                 * CAST(x AS DECIMAL(38,0))
                                 * CAST(n_t AS DECIMAL(38,0))) AS HUGEINT)
                        // 4294967296 AS DOUBLE) * 4294967296.0
                   + CAST(CAST(SUM(CAST(x AS DECIMAL(38,0))
                                   * CAST(x AS DECIMAL(38,0))
                                   * CAST(n_t AS DECIMAL(38,0))) AS HUGEINT)
                          % 4294967296 AS DOUBLE) AS sx2y
            FROM cum
        ),
        f AS (
            SELECT CAST(n AS DOUBLE) AS n, CAST(sx AS DOUBLE) AS sx,
                   CAST(sx2 AS DOUBLE) AS sx2, CAST(sy AS DOUBLE) AS sy,
                   CAST(sxy AS DOUBLE) AS sxy, sx3, sx4, sx2y,
                   n AS n_days
            FROM mom
        ),
        dets AS (
            SELECT n_days,
                   n * (sx2 * sx4 - sx3 * sx3)
                   - sx * (sx * sx4 - sx3 * sx2)
                   + sx2 * (sx * sx3 - sx2 * sx2) AS d,
                   sy * (sx2 * sx4 - sx3 * sx3)
                   - sx * (sxy * sx4 - sx3 * sx2y)
                   + sx2 * (sxy * sx3 - sx2 * sx2y) AS da,
                   n * (sxy * sx4 - sx3 * sx2y)
                   - sy * (sx * sx4 - sx3 * sx2)
                   + sx2 * (sx * sx2y - sxy * sx2) AS db,
                   n * (sx2 * sx2y - sxy * sx3)
                   - sx * (sx * sx2y - sxy * sx2)
                   + sy * (sx * sx3 - sx2 * sx2) AS dc
            FROM f
        ),
        coef AS (
            SELECT n_days, da / d AS a, db / d AS b, dc / d AS c
            FROM dets
        )
        SELECT CAST(n_days AS BIGINT) AS n_days,
               ROUND(a, 4) AS coef_a,
               ROUND(b, 8) AS coef_b,
               ROUND(c, 12) AS coef_c,
               ROUND(b * b - 4.0 * a * c, 8) AS disc,
               CASE WHEN b * b - 4.0 * a * c > 0.0 AND c < 0.0
                    THEN ROUND((-b - sqrt(b * b - 4.0 * a * c)) / (2.0 * c),
                               2)
                    ELSE NULL END AS m_hat,
               CASE WHEN b * b - 4.0 * a * c > 0.0 AND c < 0.0
                    THEN ROUND(a / ((-b - sqrt(b * b - 4.0 * a * c))
                                    / (2.0 * c)), 8)
                    ELSE NULL END AS p_hat,
               CASE WHEN b * b - 4.0 * a * c > 0.0 AND c < 0.0
                    THEN ROUND(-c * ((-b - sqrt(b * b - 4.0 * a * c))
                                     / (2.0 * c)), 8)
                    ELSE NULL END AS q_hat
        FROM coef
    """,
    section="A147",
    doc="Bass diffusion model fit over daily customer adoption (first "
    "orders): the discrete Bass equation n_t = p*m + (q-p)*N - "
    "(q/m)*N^2 is a QUADRATIC regression of new adopters on "
    "cumulative adopters, fit exactly by 3x3 normal equations solved "
    "with Cramer's rule — determinants expanded in one pinned IEEE "
    "sequence per engine. Power moments through x^4 overflow both "
    "2^53 and (at sf1) BIGINT, so x^3/x^4/x^2y accumulate in "
    "DECIMAL(38,0) and rebuild through the sign-safe hi/lo device; "
    "x/x^2/xy stay exact in plain BIGINT. Market size m, innovation "
    "p and imitation q recover from the coefficient roots only when "
    "the discriminant is positive and c < 0 (a proper S-curve) — "
    "the guard is a compare of identical doubles, so the NULL "
    "pattern matches cross-engine. Scale: customer-grain min-date "
    "agg, day-grain cumsum window, single-row moment reduce.",
)
def q_agg_bass_diffusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    first = orders.groupBy("o_custkey").agg(
        F.min(F.col("o_orderdate").cast("date")).alias("fd")
    )
    adopters = first.groupBy("fd").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_t")
    )
    wc = Window.orderBy("fd").rowsBetween(Window.unboundedPreceding, 0)
    cum = adopters.select(
        "fd",
        "n_t",
        (F.sum("n_t").over(wc) - F.col("n_t")).cast("bigint").alias("x"),
    )
    dec = DecimalType(38, 0)
    hi_lo = (
        "cast({0} div 4294967296 as double) * 4294967296.0d"
        " + cast({0} % 4294967296 as double)"
    )
    mom = cum.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sx2"),
        F.sum("n_t").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("n_t")).cast("bigint").alias("sxy"),
        F.sum(
            F.col("x").cast(dec) * F.col("x").cast(dec) * F.col("x").cast(dec)
        ).alias("sx3d"),
        F.sum(
            F.col("x").cast(dec)
            * F.col("x").cast(dec)
            * F.col("x").cast(dec)
            * F.col("x").cast(dec)
        ).alias("sx4d"),
        F.sum(
            F.col("x").cast(dec)
            * F.col("x").cast(dec)
            * F.col("n_t").cast(dec)
        ).alias("sx2yd"),
    )
    f = mom.select(
        F.col("n").alias("n_days"),
        F.col("n").cast("double").alias("nd"),
        F.col("sx").cast("double").alias("sxd"),
        F.col("sx2").cast("double").alias("sx2d"),
        F.col("sy").cast("double").alias("syd"),
        F.col("sxy").cast("double").alias("sxyd"),
        F.expr(hi_lo.format("sx3d")).alias("sx3"),
        F.expr(hi_lo.format("sx4d")).alias("sx4"),
        F.expr(hi_lo.format("sx2yd")).alias("sx2y"),
    )
    n, sx, sx2 = F.col("nd"), F.col("sxd"), F.col("sx2d")
    sy, sxy = F.col("syd"), F.col("sxyd")
    sx3, sx4, sx2y = F.col("sx3"), F.col("sx4"), F.col("sx2y")
    d = (
        n * (sx2 * sx4 - sx3 * sx3)
        - sx * (sx * sx4 - sx3 * sx2)
        + sx2 * (sx * sx3 - sx2 * sx2)
    )
    da = (
        sy * (sx2 * sx4 - sx3 * sx3)
        - sx * (sxy * sx4 - sx3 * sx2y)
        + sx2 * (sxy * sx3 - sx2 * sx2y)
    )
    db = (
        n * (sxy * sx4 - sx3 * sx2y)
        - sy * (sx * sx4 - sx3 * sx2)
        + sx2 * (sx * sx2y - sxy * sx2)
    )
    dc = (
        n * (sx2 * sx2y - sxy * sx3)
        - sx * (sx * sx2y - sxy * sx2)
        + sy * (sx * sx3 - sx2 * sx2)
    )
    coef = f.select(
        "n_days",
        (da / d).alias("a"),
        (db / d).alias("b"),
        (dc / d).alias("c"),
    )
    a, b, c = F.col("a"), F.col("b"), F.col("c")
    disc = b * b - F.lit(4.0) * a * c
    m = (-b - F.sqrt(disc)) / (F.lit(2.0) * c)
    ok = (disc > F.lit(0.0)) & (c < F.lit(0.0))
    return coef.select(
        F.col("n_days").cast("bigint").alias("n_days"),
        F.round(a, 4).alias("coef_a"),
        F.round(b, 8).alias("coef_b"),
        F.round(c, 12).alias("coef_c"),
        F.round(disc, 8).alias("disc"),
        F.when(ok, F.round(m, 2)).otherwise(F.lit(None)).alias("m_hat"),
        F.when(ok, F.round(a / m, 8)).otherwise(F.lit(None)).alias("p_hat"),
        F.when(ok, F.round(-c * m, 8)).otherwise(F.lit(None)).alias("q_hat"),
    )


# ==== wave 172a: weighted kappa (ordinal agreement) =================


@register(
    "q_agg_weighted_kappa",
    oracle="""
        WITH lat AS (
            SELECT o.o_orderkey,
                   CAST(substr(o.o_orderpriority, 1, 1) AS BIGINT) AS r1,
                   date_diff('day', CAST(o.o_orderdate AS DATE),
                             CAST(MIN(l.l_shipdate) AS DATE)) AS lat_days
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
        ),
        rated AS (
            SELECT r1,
                   CAST(NTILE(5) OVER (ORDER BY lat_days, o_orderkey)
                        AS BIGINT) AS r2
            FROM lat
        ),
        obs AS (
            SELECT r1, r2, CAST(COUNT(*) AS BIGINT) AS o
            FROM rated GROUP BY r1, r2
        ),
        marg AS (
            SELECT r1.i, r2.j, r1.ri, r2.cj
            FROM (SELECT r1 AS i, CAST(SUM(o) AS BIGINT) AS ri
                  FROM obs GROUP BY r1) r1
            CROSS JOIN (SELECT r2 AS j, CAST(SUM(o) AS BIGINT) AS cj
                        FROM obs GROUP BY r2) r2
        ),
        sums AS (
            SELECT
                (SELECT CAST(SUM(o) AS BIGINT) FROM obs) AS n,
                (SELECT CAST(SUM((r1 - r2) * (r1 - r2) * o) AS BIGINT)
                 FROM obs) AS sq_o,
                (SELECT CAST(SUM(abs(r1 - r2) * o) AS BIGINT)
                 FROM obs) AS ln_o,
                (SELECT CAST(SUM((i - j) * (i - j) * ri * cj) AS BIGINT)
                 FROM marg) AS sq_e,
                (SELECT CAST(SUM(abs(i - j) * ri * cj) AS BIGINT)
                 FROM marg) AS ln_e
        )
        SELECT n, sq_o, ln_o, sq_e, ln_e,
               ROUND(1.0 - CAST(n AS DOUBLE) * CAST(sq_o AS DOUBLE)
                     / CAST(sq_e AS DOUBLE), 8) AS qwk,
               ROUND(1.0 - CAST(n AS DOUBLE) * CAST(ln_o AS DOUBLE)
                     / CAST(ln_e AS DOUBLE), 8) AS lwk
        FROM sums
    """,
    section="A148",
    doc="Quadratic- and linear-weighted Cohen's kappa between two "
    "ordinal raters — order priority (1-5, parsed from the priority "
    "string) vs ship-latency quintile (NTILE(5) fully tie-broken on "
    "(latency, orderkey)): QWK is THE ordinal-agreement metric "
    "(every ordinal Kaggle competition scores with it) and reduces "
    "to 1 - n*sum(w*O)/sum(w*R_i*C_j), i.e. ONE double division "
    "over all-integer weighted observed/expected sums — the "
    "expected matrix never materializes beyond the 25-cell marginal "
    "cross product. Linear weights |i-j| ride along in the same "
    "pass. Scale: one order-grain agg, one global NTILE sort "
    "(latency quantization is the only total sort; at 100 TB swap "
    "NTILE for approx-quantile cut points), then 25-cell tables.",
)
def q_agg_weighted_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lat = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderpriority", "o_orderdate")
        .agg(F.min(F.col("l_shipdate").cast("date")).alias("fs"))
        .select(
            "o_orderkey",
            F.substring("o_orderpriority", 1, 1)
            .cast("bigint")
            .alias("r1"),
            F.datediff(F.col("fs"), F.col("o_orderdate").cast("date")).alias(
                "lat_days"
            ),
        )
    )
    rated = lat.select(
        "r1",
        F.ntile(5)
        .over(Window.orderBy("lat_days", "o_orderkey"))
        .cast("bigint")
        .alias("r2"),
    )
    obs = rated.groupBy("r1", "r2").agg(
        F.count(F.lit(1)).cast("bigint").alias("o")
    ).localCheckpoint(eager=False)
    ri = obs.groupBy(F.col("r1").alias("i")).agg(
        F.sum("o").cast("bigint").alias("ri")
    )
    cj = obs.groupBy(F.col("r2").alias("j")).agg(
        F.sum("o").cast("bigint").alias("cj")
    )
    # both marginals are <=5-row aggregates; broadcast so the k x k outer
    # product plans as BroadcastNestedLoopJoin, never CartesianProduct
    marg = ri.crossJoin(F.broadcast(cj))
    d = F.col("r1") - F.col("r2")
    so = obs.agg(
        F.sum("o").cast("bigint").alias("n"),
        F.sum(d * d * F.col("o")).cast("bigint").alias("sq_o"),
        F.sum(F.abs(d) * F.col("o")).cast("bigint").alias("ln_o"),
    )
    dm = F.col("i") - F.col("j")
    se = marg.agg(
        F.sum(dm * dm * F.col("ri") * F.col("cj"))
        .cast("bigint")
        .alias("sq_e"),
        F.sum(F.abs(dm) * F.col("ri") * F.col("cj"))
        .cast("bigint")
        .alias("ln_e"),
    )
    sums = so.crossJoin(F.broadcast(se))
    return sums.select(
        "n",
        "sq_o",
        "ln_o",
        "sq_e",
        "ln_e",
        F.round(
            F.lit(1.0)
            - F.col("n").cast("double")
            * F.col("sq_o").cast("double")
            / F.col("sq_e").cast("double"),
            8,
        ).alias("qwk"),
        F.round(
            F.lit(1.0)
            - F.col("n").cast("double")
            * F.col("ln_o").cast("double")
            / F.col("ln_e").cast("double"),
            8,
        ).alias("lwk"),
    )


# ==== wave 173a: James-Stein shrinkage of per-customer means ========


@register(
    "q_agg_james_stein",
    oracle="""
        WITH vals AS (
            SELECT o_custkey,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) // 100 AS v
            FROM orders
        ),
        per AS (
            SELECT o_custkey AS custkey,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(v) AS BIGINT) AS s,
                   (CAST(SUM(v) AS BIGINT) // COUNT(*)) AS mu,
                   ((CAST(SUM(v) AS BIGINT) // COUNT(*)) * SUM(v)
                    + ((CAST(SUM(v) AS BIGINT) % COUNT(*)) * SUM(v))
                      // COUNT(*)) AS w,
                   CAST(SUM(v * v) AS BIGINT) AS q,
                   1000000 // COUNT(*) AS h
            FROM vals GROUP BY o_custkey
        ),
        scal AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS k,
                   CAST(SUM(n_orders) AS BIGINT) AS n,
                   CAST(SUM(mu) AS BIGINT) AS g,
                   CAST(SUM(mu * mu) AS BIGINT) AS ssq,
                   CAST(SUM(q) - SUM(w) AS BIGINT) AS ssw,
                   CAST(SUM(h) AS BIGINT) AS hh
            FROM per
        ),
        parts AS (
            SELECT k, g,
                   CAST(g AS DOUBLE) / k AS grand,
                   CAST(ssq AS DOUBLE)
                   - CAST(g AS DOUBLE) * CAST(g AS DOUBLE) / k AS s_btw,
                   CAST(ssw AS DOUBLE) / (n - k)
                   * CAST(hh AS DOUBLE)
                   / CAST(k * 1000000 AS DOUBLE) AS vbar
            FROM scal
        ),
        shrink AS (
            SELECT grand,
                   GREATEST(0.0, 1.0 - (k - 3) * vbar / s_btw) AS c
            FROM parts
        )
        SELECT p.custkey, p.n_orders, CAST(p.mu AS BIGINT) AS mu_dollars,
               ROUND(s.grand + s.c * (CAST(p.mu AS DOUBLE) - s.grand), 4)
                   AS js_mean,
               ROUND(s.c, 6) AS shrink_c
        FROM per p CROSS JOIN shrink s
    """,
    section="A149",
    doc="James-Stein shrinkage of per-customer mean order value toward "
    "the grand mean of customer means — THE small-n estimator fix "
    "(Efron-Morris): a customer with 8 orders gets an estimate pulled "
    "toward the population, dominating the raw MLE for k>=4 groups. "
    "c = max(0, 1 - (k-3)*vbar/S) with S = sum(mu^2) - G^2/k over "
    "WHOLE-DOLLAR quantized group means (mu = s div n, exact bigint, "
    "~5e5 max, so sum(mu^2) never leaves int64 even at sf1) and "
    "vbar = pooled within-variance * mean(1e6 div n)/1e6 — the "
    "floor(s^2/n) term uses the overflow-safe split "
    "(s div n)*s + ((s mod n)*s) div n so no s^2 ever materializes. "
    "Every cross-engine double is rebuilt from exact int64 sums with "
    "one fixed expression. Scale: one groupBy(custkey) shuffle, a "
    "map-side-combinable scalar reduction over k rows, and a "
    "broadcast of ONE scalar row back onto the per-customer frame.",
)
def q_agg_james_stein(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    vals = od.select(
        "o_custkey",
        F.expr(
            "cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)"
            " div 100"
        ).alias("v"),
    )
    s = F.sum("v").cast("bigint")
    n = F.count(F.lit(1))
    per = vals.groupBy(F.col("o_custkey").alias("custkey")).agg(
        n.cast("bigint").alias("n_orders"),
        s.alias("s"),
        F.expr(
            "cast(sum(v) as bigint) div count(*)"
        ).alias("mu"),
        F.expr(
            "(cast(sum(v) as bigint) div count(*)) * sum(v)"
            " + ((cast(sum(v) as bigint) % count(*)) * sum(v))"
            "   div count(*)"
        ).alias("w"),
        F.sum(F.col("v") * F.col("v")).cast("bigint").alias("q"),
        F.expr("1000000 div count(*)").alias("h"),
    )
    scal = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n_orders").cast("bigint").alias("n"),
        F.sum("mu").cast("bigint").alias("g"),
        F.sum(F.col("mu") * F.col("mu")).cast("bigint").alias("ssq"),
        (F.sum("q") - F.sum("w")).cast("bigint").alias("ssw"),
        F.sum("h").cast("bigint").alias("hh"),
    )
    grand = F.col("g").cast("double") / F.col("k")
    s_btw = (
        F.col("ssq").cast("double")
        - F.col("g").cast("double") * F.col("g").cast("double")
        / F.col("k")
    )
    vbar = (
        F.col("ssw").cast("double") / (F.col("n") - F.col("k"))
        * F.col("hh").cast("double")
        / (F.col("k") * F.lit(1000000)).cast("double")
    )
    shrink = scal.select(
        grand.alias("grand"),
        F.greatest(
            F.lit(0.0),
            F.lit(1.0) - (F.col("k") - 3) * vbar / s_btw,
        ).alias("c"),
    )
    return per.crossJoin(F.broadcast(shrink)).select(
        "custkey",
        "n_orders",
        F.col("mu").alias("mu_dollars"),
        F.round(
            F.col("grand")
            + F.col("c") * (F.col("mu").cast("double") - F.col("grand")),
            4,
        ).alias("js_mean"),
        F.round(F.col("c"), 6).alias("shrink_c"),
    )


# ==== wave 174a: Goodman-Kruskal lambda (PRE association) ===========


@register(
    "q_agg_gk_lambda",
    oracle="""
        WITH obs AS (
            SELECT o_orderpriority AS x, o_orderstatus AS y,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM orders GROUP BY 1, 2
        ),
        rowmax AS (
            SELECT CAST(SUM(m) AS BIGINT) AS sum_rowmax
            FROM (SELECT x, MAX(c) AS m FROM obs GROUP BY x)
        ),
        colmax AS (
            SELECT CAST(SUM(m) AS BIGINT) AS sum_colmax
            FROM (SELECT y, MAX(c) AS m FROM obs GROUP BY y)
        ),
        marg AS (
            SELECT CAST(SUM(c) AS BIGINT) AS n,
                   CAST(MAX(cy) AS BIGINT) AS max_col_marg,
                   CAST(MAX(cx) AS BIGINT) AS max_row_marg
            FROM (
                SELECT c,
                       SUM(c) OVER (PARTITION BY y) AS cy,
                       SUM(c) OVER (PARTITION BY x) AS cx
                FROM obs
            )
        )
        SELECT n, sum_rowmax, sum_colmax, max_col_marg, max_row_marg,
               ROUND(CAST(sum_rowmax - max_col_marg AS DOUBLE)
                     / (n - max_col_marg), 6) AS lambda_y_given_x,
               ROUND(CAST(sum_colmax - max_row_marg AS DOUBLE)
                     / (n - max_row_marg), 6) AS lambda_x_given_y,
               ROUND(CAST(sum_rowmax + sum_colmax - max_col_marg
                          - max_row_marg AS DOUBLE)
                     / (2 * n - max_col_marg - max_row_marg), 6)
                   AS lambda_sym
        FROM marg CROSS JOIN rowmax CROSS JOIN colmax
    """,
    section="A150",
    doc="Goodman-Kruskal lambda between order priority (X, 5 levels) "
    "and order status (Y, 3 levels) — the proportional-reduction-in-"
    "error association for NOMINAL pairs, where chi-square says "
    "'dependent' but not 'how much does knowing X help predict Y': "
    "lambda_Y|X = (sum_x max_y n_xy - max_y n_+y)/(n - max_y n_+y), "
    "i.e. the fraction of modal-guess errors knowing X removes. Both "
    "directions plus the symmetric pooled form ride on the SAME "
    "15-cell contingency — every numerator/denominator is an exact "
    "int64 count, so the three metrics are one double division each. "
    "Scale: one groupBy over two low-cardinality columns (map-side "
    "combinable to 15 rows) and constant-size algebra after.",
)
def q_agg_gk_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    obs = od.groupBy(
        F.col("o_orderpriority").alias("x"),
        F.col("o_orderstatus").alias("y"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    rowmax = (
        obs.groupBy("x").agg(F.max("c").alias("m"))
        .agg(F.sum("m").cast("bigint").alias("sum_rowmax"))
    )
    colmax = (
        obs.groupBy("y").agg(F.max("c").alias("m"))
        .agg(F.sum("m").cast("bigint").alias("sum_colmax"))
    )
    cy = F.sum("c").over(Window.partitionBy("y"))
    cx = F.sum("c").over(Window.partitionBy("x"))
    marg = (
        obs.select("c", cy.alias("cy"), cx.alias("cx"))
        .agg(
            F.sum("c").cast("bigint").alias("n"),
            F.max("cy").cast("bigint").alias("max_col_marg"),
            F.max("cx").cast("bigint").alias("max_row_marg"),
        )
    )
    out = marg.crossJoin(F.broadcast(rowmax)).crossJoin(
        F.broadcast(colmax)
    )
    return out.select(
        "n",
        "sum_rowmax",
        "sum_colmax",
        "max_col_marg",
        "max_row_marg",
        F.round(
            (F.col("sum_rowmax") - F.col("max_col_marg")).cast("double")
            / (F.col("n") - F.col("max_col_marg")),
            6,
        ).alias("lambda_y_given_x"),
        F.round(
            (F.col("sum_colmax") - F.col("max_row_marg")).cast("double")
            / (F.col("n") - F.col("max_row_marg")),
            6,
        ).alias("lambda_x_given_y"),
        F.round(
            (
                F.col("sum_rowmax")
                + F.col("sum_colmax")
                - F.col("max_col_marg")
                - F.col("max_row_marg")
            ).cast("double")
            / (
                2 * F.col("n")
                - F.col("max_col_marg")
                - F.col("max_row_marg")
            ),
            6,
        ).alias("lambda_sym"),
    )


# ==== wave 175a: Krippendorff's alpha (nominal, variable raters) ====


@register(
    "q_agg_krippendorff_alpha",
    oracle="""
        WITH ratings AS (
            SELECT l_orderkey AS unit,
                   (CAST(l_quantity AS INT) - 1) // 10 AS c
            FROM lineitem
        ),
        uc AS (
            SELECT unit, c, CAST(COUNT(*) AS BIGINT) AS n_uc
            FROM ratings GROUP BY unit, c
        ),
        per_unit AS (
            SELECT unit,
                   CAST(SUM(n_uc) AS BIGINT) AS m,
                   CAST(SUM(n_uc * n_uc) AS BIGINT) AS sq
            FROM uc GROUP BY unit
            HAVING SUM(n_uc) >= 2
        ),
        do_sum AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_units,
                   CAST(SUM((60 // (m - 1)) * (m * m - sq)) AS BIGINT)
                       AS do60
            FROM per_unit
        ),
        marg AS (
            SELECT CAST(SUM(n_uc) AS BIGINT) AS n,
                   CAST(SUM(nc * nc) AS BIGINT) AS sncsq
            FROM (
                SELECT CAST(SUM(u.n_uc) AS BIGINT) AS nc,
                       CAST(SUM(u.n_uc) AS BIGINT) AS n_uc
                FROM uc u JOIN per_unit p ON p.unit = u.unit
                GROUP BY u.c
            )
        )
        SELECT d.n_units, m.n AS n_ratings, d.do60,
               ROUND(1.0 - CAST(d.do60 AS DOUBLE) * (m.n - 1)
                     / (60.0 * (m.n * m.n - m.sncsq)), 6) AS alpha,
               ROUND(CAST(d.do60 AS DOUBLE) / (60.0 * m.n), 6)
                   AS pct_disagree
        FROM do_sum d CROSS JOIN marg m
    """,
    section="A151",
    doc="Krippendorff's alpha (nominal metric, variable raters per "
    "unit) treating each order as a unit and its lineitems' quantity "
    "deciles as independent 'ratings' — THE chance-corrected "
    "agreement coefficient that, unlike Cohen/Fleiss kappa, handles "
    "2..7 raters per unit and missing raters natively via the "
    "coincidence matrix. The per-unit disagreement 60*(m^2 - "
    "sum_c n_uc^2)/(m-1) is made EXACTLY integer by the LCM device: "
    "m-1 <= 6 always divides 60, so (60 div (m-1)) * (...) never "
    "leaves int64 (same trick as the distance-2 betweenness "
    "credits). Coincidence marginals collapse to plain per-category "
    "rating counts over pairable units, so alpha = 1 - do60*(n-1) / "
    "(60*(n^2 - sum nc^2)) is ONE double division over five exact "
    "integers. Scale: two keyed aggs (unit-grain, category-grain) "
    "plus a scalar join — no pair enumeration ever happens.",
)
def q_agg_krippendorff_alpha(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ratings = li.select(
        F.col("l_orderkey").alias("unit"),
        F.expr("(CAST(l_quantity AS INT) - 1) div 10").alias("c"),
    )
    uc = ratings.groupBy("unit", "c").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_uc")
    )
    per_unit = (
        uc.groupBy("unit")
        .agg(
            F.sum("n_uc").cast("bigint").alias("m"),
            F.sum(F.col("n_uc") * F.col("n_uc"))
            .cast("bigint")
            .alias("sq"),
        )
        .where(F.col("m") >= 2)
    )
    do_sum = per_unit.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_units"),
        F.sum(
            F.expr("60 div (m - 1)")
            * (F.col("m") * F.col("m") - F.col("sq"))
        )
        .cast("bigint")
        .alias("do60"),
    )
    marg = (
        uc.join(per_unit.select("unit"), "unit")
        .groupBy("c")
        .agg(F.sum("n_uc").cast("bigint").alias("nc"))
        .agg(
            F.sum("nc").cast("bigint").alias("n"),
            F.sum(F.col("nc") * F.col("nc")).cast("bigint").alias("sncsq"),
        )
    )
    out = do_sum.crossJoin(F.broadcast(marg))
    return out.select(
        "n_units",
        F.col("n").alias("n_ratings"),
        "do60",
        F.round(
            F.lit(1.0)
            - F.col("do60").cast("double") * (F.col("n") - 1)
            / (F.lit(60.0) * (F.col("n") * F.col("n") - F.col("sncsq"))),
            6,
        ).alias("alpha"),
        F.round(
            F.col("do60").cast("double") / (F.lit(60.0) * F.col("n")), 6
        ).alias("pct_disagree"),
    )


# ==== wave 177a: covariate balance audit (SMD) ======================


@register(
    "q_agg_covariate_balance",
    oracle="""
        WITH lagg AS (
            SELECT l_orderkey,
                   CAST(COUNT(*) AS BIGINT) AS nl,
                   CAST(SUM(CAST(l_quantity AS INT)) AS BIGINT) AS sq
            FROM lineitem GROUP BY l_orderkey
        ),
        frame AS (
            SELECT CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END AS treated,
                   CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) // 100 AS dollars,
                   l.nl, l.sq
            FROM orders o JOIN lagg l ON l.l_orderkey = o.o_orderkey
        ),
        long AS (
            SELECT treated, 'dollars' AS covariate, dollars AS v
            FROM frame
            UNION ALL
            SELECT treated, 'n_lines', nl FROM frame
            UNION ALL
            SELECT treated, 'sum_qty', sq FROM frame
        ),
        mom AS (
            SELECT covariate,
                   CAST(SUM(treated) AS BIGINT) AS n1,
                   CAST(SUM(1 - treated) AS BIGINT) AS n0,
                   CAST(SUM(treated * v) AS BIGINT) AS s1,
                   CAST(SUM((1 - treated) * v) AS BIGINT) AS s0,
                   CAST(SUM(treated * v * v) AS BIGINT) AS q1,
                   CAST(SUM((1 - treated) * v * v) AS BIGINT) AS q0
            FROM long GROUP BY covariate
        ),
        stats AS (
            SELECT covariate, n1, n0,
                   CAST(s1 AS DOUBLE) / n1 AS m1,
                   CAST(s0 AS DOUBLE) / n0 AS m0,
                   (CAST(q1 AS DOUBLE)
                    - CAST(s1 AS DOUBLE) * s1 / n1) / (n1 - 1) AS v1,
                   (CAST(q0 AS DOUBLE)
                    - CAST(s0 AS DOUBLE) * s0 / n0) / (n0 - 1) AS v0
            FROM mom
        )
        SELECT covariate, n1, n0,
               ROUND(m1, 4) AS mean_t,
               ROUND(m0, 4) AS mean_c,
               ROUND((m1 - m0) / sqrt((v1 + v0) / 2.0), 6) AS smd,
               ROUND(v1 / v0, 6) AS var_ratio
        FROM stats
    """,
    section="A152",
    doc="Covariate-balance audit for the urgent/high-priority "
    "'treatment': standardized mean difference (m1-m0)/"
    "sqrt((v1+v0)/2) and variance ratio per covariate (whole-dollar "
    "total, line count, quantity sum) — THE table every "
    "observational-causal analysis prints before trusting an effect "
    "estimate (|SMD| < 0.1 is the conventional balance bar, and "
    "A71's stratified ATE / A45's CUPED assume it was checked). "
    "One-pass conditional moments per covariate: every n/s/q is an "
    "exact int64 (treated flag multiplies values, the A66 ANOVA "
    "device), means/variances rebuild with one pinned IEEE "
    "expression. Scale: lineitem pre-aggregates to order grain, the "
    "long unpivot triples rows but map-side combines into 6 "
    "integers per covariate — a constant-size reduction.",
)
def q_agg_covariate_balance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lagg = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("nl"),
        F.sum(F.col("l_quantity").cast("int"))
        .cast("bigint")
        .alias("sq"),
    )
    frame = od.join(lagg, od.o_orderkey == lagg.l_orderkey).select(
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        )
        .otherwise(0)
        .alias("treated"),
        F.expr(
            "cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)"
            " div 100"
        ).alias("dollars"),
        "nl",
        "sq",
    )
    long = frame.select(
        "treated",
        F.expr(
            "stack(3, 'dollars', dollars, 'n_lines', nl,"
            " 'sum_qty', sq) as (covariate, v)"
        ),
    )
    t = F.col("treated")
    v = F.col("v")
    mom = long.groupBy("covariate").agg(
        F.sum(t).cast("bigint").alias("n1"),
        F.sum(1 - t).cast("bigint").alias("n0"),
        F.sum(t * v).cast("bigint").alias("s1"),
        F.sum((1 - t) * v).cast("bigint").alias("s0"),
        F.sum(t * v * v).cast("bigint").alias("q1"),
        F.sum((1 - t) * v * v).cast("bigint").alias("q0"),
    )
    m1 = F.col("s1").cast("double") / F.col("n1")
    m0 = F.col("s0").cast("double") / F.col("n0")
    v1 = (
        F.col("q1").cast("double")
        - F.col("s1").cast("double") * F.col("s1") / F.col("n1")
    ) / (F.col("n1") - 1)
    v0 = (
        F.col("q0").cast("double")
        - F.col("s0").cast("double") * F.col("s0") / F.col("n0")
    ) / (F.col("n0") - 1)
    return mom.select(
        "covariate",
        "n1",
        "n0",
        F.round(m1, 4).alias("mean_t"),
        F.round(m0, 4).alias("mean_c"),
        F.round((m1 - m0) / F.sqrt((v1 + v0) / F.lit(2.0)), 6).alias(
            "smd"
        ),
        F.round(v1 / v0, 6).alias("var_ratio"),
    )


# ==== wave 179a: Cramer-von Mises two-sample test ===================


@register(
    "q_agg_cramer_von_mises",
    oracle="""
        WITH vals AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 'x' ELSE 'y' END AS grp,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS cents
            FROM orders
        ),
        ranked AS (
            SELECT grp,
                   CAST(ROW_NUMBER() OVER (ORDER BY cents, o_orderkey)
                        AS BIGINT) AS r,
                   CAST(ROW_NUMBER() OVER (PARTITION BY grp
                                           ORDER BY cents, o_orderkey)
                        AS BIGINT) AS i
            FROM vals
        ),
        sums AS (
            SELECT
                CAST(SUM(CASE WHEN grp = 'x' THEN 1 ELSE 0 END)
                     AS BIGINT) AS n,
                CAST(SUM(CASE WHEN grp = 'y' THEN 1 ELSE 0 END)
                     AS BIGINT) AS m,
                CAST(SUM(CASE WHEN grp = 'x'
                              THEN (r - i) * (r - i) ELSE 0 END)
                     AS BIGINT) AS sx,
                CAST(SUM(CASE WHEN grp = 'y'
                              THEN (r - i) * (r - i) ELSE 0 END)
                     AS BIGINT) AS sy
            FROM ranked
        ),
        u AS (
            SELECT n, m, sx, sy,
                   CAST(n AS HUGEINT) * sx + CAST(m AS HUGEINT) * sy
                       AS uu
            FROM sums
        )
        SELECT n AS n_x, m AS n_y, sx, sy,
               ROUND((CAST(uu // 4294967296 AS DOUBLE) * 4294967296.0
                      + CAST(uu % 4294967296 AS DOUBLE))
                     / (CAST(n AS DOUBLE) * m * (n + m))
                     - (4.0 * CAST(n AS DOUBLE) * m - 1.0)
                       / (6.0 * (n + m)), 6) AS t_cvm
        FROM u
    """,
    section="A153",
    doc="Cramer-von Mises two-sample statistic between urgent/high "
    "and other order totals: T = U/(nmN) - (4nm-1)/(6N) with "
    "U = n*sum_x(r_i - i)^2 + m*sum_y(s_j - j)^2 — the "
    "integrated-squared-ECDF-difference test that weights the WHOLE "
    "distribution (A36's KS sees only the single largest gap; CvM "
    "catches spread/shape differences KS misses). Combined and "
    "within-group ranks are fully tie-broken by (cents, orderkey) — "
    "deterministic on both engines and documented in place of the "
    "midrank convention — so sx/sy are exact int64; U needs "
    "int128/DECIMAL(38,0) (n*sx ~ 1e20 at sf0.1) and rebuilds "
    "through the A26 hi/lo device. Scale: two rank windows (one "
    "global sort — at 100 TB use a range-partitioned sort) and one "
    "scalar reduction.",
)
def q_agg_cramer_von_mises(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    vals = od.select(
        "o_orderkey",
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "x"
        )
        .otherwise("y")
        .alias("grp"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("cents"),
    )
    # Scale note (r6): global rank via the distributed two-pass operator;
    # the within-group rank stays a keyed (parallel) window.
    from ai_to_cvent_etl_spark.operators.ranking import global_row_number

    ranked = global_row_number(
        vals, ["cents", "o_orderkey"], out_col="r"
    ).select(
        "grp",
        "r",
        F.row_number()
        .over(Window.partitionBy("grp").orderBy("cents", "o_orderkey"))
        .cast("bigint")
        .alias("i"),
    )
    d = F.col("r") - F.col("i")
    sums = ranked.agg(
        F.sum(F.when(F.col("grp") == "x", 1).otherwise(0))
        .cast("bigint")
        .alias("n"),
        F.sum(F.when(F.col("grp") == "y", 1).otherwise(0))
        .cast("bigint")
        .alias("m"),
        F.sum(F.when(F.col("grp") == "x", d * d).otherwise(0))
        .cast("bigint")
        .alias("sx"),
        F.sum(F.when(F.col("grp") == "y", d * d).otherwise(0))
        .cast("bigint")
        .alias("sy"),
    )
    u = sums.select(
        "n",
        "m",
        "sx",
        "sy",
        (
            F.col("n").cast(DecimalType(38, 0)) * F.col("sx")
            + F.col("m").cast(DecimalType(38, 0)) * F.col("sy")
        ).alias("uu"),
    )
    hi_lo = (
        "cast(uu div 4294967296 as double) * 4294967296.0d"
        " + cast(uu % 4294967296 as double)"
    )
    nd = F.col("n").cast("double")
    return u.select(
        F.col("n").alias("n_x"),
        F.col("m").alias("n_y"),
        "sx",
        "sy",
        F.round(
            F.expr(hi_lo)
            / (nd * F.col("m") * (F.col("n") + F.col("m")))
            - (F.lit(4.0) * nd * F.col("m") - F.lit(1.0))
            / (F.lit(6.0) * (F.col("n") + F.col("m"))),
            6,
        ).alias("t_cvm"),
    )


# ==== wave 180a: Lin's concordance correlation coefficient ==========


@register(
    "q_agg_lin_ccc",
    oracle="""
        WITH pairs AS (
            SELECT CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) // 100 AS x,
                   CAST(CAST(SUM(CAST(l.l_extendedprice
                                      AS DECIMAL(18,2))) * 100
                        AS BIGINT) // 100 AS BIGINT) AS y
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderkey, o.o_totalprice
        ),
        mom AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x * x) AS BIGINT) AS sxx,
                   CAST(SUM(y * y) AS BIGINT) AS syy,
                   CAST(SUM(x * y) AS BIGINT) AS sxy
            FROM pairs
        ),
        stats AS (
            SELECT n,
                   CAST(sx AS DOUBLE) / n AS mx,
                   CAST(sy AS DOUBLE) / n AS my,
                   CAST(sxx AS DOUBLE) / n
                   - (CAST(sx AS DOUBLE) / n)
                     * (CAST(sx AS DOUBLE) / n) AS vx,
                   CAST(syy AS DOUBLE) / n
                   - (CAST(sy AS DOUBLE) / n)
                     * (CAST(sy AS DOUBLE) / n) AS vy,
                   CAST(sxy AS DOUBLE) / n
                   - (CAST(sx AS DOUBLE) / n)
                     * (CAST(sy AS DOUBLE) / n) AS cxy
            FROM mom
        )
        SELECT n,
               ROUND(mx, 4) AS mean_header,
               ROUND(my, 4) AS mean_lines,
               ROUND(2.0 * cxy
                     / (vx + vy + (mx - my) * (mx - my)), 6) AS ccc,
               ROUND(cxy / sqrt(vx * vy), 6) AS pearson_r,
               ROUND(2.0 * cxy / (vx + vy + (mx - my) * (mx - my))
                     / (cxy / sqrt(vx * vy)), 6) AS c_b
        FROM stats
    """,
    section="A154",
    doc="Lin's concordance correlation coefficient between the order "
    "header total and the sum of its line extended prices (both in "
    "whole dollars): CCC = 2*s_xy / (s_x^2 + s_y^2 + (mx-my)^2), "
    "the agreement metric that punishes BOTH scatter and location/"
    "scale shift — Pearson r (reported alongside, with the bias "
    "factor C_b = CCC/r) would call y = 2x perfect agreement; CCC "
    "does not, which is why method-comparison studies (A95 Deming, "
    "A96 Bland-Altman are its siblings) report it. Header vs line "
    "sums differ by tax/discount composition, so agreement < 1 by "
    "construction. All six moments are exact int64 one-pass sums; "
    "every double rebuilds with one pinned expression. Scale: one "
    "order-grain agg then a scalar reduction — map-side all the "
    "way.",
)
def q_agg_lin_ccc(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pairs = (
        od.join(li, li.l_orderkey == od.o_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(
            F.expr(
                "CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))"
                " * 100 AS BIGINT) div 100 AS BIGINT)"
            ).alias("y")
        )
        .select(
            F.expr(
                "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
                " AS BIGINT) div 100"
            ).alias("x"),
            "y",
        )
    )
    mom = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    mx = F.col("sx").cast("double") / F.col("n")
    my = F.col("sy").cast("double") / F.col("n")
    vx = F.col("sxx").cast("double") / F.col("n") - mx * mx
    vy = F.col("syy").cast("double") / F.col("n") - my * my
    cxy = F.col("sxy").cast("double") / F.col("n") - mx * my
    ccc = F.lit(2.0) * cxy / (vx + vy + (mx - my) * (mx - my))
    r = cxy / F.sqrt(vx * vy)
    return mom.select(
        "n",
        F.round(mx, 4).alias("mean_header"),
        F.round(my, 4).alias("mean_lines"),
        F.round(ccc, 6).alias("ccc"),
        F.round(r, 6).alias("pearson_r"),
        F.round(ccc / r, 6).alias("c_b"),
    )


# ==== wave 181a: Quade test (weighted rank blocked ANOVA) ===========


@register(
    "q_agg_quade",
    oracle="""
        WITH cells AS (
            SELECT n.n_name AS blk, o.o_orderpriority AS trt,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) AS v
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1, 2
        ),
        full_blocks AS (
            SELECT blk FROM cells GROUP BY blk HAVING COUNT(*) = 5
        ),
        ranked AS (
            SELECT c.blk, c.trt, c.v,
                   CAST(RANK() OVER (PARTITION BY c.blk
                                     ORDER BY c.v, c.trt) AS BIGINT)
                       AS r,
                   CAST(MAX(c.v) OVER (PARTITION BY c.blk)
                        - MIN(c.v) OVER (PARTITION BY c.blk)
                        AS BIGINT) AS rng
            FROM cells c JOIN full_blocks f ON f.blk = c.blk
        ),
        weighted AS (
            SELECT blk, trt,
                   CAST(DENSE_RANK() OVER (ORDER BY rng, blk)
                        AS BIGINT) * (r - 3) AS s
            FROM ranked
        ),
        tj AS (
            SELECT trt, CAST(SUM(s) AS BIGINT) AS t
            FROM weighted GROUP BY trt
        ),
        scal AS (
            SELECT
                (SELECT CAST(COUNT(*) AS BIGINT) FROM full_blocks) AS b,
                (SELECT CAST(COUNT(*) AS BIGINT) FROM tj) AS k,
                (SELECT CAST(SUM(s * s) AS BIGINT) FROM weighted)
                    AS a_stat,
                (SELECT CAST(SUM(t * t) AS BIGINT) FROM tj) AS sum_tj2
        )
        SELECT b, k, a_stat, sum_tj2,
               ROUND((b - 1.0) * sum_tj2
                     / (CAST(b AS DOUBLE) * a_stat - sum_tj2), 6)
                   AS f_quade
        FROM scal
    """,
    section="A155",
    doc="Quade test across the 5 priority 'treatments' blocked by "
    "nation (25 complete blocks of revenue cells): Friedman's "
    "blocked rank test (A65 sibling) weights every block equally — "
    "Quade weights blocks by the DENSE_RANK of their within-block "
    "range, so nations where priority actually moves revenue count "
    "more; with k=5, (k+1)/2 = 3 keeps S = Q*(r-3) exactly integer "
    "(no half-rank doubling needed). Ranks are fully tie-broken "
    "((v, trt) within block, (range, blk) across blocks) and "
    "incomplete blocks are excluded by an explicit COUNT(*)=5 gate, "
    "so A and sum(T_j^2) are exact int64 and F = (b-1)B/(bA - B) is "
    "one double expression. Scale: one (nation, priority) agg, two "
    "block-partition windows, 125-cell algebra after.",
)
def q_agg_quade(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    cells = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .groupBy(
            F.col("n_name").alias("blk"),
            F.col("o_orderpriority").alias("trt"),
        )
        .agg(
            F.expr(
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 "
                "AS BIGINT)"
            ).alias("v")
        )
    )
    full_blocks = (
        cells.groupBy("blk")
        .agg(F.count(F.lit(1)).alias("nc"))
        .where(F.col("nc") == 5)
        .select("blk")
    )
    wb = Window.partitionBy("blk")
    ranked = cells.join(full_blocks, "blk").select(
        "blk",
        "trt",
        F.rank().over(wb.orderBy("v", "trt")).cast("bigint").alias("r"),
        (F.max("v").over(wb) - F.min("v").over(wb))
        .cast("bigint")
        .alias("rng"),
    )
    weighted = ranked.select(
        "blk",
        "trt",
        (
            F.dense_rank()
            .over(Window.orderBy("rng", "blk"))
            .cast("bigint")
            * (F.col("r") - 3)
        ).alias("s"),
    )
    tj = weighted.groupBy("trt").agg(
        F.sum("s").cast("bigint").alias("t")
    )
    scal = (
        weighted.agg(
            F.sum(F.col("s") * F.col("s")).cast("bigint").alias("a_stat")
        )
        .crossJoin(
            F.broadcast(
                full_blocks.agg(
                    F.count(F.lit(1)).cast("bigint").alias("b")
                )
            )
        )
        .crossJoin(
            F.broadcast(
                tj.agg(
                    F.count(F.lit(1)).cast("bigint").alias("k"),
                    F.sum(F.col("t") * F.col("t"))
                    .cast("bigint")
                    .alias("sum_tj2"),
                )
            )
        )
    )
    return scal.select(
        "b",
        "k",
        "a_stat",
        "sum_tj2",
        F.round(
            (F.col("b") - F.lit(1.0)) * F.col("sum_tj2")
            / (
                F.col("b").cast("double") * F.col("a_stat")
                - F.col("sum_tj2")
            ),
            6,
        ).alias("f_quade"),
    )


# ==== wave 182a: stratification design effect =======================


@register(
    "q_agg_design_effect",
    oracle="""
        WITH strata AS (
            SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS nh,
                   CAST(SUM(n_chars) AS BIGINT) AS sh,
                   CAST(SUM(n_chars * n_chars) AS BIGINT) AS qh
            FROM documents GROUP BY source
        ),
        quant AS (
            SELECT nh, sh, qh,
                   CAST(floor(1000000.0 * nh
                        * ((CAST(qh AS DOUBLE)
                            - CAST(sh AS DOUBLE) * sh / nh)
                           / (nh - 1))) AS BIGINT) AS th
            FROM strata
        ),
        scal AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
                   CAST(SUM(nh) AS BIGINT) AS n,
                   CAST(SUM(sh) AS BIGINT) AS s,
                   CAST(SUM(qh) AS BIGINT) AS q,
                   CAST(SUM(th) AS BIGINT) AS tq
            FROM quant
        )
        SELECT n, n_strata,
               ROUND(CAST(s AS DOUBLE) / n, 4) AS mean_chars,
               ROUND((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                     / (n - 1) / n, 6) AS v_srs,
               ROUND(CAST(tq AS DOUBLE) / 1000000.0
                     / (CAST(n AS DOUBLE) * n), 6) AS v_strat,
               ROUND(CAST(tq AS DOUBLE) / 1000000.0
                     / (CAST(n AS DOUBLE) * n)
                     / ((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                        / (n - 1) / n), 6) AS deff
        FROM scal
    """,
    section="A156",
    doc="Design effect of stratifying the document corpus by source "
    "when estimating mean document length: DEFF = "
    "Var_strat(mean)/Var_srs(mean) with proportional allocation "
    "Var_strat = sum_h n_h S_h^2 / n^2 — the survey-sampling number "
    "that says how many SRS samples one stratified sample is worth "
    "(DEFF < 1 = stratification gain; ~1 here because the synthetic "
    "sources are homogeneous, which is itself the audit's finding). "
    "Per-stratum variances rebuild from exact int64 (n, s, q) "
    "moments; the cross-stratum sum quantizes each n_h*S_h^2 with "
    "floor(1e6 * x) BEFORE summing so no double accumulation order "
    "leaks (20 strata, same device as V39's ratio sums). Scale: one "
    "groupBy(source) + a 20-row reduction — trivially map-side.",
)
def q_agg_design_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    strata = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("nh"),
        F.sum("n_chars").cast("bigint").alias("sh"),
        F.sum(F.col("n_chars") * F.col("n_chars"))
        .cast("bigint")
        .alias("qh"),
    )
    sh2 = (
        F.col("qh").cast("double")
        - F.col("sh").cast("double") * F.col("sh") / F.col("nh")
    ) / (F.col("nh") - 1)
    quant = strata.select(
        "nh",
        "sh",
        "qh",
        F.floor(F.lit(1000000.0) * F.col("nh") * sh2)
        .cast("bigint")
        .alias("th"),
    )
    scal = quant.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_strata"),
        F.sum("nh").cast("bigint").alias("n"),
        F.sum("sh").cast("bigint").alias("s"),
        F.sum("qh").cast("bigint").alias("q"),
        F.sum("th").cast("bigint").alias("tq"),
    )
    v_srs = (
        (
            F.col("q").cast("double")
            - F.col("s").cast("double") * F.col("s") / F.col("n")
        )
        / (F.col("n") - 1)
        / F.col("n")
    )
    v_strat = (
        F.col("tq").cast("double")
        / F.lit(1000000.0)
        / (F.col("n").cast("double") * F.col("n"))
    )
    return scal.select(
        "n",
        "n_strata",
        F.round(F.col("s").cast("double") / F.col("n"), 4).alias(
            "mean_chars"
        ),
        F.round(v_srs, 6).alias("v_srs"),
        F.round(v_strat, 6).alias("v_strat"),
        F.round(v_strat / v_srs, 6).alias("deff"),
    )


# ==== wave 183a: GPD tail fit via probability-weighted moments ======


@register(
    "q_agg_gpd_pwm",
    oracle="""
        WITH cents AS (
            SELECT o_orderkey,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS v
            FROM orders
        ),
        sized AS (
            SELECT o_orderkey, v,
                   ROW_NUMBER() OVER (ORDER BY v DESC, o_orderkey)
                       AS rd,
                   COUNT(*) OVER () AS n
            FROM cents
        ),
        tail AS (
            SELECT o_orderkey, v FROM sized WHERE rd <= n // 10
        ),
        thresh AS (
            SELECT CAST(MIN(v) AS BIGINT) AS u FROM tail
        ),
        exc AS (
            SELECT CAST(t.v - th.u AS BIGINT) AS y,
                   CAST(ROW_NUMBER() OVER (ORDER BY t.v, t.o_orderkey)
                        AS BIGINT) AS r
            FROM tail t CROSS JOIN thresh th
        ),
        mom AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS m,
                   CAST(SUM(y) AS BIGINT) AS s0,
                   CAST(SUM((r - 1) * y) AS BIGINT) AS s1
            FROM exc
        )
        SELECT m, (SELECT u FROM thresh) AS u_cents,
               ROUND(CAST(s0 AS DOUBLE) / m, 4) AS b0,
               ROUND(CAST(s1 AS DOUBLE) / (CAST(m AS DOUBLE) * (m - 1)),
                     4) AS b1,
               ROUND(CAST(s0 AS DOUBLE) / m
                     / (CAST(s0 AS DOUBLE) / m
                        - 2.0 * CAST(s1 AS DOUBLE)
                          / (CAST(m AS DOUBLE) * (m - 1))) - 2.0, 6)
                   AS k_shape,
               ROUND(2.0 * (CAST(s0 AS DOUBLE) / m)
                     * (CAST(s1 AS DOUBLE)
                        / (CAST(m AS DOUBLE) * (m - 1)))
                     / (CAST(s0 AS DOUBLE) / m
                        - 2.0 * CAST(s1 AS DOUBLE)
                          / (CAST(m AS DOUBLE) * (m - 1))), 4)
                   AS sigma
        FROM mom
    """,
    section="A157",
    doc="Generalized-Pareto tail fit by probability-weighted moments "
    "(Hosking-Wallis) on order-total excesses over the nearest-rank "
    "P90 threshold: b0 = mean excess, b1 = E[Y F(Y)] estimated by "
    "the rank-weighted sum sum((r-1) y)/(m(m-1)); then k = "
    "b0/(b0-2b1) - 2 and sigma = 2 b0 b1/(b0-2b1) in the "
    "F(y) = 1-(1-ky/sigma)^(1/k) convention (k < 0 = heavy tail). "
    "This closes the tail-risk pair with A127's Hill estimator — "
    "PWM is the closed-form fit practitioners use when MLE won't "
    "converge on small tails, and unlike Hill it also yields the "
    "scale. Ranks fully tie-broken by (value, orderkey); both "
    "moment sums exact int64 (rank*cents ~ 1e16 at sf0.1, within "
    "int64). Scale: one global sort for the threshold + one for "
    "tail ranks (range-partitioned at 100 TB), then a scalar "
    "reduction.",
)
def q_agg_gpd_pwm(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    cents = od.select(
        "o_orderkey",
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("v"),
    )
    # Scale note (r6): both global ranks (top-decile tail selection and
    # the PWM order weights) run on the distributed two-pass rank
    # operator; the count-all window becomes a broadcast scalar.
    from ai_to_cvent_etl_spark.operators.ranking import global_row_number

    nn = cents.agg(F.count(F.lit(1)).alias("n"))
    sized = global_row_number(
        cents, [F.desc("v"), F.asc("o_orderkey")], out_col="rd"
    ).crossJoin(F.broadcast(nn))
    tail = sized.where(F.col("rd") <= F.expr("n div 10")).select(
        "o_orderkey", "v"
    )
    thresh = tail.agg(F.min("v").cast("bigint").alias("u"))
    exc = (
        global_row_number(tail, ["v", "o_orderkey"], out_col="r")
        .crossJoin(F.broadcast(thresh))
        .select(
            (F.col("v") - F.col("u")).cast("bigint").alias("y"),
            F.col("r"),
        )
    )
    mom = exc.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("y").cast("bigint").alias("s0"),
        F.sum((F.col("r") - 1) * F.col("y")).cast("bigint").alias("s1"),
    ).crossJoin(F.broadcast(thresh))
    b0 = F.col("s0").cast("double") / F.col("m")
    b1 = F.col("s1").cast("double") / (
        F.col("m").cast("double") * (F.col("m") - 1)
    )
    denom = b0 - F.lit(2.0) * b1
    return mom.select(
        "m",
        F.col("u").alias("u_cents"),
        F.round(b0, 4).alias("b0"),
        F.round(b1, 4).alias("b1"),
        F.round(b0 / denom - F.lit(2.0), 6).alias("k_shape"),
        F.round(F.lit(2.0) * b0 * b1 / denom, 4).alias("sigma"),
    )


# ==== wave 183b: geometric median (unrolled Weiszfeld) ==============

_GM_D = (
    "sqrt((CAST(x AS DOUBLE) - mx) * (CAST(x AS DOUBLE) - mx)"
    " + (CAST(y AS DOUBLE) - my) * (CAST(y AS DOUBLE) - my))"
)
_GM_STEP = f"""(
            SELECT CAST(SUM(CAST(floor(1000000.0 * x
                        / GREATEST({_GM_D}, 1e-9)) AS BIGINT))
                        AS BIGINT) AS sxw,
                   CAST(SUM(CAST(floor(1000000.0 * y
                        / GREATEST({_GM_D}, 1e-9)) AS BIGINT))
                        AS BIGINT) AS syw,
                   CAST(SUM(CAST(floor(1e12
                        / GREATEST({_GM_D}, 1e-9)) AS BIGINT))
                        AS BIGINT) AS sw,
                   CAST(SUM(CAST(floor({_GM_D}) AS BIGINT)) AS BIGINT)
                       AS sd
            FROM pts CROSS JOIN {{c}}
        )"""


@register(
    "q_agg_geometric_median",
    oracle=f"""
        WITH pts AS (
            SELECT CAST(CAST(c.c_acctbal AS DECIMAL(12,2)) * 100
                        AS BIGINT) AS x,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100)
                        AS BIGINT) AS y
            FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
            GROUP BY c.c_custkey, c.c_acctbal
        ),
        c0 AS (
            SELECT CAST(SUM(x) AS DOUBLE) / COUNT(*) AS mx,
                   CAST(SUM(y) AS DOUBLE) / COUNT(*) AS my,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM pts
        ),
        a1 AS {_GM_STEP.format(c="c0")},
        c1 AS (
            SELECT CAST(sxw AS DOUBLE) * 1e6 / sw AS mx,
                   CAST(syw AS DOUBLE) * 1e6 / sw AS my,
                   sd AS sd0
            FROM a1
        ),
        a2 AS {_GM_STEP.format(c="c1")},
        c2 AS (
            SELECT CAST(sxw AS DOUBLE) * 1e6 / sw AS mx,
                   CAST(syw AS DOUBLE) * 1e6 / sw AS my
            FROM a2
        ),
        final AS {_GM_STEP.format(c="c2")}
        SELECT c0.n,
               ROUND(c0.mx, 2) AS centroid_x,
               ROUND(c0.my, 2) AS centroid_y,
               ROUND(c2.mx, 2) AS gmedian_x,
               ROUND(c2.my, 2) AS gmedian_y,
               c1.sd0 AS sum_dist_centroid,
               f.sd AS sum_dist_gmedian,
               ROUND(100.0 * (c1.sd0 - f.sd) / c1.sd0, 4)
                   AS improvement_pct
        FROM c0 CROSS JOIN c1 CROSS JOIN c2 CROSS JOIN final f
    """,
    section="A158",
    doc="Geometric median (L1 facility-location center) of customers "
    "in the (account balance, lifetime spend) plane via TWO unrolled "
    "Weiszfeld iterations from the centroid: m <- sum(x/d)/sum(1/d), "
    "the point minimizing total Euclidean distance — robust to the "
    "outliers that drag the centroid (the mean is the L2 answer, "
    "A100's medians are per-axis; the geometric median is the true "
    "2-D robust center). Determinism: each iteration's weights "
    "quantize per row (floor(1e6 x/d), floor(1e12/d), floor toward "
    "-inf on both engines even for negative balances) so the "
    "re-estimation ratio divides two exact int64 sums; d guards "
    "GREATEST(d, 1e-9) against an exact hit. Total distance is "
    "re-measured at the start and after round 2 (floor(d) cents). "
    "Scale: each iteration is ONE broadcast of a scalar row + one "
    "map-side-combinable reduction — no driver loop, the V16 "
    "pca_power pattern in 2-D.",
)
def q_agg_geometric_median(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    pts = (
        cust.join(od, od.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_acctbal")
        .agg(
            F.expr(
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100)"
                " AS BIGINT)"
            ).alias("y")
        )
        .select(
            F.expr(
                "CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)"
            ).alias("x"),
            "y",
        )
        # points with NULL coordinates (corrupt inputs) cannot weight the
        # Weiszfeld step — and a NULL distance would collapse GREATEST to
        # the 1e-9 floor, overflowing the quantized weight sum (no-op on
        # clean fixtures)
        .where("x IS NOT NULL AND y IS NOT NULL")
        .localCheckpoint(eager=False)
    )

    def step(c):
        d = (
            "sqrt((CAST(x AS DOUBLE) - mx) * (CAST(x AS DOUBLE) - mx)"
            " + (CAST(y AS DOUBLE) - my) * (CAST(y AS DOUBLE) - my))"
        )
        return pts.crossJoin(F.broadcast(c)).agg(
            F.expr(
                f"CAST(SUM(CAST(floor(1000000.0 * x"
                f" / GREATEST({d}, 1e-9)) AS BIGINT)) AS BIGINT)"
            ).alias("sxw"),
            F.expr(
                f"CAST(SUM(CAST(floor(1000000.0 * y"
                f" / GREATEST({d}, 1e-9)) AS BIGINT)) AS BIGINT)"
            ).alias("syw"),
            F.expr(
                f"CAST(SUM(CAST(floor(1e12"
                f" / GREATEST({d}, 1e-9)) AS BIGINT)) AS BIGINT)"
            ).alias("sw"),
            F.expr(
                f"CAST(SUM(CAST(floor({d}) AS BIGINT)) AS BIGINT)"
            ).alias("sd"),
        )

    c0 = pts.agg(
        (F.sum("x").cast("double") / F.count(F.lit(1))).alias("mx"),
        (F.sum("y").cast("double") / F.count(F.lit(1))).alias("my"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    ).localCheckpoint(eager=False)
    a1 = step(c0.select("mx", "my"))
    c1 = a1.select(
        (F.col("sxw").cast("double") * F.lit(1e6) / F.col("sw")).alias(
            "mx"
        ),
        (F.col("syw").cast("double") * F.lit(1e6) / F.col("sw")).alias(
            "my"
        ),
        F.col("sd").alias("sd0"),
    ).localCheckpoint(eager=False)
    a2 = step(c1.select("mx", "my"))
    c2 = a2.select(
        (F.col("sxw").cast("double") * F.lit(1e6) / F.col("sw")).alias(
            "mx2"
        ),
        (F.col("syw").cast("double") * F.lit(1e6) / F.col("sw")).alias(
            "my2"
        ),
    ).localCheckpoint(eager=False)
    final = step(
        c2.select(F.col("mx2").alias("mx"), F.col("my2").alias("my"))
    )
    return (
        c0.crossJoin(F.broadcast(c1.select("sd0")))
        .crossJoin(F.broadcast(c2))
        .crossJoin(F.broadcast(final.select("sd")))
        .select(
            "n",
            F.round("mx", 2).alias("centroid_x"),
            F.round("my", 2).alias("centroid_y"),
            F.round("mx2", 2).alias("gmedian_x"),
            F.round("my2", 2).alias("gmedian_y"),
            F.col("sd0").alias("sum_dist_centroid"),
            F.col("sd").alias("sum_dist_gmedian"),
            F.round(
                F.lit(100.0) * (F.col("sd0") - F.col("sd"))
                / F.col("sd0"),
                4,
            ).alias("improvement_pct"),
        )
    )


# ==== wave 185a: Bowker symmetry test (paired k x k) ================


@register(
    "q_agg_bowker_symmetry",
    oracle="""
        WITH firstlast AS (
            SELECT o_custkey,
                   arg_min(o_orderpriority,
                           CAST(o_orderdate AS DATE)::VARCHAR
                           || '|' || lpad(CAST(o_orderkey AS VARCHAR),
                                          12, '0')) AS p_first,
                   arg_max(o_orderpriority,
                           CAST(o_orderdate AS DATE)::VARCHAR
                           || '|' || lpad(CAST(o_orderkey AS VARCHAR),
                                          12, '0')) AS p_last
            FROM orders
            GROUP BY o_custkey
            HAVING COUNT(*) >= 2
        ),
        cells AS (
            SELECT p_first AS i, p_last AS j,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM firstlast GROUP BY 1, 2
        ),
        pairs AS (
            SELECT a.i, a.j,
                   a.c AS nij,
                   COALESCE(b.c, 0) AS nji
            FROM cells a
            LEFT JOIN cells b ON b.i = a.j AND b.j = a.i
            WHERE a.i < a.j
        ),
        terms AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS df,
                   CAST(SUM(CAST(floor(1e9
                        * CAST((nij - nji) * (nij - nji) AS DOUBLE)
                        / (nij + nji)) AS BIGINT)) AS BIGINT) AS sq,
                   CAST(SUM(nij + nji) AS BIGINT) AS n_off
            FROM pairs WHERE nij + nji > 0
        )
        SELECT df, n_off,
               ROUND(CAST(sq AS DOUBLE) / 1e9, 6) AS bowker_chi2
        FROM terms
    """,
    section="A159",
    doc="Bowker symmetry test on the paired (first-order priority, "
    "last-order priority) table of multi-order customers: chi2 = "
    "sum_(i<j) (n_ij - n_ji)^2/(n_ij + n_ji), the k-level "
    "generalization of A88's 2x2 McNemar — it asks whether customer "
    "priority MIGRATION is symmetric (upgrades balance downgrades) "
    "rather than whether the marginals differ, which is what a "
    "plain chi-square would test. First/last orders are picked by "
    "arg_min/arg_max over a zero-padded (date|orderkey) string key "
    "(the TS1 total-order device, since ties on date are real). "
    "Each off-diagonal term quantizes floor(1e9 * term) BEFORE the "
    "sum over <= 10 cell pairs, so no double accumulation order "
    "leaks; df = #pairs with n_ij + n_ji > 0. Scale: one customer-"
    "grain agg, one 25-cell pairing — constant-size tail.",
)
def q_agg_bowker_symmetry(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    key = F.concat(
        F.col("o_orderdate").cast("date").cast("string"),
        F.lit("|"),
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0"),
    )
    firstlast = (
        od.groupBy("o_custkey")
        .agg(
            F.expr(
                "min_by(o_orderpriority,"
                " CAST(CAST(o_orderdate AS DATE) AS STRING) || '|'"
                " || lpad(CAST(o_orderkey AS STRING), 12, '0'))"
            ).alias("p_first"),
            F.expr(
                "max_by(o_orderpriority,"
                " CAST(CAST(o_orderdate AS DATE) AS STRING) || '|'"
                " || lpad(CAST(o_orderkey AS STRING), 12, '0'))"
            ).alias("p_last"),
            F.count(F.lit(1)).alias("n_ord"),
        )
        .where(F.col("n_ord") >= 2)
    )
    cells = firstlast.groupBy(
        F.col("p_first").alias("i"), F.col("p_last").alias("j")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    rev = cells.select(
        F.col("j").alias("i"), F.col("i").alias("j"),
        F.col("c").alias("c_rev"),
    )
    pairs = (
        cells.join(rev, ["i", "j"], "left")
        .where(F.col("i") < F.col("j"))
        .select(
            F.col("c").alias("nij"),
            F.coalesce(F.col("c_rev"), F.lit(0)).alias("nji"),
        )
    )
    terms = pairs.where(F.col("nij") + F.col("nji") > 0).agg(
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.sum(
            F.floor(
                F.lit(1e9)
                * (
                    (F.col("nij") - F.col("nji"))
                    * (F.col("nij") - F.col("nji"))
                ).cast("double")
                / (F.col("nij") + F.col("nji"))
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("sq"),
        F.sum(F.col("nij") + F.col("nji"))
        .cast("bigint")
        .alias("n_off"),
    )
    return terms.select(
        "df",
        "n_off",
        F.round(F.col("sq").cast("double") / F.lit(1e9), 6).alias(
            "bowker_chi2"
        ),
    )


# ==== wave 186a: ridge regression path (closed form, 2 predictors) ==


@register(
    "q_agg_ridge_path",
    oracle="""
        WITH frame AS (
            SELECT CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) // 100 AS y,
                   CAST(SUM(CAST(l.l_quantity AS INT)) AS BIGINT) AS x1,
                   CAST(COUNT(*) AS BIGINT) AS x2
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderkey, o.o_totalprice
        ),
        mom AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x1) AS BIGINT) AS s1,
                   CAST(SUM(x2) AS BIGINT) AS s2,
                   CAST(SUM(x1 * x1) AS BIGINT) AS q11,
                   CAST(SUM(x2 * x2) AS BIGINT) AS q22,
                   CAST(SUM(x1 * x2) AS BIGINT) AS q12,
                   CAST(SUM(x1 * y) AS BIGINT) AS c1,
                   CAST(SUM(x2 * y) AS BIGINT) AS c2
            FROM frame
        ),
        cen AS (
            SELECT n,
                   CAST(sy AS DOUBLE) / n AS my,
                   CAST(s1 AS DOUBLE) / n AS m1,
                   CAST(s2 AS DOUBLE) / n AS m2,
                   CAST(q11 AS DOUBLE)
                   - CAST(s1 AS DOUBLE) * s1 / n AS a11,
                   CAST(q22 AS DOUBLE)
                   - CAST(s2 AS DOUBLE) * s2 / n AS a22,
                   CAST(q12 AS DOUBLE)
                   - CAST(s1 AS DOUBLE) * s2 / n AS a12,
                   CAST(c1 AS DOUBLE)
                   - CAST(s1 AS DOUBLE) * sy / n AS b1v,
                   CAST(c2 AS DOUBLE)
                   - CAST(s2 AS DOUBLE) * sy / n AS b2v
            FROM mom
        ),
        lams AS (SELECT CAST(unnest([0.0, 0.1, 1.0]) AS DOUBLE)
                     AS lam_frac),
        solved AS (
            SELECT c.n, l.lam_frac,
                   l.lam_frac * (c.a11 + c.a22) / 2.0 AS lam,
                   ((c.a22 + l.lam_frac * (c.a11 + c.a22) / 2.0) * c.b1v
                    - c.a12 * c.b2v)
                   / ((c.a11 + l.lam_frac * (c.a11 + c.a22) / 2.0)
                      * (c.a22 + l.lam_frac * (c.a11 + c.a22) / 2.0)
                      - c.a12 * c.a12) AS beta1,
                   ((c.a11 + l.lam_frac * (c.a11 + c.a22) / 2.0) * c.b2v
                    - c.a12 * c.b1v)
                   / ((c.a11 + l.lam_frac * (c.a11 + c.a22) / 2.0)
                      * (c.a22 + l.lam_frac * (c.a11 + c.a22) / 2.0)
                      - c.a12 * c.a12) AS beta2,
                   c.my, c.m1, c.m2
            FROM cen c CROSS JOIN lams l
        )
        SELECT n, lam_frac,
               ROUND(beta1, 6) AS beta_qty,
               ROUND(beta2, 6) AS beta_lines,
               ROUND(my - beta1 * m1 - beta2 * m2, 4) AS intercept,
               ROUND(sqrt(beta1 * beta1 + beta2 * beta2), 6)
                   AS coef_norm
        FROM solved
    """,
    section="A160",
    doc="Ridge regression path (closed form, 2 predictors) of order "
    "dollars on quantity sum and line count: solve (C + lambda I) "
    "beta = c by 2x2 Cramer on CENTERED co-moments, for lambda = "
    "{0, 0.1, 1.0} x trace(C)/2 — a scale-free regularization grid, "
    "so the output is the coefficient SHRINKAGE PATH (lam_frac = 0 "
    "reproduces A61's OLS; coef_norm strictly decreases), the "
    "standard diagnostic for collinearity between qty and lines. "
    "All nine moments are exact int64 one-pass sums; centering and "
    "the Cramer solve are pinned double expressions duplicated per "
    "lambda row (3-row unnest/explode — no iteration, the path is "
    "data-parallel). Scale: one order-grain agg + a scalar-row "
    "cross join with a 3-element literal array.",
)
def q_agg_ridge_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    frame = (
        od.join(li, li.l_orderkey == od.o_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(
            F.sum(F.col("l_quantity").cast("int"))
            .cast("bigint")
            .alias("x1"),
            F.count(F.lit(1)).cast("bigint").alias("x2"),
        )
        .select(
            F.expr(
                "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
                " AS BIGINT) div 100"
            ).alias("y"),
            "x1",
            "x2",
        )
    )
    mom = frame.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum("x1").cast("bigint").alias("s1"),
        F.sum("x2").cast("bigint").alias("s2"),
        F.sum(F.col("x1") * F.col("x1")).cast("bigint").alias("q11"),
        F.sum(F.col("x2") * F.col("x2")).cast("bigint").alias("q22"),
        F.sum(F.col("x1") * F.col("x2")).cast("bigint").alias("q12"),
        F.sum(F.col("x1") * F.col("y")).cast("bigint").alias("c1"),
        F.sum(F.col("x2") * F.col("y")).cast("bigint").alias("c2"),
    )
    cen = mom.select(
        "n",
        (F.col("sy").cast("double") / F.col("n")).alias("my"),
        (F.col("s1").cast("double") / F.col("n")).alias("m1"),
        (F.col("s2").cast("double") / F.col("n")).alias("m2"),
        (
            F.col("q11").cast("double")
            - F.col("s1").cast("double") * F.col("s1") / F.col("n")
        ).alias("a11"),
        (
            F.col("q22").cast("double")
            - F.col("s2").cast("double") * F.col("s2") / F.col("n")
        ).alias("a22"),
        (
            F.col("q12").cast("double")
            - F.col("s1").cast("double") * F.col("s2") / F.col("n")
        ).alias("a12"),
        (
            F.col("c1").cast("double")
            - F.col("s1").cast("double") * F.col("sy") / F.col("n")
        ).alias("b1v"),
        (
            F.col("c2").cast("double")
            - F.col("s2").cast("double") * F.col("sy") / F.col("n")
        ).alias("b2v"),
    )
    lams = cen.select(
        "*",
        F.explode(
            F.array(F.lit(0.0), F.lit(0.1), F.lit(1.0))
        ).alias("lam_frac"),
    )
    lam = F.col("lam_frac") * (F.col("a11") + F.col("a22")) / F.lit(2.0)
    det = (
        (F.col("a11") + lam) * (F.col("a22") + lam)
        - F.col("a12") * F.col("a12")
    )
    beta1 = ((F.col("a22") + lam) * F.col("b1v")
             - F.col("a12") * F.col("b2v")) / det
    beta2 = ((F.col("a11") + lam) * F.col("b2v")
             - F.col("a12") * F.col("b1v")) / det
    return lams.select(
        "n",
        "lam_frac",
        F.round(beta1, 6).alias("beta_qty"),
        F.round(beta2, 6).alias("beta_lines"),
        F.round(
            F.col("my") - beta1 * F.col("m1") - beta2 * F.col("m2"), 4
        ).alias("intercept"),
        F.round(F.sqrt(beta1 * beta1 + beta2 * beta2), 6).alias(
            "coef_norm"
        ),
    )


# ==== wave 187b: Kupiec proportion-of-failures VaR backtest =========


@register(
    "q_agg_kupiec_pof",
    oracle="""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS d,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) AS cents
            FROM orders GROUP BY 1
        ),
        diffs AS (
            SELECT d,
                   CAST(cents - LAG(cents) OVER (ORDER BY d) AS BIGINT)
                       AS r,
                   CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS t,
                   CAST(COUNT(*) OVER () AS BIGINT) AS n
            FROM daily
            QUALIFY r IS NOT NULL
        ),
        train AS (
            SELECT r, ROW_NUMBER() OVER (ORDER BY r, d) AS rk,
                   COUNT(*) OVER () AS nt
            FROM diffs WHERE 2 * t <= n
        ),
        var95 AS (
            SELECT CAST(r AS BIGINT) AS v,
                   CAST(nt AS BIGINT) AS n_train
            FROM train
            WHERE rk = CAST(ceil(0.05 * nt) AS BIGINT)
        ),
        test AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
                   CAST(SUM(CASE WHEN df.r < v.v THEN 1 ELSE 0 END)
                        AS BIGINT) AS x
            FROM (SELECT r FROM diffs WHERE 2 * t > n) df
            CROSS JOIN var95 v
        )
        SELECT v.n_train, t.n_test, v.v AS var95_cents, t.x
                   AS n_violations,
               ROUND(CAST(t.x AS DOUBLE) / t.n_test, 6) AS viol_rate,
               ROUND(-2.0 * ((t.n_test - t.x) * ln(0.95)
                     + t.x * ln(0.05)
                     - CASE WHEN t.x = 0 OR t.x = t.n_test THEN 0.0
                            ELSE (t.n_test - t.x)
                                 * ln(1.0 - CAST(t.x AS DOUBLE)
                                            / t.n_test)
                                 + t.x * ln(CAST(t.x AS DOUBLE)
                                            / t.n_test) END), 4)
                   AS kupiec_lr,
               CASE WHEN -2.0 * ((t.n_test - t.x) * ln(0.95)
                     + t.x * ln(0.05)
                     - CASE WHEN t.x = 0 OR t.x = t.n_test THEN 0.0
                            ELSE (t.n_test - t.x)
                                 * ln(1.0 - CAST(t.x AS DOUBLE)
                                            / t.n_test)
                                 + t.x * ln(CAST(t.x AS DOUBLE)
                                            / t.n_test) END) > 3.841
                    THEN 1 ELSE 0 END AS reject_95
        FROM var95 v CROSS JOIN test t
    """,
    section="A161",
    doc="Kupiec proportion-of-failures backtest of a historical "
    "VaR(95): train on the first half of daily revenue changes "
    "(nearest-rank 5th percentile, tie-broken by date), count "
    "strict violations in the held-out second half, and test "
    "x/n = 5% with the likelihood ratio LR = -2[ (n-x)ln(1-p) + "
    "x ln p - (n-x)ln(1-x/n) - x ln(x/n) ] ~ chi2(1) — the Basel "
    "coverage test that A145's VaR/ES computation (same family) is "
    "audited WITH in practice: a VaR that never trips is as wrong "
    "as one tripping constantly, and LR catches both sides. "
    "Violations/threshold are exact integer work; ln() runs only in "
    "the final scalar row (x=0 / x=n limits handled by an explicit "
    "CASE, not NaN), rounded 4dp. Scale: one day-grain agg, one lag "
    "window, one rank window over half the days, scalar algebra.",
)
def q_agg_kupiec_pof(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    daily = od.groupBy(
        F.col("o_orderdate").cast("date").alias("d")
    ).agg(
        F.expr(
            "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 "
            "AS BIGINT)"
        ).alias("cents")
    )
    w = Window.orderBy("d")
    diffs = daily.select(
        "d",
        (F.col("cents") - F.lag("cents").over(w))
        .cast("bigint")
        .alias("r"),
        F.row_number().over(w).cast("bigint").alias("t"),
        F.count(F.lit(1))
        .over(Window.partitionBy())
        .cast("bigint")
        .alias("n"),
    ).where(F.col("r").isNotNull())
    train = diffs.where(2 * F.col("t") <= F.col("n")).select(
        "r",
        "d",
        F.row_number().over(Window.orderBy("r", "d")).alias("rk"),
        F.count(F.lit(1))
        .over(Window.partitionBy())
        .cast("bigint")
        .alias("nt"),
    )
    var95 = train.where(
        F.col("rk") == F.ceil(F.lit(0.05) * F.col("nt")).cast("bigint")
    ).select(
        F.col("r").cast("bigint").alias("v"),
        F.col("nt").alias("n_train"),
    )
    test = (
        diffs.where(2 * F.col("t") > F.col("n"))
        .crossJoin(F.broadcast(var95))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum(F.when(F.col("r") < F.col("v"), 1).otherwise(0))
            .cast("bigint")
            .alias("x"),
        )
    )
    out = var95.crossJoin(F.broadcast(test))
    xr = F.col("x").cast("double") / F.col("n_test")
    lr = F.lit(-2.0) * (
        (F.col("n_test") - F.col("x")) * F.log(F.lit(0.95))
        + F.col("x") * F.log(F.lit(0.05))
        - F.when(
            (F.col("x") == 0) | (F.col("x") == F.col("n_test")),
            F.lit(0.0),
        ).otherwise(
            (F.col("n_test") - F.col("x")) * F.log(F.lit(1.0) - xr)
            + F.col("x") * F.log(xr)
        )
    )
    return out.select(
        "n_train",
        "n_test",
        F.col("v").alias("var95_cents"),
        F.col("x").alias("n_violations"),
        F.round(xr, 6).alias("viol_rate"),
        F.round(lr, 4).alias("kupiec_lr"),
        F.when(lr > F.lit(3.841), 1).otherwise(0).alias("reject_95"),
    )


# ==== wave 188a: exact 1-D Wasserstein distance =====================


@register(
    "q_agg_wasserstein_1d",
    oracle="""
        WITH vals AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END AS gx,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS cents
            FROM orders
        ),
        walk AS (
            SELECT cents, gx,
                   CAST(SUM(gx) OVER w AS BIGINT) AS cx,
                   CAST(SUM(1 - gx) OVER w AS BIGINT) AS cy,
                   CAST(LEAD(cents) OVER (ORDER BY cents, o_orderkey)
                        - cents AS BIGINT) AS gap
            FROM vals
            WINDOW w AS (ORDER BY cents, o_orderkey
                         ROWS UNBOUNDED PRECEDING)
        ),
        sums AS (
            SELECT
                (SELECT CAST(SUM(gx) AS BIGINT) FROM vals) AS n,
                (SELECT CAST(SUM(1 - gx) AS BIGINT) FROM vals) AS m,
                SUM(ABS(CAST((SELECT SUM(1 - gx) FROM vals) AS HUGEINT)
                        * cx
                        - CAST((SELECT SUM(gx) FROM vals) AS HUGEINT)
                          * cy) * gap) AS acc
            FROM walk WHERE gap IS NOT NULL
        )
        SELECT n AS n_x, m AS n_y,
               ROUND((CAST(acc // 4294967296 AS DOUBLE) * 4294967296.0
                      + CAST(acc % 4294967296 AS DOUBLE))
                     / (CAST(n AS DOUBLE) * m), 4) AS w1_cents
        FROM sums
    """,
    section="A162",
    doc="Exact 1-D Wasserstein-1 (earth mover's) distance between "
    "urgent/high and other order-total distributions: W1 = "
    "integral |F - G| dz computed as the sorted-merge sum of "
    "|m*cx - n*cy| * gap over consecutive distinct values — the "
    "optimal-transport metric that reports HOW FAR mass must move "
    "(in cents), where A153's CvM and A36's KS report only "
    "unit-free discrepancy; this is the number behind 'distribution "
    "shift cost' in drift monitoring. Cross-multiplying by n*m "
    "keeps every ECDF difference an exact integer (ties contribute "
    "gap = 0 automatically under the tie-broken sort); the "
    "accumulator crosses 2^63 (|m*cx|*gap ~ 1e17 per row) so it "
    "runs in int128/DECIMAL(38,0) and rebuilds through the A26 "
    "hi/lo device. Scale: ONE global sort + one prefix window — "
    "the same shape as a percentile, range-partition the sort at "
    "100 TB.",
)
def q_agg_wasserstein_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    vals = od.select(
        "o_orderkey",
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        )
        .otherwise(0)
        .alias("gx"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("cents"),
    )
    # Scale note (r6): one distributed prefix-sum pass yields the global
    # index t and both empirical CDF counts; lead(cents) becomes a t -> t+1
    # self-join on the dense index (hash join, parallel) — no
    # single-partition window anywhere.
    from ai_to_cvent_etl_spark.operators.ranking import global_cumulative

    cum = global_cumulative(
        vals,
        ["cents", "o_orderkey"],
        {"t": F.lit(1), "cx": F.col("gx"), "cy": 1 - F.col("gx")},
    ).localCheckpoint(eager=False)
    nxt = cum.select(
        (F.col("t") - 1).alias("t"), F.col("cents").alias("next_cents")
    )
    walk = (
        cum.join(nxt, "t", "left")
        .select(
            "cents",
            F.col("cx").cast("bigint").alias("cx"),
            F.col("cy").cast("bigint").alias("cy"),
            (F.col("next_cents") - F.col("cents"))
            .cast("bigint")
            .alias("gap"),
        )
    )
    tot = vals.agg(
        F.sum("gx").cast("bigint").alias("n"),
        F.sum(1 - F.col("gx")).cast("bigint").alias("m"),
    )
    sums = (
        walk.where(F.col("gap").isNotNull())
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                F.abs(
                    F.col("m").cast(DecimalType(38, 0)) * F.col("cx")
                    - F.col("n").cast(DecimalType(38, 0)) * F.col("cy")
                )
                * F.col("gap")
            ).alias("acc"),
            F.max("n").alias("n"),
            F.max("m").alias("m"),
        )
    )
    hi_lo = (
        "cast(acc div 4294967296 as double) * 4294967296.0d"
        " + cast(acc % 4294967296 as double)"
    )
    return sums.select(
        F.col("n").alias("n_x"),
        F.col("m").alias("n_y"),
        F.round(
            F.expr(hi_lo) / (F.col("n").cast("double") * F.col("m")), 4
        ).alias("w1_cents"),
    )


# ==== wave 189b: 3-way mutual-independence G-test ===================


@register(
    "q_agg_g_test_3way",
    oracle="""
        WITH base AS (
            SELECT o.o_orderpriority AS p, o.o_orderstatus AS s,
                   r.r_name AS g
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
        ),
        cells AS (
            SELECT p, s, g, CAST(COUNT(*) AS BIGINT) AS o
            FROM base GROUP BY 1, 2, 3
        ),
        margs AS (
            SELECT c.p, c.s, c.g, c.o,
                   SUM(c.o) OVER (PARTITION BY c.p) AS np,
                   SUM(c.o) OVER (PARTITION BY c.s) AS ns,
                   SUM(c.o) OVER (PARTITION BY c.g) AS ng,
                   SUM(c.o) OVER () AS n
            FROM cells c
        ),
        terms AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
                   CAST(MAX(n) AS BIGINT) AS n,
                   CAST(SUM(CAST(floor(1e6 * 2.0 * o
                        * ln(CAST(o AS DOUBLE)
                             * CAST(n AS DOUBLE) * n
                             / (CAST(np AS DOUBLE) * ns * ng)))
                        AS BIGINT)) AS BIGINT) AS gq
            FROM margs
        )
        SELECT n, n_cells,
               ROUND(CAST(gq AS DOUBLE) / 1e6, 4) AS g_stat,
               CAST((5 - 1) * (3 - 1) + (5 - 1) * (5 - 1)
                    + (3 - 1) * (5 - 1)
                    + (5 - 1) * (3 - 1) * (5 - 1) AS BIGINT) AS df
        FROM terms
    """,
    section="A163",
    doc="Three-way mutual-independence G-test over (priority, "
    "status, region): G = 2 sum o*ln(o n^2/(n_p n_s n_g)) — the "
    "log-likelihood-ratio generalization of A23's 2-way chi-square "
    "to the full 5x3x5 cube, testing whether the THREE margins "
    "jointly explain the cell counts (the saturated-vs-independence "
    "contrast that starts every log-linear model selection). "
    "Marginals ride window sums over the 75-cell frame; each cell's "
    "G term quantizes floor(1e6 * term) BEFORE the sum so ln()'s "
    "possible last-ulp engine difference can't reorder-accumulate "
    "(75 bounded terms, V39 device); df = rc + rt + ct + rct for "
    "mutual independence = 46. Empty cells never appear (GROUP BY "
    "emits observed cells only; o*ln(o..) -> o >= 1 always). "
    "Scale: one 3-key agg (75 cells max), window marginals over a "
    "constant-size frame.",
)
def q_agg_g_test_3way(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    base = (
        od.join(cust, od.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .join(
            F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey")
        )
        .select(
            F.col("o_orderpriority").alias("p"),
            F.col("o_orderstatus").alias("s"),
            F.col("r_name").alias("g"),
        )
    )
    cells = base.groupBy("p", "s", "g").agg(
        F.count(F.lit(1)).cast("bigint").alias("o")
    )
    margs = cells.select(
        "o",
        F.sum("o").over(Window.partitionBy("p")).alias("np"),
        F.sum("o").over(Window.partitionBy("s")).alias("ns"),
        F.sum("o").over(Window.partitionBy("g")).alias("ng"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    term = F.floor(
        F.lit(1e6)
        * F.lit(2.0)
        * F.col("o")
        * F.log(
            F.col("o").cast("double")
            * F.col("n").cast("double")
            * F.col("n")
            / (
                F.col("np").cast("double") * F.col("ns") * F.col("ng")
            )
        )
    ).cast("bigint")
    terms = margs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.max("n").cast("bigint").alias("n"),
        F.sum(term).cast("bigint").alias("gq"),
    )
    return terms.select(
        "n",
        "n_cells",
        F.round(F.col("gq").cast("double") / F.lit(1e6), 4).alias(
            "g_stat"
        ),
        F.lit(
            (5 - 1) * (3 - 1)
            + (5 - 1) * (5 - 1)
            + (3 - 1) * (5 - 1)
            + (5 - 1) * (3 - 1) * (5 - 1)
        )
        .cast("bigint")
        .alias("df"),
    )


# ==== wave 190b: Nemenyi post-hoc critical differences ==============

# studentized range q(0.05, k=5, inf df) / sqrt(2)
_NEM_Q5 = 3.858 / 1.4142135623730951


@register(
    "q_agg_nemenyi_posthoc",
    oracle=f"""
        WITH cells AS (
            SELECT n.n_name AS blk, o.o_orderpriority AS trt,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) AS v
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1, 2
        ),
        full_blocks AS (
            SELECT blk FROM cells GROUP BY blk HAVING COUNT(*) = 5
        ),
        ranked AS (
            SELECT c.trt,
                   CAST(RANK() OVER (PARTITION BY c.blk
                                     ORDER BY c.v, c.trt) AS BIGINT)
                       AS r
            FROM cells c JOIN full_blocks f ON f.blk = c.blk
        ),
        rs AS (
            SELECT trt, CAST(SUM(r) AS BIGINT) AS rsum,
                   CAST((SELECT COUNT(*) FROM full_blocks) AS BIGINT)
                       AS b
            FROM ranked GROUP BY trt
        )
        SELECT a.trt AS trt_a, c.trt AS trt_b,
               a.rsum AS rank_sum_a, c.rsum AS rank_sum_b,
               ROUND(ABS(CAST(a.rsum - c.rsum AS DOUBLE)) / a.b, 4)
                   AS mean_rank_diff,
               ROUND({_NEM_Q5} * sqrt(5.0 * 6.0
                     / (6.0 * a.b)), 4) AS critical_difference,
               CASE WHEN ABS(CAST(a.rsum - c.rsum AS DOUBLE)) / a.b
                         > {_NEM_Q5} * sqrt(5.0 * 6.0 / (6.0 * a.b))
                    THEN 1 ELSE 0 END AS significant
        FROM rs a JOIN rs c ON a.trt < c.trt
    """,
    section="A164",
    doc="Nemenyi post-hoc critical-difference table after a Friedman "
    "test (nation blocks x priority treatments): pairwise mean-rank "
    "differences vs CD = q(0.05, k)/sqrt(2) * sqrt(k(k+1)/(6b)) — "
    "the multiple-comparison step A65/A155 require before claiming "
    "WHICH treatments differ (reporting a significant omnibus "
    "without a CD-controlled pairwise table is the classic "
    "rank-test misuse; this is also THE standard diagram for "
    "comparing classifiers across datasets, Demsar 2006). Per-block "
    "ranks are fully tie-broken, rank sums exact int64; the only "
    "constants are the studentized-range literal and k=5, so CD is "
    "one pinned expression and the 10 significance flags are "
    "deterministic compares. Scale: one (nation,priority) agg, one "
    "5-row self-join.",
)
def q_agg_nemenyi_posthoc(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    cells = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .groupBy(
            F.col("n_name").alias("blk"),
            F.col("o_orderpriority").alias("trt"),
        )
        .agg(
            F.expr(
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 "
                "AS BIGINT)"
            ).alias("v")
        )
    )
    full_blocks = (
        cells.groupBy("blk")
        .agg(F.count(F.lit(1)).alias("nc"))
        .where(F.col("nc") == 5)
        .select("blk")
    )
    ranked = cells.join(full_blocks, "blk").select(
        "trt",
        F.rank()
        .over(Window.partitionBy("blk").orderBy("v", "trt"))
        .cast("bigint")
        .alias("r"),
    )
    b_cnt = full_blocks.agg(
        F.count(F.lit(1)).cast("bigint").alias("b")
    )
    rs = (
        ranked.groupBy("trt")
        .agg(F.sum("r").cast("bigint").alias("rsum"))
        .crossJoin(F.broadcast(b_cnt))
    )
    a = rs.select(
        F.col("trt").alias("trt_a"),
        F.col("rsum").alias("rank_sum_a"),
        "b",
    )
    c = rs.select(
        F.col("trt").alias("trt_b"), F.col("rsum").alias("rank_sum_b")
    )
    # 5x5 treatment pairs: broadcast the right side so the theta join plans
    # as BroadcastNestedLoopJoin, never CartesianProduct
    pairs = a.join(F.broadcast(c), F.col("trt_a") < F.col("trt_b"))
    diff = (
        F.abs(
            (F.col("rank_sum_a") - F.col("rank_sum_b")).cast("double")
        )
        / F.col("b")
    )
    cd = F.lit(_NEM_Q5) * F.sqrt(
        F.lit(5.0) * F.lit(6.0) / (F.lit(6.0) * F.col("b"))
    )
    return pairs.select(
        "trt_a",
        "trt_b",
        "rank_sum_a",
        "rank_sum_b",
        F.round(diff, 4).alias("mean_rank_diff"),
        F.round(cd, 4).alias("critical_difference"),
        F.when(diff > cd, 1).otherwise(0).alias("significant"),
    )


# ==== wave 194a: Moran's I spatial autocorrelation ==================


@register(
    "q_agg_morans_i",
    oracle="""
        WITH natrev AS (
            SELECT n.n_nationkey AS nk, n.n_regionkey AS rk,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) AS x
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1, 2
        ),
        scal AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS s
            FROM natrev
        ),
        cent AS (
            SELECT nk, rk,
                   CAST(sc.n AS HUGEINT) * x - sc.s AS u
            FROM natrev CROSS JOIN scal sc
        ),
        cross_terms AS (
            SELECT SUM(a.u * b.u) AS num,
                   CAST(COUNT(*) AS BIGINT) AS w0
            FROM cent a JOIN cent b
              ON a.rk = b.rk AND a.nk <> b.nk
        ),
        selfsq AS (
            SELECT SUM(u * u) AS den FROM cent
        )
        SELECT sc.n, ct.w0,
               ROUND(CAST(sc.n AS DOUBLE) / ct.w0
                     * (CAST(ct.num // 4294967296 AS DOUBLE)
                        * 4294967296.0
                        + CAST(ct.num % 4294967296 AS DOUBLE))
                     / (CAST(ss.den // 4294967296 AS DOUBLE)
                        * 4294967296.0
                        + CAST(ss.den % 4294967296 AS DOUBLE)), 6)
                   AS morans_i,
               ROUND(-1.0 / (sc.n - 1), 6) AS e_null
        FROM cross_terms ct CROSS JOIN selfsq ss CROSS JOIN scal sc
    """,
    section="A166",
    doc="Moran's I spatial autocorrelation of nation revenue with "
    "same-region contiguity weights: I = (n/W0) * sum_ij w_ij z_i "
    "z_j / sum z_i^2 — THE spatial-clustering statistic (do "
    "neighboring economies move together?), with null expectation "
    "-1/(n-1), a question A20-style grouped means can't pose "
    "because it's about the CROSS terms. Determinism: center by "
    "u_i = n*x_i - S (exact int128 — the n-scaling cancels in the "
    "ratio), cross products u_i u_j ~ 1e24 accumulate in "
    "HUGEINT/DECIMAL(38,0), both sums rebuild through the A26 hi/lo "
    "device, and the weight matrix never materializes — the "
    "same-region self-join IS w_ij = 1. Scale: facts collapse to "
    "25 nation rows first; the spatial join is 25x25 within region "
    "blocks.",
)
def q_agg_morans_i(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    na = load_table(spark, sf_dir, "nation")
    natrev = (
        od.join(cu, od.o_custkey == cu.c_custkey)
        .join(
            F.broadcast(na), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .groupBy(
            F.col("n_nationkey").alias("nk"),
            F.col("n_regionkey").alias("rk"),
        )
        .agg(
            F.expr(
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 "
                "AS BIGINT)"
            ).alias("x")
        )
    )
    scal = natrev.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
    )
    cent = natrev.crossJoin(F.broadcast(scal)).select(
        "nk",
        "rk",
        "n",
        (
            F.col("n").cast(DecimalType(38, 0)) * F.col("x")
            - F.col("s")
        ).alias("u"),
    )
    a = cent.select(
        F.col("rk").alias("rk"), F.col("nk").alias("nka"),
        F.col("u").alias("ua"),
    )
    b = cent.select(
        F.col("rk").alias("rk"), F.col("nk").alias("nkb"),
        F.col("u").alias("ub"),
    )
    cross_terms = (
        a.join(b, "rk")
        .where(F.col("nka") != F.col("nkb"))
        .agg(
            F.sum(F.col("ua") * F.col("ub")).alias("num"),
            F.count(F.lit(1)).cast("bigint").alias("w0"),
        )
    )
    selfsq = cent.agg(F.sum(F.col("u") * F.col("u")).alias("den"))
    out = (
        cross_terms.crossJoin(F.broadcast(selfsq))
        .crossJoin(F.broadcast(scal))
    )
    hi_lo = (
        "cast({0} div 4294967296 as double) * 4294967296.0d"
        " + cast({0} % 4294967296 as double)"
    )
    return out.select(
        "n",
        "w0",
        F.round(
            F.col("n").cast("double") / F.col("w0")
            * F.expr(hi_lo.format("num"))
            / F.expr(hi_lo.format("den")),
            6,
        ).alias("morans_i"),
        F.round(F.lit(-1.0) / (F.col("n") - 1), 6).alias("e_null"),
    )


# ==== wave 195a: Hoover (Robin Hood) index ==========================


@register(
    "q_agg_hoover_index",
    oracle="""
        WITH rev AS (
            SELECT o_custkey,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100)
                        AS BIGINT) AS x
            FROM orders GROUP BY o_custkey
        ),
        scal AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS t
            FROM rev
        ),
        dev AS (
            SELECT SUM(ABS(CAST(s.n AS HUGEINT) * r.x - s.t)) AS sad,
                   CAST(MAX(s.n) AS BIGINT) AS n,
                   CAST(MAX(s.t) AS BIGINT) AS t
            FROM rev r CROSS JOIN scal s
        )
        SELECT n, t AS total_cents,
               ROUND((CAST(sad // 4294967296 AS DOUBLE) * 4294967296.0
                      + CAST(sad % 4294967296 AS DOUBLE))
                     / (2.0 * CAST(n AS DOUBLE) * t), 6)
                   AS hoover_index
        FROM dev
    """,
    section="A167",
    doc="Hoover (Robin Hood) index of customer revenue "
    "concentration: H = (1/2) sum |x_i/T - 1/n| — the fraction of "
    "total revenue that would have to be REDISTRIBUTED for "
    "perfect equality, the operational reading A29's Gini lacks "
    "(Gini is a rank-area abstraction; Hoover is 'move 23% of the "
    "dollars'), and equals the maximum vertical Lorenz-diagonal "
    "gap. Cross-multiplying clears every fraction: sum |n*x_i - T| "
    "runs in int128 (n*x ~ 1e16 at sf0.1) and rebuilds via the A26 "
    "hi/lo device into ONE division by 2nT. Scale: one customer "
    "agg, one scalar broadcast, one map-side absolute-deviation "
    "reduction.",
)
def q_agg_hoover_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    rev = od.groupBy("o_custkey").agg(
        F.expr(
            "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100)"
            " AS BIGINT)"
        ).alias("x")
    )
    scal = rev.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("t"),
    )
    dev = rev.crossJoin(F.broadcast(scal)).agg(
        F.sum(
            F.abs(
                F.col("n").cast(DecimalType(38, 0)) * F.col("x")
                - F.col("t")
            )
        ).alias("sad"),
        F.max("n").cast("bigint").alias("n"),
        F.max("t").cast("bigint").alias("t"),
    )
    hi_lo = (
        "cast(sad div 4294967296 as double) * 4294967296.0d"
        " + cast(sad % 4294967296 as double)"
    )
    return dev.select(
        "n",
        F.col("t").alias("total_cents"),
        F.round(
            F.expr(hi_lo)
            / (F.lit(2.0) * F.col("n").cast("double") * F.col("t")),
            6,
        ).alias("hoover_index"),
    )


# ==== wave 196a: Geary's C spatial contiguity ratio =================


@register(
    "q_agg_geary_c",
    oracle="""
        WITH natrev AS (
            SELECT n.n_nationkey AS nk, n.n_regionkey AS rk,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) AS x
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1, 2
        ),
        scal AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS s
            FROM natrev
        ),
        num AS (
            SELECT SUM(CAST(a.x - b.x AS HUGEINT) * (a.x - b.x))
                       AS sqd,
                   CAST(COUNT(*) AS BIGINT) AS w0
            FROM natrev a JOIN natrev b
              ON a.rk = b.rk AND a.nk <> b.nk
        ),
        den AS (
            SELECT SUM((CAST(sc.n AS HUGEINT) * r.x - sc.s)
                       * (CAST(sc.n AS HUGEINT) * r.x - sc.s)) AS ssq
            FROM natrev r CROSS JOIN scal sc
        )
        SELECT sc.n, nu.w0,
               ROUND((sc.n - 1.0) * CAST(sc.n AS DOUBLE) * sc.n
                     * (CAST(nu.sqd // 4294967296 AS DOUBLE)
                        * 4294967296.0
                        + CAST(nu.sqd % 4294967296 AS DOUBLE))
                     / (2.0 * nu.w0
                        * (CAST(de.ssq // 4294967296 AS DOUBLE)
                           * 4294967296.0
                           + CAST(de.ssq % 4294967296 AS DOUBLE))), 6)
                   AS geary_c
        FROM num nu CROSS JOIN den de CROSS JOIN scal sc
    """,
    section="A168",
    doc="Geary's C contiguity ratio on nation revenue with "
    "same-region weights: C = (n-1) sum w_ij (x_i - x_j)^2 / "
    "(2 W0 sum (x_i - xbar)^2) — Moran's I (A166) measures "
    "covariance-style clustering, Geary measures PAIRWISE "
    "difference and is more sensitive to local structure; "
    "reporting both (I high + C low = global cluster; I ~ 0 + "
    "C < 1 = local pockets) is standard spatial-stats practice. "
    "The numerator needs NO centering ((x_i - x_j)^2 is "
    "translation-invariant, exact int128); the denominator reuses "
    "A166's u = n*x - S integer centering (the n^2 it introduces "
    "is multiplied back in the C expression). Both sums rebuild "
    "via A26 hi/lo. Scale: same 25-row nation quotient + "
    "region-block self-join as A166.",
)
def q_agg_geary_c(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    na = load_table(spark, sf_dir, "nation")
    natrev = (
        od.join(cu, od.o_custkey == cu.c_custkey)
        .join(
            F.broadcast(na), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .groupBy(
            F.col("n_nationkey").alias("nk"),
            F.col("n_regionkey").alias("rk"),
        )
        .agg(
            F.expr(
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 "
                "AS BIGINT)"
            ).alias("x")
        )
        .localCheckpoint(eager=False)
    )
    scal = natrev.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
    )
    a = natrev.select(
        F.col("rk"), F.col("nk").alias("nka"), F.col("x").alias("xa")
    )
    b = natrev.select(
        F.col("rk"), F.col("nk").alias("nkb"), F.col("x").alias("xb")
    )
    num = (
        a.join(b, "rk")
        .where(F.col("nka") != F.col("nkb"))
        .agg(
            F.sum(
                (F.col("xa") - F.col("xb")).cast(DecimalType(38, 0))
                * (F.col("xa") - F.col("xb"))
            ).alias("sqd"),
            F.count(F.lit(1)).cast("bigint").alias("w0"),
        )
    )
    u = (
        F.col("n").cast(DecimalType(38, 0)) * F.col("x") - F.col("s")
    )
    den = natrev.crossJoin(F.broadcast(scal)).agg(
        F.sum(u * u).alias("ssq")
    )
    out = (
        num.crossJoin(F.broadcast(den))
        .crossJoin(F.broadcast(scal))
    )
    hi_lo = (
        "cast({0} div 4294967296 as double) * 4294967296.0d"
        " + cast({0} % 4294967296 as double)"
    )
    return out.select(
        "n",
        "w0",
        F.round(
            (F.col("n") - F.lit(1.0))
            * F.col("n").cast("double") * F.col("n")
            * F.expr(hi_lo.format("sqd"))
            / (
                F.lit(2.0) * F.col("w0")
                * F.expr(hi_lo.format("ssq"))
            ),
            6,
        ).alias("geary_c"),
    )


# ==== wave 197a: local Moran's I hotspot map (LISA) =================


@register(
    "q_agg_local_moran_hotspots",
    oracle="""
        WITH natrev AS (
            SELECT n.n_name AS nation, n.n_nationkey AS nk,
                   n.n_regionkey AS rk,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) AS x
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1, 2, 3
        ),
        scal AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS s
            FROM natrev
        ),
        cent AS (
            SELECT nation, nk, rk,
                   CAST(sc.n AS HUGEINT) * x - sc.s AS u
            FROM natrev CROSS JOIN scal sc
        ),
        lagged AS (
            SELECT a.nation, a.nk, a.u,
                   SUM(b.u) AS lag_u,
                   CAST(COUNT(b.nk) AS BIGINT) AS n_neigh
            FROM cent a JOIN cent b
              ON a.rk = b.rk AND a.nk <> b.nk
            GROUP BY a.nation, a.nk, a.u
        )
        SELECT nation, n_neigh,
               CASE WHEN u > 0 AND lag_u > 0 THEN 'HH'
                    WHEN u < 0 AND lag_u < 0 THEN 'LL'
                    WHEN u > 0 AND lag_u <= 0 THEN 'HL'
                    ELSE 'LH' END AS quadrant,
               CASE WHEN (u > 0 AND lag_u > 0)
                      OR (u < 0 AND lag_u < 0) THEN 1 ELSE 0 END
                   AS is_cluster
        FROM lagged
    """,
    section="A169",
    doc="Local Moran (LISA) hotspot map per nation with same-region "
    "neighbors: classify each nation by the sign pair of its own "
    "centered revenue u and its neighbors' sum — HH (hot spot), LL "
    "(cold spot), HL/LH (spatial outliers) — the per-unit "
    "decomposition of A166's global I, and the map an analyst "
    "actually acts on ('WHICH markets cluster', not 'is there "
    "clustering'). The u = n*x - S integer centering makes both "
    "signs exact int128 comparisons — no variance normalization "
    "is needed for the quadrant, so the whole classification is "
    "integer arithmetic (the magnitude-normalized I_i would add "
    "nothing to the labels). Scale: 25-row quotient, region-block "
    "self-join, group back to the unit.",
)
def q_agg_local_moran_hotspots(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    na = load_table(spark, sf_dir, "nation")
    natrev = (
        od.join(cu, od.o_custkey == cu.c_custkey)
        .join(
            F.broadcast(na), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("n_nationkey").alias("nk"),
            F.col("n_regionkey").alias("rk"),
        )
        .agg(
            F.expr(
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 "
                "AS BIGINT)"
            ).alias("x")
        )
    )
    scal = natrev.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
    )
    cent = natrev.crossJoin(F.broadcast(scal)).select(
        "nation",
        "nk",
        "rk",
        (
            F.col("n").cast(DecimalType(38, 0)) * F.col("x")
            - F.col("s")
        ).alias("u"),
    )
    b = cent.select(
        F.col("rk"), F.col("nk").alias("nkb"), F.col("u").alias("ub")
    )
    lagged = (
        cent.join(b, "rk")
        .where(F.col("nk") != F.col("nkb"))
        .groupBy("nation", "nk", "u")
        .agg(
            F.sum("ub").alias("lag_u"),
            F.count("nkb").cast("bigint").alias("n_neigh"),
        )
    )
    return lagged.select(
        "nation",
        "n_neigh",
        F.when(
            (F.col("u") > 0) & (F.col("lag_u") > 0), F.lit("HH")
        )
        .when((F.col("u") < 0) & (F.col("lag_u") < 0), F.lit("LL"))
        .when((F.col("u") > 0) & (F.col("lag_u") <= 0), F.lit("HL"))
        .otherwise(F.lit("LH"))
        .alias("quadrant"),
        F.when(
            ((F.col("u") > 0) & (F.col("lag_u") > 0))
            | ((F.col("u") < 0) & (F.col("lag_u") < 0)),
            1,
        )
        .otherwise(0)
        .alias("is_cluster"),
    )


# ==== wave 197b: Gallagher disproportionality index =================


@register(
    "q_agg_gallagher_index",
    oracle="""
        WITH per_nation AS (
            SELECT n.n_nationkey AS nk,
                   CAST(COUNT(*) AS BIGINT) AS orders_n,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100)
                        AS BIGINT) AS cents
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1
        ),
        tot AS (
            SELECT CAST(SUM(orders_n) AS BIGINT) AS tn,
                   CAST(SUM(cents) AS BIGINT) AS tc,
                   CAST(COUNT(*) AS BIGINT) AS k
            FROM per_nation
        ),
        gaps AS (
            SELECT p.nk,
                   CAST(p.orders_n AS DOUBLE) / t.tn
                   - CAST(p.cents AS DOUBLE) / t.tc AS gap
            FROM per_nation p CROSS JOIN tot t
        ),
        agg AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS k,
                   CAST(SUM(CAST(floor(1e12 * gap * gap) AS BIGINT))
                        AS BIGINT) AS sq
            FROM gaps
        )
        SELECT k AS n_nations,
               ROUND(100.0 * sqrt(CAST(sq AS DOUBLE) / 1e12 / 2.0), 6)
                   AS gallagher_pct,
               ROUND(CAST(sq AS DOUBLE) / 1e12, 8) AS sum_sq_gap
        FROM agg
    """,
    section="A170",
    doc="Gallagher (least-squares) disproportionality index between "
    "each nation's ORDER-COUNT share and its REVENUE share: LSq = "
    "sqrt(sum (v_i - s_i)^2 / 2) * 100 — the political-science "
    "seats-vs-votes index repurposed as a volume-vs-value "
    "misalignment audit (a nation with 10% of orders but 20% of "
    "revenue is a 'over-represented' premium market; A24's HHI "
    "sees concentration, not MISALIGNMENT between two share "
    "vectors). Shares are single divisions of exact int64 totals; "
    "each squared gap quantizes floor(1e12 * gap^2) BEFORE the "
    "25-term sum (V39 device), then one sqrt. Scale: one nation "
    "agg + scalar broadcast — constant state.",
)
def q_agg_gallagher_index(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    na = load_table(spark, sf_dir, "nation")
    per_nation = (
        od.join(cu, od.o_custkey == cu.c_custkey)
        .join(
            F.broadcast(na), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .groupBy(F.col("n_nationkey").alias("nk"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("orders_n"),
            F.expr(
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100)"
                " AS BIGINT)"
            ).alias("cents"),
        )
    )
    tot = per_nation.agg(
        F.sum("orders_n").cast("bigint").alias("tn"),
        F.sum("cents").cast("bigint").alias("tc"),
    )
    gaps = per_nation.crossJoin(F.broadcast(tot)).select(
        (
            F.col("orders_n").cast("double") / F.col("tn")
            - F.col("cents").cast("double") / F.col("tc")
        ).alias("gap")
    )
    agg = gaps.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(
            F.floor(
                F.lit(1e12) * F.col("gap") * F.col("gap")
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("sq"),
    )
    return agg.select(
        F.col("k").alias("n_nations"),
        F.round(
            F.lit(100.0)
            * F.sqrt(
                F.col("sq").cast("double") / F.lit(1e12) / F.lit(2.0)
            ),
            6,
        ).alias("gallagher_pct"),
        F.round(F.col("sq").cast("double") / F.lit(1e12), 8).alias(
            "sum_sq_gap"
        ),
    )


# ==== wave 199a: competing-risks cumulative incidence (A171) ========


@register(
    "q_agg_competing_risks_cif",
    oracle="""
        WITH firsts AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'purchase'
                       THEN CAST(date_diff('day',
                            TIMESTAMP '2024-01-01', ts) AS BIGINT)
                       END) AS tp,
                   MIN(CASE WHEN event_type = 'error'
                       THEN CAST(date_diff('day',
                            TIMESTAMP '2024-01-01', ts) AS BIGINT)
                       END) AS te
            FROM events GROUP BY user_id
        ),
        obs AS (
            SELECT CASE
                     WHEN tp IS NOT NULL AND (te IS NULL OR tp < te)
                         THEN tp
                     WHEN te IS NOT NULL THEN te
                     ELSE 30 END AS t,
                   CASE
                     WHEN te IS NOT NULL AND (tp IS NULL OR te <= tp)
                         THEN 'error'
                     WHEN tp IS NOT NULL THEN 'purchase'
                     ELSE 'censored' END AS cause
            FROM firsts
        ),
        ev AS (
            SELECT t,
                   CAST(SUM(CASE WHEN cause = 'purchase'
                            THEN 1 ELSE 0 END) AS BIGINT) AS dp,
                   CAST(SUM(CASE WHEN cause = 'error'
                            THEN 1 ELSE 0 END) AS BIGINT) AS de,
                   CAST(COUNT(*) AS BIGINT) AS leaving
            FROM obs GROUP BY t
        ),
        risk AS (
            SELECT t, dp, de,
                   CAST(SUM(leaving) OVER () AS BIGINT)
                   - CAST(SUM(leaving) OVER w AS BIGINT) + leaving
                       AS n_risk
            FROM ev
            WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)
        ),
        surv AS (
            SELECT t, dp, de, n_risk,
                   exp(CAST(SUM(CAST(floor(1e12
                       * ln(1.0 - CAST(dp + de AS DOUBLE) / n_risk))
                       AS DECIMAL(38,0))) OVER w AS DOUBLE) / 1e12)
                       AS s_t,
                   COALESCE(exp(CAST(SUM(CAST(floor(1e12
                       * ln(1.0 - CAST(dp + de AS DOUBLE) / n_risk))
                       AS DECIMAL(38,0))) OVER wp AS DOUBLE) / 1e12),
                       1.0) AS s_prev
            FROM risk
            WHERE dp + de < n_risk
            WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW),
                   wp AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING)
        )
        SELECT t, n_risk, dp AS d_purchase, de AS d_error,
               ROUND(s_t, 6) AS survival,
               ROUND(CAST(SUM(CAST(floor(1e12 * s_prev
                     * (CAST(dp AS DOUBLE) / n_risk)) AS BIGINT))
                     OVER w AS DOUBLE) / 1e12, 6) AS cif_purchase,
               ROUND(CAST(SUM(CAST(floor(1e12 * s_prev
                     * (CAST(de AS DOUBLE) / n_risk)) AS BIGINT))
                     OVER w AS DOUBLE) / 1e12, 6) AS cif_error
        FROM surv
        WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    """,
    section="A171",
    doc="Aalen-Johansen cumulative incidence under COMPETING risks: "
    "per user, first 'purchase' vs first 'error' compete (error "
    "wins day ties by the documented precedence), others censor at "
    "day 30; CIF_k(t) = sum S(u-) d_ku/n_u — the estimator that "
    "replaces 1-KM when causes compete (naive per-cause KM treats "
    "the other cause as censoring and OVERSTATES incidence — the "
    "textbook competing-risks bias; A33's KM is the single-cause "
    "ancestor). Determinism: the shared survival curve uses A33's "
    "quantized ln-sum product device; each CIF increment "
    "S(u-)*h_ku quantizes floor(1e12 * term) before its cumulative "
    "window sum, so both monotone curves are exact-integer "
    "accumulations of pinned per-row doubles. Scale: one user agg, "
    "one day-grain agg (<= 31 rows of state), three windows.",
)
def q_agg_competing_risks_cif(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    day = (
        (
            F.unix_micros("ts")
            - F.unix_micros(
                F.lit("2024-01-01 00:00:00").cast("timestamp")
            )
        )
        / F.lit(86400000000)
    ).cast("bigint")
    firsts = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "purchase", day)
        ).alias("tp"),
        F.min(F.when(F.col("event_type") == "error", day)).alias("te"),
    )
    obs = firsts.select(
        F.when(
            F.col("tp").isNotNull()
            & (F.col("te").isNull() | (F.col("tp") < F.col("te"))),
            F.col("tp"),
        )
        .when(F.col("te").isNotNull(), F.col("te"))
        .otherwise(F.lit(30))
        .alias("t"),
        F.when(
            F.col("te").isNotNull()
            & (F.col("tp").isNull() | (F.col("te") <= F.col("tp"))),
            F.lit("error"),
        )
        .when(F.col("tp").isNotNull(), F.lit("purchase"))
        .otherwise(F.lit("censored"))
        .alias("cause"),
    )
    evt = obs.groupBy("t").agg(
        F.sum(F.when(F.col("cause") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("dp"),
        F.sum(F.when(F.col("cause") == "error", 1).otherwise(0))
        .cast("bigint")
        .alias("de"),
        F.count(F.lit(1)).cast("bigint").alias("leaving"),
    )
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    wp = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    risk = evt.select(
        "t",
        "dp",
        "de",
        (
            F.sum("leaving").over(Window.partitionBy())
            - F.sum("leaving").over(w)
            + F.col("leaving")
        )
        .cast("bigint")
        .alias("n_risk"),
    )
    lnterm = F.floor(
        F.lit(1e12)
        * F.log(
            F.lit(1.0)
            - (F.col("dp") + F.col("de")).cast("double")
            / F.col("n_risk")
        )
    ).cast(DecimalType(38, 0))
    surv = risk.where(
        F.col("dp") + F.col("de") < F.col("n_risk")
    ).select(
        "t",
        "dp",
        "de",
        "n_risk",
        F.exp(
            F.sum(lnterm).over(w).cast("double") / F.lit(1e12)
        ).alias("s_t"),
        F.coalesce(
            F.exp(
                F.sum(lnterm).over(wp).cast("double") / F.lit(1e12)
            ),
            F.lit(1.0),
        ).alias("s_prev"),
    )
    cif_p = (
        F.sum(
            F.floor(
                F.lit(1e12)
                * F.col("s_prev")
                * (F.col("dp").cast("double") / F.col("n_risk"))
            ).cast("bigint")
        )
        .over(w)
        .cast("double")
        / F.lit(1e12)
    )
    cif_e = (
        F.sum(
            F.floor(
                F.lit(1e12)
                * F.col("s_prev")
                * (F.col("de").cast("double") / F.col("n_risk"))
            ).cast("bigint")
        )
        .over(w)
        .cast("double")
        / F.lit(1e12)
    )
    return surv.select(
        "t",
        "n_risk",
        F.col("dp").alias("d_purchase"),
        F.col("de").alias("d_error"),
        F.round("s_t", 6).alias("survival"),
        F.round(cif_p, 6).alias("cif_purchase"),
        F.round(cif_e, 6).alias("cif_error"),
    )


# ==== wave 199b: Kendall's W coefficient of concordance =============


@register(
    "q_agg_kendall_w",
    oracle="""
        WITH cells AS (
            SELECT r.r_name AS rater, o.o_orderpriority AS item,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) AS v
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY 1, 2
        ),
        ranked AS (
            SELECT rater, item,
                   CAST(RANK() OVER (PARTITION BY rater
                                     ORDER BY v, item) AS BIGINT) AS rk
            FROM cells
        ),
        rsums AS (
            SELECT item, CAST(SUM(rk) AS BIGINT) AS r
            FROM ranked GROUP BY item
        ),
        stat AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM((r - 15) * (r - 15)) AS BIGINT) AS s
            FROM rsums
        )
        SELECT n, 5 AS m, s,
               ROUND(12.0 * s / (25.0 * (n * n * n - n)), 6)
                   AS kendall_w,
               ROUND(5.0 * (n - 1)
                     * (12.0 * s / (25.0 * (n * n * n - n))), 4)
                   AS chi2_approx
        FROM stat
    """,
    section="A172",
    doc="Kendall's W coefficient of concordance: 5 region 'raters' "
    "each rank the 5 priority 'items' by revenue; W = 12S / "
    "(m^2(n^3 - n)) with S = sum (R_j - m(n+1)/2)^2 — the 0..1 "
    "agreement scale for m>2 rankers that A150-era pairwise "
    "correlations can't give (W = 1 means every region orders the "
    "priorities identically; the chi2 = m(n-1)W approximation "
    "rides along). m = n = 5 makes the mean rank sum m(n+1)/2 = 15 "
    "exactly integer, so S is an exact int64 over fully tie-broken "
    "within-rater ranks ((v, item) total order). Scale: one "
    "(region, priority) agg, one 5-row rank window per rater, "
    "25-cell algebra.",
)
def q_agg_kendall_w(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region")
    cells = (
        od.join(cu, od.o_custkey == cu.c_custkey)
        .join(
            F.broadcast(na), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .join(
            F.broadcast(re), F.col("n_regionkey") == F.col("r_regionkey")
        )
        .groupBy(
            F.col("r_name").alias("rater"),
            F.col("o_orderpriority").alias("item"),
        )
        .agg(
            F.expr(
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 "
                "AS BIGINT)"
            ).alias("v")
        )
    )
    ranked = cells.select(
        "item",
        F.rank()
        .over(Window.partitionBy("rater").orderBy("v", "item"))
        .cast("bigint")
        .alias("rk"),
    )
    rsums = ranked.groupBy("item").agg(
        F.sum("rk").cast("bigint").alias("r")
    )
    stat = rsums.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum((F.col("r") - 15) * (F.col("r") - 15))
        .cast("bigint")
        .alias("s"),
    )
    w_expr = (
        F.lit(12.0) * F.col("s")
        / (
            F.lit(25.0)
            * (F.col("n") * F.col("n") * F.col("n") - F.col("n"))
        )
    )
    return stat.select(
        "n",
        F.lit(5).cast("int").alias("m"),
        "s",
        F.round(w_expr, 6).alias("kendall_w"),
        F.round(F.lit(5.0) * (F.col("n") - 1) * w_expr, 4).alias(
            "chi2_approx"
        ),
    )


# ==== wave 201b: permutation distance audit (A173) ==================


@register(
    "q_agg_rank_distance_audit",
    oracle="""
        WITH per_nation AS (
            SELECT n.n_name AS nation,
                   CAST(COUNT(*) AS BIGINT) AS orders_n,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100)
                        AS BIGINT) AS cents
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1
        ),
        ranked AS (
            SELECT nation,
                   CAST(ROW_NUMBER() OVER (ORDER BY cents DESC, nation)
                        AS BIGINT) AS r_rev,
                   CAST(ROW_NUMBER() OVER (ORDER BY orders_n DESC,
                                           nation) AS BIGINT) AS r_vol
            FROM per_nation
        ),
        foot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(ABS(r_rev - r_vol)) AS BIGINT) AS footrule
            FROM ranked
        ),
        kd AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS discordant
            FROM ranked a JOIN ranked b
              ON a.nation < b.nation
            WHERE (a.r_rev - b.r_rev) * (a.r_vol - b.r_vol) < 0
        )
        SELECT f.n, f.footrule, k.discordant,
               ROUND(CAST(f.footrule AS DOUBLE)
                     / ((CAST(f.n AS DOUBLE) * f.n - f.n % 2) / 2.0),
                     6) AS footrule_norm,
               ROUND(CAST(k.discordant AS DOUBLE)
                     / (CAST(f.n AS DOUBLE) * (f.n - 1) / 2.0), 6)
                   AS kendall_distance_norm,
               ROUND(1.0 - 4.0 * CAST(k.discordant AS DOUBLE)
                     / (CAST(f.n AS DOUBLE) * (f.n - 1)), 6)
                   AS kendall_tau
        FROM foot f CROSS JOIN kd k
    """,
    section="A173",
    doc="Permutation-distance audit between the revenue ranking and "
    "the order-volume ranking of nations: Spearman footrule "
    "sum|r1 - r2|, Kendall distance (discordant pairs via the sign "
    "of the cross product — 300 pairs, exact), and the implied "
    "Kendall tau — the ranking-stability readout for 'does the "
    "league table change if we rank by volume instead of value', "
    "which V-family's RBO answers only for top-k retrieval lists "
    "(full-permutation distances are the leaderboard-governance "
    "version). Both rankings are fully tie-broken by nation name; "
    "footrule_norm divides by the maximum n^2/2 for even n. All "
    "distances exact int64; normalizations are pinned expressions. "
    "Scale: one nation agg, two 25-row rank windows, one 300-pair "
    "self-join.",
)
def q_agg_rank_distance_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    na = load_table(spark, sf_dir, "nation")
    per_nation = (
        od.join(cu, od.o_custkey == cu.c_custkey)
        .join(
            F.broadcast(na), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("orders_n"),
            F.expr(
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100)"
                " AS BIGINT)"
            ).alias("cents"),
        )
    )
    ranked = per_nation.select(
        "nation",
        F.row_number()
        .over(Window.orderBy(F.desc("cents"), F.asc("nation")))
        .cast("bigint")
        .alias("r_rev"),
        F.row_number()
        .over(Window.orderBy(F.desc("orders_n"), F.asc("nation")))
        .cast("bigint")
        .alias("r_vol"),
    ).localCheckpoint(eager=False)
    foot = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.abs(F.col("r_rev") - F.col("r_vol")))
        .cast("bigint")
        .alias("footrule"),
    )
    a = ranked.select(
        F.col("nation").alias("na"),
        F.col("r_rev").alias("ra"),
        F.col("r_vol").alias("va"),
    )
    b = ranked.select(
        F.col("nation").alias("nb"),
        F.col("r_rev").alias("rb"),
        F.col("r_vol").alias("vb"),
    )
    kd = (
        # 25x25 nation pairs: broadcast the right side (theta join ->
        # BroadcastNestedLoopJoin, never CartesianProduct)
        a.join(F.broadcast(b), F.col("na") < F.col("nb"))
        .where(
            (F.col("ra") - F.col("rb")) * (F.col("va") - F.col("vb"))
            < 0
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("discordant"))
    )
    out = foot.crossJoin(F.broadcast(kd))
    nd = F.col("n").cast("double")
    return out.select(
        "n",
        "footrule",
        "discordant",
        F.round(
            F.col("footrule").cast("double")
            / ((nd * F.col("n") - F.col("n") % 2) / F.lit(2.0)),
            6,
        ).alias("footrule_norm"),
        F.round(
            F.col("discordant").cast("double")
            / (nd * (F.col("n") - 1) / F.lit(2.0)),
            6,
        ).alias("kendall_distance_norm"),
        F.round(
            F.lit(1.0)
            - F.lit(4.0) * F.col("discordant").cast("double")
            / (nd * (F.col("n") - 1)),
            6,
        ).alias("kendall_tau"),
    )


# ==== wave 202b: Weibull fit by median-rank regression ==============


@register(
    "q_agg_weibull_mrr",
    oracle="""
        WITH gaps AS (
            SELECT date_diff('day', o_orderdate,
                             lead(o_orderdate) OVER (
                                 PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey
                             )) AS gap,
                   o_orderkey
            FROM orders
            QUALIFY gap IS NOT NULL AND gap >= 1
        ),
        ranked AS (
            SELECT CAST(gap AS BIGINT) AS gap,
                   CAST(ROW_NUMBER() OVER (ORDER BY gap, o_orderkey)
                        AS BIGINT) AS i,
                   CAST(COUNT(*) OVER () AS BIGINT) AS n
            FROM gaps
        ),
        pts AS (
            SELECT CAST(floor(1e9 * ln(CAST(gap AS DOUBLE)))
                        AS BIGINT) AS xq,
                   CAST(floor(1e9 * ln(-ln(1.0 - (i - 0.3)
                        / (n + 0.4)))) AS BIGINT) AS yq
            FROM ranked
        ),
        mom AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(xq) AS BIGINT) AS sx,
                   CAST(SUM(yq) AS BIGINT) AS sy,
                   SUM(CAST(xq AS HUGEINT) * xq) AS sxx,
                   SUM(CAST(xq AS HUGEINT) * yq) AS sxy
            FROM pts
        )
        SELECT n,
               ROUND((CAST(n AS DOUBLE)
                      * (CAST(sxy // 4294967296 AS DOUBLE)
                         * 4294967296.0
                         + CAST(sxy % 4294967296 AS DOUBLE))
                      - CAST(sx AS DOUBLE) * sy)
                     / (CAST(n AS DOUBLE)
                        * (CAST(sxx // 4294967296 AS DOUBLE)
                           * 4294967296.0
                           + CAST(sxx % 4294967296 AS DOUBLE))
                        - CAST(sx AS DOUBLE) * sx), 4) AS k_shape,
               ROUND(exp(-(((CAST(sy AS DOUBLE) / n)
                     - ((CAST(n AS DOUBLE)
                         * (CAST(sxy // 4294967296 AS DOUBLE)
                            * 4294967296.0
                            + CAST(sxy % 4294967296 AS DOUBLE))
                         - CAST(sx AS DOUBLE) * sy)
                        / (CAST(n AS DOUBLE)
                           * (CAST(sxx // 4294967296 AS DOUBLE)
                              * 4294967296.0
                              + CAST(sxx % 4294967296 AS DOUBLE))
                           - CAST(sx AS DOUBLE) * sx))
                       * (CAST(sx AS DOUBLE) / n)) / 1e9)
                     / ((CAST(n AS DOUBLE)
                         * (CAST(sxy // 4294967296 AS DOUBLE)
                            * 4294967296.0
                            + CAST(sxy % 4294967296 AS DOUBLE))
                         - CAST(sx AS DOUBLE) * sy)
                        / (CAST(n AS DOUBLE)
                           * (CAST(sxx // 4294967296 AS DOUBLE)
                              * 4294967296.0
                              + CAST(sxx % 4294967296 AS DOUBLE))
                           - CAST(sx AS DOUBLE) * sx))), 4)
                   AS lambda_scale_days
        FROM mom
    """,
    section="A174",
    doc="Weibull reliability fit by median-rank regression on "
    "customer inter-order gaps: plot ln(-ln(1 - F_i)) against "
    "ln(t_(i)) with Bernard's approximation F_i = (i-0.3)/(n+0.4) "
    "and read shape k = slope, scale lambda = exp(-intercept/k) — "
    "the Weibull-paper method reliability engineers use when MLE "
    "is overkill (k < 1 infant mortality, k ~ 1 memoryless like "
    "A58's exponential fit, k > 1 wear-out; for re-order gaps k "
    "says whether reorder propensity ages). Ranks fully tie-broken "
    "by (gap, orderkey); both log coordinates quantize floor(1e9 * "
    "ln) per row so the OLS moments are exact int64/int128 (the "
    "1e9 scale cancels in the slope; the intercept carries it, "
    "divided back at the end), rebuilt via A26 hi/lo. Scale: one "
    "lag window, one global rank (range-partition at 100 TB), one "
    "moment reduction.",
)
def q_agg_weibull_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    gaps = od.select(
        F.datediff(
            F.lead("o_orderdate").over(w), F.col("o_orderdate")
        ).alias("gap"),
        "o_orderkey",
    ).where(F.col("gap").isNotNull() & (F.col("gap") >= 1))
    # Scale note (r6): median-rank index i via the distributed global rank;
    # the count-all window becomes a broadcast scalar.
    from ai_to_cvent_etl_spark.operators.ranking import global_row_number

    ng = gaps.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    ranked = (
        global_row_number(gaps, ["gap", "o_orderkey"], out_col="i")
        .crossJoin(F.broadcast(ng))
        .select(
            F.col("gap").cast("bigint").alias("gap"),
            F.col("i"),
            F.col("n"),
        )
    )
    pts = ranked.select(
        F.floor(F.lit(1e9) * F.log(F.col("gap").cast("double")))
        .cast("bigint")
        .alias("xq"),
        F.floor(
            F.lit(1e9)
            * F.log(
                -F.log(
                    F.lit(1.0)
                    - (F.col("i") - F.lit(0.3))
                    / (F.col("n") + F.lit(0.4))
                )
            )
        )
        .cast("bigint")
        .alias("yq"),
    )
    mom = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("xq").cast("bigint").alias("sx"),
        F.sum("yq").cast("bigint").alias("sy"),
        F.sum(F.col("xq").cast(DecimalType(38, 0)) * F.col("xq")).alias(
            "sxx"
        ),
        F.sum(F.col("xq").cast(DecimalType(38, 0)) * F.col("yq")).alias(
            "sxy"
        ),
    )
    hi_lo = (
        "cast({0} div 4294967296 as double) * 4294967296.0d"
        " + cast({0} % 4294967296 as double)"
    )
    nd = F.col("n").cast("double")
    slope = (
        nd * F.expr(hi_lo.format("sxy"))
        - F.col("sx").cast("double") * F.col("sy")
    ) / (
        nd * F.expr(hi_lo.format("sxx"))
        - F.col("sx").cast("double") * F.col("sx")
    )
    intercept = (
        F.col("sy").cast("double") / F.col("n")
        - slope * (F.col("sx").cast("double") / F.col("n"))
    )
    return mom.select(
        "n",
        F.round(slope, 4).alias("k_shape"),
        F.round(
            F.exp(-(intercept / F.lit(1e9)) / slope), 4
        ).alias("lambda_scale_days"),
    )


# ==== wave 203a: minimum-variance two-asset portfolio ===============


@register(
    "q_agg_min_variance_portfolio",
    oracle="""
        WITH daily AS (
            SELECT CAST(o.o_orderdate AS DATE) AS d,
                   CAST(SUM(CASE WHEN r.r_name = 'AMERICA'
                        THEN CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                        ELSE 0 END) AS BIGINT) AS xa,
                   CAST(SUM(CASE WHEN r.r_name = 'EUROPE'
                        THEN CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                        ELSE 0 END) AS BIGINT) AS xe
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name IN ('AMERICA', 'EUROPE')
            GROUP BY 1
        ),
        mom AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(xa) AS BIGINT) AS sa,
                   CAST(SUM(xe) AS BIGINT) AS se,
                   SUM(CAST(xa AS HUGEINT) * xa) AS qaa,
                   SUM(CAST(xe AS HUGEINT) * xe) AS qee,
                   SUM(CAST(xa AS HUGEINT) * xe) AS qae
            FROM daily
        ),
        cov AS (
            SELECT n,
                   (CAST(qaa // 4294967296 AS DOUBLE) * 4294967296.0
                    + CAST(qaa % 4294967296 AS DOUBLE)) / n
                   - (CAST(sa AS DOUBLE) / n)
                     * (CAST(sa AS DOUBLE) / n) AS va,
                   (CAST(qee // 4294967296 AS DOUBLE) * 4294967296.0
                    + CAST(qee % 4294967296 AS DOUBLE)) / n
                   - (CAST(se AS DOUBLE) / n)
                     * (CAST(se AS DOUBLE) / n) AS ve,
                   (CAST(qae // 4294967296 AS DOUBLE) * 4294967296.0
                    + CAST(qae % 4294967296 AS DOUBLE)) / n
                   - (CAST(sa AS DOUBLE) / n)
                     * (CAST(se AS DOUBLE) / n) AS cae
            FROM mom
        )
        SELECT n,
               ROUND((ve - cae) / (va + ve - 2.0 * cae), 6)
                   AS w_america,
               ROUND(1.0 - (ve - cae) / (va + ve - 2.0 * cae), 6)
                   AS w_europe,
               ROUND(cae / sqrt(va * ve), 6) AS corr,
               ROUND(sqrt((va * ve - cae * cae)
                     / (va + ve - 2.0 * cae))
                     / sqrt(LEAST(va, ve)), 6) AS vol_vs_best_single
        FROM cov
    """,
    section="A175",
    doc="Minimum-variance two-asset portfolio between AMERICA and "
    "EUROPE daily revenue streams: w* = (s_e^2 - s_ae)/(s_a^2 + "
    "s_e^2 - 2 s_ae), the Markowitz closed form — the "
    "diversification readout (vol_vs_best_single < 1 quantifies "
    "how much combining the two streams beats holding the less "
    "volatile one; A143's market beta prices one stream against "
    "the market, this ALLOCATES between two). Per-day region cents "
    "are exact int64 (absent-region days contribute real zeros via "
    "the conditional sum, not dropped rows); second moments run in "
    "int128 and rebuild via A26 hi/lo; the weight, correlation, "
    "and min-variance vol (va*ve - cae^2)/(va+ve-2cae) are pinned "
    "expressions. Scale: one day-grain conditional agg — the whole "
    "frontier needs six integers.",
)
def q_agg_min_variance_portfolio(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region")
    daily = (
        od.join(cu, od.o_custkey == cu.c_custkey)
        .join(
            F.broadcast(na), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .join(
            F.broadcast(re), F.col("n_regionkey") == F.col("r_regionkey")
        )
        .where(F.col("r_name").isin("AMERICA", "EUROPE"))
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(
            F.expr(
                "CAST(SUM(CASE WHEN r_name = 'AMERICA'"
                " THEN CAST(o_totalprice AS DECIMAL(18,2)) * 100"
                " ELSE 0 END) AS BIGINT)"
            ).alias("xa"),
            F.expr(
                "CAST(SUM(CASE WHEN r_name = 'EUROPE'"
                " THEN CAST(o_totalprice AS DECIMAL(18,2)) * 100"
                " ELSE 0 END) AS BIGINT)"
            ).alias("xe"),
        )
    )
    mom = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("xa").cast("bigint").alias("sa"),
        F.sum("xe").cast("bigint").alias("se"),
        F.sum(F.col("xa").cast(DecimalType(38, 0)) * F.col("xa")).alias(
            "qaa"
        ),
        F.sum(F.col("xe").cast(DecimalType(38, 0)) * F.col("xe")).alias(
            "qee"
        ),
        F.sum(F.col("xa").cast(DecimalType(38, 0)) * F.col("xe")).alias(
            "qae"
        ),
    )
    hi_lo = (
        "cast({0} div 4294967296 as double) * 4294967296.0d"
        " + cast({0} % 4294967296 as double)"
    )
    nd = F.col("n").cast("double")
    ma = F.col("sa").cast("double") / F.col("n")
    me = F.col("se").cast("double") / F.col("n")
    va = F.expr(hi_lo.format("qaa")) / F.col("n") - ma * ma
    ve = F.expr(hi_lo.format("qee")) / F.col("n") - me * me
    cae = F.expr(hi_lo.format("qae")) / F.col("n") - ma * me
    w_a = (ve - cae) / (va + ve - F.lit(2.0) * cae)
    return mom.select(
        "n",
        F.round(w_a, 6).alias("w_america"),
        F.round(F.lit(1.0) - w_a, 6).alias("w_europe"),
        F.round(cae / F.sqrt(va * ve), 6).alias("corr"),
        F.round(
            F.sqrt(
                (va * ve - cae * cae)
                / (va + ve - F.lit(2.0) * cae)
            )
            / F.sqrt(F.least(va, ve)),
            6,
        ).alias("vol_vs_best_single"),
    )


# ==== wave 204b: Simpson's paradox detector =========================


@register(
    "q_agg_simpson_paradox",
    oracle="""
        WITH base AS (
            SELECT r.r_name AS region,
                   CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END AS t,
                   CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) // 100 AS v
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
        ),
        strata AS (
            SELECT region,
                   CAST(SUM(t) AS BIGINT) AS n1,
                   CAST(SUM(1 - t) AS BIGINT) AS n0,
                   CAST(SUM(t * v) AS BIGINT) AS s1,
                   CAST(SUM((1 - t) * v) AS BIGINT) AS s0
            FROM base GROUP BY region
        ),
        pooled AS (
            SELECT CAST(SUM(n1) AS BIGINT) AS n1,
                   CAST(SUM(n0) AS BIGINT) AS n0,
                   CAST(SUM(s1) AS BIGINT) AS s1,
                   CAST(SUM(s0) AS BIGINT) AS s0
            FROM strata
        )
        SELECT s.region, s.n1, s.n0,
               ROUND(CAST(s.s1 AS DOUBLE) / s.n1
                     - CAST(s.s0 AS DOUBLE) / s.n0, 4) AS diff_local,
               ROUND(CAST(g.s1 AS DOUBLE) / g.n1
                     - CAST(g.s0 AS DOUBLE) / g.n0, 4) AS diff_global,
               CASE WHEN (CAST(s.s1 AS HUGEINT) * s.n0
                          - CAST(s.s0 AS HUGEINT) * s.n1 > 0)
                         <> (CAST(g.s1 AS HUGEINT) * g.n0
                             - CAST(g.s0 AS HUGEINT) * g.n1 > 0)
                    THEN 1 ELSE 0 END AS sign_flip
        FROM strata s CROSS JOIN pooled g
    """,
    section="A176",
    doc="Simpson's-paradox detector for the priority 'treatment' "
    "effect on whole-dollar order value, stratified by region: "
    "per-stratum mean difference vs the pooled difference, with "
    "sign_flip = 1 where a stratum's effect direction CONTRADICTS "
    "the aggregate — the reporting hazard every dashboard rollup "
    "carries (A71's stratified ATE fixes the estimate; this audit "
    "tells you the fix MATTERS because the raw rollup would "
    "mislead). The flip test never touches doubles: mean1 > mean0 "
    "cross-multiplies to s1*n0 > s0*n1 in int128, so the flag is "
    "exact; the reported differences are single divisions. Scale: "
    "one pass of conditional integer moments per stratum, global "
    "row = the strata re-summed, 5-row output.",
)
def q_agg_simpson_paradox(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region")
    base = (
        od.join(cu, od.o_custkey == cu.c_custkey)
        .join(
            F.broadcast(na), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .join(
            F.broadcast(re), F.col("n_regionkey") == F.col("r_regionkey")
        )
        .select(
            F.col("r_name").alias("region"),
            F.when(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
            )
            .otherwise(0)
            .alias("t"),
            F.expr(
                "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
                " AS BIGINT) div 100"
            ).alias("v"),
        )
    )
    t = F.col("t")
    strata = base.groupBy("region").agg(
        F.sum(t).cast("bigint").alias("n1"),
        F.sum(1 - t).cast("bigint").alias("n0"),
        F.sum(t * F.col("v")).cast("bigint").alias("s1"),
        F.sum((1 - t) * F.col("v")).cast("bigint").alias("s0"),
    )
    glob = strata.agg(
        F.sum("n1").cast("bigint").alias("gn1"),
        F.sum("n0").cast("bigint").alias("gn0"),
        F.sum("s1").cast("bigint").alias("gs1"),
        F.sum("s0").cast("bigint").alias("gs0"),
    )
    out = strata.crossJoin(F.broadcast(glob))
    local_pos = (
        F.col("s1").cast(DecimalType(38, 0)) * F.col("n0")
        - F.col("s0").cast(DecimalType(38, 0)) * F.col("n1")
        > 0
    )
    glob_pos = (
        F.col("gs1").cast(DecimalType(38, 0)) * F.col("gn0")
        - F.col("gs0").cast(DecimalType(38, 0)) * F.col("gn1")
        > 0
    )
    return out.select(
        "region",
        "n1",
        "n0",
        F.round(
            F.col("s1").cast("double") / F.col("n1")
            - F.col("s0").cast("double") / F.col("n0"),
            4,
        ).alias("diff_local"),
        F.round(
            F.col("gs1").cast("double") / F.col("gn1")
            - F.col("gs0").cast("double") / F.col("gn0"),
            4,
        ).alias("diff_global"),
        F.when(local_pos != glob_pos, 1).otherwise(0).alias(
            "sign_flip"
        ),
    )


# ==== wave 205b: Youden-optimal cutpoint ============================


@register(
    "q_agg_youden_cutpoint",
    oracle="""
        WITH scored AS (
            SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END AS y,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS s
            FROM orders
        ),
        cuts AS (
            SELECT DISTINCT s AS cut FROM (
                SELECT s, ROW_NUMBER() OVER (ORDER BY s) AS rk,
                       COUNT(*) OVER () AS n
                FROM scored
            ) WHERE rk = CAST(ceil(n * 0.1) AS BIGINT)
               OR rk = CAST(ceil(n * 0.2) AS BIGINT)
               OR rk = CAST(ceil(n * 0.3) AS BIGINT)
               OR rk = CAST(ceil(n * 0.4) AS BIGINT)
               OR rk = CAST(ceil(n * 0.5) AS BIGINT)
               OR rk = CAST(ceil(n * 0.6) AS BIGINT)
               OR rk = CAST(ceil(n * 0.7) AS BIGINT)
               OR rk = CAST(ceil(n * 0.8) AS BIGINT)
               OR rk = CAST(ceil(n * 0.9) AS BIGINT)
        ),
        conf AS (
            SELECT c.cut,
                   CAST(SUM(CASE WHEN sc.s >= c.cut AND sc.y = 1
                            THEN 1 ELSE 0 END) AS BIGINT) AS tp,
                   CAST(SUM(CASE WHEN sc.s >= c.cut AND sc.y = 0
                            THEN 1 ELSE 0 END) AS BIGINT) AS fp,
                   CAST(SUM(sc.y) AS BIGINT) AS pos,
                   CAST(SUM(1 - sc.y) AS BIGINT) AS neg
            FROM cuts c CROSS JOIN scored sc
            GROUP BY c.cut
        ),
        j AS (
            SELECT cut, tp, fp, pos, neg,
                   CAST(tp AS DOUBLE) / pos
                   + CAST(neg - fp AS DOUBLE) / neg - 1.0 AS youden_j,
                   ROW_NUMBER() OVER (
                       ORDER BY CAST(tp AS HUGEINT) * neg
                                - CAST(fp AS HUGEINT) * pos DESC,
                                cut) AS pick
            FROM conf
        )
        SELECT cut AS best_cut_cents, tp, fp, pos, neg,
               ROUND(CAST(tp AS DOUBLE) / pos, 6) AS sensitivity,
               ROUND(CAST(neg - fp AS DOUBLE) / neg, 6) AS specificity,
               ROUND(youden_j, 6) AS youden_j
        FROM j WHERE pick = 1
    """,
    section="A177",
    doc="Youden-optimal decision cutpoint: sweep nine decile "
    "thresholds of the order-value 'score' against the urgent/high "
    "label and pick the cut maximizing J = sensitivity + "
    "specificity - 1 — the threshold-selection step that turns "
    "A30's AUC into an OPERATING POINT (AUC says the score ranks; "
    "Youden says where to cut when FP and FN cost the same). The "
    "argmax is decided on EXACT integers: J1 > J2 iff tp1*neg - "
    "fp1*pos > tp2*neg - fp2*pos (same pos/neg across cuts, int128 "
    "cross-multiplication), tie-broken by the cut value, so the "
    "winner is deterministic even when J's are equal to the last "
    "ulp. Scale: one rank pass for the cuts, one 9x conditional "
    "count agg — the ROC never materializes per-row.",
)
def q_agg_youden_cutpoint(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    scored = od.select(
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        )
        .otherwise(0)
        .alias("y"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("s"),
    ).localCheckpoint(eager=False)
    ranked = scored.select(
        "s",
        F.row_number().over(Window.orderBy("s")).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    cond = None
    for q in range(1, 10):
        c = F.col("rk") == F.ceil(
            F.col("n") * F.lit(q / 10.0)
        ).cast("bigint")
        cond = c if cond is None else (cond | c)
    # DISTINCT: ties spanning a decile boundary would otherwise emit the
    # same cut value twice, doubling every conf count for that cut (and
    # quadrupling the argmax key) — data-dependent, so pinned on both sides.
    cuts = ranked.where(cond).select(F.col("s").alias("cut")).distinct()
    conf = (
        F.broadcast(cuts)
        .crossJoin(scored)
        .groupBy("cut")
        .agg(
            F.sum(
                F.when((F.col("s") >= F.col("cut"))
                       & (F.col("y") == 1), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("tp"),
            F.sum(
                F.when((F.col("s") >= F.col("cut"))
                       & (F.col("y") == 0), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("fp"),
            F.sum("y").cast("bigint").alias("pos"),
            F.sum(1 - F.col("y")).cast("bigint").alias("neg"),
        )
    )
    key = (
        F.col("tp").cast(DecimalType(38, 0)) * F.col("neg")
        - F.col("fp").cast(DecimalType(38, 0)) * F.col("pos")
    )
    pick = F.row_number().over(Window.orderBy(F.desc_nulls_last(
        "jkey"), F.asc("cut")))
    best = (
        conf.withColumn("jkey", key)
        .withColumn("pick", pick)
        .where(F.col("pick") == 1)
    )
    return best.select(
        F.col("cut").alias("best_cut_cents"),
        "tp",
        "fp",
        "pos",
        "neg",
        F.round(F.col("tp").cast("double") / F.col("pos"), 6).alias(
            "sensitivity"
        ),
        F.round(
            (F.col("neg") - F.col("fp")).cast("double") / F.col("neg"),
            6,
        ).alias("specificity"),
        F.round(
            F.col("tp").cast("double") / F.col("pos")
            + (F.col("neg") - F.col("fp")).cast("double")
            / F.col("neg")
            - F.lit(1.0),
            6,
        ).alias("youden_j"),
    )


# ==== wave 207: Brunner-Munzel heteroscedastic rank test ============


@register(
    "q_agg_brunner_munzel",
    oracle="""
        WITH vals AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 'x' ELSE 'y' END AS grp,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT) AS cents
            FROM orders
        ),
        ranked AS (
            SELECT grp,
                   CAST(ROW_NUMBER() OVER (ORDER BY cents, o_orderkey)
                        AS BIGINT)
                   - CAST(ROW_NUMBER() OVER (PARTITION BY grp
                          ORDER BY cents, o_orderkey) AS BIGINT) AS p
            FROM vals
        ),
        mom AS (
            SELECT
                CAST(SUM(CASE WHEN grp = 'x' THEN 1 ELSE 0 END)
                     AS BIGINT) AS n,
                CAST(SUM(CASE WHEN grp = 'y' THEN 1 ELSE 0 END)
                     AS BIGINT) AS m,
                CAST(SUM(CASE WHEN grp = 'x' THEN p ELSE 0 END)
                     AS BIGINT) AS sx,
                CAST(SUM(CASE WHEN grp = 'y' THEN p ELSE 0 END)
                     AS BIGINT) AS sy,
                SUM(CASE WHEN grp = 'x'
                    THEN CAST(p AS HUGEINT) * p ELSE 0 END) AS qx,
                SUM(CASE WHEN grp = 'y'
                    THEN CAST(p AS HUGEINT) * p ELSE 0 END) AS qy
            FROM ranked
        ),
        vr AS (
            SELECT n, m,
                   CAST(sx AS DOUBLE) / (CAST(n AS DOUBLE) * m)
                       AS p_hat,
                   ((CAST(qx // 4294967296 AS DOUBLE) * 4294967296.0
                     + CAST(qx % 4294967296 AS DOUBLE))
                    - CAST(sx AS DOUBLE) * sx / n) / (n - 1) AS s2x,
                   ((CAST(qy // 4294967296 AS DOUBLE) * 4294967296.0
                     + CAST(qy % 4294967296 AS DOUBLE))
                    - CAST(sy AS DOUBLE) * sy / m) / (m - 1) AS s2y
            FROM mom
        )
        SELECT n AS n_x, m AS n_y,
               ROUND(p_hat, 6) AS p_hat,
               ROUND(s2x, 4) AS s2x,
               ROUND(s2y, 4) AS s2y,
               ROUND((p_hat - 0.5)
                     / sqrt(s2x / (CAST(n AS DOUBLE) * m * m)
                            + s2y / (CAST(m AS DOUBLE) * n * n)), 6)
                   AS w_bm
        FROM vr
    """,
    section="A178",
    doc="Brunner-Munzel heteroscedastic rank test between urgent/"
    "high and other order totals: p_hat = P(Y < X) from placements "
    "p_i = combined_rank - within_rank (exact integer counts of "
    "cross-group wins under the tie-broken total order), "
    "studentized by per-group placement variances — the test to "
    "reach for when A87's Mann-Whitney assumption of equal shapes "
    "fails (MW conflates location with variance; BM estimates "
    "P(Y<X) directly and lets the two groups have DIFFERENT "
    "variances, the Behrens-Fisher situation in ranks). W = "
    "(p_hat - 1/2) / sqrt(S2x/(n m^2) + S2y/(m n^2)), the BM "
    "studentization over tie-broken placements (documented "
    "convention, same device as A153). Placement squares run in "
    "int128 and rebuild via A26 hi/lo; everything else is one-pass "
    "conditional integer moments. Scale: two rank windows over one "
    "global sort + a scalar reduction.",
)
def q_agg_brunner_munzel(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    vals = od.select(
        "o_orderkey",
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "x"
        )
        .otherwise("y")
        .alias("grp"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("cents"),
    )
    # Scale note (r6): the global placement rank comes from the
    # distributed two-pass row-number operator (range shuffle, never a
    # single-partition window); the within-group rank stays a keyed window.
    from ai_to_cvent_etl_spark.operators.ranking import global_row_number

    ranked = global_row_number(
        vals, ["cents", "o_orderkey"], out_col="_grn"
    ).select(
        "grp",
        (
            F.col("_grn")
            - F.row_number()
            .over(
                Window.partitionBy("grp").orderBy("cents", "o_orderkey")
            )
            .cast("bigint")
        ).alias("p"),
    )
    gx = F.col("grp") == "x"
    gy = F.col("grp") == "y"
    mom = ranked.agg(
        F.sum(F.when(gx, 1).otherwise(0)).cast("bigint").alias("n"),
        F.sum(F.when(gy, 1).otherwise(0)).cast("bigint").alias("m"),
        F.sum(F.when(gx, F.col("p")).otherwise(0))
        .cast("bigint")
        .alias("sx"),
        F.sum(F.when(gy, F.col("p")).otherwise(0))
        .cast("bigint")
        .alias("sy"),
        F.sum(
            F.when(
                gx, F.col("p").cast(DecimalType(38, 0)) * F.col("p")
            ).otherwise(F.lit(0).cast(DecimalType(38, 0)))
        ).alias("qx"),
        F.sum(
            F.when(
                gy, F.col("p").cast(DecimalType(38, 0)) * F.col("p")
            ).otherwise(F.lit(0).cast(DecimalType(38, 0)))
        ).alias("qy"),
    )
    hi_lo = (
        "cast({0} div 4294967296 as double) * 4294967296.0d"
        " + cast({0} % 4294967296 as double)"
    )
    nd = F.col("n").cast("double")
    md = F.col("m").cast("double")
    p_hat = F.col("sx").cast("double") / (nd * F.col("m"))
    s2x = (
        F.expr(hi_lo.format("qx"))
        - F.col("sx").cast("double") * F.col("sx") / F.col("n")
    ) / (F.col("n") - 1)
    s2y = (
        F.expr(hi_lo.format("qy"))
        - F.col("sy").cast("double") * F.col("sy") / F.col("m")
    ) / (F.col("m") - 1)
    return mom.select(
        F.col("n").alias("n_x"),
        F.col("m").alias("n_y"),
        F.round(p_hat, 6).alias("p_hat"),
        F.round(s2x, 4).alias("s2x"),
        F.round(s2y, 4).alias("s2y"),
        F.round(
            (p_hat - F.lit(0.5))
            / F.sqrt(
                s2x / (nd * F.col("m") * F.col("m"))
                + s2y / (md * F.col("n") * F.col("n"))
            ),
            6,
        ).alias("w_bm"),
    )


# ==== wave 208b: paired sign test ===================================


@register(
    "q_agg_sign_test",
    oracle="""
        WITH monthly AS (
            SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS m,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                        AS BIGINT) AS cents
            FROM orders GROUP BY 1
        ),
        diffs AS (
            SELECT cents - LAG(cents) OVER (ORDER BY m) AS d
            FROM monthly
            QUALIFY d IS NOT NULL AND d <> 0
        ),
        counts AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_pos
            FROM diffs
        )
        SELECT n, n_pos, n - n_pos AS n_neg,
               ROUND((2.0 * n_pos - n) / sqrt(CAST(n AS DOUBLE)), 6)
                   AS z_sign,
               ROUND(CAST(n_pos AS DOUBLE) / n, 6) AS p_pos
        FROM counts
    """,
    section="A179",
    doc="Paired sign test on month-over-month revenue changes: count "
    "strictly positive vs negative deltas (exact zeros excluded, "
    "the standard convention) and z = (2*pos - n)/sqrt(n) against "
    "the p = 1/2 null — the assumption-free floor of the paired-"
    "test ladder (A91's Wilcoxon signed-rank adds magnitude ranks "
    "and assumes symmetry; the sign test assumes NOTHING but "
    "independent signs, which is why it's the referee when Wilcoxon "
    "and the t-test disagree). Everything is integer counting off "
    "one lag window; z is one pinned expression. Scale: month-grain "
    "agg, ~84-row window, scalar out.",
)
def q_agg_sign_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    monthly = od.groupBy(
        F.date_trunc("month", F.col("o_orderdate").cast("date")).alias(
            "m"
        )
    ).agg(
        F.expr(
            "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 "
            "AS BIGINT)"
        ).alias("cents")
    )
    w = Window.orderBy("m")
    diffs = monthly.select(
        (F.col("cents") - F.lag("cents").over(w)).alias("d")
    ).where(F.col("d").isNotNull() & (F.col("d") != 0))
    counts = diffs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("d") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_pos"),
    )
    return counts.select(
        "n",
        "n_pos",
        (F.col("n") - F.col("n_pos")).alias("n_neg"),
        F.round(
            (F.lit(2.0) * F.col("n_pos") - F.col("n"))
            / F.sqrt(F.col("n").cast("double")),
            6,
        ).alias("z_sign"),
        F.round(
            F.col("n_pos").cast("double") / F.col("n"), 6
        ).alias("p_pos"),
    )
