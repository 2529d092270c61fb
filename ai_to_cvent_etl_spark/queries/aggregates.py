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
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sum_disc_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * CAST(1 - l_discount AS DECIMAL(4,2))
                        * CAST(1 + l_tax AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge,
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
        F.sum(price * disc).cast("double").alias("sum_disc_price"),
        F.sum(price * disc * tax).cast("double").alias("sum_charge"),
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
