"""SURVEY §2.2 — projection / filter / predicates (P1-P5).

Row-level double arithmetic is emitted raw (IEEE ops are bit-deterministic
and identical on both engines); no aggregation happens here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register
from pyspark.sql import DataFrame, SparkSession, Window


@register(
    "q_project_rename_cast",
    oracle="""
        SELECT l_orderkey AS okey,
               CAST(l_linenumber AS BIGINT) AS lineno,
               l_extendedprice * (1 - l_discount) AS net_price,
               CAST(l_quantity AS BIGINT) AS qty
        FROM lineitem
    """,
    section="P1",
    doc="select + rename + arithmetic expression + cast.",
)
def q_project_rename_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"),
        F.col("l_linenumber").cast("bigint").alias("lineno"),
        (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias("net_price"),
        F.col("l_quantity").cast("bigint").alias("qty"),  # integral doubles: exact
    )


@register(
    "q_filter_numeric",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        FROM lineitem WHERE l_quantity > 30 AND l_discount <= 0.05
    """,
    section="P2",
    doc="numeric comparison predicates.",
)
def q_filter_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter((F.col("l_quantity") > 30) & (F.col("l_discount") <= 0.05))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
    )


@register(
    "q_filter_string",
    oracle="""
        SELECT p_partkey, p_name, p_type, p_brand, p_size
        FROM part
        WHERE p_type LIKE 'PROMO%' AND p_size IN (1, 5, 10, 15, 20, 25, 30)
    """,
    section="P3",
    doc="string prefix (LIKE) + IN-list predicates.",
)
def q_filter_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "part")
        .filter(
            F.col("p_type").startswith("PROMO")
            & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30)
        )
        .select("p_partkey", "p_name", "p_type", "p_brand", "p_size")
    )


@register(
    "q_filter_date_range",
    oracle="""
        SELECT o_orderkey, o_orderdate, o_totalprice
        FROM orders
        WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
    """,
    section="P4",
    doc="inclusive timestamp range predicate.",
)
def q_filter_date_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate").between(
                F.lit("1996-01-01").cast("timestamp"),
                F.lit("1996-12-31").cast("timestamp"),
            )
        )
        .select("o_orderkey", "o_orderdate", "o_totalprice")
    )


@register(
    "q_filter_compound_null",
    oracle="""
        SELECT o_orderkey,
               NULLIF(o_orderstatus, 'O') AS st_or_null,
               COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS st_coalesced,
               CASE
                 WHEN NULLIF(o_orderstatus, 'O') IS NULL THEN 'was_open'
                 WHEN o_totalprice > 100000 AND NOT (o_orderstatus = 'F') THEN 'big_pending'
                 ELSE 'other'
               END AS bucket
        FROM orders
        WHERE (o_totalprice > 50000 OR o_orderstatus = 'P')
          AND o_orderkey IS NOT NULL
    """,
    section="P5",
    doc="AND/OR/NOT + manufactured NULLs (nullif) + CASE WHEN + coalesce: "
    "pins 3-valued-logic parity (the fixtures contain no NULLs).",
)
def q_filter_compound_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    st_or_null = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return (
        orders.filter(
            ((F.col("o_totalprice") > 50000) | (F.col("o_orderstatus") == "P"))
            & F.col("o_orderkey").isNotNull()
        )
        .select(
            "o_orderkey",
            st_or_null.alias("st_or_null"),
            F.coalesce(st_or_null, F.lit("open")).alias("st_coalesced"),
            F.when(st_or_null.isNull(), "was_open")
            .when(
                (F.col("o_totalprice") > 100000) & (~(F.col("o_orderstatus") == "F")),
                "big_pending",
            )
            .otherwise("other")
            .alias("bucket"),
        )
    )


# ==== from analytics_r4f ===========================================

@register(
    "q_filter_like_any_all",
    oracle="""
        SELECT p_partkey, p_name, p_type
        FROM part
        WHERE (p_name LIKE '%re%' OR p_name LIKE '%bl%')
          AND p_type LIKE '%M%' AND p_type LIKE '%A%'
          AND NOT (p_name LIKE '%gear%' AND p_name LIKE '%red%')
    """,
    section="P7",
    doc="Multi-pattern predicates: p_name LIKE ANY ('%re%', '%bl%'), "
    "p_type LIKE ALL ('%M%', '%A%'), and NOT LIKE ALL — the "
    "multi-pattern filter surface, verified against the expanded "
    "disjunction/conjunction forms (the oracle — expansion IS the "
    "semantics). Multi-pattern LIKEs stay inside codegen as fused "
    "substring scans; conjunct order is preserved into the scan "
    "filter, so the cheapest/most-selective pattern belongs first.",
)
def q_filter_like_any_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.where(
        F.expr("p_name LIKE ANY ('%re%', '%bl%')")
        & F.expr("p_type LIKE ALL ('%M%', '%A%')")
        & ~F.expr("p_name LIKE ALL ('%gear%', '%red%')")
    ).select("p_partkey", "p_name", "p_type")
