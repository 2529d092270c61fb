"""SURVEY §2.1 — scans (S1-S3). Declared with exact oracles.

S2/S3 pin Catalyst's column pruning and parquet predicate pushdown: the
physical scan must show ReadSchema with only the selected columns and
PushedFilters with the ship-date predicate (asserted in tests via explain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register


@register(
    "q_scan_parquet",
    oracle="SELECT * FROM lineitem",
    section="S1",
    doc="Full scan of the fact table, stable schema/column order.",
)
def q_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem")


@register(
    "q_scan_projection_pushdown",
    oracle="SELECT l_orderkey, l_quantity FROM lineitem",
    section="S2",
    doc="2-column projection; Catalyst prunes the parquet ReadSchema to 2 cols.",
)
def q_scan_projection_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")


@register(
    "q_scan_filter_pushdown",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity
        FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-01-01'
    """,
    section="S3",
    doc="Predicate pushed into parquet row-group filters.",
)
def q_scan_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        .select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")
    )
