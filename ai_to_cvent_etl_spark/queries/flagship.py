"""Flagship query for ``entry()`` (SURVEY §7.2): pricing summary over the
5-way star join — scan -> filter -> join -> aggregate in one slice.

lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region, ship-date filtered, grouped by
(r_name, l_returnflag, l_linestatus) with decimal-exact money aggregates.
Dimensions (region/nation) are broadcast — at 100 TB the fact table never
shuffles for those joins; lineitem⋈orders shuffles on the order key, which is
also the natural co-partitioning key for a bucketed layout at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.queries._util import disc_price, money_avg, money_sum


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    joined = (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        joined.groupBy("r_name", "l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),  # integral doubles: exact
            money_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            F.sum(disc_price()).cast("double").alias("sum_disc_price"),
            money_avg(F.col("l_extendedprice")).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("r_name", "l_returnflag", "l_linestatus")
    )
