"""Salted-join operator: equivalence with a plain join, salt distribution."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF0001


def test_salted_join_equals_plain_join(spark):
    from ai_to_cvent_etl_spark.io import load_table
    from ai_to_cvent_etl_spark.operators.skew import salted_join

    orders = load_table(spark, SF0001, "orders")
    customer = load_table(spark, SF0001, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = orders.join(customer, on=["o_custkey"]).select(
        "o_orderkey", "o_custkey", "c_name"
    )
    salted = salted_join(orders, customer, on=["o_custkey"], k=8).select(
        "o_orderkey", "o_custkey", "c_name"
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salt_spreads_hot_key(spark):
    """A 100%-skewed key must occupy every salt bucket."""
    from ai_to_cvent_etl_spark.operators.skew import salted_join

    hot = spark.range(4000).select(
        F.lit(1).alias("k"), F.col("id").alias("payload")
    )
    dim = spark.createDataFrame([(1, "x")], "k long, v string")
    joined = salted_join(hot, dim, on=["k"], k=8)
    assert joined.count() == 4000

    salts = (
        hot.withColumn(
            "__salt", F.pmod(F.hash(*[F.col(c) for c in hot.columns]), F.lit(8))
        )
        .groupBy("__salt")
        .count()
        .collect()
    )
    counts = {r["__salt"]: r["count"] for r in salts}
    assert len(counts) == 8
    assert max(counts.values()) < 4000 * 0.25  # no bucket dominates
