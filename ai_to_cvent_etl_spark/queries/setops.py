"""SURVEY §2.7 — set operations / distinct / dedup (U1-U6).

U6 is the exact-dedup north-star operator: at 100 TB it is one hash-shuffle
on the normalized key with map-side partial aggregation; keeping min(doc_id)
per key (instead of dropDuplicates) makes the surviving row deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register


def _slice_f(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


def _slice_big(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


_SLICE_F_SQL = "SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'"
_SLICE_BIG_SQL = "SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_totalprice > 300000"


@register(
    "q_union_all",
    oracle=f"{_SLICE_F_SQL} UNION ALL {_SLICE_BIG_SQL}",
    section="U1",
    doc="Bag union of two OVERLAPPING order slices (overlap rows appear twice).",
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _slice_f(spark, sf_dir).unionByName(_slice_big(spark, sf_dir))


@register(
    "q_union_distinct",
    oracle=f"{_SLICE_F_SQL} UNION {_SLICE_BIG_SQL}",
    section="U2",
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _slice_f(spark, sf_dir).unionByName(_slice_big(spark, sf_dir)).distinct()


@register(
    "q_intersect",
    oracle="""
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    section="U3",
    doc="Customers that have both a finished and an open order.",
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.intersect(b)


@register(
    "q_except",
    oracle="""
        SELECT l_orderkey FROM lineitem
        EXCEPT ALL
        SELECT o_orderkey AS l_orderkey FROM orders WHERE o_orderstatus = 'F'
    """,
    section="U4",
    doc="Multiset difference (EXCEPT ALL): lineitem keys minus one copy per finished order.",
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    finished = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    return lineitem.exceptAll(finished)


@register(
    "q_distinct",
    oracle="SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
    section="U5",
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select(
        "c_nationkey", "c_mktsegment"
    ).distinct()


@register(
    "q_dedup_exact",
    oracle="""
        SELECT md5(lower(trim(text))) AS text_key,
               CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_copies
        FROM documents
        GROUP BY md5(lower(trim(text)))
    """,
    section="U6",
    doc="Exact dedup on normalized text hash; deterministic survivor = min(doc_id). "
    "dropDuplicates would keep an arbitrary row — never use it in a declared query.",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("text_key", F.md5(F.lower(F.trim(F.col("text")))))
        .groupBy("text_key")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )
