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
from pyspark.sql import DataFrame, SparkSession, Window


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


# ==== from analytics_r3o ===========================================

@register(
    "q_union_by_name",
    oracle="""
        (SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_orderkey % 3 = 0)
        UNION ALL BY NAME
        (SELECT o_orderstatus, o_orderkey FROM orders
         WHERE o_orderkey % 3 = 1)
    """,
    section="U7",
    doc="Schema-drift union: two heterogeneous projections of orders "
    "(different column sets AND different column order) aligned by "
    "NAME with missing columns NULL-filled — Spark "
    "unionByName(allowMissingColumns=True) vs DuckDB UNION ALL BY "
    "NAME. The ETL shape for unioning feed versions across a schema "
    "change without positional bugs (a positional UNION would pair "
    "o_orderstatus with o_orderkey silently). Metadata-only alignment "
    "— map-side, no shuffle.",
)
def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = orders.where(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey", "o_totalprice"
    )
    b = orders.where(F.col("o_orderkey") % 3 == 1).select(
        "o_orderstatus", "o_orderkey"
    )
    return a.unionByName(b, allowMissingColumns=True)

# ==== from analytics_r4g ===========================================

@register(
    "q_setops_all",
    oracle="""
        WITH a AS (
            SELECT o_orderstatus AS st,
                   CAST(date_part('year', o_orderdate) AS INT) AS yr
            FROM orders WHERE o_orderkey % 4 IN (0, 1)
        ),
        b AS (
            SELECT o_orderstatus AS st,
                   CAST(date_part('year', o_orderdate) AS INT) AS yr
            FROM orders WHERE o_orderkey % 4 IN (1, 2)
        ),
        ex AS (
            SELECT st, yr FROM a EXCEPT ALL SELECT st, yr FROM b
        ),
        ix AS (
            SELECT st, yr FROM a INTERSECT ALL SELECT st, yr FROM b
        )
        SELECT 'except_all' AS op, st, yr,
               CAST(COUNT(*) AS BIGINT) AS multiplicity
        FROM ex GROUP BY st, yr
        UNION ALL
        SELECT 'intersect_all', st, yr, CAST(COUNT(*) AS BIGINT)
        FROM ix GROUP BY st, yr
    """,
    section="U8",
    doc="Bag-semantics set operations: EXCEPT ALL and INTERSECT ALL "
    "over two overlapping low-cardinality projections (status, year) "
    "— multiplicity-aware differences that the set forms (U3/U4) "
    "silently collapse to 0-or-1, summarized as per-value "
    "multiplicities. Pinned because volume accounting (how many MORE "
    "rows does feed A have per key) is a bag question: EXCEPT ALL's "
    "answer is max(count_a − count_b, 0) per value, which Spark plans "
    "as a signed-count aggregation — one keyed shuffle, no row-by-row "
    "matching.",
)
def q_setops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    proj = lambda mods: orders.where(
        (F.col("o_orderkey") % 4).isin(mods)
    ).select(
        F.col("o_orderstatus").alias("st"),
        F.year("o_orderdate").cast("int").alias("yr"),
    )
    a, b = proj([0, 1]), proj([1, 2])
    ex = (
        a.exceptAll(b)
        .groupBy("st", "yr")
        .agg(F.count("*").alias("multiplicity"))
        .select(F.lit("except_all").alias("op"), "st", "yr", "multiplicity")
    )
    ix = (
        a.intersectAll(b)
        .groupBy("st", "yr")
        .agg(F.count("*").alias("multiplicity"))
        .select(
            F.lit("intersect_all").alias("op"), "st", "yr", "multiplicity"
        )
    )
    return ex.unionAll(ix)
