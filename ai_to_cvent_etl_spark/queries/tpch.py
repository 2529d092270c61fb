"""Canonical TPC-H query suite (SURVEY §2.125, family H).

The testdata is TPC-H-ish (TESTDATA.md): the canonical decision-support
queries are the lingua franca of OLAP engines, so the suite pins the exact
multi-join/group/top-k shapes every warehouse user expects, adapted to the
columns this schema actually carries (no o_shippriority / c_address /
p_mfgr — the adapted output lists note each drop).

Determinism: every revenue aggregate uses the §5.3 money device —
DECIMAL(18,2)-exact products and sums, ONE decimal→double cast at the end —
so the hash never rides on float summation order. Top-k selections use
row_number with full tie-breaks (the O1 device), so the SET is deterministic
even under revenue ties.

100 TB notes: these are the plans Catalyst is built for — dim tables
(nation/region, filtered customer slices) broadcast; the fact-side joins
shuffle on their keys with AQE sizing; date filters push to the parquet
scan; the top-k is a partial TakeOrdered, never a full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.queries._util import (
    ORACLE_DISC_PRICE,
    disc_price,
)
from ai_to_cvent_etl_spark.registry import register

_Q3_CUT = "1998-06-01"
_Q3_SEGMENT = "BUILDING"
_Q3_TOPK = 10

_Q5_REGION = "ASIA"
_Q5_LO, _Q5_HI = "1996-01-01", "1997-01-01"

_Q10_LO, _Q10_HI = "1996-01-01", "1996-07-01"
_Q10_TOPK = 20


@register(
    "q_tpch_q3",
    oracle=f"""
        WITH agg AS (
            SELECT l.l_orderkey,
                   CAST(SUM({ORACLE_DISC_PRICE}) AS DOUBLE) AS revenue,
                   o.o_orderdate,
                   o.o_orderpriority
            FROM customer c
            JOIN orders o ON c.c_custkey = o.o_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            WHERE c.c_mktsegment = '{_Q3_SEGMENT}'
              AND o.o_orderdate < TIMESTAMP '{_Q3_CUT} 00:00:00'
              AND l.l_shipdate > TIMESTAMP '{_Q3_CUT} 00:00:00'
            GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        )
        SELECT l_orderkey, revenue, o_orderdate, o_orderpriority
        FROM (
            SELECT *, row_number() OVER (
                ORDER BY revenue DESC, o_orderdate, l_orderkey) AS rn
            FROM agg
        ) WHERE rn <= {_Q3_TOPK}
    """,
    section="H3",
    doc="TPC-H Q3 (shipping priority): the 10 unshipped-revenue-heaviest "
    f"orders in the '{_Q3_SEGMENT}' market segment — orders placed "
    f"before {_Q3_CUT} with line items still shipping after it — the "
    "canonical 3-way fact/dim join + group + top-k every OLAP engine "
    "demos first. Adapted: o_shippriority doesn't exist in this "
    "schema; o_orderpriority carries the same role in the output. "
    "Revenue is the §5.3 exact-decimal device (DECIMAL(18,2) "
    "products, one cast to DOUBLE); the top-10 is a row_number with "
    "(revenue DESC, o_orderdate, l_orderkey) so the SET is "
    "deterministic under ties. Scale: the segment-filtered customer "
    "slice broadcasts into orders, the date filters push to both "
    "parquet scans, the group keys on l_orderkey (the fact grain), "
    "and the final top-k is TakeOrdered — no global sort.",
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == _Q3_SEGMENT
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit(_Q3_CUT).cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit(_Q3_CUT).cast("timestamp")
    )
    agg = (
        li.join(
            orders, li.l_orderkey == orders.o_orderkey
        )
        .join(
            F.broadcast(cust.select("c_custkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
    )
    w = Window.orderBy(
        F.col("revenue").desc(), "o_orderdate", "l_orderkey"
    )
    return (
        agg.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _Q3_TOPK)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@register(
    "q_tpch_q5",
    oracle=f"""
        SELECT n.n_name,
               CAST(SUM({ORACLE_DISC_PRICE}) AS DOUBLE) AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
                       AND c.c_nationkey = s.s_nationkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = '{_Q5_REGION}'
          AND o.o_orderdate >= TIMESTAMP '{_Q5_LO} 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '{_Q5_HI} 00:00:00'
        GROUP BY n.n_name
    """,
    section="H5",
    doc="TPC-H Q5 (local supplier volume): revenue per nation from "
    f"{_Q5_REGION}-region customers buying from SAME-NATION suppliers "
    f"in {_Q5_LO[:4]} — the canonical 6-way snowflake join whose "
    "non-obvious edge is the c_nationkey = s_nationkey equality "
    "BETWEEN two dimensions (locality), the join optimizers "
    "historically got wrong. Revenue via the §5.3 exact-decimal "
    "device. Scale: nation⋈region collapses to a broadcast filter, "
    "supplier broadcasts, the fact chain shuffles on o_orderkey/"
    "o_custkey with the date filter pushed to the orders scan; the "
    "locality predicate evaluates as a post-join filter on two "
    "broadcast-carried ints — no extra shuffle.",
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(_Q5_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q5_HI).cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(
        F.col("r_name") == _Q5_REGION
    )
    nat = nation.join(
        F.broadcast(region),
        nation.n_regionkey == region.r_regionkey,
    ).select("n_nationkey", "n_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(
            F.broadcast(nat),
            supp.s_nationkey == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
    )


@register(
    "q_tpch_q10",
    oracle=f"""
        WITH agg AS (
            SELECT c.c_custkey, c.c_name,
                   CAST(SUM({ORACLE_DISC_PRICE}) AS DOUBLE) AS revenue,
                   c.c_acctbal, n.n_name
            FROM customer c
            JOIN orders o ON c.c_custkey = o.o_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            WHERE o.o_orderdate >= TIMESTAMP '{_Q10_LO} 00:00:00'
              AND o.o_orderdate <  TIMESTAMP '{_Q10_HI} 00:00:00'
              AND l.l_returnflag = 'R'
            GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
        )
        SELECT c_custkey, c_name, revenue, c_acctbal, n_name
        FROM (
            SELECT *, row_number() OVER (
                ORDER BY revenue DESC, c_custkey) AS rn
            FROM agg
        ) WHERE rn <= {_Q10_TOPK}
    """,
    section="H10",
    doc="TPC-H Q10 (returned item reporting): the 20 customers who "
    f"returned the most revenue in the {_Q10_LO}..{_Q10_HI} half-"
    "year — the canonical churn-risk report joining the return-"
    "flagged fact slice back through orders to the customer dim. "
    "Adapted: c_address/c_phone/c_comment don't exist in this "
    "schema; the output keeps the analytic columns (custkey, name, "
    "acctbal, nation, revenue). Revenue via the §5.3 exact-decimal "
    "device; top-20 via row_number with a c_custkey tie-break. "
    "Scale: the returnflag + date filters push to the fact scans, "
    "nation broadcasts, the group keys on c_custkey, and the top-k "
    "is TakeOrdered over the grouped (customer-cardinality) relation.",
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(_Q10_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q10_HI).cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    )
    nation = load_table(spark, sf_dir, "nation")
    agg = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(
            F.broadcast(nation),
            cust.c_nationkey == nation.n_nationkey,
        )
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
    )
    w = Window.orderBy(F.col("revenue").desc(), "c_custkey")
    return (
        agg.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _Q10_TOPK)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )
