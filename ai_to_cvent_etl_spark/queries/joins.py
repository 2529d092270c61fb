"""SURVEY §2.3 — joins (J1-J10).

Scale notes: dimension joins (nation/region/customer-at-dim-scale) broadcast —
no fact-table shuffle; fact⋈fact joins (lineitem⋈orders) shuffle on the join
key, the same key a bucketed 100 TB layout would co-partition on, so Catalyst
elides the shuffle when bucketing metadata is present. The as-of join (J10)
is a single-shuffle union+window, not a range join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.operators.asof import asof_join
from ai_to_cvent_etl_spark.queries._util import disc_price, ORACLE_DISC_PRICE
from ai_to_cvent_etl_spark.registry import register


@register(
    "q_join_inner_equi",
    oracle="""
        SELECT o.o_orderkey, o.o_totalprice, c.c_custkey, c.c_name, c.c_mktsegment
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    section="J1",
)
def q_join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return orders.join(
        customer, orders.o_custkey == customer.c_custkey, "inner"
    ).select("o_orderkey", "o_totalprice", "c_custkey", "c_name", "c_mktsegment")


@register(
    "q_join_star_5way",
    oracle=f"""
        SELECT r.r_name,
               CAST(SUM({ORACLE_DISC_PRICE}) AS DOUBLE) AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem l
        JOIN orders o    ON l.l_orderkey = o.o_orderkey
        JOIN customer c  ON o.o_custkey = c.c_custkey
        JOIN nation n    ON c.c_nationkey = n.n_nationkey
        JOIN region r    ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
    """,
    section="J2",
    doc="Flagship star join: revenue per region over 5 tables.",
)
def q_join_star_5way(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.sum(disc_price()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q_join_left_outer",
    oracle="""
        SELECT c.c_custkey, c.c_name,
               CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey, c.c_name
    """,
    section="J3",
    doc="LEFT JOIN preserving order-less customers (count 0 via COUNT(col)).",
)
def q_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count(F.col("o_orderkey")).alias("n_orders"))
    )


@register(
    "q_join_full_outer",
    oracle="""
        SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS orderkey,
               a.o_totalprice AS price_f, b.o_totalprice AS price_o
        FROM (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F') a
        FULL OUTER JOIN
             (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'O') b
        ON a.o_orderkey = b.o_orderkey
    """,
    section="J4",
    doc="FULL OUTER over disjoint key sets -> NULLs on both sides.",
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_totalprice"
    )
    b = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_orderkey").alias("b_orderkey"),
        F.col("o_totalprice").alias("b_totalprice"),
    )
    return a.join(b, a.o_orderkey == b.b_orderkey, "full").select(
        F.coalesce(F.col("o_orderkey"), F.col("b_orderkey")).alias("orderkey"),
        F.col("o_totalprice").alias("price_f"),
        F.col("b_totalprice").alias("price_o"),
    )


@register(
    "q_join_semi",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    section="J5",
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "q_join_anti",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= '1996-01-01' AND o.o_orderdate < '1997-01-01'
        )
    """,
    section="J6",
    doc="Anti join — the ETL missing-rows diff pattern. The right side is a "
    "filtered orders slice (customers with no 1996 order) so the result is "
    "non-empty at every scale factor: every customer has >=1 order overall "
    "in this data, which made the unfiltered form a vacuous 0-row check.",
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "q_join_broadcast",
    oracle="""
        SELECT n.n_nationkey, n.n_name, r.r_regionkey, r.r_name
        FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
    section="J7",
    doc="Explicit broadcast-hash join on the tiny dimension.",
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name", "r_regionkey", "r_name")


@register(
    "q_join_cross",
    oracle="""
        SELECT r.r_name, n.n_name, r.r_name || '/' || n.n_name AS pair
        FROM region r CROSS JOIN nation n
    """,
    section="J8",
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return region.crossJoin(nation).select(
        "r_name",
        "n_name",
        F.concat(F.col("r_name"), F.lit("/"), F.col("n_name")).alias("pair"),
    )


@register(
    "q_join_theta_range",
    oracle="""
        SELECT l.l_orderkey, l.l_linenumber, p.p_partkey, l.l_quantity, p.p_size
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
                   AND l.l_quantity BETWEEN p.p_size - 5 AND p.p_size + 5
    """,
    section="J9",
    doc="equi + range theta predicate: hash join with residual filter.",
)
def q_join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return lineitem.join(
        part,
        (F.col("l_partkey") == F.col("p_partkey"))
        & F.col("l_quantity").between(F.col("p_size") - 5, F.col("p_size") + 5),
    ).select("l_orderkey", "l_linenumber", "p_partkey", "l_quantity", "p_size")


@register(
    "q_join_asof",
    oracle="""
        SELECT l.event_id, l.user_id, l.ts,
               r.event_id_matched, r.ts_matched
        FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') l
        ASOF LEFT JOIN (
            SELECT event_id AS event_id_matched, ts AS ts_matched, user_id
            FROM events WHERE event_type <> 'purchase'
        ) r ON l.user_id = r.user_id AND l.ts >= r.ts_matched
    """,
    section="J10",
    doc="As-of join: latest prior non-purchase event per purchase "
    "(union+window implementation, operators/asof.py).",
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    others = events.filter(F.col("event_type") != "purchase").select(
        "event_id", "user_id", "ts"
    )
    return asof_join(
        purchases,
        others,
        on="ts",
        by="user_id",
        right_payload=["event_id", "ts"],
        tiebreak="event_id",
    )
