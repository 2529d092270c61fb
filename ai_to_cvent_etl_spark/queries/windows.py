"""SURVEY §2.5/§2.6 — window functions (W1-W7) and top-k (O1).

Every window ORDER BY ends in a unique key (§5.3 rule 3) so ranks and frames
are peer-free and deterministic. Windowed money sums are decimal-exact.
At scale: a window shuffles once on its partition key; the per-user/event
windows here partition on high-cardinality keys, so no executor ever
materializes more than one key-group of rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register


def _money(c):
    return c.cast(DecimalType(12, 2))


@register(
    "q_win_topk_per_group",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
            FROM orders
        ) WHERE rn <= 3
    """,
    section="W1",
    doc="Top-3 orders per customer (row_number, unique-key tie-break).",
)
def q_win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "q_win_rank_dense_ntile",
    oracle="""
        SELECT p_partkey, p_retailprice,
               CAST(RANK() OVER w AS BIGINT) AS rnk,
               CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
               CAST(NTILE(4) OVER w AS BIGINT) AS quartile
        FROM part
        WINDOW w AS (ORDER BY p_retailprice DESC, p_partkey)
    """,
    section="W2",
)
def q_win_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    w = Window.orderBy(F.col("p_retailprice").desc(), F.col("p_partkey").asc())
    return part.select(
        "p_partkey",
        "p_retailprice",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
    )


@register(
    "q_win_lag_lead",
    oracle="""
        SELECT event_id, user_id, ts,
               epoch_us(ts) - epoch_us(LAG(ts) OVER w) AS gap_us,
               LEAD(event_type) OVER w AS next_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    section="W3",
    doc="Per-user inter-event gap in exact integer microseconds.",
)
def q_win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "event_id",
        "user_id",
        "ts",
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))).alias(
            "gap_us"
        ),
        F.lead("event_type").over(w).alias("next_type"),
    )


@register(
    "q_win_running_sum",
    oracle="""
        SELECT o_custkey, o_orderkey, o_orderdate,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
                    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS running_total
        FROM orders
    """,
    section="W4",
)
def q_win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(_money(F.col("o_totalprice"))).over(w).cast("double").alias(
            "running_total"
        ),
    )


@register(
    "q_win_moving_avg",
    oracle="""
        SELECT event_id, user_id,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE)
                   / COUNT(value) OVER w AS mov_avg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    section="W5",
    doc="3-row moving average via decimal-exact windowed sum / count.",
)
def q_win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return events.select(
        "event_id",
        "user_id",
        (
            F.sum(_money(F.col("value"))).over(w).cast("double")
            / F.count("value").over(w)
        ).alias("mov_avg"),
    )


@register(
    "q_win_first_last",
    oracle="""
        SELECT event_id, user_id,
               FIRST_VALUE(value) OVER w AS first_val,
               LAST_VALUE(event_id) OVER w AS last_event
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    section="W6",
    doc="first/last with explicit full frame (last's default frame is a trap).",
)
def q_win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return events.select(
        "event_id",
        "user_id",
        F.first("value").over(w).alias("first_val"),
        F.last("event_id").over(w).alias("last_event"),
    )


@register(
    "q_win_range_frame",
    oracle="""
        SELECT o_orderkey, o_totalprice,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
                    PARTITION BY o_orderpriority
                    ORDER BY o_totalprice
                    RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING
               ) AS DOUBLE) AS nearby_sum
        FROM orders
    """,
    section="W7",
    doc="RANGE frame over a numeric ordering key (value-defined peer set), "
    "partition-bounded: an unpartitioned numeric range frame degenerates to "
    "ONE sorted task at any scale (SCALE.md 'Windows'), so the declared form "
    "carries a partition key like every production range-frame query should.",
)
def q_win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy(F.col("o_totalprice"))
        .rangeBetween(-1000, 1000)
    )
    return orders.select(
        "o_orderkey",
        "o_totalprice",
        F.sum(_money(F.col("o_totalprice"))).over(w).cast("double").alias(
            "nearby_sum"
        ),
    )


@register(
    "q_order_limit_topk",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10
    """,
    section="O1",
    doc="Global top-10 (TakeOrderedAndProject); tie-break makes the SET stable.",
)
def q_order_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "q_order_offset_page",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10 OFFSET 10
    """,
    section="O2",
    doc="Offset pagination: page 2 of the O1 total order (rows 11-20). The "
    "unique-key tie-break makes every page a stable set. Scale note: OFFSET "
    "is inherently a top-(offset+limit) computation — Spark runs "
    "GlobalLimit(20) then drops 10, fine for page-sized offsets; deep "
    "pagination at 100 TB should keyset-paginate (WHERE key > last_seen "
    "ORDER BY key LIMIT n) instead, which this query's tie-break enables.",
)
def q_order_offset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .offset(10)
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "q_win_pareto",
    oracle="""
        WITH spend AS (
            SELECT o_custkey,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS s
            FROM orders GROUP BY o_custkey
        ),
        ranked AS (
            SELECT o_custkey, s,
                   CAST(ROW_NUMBER() OVER (ORDER BY s DESC, o_custkey)
                        AS BIGINT) AS rnk,
                   SUM(s) OVER (ORDER BY s DESC, o_custkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS cum,
                   SUM(s) OVER () AS total
            FROM spend
        )
        SELECT o_custkey, rnk,
               CAST(s AS DOUBLE) AS spend,
               CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) AS cum_share
        FROM ranked
        WHERE rnk <= 100
    """,
    section="W16",
    doc="Pareto concentration curve: customers ranked by total spend, "
    "cumulative share of global revenue at each rank (the 80/20 "
    "diagnostic). Per-customer sums, running sum, and the global total "
    "are all EXACT DECIMAL (order-insensitive); the single double "
    "division is bit-deterministic. Output truncated at rank 100 with a "
    "unique-key tie-break. The ranking is one global sort of the "
    "CUSTOMER aggregate (not the orders table) — entity-level "
    "cardinality, fine to sort at any scale; the running sum rides the "
    "same sorted window.",
)
def q_win_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_to_cvent_etl_spark.queries._util import dec2

    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(dec2(F.col("o_totalprice"))).alias("s")
    )
    w = Window.orderBy(F.desc("s"), F.asc("o_custkey"))
    ranked = spend.select(
        "o_custkey",
        "s",
        F.row_number().over(w).cast("bigint").alias("rnk"),
        F.sum("s")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum"),
        F.sum("s").over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("total"),
    )
    return ranked.filter(F.col("rnk") <= 100).select(
        "o_custkey",
        "rnk",
        F.col("s").cast("double").alias("spend"),
        (F.col("cum").cast("double") / F.col("total").cast("double")).alias(
            "cum_share"
        ),
    )
