"""ETL pipeline operators (E1-E2): the reference system's core moves —
detect what changed between source and target, and compact an event stream
to the latest record per key before loading.

Scale notes:
  * E1 (snapshot diff) is ONE full-outer sort-merge/shuffle-hash join on the
    business key; both sides shuffle exactly once. At 100 TB, bucketing both
    snapshots on the key makes the diff shuffle-free.
  * E2 (latest-per-key) is the upsert-compaction every CDC load needs: one
    shuffle on the key; with AQE skew splitting for hot keys. At scale,
    prefer it over `dropDuplicates` (whose kept-row is partition-order
    dependent) — this form is deterministic by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register


@register(
    "q_etl_incremental_diff",
    oracle="""
        WITH source AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 89 = 0 THEN 'P' ELSE o_orderstatus END
                       AS o_orderstatus,
                   o_totalprice
            FROM orders
            WHERE o_orderkey % 97 <> 0
        ),
        target AS (
            SELECT o_orderkey, o_orderstatus, o_totalprice
            FROM orders
            WHERE o_orderkey % 101 <> 0
        )
        SELECT COALESCE(s.o_orderkey, t.o_orderkey) AS o_orderkey,
               CASE
                   WHEN t.o_orderkey IS NULL THEN 'insert'
                   WHEN s.o_orderkey IS NULL THEN 'delete'
                   ELSE 'update'
               END AS change_type
        FROM source s
        FULL OUTER JOIN target t ON s.o_orderkey = t.o_orderkey
        WHERE t.o_orderkey IS NULL
           OR s.o_orderkey IS NULL
           OR s.o_orderstatus <> t.o_orderstatus
           OR s.o_totalprice <> t.o_totalprice
    """,
    section="E1",
    doc="Incremental snapshot diff (the ETL change-detection core): full "
    "outer join of simulated source/target snapshots on the business key, "
    "classify insert/delete/update by direct value comparison (no row-hash "
    "string formatting — engine-portable). Unchanged rows drop out.",
)
def q_etl_incremental_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    source = orders.filter(F.col("o_orderkey") % 97 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 89 == 0, "P")
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        "o_totalprice",
    )
    target = orders.filter(F.col("o_orderkey") % 101 != 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    s, t = source.alias("s"), target.alias("t")
    joined = s.join(t, F.col("s.o_orderkey") == F.col("t.o_orderkey"), "full_outer")
    change = (
        F.when(F.col("t.o_orderkey").isNull(), "insert")
        .when(F.col("s.o_orderkey").isNull(), "delete")
        .otherwise("update")
    )
    return joined.filter(
        F.col("t.o_orderkey").isNull()
        | F.col("s.o_orderkey").isNull()
        | (F.col("s.o_orderstatus") != F.col("t.o_orderstatus"))
        | (F.col("s.o_totalprice") != F.col("t.o_totalprice"))
    ).select(
        F.coalesce(F.col("s.o_orderkey"), F.col("t.o_orderkey")).alias("o_orderkey"),
        change.alias("change_type"),
    )


@register(
    "q_etl_latest_by_key",
    oracle="""
        SELECT user_id, event_id, ts, event_type FROM (
            SELECT user_id, event_id, ts, event_type,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    section="E2",
    doc="CDC upsert-compaction: latest record per key via row_number with a "
    "unique-key tie-break — deterministic, unlike dropDuplicates.",
)
def q_etl_latest_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type")
    )


@register(
    "q_etl_scd3",
    oracle="""
        WITH ranked AS (
            SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate,
                   ROW_NUMBER() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate DESC, o_orderkey DESC
                   ) AS rn,
                   lead(o_totalprice) OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate DESC, o_orderkey DESC
                   ) AS prev_totalprice,
                   lead(o_orderdate) OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate DESC, o_orderkey DESC
                   ) AS prev_orderdate
            FROM orders
        )
        SELECT o_custkey, o_orderkey AS current_orderkey,
               o_totalprice AS current_totalprice,
               o_orderdate AS current_orderdate,
               prev_totalprice, prev_orderdate,
               prev_totalprice IS NOT NULL AS has_history
        FROM ranked WHERE rn = 1
    """,
    section="E10",
    doc="SCD Type-3 dimension build: latest row per entity with the "
    "PREVIOUS value carried in-row (prev_totalprice / prev_orderdate, "
    "NULL for single-version entities) — the limited-history alternative "
    "to E3's full SCD2 interval table. One window sort per entity key "
    "(row_number + lead share the frame), fully tie-broken. NULLs here "
    "are MEANINGFUL (no history), pinning nullable-column hashing.",
)
def q_etl_scd3(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    ranked = orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        "o_orderdate",
        F.row_number().over(w).alias("rn"),
        F.lead("o_totalprice").over(w).alias("prev_totalprice"),
        F.lead("o_orderdate").over(w).alias("prev_orderdate"),
    )
    return ranked.filter(F.col("rn") == 1).select(
        "o_custkey",
        F.col("o_orderkey").alias("current_orderkey"),
        F.col("o_totalprice").alias("current_totalprice"),
        F.col("o_orderdate").alias("current_orderdate"),
        "prev_totalprice",
        "prev_orderdate",
        F.col("prev_totalprice").isNotNull().alias("has_history"),
    )


@register(
    "q_etl_key_skew_stats",
    oracle="""
        WITH k1 AS (
            SELECT l_suppkey AS k, CAST(COUNT(*) AS BIGINT) AS c
            FROM lineitem GROUP BY l_suppkey
        ),
        k2 AS (
            SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS c
            FROM orders GROUP BY o_custkey
        ),
        s1 AS (
            SELECT 'lineitem.l_suppkey' AS join_key,
                   CAST(COUNT(*) AS BIGINT) AS n_keys,
                   CAST(MAX(c) AS BIGINT) AS max_rows,
                   CAST(SUM(c) AS DOUBLE) / COUNT(*) AS avg_rows,
                   CAST(MAX(c) AS DOUBLE)
                   / (CAST(SUM(c) AS DOUBLE) / COUNT(*)) AS skew_factor
            FROM k1
        ),
        s2 AS (
            SELECT 'orders.o_custkey' AS join_key,
                   CAST(COUNT(*) AS BIGINT) AS n_keys,
                   CAST(MAX(c) AS BIGINT) AS max_rows,
                   CAST(SUM(c) AS DOUBLE) / COUNT(*) AS avg_rows,
                   CAST(MAX(c) AS DOUBLE)
                   / (CAST(SUM(c) AS DOUBLE) / COUNT(*)) AS skew_factor
            FROM k2
        )
        SELECT * FROM s1 UNION ALL SELECT * FROM s2
    """,
    section="E12",
    doc="Join-key skew diagnostic: per-key row-count distribution "
    "(n_keys, max, avg, max/avg skew factor) for the two hottest join "
    "keys — the measurement that decides whether a join needs J15's "
    "salting or AQE skew handling BEFORE it runs (measure, don't guess). "
    "Integer counts + one IEEE division => exact. Two keyed partial "
    "aggregations collapsing to per-key counts, then single-row "
    "summaries.",
)
def q_etl_key_skew_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")

    def stats(df, col, label):
        per_key = df.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
        avg = F.sum("c").cast("double") / F.count(F.lit(1))
        return per_key.agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.max("c").alias("max_rows"),
            avg.alias("avg_rows"),
            (F.max("c").cast("double") / avg).alias("skew_factor"),
        ).select(
            F.lit(label).alias("join_key"),
            "n_keys",
            "max_rows",
            "avg_rows",
            "skew_factor",
        )

    return stats(li, "l_suppkey", "lineitem.l_suppkey").unionByName(
        stats(orders, "o_custkey", "orders.o_custkey")
    )
