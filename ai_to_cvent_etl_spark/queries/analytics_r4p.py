"""Forty-fourth-wave operator (r3 continuation): version-retention
pruning.

  E33 q_etl_version_prune — keep-last-N retention over a versioned
                            store: each customer's orders ranked
                            newest-first, rows beyond N=3 become the
                            purge plan — per-customer purge counts and
                            reclaimable value, reviewed before any
                            delete runs (E32's TTL is the time-based
                            sibling; this is the count-based one).

Determinism notes (SURVEY §5.3):
  * Pure integer/decimal logic; the version rank orders by
    (o_orderdate DESC, o_orderkey DESC) — unique tie-break (rule 3).

Scale notes:
  * One keyed rank window per customer (state = one customer's
    versions); the purge plan is emitted, not executed — execution is
    E16's MERGE-delete over the plan, and the plan's counts reconcile
    the delete afterwards (E7). Count-based retention composes with
    E32's TTL: a row is purged when EITHER policy says so, which is
    one OR over the two plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_to_cvent_etl_spark.io import load_table
from ai_to_cvent_etl_spark.registry import register

_KEEP_N = 3


@register(
    "q_etl_version_prune",
    oracle=f"""
        WITH ranked AS (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate DESC, o_orderkey DESC
                   ) AS rn
            FROM orders
        )
        SELECT o_custkey,
               CAST(COUNT(*) AS BIGINT) AS n_versions,
               CAST(SUM(CASE WHEN rn > {_KEEP_N} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_purge,
               MIN(CASE WHEN rn > {_KEEP_N} THEN o_orderkey END)
                   AS oldest_purged_key,
               CAST(SUM(CASE WHEN rn > {_KEEP_N}
                        THEN CAST(o_totalprice AS DECIMAL(18,2))
                        ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                   AS purged_value
        FROM ranked
        GROUP BY o_custkey
        HAVING SUM(CASE WHEN rn > {_KEEP_N} THEN 1 ELSE 0 END) > 0
    """,
    section="E33",
    doc=f"Keep-last-{_KEEP_N} version retention: each customer's orders "
    "ranked newest-first (unique (date, key) tie-break), everything "
    "beyond the retention depth becomes the PURGE PLAN — per-customer "
    "purge counts, the oldest purged key, and the exact reclaimable "
    "value, emitted for review before any delete executes (E16's "
    "MERGE-delete applies it; E7's checksums reconcile it; E32's TTL "
    "is the time-based sibling and the two compose as an OR of "
    "plans). One keyed rank window — per-task state is one "
    "customer's versions.",
)
def q_etl_version_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    rn = F.row_number().over(
        Window.partitionBy("o_custkey").orderBy(
            F.desc("o_orderdate"), F.desc("o_orderkey")
        )
    )
    ranked = orders.select(
        "o_custkey", "o_orderkey", "o_totalprice", rn.alias("rn")
    )
    purged = F.col("rn") > _KEEP_N
    z = F.lit(0).cast("decimal(18,2)")
    out = ranked.groupBy("o_custkey").agg(
        F.count("*").alias("n_versions"),
        F.sum(F.when(purged, 1).otherwise(0)).alias("n_purge"),
        F.min(F.when(purged, F.col("o_orderkey"))).alias(
            "oldest_purged_key"
        ),
        F.sum(
            F.when(purged, F.col("o_totalprice").cast("decimal(18,2)"))
            .otherwise(z)
        )
        .cast("double")
        .alias("purged_value"),
    )
    return out.where(F.col("n_purge") > 0)
