"""SparkSession factory.

Design for a 1000-executor cluster, test on local[N]: everything here is
config, not code — AQE on (runtime re-planning, skew-join splitting,
partition coalescing), Arrow on (vectorized Python boundary), low shuffle
partitions for the tiny local scale factors (at sf<=0.1 the 200-partition
default dominates wall-time; on a real cluster this is overridden per-job).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ai-to-cvent-etl-spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession tuned for the local test harness."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
    )
    return builder.getOrCreate()
