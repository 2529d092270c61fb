"""fan_out width guard (r9): fan_out must never shrink a frame whose
static width comes from the session's shuffle partitioning — the
fan_out-before-localCheckpoint sites feed shuffle-produced frames, and at
cluster scale (shuffle.partitions >> cores) sizing the repartition by
defaultParallelism alone would coalesce thousands of partitions to core
count and pin that narrow layout into the checkpoint."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_fan_out_keeps_cluster_shuffle_width(spark):
    """With shuffle.partitions raised above defaultParallelism (the
    100 TB-cluster regime), a pre-widened aggregate keeps that width
    through fan_out + localCheckpoint instead of shrinking to core count."""
    from ai_to_cvent_etl_spark.queries._util import fan_out

    key = "spark.sql.shuffle.partitions"
    prior = spark.conf.get(key)
    cores = spark.sparkContext.defaultParallelism
    wide = cores * 4
    try:
        spark.conf.set(key, str(wide))
        agg = (
            spark.range(0, 10_000)
            .select((F.col("id") % 997).alias("k"))
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        pinned = fan_out(agg).localCheckpoint(eager=False)
        assert pinned.rdd.getNumPartitions() == wide
    finally:
        spark.conf.set(key, prior)


def test_fan_out_floors_at_default_parallelism(spark):
    """At bench scale (shuffle.partitions <= cores) fan_out still widens a
    narrow frame to defaultParallelism — the r8 behavior, unchanged."""
    from ai_to_cvent_etl_spark.queries._util import fan_out

    cores = spark.sparkContext.defaultParallelism
    one = spark.range(0, 100).coalesce(1)
    assert fan_out(one).rdd.getNumPartitions() == max(
        cores, int(spark.conf.get("spark.sql.shuffle.partitions"))
    )
