"""JDBC connector config wrappers (S7).

No database or JDBC driver exists in this environment, so these builders are
constructed-and-documented but not integration-tested here: they produce a
fully configured ``DataFrameReader``/``DataFrameWriter`` and are exercised up
to (not including) ``.load()`` / ``.save()``.

Scale design:
  * Reads parallelize via (partition_column, lower/upper bound, num_partitions)
    — one executor task per key range, no single-connection bottleneck.
  * Writes batch via ``batchsize`` and parallelize per partition; repartition
    upstream to match the database's ingest concurrency.
  * Predicate/column pushdown: Catalyst pushes filters and projections into
    the generated SQL (visible as PushedFilters in the JDBC scan node).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameReader, DataFrameWriter, SparkSession


def jdbc_reader(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    fetch_size: int = 10_000,
    **options: str,
) -> DataFrameReader:
    """Configured JDBC reader; call ``.load()`` against a live database."""
    r = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", str(fetch_size))
    )
    if partition_column is not None:
        r = (
            r.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        r = r.option(k, v)
    return r


def jdbc_writer(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = 10_000,
    **options: str,
) -> DataFrameWriter:
    """Configured JDBC writer; call ``.save()`` against a live database."""
    w = (
        df.write.format("jdbc")
        .mode(mode)
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
    )
    for k, v in options.items():
        w = w.option(k, v)
    return w
