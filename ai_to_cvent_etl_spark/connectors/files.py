"""File connectors: schema-explicit CSV / JSON-lines / Parquet IO.

Determinism/scale rules:
  * Reads always take an explicit ``StructType`` — inference is a
    convenience path only (SURVEY §1.2) and costs an extra data pass.
  * Timestamps serialize as microsecond ISO-8601 in text formats so a
    round-trip is value-exact.
  * Writes accept ``partition_by`` for hive-style layout: downstream reads
    with a partition-column predicate prune directories before any file is
    opened (the 100 TB pruning lever).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def read_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("timestampFormat", _TS_FMT)
        .csv(path)
    )


def write_csv(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite").option("header", "true").option(
        "timestampFormat", _TS_FMT
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.csv(path)


def read_json(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return spark.read.schema(schema).option("timestampFormat", _TS_FMT).json(path)


def write_json(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite").option("timestampFormat", _TS_FMT)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)


def read_parquet(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.parquet(path)


def write_parquet(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_orc(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.orc(path)


def write_orc(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    """ORC sink (the other columnar interchange format a warehouse hands
    over): same predicate-pushdown / partition-pruning contract as the
    parquet sink — ORC carries min/max stride indexes Spark's reader
    pushes filters into."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)
