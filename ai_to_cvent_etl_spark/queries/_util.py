"""Shared helpers enforcing the SURVEY §5.3 determinism rules."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType


def dec2(c: Column) -> Column:
    """Cast a 2dp money-like double to DECIMAL(18,2) — lossless for this data
    (probed: every money column is exactly 2dp), making downstream sums exact
    and order-insensitive."""
    return c.cast(DecimalType(18, 2))


def money_sum(c: Column) -> Column:
    """Order-insensitive SUM of a money double: decimal-sum then back to
    DOUBLE (a decimal->double conversion is deterministic)."""
    return F.sum(dec2(c)).cast("double")


def money_avg(c: Column) -> Column:
    """Deterministic AVG of a money double: exact decimal sum cast to double,
    divided by count — IEEE division of identical operands is bit-stable on
    both Spark and DuckDB."""
    return F.sum(dec2(c)).cast("double") / F.count(c)


ORACLE_MONEY_SUM = "CAST(SUM(CAST({col} AS DECIMAL(18,2))) AS DOUBLE)"
ORACLE_MONEY_AVG = "CAST(SUM(CAST({col} AS DECIMAL(18,2))) AS DOUBLE) / COUNT({col})"


def disc_price() -> Column:
    """l_extendedprice * (1 - l_discount) as an exact DECIMAL product
    (both factors are exactly 2dp), for aggregation contexts."""
    return dec2(F.col("l_extendedprice")) * dec2(F.lit(1.0) - F.col("l_discount"))


ORACLE_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))"
)


def corpus_side(df, strategy: str):
    """SCALE.md join-strategy switch for the corpus-sized side of a
    pair-generating join (LSH band self-join, blocked cosine self-join,
    edit-distance block join).

    * ``'auto'`` (default) — no hint: Catalyst's size-based planner picks
      broadcast only when the side's estimated size fits under
      ``spark.sql.autoBroadcastJoinThreshold``, and AQE re-checks with the
      true runtime size. The safe choice at every scale: small corpora still
      get the broadcast plan, a 100 TB corpus falls back to the shuffle join
      instead of OOMing an executor (a hardcoded hint would override the
      planner and AQE cannot undo it).
    * ``'broadcast'`` — force a broadcast build side (bench / known-small).
    * ``'bucket'`` — force the shuffle path: shuffle-hash join on the equi
      key (band key / block key), each bucket's pairs generated locally.
      The 100 TB shape when the corpus side cannot fit in executor memory.
    """
    if strategy == "auto":
        return df
    if strategy == "broadcast":
        return F.broadcast(df)
    if strategy == "bucket":
        return df.hint("shuffle_hash")
    raise ValueError(f"unknown join strategy: {strategy!r}")


def fan_out(df):
    """Spread a small scan across all cores before an explosive operator.

    Parallelism of a stage is bounded by its input partition count. A
    pair-generating operator (self-join, explode) can multiply a megabyte
    input by 1000x — but a megabyte input is ONE parquet split, so without
    this the whole explosion runs on one task. At 100 TB the scan itself
    yields thousands of splits and Catalyst/AQE handle it; for explode-heavy
    SMALL inputs the fan-out must be explicit. Sized by cluster config,
    never a constant.

    Width guard (r9, VERDICT r8 item 4): ``defaultParallelism`` alone can
    SHRINK a wide frame at cluster scale — a fan_out-before-localCheckpoint
    site would coalesce a naturally-thousands-of-partitions aggregate down
    to core count and then pin that layout. The guard takes
    ``max(defaultParallelism, spark.sql.shuffle.partitions)``: every
    checkpointed fan_out site feeds a SHUFFLE-produced frame (aggregate /
    join output), whose static partition count is bounded above by the
    session's shuffle width (AQE coalescing only lowers it at runtime —
    which an explicit-N repartition is precisely immune to), so the bound
    equals the VERDICT's ``max(defaultParallelism, incoming-partitions)``
    for those sites WITHOUT probing ``df.rdd`` — which under AQE would
    execute upstream query stages at plan-build time. Locally both terms
    are 32, so bench plans are byte-identical."""
    spark = df.sparkSession
    n = spark.sparkContext.defaultParallelism
    try:
        n = max(n, int(spark.conf.get("spark.sql.shuffle.partitions")))
    except Exception:
        pass
    return df.repartition(n)
