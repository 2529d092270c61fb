"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``ai_to_cvent_etl_spark`` package; this module
only adapts the package's query registry to the driver's interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Pricing summary over the 5-way star join (SURVEY §7.2): scan -> filter ->
    broadcast-dim joins -> decimal-exact aggregation.
    """
    from ai_to_cvent_etl_spark.queries.flagship import flagship

    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from ai_to_cvent_etl_spark.registry import load_registry

    return {key: spec.builder for key, spec in sorted(load_registry().items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each exact-oracle query; rows-only queries
    (nondeterministic-by-construction, e.g. approx sketches) are omitted."""
    from ai_to_cvent_etl_spark.registry import load_registry

    return {
        key: spec.oracle
        for key, spec in sorted(load_registry().items())
        if spec.oracle is not None
    }
