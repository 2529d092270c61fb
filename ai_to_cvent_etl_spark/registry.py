"""Query registry: the single source of truth for the driver contract.

Every declared operator from SURVEY.md §2 registers here as a QuerySpec:
a key, a PySpark builder ``(spark, sf_dir) -> DataFrame``, and (for
exact-oracle queries) the equivalent DuckDB SQL. ``__spark_entry__.py``
derives ``queries()`` / ``oracle_sql()`` from this registry.

Determinism contract (SURVEY §5.3) each spec must honor:
  * no raw double aggregates — money sums go through DECIMAL(18,2) and are
    cast back to DOUBLE (exact, associative, order-insensitive);
  * row-level double arithmetic is allowed raw (bit-deterministic IEEE);
  * every window/limit ORDER BY ends in a unique key;
  * collect_list is always wrapped in sort_array;
  * irrational outputs ROUND(...,4) on both sides;
  * every computed column is aliased lowercase snake_case on both sides.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    key: str
    builder: Builder
    oracle: Optional[str]  # DuckDB SQL; None => rows-only check by the driver
    section: str = ""      # SURVEY §2 row id, e.g. "J10"
    doc: str = ""
    tags: tuple = ()


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    key: str,
    oracle: Optional[str] = None,
    section: str = "",
    doc: str = "",
    tags: tuple = (),
) -> Callable[[Builder], Builder]:
    """Decorator: register a query builder (and its oracle) under ``key``."""

    def deco(fn: Builder) -> Builder:
        if key in _REGISTRY:
            raise ValueError(f"duplicate query key: {key}")
        _REGISTRY[key] = QuerySpec(
            key=key, builder=fn, oracle=oracle, section=section,
            doc=doc or (fn.__doc__ or ""), tags=tags,
        )
        return fn

    return deco


def load_registry() -> dict[str, QuerySpec]:
    """Import all query modules (triggering registration) and return specs."""
    from ai_to_cvent_etl_spark import queries as _q  # noqa: F401  (side-effect import)

    return dict(_REGISTRY)
