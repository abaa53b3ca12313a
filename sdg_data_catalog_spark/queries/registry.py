"""Query registry: the single source of truth for the driver contract.

Each operator from SURVEY.md §2 registers a (name, spark_fn[, oracle_sql])
triple here. ``__spark_entry__.queries()`` / ``oracle_sql()`` read these
dicts. Oracle SQL is DuckDB dialect over the pre-registered views
(region nation customer supplier part orders lineitem events documents
embeddings).

Rules enforced by convention (the driver hashes values order-insensitively
after sorting columns by name):
  - alias every computed column identically on both sides;
  - cast aggregate outputs explicitly (DuckDB sum(int) is HUGEINT — cast to
    BIGINT/DOUBLE to match Spark's long/double);
  - round floating aggregates on both sides before surfacing;
  - any LIMIT carries a deterministic total order (unique tie-break key).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}

# Modules that register queries on import.
_MODULES = (
    "sdg_data_catalog_spark.queries.relational",
    "sdg_data_catalog_spark.queries.tpch_extra",
    "sdg_data_catalog_spark.queries.text",
    "sdg_data_catalog_spark.queries.events_json",
    "sdg_data_catalog_spark.queries.dedup_similarity",
    "sdg_data_catalog_spark.queries.ranking",
    "sdg_data_catalog_spark.queries.catalog_etl",
    "sdg_data_catalog_spark.queries.scoring_sampling",
    "sdg_data_catalog_spark.queries.multimodal",
    "sdg_data_catalog_spark.queries.sources_sinks",
    "sdg_data_catalog_spark.queries.metrics_filters",
    "sdg_data_catalog_spark.queries.scalar_functions",
    "sdg_data_catalog_spark.queries.scale_ops",
    # aliases must load last: they bind SURVEY §2 exact IDs to the above
    "sdg_data_catalog_spark.queries.aliases",
)

_loaded = False


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query fn and (optionally) its DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query id {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def alias(name: str, target: str) -> None:
    """Register ``name`` as a second key for an already-registered query —
    the exact SURVEY.md §2 operator ID when the primary registration uses a
    more specific name. Same callable, same oracle; the driver exercises
    both keys."""
    if name in _QUERIES:
        raise ValueError(f"duplicate query id {name!r}")
    if target not in _QUERIES:
        raise KeyError(f"alias target {target!r} not registered")
    _QUERIES[name] = _QUERIES[target]
    if target in _ORACLES:
        _ORACLES[name] = _ORACLES[target]


def _load_all() -> None:
    global _loaded
    if not _loaded:
        for mod in _MODULES:
            importlib.import_module(mod)
        _loaded = True


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)
